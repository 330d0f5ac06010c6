from ragmeup_tpu.utils.platform import ensure_platform
from ragmeup_tpu.utils.profiling import StageTimer, trace_stage

__all__ = ["ensure_platform", "StageTimer", "trace_stage"]
