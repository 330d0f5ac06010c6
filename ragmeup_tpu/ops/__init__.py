from ragmeup_tpu.ops.topk import dense_topk, dense_topk_int8, dense_topk_xla, topk_oracle
from ragmeup_tpu.ops.fusion import rrf_fuse, weighted_score_fuse, mmr_select

__all__ = [
    "dense_topk",
    "dense_topk_int8",
    "dense_topk_xla",
    "topk_oracle",
    "rrf_fuse",
    "weighted_score_fuse",
    "mmr_select",
]
