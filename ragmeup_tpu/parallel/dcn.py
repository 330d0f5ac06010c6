"""Multi-slice (DCN) distributed runtime.

SURVEY.md §2.4/§5.8: the framework's comm backend is the TPU fabric —
ICI collectives inside a slice, DCN (data-center network) between slices,
both driven by XLA from shardings over one global mesh. This module wires
``jax.distributed`` so N processes (one per slice / host) form a single
JAX runtime whose ``jax.devices()`` is the union of all slices' chips.

Axis layout rule (the scaling-book recipe): DCN is ~10-100x slower than
ICI, so the mesh axis that crosses slice boundaries must be the one with
the lightest collectives — ``data`` (gradient psum once per step) or
``corpus`` (one small (score, id) all_gather per query wave). ``model``
(TP, activations every layer) must stay inside a slice.
``make_multislice_mesh`` enforces this by putting the slice dimension
outermost and factoring the per-slice devices over the inner axes.

Verified without hardware by ``scripts/dcn_dryrun.py``: two CPU processes
(each a "slice" of 4 virtual devices) run the sharded retrieval merge and
a dp-across-slices train step; exactness asserted vs single-process.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ragmeup_tpu.parallel.mesh import AXES


def initialize_slice(coordinator: str, num_processes: int, process_id: int,
                     local_device_count: Optional[int] = None) -> None:
    """Join this process to the multi-slice runtime.

    Must run before any JAX backend use. On TPU pods jax.distributed
    auto-detects; here the explicit form covers CPU simulation and
    single-host multi-process launches. ``local_device_count`` forces a
    virtual CPU device count (simulation / tests)."""
    if local_device_count is not None:
        flag = f"--xla_force_host_platform_device_count={local_device_count}"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " " + flag).strip()
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_multislice_mesh(slice_axis: str = "data",
                         model_parallel: int = 1):
    """Global ('data','corpus','model') mesh over all slices' devices.

    The slice boundary becomes the outermost dimension of ``slice_axis``
    ('data' or 'corpus'): collectives over that axis are hierarchical
    (XLA reduces within a slice over ICI first, then once over DCN).
    ``model`` never crosses slices. Devices are ordered by
    (process_index, id) so each slice's chips are contiguous."""
    import jax
    from jax.sharding import Mesh

    if slice_axis not in ("data", "corpus"):
        raise ValueError("slice axis must be 'data' or 'corpus' (TP over "
                         "DCN would put per-layer activations on the slow "
                         "network)")
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_slices = max(d.process_index for d in devices) + 1
    per_slice = len(devices) // n_slices
    if per_slice % model_parallel != 0:
        raise ValueError(f"{per_slice} devices/slice not divisible by "
                         f"model={model_parallel}")
    inner = per_slice // model_parallel
    if slice_axis == "data":
        arr = np.asarray(devices).reshape(n_slices, inner, model_parallel)
    else:
        # corpus spans slices; device order is slice-major, so a straight
        # reshape keeps each slice's corpus shards contiguous (shard ↔
        # slice locality) while 'model' stays within a slice
        arr = np.asarray(devices).reshape(1, n_slices * inner,
                                          model_parallel)
    return Mesh(arr, AXES)


def global_batch(mesh, host_arrays: dict, spec) -> dict:
    """Build global jax.Arrays from per-process identical host arrays.

    Every process holds the SAME full host array (deterministic data or
    broadcast beforehand); each contributes only its addressable shards.
    This is the multi-process replacement for jax.device_put(batch,
    NamedSharding(...)), which requires all devices addressable."""
    import jax
    from jax.sharding import NamedSharding

    def put(arr):
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])

    return {k: put(np.asarray(v)) for k, v in host_arrays.items()}


def replicated(mesh, arr):
    """Fully-replicated global array from identical per-process data."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P())
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])
