"""Device mesh + sharding rules.

The framework's parallelism is first-class where the reference had none
(SURVEY.md §2.4): one 3-axis mesh ``('data', 'corpus', 'model')`` —

- ``data``: query/batch data-parallelism (queries batch over it, training
  batches shard over it);
- ``corpus``: corpus rows shard over it (the retrieval analogue of DP);
  during training it doubles as the sequence-parallel axis;
- ``model``: Megatron-style tensor parallelism for model forwards (heads /
  ffn sharded via the logical rules below).

Communication is XLA collectives over ICI (psum/all_gather inserted by the
compiler from shardings) — the TPU-native answer to the reference's absent
NCCL/MPI layer (SURVEY.md §5.8). EP (expert parallelism for Mixtral-class
MoE checkpoints) rides the ``model`` axis: the stacked expert tensors'
``expert`` logical axis shards over it, and the MoE combine contraction is
the one collective (models/decoder.py LlamaMoeMlp). PP stays out of scope
(shallow pipelines — SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "corpus", "model")

# flax logical axis name → mesh axis (None = replicated)
LOGICAL_RULES = (
    ("batch", "data"),
    ("seq", None),          # sequence dim of params (e.g. position embeddings)
    ("act_seq", "corpus"),  # activation sequence sharding (SP) reuses corpus axis
    ("embed", None),
    ("qkv", "model"),
    ("kv", "model"),
    ("mlp", "model"),
    ("expert", "model"),    # EP: stacked MoE experts shard over 'model'
    ("moe_inter", None),    # per-expert ffn dim stays local under EP
    ("vocab", None),
    ("corpus", "corpus"),
    ("unmodeled", None),
)


def shard_map_compat(fn, mesh, in_specs, out_specs):
    """``shard_map`` across jax versions with replication checks off.

    Newer jax exposes ``jax.shard_map`` taking ``check_vma``; the older
    ``jax.experimental.shard_map.shard_map`` takes ``check_rep`` instead.
    Every manual-partitioning call site in the package goes through here so
    the version fallback is exercised (or fails) in exactly one place.
    """
    try:
        from jax import shard_map as _sm
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm
    try:
        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    except TypeError:  # older signature
        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)


def mesh_shape_for(n_devices: int,
                   model_parallel: Optional[int] = None,
                   corpus_parallel: Optional[int] = None) -> Tuple[int, int, int]:
    """Factor n_devices into (data, corpus, model). Defaults: give the
    corpus axis the largest power-of-two factor, then model, then data."""
    if model_parallel and corpus_parallel:
        assert n_devices % (model_parallel * corpus_parallel) == 0
        return (n_devices // (model_parallel * corpus_parallel),
                corpus_parallel, model_parallel)
    m = model_parallel or 1
    rest = n_devices // m
    assert n_devices % m == 0, f"{n_devices} devices not divisible by model={m}"
    c = corpus_parallel or _largest_pow2_factor(rest)
    assert rest % c == 0
    return (rest // c, c, m)


def _largest_pow2_factor(n: int) -> int:
    p = 1
    while n % (p * 2) == 0:
        p *= 2
    return p


def make_mesh(shape: Optional[Sequence[int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build the ('data','corpus','model') mesh over the given devices."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = mesh_shape_for(len(devices))
    shape = tuple(shape)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, AXES)


def logical_sharding(mesh: Mesh, logical_specs) -> object:
    """Map a pytree of flax logical PartitionSpecs to mesh NamedShardings."""
    from flax import linen as nn
    return nn.logical_to_mesh_sharding(logical_specs, mesh, LOGICAL_RULES)


def shard_params(params, mesh: Mesh, logical_spec_tree=None):
    """Place a param pytree on the mesh. With a logical spec tree (from
    ``nn.get_partition_spec``) params shard per the rules; without, they are
    replicated."""
    if logical_spec_tree is not None:
        shardings = logical_sharding(mesh, logical_spec_tree)
    else:
        shardings = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), params)
    return jax.device_put(params, shardings)
