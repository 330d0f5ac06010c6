"""Tensor-parallel inference: shard a flax model's forward over the mesh.

SURVEY.md §2.4 row "TP for model forwards": Megatron-style sharding of the
embedder / cross-encoder / LLM over the ``model`` mesh axis for models too
large for one chip. The modules already carry flax logical partitioning
names (models/layers.py, models/decoder.py); this helper places a host
param tree onto the mesh per those rules and returns a jitted apply whose
collectives XLA inserts from the shardings.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from flax import linen as nn

from ragmeup_tpu.parallel.mesh import LOGICAL_RULES


def model_param_shardings(model: nn.Module, mesh, init_args: tuple,
                          init_kwargs: Optional[dict] = None,
                          shard_vocab: bool = False):
    """NamedShardings for the model's params from its logical metadata.

    ``shard_vocab``: additionally shard the 'vocab' logical axis over
    'model' (Megatron output-embedding parallelism). For inference this
    cuts the lm_head — the single largest per-token matmul — to 1/TP per
    chip (1.05 GB -> 131 MB at 8B/TP=8); XLA inserts the small logit
    collective. Kept off for training (the default rules replicate vocab
    so the embedding gather stays local)."""
    init_kwargs = init_kwargs or {}
    abs_vars = jax.eval_shape(
        functools.partial(model.init, jax.random.PRNGKey(0), *init_args,
                          **init_kwargs))
    specs = nn.get_partition_spec(abs_vars)["params"]
    rules = LOGICAL_RULES
    if shard_vocab:
        rules = tuple(("vocab", "model") if name == "vocab" else (name, axis)
                      for name, axis in LOGICAL_RULES)
    shardings = nn.logical_to_mesh_sharding(specs, mesh, rules)
    return _drop_indivisible(nn.meta.unbox(abs_vars["params"]), shardings,
                             mesh)


def _drop_indivisible(abs_params, shardings, mesh):
    """Replicate any param dim whose size the assigned mesh axes do not
    divide (e.g. an int4 group-scale with k//group == 1 rows on a 4-way
    'model' axis): GSPMD refuses uneven shardings at device_put, and a
    small scale tensor is cheaper replicated than padded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fix(leaf, sh):
        spec = getattr(sh, "spec", None)
        if spec is None:
            return sh
        shape = leaf.shape
        new = []
        changed = False
        for i, entry in enumerate(tuple(spec) + (None,) * (len(shape)
                                                           - len(spec))):
            if entry is None:
                new.append(None)
                continue
            axes = entry if isinstance(entry, tuple) else (entry,)
            size = 1
            for ax in axes:
                size *= mesh.shape[ax]
            if shape[i] % size:
                new.append(None)
                changed = True
            else:
                new.append(entry)
        return NamedSharding(mesh, P(*new)) if changed else sh

    return jax.tree_util.tree_map(fix, abs_params, shardings)


def tp_shard_model(model: nn.Module, params, mesh, init_args: tuple,
                   init_kwargs: Optional[dict] = None):
    """Place `params` (host or single-device tree) onto the mesh per the
    logical rules and return (sharded_params, jitted_apply).

    jitted_apply(params, *args, **kwargs) == model.apply({'params': ...}).
    Activations follow from the param shardings (XLA propagates); batch
    inputs can additionally be sharded P('data', ...) by the caller."""
    shardings = model_param_shardings(model, mesh, init_args, init_kwargs)
    sharded = jax.device_put(params, shardings)

    @functools.partial(jax.jit, static_argnames=("method",))
    def apply_fn(p, *args, method: Optional[str] = None, **kwargs):
        return model.apply({"params": p}, *args, **kwargs)

    return sharded, apply_fn
