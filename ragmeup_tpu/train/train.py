"""Training: fine-tune the framework's models on the user's corpus.

The reference has no training story at all (models arrive frozen from HF).
A TPU-native framework should close the loop: fine-tune the sentence
encoder (contrastive, in-batch negatives — the standard recipe for
retrieval quality on a private corpus) and the decoder LLM (causal LM /
SFT) — on the same mesh the serving path uses.

Sharding (SURVEY.md §2.4): one pjit'd train step over the
``('data','corpus','model')`` mesh —
- **dp**: batch over ``data`` (gradients psum'd by XLA);
- **tp**: parameters shard per the flax logical rules (heads/ffn over
  ``model`` — Megatron style);
- **sp**: sequence-sharded logits/loss over the ``corpus`` axis via a
  sharding constraint (ring/blockwise attention SP lives in
  ``ops/attention.py``);
- **ep**: sparse-MoE expert tensors shard over ``model`` (the 'expert'
  logical axis — parallel/mesh.py); MoE training adds the router
  load-balancing auxiliary loss (``moe_load_balancing_loss``);
- **pp**: out of scope for parity (shallow pipelines — SURVEY.md §2.4).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ragmeup_tpu.parallel.mesh import LOGICAL_RULES
from ragmeup_tpu.models.decoder import causal_bias


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["step", "params", "opt_state"],
                   meta_fields=[])
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any

    def replace(self, **kw) -> "TrainState":
        return dataclasses.replace(self, **kw)


# -- losses -----------------------------------------------------------------------

def decoder_loss(logits: jnp.ndarray, ids: jnp.ndarray,
                 mask: jnp.ndarray) -> jnp.ndarray:
    """Next-token cross entropy. logits (b, s, v); ids/mask (b, s)."""
    targets = ids[:, 1:]
    lg = logits[:, :-1]
    m = mask[:, 1:].astype(jnp.float32)
    logp = jax.nn.log_softmax(lg, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def moe_load_balancing_loss(intermediates: Dict, num_experts: int
                            ) -> jnp.ndarray:
    """Switch-Transformer load-balancing loss over every MoE layer's sown
    router state: ``E * Σ_e f_e · P_e`` per layer, averaged over layers,
    where f_e is the fraction of (token, slot) assignments routed to
    expert e and P_e the mean router probability for e (matches HF
    ``load_balancing_loss_func`` semantics — minimized at uniform
    routing, value 1.0). Returns 0 when the model has no MoE layers."""
    flat = jax.tree_util.tree_flatten_with_path(intermediates)[0]
    probs = [v for path, v in flat if "router_probs" in jax.tree_util.keystr(path)]
    topis = [v for path, v in flat if "router_topi" in jax.tree_util.keystr(path)]
    if not probs:
        return jnp.zeros((), jnp.float32)
    total = jnp.zeros((), jnp.float32)
    for p, ti in zip(probs, topis):
        frac = jnp.mean(jax.nn.one_hot(ti, num_experts, dtype=jnp.float32),
                        axis=tuple(range(ti.ndim)))      # (E,) sums to 1
        mean_p = jnp.mean(p.reshape(-1, num_experts), axis=0)
        total = total + num_experts * jnp.sum(frac * mean_p)
    return total / len(probs)


def contrastive_loss(q_emb: jnp.ndarray, d_emb: jnp.ndarray,
                     temperature: float = 0.05) -> jnp.ndarray:
    """InfoNCE with in-batch negatives: q_emb/d_emb (b, dim), row i of q
    matches row i of d."""
    q = q_emb / jnp.maximum(jnp.linalg.norm(q_emb, axis=-1, keepdims=True), 1e-9)
    d = d_emb / jnp.maximum(jnp.linalg.norm(d_emb, axis=-1, keepdims=True), 1e-9)
    sims = (q @ d.T) / temperature  # (b, b)
    labels = jnp.arange(q.shape[0])
    logp = jax.nn.log_softmax(sims, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


# -- sharding helpers -----------------------------------------------------------------

def param_shardings(model: nn.Module, mesh: Mesh, init_args: tuple,
                    init_kwargs: dict):
    """Derive NamedShardings for params from the flax logical metadata."""
    abs_vars = jax.eval_shape(
        functools.partial(model.init, jax.random.PRNGKey(0), *init_args,
                          **init_kwargs))
    specs = nn.get_partition_spec(abs_vars)["params"]
    return nn.logical_to_mesh_sharding(specs, mesh, LOGICAL_RULES)


def init_sharded_params(model: nn.Module, mesh: Mesh, seed: int,
                        init_args: tuple, init_kwargs: dict):
    """Initialize params directly into their shardings (jit out_shardings)."""
    shardings = param_shardings(model, mesh, init_args, init_kwargs)

    def init_fn():
        variables = model.init(jax.random.PRNGKey(seed), *init_args,
                               **init_kwargs)
        return nn.meta.unbox(variables["params"])

    params = jax.jit(init_fn, out_shardings=shardings)()
    return params, shardings


# -- train steps ------------------------------------------------------------------------

def make_decoder_train_step(model, mesh: Mesh,
                            optimizer: Optional[optax.GradientTransformation] = None,
                            learning_rate: float = 1e-4,
                            seq_parallel: bool = True,
                            seed: int = 0,
                            example_batch: Optional[Dict] = None,
                            router_aux_coef: float = 0.02
                            ) -> Tuple[TrainState, Callable]:
    """Build (state, jitted step) for causal-LM training on the mesh.

    The returned step takes (state, batch{'ids','mask'}) with batch arrays
    sharded P('data', None) and returns (state, metrics). For sparse-MoE
    decoders the router load-balancing auxiliary loss is added with weight
    ``router_aux_coef`` (HF router_aux_loss_coef default 0.02) and reported
    in metrics as ``aux_loss``."""
    optimizer = optimizer or optax.adamw(learning_rate)
    if example_batch is None:
        example_batch = {"ids": np.zeros((mesh.shape["data"], 16), np.int32),
                         "mask": np.ones((mesh.shape["data"], 16), np.int32)}
    s = example_batch["ids"].shape[1]
    init_args = (jnp.zeros((1, s), jnp.int32),)
    init_kwargs = {"positions": jnp.arange(s)}
    params, p_shard = init_sharded_params(model, mesh, seed, init_args, init_kwargs)
    opt_state = jax.jit(
        optimizer.init,
        out_shardings=None)(params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt_state)

    batch_sharding = {
        "ids": NamedSharding(mesh, P("data", None)),
        "mask": NamedSharding(mesh, P("data", None)),
    }

    num_experts = int(getattr(getattr(model, "cfg", None), "num_experts",
                              0) or 0)
    moe = num_experts > 0 and router_aux_coef > 0.0

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            seq = batch["ids"].shape[1]
            out = model.apply({"params": params}, batch["ids"],
                              positions=jnp.arange(seq),
                              attn_bias=causal_bias(seq, seq),
                              mutable=["intermediates"] if moe else False)
            aux = jnp.zeros((), jnp.float32)
            if moe:
                out, variables = out
                aux = moe_load_balancing_loss(
                    variables["intermediates"], num_experts)
            logits = out["logits"]
            if seq_parallel:
                # SP: loss computed with logits sequence-sharded over 'corpus'
                logits = jax.lax.with_sharding_constraint(
                    logits, NamedSharding(mesh, P("data", "corpus", None)))
            lm = decoder_loss(logits, batch["ids"], batch["mask"])
            return lm + router_aux_coef * aux, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": gnorm}
        if moe:
            metrics["aux_loss"] = aux
        return (state.replace(step=state.step + 1, params=new_params,
                              opt_state=new_opt), metrics)

    step = jax.jit(step_fn, in_shardings=(None, batch_sharding),
                   donate_argnums=(0,))
    return state, step


def make_encoder_train_step(model, mesh: Mesh,
                            optimizer: Optional[optax.GradientTransformation] = None,
                            learning_rate: float = 2e-5,
                            temperature: float = 0.05,
                            seed: int = 0,
                            example_batch: Optional[Dict] = None
                            ) -> Tuple[TrainState, Callable]:
    """Contrastive fine-tuning step for the sentence encoder: batch of
    (query_ids, doc_ids) pairs, in-batch negatives, mean-pooled embeddings."""
    from ragmeup_tpu.models.encoder import mean_pool
    optimizer = optimizer or optax.adamw(learning_rate)
    if example_batch is None:
        b = mesh.shape["data"] * 2
        example_batch = {"q_ids": np.zeros((b, 16), np.int32),
                         "q_mask": np.ones((b, 16), np.int32),
                         "d_ids": np.zeros((b, 16), np.int32),
                         "d_mask": np.ones((b, 16), np.int32)}
    s = example_batch["q_ids"].shape[1]
    init_args = (jnp.zeros((1, s), jnp.int32), jnp.ones((1, s), jnp.int32))
    params, p_shard = init_sharded_params(model, mesh, seed, init_args, {})
    opt_state = jax.jit(optimizer.init)(params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt_state)

    batch_sharding = {k: NamedSharding(mesh, P("data", None))
                      for k in example_batch}

    def embed(params, ids, mask):
        hidden = model.apply({"params": params}, ids, mask)
        return mean_pool(hidden.astype(jnp.float32), mask)

    def step_fn(state: TrainState, batch):
        def loss_fn(params):
            q = embed(params, batch["q_ids"], batch["q_mask"])
            d = embed(params, batch["d_ids"], batch["d_mask"])
            return contrastive_loss(q, d, temperature)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (state.replace(step=state.step + 1, params=new_params,
                              opt_state=new_opt),
                {"loss": loss})

    step = jax.jit(step_fn, in_shardings=(None, batch_sharding),
                   donate_argnums=(0,))
    return state, step
