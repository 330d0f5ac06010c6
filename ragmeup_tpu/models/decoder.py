"""Llama-class causal decoder in flax: the local chat LLM.

TPU-native replacement for the reference's in-process HF LLM
(``RAGHelper_local.py:42-105``: Meta-Llama-3.1-8B-Instruct, 4-bit nf4
bitsandbytes, HF text-generation pipeline). Here:

- the forward is a jit'd flax module (RMSNorm → GQA attention with RoPE →
  SwiGLU), bf16 activations on the MXU;
- weight-only int8 quantization (per-output-channel scales) replaces
  bitsandbytes nf4 (``RAGHelper_local.py:76-89``) — dequant fuses into the
  matmul under XLA;
- generation = one jit'd prefill over the (length-bucketed) prompt + a
  jit'd single-token decode step over a static-shape KV cache, with
  temperature sampling and repetition penalty matching the reference's
  pipeline knobs (``.env.template:45-47``);
- ``capture_weights`` returns per-layer attention matrices for the
  attention-provenance method (``provenance.py:19-88``).

Params carry logical partitioning names; TP shards heads/ffn over the
``model`` mesh axis (see parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ragmeup_tpu.models.layers import RMSNorm, dense_init, embed_init


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    intermediate_size: int = 14336
    rope_theta: float = 500000.0
    max_seq_len: int = 8192
    rms_eps: float = 1e-5
    dtype: str = "bfloat16"
    quantization: str = "none"  # none | int8 | int4
    head_quantization: str = "none"  # none | int8 (untied lm_head only)
    # int4 scale-group size along the input dim. 0 = auto (128-class,
    # nf4-quality). Setting it to the K-tile (512) selects the kernel's
    # ~1.5x faster output-scaled path at coarser quant granularity —
    # measure logit quality on your checkpoint before shipping it.
    int4_group: int = 0
    # W4A8: int8 activations + int8 MXU dots over unpacked nibbles with
    # per-tile output scaling — the fastest int4 path measured (74.0 vs
    # 80.2 us/matmul at the 8B MLP decode shape; int4_variant_sweep.py
    # variant H). Needs int4_group == tile (512); adds ~0.8% activation
    # quant error per matmul — check logit quality per checkpoint.
    int4_w4a8: bool = False
    tie_embeddings: bool = True  # Llama-3.1-8B+ uses an untied lm_head
    # store Q/K/V as one projection and gate/up as one (column-concatenated
    # kernels; numerically identical, ~40% fewer matmul ops per token -
    # batch-1 decode here is per-op latency bound)
    fused_projections: bool = False
    # pallas fused int8 dequant-matmul for small-row (decode) matmuls.
    # Slope-timed truth (scripts/int8_tile_sweep.py, round 2): with
    # (1024,1024) tiles it streams 746-1074 GB/s vs XLA dequant-dot's
    # 534-677 -> 91.5 vs 83.8 tok/s single-stream at 8B. (Round 1 called
    # it net-negative from fetch-RTT-contaminated timings.) load_local_llm
    # enables it for int8 checkpoints; under a mesh it runs on per-shard
    # local shapes inside shard_map (QuantDense._tp_shard_matmul).
    quant_kernel: bool = False
    # Pallas flash-attention for prefill (causal; scores never hit HBM).
    # Block sizes are chosen adaptively up to (512, 1024) — measured on
    # v5e at 8B shapes: bq=512/bk=1024 is 4.6x faster than XLA attention
    # at seq 4096, while the old fixed 128 blocks were 1.2x SLOWER
    # (docs/BENCH_NOTES.md "flash prefill").
    use_flash: bool = False
    flash_block: int = 128  # minimum/granularity; kept for test overrides
    # Qwen2-class checkpoints (Qwen2/Qwen2.5) put bias terms on the
    # Q/K/V projections (o_proj and the MLP stay bias-free) — the only
    # structural difference from Llama in that family.
    qkv_bias: bool = False
    # Mistral-class sliding-window attention: token i attends only
    # positions (i - window, i]. 0 = full causal (Llama, Mistral v0.2+,
    # stock Qwen2 configs with use_sliding_window=false). When the KV
    # span fits inside the window the sliding mask EQUALS the causal
    # mask, so the flash/ring prefill fast paths stay exact and engage
    # only under that condition; the paged kernel and the dense einsum
    # path mask the lower bound directly at any length.
    sliding_window: int = 0
    # Explicit per-head width for checkpoints where head_dim is NOT
    # hidden_size / num_heads (Mistral-Nemo-class; HF config key
    # "head_dim"). 0 = derive the classic way.
    head_dim_override: int = 0
    # MLP activation on the gate branch: silu (Llama/Mistral/Qwen/Phi-3),
    # gelu_tanh (Gemma's gelu_pytorch_tanh), gelu (exact erf).
    act_fn: str = "silu"
    # RMSNorm scale offset: Gemma-family norms multiply by (1 + weight),
    # so the loaded weight is an offset from 1. 0.0 = Llama convention.
    norm_offset: float = 0.0
    # Gemma-family: scale token embeddings by sqrt(hidden_size) after the
    # lookup (HF casts the normalizer to the activation dtype first).
    embed_scale: bool = False
    # Qwen3-class per-head RMSNorm on Q and K (over head_dim, before
    # rope); weights live at attention.{q,k}_norm.scale.
    qk_norm: bool = False
    # Gemma-2-class attention-logit softcapping: scaled logits pass
    # through cap*tanh(x/cap) BEFORE the causal mask. 0 = off. Softcapped
    # attention disables the flash/ring fast paths (the kernels compute
    # plain softmax); the paged kernels support it natively.
    attn_softcap: float = 0.0
    # Gemma-2-class final-logit softcapping on the lm_head output.
    final_softcap: float = 0.0
    # Attention score scale override: Gemma-2 scales by
    # query_pre_attn_scalar**-0.5 instead of head_dim**-0.5. 0 = default.
    query_scale: float = 0.0
    # Gemma-2-class block structure: norms AROUND attention and MLP
    # (input_norm -> attn -> post_attn_norm -> +residual;
    #  pre_ffw_norm -> mlp -> post_ffw_norm -> +residual) instead of the
    # Llama two-norm layout.
    post_norms: bool = False
    # Per-layer sliding windows (Gemma-2 alternates sliding/full layers —
    # HF config key layer_types). Empty = every layer uses
    # ``sliding_window``. Entries: 0 = full attention, N = window size.
    layer_windows: tuple = ()
    # Sparse MoE (Mixtral / Qwen3-MoE family): num_experts > 0 swaps the
    # dense MLP for top-k routed experts (LlamaMoeMlp). Expert weights are
    # stacked (E, h, f) tensors; decode gathers only the routed experts'
    # tiles (ops/moe_matmul.py), prefill runs an all-experts batched
    # einsum with the 'expert' axis sharded over the mesh (EP).
    num_experts: int = 0
    num_experts_per_tok: int = 2
    moe_intermediate_size: int = 0  # 0 = intermediate_size
    # renormalize the kept top-k routing weights to sum 1 (Mixtral always
    # does; Qwen-MoE gates it behind config norm_topk_prob)
    norm_topk_prob: bool = True
    # per-layer MoE flags (Qwen3-MoE mlp_only_layers / decoder_sparse_step
    # keep some layers dense). Empty = every layer MoE when num_experts>0.
    moe_layers: tuple = ()
    # prefill compute path. "auto"/"off": all-experts einsum — measured
    # on v5e it runs at ~160 TFLOP/s (MXU peak) and beats the grouped
    # pallas GEMM at every tested shape DESPITE the E/top_k FLOP
    # multiple (Mixtral shape: 8.9 vs 12.1 ms bf16, 8.3 vs 8.7 int8;
    # E=64/top8: 2.0 vs 1.8-2.6 ms across runs — scripts/
    # moe_decode_bench.py --prefill). "on" forces the grouped kernel
    # (ops/moe_matmul.moe_grouped_matmul): routed-only FLOPs with
    # weights streamed once, currently held back by per-tile loop
    # overhead in Mosaic — the lever to revisit on a libtpu upgrade.
    moe_grouped: str = "auto"
    # RoPE frequency scaling. Meta-Llama-3.1+ checkpoints ship a
    # rope_scaling block in config.json (rope_type "llama3"); without the
    # transform, logits diverge from HF at every context length.
    rope_scaling_type: str = "none"  # none | llama3 | linear
    rope_scaling_factor: float = 1.0
    rope_scaling_low_freq_factor: float = 1.0
    rope_scaling_high_freq_factor: float = 4.0
    rope_scaling_original_max_position: int = 8192

    @property
    def head_dim(self) -> int:
        return self.head_dim_override or self.hidden_size // self.num_heads

    @property
    def jdtype(self):
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.dtype]

    @staticmethod
    def tiny(**kw) -> "LlamaConfig":
        base = dict(vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
                    num_kv_heads=2, intermediate_size=128, max_seq_len=256,
                    rope_theta=10000.0)
        base.update(kw)
        return LlamaConfig(**base)


def scale_inv_freq_llama3(inv: np.ndarray, factor: float,
                          low_freq_factor: float, high_freq_factor: float,
                          original_max_position: int) -> np.ndarray:
    """Llama-3.1 rope scaling (matches HF _compute_llama3_parameters):
    long wavelengths divided by `factor`, short ones untouched, smooth
    interpolation between the two wavelength thresholds."""
    low_wavelen = original_max_position / low_freq_factor
    high_wavelen = original_max_position / high_freq_factor
    wavelen = 2.0 * np.pi / inv
    smooth = (original_max_position / wavelen - low_freq_factor) / \
        max(high_freq_factor - low_freq_factor, 1e-9)
    interp = (1.0 - smooth) * inv / factor + smooth * inv
    out = np.where(wavelen > low_wavelen, inv / factor, inv)
    mid = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
    return np.where(mid, interp, out)


def rope_inv_freq(head_dim: int, theta: float,
                  cfg: "LlamaConfig | None" = None) -> np.ndarray:
    """(hd/2,) inverse frequencies with any configured scaling applied."""
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    if cfg is not None and cfg.rope_scaling_type == "llama3":
        inv = scale_inv_freq_llama3(
            inv, cfg.rope_scaling_factor, cfg.rope_scaling_low_freq_factor,
            cfg.rope_scaling_high_freq_factor,
            cfg.rope_scaling_original_max_position)
    elif cfg is not None and cfg.rope_scaling_type == "linear":
        inv = inv / cfg.rope_scaling_factor
    return inv.astype(np.float32)


def rope_freqs(head_dim: int, max_len: int, theta: float,
               cfg: "LlamaConfig | None" = None
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Full (max_len, hd/2) cos/sin tables — tests and host-side callers.
    The model itself computes cos/sin at the requested positions instead
    (see LlamaModel): a 131072-position table embedded 67 MB of constants
    into every program and took seconds of numpy per trace."""
    inv = rope_inv_freq(head_dim, theta, cfg).astype(np.float64)
    t = np.arange(max_len, dtype=np.float64)
    ang = np.outer(t, inv)  # (L, hd/2)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (b, s, h, hd); cos/sin: (s, hd/2) shared, or (b, s, hd/2) for
    per-sequence positions (batched paged decode)."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    if cos.ndim == 3:
        c = cos[:, :, None, :]
        s = sin[:, :, None, :]
    else:
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def _tp_axis(logical_name: str):
    """Logical param axis → TP mesh axis (mirrors parallel.mesh
    LOGICAL_RULES for the axes QuantDense uses)."""
    return "model" if logical_name in ("qkv", "kv", "mlp") else None


class QuantDense(nn.Module):
    """Weight-only int8/int4 linear (per-output-channel scale); falls back
    to a plain kernel when quantization is off. int4 is the TPU-native
    counterpart of the reference's 4-bit nf4 (RAGHelper_local.py:76-89).

    With ``tp_mesh`` set, the pallas kernels run on per-shard LOCAL shapes
    inside ``shard_map`` (Megatron column/row parallel): column-parallel
    layers (embed→qkv/kv/mlp) keep the output sharded, row-parallel layers
    (qkv/mlp→embed) psum partial products over the 'model' axis. This is
    what lets TP inference keep the measured int8 kernel path instead of
    dropping to XLA dequant (round-2 verdict weak #2 / next #3) — pallas
    has no GSPMD partitioning rule, but under shard_map partitioning is
    manual and the kernel only ever sees local shapes."""

    features: int
    names: Tuple[str, str]
    quantize: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    bits: int = 8
    use_kernel: bool = False
    q_group: int = 0  # int4 scale-group (0 = auto; see LlamaConfig)
    a8: bool = False  # W4A8 int4 path (see LlamaConfig.int4_w4a8)
    # bias term (Qwen2-class q/k/v projections). Stays f32 under every
    # quantization mode — it is O(features) and added AFTER the matmul
    # (and after the TP psum/allgather, at global shape).
    use_bias: bool = False
    tp_mesh: Optional[object] = None

    def _tp_shard_matmul(self, x2, w, s, matmul, local_ok):
        """Run `matmul(x_local, w_local, s_local)` under shard_map with
        Megatron specs derived from the logical names. Returns None when
        this layer's sharding doesn't fit the manual path (caller falls
        back to the GSPMD XLA implementation)."""
        from jax.sharding import PartitionSpec as P

        from ragmeup_tpu.parallel.mesh import shard_map_compat
        mesh = self.tp_mesh
        ntp = mesh.shape["model"]
        ax_in = _tp_axis(self.names[0])
        ax_out = _tp_axis(self.names[1])
        if ax_in and ax_out:  # both sharded: no Megatron rule — GSPMD
            return None
        d_in_l = x2.shape[1] // (ntp if ax_in else 1)
        d_out_l = self.features // (ntp if ax_out else 1)
        if not local_ok(d_in_l, d_out_l):
            return None
        # w rows follow ax_in, w cols follow ax_out (both int8 (k, n) and
        # packed int4 (k/2, n) layouts shard this way; the int4 pack tile
        # divides the local k by the local_ok check)
        w_spec = P(ax_in, ax_out)
        s_spec = P(ax_out) if s.ndim == 1 else P(ax_in, ax_out)
        if ax_out:  # column-parallel: replicate x, keep output sharded
            fn = shard_map_compat(
                lambda xl, wl, sl: matmul(xl, wl, sl), mesh=mesh,
                in_specs=(P(), w_spec, s_spec),
                out_specs=P(None, ax_out))
        else:       # row-parallel: x sharded on features; psum partials
            fn = shard_map_compat(
                lambda xl, wl, sl: jax.lax.psum(matmul(xl, wl, sl), "model"),
                mesh=mesh,
                in_specs=(P(None, "model"), w_spec, s_spec),
                out_specs=P())
        return fn(x2, w, s)

    @nn.compact
    def __call__(self, x):
        d_in = x.shape[-1]
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.with_logical_partitioning(
                nn.initializers.zeros_init(), (self.names[1],)),
                (self.features,), jnp.float32)

        def _b(out):
            return out if bias is None else (out + bias).astype(out.dtype)
        if self.quantize and self.bits == 4:
            # packed int4 + group-wise scales (the TPU-native nf4; see
            # ops/quant_matmul.py — native jnp.int4 arrays can't cross jit
            # boundaries under the axon plugin, hence explicit packing)
            from ragmeup_tpu.ops.quant_matmul import (int4_matmul,
                                                      int4_tiling,
                                                      unpack_int4)
            tile_k, group = int4_tiling(d_in)
            if self.q_group:
                from ragmeup_tpu.ops.quant_matmul import int4_group_for
                group = int4_group_for(tile_k, self.q_group)
            w = self.param("kernel_p", nn.with_logical_partitioning(
                nn.initializers.zeros_init(), self.names),
                (d_in // 2, self.features), jnp.int8)
            s = self.param("gscale", nn.with_logical_partitioning(
                nn.initializers.ones_init(), self.names),
                (d_in // group, self.features), jnp.float32)
            lead = x.shape[:-1]
            rows = 1
            for dim in lead:
                rows *= dim
            x2 = x.reshape(rows, d_in).astype(self.dtype)
            if self.tp_mesh is not None:
                # local tiles must match the GLOBAL pack layout: the packed
                # k-tile (tile_k) and scale group must divide the local k
                import functools as _ft
                out = self._tp_shard_matmul(
                    x2, w, s, _ft.partial(int4_matmul, a8=self.a8),
                    local_ok=lambda ki, ko: (ki % tile_k == 0
                                             and ki % group == 0
                                             and ko % 512 == 0))
                if out is None:
                    wd = unpack_int4(w, tile_k).astype(self.dtype)
                    sd = jnp.repeat(s.astype(self.dtype), group, axis=0)
                    out = jnp.dot(x2, wd * sd,
                                  preferred_element_type=self.dtype)
                return _b(out.reshape(lead + (self.features,)))
            out = int4_matmul(x2, w, s, a8=self.a8)
            return _b(out.reshape(lead + (self.features,)))
        if self.quantize:
            w = self.param("kernel_q", nn.with_logical_partitioning(
                nn.initializers.zeros_init(), self.names),
                (d_in, self.features), jnp.int8)
            s = self.param("scale", nn.with_logical_partitioning(
                nn.initializers.ones_init(), (self.names[1],)),
                (self.features,), jnp.float32)
            lead = x.shape[:-1]
            rows = 1
            for dim in lead:
                rows *= dim
            if self.use_kernel and rows <= 8:
                from ragmeup_tpu.ops.quant_matmul import int8_matmul
                x2 = x.reshape(rows, d_in).astype(self.dtype)
                if self.tp_mesh is not None:
                    out = self._tp_shard_matmul(
                        x2, w, s, int8_matmul,
                        local_ok=lambda ki, ko: (ki % 512 == 0
                                                 and ko % 512 == 0))
                    if out is not None:
                        return _b(out.reshape(lead + (self.features,)))
                elif d_in % 512 == 0 and self.features % 512 == 0:
                    # decode-time fast path: fused dequant matmul reads
                    # int8 weights once (XLA otherwise materializes bf16
                    # weights)
                    out = int8_matmul(x2, w, s)
                    return _b(out.reshape(lead + (self.features,)))
            wd = w.astype(self.dtype) * s.astype(self.dtype)[None, :]
            # collapse leading dims explicitly: XLA's dequant+dot fusion
            # pessimizes on a 3-D (b, 1, k) dot at small batch (measured
            # +6 ms/step at 8B batch-8 decode vs the same 8 rows as 2-D)
            x2 = x.reshape(rows, d_in)
            out = jnp.dot(x2, wd, preferred_element_type=self.dtype)
            return _b(out.reshape(lead + (self.features,)))
        w = self.param("kernel", dense_init(self.names),
                       (d_in, self.features), jnp.float32)
        return _b(jnp.dot(x, w.astype(self.dtype),
                          preferred_element_type=self.dtype))


class LlamaAttention(nn.Module):
    cfg: LlamaConfig
    sp_mesh: Optional[object] = None  # sequence-parallel prefill mesh
    tp_mesh: Optional[object] = None  # tensor-parallel kernel mesh
    # per-layer sliding window override (Gemma-2 alternates sliding/full
    # layers): -1 = use cfg.sliding_window, 0 = full, N = window
    window: int = -1

    def _paged_tp(self, q, k, v, k_pages, v_pages, page_idx, lengths,
                  pages, slots, s, b, hd, win, sm_over, softcap):
        """Paged K/V write + paged attention under a TP mesh.

        The page pools' kv-head dim and q/k/v's head dims shard over
        'model'; page tables/lengths/pages/slots replicate. All three
        serving sub-paths (batched decode s==1, batched chunk-append
        pages.ndim==2, single-sequence chunk-append) run their existing
        kernels unchanged on the per-device LOCAL head slices — the
        scatter and the attention touch only local heads, so the body
        needs no collective (o_proj's row-parallel psum follows).
        Returns (kp, vp, attn (b, s, nh, hd))."""
        from jax.sharding import PartitionSpec as P

        from ragmeup_tpu.ops.paged_attention import (
            paged_attention, paged_attention_chunk, paged_update_chunk,
            paged_update_token)
        from ragmeup_tpu.parallel.mesh import shard_map_compat
        nh = q.shape[2]
        if s == 1:
            def local_fn(q, k, v, kp, vp, page_idx, lengths, pages, slots):
                kp = paged_update_token(
                    kp, jnp.transpose(k[:, 0], (1, 0, 2)), pages, slots, hd)
                vp = paged_update_token(
                    vp, jnp.transpose(v[:, 0], (1, 0, 2)), pages, slots, hd)
                attn = paged_attention(q[:, 0], kp, vp, page_idx, lengths,
                                       window=win, sm_scale=sm_over,
                                       softcap=softcap)
                return kp, vp, attn[:, None]
        elif pages.ndim == 2:
            def local_fn(q, k, v, kp, vp, page_idx, lengths, pages, slots):
                kp = paged_update_chunk(
                    kp, jnp.transpose(k, (2, 0, 1, 3)), pages, slots, hd)
                vp = paged_update_chunk(
                    vp, jnp.transpose(v, (2, 0, 1, 3)), pages, slots, hd)
                attn = paged_attention_chunk(q, kp, vp, page_idx, lengths,
                                             window=win, sm_scale=sm_over,
                                             softcap=softcap)
                return kp, vp, attn
        else:
            assert b == 1, "paged chunk-append requires batch 1"

            def local_fn(q, k, v, kp, vp, page_idx, lengths, pages, slots):
                kp = paged_update_token(
                    kp, jnp.transpose(k[0], (1, 0, 2)), pages, slots, hd)
                vp = paged_update_token(
                    vp, jnp.transpose(v[0], (1, 0, 2)), pages, slots, hd)
                attn = paged_attention_chunk(q, kp, vp, page_idx, lengths,
                                             window=win, sm_scale=sm_over,
                                             softcap=softcap)
                return kp, vp, attn

        hsp = P(None, None, "model", None)   # (b, s, heads, hd)
        psp = P("model", None, None, None)   # (nkv, pages, rows, cols)
        fn = shard_map_compat(
            local_fn, mesh=self.tp_mesh,
            in_specs=(hsp, hsp, hsp, psp, psp, P(), P(), P(), P()),
            out_specs=(psp, psp, hsp))
        return fn(q, k, v, k_pages, v_pages, page_idx, lengths, pages, slots)

    @nn.compact
    def __call__(self, x, cos, sin, attn_bias=None, cache=None,
                 cache_pos=None, capture_weights: bool = False,
                 paged_state=None, ring: bool = False):
        c = self.cfg
        win = c.sliding_window if self.window < 0 else self.window
        sm_over = c.query_scale or None  # None = kernels default 1/sqrt(hd)
        b, s, _ = x.shape
        hd, nh, nkv = c.head_dim, c.num_heads, c.num_kv_heads
        quant = c.quantization in ("int8", "int4")
        bits = 4 if c.quantization == "int4" else 8
        if c.fused_projections:
            qkv = QuantDense((nh + 2 * nkv) * hd, ("embed", "qkv"), quant,
                             c.jdtype, bits, c.quant_kernel,
                             q_group=c.int4_group, a8=c.int4_w4a8, tp_mesh=self.tp_mesh,
                             use_bias=c.qkv_bias, name="qkv_proj")(x)
            q = qkv[..., :nh * hd]
            k = qkv[..., nh * hd:(nh + nkv) * hd]
            v = qkv[..., (nh + nkv) * hd:]
        else:
            q = QuantDense(nh * hd, ("embed", "qkv"), quant, c.jdtype, bits, c.quant_kernel, q_group=c.int4_group, a8=c.int4_w4a8, tp_mesh=self.tp_mesh, use_bias=c.qkv_bias, name="q_proj")(x)
            k = QuantDense(nkv * hd, ("embed", "kv"), quant, c.jdtype, bits, c.quant_kernel, q_group=c.int4_group, a8=c.int4_w4a8, tp_mesh=self.tp_mesh, use_bias=c.qkv_bias, name="k_proj")(x)
            v = QuantDense(nkv * hd, ("embed", "kv"), quant, c.jdtype, bits, c.quant_kernel, q_group=c.int4_group, a8=c.int4_w4a8, tp_mesh=self.tp_mesh, use_bias=c.qkv_bias, name="v_proj")(x)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, nkv, hd)
        v = v.reshape(b, s, nkv, hd)
        if c.qk_norm:
            # Qwen3-class: per-head RMSNorm over head_dim BEFORE rope (HF
            # Qwen3Attention applies q_norm/k_norm on the (.., heads, hd)
            # view); f32 internally, back to the model dtype — exactly the
            # shared RMSNorm semantics, applied on the trailing hd axis.
            q = RMSNorm(c.rms_eps, c.jdtype, name="q_norm")(q)
            k = RMSNorm(c.rms_eps, c.jdtype, name="k_norm")(k)
        # rope rotates in f32 (cos/sin tables), then back to the model
        # dtype — matches HF semantics and keeps attention inputs bf16
        # (f32 q/k doubled the flash kernel's DMA and VMEM footprint)
        q = apply_rope(q, cos, sin).astype(c.jdtype)
        k = apply_rope(k, cos, sin).astype(c.jdtype)

        if paged_state is not None:
            # paged-pool attention. s == 1: batched decode (one new token
            # per sequence). s > 1 (b == 1): CHUNK-APPEND — the chunked
            # prefill writes s prompt tokens into the pool then attends
            # them against the full prefix (pages/slots give each token's
            # destination; padded tail tokens point at a trash page and
            # sit beyond `lengths`, so no real query row reads them).
            # Chunk-append requires the one-token-per-row page layout
            # (hd % 128 == 0): the batched writer scatters rows, and
            # packed rows shared by two chunk tokens would collide.
            from ragmeup_tpu.ops.paged_attention import (
                paged_attention, paged_attention_chunk, paged_update_chunk,
                paged_update_token)
            k_pages, v_pages, page_idx, lengths, pages, slots = paged_state
            if self.tp_mesh is not None:
                # mesh-mode serving: the page pools shard their kv-head dim
                # over 'model' (PagedKVCache(mesh=...)), q/k/v arrive head-
                # sharded from the column-parallel projections, and the
                # pallas paged kernel has no GSPMD rule — so the K/V write
                # + paged attention run on per-shard LOCAL shapes inside
                # shard_map (the QuantDense._tp_shard_matmul recipe). Page
                # tables/lengths/slots are replicated; each device scatters
                # and attends only its own heads, and the psum happens
                # later in the row-parallel o_proj. Round-3 verdict #2:
                # the serving engine (paged decode, waves, spec-waves,
                # chunked prefill) now runs models that need
                # parallel.model_axis > 1.
                kp, vp, attn = self._paged_tp(
                    q, k, v, k_pages, v_pages, page_idx, lengths, pages,
                    slots, s, b, hd, win, sm_over, c.attn_softcap)
                out = attn.reshape(b, s, nh * hd).astype(c.jdtype)
            elif s == 1:
                kp = paged_update_token(
                    k_pages, jnp.transpose(k[:, 0], (1, 0, 2)), pages, slots,
                    hd)
                vp = paged_update_token(
                    v_pages, jnp.transpose(v[:, 0], (1, 0, 2)), pages, slots,
                    hd)
                attn = paged_attention(q[:, 0], kp, vp, page_idx, lengths,
                                       window=win, sm_scale=sm_over,
                                       softcap=c.attn_softcap)
                out = attn[:, None].reshape(b, 1, nh * hd).astype(c.jdtype)
            elif pages.ndim == 2:
                # BATCHED chunk-append (pages/slots (b, s)): s tokens for
                # each of b sequences in one scatter + one batched chunk
                # attention — the batched prefill writer (round-2 verdict
                # #7) and the speculative-wave verify forward both ride
                # this path. One-token-per-row layout required (the
                # batched writer refuses packed rows).
                kp = paged_update_chunk(
                    k_pages, jnp.transpose(k, (2, 0, 1, 3)), pages, slots,
                    hd)
                vp = paged_update_chunk(
                    v_pages, jnp.transpose(v, (2, 0, 1, 3)), pages, slots,
                    hd)
                attn = paged_attention_chunk(q, kp, vp, page_idx, lengths,
                                             window=win, sm_scale=sm_over,
                                             softcap=c.attn_softcap)
                out = attn.reshape(b, s, nh * hd).astype(c.jdtype)
            else:
                # the single-sequence chunk writer scatters ONE sequence's
                # rows; a b > 1 chunk append with 1-D pages would silently
                # attend unwritten K/V
                assert b == 1, "paged chunk-append requires batch 1"
                kp = paged_update_token(
                    k_pages, jnp.transpose(k[0], (1, 0, 2)), pages, slots,
                    hd)
                vp = paged_update_token(
                    v_pages, jnp.transpose(v[0], (1, 0, 2)), pages, slots,
                    hd)
                attn = paged_attention_chunk(q, kp, vp, page_idx, lengths,
                                             window=win, sm_scale=sm_over,
                                             softcap=c.attn_softcap)
                out = attn.reshape(b, s, nh * hd).astype(c.jdtype)
            out = QuantDense(c.hidden_size, ("qkv", "embed"), quant, c.jdtype,
                             bits, c.quant_kernel, q_group=c.int4_group, a8=c.int4_w4a8,
                             tp_mesh=self.tp_mesh, name="o_proj")(out)
            return out, (kp, vp), None

        new_cache = None
        if cache is not None:
            ck, cv = cache  # (b, L, nkv, hd)
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_pos, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_pos, 0, 0))
            k, v = ck, cv
            new_cache = (ck, cv)

        rep = nh // nkv
        scale = c.query_scale or 1.0 / np.sqrt(hd)
        kv_len = k.shape[1]
        ring_n = (self.sp_mesh.shape["corpus"]
                  if self.sp_mesh is not None else 0)
        # `ring` is only set by the full prefill (queries at absolute
        # positions 0..s-1 — the ring derives positions from shard index,
        # so offset chunks like the speculative verify must not take it)
        # sliding window (Mistral-class): when the whole KV span fits in
        # the window the sliding mask EQUALS the causal mask, so the
        # flash/ring fast paths stay exact; past that they hand off to the
        # einsum path, which masks the lower bound explicitly.
        win_ok = win == 0 or kv_len <= win
        # softcapped attention (Gemma-2) keeps the einsum path: the
        # flash/ring kernels compute a plain softmax
        cap_ok = c.attn_softcap == 0
        use_ring = (ring and ring_n > 1 and s > 1 and win_ok and cap_ok
                    and capture_weights in (False, None)
                    and s % ring_n == 0 and kv_len % ring_n == 0)
        use_flash = (c.use_flash and capture_weights in (False, None, "qk")
                     and s > 1 and win_ok and cap_ok
                     and s % c.flash_block == 0
                     and kv_len % c.flash_block == 0)
        if use_ring:
            # sequence-parallel prefill: the long RAG prompt shards over
            # the 'corpus' axis and KV blocks rotate over ICI (ring
            # attention), composing with TP (each chip rings only its own
            # heads). Padded keys sit past every real query row, so the
            # ring's causal mask subsumes the padding mask for the rows
            # that are read (same argument as the flash path). Raises the
            # practical max_document_limit instead of truncating — the
            # reference's avoidance (RAGHelper_cloud.py:188-195).
            from ragmeup_tpu.ops.attention import ring_attention
            kr = jnp.repeat(k, rep, axis=2)
            vr = jnp.repeat(v, rep, axis=2)
            # fold HEAD-major (nh*b, s, hd): the 'model' shard on dim 0
            # then cuts on head boundaries, so the fold stays expressible
            # when q/k/v are already TP-head-sharded, and any batch size
            # rides the ring (padded keys sit past every real query row of
            # their own batch row, so the causal mask subsumes padding —
            # same argument as the flash path, any b)
            qf = q.transpose(2, 0, 1, 3).reshape(nh * b, s, hd)
            kf = kr.transpose(2, 0, 1, 3).reshape(nh * b, kv_len, hd)
            vf = vr.transpose(2, 0, 1, 3).reshape(nh * b, kv_len, hd)
            of = ring_attention(self.sp_mesh, qf, kf, vf,
                                axis_name="corpus", head_axis="model")
            out = of.reshape(nh, b, s, hd).transpose(1, 2, 0, 3)
            weights = None
        elif use_flash:
            # prefill fast path: causal flash kernel; any padded keys sit at
            # positions > every real query row, so the causal mask subsumes
            # the padding mask for the rows that are read. Blocks scale up
            # with seq (measured: large blocks are the whole win on v5e).
            from ragmeup_tpu.ops.attention import (flash_attention,
                                                   flash_attention_gqa)

            def _blk(n, cap):
                blk = c.flash_block
                while blk * 2 <= min(n, cap) and n % (blk * 2) == 0:
                    blk *= 2
                return blk

            def _flash_local(ql, kl, vl):
                # ql/kl/vl: (b, s, heads_local, hd) — full arrays single-
                # chip, per-shard head slices under TP shard_map
                nh_l = ql.shape[2]
                nkv_l = kl.shape[2]
                rep_l = nh_l // nkv_l
                if rep_l > 1:
                    # GQA kernel: K/V stream at native kv-head count (one
                    # DMA per block instead of rep; q heads of a kv head
                    # share the grid cell; head h uses kv h//rep). Score
                    # tile is (rep*block_q, block_k) f32 in VMEM, so
                    # block_q shrinks by rep — HARD cap rep*bq <= 512
                    # (rep=8 needs bq=64; 128 OOMs ~16MB VMEM).
                    bq_cap = max(8, 512 // rep_l)
                    bq = min(c.flash_block, bq_cap)
                    while bq * 2 <= min(s, bq_cap) and s % (bq * 2) == 0:
                        bq *= 2
                    qg = ql.transpose(0, 2, 1, 3).reshape(
                        b * nkv_l, rep_l, s, hd)
                    kf = kl.transpose(0, 2, 1, 3).reshape(
                        b * nkv_l, kv_len, hd)
                    vf = vl.transpose(0, 2, 1, 3).reshape(
                        b * nkv_l, kv_len, hd)
                    og = flash_attention_gqa(qg, kf, vf, causal=True,
                                             sm_scale=scale, block_q=bq,
                                             block_k=_blk(kv_len, 1024))
                    return og.reshape(b, nh_l, s, hd).transpose(0, 2, 1, 3)
                qf = ql.transpose(0, 2, 1, 3).reshape(b * nh_l, s, hd)
                kf = kl.transpose(0, 2, 1, 3).reshape(b * nh_l, kv_len, hd)
                vf = vl.transpose(0, 2, 1, 3).reshape(b * nh_l, kv_len, hd)
                of = flash_attention(qf, kf, vf, causal=True, sm_scale=scale,
                                     block_q=_blk(s, 512),
                                     block_k=_blk(kv_len, 1024))
                return of.reshape(b, nh_l, s, hd).transpose(0, 2, 1, 3)

            if self.tp_mesh is not None:
                # TP: each chip flashes its own heads (q and kv heads both
                # shard over 'model'; rep is preserved per shard)
                from jax.sharding import PartitionSpec as P

                from ragmeup_tpu.parallel.mesh import shard_map_compat
                hspec = P(None, None, "model", None)
                out = shard_map_compat(
                    _flash_local, mesh=self.tp_mesh,
                    in_specs=(hspec, hspec, hspec),
                    out_specs=hspec)(q, k, v)
            else:
                out = _flash_local(q, k, v)
            weights = None
        else:
            # grouped-query attention WITHOUT materializing the rep-expanded
            # K/V: jnp.repeat here costs 3.2 GB of HBM traffic per decode
            # step at 8B/batch-8 (measured +6 ms/step); the 5-D einsum reads
            # each KV head once. q head h uses kv head h // rep, so the
            # (nkv, rep) split keeps head order
            q5 = q.reshape(b, s, nkv, rep, hd)
            logits = jnp.einsum("bqnrd,bknd->bnrqk", q5, k,
                                preferred_element_type=jnp.float32) * scale
            if c.attn_softcap:
                # Gemma-2: cap*tanh(x/cap) on the SCALED logits, before
                # the additive mask (tanh of the -1e30 mask would erase it)
                logits = jnp.tanh(logits / c.attn_softcap) * c.attn_softcap
            if attn_bias is not None:
                # bias is (..., q, kv): insert the rep axis for broadcast
                logits = logits + attn_bias[..., None, :, :]
            if win:
                # lower-bound mask: query at absolute position p attends
                # keys in (p - window, p]. Query rows sit at cache_pos +
                # row (dense decode) or at their row index (full prefill,
                # which always starts at position 0); the upper bound is
                # the existing causal/padding attn_bias.
                base = cache_pos if cache_pos is not None else 0
                qpos = base + jnp.arange(s)
                keep = (jnp.arange(kv_len)[None, :]
                        > qpos[:, None] - win)
                logits = jnp.where(keep[None, None, None], logits,
                                   jnp.float32(-1e30))
            weights = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bnrqk,bknd->bqnrd", weights.astype(c.jdtype),
                             v, preferred_element_type=c.jdtype)
            weights = weights.reshape(b, nh, s, kv_len)
        out = out.reshape(b, s, nh * hd)
        out = QuantDense(c.hidden_size, ("qkv", "embed"), quant, c.jdtype,
                         bits, c.quant_kernel, q_group=c.int4_group, a8=c.int4_w4a8,
                         tp_mesh=self.tp_mesh, name="o_proj")(out)
        aux = None
        if capture_weights == "qk":
            # consumers expect k at full head count (provenance blockwise
            # q·k); repeat only on this capture path
            aux = (q, jnp.repeat(k, rep, axis=2))
        elif capture_weights:
            aux = weights
        return out, new_cache, aux


class LlamaMlp(nn.Module):
    cfg: LlamaConfig
    tp_mesh: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        quant = c.quantization in ("int8", "int4")
        bits = 4 if c.quantization == "int4" else 8
        if c.fused_projections:
            gu = QuantDense(2 * c.intermediate_size, ("embed", "mlp"), quant,
                            c.jdtype, bits, c.quant_kernel,
                            q_group=c.int4_group, a8=c.int4_w4a8, tp_mesh=self.tp_mesh,
                            name="gate_up_proj")(x)
            g = gu[..., :c.intermediate_size]
            u = gu[..., c.intermediate_size:]
        else:
            g = QuantDense(c.intermediate_size, ("embed", "mlp"), quant, c.jdtype,
                           bits, c.quant_kernel, q_group=c.int4_group, a8=c.int4_w4a8,
                           tp_mesh=self.tp_mesh, name="gate_proj")(x)
            u = QuantDense(c.intermediate_size, ("embed", "mlp"), quant, c.jdtype,
                           bits, c.quant_kernel, q_group=c.int4_group, a8=c.int4_w4a8,
                           tp_mesh=self.tp_mesh, name="up_proj")(x)
        if c.act_fn == "silu":
            a = nn.silu(g)
        elif c.act_fn == "gelu_tanh":  # Gemma's gelu_pytorch_tanh
            a = nn.gelu(g, approximate=True)
        elif c.act_fn == "gelu":
            a = nn.gelu(g, approximate=False)
        else:
            raise ValueError(f"unsupported act_fn {c.act_fn!r}")
        return QuantDense(c.hidden_size, ("mlp", "embed"), quant, c.jdtype,
                          bits, c.quant_kernel, q_group=c.int4_group, a8=c.int4_w4a8,
                          tp_mesh=self.tp_mesh, name="down_proj")(a * u)


class LlamaMoeMlp(nn.Module):
    """Top-k routed sparse-MoE MLP (Mixtral / Qwen3-MoE family).

    Routing matches HF Mixtral exactly (MixtralSparseMoeBlock.forward):
    router logits → softmax over ALL experts in f32 → top-k → optionally
    renormalize the kept weights (norm_topk_prob) → weighted sum of expert
    outputs. Reference capability: ``RAGHelper_local.py:61-89`` loads
    Mixtral-class checkpoints through AutoModelForCausalLM + bitsandbytes.

    TPU-native design: expert weights are STACKED ``(E, h, f)`` tensors —
    one HBM-resident array per projection, no per-expert Python objects.
    Two compute paths:

    - decode (tokens·top_k ≤ E): per-slot expert-GATHERED matmuls
      (ops/moe_matmul.py — scalar-prefetched index map streams only the
      routed experts' tiles), so a step reads ``top_k/E`` of the expert
      bytes. MoE decode is weight-bandwidth bound; this is the whole win.
    - prefill/train (default): all-experts batched einsum with one-hot
      combine — E/top_k more FLOPs than the routed minimum, but it runs
      at MXU peak (~160 TFLOP/s measured) and beats the grouped kernel
      at every tested shape on this libtpu (see ``moe_grouped``). Under
      a mesh the ``expert`` logical axis shards over 'model' — GSPMD
      expert parallelism with the combine contraction as the one
      collective.
    - ``moe_grouped="on"``: megablocks-class grouped GEMMs — rows sorted
      by routed expert through ``ops/moe_matmul.moe_grouped_matmul``
      (routed-only FLOPs, weights streamed once, in-kernel int8 dequant);
      kept behind the knob until Mosaic's per-tile overhead drops.

    Quantization: none | int8 (per-expert per-output-channel scales,
    same scheme as QuantDense). int4 experts are rejected at config time.
    """

    cfg: LlamaConfig
    tp_mesh: Optional[object] = None

    def _ep_decode_gather(self, xf, ids, wslot, gate, up, down, act,
                          e_local, t, top_k, int4_tiles=None):
        """shard_map EP decode: per-device expert gather + psum combine.

        xf (t, h) replicated activations; ids/wslot (S,) routed expert
        ids and combine weights (S = t·top_k ≤ E/D, the engage gate).
        gate/up/down are (stacked_weights, scale-or-None) pairs whose
        leading 'expert' dim shards over the mesh 'model' axis. Each
        device runs the gather kernel (ops/moe_matmul.py) on its LOCAL
        (E/D, k, n) stack — pallas has no GSPMD rule, but under
        shard_map partitioning is manual and the kernel sees only local
        shapes (same design as QuantDense._tp_shard_matmul).

        ``int4_tiles`` = ((tk_h, grp_h), (tk_f, grp_f)) switches the
        gather to the packed-int4 kernel: weights arrive as (E, k/2, n)
        nibbles + (E, k/group, n) group scales sharded the same way, so
        mesh int4-MoE decode gathers only the routed slots' packed bytes
        per device instead of re-dequantizing the full local stacks
        every step (the old prefill-style dq4 path: 4x the packed
        bytes + an HBM transient per step)."""
        from jax.sharding import PartitionSpec as P

        from ragmeup_tpu.ops.moe_matmul import (moe_gather_matmul,
                                                moe_gather_matmul_int4)
        from ragmeup_tpu.parallel.mesh import shard_map_compat
        c = self.cfg
        mesh = self.tp_mesh
        h = c.hidden_size
        quant = gate[1] is not None and int4_tiles is None
        xs = jnp.repeat(xf, top_k, axis=0).astype(c.jdtype)  # (S, h)

        def local_fn(xs, ids, wslot, wg, sg, wu, su, wn, sn):
            lo = jax.lax.axis_index("model").astype(jnp.int32) * e_local
            mine = (ids >= lo) & (ids < lo + e_local)
            idl = jnp.where(mine, ids - lo, 0)
            if int4_tiles is not None:
                (tk_h, grp_h), (tk_f, grp_f) = int4_tiles
                g = moe_gather_matmul_int4(xs, wg, sg, idl, tk_h, grp_h)
                u = moe_gather_matmul_int4(xs, wu, su, idl, tk_h, grp_h)
                a = (act(g) * u).astype(c.jdtype)
                y = moe_gather_matmul_int4(a, wn, sn, idl, tk_f, grp_f)
            else:
                g = moe_gather_matmul(xs, wg, idl, sg)
                u = moe_gather_matmul(xs, wu, idl, su)
                a = (act(g) * u).astype(c.jdtype)
                y = moe_gather_matmul(a, wn, idl, sn)  # (S, h)
            y = y.astype(jnp.float32) * jnp.where(mine, wslot, 0.0)[:, None]
            return jax.lax.psum(y, "model")

        w_spec = P("model", None, None)
        s_spec = P("model", None, None) if int4_tiles is not None \
            else P("model", None)
        if quant or int4_tiles is not None:
            args = (xs, ids, wslot, gate[0], gate[1], up[0], up[1],
                    down[0], down[1])
            specs = (P(), P(), P(), w_spec, s_spec, w_spec, s_spec,
                     w_spec, s_spec)
            fn = local_fn
        else:
            args = (xs, ids, wslot, gate[0], up[0], down[0])
            specs = (P(), P(), P(), w_spec, w_spec, w_spec)

            def fn(xs, ids, wslot, wg, wu, wn):
                return local_fn(xs, ids, wslot, wg, None, wu, None,
                                wn, None)

        y = shard_map_compat(fn, mesh=mesh, in_specs=specs,
                             out_specs=P())(*args)
        return y.reshape(t, top_k, h).sum(axis=1)

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        e_num, top_k = c.num_experts, c.num_experts_per_tok
        f = c.moe_intermediate_size or c.intermediate_size
        h = c.hidden_size
        assert c.quantization in ("none", "int8", "int4"), \
            f"MoE experts support none|int8|int4, not {c.quantization}"
        quant = c.quantization == "int8"
        quant4 = c.quantization == "int4"
        lead = x.shape[:-1]
        t = 1
        for d in lead:
            t *= d
        xf = x.reshape(t, h)
        router = self.param("router", dense_init(("embed", "expert")),
                            (h, e_num), jnp.float32)
        # routing stays f32 end-to-end (HF computes softmax and the
        # renormalization in float before casting back)
        logits = jnp.dot(xf.astype(jnp.float32), router)
        probs = jax.nn.softmax(logits, axis=-1)
        topw, topi = jax.lax.top_k(probs, top_k)  # ties → lowest index
        if c.norm_topk_prob:
            topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
        # training hook: the load-balancing auxiliary loss (HF
        # load_balancing_loss_func / Switch eq. 4) reads these via
        # apply(..., mutable=["intermediates"]) — see train/train.py
        # moe_load_balancing_loss
        self.sow("intermediates", "router_probs", probs)
        self.sow("intermediates", "router_topi", topi)

        n_up = ("expert", "embed", "moe_inter")
        n_dn = ("expert", "moe_inter", "embed")
        if quant4:
            # stacked-expert packed int4 + group-wise scales: the same
            # two-per-byte layout as QuantDense's dense int4 (the
            # TPU-native nf4, ops/quant_matmul.py pack_int4), one packed
            # tensor per projection with a leading expert dim. This is
            # the MEMORY knob for MoE: Mixtral-class experts in half the
            # int8 bytes (~28B total params on one 16 GB chip). Compute
            # dequantizes per routed expert (decode: only the routed
            # slots' packed bytes are gathered) — slower than int8's
            # gather kernel, same tradeoff as dense int4 (BENCH_NOTES).
            from ragmeup_tpu.ops.quant_matmul import int4_tiling
            tk_h, grp_h = int4_tiling(h)
            tk_f, grp_f = int4_tiling(f)
            if c.int4_group:
                from ragmeup_tpu.ops.quant_matmul import int4_group_for
                grp_h = int4_group_for(tk_h, c.int4_group)
                grp_f = int4_group_for(tk_f, c.int4_group)
            wg = self.param("gate_p", nn.with_logical_partitioning(
                nn.initializers.zeros_init(), n_up),
                (e_num, h // 2, f), jnp.int8)
            sg = self.param("gate_gs", nn.with_logical_partitioning(
                nn.initializers.ones_init(), n_up),
                (e_num, h // grp_h, f), jnp.float32)
            wu = self.param("up_p", nn.with_logical_partitioning(
                nn.initializers.zeros_init(), n_up),
                (e_num, h // 2, f), jnp.int8)
            su = self.param("up_gs", nn.with_logical_partitioning(
                nn.initializers.ones_init(), n_up),
                (e_num, h // grp_h, f), jnp.float32)
            wn = self.param("down_p", nn.with_logical_partitioning(
                nn.initializers.zeros_init(), n_dn),
                (e_num, f // 2, h), jnp.int8)
            sn = self.param("down_gs", nn.with_logical_partitioning(
                nn.initializers.ones_init(), n_dn),
                (e_num, f // grp_f, h), jnp.float32)
        elif quant:
            wg = self.param("gate_q", nn.with_logical_partitioning(
                nn.initializers.zeros_init(), n_up), (e_num, h, f), jnp.int8)
            sg = self.param("gate_s", nn.with_logical_partitioning(
                nn.initializers.ones_init(), ("expert", "moe_inter")),
                (e_num, f), jnp.float32)
            wu = self.param("up_q", nn.with_logical_partitioning(
                nn.initializers.zeros_init(), n_up), (e_num, h, f), jnp.int8)
            su = self.param("up_s", nn.with_logical_partitioning(
                nn.initializers.ones_init(), ("expert", "moe_inter")),
                (e_num, f), jnp.float32)
            wn = self.param("down_q", nn.with_logical_partitioning(
                nn.initializers.zeros_init(), n_dn), (e_num, f, h), jnp.int8)
            sn = self.param("down_s", nn.with_logical_partitioning(
                nn.initializers.ones_init(), ("expert", "embed")),
                (e_num, h), jnp.float32)
        else:
            wg = self.param("gate", dense_init(n_up), (e_num, h, f),
                            jnp.float32)
            wu = self.param("up", dense_init(n_up), (e_num, h, f),
                            jnp.float32)
            wn = self.param("down", dense_init(n_dn), (e_num, f, h),
                            jnp.float32)
            sg = su = sn = None

        def act(g):
            if c.act_fn == "silu":
                return nn.silu(g)
            if c.act_fn == "gelu_tanh":
                return nn.gelu(g, approximate=True)
            if c.act_fn == "gelu":
                return nn.gelu(g, approximate=False)
            raise ValueError(f"unsupported act_fn {c.act_fn!r}")

        def dq4(wp, gs, tile_k, group):
            # packed (..., k/2, n) + gscale (..., k/group, n) → (..., k, n)
            from ragmeup_tpu.ops.quant_matmul import unpack_int4
            import functools as _ft
            unp = _ft.partial(unpack_int4, tile_k=tile_k)
            if wp.ndim == 3:
                unp = jax.vmap(unp)
            q = unp(wp).astype(c.jdtype)
            return q * jnp.repeat(gs, group, axis=-2).astype(c.jdtype)

        s_tot = t * top_k
        if (quant4 and self.tp_mesh is None and c.moe_grouped == "auto"
                and e_num < s_tot <= 4 * e_num):
            # Batched int4 decode DEDUP gather: past the per-slot gate
            # each expert's packed tiles would be re-read once PER SLOT
            # routed to it; the grouped int4 kernel reads each UNIQUE
            # routed expert's packed bytes once and dequantizes in VMEM
            # (the einsum alternative's full-stack dequant transient runs
            # 33 GB/s effective — BENCH_NOTES round 4). Engage only when
            # the kernel path is viable: its FALLBACK is that einsum, so
            # taking it by accident would regress below per-slot.
            from ragmeup_tpu.ops.moe_matmul import (grouped_int4_viable,
                                                    moe_grouped_matmul_int4)
            if (grouped_int4_viable(s_tot, e_num, h, f, tk_h, grp_h,
                                    c.jdtype)
                    and grouped_int4_viable(s_tot, e_num, f, h, tk_f,
                                            grp_f, c.jdtype)):
                ids = topi.reshape(s_tot)
                order = jnp.argsort(ids)          # stable: slot order kept
                inv = jnp.argsort(order)
                xs = jnp.repeat(xf, top_k, axis=0).astype(c.jdtype)[order]
                gsz = jnp.bincount(ids, length=e_num).astype(jnp.int32)
                g = moe_grouped_matmul_int4(xs, wg, sg, gsz, tk_h, grp_h)
                u = moe_grouped_matmul_int4(xs, wu, su, gsz, tk_h, grp_h)
                a = (act(g) * u).astype(c.jdtype)
                y = moe_grouped_matmul_int4(a, wn, sn, gsz, tk_f, grp_f)
                y = y[inv].astype(jnp.float32) * topw.reshape(s_tot, 1)
                out = y.reshape(t, top_k, h).sum(axis=1)
                return out.astype(c.jdtype).reshape(lead + (h,))
        # int4's per-slot gate extends past S <= E: the einsum alternative
        # dequantizes the FULL packed stacks every step (reads E·kn/2
        # packed + writes/reads an E·kn·2 bf16 transient ≈ 4.5·E·kn/2
        # bytes), so per-slot packed reads win while S < ~4.5E; the
        # kernel's slot cap is 64. Batched routing (E < S ≤ 4E) prefers
        # the dedup-grouped int4 path above when its shapes tile.
        slot_gate = (s_tot <= e_num or
                     (quant4 and s_tot <= min(64, 4 * e_num)))
        if slot_gate and self.tp_mesh is None:
            # decode path: gather only the routed experts' weights.
            # Slot layout: row s = token s//top_k, expert slot s%top_k.
            from ragmeup_tpu.ops.moe_matmul import moe_gather_matmul
            xs = jnp.repeat(xf, top_k, axis=0).astype(c.jdtype)
            ids = topi.reshape(s_tot)
            if quant4:
                # int4 decode: gather the routed slots' PACKED bytes (half
                # the int8 traffic) through the pallas int4 gather kernel —
                # nibbles unpack + group-dequant in VMEM, so the packed
                # tiles cross HBM exactly once (the old jnp.take path
                # materialized a gathered copy: read + write + read, 3x).
                # Non-tiling shapes fall back to take+dequant inside
                # moe_gather_matmul_int4 (same numbers either way).
                from ragmeup_tpu.ops.moe_matmul import moe_gather_matmul_int4
                g = moe_gather_matmul_int4(xs, wg, sg, ids, tk_h, grp_h)
                u = moe_gather_matmul_int4(xs, wu, su, ids, tk_h, grp_h)
                a = (act(g) * u).astype(c.jdtype)
                y = moe_gather_matmul_int4(a, wn, sn, ids, tk_f, grp_f)
            else:
                g = moe_gather_matmul(xs, wg, ids, sg)
                u = moe_gather_matmul(xs, wu, ids, su)
                a = (act(g) * u).astype(c.jdtype)
                y = moe_gather_matmul(a, wn, ids, sn)  # (t*top_k, h)
            y = y.astype(jnp.float32) * topw.reshape(s_tot, 1)
            out = y.reshape(t, top_k, h).sum(axis=1)
            return out.astype(c.jdtype).reshape(lead + (h,))

        if self.tp_mesh is not None:
            ntp = self.tp_mesh.shape["model"]
            if e_num % ntp == 0 and s_tot <= e_num // ntp:
                # EP decode under a mesh: shard_map per-device gather.
                # Each device holds E/D stacked experts ('expert' logical
                # axis → 'model'); it rebases the routed ids into its
                # local range, gathers ONLY its own experts' tiles
                # (non-local slots clamp to local expert 0 and zero their
                # combine weight), and the partial slot outputs psum over
                # 'model'. Per-device weight traffic is ≤ S·3·k·n bytes vs
                # the all-experts einsum's (E/D)·3·k·n — engaged exactly
                # when S = t·top_k ≤ E/D, so this path never reads more
                # than the einsum and does routed-only FLOPs (per device
                # the einsum does E/(D·top_k) more — 2x for Qwen3-MoE
                # E=128, top_k=8 on a D=8 mesh). Closes the "EP path runs
                # the
                # all-experts einsum at decode" gap: Qwen3-MoE-class
                # (E=128, top_k=8) on an 8-way mesh reads 8 experts per
                # device per token instead of 16.
                out = self._ep_decode_gather(
                    xf, topi.reshape(s_tot), topw.reshape(s_tot),
                    (wg, sg), (wu, su), (wn, sn), act,
                    e_num // ntp, t, top_k,
                    int4_tiles=(((tk_h, grp_h), (tk_f, grp_f))
                                if quant4 else None))
                return out.astype(c.jdtype).reshape(lead + (h,))

        xb = xf.astype(c.jdtype)
        # Batched-decode DEDUP gather (round-3 verdict #6): past the
        # per-slot gather's gate (s_tot > E) the einsum would read ALL
        # E experts every step; the grouped kernel reads each UNIQUE
        # routed expert once (zero-row groups contribute no tiles) and
        # segment-combines — ≤ min(S, E) expert reads, routed-only FLOPs.
        # A small decode m-tile (8/16 rows) keeps per-group padding
        # proportionate; the prefill-sized tm heuristic stays for "on".
        dedup_decode = (c.moe_grouped == "auto" and not quant4
                        and e_num < s_tot <= 4 * e_num)
        use_grouped = (c.moe_grouped == "on" or dedup_decode) and not quant4
        if self.tp_mesh is None and use_grouped:
            # prefill/train path: GROUPED GEMMs (megablocks-class). Sort
            # the (token, slot) rows by routed expert and run grouped
            # matmuls against the stacked expert tensors — S·h·f FLOPs
            # (S = t·top_k) instead of the all-experts einsum's E·t·h·f,
            # an E/top_k saving that dominates at large E (Qwen3-MoE
            # ships E=128, top_k=8: 16x). moe_grouped_matmul pads each
            # group to MXU row tiles (pallas kernel, in-epilogue int8
            # dequant — no (E, h, f) bf16 copy in HBM); off-TPU or on
            # non-tiling shapes it falls back to lax.ragged_dot.
            # Sort/unsort are O(S log S) on the VPU, negligible next to
            # the GEMMs.
            from ragmeup_tpu.ops.moe_matmul import moe_grouped_matmul
            s_tot = t * top_k
            ids = topi.reshape(s_tot)
            order = jnp.argsort(ids)             # stable: slot order kept
            inv = jnp.argsort(order)
            xs = jnp.repeat(xb, top_k, axis=0)[order]
            gsz = jnp.bincount(ids, length=e_num).astype(jnp.int32)
            # decode shapes: small m-tile so per-group padding stays
            # ~tm rows per routed expert (the prefill tm can be 128), and
            # no_stack so ONLY the unique routed experts' tiles cross HBM
            # (the full-stack kernel reads all E — right for prefill,
            # wrong for the dedup win). Tile sweep on v5e (Mixtral MLP
            # shape, S=16, 4 unique): tk=2048/tn=1024 runs 567 us vs the
            # all-experts einsum's 704 — smaller tiles lose to per-tile
            # overhead (955 us at 512/512).
            tm = (16 if c.jdtype == jnp.bfloat16 else 8) \
                if dedup_decode else 0

            def _dtiles(k, n):
                if not dedup_decode or e_num * (tm - 1) > 1024:
                    return 0, 0  # large-E: keep the VMEM-guarded defaults
                tk = next((x for x in (2048, 1024, 512) if k % x == 0), 0)
                tn = next((x for x in (1024, 512) if n % x == 0), 0)
                return tk, tn

            tk_up, tn_up = _dtiles(h, f)
            tk_dn, tn_dn = _dtiles(f, h)
            g = moe_grouped_matmul(xs, wg, gsz, sg, tm=tm, tile_k=tk_up,
                                   tile_n=tn_up, no_stack=dedup_decode)
            u = moe_grouped_matmul(xs, wu, gsz, su, tm=tm, tile_k=tk_up,
                                   tile_n=tn_up, no_stack=dedup_decode)
            a = (act(g) * u).astype(c.jdtype)
            y = moe_grouped_matmul(a, wn, gsz, sn, tm=tm, tile_k=tk_dn,
                                   tile_n=tn_dn, no_stack=dedup_decode)
            y = y[inv].astype(jnp.float32) * topw.reshape(s_tot, 1)
            out = y.reshape(t, top_k, h).sum(axis=1)
            return out.astype(c.jdtype).reshape(lead + (h,))

        # All-experts einsum with one-hot combine: the EP path under a
        # mesh (the 'expert' axis of wg/wu/wn shards over 'model' and XLA
        # turns the combine contraction into the EP collective — the
        # grouped kernel has no GSPMD rule), and the single-device path
        # at small E/top_k where a dense batched GEMM at MXU peak beats
        # the grouped kernel despite the FLOP multiple (see moe_grouped).
        if quant4:
            # prefill/EP: dequantize the full stacks (one bf16 copy per
            # projection per layer — prefill is MXU-bound so the unpack
            # bandwidth amortizes over t; under a mesh the unpack shards
            # along the leading 'expert' axis with the weights)
            wgd = dq4(wg, sg, tk_h, grp_h)
            wud = dq4(wu, su, tk_h, grp_h)
            wnd = dq4(wn, sn, tk_f, grp_f)
        elif quant:
            wgd = wg.astype(c.jdtype) * sg[:, None, :].astype(c.jdtype)
            wud = wu.astype(c.jdtype) * su[:, None, :].astype(c.jdtype)
            wnd = wn.astype(c.jdtype) * sn[:, None, :].astype(c.jdtype)
        else:
            wgd, wud, wnd = (w.astype(c.jdtype) for w in (wg, wu, wn))
        cw = (jax.nn.one_hot(topi, e_num, dtype=jnp.float32)
              * topw[..., None]).sum(axis=1)  # (t, E)
        g = jnp.einsum("th,ehf->etf", xb, wgd,
                       preferred_element_type=c.jdtype)
        u = jnp.einsum("th,ehf->etf", xb, wud,
                       preferred_element_type=c.jdtype)
        a = act(g) * u
        # dots stay in jdtype (a bf16xbf16->f32 batched dot is unsupported
        # by the CPU thunk runtime the tests use); the combine over experts
        # accumulates in f32
        y = jnp.einsum("etf,efh->eth", a, wnd,
                       preferred_element_type=c.jdtype)
        out = jnp.einsum("te,eth->th", cw, y.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        return out.astype(c.jdtype).reshape(lead + (h,))


class LlamaBlock(nn.Module):
    cfg: LlamaConfig
    sp_mesh: Optional[object] = None
    tp_mesh: Optional[object] = None
    window: int = -1  # per-layer sliding window (see LlamaAttention)
    moe: bool = False  # this layer's MLP is routed-MoE (see LlamaMoeMlp)

    @nn.compact
    def __call__(self, x, cos, sin, attn_bias, cache, cache_pos,
                 capture_weights: bool = False, paged_state=None,
                 ring: bool = False):
        c = self.cfg
        h, new_cache, w = LlamaAttention(c, self.sp_mesh, self.tp_mesh,
                                         self.window, name="attention")(
            RMSNorm(c.rms_eps, c.jdtype, c.norm_offset,
                    name="input_norm")(x),
            cos, sin, attn_bias, cache, cache_pos, capture_weights,
            paged_state, ring)
        mcls = LlamaMoeMlp if self.moe else LlamaMlp
        if c.post_norms:
            # Gemma-2 layout: norms AROUND each sublayer (HF
            # Gemma2DecoderLayer.forward) — post_attn_norm applies to the
            # attention OUTPUT here, not to the MLP input as in Llama
            h = RMSNorm(c.rms_eps, c.jdtype, c.norm_offset,
                        name="post_attn_norm")(h)
            x = x + h
            m = mcls(c, self.tp_mesh, name="mlp")(
                RMSNorm(c.rms_eps, c.jdtype, c.norm_offset,
                        name="pre_ffw_norm")(x))
            m = RMSNorm(c.rms_eps, c.jdtype, c.norm_offset,
                        name="post_ffw_norm")(m)
            return x + m, new_cache, w
        x = x + h
        x = x + mcls(c, self.tp_mesh, name="mlp")(
            RMSNorm(c.rms_eps, c.jdtype, c.norm_offset,
                    name="post_attn_norm")(x))
        return x, new_cache, w


class LlamaModel(nn.Module):
    """Causal LM. Two modes:
    - prefill: full-sequence forward with causal mask, optionally returning
      a KV cache sized max_seq_len and/or attention weights;
    - decode: single-token step against the cache at position cache_pos.
    """

    cfg: LlamaConfig
    sp_mesh: Optional[object] = None  # sequence-parallel prefill (ring)
    tp_mesh: Optional[object] = None  # tensor-parallel kernel shard_map mesh

    @nn.compact
    def __call__(self, input_ids, *, positions, attn_bias=None,
                 caches: Optional[list] = None, cache_pos=None,
                 capture_weights: bool = False, capture_qk_last: bool = False,
                 paged_caches=None, paged_meta=None, ring: bool = False,
                 head_at=None, skip_head: bool = False):
        c = self.cfg
        emb = self.param("token_embedding", embed_init(("vocab", "embed")),
                         (c.vocab_size, c.hidden_size), jnp.float32)
        x = emb[input_ids].astype(c.jdtype)
        if c.embed_scale:
            # Gemma-family: embeddings scale by sqrt(hidden). HF casts the
            # normalizer to the activation dtype BEFORE multiplying (a
            # bf16-rounded constant under bf16) — match that exactly.
            x = x * jnp.asarray(np.sqrt(c.hidden_size), c.jdtype)
        # rope cos/sin computed AT the requested positions ((s, hd/2) or
        # (b, s, hd/2)) instead of gathering from a (max_seq_len, hd/2)
        # table: a 128k-context config embedded 67 MB of table constants
        # into every program (and numpy-computed them per trace)
        inv = jnp.asarray(rope_inv_freq(c.head_dim, c.rope_theta, cfg=c))
        ang = positions.astype(jnp.float32)[..., None] * inv
        cos = jnp.cos(ang)
        sin = jnp.sin(ang)
        new_caches, all_w = [], []
        new_paged = [] if paged_caches is not None else None
        qk_last = None
        for i in range(c.num_layers):
            cache = caches[i] if caches is not None else None
            cap = capture_weights
            if capture_qk_last and i == c.num_layers - 1:
                cap = "qk"
            pstate = None
            if paged_caches is not None:
                kp, vp = paged_caches[i]
                pstate = (kp, vp) + tuple(paged_meta)
            win_i = c.layer_windows[i] if c.layer_windows else -1
            moe_i = bool(c.num_experts) and (
                bool(c.moe_layers[i]) if c.moe_layers else True)
            x, nc, w = LlamaBlock(c, self.sp_mesh, self.tp_mesh, win_i,
                                  moe=moe_i, name=f"layer_{i}")(
                x, cos, sin, attn_bias, cache, cache_pos, cap, pstate, ring)
            if paged_caches is not None:
                new_paged.append(nc)
                nc = None
            new_caches.append(nc)
            if cap == "qk":
                qk_last = w
            elif capture_weights:
                all_w.append(w)
        x = RMSNorm(c.rms_eps, c.jdtype, c.norm_offset,
                    name="final_norm")(x)
        if skip_head:
            # intermediate chunked-prefill dispatches only need the cache
            # side effects — skip the lm_head weight read entirely
            out = {"logits": jnp.zeros((x.shape[0], 1, 1), jnp.float32)}
            if caches is not None:
                out["caches"] = new_caches
            if new_paged is not None:
                out["paged_caches"] = new_paged
            return out
        if head_at is not None:
            # lm_head only at one (traced) position — chunked prefill needs
            # just the last real token's logits, not cs * vocab. A (b,)
            # head_at takes a PER-ROW position (batched chunked prefill:
            # rows end at different offsets within the chunk).
            if getattr(head_at, "ndim", 0):
                x = x[jnp.arange(x.shape[0]), head_at][:, None]
            else:
                x = jax.lax.dynamic_slice_in_dim(x, head_at, 1, axis=1)
        if c.head_quantization == "int8" and not c.tie_embeddings:
            # int8 lm_head: the head read is the single largest tensor per
            # decode step (1.05 GB bf16 at 8B) — per-channel int8 halves it.
            # Logit error is bounded by the per-channel scale (≤0.4% of the
            # channel amax), far below sampling noise.
            hq = self.param("lm_head_q", nn.with_logical_partitioning(
                nn.initializers.zeros_init(), ("embed", "vocab")),
                (c.hidden_size, c.vocab_size), jnp.int8)
            hs = self.param("lm_head_scale", nn.with_logical_partitioning(
                nn.initializers.ones_init(), ("vocab",)),
                (c.vocab_size,), jnp.float32)
            hd_ = hq.astype(c.jdtype) * hs.astype(c.jdtype)[None, :]
            logits = jnp.dot(x.astype(c.jdtype), hd_,
                             preferred_element_type=jnp.float32
                             ).astype(jnp.float32)
        else:
            if c.tie_embeddings:
                head = emb.T
            else:
                head = self.param("lm_head", dense_init(("embed", "vocab")),
                                  (c.hidden_size, c.vocab_size), jnp.float32)
            # storing embeddings/head in bf16 halves their HBM traffic (the
            # lm_head read dominates per-token decode bandwidth at 8B
            # scale); accumulate in f32 either way
            logits = jnp.dot(x.astype(head.dtype), head,
                             preferred_element_type=jnp.float32
                             ).astype(jnp.float32)
        if c.final_softcap:
            # Gemma-2 final-logit softcapping (f32, after the head read)
            logits = jnp.tanh(logits / c.final_softcap) * c.final_softcap
        out = {"logits": logits}
        if caches is not None:
            out["caches"] = new_caches
        if new_paged is not None:
            out["paged_caches"] = new_paged
        if capture_weights:
            out["attn_weights"] = all_w
        if capture_qk_last:
            out["qk_last"] = qk_last
        return out


def _next_pow2_int(x: int) -> int:
    n = 1
    while n < x:
        n *= 2
    return n


def causal_bias(q_len: int, kv_len: int, q_offset: int = 0) -> jnp.ndarray:
    """(1, 1, q, kv) additive causal mask; query i at absolute pos q_offset+i
    may attend kv positions <= that."""
    qpos = q_offset + jnp.arange(q_len)[:, None]
    kpos = jnp.arange(kv_len)[None, :]
    return jnp.where(kpos <= qpos, 0.0, -1e30)[None, None]


class LocalLLM:
    """Generation wrapper: prefill + stepwise decode with temperature
    sampling and repetition penalty (reference pipeline knobs:
    temperature, repetition_penalty, max_new_tokens — .env.template:45-47)."""

    PREFILL_BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192, 16384,
                       32768)

    def __init__(self, cfg: LlamaConfig, tokenizer, params=None, seed: int = 0,
                 eos_ids: Sequence[int] = (), mesh=None):
        """With ``mesh`` (a ('data','corpus','model') jax Mesh): tensor-
        parallel inference. Params are placed per the flax logical rules
        (qkv/kv/mlp dims over the ``model`` axis — Megatron column/row
        parallel; SURVEY.md §2.4 "TP for model forwards"), the KV cache is
        sharded over its kv-head dim, and XLA inserts the psum after
        o_proj/down_proj from the shardings. Generation loops are unchanged
        — the sharded cache flows through the fused while_loop carries.
        The pallas kernels (int8 dequant matmul, flash prefill) RUN under
        TP: they execute on per-shard local shapes inside shard_map
        (QuantDense._tp_shard_matmul, the flash wrapper in LlamaAttention)
        — round-2 verdict #3 lifted the old blanket disable."""
        self.cfg = cfg
        self.tokenizer = tokenizer
        sp = mesh if (mesh is not None and mesh.shape["corpus"] > 1) else None
        self.model = LlamaModel(cfg, sp_mesh=sp, tp_mesh=mesh)
        self.eos_ids = set(int(e) for e in eos_ids)
        self.mesh = mesh
        self._cache_sharding = None
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, 8), jnp.int32),
                positions=jnp.arange(8),
            )["params"]
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ragmeup_tpu.parallel.tp import model_param_shardings
            assert cfg.num_kv_heads % mesh.shape["model"] == 0, (
                f"num_kv_heads={cfg.num_kv_heads} not divisible by model "
                f"axis {mesh.shape['model']}")
            shardings = model_param_shardings(
                self.model, mesh, (jnp.zeros((1, 8), jnp.int32),),
                {"positions": jnp.arange(8)}, shard_vocab=True)
            params = jax.device_put(params, shardings)
            # KV cache (b, L, nkv, hd): kv heads over 'model'
            self._cache_sharding = NamedSharding(
                mesh, P(None, None, "model", None))
        else:
            # commit params to the device ONCE. Loader-built trees arrive
            # as host numpy arrays; leaving them uncommitted makes every
            # jitted call re-transfer the full weight set (measured on a
            # real 8B checkpoint over the 200 MB/s tunnel: 373 s per
            # 32-token generate vs 0.46 s committed).
            params = jax.device_put(params)
        self.params = params
        self._prefill = jax.jit(self._prefill_impl, static_argnames=("cache_len",))
        self._decode = jax.jit(self._decode_impl)

    # -- jitted internals ------------------------------------------------------

    def _prefill_impl(self, params, ids, length, cache_len: int):
        """ids: (1, L) padded; length: actual prompt length (traced)."""
        c = self.cfg
        L = ids.shape[1]
        positions = jnp.arange(L)
        # K/V length after the cache update is cache_len (>= L); causal
        # masking over (L, cache_len) plus a padding mask beyond `length`
        bias = causal_bias(L, cache_len)
        kmask = jnp.where(jnp.arange(cache_len) < length,
                          0.0, -1e30)[None, None, None, :]
        caches = [(jnp.zeros((1, cache_len, c.num_kv_heads, c.head_dim), c.jdtype),
                   jnp.zeros((1, cache_len, c.num_kv_heads, c.head_dim), c.jdtype))
                  for _ in range(c.num_layers)]
        if self._cache_sharding is not None:
            caches = jax.tree_util.tree_map(
                lambda a: jax.lax.with_sharding_constraint(
                    a, self._cache_sharding), caches)
        # place prompt K/V at cache[0:L]
        out = self.model.apply({"params": params}, ids,
                               positions=positions, attn_bias=bias + kmask,
                               caches=caches, cache_pos=0, ring=True)
        last_logits = out["logits"][0, length - 1]
        return last_logits, out["caches"]

    def _decode_impl(self, params, token, pos, caches):
        """token: (1,1); pos: scalar absolute position; caches at len L."""
        positions = pos[None] if pos.ndim == 0 else pos
        kv_len = caches[0][0].shape[1]
        kmask = jnp.where(jnp.arange(kv_len) <= pos, 0.0, -1e30)[None, None, None, :]
        out = self.model.apply({"params": params}, token,
                               positions=positions, attn_bias=kmask,
                               caches=caches, cache_pos=pos)
        return out["logits"][0, -1], out["caches"]

    # -- public ------------------------------------------------------------------

    def _bucket(self, n: int) -> int:
        for b in self.PREFILL_BUCKETS:
            if n <= b:
                return min(b, self.cfg.max_seq_len)
        return self.cfg.max_seq_len

    def forward_logits(self, ids: Sequence[int]) -> np.ndarray:
        """Full-sequence logits (used by tests/eval)."""
        L = self._bucket(len(ids))
        padded = np.zeros((1, L), np.int32)
        padded[0, :len(ids)] = ids
        logits, _ = self._prefill(self.params, jnp.asarray(padded),
                                  jnp.int32(len(ids)), cache_len=L)
        return np.asarray(logits)

    def attention_forward(self, ids: Sequence[int]):
        """Forward with attention capture (provenance). Returns per-layer
        (1, heads, L, L) weights for the unpadded length."""
        L = len(ids)
        arr = jnp.asarray(np.asarray(ids, np.int32)[None])
        bias = causal_bias(L, L)
        out = self.model.apply({"params": self.params}, arr,
                               positions=jnp.arange(L), attn_bias=bias,
                               capture_weights=True)
        return [np.asarray(w, np.float32) for w in out["attn_weights"]]

    def qk_forward(self, ids: Sequence[int]):
        """Last-layer post-RoPE (q, k), each (1, L, heads, hd) — the inputs
        to blockwise attention-provenance (no L×L matrix materialized)."""
        L = len(ids)
        arr = jnp.asarray(np.asarray(ids, np.int32)[None])
        bias = causal_bias(L, L)
        out = self.model.apply({"params": self.params}, arr,
                               positions=jnp.arange(L), attn_bias=bias,
                               capture_qk_last=True)
        q, k = out["qk_last"]
        return np.asarray(q, np.float32), np.asarray(k, np.float32)

    # -- fused generation loop ---------------------------------------------------
    # One jit for the whole decode: a lax.while_loop steps the model against
    # the KV cache, applies repetition penalty + temperature sampling on
    # device, and stops on EOS — a single dispatch instead of one per token
    # (the reference's HF pipeline steps host-side; so did our v0 loop).

    @functools.partial(jax.jit, static_argnames=("self", "max_steps"))
    def _generate_fused(self, params, logits0, caches, pos0, seen0, key,
                        temperature, rep_penalty, eos_arr, max_steps: int):
        cache_len = caches[0][0].shape[1]
        vocab = logits0.shape[-1]
        out0 = jnp.full((max_steps,), -1, jnp.int32)

        def cond(c):
            return (~c["done"]) & (c["count"] < max_steps)

        def body(c):
            lg = c["logits"]
            penal = jnp.where(lg > 0, lg / rep_penalty, lg * rep_penalty)
            lg = jnp.where(c["seen"] & (rep_penalty != 1.0), penal, lg)
            key, sub = jax.random.split(c["key"])
            sampled = jax.random.categorical(
                sub, lg / jnp.maximum(temperature, 1e-6))
            greedy = jnp.argmax(lg)
            tok = jnp.where(temperature > 0, sampled, greedy).astype(jnp.int32)
            is_eos = jnp.any(tok == eos_arr)
            out = jnp.where(is_eos, c["out"], c["out"].at[c["count"]].set(tok))
            count = jnp.where(is_eos, c["count"], c["count"] + 1)
            seen = c["seen"].at[tok].set(True)
            logits, caches = self._decode_impl(params, tok[None, None],
                                               c["pos"], c["caches"])
            pos = c["pos"] + 1
            done = is_eos | (pos >= cache_len)
            return {"logits": logits, "caches": caches, "pos": pos,
                    "seen": seen, "key": key, "out": out, "count": count,
                    "done": done}

        init = {"logits": logits0, "caches": caches, "pos": pos0,
                "seen": seen0, "key": key, "out": out0,
                "count": jnp.int32(0), "done": jnp.bool_(False)}
        final = jax.lax.while_loop(cond, body, init)
        return final["out"], final["count"]

    # -- fused speculative decoding (on-device prompt-lookup drafting) ----------
    # RAG answers quote retrieved context verbatim, so n-gram continuation
    # lookup in the prompt is a high-acceptance draft model that costs no
    # extra weights. The whole draft → verify → accept loop runs inside ONE
    # lax.while_loop: the 2-gram search, the d-token verify forward (one
    # weight read for up to d tokens — decode is weight-bound, so a chunk
    # costs ≈ one step), and the prefix-acceptance test all happen on
    # device, with zero host round-trips. Greedy only; exactly equal to
    # generate(temperature=0) including repetition penalty.

    @functools.partial(jax.jit,
                       static_argnames=("self", "draft", "max_steps"))
    def _generate_spec(self, params, tokens0, n0, caches, seen0, rep_penalty,
                       eos_arr, draft: int, max_steps: int):
        """tokens0: (T,) confirmed tokens (prompt + first generated) padded
        with -1; n0: count incl. the pending token (invariant: cache holds
        n-1 entries, tokens[n-1] is confirmed but not yet in the cache)."""
        T = tokens0.shape[0]
        d = draft  # chunk = [pending, draft_1..draft_{d-1}]
        cache_len = caches[0][0].shape[1]
        rp = rep_penalty

        def cond(c):
            return (~c["done"]) & (c["emitted"] < max_steps)

        def body(c):
            tokens, n_tok, seen = c["tokens"], c["n_tok"], c["seen"]
            p0 = n_tok - 1
            pending = tokens[p0]
            t1 = tokens[jnp.maximum(p0 - 1, 0)]
            # last 2-gram match whose continuation window is fully confirmed
            j = jnp.arange(T - 1)
            match = ((tokens[:-1] == t1) & (tokens[1:] == pending)
                     & (j <= n_tok - d - 1))
            m = jnp.max(jnp.where(match, j, -1))
            have = m >= 0
            start = jnp.clip(m + 2, 0, T - d)
            cont = jax.lax.dynamic_slice(tokens, (start,), (d - 1,))
            idxs = start + jnp.arange(d - 1)
            cont = jnp.where(have & (idxs < n_tok), cont, 0)
            chunk = jnp.concatenate([pending[None], cont])  # (d,)

            positions = p0 + jnp.arange(d)
            bias = jnp.where(
                jnp.arange(cache_len)[None, :] <= positions[:, None],
                0.0, -1e30)[None, None, :, :]
            out = self.model.apply({"params": params}, chunk[None, :],
                                   positions=positions[None, :],
                                   attn_bias=bias, caches=c["caches"],
                                   cache_pos=p0)
            logits = out["logits"][0]  # (d, vocab); [i] = dist after chunk[:i+1]

            # greedy-with-penalty per position, fully vectorized: row i's
            # penalty set is seen ∪ chunk[1..i] (the seen set as of that
            # position if the prefix is accepted; rows past the accepted
            # prefix are never used)
            V = logits.shape[-1]
            pen_all = jnp.where(logits > 0, logits / rp, logits * rp)
            oh = jax.nn.one_hot(cont, V, dtype=jnp.int32)        # (d-1, V)
            grew = jnp.cumsum(oh, axis=0) > 0                    # chunk[1..i]
            seen_rows = jnp.concatenate(
                [jnp.zeros((1, V), bool), grew]) | seen[None, :]
            lg_all = jnp.where(seen_rows & (rp != 1.0), pen_all, logits)
            greedy = jnp.argmax(lg_all, axis=-1).astype(jnp.int32)

            acc = jnp.cumprod(
                jnp.concatenate([jnp.ones((1,), jnp.int32),
                                 (chunk[1:] == greedy[:-1]).astype(jnp.int32)])
            )[1:]                      # (d-1,) prefix acceptance of drafts
            a = jnp.sum(acc)           # accepted draft count, 0..d-1
            # emit accepted drafts + the model's own bonus token
            step_i = jnp.arange(d)
            tok_i = jnp.where(step_i < a, jnp.roll(chunk, -1),
                              greedy[jnp.minimum(a, d - 1)])
            is_eos = jnp.any(tok_i[:, None] == eos_arr[None, :], axis=1)
            first_eos = jnp.min(jnp.where(is_eos, step_i, d))
            room = jnp.minimum(max_steps - c["emitted"],
                               T - 1 - n_tok)  # keep space for next pending
            emit_n = jnp.minimum(jnp.minimum(a + 1, first_eos), room)

            for i in range(d):
                ok = i < emit_n
                widx = jnp.minimum(n_tok + i, T - 1)
                tokens = tokens.at[widx].set(
                    jnp.where(ok, tok_i[i], tokens[widx]))
                seen = seen.at[tok_i[i]].set(seen[tok_i[i]] | ok)
            n_tok = n_tok + emit_n
            done = (first_eos <= a) | (c["emitted"] + emit_n >= max_steps) \
                | (n_tok >= T - 1) | (emit_n == 0)
            return {"tokens": tokens, "n_tok": n_tok, "seen": seen,
                    "caches": out["caches"], "emitted": c["emitted"] + emit_n,
                    "done": done, "iters": c["iters"] + 1,
                    "accepted": c["accepted"] + a}

        init = {"tokens": tokens0, "n_tok": n0, "seen": seen0,
                "caches": caches, "emitted": jnp.int32(0),
                "done": jnp.bool_(False), "iters": jnp.int32(0),
                "accepted": jnp.int32(0)}
        final = jax.lax.while_loop(cond, body, init)
        return (final["tokens"], final["n_tok"], final["iters"],
                final["accepted"])

    def generate_speculative(self, prompt_ids: Sequence[int],
                             max_new_tokens: int = 100,
                             repetition_penalty: float = 1.1,
                             draft_len: int = 8,
                             return_stats: bool = False):
        """Greedy generation with fused self-speculative decoding. Token
        stream is exactly generate(temperature=0.0) — verified by tests —
        but emits up to `draft_len` tokens per model forward when the
        continuation matches a 2-gram lookup in the context (typical for
        RAG answers that quote retrieved documents)."""
        max_prompt = self.cfg.max_seq_len - min(max_new_tokens,
                                                self.cfg.max_seq_len // 2)
        if len(prompt_ids) > max_prompt:
            prompt_ids = list(prompt_ids)[-max_prompt:]
        n = len(prompt_ids)
        cache_len = self._bucket(n + max_new_tokens + draft_len)
        L = self._bucket(n)
        padded = np.zeros((1, L), np.int32)
        padded[0, :n] = prompt_ids
        logits, caches = self._prefill(self.params, jnp.asarray(padded),
                                       jnp.int32(n), cache_len=cache_len)
        # first token from the prefill logits (host; restores the pending-
        # token invariant: cache holds n entries, tokens[0:n+1] confirmed)
        lg = np.array(logits, np.float32)
        seen_set = set(int(t) for t in prompt_ids)
        if repetition_penalty and repetition_penalty != 1.0 and seen_set:
            idxs = np.fromiter(seen_set, dtype=np.int64)
            vals = lg[idxs]
            lg[idxs] = np.where(vals > 0, vals / repetition_penalty,
                                vals * repetition_penalty)
        t0 = int(np.argmax(lg))
        if t0 in self.eos_ids or max_new_tokens < 1:
            return ([], {"iters": 0, "accepted": 0}) if return_stats else []
        tokens0 = np.full((cache_len,), -1, np.int32)
        tokens0[:n] = prompt_ids
        tokens0[n] = t0
        seen0 = jnp.zeros((self.cfg.vocab_size,), bool)
        seen0 = seen0.at[jnp.asarray(sorted(seen_set | {t0}),
                                     jnp.int32)].set(True)
        eos = sorted(self.eos_ids) or [-1]
        steps = _next_pow2_int(max(max_new_tokens - 1, 1))
        toks, n_tok, iters, accepted = self._generate_spec(
            self.params, jnp.asarray(tokens0), jnp.int32(n + 1), caches,
            seen0, jnp.float32(repetition_penalty),
            jnp.asarray(eos, jnp.int32), draft=draft_len, max_steps=steps)
        n_tok = int(n_tok)
        out = [int(t) for t in np.asarray(toks)[n:n_tok]][:max_new_tokens]
        if return_stats:
            return out, {"iters": int(iters), "accepted": int(accepted)}
        return out

    def generate(self, prompt_ids: Sequence[int], max_new_tokens: int = 100,
                 temperature: float = 0.2, repetition_penalty: float = 1.1,
                 seed: int = 0, fused: bool = True,
                 speculative: str = "auto") -> List[int]:
        """Sample continuation token ids (prompt not included).

        speculative: "auto" routes greedy requests (temperature == 0)
        through the fused self-speculative decoder — byte-identical output,
        up to ~4x faster when the continuation quotes the context (the RAG
        common case). "off" forces the plain fused loop."""
        if (speculative == "auto" and fused
                and not (temperature and temperature > 0)):
            return self.generate_speculative(
                prompt_ids, max_new_tokens=max_new_tokens,
                repetition_penalty=repetition_penalty)
        # context-window guard: keep the prompt tail, reserving room to
        # generate (the reference relies on HF truncation here)
        max_prompt = self.cfg.max_seq_len - min(max_new_tokens,
                                                self.cfg.max_seq_len // 2)
        if len(prompt_ids) > max_prompt:
            prompt_ids = list(prompt_ids)[-max_prompt:]
        n = len(prompt_ids)
        cache_len = self._bucket(n + max_new_tokens)
        L = self._bucket(n)
        padded = np.zeros((1, L), np.int32)
        padded[0, :n] = prompt_ids
        logits, caches = self._prefill(self.params, jnp.asarray(padded),
                                       jnp.int32(n), cache_len=cache_len)
        key = jax.random.PRNGKey(seed)
        if fused:
            steps = _next_pow2_int(max_new_tokens)
            seen0 = jnp.zeros((self.cfg.vocab_size,), bool)
            if repetition_penalty and repetition_penalty != 1.0 and n:
                seen0 = seen0.at[jnp.asarray(list(set(map(int, prompt_ids))),
                                             jnp.int32)].set(True)
            eos = sorted(self.eos_ids) or [-1]
            out, count = self._generate_fused(
                self.params, logits, caches, jnp.int32(n), seen0, key,
                jnp.float32(temperature), jnp.float32(repetition_penalty),
                jnp.asarray(eos, jnp.int32), max_steps=steps)
            count = min(int(count), max_new_tokens)
            return [int(t) for t in np.asarray(out)[:count]]
        out: List[int] = []
        seen = set(int(t) for t in prompt_ids)
        pos = n
        tok = None
        for _ in range(max_new_tokens):
            lg = np.array(logits, np.float32)  # writable copy
            if repetition_penalty and repetition_penalty != 1.0 and seen:
                idxs = np.fromiter(seen, dtype=np.int64)
                vals = lg[idxs]
                lg[idxs] = np.where(vals > 0, vals / repetition_penalty,
                                    vals * repetition_penalty)
            if temperature and temperature > 0:
                key, sub = jax.random.split(key)
                probs = jax.nn.softmax(jnp.asarray(lg) / temperature)
                tok = int(jax.random.choice(sub, lg.shape[-1], p=probs))
            else:
                tok = int(np.argmax(lg))
            if tok in self.eos_ids:
                break
            out.append(tok)
            seen.add(tok)
            logits, caches = self._decode(self.params,
                                          jnp.asarray([[tok]], jnp.int32),
                                          jnp.int32(pos), caches)
            pos += 1
            if pos >= cache_len:
                break
        return out

    def generate_text(self, prompt: str, max_new_tokens: int = 100,
                      temperature: float = 0.2, repetition_penalty: float = 1.1,
                      seed: int = 0) -> str:
        ids = self.tokenizer.encode(prompt)
        out = self.generate(ids, max_new_tokens, temperature,
                            repetition_penalty, seed)
        if hasattr(self.tokenizer, "decode"):
            return self.tokenizer.decode(out)
        return " ".join(str(t) for t in out)
