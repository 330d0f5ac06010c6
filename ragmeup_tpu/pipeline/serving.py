"""Continuous-batching serving engine for the local LLM.

The reference serves one Flask request at a time, rebuilding an HF cache
per call (SURVEY.md §2.4: "single-process, single-request"). This engine
serves many chat generations concurrently on one chip:

- prompts prefill individually (the existing length-bucketed prefill) and
  their K/V moves into the shared ``PagedKVCache`` pool;
- every engine step decodes ONE token for ALL active sequences in a single
  batched forward whose attention is the paged-attention kernel (pages
  stay in HBM; per-sequence page tables);
- sequences join and retire independently (continuous batching) — a new
  request starts decoding on the next step without waiting for others.

Sampling (temperature / repetition penalty / EOS) matches
``LocalLLM.generate`` semantics per sequence.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ragmeup_tpu.models.decoder import LocalLLM, _next_pow2_int
from ragmeup_tpu.ops.paged_attention import PagedKVCache


def _prefill_chunk_program(model, with_head, params, ids, positions,
                           page_idx, length, pages, slots, head_at,
                           k_pages, v_pages):
    """One chunked-prefill dispatch: write this chunk's K/V straight into
    the page pool (no transient dense cache) and attend it against the
    prefix via the chunk-append paged kernel. With ``with_head`` (the
    final chunk) returns the lm_head logits at `head_at` packed with the
    pools; intermediate chunks skip the head entirely.

    Padded tail rows write to the trash page, sit past every real row's
    causal limit, and their outputs are never read."""
    out = model.apply({"params": params}, ids,
                      positions=positions,
                      paged_caches=list(zip(k_pages, v_pages)),
                      paged_meta=(page_idx, length, pages, slots),
                      head_at=head_at if with_head else None,
                      skip_head=not with_head)
    new_k = [kp for kp, _ in out["paged_caches"]]
    new_v = [vp for _, vp in out["paged_caches"]]
    logits = out["logits"][0, 0] if with_head else None
    return logits, new_k, new_v


def _prefill_chunk_batched_program(model, with_head, params, ids,
                                   positions, page_idx, lengths, pages,
                                   slots, head_at, k_pages, v_pages):
    """One BATCHED chunked-prefill dispatch: the same chunk for b prompts
    at once — K/V scattered by the batched writer (paged_update_chunk),
    chunk attention batched over rows (round-2 verdict #7: concurrent
    arrivals used to serialize their 280-589 ms prefills). ids/positions/
    pages/slots are (b, cs); head_at is PER-ROW (each row's last real
    token offset within this chunk; rows not ending here read a dummy).
    with_head runs the lm_head only for chunks where >= 1 row ends."""
    out = model.apply({"params": params}, ids,
                      positions=positions,
                      paged_caches=list(zip(k_pages, v_pages)),
                      paged_meta=(page_idx, lengths, pages, slots),
                      head_at=head_at if with_head else None,
                      skip_head=not with_head)
    new_k = [kp for kp, _ in out["paged_caches"]]
    new_v = [vp for _, vp in out["paged_caches"]]
    logits = out["logits"][:, 0] if with_head else None
    return logits, new_k, new_v


def _decode_program(model, topk_support, params, meta, k_pages, v_pages):
    """One batched paged decode step. meta: one packed (B, mp+5) int32
    array — a single host->device transfer per step (each extra device_put
    costs a tunnel roundtrip): columns
    [token, position, page, slot, length, page_idx...]."""
    tokens = meta[:, 0]
    positions = meta[:, 1]
    pages = meta[:, 2]
    slots = meta[:, 3]
    lengths = meta[:, 4]
    page_idx = meta[:, 5:]
    out = model.apply(
        {"params": params}, tokens[:, None], positions=positions[:, None],
        paged_caches=list(zip(k_pages, v_pages)),
        paged_meta=(page_idx, lengths, pages, slots))
    new_k = [kp for kp, _ in out["paged_caches"]]
    new_v = [vp for _, vp in out["paged_caches"]]
    # ship only the top-K support to host, packed into ONE array (the
    # device->host path has high per-fetch latency)
    vals, ids = jax.lax.top_k(out["logits"][:, 0], topk_support)
    from ragmeup_tpu.ops.topk import pack_scores_ids
    return pack_scores_ids(vals, ids), new_k, new_v


def _wave_program(model, params, logits0, key0, seen0, done0, emitted0, pos0,
                  temps, rps, max_new, tables, trash_page, eos_arr,
                  k_pages, v_pages, *, steps: int):
    """`steps` decode+sample iterations in one device program (see
    _WaveMixin). tables: ONE packed (B, 2*steps + max_pages_per_seq) int32
    upload — [pages_step | slots_step | page_idx]. Separate device_puts each
    cost a tunnel round-trip in this environment."""
    pages_step = tables[:, :steps]
    slots_step = tables[:, steps:2 * steps]
    page_idx = tables[:, 2 * steps:]
    B = logits0.shape[0]
    out0 = jnp.full((B, steps), -1, jnp.int32)

    def body(s, carry):
        (logits, key, seen, done, emitted, pos, out, k_p, v_p) = carry
        penal = jnp.where(logits > 0, logits / rps[:, None],
                          logits * rps[:, None])
        lg = jnp.where(seen & (rps != 1.0)[:, None], penal, logits)
        key, sub = jax.random.split(key)
        sampled = jax.random.categorical(
            sub, lg / jnp.maximum(temps, 1e-6)[:, None])
        tok = jnp.where(temps > 0, sampled,
                        jnp.argmax(lg, axis=1)).astype(jnp.int32)
        is_eos = jnp.any(tok[:, None] == eos_arr[None, :], axis=1)
        emit = (~done) & (~is_eos) & (emitted < max_new)
        out = out.at[:, s].set(jnp.where(emit, tok, -1))
        rows = jnp.arange(B)
        seen = seen.at[rows, tok].set(seen[rows, tok] | emit)
        done = done | is_eos | (emitted >= max_new)
        emitted = emitted + emit
        w_pages = jnp.where(emit, pages_step[:, s], trash_page)
        w_slots = jnp.where(emit, slots_step[:, s], 0)
        lengths = pos + 1
        tok_in = jnp.where(emit, tok, 0)
        mout = model.apply(
            {"params": params}, tok_in[:, None], positions=pos[:, None],
            paged_caches=list(zip(k_p, v_p)),
            paged_meta=(page_idx, lengths, w_pages, w_slots))
        k_p = [kp for kp, _ in mout["paged_caches"]]
        v_p = [vp for _, vp in mout["paged_caches"]]
        logits = mout["logits"][:, 0]
        pos = pos + emit
        return (logits, key, seen, done, emitted, pos, out, k_p, v_p)

    carry = (logits0, key0, seen0, done0, emitted0, pos0, out0,
             list(k_pages), list(v_pages))
    carry = jax.lax.fori_loop(0, steps, body, carry)
    (logits, key, seen, done, emitted, pos, out, k_p, v_p) = carry
    return out, logits, key, seen, done, emitted, pos, k_p, v_p


def _wave_spec_program(model, params, logits0, key0, seen0, done0, emitted0,
                       pos0, ctx0, temps, rps, max_new, cover, page_idx,
                       trash_page, eos_arr, k_pages, v_pages, *, iters: int,
                       draft: int, page_size: int, limit: int):
    """Speculative wave: `iters` batched CHUNK forwards of width `draft`
    per dispatch. Each iteration samples every row's next token from the
    carried logits (exact _wave_program semantics), then — for greedy rows
    — appends a 2-gram prompt-lookup draft from the row's device-resident
    context and verifies the whole chunk in ONE forward (decode is weight-
    bound: a d-wide chunk costs about one token). Accepted drafts emit in
    the same iteration, so a greedy row advances up to `draft` tokens per
    forward while temperature rows advance exactly one — concurrent greedy
    requests keep the speculative win instead of losing it the moment a
    second request arrives (round-2 verdict weak #3 / next #1).

    Greedy rows are byte-identical to the plain wave/engine stream: a
    draft token is only emitted when it EQUALS the penalized argmax at its
    position (solo _generate_spec acceptance, batched).

    Parity contract, precisely: every emitted token equals the penalized
    argmax of the logits its OWN verify forward computed — the guarantee
    is per-forward, not cross-kernel. The d-wide chunk forward and the
    s=1 decode forward are different XLA/pallas programs whose attention
    reductions round differently at the last bf16 bit (measured: layer-0
    K/V writes are BIT-IDENTICAL between the two paths and the projection/
    rope math is exact — scripts/debug_kv_parity.py; the one-ulp attention
    output difference then rides the bf16 residual stream and lands on the
    logits at roughly one bf16 ulp of their magnitude, ~0.02-0.1 at a
    4-layer/1024-hidden scale — scripts/debug_demote_parity.py). When a
    step's true argmax margin is below that, spec and plain waves can emit
    different (equally valid) tokens. Margins on real checkpoints are
    almost always far above it (measured streams match byte-for-byte);
    RANDOM-weight models (near-uniform logits, margins ~1 ulp) flip
    routinely — see docs/BENCH_NOTES.md "Kind-switch parity". The
    adaptive gate's spec->wave demotion inherits exactly this contract
    (the carry handoff itself is exact).

    ctx0 (B, T): per-row confirmed tokens (prompt + generated) — the draft
    source, updated on device. Page/slot for every written token computes
    on device from page_idx (host pre-extends page allocations).

    Returns (out (B, iters*draft) emitted tokens / -1 holes, pos_after,
    done, carry...) — pos/done ride the fetch so the host learns each
    row's variable advance without a second round-trip."""
    B, V = logits0.shape
    T = ctx0.shape[1]
    d = draft
    rows = jnp.arange(B)
    out0 = jnp.full((B, iters * d), -1, jnp.int32)

    def body(it, carry):
        (logits, key, seen, done, emitted, pos, ctx, out, k_p, v_p) = carry
        # -- sample the pending token (exact _wave_program semantics) --
        penal = jnp.where(logits > 0, logits / rps[:, None],
                          logits * rps[:, None])
        lg = jnp.where(seen & (rps != 1.0)[:, None], penal, logits)
        key, sub = jax.random.split(key)
        sampled = jax.random.categorical(
            sub, lg / jnp.maximum(temps, 1e-6)[:, None])
        t0 = jnp.where(temps > 0, sampled,
                       jnp.argmax(lg, axis=1)).astype(jnp.int32)
        is_eos0 = jnp.any(t0[:, None] == eos_arr[None, :], axis=1)
        live = (~done) & (~is_eos0) & (emitted < max_new)             & (pos + 1 < limit)
        # -- 2-gram draft from the device-resident context (greedy only) --
        t1 = ctx[rows, jnp.maximum(pos - 1, 0)]
        j = jnp.arange(T - 1)
        match = ((ctx[:, :-1] == t1[:, None]) & (ctx[:, 1:] == t0[:, None])
                 & (j[None, :] <= (pos - d - 1)[:, None]))
        m = jnp.max(jnp.where(match, j[None, :], -1), axis=1)
        have = (m >= 0) & (temps == 0) & live
        start = jnp.clip(m + 2, 0, T - d)
        cont = jax.vmap(
            lambda row, st: jax.lax.dynamic_slice(row, (st,), (d - 1,))
        )(ctx, start)
        idxs = start[:, None] + jnp.arange(d - 1)[None, :]
        cont = jnp.where(have[:, None] & (idxs < pos[:, None]), cont, 0)
        chunk = jnp.concatenate([t0[:, None], cont], axis=1)      # (B, d)
        chunk = jnp.where(live[:, None], chunk, 0)
        # -- chunk forward: device-computed page/slot per token --
        positions = jnp.clip(pos[:, None] + jnp.arange(d)[None, :],
                             0, limit - 1)
        # writes stay inside the row's PRE-EXTENDED page cover: beyond it
        # the page-index table holds unrelated pool pages (slot-0 zeros),
        # and positions past `cover` can never be emitted or attended
        # (emission is clipped by the same max_new/limit bounds the host
        # used to size the cover) — so they go to the trash page
        raw_pos = pos[:, None] + jnp.arange(d)[None, :]
        in_range = (raw_pos < limit) & (raw_pos < cover[:, None])
        w_ok = live[:, None] & in_range
        pg = jnp.take_along_axis(page_idx, positions // page_size, axis=1)
        w_pages = jnp.where(w_ok, pg, trash_page)
        w_slots = jnp.where(w_ok, positions % page_size, 0)
        lengths = jnp.where(live, pos + d, d)
        mout = model.apply(
            {"params": params}, chunk, positions=positions,
            paged_caches=list(zip(k_p, v_p)),
            paged_meta=(page_idx, lengths, w_pages, w_slots))
        k_p = [kp for kp, _ in mout["paged_caches"]]
        v_p = [vp for _, vp in mout["paged_caches"]]
        logits_all = mout["logits"]                               # (B, d, V)
        # -- batched greedy-with-penalty verify (solo _generate_spec) --
        pen_all = jnp.where(logits_all > 0, logits_all / rps[:, None, None],
                            logits_all * rps[:, None, None])
        oh = jax.nn.one_hot(cont, V, dtype=jnp.int32)             # (B,d-1,V)
        grew = jnp.cumsum(oh, axis=1) > 0
        seen_rows = jnp.concatenate(
            [jnp.zeros((B, 1, V), bool), grew], axis=1) | seen[:, None, :]
        lg_all = jnp.where(seen_rows & (rps != 1.0)[:, None, None],
                           pen_all, logits_all)
        greedy = jnp.argmax(lg_all, axis=-1).astype(jnp.int32)    # (B, d)
        acc = jnp.cumprod(
            (chunk[:, 1:] == greedy[:, :-1]).astype(jnp.int32), axis=1)
        a = jnp.where(have, jnp.sum(acc, axis=1), 0)              # (B,)
        # -- emission: t0 + accepted drafts, bounded by eos/max_new/pages --
        step_i = jnp.arange(d)[None, :]
        chk_eos = jnp.any(chunk[:, :, None] == eos_arr[None, None, :],
                          axis=2)
        fe = jnp.min(jnp.where(chk_eos, step_i, d), axis=1)       # (B,)
        room = jnp.minimum(max_new - emitted, limit - 1 - pos)
        n_emit = jnp.minimum(jnp.minimum(1 + a, fe), room)
        n_emit = jnp.where(live, n_emit, 0)
        hit_eos = is_eos0 | (fe <= a)
        for i in range(d):
            ok = i < n_emit
            out = out.at[:, it * d + i].set(
                jnp.where(ok, chunk[:, i], -1))
            widx = jnp.clip(pos + i, 0, T - 1)
            ctx = ctx.at[rows, widx].set(
                jnp.where(ok, chunk[:, i], ctx[rows, widx]))
            seen = seen.at[rows, chunk[:, i]].set(
                seen[rows, chunk[:, i]] | ok)
        emitted = emitted + n_emit
        pos = pos + n_emit
        done = done | (live & hit_eos) | is_eos0 | (emitted >= max_new)             | (pos + 1 >= limit) | (~live & ~done)
        # next distribution = after the LAST emitted chunk token
        nl_row = jnp.maximum(n_emit - 1, 0)
        new_logits = logits_all[rows, nl_row]
        logits = jnp.where((n_emit > 0)[:, None], new_logits, logits)
        return (logits, key, seen, done, emitted, pos, ctx, out, k_p, v_p)

    carry = (logits0, key0, seen0, done0, emitted0, pos0, ctx0, out0,
             list(k_pages), list(v_pages))
    carry = jax.lax.fori_loop(0, iters, body, carry)
    (logits, key, seen, done, emitted, pos, ctx, out, k_p, v_p) = carry
    # ONE packed host fetch: [tokens | pos | done] — separate fetches cost
    # a ~26 ms round-trip each on this tunnel
    packed = jnp.concatenate(
        [out, pos[:, None], done.astype(jnp.int32)[:, None]], axis=1)
    return (packed, logits, key, seen, done, emitted, pos, ctx, k_p, v_p)


class _SeqState:
    __slots__ = ("prompt_len", "pos", "out", "vals", "ids", "key", "seen",
                 "max_new", "temperature", "rep_penalty", "done",
                 "dev_logits", "reserved_pages", "prompt_ids")

    def __init__(self, prompt_len, vals, ids, key, seen, max_new,
                 temperature, rep_penalty):
        self.prompt_len = prompt_len
        self.prompt_ids: List[int] = []
        self.pos = prompt_len
        self.out: List[int] = []
        self.vals = vals  # top-K logit values
        self.ids = ids    # top-K token ids
        self.key = key
        self.seen = seen
        self.max_new = max_new
        self.temperature = temperature
        self.rep_penalty = rep_penalty
        self.done = False


class ServingEngine:
    def __init__(self, llm: LocalLLM, num_pages: int = 256,
                 page_size: int = 64, max_pages_per_seq: int = 16,
                 max_batch: int = 16, topk_support: int = 64,
                 prefill_chunk: int = 256, prefix_cache: bool = True,
                 spec_accept_floor: float = 1.35,
                 spec_reprobe_every: int = 16):
        self.llm = llm
        cfg = llm.cfg
        # adaptive speculation (round-4 measurement: at floor acceptance a
        # draft-8 chunk forward costs ~1.24x a plain wave forward at 8B —
        # 362.7 vs 448.8 tok/s batch-8 — so spec only pays when rows emit
        # more than ~1.24 tokens/forward). _spec_collect tracks the greedy
        # rows' emitted-tokens-per-forward EWMA; _spec_gate falls back to
        # plain waves below the floor and re-probes spec every
        # `spec_reprobe_every` plain dispatches (acceptance can recover
        # mid-generation, e.g. once the answer starts quoting the prompt).
        # floor <= 0 disables adaptation (spec always on when requested).
        self.spec_accept_floor = spec_accept_floor
        self.spec_reprobe_every = max(spec_reprobe_every, 1)
        self._spec_accept: Optional[float] = None
        self._spec_waves = 0
        self._spec_mode = "spec"
        self._spec_probe_left = 0
        self.page_size = page_size
        # sampling happens within the device-computed top-K support (top-k
        # sampling; greedy is exact since the argmax is always in support)
        self.topk_support = min(topk_support, cfg.vocab_size)
        self.max_pages_per_seq = max_pages_per_seq
        self.max_batch = max_batch
        # mesh mode (round-3 verdict #2): when the LLM is model-sharded,
        # the page pools shard their kv-head dim over 'model' and every
        # engine program (paged decode, waves, spec-waves, chunked
        # prefill) runs the paged kernel on per-shard local shapes inside
        # shard_map (LlamaAttention._paged_tp). Host bookkeeping — page
        # tables, admission, sampling state — is mesh-agnostic.
        self.mesh = getattr(llm, "mesh", None)
        self.cache = PagedKVCache(num_pages, page_size, cfg.num_kv_heads,
                                  cfg.head_dim, cfg.num_layers,
                                  dtype=cfg.jdtype, mesh=self.mesh)
        # reserved trash page: batch-padding rows write here harmlessly
        self.cache.allocate("__pad__", 1)
        self._wave_counter = 0
        self.seqs: Dict[object, _SeqState] = {}
        # jitted programs are cached ON THE SHARED LLM, not per engine: a new
        # ServingEngine over the same model must not re-trace the 32-layer
        # program (seconds of Python tracing even when XLA's compile cache
        # hits — measured as a 3.5 s first-dispatch outlier at 8B)
        if not hasattr(llm, "_paged_decode_jits"):
            llm._paged_decode_jits = {}
        self._decode = llm._paged_decode_jits.get(self.topk_support)
        if self._decode is None:
            self._decode = jax.jit(
                functools.partial(_decode_program, llm.model,
                                  self.topk_support),
                donate_argnums=(2, 3))
            llm._paged_decode_jits[self.topk_support] = self._decode
        # chunked prefill: ONE fixed-shape program regardless of prompt
        # length (vs one dense-prefill compile per length bucket), zero
        # transient dense KV cache, K/V written straight into pages. Needs
        # the one-token-per-row page layout (hd % 128 == 0): the chunk
        # writer scatters one row per token.
        # the chunk-append kernel keeps (num_heads, chunk, head_dim) f32
        # accumulators + the q block in VMEM for a whole sequence; cap the
        # chunk so that stays ~2 MB (8B: 128 tokens/chunk; measured 28 MB
        # VMEM OOM at chunk=512)
        vmem_cap = max(32, (2 * 1024 * 1024)
                       // max(cfg.num_heads * cfg.head_dim * 4, 1))
        pow2 = 32
        while pow2 * 2 <= vmem_cap:
            pow2 *= 2
        self.prefill_chunk = min(prefill_chunk, pow2)
        # one-token-per-row layouts qualify: hd % 128 == 0 natively, and
        # hd=96-class pools (store_hd padded to 128) — only the PACKED
        # c-tokens-per-row layout is excluded (chunk rows would collide)
        self.chunked_prefill = self.cache.tok_per_row == 1
        # hash-block prefix reuse (round-3 verdict #3): retired sequences
        # register their full pages; later prompts sharing the prefix skip
        # re-prefilling it. Needs chunked prefill (the dense-prefill
        # fallback always recomputes the whole prompt). Byte-identical:
        # reused K/V equals what re-prefilling would write.
        self.prefix_cache = prefix_cache and self.chunked_prefill
        if self.chunked_prefill:
            # two traces: non-final chunks skip the lm_head entirely (a
            # ~0.5 GB weight read per chunk at 8B whose result would be
            # discarded). Keyed on the EFFECTIVE chunk so engines built
            # with different requested sizes share the cap'd program.
            self._prefill_chunked = {}
            for with_head in (False, True):
                key = ("prefill", self.prefill_chunk, max_pages_per_seq,
                       with_head)
                fn = llm._paged_decode_jits.get(key)
                if fn is None:
                    fn = jax.jit(
                        functools.partial(_prefill_chunk_program, llm.model,
                                          with_head),
                        donate_argnums=(8, 9))
                    llm._paged_decode_jits[key] = fn
                self._prefill_chunked[with_head] = fn

    # -- admission control --------------------------------------------------------

    def _lifetime_pages(self, n_prompt: int, max_new: int) -> int:
        """Worst-case page count a request will ever hold (after the same
        prompt truncation add_request applies)."""
        max_prompt = self.max_pages_per_seq * self.page_size - max_new
        n = min(n_prompt, max(max_prompt, 8))
        toks = min(n + max_new, self.max_pages_per_seq * self.page_size)
        return -(-toks // self.page_size)

    def can_admit(self, n_prompt: int, max_new: int,
                  extra_reserved: int = 0) -> bool:
        """True if the page pool can cover this request's FULL lifetime on
        top of every active sequence's outstanding reservation — admitting
        only under this invariant means a mid-decode ``extend`` can never
        hit MemoryError and kill the serving worker. ``extra_reserved``
        accounts for requests already collected into the same admission
        group but not yet allocated."""
        need = self._lifetime_pages(n_prompt, max_new)
        outstanding = extra_reserved
        for sid, st in self.seqs.items():
            if st.done:
                continue
            held = len(self.cache.seq_pages.get(sid, []))
            outstanding += max(0, getattr(st, "reserved_pages", held) - held)
        return self.cache.available_pages - outstanding >= need

    # -- request lifecycle -------------------------------------------------------

    def add_request(self, seq_id, prompt_ids: Sequence[int],
                    max_new_tokens: int = 100, temperature: float = 0.2,
                    repetition_penalty: float = 1.1, seed: int = 0) -> None:
        """Prefill the prompt, move its K/V into the page pool, queue for
        decoding."""
        if seq_id in self.seqs:
            raise ValueError(f"duplicate seq_id {seq_id}")
        llm = self.llm
        # cap by BOTH the page budget and the model's context window (the
        # dense-prefill bucket clamps at max_seq_len — a page pool larger
        # than the window used to overflow the padded prompt buffer)
        max_prompt = min(
            self.max_pages_per_seq * self.page_size - max_new_tokens,
            llm.cfg.max_seq_len
            - min(max_new_tokens, llm.cfg.max_seq_len // 2))
        prompt_ids = list(prompt_ids)[-max(max_prompt, 8):]
        n = len(prompt_ids)
        if self.chunked_prefill:
            logits = self._prefill_into_pages(seq_id, prompt_ids)
        else:
            L = llm._bucket(n)
            padded = np.zeros((1, L), np.int32)
            padded[0, :n] = prompt_ids
            logits, caches = llm._prefill(llm.params, jnp.asarray(padded),
                                          jnp.int32(n), cache_len=L)
            self.cache.allocate(seq_id, n)
            for layer, (ck, cv) in enumerate(caches):
                self.cache.write_prompt(layer, seq_id, ck[0, :n], cv[0, :n])
        seen = set(int(t) for t in prompt_ids)
        # ONE packed D2H fetch (CLAUDE.md: two separate fetches cost 2x
        # the ~26 ms RTT and risk the multi-second pathological path)
        from ragmeup_tpu.ops.topk import pack_scores_ids, unpack_scores_ids
        vals_d, ids_d = jax.lax.top_k(logits, self.topk_support)
        packed = np.asarray(pack_scores_ids(vals_d[None], ids_d[None]))
        vals2, ids2 = unpack_scores_ids(packed)
        st = _SeqState(
            n, vals2[0].copy(), ids2[0].copy(),
            jax.random.PRNGKey(seed), seen,
            max_new_tokens, temperature, repetition_penalty)
        st.prompt_ids = list(prompt_ids)  # spec-wave draft context
        st.dev_logits = logits  # stays on device (wave mode)
        st.reserved_pages = self._lifetime_pages(n, max_new_tokens)
        self.seqs[seq_id] = st
        self._spec_track_reset()  # new prompt: re-earn speculation

    def _prefill_into_pages(self, seq_id, prompt_ids):
        """Chunked paged prefill (see _prefill_chunk_program). Returns the
        last real token's logits (the same contract as llm._prefill).

        With the prefix cache, leading full pages whose chain digests are
        already registered are reused and prefill starts at the first
        uncached position — the chunk-append kernel attends the reused
        prefix through the same page tables it would attend a prefilled
        one, so outputs are byte-identical."""
        llm = self.llm
        ps = self.page_size
        cs = self.prefill_chunk
        n = len(prompt_ids)
        if self.prefix_cache:
            n_cached = self.cache.allocate_prefixed(seq_id, prompt_ids)
        else:
            self.cache.allocate(seq_id, n)
            n_cached = 0
        plist = self.cache.seq_pages[seq_id]
        mp = self.max_pages_per_seq
        page_idx = np.zeros((1, mp), np.int32)
        page_idx[0, :len(plist)] = plist
        page_idx_d = jnp.asarray(page_idx)
        pad_page = self.cache.seq_pages["__pad__"][0]
        max_pos = llm.cfg.max_seq_len - 1
        logits = None
        for c0 in range(n_cached, n, cs):
            chunk = prompt_ids[c0:c0 + cs]
            m = len(chunk)
            ids = np.zeros((1, cs), np.int32)
            ids[0, :m] = chunk
            positions = np.clip(np.arange(c0, c0 + cs), 0, max_pos)
            pages = np.full(cs, pad_page, np.int32)
            slots = np.arange(cs, dtype=np.int32) % ps  # pad rows: trash
            for j in range(m):
                pos = c0 + j
                pages[j] = plist[pos // ps]
                slots[j] = pos % ps
            # length counts the WHOLE chunk (incl. pad rows): real row j
            # then gets causal limit c0+j+1; pad rows read garbage that is
            # never emitted (head_at < m)
            length = jnp.asarray([c0 + cs], jnp.int32)
            final = c0 + cs >= n
            logits, new_k, new_v = self._prefill_chunked[final](
                llm.params, jnp.asarray(ids),
                jnp.asarray(positions)[None, :], page_idx_d, length,
                jnp.asarray(pages), jnp.asarray(slots), jnp.int32(m - 1),
                self.cache.k_pages, self.cache.v_pages)
            self.cache.k_pages = list(new_k)
            self.cache.v_pages = list(new_v)
        if self.prefix_cache:
            # register the prompt's full pages NOW (not only at retire):
            # concurrent requests and the same /chat's later forwards
            # (rewrite-ask → generate share the system+context block)
            # reuse them while this sequence is still generating
            self.cache.register_prefix(seq_id, prompt_ids)
        return logits

    def add_requests(self, reqs: List[dict]) -> None:
        """Admit SEVERAL requests at once. With chunked prefill available,
        all prompts prefill TOGETHER chunk-by-chunk (one dispatch per chunk
        for the whole group instead of one prefill pipeline per request) —
        TTFT for n concurrent arrivals ≈ the longest solo TTFT, not the
        sum (round-2 verdict #7). Falls back to sequential add_request
        when batching can't apply. Each req dict: {id, prompt_ids,
        max_new, temperature, rp, seed?}."""
        if len(reqs) > 1 and self.chunked_prefill:
            self._add_requests_batched(reqs)
            return
        for r in reqs:
            self.add_request(r["id"], r["prompt_ids"],
                             max_new_tokens=r["max_new"],
                             temperature=r["temperature"],
                             repetition_penalty=r["rp"],
                             seed=r.get("seed", 0))

    def _add_requests_batched(self, reqs: List[dict]) -> None:
        ps = self.page_size
        mpp = self.max_pages_per_seq
        items = []
        try:
            msl = self.llm.cfg.max_seq_len
            for r in reqs:
                if r["id"] in self.seqs:
                    raise ValueError("duplicate seq_id %s" % r["id"])
                max_prompt = min(mpp * ps - r["max_new"],
                                 msl - min(r["max_new"], msl // 2))
                pids = list(r["prompt_ids"])[-max(max_prompt, 8):]
                if self.prefix_cache:
                    n_cached = self.cache.allocate_prefixed(r["id"], pids)
                else:
                    self.cache.allocate(r["id"], len(pids))
                    n_cached = 0
                items.append((r, pids, n_cached))
        except Exception:
            for r, _, _ in items:  # release the group's partial allocations
                self.cache.free(r["id"])
            raise
        try:
            self._run_batched_prefill(items)
        except Exception:
            for r, _, _ in items:
                self.cache.free(r["id"])
                self.seqs.pop(r["id"], None)
            raise

    def _run_batched_prefill(self, items) -> None:
        """items: [(req, pids, n_cached)]. Rows prefill only their UNCACHED
        tail (positions >= n_cached — prefix-cache pages already hold the
        rest); per-row positions/lengths keep the chunk program shape-
        stable, so cached and uncached rows share each dispatch."""
        from ragmeup_tpu.ops.topk import pack_scores_ids, unpack_scores_ids
        llm = self.llm
        ps = self.page_size
        cs = self.prefill_chunk
        mpp = self.max_pages_per_seq
        b = len(items)
        pad_page = self.cache.seq_pages["__pad__"][0]
        max_pos = llm.cfg.max_seq_len - 1
        n_chunks = max(-(-(len(p) - nc) // cs) for _, p, nc in items)
        page_idx = np.zeros((b, mpp), np.int32)
        page_idx[:, 0] = pad_page
        for i, (r, pids, _) in enumerate(items):
            plist = self.cache.seq_pages[r["id"]]
            page_idx[i, :len(plist)] = plist
        page_idx_d = jnp.asarray(page_idx)
        jits = getattr(llm, "_batched_prefill_jits", None)
        if jits is None:
            jits = llm._batched_prefill_jits = {}
        logits_rows = [None] * b
        for ci in range(n_chunks):
            ids = np.zeros((b, cs), np.int32)
            positions = np.tile(
                np.clip(np.arange(ci * cs, (ci + 1) * cs), 0, max_pos),
                (b, 1)).astype(np.int32)
            pages = np.full((b, cs), pad_page, np.int32)
            slots = np.tile(np.arange(cs, dtype=np.int32) % ps, (b, 1))
            lengths = np.full(b, cs, np.int32)
            head_at = np.zeros(b, np.int32)
            ends_here = []
            for i, (r, pids, nc) in enumerate(items):
                c0 = nc + ci * cs  # this row's absolute chunk start
                m = min(len(pids) - c0, cs)
                if m <= 0:
                    continue
                ids[i, :m] = pids[c0:c0 + m]
                positions[i] = np.clip(np.arange(c0, c0 + cs), 0, max_pos)
                plist = self.cache.seq_pages[r["id"]]
                for j in range(m):
                    pos = c0 + j
                    pages[i, j] = plist[pos // ps]
                    slots[i, j] = pos % ps
                lengths[i] = c0 + cs
                if c0 + m >= len(pids):
                    head_at[i] = m - 1
                    ends_here.append(i)
            with_head = bool(ends_here)
            key = ("batched_prefill", self.prefill_chunk, b, with_head)
            fn = jits.get(key)
            if fn is None:
                fn = jax.jit(
                    functools.partial(_prefill_chunk_batched_program,
                                      llm.model, with_head),
                    donate_argnums=(8, 9))
                jits[key] = fn
            logits, new_k, new_v = fn(
                llm.params, jnp.asarray(ids), jnp.asarray(positions),
                page_idx_d, jnp.asarray(lengths), jnp.asarray(pages),
                jnp.asarray(slots), jnp.asarray(head_at),
                self.cache.k_pages, self.cache.v_pages)
            self.cache.k_pages = list(new_k)
            self.cache.v_pages = list(new_v)
            for i in ends_here:
                logits_rows[i] = logits[i]
        # one packed fetch for ALL rows' top-K supports
        vals_d, ids_d = jax.lax.top_k(jnp.stack(logits_rows),
                                      self.topk_support)
        packed = np.asarray(pack_scores_ids(vals_d, ids_d))
        vals2, ids2 = unpack_scores_ids(packed)
        for i, (r, pids, _) in enumerate(items):
            st = _SeqState(
                len(pids), vals2[i].copy(), ids2[i].copy(),
                jax.random.PRNGKey(r.get("seed", 0)),
                set(int(t) for t in pids),
                r["max_new"], r["temperature"], r["rp"])
            st.prompt_ids = list(pids)
            st.dev_logits = logits_rows[i]
            st.reserved_pages = self._lifetime_pages(len(pids), r["max_new"])
            self.seqs[r["id"]] = st
            if self.prefix_cache:
                self.cache.register_prefix(r["id"], pids)
        self._spec_track_reset()  # new prompts: re-earn speculation

    def _sample(self, st: _SeqState) -> int:
        """Sample within the top-K support (penalty + temperature)."""
        if st.vals is None:
            # host snapshot invalidated by a wave dispatch — refresh from the
            # (already flushed) device-resident logits
            vals, ids = jax.lax.top_k(st.dev_logits, self.topk_support)
            st.vals = np.array(vals, np.float32)
            st.ids = np.array(ids)
        lg = st.vals.copy()
        if st.rep_penalty and st.rep_penalty != 1.0 and st.seen:
            hit = np.isin(st.ids, np.fromiter(st.seen, dtype=np.int64))
            lg = np.where(hit, np.where(lg > 0, lg / st.rep_penalty,
                                        lg * st.rep_penalty), lg)
        if st.temperature and st.temperature > 0:
            st.key, sub = jax.random.split(st.key)
            j = int(jax.random.categorical(sub, jnp.asarray(lg) / st.temperature))
        else:
            j = int(np.argmax(lg))
        return int(st.ids[j])

    def _flush_wave_state(self) -> None:
        """Write the device-resident wave carry's per-row logits back to
        their sequences and drop the carry. Must run before any host-side
        state mutation that the carry would shadow (single-step decode,
        retire, batch-membership change) — rows that later rejoin a wave
        batch are rebuilt from `st.dev_logits`."""
        prev = getattr(self, "_wave_state", None)
        if prev is not None:
            for j, old_sid in enumerate(prev["sig"][0]):
                if old_sid in self.seqs:
                    self.seqs[old_sid].dev_logits = prev["logits"][j]
        self._wave_state = None
        sprev = getattr(self, "_spec_state", None)
        if sprev is not None:
            for j, old_sid in enumerate(sprev["sig"][0]):
                if old_sid in self.seqs:
                    self.seqs[old_sid].dev_logits = sprev["logits"][j]
        self._spec_state = None

    def step(self) -> int:
        """Sample one token for every active sequence, run one batched paged
        decode step. Returns the number of sequences still active."""
        self._flush_wave_state()  # single-step path mutates pos/seen on host
        active = [(sid, st) for sid, st in self.seqs.items() if not st.done]
        if not active:
            return 0
        active = active[:self.max_batch]
        batch, toks = [], []
        for sid, st in active:
            tok = self._sample(st)
            if tok in self.llm.eos_ids or len(st.out) >= st.max_new or \
                    st.pos + 1 >= self.max_pages_per_seq * self.page_size:
                st.done = True
                continue
            st.out.append(tok)
            st.seen.add(tok)
            batch.append((sid, st))
            toks.append(tok)
        if not batch:
            return sum(1 for _, st in self.seqs.items() if not st.done)
        # grow pages for the new token, build one packed meta array
        B = _next_pow2_int(len(batch))
        mp = self.max_pages_per_seq
        meta = np.zeros((B, mp + 5), np.int32)
        pad_page = self.cache.seq_pages["__pad__"][0]
        meta[:, 2] = pad_page   # page
        meta[:, 4] = 1          # length (pad rows: trash page)
        meta[:, 5] = pad_page   # page_idx[0]
        for i, (sid, st) in enumerate(batch):
            self.cache.extend(sid, 1)
            plist = self.cache.seq_pages[sid]
            meta[i, 0] = toks[i]
            meta[i, 1] = st.pos
            meta[i, 2] = plist[st.pos // self.page_size]
            meta[i, 3] = st.pos % self.page_size
            meta[i, 4] = st.pos + 1
            meta[i, 5:5 + len(plist)] = plist
        packed, new_k, new_v = self._decode(
            self.llm.params, jnp.asarray(meta),
            self.cache.k_pages, self.cache.v_pages)
        self.cache.k_pages = list(new_k)
        self.cache.v_pages = list(new_v)
        from ragmeup_tpu.ops.topk import unpack_scores_ids
        vals, ids = unpack_scores_ids(packed)
        vals = vals.copy()
        for i, (sid, st) in enumerate(batch):
            st.vals = vals[i]
            st.ids = ids[i]
            st.pos += 1
            st.dev_logits = None  # device copy is stale; host top-k is fresh
        return sum(1 for _, st in self.seqs.items() if not st.done)

    def run(self, max_steps: Optional[int] = None) -> Dict[object, List[int]]:
        """Step until every sequence finishes; returns generated ids."""
        steps = 0
        while self.step() > 0:
            steps += 1
            if max_steps is not None and steps >= max_steps:
                break
        return self.results()

    def results(self) -> Dict[object, List[int]]:
        return {sid: list(st.out) for sid, st in self.seqs.items()
                if sid != "__pad__"}

    def retire(self, seq_id) -> List[int]:
        """Free a finished sequence's pages and return its tokens. With the
        prefix cache, the sequence's confirmed stream (prompt + generated)
        registers its full pages for reuse by later requests that share
        the prefix (the next turn of the same thread, or the next LLM
        forward of the same /chat sharing system+docs context)."""
        # flush first: surviving rows keep their current logits, and a later
        # add_request reusing this seq_id can't inherit the old carry
        self._flush_wave_state()
        st = self.seqs.pop(seq_id)
        reg = (list(st.prompt_ids) + list(st.out)
               if self.prefix_cache and st.prompt_ids else None)
        self.cache.free(seq_id, register_tokens=reg)
        return list(st.out)


# ---------------------------------------------------------------------------
# Chat-backend adapter: concurrent /chat requests share one engine
# ---------------------------------------------------------------------------

import queue
import threading

from ragmeup_tpu.pipeline.llm_backends import ChatBackend, llama3_template


class BatchedChatBackend(ChatBackend):
    """A ChatBackend whose generations run through a shared ServingEngine.

    Server threads call ``chat()`` concurrently; a single worker thread owns
    the engine and continuously batches all in-flight generations (the
    reference can only serve one generation at a time). Sampling semantics
    per request match LocalChatBackend (template, assistant-token strip).
    """

    import weakref as _weakref
    _instances: "_weakref.WeakSet" = _weakref.WeakSet()

    def __init__(self, llm, template=llama3_template,
                 assistant_token=None, seed: int = 0, wave_steps: int = 8,
                 spec_draft: int = 8, **engine_kwargs):
        self.llm = llm
        self.template = template
        self.assistant_token = assistant_token
        self.seed = seed
        # >0: decode N tokens per dispatch with the carry device-resident.
        # Default 8: the per-token path pays one dispatch + one ~26 ms
        # D2H fetch PER TOKEN on this tunnel (~12 tok/s at 8B); waves
        # amortize both. 0 keeps the stepwise path (debugging).
        self.wave_steps = wave_steps
        # >0: speculative waves (per-row 2-gram drafts verified in-batch —
        # _wave_spec_program). Greedy rows emit up to spec_draft tokens
        # per forward with byte-identical output; replaces the old
        # solo-only speculative fast path, so concurrent greedy requests
        # keep the win and the 256-token solo cap (and its head-of-line
        # blocking) is gone (round-2 verdict #1). 0 disables.
        self.spec_draft = spec_draft
        self.engine = ServingEngine(llm, **engine_kwargs)
        self._submit: "queue.Queue" = queue.Queue()
        self._next_id = 0
        self._id_lock = threading.Lock()
        # per-request latency metrics ring (TTFT = submit → first token
        # available; tok_s = generated tokens / decode span). /stats
        # surfaces p50/p95 via latency_stats() — SURVEY §5.5's "QPS/
        # latency counters are the benchmark instruments".
        from collections import deque as _dq
        self._metrics = _dq(maxlen=1024)
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()
        BatchedChatBackend._instances.add(self)

    def stop(self) -> None:
        """Stop the worker thread (idempotent). In-flight requests finish;
        queued-but-unadmitted requests are failed. Long-lived servers
        never call this; tests and scripted runs do so each backend's
        engine (device pools, jit caches) becomes collectable instead of
        being pinned by a parked worker thread for the process lifetime."""
        if self._worker.is_alive():
            self._submit.put(None)
            self._worker.join(timeout=10)

    @classmethod
    def stop_all(cls) -> None:
        for b in list(cls._instances):
            b.stop()

    def latency_stats(self) -> dict:
        """p50/p95 TTFT (ms) and per-request decode throughput (tok/s)
        over the last <=1024 completed requests."""
        import numpy as _np
        snap = list(self._metrics)
        if not snap:
            return {"completed": 0}
        ttft = _np.asarray([m["ttft_ms"] for m in snap])
        toks = _np.asarray([m["tok_s"] for m in snap if m["tok_s"] > 0])
        out = {"completed": len(snap),
               "ttft_ms_p50": round(float(_np.percentile(ttft, 50)), 1),
               "ttft_ms_p95": round(float(_np.percentile(ttft, 95)), 1)}
        if len(toks):
            out["tok_s_p50"] = round(float(_np.percentile(toks, 50)), 1)
            out["tok_s_p95"] = round(float(_np.percentile(toks, 95)), 1)
        return out

    @staticmethod
    def _fail(req, exc) -> None:
        req["error"] = exc
        req["event"].set()

    def _loop(self):
        """Worker loop. Invariants: (a) this thread never exits — every
        exception is converted into an error on the affected request(s);
        (b) a request is only admitted to the engine when the page pool can
        cover its full lifetime (see ServingEngine.can_admit), so decoding
        never dies on pool exhaustion — excess requests wait in FIFO order
        until pages free up.

        Wave/spec-wave dispatches PIPELINE one deep (wave N+1 dispatches
        before wave N's packed fetch — the engine's dispatch/collect
        split), hiding the ~26 ms D2H round-trip behind device compute.
        Membership changes (admission, a row finishing) drain the
        in-flight wave first, so host state is current when the batch
        rebuilds; completion is detected one wave later at most."""
        from collections import deque
        pending = {}          # seq_id → Event-carrying dict (in engine)
        waiting = deque()     # admitted later, FIFO
        infl = deque()        # in-flight wave entries (pipeline depth 1)

        def collect_one():
            kind, entry = infl.popleft()
            if kind == "spec":
                self.engine._spec_collect(entry)
            else:
                self.engine._wave_collect(entry)

        def drain_all():
            while infl:
                collect_one()

        while True:
            try:
                # drain new requests (block when fully idle)
                try:
                    block = not pending and not waiting and not infl
                    while True:
                        req = self._submit.get(
                            block=block, timeout=None if block else 0)
                        if req is None:       # stop() sentinel
                            drain_all()
                            for w in (list(pending.values())
                                      + list(waiting)):
                                self._fail(w, RuntimeError(
                                    "backend stopped"))
                            return
                        waiting.append(req)
                        block = False
                except queue.Empty:
                    pass
                # admission: FIFO while the pool covers the full lifetime.
                # Admissible requests are collected into ONE group whose
                # prompts prefill TOGETHER chunk-by-chunk (batched chunked
                # prefill — round-2 verdict #7: n concurrent arrivals used
                # to serialize their prefills).
                group, group_pages = [], 0
                while waiting:
                    req = waiting[0]
                    n = len(req["prompt_ids"])
                    need = self.engine._lifetime_pages(n, req["max_new"])
                    if need > self.engine.cache.num_pages - 1:  # -1: pad page
                        waiting.popleft()
                        self._fail(req, MemoryError(
                            f"request needs {need} KV pages; pool has "
                            f"{self.engine.cache.num_pages - 1}"))
                        continue
                    if not self.engine.can_admit(n, req["max_new"],
                                                 extra_reserved=group_pages):
                        break  # wait for active sequences to retire
                    waiting.popleft()
                    group.append(req)
                    group_pages += need
                if group:
                    try:
                        drain_all()  # prefill changes membership
                        self.engine.add_requests([
                            {"id": r["id"], "prompt_ids": r["prompt_ids"],
                             "max_new": r["max_new"],
                             "temperature": r["temperature"], "rp": r["rp"],
                             "seed": self.seed}
                            for r in group])
                        for r in group:
                            pending[r["id"]] = r
                    except Exception as exc:  # prefill/alloc failure
                        for r in group:
                            self.engine.cache.free(r["id"])
                            self.engine.seqs.pop(r["id"], None)
                            self._fail(r, exc)
                if not pending:
                    drain_all()
                    continue
                try:
                    # spec drafts only engage for greedy rows; a wave of
                    # purely sampled rows through the spec program pays a
                    # draft-wide chunk forward per emitted token for
                    # nothing (measured: 233 vs 389 tok/s on a batch
                    # whose greedy rows had retired — engine_8b_bench
                    # --mixed), so route all-sampled phases through plain
                    # waves. Mixed phases keep spec: greedy rows' multi-
                    # token advance outweighs the sampled rows' overhead.
                    any_greedy = any(
                        st.temperature == 0 and not st.done
                        for st in self.engine.seqs.values())
                    # the adaptive gate (ServingEngine._spec_gate) is only
                    # consulted when spec is otherwise eligible — it
                    # falls back to plain waves while measured acceptance
                    # is below break-even and re-probes periodically
                    self.engine._spec_gate_iters = self.wave_steps
                    use_spec = (self.spec_draft > 0
                                and self.engine.spec_supported
                                and any_greedy
                                and self.engine._spec_gate())
                    if self.wave_steps > 0:
                        eng = self.engine
                        imap = getattr(
                            eng, "_spec_infl" if use_spec
                            else "_infl_steps", None) or {}
                        limit = eng.max_pages_per_seq * eng.page_size
                        # a new wave can only help rows whose budget the
                        # in-flight waves don't already cover (host
                        # prediction; EOS still wastes at most one wave)
                        more = any(
                            not st.done
                            and len(st.out) + imap.get(sid, 0) < st.max_new
                            and st.pos + imap.get(sid, 0) + 1 < limit
                            for sid, st in eng.seqs.items())
                        if not more:
                            drain_all()
                        else:
                            if use_spec:
                                entry = eng._spec_dispatch(
                                    self.wave_steps, self.spec_draft,
                                    self.seed, allow_rebuild=not infl)
                                kind = "spec"
                            else:
                                entry = eng._wave_dispatch(
                                    self.wave_steps, self.seed,
                                    allow_rebuild=not infl)
                                kind = "wave"
                            if entry == "drain":
                                collect_one()
                            elif entry is None:
                                drain_all()
                            else:
                                infl.append((kind, entry))
                                if len(infl) >= 2:
                                    collect_one()
                    else:
                        self.engine.step()
                except Exception as exc:  # fail in-flight, keep serving
                    infl.clear()
                    for d in ("_infl_steps", "_spec_infl"):
                        getattr(self.engine, d, {}).clear()
                    for sid, req in list(pending.items()):
                        self._fail(req, exc)
                        try:
                            self.engine.retire(sid)
                        except Exception:
                            self.engine.cache.free(sid)
                            self.engine.seqs.pop(sid, None)
                    pending.clear()
                    continue
                import time as _time
                now = _time.perf_counter()
                for sid, req in pending.items():
                    if "t_first" not in req and self.engine.seqs[sid].out:
                        req["t_first"] = now
                done = [sid for sid in pending
                        if self.engine.seqs[sid].done]
                if done and infl:
                    # retire flushes the wave carry back into per-row
                    # state; that is only consistent when every dispatched
                    # wave has been collected (the sync-path ordering)
                    drain_all()
                    done = [sid for sid in pending
                            if self.engine.seqs[sid].done]
                for sid in done:
                    req = pending.pop(sid)
                    req["tokens"] = self.engine.retire(sid)
                    t0 = req.get("t_submit")
                    tf = req.get("t_first", now)
                    if t0 is not None:
                        span = max(now - tf, 1e-9)
                        self._metrics.append({
                            "ttft_ms": (tf - t0) * 1e3,
                            "tokens": len(req["tokens"]),
                            "tok_s": (len(req["tokens"]) / span
                                      if len(req["tokens"]) > 1 else 0.0)})
                    req["event"].set()
            except Exception as exc:  # last resort: never die silently
                for req in list(pending.values()) + list(waiting):
                    self._fail(req, exc)
                pending.clear()
                waiting.clear()

    def chat(self, messages, max_new_tokens: int = 1000,
             temperature: float = 0.2, repetition_penalty: float = 1.1) -> str:
        prompt = self.template(messages)
        ids = self.llm.tokenizer.encode(prompt)
        self.last_prompt_tokens = len(ids)  # observability (long-ctx smoke)
        with self._id_lock:
            self._next_id += 1
            sid = f"req-{self._next_id}"
        import time as _time
        req = {"id": sid, "prompt_ids": ids, "max_new": max_new_tokens,
               "temperature": temperature, "rp": repetition_penalty,
               "event": threading.Event(), "t_submit": _time.perf_counter()}
        self._submit.put(req)
        req["event"].wait()
        if "error" in req:
            raise RuntimeError(
                f"generation failed for {sid}") from req["error"]
        toks = req["tokens"]
        if hasattr(self.llm.tokenizer, "decode"):
            reply = self.llm.tokenizer.decode(toks)
        else:
            reply = " ".join(str(t) for t in toks)
        if self.assistant_token and self.assistant_token in reply:
            reply = reply.rsplit(self.assistant_token, 1)[-1]
        for stop in ("<|eot_id|>", "<|end_of_text|>"):
            if stop in reply:
                reply = reply.split(stop, 1)[0]
        return reply.strip()


# ---------------------------------------------------------------------------
# Wave decoding: N tokens per dispatch, sampling fully on device
# ---------------------------------------------------------------------------

class _WaveMixin:
    """Multi-step decode for ServingEngine. The single-step path costs one
    host↔device round-trip per token; a *wave* runs `steps` decode+sample
    iterations inside one jit (penalty/temperature/EOS on device, finished
    rows redirected to the trash page) and fetches one packed (B, steps)
    token matrix — amortizing the round-trip `steps`×.

    Semantics match LocalLLM's fused loop (full-vocab repetition penalty);
    temperature sampling uses one wave-level PRNG key rather than per-
    sequence keys. Greedy decoding is exactly equal to the single-step
    engine."""

    def wave_once(self, steps: int = 8, seed: int = 0) -> int:
        """One wave dispatch: decode up to `steps` tokens for every active
        sequence in a single device round-trip. Join-friendly — the active
        set may change between calls. Returns sequences still active.

        Steady-state dispatch cost: the wave carry (logits / seen / done /
        emitted / pos and the per-row sampling params) stays DEVICE-RESIDENT
        between calls; while the active set is unchanged, the only
        host→device transfer is ONE packed int32 page-table array and the
        only device→host transfer is the packed token matrix. Host-side
        state is rebuilt (and per-seq logits rows flushed back) only when a
        sequence joins, finishes, or rotates through `max_batch`."""
        entry = self._wave_dispatch(steps, seed, allow_rebuild=True)
        if entry is None:
            return 0
        return self._wave_collect(entry)

    def _wave_dispatch(self, steps: int, seed: int, allow_rebuild: bool):
        """Dispatch one wave without waiting for its tokens. Returns an
        in-flight entry for _wave_collect, None when nothing is active, or
        the string "drain" when the batch membership changed but rebuilding
        is not allowed yet (in-flight waves must be collected first so host
        state is current).

        Supports optimistic pipelining: a row either advances exactly
        `steps` positions or goes permanently done on device (finished rows
        write to the trash page), so page tables for wave N+1 can be built
        from host bookkeeping before wave N's tokens arrive."""
        import time as _time
        timings = getattr(self, "wave_timings", None)  # opt-in observability
        _t0 = _time.perf_counter()
        active = [(sid, st) for sid, st in self.seqs.items()
                  if not st.done][:self.max_batch]
        if not active:
            return None
        # cached on the shared llm — a fresh engine must not re-trace
        if not hasattr(self.llm, "_wave_jit"):
            self.llm._wave_jit = jax.jit(
                functools.partial(_wave_program, self.llm.model),
                static_argnames=("steps",),
                donate_argnums=(1, 3, 4, 5, 6, 13, 14))
        self._wave_jit = self.llm._wave_jit
        # B rides at the engine-wide high-water mark: shrinking to the
        # next pow2 when rows retire early would change the program shape
        # and re-trace the whole 32-layer model (measured 17 s mid-run on
        # a mixed greedy/sampled batch — engine_8b_bench --mixed). Done
        # rows ride as masked pad rows instead; decode is weight-bound,
        # so the extra rows' FLOPs are ~free. The mark is SHARED with the
        # spec path so a mid-run spec→wave handoff reuses an
        # already-compiled shape instead of minting a new one.
        B = max(_next_pow2_int(len(active)), getattr(self, "_B_hwm", 0))
        self._B_hwm = B
        V = self.llm.cfg.vocab_size
        trash = self.cache.seq_pages["__pad__"][0]
        limit = self.max_pages_per_seq * self.page_size
        mpp = self.max_pages_per_seq
        sig = (tuple(sid for sid, _ in active), B, steps)
        prev = getattr(self, "_wave_state", None)
        infl = getattr(self, "_infl_steps", None)
        if infl is None:
            infl = self._infl_steps = {}
        if (prev is None or prev["sig"] != sig) and not allow_rebuild:
            return "drain"

        # per-step (page, slot) tables + page index from HOST bookkeeping (a
        # device fetch of pos/done would add ~26ms round-trips per dispatch),
        # packed into one upload: [pages_step | slots_step | page_idx]
        tables = np.zeros((B, 2 * steps + mpp), np.int32)
        tables[:, :steps] = trash
        tables[:, 2 * steps] = trash
        for i, (sid, st) in enumerate(active):
            p0 = int(st.pos) + infl.get(sid, 0)  # optimistic when pipelined
            room = min(steps, limit - 1 - p0)
            if room > 0:
                self.cache.seq_len[sid] = p0
                self.cache.extend(sid, room)
                self.cache.seq_len[sid] = int(st.pos)  # truth kept on host
            plist = self.cache.seq_pages[sid]
            tables[i, 2 * steps:2 * steps + len(plist)] = plist
            for ss in range(steps):
                tp = p0 + ss
                if tp < limit and tp // self.page_size < len(plist):
                    tables[i, ss] = plist[tp // self.page_size]
                    tables[i, steps + ss] = tp % self.page_size

        sprev = getattr(self, "_spec_state", None)
        if prev is not None and prev["sig"] == sig:
            logits, seen, done, emitted, pos = (
                prev["logits"], prev["seen"], prev["done"], prev["emitted"],
                prev["pos"])
            temps_d, rps_d, max_new_d = (prev["temps"], prev["rps"],
                                         prev["max_new"])
        elif (sprev is not None and sprev["sig"][0] == sig[0]
                and sprev["sig"][1] == B):
            # Cross-kind carry adoption (round 5): a spec->wave switch with
            # unchanged batch membership reuses the spec carry's device
            # arrays directly (same rows, same dtypes/shapes; the spec
            # carry's extra ctx is dropped). The per-row flush/rebuild
            # detour mints tiny dynamic-slice/scatter programs whose FIRST
            # compile costs ~0.5s each through the remote compile service
            # (and is never persisted — "<1s" entries are skipped), which
            # dominated the adaptive gate's switch cost
            # (scripts/spec_gate_probe.py). Values are identical to a host
            # rebuild: kind switches happen only after a drain, so host
            # bookkeeping and the device carry agree.
            logits, seen, done, emitted, pos = (
                sprev["logits"], sprev["seen"], sprev["done"],
                sprev["emitted"], sprev["pos"])
            temps_d, rps_d, max_new_d = (sprev["temps"], sprev["rps"],
                                         sprev["max_new"])
            self._spec_state = None  # buffers are donated to the wave jit
            if prev is not None:
                self._flush_wave_state()  # stale wave carry from old rows
        else:
            self._flush_wave_state()
            logits = jnp.zeros((B, V), jnp.float32)
            seen = np.zeros((B, V), bool)
            pos = np.zeros(B, np.int32)
            emitted = np.zeros(B, np.int32)
            done = np.ones(B, bool)  # pad rows permanently done
            temps = np.zeros(B, np.float32)
            rps = np.ones(B, np.float32)
            max_new = np.zeros(B, np.int32)
            for i, (sid, st) in enumerate(active):
                if st.dev_logits is None:
                    # row last advanced by the single-step path: reconstruct
                    # from the host top-K support (matches _sample semantics
                    # for this row's next token; later tokens use true
                    # full-vocab logits)
                    full = np.full(V, -1e30, np.float32)
                    full[np.asarray(st.ids)] = st.vals
                    logits = logits.at[i].set(jnp.asarray(full))
                else:
                    logits = logits.at[i].set(st.dev_logits)
                if st.seen:
                    seen[i, np.fromiter(st.seen, dtype=np.int64)] = True
                pos[i] = st.pos
                emitted[i] = len(st.out)
                done[i] = False
                temps[i] = st.temperature
                rps[i] = st.rep_penalty
                max_new[i] = st.max_new
            seen = jnp.asarray(seen)
            done = jnp.asarray(done)
            emitted = jnp.asarray(emitted)
            pos = jnp.asarray(pos)
            temps_d = jnp.asarray(temps)
            rps_d = jnp.asarray(rps)
            max_new_d = jnp.asarray(max_new)
        if not hasattr(self, "_eos_dev"):
            self._eos_dev = jnp.asarray(
                sorted(self.llm.eos_ids) or [-1], jnp.int32)

        _t1 = _time.perf_counter()
        key = jax.random.fold_in(jax.random.PRNGKey(seed), self._wave_counter)
        self._wave_counter += 1
        out, logits, _key, seen, done, emitted, pos, k_p, v_p = \
            self._wave_jit(self.llm.params, logits, key, seen, done, emitted,
                           pos, temps_d, rps_d, max_new_d,
                           jnp.asarray(tables), jnp.int32(trash),
                           self._eos_dev,
                           self.cache.k_pages, self.cache.v_pages,
                           steps=steps)
        self.cache.k_pages = list(k_p)
        self.cache.v_pages = list(v_p)
        _t2 = _time.perf_counter()
        self._wave_state = {"sig": sig, "logits": logits, "seen": seen,
                            "done": done, "emitted": emitted, "pos": pos,
                            "temps": temps_d, "rps": rps_d,
                            "max_new": max_new_d}
        for sid, _ in active:
            infl[sid] = infl.get(sid, 0) + steps
        if timings is not None:
            timings.append({"prep": _t1 - _t0, "dispatch": _t2 - _t1})
        return {"active": active, "out": out, "steps": steps}

    def _wave_collect(self, entry) -> int:
        """Fetch one in-flight wave's token matrix and update host state.
        Returns the number of sequences still active."""
        import time as _time
        timings = getattr(self, "wave_timings", None)
        _t0 = _time.perf_counter()
        steps = entry["steps"]
        limit = self.max_pages_per_seq * self.page_size
        infl = self._infl_steps
        toks = np.asarray(entry["out"])  # ONE fetch per B*`steps` tokens
        if timings is not None:
            timings.append({"fetch": _time.perf_counter() - _t0})
        for i, (sid, st) in enumerate(entry["active"]):
            row = [int(t) for t in toks[i] if t >= 0]
            st.out.extend(row)
            st.seen.update(row)
            st.pos += len(row)
            if sid in self.seqs:  # not retired while in flight
                self.cache.seq_len[sid] = st.pos
            left = infl.get(sid, 0) - steps
            if left > 0:
                infl[sid] = left
            else:
                infl.pop(sid, None)
            st.vals = None  # host top-k snapshot is now stale (see _sample)
            if len(row) < steps or len(st.out) >= st.max_new or \
                    st.pos + 1 >= limit:
                st.done = True
        return sum(1 for _, st in self.seqs.items() if not st.done)

    def run_wave(self, steps_per_dispatch: int = 8, seed: int = 0,
                 pipeline: bool = True) -> Dict[object, List[int]]:
        """Decode all currently-active sequences to completion in waves.

        With pipeline=True (default), wave N+1 is dispatched BEFORE wave N's
        token matrix is fetched, overlapping the device→host round-trip and
        host bookkeeping with device compute. Sound because an active row
        either advances exactly `steps` positions per wave or goes
        permanently done on device; membership changes force a drain before
        the next dispatch (host state must be current to rebuild). Token
        streams are identical to the unpipelined path (the PRNG key depends
        only on the dispatch counter)."""
        limit = self.max_pages_per_seq * self.page_size
        if not pipeline:
            while self.wave_once(steps=steps_per_dispatch, seed=seed) > 0:
                pass
            return self.results()
        from collections import deque
        q: deque = deque()
        infl = getattr(self, "_infl_steps", None)
        if infl is None:
            infl = self._infl_steps = {}
        while True:
            # rows that could still emit something in a new wave (host
            # prediction; EOS is unpredictable and just wastes one wave)
            more = any(
                not st.done
                and len(st.out) + infl.get(sid, 0) < st.max_new
                and st.pos + infl.get(sid, 0) + 1 < limit
                for sid, st in self.seqs.items())
            if more:
                entry = self._wave_dispatch(steps_per_dispatch, seed,
                                            allow_rebuild=not q)
                if entry == "drain":
                    self._wave_collect(q.popleft())
                    continue
                if entry is None:
                    break
                q.append(entry)
                if len(q) >= 2:
                    self._wave_collect(q.popleft())
            elif q:
                self._wave_collect(q.popleft())
            else:
                break
        return self.results()

ServingEngine.wave_once = _WaveMixin.wave_once
ServingEngine._wave_dispatch = _WaveMixin._wave_dispatch
ServingEngine._wave_collect = _WaveMixin._wave_collect
ServingEngine.run_wave = _WaveMixin.run_wave


class _SpecWaveMixin:
    """Speculative wave decoding for ServingEngine (_wave_spec_program).

    Each dispatch runs `iters` chunk forwards of width `draft`; greedy
    rows emit up to `draft` tokens per forward via 2-gram prompt-lookup
    drafts verified in-batch, temperature rows decode one per forward.
    A row's advance per wave is data-dependent (accepted draft counts),
    but the WRITE COVER is not — run_spec(pipeline=True) dispatches wave
    N+1 against the pre-extended cover before wave N's fetch (round-3
    verdict #4); spec_wave_once stays synchronous."""

    @property
    def spec_supported(self) -> bool:
        """Batched chunk writes need the one-token-per-row page layout."""
        return self.cache.tok_per_row == 1

    def spec_wave_once(self, iters: int = 4, draft: int = 8,
                       seed: int = 0) -> int:
        """One synchronous spec wave (dispatch + collect)."""
        if not self.spec_supported:
            return self.wave_once(steps=iters, seed=seed)
        entry = self._spec_dispatch(iters, draft, seed, allow_rebuild=True)
        if entry is None:
            return 0
        return self._spec_collect(entry)

    def _spec_dispatch(self, iters: int, draft: int, seed: int,
                       allow_rebuild: bool):
        """Dispatch one spec wave without fetching its tokens.

        Pipelining (round-3 verdict #4): a spec row's advance is data-
        dependent, but the WRITE COVER is not — the host pre-extends each
        row's pages to an upper bound (current pos + outstanding in-
        flight advance + this wave's iters*draft, clamped by max_new and
        the page limit), and the device clamps writes past the cover to
        the trash page while emission stays bounded by max_new/limit on
        device. So wave N+1 can dispatch against the cover BEFORE wave
        N's tokens arrive; the device carry (pos/emitted/ctx) flows
        N→N+1 as undelivered futures. Token streams are byte-identical
        to the unpipelined path (the PRNG key depends only on the
        dispatch counter)."""
        import time as _time
        timings = getattr(self, "wave_timings", None)  # opt-in observability
        _t0 = _time.perf_counter()
        active = [(sid, st) for sid, st in self.seqs.items()
                  if not st.done][:self.max_batch]
        if not active:
            return None
        llm = self.llm
        limit = self.max_pages_per_seq * self.page_size
        ps = self.page_size
        key_tup = (iters, draft, ps, limit)
        jits = getattr(llm, "_spec_wave_jits", None)
        if jits is None:
            jits = llm._spec_wave_jits = {}
        fn = jits.get(key_tup)
        if fn is None:
            fn = jax.jit(
                functools.partial(_wave_spec_program, llm.model),
                static_argnames=("iters", "draft", "page_size", "limit"),
                donate_argnums=(1, 3, 4, 5, 6, 7, 15, 16))
            jits[key_tup] = fn
        # engine-wide high-water-mark B — same shrink-retrace guard (and
        # shape sharing) as _wave_dispatch
        B = max(_next_pow2_int(len(active)), getattr(self, "_B_hwm", 0))
        self._B_hwm = B
        V = llm.cfg.vocab_size
        T = limit
        trash = self.cache.seq_pages["__pad__"][0]
        mpp = self.max_pages_per_seq
        sig = (tuple(sid for sid, _ in active), B, iters, draft)
        prev = getattr(self, "_spec_state", None)
        infl = getattr(self, "_spec_infl", None)
        if infl is None:
            infl = self._spec_infl = {}
        if (prev is None or prev["sig"] != sig) and not allow_rebuild:
            return "drain"

        # pre-extend page allocations to cover the wave's max advance —
        # including any in-flight waves' outstanding advance when
        # pipelined — then build the page-index table from the grown lists
        page_idx = np.zeros((B, mpp), np.int32)
        page_idx[:, 0] = trash
        cover = np.zeros(B, np.int32)
        for i, (sid, st) in enumerate(active):
            room = min(infl.get(sid, 0) + iters * draft,
                       limit - 1 - int(st.pos),
                       st.max_new - len(st.out))
            if room > 0:
                self.cache.extend(sid, room)
                self.cache.seq_len[sid] = int(st.pos)  # truth stays host
            cover[i] = int(st.pos) + max(room, 0)
            plist = self.cache.seq_pages[sid]
            page_idx[i, :len(plist)] = plist

        wprev = getattr(self, "_wave_state", None)
        if prev is not None and prev["sig"] == sig:
            logits, seen, done, emitted, pos, ctx = (
                prev["logits"], prev["seen"], prev["done"], prev["emitted"],
                prev["pos"], prev["ctx"])
            temps_d, rps_d, max_new_d = (prev["temps"], prev["rps"],
                                         prev["max_new"])
        elif (wprev is not None and wprev["sig"][0] == sig[0]
                and wprev["sig"][1] == B):
            # Cross-kind carry adoption, wave->spec direction (re-probes):
            # reuse the wave carry's device arrays; only ctx (the confirmed
            # token stream the 2-gram drafter reads) must be rebuilt, and
            # it is host-known (prompt + collected out), so this is one
            # plain upload — no per-row slice/scatter programs to compile
            # (see _wave_dispatch's adoption note).
            logits, seen, done, emitted, pos = (
                wprev["logits"], wprev["seen"], wprev["done"],
                wprev["emitted"], wprev["pos"])
            temps_d, rps_d, max_new_d = (wprev["temps"], wprev["rps"],
                                         wprev["max_new"])
            ctx_h = np.full((B, T), -1, np.int32)
            for i, (sid, st) in enumerate(active):
                confirmed = (list(st.prompt_ids) + list(st.out))[:T]
                ctx_h[i, :len(confirmed)] = confirmed
            ctx = jnp.asarray(ctx_h)
            self._wave_state = None  # buffers are donated to the spec jit
            if prev is not None:
                self._flush_wave_state()  # stale spec carry from old rows
        else:
            self._flush_wave_state()
            logits = jnp.zeros((B, V), jnp.float32)
            seen = np.zeros((B, V), bool)
            ctx_h = np.full((B, T), -1, np.int32)
            pos = np.zeros(B, np.int32)
            emitted = np.zeros(B, np.int32)
            done = np.ones(B, bool)
            temps = np.zeros(B, np.float32)
            rps = np.ones(B, np.float32)
            max_new = np.zeros(B, np.int32)
            for i, (sid, st) in enumerate(active):
                if st.dev_logits is None:
                    full = np.full(V, -1e30, np.float32)
                    full[np.asarray(st.ids)] = st.vals
                    logits = logits.at[i].set(jnp.asarray(full))
                else:
                    logits = logits.at[i].set(st.dev_logits)
                if st.seen:
                    seen[i, np.fromiter(st.seen, dtype=np.int64)] = True
                confirmed = (list(st.prompt_ids) + list(st.out))[:T]
                ctx_h[i, :len(confirmed)] = confirmed
                pos[i] = st.pos
                emitted[i] = len(st.out)
                done[i] = False
                temps[i] = st.temperature
                rps[i] = st.rep_penalty
                max_new[i] = st.max_new
            seen = jnp.asarray(seen)
            done = jnp.asarray(done)
            emitted = jnp.asarray(emitted)
            pos = jnp.asarray(pos)
            ctx = jnp.asarray(ctx_h)
            temps_d = jnp.asarray(temps)
            rps_d = jnp.asarray(rps)
            max_new_d = jnp.asarray(max_new)
        if not hasattr(self, "_eos_dev"):
            self._eos_dev = jnp.asarray(
                sorted(self.llm.eos_ids) or [-1], jnp.int32)
        key = jax.random.fold_in(jax.random.PRNGKey(seed), self._wave_counter)
        self._wave_counter += 1
        (packed, logits, _key, seen, done_d, emitted, pos_d, ctx,
         k_p, v_p) = fn(
            llm.params, logits, key, seen, done, emitted, pos, ctx,
            temps_d, rps_d, max_new_d, jnp.asarray(cover),
            jnp.asarray(page_idx), jnp.int32(trash), self._eos_dev,
            self.cache.k_pages, self.cache.v_pages,
            iters=iters, draft=draft, page_size=ps, limit=limit)
        self.cache.k_pages = list(k_p)
        self.cache.v_pages = list(v_p)
        self._spec_state = {"sig": sig, "logits": logits, "seen": seen,
                            "done": done_d, "emitted": emitted, "pos": pos_d,
                            "ctx": ctx, "temps": temps_d, "rps": rps_d,
                            "max_new": max_new_d}
        for sid, _ in active:
            infl[sid] = infl.get(sid, 0) + iters * draft
        if timings is not None:
            timings.append({"prep+dispatch": _time.perf_counter() - _t0})
        return {"active": active, "packed": packed, "iters": iters,
                "draft": draft}

    def _spec_collect(self, entry) -> int:
        """Fetch one in-flight spec wave's packed [tokens | pos | done]
        and update host state. Returns sequences still active."""
        import time as _time
        timings = getattr(self, "wave_timings", None)
        _t0 = _time.perf_counter()
        iters, draft = entry["iters"], entry["draft"]
        infl = self._spec_infl
        host = np.asarray(entry["packed"])  # ONE fetch per wave
        if timings is not None:
            timings.append({"fetch": _time.perf_counter() - _t0})
        acc_toks = acc_fwds = 0
        for i, (sid, st) in enumerate(entry["active"]):
            row = [int(t) for t in host[i, :iters * draft] if t >= 0]
            st.out.extend(row)
            st.seen.update(row)
            st.pos = int(host[i, iters * draft])
            if sid in self.seqs:
                self.cache.seq_len[sid] = st.pos
            left = infl.get(sid, 0) - iters * draft
            if left > 0:
                infl[sid] = left
            else:
                infl.pop(sid, None)
            st.vals = None
            st.dev_logits = None  # carried in _spec_state until flushed
            if host[i, iters * draft + 1]:
                st.done = True
            elif st.temperature == 0:
                # acceptance sample for the adaptive gate: greedy rows that
                # ran the full wave (rows that finished mid-wave emitted
                # fewer tokens for max_new/eos reasons, not rejection)
                acc_toks += len(row)
                acc_fwds += iters
        if acc_fwds:
            a = acc_toks / acc_fwds
            prev = self._spec_accept
            self._spec_accept = a if prev is None else 0.5 * prev + 0.5 * a
            self._spec_waves += 1
        return sum(1 for _, st in self.seqs.items() if not st.done)

    def _spec_track_reset(self) -> None:
        """Newly admitted prompts re-earn speculation: acceptance is a
        property of the text being decoded, so a fresh arrival resets the
        EWMA and puts the gate back in spec mode."""
        self._spec_accept = None
        self._spec_waves = 0
        self._spec_mode = "spec"
        self._spec_probe_left = 0

    def _spec_gate(self) -> bool:
        """Adaptive spec decision — call ONCE per wave-dispatch decision.

        Returns True to dispatch a spec wave, False to dispatch a plain
        wave. In spec mode, drops to plain once >=2 waves averaged below
        `spec_accept_floor` emitted tokens/forward (the measured draft-8
        break-even is ~1.24x at 8B batch-8; see __init__). In plain mode,
        counts down `spec_reprobe_every` decisions then re-probes spec
        with a fresh EWMA. Greedy outputs are byte-identical either way
        up to argmax near-ties at cross-kernel noise scale (~one bf16 ulp
        of the logits between the chunk and s=1 forwards — see the parity
        contract in _wave_spec_program); only throughput changes."""
        if self.spec_accept_floor <= 0:
            return True
        if getattr(self, "_spec_mode", "spec") == "spec":
            if (self._spec_accept is not None and self._spec_waves >= 2
                    and self._spec_accept < self.spec_accept_floor):
                self._spec_mode = "plain"
                self._spec_probe_left = self.spec_reprobe_every
                return False
            return True
        self._spec_probe_left -= 1
        if self._spec_probe_left <= 0:
            # tail guard: a re-probe costs >=2 spec waves at the (low)
            # acceptance that demoted us — only worth it if some greedy
            # row still has enough tokens left for a recovered acceptance
            # to pay that back
            it = getattr(self, "_spec_gate_iters", 0)
            if it and not any(
                    not st.done and st.temperature == 0
                    and st.max_new - len(st.out) >= 4 * it
                    for st in self.seqs.values()):
                self._spec_probe_left = self.spec_reprobe_every
                return False
            self._spec_track_reset()
            return True
        return False

    def run_spec(self, iters: int = 4, draft: int = 8, seed: int = 0,
                 pipeline: bool = True) -> Dict[object, List[int]]:
        """Decode all active sequences to completion in spec waves.

        With pipeline=True, wave N+1 dispatches against the pre-extended
        page cover BEFORE wave N's packed fetch (see _spec_dispatch) —
        the ~26 ms D2H round-trip and host bookkeeping overlap device
        compute exactly like run_wave's plain-wave pipeline. The host
        predicts liveness optimistically (a row that went done on device
        wastes at most the in-flight wave); membership changes force a
        drain. Byte-identical outputs."""
        def any_greedy():
            # spec drafts only engage for greedy rows — an all-sampled
            # phase through the spec program pays a draft-wide chunk
            # forward per emitted token for nothing (measured 233 vs 389
            # tok/s), so hand the remainder to plain waves
            return any(st.temperature == 0 and not st.done
                       for st in self.seqs.values())

        if not self.spec_supported:
            while self.spec_wave_once(iters=iters, draft=draft,
                                      seed=seed) > 0:
                pass
            return self.results()
        # Unified tagged-kind loop: each iteration picks spec vs plain per
        # the current phase (greedy rows present?) AND the adaptive gate
        # (_spec_gate: measured acceptance vs break-even, with periodic
        # re-probes). Kind switches are state-safe — the other program's
        # dispatch flushes the stale carry and rebuilds from host state,
        # and "drain" forces in-flight collects first.
        from collections import deque
        self._spec_gate_iters = iters  # for the gate's re-probe tail guard
        q: deque = deque()
        sinfl = getattr(self, "_spec_infl", None)
        if sinfl is None:
            sinfl = self._spec_infl = {}
        winfl = getattr(self, "_infl_steps", None)
        if winfl is None:
            winfl = self._infl_steps = {}
        limit = self.max_pages_per_seq * self.page_size
        depth = 2 if pipeline else 1

        def collect_one():
            kind, entry = q.popleft()
            if kind == "spec":
                self._spec_collect(entry)
            else:
                self._wave_collect(entry)

        while True:
            use_spec = any_greedy() and self._spec_gate()
            imap = sinfl if use_spec else winfl
            more = any(
                not st.done
                and len(st.out) + imap.get(sid, 0) < st.max_new
                and st.pos + imap.get(sid, 0) + 1 < limit
                for sid, st in self.seqs.items())
            if more:
                if use_spec:
                    entry = self._spec_dispatch(iters, draft, seed,
                                                allow_rebuild=not q)
                    kind = "spec"
                else:
                    entry = self._wave_dispatch(iters, seed,
                                                allow_rebuild=not q)
                    kind = "wave"
                if entry == "drain":
                    collect_one()
                    continue
                if entry is None:
                    break
                q.append((kind, entry))
                if len(q) >= depth:
                    collect_one()
            elif q:
                collect_one()
            else:
                break
        return self.results()


ServingEngine.spec_supported = _SpecWaveMixin.spec_supported
ServingEngine.spec_wave_once = _SpecWaveMixin.spec_wave_once
ServingEngine._spec_dispatch = _SpecWaveMixin._spec_dispatch
ServingEngine._spec_collect = _SpecWaveMixin._spec_collect
ServingEngine._spec_track_reset = _SpecWaveMixin._spec_track_reset
ServingEngine._spec_gate = _SpecWaveMixin._spec_gate
ServingEngine.run_spec = _SpecWaveMixin.run_spec
