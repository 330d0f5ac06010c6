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

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ragmeup_tpu.models.decoder import LocalLLM, _next_pow2_int
from ragmeup_tpu.ops.paged_attention import PagedKVCache


class _SeqState:
    __slots__ = ("prompt_len", "pos", "out", "vals", "ids", "key", "seen",
                 "max_new", "temperature", "rep_penalty", "done",
                 "dev_logits")

    def __init__(self, prompt_len, vals, ids, key, seen, max_new,
                 temperature, rep_penalty):
        self.prompt_len = prompt_len
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
                 max_batch: int = 16, topk_support: int = 64):
        self.llm = llm
        cfg = llm.cfg
        self.page_size = page_size
        # sampling happens within the device-computed top-K support (top-k
        # sampling; greedy is exact since the argmax is always in support)
        self.topk_support = min(topk_support, cfg.vocab_size)
        self.max_pages_per_seq = max_pages_per_seq
        self.max_batch = max_batch
        self.cache = PagedKVCache(num_pages, page_size, cfg.num_kv_heads,
                                  cfg.head_dim, cfg.num_layers,
                                  dtype=cfg.jdtype)
        # reserved trash page: batch-padding rows write here harmlessly
        self.cache.allocate("__pad__", 1)
        self._wave_counter = 0
        self.seqs: Dict[object, _SeqState] = {}
        self._decode = jax.jit(self._decode_impl, donate_argnums=(2, 3))

    # -- jitted batched paged decode ------------------------------------------

    def _decode_impl(self, params, meta, k_pages, v_pages):
        """meta: one packed (B, mp+5) int32 array — a single host->device
        transfer per step (each extra device_put costs a tunnel roundtrip):
        columns [token, position, page, slot, length, page_idx...]."""
        tokens = meta[:, 0]
        positions = meta[:, 1]
        pages = meta[:, 2]
        slots = meta[:, 3]
        lengths = meta[:, 4]
        page_idx = meta[:, 5:]
        out = self.llm.model.apply(
            {"params": params}, tokens[:, None], positions=positions[:, None],
            paged_caches=list(zip(k_pages, v_pages)),
            paged_meta=(page_idx, lengths, pages, slots))
        new_k = [kp for kp, _ in out["paged_caches"]]
        new_v = [vp for _, vp in out["paged_caches"]]
        # ship only the top-K support to host, packed into ONE array (the
        # device->host path has high per-fetch latency)
        vals, ids = jax.lax.top_k(out["logits"][:, 0], self.topk_support)
        from ragmeup_tpu.ops.topk import pack_scores_ids
        return pack_scores_ids(vals, ids), new_k, new_v

    # -- request lifecycle -------------------------------------------------------

    def add_request(self, seq_id, prompt_ids: Sequence[int],
                    max_new_tokens: int = 100, temperature: float = 0.2,
                    repetition_penalty: float = 1.1, seed: int = 0) -> None:
        """Prefill the prompt, move its K/V into the page pool, queue for
        decoding."""
        if seq_id in self.seqs:
            raise ValueError(f"duplicate seq_id {seq_id}")
        llm = self.llm
        max_prompt = self.max_pages_per_seq * self.page_size - max_new_tokens
        prompt_ids = list(prompt_ids)[-max(max_prompt, 8):]
        n = len(prompt_ids)
        L = llm._bucket(n)
        padded = np.zeros((1, L), np.int32)
        padded[0, :n] = prompt_ids
        logits, caches = llm._prefill(llm.params, jnp.asarray(padded),
                                      jnp.int32(n), cache_len=L)
        self.cache.allocate(seq_id, n)
        for layer, (ck, cv) in enumerate(caches):
            self.cache.write_prompt(layer, seq_id, ck[0, :n], cv[0, :n])
        seen = set(int(t) for t in prompt_ids)
        vals, ids = jax.lax.top_k(logits, self.topk_support)
        st = _SeqState(
            n, np.array(vals, np.float32), np.array(ids),
            jax.random.PRNGKey(seed), seen,
            max_new_tokens, temperature, repetition_penalty)
        st.dev_logits = logits  # stays on device (wave mode)
        self.seqs[seq_id] = st

    def _sample(self, st: _SeqState) -> int:
        """Sample within the top-K support (penalty + temperature)."""
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

    def step(self) -> int:
        """Sample one token for every active sequence, run one batched paged
        decode step. Returns the number of sequences still active."""
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
        """Free a finished sequence's pages and return its tokens."""
        st = self.seqs.pop(seq_id)
        self.cache.free(seq_id)
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

    def __init__(self, llm, template=llama3_template,
                 assistant_token=None, seed: int = 0, wave_steps: int = 0,
                 **engine_kwargs):
        self.llm = llm
        self.template = template
        self.assistant_token = assistant_token
        self.seed = seed
        self.wave_steps = wave_steps  # >0: decode in waves of N tokens
        self.engine = ServingEngine(llm, **engine_kwargs)
        self._submit: "queue.Queue" = queue.Queue()
        self._next_id = 0
        self._id_lock = threading.Lock()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def _loop(self):
        pending = {}  # seq_id → Event-carrying dict
        while True:
            # drain new requests (block when idle)
            try:
                block = not pending
                while True:
                    req = self._submit.get(block=block, timeout=None if block else 0)
                    self.engine.add_request(req["id"], req["prompt_ids"],
                                            max_new_tokens=req["max_new"],
                                            temperature=req["temperature"],
                                            repetition_penalty=req["rp"],
                                            seed=self.seed)
                    pending[req["id"]] = req
                    block = False
            except queue.Empty:
                pass
            if not pending:
                continue
            if self.wave_steps > 0:
                self.engine.wave_once(steps=self.wave_steps, seed=self.seed)
            else:
                self.engine.step()
            done = [sid for sid in pending
                    if self.engine.seqs[sid].done]
            for sid in done:
                req = pending.pop(sid)
                req["tokens"] = self.engine.retire(sid)
                req["event"].set()

    def chat(self, messages, max_new_tokens: int = 1000,
             temperature: float = 0.2, repetition_penalty: float = 1.1) -> str:
        prompt = self.template(messages)
        ids = self.llm.tokenizer.encode(prompt)
        with self._id_lock:
            self._next_id += 1
            sid = f"req-{self._next_id}"
        req = {"id": sid, "prompt_ids": ids, "max_new": max_new_tokens,
               "temperature": temperature, "rp": repetition_penalty,
               "event": threading.Event()}
        self._submit.put(req)
        req["event"].wait()
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

    def _wave_impl(self, params, logits0, key0, seen0, done0, emitted0, pos0,
                   temps, rps, max_new, pages_step, slots_step, page_idx,
                   trash_page, eos_arr, k_pages, v_pages, *, steps: int):
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
            mout = self.llm.model.apply(
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

    def wave_once(self, steps: int = 8, seed: int = 0) -> int:
        """One wave dispatch: decode up to `steps` tokens for every active
        sequence in a single device round-trip. Join-friendly — the active
        set may change between calls. Returns sequences still active."""
        active = [(sid, st) for sid, st in self.seqs.items()
                  if not st.done][:self.max_batch]
        if not active:
            return 0
        if not hasattr(self, "_wave_jit"):
            self._wave_jit = jax.jit(self._wave_impl,
                                     static_argnames=("steps",),
                                     donate_argnums=(15, 16))
        B = _next_pow2_int(len(active))
        V = self.llm.cfg.vocab_size
        trash = self.cache.seq_pages["__pad__"][0]
        eos = sorted(self.llm.eos_ids) or [-1]
        limit = self.max_pages_per_seq * self.page_size

        logits = jnp.zeros((B, V), jnp.float32)
        seen = np.zeros((B, V), bool)
        pos = np.zeros(B, np.int32)
        emitted = np.zeros(B, np.int32)
        done = np.ones(B, bool)  # pad rows permanently done
        temps = np.zeros(B, np.float32)
        rps = np.ones(B, np.float32)
        max_new = np.zeros(B, np.int32)
        pages_step = np.full((B, steps), trash, np.int32)
        slots_step = np.zeros((B, steps), np.int32)
        page_idx = np.zeros((B, self.max_pages_per_seq), np.int32)
        page_idx[:, 0] = trash
        for i, (sid, st) in enumerate(active):
            logits = logits.at[i].set(st.dev_logits)
            if st.seen:
                seen[i, np.fromiter(st.seen, dtype=np.int64)] = True
            pos[i] = st.pos
            emitted[i] = len(st.out)
            done[i] = False
            temps[i] = st.temperature
            rps[i] = st.rep_penalty
            max_new[i] = st.max_new
            # pre-reserve pages + per-step (page, slot) tables from HOST
            # bookkeeping (a device fetch of pos/done would add ~26ms
            # round-trips per dispatch in this environment)
            p0 = int(st.pos)
            room = min(steps, limit - 1 - p0)
            if room > 0:
                self.cache.extend(sid, room)
                self.cache.seq_len[sid] = p0  # trimmed after the wave
            plist = self.cache.seq_pages[sid]
            page_idx[i, :len(plist)] = plist
            for ss in range(steps):
                tp = p0 + ss
                if tp < limit and tp // self.page_size < len(plist):
                    pages_step[i, ss] = plist[tp // self.page_size]
                    slots_step[i, ss] = tp % self.page_size

        key = jax.random.fold_in(jax.random.PRNGKey(seed), self._wave_counter)
        self._wave_counter += 1
        out, logits, _key, _seen, _done, _emitted, _pos, k_p, v_p = \
            self._wave_jit(self.llm.params, logits, key, jnp.asarray(seen),
                           jnp.asarray(done), jnp.asarray(emitted),
                           jnp.asarray(pos), jnp.asarray(temps),
                           jnp.asarray(rps), jnp.asarray(max_new),
                           jnp.asarray(pages_step), jnp.asarray(slots_step),
                           jnp.asarray(page_idx), jnp.int32(trash),
                           jnp.asarray(eos, jnp.int32),
                           self.cache.k_pages, self.cache.v_pages,
                           steps=steps)
        self.cache.k_pages = list(k_p)
        self.cache.v_pages = list(v_p)
        toks = np.asarray(out)  # ONE fetch per `steps` tokens
        for i, (sid, st) in enumerate(active):
            row = [int(t) for t in toks[i] if t >= 0]
            st.out.extend(row)
            st.seen.update(row)
            st.pos += len(row)
            self.cache.seq_len[sid] = st.pos
            st.dev_logits = logits[i]  # stays on device
            if len(row) < steps or len(st.out) >= st.max_new or \
                    st.pos + 1 >= limit:
                st.done = True
        return sum(1 for _, st in self.seqs.items() if not st.done)

    def run_wave(self, steps_per_dispatch: int = 8,
                 seed: int = 0) -> Dict[object, List[int]]:
        """Decode all currently-active sequences to completion in waves."""
        while self.wave_once(steps=steps_per_dispatch, seed=seed) > 0:
            pass
        return self.results()

ServingEngine._wave_impl = _WaveMixin._wave_impl
ServingEngine.wave_once = _WaveMixin.wave_once
ServingEngine.run_wave = _WaveMixin.run_wave
