"""BM25 sparse index with device scoring.

The TPU-native replacement for both of the reference's sparse paths
(SURVEY.md §2.3): the in-memory Okapi BM25 used on the Milvus path
(``RAGHelper.py:436-443``) and ParadeDB pg_search / Tantivy behind
``PostgresBM25Retriever`` (``PostgresBM25Retriever.py:84-107``). One
implementation serves both reference modes.

Design (SURVEY.md §7 hard part #3 — BM25 on a dense-matrix machine):

- **Host**: analyzer (lowercase alphanumeric tokens, Tantivy-style) builds
  CSR postings — per-term arrays of (doc row, tf). Incremental adds append
  to per-term buffers; a lazy *flush* materializes the flat device arrays
  (better than the reference, which rebuilds the whole in-memory BM25 on
  every upload — ``RAGHelper.py:530-531``).
- **Device** (one jit, shapes bucketed): the query's terms' postings are
  concatenated and padded to a power-of-two bucket; per-posting Okapi
  contributions are computed with a gather of the per-doc length norm,
  scatter-added into a (num_queries, capacity) score plane, masked
  (tombstones ride the same additive mask as the dense index), and
  top-k'd. Capacity is padded so CRUD never recompiles.

Scoring is exact Okapi BM25 (``rank_bm25`` semantics, including its
+1-inside-log idf variant): verified against ``bm25_oracle`` in tests.
"""

from __future__ import annotations

import functools
import json
import os
import re
from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ragmeup_tpu.ops.topk import NEG_INF

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def analyze(text: str) -> List[str]:
    """Default analyzer: lowercase, split on non-alphanumeric (Tantivy's
    default 'simple' tokenizer behavior)."""
    return _TOKEN_RE.findall(text.lower())


def sanitize_query(query: str, re2_prompt: Optional[str] = None) -> str:
    """Query cleanup parity with PostgresBM25Retriever._get_relevant_documents
    (PostgresBM25Retriever.py:84-102): drop the Re2 suffix ("Read the
    question again: <query>") if present, and strip ():' characters —
    but without the injection-prone f-string SQL (quirk not reproduced)."""
    if re2_prompt:
        pos = query.find(re2_prompt)
        if pos >= 0:
            query = query[:pos]
    return query.translate(str.maketrans("", "", "():'"))


def _next_pow2(x: int) -> int:
    n = 1
    while n < x:
        n *= 2
    return n


@functools.partial(jax.jit, static_argnames=("k", "k1", "b", "nq", "cap"))
def _bm25_score_topk(docs_cat, tf_cat, idf_cat, qid_cat, doc_len, mask,
                     avgdl, k: int, k1: float, b: float, nq: int, cap: int):
    """docs_cat/tf_cat/idf_cat/qid_cat: (L,) padded posting stream
    (padding rows point at slot `cap` with idf 0). doc_len (cap,),
    mask (cap,) additive. Returns (scores (nq,k), rows (nq,k))."""
    norm = k1 * (1.0 - b + b * doc_len / jnp.maximum(avgdl, 1e-9))  # (cap,)
    padded_norm = jnp.concatenate([norm, jnp.ones((1,), norm.dtype)])
    nrm = padded_norm[docs_cat]  # gather
    contrib = idf_cat * tf_cat * (k1 + 1.0) / (tf_cat + nrm)
    flat = jnp.zeros((nq * (cap + 1),), jnp.float32)
    flat = flat.at[qid_cat * (cap + 1) + docs_cat].add(contrib)
    scores = flat.reshape(nq, cap + 1)[:, :cap] + mask[None, :]
    return jax.lax.top_k(scores, k)


class BM25Index:
    """Okapi BM25 index: host CSR postings, device scoring."""

    def __init__(self, k1: float = 1.5, b: float = 0.75, tile_n: int = 1024):
        self.k1 = k1
        self.b = b
        self.tile_n = tile_n
        self.vocab: Dict[str, int] = {}
        # per-term postings buffers: lists of (row, tf)
        self._postings: List[List[Tuple[int, int]]] = []
        self._doc_len: List[int] = []
        self.dead: set = set()
        self.n = 0
        self._device: Optional[dict] = None  # flushed device state

    # -- build -----------------------------------------------------------------

    def add(self, texts: Sequence[str]) -> List[int]:
        """Tokenize and append documents; returns their row ids."""
        rows = []
        for text in texts:
            row = self.n
            toks = analyze(text)
            self._doc_len.append(len(toks))
            for term, tf in Counter(toks).items():
                tid = self.vocab.get(term)
                if tid is None:
                    tid = len(self.vocab)
                    self.vocab[term] = tid
                    self._postings.append([])
                self._postings[tid].append((row, tf))
            self.n += 1
            rows.append(row)
        self._device = None  # lazy re-flush
        return rows

    def delete_rows(self, rows: Sequence[int]) -> None:
        changed = False
        for r in rows:
            r = int(r)
            if 0 <= r < self.n and r not in self.dead:
                self.dead.add(r)
                changed = True
        if changed and self._device is not None:
            # tombstones only touch the mask + idf; cheap partial re-flush
            self._refresh_stats()

    @property
    def live_count(self) -> int:
        return self.n - len(self.dead)

    # -- flush -------------------------------------------------------------------

    def _capacity(self) -> int:
        cap = self.tile_n
        while cap < max(self.n, 1):
            cap *= 2
        return cap

    def _refresh_stats(self) -> None:
        """Recompute idf (depends on live df) and the tombstone mask."""
        dev = self._device
        if dev is None:
            return
        cap = dev["cap"]
        n_live = max(self.live_count, 1)
        df = np.zeros(len(self.vocab), np.float64)
        for tid, plist in enumerate(self._postings):
            df[tid] = sum(1 for (r, _) in plist if r not in self.dead)
        # rank_bm25 Okapi idf: ln((N - df + 0.5)/(df + 0.5) + 1)
        idf = np.log((n_live - df + 0.5) / (df + 0.5) + 1.0)
        dev["idf"] = idf.astype(np.float32)
        mask = np.full(cap, NEG_INF, np.float32)
        live = [r for r in range(self.n) if r not in self.dead]
        mask[live] = 0.0
        dev["mask"] = jnp.asarray(mask)
        dl = np.asarray(self._doc_len, np.float32)
        live_dl = dl[live] if live else np.zeros(1, np.float32)
        dev["avgdl"] = float(live_dl.mean()) if len(live_dl) else 1.0

    def _flush(self) -> dict:
        if self._device is not None:
            return self._device
        cap = self._capacity()
        offsets = np.zeros(len(self.vocab) + 1, np.int64)
        for tid, plist in enumerate(self._postings):
            offsets[tid + 1] = offsets[tid] + len(plist)
        total = int(offsets[-1])
        pdoc = np.zeros(total, np.int32)
        ptf = np.zeros(total, np.float32)
        for tid, plist in enumerate(self._postings):
            o = offsets[tid]
            for j, (r, tf) in enumerate(plist):
                pdoc[o + j] = r
                ptf[o + j] = tf
        doc_len = np.zeros(cap, np.float32)
        doc_len[:self.n] = self._doc_len
        self._device = {
            "cap": cap,
            "offsets": offsets,
            "pdoc": pdoc,
            "ptf": ptf,
            "doc_len": jnp.asarray(doc_len),
        }
        self._refresh_stats()
        return self._device

    # -- query --------------------------------------------------------------------

    def search(self, queries: Sequence[str], k: int,
               re2_prompt: Optional[str] = None) -> List[List[Tuple[int, float]]]:
        """BM25 top-k for each query string. Returns per-query lists of
        (row, score) with score > 0, desc."""
        if self.n == 0 or self.live_count == 0:
            return [[] for _ in queries]
        dev = self._flush()
        cap = dev["cap"]
        nq = len(queries)
        k = min(k, self.live_count)
        # build the concatenated posting stream on host (tiny: query terms only)
        doc_l, tf_l, idf_l, qid_l = [], [], [], []
        for qi, qtext in enumerate(queries):
            terms = analyze(sanitize_query(qtext, re2_prompt))
            for term in set(terms):
                tid = self.vocab.get(term)
                if tid is None:
                    continue
                lo, hi = dev["offsets"][tid], dev["offsets"][tid + 1]
                doc_l.append(dev["pdoc"][lo:hi])
                tf_l.append(dev["ptf"][lo:hi])
                idf_l.append(np.full(hi - lo, dev["idf"][tid], np.float32))
                qid_l.append(np.full(hi - lo, qi, np.int32))
        if not doc_l:
            return [[] for _ in queries]
        docs_cat = np.concatenate(doc_l)
        L = _next_pow2(max(len(docs_cat), 1))
        pad = L - len(docs_cat)
        docs_cat = np.concatenate([docs_cat, np.full(pad, cap, np.int32)])
        tf_cat = np.concatenate(tf_l + [np.zeros(pad, np.float32)])
        idf_cat = np.concatenate(idf_l + [np.zeros(pad, np.float32)])
        qid_cat = np.concatenate(qid_l + [np.zeros(pad, np.int32)])
        s, idx = _bm25_score_topk(
            jnp.asarray(docs_cat), jnp.asarray(tf_cat), jnp.asarray(idf_cat),
            jnp.asarray(qid_cat), dev["doc_len"], dev["mask"],
            jnp.float32(dev["avgdl"]), k=k, k1=self.k1, b=self.b,
            nq=nq, cap=cap)
        s = np.asarray(s)
        idx = np.asarray(idx)
        out: List[List[Tuple[int, float]]] = []
        for r in range(nq):
            out.append([(int(i), float(v)) for i, v in zip(idx[r], s[r])
                        if v > 0.0])
        return out

    # -- persistence ------------------------------------------------------------------

    def save(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        dev = self._flush()
        np.savez(os.path.join(directory, "bm25_postings.npz"),
                 offsets=dev["offsets"], pdoc=dev["pdoc"], ptf=dev["ptf"],
                 doc_len=np.asarray(self._doc_len, np.int32))
        meta = {"k1": self.k1, "b": self.b, "tile_n": self.tile_n, "n": self.n,
                "dead": sorted(self.dead),
                "vocab": list(self.vocab.keys())}
        with open(os.path.join(directory, "bm25_meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, directory: str) -> "BM25Index":
        with open(os.path.join(directory, "bm25_meta.json")) as f:
            meta = json.load(f)
        idx = cls(meta["k1"], meta["b"], meta["tile_n"])
        data = np.load(os.path.join(directory, "bm25_postings.npz"))
        idx.vocab = {t: i for i, t in enumerate(meta["vocab"])}
        offsets = data["offsets"]
        idx._postings = [
            [(int(r), int(tf)) for r, tf in zip(data["pdoc"][offsets[t]:offsets[t + 1]],
                                                data["ptf"][offsets[t]:offsets[t + 1]])]
            for t in range(len(idx.vocab))
        ]
        idx._doc_len = data["doc_len"].astype(int).tolist()
        idx.n = meta["n"]
        idx.dead = set(meta.get("dead", []))
        return idx

    @classmethod
    def exists(cls, directory: str) -> bool:
        return os.path.exists(os.path.join(directory, "bm25_meta.json"))


# ---------------------------------------------------------------------------
# NumPy oracle (rank_bm25 Okapi semantics) for tests — SURVEY.md §4.
# ---------------------------------------------------------------------------

def bm25_oracle(corpus_texts: Sequence[str], query: str, k1: float = 1.5,
                b: float = 0.75, dead_rows=()) -> np.ndarray:
    """Exact Okapi BM25 scores of `query` against every live document."""
    docs = [analyze(t) for t in corpus_texts]
    live = [i for i in range(len(docs)) if i not in set(dead_rows)]
    n = len(live)
    dl = np.array([len(docs[i]) for i in live], np.float64)
    avgdl = dl.mean() if n else 1.0
    qterms = set(analyze(query))
    scores = np.zeros(len(docs), np.float64)
    for term in qterms:
        df = sum(1 for i in live if term in docs[i])
        if df == 0:
            continue
        idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for pos, i in enumerate(live):
            tf = docs[i].count(term)
            if tf:
                denom = tf + k1 * (1 - b + b * dl[pos] / avgdl)
                scores[i] += idf * tf * (k1 + 1) / denom
    scores[list(dead_rows)] = -np.inf
    return scores
