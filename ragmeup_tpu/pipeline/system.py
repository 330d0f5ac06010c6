"""RagSystem: the framework facade (the reference's RAGHelper role).

Owns config, chunk store, device indexes, models, and the pipeline; exposes
the lifecycle the HTTP server drives:

- startup: load the on-disk index artifact if present, else ingest the data
  directory, embed on device, and persist (``RAGHelper.load_data``,
  ``RAGHelper.py:551-566``);
- ``add_document``: load → split → dedup-append to store + both indexes +
  artifact (``RAGHelper.py:712-737``, minus the full BM25 rebuild);
- ``delete_document``: tombstone by source in store + both indexes, then
  persist — the *intent* of the reference's broken delete path
  (``server.py:353-385``, SURVEY.md §7 quirks);
- ``pipeline.handle_user_interaction`` for chat.
"""

from __future__ import annotations

import logging
import os
import threading
from typing import List, Optional

import numpy as np

from ragmeup_tpu.config import RagConfig
from ragmeup_tpu.data.documents import Chunk, filter_metadata
from ragmeup_tpu.data.loaders import load_directory, load_file
from ragmeup_tpu.data.splitters import make_splitter
from ragmeup_tpu.data.store import ChunkStore
from ragmeup_tpu.retrieval.dense import DenseIndex
from ragmeup_tpu.retrieval.sparse import BM25Index
from ragmeup_tpu.retrieval.hybrid import HybridRetriever
from ragmeup_tpu.pipeline.rag import RAGPipeline
from ragmeup_tpu.pipeline.llm_backends import (
    ChatBackend, CloudChatBackend, LocalChatBackend,
)

logger = logging.getLogger("ragmeup_tpu.system")


class RagSystem:
    def __init__(self, cfg: RagConfig, encoder=None, cross_encoder=None,
                 llm=None, backend: Optional[ChatBackend] = None,
                 extra_retrievers=(), eager_load: bool = True):
        self.cfg = cfg
        from ragmeup_tpu.models.hf_loader import (
            load_cross_encoder, load_local_llm, load_sentence_encoder,
        )
        # mesh mode (SURVEY.md §2.4): one config knob set shards the
        # indexes over the 'corpus' axis (bit-identical retrieval, round-1
        # verdict #3) and/or the local LLM over the 'model' axis (TP
        # inference with sharded KV cache and ring prefill)
        self.mesh = None
        if cfg.parallel.corpus_axis > 1 or cfg.parallel.model_axis > 1:
            import jax
            from ragmeup_tpu.parallel.mesh import make_mesh
            p = cfg.parallel
            if p.corpus_axis & (p.corpus_axis - 1):
                # BM25 head capacities are tile_n * 2^j; the sharded hybrid
                # program splits them evenly over 'corpus', so the axis
                # must be a power of two (round-2 review: axis=3 would
                # crash shard_map on every query)
                raise ValueError(
                    f"parallel.corpus_axis must be a power of two for the "
                    f"sharded retrieval program, got {p.corpus_axis}")
            devs = jax.devices()
            if len(devs) < p.total_devices:
                raise ValueError(
                    f"parallel config needs {p.total_devices} devices "
                    f"(data={p.data_axis} corpus={p.corpus_axis} "
                    f"model={p.model_axis}); have {len(devs)}")
            self.mesh = make_mesh((p.data_axis, p.corpus_axis, p.model_axis),
                                  devices=devs[:p.total_devices])
        self.encoder = encoder or load_sentence_encoder(
            cfg.model.embedding_checkpoint, dim=cfg.model.embedding_dim)
        self.cross_encoder = cross_encoder
        if cross_encoder is None and cfg.retrieval.rerank:
            self.cross_encoder = load_cross_encoder(
                cfg.model.cross_encoder_checkpoint,
                kind=cfg.retrieval.rerank_model)
        self.llm = llm
        if backend is None:
            if cfg.model.use_cloud:
                backend = CloudChatBackend.from_config(cfg.model)
            else:
                if self.llm is None:
                    self.llm = load_local_llm(
                        cfg.model.llm_checkpoint,
                        quantization=cfg.model.quantization,
                        head_quantization=cfg.model.head_quantization,
                        mesh=(self.mesh
                              if cfg.parallel.model_axis > 1 else None),
                        max_seq_len=cfg.model.llm_max_seq_len,
                        int4_w4a8=cfg.model.int4_w4a8,
                        int4_group=cfg.model.int4_group)
                # prompt assembly uses the checkpoint's own chat template
                # when it ships one (tokenizer.apply_chat_template parity,
                # RAGHelper_local.py:246-249); generic Llama-3-style otherwise
                from ragmeup_tpu.pipeline.llm_backends import resolve_chat_template
                template = resolve_chat_template(cfg.model.llm_checkpoint)
                if cfg.server.batched_llm:
                    from ragmeup_tpu.pipeline.serving import BatchedChatBackend
                    ekw = dict(num_pages=cfg.server.kv_pages,
                               page_size=cfg.server.kv_page_size,
                               prefix_cache=cfg.server.kv_prefix_cache,
                               spec_accept_floor=(
                                   cfg.server.llm_spec_accept_floor),
                               spec_reprobe_every=cfg.server.llm_spec_reprobe)
                    if cfg.server.kv_max_pages_per_seq > 0:
                        ekw["max_pages_per_seq"] = \
                            cfg.server.kv_max_pages_per_seq
                    backend = BatchedChatBackend(
                        self.llm, template=template,
                        assistant_token=cfg.model.llm_assistant_token,
                        wave_steps=cfg.server.llm_wave_steps,
                        spec_draft=cfg.server.llm_spec_draft,
                        **ekw)
                else:
                    backend = LocalChatBackend(
                        self.llm, template=template,
                        assistant_token=cfg.model.llm_assistant_token)
        self.backend = backend
        self.extra_retrievers = list(extra_retrievers)
        # GraphRAG wiring (cloud helper's graph_retriever hook,
        # RAGHelper_cloud.py:202-278): native in-process store or a remote
        # sidecar speaking the reference contract
        self.graph = None
        if cfg.graph.enabled:
            if cfg.graph.backend == "http" and cfg.graph.neo4j_location:
                from ragmeup_tpu.graph.client import RemoteGraphClient
                self.graph = RemoteGraphClient(cfg.graph.neo4j_location)
            else:
                from ragmeup_tpu.graph.store import PropertyGraph
                self.graph = PropertyGraph(
                    os.path.join(cfg.data.index_directory, "graph.json"))
            from ragmeup_tpu.graph.retriever import GraphRetriever
            self.extra_retrievers.append(
                GraphRetriever(self.graph, self.backend, cfg.prompts))

        # index mutation is serialized; the query path is purely functional
        # (SURVEY.md §5.2 — the reference shares a psycopg2 cursor across
        # Flask threads instead)
        self._mutation_lock = threading.RLock()
        self.store: ChunkStore = ChunkStore(cfg.data.index_directory)
        self.dense: Optional[DenseIndex] = None
        self.sparse: Optional[BM25Index] = None
        self.retriever: Optional[HybridRetriever] = None
        self.pipeline: Optional[RAGPipeline] = None
        if eager_load:
            self.load_data()

    # -- index lifecycle ---------------------------------------------------------

    def _splitter(self):
        return make_splitter(self.cfg, embed_fn=self.encoder.encode)

    @property
    def _corpus_sharded(self):
        return self.mesh is not None and self.cfg.parallel.corpus_axis > 1

    def _make_dense(self):
        r = self.cfg.retrieval
        if self._corpus_sharded:
            from ragmeup_tpu.parallel.sharded_index import ShardedDenseIndex
            return ShardedDenseIndex(self.mesh, self.cfg.model.embedding_dim,
                                     dtype=r.dense_dtype)
        return DenseIndex(self.cfg.model.embedding_dim, dtype=r.dense_dtype)

    def _load_dense(self, idx_dir: str):
        if self._corpus_sharded:
            from ragmeup_tpu.parallel.sharded_index import ShardedDenseIndex
            return ShardedDenseIndex.load(idx_dir, self.mesh)
        return DenseIndex.load(idx_dir)

    def _make_sparse(self) -> BM25Index:
        r = self.cfg.retrieval
        sparse = BM25Index(k1=r.bm25_k1, b=r.bm25_b)
        if self._corpus_sharded:
            from ragmeup_tpu.parallel.sharded_index import make_shard_placer
            sparse.shard_placer = make_shard_placer(self.mesh)
        return sparse

    def load_data(self) -> None:
        """Artifact cache hit → mmap-load; miss → ingest + embed + persist
        (reference load_data flow, RAGHelper.py:551-566)."""
        d = self.cfg.data
        idx_dir = d.index_directory
        if ChunkStore.exists(idx_dir) and DenseIndex.exists(idx_dir) \
                and BM25Index.exists(idx_dir):
            logger.info("loading index artifact from %s", idx_dir)
            self.store = ChunkStore.load(idx_dir)
            self.dense = self._load_dense(idx_dir)
            self.sparse = BM25Index.load(idx_dir)
            if self._corpus_sharded:
                from ragmeup_tpu.parallel.sharded_index import make_shard_placer
                self.sparse.shard_placer = make_shard_placer(self.mesh)
        else:
            logger.info("building index from data dir %s", d.data_directory)
            self.store = ChunkStore(idx_dir)
            raw = []
            if os.path.isdir(d.data_directory):
                raw = load_directory(
                    d.data_directory, d.file_types,
                    json_schema=d.json_schema,
                    json_text_content=d.json_text_content,
                    xml_xpath=d.xml_xpath,
                    on_error=lambda p, e: logger.warning("load failed %s: %s", p, e))
            chunks = filter_metadata(self._splitter().split_chunks(raw))
            self.store.add(chunks)
            self.dense = self._make_dense()
            self.sparse = self._make_sparse()
            live = self.store.live_chunks()
            if live:
                # the corpus-embedding hot loop: one batched device run
                vecs = self.encoder.encode([c.content for c in live])
                self.dense.add(vecs)
                self.sparse.add([c.content for c in live])
            self.save()
        self._wire()

    def _wire(self) -> None:
        r = self.cfg.retrieval
        self.retriever = HybridRetriever(
            self.store, self.dense, self.sparse,
            embed_query_fn=self.encoder.encode,
            k=r.vector_store_k, weights=r.hybrid_weights, rrf_c=r.rrf_c,
            search_type=r.search_type, mmr_fetch_k=r.mmr_fetch_k,
            mmr_lambda=r.mmr_lambda,
            reranker=self.cross_encoder if r.rerank else None,
            rerank_k=r.rerank_k,
            re2_prompt=self.cfg.prompts.re2_prompt if self.cfg.pipeline.use_re2 else None,
            # the sharded hybrid program expects a ShardedDenseIndex; a
            # TP-only mesh (model_axis > 1, corpus_axis == 1) keeps plain
            # single-chip indexes and must not take that path (round-2
            # review)
            mesh=self.mesh if self._corpus_sharded else None,
            ann=r.ann, ivf_nprobe=r.ivf_nprobe, ivf_clusters=r.ivf_clusters)
        self.pipeline = RAGPipeline(
            self.cfg, self.retriever, self.backend,
            cross_encoder=self.cross_encoder, encoder=self.encoder,
            llm=self.llm, extra_retrievers=self.extra_retrievers)

    def save(self) -> None:
        idx = self.cfg.data.index_directory
        os.makedirs(idx, exist_ok=True)
        self.store.save(idx)
        if self.dense is not None:
            self.dense.save(idx)
        if self.sparse is not None:
            self.sparse.save(idx)

    # -- CRUD ----------------------------------------------------------------------

    def add_document(self, path: str) -> int:
        """Ingest one file incrementally; returns number of new chunks."""
        with self._mutation_lock:
            return self._add_document_locked(path)

    def _add_document_locked(self, path: str) -> int:
        d = self.cfg.data
        raw = load_file(path, d.json_schema, d.json_text_content, d.xml_xpath)
        # graph upload hooks (RAGHelper.add_document, RAGHelper.py:712-737):
        # CSVs become graph rows; other docs optionally run LLM extraction
        if self.graph is not None:
            try:
                if path.lower().endswith(".csv"):
                    from ragmeup_tpu.graph.retriever import csv_to_graph
                    csv_to_graph(self.graph, path)
                elif self.cfg.graph.file_upload_using_llm:
                    from ragmeup_tpu.graph.retriever import text_to_graph_llm
                    for doc in raw:
                        text_to_graph_llm(
                            self.graph, self.backend, self.cfg.prompts,
                            doc.content,
                            dynamic_schema=self.cfg.graph.dynamic_schema)
            except Exception as e:  # graph upload is best-effort
                logger.warning("graph upload failed for %s: %s", path, e)
        chunks = filter_metadata(self._splitter().split_chunks(raw))
        rows = self.store.add(chunks)
        if rows:
            new_chunks = [self.store[r] for r in rows]
            vecs = self.encoder.encode([c.content for c in new_chunks])
            dr = self.dense.add(np.asarray(vecs))
            sr = self.sparse.add([c.content for c in new_chunks])
            assert dr == rows and sr == rows, "row id drift between store and indexes"
        self.save()
        return len(rows)

    def delete_document(self, source: str) -> int:
        """Tombstone all chunks of a source everywhere; returns count."""
        with self._mutation_lock:
            return self._delete_document_locked(source)

    def _delete_document_locked(self, source: str) -> int:
        rows = self.store.delete_source(source)
        if rows:
            self.dense.delete_rows(rows)
            self.sparse.delete_rows(rows)
        self.save()
        return len(rows)

    def compact(self) -> None:
        """Rewrite artifacts densely (periodic maintenance)."""
        with self._mutation_lock:
            self._compact_locked()

    def _compact_locked(self) -> None:
        mapping = self.store.compact()
        self.dense.compact(mapping)
        # sparse index rebuild from live texts (postings reference rows)
        r = self.cfg.retrieval
        self.sparse = BM25Index(k1=r.bm25_k1, b=r.bm25_b)
        self.sparse.add([c.content for c in self.store.live_chunks()])
        self.save()
        self._wire()

    # -- queries ----------------------------------------------------------------------

    def list_documents(self) -> List[str]:
        """Files in the data dir matching configured types
        (server.py:306-324 semantics) plus any indexed sources."""
        d = self.cfg.data
        exts = {t.lower().lstrip(".") for t in d.file_types}
        out = set()
        if os.path.isdir(d.data_directory):
            for root, _dirs, files in os.walk(d.data_directory):
                for f in files:
                    if os.path.splitext(f)[1].lstrip(".").lower() in exts:
                        out.add(os.path.join(root, f))
        out.update(self.store.sources())
        return sorted(out)

    def chat(self, prompt: str, history=None) -> dict:
        return self.pipeline.handle_user_interaction(prompt, history)
