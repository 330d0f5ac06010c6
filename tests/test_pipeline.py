"""Pipeline tests: RAG state machine semantics (fetch-new decision, rewrite
loop, Re2, thread assembly, response contract), all four provenance methods,
and the RagSystem lifecycle end-to-end with tiny self-contained models."""

import os

import numpy as np
import pytest

from ragmeup_tpu.config import RagConfig
from ragmeup_tpu.data.documents import Chunk
from ragmeup_tpu.data.store import ChunkStore
from ragmeup_tpu.models.encoder import BertConfig, SentenceEncoder
from ragmeup_tpu.models.cross_encoder import CrossEncoder
from ragmeup_tpu.models.decoder import LlamaConfig, LocalLLM
from ragmeup_tpu.models.tokenizer import SimpleTokenizer
from ragmeup_tpu.pipeline.llm_backends import (
    LocalChatBackend, StaticChatBackend, llama3_template,
)
from ragmeup_tpu.pipeline.rag import RAGPipeline
from ragmeup_tpu.pipeline.system import RagSystem
from ragmeup_tpu.pipeline import provenance as prov
from ragmeup_tpu.retrieval.dense import DenseIndex
from ragmeup_tpu.retrieval.sparse import BM25Index, analyze
from ragmeup_tpu.retrieval.hybrid import HybridRetriever

CORPUS = [
    ("fox.txt", "The quick brown fox jumps over the lazy dog."),
    ("tpu.txt", "TPU chips use a systolic array called the MXU for matmuls."),
    ("fin.txt", "Stock markets rallied on strong tech earnings."),
]


def _hash_embed(texts, d=64):
    out = np.zeros((len(texts), d), np.float32)
    for i, t in enumerate(texts):
        for tok in analyze(t):
            out[i, hash(tok) % d] += 1.0
    return out / np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-9)


class _HashEncoder:
    """encoder protocol shim for provenance/similarity tests."""
    def encode(self, texts):
        return _hash_embed(texts)


def _make_pipeline(tmp_path, backend, cfg=None, **kw):
    cfg = cfg or RagConfig()
    cfg.retrieval.rerank = False
    cfg.pipeline.use_provenance = False
    store = ChunkStore(str(tmp_path))
    chunks = [Chunk(content=c, metadata={"source": s}) for s, c in CORPUS]
    store.add(chunks)
    dense = DenseIndex(64, dtype="float32", tile_n=512)
    dense.add(_hash_embed([c.content for c in chunks]))
    sparse = BM25Index()
    sparse.add([c.content for c in chunks])
    retriever = HybridRetriever(store, dense, sparse, embed_query_fn=_hash_embed,
                                k=3, search_type="similarity")
    return RAGPipeline(cfg, retriever, backend, **kw), cfg


# -- state machine -------------------------------------------------------------

def test_is_yes_parsing():
    from ragmeup_tpu.pipeline.rag import _is_yes
    # anchored assent
    assert _is_yes("yes")
    assert _is_yes("Yes.")
    assert _is_yes("Yes — the documents answer it.")
    assert _is_yes("  YES, fetch new documents")
    assert _is_yes('"Yes"')
    assert _is_yes("yeah, do it")
    # anchored dissent — an explicit leading no wins even if "yes" follows
    assert not _is_yes("no")
    assert not _is_yes("No.")
    assert not _is_yes("no — yes would be wrong")
    assert not _is_yes("No, yes is incorrect here")
    assert not _is_yes("Nope")
    # bounded fallback: known token within the first few words
    assert _is_yes("Sure, yes.")
    assert not _is_yes("Answer: no")
    # neither/empty → not assent
    assert not _is_yes("")
    assert not _is_yes("maybe")
    assert not _is_yes("the eyes have it")  # substring 'yes' must not match
    assert not _is_yes("I cannot determine that")


def test_first_turn_always_fetches(tmp_path):
    backend = StaticChatBackend(default="The answer.")
    pipe, _ = _make_pipeline(tmp_path, backend)
    out = pipe.handle_user_interaction("what does the fox do?")
    assert out["fetched_new_documents"] is True
    assert out["reply"] == "The answer."
    assert len(out["documents"]) > 0
    assert out["documents"][0]["s"].endswith(".txt")


def test_followup_fetch_decision_no(tmp_path):
    backend = StaticChatBackend(
        rules=[("Should new documents be fetched", "no"),
               ("should new documents be fetched", "no")],
        default="Follow-up answer.")
    pipe, cfg = _make_pipeline(tmp_path, backend)
    history = [{"role": "user", "content": "q1"},
               {"role": "assistant", "content": "a1"}]
    out = pipe.handle_user_interaction("tell me more", history)
    assert out["fetched_new_documents"] is False
    assert out["documents"] == []
    # history grew by 2 (no new system message on follow-up)
    assert len(out["history"]) == 4


def test_followup_thread_extends_history(tmp_path):
    """A no-fetch follow-up thread must be EXACTLY history + the follow-up
    question (RAGHelper_local.py:231-239): no fresh system message. This is
    what lets the paged-KV prefix cache reuse the whole previous thread's
    pages on turn N+1 (the token stream is a strict extension)."""
    backend = StaticChatBackend(
        rules=[("Answer with exactly yes or no", "no"),
               ("new documents be fetched", "no")],
        default="Follow-up answer.")
    pipe, cfg = _make_pipeline(tmp_path, backend)
    cfg.pipeline.use_re2 = False
    history = [{"role": "system", "content": "SYSBLOCK with baked context"},
               {"role": "user", "content": "q1"},
               {"role": "assistant", "content": "a1"}]
    out = pipe.handle_user_interaction("tell me more", history)
    assert out["fetched_new_documents"] is False
    final_thread = backend.calls[-1]
    # the thread starts with the HISTORY's system block, verbatim — no new
    # system message was prepended
    assert final_thread[0] == history[0]
    assert [m["content"] for m in final_thread[:3]] == \
        [m["content"] for m in history]
    assert sum(1 for m in final_thread if m["role"] == "system") == 1
    assert "tell me more" in final_thread[-1]["content"]


def test_rewrite_loop(tmp_path):
    # verdict 'no' → rewrite once; the rewrite response is used as the query
    backend = StaticChatBackend(
        rules=[("only answer with exactly yes or no", "no"),
               ("exact rephrasing", "what sound does the canine make"),
               ("decide whether the documents below contain", "no"),
               ("Rewrite the", "what sound does the canine make")],
        default="Rewritten answer.")
    pipe, cfg = _make_pipeline(tmp_path, backend)
    # make rule matching robust to prompt text: the instruction contains
    # 'Answer with exactly yes or no'; the rewrite prompt contains 'Rewrite'
    backend.rules = [("Answer with exactly yes or no", "no"),
                     ("Rewrite the question", "what sound does the canine make"),
                     ("rephrasing only", "what sound does the canine make")]
    out = pipe.handle_user_interaction("original question about foxes")
    assert out["rewritten"] is True
    assert out["question"] == "what sound does the canine make"


def test_rewrite_loop_yes_keeps_query(tmp_path):
    backend = StaticChatBackend(
        rules=[("Answer with exactly yes or no", "yes")],
        default="Answer.")
    pipe, _ = _make_pipeline(tmp_path, backend)
    out = pipe.handle_user_interaction("what does the fox do?")
    assert out["rewritten"] is False
    assert out["question"] == "what does the fox do?"


def test_re2_in_thread(tmp_path):
    backend = StaticChatBackend(default="ok")
    pipe, cfg = _make_pipeline(tmp_path, backend)
    cfg.pipeline.use_rewrite_loop = False
    pipe.handle_user_interaction("what is the MXU?")
    # last call's user message must contain the question twice (Re2)
    final_thread = backend.calls[-1]
    user_msg = final_thread[-1]["content"]
    assert user_msg.count("what is the MXU?") == 2
    assert cfg.prompts.re2_prompt in user_msg


def test_thread_has_context_and_history(tmp_path):
    backend = StaticChatBackend(rules=[("new documents should be fetched", "yes"),
                                       ("Answer with exactly yes or no", "yes")],
                                default="ok")
    pipe, cfg = _make_pipeline(tmp_path, backend)
    history = [{"role": "user", "content": "earlier question"},
               {"role": "assistant", "content": "earlier answer"}]
    out = pipe.handle_user_interaction("what is the MXU?", history)
    final_thread = backend.calls[-1]
    assert final_thread[0]["role"] == "system"
    assert "content:" in final_thread[0]["content"]  # format_documents context
    assert any(m["content"] == "earlier question" for m in final_thread)
    # follow-up template used
    assert "follow-up" in final_thread[-1]["content"].lower()


def test_max_document_limit(tmp_path):
    backend = StaticChatBackend(default="ok")
    pipe, cfg = _make_pipeline(tmp_path, backend)
    cfg.retrieval.max_document_limit = 1
    out = pipe.handle_user_interaction("fox dog earnings MXU")
    assert len(out["documents"]) == 1


def test_response_contract_keys(tmp_path):
    backend = StaticChatBackend(default="ok")
    pipe, _ = _make_pipeline(tmp_path, backend)
    out = pipe.handle_user_interaction("anything")
    for key in ("reply", "history", "documents", "rewritten", "question",
                "fetched_new_documents", "timings"):
        assert key in out
    assert out["history"][-1] == {"role": "assistant", "content": "ok"}
    assert out["history"][-2] == {"role": "user", "content": "anything"}


# -- provenance ----------------------------------------------------------------

def test_similarity_provenance():
    enc = _HashEncoder()
    docs = [Chunk(content="the fox jumps over the dog"),
            Chunk(content="stock markets rallied strongly")]
    scores = prov.compute_similarity_provenance(
        enc, "what does the fox do", "the fox jumps over the dog", docs)
    assert len(scores) == 2
    assert scores[0] > scores[1]
    assert sum(scores) == pytest.approx(1.0, abs=1e-6)


def test_llm_provenance_parses_floats():
    backend = StaticChatBackend(default="I'd score this a 3")
    scores = prov.compute_llm_provenance(
        lambda s: backend.complete(s), "{query} {answer} {context}",
        "q", "a", [Chunk(content="d1"), Chunk(content="d2")])
    assert scores == [3.0, 3.0]
    assert isinstance(scores[0], float)


def test_rerank_provenance():
    cfg = BertConfig.tiny()
    ce = CrossEncoder(cfg, SimpleTokenizer(cfg.vocab_size), seed=1)
    docs = [Chunk(content="alpha"), Chunk(content="beta")]
    scores = prov.compute_rerank_provenance(ce, "q", "a", docs)
    assert len(scores) == 2 and all(isinstance(s, float) for s in scores)


def test_attention_provenance():
    cfg = LlamaConfig.tiny()
    llm = LocalLLM(cfg, SimpleTokenizer(cfg.vocab_size), seed=0)
    docs = [Chunk(content="the fox document text"),
            Chunk(content="market earnings text")]
    scores = prov.compute_attention_provenance(
        llm, "what about the fox", "the fox jumps", docs)
    assert len(scores) == 2
    assert all(s >= 0 for s in scores)
    assert sum(scores) == pytest.approx(1.0, abs=1e-6)


def test_provenance_attached_in_pipeline(tmp_path):
    backend = StaticChatBackend(default="the fox jumps over the dog")
    pipe, cfg = _make_pipeline(tmp_path, backend, encoder=_HashEncoder())
    cfg.pipeline.use_provenance = True
    cfg.pipeline.provenance_method = "similarity"
    cfg.pipeline.use_rewrite_loop = False
    out = pipe.handle_user_interaction("what does the fox do?")
    assert all("provenance" in d for d in out["documents"])


def test_provenance_failure_is_nonfatal(tmp_path):
    class BrokenEncoder:
        def encode(self, texts):
            raise RuntimeError("boom")
    backend = StaticChatBackend(default="ok")
    pipe, cfg = _make_pipeline(tmp_path, backend, encoder=BrokenEncoder())
    cfg.pipeline.use_provenance = True
    cfg.pipeline.provenance_method = "similarity"
    cfg.pipeline.use_rewrite_loop = False
    out = pipe.handle_user_interaction("q")
    assert out["reply"] == "ok"  # reply survives


# -- local chat backend ------------------------------------------------------------

def test_llama3_template():
    t = llama3_template([{"role": "system", "content": "sys"},
                         {"role": "user", "content": "hi"}])
    assert t.startswith("<|begin_of_text|>")
    assert t.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")
    assert "sys" in t and "hi" in t


def test_local_chat_backend_generates():
    cfg = LlamaConfig.tiny()
    llm = LocalLLM(cfg, SimpleTokenizer(cfg.vocab_size), seed=0)
    backend = LocalChatBackend(llm)
    reply = backend.chat([{"role": "user", "content": "hello"}],
                         max_new_tokens=4, temperature=0.0)
    assert isinstance(reply, str)


# -- RagSystem end-to-end ------------------------------------------------------------

@pytest.fixture
def system_dirs(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    for name, text in CORPUS:
        (data / name).write_text(text * 3)
    idx = tmp_path / "index"
    return str(data), str(idx)


def _tiny_system(data_dir, idx_dir, backend=None):
    cfg = RagConfig()
    cfg.data.data_directory = data_dir
    cfg.data.index_directory = idx_dir
    cfg.data.chunk_size = 128
    cfg.model.embedding_dim = 64
    cfg.retrieval.dense_dtype = "float32"
    cfg.retrieval.rerank = False
    cfg.pipeline.use_provenance = False
    cfg.pipeline.use_rewrite_loop = False

    class _Enc:
        def encode(self, texts):
            return _hash_embed(texts)
    return RagSystem(cfg, encoder=_Enc(),
                     backend=backend or StaticChatBackend(default="answer"),
                     eager_load=True)


def test_system_build_chat_and_reload(system_dirs):
    data_dir, idx_dir = system_dirs
    sys1 = _tiny_system(data_dir, idx_dir)
    assert len(sys1.store) > 0
    out = sys1.chat("what does the fox do?")
    assert out["reply"] == "answer"
    assert out["documents"]
    # artifact persisted → second boot loads without re-embedding
    sys2 = _tiny_system(data_dir, idx_dir)
    assert len(sys2.store) == len(sys1.store)
    out2 = sys2.chat("what does the fox do?")
    assert [d["s"] for d in out2["documents"]] == [d["s"] for d in out["documents"]]


def test_system_add_and_delete_document(system_dirs, tmp_path):
    data_dir, idx_dir = system_dirs
    sys1 = _tiny_system(data_dir, idx_dir)
    new_file = tmp_path / "quantum.txt"
    new_file.write_text("Quantum qubits enable superposition computing at scale.")
    n = sys1.add_document(str(new_file))
    assert n > 0
    out = sys1.chat("quantum qubits superposition")
    assert any(d["s"] == str(new_file) for d in out["documents"])
    deleted = sys1.delete_document(str(new_file))
    assert deleted == n
    out2 = sys1.chat("quantum qubits superposition")
    assert all(d["s"] != str(new_file) for d in out2["documents"])


def test_system_compact(system_dirs):
    data_dir, idx_dir = system_dirs
    sys1 = _tiny_system(data_dir, idx_dir)
    src = sys1.store.live_chunks()[0].source
    sys1.delete_document(src)
    before = len(sys1.store)
    sys1.compact()
    assert len(sys1.store) == before
    assert sys1.store.num_rows == before  # tombstones gone
    out = sys1.chat("fox dog markets MXU")
    assert all(d["s"] != src for d in out["documents"])


def test_system_list_documents(system_dirs):
    data_dir, idx_dir = system_dirs
    sys1 = _tiny_system(data_dir, idx_dir)
    docs = sys1.list_documents()
    assert any(d.endswith("fox.txt") for d in docs)


def test_system_with_graph_enabled(system_dirs, tmp_path):
    """GraphRAG wiring: csv upload lands in the graph; graph retriever's
    Chunk joins the documents, prioritized and capped."""
    data_dir, idx_dir = system_dirs
    cfg = RagConfig()
    cfg.data.data_directory = data_dir
    cfg.data.index_directory = idx_dir + "_g"
    cfg.model.embedding_dim = 64
    cfg.retrieval.dense_dtype = "float32"
    cfg.retrieval.rerank = False
    cfg.pipeline.use_provenance = False
    cfg.pipeline.use_rewrite_loop = False
    cfg.graph.enabled = True

    class _Enc:
        def encode(self, texts):
            return _hash_embed(texts)
    backend = StaticChatBackend(
        rules=[("Cypher", "MATCH (r:Row) RETURN r.topic"),
               ("generate a Cypher", "MATCH (r:Row) RETURN r.topic")],
        default="answer")
    system = RagSystem(cfg, encoder=_Enc(), backend=backend)
    assert system.graph is not None

    csv = tmp_path / "topics.csv"
    csv.write_text("topic,notes\nquantum,stuff\nfoxes,things\n")
    system.add_document(str(csv))
    rows = system.graph.run("MATCH (r:Row) RETURN r.topic")
    assert sorted(r["r.topic"] for r in rows) == ["foxes", "quantum"]

    out = system.chat("what topics are available?")
    assert any(d["s"] == "graph_db" for d in out["documents"])
    # graph doc comes first (prioritized, RAGHelper_cloud.py:170-200)
    assert out["documents"][0]["s"] == "graph_db"


def test_stage_timer_and_trace():
    from ragmeup_tpu.utils.profiling import StageTimer, trace_stage
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with trace_stage("x"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0


# ---------------------------------------------------------------------------
# HF chat-template parity (reference: tokenizer.apply_chat_template,
# RAGHelper_local.py:246-249)
# ---------------------------------------------------------------------------

LLAMA31_TEMPLATE = (
    "{{- bos_token }}{%- for message in messages %}"
    "{{- '<|start_header_id|>' + message['role'] + '<|end_header_id|>\n\n' "
    "+ message['content'] | trim + '<|eot_id|>' }}{%- endfor %}"
    "{%- if add_generation_prompt %}"
    "{{- '<|start_header_id|>assistant<|end_header_id|>\n\n' }}{%- endif %}")

CHATML_TEMPLATE = (
    "{% for message in messages %}{{'<|im_start|>' + message['role'] + '\n' "
    "+ message['content'] + '<|im_end|>' + '\n'}}{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}"
    "{% endif %}")

MESSAGES = [
    {"role": "system", "content": "You are helpful."},
    {"role": "user", "content": "What is a TPU?"},
]


def _write_ckpt(tmp_path, template, bos="<|begin_of_text|>"):
    import json as _json
    (tmp_path / "tokenizer_config.json").write_text(_json.dumps(
        {"chat_template": template, "bos_token": bos,
         "eos_token": "<|eot_id|>"}))
    return str(tmp_path)


def _hf_render(template, messages, bos, eos):
    """Ground truth: transformers' own jinja compilation."""
    from transformers.utils.chat_template_utils import _compile_jinja_template
    return _compile_jinja_template(template).render(
        messages=messages, add_generation_prompt=True, tools=None,
        bos_token=bos, eos_token=eos)


@pytest.mark.parametrize("template,bos", [
    (LLAMA31_TEMPLATE, "<|begin_of_text|>"),
    (CHATML_TEMPLATE, ""),
])
def test_hf_chat_template_matches_transformers(tmp_path, template, bos):
    from ragmeup_tpu.pipeline.llm_backends import hf_chat_template
    d = _write_ckpt(tmp_path, template, bos=bos)
    fn = hf_chat_template(d)
    assert fn is not None
    got = fn(MESSAGES)
    want = _hf_render(template, MESSAGES, bos, "<|eot_id|>")
    assert got == want
    assert got.endswith("assistant<|end_header_id|>\n\n") or \
        got.endswith("<|im_start|>assistant\n")


def test_hf_chat_template_jinja_file_precedence(tmp_path):
    from ragmeup_tpu.pipeline.llm_backends import hf_chat_template
    _write_ckpt(tmp_path, CHATML_TEMPLATE)
    (tmp_path / "chat_template.jinja").write_text(LLAMA31_TEMPLATE)
    out = hf_chat_template(str(tmp_path))(MESSAGES)
    assert out.startswith("<|begin_of_text|>")  # jinja file won


def test_resolve_chat_template_fallback(tmp_path):
    from ragmeup_tpu.pipeline.llm_backends import (
        llama3_template, resolve_chat_template)
    # no checkpoint → generic template
    assert resolve_chat_template(None) is llama3_template
    # checkpoint without chat_template → generic template
    (tmp_path / "tokenizer_config.json").write_text("{}")
    assert resolve_chat_template(str(tmp_path)) is llama3_template


def test_hf_chat_template_named_list_and_added_tokens(tmp_path):
    import json as _json
    from ragmeup_tpu.pipeline.llm_backends import hf_chat_template
    (tmp_path / "tokenizer_config.json").write_text(_json.dumps({
        "chat_template": [
            {"name": "default", "template": "{{ bos_token }}{{ messages[-1]['content'] }}"},
            {"name": "tool_use", "template": "XX"},
        ],
        "bos_token": {"content": "<s>", "lstrip": False},
    }))
    out = hf_chat_template(str(tmp_path))(MESSAGES)
    assert out == "<s>What is a TPU?"
