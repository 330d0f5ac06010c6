"""Model tests: tokenizers, encoder forward/pooling, cross-encoder scoring,
HF weight mapping (against a synthetic torch-style tensor dict)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ragmeup_tpu.models.encoder import BertConfig, BertEncoder, SentenceEncoder, mean_pool
from ragmeup_tpu.models.cross_encoder import CrossEncoder
from ragmeup_tpu.models.tokenizer import (
    SimpleTokenizer, WordPieceTokenizer, basic_tokenize, load_tokenizer,
)
from ragmeup_tpu.models.hf_loader import bert_params_from_hf


# -- tokenizers --------------------------------------------------------------

def test_basic_tokenize():
    assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert basic_tokenize("日本語 text") == ["日", "本", "語", "text"]


def test_wordpiece_greedy_longest_match():
    vocab = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
             "un": 4, "##aff": 5, "##able": 6, "##a": 7, "dog": 8}
    tok = WordPieceTokenizer(vocab)
    assert tok.tokenize_ids("unaffable") == [4, 5, 6]
    assert tok.tokenize_ids("dog") == [8]
    assert tok.tokenize_ids("zzz") == [1]  # UNK
    enc = tok.encode("dog")
    assert enc[0] == 2 and enc[-1] == 3


def test_wordpiece_build_from_corpus():
    tok = WordPieceTokenizer.build_from_corpus(
        ["the quick fox", "the lazy dog"], vocab_size=64)
    ids1 = tok.tokenize_ids("the fox")
    ids2 = tok.tokenize_ids("the fox")
    assert ids1 == ids2
    assert all(i != tok.unk_id for i in ids1)  # seen words are in vocab
    # unseen word falls back to char pieces, not UNK
    assert tok.unk_id not in tok.tokenize_ids("qui")


def test_wordpiece_pair_truncation():
    tok = WordPieceTokenizer.build_from_corpus(["a b c d e f g h"], vocab_size=64)
    ids, types = tok.encode_pair("a b c d", "e f g h", max_len=8)
    assert len(ids) == 8 and len(types) == 8
    assert types[0] == 0 and types[-1] == 1


def test_simple_tokenizer_deterministic():
    tok = SimpleTokenizer(1024)
    assert tok.encode("hello world") == tok.encode("hello world")
    assert all(0 <= i < 1024 for i in tok.encode("anything at all"))


def test_load_tokenizer_fallback(tmp_path):
    tok = load_tokenizer(None, 512)
    assert isinstance(tok, SimpleTokenizer)
    (tmp_path / "vocab.txt").write_text("[PAD]\n[UNK]\n[CLS]\n[SEP]\nhello\nworld\n")
    tok2 = load_tokenizer(str(tmp_path))
    assert isinstance(tok2, WordPieceTokenizer)
    assert tok2.tokenize_ids("hello world") == [4, 5]


# -- encoder -------------------------------------------------------------------

def test_bert_encoder_shapes_and_mask():
    cfg = BertConfig.tiny()
    model = BertEncoder(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 1024, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
    out = model.apply({"params": params}, ids, mask)
    assert out.shape == (2, 16, 64)
    # padded positions must not change unpadded outputs
    ids2 = jnp.concatenate([ids, jnp.zeros((2, 8), jnp.int32)], axis=1)
    mask2 = jnp.concatenate([mask, jnp.zeros((2, 8), jnp.int32)], axis=1)
    out2 = model.apply({"params": params}, ids2, mask2)
    np.testing.assert_allclose(np.asarray(out[:, :16], np.float32),
                               np.asarray(out2[:, :16], np.float32),
                               atol=2e-2)


def test_mean_pool_ignores_padding():
    h = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 6, 4))
    m = jnp.asarray([[1, 1, 1, 0, 0, 0]])
    pooled = mean_pool(h, m)
    np.testing.assert_allclose(np.asarray(pooled)[0],
                               np.asarray(h)[0, :3].mean(0), rtol=1e-6)


def test_sentence_encoder_encode():
    cfg = BertConfig.tiny()
    enc = SentenceEncoder(cfg, SimpleTokenizer(cfg.vocab_size), seed=0)
    embs = enc.encode(["hello world", "a much longer sentence about foxes",
                       "hello world"])
    assert embs.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, rtol=1e-4)
    # identical text → identical embedding (bucketing must not leak state)
    np.testing.assert_allclose(embs[0], embs[2], atol=1e-5)
    # different text → different embedding
    assert np.abs(embs[0] - embs[1]).max() > 1e-3


def test_sentence_encoder_capture_attention():
    cfg = BertConfig.tiny()
    model = BertEncoder(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]
    out, weights = model.apply({"params": params}, ids, mask,
                               capture_weights=True)
    assert len(weights) == cfg.num_layers
    assert weights[0].shape == (1, cfg.num_heads, 8, 8)
    np.testing.assert_allclose(np.asarray(jnp.sum(weights[0], -1), np.float32),
                               1.0, rtol=1e-2)


# -- cross encoder ---------------------------------------------------------------

def test_cross_encoder_scores_and_rerank():
    from ragmeup_tpu.data.documents import Chunk
    cfg = BertConfig.tiny()
    ce = CrossEncoder(cfg, SimpleTokenizer(cfg.vocab_size), seed=1)
    pairs = [("what is a fox", "the fox is a small canine"),
             ("what is a fox", "stock markets rallied today")]
    scores = ce.score(pairs)
    assert scores.shape == (2,)
    assert np.all((scores > 0) & (scores < 1))  # sigmoid
    # deterministic
    np.testing.assert_allclose(scores, ce.score(pairs), atol=1e-6)
    chunks = [Chunk(content=d, metadata={"source": str(i)})
              for i, (_, d) in enumerate(pairs)]
    out = ce.rerank("what is a fox", chunks, top_n=1)
    assert len(out) == 1
    assert "relevance_score" in out[0].metadata


def test_cross_encoder_batch_order_stable():
    cfg = BertConfig.tiny()
    ce = CrossEncoder(cfg, SimpleTokenizer(cfg.vocab_size), seed=1, batch_size=2)
    pairs = [("q", "short"), ("q", "a much longer document " * 10), ("q", "mid size doc")]
    s_all = ce.score(pairs)
    # score each pair alone; bucketed batching must not change results
    for i, p in enumerate(pairs):
        si = ce.score([p])[0]
        assert abs(si - s_all[i]) < 1e-4, i


# -- HF weight mapping ----------------------------------------------------------------

def _fake_hf_bert(cfg: BertConfig, rng):
    """Synthesize a torch-style HF BERT tensor dict."""
    t = {}
    h, inter, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size

    def r(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.02

    t["embeddings.word_embeddings.weight"] = r(v, h)
    t["embeddings.position_embeddings.weight"] = r(cfg.max_position, h)
    t["embeddings.token_type_embeddings.weight"] = r(2, h)
    t["embeddings.LayerNorm.weight"] = np.ones(h, np.float32)
    t["embeddings.LayerNorm.bias"] = np.zeros(h, np.float32)
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}."
        for nm in ("query", "key", "value"):
            t[p + f"attention.self.{nm}.weight"] = r(h, h)
            t[p + f"attention.self.{nm}.bias"] = r(h)
        t[p + "attention.output.dense.weight"] = r(h, h)
        t[p + "attention.output.dense.bias"] = r(h)
        t[p + "attention.output.LayerNorm.weight"] = np.ones(h, np.float32)
        t[p + "attention.output.LayerNorm.bias"] = np.zeros(h, np.float32)
        t[p + "intermediate.dense.weight"] = r(inter, h)
        t[p + "intermediate.dense.bias"] = r(inter)
        t[p + "output.dense.weight"] = r(h, inter)
        t[p + "output.dense.bias"] = r(h)
        t[p + "output.LayerNorm.weight"] = np.ones(h, np.float32)
        t[p + "output.LayerNorm.bias"] = np.zeros(h, np.float32)
    return t


def test_bert_params_from_hf_forward(rng):
    cfg = BertConfig.tiny()
    tensors = _fake_hf_bert(cfg, rng)
    params = bert_params_from_hf(tensors, cfg.num_layers)
    model = BertEncoder(cfg)
    ids = jnp.asarray([[2, 5, 9, 3]], jnp.int32)
    mask = jnp.ones((1, 4), jnp.int32)
    out = model.apply({"params": params}, ids, mask)
    assert out.shape == (1, 4, cfg.hidden_size)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    # kernel transpose check: manual embedding @ torch W^T for the query proj
    w = tensors["encoder.layer.0.attention.self.query.weight"]
    assert params["layer_0"]["attention"]["query_kernel"].shape == w.T.shape
    np.testing.assert_allclose(params["layer_0"]["attention"]["query_kernel"], w.T)


def test_bert_prefix_stripping(rng):
    cfg = BertConfig.tiny()
    tensors = {("bert." + k): v for k, v in _fake_hf_bert(cfg, rng).items()}
    params = bert_params_from_hf(tensors, cfg.num_layers)
    assert params["token_embedding"].shape == (cfg.vocab_size, cfg.hidden_size)


def test_flashrank_class_reranker():
    """rerank_model='flashrank' (.env.template:43 parity) builds a
    distinct TinyBERT-class fast cross-encoder: 2 layers, hidden 128,
    short pair truncation, same rerank contract."""
    from ragmeup_tpu.models.hf_loader import load_cross_encoder
    from ragmeup_tpu.data.documents import Chunk

    fast = load_cross_encoder(None, kind="flashrank")
    assert fast.cfg.num_layers == 2
    assert fast.cfg.hidden_size == 128
    assert fast.max_len == 128
    base = load_cross_encoder(None)
    assert base.cfg.hidden_size != fast.cfg.hidden_size

    chunks = [Chunk(id=str(i), content=f"document {i} about topic",
                    metadata={}) for i in range(5)]
    out = fast.rerank("which topic", chunks, top_n=3)
    assert len(out) == 3
    assert all("relevance_score" in c.metadata for c in out)
    scores = [c.metadata["relevance_score"] for c in out]
    assert scores == sorted(scores, reverse=True)


def test_native_simpletok_parity():
    """Native hashing-tokenizer fast path (native/simpletok.cpp) must be
    byte-identical to the Python md5 path on ASCII and route non-ASCII
    text to the Python Unicode implementation."""
    from ragmeup_tpu.models.tokenizer import SimpleTokenizer, basic_tokenize
    from ragmeup_tpu.native import simpletok_encode

    tok = SimpleTokenizer(30522)

    def py_ids(text):
        return [tok._tok_id(t) for t in basic_tokenize(text)]

    cases = [
        "Hello, World! This is a TEST of tokenization...",
        "punct!@#$%^&*()[]{};:'\",.<>/?`~\\|-_=+",
        "numbers 123 mixed42tokens and\ttabs\nnewlines\r",
        "  leading and trailing   ",
        "x" * 300,
        "",
    ]
    for t in cases:
        assert tok.tokenize_ids(t) == py_ids(t), t[:40]
    if simpletok_encode("a", 30522, 4) is not None:  # toolchain present
        assert simpletok_encode("héllo", 30522, 4) is None
    assert tok.tokenize_ids("héllo wörld") == py_ids("héllo wörld")
