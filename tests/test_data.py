"""Core substrate tests: documents, splitters, loaders, chunk store."""

import json
import os
import zipfile
import zlib

import numpy as np
import pytest

from ragmeup_tpu.config import RagConfig, load_config, parse_env_file
from ragmeup_tpu.data.documents import Chunk, chunk_id, deduplicate, format_documents, NEWDOC_SEPARATOR
from ragmeup_tpu.data.loaders import (
    eval_jq, load_csv, load_directory, load_docx, load_file, load_json,
    load_pdf, load_pptx, load_txt, load_xlsx, load_xml,
)
from ragmeup_tpu.data.splitters import (
    RecursiveCharacterSplitter, SemanticSplitter, make_splitter, split_sentences,
)
from ragmeup_tpu.data.store import ChunkStore


# -- documents ---------------------------------------------------------------

def test_chunk_id_is_md5_of_content():
    c = Chunk(content="hello world")
    import hashlib
    assert c.id == hashlib.md5(b"hello world").hexdigest()
    assert chunk_id("hello world") == c.id


def test_deduplicate_keeps_first():
    a = Chunk(content="x", metadata={"source": "a"})
    b = Chunk(content="x", metadata={"source": "b"})
    c = Chunk(content="y")
    out = deduplicate([a, b, c])
    assert len(out) == 2
    assert out[0].metadata["source"] == "a"


def test_format_documents_contract():
    chunks = [Chunk(content="abc", metadata={"source": "s1"}),
              Chunk(content="def", metadata={"source": "s2"})]
    s = format_documents(chunks)
    assert s == f"content: abc\nsource: s1{NEWDOC_SEPARATOR}content: def\nsource: s2"


# -- config -------------------------------------------------------------------

def test_config_defaults_match_reference_knobs():
    cfg = RagConfig()
    assert cfg.data.chunk_size == 512
    assert cfg.data.chunk_overlap == 20
    assert cfg.retrieval.vector_store_k == 10
    assert cfg.retrieval.rerank_k == 3
    assert cfg.retrieval.hybrid_weights == (0.5, 0.5)
    assert cfg.generation.max_new_tokens == 1000
    assert cfg.generation.temperature == 0.2
    assert cfg.pipeline.use_rewrite_loop
    assert cfg.pipeline.use_re2
    assert "{context}" in cfg.prompts.rag_instruction
    assert "{question}" in cfg.prompts.rewrite_query_prompt


def test_env_file_overrides(tmp_path):
    env = tmp_path / ".env"
    env.write_text(
        'chunk_size=128\nrerank=False\nuse_re2=True\n'
        'file_types="pdf,txt"\n'
        're2_prompt="Please re-read: "\n'
        'rag_instruction="Multi\nline {context}"\n'
    )
    cfg = load_config(env_file=str(env), use_environ=False)
    assert cfg.data.chunk_size == 128
    assert cfg.retrieval.rerank is False
    assert cfg.data.file_types == ("pdf", "txt")
    assert cfg.prompts.re2_prompt == "Please re-read: "
    assert cfg.prompts.rag_instruction == "Multi\nline {context}"


def test_parse_env_multiline():
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".env", delete=False) as f:
        f.write('a="line1\nline2\nline3"\nb=plain\n')
        p = f.name
    kv = parse_env_file(p)
    assert kv["a"] == "line1\nline2\nline3"
    assert kv["b"] == "plain"
    os.unlink(p)


# -- recursive splitter --------------------------------------------------------

def test_recursive_splitter_respects_chunk_size():
    text = "\n\n".join(f"Paragraph {i}. " + "word " * 40 for i in range(10))
    sp = RecursiveCharacterSplitter(chunk_size=200, chunk_overlap=20)
    chunks = sp.split_text(text)
    assert all(len(c) <= 200 for c in chunks)
    # No content lost (modulo whitespace-only fragments)
    joined = "".join(chunks)
    for i in range(10):
        assert f"Paragraph {i}." in joined


def test_recursive_splitter_short_text_passthrough():
    sp = RecursiveCharacterSplitter(chunk_size=512, chunk_overlap=20)
    assert sp.split_text("short text") == ["short text"]


def test_recursive_splitter_cjk():
    text = "句子一。" * 100
    sp = RecursiveCharacterSplitter(chunk_size=50, chunk_overlap=5)
    chunks = sp.split_text(text)
    assert all(len(c) <= 50 for c in chunks)
    assert sum(c.count("句子一") for c in chunks) >= 100


def test_recursive_splitter_no_separator_fallback():
    text = "x" * 1000
    sp = RecursiveCharacterSplitter(chunk_size=100, chunk_overlap=10)
    chunks = sp.split_text(text)
    assert all(len(c) <= 100 for c in chunks)
    assert sum(len(c) for c in chunks) >= 1000  # overlap duplicates some


def test_recursive_splitter_overlap():
    text = "aaaa. bbbb. cccc. dddd. eeee. ffff. gggg. hhhh. iiii. jjjj."
    sp = RecursiveCharacterSplitter(chunk_size=20, chunk_overlap=6)
    chunks = sp.split_text(text)
    assert len(chunks) > 1


# -- semantic splitter -----------------------------------------------------------

def _fake_embed(texts):
    """Two well-separated clusters keyed on 'cat' vs 'car' topic words."""
    out = np.zeros((len(texts), 4), dtype=np.float32)
    for i, t in enumerate(texts):
        if "cat" in t or "kitten" in t:
            out[i] = [1, 0.1, 0, 0]
        else:
            out[i] = [0, 0.1, 1, 0]
    return out


def test_semantic_splitter_breaks_at_topic_shift():
    text = ("The cat sat down. The kitten purred. A cat chased yarn. "
            "The car engine roared. The car drove fast. A car parked.")
    sp = SemanticSplitter(_fake_embed, breakpoint_threshold_type="percentile",
                          breakpoint_threshold_amount=80.0)
    chunks = sp.split_text(text)
    assert len(chunks) == 2
    assert "cat" in chunks[0] and "car" in chunks[1]


def test_semantic_splitter_number_of_chunks():
    text = ("The cat sat down. The kitten purred. "
            "The car engine roared. The car drove fast.")
    sp = SemanticSplitter(_fake_embed, number_of_chunks=2)
    chunks = sp.split_text(text)
    assert len(chunks) == 2


def test_split_sentences():
    assert split_sentences("One. Two! Three? Four") == ["One.", "Two!", "Three?", "Four"]


def test_make_splitter_dispatch():
    cfg = RagConfig()
    assert isinstance(make_splitter(cfg), RecursiveCharacterSplitter)
    cfg.data.splitter = "SemanticChunker"
    assert isinstance(make_splitter(cfg, embed_fn=_fake_embed), SemanticSplitter)
    cfg.data.splitter = "bogus"
    with pytest.raises(ValueError):
        make_splitter(cfg)


# -- loaders -------------------------------------------------------------------

def test_load_txt(tmp_path):
    p = tmp_path / "a.txt"
    p.write_text("hello\nworld")
    docs = load_txt(str(p))
    assert docs[0].content == "hello\nworld"
    assert docs[0].metadata["source"] == str(p)


def test_load_csv(tmp_path):
    p = tmp_path / "a.csv"
    p.write_text("name,age\nalice,30\nbob,25\n")
    docs = load_csv(str(p))
    assert len(docs) == 2
    assert "name: alice" in docs[0].content and "age: 30" in docs[0].content


def test_eval_jq():
    data = {"a": [{"b": "x"}, {"b": "y"}], "c": "z"}
    assert eval_jq(".", data) == [data]
    assert eval_jq(".c", data) == ["z"]
    assert eval_jq(".a[]", data) == [{"b": "x"}, {"b": "y"}]
    assert eval_jq(".a[].b", data) == ["x", "y"]
    assert eval_jq(".a[1].b", data) == ["y"]


def test_load_json(tmp_path):
    p = tmp_path / "a.json"
    p.write_text(json.dumps({"items": [{"text": "first"}, {"text": "second"}]}))
    docs = load_json(str(p), schema=".items[].text")
    assert [d.content for d in docs] == ["first", "second"]
    docs = load_json(str(p), schema=".items[]")
    assert json.loads(docs[0].content) == {"text": "first"}


def test_load_xml(tmp_path):
    p = tmp_path / "a.xml"
    p.write_text("<root><item>alpha</item><item>beta</item></root>")
    docs = load_xml(str(p), xpath="//item")
    assert [d.content for d in docs] == ["alpha", "beta"]


def _make_docx(path, paragraphs):
    doc_xml = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        "<w:body>" + "".join(f"<w:p><w:r><w:t>{p}</w:t></w:r></w:p>" for p in paragraphs)
        + "</w:body></w:document>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("word/document.xml", doc_xml)


def test_load_docx(tmp_path):
    p = tmp_path / "a.docx"
    _make_docx(str(p), ["First para", "Second &amp; third"])
    docs = load_docx(str(p))
    assert docs[0].content == "First para\nSecond & third"


def test_load_pptx(tmp_path):
    p = tmp_path / "a.pptx"
    slide = ('<p:sld xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">'
             "<a:t>Slide title</a:t><a:t>Bullet one</a:t></p:sld>")
    with zipfile.ZipFile(str(p), "w") as z:
        z.writestr("ppt/slides/slide1.xml", slide)
    docs = load_pptx(str(p))
    assert len(docs) == 1
    assert "Slide title" in docs[0].content and "Bullet one" in docs[0].content


def test_load_xlsx(tmp_path):
    p = tmp_path / "a.xlsx"
    shared = ('<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
              "<si><t>hello</t></si><si><t>world</t></si></sst>")
    sheet = ('<worksheet><sheetData>'
             '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>42</v></c></row>'
             '<row r="2"><c r="A2" t="s"><v>1</v></c></row>'
             "</sheetData></worksheet>")
    with zipfile.ZipFile(str(p), "w") as z:
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    docs = load_xlsx(str(p))
    assert "hello\t42" in docs[0].content
    assert "world" in docs[0].content


def _make_min_pdf(path, text):
    content = f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode()
    compressed = zlib.compress(content)
    body = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(compressed)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + compressed
            + b"\nendstream\nendobj\ntrailer\n<<>>\n%%EOF")
    with open(path, "wb") as f:
        f.write(body)


def test_load_pdf(tmp_path):
    p = tmp_path / "a.pdf"
    _make_min_pdf(str(p), "Hello PDF world")
    docs = load_pdf(str(p))
    assert len(docs) == 1
    assert "Hello PDF world" in docs[0].content


def test_pdf_tj_array_and_escapes(tmp_path):
    p = tmp_path / "b.pdf"
    content = rb"BT [(Hel) -20 (lo \(esc\))] TJ ET"
    body = (b"%PDF-1.4\nstream\n" + content + b"\nendstream\n%%EOF")
    with open(p, "wb") as f:
        f.write(body)
    docs = load_pdf(str(p))
    assert "Hello (esc)" in docs[0].content.replace("\n", "")


def test_load_directory(tmp_path):
    (tmp_path / "a.txt").write_text("alpha")
    (tmp_path / "b.csv").write_text("x\n1\n")
    (tmp_path / "skip.bin").write_bytes(b"\x00")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "c.txt").write_text("gamma")
    docs = load_directory(str(tmp_path), ["txt", "csv"])
    contents = sorted(d.content for d in docs)
    assert contents == ["alpha", "gamma", "x: 1"]


def test_load_directory_tolerates_errors(tmp_path):
    (tmp_path / "bad.json").write_text("{not json")
    (tmp_path / "good.txt").write_text("fine")
    errors = []
    docs = load_directory(str(tmp_path), ["json", "txt"],
                          on_error=lambda p, e: errors.append(p))
    assert [d.content for d in docs] == ["fine"]
    assert len(errors) == 1


# -- chunk store -------------------------------------------------------------------

def test_store_add_dedup_and_rows(tmp_path):
    store = ChunkStore(str(tmp_path))
    rows = store.add([Chunk(content="a"), Chunk(content="b"), Chunk(content="a")])
    assert rows == [0, 1]
    assert len(store) == 2
    rows2 = store.add([Chunk(content="a"), Chunk(content="c")])
    assert rows2 == [2]


def test_store_delete_and_compact(tmp_path):
    store = ChunkStore(str(tmp_path))
    store.add([Chunk(content="a", metadata={"source": "f1"}),
               Chunk(content="b", metadata={"source": "f2"}),
               Chunk(content="c", metadata={"source": "f1"})])
    deleted = store.delete_source("f1")
    assert deleted == [0, 2]
    assert len(store) == 1
    assert store.live_rows() == [1]
    assert store.get_by_id(chunk_id("a")) is None
    mapping = store.compact()
    assert mapping == [-1, 0, -1]
    assert len(store) == 1


def test_store_save_load_roundtrip(tmp_path):
    store = ChunkStore(str(tmp_path))
    store.add([Chunk(content="a", metadata={"source": "f1"}),
               Chunk(content="b", metadata={"source": "f2"})])
    store.delete_source("f1")
    store.save()
    loaded = ChunkStore.load(str(tmp_path))
    assert loaded.num_rows == 2
    assert loaded.tombstones == {0}
    assert loaded.live_chunks()[0].content == "b"
    assert ChunkStore.exists(str(tmp_path))


def test_semantic_splitter_gradient_and_iqr_thresholds():
    text = ("The cat sat down. The kitten purred. A cat chased yarn. "
            "The car engine roared. The car drove fast. A car parked.")
    for mode in ("gradient", "standard_deviation", "interquartile"):
        sp = SemanticSplitter(_fake_embed, breakpoint_threshold_type=mode)
        chunks = sp.split_text(text)
        assert 1 <= len(chunks) <= 6
    with pytest.raises(ValueError):
        SemanticSplitter(_fake_embed,
                         breakpoint_threshold_type="bogus").split_text(text)


def test_delete_source_normalizes_paths(tmp_path):
    """Ingest may record './docs/a.txt' while the server resolves
    'docs/a.txt'; delete-by-source must match either spelling."""
    from ragmeup_tpu.data.documents import Chunk
    from ragmeup_tpu.data.store import ChunkStore
    store = ChunkStore(str(tmp_path))
    store.add([
        Chunk(id="1", content="alpha", metadata={"source": "./docs/a.txt"}),
        Chunk(id="2", content="beta", metadata={"source": "./docs/b.txt"}),
    ])
    rows = store.delete_source("docs/a.txt")
    assert rows == [0]
    assert store.delete_source("./docs/b.txt") == [1]
