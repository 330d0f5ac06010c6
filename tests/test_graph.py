"""Graph subsystem tests: Cypher-subset executor, schema introspection,
sidecar HTTP contract, LLM→Cypher retrieval, CSV/LLM ingestion flows."""

import json

import pytest
from werkzeug.test import Client

from ragmeup_tpu.config import PromptLibrary
from ragmeup_tpu.graph.store import CypherError, PropertyGraph
from ragmeup_tpu.graph.retriever import (
    GraphRetriever, csv_to_graph, extract_cypher, few_shot_from_schema,
    format_schema, text_to_graph_llm,
)
from ragmeup_tpu.graph.sidecar import GraphSidecar
from ragmeup_tpu.pipeline.llm_backends import StaticChatBackend


# -- cypher executor ------------------------------------------------------------

def test_create_and_match():
    g = PropertyGraph()
    g.run("CREATE (n:Topic {name: 'physics'})")
    g.run("CREATE (n:Topic {name: 'biology'})")
    rows = g.run("MATCH (t:Topic) RETURN t.name")
    assert sorted(r["t.name"] for r in rows) == ["biology", "physics"]


def test_merge_idempotent():
    g = PropertyGraph()
    for _ in range(3):
        g.run("MERGE (t:Topic {name: $name})", {"name": "physics"})
    assert len(g.nodes) == 1


def test_merge_relationship_reference_shape():
    """The exact MERGE chain shape from the reference few-shot
    (.env.template neo4j_insert_few_shot)."""
    g = PropertyGraph()
    g.run("MERGE (q:Quote {text: $quoteText}) MERGE (t:Topic {name: $topicName}) "
          "MERGE (q)-[:IS_PART_OF]->(t)",
          {"quoteText": "Pitch Toolkit", "topicName": "Needed tools"})
    g.run("MERGE (q:Quote {text: $quoteText}) MERGE (t:Topic {name: $topicName}) "
          "MERGE (q)-[:IS_PART_OF]->(t)",
          {"quoteText": "MVP", "topicName": "Needed tools"})
    assert len(g.nodes) == 3  # 2 quotes + 1 topic (merged)
    assert len(g.rels) == 2
    rows = g.run("MATCH (q:Quote)-[:IS_PART_OF]->(t:Topic) RETURN q.text, t.name")
    assert len(rows) == 2
    assert all(r["t.name"] == "Needed tools" for r in rows)


def test_match_with_where():
    g = PropertyGraph()
    g.run("CREATE (p:Person {name: 'ada', age: 36})")
    g.run("CREATE (p:Person {name: 'grace', age: 85})")
    rows = g.run("MATCH (p:Person) WHERE p.age > 50 RETURN p.name")
    assert [r["p.name"] for r in rows] == ["grace"]
    rows = g.run("MATCH (p:Person) WHERE p.age > 10 AND p.name = 'ada' RETURN p.name")
    assert [r["p.name"] for r in rows] == ["ada"]


def test_match_direction():
    g = PropertyGraph()
    g.run("MERGE (a:P {n: 'a'}) MERGE (b:P {n: 'b'}) MERGE (a)-[:LIKES]->(b)")
    assert g.run("MATCH (x:P)-[:LIKES]->(y:P) RETURN x.n, y.n") == \
        [{"x.n": "a", "y.n": "b"}]
    assert g.run("MATCH (x:P)<-[:LIKES]-(y:P) RETURN x.n, y.n") == \
        [{"x.n": "b", "y.n": "a"}]


def test_return_distinct_limit_count():
    g = PropertyGraph()
    for name in ("x", "x", "y"):
        g.run("CREATE (t:Tag {name: $n})", {"n": name})
    rows = g.run("MATCH (t:Tag) RETURN DISTINCT t.name")
    assert sorted(r["t.name"] for r in rows) == ["x", "y"]
    rows = g.run("MATCH (t:Tag) RETURN t.name LIMIT 2")
    assert len(rows) == 2
    rows = g.run("MATCH (t:Tag) RETURN count(t) AS n")
    assert rows == [{"n": 3}]


def test_return_whole_node_and_labels():
    g = PropertyGraph()
    g.run("CREATE (t:Topic {name: 'physics'})")
    rows = g.run("MATCH (t:Topic) RETURN t")
    assert rows[0]["t"] == {"name": "physics"}
    rows = g.run("MATCH (t:Topic) RETURN labels(t) AS l")
    assert rows[0]["l"] == ["Topic"]


def test_unsupported_raises():
    g = PropertyGraph()
    with pytest.raises(CypherError):
        g.run("FOREACH (x IN [1,2] | CREATE (:N))")
    with pytest.raises(CypherError):
        g.run("MATCH (n:X {p: $missing}) RETURN n")


def test_save_load(tmp_path):
    p = str(tmp_path / "g.json")
    g = PropertyGraph(p)
    g.run("MERGE (a:P {n: 'a'}) MERGE (b:P {n: 'b'}) MERGE (a)-[:KNOWS]->(b)")
    g.save()
    g2 = PropertyGraph(p)
    assert len(g2.nodes) == 2 and len(g2.rels) == 1
    assert g2.run("MATCH (x:P)-[:KNOWS]->(y:P) RETURN y.n") == [{"y.n": "b"}]


def test_schema_shape():
    g = PropertyGraph()
    g.run("MERGE (q:Quote {text: 't'}) MERGE (t:Topic {name: 'n'}) "
          "MERGE (q)-[:IS_PART_OF]->(t)")
    s = g.schema()
    labels = {nl["label"]: nl["properties"] for nl in s["node_labels"]}
    assert labels == {"Quote": ["text"], "Topic": ["name"]}
    assert s["relationship_types"][0]["type"] == "IS_PART_OF"


# -- sidecar HTTP contract -----------------------------------------------------------

@pytest.fixture
def sidecar_client():
    app = GraphSidecar(PropertyGraph())
    return Client(app), app


def test_sidecar_contract(sidecar_client):
    c, app = sidecar_client
    r = c.post("/add_instances", json={"instances": [
        {"query": "MERGE (t:Topic {name: $n})", "parameters": {"n": "physics"}},
        {"query": "MERGE (f:Fact {name: $n})", "parameters": {"n": "gravity"}},
    ]})
    assert r.get_json()["count"] == 2
    r = c.get("/schema")
    labels = [nl["label"] for nl in r.get_json()["node_labels"]]
    assert labels == ["Fact", "Topic"]
    r = c.post("/run_query", json={"query": "MATCH (t:Topic) RETURN t.name"})
    assert r.get_json()["result"] == [{"t.name": "physics"}]
    r = c.post("/run_query", json={"query": "BOGUS SYNTAX"})
    assert r.status_code == 400
    r = c.post("/add_csv", json={"rows": [{"name": "a", "val": "1"},
                                          {"name": "b", "val": "2"}]})
    assert r.get_json()["count"] == 2
    assert c.get("/close_db").get_json()["status"] == "closed"


# -- retriever -------------------------------------------------------------------------

def test_format_schema_and_few_shot():
    g = PropertyGraph()
    g.run("CREATE (t:Topic {name: 'x'})")
    s = format_schema(g.schema())
    assert "- Topic: name" in s
    fs = few_shot_from_schema(g.schema())
    assert "MATCH (n:Topic) RETURN n.name" in fs


def test_extract_cypher():
    assert extract_cypher("None") is None
    assert extract_cypher("```cypher\nMATCH (n) RETURN n\n```") == "MATCH (n) RETURN n"
    assert extract_cypher("MATCH (t:Topic) RETURN t.name") == \
        "MATCH (t:Topic) RETURN t.name"


def test_graph_retriever_end_to_end():
    g = PropertyGraph()
    g.run("CREATE (t:Topic {name: 'quantum computing'})")
    g.run("CREATE (t:Topic {name: 'biology'})")
    backend = StaticChatBackend(
        rules=[("generate a Cypher", "MATCH (t:Topic) RETURN t.name"),
               ("Cypher query", "MATCH (t:Topic) RETURN t.name")],
        default="MATCH (t:Topic) RETURN t.name")
    r = GraphRetriever(g, backend, PromptLibrary())
    chunks = r.retrieve("what topics are available?")
    assert len(chunks) == 1
    assert chunks[0].source == "graph_db"
    assert "quantum computing" in chunks[0].content


def test_graph_retriever_none_and_error():
    g = PropertyGraph()
    r = GraphRetriever(g, StaticChatBackend(default="None"), PromptLibrary())
    assert r.retrieve("unrelated question") == []
    r2 = GraphRetriever(g, StaticChatBackend(default="TOTALLY (not) cypher!!"),
                        PromptLibrary())
    assert r2.retrieve("q") == []  # CypherError swallowed → no docs


# -- ingestion flows --------------------------------------------------------------------

def test_csv_to_graph(tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text("name,role\nada,engineer\ngrace,admiral\nada,engineer\n")
    g = PropertyGraph()
    n = csv_to_graph(g, str(p), label="Person")
    assert n == 3
    rows = g.run("MATCH (p:Person) RETURN p.name")
    assert sorted(r["p.name"] for r in rows) == ["ada", "grace"]  # MERGE dedup


def test_text_to_graph_llm():
    g = PropertyGraph()
    reply = json.dumps([
        {"query": "MERGE (q:Quote {text: $t}) MERGE (c:Topic {name: $n}) "
                  "MERGE (q)-[:IS_PART_OF]->(c)",
         "parameters": {"t": "some quote", "n": "tools"}},
        {"query": "MERGE (c:Topic {name: $n})", "parameters": {"n": "tools"}},
    ])
    backend = StaticChatBackend(default=f"Here you go:\n{reply}")
    n = text_to_graph_llm(g, backend, PromptLibrary(), "doc text")
    assert n == 2
    assert len(g.run("MATCH (q:Quote)-[:IS_PART_OF]->(t:Topic) RETURN q.text")) == 1


def test_text_to_graph_llm_none_and_garbage():
    g = PropertyGraph()
    assert text_to_graph_llm(g, StaticChatBackend(default="None"),
                             PromptLibrary(), "t") == 0
    assert text_to_graph_llm(g, StaticChatBackend(default="not json at all"),
                             PromptLibrary(), "t") == 0
    assert len(g.nodes) == 0


def test_text_to_graph_llm_max_instances():
    g = PropertyGraph()
    reply = json.dumps([{"query": f"CREATE (n:N {{i: {i}}})"} for i in range(20)])
    backend = StaticChatBackend(default=reply)
    n = text_to_graph_llm(g, backend, PromptLibrary(), "t", max_instances=9)
    assert n == 9  # reference caps at 9 additions


def test_remote_client_against_sidecar_process(tmp_path):
    """RemoteGraphClient ↔ live sidecar process over real HTTP."""
    import socket
    import subprocess
    import sys
    import time as _time
    from ragmeup_tpu.graph.client import RemoteGraphClient

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, "-m", "ragmeup_tpu.graph.sidecar", "--port",
         str(port), "--host", "127.0.0.1", "--db", str(tmp_path / "g.json")],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        client = RemoteGraphClient(f"http://127.0.0.1:{port}")
        for _ in range(50):
            try:
                client.schema()
                break
            except Exception:
                _time.sleep(0.2)
        client.add_instances([
            {"query": "MERGE (t:Topic {name: $n})", "parameters": {"n": "physics"}},
        ])
        schema = client.schema()
        assert schema["node_labels"][0]["label"] == "Topic"
        rows = client.run("MATCH (t:Topic) RETURN t.name")
        assert rows == [{"t.name": "physics"}]
        # GraphRetriever is backend-agnostic: works over the remote client
        from ragmeup_tpu.config import PromptLibrary
        from ragmeup_tpu.graph.retriever import GraphRetriever
        from ragmeup_tpu.pipeline.llm_backends import StaticChatBackend
        r = GraphRetriever(client, StaticChatBackend(
            default="MATCH (t:Topic) RETURN t.name"), PromptLibrary())
        chunks = r.retrieve("what topics exist?")
        assert chunks and "physics" in chunks[0].content
        client.close()
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_order_by_and_where_or():
    g = PropertyGraph()
    for name, age in [("ada", 36), ("grace", 85), ("alan", 41)]:
        g.run("CREATE (p:Person {name: $n, age: $a})", {"n": name, "a": age})
    rows = g.run("MATCH (p:Person) WHERE p.age < 40 OR p.name = 'grace' "
                 "RETURN p.name")
    assert sorted(r["p.name"] for r in rows) == ["ada", "grace"]
