"""Unit tests for the deterministic corpus generator (no Ray needed)."""

from raygraph import synth
from raygraph.ops.spans import validate_spans


def test_line_graph_shape():
    t = synth.line_graph_documents()
    assert t.num_rows == 9
    row = t.to_pylist()[0]
    assert row["doc_id"] == "doc/0"
    assert [s["kind"] for s in row["spans"]] == ["text", "media"]
    assert row["spans"][0]["text"] == "Vertex 0 is connected to vertex 1."
    assert row["spans"][1]["media_ref"] == "media/edge-0.png"
    validate_spans(t)


def test_golden_line_triples():
    gold = synth.line_graph_golden_triples()
    assert len(gold) == 9
    assert ("vertex_0", "connected_to", "vertex_1") in gold


def test_corpus_deterministic():
    a = synth.corpus(40)
    b = synth.corpus(40)
    assert a.equals(b)
    validate_spans(a)


def test_endpoints_never_self_loop():
    n = 500
    for i in range(n):
        a, b = synth.edge_endpoints(i, n)
        assert a != b


def test_hub_skew():
    n = 500
    hubs = sum(1 for i in range(n) if synth.edge_endpoints(i, n)[0] == 0)
    assert hubs >= n // synth.HUB_EVERY  # ~20% of docs hit the hub entity


def test_golden_edges_cover_vertices():
    edges = synth.golden_edges(100)
    verts = synth.golden_vertices(100)
    for s, _p, o in edges:
        assert s in verts and o in verts


def test_vectorized_corpus_identical():
    n = 777
    assert synth.corpus_vectorized(0, n, n).equals(synth.corpus(n))
    # arbitrary window
    assert synth.corpus_vectorized(100, 200, n).equals(
        synth.corpus(n).slice(100, 100).combine_chunks()
    )
