"""Deterministic synthetic corpus generators (FIXTURES.md F1/F2).

Two generators:

* :func:`line_graph_documents` — renders the reference integration-test
  fixture (10-vertex / 9-edge line graph, /root/reference/
  tests/graph_loader.rs:100-156) as interleaved documents: one document per
  edge ``i -> i+1`` with a text span and a media-caption span.
* :func:`corpus` — scales to arbitrary ``n_docs`` with a deterministic,
  *SQL-replicable* entity assignment (pure modular arithmetic, no RNG) and a
  Zipf-ish hub: entity 0 is the subject of every 5th document (~20%),
  exercising the salted-groupby skew path. Surface forms rotate through four
  alias spellings so entity linking is exercised on every run.

Everything is a pure function of (n_docs, doc index) so that N-CPU and
4N-CPU runs produce byte-identical outputs, and so the DuckDB oracle in
``__ray_entry__.py`` can recompute the golden edge set with plain SQL over
``range(n_docs)``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from .schemas import DOCUMENT_SCHEMA

# Four alias spellings per entity k; linking must resolve all to vertex_<k>.
# Index f is the "form"; keep in sync with alias_inventory().
_FORMS = (
    lambda k: f"vertex {k}",
    lambda k: f"Vertex {k}",
    lambda k: f"node {k}",
    lambda k: f"v{k}",
)

HUB_EVERY = 5          # doc i with i % HUB_EVERY == 0 has subject entity 0
IS_A_EVERY = 7         # doc i with i % IS_A_EVERY == 3 carries an "is a" span
_A_MULT = 7919         # primes for the modular entity assignment
_B_MULT = 104729
_B_OFF = 3


ENTITY_CAP = 50_000


def entity_space(n_docs: int) -> int:
    """Non-hub entity ids are 1..m (hub is 0).

    Capped at ENTITY_CAP: past that the corpus reuses entities (as real
    corpora do) instead of growing the inventory linearly with documents —
    keeps the broadcast side inventory-sized, not corpus-sized.
    """
    return max(2, min(n_docs // 10, ENTITY_CAP))


def edge_endpoints(i: int, n_docs: int) -> tuple[int, int]:
    """Deterministic (subject, object) entity ids for document ``i``.

    SQL-replicable: see ``__ray_entry__.oracle_sql()['kg_edges']``.
    """
    m = entity_space(n_docs)
    a = 0 if i % HUB_EVERY == 0 else 1 + (i * _A_MULT) % m
    b0 = 1 + (i * _B_MULT + _B_OFF) % m
    b = b0 if b0 != a else 1 + (b0 % m)
    return a, b


def _doc(i: int, n_docs: int) -> dict:
    a, b = edge_endpoints(i, n_docs)
    sf, of = _FORMS[i % 4], _FORMS[(i + 3) % 4]
    cf, gf = _FORMS[(i + 1) % 4], _FORMS[(i + 2) % 4]
    spans = [
        {
            "kind": "text",
            "text": f"{sf(a)} is connected to {of(b)}.",
            "media_ref": "",
            "offset": 0,
        },
        {
            "kind": "media",
            "text": f"caption: {cf(a)} links {gf(b)}",
            "media_ref": f"media/edge-{i}.png",
            "offset": 1,
        },
    ]
    if i % IS_A_EVERY == 3:
        spans.append(
            {
                "kind": "text",
                "text": f"{_FORMS[i % 4](a)} is a node.",
                "media_ref": "",
                "offset": 2,
            }
        )
    return {"doc_id": f"doc/{i}", "spans": spans}


def corpus(n_docs: int) -> pa.Table:
    """Scaled deterministic corpus as one Arrow table (row-wise reference
    implementation; :func:`corpus_vectorized` is the fast identical path)."""
    return pa.Table.from_pylist([_doc(i, n_docs) for i in range(n_docs)],
                                schema=DOCUMENT_SCHEMA)


def _surface_series(idx, form_idx, ent):
    """Vectorized surface strings for entity ids ``ent`` with per-row form
    index ``form_idx`` (mirrors _FORMS)."""
    import numpy as np
    import pandas as pd

    ks = pd.Series(ent).astype(str)
    out = pd.Series(np.empty(len(ks), dtype=object))
    f = pd.Series(form_idx)
    out[f == 0] = "vertex " + ks[f == 0]
    out[f == 1] = "Vertex " + ks[f == 1]
    out[f == 2] = "node " + ks[f == 2]
    out[f == 3] = "v" + ks[f == 3]
    return out


def corpus_vectorized(start: int, stop: int, n_docs: int) -> pa.Table:
    """Rows [start, stop) of the corpus, built with numpy/pandas/Arrow —
    byte-identical to :func:`corpus` (asserted in tests), ~30x faster."""
    import numpy as np
    import pandas as pd

    i = np.arange(start, stop, dtype=np.int64)
    m = entity_space(n_docs)
    a = np.where(i % HUB_EVERY == 0, 0, 1 + (i * _A_MULT) % m)
    b0 = 1 + (i * _B_MULT + _B_OFF) % m
    b = np.where(b0 == a, 1 + (b0 % m), b0)

    sf = _surface_series(i, i % 4, a)
    of = _surface_series(i, (i + 3) % 4, b)
    cf = _surface_series(i, (i + 1) % 4, a)
    gf = _surface_series(i, (i + 2) % 4, b)

    text1 = sf + " is connected to " + of + "."
    caption = "caption: " + cf + " links " + gf
    media_ref = pd.Series(i).map("media/edge-{}.png".format)
    has_isa = (i % IS_A_EVERY) == 3
    isa_text = (sf + " is a node.")[has_isa]

    counts = np.where(has_isa, 3, 2).astype(np.int64)
    offsets = np.zeros(len(i) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    total = int(offsets[-1])
    base = offsets[:-1]

    kind = np.empty(total, dtype=object)
    text = np.empty(total, dtype=object)
    ref = np.empty(total, dtype=object)
    off = np.zeros(total, dtype=np.int32)
    kind[base] = "text"
    text[base] = text1.to_numpy()
    ref[base] = ""
    off[base] = 0
    kind[base + 1] = "media"
    text[base + 1] = caption.to_numpy()
    ref[base + 1] = media_ref.to_numpy()
    off[base + 1] = 1
    isa_pos = base[has_isa] + 2
    kind[isa_pos] = "text"
    text[isa_pos] = isa_text.to_numpy()
    ref[isa_pos] = ""
    off[isa_pos] = 2

    struct = pa.StructArray.from_arrays(
        [
            pa.array(kind, pa.string()),
            pa.array(text, pa.string()),
            pa.array(ref, pa.string()),
            pa.array(off, pa.int32()),
        ],
        fields=list(DOCUMENT_SCHEMA.field("spans").type.value_type),
    )
    spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
    doc_ids = pa.array(pd.Series(i).map("doc/{}".format), pa.string())
    return pa.Table.from_arrays([doc_ids, spans], schema=DOCUMENT_SCHEMA)


def write_corpus(path: str, n_docs: int, rows_per_file: int = 65_536) -> None:
    """Write the corpus as (possibly several) parquet files under ``path``.

    Chunked so a 10^8-doc local bench never holds the whole corpus in
    driver memory; at real scale this table already exists (it is the
    input), so generation cost is out of scope.
    """
    import os

    os.makedirs(path, exist_ok=True)
    part = 0
    for start in range(0, n_docs, rows_per_file):
        stop = min(start + rows_per_file, n_docs)
        # small row groups: Ray splits reads at row-group granularity, so
        # this is what makes the read fan out wider than the file count
        pq.write_table(corpus_vectorized(start, stop, n_docs),
                       os.path.join(path, f"part-{part:05d}.parquet"),
                       row_group_size=16384)
        part += 1


def corpus_zipf(n_docs: int, zipf_a: float = 1.3,
                seed: int = 0) -> pa.Table:
    """Hot-entity stress corpus: same interleaved span layout as
    :func:`corpus` (text + media-caption spans, rotating alias forms)
    but SUBJECT entities drawn Zipf(``zipf_a``) — the hottest entity
    absorbs a large share of all triples (e.g. ~28% at a=1.3), the
    hub-page reality a crawl-scale KG build must survive. This is the
    stress input for the phase-B salted aggregation (per-batch edge/
    vertex PARTIALS collapse the hub before any shuffle, SURVEY §4.2):
    correctness is pinned salted ≡ unsalted
    (tests/test_pipeline.py::test_agg_strategies_agree_on_zipf_corpus),
    cost is measured by ``bench.py --skew``. Deterministic in
    (n_docs, zipf_a, seed); not SQL-replicable (no oracle needs it).
    """
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(seed)
    m = entity_space(n_docs)
    i = np.arange(n_docs, dtype=np.int64)
    a = (np.minimum(rng.zipf(zipf_a, n_docs), m) - 1).astype(np.int64)
    b0 = 1 + (i * _B_MULT + _B_OFF) % m
    b = np.where(b0 == a, 1 + (b0 % m), b0)

    sf = _surface_series(i, i % 4, a)
    of = _surface_series(i, (i + 3) % 4, b)
    cf = _surface_series(i, (i + 1) % 4, a)
    gf = _surface_series(i, (i + 2) % 4, b)
    text1 = sf + " is connected to " + of + "."
    caption = "caption: " + cf + " links " + gf
    media_ref = pd.Series(i).map("media/edge-{}.png".format)

    n = len(i)
    offsets = pa.array(np.arange(0, 2 * n + 1, 2, dtype=np.int32),
                       pa.int32())
    kind = np.empty(2 * n, dtype=object)
    text = np.empty(2 * n, dtype=object)
    ref = np.empty(2 * n, dtype=object)
    off = np.zeros(2 * n, dtype=np.int32)
    kind[0::2], kind[1::2] = "text", "media"
    text[0::2], text[1::2] = text1.to_numpy(), caption.to_numpy()
    ref[0::2], ref[1::2] = "", media_ref.to_numpy()
    off[1::2] = 1
    struct = pa.StructArray.from_arrays(
        [pa.array(kind, pa.string()), pa.array(text, pa.string()),
         pa.array(ref, pa.string()), pa.array(off, pa.int32())],
        fields=list(DOCUMENT_SCHEMA.field("spans").type.value_type),
    )
    spans = pa.ListArray.from_arrays(offsets, struct)
    doc_ids = pa.array(pd.Series(i).map("doc/{}".format), pa.string())
    return pa.Table.from_arrays([doc_ids, spans], schema=DOCUMENT_SCHEMA)


def line_graph_documents() -> pa.Table:
    """The reference fixture corpus (FIXTURES.md F1): 9 docs, one per edge
    ``i -> i+1`` of the 10-vertex line graph
    (/root/reference/tests/graph_loader.rs:129-150)."""
    rows = []
    for i in range(9):
        rows.append(
            {
                "doc_id": f"doc/{i}",
                "spans": [
                    {
                        "kind": "text",
                        "text": f"Vertex {i} is connected to vertex {i + 1}.",
                        "media_ref": "",
                        "offset": 0,
                    },
                    {
                        "kind": "media",
                        "text": f"caption: vertex {i} links vertex {i + 1}",
                        "media_ref": f"media/edge-{i}.png",
                        "offset": 1,
                    },
                ],
            }
        )
    return pa.Table.from_pylist(rows, schema=DOCUMENT_SCHEMA)


def line_graph_golden_triples() -> set[tuple[str, str, str]]:
    """FIXTURES.md F2: the 9 golden (subj, pred, obj) triples derived from
    the reference's 9 edges (tests/graph_loader.rs:139-150)."""
    return {(f"vertex_{i}", "connected_to", f"vertex_{i + 1}") for i in range(9)}


def golden_edges(n_docs: int) -> set[tuple[str, str, str]]:
    """Expected deduped (subj_key, pred, obj_key) set for :func:`corpus`."""
    out: set[tuple[str, str, str]] = set()
    for i in range(n_docs):
        a, b = edge_endpoints(i, n_docs)
        out.add((f"vertex_{a}", "connected_to", f"vertex_{b}"))
        if i % IS_A_EVERY == 3:
            out.add((f"vertex_{a}", "is_a", "node"))
    return out


def golden_vertices(n_docs: int) -> set[str]:
    """Expected canonical entity keys for :func:`corpus`."""
    keys: set[str] = set()
    for s, _p, o in golden_edges(n_docs):
        keys.add(s)
        keys.add(o)
    return keys


def alias_inventory(n_entities: int) -> dict[str, str]:
    """Alias -> canonical entity key map for the synthetic entity space.

    This is the small broadcast side of entity linking (``ray.put`` once,
    read in every linker actor). Keys are *normalized* aliases (lowercased);
    the linker normalizes surfaces the same way before lookup.
    """
    inv: dict[str, str] = {"node": "node"}
    for k in range(n_entities + 1):
        key = f"vertex_{k}"
        inv[f"vertex {k}"] = key
        inv[f"node {k}"] = key
        inv[f"v{k}"] = key
    return inv


# ---------------------------------------------------------------- exporter DB
def fixture_vertex_table() -> pa.Table:
    """The reference integration fixture's vertex collection: 10 vertices
    _key "0".."9" with x=i+1, y=i+2, z=i+3
    (/root/reference/tests/graph_loader.rs:129-137)."""
    return pa.table(
        {
            "_id": [f"IntegrationTestVertex/{i}" for i in range(10)],
            "_key": [str(i) for i in range(10)],
            "_rev": [f"rev-v{i}" for i in range(10)],
            "x": pa.array([i + 1 for i in range(10)], pa.int64()),
            "y": pa.array([i + 2 for i in range(10)], pa.int64()),
            "z": pa.array([i + 3 for i in range(10)], pa.int64()),
        }
    )


def fixture_edge_table() -> pa.Table:
    """9 line edges i -> i+1, _key "0".."8", x/y/z pattern
    (/root/reference/tests/graph_loader.rs:139-150)."""
    return pa.table(
        {
            "_id": [f"IntegrationTestEdge/{i}" for i in range(9)],
            "_key": [str(i) for i in range(9)],
            "_rev": [f"rev-e{i}" for i in range(9)],
            "_from": [f"IntegrationTestVertex/{i}" for i in range(9)],
            "_to": [f"IntegrationTestVertex/{i + 1}" for i in range(9)],
            "x": pa.array([i + 1 for i in range(9)], pa.int64()),
            "y": pa.array([i + 2 for i in range(9)], pa.int64()),
            "z": pa.array([i + 3 for i in range(9)], pa.int64()),
        }
    )


def write_fixture_db(db_dir: str) -> None:
    """Write the reference fixture as an exporter 'database': collection
    parquet tables + the named-graph definition
    (graph 'IntegrationTestGraph', tests/graph_loader.rs:100-127)."""
    import json
    import os

    os.makedirs(db_dir, exist_ok=True)
    pq.write_table(fixture_vertex_table(),
                   os.path.join(db_dir, "IntegrationTestVertex.parquet"))
    pq.write_table(fixture_edge_table(),
                   os.path.join(db_dir, "IntegrationTestEdge.parquet"))
    with open(os.path.join(db_dir, "graphs.json"), "w") as fh:
        json.dump(
            {
                "IntegrationTestGraph": {
                    "edgeDefinitions": [
                        {
                            "collection": "IntegrationTestEdge",
                            "from": ["IntegrationTestVertex"],
                            "to": ["IntegrationTestVertex"],
                        }
                    ]
                }
            },
            fh,
        )
