"""Unit tests for span validation + triple extraction (no Ray needed —
both are pure Arrow-batch functions)."""

import pyarrow as pa
import pytest

from raygraph import synth
from raygraph.errors import SpanValidationError
from raygraph.ops.extract import extract_triples
from raygraph.ops.spans import span_fingerprint, validate_spans
from raygraph.schemas import DOCUMENT_SCHEMA


def _doc(doc_id, spans):
    return pa.Table.from_pylist([{"doc_id": doc_id, "spans": spans}],
                                schema=DOCUMENT_SCHEMA)


def test_extract_line_graph():
    t = synth.line_graph_documents()
    tr = extract_triples(t)
    # per doc: one text hit + one caption hit
    assert tr.num_rows == 18
    trips = set(
        zip(tr.column("subj_surface").to_pylist(),
            tr.column("pred").to_pylist(),
            tr.column("obj_surface").to_pylist())
    )
    assert ("Vertex 3", "connected_to", "vertex 4") in trips
    assert ("vertex 3", "connected_to", "vertex 4") in trips  # caption


def test_extract_pattern_table():
    cases = [
        ("a works for b.", ("a", "works_for", "b")),
        ("Alice knows Bob", ("Alice", "knows", "Bob")),
        ("x is located in y.", ("x", "located_in", "y")),
        ("x is part of y", ("x", "part_of", "y")),
        ("x is a widget.", ("x", "is_a", "widget")),
        ("x is an engine.", ("x", "is_a", "engine")),
    ]
    for text, want in cases:
        t = _doc("d", [{"kind": "text", "text": text, "media_ref": "", "offset": 0}])
        got = extract_triples(t).to_pylist()
        assert len(got) == 1, text
        r = got[0]
        assert (r["subj_surface"], r["pred"], r["obj_surface"]) == want


def test_extract_first_pattern_wins():
    # 'is connected to' must not also fire 'is_a'
    t = _doc("d", [{"kind": "text", "text": "a is connected to b.",
                    "media_ref": "", "offset": 0}])
    got = extract_triples(t).to_pylist()
    assert len(got) == 1 and got[0]["pred"] == "connected_to"


def test_extract_media_requires_caption_prefix():
    t = _doc("d", [{"kind": "media", "text": "x links y",
                    "media_ref": "m.png", "offset": 0}])
    assert extract_triples(t).num_rows == 0
    t = _doc("d", [{"kind": "media", "text": "caption: x links y",
                    "media_ref": "m.png", "offset": 0}])
    got = extract_triples(t).to_pylist()
    assert got[0]["pred"] == "connected_to"
    assert got[0]["subj_surface"] == "x"


def test_extract_no_match_empty():
    t = _doc("d", [{"kind": "text", "text": "nothing here",
                    "media_ref": "", "offset": 0}])
    out = extract_triples(t)
    assert out.num_rows == 0
    assert out.schema.names[:3] == ["doc_id", "span_idx", "subj_surface"]


def test_extract_lineage_span_idx():
    t = _doc("d", [
        {"kind": "text", "text": "junk", "media_ref": "", "offset": 0},
        {"kind": "text", "text": "a knows b.", "media_ref": "", "offset": 1},
    ])
    got = extract_triples(t).to_pylist()
    assert got[0]["span_idx"] == 1 and got[0]["doc_id"] == "d"


def test_validate_rejects_bad_kind():
    t = _doc("d", [{"kind": "video", "text": "x", "media_ref": "", "offset": 0}])
    with pytest.raises(SpanValidationError):
        validate_spans(t)


def test_validate_rejects_unordered_offsets():
    t = _doc("d", [
        {"kind": "text", "text": "x", "media_ref": "", "offset": 5},
        {"kind": "text", "text": "y", "media_ref": "", "offset": 2},
    ])
    with pytest.raises(SpanValidationError):
        validate_spans(t)


def test_validate_passthrough_zero_copy():
    t = synth.corpus(20)
    out = validate_spans(t)
    assert out is t  # untouched, not rebuilt


def test_span_fingerprint_stable_and_sensitive():
    t = synth.line_graph_documents()
    fp1 = span_fingerprint(t).column("span_fp").to_pylist()
    fp2 = span_fingerprint(t).column("span_fp").to_pylist()
    assert fp1 == fp2
    other = span_fingerprint(synth.corpus(9)).column("span_fp").to_pylist()
    assert fp1 != other


def test_span_stats_zero_copy_counts(ray_session):
    import pyarrow as pa

    from raygraph.ops.spans import span_stats
    from raygraph.schemas import DOCUMENT_SCHEMA

    def doc(i, spans):
        return {"doc_id": f"doc/{i}", "spans": spans}

    t = pa.Table.from_pylist([
        doc(0, [{"kind": "text", "text": "a", "media_ref": "", "offset": 0},
                {"kind": "media", "text": "c", "media_ref": "m",
                 "offset": 1}]),
        doc(1, []),
        doc(2, [{"kind": "text", "text": "x", "media_ref": "", "offset": 0},
                {"kind": "text", "text": "y", "media_ref": "", "offset": 1},
                {"kind": "media", "text": "z", "media_ref": "m",
                 "offset": 2}]),
    ], schema=DOCUMENT_SCHEMA)
    out = span_stats(t).to_pandas().set_index("doc_id")
    assert out.loc["doc/0"].tolist() == [2, 1, 1]
    assert out.loc["doc/1"].tolist() == [0, 0, 0]
    assert out.loc["doc/2"].tolist() == [3, 2, 1]


def test_render_interleaved_sentinels():
    import pyarrow as pa

    from raygraph.ops.spans import render_interleaved
    from raygraph.schemas import DOCUMENT_SCHEMA

    t = pa.Table.from_pylist([
        {"doc_id": "doc/0", "spans": [
            {"kind": "text", "text": "hello world", "media_ref": "",
             "offset": 0},
            {"kind": "media", "text": "caption", "media_ref": "m/1.png",
             "offset": 1},
            {"kind": "text", "text": "bye", "media_ref": "", "offset": 2}]},
        {"doc_id": "doc/1", "spans": []},
    ], schema=DOCUMENT_SCHEMA)
    out = render_interleaved(t).to_pandas()
    assert out["rendered"].tolist() == ["hello world <m/1.png> bye", ""]
    assert out["n_spans"].tolist() == [3, 0]


def test_interleaved_costs_zero_copy_accounting(ray_session):
    from raygraph.ops.spans import PATCH_TOKENS, interleaved_costs

    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()), ("offset", pa.int32())])
    rows = [
        [("text", "three token span", "", 0),
         ("media", "caption ignored entirely", "media/x.png", 1)],
        [("text", "one", "", 0)],
        [],
    ]
    spans = pa.array(
        [[{"kind": k, "text": t, "media_ref": r, "offset": o}
          for k, t, r, o in row] for row in rows],
        pa.list_(span_t))
    batch = pa.table({"doc_id": ["doc/7", "doc/12", "doc/0"],
                      "spans": spans})
    out = interleaved_costs(batch).to_pandas()
    assert out.i.tolist() == [7, 12, 0]
    # media cost = patch budget, caption text never tokenized
    assert out.cost.tolist() == [3 + PATCH_TOKENS, 1, 0]


def test_caption_context_pairs_latest_preceding_text():
    import pyarrow as pa

    from raygraph.ops.spans import caption_context
    from raygraph.schemas import DOCUMENT_SCHEMA

    def doc(i, spans):
        return {"doc_id": f"doc/{i}", "spans": spans}

    t = pa.Table.from_pylist([
        # two text spans before the media: context = the LATEST one
        doc(0, [{"kind": "text", "text": "x", "media_ref": "", "offset": 0},
                {"kind": "text", "text": "y", "media_ref": "", "offset": 1},
                {"kind": "media", "text": "cap0", "media_ref": "m0",
                 "offset": 2}]),
        # media-first: no preceding text -> null context (and the text
        # AFTER it must not leak backwards)
        doc(1, [{"kind": "media", "text": "cap1", "media_ref": "m1",
                 "offset": 0},
                {"kind": "text", "text": "late", "media_ref": "",
                 "offset": 1},
                {"kind": "media", "text": "cap2", "media_ref": "m2",
                 "offset": 2}]),
        # no media at all -> contributes no rows
        doc(2, [{"kind": "text", "text": "only", "media_ref": "",
                 "offset": 0}]),
    ], schema=DOCUMENT_SCHEMA)
    out = caption_context(t).to_pandas()
    rows = {r.media_ref: (r.doc_id, r.caption, r.context)
            for r in out.itertuples()}
    assert rows["m0"] == ("doc/0", "cap0", "y")
    assert rows["m1"][2] is None
    assert rows["m2"] == ("doc/1", "cap2", "late")
    assert len(out) == 3


# ---- verb-frame (dependency-ish) family, golden-gated -----------------

FRAME_FIXTURE = [
    # (text, golden triple or None)
    ("the acme corp acquired initech in 2001",
     ("acme corp", "acquired", "initech")),
    ("alice works at initech", ("alice", "works_at", "initech")),
    ("bob manages the carol team", ("bob", "manages", "carol team")),
    ("a small startup employs dana", ("small startup", "employs", "dana")),
    ("erin reports to frank", ("erin", "reports_to", "frank")),
    ("grace lives in springfield since 1999",
     ("grace", "lives_in", "springfield")),
    ("henry founded the iris lab", ("henry", "founded", "iris lab")),
    ("the ceo of acme manages bob", ("ceo of acme", "manages", "bob")),
    ("utah borders nevada.", ("utah", "borders", "nevada")),
    ("ivan works with telescopes", None),        # no frame for (works, with)
    ("nothing interesting here at all", None),   # no head verb
    ("manages", None),                           # verb only, no chunks
    ("acquired initech", None),                  # verb-initial: no subject
    ("the team manages", None),                  # verb-final: no object
    # pattern table keeps priority inside the same mode
    ("x is connected to y.", ("x", "connected_to", "y")),
]


def test_frame_extraction_golden_pr():
    """P/R >= 0.95 gate on the extended fixture (exact golden replay —
    P = R = 1.0 by construction, gated at the SURVEY §5 bar)."""
    rows = [{"doc_id": f"d{i}",
             "spans": [{"kind": "text", "text": text,
                        "media_ref": "", "offset": 0}]}
            for i, (text, _) in enumerate(FRAME_FIXTURE)]
    t = pa.Table.from_pylist(rows, schema=DOCUMENT_SCHEMA)
    got = extract_triples(t, mode="patterns+frames")
    got_set = set(zip(got.column("subj_surface").to_pylist(),
                      got.column("pred").to_pylist(),
                      got.column("obj_surface").to_pylist()))
    golden = {g for _, g in FRAME_FIXTURE if g is not None}
    tp = len(got_set & golden)
    precision = tp / len(got_set) if got_set else 1.0
    recall = tp / len(golden)
    assert precision >= 0.95 and recall >= 0.95, (got_set, golden)
    assert precision == 1.0 and recall == 1.0


def test_frames_off_by_default():
    # default mode must not emit frame triples (pipeline bit-stability)
    t = _doc("d", [{"kind": "text", "text": "alice works at initech",
                    "media_ref": "", "offset": 0}])
    assert extract_triples(t).num_rows == 0
    assert extract_triples(t, mode="patterns+frames").num_rows == 1


def test_frame_conf_and_lineage():
    t = _doc("d9", [
        {"kind": "text", "text": "filler span with no relation",
         "media_ref": "", "offset": 0},
        {"kind": "text", "text": "bob manages carol",
         "media_ref": "", "offset": 1},
    ])
    got = extract_triples(t, mode="patterns+frames").to_pylist()
    assert len(got) == 1
    r = got[0]
    assert r["doc_id"] == "d9" and r["span_idx"] == 1
    assert abs(r["conf"] - 0.70) < 1e-6


# ---------------------------------------------------------------- coref
def _tspan(text, off):
    return {"kind": "text", "text": text, "media_ref": "", "offset": off}


def test_coref_resolves_to_nearest_preceding_subject():
    t = _doc("d", [
        _tspan("Alice works for Acme.", 0),
        _tspan("It is located in Berlin.", 1),
    ])
    got = extract_triples(t, mode="patterns+coref").to_pylist()
    assert len(got) == 2
    coref = [r for r in got if r["pred"] == "located_in"][0]
    assert coref["subj_surface"] == "Alice"
    assert coref["obj_surface"] == "Berlin"


def test_coref_chain_resolves_to_head():
    # both pronouns resolve to the chain head: only non-pronoun
    # subjects seed the forward fill
    t = _doc("d", [
        _tspan("Acme is located in Berlin.", 0),
        _tspan("It is part of Initech.", 1),
        _tspan("It is a company.", 2),
    ])
    got = extract_triples(t, mode="patterns+coref").to_pylist()
    assert [r["subj_surface"] for r in sorted(
        got, key=lambda r: r["span_idx"])] == ["Acme", "Acme", "Acme"]


def test_coref_unresolved_pronoun_dropped():
    t = _doc("d", [_tspan("It is located in Berlin.", 0)])
    got = extract_triples(t, mode="patterns+coref")
    assert got.num_rows == 0


def test_coref_does_not_cross_documents():
    t = pa.Table.from_pylist([
        {"doc_id": "a", "spans": [_tspan("Alice knows Bob.", 0)]},
        {"doc_id": "b", "spans": [_tspan("It is located in Berlin.", 0)]},
    ], schema=DOCUMENT_SCHEMA)
    got = extract_triples(t, mode="patterns+coref").to_pylist()
    assert len(got) == 1 and got[0]["doc_id"] == "a"


def test_coref_media_caption_subject_is_antecedent():
    t = _doc("d", [
        {"kind": "media", "text": "caption: Acme links Initech",
         "media_ref": "m.png", "offset": 0},
        _tspan("It is located in Berlin.", 1),
    ])
    got = extract_triples(t, mode="patterns+coref").to_pylist()
    coref = [r for r in got if r["pred"] == "located_in"][0]
    assert coref["subj_surface"] == "Acme"


def test_coref_off_by_default():
    t = _doc("d", [
        _tspan("Alice knows Bob.", 0),
        _tspan("It is located in Berlin.", 1),
    ])
    got = extract_triples(t).to_pylist()  # default mode: no resolution
    coref = [r for r in got if r["pred"] == "located_in"][0]
    assert coref["subj_surface"] == "It"
