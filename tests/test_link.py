"""Unit tests for the EntityLinker (constructed directly, no actor pool —
the class contract is identical either way)."""

import pandas as pd
import pyarrow as pa

from raygraph import synth
from raygraph.ops.link import EntityLinker, minted_key, normalize_surfaces


def _linker(n=10, **kw):
    return EntityLinker(aliases=synth.alias_inventory(n), **kw)


def test_exact_alias_hit():
    lk = _linker()
    got, _ = lk.link_surfaces(pd.Series(["vertex 3", "Vertex 3", "node 3", "v3"]))
    assert list(got) == ["vertex_3"] * 4


def test_punctuation_normalization():
    lk = _linker()
    got, _ = lk.link_surfaces(pd.Series(["Vertex 3.", "  vertex   3 "]))
    assert list(got) == ["vertex_3"] * 2


def test_fuzzy_trigram_match():
    # unseen surface 'vertexx 3' should fuzzy-match the 'vertex 3' alias
    lk = _linker(min_score=0.5)
    got, _ = lk.link_surfaces(pd.Series(["vertexx 3"]))
    assert list(got) == ["vertex_3"]


def test_below_threshold_mints_deterministic_key():
    lk = _linker(min_score=0.99)
    got1, _ = lk.link_surfaces(pd.Series(["completely unrelated thing"]))
    lk2 = _linker(min_score=0.99)
    got2, _ = lk2.link_surfaces(pd.Series(["completely unrelated thing"]))
    assert got1[0] == got2[0] == minted_key("completely unrelated thing")
    assert got1[0].startswith("ent_")


def test_batch_call_passthrough_columns():
    lk = _linker()
    batch = pa.table(
        {
            "doc_id": ["d1"],
            "span_idx": pa.array([0], pa.int32()),
            "subj_surface": ["Vertex 1"],
            "pred": ["connected_to"],
            "obj_surface": ["v2"],
            "conf": pa.array([0.9], pa.float32()),
            "part_id": pa.array([7], pa.int64()),
        }
    )
    out = lk(batch)
    assert out.column("subj").to_pylist() == ["vertex_1"]
    assert out.column("obj").to_pylist() == ["vertex_2"]
    assert out.column("part_id").to_pylist() == [7]  # checkpoint col survives


def test_normalize_surfaces():
    s = normalize_surfaces(pd.Series(["  A,b;C  ", "x\t\ty"]))
    assert list(s) == ["a b c", "x y"]


def test_linker_deterministic_across_instances():
    # same inventory → identical index → identical fuzzy decisions
    a = _linker(min_score=0.3)
    b = _linker(min_score=0.3)
    surfaces = pd.Series(["vrtex 5", "nod 2", "zzz qqq", "v 7"])
    assert list(a.link_surfaces(surfaces)[0]) == list(b.link_surfaces(surfaces)[0])
