"""Canonicalization: union-find (driver) and min-label propagation
(distributed) must agree and merge alias-bridged keys."""

import pandas as pd
import pyarrow as pa
import pytest

from raygraph.ops.canon import canonical_map_dataset, mention_pairs, union_find


def test_union_find_identity():
    got = union_find([("k1", "s1"), ("k2", "s2")])
    assert got == {"k1": "k1", "k2": "k2"}


def test_union_find_merge_via_shared_surface():
    got = union_find([("k1", "shared"), ("k2", "shared"), ("k3", "s3")])
    assert got["k1"] == got["k2"] == "k1"  # lexicographic min key wins
    assert got["k3"] == "k3"


def test_union_find_chain():
    # k1 - s1 - k2 - s2 - k3: one component, min key k1
    got = union_find([("k1", "s1"), ("k2", "s1"), ("k2", "s2"), ("k3", "s2")])
    assert got == {"k1": "k1", "k2": "k1", "k3": "k1"}


def test_union_find_duplicate_pairs_idempotent():
    got = union_find([("k1", "s1")] * 5 + [("k2", "s1")] * 3)
    assert got == {"k1": "k1", "k2": "k1"}


def test_mention_pairs_dedups_within_batch():
    # surfaces arrive already normalized from the linker
    batch = pa.table(
        {
            "subj": ["k1", "k1", "k1"],
            "obj": ["k2", "k2", "k2"],
            "subj_surface": ["a", "a", "a"],
            "obj_surface": ["b", "b", "b"],
        }
    )
    out = mention_pairs(batch)
    rows = set(zip(out.column("key").to_pylist(), out.column("surface").to_pylist()))
    assert rows == {("k1", "a"), ("k2", "b")}


@pytest.mark.usefixtures("ray_session")
def test_distributed_label_prop_matches_union_find():
    import ray.data as rd

    pairs = [
        ("k1", "s1"), ("k2", "s1"),            # merge k1,k2
        ("k2", "s2"), ("k3", "s2"),            # chain to k3
        ("k9", "s9"),                           # singleton
    ]
    ds = rd.from_items([{"key": k, "surface": s} for k, s in pairs])
    got = {r["key"]: r["canon"] for r in canonical_map_dataset(ds, rounds=4).take_all()}
    want = union_find(pairs)
    assert got == want


def test_make_apply_canon_identity_returns_none():
    from raygraph.ops.materialize import make_apply_canon

    assert make_apply_canon({"k1": "k1", "k2": "k2"}) is None


def test_make_apply_canon_applies_merges():
    from raygraph.ops.materialize import make_apply_canon

    fn = make_apply_canon({"k1": "k1", "k2": "k1"})
    batch = pa.table(
        {
            "subj": ["k2", "k3"],
            "obj": ["k1", "k2"],
            "pred": ["p", "p"],
        }
    )
    out = fn(batch)
    assert out.column("subj").to_pylist() == ["k1", "k3"]
    assert out.column("obj").to_pylist() == ["k1", "k1"]
