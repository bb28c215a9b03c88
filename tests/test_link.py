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


def test_sharded_linker_parity_with_fuzzy(ray_session):
    # whole-index vs hash-sharded resolution must agree surface-by-
    # surface across all three paths: exact hit, fuzzy accept, minted
    from raygraph.ops.link import ShardedAliasIndex

    aliases = synth.alias_inventory(20)
    whole = EntityLinker(aliases=aliases, min_score=0.3)
    for k in (2, 4, 7):
        head = ShardedAliasIndex.build_head(aliases, k)
        sharded = EntityLinker(shard_head=head, min_score=0.3)
        surfaces = pd.Series([
            "vertex 3", "Vertex 3.", "vertexx 7", "vrtex 5", "nod 2",
            "zzz qqq", "completely unrelated thing", "v 9",
            "  node   12 ", "vertex 3",
        ])
        assert list(whole.link_surfaces(surfaces)[0]) == \
            list(sharded.link_surfaces(surfaces)[0])


def test_sharded_empty_inventory_mints(ray_session):
    from raygraph.ops.link import ShardedAliasIndex

    head = ShardedAliasIndex.build_head({}, 4)
    lk = EntityLinker(shard_head=head)
    got, _ = lk.link_surfaces(pd.Series(["anything at all"]))
    assert got[0] == minted_key("anything at all")


def test_shard_dicts_partition_inventory(ray_session):
    # every normalized alias lands in exactly one shard, keyed by
    # crc32(norm) % k — the deserialize-1/k residency contract
    import ray

    from raygraph.ops.link import ShardedAliasIndex

    aliases = synth.alias_inventory(15)
    k = 5
    head = ShardedAliasIndex.build_head(aliases, k)
    shards = [ray.get(r) for r in head["shard_refs"]]
    total = sum(len(s["map"]) for s in shards)
    assert total == head["n_aliases"]
    for s_ix, sh in enumerate(shards):
        for a in sh["map"]:
            assert ShardedAliasIndex.shard_of(a, k) == s_ix
