"""Tiled distributed range join: containment semantics, multi-tile
replication correctness (exactly-once pairing), empty-side guard."""

import pyarrow as pa
import pytest

from raygraph.ops.relational import interval_join

pytestmark = pytest.mark.usefixtures("ray_session")


def _facts(vals, payload=None):
    import ray.data as rd

    t = {"v": pa.array(vals, pa.int64())}
    if payload is not None:
        t["p"] = pa.array(payload, pa.int64())
    return rd.from_arrow(pa.table(t))


def _ivs(rows):
    import ray.data as rd

    ids, los, his = zip(*rows) if rows else ((), (), ())
    return rd.from_arrow(pa.table({
        "iid": pa.array(list(ids), pa.int64()),
        "lo": pa.array(list(los), pa.int64()),
        "hi": pa.array(list(his), pa.int64()),
    }))


def _pairs(out):
    return sorted((r["iid"], r["v"]) for r in out.take_all())


def test_half_open_boundaries():
    # v == lo is IN, v == hi is OUT
    out = interval_join(_facts([10, 19, 20]), _ivs([(1, 10, 20)]),
                        value_col="v", lo_col="lo", hi_col="hi",
                        interval_cols=["iid"], tile_width=100)
    assert _pairs(out) == [(1, 10), (1, 19)]


def test_multi_tile_interval_pairs_exactly_once():
    # interval spans 4 tiles of width 10; every contained fact pairs
    # exactly once even though the interval is replicated 4x
    facts = _facts(list(range(0, 50, 3)), payload=list(range(0, 50, 3)))
    out = interval_join(facts, _ivs([(7, 5, 38)]),
                        value_col="v", lo_col="lo", hi_col="hi",
                        interval_cols=["iid"], fact_cols=["p"],
                        tile_width=10)
    rows = sorted((r["iid"], r["v"], r["p"]) for r in out.take_all())
    want = [(7, v, v) for v in range(0, 50, 3) if 5 <= v < 38]
    assert rows == want


def test_overlapping_intervals_fan_out_facts():
    out = interval_join(_facts([15]), _ivs([(1, 10, 20), (2, 0, 100),
                                            (3, 16, 30)]),
                        value_col="v", lo_col="lo", hi_col="hi",
                        interval_cols=["iid"], tile_width=8)
    assert _pairs(out) == [(1, 15), (2, 15)]


def test_empty_and_inverted_intervals():
    out = interval_join(_facts([5]), _ivs([(1, 5, 5), (2, 9, 3),
                                           (3, 0, 6)]),
                        value_col="v", lo_col="lo", hi_col="hi",
                        interval_cols=["iid"], tile_width=4)
    assert _pairs(out) == [(3, 5)]


def test_empty_interval_side_keeps_schema():
    out = interval_join(_facts([1, 2]), _ivs([]),
                        value_col="v", lo_col="lo", hi_col="hi",
                        interval_cols=["iid"], tile_width=4)
    assert out.count() == 0
    assert set(out.schema().names) == {"v", "lo", "hi", "iid"}


def test_bad_tile_width_rejected():
    with pytest.raises(ValueError):
        interval_join(_facts([1]), _ivs([(1, 0, 1)]), value_col="v",
                      lo_col="lo", hi_col="hi", interval_cols=["iid"],
                      tile_width=0)


def test_epoch_shuffle_dense_permutation_and_seed():
    import ray.data as rd

    from raygraph.ops.relational import epoch_shuffle

    ids = list(range(40))
    ds = rd.from_items([{"doc_id": i} for i in ids])
    p7 = {r["doc_id"]: r["position"]
          for r in epoch_shuffle(ds, seed=7, n_tiles=4).take_all()}
    assert sorted(p7.values()) == ids          # dense permutation
    # layout-invariant: different block structure, same positions
    p7b = {r["doc_id"]: r["position"]
           for r in epoch_shuffle(ds.repartition(7), seed=7,
                                  n_tiles=4).take_all()}
    assert p7 == p7b
    # a different seed is a different permutation
    p8 = {r["doc_id"]: r["position"]
          for r in epoch_shuffle(ds, seed=8, n_tiles=4).take_all()}
    assert p8 != p7
    assert sorted(p8.values()) == ids


def test_abc_classes_boundaries():
    import ray.data as rd

    from raygraph.ops.relational import abc_classes

    # values 50, 30, 15, 5 (total 100): inclusive shares 50/80/95/100
    ds = rd.from_items([{"k": 1, "v": 50}, {"k": 2, "v": 30},
                        {"k": 3, "v": 15}, {"k": 4, "v": 5}])
    got = {r["k"]: r["abc"]
           for r in abc_classes(ds, "k", "v", n_tiles=2).take_all()}
    # 80% boundary is INCLUSIVE for A, 95% inclusive for B
    assert got == {1: "A", 2: "A", 3: "B", 4: "C"}


def test_abc_classes_rejects_bad_bp():
    import pytest as _pytest
    import ray.data as rd

    from raygraph.ops.relational import abc_classes

    ds = rd.from_items([{"k": 1, "v": 1}])
    with _pytest.raises(ValueError):
        abc_classes(ds, "k", "v", a_bp=9600, b_bp=9500)


def test_topk_per_group_layout_invariant():
    import ray.data as rd

    from raygraph.ops.relational import topk_per_group

    rows = [{"g": i % 3, "v": (7 * i) % 11, "id": i}
            for i in range(30)]
    want = {}
    import pandas as pd

    df = pd.DataFrame(rows).sort_values(
        ["g", "v", "id"], ascending=[True, False, True])
    want = df.groupby("g").head(2)[["g", "v", "id"]] \
        .apply(tuple, axis=1).tolist()
    for parts in (1, 7):
        ds = rd.from_items(rows).repartition(parts)
        got = sorted((r["g"], r["v"], r["id"]) for r in
                     topk_per_group(ds, ["g"], "v", k=2,
                                    tie_cols=["id"]).take_all())
        assert got == sorted(want)


def test_topk_per_group_rejects_bad_k():
    import pytest as _pytest
    import ray.data as rd

    from raygraph.ops.relational import topk_per_group

    with _pytest.raises(ValueError):
        topk_per_group(rd.from_items([{"g": 1, "v": 1}]), ["g"], "v",
                       k=0)
