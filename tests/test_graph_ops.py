"""Graph analytics + new relational ops vs naive in-memory references."""

import collections

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

PAIRS = {("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"), ("x", "a"),
         ("a", "c")}


def _edges_ds():
    import ray.data as rd

    # parallel edge a-p->b / a-q->b must collapse to one arc
    return rd.from_arrow(pa.table({
        "_from": ["a", "a", "b", "c", "d", "x", "a"],
        "pred": ["p", "q", "p", "p", "p", "p", "p"],
        "_to": ["b", "b", "c", "a", "a", "a", "c"],
    }))


def _succ():
    succ = collections.defaultdict(set)
    for u, v in PAIRS:
        succ[u].add(v)
    return succ


def test_two_hop_counts_matches_naive(ray_session):
    from raygraph.ops.graph import two_hop_counts

    got = two_hop_counts(_edges_ds()).to_pandas()
    got = dict(zip(got["a"], got["n_two_hop"].astype(int)))
    succ = _succ()
    exp = {u: len({c for b in vs for c in succ.get(b, ())})
           for u, vs in succ.items()}
    assert got == {k: v for k, v in exp.items() if v}


def test_pagerank_matches_naive_integer_spec(ray_session):
    from raygraph.ops.graph import SCALE, pagerank

    got = pagerank(_edges_ds(), iters=3).to_pandas()
    got = dict(zip(got["vertex"], got["rank_e12"].astype(int)))

    succ = _succ()
    verts = sorted({u for u, _ in PAIRS} | {v for _, v in PAIRS})
    n = len(verts)
    od = {u: len(vs) for u, vs in succ.items()}
    r = {v: SCALE // n for v in verts}
    base = (15 * SCALE) // (100 * n)
    for _ in range(3):
        c = {u: r[u] // od[u] for u in od}
        s = collections.defaultdict(int)
        for u, v in PAIRS:
            s[v] += c[u]
        dang = sum(r[v] for v in verts if v not in od)
        r = {v: base + (85 * (s.get(v, 0) + dang // n)) // 100
             for v in verts}
    assert got == r
    # ranks are a probability-ish distribution: total stays near SCALE
    # (floor losses only shrink it)
    assert 0.9 * SCALE < sum(got.values()) <= SCALE


def test_pagerank_deterministic_across_parallelism(ray_session):
    from raygraph.ops.graph import pagerank

    a = pagerank(_edges_ds(), iters=2).to_pandas().sort_values("vertex")
    b = pagerank(_edges_ds().repartition(7), iters=2).to_pandas() \
        .sort_values("vertex")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_distinct_count_exact(ray_session):
    import ray.data as rd

    from raygraph.ops.relational import distinct_count

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "g": rng.integers(0, 5, 2000).astype(str),
        "u": rng.integers(0, 37, 2000),
    })
    got = distinct_count(rd.from_pandas(df).repartition(9), ["g"], "u",
                         out="n").to_pandas().sort_values("g")
    exp = df.groupby("g")["u"].nunique()
    assert dict(zip(got["g"], got["n"].astype(int))) == exp.to_dict()


def test_grouped_quantiles_matches_duckdb_disc(ray_session):
    import duckdb
    import ray.data as rd

    from raygraph.ops.relational import grouped_quantiles

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "g": rng.integers(0, 3, 5000).astype(str),
        "v": rng.integers(0, 10_000, 5000),
    })
    got = grouped_quantiles(rd.from_pandas(df).repartition(8), ["g"], "v") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    exp = duckdb.connect().execute(
        "SELECT g, quantile_disc(v, 0.5) AS p50, quantile_disc(v, 0.9) AS "
        "p90, quantile_disc(v, 0.99) AS p99 FROM df GROUP BY g ORDER BY g"
    ).fetchdf()
    for c in ("p50", "p90", "p99"):
        assert got[c].astype(int).tolist() == exp[c].astype(int).tolist()


def test_running_sum_matches_pandas_window(ray_session):
    import ray.data as rd

    from raygraph.ops.events import running_sum

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 6, 500),
        "ts": pd.to_datetime(rng.integers(0, 10**6, 500) * 10**6),
        "value": np.round(rng.random(500) * 100, 2),
        "event_id": np.arange(500),
    })
    got = running_sum(rd.from_pandas(df).repartition(5)).to_pandas()
    got = got.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    exp = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    exp["cum_value"] = exp.groupby("user_id")["value"].cumsum().round(4)
    assert np.allclose(got["cum_value"], exp["cum_value"])


def test_ngram_jaccard_topk(ray_session):
    import ray.data as rd

    from raygraph.ops.dedup import ngram_jaccard_topk

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over a lazy dog",   # near-dup
            "completely different content here now",
            "",                                            # empty
        ],
    })
    out = ngram_jaccard_topk(rd.from_pandas(docs), docs.text[0], k=10,
                             exclude_id=0)
    assert out.doc_id.tolist()[0] == 1          # near-dup ranks first
    # one word changed in 9 tokens: 4 of 10 distinct trigrams shared
    assert out.jaccard_bp.iloc[0] == 4000
    row3 = out[out.doc_id == 3].iloc[0]
    assert row3.n_inter == 0 and row3.jaccard_bp == 0
    # exact-integer contract
    assert (out.jaccard_bp ==
            (10_000 * out.n_inter) // out.n_union).all()


def test_connected_components_label_propagation(ray_session):
    import ray.data as rd

    from raygraph.ops.graph import connected_components

    # two chains (reachability must flow AGAINST edge direction too) and
    # an isolated pair
    edges = pa.table({
        "_from": ["b", "c", "d", "x", "y"],
        "pred": ["p"] * 5,
        "_to": ["a", "b", "c", "y", "z"],
    })
    cc = connected_components(rd.from_arrow(edges), iters=5).to_pandas()
    got = dict(zip(cc.vertex, cc.component))
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a",
                   "x": "x", "y": "x", "z": "x"}


def test_bfs_distance_directed_hops(ray_session):
    import ray.data as rd

    from raygraph.ops.graph import bfs_distance

    # chain a→b→c→d→e with shortcut a→c; (x,y) unreachable from a;
    # parallel edge (two predicates on a→b) must collapse to one arc
    edges = pa.table({
        "_from": ["a", "a", "b", "c", "d", "a", "x"],
        "pred":  ["p", "q", "p", "p", "p", "p", "p"],
        "_to":   ["b", "b", "c", "d", "e", "c", "y"],
    })
    out = bfs_distance(rd.from_arrow(edges).repartition(3), source="a",
                       iters=3).to_pandas()
    got = dict(zip(out.vertex, out.dist))
    # e is 3 hops via the shortcut (a→c→d→e); x,y unreached → dropped
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}

    # fewer rounds truncate the frontier but never mislabel
    out2 = bfs_distance(rd.from_arrow(edges), source="a",
                        iters=1).to_pandas()
    assert dict(zip(out2.vertex, out2.dist)) == {"a": 0, "b": 1, "c": 1}


def test_hll_error_bound_and_determinism(ray_session):
    import ray.data as rd

    from raygraph.ops.sketch import M, hll_distinct

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "g": rng.integers(0, 2, 60_000).astype(str),
        "u": rng.integers(0, 20_000, 60_000),
    })
    got = hll_distinct(rd.from_pandas(df).repartition(7), ["g"], "u") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    exact = df.groupby("g")["u"].nunique()
    for _, r in got.iterrows():
        est = r["approx_n_e4"] / 1e4
        # n >> M regime: 1.04/sqrt(64) ≈ 13% std error; 2.5σ bound
        assert abs(est - exact[r["g"]]) / exact[r["g"]] < 2.5 * 1.04 / M**0.5
    # integer spec ⇒ bit-identical at any block layout
    again = hll_distinct(rd.from_pandas(df).repartition(23), ["g"], "u") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    assert got.equals(again)


def test_kmv_exact_below_k_bound_above_and_determinism(ray_session):
    import ray.data as rd

    from raygraph.ops.sketch import kmv_distinct

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "g": np.where(rng.integers(0, 2, 50_000) == 0, "big", "small"),
        "u": rng.integers(0, 10_000, 50_000),
    })
    # "small" group: < k distinct values ⇒ the sketch IS the distinct
    # set and the count is exact
    df.loc[df["g"] == "small", "u"] = df.loc[df["g"] == "small", "u"] % 9
    got = kmv_distinct(rd.from_pandas(df).repartition(11), ["g"], "u",
                       k=64).to_pandas().set_index("g")["approx_n"]
    exact = df.groupby("g")["u"].nunique()
    assert got["small"] == exact["small"]
    # KMV std error ≈ 1/sqrt(k-2) ≈ 12.7% at k=64; 3σ bound
    assert abs(got["big"] - exact["big"]) / exact["big"] < 3 / (64 - 2) ** 0.5
    # set-union merge ⇒ bit-identical at any block layout
    again = kmv_distinct(rd.from_pandas(df).repartition(3), ["g"], "u",
                         k=64).to_pandas().set_index("g")["approx_n"]
    assert got.sort_index().equals(again.sort_index())


def test_shuffle_join_left_anti(ray_session):
    import ray.data as rd

    from raygraph.ops.relational import shuffle_join

    left = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4], "a": list("wxyz")}))
    right = rd.from_pandas(pd.DataFrame({"rk": [2, 4, 4]}))
    out = shuffle_join(left, right, on="k", right_on="rk",
                       how="left_anti").to_pandas()
    assert sorted(out["k"].tolist()) == [1, 3]


def test_grouped_rank_ties():
    import ray.data as rd

    from raygraph.ops.relational import grouped_rank

    tbl = pa.table({
        "nation": ["a", "a", "a", "b"],
        "cust": [1, 2, 3, 4],
        "rev": [100, 100, 50, 7],
    })
    out = grouped_rank(rd.from_arrow(tbl), ["nation"], "rev",
                       num_buckets=4).take_all()
    got = {r["cust"]: r["rnk"] for r in out}
    # SQL RANK(): ties share rank 1, next rank skips to 3
    assert got[1] == 1 and got[2] == 1 and got[3] == 3 and got[4] == 1


def test_interval_join_broadcast_overlap_and_drop():
    import datetime as dt

    import pandas as pd
    import ray.data as rd

    from raygraph.ops.relational import interval_join_broadcast

    t0 = dt.datetime(2024, 1, 1)
    big = rd.from_arrow(pa.table({
        "ts": pa.array([t0 + dt.timedelta(hours=h) for h in (0, 5, 30)],
                       pa.timestamp("us")),
        "v": [1, 2, 3],
    }))
    iv = pd.DataFrame({
        "name": ["x", "y"],
        "lo": [pd.Timestamp(t0), pd.Timestamp(t0)],
        "hi": [pd.Timestamp(t0 + dt.timedelta(hours=6)),
               pd.Timestamp(t0 + dt.timedelta(hours=1))],
    })
    rows = interval_join_broadcast(big, iv, "ts").take_all()
    got = sorted((r["v"], r["name"]) for r in rows)
    # v=1 is in both overlapping intervals (fan-out), v=2 only in x,
    # v=3 in none (dropped — inner semantics)
    assert got == [(1, "x"), (1, "y"), (2, "x")]


def test_cms_upper_bound_and_determinism(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.sketch import cms_estimate, cms_sketch

    # 50 distinct tokens, token i appears i+1 times
    toks = [f"tok{i}" for i in range(50) for _ in range(i + 1)]
    df = pd.DataFrame({"v": toks})
    sk = cms_sketch(rd.from_pandas(df).repartition(7), "v").to_pandas()
    est = cms_estimate(sk, [f"tok{i}" for i in range(50)])
    got = dict(zip(est["token"], est["cms_n"]))
    # CMS never under-counts, and with 150 cells vs 50 keys most
    # estimates are exact
    for i in range(50):
        assert got[f"tok{i}"] >= i + 1
    exact_hits = sum(got[f"tok{i}"] == i + 1 for i in range(50))
    assert exact_hits >= 40
    # block layout does not change the sketch
    sk2 = cms_sketch(rd.from_pandas(df).repartition(23), "v").to_pandas()
    a = sk.sort_values(["d", "bucket"]).reset_index(drop=True)
    b = sk2.sort_values(["d", "bucket"]).reset_index(drop=True)
    assert a.equals(b)


def test_heavy_hitters_exact_and_layout_invariant(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.sketch import heavy_hitters

    # zipf-ish stream: token i appears 2^(9-i) times for i in 0..9,
    # plus 200 singletons; n = 1023 + 200 = 1223
    toks = [f"t{i}" for i in range(10) for _ in range(2 ** (9 - i))]
    toks += [f"rare{j}" for j in range(200)]
    df = pd.DataFrame({"text": toks})

    def vals(batch):
        return batch.column("text").to_pandas()

    k = 10  # threshold n/k = 122.3 → t0(512), t1(256), t2(128) qualify
    exp = pd.Series(toks).value_counts()
    want = exp[exp * k > len(toks)]
    for parts in (3, 17):
        got = heavy_hitters(rd.from_pandas(df).repartition(parts),
                            k=k, values_fn=vals, out_key="token")
        assert list(got["token"]) == list(want.index)
        assert list(got["n"]) == [int(v) for v in want.values]

    # no item above threshold → empty frame with stable schema
    flat = rd.from_pandas(pd.DataFrame({"text": [f"u{j}" for j in
                                                 range(300)]}))
    got = heavy_hitters(flat, k=10, values_fn=vals, out_key="token")
    assert len(got) == 0 and list(got.columns) == ["token", "n"]


def test_bloom_semi_join_equals_plain_semi(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.relational import shuffle_join
    from raygraph.ops.sketch import bloom_semi_join

    big = rd.from_pandas(pd.DataFrame({"k": list(range(200)),
                                       "v": list(range(200))}))
    keys = rd.from_pandas(pd.DataFrame({"rk": [3, 7, 7, 150, 199, 512]}))
    got = sorted(r["k"] for r in bloom_semi_join(
        big, keys, on="k", right_on="rk").take_all())
    want = sorted(r["k"] for r in shuffle_join(
        big, keys, on="k", right_on="rk", how="left_semi").take_all())
    assert got == want == [3, 7, 150, 199]


def test_triangle_count_k4_plus_noise(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.graph import triangle_count

    vs = ["a", "b", "c", "d"]
    edges = [(vs[i], vs[j]) for i in range(4) for j in range(i + 1, 4)]
    edges += [("d", "a"),          # reverse duplicate of (a, d)
              ("e", "f"),          # edge in no triangle
              ("g", "g")]          # self-loop, must be ignored
    df = pd.DataFrame(edges, columns=["_from", "_to"])
    out = triangle_count(rd.from_pandas(df).repartition(3)).take_all()
    assert out[0]["n_triangles"] == 4          # K4 has C(4,3) triangles
    # layout invariance
    out2 = triangle_count(rd.from_pandas(df).repartition(7)).take_all()
    assert out2[0]["n_triangles"] == 4


def test_pivot_counts_fixed_schema(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.relational import pivot_counts

    df = pd.DataFrame({
        "u": [1, 1, 1, 2],
        "t": ["a", "a", "b", "b"],
    })
    out = pivot_counts(rd.from_pandas(df).repartition(3), ["u"], "t",
                       ["a", "b", "c"]).to_pandas()
    out = out.sort_values("u").reset_index(drop=True)
    # category c never appears but its column exists (fixed schema);
    # out-of-list values would be ignored
    assert list(out.columns) == ["u", "n_a", "n_b", "n_c"]
    assert out.loc[0].tolist() == [1, 2, 1, 0]
    assert out.loc[1].tolist() == [2, 0, 1, 0]


def test_cogroup_join_matches_shuffle_join(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.relational import cogroup_join, shuffle_join

    left = rd.from_pandas(pd.DataFrame(
        {"k": [1, 1, 2, 3, 5], "a": [10, 11, 20, 30, 50]}))
    right = rd.from_pandas(pd.DataFrame(
        {"rk": [1, 2, 2, 4], "b": ["x", "y", "z", "w"]}))

    got = cogroup_join(left, right, on="k", right_on="rk").to_pandas() \
        .sort_values(["k", "a", "b"]).reset_index(drop=True)
    want = shuffle_join(left, right, on="k", right_on="rk").to_pandas() \
        .sort_values(["k", "a", "b"]).reset_index(drop=True)
    assert got.equals(want[got.columns])          # incl. dtypes

    for how in ("left_semi", "left_anti"):
        g = sorted(cogroup_join(left, right, on="k", right_on="rk",
                                how=how).to_pandas()["k"])
        w = sorted(shuffle_join(left, right, on="k", right_on="rk",
                                how=how).to_pandas()["k"])
        assert g == w


def test_kcore_peels_tail(ray_session):
    import ray.data as rd

    from raygraph.ops.graph import kcore

    # triangle a-b-c (the 2-core) with a pendant chain c-d-e that peels
    # over two rounds; parallel/self edges must not inflate degrees
    edges = pa.table({
        "_from": ["a", "b", "c", "c", "d", "a", "a"],
        "pred":  ["p"] * 7,
        "_to":   ["b", "c", "a", "d", "e", "b", "a"],
    })
    out = kcore(rd.from_arrow(edges).repartition(3), k=2,
                iters=3).to_pandas()
    got = dict(zip(out.vertex, out.deg))
    assert got == {"a": 2, "b": 2, "c": 2}

    # one round only: e (deg 1) peels, d survives round 1 with deg 2
    out1 = kcore(rd.from_arrow(edges), k=2, iters=1).to_pandas()
    assert dict(zip(out1.vertex, out1.deg)) == {
        "a": 2, "b": 2, "c": 3, "d": 2}


def test_zorder_key_interleave(ray_session):
    import ray.data as rd

    from raygraph.ops.relational import zorder_key

    t = pa.table({"x": [0xFFFF, 0, 3, 0x1_0005],   # 0x1_0005: high bits masked
                  "y": [0, 0xFFFF, 1, 0]})
    out = zorder_key(rd.from_arrow(t), "x", "y").to_pandas()
    assert out.zkey.tolist() == [0x55555555, 0xAAAAAAAA, 7, 0x11]
    # locality: neighbors in both dims give nearby keys within a tile
    t2 = pa.table({"x": [100, 101], "y": [200, 200]})
    z2 = zorder_key(rd.from_arrow(t2), "x", "y").to_pandas().zkey
    assert (z2 // 65536).nunique() == 1


def test_clustering_coefficient_k4_and_path(ray_session):
    import ray.data as rd

    from raygraph.ops.graph import clustering_coefficient

    # K4 on a-d (every vertex: deg 3, 3 triangles, cc = 1.0) plus a
    # pendant path d-e-f (e: deg 2, no triangle → cc 0; d gains deg)
    edges = pa.table({
        "_from": ["a", "a", "a", "b", "b", "c", "d", "e"],
        "pred":  ["p"] * 8,
        "_to":   ["b", "c", "d", "c", "d", "d", "e", "f"],
    })
    out = clustering_coefficient(
        rd.from_arrow(edges).repartition(3)).to_pandas()
    got = {r.vertex: (r.deg, r.n_tri, r.cc_bp)
           for r in out.itertuples(index=False)}
    assert got["a"] == (3, 3, 10_000)
    assert got["b"] == (3, 3, 10_000)
    assert got["c"] == (3, 3, 10_000)
    # d: deg 4 (K4 + e), still 3 triangles: 2*3/(4*3) = 0.5
    assert got["d"] == (4, 3, 5_000)
    assert got["e"] == (2, 0, 0)
    assert "f" not in got                      # deg 1 → excluded


def test_hits_authorities_star(ray_session):
    import ray.data as rd

    from raygraph.ops.graph import hits_authorities

    # u1,u2,u3 → z (plus a parallel-predicate duplicate) and z → w:
    # hand-traced integer spec gives auth(z)=9, auth(w)=1 after 2 rounds
    edges = pa.table({
        "_from": ["u1", "u1", "u2", "u3", "z"],
        "pred":  ["p", "q", "p", "p", "p"],
        "_to":   ["z", "z", "z", "z", "w"],
    })
    out = hits_authorities(rd.from_arrow(edges).repartition(3),
                           iters=2).to_pandas()
    got = dict(zip(out.vertex, out.auth))
    # round 1: a = {z:3, w:1}, h = {u*:3, z:1}; round 2: a = {z:9, w:1}
    assert got == {"z": 9, "w": 1}


def test_sssp_weighted_min_parallel_edges(ray_session):
    import ray.data as rd

    from raygraph.ops.graph import sssp_distance

    # s->a (w 5 and 2: parallel edges min-collapse to 2), a->b (w 1),
    # s->b direct (w 9) — shortest s->b is 3 via a; c unreached
    edges = pa.table({
        "_from": ["s", "s", "a", "s", "c"],
        "_to":   ["a", "a", "b", "b", "c2"],
        "w":     [5, 2, 1, 9, 1],
    })
    out = sssp_distance(rd.from_arrow(edges).repartition(2),
                        source="s", iters=3).to_pandas()
    got = dict(zip(out.vertex, out.dist))
    assert got == {"s": 0, "a": 2, "b": 3}


def test_personalized_pagerank_mass_to_source(ray_session):
    import ray.data as rd

    from raygraph.ops.graph import SCALE, pagerank

    # star s -> a, s -> b; a and b are dangling (mass returns to s)
    edges = pa.table({"_from": ["s", "s"], "_to": ["a", "b"]})
    out = pagerank(rd.from_arrow(edges).repartition(2),
                   iters=2, personalize="s").to_pandas()
    got = dict(zip(out.vertex, out.rank_e12))
    # trace: r0 = {s: SCALE}; iter1: c(s) = SCALE//2 to a and b,
    # dang = 0 -> s: 15% SCALE, a = b = 85%·(SCALE//2)
    # iter2: c(s) = (15%SCALE)//2; dang = a+b returns to s
    base = (15 * SCALE) // 100
    a1 = (85 * (SCALE // 2)) // 100
    s2 = base + (85 * (0 + 2 * a1)) // 100
    a2 = (85 * (base // 2)) // 100
    assert got == {"s": s2, "a": a2, "b": a2}


def test_common_neighbors_topk_square(ray_session):
    # square a-b-c-d-a: diagonals (a,c) and (b,d) each share 2 common
    # neighbors and are non-adjacent; every adjacent pair is excluded
    import ray.data as rd

    from raygraph.ops.graph import common_neighbors_topk

    ed = rd.from_arrow(pa.table({
        "_from": ["a", "b", "c", "d", "a"],      # a-d listed reversed too:
        "_to":   ["b", "c", "d", "a", "d"],      # dup reverse edge collapses
    }))
    got = common_neighbors_topk(ed, k=10).to_pandas()
    assert list(map(tuple, got[["u", "v", "cn"]].to_numpy())) == [
        ("a", "c", 2), ("b", "d", 2)]


def test_common_neighbors_hub_cap_excludes_hub(ray_session):
    # star center e (degree 4) + edge a-b: with hub_cap=3 the center may
    # not witness, so no pair survives (a-b is adjacent, leaves via anti)
    import ray.data as rd

    from raygraph.ops.graph import common_neighbors_topk

    ed = rd.from_arrow(pa.table({
        "_from": ["e", "e", "e", "e", "a"],
        "_to":   ["a", "b", "c", "d", "b"],
    }))
    full = common_neighbors_topk(ed, k=100).to_pandas()
    assert len(full) == 5  # C(4,2) leaf pairs minus adjacent (a, b)

    capped = common_neighbors_topk(ed, k=100, hub_cap=3).to_pandas()
    assert len(capped) == 0


def test_skyline_max_two_phase(ray_session):
    # random points, many blocks: distributed result == brute force
    import ray.data as rd

    from raygraph.ops.relational import skyline_max

    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "id": np.arange(500),
        "x": rng.randint(0, 40, 500).astype("int64"),
        "y": rng.randint(0, 40, 500).astype("int64"),
    })
    ds = rd.from_pandas(df).repartition(8)
    got = skyline_max(ds, "x", "y").to_pandas().sort_values("id")

    x, y = df["x"].to_numpy(), df["y"].to_numpy()
    exp = [i for i in range(len(df))
           if not ((x >= x[i]) & (y >= y[i])
                   & ((x > x[i]) | (y > y[i]))).any()]
    assert got["id"].tolist() == exp


def test_grouped_mode_tie_break(ray_session):
    import ray.data as rd

    from raygraph.ops.relational import grouped_mode

    df = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 3,
        "v": ["x", "y", "y", "x", "q", "p", "q"],
    })
    got = grouped_mode(rd.from_pandas(df).repartition(3), ["g"], "v") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    # a: x=2, y=2 tie -> "x" (smallest); b: q=2 wins
    assert got["v"].tolist() == ["x", "q"]
    assert got["n"].tolist() == [2, 2]


def test_edge_support_counts(ray_session):
    # K4 on {a,b,c,d}: every edge lies in exactly 2 triangles; pendant
    # edge d-e (from the extra vertex) lies in none and is omitted
    import ray.data as rd

    from raygraph.ops.graph import edge_support

    ed = rd.from_arrow(pa.table({
        "_from": ["a", "a", "a", "b", "b", "c", "d"],
        "_to":   ["b", "c", "d", "c", "d", "d", "e"],
    }))
    sup, _, _, _ = edge_support(ed)
    df = sup.to_pandas()
    got = {(r.u, r.v): r.support for r in df.itertuples()}
    k4_edges = [("a", "b"), ("a", "c"), ("a", "d"),
                ("b", "c"), ("b", "d"), ("c", "d")]
    assert got == {e: 2 for e in k4_edges}


def test_edge_jaccard_k4_pendant(ray_session):
    # K4 edge {a,b}: s=2, deg 3+3-2-2=2 -> bp 10000. Edges at d (deg 4):
    # {a,d}: s=2, den 3+4-2-2=3 -> 6666. Pendant {d,e}: s=0,
    # den 4+1-2-0=3 -> 0 (kept, denominator positive).
    import ray.data as rd

    from raygraph.ops.graph import edge_jaccard

    ed = rd.from_arrow(pa.table({
        "_from": ["a", "a", "a", "b", "b", "c", "d"],
        "_to":   ["b", "c", "d", "c", "d", "d", "e"],
    }))
    df = edge_jaccard(ed).to_pandas()
    got = {(r.u, r.v): (r.support, r.jacc_bp) for r in df.itertuples()}
    assert got[("a", "b")] == (2, 10000)
    assert got[("a", "d")] == (2, 6666)
    assert got[("d", "e")] == (0, 0)
    assert len(got) == 7


def test_assortativity_star_is_minus_one(ray_session):
    # a star is perfectly disassortative: corr_bp == -10000 exactly
    import ray.data as rd

    from raygraph.ops.graph import degree_assortativity

    ed = rd.from_arrow(pa.table({
        "_from": ["hub", "hub", "hub"],
        "_to":   ["l1", "l2", "l3"],
    }))
    df = degree_assortativity(ed)
    assert df["n_rows"].tolist() == [6]
    assert df["corr_bp"].tolist() == [-10000]


def test_truss_peel_cascades(ray_session):
    # two triangles sharing edge {b,c}: with k=4 only {b,c} reaches
    # support 2 in round 1, and round 2 peels it too (its triangles are
    # gone) -> iteration matters; with k=3 every edge survives both
    # rounds (each sits in a triangle that stays intact)
    import ray.data as rd

    from raygraph.ops.graph import truss_edges

    ed = rd.from_arrow(pa.table({
        "_from": ["a", "a", "b", "b", "c"],
        "_to":   ["b", "c", "c", "d", "d"],
    }))
    one = truss_edges(ed, k=4, rounds=1).to_pandas()
    assert sorted(map(tuple, one[["u", "v"]].itertuples(index=False))) \
        == [("b", "c")]
    two = truss_edges(ed, k=4, rounds=2).to_pandas()
    assert len(two) == 0
    k3 = truss_edges(ed, k=3, rounds=2).to_pandas()
    assert sorted(map(tuple, k3[["u", "v"]].itertuples(index=False))) \
        == [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")]


def test_hash_greedy_walks_follow_successor(ray_session):
    import hashlib

    import ray.data as rd

    from raygraph.ops.graph import hash_greedy_walks

    ed = rd.from_arrow(pa.table({
        "_from": ["a", "a", "b", "c"],
        "_to":   ["b", "c", "c", "d"],
    }))
    out = hash_greedy_walks(ed, steps=3).to_pandas() \
        .set_index("vertex").sort_index()

    # replay the spec in pure Python
    und = {("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")}
    nbrs = {}
    for u, v in und:
        nbrs.setdefault(u, []).append(v)
        nbrs.setdefault(v, []).append(u)

    def hk(a, b):
        return int(hashlib.md5(f"{a}>{b}".encode()).hexdigest()[:15], 16)

    nxt = {v: min(ws, key=lambda w: (hk(v, w), w))
           for v, ws in nbrs.items()}
    for v in nbrs:
        w1 = nxt[v]; w2 = nxt[w1]; w3 = nxt[w2]
        row = out.loc[v]
        assert (row["w1"], row["w2"], row["w3"]) == (w1, w2, w3)


def test_four_cycles_known_graphs(ray_session):
    import ray.data as rd

    from raygraph.ops.graph import four_cycles

    def count(pairs):
        ed = rd.from_arrow(pa.table({
            "_from": [p[0] for p in pairs],
            "pred": ["p"] * len(pairs),
            "_to": [p[1] for p in pairs],
        }))
        return int(four_cycles(ed).to_pandas()["n_squares"].iloc[0])

    # triangle + pendants (the shared fixture graph): no 4-cycles
    assert count(sorted(PAIRS)) == 0
    # a plain 4-cycle
    assert count([("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]) == 1
    # K_{2,3}: C(2,2) * C(3,2) = 3 squares; direction/duplicates ignored
    k23 = [(u, v) for u in ("u1", "u2") for v in ("v1", "v2", "v3")]
    assert count(k23 + [("v1", "u1")]) == 3
    # wedge-free graph exercises the empty short-circuit
    assert count([("a", "b")]) == 0


def test_scc_coloring_resolves_pivot_sccs(ray_session):
    import ray.data as rd

    from raygraph.ops.graph import scc_coloring

    def run(pairs):
        ed = rd.from_arrow(pa.table({
            "_from": [p[0] for p in pairs],
            "pred": ["p"] * len(pairs),
            "_to": [p[1] for p in pairs],
        }))
        df = scc_coloring(ed, iters=5).to_pandas()
        return dict(zip(df["scc_id"], df["n_vertices"].astype(int)))

    # {a,b} is an SCC and a is globally minimal -> resolved with size 2;
    # {c,d} is an SCC but a reaches it (in-min a != out-min c) -> left
    # for the next coloring pass; f is a resolved singleton source; g is
    # reached by f -> unresolved
    got = run([("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"),
               ("d", "c"), ("f", "g")])
    assert got == {"a": 2, "f": 1}
    # a pure cycle resolves entirely into its min pivot
    got = run([("x", "y"), ("y", "z"), ("z", "x")])
    assert got == {"x": 3}


def test_bfs_path_counts_diamond(ray_session):
    import ray.data as rd

    from raygraph.ops.graph import bfs_path_counts

    # diamond s->a, s->b, a->t, b->t plus a longer detour t->z; two
    # shortest paths reach t, one reaches z (via the unique arc t->z)
    pairs = [("s", "a"), ("s", "b"), ("a", "t"), ("b", "t"), ("t", "z")]
    ed = rd.from_arrow(pa.table({
        "_from": [p[0] for p in pairs],
        "pred": ["p"] * len(pairs),
        "_to": [p[1] for p in pairs],
    }))
    out = bfs_path_counts(ed, source="s", iters=3).to_pandas()
    got = {r.vertex: (r.dist, r.n_paths) for r in out.itertuples()}
    assert got == {"s": (0, 1), "a": (1, 1), "b": (1, 1),
                   "t": (2, 2), "z": (3, 2)}


def test_adamic_adar_weights_and_antijoin(ray_session):
    import math

    import ray.data as rd

    from raygraph.ops.graph import adamic_adar_topk

    # path a-h-b plus h-c: apex h has deg 3; (a,b),(a,c),(b,c) each get
    # weight floor(1e6/ln(3)); (a,b) etc are non-adjacent; edge pairs
    # must be excluded
    pairs = [("h", "a"), ("h", "b"), ("h", "c")]
    ed = rd.from_arrow(pa.table({
        "_from": [p[0] for p in pairs],
        "pred": ["p"] * len(pairs),
        "_to": [p[1] for p in pairs],
    }))
    out = adamic_adar_topk(ed, k=10).to_pandas()
    got = {(r.u, r.v): r.aa_e6 for r in out.itertuples()}
    w3 = math.floor(1_000_000 / math.log(3))
    assert got == {("a", "b"): w3, ("a", "c"): w3, ("b", "c"): w3}


def test_mis_independent_and_maximal(ray_session):
    from raygraph.ops.graph import maximal_independent_set

    out = maximal_independent_set(_edges_ds(), iters=6).take_all()
    mis = {r["vertex"] for r in out}
    und_pairs = {(u, v) for u, v in PAIRS if u != v}
    und_pairs |= {(v, u) for u, v in und_pairs}
    # independence: no undirected arc inside the set
    assert not any((u, v) in und_pairs for u in mis for v in mis)
    # maximality after enough rounds: every vertex is in the MIS or
    # adjacent to a member
    verts = {u for p in PAIRS for u in p}
    for w in verts - mis:
        assert any((w, m) in und_pairs for m in mis)
    # deterministic: same priorities, same winners
    again = {r["vertex"]
             for r in maximal_independent_set(_edges_ds(),
                                              iters=6).take_all()}
    assert again == mis


def test_label_propagation_two_cliques(ray_session):
    import ray.data as rd
    from raygraph.ops.graph import label_propagation

    # two triangles joined by one bridge edge: LPA must keep them as
    # (at most) two communities covering all 6 vertices
    tbl = pa.table({
        "_from": ["a", "b", "c", "p", "q", "r", "c"],
        "_to":   ["b", "c", "a", "q", "r", "p", "p"],
    })
    out = label_propagation(rd.from_arrow(tbl), iters=2).take_all()
    assert sum(r["size"] for r in out) == 6
    assert 1 <= len(out) <= 2


def test_edge_diff_counts(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.graph import edge_diff_counts

    def edges(rows):
        return rd.from_arrow(pa.table({
            "_from": pa.array([r[0] for r in rows], pa.string()),
            "pred": pa.array([r[1] for r in rows], pa.string()),
            "_to": pa.array([r[2] for r in rows], pa.string()),
        }))

    old = edges([("a", "p", "b"), ("b", "p", "c"), ("a", "q", "c")])
    new = edges([("a", "p", "b"), ("b", "p", "c"), ("a", "q", "c"),
                 ("c", "p", "d"), ("d", "p", "e"), ("d", "r", "a")])
    got = {r["pred"]: r["n_added"]
           for r in edge_diff_counts(new, old).take_all()}
    assert got == {"p": 2, "r": 1}
    # empty diff short-circuits with a typed empty table
    same = edge_diff_counts(old, old)
    assert same.count() == 0
    assert set(same.schema().names) == {"pred", "n_added"}


def test_hdr_quantiles_error_bound_and_mergeability(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.sketch import _hdr_bucket, _hdr_lower, hdr_quantiles

    # lognormal-ish integers spanning 5 decades
    rng = np.random.RandomState(7)
    v = np.unique(np.concatenate([
        (10 ** rng.uniform(0, 5, 5000)).astype("int64"),
        np.arange(200),  # exercise the exact linear region
    ]))
    rng.shuffle(v)
    df = pd.DataFrame({"x": v})
    for parts in (2, 13):
        got = hdr_quantiles(rd.from_pandas(df).repartition(parts), "x",
                            q_pcts=(10, 50, 90, 99))
        for q, est in zip(got["q_pct"], got["est"]):
            exact = int(np.sort(v)[int(np.ceil(q * len(v) / 100)) - 1])
            assert est <= exact, (q, est, exact)
            assert exact - est <= max(1, exact / 128), (q, est, exact)

    # bucket ids are monotone and lower bounds decode exactly
    s = np.sort(v)
    b = _hdr_bucket(s, 7)
    assert (np.diff(b) >= 0).all()
    lo = _hdr_lower(b, 7)
    assert (lo <= s).all() and ((s - lo) <= np.maximum(1, s // 128)).all()
    # values below 2^7 are exact
    small = s[s < 128]
    assert (lo[: len(small)] == small).all()


def test_maximal_matching_valid_and_maximal(ray_session):
    import ray.data as rd

    from raygraph.ops.graph import maximal_matching

    # triangle a-b-c + pendant d-a + isolated pair x-y + self-loop z-z
    # + a parallel/reversed duplicate that must collapse
    tbl = pa.table({
        "_from": ["a", "b", "b", "c", "d", "x", "z"],
        "pred":  ["p"] * 7,
        "_to":   ["b", "a", "c", "a", "a", "y", "z"],
    })
    for parts in (1, 5):
        out = maximal_matching(rd.from_arrow(tbl).repartition(parts),
                               iters=4).take_all()
        eps = [r["u"] for r in out] + [r["v"] for r in out]
        # valid matching: endpoints pairwise distinct, canonical u < v
        assert len(eps) == len(set(eps))
        assert all(r["u"] < r["v"] for r in out)
        assert "z" not in eps  # self-loop is not a matchable edge
        # maximal: every real edge touches a matched vertex
        for u, v in [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d"),
                     ("x", "y")]:
            assert u in eps or v in eps, (u, v)
        # deterministic priorities -> x-y always matches itself
        assert {"x", "y"} <= set(eps)


def test_khop_sample_fanout_and_frontier(ray_session):
    import hashlib

    import ray.data as rd

    from raygraph.ops.graph import khop_sample

    # hub h -> n0..n4 (5 out-neighbors, fanout must prune to 3 by
    # md5 order); n0 -> m1, m2 feeds hop 2
    tbl = pa.table({
        "_from": ["h"] * 5 + ["n0", "n0"],
        "_to": [f"n{i}" for i in range(5)] + ["m1", "m2"],
    })
    got = khop_sample(rd.from_arrow(tbl).repartition(3), n_seeds=1,
                      fanout=3, hops=2).to_pandas()
    # seed = h (max out-degree)
    assert set(got["source"]) == {"h"}
    h1 = got[got["hop"] == 1]
    want = sorted((f"n{i}" for i in range(5)),
                  key=lambda t: hashlib.md5(t.encode()).hexdigest() + t)[:3]
    assert sorted(h1["v"]) == sorted(want)
    assert set(h1["u"]) == {"h"}
    # hop 2 expands only sampled hop-1 vertices; n0's children appear
    # iff n0 survived the fanout cut
    h2 = got[got["hop"] == 2]
    if "n0" in set(h1["v"]):
        assert set(h2["v"]) == {"m1", "m2"}
    else:
        assert len(h2) == 0
    # deterministic across block layouts
    again = khop_sample(rd.from_arrow(tbl).repartition(7), n_seeds=1,
                        fanout=3, hops=2).to_pandas()
    key = ["source", "hop", "u", "v"]
    assert got.sort_values(key, ignore_index=True).equals(
        again.sort_values(key, ignore_index=True))


def test_negative_sample_deterministic_no_self(ray_session):
    import ray.data as rd

    from raygraph.ops.relational import negative_sample

    ids = np.arange(50, dtype="int64")
    ds = rd.from_pandas(pd.DataFrame({"vec_id": ids}))
    got = negative_sample(ds, ids, k=4).to_pandas()
    assert len(got) == 200
    assert (got["neg_id"] != got["vec_id"]).all()          # no self pairs
    assert set(got["j"]) == {0, 1, 2, 3}
    assert got["neg_id"].isin(ids).all()
    again = negative_sample(ds.repartition(7), ids, k=4).to_pandas()
    key = ["vec_id", "j"]
    assert got.sort_values(key, ignore_index=True).equals(
        again.sort_values(key, ignore_index=True))
    import pytest as pt
    with pt.raises(ValueError, match=">= 2"):
        negative_sample(ds, ids[:1], k=2)


def test_negative_sample_stratified_never_positive(ray_session):
    import ray.data as rd

    from raygraph.ops.relational import negative_sample_stratified

    ids = np.arange(60, dtype="int64")
    labels = np.array([i % 3 for i in range(60)], dtype="int64")
    ds = rd.from_pandas(pd.DataFrame({"vec_id": ids, "label": labels}))
    got = negative_sample_stratified(ds, ids, labels, k=5).to_pandas()
    assert len(got) == 300
    lab_of = dict(zip(ids, labels))
    # the contract: a negative NEVER shares the anchor's label
    assert (got["neg_id"].map(lab_of).to_numpy()
            != got["label"].to_numpy()).all()
    again = negative_sample_stratified(ds.repartition(8), ids, labels,
                                       k=5).to_pandas()
    key = ["vec_id", "j"]
    assert got.sort_values(key, ignore_index=True).equals(
        again.sort_values(key, ignore_index=True))
    import pytest as pt
    with pt.raises(ValueError, match="empty complement"):
        negative_sample_stratified(ds, ids, np.zeros(60, dtype="int64"))


def test_betweenness_sampled_path_and_diamond(ray_session):
    import ray.data as rd

    from raygraph.ops.graph import betweenness_sampled

    # path with shortcut: only c carries dependency (a->c->d); b is on
    # no shortest path because of the a->c shortcut
    path = pa.table({"_from": ["a", "b", "c", "a"],
                     "_to": ["b", "c", "d", "c"]})
    got = betweenness_sampled(rd.from_arrow(path), n_seeds=1,
                              hops=3).to_pandas()
    bc = dict(zip(got["vertex"], got["bc_e6"]))
    assert bc == {"b": 0, "c": 1_000_000, "d": 0}

    # diamond a->{b,c}->d: two shortest paths split the dependency,
    # sigma division floors per term (1e6 + 0) * 1 // 2
    dia = pa.table({"_from": ["a", "a", "b", "c"],
                    "_to": ["b", "c", "d", "d"]})
    got = betweenness_sampled(rd.from_arrow(dia).repartition(3),
                              n_seeds=1, hops=2).to_pandas()
    bc = dict(zip(got["vertex"], got["bc_e6"]))
    # d is the backward-sweep init level at full hop depth — excluded,
    # exactly as the SQL unroll excludes del{hops}
    assert bc == {"b": 500_000, "c": 500_000}


def test_rpq_pairs_multiplicity_and_empty(ray_session):
    import ray.data as rd

    from raygraph.ops.graph import rpq_pairs

    # a -p-> b, a -p-> c, b -q-> z, c -q-> z  => (a, z) via 2 paths
    tbl = pa.table({
        "_from": ["a", "a", "b", "c", "a"],
        "pred":  ["p", "p", "q", "q", "q"],
        "_to":   ["b", "c", "z", "z", "b"],
    })
    got = rpq_pairs(rd.from_arrow(tbl).repartition(3),
                    ["p", "q"]).to_pandas()
    assert len(got) == 1
    assert (got.iloc[0]["src"], got.iloc[0]["dst"],
            got.iloc[0]["n_paths"]) == ("a", "z", 2)
    # three-step path over the same data: p then q then q -> none
    empty = rpq_pairs(rd.from_arrow(tbl), ["p", "q", "q"]).to_pandas()
    assert len(empty) == 0


def test_heavy_hitters_grouped_per_group_thresholds(ray_session):
    import ray.data as rd

    from raygraph.ops.sketch import heavy_hitters_grouped

    # group A: 'x' dominates (12/20); group B: uniform (no hitters at
    # k=3 except 'q' at 8/14)
    rows = ([("A", "x")] * 12 + [("A", f"a{i}") for i in range(8)]
            + [("B", "q")] * 8 + [("B", f"b{i}") for i in range(6)])
    df = pd.DataFrame(rows, columns=["g", "t"])

    def pairs(batch):
        return batch.to_pandas().rename(columns={"t": "token",
                                                 "g": "source"})

    for parts in (1, 5):
        got = heavy_hitters_grouped(
            rd.from_pandas(df).repartition(parts), k=3, pairs_fn=pairs,
            group_key="source", out_key="token")
        rec = set(map(tuple, got[["source", "token", "n"]]
                      .itertuples(index=False)))
        assert rec == {("A", "x", 12), ("B", "q", 8)}


def test_katz_matches_naive_integer_spec(ray_session):
    from raygraph.ops.graph import katz_centrality

    got = katz_centrality(_edges_ds(), iters=3, beta_den=5).to_pandas()
    got = dict(zip(got["vertex"], got["katz_e6"].astype(int)))

    verts = sorted({u for u, _ in PAIRS} | {v for _, v in PAIRS})
    x = {v: 10**6 for v in verts}
    for _ in range(3):
        s = collections.defaultdict(int)
        for u, v in PAIRS:
            s[v] += x[u]
        x = {v: 10**6 + s.get(v, 0) // 5 for v in verts}
    assert got == x
    # sinks with no in-arcs stay at exactly 1.0
    assert got["d"] == 10**6 and got["x"] == 10**6


def test_katz_deterministic_across_parallelism(ray_session):
    from raygraph.ops.graph import katz_centrality

    a = katz_centrality(_edges_ds(), iters=2).to_pandas() \
        .sort_values("vertex")
    b = katz_centrality(_edges_ds().repartition(7), iters=2).to_pandas() \
        .sort_values("vertex")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_wl_colors_matches_naive(ray_session):
    import hashlib

    from raygraph.ops.graph import wl_colors

    got = wl_colors(_edges_ds(), iters=2).to_pandas()
    got = dict(zip(got["color"], got["size"].astype(int)))

    und = {tuple(sorted(p)) for p in PAIRS if p[0] != p[1]}
    adj = collections.defaultdict(set)
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    c = {v: hashlib.md5(str(len(ns)).encode()).hexdigest()
         for v, ns in adj.items()}
    for _ in range(2):
        c = {v: hashlib.md5(
                (c[v] + "|" + ",".join(sorted(c[u] for u in adj[v])))
                .encode()).hexdigest()
             for v in adj}
    exp = collections.Counter(c.values())
    assert got == dict(exp)
    # triangle symmetry: b and the two pendant-free... b/c/d roles differ,
    # but the two degree-1 pendants d and x share a WL class of size 2
    assert 2 in got.values()


def test_wl_colors_distinguishes_star_from_path(ray_session):
    import ray.data as rd

    from raygraph.ops.graph import wl_colors

    star = rd.from_arrow(pa.table({
        "_from": ["h", "h", "h"], "_to": ["l1", "l2", "l3"]}))
    path = rd.from_arrow(pa.table({
        "_from": ["p1", "p2", "p3"], "_to": ["p2", "p3", "p4"]}))
    hs = wl_colors(star, iters=2).to_pandas()
    hp = wl_colors(path, iters=2).to_pandas()
    # star: hub class (1) + leaf class (3); path: ends (2) + middles (2)
    assert sorted(hs["size"]) == [1, 3]
    assert sorted(hp["size"]) == [2, 2]


def _md5w(u, v):
    import hashlib

    return int(hashlib.md5(f"{u}|{v}".encode()).hexdigest()[:15],
               16) % 1000000


def test_msf_matches_kruskal(ray_session):
    from raygraph.ops.graph import msf_boruvka

    got = msf_boruvka(_edges_ds(), iters=2, inner=3).to_pandas()
    got_set = {(r.u, r.v, int(r.w)) for r in got.itertuples()}

    # distinct md5 weights -> the MSF is unique, so Kruskal agrees
    und = sorted({tuple(sorted(p)) for p in PAIRS if p[0] != p[1]})
    wed = sorted(((u, v, _md5w(u, v)) for u, v in und),
                 key=lambda t: (t[2], t[0], t[1]))
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    exp = set()
    for u, v, w in wed:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            exp.add((u, v, w))
    assert got_set == exp
    # spanning: |V|-1 edges for one connected component
    verts = {x for p in und for x in p}
    assert len(got_set) == len(verts) - 1


def test_msf_deterministic_across_parallelism(ray_session):
    from raygraph.ops.graph import msf_boruvka

    a = msf_boruvka(_edges_ds(), iters=2).to_pandas() \
        .sort_values(["u", "v"]).reset_index(drop=True)
    b = msf_boruvka(_edges_ds().repartition(7), iters=2).to_pandas() \
        .sort_values(["u", "v"]).reset_index(drop=True)
    assert a.equals(b)


def test_msf_forest_on_disconnected_graph(ray_session):
    import ray.data as rd

    from raygraph.ops.graph import msf_boruvka

    ed = rd.from_arrow(pa.table({
        "_from": ["a", "b", "p", "q"],
        "_to": ["b", "c", "q", "r"]}))
    got = msf_boruvka(ed, iters=2).to_pandas()
    # two components of 3 vertices each -> 2+2 forest edges
    assert len(got) == 4


def test_msf_long_chain_converges_and_dedups(ray_session):
    import ray.data as rd

    from raygraph.ops.graph import msf_boruvka

    # a 24-vertex path: every edge is a bridge, so the forest must be
    # exactly the 23 path edges with NO duplicate picks across rounds
    names = [f"n{i:02d}" for i in range(24)]
    ed = rd.from_arrow(pa.table({
        "_from": names[:-1], "_to": names[1:]}))
    got = msf_boruvka(ed, iters=4, inner=4).to_pandas()
    assert len(got) == 23
    assert not got.duplicated(["u", "v"]).any()


def test_ivm_merge_matches_recompute_and_drops_empty_groups(ray_session):
    import ray.data as rd

    from raygraph.ops.relational import ivm_merge, preagg_sum

    base = pa.table({
        "k": ["a", "a", "b", "c"],
        "v": [10, 20, 5, 7],
    })
    ds = rd.from_arrow(base)
    view = preagg_sum(ds, ["k"], {"v": "v"}, counts="n")

    # delete BOTH b rows' worth?  b has one row: delete it -> group b
    # must vanish; insert a new d row
    dels = rd.from_arrow(pa.table({"k": ["b"], "v": [5]}))
    ins = rd.from_arrow(pa.table({"k": ["d", "a"], "v": [100, 1]}))
    got = ivm_merge(view, [(dels, -1), (ins, +1)], ["k"], ["v"],
                    count_col="n").to_pandas() \
        .sort_values("k").reset_index(drop=True)

    exp = pd.DataFrame({"k": ["a", "c", "d"], "v": [31, 7, 100],
                        "n": [3, 1, 1]})
    assert got[["k", "v", "n"]].astype({"v": "int64", "n": "int64"}) \
        .equals(exp.astype({"v": "int64", "n": "int64"}))


def test_ivm_merge_empty_delta_is_identity(ray_session):
    import ray.data as rd

    from raygraph.ops.relational import ivm_merge, preagg_sum

    ds = rd.from_arrow(pa.table({"k": ["x", "y", "x"], "v": [1, 2, 3]}))
    view = preagg_sum(ds, ["k"], {"v": "v"}, counts="n")
    got = ivm_merge(view, [], ["k"], ["v"], count_col="n") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    exp = view.to_pandas().sort_values("k").reset_index(drop=True)
    assert got[["k", "v", "n"]].equals(exp[["k", "v", "n"]])


def test_grid_clusters_two_blobs_and_noise(ray_session):
    import ray.data as rd

    from raygraph.ops.cluster import grid_clusters

    # two separated dense blobs + isolated noise points; vectors are
    # 2-D (extra dims unused by the op)
    vecs, ids = [], []
    for i in range(6):
        vecs.append([0.01 * i, 0.01])       # blob A, one cell each≈
        ids.append(i)
    for i in range(6):
        vecs.append([0.91 + 0.005 * i, 0.91])  # blob B (off the
        # cell edge: 0.9 in float32 is 0.89999997 -> cell 8)
        ids.append(100 + i)
    vecs.append([-0.9, -0.9])               # noise (cell count 1)
    ids.append(999)
    ds = rd.from_arrow(pa.table({
        "vec_id": ids,
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    }))
    got = grid_clusters(ds, cell_e6=100_000, minpts=3, iters=3) \
        .to_pandas().sort_values("cluster").reset_index(drop=True)
    # blob A spans cells 0:0 / ... within 0.00-0.05 -> one cell "0:0";
    # blob B at 0.9ish -> cell "9:9"; noise cell dropped (count 1 < 3)
    assert len(got) == 2
    assert int(got["n_points"].sum()) == 12


def test_grid_clusters_adjacent_cells_merge(ray_session):
    import ray.data as rd

    from raygraph.ops.cluster import grid_clusters

    # two neighboring cells, each core, must merge into one cluster
    vecs = [[0.05, 0.05]] * 4 + [[0.15, 0.05]] * 4
    ds = rd.from_arrow(pa.table({
        "vec_id": list(range(8)),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    }))
    got = grid_clusters(ds, cell_e6=100_000, minpts=3, iters=2) \
        .to_pandas()
    assert len(got) == 1
    assert int(got["n_cells"].iloc[0]) == 2
    assert int(got["n_points"].iloc[0]) == 8


def test_node2vec_walks_match_naive_replay(ray_session):
    import hashlib

    from raygraph.ops.graph import node2vec_walks

    got = node2vec_walks(_edges_ds(), n_seeds=2, hops=3).to_pandas()
    got = {(r.seed, int(r.step)): r.vertex for r in got.itertuples()}

    und = {tuple(sorted(p)) for p in PAIRS if p[0] != p[1]}
    adj = collections.defaultdict(set)
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    seeds = sorted(adj, key=lambda v: (-len(adj[v]), v))[:2]

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    exp = {}
    for s in seeds:
        prev, cur = "", s
        exp[(s, 0)] = s
        for step in range(1, 4):
            def key(x):
                if x == prev:
                    cls = "2"
                elif prev and x in adj.get(prev, ()):
                    cls = "0"
                else:
                    cls = "1"
                return cls + md5(f"{s}|{step}|{x}") + x
            nxt = min(adj[cur], key=key)
            exp[(s, step)] = nxt
            prev, cur = cur, nxt
    assert got == exp


def test_node2vec_prefers_dist1_over_return(ray_session):
    import ray.data as rd

    from raygraph.ops.graph import node2vec_walks

    # triangle a-b-c plus pendant b-e: any step out of a neighbor of b
    # must prefer a vertex adjacent to b (class 0) over returning to b
    ed = rd.from_arrow(pa.table({
        "_from": ["a", "b", "c", "b"],
        "_to": ["b", "c", "a", "e"]}))
    out = node2vec_walks(ed, n_seeds=1, hops=2).to_pandas() \
        .sort_values("step")
    walk = list(out["vertex"])
    assert walk[0] == "b"  # top degree
    if walk[1] in ("a", "c"):
        # from a (prev=b): c is adjacent to b -> class 0 beats return
        assert walk[2] != "b"


def test_bipartite_projection_counts_shared_contexts(ray_session):
    import ray.data as rd

    from raygraph.ops.graph import bipartite_projection

    ds = rd.from_arrow(pa.table({
        "l": ["u1", "u2", "u1", "u2", "u3", "u1", "u2", "u3"],
        "r": ["a", "a", "b", "b", "b", "c", "c", "c"],
    }))
    got = bipartite_projection(ds, "l", "r", max_right_degree=20,
                               min_shared=2).to_pandas() \
        .sort_values(["u", "v"]).reset_index(drop=True)
    # u1-u2 share a,b,c = 3; u1-u3 share b,c = 2; u2-u3 share b,c = 2
    exp = {("u1", "u2"): 3, ("u1", "u3"): 2, ("u2", "u3"): 2}
    assert {(r.u, r.v): int(r.n_shared)
            for r in got.itertuples()} == exp


def test_bipartite_projection_hub_cap_drops_hot_context(ray_session):
    import ray.data as rd

    from raygraph.ops.graph import bipartite_projection

    rows_l = [f"u{i}" for i in range(30)] + ["u1", "u2", "u1", "u2"]
    rows_r = ["hot"] * 30 + ["x", "x", "y", "y"]
    ds = rd.from_arrow(pa.table({"l": rows_l, "r": rows_r}))
    got = bipartite_projection(ds, "l", "r", max_right_degree=10,
                               min_shared=2).to_pandas()
    # the 30-degree hub is capped away; only u1-u2 via x,y remains
    assert len(got) == 1
    assert (got.iloc[0]["u"], got.iloc[0]["v"],
            int(got.iloc[0]["n_shared"])) == ("u1", "u2", 2)


def test_quantile_bin_equi_depth(ray_session):
    import ray.data as rd

    from raygraph.ops.relational import quantile_bin

    # 100 distinct values 0..99 into 10 bins -> each bin exactly 10
    ds = rd.from_arrow(pa.table({"v": list(range(100))}))
    got = quantile_bin(ds, "v", n_bins=10).to_pandas() \
        .sort_values("bin").reset_index(drop=True)
    assert list(got["n"]) == [10] * 10
    assert int(got["min_v"].iloc[0]) == 0
    assert int(got["max_v"].iloc[9]) == 99
    # contiguous, non-overlapping ranges
    assert (got["min_v"].iloc[1:].to_numpy()
            > got["max_v"].iloc[:-1].to_numpy()).all()


def test_quantile_bin_layout_invariant(ray_session):
    import ray.data as rd

    from raygraph.ops.relational import quantile_bin

    t = pa.table({"v": [i % 17 for i in range(300)]})
    a = quantile_bin(rd.from_arrow(t), "v", n_bins=4).to_pandas() \
        .sort_values("bin").reset_index(drop=True)
    b = quantile_bin(rd.from_arrow(t).repartition(7), "v", n_bins=4) \
        .to_pandas().sort_values("bin").reset_index(drop=True)
    assert a.equals(b)


def test_cascade_seeds_at_round_zero_and_monotone(ray_session):
    from raygraph.ops.graph import cascade_spread

    got = cascade_spread(_edges_ds(), n_seeds=2, p_pct=100,
                         rounds=3).to_pandas()
    by_round = got.groupby("round")["vertex"].apply(set).to_dict()
    # p=100: every reachable vertex activates at its BFS distance
    # from the seed set {a, b} (top out-degree)
    assert by_round[0] == {"a", "b"}
    assert by_round.get(1, set()) == {"c"}  # a->b/c, b->c; c fresh
    # no vertex activates twice
    assert not got.duplicated("vertex").any()


def test_cascade_zero_probability_spreads_nothing(ray_session):
    from raygraph.ops.graph import cascade_spread

    got = cascade_spread(_edges_ds(), n_seeds=2, p_pct=0,
                         rounds=3).to_pandas()
    assert set(got["round"]) == {0}
    assert len(got) == 2


def test_vertex_cover_covers_every_edge(ray_session):
    from raygraph.ops.graph import maximal_matching

    # cover = matched endpoints; verify the covering property on the
    # shared fixture graph
    m = maximal_matching(_edges_ds(), iters=3).to_pandas()
    cover = set(m["u"]) | set(m["v"])
    und = {tuple(sorted(p)) for p in PAIRS if p[0] != p[1]}
    assert all(u in cover or v in cover for u, v in und)


def test_personalized_pagerank_hand_computed():
    import ray.data as rd

    from raygraph.ops.graph import personalized_pagerank

    ed = rd.from_items([
        {"_from": "a", "_to": "b"},
        {"_from": "a", "_to": "c"},
        {"_from": "b", "_to": "c"},
    ])
    got = {r["vertex"]: r["ppr_e6"]
           for r in personalized_pagerank(ed, n_seeds=1, iters=2,
                                          alpha_den=5).take_all()}
    # seed = a (out-degree 2); r(a)=1e6
    # it1: S(b)=S(c)=500000 -> b=c=400000
    # it2: S(b)=500000, S(c)=500000+400000 -> b=400000, c=720000
    assert got == {"a": 1_000_000, "b": 400_000, "c": 720_000}


def test_personalized_pagerank_empty_graph():
    import ray.data as rd

    import pyarrow as _pa

    from raygraph.ops.graph import personalized_pagerank

    ed = rd.from_arrow(_pa.table({"_from": _pa.array([], _pa.string()),
                                  "_to": _pa.array([], _pa.string())}))
    out = personalized_pagerank(ed)
    assert out.count() == 0


def test_modularity_two_cliques():
    import ray.data as rd

    from raygraph.ops.graph import modularity

    # two triangles joined by one bridge: strong 2-community partition
    ed = rd.from_items([
        {"_from": a, "_to": b} for a, b in [
            ("a", "b"), ("b", "c"), ("a", "c"),
            ("x", "y"), ("y", "z"), ("x", "z"),
            ("c", "x"),
        ]])
    labels = rd.from_items(
        [{"vertex": v, "label": "L"} for v in "abc"]
        + [{"vertex": v, "label": "R"} for v in "xyz"])
    rows = {r["community"]: r for r in modularity(ed, labels).take_all()}
    # m=7; each side: e_in=3, d_sum=7 -> q = (1e6*3)//7 - (1e6*49)//196
    q = (1_000_000 * 3) // 7 - (1_000_000 * 49) // (4 * 49)
    assert rows["L"]["e_in"] == 3 and rows["L"]["d_sum"] == 7
    assert rows["L"]["q_term_e6"] == q == rows["R"]["q_term_e6"]
    # good partition: positive global modularity
    assert sum(r["q_term_e6"] for r in rows.values()) > 0


def test_modularity_single_community_is_zero():
    import ray.data as rd

    from raygraph.ops.graph import modularity

    ed = rd.from_items([{"_from": "a", "_to": "b"},
                        {"_from": "b", "_to": "c"}])
    labels = rd.from_items(
        [{"vertex": v, "label": "one"} for v in "abc"])
    rows = modularity(ed, labels).take_all()
    # all edges intra, d_sum = 2m: Q = 1e6 - 1e6 = 0
    assert len(rows) == 1 and rows[0]["q_term_e6"] == 0


def test_greedy_coloring_proper_and_total_on_small_graph():
    import ray.data as rd

    from raygraph.ops.graph import greedy_coloring

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"),
             ("y", "z"), ("x", "z"), ("c", "x")]
    ed = rd.from_items([{"_from": a, "_to": b} for a, b in edges])
    rows = {r["vertex"]: r["color"]
            for r in greedy_coloring(ed, iters=5).take_all()}
    # totality within 5 rounds on 7 vertices
    assert set(rows) == {"a", "b", "c", "d", "x", "y", "z"}
    # proper: adjacent vertices differ
    for a, b in edges:
        assert rows[a] != rows[b], (a, b)
    # triangle forces 3 colors
    assert len({rows["x"], rows["y"], rows["z"]}) == 3
    # greedy mex keeps colors small: <= max degree + 1 = 4
    assert max(rows.values()) <= 3


def test_greedy_coloring_prefix_is_proper():
    import ray.data as rd

    from raygraph.ops.graph import greedy_coloring

    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    ed = rd.from_items([{"_from": a, "_to": b} for a, b in edges])
    rows = {r["vertex"]: r["color"]
            for r in greedy_coloring(ed, iters=1).take_all()}
    # one round colors only the local priority minimum, with color 0
    assert len(rows) == 1 and set(rows.values()) == {0}


def test_mis_and_coloring_self_loop_only_graph():
    import ray.data as rd

    from raygraph.ops.graph import (greedy_coloring,
                                    maximal_independent_set)

    ed = rd.from_items([{"_from": "a", "_to": "a"},
                        {"_from": "b", "_to": "b"}])
    mis = {r["vertex"]: r["round"]
           for r in maximal_independent_set(ed, iters=2).take_all()}
    assert mis == {"a": 1, "b": 1}
    col = {r["vertex"]: r["color"]
           for r in greedy_coloring(ed, iters=2).take_all()}
    assert col == {"a": 0, "b": 0}


def test_target_encode_hand_case_and_layout(ray_session):
    import ray.data as rd

    from raygraph.ops.relational import target_encode

    df = pd.DataFrame({
        "cat": ["a"] * 4 + ["b"] * 2,
        "v": [1.0, 2.0, 3.0, 4.0, 10.0, 20.0],
    })
    got = target_encode(rd.from_pandas(df).repartition(3), ["cat"], "v",
                        m=10).set_index("cat")
    # global mean 40/6; enc(a) = (10e4*6 + 10*40e4) / (14*6) exact floor
    assert got.loc["a", "enc_e4"] == (100_000 * 6 + 10 * 400_000) // (14 * 6)
    assert got.loc["b", "enc_e4"] == (300_000 * 6 + 10 * 400_000) // (12 * 6)
    assert got.loc["a", "n"] == 4 and got.loc["b", "n"] == 2
    again = target_encode(rd.from_pandas(df).repartition(1), ["cat"], "v",
                          m=10).set_index("cat")
    assert got.equals(again)


def test_rrf_fuse_hand_case():
    from raygraph.ops.ann import rrf_fuse

    a = pd.DataFrame({"query_id": [1, 1, 1], "vec_id": [7, 8, 9],
                      "s": [0.9, 0.8, 0.7]})
    b = pd.DataFrame({"query_id": [1, 1, 1], "vec_id": [8, 7, 5],
                      "s": [100, 90, 80]})
    out = rrf_fuse([(a, "s"), (b, "s")], k=10).set_index("vec_id")
    import math
    w = lambda r: math.floor(1_000_000 / (60 + r))  # noqa: E731
    assert out.loc[7, "rrf_e6"] == w(1) + w(2)
    assert out.loc[8, "rrf_e6"] == w(2) + w(1)
    assert out.loc[9, "rrf_e6"] == w(3)
    assert out.loc[5, "rrf_e6"] == w(3)
    # ties (7 vs 8 equal) break by id ASC; singles by id after
    assert out.index.tolist() == [7, 8, 5, 9]
