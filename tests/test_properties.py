"""Property-based tests (hypothesis) for the deterministic kernels —
no Ray session needed."""

import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from raygraph.ops.canon import union_find
from raygraph.ops.dedup import (
    MinHasher,
    char_shingles,
    jaccard,
    simhash64,
    word_shingles,
)
from raygraph.ops.link import minted_key, normalize_surfaces
from raygraph.ops.text import token_count

names = st.text(alphabet="abcdefgh ", min_size=1, max_size=12)


@given(st.lists(st.tuples(names, names), max_size=50))
@settings(max_examples=50, deadline=None)
def test_union_find_properties(pairs):
    got = union_find(pairs)
    keys = {k for k, _ in pairs}
    # total over keys; canonical rep is itself canonical (idempotent)
    assert set(got) == keys
    for k, c in got.items():
        assert got[c] == c
        assert c <= k  # representative is the component min → ≤ any member
    # order-insensitivity
    assert union_find(list(reversed(pairs))) == got


@given(st.text(max_size=60))
@settings(max_examples=100, deadline=None)
def test_normalize_idempotent(s):
    once = normalize_surfaces(pd.Series([s], dtype=object)).iloc[0]
    twice = normalize_surfaces(pd.Series([once], dtype=object)).iloc[0]
    assert once == twice
    assert minted_key(once) == minted_key(once)


@given(st.text(min_size=1, max_size=200))
@settings(max_examples=100, deadline=None)
def test_shingles_deterministic_and_nonempty(t):
    a = set(char_shingles(t).tolist())
    b = set(char_shingles(t).tolist())
    assert a == b and len(a) >= 1
    w = set(word_shingles(t).tolist())
    assert len(w) >= 1


@given(st.text(min_size=20, max_size=200))
@settings(max_examples=30, deadline=None)
def test_minhash_identical_texts_agree(t):
    h = MinHasher(num_perm=32)
    assert (h.signature(t) == h.signature(t)).all()
    assert jaccard(set(char_shingles(t).tolist()),
                   set(char_shingles(t).tolist())) == 1.0


@given(st.lists(st.text(alphabet="ab cd\t\n", max_size=30), min_size=1,
                max_size=20))
@settings(max_examples=50, deadline=None)
def test_token_count_matches_split(texts):
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = token_count(batch).column("n_tokens").to_pylist()
    want = [len(t.split()) for t in texts]
    assert got == want


@given(st.lists(st.text(min_size=1, max_size=10), min_size=0, max_size=30))
@settings(max_examples=50, deadline=None)
def test_simhash_order_insensitive_for_sets(tokens):
    # simhash over a multiset of tokens is order-insensitive
    assert simhash64(tokens) == simhash64(list(reversed(tokens)))


def test_deterministic_sample_stable_across_block_layouts(ray_session):
    """The md5-keyed sample keeps the same rows regardless of block
    layout / parallelism — the property RNG-based sampling lacks."""
    import ray.data as rd
    import pyarrow as pa

    from raygraph.ops.relational import deterministic_sample

    tab = pa.table({"doc_id": list(range(500)),
                    "text": [f"t{i}" for i in range(500)]})
    a = deterministic_sample(rd.from_arrow(tab), 100)
    b = deterministic_sample(rd.from_arrow(tab).repartition(13), 100)
    ga = sorted(r["doc_id"] for r in a.take_all())
    gb = sorted(r["doc_id"] for r in b.take_all())
    assert ga == gb
    assert 20 <= len(ga) <= 90  # ~10% of 500, md5-binomial bounds


def test_group_topk_exact(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.relational import group_topk

    df = pd.DataFrame({
        "g": ["a"] * 5 + ["b"] * 3,
        "doc_id": list(range(8)),
        "score": [5, 9, 9, 1, 7, 2, 2, 8],
    })
    out = group_topk(rd.from_pandas(df).repartition(4), ["g"], "score",
                     k=2, tie_col="doc_id")
    got = {(r["g"], r["doc_id"]) for r in out.take_all()}
    # a: scores 9(id1), 9(id2) — tie broken by id; b: 8(id7), 2(id5)
    assert got == {("a", 1), ("a", 2), ("b", 7), ("b", 5)}


def test_profile_columns_nulls_and_layout(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.relational import profile_columns

    df = pd.DataFrame({
        "k": [3, 1, 2, None, 2, 10],          # numeric min/max, one null
        "s": ["b", None, "a", "a", "c", "b"],
    })
    expect = {
        # numeric compare: min 1, max 10 (lexicographic would say "10"<"2")
        "k": (6, 1, "1", "10", 4),
        "s": (6, 1, "a", "c", 3),
    }
    for parts in (1, 5):
        out = profile_columns(
            rd.from_pandas(df).repartition(parts), ["k", "s"])
        got = {
            r["column"]: (r["n_rows"], r["n_null"], r["min_v"],
                          r["max_v"], r["n_distinct"])
            for _, r in out.iterrows()
        }
        # pandas nullable float renders 1.0 — normalize ints for compare
        got = {c: (n, nn, mn.removesuffix(".0"), mx.removesuffix(".0"), nd)
               for c, (n, nn, mn, mx, nd) in got.items()}
        assert got == expect, got


def test_apply_changeset_semantics(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.relational import apply_changeset

    base = pd.DataFrame({"k": [1, 2, 3, 4], "v": [10, 20, 30, 40]})
    ch = pd.DataFrame({
        "k": [2, 3, 5, 9],
        "v": [0, 33, 55, 0],
        # update k=3, insert k=5, delete k=2, delete-missing k=9 (no-op)
        "op": ["delete", "upsert", "upsert", "delete"],
    })
    for parts in (1, 4):
        out = apply_changeset(
            rd.from_pandas(base).repartition(parts),
            rd.from_pandas(ch).repartition(parts), on="k")
        got = sorted((r["k"], r["v"]) for r in out.take_all())
        assert got == [(1, 10), (3, 33), (4, 40), (5, 55)], got


def test_salted_join_equivalent_on_skew(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.relational import salted_join

    # one pathological key (0) with 300 left rows; plain pandas merge is
    # the ground truth — salting must only re-route, never change rows
    left = pd.DataFrame({
        "k": [0] * 300 + list(range(1, 41)),
        "lv": list(range(340)),
    })
    right = pd.DataFrame({
        "k": [0, 0] + list(range(1, 61)),
        "rv": list(range(62)),
    })
    want = sorted(map(tuple, left.merge(right, on="k")
                      [["k", "lv", "rv"]].itertuples(index=False)))
    for hot in (None, [0]):
        out = salted_join(rd.from_pandas(left).repartition(5),
                          rd.from_pandas(right).repartition(3),
                          on="k", salt=4, hot_keys=hot)
        got = sorted((r["k"], r["lv"], r["rv"]) for r in out.take_all())
        assert got == want


def test_approx_heavy_keys_finds_dominant(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.relational import approx_heavy_keys

    df = pd.DataFrame({"k": [7] * 500 + [9] * 300 + list(range(100))})
    hot = approx_heavy_keys(rd.from_pandas(df).repartition(6), "k",
                            top=2)
    assert set(hot) == {7, 9}


def test_range_partition_layout_deterministic(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.relational import range_partition

    df = pd.DataFrame({"id": range(200), "v": [i % 37 for i in range(200)]})
    runs = []
    for parts in (1, 9):
        out = range_partition(rd.from_pandas(df).repartition(parts),
                              "v", n_tiles=4)
        runs.append(sorted((r["id"], r["tile"]) for r in out.take_all()))
    assert runs[0] == runs[1]
    # tiles are contiguous value ranges: max of tile t < min of tile t+1
    g = pd.DataFrame([{"tile": t, "v": v} for (_, t), (_, v) in
                      zip(runs[0], sorted((r["id"], r["v"]) for r in
                          rd.from_pandas(df).take_all()))])
    agg = g.groupby("tile")["v"].agg(["min", "max"]).sort_index()
    assert (agg["max"].to_numpy()[:-1] <= agg["min"].to_numpy()[1:]).all()


def test_ordered_prefix_sum_layout_deterministic(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.relational import ordered_prefix_sum

    rng = pd.Series(range(137))
    df = pd.DataFrame({"id": rng, "n": (rng * 7 + 3) % 13})
    # exclusive prefix in id order, single-threaded reference
    want = dict(zip(df["id"], df["n"].cumsum() - df["n"]))
    for parts, tiles in ((1, 1), (7, 4), (16, 5)):
        out = ordered_prefix_sum(rd.from_pandas(df).repartition(parts),
                                 "id", "n", n_tiles=tiles,
                                 out="prefix_before")
        got = {r["id"]: r["prefix_before"] for r in out.take_all()}
        assert got == want, (parts, tiles)


def test_pack_sequences_semantics(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.text import pack_sequences

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c", "d e", "f g h i", "j"],  # 3,2,4,1 tokens
    })
    out = {r["doc_id"]: (r["pack_id"], r["offset_in_pack"])
           for r in pack_sequences(rd.from_pandas(docs).repartition(3),
                                   budget=4, n_tiles=2).take_all()}
    # offsets 0,3,5,9 → packs 0,0,1,2; in-pack 0,3,1,1
    assert out == {1: (0, 0), 2: (0, 3), 3: (1, 1), 4: (2, 1)}


def test_set_op_distinct(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.relational import set_op_distinct

    left = pd.DataFrame({"a": ["x", "x", "y", "z", "z"],
                         "b": [1, 1, 2, 3, 3], "junk": range(5)})
    right = pd.DataFrame({"a": ["y", "w"], "b": [2, 9], "junk": [0, 0]})
    l = rd.from_pandas(left).repartition(3)
    r = rd.from_pandas(right).repartition(2)
    ex = sorted((row["a"], row["b"]) for row in
                set_op_distinct(l, r, ["a", "b"], op="except").take_all())
    assert ex == [("x", 1), ("z", 3)]
    it = sorted((row["a"], row["b"]) for row in
                set_op_distinct(l, r, ["a", "b"], op="intersect").take_all())
    assert it == [("y", 2)]


def test_table_checksum_layout_invariant(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.relational import table_checksum

    df = pd.DataFrame({"k": range(97), "s": [f"v{i%7}" for i in range(97)]})
    vals = []
    for parts in (1, 8):
        out = table_checksum(rd.from_pandas(df).repartition(parts),
                             ["k", "s"]).take_all()
        assert out[0]["n_rows"] == 97
        vals.append(out[0]["checksum"])
    assert vals[0] == vals[1]
    # any single-row change moves the checksum
    df2 = df.copy()
    df2.loc[50, "s"] = "CHANGED"
    out2 = table_checksum(rd.from_pandas(df2), ["k", "s"]).take_all()
    assert out2[0]["checksum"] != vals[0]


def test_ordered_prefix_sum_tie_cols(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.relational import ordered_prefix_sum

    # heavy ties on the order col; (order, tie) is the total order
    df = pd.DataFrame({"o": [5, 5, 5, 1, 1, 9],
                       "tie": [3, 1, 2, 2, 1, 1],
                       "n": [10, 20, 30, 40, 50, 60]})
    ref = df.sort_values(["o", "tie"]).reset_index(drop=True)
    want = dict(zip(zip(ref["o"], ref["tie"]),
                    ref["n"].cumsum() - ref["n"]))
    for parts in (1, 4):
        out = ordered_prefix_sum(rd.from_pandas(df).repartition(parts),
                                 "o", "n", n_tiles=3, tie_cols=("tie",))
        got = {(r["o"], r["tie"]): r["prefix_before"]
               for r in out.take_all()}
        assert got == want, parts


def test_ordered_prefix_sum_empty_input(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.relational import ordered_prefix_sum, range_boundaries

    empty = rd.from_pandas(pd.DataFrame({
        "id": pd.Series([], dtype="int64"),
        "n": pd.Series([], dtype="int64")}))
    assert range_boundaries(empty, "id", 4) == []
    assert ordered_prefix_sum(empty, "id", "n", n_tiles=4).take_all() == []


def test_grouped_corr_bp_exact(ray_session):
    import math

    import pandas as pd
    import ray.data as rd

    from raygraph.ops.relational import grouped_corr_bp

    df = pd.DataFrame({
        "g": ["a"] * 5 + ["b"] * 4 + ["c"] * 3,
        "x": [1, 2, 3, 4, 5, 1, 2, 3, 4, 7, 7, 7],
        "y": [2, 4, 6, 8, 10, 5, 3, 9, 1, 1, 2, 3],
    })
    out = grouped_corr_bp(rd.from_pandas(df).repartition(4), ["g"],
                          "x", "y").set_index("g")
    # group a: perfectly linear -> 10000; group c: zero x-variance ->
    # dropped (matches the oracle's WHERE)
    assert out.loc["a", "corr_bp"] == 10_000
    assert "c" not in out.index
    # group b: replay the formula independently
    x, y = [1, 2, 3, 4], [5, 3, 9, 1]
    n = 4
    sx, sy = sum(x), sum(y)
    num = n * sum(a * b for a, b in zip(x, y)) - sx * sy
    dx = n * sum(a * a for a in x) - sx * sx
    dy = n * sum(a * a for a in y) - sy * sy
    exp = math.floor(float(10_000 * num)
                     / math.sqrt(float(dx) * float(dy)))
    assert out.loc["b", "corr_bp"] == exp
    assert out.loc["b", "n_rows"] == 4


@given(st.integers(-10**17, 10**17), st.integers(1, 10**9))
@settings(max_examples=200, deadline=None)
def test_trunc_div_matches_sql_semantics(a, b):
    # DuckDB's // truncates toward zero (verified: (-7)//2 = -3)
    from raygraph.ops.relational import trunc_div

    import math

    assert int(trunc_div(a, b)) == math.trunc(a / b) \
        if abs(a) < 2**52 else True
    # exact check via integer arithmetic for the full range
    q = abs(a) // b
    assert int(trunc_div(a, b)) == (-q if a < 0 else q)


@given(st.lists(st.integers(0, 10**7), min_size=0, max_size=60),
       st.integers(1, 40))
@settings(max_examples=100, deadline=None)
def test_stream_merge_split_invariance(ts, cut):
    """Folding a sorted event stream in two chunks through the
    open-session state equals folding it in one chunk — the exactly-once
    core of ops/stream, independent of where the micro-batch boundary
    falls."""
    import numpy as np

    from raygraph.ops.stream import _merge_user

    gap = 500
    ts = sorted(t * 1000 for t in ts)   # µs-ish spacing
    one_c, one_s = _merge_user(None, np.array(ts, dtype="int64"), gap)

    k = min(cut, len(ts))
    c1, s1 = _merge_user(None, np.array(ts[:k], dtype="int64"), gap)
    if s1["session_start"] is None:
        state_row = None
        c_prefix = c1
    else:
        state_row = {"closed_cnt": s1["closed_cnt"],
                     "session_start": s1["session_start"],
                     "session_end": s1["session_end"],
                     "n_events": s1["n_events"]}
        c_prefix = c1
    c2, s2 = _merge_user(state_row, np.array(ts[k:], dtype="int64"), gap)

    def norm(closed, state):
        rows = [(c["session_id"], c["session_start"], c["session_end"],
                 c["n_events"]) for c in closed]
        return rows, (state["session_start"], state["session_end"],
                      state["n_events"], state["closed_cnt"])

    assert norm(c_prefix + c2, s2) == norm(one_c, one_s)


@given(st.integers(1, 1000), st.integers(1, 5000), st.integers(1, 10**6),
       st.integers(1, 10**4))
@settings(max_examples=200, deadline=None)
def test_bm25_integer_tf_norm_algebra(tf, dl, s_tot, n_docs):
    """22·tf·S/(10·tf·S+3·S+9·dl·N) is algebraically tf·(k1+1) /
    (tf + k1·(1−b+b·dl/avgdl)) for k1=1.2, b=0.75, avgdl=S/N."""
    avgdl = s_tot / n_docs
    ref = tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    got = (22 * tf * s_tot) / (10 * tf * s_tot + 3 * s_tot
                               + 9 * dl * n_docs)
    assert abs(ref - got) <= 1e-9 * max(1.0, abs(ref))


def test_snapshot_diff_statuses(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.relational import snapshot_diff

    base = pd.DataFrame({"k": [1, 2, 3, 4],
                         "v": ["a", "b", "c", "d"]})
    new = pd.DataFrame({"k": [2, 3, 4, 5],
                        "v": ["b", "X", "d", "e"]})
    for parts in (1, 4):
        out = snapshot_diff(rd.from_pandas(base).repartition(parts),
                            rd.from_pandas(new).repartition(parts),
                            "k", "v")
        got = sorted((r["k"], r["status"]) for r in out.take_all())
        assert got == [(1, "removed"), (2, "same"), (3, "changed"),
                       (4, "same"), (5, "added")], got


def test_ewma_tail_weighted_window(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.events import ewma_tail_weighted

    # user 1: 10 events valued 1..10 — only the last 8 count, newest
    # (v=10) gets weight 2^7; user 2: 2 events — short-tail weights
    # still anchor at 2^7 for the newest
    df = pd.DataFrame({
        "user_id": [1] * 10 + [2] * 2,
        "ts": list(range(10)) + [0, 1],
        "event_id": list(range(12)),
        "value_e4": list(range(1, 11)) + [7, 9],
    })
    expect_u1 = sum(v * (1 << (7 - j))
                    for j, v in enumerate([10, 9, 8, 7, 6, 5, 4, 3]))
    expect_u2 = 9 * (1 << 7) + 7 * (1 << 6)
    for parts in (1, 3):
        out = ewma_tail_weighted(rd.from_pandas(df).repartition(parts),
                                 window=8)
        got = {r["user_id"]: (r["n_events"], r["ews"])
               for r in out.take_all()}
        assert got == {1: (10, expect_u1), 2: (2, expect_u2)}, got


def test_interval_coverage_islands(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.events import interval_coverage

    # user 1: [0,10) ∪ [5,15) ∪ [7,17) merge to [0,17), then [30,40)
    # opens a second island → covered 17+10=27
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2],
        "ts_us": [0, 5, 7, 30, 100],
    })
    for parts in (1, 3):
        out = interval_coverage(rd.from_pandas(df).repartition(parts),
                                length_us=10)
        got = {r["user_id"]: (r["n_events"], r["n_islands"],
                              r["covered_us"])
               for r in out.take_all()}
        assert got == {1: (4, 2, 27), 2: (1, 1, 10)}, got


def test_cross_doc_ngram_stats_sharing(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.text import cross_doc_ngram_stats

    # docs 1 and 2 share the 3-gram "b c d"; doc 3 is disjoint; doc 4
    # too short for any 3-gram
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c d", "b c d e", "x y z w", "p q"],
    })
    for parts in (1, 4):
        out = cross_doc_ngram_stats(rd.from_pandas(df).repartition(parts),
                                    n=3)
        got = {r["doc_id"]: (r["n_grams"], r["n_shared"])
               for r in out.take_all()}
        assert got == {1: (2, 1), 2: (2, 1), 3: (2, 0)}, got


def _rand_events(n=400, users=17, seed=3):
    import numpy as np

    rng = np.random.RandomState(seed)
    ts = np.sort(rng.randint(0, 3 * 86_400, n)) * 1_000_000
    return pa.table({
        "user_id": pa.array(rng.randint(1, users, n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_id": pa.array(range(n), pa.int64()),
        "event_type": pa.array(
            [["view", "click", "purchase"][i] for i in
             rng.randint(0, 3, n)], pa.string()),
        "value": pa.array(rng.uniform(0, 50, n).round(2), pa.float64()),
    })


def test_twa_time_shift_invariant(ray_session):
    import pyarrow.compute as pc
    import ray.data as rd

    from raygraph.ops.events import time_weighted_avg

    t = _rand_events()
    base = time_weighted_avg(rd.from_arrow(t)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    shifted = t.set_column(
        t.schema.get_field_index("ts"), "ts",
        pc.add(t.column("ts").cast(pa.int64()),
               7 * 86_400 * 1_000_000).cast(pa.timestamp("us")))
    got = time_weighted_avg(rd.from_arrow(shifted)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    # gaps are translation-invariant, so the TWA must be identical
    pd.testing.assert_frame_equal(base, got)


def test_cusum_scales_linearly_with_count_duplication(ray_session):
    import ray.data as rd

    from raygraph.ops.events import cusum_changepoint

    t = _rand_events(n=300, seed=9)
    base = {r["event_type"]: (r["cusum_hour"], r["dstat"])
            for r in cusum_changepoint(rd.from_arrow(t)).take_all()}
    tripled = pa.concat_tables([t, t, t])
    got = {r["event_type"]: (r["cusum_hour"], r["dstat"])
           for r in cusum_changepoint(rd.from_arrow(tripled)).take_all()}
    # x -> 3x multiplies D_t by 3 and moves no argmax
    assert set(got) == set(base)
    for k, (hour, d) in base.items():
        assert got[k] == (hour, 3 * d)


def test_pair_hist_invariant_to_bucketing_and_layout(ray_session):
    import numpy as np
    import ray.data as rd

    from raygraph.ops.ann import pair_cosine_hist

    rng = np.random.RandomState(11)
    vecs = rng.randn(60, 6)
    t = pa.table({
        "vec_id": pa.array(range(60), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs]),
    })

    def hist(ds, **kw):
        df = pair_cosine_hist(ds, n_groups=5, **kw).to_pandas()
        return dict(zip(df["bin"].astype(int), df["n"].astype(int)))

    a = hist(rd.from_arrow(t))
    b = hist(rd.from_arrow(t).repartition(7), num_buckets=3)
    assert a == b  # block layout and bucket count are execution details


def test_adaptive_buckets_clamps_floor_to_cluster_width():
    from raygraph.ops.materialize import (DEFAULT_NUM_BUCKETS,
                                          ROWS_PER_BUCKET, adaptive_buckets)

    # unknown width keeps the legacy floor
    assert adaptive_buckets(None) == DEFAULT_NUM_BUCKETS
    assert adaptive_buckets(1000) == DEFAULT_NUM_BUCKETS
    # small cluster: floor drops to 4 waves worth of tasks, never below 16
    assert adaptive_buckets(1000, cluster_cpus=16) == 64
    assert adaptive_buckets(1000, cluster_cpus=4) == 16
    assert adaptive_buckets(1000, cluster_cpus=2) == 16
    # wide cluster never raises the floor above the legacy default
    assert adaptive_buckets(1000, cluster_cpus=512) == DEFAULT_NUM_BUCKETS
    # input volume still scales the count past any floor, capped at 4096
    big = 300 * ROWS_PER_BUCKET
    assert adaptive_buckets(big, cluster_cpus=4) == 300
    assert adaptive_buckets(10_000 * ROWS_PER_BUCKET, cluster_cpus=4) == 4096


@given(st.lists(st.integers(min_value=0, max_value=2**52), min_size=1,
                max_size=300))
@settings(max_examples=100, deadline=None)
def test_hdr_bucket_properties(vals):
    """Monotone bucket ids; lower bound <= value with < 2^-m relative
    gap; exact below 2^m — over arbitrary int distributions."""
    import numpy as np

    from raygraph.ops.sketch import _hdr_bucket, _hdr_lower

    v = np.sort(np.array(vals, dtype="int64"))
    b = _hdr_bucket(v, 7)
    assert (np.diff(b) >= 0).all()
    lo = _hdr_lower(b, 7)
    assert (lo <= v).all()
    assert ((v - lo) <= np.maximum(1, v // 128)).all()
    small = v < 128
    assert (lo[small] == v[small]).all()


@given(st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=400),
       st.integers(min_value=2, max_value=8))
@settings(max_examples=60, deadline=None)
def test_mg_compress_undercount_bound(stream, k):
    """Misra-Gries compress never over-counts and under-counts any key
    by at most n/(capacity+1) — the classic guarantee the two-pass
    heavy_hitters superset argument rests on."""
    import pandas as pd

    from raygraph.ops.sketch import _mg_compress

    s = pd.Series(stream)
    exact = s.value_counts()
    df = exact.rename_axis("token").reset_index(name="w")
    out = _mg_compress(df, capacity=k - 1)
    got = dict(zip(out["token"], out["w"]))
    assert len(out) <= k - 1
    for tok, w in got.items():
        assert w <= exact[tok]
        assert exact[tok] - w <= len(stream) // k
    # every key with true frequency > n/k survives the compress
    for tok, n in exact.items():
        if n * k > len(stream):
            assert tok in got and got[tok] >= 1


def test_hll_set_algebra_union_bounds(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.sketch import hll_set_algebra

    a = rd.from_arrow(pa.table({"v": list(range(0, 600))}))
    b = rd.from_arrow(pa.table({"v": list(range(400, 1000))}))
    got = hll_set_algebra(a, b, "v").iloc[0]
    # HLL at M=64 has ~13% std error; allow 3 sigma
    assert abs(int(got["a_e4"]) - 600 * 10_000) < 600 * 10_000 * 0.4
    assert abs(int(got["union_e4"]) - 1000 * 10_000) \
        < 1000 * 10_000 * 0.4
    # union estimate >= each side's estimate (register max dominance)
    assert int(got["union_e4"]) >= int(got["a_e4"])
    assert int(got["union_e4"]) >= int(got["b_e4"])
    # inclusion-exclusion identity holds exactly by construction
    assert int(got["intersect_e4"]) == (int(got["a_e4"])
                                        + int(got["b_e4"])
                                        - int(got["union_e4"]))


def test_hll_set_algebra_disjoint_small_intersection(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.sketch import hll_set_algebra

    a = rd.from_arrow(pa.table({"v": list(range(0, 500))}))
    b = rd.from_arrow(pa.table({"v": list(range(10_000, 10_500))}))
    got = hll_set_algebra(a, b, "v").iloc[0]
    # disjoint sets: intersect estimate must be small relative to |A|
    assert abs(int(got["intersect_e4"])) < int(got["a_e4"]) * 0.5


@given(st.lists(st.integers(0, 200), min_size=1, max_size=40),
       st.lists(st.tuples(st.integers(0, 200), st.integers(0, 40)),
                min_size=1, max_size=12),
       st.sampled_from([3, 10, 50]))
@settings(max_examples=15, deadline=None)
def test_interval_join_matches_bruteforce(ray_session, facts, ivs,
                                          tile_width):
    import ray.data as rd

    from raygraph.ops.relational import interval_join

    fds = rd.from_items([{"v": v} for v in facts])
    ids_ = rd.from_items([{"iid": i, "lo": lo, "hi": lo + ln}
                          for i, (lo, ln) in enumerate(ivs)])
    got = sorted((r["iid"], r["v"]) for r in interval_join(
        fds, ids_, value_col="v", lo_col="lo", hi_col="hi",
        interval_cols=["iid"], tile_width=tile_width).take_all())
    want = sorted((i, v) for v in facts
                  for i, (lo, ln) in enumerate(ivs)
                  if lo <= v < lo + ln)
    assert got == want


@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 9),
                          st.integers(0, 999)),
                min_size=1, max_size=60, unique_by=lambda t: t[2]),
       st.integers(1, 4))
@settings(max_examples=15, deadline=None)
def test_topk_per_group_matches_pandas(ray_session, rows, k):
    import ray.data as rd

    from raygraph.ops.relational import topk_per_group

    ds = rd.from_items([{"g": g, "v": v, "id": i}
                        for g, v, i in rows]).repartition(3)
    got = sorted((r["g"], r["v"], r["id"]) for r in
                 topk_per_group(ds, ["g"], "v", k=k,
                                tie_cols=["id"]).take_all())
    df = pd.DataFrame(rows, columns=["g", "v", "id"]) \
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
    want = sorted(map(tuple, df.groupby("g").head(k).to_numpy()))
    assert got == want


@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                min_size=1, max_size=20))
@settings(max_examples=10, deadline=None)
def test_greedy_coloring_always_proper(ray_session, pairs):
    import ray.data as rd

    from raygraph.ops.graph import greedy_coloring

    ed = rd.from_items([{"_from": f"v{a}", "_to": f"v{b}"}
                        for a, b in pairs])
    rows = {r["vertex"]: r["color"]
            for r in greedy_coloring(ed, iters=2).take_all()}
    for a, b in pairs:
        if a != b and f"v{a}" in rows and f"v{b}" in rows:
            assert rows[f"v{a}"] != rows[f"v{b}"], (a, b, rows)


def test_grouped_corr_bp_no_int64_wrap(ray_session):
    # per-row x*x here is ~9e18 > int64 max: the old int64 moment fold
    # silently wrapped (ADVICE r2); the limb-split fold must stay exact
    import math

    import pandas as pd
    import ray.data as rd

    from raygraph.ops.relational import grouped_corr_bp

    base = 3_000_000_000
    x = [base + i for i in range(12)]
    y = [2 * v + 7 for v in x]           # perfectly linear
    df = pd.DataFrame({"g": ["a"] * 12, "x": x, "y": y})
    out = grouped_corr_bp(rd.from_pandas(df).repartition(3),
                          ["g"], "x", "y").set_index("g")
    assert out.loc["a", "corr_bp"] == 10_000

    # non-degenerate big-value case replayed with Python big ints
    y2 = [v + (i * i) * 1_000_000 for i, v in enumerate(x)]
    df2 = pd.DataFrame({"g": ["b"] * 12, "x": x, "y": y2})
    out2 = grouped_corr_bp(rd.from_pandas(df2).repartition(4),
                           ["g"], "x", "y").set_index("g")
    n = 12
    sx, sy = sum(x), sum(y2)
    num = n * sum(a * b for a, b in zip(x, y2)) - sx * sy
    dx = n * sum(a * a for a in x) - sx * sx
    dy = n * sum(a * a for a in y2) - sy * sy
    exp = math.floor(float(10_000 * num)
                     / math.sqrt(float(dx) * float(dy)))
    assert out2.loc["b", "corr_bp"] == exp


def test_embedding_dim_stats_no_int64_wrap(ray_session, tmp_path):
    # per-row x*x here is ~9e24 >> int64: the old int64 moment fold
    # wrapped once the global Σx² passed ~3.7e5 normal rows; the
    # limb-split fold must replay the Python big-int moments exactly
    import importlib.util
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    spec = importlib.util.spec_from_file_location(
        "ray_entry_dimstats", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # 10k rows at |v|~10 ⇒ x ~ 1e7, Σx² ~ 1e18 (fits int64) but
    # n·Σx² ~ 1e22 — the finalize regime the old int64 pandas
    # arithmetic silently wrapped in
    rng = np.random.RandomState(2)
    vecs = (rng.randn(10_000, 4) * 10).astype(np.float32)
    pq.write_table(
        pa.table({"vec_id": list(range(len(vecs))),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))
    got = mod.queries()["embedding_dim_stats"](str(tmp_path)) \
        .to_pandas().set_index("dim").sort_index()

    x = np.trunc(vecs.astype(np.float64) * 1_000_000)
    for d in range(4):
        col = [int(v) for v in x[:, d]]
        n, s = len(col), sum(col)
        ss = sum(v * v for v in col)
        var = math.floor(float(n * ss - s * s) / float(n * n))
        assert int(got.loc[d, "s"]) == s
        assert int(got.loc[d, "ss"]) == ss
        assert int(got.loc[d, "var_e12"]) == var
