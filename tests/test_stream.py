"""Exactly-once invariant for the micro-batch streaming fold:
incremental sessionization over K time-ordered micro-batches must be
row-identical to the batch recomputation."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _events(n_users=7, n=400, seed=3):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 3 * 86_400 * 10**6, n))
    return pd.DataFrame({
        "user_id": rng.integers(0, n_users, n).astype("int64"),
        "ts": ts.astype("datetime64[us]"),
    })


def _norm(df):
    df = df.copy()
    for c in ("session_start", "session_end"):
        df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return sorted(map(tuple, df[["user_id", "session_id", "session_start",
                                 "session_end", "n_events"]]
                      .astype({"user_id": "int64", "session_id": "int64",
                               "n_events": "int64"})
                      .itertuples(index=False)))


def test_incremental_equals_batch_sessionize(ray_session):
    import ray.data as rd

    from raygraph.ops.events import sessionize
    from raygraph.ops.stream import sessionize_incremental

    df = _events()
    batch = sessionize(rd.from_pandas(df), gap_sec=1800).to_pandas()
    inc = sessionize_incremental(rd.from_pandas(df), n_micro_batches=4,
                                 gap_sec=1800).to_pandas()
    assert _norm(inc) == _norm(batch)


def test_incremental_single_batch_degenerate(ray_session):
    import ray.data as rd

    from raygraph.ops.events import sessionize
    from raygraph.ops.stream import sessionize_incremental

    df = _events(n_users=3, n=60, seed=9)
    batch = sessionize(rd.from_pandas(df), gap_sec=600).to_pandas()
    inc = sessionize_incremental(rd.from_pandas(df), n_micro_batches=1,
                                 gap_sec=600).to_pandas()
    assert _norm(inc) == _norm(batch)


def test_incremental_resume_from_checkpoint(ray_session, tmp_path):
    import os
    import shutil

    import ray.data as rd

    from raygraph.ops.events import sessionize
    from raygraph.ops.stream import sessionize_incremental

    df = _events(n_users=5, n=300, seed=17)
    full_dir = os.path.join(str(tmp_path), "full")
    ref = sessionize_incremental(rd.from_pandas(df), n_micro_batches=4,
                                 gap_sec=1800,
                                 state_dir=full_dir).to_pandas()

    # crash after round 1: only the first two complete rounds survive
    crash_dir = os.path.join(str(tmp_path), "crash")
    os.makedirs(crash_dir)
    for i in (0, 1):
        shutil.copytree(os.path.join(full_dir, f"round={i}"),
                        os.path.join(crash_dir, f"round={i}"))
    resumed = sessionize_incremental(rd.from_pandas(df), n_micro_batches=4,
                                     gap_sec=1800, state_dir=crash_dir,
                                     resume=True).to_pandas()
    assert _norm(resumed) == _norm(ref)

    # all rounds complete: resume reuses everything, still identical,
    # and still equals the batch recompute
    again = sessionize_incremental(rd.from_pandas(df), n_micro_batches=4,
                                   gap_sec=1800, state_dir=full_dir,
                                   resume=True).to_pandas()
    batch = sessionize(rd.from_pandas(df), gap_sec=1800).to_pandas()
    assert _norm(again) == _norm(ref) == _norm(batch)


def test_incremental_state_dir_on_file_url(ray_session, tmp_path):
    # the round-state checkpoints route through stateio, so state_dir
    # may be a shared-storage URL — the last persisted state in the
    # engine to gain this (every index/manifest/sidecar already had it).
    # Crash-resume through a file:// URL must be row-identical, and a
    # crashed attempt's UNMARKED partial round (stale parquet, no
    # _complete.json) must be invisible AND cleared on the rewrite.
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray.data as rd

    from raygraph.ops.stream import sessionize_incremental

    df = _events(n_users=5, n=300, seed=17)
    full_dir = os.path.join(str(tmp_path), "full")
    ref = sessionize_incremental(rd.from_pandas(df), n_micro_batches=4,
                                 gap_sec=1800,
                                 state_dir=full_dir).to_pandas()

    url_full = "file://" + os.path.join(str(tmp_path), "url_full")
    via_url = sessionize_incremental(rd.from_pandas(df),
                                     n_micro_batches=4, gap_sec=1800,
                                     state_dir=url_full).to_pandas()
    assert _norm(via_url) == _norm(ref)
    # rounds landed as plain dirs with the marker written
    plain = os.path.join(str(tmp_path), "url_full")
    assert sorted(os.listdir(plain)) == [f"round={i}" for i in range(4)]
    assert all(os.path.exists(os.path.join(plain, f"round={i}",
                                           "_complete.json"))
               for i in range(4))

    # crash after round 1, plus a stale partial at round=2: parquet
    # written, marker never landed — resume must redo round 2 from
    # scratch (no merge with the stale file) and match exactly
    crash = os.path.join(str(tmp_path), "crash")
    os.makedirs(crash)
    for i in (0, 1):
        shutil.copytree(os.path.join(plain, f"round={i}"),
                        os.path.join(crash, f"round={i}"))
    stale = os.path.join(crash, "round=2", "closed")
    os.makedirs(stale)
    pq.write_table(pa.table({"user_id": pa.array([999], pa.int64())}),
                   os.path.join(stale, "stale.parquet"))
    resumed = sessionize_incremental(
        rd.from_pandas(df), n_micro_batches=4, gap_sec=1800,
        state_dir="file://" + crash, resume=True).to_pandas()
    assert _norm(resumed) == _norm(ref)
    assert 999 not in set(resumed["user_id"])
    assert not os.path.exists(os.path.join(stale, "stale.parquet"))


def test_distinct_count_incremental_resume(ray_session, tmp_path):
    import os
    import shutil

    import ray.data as rd

    from raygraph.ops.relational import distinct_count
    from raygraph.ops.stream import distinct_count_incremental

    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "event_type": rng.choice(["a", "b", "c"], 500),
        "user_id": rng.integers(0, 40, 500).astype("int64"),
        "ts": np.sort(rng.integers(0, 10**9, 500)).astype("datetime64[us]"),
    })

    def norm(d):
        return sorted(map(tuple, d[["event_type", "n_users"]]
                          .astype({"n_users": "int64"})
                          .itertuples(index=False)))

    ref = distinct_count(rd.from_pandas(df), ["event_type"], "user_id",
                         out="n_users").to_pandas()
    full_dir = os.path.join(str(tmp_path), "full")
    inc = distinct_count_incremental(rd.from_pandas(df), 4,
                                     state_dir=full_dir).to_pandas()
    assert norm(inc) == norm(ref)

    crash_dir = os.path.join(str(tmp_path), "crash")
    os.makedirs(crash_dir)
    shutil.copytree(os.path.join(full_dir, "round=0"),
                    os.path.join(crash_dir, "round=0"))
    resumed = distinct_count_incremental(
        rd.from_pandas(df), 4, state_dir=crash_dir,
        resume=True).to_pandas()
    assert norm(resumed) == norm(ref)


def test_tumbling_incremental_equivalence_and_bounded_state(
        ray_session, tmp_path):
    import os
    import shutil

    import ray.data as rd

    from raygraph.ops.stream import tumbling_counts_incremental

    rng = np.random.default_rng(11)
    n = 600
    df = pd.DataFrame({
        "event_type": rng.choice(["a", "b", "c"], n),
        "ts": np.sort(rng.integers(0, 2 * 86_400 * 10**6, n))
            .astype("datetime64[us]"),
        "value_e4": rng.integers(-500, 500, n).astype("int64"),
    })

    # batch ground truth: plain pandas groupby
    us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    ref = df.assign(window_start=(us // 3_600_000_000) * 3600) \
        .groupby(["window_start", "event_type"], as_index=False) \
        .agg(n=("value_e4", "size"), sum_e4=("value_e4", "sum"))

    def norm(d):
        return sorted(map(tuple,
                          d[["window_start", "event_type", "n", "sum_e4"]]
                          .astype({"window_start": "int64", "n": "int64",
                                   "sum_e4": "int64"})
                          .itertuples(index=False)))

    full_dir = os.path.join(str(tmp_path), "full")
    inc = tumbling_counts_incremental(rd.from_pandas(df), 4,
                                      window_sec=3600,
                                      state_dir=full_dir).to_pandas()
    assert norm(inc) == norm(ref)

    # bounded state: every checkpointed round keeps at most the
    # boundary-straddling window per type (<= #types open rows)
    import pyarrow.parquet as pq

    for i in range(3):  # last round keeps residual state by design
        sd = os.path.join(full_dir, f"round={i}", "state")
        files = [os.path.join(sd, f) for f in os.listdir(sd)
                 if f.endswith(".parquet")] if os.path.isdir(sd) else []
        open_rows = sum(pq.read_table(f).num_rows for f in files)
        assert open_rows <= 3, (i, open_rows)

    # crash after round 1 → resume is byte-identical
    crash_dir = os.path.join(str(tmp_path), "crash")
    os.makedirs(crash_dir)
    for i in (0, 1):
        shutil.copytree(os.path.join(full_dir, f"round={i}"),
                        os.path.join(crash_dir, f"round={i}"))
    resumed = tumbling_counts_incremental(rd.from_pandas(df), 4,
                                          window_sec=3600,
                                          state_dir=crash_dir,
                                          resume=True).to_pandas()
    assert norm(resumed) == norm(ref)


def test_asof_incremental_equivalence_bounded_state_and_resume(
        ray_session, tmp_path):
    import os
    import shutil

    import ray.data as rd

    from raygraph.ops.events import asof_join
    from raygraph.ops.stream import asof_join_incremental

    rng = np.random.default_rng(5)
    n = 500
    left = pd.DataFrame({
        "user_id": rng.integers(0, 9, n).astype("int64"),
        "ts": np.sort(rng.integers(0, 86_400 * 10**6, n))
            .astype("datetime64[us]"),
        "value": rng.uniform(0, 10, n).round(3),
    })
    # unique (user, ts) right side: every 7th left row, value bumped
    right = left.iloc[::7].drop_duplicates(["user_id", "ts"]) \
        .assign(value=lambda d: d["value"] + 100).reset_index(drop=True)

    def norm(d):
        d = d.copy()
        for c in ("ts", "ts_matched"):
            d[c] = pd.to_datetime(d[c]).astype("datetime64[us]") \
                .astype("int64", errors="ignore")
        return sorted(map(tuple, d[["user_id", "ts", "value",
                                    "value_matched", "ts_matched"]]
                          .fillna(-1).itertuples(index=False)))

    ref = asof_join(rd.from_pandas(left),
                    rd.from_pandas(right)).to_pandas()

    full_dir = os.path.join(str(tmp_path), "full")
    inc = asof_join_incremental(rd.from_pandas(left),
                                rd.from_pandas(right), 4,
                                state_dir=full_dir).to_pandas()
    assert norm(inc) == norm(ref)

    # bounded state: at most one carried right row per key
    import pyarrow.parquet as pq

    for i in range(4):
        sd = os.path.join(full_dir, f"round={i}", "state")
        files = [os.path.join(sd, f) for f in os.listdir(sd)
                 if f.endswith(".parquet")] if os.path.isdir(sd) else []
        if files:
            st = pd.concat([pq.read_table(f).to_pandas() for f in files])
            assert st["u"].is_unique

    # crash after round 1 → resume reproduces the batch rows exactly
    crash_dir = os.path.join(str(tmp_path), "crash")
    os.makedirs(crash_dir)
    for i in (0, 1):
        shutil.copytree(os.path.join(full_dir, f"round={i}"),
                        os.path.join(crash_dir, f"round={i}"))
    resumed = asof_join_incremental(rd.from_pandas(left),
                                    rd.from_pandas(right), 4,
                                    state_dir=crash_dir,
                                    resume=True).to_pandas()
    assert norm(resumed) == norm(ref)


def test_heavy_hitters_incremental_matches_batch_and_resumes(
        ray_session, tmp_path):
    import os
    import shutil

    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.sketch import heavy_hitters
    from raygraph.ops.stream import heavy_hitters_incremental

    # zipf-ish: token ti appears 2^(8-i) times, plus 150 singletons
    toks = [f"t{i}" for i in range(9) for _ in range(2 ** (8 - i))]
    toks += [f"r{j}" for j in range(150)]
    rng = np.random.default_rng(3)
    rng.shuffle(toks)
    df = pd.DataFrame({"doc_id": range(len(toks)), "text": toks})

    def vals(batch: pa.Table):
        return batch.column("text").to_pandas()

    ref = heavy_hitters(rd.from_pandas(df), k=8, values_fn=vals)
    full_dir = os.path.join(str(tmp_path), "full")
    inc = heavy_hitters_incremental(rd.from_pandas(df).repartition(6),
                                    k=8, values_fn=vals,
                                    n_micro_batches=4,
                                    state_dir=full_dir)
    assert inc.equals(ref)
    assert len(ref) >= 2  # the fixture actually has hitters

    # crash after round 1 -> resume completes identically
    crash_dir = os.path.join(str(tmp_path), "crash")
    os.makedirs(crash_dir)
    for r in ("round=0", "round=1"):
        shutil.copytree(os.path.join(full_dir, r),
                        os.path.join(crash_dir, r))
    resumed = heavy_hitters_incremental(
        rd.from_pandas(df).repartition(6), k=8, values_fn=vals,
        n_micro_batches=4, state_dir=crash_dir, resume=True)
    assert resumed.equals(ref)


def _ivm_parts(n=60):
    import pyarrow as pa
    import ray.data as rd

    base = pa.table({
        "k": [f"g{i % 5}" for i in range(n)],
        "v": [i for i in range(n)],
    })
    ds = rd.from_arrow(base)
    return base, ds


def test_ivm_incremental_equals_batch(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.relational import ivm_merge, preagg_sum
    from raygraph.ops.stream import ivm_incremental

    _, ds = _ivm_parts()
    view = preagg_sum(ds, ["k"], {"v": "v"}, counts="n")
    schema = pa.schema([("k", pa.string()), ("v", pa.int64()),
                        ("n", pa.int64())])

    def sel(residue):
        import pyarrow.compute as pc

        def fn(b):
            vv = b.column("v").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(vv % 3 == residue))
        return fn

    rounds = [[(ds.map_batches(sel(r), batch_format="pyarrow"), -1)]
              for r in range(3)]  # delete everything over 3 rounds
    ins = rd.from_arrow(pa.table({"k": ["g0", "zz"], "v": [7, 9]}))
    rounds[1].append((ins, +1))

    inc = ivm_incremental(view, rounds, ["k"], ["v"], schema,
                          count_col="n").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    bat = ivm_merge(view,
                    [(r_ds, sign) for rnd in rounds
                     for r_ds, sign in rnd],
                    ["k"], ["v"], count_col="n").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert inc[["k", "v", "n"]].equals(bat[["k", "v", "n"]])
    # after full deletion only the inserted rows survive
    assert set(inc["k"]) == {"g0", "zz"}


def test_ivm_incremental_resume_byte_identical(ray_session, tmp_path):
    import pyarrow as pa

    from raygraph.ops.relational import preagg_sum
    from raygraph.ops.stream import ivm_incremental

    _, ds = _ivm_parts()
    view = preagg_sum(ds, ["k"], {"v": "v"}, counts="n")
    schema = pa.schema([("k", pa.string()), ("v", pa.int64()),
                        ("n", pa.int64())])

    def sel(residue):
        def fn(b):
            vv = b.column("v").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(vv % 5 == residue))
        return fn

    def mk_rounds():
        # delete residues 0-3 over 4 rounds; residue-4 rows survive
        return [[(ds.map_batches(sel(r), batch_format="pyarrow"), -1)]
                for r in range(4)]

    d1 = str(tmp_path / "full")
    full = ivm_incremental(view, mk_rounds(), ["k"], ["v"], schema,
                           count_col="n", state_dir=d1).to_pandas() \
        .sort_values("k").reset_index(drop=True)

    # simulate a crash after round 1: run a fresh state dir, delete the
    # later rounds' markers, then resume
    import os
    import shutil

    d2 = str(tmp_path / "crash")
    ivm_incremental(view, mk_rounds(), ["k"], ["v"], schema,
                    count_col="n", state_dir=d2)
    for r in (2, 3):
        shutil.rmtree(os.path.join(d2, f"round={r}"))
    resumed = ivm_incremental(view, mk_rounds(), ["k"], ["v"], schema,
                              count_col="n", state_dir=d2,
                              resume=True).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert resumed.equals(full)
