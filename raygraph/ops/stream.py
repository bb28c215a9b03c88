"""Stateful micro-batch streaming over Ray Data.

The reference's consumer loop drains server batches through bounded
channels (src/graph_loader.rs:379-460); this module is the engine-side
analog for INCREMENTAL processing: a time-ordered stream of micro-batches
folds into a persistent per-key state Dataset, emitting finalized results
as they close. The invariant (tested) is exactly-once equivalence: the
union of emitted results after the last micro-batch is identical to the
batch recomputation over the whole input.

Scale shape: state is a DATASET (one row per open key), merged with each
micro-batch in one key-hash `hash_aggregate` whose reduce sees the key's
open state + its new events only — nothing user- or event-sized touches
the driver; micro-batch boundaries come from exact ts range tiles
(`range_boundaries`), so the split is layout-deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MERGE_SCHEMA = pa.schema([
    ("user_id", pa.int64()),
    ("kind", pa.string()),          # 'ev' | 'open' | 'closed'
    ("ts", pa.timestamp("us")),     # event rows only
    ("session_id", pa.int64()),     # closed rows only
    ("session_start", pa.timestamp("us")),
    ("session_end", pa.timestamp("us")),
    ("n_events", pa.int64()),
    ("closed_cnt", pa.int64()),     # open rows only: sessions closed so far
])


def _empty_merge_table() -> pa.Table:
    return _MERGE_SCHEMA.empty_table()


def _us(v) -> int:
    """any timestamp scalar -> int64 microseconds since epoch."""
    return int(np.datetime64(v, "us").astype("int64"))


def _ts(us: int):
    return np.datetime64(int(us), "us")


def _merge_user(state_row, ts_us: np.ndarray, gap_us: int):
    """Fold one user's new (sorted int64-µs) event times into its
    open-session state; returns (closed_session_dicts, new_state_dict).
    Continue-session rule is diff <= gap (strictly-greater gaps split),
    mirroring the batch sessionize / SQL-window contract."""
    closed = []
    if state_row is not None:
        closed_cnt = int(state_row["closed_cnt"])
        cur_start = _us(state_row["session_start"])
        cur_last = _us(state_row["session_end"])
        cur_n = int(state_row["n_events"])
    else:
        closed_cnt, cur_start, cur_last, cur_n = 0, None, None, 0

    for t in ts_us:
        t = int(t)
        if cur_start is None:
            cur_start, cur_last, cur_n = t, t, 1
        elif t - cur_last <= gap_us:
            cur_last, cur_n = t, cur_n + 1
        else:
            closed.append({"session_id": closed_cnt,
                           "session_start": _ts(cur_start),
                           "session_end": _ts(cur_last),
                           "n_events": cur_n})
            closed_cnt += 1
            cur_start, cur_last, cur_n = t, t, 1
    state = {"closed_cnt": closed_cnt,
             "session_start": None if cur_start is None else _ts(cur_start),
             "session_end": None if cur_last is None else _ts(cur_last),
             "n_events": cur_n}
    return closed, state


def _round_dir(state_dir: str, i: int) -> str:
    from raygraph import stateio

    return stateio.join(state_dir, f"round={i}")


def _round_complete(state_dir: str, i: int) -> bool:  # noqa: D103
    from raygraph import stateio

    return stateio.exists(
        stateio.join(_round_dir(state_dir, i), "_complete.json"))


def _write_round(state_dir: str, i: int, state, closed) -> None:
    """Persist a micro-batch round: state + closed parquet, then the
    completion marker LAST (the write-then-commit order that makes a
    crash mid-round indistinguishable from the round never running).

    All IO routes through :mod:`raygraph.stateio`, so ``state_dir`` may
    be a shared-storage URL (file://, s3://, …) like every other
    persisted index/manifest in the engine. The marker is a single
    JSON object (atomic PUT on object stores — no rename needed);
    a crashed attempt's partial parquet is cleared before the rewrite,
    because Ray's write filenames are unique per run and a bare
    re-write would silently merge stale files into the retried round.
    """
    from raygraph import stateio

    rd_dir = _round_dir(state_dir, i)
    stateio.rmtree(rd_dir)   # unmarked partial from a crashed attempt
    for name, d in (("state", state), ("closed", closed)):
        p = stateio.join(rd_dir, name)
        stateio.makedirs(p)
        if d.count():
            stateio.ray_write_parquet(d, p)
    stateio.write_json_atomic(stateio.join(rd_dir, "_complete.json"),
                              {"round": i})


def _read_round(state_dir: str, i: int, name: str,
                schema: pa.Schema | None = None):
    import ray.data as rd

    from raygraph import stateio

    schema = schema or _MERGE_SCHEMA
    p = stateio.join(_round_dir(state_dir, i), name)
    if not stateio.data_files(p):
        return rd.from_arrow(schema.empty_table())
    out = stateio.ray_read_parquet(p)

    def coerce(batch: pa.Table) -> pa.Table:
        return batch.select([f.name for f in schema]).cast(schema)

    return out.map_batches(coerce, batch_format="pyarrow")


def sessionize_incremental(ds, n_micro_batches: int = 4,
                           gap_sec: int = 1800, key_col: str = "user_id",
                           ts_col: str = "ts", state_dir: str | None = None,
                           resume: bool = False):
    """Gap-based sessionization as an incremental fold over
    ``n_micro_batches`` time-ordered micro-batches — the streaming path
    whose output is row-identical to :func:`events.sessionize` on the
    same input (the exactly-once invariant; session_id = per-key close
    order, matching the batch numbering because micro-batches arrive in
    global ts order). Returns one row per (key, session_id) with
    start/end/n_events.

    ``state_dir`` persists each round's (state, closed) tables plus a
    completion marker — the streaming analog of the build pipeline's
    per-partition checkpoint manifests. With ``resume=True`` the fold
    restarts from the last COMPLETE round: persisted closed outputs are
    reused verbatim and only the remaining micro-batches recompute, so a
    crash costs at most one round of work and the resumed output is
    byte-identical (tested)."""
    import ray.data as rd

    from .relational import hash_aggregate, range_partition

    gap_us = gap_sec * 1_000_000

    tiled = range_partition(ds.select_columns([key_col, ts_col]),
                            ts_col, n_micro_batches).materialize()

    def pick(i):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = batch.filter(pc.equal(batch.column("tile"), pa.scalar(i)))
            n = t.num_rows
            return pa.table({
                "user_id": t.column(key_col).cast(pa.int64()),
                "kind": pa.array(["ev"] * n, pa.string()),
                "ts": t.column(ts_col),
                "session_id": pa.nulls(n, pa.int64()),
                "session_start": pa.nulls(n, pa.timestamp("us")),
                "session_end": pa.nulls(n, pa.timestamp("us")),
                "n_events": pa.nulls(n, pa.int64()),
                "closed_cnt": pa.nulls(n, pa.int64()),
            })

        return fn

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for uid, g in df.groupby("user_id", sort=False):
            opens = g[g["kind"] == "open"]
            state_row = opens.iloc[0] if len(opens) else None
            evs = g[g["kind"] == "ev"]
            ts_us = np.sort(evs["ts"].to_numpy()
                            .astype("datetime64[us]").astype("int64"))
            closed, state = _merge_user(state_row, ts_us, gap_us)
            for c in closed:
                out.append({"user_id": uid, "kind": "closed", "ts": None,
                            **c, "closed_cnt": None})
            if state["session_start"] is not None:
                out.append({"user_id": uid, "kind": "open", "ts": None,
                            "session_id": None,
                            "session_start": state["session_start"],
                            "session_end": state["session_end"],
                            "n_events": state["n_events"],
                            "closed_cnt": state["closed_cnt"]})
        cols = [f.name for f in _MERGE_SCHEMA]
        return pd.DataFrame(out, columns=cols)

    from raygraph.ops.graph import _repaired

    state = rd.from_arrow(_empty_merge_table())
    emitted = []
    start_round = 0
    if state_dir and resume:
        while start_round < n_micro_batches \
                and _round_complete(state_dir, start_round):
            emitted.append(_read_round(state_dir, start_round, "closed"))
            start_round += 1
        if start_round:
            state = _read_round(state_dir, start_round - 1, "state")
    for i in range(start_round, n_micro_batches):
        batch_rows = tiled.map_batches(pick(i), batch_format="pyarrow")
        un = _repaired(state.union(batch_rows), _MERGE_SCHEMA)
        merged = _repaired(
            hash_aggregate(un, ["user_id"], merge), _MERGE_SCHEMA)

        def split(kind):
            def fn(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return batch.filter(pc.equal(batch.column("kind"),
                                             pa.scalar(kind)))

            return fn

        closed_i = _repaired(
            merged.map_batches(split("closed"), batch_format="pyarrow"),
            _MERGE_SCHEMA)
        state = _repaired(
            merged.map_batches(split("open"), batch_format="pyarrow"),
            _MERGE_SCHEMA)
        emitted.append(closed_i)
        if state_dir:
            _write_round(state_dir, i, state, closed_i)

    def finalize_open(batch: pa.Table) -> pa.Table:
        # remaining open sessions close at stream end; their id follows
        # the per-user closed count
        return batch.set_column(
            batch.schema.get_field_index("session_id"), "session_id",
            batch.column("closed_cnt"))

    last = state.map_batches(finalize_open, batch_format="pyarrow")
    allout = _repaired(
        rd.from_arrow(_empty_merge_table()).union(*emitted, last),
        _MERGE_SCHEMA)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["user_id", "session_id", "session_start",
                             "session_end", "n_events"])

    return allout.map_batches(project, batch_format="pyarrow")


def distinct_count_incremental(ds, n_micro_batches: int = 4,
                               key_col: str = "event_type",
                               user_col: str = "user_id",
                               ts_col: str = "ts",
                               state_dir: str | None = None,
                               resume: bool = False,
                               out: str = "n_users"):
    """Running exact COUNT(DISTINCT user) per key over time-ordered
    micro-batches — the second instance of the incremental-fold shape:
    state is the distinct (key, user) pair Dataset (the exact-dedup
    exchange form; at scale it shuffles like any keyed table and the
    driver never sees it). Per round: state ∪ batch pairs → one
    pair-hash dedup; the final count is a key-sized combiner aggregate.
    Same write-then-commit round checkpoints as
    :func:`sessionize_incremental` (state only — nothing closes until
    stream end). Output equals the batch ``distinct_count`` exactly."""
    import ray.data as rd

    from raygraph.ops.graph import _repaired

    from .relational import (hash_aggregate, preagg_sum,
                             range_partition)

    pair_schema = pa.schema([("k", pa.string()), ("u", pa.int64())])
    tiled = range_partition(
        ds.select_columns([key_col, user_col, ts_col]), ts_col,
        n_micro_batches).materialize()

    def pick(i):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = batch.filter(pc.equal(batch.column("tile"), pa.scalar(i)))
            return pa.table({
                "k": t.column(key_col).cast(pa.string()),
                "u": t.column(user_col).cast(pa.int64()),
            })

        return fn

    state = rd.from_arrow(pair_schema.empty_table())
    start_round = 0
    if state_dir and resume:
        while start_round < n_micro_batches \
                and _round_complete(state_dir, start_round):
            start_round += 1
        if start_round:
            state = _read_round(state_dir, start_round - 1, "state",
                                pair_schema)
    for i in range(start_round, n_micro_batches):
        rows = tiled.map_batches(pick(i), batch_format="pyarrow")
        un = _repaired(state.union(rows), pair_schema)
        state = _repaired(
            hash_aggregate(un, ["k", "u"],
                           lambda df: df.drop_duplicates()),
            pair_schema)
        if state_dir:
            empty = rd.from_arrow(pair_schema.empty_table())
            _write_round(state_dir, i, state, empty)

    counted = preagg_sum(state.select_columns(["k"]), ["k"], {},
                         counts=out)

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([key_col, out])

    return counted.map_batches(rename, batch_format="pyarrow")


def tumbling_counts_incremental(ds, n_micro_batches: int = 4,
                                window_sec: int = 3600,
                                type_col: str = "event_type",
                                ts_col: str = "ts",
                                value_col: str = "value_e4",
                                state_dir: str | None = None,
                                resume: bool = False):
    """Running tumbling-window aggregates as the THIRD incremental-fold
    instance — and the first with BOUNDED open state: because
    micro-batches arrive in global ts order (exact range tiles), a
    window whose end precedes the round's upper ts boundary can never
    receive another event, so it is emitted as CLOSED that round and
    leaves the state. Open state therefore holds only the
    boundary-straddling windows (O(#types), independent of stream
    length) — unlike :func:`distinct_count_incremental`, whose state is
    the answer itself. Output (type, window, n, sum) is row-identical
    to a batch groupby of the whole input (exactly-once invariant,
    tested), and rounds checkpoint/resume exactly like
    :func:`sessionize_incremental` (closed outputs reused verbatim,
    state reloaded from the last complete round — byte-identical).
    ``value_col`` must already be an exact int64 (e4-scaled upstream)."""
    import ray.data as rd

    from raygraph.ops.graph import _repaired

    from .relational import range_boundaries, range_partition

    w_us = window_sec * 1_000_000
    agg_schema = pa.schema([("w_start", pa.int64()),
                            ("k", pa.string()),
                            ("n", pa.int64()),
                            ("s", pa.int64())])

    sel = ds.select_columns([type_col, ts_col, value_col])
    bounds = range_boundaries(sel, ts_col, n_micro_batches)
    bound_us = [_us(b) for b in bounds]
    tiled = range_partition(sel, ts_col, n_micro_batches,
                            boundaries=bounds).materialize()

    def pick(i):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = batch.filter(pc.equal(batch.column("tile"), pa.scalar(i)))
            if not t.num_rows:
                return agg_schema.empty_table()
            df = t.to_pandas()
            us = df[ts_col].to_numpy().astype("datetime64[us]") \
                .astype("int64")
            g = pd.DataFrame({
                "w_start": (us // w_us) * window_sec,
                "k": df[type_col].astype(str),
                "n": np.int64(1),
                "s": df[value_col].to_numpy().astype("int64"),
            }).groupby(["w_start", "k"], as_index=False).sum()
            for c in ("w_start", "n", "s"):
                g[c] = g[c].astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False) \
                .cast(agg_schema)

        return fn

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["w_start", "k"], as_index=False)[["n", "s"]] \
            .sum()
        for c in ("w_start", "n", "s"):
            out[c] = out[c].astype("int64")
        return out

    from .relational import hash_aggregate

    state = rd.from_arrow(agg_schema.empty_table())
    emitted = []
    start_round = 0
    if state_dir and resume:
        while start_round < n_micro_batches \
                and _round_complete(state_dir, start_round):
            emitted.append(_read_round(state_dir, start_round, "closed",
                                       agg_schema))
            start_round += 1
        if start_round:
            state = _read_round(state_dir, start_round - 1, "state",
                                agg_schema)
    for i in range(start_round, n_micro_batches):
        rows = tiled.map_batches(pick(i), batch_format="pyarrow")
        un = _repaired(state.union(rows), agg_schema)
        merged = _repaired(
            hash_aggregate(un, ["w_start", "k"], merge), agg_schema)
        # windows ending at or before this round's upper ts bound are
        # final — emit and drop (the bounded-state property)
        cutoff = (bound_us[i] // w_us) * window_sec \
            if i < len(bound_us) else None

        def split(keep_closed, cut=cutoff):
            def fn(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                if cut is None:
                    mask = pa.array(np.full(batch.num_rows,
                                            not keep_closed))
                    return batch.filter(mask)
                closed = pc.less(batch.column("w_start"),
                                 pa.scalar(cut, pa.int64()))
                return batch.filter(
                    closed if keep_closed else pc.invert(closed))

            return fn

        closed_i = _repaired(
            merged.map_batches(split(True), batch_format="pyarrow"),
            agg_schema)
        state = _repaired(
            merged.map_batches(split(False), batch_format="pyarrow"),
            agg_schema)
        emitted.append(closed_i)
        if state_dir:
            _write_round(state_dir, i, state, closed_i)

    allout = _repaired(
        rd.from_arrow(agg_schema.empty_table()).union(*emitted, state),
        agg_schema)

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["window_start", type_col, "n", "sum_e4"])

    return allout.map_batches(rename, batch_format="pyarrow")


_ASOF_MERGE = pa.schema([
    ("kind", pa.string()),          # 'st' | 'r' | 'l' | 'out'
    ("u", pa.int64()),
    ("lt", pa.int64()),             # left ts (µs) — l/out rows
    ("lv", pa.float64()),
    ("rt", pa.int64()),             # right ts (µs) — st/r rows; matched on out
    ("rv", pa.float64()),
])
_ASOF_STATE = pa.schema([("u", pa.int64()), ("rt", pa.int64()),
                         ("rv", pa.float64())])


def asof_join_incremental(left, right, n_micro_batches: int = 4,
                          key_col: str = "user_id", ts_col: str = "ts",
                          left_value: str = "value",
                          right_value: str = "value",
                          state_dir: str | None = None,
                          resume: bool = False):
    """Stream-stream BACKWARD as-of join as the FOURTH incremental-fold
    instance — and the most state-bounded: because micro-batches arrive
    in global ts order (shared exact range tiles, so right.ts ≤ left.ts
    implies right's round ≤ left's round), every left row can be joined
    and EMITTED in its own round, and the carried state is just the
    latest right row per key — O(#keys), independent of stream length.
    Per round one key-hash exchange runs a vectorized ``pd.merge_asof``
    of the round's lefts against (state ∪ round rights) per bucket.

    The right side must be unique per (key, ts) (the batch
    :func:`raygraph.ops.events.asof_join` contract; range tiles never
    split equal ts values, so state and round rights cannot collide).
    Output is row-identical to the batch as-of join — the shared-oracle
    exactly-once invariant — and rounds checkpoint/resume with the
    write-then-commit discipline of :func:`sessionize_incremental`."""
    import ray.data as rd

    from raygraph.ops.graph import _repaired

    from .relational import hash_aggregate, range_boundaries, range_partition

    sel_l = left.select_columns([key_col, ts_col, left_value])
    sel_r = right.select_columns([key_col, ts_col, right_value])
    bounds = range_boundaries(sel_l, ts_col, n_micro_batches)
    tiled_l = range_partition(sel_l, ts_col, n_micro_batches,
                              boundaries=bounds).materialize()
    tiled_r = range_partition(sel_r, ts_col, n_micro_batches,
                              boundaries=bounds).materialize()

    def pick(i, kind, vcol):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = batch.filter(pc.equal(batch.column("tile"), pa.scalar(i)))
            n = t.num_rows
            us = t.column(ts_col).cast(pa.int64())
            v = t.column(vcol).cast(pa.float64())
            nulls_i = pa.nulls(n, pa.int64())
            nulls_f = pa.nulls(n, pa.float64())
            return pa.table({
                "kind": pa.array([kind] * n, pa.string()),
                "u": t.column(key_col).cast(pa.int64()),
                "lt": us if kind == "l" else nulls_i,
                "lv": v if kind == "l" else nulls_f,
                "rt": us if kind == "r" else nulls_i,
                "rv": v if kind == "r" else nulls_f,
            })

        return fn

    def st_rows(state):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table({
                "kind": pa.array(["st"] * n, pa.string()),
                "u": batch.column("u"),
                "lt": pa.nulls(n, pa.int64()),
                "lv": pa.nulls(n, pa.float64()),
                "rt": batch.column("rt"),
                "rv": batch.column("rv"),
            })

        return state.map_batches(fn, batch_format="pyarrow")

    def reduce_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rights = df.loc[df["kind"].isin(("st", "r")),
                        ["u", "rt", "rv"]].copy()
        lefts = df.loc[df["kind"] == "l", ["u", "lt", "lv"]].copy()
        rights["rt"] = rights["rt"].astype("int64")
        outs = []
        if len(lefts):
            lefts = lefts.sort_values("lt", kind="mergesort")
            lefts["lt"] = lefts["lt"].astype("int64")
            if len(rights):
                j = pd.merge_asof(lefts,
                                  rights.sort_values("rt",
                                                     kind="mergesort"),
                                  left_on="lt", right_on="rt", by="u",
                                  direction="backward")
            else:
                j = lefts.assign(rt=pd.NA, rv=np.nan)
            j["kind"] = "out"
            outs.append(j[["kind", "u", "lt", "lv", "rt", "rv"]])
        if len(rights):
            st = rights.sort_values(["u", "rt"], kind="mergesort") \
                .groupby("u", as_index=False).tail(1)
            st = st.assign(kind="st", lt=pd.NA, lv=np.nan)
            outs.append(st[["kind", "u", "lt", "lv", "rt", "rv"]])
        if not outs:
            return pd.DataFrame(columns=["kind", "u", "lt", "lv",
                                         "rt", "rv"])
        out = pd.concat(outs, ignore_index=True)
        for c in ("lt", "rt"):
            out[c] = out[c].astype("Int64")
        return out

    def split(kind):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.equal(batch.column("kind"), kind))

        return fn

    out_schema = _ASOF_MERGE
    state = rd.from_arrow(_ASOF_STATE.empty_table())
    emitted = []
    start_round = 0
    if state_dir and resume:
        while start_round < n_micro_batches \
                and _round_complete(state_dir, start_round):
            emitted.append(_read_round(state_dir, start_round, "closed",
                                       out_schema))
            start_round += 1
        if start_round:
            state = _read_round(state_dir, start_round - 1, "state",
                                _ASOF_STATE)
    for i in range(start_round, n_micro_batches):
        rows_l = tiled_l.map_batches(pick(i, "l", left_value),
                                     batch_format="pyarrow")
        rows_r = tiled_r.map_batches(pick(i, "r", right_value),
                                     batch_format="pyarrow")
        un = _repaired(st_rows(state).union(rows_l, rows_r),
                       _ASOF_MERGE)
        merged = _repaired(hash_aggregate(un, ["u"], reduce_bucket),
                           _ASOF_MERGE)
        closed_i = _repaired(
            merged.map_batches(split("out"), batch_format="pyarrow"),
            out_schema)
        state = _repaired(
            merged.map_batches(split("st"), batch_format="pyarrow")
            .map_batches(lambda b: b.select(["u", "rt", "rv"]),
                         batch_format="pyarrow"),
            _ASOF_STATE)
        emitted.append(closed_i)
        if state_dir:
            _write_round(state_dir, i, state, closed_i)

    allout = _repaired(
        rd.from_arrow(out_schema.empty_table()).union(*emitted),
        out_schema)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            key_col: batch.column("u"),
            ts_col: batch.column("lt").cast(pa.timestamp("us")),
            left_value: batch.column("lv"),
            right_value + "_matched": batch.column("rv"),
            ts_col + "_matched":
                batch.column("rt").cast(pa.timestamp("us")),
        })

    return allout.map_batches(rename, batch_format="pyarrow")


def heavy_hitters_incremental(ds, k: int, values_fn,
                              n_micro_batches: int = 4,
                              order_col: str = "doc_id",
                              state_dir: str | None = None,
                              resume: bool = False,
                              out_key: str = "token"):
    """Streaming Misra-Gries heavy hitters — the incremental-fold shape
    applied to a MERGEABLE summary (Agarwal et al., PODS 2012: summing
    MG summaries then re-compressing keeps the total undercount ≤ n/k,
    so every key with global frequency > n/k still has positive weight
    in the folded state). Per round the tile's per-block MG partials
    fold into a ≤ k-row state frame (plus one total-count row);
    checkpointed write-then-commit like the other incremental folds.

    At stream end ONE exact verify pass counts the accumulated
    candidate set over the full input — the same second scan the batch
    :func:`raygraph.ops.sketch.heavy_hitters` performs — so the output
    is EXACT and row-identical to the batch twin (shared oracle).
    """
    import ray
    import ray.data as rd

    from raygraph.ops.sketch import _mg_compress

    from .relational import preagg_sum, range_partition

    cap = max(1, k - 1)
    state_schema = pa.schema([(out_key, pa.string()), ("w", pa.int64())])
    tiled = range_partition(ds, order_col, n_micro_batches).materialize()

    def partial(i):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = batch.filter(pc.equal(batch.column("tile"), pa.scalar(i)))
            vals = values_fn(t)
            g = vals.value_counts().rename_axis(out_key) \
                .reset_index(name="w")
            total = int(g["w"].sum())
            g = _mg_compress(g, cap)
            return pa.table({
                out_key: pa.array(g[out_key].astype(str).tolist()
                                  + [None], pa.string()),
                "w": pa.array(g["w"].tolist() + [total], pa.int64()),
            })

        return fn

    def fold(state_df: pd.DataFrame, round_df: pd.DataFrame
             ) -> pd.DataFrame:
        both = pd.concat([state_df, round_df], ignore_index=True)
        total = int(both.loc[both[out_key].isna(), "w"].sum())
        keys = both.dropna(subset=[out_key]) \
            .groupby(out_key, as_index=False)["w"].sum()
        keys = _mg_compress(keys, cap).reset_index(drop=True)
        keys.loc[len(keys)] = [None, total]
        return keys

    state = pd.DataFrame({out_key: pd.Series([None], dtype=object),
                          "w": pd.Series([0], dtype="int64")})
    start_round = 0
    if state_dir and resume:
        while start_round < n_micro_batches \
                and _round_complete(state_dir, start_round):
            start_round += 1
        if start_round:
            state = _read_round(state_dir, start_round - 1, "state",
                                state_schema).to_pandas()
    for i in range(start_round, n_micro_batches):
        rows = tiled.map_batches(partial(i), batch_format="pyarrow") \
            .to_pandas()
        state = fold(state, rows)
        if state_dir:
            sds = rd.from_arrow(pa.Table.from_pandas(
                state, schema=state_schema, preserve_index=False))
            _write_round(state_dir, i, sds,
                         rd.from_arrow(state_schema.empty_table()))

    n_total = int(state.loc[state[out_key].isna(), "w"].sum())
    cand = state.loc[state[out_key].notna(), out_key].unique()
    if n_total == 0 or len(cand) == 0:
        return pd.DataFrame({out_key: pd.Series([], dtype=str),
                             "n": pd.Series([], dtype="int64")})
    cand_ref = ray.put(set(cand.tolist()))

    def exact(batch: pa.Table) -> pa.Table:
        import ray as _ray

        cset = _ray.get(cand_ref)
        vals = values_fn(batch)
        vals = vals[vals.isin(cset)]
        g = vals.value_counts().rename_axis(out_key).reset_index(name="n")
        return pa.table({
            out_key: pa.array(g[out_key].astype(str).tolist(),
                              pa.string()),
            "n": pa.array(g["n"].tolist(), pa.int64()),
        })

    counts = preagg_sum(ds.map_batches(exact, batch_format="pyarrow"),
                        [out_key], {"n": "n"}).to_pandas()
    hits = counts[counts["n"] * k > n_total]
    return (hits.sort_values(["n", out_key], ascending=[False, True])
            .reset_index(drop=True))


def ivm_incremental(view, delta_rounds, keys, value_cols,
                    schema: pa.Schema, count_col: str = "n",
                    state_dir: str | None = None,
                    resume: bool = False):
    """Streaming incremental view maintenance — the micro-batch twin of
    :func:`raygraph.ops.relational.ivm_merge`: the changeset arrives as
    ``delta_rounds`` (a list of rounds, each a list of ``(dataset,
    sign)``), the maintained view folds one round at a time with the
    counting algorithm, and every round checkpoints write-then-commit
    so a crash resumes from the last complete round byte-identically.

    One deliberate difference from the batch twin: zero-count groups
    stay IN the running state (a later insert round may resurrect
    them — dropping early would lose the resurrect), and are filtered
    only at the final emit, which is exactly when the batch path
    filters. Final output is therefore bit-identical to
    ``ivm_merge(view, flatten(delta_rounds), ...)`` — the shared
    oracle is the correctness claim.

    ``schema`` declares the state layout: keys + value_cols +
    count_col (all aggregates int64).
    """
    import ray.data as rd

    from raygraph.ops.graph import _repaired

    from .relational import hash_aggregate

    keys = list(keys)
    value_cols = list(value_cols)
    aggs = value_cols + [count_col]

    def signed_partial(sign: int):
        def fn(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["__cnt"] = np.int64(sign)
            for c in value_cols:
                df[c] = sign * df[c].astype("int64")
            g = df.groupby(keys, as_index=False)[
                value_cols + ["__cnt"]].sum()
            g = g.rename(columns={"__cnt": count_col})
            for c in aggs:
                g[c] = g[c].astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False) \
                .select([f.name for f in schema]).cast(schema)
        return fn

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(keys, as_index=False)[aggs].sum()
        for c in aggs:
            out[c] = out[c].astype("int64")
        return out

    state = _repaired(view.select_columns([f.name for f in schema]),
                      schema)
    n_rounds = len(delta_rounds)
    start_round = 0
    if state_dir and resume:
        while start_round < n_rounds \
                and _round_complete(state_dir, start_round):
            start_round += 1
        if start_round:
            state = _read_round(state_dir, start_round - 1, "state",
                                schema)
    for i in range(start_round, n_rounds):
        un = state
        for ds, sign in delta_rounds[i]:
            un = un.union(ds.map_batches(signed_partial(sign),
                                         batch_format="pyarrow"))
        state = _repaired(hash_aggregate(un, keys, merge), schema)
        if state_dir:
            _write_round(state_dir, i, state,
                         rd.from_arrow(schema.empty_table()))

    def alive(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater(batch.column(count_col), 0))

    return _repaired(state.map_batches(alive, batch_format="pyarrow"),
                     schema)
