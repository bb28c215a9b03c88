"""Stream-shaped operators over an ordered, partitioned event log.

Ray Data is a (streaming-)batch engine with no event-time watermarks
(SURVEY.md §2.6: the reference has none either — pull-based batch
streaming only). Windows are therefore expressed as
``groupby(key).map_groups(fn)`` where ``fn`` sorts the group by ``ts`` and
applies the windowing in pandas. Ordering assumption: all events of one
key fit one group (hash-partitioned) and are sorted *within* the group —
no cross-key ordering is assumed or needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def tumbling_window(
    ds,
    window_sec: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """count + sum(value) per (key, window_start). Implemented as partial
    per-batch aggregation then one groupby — no per-key giant groups."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        ns = df[ts_col].astype("datetime64[ns]").astype("int64")
        df["window_start"] = (ns // (window_sec * 1_000_000_000)) * window_sec
        g = df.groupby([key_col, "window_start"], as_index=False).agg(
            n_events=(value_col, "size"), sum_value=(value_col, "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_value", alias_name="sum_value"))
    )


def hopping_window(
    ds,
    window_sec: int = 3600,
    hop_sec: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """count + sum(value) per (key, window_start) for OVERLAPPING windows
    of ``window_sec`` advancing every ``hop_sec``. Each event fans out to
    window_sec/hop_sec window rows inside ``map_batches`` (vectorized
    repeat — the standard explode-then-aggregate hopping plan), then the
    same partial-agg + built-in Sum as :func:`tumbling_window`.
    ``window_sec`` must be a multiple of ``hop_sec``."""
    if window_sec % hop_sec:
        raise ValueError("window_sec must be a multiple of hop_sec")
    ratio = window_sec // hop_sec

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        s = df[ts_col].astype("datetime64[ns]").astype("int64") \
            // 1_000_000_000
        base = (s // hop_sec) * hop_sec
        frames = []
        for i in range(ratio):
            f = pd.DataFrame({
                key_col: df[key_col],
                "window_start": base - i * hop_sec,
                value_col: df[value_col],
            })
            frames.append(f)
        x = pd.concat(frames, ignore_index=True)
        g = x.groupby([key_col, "window_start"], as_index=False).agg(
            n_events=(value_col, "size"), sum_value=(value_col, "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_value", alias_name="sum_value"))
    )


def asof_join(
    left,
    right,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    suffix: str = "_matched",
    num_buckets: int = 128,
    direction: str = "backward",
):
    """Per-key as-of join: each left row picks the LATEST right row of
    the same key with ``right.ts <= left.ts`` (``direction="backward"``,
    default) or the EARLIEST with ``right.ts >= left.ts``
    (``direction="forward"`` — the "next event after" lookup); exact
    matches allowed either way; unmatched rows keep nulls. The operator Ray Data lacks
    natively — expressed as tag-union → hash bucket by key →
    ``pd.merge_asof`` per bucket (vectorized; all rows of a key land in
    one bucket, the stated partitioning assumption).

    The right side must be unique per (key, ts) — pre-aggregate it if
    not (ties make backward-asof semantics engine-dependent).
    """
    import pyarrow as _pa

    from .relational import hash_aggregate

    def tag(side: int):
        def fn(batch: _pa.Table) -> _pa.Table:
            keep = [key_col, ts_col] + [c for c in value_cols
                                        if c in batch.schema.names]
            return batch.select(keep).append_column(
                "__side", _pa.array([side] * batch.num_rows, _pa.int8())
            )

        return fn

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )

    def bucket_asof(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == 0].drop(columns="__side") \
            .sort_values(ts_col, kind="mergesort", ignore_index=True)
        r = df[df["__side"] == 1].drop(columns="__side") \
            .sort_values(ts_col, kind="mergesort", ignore_index=True)
        r = r.rename(columns={c: c + suffix for c in value_cols})
        # carry the right ts as a payload column so the match timestamp
        # survives the asof merge
        r[ts_col + suffix] = r[ts_col]
        return pd.merge_asof(
            l, r, on=ts_col, by=key_col, direction=direction,
            allow_exact_matches=True,
        )

    return hash_aggregate(both, [key_col], bucket_asof,
                          num_buckets=num_buckets)


def _session_ids(df: pd.DataFrame, gap_sec: int, key_col: str,
                 ts_col: str) -> pd.DataFrame:
    """Sort by (key, ts) and attach per-key session ordinals — ONE
    vectorized pass over every key in the frame (diff + key-change mask +
    per-key cumsum), never per-key Python."""
    df = df.sort_values([key_col, ts_col], kind="mergesort",
                        ignore_index=True)
    us = df[ts_col].astype("datetime64[ns]").astype("int64") // 1_000
    gap_us = gap_sec * 1_000_000
    key_change = df[key_col] != df[key_col].shift()
    new = key_change | (us.diff().fillna(gap_us + 1) > gap_us)
    df["session_id"] = new.groupby(df[key_col]).cumsum() - 1
    return df


def sessionize(
    ds,
    gap_sec: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    num_buckets: int = 128,
):
    """Gap-based sessions per key: a new session starts when the time
    since the previous event of the same key exceeds ``gap_sec``. Returns
    one row per (key, session_id) with start/end/n_events.

    Hash-bucketed: each reduce task sessionizes ALL keys of its bucket in
    one vectorized pandas pass (sort + diff + cumsum) — per-group Python
    is paid once per bucket, not once per key. Exactness needs a key's
    events co-located, which the bucket hash guarantees."""
    from .relational import hash_aggregate

    def bucket_sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = _session_ids(df, gap_sec, key_col, ts_col)
        out = df.groupby([key_col, "session_id"], as_index=False, sort=False) \
            .agg(session_start=(ts_col, "min"), session_end=(ts_col, "max"),
                 n_events=(ts_col, "size"))
        return out[[key_col, "session_id", "session_start", "session_end",
                    "n_events"]]

    return hash_aggregate(ds, [key_col], bucket_sessions,
                          num_buckets=num_buckets)


def running_sum(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    tie_col: str = "event_id",
    out_col: str = "cum_value",
    round_dp: int | None = 4,
    num_buckets: int = 128,
):
    """Per-key running sum ordered by (ts, tie_col) — the window function
    ``SUM(val) OVER (PARTITION BY key ORDER BY ts, tie ROWS UNBOUNDED
    PRECEDING)`` as a distributed stage.

    Hash-bucketed like :func:`sessionize`: one vectorized sort + groupby
    cumsum per bucket covers every key in it; a key's rows must be
    co-located, which the bucket hash guarantees, and the deterministic
    (ts, tie) order makes float accumulation order — hence the result —
    identical to the SQL window oracle. ``round_dp`` floors the float
    tail for hash-stable comparison.
    """
    from .relational import hash_aggregate

    def bucket_cumsum(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, tie_col], kind="mergesort",
                            ignore_index=True)
        df[out_col] = df.groupby(key_col, sort=False)[val_col].cumsum()
        if round_dp is not None:
            df[out_col] = df[out_col].round(round_dp)
        return df

    return hash_aggregate(ds, [key_col], bucket_cumsum,
                          num_buckets=num_buckets)


def rolling_window(
    ds,
    window_us: int = 3_600_000_000,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    scale: int = 10_000,
    num_buckets: int = 128,
):
    """Per-key rolling time-window aggregate — the RANGE window function
    ``SUM(v) OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN <window>
    PRECEDING AND CURRENT ROW)`` (and the matching COUNT) as a
    distributed stage. Frame = all rows of the key with ts in
    [t - window, t] inclusive, matching SQL RANGE peer semantics (equal
    timestamps are all in frame regardless of tie order).

    Hash-bucketed like :func:`running_sum`: per bucket ONE mergesort,
    then per key two ``np.searchsorted`` calls against the key's sorted
    timestamp slice + a prefix-sum difference — O(rows log rows) per
    bucket, no per-row Python. Values are fixed-point int64
    (``round(v * scale)``), so window sums are order-independent exact
    integers and the SQL oracle matches bit-for-bit.
    """
    from .relational import hash_aggregate

    def bucket_roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, id_col], kind="mergesort",
                            ignore_index=True)
        v = np.round(df[val_col].to_numpy() * scale).astype("int64")
        ts = df[ts_col].astype("int64").to_numpy()
        keys = df[key_col].to_numpy()
        n = len(df)
        out_n = np.empty(n, dtype="int64")
        out_s = np.empty(n, dtype="int64")
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], n]
        for a, b in zip(starts, ends):          # one numpy op set per KEY
            t = ts[a:b]
            cs = np.concatenate(([0], np.cumsum(v[a:b])))
            lo = np.searchsorted(t, t - window_us, side="left")
            hi = np.searchsorted(t, t, side="right")
            out_n[a:b] = hi - lo
            out_s[a:b] = cs[hi] - cs[lo]
        return pd.DataFrame({
            id_col: df[id_col],
            "n_win": out_n,
            "sum_win_e4": out_s,
        })

    return hash_aggregate(ds, [key_col], bucket_roll,
                          num_buckets=num_buckets)


def event_gaps(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    num_buckets: int = 128,
):
    """Per-key inter-event gap statistics — the LAG() window function
    (``ts - LAG(ts) OVER (PARTITION BY key ORDER BY ts, tie)``) folded
    into its per-key aggregate, as a distributed stage.

    Hash-bucketed like :func:`sessionize`: one vectorized sort + diff per
    bucket covers every key in it (a key's rows must be co-located, which
    the bucket hash guarantees). Gaps are exact int64 microseconds, so a
    SQL window oracle reproduces the output bit-for-bit. Emits per key:
    ``n_events``, ``n_gaps`` (= n_events - 1), ``max_gap_us``,
    ``sum_gap_us`` (0 for single-event keys — the SQL ``coalesce``).
    """
    from .relational import hash_aggregate

    def bucket_gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, tie_col], kind="mergesort",
                            ignore_index=True)
        us = df[ts_col].astype("datetime64[ns]").astype("int64") // 1_000
        gap = us.diff()
        gap[df[key_col] != df[key_col].shift()] = pd.NA
        df["__gap"] = gap
        out = df.groupby(key_col, as_index=False, sort=False).agg(
            n_events=(ts_col, "size"),
            n_gaps=("__gap", "count"),
            max_gap_us=("__gap", "max"),
            sum_gap_us=("__gap", "sum"),
        )
        for c in ("n_events", "n_gaps", "max_gap_us", "sum_gap_us"):
            out[c] = out[c].fillna(0).astype("int64")
        return out

    return hash_aggregate(ds.select_columns([key_col, ts_col, tie_col]),
                          [key_col], bucket_gaps, num_buckets=num_buckets)


def session_counts(ds, gap_sec: int = 1800, key_col: str = "user_id",
                   ts_col: str = "ts", num_buckets: int = 128):
    """Sessions per key (the SQL-oracle-friendly aggregate of
    :func:`sessionize`) — same hash-bucketed vectorized pass."""
    from .relational import hash_aggregate

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        df = _session_ids(df, gap_sec, key_col, ts_col)
        out = df.groupby(key_col, as_index=False, sort=False) \
            .agg(n_sessions=("session_id", "max"))
        out["n_sessions"] = out["n_sessions"].astype("int64") + 1
        return out

    return hash_aggregate(ds, [key_col], bucket_counts,
                          num_buckets=num_buckets)


def type_transitions(ds, key_col: str = "user_id", ts_col: str = "ts",
                     type_col: str = "event_type",
                     tie_col: str = "event_id", num_buckets: int = 64):
    """Per-key event-type TRANSITION counts (the first-order Markov /
    user-journey matrix): consecutive event pairs within a key, ordered
    by (ts, tie), counted globally by (from_type, to_type).

    One hash-bucketed pass computes per-bucket partial pair counts (all
    rows of a key co-locate; the partial is transition-type-sized, tiny)
    followed by a global :func:`preagg_sum` merge. The vectorized kernel
    is one sort + one groupby-shift per bucket — the sessionize
    discipline; the per-key row count is the (documented) bucket
    bound."""
    from .relational import hash_aggregate, preagg_sum

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, tie_col], kind="mergesort")
        prev = df.groupby(key_col, sort=False)[type_col].shift(1)
        out = pd.DataFrame({"from_type": prev,
                            "to_type": df[type_col]}).dropna()
        g = out.groupby(["from_type", "to_type"], as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    partials = hash_aggregate(
        ds.select_columns([key_col, ts_col, type_col, tie_col]),
        [key_col], bucket_pairs, num_buckets=num_buckets)
    return preagg_sum(partials, ["from_type", "to_type"], {"n": "n"})


def type_trigrams(ds, k: int = 10, key_col: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type",
                  tie_col: str = "event_id", num_buckets: int = 64):
    """Sequential-pattern heavy hitters: the top-k per-key event-type
    TRIGRAMS (three consecutive events within a key, ordered by
    (ts, tie)) across all keys — the 3-step-journey mining primitive.
    Same dataflow as :func:`type_transitions` (all rows of a key meet
    in one bucket; one sort + two groupby-shifts per bucket; partials
    are trigram-type-sized) with the final top-k as a distributed
    ``sort + limit``, deterministic tie-break on the trigram columns."""
    from .relational import hash_aggregate, preagg_sum

    def bucket_trigrams(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, tie_col], kind="mergesort")
        g = df.groupby(key_col, sort=False)[type_col]
        out = pd.DataFrame({"t1": g.shift(2), "t2": g.shift(1),
                            "t3": df[type_col]}).dropna()
        agg = out.groupby(["t1", "t2", "t3"], as_index=False).size() \
            .rename(columns={"size": "n"})
        agg["n"] = agg["n"].astype("int64")
        return agg

    partials = hash_aggregate(
        ds.select_columns([key_col, ts_col, type_col, tie_col]),
        [key_col], bucket_trigrams, num_buckets=num_buckets)
    agg = preagg_sum(partials, ["t1", "t2", "t3"], {"n": "n"})
    return agg.sort(["n", "t1", "t2", "t3"],
                    descending=[True, False, False, False]).limit(k)


def type_sequences(ds, key_col: str = "user_id", ts_col: str = "ts",
                   type_col: str = "event_type",
                   tie_col: str = "event_id", sep: str = ">",
                   num_buckets: int = 64):
    """Per-key ordered event-type sequence as one string (the user
    journey; SQL ``string_agg(... ORDER BY ...)``). Hash-bucketed: all
    rows of a key meet in one bucket, one sort + one groupby-join per
    bucket; output is one row per key."""
    from .relational import hash_aggregate

    def bucket_seq(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, tie_col], kind="mergesort")
        out = df.groupby(key_col, as_index=False, sort=False) \
            .agg(seq=(type_col, sep.join))
        return out

    return hash_aggregate(
        ds.select_columns([key_col, ts_col, type_col, tie_col]),
        [key_col], bucket_seq, num_buckets=num_buckets)


def funnel_counts(ds, steps, key_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type", num_buckets: int = 64):
    """Ordered funnel: how many keys reached step 1, steps 1→2, 1→2→3, …
    where each step's event must occur STRICTLY AFTER the previous
    step's earliest qualifying occurrence (the standard product-analytics
    funnel with first-touch semantics). Fully vectorized: len(steps)
    merge + groupby-min passes per bucket, never a Python loop over
    keys; hash-bucketed so all rows of a key co-locate; the output is
    len(steps) scalars per bucket merged by an associative sum."""
    from .relational import hash_aggregate, preagg_sum

    steps = list(steps)

    def bucket_funnel(df: pd.DataFrame) -> pd.DataFrame:
        reached = None
        counts = []
        for s in steps:
            ev = df.loc[df[type_col] == s, [key_col, ts_col]]
            if reached is not None:
                ev = ev.merge(reached, on=key_col)
                ev = ev.loc[ev[ts_col] > ev["reached_at"],
                            [key_col, ts_col]]
            reached = ev.groupby(key_col, as_index=False)[ts_col].min() \
                .rename(columns={ts_col: "reached_at"})
            counts.append(len(reached))
        return pd.DataFrame({"step": np.arange(1, len(steps) + 1,
                                               dtype="int64"),
                             "step_type": steps,
                             "n_users": np.asarray(counts, dtype="int64")})

    partials = hash_aggregate(
        ds.select_columns([key_col, ts_col, type_col]),
        [key_col], bucket_funnel, num_buckets=num_buckets)
    return preagg_sum(partials, ["step", "step_type"],
                      {"n_users": "n_users"})


def retention_cohorts(ds, key_col: str = "user_id", ts_col: str = "ts",
                      num_buckets: int = 64):
    """Weekly retention cohorts: cohort(user) = ISO week of the user's
    FIRST event; output = distinct active users per (cohort_week,
    activity_week). Two stages, both combiner-style: per-key first-ts +
    distinct (key, week) pairs inside one bucketed pass, then a tiny
    (weeks × weeks) count merge. Weeks are integer epoch-weeks
    (floor(epoch_days / 7)) so the SQL oracle is exact."""
    from .relational import hash_aggregate, preagg_sum

    def week_of(ts: pd.Series) -> pd.Series:
        days = ts.astype("datetime64[s]").astype("int64") // 86400
        return days // 7

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["week"] = week_of(df[ts_col]).astype("int64")
        first = df.groupby(key_col, as_index=False)["week"].min() \
            .rename(columns={"week": "cohort_week"})
        active = df[[key_col, "week"]].drop_duplicates()
        m = active.merge(first, on=key_col)
        out = m.groupby(["cohort_week", "week"], as_index=False).size() \
            .rename(columns={"size": "n_users"})
        out["n_users"] = out["n_users"].astype("int64")
        return out

    partials = hash_aggregate(
        ds.select_columns([key_col, ts_col]),
        [key_col], bucket_pairs, num_buckets=num_buckets)
    return preagg_sum(partials, ["cohort_week", "week"],
                      {"n_users": "n_users"})


def type_overlap(ds, key_col: str = "user_id",
                 type_col: str = "event_type", num_buckets: int = 64):
    """Cohort-overlap matrix: for every unordered pair of event types,
    the EXACT count of distinct users who did both — the set-intersection
    cardinality grid behind "users who did A and B" analytics.

    Per-batch distinct (type, user) projection, then ONE user-bucketed
    shuffle: a user's full type set lands in one bucket, so a vectorized
    self-merge per bucket emits its type pairs exactly once; per-bucket
    partial counts meet in a tiny (|types|²-sized) final aggregate. Join
    fan-out per user is |types-per-user|², bounded by the type-space
    cardinality — never by user count.
    """
    from .relational import hash_aggregate, preagg_sum

    def project(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[[key_col, type_col]].drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        m = df.merge(df, on=key_col)
        m = m[m[type_col + "_x"] < m[type_col + "_y"]]
        g = m.groupby([type_col + "_x", type_col + "_y"],
                      as_index=False).size()
        g["size"] = g["size"].astype("int64")
        return g.rename(columns={type_col + "_x": "type_a",
                                 type_col + "_y": "type_b",
                                 "size": "n_users"})

    partials = hash_aggregate(
        ds.map_batches(project, batch_format="pyarrow"),
        [key_col], bucket_pairs, num_buckets=num_buckets)
    return preagg_sum(partials, ["type_a", "type_b"],
                      {"n_users": "n_users"})


def resample_locf(ds, grid_us: int = 3_600_000_000,
                  key_col: str = "user_id", ts_col: str = "ts",
                  val_col: str = "value", tie_col: str = "event_id",
                  scale: int = 10_000, num_buckets: int = 128):
    """Time-grid resampling with last-observation-carried-forward: for
    every key, one row per ``grid_us`` grid point inside the key's
    [min ts, max ts] span, carrying the value of the latest event at or
    before the grid point (ties on ts resolve to the highest
    ``tie_col`` — deterministic in SQL too). The gap-fill step between
    an irregular event log and a fixed-step time series.

    Hash-bucketed like :func:`rolling_window`: per bucket one mergesort,
    then per key a vectorized ``arange`` grid + one ``searchsorted``
    lookup — the grid never materializes outside its task. Output size
    is span/grid_us rows per key; pick ``grid_us`` accordingly.
    """
    from .relational import hash_aggregate

    def bucket_fill(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, tie_col], kind="mergesort",
                            ignore_index=True)
        us = (df[ts_col].astype("datetime64[ns]").astype("int64")
              // 1_000).to_numpy()
        v = np.round(df[val_col].to_numpy() * scale).astype("int64")
        keys = df[key_col].to_numpy()
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], len(df)]
        out_k, out_h, out_v = [], [], []
        for a, b in zip(starts, ends):          # one numpy op set per KEY
            t = us[a:b]
            h0 = -(-t[0] // grid_us)            # ceil: first point >= min
            h1 = t[-1] // grid_us
            if h1 < h0:
                continue
            hs = np.arange(h0, h1 + 1, dtype="int64")
            idx = np.searchsorted(t, hs * grid_us, side="right") - 1
            out_k.append(np.repeat(keys[a], len(hs)))
            out_h.append(hs)
            out_v.append(v[a:b][idx])
        if not out_k:
            return pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                                 "grid_h": pd.Series([], dtype="int64"),
                                 "value_e4": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            key_col: np.concatenate(out_k),
            "grid_h": np.concatenate(out_h),
            "value_e4": np.concatenate(out_v),
        })

    return hash_aggregate(ds, [key_col], bucket_fill,
                          num_buckets=num_buckets)


def late_arrival_counts(
    ds,
    key_col: str = "user_id",
    order_col: str = "event_id",
    ts_col: str = "ts",
    num_buckets: int = 128,
):
    """Per-key out-of-order event count — a streaming-ingest health
    metric: an event is LATE when its timestamp is below the running max
    of all earlier events of the same key in arrival (``order_col``)
    order, i.e. ``ts < MAX(ts) OVER (PARTITION BY key ORDER BY order_col
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)``.

    Reference analog: none — watermark/out-of-order accounting for the
    event-stream family. Hash-bucketed like :func:`running_sum`: one
    vectorized sort + groupby cummax per bucket covers every key in it;
    output is one (key, n_events, n_late) row per key, exact int64.
    """
    from .relational import hash_aggregate

    def bucket_late(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, order_col], kind="mergesort",
                            ignore_index=True)
        ts = df[ts_col].astype("datetime64[ns]").astype("int64")
        run_max = ts.groupby(df[key_col], sort=False).cummax()
        prev_max = run_max.groupby(df[key_col], sort=False).shift(1)
        late = ts < prev_max                    # NaN prev (first row) -> False
        g = df.groupby(key_col, sort=False)
        out = pd.DataFrame({
            key_col: g.size().index,
            "n_events": g.size().to_numpy().astype("int64"),
            "n_late": late.groupby(df[key_col], sort=False).sum()
                          .to_numpy().astype("int64"),
        })
        return out

    return hash_aggregate(ds.select_columns([key_col, order_col, ts_col]),
                          [key_col], bucket_late, num_buckets=num_buckets)


def dod_growth(
    ds,
    key_col: str = "event_type",
    ts_col: str = "ts",
    num_buckets: int = 64,
):
    """Day-over-day volume growth per key: for every (key, day) with a
    preceding calendar day present, the count, the previous day's count,
    and the growth in truncated basis points (DuckDB ``//`` semantics via
    :func:`raygraph.ops.relational.trunc_div` — growth can be negative).

    Combiner preagg shrinks the stream to (key, day) counts; the
    day-vs-day-1 match is a vectorized self-merge inside one
    hash-bucketed pass per key bucket — no second shuffle."""
    from .relational import compact_nonempty, hash_aggregate, preagg_sum, trunc_div

    def day_part(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        day = (df[ts_col].astype("datetime64[ns]").astype("int64")
               // (86_400 * 10**9))
        return pa.Table.from_pandas(pd.DataFrame({
            key_col: df[key_col], "day": day}), preserve_index=False)

    counts = preagg_sum(ds.map_batches(day_part, batch_format="pyarrow"),
                        [key_col, "day"], {}, counts="n")
    counts = compact_nonempty(counts.materialize())

    def bucket_growth(df: pd.DataFrame) -> pd.DataFrame:
        prev = df.rename(columns={"n": "n_prev"}).copy()
        prev["day"] = prev["day"] + 1
        m = df.merge(prev, on=[key_col, "day"])
        m["growth_bp"] = trunc_div(10_000 * (m["n"] - m["n_prev"]),
                                   m["n_prev"])
        return m[[key_col, "day", "n", "n_prev", "growth_bp"]]

    return hash_aggregate(counts, [key_col], bucket_growth,
                          num_buckets=num_buckets)


def cusum_changepoint(
    ds,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket_s: int = 3600,
    num_buckets: int = 64,
):
    """Change-point detection per key over the bucketed event-count
    series: the bucket where the centered cumulative sum deviates most
    from the uniform-rate line (classic CUSUM changepoint estimator),
    in exact integers.

    For the per-key series x_1..x_T (counts per ``bucket_s`` bucket,
    only buckets with events, ordered by time) with total S, the
    deviation at step t is D_t = T·cumsum_t − t·S — the centered CUSUM
    scaled by T so it stays integral. Output per key: ``cusum_hour``
    (the bucket start, epoch seconds, of max |D_t|; ties → earliest)
    and ``dstat`` = max |D_t|.

    Scale shape mirrors :func:`dod_growth`: a combiner preagg shrinks
    the stream to (key, bucket) counts — bounded by keys × time
    buckets, not events — then one hash-bucketed vectorized pass
    (sort + grouped cumsum) per key bucket computes the scan; no
    per-key Python calls."""
    from .relational import compact_nonempty, hash_aggregate, preagg_sum

    def bucket_part(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        hour = (df[ts_col].astype("datetime64[ns]").astype("int64")
                // (bucket_s * 10**9)) * bucket_s
        return pa.Table.from_pandas(pd.DataFrame({
            key_col: df[key_col], "cusum_hour": hour}),
            preserve_index=False)

    counts = preagg_sum(ds.map_batches(bucket_part, batch_format="pyarrow"),
                        [key_col, "cusum_hour"], {}, counts="n")
    counts = compact_nonempty(counts.materialize())

    def bucket_scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, "cusum_hour"], kind="mergesort")
        g = df.groupby(key_col, sort=False)
        cum = g["n"].cumsum()
        total = g["n"].transform("sum")
        size = g["n"].transform("size")
        t = g.cumcount() + 1
        df = df.assign(dstat=(size * cum - t * total).abs())
        df = df.sort_values([key_col, "dstat", "cusum_hour"],
                            ascending=[True, False, True],
                            kind="mergesort")
        top = df.groupby(key_col, sort=False).head(1)
        return top[[key_col, "cusum_hour", "dstat"]]

    return hash_aggregate(counts, [key_col], bucket_scan,
                          num_buckets=num_buckets)


def autocorr_lag1(
    ds,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket_s: int = 3600,
    num_buckets: int = 64,
):
    """Lag-1 autocorrelation of the per-key bucketed count series —
    the burstiness / periodicity signal of an event stream. Pairs are
    consecutive PRESENT buckets (ordered by time), Pearson r over
    (x_t, x_{t+1}) in floor-at-bp integers with the exact-moment
    discipline of ``lineitem_corr``: integer moment sums (counts are
    integers, so sums are exact), ONE conversion to double, same
    literal op order as the SQL (num::DOUBLE / sqrt(a::DOUBLE *
    b::DOUBLE)). Keys whose series is constant (zero variance on
    either side) are dropped, mirroring the oracle's WHERE guard.

    Scale shape = :func:`cusum_changepoint`: combiner preagg to (key,
    bucket) counts, one hash-bucketed vectorized pass; the key-level
    finalize runs per distinct key (bounded by #keys, not rows) in
    exact Python ints — the HUGEINT analog."""
    import math

    from .relational import compact_nonempty, hash_aggregate, preagg_sum

    def bucket_part(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        hour = (df[ts_col].astype("datetime64[ns]").astype("int64")
                // (bucket_s * 10**9)) * bucket_s
        return pa.Table.from_pandas(pd.DataFrame({
            key_col: df[key_col], "hour": hour}), preserve_index=False)

    counts = preagg_sum(ds.map_batches(bucket_part, batch_format="pyarrow"),
                        [key_col, "hour"], {}, counts="n")
    counts = compact_nonempty(counts.materialize())

    def bucket_corr(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, "hour"], kind="mergesort")
        g = df.groupby(key_col, sort=False)
        df = df.assign(y=g["n"].shift(-1))
        df = df.loc[df["y"].notna()]
        rows = []
        for key, part in df.groupby(key_col, sort=False):
            x = [int(v) for v in part["n"]]
            y = [int(v) for v in part["y"]]
            n = len(x)
            sx, sy = sum(x), sum(y)
            sxx = sum(v * v for v in x)
            syy = sum(v * v for v in y)
            sxy = sum(a * b for a, b in zip(x, y))
            vx, vy = n * sxx - sx * sx, n * syy - sy * sy
            if vx <= 0 or vy <= 0:
                continue
            r_bp = math.floor(float(10_000 * (n * sxy - sx * sy))
                              / math.sqrt(float(vx) * float(vy)))
            rows.append((key, n, r_bp))
        return pd.DataFrame(rows, columns=[key_col, "n_pairs", "corr_bp"])

    return hash_aggregate(counts, [key_col], bucket_corr,
                          num_buckets=num_buckets)


def markov_stationary(ds, iters: int = 3, scale: int = 10**12,
                      key_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      order_col: str = "event_id"):
    """Stationary-distribution estimate of the event-type Markov chain:
    ``iters`` synchronous power iterations v' (y) = Σ_x (v(x) // tot(x))
    · n(x, y) from the uniform start v0 = scale // K, in exact integer
    (floor) arithmetic — the fixed-point discipline of
    :func:`raygraph.ops.graph.pagerank` applied to the transition
    matrix. Types with no outgoing transitions drop their mass
    (documented sink semantics, mirrored by the SQL oracle's inner join
    on the contribution side).

    The heavy step is :func:`type_transitions` (per-user ordered pairing
    + combiner preagg) — the stream shrinks to the (#types)² transition
    matrix, which is inherently tiny, so the iteration itself runs on
    the driver in exact Python ints (the HUGEINT analog); only the
    matrix crosses the wire."""
    import ray.data as rd

    trans = type_transitions(ds, key_col=key_col, ts_col=ts_col,
                             type_col=type_col, tie_col=order_col)
    tm = trans.to_pandas()
    n = {(f, t): int(v) for f, t, v in
         zip(tm["from_type"], tm["to_type"], tm["n"])}
    tot: dict[str, int] = {}
    for (f, _), v in n.items():
        tot[f] = tot.get(f, 0) + v
    types = sorted(set(tm["from_type"]) | set(tm["to_type"]))
    k = len(types)
    if k == 0:
        return rd.from_arrow(pa.table({
            type_col: pa.array([], pa.string()),
            "prob_e12": pa.array([], pa.int64())}))
    v = {t: scale // k for t in types}
    for _ in range(iters):
        contrib = {x: v[x] // tot[x] for x in types if x in tot}
        nxt = {t: 0 for t in types}
        for (f, t), c in n.items():
            if f in contrib:
                nxt[t] += contrib[f] * c
        v = nxt
    return rd.from_arrow(pa.table({
        type_col: pa.array(types, pa.string()),
        "prob_e12": pa.array([v[t] for t in types], pa.int64()),
    }))


def time_weighted_avg(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    num_buckets: int = 64,
):
    """Time-weighted average value per key (the metering / gauge
    aggregation: each value holds until the key's next event). Exact
    integers: value truncated to 1e-4 units, weighted by the
    microsecond gap to the next event, final division via
    :func:`raygraph.ops.relational.trunc_div` (DuckDB ``//``
    semantics). Keys with < 2 events (no segment) or zero total span
    are dropped, mirroring the oracle's guards.

    One key-hash exchange; inside each bucket the pairing is a
    vectorized grouped shift (no per-key Python). int64 segment sums
    bound the design: Σ v·gap per key must stay < 2^63 (≈ 10^6-unit
    values × 29 years of microseconds) — beyond that, split the
    window."""
    from .relational import compact_nonempty, hash_aggregate, trunc_div

    def narrow(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(pd.DataFrame({
            key_col: df[key_col],
            "t": df[ts_col].astype("datetime64[us]").astype("int64"),
            order_col: df[order_col],
            "v": np.trunc(df[value_col].to_numpy() * 10_000)
                .astype("int64"),
        }), preserve_index=False)

    narrow_ds = compact_nonempty(
        ds.map_batches(narrow, batch_format="pyarrow").materialize())

    def bucket_twa(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, "t", order_col], kind="mergesort")
        g = df.groupby(key_col, sort=False)
        df = df.assign(gap=g["t"].shift(-1) - df["t"])
        df = df.loc[df["gap"].notna()]
        df["gap"] = df["gap"].astype("int64")
        df["vw"] = df["v"] * df["gap"]
        agg = df.groupby(key_col, sort=False).agg(
            n_segments=("gap", "size"), span=("gap", "sum"),
            wsum=("vw", "sum")).reset_index()
        agg = agg.loc[agg["span"] > 0]
        agg["twa_e4"] = trunc_div(agg["wsum"], agg["span"])
        return agg[[key_col, "n_segments", "twa_e4"]]

    return hash_aggregate(narrow_ds, [key_col], bucket_twa,
                          num_buckets=num_buckets)


def zscore_outliers(
    ds,
    threshold_bp: int = 20_000,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket_s: int = 3600,
    num_buckets: int = 64,
):
    """Volume-anomaly screen: hourly buckets whose count deviates from
    the key's mean by ≥ ``threshold_bp``/10⁴ standard deviations, with
    the z-score itself in floor-at-bp integers — z = (x·T − S) /
    sqrt(T·Sxx − S²) over the key's present-bucket series (T buckets,
    sum S, sum-of-squares Sxx; integer moments, ONE double conversion,
    the ``lineitem_corr`` discipline). Constant series (zero variance)
    are dropped like the oracle's WHERE guard.

    Scale shape = :func:`cusum_changepoint`: combiner preagg to (key,
    bucket) counts, then one hash-bucketed pass; moments are exact
    Python ints per key (HUGEINT analog, bounded by #keys), the
    filter + z computation over the bucket rows is vectorized."""
    import math

    from .relational import compact_nonempty, hash_aggregate, preagg_sum

    def bucket_part(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        hour = (df[ts_col].astype("datetime64[ns]").astype("int64")
                // (bucket_s * 10**9)) * bucket_s
        return pa.Table.from_pandas(pd.DataFrame({
            key_col: df[key_col], "hour": hour}), preserve_index=False)

    counts = preagg_sum(ds.map_batches(bucket_part, batch_format="pyarrow"),
                        [key_col, "hour"], {}, counts="n")
    counts = compact_nonempty(counts.materialize())

    def bucket_z(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for key, part in df.groupby(key_col, sort=False):
            xs = [int(v) for v in part["n"]]
            t, s = len(xs), sum(xs)
            sxx = sum(v * v for v in xs)
            var = t * sxx - s * s
            if var <= 0:
                continue
            den = math.sqrt(float(var))
            z = np.floor(10_000
                         * (t * part["n"].to_numpy("int64") - s).astype(
                             "float64") / den).astype("int64")
            keep = np.abs(z) >= threshold_bp
            if keep.any():
                outs.append(pd.DataFrame({
                    key_col: key,
                    "hour": part["hour"].to_numpy()[keep],
                    "n": part["n"].to_numpy("int64")[keep],
                    "z_bp": z[keep],
                }))
        if not outs:
            return pd.DataFrame({key_col: pd.Series([], dtype=object),
                                 "hour": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "z_bp": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    return hash_aggregate(counts, [key_col], bucket_z,
                          num_buckets=num_buckets)


def attribution_last_touch(
    ds,
    gap_s: int = 1800,
    convert_type: str = "purchase",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    order_col: str = "event_id",
    num_buckets: int = 64,
):
    """Last-touch conversion attribution: every ``convert_type`` event
    credits its value (1e-4-unit integers) to the type of the latest
    NON-conversion event strictly before it in the same session
    (``gap_s`` inactivity sessions, the sessionize rule); conversions
    with no prior in-session touch credit ``'direct'``. Output is the
    per-touch-type histogram (n_purchases, sum_value_e4).

    One key-hash exchange; inside each bucket everything is grouped
    vectorized pandas: gap-cumsum session ids, a grouped forward-fill
    of touch types + one grouped shift (the lag-IGNORE-NULLS analog),
    then a touch-type-sized partial that the final combiner groupby
    merges."""
    from .relational import compact_nonempty, hash_aggregate, preagg_sum

    gap_us = gap_s * 1_000_000

    def narrow(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(pd.DataFrame({
            key_col: df[key_col],
            "t": df[ts_col].astype("datetime64[us]").astype("int64"),
            order_col: df[order_col],
            type_col: df[type_col],
            "v": np.round(df[value_col].to_numpy() * 10_000)
                .astype("int64"),
        }), preserve_index=False)

    narrow_ds = compact_nonempty(
        ds.map_batches(narrow, batch_format="pyarrow").materialize())

    def bucket_attr(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, "t", order_col], kind="mergesort")
        g = df.groupby(key_col, sort=False)
        new_sess = ((df["t"] - g["t"].shift(1)) > gap_us)
        new_sess |= g.cumcount() == 0
        df = df.assign(sess=new_sess.astype("int64")
                       .groupby(df[key_col]).cumsum())
        keys2 = [key_col, "sess"]
        touch = df[type_col].where(df[type_col] != convert_type)
        ff = touch.groupby([df[k] for k in keys2]).ffill()
        prev = ff.groupby([df[k] for k in keys2]).shift(1)
        conv = df.loc[df[type_col] == convert_type].assign(
            touch_type=prev.loc[df[type_col] == convert_type]
            .fillna("direct"))
        part = conv.groupby("touch_type", sort=False).agg(
            n_purchases=("v", "size"),
            sum_value_e4=("v", "sum")).reset_index()
        return part

    partials = hash_aggregate(narrow_ds, [key_col], bucket_attr,
                              num_buckets=num_buckets)
    return preagg_sum(partials, ["touch_type"],
                      {"sum_value_e4": "sum_value_e4",
                       "n_purchases": "n_purchases"})


def trend_slope(
    ds,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket_s: int = 3600,
    num_buckets: int = 64,
):
    """Volume trend per key: the least-squares slope of bucket count vs
    bucket INDEX (1..T over the key's present buckets, time-ordered), in
    exact floor-at-1e-6 integers — slope_e6 = floor(1e6·(T·Σxy − Σx·Σy)
    / (T·Σx² − (Σx)²)) with x the index and y the count. Pure integer
    moments (no sqrt), one double division at the end; keys with a
    single bucket are dropped (zero x-variance), mirroring the oracle.

    Scale shape = :func:`cusum_changepoint`: combiner preagg to (key,
    bucket) counts, one hash-bucketed pass, exact-Python-int finalize
    per key (HUGEINT analog)."""
    import math

    from .relational import compact_nonempty, hash_aggregate, preagg_sum

    def bucket_part(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        hour = (df[ts_col].astype("datetime64[ns]").astype("int64")
                // (bucket_s * 10**9)) * bucket_s
        return pa.Table.from_pandas(pd.DataFrame({
            key_col: df[key_col], "hour": hour}), preserve_index=False)

    counts = preagg_sum(ds.map_batches(bucket_part, batch_format="pyarrow"),
                        [key_col, "hour"], {}, counts="n")
    counts = compact_nonempty(counts.materialize())

    def bucket_slope(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, "hour"], kind="mergesort")
        rows = []
        for key, part in df.groupby(key_col, sort=False):
            ys = [int(v) for v in part["n"]]
            t = len(ys)
            if t < 2:
                continue
            sx = t * (t + 1) // 2
            sxx = t * (t + 1) * (2 * t + 1) // 6
            sy = sum(ys)
            sxy = sum((i + 1) * y for i, y in enumerate(ys))
            den = t * sxx - sx * sx
            slope_e6 = math.floor(
                float(10**6 * (t * sxy - sx * sy)) / float(den))
            rows.append((key, t, slope_e6))
        return pd.DataFrame(rows,
                            columns=[key_col, "n_buckets", "slope_e6"])

    return hash_aggregate(counts, [key_col], bucket_slope,
                          num_buckets=num_buckets)


def rolling_distinct_users(
    ds,
    window_hours: int = 24,
    key_col: str = "user_id",
    ts_col: str = "ts",
):
    """Sliding-window COUNT DISTINCT: for every event hour, the number
    of distinct users seen in the trailing ``window_hours`` hours.

    Plan: the stream first shrinks to DISTINCT (hour, user) pairs (a
    combiner + one hash-bucketed dedup — the distinct_count discipline),
    each pair then fans out to the ≤ ``window_hours`` window anchors it
    can serve (exchange ≤ W × pairs, never W × events), anchors are
    clipped to hours that actually occur (the hour inventory is
    time-span-sized — hours-per-year small — so it rides the task
    closure), and an exact distinct count per anchor finishes. Output:
    (window_hour epoch-hour int64, n_users)."""
    from .relational import compact_nonempty, distinct_count, hash_aggregate

    def hour_part(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        hour = (df[ts_col].astype("datetime64[ns]").astype("int64")
                // (3_600 * 10**9))
        return pa.Table.from_pandas(
            pd.DataFrame({"h": hour, key_col: df[key_col]})
            .drop_duplicates(), preserve_index=False)

    pairs = hash_aggregate(ds.map_batches(hour_part, batch_format="pyarrow"),
                           ["h", key_col], lambda df: df.drop_duplicates())
    pairs = compact_nonempty(pairs.materialize())

    hours = np.sort(pairs.groupby("h").count().to_pandas()["h"].to_numpy())

    def fan_out(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        n = len(df)
        if not n:
            return pa.table({"window_hour": pa.array([], pa.int64()),
                             key_col: pa.array([], pa.int64())})
        offs = np.arange(window_hours, dtype="int64")
        wh = np.repeat(df["h"].to_numpy(), window_hours) + np.tile(offs, n)
        users = np.repeat(df[key_col].to_numpy(), window_hours)
        keep = np.isin(wh, hours)
        return pa.table({"window_hour": pa.array(wh[keep], pa.int64()),
                         key_col: pa.array(users[keep])})

    fanned = pairs.map_batches(fan_out, batch_format="pyarrow")
    return distinct_count(fanned, ["window_hour"], key_col, out="n_users")


def ewma_tail_weighted(ds, window: int = 8, key_col: str = "user_id",
                       ts_col: str = "ts", order_col: str = "event_id",
                       value_col: str = "value_e4",
                       num_buckets: int = 128):
    """Per-key exponentially-weighted tail sum — the exact-integer form
    of an EWMA smoother evaluated at each key's LAST event: the newest
    of the final ``window`` events gets weight ``2**(window-1)``, the
    one before it ``2**(window-2)``, … (an alpha=1/2 exponential decay
    truncated to the window so the result stays a bit-exact int64 —
    the idiom this repo uses everywhere a float fold would drift).

    A true EWMA is a sequential fold; the windowed form restores
    parallelism: only each key's tail participates, so the plan is one
    key-hash exchange (``hash_aggregate``) and a fully vectorized
    per-bucket pandas pass (sort → groupby tail → reverse-cumcount
    weights → weighted segment sum). Nothing is ordered globally and
    no per-row Python runs. Output: one row per key
    (key, n_events, ews — the weighted sum in the value's scale).
    """
    from .relational import hash_aggregate

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        n = df.groupby(key_col, sort=False)[value_col].size() \
              .rename("n_events")
        tail = df.sort_values([key_col, ts_col, order_col]) \
                 .groupby(key_col, sort=False).tail(window)
        j = tail.groupby(key_col, sort=False).cumcount(ascending=False)
        w = np.int64(1) << (window - 1 - j.to_numpy())
        tail = tail.assign(__term=tail[value_col].to_numpy() * w)
        ews = tail.groupby(key_col, sort=False)["__term"].sum() \
                  .rename("ews")
        out = pd.concat([n, ews], axis=1).reset_index()
        out["n_events"] = out["n_events"].astype("int64")
        out["ews"] = out["ews"].astype("int64")
        return out

    return hash_aggregate(ds, [key_col], fold, num_buckets=num_buckets)


def interval_coverage(ds, length_us: int, key_col: str = "user_id",
                      ts_col: str = "ts_us", num_buckets: int = 128):
    """Per-key union length of overlapping fixed-length intervals
    [ts, ts+length) — the "total active time" reduction (merge-overlaps
    / gaps-and-islands) that a naive implementation does with a
    sequential sweep. Parallel form: one key-hash exchange, then a
    fully vectorized per-bucket pass — sort, per-key running cummax of
    interval ends, and the identity

        covered = Σ_i max(0, cummax_i − max(prev_cummax_i, start_i))

    which charges each row exactly the new time it uncovers (0 when
    fully inside an earlier interval, start-gap-clipped when it opens a
    new island). Output per key: n_events, n_islands, covered_us — all
    exact int64 µs.
    """
    from .relational import hash_aggregate

    NEG = np.int64(-(1 << 62))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col])
        start = df[ts_col].to_numpy().astype("int64")
        end = start + np.int64(length_us)
        g = df.assign(__end=end).groupby(key_col, sort=False)
        cm = g["__end"].cummax().to_numpy()
        prev = np.concatenate(([NEG], cm[:-1]))
        first = g.cumcount().to_numpy() == 0
        prev[first] = NEG
        island = first | (start > prev)
        contrib = np.maximum(
            np.int64(0), cm - np.maximum(prev, start))
        out = pd.DataFrame({key_col: df[key_col].to_numpy(),
                            "n_events": np.int64(1),
                            "n_islands": island.astype("int64"),
                            "covered_us": contrib})
        out = out.groupby(key_col, as_index=False).sum()
        for c in ("n_events", "n_islands", "covered_us"):
            out[c] = out[c].astype("int64")
        return out

    return hash_aggregate(ds, [key_col], fold, num_buckets=num_buckets)


def scd2_intervals(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    num_buckets: int = 128,
):
    """Type-2 slowly-changing-dimension fold: collapse a per-key event
    stream into validity intervals — one row per RUN of consecutive
    equal ``attr_col`` values with (key, value, valid_from, valid_to,
    version), ``valid_to`` NULL for the open current interval. This is
    the change-data-capture → dimension-table primitive of warehouse
    ingestion.

    Hash-bucketed like :func:`sessionize`: each reduce task folds ALL
    keys of its bucket in one vectorized pandas pass (mergesort by
    (key, ts, value) for deterministic tie order, groupby shift for
    change detection, shift(-1) for interval close). Output is
    change-points only — at web scale orders of magnitude below the
    event log — and a key's rows are co-located by the bucket hash, the
    one partitioning assumption."""
    from .relational import hash_aggregate

    def bucket_scd(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, attr_col], kind="mergesort",
                            ignore_index=True)
        g = df.groupby(key_col, sort=False)
        prev = g[attr_col].shift()
        ch = df[prev.isna() | (prev != df[attr_col])].copy()
        gc = ch.groupby(key_col, sort=False)
        ch["valid_to"] = gc[ts_col].shift(-1)
        ch["version"] = gc.cumcount().astype("int64") + 1
        ch = ch.rename(columns={ts_col: "valid_from", attr_col: "value"})
        return ch[[key_col, "value", "valid_from", "valid_to", "version"]]

    return hash_aggregate(ds, [key_col], bucket_scd,
                          num_buckets=num_buckets)


def running_distinct(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    tie_col: str = "event_id",
    out_col: str = "n_distinct",
    num_buckets: int = 128,
):
    """Per-key running DISTINCT count ordered by (ts, tie) — the
    ``COUNT(DISTINCT attr) OVER (PARTITION BY key ORDER BY ts)`` window
    engines refuse to run directly (DuckDB included: the oracle has to
    emulate it with a first-occurrence flag, which is exactly this
    op's plan).

    Hash-bucketed like :func:`running_sum`: per bucket ONE mergesort by
    (key, ts, tie), a vectorized first-occurrence mask
    (``~duplicated([key, attr])``) and a per-key cumsum — no per-row
    Python, and a key's rows co-located by the bucket hash is the one
    partitioning assumption."""
    from .relational import hash_aggregate

    def bucket_rd(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, tie_col], kind="mergesort",
                            ignore_index=True)
        first = (~df.duplicated([key_col, attr_col])).astype("int64")
        df[out_col] = first.groupby(df[key_col], sort=False).cumsum() \
            .astype("int64")
        return df

    return hash_aggregate(ds, [key_col], bucket_rd,
                          num_buckets=num_buckets)
