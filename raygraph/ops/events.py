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


def sessionize(
    ds,
    gap_sec: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
):
    """Gap-based sessions per key: a new session starts when the time since
    the previous event of the same key exceeds ``gap_sec``. Returns one row
    per (key, session_id) with start/end/n_events.

    The per-key group is sorted by ts inside ``map_groups`` — the stated
    ordering assumption of every stream-shaped op here."""

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        us = g[ts_col].astype("datetime64[ns]").astype("int64") // 1_000
        gap_us = gap_sec * 1_000_000
        new = (us.diff().fillna(gap_us + 1) > gap_us).cumsum()
        out = g.groupby(new).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size"),
        )
        out[key_col] = g[key_col].iloc[0]
        out["session_id"] = range(len(out))
        return out.reset_index(drop=True)[
            [key_col, "session_id", "session_start", "session_end", "n_events"]
        ]

    return ds.groupby(key_col).map_groups(sessions, batch_format="pandas")


def session_counts(ds, gap_sec: int = 1800, key_col: str = "user_id",
                   ts_col: str = "ts"):
    """Sessions per key (the SQL-oracle-friendly aggregate of
    :func:`sessionize`)."""

    def count(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        us = g[ts_col].astype("datetime64[ns]").astype("int64") // 1_000
        gap_us = gap_sec * 1_000_000
        n = int((us.diff().fillna(gap_us + 1) > gap_us).sum())
        return pd.DataFrame({key_col: [g[key_col].iloc[0]], "n_sessions": [n]})

    return ds.groupby(key_col).map_groups(count, batch_format="pandas")
