"""Relational building blocks with explicit scale discipline.

These wrap the recurring patterns (SURVEY.md §4.2, ray_guide):

* broadcast hash join — small side shipped ONCE via ``ray.put``, lookup
  inside ``map_batches``; no shuffle of the big side. The distributed
  analog of the reference's driver-local metadata joins (A3/A4).
* partial (combiner) aggregation — per-batch pandas groupby emitting one
  row per key per batch, then a small final groupby. Turns an all-to-all
  shuffle of N rows into one of ≤ #keys × #batches rows.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa


def tree_aggregate(ds, combine, finalize=None, fanout: int = 32,
                   precombined: bool = False):
    """Tree (combiner) aggregation: per-block vectorized ``combine`` →
    coalesce to ``fanout`` blocks → combine → coalesce to 1 → combine (+
    optional ``finalize``) — no sort/hash shuffle at all.

    ``combine(df) -> df`` must be associative and idempotent under
    repeated application (sum / min / max / first-by-sorted-key are;
    plain mean is not — carry (sum, count) instead). Repartition here
    moves blocks without key-partitioning, so correctness never depends
    on row placement; order-insensitive combines make the result
    deterministic at any parallelism.

    Right when the distinct-key set fits one block at the root (entity
    inventories, per-edge rollups, window keys). For cardinalities beyond
    that, use ``groupby().aggregate(...)`` (sort-shuffle) instead — the
    root block here is the explicit scaling bound.

    Pass ``precombined=True`` when the input blocks are already the
    output of a per-block combine (a partials stage) — the leaf combine
    is then skipped instead of re-grouping identical granularity.
    """

    def cb(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(combine(batch.to_pandas()),
                                    preserve_index=False)

    def cb_final(batch: pa.Table) -> pa.Table:
        df = combine(batch.to_pandas())
        if finalize is not None:
            df = finalize(df)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = ds if precombined else ds.map_batches(cb, batch_format="pyarrow",
                                                batch_size=None)
    out = out.repartition(fanout).map_batches(cb, batch_format="pyarrow",
                                              batch_size=None)
    return out.repartition(1).map_batches(cb_final, batch_format="pyarrow",
                                          batch_size=None)


def hash_aggregate(ds, key_cols, reduce_df, num_buckets: int = 128,
                   precombined: bool = True):
    """Hash-partitioned aggregate: bucket = stable_hash(key columns) %
    ``num_buckets``; one groupby on the SMALL INT bucket key routes every
    key's rows to exactly one vectorized pandas ``reduce_df`` call.

    Compared to ``groupby(keys)`` this sorts by a single int64 instead of
    multiple string columns, and compared to :func:`tree_aggregate` the
    reduce runs on ``num_buckets`` parallel tasks instead of one root
    block — the per-bucket reduce is the scaling unit, so it holds as
    long as (distinct keys / num_buckets) fits a task. Bucket sizes are
    balanced by hashing over high-cardinality keys; per-group Python
    overhead is paid ``num_buckets`` times, not once per key.

    ``reduce_df(df) -> df`` sees ALL rows of every key hashed to its
    bucket (exact, any aggregation incl. nunique/argmax is safe).
    """
    key_cols = list(key_cols)

    def add_bucket(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        h = pd.util.hash_pandas_object(df[key_cols], index=False)
        df["__bucket"] = (h % num_buckets).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        # emit Arrow, not pandas: downstream joins require Arrow blocks,
        # and converting here avoids an extra coerce+materialize pass
        return pa.Table.from_pandas(reduce_df(g.drop(columns="__bucket")),
                                    preserve_index=False)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def coerce_schema(ds, schema: pa.Table | pa.Schema):
    """Coerce every block of ``ds`` to ``schema``.

    Ray's groupby/map_groups emits ZERO-COLUMN empty Arrow blocks for
    partitions that received no groups; ``Dataset.join``'s per-partition
    pyarrow join then fails with "No match ... for key field reference".
    This pads those blocks to the declared schema and casts the rest, so
    any aggregate output can feed a join. Also normalizes pandas blocks
    to Arrow.
    """

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0:
            return schema.empty_table()
        return batch.select(schema.names).cast(schema)

    return ds.map_batches(fn, batch_format="pyarrow")


def dataset_arrow_schema(ds) -> pa.Schema:
    """Arrow schema of a Dataset (Ray's Schema wrapper → pyarrow).

    Pandas-backed datasets report PYTHON types (``object`` for strings)
    in ``schema().types``; normalize those to Arrow so the result can
    build tables/casts."""
    s = ds.schema()
    fields = []
    for n, t in zip(s.names, s.types):
        if not isinstance(t, pa.DataType):
            if t is object or t is str:
                t = pa.string()
            else:
                t = pa.from_numpy_dtype(np.dtype(t))
        fields.append((n, t))
    return pa.schema(fields)


def compact_nonempty(ds):
    """MATERIALIZED Dataset → Dataset without zero-row blocks.

    Ray's sort-shuffle groupby emits schemaless ZERO-COLUMN empty blocks
    for output partitions that received no groups, and map UDFs are
    skipped on empty blocks — so neither ``coerce_schema`` nor
    ``repartition`` can repair them and any downstream ``Dataset.join``
    fails ("No match ... for key field reference"). This drops them by
    block METADATA only (no block is fetched). Blocks must already be
    Arrow (run :func:`coerce_schema` + ``materialize`` first for
    pandas-block aggregate outputs). Returns None when every block is
    empty.
    """
    import ray.data as rd

    refs = []
    for bd in ds.iter_internal_ref_bundles():
        for ref, meta in zip(bd.block_refs, bd.metadata):
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return None
    return rd.from_arrow_refs(refs)


def broadcast_join(
    big,
    small_df: pd.DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    small_ref=None,
):
    """Join a big Dataset against a small pandas table without a shuffle.

    Pass ``small_ref=ray.put(small_df)`` to ship the table once per node;
    each task/actor fetches it zero-copy from the local object store.
    """
    import ray

    if small_ref is None:
        small_ref = ray.put(small_df)

    def join_batch(batch: pa.Table) -> pa.Table:
        import ray as _ray

        sm = _ray.get(small_ref)
        df = batch.to_pandas()
        out = df.merge(sm, on=on, how=how)
        return pa.Table.from_pandas(out, preserve_index=False)

    return big.map_batches(join_batch, batch_format="pyarrow")


def _join_partitions(approx_rows: int | None = None) -> int:
    """Partition count for a Dataset.join, clamped to cluster CPUs.

    Ray 2.49 keeps one aggregator ACTOR alive per join partition for the
    duration of the join; requesting more partitions than the cluster has
    CPUs deadlocks the actor pool. Size to the data when a row estimate
    is available so toy inputs don't pay 32 actor spin-ups.
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    if approx_rows is not None:
        # ~250k rows per aggregator: measured on the 600k-row
        # lineitem⋈orders join, 4 partitions beat 10 (3.8 s vs 4.6 s)
        # and 32 (6.5-8 s) — per-partition actor spin-up dominates until
        # partitions carry real data; the cap still scales to cluster
        # width for genuinely large inputs
        return max(2, min(cpus, approx_rows // 250_000 + 2))
    return max(2, cpus)


def shuffle_join(
    left,
    right,
    on: str | Sequence[str],
    right_on: str | Sequence[str] | None = None,
    how: str = "inner",
    num_partitions: int | None = None,
):
    """Distributed hash-shuffle join of two big Datasets (``Dataset.join``).

    Use when BOTH sides are too large to broadcast (lineitem ⋈ orders,
    edges ⋈ ranks): each side is hash-partitioned on the key, equal
    buckets meet on one aggregator, nothing funnels through the driver.
    For a small right side prefer :func:`broadcast_join` (no shuffle at
    all). ``how`` accepts Ray's types incl. ``left_semi`` /
    ``left_anti`` — the distributed EXISTS / NOT EXISTS.

    Both inputs must carry Arrow blocks with a declared schema (plain
    reads and pyarrow map_batches outputs qualify). Outputs of
    groupby/map_groups must be repaired first (``coerce_schema`` +
    ``materialize`` + ``compact_nonempty``) — Ray emits schemaless
    zero-row blocks for empty partitions and the pyarrow join inside
    fails on them; the same applies when chaining two joins (compact the
    intermediate).
    """
    on = (on,) if isinstance(on, str) else tuple(on)
    if right_on is not None:
        right_on = (right_on,) if isinstance(right_on, str) else tuple(right_on)
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions or _join_partitions(),
        on=on,
        right_on=right_on,
    )


def distinct_count(ds, group_cols, distinct_col: str, out: str = "n_distinct",
                   num_buckets: int = 64):
    """Exact COUNT(DISTINCT distinct_col) per group, two-level.

    Level 1: per-batch ``drop_duplicates`` on (group, distinct) — each
    batch contributes each pair once, so the shuffle moves ≤ distinct
    pairs × batches rows, not all rows. Level 2: hash-bucketed global
    dedup of the pairs (vectorized, one task per bucket), then a partial
    count per (bucket, group) so the final groupby merges bucket-sized
    partials instead of re-shuffling the pair set. Scales while the
    distinct-pair set is shuffleable — the exact analog of the
    approximate-sketch tradeoff (a HLL would cap the shuffle at
    #groups × sketch bytes at the cost of exactness).
    """
    group_cols = list(group_cols)
    keys = group_cols + [distinct_col]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(df[keys].drop_duplicates(),
                                    preserve_index=False)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.drop_duplicates()
            .groupby(group_cols, as_index=False)
            .agg(**{out: (distinct_col, "size")})
        )

    dd = hash_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                        keys, per_bucket, num_buckets=num_buckets)
    from ray.data.aggregate import Sum

    return dd.groupby(group_cols if len(group_cols) > 1 else group_cols[0]) \
        .aggregate(Sum(out, alias_name=out))


def grouped_quantiles(ds, group_cols, value_col: str,
                      qs: Sequence[float] = (0.5, 0.9, 0.99),
                      prefix: str = "p", num_buckets: int = 64):
    """Exact discrete quantiles (percentile_disc) per group over an
    integer-valued column, without a global sort.

    Pipeline: per-batch value-count partials → global (group, value,
    count) via :func:`preagg_sum` (shuffle moves distinct values, not
    rows) → per-group cumulative selection in one hash-bucketed reduce.
    ``percentile_disc(q)`` = smallest value whose cumulative count ≥
    ceil(q · n) — integer/exact, so a SQL oracle reproduces it
    bit-for-bit (no float interpolation). Scales while the distinct
    (group, value) set is shuffleable; discretize the value (e.g. cents)
    to bound it.
    """
    import math

    group_cols = list(group_cols)
    counts = preagg_sum(ds.select_columns(group_cols + [value_col]),
                        group_cols + [value_col], {}, counts="__cnt")

    out_cols = [f"{prefix}{int(round(q * 100)):02d}" for q in qs]

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for gkey, g in df.groupby(group_cols, sort=False):
            g = g.sort_values(value_col, kind="mergesort")
            cum = g["__cnt"].cumsum().to_numpy()
            n = int(cum[-1])
            vals = g[value_col].to_numpy()
            row = dict(zip(group_cols, gkey if isinstance(gkey, tuple) else (gkey,)))
            for q, oc in zip(qs, out_cols):
                rank = max(1, math.ceil(q * n))
                row[oc] = vals[int(np.searchsorted(cum, rank))]
            rows.append(row)
        return pd.DataFrame(rows, columns=group_cols + out_cols)

    return hash_aggregate(counts, group_cols, per_group,
                          num_buckets=num_buckets)


def deterministic_sample(ds, keep_per_mille: int, id_col: str = "doc_id"):
    """Reproducible row sampling: keep a row iff
    ``md5_60bit(str(id)) % 1000 < keep_per_mille``.

    Content-keyed, not RNG-keyed — the same rows survive at any
    parallelism, on any engine (a DuckDB oracle reproduces the exact
    sample), and re-runs of a pipeline see a stable split. The md5 per
    row IS the kernel here (id strings are short); no shuffle, pure
    filter pushed into the stream.
    """
    import hashlib

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pandas().astype(str)
        h = ids.map(
            lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 1000
        )
        return batch.filter(pa.array((h < keep_per_mille).to_numpy()))

    return ds.map_batches(fn, batch_format="pyarrow")


def group_topk(ds, group_cols, order_col: str, k: int,
               tie_col: str | None = None, num_buckets: int = 128):
    """Top-k rows per group by ``order_col`` DESC (ties broken by
    ``tie_col`` ASC for determinism): per-batch partial top-k (each batch
    contributes ≤ k rows per group it contains) then one hash-bucketed
    exact reduce — never a per-group Python call.
    """
    group_cols = list(group_cols)
    sort_cols = [order_col] + ([tie_col] if tie_col else [])
    ascending = [False] + ([True] if tie_col else [])

    def topk_df(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
            .groupby(group_cols, sort=False).head(k)
        )

    def partial(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(topk_df(batch.to_pandas()),
                                    preserve_index=False)

    return hash_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                          group_cols, topk_df, num_buckets=num_buckets)


def grouped_rank(ds, partition_cols, order_col: str, ascending: bool = False,
                 out: str = "rnk", num_buckets: int = 128):
    """``RANK() OVER (PARTITION BY … ORDER BY order_col)`` as a
    distributed stage: hash-bucket by partition key, then one vectorized
    ``groupby().rank(method="min")`` per bucket (SQL RANK semantics —
    ties share the smallest rank, next rank skips). Rank with ties is
    order-insensitive, so the result is deterministic at any block
    layout. A partition's rows must be co-located, which the bucket hash
    guarantees; per-partition row count is the scaling unit (same bound
    as any SQL PARTITION BY).
    """
    partition_cols = list(partition_cols)

    def bucket_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[out] = (
            df.groupby(partition_cols, sort=False)[order_col]
            .rank(method="min", ascending=ascending)
            .astype("int64")
        )
        return df

    return hash_aggregate(ds, partition_cols, bucket_rank,
                          num_buckets=num_buckets)


def interval_join_broadcast(big, intervals_df: pd.DataFrame, ts_col: str,
                            lo_col: str = "lo", hi_col: str = "hi",
                            intervals_ref=None):
    """Interval (range) join of a big Dataset against a SMALL table of
    possibly-overlapping [lo, hi) intervals: each big row joins every
    interval containing its ``ts_col`` (inner semantics — rows in no
    interval drop; rows in k intervals fan out k times).

    The intervals ship ONCE via ``ray.put``; inside each batch the
    containment test is one vectorized comparison per interval
    (O(#intervals) numpy passes per batch, no per-row Python). This is
    the broadcast side of a range join — for interval sets too large to
    broadcast, bucket both sides by coarse time range and run this
    per-bucket (the standard banding trick; the fan-out then bounds the
    shuffle).
    """
    import ray

    if intervals_ref is None:
        intervals_ref = ray.put(intervals_df)

    def join_batch(batch: pa.Table) -> pa.Table:
        import ray as _ray

        iv = _ray.get(intervals_ref)
        df = batch.to_pandas()
        ts = df[ts_col].to_numpy()
        parts = []
        for row in iv.itertuples(index=False):
            r = row._asdict()
            mask = (ts >= r[lo_col]) & (ts < r[hi_col])
            if not mask.any():
                continue
            sub = df.loc[mask].copy()
            for c, v in r.items():
                sub[c] = v
            parts.append(sub)
        if not parts:
            cols = {**{c: df[c].iloc[:0] for c in df.columns},
                    **{c: pd.Series([], dtype=iv[c].dtype)
                       for c in iv.columns}}
            return pa.Table.from_pandas(pd.DataFrame(cols),
                                        preserve_index=False)
        return pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                                    preserve_index=False)

    return big.map_batches(join_batch, batch_format="pyarrow")


def preagg_extreme(ds, keys: Sequence[str], col: str, how: str = "min",
                   out: str | None = None, engine: str = "native",
                   num_buckets: int = 64):
    """groupby(keys) MIN/MAX of ``col`` with per-batch partials — same
    combiner discipline as :func:`preagg_sum` (min/max are associative
    and idempotent, so the partial is exact at any block layout).

    ``engine="bucketed"`` routes the wide step through
    :func:`hash_aggregate` (sort by ONE int64 bucket key) instead of
    Ray's native sort-based groupby over the key columns — measured
    2.3× faster at 18M string rows, slower on toy inputs (bucket-task
    spin-up). Same results either way; callers that know their input
    is large (connected_components at crawl-dedup scale) opt in."""
    from ray.data.aggregate import Max, Min

    keys = list(keys)
    out = out or col

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(keys, as_index=False).agg(**{out: (col, how)})
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    if engine == "bucketed":
        return hash_aggregate(
            partials, keys,
            lambda df: df.groupby(keys, as_index=False)
            .agg(**{out: (out, how)}),
            num_buckets=num_buckets)
    agg = (Min if how == "min" else Max)(out, alias_name=out)
    return (
        partials
        .groupby(keys if len(keys) > 1 else keys[0])
        .aggregate(agg)
    )


def preagg_sum(
    ds,
    keys: Sequence[str],
    sums: dict[str, str],
    counts: str | None = None,
):
    """groupby(keys) with per-batch partial sums/counts (combiner) then a
    final merge groupby. ``sums`` maps output_name -> input_column;
    ``counts`` names an output count column."""

    keys = list(keys)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        aggs = {out: (col, "sum") for out, col in sums.items()}
        if counts:
            first_col = next(iter(sums.values())) if sums else keys[0]
            aggs[counts] = (first_col, "size")
        g = df.groupby(keys, as_index=False).agg(**aggs)
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    aggs = [Sum(out, alias_name=out) for out in sums]
    if counts:
        aggs.append(Sum(counts, alias_name=counts))
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys if len(keys) > 1 else keys[0])
        .aggregate(*aggs)
    )


def pivot_counts(ds, key_cols, pivot_col: str, categories: Sequence[str],
                 prefix: str = "n_"):
    """Crosstab / PIVOT: one row per key, one count column per category
    of ``pivot_col``. Categories are a FIXED list — at scale the output
    schema must not depend on which values happen to appear (a block
    seeing 3 of 5 categories would otherwise emit a different schema);
    values outside the list are ignored.

    Per-batch partial crosstab (vectorized groupby + unstack) then one
    built-in Sum merge per category column — the shuffle carries ≤ keys
    × batches rows of small ints, never the raw stream.
    """
    key_cols = list(key_cols)
    categories = list(categories)
    out_cols = [prefix + c for c in categories]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(key_cols + [pivot_col], as_index=False).size()
        w = g.pivot_table(index=key_cols, columns=pivot_col, values="size",
                          fill_value=0, aggfunc="sum")
        w = w.reindex(columns=categories, fill_value=0)
        w.columns = out_cols
        w = w.reset_index()
        for c in out_cols:
            w[c] = w[c].astype("int64")
        return pa.Table.from_pandas(w, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        ds.select_columns(key_cols + [pivot_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(key_cols if len(key_cols) > 1 else key_cols[0])
        .aggregate(*[Sum(c, alias_name=c) for c in out_cols])
    )


def cogroup_join(left, right, on: str | Sequence[str],
                 right_on: str | Sequence[str] | None = None,
                 how: str = "inner", num_buckets: int = 64):
    """Hash-shuffle equi-join expressed as a CO-GROUP: tag-union both
    sides, hash-bucket on the key, ONE vectorized ``pd.merge`` per
    bucket. Functionally equivalent to :func:`shuffle_join` for
    ``inner`` / ``left_semi`` / ``left_anti``, but rides the same
    sort-shuffle machinery as every aggregate in this repo instead of
    ``Dataset.join``'s per-partition aggregator ACTORS — no actor-pool
    spin-up (the fixed ~2-3 s cost the bench join stage measures), and
    no schemaless-empty-block repair needed afterwards (the bucket
    reduce always emits the declared schema).

    Non-key column names must be disjoint across sides. Skew: all rows
    of one key land in one bucket — same co-location contract as every
    hash_aggregate; a single pathological key dominating a bucket is
    the (documented) bound, salt such keys upstream.
    """
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))

    ls = dataset_arrow_schema(left)
    rs = dataset_arrow_schema(right)
    key_fields = [(n, ls.field(n).type) for n in on]
    lval = [(n, ls.field(n).type) for n in ls.names if n not in on]
    rval = [(n, rs.field(n).type) for n in rs.names if n not in right_on]
    clash = {n for n, _ in lval} & {n for n, _ in rval}
    if clash:
        raise ValueError(f"non-key column collision: {sorted(clash)}")
    full = pa.schema(key_fields + lval + rval
                     + [("__side", pa.int8())])

    def pad(side: int, key_names, vals_present):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for kname, (oname, typ) in zip(key_names, key_fields):
                cols[oname] = batch.column(kname).cast(typ)
            for name, typ in lval + rval:
                cols[name] = (batch.column(name).cast(typ)
                              if name in vals_present
                              else pa.nulls(n, typ))
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int8),
                                      pa.int8())
            return pa.table(cols).select(full.names).cast(full)

        return fn

    both = left.map_batches(
        pad(0, on, {n for n, _ in lval}), batch_format="pyarrow"
    ).union(right.map_batches(
        pad(1, right_on, {n for n, _ in rval}), batch_format="pyarrow"))

    lcols = on + [n for n, _ in lval]
    rcols = on + [n for n, _ in rval]
    # the null padding widens e.g. int64 → float64 in pandas; cast each
    # side back to its declared dtypes after the split (no nulls there)
    target_dtypes = pa.schema(key_fields + lval + rval) \
        .empty_table().to_pandas().dtypes.to_dict()

    def bucket_merge(df: pd.DataFrame) -> pd.DataFrame:
        l = df.loc[df["__side"] == 0, lcols].astype(
            {c: target_dtypes[c] for c in lcols})
        r = df.loc[df["__side"] == 1, rcols].astype(
            {c: target_dtypes[c] for c in rcols})
        if how == "inner":
            return l.merge(r, on=on, how="inner")
        if how == "left_semi":
            keys = r[on].drop_duplicates()
            return l.merge(keys, on=on, how="inner")
        if how == "left_anti":
            keys = r[on].drop_duplicates()
            m = l.merge(keys, on=on, how="left", indicator=True)
            return m.loc[m["_merge"] == "left_only", lcols]
        raise ValueError(f"unsupported how={how}")

    return hash_aggregate(both, on, bucket_merge, num_buckets=num_buckets)


def profile_columns(ds, columns: Sequence[str],
                    num_buckets: int = 64) -> pd.DataFrame:
    """Per-column data profiling — the schema-audit pass an ingest
    pipeline runs before processing (the engine-side analog of DuckDB's
    ``SUMMARIZE``): for every profiled column, ``n_rows``, ``n_null``,
    exact ``n_distinct``, and ``min_v``/``max_v`` rendered as strings.

    Two streaming passes, both reducing to O(#columns) rows:

    1. Scalar stats — a per-batch partial emits ONE wide row
       (n_rows + per-column null count and typed min/max) folded by
       :func:`tree_aggregate`; min/max compare on the ORIGINAL dtype
       (numeric columns numerically) and are cast to string only at the
       end, matching ``CAST(min(c) AS VARCHAR)`` rather than
       ``min(CAST(c AS VARCHAR))``.
    2. Distinct counts — the (column, value-string) pairs, batch-deduped
       at the source, go through the exact two-level
       :func:`distinct_count`. The distinct-pair set is the documented
       scaling bound (same as any exact COUNT(DISTINCT) — swap in an HLL
       sketch via :mod:`raygraph.ops.sketch` when approximation is
       acceptable).

    Both results are aggregate-sized, so the final merge is a
    driver-side pandas join over #columns rows (legitimately tiny).
    """
    columns = list(columns)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        row: dict[str, list] = {"n_rows": [len(df)]}
        for c in columns:
            col = df[c]
            nn = col.dropna()
            row[f"null__{c}"] = [int(col.isna().sum())]
            row[f"min__{c}"] = [nn.min() if len(nn) else None]
            row[f"max__{c}"] = [nn.max() if len(nn) else None]
        return pa.Table.from_pandas(pd.DataFrame(row),
                                    preserve_index=False)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out: dict[str, list] = {"n_rows": [int(df["n_rows"].sum())]}
        for c in columns:
            mn, mx = df[f"min__{c}"].dropna(), df[f"max__{c}"].dropna()
            out[f"null__{c}"] = [int(df[f"null__{c}"].sum())]
            out[f"min__{c}"] = [mn.min() if len(mn) else None]
            out[f"max__{c}"] = [mx.max() if len(mx) else None]
        return pd.DataFrame(out)

    stats_ds = tree_aggregate(ds.map_batches(partial,
                                             batch_format="pyarrow"),
                              combine, precombined=True)

    def explode(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        parts = []
        for c in columns:
            vals = df[c].dropna()
            parts.append(pd.DataFrame({
                "column": c, "val": vals.astype(str)
            }).drop_duplicates())
        return pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                                    preserve_index=False)

    nd_ds = distinct_count(ds.map_batches(explode, batch_format="pyarrow"),
                           ["column"], "val", num_buckets=num_buckets)

    wide = stats_ds.to_pandas().iloc[0]
    nd = nd_ds.to_pandas()

    def as_str(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return None
        if isinstance(v, (int, np.integer)):
            return str(int(v))
        return str(v)

    long = pd.DataFrame({
        "column": columns,
        "n_rows": [int(wide["n_rows"])] * len(columns),
        "n_null": [int(wide[f"null__{c}"]) for c in columns],
        "min_v": [as_str(wide[f"min__{c}"]) for c in columns],
        "max_v": [as_str(wide[f"max__{c}"]) for c in columns],
    })
    out = long.merge(nd, on="column", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    return out.sort_values("column", ignore_index=True)


def apply_changeset(base, changes, on: str | Sequence[str],
                    op_col: str = "op", num_buckets: int = 128):
    """CDC merge (``MERGE INTO`` / upsert-delete): apply a changeset to
    a snapshot. ``changes`` carries the base schema plus ``op_col`` ∈
    {'upsert', 'delete'}: base rows whose key appears in the changeset
    are dropped, and upsert rows are emitted in their place (update and
    insert are the same op — insert keys simply match no base row).

    Contract: at most one change row per key (compact a raw change LOG
    first with :func:`group_topk` k=1 on a sequence column —
    latest-wins); delete rows must still be schema-valid (their payload
    values are ignored, not read). Output schema == base schema.

    Plan: tag-union both sides (same discipline as
    :func:`cogroup_join`), hash-bucket on the key, one vectorized
    pandas pass per bucket (anti-join base against changed keys +
    append upserts) — the shuffle moves each row once and the bucket
    co-locates every key's base row with its change row. The per-bucket
    row volume is the scaling unit; the changeset needs no special
    sizing (it rides the same buckets as the snapshot).
    """
    on = [on] if isinstance(on, str) else list(on)
    schema = dataset_arrow_schema(base)
    out_cols = list(schema.names)
    if op_col in out_cols:
        raise ValueError(f"base schema already has a {op_col!r} column")

    def pad_base(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return batch.append_column(op_col, pa.array([""] * n)) \
                    .append_column("__side", pa.array([0] * n, pa.int8()))

    def tag_changes(batch: pa.Table) -> pa.Table:
        cols = out_cols + [op_col]
        batch = batch.select(cols)
        return batch.append_column(
            "__side", pa.array([1] * batch.num_rows, pa.int8()))

    both = base.map_batches(pad_base, batch_format="pyarrow").union(
        changes.map_batches(tag_changes, batch_format="pyarrow"))

    def bucket_merge(df: pd.DataFrame) -> pd.DataFrame:
        ch = df.loc[df["__side"] == 1]
        b = df.loc[df["__side"] == 0, out_cols]
        changed = ch[on].drop_duplicates()
        m = b.merge(changed, on=on, how="left", indicator=True)
        keep = m.loc[m["_merge"] == "left_only", out_cols]
        ups = ch.loc[ch[op_col] == "upsert", out_cols]
        return pd.concat([keep, ups], ignore_index=True)

    return hash_aggregate(both, on, bucket_merge, num_buckets=num_buckets)


def approx_heavy_keys(ds, key: str, top: int = 16,
                      per_batch: int = 64) -> list:
    """Approximate heavy-hitter keys (SpaceSaving-flavored): per-batch
    ``value_counts`` truncated to ``per_batch`` candidates, tree-folded
    with re-truncation to ``top``. Truncation makes it approximate, but
    true heavy hitters dominate every batch they appear in, so they
    survive the folds; use where a miss only costs balance, not
    correctness (e.g. :func:`salted_join` routing)."""

    def partial(batch: pa.Table) -> pa.Table:
        vc = batch.to_pandas()[key].value_counts().head(per_batch)
        return pa.table({key: pa.array(vc.index.to_numpy()),
                         "__n": pa.array(vc.to_numpy(dtype="int64"))})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(key, as_index=False)["__n"].sum()
                .nlargest(top, "__n"))

    out = tree_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                         combine, precombined=True).to_pandas()
    return out[key].tolist()


def salted_join(left, right, on: str, salt: int = 8, hot_keys=None,
                num_buckets: int = 64):
    """Skew-mitigated INNER equi-join: rows of HOT keys spread across
    ``salt`` sub-buckets on the left (full-row hash, deterministic at
    any layout) while the matching right rows replicate into every
    sub-bucket; cold keys ride salt 0 untouched. One pathological key
    then fans across ``salt`` reduce tasks instead of serializing one —
    the standard salting repair for the per-bucket co-location bound
    documented on :func:`cogroup_join` / :func:`hash_aggregate`.

    Exact for ANY ``hot_keys`` choice (salting only routes); by default
    hot keys come from the :func:`approx_heavy_keys` pre-pass over the
    left side. Replication cost: |right rows of hot keys| × salt —
    bounded because hot keys are few by construction. Single key
    column, inner join only (replication breaks semi/anti semantics).
    """
    if hot_keys is None:
        hot_keys = approx_heavy_keys(left, on)
    hot = set(hot_keys)

    def salt_left(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        h = pd.util.hash_pandas_object(df, index=False).to_numpy()
        is_hot = df[on].isin(hot).to_numpy()
        df["__salt"] = np.where(is_hot, h % salt, 0).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    def replicate_right(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        is_hot = df[on].isin(hot).to_numpy()
        cold = df.loc[~is_hot].copy()
        cold["__salt"] = np.int64(0)
        hotdf = df.loc[is_hot]
        rep = hotdf.loc[hotdf.index.repeat(salt)].copy()
        rep["__salt"] = np.tile(np.arange(salt, dtype="int64"),
                                len(hotdf))
        return pa.Table.from_pandas(
            pd.concat([cold, rep], ignore_index=True),
            preserve_index=False)

    joined = cogroup_join(
        left.map_batches(salt_left, batch_format="pyarrow"),
        right.map_batches(replicate_right, batch_format="pyarrow"),
        on=[on, "__salt"], num_buckets=num_buckets)
    return joined.drop_columns(["__salt"])


def stratified_sample(ds, rates_per_mille: dict, group_col: str,
                      id_col: str = "doc_id"):
    """Per-stratum deterministic sampling: keep a row iff
    ``md5_60bit(str(id)) % 1000 < rates_per_mille[group]`` (groups
    absent from the map are dropped). Same content-keyed contract as
    :func:`deterministic_sample` — identical rows survive at any
    parallelism and a SQL oracle reproduces the exact sample — but the
    keep rate varies by stratum (the class-rebalancing step of a
    training-data pipeline: downsample the dominant language, keep all
    of the rare one). Pure streaming filter; the tiny rate map rides the
    task closure, no shuffle."""
    import hashlib

    def fn(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        h = df[id_col].astype(str).map(
            lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            % 1000)
        rate = df[group_col].map(rates_per_mille).fillna(0)
        return batch.filter(pa.array((h < rate).to_numpy()))

    return ds.map_batches(fn, batch_format="pyarrow")


def range_boundaries(ds, col: str, n_tiles: int,
                     num_buckets: int = 64) -> list:
    """Exact range-partitioner split points: the percentile_disc(i/n),
    i = 1..n-1, values of ``col`` via the :func:`grouped_quantiles`
    value-count shuffle (constant group). No sampling — the boundaries
    are deterministic at any block layout, unlike a sample-based range
    partitioner (Ray's sort samples; re-runs can split differently).
    Returns the n_tiles-1 boundary values (a driver-side scalar list —
    the broadcast small side of the partitioner). Same scaling bound as
    grouped_quantiles: the distinct-value set of one (discretized)
    column must fit one reduce task."""
    qs = [i / n_tiles for i in range(1, n_tiles)]

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__g", pa.array(np.zeros(batch.num_rows, dtype="int64")))

    q = grouped_quantiles(ds.map_batches(tag, batch_format="pyarrow"),
                          ["__g"], col, qs=qs, prefix="b",
                          num_buckets=num_buckets).to_pandas()
    if not len(q):
        return []  # empty input → no boundaries → everything in tile 0
    cols = [f"b{int(round(x * 100)):02d}" for x in qs]
    return [v for v in q.iloc[0][cols].tolist()]


def range_partition(ds, col: str, n_tiles: int = 4,
                    boundaries: Sequence | None = None):
    """Tag every row with its range tile — the split step of a
    distributed sort / range-partitioned write: tile(v) = #boundaries
    strictly below v (tiles are value-ranges [b_i, b_{i+1}]; equal
    values always co-tile). Boundaries default to the exact
    :func:`range_boundaries`; the tiny list rides the task closure.
    Adds an int64 ``tile`` column; streaming, no shuffle."""
    if boundaries is None:
        boundaries = range_boundaries(ds, col, n_tiles)
    bs = np.asarray(list(boundaries))

    def tag(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        if len(bs) == 0:
            # single tile (n_tiles=1): an empty boundary array is
            # dtype-less (float64) and cannot compare against
            # datetime64 columns — everything is tile 0
            tile = np.zeros(len(v), dtype="int64")
        else:
            tile = (v[:, None] > bs[None, :]).sum(axis=1).astype("int64")
        return batch.append_column("tile", pa.array(tile))

    return ds.map_batches(tag, batch_format="pyarrow")


def ordered_prefix_sum(ds, order_col: str, value_col: str,
                       n_tiles: int = 32, out: str = "prefix_before",
                       pin: bool = True, tie_cols: Sequence[str] = ()):
    """Global EXCLUSIVE running sum of ``value_col`` in ``order_col``
    order — the classic two-phase distributed scan (the building block
    of sequence packing, global row numbering, and ordered splitting):

    1. exact range tiles on ``order_col`` (:func:`range_boundaries` —
       value-count shuffle, no sampling, layout-deterministic);
    2. per-tile totals (``n_tiles`` scalars) → driver exclusive prefix
       over the tile totals — the only driver state;
    3. one vectorized sort+cumsum per tile (+ its tile offset).

    ``(order_col, *tie_cols)`` must be a total order: without a unique
    combination, tied rows take layout-dependent intra-tile positions.
    Ties on ``order_col`` alone are safe WITH ``tie_cols`` because
    range tiles split strictly between distinct ``order_col`` values —
    all ties co-tile and the intra-tile sort resolves them globally. A
    tile must fit one worker (n_tiles scales with input size, the same
    contract as ``range_partition``). ``pin``
    materializes the tiled input so the two passes (totals, scan) don't
    re-run the upstream pipeline — disable when upstream is cheaper
    than object-store residency."""
    tiled = range_partition(ds, order_col, n_tiles)
    if pin:
        tiled = tiled.materialize()
    sums = preagg_sum(tiled, ["tile"], {"__s": value_col}).to_pandas()
    if "tile" in sums.columns:
        sums = sums.sort_values("tile")
        csum = sums["__s"].cumsum() - sums["__s"]
        offsets = dict(zip(sums["tile"].astype(int), csum.astype("int64")))
    else:
        offsets = {}  # empty input: the aggregate emits a columnless frame

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([order_col, *tie_cols],
                            kind="mergesort").reset_index(drop=True)
        vals = df[value_col].to_numpy(dtype="int64")
        base = int(offsets.get(int(df["tile"].iloc[0]), 0))
        df[out] = base + np.cumsum(vals) - vals
        return df.drop(columns=["tile"])

    return tiled.groupby("tile").map_groups(scan, batch_format="pandas")


def set_op_distinct(left, right, cols: Sequence[str], op: str = "except",
                    num_buckets: int = 64):
    """Distributed SQL set operation with DISTINCT semantics:
    ``op="except"`` → rows of ``left`` (projected to ``cols``) not in
    ``right``; ``op="intersect"`` → rows present in both. Per-batch
    dedup is the combiner (what shuffles is bounded by per-block
    distinct rows), then a tag-union and ONE bucketed vectorized
    reduce — the same sort-shuffle machinery as every aggregate here,
    no join actors. All rows of a key co-locate by construction, so the
    result is exactly distinct."""
    if op not in ("except", "intersect"):
        raise ValueError("op must be except|intersect")
    cols = list(cols)
    ls = dataset_arrow_schema(left)
    schema = pa.schema([(c, ls.field(c).type) for c in cols]
                       + [("__side", pa.int8())])

    def pad(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            df = batch.select(cols).to_pandas().drop_duplicates()
            df["__side"] = np.int8(side)
            return pa.Table.from_pandas(df, preserve_index=False).cast(schema)

        return fn

    tagged = left.map_batches(pad(0), batch_format="pyarrow").union(
        right.map_batches(pad(1), batch_format="pyarrow"))

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        l = df.loc[df["__side"] == 0, cols].drop_duplicates()
        r = df.loc[df["__side"] == 1, cols].drop_duplicates()
        if op == "intersect":
            return l.merge(r, on=cols, how="inner")
        m = l.merge(r, on=cols, how="left", indicator=True)
        return m.loc[m["_merge"] == "left_only", cols]

    return hash_aggregate(tagged, cols, reduce, num_buckets=num_buckets)


def histogram(ds, col: str, lo: int, width: int, n_bins: int,
              out: str = "bin"):
    """Fixed-width integer histogram — the profiling primitive: bin =
    clip((v - lo) // width, 0, n_bins-1), counted with the per-batch
    combiner. Bin edges are FIXED inputs (not data-derived) so the
    output schema and the per-batch partials are layout-independent;
    pair with :func:`range_boundaries` when edges should come from the
    data. Shuffle volume = n_bins rows per block."""
    def tag(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        b = np.clip((v - lo) // width, 0, n_bins - 1).astype("int64")
        return pa.table({out: pa.array(b, pa.int64())})

    return preagg_sum(ds.map_batches(tag, batch_format="pyarrow"),
                      [out], {}, counts="n")


def grouped_corr_bp(ds, group_cols: Sequence[str], x_col: str, y_col: str,
                    out: str = "corr_bp"):
    """Exact-moment Pearson correlation per group, in basis points:
    ONE streaming pass accumulates the five integer moment sums
    (n, Σx, Σy, Σx², Σy², Σxy) per batch per group — the same combiner
    discipline as the variance op — so the shuffle carries a
    groups-sized aggregate, never the detail. The finalize runs on the
    tiny aggregate: with num = n·Σxy − Σx·Σy and
    dx/dy = n·Σx² − (Σx)² / n·Σy² − (Σy)², the output is
    floor(10⁴·num / sqrt(double(dx)·double(dy))) — exact arbitrary-
    precision integers up to the last deterministic IEEE sqrt/divide,
    mirrored operation-for-operation by the SQL oracle (HUGEINT then
    ::DOUBLE). Groups with zero variance on either side are dropped
    (matching the oracle's WHERE dx > 0 AND dy > 0).

    Inputs must already be int64 (exact units: cents/whole counts);
    callers quantize floats deterministically beforehand.

    Overflow contract: per-batch moment sums are folded with Python
    big ints (object-dtype groupby — exact at any magnitude), then
    each moment ships the exchange as TWO int64 limbs (hi, lo) =
    divmod(v, 2³²) summed independently and recombined with Python
    ints at finalize. Exact while every total |moment| < 2⁹⁵ and the
    per-group partial count < 2³¹ — e.g. rank inputs bounded by 2n
    stay exact to n ≈ 2·10⁹ rows, vs ~1.7·10⁶ with raw int64 sums
    (the silent-wrap regime this replaced).
    """
    import math

    group_cols = list(group_cols)
    LIMB = 1 << 32
    moment_cols = ("sx", "sy", "sxx", "syy", "sxy")

    def moments(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # object dtype = Python-int arithmetic: products and sums are
        # exact regardless of magnitude (x·x wraps int64 at |x|>3·10⁹)
        x = df[x_col].to_numpy(dtype="int64").astype(object)
        y = df[y_col].to_numpy(dtype="int64").astype(object)
        g = df[group_cols].copy()
        g["__sx"], g["__sy"] = x, y
        g["__sxx"], g["__syy"], g["__sxy"] = x * x, y * y, x * y
        agg_df = g.groupby(group_cols, as_index=False).agg(
            n=("__sx", "size"), sx=("__sx", "sum"), sy=("__sy", "sum"),
            sxx=("__sxx", "sum"), syy=("__syy", "sum"),
            sxy=("__sxy", "sum"))
        out = {c: pa.array(agg_df[c]) for c in group_cols}
        out["n"] = pa.array(agg_df["n"].to_numpy(dtype="int64"))
        for c in moment_cols:
            hi_lo = [divmod(int(v), LIMB) for v in agg_df[c]]
            out[c + "_hi"] = pa.array([h for h, _ in hi_lo], pa.int64())
            out[c + "_lo"] = pa.array([l for _, l in hi_lo], pa.int64())
        return pa.table(out)

    limb_cols = ["n"] + [c + s for c in moment_cols
                         for s in ("_hi", "_lo")]
    agg = preagg_sum(
        ds.map_batches(moments, batch_format="pyarrow"), group_cols,
        {c: c for c in limb_cols})
    # the aggregate is groups-sized — finalize with Python big ints
    # (n·Σx² overflows int64 at scale; the oracle uses HUGEINT)
    df = agg.to_pandas()

    def limb(r, c):
        return int(r[c + "_hi"]) * LIMB + int(r[c + "_lo"])

    rows = []
    for _, r in df.iterrows():
        n = int(r["n"])
        sx, sy = limb(r, "sx"), limb(r, "sy")
        dx = n * limb(r, "sxx") - sx * sx
        dy = n * limb(r, "syy") - sy * sy
        if dx <= 0 or dy <= 0:
            continue
        num = n * limb(r, "sxy") - sx * sy
        bp = math.floor(float(10_000 * num)
                        / math.sqrt(float(dx) * float(dy)))
        rows.append([r[c] for c in group_cols] + [n, bp])
    out_df = pd.DataFrame(rows, columns=group_cols + ["n_rows", out])
    return out_df.sort_values(group_cols).reset_index(drop=True)


def table_checksum(ds, cols: Sequence[str], out: str = "checksum"):
    """Order-invariant table fingerprint: sum (mod 2^63) of the md5-60
    of each row's '\\x1f'-joined string form over ``cols`` — the
    anti-entropy / replication-audit primitive: one int64 compares two
    copies of a table without moving either. Per-batch partial sums →
    one tree reduce; commutative by construction, so block layout never
    changes the value."""
    import hashlib

    mask = (1 << 63) - 1

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(list(cols)).to_pandas()
        first, *rest = list(cols)
        joined = df[first].astype(str)
        if rest:
            joined = joined.str.cat([df[c].astype(str) for c in rest],
                                    sep="\x1f")
        s = sum(int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
                for v in joined) & mask
        return pa.table({out: pa.array([s], pa.int64()),
                         "n_rows": pa.array([len(df)], pa.int64())})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({out: [int(df[out].sum()) & mask],
                             "n_rows": [int(df["n_rows"].sum())]})

    return tree_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                          combine)


def _part1by1_16(x):
    """Spread the low 16 bits of each uint64 so bit i lands at 2i
    (standard Morton magic-number spread, fully vectorized)."""
    import numpy as np

    x = x.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def zorder_key(ds, col_a: str, col_b: str, out: str = "zkey"):
    """Append a Morton / Z-order clustering key interleaving the low 16
    bits of two non-negative int columns — the standard multi-column
    data-layout key: sorting (or range-partitioning) by it co-locates
    rows close in BOTH dimensions, so downstream range scans on either
    column prune most files. Pure per-batch numpy bit math, no shuffle;
    compose with ``range_partition``/``ds.sort`` for the actual layout
    step. Bit i of ``col_a`` lands at 2i, of ``col_b`` at 2i+1."""
    import numpy as np
    import pyarrow as pa

    def fn(batch: pa.Table) -> pa.Table:
        a = batch.column(col_a).to_numpy(zero_copy_only=False)
        b = batch.column(col_b).to_numpy(zero_copy_only=False)
        z = _part1by1_16(a) | (_part1by1_16(b) << np.uint64(1))
        return batch.append_column(out, pa.array(z.astype("int64")))

    return ds.map_batches(fn, batch_format="pyarrow")


def _skyline_2d(df: pd.DataFrame, x_col: str, y_col: str) -> pd.DataFrame:
    """Exact 2D max-max skyline of one frame: rows not dominated by any
    other row (q dominates p iff q.x >= p.x, q.y >= p.y, and q is
    strictly greater in at least one). Duplicate (x, y) points on the
    frontier all survive. Vectorized: only rows carrying the max y of
    their x-value can survive, and such a row survives iff its y beats
    the best y among all STRICTLY larger x."""
    if not len(df):
        return df
    gmax = df.groupby(x_col)[y_col].transform("max")
    xs = df[x_col].to_numpy()
    order = np.argsort(-xs, kind="mergesort")
    g = gmax.to_numpy()[order]
    x_sorted = xs[order]
    best = np.maximum.accumulate(g)
    # best y among strictly larger x = accumulated max up to the start
    # of this x-run (runs of equal x share one boundary value)
    starts = np.flatnonzero(np.r_[True, x_sorted[1:] != x_sorted[:-1]])
    run_id = np.cumsum(np.r_[1, x_sorted[1:] != x_sorted[:-1]]) - 1
    prev_best = np.r_[np.iinfo(np.int64).min, best[starts - 1][1:]][run_id]
    keep = np.empty(len(df), dtype=bool)
    keep[order] = g > prev_best
    ys = df[y_col].to_numpy()
    return df.loc[keep & (ys == gmax.to_numpy())]


def skyline_max(ds, x_col: str, y_col: str):
    """Distributed Pareto frontier (skyline) maximizing two int columns.

    Classic two-phase plan: a vectorized LOCAL skyline per block (the
    global skyline is a subset of every block's local skyline, so
    non-frontier rows — the overwhelming majority — die where they
    live), then one exact pass over the union of the small per-block
    frontiers. The candidate set is bounded by (#blocks × frontier
    width), never by input size; only that final pass runs on one task.

    Reference analog: none — a curation/selection primitive (e.g. pick
    quality-vs-length-optimal documents) beyond the reference's export
    surface.
    """
    def local(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(_skyline_2d(df, x_col, y_col),
                                    preserve_index=False)

    cand = ds.map_batches(local, batch_format="pyarrow")
    # final exact pass: all candidates into ONE batch (bounded, see above)
    return cand.repartition(1).map_batches(local, batch_format="pyarrow",
                                           batch_size=None)


def grouped_mode(ds, keys, val_col: str, counts: str = "n"):
    """Exact per-group mode: the most frequent ``val_col`` per key group
    (ties → smallest value), with its count. Two-level: a combiner
    preagg shrinks the stream to (key, value) pair counts, then one
    hash-bucketed vectorized argmax pass (sort + drop_duplicates) picks
    each key's winner — per-bucket Python, never per-key."""
    keys = list(keys)
    pc_counts = preagg_sum(ds, keys + [val_col], {}, counts=counts)
    pc_counts = compact_nonempty(pc_counts.materialize())
    if pc_counts is None:
        import ray.data as rd

        return rd.from_items([])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + [counts, val_col],
                            ascending=[True] * len(keys) + [False, True],
                            kind="mergesort")
        return df.drop_duplicates(keys, keep="first")

    return hash_aggregate(pc_counts, keys, pick)


def trunc_div(a, b):
    """Sign-aware truncating integer division (rounds toward zero) for
    positive ``b`` — DuckDB's ``//`` truncates while numpy/Python floor,
    so oracle-parity integer ratios over possibly-negative numerators
    must use this."""
    a = np.asarray(a, dtype="int64")
    b = np.asarray(b, dtype="int64")
    q = np.abs(a) // b
    return np.where(a < 0, -q, q).astype("int64")


def grouped_percent_rank(ds, partition_cols, order_col: str,
                         out: str = "prank_e4", num_buckets: int = 128):
    """``PERCENT_RANK() OVER (PARTITION BY … ORDER BY order_col)`` as an
    exact-integer distributed stage: prank_e4 = (10⁴·(rank−1)) //
    max(n−1, 1) with SQL RANK (min) tie semantics — integer on both
    engines, no float fencepost at the 4th decimal. Same hash-bucket
    co-location contract as :func:`grouped_rank`."""
    partition_cols = list(partition_cols)

    def bucket_prank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        g = df.groupby(partition_cols, sort=False)
        rnk = g[order_col].rank(method="min", ascending=True).astype("int64")
        n = g[order_col].transform("size").astype("int64")
        df[out] = (10_000 * (rnk - 1)) // np.maximum(n - 1, 1)
        return df

    return hash_aggregate(ds, partition_cols, bucket_prank,
                          num_buckets=num_buckets)


def bloom_semi_join_stats(probe, keys, probe_col: str, key_col: str,
                          m_bits: int = 131_072, k_hashes: int = 3):
    """Bloom-filter semi-join pruning — the sketch-based pre-filter a
    distributed engine ships to the big side before an expensive join —
    with its accuracy measured EXACTLY: returns a one-row DataFrame
    (n_keys, n_true, n_bloom_pass) where n_true is the exact semi-join
    row count and n_bloom_pass the rows surviving the bloom pre-filter
    (n_bloom_pass ≥ n_true; the difference is false positives).

    Deterministic id-derived hashing (md5 of "key#j" mod m, the
    SQL-replayable stand-in for seeded hash families). Dataflow: the
    filter-side key set builds a DISTINCT position Dataset (the "bit
    set" as rows — at scale this is the sketch's exchange form); probe
    keys fan out to their ≤k distinct positions, meet the bit set in one
    position-hash shuffle join, and a key passes iff EVERY position hit.
    The pass-key set then semi-joins back onto the probe rows. Nothing
    key- or row-sized reaches the driver; the only driver values are the
    three counts."""
    import hashlib

    def positions(col):
        def fn(batch: pa.Table) -> pa.Table:
            vals = batch.column(col).to_pylist()
            rows_k, rows_p = [], []
            for v in vals:
                for j in range(k_hashes):
                    rows_k.append(v)
                    rows_p.append(int(hashlib.md5(
                        f"{v}#{j}".encode()).hexdigest()[:15], 16)
                        % m_bits)
            df = pd.DataFrame({"key": rows_k, "pos": rows_p}) \
                .drop_duplicates()
            df["pos"] = df["pos"].astype("int64")
            return pa.Table.from_pandas(df, preserve_index=False)

        return fn

    from raygraph.ops.graph import _repaired

    key_t = pa.int64()
    pos_schema = pa.schema([("key", key_t), ("pos", pa.int64())])

    kd = _repaired(
        hash_aggregate(
            keys.select_columns([key_col]).map_batches(
                positions(key_col), batch_format="pyarrow"),
            ["key", "pos"], lambda df: df.drop_duplicates()),
        pos_schema)
    bits = _repaired(
        hash_aggregate(kd.select_columns(["pos"]),
                       ["pos"], lambda df: df.drop_duplicates()),
        pa.schema([("pos", pa.int64())]))

    dprobe = _repaired(
        hash_aggregate(probe.select_columns([probe_col]),
                       [probe_col], lambda df: df.drop_duplicates()),
        pa.schema([(probe_col, key_t)]))
    pp = _repaired(
        dprobe.map_batches(positions(probe_col), batch_format="pyarrow"),
        pos_schema)
    n_pos = _repaired(
        preagg_sum(pp, ["key"], {}, counts="n_pos"),
        pa.schema([("key", key_t), ("n_pos", pa.int64())]))
    hits = shuffle_join(pp, bits.rename_columns({"pos": "pos2"}),
                        on="pos", right_on="pos2", how="left_semi",
                        num_partitions=_join_partitions(pp.count()))
    hits = _repaired(hits, pos_schema)
    n_hit = _repaired(
        preagg_sum(hits.select_columns(["key"]), ["key"], {},
                   counts="n_hit"),
        pa.schema([("key", key_t), ("n_hit", pa.int64())]))
    hj = shuffle_join(n_pos, n_hit.rename_columns({"key": "key2"}),
                      on="key", right_on="key2",
                      num_partitions=_join_partitions(None))
    hj = _repaired(hj, pa.schema([("key", key_t), ("n_pos", pa.int64()),
                                  ("n_hit", pa.int64())]))

    def only_pass(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.equal(batch.column("n_pos"),
                                  batch.column("n_hit")))
        return t.select(["key"])

    passing = _repaired(hj.map_batches(only_pass, batch_format="pyarrow"),
                        pa.schema([("key", key_t)]))

    nparts = _join_partitions(probe.count())
    n_bloom_pass = shuffle_join(
        probe.select_columns([probe_col]), passing,
        on=probe_col, right_on="key", how="left_semi",
        num_partitions=nparts).count()
    dk = _repaired(
        hash_aggregate(keys.select_columns([key_col]),
                       [key_col], lambda df: df.drop_duplicates()),
        pa.schema([(key_col, key_t)]))
    n_true = shuffle_join(
        probe.select_columns([probe_col]), dk,
        on=probe_col, right_on=key_col, how="left_semi",
        num_partitions=nparts).count()
    return pd.DataFrame({"n_keys": [int(dk.count())],
                         "n_true": [int(n_true)],
                         "n_bloom_pass": [int(n_bloom_pass)]})


def snapshot_diff(base, new, on: str | Sequence[str], cmp_col: str,
                  num_buckets: int = 128):
    """Keyed snapshot diff (CDC derivation / table-version reconcile):
    classify every key across two versions of a table as ``added``
    (only in ``new``), ``removed`` (only in ``base``), ``changed``
    (both, ``cmp_col`` differs) or ``same``. The inverse of
    :func:`apply_changeset`: where that op APPLIES a change log, this
    one DERIVES it by comparing snapshots — the maintenance pass a
    100 TB lakehouse runs to reconcile a re-ingested partition against
    the previous version.

    Plan: both sides are tag-unioned (``__side`` 0/1) carrying only the
    key + comparison columns, hash-bucketed on the key, and each bucket
    resolved in one vectorized pandas merge-with-indicator — every row
    moves exactly once and a key's two versions meet in the same
    bucket. Output is per-key (key cols + ``status``); callers that
    only need counts should follow with a combiner preagg so the
    key-sized result never concentrates anywhere.
    """
    on = [on] if isinstance(on, str) else list(on)
    cols = on + [cmp_col]

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.select(cols)
            return batch.append_column(
                "__side", pa.array([side] * batch.num_rows, pa.int8()))
        return fn

    both = base.map_batches(tag(0), batch_format="pyarrow").union(
        new.map_batches(tag(1), batch_format="pyarrow"))

    def bucket_diff(df: pd.DataFrame) -> pd.DataFrame:
        a = df.loc[df["__side"] == 0, cols]
        b = df.loc[df["__side"] == 1, cols]
        m = a.merge(b, on=on, how="outer", suffixes=("_a", "_b"),
                    indicator=True)
        status = np.where(
            m["_merge"] == "right_only", "added",
            np.where(m["_merge"] == "left_only", "removed",
                     np.where(m[cmp_col + "_a"] != m[cmp_col + "_b"],
                              "changed", "same")))
        out = m[on].copy()
        out["status"] = status
        return out

    return hash_aggregate(both, on, bucket_diff, num_buckets=num_buckets)


def negative_sample(ds, universe, k: int = 3, id_col: str = "vec_id",
                    out_col: str = "neg_id"):
    """Deterministic negative sampling — the contrastive-training
    primitive (k negatives per anchor, reproducible at any parallelism):
    negative j of anchor a is ``universe[md5_60bit(f"{a}:{j}") % n]``,
    bumped to the next slot on self-collision. The id-derived hash
    replaces an RNG so the SQL oracle replays the exact sample.

    ``universe`` is the sorted candidate id array — the AGGREGATE side,
    put in the object store once (``ray.put``) and fetched zero-copy
    per task, never re-shipped per batch. At 10^9+ candidates pass a
    class-stratified or bucketed universe instead; the anchor side
    streams unchanged either way. Returns (id_col, j, out_col) rows,
    k per anchor."""
    import hashlib

    import ray

    uni = np.sort(np.asarray(universe))  # copy: input may be read-only
    n = len(uni)
    if n < 2:
        raise ValueError("universe needs >= 2 candidates")
    uni_ref = ray.put(uni)

    def fn(batch: pa.Table) -> pa.Table:
        import ray as _ray

        u = _ray.get(uni_ref)
        ids = batch.column(id_col).to_pandas()
        anchors = np.repeat(ids.to_numpy(), k)
        js = np.tile(np.arange(k, dtype="int64"), len(ids))
        keys = pd.Series(anchors.astype(str)) + ":" + pd.Series(js).astype(str)
        idx = keys.map(lambda s: int(
            hashlib.md5(s.encode()).hexdigest()[:15], 16) % n).to_numpy()
        neg = u[idx]
        hit = neg == anchors
        if hit.any():
            neg[hit] = u[(idx[hit] + 1) % n]
        return pa.table({
            id_col: pa.array(anchors, pa.int64()),
            "j": pa.array(js, pa.int64()),
            out_col: pa.array(neg, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def negative_sample_stratified(ds, ids, labels, k: int = 3,
                               id_col: str = "vec_id",
                               label_col: str = "label",
                               out_col: str = "neg_id"):
    """Label-stratified :func:`negative_sample`: negative j of anchor a
    indexes ``md5_60bit(f"{a}:{j}")`` into the sorted COMPLEMENT
    universe of a's label (every candidate with a different label) —
    the contrastive hard-negative contract "never sample a positive".
    No self-collision handling is needed: the anchor is never in its
    own complement.

    The per-label complement arrays together hold |labels| copies of
    the id column minus one label each — still the aggregate side,
    broadcast once. Returns (id_col, label_col, j, out_col)."""
    import hashlib

    import ray

    ids = np.asarray(ids)
    labels = np.asarray(labels)
    compl = {}
    for lab in np.unique(labels):
        u = np.sort(ids[labels != lab])
        if len(u) == 0:
            raise ValueError(f"label {lab!r} has an empty complement")
        compl[lab] = u
    compl_ref = ray.put(compl)

    def fn(batch: pa.Table) -> pa.Table:
        import ray as _ray

        c = _ray.get(compl_ref)
        a = batch.column(id_col).to_pandas().to_numpy()
        lab = batch.column(label_col).to_pandas().to_numpy()
        anchors = np.repeat(a, k)
        labs = np.repeat(lab, k)
        js = np.tile(np.arange(k, dtype="int64"), len(a))
        keys = pd.Series(anchors.astype(str)) + ":" \
            + pd.Series(js).astype(str)
        h = keys.map(lambda s: int(
            hashlib.md5(s.encode()).hexdigest()[:15], 16)).to_numpy()
        neg = np.empty(len(anchors), dtype=ids.dtype)
        for lv in np.unique(labs):
            m = labs == lv
            u = c[lv]
            neg[m] = u[h[m] % len(u)]
        return pa.table({
            id_col: pa.array(anchors, pa.int64()),
            label_col: pa.array(labs),
            "j": pa.array(js, pa.int64()),
            out_col: pa.array(neg, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def join_cardinality(left, right, on: str, right_on: str | None = None,
                     num_partitions: int | None = None) -> int:
    """Exact inner-join output cardinality WITHOUT materializing the
    join: |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k). Two combiner preaggs reduce
    each side to its key-count table (key-cardinality-sized — orders
    below the data), one key-keyed join multiplies the counts, and a
    single int64 sum leaves the cluster. The planner-support primitive:
    run it before a big⋈big to size partitions or pick broadcast vs
    shuffle (the reference sizes its fan-out statically;
    src/graph_loader.rs load-balance notes)."""
    right_on = right_on or on
    la = preagg_sum(left.select_columns([on]), [on], {}, counts="ca")
    rb = preagg_sum(right.select_columns([right_on]), [right_on], {},
                    counts="cb")
    j = shuffle_join(la, rb, on=on, right_on=right_on,
                     num_partitions=num_partitions
                     or _join_partitions())

    def mul(batch: pa.Table) -> pa.Table:
        a = batch.column("ca").to_numpy(zero_copy_only=False)
        b = batch.column("cb").to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([int((a * b).sum())], pa.int64())})

    parts = j.map_batches(mul, batch_size=None,
                          batch_format="pyarrow").to_pandas()
    return int(parts["n"].sum())


def auto_join(left, right, on: str, right_on: str | None = None,
              broadcast_limit: int = 100_000, report: dict | None = None,
              num_partitions: int | None = None):
    """Adaptive INNER join: count the right side first (metadata-cheap)
    and pick the exchange — ≤ ``broadcast_limit`` rows ride the object
    store once (``broadcast_join``: zero shuffle, the small-side rule
    every stage of this repo follows), above it both sides
    hash-partition (``shuffle_join``). ``report`` (optional dict) gets
    ``{"strategy", "right_rows"}`` for plan introspection. Row-for-row
    identical output either way — asserted by the shared-oracle query
    and the unit test, which IS the adaptivity claim."""
    import ray

    right_on = right_on or on
    n = right.count()
    if report is not None:
        report["strategy"] = ("broadcast" if n <= broadcast_limit
                              else "shuffle")
        report["right_rows"] = n
    if n <= broadcast_limit:
        small = right.to_pandas()
        if right_on != on:
            small = small.rename(columns={right_on: on})
        return broadcast_join(left, small, on=on,
                              small_ref=ray.put(small))
    return shuffle_join(left, right, on=on, right_on=right_on,
                        num_partitions=num_partitions
                        or _join_partitions())


def key_skew_report(ds, key: str, top: int = 10):
    """Pre-shuffle skew diagnostic: the ``top`` heaviest keys with
    exact counts and basis-point share of all rows — the number that
    decides whether a groupby/join needs salting (DESIGN_SCALE §Skew).
    One combiner preagg (key-cardinality exchange), a distributed
    sort+limit for the head, and two scalars on the driver."""
    counts = preagg_sum(ds.select_columns([key]), [key], {}, counts="n")
    head = counts.sort(["n", key], descending=[True, False]) \
        .limit(top).to_pandas()
    total = ds.count()
    head["share_bp"] = (10_000 * head["n"].astype("int64")) // total
    head["n"] = head["n"].astype("int64")
    head["share_bp"] = head["share_bp"].astype("int64")
    return head.reset_index(drop=True)


def ivm_merge(view, deltas, keys: Sequence[str],
              value_cols: Sequence[str], count_col: str = "n"):
    """Incremental view maintenance for grouped-aggregate views — the
    classic counting algorithm: the materialized view carries exact
    per-group row counts, so inserts AND deletes apply as signed
    partial aggregates and groups whose count reaches zero vanish,
    exactly as a full recompute would drop them.

    ``view`` is the current materialization: ``keys`` + ``value_cols``
    (SUM columns) + ``count_col``. ``deltas`` is a list of
    ``(dataset, sign)`` with sign +1 (insert) / -1 (delete); each delta
    dataset carries ``keys`` + ``value_cols`` at ROW grain (count 1 per
    row). The merge is one combiner pre-aggregation over
    view-rows ∪ signed delta partials — delta-sized work, the view is
    never rescanned beyond one pass, and no driver state at all. The
    invariant (asserted by the oracle twin): merged view == full
    recompute over (base \\ deletes) ∪ inserts, bit for bit.
    """
    keys = list(keys)
    value_cols = list(value_cols)

    def signed_partial(sign: int):
        def fn(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["__cnt"] = np.int64(sign)
            for c in value_cols:
                df[c] = sign * df[c].astype("int64")
            g = df.groupby(keys, as_index=False)[
                value_cols + ["__cnt"]].sum()
            return pa.Table.from_pandas(g.rename(
                columns={"__cnt": count_col}), preserve_index=False)
        return fn

    parts = view.select_columns(keys + value_cols + [count_col])
    for ds, sign in deltas:
        parts = parts.union(
            ds.map_batches(signed_partial(sign), batch_format="pyarrow"))

    merged = preagg_sum(parts, keys,
                        {c: c for c in value_cols + [count_col]})

    def alive(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater(batch.column(count_col), 0))

    return merged.map_batches(alive, batch_format="pyarrow")


def quantile_bin(ds, value_col: str, n_bins: int = 10,
                 num_buckets: int = 64):
    """Equi-depth feature binning (the quantile discretizer of every
    feature-engineering pipeline): cutpoints are the exact discrete
    k/n_bins quantiles from the value-count exchange
    (:func:`grouped_quantiles` spec — no float interpolation), then a
    broadcast streaming pass assigns ``bin(v) = #cutpoints < v`` and a
    bin-keyed fold reports per-bin (n, min, max).

    The cutpoint list (n_bins - 1 integers) is the only driver state
    and rides the task closure; the assignment pass is pure numpy
    searchsorted — no shuffle beyond the distinct-value exchange that
    computes the quantiles. Returns (bin, n, min_v, max_v).
    """
    from raygraph.ops.graph import _repaired

    qs = [k / n_bins for k in range(1, n_bins)]

    def tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "__g": pa.array(np.zeros(batch.num_rows, dtype="int64")),
            value_col: batch.column(value_col),
        })

    cuts_df = _repaired(
        grouped_quantiles(ds.map_batches(tag, batch_format="pyarrow"),
                          ["__g"], value_col, qs=qs, prefix="q",
                          num_buckets=num_buckets),
        pa.schema([("__g", pa.int64())]
                  + [(f"q{int(round(q * 100)):02d}", pa.int64())
                     for q in qs])).to_pandas()
    cuts = np.sort(cuts_df.drop(columns="__g").to_numpy(
        dtype="int64").ravel())

    def assign(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        b = np.searchsorted(cuts, v, side="left").astype("int64")
        df = pd.DataFrame({"bin": b, "v": v.astype("int64")})
        g = df.groupby("bin", as_index=False).agg(
            n=("v", "size"), min_v=("v", "min"), max_v=("v", "max"))
        for c in ("bin", "n", "min_v", "max_v"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bin", as_index=False).agg(
            n=("n", "sum"), min_v=("min_v", "min"),
            max_v=("max_v", "max"))
        for c in ("bin", "n", "min_v", "max_v"):
            g[c] = g[c].astype("int64")
        return g

    return _repaired(
        hash_aggregate(ds.map_batches(assign, batch_format="pyarrow"),
                       ["bin"], fold, num_buckets=num_buckets),
        pa.schema([("bin", pa.int64()), ("n", pa.int64()),
                   ("min_v", pa.int64()), ("max_v", pa.int64())]))


def interval_join(facts, intervals, *, value_col: str, lo_col: str,
                  hi_col: str, interval_cols: Sequence[str],
                  fact_cols: Sequence[str] = (), tile_width: int = 0,
                  num_partitions: int | None = None):
    """Distributed range (interval) join: every fact row whose int64
    ``value_col`` falls in an interval's ``[lo, hi)`` is paired with
    that interval — the operator Ray Data's equi-``join`` cannot
    express, built from one equi-shuffle plus a residual filter.

    Tiling algorithm (the classic parallel band-join plan): the value
    axis is cut into fixed tiles of ``tile_width``. Each interval is
    REPLICATED to every tile it overlaps (fan-out ≈ len/tile_width + 1,
    so pick tile_width near the median interval length); each fact row
    lands in exactly ONE tile (its value's tile), so the equi-join on
    the tile id meets every matching (fact, interval) pair exactly once
    — no post-join dedup pass. The residual ``lo <= v < hi`` filter
    drops same-tile non-overlaps inside ``map_batches``.

    Scale notes: the only exchange is ONE hash-shuffle on the tile id —
    facts move once, intervals move fan-out times; nothing funnels
    through the driver. Skew = a hot tile (many facts × many
    overlapping intervals); the residual work in that tile is the true
    output size plus same-tile misses, bounded by choosing tile_width
    ≈ interval length. For an interval side small enough to broadcast,
    prefer :func:`interval_join_broadcast` (no shuffle at all) — this
    plan is for BOTH sides big. Empty interval side short-circuits (Ray's
    all-empty join sides lose their schema).

    Output columns: ``value_col`` + ``fact_cols`` + ``lo_col`` +
    ``hi_col`` + ``interval_cols`` (original names).
    """
    import pyarrow.compute as pc

    if tile_width <= 0:
        raise ValueError("tile_width must be a positive int64 width")
    fact_cols = list(fact_cols)
    interval_cols = list(interval_cols)

    fact_schema = facts.schema()
    iv_schema = intervals.schema()

    def _t(schema, col):
        t = dict(zip(schema.names, schema.types))[col]
        return pa.int64() if pa.types.is_timestamp(t) else t

    out_schema = pa.schema(
        [(value_col, pa.int64())]
        + [(c, _t(fact_schema, c)) for c in fact_cols]
        + [(lo_col, pa.int64()), (hi_col, pa.int64())]
        + [(c, _t(iv_schema, c)) for c in interval_cols])

    def fan_intervals(batch: pa.Table) -> pa.Table:
        lo = batch.column(lo_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        hi = batch.column(hi_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = hi > lo  # empty/inverted intervals match nothing
        lo, hi = lo[keep], hi[keep]
        sub = batch.filter(pa.array(keep))
        t0 = lo // tile_width
        reps = (hi - 1) // tile_width - t0 + 1
        total = int(reps.sum())
        idx = np.repeat(np.arange(len(lo), dtype="int64"), reps)
        offs = np.arange(total, dtype="int64") \
            - np.repeat(np.cumsum(reps) - reps, reps)
        cols = {"__tile": pa.array(t0[idx] + offs, pa.int64()),
                "__lo": pa.array(lo[idx], pa.int64()),
                "__hi": pa.array(hi[idx], pa.int64())}
        for c in interval_cols:
            cols[c] = sub.column(c).take(pa.array(idx, pa.int64()))
        return pa.table(cols)

    def tag_facts(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cols = {"__tile": pa.array(v // tile_width, pa.int64()),
                "__v": pa.array(v, pa.int64())}
        for c in fact_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    fanned = intervals.map_batches(fan_intervals,
                                   batch_format="pyarrow") \
        .materialize()
    # guard the FANNED side, not the input: a non-empty interval table
    # whose intervals are all empty/inverted still fans to zero rows,
    # and an all-empty join side loses its schema. compact_nonempty
    # additionally drops MIXED-layout empty blocks (a mostly-empty
    # interval table fans some blocks to zero rows; a join partition
    # assembled only from those loses __tile — hypothesis-found)
    fanned = compact_nonempty(fanned)
    if fanned is None or facts.count() == 0:
        import ray.data as rd

        return rd.from_arrow(out_schema.empty_table())

    joined = shuffle_join(
        facts.map_batches(tag_facts, batch_format="pyarrow"),
        fanned, on="__tile", num_partitions=num_partitions)

    def finish(batch: pa.Table) -> pa.Table:
        v = batch.column("__v")
        mask = pc.and_(pc.greater_equal(v, batch.column("__lo")),
                       pc.less(v, batch.column("__hi")))
        sub = batch.filter(mask)
        cols = {value_col: sub.column("__v")}
        for c in fact_cols:
            cols[c] = sub.column(c)
        cols[lo_col] = sub.column("__lo")
        cols[hi_col] = sub.column("__hi")
        for c in interval_cols:
            cols[c] = sub.column(c)
        return pa.table(cols)

    from raygraph.ops.graph import _repaired

    return _repaired(
        joined.map_batches(finish, batch_format="pyarrow"), out_schema)


def epoch_shuffle(ds, seed: int, id_col: str = "doc_id",
                  out: str = "position", n_tiles: int = 32):
    """Deterministic global training-order shuffle: every row gets a
    dense position in [0, n) under a seed-keyed pseudo-random
    permutation — the per-epoch corpus shuffle a training run needs,
    reproducible across reruns and resumable (position is a FUNCTION
    of (seed, id), not of execution order).

    Shuffle key = the established md5 hash-int bridge over
    ``"{seed}:{id}"``; the dense rank is the two-phase
    :func:`ordered_prefix_sum` scan over a constant-1 column — exact
    range tiles on the key, per-tile totals, one vectorized
    sort+cumsum per tile. Nothing but ``n_tiles`` scalars touches the
    driver; a different ``seed`` yields an independent permutation.
    To materialize the reordered corpus, range-partition any payload
    by the same key (``cluster_table`` on the shadow key) — this
    operator deliberately returns only the (id, position) map so the
    payload moves zero extra times when the consumer is a
    position-ordered reader.
    """
    import hashlib

    def key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pandas()
        k = ids.astype(str).map(
            lambda s: int(hashlib.md5(f"{seed}:{s}".encode())
                          .hexdigest()[:15], 16))
        return pa.table({
            id_col: batch.column(id_col),
            "__shufkey": pa.array(k.to_numpy(dtype="int64"), pa.int64()),
            "__one": pa.array(np.ones(batch.num_rows, dtype="int64")),
        })

    ranked = ordered_prefix_sum(
        ds.map_batches(key, batch_format="pyarrow"),
        "__shufkey", "__one", n_tiles=n_tiles, out=out,
        tie_cols=(id_col,))
    return ranked.select_columns([id_col, out])


def abc_classes(ds, key_col: str, value_col: str, a_bp: int = 8000,
                b_bp: int = 9500, n_tiles: int = 32):
    """ABC / Pareto classification: rank keys by ``value_col``
    descending and label each A while the running (inclusive)
    cumulative share is <= ``a_bp`` basis points of the total, B up to
    ``b_bp``, else C — the inventory/revenue concentration analysis,
    done with EXACT integer comparisons (``10^4·cum <= bp·total``
    avoids any float share).

    Input must already be one row per key (aggregate first with
    :func:`preagg_sum`). The global descending running sum is the
    two-phase :func:`ordered_prefix_sum` scan on the negated value
    (ties -> smallest key), so no global sort materializes and only
    tile totals touch the driver; the grand total is one distributed
    Sum pass.
    """
    if not (0 < a_bp <= b_bp <= 10_000):
        raise ValueError("need 0 < a_bp <= b_bp <= 10000")

    def neg(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False) \
            .astype("int64")
        return pa.table({key_col: batch.column(key_col),
                         value_col: pa.array(v, pa.int64()),
                         "__negv": pa.array(-v, pa.int64())})

    tot = int(ds.sum(value_col) or 0)
    ranked = ordered_prefix_sum(
        ds.map_batches(neg, batch_format="pyarrow"), "__negv",
        value_col, n_tiles=n_tiles, out="__before",
        tie_cols=(key_col,))

    def label(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cum = (df["__before"].to_numpy(dtype="int64")
               + df[value_col].to_numpy(dtype="int64"))
        abc = np.where(10_000 * cum <= a_bp * tot, "A",
                       np.where(10_000 * cum <= b_bp * tot, "B", "C"))
        return pa.table({
            key_col: pa.Array.from_pandas(df[key_col]),
            value_col: pa.array(df[value_col].to_numpy(dtype="int64"),
                                pa.int64()),
            "abc": pa.array(abc, pa.string()),
        })

    return ranked.map_batches(label, batch_format="pyarrow")


def topk_per_group(ds, group_cols, value_col: str, k: int,
                   tie_cols: Sequence[str] = (),
                   num_buckets: int = 64):
    """Distributed arg-top-k per group (the ROW_NUMBER() <= k window
    idiom): keep each group's k rows with the largest ``value_col``,
    ties broken ascending on ``tie_cols`` (make the combination unique
    or the result is layout-dependent).

    Combiner shape: each batch first reduces to its own per-group
    top-k (vectorized sort + groupby.head — no per-group Python), so
    the exchange carries <= k x groups x blocks rows, never the raw
    stream; one hash-bucketed reduce applies the same kernel globally.
    The same two-level trick as ``preagg_sum`` — top-k is a mergeable
    summary.
    """
    group_cols = list(group_cols)
    tie_cols = list(tie_cols)
    if k < 1:
        raise ValueError("k must be >= 1")

    by = group_cols + [value_col] + tie_cols
    asc = [True] * len(group_cols) + [False] + [True] * len(tie_cols)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(by, ascending=asc, kind="mergesort")
                .groupby(group_cols, sort=False).head(k)
                .reset_index(drop=True))

    partial = ds.map_batches(
        lambda b: pa.Table.from_pandas(local_topk(b.to_pandas()),
                                       preserve_index=False),
        batch_format="pyarrow")
    return hash_aggregate(partial, group_cols, local_topk,
                          num_buckets=num_buckets)


def target_encode(ds, key_cols, value_col: str, m: int = 10,
                  out: str = "enc_e4"):
    """Smoothed target encoding (Micci-Barreca, SIGKDD Expl. 2001) —
    the classic categorical feature for tabular models:
    ``enc(cat) = (sum_cat + m * global_mean) / (n_cat + m)``.

    Exact-integer spec: values enter as ×10^4 ints
    (``CAST(round(v*10000) AS BIGINT)`` — the repo's money/e4 idiom),
    and the encoding is ONE floor-divide over exact products:
    ``enc_e4 = (sum_e4 * N + m * GS) // ((n + m) * N)`` with GS/N the
    global sum/count — so it is bit-identical at any parallelism and a
    HUGEINT SQL oracle replays it. The products are folded with Python
    ints (object math) at the category-bounded finalize, never int64.

    Scale shape: one combiner preagg keyed by category (the only
    exchange); the global sum/count fold and the per-category encode
    run on the category-bounded aggregate.
    """
    import numpy as np

    key_cols = list(key_cols)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["__v_e4"] = np.round(
            df[value_col].to_numpy(dtype="float64") * 10_000
        ).astype("int64")
        g = df.groupby(key_cols, as_index=False).agg(
            sum_e4=("__v_e4", "sum"), n=("__v_e4", "size"))
        g["sum_e4"] = g["sum_e4"].astype("int64")
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(key_cols if len(key_cols) > 1 else key_cols[0])
           .aggregate(Sum("sum_e4", alias_name="sum_e4"),
                      Sum("n", alias_name="n"))).to_pandas()
    gs = int(sum(int(v) for v in agg["sum_e4"]))
    gn = int(sum(int(v) for v in agg["n"]))
    agg[out] = [
        (int(s) * gn + m * gs) // ((int(n) + m) * gn)
        for s, n in zip(agg["sum_e4"], agg["n"])
    ]
    agg[out] = agg[out].astype("int64")
    return agg[key_cols + ["n", out]]
