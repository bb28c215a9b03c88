"""Cardinality sketches: HyperLogLog approximate COUNT(DISTINCT).

The scale counterpart of :func:`raygraph.ops.relational.distinct_count`:
the exact count must shuffle the whole distinct (group, value) pair set,
while HLL caps the exchange at ``M`` one-byte registers per group —
constant per group no matter how many distinct values (Flajolet et al.,
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm", AofA 2007).

The estimator here is deliberately a FULLY INTEGER spec:

* value hash = low 60 bits of md5(str(value)) — the engine-portable
  hash this repo uses everywhere (same trick as deterministic_sample);
* bucket ``j`` = top P bits, ``w`` = remaining W = 60-P bits,
  ``rho = W - bit_length(w) + 1`` (``W+1`` for w = 0);
* register ``M_j`` = max rho per (group, bucket), merged with MAX — the
  order-free associative merge that makes per-batch partials exact;
* ``S = Σ_j 2^(60 - M_j)`` over all M buckets (empty bucket → 2^60),
  an exact integer, and the estimate is returned ×10^4 as
  ``(ALPHA_E6 · M² · 2^60 · 10^4) // (10^6 · S)`` — integer floor
  arithmetic end to end, so the result is bit-identical at any
  parallelism and a DuckDB oracle (md5 + bin-length + HUGEINT sums)
  reproduces it exactly.

No small-range (linear-counting) correction is applied — that branch
needs a float log and would break the integer contract; raw HLL
over-estimates when the true cardinality is ≲ M (documented bias,
pinned in tests at n >> M where the ±1.04/√M error bound applies).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

P = 6                      # 2^6 = 64 buckets
M = 1 << P
W = 60 - P                 # bits used for the rho pattern
ALPHA_E6 = 709_000         # alpha_64 = 0.709 (HLL paper), ×10^6
_HASH_SCALE = 1 << 60


def _register_partials(group_cols, value_col):
    """Per-batch (group, bucket, max-rho) partial registers."""
    group_cols = list(group_cols)

    def fn(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[group_cols + [value_col]].drop_duplicates()
        js, rhos = [], []
        wmask = (1 << W) - 1
        for v in df[value_col]:
            h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            w = h & wmask
            js.append(h >> W)
            rhos.append(W + 1 if w == 0 else W - w.bit_length() + 1)
        df["__j"] = pd.Series(js, index=df.index, dtype="int64")
        df["__rho"] = pd.Series(rhos, index=df.index, dtype="int64")
        g = df.groupby(group_cols + ["__j"], as_index=False)["__rho"].max()
        return pa.Table.from_pandas(g, preserve_index=False)

    return fn


def hll_distinct(ds, group_cols, value_col: str, out: str = "approx_n_e4",
                 num_buckets: int = 64):
    """Approximate distinct count per group, returned as the integer
    estimate ×10^4 (see module docstring for the exact spec)."""
    from ray.data.aggregate import Max

    from .relational import hash_aggregate

    group_cols = list(group_cols)
    regs = (
        ds.map_batches(_register_partials(group_cols, value_col),
                       batch_format="pyarrow")
        .groupby(group_cols + ["__j"])
        .aggregate(Max("__rho", alias_name="__rho"))
    )

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for gkey, g in df.groupby(group_cols, sort=False):
            s = 0
            for mj in g["__rho"]:
                s += 1 << (60 - int(mj))
            s += (M - len(g)) * _HASH_SCALE          # empty buckets: M_j = 0
            est = (ALPHA_E6 * M * M * _HASH_SCALE * 10_000) // (10**6 * s)
            row = dict(zip(group_cols,
                           gkey if isinstance(gkey, tuple) else (gkey,)))
            row[out] = est
            rows.append(row)
        o = pd.DataFrame(rows, columns=group_cols + [out])
        o[out] = o[out].astype("int64")
        return o

    # ≤ M register rows per group reach the reduce — group keys are
    # co-located by the bucket hash, so the estimate is exact-per-spec
    return hash_aggregate(regs, group_cols, estimate,
                          num_buckets=num_buckets)


# ---------------------------------------------------------------- Count-Min
# Cormode & Muthukrishnan, "An improved data stream summary: the
# count-min sketch and its applications", J. Algorithms 2005. Same
# integer-contract discipline as HLL above: row hash d = low 60 bits of
# md5(f"{d}:{value}") % CMS_W — engine-portable, so a SQL oracle
# rebuilds the identical sketch and estimates.

CMS_D = 3                  # hash rows
CMS_W = 512                # buckets per row


def _cms_bucket_series(vals: pd.Series, d: int) -> pd.Series:
    """Vectorized-enough md5 bucketing (one hash per UNIQUE value)."""
    import hashlib as _h

    uniq = pd.Index(vals.unique())
    buckets = {
        v: int(_h.md5(f"{d}:{v}".encode()).hexdigest()[:15], 16) % CMS_W
        for v in uniq
    }
    return vals.map(buckets)


def cms_sketch(ds, value_col: str, weight_col: str | None = None):
    """Count-Min sketch of a value stream as a (d, bucket, cnt) Dataset
    (≤ CMS_D × CMS_W rows — constant-size no matter the stream).

    Per-batch partials: count (or sum ``weight_col``) per unique value,
    hash each unique value into one bucket per row d, sum into (d,
    bucket) cells; the global merge is a ``preagg_sum`` over at most
    D×W keys. The md5 cost is paid once per unique value per batch.
    """
    from .relational import preagg_sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if weight_col is None:
            per_val = df[value_col].value_counts().rename_axis("v") \
                .reset_index(name="cnt")
        else:
            per_val = df.groupby(value_col, as_index=False)[weight_col] \
                .sum().rename(columns={value_col: "v", weight_col: "cnt"})
        frames = []
        for d in range(CMS_D):
            frames.append(pd.DataFrame({
                "d": d,
                "bucket": _cms_bucket_series(per_val["v"], d),
                "cnt": per_val["cnt"],
            }))
        x = pd.concat(frames, ignore_index=True)
        g = x.groupby(["d", "bucket"], as_index=False)["cnt"].sum()
        g["cnt"] = g["cnt"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    return preagg_sum(ds.map_batches(partial, batch_format="pyarrow"),
                      ["d", "bucket"], {"cnt": "cnt"})


def cms_estimate(sketch_df: pd.DataFrame, values) -> pd.DataFrame:
    """Point-estimate counts for ``values`` from a collected sketch
    table: est(v) = min over d of cell(d, bucket_d(v)) — the classic
    upper-bound estimator (never under-counts). The sketch is D×W rows,
    driver-small by construction."""
    import hashlib as _h

    cells = {(int(r.d), int(r.bucket)): int(r.cnt)
             for r in sketch_df.itertuples(index=False)}
    rows = []
    for v in values:
        est = min(
            cells.get(
                (d, int(_h.md5(f"{d}:{v}".encode()).hexdigest()[:15], 16)
                 % CMS_W), 0)
            for d in range(CMS_D)
        )
        rows.append({"token": v, "cms_n": est})
    out = pd.DataFrame(rows, columns=["token", "cms_n"])
    out["cms_n"] = out["cms_n"].astype("int64")
    return out


# ---------------------------------------------------------------- Bloom
# Bloom, "Space/time trade-offs in hash coding with allowable errors",
# CACM 1970. Used here as a JOIN PREFILTER: build a bitmap of the small
# side's keys in-cluster, broadcast it once, and drop big-side rows that
# cannot match BEFORE the shuffle join. False positives only — the join
# after the filter keeps exactness; what the filter buys is shuffle
# volume proportional to matching rows, not the whole big side.

BLOOM_M = 1 << 20          # bits (128 KiB bitmap)
BLOOM_K = 4                # probes per key
_WORDS = BLOOM_M // 64


def _bloom_hashes(vals: pd.Series):
    """Two independent deterministic 64-bit hash streams (double
    hashing: probe i uses h1 + i·h2). pandas' hash is keyed by a fixed
    default, so the bitmap is identical on every worker and engine."""
    h1 = pd.util.hash_pandas_object(vals, index=False).to_numpy()
    h2 = pd.util.hash_pandas_object(vals.astype(str) + "\x00b",
                                    index=False).to_numpy()
    return h1, h2 | 1


def _probe_positions(vals: pd.Series):
    h1, h2 = _bloom_hashes(vals)
    import numpy as np

    pos = np.empty((BLOOM_K, len(h1)), dtype=np.uint64)
    for i in range(BLOOM_K):
        pos[i] = (h1 + np.uint64(i) * h2) % np.uint64(BLOOM_M)
    return pos


def bloom_build(ds, col: str):
    """Distributed bitmap build: per-block partial bitmaps OR-merged by
    a tree reduce (bitwise OR is associative/idempotent, so the result
    is layout-independent). Returns the bitmap as a numpy uint64 array —
    128 KiB regardless of key count; broadcast it with ``ray.put``."""
    import numpy as np

    from .relational import tree_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pandas()
        bits = np.zeros(_WORDS, dtype=np.uint64)
        pos = _probe_positions(vals).reshape(-1)
        np.bitwise_or.at(bits, (pos // 64).astype(np.int64),
                         np.uint64(1) << (pos % np.uint64(64)))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as _np

        acc = _np.zeros(_WORDS, dtype=_np.uint64)
        for b in df["bits"]:
            acc |= _np.frombuffer(b, dtype=_np.uint64)
        return pd.DataFrame({"bits": [acc.tobytes()]})

    out = tree_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                         combine, precombined=True).take_all()
    import numpy as _np

    return _np.frombuffer(out[0]["bits"], dtype=_np.uint64).copy()


def bloom_filter_ds(big, col: str, bitmap, bitmap_ref=None):
    """Keep only rows whose ``col`` MIGHT be in the key set the bitmap
    was built from (no false negatives). The bitmap ships once via
    ``ray.put``; the per-batch test is K vectorized gathers."""
    import numpy as np
    import ray

    if bitmap_ref is None:
        bitmap_ref = ray.put(np.ascontiguousarray(bitmap))

    def fn(batch: pa.Table) -> pa.Table:
        import ray as _ray

        bits = _ray.get(bitmap_ref)
        vals = batch.column(col).to_pandas()
        pos = _probe_positions(vals)
        keep = np.ones(len(vals), dtype=bool)
        for i in range(BLOOM_K):
            word = bits[(pos[i] // 64).astype(np.int64)]
            keep &= (word >> (pos[i] % np.uint64(64))) & np.uint64(1) != 0
        return batch.filter(pa.array(keep))

    return big.map_batches(fn, batch_format="pyarrow")


def bloom_semi_join(big, keys_ds, on: str, right_on: str,
                    num_partitions: int | None = None):
    """Distributed EXISTS with a Bloom prefilter: build the bitmap of
    ``keys_ds.right_on`` in-cluster, drop non-matching big-side rows at
    scan speed, then the exact ``left_semi`` shuffle join — the join
    shuffles only probable matches. Result is EXACTLY the plain semi
    join (the bitmap admits false positives, the join removes them)."""
    from .relational import shuffle_join

    bitmap = bloom_build(keys_ds, right_on)
    filtered = bloom_filter_ds(big, on, bitmap)
    return shuffle_join(filtered, keys_ds, on=on, right_on=right_on,
                        how="left_semi", num_partitions=num_partitions)


# ------------------------------------------------------------- Misra-Gries
def _mg_compress(df: pd.DataFrame, capacity: int) -> pd.DataFrame:
    """Misra-Gries compress of an exact (key, w) histogram to ≤ capacity
    entries: subtract the (capacity+1)-th largest weight from every entry
    and drop the non-positive ones. Total weight removed per compress is
    ≤ dec · (#entries), which telescopes to the classic n/(capacity+1)
    undercount bound (Misra & Gries 1982; mergeable form Agarwal et al.,
    PODS 2012)."""
    import numpy as np

    if len(df) <= capacity:
        return df
    w = df["w"].to_numpy()
    dec = np.partition(w, len(w) - capacity - 1)[len(w) - capacity - 1]
    out = df[df["w"] > dec].copy()
    out["w"] -= dec
    return out


def heavy_hitters(ds, k: int, values_fn, out_key: str = "token"):
    """All stream items with frequency STRICTLY ABOVE n/k, exactly —
    found without ever shuffling the raw stream.

    ``values_fn(batch) -> pd.Series`` produces the stream items of one
    batch (e.g. exploded tokens). Two passes:

    1. **Candidates.** Per batch: exact local counts → Misra-Gries
       compress to k-1 entries. Any item with GLOBAL frequency > n/k has
       LOCAL frequency > n_b/k in at least one batch (pigeonhole), and
       MG at capacity k-1 retains every such local item — so the union
       of the per-batch summaries is a guaranteed superset of the true
       heavy hitters. The exchange is bounded by #blocks · k rows (plus
       one total-count row per block), never the stream.
    2. **Exact verify.** The deduped candidate set (≤ #blocks · k keys,
       in practice ~k) is broadcast once (``ray.put``); a second scan
       counts ONLY candidate items per batch, and one small groupby-sum
       plus the driver-side ``n · k > total`` filter yields the exact
       answer — layout-invariant because pass 2 is exact over a
       layout-invariant superset.

    Returns a pandas DataFrame (out_key, n) sorted by n desc, key asc.
    """
    import ray

    from .relational import preagg_sum

    capacity = max(1, k - 1)

    def partial(batch: pa.Table) -> pa.Table:
        vals = values_fn(batch)
        g = vals.value_counts().rename_axis(out_key).reset_index(name="w")
        total = int(g["w"].sum())
        g = _mg_compress(g, capacity)
        # explicit schema: an all-null or empty pandas column would
        # otherwise infer a different arrow type per block
        return pa.table({
            out_key: pa.array(g[out_key].astype(str).tolist() + [None],
                              pa.string()),
            "w": pa.array(g["w"].tolist() + [total], pa.int64()),
        })  # trailing null-key row carries the per-block total

    summary = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n_total = int(summary.loc[summary[out_key].isna(), "w"].sum())
    cand = summary.loc[summary[out_key].notna(), out_key].unique()
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
            out_key: pa.array(g[out_key].astype(str).tolist(), pa.string()),
            "n": pa.array(g["n"].tolist(), pa.int64()),
        })

    counts = preagg_sum(ds.map_batches(exact, batch_format="pyarrow"),
                        [out_key], {"n": "n"}).to_pandas()
    hits = counts[counts["n"] * k > n_total]
    return (hits.sort_values(["n", out_key], ascending=[False, True])
            .reset_index(drop=True))


# ---------------------------------------------------------- HDR quantiles
def _hdr_bucket(v: "np.ndarray", m: int) -> "np.ndarray":
    """Monotone log-bucket id for non-negative int64 values: v < 2^m
    maps to itself (exact); larger v keeps its exponent e and the top
    m mantissa bits, so each bucket spans < 2^(e-m) and the RELATIVE
    quantization error is bounded by 2^-m regardless of scale — the
    HdrHistogram layout. Bucket ids are contiguous and ordered, and
    the whole sketch has ≤ (64-m)·2^m cells no matter the corpus."""
    import numpy as np

    v = np.asarray(v, dtype=np.int64)
    if len(v) and int(v.min()) < 0:
        raise ValueError("hdr buckets need non-negative values")
    out = v.copy()
    big = v >= (1 << m)
    if big.any():
        vb = v[big]
        # exact bit_length via frexp (float64 is exact below 2^53)
        e = np.frexp(vb.astype(np.float64))[1].astype(np.int64) - 1
        out[big] = ((e - m) << m) + (vb >> (e - m))
    return out


def _hdr_lower(bucket: "np.ndarray", m: int) -> "np.ndarray":
    """Smallest value mapping to ``bucket`` — the deterministic
    quantile representative (an UNDER-estimate by < 2^-m relative)."""
    import numpy as np

    b = np.asarray(bucket, dtype=np.int64)
    out = b.copy()
    big = b >= (1 << (m + 1))
    if big.any():
        sh = (b[big] >> m) - 1
        out[big] = (b[big] - (sh << m)) << sh
    return out


def hdr_quantiles(ds, value_col: str, q_pcts=(50, 90, 99),
                  m_bits: int = 7):
    """Approximate quantiles from a MERGEABLE fixed-size log-bucket
    histogram: per-batch bucket counts (≤ (64-m)·2^m rows each) sum
    associatively through one tiny exchange, so the sketch — never the
    data — moves, and sketches of disjoint corpora merge by addition
    (the property exact rank-based quantiles lack). The estimate for
    quantile q is the lower bound of the first bucket whose cumulative
    count reaches ceil(q·n) — an integer spec (100·cum ≥ q_pct·n,
    no float rank math), under-estimating the exact percentile_disc by
    a guaranteed < 2^-m relative error.

    Returns pandas (q_pct, est) sorted by q_pct."""
    from .relational import preagg_sum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        b = pd.Series(_hdr_bucket(v, m_bits))
        g = b.value_counts().rename_axis("bucket").reset_index(name="n")
        return pa.table({"bucket": pa.array(g["bucket"], pa.int64()),
                         "n": pa.array(g["n"], pa.int64())})

    sk = preagg_sum(ds.map_batches(partial, batch_format="pyarrow"),
                    ["bucket"], {"n": "n"}).to_pandas() \
        .sort_values("bucket", ignore_index=True)
    n = int(sk["n"].sum())
    cum = sk["n"].cumsum().to_numpy()
    rows = []
    for q in q_pcts:
        if n == 0:
            rows.append((int(q), 0))
            continue
        # first bucket with 100*cum >= q*n  (== cum >= ceil(q*n/100))
        i = int((100 * cum >= q * n).argmax())
        est = int(_hdr_lower(sk["bucket"].to_numpy()[i:i + 1],
                             m_bits)[0])
        rows.append((int(q), est))
    return pd.DataFrame(rows, columns=["q_pct", "est"]).sort_values(
        "q_pct", ignore_index=True)


def hdr_quantiles_grouped(ds, group_cols, value_col: str,
                          q_pcts=(50, 90, 99), m_bits: int = 7):
    """Per-group :func:`hdr_quantiles`: one (group, bucket) counted
    exchange — bounded by |groups| × sketch cells, never the data —
    then the same integer rank selection per group on the driver-side
    aggregate (groups are the aggregate; the per-group loop runs over
    group cardinality, not rows). Returns pandas
    (group_cols..., q_pct, est) sorted by (group_cols, q_pct)."""
    from .relational import preagg_sum

    group_cols = list(group_cols)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(group_cols + [value_col]).to_pandas()
        df["bucket"] = _hdr_bucket(df[value_col].to_numpy(), m_bits)
        g = df.groupby(group_cols + ["bucket"], as_index=False) \
            .size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    sk = preagg_sum(ds.map_batches(partial, batch_format="pyarrow"),
                    group_cols + ["bucket"], {"n": "n"}).to_pandas()
    rows = []
    for key, gdf in sk.groupby(group_cols, sort=True):
        if not isinstance(key, tuple):
            key = (key,)
        gdf = gdf.sort_values("bucket")
        n = int(gdf["n"].sum())
        cum = gdf["n"].cumsum().to_numpy()
        buckets = gdf["bucket"].to_numpy()
        for q in q_pcts:
            i = int((100 * cum >= q * n).argmax())
            est = int(_hdr_lower(buckets[i:i + 1], m_bits)[0])
            rows.append((*key, int(q), est))
    return pd.DataFrame(rows, columns=group_cols + ["q_pct", "est"]) \
        .sort_values(group_cols + ["q_pct"], ignore_index=True)


def heavy_hitters_grouped(ds, k: int, pairs_fn, group_key: str = "g",
                          out_key: str = "token"):
    """Per-group :func:`heavy_hitters`: exact items with frequency
    > n_g/k WITHIN each group. ``pairs_fn(batch) -> DataFrame`` with
    columns [group_key, out_key] (one row per stream item). Pass 1
    ships one MG summary per (block, group) — ≤ k rows each plus a
    per-group total row; pass 2 counts the broadcast per-group
    candidate sets exactly and applies each group's own threshold.
    Exchange O(blocks · groups · k); the stream never moves."""
    import ray

    from .relational import preagg_sum

    cap = max(1, k - 1)

    def partial(batch: pa.Table) -> pa.Table:
        df = pairs_fn(batch)
        counts = df.groupby([group_key, out_key], as_index=False) \
            .size().rename(columns={"size": "w"})
        frames = []
        for gval, gdf in counts.groupby(group_key, sort=False):
            total = int(gdf["w"].sum())
            c = _mg_compress(gdf.rename(columns={out_key: "token"})
                             [["token", "w"]], cap) \
                .rename(columns={"token": out_key})
            c = pd.concat([c, pd.DataFrame(
                {out_key: [None], "w": [total]})], ignore_index=True)
            c[group_key] = gval
            frames.append(c)
        if not frames:
            return pa.table({group_key: pa.array([], pa.string()),
                             out_key: pa.array([], pa.string()),
                             "w": pa.array([], pa.int64())})
        out = pd.concat(frames, ignore_index=True)
        return pa.table({
            group_key: pa.array(out[group_key].astype(str), pa.string()),
            out_key: pa.array(
                [None if pd.isna(t) else str(t) for t in out[out_key]],
                pa.string()),
            "w": pa.array(out["w"].astype("int64"), pa.int64()),
        })

    summary = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    totals = summary[summary[out_key].isna()] \
        .groupby(group_key)["w"].sum().to_dict()
    cand = summary.dropna(subset=[out_key])[[group_key, out_key]] \
        .drop_duplicates()
    if not totals or cand.empty:
        return pd.DataFrame({group_key: pd.Series([], dtype=str),
                             out_key: pd.Series([], dtype=str),
                             "n": pd.Series([], dtype="int64")})
    cand_ref = ray.put(cand)

    def exact(batch: pa.Table) -> pa.Table:
        import ray as _ray

        cset = _ray.get(cand_ref)
        df = pairs_fn(batch)
        hit = df.merge(cset, on=[group_key, out_key])
        g = hit.groupby([group_key, out_key], as_index=False) \
            .size().rename(columns={"size": "n"})
        return pa.table({
            group_key: pa.array(g[group_key].astype(str), pa.string()),
            out_key: pa.array(g[out_key].astype(str), pa.string()),
            "n": pa.array(g["n"].astype("int64"), pa.int64()),
        })

    counts = preagg_sum(ds.map_batches(exact, batch_format="pyarrow"),
                        [group_key, out_key], {"n": "n"}).to_pandas()
    tot = counts[group_key].map(totals).astype("int64")
    hits = counts[counts["n"] * k > tot]
    return hits.sort_values([group_key, "n", out_key],
                            ascending=[True, False, True],
                            ignore_index=True)


def _hll_estimate_e4(mj_by_register: dict[int, int]) -> int:
    """The integer HLL estimate (×10^4) from a register→max-rho map —
    the same spec as :func:`hll_distinct`'s finalize, reused by the
    set-algebra op."""
    s = 0
    for mj in mj_by_register.values():
        s += 1 << (60 - int(mj))
    s += (M - len(mj_by_register)) * _HASH_SCALE
    return (ALPHA_E6 * M * M * _HASH_SCALE * 10_000) // (10**6 * s)


def hll_set_algebra(ds_a, ds_b, value_col: str):
    """HLL sketch set algebra — the mergeability superpower that makes
    the sketch worth its error bar: |A| and |B| estimate from their
    own registers, |A∪B| from the REGISTER-WISE MAX (exactly the
    sketch a node holding A and a node holding B would merge without
    re-reading either), and |A∩B| by inclusion–exclusion (can go
    negative at small overlaps — reported as-is, integer).

    One combiner pass per side builds the (register, max-rho) table
    (M = 64 rows each); everything after runs on 2·M driver scalars.
    Returns a 1-row DataFrame (a_e4, b_e4, union_e4, intersect_e4).
    """
    import numpy as np

    from ray.data.aggregate import Max

    def regs(ds) -> dict[int, int]:
        def tag(batch: pa.Table) -> pa.Table:
            return pa.table({
                "__g": pa.array(np.zeros(batch.num_rows, dtype="int64")),
                value_col: batch.column(value_col),
            })

        r = (ds.map_batches(tag, batch_format="pyarrow")
             .map_batches(_register_partials(["__g"], value_col),
                          batch_format="pyarrow")
             .groupby(["__g", "__j"])
             .aggregate(Max("__rho", alias_name="__rho"))).to_pandas()
        if "__j" not in r.columns:
            return {}
        return dict(zip(r["__j"].astype(int), r["__rho"].astype(int)))

    ra, rb = regs(ds_a), regs(ds_b)
    ru = dict(ra)
    for j, v in rb.items():
        ru[j] = max(ru.get(j, 0), v)
    a, b, u = (_hll_estimate_e4(ra), _hll_estimate_e4(rb),
               _hll_estimate_e4(ru))
    return pd.DataFrame({"a_e4": [a], "b_e4": [b], "union_e4": [u],
                         "intersect_e4": [a + b - u]}).astype("int64")


# ------------------------------------------------------------------- KMV
# Bar-Yossef, Jayram, Kumar, Sivakumar & Trevisan, "Counting distinct
# elements in a data stream" (RANDOM 2002): keep the k MINIMUM hash
# values of the distinct elements; if fewer than k distinct hashes were
# ever seen the count is exact, else estimate (k-1) * 2^60 / h_(k).
# The sketch is a SET of hashes, so the merge (bottom-k of the union of
# per-batch bottom-k's) is order-free and exact — bit-identical at any
# parallelism — and the whole estimator is integer floor arithmetic on
# the same md5-60bit value hash the repo uses everywhere, so a DuckDB
# oracle (row_number over hash-ordered distinct values) reproduces it
# bit-for-bit. Reference analog: the shard-count/dedup metrics surface,
# arangors-graph-exporter src/graph_loader.rs:189-204 (collection-level
# cardinality bookkeeping), re-expressed as a mergeable sketch.


def _kmv_hash_series(vals: pd.Series) -> pd.Series:
    """md5-60bit hash per value (one md5 per UNIQUE value per batch)."""
    import hashlib as _h

    uniq = pd.Index(vals.unique())
    hs = {
        v: int(_h.md5(str(v).encode()).hexdigest()[:15], 16)
        for v in uniq
    }
    return vals.map(hs)


def kmv_distinct(ds, group_cols, value_col: str, k: int = 32,
                 out: str = "approx_n", num_buckets: int = 64):
    """Approximate distinct count per group via a bottom-k (KMV) sketch.

    Per-batch partial: the k smallest distinct value-hashes per group
    (≤ k rows per group per batch leave the map side — constant no
    matter how many duplicates the batch held). Global merge: distinct
    hashes re-folded to the k smallest per group inside one
    ``hash_aggregate`` exchange. Estimate per group:

    * fewer than k distinct hashes survive → that exact count;
    * else ``(k - 1) * 2**60 // h_(k)`` with ``h_(k)`` the k-th
      smallest hash — integer floor end to end.

    Compared with :func:`hll_distinct` the exchange is k int64s per
    group instead of 64 registers, and the same sketch doubles as a
    deterministic distinct-value SAMPLE (the bottom-k hashes are a
    uniform sample of the distinct set — the KMV coordinated-sampling
    property), which is why it earns its place next to HLL.
    """
    from .relational import hash_aggregate

    group_cols = list(group_cols)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[group_cols + [value_col]].drop_duplicates()
        df["__h"] = _kmv_hash_series(df[value_col]).astype("int64")
        df = df.drop(columns=[value_col]).drop_duplicates()
        g = (df.sort_values("__h", kind="mergesort")
               .groupby(group_cols, as_index=False, sort=False)
               .head(k))
        return pa.Table.from_pandas(
            g.reset_index(drop=True), preserve_index=False)

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for gkey, g in df.groupby(group_cols, sort=False):
            hs = sorted(set(int(h) for h in g["__h"]))[:k]
            if len(hs) < k:
                est = len(hs)
            else:
                est = ((k - 1) * _HASH_SCALE) // hs[-1]
            row = dict(zip(group_cols,
                           gkey if isinstance(gkey, tuple) else (gkey,)))
            row[out] = est
            rows.append(row)
        o = pd.DataFrame(rows, columns=group_cols + [out])
        o[out] = o[out].astype("int64")
        return o

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return hash_aggregate(parts, group_cols, estimate,
                          num_buckets=num_buckets)
