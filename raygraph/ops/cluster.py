"""Distributed k-means (Lloyd's algorithm) in exact integer arithmetic.

A first-class addition beyond the reference exporter (which has no ML
ops — SURVEY.md §2.6): the iterative-refinement shape every
training-data pipeline needs (corpus clustering, IVF coarse-quantizer
training, topic bucketing).

Scale design: the per-vector work (assignment + per-cluster partial
sums) is a vectorized ``map_batches`` pass per iteration; the only
driver-side state is the centroid matrix — k×d rows, aggregate-sized by
construction, the legitimate broadcast small side (same discipline as
the linker state and IVF lists). No iteration materializes the corpus;
each is one streaming pass ending in a (cluster, dim) combiner groupby.

Determinism contract (so a SQL oracle can replay it bit-for-bit):
vectors quantize to int64 at ×10^6 (float64 multiply then TRUNCATION —
same recipe as the centroid oracle), distances are exact int64 sums of
squared differences, argmin ties break to the smallest cluster id, and
centroid means use Python-style FLOOR division. Clusters that empty out
are dropped (both engines recompute from surviving groups only).
Overflow bound: |x_e6| ≤ 3·10^6 ⇒ d·(2·3·10^6)² < 2^63 for d ≤ 2.5·10^5.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SCALE = 1_000_000


def _quantize(batch: pa.Table, id_col: str, vec_col: str):
    from .vecops import vectors_to_numpy

    X = (vectors_to_numpy(batch.column(vec_col), np.float64)
         * SCALE).astype("int64")
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    return ids, X


def _cluster_partials(assign: np.ndarray, X: np.ndarray,
                      clusters: np.ndarray) -> pa.Table:
    """Per-batch (cluster, dim, sum_x, n) partial rows — k small numpy
    folds, never a per-row loop."""
    parts = []
    for c in clusters:
        m = assign == c
        n = int(m.sum())
        if not n:
            continue
        s = X[m].sum(axis=0, dtype=np.int64)
        parts.append(pd.DataFrame({
            "cl": np.int64(c), "dim": np.arange(X.shape[1], dtype="int64"),
            "sum_x": s, "n": np.int64(n),
        }))
    if not parts:
        return pa.table({"cl": pa.array([], pa.int64()),
                         "dim": pa.array([], pa.int64()),
                         "sum_x": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    return pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                                preserve_index=False)


def _centroids_to_driver(part_ds) -> tuple[np.ndarray, np.ndarray]:
    """(clusters, centroid matrix) from a (cl, dim, sum_x, n) partials
    Dataset — one combiner groupby, then a k×d collect (aggregate-sized,
    the legitimate driver hop)."""
    from .relational import preagg_sum

    agg = preagg_sum(part_ds, ["cl", "dim"],
                     {"sum_x": "sum_x", "n": "n"}).to_pandas()
    agg["c"] = agg["sum_x"].to_numpy() // agg["n"].to_numpy()
    wide = agg.pivot(index="cl", columns="dim", values="c").sort_index()
    return (wide.index.to_numpy(dtype="int64"),
            wide.to_numpy(dtype="int64"))


def _assign(X: np.ndarray, clusters: np.ndarray,
            cent: np.ndarray) -> np.ndarray:
    """argmin_c Σ_d (x-c)² in exact int64; ties → smallest cluster id
    (clusters is sorted, argmin takes the first minimum)."""
    diff = X[:, None, :] - cent[None, :, :]
    dist = np.einsum("bkd,bkd->bk", diff, diff)
    return clusters[np.argmin(dist, axis=1)]


def kmeans(ds, k: int = 8, iters: int = 2, id_col: str = "vec_id",
           vec_col: str = "embedding"):
    """Lloyd's k-means over an embedding column; returns a Dataset of
    (id_col, cluster) final assignments.

    Init: cluster = id % k, centroid = per-dim floor-mean (one pass).
    Each iteration: broadcast the k×d centroid matrix into a vectorized
    assignment + partial-sum ``map_batches`` pass, combiner groupby,
    k×d collect. ``iters`` refinement rounds, then one final assignment
    pass. iters+2 streaming passes total, corpus never materialized.
    """

    def init_partial(batch: pa.Table) -> pa.Table:
        ids, X = _quantize(batch, id_col, vec_col)
        return _cluster_partials(ids % k, X,
                                 np.arange(k, dtype="int64"))

    clusters, cent = _centroids_to_driver(
        ds.map_batches(init_partial, batch_format="pyarrow"))

    for _ in range(iters):
        cl_cap, cent_cap = clusters, cent

        def step_partial(batch: pa.Table, _cl=cl_cap, _ce=cent_cap
                         ) -> pa.Table:
            _, X = _quantize(batch, id_col, vec_col)
            return _cluster_partials(_assign(X, _cl, _ce), X, _cl)

        clusters, cent = _centroids_to_driver(
            ds.map_batches(step_partial, batch_format="pyarrow"))

    cl_fin, cent_fin = clusters, cent

    def final_assign(batch: pa.Table) -> pa.Table:
        ids, X = _quantize(batch, id_col, vec_col)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "cluster": pa.array(_assign(X, cl_fin, cent_fin), pa.int64()),
        })

    return ds.map_batches(final_assign, batch_format="pyarrow")


PCA_SCALE = 1_000            # ×10^3 trunc quantization for PCA moments
PCA_CBITS = 16_384           # scaled covariance magnitude bound (2^14)


def pca_power(ds, iters: int = 3, vec_col: str = "embedding"):
    """Top principal direction via one distributed covariance pass +
    small-matrix integer power iteration — the PCA primitive (corpus
    whitening, spectral features) in the same exact-integer contract as
    :func:`kmeans` so a SQL oracle replays it bit-for-bit.

    Distributed part: per batch ONE ``X.T @ X`` einsum emits the d²+d+1
    moment partials (Σxᵢxⱼ, Σxᵢ, n — partial size is d²-bound,
    independent of batch rows); a combiner ``preagg_sum`` reduces them.
    Driver part: the d×d matrix (aggregate-sized, the legitimate driver
    state — same discipline as the centroid matrix) runs ``iters``
    exact-int64 matvec rounds.

    Determinism spec: x_e3 = trunc(x·10³); C_raw = n·Σxxᵀ − (Σx)(Σx)ᵀ
    (n²-scaled covariance, exact int64 for n ≤ ~5·10⁶ at this
    quantization); K = max(1, ceil(max|C_raw| / 2^14)); C =
    TRUNC-div(C_raw, K) (DuckDB ``//`` truncates toward zero — mirrored
    here explicitly); v₀ = 1⃗; v_{t+1} = C·v_t. |v_t| ≤ (d·2^14)^t, so
    d ≤ 64 and iters ≤ 3 stay inside int64. Sign is the deterministic
    iterate's — both engines produce the same one.
    """
    from .relational import preagg_sum
    from .vecops import vectors_to_numpy

    def partials(batch: pa.Table) -> pa.Table:
        X = (vectors_to_numpy(batch.column(vec_col), np.float64)
             * PCA_SCALE).astype("int64")
        n, d = X.shape
        S = X.T @ X
        m = X.sum(axis=0, dtype=np.int64)
        ii = np.repeat(np.arange(d, dtype="int64"), d)
        jj = np.tile(np.arange(d, dtype="int64"), d)
        return pa.table({
            "i": pa.array(np.concatenate(
                [ii, np.arange(d, dtype="int64"), [-1]])),
            "j": pa.array(np.concatenate(
                [jj, np.full(d, -1, dtype="int64"), [-1]])),
            "s": pa.array(np.concatenate(
                [S.ravel(), m, [np.int64(n)]]).astype("int64")),
        })

    agg = preagg_sum(ds.map_batches(partials, batch_format="pyarrow"),
                     ["i", "j"], {"s": "s"}).to_pandas()
    n = int(agg.loc[(agg["i"] == -1) & (agg["j"] == -1), "s"].iloc[0])
    mrows = agg[(agg["j"] == -1) & (agg["i"] >= 0)].sort_values("i")
    m = mrows["s"].to_numpy(dtype="int64")
    S = agg[agg["j"] >= 0].pivot(index="i", columns="j", values="s") \
        .sort_index().to_numpy(dtype="int64")
    c_raw = n * S - np.outer(m, m)
    mx = int(np.abs(c_raw).max())
    k = max(1, -(-mx // PCA_CBITS))
    c = np.sign(c_raw) * (np.abs(c_raw) // k)     # TRUNC division
    v = np.ones(len(m), dtype=np.int64)
    for _ in range(iters):
        v = c @ v
    return pd.DataFrame({"dim": np.arange(len(m), dtype="int64"),
                         "v": v.astype("int64")})


_JL_SIGNS: dict = {}


def _jl_signs(k_out: int, d: int) -> np.ndarray:
    """Deterministic ±1 projection matrix (k_out × d): sign(j, dim) =
    +1 iff the first hex digit of md5("j:dim") is ≥ 8 — id-derived
    pseudo-randomness (same trick as the walk/MIS priorities) so a SQL
    oracle rebuilds the identical matrix. Cached per (k_out, d): the
    matrix is a constant, not per-batch work."""
    import hashlib

    key = (k_out, d)
    if key not in _JL_SIGNS:
        s = np.empty((k_out, d), dtype=np.int64)
        for j in range(k_out):
            for dim in range(d):
                h = hashlib.md5(f"{j}:{dim}".encode()).hexdigest()
                s[j, dim] = 1 if int(h[0], 16) >= 8 else -1
        _JL_SIGNS[key] = s
    return _JL_SIGNS[key]


def jl_project(ds, k_out: int = 8, id_col: str = "vec_id",
               vec_col: str = "embedding"):
    """Johnson–Lindenstrauss sign projection (Achlioptas 2003: ±1
    entries preserve pairwise distances within 1±ε at k = O(log n/ε²))
    — the dimensionality-reduction preprocessing primitive for the
    vector family, in the exact-integer contract (×10^6 trunc input,
    int64 matmul) so the oracle replays it bit-for-bit.

    One vectorized ``X @ S.T`` per batch against the cached constant
    sign matrix; output is (id, j, proj) long form, k_out rows per
    vector — a pure streaming map, no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        ids, X = _quantize(batch, id_col, vec_col)
        S = _jl_signs(k_out, X.shape[1])
        P = X @ S.T  # (rows, k_out) int64
        n = len(ids)
        return pa.table({
            id_col: pa.array(np.repeat(ids, k_out), pa.int64()),
            "j": pa.array(np.tile(np.arange(k_out, dtype="int64"), n),
                          pa.int64()),
            "proj": pa.array(P.reshape(-1), pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def grid_clusters(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                  cell_e6: int = 200_000, minpts: int = 5,
                  iters: int = 4):
    """Grid-density clustering (the DBSCAN-lite that scales): quantize
    the first two embedding dims to ``cell_e6``-wide grid cells, keep
    cells holding >= ``minpts`` points (core), connect core cells
    adjacent in the 8-neighborhood, and label each connected cell
    group by ``iters`` rounds of synchronous min-label propagation.

    Density clustering without a pairwise distance product: the only
    exchanges are a cell-keyed combiner count, a 9-probe neighbor
    join on cell keys (constant fan-out), and cell-sized label
    rounds — points never meet points. Exact integer spec: coordinates
    quantize as trunc(x * 10^6) and cells as floor(x_e6 / cell_e6),
    both reproducible in SQL (float detour exact at these magnitudes).

    Returns (cluster, n_cells, n_points) — cluster is the component's
    minimum cell key "cx:cy" after ``iters`` rounds.
    """
    from .vecops import vectors_to_numpy
    from raygraph.ops.graph import _repaired
    from raygraph.ops.relational import (_join_partitions,
                                         preagg_extreme, preagg_sum,
                                         shuffle_join)

    import ray.data as rd

    out_schema = pa.schema([("cluster", pa.string()),
                            ("n_cells", pa.int64()),
                            ("n_points", pa.int64())])

    def cells_of(batch: pa.Table) -> pa.Table:
        X = vectors_to_numpy(batch.column(vec_col), np.float64)
        xe = np.trunc(X[:, 0] * SCALE).astype("int64")
        ye = np.trunc(X[:, 1] * SCALE).astype("int64")
        cx = np.floor_divide(xe, cell_e6)
        cy = np.floor_divide(ye, cell_e6)
        k = pd.Series(cx).astype(str).str.cat(
            pd.Series(cy).astype(str), sep=":")
        return pa.table({
            "cx": pa.array(cx, pa.int64()),
            "cy": pa.array(cy, pa.int64()),
            "k": pa.array(k, pa.string()),
        })

    pts = _repaired(ds.map_batches(cells_of, batch_format="pyarrow"),
                    pa.schema([("cx", pa.int64()), ("cy", pa.int64()),
                               ("k", pa.string())]))

    counts = _repaired(
        preagg_sum(pts, ["cx", "cy", "k"], {}, counts="n"),
        pa.schema([("cx", pa.int64()), ("cy", pa.int64()),
                   ("k", pa.string()), ("n", pa.int64())]))

    def core_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch.column("n"),
                                             minpts))

    core = _repaired(
        counts.map_batches(core_only, batch_format="pyarrow"),
        pa.schema([("cx", pa.int64()), ("cy", pa.int64()),
                   ("k", pa.string()), ("n", pa.int64())]))
    if core.count() == 0:
        return rd.from_arrow(out_schema.empty_table())
    nparts = _join_partitions(core.count())

    def probes(batch: pa.Table) -> pa.Table:
        cx = batch.column("cx").to_numpy(zero_copy_only=False)
        cy = batch.column("cy").to_numpy(zero_copy_only=False)
        k = batch.column("k").to_pandas()
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nk = (pd.Series(cx + dx).astype(str)
                      .str.cat(pd.Series(cy + dy).astype(str), sep=":"))
                outs.append(pd.DataFrame({"s": k.to_numpy(), "nk": nk}))
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True),
                                    preserve_index=False)

    probe_schema = pa.schema([("s", pa.string()), ("nk", pa.string())])
    pr = _repaired(core.map_batches(probes, batch_format="pyarrow"),
                   probe_schema)
    arcs = shuffle_join(pr, core.select_columns(["k"]), on="nk",
                        right_on="k", num_partitions=nparts)
    arcs = _repaired(
        arcs.map_batches(
            lambda b: pa.table({"s": b.column("s"),
                                "d": b.column("nk")}),
            batch_format="pyarrow"),
        pa.schema([("s", pa.string()), ("d", pa.string())]))

    lab_schema = pa.schema([("k", pa.string()), ("l", pa.string())])
    labels = _repaired(
        core.map_batches(
            lambda b: pa.table({"k": b.column("k"),
                                "l": b.column("k")}),
            batch_format="pyarrow"),
        lab_schema)
    for _ in range(iters):
        step = shuffle_join(arcs, labels, on="s", right_on="k",
                            num_partitions=nparts)
        step = _repaired(
            step.map_batches(
                lambda b: pa.table({"k": b.column("d"),
                                    "l": b.column("l")}),
                batch_format="pyarrow"),
            lab_schema)
        labels = _repaired(
            preagg_extreme(step, ["k"], "l", how="min"), lab_schema)

    # per-cluster cell counts + point counts (core-cell points only)
    cellj = shuffle_join(core.select_columns(["k", "n"]), labels,
                         on="k", right_on="k",
                         num_partitions=nparts)
    per = _repaired(
        preagg_sum(
            cellj.map_batches(
                lambda b: pa.table({"cluster": b.column("l"),
                                    "n_points": b.column("n")}),
                batch_format="pyarrow"),
            ["cluster"], {"n_points": "n_points"}, counts="n_cells"),
        pa.schema([("cluster", pa.string()), ("n_points", pa.int64()),
                   ("n_cells", pa.int64())]))
    return _repaired(
        per.select_columns(["cluster", "n_cells", "n_points"]),
        out_schema)
