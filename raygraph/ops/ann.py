"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — numpy matmul per batch against a
broadcast query matrix (``ray.put`` once), per-batch partial top-k, tiny
driver-side merge. Scale path: random-hyperplane LSH bucketing so a query
only scans its probe buckets (same hyperplane trick as
``dedup.embedding_near_dup_pairs``).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

from .vecops import vectors_to_numpy


def _normalize(m: np.ndarray) -> np.ndarray:
    # einsum, not np.linalg.norm: norm() upcasts + copies on big float32
    # blocks (~100x slower in profiles)
    n = np.sqrt(np.einsum("ij,ij->i", m, m))[:, None]
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(
    ds,
    query: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dtype=np.float32,
    round_dp: int = 6,
) -> pd.DataFrame:
    """Exact cosine top-k of ``query`` (1-D) over the embedding column.

    Per-batch partial top-k inside ``map_batches`` (the combiner), then a
    heap merge of ≤ k rows per batch on the driver — the full corpus never
    leaves the cluster. ``dtype=np.float64`` makes results bit-comparable
    with a double-precision SQL oracle; float32 (default) halves bandwidth
    at scale.
    """
    q = np.asarray(query, dtype=dtype).reshape(1, -1)
    q = _normalize(q)

    def partial(batch: pa.Table) -> pa.Table:
        vecs = vectors_to_numpy(batch.column(vec_col), dtype)
        sims = (_normalize(vecs) @ q.T).ravel()
        top = np.argsort(-sims)[:k]
        return pa.table(
            {
                id_col: batch.column(id_col).take(pa.array(top, pa.int64())),
                "cosine": pa.array(np.round(sims[top].astype("float64"), round_dp)),
            }
        )

    heap: list[tuple[float, object]] = []
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for vid, s in zip(b.column(id_col).to_pylist(), b.column("cosine").to_pylist()):
            heapq.heappush(heap, (s, vid))
            if len(heap) > k:
                heapq.heappop(heap)
    rows = sorted(heap, key=lambda t: (-t[0], t[1]))
    return pd.DataFrame({id_col: [r[1] for r in rows],
                         "cosine": [r[0] for r in rows]})


class LshIndexStage:
    """Actor-pool stage assigning each vector to a hyperplane-LSH bucket —
    the build side of a bucketed ANN index (write out partitioned by
    ``bucket`` and a query scans only matching partitions)."""

    def __init__(self, dim: int, n_planes: int = 10, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(dim, n_planes).astype(np.float32)
        self.weights = (1 << np.arange(n_planes)).astype(np.int64)

    def bucket_of(self, vecs: np.ndarray) -> np.ndarray:
        signs = (vecs @ self.planes) > 0
        return (signs * self.weights).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = vectors_to_numpy(batch.column("embedding"), np.float32)
        return batch.append_column("bucket", pa.array(self.bucket_of(vecs), pa.int64()))


def ivf_centroids(
    ds,
    n_centroids: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic spherical k-means centroids from a corpus sample.

    The coarse quantizer of an IVF index: Lloyd iterations on an L2-
    normalized sample (``ds.limit(sample_size)`` — deterministic read
    order), fixed-seed init. Driver-side on the SAMPLE only — the corpus
    itself never leaves the cluster; at 100 TB the sample is the same
    few thousand rows."""
    import pyarrow as _pa  # noqa: F401

    rows = ds.limit(sample_size).take_all()
    vecs = _normalize(np.array([r[vec_col] for r in rows], dtype=np.float32))
    rng = np.random.RandomState(seed)
    cent = vecs[rng.choice(len(vecs), size=min(n_centroids, len(vecs)),
                           replace=False)]
    for _ in range(iters):
        assign = np.argmax(vecs @ cent.T, axis=1)
        for c in range(len(cent)):
            m = vecs[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
        cent = _normalize(cent)
    return cent


class IvfAssign:
    """Actor-pool stage: nearest-centroid id per vector (one matmul per
    batch against the broadcast centroid matrix)."""

    def __init__(self, centroids: np.ndarray, vec_col: str = "embedding"):
        self.centroids = np.asarray(centroids, dtype=np.float32)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(vectors_to_numpy(batch.column(self.vec_col),
                                           np.float32))
        assign = np.argmax(vecs @ self.centroids.T, axis=1).astype(np.int64)
        return batch.append_column("__centroid", pa.array(assign, pa.int64()))


def ivf_topk(
    ds,
    query: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
    dtype=np.float32,
    round_dp: int = 6,
) -> pd.DataFrame:
    """IVF ANN top-k: scan only the ``nprobe`` centroid cells nearest the
    query. ``nprobe == n_centroids`` scans every cell and is EXACTLY
    brute force (the oracle-able contract); smaller nprobe trades recall
    for the scan fraction ~nprobe/n_centroids."""
    if centroids is None:
        centroids = ivf_centroids(ds, n_centroids, vec_col=vec_col)
    q = _normalize(np.asarray(query, dtype=np.float32).reshape(1, -1))[0]
    order = np.argsort(-(centroids @ q))
    probe_arr = pa.array(sorted(int(c) for c in order[:nprobe]), pa.int64())

    def filter_cells(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_in(batch.column("__centroid"), value_set=probe_arr)
        return batch.filter(keep).drop_columns(["__centroid"])

    # stateless tasks (see lsh_topk): the centroid matrix is tiny and
    # ships in the task closure; parallelism follows block count
    assigner = IvfAssign(centroids, vec_col)

    def stage(batch: pa.Table) -> pa.Table:
        return filter_cells(assigner(batch))

    scanned = ds.map_batches(stage, batch_format="pyarrow")
    return brute_force_topk(scanned, query, k, vec_col, id_col,
                            dtype=dtype, round_dp=round_dp)


class MultiTableLsh:
    """Actor-pool stage: hyperplane buckets for ``n_tables`` INDEPENDENT
    hash tables in one matmul (dim × tables·planes). Multi-table OR is
    the standard LSH recall lever: per-table miss probabilities multiply,
    so recall_T = 1 - (1 - r₁)^T while cost only adds up."""

    def __init__(self, dim: int, n_planes: int = 8, n_tables: int = 6,
                 seed: int = 42, vec_col: str = "embedding"):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(dim, n_tables * n_planes).astype(np.float32)
        self.n_planes = n_planes
        self.n_tables = n_tables
        self.weights = (1 << np.arange(n_planes)).astype(np.int64)
        self.vec_col = vec_col

    def buckets_of(self, vecs: np.ndarray) -> np.ndarray:
        signs = (vecs @ self.planes) > 0                  # (n, T*P)
        signs = signs.reshape(len(vecs), self.n_tables, self.n_planes)
        return (signs * self.weights).sum(axis=2)         # (n, T)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = vectors_to_numpy(batch.column(self.vec_col), np.float32)
        b = self.buckets_of(vecs)
        cols = {name: batch.column(name) for name in batch.schema.names}
        for t in range(self.n_tables):
            cols[f"__bucket_{t}"] = pa.array(b[:, t], pa.int64())
        return pa.table(cols)


_STAGE_CACHE: dict = {}


def _cached_multitable(dim: int, n_planes: int, n_tables: int,
                       vec_col: str, seed: int = 42) -> "MultiTableLsh":
    """Per-worker-process MultiTableLsh instance (seed-derived planes are
    rebuilt once per process, not once per task)."""
    key = ("mt", dim, n_planes, n_tables, vec_col, seed)
    st = _STAGE_CACHE.get(key)
    if st is None:
        st = _STAGE_CACHE[key] = MultiTableLsh(dim, n_planes, n_tables,
                                               seed=seed, vec_col=vec_col)
    return st


def _probe_set(qb: int, n_planes: int, multiprobe_hamming: int) -> set[int]:
    probe = {qb}
    if multiprobe_hamming >= 1:
        for i in range(n_planes):
            probe.add(qb ^ (1 << i))
    if multiprobe_hamming >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probe.add(qb ^ (1 << i) ^ (1 << j))
    return probe


def lsh_topk(
    ds,
    query: np.ndarray,
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 8,
    n_tables: int = 8,
    multiprobe_hamming: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """ANN top-k: scan only vectors whose bucket, in ANY of ``n_tables``
    tables, lies within ``multiprobe_hamming`` bit flips of the query's
    bucket in that table. Recall < 1 by design — tune tables/probes with
    the recall test in tests/test_ann.py. On structureless (uniform
    random) embeddings ≥0.9 recall requires scanning a large candidate
    fraction (LSH theory); the pruning win grows with real cluster
    structure."""
    q = np.asarray(query, dtype=np.float32)
    dim = dim or q.shape[0]
    stage = MultiTableLsh(dim, n_planes, n_tables, vec_col=vec_col)
    qbs = stage.buckets_of(q.reshape(1, -1))[0]
    probes = [
        pa.array(sorted(_probe_set(int(qbs[t]), n_planes, multiprobe_hamming)),
                 pa.int64())
        for t in range(n_tables)
    ]

    def filter_buckets(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = None
        for t in range(n_tables):
            m = pc.is_in(batch.column(f"__bucket_{t}"), value_set=probes[t])
            mask = m if mask is None else pc.or_(mask, m)
        keep = [c for c in batch.schema.names if not c.startswith("__bucket_")]
        return batch.filter(mask).select(keep)

    # stateless tasks, not an actor pool: the stage state (hyperplanes)
    # is seed-derived and tiny, so each worker PROCESS rebuilds it once
    # via the module-level cache — parallelism then follows block count
    # with zero actor spin-up latency (same pattern as the linker's
    # task mode)
    def stage(batch: pa.Table) -> pa.Table:
        st = _cached_multitable(dim, n_planes, n_tables, vec_col)
        return filter_buckets(st(batch))

    bucketed = ds.map_batches(stage, batch_format="pyarrow")
    return brute_force_topk(bucketed, q, k, vec_col, id_col)


def knn_self_join(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                  round_dp: int = 4):
    """Nearest neighbor for EVERY vector (cosine, k=1) — the kNN
    self-join that powers embedding near-dup mining and cluster seeding.

    The corpus matrix is assembled once (ordered by ``id_col``) and
    broadcast via ``ray.put``; each batch then does one matmul against
    it — the batch side streams, the broadcast side is the explicit
    scale bound (fits-one-worker, same contract as the query matrix in
    :func:`brute_force_topk`). Beyond that bound, IVF-bucket both sides
    (:func:`ivf_topk`) so each cell self-joins locally.

    Ranking is by cosine ROUNDED to ``round_dp`` then smallest neighbor
    id — the tie-break that makes the result reproducible across
    engines (raw-double argmax order is ulp-fragile between BLAS and a
    SQL engine's sequential loop).
    """
    import ray

    from .vecops import vectors_to_numpy

    parts = []
    for b in ds.select_columns([id_col, vec_col]) \
            .iter_batches(batch_size=4096, batch_format="pyarrow"):
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        parts.append((ids, vectors_to_numpy(b.column(vec_col), np.float64)))
    all_ids = np.concatenate([p[0] for p in parts])
    mat = np.vstack([p[1] for p in parts])
    order = np.argsort(all_ids, kind="stable")
    all_ids, mat = all_ids[order], _normalize(mat[order])
    ref = ray.put((all_ids, mat))

    def nn_batch(batch: pa.Table) -> pa.Table:
        import ray as _ray

        ids_sorted, m = _ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        q = _normalize(vectors_to_numpy(batch.column(vec_col), np.float64))
        sims = np.round(q @ m.T, round_dp)
        # a row must not pick itself
        self_pos = np.searchsorted(ids_sorted, ids)
        sims[np.arange(len(ids)), self_pos] = -np.inf
        best = sims.argmax(axis=1)          # first max → smallest id
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "nn_id": pa.array(ids_sorted[best], pa.int64()),
            "cosine": pa.array(sims[np.arange(len(ids)), best],
                               pa.float64()),
        })

    return ds.select_columns([id_col, vec_col]).map_batches(
        nn_batch, batch_format="pyarrow")


def pair_cosine_hist(ds, n_groups: int = 8, vec_col: str = "embedding",
                     id_col: str = "vec_id", round_dp: int = 4,
                     num_buckets: int = 32):
    """Embedding-space health histogram: pairwise cosine similarities of
    id-blocked vector pairs, bucketed into the 21 bins floor(10·cos) ∈
    [-10, 10] (cos rounded to ``round_dp`` first — the engine-stable
    contract shared with :func:`knn_self_join`). The standard diagnostic
    for anisotropy / embedding collapse (mass near bin 9-10 = degenerate
    space) without materializing any pair list.

    All-pairs is quadratic, so pairs are deterministically BLOCK-SAMPLED:
    only pairs whose ids share ``id % n_groups`` are scored — every
    vector participates, expected coverage 1/n_groups of all pairs, and
    the SQL oracle replays the exact same block rule. Each block's
    pairwise matmul runs inside one hash-bucket task (O((n/n_groups)²)
    per block is the documented scale knob: raise ``n_groups`` as n²
    grows); only bin counts cross the wire afterwards."""
    from .relational import hash_aggregate, preagg_sum
    from .vecops import vectors_to_numpy

    def add_group(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        g = pa.array(ids % n_groups, pa.int64())
        return batch.select([id_col, vec_col]).append_column("g", g)

    def block_hist(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, part in df.groupby("g", sort=False):
            m = _normalize(np.stack(part[vec_col].to_numpy()).astype(
                np.float64))
            if len(m) < 2:
                continue
            c = np.round(m @ m.T, round_dp)
            iu = np.triu_indices(len(m), k=1)
            bins = np.floor(c[iu] * 10).astype("int64")
            outs.append(pd.Series(bins).value_counts().rename_axis(
                "bin").reset_index(name="n"))
        if not outs:
            return pd.DataFrame({"bin": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    partials = hash_aggregate(ds.map_batches(add_group,
                                             batch_format="pyarrow"),
                              ["g"], block_hist, num_buckets=num_buckets)
    return preagg_sum(partials, ["bin"], {"n": "n"})


def quantize_embeddings(ds, vec_col: str = "embedding",
                        id_col: str = "vec_id"):
    """Scalar (int8-style) quantization of an embedding column — the
    storage-compression step of an embedding pipeline: per-dimension
    global [min, max] → code = floor((x - mn) * 255 / (mx - mn)) in
    0..255 (constant dims collapse to code 0).

    Two passes: (1) per-batch per-dim min/max partials → one
    d-row groupby (only 2d scalars shuffle; d floats reach the driver
    and broadcast back in the task closure); (2) streaming vectorized
    quantize. Emits the exact-integer per-vector summary
    (n_dims, q_sum) — the value contract a SQL oracle reproduces; the
    full code matrix write is the same map with the codes kept.
    All arithmetic is f64 with a fixed association, so codes are
    bit-identical to the SQL expression."""
    mn, mx = _dim_bounds(ds, vec_col)

    def quantize(batch: pa.Table) -> pa.Table:
        v = vectors_to_numpy(batch.column(vec_col), np.float64)
        codes = _codes(v, mn, mx)
        return pa.table({
            id_col: batch.column(id_col),
            "n_dims": pa.array(
                np.full(len(v), v.shape[1], dtype="int64")),
            "q_sum": pa.array(codes.sum(axis=1).astype("int64")),
        })

    return ds.map_batches(quantize, batch_format="pyarrow")


def batch_topk(ds, queries: np.ndarray, query_ids, k: int = 10,
               vec_col: str = "embedding", id_col: str = "vec_id",
               round_dp: int = 6, metric: str = "cosine",
               dims: int | None = None):
    """Batched exact cosine top-k: MANY query vectors at once — the
    batch-inference shape (Q queries share one corpus scan instead of Q
    scans). ``queries`` is (Q, d), broadcast once via ``ray.put``; each
    batch computes ONE (n × Q) matmul and emits its per-query partial
    top-k (≤ k·Q rows/batch), merged per query by a bucketed exact
    reduce — the driver only ever sees the final Q·k rows. Cosines are
    4dp/6dp-rounded for engine-stable ordering (ties break by id)."""
    import ray

    from .relational import hash_aggregate

    Q = np.asarray(queries, dtype=np.float64)
    if dims is not None:
        # Matryoshka-style prefix truncation: both sides retrieve in the
        # first `dims` components (Kusupati et al. 2022) — the cheap-
        # retrieval leg of a truncation-loss eval
        Q = Q[:, :dims]
    if metric == "cosine":
        Q = _normalize(Q)
    qids = np.asarray(list(query_ids))
    qref = ray.put(Q)

    def partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        qm = _ray.get(qref)
        vecs = vectors_to_numpy(batch.column(vec_col), np.float64)
        if dims is not None:
            vecs = vecs[:, :dims]
        if metric == "cosine":
            vecs = _normalize(vecs)
        # round BEFORE the partial cut: the partial must select by the
        # same (rounded desc, id asc) order as the final reduce, or a
        # rounded tie straddling the cut would drop the id the global
        # order prefers
        sims = np.round(vecs @ qm.T, round_dp)              # (n, Q)
        n = sims.shape[0]
        kk = min(k, n)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_q, out_ids, out_sim = [], [], []
        for qi in range(len(qids)):                # Q is small
            top = np.lexsort((ids, -sims[:, qi]))[:kk]
            out_q.append(np.repeat(qids[qi], kk))
            out_ids.append(ids[top])
            out_sim.append(sims[top, qi])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_ids)),
            "cosine": pa.array(
                np.concatenate(out_sim).astype("float64"), pa.float64()),
        })

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "cosine", id_col],
                            ascending=[True, False, True],
                            kind="mergesort")
        return df.groupby("query_id", sort=False).head(k) \
            .reset_index(drop=True)

    return hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["query_id"], reduce, num_buckets=max(8, len(qids)))


def ivf_build(ds, index_dir: str, n_centroids: int = 16,
              vec_col: str = "embedding", id_col: str = "vec_id",
              seed: int = 42) -> np.ndarray:
    """Build and PERSIST an IVF index — the build-once / query-many
    layout: the corpus is written hive-partitioned by nearest-centroid
    cell (``cell=<c>/`` directories) and the centroid matrix rides
    alongside as one parquet. A query then reads ONLY its probe cells'
    directories — partition pruning at the filesystem level, the disk
    analog of the in-stream ``__centroid`` filter (at 100 TB the
    non-probed ~ (1 − nprobe/n_centroids) of the corpus never leaves
    storage). IO routes through :mod:`raygraph.stateio`, so
    ``index_dir`` may be a shared-storage URL. Returns the centroid
    matrix."""
    from raygraph import stateio

    cent = ivf_centroids(ds, n_centroids, vec_col=vec_col, seed=seed)
    assigned = ds.map_batches(IvfAssign(cent, vec_col),
                              batch_format="pyarrow")

    def rename_cell(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [("cell" if c == "__centroid" else c)
             for c in batch.schema.names])

    stateio.makedirs(index_dir)
    stateio.ray_write_parquet(
        assigned.map_batches(rename_cell, batch_format="pyarrow"),
        stateio.join(index_dir, "cells"), partition_cols=["cell"])
    n, d = cent.shape
    stateio.pq_write_table(pa.table({
        "cell": pa.array(np.arange(n, dtype=np.int64)),
        "centroid": pa.array([c.tolist() for c in cent],
                             pa.list_(pa.float32())),
    }), stateio.join(index_dir, "centroids.parquet"))
    return cent


def ivf_query(index_dir: str, query: np.ndarray, k: int = 10,
              nprobe: int = 4, vec_col: str = "embedding",
              id_col: str = "vec_id", dtype=np.float32,
              round_dp: int = 6) -> pd.DataFrame:
    """Query a persisted IVF index: rank centroids, read ONLY the
    ``nprobe`` nearest cells' partition directories, brute-force within.
    ``nprobe == n_centroids`` is exactly brute force over the corpus."""
    from raygraph import stateio

    ct = stateio.pq_read_table(
        stateio.join(index_dir, "centroids.parquet"))
    cells = ct.column("cell").to_numpy()
    cent = _normalize(np.array(ct.column("centroid").to_pylist(),
                               dtype=np.float32))
    q = _normalize(np.asarray(query, dtype=np.float32).reshape(1, -1))[0]
    order = np.argsort(-(cent @ q))
    probe = [int(cells[i]) for i in order[:nprobe]]
    dirs = [stateio.join(index_dir, "cells", f"cell={c}")
            for c in probe]
    # expand to the concrete files: Ray's read_parquet accepts one
    # directory but not a list of them
    paths = [f for d in dirs if stateio.isdir(d)
             for f in stateio.data_files(d)]
    scanned = stateio.ray_read_parquet(paths,
                                       columns=[id_col, vec_col])
    return brute_force_topk(scanned, query, k, vec_col, id_col,
                            dtype=dtype, round_dp=round_dp)


def pq_topk(
    ds,
    query: np.ndarray,
    m_sub: int = 8,
    k_codes: int = 16,
    iters: int = 1,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Product-quantization ANN (Jégou et al., PAMI 2011) — the memory-
    compression scale path of the vector family: vectors collapse to
    ``m_sub`` one-byte codes, and query scan cost becomes a per-
    subspace lookup-table sum instead of a d-dim dot product. At 100 TB
    the codebook (m_sub × k_codes × d/m_sub ints) broadcasts once and
    the scan ships k rows per block, never vectors.

    Exact-integer contract (same as :func:`raygraph.ops.cluster.kmeans`
    so the SQL oracle replays it bit-for-bit): ×10^6 trunc quantization,
    per-subspace Lloyd rounds with init ``vec_id % k_codes``, floor-mean
    centroids recomputed from surviving clusters only, argmin ties to
    the smallest cluster id; asymmetric distance = Σ_s ‖q_s − c_s‖² in
    int64. Returns pandas (id_col, pq_dist) of the k smallest
    (pq_dist, id), computed with per-batch partial top-k.
    """
    from .cluster import (SCALE, _assign, _cluster_partials, _quantize)
    from .relational import preagg_sum

    q = np.trunc(np.asarray(query, np.float64) * SCALE).astype("int64")
    d = q.shape[0]
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    dsub = d // m_sub

    def slices(X):
        return [X[:, s * dsub:(s + 1) * dsub] for s in range(m_sub)]

    def train_partial(batch: pa.Table, _cents=None) -> pa.Table:
        ids, X = _quantize(batch, id_col, vec_col)
        frames = []
        for s, Xs in enumerate(slices(X)):
            if _cents is None:
                a, cls = ids % k_codes, np.arange(k_codes, dtype="int64")
            else:
                cls, cent = _cents[s]
                a = _assign(Xs, cls, cent)
            df = _cluster_partials(a, Xs, cls).to_pandas()
            df.insert(0, "sub", np.int64(s))
            frames.append(df)
        return pa.Table.from_pandas(pd.concat(frames, ignore_index=True),
                                    preserve_index=False)

    def to_cents(part_ds):
        agg = preagg_sum(part_ds, ["sub", "cl", "dim"],
                         {"sum_x": "sum_x", "n": "n"}).to_pandas()
        agg["c"] = agg["sum_x"].to_numpy() // agg["n"].to_numpy()
        out = []
        for s in range(m_sub):
            wide = agg[agg["sub"] == s].pivot(
                index="cl", columns="dim", values="c").sort_index()
            out.append((wide.index.to_numpy(dtype="int64"),
                        wide.to_numpy(dtype="int64")))
        return out

    cents = to_cents(ds.map_batches(train_partial,
                                    batch_format="pyarrow"))
    for _ in range(iters):
        cap = cents
        cents = to_cents(ds.map_batches(
            lambda b, _c=cap: train_partial(b, _c),
            batch_format="pyarrow"))

    # asymmetric-distance scan: LUT per subspace from the query, codes
    # assigned on the fly, per-batch partial top-k (k rows per block)
    luts = []
    for s in range(m_sub):
        cls, cent = cents[s]
        qd = q[s * dsub:(s + 1) * dsub]
        diff = qd[None, :] - cent
        luts.append((cls, np.einsum("kd,kd->k", diff, diff)))

    def adc_partial(batch: pa.Table) -> pa.Table:
        ids, X = _quantize(batch, id_col, vec_col)
        dist = np.zeros(len(ids), dtype="int64")
        for s, Xs in enumerate(slices(X)):
            cls, cent = cents[s]
            diff = Xs[:, None, :] - cent[None, :, :]
            code = np.argmin(np.einsum("bkd,bkd->bk", diff, diff), axis=1)
            dist += luts[s][1][code]
        order = np.lexsort((ids, dist))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "pq_dist": pa.array(dist[order], pa.int64())})

    parts = ds.map_batches(adc_partial, batch_format="pyarrow") \
        .to_pandas()
    return parts.sort_values(["pq_dist", id_col], ignore_index=True) \
        .head(k)


# ----------------------------------------------------- retrieval eval
# The eval loop every vector-search deployment runs before swapping a
# cheaper index in: score a CANDIDATE retriever against exact float
# ground truth with recall@k / MRR / nDCG@k. The candidate here is
# scalar-quantized (int8-code) retrieval — quantize_embeddings' exact
# code spec, dequantized through the same fixed association — so a SQL
# oracle replays every list and metric bit for bit. Per-term floors:
# mrr_e6 = floor(1e6 / first_hit_rank), dcg gain at candidate rank i =
# floor(1e6 / log2(i + 1)) summed exactly (the repo's per-term-floor
# idiom), ndcg_e4 = (1e4 * dcg) // idcg with idcg the same floored sum
# over ranks 1..k.


def _dim_bounds(ds, vec_col: str = "embedding"):
    """Global per-dimension [min, max] of an embedding column — two
    d-row preagg exchanges; only 2·d scalars reach the driver."""
    from .relational import preagg_extreme

    def partials(batch: pa.Table) -> pa.Table:
        v = vectors_to_numpy(batch.column(vec_col), np.float64)
        d = v.shape[1] if len(v) else 0
        empty = np.array([], dtype="float64")
        return pa.table({
            "dim": pa.array(np.arange(1, d + 1, dtype="int64")),
            "mn": pa.array(v.min(axis=0) if len(v) else empty),
            "mx": pa.array(v.max(axis=0) if len(v) else empty),
        })

    parts = ds.map_batches(partials, batch_format="pyarrow")
    mins = preagg_extreme(parts.select_columns(["dim", "mn"]), ["dim"],
                          "mn", how="min").to_pandas()
    maxs = preagg_extreme(parts.select_columns(["dim", "mx"]), ["dim"],
                          "mx", how="max").to_pandas()
    bounds = mins.merge(maxs, on="dim").sort_values("dim")
    return bounds["mn"].to_numpy(), bounds["mx"].to_numpy()


def _codes(v: np.ndarray, mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    """quantize_embeddings' exact code expression (shared so retrieval
    and storage quantization can never drift apart)."""
    span = mx - mn
    codes = np.zeros_like(v)
    nz = span != 0
    codes[:, nz] = np.floor(((v[:, nz] - mn[nz]) * 255.0) / span[nz])
    return np.clip(codes, 0, 255).astype(np.int64)


def _reconstruct(v: np.ndarray, mn: np.ndarray,
                 mx: np.ndarray) -> np.ndarray:
    """Dequantize through the int8 codes: x̂ = mn + code·((mx−mn)/255)
    — the FAISS-SQ8 reconstruction, with the literal association the
    SQL oracle repeats."""
    return mn + _codes(v, mn, mx).astype(np.float64) * ((mx - mn) / 255.0)


def quantized_batch_topk(ds, queries: np.ndarray, query_ids, k: int = 10,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id", round_dp: int = 4):
    """Batched top-k by dot product of int8-RECONSTRUCTED vectors — the
    cheap-retriever side of the eval (what a scalar-quantized index
    actually ranks by; ranking raw code dots would smuggle in the
    per-dim offset term). Same shape as :func:`batch_topk`: one (n × Q)
    matmul per batch, per-query partial top-k ordered by
    (rounded-dot DESC, id ASC), bucketed exact reduce."""
    from .relational import hash_aggregate

    mn, mx = _dim_bounds(ds, vec_col)
    qr = _reconstruct(np.asarray(queries, dtype=np.float64), mn, mx)
    qids = np.asarray(list(query_ids))

    def partial(batch: pa.Table) -> pa.Table:
        v = vectors_to_numpy(batch.column(vec_col), np.float64)
        rec = _reconstruct(v, mn, mx)
        dots = np.round(rec @ qr.T, round_dp)                # (n, Q)
        n = dots.shape[0]
        kk = min(k, n)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_q, out_ids, out_dot = [], [], []
        for qi in range(len(qids)):
            top = np.lexsort((ids, -dots[:, qi]))[:kk]
            out_q.append(np.repeat(qids[qi], kk))
            out_ids.append(ids[top])
            out_dot.append(dots[top, qi])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_ids)),
            "qdot": pa.array(np.concatenate(out_dot), pa.float64()),
        })

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "qdot", id_col],
                            ascending=[True, False, True],
                            kind="mergesort")
        return df.groupby("query_id", sort=False).head(k) \
            .reset_index(drop=True)

    return hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["query_id"], reduce, num_buckets=max(8, len(qids)))


def retrieval_eval(truth_df: pd.DataFrame, cand_df: pd.DataFrame,
                   k: int = 10, id_col: str = "vec_id") -> pd.DataFrame:
    """Per-query recall/MRR/nDCG of candidate lists vs exact truth.

    Both inputs are the Q·k-row FINAL lists (driver-sized by
    construction — the corpus never reaches this function). Candidate
    rank = 1-based position in (score DESC, id ASC) order; binary
    relevance (candidate id ∈ truth set). Integer outputs per query:
    n_hits, mrr_e6, dcg_e6, ndcg_e4 (spec in the section comment)."""
    import math

    idcg_e6 = sum(math.floor(1_000_000 / math.log2(i + 1))
                  for i in range(1, k + 1))
    rows = []
    for qid in sorted(truth_df["query_id"].unique()):
        tset = set(truth_df.loc[truth_df["query_id"] == qid, id_col])
        c = cand_df[cand_df["query_id"] == qid].reset_index(drop=True)
        hits = [i + 1 for i in range(len(c)) if c[id_col][i] in tset]
        dcg_e6 = sum(math.floor(1_000_000 / math.log2(r + 1))
                     for r in hits)
        rows.append({
            "query_id": qid,
            "n_hits": len(hits),
            "mrr_e6": math.floor(1_000_000 / hits[0]) if hits else 0,
            "dcg_e6": dcg_e6,
            "ndcg_e4": (10_000 * dcg_e6) // idcg_e6,
        })
    out = pd.DataFrame(rows,
                       columns=["query_id", "n_hits", "mrr_e6",
                                "dcg_e6", "ndcg_e4"])
    for col in out.columns[1:]:
        out[col] = out[col].astype("int64")
    return out


def rrf_fuse(lists, k: int = 10, c: int = 60, id_col: str = "vec_id"):
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    of per-query ranked lists — the standard hybrid-retrieval combiner
    (e.g. dense + quantized/sparse legs). ``lists`` is a sequence of
    ``(df, score_col)`` pairs of FINAL Q·k lists (driver-sized by
    construction; each leg already did its distributed top-k).

    Per leg, rank = 1-based position in (score DESC, id ASC) order;
    contribution = ``floor(1e6 / (c + rank))`` floored PER TERM, then
    exact int64 sums per (query, id) — the repo's per-term-floor idiom,
    so a SQL oracle replays the fused ranking bit for bit. Final list =
    top-k by (rrf_e6 DESC, id ASC).
    """
    import math

    parts = []
    for df, score_col in lists:
        d = df.sort_values(["query_id", score_col, id_col],
                           ascending=[True, False, True],
                           kind="mergesort").copy()
        d["__rank"] = d.groupby("query_id").cumcount() + 1
        d["rrf_e6"] = [math.floor(1_000_000 / (c + int(r)))
                       for r in d["__rank"]]
        parts.append(d[["query_id", id_col, "rrf_e6"]])
    allp = pd.concat(parts, ignore_index=True)
    g = allp.groupby(["query_id", id_col], as_index=False)["rrf_e6"].sum()
    g = g.sort_values(["query_id", "rrf_e6", id_col],
                      ascending=[True, False, True], kind="mergesort")
    out = g.groupby("query_id", sort=False).head(k).reset_index(drop=True)
    out["rrf_e6"] = out["rrf_e6"].astype("int64")
    return out


def hard_negative_topk(ds, k: int = 3, vec_col: str = "embedding",
                       id_col: str = "vec_id", label_col: str = "label",
                       round_dp: int = 4):
    """Hard-negative mining for contrastive training: for every vector,
    the ``k`` most-similar vectors with a DIFFERENT label — the
    in-batch-negatives upgrade every retrieval/embedding trainer wants.

    Same broadcast-corpus shape as :func:`knn_self_join` (matrix +
    labels assembled once, ``ray.put``, one matmul per batch; beyond
    the fits-one-worker bound, IVF-bucket both sides). Ranking is by
    the composite integer key round(cos,4)·2⁴⁰ − id, so top-k and its
    tie-break (smaller neighbor id wins at equal rounded cosine) are
    exact under ``argpartition`` — no ulp-order fragility vs the SQL
    window replay."""
    import ray

    from .vecops import vectors_to_numpy

    parts = []
    for b in ds.select_columns([id_col, vec_col, label_col]) \
            .iter_batches(batch_size=4096, batch_format="pyarrow"):
        parts.append((
            b.column(id_col).to_numpy(zero_copy_only=False),
            b.column(label_col).to_numpy(zero_copy_only=False),
            vectors_to_numpy(b.column(vec_col), np.float64)))
    all_ids = np.concatenate([p[0] for p in parts])
    all_lab = np.concatenate([p[1] for p in parts])
    mat = np.vstack([p[2] for p in parts])
    order = np.argsort(all_ids, kind="stable")
    all_ids, all_lab = all_ids[order], all_lab[order]
    ref = ray.put((all_ids, all_lab, _normalize(mat[order])))
    scale = 10 ** round_dp

    def negatives(batch: pa.Table) -> pa.Table:
        import ray as _ray

        ids_s, lab_s, m = _ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        lab = batch.column(label_col).to_numpy(zero_copy_only=False)
        q = _normalize(vectors_to_numpy(batch.column(vec_col),
                                        np.float64))
        sims = np.round(q @ m.T, round_dp)
        key = (np.rint(sims * scale).astype(np.int64) << 40) - ids_s
        key[lab[:, None] == lab_s[None, :]] = np.iinfo(np.int64).min
        kk = min(k, key.shape[1])
        top = np.argpartition(key, -kk, axis=1)[:, -kk:]
        rows = np.arange(len(ids))[:, None]
        srt = np.argsort(-key[rows, top], axis=1, kind="stable")
        top = top[rows, srt][:, :k]
        return pa.table({
            id_col: pa.array(np.repeat(ids, top.shape[1]), pa.int64()),
            "neg_id": pa.array(ids_s[top].ravel(), pa.int64()),
            "cosine": pa.array(sims[rows, top].ravel(), pa.float64()),
            "neg_rank": pa.array(
                np.tile(np.arange(1, top.shape[1] + 1), len(ids)),
                pa.int64()),
        })

    return ds.select_columns([id_col, vec_col, label_col]).map_batches(
        negatives, batch_format="pyarrow")
