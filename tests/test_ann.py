"""ANN: brute-force cosine top-k + LSH-bucketed variant."""

import numpy as np
import pyarrow as pa
import pytest

from raygraph.ops.ann import brute_force_topk, lsh_topk

pytestmark = pytest.mark.usefixtures("ray_session")


def _embedding_ds(n=100, dim=16, seed=3):
    import ray.data as rd

    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim).astype(np.float32)
    return vecs, rd.from_arrow(
        pa.table(
            {
                "vec_id": list(range(n)),
                "embedding": pa.array([v.tolist() for v in vecs],
                                      pa.list_(pa.float32())),
            }
        )
    )


def test_brute_force_topk_matches_numpy():
    vecs, ds = _embedding_ds()
    q = vecs[0]
    got = brute_force_topk(ds, q, k=5)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ (q / np.linalg.norm(q))
    want = list(np.argsort(-sims)[:5])
    assert list(got["vec_id"]) == want
    assert got["cosine"].iloc[0] == pytest.approx(1.0, abs=1e-5)


def test_brute_force_partial_topk_across_blocks():
    vecs, ds = _embedding_ds(n=200)
    ds = ds.repartition(8)  # force multi-block partial top-k merge
    q = vecs[17]
    got = brute_force_topk(ds, q, k=3)
    assert got["vec_id"].iloc[0] == 17


def test_lsh_topk_finds_self():
    vecs, ds = _embedding_ds(n=150)
    q = vecs[42]
    got = lsh_topk(ds, q, k=5, dim=vecs.shape[1], multiprobe_hamming=1)
    assert 42 in list(got["vec_id"])
    assert got[got["vec_id"] == 42]["cosine"].iloc[0] == pytest.approx(1.0, abs=1e-5)


def test_lsh_recall_floor_on_fixture():
    """Recall@10 of the multi-table LSH path vs brute force on the
    sf0.001 embeddings fixture (uniform random 64-dim — the adversarial
    regime for ANN). Default params (8 planes x 8 tables, multiprobe 2)
    must hold >= 0.9 mean recall while still pruning candidates — the
    exporter-style correctness-across-configurations gate (SURVEY §5)."""
    import os
    import random

    import pyarrow.parquet as pq
    import ray.data as rd

    from raygraph.ops.ann import MultiTableLsh, _probe_set

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf, "embeddings.parquet")):
        pytest.skip("testdata fixture not present")
    tab = pq.read_table(os.path.join(sf, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    ids = tab.column("vec_id").to_pylist()
    vecs = np.array(tab.column("embedding").to_pylist(), dtype=np.float32)
    by_id = dict(zip(ids, vecs))
    random.seed(7)
    qids = random.sample(ids, 5)
    emb = rd.read_parquet(os.path.join(sf, "embeddings.parquet"),
                          columns=["vec_id", "embedding"]).materialize()

    recalls = []
    for qid in qids:
        q = by_id[qid]
        bf = set(brute_force_topk(emb, q, k=10)["vec_id"])
        ls = set(lsh_topk(emb, q, k=10)["vec_id"])
        recalls.append(len(bf & ls) / 10)
    assert np.mean(recalls) >= 0.9, recalls
    assert min(recalls) >= 0.8, recalls

    # and it IS an index, not a rescan: candidate fraction < 95%
    stage = MultiTableLsh(vecs.shape[1])
    buckets = stage.buckets_of(vecs)                    # (n, T)
    qb = stage.buckets_of(by_id[qids[0]].reshape(1, -1))[0]
    probes = [_probe_set(int(qb[t]), stage.n_planes, 2)
              for t in range(stage.n_tables)]
    cand = np.zeros(len(vecs), dtype=bool)
    for t in range(stage.n_tables):
        cand |= np.isin(buckets[:, t], list(probes[t]))
    assert cand.mean() < 0.95


def test_ivf_full_probe_equals_brute_force():
    """nprobe == n_centroids scans every cell: must be EXACTLY brute
    force (the oracle-able IVF contract)."""
    from raygraph.ops.ann import ivf_topk

    vecs, ds = _embedding_ds(n=200, dim=16)
    q = vecs[7]
    bf = brute_force_topk(ds, q, k=10)
    ivf = ivf_topk(ds, q, k=10, n_centroids=8, nprobe=8)
    assert list(ivf["vec_id"]) == list(bf["vec_id"])
    assert np.allclose(ivf["cosine"], bf["cosine"])


def test_ivf_partial_probe_prunes_with_recall():
    """Partial probe scans ~nprobe/n_centroids of the corpus; recall must
    beat the scan fraction (the index concentrates neighbors) and the
    query vector's own cell always contains it."""
    from raygraph.ops.ann import IvfAssign, ivf_centroids, ivf_topk

    vecs, ds = _embedding_ds(n=300, dim=16)
    q = vecs[11]
    cent = ivf_centroids(ds, n_centroids=8)
    bf = set(brute_force_topk(ds, q, k=10)["vec_id"])
    got = ivf_topk(ds, q, k=10, n_centroids=8, nprobe=3, centroids=cent)
    recall = len(bf & set(got["vec_id"])) / 10
    assert 11 in set(got["vec_id"])          # own cell always probed
    assert recall > 3 / 8                     # beats the scan fraction


def test_knn_self_join_known_neighbors(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.ann import knn_self_join

    # two tight clusters: 0/1 mutually nearest, 2/3 mutually nearest
    vecs = np.array([[1.0, 0.0], [0.99, 0.14], [0.0, 1.0], [0.14, 0.99]])
    tbl = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array([list(v) for v in vecs],
                              pa.list_(pa.float32())),
    })
    out = {r["vec_id"]: r["nn_id"]
           for r in knn_self_join(rd.from_arrow(tbl)).take_all()}
    assert out == {0: 1, 1: 0, 2: 3, 3: 2}


def test_batch_topk_matches_per_query_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.ann import batch_topk, brute_force_topk

    rng = np.random.RandomState(7)
    vecs = rng.randn(60, 8).astype(np.float32)
    df = pd.DataFrame({"vec_id": range(60),
                       "embedding": [v.tolist() for v in vecs]})
    ds = rd.from_pandas(df).repartition(4)
    out = batch_topk(ds, vecs[:3].astype(np.float64), [0, 1, 2], k=5,
                     round_dp=4)
    got = {qid: list(g["vec_id"])
           for qid, g in out.to_pandas().groupby("query_id")}
    for qid in (0, 1, 2):
        ref = brute_force_topk(rd.from_pandas(df), vecs[qid], k=5,
                               dtype=np.float64, round_dp=4)
        # same rounded-cosine ordering contract
        assert got[qid][:5] == ref["vec_id"].tolist()[:5] or \
            set(got[qid]) == set(ref["vec_id"])


def test_ivf_persisted_index_prunes_and_matches(ray_session, tmp_path):
    import os

    import numpy as np
    import ray.data as rd

    from raygraph.ops.ann import brute_force_topk, ivf_build, ivf_query

    emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    import pyarrow.parquet as pq

    qtab = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    row0 = qtab.column("vec_id").to_pylist().index(0)
    q = np.array(qtab.column("embedding")[row0].as_py(), dtype=np.float64)

    idx = os.path.join(str(tmp_path), "ivf")
    ivf_build(emb, idx, n_centroids=8)
    # hive layout: one directory per cell, plus the centroid table
    cells = [d for d in os.listdir(os.path.join(idx, "cells"))
             if d.startswith("cell=")]
    assert 1 < len(cells) <= 8
    assert os.path.exists(os.path.join(idx, "centroids.parquet"))

    # full probe over the persisted index == exact brute force
    full = ivf_query(idx, q, k=10, nprobe=8, dtype=np.float64, round_dp=4)
    exact = brute_force_topk(emb, q, k=10, dtype=np.float64, round_dp=4)
    assert full["vec_id"].tolist() == exact["vec_id"].tolist()

    # partial probe returns k rows from a subset of cells (pruned read)
    part = ivf_query(idx, q, k=10, nprobe=2, dtype=np.float64, round_dp=4)
    assert len(part) == 10
    assert part["vec_id"].iloc[0] == exact["vec_id"].iloc[0]  # own cell


def test_pair_cosine_hist_matches_naive(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.ann import pair_cosine_hist

    rng = np.random.RandomState(7)
    n, d, groups = 40, 8, 4
    vecs = rng.randn(n, d)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs]),
    }))
    got = pair_cosine_hist(ds, n_groups=groups).to_pandas()
    got = dict(zip(got["bin"].astype(int), got["n"].astype(int)))

    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    exp: dict[int, int] = {}
    for i in range(n):
        for j in range(i + 1, n):
            if i % groups != j % groups:
                continue
            b = int(np.floor(np.round(norm[i] @ norm[j], 4) * 10))
            exp[b] = exp.get(b, 0) + 1
    assert got == exp
    # block sampling covers exactly the same-group pairs
    assert sum(got.values()) == sum(
        1 for i in range(n) for j in range(i + 1, n)
        if i % groups == j % groups)


def test_pq_topk_query_rank1_and_layout_invariant():
    from raygraph.ops.ann import pq_topk

    vecs, ds = _embedding_ds(n=120, dim=16)
    q = vecs[0].astype(np.float64)
    # the query's own ADC distance is the per-subspace LUT minimum sum,
    # i.e. the global minimum; min vec_id tie order puts it at rank 1
    a = pq_topk(ds, q, m_sub=4, k_codes=8, iters=1, k=5)
    assert a["vec_id"].iloc[0] == 0
    assert a["pq_dist"].iloc[0] == a["pq_dist"].min()
    b = pq_topk(ds.repartition(7), q, m_sub=4, k_codes=8, iters=1, k=5)
    assert a.equals(b)  # block layout does not change training or scan

    with pytest.raises(ValueError, match="not divisible"):
        pq_topk(ds, q, m_sub=5)


def test_pq_topk_recall_on_clustered_fixture():
    import ray.data as rd

    from raygraph.ops.ann import pq_topk

    # 3 tight gaussian clusters: exact int-L2 neighbors of a member are
    # its cluster; PQ codes must keep most of them in the top-10
    rng = np.random.RandomState(11)
    centers = rng.randn(3, 16) * 4
    vecs = np.concatenate(
        [c + 0.05 * rng.randn(60, 16) for c in centers]).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": list(range(len(vecs))),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    }))
    q = vecs[0].astype(np.float64)
    got = pq_topk(ds, q, m_sub=4, k_codes=8, iters=1, k=10)
    # inside a tight cluster PQ codes collapse (distances tie, ids
    # break them) — the job of coarse codes is separating CLUSTERS:
    # every returned id must be a member of the query's cluster (0-59)
    assert (got["vec_id"] < 60).all(), list(got["vec_id"])
    assert got["vec_id"].iloc[0] == 0  # query itself at rank 1
    # and the other clusters sit measurably farther in ADC distance
    far = pq_topk(ds, vecs[60].astype(np.float64), m_sub=4, k_codes=8,
                  iters=1, k=10)
    assert ((far["vec_id"] >= 60) & (far["vec_id"] < 120)).all()


def test_quantized_retrieval_eval_metrics(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.ann import (batch_topk, quantized_batch_topk,
                                  retrieval_eval)

    # 2 well-separated clusters: quantized retrieval must keep recall
    # high, and the metric arithmetic is pinned by a hand case below
    rng = np.random.RandomState(3)
    centers = rng.randn(2, 8) * 6
    vecs = np.concatenate(
        [c + 0.1 * rng.randn(40, 8) for c in centers]).astype(np.float64)
    ds = rd.from_arrow(pa.table({
        "vec_id": list(range(len(vecs))),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float64())),
    })).repartition(5)
    queries, qids = vecs[[0, 40]], [0, 40]
    truth = batch_topk(ds, queries, qids, k=10, round_dp=4,
                       metric="dot").to_pandas()
    cand = quantized_batch_topk(ds, queries, qids, k=10).to_pandas()
    ev = retrieval_eval(truth, cand, k=10).set_index("query_id")
    assert (ev["n_hits"] >= 8).all()          # int8 keeps clusters apart
    assert (ev["mrr_e6"] == 1_000_000).all()  # query itself at rank 1
    # hand-pinned metric arithmetic: candidate hits at ranks 1 and 3
    t = pd.DataFrame({"query_id": [9] * 2, "vec_id": [1, 2]})
    c = pd.DataFrame({"query_id": [9] * 3, "vec_id": [1, 7, 2]})
    one = retrieval_eval(t, c, k=3).iloc[0]
    assert one["n_hits"] == 2 and one["mrr_e6"] == 1_000_000
    assert one["dcg_e6"] == 1_000_000 + 500_000
    idcg = 1_000_000 + 630_929 + 500_000
    assert one["ndcg_e4"] == (10_000 * 1_500_000) // idcg
    # determinism across layouts
    again = quantized_batch_topk(ds.repartition(2), queries, qids,
                                 k=10).to_pandas()
    assert cand.sort_values(["query_id", "qdot", "vec_id"]) \
        .reset_index(drop=True).equals(
            again.sort_values(["query_id", "qdot", "vec_id"])
            .reset_index(drop=True))


def test_hard_negative_topk_skips_same_label(ray_session):
    """The mined negatives all carry a different label; the near-copy
    with a different label ranks first; ranks are 1..k."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.ann import hard_negative_topk

    rng = np.random.RandomState(5)
    base = rng.randn(8).astype(np.float32)
    vecs = [base, base + np.float32(0.001),
            rng.randn(8).astype(np.float32),
            rng.randn(8).astype(np.float32)]
    labels = [0, 1, 0, 1]
    t = pa.table({"vec_id": [0, 1, 2, 3],
                  "label": pa.array(labels, pa.int32()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32()))})
    out = hard_negative_topk(rd.from_arrow(t), k=2).take_all()
    lab = dict(zip([0, 1, 2, 3], labels))
    assert all(lab[r["vec_id"]] != lab[r["neg_id"]] for r in out)
    first = {r["vec_id"]: r["neg_id"] for r in out
             if r["neg_rank"] == 1}
    assert first[0] == 1 and first[1] == 0
    assert sorted(r["neg_rank"] for r in out
                  if r["vec_id"] == 0) == [1, 2]


def test_batch_topk_dims_truncation(ray_session):
    # prefix truncation: with dims=2 the ranking must follow only the
    # first two components; full-dim ranking differs by construction
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.ann import batch_topk

    # corpus: v1 wins on the 2-dim prefix, v2 wins on the full vector
    corpus = pd.DataFrame({
        "vec_id": [1, 2, 3],
        "embedding": [[1.0, 1.0, 0.0, 0.0],
                      [0.5, 0.5, 5.0, 5.0],
                      [-1.0, -1.0, 0.0, 0.0]],
    })
    q = np.array([[1.0, 1.0, 1.0, 1.0]])
    ds = rd.from_pandas(corpus)
    full = batch_topk(ds, q, [0], k=1, round_dp=4,
                      metric="dot").to_pandas()
    trunc = batch_topk(ds, q, [0], k=1, round_dp=4, metric="dot",
                       dims=2).to_pandas()
    assert full["vec_id"].tolist() == [2]   # 0.5+0.5+5+5 = 11
    assert trunc["vec_id"].tolist() == [1]  # prefix dot 2 > 1 > -2


def test_batch_topk_dims_matches_presliced(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.ann import batch_topk

    rng = np.random.RandomState(9)
    vecs = rng.randn(50, 8).round(3)
    corpus = pd.DataFrame({"vec_id": range(50),
                           "embedding": [v.tolist() for v in vecs]})
    pre = pd.DataFrame({"vec_id": range(50),
                        "embedding": [v[:3].tolist() for v in vecs]})
    q = rng.randn(2, 8).round(3)
    a = batch_topk(rd.from_pandas(corpus), q, [0, 1], k=5, round_dp=4,
                   metric="dot", dims=3).to_pandas()
    b = batch_topk(rd.from_pandas(pre), q[:, :3], [0, 1], k=5,
                   round_dp=4, metric="dot").to_pandas()
    sort = lambda d: d.sort_values(["query_id", "vec_id"],
                                   ignore_index=True)
    pd.testing.assert_frame_equal(sort(a), sort(b))
