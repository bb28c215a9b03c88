"""kmeans (raygraph.ops.cluster) — Lloyd iterations in exact ints."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _emb_ds(rd, vecs, ids=None, parts=1):
    ids = list(range(len(vecs))) if ids is None else ids
    tab = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    return rd.from_arrow(tab).repartition(parts)


def test_kmeans_separated_clusters(ray_session):
    import ray.data as rd

    from raygraph.ops.cluster import kmeans

    # two tight blobs far apart: whatever the init, 2-means with 2
    # rounds must put each blob in one cluster
    rng = np.random.default_rng(7)
    a = rng.normal(0.2, 0.001, size=(20, 8))
    b = rng.normal(-0.2, 0.001, size=(20, 8))
    out = kmeans(_emb_ds(rd, np.vstack([a, b]), parts=3), k=2, iters=2)
    df = pd.DataFrame(out.take_all()).sort_values("vec_id")
    first, second = df["cluster"].iloc[:20], df["cluster"].iloc[20:]
    assert first.nunique() == 1 and second.nunique() == 1
    assert first.iloc[0] != second.iloc[0]


def test_kmeans_layout_invariant(ray_session):
    import ray.data as rd

    from raygraph.ops.cluster import kmeans

    rng = np.random.default_rng(11)
    vecs = rng.uniform(-0.3, 0.3, size=(60, 16))
    runs = []
    for parts in (1, 7):
        out = kmeans(_emb_ds(rd, vecs, parts=parts), k=4, iters=2)
        runs.append(sorted((r["vec_id"], r["cluster"])
                           for r in out.take_all()))
    assert runs[0] == runs[1]


def test_kmeans_empty_cluster_dropped(ray_session):
    import ray.data as rd

    from raygraph.ops.cluster import kmeans

    # 4 identical vectors, k=3: after round 1 every vector sits in one
    # cluster; the other init clusters empty out and are dropped — the
    # run must still complete with a single surviving cluster
    vecs = np.full((4, 4), 0.1)
    out = kmeans(_emb_ds(rd, vecs, parts=2), k=3, iters=2)
    df = pd.DataFrame(out.take_all())
    assert len(df) == 4
    assert df["cluster"].nunique() == 1


def test_pca_power_finds_dominant_axis(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.cluster import pca_power

    rng = np.random.default_rng(17)
    d, n = 8, 400
    # dominant variance along a known unit direction u
    u = np.zeros(d)
    u[2], u[5] = 0.8, 0.6
    X = (rng.normal(0, 1, (n, 1)) * u * 0.4
         + rng.normal(0, 0.02, (n, d))).astype(np.float32)
    ds = rd.from_pandas(pd.DataFrame({
        "embedding": [row for row in X]})).repartition(5)
    out = pca_power(ds, iters=3).sort_values("dim")
    v = out["v"].to_numpy(dtype=np.float64)
    v = v / np.linalg.norm(v)
    assert abs(abs(v @ u) - 1.0) < 0.02        # aligned up to sign

    # layout determinism: different partitioning, identical integers
    out2 = pca_power(rd.from_pandas(pd.DataFrame({
        "embedding": [row for row in X]})).repartition(11),
        iters=3).sort_values("dim")
    assert out["v"].tolist() == out2["v"].tolist()


def test_jl_project_distance_preservation(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.cluster import jl_project

    rng = np.random.RandomState(5)
    vecs = rng.randn(40, 32).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": list(range(40)),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    }))
    got = jl_project(ds, k_out=16).to_pandas()
    assert len(got) == 40 * 16
    P = got.pivot(index="vec_id", columns="j", values="proj") \
        .sort_index().to_numpy().astype(np.float64)
    X = np.trunc(vecs.astype(np.float64) * 1e6)
    # E[||Px - Py||^2 / k] = ||x - y||^2: check the mean distortion of
    # pairwise sq-distances lands near 1 (JL with ±1 signs)
    di = np.random.RandomState(7).randint(0, 40, (60, 2))
    ratios = []
    for a, b in di:
        if a == b:
            continue
        orig = ((X[a] - X[b]) ** 2).sum()
        proj = ((P[a] - P[b]) ** 2).sum() / 16
        ratios.append(proj / orig)
    r = np.array(ratios)
    assert 0.8 < r.mean() < 1.2, r.mean()
    # layout invariance
    again = jl_project(ds.repartition(9), k_out=16).to_pandas()
    key = ["vec_id", "j"]
    assert got.sort_values(key, ignore_index=True).equals(
        again.sort_values(key, ignore_index=True))


def test_nearest_centroid_confusion_separable(ray_session):
    """Two separable clouds => diagonal confusion matrix, at any
    layout."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.classify import nearest_centroid_confusion

    rng = np.random.RandomState(9)
    a = rng.randn(20, 8) * 0.05 + np.eye(8)[0] * 3
    b = rng.randn(20, 8) * 0.05 + np.eye(8)[1] * 3
    vecs = np.vstack([a, b]).astype(np.float32)
    t = pa.table({"vec_id": list(range(40)),
                  "label": pa.array([0] * 20 + [1] * 20, pa.int32()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32()))})
    got = {(r["label"], r["pred"]): r["n"]
           for r in nearest_centroid_confusion(
               rd.from_arrow(t).repartition(4)).take_all()}
    assert got == {(0, 0): 20, (1, 1): 20}
