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
