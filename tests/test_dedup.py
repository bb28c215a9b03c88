"""Dedup family: exact, MinHash-LSH, SimHash, embedding near-dup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raygraph.ops.dedup import (
    MinHasher,
    char_shingles,
    exact_dedup,
    embedding_near_dup_pairs,
    hamming64,
    jaccard,
    minhash_candidates,
    minhash_dedup,
    simhash64,
    simhash_buckets,
    word_ngrams,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs_ds(texts):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )


BASE = ("the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill in the afternoon sun")


def test_exact_dedup_keeps_min_id():
    ds = _docs_ds(["aaa", "bbb", "aaa", "ccc", "bbb"])
    out = out_rows = exact_dedup(ds).take_all()
    got = {(r["doc_id"], r["text"]) for r in out_rows}
    assert got == {(0, "aaa"), (1, "bbb"), (3, "ccc")}


def test_minhash_signature_similarity():
    h = MinHasher(num_perm=128)
    s1 = h.signature(BASE)
    s2 = h.signature(BASE.replace("lazy", "sleepy"))
    s3 = h.signature("completely different content about spaceships and stars")
    sim12 = (s1 == s2).mean()
    sim13 = (s1 == s3).mean()
    assert sim12 > 0.5 > sim13


def test_minhash_candidates_find_near_dups():
    texts = [BASE, BASE.replace("lazy", "sleepy"),
             "unrelated text about databases and indexes and query planners",
             BASE + " extra tail words appended here"]
    pairs = minhash_candidates(_docs_ds(texts)).take_all()
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    assert (0, 1) in found
    assert not any(2 in p for p in found)


def test_minhash_dedup_end_to_end():
    texts = [BASE, BASE.replace("lazy", "sleepy"), "something else entirely " * 4]
    out = minhash_dedup(_docs_ds(texts), threshold=0.5).take_all()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [0, 2]  # near-dup 1 collapsed into 0


def test_jaccard_and_ngrams():
    a = word_ngrams("a b c d", 2)
    b = word_ngrams("a b c e", 2)
    assert jaccard(a, a) == 1.0
    assert 0 < jaccard(a, b) < 1
    assert jaccard(set(), set()) == 1.0


def test_simhash_hamming_close_for_near_dups():
    h1 = simhash64(BASE.split())
    h2 = simhash64(BASE.replace("lazy", "sleepy").split())
    h3 = simhash64("totally different words in this one about oceans".split())
    assert hamming64(h1, h2) < hamming64(h1, h3)


def test_simhash_buckets_pipeline():
    out = simhash_buckets(_docs_ds([BASE, BASE, "other " * 10])).take_all()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["simhash"] == by_id[1]["simhash"]
    assert by_id[0]["bucket"] == by_id[1]["bucket"]


def test_char_shingles_stable():
    assert np.array_equal(char_shingles("hello world"), char_shingles("hello world"))


def test_embedding_near_dup_pairs():
    import ray.data as rd

    rng = np.random.RandomState(7)
    base = rng.randn(8).astype(np.float32)
    vecs = [base, base + 0.001, rng.randn(8).astype(np.float32)]
    ds = rd.from_arrow(
        pa.table({"vec_id": [0, 1, 2],
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32()))})
    )
    pairs = embedding_near_dup_pairs(ds, threshold=0.99).take_all()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(0, 1)}


def test_embedding_bucket_pair_cap(ray_session):
    """A degenerate LSH bucket (here: many zero vectors, which all share
    sign pattern 0) must not emit O(n^2) pairs — the BUCKET_PAIR_CAP
    coverage bound applies, exactly as in minhash _bucket_pairs."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops import dedup as D

    n = D.BUCKET_PAIR_CAP + 100
    vecs = [[1.0] * 8 for _ in range(n)]  # identical → one bucket, cos=1
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    }))
    pairs = D.embedding_near_dup_pairs(ds, threshold=0.5, n_planes=4)
    got = pairs.count()
    cap = D.BUCKET_PAIR_CAP
    # all zero vectors collide in one bucket; only the first cap ids pair
    assert got == cap * (cap - 1) // 2
    # and the paired ids are deterministically the lowest ones
    max_id = max(r["id_b"] for r in pairs.take_all())
    assert max_id == cap - 1


def test_vectors_to_numpy_matches_pylist(ray_session):
    import numpy as np
    import pyarrow as pa

    from raygraph.ops.vecops import vectors_to_numpy

    data = [[1.0, 2.0], [3.0, 4.5], [0.0, -1.0]]
    for typ in (pa.list_(pa.float32()), pa.list_(pa.float64()),
                pa.list_(pa.float32(), 2)):
        col = pa.array(data, typ)
        got = vectors_to_numpy(col, np.float64)
        assert got.shape == (3, 2)
        assert np.allclose(got, np.array(data))
        # sliced (offset) arrays must stay correct
        got2 = vectors_to_numpy(col.slice(1, 2), np.float64)
        assert np.allclose(got2, np.array(data[1:]))


def test_batched_signatures_match_scalar():
    from raygraph.ops.dedup import MinHasher

    texts = [BASE, BASE.replace("lazy", "sleepy"),
             "something else entirely " * 4, "", "one"]
    for shingle in ("char", "word"):
        h = MinHasher(num_perm=32, shingle=shingle)
        batched = h.signatures(texts)
        for i, t in enumerate(texts):
            assert (batched[i] == h.signature(t or "")).all(), (shingle, i)


def test_near_dup_clusters_transitive(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.dedup import near_dup_clusters

    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "pack my box with five dozen liquor jugs every single day"
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 10, 11, 20],
        "text": [a, a, a, b, b, "something else entirely different here"],
    })
    out = near_dup_clusters(rd.from_pandas(df).repartition(3),
                            threshold=0.95, cc_iters=2)
    got = {r["doc_id"]: r["cluster_id"] for r in out.take_all()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_near_dup_clusters_no_pairs(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.dedup import near_dup_clusters

    df = pd.DataFrame({
        "doc_id": [5, 6],
        "text": ["alpha beta gamma delta epsilon words here",
                 "totally disjoint vocabulary nothing shared at all"],
    })
    out = near_dup_clusters(rd.from_pandas(df), threshold=0.95)
    got = {r["doc_id"]: r["cluster_id"] for r in out.take_all()}
    assert got == {5: 5, 6: 6}


def test_lev_banded_exact_and_cutoff():
    import numpy as np

    from raygraph.ops.dedup import _lev_banded

    def enc(s):
        return np.frombuffer(s.encode(), dtype=np.uint8)

    assert _lev_banded(enc("kitten"), enc("sitting"), 3) == 3
    assert _lev_banded(enc("abc"), enc("abc"), 2) == 0
    assert _lev_banded(enc("abc"), enc("abd"), 2) == 1
    assert _lev_banded(enc(""), enc("ab"), 2) == 2
    # beyond the band: k+1 sentinel, never an undercount
    assert _lev_banded(enc("kitten"), enc("sitting"), 2) == 3
    assert _lev_banded(enc("aaaa"), enc("aaaaaaaa"), 2) == 3  # len shortcut


def test_edit_distance_pairs_blocking(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.dedup import edit_distance_pairs

    base = "the common sixteen!! tail that follows here"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            base,
            base[:-1] + "~",            # 1 edit, same prefix block
            base[:-2] + "XY",           # 2 edits, same prefix block
            "different prefix " + base,  # other block: never a candidate
            base + " plus a wholly different long tail suffix",  # far
        ],
    })
    out = edit_distance_pairs(rd.from_pandas(docs).repartition(3),
                              max_dist=2, prefix=16,
                              window=64).to_pandas()
    got = {(r.id_a, r.id_b): r.dist for r in out.itertuples(index=False)}
    assert got == {(1, 2): 1, (1, 3): 2, (2, 3): 2}


def test_popcount64_matches_scalar():
    import numpy as np

    from raygraph.ops.dedup import _popcount64, hamming64

    vals = np.array([0, 1, (1 << 60) - 1, 0x5555555555555555,
                     123456789], dtype=np.uint64)
    got = _popcount64(vals)
    for v, g in zip(vals, got):
        assert g == bin(int(v)).count("1")
    assert hamming64(0b1010, 0b0110) == 2


def test_simhash_hamming_pairs_banded(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.dedup import simhash_batch, simhash_hamming_pairs
    import pyarrow as pa

    # doc 2 = exact copy of doc 1 (hamming 0, must pair); doc 3 shares
    # most tokens (pairs iff its true hamming <= 3 — assert against the
    # directly-computed signatures, not a guess); doc 4 is disjoint
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "alpha beta gamma delta epsilon zeta eta theta",
            "alpha beta gamma delta epsilon zeta eta theta",
            "alpha beta gamma delta epsilon zeta eta iota",
            "one two three four five six seven eight",
        ],
    })
    sig = simhash_batch(pa.Table.from_pandas(docs))
    s = dict(zip(sig.column("doc_id").to_pylist(),
                 sig.column("simhash").to_pylist()))
    from raygraph.ops.dedup import hamming64

    expect = {}
    for a in (1, 2, 3, 4):
        for b in (1, 2, 3, 4):
            if a < b and hamming64(s[a], s[b]) <= 3:
                expect[(a, b)] = hamming64(s[a], s[b])
    assert (1, 2) in expect and expect[(1, 2)] == 0

    out = simhash_hamming_pairs(rd.from_pandas(docs).repartition(2),
                                max_hamming=3, bands=4,
                                num_buckets=8).to_pandas()
    got = {(r.id_a, r.id_b): r.hamming
           for r in out.itertuples(index=False)}
    # banding with max_hamming < bands is EXACT (pigeonhole): the join
    # must find precisely the true <=3 pairs
    assert got == expect


def test_jaccard_threshold_pairs_exact(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.dedup import jaccard_threshold_pairs

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "a b c d e",        # |T|=5
            "a b c d e f",      # jacc(1,2) = 5/6 -> 8333 >= 8000
            "a b c x y",        # jacc(1,3) = 3/7 -> out
            "p q r s t",        # disjoint from all
        ],
    })
    out = jaccard_threshold_pairs(rd.from_pandas(docs).repartition(2),
                                  threshold_bp=8000,
                                  num_buckets=8).to_pandas()
    got = {(r.id_a, r.id_b): r.jaccard_bp
           for r in out.itertuples(index=False)}
    assert got == {(1, 2): 8333}

    # lower threshold brings in the 3/7 pair iff the prefix filter
    # kept it a candidate (it must: exactness of the prefix bound)
    out2 = jaccard_threshold_pairs(rd.from_pandas(docs).repartition(2),
                                   threshold_bp=3700,
                                   num_buckets=8).to_pandas()
    got2 = {(r.id_a, r.id_b): r.jaccard_bp
            for r in out2.itertuples(index=False)}
    assert got2 == {(1, 2): 8333, (1, 3): 4285,   # 3/7
                    (2, 3): 3750}                  # 3/8


def test_sorted_neighborhood_pairs_matches_window(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.dedup import sorted_neighborhood_pairs

    ds = rd.from_arrow(pa.table({
        "doc_id": [5, 1, 3, 2, 4],
        "k": ["bb", "aa", "ab", "aa", "zz"],
    }))
    got = sorted_neighborhood_pairs(ds, "k", window=2, n_tiles=2) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    # sort order by (k, id): (aa,1) (aa,2) (ab,3) (bb,5) (zz,4)
    order = [1, 2, 3, 5, 4]
    exp = sorted((order[i], order[i + j], j)
                 for i in range(5) for j in (1, 2) if i + j < 5)
    assert [tuple(r) for r in got.itertuples(index=False)] == exp


def test_sorted_neighborhood_deterministic_across_layout(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.dedup import sorted_neighborhood_pairs

    t = pa.table({"doc_id": list(range(40)),
                  "k": [f"k{i % 7}" for i in range(40)]})
    a = sorted_neighborhood_pairs(rd.from_arrow(t), "k", window=3) \
        .to_pandas().sort_values(["id_a", "id_b", "gap"]) \
        .reset_index(drop=True)
    b = sorted_neighborhood_pairs(rd.from_arrow(t).repartition(9), "k",
                                  window=3) \
        .to_pandas().sort_values(["id_a", "id_b", "gap"]) \
        .reset_index(drop=True)
    assert a.equals(b)
    # every non-final row pairs forward: 39+38+37 pairs
    assert len(a) == 39 + 38 + 37


def test_duplicate_ngram_stats_partial_coverage(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.dedup import duplicate_ngram_stats

    shared = "one two three four"  # the shared 4-gram
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            shared + " unique alpha beta",   # 7 toks, toks 0-3 covered
            "prefix " + shared,              # 5 toks, toks 1-4 covered
            "totally different words here",  # no coverage
            "",                              # empty
        ],
    }))
    got = duplicate_ngram_stats(ds, L=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(got["n_tokens"]) == [7, 5, 4, 0]
    assert list(got["n_dup_tokens"]) == [4, 4, 0, 0]
    assert list(got["dup_bp"]) == [10000 * 4 // 7, 8000, 0, 0]


def test_duplicate_ngram_stats_no_duplicates(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.dedup import duplicate_ngram_stats

    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": ["aa bb cc dd ee", "ff gg hh ii jj"],
    }))
    got = duplicate_ngram_stats(ds, L=3).to_pandas()
    assert (got["n_dup_tokens"] == 0).all()
    assert (got["dup_bp"] == 0).all()


def test_duplicate_ngram_stats_layout_invariant(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.dedup import duplicate_ngram_stats

    texts = [f"tok{i} " * 3 + "common phrase shared across docs tail"
             for i in range(30)]
    t = pa.table({"doc_id": list(range(30)), "text": texts})
    a = duplicate_ngram_stats(rd.from_arrow(t), L=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = duplicate_ngram_stats(rd.from_arrow(t).repartition(7), L=5) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_minhash_dedup_strategies_equivalent(ray_session):
    # the broadcast (driver union-find) and distributed (min-label
    # components + anti-join) drop paths must keep the SAME survivors —
    # transitive chain 1~2~3 plus a separate pair and two singletons
    import pandas as pd
    import ray.data as rd

    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "pack my box with five dozen liquor jugs every single day"
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 10, 11, 20, 21],
        "text": [a, a, a + " tail", b, b,
                 "something else entirely different here",
                 "and one more unrelated survivor document too"],
    })

    def run(strategy):
        out = minhash_dedup(rd.from_pandas(df).repartition(3),
                            threshold=0.5, drop_strategy=strategy)
        return sorted((r["doc_id"], r["text"]) for r in out.take_all())

    got_b = run("broadcast")
    got_d = run("distributed")
    assert got_b == got_d
    assert [i for i, _ in got_b] == [1, 10, 20, 21]

    # auto must match on BOTH sides of the switchover: a huge bound
    # routes broadcast, a zero bound routes distributed — same survivors
    def run_auto(bound):
        out = minhash_dedup(rd.from_pandas(df).repartition(3),
                            threshold=0.5, drop_strategy="auto",
                            auto_max_pairs=bound)
        return sorted((r["doc_id"], r["text"]) for r in out.take_all())

    assert run_auto(10**9) == got_b
    assert run_auto(0) == got_b


def test_auto_broadcast_bound_memory_derived(monkeypatch):
    # the auto switchover bound tracks available driver memory; the
    # fixed constant is only the no-psutil fallback
    import psutil

    from raygraph.ops import dedup as dd

    class _VM:
        available = 64 * 2**30    # 64 GiB free

    monkeypatch.setattr(psutil, "virtual_memory", lambda: _VM)
    got = dd.auto_broadcast_max_pairs()
    assert got == int(64 * 2**30 * dd.AUTO_HEAP_FRACTION) \
        // dd.AUTO_PAIR_BYTES
    assert got > dd.AUTO_BROADCAST_MAX_PAIRS  # 64 GiB beats the fixed 2M

    _VM.available = 16 * 2**20    # 16 MiB free: floor binds
    assert dd.auto_broadcast_max_pairs() == 100_000

    def boom():
        raise OSError("no /proc")

    monkeypatch.setattr(psutil, "virtual_memory", boom)
    assert dd.auto_broadcast_max_pairs() == dd.AUTO_BROADCAST_MAX_PAIRS


def test_minhash_dedup_bad_strategy_rejected(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.errors import InvalidParameterError

    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(InvalidParameterError):
        minhash_dedup(ds, drop_strategy="driver")


def test_minhash_dedup_distributed_no_dups(ray_session):
    # no verified pairs: the distributed path must pass the corpus
    # through untouched (all-empty-join schema repair covered)
    import pandas as pd
    import ray.data as rd

    df = pd.DataFrame({
        "doc_id": [5, 6],
        "text": ["alpha beta gamma delta epsilon words here",
                 "totally disjoint vocabulary nothing shared at all"],
    })
    out = minhash_dedup(rd.from_pandas(df), threshold=0.95,
                        drop_strategy="distributed")
    assert sorted(r["doc_id"] for r in out.take_all()) == [5, 6]


def test_winnow_dup_pairs_finds_planted_neardups(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.dedup import winnow_dup_pairs

    rng = np.random.default_rng(9)
    words = ["red", "blue", "green", "gold", "iron", "clay", "moss",
             "pine", "salt", "wave"]
    base = [" ".join(rng.choice(words, 24)) for _ in range(12)]
    # doc 100+i = doc i with a small suffix edit -> long shared prefix
    near = [t + " tail extra" for t in base[:4]]
    df = pd.DataFrame({
        "doc_id": list(range(12)) + [100, 101, 102, 103],
        "text": base + near,
    })
    out = winnow_dup_pairs(rd.from_pandas(df).repartition(5),
                           min_shared=3).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    # the winnowing guarantee: each planted pair shares the base doc's
    # fingerprints (24 shared tokens >> window+n-1) -> must be found
    for i in range(4):
        assert (i, 100 + i) in got, got
    assert (out["shared"] >= 3).all()
    # layout determinism
    again = winnow_dup_pairs(rd.from_pandas(df).repartition(1),
                             min_shared=3).to_pandas()
    key = ["id_a", "id_b"]
    assert out.sort_values(key).reset_index(drop=True).equals(
        again.sort_values(key).reset_index(drop=True))


def test_clean_duplicate_ngrams_removes_planted_run(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.dedup import clean_duplicate_ngrams

    shared = "one two three four five six seven eight"       # one 8-gram
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["alpha beta " + shared + " gamma",
                 "delta " + shared + " epsilon zeta",
                 "totally unrelated words here live now"],
    })
    out = clean_duplicate_ngrams(rd.from_pandas(df).repartition(3), L=8) \
        .to_pandas().set_index("doc_id")
    assert out.loc[0, "clean_text"] == "alpha beta gamma"
    assert out.loc[1, "clean_text"] == "delta epsilon zeta"
    assert out.loc[2, "clean_text"] == \
        "totally unrelated words here live now"
    assert out.loc[0, "n_kept"] == 3 and out.loc[2, "n_kept"] == 6
    # no duplicates at all -> identity (lowercased)
    solo = clean_duplicate_ngrams(
        rd.from_pandas(df.iloc[[2]]), L=8).to_pandas()
    assert solo["clean_text"][0] == df["text"][2]


def test_semdedup_survivors_drops_planted_dup(ray_session):
    """Two near-identical vectors land in the same sign bucket; the
    higher id is dropped (keep-lowest-id exemplar), everything else
    survives. Layout must not matter."""
    import ray.data as rd

    from raygraph.ops.dedup import semdedup_survivors

    rng = np.random.RandomState(11)
    base = rng.randn(8).astype(np.float32)
    far = -base  # same magnitude, opposite sign bucket half-space
    vecs = [base, base + np.float32(0.0001), far,
            rng.randn(8).astype(np.float32)]
    t = pa.table({"vec_id": [0, 1, 2, 3],
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32()))})
    got = sorted(r["vec_id"] for r in semdedup_survivors(
        rd.from_arrow(t), tau_e4=9900, n_sign_dims=4).take_all())
    assert got == [0, 2, 3]
    rep = sorted(r["vec_id"] for r in semdedup_survivors(
        rd.from_arrow(t).repartition(3), tau_e4=9900,
        n_sign_dims=4).take_all())
    assert rep == got


def test_prototype_prune_flags_centroid_hugger(ray_session):
    """The vector pointing along its bucket's sum direction is the
    first pruned; k bounds the prune list per bucket."""
    import ray.data as rd

    from raygraph.ops.dedup import prototype_prune_topk

    d = 8
    # all-positive first dims => one bucket; v0 is the mean direction
    cloud = np.abs(np.random.RandomState(3).randn(6, d)) + 0.5
    cloud[0] = cloud[1:].mean(axis=0)  # prototypical point
    t = pa.table({"vec_id": list(range(6)),
                  "embedding": pa.array(
                      [v.astype(np.float32).tolist() for v in cloud],
                      pa.list_(pa.float32()))})
    out = sorted(prototype_prune_topk(rd.from_arrow(t), k=2,
                                      n_sign_dims=4).take_all(),
                 key=lambda r: -r["proto"])
    assert len(out) == 2
    assert any(r["vec_id"] == 0 for r in out)
    assert out[0]["proto"] > 0.99


def test_containment_pairs_quote_detection(ray_session):
    # a snippet quoted inside a long doc: low Jaccard, containment 1.0
    # on the snippet side; exact dup pair scores 1.0 both ways
    import ray.data as rd

    from raygraph.ops.dedup import containment_pairs

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["the quick brown fox jumps over the lazy dog tonight",
                 "quick brown fox jumps",
                 "completely different words here now",
                 "the quick brown fox jumps over the lazy dog tonight"],
    })
    out = containment_pairs(rd.from_pandas(df).repartition(3),
                            threshold_e6=800_000, n=3) \
        .to_pandas().sort_values(["id_a", "id_b"], ignore_index=True)
    assert set(map(tuple, out[["id_a", "id_b"]].values)) \
        == {(1, 2), (1, 4), (2, 4)}
    r12 = out[(out.id_a == 1) & (out.id_b == 2)].iloc[0]
    # snippet has 2 trigrams, both inside doc 1's 8
    assert r12.inter == 2 and r12.n_a == 8 and r12.n_b == 2
    assert r12.cont_b_e6 == 1_000_000 and r12.cont_a_e6 == 250_000
    r14 = out[(out.id_a == 1) & (out.id_b == 4)].iloc[0]
    assert r14.cont_a_e6 == r14.cont_b_e6 == 1_000_000


def test_containment_pairs_threshold_excludes_weak_overlap(ray_session):
    import ray.data as rd

    from raygraph.ops.dedup import containment_pairs

    # docs share 1 trigram out of 4 each: max containment 0.25 < 0.8
    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a b c d e f", "x y a b c z"],
    })
    out = containment_pairs(rd.from_pandas(df),
                            threshold_e6=800_000, n=3).to_pandas()
    assert len(out) == 0
    # lowering the threshold admits it, with exact counts
    out2 = containment_pairs(rd.from_pandas(df),
                             threshold_e6=250_000, n=3).to_pandas()
    assert len(out2) == 1 and out2.iloc[0].inter == 1


def test_containment_pairs_layout_invariant(ray_session):
    import ray.data as rd

    from raygraph.ops.dedup import containment_pairs

    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(40)]
    texts += [" ".join(texts[i].split()[:5]) for i in range(5)]  # snippets
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    outs = []
    for nparts in (1, 7):
        out = containment_pairs(rd.from_pandas(df).repartition(nparts),
                                threshold_e6=800_000, n=3).to_pandas() \
            .sort_values(["id_a", "id_b"], ignore_index=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # every planted snippet pair present with snippet containment 1.0
    for i in range(5):
        hit = outs[0][(outs[0].id_a == i) & (outs[0].id_b == 40 + i)]
        assert len(hit) == 1 and hit.iloc[0].cont_b_e6 == 1_000_000


def test_containment_pairs_empty_corpus(ray_session):
    import ray.data as rd

    from raygraph.ops.dedup import containment_pairs

    df = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                       "text": pd.Series([], dtype=object)})
    out = containment_pairs(rd.from_pandas(df))
    assert out.schema().names == ["id_a", "id_b", "inter", "n_a", "n_b",
                                  "cont_a_e6", "cont_b_e6"]
    assert out.count() == 0


def test_dedup_safe_kfold_duplicates_share_fold(ray_session):
    import ray.data as rd

    from raygraph.ops.dedup import dedup_safe_kfold

    df = pd.DataFrame({
        "doc_id": range(6),
        "text": ["alpha beta", "gamma delta", "alpha beta",
                 "epsilon", "gamma delta", "alpha beta"],
    })
    out = dedup_safe_kfold(rd.from_pandas(df).repartition(3), k=5) \
        .to_pandas().set_index("doc_id")["fold"]
    # all copies of the same content agree, at any layout
    assert out[0] == out[2] == out[5]
    assert out[1] == out[4]
    assert set(out) <= set(range(5))


def test_dedup_safe_kfold_component_mode(ray_session):
    import ray.data as rd

    from raygraph.ops.dedup import dedup_safe_kfold, _padded_id

    # near-dup cluster {1, 2} via an explicit labels table: both fold
    # together even though their TEXTS differ; 3 folds by its own id
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["aa bb cc", "aa bb cc dd", "zz"]})
    comp = _padded_id(pa.array([1, 1], pa.int64()))
    labels = rd.from_pandas(pd.DataFrame({
        "vertex": _padded_id(pa.array([1, 2], pa.int64())).to_pylist(),
        "component": comp.to_pylist(),
    }))
    out = dedup_safe_kfold(rd.from_pandas(df), k=7, labels=labels) \
        .to_pandas().set_index("doc_id")["fold"]
    assert out[1] == out[2]
    assert 0 <= out[3] < 7


def test_dedup_safe_kfold_component_mode_string_ids(ray_session):
    # the id-type convention (strings pass through, like line_dedup):
    # labels mode must not force-cast string doc ids to int64
    import ray.data as rd

    from raygraph.ops.dedup import dedup_safe_kfold

    df = pd.DataFrame({"doc_id": ["doc-a", "doc-b", "doc-c"],
                       "text": ["aa bb cc", "aa bb cc dd", "zz"]})
    labels = rd.from_pandas(pd.DataFrame({
        "vertex": ["doc-a", "doc-b"],
        "component": ["doc-a", "doc-a"],
    }))
    out = dedup_safe_kfold(rd.from_pandas(df).repartition(2), k=7,
                           labels=labels) \
        .to_pandas().set_index("doc_id")["fold"]
    assert out["doc-a"] == out["doc-b"]
    assert 0 <= out["doc-c"] < 7
    assert out.index.dtype == object


def test_line_dedup_drops_boilerplate_keeps_unique(ray_session):
    # footer shared by docs 1+2 (normalized: case + trailing space)
    # drops from both; whitespace-only and empty lines never drop;
    # within-one-doc repeats don't drop (min_df counts DISTINCT docs)
    import ray.data as rd

    from raygraph.ops.dedup import line_dedup

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "unique one\nSubscribe NOW\nbody A",
            "body B\nsubscribe now \nunique two",
            "repeat me\nrepeat me\n  \t",
            "",
        ]})
    out = line_dedup(rd.from_pandas(df).repartition(3), min_df=2) \
        .to_pandas().set_index("doc_id").sort_index()
    assert out.loc[1, "clean_text"] == "unique one\nbody A"
    assert out.loc[2, "clean_text"] == "body B\nunique two"
    assert out.loc[1, "n_lines"] == 3 and out.loc[1, "n_dropped"] == 1
    # within-doc repeat survives; blank line preserved verbatim
    assert out.loc[3, "clean_text"] == "repeat me\nrepeat me\n  \t"
    assert out.loc[3, "n_dropped"] == 0
    # empty doc: [''] convention — one line, nothing dropped
    assert out.loc[4, "n_lines"] == 1 and out.loc[4, "clean_text"] == ""


def test_line_dedup_min_df_and_layout_invariance(ray_session):
    import ray.data as rd

    from raygraph.ops.dedup import line_dedup

    df = pd.DataFrame({
        "doc_id": list(range(6)),
        "text": [f"own {i}\nshared footer" if i < 3
                 else f"own {i}\nrare line" for i in range(6)]})
    # min_df=4: the 3-doc footer survives everywhere
    out4 = line_dedup(rd.from_pandas(df), min_df=4).to_pandas()
    assert int(out4["n_dropped"].sum()) == 0
    # min_df=3: footer dropped from its 3 docs, rare line (3 docs) too
    a = line_dedup(rd.from_pandas(df), min_df=3).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    b = line_dedup(rd.from_pandas(df).repartition(5), min_df=3) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    assert a.equals(b)
    assert (a["n_dropped"] == 1).all()
    assert a.loc[0, "clean_text"] == "own 0"


def test_line_dedup_string_ids(ray_session):
    # web-scale corpora key on string ids (URLs) — the id type rides
    # through inventory, join, and fold unchanged
    import ray.data as rd

    from raygraph.ops.dedup import line_dedup

    df = pd.DataFrame({
        "doc_id": ["u/a", "u/b", "u/c"],
        "text": ["mine a\nshared footer",
                 "mine b\nshared footer",
                 "mine c\nalone"]})
    out = line_dedup(rd.from_pandas(df), min_df=2).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc["u/a", "clean_text"] == "mine a"
    assert out.loc["u/b", "clean_text"] == "mine b"
    assert out.loc["u/c", "clean_text"] == "mine c\nalone"


def test_vectorized_pairing_matches_bucket_pairs_spec():
    # the capped self-merge used in the bucket reduces must emit
    # exactly the _bucket_pairs specification, bucket by bucket —
    # including above-cap truncation on ascending ids
    import numpy as np

    import raygraph.ops.dedup as D

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "key": rng.integers(0, 12, 400),
        "doc_id": rng.integers(0, 40, 400).astype("int64")})
    old_cap = D.BUCKET_PAIR_CAP
    D.BUCKET_PAIR_CAP = 5  # force truncation on some buckets
    try:
        ref = pd.concat(
            [D._bucket_pairs(g) for _, g in df.groupby("key")],
            ignore_index=True).drop_duplicates()
        v = df.drop_duplicates(["key", "doc_id"]) \
            .sort_values(["key", "doc_id"], kind="mergesort")
        v = v[v.groupby("key").cumcount() < D.BUCKET_PAIR_CAP]
        m = v.merge(v, on="key", suffixes=("_l", "_r"))
        m = m[m["doc_id_l"] < m["doc_id_r"]]
        got = pd.DataFrame({
            "id_a": m["doc_id_l"].to_numpy(),
            "id_b": m["doc_id_r"].to_numpy()}).drop_duplicates()
    finally:
        D.BUCKET_PAIR_CAP = old_cap
    key = lambda d: sorted(map(tuple, d[["id_a", "id_b"]].values))  # noqa: E731
    assert key(ref) == key(got)


def test_incremental_dedup_epochs(ray_session, tmp_path):
    # epoch 0 builds the index; epoch 1 drops cross-epoch dupes and
    # within-delta dupes (min-id representative); re-running the same
    # delta converges to zero survivors but still commits an epoch
    import os

    import ray.data as rd

    from raygraph.ops.dedup import exact_dedup_incremental

    idx = str(tmp_path / "idx")
    base = pd.DataFrame({"doc_id": [1, 2], "text": ["alpha", "beta"]})
    s0, e0 = exact_dedup_incremental(rd.from_pandas(base), idx)
    assert e0 == 0 and sorted(s0.to_pandas()["doc_id"]) == [1, 2]

    delta = pd.DataFrame({"doc_id": [12, 11, 10],
                          "text": ["gamma", "gamma", "beta"]})
    s1, e1 = exact_dedup_incremental(
        rd.from_pandas(delta).repartition(3), idx)
    out = s1.to_pandas()
    assert e1 == 1
    assert out.to_dict("records") == [{"doc_id": 11, "text": "gamma"}]

    s2, e2 = exact_dedup_incremental(rd.from_pandas(delta), idx)
    assert e2 == 2 and s2.count() == 0
    # empty epoch still committed; no _tmp leftovers
    names = sorted(os.listdir(idx))
    assert names == ["epoch-00000", "epoch-00001", "epoch-00002"]


def test_bloom_roundtrip_and_fp_rate():
    # every inserted key tests positive; foreign keys are almost all
    # negative at ~10 bits/key
    import hashlib

    import pandas as pd

    from raygraph.ops.dedup import (_bloom_build, _bloom_test,
                                    _hash_u64_pair)

    keys = pd.Series([hashlib.sha1(f"doc{i}".encode()).hexdigest()
                      for i in range(2000)])
    other = pd.Series([hashlib.sha1(f"new{i}".encode()).hexdigest()
                       for i in range(2000)])
    h1, h2 = _hash_u64_pair(keys)
    nbits = 10 * len(keys)
    bits = _bloom_build(h1, h2, nbits)
    assert _bloom_test(bits, nbits, h1, h2).all()
    o1, o2 = _hash_u64_pair(other)
    fp = _bloom_test(bits, nbits, o1, o2).mean()
    assert fp < 0.05


def test_incremental_dedup_v2_layout_and_v1_compat(ray_session,
                                                   tmp_path):
    # v2 epochs are hash-bucketed with a bloom sidecar; a hand-built
    # v1 epoch (flat files, no sidecar) still participates exactly —
    # and the mixed-index survivors equal a pure-v1 run
    import hashlib
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from raygraph import stateio
    from raygraph.ops.dedup import exact_dedup_incremental

    idx = str(tmp_path / "idx")
    base = pd.DataFrame({"doc_id": [1, 2], "text": ["alpha", "beta"]})
    _, e0 = exact_dedup_incremental(rd.from_pandas(base), idx)
    ep0 = os.path.join(idx, "epoch-00000")
    assert os.path.exists(os.path.join(ep0, "_bloom.json"))
    with open(os.path.join(ep0, "_bloom.json")) as fh:
        meta = json.load(fh)
    assert meta["version"] == 2 and len(meta["buckets"]) >= 1
    buckets = [n for n in os.listdir(ep0) if n.startswith("bucket=")]
    assert buckets and set(meta["buckets"]) == \
        {b.split("=")[1] for b in buckets}

    # hand-built v1 epoch: flat content_hash file + commit marker
    ep1 = os.path.join(idx, "epoch-00001")
    os.makedirs(ep1)
    pq.write_table(pa.table({"content_hash": pa.array(
        [hashlib.sha1(b"gamma").hexdigest()], pa.string())}),
        os.path.join(ep1, "part.parquet"))
    with open(os.path.join(ep1, stateio.COMMIT_MARKER), "w") as fh:
        fh.write("")

    delta = pd.DataFrame({"doc_id": [10, 11, 12, 13],
                          "text": ["alpha", "gamma", "delta", "delta"]})
    s, e = exact_dedup_incremental(
        rd.from_pandas(delta).repartition(2), idx)
    assert e == 2
    assert sorted(s.to_pandas()["doc_id"]) == [12]  # only 'delta' is new
    # the new epoch is v2 again
    assert os.path.exists(os.path.join(idx, "epoch-00002",
                                       "_bloom.json"))


def test_incremental_dedup_bloom_negative_fastpath(ray_session,
                                                   tmp_path):
    # an all-new delta must survive entirely (bloom negatives bypass
    # the join) and a duplicate-heavy delta must still drop everything
    # known — bit-equal semantics regardless of which path rows take
    import ray.data as rd

    from raygraph.ops.dedup import exact_dedup_incremental

    idx = str(tmp_path / "idx")
    base = pd.DataFrame({"doc_id": range(100),
                         "text": [f"base doc {i}" for i in range(100)]})
    exact_dedup_incremental(rd.from_pandas(base), idx)

    fresh = pd.DataFrame({"doc_id": range(1000, 1050),
                          "text": [f"fresh doc {i}" for i in range(50)]})
    s, _ = exact_dedup_incremental(rd.from_pandas(fresh), idx)
    assert s.count() == 50

    mixed = pd.DataFrame({
        "doc_id": range(2000, 2100),
        "text": [f"base doc {i}" if i % 2 == 0 else f"mixed doc {i}"
                 for i in range(100)]})
    s2, _ = exact_dedup_incremental(rd.from_pandas(mixed), idx)
    got = sorted(s2.to_pandas()["doc_id"])
    assert got == [2000 + i for i in range(100) if i % 2 == 1]


def test_minhash_incremental_band_bloom_guard(ray_session, tmp_path):
    # near-dup epochs land bucketed with a _bands_bloom.json sidecar;
    # a v1 band epoch (flat files, no sidecar) mixed in still drops
    # its near-copies — the guard prunes, never loses recall
    import json
    import os
    import shutil

    import ray.data as rd

    from raygraph import stateio
    from raygraph.ops.dedup import minhash_dedup_incremental

    la = ("the quick brown fox jumps over the lazy dog tonight ") * 4
    lb = ("pack my box with five dozen liquor jugs right now ") * 4
    idx = str(tmp_path / "idx")
    base = pd.DataFrame({"doc_id": [1, 2], "text": [la, lb]})
    _s, e0 = minhash_dedup_incremental(rd.from_pandas(base), idx,
                                       threshold=0.9, bands=8,
                                       shingle="word")
    ep0 = os.path.join(idx, "epoch-00000")
    assert os.path.exists(os.path.join(ep0, "_bands_bloom.json"))
    with open(os.path.join(ep0, "_bands_bloom.json")) as fh:
        meta = json.load(fh)
    assert meta["version"] == 2
    assert any(n.startswith("bucket=")
               for n in os.listdir(os.path.join(ep0, "bands")))

    # degrade epoch 0 to v1: flatten bands/, drop the sidecar
    bdir = os.path.join(ep0, "bands")
    flat = []
    for n in sorted(os.listdir(bdir)):
        if n.startswith("bucket="):
            sub = os.path.join(bdir, n)
            for f in sorted(os.listdir(sub)):
                dst = os.path.join(bdir, f"{n.replace('=', '_')}-{f}")
                shutil.move(os.path.join(sub, f), dst)
                flat.append(dst)
            os.rmdir(sub)
    os.remove(os.path.join(ep0, "_bands_bloom.json"))
    assert flat

    # delta: near-copy of la (must drop via the v1 epoch), one new doc
    delta = pd.DataFrame({"doc_id": [10, 11],
                          "text": [la, "something new entirely here"]})
    s1, e1 = minhash_dedup_incremental(rd.from_pandas(delta), idx,
                                       threshold=0.9, bands=8,
                                       shingle="word")
    assert e1 == 1
    assert sorted(r["doc_id"] for r in s1.take_all()) == [11]
    # the new epoch is guarded again
    assert os.path.exists(os.path.join(idx, "epoch-00001",
                                       "_bands_bloom.json"))

    # mixed v1+v2 index: near-copy of lb (v1 epoch) and of the new doc
    # (v2 epoch) both drop; a fresh doc survives
    delta2 = pd.DataFrame({
        "doc_id": [20, 21, 22],
        "text": [lb, "something new entirely here", "fresh and only"]})
    s2, _ = minhash_dedup_incremental(rd.from_pandas(delta2), idx,
                                      threshold=0.9, bands=8,
                                      shingle="word")
    assert sorted(r["doc_id"] for r in s2.take_all()) == [22]
    assert stateio.committed_dirs(idx, "epoch-") == [
        "epoch-00000", "epoch-00001", "epoch-00002"]


def test_bloom_budget_eviction_falls_back_exact(ray_session, tmp_path,
                                                monkeypatch):
    # when the decoded blooms would exceed the driver budget, epochs
    # are treated as unguarded (v1 semantics) — results unchanged
    import ray.data as rd

    from raygraph.ops import dedup as dd

    idx = str(tmp_path / "idx")
    base = pd.DataFrame({"doc_id": [1, 2], "text": ["alpha", "beta"]})
    dd.exact_dedup_incremental(rd.from_pandas(base), idx)

    monkeypatch.setattr(dd, "_bloom_budget_bytes", lambda: 1)
    delta = pd.DataFrame({"doc_id": [10, 11],
                          "text": ["alpha", "fresh"]})
    s, _ = dd.exact_dedup_incremental(rd.from_pandas(delta), idx)
    assert sorted(s.to_pandas()["doc_id"]) == [11]
    # derived bounds are sane and fall back without psutil readings
    assert dd._pos_broadcast_max() >= 50_000
    assert dd._bloom_budget_bytes() == 1  # the monkeypatch held


def test_bloom_guard_equals_unguarded_randomized(ray_session, tmp_path):
    # property pin for the guard: on random corpora with random
    # overlap, the guarded (v2) increment and the same index with
    # sidecars stripped (v1 semantics: everything joins, all files
    # read) produce identical survivor sets — for the exact AND the
    # near path
    import os
    import shutil

    import numpy as np
    import ray.data as rd

    from raygraph.ops.dedup import (exact_dedup_incremental,
                                    minhash_dedup_incremental)

    def strip(idx, name):
        for root, _d, names in os.walk(idx):
            if name in names:
                os.remove(os.path.join(root, name))

    for seed in (0, 1, 2):
        rng = np.random.RandomState(seed)
        base = pd.DataFrame({
            "doc_id": range(300),
            "text": [f"base {seed} item {rng.randint(200)} body words"
                     for _ in range(300)]})
        delta = pd.DataFrame({
            "doc_id": range(1000, 1200),
            "text": [(f"base {seed} item {rng.randint(200)} body words"
                      if rng.rand() < 0.4 else
                      f"new {seed} item {rng.randint(10**6)} body")
                     for _ in range(200)]})

        for kind, run in (
            ("exact", lambda ds, idx: exact_dedup_incremental(ds, idx)),
            ("near", lambda ds, idx: minhash_dedup_incremental(
                ds, idx, threshold=0.95, bands=8, shingle="word")),
        ):
            v2 = os.path.join(str(tmp_path), f"{kind}_{seed}_v2")
            run(rd.from_pandas(base).repartition(3), v2)
            v1 = os.path.join(str(tmp_path), f"{kind}_{seed}_v1")
            shutil.copytree(v2, v1)
            strip(v1, "_bloom.json")
            strip(v1, "_bands_bloom.json")
            s2, _ = run(rd.from_pandas(delta).repartition(3), v2)
            s1, _ = run(rd.from_pandas(delta).repartition(3), v1)
            got2 = sorted(r["doc_id"] for r in s2.take_all())
            got1 = sorted(r["doc_id"] for r in s1.take_all())
            assert got2 == got1, (kind, seed)


def test_compact_migrates_exact_index_to_v2(ray_session, tmp_path):
    # compaction of a mixed (v1+v2) exact index produces ONE v2 epoch
    # whose hash set is the union, and later increments behave
    import hashlib
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from raygraph import stateio
    from raygraph.ops.dedup import (compact_dedup_index,
                                    exact_dedup_incremental)

    idx = str(tmp_path / "idx")
    exact_dedup_incremental(rd.from_pandas(pd.DataFrame(
        {"doc_id": [1], "text": ["alpha"]})), idx)
    ep1 = os.path.join(idx, "epoch-00001")
    os.makedirs(ep1)
    pq.write_table(pa.table({"content_hash": pa.array(
        [hashlib.sha1(b"beta").hexdigest()], pa.string())}),
        os.path.join(ep1, "part.parquet"))
    with open(os.path.join(ep1, stateio.COMMIT_MARKER), "w") as fh:
        fh.write("")

    stats = compact_dedup_index(idx)
    assert stats["compacted"] and stats["layout"] == "exact"
    ep2 = os.path.join(idx, "epoch-00002")
    assert os.path.exists(os.path.join(ep2, "_bloom.json"))
    assert sorted(n for n in os.listdir(idx)
                  if n.startswith("epoch-")) == ["epoch-00002"]

    delta = pd.DataFrame({"doc_id": [7, 8, 9],
                          "text": ["alpha", "beta", "new"]})
    s, _ = exact_dedup_incremental(rd.from_pandas(delta), idx)
    assert sorted(s.to_pandas()["doc_id"]) == [9]


def test_incremental_dedup_ignores_crashed_tmp(ray_session, tmp_path):
    # a crashed commit leaves a _tmp- dir; later runs must neither
    # read it as an epoch nor trip over it
    import os

    import ray.data as rd

    from raygraph.ops.dedup import exact_dedup_incremental

    idx = str(tmp_path / "idx")
    os.makedirs(os.path.join(idx, "_tmp-00000"))
    base = pd.DataFrame({"doc_id": [5], "text": ["only"]})
    s0, e0 = exact_dedup_incremental(rd.from_pandas(base), idx)
    assert e0 == 0 and s0.count() == 1
    assert sorted(n for n in os.listdir(idx)
                  if n.startswith("epoch-")) == ["epoch-00000"]


def test_minhash_incremental_near_dup_epochs(ray_session, tmp_path):
    # epoch 0 indexes the base; the delta's NEAR-copy of an indexed doc
    # (one word changed) drops via the cross-epoch verify, within-delta
    # dups keep the min id, unique docs survive; re-running the same
    # delta converges to zero (every doc collides with its own rep at
    # Jaccard 1)
    import os

    import ray.data as rd

    from raygraph.ops.dedup import minhash_dedup_incremental

    long_a = ("the quick brown fox jumps over the lazy dog tonight "
              "in the park ") * 4
    long_b = ("completely different content about ray data pipelines "
              "and arrow batches ") * 4
    idx = str(tmp_path / "idx")
    base = pd.DataFrame({"doc_id": [1, 2], "text": [long_a, long_b]})
    s0, e0 = minhash_dedup_incremental(rd.from_pandas(base), idx)
    assert e0 == 0 and sorted(s0.to_pandas()["doc_id"]) == [1, 2]

    near_a = long_a.replace("tonight", "today", 1)
    uniq = ("fresh unique text about incremental deduplication "
            "indexes ") * 4
    delta = pd.DataFrame({
        "doc_id": [10, 11, 12, 13],
        "text": [near_a, uniq, uniq, "zebra " * 40]})
    s1, e1 = minhash_dedup_incremental(
        rd.from_pandas(delta).repartition(2), idx)
    assert e1 == 1
    assert sorted(s1.to_pandas()["doc_id"]) == [11, 13]

    s2, e2 = minhash_dedup_incremental(rd.from_pandas(delta), idx)
    assert e2 == 2 and s2.count() == 0
    assert sorted(n for n in os.listdir(idx)
                  if n.startswith("epoch-")) == [
        "epoch-00000", "epoch-00001", "epoch-00002"]
    # the empty epoch still carries the bands/reps layout
    assert os.path.isdir(os.path.join(idx, "epoch-00002", "bands"))


def test_compact_dedup_index_both_layouts(ray_session, tmp_path):
    # 3 exact epochs fold to one; the compacted index still drops
    # known content; near layout keeps bands/ + reps/ and still drops
    # a near-copy of an indexed doc; single-epoch compact is a no-op
    import os

    import ray.data as rd

    from raygraph.ops.dedup import (compact_dedup_index,
                                    exact_dedup_incremental,
                                    minhash_dedup_incremental)

    idx = str(tmp_path / "exact")
    for i, texts in enumerate([["a", "b"], ["b", "c"], ["c", "d"]]):
        exact_dedup_incremental(rd.from_pandas(pd.DataFrame({
            "doc_id": [i * 10 + 1, i * 10 + 2], "text": texts})), idx)
    st = compact_dedup_index(idx)
    assert st["compacted"] and st["layout"] == "exact"
    assert sorted(os.listdir(idx)) == ["epoch-00003"]
    s, _ = exact_dedup_incremental(rd.from_pandas(pd.DataFrame({
        "doc_id": [99], "text": ["d"]})), idx)
    assert s.count() == 0
    st2 = compact_dedup_index(idx)
    # two epochs again (compacted + the empty rerun epoch) fold to one
    assert st2["compacted"] and sorted(os.listdir(idx)) == [
        "epoch-00005"]
    # single-epoch index: compact is a no-op
    assert compact_dedup_index(idx)["compacted"] is False

    nidx = str(tmp_path / "near")
    la = "the quick brown fox jumps over the lazy dog tonight " * 4
    lb = "completely different content about ray data pipelines " * 4
    minhash_dedup_incremental(rd.from_pandas(pd.DataFrame({
        "doc_id": [1], "text": [la]})), nidx)
    minhash_dedup_incremental(rd.from_pandas(pd.DataFrame({
        "doc_id": [2], "text": [lb]})), nidx)
    stn = compact_dedup_index(nidx)
    assert stn["layout"] == "near"
    assert sorted(n for n in os.listdir(nidx)
                  if n.startswith("epoch-")) == ["epoch-00002"]
    assert os.path.isdir(os.path.join(nidx, "epoch-00002", "bands"))
    s2, _ = minhash_dedup_incremental(rd.from_pandas(pd.DataFrame({
        "doc_id": [9], "text": [la.replace("tonight", "today", 1)]})),
        nidx)
    assert s2.count() == 0


def test_minhash_dedup_group_scoped(ray_session):
    # identical texts dedup within a group but never across groups;
    # without group_col they all collapse to one
    import ray.data as rd

    from raygraph.ops.dedup import minhash_dedup

    la = ("the quick brown fox jumps over the lazy dog tonight ") * 4
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [la, la, la],
        "lang": ["en", "en", "de"]})
    grouped = minhash_dedup(rd.from_pandas(df).repartition(2),
                            threshold=0.99, bands=8, shingle="word",
                            group_col="lang").to_pandas()
    assert sorted(grouped["doc_id"]) == [1, 3]
    plain = minhash_dedup(rd.from_pandas(df), threshold=0.99, bands=8,
                          shingle="word").to_pandas()
    assert sorted(plain["doc_id"]) == [1]


def test_exact_dedup_group_scoped(ray_session):
    import ray.data as rd

    from raygraph.ops.dedup import exact_dedup

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["same", "same", "same"],
        "lang": ["en", "en", "de"]})
    grouped = exact_dedup(rd.from_pandas(df).repartition(2),
                          group_col="lang").to_pandas()
    assert sorted(grouped["doc_id"]) == [1, 3]
    plain = exact_dedup(rd.from_pandas(df)).to_pandas()
    assert sorted(plain["doc_id"]) == [1]


def test_line_dedup_group_scoped(ray_session):
    # the df count and the drop are scoped to the group: a footer
    # shared by two docs of site 'a' drops there but survives in the
    # single-doc site 'b'; ungrouped it drops everywhere
    import ray.data as rd

    from raygraph.ops.dedup import line_dedup

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["own 1\nshared footer", "own 2\nshared footer",
                 "own 3\nshared footer"],
        "site": ["a", "a", "b"]})
    g = line_dedup(rd.from_pandas(df).repartition(2), min_df=2,
                   group_col="site").to_pandas() \
        .set_index("doc_id").sort_index()
    assert list(g["clean_text"]) == ["own 1", "own 2",
                                     "own 3\nshared footer"]
    u = line_dedup(rd.from_pandas(df), min_df=2).to_pandas() \
        .set_index("doc_id").sort_index()
    assert list(u["clean_text"]) == ["own 1", "own 2", "own 3"]


def test_grouped_dedup_null_group_contract(ray_session):
    # ONE contract across every group-scoped dedup: null group values
    # normalize to a single sentinel group — they dedup among
    # themselves, never against real groups, and never silently
    # survive (a raw NaN key would vanish in pandas groupby on the LSH
    # and line paths while the exact path folded 'None'/'nan' strings)
    import ray.data as rd

    from raygraph.ops.dedup import exact_dedup, line_dedup, minhash_dedup

    la = ("the quick brown fox jumps over the lazy dog tonight ") * 4
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [la, la, la, la],
        "lang": ["en", None, None, "en"]})

    g = exact_dedup(rd.from_pandas(df).repartition(2),
                    group_col="lang").to_pandas()
    assert sorted(g["doc_id"]) == [1, 2]   # en keeps 1, null keeps 2

    m = minhash_dedup(rd.from_pandas(df).repartition(2),
                      threshold=0.99, bands=8, shingle="word",
                      group_col="lang").to_pandas()
    assert sorted(m["doc_id"]) == [1, 2]   # same scoping on LSH path

    ld = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["own 1\nshared footer", "own 2\nshared footer",
                 "own 3\nshared footer"],
        "site": [None, None, "b"]})
    out = line_dedup(rd.from_pandas(ld).repartition(2), min_df=2,
                     group_col="site").to_pandas() \
        .set_index("doc_id").sort_index()
    # footer drops within the null-group pair, survives in site b
    assert list(out["clean_text"]) == ["own 1", "own 2",
                                       "own 3\nshared footer"]


def test_incremental_dedup_string_ids(ray_session, tmp_path):
    import ray.data as rd

    from raygraph.ops.dedup import exact_dedup_incremental

    idx = str(tmp_path / "idx")
    base = pd.DataFrame({"doc_id": ["u/a"], "text": ["alpha"]})
    exact_dedup_incremental(rd.from_pandas(base), idx)
    delta = pd.DataFrame({"doc_id": ["u/b", "u/c"],
                          "text": ["alpha", "fresh"]})
    s, e = exact_dedup_incremental(rd.from_pandas(delta), idx)
    out = s.to_pandas()
    assert e == 1 and list(out["doc_id"]) == ["u/c"]


def test_minhash_incremental_signature_mode(ray_session, tmp_path):
    # storage-light index: reps hold signatures, not texts; exact
    # copies always drop (identical signatures), a near-copy drops at
    # the estimate threshold, and mixing verify modes on one index is
    # rejected via the pinned _meta.json
    import ray.data as rd

    from raygraph.errors import InvalidParameterError
    from raygraph.ops.dedup import minhash_dedup_incremental

    la = ("the quick brown fox jumps over the lazy dog tonight "
          "in the park ") * 4
    idx = str(tmp_path / "idx")
    base = pd.DataFrame({"doc_id": [1], "text": [la]})
    s0, _ = minhash_dedup_incremental(rd.from_pandas(base), idx,
                                      verify="signature")
    assert s0.count() == 1
    delta = pd.DataFrame({
        "doc_id": [10, 11],
        "text": [la.replace("tonight", "today", 1),
                 "zebra stripes everywhere " * 10]})
    s1, _ = minhash_dedup_incremental(rd.from_pandas(delta), idx,
                                      verify="signature")
    assert sorted(s1.to_pandas()["doc_id"]) == [11]
    with pytest.raises(InvalidParameterError):
        minhash_dedup_incremental(rd.from_pandas(delta), idx,
                                  verify="text")


def test_compact_dedup_index_signature_layout(ray_session, tmp_path):
    import os

    import ray.data as rd

    from raygraph.ops.dedup import (compact_dedup_index,
                                    minhash_dedup_incremental)

    la = "the quick brown fox jumps over the lazy dog tonight " * 4
    idx = str(tmp_path / "idx")
    for i, t in enumerate([la, "other content entirely here " * 8]):
        minhash_dedup_incremental(rd.from_pandas(pd.DataFrame({
            "doc_id": [i], "text": [t]})), idx, verify="signature")
    st = compact_dedup_index(idx)
    assert st["compacted"] and st["layout"] == "near"
    # compacted index still drops a near-copy under signature verify
    s, _ = minhash_dedup_incremental(rd.from_pandas(pd.DataFrame({
        "doc_id": [9], "text": [la.replace("tonight", "today", 1)]})),
        idx, verify="signature")
    assert s.count() == 0


def test_lsh_bucket_stats_and_cap_agreement(ray_session):
    # the BUCKET_PAIR_CAP skew defense has observable behavior: stats
    # report the hot bucket and the beyond-cap doc count, and a cap
    # that does NOT bind leaves survivors identical to a huge cap
    import ray.data as rd

    import raygraph.ops.dedup as dd
    from raygraph.ops.dedup import lsh_bucket_stats, minhash_dedup

    la = ("the quick brown fox jumps over the lazy dog tonight ") * 4
    df = pd.DataFrame({
        "doc_id": list(range(6)) + [100, 101],
        "text": [la] * 6 + ["something else entirely different here",
                            "one more unrelated survivor document"]})
    ds = rd.from_pandas(df).repartition(3)

    # 6 identical docs share every band bucket: max bucket == 6
    stats = lsh_bucket_stats(ds, bands=8, shingle="word")
    assert stats["max_bucket_size"] == 6
    assert stats["buckets_over_cap"] == 0   # default cap 512
    assert stats["docs_beyond_cap"] == 0

    # with cap=4 the hot bucket exceeds: 8 bands x (6-4) beyond-cap
    stats4 = lsh_bucket_stats(ds, bands=8, shingle="word", cap=4)
    assert stats4["buckets_over_cap"] == 8
    assert stats4["docs_beyond_cap"] == 16

    # non-binding cap (8 >= bucket size): survivors == default cap
    def run():
        out = minhash_dedup(rd.from_pandas(df).repartition(3),
                            threshold=0.9, bands=8, shingle="word")
        return sorted(r["doc_id"] for r in out.take_all())

    base = run()
    assert base == [0, 100, 101]
    old = dd.BUCKET_PAIR_CAP
    try:
        dd.BUCKET_PAIR_CAP = 8
        assert run() == base
    finally:
        dd.BUCKET_PAIR_CAP = old


def test_lsh_bucket_stats_grouped(ray_session):
    # grouped stats key on (band, grp): identical texts split across
    # two groups form two 3-doc buckets per band, not one 6-doc bucket
    import ray.data as rd

    from raygraph.ops.dedup import lsh_bucket_stats

    la = ("pack my box with five dozen liquor jugs every day ") * 4
    df = pd.DataFrame({
        "doc_id": range(6),
        "text": [la] * 6,
        "lang": ["en", "en", "en", "de", "de", "de"]})
    stats = lsh_bucket_stats(rd.from_pandas(df).repartition(2),
                             bands=8, shingle="word",
                             group_col="lang")
    assert stats["max_bucket_size"] == 3


def test_contract_pair_edges_preserves_components(ray_session):
    # the contraction claim, pinned: components of the contracted edge
    # set equal components of the original pair set — across random
    # graphs, random block layouts, and pair duplication
    import numpy as np
    import ray.data as rd

    from raygraph.ops.dedup import _contract_pair_edges

    def uf_components(pairs, vertices):
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {v: find(v) for v in vertices}

    for seed in range(8):
        rng = np.random.RandomState(seed)
        n_v = rng.randint(5, 60)
        n_e = rng.randint(1, 150)
        a = rng.randint(0, n_v, n_e)
        b = rng.randint(0, n_v, n_e)
        keep = a != b
        a, b = a[keep], b[keep]
        if not len(a):
            continue
        pairs = [(f"v{x:03d}", f"v{y:03d}") for x, y in zip(a, b)]
        verts = sorted({p for pr in pairs for p in pr})
        want = uf_components(pairs, verts)

        ds = rd.from_pandas(pd.DataFrame(
            {"_from": [p[0] for p in pairs],
             "_to": [p[1] for p in pairs]})) \
            .repartition(int(rng.randint(1, 6)))
        out = _contract_pair_edges(ds).take_all()
        contracted = [(r["_from"], r["_to"]) for r in out]
        got = uf_components(contracted, verts)
        # same partition: roots may differ per representative choice,
        # but the grouping (and with min-based union, the min rep)
        # must match exactly
        assert got == want, seed
        # every paired vertex survives contraction (as a member edge
        # or as some member's local root) — nothing vanishes
        seen = {v for e in contracted for v in e}
        assert seen == set(verts), seed
