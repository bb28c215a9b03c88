"""Classifier-eval ops: exact ROC-AUC (rank-sum) and per-class PRF.

Reference analog: the exporter's per-collection count summaries
(src/graph_loader.rs:514-559) — tiny keyed aggregates of a large scan.
"""

import numpy as np
import pandas as pd
import pytest

from raygraph.ops.classify import prf_per_class, roc_auc


def _ds(df, nparts=1):
    import ray.data as rd

    ds = rd.from_pandas(df)
    return ds.repartition(nparts) if nparts > 1 else ds


def _brute_auc_e6(scores, labels):
    """O(n²) reference: (#pos>neg + ties/2) / (n_pos·n_neg), floored e6."""
    pos = [s for s, l in zip(scores, labels) if l]
    neg = [s for s, l in zip(scores, labels) if not l]
    gt = sum(1 for p in pos for q in neg if p > q)
    ties = sum(1 for p in pos for q in neg if p == q)
    return (1_000_000 * (2 * gt + ties)) // (2 * len(pos) * len(neg))


def test_auc_hand_case_with_ties(ray_session):
    # pos=[3,2] neg=[2,1]: 3 strict wins + 1 tie → (3+0.5)/4 = 0.875
    df = pd.DataFrame({"s": [3, 2, 2, 1],
                       "p": [True, True, False, False]})
    r = roc_auc(_ds(df), "p", "s")
    assert r["auc_e6"].tolist() == [875000]
    assert r["n_pos"].tolist() == [2] and r["n_neg"].tolist() == [2]


def test_auc_constant_scorer_is_half(ray_session):
    df = pd.DataFrame({"s": [7] * 6,
                       "p": [True, False, True, False, False, True]})
    r = roc_auc(_ds(df), "p", "s")
    assert r["auc_e6"].tolist() == [500000]


def test_auc_perfect_and_inverted_grouped(ray_session):
    df = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 4,
        "s": [4, 3, 2, 1, 1, 2, 3, 4],
        "p": [True, True, False, False, True, True, False, False],
    })
    r = roc_auc(_ds(df, nparts=3), "p", "s", group_cols=["g"]) \
        .set_index("g")
    assert r.loc["a", "auc_e6"] == 1_000_000
    assert r.loc["b", "auc_e6"] == 0


def test_auc_single_class_group_omitted(ray_session):
    df = pd.DataFrame({"g": ["a", "a", "b", "b"],
                       "s": [1, 2, 3, 4],
                       "p": [True, True, True, False]})
    r = roc_auc(_ds(df), "p", "s", group_cols=["g"])
    assert r["g"].tolist() == ["b"]  # group a has no negatives


def test_auc_matches_brute_force_any_layout(ray_session):
    rng = np.random.RandomState(7)
    scores = rng.randint(0, 12, size=200)
    labels = rng.rand(200) < 0.3
    want = _brute_auc_e6(scores.tolist(), labels.tolist())
    df = pd.DataFrame({"s": scores, "p": labels})
    for nparts in (1, 5, 17):
        r = roc_auc(_ds(df, nparts=nparts), "p", "s")
        assert r["auc_e6"].tolist() == [want]


def test_prf_hand_case(ray_session):
    df = pd.DataFrame({"label": ["a", "a", "b", "b", "b", "c"],
                       "pred": ["a", "b", "b", "b", "a", "b"]})
    r = prf_per_class(_ds(df, nparts=2)).set_index("label")
    assert r.loc["a", ["tp", "fp", "fn"]].tolist() == [1, 1, 1]
    assert r.loc["a", "f1_e6"] == 500000
    assert r.loc["b", "rec_e6"] == 666666  # floor(1e6·2/3)
    assert r.loc["b", "f1_e6"] == 571428   # floor(4e6/7)
    # class c never predicted: all-zero metrics, still a row
    assert r.loc["c", ["prec_e6", "rec_e6", "f1_e6"]].tolist() == [0, 0, 0]


def test_prf_includes_pred_only_class(ray_session):
    # a label that appears ONLY as a prediction still gets a row
    df = pd.DataFrame({"label": ["a", "a"], "pred": ["a", "z"]})
    r = prf_per_class(_ds(df)).set_index("label")
    assert set(r.index) == {"a", "z"}
    assert r.loc["z", "tp"] == 0 and r.loc["z", "fp"] == 1


def test_prf_perfect_classifier(ray_session):
    df = pd.DataFrame({"label": list("abcabc"), "pred": list("abcabc")})
    r = prf_per_class(_ds(df, nparts=3))
    assert (r["prec_e6"] == 1_000_000).all()
    assert (r["rec_e6"] == 1_000_000).all()
    assert (r["f1_e6"] == 1_000_000).all()


def test_nb_class_score_matches_winning_score(ray_session):
    # on a corpus where c-docs always win class c, nb_class_score for
    # that class must equal nb_score's winning score on those docs
    import ray.data as rd

    from raygraph.ops.classify import nb_class_score, nb_fit, nb_score

    df = pd.DataFrame({
        "doc_id": range(6),
        "text": ["apple apple fruit", "apple fruit tart",
                 "motor oil engine", "motor engine spark",
                 "apple pie fruit", "engine oil motor"],
        "label": ["f", "f", "m", "m", "f", "m"],
    })
    ds = rd.from_pandas(df)
    ll, pr, _ = nb_fit(ds, vocab_size=32)
    full = nb_score(ds, ll, pr).to_pandas().set_index("doc_id")
    one = nb_class_score(ds, ll, pr, "f").to_pandas() \
        .set_index("doc_id")
    for did in (0, 1, 4):
        assert full.loc[did, "pred"] == "f"
        assert one.loc[did, "score_e6"] == full.loc[did, "score_e6"]


def test_nb_class_score_unknown_label_raises(ray_session):
    import ray.data as rd

    from raygraph.ops.classify import nb_class_score, nb_fit

    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1], "text": ["a b", "c d"],
        "label": ["x", "y"]}))
    ll, pr, _ = nb_fit(ds)
    with pytest.raises(ValueError):
        nb_class_score(ds, ll, pr, "nope")
