"""Unit tests for the retrieval/curation text ops added in session 7:
BM25, bigram PMI, unigram-LM surprise (tiny corpora, hand-checked)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(rows):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(rows))


def test_bm25_ranks_matching_docs_first(ray_session):
    from raygraph.ops.text import bm25_topk

    docs = [
        {"doc_id": 0, "text": "hash join hash join hash"},  # tf-heavy
        {"doc_id": 1, "text": "hash table scan"},
        {"doc_id": 2, "text": "sort merge only"},            # no match
        {"doc_id": 3, "text": "join"},
    ]
    out = bm25_topk(_ds(docs), ["hash", "join"], k=10).to_pandas()
    # doc 2 has no query term -> excluded
    assert set(out["doc_id"]) == {0, 1, 3}
    # doc 0 matches both terms with high tf -> ranks first
    assert out["doc_id"].iloc[0] == 0
    # hand-check one contribution: doc 3, term "join":
    # N=4, S=12, df(join)=2, dl=1, tf=1
    idf6 = 1_000_000 * math.log((4 - 2 + 0.5) / (2 + 0.5))
    num, den = 22 * 1 * 12, 10 * 1 * 12 + 3 * 12 + 9 * 1 * 4
    exp = math.floor(idf6 * (num / den))
    got3 = int(out.loc[out["doc_id"] == 3, "score_e6"].iloc[0])
    assert got3 == exp


def test_bigram_pmi_favors_exclusive_pairs(ray_session):
    from raygraph.ops.text import bigram_pmi

    # "alpha beta" always co-occur exclusively; "the the" is frequent
    # but independent -> PMI must rank "alpha beta" higher
    docs = [{"doc_id": i, "text": "alpha beta"} for i in range(5)]
    docs += [{"doc_id": 100 + i, "text": "the x the y the z"}
             for i in range(5)]
    out = bigram_pmi(_ds(docs), k=5, top_m=100)
    assert out["bigram"].iloc[0] == "alpha beta"
    top = out.iloc[0]
    # exact contract: floor(1e6 * ln(n_xy * N_u^2 / (N_b * n_x * n_y)))
    # n_xy=5, N_u=40 tokens, N_b=5+5*5=30 bigrams, n_x=n_y=5
    exp = math.floor(1_000_000 * math.log(
        float(5 * 40 * 40) / float(30 * 5 * 5)))
    assert int(top["pmi_e6"]) == exp and int(top["n"]) == 5


def test_unigram_surprise_flags_rare_tokens(ray_session):
    from raygraph.ops.text import unigram_surprise_topk

    docs = [{"doc_id": i, "text": "common common common"}
            for i in range(4)]
    docs.append({"doc_id": 99, "text": "rare unique tokens"})
    out = unigram_surprise_topk(_ds(docs), k=5).to_pandas()
    # the all-rare doc has maximal cross-entropy
    assert out["doc_id"].iloc[0] == 99
    # exact term: every token of doc 99 has n_w=1, N_u=15, tf=1, n_tok=3
    exp = (3 * math.floor(1_000_000 * math.log(15.0 / 1.0))) // 3
    assert int(out.loc[out["doc_id"] == 99, "ce_e6"].iloc[0]) == exp
