"""Text-analysis ops (pure batch fns — no Ray session needed)."""

import pandas as pd
import pyarrow as pa

from raygraph.ops.text import (
    doc_fingerprint,
    lang_id,
    quality_score,
    text_stats,
    token_count,
)


def _batch(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_token_count():
    t = token_count(_batch(["a b c", "  x   y ", "", "one"]))
    assert t.column("n_tokens").to_pylist() == [3, 2, 0, 1]


def test_text_stats():
    t = text_stats(_batch(["aa bb aa", ""]))
    r = t.to_pylist()[0]
    assert r["n_chars"] == 8
    assert r["n_tokens"] == 3
    assert r["n_unique_tokens"] == 2
    assert abs(r["ttr"] - 0.6666) < 1e-9  # floor-at-4dp semantics
    assert abs(r["mean_token_len"] - 2.0) < 1e-9
    z = t.to_pylist()[1]
    assert z["n_tokens"] == 0 and z["ttr"] == 0


def test_quality_score_orders_sensibly():
    junk = "!!! ??? ... ;;; ###"
    good = ("the quick brown fox jumps over the lazy dog and it was a fine day "
            "for a walk in the park with a friend of mine") * 5
    t = quality_score(_batch([junk, good]))
    q = t.column("quality").to_pylist()
    assert q[1] > q[0]
    assert 0 <= q[0] <= 1 and 0 <= q[1] <= 1


def test_lang_id():
    t = lang_id(
        _batch(
            [
                "the cat sat on the mat and it was happy",
                "le chat est dans la maison et il est content",
                "der Hund ist in dem Haus und er ist mit den Kindern",
                "el perro es un animal y no es el gato",
                "12345 67890",
            ]
        )
    )
    assert t.column("lang_pred").to_pylist() == ["en", "fr", "de", "es", "und"]


def test_fingerprint_deterministic_and_order_sensitive():
    a = doc_fingerprint(_batch(["hello world"])).column("fingerprint").to_pylist()
    b = doc_fingerprint(_batch(["hello world"])).column("fingerprint").to_pylist()
    c = doc_fingerprint(_batch(["world hello"])).column("fingerprint").to_pylist()
    assert a == b
    assert a != c


def test_fingerprint_no_overflow_warning():
    # the mod-2^64 wraparound in the F-power table is intentional and
    # must be SILENT (array op) — a scalar loop would emit numpy's
    # overflow RuntimeWarning on every run, drowning real warnings
    import warnings

    long_doc = " ".join(f"tok{i}" for i in range(500))
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        t = doc_fingerprint(_batch([long_doc, "", "hello world"]))
    assert len(t.column("fingerprint").to_pylist()) == 3


def test_bpe_token_count():
    from raygraph.ops.text import bpe_token_count

    t = bpe_token_count(_batch([
        "hello world",          # 2 letter runs
        "it's 1234!",           # it + 's + ' 1234'->'123','4' + '!'
        "",
    ]))
    got = t.column("n_bpe_tokens").to_pylist()
    assert got[0] == 2
    assert got[2] == 0
    # parity with the DuckDB oracle on the same strings
    import duckdb

    from raygraph.ops.text import BPE_PATTERN

    con = duckdb.connect()
    for s, n in zip(["hello world", "it's 1234!", ""], got):
        sql_n = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [s, BPE_PATTERN]
        ).fetchone()[0]
        assert sql_n == n, (s, sql_n, n)


def test_build_vocab_and_encode(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.text import build_vocab, encode_tokens

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b a c", "b a B", "   "],   # doc 3: zero tokens
    })
    ds = rd.from_pandas(docs).repartition(2)
    vocab = build_vocab(ds, size=2)
    # counts: a=3, b=3 (lowercased), c=1 → ties a<b → ids a=0, b=1
    assert vocab["token"].tolist() == ["a", "b"]
    assert vocab["token_id"].tolist() == [0, 1]

    out = encode_tokens(ds, vocab)
    got = {r["doc_id"]: (r["n_tokens"], r["n_oov"], r["sum_ids"])
           for r in out.take_all()}
    # doc1: a b a c → 4 tokens, c oov, ids 0+1+0 = 1
    # doc2: b a b → 3 tokens, 0 oov, 1+0+1 = 2; doc3 absent
    assert got == {1: (4, 1, 1), 2: (3, 0, 2)}


def test_pii_scrub_counts_and_redaction():
    import pyarrow as pa

    from raygraph.ops.text import pii_scrub

    b = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["mail a.b+c@ex-1.org now", "call 555-123-4567 twice", "x"],
    })
    out = pii_scrub(b).to_pandas()
    assert out["n_emails"].tolist() == [1, 0, 0]
    assert out["n_phones"].tolist() == [0, 1, 0]
    assert out["clean_text"].tolist() == [
        "mail <EMAIL> now", "call <PHONE> twice", "x"]


def test_contamination_counts(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.text import bench_ngram_set, contamination_counts

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c d", "b c d e", "x y"],   # doc3: <3 tokens → no row
    })
    ds = rd.from_pandas(docs).repartition(2)
    bench = bench_ngram_set(
        rd.from_pandas(docs.iloc[:1]), n=3)      # {"a b c", "b c d"}
    assert bench == frozenset({"a b c", "b c d"})
    out = {r["doc_id"]: (r["n_grams"], r["n_contaminated"])
           for r in contamination_counts(ds, bench, n=3).take_all()}
    assert out == {1: (2, 2), 2: (2, 1)}


def test_repetition_stats():
    import pyarrow as pa

    from raygraph.ops.text import repetition_stats

    b = pa.table({"doc_id": [1, 2], "text": ["a b a b a", "solo"]})
    out = repetition_stats(b).to_pandas()
    # 2-grams of doc1: ab, ba, ab, ba → 4 total, max 2, share 0.5
    assert out["doc_id"].tolist() == [1]
    assert out["n_2grams"].tolist() == [4]
    assert out["max_2gram_n"].tolist() == [2]
    assert out["top_share"].tolist() == [0.5]


def test_extract_matches(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.text import EMAIL_PATTERN, extract_matches

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a@b.co and c@d.org here", "no mail", "x@y.net"],
    })
    out = extract_matches(rd.from_pandas(docs).repartition(2),
                          EMAIL_PATTERN, out="email")
    got = sorted((r["doc_id"], r["email"]) for r in out.take_all())
    assert got == [(1, "a@b.co"), (1, "c@d.org"), (3, "x@y.net")]


def test_inverted_index_band_and_postings(ray_session):
    import ray.data as rd

    from raygraph.ops.text import inverted_index

    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["apple banana", "Apple cherry", "apple cherry date",
                 "  BANANA  "],
    })
    out = inverted_index(rd.from_arrow(docs).repartition(2),
                         df_min=2, df_max=3).to_pandas()
    got = {r.token: (r.n_docs, r.postings)
           for r in out.itertuples(index=False)}
    # apple df=3 (case-folded), banana df=2 (trim), cherry df=2;
    # date is a hapax (df=1) -> excluded by the band
    assert got == {"apple": (3, "1,2,3"), "banana": (2, "1,4"),
                   "cherry": (2, "2,3")}

    # df_max excludes stopword-grade tokens
    out2 = inverted_index(rd.from_arrow(docs), df_min=2,
                          df_max=2).to_pandas()
    assert set(out2.token) == {"banana", "cherry"}


def test_search_all_tokens_conjunctive(ray_session):
    import ray.data as rd

    from raygraph.ops.text import search_all_tokens

    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["Apple banana cherry", "apple cherry", "banana apple",
                 "apple apple apple"],
    })
    out = search_all_tokens(rd.from_arrow(docs).repartition(2),
                            ["apple", "banana"]).to_pandas()
    assert sorted(out.doc_id) == [1, 3]        # case-folded AND semantics

    out1 = search_all_tokens(rd.from_arrow(docs), ["apple"]).to_pandas()
    assert sorted(out1.doc_id) == [1, 2, 3, 4]


def test_top_bigrams_doc_boundaries(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.text import top_bigrams

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c", "c a B", "x", ""],
    })
    out = top_bigrams(rd.from_pandas(docs).repartition(3),
                      k=10).to_pandas()
    got = dict(zip(out.bigram, out.n))
    # lowercased; no cross-doc pair ("c" end of doc1 -> "c" start of
    # doc2 must NOT produce "c c"); single-token and empty docs vanish
    assert got == {"a b": 2, "b c": 1, "c a": 1}
    # deterministic order: n desc, bigram asc
    assert list(out.bigram) == ["a b", "b c", "c a"]


def test_score_linear_exact(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.text import (DEFAULT_LR_BIAS, DEFAULT_LR_WEIGHTS,
                                   score_linear)

    docs = pd.DataFrame({"doc_id": [1, 2],
                         "text": ["hello, world!", ""]})
    out = score_linear(rd.from_pandas(docs), concurrency=1).to_pandas() \
        .set_index("doc_id")
    w, b = DEFAULT_LR_WEIGHTS, DEFAULT_LR_BIAS
    # "hello, world!": 13 chars, 2 tokens, 2 punct
    exp1 = b + w["n_chars"] * 13 + w["n_tokens"] * 2 + w["n_punct"] * 2
    assert out.loc[1, "logit"] == exp1
    assert out.loc[1, "keep"] == int(exp1 > 0)
    assert out.loc[2, "logit"] == b and out.loc[2, "keep"] == 0


def test_boilerplate_stats_exact(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.text import boilerplate_stats

    shared = "one two three four five"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            shared + " alpha beta",     # 3 5-grams, 1 shared
            shared + " gamma delta",    # 3 5-grams, 1 shared
            "tiny",                     # <5 tokens -> no row
        ],
    })
    out = boilerplate_stats(rd.from_pandas(docs).repartition(2),
                            n=5, df_min=2, num_buckets=4).to_pandas()
    got = {r.doc_id: (r.n_grams, r.n_boiler, r.boiler_bp)
           for r in out.itertuples(index=False)}
    assert got == {1: (3, 1, 3333), 2: (3, 1, 3333)}
    assert 3 not in got


def test_bpe_merge_pairs_weighted(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.text import bpe_merge_pairs

    docs = pd.DataFrame({"doc_id": [1, 2],
                         "text": ["abab abab cd", "abab x"]})
    out = bpe_merge_pairs(rd.from_pandas(docs).repartition(2),
                          k=10).to_pandas()
    got = dict(zip(out.pair, out.w))
    # "abab" x3: pairs ab,ba,ab -> ab 6, ba 3; "cd" x1; "x" none
    assert got == {"ab": 6, "ba": 3, "cd": 1}
    assert list(out.pair)[0] == "ab"


def test_readability_counts(ray_session):
    import pandas as pd
    import pyarrow as pa

    from raygraph.ops.text import readability

    t = pa.table({"doc_id": [0, 1],
                  "text": ["Hi there. All good? yes!", ""]})
    out = readability(t).to_pandas()
    # 5 words, 3 terminators, vowel groups: i,e,e,a,oo,e = 6
    assert out.loc[0, "n_words"] == 5 and out.loc[0, "n_sents"] == 3
    assert out.loc[0, "wps_e4"] == 16666
    assert out.loc[0, "spw_e4"] == 12000
    assert (out.loc[1, ["n_words", "n_sents", "wps_e4", "spw_e4"]]
            == 0).all()


def test_ttr_by_source_matches_naive(ray_session):
    import collections

    import ray.data as rd

    from raygraph.ops.text import ttr_by_source

    docs = [
        ("s1", "the cat sat on the mat"),
        ("s1", "the dog sat"),
        ("s2", "unique words only here"),
        ("s2", ""),
        ("s2", "  WORDS Words  "),
    ]
    ds = rd.from_arrow(pa.table({
        "source": [d[0] for d in docs],
        "text": [d[1] for d in docs],
    }))
    got = ttr_by_source(ds).to_pandas().set_index("source")

    by_src = collections.defaultdict(list)
    for s, t in docs:
        by_src[s].extend(t.strip().lower().split())
    for s, toks in by_src.items():
        c = collections.Counter(toks)
        n_tokens, n_types = len(toks), len(c)
        n_hapax = sum(1 for v in c.values() if v == 1)
        row = got.loc[s]
        assert row["n_tokens"] == n_tokens
        assert row["n_types"] == n_types
        assert row["n_hapax"] == n_hapax
        assert row["ttr_bp"] == 10_000 * n_types // n_tokens
        assert row["hapax_bp"] == 10_000 * n_hapax // n_types


def test_novelty_rate_first_occurrence(ray_session):
    import ray.data as rd

    from raygraph.ops.text import novelty_rate

    docs = [
        (0, "a b c d"),            # grams: abc, bcd -> both novel
        (1, "a b c e"),            # abc (seen), bce (novel) -> 5000 bp
        (2, "a b c d"),            # all seen -> 0
        (3, "x y"),                # too short -> no row
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": [d[1] for d in docs],
    }))
    got = novelty_rate(ds, n=3).to_pandas().set_index("doc_id")
    assert got.loc[0, "novelty_bp"] == 10_000
    assert got.loc[1].tolist() == [2, 1, 5_000]
    assert got.loc[2].tolist() == [2, 0, 0]
    assert 3 not in got.index
    # duplicate in-doc grams count once
    ds2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": ["p q r p q r p q r"],   # distinct grams: pqr qrp rpq
    }))
    g2 = novelty_rate(ds2, n=3).to_pandas()
    assert g2["n_grams"].iloc[0] == 3
    assert g2["novelty_bp"].iloc[0] == 10_000


def test_skipgram_counts_window_masking(ray_session):
    import collections

    import ray.data as rd

    from raygraph.ops.text import skipgram_counts

    docs = ["a b c", "c a"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()), "text": docs}))
    got = {r["pair"]: r["n"]
           for r in skipgram_counts(ds, k=50, window=2).take_all()}
    exp = collections.Counter()
    for d in docs:
        t = d.split()
        for i in range(len(t)):
            for j in (1, 2):
                if i + j < len(t):
                    exp[f"{t[i]} {t[i + j]}"] += 1
    assert got == dict(exp)
    # no cross-doc pair leaked ('c a' from doc boundary would be wrong
    # only if doc masking failed; it exists legitimately inside doc 1)
    assert got["c a"] == 1


def test_char_trigram_counts_boundaries(ray_session):
    import collections

    import ray.data as rd

    from raygraph.ops.text import char_trigram_counts

    docs = ["abcd", "BC", "xyz"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(3), pa.int64()), "text": docs}))
    got = {r["tri"]: r["n"]
           for r in char_trigram_counts(ds, k=50).take_all()}
    exp = collections.Counter()
    for d in docs:
        d = d.lower()
        for i in range(len(d) - 2):
            exp[d[i:i + 3]] += 1
    # "BC" is too short to contribute; no cross-doc trigram may appear
    assert got == dict(exp)
    assert "dbc" not in got and "cxy" not in got


def test_vocab_growth_cumulative(ray_session):
    import os
    import tempfile

    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    d = tempfile.mkdtemp(prefix="vg_")
    # 10 docs: doc 0 introduces a b; doc 5 introduces c; others repeat
    texts = ["a b"] + ["a"] * 4 + ["c a"] + ["b"] * 4
    pq.write_table(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": texts,
        "lang": ["en"] * 10,
        "source": ["s"] * 10,
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(d, "documents.parquet"))
    got = entry.queries()["docs_vocab_growth"](d)
    vs = dict(zip(got["decile"], got["vocab_size"]))
    # deciles are 1 doc wide here: vocab 2 after doc 0, 3 after doc 5
    assert vs[1] == 2 and vs[5] == 2 and vs[6] == 3 and vs[10] == 3


def test_gazetteer_tag_multiword_adjacency(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.text import gazetteer_tag

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "the hash join beats the sort",   # hash join ×1, hash ×1
            "hash hash join",                 # hash ×2, hash join ×1
            "join hash",                      # NOT adjacent "hash join"
            "",                               # empty doc contributes nothing
        ],
    })
    terms = ["hash join", "hash", "nonexistent phrase"]
    for parts in (1, 4):
        got = gazetteer_tag(rd.from_pandas(df).repartition(parts),
                            terms).to_pandas()
        by = got.set_index("term")
        assert by.loc["hash join", "n_mentions"] == 2
        assert by.loc["hash join", "n_docs"] == 2
        assert by.loc["hash", "n_mentions"] == 4
        assert by.loc["hash", "n_docs"] == 3
        assert "nonexistent phrase" not in by.index
        assert list(got["term"]) == sorted(got["term"])


def test_good_turing_known_spectrum(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.text import good_turing

    # unigram counts: a:3 b:2 c:2 d:1 e:1 f:1 -> n_1=3, n_2=2, n_3=1
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": ["a a a b b", "c c d e f"],
    }))
    got = good_turing(ds, max_r=5, gram=1)
    rows = {int(r.r): (int(r.n_r), int(r.n_next), int(r.gt_e6))
            for r in got.itertuples()}
    assert rows[1] == (3, 2, (1_000_000 * 2 * 2) // 3)
    assert rows[2] == (2, 1, (1_000_000 * 3 * 1) // 2)
    assert rows[3] == (1, 0, 0)


def test_bigram_g2_ranks_true_collocation_first(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.text import bigram_g2_topk

    # "strong tea" always co-occurs; fillers are independent
    docs = ["strong tea %s" % w for w in "u v w x y z".split()] * 5
    docs += ["tea strong".replace(" ", " filler ")]
    ds = rd.from_arrow(pa.table({
        "doc_id": list(range(len(docs))), "text": docs}))
    got = bigram_g2_topk(ds, k=5, top_m=100)
    assert got["bigram"].iloc[0] == "strong tea"
    assert (got["g2_e6"] > 0).iloc[0]
    # deterministic across layout
    got2 = bigram_g2_topk(rd.from_arrow(pa.table({
        "doc_id": list(range(len(docs))), "text": docs})).repartition(5),
        k=5, top_m=100)
    assert got.equals(got2)


def test_rake_scores_known_corpus(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.text import rake_keywords

    # "deep learning" is a recurring 2-word phrase; "rocks" stands
    # alone. Stopword "the"/"is" split the runs.
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": ["the deep learning is deep learning",
                 "deep learning rocks"],
    }))
    got = rake_keywords(ds, k=10, lang="en")
    rows = {r.phrase: (int(r.n), int(r.score_e6))
            for r in got.itertuples()}
    # occurrences: "deep learning" x2, "deep learning rocks" x1
    # deg(deep) = 2+2+3 = 7, freq = 3 -> s = 2333333
    # deg(learning) same; deg(rocks) = 3, freq 1 -> 3000000
    s_dl = (1_000_000 * 7) // 3
    assert rows["deep learning"] == (2, 2 * s_dl)
    assert rows["deep learning rocks"] == (1, 2 * s_dl + 3_000_000)
    # longer phrase outranks the pair
    assert got["phrase"].iloc[0] == "deep learning rocks"


def test_bigram_cross_entropy_known_lm():
    import math

    import ray.data as rd

    from raygraph.ops.text import bigram_cross_entropy

    ds = rd.from_items([
        {"doc_id": 0, "text": "a b a b c"},
        {"doc_id": 1, "text": "a b"},
        {"doc_id": 2, "text": "x"},          # no bigrams -> absent
        {"doc_id": 3, "text": "   "},        # empty -> absent
    ])
    rows = {r["doc_id"]: (r["n_bg"], r["ce_e6"])
            for r in bigram_cross_entropy(ds).take_all()}
    # LM: c(a,b)=3 c(b,a)=1 c(b,c)=1; hist a: c1h=3 fw=1; b: c1h=2 fw=2
    t_ab = math.floor(1_000_000 * math.log(4 / 4))          # 0
    t_ba = math.floor(1_000_000 * math.log(4 / 2))          # 693147
    t_bc = t_ba
    assert rows == {
        0: (4, (2 * t_ab + t_ba + t_bc) // 4),
        1: (1, t_ab),
    }


def test_domain_mixture_flattens_distribution():
    import math

    import ray.data as rd

    from raygraph.ops.text import domain_mixture

    ds = rd.from_items(
        [{"source": "big", "text": "w " * 99 + "w"}] * 16    # 1600 tok
        + [{"source": "small", "text": "a b c d"}] * 4)      # 16 tok
    t = domain_mixture(ds)
    rows = {r["source"]: r for r in t.to_pylist()}
    assert rows["big"]["n_tokens"] == 1600
    assert rows["small"]["n_tokens"] == 16
    s_big = math.floor(1_000_000 * math.sqrt(1600))
    s_small = math.floor(1_000_000 * math.sqrt(16))
    tot = s_big + s_small
    assert rows["big"]["weight_bp"] == (10_000 * s_big) // tot
    assert rows["small"]["weight_bp"] == (10_000 * s_small) // tot
    # alpha=1/2 flattening: sqrt weighting gives small MORE than its
    # natural token share (1%) — here 1/11 of the mix
    assert rows["small"]["weight_bp"] > 100


def test_gopher_rules_each_rule_fires():
    import ray.data as rd

    from raygraph.ops.text import gopher_rules

    good = "the quick brown fox and that dog have fun with logs " * 5
    docs = [
        {"doc_id": 0, "text": good},                       # passes all
        {"doc_id": 1, "text": "the of and that"},          # too short
        {"doc_id": 2, "text": ("aaaaaaaaaaaaaaaa " * 60)   # wlen > 10
                              + "the of"},
        {"doc_id": 3, "text": ("1 2 3 4 5 6 7 8 9 0 " * 6) # alpha < .8
                              + "the of and that have with be to "
                              + "of the and that"},
        {"doc_id": 4, "text": "word " * 60},               # no stopwords
        {"doc_id": 5, "text": "\n".join(                   # all bullets
            f"- the of and item {i}" for i in range(12))},
        {"doc_id": 6, "text": ""},                         # empty
    ]
    rows = {r["doc_id"]: r for r in
            gopher_rules(rd.from_items(docs)).take_all()}
    assert rows[0]["pass_all"] == 1
    assert rows[1]["fail_tok"] == 1
    assert rows[2]["fail_wlen"] == 1 and rows[2]["fail_tok"] == 0
    assert rows[3]["fail_alpha"] == 1 and rows[3]["fail_stop"] == 0
    assert rows[4]["fail_stop"] == 1 and rows[4]["fail_alpha"] == 0
    assert rows[5]["fail_bullet"] == 1
    assert rows[6]["fail_tok"] == 1 and rows[6]["fail_wlen"] == 1 \
        and rows[6]["fail_alpha"] == 1 and rows[6]["pass_all"] == 0


def test_c4_line_stats_rules():
    import ray.data as rd

    from raygraph.ops.text import c4_line_stats

    docs = [
        {"doc_id": 0, "text": "One. Two! Three?\nKept line.\nno punct"},
        {"doc_id": 1, "text": "Short. Only two sentences."},
        {"doc_id": 2, "text": "Has brace {x}. More. And more. End."},
        {"doc_id": 3, "text": "Lorem Ipsum dolor. Sit. Amet. Yes."},
        {"doc_id": 4, "text": 'Quote line ends "\nA. B. C.'},
    ]
    rows = {r["doc_id"]: r for r in
            c4_line_stats(rd.from_items(docs)).take_all()}
    assert rows[0]["n_lines"] == 3 and rows[0]["n_kept"] == 2
    assert rows[0]["n_sentences"] == 4 and rows[0]["pass_all"] == 1
    assert rows[1]["n_sentences"] == 2 and rows[1]["pass_all"] == 0
    assert rows[2]["fail_brace"] == 1 and rows[2]["pass_all"] == 0
    assert rows[3]["fail_lorem"] == 1 and rows[3]["pass_all"] == 0
    assert rows[4]["n_kept"] == 2 and rows[4]["pass_all"] == 1


def test_nb_classifier_learns_and_is_layout_deterministic(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.classify import nb_fit, nb_score

    # two clearly separable vocabularies + one shared noise token
    spam = ["buy cheap pills now", "cheap cheap offer buy",
            "offer pills now buy cheap"]
    ham = ["meeting notes agenda review", "review the agenda notes",
           "notes from the meeting review"]
    df = pd.DataFrame({
        "doc_id": range(6),
        "text": spam + ham,
        "label": ["spam"] * 3 + ["ham"] * 3,
    })
    ds = rd.from_pandas(df).repartition(3)
    ll, pr, vocab = nb_fit(ds, vocab_size=32)
    # dense grid: every class × vocab cell present, smoothed cells < 0
    assert len(ll) == 2 * len(vocab)
    assert (ll["ll_e6"] < 0).all()
    got = nb_score(rd.from_pandas(df[["doc_id", "text"]]), ll, pr) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["pred"].tolist() == ["spam"] * 3 + ["ham"] * 3
    # integer spec ⇒ identical model and scores at any block layout
    ll2, pr2, _ = nb_fit(rd.from_pandas(df).repartition(1), vocab_size=32)
    assert ll.equals(ll2) and pr.equals(pr2)
    again = nb_score(rd.from_pandas(df[["doc_id", "text"]]).repartition(5),
                     ll2, pr2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.equals(again)


def test_winnow_matches_bruteforce_and_guarantee():
    import hashlib

    import pyarrow as pa

    from raygraph.ops.text import winnow_fingerprints

    def brute(text, n=3, w=4):
        toks = text.strip().lower().split()
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        gh = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
              for g in grams]
        m = len(gh)
        sel = set()
        if 0 < m < w:
            ends = [m]
        else:
            ends = range(w, m + 1)
        for e in ends:                      # 1-based window end
            s = max(1, e - w + 1)
            win = [(gh[p - 1], -p) for p in range(s, e + 1)]
            hmin, negp = min(win)
            sel.add((-negp, hmin))
        return len(sel), sum(h for _, h in sel) % 10**15

    rng = __import__("numpy").random.RandomState(2)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    texts = [" ".join(rng.choice(words, rng.randint(0, 30)))
             for _ in range(50)] + ["", "one two", "a b c"]
    b = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = winnow_fingerprints(b).to_pandas().set_index("doc_id")
    for i, t in enumerate(texts):
        nf, ck = brute(t)
        assert out.loc[i, "n_fp"] == nf, (i, t)
        assert out.loc[i, "fp_cksum"] == ck, (i, t)
    # the winnowing guarantee: two docs sharing a run of w+n-1 tokens
    # share at least one fingerprint HASH
    shared = "lorem ipsum dolor sit amet consetetur"   # 6 = 4+3-1 tokens
    pair = pa.table({
        "doc_id": [0, 1],
        "text": ["xx yy " + shared + " zz qq ww",
                 "aa bb cc dd " + shared + " ee"],
    })
    # recompute selected hash sets via the brute reference
    def fpset(text, n=3, w=4):
        toks = text.strip().lower().split()
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        gh = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
              for g in grams]
        m = len(gh)
        out = set()
        for e in (range(w, m + 1) if m >= w else [m]):
            s = max(1, e - w + 1)
            out.add(min((gh[p - 1], -p) for p in range(s, e + 1))[0])
        return out
    a, c = (pair.column("text")[0].as_py(), pair.column("text")[1].as_py())
    assert fpset(a) & fpset(c)


def test_fit_stump_separable_and_brute(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.classify import fit_stump

    # perfectly separable at x <= 4
    df = pd.DataFrame({"x": [1, 2, 3, 4, 5, 6, 7, 8],
                       "y": [1, 1, 1, 1, 0, 0, 0, 0]})
    got = fit_stump(rd.from_pandas(df).repartition(3), "x", "y")
    assert got["threshold"][0] == 4
    assert got["nl"][0] == 4 and got["nr"][0] == 4
    assert got["s_e12"][0] == 10**12 * (16 * 4 + 16 * 4) // 16

    # brute-force agreement on a noisy case (ties -> smallest threshold)
    import numpy as np

    rng = np.random.default_rng(1)
    xs = rng.integers(0, 12, 200)
    ys = ((xs > 6).astype(int) ^ (rng.random(200) < 0.2)).astype(int)
    df2 = pd.DataFrame({"x": xs, "y": ys})
    got2 = fit_stump(rd.from_pandas(df2).repartition(7), "x", "y")

    def brute(df):
        best = None
        t1, tn = df["y"].sum(), len(df)
        for t in sorted(df["x"].unique()):
            m = df["x"] <= t
            nl, nr = int(m.sum()), int(tn - m.sum())
            if nr == 0:
                continue
            l1 = int(df.loc[m, "y"].sum())
            r1 = int(t1 - l1)
            num = (l1 * l1 + (nl - l1) ** 2) * nr \
                + (r1 * r1 + (nr - r1) ** 2) * nl
            key = (-(10**12 * num // (nl * nr)), t)
            if best is None or key < best:
                best = key
        return best[1], -best[0]

    bt, bs = brute(df2)
    assert got2["threshold"][0] == bt and got2["s_e12"][0] == bs


# ----------------------------------------------------------------- DSIR
def test_dsir_brute_force_reference():
    # independent replay of the whole formula on a 4-doc corpus
    import hashlib as _h
    import math

    import ray.data as rd

    from raygraph.ops.text import dsir_weights

    docs = [(0, "apple pie", "src0"), (1, "apple pie", "src1"),
            (2, "zebra zoo", "src1"), (3, "   ", "src1")]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _, _ in docs], pa.int64()),
        "text": [t for _, t, _ in docs],
        "source": [s for _, _, s in docs]}))
    got = {r["doc_id"]: (r["n_grams"], r["dsir_e6"])
           for r in dsir_weights(ds, dim=64).take_all()}

    def bucket(g):
        return int(_h.md5(g.encode()).hexdigest()[:15], 16) % 64

    grams = {}  # doc -> list of buckets
    for d, t, _s in docs:
        toks = t.strip().lower().split()
        gs = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        grams[d] = [bucket(g) for g in gs]
    ct, cr = {}, {}
    for d, bs in grams.items():
        for b in bs:
            cr[b] = cr.get(b, 0) + 1
            if d == 0:
                ct[b] = ct.get(b, 0) + 1
    nt, nr = sum(ct.values()), sum(cr.values())
    want = {}
    for d, bs in grams.items():
        if not bs:
            continue  # empty doc absent
        tot = sum(math.floor(1_000_000 * math.log(
            ((ct.get(b, 0) + 1) * (nr + 64))
            / ((cr[b] + 1) * (nt + 64)))) for b in bs)
        want[d] = (len(bs), tot)
    assert got == want
    # the exact-duplicate of the target doc must outscore the disjoint one
    assert got[1][1] > got[2][1]


def test_dsir_layout_deterministic():
    import ray.data as rd

    from raygraph.ops.text import dsir_weights

    t = pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": [f"tok{i % 7} tok{i % 3} shared word" for i in range(40)],
        "source": [f"src{i % 4}" for i in range(40)]})
    a = dsir_weights(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = dsir_weights(rd.from_arrow(t).repartition(7)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_contamination_distributed_equiv_broadcast(ray_session):
    import numpy as np
    import ray.data as rd

    from raygraph.ops.text import (bench_ngram_set, contamination_counts,
                                   contamination_counts_distributed)

    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(1, 25)))
             for _ in range(60)]
    df = pd.DataFrame({"doc_id": range(60), "text": texts})
    ds = rd.from_pandas(df).repartition(5)
    bench_ds = rd.from_pandas(df.head(8)).repartition(3)

    bset = bench_ngram_set(rd.from_pandas(df.head(8)), n=3)
    a = contamination_counts(ds, bset, n=3).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    b = contamination_counts_distributed(ds, bench_ds, n=3).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    cols = ["doc_id", "n_grams", "n_contaminated"]
    pd.testing.assert_frame_equal(a[cols], b[cols])


def test_contamination_distributed_empty_bench(ray_session):
    import ray.data as rd

    from raygraph.ops.text import contamination_counts_distributed

    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a b c d", "x y z w"]})
    empty = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "text": pd.Series([], dtype=object)}))
    out = contamination_counts_distributed(
        rd.from_pandas(df), empty, n=3).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert out["n_contaminated"].tolist() == [0, 0]
    assert out["n_grams"].tolist() == [2, 2]


def test_quality_prune_per_group_budget(ray_session):
    import ray.data as rd

    from raygraph.ops.text import quality_prune, quality_score

    # group "a": long good docs + junk; group "b": all mediocre —
    # each group must keep its OWN top mass, so "b" survivors exist
    # even though every "b" doc scores below "a"'s best
    good = "the quick brown fox jumps over a lazy dog " * 20
    junk = "!!! ??? ***"
    mid = "some plain words here"
    df = pd.DataFrame({
        "doc_id": range(8),
        "text": [good, good, good, junk, mid, mid, mid, mid],
        "lang": ["a"] * 4 + ["b"] * 4,
    })
    out = quality_prune(rd.from_pandas(df).repartition(3), q_pct=50) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    assert set(out["lang"]) == {"a", "b"}          # both groups survive
    assert 3 not in set(out["doc_id"])             # junk pruned from a
    # survivors' scores reach their group threshold exactly (ties kept)
    sc = quality_score(
        pa.table({"doc_id": pa.array(df["doc_id"], pa.int64()),
                  "text": pa.array(df["text"], pa.string())}))
    import numpy as np
    q_e4 = np.rint(sc.column("quality").to_numpy() * 10000).astype("int64")
    for lang in ("a", "b"):
        grp = df[df["lang"] == lang]["doc_id"].to_numpy()
        vals = sorted(q_e4[grp])
        import math
        thr = vals[int(np.searchsorted(np.arange(1, len(vals) + 1),
                                       max(1, math.ceil(0.5 * len(vals)))))]
        kept = set(out[out["lang"] == lang]["doc_id"])
        want = {int(d) for d in grp if q_e4[d] >= thr}
        assert kept == want


def test_quality_prune_layout_invariant(ray_session):
    import numpy as np
    import ray.data as rd

    from raygraph.ops.text import quality_prune

    rng = np.random.RandomState(11)
    vocab = ["the", "a", "of", "word", "text!", "zz", "plain", "longer"]
    df = pd.DataFrame({
        "doc_id": range(50),
        "text": [" ".join(rng.choice(vocab, size=rng.randint(2, 60)))
                 for _ in range(50)],
        "lang": rng.choice(["x", "y"], size=50),
    })
    outs = []
    for nparts in (1, 7):
        out = quality_prune(rd.from_pandas(df).repartition(nparts),
                            q_pct=40).to_pandas() \
            .sort_values("doc_id", ignore_index=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
