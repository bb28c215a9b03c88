"""Text-analysis operators for large-scale training-data pipelines.

All are stateless vectorized ``map_batches`` stages over a ``text`` column
(pandas string kernels / numpy). Where a DuckDB oracle exists
(``__ray_entry__.py``), the Python semantics are defined to match the SQL
exactly (token = maximal run of non-whitespace, etc.).
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa

_TOKEN = re.compile(r"\S+")
# ASCII classes so the DuckDB (RE2) oracle computes the identical count;
# non-ASCII letters count as "punctuation" under this contract — a
# documented heuristic tradeoff, consistent on both sides
_PUNCT = re.compile(r"[^\w\s]", re.ASCII)

# rolling-hash fingerprint constants (shared with the SQL oracle):
# token hash = first 60 bits of md5; Horner fold h = (h*F + th) mod 2^63
FP_INIT = 1469598103934665603          # FNV-1a 64 offset, < 2^63
FP_MULT = 1099511628211                # FNV prime
_FP_MASK = np.uint64((1 << 63) - 1)

# small per-language stopword profiles for the n-gram/stopword heuristic
STOPWORDS: dict[str, frozenset] = {
    "en": frozenset("the a of to and in is it you that was for on are with as i his they be at".split()),
    "fr": frozenset("le la les de des un une et en est que qui dans pour sur avec ne pas au du".split()),
    "de": frozenset("der die das und ist in den von zu mit sich des auf für nicht ein eine als auch es".split()),
    "es": frozenset("el la los las de un una y en es que no por con para su al lo como más".split()),
    "zh": frozenset("的 是 不 了 在 人 有 我 他 这 个 们 中 来 上 大 为 和 国".split()),
}


# GPT-2-flavored pre-tokenizer pattern, restricted to RE2-compatible
# syntax (no lookahead) and ASCII classes so DuckDB's regexp_extract_all
# counts the identical tokens (both engines use leftmost-first
# alternation): contraction suffixes, space-prefixed letter runs, digit
# runs, punctuation runs.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]{1,3}| ?[^\sA-Za-z0-9]+"
_BPE = re.compile(BPE_PATTERN, re.ASCII)


def bpe_token_count(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """BPE-ish token count: number of non-overlapping BPE_PATTERN matches
    (the pre-tokenization step of byte-pair encoders — the unit a
    training-data pipeline budgets by). Vectorized pandas str.count."""
    s = batch.column(text_col).to_pandas()
    n = s.str.count(_BPE).fillna(0).astype("int64")
    return pa.table({id_col: batch.column(id_col),
                     "n_bpe_tokens": pa.array(n, pa.int64())})


def token_count(batch: pa.Table, text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """tokens = maximal runs of non-whitespace (matches the SQL oracle:
    regexp_split_to_array(trim(text), '\\s+'))."""
    s = batch.column(text_col).to_pandas()
    n = s.str.count(_TOKEN).fillna(0).astype("int64")
    return pa.table({id_col: batch.column(id_col), "n_tokens": pa.array(n, pa.int64())})


def text_stats(batch: pa.Table, text_col: str = "text",
               id_col: str = "doc_id") -> pa.Table:
    """Per-doc quality stats: n_chars, n_tokens, n_unique_tokens, type-token
    ratio, mean token length. Ratios use floor-at-4dp
    (``floor(10000*x)/10000``) so the DuckDB oracle can reproduce them
    bit-exactly (round() tie-breaking differs between numpy and SQL)."""
    s = batch.column(text_col).to_pandas()
    trimmed = s.str.strip()
    n_chars = s.str.len().fillna(0).astype("int64")
    toks = trimmed.str.findall(_TOKEN)
    n_tok = toks.map(len).astype("int64")
    n_uniq = toks.map(lambda t: len(set(t))).astype("int64")
    safe = n_tok.replace(0, 1)
    ttr = np.floor(10000.0 * n_uniq / safe) / 10000.0
    mean_len = np.floor(10000.0 * toks.map(lambda t: sum(map(len, t))) / safe) / 10000.0
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_unique_tokens": pa.array(n_uniq, pa.int64()),
            "ttr": pa.array(ttr, pa.float64()),
            "mean_token_len": pa.array(mean_len, pa.float64()),
        }
    )


def _explode_tokens(toks: pd.Series):
    """(exploded token Series with doc index, per-doc token counts)."""
    ex = toks.explode().dropna()
    n_tok = toks.str.len().fillna(0).astype("int64")
    return ex, n_tok


def quality_score(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Heuristic document quality in [0, 1]: combines length band,
    punctuation ratio, stopword(en) ratio, type-token ratio.

    SQL-parity contract (the DuckDB oracle computes the identical value):
    tokens = lowercased whitespace tokens; punctuation = ASCII [^\\w\\s];
    quality = floor-at-4dp of
    0.35*min(n_chars/500,1) + 0.25*min(4*stop_ratio,1)
    + 0.2*uniq_ratio + 0.2*(1 - min(5*punct_ratio,1)).
    Fully vectorized: one token explode + isin + two groupby reductions.
    """
    s = batch.column(text_col).to_pandas().fillna("")
    n_chars = s.str.len().astype("int64")
    toks = s.str.lower().str.split()
    ex, n_tok = _explode_tokens(toks)
    idx = s.index
    stop_hits = (
        ex.isin(STOPWORDS["en"]).groupby(level=0).sum()
        .reindex(idx, fill_value=0).astype("int64")
    )
    n_uniq = (
        ex.groupby(level=0).nunique().reindex(idx, fill_value=0).astype("int64")
    )
    safe_tok = n_tok.replace(0, 1)
    stop_ratio = stop_hits / safe_tok
    uniq_ratio = n_uniq / safe_tok
    punct_ratio = s.str.count(_PUNCT) / n_chars.replace(0, 1)
    len_score = np.minimum(n_chars / 500.0, 1.0)
    score = (
        0.35 * len_score
        + 0.25 * np.minimum(stop_ratio * 4, 1.0)
        + 0.2 * uniq_ratio
        + 0.2 * (1 - np.minimum(punct_ratio * 5, 1.0))
    )
    score = np.floor(10000.0 * score) / 10000.0
    return pa.table(
        {
            id_col: batch.column(id_col),
            "quality": pa.array(score.astype("float64"), pa.float64()),
        }
    )


DEFAULT_LR_WEIGHTS = {"n_chars": 3, "n_tokens": -40, "n_punct": -25}
DEFAULT_LR_BIAS = -600


class LinearScorer:
    """Broadcast linear-model document scorer (the batched-inference
    pattern: weights live in the actor, loaded ONCE in ``__init__`` from
    the object store, applied vectorized per batch). Integer weights on
    integer features keep the logit exact, so a SQL oracle replays it:
    logit = bias + Σ w_f·feature_f over
    n_chars = length(text), n_tokens = whitespace tokens,
    n_punct = ASCII [^\\w\\s] count (the quality_score definitions);
    keep = logit > 0.

    Pass the ``ray.put`` ref of a weights dict — every actor reads the
    one copy instead of re-shipping weights per batch.
    """

    def __init__(self, weights_ref=None, bias: int = DEFAULT_LR_BIAS,
                 text_col: str = "text", id_col: str = "doc_id"):
        import ray

        w = (ray.get(weights_ref) if weights_ref is not None
             else DEFAULT_LR_WEIGHTS)
        self.w_chars = int(w["n_chars"])
        self.w_tokens = int(w["n_tokens"])
        self.w_punct = int(w["n_punct"])
        self.bias = int(bias)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch.column(self.text_col).to_pandas().fillna("")
        n_chars = s.str.len().astype("int64")
        n_tok = s.str.strip().str.findall(_TOKEN).str.len() \
            .fillna(0).astype("int64")
        n_punct = s.str.count(_PUNCT).astype("int64")
        logit = (self.bias + self.w_chars * n_chars
                 + self.w_tokens * n_tok + self.w_punct * n_punct)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "logit": pa.array(logit, pa.int64()),
            "keep": pa.array((logit > 0).astype("int64"), pa.int64()),
        })


def score_linear(ds, weights: dict | None = None,
                 bias: int = DEFAULT_LR_BIAS, concurrency: int = 4,
                 text_col: str = "text", id_col: str = "doc_id"):
    """Classifier-filter stage: :class:`LinearScorer` as an actor pool —
    weights broadcast once via ``ray.put``, scoring vectorized per
    batch."""
    import ray

    ref = ray.put(dict(weights or DEFAULT_LR_WEIGHTS))
    return ds.map_batches(
        LinearScorer, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"weights_ref": ref, "bias": bias,
                               "text_col": text_col, "id_col": id_col})


def lang_id(batch: pa.Table, text_col: str = "text",
            id_col: str = "doc_id") -> pa.Table:
    """Stopword-profile language ID: argmax over per-language stopword hit
    counts; 'und' (undetermined) when nothing hits; ties break to the
    first language in STOPWORDS order (= numpy argmax-first, mirrored by
    the SQL oracle's >= cascade). Tokens = lowercased whitespace tokens
    (SQL-parity). Vectorized: one explode, one isin per language, one
    groupby-sum, one argmax — no per-row Python."""
    s = batch.column(text_col).to_pandas().fillna("")
    langs = list(STOPWORDS)
    toks = s.str.lower().str.split()
    ex, _ = _explode_tokens(toks)
    idx = s.index
    if len(ex):
        hits = pd.DataFrame({lg: ex.isin(STOPWORDS[lg]) for lg in langs})
        scores = hits.groupby(level=0).sum().reindex(idx, fill_value=0)
    else:
        scores = pd.DataFrame(0, index=idx, columns=langs)
    vals = scores.to_numpy()
    best = np.argmax(vals, axis=1)          # first max wins
    pred = np.where(vals.max(axis=1) > 0,
                    np.array(langs, dtype=object)[best], "und")
    return pa.table({id_col: batch.column(id_col),
                     "lang_pred": pa.array(pred, pa.string())})


def token_hash60(token: str) -> int:
    """First 60 bits of md5 — computable in SQL as
    ``('0x' || substr(md5(t), 1, 15))::BIGINT``."""
    return int(hashlib.md5(token.encode()).hexdigest()[:15], 16)


def doc_fingerprint(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """Deterministic 63-bit rolling-hash fingerprint over the token
    sequence (order-sensitive, process-stable).

    h = FP_INIT; per token: h = (h * FP_MULT + token_hash60(t)) mod 2^63 —
    exactly what the SQL oracle folds with list_reduce. Vectorized via the
    power-sum form  h = INIT*F^n + Σ th_i · F^(n-1-i)  computed in uint64
    wraparound arithmetic (exact mod 2^63 because 2^63 | 2^64): md5 runs
    once per UNIQUE token per batch, everything else is numpy.
    """
    s = batch.column(text_col).to_pandas().fillna("")
    toks = s.str.findall(_TOKEN)
    lens = toks.str.len().fillna(0).astype("int64").to_numpy()
    n_docs = len(lens)
    total = int(lens.sum())
    max_n = int(lens.max()) if n_docs else 0

    # F^0..F^max_n in uint64 wraparound — multiply.accumulate is an
    # ARRAY op, so the intentional mod-2^64 wrap is silent (a scalar
    # uint64*uint64 loop emits numpy's overflow RuntimeWarning on every
    # run, drowning real warnings)
    fpow = np.full(max_n + 1, FP_MULT, dtype=np.uint64)
    fpow[0] = 1
    np.multiply.accumulate(fpow, out=fpow)

    if total:
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        uniq, inv = np.unique(flat.astype(str), return_inverse=True)
        uhash = np.fromiter((token_hash60(t) for t in uniq),
                            dtype=np.uint64, count=len(uniq))
        th = uhash[inv]
        starts = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
        rev = np.repeat(lens, lens) - 1 - pos
        terms = th * fpow[rev]
        # clip: a trailing empty doc has start == total (out of range for
        # reduceat); its bogus sum is zeroed by the mask below
        sums = np.add.reduceat(terms, np.minimum(starts, total - 1))
        sums[lens == 0] = 0  # reduceat repeats neighbors for empty segments
    else:
        sums = np.zeros(n_docs, dtype=np.uint64)
    h = (np.uint64(FP_INIT) * fpow[lens] + sums) & _FP_MASK
    return pa.table({id_col: batch.column(id_col),
                     "fingerprint": pa.array(h.view(np.int64), pa.int64())})


def _winnow_core(batch: pa.Table, n: int, window: int, text_col: str):
    """Shared winnowing kernel: returns ``(gdoc, gh, sel)`` — the flat
    gram→doc-row index, the md5-60bit gram hashes, and the selection
    mask (see :func:`winnow_fingerprints` for the exact spec)."""
    import hashlib as _h

    s = batch.column(text_col).to_pandas().fillna("")
    n_docs = len(s)
    toks = s.str.strip().str.lower().str.split()
    counts = toks.str.len().fillna(0).astype(int).to_numpy()
    ft = pd.Series(toks.explode().dropna().to_numpy(dtype=object))
    doc_flat = np.repeat(np.arange(n_docs, dtype=np.int64), counts)

    gram = ft
    for j in range(1, n):
        gram = gram + " " + ft.shift(-j)
    ok = np.zeros(len(ft), dtype=bool)
    if len(ft) >= n:
        ok[: len(ft) - (n - 1)] = (doc_flat[: len(ft) - (n - 1)]
                                   == doc_flat[n - 1:])
    gdoc = doc_flat[ok]
    gvals = gram.to_numpy(dtype=object)[ok]
    uniq, inv = np.unique(gvals.astype(str), return_inverse=True) \
        if len(gvals) else (np.array([], dtype=str),
                            np.array([], dtype=np.int64))
    uh = np.fromiter(
        (int(_h.md5(g.encode()).hexdigest()[:15], 16) for g in uniq),
        dtype=np.int64, count=len(uniq))
    gh = uh[inv] if len(gvals) else np.array([], dtype=np.int64)

    sel = np.zeros(len(gh), dtype=bool)
    m_per_doc = np.bincount(gdoc, minlength=n_docs) \
        if len(gh) else np.zeros(n_docs, dtype=np.int64)
    if len(gh) >= window:
        W = np.lib.stride_tricks.sliding_window_view(gh, window)
        valid = gdoc[: len(gh) - window + 1] == gdoc[window - 1:]
        j = window - 1 - np.argmin(W[:, ::-1], axis=1)
        picks = np.arange(len(W), dtype=np.int64)[valid] + j[valid]
        sel[picks] = True
    # short docs (0 < m < window): rightmost min over the whole doc
    short = (m_per_doc > 0) & (m_per_doc < window)
    if short.any():
        idx = np.flatnonzero(short[gdoc])
        order = np.lexsort((-idx, gh[idx]))       # hash ASC, pos DESC
        picked = pd.DataFrame({"d": gdoc[idx[order]],
                               "i": idx[order]}) \
            .drop_duplicates("d", keep="first")["i"].to_numpy()
        sel[picked] = True
    return gdoc, gh, sel


def winnow_fp_rows(batch: pa.Table, n: int = 3, window: int = 4,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> pa.Table:
    """Exploded winnowing fingerprints: one row per DISTINCT selected
    (doc, fp-hash) — the posting-list form that feeds bucketed dedup
    (same exchange shape as a minhash band table)."""
    gdoc, gh, sel = _winnow_core(batch, n, window, text_col)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    df = pd.DataFrame({id_col: ids[gdoc[sel]], "fp": gh[sel]}) \
        .drop_duplicates()
    return pa.table({
        id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
        "fp": pa.array(df["fp"].to_numpy(), pa.int64()),
    })


def winnow_fingerprints(batch: pa.Table, n: int = 3, window: int = 4,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: local algorithms for document fingerprinting",
    SIGMOD 2003) — the guarantee-bearing upgrade of
    :func:`doc_fingerprint`: any shared run of ``window + n - 1``
    tokens between two documents shares at least one fingerprint.

    Spec (SQL-replayable term for term):

    * grams  — word ``n``-grams of the lowercased whitespace tokens,
      space-joined, at 1-based gram positions 1..m;
    * hash   — the md5-60bit string hash used repo-wide;
    * windows — every ``window`` consecutive gram positions; a doc
      with 0 < m < window has ONE window (all its grams);
    * selection — per window the minimal hash, ties → RIGHTMOST
      (hash ASC, pos DESC); fingerprint set = distinct selected
      (pos, hash);
    * output — per doc: ``n_fp`` and ``fp_cksum`` = exact Python-int
      sum of selected hashes mod 10^15 (HUGEINT-safe in the oracle).

    Vectorized: grams via shifted pandas concat, one md5 per UNIQUE
    gram per batch, full windows via one sliding_window_view with
    boundary masking (rightmost argmin = reversed argmin), short docs
    via one lexsort-groupby. Per-doc operator ⇒ no exchange at all.
    """
    n_docs = batch.num_rows
    gdoc, gh, sel = _winnow_core(batch, n, window, text_col)
    n_fp = np.bincount(gdoc[sel], minlength=n_docs).astype("int64")
    ck = pd.Series(gh[sel].astype(object)).groupby(
        pd.Series(gdoc[sel])).sum() if sel.any() else pd.Series(dtype=object)
    cksum = np.zeros(n_docs, dtype="int64")
    for d, v in ck.items():
        cksum[int(d)] = int(v) % 10**15
    return pa.table({
        id_col: batch.column(id_col),
        "n_fp": pa.array(n_fp, pa.int64()),
        "fp_cksum": pa.array(cksum, pa.int64()),
    })


def build_vocab(ds, size: int = 64, text_col: str = "text") -> pd.DataFrame:
    """Tokenizer FIT: top-``size`` whitespace tokens by corpus frequency
    (ties → token ASC) with contiguous ids 0..size-1 assigned in
    (count DESC, token ASC) order. Vectorized explode → per-batch
    partial counts → one vocab-bounded groupby; the returned frame is
    vocab-sized (the broadcast small side of :func:`encode_tokens`),
    never the corpus."""
    from .relational import preagg_sum

    def token_counts(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        toks = s.str.strip().str.lower().str.split().explode().dropna()
        g = toks.value_counts().rename_axis("token").reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = preagg_sum(ds.map_batches(token_counts, batch_format="pyarrow"),
                     ["token"], {"n": "n"})
    df = agg.to_pandas().sort_values(["n", "token"],
                                     ascending=[False, True]).head(size)
    df = df.reset_index(drop=True)
    df["token_id"] = np.arange(len(df), dtype="int64")
    return df[["token", "token_id", "n"]]


def encode_tokens(ds, vocab: pd.DataFrame, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Tokenizer TRANSFORM: per-doc encoding summary under ``vocab`` —
    n_tokens, n_oov (tokens outside the vocab) and sum_ids (sum of
    in-vocab token ids; the exact-integer checksum of the id sequence).
    The vocab dict rides the task closure (broadcast once per worker);
    token→id is one vectorized ``Series.map``. Docs with zero tokens
    emit no row (mirrors the SQL unnest join)."""
    mapping = dict(zip(vocab["token"], vocab["token_id"]))

    def encode(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).to_pandas()
        toks = s.str.strip().str.lower().str.split()
        ex = pd.DataFrame({id_col: ids.repeat(toks.str.len().fillna(0)
                                              .astype(int)),
                           "token": toks.explode().dropna()})
        ex["tid"] = ex["token"].map(mapping)
        ex["is_oov"] = ex["tid"].isna().astype("int64")
        ex["tid0"] = ex["tid"].fillna(0).astype("int64")
        g = ex.groupby(id_col, as_index=False).agg(
            n_tokens=("token", "size"),
            n_oov=("is_oov", "sum"),
            sum_ids=("tid0", "sum"),
        )
        for c in ("n_tokens", "n_oov", "sum_ids"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    return ds.map_batches(encode, batch_format="pyarrow")


# ----------------------------------------------------------------- PII
# ASCII-only, RE2-compatible patterns (no lookaround, explicit classes)
# so DuckDB's regexp_* computes identical matches — the same discipline
# as BPE_PATTERN above.
EMAIL_PATTERN = r"[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+"
PHONE_PATTERN = r"\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"
_EMAIL = re.compile(EMAIL_PATTERN, re.ASCII)
_PHONE = re.compile(PHONE_PATTERN, re.ASCII)


def pii_scrub(batch: pa.Table, text_col: str = "text",
              id_col: str = "doc_id") -> pa.Table:
    """PII detection + redaction: count and mask email addresses and
    phone-shaped numbers (the mandatory scrub step of a training-data
    pipeline). Counts are taken on the ORIGINAL text; redaction replaces
    emails first, then phones (the placeholders contain no digits or
    '@', so the passes cannot interact). Vectorized pandas str kernels;
    contract matched bit-for-bit by the DuckDB regexp_replace oracle."""
    s = batch.column(text_col).to_pandas().fillna("")
    n_em = s.str.count(_EMAIL).astype("int64")
    n_ph = s.str.count(_PHONE).astype("int64")
    clean = s.str.replace(_EMAIL, "<EMAIL>", regex=True)
    clean = clean.str.replace(_PHONE, "<PHONE>", regex=True)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_emails": pa.array(n_em, pa.int64()),
            "n_phones": pa.array(n_ph, pa.int64()),
            "clean_text": pa.array(clean, pa.string()),
        }
    )


# ----------------------------------------------------- n-gram utilities
def _doc_ngrams(s: pd.Series, n: int) -> pd.DataFrame:
    """Per-row word n-grams, fully vectorized: one explode + (n-1)
    groupby-level shifts. Returns a frame indexed by original row
    position with a single ``ngram`` column (space-joined); rows with
    fewer than n tokens contribute nothing."""
    toks = s.fillna("").str.strip().str.lower().str.split()
    ex = toks.explode().dropna()
    if not len(ex):
        return pd.DataFrame({"ngram": pd.Series([], dtype=object)})
    parts = [ex]
    g = ex.groupby(level=0)
    for i in range(1, n):
        parts.append(g.shift(-i))
    out = parts[0].str.cat(parts[1:], sep=" ")  # NaN shift → NaN row
    return out.dropna().rename("ngram").to_frame()


def contamination_counts(ds, bench_ngrams, n: int = 3,
                         text_col: str = "text", id_col: str = "doc_id"):
    """Benchmark-contamination check: per document, how many of its word
    n-grams appear in a benchmark n-gram set (the standard eval-leakage
    filter for training corpora). ``bench_ngrams`` is the SMALL side —
    build it once, pass it by value; it rides the serialized task
    closure to each worker exactly once per worker process (for
    multi-GB benchmark sets switch to ``ray.put`` + a ref, the linker
    pattern in ops/link.py). Documents with fewer than n tokens emit no
    row (mirrors the SQL window-join shape)."""
    bench = frozenset(bench_ngrams)

    def per_batch(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas()
        ids = batch.column(id_col).to_pandas()
        grams = _doc_ngrams(s, n)
        if not len(grams):
            return pa.table({id_col: pa.array([], batch.schema.field(id_col).type),
                             "n_grams": pa.array([], pa.int64()),
                             "n_contaminated": pa.array([], pa.int64())})
        grams["hit"] = grams["ngram"].isin(bench).astype("int64")
        agg = grams.groupby(level=0).agg(n_grams=("ngram", "size"),
                                         n_contaminated=("hit", "sum"))
        agg[id_col] = ids.loc[agg.index].to_numpy()
        agg = agg.reset_index(drop=True)[[id_col, "n_grams", "n_contaminated"]]
        for c in ("n_grams", "n_contaminated"):
            agg[c] = agg[c].astype("int64")
        return pa.Table.from_pandas(agg, preserve_index=False)

    return ds.map_batches(per_batch, batch_format="pyarrow")


def bench_ngram_set(ds, n: int = 3, text_col: str = "text") -> frozenset:
    """Distinct word n-grams of a (small, pre-filtered) benchmark
    Dataset, collected to the driver — the broadcast side of
    :func:`contamination_counts`. Per-batch dedup bounds what crosses
    the wire to the per-block distinct set."""
    def distinct(batch: pa.Table) -> pa.Table:
        grams = _doc_ngrams(batch.column(text_col).to_pandas(), n)
        u = grams["ngram"].drop_duplicates() if len(grams) else pd.Series([], dtype=object)
        return pa.table({"ngram": pa.array(u, pa.string())})

    out = set()
    for b in ds.map_batches(distinct, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        out.update(b.column("ngram").to_pylist())
    return frozenset(out)


def boilerplate_stats(ds, n: int = 5, df_min: int = 5,
                      text_col: str = "text", id_col: str = "doc_id",
                      num_buckets: int = 128):
    """Cross-document boilerplate screen (the CommonCrawl header/footer
    filter): per document, the fraction of its word n-gram occurrences
    whose n-gram appears in ≥ ``df_min`` documents corpus-wide, in
    exact basis points.

    ONE ngram-keyed exchange computes exact document frequency (every
    (doc, ngram, occ) row of an ngram meets in its bucket) and tags
    each row's occurrences as boilerplate or not; a doc-keyed combiner
    sum then folds the tagged rows back to one row per document. The
    exchange carries the per-(doc, ngram) distinct rows — the honest
    cost of EXACT df; the sketch path for 100 TB is the count-min
    stage (``text_cms_counts``), which needs no shuffle at all. Docs
    with fewer than n tokens emit nothing (mirrors the SQL shape)."""
    import pyarrow.compute as pc

    from .relational import hash_aggregate, preagg_sum

    def ngram_rows(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas()
        ids = batch.column(id_col).to_pandas()
        grams = _doc_ngrams(s, n)
        if not len(grams):
            return pa.table({
                id_col: pa.array([], batch.schema.field(id_col).type),
                "ngram": pa.array([], pa.string()),
                "occ": pa.array([], pa.int64())})
        grams[id_col] = ids.loc[grams.index].to_numpy()
        agg = grams.groupby([id_col, "ngram"], as_index=False).size() \
            .rename(columns={"size": "occ"})
        agg["occ"] = agg["occ"].astype("int64")
        return pa.Table.from_pandas(agg, preserve_index=False)

    def tag_df(df: pd.DataFrame) -> pd.DataFrame:
        dfc = df.groupby("ngram")[id_col].transform("size")
        boiler = df["occ"].where(dfc >= df_min, 0).astype("int64")
        out = pd.DataFrame({id_col: df[id_col], "n_grams": df["occ"],
                            "n_boiler": boiler})
        return out.groupby(id_col, as_index=False).sum()

    tagged = hash_aggregate(
        ds.map_batches(ngram_rows, batch_format="pyarrow"),
        ["ngram"], tag_df, num_buckets=num_buckets)
    per_doc = preagg_sum(tagged, [id_col],
                         {"n_grams": "n_grams", "n_boiler": "n_boiler"})

    def finish(batch: pa.Table) -> pa.Table:
        bp = pc.divide(pc.multiply(batch.column("n_boiler"),
                                   pa.scalar(10_000, pa.int64())),
                       batch.column("n_grams"))
        return batch.append_column("boiler_bp", bp)

    return per_doc.map_batches(finish, batch_format="pyarrow")


def repetition_stats(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Gopher-style repetition quality signals: per document, the number
    of word 2-grams, the count of the most frequent 2-gram, and its
    share of all 2-grams (floor-at-4dp, the repo-wide SQL-parity ratio
    contract). High top_share = boilerplate/spam. Documents with < 2
    tokens emit no row. One explode + one groupby-size + one max —
    no per-row Python."""
    s = batch.column(text_col).to_pandas()
    ids = batch.column(id_col).to_pandas()
    grams = _doc_ngrams(s, 2)
    if not len(grams):
        return pa.table({id_col: pa.array([], batch.schema.field(id_col).type),
                         "n_2grams": pa.array([], pa.int64()),
                         "max_2gram_n": pa.array([], pa.int64()),
                         "top_share": pa.array([], pa.float64())})
    counts = grams.groupby([grams.index, "ngram"]).size()
    per_doc = counts.groupby(level=0).agg(["sum", "max"])
    share = np.floor(10000.0 * per_doc["max"] / per_doc["sum"]) / 10000.0
    return pa.table(
        {
            id_col: pa.array(ids.loc[per_doc.index], batch.schema.field(id_col).type),
            "n_2grams": pa.array(per_doc["sum"].astype("int64"), pa.int64()),
            "max_2gram_n": pa.array(per_doc["max"].astype("int64"), pa.int64()),
            "top_share": pa.array(share.astype("float64"), pa.float64()),
        }
    )


def pack_sequences(ds, budget: int, order_col: str = "doc_id",
                   text_col: str = "text", id_col: str = "doc_id",
                   n_tiles: int = 32):
    """Concat-and-split sequence packing: documents are laid out in
    ``order_col`` order as one virtual token stream and cut into
    fixed-``budget`` context windows; each doc is assigned the pack its
    FIRST token falls in (pack_id = floor(global_token_offset/budget))
    — how training pipelines pack after concatenating a shuffled
    corpus. Distributed via :func:`raygraph.ops.relational.
    ordered_prefix_sum` (two-phase scan; only n_tiles scalars touch the
    driver). Output: (id, n_tokens, pack_id, offset_in_pack)."""
    from .relational import ordered_prefix_sum

    def counted_fn(batch: pa.Table) -> pa.Table:
        t = token_count(batch, text_col, id_col)
        # token_count projects to (id, n_tokens); a non-id order_col
        # (e.g. an epoch_shuffle position) must ride along row-aligned
        if order_col != id_col:
            t = t.append_column(order_col, batch.column(order_col))
        return t

    counted = ds.map_batches(counted_fn, batch_format="pyarrow")
    scanned = ordered_prefix_sum(counted, order_col, "n_tokens",
                                 n_tiles=n_tiles, out="__off")

    def finish(batch: pa.Table) -> pa.Table:
        off = batch.column("__off").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": batch.column("n_tokens"),
                "pack_id": pa.array(off // budget, pa.int64()),
                "offset_in_pack": pa.array(off % budget, pa.int64()),
            }
        )

    return scanned.map_batches(finish, batch_format="pyarrow")


def extract_matches(ds, pattern: str, text_col: str = "text",
                    id_col: str = "doc_id", out: str = "match"):
    """Flat-map regex mining: every non-overlapping match of ``pattern``
    becomes its own output row (id, match) — URL/email/entity mining
    over a corpus. Vectorized ``str.findall`` + explode; rows with no
    match emit nothing. Patterns should stick to the RE2-compatible
    ASCII discipline (see EMAIL_PATTERN) when an SQL oracle needs to
    reproduce the match set."""
    rx = re.compile(pattern, re.ASCII)

    def fn(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).to_pandas()
        m = s.str.findall(rx).explode().dropna()
        return pa.table({
            id_col: pa.array(ids.loc[m.index],
                             batch.schema.field(id_col).type),
            out: pa.array(m, pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def chunk_documents(ds, chunk_tokens: int = 64, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Split every document into consecutive ``chunk_tokens``-token
    chunks (whitespace-normalized text reassembly) — the RAG/window
    chunking step. Flat-map fan-out: one doc row → ceil(n/chunk) chunk
    rows, all within the doc's batch (no shuffle). Vectorized explode +
    cumcount; the per-chunk string join is the output itself. Docs with
    zero tokens emit no row."""
    def fn(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).to_pandas()
        toks = s.str.strip().str.split()
        ex = toks.explode().dropna()
        if not len(ex):
            return pa.table({
                id_col: pa.array([], batch.schema.field(id_col).type),
                "chunk_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
            })
        pos = ex.groupby(level=0).cumcount()
        df = pd.DataFrame({
            id_col: ids.loc[ex.index].to_numpy(),
            "chunk_id": (pos // chunk_tokens).astype("int64").to_numpy(),
            "token": ex.to_numpy(),
        })
        g = df.groupby([id_col, "chunk_id"], as_index=False).agg(
            n_tokens=("token", "size"), chunk_text=("token", " ".join))
        g["n_tokens"] = g["n_tokens"].astype("int64")
        return pa.Table.from_pandas(
            g[[id_col, "chunk_id", "n_tokens", "chunk_text"]],
            preserve_index=False)

    return ds.map_batches(fn, batch_format="pyarrow")


def top_bigrams(ds, k: int = 20, text_col: str = "text"):
    """Adjacent-token bigram heavy hitters (the n-gram-LM / tokenizer-
    training counting primitive): per batch, ONE flat token array with
    doc-boundary masking builds every in-doc bigram vectorized (no
    per-row Python); per-batch partial counts make the shuffle carry a
    bigram-vocab-sized aggregate, and the final top-k is a distributed
    ``sort + limit`` — the corpus never reaches the driver, only k rows
    do. At web scale the bigram vocab itself is large: the aggregate
    stays distributed (unlike a driver-side ``to_pandas`` head)."""

    def bigram_counts(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        toks = s.str.strip().str.lower().str.split()
        lens = toks.str.len().fillna(0).astype("int64").to_numpy()
        total = int(lens.sum())
        if total < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks if len(t)])
        # pair (i, i+1) is valid unless i is the last token of its doc
        valid = np.ones(total - 1, dtype=bool)
        ends = np.cumsum(lens[lens > 0]) - 1
        valid[ends[ends < total - 1]] = False
        big = pd.Series(flat[:-1][valid]).str.cat(
            pd.Series(flat[1:][valid]), sep=" ")
        g = big.value_counts().rename_axis("bigram").reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    from .relational import preagg_sum

    agg = preagg_sum(ds.map_batches(bigram_counts, batch_format="pyarrow"),
                     ["bigram"], {"n": "n"})
    return agg.sort(["n", "bigram"], descending=[True, False]).limit(k)


def ttr_by_source(ds, group_col: str = "source", text_col: str = "text",
                  num_buckets: int = 32):
    """Lexical-diversity profile per corpus slice: token count, type
    (distinct-token) count, hapax-legomena count, and the two classic
    ratios — type/token and hapax/type — as floor-at-bp integers
    (``ttr_bp``, ``hapax_bp``; all quantities non-negative so floor ==
    DuckDB ``//``). The standard corpus-quality signal for spotting
    templated / machine-generated slices (low TTR) vs noisy ones (high
    hapax share).

    Plan: per-batch token explode + partial (group, token) counts → one
    combiner groupby bounded by slices × vocab, then a second partial
    agg per group (each (group, token) row is globally unique after the
    first groupby, so per-batch partials of count / sum / count-where-
    n==1 are exact) — the final groupby is #slices-sized. No per-row
    Python anywhere."""
    from .relational import preagg_sum

    def token_counts(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        toks = df[text_col].fillna("").str.strip().str.lower().str.split()
        ex = pd.DataFrame({group_col: df[group_col],
                           "token": toks}).explode("token").dropna()
        g = (ex.groupby([group_col, "token"], sort=False)
             .size().reset_index(name="n"))
        return pa.Table.from_pandas(g, preserve_index=False)

    per_token = preagg_sum(
        ds.map_batches(token_counts, batch_format="pyarrow"),
        [group_col, "token"], {"n": "n"})

    def group_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hapax"] = (df["n"] == 1).astype("int64")
        g = df.groupby(group_col, sort=False).agg(
            n_tokens=("n", "sum"),
            n_types=("n", "size"),
            n_hapax=("hapax", "sum"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    totals = preagg_sum(
        per_token.map_batches(group_partial, batch_format="pyarrow"),
        [group_col],
        {"n_tokens": "n_tokens", "n_types": "n_types",
         "n_hapax": "n_hapax"})

    def ratios(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["ttr_bp"] = (10_000 * df["n_types"]) // df["n_tokens"]
        df["hapax_bp"] = (10_000 * df["n_hapax"]) // df["n_types"]
        return pa.Table.from_pandas(df, preserve_index=False)

    return totals.map_batches(ratios, batch_format="pyarrow")


def novelty_rate(ds, n: int = 3, id_col: str = "doc_id",
                 text_col: str = "text"):
    """Per-document n-gram novelty: the share (exact bp) of a doc's
    DISTINCT word n-grams whose FIRST corpus occurrence (min doc id) is
    this doc — the freshness / boilerplate-inverse signal used to order
    crawl snapshots and to measure how much new text a source adds.

    No join is needed for the novel counts: after one (ngram →
    min doc) combiner groupby, grouping the first-occurrence table by
    that min doc IS the per-doc novel count; per-doc totals come from a
    second combiner preagg of the same gram stream, and the two
    doc-keyed (small) aggregates meet in one left-outer hash join.
    Docs with fewer than ``n`` tokens contribute nothing (no grams),
    mirroring the oracle."""
    from .relational import preagg_sum, shuffle_join

    def grams(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = _doc_ngrams(df[text_col], n)
        out = pd.DataFrame({
            id_col: df[id_col].to_numpy()[g.index.to_numpy()],
            "ngram": g["ngram"].to_numpy(),
        }).drop_duplicates()  # one row per doc → per-batch distinct is global
        return pa.Table.from_pandas(out, preserve_index=False)

    gds = ds.map_batches(grams, batch_format="pyarrow")
    tot = preagg_sum(gds, [id_col], {}, counts="n_grams")
    first = gds.groupby("ngram").min(id_col)

    def first_doc(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch.column(f"min({id_col})")})

    nov = preagg_sum(first.map_batches(first_doc, batch_format="pyarrow"),
                     [id_col], {}, counts="n_novel")

    # groupby outputs must be repaired before a join (schemaless empty
    # blocks); rename the right key so the join output is unambiguous
    from .graph import _repaired

    tot = _repaired(tot, pa.schema([(id_col, pa.int64()),
                                    ("n_grams", pa.int64())]))
    nov = _repaired(
        nov.map_batches(lambda b: b.rename_columns(["first_doc",
                                                    "n_novel"]),
                        batch_format="pyarrow"),
        pa.schema([("first_doc", pa.int64()), ("n_novel", pa.int64())]))
    joined = shuffle_join(tot, nov, on=id_col, right_on="first_doc",
                          how="left_outer")

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["n_novel"] = df["n_novel"].fillna(0).astype("int64")
        df["novelty_bp"] = (10_000 * df["n_novel"]) // df["n_grams"]
        return pa.Table.from_pandas(
            df[[id_col, "n_grams", "n_novel", "novelty_bp"]],
            preserve_index=False)

    return joined.map_batches(finish, batch_format="pyarrow")


def skipgram_counts(ds, k: int = 20, window: int = 2,
                    text_col: str = "text"):
    """Skip-gram co-occurrence heavy hitters (the word2vec / PMI-matrix
    preprocessing primitive): ordered (center, context) pairs within
    ``window`` tokens inside a doc, counted corpus-wide, top-``k`` by
    count (ties → pair text). Generalizes :func:`top_bigrams` from
    adjacency to a window: the same ONE flat token array per batch with
    doc-boundary masking, one shifted view per distance (no per-row
    Python), partial counts, distributed sort + limit — only k rows
    reach the driver."""
    from .relational import preagg_sum

    def pair_counts(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        toks = s.str.strip().str.lower().str.split()
        lens = toks.str.len().fillna(0).astype("int64").to_numpy()
        total = int(lens.sum())
        empty = pa.table({"pair": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if total < 2:
            return empty
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks if len(t)])
        # doc id per flat position, to mask cross-doc pairs
        doc = np.repeat(np.arange((lens > 0).sum()), lens[lens > 0])
        pieces = []
        for d in range(1, window + 1):
            if total <= d:
                break
            ok = doc[:-d] == doc[d:]
            if ok.any():
                pieces.append(pd.Series(flat[:-d][ok]).str.cat(
                    pd.Series(flat[d:][ok]), sep=" "))
        if not pieces:
            return empty
        g = pd.concat(pieces, ignore_index=True).value_counts() \
            .rename_axis("pair").reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = preagg_sum(ds.map_batches(pair_counts, batch_format="pyarrow"),
                     ["pair"], {"n": "n"})
    return agg.sort(["n", "pair"], descending=[True, False]).limit(k)


def char_trigram_counts(ds, k: int = 20, text_col: str = "text"):
    """Character-trigram heavy hitters — the classic language-ID /
    script-detection feature table (all positions of lower(text),
    spaces included). Per batch the whole text column becomes ONE byte
    array (docs joined with a NUL sentinel); a stride-tricks sliding
    window enumerates every trigram with zero Python per row, sentinel
    windows mask doc boundaries, and a bytes-level value_counts makes
    the partial. ASCII corpus contract (byte == char — the synthetic
    tables; multi-byte text would need a codepoint array instead),
    asserted per batch. Distributed sort + limit returns only k rows."""
    from .relational import preagg_sum

    def tri_counts(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("").str.lower()
        joined = "\x00".join(s.tolist())
        raw = joined.encode("utf-8")
        assert len(raw) == len(joined), "ASCII corpus contract violated"
        b = np.frombuffer(raw, dtype="u1")
        empty = pa.table({"tri": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if len(b) < 3:
            return empty
        w = np.lib.stride_tricks.sliding_window_view(b, 3)
        ok = (w != 0).all(axis=1)
        if not ok.any():
            return empty
        tris = w[ok].copy().view("S3").ravel()
        vc = pd.Series(tris).value_counts()
        g = vc.rename_axis("tri").reset_index(name="n")
        g["tri"] = g["tri"].str.decode("utf-8")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = preagg_sum(ds.map_batches(tri_counts, batch_format="pyarrow"),
                     ["tri"], {"n": "n"})
    return agg.sort(["n", "tri"], descending=[True, False]).limit(k)


def bpe_merge_pairs(ds, k: int = 10, text_col: str = "text"):
    """One BPE-training merge round: the top-k adjacent CHARACTER pairs
    inside whitespace tokens, weighted by corpus token frequency — the
    pair a byte-pair-encoding tokenizer would merge next. Token counts
    come from a combiner aggregate (corpus → vocab-sized), so the char
    pair explode runs once per UNIQUE token per reduce batch, never per
    corpus occurrence; the final top-k is a distributed sort+limit."""
    from .relational import preagg_sum

    def token_counts(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        toks = s.str.strip().str.lower().str.split().explode().dropna()
        g = toks.value_counts().rename_axis("token").reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    vocab = preagg_sum(
        ds.map_batches(token_counts, batch_format="pyarrow"),
        ["token"], {"n": "n"})

    def pair_counts(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # per UNIQUE token (vocab-sized): its adjacent char pairs
        df["pair"] = df["token"].map(
            lambda t: [t[i:i + 2] for i in range(len(t) - 1)])
        ex = df.explode("pair").dropna(subset=["pair"])
        g = ex.groupby("pair", as_index=False)["n"].sum() \
            .rename(columns={"n": "w"})
        g["w"] = g["w"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = preagg_sum(vocab.map_batches(pair_counts,
                                       batch_format="pyarrow"),
                     ["pair"], {"w": "w"})
    return agg.sort(["w", "pair"], descending=[True, False]).limit(k)


def inverted_index(ds, df_min: int = 2, df_max: int = 100,
                   text_col: str = "text", id_col: str = "doc_id",
                   num_buckets: int = 64):
    """Search-index build: posting list (sorted doc-id CSV) + document
    frequency per token, restricted to the [df_min, df_max] df band —
    the standard inverted-index shape with stopword-grade tokens (df >
    df_max) and hapaxes (df < df_min) excluded, which also bounds every
    posting string to df_max entries.

    Two stages: a vectorized per-batch explode to DISTINCT (doc, token)
    pairs (each doc lives in exactly one row, so per-batch distinct is
    globally distinct), then ONE token-bucketed shuffle where each
    bucket counts df vectorized, drops out-of-band tokens FIRST, and
    only then pays the per-token ``",".join`` (≤ df_max items each) for
    the survivors. Scale unit = distinct in-band tokens per bucket.
    """
    from .relational import hash_aggregate

    def pairs(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).to_pandas()
        ex = s.str.strip().str.lower().str.split().explode().dropna()
        df = pd.DataFrame({
            id_col: ids.loc[ex.index].to_numpy(),
            "token": ex.to_numpy(),
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_postings(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df["token"].value_counts()
        keep = cnt[(cnt >= df_min) & (cnt <= df_max)]
        df = df[df["token"].isin(keep.index)]
        if not len(df):
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "n_docs": pd.Series([], dtype="int64"),
                                 "postings": pd.Series([], dtype=object)})
        df = df.sort_values(["token", id_col], kind="mergesort")
        post = df.assign(s=df[id_col].astype(str)) \
            .groupby("token", sort=False)["s"].agg(",".join)
        return pd.DataFrame({
            "token": post.index.to_numpy(),
            "n_docs": keep.loc[post.index].astype("int64").to_numpy(),
            "postings": post.to_numpy(),
        })

    return hash_aggregate(ds.map_batches(pairs, batch_format="pyarrow"),
                          ["token"], bucket_postings,
                          num_buckets=num_buckets)


def search_all_tokens(ds, query_tokens, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Conjunctive boolean search: ids of docs whose (case-folded,
    whitespace) token set contains EVERY query token. The query set is
    closure-broadcast (Q is tiny); per batch one vectorized explode →
    ``isin`` filter → distinct → per-doc count == Q. Each doc lives in
    one row, so per-batch evaluation is exact and the output streams
    with no shuffle at all."""
    q = frozenset(query_tokens)
    nq = len(q)

    def fn(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).to_pandas()
        ex = s.str.strip().str.lower().str.split().explode().dropna()
        ex = ex[ex.isin(q)]
        df = pd.DataFrame({id_col: ids.loc[ex.index].to_numpy(),
                           "token": ex.to_numpy()}).drop_duplicates()
        hit = df.groupby(id_col, sort=False).size()
        keep = hit[hit == nq].index.to_numpy()
        keep.sort()
        return pa.table({id_col: pa.array(
            keep, batch.schema.field(id_col).type)})

    return ds.map_batches(fn, batch_format="pyarrow")


def readability(batch: pa.Table, text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """Readability proxy stats (Flesch-flavored, integer-exact): words =
    non-space runs, sentences = terminal-punctuation characters, syllable
    proxy = vowel-group runs; words-per-sentence and syllables-per-word
    as floor-at-4dp integers (all quantities non-negative, so floor ==
    DuckDB's truncating ``//``). Vectorized pandas str.count — the ASCII
    patterns count identically under Python re and DuckDB RE2."""
    s = batch.column(text_col).to_pandas().fillna("")
    n_words = s.str.count(r"\S+").astype("int64")
    n_sents = s.str.count(r"[.!?]").astype("int64")
    n_vg = s.str.count(r"[aeiouAEIOU]+").astype("int64")
    wps = (10_000 * n_words) // np.maximum(n_sents, 1)
    spw = (10_000 * n_vg) // np.maximum(n_words, 1)
    return pa.table({
        id_col: batch.column(id_col),
        "n_words": pa.array(n_words, pa.int64()),
        "n_sents": pa.array(n_sents, pa.int64()),
        "wps_e4": pa.array(wps.astype("int64"), pa.int64()),
        "spw_e4": pa.array(spw.astype("int64"), pa.int64()),
    })


def bigram_pmi(ds, k: int = 20, top_m: int = 1000, text_col: str = "text"):
    """Collocation mining: pointwise mutual information over the top_m
    count-heavy-hitter bigrams — pmi_e6 = floor(10⁶·ln(n_xy·N_u² /
    (N_b·n_x·n_y))), i.e. ln of p(xy)/(p(x)p(y)) with bigram mass N_b
    and unigram mass N_u. Unigram and bigram counts are combiner
    aggregates (corpus → vocab-sized, never on the driver); masses are
    distributed Sum scalars; candidates are the top_m bigrams by
    (count, bigram) via distributed sort+limit — the heavy-hitter
    discipline keeps the exact-bigint finalize O(top_m) at any corpus
    scale, and the ≤2·top_m unigram margins arrive via one vocab-Dataset
    ``is_in`` filter. Products are exact Python ints converted to double
    ONCE (the oracle mirrors with HUGEINT::DOUBLE), so the floor is
    engine-stable; ties break on (pmi_e6 desc, bigram)."""
    import math

    import pyarrow.compute as pc

    from .relational import preagg_sum

    def unigram_counts(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        toks = s.str.strip().str.lower().str.split()
        flat = [t for ts in toks for t in ts]
        if not flat:
            return pa.table({"w": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = pd.Series(flat).value_counts().rename_axis("w") \
            .reset_index(name="n")
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def bigram_counts(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        toks = s.str.strip().str.lower().str.split()
        lens = toks.str.len().fillna(0).astype("int64").to_numpy()
        total = int(lens.sum())
        if total < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks if len(t)])
        valid = np.ones(total - 1, dtype=bool)
        ends = np.cumsum(lens[lens > 0]) - 1
        valid[ends[ends < total - 1]] = False
        big = pd.Series(flat[:-1][valid]).str.cat(
            pd.Series(flat[1:][valid]), sep=" ")
        g = big.value_counts().rename_axis("bigram").reset_index(name="n")
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    # materialize the vocab-sized aggregates once — each is consumed
    # twice (mass scalar + margins / top-m) and must not re-scan the
    # corpus per consumer
    uni = preagg_sum(ds.map_batches(unigram_counts, batch_format="pyarrow"),
                     ["w"], {"n": "n"}).materialize()
    big = preagg_sum(ds.map_batches(bigram_counts, batch_format="pyarrow"),
                     ["bigram"], {"n": "n"}).materialize()
    n_u = int(uni.sum("n"))           # distributed reduce, scalar out
    n_b = int(big.sum("n"))
    cand = big.sort(["n", "bigram"], descending=[True, False]) \
        .limit(top_m).to_pandas()
    if not len(cand):
        return pd.DataFrame({"bigram": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64"),
                             "pmi_e6": pd.Series([], dtype="int64")})
    parts = cand["bigram"].str.split(" ", n=1, expand=True)
    cand["w1"], cand["w2"] = parts[0], parts[1]
    words = set(cand["w1"]) | set(cand["w2"])
    wset = pa.array(sorted(words), pa.string())

    def keep_words(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("w"), value_set=wset))

    marg = uni.map_batches(keep_words, batch_format="pyarrow").to_pandas()
    wn = dict(zip(marg["w"], marg["n"].astype("int64")))
    pmi = [
        math.floor(1_000_000 * math.log(
            float(int(n) * n_u * n_u)
            / float(n_b * int(wn[w1]) * int(wn[w2]))))
        for n, w1, w2 in zip(cand["n"], cand["w1"], cand["w2"])
    ]
    cand["pmi_e6"] = pd.Series(pmi, index=cand.index, dtype="int64")
    cand["n"] = cand["n"].astype("int64")
    out = cand.sort_values(["pmi_e6", "bigram"],
                           ascending=[False, True]).head(k)
    return out[["bigram", "n", "pmi_e6"]].reset_index(drop=True)


def bm25_topk(ds, terms, k: int = 10, text_col: str = "text",
              id_col: str = "doc_id"):
    """BM25 retrieval (k1 = 1.2, b = 0.75) for a fixed query over
    whitespace tokens. The tf normalization is kept EXACT-integer by
    folding the constants and substituting avgdl = S/N:
    tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) = 22·tf·S / (10·tf·S + 3·S +
    9·dl·N) — no intermediate rounding; idf = ln((N−df+0.5)/(df+0.5))
    acts on the |terms| driver scalars. Per-(doc, term) contribution is
    floor((10⁶·idf)·(num/den)) with ONE double conversion each side
    (the oracle mirrors HUGEINT::DOUBLE), summed as integers — engine-
    stable. Pass 1 reduces corpus scalars (N, S, per-term df) via
    per-batch partials; pass 2 scores per batch vectorized (flat token
    array + bincount per term, no per-row Python); top-k by
    (score desc, id) is a distributed sort+limit. int64 products bound:
    22·tf·S must fit — at 10^14-token corpora switch num/den to object
    ints (the oracle already uses HUGEINT)."""
    import math

    from .relational import tree_aggregate

    terms = list(terms)

    def scalars(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        toks = s.str.strip().str.lower().str.split()
        lens = toks.str.len().fillna(0).astype("int64")
        row = {"n": [len(s)], "s": [int(lens.sum())]}
        sets = toks.map(set)
        for i, t in enumerate(terms):
            row[f"df{i}"] = [int(sets.map(
                lambda x, _t=t: _t in x).sum())]
        return pa.table({c: pa.array(v, pa.int64())
                         for c, v in row.items()})

    tot = tree_aggregate(
        ds.map_batches(scalars, batch_format="pyarrow"),
        lambda df: pd.DataFrame(
            {c: [int(df[c].sum())] for c in df.columns}),
        precombined=True).to_pandas()
    n_docs = int(tot["n"].iloc[0])
    s_tot = int(tot["s"].iloc[0])
    dfs = [int(tot[f"df{i}"].iloc[0]) for i in range(len(terms))]
    idf6 = [1_000_000 * math.log((n_docs - d + 0.5) / (d + 0.5))
            for d in dfs]

    def score(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).to_pandas().astype("int64").to_numpy()
        toks = s.str.strip().str.lower().str.split()
        lens = toks.str.len().fillna(0).astype("int64").to_numpy()
        nr = len(s)
        out_sc = np.zeros(nr, dtype="int64")
        matched = np.zeros(nr, dtype=bool)
        if lens.sum() > 0:
            flat = np.concatenate(
                [np.asarray(t, dtype=object) for t in toks if len(t)])
            doc_idx = np.repeat(np.arange(nr), lens)
            for i, t in enumerate(terms):
                tf = np.bincount(doc_idx[flat == t], minlength=nr) \
                    .astype("int64")
                m = tf > 0
                if not m.any():
                    continue
                matched |= m
                num = 22 * tf[m] * s_tot
                den = (10 * tf[m] * s_tot + 3 * s_tot
                       + 9 * lens[m] * n_docs)
                out_sc[m] += np.floor(
                    idf6[i] * (num.astype("float64")
                               / den.astype("float64"))).astype("int64")
        return pa.table({id_col: pa.array(ids[matched], pa.int64()),
                         "score_e6": pa.array(out_sc[matched],
                                              pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow") \
        .sort(["score_e6", id_col], descending=[True, False]).limit(k)


def unigram_surprise_topk(ds, k: int = 20, text_col: str = "text",
                          id_col: str = "doc_id"):
    """Per-document cross-entropy under the corpus's own unigram LM (the
    perplexity-filter analog used to screen training data): for doc d,
    ce_e6 = (Σ_w floor(10⁶·tf_w·ln(N_u/n_w))) // n_tok — per-distinct-
    word integer floors summed as ints (engine-stable; no float SUM
    ordering), divided by the doc's token count. High scores = most
    "surprising" docs. Dataflow is the real thing at scale: per-(doc,
    word) tf partials (combiner), ONE word-hash shuffle join against
    the vocab-count Dataset (the vocab never lands on the driver), a
    doc-keyed combiner fold, distributed sort+limit."""
    from .relational import _join_partitions, preagg_sum, shuffle_join

    def doc_word_tf(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).to_pandas().astype("int64")
        toks = s.str.strip().str.lower().str.split()
        df = pd.DataFrame({id_col: ids, "w": toks}).explode("w").dropna()
        if not len(df):
            return pa.table({id_col: pa.array([], pa.int64()),
                             "w": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        g = df.groupby([id_col, "w"], as_index=False).size() \
            .rename(columns={"size": "tf"})
        g["tf"] = g["tf"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    # per-(doc, word) tf — already deduped per batch, exact after the
    # shuffle join because (doc, word) rows from different batches of
    # the same doc cannot exist (a doc lives in one block)
    dwt = ds.map_batches(doc_word_tf, batch_format="pyarrow")
    dwt = dwt.materialize()

    uni = preagg_sum(dwt.select_columns(["w", "tf"]), ["w"],
                     {"n": "tf"}).materialize()
    n_u = int(uni.sum("n"))

    from .relational import coerce_schema, compact_nonempty

    uni2 = compact_nonempty(uni)
    uni2 = coerce_schema(uni2, pa.schema([("w", pa.string()),
                                          ("n", pa.int64())])) \
        .rename_columns({"w": "w2"}).materialize()
    j = shuffle_join(dwt, uni2, on="w", right_on="w2",
                     num_partitions=_join_partitions(dwt.count()))

    def term(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        tf = df["tf"].to_numpy().astype("int64")
        nw = df["n"].to_numpy().astype("float64")
        t = np.floor((1_000_000 * tf)
                     * np.log(float(n_u) / nw)).astype("int64")
        return pa.Table.from_pandas(pd.DataFrame({
            id_col: df[id_col].astype("int64"),
            "t_e6": t, "tf": tf,
        }), preserve_index=False)

    agg = preagg_sum(j.map_batches(term, batch_format="pyarrow"),
                     [id_col], {"sum_e6": "t_e6", "n_tok": "tf"})

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(pd.DataFrame({
            id_col: df[id_col].astype("int64"),
            "n_tok": df["n_tok"].astype("int64"),
            "ce_e6": df["sum_e6"].to_numpy().astype("int64")
            // df["n_tok"].to_numpy().astype("int64"),
        }), preserve_index=False)

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort(["ce_e6", id_col], descending=[True, False]).limit(k)


def cross_doc_ngram_stats(ds, n: int = 8, id_col: str = "doc_id",
                          text_col: str = "text"):
    """Cross-document n-gram duplication profile — the corpus-level
    substring-duplication signal behind suffix-style training-data
    dedup (Lee et al., "Deduplicating Training Data Makes Language
    Models Better"), at word-shingle granularity: for every document,
    how many distinct word ``n``-grams it carries and how many of those
    occur in ≥2 distinct documents corpus-wide.

    Plan: one pass explodes each doc into distinct (doc, gram) pairs
    with a batch-vectorized window build (flat token array + ``n``
    shifted object-array concats — no per-token Python loop); the pair
    set is pinned once and consumed twice: a gram-keyed combiner preagg
    counts documents per gram, and a gram-hash shuffle join carries the
    count back onto the pairs, where a doc-keyed combiner folds the two
    indicators. At 100 TB the pin becomes a parquet spill of the pair
    table (checkpoint idiom) — both consumers stream it from disk; the
    exchanges are already gram-/doc-hash bucketed.
    """
    from .relational import (
        coerce_schema,
        compact_nonempty,
        preagg_sum,
        shuffle_join,
    )

    schema = pa.schema([(id_col, pa.int64()), ("gram", pa.string()),
                        ("one", pa.int64())])

    def pairs_fn(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        toks = df[text_col].astype(str).str.strip().str.split()
        lens = toks.map(len).to_numpy()
        total = int(lens.sum())
        m = total - n + 1
        if total == 0 or m <= 0:
            return schema.empty_table()
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks if t])
        dids = np.repeat(df[id_col].to_numpy().astype("int64"), lens)
        valid = dids[:m] == dids[n - 1:]
        gram = flat[:m].copy()
        for j in range(1, n):
            gram = gram + " "
            gram = gram + flat[j:m + j]
        out = pd.DataFrame({id_col: dids[:m][valid],
                            "gram": gram[valid]}).drop_duplicates()
        out["one"] = np.int64(1)
        return pa.Table.from_pandas(out, preserve_index=False) \
            .cast(schema)

    pairs = ds.map_batches(pairs_fn, batch_format="pyarrow").materialize()
    counts = compact_nonempty(coerce_schema(
        preagg_sum(pairs, ["gram"], {"n_docs": "one"}),
        pa.schema([("gram", pa.string()), ("n_docs", pa.int64())]),
    ).materialize())

    joined = shuffle_join(pairs.select_columns([id_col, "gram"]),
                          counts, on="gram")

    def fold(batch: pa.Table) -> pa.Table:
        nd = batch.column("n_docs").to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: batch.column(id_col),
            "n_grams": pa.array(np.ones(batch.num_rows, dtype="int64")),
            "n_shared": pa.array((nd >= 2).astype("int64")),
        })

    return preagg_sum(joined.map_batches(fold, batch_format="pyarrow"),
                      [id_col], {"n_grams": "n_grams",
                                 "n_shared": "n_shared"})


def zipf_slope(ds, k: int = 100, text_col: str = "text"):
    """Zipf's-law fit over the corpus frequency spectrum: exact-integer
    least squares of floor(1e6*ln(freq)) against floor(1e6*ln(rank))
    for the top ``k`` tokens (count desc, token asc).

    The heavy stage is the distributed token count (vectorized explode
    partials + one vocab-bounded merge — the corpus never leaves the
    cluster); the fit itself runs on the k-row spectrum with PYTHON
    ints (the 1e6-scaled normal-equation products overflow int64, and
    the SQL oracle mirrors them in HUGEINT). Slope/intercept come out
    as e6-scaled truncating divisions — DuckDB ``//`` truncates toward
    zero, so the mirror is sign-aware — making the whole statistic
    bit-exact against the oracle. A healthy natural-language corpus
    fits slope_e6 near -1e6; flatter means templated/repetitive text.
    """
    import math

    from .relational import preagg_sum

    def token_counts(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        toks = s.str.strip().str.lower().str.split().explode().dropna()
        g = toks.value_counts().rename_axis("token").reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = preagg_sum(ds.map_batches(token_counts, batch_format="pyarrow"),
                     ["token"], {"n": "n"})
    top = (agg.sort(["n", "token"], descending=[True, False])
           .limit(k).to_pandas())

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // b
        return -q if a < 0 else q

    xs = [math.floor(1_000_000 * math.log(r))
          for r in range(1, len(top) + 1)]
    ys = [math.floor(1_000_000 * math.log(int(n))) for n in top["n"]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = tdiv(1_000_000 * (n * sxy - sx * sy), n * sxx - sx * sx)
    intercept = tdiv(sy - tdiv(slope * sx, 1_000_000), n)
    return pd.DataFrame({"n_points": pd.array([n], dtype="int64"),
                         "slope_e6": pd.array([slope], dtype="int64"),
                         "intercept_e6": pd.array([intercept],
                                                  dtype="int64")})


def hapax_stats(ds, text_col: str = "text"):
    """Hapax-legomena profile of the corpus vocabulary: n_vocab,
    n_hapax (corpus frequency exactly 1) and hapax_bp = their
    basis-point share — the vocabulary-health screen (a healthy
    natural corpus sits near 40-60%; far lower means templated text,
    far higher means OCR noise / tokenization damage).

    The heavy stage is the same distributed token count as
    :func:`zipf_slope` (vectorized explode partials + one
    vocab-bounded merge); the fold to one row is a per-block partial
    (2 ints per block) summed on the tiny aggregate."""
    from .relational import preagg_sum

    def token_counts(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        toks = s.str.strip().str.lower().str.split().explode().dropna()
        g = toks.value_counts().rename_axis("token").reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = preagg_sum(ds.map_batches(token_counts, batch_format="pyarrow"),
                     ["token"], {"n": "n"})

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.column("n")
        return pa.table({
            "v": pa.array([batch.num_rows], pa.int64()),
            "h": pa.array([pc.sum(pc.cast(pc.equal(
                n, pa.scalar(1, n.type)), pa.int64())).as_py() or 0],
                pa.int64()),
        })

    parts = agg.map_batches(partial, batch_format="pyarrow").to_pandas()
    v = int(parts["v"].sum())
    h = int(parts["h"].sum())
    return pd.DataFrame({
        "n_vocab": pd.array([v], dtype="int64"),
        "n_hapax": pd.array([h], dtype="int64"),
        "hapax_bp": pd.array([(10_000 * h) // v if v else 0],
                             dtype="int64"),
    })


def gazetteer_tag(ds, terms, text_col: str = "text",
                  id_col: str = "doc_id", group_col: str | None = None):
    """Dictionary surface-form tagging — the vectorized stand-in for an
    Aho-Corasick pass, and the mention-detection primitive the KG
    extract stage (reference: per-document regex scan,
    src/graph_loader.rs load loop) generalizes to arbitrary gazetteers.

    ``terms`` is a list of lowercased surface forms; multi-word phrases
    match as ADJACENT token sequences (same token contract as
    `_doc_ngrams`). Returns a Dataset of (term, n_mentions, n_docs)
    for every term that occurs, sorted by term — overlapping forms
    count independently ("hash join" also feeds "hash" and "join").

    Scale: the gazetteer is put in the object store ONCE (``ray.put``)
    and fetched zero-copy per task — never re-shipped per batch via
    closure capture (a web-scale gazetteer is millions of forms). Per
    batch, ONE n-gram explode per distinct phrase length + a hash
    ``isin`` probe; because each document is one row, per-batch
    (term, doc) partials are exact, so the exchange carries at most
    |terms| rows per block and n_docs sums without a distinct-count
    shuffle."""
    import ray

    from .relational import preagg_sum

    by_n: dict[int, set] = {}
    for t in terms:
        by_n.setdefault(len(t.split()), set()).add(t)
    terms_ref = ray.put({n: frozenset(ts) for n, ts in by_n.items()})

    keys = ([group_col] if group_col else []) + ["term"]

    def tag(batch: pa.Table) -> pa.Table:
        import ray as _ray

        term_sets = _ray.get(terms_ref)
        s = batch.column(text_col).to_pandas().fillna("")
        grp = (batch.column(group_col).to_pandas().to_numpy()
               if group_col else None)
        frames = []
        for n, tset in term_sets.items():
            ng = _doc_ngrams(s, n)
            hit = ng[ng["ngram"].isin(tset)]
            if len(hit):
                f = pd.DataFrame({
                    "term": hit["ngram"].to_numpy(),
                    "row": hit.index.to_numpy(),
                })
                if group_col:
                    f[group_col] = grp[hit.index.to_numpy()]
                frames.append(f)
        if not frames:
            cols = {c: pa.array([], pa.string()) for c in keys}
            cols["n_mentions"] = pa.array([], pa.int64())
            cols["n_docs"] = pa.array([], pa.int64())
            return pa.table(cols)
        m = pd.concat(frames, ignore_index=True)
        g = m.groupby(keys, sort=False).agg(
            n_mentions=("row", "size"), n_docs=("row", "nunique"))
        g = g.reset_index()
        cols = {c: pa.array(g[c].astype(str), pa.string())
                for c in keys}
        cols["n_mentions"] = pa.array(
            g["n_mentions"].astype("int64"))
        cols["n_docs"] = pa.array(g["n_docs"].astype("int64"))
        return pa.table(cols)

    agg = preagg_sum(ds.map_batches(tag, batch_format="pyarrow"),
                     keys, {"n_mentions": "n_mentions",
                            "n_docs": "n_docs"})
    return agg.sort(keys)


def good_turing(ds, max_r: int = 10, gram: int = 1,
                text_col: str = "text"):
    """Good–Turing smoothed count table over the ``gram``-gram
    frequency spectrum: for r = 1..max_r with spectrum mass n_r > 0,
    the adjusted count r* = (r+1)·n_{r+1}/n_r reported as the exact
    integer ``gt_e6 = (10^6·(r+1)·n_{r+1}) // n_r`` — the estimator
    behind Katz back-off and unseen-mass estimation (Gale & Sampson's
    simple GT without smoothing of the spectrum itself; pure integer
    floor, no float in the contract). ``gram=2`` runs on bigrams,
    where real corpora keep a populated low-count tail.

    Distributed shape: gram counts are a combiner aggregate (corpus →
    vocab-sized), the spectrum is a second combiner aggregate (vocab →
    max-count-sized), and only the <= max_r + 1 spectrum rows reach
    the driver."""
    import pyarrow.compute as pc

    from .relational import preagg_sum

    def unigram_counts(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        toks = s.str.strip().str.lower().str.split()
        if gram == 1:
            flat = [t for ts in toks for t in ts]
        else:
            flat = [" ".join(ts[i:i + gram])
                    for ts in toks
                    for i in range(len(ts) - gram + 1)]
        if not flat:
            return pa.table({"w": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = pd.Series(flat).value_counts().rename_axis("w") \
            .reset_index(name="n")
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    from raygraph.ops.graph import _repaired

    uni = _repaired(
        preagg_sum(
            ds.map_batches(unigram_counts, batch_format="pyarrow"),
            ["w"], {"n": "n"}),
        pa.schema([("w", pa.string()), ("n", pa.int64())]))

    def spec_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"r": batch.column("n")})

    spec = _repaired(
        preagg_sum(uni.map_batches(spec_rows, batch_format="pyarrow"),
                   ["r"], {}, counts="n_r"),
        pa.schema([("r", pa.int64()), ("n_r", pa.int64())]))
    small = _repaired(
        spec.map_batches(
            lambda b: b.filter(pc.less_equal(b.column("r"),
                                             max_r + 1)),
            batch_format="pyarrow"),
        pa.schema([("r", pa.int64()), ("n_r", pa.int64())])).to_pandas()
    if "r" not in small.columns:   # all-empty dataset loses columns
        small = pd.DataFrame({"r": [], "n_r": []})
    nr = dict(zip(small["r"].astype(int), small["n_r"].astype(int)))
    rows = []
    for r in range(1, max_r + 1):
        if nr.get(r, 0) <= 0:
            continue
        nxt = nr.get(r + 1, 0)
        rows.append({"r": r, "n_r": nr[r], "n_next": nxt,
                     "gt_e6": (1_000_000 * (r + 1) * nxt) // nr[r]})
    return pd.DataFrame(rows, columns=["r", "n_r", "n_next", "gt_e6"]) \
        .astype({"r": "int64", "n_r": "int64", "n_next": "int64",
                 "gt_e6": "int64"})


def bigram_g2_topk(ds, k: int = 20, top_m: int = 1000,
                   text_col: str = "text"):
    """Dunning log-likelihood (G²) collocations — the significance-
    test counterpart of :func:`bigram_pmi` (PMI over-ranks rare pairs;
    G² weighs evidence mass): for each candidate bigram the 2×2
    contingency over BIGRAM positions (k11 = pair count, margins =
    bigram-start / bigram-end counts, N = total bigrams) scores

        g2_e6 = 2 · Σ_ij floor((10^6·k_ij) · ln((k_ij·N)::DOUBLE /
                                                 (row_i·col_j)))

    with zero cells contributing 0 — per-term floor then exact integer
    sum (the established order-free ln discipline), so the SQL oracle
    reproduces it bit-for-bit. Margins are combiner aggregates over
    the bigram table (vocab-sized); candidates are the top_m bigrams
    by (count, bigram); only O(top_m) scalars reach the driver."""
    import math

    import pyarrow.compute as pc

    from .relational import preagg_sum

    def bigram_counts(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        toks = s.str.strip().str.lower().str.split()
        lens = toks.str.len().fillna(0).astype("int64").to_numpy()
        total = int(lens.sum())
        if total < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks if len(t)])
        valid = np.ones(total - 1, dtype=bool)
        ends = np.cumsum(lens[lens > 0]) - 1
        valid[ends[ends < total - 1]] = False
        g = pd.DataFrame({"w1": flat[:-1][valid],
                          "w2": flat[1:][valid]}) \
            .value_counts().rename("n").reset_index()
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    big = preagg_sum(
        ds.map_batches(bigram_counts, batch_format="pyarrow"),
        ["w1", "w2"], {"n": "n"}).materialize()
    n_b = int(big.sum("n") or 0)
    if n_b == 0:
        return pd.DataFrame({"bigram": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64"),
                             "g2_e6": pd.Series([], dtype="int64")})

    starts = preagg_sum(big.select_columns(["w1", "n"]), ["w1"],
                        {"n": "n"}).materialize()
    ends_m = preagg_sum(big.select_columns(["w2", "n"]), ["w2"],
                        {"n": "n"}).materialize()

    def keyed(batch: pa.Table) -> pa.Table:
        b = batch.column("w1").to_pandas().str.cat(
            batch.column("w2").to_pandas(), sep=" ")
        return batch.append_column("bigram", pa.array(b, pa.string()))

    cand = big.map_batches(keyed, batch_format="pyarrow") \
        .sort(["n", "bigram"], descending=[True, False]) \
        .limit(top_m).to_pandas()
    w1set = pa.array(sorted(set(cand["w1"])), pa.string())
    w2set = pa.array(sorted(set(cand["w2"])), pa.string())
    sm = starts.map_batches(
        lambda b: b.filter(pc.is_in(b.column("w1"), value_set=w1set)),
        batch_format="pyarrow").to_pandas()
    em = ends_m.map_batches(
        lambda b: b.filter(pc.is_in(b.column("w2"), value_set=w2set)),
        batch_format="pyarrow").to_pandas()
    rmap = dict(zip(sm["w1"], sm["n"].astype(int)))
    cmap = dict(zip(em["w2"], em["n"].astype(int)))

    def term(kij: int, row: int, col: int) -> int:
        if kij <= 0:
            return 0
        return math.floor((1_000_000 * kij) * math.log(
            float(kij * n_b) / float(row * col)))

    g2 = []
    for n, w1, w2 in zip(cand["n"].astype(int), cand["w1"],
                         cand["w2"]):
        r1, c1 = rmap[w1], cmap[w2]
        r2, c2 = n_b - r1, n_b - c1
        s = (term(n, r1, c1) + term(r1 - n, r1, c2)
             + term(c1 - n, r2, c1) + term(n_b - r1 - c1 + n, r2, c2))
        g2.append(2 * s)
    cand["g2_e6"] = pd.Series(g2, index=cand.index, dtype="int64")
    cand["n"] = cand["n"].astype("int64")
    out = cand.sort_values(["g2_e6", "bigram"],
                           ascending=[False, True]).head(k)
    return out[["bigram", "n", "g2_e6"]].reset_index(drop=True)


def rake_keywords(ds, k: int = 15, lang: str = "en",
                  text_col: str = "text"):
    """RAKE keyword extraction (Rose et al., "Automatic Keyword
    Extraction from Individual Documents") — corpus-level variant:
    candidate phrases are maximal stopword-free token runs, each word
    scores ``deg/freq`` (degree = summed length of every phrase
    occurrence containing it — co-occurrence credit; freq = its
    occurrence count), a phrase scores the sum of its member word
    scores, and the top-k distinct phrases win.

    Exact integer contract: ``word_score_e6 = (10^6 · deg) // freq``;
    phrase score = integer sum over member occurrences; ties break on
    (score desc, phrase asc).

    Distributed shape: one flat-map emits word-occurrence rows already
    carrying their phrase and its length (phrases never cross a doc,
    so no exchange is needed to form them); word scores are a
    vocab-sized combiner aggregate; one word-keyed shuffle join prices
    every occurrence; a (doc, phrase-run) combiner then a phrase-keyed
    fold collapse occurrences. Only the top-k rows reach the driver.
    """
    from raygraph.ops.graph import _repaired

    from .relational import (_join_partitions, hash_aggregate,
                             preagg_sum, shuffle_join)

    stops = STOPWORDS[lang]

    occ_schema = pa.schema([("doc", pa.int64()), ("pid", pa.int64()),
                            ("word", pa.string()),
                            ("phrase", pa.string()),
                            ("plen", pa.int64())])

    def occurrences(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column("doc_id").to_pandas()
        toks = s.str.strip().str.lower().str.split()
        ex = pd.DataFrame({
            "doc": ids.repeat(toks.str.len().fillna(0).astype(int)),
            "word": [t for ts in toks for t in ts],
        })
        if not len(ex):
            return occ_schema.empty_table()
        st = ex["word"].isin(stops)
        ex["pid"] = st.groupby(ex["doc"]).cumsum().astype("int64")
        ex = ex[~st]
        if not len(ex):
            return occ_schema.empty_table()
        grp = ex.groupby(["doc", "pid"], sort=False)["word"]
        phrase = grp.transform(" ".join)
        plen = grp.transform("size").astype("int64")
        out = pd.DataFrame({"doc": ex["doc"].astype("int64"),
                            "pid": ex["pid"], "word": ex["word"],
                            "phrase": phrase, "plen": plen})
        return pa.Table.from_pandas(out, preserve_index=False)

    occ = _repaired(ds.map_batches(occurrences, batch_format="pyarrow"),
                    occ_schema)
    if occ.count() == 0:
        return pd.DataFrame({"phrase": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64"),
                             "score_e6": pd.Series([], dtype="int64")})

    wagg = _repaired(
        preagg_sum(occ.select_columns(["word", "plen"]), ["word"],
                   {"deg": "plen"}, counts="freq"),
        pa.schema([("word", pa.string()), ("deg", pa.int64()),
                   ("freq", pa.int64())]))

    def to_score(batch: pa.Table) -> pa.Table:
        deg = batch.column("deg").to_numpy(zero_copy_only=False)
        fr = batch.column("freq").to_numpy(zero_copy_only=False)
        return pa.table({
            "word": batch.column("word"),
            "s": pa.array((1_000_000 * deg) // fr, pa.int64()),
        })

    ws = _repaired(wagg.map_batches(to_score, batch_format="pyarrow"),
                   pa.schema([("word", pa.string()), ("s", pa.int64())]))

    j = shuffle_join(occ, ws, on="word", right_on="word",
                     num_partitions=_join_partitions(occ.count()))
    j = _repaired(j, occ_schema.append(pa.field("s", pa.int64())))

    per_occ = _repaired(
        preagg_sum(j.select_columns(["doc", "pid", "phrase", "s"]),
                   ["doc", "pid", "phrase"], {"score_e6": "s"}),
        pa.schema([("doc", pa.int64()), ("pid", pa.int64()),
                   ("phrase", pa.string()), ("score_e6", pa.int64())]))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("phrase", as_index=False).agg(
            n=("phrase", "size"), score_e6=("score_e6", "min"))
        g["n"] = g["n"].astype("int64")
        g["score_e6"] = g["score_e6"].astype("int64")
        return g

    res = _repaired(
        hash_aggregate(per_occ.select_columns(["phrase", "score_e6"]),
                       ["phrase"], fold),
        pa.schema([("phrase", pa.string()), ("n", pa.int64()),
                   ("score_e6", pa.int64())]))
    out = res.sort(["score_e6", "phrase"], descending=[True, False]) \
        .limit(k).to_pandas()
    return out[["phrase", "n", "score_e6"]]


def bigram_cross_entropy(ds, text_col: str = "text",
                         id_col: str = "doc_id"):
    """Per-document cross-entropy under the corpus's own SMOOTHED bigram
    LM — the CCNet-style perplexity filter (Wenzek et al. 2020) used to
    screen web text, with the LM trained on the corpus itself instead
    of an external KenLM (no model files in this sandbox; the dataflow
    is identical). Smoothing is add-one over each history's observed
    follower set: P(w2|w1) = (c(w1,w2)+1) / (c1(w1)+F(w1)) where c1 =
    Σ_x c(w1,x) and F = |{x : c(w1,x)>0}| — self-contained (no global
    vocab scalar), proper (Σ_observed P < 1, mass reserved for unseen
    followers).

    Exact-integer contract: per distinct (doc, w1, w2),
    t_e6 = floor((10⁶·tf) · ln((c1+F)/(c+1))); doc ce_e6 =
    Σ t_e6 // Σ tf — per-term independent floors summed as ints, so the
    result is reduction-order-free and SQL-replayable. Docs with < 2
    tokens have no bigrams and are absent.

    Scale shape: ONE tokenize pass → per-(doc, bigram) tf partials
    (a doc lives in one block, so the per-batch groupby is already
    global per doc); global bigram counts + per-history (c1, F) via
    combiner preaggs; two hash-shuffle joins (bigram-keyed, then
    history-keyed) — the LM never lands on the driver; doc-keyed
    combiner fold. Everything exchanged is counts, never raw text.
    """
    from .graph import _repaired
    from .relational import preagg_sum, shuffle_join, _join_partitions

    def doc_bigram_tf(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).to_pandas().astype("int64")
        toks = s.str.strip().str.lower().str.split()
        counts = toks.str.len().fillna(0).astype("int64").to_numpy()
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "tf": pa.array([], pa.int64())})
        total = int(counts.sum())
        if total < 2:
            return empty
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks if len(t)])
        docs_arr = np.repeat(ids.to_numpy(), counts)
        valid = docs_arr[:-1] == docs_arr[1:]
        if not valid.any():
            return empty
        df = pd.DataFrame({id_col: docs_arr[:-1][valid],
                           "w1": flat[:-1][valid],
                           "w2": flat[1:][valid]})
        g = df.groupby([id_col, "w1", "w2"], as_index=False).size() \
            .rename(columns={"size": "tf"})
        g["tf"] = g["tf"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    dbt = ds.map_batches(doc_bigram_tf,
                         batch_format="pyarrow").materialize()

    big_schema = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                            ("n", pa.int64())])
    big = _repaired(preagg_sum(dbt.select_columns(["w1", "w2", "tf"]),
                             ["w1", "w2"], {"n": "tf"}), big_schema)
    hist = _repaired(
        preagg_sum(big, ["w1"], {"c1h": "n"}, counts="fw"),
        pa.schema([("w1", pa.string()), ("c1h", pa.int64()),
                   ("fw", pa.int64())])).rename_columns(
        {"w1": "h1"}).materialize()

    nparts = _join_partitions(dbt.count())
    j1 = _repaired(
        shuffle_join(dbt, big.rename_columns({"w1": "b1", "w2": "b2"}),
                     on=("w1", "w2"), right_on=("b1", "b2"),
                     num_partitions=nparts),
        pa.schema([(id_col, pa.int64()), ("w1", pa.string()),
                   ("w2", pa.string()), ("tf", pa.int64()),
                   ("n", pa.int64())]))
    j2 = shuffle_join(j1, hist, on="w1", right_on="h1",
                      num_partitions=nparts)

    def term(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        tf = df["tf"].to_numpy().astype("int64")
        denom = (df["c1h"].to_numpy() + df["fw"].to_numpy()) \
            .astype("float64")
        num = (df["n"].to_numpy() + 1).astype("float64")
        t = np.floor((1_000_000 * tf)
                     * np.log(denom / num)).astype("int64")
        return pa.Table.from_pandas(pd.DataFrame({
            id_col: df[id_col].astype("int64"), "t_e6": t, "tf": tf,
        }), preserve_index=False)

    agg = preagg_sum(j2.map_batches(term, batch_format="pyarrow"),
                     [id_col], {"sum_e6": "t_e6", "n_bg": "tf"})

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(pd.DataFrame({
            id_col: df[id_col].astype("int64"),
            "n_bg": df["n_bg"].astype("int64"),
            "ce_e6": df["sum_e6"].to_numpy().astype("int64")
            // df["n_bg"].to_numpy().astype("int64"),
        }), preserve_index=False)

    return agg.map_batches(finish, batch_format="pyarrow")


def domain_mixture(ds, group_col: str = "source",
                   text_col: str = "text"):
    """Temperature-based domain-mixture weights (the DoReMi-lite /
    multilingual-sampling rule, Conneau & Lample 2019 α = 1/2): each
    domain's sampling weight ∝ (token count)^α, flattening the natural
    distribution so small domains aren't drowned — the knob every
    multi-source training mix needs.

    Exact-integer contract: s_e6 = floor(10⁶·sqrt(n_tokens)) per
    domain (one double sqrt of an exact int, floored — both engines
    run the identical literal), weight_bp = (10⁴·s_e6) // Σ s_e6.

    Scale shape: per-batch vectorized token counting (regex run count,
    no explode) folded by a domain-keyed combiner preagg — the only
    exchange is |domains| × blocks partial rows; the final weight
    normalization touches one row per domain (the driver holds the
    domain table, which is small BY DEFINITION of a mixture).
    """
    from .relational import preagg_sum

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas()
        n = s.str.count(_TOKEN).fillna(0).astype("int64")
        df = pd.DataFrame({group_col: batch.column(group_col)
                           .to_pandas(), "ntok": n})
        g = df.groupby(group_col, as_index=False).agg(
            n_docs=("ntok", "size"), n_tokens=("ntok", "sum"))
        g["n_docs"] = g["n_docs"].astype("int64")
        g["n_tokens"] = g["n_tokens"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = preagg_sum(ds.map_batches(partial, batch_format="pyarrow"),
                     [group_col],
                     {"n_docs": "n_docs", "n_tokens": "n_tokens"})
    df = agg.to_pandas()
    if not len(df):
        return pa.table({group_col: pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "s_e6": pa.array([], pa.int64()),
                         "weight_bp": pa.array([], pa.int64())})
    nt = df["n_tokens"].to_numpy(dtype="int64")
    s_e6 = np.floor(1_000_000 * np.sqrt(nt.astype("float64"))) \
        .astype("int64")
    tot = int(s_e6.sum())
    return pa.table({
        group_col: pa.array(df[group_col].astype(str)),
        "n_docs": pa.array(df["n_docs"].to_numpy(dtype="int64")),
        "n_tokens": pa.array(nt),
        "s_e6": pa.array(s_e6),
        "weight_bp": pa.array((10_000 * s_e6) // tot, pa.int64()),
    })


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                     "with")


def gopher_rules(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style quality rule audit (Rae et al. 2021 §A1.1 subset,
    restricted to rules computable without external word lists): per
    document, integer fail flags for

    * fail_tok    — token count outside [50, 100 000]
    * fail_wlen   — mean word length outside [3, 10] (4dp floor)
    * fail_alpha  — < 80 % of words contain a letter (4dp floor)
    * fail_stop   — fewer than 2 of the 8 canonical stop words
    * fail_bullet — > 90 % of lines start with a bullet (- or *)

    plus ``pass_all``. Filters compose downstream (``keep`` on
    pass_all); emitting flags instead of dropping rows keeps the audit
    a pure map so the funnel stays observable.

    Everything is ONE vectorized map_batches pass — two per-batch
    explodes (tokens, lines) with groupby-sum folds, no per-row Python
    loop, no exchange at all (embarrassingly parallel). Ratios use the
    floor-at-4dp contract so the SQL oracle reproduces them bit-exactly.
    The per-batch kernel is :func:`gopher_flags` (module-level so the
    curation registry can reuse it as a streaming filter stage).
    """
    return ds.map_batches(
        lambda b: gopher_flags(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow")


def gopher_flags(batch: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """Per-batch kernel of :func:`gopher_rules` (see there for the
    rule spec)."""
    s = batch.column(text_col).to_pandas().fillna("")
    ids = batch.column(id_col).to_pandas().astype("int64")
    lt = s.str.strip().str.lower()
    toks = lt.str.findall(_TOKEN)
    ntok = toks.map(len).astype("int64").to_numpy()
    wchars = s.str.replace(r"\s", "", regex=True).str.len() \
        .fillna(0).astype("int64").to_numpy()

    ex = pd.DataFrame({"i": np.repeat(np.arange(len(s)), ntok),
                       "w": toks.explode().dropna().to_numpy()})
    nalpha = np.zeros(len(s), dtype="int64")
    nstop = np.zeros(len(s), dtype="int64")
    if len(ex):
        ex["a"] = ex["w"].str.contains("[a-z]", regex=True) \
            .astype("int64")
        ex["s"] = ex["w"].isin(_GOPHER_STOPWORDS).astype("int64")
        g = ex.groupby("i")[["a", "s"]].sum()
        nalpha[g.index.to_numpy()] = g["a"].to_numpy()
        nstop[g.index.to_numpy()] = g["s"].to_numpy()

    lines = s.str.split("\n")
    nlines = lines.map(len).astype("int64").to_numpy()
    lx = pd.DataFrame({"i": np.repeat(np.arange(len(s)), nlines),
                       "l": lines.explode().to_numpy()})
    nbullet = np.zeros(len(s), dtype="int64")
    if len(lx):
        lx["b"] = lx["l"].str.lstrip().str.match(r"[-*]") \
            .fillna(False).astype("int64")
        b = lx.groupby("i")["b"].sum()
        nbullet[b.index.to_numpy()] = b.to_numpy()

    safe = np.maximum(ntok, 1)
    wlen4 = np.floor(10000.0 * wchars / safe).astype("int64")
    alpha4 = np.floor(10000.0 * nalpha / safe).astype("int64")
    bullet4 = np.floor(10000.0 * nbullet
                       / np.maximum(nlines, 1)).astype("int64")

    fail_tok = ((ntok < 50) | (ntok > 100_000)).astype("int64")
    fail_wlen = ((ntok == 0) | (wlen4 < 30_000)
                 | (wlen4 > 100_000)).astype("int64")
    fail_alpha = ((ntok == 0) | (alpha4 < 8_000)).astype("int64")
    fail_stop = (nstop < 2).astype("int64")
    fail_bullet = (bullet4 > 9_000).astype("int64")
    pass_all = ((fail_tok | fail_wlen | fail_alpha | fail_stop
                 | fail_bullet) == 0).astype("int64")
    return pa.table({
        id_col: pa.array(ids.to_numpy(), pa.int64()),
        "fail_tok": pa.array(fail_tok),
        "fail_wlen": pa.array(fail_wlen),
        "fail_alpha": pa.array(fail_alpha),
        "fail_stop": pa.array(fail_stop),
        "fail_bullet": pa.array(fail_bullet),
        "pass_all": pa.array(pass_all),
    })


def c4_line_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """C4-style line/document hygiene audit (Raffel et al. 2020 §2.2
    subset computable without an external blocklist): per document,

    * ``n_lines`` / ``n_kept`` — lines whose right-trimmed text ends
      in terminal punctuation (. ! ? ") survive the line filter
    * ``n_sentences`` — terminal-punctuation runs in the whole doc
    * ``fail_brace`` — contains ``{`` (code/markup tell)
    * ``fail_lorem`` — contains "lorem ipsum" (boilerplate tell)
    * ``pass_all`` — >= 3 sentences, >= 1 kept line, no brace/lorem

    One vectorized map pass (line explode + groupby-sum, regex run
    counts), no exchange; flags instead of drops keep the funnel
    observable, mirroring :func:`gopher_rules`. The per-batch kernel
    is :func:`c4_flags` (module-level for the curation registry).
    """
    return ds.map_batches(
        lambda b: c4_flags(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow")


def c4_flags(batch: pa.Table, text_col: str = "text",
             id_col: str = "doc_id") -> pa.Table:
    """Per-batch kernel of :func:`c4_line_stats` (see there for the
    rule spec)."""
    s = batch.column(text_col).to_pandas().fillna("")
    ids = batch.column(id_col).to_pandas().astype("int64")
    lines = s.str.split("\n")
    nlines = lines.map(len).astype("int64").to_numpy()
    lx = pd.DataFrame({"i": np.repeat(np.arange(len(s)), nlines),
                       "l": lines.explode().to_numpy()})
    nkept = np.zeros(len(s), dtype="int64")
    if len(lx):
        lx["k"] = lx["l"].str.rstrip() \
            .str.contains(r'[.!?"]$', regex=True) \
            .fillna(False).astype("int64")
        k = lx.groupby("i")["k"].sum()
        nkept[k.index.to_numpy()] = k.to_numpy()
    nsent = s.str.count(r"[.!?]+").fillna(0).astype("int64") \
        .to_numpy()
    brace = s.str.contains("{", regex=False).astype("int64") \
        .to_numpy()
    lorem = s.str.lower().str.contains("lorem ipsum", regex=False) \
        .astype("int64").to_numpy()
    pass_all = ((nsent >= 3) & (nkept >= 1) & (brace == 0)
                & (lorem == 0)).astype("int64")
    return pa.table({
        id_col: pa.array(ids.to_numpy(), pa.int64()),
        "n_lines": pa.array(nlines),
        "n_kept": pa.array(nkept),
        "n_sentences": pa.array(nsent),
        "fail_brace": pa.array(brace),
        "fail_lorem": pa.array(lorem),
        "pass_all": pa.array(pass_all),
    })


def _hashed_gram_buckets(batch: pa.Table, text_col: str, id_col: str,
                         dim: int):
    """Flat (doc_row, bucket) arrays of the hashed unigram+bigram
    features of a batch — the DSIR feature map. Tokens are the oracle's
    ``regexp_split_to_array(trim(lower(text)), '\\s+')``; bigrams are
    space-joined adjacent same-doc tokens; bucket = md5-60bit(gram) %
    dim with md5 run once per UNIQUE gram per batch."""
    s = batch.column(text_col).to_pandas().fillna("")
    ids = batch.column(id_col).to_pandas().astype("int64").to_numpy()
    toks = s.str.strip().str.lower().str.split()
    counts = toks.str.len().fillna(0).astype("int64").to_numpy()
    total = int(counts.sum())
    if total == 0:
        return (np.array([], dtype="int64"), np.array([], dtype="int64"))
    flat = np.concatenate(
        [np.asarray(t, dtype=object) for t in toks if len(t)])
    docs_arr = np.repeat(ids, counts)
    same = docs_arr[:-1] == docs_arr[1:]
    if same.any():
        bi = (pd.Series(flat[:-1][same]) + " "
              + pd.Series(flat[1:][same])).to_numpy()
        grams = np.concatenate([flat, bi])
        gdocs = np.concatenate([docs_arr, docs_arr[:-1][same]])
    else:
        grams, gdocs = flat, docs_arr
    uniq, inv = np.unique(grams.astype("U"), return_inverse=True)
    hb = np.fromiter(
        (int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % dim
         for g in uniq),
        dtype="int64", count=len(uniq))
    return gdocs, hb[inv]


def dsir_weights(ds, target_col: str = "source",
                 target_value: str = "src0", dim: int = 1024,
                 text_col: str = "text", id_col: str = "doc_id"):
    """DSIR importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023): score
    every raw document by how target-like its hashed n-gram features
    are — the data-selection step a pretraining mix runs before
    sampling. Features are hashed unigrams+bigrams in ``dim`` buckets;
    the target distribution is the subset ``target_col ==
    target_value``; the raw distribution is the whole corpus.

    Exact-integer contract: per bucket h,
    ``r_e6[h] = floor(10⁶ · ln( (c_t[h]+1)·(N_r+dim) /
    ((c_r[h]+1)·(N_t+dim)) ))`` — add-one smoothed log importance
    ratio, exact Python-int products, ONE double division + ln per
    bucket (both engines run the identical literal). Per doc,
    ``dsir_e6 = Σ_occurrences r_e6[bucket]`` — independent per-term
    floors summed as ints, reduction-order-free.

    Scale shape: fit = one tokenize pass folded to a dim-sized
    (bucket, c_t, c_r) combiner aggregate (dim × blocks exchange
    rows); the ratio table is dim-sized BY CONSTRUCTION (1024 int64 =
    8 KB) and ships to workers in the task closure — the hashing trick
    exists precisely so the model never scales with the corpus. Score
    = a second stateless tokenize pass + per-doc combiner sums; no
    shuffle ever carries raw text. Returns (doc_id, n_grams, dsir_e6)
    per non-empty document.
    """
    from .relational import preagg_sum

    def fit_partial(batch: pa.Table) -> pa.Table:
        gdocs, buckets = _hashed_gram_buckets(batch, text_col, id_col,
                                              dim)
        tgt = (batch.column(target_col).to_pandas()
               == target_value).to_numpy()
        tgt_ids = batch.column(id_col).to_pandas() \
            .astype("int64").to_numpy()[tgt]
        is_t = np.isin(gdocs, tgt_ids)
        df = pd.DataFrame({"bucket": buckets,
                           "ct": is_t.astype("int64"),
                           "cr": np.ones(len(buckets), dtype="int64")})
        g = df.groupby("bucket", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    cnt = preagg_sum(
        ds.map_batches(fit_partial, batch_format="pyarrow"),
        ["bucket"], {"ct": "ct", "cr": "cr"}).to_pandas()
    # the ratio table is dim-sized by construction — exact Python-int
    # numer/denom, one double ln per bucket
    nt = int(cnt["ct"].sum())
    nr = int(cnt["cr"].sum())
    r_e6 = np.zeros(dim, dtype="int64")
    for b, ct, cr in zip(cnt["bucket"], cnt["ct"], cnt["cr"]):
        num = (int(ct) + 1) * (nr + dim)
        den = (int(cr) + 1) * (nt + dim)
        r_e6[int(b)] = math.floor(
            1_000_000 * math.log(float(num) / float(den)))

    def score(batch: pa.Table) -> pa.Table:
        gdocs, buckets = _hashed_gram_buckets(batch, text_col, id_col,
                                              dim)
        if not len(gdocs):
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_grams": pa.array([], pa.int64()),
                             "dsir_e6": pa.array([], pa.int64())})
        df = pd.DataFrame({id_col: gdocs, "r": r_e6[buckets]})
        g = df.groupby(id_col, as_index=False).agg(
            n_grams=("r", "size"), dsir_e6=("r", "sum"))
        g["n_grams"] = g["n_grams"].astype("int64")
        g["dsir_e6"] = g["dsir_e6"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    return ds.map_batches(score, batch_format="pyarrow")


def contamination_counts_distributed(ds, bench_ds, n: int = 3,
                                     text_col: str = "text",
                                     id_col: str = "doc_id",
                                     bench_text_col: str = "text",
                                     num_partitions: int | None = None):
    """Fully-distributed twin of :func:`contamination_counts` — the
    100-TB decontamination route where the benchmark n-gram inventory
    outgrows the driver/closure broadcast (e.g. "remove everything
    that overlaps ANY eval set" across hundreds of benchmarks).

    Both sides stay Datasets end-to-end: corpus gram OCCURRENCES are
    pre-aggregated per (doc, gram) inside each batch (the combiner —
    what crosses the wire is distinct-gram rows with counts, not one
    row per token), the benchmark side is reduced to per-block distinct
    grams plus one pair-hash distinct exchange, and the overlap is ONE
    gram-keyed hash-shuffle join (left_outer) + a per-doc combiner
    fold. Same contract as the broadcast twin: one row per doc with
    ≥ n tokens, ``n_grams`` = total gram occurrences,
    ``n_contaminated`` = occurrences whose gram appears in the bench.

    Reference analog: the smart-edge anti-join of
    arangors-graph-exporter (src/graph_loader.rs:394-462) — a keyed
    existence probe expressed as a join, never a driver set.
    """
    from raygraph.ops.graph import _repaired

    from .relational import hash_aggregate, preagg_sum, shuffle_join

    id_schema = pa.schema([(id_col, pa.int64()), ("ngram", pa.string()),
                           ("occ", pa.int64())])

    def corpus_grams(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas()
        ids = batch.column(id_col).to_pandas()
        grams = _doc_ngrams(s, n)
        if not len(grams):
            return id_schema.empty_table()
        df = pd.DataFrame({
            id_col: ids.loc[grams.index].to_numpy(),
            "ngram": grams["ngram"].to_numpy(),
        })
        g = df.groupby([id_col, "ngram"], as_index=False).size() \
            .rename(columns={"size": "occ"})
        g[id_col] = g[id_col].astype("int64")
        g["occ"] = g["occ"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    corpus = _repaired(
        ds.map_batches(corpus_grams, batch_format="pyarrow"), id_schema)

    def bench_grams(batch: pa.Table) -> pa.Table:
        grams = _doc_ngrams(batch.column(bench_text_col).to_pandas(), n)
        u = grams["ngram"].drop_duplicates() if len(grams) \
            else pd.Series([], dtype=object)
        return pa.table({"__bench_gram": pa.array(u, pa.string()),
                         "__hit": pa.array(np.ones(len(u), np.int64))})

    bench = _repaired(
        hash_aggregate(
            bench_ds.map_batches(bench_grams, batch_format="pyarrow"),
            ["__bench_gram"], lambda df: df.drop_duplicates()),
        pa.schema([("__bench_gram", pa.string()),
                   ("__hit", pa.int64())]))

    out_schema = pa.schema([(id_col, pa.int64()),
                            ("n_grams", pa.int64()),
                            ("n_contaminated", pa.int64())])

    if bench.count() == 0:
        # a fully-empty join side loses its schema inside Ray's
        # hash-shuffle aggregator — short-circuit: nothing can overlap
        def totals(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            g = df.groupby(id_col, as_index=False).agg(
                n_grams=("occ", "sum"))
            g["n_contaminated"] = 0
            for c in ("n_grams", "n_contaminated"):
                g[c] = g[c].astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False)

        return _repaired(
            preagg_sum(corpus.map_batches(totals, batch_format="pyarrow"),
                       [id_col], {"n_grams": "n_grams",
                                  "n_contaminated": "n_contaminated"}),
            out_schema)

    joined = shuffle_join(corpus, bench, on="ngram",
                          right_on="__bench_gram", how="left_outer",
                          num_partitions=num_partitions)

    def fold(batch: pa.Table) -> pa.Table:
        if "__hit" not in batch.schema.names:
            # all-empty bench side loses its columns (schema-repair rule)
            df = batch.to_pandas()
            df["__hit"] = 0
        else:
            df = batch.to_pandas()
            df["__hit"] = df["__hit"].fillna(0).astype("int64")
        df["__cont"] = df["occ"] * df["__hit"]
        g = df.groupby(id_col, as_index=False).agg(
            n_grams=("occ", "sum"), n_contaminated=("__cont", "sum"))
        for c in ("n_grams", "n_contaminated"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    return _repaired(
        preagg_sum(joined.map_batches(fold, batch_format="pyarrow"),
                   [id_col], {"n_grams": "n_grams",
                              "n_contaminated": "n_contaminated"}),
        out_schema)


def quality_prune(ds, q_pct: int = 40, group_col: str = "lang",
                  text_col: str = "text", id_col: str = "doc_id"):
    """Per-domain quality pruning — the CCNet-style budget filter:
    every group (language / source) keeps only documents whose quality
    score reaches that group's own ``q_pct``-th percentile, so a
    high-resource domain can't crowd out a low-resource one under a
    single global threshold.

    Two passes, both scale-safe: pass 1 scores each batch with
    :func:`quality_score` (4-dp floored ⇒ exact e4 integers) and feeds
    ONE value-count combiner exchange (:func:`grouped_quantiles` — the
    grid is ≤ 10001 distinct values per group no matter the corpus);
    the thresholds are a groups-sized driver frame that rides the
    task closure into a stateless pass-2 filter (ties kept: score ≥
    threshold, matching ``percentile_disc``).

    Returns survivors as ``(id_col, group_col, q_e4)``.

    Reference analog: the per-collection filter push-down of
    arangors-graph-exporter (src/graph_loader.rs:394-462).
    """
    from .relational import grouped_quantiles

    def scored(batch: pa.Table) -> pa.Table:
        qt = quality_score(batch, text_col, id_col)
        q_e4 = np.rint(
            qt.column("quality").to_numpy(zero_copy_only=False)
            * 10_000.0).astype("int64")
        return pa.table({
            id_col: batch.column(id_col),
            group_col: batch.column(group_col),
            "q_e4": pa.array(q_e4, pa.int64()),
        })

    sds = ds.map_batches(scored, batch_format="pyarrow")
    col = f"t{int(q_pct):02d}"
    thr = grouped_quantiles(sds, [group_col], "q_e4",
                            qs=(q_pct / 100.0,), prefix="t").to_pandas()
    tmap = dict(zip(thr[group_col], thr[col].astype("int64")))

    def keep(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        t = df[group_col].map(tmap)
        return pa.Table.from_pandas(df[df["q_e4"] >= t],
                                    preserve_index=False)

    return sds.map_batches(keep, batch_format="pyarrow")
