"""Text-analysis operators for large-scale training-data pipelines.

All are stateless vectorized ``map_batches`` stages over a ``text`` column
(pandas string kernels / numpy). Where a DuckDB oracle exists
(``__ray_entry__.py``), the Python semantics are defined to match the SQL
exactly (token = maximal run of non-whitespace, etc.).
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

_TOKEN = re.compile(r"\S+")
_WORD = re.compile(r"\w+", re.UNICODE)
_PUNCT = re.compile(r"[^\w\s]")

# small per-language stopword profiles for the n-gram/stopword heuristic
STOPWORDS: dict[str, frozenset] = {
    "en": frozenset("the a of to and in is it you that was for on are with as i his they be at".split()),
    "fr": frozenset("le la les de des un une et en est que qui dans pour sur avec ne pas au du".split()),
    "de": frozenset("der die das und ist in den von zu mit sich des auf für nicht ein eine als auch es".split()),
    "es": frozenset("el la los las de un una y en es que no por con para su al lo como más".split()),
    "zh": frozenset("的 是 不 了 在 人 有 我 他 这 个 们 中 来 上 大 为 和 国".split()),
}


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


def quality_score(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Heuristic document quality in [0, 1]: combines length band,
    punctuation ratio, stopword(en) ratio, repetition (1 - ttr)."""
    s = batch.column(text_col).to_pandas().fillna("")
    n_chars = s.str.len()
    toks = s.str.lower().str.findall(_WORD)
    n_tok = toks.map(len).replace(0, 1)
    stop_ratio = toks.map(lambda t: sum(w in STOPWORDS["en"] for w in t)) / n_tok
    punct_ratio = s.str.count(_PUNCT) / n_chars.replace(0, 1)
    uniq_ratio = toks.map(lambda t: len(set(t))) / n_tok
    len_score = np.clip(n_chars / 500.0, 0, 1)  # favor >=500-char docs
    score = (
        0.35 * len_score
        + 0.25 * np.clip(stop_ratio * 4, 0, 1)
        + 0.2 * uniq_ratio
        + 0.2 * (1 - np.clip(punct_ratio * 5, 0, 1))
    ).round(4)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "quality": pa.array(score.astype("float64"), pa.float64()),
        }
    )


def lang_id(batch: pa.Table, text_col: str = "text",
            id_col: str = "doc_id") -> pa.Table:
    """Stopword-profile language ID (n-gram-free heuristic): argmax over
    per-language stopword hit-rates; 'und' (undetermined) when nothing
    hits. Vectorized per unique token via a token->lang score table."""
    s = batch.column(text_col).to_pandas().fillna("")
    langs = list(STOPWORDS)
    toks = s.str.lower().str.findall(_WORD)

    def best(tokens: list[str]) -> str:
        if not tokens:
            return "und"
        scores = [sum(t in STOPWORDS[lg] for t in tokens) for lg in langs]
        m = max(scores)
        return langs[int(np.argmax(scores))] if m > 0 else "und"

    out = toks.map(best)
    return pa.table({id_col: batch.column(id_col),
                     "lang_pred": pa.array(out, pa.string())})


def doc_fingerprint(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """Deterministic 64-bit rolling-hash fingerprint over the token
    sequence (order-sensitive; stable across processes — crc32-based, not
    Python hash())."""
    s = batch.column(text_col).to_pandas().fillna("")
    toks = s.str.findall(_TOKEN)

    def roll(tokens: list[str]) -> int:
        h = 1469598103934665603  # FNV offset
        for t in tokens:
            h = (h * 1099511628211 + zlib.crc32(t.encode())) % (1 << 63)
        return h

    fp = toks.map(roll)
    return pa.table({id_col: batch.column(id_col),
                     "fingerprint": pa.array(fp, pa.int64())})
