"""Triple extraction — stateless vectorized ``map_batches`` stage.

The KG analog of the reference's per-record parse + key extraction
(M1/M3/M4: src/graph_loader.rs:420-446, :663-703): each document's span
sequence is scanned and (subj_surface, pred, obj_surface) pattern hits are
emitted with (doc_id, span_idx) lineage.

Rules are table-driven (SURVEY.md §7 hard part 5) and applied with
*vectorized* pandas ``str.extract`` over the flattened span texts — no
Python loop over rows. Text spans get the SVO pattern table; media spans
get the caption rules after stripping the ``caption:`` prefix. A span
matches at most one pattern (first in priority order).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..schemas import RAW_TRIPLE_SCHEMA

# (pred, compiled pattern, confidence), priority order. Patterns anchor the
# whole span so greedy/lazy capture is unambiguous; trailing '.' excluded
# from the object surface.
TEXT_PATTERNS: tuple[tuple[str, re.Pattern, float], ...] = (
    ("connected_to", re.compile(r"^(?P<subj>.+?) is connected to (?P<obj>.+?)\.?$"), 0.95),
    ("located_in", re.compile(r"^(?P<subj>.+?) is located in (?P<obj>.+?)\.?$"), 0.90),
    ("works_for", re.compile(r"^(?P<subj>.+?) works for (?P<obj>.+?)\.?$"), 0.90),
    ("part_of", re.compile(r"^(?P<subj>.+?) is part of (?P<obj>.+?)\.?$"), 0.90),
    ("knows", re.compile(r"^(?P<subj>.+?) knows (?P<obj>.+?)\.?$"), 0.85),
    ("is_a", re.compile(r"^(?P<subj>.+?) is an? (?P<obj>.+?)\.?$"), 0.80),
)

CAPTION_PREFIX = "caption:"
CAPTION_PATTERNS: tuple[tuple[str, re.Pattern, float], ...] = (
    ("connected_to", re.compile(r"^(?P<subj>.+?) links (?P<obj>.+?)\s*$"), 0.80),
    ("depicts", re.compile(r"^(?P<subj>.+?) depicts (?P<obj>.+?)\s*$"), 0.75),
)


def _flatten(batch: pa.Table):
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False).astype("int64")
    n = int(lengths.sum())
    # span_idx within each document
    starts = np.repeat(np.cumsum(lengths) - lengths, lengths)
    span_idx = (np.arange(n) - starts).astype("int32")
    parent = np.repeat(np.arange(len(lengths)), lengths)
    return flat, parent, span_idx


def _apply_patterns(
    texts: pd.Series,
    patterns,
    doc_ids: np.ndarray,
    span_idx: np.ndarray,
    out: list,
) -> None:
    """Run each pattern over ``texts``; first match per span wins.

    ``texts.index`` carries the position within the flattened span arrays,
    so ``doc_ids`` / ``span_idx`` (per-flat-span arrays) are indexed by it.
    """
    remaining = texts
    for pred, rx, conf in patterns:
        if remaining.empty:
            break
        m = remaining.str.extract(rx)
        hit = m["subj"].notna().to_numpy()
        if not hit.any():
            continue
        rows = remaining.index.to_numpy()[hit]
        out.append(
            {
                "doc_id": doc_ids[rows],
                "span_idx": span_idx[rows],
                "subj_surface": m["subj"].to_numpy()[hit],
                "pred": np.full(int(hit.sum()), pred, dtype=object),
                "obj_surface": m["obj"].to_numpy()[hit],
                "conf": np.full(int(hit.sum()), conf, dtype="float32"),
            }
        )
        remaining = remaining[~hit]


def extract_triples(batch: pa.Table) -> pa.Table:
    """``map_batches`` fn: documents batch → RAW_TRIPLE_SCHEMA batch."""
    flat, parent, span_idx = _flatten(batch)
    if len(flat) == 0:
        return RAW_TRIPLE_SCHEMA.empty_table()

    doc_ids = (
        batch.column("doc_id").combine_chunks()
        if isinstance(batch.column("doc_id"), pa.ChunkedArray)
        else batch.column("doc_id")
    ).to_numpy(zero_copy_only=False)[parent]
    kinds = flat.field("kind").to_numpy(zero_copy_only=False)
    texts = pd.Series(flat.field("text").to_numpy(zero_copy_only=False))

    out: list[dict] = []

    text_mask = kinds == "text"
    if text_mask.any():
        _apply_patterns(texts[text_mask], TEXT_PATTERNS, doc_ids, span_idx, out)

    media_mask = kinds == "media"
    if media_mask.any():
        caps = texts[media_mask]
        has_prefix = caps.str.startswith(CAPTION_PREFIX)
        caps = caps[has_prefix].str.slice(len(CAPTION_PREFIX)).str.strip()
        if len(caps):
            _apply_patterns(caps, CAPTION_PATTERNS, doc_ids, span_idx, out)

    if not out:
        return RAW_TRIPLE_SCHEMA.empty_table()

    cols = {
        name: np.concatenate([o[name] for o in out])
        for name in ("doc_id", "span_idx", "subj_surface", "pred", "obj_surface", "conf")
    }
    return pa.table(
        {
            "doc_id": pa.array(cols["doc_id"], pa.string()),
            "span_idx": pa.array(cols["span_idx"], pa.int32()),
            "subj_surface": pa.array(cols["subj_surface"], pa.string()),
            "pred": pa.array(cols["pred"], pa.string()),
            "obj_surface": pa.array(cols["obj_surface"], pa.string()),
            "conf": pa.array(cols["conf"], pa.float32()),
        }
    )
