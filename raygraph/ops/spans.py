"""Span-sequence validation (stateless ``map_batches`` stage).

Analog of the reference's per-record parse + mandatory-field validation
(M1/M3: JSONL parse src/graph_loader.rs:420-431, ``_id`` extraction
:432-446 — malformed record = hard error for the load). Here the
per-row invariant is the BASELINE.json input contract: every document has
a non-null span list, every span has kind ∈ {text, media}, and offsets
are strictly increasing (the interleaving order).

The stage passes batches through **unchanged** (zero-copy): the ``spans``
column must survive the pipeline byte-identical (FIXTURES.md F1 per-row
invariant), so we never explode-and-rebuild it.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..errors import SpanValidationError
from ..schemas import SPAN_KINDS


def _flat_spans(batch: pa.Table):
    """(flattened struct array, per-row list lengths) for the spans column."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    return spans.flatten(), lengths


def validate_spans(batch: pa.Table) -> pa.Table:
    """Raise :class:`SpanValidationError` on contract violations; else
    return the batch untouched."""
    spans = batch.column("spans")
    null_rows = pc.sum(pc.cast(pc.is_null(spans), pa.int64())).as_py() or 0
    if null_rows:
        raise SpanValidationError(f"{null_rows} documents with null span list")

    flat, lengths = _flat_spans(batch)
    if len(flat) == 0:
        return batch

    kinds = flat.field("kind")
    bad_kind = pc.sum(
        pc.cast(pc.invert(pc.is_in(kinds, value_set=pa.array(SPAN_KINDS))), pa.int64())
    ).as_py() or 0
    if bad_kind:
        raise SpanValidationError(f"{bad_kind} spans with kind not in {SPAN_KINDS}")

    offsets = flat.field("offset").to_numpy(zero_copy_only=False)
    if np.isnan(offsets.astype("float64")).any():
        raise SpanValidationError("null span offsets")
    # strictly increasing within each document: diff > 0 everywhere except at
    # list starts
    if len(offsets) > 1:
        starts = np.zeros(len(offsets), dtype=bool)
        starts[np.cumsum(lengths)[:-1]] = True
        starts[0] = True
        diffs_ok = np.diff(offsets) > 0
        interior = ~starts[1:]
        if not diffs_ok[interior].all():
            raise SpanValidationError("span offsets not strictly increasing")
    return batch


def span_fingerprint(batch: pa.Table) -> pa.Table:
    """Per-row sha1 over the ordered ``(kind, text, media_ref, order)``
    sequence — the equality fingerprint used by tests to assert the spans
    column survived the pipeline (FIXTURES.md F1)."""
    flat, lengths = _flat_spans(batch)
    kinds = flat.field("kind").to_pylist()
    texts = flat.field("text").to_pylist()
    refs = flat.field("media_ref").to_pylist()
    out = []
    pos = 0
    for n in lengths:
        h = hashlib.sha1()
        for j in range(pos, pos + int(n)):
            h.update(f"{kinds[j]}\x00{texts[j]}\x00{refs[j]}\x00{j - pos}\x01".encode())
        out.append(h.hexdigest())
        pos += int(n)
    return pa.table(
        {"doc_id": batch.column("doc_id"), "span_fp": pa.array(out, pa.string())}
    )


def span_stats(batch: pa.Table) -> pa.Table:
    """Per-document span statistics straight off the list<struct> column
    — zero-copy Arrow: list offsets give n_spans, the flattened ``kind``
    child + ``np.add.reduceat`` gives per-row kind counts; the span
    structs are never rebuilt row-wise."""
    import numpy as np

    spans = batch.column("spans").combine_chunks()
    n = pc.list_value_length(spans).to_numpy(zero_copy_only=False) \
        .astype("int64")
    flat = spans.flatten()
    kinds = flat.field("kind")
    is_text = pc.equal(kinds, "text").to_numpy(zero_copy_only=False) \
        .astype("int64")
    starts = np.zeros(len(n), dtype="int64")
    np.cumsum(n[:-1], out=starts[1:])
    n_text = np.zeros(len(n), dtype="int64")
    nz = n > 0
    if nz.any():
        # reduceat needs strictly valid segment starts; zero-length rows
        # contribute 0 directly
        n_text[nz] = np.add.reduceat(is_text, starts[nz])
        # reduceat on a start == len(is_text) (trailing empty rows) can't
        # occur here because starts[nz] indexes only non-empty rows
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_spans": pa.array(n, pa.int64()),
            "n_text": pa.array(n_text, pa.int64()),
            "n_media": pa.array(n - n_text, pa.int64()),
        }
    )


def render_interleaved(batch: pa.Table, sep: str = " ") -> pa.Table:
    """Render each interleaved document into ONE training sequence
    string: text spans contribute their text, media spans contribute a
    ``<media_ref>`` sentinel token (the placeholder a multimodal
    tokenizer later swaps for patch/codec embeddings) — the
    sequence-building step between a curated corpus and a trainer.

    Pure Arrow, no per-row Python: flatten the span structs once,
    compute every piece with vectorized kernels, re-wrap the original
    list offsets and ``pc.binary_join`` per document."""
    spans = batch.column("spans").combine_chunks()
    flat = spans.flatten()
    piece = pc.if_else(
        pc.equal(flat.field("kind"), "media"),
        pc.binary_join_element_wise("<", flat.field("media_ref"), ">", ""),
        flat.field("text"),
    )
    rendered = pc.binary_join(
        pa.ListArray.from_arrays(spans.offsets, piece), sep)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "rendered": rendered,
            "n_spans": pc.list_value_length(spans).cast(pa.int64()),
        }
    )


PATCH_TOKENS = 64  # training-token cost of one media span (patch budget)


def interleaved_costs(batch: pa.Table,
                      patch_tokens: int = PATCH_TOKENS) -> pa.Table:
    """Per-document multimodal training-token cost straight off the
    interleaved list<struct> spans column: text spans cost their
    whitespace token count, media spans cost the fixed ``patch_tokens``
    patch budget (captions ride along free — the tokenizer sees the
    sentinel, not the caption). Zero-copy list offsets + one vectorized
    split-count + ``np.add.reduceat``; also emits the numeric doc index
    ``i`` (parsed from ``doc/<i>``) as the packing order key."""
    spans = batch.column("spans").combine_chunks()
    n = pc.list_value_length(spans).to_numpy(zero_copy_only=False) \
        .astype("int64")
    flat = spans.flatten()
    is_media = pc.equal(flat.field("kind"), "media") \
        .to_numpy(zero_copy_only=False)
    tok = flat.field("text").to_pandas().fillna("").str.split().str.len() \
        .astype("int64").to_numpy()
    cost_flat = np.where(is_media, np.int64(patch_tokens), tok)
    starts = np.zeros(len(n), dtype="int64")
    np.cumsum(n[:-1], out=starts[1:])
    cost = np.zeros(len(n), dtype="int64")
    nz = n > 0
    if nz.any():
        cost[nz] = np.add.reduceat(cost_flat, starts[nz])
    ids = batch.column("doc_id")
    i = pc.cast(pc.utf8_slice_codeunits(ids, 4, 2**30), pa.int64())
    return pa.table({
        "doc_id": ids,
        "i": i,
        "cost": pa.array(cost, pa.int64()),
    })


def caption_context(batch: pa.Table) -> pa.Table:
    """Media↔text alignment over the interleaved spans column: for every
    media span, its caption plus the text of the LATEST preceding text
    span in the same document (span order = the list order, which the
    validator pins to strictly increasing offsets) — the
    context-harvesting step that turns an interleaved corpus into
    (image, caption, surrounding-text) training pairs.

    Vectorized: one struct flatten, a doc-index repeat off the list
    offsets, and a grouped forward-fill of text-span texts; media spans
    with no preceding text span keep a null context."""
    import pandas as pd

    spans = batch.column("spans").combine_chunks()
    flat = spans.flatten()
    n_per = pc.list_value_length(spans).to_numpy(zero_copy_only=False) \
        .astype("int64")
    doc_idx = np.repeat(np.arange(len(n_per)), n_per)
    kind = flat.field("kind").to_numpy(zero_copy_only=False)
    text = flat.field("text").to_numpy(zero_copy_only=False)
    ref = flat.field("media_ref").to_numpy(zero_copy_only=False)

    is_text = kind == "text"
    ctx = pd.Series(np.where(is_text, text, None), dtype=object) \
        .groupby(doc_idx).ffill()
    is_media = kind == "media"
    docs = batch.column("doc_id").to_numpy(zero_copy_only=False)
    return pa.table({
        "doc_id": pa.array(docs[doc_idx[is_media]], pa.string()),
        "media_ref": pa.array(ref[is_media], pa.string()),
        "caption": pa.array(text[is_media], pa.string()),
        "context": pa.array(ctx.to_numpy()[is_media], pa.string(),
                            from_pandas=True),
    })
