"""Arrow schemas for every table that flows through the engine.

The reference is schemaless JSON (serde_json::Value everywhere,
/root/reference/src/graph_loader.rs:17); we pin explicit Arrow schemas —
the "schema" a reference user declares per-query via field lists
(CollectionInfo.fields, src/graph_loader.rs:27-31) becomes a real
columnar schema here.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- input corpus
# Exactly the BASELINE.json input_hint shape: interleaved text + media spans.
SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),        # "text" | "media"
        pa.field("text", pa.string()),        # sentence text, or media caption
        pa.field("media_ref", pa.string()),   # opaque reference; "" for text spans
        pa.field("offset", pa.int32()),       # position of the span within the doc
    ]
)

DOCUMENT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

SPAN_KINDS = ("text", "media")

# ------------------------------------------------------------------- mentions
# One row per extracted (surface, predicate, surface) pattern hit, before
# entity linking. Carries (doc_id, span_idx) lineage.
RAW_TRIPLE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
        pa.field("subj_surface", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj_surface", pa.string()),
        pa.field("conf", pa.float32()),
    ]
)

# After entity linking: surfaces resolved to entity keys.
LINKED_TRIPLE_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("span_idx", pa.int32()),
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj", pa.string()),
        pa.field("subj_surface", pa.string()),
        pa.field("obj_surface", pa.string()),
        pa.field("conf", pa.float32()),
    ]
)

# ------------------------------------------------------------- graph output
# ArangoDB-style identities: _id = "<collection>/<key>"
# (reference id format: tests/graph_loader.rs:140-141; synthesis rule
# src/graph_loader.rs:51-56).
VERTEX_SCHEMA = pa.schema(
    [
        pa.field("_id", pa.string()),
        pa.field("_key", pa.string()),
        pa.field("@collection_name", pa.string()),
        pa.field("name", pa.string()),           # most frequent surface form
        pa.field("mention_count", pa.int64()),
    ]
)

EDGE_SCHEMA = pa.schema(
    [
        pa.field("_from", pa.string()),
        pa.field("_to", pa.string()),
        pa.field("_key", pa.string()),
        pa.field("@collection_name", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("conf", pa.float32()),
        pa.field("doc_count", pa.int64()),       # lineage: docs supporting the edge
    ]
)

META_VERTEX_FIELDS = ("_id",)
META_EDGE_FIELDS = ("_from", "_to")

# Sentinel the reference emits for @collection_name when an edge has no _id
# (src/graph_loader.rs:55).
MISSING_ID_COLLECTION = "n/A - _id is missing"


def collection_of(_id: str | None) -> str:
    """Prefix of ``_id`` before the first '/', mirroring the reference
    ``collection_name_from_id`` (src/graph_loader.rs:51-56) exactly:
    an id with no '/' yields ``""``. The missing-id sentinel is reserved
    for an *absent* ``_id`` (None), as in src/graph_loader.rs:55."""
    if _id is None:
        return MISSING_ID_COLLECTION
    p = _id.find("/")
    return "" if p < 0 else _id[:p]
