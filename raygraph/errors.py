"""Error taxonomy for the raygraph engine.

Semantic analog of the reference's 19-variant ``GraphLoaderError``
(/root/reference/src/errors.rs:3-70). We keep only the variants that are
meaningful for a local/columnar engine (no HTTP, no TLS); each class
documents the reference variant it corresponds to.
"""

from __future__ import annotations


class GraphBuildError(Exception):
    """Base error (reference: GraphLoaderError, src/errors.rs:3)."""


class InvalidParameterError(GraphBuildError):
    """Bad user configuration.

    Reference: ``GraphLoaderError::Other`` raised by ``verify_parameters``
    (src/graph_loader.rs:253-271) when an explicit field list is combined
    with ``load_all_*_attributes``.
    """


class JsonParseError(GraphBuildError):
    """A record is malformed (missing/mistyped mandatory field).

    Reference: ``GraphLoaderError::JsonParseError``; raised by the ``_id``
    extractor (src/graph_loader.rs:432-446) and the ``_from``/``_to``
    extractor (src/graph_loader.rs:675-703).
    """


class MissingIdError(JsonParseError):
    """Vertex row without a string ``_id`` (src/graph_loader.rs:440-445)."""


class MissingEndpointError(JsonParseError):
    """Edge row without string ``_from``/``_to`` (src/graph_loader.rs:679-703)."""


class GraphNotFoundError(GraphBuildError):
    """Unknown graph name (reference: GraphNotFound / HTTP 404 on
    ``GET /_api/gharial/<graph>``, src/graph_loader.rs:1047-1075)."""


class CollectionNotFoundError(GraphBuildError):
    """Unknown collection (reference: cluster deployments error at init
    when a collection does not exist, tests/graph_loader.rs:877-907)."""


class EmptyGraphError(GraphBuildError):
    """A required collection resolved to no data where the deployment
    contract requires some (tests/graph_loader.rs:790-875)."""


class SpanValidationError(GraphBuildError):
    """An input document violates the interleaved-span contract
    (null spans, unknown ``kind``, non-monotonic ``offset``)."""


class CheckpointError(GraphBuildError):
    """Manifest corruption or resume inconsistency."""
