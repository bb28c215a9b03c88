"""Graph export API — parity surface with the reference's ``GraphLoader``.

Reference entry points re-expressed Ray-Data-first:

* ``GraphLoader::new_named`` (src/graph_loader.rs:328-364) →
  :meth:`GraphLoader.new_named` — resolves a named graph definition to
  vertex + edge collection lists (S3, src/graph_loader.rs:1029-1109;
  vertex collections = sorted deduped union of edgeDefinitions from/to,
  :1076-1106).
* ``GraphLoader::new_custom`` (src/graph_loader.rs:366-375) →
  :meth:`GraphLoader.new_custom` — explicit per-collection field lists.
* ``do_vertices`` / ``do_edges`` (src/graph_loader.rs:377, :629) →
  :meth:`GraphLoader.do_vertices` / :meth:`do_edges` (callback parity,
  K1/K2) and the Ray-idiomatic :meth:`vertex_dataset` /
  :meth:`edge_dataset` returning a streaming ``ray.data.Dataset``.

The "database" is a directory of ``<collection>.parquet`` (or
``.lance``) tables plus an optional ``graphs.json``::

    {"<graph>": {"edgeDefinitions":
        [{"collection": "E", "from": ["V1"], "to": ["V2"]}]}}

Semantics reproduced (SURVEY.md §2.3):

* field projection in field-list order, absent field → null (M5,
  src/graph_loader.rs:455-470)
* ``@collection_name`` computed from ``_id``; edges without ``_id`` get
  the literal ``"n/A - _id is missing"`` (M6, src/graph_loader.rs:51-56)
* required-field augmentation: ``_id`` always fetched for vertices;
  ``_from``/``_to`` for edges; edge ``_id`` fetched iff
  ``@collection_name`` requested (M10, src/graph_loader.rs:936-976)
* load-all modes strip exactly the meta fields the reference strips:
  ``_id`` for vertices, ``_from``/``_to`` for edges (M7,
  src/graph_loader.rs:448-450, :705-708)
* field-set union across collections (A1, src/graph_loader.rs:927-934) —
  made deterministic (sorted) where the reference's HashSet order is not
* mutual-exclusion validation (C2, src/graph_loader.rs:253-271)

Server-side projection pushdown (M8/M9) becomes real columnar pushdown:
``read_parquet(columns=...)`` reads only requested columns.
"""

from __future__ import annotations

import json
import os
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from .config import CollectionInfo, DataLoadConfig, verify_parameters
from .errors import (
    CollectionNotFoundError,
    EmptyGraphError,
    GraphNotFoundError,
    MissingEndpointError,
    MissingIdError,
)
from .schemas import MISSING_ID_COLLECTION

COLLECTION_NAME_FIELD = "@collection_name"
GRAPHS_FILE = "graphs.json"


# --------------------------------------------------------------------- source
class GraphSource:
    """Directory-of-tables 'database' (S3/S4 analog: metadata comes from
    table manifests instead of HTTP probes)."""

    def __init__(self, db_dir: str):
        if not os.path.isdir(db_dir):
            raise CollectionNotFoundError(f"database directory not found: {db_dir}")
        self.db_dir = db_dir

    def collection_path(self, name: str) -> str:
        for ext in (".parquet", ".lance"):
            p = os.path.join(self.db_dir, name + ext)
            if os.path.exists(p):
                return p
        raise CollectionNotFoundError(f"collection not found: {name}")

    def collection_schema(self, name: str) -> pa.Schema:
        path = self.collection_path(name)
        if path.endswith(".lance"):
            try:
                import lance
            except ImportError as e:  # pragma: no cover - absent in sandbox
                raise ImportError(
                    "lance is not installed; use a parquet collection"
                ) from e
            return lance.dataset(path).schema
        return pq.read_schema(path)

    def graph_definition(self, graph_name: str) -> list[dict]:
        """edgeDefinitions of a named graph (reference
        ``fetch_edge_and_vertex_collections_by_graph``,
        src/graph_loader.rs:1047-1109)."""
        path = os.path.join(self.db_dir, GRAPHS_FILE)
        if not os.path.exists(path):
            raise GraphNotFoundError(f"no {GRAPHS_FILE} in {self.db_dir}")
        with open(path) as fh:
            graphs = json.load(fh)
        if graph_name not in graphs:
            raise GraphNotFoundError(f"graph not found: {graph_name}")
        return graphs[graph_name]["edgeDefinitions"]

    def graph_collections(self, graph_name: str) -> tuple[list[str], list[str]]:
        """(vertex collections, edge collections). Vertex list = sorted
        deduped union of all from/to (reference sort+dedup,
        src/graph_loader.rs:1076-1106)."""
        defs = self.graph_definition(graph_name)
        edge_colls = [d["collection"] for d in defs]
        verts: set[str] = set()
        for d in defs:
            verts.update(d.get("from", []))
            verts.update(d.get("to", []))
        return sorted(verts), edge_colls


# --------------------------------------------------------------------- loader
def _unified_fields(collections: list[CollectionInfo]) -> list[str]:
    """A1 field-set union; deterministic (sorted) unlike the reference's
    HashSet iteration order (src/graph_loader.rs:927-934)."""
    fields: set[str] = set()
    for c in collections:
        fields.update(c.fields)
    return sorted(fields)


def _project_batch(
    fields: list[str],
    identity_cols: tuple[str, ...],
    load_all: bool,
    field_types: dict[str, pa.DataType] | None = None,
):
    """Build the per-batch projection fn: identity columns first, then the
    requested fields in unified-field-list order; absent field → null
    (M5); ``@collection_name`` synthesized from ``_id`` (M6).

    ``field_types`` maps each requested field to its Arrow type wherever a
    sibling collection in the same union declares it — absent fields are
    null-filled at THAT type so ``Dataset.union`` across heterogeneous
    collections keeps a consistent schema (the schemaless reference has no
    such constraint; see src/graph_loader.rs:455-470).

    In load-all mode the batch passes through unchanged — identity columns
    stay in the *Dataset* (they are the export's primary output) and are
    excluded from the *field list* instead, matching the reference's strip
    of meta fields from the returned document (M7).
    """
    field_types = field_types or {}

    def fn(batch: pa.Table) -> pa.Table:
        if load_all:
            return batch

        n = batch.num_rows
        cols: dict[str, pa.Array | pa.ChunkedArray] = {}
        for name in identity_cols:
            if name in batch.schema.names:
                cols[name] = batch.column(name)
        for f in fields:
            if f in cols:
                continue
            if f == COLLECTION_NAME_FIELD:
                if "_id" in batch.schema.names:
                    # mirror collection_name_from_id (src/graph_loader.rs:
                    # 51-56): prefix before '/', '' when the id has no '/',
                    # sentinel only for an absent (null) _id
                    ids = batch.column("_id")
                    split = pc.split_pattern(ids, "/", max_splits=1)
                    first = pc.list_element(split, 0)
                    cn = pc.if_else(pc.match_substring(ids, "/"), first,
                                    pa.scalar("", pa.string()))
                    cn = pc.fill_null(cn, MISSING_ID_COLLECTION)
                else:
                    # edges without _id (optional, src/graph_loader.rs:710-715)
                    cn = pa.array([MISSING_ID_COLLECTION] * n, pa.string())
                cols[COLLECTION_NAME_FIELD] = cn
            elif f in batch.schema.names:
                col = batch.column(f)
                want = field_types.get(f)
                if want is not None and col.type != want:
                    # heterogeneous union rule: the FIRST collection
                    # declaring the field wins the type; siblings cast
                    # to it (a non-castable value raises loudly rather
                    # than emitting a mixed-schema union). Pinned by
                    # tests/test_exporter.py::test_heterogeneous_union_
                    # first_declarer_type_wins.
                    col = pc.cast(col, want)
                cols[f] = col
            else:
                # absent field → null (M5), typed like the sibling
                # collection that has it (string when nobody does)
                cols[f] = pa.nulls(n, field_types.get(f, pa.string()))
        return pa.table(cols)

    return fn


class GraphLoader:
    """Parallel bulk reader over a graph's vertex + edge collections."""

    def __init__(
        self,
        source: GraphSource,
        vertex_collections: list[CollectionInfo],
        edge_collections: list[CollectionInfo],
        config: DataLoadConfig | None = None,
    ):
        self.source = source
        self.config = config or DataLoadConfig()
        self.vertex_collections = list(vertex_collections)
        self.edge_collections = list(edge_collections)
        verify_parameters(self.config, self.vertex_collections, self.edge_collections)
        # eager existence check: the reference's CLUSTER deployments fail
        # at init for unknown collections (shard map computation,
        # tests/graph_loader.rs:877-907); single-server defers the failure
        # to load time — eager_collection_check=False mirrors that branch
        if self.config.eager_collection_check:
            for c in self.vertex_collections + self.edge_collections:
                self.source.collection_path(c.name)

    # -- constructors ------------------------------------------------------
    @classmethod
    def new_named(
        cls,
        db_dir: str,
        graph_name: str,
        vertex_fields: tuple[str, ...] = (),
        edge_fields: tuple[str, ...] = (),
        config: DataLoadConfig | None = None,
    ) -> "GraphLoader":
        """Global field lists applied uniformly to every collection
        (reference src/graph_loader.rs:340-354)."""
        src = GraphSource(db_dir)
        vnames, enames = src.graph_collections(graph_name)
        return cls(
            src,
            [CollectionInfo(n, tuple(vertex_fields)) for n in vnames],
            [CollectionInfo(n, tuple(edge_fields)) for n in enames],
            config,
        )

    @classmethod
    def new_custom(
        cls,
        db_dir: str,
        vertex_collections: list[CollectionInfo],
        edge_collections: list[CollectionInfo],
        config: DataLoadConfig | None = None,
    ) -> "GraphLoader":
        return cls(GraphSource(db_dir), vertex_collections, edge_collections, config)

    # -- datasets ----------------------------------------------------------
    def _union_field_types(self, collections: list[CollectionInfo],
                           fields: list[str]) -> dict[str, pa.DataType]:
        """field → Arrow type across all collections of one union side
        (first collection declaring the field wins), so absent-field null
        fills are typed consistently with the sibling that has the data."""
        out: dict[str, pa.DataType] = {}
        for c in collections:
            schema = self.source.collection_schema(c.name)
            for f in fields:
                if f not in out and f in schema.names:
                    out[f] = schema.field(f).type
        return out

    def _collection_dataset(
        self, info: CollectionInfo, is_edge: bool, load_all: bool
    ) -> ray.data.Dataset:
        fields = _unified_fields(
            self.edge_collections if is_edge else self.vertex_collections
        )
        schema = self.source.collection_schema(info.name)
        if load_all:
            read_cols = None  # whole document (M7)
        else:
            # M10 required-field augmentation
            need: set[str] = set(f for f in fields if f != COLLECTION_NAME_FIELD)
            if is_edge:
                need.update(("_from", "_to"))
                if COLLECTION_NAME_FIELD in fields:
                    need.add("_id")
            else:
                need.add("_id")
            read_cols = sorted(need & set(schema.names))
            mandatory = ("_from", "_to") if is_edge else ("_id",)
            for m in mandatory:
                if m not in schema.names:
                    raise (MissingEndpointError if is_edge else MissingIdError)(
                        f"collection {info.name} lacks mandatory column {m}"
                    )
        ds = ray.data.read_parquet(self.source.collection_path(info.name),
                                   columns=read_cols)
        proj = _project_batch(
            fields,
            identity_cols=("_from", "_to") if is_edge else ("_id",),
            load_all=load_all,
            field_types=self._union_field_types(
                self.edge_collections if is_edge else self.vertex_collections,
                fields,
            ),
        )
        return ds.map_batches(proj, batch_format="pyarrow",
                              batch_size=self.config.batch_size)

    def vertex_dataset(self) -> ray.data.Dataset:
        """All vertex collections as one streaming Dataset (unioned).

        An EMPTY collection list errors with the reference's literal
        message (tests/graph_loader.rs:820-826); an existing collection
        with zero documents streams zero rows without error (the
        single-server AQL branch, tests/graph_loader.rs:833-839).
        """
        if not self.vertex_collections:
            raise EmptyGraphError("No vertex collections given!")
        load_all = self.config.load_all_vertex_attributes
        parts = [
            self._collection_dataset(c, is_edge=False, load_all=load_all)
            for c in self.vertex_collections
        ]
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        return ds

    def edge_dataset(self) -> ray.data.Dataset:
        if not self.edge_collections:
            raise EmptyGraphError("No edge collections given!")
        load_all = self.config.load_all_edge_attributes
        parts = [
            self._collection_dataset(c, is_edge=True, load_all=load_all)
            for c in self.edge_collections
        ]
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        return ds

    # -- callback sinks (K1/K2 parity) ------------------------------------
    def _field_names(self, is_edge: bool, load_all: bool,
                     sample: pa.Table) -> list[str]:
        if load_all:
            strip = ("_from", "_to") if is_edge else ("_id",)
            return [c for c in sample.schema.names if c not in strip]
        return _unified_fields(self.edge_collections if is_edge
                               else self.vertex_collections)

    def _consume(self, batches, emit) -> int:
        """Drive ``emit(batch)`` over the batch stream on
        ``config.parallelism`` threads — parity with the reference, whose
        consumers invoke the user callback CONCURRENTLY from
        ``parallelism`` tasks (Send+Sync+Clone contract,
        src/graph_loader.rs:379-383; consumer spawn :386-420). Callbacks
        must therefore be thread-safe; batch order across threads is not
        guaranteed (batch ids are striped in the reference too,
        src/sharding.rs:270-271). In-flight work is bounded (2×
        parallelism) so a slow callback backpressures the stream;
        fail-fast on the first callback exception."""
        par = max(1, self.config.parallelism)
        total = 0
        if par == 1:
            for b in batches:
                emit(b)
                total += b.num_rows
            return total
        from concurrent.futures import (
            FIRST_COMPLETED,
            ThreadPoolExecutor,
            wait,
        )

        pending: set = set()
        with ThreadPoolExecutor(max_workers=par) as pool:
            for b in batches:
                total += b.num_rows
                pending.add(pool.submit(emit, b))
                if len(pending) >= 2 * par:
                    done, pending = wait(pending, return_when=FIRST_COMPLETED)
                    for f in done:
                        f.result()
            for f in pending:
                f.result()
        return total

    def do_vertices(self, cb: Callable[[list[bytes], list[list], list[str]], None]) -> int:
        """Stream vertex batches into ``cb(ids, rows, field_names)``.

        Parity with the reference vertex callback
        (src/graph_loader.rs:377-384): ids are raw UTF-8 bytes; ``rows`` is
        the row-major list of per-field value lists. A null ``_id``
        raises :class:`MissingIdError` (src/graph_loader.rs:440-445).
        ``cb`` runs concurrently on ``config.parallelism`` threads (see
        :meth:`_consume`). Returns total rows.
        """
        load_all = self.config.load_all_vertex_attributes

        def emit(batch: pa.Table) -> None:
            ids_arr = batch.column("_id") if "_id" in batch.schema.names else None
            if ids_arr is None or ids_arr.null_count:
                raise MissingIdError("vertex batch with missing _id")
            ids = [s.encode() for s in ids_arr.to_pylist()]
            field_names = self._field_names(False, load_all, batch)
            data_cols = [batch.column(f).to_pylist() if f in batch.schema.names
                         else [None] * batch.num_rows for f in field_names]
            rows = [list(r) for r in zip(*data_cols)] if data_cols else [
                [] for _ in range(batch.num_rows)
            ]
            cb(ids, rows, field_names)

        return self._consume(
            self.vertex_dataset().iter_batches(
                batch_size=self.config.batch_size, batch_format="pyarrow"
            ),
            emit,
        )

    def do_edges(
        self, cb: Callable[[list[bytes], list[bytes], list[list], list[str]], None]
    ) -> int:
        """Stream edge batches into ``cb(from_ids, to_ids, rows,
        field_names)`` (reference src/graph_loader.rs:629-641); ``cb``
        runs concurrently on ``config.parallelism`` threads."""
        load_all = self.config.load_all_edge_attributes

        def emit(batch: pa.Table) -> None:
            names = batch.schema.names
            if "_from" not in names or "_to" not in names:
                raise MissingEndpointError("edge batch lacks _from/_to")
            froms = batch.column("_from")
            tos = batch.column("_to")
            if froms.null_count or tos.null_count:
                raise MissingEndpointError("edge with null _from/_to")
            from_ids = [s.encode() for s in froms.to_pylist()]
            to_ids = [s.encode() for s in tos.to_pylist()]
            field_names = self._field_names(True, load_all, batch)
            data_cols = [batch.column(f).to_pylist() if f in names
                         else [None] * batch.num_rows for f in field_names]
            rows = [list(r) for r in zip(*data_cols)] if data_cols else [
                [] for _ in range(batch.num_rows)
            ]
            cb(from_ids, to_ids, rows, field_names)

        return self._consume(
            self.edge_dataset().iter_batches(
                batch_size=self.config.batch_size, batch_format="pyarrow"
            ),
            emit,
        )


# ------------------------------------------------------------- thin wrappers
def load_named_graph(db_dir: str, graph_name: str, **kwargs) -> GraphLoader:
    """Reference ``load_named_graph`` (src/load.rs:6-21)."""
    return GraphLoader.new_named(db_dir, graph_name, **kwargs)


def load_custom_graph(db_dir, vertex_collections, edge_collections, **kwargs):
    """Reference ``load_custom_graph`` (src/load.rs:23-30)."""
    return GraphLoader.new_custom(db_dir, vertex_collections, edge_collections, **kwargs)
