"""End-to-end KG construction pipeline (SURVEY.md §3.4).

    read corpus → validate spans → extract triples → link entities
      [phase A: per-document work, checkpointed per partition]
    → canonicalize → materialize vertices + edges → write
      [phase B: the wide shuffles]

Phase A is the expensive, embarrassingly-parallel part — it streams and is
resumable (per-partition manifests, ``checkpoint.py``). Phase B reads the
phase-A triples (orders of magnitude smaller than the corpus), runs the
two shuffles (canonicalization label-prop; edge/vertex groupbys over
per-batch partials) and writes the graph tables.

Nothing here calls ``ray.init`` — the caller owns the session.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import pyarrow as pa

from . import checkpoint as ckpt
from . import stateio
from .config import GraphBuildConfig
from .io import read_documents, read_table
from .ops.canon import canonicalize
from .ops.extract import extract_triples
from .ops.link import EntityLinker
from .ops.materialize import build_edges, build_vertices, make_apply_canon
from .ops.spans import validate_spans


@dataclass
class GraphBuildResult:
    vertices_path: str
    edges_path: str
    triples_path: str
    metrics: dict = field(default_factory=dict)


def _add_part_id(num_partitions: int, part_offset: int = 0):
    def fn(batch: pa.Table) -> pa.Table:
        # to_pandas is zero-copy-ish for the single column; the old
        # to_pylist round trip built a Python list first (VERDICT r2).
        # Hash values are identical: both paths yield an object-dtype
        # Series of the same strings.
        ids = batch.column("doc_id").to_pandas()
        pid = ckpt.partition_ids(ids, num_partitions) + part_offset
        return batch.append_column("part_id",
                                   pa.array(pid, pa.int64()))

    return fn


def _skip_partitions(done: set[int]):
    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.invert(
            pc.is_in(batch.column("part_id"), value_set=pa.array(sorted(done), pa.int64()))
        )
        return batch.filter(mask)

    return fn


def extract_and_link(cfg: GraphBuildConfig, aliases: dict[str, str] | None = None):
    """Phase A as a lazy Dataset: corpus → LINKED_TRIPLE (+part_id)."""
    import ray

    # extraction stages run per block (batch_size=None): parallelism is
    # then bounded by block count, not by rows/batch_size
    docs = read_documents(cfg.input_path)
    docs = docs.map_batches(_add_part_id(cfg.num_partitions,
                                         cfg.part_offset),
                            batch_format="pyarrow")

    triples_path = stateio.join(cfg.output_path, "triples")
    if cfg.resume:
        done = ckpt.completed_partitions(triples_path)
        if done:
            docs = docs.map_batches(_skip_partitions(done), batch_format="pyarrow")
        ckpt.clean_incomplete(triples_path, cfg.num_partitions)
    else:
        # a fresh (non-resume) run must not append into a previous run's
        # checkpoint: write_parquet emits uniquely-named files, so stale
        # part_id=* dirs would double-count triples in the manifests and
        # poison any later --resume of this output_path
        stateio.rmtree(triples_path)

    docs = docs.map_batches(validate_spans, batch_format="pyarrow")

    def extract_with_part(batch: pa.Table) -> pa.Table:
        import pandas as pd

        out = extract_triples(batch, mode=cfg.extract_mode)
        ids = out.column("doc_id").to_pandas()
        pid = ckpt.partition_ids(ids, cfg.num_partitions) + cfg.part_offset
        return out.append_column("part_id", pa.array(pid, pa.int64()))

    raw = docs.map_batches(extract_with_part, batch_format="pyarrow")

    # the alias inventory is built ONCE on the driver. alias_shards > 1
    # (default): hash-sharded ray.puts, workers fetch only the shards
    # their batches touch (SURVEY §7 M3 — 1/k residency on the exact
    # path); alias_shards == 1: one whole-index broadcast, fetched
    # zero-copy once per worker. Output is byte-identical either way.
    from .ops.link import AliasIndex, ShardedAliasIndex, make_linker_fn

    if cfg.alias_shards > 1:
        shard_head = ShardedAliasIndex.build_head(aliases or {},
                                                  cfg.alias_shards)
        index_ref = None
        ctor_kwargs = {"min_score": cfg.min_link_score,
                       "shard_head": shard_head}
    else:
        shard_head = None
        index_ref = {"ref": ray.put(AliasIndex.build(aliases or {}))}
        ctor_kwargs = {"min_score": cfg.min_link_score,
                       "index_ref": index_ref}
    if cfg.linker_mode == "tasks":
        # stateless tasks + per-worker-process linker cache: parallelism
        # follows block count, no pool sizing to fight the read stage
        linked = raw.map_batches(
            make_linker_fn(index_ref, cfg.min_link_score,
                           shard_head=shard_head),
            batch_format="pyarrow",
        )
    else:
        linked = raw.map_batches(
            EntityLinker,
            fn_constructor_kwargs=ctor_kwargs,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=cfg.linker_concurrency,
            num_cpus=cfg.linker_num_cpus,
        )
    return linked, triples_path


# Ray's write path probes `from fsspec.implementations.http import
# HTTPFileSystem` per write and catches only ModuleNotFoundError; two
# concurrent writes racing the (always-failing, aiohttp-less) import can
# see a half-initialized module and get a plain ImportError. stateio
# installs one hardened stub module at import; this alias keeps the
# pre-write call sites explicit.
_stub_fsspec_http = stateio._stub_fsspec_http


def build_graph(cfg: GraphBuildConfig,
                aliases: dict[str, str] | None = None) -> GraphBuildResult:
    """Run the full pipeline; returns output paths + metrics."""
    cfg.validate()
    t0 = time.monotonic()
    metrics: dict = {}

    # ---- phase A: extract + link, checkpointed ---------------------------
    done_before: set[int] = set()
    if cfg.resume:
        done_before = ckpt.completed_partitions(
            stateio.join(cfg.output_path, "triples")
        )
    linked, triples_path = extract_and_link(cfg, aliases=aliases)
    if cfg.materialize_triples:
        # pin the (small) triples table once: the checkpoint write AND all
        # of phase B consume it without re-running extraction or
        # re-reading the checkpoint from disk. Disable for runs where
        # even triples exceed object-store budget.
        linked = linked.materialize()
        new_rows = linked.count()
    else:
        new_rows = None
    from concurrent.futures import ThreadPoolExecutor

    _stub_fsspec_http()

    def _write_checkpoint():
        if new_rows != 0:
            # sort by part_id so each checkpoint partition lands in
            # contiguous blocks → O(partitions) files instead of
            # O(blocks × partitions)
            stateio.ray_write_parquet(linked.sort("part_id"),
                                      triples_path,
                                      partition_cols=["part_id"])
        return ckpt.finalize_partitions(triples_path, cfg.num_partitions)

    # the in-memory linked table IS the full triples set only when no
    # partition was skipped; on resume, phase B must read the completed
    # checkpoint (skipped partitions live only on disk)
    use_linked = cfg.materialize_triples and not done_before
    ckpt_pool = ThreadPoolExecutor(max_workers=1)
    if use_linked:
        # the checkpoint write is independent of everything downstream
        # (phase B consumes the pinned in-memory triples): run it in the
        # background for the whole of phase B, join before returning
        fw = ckpt_pool.submit(_write_checkpoint)
        triples = linked
        approx_triples = new_rows
    elif cfg.materialize_triples and new_rows:
        # resume / delta-merge overlap: completed partitions stream
        # straight from the checkpoint files (manifest row counts are
        # metadata-only) and union with the pinned in-memory NEW
        # triples — the delta's checkpoint write overlaps all of phase
        # B instead of serializing before it, and the completed base is
        # read once, not written-then-reread
        fw = ckpt_pool.submit(_write_checkpoint)
        triples_root = triples_path
        base_files = ckpt.completed_files(triples_root)
        approx_triples = new_rows + sum(
            ckpt.completed_rows(triples_root).values())
        cols = [c for c in linked.schema().names if c != "part_id"]
        triples = linked.select_columns(cols)
        if base_files:
            triples = stateio.ray_read_parquet(
                base_files, columns=cols).union(triples)
        triples = triples.materialize()
    else:
        fw = ckpt_pool.submit(_write_checkpoint)
        part_stats = fw.result()
        approx_triples = sum(s["rows"] for s in part_stats.values())
        triples = stateio.ray_read_parquet(triples_path) \
            if stateio.is_url(triples_path) else read_table(triples_path)
        if cfg.materialize_triples:
            triples = triples.materialize()

    # canonicalization: either a driver-side union-find dict broadcast to
    # every task (small inventories), or — the scale path — a canonical
    # map kept as a Dataset end-to-end, applied via two hash-partitioned
    # joins (nothing driver-sized ever exists)
    if cfg.canon_strategy == "distributed":
        from .ops.canon import (
            canonical_map_dataset,
            canonical_pairs_dataset,
            resolve_keys_join,
        )

        from .ops.relational import coerce_schema, compact_nonempty

        pairs = canonical_pairs_dataset(triples)
        # the map is consumed three times (count + subj/obj joins): pin it
        # — it is one row per distinct entity key, the small side. The
        # coerce+compact strips Ray's schemaless empty groupby blocks,
        # which would break the resolve joins.
        cmap = coerce_schema(
            canonical_map_dataset(pairs, rounds=cfg.canon_rounds),
            pa.schema([("key", pa.string()), ("canon", pa.string())]),
        ).materialize()
        cmap = compact_nonempty(cmap)
        n_entities = cmap.count() if cmap is not None else 0
        canon_fn = None
        if n_entities:
            triples = resolve_keys_join(
                triples, cmap, num_partitions=cfg.canon_join_partitions
            )
            if cfg.materialize_triples:
                triples = triples.materialize()
    t1 = time.monotonic()
    metrics["phase_a_sec"] = time.monotonic() - t0
    metrics["partitions_skipped"] = len(done_before)
    if new_rows is not None:
        metrics["triples_new"] = new_rows

    # ---- phase B: materialize ------------------------------------------
    vcol, ecol = cfg.vertex_collection, cfg.edge_collection
    # bucket count sized to the triple volume (known when the triples are
    # pinned): keeps per-bucket reduce work ~constant as inputs grow —
    # the fixed-bucket phase-B superlinearity fix (DESIGN_SCALE.md §Skew)
    from .ops.materialize import adaptive_buckets
    import ray

    try:
        cluster_cpus = int(ray.cluster_resources().get("CPU", 0)) or None
    except Exception:
        cluster_cpus = None
    n_buckets = adaptive_buckets(approx_triples, cluster_cpus)
    metrics["agg_num_buckets"] = n_buckets
    if cfg.canon_strategy == "distributed":
        canon_fn = None
    else:
        # canonicalize first (one scan of the pinned triples), then the
        # two FUSED scan+aggregate+write builds run concurrently. An
        # overlapped variant (canonicalize ∥ partials scans, canon applied
        # to materialized partials via aggregate_*_partials) measured
        # SLOWER at 1M docs/16 cpus — the extra partials materialization
        # and job barriers cost more than the canonicalize overlap saves.
        # The tree-dedup pre-pass only pays off once the per-block pair
        # stream would swamp the driver; below that it is two pure
        # repartition barriers (~half of phase-B wall at 200k docs).
        canon = canonicalize(
            triples,
            tree=bool(approx_triples and approx_triples > 20_000_000),
        )
        n_entities = len(canon)
        canon_fn = make_apply_canon(canon)
    metrics["entities_linked"] = n_entities
    vertices = build_vertices(triples, canon_fn, vcol,
                              strategy=cfg.agg_strategy,
                              num_buckets=n_buckets)
    edges = build_edges(triples, canon_fn, vcol, ecol,
                        strategy=cfg.agg_strategy, num_buckets=n_buckets)

    vertices_path = stateio.join(cfg.output_path, "vertices")
    edges_path = stateio.join(cfg.output_path, "edges")
    # graph tables are always rebuilt in phase B (they are derived data);
    # clear any previous run's files so a resume never appends duplicates
    stateio.rmtree(vertices_path)
    stateio.rmtree(edges_path)
    if cfg.sort_output:
        vertices = vertices.sort("_id")
        edges = edges.sort("_key")

    # the two output pipelines are independent — run them concurrently so
    # phase B costs max(vertices, edges), not the sum (each execution's
    # tasks interleave on the cluster)
    from concurrent.futures import ThreadPoolExecutor

    _stub_fsspec_http()

    if cfg.concurrent_outputs:
        with ThreadPoolExecutor(max_workers=2) as pool:
            fv = pool.submit(stateio.ray_write_parquet, vertices,
                             vertices_path)
            fe = pool.submit(stateio.ray_write_parquet, edges,
                             edges_path)
            fv.result()
            fe.result()
    else:
        stateio.ray_write_parquet(vertices, vertices_path)
        stateio.ray_write_parquet(edges, edges_path)
    metrics["phase_b_sec"] = time.monotonic() - t1

    # join the background checkpoint write (manifests must exist before
    # we report success)
    part_stats = fw.result()
    ckpt_pool.shutdown()
    metrics["triples_raw"] = sum(s["rows"] for s in part_stats.values())
    metrics["partitions"] = len(part_stats)
    metrics["total_sec"] = time.monotonic() - t0
    return GraphBuildResult(vertices_path, edges_path, triples_path, metrics)


def merge_delta(cfg: GraphBuildConfig, delta_input_path: str,
                aliases: dict[str, str] | None = None,
                resume: bool = False) -> GraphBuildResult:
    """Incremental KG maintenance: merge a delta corpus into an existing
    build at ``cfg.output_path``.

    The reference always re-exports the whole graph; at 100 TB the
    corpus scan — phase A — is the cost that must not repeat. A delta
    ingest therefore runs extract+link over ONLY the new documents,
    checkpointing them as a fresh partition EPOCH (``part_id`` in
    ``[e*P, (e+1)*P)``) inside the same triples checkpoint, and then
    rebuilds phase B over the union of all epochs' triples — the
    merge-on-write discipline: derived tables (vertices/edges) are
    recomputed from the (orders-of-magnitude smaller) triple log, never
    patched in place. The result is bit-identical to a full rebuild
    over base+delta because phase B is a pure multiset aggregation of
    the triple log (test-asserted).

    ``resume=True`` re-enters a crashed merge: the newest epoch's
    completed partitions are skipped and its incomplete files cleaned,
    exactly like :func:`build_graph` resume. Re-running a FINISHED
    merge with the same delta corpus would ingest it twice (append
    semantics, like loading the same file twice); lineage manifests
    (``kg_lineage``) make that auditable.
    """
    from dataclasses import replace

    from .errors import CheckpointError

    triples_path = stateio.join(cfg.output_path, "triples")
    done = ckpt.completed_partitions(triples_path)
    if not done:
        raise CheckpointError(
            f"no completed base build under {triples_path}: run "
            "build_graph first, then merge deltas into it"
        )
    cur_max_epoch = max(done) // cfg.num_partitions
    epoch = cur_max_epoch if (resume and cur_max_epoch >= 1) \
        else cur_max_epoch + 1
    dcfg = replace(cfg, input_path=delta_input_path, resume=True,
                   part_offset=epoch * cfg.num_partitions)
    return build_graph(dcfg, aliases=aliases)


def graph_asof(cfg: GraphBuildConfig, epoch: int):
    """Time-travel read: recompute (vertices, edges) AS OF partition
    epoch ``epoch`` — 0 = the base build, e = after the e-th delta
    merge — from the triples checkpoint alone, no corpus scan.

    Delta merges land as partition epochs (``part_id`` in
    ``[e·P, (e+1)·P)``, :func:`merge_delta`) and never rewrite earlier
    epochs, so the checkpoint IS the history: reading only the
    partitions of epochs ≤ e and re-running phase B (canonicalize +
    materialize — pure multiset aggregations of the triple log) yields
    exactly the graph as it stood after that merge. Returns lazy
    (vertices, edges) Datasets; nothing is written.

    Scale: the read is manifest-pruned to the requested epochs'
    completed files; phase B cost ∝ as-of triple volume, same as any
    build. This is the audit/reproducibility surface ("which graph did
    the model train on?") the append-only epoch layout buys.
    """
    from .errors import CheckpointError, InvalidParameterError
    from .ops.materialize import (adaptive_buckets, build_edges,
                                  build_vertices, make_apply_canon)

    if epoch < 0:
        raise InvalidParameterError("epoch must be >= 0")
    triples_path = stateio.join(cfg.output_path, "triples")
    done = ckpt.completed_partitions(triples_path)
    if not done:
        raise CheckpointError(
            f"no completed build under {triples_path}")
    keep = sorted(p for p in done
                  if p < (epoch + 1) * cfg.num_partitions)
    if not keep:
        raise InvalidParameterError(
            f"epoch {epoch}: no completed partitions "
            f"(have epochs 0..{max(done) // cfg.num_partitions})")
    import ray

    files = [f for pid in keep for f in stateio.data_files(
        stateio.join(triples_path, f"part_id={pid}"))]
    rows = ckpt.completed_rows(triples_path)
    approx = sum(rows.get(p, 0) for p in keep)
    triples = stateio.ray_read_parquet(files)
    cols = [c for c in triples.schema().names if c != "part_id"]
    triples = triples.select_columns(cols).materialize()

    canon_fn = make_apply_canon(canonicalize(triples))
    try:
        cpus = int(ray.cluster_resources().get("CPU", 0)) or None
    except Exception:
        cpus = None
    n_buckets = adaptive_buckets(approx, cpus)
    vertices = build_vertices(triples, canon_fn, cfg.vertex_collection,
                              strategy=cfg.agg_strategy,
                              num_buckets=n_buckets)
    edges = build_edges(triples, canon_fn, cfg.vertex_collection,
                        cfg.edge_collection, strategy=cfg.agg_strategy,
                        num_buckets=n_buckets)
    return vertices, edges


def graph_forget(cfg: GraphBuildConfig, deleted_doc_ids=None,
                 deletions=None):
    """Deletion propagation (right-to-be-forgotten): recompute
    (vertices, edges) with every triple whose provenance ``doc_id`` is
    in the deletion set removed — from the triples checkpoint alone,
    no corpus scan, across ALL partition epochs.

    The lineage column the checkpoint carries per triple
    (``doc_id``, SURVEY §7 M2) is what makes this a log filter plus
    the ordinary phase-B rebuild rather than a re-export: derived
    tables are never patched in place (same merge-on-write discipline
    as :func:`merge_delta`), so an edge survives iff some non-deleted
    document still asserts it, and entities with no surviving mention
    drop out of the vertex table by construction. Reference contrast:
    arangors-graph-exporter can only re-export the whole graph
    (src/graph_loader.rs:377); the triple log turns deletion into an
    aggregate-sized recompute.

    ``deleted_doc_ids``: small/driver-sized iterable of doc ids —
    applied as a broadcast ``pc.is_in`` filter inside ``map_batches``
    (no shuffle). ``deletions``: a Dataset with a ``doc_id`` column
    for web-scale delete sets — applied as ONE hash-partitioned
    ``left_anti`` join (the distributed NOT IN). Exactly one must be
    given. Returns lazy (vertices, edges); nothing is written.
    """
    import ray

    from .errors import CheckpointError, InvalidParameterError
    from .ops.materialize import adaptive_buckets, make_apply_canon

    if (deleted_doc_ids is None) == (deletions is None):
        raise InvalidParameterError(
            "pass exactly one of deleted_doc_ids / deletions")
    triples_path = stateio.join(cfg.output_path, "triples")
    done = ckpt.completed_partitions(triples_path)
    if not done:
        raise CheckpointError(
            f"no completed build under {triples_path}")
    files = [f for pid in sorted(done) for f in stateio.data_files(
        stateio.join(triples_path, f"part_id={pid}"))]
    rows = ckpt.completed_rows(triples_path)
    approx = sum(rows.get(p, 0) for p in done)
    triples = stateio.ray_read_parquet(files)
    cols = [c for c in triples.schema().names if c != "part_id"]
    triples = triples.select_columns(cols)

    if deleted_doc_ids is not None:
        gone = pa.array(sorted(set(map(str, deleted_doc_ids))),
                        pa.string())

        def drop(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(
                pc.invert(pc.is_in(batch.column("doc_id"),
                                   value_set=gone)))

        triples = triples.map_batches(drop, batch_format="pyarrow")
    else:
        from .ops.relational import shuffle_join

        keys = deletions.select_columns(["doc_id"])
        triples = shuffle_join(triples, keys, on="doc_id",
                               how="left_anti")
    triples = triples.materialize()

    canon_fn = make_apply_canon(canonicalize(triples))
    try:
        cpus = int(ray.cluster_resources().get("CPU", 0)) or None
    except Exception:
        cpus = None
    n_buckets = adaptive_buckets(approx, cpus)
    vertices = build_vertices(triples, canon_fn, cfg.vertex_collection,
                              strategy=cfg.agg_strategy,
                              num_buckets=n_buckets)
    edges = build_edges(triples, canon_fn, cfg.vertex_collection,
                        cfg.edge_collection, strategy=cfg.agg_strategy,
                        num_buckets=n_buckets)
    return vertices, edges
