"""User-facing configuration objects + validation.

Mirrors the reference's configuration surface:

* ``CollectionInfo`` (/root/reference/src/graph_loader.rs:27-31)
* ``DataLoadConfiguration`` defaults parallelism=8, batch_size=100_000,
  prefetch_count=5 (/root/reference/src/config.rs:111-118)
* ``verify_parameters`` mutual-exclusion rule
  (/root/reference/src/graph_loader.rs:253-271)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .errors import InvalidParameterError


@dataclass(frozen=True)
class CollectionInfo:
    """A collection plus the attribute projection the user wants
    (reference src/graph_loader.rs:27-31)."""

    name: str
    fields: tuple[str, ...] = ()


@dataclass(frozen=True)
class DataLoadConfig:
    """Execution knobs. Reference defaults: src/config.rs:111-118.

    ``parallelism`` maps to per-stage ``concurrency`` / read task count,
    ``batch_size`` to ``map_batches(batch_size=...)``; the reference's
    ``prefetch_count`` dissolves into Ray Data's streaming-executor
    backpressure.
    """

    parallelism: int = 8
    batch_size: int = 100_000
    load_all_vertex_attributes: bool = False
    load_all_edge_attributes: bool = False
    # True = cluster-deployment parity: unknown collections fail at init
    # (shard-map computation, tests/graph_loader.rs:877-907); False =
    # single-server parity: init succeeds, the failure surfaces at load
    eager_collection_check: bool = True


def verify_parameters(
    cfg: DataLoadConfig,
    vertex_collections: list[CollectionInfo],
    edge_collections: list[CollectionInfo],
) -> None:
    """Reject explicit field lists combined with load_all_* flags
    (reference ``verify_parameters``, src/graph_loader.rs:253-271)."""
    if cfg.load_all_vertex_attributes and any(c.fields for c in vertex_collections):
        raise InvalidParameterError(
            "load_all_vertex_attributes is mutually exclusive with explicit "
            "vertex field lists"
        )
    if cfg.load_all_edge_attributes and any(c.fields for c in edge_collections):
        raise InvalidParameterError(
            "load_all_edge_attributes is mutually exclusive with explicit "
            "edge field lists"
        )


@dataclass(frozen=True)
class GraphBuildConfig:
    """End-to-end KG-construction pipeline configuration (SURVEY.md §3.4)."""

    input_path: str
    output_path: str
    vertex_collection: str = "entities"
    edge_collection: str = "relations"

    # extraction / linking
    batch_size: int = 4096            # span-heavy rows: smaller than ref's 100k
    # "patterns" — anchored pattern table only (reference-fixture
    # semantics); "patterns+frames" — adds the structure-driven
    # verb-frame SVO family on pattern-miss spans (ops/extract.py,
    # golden-gated at P/R >= 0.95 in tests/test_extract.py)
    extract_mode: str = "patterns"
    # "tasks": stateless map_batches + per-worker cached broadcast linker
    # (default — scales with block count); "actors": explicit actor pool
    # sized by linker_concurrency (for mutable per-actor state / GPUs)
    linker_mode: str = "tasks"
    linker_concurrency: tuple[int, int] = (2, 8)
    linker_num_cpus: float = 1.0
    min_link_score: float = 0.35      # trigram-cosine acceptance threshold
    # alias-inventory sharding (SURVEY §7 M3): the normalized alias
    # dict ships as alias_shards separate ray.put objects keyed by
    # crc32(surface) % k; a worker deserializes only the shards its
    # batches touch (1/k residency on the exact path) instead of one
    # whole-inventory heap copy per process. 1 = legacy whole-index
    # broadcast. Output is byte-identical either way (pinned by
    # tests/test_link.py).
    alias_shards: int = 8

    # skew handling (SURVEY.md §4.2) is structural, not a knob: per-batch
    # partial aggregation before every wide step (the "salt" is the batch)
    # plus hash bucketing over high-cardinality keys — see
    # ops/relational.hash_aggregate and DESIGN_SCALE.md "Skew"

    # checkpoint / resume
    num_partitions: int = 16          # partition_id = hash(doc_id) % num_partitions
    resume: bool = False
    # partition-id offset for incremental delta ingests: a delta epoch e
    # lands its partitions at [e*P, (e+1)*P) in the SAME triples
    # checkpoint, so the resume machinery (manifests, skip-at-read,
    # clean_incomplete) covers deltas unchanged. Set via
    # pipeline.merge_delta, not by hand.
    part_offset: int = 0

    # canonicalization strategy:
    #   "driver"      — collect the (tree-deduped, small) alias pair set,
    #                   union-find on the driver, broadcast the dict via
    #                   ray.put (default; right while the entity inventory
    #                   fits one node)
    #   "distributed" — hash-bucketed min-label propagation keeps the
    #                   canonical map a Dataset end-to-end; triples are
    #                   resolved with two hash-partitioned left-outer
    #                   joins (the 100 TB path: nothing driver-sized)
    canon_strategy: str = "driver"
    canon_rounds: int = 4             # label-prop rounds (graph diameter)
    canon_join_partitions: int = 32   # hash partitions for the resolve join

    # wide-step implementation:
    #   "hash"    — bucket by stable_hash(key) % B, one vectorized reduce
    #               per bucket (default; scales with distinct-keys/B)
    #   "tree"    — combiner tree, single root block (fastest at small
    #               cardinality; root is the bound)
    #   "shuffle" — Ray sort-shuffle groupbys with built-in aggregates
    agg_strategy: str = "hash"

    # run the vertex and edge output pipelines concurrently (phase B cost
    # = max, not sum); disable when object-store headroom is tight — two
    # racing shuffles can thrash into spilling
    concurrent_outputs: bool = True

    # pin the (small) triples table in the object store during phase B to
    # avoid re-reading it for canonicalize/vertices/edges; disable when
    # triples themselves approach object-store capacity
    materialize_triples: bool = True

    # deterministic output ordering (tests); off for large runs
    sort_output: bool = False

    def validate(self) -> None:
        if self.num_partitions < 1:
            raise InvalidParameterError("num_partitions must be >= 1")
        if self.part_offset < 0 or self.part_offset % self.num_partitions:
            raise InvalidParameterError(
                "part_offset must be a non-negative multiple of "
                "num_partitions (one checkpoint epoch per delta)"
            )
        if self.agg_strategy not in ("hash", "tree", "shuffle"):
            raise InvalidParameterError(
                "agg_strategy must be one of hash|tree|shuffle"
            )
        if self.canon_strategy not in ("driver", "distributed"):
            raise InvalidParameterError(
                "canon_strategy must be one of driver|distributed"
            )
        if self.canon_rounds < 1:
            raise InvalidParameterError("canon_rounds must be >= 1")
        if self.batch_size < 1:
            raise InvalidParameterError("batch_size must be >= 1")
        lo, hi = self.linker_concurrency
        if not (1 <= lo <= hi):
            raise InvalidParameterError("linker_concurrency must be (min<=max), min>=1")
        if self.alias_shards < 1:
            raise InvalidParameterError("alias_shards must be >= 1")
        if self.extract_mode not in ("patterns", "patterns+frames",
                                     "patterns+coref",
                                     "patterns+frames+coref"):
            raise InvalidParameterError(
                "extract_mode must be one of patterns|patterns+frames"
                "|patterns+coref|patterns+frames+coref"
            )
