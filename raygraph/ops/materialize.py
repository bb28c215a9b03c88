"""Graph materialization — vertices / edges tables with ArangoDB identities.

Reproduces the reference's output-side semantics on the tables we build:

* ``_id = "<collection>/<key>"`` minting (id format tests/graph_loader.rs:
  140-141; ``collection_name_from_id`` src/graph_loader.rs:51-56)
* ``_from`` / ``_to`` are vertex ``_id`` strings, mandatory
  (src/graph_loader.rs:675-703)
* exact edge dedup on (subj, pred, obj) — the analog of the smart-edge
  shard anti-join A4 (src/sharding.rs:329-341): hash-shuffle + aggregate.

Aggregation discipline (SURVEY.md §4.2): every groupby is preceded by
per-batch partial aggregation inside ``map_batches`` (the salt), so a hub
entity with 10^6 mentions ships ≤ #batches partial rows, not 10^6 — and
the wide step itself uses Ray's BUILT-IN vectorized aggregates (Sum / Max
/ Min / Count), never per-group Python (a ``map_groups`` over 10^5 tiny
groups costs one Python call per group and dominated early profiles).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Count, Max, Min, Sum

_SEP = "\x00"
_NMAX = 10**12  # mention counts are < this; used for the min-composite trick


def edge_keys(subj, pred, obj) -> list[str]:
    """Deterministic content-derived edge keys for aligned sequences —
    the single definition of the stable-``_key`` contract (SURVEY.md §7
    hard part 3); :func:`edge_key` and ``_finalize_edges`` both delegate
    here so the two can never drift."""
    return [
        hashlib.sha1(f"{a}{_SEP}{b}{_SEP}{c}".encode()).hexdigest()[:16]
        for a, b, c in zip(subj, pred, obj)
    ]


def edge_key(subj: str, pred: str, obj: str) -> str:
    """Deterministic content-derived edge key (stable across runs and
    parallelism levels — SURVEY.md §7 hard part 3)."""
    return edge_keys([subj], [pred], [obj])[0]


def make_apply_canon(canon: dict[str, str],
                     cols: tuple[str, ...] = ("subj", "obj")):
    """Batch transform replacing the key columns ``cols`` with canonical
    keys (default: a LINKED_TRIPLE's subj/obj; pass ("key",) for vertex
    partials).

    ``canon`` is the small side (entity inventory) — broadcast it with
    ``ray.put`` and resolve the ref in the caller; identity for unmapped
    keys. Returns ``None`` when the map is pure identity (the common
    case) so callers skip the stage entirely.
    """
    canon = {k: v for k, v in canon.items() if k != v}
    if not canon:
        return None

    def apply_canon(batch: pa.Table) -> pa.Table:
        for col in cols:
            s = batch.column(col).to_pandas()
            s = s.map(canon).fillna(s)
            batch = batch.set_column(
                batch.schema.get_field_index(col), col,
                pa.array(s, pa.string()),
            )
        return batch

    return apply_canon


# --------------------------------------------------------------------- edges
def edge_partials(batch: pa.Table) -> pa.Table:
    """Per-batch partial: dedup (subj, pred, obj, doc_id), max conf.

    A partial only — the same (subj, pred, obj, doc_id) can straddle
    batches after the checkpoint round-trip (block boundaries are
    arbitrary), so an exact 4-key groupby follows before doc counting.
    """
    df = pd.DataFrame(
        {
            "subj": batch.column("subj").to_pandas(),
            "pred": batch.column("pred").to_pandas(),
            "obj": batch.column("obj").to_pandas(),
            "doc_id": batch.column("doc_id").to_pandas(),
            "conf": batch.column("conf").to_pandas(),
        }
    )
    df = df.groupby(["subj", "pred", "obj", "doc_id"], as_index=False,
                    sort=False)["conf"].max()
    return pa.Table.from_pandas(df, preserve_index=False)


def _finalize_edges(vertex_collection: str, edge_collection: str):
    def fn(batch: pa.Table) -> pa.Table:
        s = batch.column("subj").to_pandas()
        p = batch.column("pred").to_pandas()
        o = batch.column("obj").to_pandas()
        keys = edge_keys(s, p, o)
        n = len(s)
        return pa.table(
            {
                "_from": pa.array(vertex_collection + "/" + s, pa.string()),
                "_to": pa.array(vertex_collection + "/" + o, pa.string()),
                "_key": pa.array(keys, pa.string()),
                "@collection_name": pa.array([edge_collection] * n, pa.string()),
                "pred": pa.array(p, pa.string()),
                "conf": batch.column("conf").cast(pa.float32()),
                "doc_count": batch.column("doc_count").cast(pa.int64()),
            }
        )

    return fn


DEFAULT_NUM_BUCKETS = 128
ROWS_PER_BUCKET = 100_000  # target partial rows per hash bucket


def adaptive_buckets(n_rows: int | None, cluster_cpus: int | None = None) -> int:
    """Bucket count for the wide steps, sized to the input: one bucket
    per ~ROWS_PER_BUCKET partial rows. A FIXED bucket count makes the
    per-bucket reduce grow linearly with input (the measured ≥4M-doc
    phase-B superlinearity); scaling buckets keeps per-task work roughly
    constant, bounded at 4096 tasks.

    The FLOOR is sized to the cluster when its width is known: reduce
    cost is ~W/p + ceil(k/p)·h for k buckets on p cores with per-task
    overhead h, so any k beyond a few waves of p only adds dispatch
    latency (measured: 128 buckets on 16 pinned cores = 8 waves of tiny
    tasks at 200k docs). 4×p keeps one short balanced wave-set while
    still absorbing moderate bucket skew; unknown width keeps the legacy
    DEFAULT_NUM_BUCKETS floor."""
    floor = DEFAULT_NUM_BUCKETS if not cluster_cpus \
        else min(DEFAULT_NUM_BUCKETS, max(16, 4 * int(cluster_cpus)))
    if not n_rows:
        return floor
    return int(min(4096, max(floor, n_rows // ROWS_PER_BUCKET)))


def build_edges(linked, canon_fn, vertex_collection: str, edge_collection: str,
                strategy: str = "hash", num_buckets: int = DEFAULT_NUM_BUCKETS):
    """LINKED_TRIPLE Dataset → deduped edge Dataset (EDGE_SCHEMA).

    ``canon_fn`` is the batch transform from :func:`make_apply_canon`.
    Exact (subj, pred, obj, doc_id) dedup first — doc_count must be a
    DISTINCT doc count, stable across arbitrary block boundaries — then
    the per-edge max-conf / doc-count rollup.

    strategy="hash" (default): bucketed aggregate
    (:func:`raygraph.ops.relational.hash_aggregate`) — exact nunique per
    bucket, scales with distinct-edges/bucket. "tree": combiner tree
    whose single root block holds the distinct (s, p, o, doc) set (fast
    only at small cardinality). "shuffle": two sort-shuffle groupbys with
    built-in aggregates.
    """
    canoned = linked if canon_fn is None else \
        linked.map_batches(canon_fn, batch_format="pyarrow")
    partials = canoned.map_batches(edge_partials, batch_format="pyarrow")
    return aggregate_edge_partials(partials, vertex_collection,
                                   edge_collection, strategy=strategy,
                                   num_buckets=num_buckets)


def _reduce_edges(df: pd.DataFrame) -> pd.DataFrame:
    d = df.groupby(["subj", "pred", "obj", "doc_id"], as_index=False,
                   sort=False)["conf"].max()
    return d.groupby(["subj", "pred", "obj"], as_index=False,
                     sort=False).agg(conf=("conf", "max"),
                                     doc_count=("doc_id", "nunique"))


def aggregate_edge_partials(partials, vertex_collection: str,
                            edge_collection: str, strategy: str = "hash",
                            num_buckets: int = DEFAULT_NUM_BUCKETS):
    """Wide step over edge PARTIALS (exact under any block layout —
    partials are max-conf per (s,p,o,doc) per batch; the reduce re-groups
    exactly). Split out of :func:`build_edges` so the pipeline can apply
    canonical keys to materialized partials instead of re-scanning the
    triples (canon∘partial = partial∘canon: max/nunique are associative
    and canon only renames group keys)."""
    fin = _finalize_edges(vertex_collection, edge_collection)

    if strategy == "hash":
        from .relational import hash_aggregate

        return hash_aggregate(partials, ["subj", "pred", "obj"],
                              _reduce_edges, num_buckets=num_buckets) \
            .map_batches(fin, batch_format="pyarrow")

    if strategy == "tree":
        from .relational import tree_aggregate

        def combine(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby(["subj", "pred", "obj", "doc_id"],
                              as_index=False, sort=False)["conf"].max()

        return tree_aggregate(partials, combine, finalize=_reduce_edges,
                              precombined=True) \
            .map_batches(fin, batch_format="pyarrow")

    agg = (
        partials.groupby(["subj", "pred", "obj", "doc_id"])
        .aggregate(Max("conf", alias_name="conf"))
        .groupby(["subj", "pred", "obj"])
        .aggregate(Max("conf", alias_name="conf"),
                   Count(alias_name="doc_count"))
    )
    return agg.map_batches(fin, batch_format="pyarrow")


# ------------------------------------------------------------------- vertices
def vertex_partials(batch: pa.Table) -> pa.Table:
    """Per-batch partial: mention counts per (key, surface_norm)."""
    df = pd.DataFrame(
        {
            "key": pd.concat(
                [batch.column("subj").to_pandas(), batch.column("obj").to_pandas()],
                ignore_index=True,
            ),
            "surface": pd.concat(
                [
                    batch.column("subj_surface").to_pandas(),
                    batch.column("obj_surface").to_pandas(),
                ],
                ignore_index=True,
            ),
        }
    )
    # surfaces arrive normalized from the linker
    out = df.groupby(["key", "surface"], as_index=False, sort=False).size()
    out = out.rename(columns={"size": "n"})
    return pa.Table.from_pandas(out, preserve_index=False)


def _add_inv_composite(batch: pa.Table) -> pa.Table:
    """inv = zero-padded (NMAX - n) + '|' + surface: taking the MIN of this
    string selects the most frequent surface with lexicographic-min
    tie-break — an argmax expressed through a built-in vectorized Min."""
    n = batch.column("n").to_pandas().astype("int64")
    surf = batch.column("surface").to_pandas()
    inv = (_NMAX - n).map("{:013d}".format) + "|" + surf
    return pa.table(
        {
            "key": batch.column("key"),
            "n": pa.array(n, pa.int64()),
            "inv": pa.array(inv, pa.string()),
        }
    )


def _finalize_vertices(vertex_collection: str):
    def fn(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_pandas()
        name = batch.column("inv").to_pandas().str.split("|", n=1).str[1]
        n = len(key)
        return pa.table(
            {
                "_id": pa.array(vertex_collection + "/" + key, pa.string()),
                "_key": pa.array(key, pa.string()),
                "@collection_name": pa.array([vertex_collection] * n, pa.string()),
                "name": pa.array(name, pa.string()),
                "mention_count": batch.column("mention_count").cast(pa.int64()),
            }
        )

    return fn


def build_vertices(linked, canon_fn, vertex_collection: str,
                   strategy: str = "hash",
                   num_buckets: int = DEFAULT_NUM_BUCKETS):
    """LINKED_TRIPLE Dataset → canonical vertex Dataset (VERTEX_SCHEMA).

    Hub-safe: a hub entity contributes ≤ one partial row per batch per
    surface form (per-batch partial counts before any wide step).

    strategy="tree" (default): combiner tree over (key, surface) counts;
    the root does the exact name argmax (most frequent surface,
    lexicographic-min tie-break) in one vectorized pandas pass. The root
    block holds the distinct (key, surface) set — the scaling bound.
    strategy="shuffle": two sort-shuffle groupbys (Sum, then Min over an
    order-preserving composite for the argmax), for inventories beyond
    one block.
    """
    canoned = linked if canon_fn is None else \
        linked.map_batches(canon_fn, batch_format="pyarrow")
    partials = canoned.map_batches(vertex_partials, batch_format="pyarrow")
    return aggregate_vertex_partials(partials, vertex_collection,
                                     strategy=strategy,
                                     num_buckets=num_buckets)


def _combine_v(df: pd.DataFrame) -> pd.DataFrame:
    return df.groupby(["key", "surface"], as_index=False,
                      sort=False)["n"].sum()


def _reduce_vertices(df: pd.DataFrame) -> pd.DataFrame:
    d = _combine_v(df)
    counts = d.groupby("key", as_index=False)["n"].sum() \
        .rename(columns={"n": "mention_count"})
    best = d.sort_values(
        ["key", "n", "surface"], ascending=[True, False, True]
    ).drop_duplicates("key")[["key", "surface"]]
    out = counts.merge(best, on="key")
    # reuse the composite decoder: inv = anything + '|' + surface
    out["inv"] = "|" + out["surface"]
    return out[["key", "inv", "mention_count"]]


def aggregate_vertex_partials(partials, vertex_collection: str,
                              strategy: str = "hash",
                              num_buckets: int = DEFAULT_NUM_BUCKETS):
    """Wide step over vertex PARTIALS — see
    :func:`aggregate_edge_partials` for why this is split out (sum/argmax
    over (key, surface) counts commute with canonical key renaming)."""
    fin = _finalize_vertices(vertex_collection)

    if strategy == "hash":
        from .relational import hash_aggregate

        return hash_aggregate(partials, ["key"], _reduce_vertices,
                              num_buckets=num_buckets) \
            .map_batches(fin, batch_format="pyarrow")

    if strategy == "tree":
        from .relational import tree_aggregate

        return tree_aggregate(partials, _combine_v, finalize=_reduce_vertices,
                              precombined=True) \
            .map_batches(fin, batch_format="pyarrow")

    per_surface = partials.groupby(["key", "surface"]).aggregate(
        Sum("n", alias_name="n")
    )
    per_key = (
        per_surface.map_batches(_add_inv_composite, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Min("inv", alias_name="inv"),
                   Sum("n", alias_name="mention_count"))
    )
    return per_key.map_batches(fin, batch_format="pyarrow")
