"""Canonicalization — union-find surface-form clustering via groupby rounds.

Merges entity keys that share a normalized surface form into one canonical
key (the lexicographically smallest key in the connected component of the
bipartite surface ↔ key graph). The KG analog of the reference's
metadata set-union + dedup steps (A1/A2, /root/reference/
src/graph_loader.rs:927-934, :1076-1106) lifted from driver metadata to
distributed data.

Implementation: distributed **min-label propagation** expressed as
hash-bucketed rounds (:func:`raygraph.ops.relational.hash_aggregate`) —
no joins, no driver-side graph, and each round is ONE vectorized pandas
pass per bucket (never a Python call per node). Each round a node's label
becomes the min label seen by it or any neighbor; after R rounds every
component of diameter ≤ R carries its min key. The alias graph here is
star-shaped around entity keys (surfaces link keys), so diameter is
small; ``rounds`` is configurable and the invariant is checked in tests
(SURVEY.md §7 hard part 2).

Skew note: groups are per *node* of the alias graph (size = degree of the
node, i.e. #alias-forms of an entity), not per mention — the per-batch
pre-deduplication in :func:`mention_pairs` is the salted pre-aggregation
step that keeps a hub entity with 10^6 mentions from creating a 10^6-row
group (SURVEY.md §4.2).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

# node-id prefixes in the bipartite graph
_K = "k:"
_S = "s:"


def mention_pairs(batch: pa.Table) -> pa.Table:
    """LINKED_TRIPLE batch → deduped (key, surface_norm) pairs.

    Per-batch dedup = partial aggregation before the shuffle (the salt):
    output rows are bounded by the number of *distinct* pairs per batch.
    """
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
    df = df.drop_duplicates()
    return pa.table(
        {
            "key": pa.array(df["key"], pa.string()),
            "surface": pa.array(df["surface"], pa.string()),
        }
    )


def _pairs_to_graph(batch: pa.Table) -> pa.Table:
    """(key, surface) pairs → initial label-prop state rows (vectorized).

    Row schema (node, val, tag): tag='label' rows carry the node's current
    label in ``val``; tag='edge' rows carry a neighbor in ``val``. Only key
    nodes get initial labels (labels range over entity keys).
    """
    keys = batch.column("key").to_pandas()
    surfs = batch.column("surface").to_pandas()
    kn, sn = _K + keys, _S + surfs
    n = len(keys)
    nodes = pd.concat([kn, sn, kn], ignore_index=True)
    vals = pd.concat([sn, kn, keys], ignore_index=True)
    tags = pd.Series(["edge"] * (2 * n) + ["label"] * n)
    return pa.table(
        {
            "node": pa.array(nodes, pa.string()),
            "val": pa.array(vals, pa.string()),
            "tag": pa.array(tags, pa.string()),
        }
    )


def _round_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """One min-label round over ALL nodes hashed to one bucket — a single
    vectorized pandas pass (drop_duplicates / groupby-min / merge), never
    per-node Python. Emits: the deduped edges, each labeled node's min
    label, and that min as a message to every neighbor."""
    edges = df.loc[df["tag"] == "edge", ["node", "val"]].drop_duplicates()
    labels = (
        df.loc[df["tag"] == "label", ["node", "val"]]
        .groupby("node", as_index=False)["val"].min()
        .rename(columns={"val": "lab"})
    )
    msgs = edges.merge(labels, on="node")
    return pd.concat(
        [
            edges.assign(tag="edge"),
            labels.rename(columns={"lab": "val"}).assign(tag="label"),
            pd.DataFrame({"node": msgs["val"], "val": msgs["lab"],
                          "tag": "label"}),
        ],
        ignore_index=True,
    )[["node", "val", "tag"]]


def _finish_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Final per-node min over the last round's label rows, projected to
    key nodes as (key, canon)."""
    labels = (
        df.loc[df["tag"] == "label", ["node", "val"]]
        .groupby("node", as_index=False)["val"].min()
    )
    keys = labels.loc[labels["node"].str.startswith(_K)]
    return pd.DataFrame(
        {"key": keys["node"].str[len(_K):], "canon": keys["val"]}
    ).reset_index(drop=True)


def canonical_map_dataset(pairs, rounds: int = 4, num_buckets: int = 64):
    """Distributed: (key, surface) pair Dataset → (key, canon) Dataset.

    Never touches the driver: every round is a hash-bucketed shuffle whose
    per-bucket reduce is one vectorized pandas pass. ``rounds`` must cover
    the alias-graph diameter (R rounds propagate the min label R hops in
    the bipartite key↔surface graph; 2 hops = one key-to-key step, so R=4
    merges chains of up to 3 keys — plenty for star-shaped alias maps,
    raise it for adversarial chains)."""
    from .relational import hash_aggregate

    state = pairs.map_batches(_pairs_to_graph, batch_format="pyarrow")
    for _ in range(rounds):
        state = hash_aggregate(state, ["node"], _round_bucket,
                               num_buckets=num_buckets)
    # final per-node min across the last round's label rows (a node's
    # incoming messages originate in other buckets, so one more pass)
    return hash_aggregate(state, ["node"], _finish_bucket,
                          num_buckets=num_buckets)


def union_find(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Driver-side union-find over (key, surface) pairs → {key: canon}.

    Path-compressed; canonical representative = lexicographically smallest
    key node in the component. Input may contain duplicates (per-batch
    dedup only) — union-find is idempotent.
    """
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for k, s in pairs:
        a, b = find(_K + k), find(_S + s)
        if a != b:
            parent[max(a, b)] = min(a, b)

    # min KEY per component (roots can be surface nodes; keys sort after
    # resolving within component)
    comp_min: dict[str, str] = {}
    key_nodes = [n for n in parent if n.startswith(_K)]
    for n in key_nodes:
        r = find(n)
        k = n[len(_K):]
        if r not in comp_min or k < comp_min[r]:
            comp_min[r] = k
    return {n[len(_K):]: comp_min[find(n)] for n in key_nodes}


def canonicalize(linked, tree: bool = False) -> dict[str, str]:
    """LINKED_TRIPLE Dataset → {key: canonical_key} dict (driver strategy).

    The pair set is pre-deduplicated per batch inside ``map_batches``, so
    what reaches the driver is O(Σ per-block distinct pairs) — the small
    side of the build. The driver collects the pair stream and runs
    union-find locally: one fused map pass, no shuffle. Right whenever
    the entity inventory fits the driver (it is then broadcast via
    ``ray.put`` anyway, so this adds no new scaling constraint).

    ``tree=True`` inserts a distributed tree-dedup before the collect —
    for corpora whose per-block-deduped pair stream (#blocks × hot-alias
    repeats) would swamp the driver NIC, at the price of two extra
    repartition barriers. The pipeline switches it on by triple count.

    For inventories beyond driver memory use
    :func:`canonical_map_dataset` + :func:`resolve_keys_join` instead
    (``GraphBuildConfig.canon_strategy="distributed"``) — that path never
    materializes the map anywhere.
    """
    # coalesce blocks into large batches for the pair scan: every block
    # repeats the hot aliases, so per-BLOCK dedup ships #blocks × hot
    # set to the driver (measured 2.6M rows for 117k distinct at 1M
    # docs / 32 blocks); per-500k-row-batch dedup divides that by the
    # coalescing factor for one cheap extra copy inside the map task
    pairs = linked.map_batches(mention_pairs, batch_format="pyarrow",
                               batch_size=500_000)
    if tree:
        # distributed tree-dedup first (cross-batch duplicate factor is
        # high — every batch repeats the hot aliases), so the driver only
        # collects the distinct pair set
        from .relational import tree_aggregate

        pairs = tree_aggregate(pairs, lambda df: df.drop_duplicates())
    frames = [
        b.to_pandas()
        for b in pairs.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    if not frames:
        return {}
    df = pd.concat(frames, ignore_index=True).drop_duplicates()
    return union_find(list(zip(df["key"], df["surface"])))


def canonical_pairs_dataset(linked):
    """Deduped (key, surface) pair Dataset — the distributed front half of
    canonicalization, shared by both strategies."""
    return linked.map_batches(mention_pairs, batch_format="pyarrow")


def resolve_keys_join(linked, canon_ds, num_partitions: int = 64):
    """Shuffle-join edge resolution — the scale path for entity
    inventories too large to broadcast (SURVEY.md §2.6 "joins").

    ``canon_ds`` is a (key, canon) Dataset (e.g. from
    :func:`canonical_map_dataset`). Resolves ``subj`` then ``obj`` via two
    hash-partitioned ``Dataset.join`` left-outer joins; unmapped keys keep
    their identity. Prefer the broadcast dict (``make_apply_canon``) while
    the canonical map fits one node — a shuffle of the full triples table
    twice is strictly more expensive.

    ``num_partitions`` is clamped to the cluster's CPU count: Ray's
    hash-shuffle join keeps one aggregator actor per partition alive for
    the whole exchange, so partitions > CPUs deadlocks actor scheduling
    on small sessions (inert at real cluster sizes where CPUs ≫
    partitions).
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    num_partitions = max(2, min(num_partitions, cpus))

    def finish(batch: pa.Table, col: str, canon_col: str) -> pa.Table:
        if canon_col not in batch.schema.names:
            # zero-column empty partition straight out of the join
            return batch
        resolved = batch.column(canon_col)
        orig = batch.column(col)
        merged = pa.compute.if_else(pa.compute.is_null(resolved), orig, resolved)
        i = batch.schema.get_field_index(col)
        return batch.set_column(i, col, merged).drop_columns([canon_col])

    from .relational import coerce_schema

    # (key, canon) are always strings; coercing also pads Ray-internal
    # zero-column empty blocks (groupby on an empty partition) and
    # normalizes pandas blocks to Arrow — both break the per-partition
    # pyarrow join otherwise
    canon_ds = coerce_schema(
        canon_ds, pa.schema([("key", pa.string()), ("canon", pa.string())])
    )

    def renamed(ds, mapping):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                [mapping.get(c, c) for c in batch.schema.names]
            )

        return ds.map_batches(fn, batch_format="pyarrow")

    from .relational import compact_nonempty, dataset_arrow_schema

    linked_schema = dataset_arrow_schema(linked)
    out = linked.join(
        renamed(canon_ds, {"key": "subj", "canon": "__subj_canon"}),
        join_type="left_outer", num_partitions=num_partitions, on=("subj",),
    ).map_batches(lambda b: finish(b, "subj", "__subj_canon"),
                  batch_format="pyarrow")
    # Ray's join emits SCHEMALESS blocks for empty output partitions and
    # lazy ops skip empty blocks, so chaining joins needs a compaction
    # barrier between them. The intermediate is the triples table —
    # already orders of magnitude smaller than the corpus, and the
    # pipeline pins it anyway when materialize_triples is on.
    out = compact_nonempty(coerce_schema(out, linked_schema).materialize())
    if out is None:
        return linked.limit(0)
    out = out.join(
        renamed(canon_ds, {"key": "obj", "canon": "__obj_canon"}),
        join_type="left_outer", num_partitions=num_partitions, on=("obj",),
    ).map_batches(lambda b: finish(b, "obj", "__obj_canon"),
                  batch_format="pyarrow")
    return coerce_schema(out, linked_schema)
