"""Canonicalization — union-find surface-form clustering via groupby rounds.

Merges entity keys that share a normalized surface form into one canonical
key (the lexicographically smallest key in the connected component of the
bipartite surface ↔ key graph). The KG analog of the reference's
metadata set-union + dedup steps (A1/A2, /root/reference/
src/graph_loader.rs:927-934, :1076-1106) lifted from driver metadata to
distributed data.

Implementation: distributed **min-label propagation** expressed purely as
``groupby(node).map_groups`` rounds — no joins, no driver-side graph. Each
round a node's label becomes the min label seen by it or any neighbor;
after R rounds every component of diameter ≤ R carries its min key. The
alias graph here is star-shaped around entity keys (surfaces link keys),
so diameter is small; ``rounds`` is configurable and the invariant is
checked in tests (SURVEY.md §7 hard part 2).

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
    """(key, surface) pairs → initial label-prop state rows.

    Row schema (node, val, tag): tag='label' rows carry the node's current
    label in ``val``; tag='edge' rows carry a neighbor in ``val``. Only key
    nodes get initial labels (labels range over entity keys).
    """
    keys = batch.column("key").to_pylist()
    surfs = batch.column("surface").to_pylist()
    nodes, vals, tags = [], [], []
    for k, s in zip(keys, surfs):
        kn, sn = _K + k, _S + s
        nodes += [kn, sn, kn]
        vals += [sn, kn, k]
        tags += ["edge", "edge", "label"]
    return pa.table(
        {
            "node": pa.array(nodes, pa.string()),
            "val": pa.array(vals, pa.string()),
            "tag": pa.array(tags, pa.string()),
        }
    )


def _prop_round(g: pd.DataFrame) -> pd.DataFrame:
    """One min-label round for one node's group: keep edges, emit the min
    label for self and as a message to every neighbor."""
    node = g["node"].iloc[0]
    labels = g.loc[g["tag"] == "label", "val"]
    edges = g.loc[g["tag"] == "edge", "val"].drop_duplicates()
    out_nodes = list(edges.map(lambda v: node))  # edge rows kept (node,val)
    out_vals = list(edges)
    out_tags = ["edge"] * len(edges)
    if not labels.empty:
        m = labels.min()
        out_nodes.append(node)
        out_vals.append(m)
        out_tags.append("label")
        for nb in edges:
            out_nodes.append(nb)
            out_vals.append(m)
            out_tags.append("label")
    return pd.DataFrame({"node": out_nodes, "val": out_vals, "tag": out_tags})


def canonical_map_dataset(pairs, rounds: int = 4):
    """Distributed: (key, surface) pair Dataset → (key, canon) Dataset."""
    state = pairs.map_batches(_pairs_to_graph, batch_format="pyarrow")
    for _ in range(rounds):
        state = state.groupby("node").map_groups(_prop_round, batch_format="pandas")

    _empty = pd.DataFrame(
        {"key": pd.Series([], dtype="object"), "canon": pd.Series([], dtype="object")}
    )

    def finish_group(g: pd.DataFrame) -> pd.DataFrame:
        node = g["node"].iloc[0]
        if not node.startswith(_K):
            return _empty
        labels = g.loc[g["tag"] == "label", "val"]
        if labels.empty:
            return _empty
        return pd.DataFrame({"key": [node[len(_K):]], "canon": [labels.min()]})

    # final per-node min across the last round's label rows (a node's
    # incoming messages originate in other groups, so one more groupby)
    return state.groupby("node").map_groups(finish_group, batch_format="pandas")


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


def canonicalize(linked, rounds: int = 4, strategy: str = "driver") -> dict[str, str]:
    """LINKED_TRIPLE Dataset → {key: canonical_key} dict.

    The pair set is pre-deduplicated per batch inside ``map_batches``, so
    what reaches the driver (or the shuffle) is O(#distinct entities ×
    #alias forms × #batches-with-dups) — the small side of the build.

    strategy="driver" (default): collect the deduped pairs and run
    union-find locally — one streaming pass, no shuffle. Right whenever
    the entity inventory fits the driver (it is then broadcast via
    ``ray.put`` anyway, so this adds no new scaling constraint).

    strategy="distributed": R rounds of groupby min-label propagation
    (:func:`canonical_map_dataset`) — for inventories too large to
    collect; resolve edges with ``Dataset.join`` in that regime.
    """
    pairs = linked.map_batches(mention_pairs, batch_format="pyarrow")
    if strategy == "driver":
        # distributed tree-dedup first (cross-batch duplicate factor is
        # high — every batch repeats the hot aliases), so the driver only
        # collects the distinct pair set
        from .relational import tree_aggregate

        distinct = tree_aggregate(pairs, lambda df: df.drop_duplicates())
        frames = [
            b.to_pandas()
            for b in distinct.iter_batches(batch_size=None, batch_format="pyarrow")
        ]
        if not frames:
            return {}
        df = pd.concat(frames, ignore_index=True)
        return union_find(list(zip(df["key"], df["surface"])))
    cmap = canonical_map_dataset(pairs, rounds=rounds)
    out: dict[str, str] = {}
    for row in cmap.take_all():
        out[row["key"]] = row["canon"]
    return out


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
    """
    import pyarrow.compute as pc  # noqa: F401

    def finish(batch: pa.Table, col: str, canon_col: str) -> pa.Table:
        resolved = batch.column(canon_col)
        orig = batch.column(col)
        merged = pa.compute.if_else(pa.compute.is_null(resolved), orig, resolved)
        i = batch.schema.get_field_index(col)
        return batch.set_column(i, col, merged).drop_columns([canon_col])

    out = linked.join(
        canon_ds.rename_columns({"key": "subj", "canon": "__subj_canon"}),
        join_type="left_outer", num_partitions=num_partitions, on=("subj",),
    ).map_batches(lambda b: finish(b, "subj", "__subj_canon"),
                  batch_format="pyarrow")
    out = out.join(
        canon_ds.rename_columns({"key": "obj", "canon": "__obj_canon"}),
        join_type="left_outer", num_partitions=num_partitions, on=("obj",),
    ).map_batches(lambda b: finish(b, "obj", "__obj_canon"),
                  batch_format="pyarrow")
    return out
