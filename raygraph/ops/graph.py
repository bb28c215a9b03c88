"""Graph analytics over materialized edge tables.

The reference stops at exporting `_from`/`_to` edge collections for an
external processing system (src/graph_loader.rs load_edges); this module
closes the loop by running the analytics ON the Ray-built graph, staying
in the same Dataset stream: per-vertex degrees live in
``__ray_entry__.kg_degrees``; here are multi-hop reach and PageRank.

Scale shape:

* the edge table is the big side — it is only ever SHUFFLE-joined
  (:func:`~raygraph.ops.relational.shuffle_join`) on a key it is hash
  partitioned by, never broadcast and never collected;
* vertex-sized state (ranks, degrees) flows as Datasets too, so a
  10^9-entity inventory never lands on the driver — only true scalars
  (vertex count, dangling mass) do;
* PageRank runs in fixed-point int64 arithmetic (SCALE = 10^12): every
  operation is integer add / floor-div, so results are bit-identical
  at any parallelism AND reproducible by an integer-SQL oracle — no
  float summation-order nondeterminism.
"""

from __future__ import annotations

import pandas as pd
import numpy as np
import pyarrow as pa

SCALE = 10**12  # fixed-point rank unit: rank 1.0 == 10^12

_RANK_SCHEMA = [("vertex", pa.string()), ("outdeg", pa.int64()),
                ("rank_e12", pa.int64())]


def _repaired(ds, schema: pa.Schema):
    """Materialize + drop Ray's schemaless empty blocks + coerce, so the
    output of a groupby/aggregate/join can feed the next join."""
    from .relational import coerce_schema, compact_nonempty

    import ray.data as rd

    out = compact_nonempty(ds.materialize())
    if out is None:
        return rd.from_arrow(schema.empty_table())
    return coerce_schema(out, schema).materialize()


def distinct_pairs(edges, src: str = "_from", dst: str = "_to"):
    """Deduped directed (src, dst) pair set — parallel edges (same
    endpoints, different predicates) collapse to one arc. Hash-bucketed
    vectorized distinct; schema-repaired so it can feed joins."""
    from .relational import hash_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[[src, dst]].drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    dd = hash_aggregate(
        edges.select_columns([src, dst]).map_batches(
            partial, batch_format="pyarrow"),
        [src, dst],
        lambda df: df.drop_duplicates(),
    )
    return _repaired(dd, pa.schema([(src, pa.string()), (dst, pa.string())]))


def two_hop_counts(edges, src: str = "_from", dst: str = "_to",
                   out: str = "n_two_hop"):
    """Distinct vertices reachable in exactly two directed hops, per
    start vertex (a → b → c counts c once per a, self-reach included).

    One shuffle join of the arc set against itself on the middle vertex
    (b), then an exact two-level distinct count of (a, c) — the join is
    the only all-to-all exchange and both sides are hash-partitioned on
    b. Degenerate hub vertices multiply the join output (fan-in ×
    fan-out per b); that blowup is inherent to the metric, and the
    distinct count that follows collapses it again without driver
    involvement.
    """
    from .relational import _join_partitions, distinct_count, shuffle_join

    pairs = distinct_pairs(edges, src, dst)
    nparts = _join_partitions(pairs.count())

    def rename(ds, names):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(names)

        return ds.map_batches(fn, batch_format="pyarrow")

    left = rename(pairs, ["a", "b"])
    right = rename(pairs, ["b2", "c"])
    # the right key column is merged away by the join; output is (a, b, c)
    j = shuffle_join(left, right, on="b", right_on="b2",
                     num_partitions=nparts)
    j = _repaired(j, pa.schema([("a", pa.string()), ("b", pa.string()),
                                ("c", pa.string())]))
    counted = distinct_count(j.select_columns(["a", "c"]), ["a"], "c",
                             out=out)
    return counted


def connected_components(edges, iters: int = 5, src: str = "_from",
                         dst: str = "_to"):
    """Label propagation over the undirected arc set: after ``iters``
    synchronous rounds each vertex carries the MINIMUM vertex id
    reachable within ``iters`` undirected hops — equal to its true
    connected component whenever ``iters`` ≥ the component diameter
    (fixed rounds keep the spec exact and SQL-reproducible either way;
    min over strings is binary-collation on both engines).

    Per round: ONE edge-sized shuffle join (arcs pick up their source's
    label) and one min-combine by destination (associative, so
    per-batch partials are exact). The fold of a vertex's own label is
    free: the arc set carries a self-loop (v, v) per vertex, so every
    vertex receives its current label as one of the messages and the
    min over incoming messages IS the new label — no vertex-sized
    realign join. Labels stay a Dataset throughout; nothing vertex- or
    edge-sized reaches the driver.
    """
    from .relational import (_join_partitions, preagg_extreme,
                             shuffle_join)

    # pairs feeds count + both arc renames; arcs feeds the label init,
    # the self-loop union AND every round's join — pin each ONCE in the
    # object store or the distinct-pairs exchange re-executes per
    # consumer (measured: the whole CC was ~2× slower from lineage
    # recompute alone at 6.5M edges)
    pairs = distinct_pairs(edges, src, dst).materialize()
    n_pairs = pairs.count()
    # size the per-round join to the ARC set (2×pairs + self-loops),
    # not the pair count — undersizing starves the rounds
    nparts = _join_partitions(3 * n_pairs)
    # the per-round min-combine engine: Ray's native sort-based groupby
    # wins on small graphs, the single-int64-bucket hash_aggregate path
    # wins once the arc set is millions of string rows (measured 2.3×
    # at 18M arcs — crawl-scale dedup components live there). Same
    # labels either way (min is min at any layout).
    eng = "bucketed" if n_pairs > 500_000 else "native"
    nb = max(32, nparts * 4)

    def rename(ds, names):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(names)

        return ds.map_batches(fn, batch_format="pyarrow")

    arc_schema = pa.schema([("u", pa.string()), ("v", pa.string())])
    arcs = _repaired(
        rename(pairs, ["u", "v"]).union(rename(pairs, ["v", "u"])
                                        .select_columns(["u", "v"])),
        arc_schema,
    )

    def dedup_arcs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    # reversed duplicates (a↔b both directions present) are harmless for
    # a min-combine; dedup per-block only, no extra shuffle
    arcs = _repaired(arcs.map_batches(dedup_arcs, batch_format="pyarrow"),
                     arc_schema)

    labels = _repaired(
        preagg_extreme(arcs.select_columns(["u"]), ["u"], "u", how="min",
                       out="label", engine=eng, num_buckets=nb),
        pa.schema([("u", pa.string()), ("label", pa.string())]),
    ).rename_columns({"u": "vertex"}).materialize()

    def self_loops(batch: pa.Table) -> pa.Table:
        return pa.table({"u": batch.column("vertex"),
                         "v": batch.column("vertex")})

    arcs = _repaired(
        arcs.union(labels.map_batches(self_loops, batch_format="pyarrow")),
        arc_schema,
    ).materialize()

    lbl_schema = pa.schema([("vertex", pa.string()),
                            ("label", pa.string())])
    for _ in range(iters):
        # arcs ⋈ labels on u: each arc (incl. the self-loop) carries its
        # source's label to v; min per v = next label
        msgs = shuffle_join(arcs, labels, on="u", right_on="vertex",
                            num_partitions=nparts)
        msgs = _repaired(msgs, pa.schema([("u", pa.string()),
                                          ("v", pa.string()),
                                          ("label", pa.string())]))
        labels = _repaired(
            preagg_extreme(msgs.select_columns(["v", "label"]), ["v"],
                           "label", how="min", out="label",
                           engine=eng, num_buckets=nb),
            pa.schema([("v", pa.string()), ("label", pa.string())]),
        ).rename_columns({"v": "vertex"})
        # pin each round: chaining iters of join+aggregate into one
        # lazy graph measured >2× slower than stage-by-stage execution
        # at millions of arcs (and the next round consumes this twice
        # — join probe + its own lineage)
        labels = labels.materialize()

    return labels.rename_columns({"label": "component"})


def pagerank(edges, iters: int = 3, src: str = "_from", dst: str = "_to",
             personalize: str | None = None):
    """Fixed-point integer PageRank (damping 0.85) over the deduped arc
    set — ``iters`` synchronous iterations, returned as a Dataset of
    (vertex, rank_e12) with rank scaled by 10^12.

    With ``personalize`` (a source vertex id) this is personalized
    PageRank: all restart mass and all dangling mass return to the
    source instead of spreading uniformly —
    ``r0(v) = [v=s]·SCALE`` and
    ``r'(v) = [v=s]·((15·SCALE)//100) + (85·(S(v) + [v=s]·dang))//100``
    — the proximity/recommendation variant, same dataflow and integer
    exactness.

    Exact integer spec (the SQL oracle reproduces it bit-for-bit):

    * ``N`` = #vertices (endpoints of the arc set)
    * ``r0(v) = SCALE // N``
    * per iteration:
      - ``c(u) = r(u) // outdeg(u)`` for vertices with out-arcs
      - ``S(v) = Σ c(u)`` over arcs u→v
      - ``dang = Σ r(u)`` over vertices with no out-arcs (scalar)
      - ``r'(v) = (15·SCALE)//(100·N) + (85·(S(v) + dang//N))//100``

    Per iteration: one shuffle join (arcs ⋈ contributions on src — the
    only edge-sized exchange), one partial-sum aggregate by dst, one
    vertex-sized left join to realign ranks, and one scalar reduction
    for the dangling mass. Rank state stays a Dataset end to end; the
    driver only ever sees N and dang.
    """
    from ray.data.aggregate import Max, Sum

    from .relational import _join_partitions, preagg_extreme, shuffle_join

    pairs = distinct_pairs(edges, src, dst)
    nparts = _join_partitions(pairs.count())

    # vertex inventory WITH out-degree, join-free: per-src count rows
    # (od = #out-arcs) ∪ a zero row per dst endpoint, Max-combined —
    # sources keep their count, sink-only vertices land at 0
    def src_ones(batch: pa.Table) -> pa.Table:
        return pa.table({"vertex": batch.column(src),
                         "od": pa.array([1] * batch.num_rows, pa.int64())})

    def dst_zeros(batch: pa.Table) -> pa.Table:
        return pa.table({"vertex": batch.column(dst),
                         "od": pa.array([0] * batch.num_rows, pa.int64())})

    def od_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("vertex", as_index=False)["od"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    vo = _repaired(
        pairs.map_batches(src_ones, batch_format="pyarrow")
        .union(pairs.map_batches(dst_zeros, batch_format="pyarrow"))
        .map_batches(od_partial, batch_format="pyarrow")
        .groupby("vertex").aggregate(Sum("od", alias_name="outdeg")),
        pa.schema([("vertex", pa.string()), ("outdeg", pa.int64())]),
    )

    n_vertices = vo.count()
    if n_vertices == 0:
        return _repaired(vo, pa.schema(_RANK_SCHEMA))

    def init_ranks(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if personalize is None:
            r = pa.array([SCALE // n_vertices] * batch.num_rows,
                         pa.int64())
        else:
            r = pc.if_else(pc.equal(batch.column("vertex"), personalize),
                           pa.scalar(SCALE, pa.int64()),
                           pa.scalar(0, pa.int64()))
        return pa.table({
            "vertex": batch.column("vertex"),
            "outdeg": batch.column("outdeg"),
            "rank_e12": r,
        })

    ranks = _repaired(vo.map_batches(init_ranks, batch_format="pyarrow"),
                      pa.schema(_RANK_SCHEMA))

    base = ((15 * SCALE) // (100 * n_vertices) if personalize is None
            else (15 * SCALE) // 100)

    for _ in range(iters):
        # per-source contribution (only vertices with out-arcs)
        def contrib(batch: pa.Table) -> pa.Table:
            od = batch.column("outdeg").to_numpy(zero_copy_only=False)
            r = batch.column("rank_e12").to_numpy(zero_copy_only=False)
            keep = od > 0
            return pa.table({
                "cv": batch.column("vertex").filter(pa.array(keep)),
                "c": pa.array(r[keep] // od[keep], pa.int64()),
            })

        # repaired: a block whose vertices are all dangling emits zero
        # rows, and with `personalize` whole rank regions are zero —
        # schemaless empties would poison the join below
        contribs = _repaired(
            ranks.map_batches(contrib, batch_format="pyarrow"),
            pa.schema([("cv", pa.string()), ("c", pa.int64())]))

        # dangling mass: scalar sum of sink-vertex ranks
        def dang_part(batch: pa.Table) -> pa.Table:
            od = batch.column("outdeg").to_numpy(zero_copy_only=False)
            r = batch.column("rank_e12").to_numpy(zero_copy_only=False)
            return pa.table({"d": pa.array([int(r[od == 0].sum())],
                                           pa.int64())})

        dang = sum(
            row["d"]
            for row in ranks.map_batches(dang_part, batch_format="pyarrow")
            .take_all()
        )
        dshare = dang // n_vertices

        # the ONLY join of the iteration: arcs pick up their source's
        # contribution. The realign onto the full vertex set is
        # join-free — each vertex contributes a zero message carrying
        # its outdeg, so one grouped (Sum, Max) covers S and the degree
        j = shuffle_join(pairs, contribs, on=src, right_on="cv",
                         num_partitions=nparts)
        j = _repaired(j, pa.schema([(src, pa.string()), (dst, pa.string()),
                                    ("c", pa.int64())]))

        def edge_msgs(batch: pa.Table) -> pa.Table:
            return pa.table({
                "__v": batch.column(dst),
                "c": batch.column("c"),
                "od": pa.array([-1] * batch.num_rows, pa.int64()),
            })

        def zero_msgs(batch: pa.Table) -> pa.Table:
            return pa.table({
                "__v": batch.column("vertex"),
                "c": pa.array([0] * batch.num_rows, pa.int64()),
                "od": batch.column("outdeg"),
            })

        def msg_partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            g = df.groupby("__v", as_index=False).agg(
                c=("c", "sum"), od=("od", "max"))
            return pa.Table.from_pandas(g, preserve_index=False)

        merged = (
            j.map_batches(edge_msgs, batch_format="pyarrow")
            .union(ranks.map_batches(zero_msgs, batch_format="pyarrow"))
            .map_batches(msg_partial, batch_format="pyarrow")
            .groupby("__v")
            .aggregate(Sum("c", alias_name="s"),
                       Max("od", alias_name="outdeg"))
        )
        merged = _repaired(merged, pa.schema([("__v", pa.string()),
                                              ("s", pa.int64()),
                                              ("outdeg", pa.int64())]))

        def apply_rank(batch: pa.Table) -> pa.Table:
            s = batch.column("s").to_numpy(zero_copy_only=False)
            if personalize is None:
                r = base + (85 * (s + dshare)) // 100
            else:
                is_src = (batch.column("__v").to_pandas()
                          == personalize).to_numpy()
                r = np.where(is_src, base + (85 * (s + dang)) // 100,
                             (85 * s) // 100)
            return pa.table({
                "vertex": batch.column("__v"),
                "outdeg": batch.column("outdeg"),
                "rank_e12": pa.array(r, pa.int64()),
            })

        ranks = _repaired(
            merged.map_batches(apply_rank, batch_format="pyarrow"),
            pa.schema(_RANK_SCHEMA),
        )
        # pin per iteration: ranks feeds THREE consumers next round
        # (contrib map, the dangling take_all, zero_msgs union) — left
        # lazy, each would re-execute the whole previous round (the
        # connected_components lesson, measured 2× there)
        ranks = ranks.materialize()

    return ranks.select_columns(["vertex", "rank_e12"])


def _und_graph(edges, src: str = "_from", dst: str = "_to"):
    """Canonical undirected simple graph under an edge table: returns
    (und, deg, nparts) — distinct lexicographic {u < v} pairs with
    self-loops dropped, per-vertex degrees (combiner preagg), and the
    data-sized join partition count."""
    from .relational import (_join_partitions, hash_aggregate, preagg_sum)

    und_schema = pa.schema([("u", pa.string()), ("v", pa.string())])

    def canon(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        a, b = df[src], df[dst]
        df = pd.DataFrame({"u": a.where(a < b, b), "v": b.where(a < b, a)})
        df = df.loc[df["u"] != df["v"]].drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    und = _repaired(
        hash_aggregate(
            edges.select_columns([src, dst]).map_batches(
                canon, batch_format="pyarrow"),
            ["u", "v"], lambda df: df.drop_duplicates(),
        ),
        und_schema,
    )

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table({
            "vtx": pa.concat_arrays([
                batch.column("u").combine_chunks().cast(pa.string()),
                batch.column("v").combine_chunks().cast(pa.string()),
            ])
        })

    deg = _repaired(
        preagg_sum(und.map_batches(endpoints, batch_format="pyarrow"),
                   ["vtx"], {}, counts="deg"),
        pa.schema([("vtx", pa.string()), ("deg", pa.int64())]),
    )
    return und, deg, _join_partitions(und.count())


def _wedge_plan(edges, src: str = "_from", dst: str = "_to"):
    """Shared wedge-enumeration plan: returns (wedges, und, arcs, deg,
    nparts) where ``wedges`` has ONE row per unordered wedge (a = apex,
    b, c with b before c in (deg, id) order), ``und`` the canonical
    undirected distinct edge set (u < v), ``arcs`` the degree-ordered
    orientation, ``deg`` per-vertex degrees. The standard node-iterator++
    plan (Schank & Wagner 2005 / Cohen's MapReduce formulation):

    1. canonicalize to undirected distinct edges {u, v} (self-loops
       dropped, parallel + reverse duplicates collapsed);
    2. per-vertex degrees (combiner preagg);
    3. ORIENT every edge from its lower-(degree, id) endpoint to the
       higher one — an acyclic orientation with max out-degree
       O(sqrt(m)), which is what bounds the wedge blowup on hub
       vertices (the lex-only orientation would square a hub's degree);
    4. wedges: self shuffle-join of the oriented arcs on the source,
       keeping each unordered pair once ((deg, id)-ordered).

    Consumers either close the wedges into triangles
    (:func:`_triangles`) or count them per outer pair
    (:func:`common_neighbors_topk`). Joins are all hash-partitioned on
    their key; nothing graph-sized reaches the driver.
    """
    from .relational import _join_partitions, shuffle_join

    und, deg, nparts = _und_graph(edges, src, dst)

    def renamed(ds, names):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(names)

        return ds.map_batches(fn, batch_format="pyarrow")

    ju = shuffle_join(und, renamed(deg, ["vtx", "du"]), on="u",
                      right_on="vtx", num_partitions=nparts)
    ju = _repaired(ju, pa.schema([("u", pa.string()), ("v", pa.string()),
                                  ("du", pa.int64())]))

    jv = shuffle_join(ju, renamed(deg, ["vtx", "dv"]), on="v",
                      right_on="vtx", num_partitions=nparts)
    jv = _repaired(jv, pa.schema([("u", pa.string()), ("v", pa.string()),
                                  ("du", pa.int64()), ("dv", pa.int64())]))

    def orient(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        u_first = (df["du"] < df["dv"]) | ((df["du"] == df["dv"])
                                           & (df["u"] < df["v"]))
        return pa.Table.from_pandas(pd.DataFrame({
            "x": df["u"].where(u_first, df["v"]),
            "y": df["v"].where(u_first, df["u"]),
            "dy": df["dv"].where(u_first, df["du"]).astype("int64"),
        }), preserve_index=False)

    arc_schema = pa.schema([("x", pa.string()), ("y", pa.string()),
                            ("dy", pa.int64())])
    arcs = _repaired(jv.map_batches(orient, batch_format="pyarrow"),
                     arc_schema)

    def rename_r(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["x2", "y2", "dy2"])

    wedged = shuffle_join(
        arcs, arcs.map_batches(rename_r, batch_format="pyarrow"),
        on="x", right_on="x2", num_partitions=nparts,
    )
    wedged = _repaired(wedged, pa.schema([
        ("x", pa.string()), ("y", pa.string()), ("dy", pa.int64()),
        ("y2", pa.string()), ("dy2", pa.int64()),
    ]))

    def wedge_pairs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        keep = (df["dy"] < df["dy2"]) | ((df["dy"] == df["dy2"])
                                         & (df["y"] < df["y2"]))
        df = df.loc[keep]
        return pa.Table.from_pandas(
            pd.DataFrame({"a": df["x"], "b": df["y"], "c": df["y2"]}),
            preserve_index=False)

    wedges = _repaired(
        wedged.map_batches(wedge_pairs, batch_format="pyarrow"),
        pa.schema([("a", pa.string()), ("b", pa.string()),
                   ("c", pa.string())]),
    )
    return wedges, und, arcs, deg, nparts


def _triangles(edges, src: str = "_from", dst: str = "_to"):
    """Triangle enumeration: (closed, deg, nparts) where ``closed`` has
    ONE row per triangle (a = wedge apex, b, c) — the :func:`_wedge_plan`
    wedges closed by a left-semi join against the oriented arcs."""
    from .relational import shuffle_join

    wedges, _, arcs, deg, nparts = _wedge_plan(edges, src, dst)

    tri_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                            ("c", pa.string())])
    # a wedge-free graph (e.g. a single surviving edge mid-peel) would
    # hand the hash-shuffle join a schemaless empty side — short-circuit
    if wedges.count() == 0:
        import ray.data as rd

        return rd.from_arrow(tri_schema.empty_table()), deg, nparts
    # left_semi keeps the wedge's apex column, so each surviving row IS
    # the full (a, b, c) triangle
    closed = shuffle_join(wedges, arcs.select_columns(["x", "y"]),
                          on=("b", "c"), right_on=("x", "y"),
                          how="left_semi", num_partitions=nparts)
    closed = _repaired(closed, tri_schema)
    return closed, deg, nparts


def scc_coloring(edges, iters: int = 5, src: str = "_from",
                 dst: str = "_to"):
    """One coloring pass of the forward/backward min-label SCC algorithm
    (Orzan's coloring step) over the DIRECTED arc set: after ``iters``
    synchronous rounds, in(v) = min id with a ≤ ``iters``-hop path INTO
    v (incl. v), out(v) = min id reachable FROM v (incl. v). in(v) ==
    out(v) == m certifies v and m mutually reachable, so every such
    vertex group is exactly the SCC of its pivot m — the pass resolves
    the SCCs whose pivot is the minimum over everything reaching them
    (the full algorithm recurses on the rest; one pass is the
    deterministic, SQL-unrollable unit). Returns (scc_id, n_vertices)
    for the resolved groups.

    Per round and per direction: one edge-sized shuffle join + a
    min-combine (the :func:`connected_components` discipline, directed);
    the two label Datasets meet in one vertex-sized join at the end.
    Nothing vertex- or edge-sized reaches the driver."""
    from .relational import (_join_partitions, preagg_extreme,
                             preagg_sum, shuffle_join)

    pairs = distinct_pairs(edges, src, dst)
    nparts = _join_partitions(pairs.count())
    arc_schema = pa.schema([("u", pa.string()), ("v", pa.string())])
    lbl_schema = pa.schema([("vertex", pa.string()),
                            ("label", pa.string())])

    def rename(ds, names):
        return ds.map_batches(
            lambda b, _n=tuple(names): b.rename_columns(list(_n)),
            batch_format="pyarrow")

    fwd_arcs = _repaired(rename(pairs, ["u", "v"]), arc_schema)
    bwd_arcs = _repaired(rename(pairs, ["v", "u"])
                         .select_columns(["u", "v"]), arc_schema)

    verts = _repaired(
        preagg_extreme(
            fwd_arcs.select_columns(["u"]).union(
                rename(fwd_arcs.select_columns(["v"]), ["u"])),
            ["u"], "u", how="min", out="label"),
        pa.schema([("u", pa.string()), ("label", pa.string())]),
    ).rename_columns({"u": "vertex"})

    def self_loops(batch: pa.Table) -> pa.Table:
        return pa.table({"u": batch.column("vertex"),
                         "v": batch.column("vertex")})

    loops = verts.map_batches(self_loops, batch_format="pyarrow")

    def propagate(arcs):
        arcs = _repaired(arcs.union(loops), arc_schema)
        labels = verts
        for _ in range(iters):
            msgs = shuffle_join(arcs, labels, on="u", right_on="vertex",
                                num_partitions=nparts)
            msgs = _repaired(msgs, pa.schema([
                ("u", pa.string()), ("v", pa.string()),
                ("label", pa.string())]))
            labels = _repaired(
                preagg_extreme(msgs.select_columns(["v", "label"]),
                               ["v"], "label", how="min", out="label"),
                pa.schema([("v", pa.string()), ("label", pa.string())]),
            ).rename_columns({"v": "vertex"}).materialize()
            # per-round pin (CC lesson: lazy chaining re-executes)
        return labels

    fwd = propagate(fwd_arcs)
    bwd = _repaired(propagate(bwd_arcs), lbl_schema) \
        .rename_columns({"label": "out_label"})
    both = shuffle_join(_repaired(fwd, lbl_schema), bwd, on="vertex",
                        right_on="vertex", num_partitions=nparts)
    both = _repaired(both, pa.schema([
        ("vertex", pa.string()), ("label", pa.string()),
        ("out_label", pa.string())]))

    def resolved(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.equal(batch.column("label"),
                                  batch.column("out_label")))
        return pa.table({"scc_id": t.column("label")})

    return preagg_sum(both.map_batches(resolved, batch_format="pyarrow"),
                      ["scc_id"], {}, counts="n_vertices")


def bfs_path_counts(edges, source: str, iters: int = 3,
                    src: str = "_from", dst: str = "_to"):
    """Shortest-path COUNTING from ``source`` (the forward phase of
    Brandes' betweenness algorithm): for every vertex within ``iters``
    hops, its hop distance and the exact number of distinct shortest
    paths σ reaching it — σ(v) = Σ σ(u) over predecessors u one level
    closer (integer, exact, SQL-unrollable).

    Level-synchronous: per round one edge-sized shuffle join carries
    the frontier's σ along arcs, a combiner sum merges parallel
    predecessors, and a left_anti join against the settled set keeps
    only first-time (= shortest-distance) arrivals as the next
    frontier. State stays a Dataset; only the source id and the
    per-round emptiness check touch the driver."""
    import ray.data as rd

    from .relational import (_join_partitions, preagg_sum, shuffle_join)

    pairs = distinct_pairs(edges, src, dst)
    nparts = _join_partitions(pairs.count())
    arc_schema = pa.schema([("u", pa.string()), ("v", pa.string())])
    arcs = _repaired(
        pairs.map_batches(lambda b: b.rename_columns(["u", "v"]),
                          batch_format="pyarrow"), arc_schema)

    st_schema = pa.schema([("vertex", pa.string()), ("dist", pa.int64()),
                           ("n_paths", pa.int64())])
    fr_schema = pa.schema([("vertex", pa.string()),
                           ("n_paths", pa.int64())])
    settled = rd.from_arrow(pa.table({
        "vertex": pa.array([source], pa.string()),
        "dist": pa.array([0], pa.int64()),
        "n_paths": pa.array([1], pa.int64())}))
    front = rd.from_arrow(pa.table({
        "vertex": pa.array([source], pa.string()),
        "n_paths": pa.array([1], pa.int64())}))
    for d in range(1, iters + 1):
        msgs = shuffle_join(arcs, front, on="u", right_on="vertex",
                            num_partitions=nparts)
        msgs = _repaired(msgs, pa.schema([
            ("u", pa.string()), ("v", pa.string()),
            ("n_paths", pa.int64())]))
        cand = _repaired(
            preagg_sum(msgs.select_columns(["v", "n_paths"]), ["v"],
                       {"n_paths": "n_paths"}),
            pa.schema([("v", pa.string()), ("n_paths", pa.int64())]))
        if cand.count() == 0:
            break
        new = shuffle_join(cand, settled.select_columns(["vertex"]),
                           on="v", right_on="vertex", how="left_anti",
                           num_partitions=nparts)
        front = _repaired(
            new.map_batches(
                lambda b: b.rename_columns(["vertex", "n_paths"]),
                batch_format="pyarrow"), fr_schema)
        if front.count() == 0:
            break
        level = front.map_batches(
            lambda b, _d=d: pa.table({
                "vertex": b.column("vertex"),
                "dist": pa.array(np.full(b.num_rows, _d), pa.int64()),
                "n_paths": b.column("n_paths")}),
            batch_format="pyarrow")
        settled = _repaired(settled.union(level), st_schema)
    return settled


def _wedge_pair_counts(edges, src: str = "_from", dst: str = "_to",
                       hub_cap: int | None = None):
    """Common-neighbor witness counts per unordered endpoint pair of the
    undirected simple graph: (counts{u, v, cn}, und, nparts). One
    definition shared by :func:`common_neighbors_topk` (link prediction)
    and :func:`four_cycles` (square motifs) — the apex fans out to BOTH
    directions, a hash-shuffle self-join on the apex enumerates each
    wedge once (x < x2), and a combiner preagg counts witnesses.
    ``hub_cap`` excludes apexes above that degree from witnessing
    (deterministic skew guard, replayable in SQL)."""
    from .relational import preagg_sum, shuffle_join

    und, deg, nparts = _und_graph(edges, src, dst)

    def both_arcs(batch: pa.Table) -> pa.Table:
        u = batch.column("u").combine_chunks().cast(pa.string())
        v = batch.column("v").combine_chunks().cast(pa.string())
        return pa.table({
            "h": pa.concat_arrays([u, v]),
            "x": pa.concat_arrays([v, u]),
        })

    arcs = _repaired(und.map_batches(both_arcs, batch_format="pyarrow"),
                     pa.schema([("h", pa.string()), ("x", pa.string())]))
    if hub_cap is not None:
        import pyarrow.compute as pc

        def small_only(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.less_equal(batch.column("deg"), hub_cap))

        small = deg.map_batches(small_only, batch_format="pyarrow")
        arcs = _repaired(
            shuffle_join(arcs, small.select_columns(["vtx"]), on="h",
                         right_on="vtx", how="left_semi",
                         num_partitions=nparts),
            pa.schema([("h", pa.string()), ("x", pa.string())]))

    def rename2(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["h2", "x2"])

    wedged = shuffle_join(arcs,
                          arcs.map_batches(rename2, batch_format="pyarrow"),
                          on="h", right_on="h2", num_partitions=nparts)
    wedged = _repaired(wedged, pa.schema([
        ("h", pa.string()), ("x", pa.string()), ("x2", pa.string())]))

    def lex_pair(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.loc[df["x"] < df["x2"]]
        return pa.Table.from_pandas(
            pd.DataFrame({"u": df["x"], "v": df["x2"]}),
            preserve_index=False)

    counts = preagg_sum(
        wedged.map_batches(lex_pair, batch_format="pyarrow"),
        ["u", "v"], {}, counts="cn")
    counts = _repaired(counts, pa.schema([
        ("u", pa.string()), ("v", pa.string()), ("cn", pa.int64())]))
    return counts, und, nparts


def four_cycles(edges, src: str = "_from", dst: str = "_to",
                out: str = "n_squares"):
    """Exact 4-cycle (square) count of the undirected simple graph, as a
    single-row Dataset.

    Reference analog: none — graph-curation extension over the exported
    edge table (the reference stops at the export callbacks,
    src/graph_loader.rs:379-383); squares complement the triangle/truss
    family as the even-motif density signal.

    Every 4-cycle x–a–y–b–x is witnessed once by each of its two
    opposite-vertex pairs ({x,y} and {a,b}) as an unordered pair of
    common neighbors, so n_C4 = Σ_pairs C(w, 2) / 2 over the
    common-neighbor counts w of :func:`_wedge_pair_counts`. Per-batch
    partial Σ C(w,2) (vectorized), tree-summed; only the final scalar
    reaches the driver. A wedge-free graph short-circuits (an all-empty
    join side would lose its schema)."""
    from .relational import tree_aggregate

    counts, und, _ = _wedge_pair_counts(edges, src, dst)
    # a wedge-free graph (e.g. isolated edges) leaves ``counts`` as
    # all-empty blocks with no schema — short-circuit to the zero row
    if und.count() == 0 or counts.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({out: pa.array([0], pa.int64())}))

    def partial(batch: pa.Table) -> pa.Table:
        cn = batch.column("cn").to_numpy(zero_copy_only=False)
        s = int((cn * (cn - 1) // 2).sum())
        return pa.table({out: pa.array([s], pa.int64())})

    halves = tree_aggregate(
        counts.map_batches(partial, batch_format="pyarrow",
                           batch_size=None),
        lambda df: pd.DataFrame({out: [int(df[out].sum())]}),
        precombined=True,
    )
    return halves.map_batches(
        lambda b: pa.table({out: pa.array(
            [int(b.column(out)[0].as_py()) // 2], pa.int64())}),
        batch_format="pyarrow")


def adamic_adar_topk(edges, k: int = 20, src: str = "_from",
                     dst: str = "_to"):
    """Adamic–Adar link prediction: top-``k`` NON-adjacent unordered
    pairs by Σ over common neighbors h of floor(10⁶ / ln(deg(h))) —
    the degree-discounted upgrade of :func:`common_neighbors_topk`
    (hub witnesses count less). Weights are floored per APEX before
    summing (the per-term-floor integer discipline), so sums are
    order-free and SQL-reproducible; deg-1 vertices cannot witness a
    wedge and deg(h)=2 is the max weight. Ties → lexicographic pair.

    Plan: the :func:`_und_graph` degree table joins the both-direction
    arc fan-out once (apex-sized), the apex self-join enumerates wedges
    carrying the apex weight, a combiner preagg sums per pair, existing
    edges leave via left_anti, distributed sort + limit."""
    from .relational import preagg_sum, shuffle_join

    und, deg, nparts = _und_graph(edges, src, dst)

    def both_arcs(batch: pa.Table) -> pa.Table:
        u = batch.column("u").combine_chunks().cast(pa.string())
        v = batch.column("v").combine_chunks().cast(pa.string())
        return pa.table({
            "h": pa.concat_arrays([u, v]),
            "x": pa.concat_arrays([v, u]),
        })

    arcs = _repaired(und.map_batches(both_arcs, batch_format="pyarrow"),
                     pa.schema([("h", pa.string()), ("x", pa.string())]))

    def weight(batch: pa.Table) -> pa.Table:
        d = batch.column("deg").to_numpy(zero_copy_only=False)
        w = np.zeros(len(d), dtype="int64")
        big = d >= 2
        w[big] = np.floor(1_000_000 / np.log(d[big].astype("float64"))) \
            .astype("int64")
        return pa.table({"hv": batch.column("vtx"),
                         "w": pa.array(w, pa.int64())})

    wdeg = _repaired(deg.map_batches(weight, batch_format="pyarrow"),
                     pa.schema([("hv", pa.string()), ("w", pa.int64())]))
    warcs = _repaired(
        shuffle_join(arcs, wdeg, on="h", right_on="hv",
                     num_partitions=nparts),
        pa.schema([("h", pa.string()), ("x", pa.string()),
                   ("w", pa.int64())]))

    def rename2(batch: pa.Table) -> pa.Table:
        return batch.select(["h", "x"]).rename_columns(["h2", "x2"])

    wedged = shuffle_join(warcs,
                          warcs.map_batches(rename2,
                                            batch_format="pyarrow"),
                          on="h", right_on="h2", num_partitions=nparts)
    wedged = _repaired(wedged, pa.schema([
        ("h", pa.string()), ("x", pa.string()), ("w", pa.int64()),
        ("x2", pa.string())]))

    def lex_pair(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.loc[df["x"] < df["x2"]]
        return pa.Table.from_pandas(
            pd.DataFrame({"u": df["x"], "v": df["x2"], "w": df["w"]}),
            preserve_index=False)

    scores = preagg_sum(
        wedged.map_batches(lex_pair, batch_format="pyarrow"),
        ["u", "v"], {"aa_e6": "w"})
    scores = _repaired(scores, pa.schema([
        ("u", pa.string()), ("v", pa.string()), ("aa_e6", pa.int64())]))

    non_adjacent = shuffle_join(scores, und, on=("u", "v"),
                                right_on=("u", "v"), how="left_anti",
                                num_partitions=nparts)
    non_adjacent = _repaired(non_adjacent, pa.schema([
        ("u", pa.string()), ("v", pa.string()), ("aa_e6", pa.int64())]))
    return (non_adjacent
            .sort(["aa_e6", "u", "v"], descending=[True, False, False])
            .limit(k))


def common_neighbors_topk(edges, k: int = 20, hub_cap: int | None = None,
                          src: str = "_from", dst: str = "_to"):
    """Link prediction by common-neighbor count: the top-``k``
    NON-adjacent unordered vertex pairs of the undirected simple graph,
    ranked by how many neighbors they share (ties → lexicographic pair).

    Reference analog: none — this is an LLM-data / graph-curation
    extension over the exported edge table (the reference stops at the
    export callbacks, src/graph_loader.rs:379-383).

    Plan: the canonical undirected edge set fans out to BOTH-direction
    arcs (apex → neighbor); a hash-shuffle self-join on the apex
    enumerates each wedge exactly once (x < x2), a combiner preagg
    counts witnesses per pair, existing edges leave via a left_anti
    hash join, and only ``k`` rows survive the distributed sort.

    Unlike the triangle plan, the apex must see ALL its neighbors (a
    degree-ordered orientation would drop wedges whose apex out-ranks
    an endpoint), so the exchange volume is the true wedge count
    Σ d(d−1)/2 — inherent to exact common-neighbor counting. The scale
    knob for skewed graphs is ``hub_cap``: apexes with degree above it
    are excluded from witnessing (deterministic, replayable in the SQL
    oracle by the same degree filter); ``None`` = exact.
    """
    from .relational import shuffle_join

    counts, und, nparts = _wedge_pair_counts(edges, src, dst,
                                             hub_cap=hub_cap)

    non_adjacent = shuffle_join(counts, und, on=("u", "v"),
                                right_on=("u", "v"), how="left_anti",
                                num_partitions=nparts)
    non_adjacent = _repaired(non_adjacent, pa.schema([
        ("u", pa.string()), ("v", pa.string()), ("cn", pa.int64())]))
    return (non_adjacent
            .sort(["cn", "u", "v"], descending=[True, False, False])
            .limit(k))


def triangle_count(edges, src: str = "_from", dst: str = "_to",
                   out: str = "n_triangles"):
    """Exact triangle count of the undirected simple graph under the
    edge table, as a single-row Dataset — delegates triangle
    enumeration to :func:`_triangles` (one definition shared with
    :func:`clustering_coefficient`) and tree-sums the per-batch
    counts; nothing reaches the driver but the final scalar."""
    from .relational import tree_aggregate

    closed, _, _ = _triangles(edges, src, dst)

    def count_batch(batch: pa.Table) -> pa.Table:
        return pa.table({out: pa.array([batch.num_rows], pa.int64())})

    return tree_aggregate(
        closed.map_batches(count_batch, batch_format="pyarrow",
                           batch_size=None),
        lambda df: pd.DataFrame({out: [int(df[out].sum())]}),
        precombined=True,
    )


def clustering_coefficient(edges, src: str = "_from", dst: str = "_to"):
    """Per-vertex local clustering coefficient of the undirected simple
    graph, in exact basis points: cc_bp = floor(10⁴ · 2·t(v) /
    (deg(v)·(deg(v)−1))) over vertices with deg ≥ 2, where t(v) is the
    number of triangles through v. Triangle enumeration is the shared
    degree-ordered :func:`_triangles` plan; each triangle fans out to
    its 3 vertices (vectorized concat), participation counts meet the
    degree table in one vertex-sized left-outer shuffle join (t = 0
    where no triangle closes). Integer output, SQL-reproducible."""
    import pyarrow.compute as pc

    from .relational import preagg_sum, shuffle_join

    closed, deg, nparts = _triangles(edges, src, dst)

    def explode(batch: pa.Table) -> pa.Table:
        return pa.table({"vtx": pa.concat_arrays([
            batch.column(c).combine_chunks().cast(pa.string())
            for c in ("a", "b", "c")])})

    tri = _repaired(
        preagg_sum(closed.map_batches(explode, batch_format="pyarrow"),
                   ["vtx"], {}, counts="t"),
        pa.schema([("vtx", pa.string()), ("t", pa.int64())]))

    def eligible(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column("deg"),
                                             pa.scalar(2)))

    deg2 = _repaired(deg.map_batches(eligible, batch_format="pyarrow"),
                     pa.schema([("vtx", pa.string()), ("deg", pa.int64())]))
    j = shuffle_join(deg2, tri.rename_columns({"vtx": "vtx2"}),
                     on="vtx", right_on="vtx2", how="left_outer",
                     num_partitions=nparts)

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        t = df["t"].fillna(0).astype("int64")
        d = df["deg"].astype("int64")
        return pa.Table.from_pandas(pd.DataFrame({
            "vertex": df["vtx"],
            "deg": d,
            "n_tri": t,
            "cc_bp": (10_000 * 2 * t) // (d * (d - 1)),
        }), preserve_index=False)

    return j.map_batches(finish, batch_format="pyarrow")


BFS_INF = np.int64(1 << 40)  # "unreached" sentinel, far above any hop count


def bfs_distance(edges, source: str, iters: int = 3,
                 src: str = "_from", dst: str = "_to",
                 weight_col: str | None = None):
    """Directed BFS hop distance from ``source``, exact for every vertex
    within ``iters`` hops (unreached vertices are dropped). Same
    dataflow as :func:`connected_components` — per round ONE edge-sized
    shuffle join carries dist(u)+w to v (real arcs w=1, per-vertex
    self-loops w=0 fold the vertex's own dist) and a min-combine per
    destination; distances stay a Dataset throughout, only the source
    id is driver state. Fixed rounds keep the spec exact and
    SQL-unrollable.

    With ``weight_col`` (nonnegative int64 on ``edges``) this is
    Bellman–Ford weighted SSSP: parallel edges collapse to their MIN
    weight (one combiner aggregate instead of the distinct-pair dedup)
    and each round relaxes dist(u) + w — exact for every shortest path
    of ≤ ``iters`` arcs. See :func:`sssp_distance`."""
    import pyarrow.compute as pc

    from .relational import (_join_partitions, preagg_extreme,
                             shuffle_join)

    arc_schema = pa.schema([("u", pa.string()), ("v", pa.string()),
                            ("w", pa.int64())])

    if weight_col is None:
        pairs = distinct_pairs(edges, src, dst)
        nparts = _join_partitions(pairs.count())

        def as_arc(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table({"u": batch.column(src),
                             "v": batch.column(dst),
                             "w": pa.array(np.ones(n, dtype="int64"))})

        arcs = pairs.map_batches(as_arc, batch_format="pyarrow")
    else:
        weighted = preagg_extreme(edges, [src, dst], weight_col,
                                  how="min", out="w")
        nparts = _join_partitions(weighted.count())
        arcs = weighted.map_batches(
            lambda b: pa.table({"u": b.column(src), "v": b.column(dst),
                                "w": b.column("w")}),
            batch_format="pyarrow")
    arcs = _repaired(arcs, arc_schema)
    verts = _repaired(
        preagg_extreme(
            arcs.map_batches(
                lambda b: pa.table({"x": pa.concat_arrays(
                    [b.column("u").combine_chunks().cast(pa.string()),
                     b.column("v").combine_chunks().cast(pa.string())])}),
                batch_format="pyarrow"),
            ["x"], "x", how="min", out="m"),
        pa.schema([("x", pa.string()), ("m", pa.string())]),
    )

    def self_loop(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({"u": batch.column("x"), "v": batch.column("x"),
                         "w": pa.array(np.zeros(n, dtype="int64"))})

    arcs = _repaired(
        arcs.union(verts.map_batches(self_loop, batch_format="pyarrow")),
        arc_schema)

    def init_dist(batch: pa.Table) -> pa.Table:
        d = pc.if_else(pc.equal(batch.column("x"), source),
                       pa.scalar(0, pa.int64()),
                       pa.scalar(int(BFS_INF), pa.int64()))
        return pa.table({"vertex": batch.column("x"), "dist": d})

    lbl_schema = pa.schema([("vertex", pa.string()), ("dist", pa.int64())])
    labels = _repaired(verts.map_batches(init_dist, batch_format="pyarrow"),
                       lbl_schema)

    for _ in range(iters):
        msgs = shuffle_join(arcs, labels, on="u", right_on="vertex",
                            num_partitions=nparts)
        msgs = _repaired(msgs, pa.schema([("u", pa.string()),
                                          ("v", pa.string()),
                                          ("w", pa.int64()),
                                          ("dist", pa.int64())]))

        def add_w(batch: pa.Table) -> pa.Table:
            return pa.table({
                "v": batch.column("v"),
                "dist": pc.add(batch.column("dist"), batch.column("w")),
            })

        labels = _repaired(
            preagg_extreme(msgs.map_batches(add_w, batch_format="pyarrow"),
                           ["v"], "dist", how="min", out="dist"),
            pa.schema([("v", pa.string()), ("dist", pa.int64())]),
        ).rename_columns({"v": "vertex"}).materialize()
        # per-round pin: chained lazy rounds re-execute upstream
        # subtrees (the connected_components lesson)

    def finish(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch.column("dist"), pa.scalar(int(BFS_INF),
                                                       pa.int64()))
        return batch.filter(keep)

    return labels.map_batches(finish, batch_format="pyarrow")


def sssp_distance(edges, source: str, iters: int = 3,
                  src: str = "_from", dst: str = "_to",
                  weight_col: str = "w"):
    """Bellman–Ford single-source shortest paths (nonnegative integer
    weights, ``iters`` synchronous relaxation rounds): exact for every
    shortest path of ≤ ``iters`` arcs. Same join-relax-min dataflow as
    :func:`bfs_distance` — one edge-sized shuffle join + min-combine
    per round — with parallel edges collapsed to their min weight by a
    combiner aggregate up front."""
    return bfs_distance(edges, source, iters=iters, src=src, dst=dst,
                        weight_col=weight_col)


def kcore(edges, k: int = 2, iters: int = 3,
          src: str = "_from", dst: str = "_to"):
    """k-core peel over the undirected simple graph: ``iters`` fixed
    synchronous rounds of "drop every vertex whose degree within the
    surviving subgraph is < k" — the true k-core once the peel
    converges (fixed rounds keep the spec exact and SQL-unrollable
    either way). Returns survivors of the last round with their
    last-round degree.

    Per round the arc set is restricted to live endpoints by TWO
    left-semi shuffle joins against the vertex-sized alive set, then a
    vectorized partial-count degree aggregate; arcs are only ever
    hash-partitioned, never broadcast or collected, and the alive set
    stays a Dataset throughout.
    """
    import pyarrow.compute as pc

    from .relational import (_join_partitions, hash_aggregate,
                             preagg_extreme, preagg_sum, shuffle_join)

    pairs = distinct_pairs(edges, src, dst)
    nparts = _join_partitions(pairs.count())
    arc_schema = pa.schema([("u", pa.string()), ("v", pa.string())])

    def sym(batch: pa.Table) -> pa.Table:
        u = batch.column(src).combine_chunks().cast(pa.string())
        v = batch.column(dst).combine_chunks().cast(pa.string())
        t = pa.table({"u": pa.concat_arrays([u, v]),
                      "v": pa.concat_arrays([v, u])})
        return t.filter(pc.invert(pc.equal(t.column("u"), t.column("v"))))

    # symmetrize → distinct (a→b and b→a collapse to one undirected arc
    # in each direction slot), self-loops dropped before the shuffle
    arcs = _repaired(
        hash_aggregate(pairs.map_batches(sym, batch_format="pyarrow"),
                       ["u", "v"], lambda df: df.drop_duplicates()),
        arc_schema)

    alive = _repaired(
        preagg_extreme(arcs.select_columns(["u"]), ["u"], "u",
                       how="min", out="m"),
        pa.schema([("u", pa.string()), ("m", pa.string())]),
    ).select_columns(["u"]).rename_columns({"u": "x"})

    deg_schema = pa.schema([("u", pa.string()), ("deg", pa.int64())])
    deg = None
    for _ in range(iters):
        a1 = _repaired(shuffle_join(arcs, alive, on="u", right_on="x",
                                    how="left_semi",
                                    num_partitions=nparts), arc_schema)
        a2 = _repaired(shuffle_join(a1, alive, on="v", right_on="x",
                                    how="left_semi",
                                    num_partitions=nparts), arc_schema)
        deg = _repaired(
            preagg_sum(a2.select_columns(["u"]), ["u"], {}, counts="deg"),
            deg_schema)

        def survivors(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.greater_equal(batch.column("deg"), pa.scalar(k)))

        deg = _repaired(
            deg.map_batches(survivors, batch_format="pyarrow"),
            deg_schema).materialize()
        # pin per round: deg feeds TWO consumers next round (both
        # semi-joins via alive) plus the return — lazy chaining would
        # re-execute the whole previous round per consumer
        alive = deg.select_columns(["u"]).rename_columns({"u": "x"})

    return deg.rename_columns({"u": "vertex"})


HITS_CAP = 16_384  # per-round ceil-div rescale bound (2^14)


def hits_authorities(edges, iters: int = 2,
                     src: str = "_from", dst: str = "_to"):
    """HITS link analysis (Kleinberg): ``iters`` synchronous rounds of
    authority ← Σ hub(in-neighbors), hub ← Σ authority(out-neighbors),
    returning the final authority vector. Exact-integer spec so a SQL
    oracle replays it bit-for-bit: scores start at 1, every half-round
    is rescaled by CEIL-div(max score / 2^14) (scores are nonnegative,
    so floor/trunc division agree across engines); sparse semantics —
    a vertex appears iff the defining join produced rows for it, in
    both engines.

    Per half-round: ONE edge-sized shuffle join + a vertex-sized
    combiner sum; the only driver state is the per-round max (a
    scalar). Same Dataset-throughout discipline as :func:`pagerank`.
    """
    import pyarrow.compute as pc

    from .relational import _join_partitions, preagg_sum, shuffle_join

    pairs = distinct_pairs(edges, src, dst)
    nparts = _join_partitions(pairs.count())
    arcs = _repaired(
        pairs.map_batches(
            lambda b: b.rename_columns(["u", "v"]),
            batch_format="pyarrow"),
        pa.schema([("u", pa.string()), ("v", pa.string())]))

    verts = _repaired(
        preagg_sum(arcs.map_batches(
            lambda b: pa.table({"x": pa.concat_arrays(
                [b.column("u").combine_chunks().cast(pa.string()),
                 b.column("v").combine_chunks().cast(pa.string())])}),
            batch_format="pyarrow"), ["x"], {}, counts="__n"),
        pa.schema([("x", pa.string()), ("__n", pa.int64())]),
    ).select_columns(["x"])

    score_schema = pa.schema([("x", pa.string()), ("s", pa.int64())])
    h = _repaired(
        verts.map_batches(
            lambda b: pa.table({"x": b.column("x"),
                                "s": pa.array(np.ones(b.num_rows,
                                                      dtype="int64"))}),
            batch_format="pyarrow"), score_schema)

    def half_round(scores, join_on: str, group_as: str):
        """scores on `join_on` endpoint → summed per `group_as` endpoint,
        ceil-div rescaled to ≤ HITS_CAP."""
        j = shuffle_join(arcs, scores, on=join_on, right_on="x",
                         num_partitions=nparts)
        j = _repaired(j, pa.schema([("u", pa.string()),
                                    ("v", pa.string()),
                                    ("s", pa.int64())]))
        raw = _repaired(
            preagg_sum(j.map_batches(
                lambda b: pa.table({"x": b.column(group_as),
                                    "s": b.column("s")}),
                batch_format="pyarrow"), ["x"], {"s": "s"}),
            score_schema).materialize()  # max() + scale: 2 consumers
        mx = raw.max("s")
        k = max(1, -(-int(mx) // HITS_CAP)) if mx is not None else 1

        def scale(batch: pa.Table) -> pa.Table:
            return pa.table({"x": batch.column("x"),
                             "s": pc.divide(batch.column("s"),
                                            pa.scalar(k, pa.int64()))})

        return _repaired(raw.map_batches(scale, batch_format="pyarrow"),
                         score_schema)

    a = None
    for _ in range(iters):
        a = half_round(h, join_on="u", group_as="v")   # authorities
        h = half_round(a, join_on="v", group_as="u")   # hubs
    return a.rename_columns({"x": "vertex", "s": "auth"})


def edge_support(edges, src: str = "_from", dst: str = "_to"):
    """Per-edge triangle support (the k-truss building block): for each
    undirected simple edge {u < v}, the number of triangles containing
    it. Triangles come from the shared degree-ordered :func:`_wedge_plan`
    close; each triangle explodes to its 3 lex-canonical edges
    (vectorized concat) and folds in one combiner preagg — edges outside
    any triangle do not appear (support 0). Returns
    (sup, und, deg, nparts) so callers can left-join the zero-support
    edges or degrees without rebuilding the plan."""
    from .relational import preagg_sum, shuffle_join

    import ray.data as rd

    wedges, und, arcs, deg, nparts = _wedge_plan(edges, src, dst)
    sup_schema = pa.schema([("u", pa.string()), ("v", pa.string()),
                            ("support", pa.int64())])
    # wedge-free graph: the hash-shuffle join would see a schemaless
    # empty left side — no wedges means no triangles, support is empty
    if wedges.count() == 0:
        return rd.from_arrow(sup_schema.empty_table()), und, deg, nparts
    closed = shuffle_join(wedges, arcs.select_columns(["x", "y"]),
                          on=("b", "c"), right_on=("x", "y"),
                          how="left_semi", num_partitions=nparts)
    closed = _repaired(closed, pa.schema([
        ("a", pa.string()), ("b", pa.string()), ("c", pa.string())]))

    def tri_edges(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if not len(df):
            return pa.table({"u": pa.array([], pa.string()),
                             "v": pa.array([], pa.string())})
        parts = []
        for x, y in (("a", "b"), ("a", "c"), ("b", "c")):
            a, b = df[x], df[y]
            parts.append(pd.DataFrame({"u": a.where(a < b, b),
                                       "v": b.where(a < b, a)}))
        return pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                                    preserve_index=False)

    if closed.count() == 0:
        return rd.from_arrow(sup_schema.empty_table()), und, deg, nparts
    sup = _repaired(
        preagg_sum(closed.map_batches(tri_edges, batch_format="pyarrow"),
                   ["u", "v"], {}, counts="support"),
        sup_schema)
    return sup, und, deg, nparts


def edge_jaccard(edges, src: str = "_from", dst: str = "_to"):
    """Per-edge neighborhood Jaccard similarity in exact basis points
    (the structural-similarity measure graph sparsifiers use): for edge
    {u, v}, jacc_bp = floor(10⁴·s / (deg(u)+deg(v)−2−s)) where s is the
    edge's triangle support — |N(u)∩N(v)| = s and
    |N(u)∪N(v) \\ {u,v}| = deg(u)+deg(v)−2−s. Support meets the edge
    set in one left-outer shuffle join (s = 0 where no triangle closes)
    and the two vertex-degree attachments are hash-partitioned joins on
    each endpoint — nothing vertex- or edge-sized funnels through the
    driver. Edges whose endpoints have no other neighbors (denominator
    0) are dropped, matching the oracle's positive-denominator filter."""
    from .relational import shuffle_join

    sup, und, deg, nparts = edge_support(edges, src, dst)
    j = shuffle_join(und, sup.rename_columns({"u": "u2", "v": "v2"}),
                     on=("u", "v"), right_on=("u2", "v2"),
                     how="left_outer", num_partitions=nparts)
    j = _repaired(j, pa.schema([("u", pa.string()), ("v", pa.string()),
                                ("support", pa.int64())]))
    j = shuffle_join(j, deg.rename_columns({"vtx": "vu", "deg": "deg_u"}),
                     on="u", right_on="vu", num_partitions=nparts)
    j = _repaired(j, pa.schema([
        ("u", pa.string()), ("v", pa.string()), ("support", pa.int64()),
        ("deg_u", pa.int64())]))
    j = shuffle_join(j, deg.rename_columns({"vtx": "vv", "deg": "deg_v"}),
                     on="v", right_on="vv", num_partitions=nparts)
    j = _repaired(j, pa.schema([
        ("u", pa.string()), ("v", pa.string()), ("support", pa.int64()),
        ("deg_u", pa.int64()), ("deg_v", pa.int64())]))

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        s = df["support"].fillna(0).astype("int64")
        den = df["deg_u"].astype("int64") + df["deg_v"].astype("int64") \
            - 2 - s
        keep = (den > 0).to_numpy()
        return pa.Table.from_pandas(pd.DataFrame({
            "u": df["u"][keep], "v": df["v"][keep],
            "support": s[keep],
            "jacc_bp": (10_000 * s[keep]) // den[keep],
        }), preserve_index=False)

    return j.map_batches(finish, batch_format="pyarrow")


def degree_assortativity(edges, src: str = "_from", dst: str = "_to"):
    """Degree assortativity of the undirected simple graph: exact-moment
    Pearson correlation (basis points, floor) of endpoint degrees over
    both-direction arcs — the standard Newman r. Degrees attach to arcs
    via two vertex-hash-partitioned shuffle joins; the five integer
    moment sums fold per batch (:func:`relational.grouped_corr_bp`
    discipline) so the only driver-sized object is the single-group
    moment row. Returns a one-row DataFrame (n_rows = 2·|E|, corr_bp)."""
    from .relational import grouped_corr_bp, shuffle_join

    und, deg, nparts = _und_graph(edges, src, dst)

    def both_dirs(batch: pa.Table) -> pa.Table:
        u = batch.column("u").combine_chunks().cast(pa.string())
        v = batch.column("v").combine_chunks().cast(pa.string())
        return pa.table({"a": pa.concat_arrays([u, v]),
                         "b": pa.concat_arrays([v, u])})

    arcs = und.map_batches(both_dirs, batch_format="pyarrow")
    j = shuffle_join(arcs, deg.rename_columns({"vtx": "va", "deg": "deg_a"}),
                     on="a", right_on="va", num_partitions=nparts)
    j = _repaired(j, pa.schema([
        ("a", pa.string()), ("b", pa.string()), ("deg_a", pa.int64())]))
    j = shuffle_join(j, deg.rename_columns({"vtx": "vb", "deg": "deg_b"}),
                     on="b", right_on="vb", num_partitions=nparts)
    j = _repaired(j, pa.schema([
        ("a", pa.string()), ("b", pa.string()), ("deg_a", pa.int64()),
        ("deg_b", pa.int64())]))

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column("g", pa.array([0] * len(batch),
                                                 pa.int64()))

    out = grouped_corr_bp(j.map_batches(tag, batch_format="pyarrow"),
                          ["g"], "deg_a", "deg_b")
    return out.drop(columns=["g"])


def truss_edges(edges, k: int = 4, rounds: int = 2,
                src: str = "_from", dst: str = "_to"):
    """Iterative k-truss peel (k ≥ 3): ``rounds`` synchronous rounds of
    "recompute per-edge triangle support on the CURRENT edge set, drop
    edges with support < k−2" — equal to the true k-truss whenever
    ``rounds`` reaches the peel's fixpoint (fixed rounds keep the spec
    deterministic and SQL-reproducible either way, the same discipline
    as :func:`connected_components`). Each round is one full
    degree-ordered triangle plan over the surviving edges plus one
    edge-hash inner join; since k−2 ≥ 1 an edge outside every triangle
    drops via the join itself. Edge sets stay Datasets throughout —
    driver sees only the loop counter."""
    if k < 3:
        raise ValueError("k-truss needs k >= 3")
    from .relational import shuffle_join

    import ray.data as rd

    und_schema = pa.schema([("u", pa.string()), ("v", pa.string())])
    und = _und_graph(edges, src, dst)[0]
    for _ in range(rounds):
        if und.count() == 0:
            break
        sup, und, _, nparts = edge_support(und, src="u", dst="v")

        def strong(batch: pa.Table, _k=k) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.greater_equal(
                batch.column("support"), pa.scalar(_k - 2)))

        keep = _repaired(
            sup.map_batches(strong, batch_format="pyarrow"),
            pa.schema([("u", pa.string()), ("v", pa.string()),
                       ("support", pa.int64())]))
        # a fully-peeled round leaves the semi join a schemaless empty
        # right side — short-circuit to the (stable) empty edge set
        if keep.count() == 0:
            und = rd.from_arrow(und_schema.empty_table())
            break
        j = shuffle_join(und, keep.rename_columns({"u": "u2", "v": "v2"}),
                         on=("u", "v"), right_on=("u2", "v2"),
                         how="left_semi", num_partitions=nparts)
        # pin per peel round: the next round's support rebuild consumes
        # und several times (wedge plan + joins)
        und = _repaired(j, und_schema).materialize()
    return und


def hash_greedy_walks(edges, steps: int = 3,
                      src: str = "_from", dst: str = "_to"):
    """Deterministic walk sampling for graph-embedding prep (the
    node2vec-corpus shape with id-derived pseudo-randomness instead of a
    seeded RNG, so a SQL oracle replays it): from EVERY vertex, ``steps``
    hops where next(v) = argmin over neighbors w of the md5-derived arc
    key — a fixed "random" successor per vertex. The successor table is
    ONE argmin hash_aggregate over the undirected arc set (md5 computed
    once per arc — a keyed-build cost, the same class as the sha1 edge
    keys); each hop is one vertex-hash shuffle join of the walk frontier
    against it. Frontier and successor table stay Datasets; the walk
    matrix is (V × steps) and never funnels through the driver."""
    import hashlib

    from .relational import hash_aggregate, shuffle_join

    und, deg, nparts = _und_graph(edges, src, dst)

    def both_dirs(batch: pa.Table) -> pa.Table:
        u = batch.column("u").combine_chunks().cast(pa.string())
        v = batch.column("v").combine_chunks().cast(pa.string())
        return pa.table({"a": pa.concat_arrays([u, v]),
                         "b": pa.concat_arrays([v, u])})

    arcs = und.map_batches(both_dirs, batch_format="pyarrow")

    def keyed(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hk"] = [
            int(hashlib.md5(f"{a}>{b}".encode()).hexdigest()[:15], 16)
            for a, b in zip(df["a"], df["b"])
        ]
        df["hk"] = df["hk"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    def argmin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["hk", "b"]).drop_duplicates("a")
        return df[["a", "b"]].rename(columns={"b": "nxt"})

    nxt = _repaired(
        hash_aggregate(arcs.map_batches(keyed, batch_format="pyarrow"),
                       ["a"], argmin),
        pa.schema([("a", pa.string()), ("nxt", pa.string())]))

    state = deg.select_columns(["vtx"]).rename_columns({"vtx": "vertex"})
    state = _repaired(state, pa.schema([("vertex", pa.string())]))
    cols = [("vertex", pa.string())]
    last = "vertex"
    for i in range(1, steps + 1):
        step_col = f"w{i}"
        state = shuffle_join(
            state, nxt.rename_columns({"a": "__a", "nxt": step_col}),
            on=last, right_on="__a", num_partitions=nparts)
        cols.append((step_col, pa.string()))
        state = _repaired(state, pa.schema(cols))
        last = step_col
    return state


def _multi_source_bfs(edges, n_seeds: int, iters: int,
                      src: str = "_from", dst: str = "_to"):
    """Monotone-frontier multi-source BFS shared by
    :func:`closeness_centrality` and :func:`eccentricity_profile`:
    seeds are the ``n_seeds`` highest-out-degree vertices (ties ->
    smallest id); returns the (source, vertex, dist) label Dataset of
    all REACHED pairs within ``iters`` hops. State is bounded by the
    union of the seeds' hop balls — never a V x S matrix; per round one
    edge-sized shuffle join + a min-combine per (source, vertex)."""
    import pyarrow.compute as pc

    import ray.data as rd

    from .relational import (_join_partitions, preagg_extreme, preagg_sum,
                             shuffle_join)

    pairs = distinct_pairs(edges, src, dst)
    nparts = _join_partitions(pairs.count())

    deg = preagg_sum(pairs.select_columns([src]), [src], {}, counts="d")
    top = deg.sort(["d", src], descending=[True, False]).take(n_seeds)
    seeds = [r[src] for r in top]

    arc_schema = pa.schema([("u", pa.string()), ("v", pa.string())])
    arcs = _repaired(
        pairs.map_batches(
            lambda b: pa.table({"u": b.column(src), "v": b.column(dst)}),
            batch_format="pyarrow"),
        arc_schema)

    lbl_schema = pa.schema([("source", pa.string()),
                            ("vertex", pa.string()),
                            ("dist", pa.int64())])
    labels = _repaired(
        rd.from_arrow(pa.table({
            "source": pa.array(seeds, pa.string()),
            "vertex": pa.array(seeds, pa.string()),
            "dist": pa.array([0] * len(seeds), pa.int64()),
        })),
        lbl_schema)

    msg_schema = pa.schema([("u", pa.string()), ("v", pa.string()),
                            ("source", pa.string()), ("dist", pa.int64())])
    for _ in range(iters):
        msgs = _repaired(
            shuffle_join(arcs, labels, on="u", right_on="vertex",
                         num_partitions=nparts),
            msg_schema)

        def relax(batch: pa.Table) -> pa.Table:
            return pa.table({
                "source": batch.column("source"),
                "vertex": batch.column("v"),
                "dist": pc.add(batch.column("dist"),
                               pa.scalar(1, pa.int64())),
            })

        labels = _repaired(
            preagg_extreme(
                labels.union(msgs.map_batches(relax,
                                              batch_format="pyarrow")),
                ["source", "vertex"], "dist", how="min", out="dist"),
            lbl_schema).materialize()  # per-round pin (CC lesson)
    return labels


def eccentricity_profile(edges, n_seeds: int = 8, iters: int = 3,
                         src: str = "_from", dst: str = "_to"):
    """Per-seed truncated eccentricity: for each of the ``n_seeds``
    top-out-degree vertices, the max BFS distance reached within
    ``iters`` hops plus the reached count. max(ecc) over seeds is the
    standard sampled lower bound on the graph diameter — the frontier
    growth / "is this graph a ball or a chain" diagnostic run before
    sizing iterative algorithms. Same BFS exchange as
    :func:`closeness_centrality`; the per-seed fold is one
    hash-bucketed vectorized groupby (output is n_seeds rows)."""
    from .relational import hash_aggregate

    labels = _multi_source_bfs(edges, n_seeds, iters, src, dst)

    def fold(df):
        g = df[df["dist"] > 0].groupby("source")["dist"] \
            .agg(ecc="max", reached="size").reset_index()
        g["ecc"] = g["ecc"].astype("int64")
        g["reached"] = g["reached"].astype("int64")
        return g

    return _repaired(
        hash_aggregate(labels, ["source"], fold, num_buckets=8),
        pa.schema([("source", pa.string()), ("ecc", pa.int64()),
                   ("reached", pa.int64())]))


def closeness_centrality(edges, n_seeds: int = 8, iters: int = 3,
                         src: str = "_from", dst: str = "_to"):
    """Directed closeness / harmonic centrality for the ``n_seeds``
    highest-out-degree vertices (ties -> smallest id): multi-source BFS
    truncated at ``iters`` hops.

    The reference exports the edge list for exactly this kind of
    downstream analytics (src/graph_loader.rs load_edges); here the BFS
    stays in the Dataset stream. Unlike :func:`bfs_distance` the label
    table is MONOTONE-FRONTIER: it holds only REACHED (source, vertex)
    pairs (never an INF-dense V x S matrix), so state is bounded by the
    union of the seeds' ``iters``-hop balls. Per round: one edge-sized
    shuffle join fans dist(u)+1 over arcs, a union folds the standing
    labels back in (the w=0 self-loop of bfs_distance, without
    seed-multiplying the arc table), and one min-combine per
    (source, vertex) closes the round. Driver state is the seed id list
    (n_seeds strings) — nothing graph-sized.

    Output per seed: ``reached`` (vertices != seed within ``iters``
    hops), ``dist_sum`` (classic closeness denominator) and
    ``harmonic_e6`` = sum(floor(1e6 / d)) — exact integers, so the SQL
    oracle unrolls bit-for-bit.
    """
    import pyarrow.compute as pc

    from .relational import preagg_sum

    labels = _multi_source_bfs(edges, n_seeds, iters, src, dst)

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch.column("dist"),
                                    pa.scalar(0, pa.int64())))
        d = t.column("dist").to_numpy(zero_copy_only=False)
        return pa.table({
            "source": t.column("source"),
            "dist": t.column("dist"),
            "h": pa.array(1_000_000 // d, pa.int64()),
        })

    return preagg_sum(
        labels.map_batches(finish, batch_format="pyarrow"),
        ["source"], {"dist_sum": "dist", "harmonic_e6": "h"},
        counts="reached")


def label_propagation(edges, iters: int = 3,
                      src: str = "_from", dst: str = "_to",
                      return_members: bool = False):
    """Synchronous label-propagation community detection (LPA) over the
    undirected arc set, ``iters`` fixed rounds, returning per-community
    sizes.

    The reference exports the edge list precisely so downstream
    analytics like community detection can run on it
    (src/graph_loader.rs load_edges); here the whole vote loop stays in
    the Dataset stream. Unlike :func:`connected_components` (min-label,
    idempotent, tolerant of duplicate arcs) LPA votes by COUNT, so the
    arc multiset must be globally exact: one hash-distinct exchange
    builds the undirected arc set WITH one self-loop per vertex (the
    vertex votes for its own current label — the deterministic
    tie-breaking variant), and every round is one edge-sized shuffle
    join (arcs pick up their tail's label), a (vertex, label) partial
    count, and an argmax-per-vertex resolved as a MIN over the
    composite key ``zfill9(999999999 - count) || md5(label) || label``
    — max count first, ties broken by the label's md5 (pseudo-random
    but deterministic: a smallest-LABEL tie-break degenerates LPA into
    min-label components and collapses the graph to one community;
    hashing spreads the tie choices), binary collation identical in
    Arrow and DuckDB so the SQL oracle unrolls bit-for-bit. Driver
    state is nothing graph-sized.
    """
    import hashlib

    import pyarrow.compute as pc

    from .relational import (_join_partitions, hash_aggregate,
                             preagg_extreme, preagg_sum, shuffle_join)

    pairs = distinct_pairs(edges, src, dst)

    arc_schema = pa.schema([("u", pa.string()), ("v", pa.string())])

    def undirect(batch: pa.Table) -> pa.Table:
        u, v = batch.column(src), batch.column(dst)
        return pa.table({
            "u": pa.chunked_array([u, v, u, v]),
            "v": pa.chunked_array([v, u, u, v]),
        })

    def partial_distinct(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    arcs = _repaired(
        hash_aggregate(
            pairs.map_batches(undirect, batch_format="pyarrow")
                 .map_batches(partial_distinct, batch_format="pyarrow"),
            ["u", "v"],
            lambda df: df.drop_duplicates(),
        ),
        arc_schema)
    nparts = _join_partitions(arcs.count())

    lbl_schema = pa.schema([("vertex", pa.string()),
                            ("label", pa.string())])

    def seed(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("u"), batch.column("v")))
        return pa.table({"vertex": t.column("u"), "label": t.column("v")})

    labels = _repaired(arcs.map_batches(seed, batch_format="pyarrow"),
                       lbl_schema)

    msg_schema = pa.schema([("u", pa.string()), ("v", pa.string()),
                            ("label", pa.string())])
    for _ in range(iters):
        msgs = _repaired(
            shuffle_join(arcs, labels, on="u", right_on="vertex",
                         num_partitions=nparts),
            msg_schema)
        cnt = preagg_sum(msgs.select_columns(["v", "label"]),
                         ["v", "label"], {}, counts="c")

        def keyed(batch: pa.Table) -> pa.Table:
            inv = pc.subtract(pa.scalar(999_999_999, pa.int64()),
                              batch.column("c"))
            lab = batch.column("label").to_pandas()
            uniq = lab.unique()
            h = {t: hashlib.md5(t.encode("utf-8")).hexdigest()
                 for t in uniq}
            k = pc.binary_join_element_wise(
                pc.utf8_lpad(pc.cast(inv, pa.string()), 9, "0"),
                pa.array(lab.map(h), pa.string()),
                batch.column("label"), "")
            return pa.table({"vertex": batch.column("v"), "k": k})

        won = preagg_extreme(
            cnt.map_batches(keyed, batch_format="pyarrow"),
            ["vertex"], "k", how="min", out="k")

        def strip(batch: pa.Table) -> pa.Table:
            return pa.table({
                "vertex": batch.column("vertex"),
                "label": pc.utf8_slice_codeunits(batch.column("k"), 41),
            })

        labels = _repaired(won.map_batches(strip, batch_format="pyarrow"),
                           lbl_schema).materialize()  # per-round pin

    if return_members:
        return labels
    out = preagg_sum(labels.select_columns(["label"]), ["label"],
                     {}, counts="size")
    return out.map_batches(
        lambda b: b.rename_columns(["community", "size"]),
        batch_format="pyarrow")


def modularity(edges, labels, src: str = "_from", dst: str = "_to"):
    """Newman modularity of a given vertex partition over the
    undirected simple graph — the partition-quality score that turns
    :func:`label_propagation` from "some communities" into a measured
    clustering (Newman & Girvan 2004). ``labels`` is a (vertex, label)
    Dataset, e.g. ``label_propagation(..., return_members=True)``.

    Exact integer spec per community c (the SQL oracle replays it):
    ``q_term_e6 = (10⁶·e_c) // m − (10⁶·d_c²) // (4m²)`` with e_c =
    intra-community edges, d_c = degree sum, m = total undirected
    edges; global Q_e6 = Σ q_term_e6 (independent floors summed as
    ints — order-free). int64 bound: needs d_c < 3·10⁶ and m < 1.5·10⁹
    (the e6 scale times their squares must stay under 2⁶³).

    Exchange shape: the canonical undirected edge set + degrees from
    :func:`_und_graph`, TWO label-keyed shuffle joins (one per
    endpoint; the right side is renamed first — Ray joins reject
    duplicate field names), community-keyed combiner preaggs for e_c
    and d_c, one left join to align them (zero-intra communities keep
    their degree mass). Output: one row per community
    (community, e_in, d_sum, q_term_e6).
    """
    from .relational import preagg_sum, shuffle_join

    import pyarrow.compute as pc

    und, deg, nparts = _und_graph(edges, src, dst)
    m = und.count()
    out_schema = pa.schema([("community", pa.string()),
                            ("e_in", pa.int64()),
                            ("d_sum", pa.int64()),
                            ("q_term_e6", pa.int64())])
    if m == 0:
        import ray.data as rd

        return rd.from_arrow(out_schema.empty_table())

    # materialize the partition ONCE: labels is typically the tail of a
    # full LPA pipeline, and the three label-keyed joins below would
    # each re-execute it from scratch otherwise (correct only because
    # LPA is deterministic, and 3x the work either way)
    labels = labels.materialize()
    lu = labels.rename_columns({"vertex": "__vu", "label": "__cu"})
    lv = labels.rename_columns({"vertex": "__vv", "label": "__cv"})
    tagged = _repaired(
        shuffle_join(
            _repaired(shuffle_join(und, lu, on="u", right_on="__vu",
                                   num_partitions=nparts),
                      pa.schema([("u", pa.string()), ("v", pa.string()),
                                 ("__cu", pa.string())])),
            lv, on="v", right_on="__vv", num_partitions=nparts),
        pa.schema([("u", pa.string()), ("v", pa.string()),
                   ("__cu", pa.string()), ("__cv", pa.string())]))

    def intra(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("__cu"),
                                  batch.column("__cv")))
        return pa.table({"community": t.column("__cu")})

    e_in = _repaired(
        preagg_sum(tagged.map_batches(intra, batch_format="pyarrow"),
                   ["community"], {}, counts="e_in"),
        pa.schema([("community", pa.string()), ("e_in", pa.int64())]))

    dsum = _repaired(
        preagg_sum(
            _repaired(
                shuffle_join(deg, labels.rename_columns(
                    {"vertex": "__vd", "label": "community"}),
                    on="vtx", right_on="__vd",
                    num_partitions=nparts),
                pa.schema([("vtx", pa.string()),
                           ("deg", pa.int64()),
                           ("community", pa.string())]))
            .select_columns(["community", "deg"]),
            ["community"], {"d_sum": "deg"}),
        pa.schema([("community", pa.string()), ("d_sum", pa.int64())]))

    joined = _repaired(
        shuffle_join(dsum, e_in.rename_columns(
            {"community": "__ce"}).materialize(),
            on="community", right_on="__ce", how="left_outer",
            num_partitions=nparts),
        pa.schema([("community", pa.string()), ("d_sum", pa.int64()),
                   ("e_in", pa.int64())]))

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        e = df["e_in"].fillna(0).astype("int64").to_numpy()
        d = df["d_sum"].to_numpy(dtype="int64")
        q = (1_000_000 * e) // m - (1_000_000 * d * d) // (4 * m * m)
        return pa.table({
            "community": pa.array(df["community"].astype(str)),
            "e_in": pa.array(e),
            "d_sum": pa.array(d),
            "q_term_e6": pa.array(q.astype("int64")),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def maximal_independent_set(edges, iters: int = 2,
                            src: str = "_from", dst: str = "_to"):
    """Luby-style maximal-independent-set rounds over the undirected
    arc set (Luby 1986, the classic parallel MIS primitive), with a
    DETERMINISTIC priority ``md5(v) || v`` instead of fresh randomness —
    a fixed total order, so the whole run is reproducible and the SQL
    oracle unrolls bit-for-bit.

    Per round, an undecided vertex joins the MIS iff its priority is
    strictly below every UNDECIDED neighbor's (the round-1 winner set is
    exactly the priority-function MIS; vertices with no undecided
    neighbor win unconditionally); winners and their neighbors leave
    the undecided set. ``iters`` fixed rounds — in expectation Luby
    needs O(log n), but the output after any prefix of rounds is a
    valid independent set and the spec stays exact.

    Scale shape: one global distinct builds the undirected arc set and
    the vertex set together (injected self-loop rows carry the vertex
    set; u==v rows are excluded from the arc set, i.e. real self-loops
    are treated as non-edges — mirrored exactly in the oracle).
    Per round: one arc-sized shuffle join (arcs whose HEAD is still
    undecided), a min-priority combine per tail, one bucketed
    select-resolve, one winner-sized join fanning removals, and one
    bucketed set-difference. Undecided/winner sets are vertex-sized
    Datasets, re-materialized per round (linear lineage); the driver
    holds only per-round counts.
    """
    import hashlib

    import pyarrow.compute as pc

    from .relational import (_join_partitions, hash_aggregate,
                             preagg_extreme, shuffle_join)
    import ray.data as rd

    pairs = distinct_pairs(edges, src, dst)

    base_schema = pa.schema([("u", pa.string()), ("v", pa.string())])

    def undirect(batch: pa.Table) -> pa.Table:
        u, v = batch.column(src), batch.column(dst)
        return pa.table({
            "u": pa.chunked_array([u, v, u, v]),
            "v": pa.chunked_array([v, u, u, v]),
        })

    def partial_distinct(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    base = _repaired(
        hash_aggregate(
            pairs.map_batches(undirect, batch_format="pyarrow")
                 .map_batches(partial_distinct, batch_format="pyarrow"),
            ["u", "v"],
            lambda df: df.drop_duplicates(),
        ),
        base_schema)
    nparts = _join_partitions(base.count())

    arcs = _repaired(
        base.map_batches(
            lambda b: b.filter(pc.invert(pc.equal(b.column("u"),
                                                  b.column("v")))),
            batch_format="pyarrow"),
        base_schema)

    vx_schema = pa.schema([("x", pa.string())])
    und = _repaired(
        base.map_batches(
            lambda b: pa.table({"x": b.filter(
                pc.equal(b.column("u"), b.column("v"))).column("u")}),
            batch_format="pyarrow"),
        vx_schema)

    if arcs.count() == 0:
        # only self-loops (non-edges by spec): every vertex is
        # independent and wins round 1 — also dodges the all-empty
        # join-side schema loss
        return und.map_batches(
            lambda b: pa.table({
                "vertex": b.column("x"),
                "round": pa.array([1] * b.num_rows, pa.int64())}),
            batch_format="pyarrow")

    def prio(col: pa.ChunkedArray) -> pa.Array:
        s = col.to_pandas()
        uniq = s.unique()
        h = {t: hashlib.md5(t.encode("utf-8")).hexdigest() + t
             for t in uniq}
        return pa.array(s.map(h), pa.string())

    sel_schema = pa.schema([("x", pa.string()), ("round", pa.int64())])
    cand_schema = pa.schema([("x", pa.string()), ("kind", pa.int64()),
                             ("val", pa.string())])
    upd_schema = pa.schema([("x", pa.string()), ("f", pa.int64())])
    live_schema = pa.schema([("u", pa.string()), ("v", pa.string())])

    won = []
    for r in range(1, iters + 1):
        if und.count() == 0:
            break
        live = _repaired(
            shuffle_join(arcs, und, on="v", right_on="x",
                         num_partitions=nparts),
            live_schema)
        nm = preagg_extreme(
            live.map_batches(
                lambda b: pa.table({"u": b.column("u"),
                                    "pv": prio(b.column("v"))}),
                batch_format="pyarrow"),
            ["u"], "pv", how="min", out="m")

        cand = _repaired(
            und.map_batches(
                lambda b: pa.table({
                    "x": b.column("x"),
                    "kind": pa.array([0] * b.num_rows, pa.int64()),
                    "val": prio(b.column("x"))}),
                batch_format="pyarrow"),
            cand_schema).union(_repaired(
                nm.map_batches(
                    lambda b: pa.table({
                        "x": b.column("u"),
                        "kind": pa.array([1] * b.num_rows, pa.int64()),
                        "val": b.column("m")}),
                    batch_format="pyarrow"),
                cand_schema))

        def resolve(df):
            p = df[df["kind"] == 0]
            m = df[df["kind"] == 1].groupby("x")["val"].min()
            got = p.merge(m.rename("m"), how="left",
                          left_on="x", right_index=True)
            keep = got["m"].isna() | (got["val"] < got["m"])
            return got.loc[keep, ["x"]]

        sel = _repaired(hash_aggregate(cand, ["x"], resolve), vx_schema)
        won.append(_repaired(
            sel.map_batches(
                lambda b, _r=r: b.append_column(
                    "round", pa.array([_r] * b.num_rows, pa.int64())),
                batch_format="pyarrow"),
            sel_schema))

        heads = _repaired(
            shuffle_join(arcs, sel, on="u", right_on="x",
                         num_partitions=nparts),
            live_schema)
        upd = (_repaired(
            und.map_batches(
                lambda b: pa.table({
                    "x": b.column("x"),
                    "f": pa.array([0] * b.num_rows, pa.int64())}),
                batch_format="pyarrow"),
            upd_schema)
            .union(
                _repaired(sel.map_batches(
                    lambda b: pa.table({
                        "x": b.column("x"),
                        "f": pa.array([1] * b.num_rows, pa.int64())}),
                    batch_format="pyarrow"), upd_schema),
                _repaired(heads.map_batches(
                    lambda b: pa.table({
                        "x": b.column("v"),
                        "f": pa.array([1] * b.num_rows, pa.int64())}),
                    batch_format="pyarrow"), upd_schema)))

        def survive(df):
            g = df.groupby("x", as_index=False)["f"].max()
            return g.loc[g["f"] == 0, ["x"]]

        und = _repaired(hash_aggregate(upd, ["x"], survive), vx_schema)

    if not won:
        return rd.from_arrow(sel_schema.empty_table())
    out = won[0]
    if len(won) > 1:
        out = out.union(*won[1:])
    return out.map_batches(
        lambda b: b.rename_columns(["vertex", "round"]),
        batch_format="pyarrow")


def edge_diff_counts(new_edges, old_edges,
                     src: str = "_from", pred: str = "pred",
                     dst: str = "_to"):
    """Snapshot diff of two edge tables: per-predicate count of edges
    present in ``new_edges`` but not ``old_edges`` — the lineage audit
    run after :func:`raygraph.pipeline.merge_delta` ("what did this
    delta add to the graph?").

    Distributed as one hash-partitioned ``left_anti`` join on the full
    (src, pred, dst) key (the distributed NOT EXISTS — neither side is
    driver-resident) followed by a pred-keyed combiner preagg; output
    is predicate-cardinality-sized."""
    from .relational import (_join_partitions, preagg_sum, shuffle_join)

    import ray.data as rd

    cols = [src, pred, dst]
    out_schema = pa.schema([(pred, pa.string()), ("n_added", pa.int64())])
    nparts = _join_partitions(new_edges.count())
    added = shuffle_join(new_edges.select_columns(cols),
                         old_edges.select_columns(cols),
                         on=tuple(cols), how="left_anti",
                         num_partitions=nparts).materialize()
    if added.count() == 0:
        # an all-empty-block join output loses its schema ("No match
        # for FieldRef") — short-circuit the empty diff
        return rd.from_arrow(out_schema.empty_table())
    added = _repaired(added, pa.schema([(c, pa.string()) for c in cols]))
    return _repaired(
        preagg_sum(added.select_columns([pred]), [pred], {},
                   counts="n_added"),
        out_schema)


def maximal_matching(edges, iters: int = 2,
                     src: str = "_from", dst: str = "_to"):
    """Deterministic parallel maximal matching — the edge-side dual of
    :func:`maximal_independent_set` (locally-minimal-edge rounds,
    Hoepman 2004 / Israeli–Itai with a fixed priority instead of fresh
    randomness, so the run is reproducible and the SQL oracle unrolls
    bit-for-bit).

    Edge priority is ``md5(u|v) || u|v`` over the canonical undirected
    key (u < v; self-loops excluded, parallel arcs collapsed). Per
    round an alive edge joins the matching iff its priority is the
    strict minimum among alive edges at BOTH endpoints (priorities are
    distinct, so at most one edge wins per vertex — always a valid
    matching); every alive edge touching a matched vertex then dies.
    After enough rounds no alive edges remain and the matching is
    maximal; any prefix of rounds is still a valid matching.

    Scale shape per round: one map-side endpoint explode feeding a
    vertex-keyed min-combine (``preagg_extreme``), one wins-per-edge
    sum (an edge needs 2 endpoint wins), and one bucketed
    set-difference keyed by the edge — all arc-sized exchanges, no
    driver-side state beyond per-round counts.
    """
    import hashlib

    from .relational import hash_aggregate, preagg_sum
    import ray.data as rd

    pairs = distinct_pairs(edges, src, dst)
    e_schema = pa.schema([("u", pa.string()), ("v", pa.string()),
                          ("p", pa.string())])

    def canon(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        a, b = df[src], df[dst]
        df = pd.DataFrame({"u": a.where(a < b, b),
                           "v": b.where(a < b, a)})
        df = df[df["u"] != df["v"]].drop_duplicates()
        key = df["u"] + "|" + df["v"]
        df["p"] = key.map(lambda k: hashlib.md5(
            k.encode("utf-8")).hexdigest() + k)
        return pa.Table.from_pandas(df, preserve_index=False)

    alive = _repaired(
        hash_aggregate(pairs.map_batches(canon, batch_format="pyarrow"),
                       ["u", "v"], lambda df: df.drop_duplicates()),
        e_schema)

    sel_schema = pa.schema([("u", pa.string()), ("v", pa.string()),
                            ("round", pa.int64())])
    won = []
    for r in range(1, iters + 1):
        if alive.count() == 0:
            break

        def endpoints(batch: pa.Table) -> pa.Table:
            u, v, p = (batch.column(c) for c in ("u", "v", "p"))
            return pa.table({"x": pa.chunked_array([u, v]),
                             "p": pa.chunked_array([p, p])})

        ex = alive.map_batches(endpoints, batch_format="pyarrow")
        from .relational import preagg_extreme

        mins = preagg_extreme(ex, ["x"], "p", how="min", out="m")

        # an edge is selected iff it is the per-endpoint minimum TWICE
        def win_rows(batch: pa.Table) -> pa.Table:
            return pa.table({"p": batch.column("m"),
                             "w": pa.array([1] * batch.num_rows,
                                           pa.int64())})

        wins = preagg_sum(mins.map_batches(win_rows,
                                           batch_format="pyarrow"),
                          ["p"], {"w": "w"})

        def pick(df):
            return df.loc[df["w"] == 2, ["p"]]

        sel_keys = _repaired(hash_aggregate(wins, ["p"], pick),
                             pa.schema([("p", pa.string())]))
        from .relational import _join_partitions, shuffle_join

        nparts = _join_partitions(alive.count())
        sel = _repaired(
            shuffle_join(alive, sel_keys, on="p", right_on="p",
                         how="left_semi", num_partitions=nparts),
            e_schema)
        won.append(_repaired(
            sel.map_batches(
                lambda b, _r=r: pa.table({
                    "u": b.column("u"), "v": b.column("v"),
                    "round": pa.array([_r] * b.num_rows, pa.int64())}),
                batch_format="pyarrow"),
            sel_schema))

        # kill every alive edge touching a matched vertex: explode to
        # (x, p), semi-join matched endpoints, anti-join the drop keys
        matched_x = _repaired(
            sel.map_batches(
                lambda b: pa.table({"x": pa.chunked_array(
                    [b.column("u"), b.column("v")])}),
                batch_format="pyarrow"),
            pa.schema([("x", pa.string())]))
        drop = _repaired(
            shuffle_join(
                _repaired(ex, pa.schema([("x", pa.string()),
                                         ("p", pa.string())])),
                matched_x, on="x", right_on="x", how="left_semi",
                num_partitions=nparts),
            pa.schema([("x", pa.string()), ("p", pa.string())]))
        drop_keys = _repaired(
            hash_aggregate(drop.select_columns(["p"]), ["p"],
                           lambda df: df.drop_duplicates()),
            pa.schema([("p", pa.string())]))
        nxt = shuffle_join(alive, drop_keys, on="p", right_on="p",
                           how="left_anti",
                           num_partitions=nparts).materialize()
        if nxt.count() == 0:
            break
        alive = _repaired(nxt, e_schema)

    if not won:
        return rd.from_arrow(sel_schema.empty_table())
    out = won[0]
    if len(won) > 1:
        out = out.union(*won[1:])
    return out


def khop_sample(edges, n_seeds: int = 5, fanout: int = 3, hops: int = 2,
                src: str = "_from", dst: str = "_to"):
    """GraphSAGE-style k-hop neighborhood sampling — the GNN
    training-data primitive (Hamilton et al., NeurIPS 2017) with
    id-derived pseudo-randomness instead of a seeded RNG so a SQL
    oracle replays it: every vertex keeps its top-``fanout`` out-
    neighbors under the fixed order ``md5(v) || v``, and each of the
    ``n_seeds`` top-out-degree roots (ties → smallest id) expands
    ``hops`` rounds through that sampled successor table. Returns the
    sampled subgraph as (source, hop, u, v) arcs.

    Scale shape: ONE ranked-neighbor hash_aggregate builds the
    fanout-pruned adjacency (vectorized rank-within-u, ≤ fanout rows
    per vertex); per hop one frontier shuffle join + bucketed distinct.
    Frontiers are (seed, vertex) Datasets bounded by
    n_seeds · fanout^hop — nothing graph-sized on the driver.
    """
    import hashlib

    from .relational import (_join_partitions, hash_aggregate,
                             preagg_sum, shuffle_join)
    import ray.data as rd

    pairs = distinct_pairs(edges, src, dst)
    nparts = _join_partitions(pairs.count())

    def keyed(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().rename(columns={src: "u", dst: "v"})
        uniq = df["v"].unique()
        pk = {t: hashlib.md5(t.encode("utf-8")).hexdigest() + t
              for t in uniq}
        df["pk"] = df["v"].map(pk)
        return pa.Table.from_pandas(df, preserve_index=False)

    def topn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["u", "pk"], kind="mergesort")
        keep = df.groupby("u", sort=False).cumcount() < fanout
        return df.loc[keep, ["u", "v"]]

    tn = _repaired(
        hash_aggregate(pairs.map_batches(keyed, batch_format="pyarrow"),
                       ["u"], topn),
        pa.schema([("u", pa.string()), ("v", pa.string())]))

    deg = preagg_sum(pairs.select_columns([src]), [src], {}, counts="d")
    seeds = [r[src] for r in
             deg.sort(["d", src], descending=[True, False])
             .take(n_seeds)]
    frontier = _repaired(
        rd.from_arrow(pa.table({"s": pa.array(seeds, pa.string()),
                                "x": pa.array(seeds, pa.string())})),
        pa.schema([("s", pa.string()), ("x", pa.string())]))

    out_schema = pa.schema([("source", pa.string()), ("hop", pa.int64()),
                            ("u", pa.string()), ("v", pa.string())])
    won = []
    for h in range(1, hops + 1):
        joined = shuffle_join(tn, frontier, on="u", right_on="x",
                              num_partitions=nparts)
        # consumed twice (output arcs + next frontier): pin the tiny
        # (≤ n_seeds·fanout^hop rows) result instead of re-joining
        arcs = _repaired(
            hash_aggregate(joined, ["s", "u", "v"],
                           lambda df: df.drop_duplicates()),
            pa.schema([("u", pa.string()), ("v", pa.string()),
                       ("s", pa.string())])).materialize()
        won.append(_repaired(
            arcs.map_batches(
                lambda b, _h=h: pa.table({
                    "source": b.column("s"),
                    "hop": pa.array([_h] * b.num_rows, pa.int64()),
                    "u": b.column("u"), "v": b.column("v")}),
                batch_format="pyarrow"),
            out_schema))
        frontier = _repaired(
            hash_aggregate(
                arcs.map_batches(
                    lambda b: pa.table({"s": b.column("s"),
                                        "x": b.column("v")}),
                    batch_format="pyarrow"),
                ["s", "x"], lambda df: df.drop_duplicates()),
            pa.schema([("s", pa.string()), ("x", pa.string())]))

    out = won[0]
    if len(won) > 1:
        out = out.union(*won[1:])
    return out


BC_SCALE = 1_000_000


def betweenness_sampled(edges, n_seeds: int = 3, hops: int = 3,
                        src: str = "_from", dst: str = "_to"):
    """Sampled, hop-bounded Brandes betweenness (Brandes 2001; pivot
    sampling per Brandes–Pich 2007): from ``n_seeds`` top-out-degree
    sources, level-synchronous BFS accumulates shortest-path counts
    (sigma), then the dependency sweep runs the levels backward with
    the EXACT integer spec ``delta(u) += (sigma_u * (SCALE +
    delta_w)) // sigma_w`` per DAG arc — each term floored
    independently, so the sum is order-free and a SQL oracle replays
    it bit-for-bit. Returns (vertex, bc_e6) with source endpoints
    excluded; a bounded-hop, sampled-source centrality (the exact
    algorithm's scale-honest cousin — full Brandes is O(V·E)).

    Scale shape: per level ONE arc join + per-(source, vertex) sum for
    sigma (with an anti-join against the visited set), and one
    DAG-arc join + grouped floored sum per backward level. All
    exchanges are arc-sized; per-(source) state is vertex-bounded
    Datasets. The driver holds nothing graph-sized.
    """
    from .relational import (_join_partitions, hash_aggregate,
                             preagg_sum, shuffle_join)
    import ray.data as rd

    pairs = distinct_pairs(edges, src, dst)
    nparts = _join_partitions(pairs.count())
    deg = preagg_sum(pairs.select_columns([src]), [src], {}, counts="d")
    seeds = [r[src] for r in
             deg.sort(["d", src], descending=[True, False])
             .take(n_seeds)]

    lv_schema = pa.schema([("s", pa.string()), ("v", pa.string()),
                           ("sigma", pa.int64())])
    levels = [_repaired(
        rd.from_arrow(pa.table({
            "s": pa.array(seeds, pa.string()),
            "v": pa.array(seeds, pa.string()),
            "sigma": pa.array([1] * len(seeds), pa.int64())})),
        lv_schema)]
    visited = levels[0]

    arcs = _repaired(
        pairs.map_batches(
            lambda b: pa.table({"u": b.column(src).cast(pa.string()),
                                "w": b.column(dst).cast(pa.string())}),
            batch_format="pyarrow"),
        pa.schema([("u", pa.string()), ("w", pa.string())]))

    for _ in range(hops):
        ext = shuffle_join(levels[-1], arcs, on="v", right_on="u",
                           num_partitions=nparts)
        # ext: (s, v, sigma, w) — candidate next-level visits
        cand = _repaired(
            ext.map_batches(
                lambda b: pa.table({"s": b.column("s"),
                                    "v": b.column("w"),
                                    "sigma": b.column("sigma")}),
                batch_format="pyarrow"),
            lv_schema)
        if cand.count() == 0:
            # an all-empty join side loses its schema in the shuffle
            # ("No match for FieldRef") — short-circuit the fixpoint
            break
        fresh = shuffle_join(cand, visited.select_columns(["s", "v"]),
                             on=("s", "v"), right_on=("s", "v"),
                             how="left_anti",
                             num_partitions=nparts).materialize()
        if fresh.count() == 0:
            break
        nxt = _repaired(
            preagg_sum(_repaired(fresh, lv_schema), ["s", "v"],
                       {"sigma": "sigma"}),
            lv_schema).materialize()
        levels.append(nxt)
        visited = _repaired(visited.union(nxt.select_columns(
            ["s", "v", "sigma"])), lv_schema).materialize()

    # backward dependency sweep over the level DAG
    dl_schema = pa.schema([("s", pa.string()), ("v", pa.string()),
                           ("delta", pa.int64())])
    delta = _repaired(
        levels[-1].map_batches(
            lambda b: pa.table({"s": b.column("s"), "v": b.column("v"),
                                "delta": pa.array([0] * b.num_rows,
                                                  pa.int64())}),
            batch_format="pyarrow"),
        dl_schema)
    acc = []
    if len(levels) <= hops:
        # BFS exhausted before the hop budget: the deepest REAL level
        # sits below index `hops`, so its (all-zero) delta rows are
        # part of the bounded spec's output (the SQL unroll's del{i}
        # for that level) — only a full-depth run excludes its deepest
        # level, which is the init frontier of the backward sweep
        acc.append(delta)
    for i in range(len(levels) - 2, -1, -1):
        lo, hi = levels[i], levels[i + 1]
        # DAG arcs between the two levels carrying both sigmas
        e1 = _repaired(
            shuffle_join(lo, arcs, on="v", right_on="u",
                         num_partitions=nparts),
            pa.schema([("s", pa.string()), ("v", pa.string()),
                       ("sigma", pa.int64()), ("w", pa.string())]))
        if e1.count() == 0:
            delta = _repaired(
                lo.map_batches(
                    lambda b: pa.table({
                        "s": b.column("s"), "v": b.column("v"),
                        "delta": pa.array([0] * b.num_rows, pa.int64())}),
                    batch_format="pyarrow"),
                dl_schema)
            acc.append(delta)
            continue
        # e1: (s, v, sigma, w); attach the successor's sigma + delta
        hi_d = shuffle_join(hi, delta, on=("s", "v"),
                            right_on=("s", "v"),
                            num_partitions=nparts)
        hw = _repaired(
            hi_d.map_batches(
                lambda b: pa.table({"s": b.column("s"),
                                    "w": b.column("v"),
                                    "sw": b.column("sigma"),
                                    "dw": b.column("delta")}),
                batch_format="pyarrow"),
            pa.schema([("s", pa.string()), ("w", pa.string()),
                       ("sw", pa.int64()), ("dw", pa.int64())]))
        dag = shuffle_join(_repaired(e1, pa.schema(
            [("s", pa.string()), ("v", pa.string()),
             ("sigma", pa.int64()), ("w", pa.string())])),
            hw, on=("s", "w"), right_on=("s", "w"),
            num_partitions=nparts).materialize()
        if dag.count() == 0:
            delta = _repaired(
                lo.map_batches(
                    lambda b: pa.table({
                        "s": b.column("s"), "v": b.column("v"),
                        "delta": pa.array([0] * b.num_rows, pa.int64())}),
                    batch_format="pyarrow"),
                dl_schema)
            acc.append(delta)  # SQL's del{i} keeps zero-delta rows
            continue

        def terms(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            t = (df["sigma"].to_numpy(dtype="int64")
                 * (BC_SCALE + df["dw"].to_numpy(dtype="int64"))
                 ) // df["sw"].to_numpy(dtype="int64")
            return pa.table({"s": pa.array(df["s"], pa.string()),
                             "v": pa.array(df["v"], pa.string()),
                             "t": pa.array(t, pa.int64())})

        dsum = preagg_sum(dag.map_batches(terms, batch_format="pyarrow"),
                          ["s", "v"], {"delta": "t"})
        # vertices of this level with no DAG successor keep delta 0 —
        # realized via a left join of the level onto the sums
        lvj = shuffle_join(lo.select_columns(["s", "v"]),
                           _repaired(dsum, dl_schema),
                           on=("s", "v"), right_on=("s", "v"),
                           how="left_outer", num_partitions=nparts)

        def fill(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["delta"] = df["delta"].fillna(0).astype("int64")
            return pa.Table.from_pandas(df[["s", "v", "delta"]],
                                        preserve_index=False)

        delta = _repaired(
            lvj.map_batches(fill, batch_format="pyarrow"),
            dl_schema).materialize()
        acc.append(delta)

    if not acc:
        return rd.from_arrow(pa.schema(
            [("vertex", pa.string()), ("bc_e6", pa.int64())])
            .empty_table())
    alld = acc[0]
    if len(acc) > 1:
        alld = alld.union(*acc[1:])

    def strip_self(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.invert(pc.equal(batch.column("s"), batch.column("v")))
        t = batch.filter(keep)
        return pa.table({"vertex": t.column("v"),
                         "bc_e6": t.column("delta")})

    out = preagg_sum(alld.map_batches(strip_self,
                                      batch_format="pyarrow"),
                     ["vertex"], {"bc_e6": "bc_e6"})
    return _repaired(out, pa.schema([("vertex", pa.string()),
                                     ("bc_e6", pa.int64())]))


def rpq_pairs(edges, preds, src: str = "_from", pred: str = "pred",
              dst: str = "_to"):
    """Regular-path query for a fixed predicate SEQUENCE (the RPQ
    concatenation core, SPARQL property-path ``p1/p2/…``): endpoint
    pairs reachable by following ``preds`` in order, with the exact
    path count. Per step one pred-filtered distinct arc set joins the
    frontier on the junction vertex and path multiplicities multiply
    (distinct arcs ⇒ sum of frontier counts); a grouped combiner after
    each join keeps the frontier at (src, junction)-cardinality.

    All exchanges are arc-sized shuffle joins keyed by the junction —
    the same dataflow class as one BFS round per predicate."""
    import pyarrow.compute as pc

    from .relational import (_join_partitions, preagg_sum, shuffle_join)
    import ray.data as rd

    out_schema = pa.schema([("src", pa.string()), ("dst", pa.string()),
                            ("n_paths", pa.int64())])

    def arcs_of(p):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch.column(pred), pa.scalar(p)))
            df = t.to_pandas()[[src, dst]].drop_duplicates()
            return pa.table({
                "u": pa.array(df[src].astype(str), pa.string()),
                "w": pa.array(df[dst].astype(str), pa.string()),
            })

        from .relational import hash_aggregate

        return _repaired(
            hash_aggregate(
                edges.map_batches(fn, batch_format="pyarrow"),
                ["u", "w"], lambda df: df.drop_duplicates()),
            pa.schema([("u", pa.string()), ("w", pa.string())]))

    first = arcs_of(preds[0])
    cur = _repaired(
        first.map_batches(
            lambda b: pa.table({"src": b.column("u"),
                                "dst": b.column("w"),
                                "n_paths": pa.array([1] * b.num_rows,
                                                    pa.int64())}),
            batch_format="pyarrow"),
        out_schema)
    for p in preds[1:]:
        if cur.count() == 0:
            return rd.from_arrow(out_schema.empty_table())
        nxt = arcs_of(p)
        joined = shuffle_join(cur, nxt, on="dst", right_on="u",
                              num_partitions=_join_partitions(
                                  cur.count()))
        stepped = _repaired(
            joined.map_batches(
                lambda b: pa.table({"src": b.column("src"),
                                    "dst": b.column("w"),
                                    "n_paths": b.column("n_paths")}),
                batch_format="pyarrow"),
            out_schema)
        if stepped.count() == 0:
            return rd.from_arrow(out_schema.empty_table())
        cur = _repaired(
            preagg_sum(stepped, ["src", "dst"], {"n_paths": "n_paths"}),
            out_schema)
    return cur


def katz_centrality(edges, iters: int = 3, beta_den: int = 5,
                    src: str = "_from", dst: str = "_to"):
    """Katz centrality over the deduped arc set — ``iters`` synchronous
    rounds of the attenuated-path recurrence, fixed-point e6 integers.

    Exact integer spec (the SQL oracle reproduces it bit-for-bit):

    * ``x0(v) = 10^6`` for every arc endpoint
    * per iteration: ``S(v) = Σ x(u)`` over arcs u→v, then
      ``x'(v) = 10^6 + S(v) // beta_den``  (β = 1/beta_den, floor)

    so ``x(v)/10^6`` approximates ``Σ_k β^k · #paths of length k ending
    at v`` — the walk-counting cousin of PageRank without the degree
    normalization (hubs reachable by many short paths score high even
    when their in-neighbors are themselves high-degree). Against the
    reference this extends the exported edge table
    (src/graph_loader.rs:629 do_edges) with a third centrality the
    export's downstream consumers typically compute first.

    Per iteration: one edge-sized shuffle join (arcs pick up their
    source's score) + one combiner preagg by dst + a vertex-sized
    union realign — same exchange shape as :func:`pagerank` minus the
    dangling-mass scalar. State stays a Dataset end to end.
    """
    from ray.data.aggregate import Sum

    from .relational import _join_partitions, shuffle_join

    import ray.data as rd

    E6 = 10**6
    out_schema = pa.schema([("vertex", pa.string()),
                            ("katz_e6", pa.int64())])
    pairs = distinct_pairs(edges, src, dst)
    if pairs.count() == 0:
        return rd.from_arrow(out_schema.empty_table())
    nparts = _join_partitions(pairs.count())

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table({"vertex": pa.concat_arrays([
            batch.column(src).combine_chunks().cast(pa.string()),
            batch.column(dst).combine_chunks().cast(pa.string()),
        ])})

    def ep_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    from .relational import hash_aggregate

    vs = _repaired(
        hash_aggregate(
            pairs.map_batches(endpoints, batch_format="pyarrow")
            .map_batches(ep_partial, batch_format="pyarrow"),
            ["vertex"], lambda df: df.drop_duplicates()),
        pa.schema([("vertex", pa.string())]))

    def init_x(batch: pa.Table) -> pa.Table:
        return pa.table({"vertex": batch.column("vertex"),
                         "katz_e6": pa.array([E6] * batch.num_rows,
                                             pa.int64())})

    ranks = _repaired(vs.map_batches(init_x, batch_format="pyarrow"),
                      out_schema)

    for _ in range(iters):
        j = shuffle_join(pairs, ranks, on=src, right_on="vertex",
                         num_partitions=nparts)
        j = _repaired(j, pa.schema([(src, pa.string()),
                                    (dst, pa.string()),
                                    ("katz_e6", pa.int64())]))

        def edge_msgs(batch: pa.Table) -> pa.Table:
            return pa.table({"__v": batch.column(dst),
                             "s": batch.column("katz_e6")})

        def zero_msgs(batch: pa.Table) -> pa.Table:
            return pa.table({"__v": batch.column("vertex"),
                             "s": pa.array([0] * batch.num_rows,
                                           pa.int64())})

        def msg_partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            g = df.groupby("__v", as_index=False)["s"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        merged = _repaired(
            j.map_batches(edge_msgs, batch_format="pyarrow")
            .union(vs.map_batches(zero_msgs, batch_format="pyarrow"))
            .map_batches(msg_partial, batch_format="pyarrow")
            .groupby("__v").aggregate(Sum("s", alias_name="s")),
            pa.schema([("__v", pa.string()), ("s", pa.int64())]))

        def apply_x(batch: pa.Table) -> pa.Table:
            s = batch.column("s").to_numpy(zero_copy_only=False)
            return pa.table({
                "vertex": batch.column("__v"),
                "katz_e6": pa.array(E6 + s // beta_den, pa.int64()),
            })

        ranks = _repaired(
            merged.map_batches(apply_x, batch_format="pyarrow"),
            out_schema).materialize()  # per-round pin (CC lesson)

    return ranks


def wl_colors(edges, iters: int = 2, src: str = "_from", dst: str = "_to"):
    """Weisfeiler–Lehman color refinement over the undirected simple
    graph — ``iters`` rounds of neighbor-multiset hashing; returns the
    final color-class histogram (color, size).

    Exact string spec (md5 is the cross-engine hash bridge):

    * ``c0(v) = md5(str(deg(v)))``
    * per round ``c'(v) = md5(c(v) || '|' || ','.join(sorted(c(u) for
      u ~ v)))`` — lexicographic sort, binary collation both engines

    WL classes are the canonical structural-role fingerprint (graph
    isomorphism's workhorse); over the exported edge table
    (src/graph_loader.rs:629 do_edges) the histogram profiles how many
    distinct local topologies the built KG contains. Per round: one
    edge-sized shuffle join (arcs pick up their endpoint's color), one
    hash-bucketed sorted-concat per vertex, one vertex-sized join to
    fold the own color back in. Color state stays a Dataset.
    """
    import hashlib

    from .relational import hash_aggregate, preagg_sum, shuffle_join

    import ray.data as rd

    out_schema = pa.schema([("color", pa.string()), ("size", pa.int64())])
    und, deg, nparts = _und_graph(edges, src, dst)
    if und.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    col_schema = pa.schema([("vertex", pa.string()), ("c", pa.string())])

    def init_colors(batch: pa.Table) -> pa.Table:
        d = batch.column("deg").to_pylist()
        return pa.table({
            "vertex": batch.column("vtx"),
            "c": pa.array([hashlib.md5(str(x).encode()).hexdigest()
                           for x in d], pa.string()),
        })

    colors = _repaired(deg.map_batches(init_colors, batch_format="pyarrow"),
                       col_schema)

    def both_dirs(batch: pa.Table) -> pa.Table:
        u = batch.column("u").combine_chunks().cast(pa.string())
        v = batch.column("v").combine_chunks().cast(pa.string())
        return pa.table({"a": pa.concat_arrays([u, v]),
                         "b": pa.concat_arrays([v, u])})

    arcs = _repaired(und.map_batches(both_dirs, batch_format="pyarrow"),
                     pa.schema([("a", pa.string()), ("b", pa.string())]))

    for _ in range(iters):
        # each arc picks up its tail's color; head collects the multiset
        msgs = shuffle_join(arcs, colors, on="a", right_on="vertex",
                            num_partitions=nparts)
        msgs = _repaired(msgs, pa.schema([("a", pa.string()),
                                          ("b", pa.string()),
                                          ("c", pa.string())]))

        def nb_fold(df: pd.DataFrame) -> pd.DataFrame:
            g = (df.sort_values(["b", "c"], kind="mergesort")
                 .groupby("b", as_index=False)["c"]
                 .agg(",".join))
            return g.rename(columns={"b": "vertex", "c": "nbs"})

        nb = _repaired(
            hash_aggregate(msgs.select_columns(["b", "c"]), ["b"], nb_fold),
            pa.schema([("vertex", pa.string()), ("nbs", pa.string())]))

        j = shuffle_join(nb, colors, on="vertex", right_on="vertex",
                         num_partitions=nparts)
        j = _repaired(j, pa.schema([("vertex", pa.string()),
                                    ("nbs", pa.string()),
                                    ("c", pa.string())]))

        def rehash(batch: pa.Table) -> pa.Table:
            own = batch.column("c").to_pylist()
            nbs = batch.column("nbs").to_pylist()
            return pa.table({
                "vertex": batch.column("vertex"),
                "c": pa.array([hashlib.md5(f"{o}|{n}".encode()).hexdigest()
                               for o, n in zip(own, nbs)], pa.string()),
            })

        colors = _repaired(j.map_batches(rehash, batch_format="pyarrow"),
                           col_schema).materialize()  # per-round pin

    hist = preagg_sum(
        colors.map_batches(
            lambda b: pa.table({"color": b.column("c")}),
            batch_format="pyarrow"),
        ["color"], {}, counts="size")
    return _repaired(hist, out_schema)


def _md5_weight(u: pd.Series, v: pd.Series) -> pd.Series:
    """Deterministic pseudo-random edge weight in [0, 10^6): the
    established md5 hash-int bridge over the canonical pair key, so the
    SQL oracle computes the identical weight."""
    import hashlib

    key = u.str.cat(v, sep="|")
    return key.map(lambda s: int(hashlib.md5(s.encode())
                                 .hexdigest()[:15], 16) % 1000000)


def msf_boruvka(edges, iters: int = 2, inner: int = 3,
                src: str = "_from", dst: str = "_to"):
    """Borůvka minimum spanning forest over the undirected simple graph
    with deterministic md5-derived weights — ``iters`` synchronous
    rounds, each followed by ``inner`` rounds of min-label contraction.

    Exact spec (the SQL oracle unrolls it term for term):

    * weight ``w(u,v) = md5int15(u||'|'||v) % 10^6`` on canonical
      ``u < v`` pairs; tie-break key ``k = zfill6(w)||'|'||u||'|'||v``
    * per round every component picks its minimum-``k`` incident edge
      crossing to another component (classic Borůvka hook); picked
      edges dedup on the pair key and join the forest
    * contraction = a one-hop min-parent ``p0(c) = min(c, picked
      neighbors)`` followed by ``inner`` pointer-jumping rounds
      ``p <- p∘p`` over the picked component graph (+ self-loops):
      reach doubles per round, so chains up to 2^inner components
      collapse to their minimum label; the final forest dedups on the
      pair key (an unconverged pair may re-pick the same edge)

    Borůvka is THE shuffle-native MST algorithm (O(log n) rounds, each
    an edge-sized join + a component-sized argmin) — per round: two
    edge⋈label joins, one hash-bucketed per-component argmin, one pair
    dedup, then component-sized contraction joins. All state stays
    Datasets; with fixed round counts the output is bit-identical at
    any parallelism, picked-but-unconverged rounds included.

    Returns the forest edge set (u, v, w).
    """
    from .relational import (_join_partitions, hash_aggregate,
                             preagg_extreme, shuffle_join)

    import ray.data as rd

    out_schema = pa.schema([("u", pa.string()), ("v", pa.string()),
                            ("w", pa.int64())])
    und, _deg, nparts = _und_graph(edges, src, dst)
    if und.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    we_schema = pa.schema([("u", pa.string()), ("v", pa.string()),
                           ("w", pa.int64()), ("ekey", pa.string())])

    def weigh(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["w"] = _md5_weight(df["u"], df["v"]).astype("int64")
        df["ekey"] = df["u"].str.cat(df["v"], sep="|")
        return pa.Table.from_pandas(df, preserve_index=False)

    we = _repaired(und.map_batches(weigh, batch_format="pyarrow"),
                   we_schema)

    lab_schema = pa.schema([("x", pa.string()), ("c", pa.string())])

    def init_labels(batch: pa.Table) -> pa.Table:
        x = pa.concat_arrays([
            batch.column("u").combine_chunks().cast(pa.string()),
            batch.column("v").combine_chunks().cast(pa.string())])
        return pa.table({"x": x, "c": x})

    labels = _repaired(
        hash_aggregate(
            und.map_batches(init_labels, batch_format="pyarrow"),
            ["x"], lambda df: df.drop_duplicates()),
        lab_schema)

    forest: list = []
    cross_schema = pa.schema([("u", pa.string()), ("v", pa.string()),
                              ("w", pa.int64()), ("ekey", pa.string()),
                              ("cu", pa.string()), ("cv", pa.string())])

    for _ in range(iters):
        ju = shuffle_join(we, labels, on="u", right_on="x",
                          num_partitions=nparts)
        ju = _repaired(
            ju.map_batches(
                lambda b: b.rename_columns(
                    ["u", "v", "w", "ekey", "cu"]),
                batch_format="pyarrow"),
            pa.schema(list(zip(
                ["u", "v", "w", "ekey", "cu"],
                [pa.string(), pa.string(), pa.int64(), pa.string(),
                 pa.string()]))))
        jv = shuffle_join(ju, labels, on="v", right_on="x",
                          num_partitions=nparts)

        def keep_cross(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = b.rename_columns(["u", "v", "w", "ekey", "cu", "cv"])
            return t.filter(pc.invert(pc.equal(t.column("cu"),
                                               t.column("cv"))))

        cross = _repaired(
            jv.map_batches(keep_cross, batch_format="pyarrow"),
            cross_schema)
        if cross.count() == 0:
            break

        def orient(batch: pa.Table) -> pa.Table:
            t1 = batch.append_column(
                "comp", batch.column("cu").combine_chunks())
            t2 = batch.append_column(
                "comp", batch.column("cv").combine_chunks())
            return pa.concat_tables([t1, t2])

        cand = _repaired(
            cross.map_batches(orient, batch_format="pyarrow"),
            cross_schema.append(pa.field("comp", pa.string())))

        def pick_min(df: pd.DataFrame) -> pd.DataFrame:
            k = (df["w"].astype("int64").astype(str).str.zfill(6)
                 .str.cat(df["ekey"], sep="|"))
            df = df.assign(__k=k)
            out = df.loc[df.groupby("comp")["__k"].idxmin()]
            return out.drop(columns="__k")

        picked = _repaired(
            hash_aggregate(cand, ["comp"], pick_min),
            cross_schema.append(pa.field("comp", pa.string())))

        chosen = _repaired(
            hash_aggregate(
                picked.select_columns(
                    ["u", "v", "w", "ekey", "cu", "cv"]),
                ["ekey"], lambda df: df.drop_duplicates("ekey")),
            cross_schema)
        forest.append(chosen.select_columns(["u", "v", "w", "ekey"]))

        # contraction: min-label propagation over the picked component
        # graph — self-loops keep untouched components fixed
        ca_schema = pa.schema([("a", pa.string()), ("b", pa.string())])

        def comp_arcs(batch: pa.Table) -> pa.Table:
            cu = batch.column("cu").combine_chunks().cast(pa.string())
            cv = batch.column("cv").combine_chunks().cast(pa.string())
            return pa.table({"a": pa.concat_arrays([cu, cv]),
                             "b": pa.concat_arrays([cv, cu])})

        def self_arcs(batch: pa.Table) -> pa.Table:
            c = batch.column("c").combine_chunks().cast(pa.string())
            return pa.table({"a": c, "b": c})

        ca = _repaired(
            hash_aggregate(
                chosen.map_batches(comp_arcs, batch_format="pyarrow")
                .union(labels.map_batches(self_arcs,
                                          batch_format="pyarrow")),
                ["a", "b"], lambda df: df.drop_duplicates()),
            ca_schema)

        # one-hop min-parent p0(c) = min(c, picked neighbors), then
        # ``inner`` pointer-jumping rounds p <- p∘p: reach doubles per
        # round, so chains up to 2^inner components collapse — the
        # contraction converges exponentially instead of one hop/round
        cmap_schema = pa.schema([("comp", pa.string()),
                                 ("nc", pa.string())])
        cmap = _repaired(
            preagg_extreme(
                ca.map_batches(
                    lambda b: pa.table({"comp": b.column("b"),
                                        "nc": b.column("a")}),
                    batch_format="pyarrow"),
                ["comp"], "nc", how="min"),
            cmap_schema)
        for _j in range(inner):
            rhs = _repaired(
                cmap.map_batches(
                    lambda b: b.rename_columns(["comp2", "nc2"]),
                    batch_format="pyarrow"),
                pa.schema([("comp2", pa.string()),
                           ("nc2", pa.string())]))
            step = shuffle_join(cmap, rhs, on="nc", right_on="comp2",
                                num_partitions=nparts)
            cmap = _repaired(
                step.map_batches(
                    lambda b: pa.table({"comp": b.column("comp"),
                                        "nc": b.column("nc2")}),
                    batch_format="pyarrow"),
                cmap_schema)

        relab = shuffle_join(labels, cmap, on="c", right_on="comp",
                             num_partitions=nparts)
        labels = _repaired(
            relab.map_batches(
                lambda b: pa.table({"x": b.column("x"),
                                    "c": b.column("nc")}),
                batch_format="pyarrow"),
            lab_schema).materialize()  # per-round pin (CC lesson)

    if not forest:
        return rd.from_arrow(out_schema.empty_table())
    out = forest[0]
    for f in forest[1:]:
        out = out.union(f)
    # a not-yet-contracted component pair can re-pick the same edge in
    # a later round — the forest is the DISTINCT picked edge set
    out = _repaired(
        hash_aggregate(out, ["ekey"],
                       lambda df: df.drop_duplicates("ekey")),
        pa.schema([("u", pa.string()), ("v", pa.string()),
                   ("w", pa.int64()), ("ekey", pa.string())]))
    return _repaired(out.select_columns(["u", "v", "w"]), out_schema)


def node2vec_walks(edges, n_seeds: int = 5, hops: int = 3,
                   src: str = "_from", dst: str = "_to"):
    """Deterministic node2vec-style biased walks over the undirected
    simple graph — the walk-corpus generator for skip-gram graph
    embeddings (Grover & Leskovec), with the stochastic choice replaced
    by the repo's md5-rank discipline so the corpus is bit-identical
    at any parallelism and SQL-replayable.

    Bias classes mirror node2vec's p/q preferences (p, q > 1) as a
    PRIORITY rather than a probability: from state (prev, cur) each
    neighbor x of cur is classed '0' when (prev, x) is an edge (the
    weight-1 dist-1 step), '1' otherwise (the 1/q explore), '2' when
    x == prev (the 1/p return — last resort), and the next hop is the
    minimum of
    ``class || md5(seed|step|x) || x`` — within a class the md5 is the
    deterministic coin. Step 1 has no prev: pure md5 rank.

    Seeds are the ``n_seeds`` top-degree vertices (ties → smallest
    id). Per step: one arcs⋈state join (edge-sized), one pair-key
    existence left join, one per-seed argmin — no driver state beyond
    the seed list. Returns (seed, step, vertex) for step 0..hops.
    """
    from .relational import (_join_partitions, hash_aggregate,
                             shuffle_join)

    import hashlib

    import ray.data as rd

    out_schema = pa.schema([("seed", pa.string()),
                            ("step", pa.int64()),
                            ("vertex", pa.string())])
    und, deg, nparts = _und_graph(edges, src, dst)
    if und.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    def both_dirs(batch: pa.Table) -> pa.Table:
        u = batch.column("u").combine_chunks().cast(pa.string())
        v = batch.column("v").combine_chunks().cast(pa.string())
        return pa.table({"a": pa.concat_arrays([u, v]),
                         "b": pa.concat_arrays([v, u])})

    arcs = _repaired(und.map_batches(both_dirs, batch_format="pyarrow"),
                     pa.schema([("a", pa.string()), ("b", pa.string())]))
    def arc_keys(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.table({"pk": pa.array(
            df["a"].str.cat(df["b"], sep="|"), pa.string())})

    akeys = _repaired(arcs.map_batches(arc_keys, batch_format="pyarrow"),
                      pa.schema([("pk", pa.string())]))

    seeds = deg.sort(["deg", "vtx"], descending=[True, False]) \
        .limit(n_seeds).to_pandas()["vtx"].tolist()

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    # state rows (seed, prev, cur); walks accumulate output Datasets
    state_schema = pa.schema([("seed", pa.string()),
                              ("prev", pa.string()),
                              ("cur", pa.string())])
    walks = [rd.from_arrow(pa.table({
        "seed": pa.array(seeds, pa.string()),
        "step": pa.array([0] * len(seeds), pa.int64()),
        "vertex": pa.array(seeds, pa.string())}))]
    state = rd.from_arrow(pa.table({
        "seed": pa.array(seeds, pa.string()),
        "prev": pa.array([""] * len(seeds), pa.string()),
        "cur": pa.array(seeds, pa.string())}))

    for step in range(1, hops + 1):
        cand = shuffle_join(state, arcs, on="cur", right_on="a",
                            num_partitions=nparts)
        cand = _repaired(
            cand.map_batches(
                lambda b: b.rename_columns(
                    ["seed", "prev", "cur", "x"]),
                batch_format="pyarrow"),
            pa.schema([("seed", pa.string()), ("prev", pa.string()),
                       ("cur", pa.string()), ("x", pa.string())]))
        if cand.count() == 0:
            break

        def with_pk(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["pk"] = df["prev"].str.cat(df["x"], sep="|")
            return pa.Table.from_pandas(df, preserve_index=False)

        cand = _repaired(
            cand.map_batches(with_pk, batch_format="pyarrow"),
            pa.schema([("seed", pa.string()), ("prev", pa.string()),
                       ("cur", pa.string()), ("x", pa.string()),
                       ("pk", pa.string())]))
        # class by edge-set membership: semi join keeps the class-0
        # candidates, anti join the complement
        matched = _repaired(
            shuffle_join(cand, akeys, on="pk", right_on="pk",
                         how="left_semi", num_partitions=nparts),
            pa.schema([("seed", pa.string()), ("prev", pa.string()),
                       ("cur", pa.string()), ("x", pa.string()),
                       ("pk", pa.string())]))
        unmatched = _repaired(
            shuffle_join(cand, akeys, on="pk", right_on="pk",
                         how="left_anti", num_partitions=nparts),
            pa.schema([("seed", pa.string()), ("prev", pa.string()),
                       ("cur", pa.string()), ("x", pa.string()),
                       ("pk", pa.string())]))

        def keyed(base_cls: str):
            def fn(batch: pa.Table) -> pa.Table:
                df = batch.to_pandas()
                is_ret = df["x"] == df["prev"]
                cls = np.where(is_ret, "2", base_cls)
                h = [md5(f"{s}|{step}|{x}")
                     for s, x in zip(df["seed"], df["x"])]
                df["k"] = pd.Series(cls, index=df.index).str.cat(
                    [pd.Series(h, index=df.index), df["x"]], sep="")
                return pa.Table.from_pandas(
                    df[["seed", "cur", "x", "k"]],
                    preserve_index=False)
            return fn

        key_schema = pa.schema([("seed", pa.string()),
                                ("cur", pa.string()),
                                ("x", pa.string()),
                                ("k", pa.string())])
        km = _repaired(matched.map_batches(keyed("0"),
                                           batch_format="pyarrow"),
                       key_schema)
        ku = _repaired(unmatched.map_batches(keyed("1"),
                                             batch_format="pyarrow"),
                       key_schema)
        allk = _repaired(km.union(ku), key_schema)

        def pick(df: pd.DataFrame) -> pd.DataFrame:
            out = df.loc[df.groupby("seed")["k"].idxmin()]
            return out[["seed", "cur", "x"]]

        nxt = _repaired(
            hash_aggregate(allk, ["seed"], pick),
            pa.schema([("seed", pa.string()), ("cur", pa.string()),
                       ("x", pa.string())]))
        walks.append(_repaired(
            nxt.map_batches(
                lambda b, st=step: pa.table({
                    "seed": b.column("seed"),
                    "step": pa.array([st] * b.num_rows, pa.int64()),
                    "vertex": b.column("x")}),
                batch_format="pyarrow"),
            out_schema))
        state = _repaired(
            nxt.map_batches(
                lambda b: pa.table({"seed": b.column("seed"),
                                    "prev": b.column("cur"),
                                    "cur": b.column("x")}),
                batch_format="pyarrow"),
            state_schema)

    out = walks[0]
    for w in walks[1:]:
        out = out.union(w)
    return _repaired(out, out_schema)


def bipartite_projection(ds, left_col: str, right_col: str,
                         max_right_degree: int = 20,
                         min_shared: int = 2):
    """One-mode projection of a bipartite relation — the standard
    graph-construction step for co-occurrence networks (users sharing
    contexts, docs sharing entities): left nodes u, v become an edge
    weighted by how many right nodes they share.

    The scale hazard is the hub right-node: a context shared by k left
    nodes emits k·(k-1)/2 pairs, so one 10^6-degree hub is 5·10^11
    rows. The projection therefore HARD-CAPS right degree at
    ``max_right_degree`` (hubs carry little co-occurrence signal —
    the same rationale as the LSH bucket caps) and reports what it
    dropped via the returned dataset being accompanied by the capped
    contract in this docstring; pair fan-out is then bounded by
    cap²/2 per right node.

    Dataflow: pair-hash distinct (l, r) → per-r degree (combiner) →
    degree-filter semi join → per-r vectorized pair expansion inside
    the r-keyed buckets → (u, v) combiner count → ``min_shared``
    filter. Returns (u, v, n_shared) with u < v.
    """
    from .relational import hash_aggregate, preagg_sum, shuffle_join, \
        _join_partitions

    import ray.data as rd

    out_schema = pa.schema([("u", pa.string()), ("v", pa.string()),
                            ("n_shared", pa.int64())])

    def lr(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            pd.DataFrame({"l": df[left_col].astype(str),
                          "r": df[right_col].astype(str)})
            .drop_duplicates(), preserve_index=False)

    pairs = _repaired(
        hash_aggregate(ds.map_batches(lr, batch_format="pyarrow"),
                       ["l", "r"], lambda df: df.drop_duplicates()),
        pa.schema([("l", pa.string()), ("r", pa.string())]))
    if pairs.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    deg = _repaired(
        preagg_sum(pairs.select_columns(["r"]), ["r"], {},
                   counts="d"),
        pa.schema([("r", pa.string()), ("d", pa.int64())]))

    def keep_small(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.less_equal(batch.column("d"),
                                       max_right_degree))
        return t.select(["r"])

    small = _repaired(
        deg.map_batches(keep_small, batch_format="pyarrow"),
        pa.schema([("r", pa.string())]))
    if small.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    kept = _repaired(
        shuffle_join(pairs, small, on="r", right_on="r",
                     how="left_semi",
                     num_partitions=_join_partitions(pairs.count())),
        pa.schema([("l", pa.string()), ("r", pa.string())]))

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in df.groupby("r", sort=False):
            ls = np.sort(grp["l"].to_numpy())
            if len(ls) < 2:
                continue
            iu, ju = np.triu_indices(len(ls), k=1)
            outs.append(pd.DataFrame({"u": ls[iu], "v": ls[ju]}))
        if not outs:
            return pd.DataFrame({"u": pd.Series([], dtype="object"),
                                 "v": pd.Series([], dtype="object")})
        return pd.concat(outs, ignore_index=True)

    expanded = _repaired(
        hash_aggregate(kept, ["r"], expand),
        pa.schema([("u", pa.string()), ("v", pa.string())]))
    if expanded.count() == 0:
        return rd.from_arrow(out_schema.empty_table())
    counted = _repaired(
        preagg_sum(expanded, ["u", "v"], {}, counts="n_shared"),
        out_schema)

    def thresh(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch.column("n_shared"),
                                             min_shared))

    return _repaired(counted.map_batches(thresh, batch_format="pyarrow"),
                     out_schema)


def cascade_spread(edges, n_seeds: int = 3, p_pct: int = 40,
                   rounds: int = 3, src: str = "_from",
                   dst: str = "_to"):
    """Independent-cascade diffusion (the evaluation kernel of
    influence maximization, Kempe–Kleinberg–Tardos): seeds activate at
    round 0; each round, every arc u→v from a newly-activated u fires
    with "probability" p — here the deterministic md5 coin
    ``md5int15(u|v|round) % 100 < p_pct`` — and untouched targets
    activate next round. Fixed ``rounds`` then stop.

    Per round: one arcs⋈frontier shuffle join (edge-sized), a
    vectorized coin filter, a pair-hash distinct, and one left_anti
    join against the activated set (the distributed NOT EXISTS).
    Activation state stays a Dataset. Returns (vertex, round) —
    the activation wave with its arrival times.
    """
    import hashlib

    from .relational import _join_partitions, hash_aggregate, \
        shuffle_join

    import ray.data as rd

    out_schema = pa.schema([("vertex", pa.string()),
                            ("round", pa.int64())])
    pairs = distinct_pairs(edges, src, dst)
    if pairs.count() == 0:
        return rd.from_arrow(out_schema.empty_table())
    nparts = _join_partitions(pairs.count())

    from .relational import preagg_sum

    deg = _repaired(
        preagg_sum(pairs.select_columns([src]), [src], {}, counts="d"),
        pa.schema([(src, pa.string()), ("d", pa.int64())]))
    seeds = deg.sort(["d", src], descending=[True, False]) \
        .limit(n_seeds).to_pandas()[src].tolist()

    act_schema = pa.schema([("vertex", pa.string()),
                            ("round", pa.int64())])
    active = rd.from_arrow(pa.table({
        "vertex": pa.array(seeds, pa.string()),
        "round": pa.array([0] * len(seeds), pa.int64())}))
    frontier = active

    for r in range(1, rounds + 1):
        j = shuffle_join(pairs, frontier.select_columns(["vertex"]),
                         on=src, right_on="vertex",
                         num_partitions=nparts)
        j = _repaired(j, pa.schema([(src, pa.string()),
                                    (dst, pa.string())]))
        if j.count() == 0:
            break

        def coin(batch: pa.Table, rr=r) -> pa.Table:
            df = batch.to_pandas()
            key = df[src].str.cat(df[dst], sep="|") + f"|{rr}"
            h = key.map(lambda s: int(hashlib.md5(s.encode())
                                      .hexdigest()[:15], 16) % 100)
            keep = (h < p_pct).to_numpy()
            return pa.table({"vertex": pa.array(
                df[dst][keep], pa.string())})

        hit = _repaired(
            hash_aggregate(
                j.map_batches(coin, batch_format="pyarrow"),
                ["vertex"], lambda df: df.drop_duplicates()),
            pa.schema([("vertex", pa.string())]))
        if hit.count() == 0:
            break
        fresh = _repaired(
            shuffle_join(hit, active.select_columns(["vertex"]),
                         on="vertex", right_on="vertex",
                         how="left_anti", num_partitions=nparts),
            pa.schema([("vertex", pa.string())]))
        if fresh.count() == 0:
            break
        frontier = _repaired(
            fresh.map_batches(
                lambda b, rr=r: pa.table({
                    "vertex": b.column("vertex"),
                    "round": pa.array([rr] * b.num_rows, pa.int64())}),
                batch_format="pyarrow"),
            act_schema)
        active = _repaired(active.union(frontier), act_schema)

    return active


def personalized_pagerank(edges, n_seeds: int = 4, iters: int = 3,
                          alpha_den: int = 5, src: str = "_from",
                          dst: str = "_to"):
    """Personalized PageRank (random walk with restart) from the
    ``n_seeds`` highest-out-degree vertices (ties -> smallest id) —
    the seed-relative relevance score entity-linking and
    recommendation layers compute over an exported graph, vs the
    global :func:`pagerank`.

    Exact integer spec (the SQL oracle unrolls it bit-for-bit):

    * restart vector ``r(v) = 10^6 // n_seeds`` on seeds, else 0
    * ``x0 = r``
    * per iteration: per-arc spread ``x(u) // deg_out(u)`` (BIGINT
      floor), ``S(v) = Σ spread``, then
      ``x'(v) = r(v) + S(v)·(alpha_den−1) // alpha_den``
      (restart probability α = 1/alpha_den).

    Exchange shape per round: ONE edge-sized shuffle join (arcs pick
    up their source's score; out-degrees are joined onto the arc
    table ONCE before the loop) + a dst-keyed combiner preagg + a
    vertex-sized union realign — identical to :func:`katz_centrality`
    plus the degree normalization. Driver state is the n_seeds id
    list; scores stay a Dataset end to end.
    """
    from ray.data.aggregate import Sum

    from .relational import _join_partitions, preagg_sum, shuffle_join

    import ray.data as rd

    E6 = 10**6
    out_schema = pa.schema([("vertex", pa.string()),
                            ("ppr_e6", pa.int64())])
    pairs = distinct_pairs(edges, src, dst)
    if pairs.count() == 0:
        return rd.from_arrow(out_schema.empty_table())
    nparts = _join_partitions(pairs.count())

    deg = _repaired(
        preagg_sum(pairs.select_columns([src]), [src], {}, counts="d"),
        pa.schema([(src, pa.string()), ("d", pa.int64())]))
    top = deg.sort(["d", src], descending=[True, False]).take(n_seeds)
    seeds = {r[src] for r in top}
    r_seed = E6 // n_seeds

    arcs = _repaired(
        shuffle_join(pairs, deg.rename_columns({src: "__du"}),
                     on=src, right_on="__du", num_partitions=nparts),
        pa.schema([(src, pa.string()), (dst, pa.string()),
                   ("d", pa.int64())]))

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table({"vertex": pa.concat_arrays([
            batch.column(src).combine_chunks().cast(pa.string()),
            batch.column(dst).combine_chunks().cast(pa.string()),
        ])})

    from .relational import hash_aggregate

    vs = _repaired(
        hash_aggregate(
            pairs.map_batches(endpoints, batch_format="pyarrow")
            .map_batches(lambda b: pa.Table.from_pandas(
                b.to_pandas().drop_duplicates(), preserve_index=False),
                batch_format="pyarrow"),
            ["vertex"], lambda df: df.drop_duplicates()),
        pa.schema([("vertex", pa.string())]))

    def restart(batch: pa.Table) -> pa.Table:
        v = batch.column("vertex").to_pandas()
        return pa.table({
            "vertex": batch.column("vertex"),
            "ppr_e6": pa.array(
                np.where(v.isin(list(seeds)), r_seed, 0)
                .astype("int64")),
        })

    ranks = _repaired(vs.map_batches(restart, batch_format="pyarrow"),
                      out_schema)

    for _ in range(iters):
        j = _repaired(
            shuffle_join(arcs, ranks, on=src, right_on="vertex",
                         num_partitions=nparts),
            pa.schema([(src, pa.string()), (dst, pa.string()),
                       ("d", pa.int64()), ("ppr_e6", pa.int64())]))

        def edge_msgs(batch: pa.Table) -> pa.Table:
            x = batch.column("ppr_e6").to_numpy(zero_copy_only=False)
            d = batch.column("d").to_numpy(zero_copy_only=False)
            return pa.table({"__v": batch.column(dst),
                             "s": pa.array(x // d, pa.int64())})

        def zero_msgs(batch: pa.Table) -> pa.Table:
            return pa.table({"__v": batch.column("vertex"),
                             "s": pa.array([0] * batch.num_rows,
                                           pa.int64())})

        def msg_partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            g = df.groupby("__v", as_index=False)["s"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        merged = _repaired(
            j.map_batches(edge_msgs, batch_format="pyarrow")
            .union(vs.map_batches(zero_msgs, batch_format="pyarrow"))
            .map_batches(msg_partial, batch_format="pyarrow")
            .groupby("__v").aggregate(Sum("s", alias_name="s")),
            pa.schema([("__v", pa.string()), ("s", pa.int64())]))

        def apply_x(batch: pa.Table) -> pa.Table:
            v = batch.column("__v").to_pandas()
            s = batch.column("s").to_numpy(zero_copy_only=False)
            x = np.where(v.isin(list(seeds)), r_seed, 0).astype("int64") \
                + (s * (alpha_den - 1)) // alpha_den
            return pa.table({"vertex": batch.column("__v"),
                             "ppr_e6": pa.array(x, pa.int64())})

        ranks = _repaired(
            merged.map_batches(apply_x, batch_format="pyarrow"),
            out_schema).materialize()  # per-round pin (CC lesson)
    return ranks


def greedy_coloring(edges, iters: int = 3,
                    src: str = "_from", dst: str = "_to"):
    """Jones–Plassmann greedy graph coloring (Jones & Plassmann 1993):
    the parallel scheduling/register-allocation primitive — per round,
    every uncolored vertex whose deterministic priority ``md5(x)||x``
    is strictly below all UNCOLORED neighbors' (or that has none)
    picks the smallest color unused by its already-COLORED neighbors
    (the mex, spelled as ``min({0} ∪ {c+1: c used}) ∖ used`` so the
    SQL oracle replays it literally). Winners stay; only they leave
    the uncolored set — unlike :func:`maximal_independent_set`, where
    winners evict their neighborhood.

    ``iters`` fixed rounds: any prefix yields a PARTIAL proper
    coloring (adjacent colored vertices always differ); vertices still
    uncolored after the last round are absent from the output —
    callers needing totality raise ``iters`` (O(log n / log log n)
    rounds suffice w.h.p. on bounded-degree graphs).

    Scale shape per round (same exchange budget as a MIS round plus
    one): an arc-sized shuffle join for the uncolored-neighbor
    minimum, a bucketed select-resolve, TWO joins fanning winners'
    colored-neighbor colors in, one bucketed vectorized mex (sorted
    first-gap scan — no per-vertex Python), and a bucketed
    set-difference. Colored/uncolored sets stay vertex-sized Datasets;
    the driver holds only round counts.
    """
    import hashlib

    import pyarrow.compute as pc

    from .relational import (_join_partitions, hash_aggregate,
                             preagg_extreme, shuffle_join)
    import ray.data as rd

    pairs = distinct_pairs(edges, src, dst)
    base_schema = pa.schema([("u", pa.string()), ("v", pa.string())])

    def undirect(batch: pa.Table) -> pa.Table:
        u, v = batch.column(src), batch.column(dst)
        return pa.table({
            "u": pa.chunked_array([u, v, u, v]),
            "v": pa.chunked_array([v, u, u, v]),
        })

    base = _repaired(
        hash_aggregate(
            pairs.map_batches(undirect, batch_format="pyarrow")
            .map_batches(lambda b: pa.Table.from_pandas(
                b.to_pandas().drop_duplicates(), preserve_index=False),
                batch_format="pyarrow"),
            ["u", "v"], lambda df: df.drop_duplicates()),
        base_schema)
    nparts = _join_partitions(base.count())

    arcs = _repaired(
        base.map_batches(
            lambda b: b.filter(pc.invert(pc.equal(b.column("u"),
                                                  b.column("v")))),
            batch_format="pyarrow"),
        base_schema)

    vx_schema = pa.schema([("x", pa.string())])
    unc = _repaired(
        base.map_batches(
            lambda b: pa.table({"x": b.filter(
                pc.equal(b.column("u"), b.column("v"))).column("u")}),
            batch_format="pyarrow"),
        vx_schema)

    if arcs.count() == 0:
        # only self-loops (non-edges by spec): every vertex is
        # isolated and takes color 0 — also dodges the all-empty
        # join-side schema loss
        return unc.map_batches(
            lambda b: pa.table({
                "vertex": b.column("x"),
                "color": pa.array([0] * b.num_rows, pa.int64())}),
            batch_format="pyarrow")

    def prio(col: pa.ChunkedArray) -> pa.Array:
        s = col.to_pandas()
        h = {t: hashlib.md5(t.encode("utf-8")).hexdigest() + t
             for t in s.unique()}
        return pa.array(s.map(h), pa.string())

    col_schema = pa.schema([("x", pa.string()), ("color", pa.int64())])
    cand_schema = pa.schema([("x", pa.string()), ("kind", pa.int64()),
                             ("val", pa.string())])
    mexc_schema = pa.schema([("x", pa.string()), ("kind", pa.int64()),
                             ("c", pa.int64())])
    upd_schema = pa.schema([("x", pa.string()), ("f", pa.int64())])
    live_schema = pa.schema([("u", pa.string()), ("v", pa.string())])

    colored = rd.from_arrow(col_schema.empty_table())

    for _ in range(iters):
        if unc.count() == 0:
            break
        live = _repaired(
            shuffle_join(arcs, unc, on="v", right_on="x",
                         num_partitions=nparts),
            live_schema)
        nm = preagg_extreme(
            live.map_batches(
                lambda b: pa.table({"u": b.column("u"),
                                    "pv": prio(b.column("v"))}),
                batch_format="pyarrow"),
            ["u"], "pv", how="min", out="m")

        cand = _repaired(
            unc.map_batches(
                lambda b: pa.table({
                    "x": b.column("x"),
                    "kind": pa.array([0] * b.num_rows, pa.int64()),
                    "val": prio(b.column("x"))}),
                batch_format="pyarrow"),
            cand_schema).union(_repaired(
                nm.map_batches(
                    lambda b: pa.table({
                        "x": b.column("u"),
                        "kind": pa.array([1] * b.num_rows, pa.int64()),
                        "val": b.column("m")}),
                    batch_format="pyarrow"),
                cand_schema))

        def resolve(df):
            p = df[df["kind"] == 0]
            m = df[df["kind"] == 1].groupby("x")["val"].min()
            got = p.merge(m.rename("m"), how="left",
                          left_on="x", right_index=True)
            keep = got["m"].isna() | (got["val"] < got["m"])
            return got.loc[keep, ["x"]]

        sel = _repaired(hash_aggregate(cand, ["x"], resolve),
                        vx_schema)

        used_schema = pa.schema([("u", pa.string()),
                                 ("v", pa.string()),
                                 ("c", pa.int64())])
        if colored.count() == 0:
            # round 1: no colored neighbors anywhere — an all-empty
            # join side loses its schema, so short-circuit
            used = rd.from_arrow(used_schema.empty_table())
        else:
            wins = _repaired(
                shuffle_join(arcs, sel, on="u", right_on="x",
                             num_partitions=nparts),
                live_schema)
            used = _repaired(
                shuffle_join(
                    wins, colored.rename_columns(
                        {"x": "__cx", "color": "c"}).materialize(),
                    on="v", right_on="__cx", num_partitions=nparts),
                used_schema)

        mexc = _repaired(
            sel.map_batches(
                lambda b: pa.table({
                    "x": b.column("x"),
                    "kind": pa.array([0] * b.num_rows, pa.int64()),
                    "c": pa.array([-1] * b.num_rows, pa.int64())}),
                batch_format="pyarrow"),
            mexc_schema).union(_repaired(
                used.map_batches(
                    lambda b: pa.table({
                        "x": b.column("u"),
                        "kind": pa.array([1] * b.num_rows, pa.int64()),
                        "c": b.column("c")}),
                    batch_format="pyarrow"),
                mexc_schema))

        def mex(df):
            # smallest color in {0} ∪ {c+1} not used — vectorized
            # sorted first-gap scan per winner
            w = df.loc[df["kind"] == 0, ["x"]].drop_duplicates()
            u = df[df["kind"] == 1][["x", "c"]].drop_duplicates() \
                .sort_values(["x", "c"], kind="mergesort") \
                .reset_index(drop=True)
            if len(u):
                rank = u.groupby("x", sort=False).cumcount()
                first_gap = u.loc[u["c"] != rank] \
                    .assign(r=rank[u["c"] != rank]) \
                    .groupby("x")["r"].first()
                full = u.groupby("x")["c"].size()
                mx = first_gap.reindex(full.index)
                mx = mx.fillna(full).astype("int64")
            else:
                mx = pd.Series(dtype="int64")
            out = w.merge(mx.rename("color"), how="left",
                          left_on="x", right_index=True)
            out["color"] = out["color"].fillna(0).astype("int64")
            return out[["x", "color"]]

        newly = _repaired(hash_aggregate(mexc, ["x"], mex),
                          col_schema)
        colored = _repaired(colored.union(newly), col_schema)

        upd = (_repaired(
            unc.map_batches(
                lambda b: pa.table({
                    "x": b.column("x"),
                    "f": pa.array([0] * b.num_rows, pa.int64())}),
                batch_format="pyarrow"),
            upd_schema)
            .union(_repaired(
                sel.map_batches(
                    lambda b: pa.table({
                        "x": b.column("x"),
                        "f": pa.array([1] * b.num_rows, pa.int64())}),
                    batch_format="pyarrow"),
                upd_schema)))

        def survive(df):
            g = df.groupby("x", as_index=False)["f"].max()
            return g.loc[g["f"] == 0, ["x"]]

        unc = _repaired(hash_aggregate(upd, ["x"], survive),
                        vx_schema).materialize()
        colored = colored.materialize()  # per-round pins (CC lesson)

    return colored.map_batches(
        lambda b: b.rename_columns(["vertex", "color"]),
        batch_format="pyarrow")
