"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship KG-construction pipeline on sf0.001.
``queries()`` — one callable per implemented operator/pipeline
(SURVEY.md §2 + training-data ops); each takes ``sf_dir`` and returns a
Dataset / pandas DataFrame / pyarrow Table.
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query
(column names match exactly; aggregates are defined with deterministic
arithmetic — integer cents for money sums, floor-at-4dp ratios, exact-us
session gaps — so the value hashes are reproducible bit-for-bit).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import math
import os
import tempfile
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# process-local scratch (pid-keyed: never reuses stale artifacts from a
# previous code version)
_TMP = os.path.join(tempfile.gettempdir(), f"raygraph_entry_{os.getpid()}")
_CACHE: dict = {}

_OFFSET = 100_000  # id offset for the doubled-corpus dedup demos


def _docs_count(sf_dir: str) -> int:
    return pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows


def _corpus_dir(sf_dir: str) -> str:
    """Deterministic interleaved corpus sized from the sf documents table
    (input_hint shape). Cached per process."""
    from raygraph import synth

    n = _docs_count(sf_dir)
    key = ("corpus", n)
    if key not in _CACHE:
        path = os.path.join(_TMP, f"corpus_n{n}")
        if not os.path.isdir(path):
            synth.write_corpus(path, n)
        _CACHE[key] = path
    return _CACHE[key]


def _kg_result(sf_dir: str):
    """Run the full KG build once per (process, corpus size)."""
    from raygraph import synth
    from raygraph.config import GraphBuildConfig
    from raygraph.pipeline import build_graph

    n = _docs_count(sf_dir)
    key = ("kg", n)
    if key not in _CACHE:
        cfg = GraphBuildConfig(
            input_path=_corpus_dir(sf_dir),
            output_path=os.path.join(_TMP, f"kg_n{n}"),
            num_partitions=8,
            linker_concurrency=(1, 4),
        )
        _CACHE[key] = build_graph(
            cfg, aliases=synth.alias_inventory(synth.entity_space(n))
        )
    return _CACHE[key]


def _kg_delta_result(sf_dir: str):
    """Incremental build: base graph from the first half of the corpus,
    then :func:`raygraph.pipeline.merge_delta` over the held-out half —
    phase A runs only on the delta; phase B re-aggregates the triple
    log. Must equal the one-shot full build (shared oracle)."""
    from raygraph import synth
    from raygraph.config import GraphBuildConfig
    from raygraph.pipeline import build_graph, merge_delta

    n = _docs_count(sf_dir)
    key = ("kg_delta", n)
    if key not in _CACHE:
        corpus = pq.ParquetDataset(_corpus_dir(sf_dir)).read()
        half = corpus.num_rows // 2
        base_dir = os.path.join(_TMP, f"corpus_base_n{n}")
        delta_dir = os.path.join(_TMP, f"corpus_delta_n{n}")
        for d, t in ((base_dir, corpus.slice(0, half)),
                     (delta_dir, corpus.slice(half))):
            os.makedirs(d, exist_ok=True)
            pq.write_table(t, os.path.join(d, "docs.parquet"))
        cfg = GraphBuildConfig(
            input_path=base_dir,
            output_path=os.path.join(_TMP, f"kg_delta_n{n}"),
            num_partitions=8,
            linker_concurrency=(1, 4),
        )
        aliases = synth.alias_inventory(synth.entity_space(n))
        base = build_graph(cfg, aliases=aliases)
        # keep the base snapshot's edge table: merge_delta rebuilds the
        # derived tables in place, and kg_snapshot_diff audits what the
        # delta added (new vs old edge set)
        import shutil

        base_edges = os.path.join(_TMP, f"kg_delta_n{n}", "edges_base")
        shutil.rmtree(base_edges, ignore_errors=True)
        shutil.copytree(base.edges_path, base_edges)
        _CACHE[("kg_delta_base_edges", n)] = base_edges
        _CACHE[key] = merge_delta(cfg, delta_dir, aliases=aliases)
    return _CACHE[key]


def _export_db(sf_dir: str) -> str:
    """Exporter 'database' derived from the sf customer/orders tables."""
    key = ("exportdb", sf_dir)
    if key not in _CACHE:
        path = os.path.join(_TMP, "exportdb", os.path.basename(sf_dir.rstrip("/")))
        os.makedirs(path, exist_ok=True)
        cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"))
        ck = cust.column("c_custkey").to_pylist()
        pq.write_table(
            pa.table(
                {
                    "_id": [f"customer/{k}" for k in ck],
                    "_key": [str(k) for k in ck],
                    "c_name": cust.column("c_name"),
                    "c_acctbal": cust.column("c_acctbal"),
                }
            ),
            os.path.join(path, "customer.parquet"),
        )
        orders = pq.read_table(os.path.join(sf_dir, "orders.parquet"))
        ok = orders.column("o_orderkey").to_pylist()
        oc = orders.column("o_custkey").to_pylist()
        pq.write_table(
            pa.table(
                {
                    "_id": [f"orders_rel/{k}" for k in ok],
                    "_key": [str(k) for k in ok],
                    "_from": [f"customer/{c}" for c in oc],
                    "_to": [f"orders/{k}" for k in ok],
                    "o_totalprice": orders.column("o_totalprice"),
                }
            ),
            os.path.join(path, "orders_rel.parquet"),
        )
        _CACHE[key] = path
    return _CACHE[key]


def _docs_ds(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=list(columns))


def _doubled_docs(sf_dir: str):
    """documents ∪ (documents with doc_id+OFFSET) — a corpus that is 50%
    exact duplicates, for the dedup demos."""
    import ray.data as rd

    ds = _docs_ds(sf_dir)

    def shift(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.set_column(
            batch.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(batch.column("doc_id"), _OFFSET),
        )

    return ds.union(_docs_ds(sf_dir).map_batches(shift, batch_format="pyarrow"))


# =========================================================== entry
def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: full KG construction
    (extract → link → canonicalize → materialize); returns the edge table."""
    import ray.data as rd

    res = _kg_result("/root/testdata/sf0.001")
    return rd.read_parquet(res.edges_path)


# ========================================================= queries
def queries() -> dict[str, Callable[[str], Any]]:
    from raygraph.config import CollectionInfo, DataLoadConfig
    from raygraph.exporter import load_custom_graph
    from raygraph.ops import dedup as D
    from raygraph.ops import events as E
    from raygraph.ops import text as T
    from raygraph.ops.ann import brute_force_topk
    from raygraph.ops.media import decode_features, documents_as_media
    from raygraph.ops.relational import broadcast_join, preagg_sum

    import pyarrow.compute as pc
    import ray.data as rd

    # ---- KG construction ------------------------------------------------
    def kg_edges(sf_dir):
        res = _kg_result(sf_dir)
        t = pq.ParquetDataset(res.edges_path).read()
        return t.select(["_from", "pred", "_to"])

    def kg_delta_edges(sf_dir):
        # incremental-maintenance surface: base build + merge_delta of
        # the held-out half must reproduce the full-build edge table
        # exactly — the oracle is SHARED with kg_edges (the sharing IS
        # the correctness claim)
        res = _kg_delta_result(sf_dir)
        t = pq.ParquetDataset(res.edges_path).read()
        return t.select(["_from", "pred", "_to"])

    def kg_snapshot_diff(sf_dir):
        # lineage audit after a delta merge: per-predicate count of
        # edges the delta ADDED — one hash-partitioned left_anti join
        # on the full (from, pred, to) key (distributed NOT EXISTS),
        # then a pred-keyed combiner preagg
        from raygraph.ops.graph import edge_diff_counts

        res = _kg_delta_result(sf_dir)
        n = _docs_count(sf_dir)
        base_edges = _CACHE[("kg_delta_base_edges", n)]
        new = rd.read_parquet(res.edges_path,
                              columns=["_from", "pred", "_to"])
        old = rd.read_parquet(base_edges,
                              columns=["_from", "pred", "_to"])
        return edge_diff_counts(new, old)

    def kg_asof_base(sf_dir):
        # time-travel read: recompute the graph AS OF epoch 0 (the base
        # build) from the manifest-pruned triples checkpoint alone — no
        # corpus scan; the oracle is the independent base-half edge
        # formula (kg_base_edges_sql), so append-only epochs provably
        # preserve history
        from raygraph.config import GraphBuildConfig
        from raygraph.pipeline import graph_asof

        _kg_delta_result(sf_dir)  # ensure base+delta checkpoint exists
        n = _docs_count(sf_dir)
        cfg = GraphBuildConfig(
            input_path=os.path.join(_TMP, f"corpus_base_n{n}"),
            output_path=os.path.join(_TMP, f"kg_delta_n{n}"),
            num_partitions=8,
        )
        _, edges = graph_asof(cfg, epoch=0)
        return edges.select_columns(["_from", "pred", "_to"])

    def kg_forget_edges(sf_dir):
        # right-to-be-forgotten propagation: drop every triple whose
        # provenance doc has i % 5 == 1 from the checkpointed triple
        # log (broadcast is_in filter — the left_anti Dataset path
        # covers web-scale delete sets) and rebuild phase B; no corpus
        # scan. Oracle = the edge formula over the surviving docs.
        from raygraph.config import GraphBuildConfig
        from raygraph.pipeline import graph_forget

        _kg_result(sf_dir)  # ensure the checkpoint exists
        n = _docs_count(sf_dir)
        cfg = GraphBuildConfig(
            input_path=_corpus_dir(sf_dir),
            output_path=os.path.join(_TMP, f"kg_n{n}"),
            num_partitions=8,
        )
        gone = [f"doc/{i}" for i in range(n) if i % 5 == 1]
        _, edges = graph_forget(cfg, deleted_doc_ids=gone)
        return edges.select_columns(["_from", "pred", "_to"])

    def kg_vertices(sf_dir):
        res = _kg_result(sf_dir)
        t = pq.ParquetDataset(res.vertices_path).read()
        return t.select(["_id", "_key", "@collection_name"])

    def kg_vertex_mentions(sf_dir):
        # exercises the vertex aggregation path end-to-end: per-entity
        # mention counts must reproduce the generator's arithmetic
        res = _kg_result(sf_dir)
        t = pq.ParquetDataset(res.vertices_path).read()
        return t.select(["_key", "mention_count"])

    def kg_two_hop(sf_dir):
        # multi-hop reach over the built graph: one self shuffle-join of
        # the deduped arc set on the middle vertex + exact distinct count
        from raygraph.ops.graph import two_hop_counts

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return two_hop_counts(ed)

    def kg_pagerank(sf_dir):
        # fixed-point integer PageRank (3 iterations, damping .85) —
        # rank state stays a Dataset; the integer spec makes the result
        # bit-identical at any parallelism and SQL-reproducible
        from raygraph.ops.graph import pagerank

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return pagerank(ed, iters=3)

    def kg_components(sf_dir):
        # label propagation (5 fixed rounds): min vertex id reachable
        # within 5 undirected hops — true components when the diameter
        # fits, SQL-reproducible either way
        from raygraph.ops.graph import connected_components

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return connected_components(ed, iters=5)

    def kg_scc(sf_dir):
        # directed SCC coloring pass: forward + backward min-label
        # propagation (5 rounds each), resolved where in-min == out-min
        from raygraph.ops.graph import scc_coloring

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return scc_coloring(ed, iters=5)

    def kg_adamic_adar(sf_dir):
        # degree-discounted link prediction: common neighbors weighted
        # floor(1e6/ln(deg)) per apex (per-term-floor discipline), hubs
        # count less; top-20 non-adjacent pairs
        from raygraph.ops.graph import adamic_adar_topk

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return adamic_adar_topk(ed, k=20)

    def kg_pred_cardinality(sf_dir):
        # KG schema induction: per predicate the max subject out-fan and
        # object in-fan, classified 1:1 / 1:N / N:1 / N:M — two
        # combiner preaggs + per-pred max, all predicate-sized
        from raygraph.ops.relational import hash_aggregate

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path,
                             columns=["_from", "pred", "_to"])

        def distinct_arcs(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas().drop_duplicates()
            return pa.Table.from_pandas(df, preserve_index=False)

        arcs = hash_aggregate(ed.map_batches(distinct_arcs,
                                             batch_format="pyarrow"),
                              ["_from", "pred", "_to"],
                              lambda df: df.drop_duplicates())
        outf = preagg_sum(arcs, ["pred", "_from"], {}, counts="n")
        inf_ = preagg_sum(arcs, ["pred", "_to"], {}, counts="n")

        mo = hash_aggregate(
            outf, ["pred"],
            lambda df: df.groupby("pred", sort=False)["n"].max()
            .reset_index(name="max_out")).to_pandas()
        mi = hash_aggregate(
            inf_, ["pred"],
            lambda df: df.groupby("pred", sort=False)["n"].max()
            .reset_index(name="max_in")).to_pandas()
        m = mo.merge(mi, on="pred")
        m["card_class"] = np.where(
            m["max_out"] == 1,
            np.where(m["max_in"] == 1, "1:1", "N:1"),
            np.where(m["max_in"] == 1, "1:N", "N:M"))
        for c in ("max_out", "max_in"):
            m[c] = m[c].astype("int64")
        return m.sort_values("pred").reset_index(drop=True)

    def kg_rich_club(sf_dir):
        # rich-club coefficient at the degree p90: density among
        # top-degree vertices — two left_semi joins keep the rich edge
        # set distributed; only four scalars reach the driver
        from raygraph.ops.graph import _repaired, _und_graph
        from raygraph.ops.relational import (grouped_quantiles,
                                             shuffle_join)

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        und, deg, nparts = _und_graph(ed)

        def lit(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__g", pa.array(np.zeros(batch.num_rows, dtype="int64")))

        q = grouped_quantiles(deg.map_batches(lit,
                                              batch_format="pyarrow"),
                              ["__g"], "deg", qs=(0.9,)).to_pandas()
        k = int(q["p90"].iloc[0])

        rich = _repaired(
            deg.map_batches(
                lambda b, _k=k: b.filter(
                    pc.greater_equal(b.column("deg"), _k))
                .select(["vtx"]),
                batch_format="pyarrow"),
            pa.schema([("vtx", pa.string())]))
        n_rich = rich.count()
        both = shuffle_join(und, rich, on="u", right_on="vtx",
                            how="left_semi", num_partitions=nparts)
        both = _repaired(both, pa.schema([("u", pa.string()),
                                          ("v", pa.string())]))
        m_rich = 0
        if both.count():
            both2 = shuffle_join(both, rich, on="v", right_on="vtx",
                                 how="left_semi",
                                 num_partitions=nparts)
            m_rich = both2.count()
        possible = n_rich * (n_rich - 1) // 2
        phi = (10_000 * m_rich) // possible if possible else 0
        return pd.DataFrame({
            "k_threshold": pd.array([k], dtype="int64"),
            "n_rich": pd.array([n_rich], dtype="int64"),
            "m_rich": pd.array([m_rich], dtype="int64"),
            "phi_bp": pd.array([phi], dtype="int64"),
        })

    def kg_degree_gini(sf_dir):
        # degree inequality (hub concentration): exact-integer Gini via
        # the sorted-rank identity over the undirected degree table
        # (vertex-sized aggregate finalized in Python ints — the
        # supplier_gini discipline)
        from raygraph.ops.graph import _und_graph

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        _, deg, _ = _und_graph(ed)
        d = deg.to_pandas().sort_values(["deg", "vtx"]) \
            .reset_index(drop=True)
        n = len(d)
        xs = [int(v) for v in d["deg"]]
        sx = sum(xs)
        six = sum((i + 1) * x for i, x in enumerate(xs))
        gini_bp = (10_000 * (2 * six - (n + 1) * sx)) // (n * sx)
        return pd.DataFrame({
            "n_vertices": pd.array([n], dtype="int64"),
            "gini_bp": pd.array([int(gini_bp)], dtype="int64"),
        })

    def kg_lineage(sf_dir):
        # lineage audit: the per-partition checkpoint manifests' summed
        # triple counts must reproduce the corpus formula exactly — the
        # north-rule "per-partition lineage + metrics" surface made
        # oracle-checkable (partition membership itself is an
        # engine-side hash; the TOTALS are the invariant)
        import glob as _glob
        import json as _json

        res = _kg_result(sf_dir)
        mans = sorted(_glob.glob(os.path.join(
            res.triples_path, "_manifest", "part-*.json")))
        triples = 0
        for m in mans:
            with open(m) as fh:
                triples += int(_json.load(fh)["rows"])
        return pd.DataFrame({
            "n_partitions": pd.array([len(mans)], dtype="int64"),
            "triples_total": pd.array([triples], dtype="int64"),
        })

    def kg_triangles(sf_dir):
        # exact triangle count via degree-ordered orientation (max
        # wedge fan-out O(sqrt(m)) even on hubs); only the scalar
        # reaches the driver
        from raygraph.ops.graph import triangle_count

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return triangle_count(ed)

    def kg_squares(sf_dir):
        # exact 4-cycle count: common-neighbor pair counts (shared
        # wedge plan with linkpred) -> per-batch partial sum of C(w,2)
        # -> tree-summed scalar / 2; only one row reaches the driver
        from raygraph.ops.graph import four_cycles

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return four_cycles(ed)

    def kg_bfs(sf_dir):
        # directed BFS hop distance from the max-out-degree vertex
        # (ties → smallest id; 3 synchronous rounds, exact within 3
        # hops): per round ONE edge-sized shuffle join + min-combine;
        # only the source id is driver state, distances stay a Dataset
        from raygraph.ops.graph import bfs_distance, distinct_pairs

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        deg = preagg_sum(distinct_pairs(ed).select_columns(["_from"]),
                         ["_from"], {}, counts="d")
        top = deg.sort(["d", "_from"], descending=[True, False]).take(1)
        return bfs_distance(ed, source=top[0]["_from"], iters=3)

    def kg_ego(sf_dir):
        # ego network: the INDUCED subgraph on the 2-hop BFS ball of
        # the kg_bfs pivot — reach set from the existing BFS op, then
        # two distributed semi-joins keep arcs with BOTH endpoints
        # inside the ball (pure composition, no new primitive)
        from raygraph.ops.graph import (_repaired, bfs_distance,
                                        distinct_pairs)
        from raygraph.ops.relational import shuffle_join

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        deg = preagg_sum(distinct_pairs(ed).select_columns(["_from"]),
                         ["_from"], {}, counts="d")
        top = deg.sort(["d", "_from"], descending=[True, False]).take(1)
        reach = bfs_distance(ed, source=top[0]["_from"], iters=2) \
            .select_columns(["vertex"]).materialize()
        pr_schema = pa.schema([("_from", pa.string()),
                               ("_to", pa.string())])
        pairs = distinct_pairs(ed)
        a1 = _repaired(
            shuffle_join(pairs, reach, on="_from", right_on="vertex",
                         how="left_semi"),
            pr_schema)
        return _repaired(
            shuffle_join(a1, reach, on="_to", right_on="vertex",
                         how="left_semi"),
            pr_schema)

    def kg_path_counts(sf_dir):
        # Brandes forward phase: hop distance + exact shortest-path
        # counts sigma from the kg_bfs pivot (3 synchronous rounds)
        from raygraph.ops.graph import bfs_path_counts, distinct_pairs

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        deg = preagg_sum(distinct_pairs(ed).select_columns(["_from"]),
                         ["_from"], {}, counts="d")
        top = deg.sort(["d", "_from"], descending=[True, False]).take(1)
        return bfs_path_counts(ed, source=top[0]["_from"], iters=3)

    def lineitem_weighted_median(sf_dir):
        # weighted percentile_disc: smallest price whose cumulative
        # QUANTITY reaches half the group total — value-count shuffle
        # carries (flag, price, weight), one bucketed cumulative pass
        from raygraph.ops.relational import hash_aggregate

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_returnflag", "l_extendedprice", "l_quantity"])

        def narrow(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            return pa.Table.from_pandas(pd.DataFrame({
                "l_returnflag": df["l_returnflag"],
                "pc": np.round(df["l_extendedprice"].to_numpy()
                               * 100).astype("int64"),
                "q": np.trunc(df["l_quantity"].to_numpy())
                .astype("int64"),
            }), preserve_index=False)

        g = preagg_sum(li.map_batches(narrow, batch_format="pyarrow"),
                       ["l_returnflag", "pc"], {"w": "q"})

        def pick(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["l_returnflag", "pc"], kind="mergesort")
            grp = df.groupby("l_returnflag", sort=False)
            cum = grp["w"].cumsum()
            tot = grp["w"].transform("sum")
            hit = df.loc[2 * cum >= tot]
            out = hit.groupby("l_returnflag", sort=False)["pc"].min() \
                .reset_index(name="wmedian_cents")
            out["wmedian_cents"] = out["wmedian_cents"].astype("int64")
            return out

        return hash_aggregate(g, ["l_returnflag"], pick)

    def kg_kcore(sf_dir):
        # k-core peel (k=2, 3 fixed rounds) over the undirected simple
        # graph: per round two left-semi shuffle joins restrict arcs to
        # live endpoints + one vectorized degree count; the alive set
        # stays a Dataset, nothing graph-sized reaches the driver
        from raygraph.ops.graph import kcore

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return kcore(ed, k=2, iters=3)

    def kg_hits(sf_dir):
        # HITS authorities (2 rounds, exact-integer ceil-div rescale):
        # per half-round one edge-sized shuffle join + vertex-sized
        # combiner sum; the only driver state is the per-round max
        from raygraph.ops.graph import hits_authorities

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return hits_authorities(ed, iters=2)

    def kg_sssp(sf_dir):
        # Bellman–Ford weighted SSSP (3 rounds) from the same
        # max-out-degree source as kg_bfs, edge weight = predicate
        # string length (deterministic, varied): parallel edges
        # min-collapse in a combiner, then per round one edge-sized
        # shuffle join + min-combine
        import pyarrow.compute as pc

        from raygraph.ops.graph import distinct_pairs, sssp_distance

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path,
                             columns=["_from", "pred", "_to"])

        def with_w(batch: pa.Table) -> pa.Table:
            return pa.table({
                "_from": batch.column("_from"),
                "_to": batch.column("_to"),
                "w": pc.cast(pc.utf8_length(batch.column("pred")),
                             pa.int64()),
            })

        deg = preagg_sum(distinct_pairs(ed).select_columns(["_from"]),
                         ["_from"], {}, counts="d")
        top = deg.sort(["d", "_from"], descending=[True, False]).take(1)
        return sssp_distance(ed.map_batches(with_w,
                                            batch_format="pyarrow"),
                             source=top[0]["_from"], iters=3)

    def kg_closeness(sf_dir):
        # closeness + harmonic centrality for the 8 top-out-degree
        # seeds: multi-source BFS (3 hops) with a monotone frontier —
        # labels hold only reached (source, vertex) pairs, one
        # edge-sized shuffle join + min-combine per round; driver state
        # is the 8 seed ids
        from raygraph.ops.graph import closeness_centrality

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return closeness_centrality(ed, n_seeds=8, iters=3)

    def kg_eccentricity(sf_dir):
        # sampled diameter diagnostic: truncated eccentricity (max BFS
        # distance in 3 hops) + reached count for the 8 top-out-degree
        # seeds — same monotone-frontier BFS exchange as kg_closeness,
        # folded to n_seeds rows by one hash-bucketed groupby
        from raygraph.ops.graph import eccentricity_profile

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return eccentricity_profile(ed, n_seeds=8, iters=3)

    def kg_communities(sf_dir):
        # label-propagation community detection (2 synchronous rounds,
        # vote = mode of neighbor+self labels, ties -> smallest label
        # via a zfill(999999999-count)||label composite min): one
        # edge-sized shuffle join + count + argmax per round, community
        # sizes out — nothing graph-sized on the driver
        from raygraph.ops.graph import label_propagation

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return label_propagation(ed, iters=2)

    def kg_mis(sf_dir):
        # Luby-style maximal independent set (2 deterministic rounds,
        # priority = md5(v)||v): per round one arc-sized join for
        # undecided-neighbor min priorities, a bucketed select-resolve,
        # a winner-sized removal fan-out and a bucketed set-difference;
        # undecided/winner sets stay vertex-sized Datasets
        from raygraph.ops.graph import maximal_independent_set

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return maximal_independent_set(ed, iters=2)

    def kg_matching(sf_dir):
        # deterministic maximal matching (2 locally-minimal-edge
        # rounds, priority = md5(u|v)||u|v): per round a vertex-keyed
        # min-combine over a map-side endpoint explode, a 2-endpoint-
        # wins sum per edge, and a bucketed set-difference — all
        # arc-sized exchanges, the edge-side dual of kg_mis
        from raygraph.ops.graph import maximal_matching

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return maximal_matching(ed, iters=2)

    def kg_khop_sample(sf_dir):
        # GraphSAGE-style neighborhood sampling: 5 top-degree roots ×
        # 2 hops × fanout 3 through the md5-ranked successor table —
        # one ranked-adjacency aggregate + one frontier join per hop;
        # the GNN-training subgraph primitive
        from raygraph.ops.graph import khop_sample

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return khop_sample(ed, n_seeds=5, fanout=3, hops=2)

    def kg_betweenness(sf_dir):
        # sampled hop-bounded Brandes betweenness: sigma BFS from 3
        # pivot sources + the backward dependency sweep in the exact
        # per-term floored-integer spec — arc-sized joins per level,
        # nothing graph-sized on the driver
        from raygraph.ops.graph import betweenness_sampled

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return betweenness_sampled(ed, n_seeds=3, hops=3)

    def kg_rpq(sf_dir):
        # regular-path query (SPARQL property path connected_to/is_a):
        # endpoint pairs + exact path counts, one junction-keyed join
        # per predicate step with a combiner after each
        from raygraph.ops.graph import rpq_pairs

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path,
                             columns=["_from", "pred", "_to"])
        return rpq_pairs(ed, ["connected_to", "is_a"])

    def kg_ppr(sf_dir):
        # personalized PageRank (3 rounds) from the max-out-degree
        # source: restart + dangling mass return to the source — the
        # proximity/recommendation variant of kg_pagerank, same
        # one-join-per-iteration dataflow and integer exactness
        from raygraph.ops.graph import distinct_pairs, pagerank

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        deg = preagg_sum(distinct_pairs(ed).select_columns(["_from"]),
                         ["_from"], {}, counts="d")
        top = deg.sort(["d", "_from"], descending=[True, False]).take(1)
        return pagerank(ed, iters=3, personalize=top[0]["_from"])

    def kg_katz(sf_dir):
        # Katz centrality (3 rounds, beta = 1/5): attenuated-path
        # counting in fixed-point e6 integers — the walk-counting
        # cousin of kg_pagerank without degree normalization; one
        # edge-sized shuffle join per round
        from raygraph.ops.graph import katz_centrality

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return katz_centrality(ed, iters=3, beta_den=5)

    def kg_modularity(sf_dir):
        # Newman modularity of the LPA partition: per-community
        # intra-edge and degree-sum preaggs over the canonical
        # undirected graph, two label-keyed joins, exact e6 floor
        # terms — turns kg_communities into a MEASURED clustering
        from raygraph.ops.graph import label_propagation, modularity

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        members = label_propagation(ed, iters=2, return_members=True)
        return modularity(ed, members)

    def kg_coloring(sf_dir):
        # Jones-Plassmann greedy coloring (3 rounds): md5-priority
        # winners against uncolored neighbors pick the mex of their
        # colored neighborhood — parallel scheduling primitive; one
        # MIS-shaped exchange per round plus two color-fanning joins
        from raygraph.ops.graph import greedy_coloring

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return greedy_coloring(ed, iters=3)

    def kg_conductance(sf_dir):
        # conductance of each LPA community: cut = d_sum - 2*e_in off
        # the modularity table (no extra exchange), phi_e6 =
        # (1e6*cut) // min(vol, 2m - vol) — the complementary
        # partition-quality metric to kg_modularity (low phi = good
        # cluster, high modularity = good partition)
        from raygraph.ops.graph import (_und_graph, label_propagation,
                                        modularity)

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        und, _, _ = _und_graph(ed)
        m = und.count()
        members = label_propagation(ed, iters=2, return_members=True)
        mod = modularity(ed, members)

        def phi(batch: pa.Table) -> pa.Table:
            e = batch.column("e_in").to_numpy(zero_copy_only=False)
            d = batch.column("d_sum").to_numpy(zero_copy_only=False)
            cut = d - 2 * e
            denom = np.maximum(np.minimum(d, 2 * m - d), 1)
            return pa.table({
                "community": batch.column("community"),
                "cut": pa.array(cut.astype("int64")),
                "phi_e6": pa.array(
                    ((1_000_000 * cut) // denom).astype("int64")),
            })

        return mod.map_batches(phi, batch_format="pyarrow")

    def kg_rwr(sf_dir):
        # random walk with restart from the seed SET (alpha=1/5,
        # 3 rounds, 4 top-out-degree seeds): seed-relative
        # relevance over the built graph — one edge-sized shuffle join
        # per round, out-degrees joined onto arcs once before the loop
        from raygraph.ops.graph import personalized_pagerank

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return personalized_pagerank(ed, n_seeds=4, iters=3,
                                     alpha_den=5)

    def kg_wl(sf_dir):
        # Weisfeiler–Lehman color refinement (2 rounds): structural-
        # role fingerprinting of the built graph — md5-bridged
        # neighbor-multiset hashing, final color-class histogram
        from raygraph.ops.graph import wl_colors

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return wl_colors(ed, iters=2)

    def kg_vertex_cover(sf_dir):
        # 2-approximate minimum vertex cover (Gavril): the endpoints
        # of a maximal matching cover every edge at <= 2x optimum —
        # a pure composition over the matching rounds, one endpoint
        # distinct
        from raygraph.ops.graph import maximal_matching
        from raygraph.ops.relational import hash_aggregate
        from raygraph.ops.graph import _repaired

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        m = maximal_matching(ed, iters=2)

        def endpoints(batch: pa.Table) -> pa.Table:
            u = batch.column("u").combine_chunks().cast(pa.string())
            v = batch.column("v").combine_chunks().cast(pa.string())
            return pa.table({"vertex": pa.concat_arrays([u, v])})

        return _repaired(
            hash_aggregate(
                m.map_batches(endpoints, batch_format="pyarrow"),
                ["vertex"], lambda df: df.drop_duplicates()),
            pa.schema([("vertex", pa.string())]))

    def kg_skipgram_pairs(sf_dir):
        # skip-gram training pairs from the node2vec walk corpus
        # (window 2): the (center, context) pair table a word2vec-style
        # embedding trainer consumes — one walk self-join keyed on
        # (seed), rank distance 1..2, both directions
        from raygraph.ops.graph import node2vec_walks
        from raygraph.ops.relational import preagg_sum

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        walks = node2vec_walks(ed, n_seeds=5, hops=3)

        df = walks.to_pandas()  # seeds × (hops+1) rows — tiny by spec
        pairs = df.merge(df, on="seed", suffixes=("_a", "_b"))
        gap = (pairs["step_b"] - pairs["step_a"]).astype(int)
        pairs = pairs[(gap >= 1) & (gap <= 2)]
        out = pd.DataFrame({
            "center": pairs["vertex_a"],
            "context": pairs["vertex_b"],
        })
        out = pd.concat([out, out.rename(
            columns={"center": "context", "context": "center"})],
            ignore_index=True)
        g = out.value_counts(["center", "context"]).rename("n") \
            .reset_index()
        g["n"] = g["n"].astype("int64")
        return g.sort_values(["center", "context"]) \
            .reset_index(drop=True)

    def kg_frame_triples(sf_dir):
        # structure-driven verb-frame SVO (extract_mode=
        # "patterns+frames", ops/extract.py — the dependency-ish rule
        # family, VERDICT r2 Missing #3) over a richer id-derived
        # corpus rendered into the input_hint span schema: determiner
        # stripping, verb+preposition frames, object truncation at the
        # first preposition, plus a pattern-table sentence proving
        # priority inside the same mode. The oracle replays the id
        # arithmetic directly — extraction must recover it exactly.
        from raygraph.ops.extract import extract_triples

        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id"])

        def render(batch: pa.Table) -> pa.Table:
            i = batch.column("doc_id").to_numpy(zero_copy_only=False) \
                .astype("int64")
            s = pd.Series(i).astype(str)
            s1 = pd.Series(i + 1).astype(str)
            s2 = pd.Series(2 * i).astype(str)
            s7 = pd.Series(i + 7).astype(str)
            texts = np.select(
                [i % 5 == 0, i % 5 == 1, i % 5 == 2, i % 5 == 3],
                ["the acme corp " + s + " acquired initech " + s1
                 + " in 2001",
                 "alice " + s + " works at initech " + s2,
                 "bob " + s + " manages the carol team " + s7,
                 "vertex " + s + " is connected to vertex " + s1 + "."],
                default="nothing interesting here " + s)
            n = len(i)
            st = pa.StructArray.from_arrays(
                [pa.array(["text"] * n), pa.array(texts, pa.string()),
                 pa.array([""] * n),
                 pa.array(np.zeros(n, dtype="int32"), pa.int32())],
                names=["kind", "text", "media_ref", "offset"])
            spans = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype="int32"), pa.int32()), st)
            return pa.table({"doc_id": pa.array(s, pa.string()),
                             "spans": spans})

        return docs.map_batches(render, batch_format="pyarrow") \
            .map_batches(
                lambda b: extract_triples(b, mode="patterns+frames"),
                batch_format="pyarrow") \
            .select_columns(["doc_id", "subj_surface", "pred",
                             "obj_surface"])

    def kg_frame_edges(sf_dir):
        # the verb-frame family through the FULL pipeline (extract →
        # link → canonicalize → materialize): a frame-shaped corpus is
        # rendered once to /tmp (id-derived), build_graph runs with
        # extract_mode="patterns+frames" and an exact alias inventory,
        # and the emitted edge table must equal the oracle's replay of
        # the same id arithmetic
        from raygraph.config import GraphBuildConfig
        from raygraph.pipeline import build_graph
        from raygraph.schemas import DOCUMENT_SCHEMA

        n = _docs_count(sf_dir)
        m = max(2, min(n // 10, 1000))
        key = ("kg_frames", n)
        if key not in _CACHE:
            cdir = os.path.join(_TMP, f"frame_corpus_n{n}")
            done = os.path.join(cdir, "_done")
            if not os.path.exists(done):
                import shutil as _sh

                _sh.rmtree(cdir, ignore_errors=True)
                os.makedirs(cdir, exist_ok=True)
                i = np.arange(n, dtype="int64")
                a = pd.Series(i % m).astype(str)
                b = pd.Series((i * 7 + 1) % m).astype(str)
                texts = np.select(
                    [i % 3 == 0, i % 3 == 1],
                    ["the alpha team " + a + " acquired beta labs "
                     + b + " in 2001",
                     "alpha team " + a + " works at beta labs " + b],
                    default="noise sentence nothing here "
                    + pd.Series(i).astype(str))
                rows = [{"doc_id": f"f{k}",
                         "spans": [{"kind": "text", "text": t,
                                    "media_ref": "", "offset": 0}]}
                        for k, t in enumerate(texts)]
                pq.write_table(
                    pa.Table.from_pylist(rows, schema=DOCUMENT_SCHEMA),
                    os.path.join(cdir, "docs.parquet"))
                with open(done, "w") as f:
                    f.write("ok")
            aliases = {}
            for k in range(m):
                aliases[f"alpha team {k}"] = f"alpha_{k}"
                aliases[f"beta labs {k}"] = f"beta_{k}"
            cfg = GraphBuildConfig(
                input_path=cdir,
                output_path=os.path.join(_TMP, f"kg_frames_n{n}"),
                num_partitions=8,
                linker_concurrency=(1, 4),
                extract_mode="patterns+frames",
            )
            _CACHE[key] = build_graph(cfg, aliases=aliases)
        t = pq.ParquetDataset(_CACHE[key].edges_path).read()
        return t.select(["_from", "pred", "_to"])

    def kg_coref_edges(sf_dir):
        # coreference-lite through the FULL pipeline (extract_mode=
        # "patterns+coref", ops/extract._resolve_coref): docs carry an
        # anchored sentence plus a pronoun follow-up ("It is located in
        # …") whose subject must resolve to the document's preceding
        # extracted subject — recency-heuristic coref, batch-local by
        # the one-row-per-document span contract (zero exchange). Docs
        # i%7==0 DROP the anchor sentence, so their pronoun (when
        # present) has no antecedent and must be dropped, not linked.
        # The oracle replays the id arithmetic; resolution must recover
        # it exactly.
        from raygraph.config import GraphBuildConfig
        from raygraph.pipeline import build_graph
        from raygraph.schemas import DOCUMENT_SCHEMA

        n = _docs_count(sf_dir)
        m = max(2, min(n // 10, 1000))
        key = ("kg_coref", n)
        if key not in _CACHE:
            cdir = os.path.join(_TMP, f"coref_corpus_n{n}")
            done = os.path.join(cdir, "_done")
            if not os.path.exists(done):
                import shutil as _sh

                _sh.rmtree(cdir, ignore_errors=True)
                os.makedirs(cdir, exist_ok=True)
                i = np.arange(n, dtype="int64")
                a = i % m
                c = (i * 7 + 3) % m
                has_anchor = (i % 7) != 0
                has_pron = (i % 3) == 1
                rows = []
                for k in range(n):
                    spans = []
                    if has_anchor[k]:
                        spans.append({
                            "kind": "text",
                            "text": f"vertex {a[k]} is connected to "
                                    f"vertex {(a[k] + 1) % m}.",
                            "media_ref": "", "offset": 0})
                    if has_pron[k]:
                        spans.append({
                            "kind": "text",
                            "text": f"It is located in vertex {c[k]}.",
                            "media_ref": "",
                            "offset": len(spans)})
                    rows.append({"doc_id": f"c{k}", "spans": spans})
                pq.write_table(
                    pa.Table.from_pylist(rows, schema=DOCUMENT_SCHEMA),
                    os.path.join(cdir, "docs.parquet"))
                with open(done, "w") as f:
                    f.write("ok")
            aliases = {f"vertex {k}": f"vertex_{k}" for k in range(m)}
            cfg = GraphBuildConfig(
                input_path=cdir,
                output_path=os.path.join(_TMP, f"kg_coref_n{n}"),
                num_partitions=8,
                linker_concurrency=(1, 4),
                extract_mode="patterns+coref",
            )
            _CACHE[key] = build_graph(cfg, aliases=aliases)
        t = pq.ParquetDataset(_CACHE[key].edges_path).read()
        return t.select(["_from", "pred", "_to"])

    def kg_cascade(sf_dir):
        # independent-cascade diffusion (3 top-degree seeds, p = 40%,
        # 3 rounds, md5 coins): the influence-spread evaluation kernel
        # — per round one frontier join + coin filter + distributed
        # NOT EXISTS; returns the activation wave (vertex, round)
        from raygraph.ops.graph import cascade_spread

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return cascade_spread(ed, n_seeds=3, p_pct=40, rounds=3)

    def kg_node2vec(sf_dir):
        # deterministic node2vec-style biased walks (5 seeds, 3 hops):
        # the skip-gram walk corpus with md5-rank choices — class-0
        # dist-1 steps preferred, explore next, return last; one
        # edge-sized join + one pair-key membership join per hop
        from raygraph.ops.graph import node2vec_walks

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return node2vec_walks(ed, n_seeds=5, hops=3)

    def kg_msf(sf_dir):
        # Borůvka minimum spanning forest (2 hook rounds, 3-round
        # min-label contraction) with deterministic md5 weights — the
        # shuffle-native MST: per round an edge-sized join + a
        # component-sized argmin, forest edges (u, v, w)
        from raygraph.ops.graph import msf_boruvka

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return msf_boruvka(ed, iters=2, inner=3)

    def kg_reciprocity(sf_dir):
        # graph reciprocity: share (exact bp) of distinct non-loop arcs
        # whose reverse arc also exists — one distinct-intersect
        # exchange (per-batch dedup combiner), scalar finalize
        import pyarrow.compute as pc

        from raygraph.ops.graph import distinct_pairs
        from raygraph.ops.relational import set_op_distinct

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        pairs = distinct_pairs(ed).map_batches(
            lambda b: b.filter(pc.invert(pc.equal(b.column("_from"),
                                                  b.column("_to")))),
            batch_format="pyarrow").materialize()
        rev = pairs.map_batches(
            lambda b: pa.table({"_from": b.column("_to"),
                                "_to": b.column("_from")}),
            batch_format="pyarrow")
        n_arcs = pairs.count()
        n_recip = set_op_distinct(pairs, rev, ["_from", "_to"],
                                  op="intersect").count()
        return pd.DataFrame({
            "n_arcs": [n_arcs], "n_recip": [n_recip],
            "recip_bp": [(10_000 * n_recip) // n_arcs if n_arcs else 0],
        })

    def kg_clustering(sf_dir):
        # per-vertex local clustering coefficient (exact basis points):
        # shared degree-ordered triangle enumeration → 3-way vertex
        # fan-out → one vertex-sized left-outer join with the degrees
        from raygraph.ops.graph import clustering_coefficient

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return clustering_coefficient(ed)

    def kg_degrees(sf_dir):
        # graph-analytics surface over the built graph: per-vertex in/out
        # degree from the deduped edge table (distributed preagg counts;
        # the merge touches only the vertex-sized aggregate)
        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        o = preagg_sum(ed.select_columns(["_from"]), ["_from"], {},
                       counts="out_degree").to_pandas() \
            .rename(columns={"_from": "_id"})
        i = preagg_sum(ed.select_columns(["_to"]), ["_to"], {},
                       counts="in_degree").to_pandas() \
            .rename(columns={"_to": "_id"})
        df = o.merge(i, on="_id", how="outer")
        df["out_degree"] = df["out_degree"].fillna(0).astype("int64")
        df["in_degree"] = df["in_degree"].fillna(0).astype("int64")
        return df.sort_values("_id").reset_index(drop=True)

    # ---- exporter (GraphLoader parity surface) --------------------------
    def export_vertex_projection(sf_dir):
        loader = load_custom_graph(
            _export_db(sf_dir),
            [CollectionInfo("customer", ("c_name", "c_acctbal", "@collection_name"))],
            [],
        )
        return loader.vertex_dataset()

    def export_vertex_missing_field(sf_dir):
        loader = load_custom_graph(
            _export_db(sf_dir), [CollectionInfo("customer", ("c_name", "nickname"))], []
        )
        return loader.vertex_dataset()

    def export_edge_projection(sf_dir):
        loader = load_custom_graph(
            _export_db(sf_dir),
            [CollectionInfo("customer")],
            [CollectionInfo("orders_rel", ("o_totalprice", "@collection_name"))],
        )
        return loader.edge_dataset()

    def export_load_all_vertices(sf_dir):
        loader = load_custom_graph(
            _export_db(sf_dir),
            [CollectionInfo("customer")],
            [],
            config=DataLoadConfig(load_all_vertex_attributes=True),
        )
        return loader.vertex_dataset()

    # ---- dedup ----------------------------------------------------------
    def dedup_exact_documents(sf_dir):
        return D.exact_dedup(_doubled_docs(sf_dir))

    def dedup_sentences(sf_dir):
        # sub-document boilerplate profile: sentence-granularity exact
        # duplication per source — flat explode stays block-local, ONE
        # pair-hash exchange counts (source, sentence) occurrences,
        # per-source totals vs distinct close it; no joins
        return D.sentence_dedup_stats(
            _docs_ds(sf_dir, columns=("text", "source")))

    def dedup_minhash_survivors(sf_dir):
        # word shingles: char 5-grams saturate on this small-vocab corpus
        # (unrelated long docs reach Jaccard ~1); word 5-windows stay
        # discriminative, so only exact copies merge at threshold 0.99.
        # drop_strategy="distributed": the drop set stays a Dataset
        # (min-label components + anti-join) — nothing driver-sized,
        # the 100 TB route (VERDICT r2 #2)
        return D.minhash_dedup(_doubled_docs(sf_dir), threshold=0.99, bands=8,
                               shingle="word",
                               num_buckets=D.lsh_num_buckets(
                                   2 * _docs_count(sf_dir), 8),
                               drop_strategy="distributed")

    def dedup_survivors_broadcast(sf_dir):
        # same dedup via the driver union-find + broadcast is_in filter
        # (right while the verified-pair inventory fits the driver);
        # row-identical to the distributed path by contract, so the two
        # share one oracle
        return D.minhash_dedup(_doubled_docs(sf_dir), threshold=0.99, bands=8,
                               shingle="word",
                               num_buckets=D.lsh_num_buckets(
                                   2 * _docs_count(sf_dir), 8),
                               drop_strategy="broadcast")

    def dedup_survivors_auto(sf_dir):
        # the DEFAULT path (round 4): verified pairs counted
        # in-cluster, survivor filter routed broadcast-or-distributed
        # by the count — row-identical to both fixed strategies by
        # contract, so all three share one oracle. auto_max_pairs=0
        # forces the distributed branch through the auto router, so
        # this entry also pins the router's wiring, not just defaults
        return D.minhash_dedup(_doubled_docs(sf_dir), threshold=0.99, bands=8,
                               shingle="word",
                               num_buckets=D.lsh_num_buckets(
                                   2 * _docs_count(sf_dir), 8),
                               drop_strategy="auto", auto_max_pairs=0)


    def dedup_clusters(sf_dir):
        # duplicate-CLUSTER inventory over a TRIPLED corpus (components
        # of size 3 exercise pair transitivity): verified pairs → fully
        # distributed min-label components → per-doc cluster id;
        # word shingles + threshold 0.99 for the same discriminativity
        # reason as dedup_minhash_survivors above
        import ray.data as rd

        base = _docs_ds(sf_dir)

        def shift(k):
            def fn(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return batch.set_column(
                    batch.schema.get_field_index("doc_id"), "doc_id",
                    pc.add(batch.column("doc_id"), k * _OFFSET))

            return fn

        tripled = base.union(
            _docs_ds(sf_dir).map_batches(shift(1), batch_format="pyarrow"),
            _docs_ds(sf_dir).map_batches(shift(2), batch_format="pyarrow"),
        )
        return D.near_dup_clusters(tripled, threshold=0.99, bands=8,
                                   shingle="word", cc_iters=2,
                                   num_buckets=D.lsh_num_buckets(
                                       3 * _docs_count(sf_dir), 8))

    def dedup_simhash(sf_dir):
        # simhash-exact dedup over the doubled corpus: (min doc_id, group
        # size) per identical-signature group; the oracle groups by the
        # sorted token multiset (simhash is a deterministic function of it)
        return D.simhash_dedup_groups(_doubled_docs(sf_dir))

    def dedup_simhash_pairs(sf_dir):
        # hamming-≤3 simhash similarity join over docs ∪ exact copies ∪
        # one-token-appended copies: pigeonhole 4-band candidates, ONE
        # band exchange, in-task popcount verify; the oracle recomputes
        # the 60-bit signatures and replays the identical banding join
        import pyarrow.compute as pc

        docs = _docs_ds(sf_dir)

        def appended(batch: pa.Table) -> pa.Table:
            s = batch.column("text").to_pandas().fillna("")
            return pa.table({
                "doc_id": pc.add(batch.column("doc_id"), 2 * _OFFSET),
                "text": pa.array(s + " zq", pa.string()),
            })

        corpus = _doubled_docs(sf_dir).union(
            docs.map_batches(appended, batch_format="pyarrow"))
        return D.simhash_hamming_pairs(corpus, max_hamming=3, bands=4)

    def docs_with_deletes(sf_dir):
        # deletion vectors (merge-on-read): copy the documents table,
        # write positional delete sidecars for doc_id % 7 == 0 (data
        # files untouched), scan with the masking reader — the oracle
        # is the predicate applied at query time, so sidecar semantics
        # must equal a real delete exactly
        import shutil as _sh

        from raygraph.maintenance import delete_where, read_with_deletes

        n = _docs_count(sf_dir)
        tdir = os.path.join(_TMP, f"docs_deletes_n{n}")
        # sentinel written only after delete_where returns (same
        # interrupted-first-run hazard as docs_upsert: _deletes exists
        # before the sidecars are all committed)
        done = os.path.join(tdir, "_deletes_done")
        if not os.path.exists(done):
            _sh.rmtree(tdir, ignore_errors=True)
            os.makedirs(tdir, exist_ok=True)
            _sh.copy(os.path.join(sf_dir, "documents.parquet"),
                     os.path.join(tdir, "part-0.parquet"))
            delete_where(tdir, "doc_id", "mod_eq", "7:0")
            with open(done, "w") as f:
                f.write("ok")
        return read_with_deletes(
            tdir, columns=["doc_id", "n_chars"])

    def docs_upsert(sf_dir):
        # MERGE INTO (upsert): copy the documents table, upsert
        # id-derived updates (doc_id % 9 == 0 rewritten) plus brand-new
        # rows (offset copies of doc_id % 13 == 0) in one call — old
        # versions masked via deletion sidecars, updates land as one
        # committed file; the masking reader must equal the SQL
        # anti-join ∪ updates exactly
        import shutil as _sh

        from raygraph.maintenance import read_with_deletes, upsert_table

        n = _docs_count(sf_dir)
        tdir = os.path.join(_TMP, f"docs_upsert_n{n}")
        # cache sentinel is written only AFTER upsert_table returns:
        # upsert_table creates _deletes before the data-file commit, so
        # gating on _deletes would treat an interrupted first run as
        # complete and silently drop the upsert rows forever after
        done = os.path.join(tdir, "_upsert_done")
        if not os.path.exists(done):
            _sh.rmtree(tdir, ignore_errors=True)
            os.makedirs(tdir, exist_ok=True)
            _sh.copy(os.path.join(sf_dir, "documents.parquet"),
                     os.path.join(tdir, "part-0.parquet"))
            base = pq.read_table(os.path.join(sf_dir,
                                              "documents.parquet"))
            df = base.to_pandas()
            upd = df[df["doc_id"] % 9 == 0].copy()
            upd["text"] = "updated " + upd["doc_id"].astype(str)
            upd["n_chars"] = (upd["n_chars"] + 1000).astype("int64")
            ins = df[df["doc_id"] % 13 == 0].copy()
            ins["doc_id"] = (ins["doc_id"] + _OFFSET).astype("int64")
            ins["text"] = "inserted " + ins["doc_id"].astype(str)
            updates = rd.from_arrow(pa.Table.from_pandas(
                pd.concat([upd, ins], ignore_index=True),
                preserve_index=False))
            upsert_table(tdir, updates, "doc_id")
            with open(done, "w") as f:
                f.write("ok")
        return read_with_deletes(
            tdir, columns=["doc_id", "text", "lang", "source",
                           "n_chars"])

    def docs_exact_substrings(sf_dir):
        # ExactSubstr duplication profile (Lee et al. 2021 at 8-token
        # grain) over a partially-overlapping corpus: originals ∪
        # tail-extended copies of every doc_id % 3 == 0 — copies share
        # all original 8-grams (fully covered) plus a common tail;
        # distributed gram inventory → dup-gram semi join → coverage
        from raygraph.ops.dedup import duplicate_ngram_stats

        docs = _docs_ds(sf_dir)

        def copies(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df = df[df["doc_id"] % 3 == 0]
            return pa.table({
                "doc_id": pa.array(df["doc_id"] + _OFFSET, pa.int64()),
                "text": pa.array(
                    df["text"].fillna("")
                    + " shared tail marker alpha beta gamma delta "
                    "epsilon zeta eta theta", pa.string()),
            })

        corpus = docs.union(
            docs.map_batches(copies, batch_format="pyarrow"))
        return duplicate_ngram_stats(corpus, L=8)

    def docs_dedup_clean(sf_dir):
        # ExactSubstr REMOVAL over the same partially-overlapping
        # corpus as docs_exact_substrings: every covered token dropped,
        # cleaned text reassembled in position order; one doc-hash
        # co-group of corpus + hit starts
        from raygraph.ops.dedup import clean_duplicate_ngrams

        docs = _docs_ds(sf_dir)

        def copies(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df = df[df["doc_id"] % 3 == 0]
            return pa.table({
                "doc_id": pa.array(df["doc_id"] + _OFFSET, pa.int64()),
                "text": pa.array(
                    df["text"].fillna("")
                    + " shared tail marker alpha beta gamma delta "
                    "epsilon zeta eta theta", pa.string()),
            })

        corpus = docs.union(
            docs.map_batches(copies, batch_format="pyarrow"))
        return clean_duplicate_ngrams(corpus, L=8)

    def dedup_sn_pairs(sf_dir):
        # sorted-neighborhood blocking (window 3): candidate pairs
        # within a 3-row sliding window of the corpus sorted by the
        # lowercased 16-char text prefix — global rank via the
        # two-phase ordered prefix-sum (no global sort), then one
        # int-keyed join; the record-linkage complement of LSH
        from raygraph.ops.dedup import sorted_neighborhood_pairs

        docs = _docs_ds(sf_dir)

        def key(batch: pa.Table) -> pa.Table:
            s = batch.column("text").to_pandas().fillna("")
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "k": pa.array(s.str.slice(0, 16).str.lower(),
                              pa.string()),
            })

        return sorted_neighborhood_pairs(
            docs.map_batches(key, batch_format="pyarrow"), "k",
            id_col="doc_id", window=3)

    def dedup_er_scores(sf_dir):
        # Fellegi–Sunter-style record-linkage scoring over the
        # sorted-neighborhood candidates: two id-keyed joins pull both
        # sides' attributes, integer agreement weights (lang 40,
        # source 30, |len diff| <= 8 -> 20) sum to a match score —
        # blocking + field-agreement ER without a pairwise product
        from raygraph.ops.dedup import sorted_neighborhood_pairs
        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import _join_partitions, shuffle_join

        docs = _docs_ds(sf_dir,
                        columns=("doc_id", "text", "lang", "source",
                                 "n_chars"))

        def key(batch: pa.Table) -> pa.Table:
            s = batch.column("text").to_pandas().fillna("")
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "k": pa.array(s.str.slice(0, 16).str.lower(),
                              pa.string()),
            })

        pairs = sorted_neighborhood_pairs(
            docs.map_batches(key, batch_format="pyarrow"), "k",
            id_col="doc_id", window=3)

        attrs = _repaired(
            docs.map_batches(
                lambda b: b.select(["doc_id", "lang", "source",
                                    "n_chars"]),
                batch_format="pyarrow"),
            pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                       ("source", pa.string()),
                       ("n_chars", pa.int64())]))
        nparts = _join_partitions(pairs.count())

        ja = shuffle_join(pairs, attrs, on="id_a", right_on="doc_id",
                          num_partitions=nparts)
        ja = _repaired(
            ja.map_batches(
                lambda b: b.rename_columns(
                    ["id_a", "id_b", "gap", "lang_a", "source_a",
                     "len_a"]),
                batch_format="pyarrow"),
            pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                       ("gap", pa.int64()), ("lang_a", pa.string()),
                       ("source_a", pa.string()),
                       ("len_a", pa.int64())]))
        jb = shuffle_join(ja, attrs, on="id_b", right_on="doc_id",
                          num_partitions=nparts)

        def score(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df.columns = ["id_a", "id_b", "gap", "lang_a", "source_a",
                          "len_a", "lang_b", "source_b", "len_b"]
            sc = (40 * (df["lang_a"] == df["lang_b"]).astype("int64")
                  + 30 * (df["source_a"] == df["source_b"])
                  .astype("int64")
                  + 20 * ((df["len_a"] - df["len_b"]).abs() <= 8)
                  .astype("int64"))
            return pa.table({
                "id_a": pa.array(df["id_a"], pa.int64()),
                "id_b": pa.array(df["id_b"], pa.int64()),
                "score": pa.array(sc, pa.int64()),
            })

        return _repaired(
            jb.map_batches(score, batch_format="pyarrow"),
            pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                       ("score", pa.int64())]))

    def dedup_er_clusters(sf_dir):
        # entity-resolution end game: blocked pairs scoring >= 70
        # (lang AND source agree) close transitively into entity
        # clusters (distributed min-label components), reported as the
        # cluster-size histogram — blocking → scoring → clustering,
        # the full Fellegi–Sunter pipeline
        from raygraph.ops.graph import connected_components
        from raygraph.ops.relational import preagg_sum

        scores = dedup_er_scores(sf_dir)

        def strong(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = batch.filter(pc.greater_equal(batch.column("score"),
                                              70))
            df = t.to_pandas()
            return pa.table({
                "_from": pa.array(df["id_a"].astype(str), pa.string()),
                "_to": pa.array(df["id_b"].astype(str), pa.string()),
            })

        edges = scores.map_batches(strong, batch_format="pyarrow")
        comp = connected_components(edges, iters=5)

        def sizes(batch: pa.Table) -> pa.Table:
            return pa.table({"component": batch.column("component")})

        per = preagg_sum(
            comp.map_batches(sizes, batch_format="pyarrow"),
            ["component"], {}, counts="size")

        def just_size(batch: pa.Table) -> pa.Table:
            return pa.table({"size": batch.column("size")})

        return preagg_sum(
            per.map_batches(just_size, batch_format="pyarrow"),
            ["size"], {}, counts="n_clusters")

    def dedup_jaccard_pairs(sf_dir):
        # exact set-similarity threshold self-join (Jaccard ≥ 0.8) via
        # AllPairs prefix filtering over docs ∪ one-token-appended
        # copies: prefix rows under the (md5, token) global order, one
        # token-keyed exchange, in-cluster text-join verify — the
        # oracle replays the identical prefix filter and join in SQL
        import pyarrow.compute as pc

        docs = _docs_ds(sf_dir)

        def appended(batch: pa.Table) -> pa.Table:
            s = batch.column("text").to_pandas().fillna("")
            return pa.table({
                "doc_id": pc.add(batch.column("doc_id"), _OFFSET),
                "text": pa.array(s + " zq", pa.string()),
            })

        corpus = docs.union(
            docs.map_batches(appended, batch_format="pyarrow"))
        return D.jaccard_threshold_pairs(corpus, threshold_bp=8000)

    def dedup_edit_pairs(sf_dir):
        # banded edit-distance similarity join over a corpus where every
        # doc gets a tail-edited copy (last char → '~'): prefix-block
        # candidates + O(window·k) banded-DP verify, capped per block —
        # the oracle re-runs the same blocking with DuckDB levenshtein()
        def edit(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            s = batch.column("text").to_pandas().fillna("")
            return pa.table({
                "doc_id": pc.add(batch.column("doc_id"), _OFFSET),
                "text": pa.array(s.str.slice(0, -1) + "~", pa.string()),
            })

        ds = _docs_ds(sf_dir)
        aug = ds.union(_docs_ds(sf_dir).map_batches(
            edit, batch_format="pyarrow"))
        return D.edit_distance_pairs(aug, max_dist=2, prefix=16, window=64)

    def dedup_embedding_pairs(sf_dir):
        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])

        def shift(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.set_column(
                batch.schema.get_field_index("vec_id"),
                "vec_id",
                pc.add(batch.column("vec_id"), _OFFSET),
            )

        doubled = emb.union(
            rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["vec_id", "embedding"])
            .map_batches(shift, batch_format="pyarrow")
        )
        pairs = D.embedding_near_dup_pairs(doubled, threshold=0.9999)
        return pairs.drop_columns(["cosine"])

    # ---- text analysis --------------------------------------------------
    def text_token_count(sf_dir):
        return _docs_ds(sf_dir).map_batches(T.token_count, batch_format="pyarrow")

    def text_stats(sf_dir):
        return _docs_ds(sf_dir).map_batches(T.text_stats, batch_format="pyarrow")

    def text_quality(sf_dir):
        return _docs_ds(sf_dir).map_batches(T.quality_score, batch_format="pyarrow")

    def text_lang_id(sf_dir):
        return _docs_ds(sf_dir).map_batches(T.lang_id, batch_format="pyarrow")

    def text_fingerprints(sf_dir):
        return _docs_ds(sf_dir).map_batches(T.doc_fingerprint, batch_format="pyarrow")

    def docs_winnow(sf_dir):
        # winnowing fingerprints (SIGMOD 2003): guarantee-bearing local
        # fingerprint selection — any shared window+n-1-token run shares
        # a fingerprint; per-doc vectorized kernel, zero exchange
        return _docs_ds(sf_dir).map_batches(
            T.winnow_fingerprints, batch_format="pyarrow")

    def docs_lang_confusion(sf_dir):
        # classifier-eval confusion matrix: heuristic lang_id prediction
        # × gold label, counted in one corpus pass (per-batch partial
        # counts → one |langs|²-row merge)
        from raygraph.ops.relational import preagg_sum

        docs = _docs_ds(sf_dir, columns=("doc_id", "text", "lang"))

        def conf(batch: pa.Table) -> pa.Table:
            pred = T.lang_id(batch)
            df = pd.DataFrame({
                "lang": batch.column("lang").to_pandas(),
                "lang_pred": pred.column("lang_pred").to_pandas(),
            })
            g = df.groupby(["lang", "lang_pred"], as_index=False).size() \
                .rename(columns={"size": "n"})
            g["n"] = g["n"].astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False)

        return preagg_sum(docs.map_batches(conf, batch_format="pyarrow"),
                          ["lang", "lang_pred"], {"n": "n"})

    def text_bpe_token_count(sf_dir):
        return _docs_ds(sf_dir).map_batches(T.bpe_token_count,
                                            batch_format="pyarrow")

    def _inject_pii(batch: pa.Table) -> pa.Table:
        # the sf documents are PII-free word soup: plant id-derived
        # emails/phones the SQL oracles replant identically
        ids = batch.column("doc_id").to_pandas()
        s = batch.column("text").to_pandas().fillna("")
        em = ids % 7 == 0
        ph = ids % 11 == 0
        s = s + np.where(
            em, " mail: u" + ids.astype(str) + "@ex" +
            (ids % 10).astype(str) + ".org", "")
        s = s + np.where(
            ph, " call " + (ids % 1000).astype(str).str.zfill(3) +
            "-555-" + (ids % 10000).astype(str).str.zfill(4), "")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": pa.array(s, pa.string())})

    def corpus_span_stats(sf_dir):
        # per-doc span-kind statistics straight off the interleaved
        # list<struct> spans column (input_hint shape) — zero-copy list
        # offsets + reduceat, no row-wise struct rebuild; the oracle
        # recomputes the counts from the corpus formula
        from raygraph.io import read_documents
        from raygraph.ops.spans import span_stats

        return read_documents(_corpus_dir(sf_dir)).map_batches(
            span_stats, batch_format="pyarrow")

    def corpus_pack_interleaved(sf_dir):
        # multimodal sequence packing: per-doc training cost off the
        # interleaved spans column (text spans = whitespace tokens,
        # media spans = fixed 64-patch budget, zero-copy reduceat),
        # then the two-phase distributed scan assigns each doc the
        # 512-token window its first token falls in — nothing but
        # n_tiles scalars on the driver
        import pyarrow.compute as pc

        from raygraph.io import read_documents
        from raygraph.ops.relational import ordered_prefix_sum
        from raygraph.ops.spans import interleaved_costs

        costs = read_documents(_corpus_dir(sf_dir)).map_batches(
            interleaved_costs, batch_format="pyarrow")
        scanned = ordered_prefix_sum(costs, "i", "cost", n_tiles=8,
                                     out="__off")

        def finish(batch: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "cost": batch.column("cost"),
                "window_id": pc.divide(batch.column("__off"),
                                       pa.scalar(512, pa.int64())),
            })

        return scanned.map_batches(finish, batch_format="pyarrow")

    def corpus_caption_pairs(sf_dir):
        # media<->text alignment: every media span paired with its
        # caption and the latest preceding text span in the doc — the
        # (image, caption, context) harvesting stage; oracle rebuilds
        # all three strings from the corpus formula
        from raygraph.io import read_documents
        from raygraph.ops.spans import caption_context

        return read_documents(_corpus_dir(sf_dir)).map_batches(
            caption_context, batch_format="pyarrow")

    def corpus_render_interleaved(sf_dir):
        # interleaved SEQUENCE BUILDING: each multimodal doc becomes one
        # training string (text spans verbatim, media spans as
        # <media_ref> sentinel tokens) — pure-Arrow flatten + list
        # re-wrap + binary_join, no per-row Python; the oracle rebuilds
        # every rendered string from the corpus formula
        from raygraph.io import read_documents
        from raygraph.ops.spans import render_interleaved

        return read_documents(_corpus_dir(sf_dir)).map_batches(
            render_interleaved, batch_format="pyarrow")

    def docs_pii_scrub(sf_dir):
        # counts on the original, redaction in two non-interacting passes
        return (_docs_ds(sf_dir)
                .map_batches(_inject_pii, batch_format="pyarrow")
                .map_batches(T.pii_scrub, batch_format="pyarrow"))

    def docs_extract_emails(sf_dir):
        # flat-map explode: every email match becomes its own row —
        # the mining half of the PII pipeline (scrub is the masking half)
        from raygraph.ops.text import EMAIL_PATTERN, extract_matches

        injected = _docs_ds(sf_dir).map_batches(_inject_pii,
                                                batch_format="pyarrow")
        return extract_matches(injected, EMAIL_PATTERN, out="email")

    def docs_contamination(sf_dir):
        # benchmark-contamination filter: the "benchmark" is the distinct
        # 3-gram set of docs 0..19 (small side, collected once and
        # broadcast via the task closure); every doc is scored for
        # overlap in one corpus pass
        def head_docs(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.less(batch.column("doc_id"), 20))

        bench_docs = _docs_ds(sf_dir).map_batches(head_docs,
                                                  batch_format="pyarrow")
        bench = T.bench_ngram_set(bench_docs, n=3)
        return T.contamination_counts(_docs_ds(sf_dir), bench, n=3)

    def docs_contamination_dist(sf_dir):
        # fully-distributed twin of docs_contamination (same oracle):
        # the benchmark gram inventory stays a Dataset — per-batch
        # (doc, gram, occ) combiner rows, one pair-hash distinct on the
        # bench side, ONE gram-keyed shuffle join — the 100-TB route
        # where the eval-set union outgrows the driver broadcast
        def head_docs(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.less(batch.column("doc_id"), 20))

        bench_docs = _docs_ds(sf_dir).map_batches(head_docs,
                                                  batch_format="pyarrow")
        return T.contamination_counts_distributed(
            _docs_ds(sf_dir), bench_docs, n=3)

    def docs_repetition(sf_dir):
        return _docs_ds(sf_dir).map_batches(T.repetition_stats,
                                            batch_format="pyarrow")

    def docs_quality_prune(sf_dir):
        # per-domain quality budget: each lang keeps only docs at or
        # above its OWN 40th-percentile quality (CCNet-style — a global
        # threshold would let the high-resource lang crowd out the
        # rest). Pass 1 = bounded value-count quantile exchange
        # (≤ 10001 distinct e4 scores per lang); pass 2 = stateless
        # broadcast-threshold filter
        from raygraph.ops.text import quality_prune

        return quality_prune(
            _docs_ds(sf_dir, columns=("doc_id", "text", "lang")),
            q_pct=40)

    def docs_rebalance_sources(sf_dir):
        # corpus mixing: equalize the language distribution by
        # downsampling every language to (about) the rarest language's
        # volume — pass 1 computes per-source counts (a tiny aggregate),
        # pass 2 is the content-keyed stratified filter (deterministic
        # at any parallelism, exactly reproducible in SQL)
        from raygraph.ops.relational import preagg_sum, stratified_sample

        docs = _docs_ds(sf_dir, columns=("doc_id", "lang"))
        cnt = preagg_sum(docs, ["lang"], {}, counts="n").to_pandas()
        mn = int(cnt["n"].min())
        rates = {s: (1000 * mn) // int(n)
                 for s, n in zip(cnt["lang"], cnt["n"])}
        return stratified_sample(docs, rates, "lang")

    def docs_length_band(sf_dir):
        # corpus-statistic filter: keep docs whose token count lies in
        # the global [p05, p95] band — two passes: exact quantiles via
        # the value-count shuffle (two scalars reach the driver), then a
        # streaming Arrow filter with the band in the task closure
        import pyarrow.compute as pc

        from raygraph.ops.relational import grouped_quantiles

        counted = _docs_ds(sf_dir).map_batches(
            T.token_count, batch_format="pyarrow").materialize()

        def tag(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__g", pa.array(np.zeros(batch.num_rows, dtype="int64")))

        q = grouped_quantiles(
            counted.map_batches(tag, batch_format="pyarrow"), ["__g"],
            "n_tokens", qs=(0.05, 0.95), prefix="q").to_pandas()
        lo, hi = int(q["q05"].iloc[0]), int(q["q95"].iloc[0])

        def band(batch: pa.Table) -> pa.Table:
            n = batch.column("n_tokens")
            keep = pc.and_(pc.greater_equal(n, lo), pc.less_equal(n, hi))
            return batch.filter(keep)

        return counted.map_batches(band, batch_format="pyarrow")

    def orders_global_rownum(sf_dir):
        # global ROW_NUMBER() OVER (ORDER BY o_orderkey) without a
        # global sort: the two-phase ordered prefix-sum over a constant
        # 1 column (exact range tiles; n_tiles scalars on the driver)
        from raygraph.ops.relational import ordered_prefix_sum

        orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                 columns=["o_orderkey"])

        def one(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__one", pa.array(np.ones(batch.num_rows, dtype="int64")))

        scanned = ordered_prefix_sum(
            orders.map_batches(one, batch_format="pyarrow"),
            "o_orderkey", "__one", n_tiles=8, out="__rn0")

        def finish(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "o_orderkey": batch.column("o_orderkey"),
                "rn": pc.add(batch.column("__rn0"), 1),
            })

        return scanned.map_batches(finish, batch_format="pyarrow")

    def docs_normalize(sf_dir):
        # Unicode NFC normalization (the canonicalization step before
        # any hashing/dedup): combining sequences are injected
        # deterministically (the sf corpus is pure ASCII) and folded;
        # the oracle replants and nfc_normalize()s identically
        def fix(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pandas()
            s = batch.column("text").to_pandas().fillna("")
            s = s + np.where(ids % 5 == 0, " cafe\u0301", "")
            norm = s.str.normalize("NFC")
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "norm_text": pa.array(norm, pa.string()),
                "n_chars_norm": pa.array(
                    norm.str.len().astype("int64"), pa.int64()),
            })

        return _docs_ds(sf_dir).map_batches(fix, batch_format="pyarrow")

    def docs_shuffle_rank(sf_dir):
        # deterministic global TRAINING SHUFFLE: every doc gets its
        # position in the md5-keyed permutation — content-keyed order
        # (stable at any parallelism, reshuffled by changing a salt) +
        # the two-phase ordered prefix-sum for the global rank; ties on
        # the 60-bit key co-tile and resolve by doc_id
        import hashlib

        from raygraph.ops.relational import ordered_prefix_sum

        def key(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pandas()
            k = ids.astype(str).map(
                lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16))
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "shuffle_key": pa.array(k, pa.int64()),
                "__one": pa.array(np.ones(len(ids), dtype="int64")),
            })

        keyed = _docs_ds(sf_dir, columns=("doc_id",)).map_batches(
            key, batch_format="pyarrow")
        scanned = ordered_prefix_sum(keyed, "shuffle_key", "__one",
                                     n_tiles=8, out="__rn0",
                                     tie_cols=("doc_id",))

        def finish(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "doc_id": batch.column("doc_id"),
                "shuffle_key": batch.column("shuffle_key"),
                "rank": pc.add(batch.column("__rn0"), 1),
            })

        return scanned.map_batches(finish, batch_format="pyarrow")

    def docs_cap_per_lang(sf_dir):
        # per-class volume cap: a deterministic content-keyed sample of
        # exactly ≤5 docs per language (md5-ordered group top-k — the
        # "at most N examples per class" curation primitive); per-batch
        # partial top-k then one bucketed exact reduce
        import hashlib

        from raygraph.ops.relational import group_topk

        def key(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pandas()
            k = ids.astype(str).map(
                lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16))
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "shuffle_key": pa.array(k, pa.int64()),
            })

        keyed = _docs_ds(sf_dir, columns=("doc_id", "lang")).map_batches(
            key, batch_format="pyarrow")
        return group_topk(keyed, ["lang"], "shuffle_key", k=5,
                          tie_col="doc_id")

    def docs_chunks(sf_dir):
        # RAG chunking: every doc → consecutive 32-token chunks
        # (flat-map fan-out inside the doc's batch, no shuffle)
        from raygraph.ops.text import chunk_documents

        return chunk_documents(_docs_ds(sf_dir), chunk_tokens=32)

    def docs_packing(sf_dir):
        # sequence packing into 2048-token context windows over the
        # doc_id-ordered corpus: a distributed two-phase scan (exact
        # range tiles → per-tile totals → driver prefix of n_tiles
        # scalars → vectorized per-tile cumsum)
        return T.pack_sequences(_docs_ds(sf_dir), budget=2048, n_tiles=8)

    def docs_prepare_packs(sf_dir):
        # training-prep composition: seeded epoch shuffle (seed 7,
        # md5-rank permutation) then sequence packing over the
        # SHUFFLED order — the order every packed-training pipeline
        # actually uses (packing the unshuffled corpus correlates
        # neighboring documents within a context window)
        from raygraph.ops.relational import cogroup_join, epoch_shuffle
        from raygraph.ops.text import pack_sequences

        ds = _docs_ds(sf_dir)
        pos = epoch_shuffle(ds.select_columns(["doc_id"]), seed=7)
        with_pos = cogroup_join(ds, pos, on="doc_id")
        return pack_sequences(with_pos, budget=2048,
                              order_col="position", n_tiles=8)

    def text_top_tokens(sf_dir):
        # corpus heavy hitters: vectorized explode (split + pandas
        # explode) → per-batch partial counts → one vocab-bounded
        # groupby; the driver sees only the vocab-sized aggregate
        ds = _docs_ds(sf_dir)

        def token_counts(batch: pa.Table) -> pa.Table:
            s = batch.column("text").to_pandas().fillna("")
            toks = s.str.strip().str.lower().str.split().explode().dropna()
            g = toks.value_counts().rename_axis("token") \
                .reset_index(name="n")
            return pa.Table.from_pandas(g, preserve_index=False)

        agg = preagg_sum(ds.map_batches(token_counts, batch_format="pyarrow"),
                         ["token"], {"n": "n"})
        df = agg.to_pandas().sort_values(["n", "token"],
                                         ascending=[False, True]).head(20)
        return df.reset_index(drop=True)

    def text_hapax_ratio(sf_dir):
        # vocabulary-health screen: hapax-legomena share of the corpus
        # vocab — distributed token count, one-row fold off per-block
        # partials (2 ints per block reach the driver)
        return T.hapax_stats(_docs_ds(sf_dir))

    def kg_pred_entropy(sf_dir):
        # schema-balance diagnostic of the built graph: Shannon entropy
        # (nats, e6-floored per term — the proven exact-int→double-once
        # ln idiom) of the edge-predicate distribution; one pred-keyed
        # combiner preagg, entropy folded on the tiny aggregate
        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["pred"])

        def ones(batch: pa.Table) -> pa.Table:
            return pa.table({
                "pred": batch.column("pred"),
                "n": pa.array(np.ones(batch.num_rows, dtype="int64")),
            })

        cnt = preagg_sum(ed.map_batches(ones, batch_format="pyarrow"),
                         ["pred"], {"n": "n"}).to_pandas()
        nn = cnt["n"].to_numpy().astype("int64")
        tot = int(nn.sum())
        term = np.floor(
            (1_000_000 * nn) * np.log(tot / nn) / tot).astype("int64")
        return pd.DataFrame({
            "n_preds": pd.array([len(cnt)], dtype="int64"),
            "n_edges": pd.array([tot], dtype="int64"),
            "h_e6": pd.array([int(term.sum())], dtype="int64"),
        })

    def text_zipf(sf_dir):
        # Zipf's-law slope of the frequency spectrum: distributed token
        # count, then an exact-integer least-squares fit (Python-int
        # normal equations, HUGEINT in the oracle) over the top-100
        # (count desc, token asc) ranks — only k rows reach the driver
        return T.zipf_slope(_docs_ds(sf_dir), k=100)

    def text_top_bigrams(sf_dir):
        # n-gram-LM counting primitive: in-doc adjacent-token bigrams
        # built vectorized off one flat token array per batch, partial
        # counts, then distributed sort+limit — only 20 rows reach the
        # driver (the bigram vocab itself stays in the cluster)
        return T.top_bigrams(_docs_ds(sf_dir), k=20)

    def text_rake_keywords(sf_dir):
        # RAKE keyword extraction (top 15): stopword-free phrase runs,
        # word score = (1e6·deg)//freq with co-occurrence degree,
        # phrase = integer sum of member scores — one flat-map, one
        # vocab aggregate, one word-keyed join, phrase folds
        from raygraph.ops.text import rake_keywords

        return rake_keywords(_docs_ds(sf_dir), k=15, lang="en")

    def text_good_turing(sf_dir):
        # Good–Turing adjusted counts over the BIGRAM frequency
        # spectrum (r = 1..10; the unigram vocab here is too small to
        # keep a low-count tail): gt_e6 = (1e6·(r+1)·n_{r+1}) // n_r —
        # pure integer floor, two combiner exchanges, <= 11 spectrum
        # rows on the driver
        from raygraph.ops.text import good_turing

        return good_turing(_docs_ds(sf_dir), max_r=10, gram=2)

    def text_bigram_g2(sf_dir):
        # Dunning log-likelihood collocations (top 20 of the top-1000
        # count candidates): 2x2 bigram-position contingency, per-term
        # e6-floored ln then exact integer sum — the significance-test
        # counterpart of text_bigram_pmi
        from raygraph.ops.text import bigram_g2_topk

        return bigram_g2_topk(_docs_ds(sf_dir), k=20, top_m=1000)

    def text_bigram_pmi(sf_dir):
        # collocation mining: exact-bigint PMI over the count-heavy-
        # hitter bigrams (vocab-sized combiner aggregates, distributed
        # mass scalars, one is_in margin fetch)
        return T.bigram_pmi(_docs_ds(sf_dir), k=20, top_m=1000)

    def events_transition_pmi(sf_dir):
        # pointwise mutual information of the user-journey transition
        # matrix: transition counts from the shared hash-bucketed pass,
        # margins + floor(10^6·ln) on the transition-type-sized
        # aggregate (exact ints → ONE double conversion, libm-stable)
        import math

        from raygraph.ops.events import type_transitions

        ev = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "event_type"])
        tr = type_transitions(ev).to_pandas()
        n_tot = int(tr["n"].sum())
        nf = tr.groupby("from_type")["n"].sum().to_dict()
        nt = tr.groupby("to_type")["n"].sum().to_dict()
        tr["pmi_e6"] = pd.Series(
            [math.floor(1_000_000 * math.log(
                float(int(n) * n_tot)
                / float(int(nf[f]) * int(nt[t]))))
             for n, f, t in zip(tr["n"], tr["from_type"], tr["to_type"])],
            index=tr.index, dtype="int64")
        tr["n"] = tr["n"].astype("int64")
        return tr[["from_type", "to_type", "n", "pmi_e6"]]

    def docs_weighted_sample(sf_dir):
        # deterministic weighted-priority sampling (A-ES shape with an
        # id-derived integer uniform): priority = u·10⁴ // (weight+1),
        # weight = n_chars — longer docs sample first; bottom-20 via
        # distributed sort+limit, integer-exact on both engines
        ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                             columns=["doc_id", "n_chars"])

        def prio(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            u = (df["doc_id"].to_numpy().astype("int64")
                 * 2654435761) % 4294967296
            return pa.Table.from_pandas(pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "n_chars": df["n_chars"].astype("int64"),
                "priority": u * 10_000
                // (df["n_chars"].to_numpy().astype("int64") + 1),
            }), preserve_index=False)

        return ds.map_batches(prio, batch_format="pyarrow") \
            .sort(["priority", "doc_id"]).limit(20)

    def docs_bigram_perplexity(sf_dir):
        # CCNet-style perplexity filter: per-doc cross-entropy under
        # the corpus's own add-one-smoothed bigram LM — one tokenize
        # pass, bigram/history combiner preaggs, two hash-shuffle
        # joins; the LM never lands on the driver
        return T.bigram_cross_entropy(_docs_ds(sf_dir))

    def docs_dsir_weights(sf_dir):
        # DSIR data selection (Xie et al. 2023): per-doc hashed-n-gram
        # importance weight of the raw corpus against the src0 target
        # slice — fit is one dim-sized combiner aggregate, the 1024-
        # bucket log-ratio table ships in the task closure (8 KB —
        # hashing keeps the model corpus-independent), score is a
        # stateless second pass
        from raygraph.ops.text import dsir_weights

        ds = rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "source"])
        return dsir_weights(ds, target_col="source",
                            target_value="src0")

    def docs_unigram_surprise(sf_dir):
        # perplexity-filter analog: per-doc cross-entropy under the
        # corpus's own unigram LM — per-(doc,word) tf partials, one
        # word-hash shuffle join vs the vocab Dataset, doc-keyed fold
        return T.unigram_surprise_topk(_docs_ds(sf_dir), k=20)

    def docs_bm25_top10(sf_dir):
        # BM25 retrieval for the fixed query (hash, join, vector,
        # stream): exact-integer tf normalization, ln-idf on the 4
        # driver scalars, per-(doc,term) e6-floors summed as ints
        return T.bm25_topk(_docs_ds(sf_dir),
                           ["hash", "join", "vector", "stream"], k=10)

    def docs_rrf_fusion(sf_dir):
        # reciprocal-rank fusion of two rankings (the retrieval-ensemble
        # op): global ranks via the two-phase ordered prefix-sum (no
        # global sort) over unique composite int keys encoding
        # (score desc, id asc); rrf_e6 = Σ 10⁶//(60+rank) — integer-
        # exact end to end, one doc-keyed shuffle join to fuse
        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import (_join_partitions,
                                             ordered_prefix_sum,
                                             shuffle_join)

        ndoc = pq.read_metadata(
            os.path.join(sf_dir, "documents.parquet")).num_rows
        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "n_chars"])

        def ranked(keyed, out):
            scanned = ordered_prefix_sum(keyed, "__k", "__one", n_tiles=8,
                                         out="__r0")

            def finish(batch: pa.Table, _out=out) -> pa.Table:
                df = batch.to_pandas()
                return pa.Table.from_pandas(pd.DataFrame({
                    "doc_id": df["doc_id"].astype("int64"),
                    _out: df["__r0"].astype("int64") + 1,
                }), preserve_index=False)

            return _repaired(
                scanned.map_batches(finish, batch_format="pyarrow"),
                pa.schema([("doc_id", pa.int64()), (out, pa.int64())]))

        def key_a(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            d = df["doc_id"].to_numpy().astype("int64")
            return pa.Table.from_pandas(pd.DataFrame({
                "doc_id": d,
                "__k": (1_000_000 - df["n_chars"].to_numpy()
                        .astype("int64")) * 100_000_000 + d,
                "__one": np.ones(len(df), dtype="int64"),
            }), preserve_index=False)

        def key_b(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            d = df["doc_id"].to_numpy().astype("int64")
            u = (d * 2654435761) % 4294967296
            return pa.Table.from_pandas(pd.DataFrame({
                "doc_id": d,
                "__k": (4294967296 - u) * 100_000_000 + d,
                "__one": np.ones(len(df), dtype="int64"),
            }), preserve_index=False)

        ra = ranked(docs.map_batches(key_a, batch_format="pyarrow"),
                    "rank_a")
        rb = ranked(docs.map_batches(key_b, batch_format="pyarrow"),
                    "rank_b")
        j = shuffle_join(ra, rb.rename_columns({"doc_id": "doc_id2"}),
                         on="doc_id", right_on="doc_id2",
                         num_partitions=_join_partitions(ndoc))

        def fuse(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            ra_ = df["rank_a"].to_numpy().astype("int64")
            rb_ = df["rank_b"].to_numpy().astype("int64")
            return pa.Table.from_pandas(pd.DataFrame({
                "doc_id": df["doc_id"].astype("int64"),
                "rank_a": ra_, "rank_b": rb_,
                "rrf_e6": 1_000_000 // (60 + ra_)
                + 1_000_000 // (60 + rb_),
            }), preserve_index=False)

        return j.map_batches(fuse, batch_format="pyarrow") \
            .sort(["rrf_e6", "doc_id"], descending=[True, False]).limit(10)

    def docs_lr_score(sf_dir):
        # batched model inference: integer-weight linear classifier as
        # an actor pool, weights broadcast ONCE via ray.put and read in
        # __init__; exact-integer logit so the oracle replays it
        return T.score_linear(_docs_ds(sf_dir))

    def lineitem_corr(sf_dir):
        # exact-moment Pearson correlation (quantity vs whole-dollar
        # price) per return flag, in basis points: one combiner pass
        # carries five integer moment sums per group; the finalize runs
        # on the 3-row aggregate with arbitrary-precision ints (the
        # oracle mirrors in HUGEINT). trunc quantization — unambiguous
        # where round's half-tie rule differs between engines
        from raygraph.ops.relational import grouped_corr_bp

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_returnflag", "l_quantity", "l_extendedprice"])

        def quant(batch: pa.Table) -> pa.Table:
            return pa.table({
                "l_returnflag": batch.column("l_returnflag"),
                "qty": pa.array(np.trunc(
                    batch.column("l_quantity").to_numpy()).astype("int64")),
                "dollars": pa.array(np.trunc(
                    batch.column("l_extendedprice").to_numpy())
                    .astype("int64")),
            })

        return grouped_corr_bp(li.map_batches(quant, batch_format="pyarrow"),
                               ["l_returnflag"], "qty", "dollars")

    def lineitem_spearman(sf_dir):
        # Spearman rank correlation (quantity vs whole-dollar price):
        # exact 2x midranks from the two value-count exchanges
        # (distinct values move, never rows — the Mann-Whitney midrank
        # idiom), rank maps broadcast once (bounded by the VALUE
        # DOMAIN, not the row count), then the proven exact-moment
        # Pearson fold on the rank pairs
        import ray as _ray

        from raygraph.ops.relational import grouped_corr_bp

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_quantity", "l_extendedprice"])

        def quant(batch: pa.Table) -> pa.Table:
            return pa.table({
                "x": pa.array(np.trunc(
                    batch.column("l_quantity").to_numpy())
                    .astype("int64")),
                "y": pa.array(np.trunc(
                    batch.column("l_extendedprice").to_numpy())
                    .astype("int64")),
            })

        q = li.map_batches(quant, batch_format="pyarrow").materialize()

        def rank2_map(col: str) -> dict:
            sp = preagg_sum(q.select_columns([col]), [col], {},
                            counts="c").to_pandas() \
                .sort_values(col).reset_index(drop=True)
            c = sp["c"].to_numpy(dtype="int64")
            before = np.cumsum(c) - c
            return dict(zip(sp[col].astype(int),
                            (2 * before + c + 1).tolist()))

        rx = _ray.put(rank2_map("x"))
        ry = _ray.put(rank2_map("y"))

        def to_ranks(batch: pa.Table) -> pa.Table:
            mx, my = _ray.get(rx), _ray.get(ry)
            df = batch.to_pandas()
            return pa.table({
                "grp": pa.array(np.zeros(len(df), dtype="int64")),
                "r2x": pa.array(df["x"].map(mx).to_numpy(
                    dtype="int64")),
                "r2y": pa.array(df["y"].map(my).to_numpy(
                    dtype="int64")),
            })

        return grouped_corr_bp(
            q.map_batches(to_ranks, batch_format="pyarrow"),
            ["grp"], "r2x", "r2y")

    def docs_boilerplate(sf_dir):
        # cross-doc boilerplate screen: per-doc fraction (exact bp) of
        # 5-gram occurrences whose 5-gram appears in ≥5 docs — exact df
        # via one ngram-keyed exchange + doc-keyed combiner fold-back
        return T.boilerplate_stats(_docs_ds(sf_dir), n=5, df_min=5)

    def docs_split_assign(sf_dir):
        # deterministic train/val/test split (80/10/10): content-keyed
        # md5 bucket of the doc id — identical assignment at any
        # parallelism, on any engine; no shuffle, pure streamed map
        import hashlib

        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "lang"])

        def assign(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pandas().astype(str)
            h = ids.map(lambda s: int(
                hashlib.md5(s.encode()).hexdigest()[:15], 16) % 1000)
            split = np.where(h < 800, "train",
                             np.where(h < 900, "val", "test"))
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "split": pa.array(split, pa.string()),
            })

        return docs.map_batches(assign, batch_format="pyarrow")

    def events_top_trigrams(sf_dir):
        # sequence mining: top-10 per-user event-type trigrams (three
        # consecutive events by (ts, event_id)); user-bucketed partials
        # are trigram-type-sized, final top-k is a distributed
        # sort+limit
        ev = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_type", "event_id"])
        return E.type_trigrams(ev, k=10)

    def text_bpe_merge(sf_dir):
        # tokenizer training, one step: the top-10 adjacent char pairs
        # a BPE learner would merge next — vocab-sized combiner, pair
        # explode once per unique token, distributed sort+limit
        return T.bpe_merge_pairs(_docs_ds(sf_dir), k=10)

    def events_hour_profile(sf_dir):
        # temporal feature engineering: event seasonality by (hour of
        # day × type) — counts + exact value_e4 sums, one combiner pass
        import pyarrow.compute as pc

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["ts", "event_type", "value"])

        def tag(batch: pa.Table) -> pa.Table:
            v = batch.column("value").to_numpy(zero_copy_only=False)
            return pa.table({
                "hour": pc.cast(pc.hour(batch.column("ts")), pa.int64()),
                "event_type": batch.column("event_type"),
                "value_e4": pa.array(np.round(v * 10000).astype("int64")),
            })

        return preagg_sum(ev.map_batches(tag, batch_format="pyarrow"),
                          ["hour", "event_type"],
                          {"sum_value_e4": "value_e4"}, counts="n")

    def lineitem_weighted_disc(sf_dir):
        # price-weighted mean discount per return flag, exact integer
        # rational: wavg_bp = Σ(disc_bp·price_cents) // Σprice_cents —
        # one combiner pass, 3-row aggregate
        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_returnflag", "l_discount", "l_extendedprice"])

        def quant(batch: pa.Table) -> pa.Table:
            d = batch.column("l_discount").to_numpy(zero_copy_only=False)
            p = batch.column("l_extendedprice") \
                .to_numpy(zero_copy_only=False)
            cents = np.round(p * 100).astype("int64")
            bp = np.round(d * 10_000).astype("int64")
            return pa.table({
                "l_returnflag": batch.column("l_returnflag"),
                "num": pa.array(bp * cents, pa.int64()),
                "den": pa.array(cents, pa.int64()),
            })

        agg = preagg_sum(li.map_batches(quant, batch_format="pyarrow"),
                         ["l_returnflag"], {"num": "num", "den": "den"})

        def finish(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "l_returnflag": batch.column("l_returnflag"),
                "wavg_disc_bp": pc.divide(batch.column("num"),
                                          batch.column("den")),
            })

        return agg.map_batches(finish, batch_format="pyarrow")

    def docs_from_jsonl(sf_dir):
        # multi-format source parity: the corpus exported once to JSONL
        # (dump-file shape, reference M1 parser analog) and re-ingested
        # through raygraph.io.read_documents_jsonl, then a per-lang
        # profile — byte-identical to the parquet-path oracle
        from raygraph.io import read_documents_jsonl

        jl_dir = os.path.join(_TMP,
                              f"docs_jsonl_{_docs_count(sf_dir)}")
        if not os.path.isdir(jl_dir):
            rd.read_parquet(
                os.path.join(sf_dir, "documents.parquet"),
                columns=["doc_id", "lang", "n_chars"],
            ).write_json(jl_dir)
        docs = read_documents_jsonl(jl_dir)
        return preagg_sum(docs, ["lang"], {"sum_chars": "n_chars"},
                          counts="n_docs")

    def kg_pred_cooccur(sf_dir):
        # KG schema discovery: predicate co-occurrence — for each
        # unordered predicate pair, how many subjects carry BOTH. One
        # (subj, pred) dedup combiner, a subject-hash self-join-shaped
        # reduce (all of a subject's predicates meet in its bucket),
        # and a pred²-sized count aggregate
        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import hash_aggregate

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "pred"])
        sp = _repaired(
            hash_aggregate(ed, ["_from"],
                           lambda df: df.drop_duplicates()),
            pa.schema([("_from", pa.string()), ("pred", pa.string())]))

        def pairs(df: pd.DataFrame) -> pd.DataFrame:
            out = []
            for _, g in df.groupby("_from", sort=False):
                ps = sorted(set(g["pred"]))
                for i in range(len(ps)):
                    for j in range(i + 1, len(ps)):
                        out.append((ps[i], ps[j]))
            o = pd.DataFrame(out, columns=["pred_a", "pred_b"])
            if not len(o):
                return pd.DataFrame({"pred_a": pd.Series([], dtype=str),
                                     "pred_b": pd.Series([], dtype=str),
                                     "n_subjects": pd.Series([],
                                                             dtype="int64")})
            g = o.groupby(["pred_a", "pred_b"], as_index=False).size() \
                .rename(columns={"size": "n_subjects"})
            g["n_subjects"] = g["n_subjects"].astype("int64")
            return g

        part = hash_aggregate(sp, ["_from"], pairs)
        return preagg_sum(part, ["pred_a", "pred_b"],
                          {"n_subjects": "n_subjects"})

    def kg_pred_stats(sf_dir):
        # KG profiling: per-predicate edge count + distinct-subject
        # count — per-batch (pred, subject) dedup combiner, one
        # predicate-sized aggregate
        from raygraph.ops.relational import distinct_count

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "pred"])
        dc = distinct_count(ed, ["pred"], "_from", out="n_subjects")
        cnt = preagg_sum(ed.select_columns(["pred"]), ["pred"], {},
                         counts="n_edges")
        return broadcast_join(cnt, dc.to_pandas(), on="pred")

    def tpch_promo_share(sf_dir):
        # TPC-H Q14 shape: promo revenue share in exact basis points —
        # the 2k-row part table broadcast (ray.put once, no shuffle)
        # onto the lineitem stream; discounted cents are the exact-int
        # Q1 idiom; ONE combiner pass, 2-scalar finalize
        import ray

        part = pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_type"]).to_pandas()
        part["is_promo"] = part["p_type"].str.startswith("PROMO") \
            .astype("int64")
        promo_ref = ray.put(dict(zip(part["p_partkey"],
                                     part["is_promo"])))

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_extendedprice", "l_discount"])

        def partial(batch: pa.Table) -> pa.Table:
            promo = ray.get(promo_ref)
            p = batch.column("l_extendedprice") \
                .to_numpy(zero_copy_only=False)
            d = batch.column("l_discount").to_numpy(zero_copy_only=False)
            cents = np.round(p * 100).astype("int64")
            bp = np.round(d * 10_000).astype("int64")
            disc = cents * (10_000 - bp) // 10_000
            pk = batch.column("l_partkey").to_pandas()
            is_p = pk.map(promo).fillna(0).astype("int64").to_numpy()
            return pa.table({
                "promo_cents": pa.array([int((disc * is_p).sum())],
                                        pa.int64()),
                "total_cents": pa.array([int(disc.sum())], pa.int64()),
            })

        agg = li.map_batches(partial, batch_format="pyarrow") \
            .sum(["promo_cents", "total_cents"])
        promo_c = int(agg["sum(promo_cents)"])
        total_c = int(agg["sum(total_cents)"])
        return pd.DataFrame({
            "promo_cents": [promo_c],
            "total_cents": [total_c],
            "promo_bp": [(10_000 * promo_c) // total_c],
        })

    def docs_inverted_index(sf_dir):
        # search-index build: distinct (doc, token) explode → ONE
        # token-bucketed shuffle; df counted vectorized, out-of-band
        # tokens dropped BEFORE the bounded (≤100-entry) posting joins
        from raygraph.ops.text import inverted_index

        return inverted_index(_docs_ds(sf_dir), df_min=2, df_max=400)

    def docs_search_all(sf_dir):
        # conjunctive boolean search composing the index family: the
        # 2 highest-df tokens (vocab-sized aggregate → driver, ties →
        # token asc) become the broadcast query; matching is one
        # shuffle-free vectorized pass
        from raygraph.ops.text import search_all_tokens

        def tok_pairs(batch: pa.Table) -> pa.Table:
            s = batch.column("text").to_pandas().fillna("")
            ids = batch.column("doc_id").to_pandas()
            ex = s.str.strip().str.lower().str.split().explode().dropna()
            df = pd.DataFrame({
                "doc_id": ids.loc[ex.index].to_numpy(),
                "token": ex.to_numpy(),
            }).drop_duplicates()
            return pa.Table.from_pandas(df[["token"]], preserve_index=False)

        dfreq = preagg_sum(
            _docs_ds(sf_dir).map_batches(tok_pairs, batch_format="pyarrow"),
            ["token"], {}, counts="n").to_pandas()
        q = dfreq.sort_values(["n", "token"], ascending=[False, True]) \
            .head(2)["token"].tolist()
        return search_all_tokens(_docs_ds(sf_dir), q)

    def orders_zorder_tiles(sf_dir):
        # multi-column data-layout key: Morton-interleave (custkey,
        # order day) and count rows per 2^16-key tile — the clustering
        # histogram a layout optimizer would write files by; pure
        # per-batch bit math + one tile-sized aggregate
        import pyarrow.compute as pc

        from raygraph.ops.relational import zorder_key

        od = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey", "o_orderdate"])

        def prep(batch: pa.Table) -> pa.Table:
            us = pc.cast(batch.column("o_orderdate"), pa.int64())
            return pa.table({
                "x": batch.column("o_custkey"),
                "y": pc.divide(us, pa.scalar(86_400_000_000, pa.int64())),
            })

        z = zorder_key(od.map_batches(prep, batch_format="pyarrow"),
                       "x", "y")

        def tile(batch: pa.Table) -> pa.Table:
            return pa.table({"tile": pc.shift_right(
                batch.column("zkey"), pa.scalar(16, pa.int64()))})

        return preagg_sum(z.map_batches(tile, batch_format="pyarrow"),
                          ["tile"], {}, counts="n_orders")

    def text_freq_spectrum(sf_dir):
        # Zipf-profiling counts-of-counts: how many tokens occur exactly
        # k times — two combiner aggregates (corpus → vocab-sized token
        # counts → spectrum-sized histogram), nothing corpus-sized moves
        def token_counts(batch: pa.Table) -> pa.Table:
            s = batch.column("text").to_pandas().fillna("")
            toks = s.str.strip().str.lower().str.split().explode().dropna()
            g = toks.value_counts().rename_axis("token") \
                .reset_index(name="n")
            return pa.Table.from_pandas(g, preserve_index=False)

        counts = preagg_sum(
            _docs_ds(sf_dir).map_batches(token_counts,
                                         batch_format="pyarrow"),
            ["token"], {"n": "n"})
        return preagg_sum(counts.select_columns(["n"]), ["n"], {},
                          counts="n_tokens").rename_columns({"n": "k"})

    def docs_lang_diversity(sf_dir):
        # per-source Gini-Simpson language diversity in exact basis
        # points: 10⁴ − floor(10⁴·Σn_l² / N²) — the detail pass is one
        # combiner count; the (source×lang)-sized aggregate finishes on
        # the driver
        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["source", "lang"])
        cnt = preagg_sum(docs, ["source", "lang"], {},
                         counts="n").to_pandas()
        g = cnt.groupby("source")
        tot = g["n"].sum()
        # finalize with Python big ints: 10⁴·Σn² wraps int64 past
        # ~3·10⁷ docs per (source,lang) — the aggregate is
        # (source×lang)-sized, so the object fold costs nothing
        ss = g["n"].apply(lambda s: sum(int(v) ** 2 for v in s))
        gini = [10_000 - (10_000 * int(s2)) // (int(t) * int(t))
                for s2, t in zip(ss, tot)]
        out = pd.DataFrame({
            "source": tot.index,
            "n_docs": tot.astype("int64").to_numpy(),
            "gini_bp": pd.array(gini, dtype="int64"),
        })
        return out.reset_index(drop=True)

    def embedding_pca(sf_dir):
        # top principal direction: ONE streaming covariance pass (d²-
        # bound partials per batch) + exact-int64 power iteration over
        # the aggregate-sized d×d matrix on the driver — the kmeans
        # determinism contract extended to a spectral primitive
        from raygraph.ops.cluster import pca_power

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["embedding"])
        return pca_power(emb, iters=3)

    def embedding_semdedup(sf_dir):
        # SemDeDup (Abbas et al. 2023): keep-lowest-id exemplar among
        # semantic duplicates inside deterministic sign buckets — one
        # quantize pass + ONE bucket groupby; exact-integer cosines
        # (q = floor(v·10⁶)) make the prune SQL-replayable bit-for-bit
        from raygraph.ops.dedup import semdedup_survivors

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        return semdedup_survivors(emb, tau_e4=3500, n_sign_dims=6)

    def embedding_proto_prune(sf_dir):
        # D4-style prototype pruning: the k most centroid-like points
        # per cluster (cosine to the exact integer SUM vector — scale-
        # invariance means the mean never needs dividing); the prune
        # list is what the curation pipeline drops as redundant
        from raygraph.ops.dedup import prototype_prune_topk

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        return prototype_prune_topk(emb, k=3, n_sign_dims=4)

    def ann_hard_negatives(sf_dir):
        # contrastive hard-negative mining: top-3 most-similar
        # DIFFERENT-label vectors per row — broadcast-corpus matmul
        # (knn_self_join shape), exact composite-int top-k ranking
        from raygraph.ops.ann import hard_negative_topk

        emb = rd.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding", "label"])
        return hard_negative_topk(emb, k=3)

    def embedding_centroid_confusion(sf_dir):
        # nearest-centroid (Rocchio) probe: label centroids as exact
        # integer SUM vectors via ONE (label,dim)-keyed combiner
        # exchange; stateless assign; confusion-matrix preagg
        from raygraph.ops.classify import nearest_centroid_confusion

        emb = rd.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding", "label"])
        return nearest_centroid_confusion(emb)

    def text_cms_counts(sf_dir):
        # Count-Min sketch heavy-hitter estimates next to exact counts:
        # the sketch is ≤ 3×512 integer cells no matter the corpus (the
        # constant-size shuffle), estimates are min-over-rows — integer
        # spec, so the SQL oracle rebuilds the identical sketch
        from raygraph.ops.sketch import cms_estimate, cms_sketch

        ds = _docs_ds(sf_dir)

        def token_counts(batch: pa.Table) -> pa.Table:
            s = batch.column("text").to_pandas().fillna("")
            toks = s.str.strip().str.lower().str.split().explode().dropna()
            g = toks.value_counts().rename_axis("token") \
                .reset_index(name="n")
            return pa.Table.from_pandas(g, preserve_index=False)

        # the per-batch token partials feed BOTH the sketch and the
        # exact candidate counts — pin them once
        partials = ds.map_batches(token_counts,
                                  batch_format="pyarrow").materialize()
        sk = cms_sketch(partials, "token", weight_col="n")
        exact = preagg_sum(partials, ["token"], {"n": "n"})
        top = exact.to_pandas().sort_values(
            ["n", "token"], ascending=[False, True]).head(20)
        est = cms_estimate(sk.to_pandas(), top["token"])
        out = top.rename(columns={"n": "exact_n"}).merge(est, on="token")
        out["exact_n"] = out["exact_n"].astype("int64")
        return out.reset_index(drop=True)

    def text_heavy_hitters(sf_dir):
        # Misra-Gries heavy hitters: every token with frequency
        # STRICTLY > n/40, exactly — pass 1 ships only k-sized per-block
        # summaries (never the token stream), pass 2 broadcast-counts
        # the candidate superset; the whole exchange is O(#blocks · k)
        from raygraph.ops.sketch import heavy_hitters

        ds = _docs_ds(sf_dir)

        def tokens(batch: pa.Table):
            s = batch.column("text").to_pandas().fillna("")
            return s.str.strip().str.lower().str.split().explode().dropna()

        return heavy_hitters(ds, k=40, values_fn=tokens, out_key="token")

    def text_gazetteer(sf_dir):
        # dictionary surface-form tagging (mention detection over an
        # entity gazetteer): multi-word phrases match as adjacent token
        # sequences; the dict ships to the object store once, partials
        # are |terms|-bounded per block ('quantum entanglement' never
        # matches — absent terms must not fabricate rows)
        from raygraph.ops.text import gazetteer_tag

        terms = ["hash join", "merge join", "row scan", "filter",
                 "vector", "customer", "quantum entanglement"]
        return gazetteer_tag(_docs_ds(sf_dir), terms)

    def docs_gazetteer_by_source(sf_dir):
        # per-slice mention detection: the gazetteer pass grouped by
        # source — partials bounded by |sources| x |terms| per block
        from raygraph.ops.text import gazetteer_tag

        terms = ["hash join", "merge join", "filter", "vector"]
        docs = rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "source"])
        return gazetteer_tag(docs, terms, group_col="source")

    def text_heavy_hitters_by_source(sf_dir):
        # per-source Misra-Gries: tokens above n_src/30 within EACH
        # source slice — one MG summary per (block, source), per-group
        # thresholds at the exact verify
        from raygraph.ops.sketch import heavy_hitters_grouped

        docs = rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["text", "source"])

        def pairs(batch: pa.Table):
            s = batch.column("text").to_pandas().fillna("")
            src = batch.column("source").to_pandas()
            toks = s.str.strip().str.lower().str.split()
            ex = toks.explode().dropna()
            return pd.DataFrame({
                "source": src.to_numpy()[ex.index.to_numpy()],
                "token": ex.to_numpy(),
            })

        return heavy_hitters_grouped(docs, k=30, pairs_fn=pairs,
                                     group_key="source",
                                     out_key="token")

    def events_scd2(sf_dir):
        # type-2 SCD fold: per-user validity intervals over event_type
        # runs (CDC -> dimension-table ingestion); output is change
        # points only, deterministic (ts, value) tie order
        from raygraph.ops.events import scd2_intervals

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts", "event_type"])
        return scd2_intervals(ev)

    def lineitem_hdr_quantiles(sf_dir):
        # mergeable log-bucket quantile sketch (HdrHistogram layout):
        # per-batch bucket counts sum through one constant-size
        # exchange; estimates under-shoot percentile_disc by < 2^-7
        # relative — the SQL oracle rebuilds the identical sketch
        from raygraph.ops.sketch import hdr_quantiles

        li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=["l_extendedprice"])

        def cents(batch: pa.Table) -> pa.Table:
            p = batch.column("l_extendedprice") \
                .to_numpy(zero_copy_only=False)
            return pa.table({"cents": pa.array(
                np.round(p * 100).astype("int64"))})

        return hdr_quantiles(li.map_batches(cents,
                                            batch_format="pyarrow"),
                             "cents", q_pcts=(50, 90, 99))

    def events_running_distinct(sf_dir):
        # COUNT(DISTINCT) OVER — the window engines refuse to run
        # directly: per-key cumulative distinct event_type count via a
        # vectorized first-occurrence mask + cumsum per bucket
        from raygraph.ops.events import running_distinct

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts", "event_id",
                                      "event_type"])
        return running_distinct(ev)

    def text_heavy_hitters_incremental(sf_dir):
        # streaming Misra-Gries: per-round MG partials fold into a
        # <= k-row mergeable state (checkpointed write-then-commit),
        # one exact verify pass at stream end — row-identical to the
        # batch twin by the mergeable-summaries superset bound, so the
        # oracle is SHARED with text_heavy_hitters
        from raygraph.ops.stream import heavy_hitters_incremental

        ds = _docs_ds(sf_dir)

        def tokens(batch: pa.Table):
            s = batch.column("text").to_pandas().fillna("")
            return s.str.strip().str.lower().str.split().explode() \
                .dropna()

        return heavy_hitters_incremental(ds, k=40, values_fn=tokens,
                                         n_micro_batches=4)

    def events_session_hdr(sf_dir):
        # sketch-over-derived-stream composition: session DURATIONS
        # (seconds) from the distributed sessionize feed the mergeable
        # HDR quantile sketch — the session-length SLO profile whose
        # exchange stays constant-size however many sessions exist
        from raygraph.ops.events import sessionize
        from raygraph.ops.sketch import hdr_quantiles

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts"])
        ses = sessionize(ev, gap_sec=1800)

        def dur(batch: pa.Table) -> pa.Table:
            a = batch.column("session_start").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            b = batch.column("session_end").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            return pa.table({"dur_sec": pa.array((b - a) // 1_000_000,
                                                 pa.int64())})

        return hdr_quantiles(ses.map_batches(dur,
                                             batch_format="pyarrow"),
                             "dur_sec", q_pcts=(50, 90, 99))

    def events_pivot_types(sf_dir):
        # PIVOT/crosstab: one row per user, one count column per event
        # type — the category list is FIXED so the output schema is
        # stable at any block layout (scale requirement)
        from raygraph.ops.relational import pivot_counts

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "event_type"])
        return pivot_counts(ev, ["user_id"], "event_type",
                            ["click", "error", "purchase", "signup",
                             "view"])

    def events_unpivot(sf_dir):
        # UNPIVOT/melt: the wide per-user crosstab folded back to long
        # (user, type, n) rows with zero cells dropped — pivot⁻¹∘pivot
        # equals the direct group count, which is the oracle
        from raygraph.ops.relational import pivot_counts

        cats = ["click", "error", "purchase", "signup", "view"]
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "event_type"])
        wide = pivot_counts(ev, ["user_id"], "event_type", cats)

        def melt(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            out = df.melt(id_vars=["user_id"],
                          value_vars=[f"n_{c}" for c in cats],
                          var_name="event_type", value_name="n")
            out = out[out["n"] > 0].copy()
            out["event_type"] = out["event_type"].str.slice(2)
            out["n"] = out["n"].astype("int64")
            return pa.Table.from_pandas(
                out[["user_id", "event_type", "n"]], preserve_index=False)

        return wide.map_batches(melt, batch_format="pyarrow")

    def docs_lang_share(sf_dir):
        # percent-of-total (ratio-to-report window): per-language share
        # of corpus characters in exact trunc basis points — one
        # lang-keyed combiner preagg, total on the tiny aggregate
        from raygraph.ops.relational import trunc_div

        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["lang", "n_chars"])
        agg = preagg_sum(docs, ["lang"], {"chars": "n_chars"}).to_pandas()
        total = int(agg["chars"].sum())
        agg["share_bp"] = trunc_div(10_000 * agg["chars"].to_numpy(),
                                    np.int64(total))
        agg["chars"] = agg["chars"].astype("int64")
        agg["share_bp"] = agg["share_bp"].astype("int64")
        return agg[["lang", "chars", "share_bp"]]

    def events_props_stats(sf_dir):
        # semi-structured extraction: pull the integer k out of the JSON
        # props string with one vectorized regex per batch, then
        # combiner-preagg sum/max/count per event type
        from ray.data.aggregate import Max, Sum

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "props"])

        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            k = df["props"].str.extract(r'"k":\s*(-?\d+)', expand=False) \
                .astype("float64")
            g = pd.DataFrame({"event_type": df["event_type"], "k": k}) \
                .groupby("event_type", as_index=False) \
                .agg(n_with_k=("k", "count"), sum_k=("k", "sum"),
                     max_k=("k", "max"))
            for c in ("n_with_k", "sum_k", "max_k"):
                g[c] = g[c].fillna(0).astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False)

        return (
            ev.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("n_with_k", alias_name="n_with_k"),
                       Sum("sum_k", alias_name="sum_k"),
                       Max("max_k", alias_name="max_k"))
        )

    def events_top_type(sf_dir):
        # mode per group (most frequent event_type per user, ties → type
        # ASC): combiner preagg counts, then the group-topk reduce at
        # k=1 — never a per-key Python call
        from raygraph.ops.relational import group_topk

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "event_type"])
        counts = preagg_sum(ev, ["user_id", "event_type"], {}, counts="n")
        return group_topk(counts, ["user_id"], "n", 1, tie_col="event_type")

    def docs_tfidf_top3(sf_dir):
        # per-doc top-3 terms by an integer tf-idf (score = tf ×
        # ((N×10^4)//df)): tf explode per batch, document frequency via
        # combiner preagg, tf⋈df met in a hash-shuffle join on token,
        # then the bucketed group-topk per doc — exact integers so the
        # unnest SQL oracle matches bit-for-bit
        from raygraph.ops.relational import (
            coerce_schema,
            compact_nonempty,
            group_topk,
            shuffle_join,
        )

        ds = _docs_ds(sf_dir)
        n_docs = _docs_count(sf_dir)

        def tf_partial(batch: pa.Table) -> pa.Table:
            s = batch.column("text").to_pandas().fillna("")
            ids = batch.column("doc_id").to_pandas()
            ex = s.str.strip().str.lower().str.split().explode().dropna()
            df = pd.DataFrame({"doc_id": ids.loc[ex.index].to_numpy(),
                               "token": ex.to_numpy()})
            g = df.groupby(["doc_id", "token"], as_index=False).size() \
                .rename(columns={"size": "tf"})
            g["tf"] = g["tf"].astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False)

        tf = ds.map_batches(tf_partial, batch_format="pyarrow").materialize()
        dfreq = preagg_sum(tf, ["token"], {}, counts="df")
        dfreq = compact_nonempty(coerce_schema(
            dfreq, pa.schema([("token", pa.string()), ("df", pa.int64())])
        ).materialize())
        joined = shuffle_join(tf, dfreq, on="token")

        def score(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["score"] = df["tf"] * ((n_docs * 10_000) // df["df"])
            return pa.Table.from_pandas(df, preserve_index=False)

        scored = joined.map_batches(score, batch_format="pyarrow")
        return group_topk(scored, ["doc_id"], "score", 3, tie_col="token")

    def media_audio(sf_dir):
        # REAL byte-level audio metadata: each doc wrapped in a valid
        # PCM WAV container (rate/channels derived from doc_id, data =
        # UTF-8 text bytes), and the pure-bytes RIFF walker recovers
        # them — the oracle recomputes everything from the doc columns
        from raygraph.ops.media import audio_metadata, make_wav

        RATES = [8000, 16000, 44100]
        ds = _docs_ds(sf_dir)

        def to_wav(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            payloads = [
                make_wav(RATES[i % 3], 1 + (i % 2), 16, (t or "").encode())
                for i, t in zip(ids, texts)
            ]
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "payload": pa.array(payloads, pa.binary()),
            })

        return audio_metadata(ds.map_batches(to_wav, batch_format="pyarrow"),
                              keep_cols=("doc_id",))

    def embedding_grid_clusters(sf_dir):
        # grid-density clustering (DBSCAN-lite): e6-quantized 2-D
        # cells, core = >= 4 points, 8-neighborhood components via 4
        # min-label rounds — density clusters with NO pairwise
        # distance product (cell-keyed exchanges only)
        from raygraph.ops.cluster import grid_clusters

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        return grid_clusters(emb, cell_e6=50_000, minpts=4, iters=4)

    def embedding_centroids(sf_dir):
        # grouped vector mean (class centroids): per-batch per-dim
        # partial integer sums (values scaled to e6), one (bucket, dim)
        # groupby, floor-divide mean — exact integer end to end, so the
        # unnest-with-ordinality SQL oracle matches bit-for-bit
        from raygraph.ops.vecops import vectors_to_numpy

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])

        def partial(batch: pa.Table) -> pa.Table:
            vecs = vectors_to_numpy(batch.column("embedding"), np.float64)
            # TRUNCATION, not rounding: both engines compute the same
            # double product, and trunc is unambiguous where round's
            # half-even (numpy) vs half-away (SQL) can disagree on an
            # exact .5 product
            e6 = (vecs * 1_000_000).astype("int64")
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            bucket = ids % 10
            n, d = e6.shape
            df = pd.DataFrame({
                "bucket": np.repeat(bucket, d),
                "dim": np.tile(np.arange(d, dtype="int64"), n),
                "sum_e6": e6.reshape(-1),
                "n_vecs": np.ones(n * d, dtype="int64"),
            })
            g = df.groupby(["bucket", "dim"], as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        agg = preagg_sum(emb.map_batches(partial, batch_format="pyarrow"),
                         ["bucket", "dim"],
                         {"sum_e6": "sum_e6", "n_vecs": "n_vecs"})

        def mean(batch: pa.Table) -> pa.Table:
            import pandas as _pd

            df = batch.to_pandas() if not isinstance(batch, _pd.DataFrame) \
                else batch
            df["centroid_e6"] = df["sum_e6"] // df["n_vecs"]
            return pa.Table.from_pandas(
                df[["bucket", "dim", "n_vecs", "centroid_e6"]],
                preserve_index=False)

        return agg.map_batches(mean, batch_format="pyarrow")

    def tpch_q1_full(sf_dir):
        # the full Q1 aggregate set in exact integer arithmetic:
        # disc_price and charge are staged floor-divides (defined spec,
        # overflow-safe at any scale), averages are ×10^4 floor ints
        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "l_discount", "l_tax"],
        )

        def to_ints(batch: pa.Table) -> pa.Table:
            p = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            d = batch.column("l_discount").to_numpy(zero_copy_only=False)
            t = batch.column("l_tax").to_numpy(zero_copy_only=False)
            q = batch.column("l_quantity").to_numpy(zero_copy_only=False)
            cents = np.round(p * 100).astype("int64")
            bp = np.round(d * 10_000).astype("int64")
            tax_bp = np.round(t * 10_000).astype("int64")
            disc = cents * (10_000 - bp) // 10_000
            charge = disc * (10_000 + tax_bp) // 10_000
            return pa.table({
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty_e4": pa.array(np.round(q * 10_000).astype("int64")),
                "base_cents": pa.array(cents),
                "disc_bp": pa.array(bp),
                "disc_price_cents": pa.array(disc),
                "charge_cents": pa.array(charge),
            })

        agg = preagg_sum(
            li.map_batches(to_ints, batch_format="pyarrow"),
            ["l_returnflag", "l_linestatus"],
            {"sum_qty_e4": "qty_e4", "sum_base_cents": "base_cents",
             "sum_disc_price_cents": "disc_price_cents",
             "sum_charge_cents": "charge_cents", "sum_disc_bp": "disc_bp"},
            counts="n_rows",
        )

        def finalize(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["avg_qty_e4"] = df["sum_qty_e4"] // df["n_rows"]
            df["avg_price_cents"] = df["sum_base_cents"] // df["n_rows"]
            df["avg_disc_bp"] = df["sum_disc_bp"] // df["n_rows"]
            return pa.Table.from_pandas(df, preserve_index=False)

        return agg.map_batches(finalize, batch_format="pyarrow")

    # ---- relational / aggregation ---------------------------------------
    def docs_sample_10pct(sf_dir):
        from raygraph.ops.relational import deterministic_sample

        return deterministic_sample(_docs_ds(sf_dir), keep_per_mille=100)

    def docs_by_lang_source(sf_dir):
        ds = _docs_ds(sf_dir, columns=("doc_id", "lang", "source", "n_chars"))
        return preagg_sum(ds, ["lang", "source"], {"total_chars": "n_chars"},
                          counts="n_docs")

    def docs_rollup(sf_dir):
        # GROUP BY ROLLUP(lang, source): ONE corpus pass produces the
        # detail aggregate; the subtotal and grand-total levels roll up
        # from that (aggregate-sized, no second scan) with NULL level
        # markers exactly like SQL ROLLUP
        ds = _docs_ds(sf_dir, columns=("doc_id", "lang", "source"))
        detail = preagg_sum(ds, ["lang", "source"], {}, counts="n_docs") \
            .to_pandas()
        detail["n_docs"] = detail["n_docs"].astype("int64")
        sub = detail.groupby("lang", as_index=False)["n_docs"].sum()
        sub["source"] = None
        tot = pd.DataFrame({"lang": [None], "source": [None],
                            "n_docs": [detail["n_docs"].sum()]})
        out = pd.concat([detail, sub, tot], ignore_index=True)
        out["n_docs"] = out["n_docs"].astype("int64")
        return out[["lang", "source", "n_docs"]]

    def docs_cube(sf_dir):
        # GROUP BY CUBE(lang, source): all four grouping sets from the
        # SAME one-pass detail aggregate (detail is the finest level, so
        # the other three roll up aggregate-sized, no second scan)
        ds = _docs_ds(sf_dir, columns=("doc_id", "lang", "source"))
        detail = preagg_sum(ds, ["lang", "source"], {}, counts="n_docs") \
            .to_pandas()
        detail["n_docs"] = detail["n_docs"].astype("int64")
        by_lang = detail.groupby("lang", as_index=False)["n_docs"].sum()
        by_lang["source"] = None
        by_src = detail.groupby("source", as_index=False)["n_docs"].sum()
        by_src["lang"] = None
        tot = pd.DataFrame({"lang": [None], "source": [None],
                            "n_docs": [detail["n_docs"].sum()]})
        out = pd.concat([detail, by_lang, by_src, tot], ignore_index=True)
        out["n_docs"] = out["n_docs"].astype("int64")
        return out[["lang", "source", "n_docs"]]

    def top_sources_by_chars(sf_dir):
        ds = _docs_ds(sf_dir, columns=("source", "n_chars"))
        agg = preagg_sum(ds, ["source"], {"total_chars": "n_chars"})
        df = agg.to_pandas()
        df = df.sort_values(["total_chars", "source"],
                            ascending=[False, True]).head(10)
        return df.reset_index(drop=True)

    def tpch_pricing_summary(sf_dir):
        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice"],
        )

        def to_cents(batch: pa.Table) -> pa.Table:
            price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            cents = np.round(price * 100).astype("int64")
            return pa.table(
                {
                    "l_returnflag": batch.column("l_returnflag"),
                    "l_linestatus": batch.column("l_linestatus"),
                    "l_quantity": batch.column("l_quantity"),
                    "price_cents": pa.array(cents, pa.int64()),
                }
            )

        return preagg_sum(
            li.map_batches(to_cents, batch_format="pyarrow"),
            ["l_returnflag", "l_linestatus"],
            {"sum_qty": "l_quantity", "sum_price_cents": "price_cents"},
            counts="n_rows",
        )

    def customer_revenue_topk(sf_dir):
        import ray

        orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                 columns=["o_custkey", "o_totalprice"])

        def to_cents(batch: pa.Table) -> pa.Table:
            p = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "o_custkey": batch.column("o_custkey"),
                    "price_cents": pa.array(np.round(p * 100).astype("int64")),
                }
            )

        cust_df = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_name"],
        ).to_pandas().rename(columns={"c_custkey": "o_custkey"})
        joined = broadcast_join(
            orders.map_batches(to_cents, batch_format="pyarrow"), cust_df,
            on="o_custkey",
        )
        agg = preagg_sum(joined, ["o_custkey", "c_name"],
                         {"revenue_cents": "price_cents"}, counts="n_orders")
        df = agg.to_pandas().sort_values(
            ["revenue_cents", "o_custkey"], ascending=[False, True]
        ).head(10)
        df = df.rename(columns={"o_custkey": "c_custkey"})
        return df.reset_index(drop=True)

    def customer_rank_in_nation(sf_dir):
        # RANK() OVER (PARTITION BY nation ORDER BY revenue DESC) as a
        # distributed stage: per-customer revenue via combiner preagg,
        # dim broadcast, then one hash-bucketed vectorized rank pass
        from raygraph.ops.relational import grouped_rank

        orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                 columns=["o_custkey", "o_totalprice"])

        def to_cents(batch: pa.Table) -> pa.Table:
            p = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
            return pa.table({
                "c_custkey": batch.column("o_custkey"),
                "price_cents": pa.array(np.round(p * 100).astype("int64")),
            })

        rev = preagg_sum(orders.map_batches(to_cents, batch_format="pyarrow"),
                         ["c_custkey"], {"rev_cents": "price_cents"})
        cust_df = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_nationkey"],
        ).to_pandas()
        cust_df["c_nationkey"] = cust_df["c_nationkey"].astype("int64")
        joined = broadcast_join(rev, cust_df, on="c_custkey")
        return grouped_rank(joined, ["c_nationkey"], "rev_cents")

    def tpch_q6_revenue(sf_dir):
        # Q6: pure filter + global sum — predicate pushed into the scan
        # batches, exact integer contract (cents × basis points)
        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_shipdate", "l_discount", "l_quantity",
                     "l_extendedprice"],
        )

        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            bp = np.round(df["l_discount"].to_numpy() * 100).astype("int64")
            sd = df["l_shipdate"].astype("datetime64[ns]")
            keep = (
                (sd >= pd.Timestamp("1996-01-01"))
                & (sd < pd.Timestamp("1997-01-01"))
                & (bp >= 5) & (bp <= 7)
                & (df["l_quantity"].to_numpy() < 24)
            )
            cents = np.round(
                df["l_extendedprice"].to_numpy() * 100).astype("int64")
            rev = int((cents[keep.to_numpy()] * bp[keep.to_numpy()]).sum())
            return pa.table({"revenue_cents_bp": pa.array([rev], pa.int64())})

        from raygraph.ops.relational import tree_aggregate

        out = tree_aggregate(
            li.map_batches(partial, batch_format="pyarrow"),
            lambda df: pd.DataFrame(
                {"revenue_cents_bp": [int(df["revenue_cents_bp"].sum())]}
            ),
            precombined=True,
        )
        return out

    def tpch_q3_shipping(sf_dir):
        # Q3: two hash-shuffle joins (customer⋈orders shipped as a
        # broadcast dim; orders⋈lineitem is the big⋈big shuffle), then
        # grouped revenue + global top-10 — exact cents×(100-bp) ints
        from raygraph.ops.relational import shuffle_join

        cutoff = pd.Timestamp("1998-06-15")
        cust = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"],
        ).to_pandas()
        seg_keys = cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"]
        seg = set(seg_keys.tolist())

        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        )

        import ray

        seg_ref = ray.put(seg)

        def ofilter(batch: pa.Table) -> pa.Table:
            import ray as _ray

            s = _ray.get(seg_ref)
            df = batch.to_pandas()
            od = df["o_orderdate"].astype("datetime64[ns]")
            keep = (od < cutoff) & df["o_custkey"].isin(s)
            return pa.Table.from_pandas(
                df.loc[keep, ["o_orderkey", "o_orderdate"]],
                preserve_index=False)

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_shipdate", "l_extendedprice",
                     "l_discount"],
        )

        def lfilter(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            sd = df["l_shipdate"].astype("datetime64[ns]")
            df = df.loc[sd > cutoff]
            cents = np.round(
                df["l_extendedprice"].to_numpy() * 100).astype("int64")
            bp = np.round(df["l_discount"].to_numpy() * 100).astype("int64")
            return pa.Table.from_pandas(
                pd.DataFrame({"l_orderkey": df["l_orderkey"].to_numpy(),
                              "rev": cents * (100 - bp)}),
                preserve_index=False)

        joined = shuffle_join(
            li.map_batches(lfilter, batch_format="pyarrow"),
            orders.map_batches(ofilter, batch_format="pyarrow"),
            on="l_orderkey", right_on="o_orderkey", how="inner",
        )
        agg = preagg_sum(joined, ["l_orderkey", "o_orderdate"],
                         {"revenue_cents_pct": "rev"})
        df = agg.to_pandas().sort_values(
            ["revenue_cents_pct", "l_orderkey"], ascending=[False, True]
        ).head(10).rename(columns={"l_orderkey": "o_orderkey"})
        return df.reset_index(drop=True)

    def tpch_region_revenue(sf_dir):
        # Q5-shape: the two big tables meet in ONE hash-shuffle join
        # (lineitem ⋈ orders on orderkey); all four dimension tables ride
        # along as a single broadcast merge chain inside map_batches.
        # customer is broadcast here for its size in this corpus — at
        # TPC-H scale it becomes a second shuffle_join on o_custkey with
        # a compaction barrier between the two joins.
        from raygraph.ops.relational import shuffle_join

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount"],
        )
        orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                 columns=["o_orderkey", "o_custkey"])
        nli = pq.read_metadata(os.path.join(sf_dir, "lineitem.parquet")).num_rows
        from raygraph.ops.relational import _join_partitions

        j = shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                         num_partitions=_join_partitions(nli))

        import ray

        sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                            columns=["s_suppkey", "s_nationkey"]).to_pandas()
        cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                             columns=["c_custkey", "c_nationkey"]).to_pandas()
        nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                            columns=["n_nationkey", "n_name",
                                     "n_regionkey"]).to_pandas()
        reg = pq.read_table(os.path.join(sf_dir, "region.parquet"),
                            columns=["r_regionkey", "r_name"]).to_pandas()
        dims_ref = ray.put((sup, cust, nat, reg))

        def enrich(batch: pa.Table) -> pa.Table:
            import ray as _ray

            s, c, n, r = _ray.get(dims_ref)
            df = batch.to_pandas()
            df = df.merge(s, left_on="l_suppkey", right_on="s_suppkey")
            df = df.merge(c, left_on="o_custkey", right_on="c_custkey")
            df = df[df["c_nationkey"] == df["s_nationkey"]]
            df = df.merge(n, left_on="s_nationkey", right_on="n_nationkey")
            df = df.merge(r, left_on="n_regionkey", right_on="r_regionkey")
            # exact integers: cents × discount basis points
            pc_ = np.round(df["l_extendedprice"].to_numpy() * 100).astype("int64")
            bp = np.round(df["l_discount"].to_numpy() * 10000).astype("int64")
            out = pd.DataFrame({
                "r_name": df["r_name"], "n_name": df["n_name"],
                "rev": pc_ * (10000 - bp),
            })
            return pa.Table.from_pandas(out, preserve_index=False)

        return preagg_sum(j.map_batches(enrich, batch_format="pyarrow"),
                          ["r_name", "n_name"],
                          {"revenue_micents": "rev"})

    def tpch_order_priority(sf_dir):
        # Q4-shape: late-shipping orders per priority — shuffle join
        # carries (priority, orderdate) onto lineitem, the filter runs
        # vectorized, and the exact two-level distinct count collapses
        # multi-lineitem orders without a per-order Python call
        from raygraph.ops.relational import distinct_count, shuffle_join

        li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=["l_orderkey", "l_shipdate"])
        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        )
        from raygraph.ops.relational import _join_partitions

        nli = pq.read_metadata(os.path.join(sf_dir, "lineitem.parquet")).num_rows
        j = shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                         num_partitions=_join_partitions(nli))

        def late(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.greater(batch.column("l_shipdate"),
                              batch.column("o_orderdate"))
            return batch.filter(keep).select(
                ["o_orderpriority", "l_orderkey"])

        return distinct_count(j.map_batches(late, batch_format="pyarrow"),
                              ["o_orderpriority"], "l_orderkey",
                              out="n_orders")

    def orders_with_returns(sf_dir):
        # distributed EXISTS with a Bloom prefilter: the 128 KiB bitmap
        # of returned-lineitem orderkeys is built in-cluster and
        # broadcast, so the semi join only shuffles probable matches —
        # result is exactly the plain left_semi (join removes the
        # bitmap's false positives)
        from raygraph.ops.sketch import bloom_semi_join

        orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                 columns=["o_orderkey", "o_orderpriority"])
        li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=["l_orderkey", "l_returnflag"])

        def returned(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = batch.filter(pc.equal(batch.column("l_returnflag"), "R"))
            return t.select(["l_orderkey"])

        keys = li.map_batches(returned, batch_format="pyarrow")
        return bloom_semi_join(orders, keys, on="o_orderkey",
                               right_on="l_orderkey")

    def tpch_q5_region_volume(sf_dir):
        # TPC-H Q5 (local supplier volume): the classic multi-way join —
        # two big⋈big hash-shuffle joins (orders⋈customer on custkey,
        # lineitem⋈that on orderkey) with the three dimension sides
        # (supplier→nation, nation⋈region) broadcast as dicts in the
        # task closure; exact integer revenue (cents × (100-disc_pct))
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import (_join_partitions, preagg_sum,
                                             shuffle_join)

        nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
        region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
        ndf = nation.to_pandas().merge(
            region.to_pandas(), left_on="n_regionkey",
            right_on="r_regionkey")
        ndf = ndf[ndf["r_name"] == "EUROPE"]
        nat_name = dict(zip(ndf["n_nationkey"], ndf["n_name"]))
        supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                             columns=["s_suppkey", "s_nationkey"]).to_pandas()
        supp_nat = dict(zip(supp["s_suppkey"], supp["s_nationkey"]))

        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
            filter=(pads.field("o_orderdate") >= pd.Timestamp("1996-01-01"))
            & (pads.field("o_orderdate") < pd.Timestamp("1997-01-01")),
        ).drop_columns(["o_orderdate"])
        cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey", "c_nationkey"])
        nord = pq.read_metadata(
            os.path.join(sf_dir, "orders.parquet")).num_rows
        ord2 = shuffle_join(orders, cust, on="o_custkey",
                            right_on="c_custkey",
                            num_partitions=_join_partitions(nord))
        from raygraph.ops.relational import coerce_schema, compact_nonempty

        ord2 = compact_nonempty(coerce_schema(ord2, pa.schema([
            ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
            ("c_nationkey", pa.int32()),
        ])).materialize())
        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount"],
        )
        j = shuffle_join(li, ord2, on="l_orderkey",
                         right_on="o_orderkey",
                         num_partitions=_join_partitions(nord))

        def finish(batch: pa.Table) -> pa.Table:
            if "c_nationkey" not in batch.schema.names or not batch.num_rows:
                return pa.schema([("n_name", pa.string()),
                                  ("revenue_e4", pa.int64())]).empty_table()
            df = batch.to_pandas()
            s_nat = df["l_suppkey"].map(supp_nat)
            keep = (s_nat == df["c_nationkey"]) & s_nat.isin(nat_name)
            df = df[keep]
            cents = np.round(
                df["l_extendedprice"].to_numpy() * 100).astype("int64")
            pct = np.round(df["l_discount"].to_numpy() * 100).astype("int64")
            rev = cents * (100 - pct)
            out = pd.DataFrame({
                "n_name": df["c_nationkey"].map(nat_name),
                "revenue_e4": rev,
            }).groupby("n_name", as_index=False)["revenue_e4"].sum()
            out["revenue_e4"] = out["revenue_e4"].astype("int64")
            return pa.Table.from_pandas(out, preserve_index=False)

        partials = _repaired(
            j.map_batches(finish, batch_format="pyarrow"),
            pa.schema([("n_name", pa.string()),
                       ("revenue_e4", pa.int64())]))
        return preagg_sum(partials, ["n_name"], {"revenue_e4": "revenue_e4"})

    def customers_without_orders(sf_dir):
        # distributed NOT EXISTS: customers with no high-value order
        # (totalprice > 350k) as a left_anti hash-shuffle join — neither
        # side is collected or broadcast. The filter pushes into the
        # probe-side read; the output is schema-repaired so an empty
        # result still carries its columns.
        import pyarrow.dataset as pads

        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import shuffle_join

        cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey", "c_name", "c_acctbal"])
        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey"],
            filter=pads.field("o_totalprice") > 350_000.0,
        )
        from raygraph.ops.relational import _join_partitions

        ncust = pq.read_metadata(os.path.join(sf_dir, "customer.parquet")).num_rows
        anti = shuffle_join(cust, orders, on="c_custkey",
                            right_on="o_custkey", how="left_anti",
                            num_partitions=_join_partitions(ncust))
        return _repaired(anti, pa.schema([
            ("c_custkey", pa.int64()), ("c_name", pa.string()),
            ("c_acctbal", pa.float64()),
        ]))

    def customer_orders_full(sf_dir):
        # FULL OUTER hash-shuffle join: a customer slice (custkey%3==0)
        # against per-customer order counts — unmatched rows survive on
        # BOTH sides (customers with no orders; order groups outside the
        # slice), the join key coalesced across sides
        import pyarrow.compute as pc

        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import (_join_partitions, preagg_sum,
                                             shuffle_join)

        def slice3(batch: pa.Table) -> pa.Table:
            k = pc.cast(batch.column("c_custkey"), pa.int64())
            keep = pc.equal(pc.subtract(k, pc.multiply(
                pc.divide(k, 3), 3)), 0)
            return batch.filter(keep)

        cust = rd.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"],
        ).map_batches(slice3, batch_format="pyarrow")
        counts = preagg_sum(
            rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                            columns=["o_custkey"]),
            ["o_custkey"], {}, counts="n_orders")
        from raygraph.ops.relational import coerce_schema, compact_nonempty

        counts = compact_nonempty(coerce_schema(counts, pa.schema(
            [("o_custkey", pa.int64()), ("n_orders", pa.int64())]
        )).materialize())
        ncust = pq.read_metadata(
            os.path.join(sf_dir, "customer.parquet")).num_rows
        out = shuffle_join(cust, counts, on="c_custkey",
                           right_on="o_custkey", how="full_outer",
                           num_partitions=_join_partitions(ncust))
        return _repaired(out, pa.schema([
            ("c_custkey", pa.int64()), ("c_mktsegment", pa.string()),
            ("n_orders", pa.int64()),
        ]))

    def docs_except_early(sf_dir):
        # distributed EXCEPT DISTINCT: (lang, source) combinations never
        # seen among the first 50 docs
        import pyarrow.compute as pc

        from raygraph.ops.relational import set_op_distinct

        all_docs = _docs_ds(sf_dir, columns=("doc_id", "lang", "source"))

        def head50(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.less(batch.column("doc_id"), 50))

        early = all_docs.map_batches(head50, batch_format="pyarrow")
        return set_op_distinct(all_docs, early, ["lang", "source"],
                               op="except")

    def docs_intersect_early(sf_dir):
        # distributed INTERSECT DISTINCT over the same slices
        import pyarrow.compute as pc

        from raygraph.ops.relational import set_op_distinct

        all_docs = _docs_ds(sf_dir, columns=("doc_id", "lang", "source"))

        def head50(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.less(batch.column("doc_id"), 50))

        early = all_docs.map_batches(head50, batch_format="pyarrow")
        return set_op_distinct(all_docs, early, ["lang", "source"],
                               op="intersect")

    def lineitem_sort_top100(sf_dir):
        # Ray's native distributed sort (sample-based range exchange)
        # surfaced directly: full ORDER BY price DESC with deterministic
        # (orderkey, linenumber) tie-break, then LIMIT 100 — the global
        # sort is the one wide op the rest of this repo deliberately
        # replaces with value-count shuffles; here it IS the operator
        # under test. Prices carried as exact cents.
        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_linenumber", "l_extendedprice"])

        def cents(batch: pa.Table) -> pa.Table:
            c = np.round(
                batch.column("l_extendedprice").to_numpy() * 100
            ).astype("int64")
            return pa.table({
                "l_orderkey": batch.column("l_orderkey"),
                "l_linenumber": batch.column("l_linenumber"),
                "price_cents": pa.array(c, pa.int64()),
            })

        out = (li.map_batches(cents, batch_format="pyarrow")
               .sort(["price_cents", "l_orderkey", "l_linenumber"],
                     descending=[True, False, False])
               .limit(100))
        return out

    def lineitem_price_histogram(sf_dir):
        # fixed-width profiling histogram over price cents ($1000 bins):
        # per-batch combiner, n_bins-row shuffle
        from raygraph.ops.relational import histogram

        li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=["l_extendedprice"])

        def cents(batch: pa.Table) -> pa.Table:
            c = np.round(
                batch.column("l_extendedprice").to_numpy() * 100
            ).astype("int64")
            return pa.table({"cents": pa.array(c, pa.int64())})

        return histogram(li.map_batches(cents, batch_format="pyarrow"),
                         "cents", lo=0, width=100_000, n_bins=128)

    def orders_checksum(sf_dir):
        # order-invariant table fingerprint: one int64 certifies the
        # whole table (anti-entropy / copy-audit); commutative md5-60
        # row sum, so block layout cannot change it
        from raygraph.ops.relational import table_checksum

        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderstatus"])
        return table_checksum(orders, ["o_orderkey", "o_orderstatus"])

    def lineitem_quantile_bins(sf_dir):
        # equi-depth feature binning (quantile discretizer, 10 bins):
        # exact-integer decile cutpoints from the value-count
        # exchange, broadcast searchsorted assignment, bin-keyed fold
        # — per-bin row count and exact value range
        from raygraph.ops.relational import quantile_bin

        li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=["l_extendedprice"])

        def cents(batch: pa.Table) -> pa.Table:
            p = batch.column("l_extendedprice").to_numpy(
                zero_copy_only=False)
            return pa.table({"price_cents": pa.array(
                np.round(p * 100).astype("int64"))})

        return quantile_bin(
            li.map_batches(cents, batch_format="pyarrow"),
            "price_cents", n_bins=10)

    def lineitem_price_quantiles(sf_dir):
        from raygraph.ops.relational import grouped_quantiles

        li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=["l_returnflag", "l_extendedprice"])

        def cents(batch: pa.Table) -> pa.Table:
            p = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            return pa.table({
                "l_returnflag": batch.column("l_returnflag"),
                "price_cents": pa.array(np.round(p * 100).astype("int64")),
            })

        return grouped_quantiles(li.map_batches(cents, batch_format="pyarrow"),
                                 ["l_returnflag"], "price_cents")

    def lineitem_interval_join(sf_dir):
        # distributed RANGE join (the band join Ray Data's equi-join
        # can't express): promo windows [o_orderdate, +1..14 days)
        # derived from every 97th order, lineitem ship timestamps
        # joined by containment via the tiled plan — intervals
        # replicated to 7-day tiles, facts land in ONE tile, one
        # equi-shuffle, residual filter; then an interval-keyed
        # combiner preagg (matches + exact qty cents)
        from raygraph.ops.relational import interval_join

        DAY = 86_400_000_000
        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderdate"])
        li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=["l_shipdate", "l_quantity"])

        def mk_iv(batch: pa.Table) -> pa.Table:
            k = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
            keep = (k % 97) == 0
            k = k[keep].astype("int64")
            od = batch.column("o_orderdate").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)[keep]
            return pa.table({
                "interval_id": pa.array(k, pa.int64()),
                "lo": pa.array(od, pa.int64()),
                "hi": pa.array(od + DAY * (k % 14 + 1), pa.int64()),
            })

        def mk_fact(batch: pa.Table) -> pa.Table:
            q = batch.column("l_quantity").to_numpy(zero_copy_only=False)
            return pa.table({
                "ts_us": batch.column("l_shipdate").cast(pa.int64()),
                "qty_e2": pa.array(np.rint(q * 100).astype("int64")),
            })

        pairs = interval_join(
            li.map_batches(mk_fact, batch_format="pyarrow"),
            orders.map_batches(mk_iv, batch_format="pyarrow"),
            value_col="ts_us", lo_col="lo", hi_col="hi",
            interval_cols=["interval_id"], fact_cols=["qty_e2"],
            tile_width=7 * DAY)
        return preagg_sum(pairs, ["interval_id"], {"qty_e2": "qty_e2"},
                          counts="n_rows")

    def docs_jaccard_top10(sf_dir):
        # n-gram Jaccard similarity search: word-trigram set of doc 0
        # broadcast once, per-batch partial top-k, exact-integer contract
        t0 = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
        qtext = t0.column("text")[t0.column("doc_id").to_pylist().index(0)] \
            .as_py()
        return D.ngram_jaccard_topk(_docs_ds(sf_dir), qtext, k=10, n=3,
                                    exclude_id=0)

    # ---- events (stream-shaped) -----------------------------------------
    def events_tumbling_1h(sf_dir):
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts", "value"])
        out = E.tumbling_window(ev, window_sec=3600)

        def round_val(batch: pa.Table) -> pa.Table:
            v = np.round(
                batch.column("sum_value").to_numpy(zero_copy_only=False), 4
            )
            return batch.set_column(
                batch.schema.get_field_index("sum_value"), "sum_value",
                pa.array(v, pa.float64()),
            )

        return out.map_batches(round_val, batch_format="pyarrow")

    def events_sessions(sf_dir):
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts"])
        return E.session_counts(ev, gap_sec=1800)

    def events_sessionize_full(sf_dir):
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts"])
        return E.sessionize(ev, gap_sec=1800)

    def events_sessionize_incremental(sf_dir):
        # the STREAMING path: 4 time-ordered micro-batches folded into a
        # per-user open-session state Dataset (ops/stream.py); output is
        # row-identical to the batch sessionize, so it shares its oracle
        from raygraph.ops.stream import sessionize_incremental

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts"])
        return sessionize_incremental(ev, n_micro_batches=4, gap_sec=1800)

    def events_tumbling_incremental(sf_dir):
        # third streaming-fold instance — bounded state: windows close
        # (and leave the state) as soon as the time-ordered micro-batch
        # stream passes their end; the union of per-round closed
        # emissions equals the batch groupby bit-for-bit
        from raygraph.ops.stream import tumbling_counts_incremental

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "ts", "value"])

        def prep(batch: pa.Table) -> pa.Table:
            v = batch.column("value").to_numpy(zero_copy_only=False)
            return pa.table({
                "event_type": batch.column("event_type"),
                "ts": batch.column("ts"),
                "value_e4": pa.array(np.round(v * 10000).astype("int64")),
            })

        out = tumbling_counts_incremental(
            ev.map_batches(prep, batch_format="pyarrow"),
            n_micro_batches=4, window_sec=3600).to_pandas()
        return out.sort_values(["window_start", "event_type"]) \
            .reset_index(drop=True)

    def events_resample_1h(sf_dir):
        # gap-fill resampling: hourly grid per user with the latest
        # value carried forward (LOCF) — per-bucket vectorized grid +
        # searchsorted; ties resolve to the max event_id in both engines
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_id", "user_id", "ts",
                                      "value"])
        return E.resample_locf(ev, grid_us=3_600_000_000)

    def events_value_outliers(sf_dir):
        # data-quality screen: rows outside the per-type Tukey band
        # [p25 − 1.5·IQR, p75 + 1.5·IQR] (exact integer quantiles via
        # the value-count shuffle; the |types|-sized band table is
        # closure-broadcast, the detail pass is one vectorized filter)
        import pyarrow.compute as pc

        from raygraph.ops.relational import grouped_quantiles

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_id", "event_type", "value"])

        def to_e4(batch: pa.Table) -> pa.Table:
            v = batch.column("value").to_numpy(zero_copy_only=False)
            return pa.table({
                "event_id": batch.column("event_id"),
                "event_type": batch.column("event_type"),
                "value_e4": pa.array(np.round(v * 10000).astype("int64")),
            })

        e4 = ev.map_batches(to_e4, batch_format="pyarrow")
        q = grouped_quantiles(e4, ["event_type"], "value_e4",
                              qs=(0.25, 0.75)).to_pandas()
        iqr = q["p75"] - q["p25"]
        lo = dict(zip(q["event_type"], q["p25"] - (3 * iqr) // 2))
        hi = dict(zip(q["event_type"], q["p75"] + (3 * iqr) // 2))

        def flag(batch: pa.Table) -> pa.Table:
            t = batch.column("event_type").to_pandas()
            v = batch.column("value_e4").to_numpy(zero_copy_only=False)
            keep = (v < t.map(lo).to_numpy()) | (v > t.map(hi).to_numpy())
            return batch.filter(pa.array(keep))

        return e4.map_batches(flag, batch_format="pyarrow")

    def events_value_mad(sf_dir):
        # robust scale profiling: per-type median + median absolute
        # deviation, exact integer quantiles — two value-count shuffles
        # (distinct values move, not rows); the |types|-sized median
        # table is closure-broadcast into the deviation pass
        from raygraph.ops.relational import grouped_quantiles

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "value"])

        def to_e4(batch: pa.Table) -> pa.Table:
            v = batch.column("value").to_numpy(zero_copy_only=False)
            return pa.table({
                "event_type": batch.column("event_type"),
                "value_e4": pa.array(np.round(v * 10000).astype("int64")),
            })

        e4 = ev.map_batches(to_e4, batch_format="pyarrow")
        med = grouped_quantiles(e4, ["event_type"], "value_e4",
                                qs=(0.5,)).to_pandas()
        m = dict(zip(med["event_type"], med["p50"]))

        def absdev(batch: pa.Table) -> pa.Table:
            t = batch.column("event_type").to_pandas()
            v = batch.column("value_e4").to_numpy(zero_copy_only=False)
            a = np.abs(v - t.map(m).to_numpy())
            return pa.table({"event_type": batch.column("event_type"),
                             "adev": pa.array(a, pa.int64())})

        mad = grouped_quantiles(e4.map_batches(absdev,
                                               batch_format="pyarrow"),
                                ["event_type"], "adev",
                                qs=(0.5,)).to_pandas()
        out = med.rename(columns={"p50": "med_e4"}).merge(
            mad.rename(columns={"p50": "mad_e4"}), on="event_type")
        out["med_e4"] = out["med_e4"].astype("int64")
        out["mad_e4"] = out["mad_e4"].astype("int64")
        return out.sort_values("event_type").reset_index(drop=True)

    def customer_rfm(sf_dir):
        # RFM segmentation: per-customer recency/frequency/monetary
        # quartile codes — one customer-keyed combiner preagg, three
        # exact quantile-boundary passes (value-count shuffles), one
        # vectorized assignment; output is the segment histogram
        from raygraph.ops.relational import grouped_quantiles

        od = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_orderdate", "o_totalprice"])

        def narrow(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            return pa.Table.from_pandas(pd.DataFrame({
                "o_custkey": df["o_custkey"],
                "day": df["o_orderdate"].astype("datetime64[us]")
                .astype("int64") // 86_400_000_000,
                "cents": np.round(df["o_totalprice"].to_numpy()
                                  * 100).astype("int64"),
            }), preserve_index=False)

        from raygraph.ops.graph import _repaired

        nd = od.map_batches(narrow, batch_format="pyarrow")
        per_cust = _repaired(
            preagg_sum(nd, ["o_custkey"], {"spend_cents": "cents"},
                       counts="n_orders"),
            pa.schema([("o_custkey", pa.int64()),
                       ("spend_cents", pa.int64()),
                       ("n_orders", pa.int64())]))
        last = _repaired(
            nd.groupby("o_custkey").max("day"),
            pa.schema([("o_custkey", pa.int64()),
                       ("max(day)", pa.int64())]))
        per_cust = per_cust.join(last, on=("o_custkey",),
                                 right_on=("o_custkey",), join_type="inner",
                                 num_partitions=8)
        maxd = int(nd.max("day"))

        def with_rec(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["recency"] = maxd - df["max(day)"]
            return pa.Table.from_pandas(
                df[["o_custkey", "recency", "n_orders", "spend_cents"]],
                preserve_index=False)

        pc_ds = per_cust.map_batches(with_rec,
                                     batch_format="pyarrow").materialize()

        def lit(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__g", pa.array(np.zeros(batch.num_rows, dtype="int64")))

        qs = (0.25, 0.5, 0.75)
        bounds = {}
        for col in ("recency", "n_orders", "spend_cents"):
            b = grouped_quantiles(
                pc_ds.map_batches(lit, batch_format="pyarrow"),
                ["__g"], col, qs=qs).to_pandas()
            bounds[col] = b[["p25", "p50", "p75"]].iloc[0] \
                .to_numpy(dtype="int64")

        def assign(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            code = np.zeros(len(df), dtype="int64")
            for col, mult in (("recency", 100), ("n_orders", 10),
                              ("spend_cents", 1)):
                v = df[col].to_numpy("int64")
                q = np.ones(len(df), dtype="int64")
                for bnd in bounds[col]:
                    q += (v > bnd).astype("int64")
                code += mult * q
            out = pd.DataFrame({"o_custkey": df["o_custkey"],
                                "rfm_code": code,
                                "spend_cents": df["spend_cents"]})
            return pa.Table.from_pandas(out, preserve_index=False)

        coded = pc_ds.map_batches(assign, batch_format="pyarrow")
        return preagg_sum(coded, ["rfm_code"],
                          {"sum_spend_cents": "spend_cents"},
                          counts="n_customers")

    def orders_zonemap_prune(sf_dir):
        # lakehouse skip-index: range-cluster orders into date tiles
        # once, build per-file zone maps FROM THE PARQUET FOOTERS (no
        # row scan), answer a year-range aggregate reading only
        # overlapping files — filesystem-level pruning like
        # ann_ivf_persisted, but for a plain range predicate
        from raygraph.maintenance import cluster_table, prune_files

        tdir = os.path.join(
            _TMP, f"orders_tiles_{os.path.basename(sf_dir.rstrip('/'))}")
        if not os.path.isdir(tdir):
            cluster_table(os.path.join(sf_dir, "orders.parquet"),
                          tdir, col="o_orderdate", n_tiles=8)

        lo = int(np.datetime64("1995-01-01", "us").astype("int64"))
        hi = int(np.datetime64("1996-01-01", "us").astype("int64"))
        files, skipped = prune_files(tdir, "o_orderdate", lo, hi - 1)
        assert skipped > 0, "zone maps must actually skip files"
        ds = rd.read_parquet(files)

        def in_range(batch: pa.Table) -> pa.Table:
            us = batch.column("o_orderdate").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            keep = (us >= lo) & (us < hi)
            t = batch.filter(pa.array(keep))
            df = t.to_pandas()
            return pa.Table.from_pandas(pd.DataFrame({
                "o_orderpriority": df["o_orderpriority"],
                "cents": np.round(df["o_totalprice"].to_numpy()
                                  * 100).astype("int64"),
            }), preserve_index=False)

        return preagg_sum(ds.map_batches(in_range, batch_format="pyarrow"),
                          ["o_orderpriority"], {"sum_cents": "cents"},
                          counts="n_orders")

    def kg_edges_jsonl(sf_dir):
        # sink-format parity: the built edge table round-tripped through
        # a JSONL export (write_json -> read_json) must reproduce the
        # kg_edges rows exactly (shared oracle)
        res = _kg_result(sf_dir)
        jdir = os.path.join(_TMP, f"kg_edges_jsonl_{_docs_count(sf_dir)}")
        if not os.path.isdir(jdir):
            rd.read_parquet(res.edges_path,
                            columns=["_from", "pred", "_to"]) \
                .write_json(jdir)
        return rd.read_json(jdir).select_columns(["_from", "pred", "_to"])

    def docs_curation_funnel(sf_dir):
        # the curation pipeline as a funnel: raw -> min-length ->
        # quality-threshold -> exact-dedup survivor counts, each stage a
        # streaming filter over the previous (counts are the only
        # driver-side values)
        docs = _docs_ds(sf_dir)
        raw = docs.count()

        def with_quality(batch: pa.Table) -> pa.Table:
            q = T.quality_score(batch).column("quality")
            return batch.append_column("quality", q).append_column(
                "n_chars", pc.utf8_length(batch.column("text"))
                .cast(pa.int64()))

        staged = docs.map_batches(with_quality,
                                  batch_format="pyarrow").materialize()
        f2 = staged.map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("n_chars"),
                                                100)),
            batch_format="pyarrow").materialize()
        f3 = f2.map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("quality"),
                                                0.5)),
            batch_format="pyarrow").materialize()
        from raygraph.ops.dedup import exact_dedup

        n2, n3 = f2.count(), f3.count()
        n4 = exact_dedup(f3.select_columns(["doc_id", "text"])).count()
        return pd.DataFrame({
            "stage": ["raw", "min_length", "quality", "dedup"],
            "n_docs": pd.array([raw, n2, n3, n4], dtype="int64"),
        })

    def docs_dup_hist(sf_dir):
        # duplicate-cluster-size histogram over the 50%-duplicate
        # corpus: content digests shuffle (never texts), count per
        # digest, then count-of-counts — the dedup telemetry shape
        import hashlib

        doubled = _doubled_docs(sf_dir)

        def digest(batch: pa.Table) -> pa.Table:
            texts = batch.column("text").to_pylist()
            return pa.table({"digest": pa.array(
                [hashlib.md5((t or "").encode()).hexdigest()
                 for t in texts], pa.string())})

        per_text = preagg_sum(
            doubled.map_batches(digest, batch_format="pyarrow"),
            ["digest"], {}, counts="cluster_size")
        return preagg_sum(per_text.select_columns(["cluster_size"]),
                          ["cluster_size"], {}, counts="n_clusters")

    def orders_backlog(sf_dir):
        # interval -> delta-event -> distributed prefix sum: daily open
        # orders (opened at o_orderdate, fulfilled at the order's last
        # shipdate). One big-big shuffle join, day-keyed combiner
        # deltas, then the two-phase ordered scan.
        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import (ordered_prefix_sum,
                                             preagg_extreme,
                                             shuffle_join)

        li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=["l_orderkey", "l_shipdate"])
        od = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_orderdate"])

        def li_days(batch: pa.Table) -> pa.Table:
            d = batch.column("l_shipdate").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False) // 86_400_000_000
            return pa.table({"ok": batch.column("l_orderkey"),
                             "fd": pa.array(d, pa.int64())})

        fulfilled = _repaired(
            preagg_extreme(li.map_batches(li_days,
                                          batch_format="pyarrow"),
                           ["ok"], "fd", how="max", out="fd"),
            pa.schema([("ok", pa.int64()), ("fd", pa.int64())]))

        def od_days(batch: pa.Table) -> pa.Table:
            d = batch.column("o_orderdate").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False) // 86_400_000_000
            return pa.table({"ok2": batch.column("o_orderkey"),
                             "od": pa.array(d, pa.int64())})

        opened = od.map_batches(od_days, batch_format="pyarrow")
        j = _repaired(
            shuffle_join(opened, fulfilled, on="ok2", right_on="ok"),
            pa.schema([("ok2", pa.int64()), ("od", pa.int64()),
                       ("fd", pa.int64())]))

        def deltas(batch: pa.Table) -> pa.Table:
            od_ = batch.column("od").combine_chunks()
            fd_ = batch.column("fd").combine_chunks()
            one = pa.array(np.ones(batch.num_rows, dtype="int64"))
            mone = pa.array(np.full(batch.num_rows, -1, dtype="int64"))
            fd1 = pa.array(fd_.to_numpy(zero_copy_only=False) + 1,
                           pa.int64())
            return pa.table({
                "day": pa.concat_arrays([od_.cast(pa.int64()), fd1]),
                "delta": pa.concat_arrays([one, mone]),
            })

        g = preagg_sum(j.map_batches(deltas, batch_format="pyarrow"),
                       ["day"], {"delta": "delta"})
        scanned = ordered_prefix_sum(g, "day", "delta", n_tiles=16)

        def finish(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["n_open"] = (df["prefix_before"]
                            + df["delta"]).astype("int64")
            return pa.Table.from_pandas(df[["day", "n_open"]],
                                        preserve_index=False)

        return scanned.map_batches(finish, batch_format="pyarrow")

    def docs_schema_evolution(sf_dir):
        # mergeSchema read: a v2 snapshot ADDS quality_tier and drops
        # n_chars; read_union_by_name null-pads both sides and the
        # profile must match DuckDB's UNION ALL BY NAME
        from raygraph.io import read_union_by_name

        v1 = os.path.join(sf_dir, "documents.parquet")
        v2 = os.path.join(_TMP, f"docs_v2_{_docs_count(sf_dir)}")
        if not os.path.isdir(v2):
            def evolve(batch: pa.Table) -> pa.Table:
                ids = batch.column("doc_id") \
                    .to_numpy(zero_copy_only=False)
                tier = np.array(["gold", "silver", "bronze"],
                                dtype=object)[ids % 3]
                return pa.table({
                    "doc_id": pa.array(ids + _OFFSET, pa.int64()),
                    "lang": batch.column("lang"),
                    "quality_tier": pa.array(tier, pa.string()),
                })

            rd.read_parquet(v1, columns=["doc_id", "lang"]) \
                .map_batches(evolve, batch_format="pyarrow") \
                .write_parquet(v2)

        both = read_union_by_name([v1, v2])

        def profile(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            g = df.groupby("lang", sort=False).agg(
                n_docs=("doc_id", "size"),
                n_with_chars=("n_chars", "count"),
                n_with_tier=("quality_tier", "count")).reset_index()
            for c in ("n_docs", "n_with_chars", "n_with_tier"):
                g[c] = g[c].astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False)

        return preagg_sum(both.map_batches(profile,
                                           batch_format="pyarrow"),
                          ["lang"], {"n_docs": "n_docs",
                                     "n_with_chars": "n_with_chars",
                                     "n_with_tier": "n_with_tier"})

    def events_user_deciles(sf_dir):
        # LTV-style segmentation: users bucketed by total value into
        # deciles — per-user combiner sums, exact global decile
        # boundaries (value-count shuffle), then one vectorized
        # assignment pass with the 9 boundary scalars closure-broadcast
        from raygraph.ops.relational import grouped_quantiles

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "value"])

        def to_e4(batch: pa.Table) -> pa.Table:
            v = batch.column("value").to_numpy(zero_copy_only=False)
            return pa.table({
                "user_id": batch.column("user_id"),
                "value_e4": pa.array(np.round(v * 10000).astype("int64")),
            })

        totals = preagg_sum(ev.map_batches(to_e4, batch_format="pyarrow"),
                            ["user_id"], {"total_e4": "value_e4"})

        def lit(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__g", pa.array(np.zeros(batch.num_rows, dtype="int64")))

        qs = tuple(q / 10 for q in range(1, 10))
        b = grouped_quantiles(totals.map_batches(lit,
                                                 batch_format="pyarrow"),
                              ["__g"], "total_e4", qs=qs).to_pandas()
        bounds = b[[f"p{q}0" for q in range(1, 10)]].iloc[0] \
            .to_numpy(dtype="int64")

        def assign(batch: pa.Table) -> pa.Table:
            t = batch.column("total_e4").to_numpy(zero_copy_only=False)
            d = (t[:, None] > bounds[None, :]).sum(axis=1)
            return pa.table({
                "decile": pa.array(d.astype("int64")),
                "total_e4": batch.column("total_e4"),
            })

        return preagg_sum(totals.map_batches(assign,
                                             batch_format="pyarrow"),
                          ["decile"], {"sum_value_e4": "total_e4"},
                          counts="n_users")

    def events_type_overlap(sf_dir):
        # cohort-overlap matrix: exact distinct users per unordered
        # event-type pair — one user-bucketed shuffle (a user's type set
        # self-merges in its bucket) + a |types|²-sized final aggregate
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "event_type"])
        return E.type_overlap(ev)

    def events_rolling_1h(sf_dir):
        # RANGE window function (rolling 1-hour per-user count + sum,
        # peers-inclusive SQL frame semantics) — hash-bucketed, one
        # mergesort + searchsorted prefix-sum diff per bucket; exact
        # int64 fixed-point sums so the window oracle matches bitwise
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_id", "user_id", "ts", "value"])
        return E.rolling_window(ev, window_us=3_600_000_000)

    def events_asof_join(sf_dir):
        # each event picks the latest prior "mark" (events landing on a
        # 10-second epoch boundary, deduped per (user, ts)) of the same
        # user — backward as-of semantics, DuckDB ASOF JOIN as the oracle
        from raygraph.ops.events import asof_join
        from raygraph.ops.relational import hash_aggregate

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts", "value"])

        def marks(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            us = pc.cast(pc.cast(batch.column("ts"), pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            keep = (us // 1_000_000) % 10 == 0
            return batch.filter(pa.array(keep))

        right = hash_aggregate(
            rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts", "value"])
            .map_batches(marks, batch_format="pyarrow"),
            ["user_id", "ts"],
            lambda df: df.groupby(["user_id", "ts"], as_index=False)
            ["value"].max(),
        )
        return asof_join(ev, right)

    def events_asof_incremental(sf_dir):
        # the 4th streaming-fold instance: stream-stream as-of join over
        # ts-ordered micro-batches — O(#keys) carried state (latest
        # right per key), every left emits in its own round; output is
        # row-identical to the batch as-of join (shared oracle)
        from raygraph.ops.relational import hash_aggregate
        from raygraph.ops.stream import asof_join_incremental

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts", "value"])

        def marks(batch: pa.Table) -> pa.Table:
            us = batch.column("ts").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            keep = (us // 1_000_000) % 10 == 0
            return batch.filter(pa.array(keep))

        right = hash_aggregate(
            rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts", "value"])
            .map_batches(marks, batch_format="pyarrow"),
            ["user_id", "ts"],
            lambda df: df.groupby(["user_id", "ts"], as_index=False)
            ["value"].max(),
        )
        return asof_join_incremental(ev, right, n_micro_batches=4)

    def events_asof_forward(sf_dir):
        # forward as-of: each event picks the EARLIEST mark at-or-after
        # it — the "next scheduled checkpoint" lookup; same bucketed
        # merge_asof plan, direction flipped, DuckDB ASOF (l.ts <= r.ts)
        # as the oracle
        from raygraph.ops.events import asof_join
        from raygraph.ops.relational import hash_aggregate

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts", "value"])

        def marks(batch: pa.Table) -> pa.Table:
            us = batch.column("ts").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            keep = (us // 1_000_000) % 10 == 0
            return batch.filter(pa.array(keep))

        right = hash_aggregate(
            rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                            columns=["user_id", "ts", "value"])
            .map_batches(marks, batch_format="pyarrow"),
            ["user_id", "ts"],
            lambda df: df.groupby(["user_id", "ts"], as_index=False)
            ["value"].max(),
        )
        return asof_join(ev, right, direction="forward")

    def events_conversion_time(sf_dir):
        # funnel latency: per converted user the gap from FIRST signup
        # to the first purchase at-or-after it; exact integer-second
        # p50/p90 via the value-count quantile machinery. The signup
        # map is user-sized → closure-broadcast, not shuffled.
        from raygraph.ops.relational import grouped_quantiles

        ev = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_type"])

        su = ev.map_batches(
            lambda b: b.filter(pc.equal(b.column("event_type"),
                                        "signup")),
            batch_format="pyarrow").groupby("user_id").min("ts") \
            .to_pandas()
        s_us = dict(zip(su["user_id"],
                        su["min(ts)"].astype("datetime64[us]")
                        .astype("int64")))

        def gaps(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch.column("event_type"),
                                      "purchase"))
            df = t.to_pandas()
            us = df["ts"].astype("datetime64[us]").astype("int64")
            start = df["user_id"].map(s_us)
            ok = start.notna() & (us >= start)
            out = pd.DataFrame({
                "user_id": df["user_id"][ok],
                "gap_us": (us[ok] - start[ok]).astype("int64"),
            })
            return pa.Table.from_pandas(out, preserve_index=False)

        per_user = ev.map_batches(gaps, batch_format="pyarrow") \
            .groupby("user_id").min("gap_us")

        def to_secs(batch: pa.Table) -> pa.Table:
            g = batch.column("min(gap_us)").to_numpy(zero_copy_only=False)
            return pa.table({
                "__g": pa.array(np.zeros(len(g), dtype="int64")),
                "gap_s": pa.array(g // 1_000_000, pa.int64()),
            })

        gds = per_user.map_batches(to_secs,
                                   batch_format="pyarrow").materialize()
        n = gds.count()
        q = grouped_quantiles(gds, ["__g"], "gap_s",
                              qs=(0.5, 0.9)).to_pandas()
        return pd.DataFrame({
            "n_converted": pd.array([n], dtype="int64"),
            "p50_s": pd.array([int(q["p50"].iloc[0])], dtype="int64"),
            "p90_s": pd.array([int(q["p90"].iloc[0])], dtype="int64"),
        })

    def events_hopping(sf_dir):
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts", "value"])
        out = E.hopping_window(ev, window_sec=3600, hop_sec=1800)

        def round_val(batch: pa.Table) -> pa.Table:
            v = np.round(
                batch.column("sum_value").to_numpy(zero_copy_only=False), 4
            )
            return batch.set_column(
                batch.schema.get_field_index("sum_value"), "sum_value",
                pa.array(v, pa.float64()),
            )

        return out.map_batches(round_val, batch_format="pyarrow")

    def events_running_sum(sf_dir):
        # per-user running sum — SUM() OVER (PARTITION BY … ORDER BY …)
        # as a hash-bucketed vectorized stage; (ts, event_id) ordering
        # fixes the float accumulation order so it's bit-identical to
        # the SQL window oracle
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts", "value", "event_id"])
        return E.running_sum(ev)

    def events_gaps(sf_dir):
        # per-user inter-event gap stats — LAG() OVER (PARTITION BY user
        # ORDER BY ts, event_id) folded into its per-key aggregate;
        # exact int64 microseconds, bit-identical to the window oracle
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts", "event_id"])
        return E.event_gaps(ev)

    def events_interval_join(sf_dir):
        # broadcast interval join: per-event-type intervals
        # [min_ts, min_ts + 1 day) — overlapping, so events fan out to
        # every containing interval; the intervals are computed
        # DISTRIBUTED (preagg min per type) and only the tiny interval
        # table ships via ray.put
        from raygraph.ops.relational import (
            interval_join_broadcast,
            preagg_extreme,
            preagg_sum,
        )

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "ts", "value"])
        iv = preagg_extreme(
            ev.select_columns(["event_type", "ts"]), ["event_type"], "ts",
            how="min", out="lo",
        ).to_pandas()
        iv = iv.rename(columns={"event_type": "iv_type"})
        iv["hi"] = iv["lo"] + pd.Timedelta(days=1)

        def to_e4(batch: pa.Table) -> pa.Table:
            v = batch.column("value").to_numpy(zero_copy_only=False)
            return pa.table({
                "ts": batch.column("ts"),
                "value_e4": pa.array(np.round(v * 10000).astype("int64")),
            })

        joined = interval_join_broadcast(
            ev.map_batches(to_e4, batch_format="pyarrow"), iv, "ts")
        return preagg_sum(joined, ["iv_type", "lo", "hi"],
                          {"sum_value_e4": "value_e4"}, counts="n_events")

    def events_distinct_users(sf_dir):
        from raygraph.ops.relational import distinct_count

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "user_id"])
        return distinct_count(ev, ["event_type"], "user_id", out="n_users")

    def events_distinct_users_incremental(sf_dir):
        # the streaming fold's second instance: running exact distinct
        # per type over 4 micro-batches (state = distinct pair Dataset);
        # equals the batch distinct_count, so it shares the oracle
        from raygraph.ops.stream import distinct_count_incremental

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "user_id", "ts"])
        return distinct_count_incremental(ev, n_micro_batches=4)

    def events_approx_users(sf_dir):
        # the sketch path for the same question: HLL caps the shuffle at
        # 64 registers per group; integer spec ⇒ the SQL oracle
        # recomputes the estimate bit-for-bit
        from raygraph.ops.sketch import hll_distinct

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "user_id"])
        return hll_distinct(ev, ["event_type"], "user_id")

    def dedup_winnow_pairs(sf_dir):
        # MOSS-style near-dup pairs by shared winnowing fingerprints
        # over the doubled corpus: deterministic recall (the winnowing
        # guarantee) where band-LSH is probabilistic; one pair-hash
        # exchange + fp-bucket pairing + one pair-count combiner
        from raygraph.ops.dedup import winnow_dup_pairs

        return winnow_dup_pairs(_doubled_docs(sf_dir), min_shared=3)

    def docs_containment_pairs(sf_dir):
        # ASYMMETRIC near-dup (quote/subsumption, Broder 1997
        # containment |A∩B|/|A|): corpus = documents ∪ 8-word prefix
        # snippets of every 7th doc (id + 10⁸) — low-Jaccard pairs the
        # symmetric ops miss, containment ≈ 1 on the snippet side.
        # Shared-trigram blocking (deterministic recall, pair-capped)
        # → in-cluster text attach → exact integer verify
        from raygraph.ops.dedup import containment_pairs

        ds = _docs_ds(sf_dir)

        def snippets(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df = df[df["doc_id"] % 7 == 0].copy()
            toks = df["text"].fillna("").str.strip().str.lower() \
                .str.split()
            df["text"] = toks.str[:8].str.join(" ")
            df["doc_id"] = (df["doc_id"] + 100_000_000).astype("int64")
            return pa.Table.from_pandas(df[["doc_id", "text"]],
                                        preserve_index=False)

        corpus = ds.union(
            ds.map_batches(snippets, batch_format="pyarrow"))
        return containment_pairs(corpus, threshold_e6=800_000, n=3)

    def docs_line_dedup(sf_dir):
        # CCNet-style cross-doc LINE dedup (removal + reassembly):
        # corpus = 3 lines per doc — the original text, a footer
        # (shared boilerplate on every 3rd doc, in two case/space
        # variants that normalize equal), a tail (shared banner on
        # every 5th doc). Boilerplate lines (>= 2 distinct docs after
        # strip+lower) drop from every doc; unique lines survive.
        from raygraph.ops.dedup import line_dedup

        def widen(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            ids = df["doc_id"].astype("int64")
            sid = ids.astype(str)
            footer = pd.Series(
                np.where(ids % 3 == 0,
                         np.where(ids % 2 == 0,
                                  "Subscribe to our Newsletter",
                                  "subscribe to our newsletter "),
                         "unique footer " + sid),
                index=df.index)
            tail = pd.Series(
                np.where(ids % 5 == 0, "COOKIE notice: accept all",
                         "tail " + sid), index=df.index)
            df["text"] = (df["text"].fillna("") + "\n" + footer
                          + "\n" + tail)
            return pa.Table.from_pandas(df[["doc_id", "text"]],
                                        preserve_index=False)

        corpus = _docs_ds(sf_dir).map_batches(
            widen, batch_format="pyarrow")
        return line_dedup(corpus, min_df=2)

    def docs_incremental_dedup(sf_dir):
        # cross-epoch exact dedup against a PERSISTED hash index (the
        # daily-crawl-increment pattern): epoch 0 = even doc_ids build
        # the index, epoch 1 = odd doc_ids dedup within themselves AND
        # against it without rescanning the base. Fresh index dir per
        # call — deterministic, no cache-sentinel hazards.
        import shutil
        import tempfile

        from raygraph.ops.dedup import exact_dedup_incremental

        ds = _docs_ds(sf_dir)

        def half(parity):
            def fn(batch: pa.Table) -> pa.Table:
                ids = batch.column("doc_id")
                return batch.filter(pc.equal(
                    pc.bit_wise_and(ids, 1), parity))
            return fn

        idx = tempfile.mkdtemp(prefix="raygraph_incdedup_")
        try:
            exact_dedup_incremental(
                ds.map_batches(half(0), batch_format="pyarrow"), idx)
            surv, _ = exact_dedup_incremental(
                ds.map_batches(half(1), batch_format="pyarrow"), idx)
            return surv.to_pandas()
        finally:
            shutil.rmtree(idx, ignore_errors=True)

    def docs_minhash_incremental(sf_dir):
        # cross-epoch NEAR-dup dedup against a persisted LSH band
        # index: base epoch = even doc_ids; delta = odd doc_ids ∪
        # copies of every 4th doc (+OFFSET, text known to the index →
        # dropped by the cross-epoch verify) ∪ copies of doc_id%4==1
        # (+2·OFFSET, within-delta dups → min-id survivor). On this
        # corpus verified near-dups are exactly the text-equal pairs
        # (the dedup_minhash_survivors convention), so the oracle
        # replays with text equality.
        import shutil
        import tempfile

        from raygraph.ops.dedup import minhash_dedup_incremental

        ds = _docs_ds(sf_dir)

        def even(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id")
            return batch.filter(pc.equal(pc.bit_wise_and(ids, 1), 0))

        def delta_part(mod4, off):
            def fn(batch: pa.Table) -> pa.Table:
                ids = batch.column("doc_id")
                keep = batch.filter(
                    pc.equal(pc.bit_wise_and(ids, 3), mod4))
                return pa.table({
                    "doc_id": pc.add(keep.column("doc_id"), off),
                    "text": keep.column("text")})
            return fn

        def odd(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id")
            return batch.filter(pc.equal(pc.bit_wise_and(ids, 1), 1))

        delta = ds.map_batches(odd, batch_format="pyarrow").union(
            ds.map_batches(delta_part(0, _OFFSET),
                           batch_format="pyarrow"),
            ds.map_batches(delta_part(1, 2 * _OFFSET),
                           batch_format="pyarrow"))

        # threshold/shingle per the dedup_minhash_survivors convention:
        # char 5-grams saturate on this small-vocab corpus, word
        # 5-windows at 0.99 merge only exact copies
        idx = tempfile.mkdtemp(prefix="raygraph_incmh_")
        try:
            minhash_dedup_incremental(
                ds.map_batches(even, batch_format="pyarrow"), idx,
                threshold=0.99, bands=8, shingle="word")
            surv, _ = minhash_dedup_incremental(
                delta, idx, threshold=0.99, bands=8, shingle="word")
            return surv.to_pandas()
        finally:
            shutil.rmtree(idx, ignore_errors=True)

    def dedup_minhash_grouped(sf_dir):
        # group-scoped near-dedup (dedup within a language, never
        # across): corpus = documents ∪ copies(+OFFSET) where even-id
        # copies keep their lang (in-group dup → dropped) and odd-id
        # copies get lang||'_x' (cross-group → must survive). The
        # group is an exact extra LSH bucket key, not a hash fold.
        import raygraph.ops.dedup as D

        ds = _docs_ds(sf_dir, columns=("doc_id", "text", "lang"))

        def copies(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id")
            lang = batch.column("lang").to_pandas()
            odd = pc.bit_wise_and(ids, 1).to_pandas().astype(bool)
            lang = lang.where(~odd, lang + "_x")
            return pa.table({
                "doc_id": pc.add(ids, _OFFSET),
                "text": batch.column("text"),
                "lang": pa.array(lang, pa.string())})

        corpus = ds.union(ds.map_batches(copies, batch_format="pyarrow"))
        return D.minhash_dedup(corpus, threshold=0.99, bands=8,
                               shingle="word", group_col="lang")

    def dedup_exact_grouped(sf_dir):
        # group-scoped exact dedup: same corpus construction as
        # dedup_minhash_grouped (even-id copies keep lang, odd-id
        # copies get lang||'_x'); the group folds into the content
        # hash, so equal texts across groups keep separate reps
        import raygraph.ops.dedup as D

        ds = _docs_ds(sf_dir, columns=("doc_id", "text", "lang"))

        def copies(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id")
            lang = batch.column("lang").to_pandas()
            odd = pc.bit_wise_and(ids, 1).to_pandas().astype(bool)
            lang = lang.where(~odd, lang + "_x")
            return pa.table({
                "doc_id": pc.add(ids, _OFFSET),
                "text": batch.column("text"),
                "lang": pa.array(lang, pa.string())})

        corpus = ds.union(ds.map_batches(copies, batch_format="pyarrow"))
        return D.exact_dedup(corpus, group_col="lang")

    def docs_line_dedup_grouped(sf_dir):
        # per-DOMAIN boilerplate removal: the df count and the drop
        # are scoped to lang. Corpus: 3 lines per doc — text, a
        # per-lang shared footer on even ids (drops within its lang),
        # a rare global banner on doc_id%50==0 (drops only where >= 2
        # docs of the SAME lang carry it).
        from raygraph.ops.dedup import line_dedup

        def widen(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            ids = df["doc_id"].astype("int64")
            sid = ids.astype(str)
            footer = pd.Series(
                np.where(ids % 2 == 0, "shared " + df["lang"],
                         "only " + sid), index=df.index)
            tail = pd.Series(
                np.where(ids % 50 == 0, "rare global banner",
                         "tail " + sid), index=df.index)
            df["text"] = (df["text"].fillna("") + "\n" + footer
                          + "\n" + tail)
            return pa.Table.from_pandas(
                df[["doc_id", "text", "lang"]], preserve_index=False)

        corpus = _docs_ds(sf_dir, columns=("doc_id", "text", "lang")) \
            .map_batches(widen, batch_format="pyarrow")
        return line_dedup(corpus, min_df=2, group_col="lang")

    def docs_stump(sf_dir):
        # one CART split (exact-integer Gini): is doc length predictive
        # of lang == 'en'? Exchange = combiner preagg keyed by distinct
        # length; prefix-sum argmax on the bounded grid
        from raygraph.ops.classify import fit_stump

        docs = _docs_ds(sf_dir, columns=("text", "lang"))

        def fx(batch: pa.Table) -> pa.Table:
            t = batch.column("text").to_pandas().fillna("")
            lang = batch.column("lang").to_pandas()
            return pa.table({
                "x": pa.array(t.str.len().astype("int64")),
                "y": pa.array((lang == "en").astype("int64")),
            })

        return fit_stump(docs.map_batches(fx, batch_format="pyarrow"),
                         "x", "y")

    def events_target_encode(sf_dir):
        # smoothed target encoding (Micci-Barreca 2001): the categorical
        # feature for tabular models; one category-keyed combiner
        # exchange, Python-int products at the bounded finalize
        from raygraph.ops.relational import target_encode

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "value"])
        return target_encode(ev, ["event_type"], "value", m=10)

    def docs_kfold(sf_dir):
        # deterministic content-keyed k-fold split (fold = md5(doc_id)
        # % 5 — same rows in the same fold at ANY parallelism or epoch;
        # the cross-validation splitter of a training pipeline);
        # reported as per-fold counts + char volume
        from raygraph.ops.relational import preagg_sum

        docs = _docs_ds(sf_dir)

        def tag(batch: pa.Table) -> pa.Table:
            import hashlib as _h

            ids = batch.column("doc_id").to_pandas()
            folds = ids.map(lambda i: int(
                _h.md5(str(i).encode()).hexdigest()[:15], 16) % 5)
            t = batch.column("text").to_pandas().fillna("")
            return pa.table({
                "fold": pa.array(folds.astype("int64")),
                "n_chars": pa.array(t.str.len().astype("int64")),
            })

        return preagg_sum(docs.map_batches(tag, batch_format="pyarrow"),
                          ["fold"], {"sum_chars": "n_chars"},
                          counts="n_docs")

    def docs_dedup_safe_split(sf_dir):
        # leakage-free k-fold over the 50%-duplicate corpus: the fold
        # is a pure function of CONTENT (md5(text) % 5 — zero
        # exchange), so every exact-dup pair lands in one fold and can
        # never straddle train/eval (Lee et al. 2021 §6's leakage)
        from raygraph.ops.dedup import dedup_safe_kfold

        return dedup_safe_kfold(_doubled_docs(sf_dir), k=5)

    def ann_rrf_top10(sf_dir):
        # hybrid retrieval: reciprocal-rank fusion of the exact-dot leg
        # and the SQ8-quantized leg (each leg a distributed top-k; the
        # fusion runs on the two Q·k final lists)
        from raygraph.ops.ann import (batch_topk, quantized_batch_topk,
                                      rrf_fuse)

        qtab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])
        qdf = qtab.to_pandas()
        qdf = qdf[qdf["vec_id"] < 8].sort_values("vec_id")
        queries = np.stack(qdf["embedding"].map(np.asarray).to_numpy())
        qids = qdf["vec_id"].tolist()
        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        truth = batch_topk(emb, queries, qids, k=10, round_dp=4,
                           metric="dot").to_pandas()
        cand = quantized_batch_topk(emb, queries, qids, k=10).to_pandas()
        return rrf_fuse([(truth, "cosine"), (cand, "qdot")], k=10)

    def events_kmv_users(sf_dir):
        # the bottom-k counterpart: k int64 hashes per group instead of
        # 64 HLL registers, and the sketch doubles as a coordinated
        # distinct-value sample; integer spec ⇒ bit-for-bit SQL replay
        from raygraph.ops.sketch import kmv_distinct

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "user_id"])
        return kmv_distinct(ev, ["event_type"], "user_id", k=32)

    # ---- embeddings / ANN ------------------------------------------------
    def ann_top10(sf_dir):
        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        qtab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])
        row0 = qtab.column("vec_id").to_pylist().index(0)
        q = np.array(qtab.column("embedding")[row0].as_py(), dtype=np.float64)
        return brute_force_topk(emb, q, k=10, dtype=np.float64, round_dp=4)

    def ann_filtered_top10(sf_dir):
        # FILTERED vector search (the vector-DB predicate+ANN compose):
        # top-10 by cosine among label = 1 only — the filter pushes into
        # the stream BEFORE the scoring scan, so pruned rows never cost
        # a dot product
        import pyarrow.compute as pc

        emb = rd.read_parquet(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding", "label"])
        qtab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])
        row0 = qtab.column("vec_id").to_pylist().index(0)
        q = np.array(qtab.column("embedding")[row0].as_py(),
                     dtype=np.float64)
        flt = emb.map_batches(
            lambda b: b.filter(pc.equal(b.column("label"), 1))
            .select(["vec_id", "embedding"]),
            batch_format="pyarrow")
        return brute_force_topk(flt, q, k=10, dtype=np.float64,
                                round_dp=4)

    def embedding_argmax(sf_dir):
        # vector-column kernel op: per vector, the argmax dimension and
        # its value at 4dp — one zero-copy reshape + numpy argmax per
        # batch, no shuffle
        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])

        def am(batch: pa.Table) -> pa.Table:
            from raygraph.ops.vecops import vectors_to_numpy

            m = vectors_to_numpy(batch.column("embedding"), np.float64)
            d = m.argmax(axis=1).astype("int64")
            v = np.round(m[np.arange(len(m)), d], 4)
            return pa.table({
                "vec_id": batch.column("vec_id"),
                "dim": pa.array(d, pa.int64()),
                "value": pa.array(v, pa.float64()),
            })

        return emb.map_batches(am, batch_format="pyarrow")

    def ann_ivf_persisted(sf_dir):
        # build-once/query-many: persist the IVF index (hive cell=
        # partition dirs + centroid parquet), query via filesystem-level
        # partition pruning; full probe == exact top-k (shared oracle)
        import tempfile

        from raygraph.ops.ann import ivf_build, ivf_query

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        qtab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])
        row0 = qtab.column("vec_id").to_pylist().index(0)
        q = np.array(qtab.column("embedding")[row0].as_py(),
                     dtype=np.float64)
        idx = tempfile.mkdtemp(prefix="ivf_idx_")
        ivf_build(emb, idx, n_centroids=16)
        return ivf_query(idx, q, k=10, nprobe=16, dtype=np.float64,
                         round_dp=4)

    def ann_ivf_top10(sf_dir):
        # IVF with nprobe == n_centroids scans every cell and must equal
        # exact top-k — the oracle-able IVF contract; partial-probe recall
        # is pinned in tests/test_ann.py
        from raygraph.ops.ann import ivf_topk

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        qtab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])
        row0 = qtab.column("vec_id").to_pylist().index(0)
        q = np.array(qtab.column("embedding")[row0].as_py(), dtype=np.float64)
        return ivf_topk(emb, q, k=10, n_centroids=16, nprobe=16,
                        dtype=np.float64, round_dp=4)

    def ann_self_join(sf_dir):
        # kNN self-join: every vector's nearest neighbor by cosine —
        # corpus matrix broadcast once, one matmul per batch; ranking by
        # 4dp-rounded cosine + smallest id so the SQL oracle agrees
        from raygraph.ops.ann import knn_self_join

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        return knn_self_join(emb)

    def embedding_knn_components(sf_dir):
        # embedding cluster discovery: 1-NN graph (broadcast matmul) ->
        # 5-round min-label propagation — the near-dup clustering scale
        # path (kNN edges instead of O(n^2) pair lists)
        import pyarrow.compute as pc
        from raygraph.ops.ann import knn_self_join
        from raygraph.ops.graph import connected_components

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        nn = knn_self_join(emb)

        def to_edges(batch: pa.Table) -> pa.Table:
            return pa.table({
                "_from": pc.binary_join_element_wise(
                    "v", batch.column("vec_id").cast(pa.string()), ""),
                "_to": pc.binary_join_element_wise(
                    "v", batch.column("nn_id").cast(pa.string()), ""),
            })

        return connected_components(
            nn.map_batches(to_edges, batch_format="pyarrow"), iters=5)

    def embedding_outliers(sf_dir):
        # centroid-distance outliers in exact integers: components
        # quantized to e6 (the embedding_centroids discipline), global
        # centroid = per-dim integer floor-mean (dims-sized aggregate),
        # then per-batch integer distance^2 partials + a driver top-10
        from raygraph.ops.vecops import vectors_to_numpy

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])

        def dim_sums(batch: pa.Table) -> pa.Table:
            x = np.trunc(vectors_to_numpy(batch.column("embedding"),
                                          np.float64) * 1_000_000) \
                .astype("int64")
            return pa.table({
                "dim": pa.array(np.arange(x.shape[1]), pa.int64()),
                "s": pa.array(x.sum(axis=0), pa.int64()),
                "n": pa.array(np.full(x.shape[1], len(x)), pa.int64()),
            })

        agg = preagg_sum(emb.map_batches(dim_sums,
                                         batch_format="pyarrow"),
                         ["dim"], {"s": "s", "n": "n"}).to_pandas() \
            .sort_values("dim")
        cent = np.floor(agg["s"].to_numpy("int64").astype("float64")
                        / agg["n"].to_numpy("int64")).astype("int64")

        def d2_partial(batch: pa.Table) -> pa.Table:
            x = np.trunc(vectors_to_numpy(batch.column("embedding"),
                                          np.float64) * 1_000_000) \
                .astype("int64")
            d2 = ((x - cent) ** 2).sum(axis=1)
            top = np.argsort(-d2, kind="stable")[:10]
            return pa.table({
                "vec_id": batch.column("vec_id").take(
                    pa.array(top, pa.int64())),
                "d2_e12": pa.array(d2[top], pa.int64()),
            })

        parts = emb.map_batches(d2_partial,
                                batch_format="pyarrow").to_pandas()
        return parts.sort_values(["d2_e12", "vec_id"],
                                 ascending=[False, True]).head(10) \
            .reset_index(drop=True)

    def events_seq_regex(sf_dir):
        # sequence-pattern cohort: users whose event-initial string
        # matches s[cv]*p (signup -> only clicks/views -> purchase);
        # per-user fold in one key-hash pass, compiled regex vectorized
        import re

        from raygraph.ops.relational import hash_aggregate

        ev = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "event_type"])
        pat = re.compile(r"s[cv]*p")

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["user_id", "ts", "event_id"],
                                kind="mergesort")
            seqs = df.assign(i=df["event_type"].str[0]) \
                .groupby("user_id", sort=False)["i"].agg("".join)
            m = seqs.str.contains(pat).astype("int64")
            return pd.DataFrame({"n_users": [len(seqs)],
                                 "n_matching": [int(m.sum())]})

        parts = hash_aggregate(ev, ["user_id"], fold).to_pandas()
        return pd.DataFrame({
            "n_users": pd.array([int(parts["n_users"].sum())],
                                dtype="int64"),
            "n_matching": pd.array([int(parts["n_matching"].sum())],
                                   dtype="int64"),
        })

    def events_user_entropy(sf_dir):
        # behavioral diversity per user: event-type entropy in the
        # per-term-floor integer discipline (order-free sums)
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "event_type"])
        c = preagg_sum(ev, ["user_id", "event_type"], {},
                       counts="n").to_pandas()
        tot = c.groupby("user_id")["n"].transform("sum")
        terms = np.floor(
            (1_000_000 * c["n"]).astype("float64")
            * np.log(tot.astype("float64") / c["n"].astype("float64"))
            / tot.astype("float64")).astype("int64")
        out = (pd.DataFrame({"user_id": c["user_id"], "t": terms})
               .groupby("user_id", sort=True)["t"].sum()
               .reset_index(name="h_e6"))
        ntypes = c.groupby("user_id", sort=True).size() \
            .reset_index(name="n_types")
        out = out.merge(ntypes, on="user_id")
        out["h_e6"] = out["h_e6"].astype("int64")
        out["n_types"] = out["n_types"].astype("int64")
        return out

    def embedding_norms(sf_dir):
        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])

        def norms(batch: pa.Table) -> pa.Table:
            from raygraph.ops.vecops import vectors_to_numpy

            vecs = vectors_to_numpy(batch.column("embedding"), np.float64)
            n = np.round(np.sqrt(np.einsum("ij,ij->i", vecs, vecs)), 4)
            return pa.table({"vec_id": batch.column("vec_id"),
                             "l2_norm": pa.array(n, pa.float64())})

        return emb.map_batches(norms, batch_format="pyarrow")

    def ann_quantized_eval(sf_dir):
        # the pre-deployment retrieval eval: recall@10 / MRR / nDCG of
        # int8-code retrieval (integer dot over quantize_embeddings'
        # exact codes) vs exact float-dot truth — both sides rank by
        # inner product, so the metrics isolate pure QUANTIZATION loss;
        # 8 queries share one corpus scan per retriever; per-term-
        # floored integer metrics ⇒ the SQL oracle replays bit for bit
        from raygraph.ops.ann import (batch_topk, quantized_batch_topk,
                                      retrieval_eval)

        qtab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])
        qdf = qtab.to_pandas()
        qdf = qdf[qdf["vec_id"] < 8].sort_values("vec_id")
        queries = np.stack(qdf["embedding"].map(np.asarray).to_numpy())
        qids = qdf["vec_id"].tolist()
        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        truth = batch_topk(emb, queries, qids, k=10, round_dp=4,
                           metric="dot").to_pandas()
        cand = quantized_batch_topk(emb, queries, qids, k=10).to_pandas()
        return retrieval_eval(truth, cand, k=10)

    def ann_matryoshka_eval(sf_dir):
        # Matryoshka truncation eval (Kusupati et al. 2022): retrieval
        # quality (recall@10 / MRR / nDCG) when BOTH sides rank by only
        # the first 4 / 8 / 16 embedding dims, vs the full-64 exact-dot
        # truth — the "how small can the prefix be" deployment question.
        # Each leg shares one corpus scan across the 8 queries; metrics
        # are the per-term-floored integers of retrieval_eval
        from raygraph.ops.ann import batch_topk, retrieval_eval

        qtab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])
        qdf = qtab.to_pandas()
        qdf = qdf[qdf["vec_id"] < 8].sort_values("vec_id")
        queries = np.stack(qdf["embedding"].map(np.asarray).to_numpy())
        qids = qdf["vec_id"].tolist()
        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        truth = batch_topk(emb, queries, qids, k=10, round_dp=4,
                           metric="dot").to_pandas()
        outs = []
        for d in (4, 8, 16):
            cand = batch_topk(emb, queries, qids, k=10, round_dp=4,
                              metric="dot", dims=d).to_pandas()
            ev = retrieval_eval(truth, cand, k=10)
            ev.insert(0, "dims", np.int64(d))
            outs.append(ev)
        out = pd.concat(outs, ignore_index=True)
        out["dims"] = out["dims"].astype("int64")
        return out

    def ann_batch_top3(sf_dir):
        # batched exact ANN: 5 query vectors share ONE corpus scan (one
        # (n×Q) matmul per batch, per-query partial top-k, bucketed
        # exact reduce) — the batch-inference shape; rounded-cosine +
        # id ordering keeps it engine-stable
        from raygraph.ops.ann import batch_topk

        qtab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])
        qdf = qtab.to_pandas()
        qdf = qdf[qdf["vec_id"] < 5].sort_values("vec_id")
        queries = np.stack(qdf["embedding"].map(np.asarray).to_numpy())
        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        return batch_topk(emb, queries, qdf["vec_id"].tolist(), k=3,
                          round_dp=4)

    def embedding_quantized(sf_dir):
        from raygraph.ops.ann import quantize_embeddings

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        return quantize_embeddings(emb)

    # ---- media (stub decode, real plumbing) ------------------------------
    def media_dedup(sf_dir):
        # exact duplicate-media detection over the 50%-duplicate corpus:
        # payload digests stream out of map_batches, a digest-keyed
        # combiner + one bucketed merge keep payload bytes off the wire
        from raygraph.ops.media import dedup_by_digest, documents_as_media

        return dedup_by_digest(documents_as_media(_doubled_docs(sf_dir)))

    def media_features(sf_dir):
        # media derived from documents (payload = UTF-8 text bytes) so the
        # decode stage's n_bytes/digest outputs are SQL-verifiable; the
        # feature vector itself (blake2b stub) is dropped from the contract
        ds = documents_as_media(_docs_ds(sf_dir))
        out = decode_features(ds, feature_dim=32, concurrency=(1, 2))
        return out.drop_columns(["feature"]).add_column(
            "feature_dim", lambda df: [32] * len(df), batch_format="pandas"
        )

    def media_frames(sf_dir):
        # frame-sampling fan-out: 'video' payload (= UTF-8 text bytes,
        # so the oracle can slice it with substr) → every 2nd 64-byte
        # frame; one input row explodes to ceil(n_frames/2) rows on an
        # actor-pool stage; the binary frame itself leaves the contract
        # as (length, md5-60) integers
        import hashlib

        from raygraph.ops.media import FrameSampler, documents_as_media

        ds = documents_as_media(_docs_ds(sf_dir))
        frames = ds.map_batches(
            FrameSampler,
            fn_constructor_kwargs={"frame_bytes": 64, "every": 2},
            batch_format="pyarrow", batch_size=64, concurrency=(1, 2),
        )

        def digest(batch: pa.Table) -> pa.Table:
            fr = batch.column("frame").to_pylist()
            return pa.table({
                "media_ref": batch.column("media_ref"),
                "frame_idx": batch.column("frame_idx"),
                "n_frame_bytes": pa.array([len(b) for b in fr], pa.int64()),
                "frame_md5_60": pa.array(
                    [int(hashlib.md5(b).hexdigest()[:15], 16) for b in fr],
                    pa.int64()),
            })

        return frames.map_batches(digest, batch_format="pyarrow")

    def media_dimensions(sf_dir):
        # REAL byte-level media metadata extraction: each document is
        # wrapped in a valid PNG container (IHDR dims derived from the
        # doc), and the pure-bytes header parser recovers them — the
        # pre-decode kernel a media pipeline runs at read speed; the
        # oracle recomputes the dims straight from the documents
        from raygraph.ops.media import image_dimensions, make_png

        ds = _docs_ds(sf_dir)

        def to_png(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            payloads = [
                make_png(1 + len(t or "") % 640, 1 + (i % 480),
                         (t or "").encode())
                for i, t in zip(ids, texts)
            ]
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "payload": pa.array(payloads, pa.binary()),
            })

        return image_dimensions(ds.map_batches(to_png,
                                               batch_format="pyarrow"),
                                keep_cols=("doc_id",))

    def events_transitions(sf_dir):
        from raygraph.ops.events import type_transitions

        ev = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        return type_transitions(ev)

    def events_sequences(sf_dir):
        from raygraph.ops.events import type_sequences

        ev = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        return type_sequences(ev)

    def events_winsorized_mean(sf_dir):
        # robust mean: winsorize value_e4 at the exact per-type
        # p01/p99 (percentile_disc via the distinct-value exchange —
        # shuffle carries (type, value, count), never rows), broadcast
        # the type→(lo,hi) clip bounds back, integer trunc mean
        from raygraph.ops.relational import grouped_quantiles, trunc_div

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "value"])

        def quant(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            return pa.Table.from_pandas(pd.DataFrame({
                "event_type": df["event_type"],
                "v_e4": np.round(df["value"].to_numpy() * 10_000)
                .astype("int64"),
            }), preserve_index=False)

        q = grouped_quantiles(ev.map_batches(quant, batch_format="pyarrow"),
                              ["event_type"], "v_e4",
                              qs=(0.01, 0.99)).to_pandas()
        lo = dict(zip(q["event_type"], q["p01"].astype("int64")))
        hi = dict(zip(q["event_type"], q["p99"].astype("int64")))

        def clip(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            v = np.round(df["value"].to_numpy() * 10_000).astype("int64")
            l = df["event_type"].map(lo).to_numpy().astype("int64")
            h = df["event_type"].map(hi).to_numpy().astype("int64")
            return pa.Table.from_pandas(pd.DataFrame({
                "event_type": df["event_type"],
                "cv": np.clip(v, l, h),
            }), preserve_index=False)

        agg = preagg_sum(ev.map_batches(clip, batch_format="pyarrow"),
                         ["event_type"], {"sum_cv": "cv"},
                         counts="n").to_pandas()
        agg["wins_mean_e4"] = trunc_div(agg["sum_cv"].to_numpy(),
                                        agg["n"].to_numpy())
        agg["n"] = agg["n"].astype("int64")
        agg["wins_mean_e4"] = agg["wins_mean_e4"].astype("int64")
        return agg[["event_type", "n", "wins_mean_e4"]]

    def events_value_moments(sf_dir):
        # distributed mean/variance: per-type integer moment sums
        # (n, Σv_e4, Σv²_e8) — associative, so per-batch partials are
        # exact at any layout; variance left as the two raw moments so
        # the contract stays integer-exact end to end
        def moments(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            v = np.round(df["value"].to_numpy() * 10_000).astype("int64")
            g = pd.DataFrame({"event_type": df["event_type"],
                              "v": v, "v2": v * v}) \
                .groupby("event_type", as_index=False) \
                .agg(n=("v", "size"), sum_e4=("v", "sum"),
                     sumsq_e8=("v2", "sum"))
            for c in ("n", "sum_e4", "sumsq_e8"):
                g[c] = g[c].astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False)

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "value"])
        return preagg_sum(ev.map_batches(moments, batch_format="pyarrow"),
                          ["event_type"],
                          {"n": "n", "sum_e4": "sum_e4",
                           "sumsq_e8": "sumsq_e8"})

    def events_ewma_tail(sf_dir):
        # exact-integer EWMA-at-last-event: alpha=1/2 decay truncated to
        # the final 8 events per user (newest weight 2^7), evaluated in
        # one key-hash exchange + vectorized per-bucket tail fold — the
        # parallel-safe form of a sequential smoother
        from raygraph.ops.events import ewma_tail_weighted

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts", "event_id",
                                      "value"])

        def prep(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            v = batch.column("value").to_numpy(zero_copy_only=False)
            return pa.table({
                "user_id": batch.column("user_id"),
                "ts": pc.cast(batch.column("ts"), pa.int64()),
                "event_id": batch.column("event_id"),
                "value_e4": pa.array(np.round(v * 10000).astype("int64")),
            })

        out = ewma_tail_weighted(ev.map_batches(prep,
                                                batch_format="pyarrow"),
                                 window=8).to_pandas()
        out = out.rename(columns={"ews": "ews_e4"})
        return out.sort_values("user_id").reset_index(drop=True)

    def events_coverage(sf_dir):
        # union-of-intervals "active time" per user: each event opens a
        # 5-minute interval; overlaps merge. One key-hash exchange +
        # vectorized cummax islands — no sequential sweep
        from raygraph.ops.events import interval_coverage

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts"])

        def prep(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({
                "user_id": batch.column("user_id"),
                "ts_us": pc.cast(batch.column("ts"), pa.int64()),
            })

        out = interval_coverage(ev.map_batches(prep,
                                               batch_format="pyarrow"),
                                300_000_000).to_pandas()
        return out.sort_values("user_id").reset_index(drop=True)

    def docs_ngram_dup(sf_dir):
        # cross-doc 8-gram duplication rate (Lee-et-al substring-dedup
        # signal); the synthetic corpus has no duplicates, so an
        # id-derived shared sentence is injected in BOTH the Ray
        # pipeline and the SQL (memory: inject, don't hope)
        from raygraph.ops.text import cross_doc_ngram_stats

        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
        SHARED = " the quick brown fox jumps over the lazy dog"

        def inject(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            ids = batch.column("doc_id")
            mod = pc.subtract(ids, pc.multiply(pc.divide(ids, 7), 7))
            text = pc.if_else(
                pc.equal(mod, 0),
                pc.binary_join_element_wise(batch.column("text"),
                                            SHARED, ""),
                batch.column("text"))
            return pa.table({"doc_id": ids, "text": text})

        out = cross_doc_ngram_stats(
            docs.map_batches(inject, batch_format="pyarrow"),
            n=8).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    def docs_snapshot_diff(sf_dir):
        # keyed snapshot reconcile: derive the CDC between the corpus
        # and a deterministically perturbed re-ingest (doc_id%10==0
        # dropped, ==1 text-mutated, ==2 re-keyed as new rows), then
        # collapse the per-key statuses with a combiner preagg — the
        # lakehouse maintenance pass that turns two table versions into
        # a change log
        from raygraph.ops.relational import snapshot_diff

        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])

        def make_b(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            ids = batch.column("doc_id")
            h = pc.cast(pc.subtract(
                ids, pc.multiply(pc.divide(ids, 10), 10)), pa.int64())
            keep = batch.filter(pc.not_equal(h, 0))
            hk = pc.cast(pc.subtract(
                keep.column("doc_id"),
                pc.multiply(pc.divide(keep.column("doc_id"), 10), 10)),
                pa.int64())
            text = pc.if_else(pc.equal(hk, 1),
                              pc.binary_join_element_wise(
                                  keep.column("text"), "!", ""),
                              keep.column("text"))
            base = pa.table({"doc_id": keep.column("doc_id"),
                             "text": text})
            adds = batch.filter(pc.equal(h, 2))
            adds = pa.table({
                "doc_id": pc.add(adds.column("doc_id"), 10_000_000),
                "text": adds.column("text")})
            return pa.concat_tables([base, adds])

        new = docs.map_batches(make_b, batch_format="pyarrow")
        diff = snapshot_diff(docs, new, "doc_id", "text")

        def ones(batch: pa.Table) -> pa.Table:
            return pa.table({
                "status": batch.column("status"),
                "n": pa.array(np.ones(batch.num_rows, dtype="int64")),
            })

        out = preagg_sum(diff.map_batches(ones, batch_format="pyarrow"),
                         ["status"], {"n": "n"}).to_pandas()
        return out.sort_values("status").reset_index(drop=True)

    def events_funnel(sf_dir):
        from raygraph.ops.events import funnel_counts

        ev = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_type"])
        return funnel_counts(ev, ["view", "click", "purchase"])

    def events_retention(sf_dir):
        from raygraph.ops.events import retention_cohorts

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts"])
        return retention_cohorts(ev)

    def events_latest(sf_dir):
        # FIRST_VALUE / argmax per key — the latest event row per user
        # (row_number() OVER (PARTITION BY user ORDER BY ts DESC) = 1)
        # via the group-topk reduce at k=1: per-batch partial argmax,
        # then one hash-bucketed exact reduce; ts carried as exact int64
        # µs and value as round-e4 integer so the window oracle matches
        # bit-for-bit
        import pyarrow.compute as pc

        from raygraph.ops.relational import group_topk

        ev = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "event_type", "value"],
        )

        def prep(batch: pa.Table) -> pa.Table:
            v = batch.column("value").to_numpy(zero_copy_only=False)
            return pa.table({
                "user_id": batch.column("user_id"),
                "ts_us": pc.cast(batch.column("ts"), pa.int64()),
                "event_id": batch.column("event_id"),
                "event_type": batch.column("event_type"),
                "value_e4": pa.array(np.round(v * 10000).astype("int64")),
            })

        return group_topk(ev.map_batches(prep, batch_format="pyarrow"),
                          ["user_id"], "ts_us", 1, tie_col="event_id")

    def docs_profile(sf_dir):
        # data profiling (SUMMARIZE analog): per-column n_rows / n_null /
        # exact n_distinct / min / max over the documents table — scalar
        # stats fold via tree_aggregate, distinct via the two-level
        # exact distinct_count; typed min/max stringified at the end so
        # numeric columns compare numerically like the SQL oracle
        from raygraph.ops.relational import profile_columns

        ds = rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text", "lang", "source", "n_chars"],
        )
        return profile_columns(ds,
                               ["doc_id", "text", "lang", "source",
                                "n_chars"])

    def docs_feature_hashing(sf_dir):
        # the hashing trick (Weinberger et al. 2009): the lang × source
        # cross feature hashes into 64 buckets via the md5 bridge;
        # per-bucket row count AND distinct-feature count make the
        # collisions observable (the quantity the trick trades for
        # fixed dimensionality) — one pair-hash distinct + combiner
        import hashlib

        from raygraph.ops.relational import hash_aggregate, preagg_sum

        docs = _docs_ds(sf_dir, columns=("lang", "source"))

        def bucketize(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            feat = df["lang"].str.cat(df["source"], sep="x")
            b = feat.map(lambda s: int(hashlib.md5(s.encode())
                                       .hexdigest()[:15], 16) % 64)
            return pa.Table.from_pandas(
                pd.DataFrame({"bucket": b.astype("int64"),
                              "feat": feat}), preserve_index=False)

        bf = docs.map_batches(bucketize, batch_format="pyarrow")
        rows = preagg_sum(bf.select_columns(["bucket"]), ["bucket"],
                          {}, counts="n_rows")
        from raygraph.ops.graph import _repaired

        dfeat = _repaired(
            hash_aggregate(bf, ["bucket", "feat"],
                           lambda d: d.drop_duplicates()),
            pa.schema([("bucket", pa.int64()), ("feat", pa.string())]))
        nf = preagg_sum(dfeat.select_columns(["bucket"]), ["bucket"],
                        {}, counts="n_features")
        a = rows.to_pandas().set_index("bucket")
        b = nf.to_pandas().set_index("bucket")
        out = a.join(b).reset_index().sort_values("bucket") \
            .reset_index(drop=True)
        return out.astype("int64")

    def docs_mannwhitney(sf_dir):
        # Mann–Whitney U (two-sample rank test, exact midrank
        # integers): does the lexicographically-first source's doc
        # length distribution differ from the rest? Rank sums stay
        # 2x-scaled integers (tied groups take 2·start + c + 1), so
        # the contract is float-free; one value-keyed combiner
        # exchange, the value-sized spectrum folds on the driver
        docs = _docs_ds(sf_dir, columns=("n_chars", "source"))
        from raygraph.ops.relational import preagg_sum

        srcs = preagg_sum(docs.select_columns(["source"]), ["source"],
                          {}, counts="n").to_pandas()
        a_src = sorted(srcs["source"])[0]

        def rows(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            return pa.table({
                "x": pa.array(df["n_chars"], pa.int64()),
                "a": pa.array((df["source"] == a_src)
                              .astype("int64"), pa.int64()),
            })

        v = preagg_sum(docs.map_batches(rows, batch_format="pyarrow"),
                       ["x"], {"a": "a"}, counts="c").to_pandas() \
            .sort_values("x").reset_index(drop=True)
        c = v["c"].to_numpy(dtype="int64")
        a = v["a"].to_numpy(dtype="int64")
        start = np.cumsum(c) - c
        r2a = int((a * (2 * start + c + 1)).sum())
        na = int(a.sum())
        n = int(c.sum())
        return pd.DataFrame({"n_a": [na], "n_b": [n - na],
                             "u2_a": [r2a - na * (na + 1)]}) \
            .astype("int64")

    def orders_rowgroup_prune(sf_dir):
        # sub-file predicate pushdown: the orders table is rewritten
        # key-clustered with 2k-row row groups, the scan plans against
        # FOOTER min/max only (plan_rowgroups) and reads the surviving
        # groups + residual filter — the query asserts that pruning
        # actually skipped groups, the oracle is the plain WHERE
        import pyarrow.parquet as _pq2

        from raygraph.io import plan_rowgroups, read_parquet_rowgroups

        n = _docs_count(sf_dir)
        tdir = os.path.join(_TMP, f"orders_rg_n{n}")
        if not os.path.isdir(tdir):
            os.makedirs(tdir, exist_ok=True)
            t = _pq2.read_table(os.path.join(sf_dir, "orders.parquet"),
                                columns=["o_orderkey", "o_totalprice"])
            t = t.sort_by("o_orderkey")
            _pq2.write_table(t, os.path.join(tdir, "part-0.parquet"),
                             row_group_size=2000)
        lo, hi = 10_000, 20_000
        plan = plan_rowgroups(tdir, "o_orderkey", lo, hi)
        assert plan["n_groups_kept"] < plan["n_groups_total"], plan
        ds = read_parquet_rowgroups(tdir, "o_orderkey", lo, hi)

        def residual(batch: pa.Table) -> pa.Table:
            k = batch.column("o_orderkey").to_numpy(
                zero_copy_only=False)
            m = (k >= lo) & (k <= hi)
            df = batch.to_pandas()[m]
            return pa.table({
                "n": pa.array([int(m.sum())], pa.int64()),
                "cents": pa.array(
                    [int(np.round(df["o_totalprice"].to_numpy()
                                  * 100).astype("int64").sum())],
                    pa.int64()),
            })

        agg = ds.map_batches(residual, batch_format="pyarrow") \
            .to_pandas()
        return pd.DataFrame({
            "n": [int(agg["n"].sum())],
            "sum_cents": [int(agg["cents"].sum())],
        }).astype("int64")

    def orders_theil_sen(sf_dir):
        # Theil–Sen robust trend of daily revenue: the lower median of
        # all pairwise day-slopes (e6 trunc-div integers) — outlier-
        # immune where OLS (events_trend) is not. The day series is a
        # distributed combiner aggregate; only the day-sized table
        # pair-expands (dates are bounded, so the O(days²) stays
        # driver-safe at any corpus scale)
        from raygraph.ops.relational import preagg_sum, trunc_div

        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderdate", "o_totalprice"])

        def cents(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            d = (df["o_orderdate"].to_numpy()
                 .astype("datetime64[us]").astype("int64")
                 // 86_400_000_000)
            return pa.table({
                "d": pa.array(d, pa.int64()),
                "y": pa.array(np.round(df["o_totalprice"] * 100)
                              .astype("int64"), pa.int64()),
            })

        byday = preagg_sum(
            orders.map_batches(cents, batch_format="pyarrow"),
            ["d"], {"y": "y"}).to_pandas().sort_values("d") \
            .reset_index(drop=True)
        d = byday["d"].to_numpy(dtype="int64")
        y = byday["y"].to_numpy(dtype="int64")
        iu, ju = np.triu_indices(len(d), k=1)
        slopes = trunc_div(1_000_000 * (y[ju] - y[iu]),
                           d[ju] - d[iu])
        slopes = np.sort(slopes)
        med = int(slopes[(len(slopes) - 1) // 2])
        return pd.DataFrame({"n_days": [len(d)],
                             "n_pairs": [len(slopes)],
                             "slope_e6": [med]}) \
            .astype("int64")

    def orders_holt_winters(sf_dir):
        # Holt's double exponential smoothing over the daily-revenue
        # series (level α = 1/5, trend β = 1/10, exact trunc-div
        # integers): the day-keyed aggregate is distributed (combiner
        # preagg); only the day-sized series folds on the driver —
        # same scale shape as orders_max_drawdown. The oracle replays
        # the recurrence with a RECURSIVE CTE
        from raygraph.ops.relational import preagg_sum, trunc_div

        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderdate", "o_totalprice"])

        def cents(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            return pa.table({
                "day": pa.array(df["o_orderdate"]),
                "y": pa.array(np.round(df["o_totalprice"] * 100)
                              .astype("int64"), pa.int64()),
            })

        byday = preagg_sum(
            orders.map_batches(cents, batch_format="pyarrow"),
            ["day"], {"y": "y"}).to_pandas().sort_values("day") \
            .reset_index(drop=True)
        y = byday["y"].to_numpy(dtype="int64")
        lvl = np.zeros(len(y), dtype="int64")
        trd = np.zeros(len(y), dtype="int64")
        lvl[0] = y[0]
        for t in range(1, len(y)):
            lvl[t] = (int(trunc_div(y[t], 5))
                      + int(trunc_div(4 * (lvl[t - 1] + trd[t - 1]), 5)))
            trd[t] = (int(trunc_div(lvl[t] - lvl[t - 1], 10))
                      + int(trunc_div(9 * trd[t - 1], 10)))
        return pd.DataFrame({"day": byday["day"], "level_c": lvl,
                             "trend_c": trd})

    def orders_ivm_view(sf_dir):
        # incremental view maintenance (counting algorithm) for the
        # revenue-per-customer aggregate view: base view over ALL
        # orders, then a changeset — deletes (key % 17 = 0) and
        # doubled-price inserts (key % 13 = 0) — applied as SIGNED
        # delta partials merged in one combiner preagg; groups whose
        # count hits zero drop. The oracle is the full recompute over
        # (base \ deletes) ∪ inserts — hash equality IS the IVM
        # correctness claim
        from raygraph.ops.relational import ivm_merge, preagg_sum

        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_totalprice"])

        def cents(mult: int):
            def fn(batch: pa.Table) -> pa.Table:
                df = batch.to_pandas()
                return pa.table({
                    "o_orderkey": pa.array(df["o_orderkey"], pa.int64()),
                    "o_custkey": pa.array(df["o_custkey"], pa.int64()),
                    "revenue_cents": pa.array(
                        mult * np.round(df["o_totalprice"] * 100)
                        .astype("int64"), pa.int64()),
                })
            return fn

        base = orders.map_batches(cents(1), batch_format="pyarrow")
        view = preagg_sum(base, ["o_custkey"],
                          {"revenue_cents": "revenue_cents"},
                          counts="n_orders")

        def keysel(mod: int, residue: int):
            def fn(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                k = batch.column("o_orderkey").to_numpy(
                    zero_copy_only=False)
                return batch.filter(pa.array(k % mod == residue))
            return fn

        dels = base.map_batches(keysel(17, 0), batch_format="pyarrow") \
            .select_columns(["o_custkey", "revenue_cents"])
        ins = orders.map_batches(keysel(13, 0), batch_format="pyarrow") \
            .map_batches(cents(2), batch_format="pyarrow") \
            .select_columns(["o_custkey", "revenue_cents"])

        merged = ivm_merge(view, [(dels, -1), (ins, +1)],
                           ["o_custkey"], ["revenue_cents"],
                           count_col="n_orders")
        return merged.select_columns(
            ["o_custkey", "n_orders", "revenue_cents"])

    def orders_ivm_incremental(sf_dir):
        # streaming IVM: the SAME changeset as orders_ivm_view arrives
        # in 4 micro-batch rounds (o_orderkey % 4), the view folds one
        # round at a time with write-then-commit checkpoints — final
        # state shares orders_ivm_view's oracle (the sharing IS the
        # claim: incremental == batch == full recompute, bit for bit)
        from raygraph.ops.relational import preagg_sum
        from raygraph.ops.stream import ivm_incremental

        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_totalprice"])

        def cents(mult: int):
            def fn(batch: pa.Table) -> pa.Table:
                df = batch.to_pandas()
                return pa.table({
                    "o_orderkey": pa.array(df["o_orderkey"], pa.int64()),
                    "o_custkey": pa.array(df["o_custkey"], pa.int64()),
                    "revenue_cents": pa.array(
                        mult * np.round(df["o_totalprice"] * 100)
                        .astype("int64"), pa.int64()),
                })
            return fn

        def keysel(mod: int, residue: int):
            def fn(batch: pa.Table) -> pa.Table:
                k = batch.column("o_orderkey").to_numpy(
                    zero_copy_only=False)
                return batch.filter(pa.array(k % mod == residue))
            return fn

        base = orders.map_batches(cents(1), batch_format="pyarrow")
        view = preagg_sum(base, ["o_custkey"],
                          {"revenue_cents": "revenue_cents"},
                          counts="n_orders")

        rounds = []
        for r in range(4):
            rnd = orders.map_batches(keysel(4, r),
                                     batch_format="pyarrow")
            dels = rnd.map_batches(keysel(17, 0),
                                   batch_format="pyarrow") \
                .map_batches(cents(1), batch_format="pyarrow") \
                .select_columns(["o_custkey", "revenue_cents"])
            ins = rnd.map_batches(keysel(13, 0),
                                  batch_format="pyarrow") \
                .map_batches(cents(2), batch_format="pyarrow") \
                .select_columns(["o_custkey", "revenue_cents"])
            rounds.append([(dels, -1), (ins, +1)])

        schema = pa.schema([("o_custkey", pa.int64()),
                            ("revenue_cents", pa.int64()),
                            ("n_orders", pa.int64())])
        out = ivm_incremental(view, rounds, ["o_custkey"],
                              ["revenue_cents"], schema,
                              count_col="n_orders")
        return out.select_columns(
            ["o_custkey", "n_orders", "revenue_cents"])

    def orders_merged(sf_dir):
        # CDC merge (MERGE INTO): apply a deterministic changeset —
        # deletes (key % 13 = 0), updates (key % 7 = 0, price + 500)
        # and inserts (key % 101 = 0 at key + 10M) — to the orders
        # snapshot via the tag-union + hash-bucketed anti-join+append
        # reduce; exact integer cents so the SQL NOT EXISTS ∪ upserts
        # oracle matches bit-for-bit
        from raygraph.ops.relational import apply_changeset

        def cents(batch: pa.Table) -> pa.Table:
            p = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
            return pa.table({
                "k": batch.column("o_orderkey"),
                "custkey": batch.column("o_custkey"),
                "price_cents": pa.array(
                    np.round(p * 100).astype("int64")),
            })

        def orders(sf_dir):
            return rd.read_parquet(
                os.path.join(sf_dir, "orders.parquet"),
                columns=["o_orderkey", "o_custkey", "o_totalprice"],
            ).map_batches(cents, batch_format="pyarrow")

        def changes(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            dels = df.loc[df["k"] % 13 == 0].assign(op="delete")
            upd = df.loc[(df["k"] % 7 == 0) & (df["k"] % 13 != 0)].assign(
                op="upsert", price_cents=lambda d: d["price_cents"] + 500)
            ins = df.loc[df["k"] % 101 == 0].assign(
                op="upsert", k=lambda d: d["k"] + 10_000_000,
                price_cents=999)
            out = pd.concat([dels, upd, ins], ignore_index=True)
            return pa.Table.from_pandas(out, preserve_index=False)

        ch = orders(sf_dir).map_batches(changes, batch_format="pyarrow")
        return apply_changeset(orders(sf_dir), ch, on="k")

    def embedding_kmeans(sf_dir):
        # distributed Lloyd k-means (k=8, 2 refinement rounds) in exact
        # integer arithmetic — per-iteration vectorized assignment +
        # partial-sum pass, k×d centroid matrix as the only driver
        # state; final (vec_id, cluster) assignments match the
        # machine-unrolled SQL oracle bit-for-bit
        from raygraph.ops.cluster import kmeans

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        return kmeans(emb, k=8, iters=2)

    def tpch_salted_priority(sf_dir):
        # skew-mitigated big⋈big join: lineitem ⋈ orders on orderkey
        # through the salted path (approx heavy-hitter pre-pass routes
        # hot keys across salt sub-buckets; exact for any hot set),
        # then a combiner preagg per priority — oracle is the plain SQL
        # join+group, proving salting only re-routes
        from raygraph.ops.relational import salted_join

        def cents(batch: pa.Table) -> pa.Table:
            p = batch.column("l_extendedprice") \
                .to_numpy(zero_copy_only=False)
            return pa.table({
                "l_orderkey": batch.column("l_orderkey"),
                "price_cents": pa.array(
                    np.round(p * 100).astype("int64")),
            })

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_extendedprice"],
        ).map_batches(cents, batch_format="pyarrow")
        od = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderpriority"],
        ).map_batches(
            lambda b: b.rename_columns(["l_orderkey", "o_orderpriority"]),
            batch_format="pyarrow")
        j = salted_join(li, od, on="l_orderkey", salt=4)
        return preagg_sum(j, ["o_orderpriority"],
                          {"sum_price_cents": "price_cents"},
                          counts="n_items")

    def docs_stratified_sample(sf_dir):
        # class rebalancing: downsample dominant English to 10%, keep
        # 50% of the rest (zh dropped — absent from the rate map) —
        # content-keyed md5 split, so the exact surviving rows are
        # SQL-reproducible at any parallelism
        from raygraph.ops.relational import stratified_sample

        ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                             columns=["doc_id", "lang"])
        return stratified_sample(
            ds, {"en": 100, "de": 500, "es": 500, "fr": 500}, "lang")

    def lineitem_range_tiles(sf_dir):
        # exact range partitioner (the split step of a distributed
        # sort): boundaries = exact percentile_disc(1/4, 2/4, 3/4) of
        # the cents column via the value-count shuffle (no sampling, so
        # tiles are layout-deterministic), then per-tile row count and
        # min/max — proving the partitioner produces sorted,
        # contiguous, complete ranges
        from raygraph.ops.relational import range_partition

        def cents(batch: pa.Table) -> pa.Table:
            p = batch.column("l_extendedprice") \
                .to_numpy(zero_copy_only=False)
            return pa.table({
                "price_cents": pa.array(
                    np.round(p * 100).astype("int64")),
            })

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_extendedprice"],
        ).map_batches(cents, batch_format="pyarrow")
        tiled = range_partition(li, "price_cents", n_tiles=4)
        from raygraph.ops.relational import preagg_extreme

        n = preagg_sum(tiled, ["tile"], {}, counts="n_rows")
        lo = preagg_extreme(tiled, ["tile"], "price_cents", "min",
                            out="min_cents")
        hi = preagg_extreme(tiled, ["tile"], "price_cents", "max",
                            out="max_cents")
        df = n.to_pandas().merge(lo.to_pandas(), on="tile") \
            .merge(hi.to_pandas(), on="tile")
        return df.sort_values("tile", ignore_index=True)

    def docs_vocab_encode(sf_dir):
        # tokenizer fit + transform: build the top-64 corpus vocab
        # (count DESC, token ASC ids), broadcast it, and emit each
        # doc's exact-integer encoding summary (n_tokens, n_oov,
        # sum of in-vocab token ids) — the vocab never exceeds 64 rows
        # and the corpus is never collected
        from raygraph.ops.text import build_vocab, encode_tokens

        vocab = build_vocab(_docs_ds(sf_dir), size=64)
        return encode_tokens(_docs_ds(sf_dir), vocab)

    def _docs_labeled(sf_dir):
        # id-derived 3-class labels (the synthetic corpus carries no
        # quality label; the injection discipline replays doc_id % 3
        # identically in the SQL oracle)
        def add_label(batch):
            did = batch.column("doc_id").to_pandas()
            lbl = "c" + (did % 3).astype(str)
            return batch.append_column("label",
                                       pa.array(lbl.tolist(), pa.string()))

        return _docs_ds(sf_dir).map_batches(add_label,
                                            batch_format="pyarrow")

    def docs_nb_model(sf_dir):
        # fastText-style curation classifier FIT: one vocab-bounded
        # (label, token) combiner exchange; the returned model is the
        # 256×3 smoothed log-likelihood grid (exact int64 ×1e6)
        from raygraph.ops.classify import nb_fit

        ll, _pr, _v = nb_fit(_docs_labeled(sf_dir), vocab_size=256)
        return ll.sort_values(["label", "token"]).reset_index(drop=True)

    def docs_nb_pred(sf_dir):
        # ... and SCORE: the (V × C) int64 matrix rides the task
        # closure; per-batch one token explode + np.add.at gather-sum,
        # zero shuffle; argmax tie → label ASC
        from raygraph.ops.classify import nb_fit, nb_score

        labeled = _docs_labeled(sf_dir)
        ll, pr, _v = nb_fit(labeled, vocab_size=256)
        return nb_score(_docs_ds(sf_dir), ll, pr)

    def docs_nb_auc(sf_dir):
        # classifier EVAL: exact per-lang ROC-AUC of the c0-class NB
        # score ranking (positives = the c0 docs). ONE value-count
        # combiner exchange keyed (lang, score, is_pos) — bounded by
        # distinct integer scores, never rows — then a Python-int
        # Mann–Whitney rank-sum fold (half-credit ties)
        from raygraph.ops.classify import (nb_class_score, nb_fit,
                                           roc_auc)

        ll, pr, _v = nb_fit(_docs_labeled(sf_dir), vocab_size=256)
        scored = nb_class_score(
            _docs_ds(sf_dir, columns=("doc_id", "text", "lang")),
            ll, pr, "c0", keep_cols=("lang",))

        def add_pos(batch):
            did = batch.column("doc_id").to_pandas()
            return batch.append_column(
                "is_pos", pa.array((did % 3 == 0).tolist(), pa.bool_()))

        return roc_auc(scored.map_batches(add_pos,
                                          batch_format="pyarrow"),
                       "is_pos", "score_e6", group_cols=["lang"])

    def docs_nb_prf(sf_dir):
        # ... and per-class precision/recall/F1 of the NB argmax vs
        # truth: one C²-row confusion combiner exchange, exact integer
        # e6 metrics (f1 = 2·10⁶·tp // (2tp+fp+fn))
        from raygraph.ops.classify import nb_fit, nb_score, prf_per_class

        labeled = _docs_labeled(sf_dir)
        ll, pr, _v = nb_fit(labeled, vocab_size=256)
        preds = nb_score(_docs_ds(sf_dir), ll, pr)

        def add_truth(batch):
            did = batch.column("doc_id").to_pandas()
            lbl = "c" + (did % 3).astype(str)
            return batch.append_column(
                "label", pa.array(lbl.tolist(), pa.string()))

        return prf_per_class(
            preds.map_batches(add_truth, batch_format="pyarrow"))

    def tpch_q9_profit(sf_dir):
        # Q9 (product-type profit, partsupp-free form): revenue by
        # supplier nation × ship year. Both dimensions (supplier →
        # nationkey, nation → name) ride the task closure — zero
        # shuffle joins; the only exchange is the (nation × year)-sized
        # combiner preagg. Exact cents × (100 − bp) integers.
        supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                             columns=["s_suppkey", "s_nationkey"]).to_pandas()
        supp_nat = dict(zip(supp["s_suppkey"], supp["s_nationkey"]))
        nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                               columns=["n_nationkey", "n_name"]).to_pandas()
        nat_name = dict(zip(nation["n_nationkey"], nation["n_name"]))

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                     "l_discount"],
        )

        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            cents = np.round(
                df["l_extendedprice"].to_numpy() * 100).astype("int64")
            bp = np.round(df["l_discount"].to_numpy() * 100).astype("int64")
            return pa.Table.from_pandas(pd.DataFrame({
                "n_name": df["l_suppkey"].map(supp_nat).map(nat_name),
                "o_year": df["l_shipdate"].dt.year.astype("int64"),
                "profit_e4": cents * (100 - bp),
            }), preserve_index=False)

        return preagg_sum(li.map_batches(partial, batch_format="pyarrow"),
                          ["n_name", "o_year"], {"profit_e4": "profit_e4"})

    def tpch_q10_returns(sf_dir):
        # Q10 (returned-item reporting): returnflag pushed into the
        # lineitem scan, ONE big⋈big hash-shuffle join (lineitem ⋈
        # orders on orderkey), per-customer combiner preagg, then the
        # two small dims (customer name, nation name) broadcast onto
        # the customer-sized aggregate; top-20 by exact revenue.
        import pyarrow.dataset as pads

        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import _join_partitions, shuffle_join

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_extendedprice", "l_discount",
                     "l_returnflag"],
            filter=pads.field("l_returnflag") == "R",
        )

        def cents(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            c = np.round(
                df["l_extendedprice"].to_numpy() * 100).astype("int64")
            bp = np.round(df["l_discount"].to_numpy() * 100).astype("int64")
            return pa.Table.from_pandas(pd.DataFrame({
                "l_orderkey": df["l_orderkey"],
                "rev_e4": c * (100 - bp),
            }), preserve_index=False)

        orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                 columns=["o_orderkey", "o_custkey"])
        nord = pq.read_metadata(
            os.path.join(sf_dir, "orders.parquet")).num_rows
        j = shuffle_join(li.map_batches(cents, batch_format="pyarrow"),
                         orders, on="l_orderkey", right_on="o_orderkey",
                         num_partitions=_join_partitions(nord))
        j = _repaired(j, pa.schema([("l_orderkey", pa.int64()),
                                    ("rev_e4", pa.int64()),
                                    ("o_custkey", pa.int64())]))
        agg = preagg_sum(j, ["o_custkey"], {"revenue_e4": "rev_e4"})

        cust = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_name", "c_nationkey"]).to_pandas()
        nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                               columns=["n_nationkey", "n_name"]).to_pandas()
        cust["n_name"] = cust["c_nationkey"].map(
            dict(zip(nation["n_nationkey"], nation["n_name"])))
        df = agg.to_pandas().rename(columns={"o_custkey": "c_custkey"})
        df = df.merge(cust[["c_custkey", "c_name", "n_name"]], on="c_custkey")
        df = df.sort_values(["revenue_e4", "c_custkey"],
                            ascending=[False, True]).head(20)
        return df[["c_custkey", "c_name", "n_name",
                   "revenue_e4"]].reset_index(drop=True)

    def tpch_q16_suppliers(sf_dir):
        # Q16 (supplier-count-by-part, lineitem as the association):
        # part attributes broadcast into the scan (the dim is tiny),
        # then exact COUNT(DISTINCT suppkey) per (brand, size) via the
        # two-level distinct_count — the shuffle carries deduped
        # (group, supplier) pairs, never raw lineitem.
        from raygraph.ops.relational import distinct_count

        part = pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_brand", "p_type", "p_size"]).to_pandas()
        sizes = {1, 4, 9, 14, 19, 23, 36, 45}
        part = part[(part["p_type"] != "PROMO")
                    & (part["p_brand"] != "Brand#13")
                    & part["p_size"].isin(sizes)]
        brand = dict(zip(part["p_partkey"], part["p_brand"]))
        size = dict(zip(part["p_partkey"], part["p_size"]))

        li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=["l_partkey", "l_suppkey"])

        def attach(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            b = df["l_partkey"].map(brand)
            keep = b.notna()
            df = df[keep]
            return pa.Table.from_pandas(pd.DataFrame({
                "p_brand": b[keep],
                "p_size": df["l_partkey"].map(size).astype("int64"),
                "l_suppkey": df["l_suppkey"],
            }), preserve_index=False)

        return distinct_count(
            li.map_batches(attach, batch_format="pyarrow"),
            ["p_brand", "p_size"], "l_suppkey", out="supplier_cnt")

    def tpch_q19_revenue(sf_dir):
        # Q19 (disjunctive bracket predicate): three (brand, size,
        # quantity-range) brackets OR-ed together — part attrs ride the
        # closure, the filter and integer revenue run vectorized in the
        # scan batches, and only per-batch scalars reach the tree sum.
        from raygraph.ops.relational import tree_aggregate

        part = pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
        brand = dict(zip(part["p_partkey"], part["p_brand"]))
        size = dict(zip(part["p_partkey"], part["p_size"]))

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_quantity", "l_extendedprice",
                     "l_discount"],
        )

        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            b = df["l_partkey"].map(brand)
            s = df["l_partkey"].map(size)
            q = df["l_quantity"].to_numpy()
            keep = (
                ((b == "Brand#12") & (s.between(1, 5)) & (q >= 1) & (q <= 11))
                | ((b == "Brand#23") & (s.between(1, 10))
                   & (q >= 10) & (q <= 20))
                | ((b == "Brand#34") & (s.between(1, 15))
                   & (q >= 20) & (q <= 30))
            ).to_numpy()
            cents = np.round(
                df["l_extendedprice"].to_numpy() * 100).astype("int64")
            bp = np.round(df["l_discount"].to_numpy() * 100).astype("int64")
            rev = int((cents[keep] * (100 - bp[keep])).sum())
            return pa.table({"revenue_e4": pa.array([rev], pa.int64())})

        return tree_aggregate(
            li.map_batches(partial, batch_format="pyarrow"),
            lambda df: pd.DataFrame(
                {"revenue_e4": [int(df["revenue_e4"].sum())]}),
            precombined=True,
        )

    def kg_linkpred(sf_dir):
        # link prediction: top-20 non-adjacent vertex pairs by
        # common-neighbor count — the degree-ordered wedge plan shared
        # with triangle_count, one combiner preagg, a left_anti join
        # against the edge set, distributed sort + limit
        from raygraph.ops.graph import common_neighbors_topk

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return common_neighbors_topk(ed, k=20)

    def events_late_arrivals(sf_dir):
        # out-of-order ingest accounting: per user, how many events
        # arrive with a timestamp below the running max of everything
        # already arrived. The synthetic stream is ts-ordered, so the
        # ARRIVAL order is injected identically on both sides: a
        # deterministic odd-multiplier bijection of event_id (the
        # id-derived-injection idiom, cf. docs_pii_scrub).
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "event_id", "ts"])

        def arrival(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["arrival"] = (
                df["event_id"].to_numpy().astype("int64")
                * 2654435761) % 4294967296
            return pa.Table.from_pandas(df, preserve_index=False)

        return E.late_arrival_counts(
            ev.map_batches(arrival, batch_format="pyarrow"),
            key_col="user_id", order_col="arrival", ts_col="ts")

    def bloom_join_prune(sf_dir):
        # sketch-based semi-join pruning with exactly-measured accuracy:
        # bloom "bit set" as a distinct-position Dataset, probe keys
        # pass iff every md5-derived position hits; exact semi-join
        # count alongside — the difference IS the false-positive count
        import pyarrow.dataset as pads

        from raygraph.ops.relational import bloom_semi_join_stats

        keys = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderpriority"],
            filter=pads.field("o_orderpriority") == "1-URGENT",
        ).drop_columns(["o_orderpriority"])
        li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=["l_orderkey"])
        return bloom_semi_join_stats(li, keys, "l_orderkey", "o_orderkey")

    def tpch_q2_min_supplier(sf_dir):
        # Q2 shape (minimum-cost supplier, partsupp-free): for each
        # filtered part, the EUROPE supplier with min acctbal (tie: min
        # suppkey) among the suppliers that shipped it. Supplier dim +
        # attrs ride the closure; the per-part argmin is one
        # hash_aggregate whose reduce sees every (part, supplier) row
        # of its keys — lexicographic min is exact per bucket.
        from raygraph.ops.relational import hash_aggregate

        part = pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_type", "p_size"]).to_pandas()
        pset = set(part.loc[(part["p_type"] == "LARGE")
                            & (part["p_size"] <= 15), "p_partkey"])

        supp = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet")).to_pandas()
        nation = pq.read_table(
            os.path.join(sf_dir, "nation.parquet")).to_pandas()
        region = pq.read_table(
            os.path.join(sf_dir, "region.parquet")).to_pandas()
        eur = set(region.loc[region["r_name"] == "EUROPE", "r_regionkey"])
        nat_eur = nation[nation["n_regionkey"].isin(eur)]
        supp = supp[supp["s_nationkey"].isin(set(nat_eur["n_nationkey"]))]
        acct = dict(zip(supp["s_suppkey"],
                        np.round(supp["s_acctbal"].to_numpy() * 100)
                        .astype("int64")))
        sname = dict(zip(supp["s_suppkey"], supp["s_name"]))
        nname = dict(zip(supp["s_suppkey"], supp["s_nationkey"].map(
            dict(zip(nation["n_nationkey"], nation["n_name"])))))

        li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=["l_partkey", "l_suppkey"])

        def pairs(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            keep = df["l_partkey"].isin(pset) & df["l_suppkey"].isin(acct)
            df = df[keep]
            return pa.Table.from_pandas(pd.DataFrame({
                "p_partkey": df["l_partkey"].astype("int64"),
                "s_suppkey": df["l_suppkey"].astype("int64"),
                "acct_cents": df["l_suppkey"].map(acct).astype("int64"),
            }), preserve_index=False)

        def reduce(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["acct_cents", "s_suppkey"]) \
                .drop_duplicates("p_partkey")
            df = df.copy()
            df["s_name"] = df["s_suppkey"].map(sname)
            df["n_name"] = df["s_suppkey"].map(nname)
            return df[["p_partkey", "s_suppkey", "s_name", "n_name",
                       "acct_cents"]]

        return hash_aggregate(li.map_batches(pairs, batch_format="pyarrow"),
                              ["p_partkey"], reduce)

    def tpch_q7_volume(sf_dir):
        # Q7 (volume shipping between two nations): supplier nation via
        # closure (small dim), then the two genuinely big joins —
        # lineitem ⋈ orders and ⋈ customer — as hash-shuffle joins,
        # pair filter, and a (nation² × year)-sized combiner preagg.
        import pyarrow.dataset as pads

        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import _join_partitions, shuffle_join

        nation = pq.read_table(
            os.path.join(sf_dir, "nation.parquet")).to_pandas()
        nat_name = dict(zip(nation["n_nationkey"], nation["n_name"]))
        n1, n2 = "NATION_1", "NATION_2"
        supp = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"),
            columns=["s_suppkey", "s_nationkey"]).to_pandas()
        supp["n"] = supp["s_nationkey"].map(nat_name)
        supp_nat = dict(zip(supp.loc[supp["n"].isin({n1, n2}), "s_suppkey"],
                            supp.loc[supp["n"].isin({n1, n2}), "n"]))

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_suppkey", "l_shipdate",
                     "l_extendedprice", "l_discount"],
            filter=(pads.field("l_shipdate") >= pd.Timestamp("1995-01-01"))
            & (pads.field("l_shipdate") < pd.Timestamp("1997-01-01")),
        )

        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df = df[df["l_suppkey"].isin(supp_nat)]
            cents = np.round(
                df["l_extendedprice"].to_numpy() * 100).astype("int64")
            bp = np.round(df["l_discount"].to_numpy() * 100).astype("int64")
            return pa.Table.from_pandas(pd.DataFrame({
                "l_orderkey": df["l_orderkey"].astype("int64"),
                "supp_nation": df["l_suppkey"].map(supp_nat),
                "l_year": df["l_shipdate"].dt.year.astype("int64"),
                "rev_e4": cents * (100 - bp),
            }), preserve_index=False)

        orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                 columns=["o_orderkey", "o_custkey"])
        nord = pq.read_metadata(
            os.path.join(sf_dir, "orders.parquet")).num_rows
        j = shuffle_join(li.map_batches(partial, batch_format="pyarrow"),
                         orders, on="l_orderkey", right_on="o_orderkey",
                         num_partitions=_join_partitions(nord))
        j = _repaired(j, pa.schema([
            ("l_orderkey", pa.int64()), ("supp_nation", pa.string()),
            ("l_year", pa.int64()), ("rev_e4", pa.int64()),
            ("o_custkey", pa.int64())]))
        cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey", "c_nationkey"])
        ncust = pq.read_metadata(
            os.path.join(sf_dir, "customer.parquet")).num_rows
        j2 = shuffle_join(j, cust, on="o_custkey", right_on="c_custkey",
                          num_partitions=_join_partitions(ncust))
        j2 = _repaired(j2, pa.schema([
            ("l_orderkey", pa.int64()), ("supp_nation", pa.string()),
            ("l_year", pa.int64()), ("rev_e4", pa.int64()),
            ("o_custkey", pa.int64()), ("c_nationkey", pa.int32())]))

        def pairf(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            cn = df["c_nationkey"].map(nat_name)
            keep = ((df["supp_nation"] == n1) & (cn == n2)) \
                | ((df["supp_nation"] == n2) & (cn == n1))
            df = df[keep]
            return pa.Table.from_pandas(pd.DataFrame({
                "supp_nation": df["supp_nation"],
                "cust_nation": cn[keep],
                "l_year": df["l_year"].astype("int64"),
                "rev_e4": df["rev_e4"].astype("int64"),
            }), preserve_index=False)

        return preagg_sum(j2.map_batches(pairf, batch_format="pyarrow"),
                          ["supp_nation", "cust_nation", "l_year"],
                          {"revenue_e4": "rev_e4"})

    def tpch_q8_market_share(sf_dir):
        # Q8 (national market share): part-type filter + supplier
        # nation ride the closure, the big joins (orders for the year,
        # customer for the market region) hash-shuffle, numerator/
        # denominator are two sums in ONE year-keyed combiner preagg,
        # and the share is exact integer bp on the year-sized result.
        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import (_join_partitions, shuffle_join,
                                             trunc_div)

        part = pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_type"]).to_pandas()
        pset = set(part.loc[part["p_type"] == "ECONOMY", "p_partkey"])
        nation = pq.read_table(
            os.path.join(sf_dir, "nation.parquet")).to_pandas()
        region = pq.read_table(
            os.path.join(sf_dir, "region.parquet")).to_pandas()
        asia = set(region.loc[region["r_name"] == "ASIA", "r_regionkey"])
        asia_nat = set(
            nation.loc[nation["n_regionkey"].isin(asia), "n_nationkey"])
        supp = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"),
            columns=["s_suppkey", "s_nationkey"]).to_pandas()
        nat_name = dict(zip(nation["n_nationkey"], nation["n_name"]))
        supp_nat = dict(zip(supp["s_suppkey"],
                            supp["s_nationkey"].map(nat_name)))

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_orderkey",
                     "l_extendedprice", "l_discount"])

        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df = df[df["l_partkey"].isin(pset)]
            cents = np.round(
                df["l_extendedprice"].to_numpy() * 100).astype("int64")
            bp = np.round(df["l_discount"].to_numpy() * 100).astype("int64")
            return pa.Table.from_pandas(pd.DataFrame({
                "l_orderkey": df["l_orderkey"].astype("int64"),
                "supp_nation": df["l_suppkey"].map(supp_nat),
                "vol_e4": cents * (100 - bp),
            }), preserve_index=False)

        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate"])
        nord = pq.read_metadata(
            os.path.join(sf_dir, "orders.parquet")).num_rows
        j = shuffle_join(li.map_batches(partial, batch_format="pyarrow"),
                         orders, on="l_orderkey", right_on="o_orderkey",
                         num_partitions=_join_partitions(nord))
        j = _repaired(j, pa.schema([
            ("l_orderkey", pa.int64()), ("supp_nation", pa.string()),
            ("vol_e4", pa.int64()), ("o_custkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us"))]))
        cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey", "c_nationkey"])
        ncust = pq.read_metadata(
            os.path.join(sf_dir, "customer.parquet")).num_rows
        j2 = shuffle_join(j, cust, on="o_custkey", right_on="c_custkey",
                          num_partitions=_join_partitions(ncust))
        j2 = _repaired(j2, pa.schema([
            ("l_orderkey", pa.int64()), ("supp_nation", pa.string()),
            ("vol_e4", pa.int64()), ("o_custkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("c_nationkey", pa.int32())]))

        def market(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df = df[df["c_nationkey"].isin(asia_nat)]
            vol = df["vol_e4"].to_numpy().astype("int64")
            return pa.Table.from_pandas(pd.DataFrame({
                "o_year": df["o_orderdate"].dt.year.astype("int64"),
                "tot": vol,
                "nat": np.where(
                    (df["supp_nation"] == "NATION_3").to_numpy(), vol, 0),
            }), preserve_index=False)

        agg = preagg_sum(j2.map_batches(market, batch_format="pyarrow"),
                         ["o_year"], {"tot_e4": "tot", "nat_e4": "nat"}
                         ).to_pandas()
        agg["mkt_share_bp"] = trunc_div(
            10_000 * agg["nat_e4"].to_numpy(), agg["tot_e4"].to_numpy())
        agg["mkt_share_bp"] = agg["mkt_share_bp"].astype("int64")
        return agg[["o_year", "mkt_share_bp"]]

    def tpch_q11_important_parts(sf_dir):
        # Q11 shape (important stock, partsupp-free): per-part value
        # from one nation's shipments via combiner preagg; the global
        # threshold is a scalar over the part-sized aggregate (at scale:
        # a second tree-sum + broadcast filter — here the aggregate is
        # already small) — exact 1000·value > total integer predicate.
        nation = pq.read_table(
            os.path.join(sf_dir, "nation.parquet")).to_pandas()
        nk = set(nation.loc[nation["n_name"] == "NATION_5", "n_nationkey"])
        supp = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"),
            columns=["s_suppkey", "s_nationkey"]).to_pandas()
        sset = set(supp.loc[supp["s_nationkey"].isin(nk), "s_suppkey"])

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_extendedprice"])

        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df = df[df["l_suppkey"].isin(sset)]
            return pa.Table.from_pandas(pd.DataFrame({
                "p_partkey": df["l_partkey"].astype("int64"),
                "cents": np.round(df["l_extendedprice"].to_numpy() * 100)
                .astype("int64"),
            }), preserve_index=False)

        v = preagg_sum(li.map_batches(partial, batch_format="pyarrow"),
                       ["p_partkey"], {"value_e2": "cents"}).to_pandas()
        total = int(v["value_e2"].sum())
        v = v[1000 * v["value_e2"] > total]
        v["value_e2"] = v["value_e2"].astype("int64")
        return v[["p_partkey", "value_e2"]].reset_index(drop=True)

    def tpch_q12_late_lines(sf_dir):
        # Q12 shape (shipmode-style conditional counts): lineitem ⋈
        # orders hash-shuffle on orderkey, a row is "late" when it
        # ships ≥90 days after the order date; high/low-priority
        # indicator sums fold in a linestatus-keyed combiner preagg.
        import pyarrow.dataset as pads

        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import _join_partitions, shuffle_join

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_shipdate", "l_linestatus"],
            filter=(pads.field("l_shipdate") >= pd.Timestamp("1996-01-01"))
            & (pads.field("l_shipdate") < pd.Timestamp("1997-01-01")),
        )
        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
        nord = pq.read_metadata(
            os.path.join(sf_dir, "orders.parquet")).num_rows
        j = shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                         num_partitions=_join_partitions(nord))
        j = _repaired(j, pa.schema([
            ("l_orderkey", pa.int64()), ("l_shipdate", pa.timestamp("us")),
            ("l_linestatus", pa.string()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string())]))

        def late(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df = df[df["l_shipdate"]
                    >= df["o_orderdate"] + pd.Timedelta(days=90)]
            hi = df["o_orderpriority"].isin({"1-URGENT", "2-HIGH"}) \
                .to_numpy().astype("int64")
            return pa.Table.from_pandas(pd.DataFrame({
                "l_linestatus": df["l_linestatus"],
                "high": hi, "low": 1 - hi,
            }), preserve_index=False)

        return preagg_sum(j.map_batches(late, batch_format="pyarrow"),
                          ["l_linestatus"],
                          {"high_line_count": "high",
                           "low_line_count": "low"})

    def supplier_gini(sf_dir):
        # inequality coefficient over supplier revenue: exact-integer
        # Gini via the sorted-rank identity, supplier-keyed combiner
        # preagg then Python-int arithmetic on the supplier-sized
        # aggregate (sums exceed int64 — the oracle uses HUGEINT)
        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_suppkey", "l_extendedprice", "l_discount"])

        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            cents = np.round(
                df["l_extendedprice"].to_numpy() * 100).astype("int64")
            bp = np.round(df["l_discount"].to_numpy() * 100).astype("int64")
            return pa.Table.from_pandas(pd.DataFrame({
                "l_suppkey": df["l_suppkey"].astype("int64"),
                "x": cents * (100 - bp),
            }), preserve_index=False)

        rev = preagg_sum(li.map_batches(partial, batch_format="pyarrow"),
                         ["l_suppkey"], {"x": "x"}).to_pandas()
        rev = rev.sort_values(["x", "l_suppkey"]).reset_index(drop=True)
        n = len(rev)
        xs = [int(v) for v in rev["x"]]
        sx = sum(xs)
        six = sum((i + 1) * x for i, x in enumerate(xs))
        gini_bp = (10_000 * (2 * six - (n + 1) * sx)) // (n * sx)
        return pd.DataFrame({
            "n_suppliers": pd.Series([n], dtype="int64"),
            "gini_bp": pd.Series([int(gini_bp)], dtype="int64"),
        })

    def docs_source_entropy(sf_dir):
        # per-source language-mix entropy (nats, e6-floored per term —
        # the proven exact-int→double-once ln idiom): one (source,lang)
        # combiner preagg, entropy folded on the aggregate
        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["source", "lang"])

        def ones(batch: pa.Table) -> pa.Table:
            return pa.table({
                "source": batch.column("source"),
                "lang": batch.column("lang"),
                "n": pa.array(np.ones(batch.num_rows, dtype="int64")),
            })

        cnt = preagg_sum(docs.map_batches(ones, batch_format="pyarrow"),
                         ["source", "lang"], {"n": "n"}).to_pandas()
        tot = cnt.groupby("source")["n"].transform("sum").to_numpy()
        nn = cnt["n"].to_numpy().astype("int64")
        term = np.floor(
            (1_000_000 * nn) * np.log(tot / nn) / tot).astype("int64")
        out = cnt.assign(__t=term).groupby("source", as_index=False) \
            .agg(n_langs=("lang", "size"), h_e6=("__t", "sum"))
        out["n_langs"] = out["n_langs"].astype("int64")
        out["h_e6"] = out["h_e6"].astype("int64")
        return out.sort_values("source").reset_index(drop=True)

    def orders_benford(sf_dir):
        # Benford first-digit profile of order totals (data-quality
        # screen): exact cents, vectorized string first-digit, one
        # digit-keyed combiner preagg
        orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                 columns=["o_totalprice"])

        def digits(batch: pa.Table) -> pa.Table:
            cents = np.round(batch.column("o_totalprice")
                             .to_numpy(zero_copy_only=False) * 100) \
                .astype("int64")
            d = pd.Series(cents).astype(str).str[0].astype("int64")
            g = pd.DataFrame({"digit": d}) \
                .groupby("digit", as_index=False).size() \
                .rename(columns={"size": "n"})
            g["n"] = g["n"].astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False)

        out = preagg_sum(orders.map_batches(digits,
                                            batch_format="pyarrow"),
                         ["digit"], {"n": "n"}).to_pandas()
        return out.sort_values("digit").reset_index(drop=True)

    def supplier_pareto_top10(sf_dir):
        # concentration / Lorenz point: exact bp share of total revenue
        # captured by the top-10 suppliers — supplier-keyed combiner
        # preagg, total + top-k on the supplier-sized aggregate
        from raygraph.ops.relational import trunc_div

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_suppkey", "l_extendedprice", "l_discount"])

        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            cents = np.round(
                df["l_extendedprice"].to_numpy() * 100).astype("int64")
            bp = np.round(df["l_discount"].to_numpy() * 100).astype("int64")
            return pa.Table.from_pandas(pd.DataFrame({
                "s_suppkey": df["l_suppkey"].astype("int64"),
                "rev_e4": cents * (100 - bp),
            }), preserve_index=False)

        rev = preagg_sum(li.map_batches(partial, batch_format="pyarrow"),
                         ["s_suppkey"], {"rev_e4": "rev_e4"}).to_pandas()
        total = int(rev["rev_e4"].sum())
        top = int(rev.sort_values(["rev_e4", "s_suppkey"],
                                  ascending=[False, True])
                  .head(10)["rev_e4"].sum())
        return pd.DataFrame({
            "top10_rev_e4": pd.Series([top], dtype="int64"),
            "total_rev_e4": pd.Series([total], dtype="int64"),
            "share_bp": pd.Series([int(trunc_div(10_000 * top, total))],
                                  dtype="int64"),
        })

    def customer_order_gaps(sf_dir):
        # per-customer inter-order cadence: mean gap in exact trunc
        # centi-days, (max − min) // (n − 1) over order dates — a
        # (min, max, count) combiner preagg, finalize on the
        # customer-sized aggregate, customers with ≥ 2 orders only
        from raygraph.ops.relational import trunc_div

        orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                 columns=["o_custkey", "o_orderdate"])

        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            days = (df["o_orderdate"].to_numpy()
                    .astype("datetime64[D]").astype("int64"))
            g = pd.DataFrame({"c_custkey": df["o_custkey"].astype("int64"),
                              "lo": days, "hi": days, "n": 1}) \
                .groupby("c_custkey", as_index=False) \
                .agg(lo=("lo", "min"), hi=("hi", "max"), n=("n", "sum"))
            return pa.Table.from_pandas(g, preserve_index=False)

        from ray.data.aggregate import Max, Min, Sum

        agg = (orders.map_batches(partial, batch_format="pyarrow")
               .groupby("c_custkey")
               .aggregate(Min("lo", alias_name="lo"),
                          Max("hi", alias_name="hi"),
                          Sum("n", alias_name="n"))).to_pandas()
        agg = agg[agg["n"] >= 2].copy()
        span = (agg["hi"] - agg["lo"]).to_numpy().astype("int64")
        agg["mean_gap_cdays"] = trunc_div(
            100 * span, agg["n"].to_numpy().astype("int64") - 1)
        agg["n"] = agg["n"].astype("int64")
        agg["mean_gap_cdays"] = agg["mean_gap_cdays"].astype("int64")
        return agg[["c_custkey", "n", "mean_gap_cdays"]] \
            .reset_index(drop=True)

    def tpch_q15_top_supplier(sf_dir):
        # Q15 (top supplier): supplier-keyed combiner preagg over a
        # pruned + predicate-pushed scan; the max + equality filter act
        # on the supplier-sized aggregate; names broadcast on.
        import pyarrow.dataset as pads

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                     "l_discount"],
            filter=(pads.field("l_shipdate") >= pd.Timestamp("1996-01-01"))
            & (pads.field("l_shipdate") < pd.Timestamp("1996-04-01")),
        )

        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            cents = np.round(
                df["l_extendedprice"].to_numpy() * 100).astype("int64")
            bp = np.round(df["l_discount"].to_numpy() * 100).astype("int64")
            return pa.Table.from_pandas(pd.DataFrame({
                "s_suppkey": df["l_suppkey"].astype("int64"),
                "rev_e4": cents * (100 - bp),
            }), preserve_index=False)

        rev = preagg_sum(li.map_batches(partial, batch_format="pyarrow"),
                         ["s_suppkey"],
                         {"total_revenue_e4": "rev_e4"}).to_pandas()
        best = rev[rev["total_revenue_e4"]
                   == rev["total_revenue_e4"].max()].copy()
        supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                             columns=["s_suppkey", "s_name"]).to_pandas()
        best["s_name"] = best["s_suppkey"].map(
            dict(zip(supp["s_suppkey"], supp["s_name"])))
        best["total_revenue_e4"] = best["total_revenue_e4"].astype("int64")
        return best[["s_suppkey", "s_name",
                     "total_revenue_e4"]].reset_index(drop=True)

    def tpch_q17_small_qty(sf_dir):
        # Q17 (small-quantity-order revenue): pass 1 computes per-part
        # (Σqty, n) for the brand/type slice via combiner preagg; the
        # filtered-part-sized stats broadcast back into pass 2, where
        # the exact-integer predicate 5·qty·n < Σqty (⇔ qty < 0.2·avg)
        # gates a per-batch scalar sum folded by tree_aggregate.
        from raygraph.ops.relational import tree_aggregate, trunc_div

        part = pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_brand", "p_type"]).to_pandas()
        pset = set(part.loc[(part["p_brand"] == "Brand#23")
                            & (part["p_type"] == "MEDIUM"), "p_partkey"])

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_quantity", "l_extendedprice"])

        def stats(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df = df[df["l_partkey"].isin(pset)]
            return pa.Table.from_pandas(pd.DataFrame({
                "p_partkey": df["l_partkey"].astype("int64"),
                "qty": df["l_quantity"].to_numpy().astype("int64"),
            }), preserve_index=False)

        st = preagg_sum(li.map_batches(stats, batch_format="pyarrow"),
                        ["p_partkey"], {"sum_qty": "qty"},
                        counts="cnt").to_pandas()
        sumq = dict(zip(st["p_partkey"], st["sum_qty"]))
        cnt = dict(zip(st["p_partkey"], st["cnt"]))

        def small(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df = df[df["l_partkey"].isin(pset)]
            if not len(df):
                return pa.table({"cents": pa.array([0], pa.int64())})
            q = df["l_quantity"].to_numpy().astype("int64")
            n = df["l_partkey"].map(cnt).to_numpy().astype("int64")
            s = df["l_partkey"].map(sumq).to_numpy().astype("int64")
            keep = 5 * q * n < s
            cents = np.round(df["l_extendedprice"].to_numpy()[keep] * 100) \
                .astype("int64")
            return pa.table({"cents": pa.array([int(cents.sum())],
                                               pa.int64())})

        tot = tree_aggregate(
            li.map_batches(small, batch_format="pyarrow"),
            lambda df: pd.DataFrame({"cents": [int(df["cents"].sum())]}),
            precombined=True).to_pandas()
        return pd.DataFrame({"avg_yearly_e2": [
            int(trunc_div(int(tot["cents"].iloc[0]), 7))]})

    def tpch_q20_promo_suppliers(sf_dir):
        # Q20 shape (potential part promotion, partsupp-free): 'red'
        # part keys + the one nation's suppliers ride the closure, the
        # year window pushes into the scan, shipped quantity folds in a
        # supplier-keyed combiner preagg, threshold on the tiny result.
        import pyarrow.dataset as pads

        part = pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_name"]).to_pandas()
        pset = set(part.loc[part["p_name"].str.startswith("red "),
                            "p_partkey"])
        nation = pq.read_table(
            os.path.join(sf_dir, "nation.parquet")).to_pandas()
        nk = set(nation.loc[nation["n_name"] == "NATION_7", "n_nationkey"])
        supp = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"),
            columns=["s_suppkey", "s_name", "s_nationkey"]).to_pandas()
        supp = supp[supp["s_nationkey"].isin(nk)]
        sname = dict(zip(supp["s_suppkey"], supp["s_name"]))

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
            filter=(pads.field("l_shipdate") >= pd.Timestamp("1997-01-01"))
            & (pads.field("l_shipdate") < pd.Timestamp("1998-01-01")),
        )

        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df = df[df["l_partkey"].isin(pset)
                    & df["l_suppkey"].isin(sname)]
            return pa.Table.from_pandas(pd.DataFrame({
                "s_suppkey": df["l_suppkey"].astype("int64"),
                "qty": df["l_quantity"].to_numpy().astype("int64"),
            }), preserve_index=False)

        q = preagg_sum(li.map_batches(partial, batch_format="pyarrow"),
                       ["s_suppkey"], {"total_qty": "qty"}).to_pandas()
        q = q[q["total_qty"] > 50].copy()
        q["s_name"] = q["s_suppkey"].map(sname)
        q["total_qty"] = q["total_qty"].astype("int64")
        return q[["s_suppkey", "s_name",
                  "total_qty"]].reset_index(drop=True)

    def tpch_q21_waiting_suppliers(sf_dir):
        # Q21 shape (suppliers who kept orders waiting): distributed
        # EXISTS/NOT-EXISTS as a left_semi join against 'F'-status
        # orders, then per-order logic (≥2 suppliers, unique latest
        # shipper) in a hash_aggregate whose reduce sees every line of
        # its orders; per-supplier wait counts finish as a tiny preagg.
        import pyarrow.dataset as pads

        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import (_join_partitions,
                                             hash_aggregate, shuffle_join)

        fkeys = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderstatus"],
            filter=pads.field("o_orderstatus") == "F",
        ).drop_columns(["o_orderstatus"])
        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_suppkey", "l_shipdate"])
        nord = pq.read_metadata(
            os.path.join(sf_dir, "orders.parquet")).num_rows
        sj = shuffle_join(li, fkeys, on="l_orderkey", right_on="o_orderkey",
                          how="left_semi",
                          num_partitions=_join_partitions(nord))
        sj = _repaired(sj, pa.schema([
            ("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()),
            ("l_shipdate", pa.timestamp("us"))]))

        def reduce(df: pd.DataFrame) -> pd.DataFrame:
            per = df.groupby(["l_orderkey", "l_suppkey"],
                             as_index=False)["l_shipdate"].max()
            g = per.groupby("l_orderkey")["l_shipdate"]
            top = per[(per["l_shipdate"] == g.transform("max"))
                      & (per.groupby("l_orderkey")["l_suppkey"]
                         .transform("size") >= 2)]
            solo = top.groupby("l_orderkey")["l_suppkey"] \
                .transform("size") == 1
            return pd.DataFrame(
                {"s_suppkey": top.loc[solo, "l_suppkey"].astype("int64")})

        waits = hash_aggregate(sj, ["l_orderkey"], reduce)
        waits = _repaired(waits, pa.schema([("s_suppkey", pa.int64())]))
        nw = preagg_sum(waits, ["s_suppkey"], {},
                        counts="numwait").to_pandas()
        supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                             columns=["s_suppkey", "s_name"]).to_pandas()
        nw["s_name"] = nw["s_suppkey"].map(
            dict(zip(supp["s_suppkey"], supp["s_name"])))
        nw = nw.sort_values(["numwait", "s_suppkey"],
                            ascending=[False, True]).head(100)
        nw["numwait"] = nw["numwait"].astype("int64")
        return nw[["s_suppkey", "s_name", "numwait"]].reset_index(drop=True)

    def tpch_q4_exists(sf_dir):
        # Q4 shape (order-priority checking): orders with EXISTS a
        # heavily-discounted line — distributed EXISTS as a left_semi
        # hash join against the filtered lineitem key set; priority
        # counts via combiner preagg
        import pyarrow.dataset as pads

        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import (_join_partitions,
                                             hash_aggregate, shuffle_join)

        nord = pq.read_metadata(
            os.path.join(sf_dir, "orders.parquet")).num_rows
        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
            filter=(pads.field("o_orderdate") >= pd.Timestamp("1996-01-01"))
            & (pads.field("o_orderdate") < pd.Timestamp("1997-01-01")),
        ).drop_columns(["o_orderdate"])
        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_discount"],
            filter=pads.field("l_discount") >= 0.08,
        ).drop_columns(["l_discount"])
        keys = hash_aggregate(li, ["l_orderkey"],
                              lambda df: df.drop_duplicates())
        keys = _repaired(keys, pa.schema([("l_orderkey", pa.int64())]))
        sj = shuffle_join(orders, keys, on="o_orderkey",
                          right_on="l_orderkey", how="left_semi",
                          num_partitions=_join_partitions(nord))
        sj = _repaired(sj, pa.schema([("o_orderkey", pa.int64()),
                                      ("o_orderpriority", pa.string())]))
        return preagg_sum(sj, ["o_orderpriority"], {}, counts="order_count")

    def tpch_q13_custdist(sf_dir):
        # Q13 (customer order-count distribution incl. zero): per-cust
        # counts via combiner preagg on orders alone; the zero bucket is
        # total customers − customers-with-orders (two tiny scalars);
        # counts-of-counts finishes as a second small preagg
        from raygraph.ops.graph import _repaired

        orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                 columns=["o_custkey"])
        per_cust = preagg_sum(orders, ["o_custkey"], {}, counts="c_count")
        per_cust = _repaired(per_cust, pa.schema([
            ("o_custkey", pa.int64()), ("c_count", pa.int64())]))
        dist = preagg_sum(per_cust.drop_columns(["o_custkey"]),
                          ["c_count"], {}, counts="custdist").to_pandas()
        n_cust = pq.read_metadata(
            os.path.join(sf_dir, "customer.parquet")).num_rows
        n_with = int(dist["custdist"].sum())
        if n_cust > n_with:
            dist = pd.concat([dist, pd.DataFrame(
                {"c_count": [0], "custdist": [n_cust - n_with]})],
                ignore_index=True)
        dist["c_count"] = dist["c_count"].astype("int64")
        dist["custdist"] = dist["custdist"].astype("int64")
        return dist.sort_values("c_count", ignore_index=True)

    def tpch_q18_big_orders(sf_dir):
        # Q18 (large-volume orders): per-order quantity combiner preagg,
        # >300 filter, one shuffle join back to orders, customer name
        # broadcast, exact-cents top-20
        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import (_join_partitions,
                                             shuffle_join)

        li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=["l_orderkey", "l_quantity"])

        def ints(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            return pa.Table.from_pandas(pd.DataFrame({
                "l_orderkey": df["l_orderkey"],
                "qty": df["l_quantity"].to_numpy().astype("int64"),
            }), preserve_index=False)

        per_order = preagg_sum(li.map_batches(ints, batch_format="pyarrow"),
                               ["l_orderkey"], {"qty_sum": "qty"})
        per_order = _repaired(per_order, pa.schema([
            ("l_orderkey", pa.int64()), ("qty_sum", pa.int64())]))

        def big_only(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.greater(batch.column("qty_sum"), 300))

        nord = pq.read_metadata(
            os.path.join(sf_dir, "orders.parquet")).num_rows
        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_totalprice"])
        j = shuffle_join(orders,
                         per_order.map_batches(big_only,
                                               batch_format="pyarrow"),
                         on="o_orderkey", right_on="l_orderkey",
                         num_partitions=_join_partitions(nord))
        j = _repaired(j, pa.schema([
            ("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
            ("o_totalprice", pa.float64()), ("qty_sum", pa.int64())]))
        cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                             columns=["c_custkey", "c_name"]).to_pandas()
        df = j.to_pandas().rename(columns={"o_custkey": "c_custkey"})
        df["price_cents"] = np.round(
            df["o_totalprice"].to_numpy() * 100).astype("int64")
        df = df.merge(cust, on="c_custkey")
        df = df.sort_values(["price_cents", "o_orderkey"],
                            ascending=[False, True]).head(20)
        return df[["c_custkey", "c_name", "o_orderkey", "price_cents",
                   "qty_sum"]].reset_index(drop=True)

    def tpch_q22_idle(sf_dir):
        # Q22 shape (idle above-average customers): the average-balance
        # comparison is EXACT via integer cross-multiplication
        # (cents·n_pos > sum_pos_cents avoids the float average), the
        # no-orders test is a distributed left_anti join, per-segment
        # counts finish in a combiner preagg
        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import (_join_partitions,
                                             hash_aggregate, shuffle_join,
                                             tree_aggregate)

        cust = rd.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_acctbal", "c_mktsegment"])

        def pos_partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            cents = np.round(df["c_acctbal"].to_numpy() * 100).astype("int64")
            pos = cents[cents > 0]
            return pa.table({"s": pa.array([int(pos.sum())], pa.int64()),
                             "n": pa.array([len(pos)], pa.int64())})

        tot = tree_aggregate(
            cust.map_batches(pos_partial, batch_format="pyarrow"),
            lambda df: pd.DataFrame({"s": [int(df["s"].sum())],
                                     "n": [int(df["n"].sum())]}),
            precombined=True).to_pandas()
        s_pos, n_pos = int(tot["s"][0]), int(tot["n"][0])

        def above_avg(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            cents = np.round(df["c_acctbal"].to_numpy() * 100).astype("int64")
            keep = cents * n_pos > s_pos
            out = pd.DataFrame({
                "c_custkey": df["c_custkey"][keep],
                "c_mktsegment": df["c_mktsegment"][keep],
                "cents": cents[keep],
            })
            return pa.Table.from_pandas(out, preserve_index=False)

        import pyarrow.dataset as pads

        rich = cust.map_batches(above_avg, batch_format="pyarrow")
        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_totalprice"],
            filter=pads.field("o_totalprice") > 300_000.0,
        ).drop_columns(["o_totalprice"])
        okeys = hash_aggregate(orders, ["o_custkey"],
                               lambda df: df.drop_duplicates())
        okeys = _repaired(okeys, pa.schema([("o_custkey", pa.int64())]))
        idle = shuffle_join(rich, okeys, on="c_custkey",
                            right_on="o_custkey", how="left_anti",
                            num_partitions=_join_partitions())
        idle = _repaired(idle, pa.schema([
            ("c_custkey", pa.int64()), ("c_mktsegment", pa.string()),
            ("cents", pa.int64())]))
        return _repaired(
            preagg_sum(idle, ["c_mktsegment"],
                       {"totacctbal_cents": "cents"}, counts="numcust"),
            pa.schema([("c_mktsegment", pa.string()),
                       ("totacctbal_cents", pa.int64()),
                       ("numcust", pa.int64())]))

    def kg_degree_hist(sf_dir):
        # degree distribution (counts-of-counts) of the undirected
        # simple KG graph — two combiner preaggs, nothing graph-sized
        # on the driver
        from raygraph.ops.graph import _repaired, _und_graph

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        _, deg, _ = _und_graph(ed)
        return preagg_sum(deg.drop_columns(["vtx"]), ["deg"], {},
                          counts="n_vertices")

    def kg_edge_support(sf_dir):
        # k-truss building block: per-edge triangle support — the shared
        # degree-ordered triangle enumeration, each triangle exploded to
        # its 3 lex-canonical edges (vectorized), one combiner preagg;
        # edges outside any triangle have support 0 and are omitted
        from raygraph.ops.graph import edge_support

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        sup, _, _, _ = edge_support(ed)
        return sup

    def kg_edge_jaccard(sf_dir):
        # per-edge neighborhood Jaccard (structural similarity): support
        # left-joined onto the edge set, degrees attached by two
        # endpoint-hash joins, exact integer bp
        from raygraph.ops.graph import edge_jaccard

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return edge_jaccard(ed)

    def kg_truss3(sf_dir):
        # iterative k-truss peel (k=3, 2 synchronous rounds): each round
        # recomputes per-edge triangle support on the surviving edge set
        # and drops edges below k-2 — fixed rounds, SQL-reproducible
        from raygraph.ops.graph import truss_edges

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return truss_edges(ed, k=3, rounds=2)

    def kg_walks3(sf_dir):
        # deterministic walk sampling (node2vec-corpus shape): 3 hops
        # from every vertex via the md5-argmin successor table; one
        # argmin hash_aggregate + 3 frontier shuffle joins
        from raygraph.ops.graph import hash_greedy_walks

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return hash_greedy_walks(ed, steps=3)

    def kg_assortativity(sf_dir):
        # degree assortativity (Newman r) in exact-moment bp over
        # both-direction arcs
        from raygraph.ops.graph import degree_assortativity

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        return degree_assortativity(ed)

    def embedding_centroid_dot(sf_dir):
        # pairwise dot products of per-label centroid SUM vectors (e3
        # truncated ints — products fit int64): per-batch per-dim
        # partial sums, one (label, dim) combiner exchange, and the
        # final 10×64 matrix is aggregate-sized so the pair matmul is
        # closure arithmetic, not a data pass
        from raygraph.ops.vecops import vectors_to_numpy

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["label", "embedding"])

        def partial(batch: pa.Table) -> pa.Table:
            vecs = vectors_to_numpy(batch.column("embedding"), np.float64)
            e3 = (vecs * 1_000).astype("int64")    # trunc, like the SQL
            lab = batch.column("label").to_numpy(zero_copy_only=False) \
                .astype("int64")
            n, d = e3.shape
            df = pd.DataFrame({
                "label": np.repeat(lab, d),
                "dim": np.tile(np.arange(d, dtype="int64"), n),
                "s_e3": e3.reshape(-1),
            }).groupby(["label", "dim"], as_index=False)["s_e3"].sum()
            return pa.Table.from_pandas(df, preserve_index=False)

        sums = preagg_sum(emb.map_batches(partial, batch_format="pyarrow"),
                          ["label", "dim"], {"s_e3": "s_e3"}).to_pandas()
        mat = sums.pivot(index="label", columns="dim", values="s_e3") \
            .fillna(0).astype("int64")
        labels = mat.index.to_numpy()
        m = mat.to_numpy()
        dots = m @ m.T                              # exact in int64 at e3
        ia, ib = np.triu_indices(len(labels), k=1)
        return pd.DataFrame({
            "label_a": labels[ia].astype("int64"),
            "label_b": labels[ib].astype("int64"),
            "dot_e6": dots[ia, ib].astype("int64"),
        })

    def embedding_silhouette(sf_dir):
        # simplified silhouette per label with squared distances —
        # integer-exact end to end: centroids quantized to e6 by
        # truncating division of the per-(label,dim) SUM aggregate (one
        # tiny exchange), then one vectorized distance pass (int64
        # matmul, exact at these bounds) with per-point
        # s_e4 = trunc(10⁴·(b−a)/max(a,b,1)) folded per label
        from raygraph.ops.relational import trunc_div
        from raygraph.ops.vecops import vectors_to_numpy

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["label", "embedding"])

        def sums(batch: pa.Table) -> pa.Table:
            vecs = vectors_to_numpy(batch.column("embedding"), np.float64)
            e3 = (vecs * 1_000).astype("int64")
            lab = batch.column("label").to_numpy(zero_copy_only=False) \
                .astype("int64")
            n, d = e3.shape
            df = pd.DataFrame({
                "label": np.repeat(lab, d),
                "dim": np.tile(np.arange(d, dtype="int64"), n),
                "s_e3": e3.reshape(-1),
                "cnt": np.repeat(np.int64(1), n * d),
            }).groupby(["label", "dim"], as_index=False).sum()
            return pa.Table.from_pandas(df, preserve_index=False)

        agg = preagg_sum(emb.map_batches(sums, batch_format="pyarrow"),
                         ["label", "dim"],
                         {"s_e3": "s_e3", "cnt": "cnt"}).to_pandas()
        piv = agg.pivot(index="label", columns="dim", values="s_e3") \
            .fillna(0).astype("int64")
        labels = piv.index.to_numpy().astype("int64")
        counts = agg.groupby("label")["cnt"].max().reindex(piv.index) \
            .to_numpy().astype("int64")
        cen = trunc_div(piv.to_numpy() * 1_000,
                        counts[:, None])              # e6 centroids
        lab_pos = {int(l): i for i, l in enumerate(labels)}
        cnorm = (cen * cen).sum(axis=1)               # ≤ 2.6e14, exact

        def sil(batch: pa.Table) -> pa.Table:
            vecs = vectors_to_numpy(batch.column("embedding"), np.float64)
            x = (vecs * 1_000).astype("int64") * 1_000    # e6
            lab = batch.column("label").to_numpy(zero_copy_only=False) \
                .astype("int64")
            d2 = ((x * x).sum(axis=1)[:, None] + cnorm[None, :]
                  - 2 * (x @ cen.T))                  # exact int64
            own = np.array([lab_pos[int(v)] for v in lab])
            rows = np.arange(len(lab))
            a = d2[rows, own]
            masked = d2.copy()
            masked[rows, own] = np.iinfo(np.int64).max
            b = masked.min(axis=1)
            s_e4 = trunc_div(10_000 * (b - a),
                             np.maximum(np.maximum(a, b), 1))
            g = pd.DataFrame({"label": lab, "s_e4": s_e4}) \
                .groupby("label", as_index=False) \
                .agg(sum_s=("s_e4", "sum"), n=("s_e4", "size"))
            g["sum_s"] = g["sum_s"].astype("int64")
            g["n"] = g["n"].astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False)

        out = preagg_sum(emb.map_batches(sil, batch_format="pyarrow"),
                         ["label"], {"sum_s": "sum_s", "n": "n"}) \
            .to_pandas()
        out["avg_s_e4"] = trunc_div(out["sum_s"].to_numpy(),
                                    out["n"].to_numpy())
        out["n"] = out["n"].astype("int64")
        out["avg_s_e4"] = out["avg_s_e4"].astype("int64")
        return out[["label", "n", "avg_s_e4"]]

    def orders_percent_rank(sf_dir):
        # PERCENT_RANK within order priority by price — exact-integer
        # (10⁴·(rank−1)) // (n−1) with RANK tie semantics
        from raygraph.ops.relational import grouped_percent_rank

        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

        def cents(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["price_cents"] = np.round(
                df["o_totalprice"].to_numpy() * 100).astype("int64")
            return pa.Table.from_pandas(
                df[["o_orderkey", "o_orderpriority", "price_cents"]],
                preserve_index=False)

        return grouped_percent_rank(
            orders.map_batches(cents, batch_format="pyarrow"),
            ["o_orderpriority"], "price_cents")

    def events_type_mode(sf_dir):
        # exact per-user modal event type (ties -> lexicographically
        # smallest): combiner pair counts, one hash-bucketed argmax pass
        from raygraph.ops.relational import grouped_mode

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "event_type"])
        return grouped_mode(ev, ["user_id"], "event_type", counts="n")

    def events_cusum(sf_dir):
        # CUSUM change-point per event type over hourly counts: exact
        # integer D_t = T*cumsum - t*S via combiner preagg + one
        # hash-bucketed vectorized scan (stream shrinks to keys x hours)
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "ts"])
        return E.cusum_changepoint(ev)

    def docs_ttr(sf_dir):
        # lexical diversity per source: type-token + hapax ratios in
        # exact basis points; two combiner preaggs (vocab-bounded, then
        # slice-bounded) — the corpus never leaves the cluster
        ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                             columns=["source", "text"])
        return T.ttr_by_source(ds)

    def events_autocorr(sf_dir):
        # lag-1 autocorrelation of hourly counts per type: exact-moment
        # Pearson over consecutive present buckets (integer sums, one
        # double conversion, lineitem_corr discipline)
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "ts"])
        return E.autocorr_lag1(ev)

    def embedding_pair_hist(sf_dir):
        # embedding-space anisotropy histogram: block-sampled pairwise
        # cosines (id % 8 blocks) binned to floor(10*cos); per-block
        # matmul in one bucket task, only 21 bin rows cross the wire
        from raygraph.ops.ann import pair_cosine_hist

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        return pair_cosine_hist(emb)

    def events_markov(sf_dir):
        # stationary distribution of the event-type Markov chain: 3
        # integer power iterations over the (tiny) transition matrix
        # from type_transitions' combiner preagg
        ev = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "event_type"])
        return E.markov_stationary(ev)

    def events_twa(sf_dir):
        # time-weighted average value per user (gauge semantics):
        # integer 1e-4-unit values x microsecond gaps, trunc-div finish
        ev = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "value"])
        return E.time_weighted_avg(ev)

    def docs_from_csv(sf_dir):
        # third source format (after parquet + JSONL): the docs profile
        # re-ingested through ray.data.read_csv — byte-identical to the
        # parquet-path oracle (shared with docs_from_jsonl)
        csv_dir = os.path.join(_TMP, f"docs_csv_{_docs_count(sf_dir)}")
        if not os.path.isdir(csv_dir):
            rd.read_parquet(
                os.path.join(sf_dir, "documents.parquet"),
                columns=["doc_id", "lang", "n_chars"],
            ).write_csv(csv_dir)
        docs = rd.read_csv(csv_dir)
        return preagg_sum(docs, ["lang"], {"sum_chars": "n_chars"},
                          counts="n_docs")

    def docs_from_ipc(sf_dir):
        # fifth source format: Arrow IPC (Feather v2) round-trip via
        # the file-per-task reader with pruned memory-mapped decode —
        # oracled against the parquet originals
        from raygraph.io import read_table_ipc, write_table_ipc

        ipc_dir = os.path.join(_TMP, f"docs_ipc_{_docs_count(sf_dir)}")
        if not os.path.isdir(ipc_dir):
            write_table_ipc(
                rd.read_parquet(
                    os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "lang", "n_chars"]),
                ipc_dir)
        docs = read_table_ipc(ipc_dir, columns=["lang", "n_chars"])
        return preagg_sum(docs, ["lang"], {"sum_chars": "n_chars"},
                          counts="n_docs")

    def docs_from_orc(sf_dir):
        # fourth source format: the docs profile re-ingested through
        # the file-per-task ORC reader (io.read_table_orc) with column
        # pruning pushed into the stripe reader — oracled against the
        # parquet originals
        from raygraph.io import read_table_orc, write_table_orc

        orc_dir = os.path.join(_TMP, f"docs_orc_{_docs_count(sf_dir)}")
        if not os.path.isdir(orc_dir):
            write_table_orc(
                rd.read_parquet(
                    os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "source", "n_chars"]),
                orc_dir)
        docs = read_table_orc(orc_dir, columns=["source", "n_chars"])
        return preagg_sum(docs, ["source"], {"sum_chars": "n_chars"},
                          counts="n_docs")

    def docs_curate_spec(sf_dir):
        # the declarative curation engine (raygraph.curate) proven
        # against SQL: a 3-stage spec compiled onto the docs table,
        # reporting the funnel survivor count after each stage (the
        # CLI surface is `raygraph.cli curate`; run_curation's funnel
        # mode materializes stage boundaries so counting stage i never
        # re-executes stages 1..i-1 — here at check scale the lazy
        # prefixes are re-run instead)
        from raygraph.curate import compile_spec

        spec = [{"stage": "length_filter", "min_chars": 100},
                {"stage": "quality_filter", "min_quality": 0.5},
                {"stage": "exact_dedup"}]
        names, staged = compile_spec(_docs_ds(sf_dir), spec)
        rows = [(n, s.count()) for n, s in zip(names, staged)]
        return pd.DataFrame(rows, columns=["stage", "rows_out"])

    def ann_pq_top10(sf_dir):
        # product-quantization ANN: vectors collapse to m_sub=8 integer
        # codes (per-subspace Lloyd with the kmeans exact-integer
        # contract), queries scan via a lookup-table sum — the memory-
        # compression scale path next to IVF/LSH; oracle unrolls the
        # identical training + asymmetric-distance math
        from raygraph.ops.ann import pq_topk

        tab = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"])
        ids = tab.column("vec_id").to_numpy()
        qv = np.asarray(
            tab.column("embedding")[int(np.argmin(ids))].as_py(),
            dtype=np.float64)
        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        return pq_topk(emb, qv, m_sub=8, k_codes=16, iters=1, k=10)

    def docs_len_hdr_by_source(sf_dir):
        # per-source length quantiles from the grouped HDR sketch: the
        # exchange is |sources| x sketch cells, never the docs — the
        # profile-every-slice screen at corpus scale
        from raygraph.ops.sketch import hdr_quantiles_grouped

        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["source", "n_chars"])
        return hdr_quantiles_grouped(docs, ["source"], "n_chars",
                                     q_pcts=(50, 90, 99))

    def embedding_jl_project(sf_dir):
        # Johnson-Lindenstrauss ±1 sign projection to 8 dims: the
        # constant md5-derived matrix is cached once, each batch is one
        # int64 matmul, no shuffle — the distance-preserving shrink
        # step ahead of any ANN/cluster stage
        from raygraph.ops.cluster import jl_project

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        return jl_project(emb, k_out=8)

    def embedding_negatives(sf_dir):
        # deterministic contrastive negative sampling: 3 negatives per
        # anchor via md5(anchor:j) indexing into the broadcast sorted
        # id universe, self-collisions bumped one slot — reproducible
        # at any parallelism, SQL-replayable
        from raygraph.ops.relational import negative_sample

        ids = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["vec_id"]).column("vec_id") \
            .to_numpy()
        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id"])
        return negative_sample(emb, ids, k=3)

    def embedding_negatives_stratified(sf_dir):
        # hard-negative contract: negatives indexed into the sorted
        # COMPLEMENT universe of the anchor's label (never a positive);
        # per-label arrays broadcast once, anchors stream
        from raygraph.ops.relational import negative_sample_stratified

        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "label"])
        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "label"])
        return negative_sample_stratified(
            emb, t.column("vec_id").to_numpy(),
            t.column("label").to_numpy(), k=3)

    def orders_expectations(sf_dir):
        # declarative data-validation gate (the Great-Expectations
        # shape): 5 rules in one streaming pass + one pair exchange for
        # the uniqueness rule; output is the |rules|-sized violation
        # report
        from raygraph.ops.validate import check_rules

        orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"))
        return check_rules(orders, [
            {"rule": "not_null", "col": "o_custkey"},
            {"rule": "in_range", "col": "o_totalprice",
             "lo": 0.0, "hi": 200000.0},
            {"rule": "matches", "col": "o_orderpriority",
             "pattern": r"[0-9]-[A-Z ]+"},
            {"rule": "in_set", "col": "o_orderstatus",
             "values": ["O", "F"]},
            {"rule": "unique", "col": "o_orderkey"},
        ])

    def customer_fk_events(sf_dir):
        # referential-integrity rule against ANOTHER TABLE: which
        # customers never appear as an events.user_id — the FK audit
        # where the ref side is a second streamed table, not a
        # broadcast list
        from raygraph.ops.validate import check_rules

        cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey"])
        return check_rules(cust, [
            {"rule": "ref", "col": "c_custkey",
             "ref": os.path.join(sf_dir, "events.parquet"),
             "ref_col": "user_id"}])

    def docs_curate_quality(sf_dir):
        # quality-gate curation: the gopher_filter + c4_filter stages
        # from the declarative registry composed as one fused
        # streaming pass (compile_spec) — survivors only. The
        # synthetic corpus has no sentence punctuation, so an
        # id-derived 'fin. ' tail is injected identically here and in
        # the oracle (the established injection discipline)
        from raygraph.curate import compile_spec

        docs = _docs_ds(sf_dir, columns=("doc_id", "text", "n_chars"))

        tails = np.array(["fin. " * k for k in range(5)], dtype=object)

        def aug(batch: pa.Table) -> pa.Table:
            s = batch.column("text").to_pandas().fillna("")
            k = batch.column("doc_id").to_numpy(
                zero_copy_only=False) % 5
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "text": pa.array(
                    (s + " " + pd.Series(tails[k], index=s.index))
                    .to_numpy(), pa.string()),
                "n_chars": batch.column("n_chars"),
            })

        _, staged = compile_spec(
            docs.map_batches(aug, batch_format="pyarrow"),
            [{"stage": "gopher_filter"}, {"stage": "c4_filter"}])
        return staged[-1].select_columns(["doc_id", "n_chars"])

    def docs_psi_drift(sf_dir):
        # population stability index (the standard drift monitor for
        # serving/training skew): even- vs odd-numbered sources over
        # 10 fixed length bands, add-one smoothing so empty bins stay
        # defined; one (grp, bin)-keyed combiner preagg (20 cells),
        # then the exact per-bin e6 floor terms sum on the driver
        import math

        docs = _docs_ds(sf_dir, columns=("source", "n_chars"))

        def cells(batch: pa.Table) -> pa.Table:
            src = batch.column("source").to_pandas()
            grp = (src.str[3:].astype(int) % 2).astype("int64")
            nc = batch.column("n_chars").to_numpy(zero_copy_only=False)
            b = np.minimum(nc // 400, 9).astype("int64")
            df = pd.DataFrame({"grp": grp, "bin": b}) \
                .groupby(["grp", "bin"], as_index=False).size() \
                .rename(columns={"size": "n"})
            df["n"] = df["n"].astype("int64")
            return pa.Table.from_pandas(df, preserve_index=False)

        sp = preagg_sum(docs.map_batches(cells,
                                         batch_format="pyarrow"),
                        ["grp", "bin"], {"n": "n"}).to_pandas()
        cnt = {(int(r["grp"]), int(r["bin"])): int(r["n"])
               for _, r in sp.iterrows()}
        n1 = sum(v for (g, _), v in cnt.items() if g == 0) + 10
        n2 = sum(v for (g, _), v in cnt.items() if g == 1) + 10
        rows = []
        for b in range(10):
            a1 = cnt.get((0, b), 0) + 1
            b1 = cnt.get((1, b), 0) + 1
            term = math.floor(
                1_000_000 * (a1 / n1 - b1 / n2)
                * math.log((a1 * n2) / (b1 * n1)))
            rows.append((b, a1 - 1, b1 - 1, term))
        psi = sum(t for *_, t in rows)
        return pa.table({
            "bin": pa.array([r[0] for r in rows], pa.int64()),
            "n_even": pa.array([r[1] for r in rows], pa.int64()),
            "n_odd": pa.array([r[2] for r in rows], pa.int64()),
            "term_e6": pa.array([r[3] for r in rows], pa.int64()),
            "psi_e6": pa.array([psi] * 10, pa.int64()),
        })

    def docs_cramers_v(sf_dir):
        # Cramér's V association between lang and source: chi-squared
        # over the joint cells (one combiner preagg, |langs|x|sources|
        # rows) with exact unbounded-int terms on the driver, then the
        # normalized V — the effect-size twin of docs_lang_source_mi
        import math

        from raygraph.ops.graph import _repaired

        docs = _docs_ds(sf_dir, columns=("lang", "source"))
        cells = _repaired(
            preagg_sum(docs, ["lang", "source"], {}, counts="n"),
            pa.schema([("lang", pa.string()), ("source", pa.string()),
                       ("n", pa.int64())])).to_pandas()
        nl = cells.groupby("lang")["n"].sum()
        ns = cells.groupby("source")["n"].sum()
        big_n = int(cells["n"].sum())
        chi2_e6 = 0
        # absent cells contribute expected-count mass too: iterate the
        # full cross product (bounded by the two category sets)
        for lg, a in nl.items():
            for sc, b in ns.items():
                obs = cells.loc[(cells["lang"] == lg)
                                & (cells["source"] == sc), "n"]
                o = int(obs.iloc[0]) if len(obs) else 0
                num = (o * big_n - int(a) * int(b)) ** 2
                chi2_e6 += (1_000_000 * num) \
                    // (big_n * int(a) * int(b))
        k = min(len(nl) - 1, len(ns) - 1)
        v_e6 = math.floor(1_000_000 * math.sqrt(
            chi2_e6 / (1_000_000 * big_n * k))) if k > 0 else 0
        return pa.table({
            "n_docs": pa.array([big_n], pa.int64()),
            "chi2_e6": pa.array([chi2_e6], pa.int64()),
            "v_e6": pa.array([v_e6], pa.int64()),
        })

    def docs_ks_test(sf_dir):
        # Kolmogorov-Smirnov two-sample test on the en-vs-de doc
        # length distributions: one (lang, length) value-count
        # exchange (distinct lengths, never rows), then an exact
        # Python-int CDF sweep on the bounded spectrum — D as the
        # cross-multiplied integer max |c1*n2 - c2*n1| (no float CDFs)
        docs = _docs_ds(sf_dir, columns=("lang", "n_chars"))

        def keep(batch: pa.Table) -> pa.Table:
            m = pc.is_in(batch.column("lang"),
                         value_set=pa.array(["en", "de"]))
            t = batch.filter(m)
            return pa.table({"lang": t.column("lang"),
                             "x": t.column("n_chars").cast(pa.int64())})

        sp = preagg_sum(docs.map_batches(keep, batch_format="pyarrow"),
                        ["lang", "x"], {}, counts="n").to_pandas()
        # spectrum is bounded by distinct lengths — driver-exact ints
        w = sp.pivot_table(index="x", columns="lang", values="n",
                           fill_value=0, aggfunc="sum").sort_index()
        a = [int(v) for v in w.get("en", pd.Series(dtype=int))]
        b = [int(v) for v in w.get("de", pd.Series(dtype=int))]
        n1, n2 = sum(a), sum(b)
        d_num, ca, cb = 0, 0, 0
        for ai, bi in zip(a, b):
            ca, cb = ca + ai, cb + bi
            d_num = max(d_num, abs(ca * n2 - cb * n1))
        return pa.table({
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "d_num": pa.array([d_num], pa.int64()),
            "d_e6": pa.array([(1_000_000 * d_num) // (n1 * n2)
                              if n1 and n2 else 0], pa.int64()),
        })

    def docs_lang_source_mi(sf_dir):
        # mutual information between the lang and source columns (how
        # much one metadata facet predicts the other): joint counts
        # via ONE combiner preagg (|langs|x|sources| cells), marginals
        # folded from the cell table, per-cell e6-floored ln terms
        # summed as exact integers — reduction-order free
        from raygraph.ops.graph import _repaired

        docs = _docs_ds(sf_dir, columns=("lang", "source"))
        cells = _repaired(
            preagg_sum(docs, ["lang", "source"], {}, counts="n"),
            pa.schema([("lang", pa.string()), ("source", pa.string()),
                       ("n", pa.int64())])).to_pandas()
        # cell table is |langs|x|sources| — driver fold is bounded
        nl = cells.groupby("lang")["n"].sum()
        ns = cells.groupby("source")["n"].sum()
        big_n = int(cells["n"].sum())
        num = (cells["n"].to_numpy(dtype="int64")
               * big_n).astype("float64")
        den = (nl[cells["lang"]].to_numpy()
               * ns[cells["source"]].to_numpy()).astype("float64")
        t = np.floor(1_000_000 * cells["n"].to_numpy(dtype="int64")
                     * np.log(num / den)).astype("int64")
        return pa.table({
            "n_cells": pa.array([len(cells)], pa.int64()),
            "n_docs": pa.array([big_n], pa.int64()),
            "mi_sum_e6": pa.array([int(t.sum())], pa.int64()),
        })

    def orders_dow_chi2(sf_dir):
        # day-of-week uniformity chi-squared: per-dow counts via one
        # combiner preagg (7 rows), then EXACT Python-int fold of
        # sum((7*n_d - N)^2 // (7*N)) terms e6-scaled — no float
        # precision cliff at any scale (ints are unbounded on the
        # driver, HUGEINT in the oracle)
        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderdate"])

        def dow(batch: pa.Table) -> pa.Table:
            us = batch.column("o_orderdate").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            d = ((us // 86_400_000_000) + 4) % 7  # 1970-01-01 = Thu
            return pa.table({"dow": pa.array(d.astype("int64"))})

        counts = preagg_sum(
            orders.map_batches(dow, batch_format="pyarrow"),
            ["dow"], {}, counts="n").to_pandas()
        big_n = int(counts["n"].sum())
        chi = sum((1_000_000 * (7 * int(n) - big_n) ** 2)
                  // (7 * big_n)
                  for n in counts["n"])
        out = counts.sort_values("dow")
        return pa.table({
            "dow": pa.array(out["dow"].to_numpy(dtype="int64")),
            "n": pa.array(out["n"].to_numpy(dtype="int64")),
            "chi2_sum_e6": pa.array([chi] * len(out), pa.int64()),
        })

    def docs_topk_per_lang(sf_dir):
        # distributed arg-top-k per group (ROW_NUMBER() <= k): the 3
        # longest docs per language — per-batch vectorized top-k
        # partials (mergeable summary), one group-hash reduce; the
        # exchange carries <= k x groups x blocks rows
        from raygraph.ops.relational import topk_per_group

        docs = _docs_ds(sf_dir, columns=("doc_id", "lang", "n_chars"))
        return topk_per_group(docs, ["lang"], "n_chars", k=3,
                              tie_cols=["doc_id"])

    def orders_seasonal_decomp(sf_dir):
        # weekly seasonal decomposition (STL-lite): daily revenue =
        # day-of-week mean + residual, all exact cents — one day-keyed
        # combiner preagg builds the daily series, the 7-row dow means
        # fold from it on the driver, residuals are a pure map
        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderdate", "o_totalprice"])

        def daily(batch: pa.Table) -> pa.Table:
            us = batch.column("o_orderdate").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            p = batch.column("o_totalprice").to_numpy(
                zero_copy_only=False)
            return pa.table({
                "day": pa.array(us // 86_400_000_000, pa.int64()),
                "rev_c": pa.array(np.round(p * 100).astype("int64")),
            })

        days = preagg_sum(
            orders.map_batches(daily, batch_format="pyarrow"),
            ["day"], {"rev_c": "rev_c"}).to_pandas()
        # daily series is observation-window-sized; the dow fold is 7
        # rows — driver state is bounded by the calendar, not the data
        days["dow"] = ((days["day"] + 4) % 7).astype("int64")
        g = days.groupby("dow")["rev_c"].agg(["sum", "size"])
        mean = {d: int(s) // int(n)
                for d, (s, n) in g.iterrows()} if len(g) else {}
        days = days.sort_values("day").reset_index(drop=True)
        m = days["dow"].map(mean).astype("int64")
        return pa.table({
            "day": pa.array(days["day"].to_numpy(dtype="int64")),
            "rev_c": pa.array(days["rev_c"].to_numpy(dtype="int64")),
            "dow_mean_c": pa.array(m.to_numpy(dtype="int64")),
            "residual_c": pa.array(
                (days["rev_c"] - m).to_numpy(dtype="int64")),
        })

    def events_kaplan_meier(sf_dir):
        # Kaplan-Meier survival over user activity lifetimes (hour
        # grain): duration = last-first active hour, right-censored
        # when the user was active within 24h of the observation end
        # (day grain degenerates on this corpus: every user censors).
        # One user-keyed Min/Max exchange + a duration-spectrum preagg
        # (<= observation-window rows) — only the spectrum reaches the
        # driver; survival as per-term e6-floored ln increments
        # cumulated in duration order (order-free)
        import math

        from ray.data.aggregate import Max, Min

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts"])

        def days(batch: pa.Table) -> pa.Table:
            us = batch.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            df = pd.DataFrame({
                "user_id": batch.column("user_id").to_numpy(
                    zero_copy_only=False),
                "hr": us // 3_600_000_000,
            })
            g = df.groupby("user_id", as_index=False).agg(
                fd=("hr", "min"), ld=("hr", "max"))
            for c in ("user_id", "fd", "ld"):
                g[c] = g[c].astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False)

        per_user = ev.map_batches(days, batch_format="pyarrow") \
            .groupby("user_id") \
            .aggregate(Min("fd", alias_name="fd"),
                       Max("ld", alias_name="ld")).materialize()
        mx = int(per_user.max("ld"))

        def spectrum(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            dur = (df["ld"] - df["fd"]).astype("int64")
            cen = ((mx - df["ld"]) < 24).astype("int64")
            g = pd.DataFrame({"dur": dur, "cen": cen}) \
                .groupby("dur", as_index=False) \
                .agg(d_t=("cen", lambda s: int((1 - s).sum())),
                     c_t=("cen", "sum"))
            for c in ("dur", "d_t", "c_t"):
                g[c] = g[c].astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False)

        sp = preagg_sum(
            per_user.map_batches(spectrum, batch_format="pyarrow"),
            ["dur"], {"d_t": "d_t", "c_t": "c_t"}).to_pandas() \
            .sort_values("dur").reset_index(drop=True)
        # spectrum is <= observation-window-days rows: driver fold
        total = int((sp["d_t"] + sp["c_t"]).sum())
        leave = (sp["d_t"] + sp["c_t"]).cumsum().shift(
            fill_value=0).astype("int64")
        n_risk = total - leave
        terms = [
            math.floor(1_000_000 * math.log((int(n) - int(d))
                                            / int(n)))
            if int(n) > int(d) else 0
            for n, d in zip(n_risk, sp["d_t"])]
        return pa.table({
            "dur": pa.array(sp["dur"].to_numpy(dtype="int64")),
            "n_risk": pa.array(n_risk.to_numpy(dtype="int64")),
            "d_t": pa.array(sp["d_t"].to_numpy(dtype="int64")),
            "c_t": pa.array(sp["c_t"].to_numpy(dtype="int64")),
            "ln_surv_e6": pa.array(
                np.cumsum(np.array(terms, dtype="int64")), pa.int64()),
        })

    def events_assoc_rules(sf_dir):
        # market-basket association rules over per-user event-type
        # baskets: ONE pair-hash distinct exchange builds (user, type),
        # a user-keyed self-join (right side renamed first) yields
        # ordered co-occurrence pairs, combiner preaggs fold supports —
        # conf_bp and lift_e4 as exact integer cross-multiplies
        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import hash_aggregate, shuffle_join

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "event_type"])

        ut_schema = pa.schema([("user_id", pa.int64()),
                               ("event_type", pa.string())])
        ut = _repaired(
            hash_aggregate(
                ev.map_batches(
                    lambda b: pa.Table.from_pandas(
                        b.to_pandas().drop_duplicates(),
                        preserve_index=False),
                    batch_format="pyarrow"),
                ["user_id", "event_type"],
                lambda df: df.drop_duplicates()),
            ut_schema)

        n_t = preagg_sum(ut.select_columns(["event_type"]),
                         ["event_type"], {}, counts="n").to_pandas()
        n_users = preagg_sum(ut.select_columns(["user_id"]),
                             ["user_id"], {}, counts="__c").count()

        co = _repaired(
            shuffle_join(ut, ut.rename_columns(
                {"user_id": "__u2", "event_type": "type_b"})
                .materialize(),
                on="user_id", right_on="__u2"),
            pa.schema([("user_id", pa.int64()),
                       ("event_type", pa.string()),
                       ("type_b", pa.string())]))

        def ordered(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.not_equal(batch.column("event_type"),
                                          batch.column("type_b")))
            return pa.table({"type_a": t.column("event_type"),
                             "type_b": t.column("type_b")})

        both = preagg_sum(
            co.map_batches(ordered, batch_format="pyarrow"),
            ["type_a", "type_b"], {}, counts="n_both").to_pandas()
        # rule table is |types|^2 — driver fold is bounded
        cnt = dict(zip(n_t["event_type"], n_t["n"].astype(int)))
        na = both["type_a"].map(cnt).to_numpy(dtype="int64")
        nb = both["type_b"].map(cnt).to_numpy(dtype="int64")
        nboth = both["n_both"].to_numpy(dtype="int64")
        return pa.table({
            "type_a": pa.array(both["type_a"].astype(str)),
            "type_b": pa.array(both["type_b"].astype(str)),
            "n_both": pa.array(nboth),
            "conf_bp": pa.array((10_000 * nboth) // na, pa.int64()),
            "lift_e4": pa.array(
                (10_000 * nboth * n_users) // (na * nb), pa.int64()),
        })

    def events_mad_outliers(sf_dir):
        # robust outlier audit (median absolute deviation): per event
        # type, exact-integer median and MAD via the value-count
        # quantile exchange, outlier = 1e4*|v-med| > 3*14826*mad (the
        # 1.4826 consistency constant as an integer cross-multiply);
        # the per-type med/MAD tables broadcast once, never a shuffle
        # of the raw stream
        from raygraph.ops.relational import (broadcast_join,
                                             grouped_quantiles)

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "value"])

        def e4(batch: pa.Table) -> pa.Table:
            v = batch.column("value").to_numpy(zero_copy_only=False)
            return pa.table({
                "event_type": batch.column("event_type"),
                "v": pa.array(np.round(v * 10_000).astype("int64")),
            })

        vds = ev.map_batches(e4, batch_format="pyarrow").materialize()
        med = grouped_quantiles(vds, ["event_type"], "v",
                                qs=[0.5]).to_pandas() \
            .rename(columns={"p50": "med"})

        def dev(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["dev"] = (df["v"] - df["med"]).abs().astype("int64")
            return pa.Table.from_pandas(
                df[["event_type", "dev"]], preserve_index=False)

        dds = broadcast_join(vds, med, on="event_type") \
            .map_batches(dev, batch_format="pyarrow").materialize()
        mad = grouped_quantiles(dds, ["event_type"], "dev",
                                qs=[0.5]).to_pandas() \
            .rename(columns={"p50": "mad"})

        ref = med.merge(mad, on="event_type")

        def flag(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            out = (10_000 * (df["v"] - df["med"]).abs()
                   > 3 * 14_826 * df["mad"]).astype("int64")
            g = pd.DataFrame({"event_type": df["event_type"],
                              "o": out}) \
                .groupby("event_type", as_index=False) \
                .agg(n=("o", "size"), n_outliers=("o", "sum"))
            g["n"] = g["n"].astype("int64")
            g["n_outliers"] = g["n_outliers"].astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False)

        agg = preagg_sum(
            broadcast_join(vds, ref, on="event_type")
            .map_batches(flag, batch_format="pyarrow"),
            ["event_type"], {"n": "n", "n_outliers": "n_outliers"}) \
            .to_pandas().merge(ref, on="event_type")
        return pa.table({
            "event_type": pa.array(agg["event_type"].astype(str)),
            "n": pa.array(agg["n"].to_numpy(dtype="int64")),
            "med_e4": pa.array(agg["med"].to_numpy(dtype="int64")),
            "mad_e4": pa.array(agg["mad"].to_numpy(dtype="int64")),
            "n_outliers": pa.array(
                agg["n_outliers"].to_numpy(dtype="int64")),
        })

    def orders_abc_classes(sf_dir):
        # ABC / Pareto revenue concentration: per-customer revenue via
        # combiner preagg, then the descending global running share by
        # the two-phase ordered-prefix-sum scan — A while cum <= 80%,
        # B to 95%, C rest; exact 1e4*cum <= bp*total integer compares
        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import abc_classes

        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_totalprice"])

        def cents(batch: pa.Table) -> pa.Table:
            p = batch.column("o_totalprice").to_numpy(
                zero_copy_only=False)
            return pa.table({
                "o_custkey": batch.column("o_custkey"),
                "rev_c": pa.array(np.round(p * 100).astype("int64")),
            })

        rev = _repaired(
            preagg_sum(orders.map_batches(cents,
                                          batch_format="pyarrow"),
                       ["o_custkey"], {"rev_c": "rev_c"}),
            pa.schema([("o_custkey", pa.int64()),
                       ("rev_c", pa.int64())]))
        return abc_classes(rev, "o_custkey", "rev_c")

    def docs_c4_line_stats(sf_dir):
        # C4-style hygiene audit: per-doc line-filter survivors,
        # sentence count, brace/lorem boilerplate tells, pass flag —
        # one vectorized map pass, no exchange
        return T.c4_line_stats(_docs_ds(sf_dir))

    def docs_gopher_rules(sf_dir):
        # Gopher-style quality rule audit: per-doc fail flags for the
        # 5 list-free rules + pass_all — one vectorized map pass (two
        # per-batch explodes), no exchange, floor-at-4dp ratios
        return T.gopher_rules(_docs_ds(sf_dir))

    def docs_domain_mixture(sf_dir):
        # DoReMi-lite temperature sampling weights (alpha = 1/2): per
        # source, weight proportional to sqrt(token count) — combiner
        # preagg over vectorized token counting; only the domain table
        # (small by definition) is normalized on the driver
        return T.domain_mixture(
            _docs_ds(sf_dir, columns=("source", "text")))

    def docs_epoch_shuffle(sf_dir):
        # deterministic per-epoch training-order shuffle: dense global
        # position under the seed-keyed md5 permutation — two-phase
        # ordered-prefix-sum rank, only tile totals touch the driver
        from raygraph.ops.relational import epoch_shuffle

        return epoch_shuffle(_docs_ds(sf_dir, columns=("doc_id",)),
                             seed=7)

    def customer_privacy_audit(sf_dir):
        # k-anonymity + l-diversity release gate: quasi-identifier =
        # (nation, balance rounded to hundreds), sensitive = market
        # segment; group sizes via combiner preagg, diversity via the
        # pair-exchange distinct, one quasi-keyed join, int64 partials
        # fold to the one-row summary — the group inventory never
        # lands on the driver
        from raygraph.ops.validate import privacy_audit

        cust = rd.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_nationkey", "c_acctbal", "c_mktsegment"])

        def quasi(batch: pa.Table) -> pa.Table:
            bal = batch.column("c_acctbal").to_numpy(
                zero_copy_only=False)
            return pa.table({
                "nation": batch.column("c_nationkey").cast(pa.int64()),
                "bal_h": pa.array(
                    np.floor(bal / 100).astype("int64")),
                "segment": batch.column("c_mktsegment"),
            })

        return privacy_audit(
            cust.map_batches(quasi, batch_format="pyarrow"),
            ["nation", "bal_h"], k=3, sensitive_col="segment", l=2)

    def corpus_span_transitions(sf_dir):
        # interleaved-modality grammar of the corpus: adjacent
        # span-kind transition counts (text->media, media->text, ...)
        # via the flat-array + doc-boundary-mask bigram idiom over the
        # nested spans column — per-batch partials, kind²-sized output
        corpus = rd.read_parquet(_corpus_dir(sf_dir),
                                 columns=["spans"])

        def trans(batch: pa.Table) -> pa.Table:
            arr = batch.column("spans").combine_chunks()
            lens = pc.list_value_length(arr).to_numpy(
                zero_copy_only=False).astype("int64")
            kinds = arr.flatten().field("kind").to_pandas().to_numpy()
            total = int(lens.sum())
            if total < 2:
                return pa.table({"from_kind": pa.array([], pa.string()),
                                 "to_kind": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            valid = np.ones(total - 1, dtype=bool)
            ends = np.cumsum(lens[lens > 0]) - 1
            valid[ends[ends < total - 1]] = False
            df = pd.DataFrame({"from_kind": kinds[:-1][valid],
                               "to_kind": kinds[1:][valid]})
            g = df.groupby(["from_kind", "to_kind"], as_index=False) \
                .size().rename(columns={"size": "n"})
            g["n"] = g["n"].astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False)

        return preagg_sum(corpus.map_batches(trans,
                                             batch_format="pyarrow"),
                          ["from_kind", "to_kind"], {"n": "n"})

    def lineitem_join_cardinality(sf_dir):
        # planner support: exact big-join output size from key-count
        # tables (sum of count products) — the join never materializes,
        # only one int64 leaves the cluster
        from raygraph.ops.relational import join_cardinality

        li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=["l_orderkey"])
        orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                 columns=["o_orderkey"])
        n = join_cardinality(li, orders, on="l_orderkey",
                             right_on="o_orderkey")
        return pd.DataFrame({"n_join_rows": pd.array([n],
                                                     dtype="int64")})

    def orders_nation_revenue_auto(sf_dir):
        # adaptive join: the strategy picker counts the customer side
        # (small at every sf -> broadcast, zero shuffle) and must
        # reproduce the plain-join revenue rollup row for row
        from raygraph.ops.relational import auto_join

        orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                 columns=["o_custkey", "o_totalprice"])
        cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey", "c_nationkey"])
        j = auto_join(orders, cust, on="o_custkey",
                      right_on="c_custkey")

        def cents(batch: pa.Table) -> pa.Table:
            p = batch.column("o_totalprice").to_numpy(
                zero_copy_only=False)
            return pa.table({
                "c_nationkey": batch.column("c_nationkey"),
                "cents": pa.array(np.round(p * 100).astype("int64")),
            })

        return preagg_sum(j.map_batches(cents, batch_format="pyarrow"),
                          ["c_nationkey"], {"rev_cents": "cents"},
                          counts="n_orders")

    def events_key_skew(sf_dir):
        # the salt-hot-keys pre-shuffle diagnostic: top-10 heaviest
        # user_ids with exact counts and bp share of all events
        from raygraph.ops.relational import key_skew_report

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id"])
        return key_skew_report(ev, "user_id", top=10)

    def events_zscore(sf_dir):
        # volume-anomaly screen: hourly buckets >= 2 sd from the type
        # mean, z in exact floor-bp (integer moments, one double conv)
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "ts"])
        return E.zscore_outliers(ev)

    def docs_novelty(sf_dir):
        # n-gram novelty per doc: share of distinct trigrams first seen
        # here — min-doc groupby IS the novel count (no gram-level
        # join); two doc-keyed aggregates meet in one left-outer join
        return T.novelty_rate(_docs_ds(sf_dir))

    def events_attribution(sf_dir):
        # last-touch conversion attribution inside 30-min sessions:
        # grouped ffill + shift (the lag-IGNORE-NULLS analog) per user
        # bucket; only the touch-type histogram leaves the cluster
        ev = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "event_type", "value"])
        return E.attribution_last_touch(ev)

    def events_trend(sf_dir):
        # volume trend per type: exact-moment regression slope of count
        # vs bucket index (integer moments, one double division)
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "ts"])
        return E.trend_slope(ev)

    def docs_kl_drift(sf_dir):
        # slice-drift measurement: KL divergence of each source's lang
        # mix from the corpus-wide mix, per-term floor-at-1e-6 then
        # integer sum (the source_entropy discipline, so sum order
        # can't matter); all inputs are tiny combiner aggregates
        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["source", "lang"])
        c = preagg_sum(docs, ["source", "lang"], {},
                       counts="n").to_pandas()
        tot_s = c.groupby("source")["n"].transform("sum")
        n_l = dict(c.groupby("lang")["n"].sum())
        grand = int(c["n"].sum())
        terms = np.floor(
            (1_000_000 * c["n"]).astype("float64")
            * np.log((c["n"] * grand).astype("float64")
                     / (tot_s * c["lang"].map(n_l)).astype("float64"))
            / tot_s.astype("float64")).astype("int64")
        out = (pd.DataFrame({"source": c["source"], "t": terms})
               .groupby("source", sort=True)["t"].sum()
               .reset_index(name="kl_e6"))
        out["kl_e6"] = out["kl_e6"].astype("int64")
        return out

    def events_missing_hours(sf_dir):
        # time-series completeness audit: per type, hours in [min, max]
        # with NO events — span arithmetic + a lead-gap scan over the
        # present buckets (combiner preagg first, so the scan input is
        # keys x hours, never events)
        from raygraph.ops.relational import (compact_nonempty,
                                             hash_aggregate)

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "ts"])

        def hours(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            h = (df["ts"].astype("datetime64[us]").astype("int64")
                 // 3_600_000_000)
            return pa.Table.from_pandas(
                pd.DataFrame({"event_type": df["event_type"],
                              "hour": h}).drop_duplicates(),
                preserve_index=False)

        present = compact_nonempty(
            hash_aggregate(ev.map_batches(hours, batch_format="pyarrow"),
                           ["event_type", "hour"],
                           lambda df: df.drop_duplicates()).materialize())

        def scan(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["event_type", "hour"], kind="mergesort")
            g = df.groupby("event_type", sort=False)
            nxt = g["hour"].shift(-1)
            gap_after = nxt.notna() & (nxt - df["hour"] > 1)
            first_gap = df.loc[gap_after].groupby("event_type",
                                                  sort=False)["hour"] \
                .min() + 1
            agg = g["hour"].agg(["min", "max", "size"]).reset_index()
            agg["n_hours_span"] = (agg["max"] - agg["min"]
                                   + 1).astype("int64")
            agg["n_missing"] = (agg["n_hours_span"]
                                - agg["size"]).astype("int64")
            agg["first_gap_hour"] = agg["event_type"].map(first_gap) \
                .astype("Int64")
            out = agg.rename(columns={"size": "n_hours_present"})
            out["n_hours_present"] = out["n_hours_present"] \
                .astype("int64")
            return out[["event_type", "n_hours_present", "n_hours_span",
                        "n_missing", "first_gap_hour"]]

        return hash_aggregate(present, ["event_type"], scan)

    def orders_reconcile(sf_dir):
        # ledger reconciliation audit: o_totalprice vs the recomputed
        # line total Σ price·(1−disc)·(1+tax) in exact cents — one
        # big-big shuffle join, vectorized arithmetic, mismatch counts
        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import shuffle_join, tree_aggregate

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_extendedprice", "l_discount",
                     "l_tax"])

        def line_cents(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            cents = np.round(
                df["l_extendedprice"].to_numpy()
                * (1 - df["l_discount"].to_numpy())
                * (1 + df["l_tax"].to_numpy()) * 100).astype("int64")
            return pa.Table.from_pandas(pd.DataFrame({
                "ok": df["l_orderkey"], "cents": cents}),
                preserve_index=False)

        line_tot = _repaired(
            preagg_sum(li.map_batches(line_cents,
                                      batch_format="pyarrow"),
                       ["ok"], {"line_cents": "cents"}),
            pa.schema([("ok", pa.int64()), ("line_cents", pa.int64())]))

        od = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_totalprice"])

        def ord_cents(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            return pa.Table.from_pandas(pd.DataFrame({
                "ok2": df["o_orderkey"],
                "total_cents": np.round(df["o_totalprice"].to_numpy()
                                        * 100).astype("int64")}),
                preserve_index=False)

        j = _repaired(
            shuffle_join(od.map_batches(ord_cents,
                                        batch_format="pyarrow"),
                         line_tot, on="ok2", right_on="ok"),
            pa.schema([("ok2", pa.int64()), ("total_cents", pa.int64()),
                       ("line_cents", pa.int64())]))

        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            mism = (df["total_cents"] != df["line_cents"])
            return pa.table({
                "n_orders": pa.array([len(df)], pa.int64()),
                "n_mismatched": pa.array([int(mism.sum())], pa.int64()),
                "abs_diff_cents": pa.array(
                    [int((df["total_cents"]
                          - df["line_cents"]).abs().sum())], pa.int64()),
            })

        return tree_aggregate(
            j.map_batches(partial, batch_format="pyarrow",
                          batch_size=None),
            lambda df: pd.DataFrame({
                "n_orders": [int(df["n_orders"].sum())],
                "n_mismatched": [int(df["n_mismatched"].sum())],
                "abs_diff_cents": [int(df["abs_diff_cents"].sum())]}),
            precombined=True)

    def text_skipgrams(sf_dir):
        # window-2 skip-gram heavy hitters: the word2vec/PMI-matrix
        # counting primitive (flat token array + shifted views, no
        # per-row Python); only 20 rows reach the driver
        return T.skipgram_counts(_docs_ds(sf_dir), k=20, window=2)

    def orders_weekly(sf_dir):
        # calendar rollup on Monday-aligned week ids ((epoch_day+3)//7 —
        # 1970-01-01 was a Thursday), exact cents; same combiner shape
        # as every preagg rollup
        od = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderdate", "o_totalprice"])

        def weekly(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            day = (df["o_orderdate"].astype("datetime64[us]")
                   .astype("int64") // 86_400_000_000)
            return pa.Table.from_pandas(pd.DataFrame({
                "week_id": (day + 3) // 7,
                "cents": np.round(df["o_totalprice"].to_numpy()
                                  * 100).astype("int64"),
            }), preserve_index=False)

        return preagg_sum(od.map_batches(weekly, batch_format="pyarrow"),
                          ["week_id"], {"sum_cents": "cents"},
                          counts="n_orders")

    def text_char_trigrams(sf_dir):
        # langid feature table: char-trigram heavy hitters via ONE flat
        # byte array + stride-window per batch (no per-row Python)
        return T.char_trigram_counts(_docs_ds(sf_dir), k=20)

    def docs_interleave_sources(sf_dir):
        # balanced source interleaving (the training-order mixer):
        # per-source rank in one key-hash pass, then a distributed sort
        # by (rank, source) — only the head reaches the driver
        from raygraph.ops.relational import hash_aggregate

        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "source"])

        def rank(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["source", "doc_id"], kind="mergesort")
            df["rk"] = df.groupby("source", sort=False).cumcount() + 1
            return df[["rk", "source", "doc_id"]]

        ranked = hash_aggregate(docs, ["source"], rank)
        return ranked.sort(["rk", "source", "doc_id"]).limit(50)

    def events_peak_hours(sf_dir):
        # local-maxima peak detection over present hourly buckets: count
        # strictly above both neighbors (missing neighbor = -inf side);
        # combiner preagg then one lead/lag scan per key bucket
        from raygraph.ops.relational import (compact_nonempty,
                                             hash_aggregate)

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "ts"])

        def hours(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            h = (df["ts"].astype("datetime64[us]").astype("int64")
                 // 3_600_000_000)
            g = (pd.DataFrame({"event_type": df["event_type"],
                               "hour": h})
                 .groupby(["event_type", "hour"], sort=False)
                 .size().reset_index(name="n"))
            return pa.Table.from_pandas(g, preserve_index=False)

        counts = preagg_sum(ev.map_batches(hours,
                                           batch_format="pyarrow"),
                            ["event_type", "hour"], {"n": "n"})
        counts = compact_nonempty(counts.materialize())

        def scan(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["event_type", "hour"], kind="mergesort")
            g = df.groupby("event_type", sort=False)
            prev = g["n"].shift(1).fillna(-1)
            nxt = g["n"].shift(-1).fillna(-1)
            peak = (df["n"] > prev) & (df["n"] > nxt)
            out = df.loc[peak, ["event_type", "hour", "n"]].copy()
            out["hour"] = out["hour"].astype("int64")
            out["n"] = out["n"].astype("int64")
            return out

        return hash_aggregate(counts, ["event_type"], scan)

    def embedding_dim_stats(sf_dir):
        # per-dimension feature health: exact integer moments over
        # e6-quantized components (n, sum, sum-of-squares, floor
        # variance) — dims-sized output, one combiner pass
        from raygraph.ops.vecops import vectors_to_numpy

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["embedding"])

        LIMB = 1 << 32

        def dim_moments(batch: pa.Table) -> pa.Table:
            # Σx² per batch wraps int64 once the GLOBAL sum passes
            # ~3.7·10⁵ rows (x ~ 10⁶ ⇒ x² ~ 10¹²-10¹³), so the moment
            # ships the exchange as two int64 limbs (grouped_corr_bp
            # idiom) and recombines with Python ints at finalize —
            # exact to |Σx²| < 2⁹⁵, i.e. any realistic corpus
            x = np.trunc(vectors_to_numpy(batch.column("embedding"),
                                          np.float64) * 1_000_000) \
                .astype("int64")
            ss = [int(v) for v in
                  (x.astype(object) * x.astype(object)).sum(axis=0)]
            hi_lo = [divmod(v, LIMB) for v in ss]
            return pa.table({
                "dim": pa.array(np.arange(x.shape[1]), pa.int64()),
                "n": pa.array(np.full(x.shape[1], len(x)), pa.int64()),
                "s": pa.array(x.sum(axis=0), pa.int64()),
                "ss_hi": pa.array([h for h, _ in hi_lo], pa.int64()),
                "ss_lo": pa.array([l for _, l in hi_lo], pa.int64()),
            })

        agg = preagg_sum(emb.map_batches(dim_moments,
                                         batch_format="pyarrow"),
                         ["dim"], {"n": "n", "s": "s",
                                   "ss_hi": "ss_hi", "ss_lo": "ss_lo"})

        def finish(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            rows = []
            for _, r in df.iterrows():
                n, s = int(r["n"]), int(r["s"])
                ss = int(r["ss_hi"]) * LIMB + int(r["ss_lo"])
                var = math.floor(float(n * ss - s * s)
                                 / float(n * n))
                rows.append((int(r["dim"]), n, s, ss, var))
            out = pd.DataFrame(rows, columns=["dim", "n", "s", "ss",
                                              "var_e12"])
            return pa.Table.from_pandas(out, preserve_index=False)

        return agg.map_batches(finish, batch_format="pyarrow")

    def events_gap_cv(sf_dir):
        # burstiness via inter-arrival CV^2 per type (Poisson -> ~1):
        # exact integer µs-gap moments, one double division at the end
        import math

        from raygraph.ops.relational import (compact_nonempty,
                                             hash_aggregate)

        ev = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "ts", "event_id"])

        def narrow(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            return pa.Table.from_pandas(pd.DataFrame({
                "event_type": df["event_type"],
                "t": df["ts"].astype("datetime64[us]").astype("int64"),
                "event_id": df["event_id"],
            }), preserve_index=False)

        nds = compact_nonempty(
            ev.map_batches(narrow, batch_format="pyarrow").materialize())

        def bucket_cv(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["event_type", "t", "event_id"],
                                kind="mergesort")
            g = df.groupby("event_type", sort=False)
            df = df.assign(gap=df["t"] - g["t"].shift(1))
            df = df.loc[df["gap"].notna()]
            rows = []
            for key, part in df.groupby("event_type", sort=False):
                gs = [int(v) for v in part["gap"]]
                n, s = len(gs), sum(gs)
                ss = sum(v * v for v in gs)
                if s == 0:
                    continue
                cv2_bp = math.floor(
                    float(10_000 * (n * ss - s * s)) / float(s * s))
                rows.append((key, n, cv2_bp))
            return pd.DataFrame(rows, columns=["event_type", "n_gaps",
                                               "cv2_bp"])

        return hash_aggregate(nds, ["event_type"], bucket_cv)

    def text_cond_entropy(sf_dir):
        # LM predictability: conditional bigram entropy H(next|token) =
        # Σ c(xy)·ln(c(x)/c(xy)) / N in per-term-floor integers. The
        # bigram vocab STAYS DISTRIBUTED: unigram counts re-aggregate
        # from the bigram table, join back on the first token, and the
        # floored terms tree-sum — only two scalars reach the driver.
        ds = _docs_ds(sf_dir)

        def big_counts(batch: pa.Table) -> pa.Table:
            s = batch.column("text").to_pandas().fillna("")
            toks = s.str.strip().str.lower().str.split()
            lens = toks.str.len().fillna(0).astype("int64").to_numpy()
            total = int(lens.sum())
            if total < 2:
                return pa.table({"x": pa.array([], pa.string()),
                                 "y": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            flat = np.concatenate(
                [np.asarray(t, dtype=object) for t in toks if len(t)])
            valid = np.ones(total - 1, dtype=bool)
            ends = np.cumsum(lens[lens > 0]) - 1
            valid[ends[ends < total - 1]] = False
            g = (pd.DataFrame({"x": flat[:-1][valid],
                               "y": flat[1:][valid]})
                 .groupby(["x", "y"], sort=False)
                 .size().reset_index(name="n"))
            return pa.Table.from_pandas(g, preserve_index=False)

        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import shuffle_join

        bi = _repaired(
            preagg_sum(ds.map_batches(big_counts,
                                      batch_format="pyarrow"),
                       ["x", "y"], {"n": "n"}),
            pa.schema([("x", pa.string()), ("y", pa.string()),
                       ("n", pa.int64())]))
        uni = _repaired(
            preagg_sum(bi.select_columns(["x", "n"]), ["x"],
                       {"nx": "n"}),
            pa.schema([("x", pa.string()), ("nx", pa.int64())]))
        total = int(bi.sum("n"))
        j = _repaired(
            shuffle_join(bi, uni.rename_columns({"x": "x2"}), on="x",
                         right_on="x2"),
            pa.schema([("x", pa.string()), ("y", pa.string()),
                       ("n", pa.int64()), ("nx", pa.int64())]))

        def term_partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            t = np.floor(
                (1_000_000 * df["n"]).astype("float64")
                * np.log(df["nx"].astype("float64")
                         / df["n"].astype("float64"))
                / total).astype("int64")
            return pa.table({"h": pa.array([int(t.sum())], pa.int64())})

        h = int(j.map_batches(term_partial, batch_format="pyarrow")
                .sum("h"))
        return pd.DataFrame({
            "n_bigrams": pd.array([total], dtype="int64"),
            "h_cond_e6": pd.array([h], dtype="int64"),
        })

    def docs_source_jaccard(sf_dir):
        # dataset-similarity telemetry: pairwise Jaccard (exact bp)
        # between sources over their DISTINCT trigram sets — gram-keyed
        # self-join co-locates shared grams, set sizes ride a tiny
        # source-sized aggregate; output is #source-pairs rows
        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import hash_aggregate, shuffle_join
        from raygraph.ops.text import _doc_ngrams

        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["source", "text"])

        def grams(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            g = _doc_ngrams(df["text"], 3)
            out = pd.DataFrame({
                "source": df["source"].to_numpy()[g.index.to_numpy()],
                "ngram": g["ngram"].to_numpy(),
            }).drop_duplicates()
            return pa.Table.from_pandas(out, preserve_index=False)

        sg = _repaired(
            hash_aggregate(docs.map_batches(grams,
                                            batch_format="pyarrow"),
                           ["source", "ngram"],
                           lambda df: df.drop_duplicates()),
            pa.schema([("source", pa.string()), ("ngram", pa.string())]))
        sizes = preagg_sum(sg.select_columns(["source"]), ["source"],
                           {}, counts="sz").to_pandas()
        sz = dict(zip(sizes["source"], sizes["sz"].astype(int)))

        other = sg.map_batches(
            lambda b: b.rename_columns(["source_b", "ngram_b"]),
            batch_format="pyarrow")
        pairs = _repaired(
            shuffle_join(sg, other, on="ngram", right_on="ngram_b"),
            pa.schema([("source", pa.string()), ("ngram", pa.string()),
                       ("source_b", pa.string())]))

        def pair_partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df = df.loc[df["source"] < df["source_b"]]
            g = (df.groupby(["source", "source_b"], sort=False)
                 .size().reset_index(name="inter"))
            return pa.Table.from_pandas(g, preserve_index=False)

        inter = preagg_sum(
            pairs.map_batches(pair_partial, batch_format="pyarrow"),
            ["source", "source_b"], {"inter": "inter"}).to_pandas()
        a = inter["source"].map(sz).astype("int64")
        b = inter["source_b"].map(sz).astype("int64")
        union = a + b - inter["inter"]
        out = pd.DataFrame({
            "source_a": inter["source"],
            "source_b": inter["source_b"],
            "n_inter": inter["inter"].astype("int64"),
            "jaccard_bp": ((10_000 * inter["inter"]) // union)
            .astype("int64"),
        })
        return out.sort_values(["source_a", "source_b"]) \
            .reset_index(drop=True)

    def events_stickiness(sf_dir):
        # DAU/MAU stickiness per day (exact bp): two distinct-pair
        # combiner aggregates (day-user, month-user) meet on the
        # month key — the engagement-telemetry staple
        from raygraph.ops.relational import distinct_count

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts"])

        def keys(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            day = (df["ts"].astype("datetime64[us]").astype("int64")
                   // 86_400_000_000)
            return pa.Table.from_pandas(pd.DataFrame({
                "user_id": df["user_id"], "day": day,
                "month": day // 30,
            }).drop_duplicates(), preserve_index=False)

        kds = ev.map_batches(keys, batch_format="pyarrow").materialize()
        dau = distinct_count(kds, ["day", "month"], "user_id",
                             out="dau").to_pandas()
        mau = distinct_count(kds, ["month"], "user_id",
                             out="mau").to_pandas()
        m = dau.merge(mau, on="month")
        m["stickiness_bp"] = (10_000 * m["dau"]) // m["mau"]
        for c in ("day", "dau", "mau", "stickiness_bp"):
            m[c] = m[c].astype("int64")
        return m[["day", "dau", "mau", "stickiness_bp"]] \
            .sort_values("day").reset_index(drop=True)

    def events_hll_algebra(sf_dir):
        # HLL sketch set algebra: audiences A (users of the first
        # event type) and B (users of the last) — |A|, |B| from their
        # own registers, |A∪B| from the register-wise max (the merge a
        # distributed pair of sketch holders performs), |A∩B| by
        # inclusion-exclusion; exact-integer spec end to end
        import pyarrow.compute as pc

        from raygraph.ops.sketch import hll_set_algebra

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "event_type"])
        types = sorted(
            ev.groupby("event_type").count()
            .to_pandas()["event_type"])
        t_a, t_b = types[0], types[-1]

        def pick(t):
            def fn(batch: pa.Table) -> pa.Table:
                return batch.filter(
                    pc.equal(batch.column("event_type"), t)) \
                    .select(["user_id"])
            return fn

        return hll_set_algebra(
            ev.map_batches(pick(t_a), batch_format="pyarrow"),
            ev.map_batches(pick(t_b), batch_format="pyarrow"),
            "user_id")

    def events_cuped(sf_dir):
        # CUPED variance reduction (Deng et al., WSDM'13): per-user
        # pre/post value sums split at the mid-day, pooled
        # theta = cov(x,y)/var(x) from exact integer moments, per-arm
        # adjusted mean — everything integer until ONE final double
        # divide mirrored by the HUGEINT::DOUBLE oracle. Combiner
        # exchanges only: events → user sums → 5 pooled scalars +
        # 2 arm rows
        import math

        from raygraph.ops.relational import preagg_sum

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts", "value"])

        def days(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            d = (df["ts"].to_numpy().astype("datetime64[us]")
                 .astype("int64") // 86_400_000_000)
            return pa.table({"d": pa.array(d, pa.int64())})

        dd = ev.map_batches(days, batch_format="pyarrow")
        dmin = int(dd.min("d"))
        dmax = int(dd.max("d"))
        mid = (dmin + dmax + 1) // 2

        def xy(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            d = (df["ts"].to_numpy().astype("datetime64[us]")
                 .astype("int64") // 86_400_000_000)
            v = np.trunc(df["value"].to_numpy() * 100).astype("int64")
            pre = d < mid
            return pa.table({
                "user_id": pa.array(df["user_id"], pa.int64()),
                "x": pa.array(np.where(pre, v, 0), pa.int64()),
                "y": pa.array(np.where(pre, 0, v), pa.int64()),
            })

        users = preagg_sum(ev.map_batches(xy, batch_format="pyarrow"),
                           ["user_id"], {"x": "x", "y": "y"}) \
            .to_pandas()
        x = users["x"].astype("int64")
        y = users["y"].astype("int64")
        n_all = len(users)
        sx, sy = int(x.sum()), int(y.sum())
        sxx = int((x * x).sum())
        sxy = int((x * y).sum())
        nu = n_all * sxy - sx * sy
        den = n_all * sxx - sx * sx
        arm = (users["user_id"].astype("int64") % 2).astype("int64")
        rows = []
        for a in (0, 1):
            m = arm == a
            n_arm = int(m.sum())
            sy_a, sx_a = int(y[m].sum()), int(x[m].sum())
            big_m = (den * n_all * sy_a
                     - nu * (n_all * sx_a - n_arm * sx))
            raw = abs(sy_a) // n_arm          # DuckDB // truncates
            rows.append({
                "arm": a, "n_users": n_arm,
                "raw_mean_c": raw if sy_a >= 0 else -raw,
                "adj_mean_c": math.floor(
                    big_m / (den * n_all * n_arm)),
            })
        return pd.DataFrame(rows).astype("int64")

    def events_bipartite_proj(sf_dir):
        # one-mode co-presence projection: users become adjacent when
        # they act in the same (event_type, hour) context — the
        # standard bipartite→unipartite graph construction with the
        # hub cap (right degree <= 20) that keeps pair fan-out
        # bounded; edges weighted by shared contexts, threshold 2
        from raygraph.ops.graph import bipartite_projection

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "event_type", "ts"])

        def ctx(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            hour = (df["ts"].to_numpy().astype("datetime64[us]")
                    .astype("int64") // 3_600_000_000)
            return pa.table({
                "l": pa.array(df["user_id"].astype(str), pa.string()),
                "r": pa.array(df["event_type"].str.cat(
                    pd.Series(hour).astype(str), sep=":"), pa.string()),
            })

        return bipartite_projection(
            ev.map_batches(ctx, batch_format="pyarrow"), "l", "r",
            max_right_degree=20, min_shared=2)

    def events_ab_arms(sf_dir):
        # experimentation telemetry: users hash-split 50/50 into arms
        # (content-keyed md5 — engine- and layout-independent), per-arm
        # exact e4 value sums/counts + the arm mean difference
        import hashlib

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "value"])

        def assign(batch: pa.Table) -> pa.Table:
            ids = batch.column("user_id").to_pandas().astype(str)
            h = ids.map(lambda s: int(
                hashlib.md5(s.encode()).hexdigest()[:15], 16) % 2)
            v = np.round(batch.column("value")
                         .to_numpy(zero_copy_only=False)
                         * 10_000).astype("int64")
            return pa.table({
                "arm": pa.array(np.where(h == 0, "A", "B"), pa.string()),
                "v": pa.array(v, pa.int64()),
            })

        agg = preagg_sum(ev.map_batches(assign, batch_format="pyarrow"),
                         ["arm"], {"sum_e4": "v"},
                         counts="n_events").to_pandas() \
            .set_index("arm")
        mean = {a: int(agg.loc[a, "sum_e4"]) // int(agg.loc[a, "n_events"])
                for a in ("A", "B")}
        return pd.DataFrame({
            "n_a": pd.array([int(agg.loc["A", "n_events"])],
                            dtype="int64"),
            "n_b": pd.array([int(agg.loc["B", "n_events"])],
                            dtype="int64"),
            "mean_a_e4": pd.array([mean["A"]], dtype="int64"),
            "mean_b_e4": pd.array([mean["B"]], dtype="int64"),
            "diff_e4": pd.array([mean["A"] - mean["B"]], dtype="int64"),
        })

    def docs_code_score(sf_dir):
        # code-vs-prose screen (the LLM-data mix classifier): density of
        # code-ish chars ({};=<>()#) per char in floor-bp; is_code at
        # >= 300 bp — one vectorized count pass, no shuffle
        docs = _docs_ds(sf_dir)

        def score(batch: pa.Table) -> pa.Table:
            s = batch.column("text").to_pandas().fillna("")
            n_chars = s.str.len().astype("int64")
            codeish = s.str.count(r"[{};=<>()#]").astype("int64")
            bp = (10_000 * codeish) // n_chars.replace(0, 1)
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "code_bp": pa.array(bp.to_numpy(), pa.int64()),
                "is_code": pa.array((bp >= 300).to_numpy(), pa.bool_()),
            })

        return docs.map_batches(score, batch_format="pyarrow")

    def orders_size_hist(sf_dir):
        # order-size distribution: lineitems per order -> count-of-counts
        # (two combiner preaggs; the fan-out telemetry histogram)
        li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=["l_orderkey"])
        per_order = preagg_sum(li, ["l_orderkey"], {}, counts="n_items")
        return preagg_sum(per_order.select_columns(["n_items"]),
                          ["n_items"], {}, counts="n_orders")

    def kg_bfs_hist(sf_dir):
        # reach profile: BFS hop-distance histogram from the kg_bfs
        # pivot (frontier growth rate — the small-world diagnostic)
        from raygraph.ops.graph import bfs_distance, distinct_pairs

        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["_from", "_to"])
        deg = preagg_sum(distinct_pairs(ed).select_columns(["_from"]),
                         ["_from"], {}, counts="d")
        top = deg.sort(["d", "_from"], descending=[True, False]).take(1)
        dists = bfs_distance(ed, source=top[0]["_from"], iters=3)
        return preagg_sum(dists.select_columns(["dist"]), ["dist"], {},
                          counts="n_vertices")

    def events_cohort_revenue(sf_dir):
        # LTV triangle: revenue by (signup-week cohort, age in weeks) —
        # user-first-week map is user-sized (closure-broadcast), the
        # revenue pass is one combiner preagg; exact e4 cents
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts", "value"])

        first = ev.groupby("user_id").min("ts").to_pandas()
        fweek = dict(zip(
            first["user_id"],
            (first["min(ts)"].astype("datetime64[us]").astype("int64")
             // 86_400_000_000 + 3) // 7))

        def tag(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            week = (df["ts"].astype("datetime64[us]").astype("int64")
                    // 86_400_000_000 + 3) // 7
            cohort = df["user_id"].map(fweek).astype("int64")
            return pa.Table.from_pandas(pd.DataFrame({
                "cohort_week": cohort,
                "age_weeks": (week - cohort).astype("int64"),
                "v": np.round(df["value"].to_numpy()
                              * 10_000).astype("int64"),
            }), preserve_index=False)

        return preagg_sum(ev.map_batches(tag, batch_format="pyarrow"),
                          ["cohort_week", "age_weeks"],
                          {"revenue_e4": "v"}, counts="n_events")

    def events_dow_profile(sf_dir):
        # weekly seasonality: exact e4 sums per day-of-week
        # (1970-01-01 was a Thursday -> dow = (epoch_day + 4) % 7)
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["ts", "value"])

        def tag(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            day = (df["ts"].astype("datetime64[us]").astype("int64")
                   // 86_400_000_000)
            return pa.Table.from_pandas(pd.DataFrame({
                "dow": ((day + 4) % 7).astype("int64"),
                "v": np.round(df["value"].to_numpy()
                              * 10_000).astype("int64"),
            }), preserve_index=False)

        return preagg_sum(ev.map_batches(tag, batch_format="pyarrow"),
                          ["dow"], {"sum_e4": "v"}, counts="n_events")

    def docs_from_jsonl_lenient(sf_dir):
        # dead-letter ingest: a JSONL export with TWO injected malformed
        # lines must yield the clean per-lang profile (quarantine counts
        # are asserted in-query) — the forgiving counterpart of the
        # hard-error reference parser contract
        from raygraph.io import read_jsonl_lenient

        jdir = os.path.join(_TMP,
                            f"docs_jsonl_bad_{_docs_count(sf_dir)}")
        if not os.path.isdir(jdir):
            rd.read_parquet(
                os.path.join(sf_dir, "documents.parquet"),
                columns=["doc_id", "lang", "n_chars"],
            ).write_json(jdir)
            victim = sorted(
                f for f in os.listdir(jdir) if f.endswith(".json"))[0]
            with open(os.path.join(jdir, victim), "a") as fh:
                fh.write('{"doc_id": 1, "lang": "en", broken\n')
                fh.write("not json at all\n")

        schema = pa.schema([("doc_id", pa.int64()),
                            ("lang", pa.string()),
                            ("n_chars", pa.int64())])
        good, bad = read_jsonl_lenient(jdir, schema=schema)
        assert bad.count() == 2, "quarantine must catch both bad lines"
        return preagg_sum(good, ["lang"], {"sum_chars": "n_chars"},
                          counts="n_docs")

    def events_bounce_rate(sf_dir):
        # engagement quality: single-event-session share in exact bp —
        # sessionize once, tree-sum two counters
        from raygraph.ops.events import sessionize
        from raygraph.ops.relational import tree_aggregate

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts"])
        sess = sessionize(ev)

        def partial(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            ne = batch.column("n_events").to_numpy(zero_copy_only=False)
            return pa.table({
                "n_sessions": pa.array([n], pa.int64()),
                "n_bounce": pa.array([int((ne == 1).sum())], pa.int64()),
            })

        tot = tree_aggregate(
            sess.map_batches(partial, batch_format="pyarrow",
                             batch_size=None),
            lambda df: pd.DataFrame({
                "n_sessions": [int(df["n_sessions"].sum())],
                "n_bounce": [int(df["n_bounce"].sum())]}),
            precombined=True).to_pandas()
        ns, nb = int(tot["n_sessions"][0]), int(tot["n_bounce"][0])
        return pd.DataFrame({
            "n_sessions": pd.array([ns], dtype="int64"),
            "n_bounce": pd.array([nb], dtype="int64"),
            "bounce_bp": pd.array([10_000 * nb // ns], dtype="int64"),
        })

    def docs_length_log_hist(sf_dir):
        # log2-bucketed token-length histogram (the long-tail length
        # profile): powers of two are exactly representable so
        # floor(log2) agrees bit-for-bit across engines
        ds = _docs_ds(sf_dir)

        def buckets(batch: pa.Table) -> pa.Table:
            s = batch.column("text").to_pandas().fillna("")
            n = s.str.strip().str.lower().str.split().str.len() \
                .astype("int64").to_numpy()
            n = n[n >= 1]
            b = np.floor(np.log2(n.astype("float64"))).astype("int64")
            g = pd.Series(b).value_counts().rename_axis("log2_tokens") \
                .reset_index(name="n_docs")
            return pa.Table.from_pandas(g, preserve_index=False)

        return preagg_sum(ds.map_batches(buckets,
                                         batch_format="pyarrow"),
                          ["log2_tokens"], {"n_docs": "n_docs"})

    def orders_first_repeat(sf_dir):
        # acquisition-vs-retention split: each order classified first /
        # repeat by its customer's earliest order (ties: earliest
        # date only — ALL same-day firsts count as first); customer
        # first-date map is customer-sized, revenue pass is one preagg
        od = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_orderdate", "o_totalprice"])

        first = od.groupby("o_custkey").min("o_orderdate").to_pandas()
        fmap = dict(zip(first["o_custkey"],
                        first["min(o_orderdate)"]
                        .astype("datetime64[us]").astype("int64")))

        def tag(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            t = df["o_orderdate"].astype("datetime64[us]") \
                .astype("int64")
            kind = np.where(t == df["o_custkey"].map(fmap), "first",
                            "repeat")
            return pa.Table.from_pandas(pd.DataFrame({
                "kind": kind,
                "cents": np.round(df["o_totalprice"].to_numpy()
                                  * 100).astype("int64"),
            }), preserve_index=False)

        return preagg_sum(od.map_batches(tag, batch_format="pyarrow"),
                          ["kind"], {"sum_cents": "cents"},
                          counts="n_orders")

    def events_session_depth(sf_dir):
        # engagement depth: exact p50/p90/p99 of events-per-session
        # (sessionize -> value-count quantile machinery)
        from raygraph.ops.events import sessionize
        from raygraph.ops.relational import grouped_quantiles

        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts"])
        sess = sessionize(ev)

        def lit(batch: pa.Table) -> pa.Table:
            return pa.table({
                "__g": pa.array(np.zeros(batch.num_rows, dtype="int64")),
                "ne": batch.column("n_events").cast(pa.int64()),
            })

        q = grouped_quantiles(
            sess.map_batches(lit, batch_format="pyarrow"),
            ["__g"], "ne", qs=(0.5, 0.9, 0.99)).to_pandas()
        return pd.DataFrame({
            "p50": pd.array([int(q["p50"].iloc[0])], dtype="int64"),
            "p90": pd.array([int(q["p90"].iloc[0])], dtype="int64"),
            "p99": pd.array([int(q["p99"].iloc[0])], dtype="int64"),
        })

    def orders_max_drawdown(sf_dir):
        # sequential risk metric: max drawdown of the daily-revenue
        # series (running max minus value, maximized) — day-keyed
        # combiner preagg first, the scan folds the day-sized aggregate
        od = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderdate", "o_totalprice"])

        def daily(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            return pa.Table.from_pandas(pd.DataFrame({
                "day": (df["o_orderdate"].astype("datetime64[us]")
                        .astype("int64") // 86_400_000_000),
                "cents": np.round(df["o_totalprice"].to_numpy()
                                  * 100).astype("int64"),
            }), preserve_index=False)

        rev = preagg_sum(od.map_batches(daily, batch_format="pyarrow"),
                         ["day"], {"cents": "cents"}).to_pandas() \
            .sort_values("day").reset_index(drop=True)
        run_max = rev["cents"].cummax()
        dd = run_max - rev["cents"]
        i = int(dd.to_numpy().argmax())  # first max → earliest day
        return pd.DataFrame({
            "n_days": pd.array([len(rev)], dtype="int64"),
            "max_drawdown_cents": pd.array([int(dd.iloc[i])],
                                           dtype="int64"),
            "drawdown_day": pd.array([int(rev["day"].iloc[i])],
                                     dtype="int64"),
        })

    def docs_vocab_growth(sf_dir):
        # Heaps'-law telemetry: cumulative vocabulary size at corpus
        # deciles — ONE min-doc-per-token groupby (the novelty-rate
        # exchange), then a 10-row cumulative fold
        n_docs = _docs_count(sf_dir)
        ds = _docs_ds(sf_dir)

        def first_partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            toks = df["text"].fillna("").str.strip().str.lower() \
                .str.split()
            ex = pd.DataFrame({"doc_id": df["doc_id"],
                               "token": toks}).explode("token").dropna()
            g = (ex.groupby("token", sort=False)["doc_id"].min()
                 .reset_index(name="first_doc")
                 .rename(columns={"index": "token"}))
            return pa.Table.from_pandas(g, preserve_index=False)

        first = ds.map_batches(first_partial, batch_format="pyarrow") \
            .groupby("token").min("first_doc")

        def decile_partial(batch: pa.Table) -> pa.Table:
            fd = batch.column("min(first_doc)") \
                .to_numpy(zero_copy_only=False)
            dec = np.minimum(fd * 10 // n_docs, 9).astype("int64") + 1
            g = pd.Series(dec).value_counts().rename_axis("decile") \
                .reset_index(name="n_new")
            return pa.Table.from_pandas(g, preserve_index=False)

        per_dec = preagg_sum(
            first.map_batches(decile_partial, batch_format="pyarrow"),
            ["decile"], {"n_new": "n_new"}).to_pandas() \
            .set_index("decile")["n_new"]
        rows, cum = [], 0
        for d in range(1, 11):
            cum += int(per_dec.get(d, 0))
            rows.append((d, cum))
        return pd.DataFrame(rows, columns=["decile", "vocab_size"]) \
            .astype({"decile": "int64", "vocab_size": "int64"})

    def lineitem_ship_delay(sf_dir):
        # logistics latency: days from order to line shipment, as a
        # histogram — one big-big shuffle join then a day-delta
        # combiner regroup
        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import shuffle_join

        li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=["l_orderkey", "l_shipdate"])
        od = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_orderdate"])

        def li_n(batch: pa.Table) -> pa.Table:
            d = batch.column("l_shipdate").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False) // 86_400_000_000
            return pa.table({"ok": batch.column("l_orderkey"),
                             "sd": pa.array(d, pa.int64())})

        def od_n(batch: pa.Table) -> pa.Table:
            d = batch.column("o_orderdate").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False) // 86_400_000_000
            return pa.table({"ok2": batch.column("o_orderkey"),
                             "od": pa.array(d, pa.int64())})

        j = _repaired(
            shuffle_join(li.map_batches(li_n, batch_format="pyarrow"),
                         od.map_batches(od_n, batch_format="pyarrow"),
                         on="ok", right_on="ok2"),
            pa.schema([("ok", pa.int64()), ("sd", pa.int64()),
                       ("od", pa.int64())]))

        def delta(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            g = (pd.DataFrame({"delay_days": df["sd"] - df["od"]})
                 .groupby("delay_days", sort=False)
                 .size().reset_index(name="n_lines"))
            return pa.Table.from_pandas(g, preserve_index=False)

        return preagg_sum(j.map_batches(delta, batch_format="pyarrow"),
                          ["delay_days"], {"n_lines": "n_lines"})

    def text_suffix_profile(sf_dir):
        # morphology profile (stemming-table precursor): top-20 3-char
        # token suffixes over tokens of length >= 4; one explode +
        # vectorized slice, vocab-bounded partials
        ds = _docs_ds(sf_dir)

        def suf(batch: pa.Table) -> pa.Table:
            s = batch.column("text").to_pandas().fillna("")
            toks = s.str.strip().str.lower().str.split().explode() \
                .dropna()
            toks = toks[toks.str.len() >= 4]
            g = toks.str[-3:].value_counts().rename_axis("suffix") \
                .reset_index(name="n")
            return pa.Table.from_pandas(g, preserve_index=False)

        agg = preagg_sum(ds.map_batches(suf, batch_format="pyarrow"),
                         ["suffix"], {"n": "n"})
        return agg.sort(["n", "suffix"], descending=[True, False]) \
            .limit(20)

    def docs_email_domains(sf_dir):
        # PII mining rollup: extracted-email DOMAIN histogram (the
        # provenance profile of contact data) — flat-map explode then a
        # vectorized split + combiner regroup
        from raygraph.ops.text import EMAIL_PATTERN, extract_matches

        injected = _docs_ds(sf_dir).map_batches(_inject_pii,
                                                batch_format="pyarrow")
        emails = extract_matches(injected, EMAIL_PATTERN, out="email")

        def dom(batch: pa.Table) -> pa.Table:
            s = batch.column("email").to_pandas()
            g = s.str.split("@").str[-1].value_counts() \
                .rename_axis("domain").reset_index(name="n")
            return pa.Table.from_pandas(g, preserve_index=False)

        return preagg_sum(emails.map_batches(dom,
                                             batch_format="pyarrow"),
                          ["domain"], {"n": "n"})

    def events_slo_burn(sf_dir):
        # SRE error-budget burn: daily error share in bp vs a 100-bp
        # budget, with the cumulative excess (burn) as a running fold
        # over the day-sized aggregate
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "ts"])

        def daily(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            day = (df["ts"].astype("datetime64[us]").astype("int64")
                   // 86_400_000_000)
            return pa.Table.from_pandas(pd.DataFrame({
                "day": day,
                "n": np.ones(len(df), dtype="int64"),
                "err": (df["event_type"] == "error").astype("int64"),
            }), preserve_index=False)

        d = preagg_sum(ev.map_batches(daily, batch_format="pyarrow"),
                       ["day"], {"n": "n", "err": "err"}).to_pandas() \
            .sort_values("day").reset_index(drop=True)
        d["err_bp"] = (10_000 * d["err"]) // d["n"]
        d["excess_bp"] = (d["err_bp"] - 100).clip(lower=0)
        d["burn_bp"] = d["excess_bp"].cumsum()
        for c in ("day", "n", "err", "err_bp", "burn_bp"):
            d[c] = d[c].astype("int64")
        return d[["day", "n", "err", "err_bp", "burn_bp"]]

    def events_new_users(sf_dir):
        # acquisition telemetry: per day, first-seen vs returning active
        # users — user-first-day map (user-sized) + one distinct-pair
        # aggregate
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts"])
        first = ev.groupby("user_id").min("ts").to_pandas()
        fday = dict(zip(first["user_id"],
                        first["min(ts)"].astype("datetime64[us]")
                        .astype("int64") // 86_400_000_000))

        def tag(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            day = (df["ts"].astype("datetime64[us]").astype("int64")
                   // 86_400_000_000)
            out = pd.DataFrame({"user_id": df["user_id"],
                                "day": day}).drop_duplicates()
            out["is_new"] = (out["day"]
                             == out["user_id"].map(fday)).astype("int64")
            return pa.Table.from_pandas(out, preserve_index=False)

        from raygraph.ops.relational import hash_aggregate

        # per-batch distinct is NOT global distinct (a pair can span
        # batches): one pair-hash dedup makes the counts exact
        pairs = hash_aggregate(
            ev.map_batches(tag, batch_format="pyarrow"),
            ["user_id", "day"], lambda df: df.drop_duplicates())

        def partial(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            g = df.groupby("day", sort=False).agg(
                n_active=("user_id", "size"),
                n_new=("is_new", "sum")).reset_index()
            for c in ("n_active", "n_new"):
                g[c] = g[c].astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False)

        agg = preagg_sum(pairs.map_batches(partial,
                                           batch_format="pyarrow"),
                         ["day"], {"n_active": "n_active",
                                   "n_new": "n_new"})

        def finish(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["n_returning"] = (df["n_active"]
                                 - df["n_new"]).astype("int64")
            return pa.Table.from_pandas(df, preserve_index=False)

        return agg.map_batches(finish, batch_format="pyarrow")

    def docs_strip_markup(sf_dir):
        # HTML-ish boilerplate removal: id-derived <p>/<b> tags planted
        # in both engines, stripped with one compiled regex pass; output
        # counts tags removed and the cleaned length
        import re

        ds = _docs_ds(sf_dir)
        tag_re = re.compile(r"</?[pb]>")

        def inject_strip(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pandas()
            s = batch.column("text").to_pandas().fillna("")
            s = np.where(ids % 5 == 0, "<p>" + s + "</p>", s)
            s = pd.Series(np.where(ids % 9 == 0,
                                   "<b>" + pd.Series(s) + "</b>", s))
            n_tags = s.str.count(tag_re).astype("int64")
            clean = s.str.replace(tag_re, "", regex=True)
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "n_tags": pa.array(n_tags.to_numpy(), pa.int64()),
                "clean_len": pa.array(
                    clean.str.len().astype("int64").to_numpy(),
                    pa.int64()),
            })

        return ds.map_batches(inject_strip, batch_format="pyarrow")

    def kg_edge_weight_hist(sf_dir):
        # provenance-weight profile of the built graph: doc_count
        # histogram over the edge table (how much evidence each edge
        # carries)
        res = _kg_result(sf_dir)
        ed = rd.read_parquet(res.edges_path, columns=["doc_count"])
        return preagg_sum(ed, ["doc_count"], {}, counts="n_edges")

    def events_dod_growth(sf_dir):
        # day-over-day volume growth per event type, truncated basis
        # points (negative growth uses DuckDB // semantics via trunc_div)
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "ts"])
        return E.dod_growth(ev)

    def events_rolling_users(sf_dir):
        # trailing-24h distinct users per event hour: distinct (hour,
        # user) pairs -> bounded x24 fan-out -> exact distinct count
        ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts"])
        return E.rolling_distinct_users(ev, window_hours=24)

    def docs_readability(sf_dir):
        return _docs_ds(sf_dir).map_batches(T.readability,
                                            batch_format="pyarrow")

    def part_skyline(sf_dir):
        # Pareto frontier of parts (total quantity vs total revenue,
        # both maximized): per-part combiner preagg, then the two-phase
        # distributed skyline — local frontier per block, exact merge
        # pass over the tiny candidate union.
        from raygraph.ops.graph import _repaired
        from raygraph.ops.relational import skyline_max

        li = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_quantity", "l_extendedprice",
                     "l_discount"],
        )

        def ints(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            cents = np.round(
                df["l_extendedprice"].to_numpy() * 100).astype("int64")
            bp = np.round(df["l_discount"].to_numpy() * 100).astype("int64")
            return pa.Table.from_pandas(pd.DataFrame({
                "l_partkey": df["l_partkey"],
                "qty": df["l_quantity"].to_numpy().astype("int64"),
                "rev_e4": cents * (100 - bp),
            }), preserve_index=False)

        agg = preagg_sum(li.map_batches(ints, batch_format="pyarrow"),
                         ["l_partkey"], {"qty_sum": "qty",
                                         "revenue_e4": "rev_e4"})
        agg = _repaired(agg, pa.schema([
            ("l_partkey", pa.int64()), ("qty_sum", pa.int64()),
            ("revenue_e4", pa.int64())]))
        return skyline_max(agg, "qty_sum", "revenue_e4")

    return {
        "kg_edges": kg_edges,
        "kg_asof_base": kg_asof_base,
        "kg_forget_edges": kg_forget_edges,
        "kg_delta_edges": kg_delta_edges,
        "kg_snapshot_diff": kg_snapshot_diff,
        "kg_vertices": kg_vertices,
        "kg_vertex_mentions": kg_vertex_mentions,
        "kg_degrees": kg_degrees,
        "kg_two_hop": kg_two_hop,
        "kg_pagerank": kg_pagerank,
        "kg_katz": kg_katz,
        "kg_wl": kg_wl,
        "kg_msf": kg_msf,
        "kg_node2vec": kg_node2vec,
        "kg_cascade": kg_cascade,
        "kg_frame_triples": kg_frame_triples,
        "kg_frame_edges": kg_frame_edges,
        "kg_coref_edges": kg_coref_edges,
        "kg_skipgram_pairs": kg_skipgram_pairs,
        "kg_vertex_cover": kg_vertex_cover,
        "kg_components": kg_components,
        "kg_bfs": kg_bfs,
        "kg_kcore": kg_kcore,
        "kg_clustering": kg_clustering,
        "kg_hits": kg_hits,
        "kg_sssp": kg_sssp,
        "kg_closeness": kg_closeness,
        "kg_eccentricity": kg_eccentricity,
        "kg_communities": kg_communities,
        "kg_mis": kg_mis,
        "kg_matching": kg_matching,
        "kg_khop_sample": kg_khop_sample,
        "kg_betweenness": kg_betweenness,
        "kg_rpq": kg_rpq,
        "kg_ego": kg_ego,
        "kg_ppr": kg_ppr,
        "kg_rwr": kg_rwr,
        "kg_modularity": kg_modularity,
        "kg_conductance": kg_conductance,
        "kg_coloring": kg_coloring,
        "events_rolling_1h": events_rolling_1h,
        "docs_inverted_index": docs_inverted_index,
        "dedup_edit_pairs": dedup_edit_pairs,
        "docs_search_all": docs_search_all,
        "events_type_overlap": events_type_overlap,
        "events_value_outliers": events_value_outliers,
        "events_value_mad": events_value_mad,
        "events_resample_1h": events_resample_1h,
        "embedding_pca": embedding_pca,
        "embedding_semdedup": embedding_semdedup,
        "embedding_proto_prune": embedding_proto_prune,
        "ann_hard_negatives": ann_hard_negatives,
        "embedding_centroid_confusion": embedding_centroid_confusion,
        "text_freq_spectrum": text_freq_spectrum,
        "docs_lang_diversity": docs_lang_diversity,
        "dedup_simhash_pairs": dedup_simhash_pairs,
        "docs_with_deletes": docs_with_deletes,
        "docs_exact_substrings": docs_exact_substrings,
        "dedup_sn_pairs": dedup_sn_pairs,
        "dedup_er_scores": dedup_er_scores,
        "dedup_er_clusters": dedup_er_clusters,
        "dedup_jaccard_pairs": dedup_jaccard_pairs,
        "docs_boilerplate": docs_boilerplate,
        "docs_split_assign": docs_split_assign,
        "events_top_trigrams": events_top_trigrams,
        "text_bpe_merge": text_bpe_merge,
        "events_hour_profile": events_hour_profile,
        "lineitem_weighted_disc": lineitem_weighted_disc,
        "docs_from_jsonl": docs_from_jsonl,
        "kg_pred_stats": kg_pred_stats,
        "kg_pred_cooccur": kg_pred_cooccur,
        "events_user_deciles": events_user_deciles,
        "tpch_promo_share": tpch_promo_share,
        "ann_filtered_top10": ann_filtered_top10,
        "embedding_argmax": embedding_argmax,
        "kg_reciprocity": kg_reciprocity,
        "text_top_bigrams": text_top_bigrams,
        "text_zipf": text_zipf,
        "text_hapax_ratio": text_hapax_ratio,
        "kg_pred_entropy": kg_pred_entropy,
        "text_bigram_pmi": text_bigram_pmi,
        "text_rake_keywords": text_rake_keywords,
        "text_good_turing": text_good_turing,
        "text_bigram_g2": text_bigram_g2,
        "docs_rrf_fusion": docs_rrf_fusion,
        "docs_bm25_top10": docs_bm25_top10,
        "docs_unigram_surprise": docs_unigram_surprise,
        "docs_bigram_perplexity": docs_bigram_perplexity,
        "docs_dsir_weights": docs_dsir_weights,
        "events_transition_pmi": events_transition_pmi,
        "docs_weighted_sample": docs_weighted_sample,
        "docs_lr_score": docs_lr_score,
        "lineitem_corr": lineitem_corr,
        "lineitem_spearman": lineitem_spearman,
        "orders_zorder_tiles": orders_zorder_tiles,
        "kg_triangles": kg_triangles,
        "export_vertex_projection": export_vertex_projection,
        "export_vertex_missing_field": export_vertex_missing_field,
        "export_edge_projection": export_edge_projection,
        "export_load_all_vertices": export_load_all_vertices,
        "dedup_exact_documents": dedup_exact_documents,
        "dedup_minhash_survivors": dedup_minhash_survivors,
        "dedup_survivors_broadcast": dedup_survivors_broadcast,
        "dedup_survivors_auto": dedup_survivors_auto,
        "dedup_clusters": dedup_clusters,
        "dedup_simhash": dedup_simhash,
        "dedup_sentences": dedup_sentences,
        "dedup_embedding_pairs": dedup_embedding_pairs,
        "text_token_count": text_token_count,
        "text_stats": text_stats,
        "text_quality": text_quality,
        "text_lang_id": text_lang_id,
        "docs_lang_confusion": docs_lang_confusion,
        "text_fingerprints": text_fingerprints,
        "docs_winnow": docs_winnow,
        "text_bpe_token_count": text_bpe_token_count,
        "text_top_tokens": text_top_tokens,
        "docs_pii_scrub": docs_pii_scrub,
        "corpus_span_stats": corpus_span_stats,
        "corpus_render_interleaved": corpus_render_interleaved,
        "corpus_pack_interleaved": corpus_pack_interleaved,
        "docs_contamination": docs_contamination,
        "docs_quality_prune": docs_quality_prune,
        "docs_contamination_dist": docs_contamination_dist,
        "docs_repetition": docs_repetition,
        "docs_packing": docs_packing,
        "docs_prepare_packs": docs_prepare_packs,
        "docs_shuffle_rank": docs_shuffle_rank,
        "docs_chunks": docs_chunks,
        "docs_cap_per_lang": docs_cap_per_lang,
        "docs_rebalance_sources": docs_rebalance_sources,
        "docs_length_band": docs_length_band,
        "orders_global_rownum": orders_global_rownum,
        "docs_normalize": docs_normalize,
        "docs_snapshot_diff": docs_snapshot_diff,
        "docs_ngram_dup": docs_ngram_dup,
        "text_cms_counts": text_cms_counts,
        "text_heavy_hitters": text_heavy_hitters,
        "text_heavy_hitters_incremental": text_heavy_hitters_incremental,
        "text_gazetteer": text_gazetteer,
        "events_scd2": events_scd2,
        "lineitem_hdr_quantiles": lineitem_hdr_quantiles,
        "events_running_distinct": events_running_distinct,
        "docs_tfidf_top3": docs_tfidf_top3,
        "docs_sample_10pct": docs_sample_10pct,
        "docs_topk_per_lang": docs_topk_per_lang,
        "docs_upsert": docs_upsert,
        "docs_by_lang_source": docs_by_lang_source,
        "docs_rollup": docs_rollup,
        "docs_cube": docs_cube,
        "top_sources_by_chars": top_sources_by_chars,
        "tpch_pricing_summary": tpch_pricing_summary,
        "tpch_q1_full": tpch_q1_full,
        "tpch_region_revenue": tpch_region_revenue,
        "tpch_order_priority": tpch_order_priority,
        "tpch_q6_revenue": tpch_q6_revenue,
        "tpch_q3_shipping": tpch_q3_shipping,
        "customer_rank_in_nation": customer_rank_in_nation,
        "customers_without_orders": customers_without_orders,
        "tpch_q5_region_volume": tpch_q5_region_volume,
        "tpch_q9_profit": tpch_q9_profit,
        "tpch_q10_returns": tpch_q10_returns,
        "tpch_q16_suppliers": tpch_q16_suppliers,
        "tpch_q19_revenue": tpch_q19_revenue,
        "kg_linkpred": kg_linkpred,
        "events_late_arrivals": events_late_arrivals,
        "part_skyline": part_skyline,
        "events_type_mode": events_type_mode,
        "events_dod_growth": events_dod_growth,
        "events_rolling_users": events_rolling_users,
        "docs_readability": docs_readability,
        "tpch_q4_exists": tpch_q4_exists,
        "tpch_q13_custdist": tpch_q13_custdist,
        "tpch_q18_big_orders": tpch_q18_big_orders,
        "tpch_q22_idle": tpch_q22_idle,
        "bloom_join_prune": bloom_join_prune,
        "tpch_q2_min_supplier": tpch_q2_min_supplier,
        "tpch_q7_volume": tpch_q7_volume,
        "tpch_q8_market_share": tpch_q8_market_share,
        "tpch_q11_important_parts": tpch_q11_important_parts,
        "tpch_q12_late_lines": tpch_q12_late_lines,
        "tpch_q15_top_supplier": tpch_q15_top_supplier,
        "supplier_pareto_top10": supplier_pareto_top10,
        "supplier_gini": supplier_gini,
        "docs_source_entropy": docs_source_entropy,
        "orders_benford": orders_benford,
        "customer_order_gaps": customer_order_gaps,
        "tpch_q17_small_qty": tpch_q17_small_qty,
        "tpch_q20_promo_suppliers": tpch_q20_promo_suppliers,
        "tpch_q21_waiting_suppliers": tpch_q21_waiting_suppliers,
        "kg_degree_hist": kg_degree_hist,
        "orders_percent_rank": orders_percent_rank,
        "kg_edge_support": kg_edge_support,
        "kg_truss3": kg_truss3,
        "kg_squares": kg_squares,
        "events_cusum": events_cusum,
        "docs_ttr": docs_ttr,
        "corpus_caption_pairs": corpus_caption_pairs,
        "events_autocorr": events_autocorr,
        "embedding_pair_hist": embedding_pair_hist,
        "events_markov": events_markov,
        "events_twa": events_twa,
        "docs_from_csv": docs_from_csv,
        "docs_from_orc": docs_from_orc,
        "docs_from_ipc": docs_from_ipc,
        "docs_curate_spec": docs_curate_spec,
        "ann_pq_top10": ann_pq_top10,
        "docs_len_hdr_by_source": docs_len_hdr_by_source,
        "embedding_jl_project": embedding_jl_project,
        "embedding_negatives": embedding_negatives,
        "embedding_negatives_stratified": embedding_negatives_stratified,
        "orders_expectations": orders_expectations,
        "customer_fk_events": customer_fk_events,
        "customer_privacy_audit": customer_privacy_audit,
        "docs_epoch_shuffle": docs_epoch_shuffle,
        "docs_domain_mixture": docs_domain_mixture,
        "docs_gopher_rules": docs_gopher_rules,
        "docs_c4_line_stats": docs_c4_line_stats,
        "orders_abc_classes": orders_abc_classes,
        "events_mad_outliers": events_mad_outliers,
        "events_assoc_rules": events_assoc_rules,
        "events_kaplan_meier": events_kaplan_meier,
        "orders_seasonal_decomp": orders_seasonal_decomp,
        "docs_lang_source_mi": docs_lang_source_mi,
        "docs_ks_test": docs_ks_test,
        "docs_cramers_v": docs_cramers_v,
        "docs_psi_drift": docs_psi_drift,
        "orders_dow_chi2": orders_dow_chi2,
        "docs_curate_quality": docs_curate_quality,
        "corpus_span_transitions": corpus_span_transitions,
        "events_session_hdr": events_session_hdr,
        "docs_gazetteer_by_source": docs_gazetteer_by_source,
        "text_heavy_hitters_by_source": text_heavy_hitters_by_source,
        "lineitem_join_cardinality": lineitem_join_cardinality,
        "orders_nation_revenue_auto": orders_nation_revenue_auto,
        "events_key_skew": events_key_skew,
        "events_zscore": events_zscore,
        "docs_novelty": docs_novelty,
        "customer_rfm": customer_rfm,
        "media_dedup": media_dedup,
        "events_attribution": events_attribution,
        "events_trend": events_trend,
        "docs_kl_drift": docs_kl_drift,
        "events_asof_incremental": events_asof_incremental,
        "embedding_knn_components": embedding_knn_components,
        "orders_zonemap_prune": orders_zonemap_prune,
        "kg_edges_jsonl": kg_edges_jsonl,
        "events_asof_forward": events_asof_forward,
        "events_conversion_time": events_conversion_time,
        "kg_scc": kg_scc,
        "docs_curation_funnel": docs_curation_funnel,
        "docs_dup_hist": docs_dup_hist,
        "orders_backlog": orders_backlog,
        "embedding_outliers": embedding_outliers,
        "events_seq_regex": events_seq_regex,
        "events_user_entropy": events_user_entropy,
        "events_missing_hours": events_missing_hours,
        "orders_reconcile": orders_reconcile,
        "text_skipgrams": text_skipgrams,
        "orders_weekly": orders_weekly,
        "kg_path_counts": kg_path_counts,
        "lineitem_weighted_median": lineitem_weighted_median,
        "text_char_trigrams": text_char_trigrams,
        "docs_interleave_sources": docs_interleave_sources,
        "events_peak_hours": events_peak_hours,
        "embedding_dim_stats": embedding_dim_stats,
        "docs_schema_evolution": docs_schema_evolution,
        "kg_adamic_adar": kg_adamic_adar,
        "kg_pred_cardinality": kg_pred_cardinality,
        "events_gap_cv": events_gap_cv,
        "text_cond_entropy": text_cond_entropy,
        "docs_source_jaccard": docs_source_jaccard,
        "events_stickiness": events_stickiness,
        "kg_rich_club": kg_rich_club,
        "events_hll_algebra": events_hll_algebra,
        "events_cuped": events_cuped,
        "events_bipartite_proj": events_bipartite_proj,
        "events_ab_arms": events_ab_arms,
        "docs_code_score": docs_code_score,
        "orders_size_hist": orders_size_hist,
        "kg_bfs_hist": kg_bfs_hist,
        "events_cohort_revenue": events_cohort_revenue,
        "events_dow_profile": events_dow_profile,
        "docs_from_jsonl_lenient": docs_from_jsonl_lenient,
        "events_bounce_rate": events_bounce_rate,
        "kg_degree_gini": kg_degree_gini,
        "docs_length_log_hist": docs_length_log_hist,
        "orders_first_repeat": orders_first_repeat,
        "events_session_depth": events_session_depth,
        "orders_max_drawdown": orders_max_drawdown,
        "docs_vocab_growth": docs_vocab_growth,
        "kg_lineage": kg_lineage,
        "lineitem_ship_delay": lineitem_ship_delay,
        "text_suffix_profile": text_suffix_profile,
        "docs_email_domains": docs_email_domains,
        "events_slo_burn": events_slo_burn,
        "events_new_users": events_new_users,
        "docs_strip_markup": docs_strip_markup,
        "kg_edge_weight_hist": kg_edge_weight_hist,
        "kg_edge_jaccard": kg_edge_jaccard,
        "kg_assortativity": kg_assortativity,
        "kg_walks3": kg_walks3,
        "embedding_centroid_dot": embedding_centroid_dot,
        "embedding_silhouette": embedding_silhouette,
        "lineitem_sort_top100": lineitem_sort_top100,
        "lineitem_price_histogram": lineitem_price_histogram,
        "orders_checksum": orders_checksum,
        "customer_orders_full": customer_orders_full,
        "docs_except_early": docs_except_early,
        "docs_intersect_early": docs_intersect_early,
        "orders_with_returns": orders_with_returns,
        "lineitem_quantile_bins": lineitem_quantile_bins,
        "lineitem_interval_join": lineitem_interval_join,
        "lineitem_price_quantiles": lineitem_price_quantiles,
        "docs_jaccard_top10": docs_jaccard_top10,
        "customer_revenue_topk": customer_revenue_topk,
        "events_tumbling_1h": events_tumbling_1h,
        "events_sessions": events_sessions,
        "events_sessionize_full": events_sessionize_full,
        "events_sessionize_incremental": events_sessionize_incremental,
        "events_tumbling_incremental": events_tumbling_incremental,
        "events_asof_join": events_asof_join,
        "events_hopping": events_hopping,
        "events_running_sum": events_running_sum,
        "events_gaps": events_gaps,
        "events_interval_join": events_interval_join,
        "events_top_type": events_top_type,
        "events_latest": events_latest,
        "events_transitions": events_transitions,
        "events_funnel": events_funnel,
        "events_value_moments": events_value_moments,
        "events_ewma_tail": events_ewma_tail,
        "events_coverage": events_coverage,
        "events_winsorized_mean": events_winsorized_mean,
        "events_retention": events_retention,
        "events_sequences": events_sequences,
        "docs_profile": docs_profile,
        "orders_rowgroup_prune": orders_rowgroup_prune,
        "orders_theil_sen": orders_theil_sen,
        "docs_mannwhitney": docs_mannwhitney,
        "docs_feature_hashing": docs_feature_hashing,
        "orders_holt_winters": orders_holt_winters,
        "orders_ivm_view": orders_ivm_view,
        "orders_ivm_incremental": orders_ivm_incremental,
        "orders_merged": orders_merged,
        "embedding_kmeans": embedding_kmeans,
        "tpch_salted_priority": tpch_salted_priority,
        "docs_stratified_sample": docs_stratified_sample,
        "lineitem_range_tiles": lineitem_range_tiles,
        "docs_vocab_encode": docs_vocab_encode,
        "docs_nb_model": docs_nb_model,
        "docs_nb_pred": docs_nb_pred,
        "docs_nb_auc": docs_nb_auc,
        "docs_nb_prf": docs_nb_prf,
        "events_pivot_types": events_pivot_types,
        "events_unpivot": events_unpivot,
        "docs_lang_share": docs_lang_share,
        "events_props_stats": events_props_stats,
        "events_distinct_users": events_distinct_users,
        "events_distinct_users_incremental": events_distinct_users_incremental,
        "events_approx_users": events_approx_users,
        "events_kmv_users": events_kmv_users,
        "events_target_encode": events_target_encode,
        "docs_stump": docs_stump,
        "dedup_winnow_pairs": dedup_winnow_pairs,
        "docs_containment_pairs": docs_containment_pairs,
        "docs_line_dedup": docs_line_dedup,
        "docs_incremental_dedup": docs_incremental_dedup,
        "docs_minhash_incremental": docs_minhash_incremental,
        "dedup_minhash_grouped": dedup_minhash_grouped,
        "dedup_exact_grouped": dedup_exact_grouped,
        "docs_line_dedup_grouped": docs_line_dedup_grouped,
        "docs_dedup_clean": docs_dedup_clean,
        "docs_kfold": docs_kfold,
        "docs_dedup_safe_split": docs_dedup_safe_split,
        "ann_rrf_top10": ann_rrf_top10,
        "ann_top10": ann_top10,
        "ann_ivf_top10": ann_ivf_top10,
        "ann_ivf_persisted": ann_ivf_persisted,
        "ann_self_join": ann_self_join,
        "embedding_norms": embedding_norms,
        "embedding_quantized": embedding_quantized,
        "ann_batch_top3": ann_batch_top3,
        "ann_quantized_eval": ann_quantized_eval,
        "ann_matryoshka_eval": ann_matryoshka_eval,
        "embedding_grid_clusters": embedding_grid_clusters,
        "embedding_centroids": embedding_centroids,
        "media_features": media_features,
        "media_frames": media_frames,
        "docs_extract_emails": docs_extract_emails,
        "media_dimensions": media_dimensions,
        "media_audio": media_audio,
    }


# ====================================================== oracle SQL
def _sql_strlist(words) -> str:
    """Python word collection → DuckDB VARCHAR list literal (single source
    of truth: raygraph.ops.text.STOPWORDS, so Ray and SQL can't drift)."""
    inner = ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(words))
    return "[" + inner + "]"


def _simhash_sql_expr() -> str:
    """Machine-generated 60-term SQL packing of the simhash bits: for bit
    i, +1/-1 votes over the doc's 60-bit md5 token hashes (``ths``), bit
    set iff the sum is positive. list_sum([]) is NULL → CASE false → 0,
    matching simhash(∅) = 0."""
    from raygraph.ops.dedup import SIMHASH_BITS

    terms = [
        f"(CASE WHEN list_sum(list_transform(ths, "
        f"x -> CASE WHEN (x >> {i}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {1 << i}::BIGINT ELSE 0::BIGINT END)"
        for i in range(SIMHASH_BITS)
    ]
    return "(" + " + ".join(terms) + ")"


def _pq_sql(m_sub: int, k_codes: int, iters: int, topk: int) -> str:
    """Machine-unrolled product quantization mirroring
    raygraph.ops.ann.pq_topk term for term: ×10^6 trunc quantization,
    per-subspace Lloyd (init vec_id % k, floor-mean centroids from
    surviving clusters, argmin ties -> smallest cl), query = embedding
    of the smallest vec_id, asymmetric distance = per-subspace LUT sum
    in exact int64, final ORDER BY (pq_dist, vec_id) LIMIT topk."""
    parts = [
        """WITH u AS (
          SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
                 CAST(trunc(unnest(embedding)::DOUBLE * 1000000)
                      AS BIGINT) AS x
          FROM embeddings
        )""",
        f""", dd AS (SELECT (max(dim) + 1) // {m_sub} AS dsub FROM u)""",
        """, su AS (
          SELECT vec_id, dim // dd.dsub AS sub, dim % dd.dsub AS ld, x
          FROM u, dd
        )""",
        f""", c0 AS (
          SELECT sub, vec_id % {k_codes} AS cl, ld,
                 CAST(floor(sum(x)::DOUBLE / count(*)) AS BIGINT) AS c
          FROM su GROUP BY sub, vec_id % {k_codes}, ld
        )""",
    ]
    for t in range(1, iters + 2):
        parts.append(f""", a{t} AS (
          SELECT vec_id, sub, cl FROM (
            SELECT s.vec_id, s.sub, c.cl,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.sub
                       ORDER BY sum((s.x - c.c) * (s.x - c.c)) ASC,
                                c.cl ASC) AS rn
            FROM su s JOIN c{t - 1} c ON s.sub = c.sub AND s.ld = c.ld
            GROUP BY s.vec_id, s.sub, c.cl
          ) WHERE rn = 1
        )""")
        if t <= iters:
            parts.append(f""", c{t} AS (
              SELECT a.sub, a.cl, s.ld,
                     CAST(floor(sum(s.x)::DOUBLE / count(*)) AS BIGINT)
                         AS c
              FROM su s JOIN a{t} a
                ON s.vec_id = a.vec_id AND s.sub = a.sub
              GROUP BY a.sub, a.cl, s.ld
            )""")
    parts.append(f""", qv AS (
          SELECT sub, ld, x FROM su
          WHERE vec_id = (SELECT min(vec_id) FROM u)
        ), lut AS (
          SELECT c.sub, c.cl,
                 sum((qv.x - c.c) * (qv.x - c.c))::BIGINT AS dq
          FROM c{iters} c JOIN qv ON c.sub = qv.sub AND c.ld = qv.ld
          GROUP BY c.sub, c.cl
        ), dist AS (
          SELECT a.vec_id, sum(l.dq)::BIGINT AS pq_dist
          FROM a{iters + 1} a
          JOIN lut l ON a.sub = l.sub AND a.cl = l.cl
          GROUP BY a.vec_id
        )
        SELECT vec_id, pq_dist FROM dist
        ORDER BY pq_dist ASC, vec_id ASC LIMIT {topk}""")
    return "\n".join(parts)


def _kmeans_sql(k: int, iters: int) -> str:
    """Machine-unrolled Lloyd k-means mirroring
    raygraph.ops.cluster.kmeans term for term: ×10^6 trunc quantization,
    exact int squared-distance argmin (ties → smallest cluster), floor
    mean, clusters recomputed from surviving groups only. ``iters``
    refinement rounds then one final assignment — so assignment CTEs
    a1..a{iters+1}, centroid CTEs c0..c{iters}."""
    parts = [
        """WITH u AS (
          SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
                 CAST(trunc(unnest(embedding)::DOUBLE * 1000000)
                      AS BIGINT) AS x
          FROM embeddings
        )""",
        f""", c0 AS (
          SELECT vec_id % {k} AS cl, dim,
                 CAST(floor(sum(x)::DOUBLE / count(*)) AS BIGINT) AS c
          FROM u GROUP BY vec_id % {k}, dim
        )""",
    ]
    for t in range(1, iters + 2):
        parts.append(f""", a{t} AS (
          SELECT vec_id, cl FROM (
            SELECT u.vec_id, c.cl,
                   row_number() OVER (
                       PARTITION BY u.vec_id
                       ORDER BY sum((u.x - c.c) * (u.x - c.c)) ASC,
                                c.cl ASC) AS rn
            FROM u JOIN c{t - 1} c ON u.dim = c.dim
            GROUP BY u.vec_id, c.cl
          ) WHERE rn = 1
        )""")
        if t <= iters:
            parts.append(f""", c{t} AS (
              SELECT a.cl, u.dim,
                     CAST(floor(sum(u.x)::DOUBLE / count(*)) AS BIGINT)
                         AS c
              FROM u JOIN a{t} a ON u.vec_id = a.vec_id
              GROUP BY a.cl, u.dim
            )""")
    parts.append(
        f"SELECT vec_id, cl AS cluster FROM a{iters + 1}")
    return "\n".join(parts)


def _bfs_sql(edges_sql: str, iters: int,
             weight_expr: str | None = None) -> str:
    """Machine-unrolled directed BFS from the max-out-degree vertex
    (ties → smallest id): per round one join + min-groupby relaxation
    over the arc set (real arcs w=1 plus per-vertex self-loops w=0),
    mirroring raygraph.ops.graph.bfs_distance term for term. Unreached
    vertices keep the INF sentinel and are filtered at the end.

    With ``weight_expr`` (a SQL expression over the edges CTE, e.g.
    ``length(pred)``) this unrolls weighted Bellman–Ford instead:
    parallel edges min-collapse, relaxation adds the weight —
    mirroring raygraph.ops.graph.sssp_distance."""
    from raygraph.ops.graph import BFS_INF

    inf = int(BFS_INF)
    if weight_expr is None:
        real = ", rw AS (SELECT u, v, 1::BIGINT AS w FROM pr)"
        pr = ", pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)"
    else:
        pr = (f", pr AS (SELECT _from AS u, _to AS v, "
              f"min({weight_expr})::BIGINT AS w FROM edges "
              f"GROUP BY _from, _to)")
        real = ", rw AS (SELECT u, v, w FROM pr)"
    parts = [
        f"WITH edges AS ({edges_sql})",
        pr,
        ", vv AS (SELECT u AS x FROM pr UNION SELECT v FROM pr)",
        ", src AS (SELECT u AS s FROM (SELECT u, count(*) AS c FROM "
        "(SELECT DISTINCT u, v FROM pr) GROUP BY u) "
        "ORDER BY c DESC, u LIMIT 1)",
        real,
        ", arcs AS (SELECT u, v, w FROM rw "
        "UNION ALL SELECT x, x, 0::BIGINT FROM vv)",
        ", d0 AS (SELECT x, CASE WHEN x = src.s THEN 0::BIGINT "
        f"ELSE {inf}::BIGINT END AS dist FROM vv, src)",
    ]
    for i in range(iters):
        parts.append(
            f", d{i + 1} AS (SELECT a.v AS x, min(d.dist + a.w) AS dist "
            f"FROM arcs a JOIN d{i} d ON a.u = d.x GROUP BY a.v)")
    parts.append(f" SELECT x AS vertex, dist FROM d{iters} "
                 f"WHERE dist < {inf}")
    return "".join(parts)


def _closeness_sql(edges_sql: str, n_seeds: int, iters: int) -> str:
    """Machine-unrolled multi-source BFS closeness mirroring
    raygraph.ops.graph.closeness_centrality term for term: seeds = top
    out-degree (ties -> smallest id), per round UNION ALL of standing
    labels with one-hop relaxations then min per (source, vertex);
    harmonic term is the same integer floor-div."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        ", pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)",
        f", seeds AS (SELECT u AS s FROM (SELECT u, count(*) AS c "
        f"FROM pr GROUP BY u) ORDER BY c DESC, u LIMIT {n_seeds})",
        ", d0 AS (SELECT s, s AS x, 0::BIGINT AS dist FROM seeds)",
    ]
    for i in range(iters):
        parts.append(
            f", d{i + 1} AS (SELECT s, x, min(dist) AS dist FROM ("
            f"SELECT s, x, dist FROM d{i} UNION ALL "
            f"SELECT d.s, a.v, d.dist + 1 FROM pr a JOIN d{i} d "
            f"ON a.u = d.x) GROUP BY s, x)")
    parts.append(
        f" SELECT s AS source, count(*)::BIGINT AS reached, "
        f"sum(dist)::BIGINT AS dist_sum, "
        f"sum(1000000 // dist)::BIGINT AS harmonic_e6 "
        f"FROM d{iters} WHERE dist > 0 GROUP BY s")
    return "".join(parts)


def _ecc_sql(edges_sql: str, n_seeds: int, iters: int) -> str:
    """Machine-unrolled multi-source BFS eccentricity mirroring
    raygraph.ops.graph.eccentricity_profile: same seed rule and
    relaxation as _closeness_sql, final fold = max(dist) + reached
    count per seed."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        ", pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)",
        f", seeds AS (SELECT u AS s FROM (SELECT u, count(*) AS c "
        f"FROM pr GROUP BY u) ORDER BY c DESC, u LIMIT {n_seeds})",
        ", d0 AS (SELECT s, s AS x, 0::BIGINT AS dist FROM seeds)",
    ]
    for i in range(iters):
        parts.append(
            f", d{i + 1} AS (SELECT s, x, min(dist) AS dist FROM ("
            f"SELECT s, x, dist FROM d{i} UNION ALL "
            f"SELECT d.s, a.v, d.dist + 1 FROM pr a JOIN d{i} d "
            f"ON a.u = d.x) GROUP BY s, x)")
    parts.append(
        f" SELECT s AS source, max(dist)::BIGINT AS ecc, "
        f"count(*)::BIGINT AS reached "
        f"FROM d{iters} WHERE dist > 0 GROUP BY s")
    return "".join(parts)


def _lpa_parts(edges_sql: str, iters: int) -> str:
    """Shared CTE prefix for the LPA oracles: everything up to the
    final l{iters} (vertex, label) table — see _lpa_sql for the spec
    it mirrors."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        ", pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)",
        ", arcs AS (SELECT DISTINCT u, v FROM ("
        "SELECT u, v FROM pr UNION ALL SELECT v, u FROM pr "
        "UNION ALL SELECT u, u FROM pr UNION ALL SELECT v, v FROM pr))",
        ", l0 AS (SELECT u AS vertex, v AS label FROM arcs WHERE u = v)",
    ]
    for i in range(iters):
        parts.append(
            f", l{i + 1} AS (SELECT vertex, substr(min(k), 42) AS label "
            f"FROM (SELECT a.v AS vertex, "
            f"lpad((999999999 - count(*))::VARCHAR, 9, '0') || "
            f"md5(l.label) || l.label "
            f"AS k FROM arcs a JOIN l{i} l ON a.u = l.vertex "
            f"GROUP BY a.v, l.label) GROUP BY vertex)")
    return "".join(parts)


def _lpa_sql(edges_sql: str, iters: int) -> str:
    """Machine-unrolled synchronous label propagation mirroring
    raygraph.ops.graph.label_propagation term for term: undirected
    distinct arcs + one self-loop per vertex, per round a (vertex,
    label) vote count and an argmax resolved as min over the
    zfill9(999999999 - count) || md5(label) || label composite (max
    count, ties -> smallest label md5 = deterministic pseudo-random,
    binary collation on both engines)."""
    return (_lpa_parts(edges_sql, iters)
            + f" SELECT label AS community, count(*)::BIGINT AS size "
              f"FROM l{iters} GROUP BY label")


def _modularity_sql(edges_sql: str, iters: int) -> str:
    """Newman modularity of the LPA partition mirroring
    raygraph.ops.graph.modularity: canonical undirected simple edges,
    per-community intra-edge and degree sums, HUGEINT floor terms
    (1e6*e_c)//m - (1e6*d_c^2)//(4m^2)."""
    return _lpa_parts(edges_sql, iters) + f"""
        , und AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
                  FROM pr WHERE u <> v)
        , mm AS (SELECT count(*)::BIGINT AS m FROM und)
        , dg AS (SELECT x, count(*)::BIGINT AS deg FROM (
                   SELECT a AS x FROM und
                   UNION ALL SELECT b FROM und) GROUP BY x)
        , comm AS (SELECT vertex, label FROM l{iters})
        , ei AS (SELECT cu.label AS community, count(*)::BIGINT AS e_in
                 FROM und
                 JOIN comm cu ON cu.vertex = und.a
                 JOIN comm cv ON cv.vertex = und.b
                 WHERE cu.label = cv.label GROUP BY cu.label)
        , dsm AS (SELECT c.label AS community,
                         sum(dg.deg)::BIGINT AS d_sum
                  FROM dg JOIN comm c ON c.vertex = dg.x
                  GROUP BY c.label)
        SELECT dsm.community,
               coalesce(ei.e_in, 0)::BIGINT AS e_in,
               dsm.d_sum,
               ((1000000::HUGEINT * coalesce(ei.e_in, 0)) // mm.m
                - (1000000::HUGEINT * dsm.d_sum * dsm.d_sum)
                  // (4 * mm.m * mm.m))::BIGINT AS q_term_e6
        FROM dsm LEFT JOIN ei USING (community) CROSS JOIN mm
    """


def _khop_sql(edges_sql: str, n_seeds: int, fanout: int,
              hops: int) -> str:
    """Machine-unrolled k-hop fanout sampling mirroring
    raygraph.ops.graph.khop_sample: distinct directed arcs, per-vertex
    neighbors ranked by md5(v)||v and pruned to fanout, seeds = top
    out-degree (ties -> smallest id), per hop DISTINCT
    (seed, frontier-vertex, sampled-neighbor) arcs."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        ", pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)",
        f", rk AS (SELECT u, v, row_number() OVER (PARTITION BY u "
        f"ORDER BY md5(v) || v) AS rn FROM pr)",
        f", tn AS (SELECT u, v FROM rk WHERE rn <= {fanout})",
        f", seeds AS (SELECT u AS s FROM (SELECT u, count(*) AS c "
        f"FROM pr GROUP BY u) ORDER BY c DESC, u LIMIT {n_seeds})",
        ", f0 AS (SELECT s, s AS x FROM seeds)",
    ]
    for h in range(1, hops + 1):
        parts.append(
            f", a{h} AS (SELECT DISTINCT f.s, f.x AS u, t.v "
            f"FROM f{h - 1} f JOIN tn t ON t.u = f.x)"
            f", f{h} AS (SELECT DISTINCT s, v AS x FROM a{h})")
    final = " UNION ALL ".join(
        f"SELECT s AS source, {h}::BIGINT AS hop, u, v FROM a{h}"
        for h in range(1, hops + 1))
    parts.append(" " + final)
    return "".join(parts)


def _betweenness_sql(edges_sql: str, n_seeds: int, hops: int) -> str:
    """Machine-unrolled sampled hop-bounded Brandes betweenness
    mirroring raygraph.ops.graph.betweenness_sampled: forward
    level-synchronous sigma BFS (visited anti-join), backward
    dependency sweep with per-term ``(sigma_u*(1e6+delta_w))//sigma_w``
    floored independently, source endpoints excluded."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        ", pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)",
        f", seeds AS (SELECT u AS s FROM (SELECT u, count(*) AS c "
        f"FROM pr GROUP BY u) ORDER BY c DESC, u LIMIT {n_seeds})",
        ", lv0 AS (SELECT s, s AS v, 1::BIGINT AS sigma FROM seeds)",
        ", vis0 AS (SELECT s, v FROM lv0)",
    ]
    for i in range(1, hops + 1):
        parts.append(
            f", lv{i} AS (SELECT l.s, a.v, sum(l.sigma)::BIGINT AS sigma"
            f" FROM lv{i - 1} l JOIN pr a ON a.u = l.v"
            f" WHERE NOT EXISTS (SELECT 1 FROM vis{i - 1} x"
            f" WHERE x.s = l.s AND x.v = a.v) GROUP BY l.s, a.v)"
            f", vis{i} AS (SELECT s, v FROM vis{i - 1}"
            f" UNION ALL SELECT s, v FROM lv{i})")
    parts.append(f", del{hops} AS (SELECT s, v, 0::BIGINT AS delta "
                 f"FROM lv{hops})")
    for i in range(hops - 1, -1, -1):
        parts.append(
            f", trm{i} AS (SELECT l.s, l.v,"
            f" ((l.sigma * (1000000 + d.delta)) // h.sigma)::BIGINT AS t"
            f" FROM lv{i} l JOIN pr a ON a.u = l.v"
            f" JOIN lv{i + 1} h ON h.s = l.s AND h.v = a.v"
            f" JOIN del{i + 1} d ON d.s = h.s AND d.v = h.v)"
            f", del{i} AS (SELECT l.s, l.v,"
            f" coalesce(tt.t, 0)::BIGINT AS delta FROM lv{i} l"
            f" LEFT JOIN (SELECT s, v, sum(t)::BIGINT AS t FROM trm{i}"
            f" GROUP BY s, v) tt ON tt.s = l.s AND tt.v = l.v)")
    final = " UNION ALL ".join(
        f"SELECT s, v, delta FROM del{i}" for i in range(hops))
    parts.append(
        f" SELECT v AS vertex, sum(delta)::BIGINT AS bc_e6 FROM ({final})"
        f" WHERE s <> v GROUP BY v")
    return "".join(parts)


def _matching_sql(edges_sql: str, iters: int) -> str:
    """Machine-unrolled maximal matching mirroring
    raygraph.ops.graph.maximal_matching round for round: canonical
    undirected edges (u < v, self-loops dropped), deterministic edge
    priority md5(u|v)||u|v, an edge matches iff its priority is the
    minimum at BOTH endpoints, matched vertices kill their incident
    edges each round."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        ", a1 AS (SELECT u, v, md5(u || '|' || v) || u || '|' || v AS p"
        " FROM (SELECT DISTINCT least(_from, _to) AS u,"
        " greatest(_from, _to) AS v FROM edges WHERE _from <> _to))",
    ]
    for r in range(1, iters + 1):
        parts.append(
            f", m{r} AS (SELECT x, min(p) AS m FROM ("
            f"SELECT u AS x, p FROM a{r} UNION ALL "
            f"SELECT v AS x, p FROM a{r}) GROUP BY x)"
            f", sel{r} AS (SELECT a.u, a.v FROM a{r} a "
            f"JOIN m{r} mu ON a.u = mu.x AND a.p = mu.m "
            f"JOIN m{r} mv ON a.v = mv.x AND a.p = mv.m)"
            f", rm{r} AS (SELECT u AS x FROM sel{r} "
            f"UNION SELECT v FROM sel{r})"
            f", a{r + 1} AS (SELECT * FROM a{r} WHERE "
            f"u NOT IN (SELECT x FROM rm{r}) AND "
            f"v NOT IN (SELECT x FROM rm{r}))")
    final = " UNION ALL ".join(
        f"SELECT u, v, {r}::BIGINT AS round FROM sel{r}"
        for r in range(1, iters + 1))
    parts.append(" " + final)
    return "".join(parts)


def _mis_sql(edges_sql: str, iters: int) -> str:
    """Machine-unrolled Luby-style MIS mirroring
    raygraph.ops.graph.maximal_independent_set round for round:
    undirected distinct arcs (u<>v; injected self-loop rows carry the
    vertex set), deterministic priority md5(x)||x, winner = undecided
    vertex with priority strictly below every undecided neighbor's
    (or no undecided neighbor), winners+neighbors removed per round."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        ", pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)",
        ", base AS (SELECT DISTINCT u, v FROM ("
        "SELECT u, v FROM pr UNION ALL SELECT v, u FROM pr "
        "UNION ALL SELECT u, u FROM pr UNION ALL SELECT v, v FROM pr))",
        ", arcs AS (SELECT u, v FROM base WHERE u <> v)",
        ", u1 AS (SELECT u AS x FROM base WHERE u = v)",
    ]
    for r in range(1, iters + 1):
        parts.append(
            f", nm{r} AS (SELECT a.u AS x, min(md5(a.v) || a.v) AS m "
            f"FROM arcs a JOIN u{r} d ON a.v = d.x GROUP BY a.u)"
            f", sel{r} AS (SELECT d.x FROM u{r} d LEFT JOIN nm{r} n "
            f"ON d.x = n.x WHERE n.x IS NULL OR md5(d.x) || d.x < n.m)"
            f", u{r + 1} AS (SELECT x FROM u{r} WHERE x NOT IN ("
            f"SELECT x FROM sel{r} UNION "
            f"SELECT a.v FROM arcs a JOIN sel{r} s ON a.u = s.x))")
    final = " UNION ALL ".join(
        f"SELECT x AS vertex, {r}::BIGINT AS round FROM sel{r}"
        for r in range(1, iters + 1))
    parts.append(" " + final)
    return "".join(parts)


def _pca_sql(iters: int) -> str:
    """Machine-unrolled integer PCA power iteration mirroring
    raygraph.ops.cluster.pca_power term for term: ×10³ trunc
    quantization, n²-scaled covariance, ceil-div scale-down to ≤2^14
    (DuckDB ``//`` truncation = the op's explicit trunc-div), then
    ``iters`` join-based matvec rounds in HUGEINT, cast back at the
    end."""
    from raygraph.ops.cluster import PCA_CBITS, PCA_SCALE

    parts = [f"""WITH xe AS (
          SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
                 CAST(trunc(unnest(embedding)::DOUBLE * {PCA_SCALE})
                      AS BIGINT) AS x
          FROM embeddings
        ),
        nn AS (SELECT count(*)::BIGINT AS n FROM embeddings),
        s2 AS (SELECT a.dim AS i, b.dim AS j,
                      sum(a.x * b.x)::BIGINT AS s
               FROM xe a JOIN xe b USING (vec_id) GROUP BY 1, 2),
        mm AS (SELECT dim AS i, sum(x)::BIGINT AS m FROM xe GROUP BY 1),
        craw AS (SELECT s2.i, s2.j, nn.n * s2.s - ma.m * mb.m AS c
                 FROM s2 CROSS JOIN nn
                 JOIN mm ma ON s2.i = ma.i JOIN mm mb ON s2.j = mb.i),
        kk AS (SELECT greatest(1, (max(abs(c)) + {PCA_CBITS - 1})
                     // {PCA_CBITS}) AS k FROM craw),
        cm AS (SELECT i, j, c // kk.k AS c FROM craw, kk),
        v0 AS (SELECT DISTINCT dim AS i, 1::BIGINT AS v FROM xe)"""]
    for t in range(iters):
        parts.append(
            f", v{t + 1} AS (SELECT cm.i, sum(cm.c * v.v) AS v "
            f"FROM cm JOIN v{t} v ON cm.j = v.i GROUP BY cm.i)")
    parts.append(f" SELECT i AS dim, CAST(v AS BIGINT) AS v FROM v{iters}")
    return "".join(parts)


def _zorder_sql_expr(xcol: str, ycol: str, bits: int = 16) -> str:
    """Bit-interleave expression mirroring
    raygraph.ops.relational.zorder_key: bit i of x → 2i, of y → 2i+1."""
    terms = []
    for b in range(bits):
        terms.append(f"((({xcol}) >> {b}) & 1) * {1 << (2 * b)}")
        terms.append(f"((({ycol}) >> {b}) & 1) * {1 << (2 * b + 1)}")
    return " + ".join(terms)


def _hits_sql(edges_sql: str, iters: int) -> str:
    """Machine-unrolled integer HITS mirroring
    raygraph.ops.graph.hits_authorities: per half-round a join +
    group-sum, then a ceil-div rescale by the round max (all scores
    nonnegative, so DuckDB's truncating // equals floor)."""
    from raygraph.ops.graph import HITS_CAP

    parts = [
        f"WITH edges AS ({edges_sql})",
        ", pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)",
        ", vv AS (SELECT DISTINCT x FROM "
        "(SELECT u AS x FROM pr UNION ALL SELECT v FROM pr))",
        ", h0 AS (SELECT x, 1::BIGINT AS s FROM vv)",
    ]
    for t in range(iters):
        for tag, prev, key_in, key_out in (
                ("a", f"h{t}", "u", "v"), ("h", f"a{t + 1}", "v", "u")):
            parts += [
                f", {tag}r{t + 1} AS (SELECT p.{key_out} AS x, "
                f"sum(z.s)::BIGINT AS s FROM pr p "
                f"JOIN {prev} z ON p.{key_in} = z.x GROUP BY p.{key_out})",
                f", {tag}k{t + 1} AS (SELECT greatest(1, (max(s) + "
                f"{HITS_CAP - 1}) // {HITS_CAP}) AS k FROM {tag}r{t + 1})",
                f", {tag}{t + 1} AS (SELECT x, s // {tag}k{t + 1}.k AS s "
                f"FROM {tag}r{t + 1}, {tag}k{t + 1})",
            ]
    parts.append(f" SELECT x AS vertex, s AS auth FROM a{iters}")
    return "".join(parts)


def _kcore_sql(edges_sql: str, k: int, iters: int) -> str:
    """Machine-unrolled k-core peel: per round the arc set is restricted
    to live endpoints (two joins), degrees counted, sub-k vertices
    dropped — mirroring raygraph.ops.graph.kcore term for term."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        ", pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)",
        ", arcs AS (SELECT DISTINCT u, v FROM "
        "(SELECT u, v FROM pr UNION ALL SELECT v AS u, u AS v FROM pr) "
        "WHERE u <> v)",
        ", a0 AS (SELECT DISTINCT u AS x FROM arcs)",
    ]
    for i in range(iters):
        parts += [
            f", d{i} AS (SELECT a.u AS x, count(*)::BIGINT AS deg "
            f"FROM arcs a JOIN a{i} l ON a.u = l.x "
            f"JOIN a{i} r ON a.v = r.x GROUP BY a.u)",
            f", a{i + 1} AS (SELECT x FROM d{i} WHERE deg >= {k})",
        ]
    parts.append(f" SELECT x AS vertex, deg FROM d{iters - 1} "
                 f"WHERE deg >= {k}")
    return "".join(parts)


def _scc_sql(edges_sql: str, iters: int) -> str:
    """Machine-unrolled forward/backward min-label SCC coloring —
    mirrors raygraph.ops.graph.scc_coloring round for round (directed
    min propagation with self-fold via least/coalesce, then the
    in==out pair filter)."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        ", pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)",
        ", vv AS (SELECT u AS x FROM pr UNION SELECT v FROM pr)",
        ", f0 AS (SELECT x, x AS l FROM vv)",
        ", b0 AS (SELECT x, x AS l FROM vv)",
    ]
    for i in range(iters):
        parts += [
            f", fm{i} AS (SELECT p.v AS x, min(l.l) AS ml "
            f"FROM pr p JOIN f{i} l ON p.u = l.x GROUP BY p.v)",
            f", f{i + 1} AS (SELECT v.x, "
            f"least(l.l, coalesce(m.ml, l.l)) AS l "
            f"FROM vv v JOIN f{i} l ON v.x = l.x "
            f"LEFT JOIN fm{i} m ON v.x = m.x)",
            f", bm{i} AS (SELECT p.u AS x, min(l.l) AS ml "
            f"FROM pr p JOIN b{i} l ON p.v = l.x GROUP BY p.u)",
            f", b{i + 1} AS (SELECT v.x, "
            f"least(l.l, coalesce(m.ml, l.l)) AS l "
            f"FROM vv v JOIN b{i} l ON v.x = l.x "
            f"LEFT JOIN bm{i} m ON v.x = m.x)",
        ]
    parts.append(
        f" SELECT f.l AS scc_id, count(*)::BIGINT AS n_vertices "
        f"FROM f{iters} f JOIN b{iters} b ON b.x = f.x AND b.l = f.l "
        f"GROUP BY f.l")
    return "".join(parts)


def _bfs_paths_sql(edges_sql: str, iters: int) -> str:
    """Machine-unrolled shortest-path counting from the max-out-degree
    pivot — mirrors raygraph.ops.graph.bfs_path_counts level for level
    (frontier σ sums along arcs, settled anti-join keeps first
    arrivals)."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        ", pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)",
        ", src AS (SELECT u AS s FROM (SELECT u, count(*) AS c FROM pr "
        "GROUP BY u) ORDER BY c DESC, u LIMIT 1)",
        ", f0 AS (SELECT s AS x, 1::BIGINT AS sig FROM src)",
        ", s0 AS (SELECT x, 0::BIGINT AS dist, sig FROM f0)",
    ]
    for i in range(iters):
        parts += [
            f", m{i} AS (SELECT p.v AS x, sum(f.sig)::BIGINT AS sig "
            f"FROM pr p JOIN f{i} f ON p.u = f.x GROUP BY p.v)",
            f", f{i + 1} AS (SELECT m.x, m.sig FROM m{i} m "
            f"LEFT JOIN s{i} s ON s.x = m.x WHERE s.x IS NULL)",
            f", s{i + 1} AS (SELECT * FROM s{i} UNION ALL "
            f"SELECT x, {i + 1}::BIGINT, sig FROM f{i + 1})",
        ]
    parts.append(
        f" SELECT x AS vertex, dist, sig AS n_paths FROM s{iters}")
    return "".join(parts)


def _markov_sql(iters: int, scale: int = 10**12) -> str:
    """Machine-unrolled integer power iteration over the event-type
    transition matrix — mirrors raygraph.ops.events.markov_stationary's
    fixed-point spec term for term (uniform start scale // K, floor
    contributions, sinks drop mass via the inner join)."""
    parts = [
        """WITH s AS (
          SELECT user_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev
          FROM events
        ),
        tr AS (SELECT prev AS f, event_type AS t, count(*)::BIGINT AS n
               FROM s WHERE prev IS NOT NULL GROUP BY f, t),
        tt AS (SELECT f, sum(n)::BIGINT AS tot FROM tr GROUP BY f),
        ty AS (SELECT f AS x FROM tr UNION SELECT t FROM tr),
        kk AS (SELECT count(*)::BIGINT AS k FROM ty)""",
        f", r0 AS (SELECT x, ({scale}::BIGINT // kk.k) AS r FROM ty, kk)",
    ]
    for i in range(iters):
        parts += [
            f", c{i} AS (SELECT r.x, r.r // tt.tot AS c "
            f"FROM r{i} r JOIN tt ON tt.f = r.x)",
            f", r{i + 1} AS (SELECT ty.x, coalesce(s.s, 0)::BIGINT AS r "
            f"FROM ty LEFT JOIN (SELECT tr.t AS x, "
            f"sum(c.c * tr.n)::BIGINT AS s FROM tr "
            f"JOIN c{i} c ON tr.f = c.x GROUP BY tr.t) s ON s.x = ty.x)",
        ]
    parts.append(
        f" SELECT x AS event_type, r AS prob_e12 FROM r{iters}")
    return "\n".join(parts)


def _pagerank_sql(edges_sql: str, iters: int,
                  personalize: bool = False) -> str:
    """Machine-unrolled integer PageRank: each iteration is a join +
    groupby + dangling-mass scalar + realign CTE, mirroring
    raygraph.ops.graph.pagerank's fixed-point spec term for term (all
    BIGINT floor arithmetic, so the match is bit-for-bit).

    ``personalize=True`` unrolls the personalized variant instead
    (restart + dangling mass to the max-out-degree source, ties →
    smallest id — the kg_bfs source convention)."""
    from raygraph.ops.graph import SCALE

    parts = [
        f"WITH edges AS ({edges_sql})",
        ", pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)",
        ", vv AS (SELECT u AS x FROM pr UNION SELECT v FROM pr)",
        ", nn AS (SELECT count(*)::BIGINT AS n FROM vv)",
        ", od AS (SELECT u AS x, count(*)::BIGINT AS d FROM pr GROUP BY u)",
    ]
    if personalize:
        parts += [
            ", sv AS (SELECT u AS s FROM (SELECT u, count(*) AS c "
            "FROM pr GROUP BY u) ORDER BY c DESC, u LIMIT 1)",
            f", r0 AS (SELECT x, CASE WHEN x = sv.s THEN {SCALE}::BIGINT "
            "ELSE 0::BIGINT END AS r FROM vv, sv)",
        ]
    else:
        parts.append(
            f", r0 AS (SELECT x, ({SCALE}::BIGINT // nn.n) AS r "
            "FROM vv, nn)")
    for i in range(iters):
        parts += [
            f", c{i} AS (SELECT r.x, r.r // od.d AS c "
            f"FROM r{i} r JOIN od ON r.x = od.x)",
            f", s{i} AS (SELECT p.v AS x, sum(c.c)::BIGINT AS s "
            f"FROM pr p JOIN c{i} c ON p.u = c.x GROUP BY p.v)",
            f", g{i} AS (SELECT coalesce(sum(r.r), 0)::BIGINT AS dg "
            f"FROM r{i} r LEFT JOIN od ON r.x = od.x WHERE od.x IS NULL)",
        ]
        if personalize:
            parts.append(
                f", r{i + 1} AS (SELECT vv.x, CASE WHEN vv.x = sv.s THEN "
                f"(15 * {SCALE}::BIGINT) // 100 "
                f"+ (85 * (coalesce(s.s, 0) + g.dg)) // 100 "
                f"ELSE (85 * coalesce(s.s, 0)) // 100 END AS r "
                f"FROM vv CROSS JOIN sv CROSS JOIN g{i} g "
                f"LEFT JOIN s{i} s ON vv.x = s.x)")
        else:
            parts.append(
                f", r{i + 1} AS (SELECT vv.x, "
                f"(15 * {SCALE}::BIGINT) // (100 * nn.n) "
                f"+ (85 * (coalesce(s.s, 0) + g.dg // nn.n)) // 100 AS r "
                f"FROM vv CROSS JOIN nn CROSS JOIN g{i} g "
                f"LEFT JOIN s{i} s ON vv.x = s.x)")
    parts.append(f" SELECT x AS vertex, r AS rank_e12 FROM r{iters}")
    return "".join(parts)


def _katz_sql(edges_sql: str, iters: int, beta_den: int) -> str:
    """Machine-unrolled integer Katz centrality mirroring
    raygraph.ops.graph.katz_centrality term for term: x0 = 10^6 on
    every arc endpoint, per round S(v) = sum of in-neighbor scores and
    x' = 10^6 + S // beta_den (BIGINT floor, bit-for-bit)."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        ", pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)",
        ", vv AS (SELECT u AS x FROM pr UNION SELECT v FROM pr)",
        ", k0 AS (SELECT x, 1000000::BIGINT AS k FROM vv)",
    ]
    for i in range(iters):
        parts.append(
            f", k{i + 1} AS (SELECT vv.x, 1000000 + "
            f"coalesce(s.s, 0) // {beta_den} AS k FROM vv LEFT JOIN "
            f"(SELECT p.v AS x, sum(k.k)::BIGINT AS s FROM pr p "
            f"JOIN k{i} k ON p.u = k.x GROUP BY p.v) s ON vv.x = s.x)")
    parts.append(f" SELECT x AS vertex, k AS katz_e6 FROM k{iters}")
    return "".join(parts)


def _coloring_sql(edges_sql: str, iters: int) -> str:
    """Machine-unrolled Jones–Plassmann coloring mirroring
    raygraph.ops.graph.greedy_coloring round for round: md5(x)||x
    priority winners against UNCOLORED neighbors, color = mex spelled
    as min({0} ∪ {c+1: c used}) not in used, winners-only removal.
    Every multiply-referenced round CTE is MATERIALIZED (DuckDB
    inlines CTEs; an unrolled chain explodes otherwise)."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        ", pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)",
        ", base AS (SELECT DISTINCT u, v FROM ("
        "SELECT u, v FROM pr UNION ALL SELECT v, u FROM pr "
        "UNION ALL SELECT u, u FROM pr UNION ALL SELECT v, v FROM pr))",
        ", arcs AS (SELECT u, v FROM base WHERE u <> v)",
        ", u1 AS MATERIALIZED (SELECT u AS x FROM base WHERE u = v)",
        ", col0 AS (SELECT ''::VARCHAR AS x, 0::BIGINT AS color "
        "WHERE 1 = 0)",
    ]
    for r in range(1, iters + 1):
        parts.append(
            f", nm{r} AS (SELECT a.u AS x, min(md5(a.v) || a.v) AS m "
            f"FROM arcs a JOIN u{r} d ON a.v = d.x GROUP BY a.u)"
            f", sel{r} AS MATERIALIZED (SELECT d.x FROM u{r} d "
            f"LEFT JOIN nm{r} n ON d.x = n.x "
            f"WHERE n.x IS NULL OR md5(d.x) || d.x < n.m)"
            f", used{r} AS MATERIALIZED (SELECT DISTINCT s.x, "
            f"c.color AS c FROM sel{r} s JOIN arcs a ON a.u = s.x "
            f"JOIN col{r - 1} c ON c.x = a.v)"
            f", cand{r} AS (SELECT x, 0::BIGINT AS k FROM sel{r} "
            f"UNION ALL SELECT x, c + 1 FROM used{r})"
            f", mex{r} AS (SELECT c.x, min(c.k)::BIGINT AS color "
            f"FROM cand{r} c WHERE NOT EXISTS (SELECT 1 FROM used{r} "
            f"uu WHERE uu.x = c.x AND uu.c = c.k) GROUP BY c.x)"
            f", col{r} AS MATERIALIZED (SELECT * FROM col{r - 1} "
            f"UNION ALL SELECT x, color FROM mex{r})"
            f", u{r + 1} AS MATERIALIZED (SELECT x FROM u{r} "
            f"WHERE x NOT IN (SELECT x FROM sel{r}))")
    parts.append(
        f" SELECT x AS vertex, color FROM col{iters}")
    return "".join(parts)


def _ppr_sql(edges_sql: str, n_seeds: int, iters: int,
             alpha_den: int) -> str:
    """Machine-unrolled integer personalized PageRank mirroring
    raygraph.ops.graph.personalized_pagerank term for term: restart
    r = 10^6 // n_seeds on the top-out-degree seeds, per round per-arc
    spread x(u) // d(u), x' = r + S·(alpha_den−1) // alpha_den."""
    r_expr = (f"CASE WHEN EXISTS(SELECT 1 FROM seeds WHERE s = vv.x) "
              f"THEN {10**6 // n_seeds} ELSE 0 END::BIGINT")
    parts = [
        f"WITH edges AS ({edges_sql})",
        ", pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)",
        ", dg AS (SELECT u, count(*)::BIGINT AS d FROM pr GROUP BY u)",
        ", vv AS (SELECT u AS x FROM pr UNION SELECT v FROM pr)",
        f", seeds AS (SELECT u AS s FROM dg ORDER BY d DESC, u "
        f"LIMIT {n_seeds})",
        f", rr AS MATERIALIZED (SELECT vv.x, {r_expr} AS r FROM vv)",
        ", p0 AS (SELECT x, r AS k FROM rr)",
    ]
    for i in range(iters):
        parts.append(
            f", p{i + 1} AS MATERIALIZED (SELECT rr.x, rr.r + "
            f"coalesce(s.s, 0) * {alpha_den - 1} // {alpha_den} AS k "
            f"FROM rr LEFT JOIN "
            f"(SELECT p.v AS x, sum(k.k // dg.d)::BIGINT AS s "
            f"FROM pr p JOIN p{i} k ON p.u = k.x "
            f"JOIN dg ON dg.u = p.u GROUP BY p.v) s ON rr.x = s.x)")
    parts.append(f" SELECT x AS vertex, k AS ppr_e6 FROM p{iters}")
    return "".join(parts)


def _cascade_sql(edges_sql: str, n_seeds: int, p_pct: int,
                 rounds: int) -> str:
    """Machine-unrolled independent cascade mirroring
    raygraph.ops.graph.cascade_spread: top-degree seeds, md5-coin arc
    activation per round, NOT-EXISTS freshness, fixed rounds."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        ", pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)",
        ", dg AS (SELECT u, count(*)::BIGINT AS d FROM pr GROUP BY u)",
        f", seeds AS (SELECT u AS s FROM dg ORDER BY d DESC, u "
        f"LIMIT {n_seeds})",
        ", a0 AS MATERIALIZED (SELECT s AS vertex, 0::BIGINT AS rnd "
        "FROM seeds)",
        ", f0 AS (SELECT vertex FROM a0)",
    ]
    for r in range(1, rounds + 1):
        parts += [
            f", h{r} AS (SELECT DISTINCT p.v AS vertex FROM pr p "
            f"JOIN f{r - 1} f ON p.u = f.vertex "
            f"WHERE ('0x'||substr(md5(p.u||'|'||p.v||'|'||{r}),1,15))"
            f"::BIGINT % 100 < {p_pct})",
            f", f{r} AS MATERIALIZED (SELECT h.vertex FROM h{r} h "
            f"WHERE NOT EXISTS (SELECT 1 FROM a{r - 1} a "
            f"WHERE a.vertex = h.vertex))",
            f", a{r} AS MATERIALIZED (SELECT * FROM a{r - 1} "
            f"UNION ALL SELECT vertex, {r}::BIGINT FROM f{r})",
        ]
    parts.append(
        f" SELECT vertex, rnd AS \"round\" FROM a{rounds}")
    return "".join(parts)


def _node2vec_sql(edges_sql: str, n_seeds: int, hops: int) -> str:
    """Machine-unrolled deterministic node2vec walks mirroring
    raygraph.ops.graph.node2vec_walks: undirected arcs, top-degree
    seeds, per step class ('0' dist-1 / '1' explore / '2' return) ||
    md5(seed|step|x) || x argmin."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        ", pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)",
        ", und AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v "
        "FROM pr WHERE u <> v)",
        ", arcs AS MATERIALIZED (SELECT u AS a, v AS b FROM und "
        "UNION ALL SELECT v, u FROM und)",
        ", ak AS MATERIALIZED (SELECT DISTINCT a||'|'||b AS pk "
        "FROM arcs)",
        ", dg AS (SELECT a AS vertex, count(*)::BIGINT AS d FROM arcs "
        "GROUP BY a)",
        f", seeds AS (SELECT vertex AS s FROM dg "
        f"ORDER BY d DESC, vertex LIMIT {n_seeds})",
        ", w0 AS (SELECT s AS seed, '' AS prev, s AS cur FROM seeds)",
    ]
    for i in range(1, hops + 1):
        parts += [
            f", c{i} AS (SELECT w.seed, w.prev, w.cur, a.b AS x "
            f"FROM w{i - 1} w JOIN arcs a ON w.cur = a.a)",
            f", k{i} AS (SELECT seed, cur, x, "
            f"(CASE WHEN x = prev THEN '2' "
            f"WHEN EXISTS (SELECT 1 FROM ak WHERE pk = prev||'|'||x) "
            f"THEN '0' ELSE '1' END) "
            f"|| md5(seed||'|'||{i}||'|'||x) || x AS k FROM c{i})",
            f", p{i} AS (SELECT seed, min(k) AS mk FROM k{i} "
            f"GROUP BY seed)",
            f", w{i} AS (SELECT k.seed, k.cur AS prev, k.x AS cur "
            f"FROM k{i} k JOIN p{i} p ON k.seed = p.seed "
            f"AND k.k = p.mk)",
        ]
    sel = ["SELECT seed, 0::BIGINT AS step, cur AS vertex FROM w0"]
    sel += [f"SELECT seed, {i}::BIGINT, cur FROM w{i}"
            for i in range(1, hops + 1)]
    parts.append(" " + " UNION ALL ".join(sel))
    return "".join(parts)


def _wl_sql(edges_sql: str, iters: int) -> str:
    """Machine-unrolled Weisfeiler–Lehman refinement mirroring
    raygraph.ops.graph.wl_colors term for term: undirected simple
    graph, c0 = md5(degree), per round md5(own || '|' ||
    sorted ','-joined neighbor colors) — md5 + binary collation make
    the class histogram bit-identical across engines."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        ", pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)",
        ", und AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v "
        "FROM pr WHERE u <> v)",
        ", arcs AS (SELECT u AS a, v AS b FROM und "
        "UNION ALL SELECT v, u FROM und)",
        ", deg AS (SELECT a AS vertex, count(*)::BIGINT AS d "
        "FROM arcs GROUP BY a)",
        ", c0 AS (SELECT vertex, md5(d::VARCHAR) AS c FROM deg)",
    ]
    for i in range(iters):
        parts += [
            f", n{i} AS (SELECT a2.b AS vertex, "
            f"string_agg(c.c, ',' ORDER BY c.c) AS nbs "
            f"FROM arcs a2 JOIN c{i} c ON a2.a = c.vertex GROUP BY a2.b)",
            f", c{i + 1} AS (SELECT n.vertex, "
            f"md5(c.c || '|' || n.nbs) AS c "
            f"FROM n{i} n JOIN c{i} c ON n.vertex = c.vertex)",
        ]
    parts.append(
        f" SELECT c AS color, count(*)::BIGINT AS size "
        f"FROM c{iters} GROUP BY c")
    return "".join(parts)


def _msf_sql(edges_sql: str, iters: int, inner: int) -> str:
    """Machine-unrolled Borůvka minimum spanning forest mirroring
    raygraph.ops.graph.msf_boruvka term for term: md5-derived weights
    on canonical pairs, per round a per-component min-k hook (k =
    zfill6(w)||'|'||ekey), pair-key dedup, then a one-hop min-parent +
    ``inner`` pointer-jumping rounds over the picked component graph
    with self-loops; final forest = DISTINCT picked edges."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        ", pr AS MATERIALIZED (SELECT DISTINCT _from AS u, _to AS v FROM edges)",
        ", und AS MATERIALIZED (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v "
        "FROM pr WHERE u <> v)",
        ", we AS MATERIALIZED (SELECT u, v, ('0x'||substr(md5(u||'|'||v),1,15))::BIGINT "
        "% 1000000 AS w, u||'|'||v AS ekey FROM und)",
        ", vv AS MATERIALIZED (SELECT u AS x FROM und UNION SELECT v FROM und)",
        ", l0 AS MATERIALIZED (SELECT x, x AS c FROM vv)",
    ]
    for i in range(iters):
        parts += [
            f", x{i} AS MATERIALIZED (SELECT e.u, e.v, e.w, e.ekey, lu.c AS cu, "
            f"lv.c AS cv FROM we e JOIN l{i} lu ON e.u = lu.x "
            f"JOIN l{i} lv ON e.v = lv.x WHERE lu.c <> lv.c)",
            f", cand{i} AS MATERIALIZED (SELECT cu AS comp, u, v, w, ekey, cu, cv "
            f"FROM x{i} UNION ALL "
            f"SELECT cv, u, v, w, ekey, cu, cv FROM x{i})",
            f", pick{i} AS MATERIALIZED (SELECT comp, "
            f"min(lpad(w::VARCHAR, 6, '0')||'|'||ekey) AS k "
            f"FROM cand{i} GROUP BY comp)",
            f", ch{i} AS MATERIALIZED (SELECT DISTINCT c.u, c.v, c.w, c.ekey, c.cu, "
            f"c.cv FROM cand{i} c JOIN pick{i} p ON c.comp = p.comp "
            f"AND lpad(c.w::VARCHAR, 6, '0')||'|'||c.ekey = p.k)",
            f", ca{i} AS MATERIALIZED (SELECT cu AS a, cv AS b FROM ch{i} "
            f"UNION SELECT cv, cu FROM ch{i} "
            f"UNION SELECT c, c FROM l{i})",
            f", m{i}_0 AS MATERIALIZED (SELECT b AS comp, min(a) AS nc "
            f"FROM ca{i} GROUP BY b)",
        ]
        for j in range(inner):
            parts.append(
                f", m{i}_{j + 1} AS MATERIALIZED (SELECT x.comp, y.nc "
                f"FROM m{i}_{j} x JOIN m{i}_{j} y ON x.nc = y.comp)")
        parts.append(
            f", l{i + 1} AS MATERIALIZED (SELECT l.x, m.nc AS c FROM l{i} l "
            f"JOIN m{i}_{inner} m ON l.c = m.comp)")
    sel = " UNION ALL ".join(
        f"SELECT u, v, w FROM ch{i}" for i in range(iters))
    parts.append(f" SELECT DISTINCT u, v, w FROM ({sel})")
    return "".join(parts)


def _components_sql(edges_sql: str, iters: int) -> str:
    """Machine-unrolled label propagation: per round, the neighborhood
    minimum folds into each vertex's label (least/coalesce), mirroring
    raygraph.ops.graph.connected_components exactly (binary-collation
    string min on both engines)."""
    parts = [
        f"WITH edges AS ({edges_sql})",
        ", pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)",
        ", arcs AS (SELECT u, v FROM pr UNION SELECT v AS u, u AS v FROM pr)",
        ", vv AS (SELECT DISTINCT u AS x FROM arcs)",
        ", l0 AS (SELECT x, x AS l FROM vv)",
    ]
    for i in range(iters):
        parts += [
            f", m{i} AS (SELECT a.v AS x, min(l.l) AS ml "
            f"FROM arcs a JOIN l{i} l ON a.u = l.x GROUP BY a.v)",
            f", l{i + 1} AS (SELECT v.x, "
            f"least(l.l, coalesce(m.ml, l.l)) AS l "
            f"FROM vv v JOIN l{i} l ON v.x = l.x "
            f"LEFT JOIN m{i} m ON v.x = m.x)",
        ]
    parts.append(f" SELECT x AS vertex, l AS component FROM l{iters}")
    return "".join(parts)


def _hll_sql(table: str, group_col: str, value_col: str) -> str:
    """The integer HLL estimator recomputed in SQL: identical md5-60bit
    hashes, register maxima via bin()-length bit_length, exact HUGEINT
    power sums, and the same ×10^4 floor-divide estimate —
    raygraph.ops.sketch.hll_distinct's spec term for term."""
    from raygraph.ops.sketch import ALPHA_E6, M, W

    return f"""
        WITH h AS (
          SELECT DISTINCT {group_col},
                 ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))
                   ::BIGINT AS h
          FROM {table}
        ),
        b AS (SELECT {group_col}, h >> {W} AS j,
                     h & ((1::BIGINT << {W}) - 1) AS w
              FROM h),
        r AS (SELECT {group_col}, j,
                     max(CASE WHEN w = 0 THEN {W + 1}
                              ELSE {W + 1} - length(bin(w)) END) AS mj
              FROM b GROUP BY {group_col}, j),
        g AS (SELECT DISTINCT {group_col} FROM {table}),
        allb AS (SELECT g.{group_col}, t.x AS j
                 FROM g CROSS JOIN range({M}) t(x)),
        reg AS (SELECT a.{group_col}, a.j, coalesce(r.mj, 0) AS mj
                FROM allb a LEFT JOIN r
                  ON a.{group_col} = r.{group_col} AND a.j = r.j),
        s AS (SELECT {group_col}, sum(1::HUGEINT << (60 - mj)) AS S
              FROM reg GROUP BY {group_col})
        SELECT {group_col},
               (({ALPHA_E6}::HUGEINT * {M} * {M} * (1::HUGEINT << 60)
                 * 10000) // (1000000::HUGEINT * S))::BIGINT AS approx_n_e4
        FROM s
    """


# lowercased-whitespace-token CTE shared by the text oracles
_TOKS_CTE = """
    WITH t AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
             END AS toks,
             length(text) AS n_chars,
             length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS n_punct
      FROM documents
    )
"""


# Naive Bayes shared CTE chain: parity tokens → id-derived labels →
# top-256 vocab (count DESC, token ASC) → dense class×vocab count grid
# → per-cell floor(1e6·ln) smoothed log-likelihoods. MATERIALIZED on
# the multiply-referenced CTEs (DuckDB inlines CTEs; see the MSF
# oracle note).
_NB_CTE = """
    WITH t AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
             END AS toks
      FROM documents
    ),
    lab AS MATERIALIZED (
      SELECT doc_id, toks, 'c' || CAST(doc_id % 3 AS VARCHAR) AS label
      FROM t
    ),
    alltok AS (SELECT label, unnest(toks) AS tok FROM lab),
    vocab AS MATERIALIZED (
      SELECT tok FROM (
        SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok ASC)
               AS rn
        FROM alltok GROUP BY tok
      ) WHERE rn <= 256
    ),
    vn AS (SELECT count(*) AS V FROM vocab),
    c AS (
      SELECT a.label, a.tok, count(*)::BIGINT AS c
      FROM alltok a JOIN vocab v ON v.tok = a.tok
      GROUP BY a.label, a.tok
    ),
    grid AS MATERIALIZED (
      SELECT l.label, vb.tok AS token, coalesce(c.c, 0)::BIGINT AS c
      FROM (SELECT DISTINCT label FROM lab) l
      CROSS JOIN vocab vb
      LEFT JOIN c ON c.label = l.label AND c.tok = vb.tok
    ),
    tt AS (SELECT label, sum(c) AS T FROM grid GROUP BY label),
    ll AS MATERIALIZED (
      SELECT g.label, g.token, g.c,
             floor(1000000 * ln((g.c + 1)::DOUBLE
                   / (tt.T + vn.V)))::BIGINT AS ll_e6
      FROM grid g JOIN tt ON tt.label = g.label CROSS JOIN vn
    )
"""


def _winnow_sel_sql(src: str) -> str:
    """CTE chain from a (doc_id, text) source to the selected winnowing
    fingerprint set ``sel(doc_id, pos, gh)`` — text._winnow_core's spec
    term for term (word-3-grams, window 4, rightmost-min ties)."""
    return f"""
            wt AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(
                              trim(lower(text)), '\\s+') END AS toks
              FROM {src}
            ),
            wu AS (SELECT doc_id, unnest(toks) AS tok,
                          generate_subscripts(toks, 1) AS pos FROM wt),
            wg AS (SELECT doc_id, pos,
                          tok || ' ' || lead(tok, 1) OVER w
                              || ' ' || lead(tok, 2) OVER w AS gram
                   FROM wu WINDOW w AS (PARTITION BY doc_id
                                        ORDER BY pos)),
            wh AS MATERIALIZED (
              SELECT doc_id, pos,
                     ('0x' || substr(md5(gram), 1, 15))::BIGINT AS gh
              FROM wg WHERE gram IS NOT NULL
            ),
            wm AS (SELECT doc_id, count(*) AS m FROM wh GROUP BY doc_id),
            wends AS (SELECT doc_id,
                             unnest(range(least(4, m), m + 1)) AS e
                      FROM wm),
            wwin AS (SELECT e.doc_id, e.e, h.pos, h.gh
                     FROM wends e JOIN wh h ON h.doc_id = e.doc_id
                      AND h.pos BETWEEN greatest(1, e.e - 3) AND e.e),
            sel AS (SELECT DISTINCT doc_id, pos, gh FROM (
                      SELECT doc_id, e, pos, gh,
                             row_number() OVER (PARTITION BY doc_id, e
                                 ORDER BY gh ASC, pos DESC) AS rn
                      FROM wwin) WHERE rn = 1)
    """


def oracle_sql() -> dict[str, str]:
    from raygraph.ops import text as T
    from raygraph.ops.text import STOPWORDS

    stop = {lg: _sql_strlist(ws) for lg, ws in STOPWORDS.items()}
    # golden KG formulas — mirror raygraph/synth.py exactly
    # i = 0..n-1 derived from the documents view itself (row_number over any
    # order yields exactly the set {0..n-1}); mirrors raygraph/synth.py
    kg_base = """
    WITH p AS (SELECT count(*)::BIGINT AS n FROM documents),
         mm AS (SELECT n, greatest(2, least(n // 10, 50000)) AS m FROM p),
         idx AS (SELECT row_number() OVER () - 1 AS i FROM documents),
         d0 AS (
           SELECT idx.i AS i, mm.m AS m,
                  CASE WHEN idx.i % 5 = 0 THEN 0
                       ELSE 1 + (idx.i * 7919) % mm.m END AS a,
                  1 + (idx.i * 104729 + 3) % mm.m AS b0
           FROM idx, mm
         ),
         e AS (
           SELECT i, a,
                  CASE WHEN b0 = a THEN 1 + (b0 % m) ELSE b0 END AS b
           FROM d0
         )
    """
    kg_edges_sql = kg_base + """
            SELECT DISTINCT 'entities/vertex_' || a AS _from,
                   'connected_to' AS pred,
                   'entities/vertex_' || b AS _to
            FROM e
            UNION
            SELECT DISTINCT 'entities/vertex_' || a, 'is_a', 'entities/node'
            FROM e WHERE i % 7 = 3
        """
    # deletion propagation: the edge formula over the docs that SURVIVE
    # the forget set (i % 5 == 1 deleted) — an edge remains iff some
    # surviving doc still asserts it
    kg_forget_sql = kg_base + """
            SELECT DISTINCT 'entities/vertex_' || a AS _from,
                   'connected_to' AS pred,
                   'entities/vertex_' || b AS _to
            FROM e WHERE i % 5 <> 1
            UNION
            SELECT DISTINCT 'entities/vertex_' || a, 'is_a',
                   'entities/node'
            FROM e WHERE i % 7 = 3 AND i % 5 <> 1
        """
    # the base snapshot of the delta-merge demo = edge formula over the
    # first half of the corpus rows (docs i < n//2)
    _half = "i < (SELECT n FROM p) // 2"
    kg_base_edges_sql = kg_base + f"""
            SELECT DISTINCT 'entities/vertex_' || a AS _from,
                   'connected_to' AS pred,
                   'entities/vertex_' || b AS _to
            FROM e WHERE {_half}
            UNION
            SELECT DISTINCT 'entities/vertex_' || a, 'is_a', 'entities/node'
            FROM e WHERE i % 7 = 3 AND ({_half})
        """

    bpe_pat_sql = __import__("raygraph.ops.text", fromlist=["BPE_PATTERN"]) \
        .BPE_PATTERN.replace("'", "''")

    def surf(fexpr: str, eexpr: str) -> str:
        # mirrors raygraph.synth._surface_series / _FORMS exactly
        return (f"(CASE ({fexpr}) % 4 WHEN 0 THEN 'vertex ' || {eexpr} "
                f"WHEN 1 THEN 'Vertex ' || {eexpr} "
                f"WHEN 2 THEN 'node ' || {eexpr} "
                f"ELSE 'v' || {eexpr} END)")

    render_sql = kg_base + f"""
            SELECT 'doc/' || i AS doc_id,
                   {surf('i', 'a')} || ' is connected to '
                       || {surf('i + 3', 'b')} || '.'
                   || ' <media/edge-' || i || '.png>'
                   || CASE WHEN i % 7 = 3
                           THEN ' ' || {surf('i', 'a')} || ' is a node.'
                           ELSE '' END AS rendered,
                   (CASE WHEN i % 7 = 3 THEN 3 ELSE 2 END)::BIGINT
                       AS n_spans
            FROM e
        """
    out = {
        "corpus_caption_pairs": kg_base + f"""
            SELECT 'doc/' || i AS doc_id,
                   'media/edge-' || i || '.png' AS media_ref,
                   'caption: ' || {surf('i + 1', 'a')} || ' links '
                       || {surf('i + 2', 'b')} AS caption,
                   {surf('i', 'a')} || ' is connected to '
                       || {surf('i + 3', 'b')} || '.' AS context
            FROM e
        """,
        "events_autocorr": """
            WITH h AS (
              SELECT event_type,
                     (epoch_us(ts) // (3600::BIGINT * 1000000)) * 3600
                         AS hour,
                     count(*)::BIGINT AS n
              FROM events GROUP BY event_type, hour
            ),
            p AS (
              SELECT event_type, n AS x,
                     lead(n) OVER (PARTITION BY event_type
                                   ORDER BY hour) AS y
              FROM h
            ),
            q AS (SELECT event_type, x::HUGEINT AS x, y::HUGEINT AS y
                  FROM p WHERE y IS NOT NULL),
            m AS (
              SELECT event_type, count(*)::HUGEINT AS n,
                     sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
                     sum(y * y) AS syy, sum(x * y) AS sxy
              FROM q GROUP BY event_type
            )
            SELECT event_type, n::BIGINT AS n_pairs,
                   floor((10000 * (n * sxy - sx * sy))::DOUBLE
                         / sqrt((n * sxx - sx * sx)::DOUBLE
                                * (n * syy - sy * sy)::DOUBLE))::BIGINT
                       AS corr_bp
            FROM m
            WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        """,
        "embedding_pair_hist": """
            WITH pr AS (
              SELECT floor(round(list_cosine_similarity(
                         a.embedding::DOUBLE[], b.embedding::DOUBLE[]),
                         4) * 10)::BIGINT AS bin
              FROM embeddings a JOIN embeddings b
                ON a.vec_id % 8 = b.vec_id % 8 AND b.vec_id > a.vec_id
            )
            SELECT bin, count(*)::BIGINT AS n FROM pr GROUP BY bin
        """,
        "corpus_render_interleaved": render_sql,
        "corpus_pack_interleaved": kg_base + f"""
            , costs AS (
              SELECT i,
                     len(regexp_split_to_array({surf('i', 'a')}
                         || ' is connected to ' || {surf('i + 3', 'b')}
                         || '.', '\\s+'))::BIGINT
                     + 64
                     + CASE WHEN i % 7 = 3
                            THEN len(regexp_split_to_array({surf('i', 'a')}
                                 || ' is a node.', '\\s+'))::BIGINT
                            ELSE 0 END AS cost
              FROM e)
            SELECT 'doc/' || i AS doc_id, cost,
                   CAST(coalesce(sum(cost) OVER (ORDER BY i
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) // 512 AS window_id
            FROM costs
        """,
        "kg_edges": kg_edges_sql,
        "kg_asof_base": kg_base_edges_sql,
        "kg_forget_edges": kg_forget_sql,
        "kg_degrees": f"""
            WITH edges AS ({kg_edges_sql}),
            o AS (SELECT _from AS _id, count(*)::BIGINT AS out_degree
                  FROM edges GROUP BY _from),
            i AS (SELECT _to AS _id, count(*)::BIGINT AS in_degree
                  FROM edges GROUP BY _to)
            SELECT coalesce(o._id, i._id) AS _id,
                   coalesce(out_degree, 0)::BIGINT AS out_degree,
                   coalesce(in_degree, 0)::BIGINT AS in_degree
            FROM o FULL OUTER JOIN i ON o._id = i._id
        """,
        "kg_triangles": f"""
            WITH edges AS ({kg_edges_sql}),
            und AS (SELECT DISTINCT least(_from, _to) AS u,
                           greatest(_from, _to) AS v
                    FROM edges WHERE _from <> _to)
            SELECT count(*)::BIGINT AS n_triangles
            FROM und e1
            JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
            JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v
        """,
        "kg_vertices": kg_base + """
            , keys AS (
              SELECT 'vertex_' || a AS k FROM e
              UNION SELECT 'vertex_' || b FROM e
              UNION SELECT 'node' FROM e WHERE i % 7 = 3
            )
            SELECT DISTINCT 'entities/' || k AS _id, k AS _key,
                   'entities' AS "@collection_name"
            FROM keys
        """,
        "kg_vertex_mentions": kg_base + """
            , m1 AS (
                SELECT a AS k,
                       2 + CASE WHEN i % 7 = 3 THEN 1 ELSE 0 END AS c
                FROM e
                UNION ALL SELECT b, 2 FROM e
            )
            SELECT 'vertex_' || k AS _key,
                   CAST(sum(c) AS BIGINT) AS mention_count
            FROM m1 GROUP BY k
            UNION ALL
            SELECT 'node', cnt FROM (
                SELECT CAST(count(*) AS BIGINT) AS cnt
                FROM e WHERE i % 7 = 3
            ) WHERE cnt > 0
        """,
        "kg_two_hop": f"""
            WITH edges AS ({kg_edges_sql}),
            pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)
            SELECT a.u AS a, count(DISTINCT b.v)::BIGINT AS n_two_hop
            FROM pr a JOIN pr b ON a.v = b.u
            GROUP BY a.u
        """,
        "kg_pagerank": _pagerank_sql(kg_edges_sql, iters=3),
        "kg_katz": _katz_sql(kg_edges_sql, iters=3, beta_den=5),
        "kg_coloring": _coloring_sql(kg_edges_sql, iters=3),
        "kg_rwr": _ppr_sql(kg_edges_sql, n_seeds=4, iters=3,
                           alpha_den=5),
        "kg_wl": _wl_sql(kg_edges_sql, iters=2),
        "kg_msf": _msf_sql(kg_edges_sql, iters=2, inner=3),
        "kg_node2vec": _node2vec_sql(kg_edges_sql, n_seeds=5, hops=3),
        "kg_cascade": _cascade_sql(kg_edges_sql, n_seeds=3, p_pct=40,
                                   rounds=3),
        # verb-frame family through the full pipeline: corpus row k
        # carries frame shape k % 3 over entity indices (k % m,
        # (k*7+1) % m); the edge table is the distinct (s, p, o) set
        "kg_frame_edges": """
            WITH p AS (SELECT count(*)::BIGINT AS n FROM documents),
                 mm AS (SELECT greatest(2, least(n // 10, 1000)) AS m
                        FROM p),
                 idx AS (SELECT row_number() OVER () - 1 AS i
                         FROM documents),
                 d AS (SELECT i, (i % mm.m) AS a,
                              ((i * 7 + 1) % mm.m) AS b
                       FROM idx, mm)
            SELECT DISTINCT 'entities/alpha_' || a AS _from,
                   'acquired' AS pred,
                   'entities/beta_' || b AS _to
            FROM d WHERE i % 3 = 0
            UNION
            SELECT DISTINCT 'entities/alpha_' || a, 'works_at',
                   'entities/beta_' || b
            FROM d WHERE i % 3 = 1
        """,
        # coref-lite fidelity: located_in edges exist only where BOTH
        # the pronoun span (i%3=1) AND its antecedent anchor (i%7<>0)
        # exist — a resolver that links unresolved pronouns, or one
        # that misses the recency antecedent, diverges here
        "kg_coref_edges": """
            WITH p AS (SELECT count(*)::BIGINT AS n FROM documents),
                 mm AS (SELECT greatest(2, least(n // 10, 1000)) AS m
                        FROM p),
                 idx AS (SELECT row_number() OVER () - 1 AS i
                         FROM documents),
                 d AS (SELECT i, (i % mm.m) AS a,
                              ((i * 7 + 3) % mm.m) AS c, mm.m AS m
                       FROM idx, mm)
            SELECT DISTINCT 'entities/vertex_' || a AS _from,
                   'connected_to' AS pred,
                   'entities/vertex_' || ((a + 1) % m) AS _to
            FROM d WHERE i % 7 <> 0
            UNION
            SELECT DISTINCT 'entities/vertex_' || a, 'located_in',
                   'entities/vertex_' || c
            FROM d WHERE i % 3 = 1 AND i % 7 <> 0
        """,
        # verb-frame extraction fidelity: the oracle replays the
        # id-derived sentence shapes directly — the Ray side must
        # recover them through tokenization + frame rules exactly
        "kg_frame_triples": """
            SELECT doc_id::VARCHAR AS doc_id,
                   'acme corp ' || doc_id AS subj_surface,
                   'acquired' AS pred,
                   'initech ' || (doc_id + 1) AS obj_surface
            FROM documents WHERE doc_id % 5 = 0
            UNION ALL
            SELECT doc_id::VARCHAR, 'alice ' || doc_id, 'works_at',
                   'initech ' || (2 * doc_id)
            FROM documents WHERE doc_id % 5 = 1
            UNION ALL
            SELECT doc_id::VARCHAR, 'bob ' || doc_id, 'manages',
                   'carol team ' || (doc_id + 7)
            FROM documents WHERE doc_id % 5 = 2
            UNION ALL
            SELECT doc_id::VARCHAR, 'vertex ' || doc_id, 'connected_to',
                   'vertex ' || (doc_id + 1)
            FROM documents WHERE doc_id % 5 = 3
        """,
        # Gavril 2-approx vertex cover = matched endpoints
        "kg_vertex_cover": (
            "SELECT DISTINCT vertex FROM ("
            "SELECT u AS vertex FROM ("
            + _matching_sql(kg_edges_sql, iters=2)
            + ") UNION ALL SELECT v FROM ("
            + _matching_sql(kg_edges_sql, iters=2) + "))"),
        # skip-gram pairs: the walk oracle self-joined on seed with
        # rank gap 1..2, symmetrized, pair-counted
        "kg_skipgram_pairs": (
            "SELECT center, context, count(*)::BIGINT AS n FROM ("
            "SELECT a.vertex AS center, b.vertex AS context "
            "FROM (" + _node2vec_sql(kg_edges_sql, n_seeds=5, hops=3)
            + ") a JOIN ("
            + _node2vec_sql(kg_edges_sql, n_seeds=5, hops=3)
            + ") b ON a.seed = b.seed "
            "AND b.step - a.step BETWEEN 1 AND 2 "
            "UNION ALL "
            "SELECT b.vertex, a.vertex "
            "FROM (" + _node2vec_sql(kg_edges_sql, n_seeds=5, hops=3)
            + ") a JOIN ("
            + _node2vec_sql(kg_edges_sql, n_seeds=5, hops=3)
            + ") b ON a.seed = b.seed "
            "AND b.step - a.step BETWEEN 1 AND 2"
            ") GROUP BY center, context"),
        "kg_ppr": _pagerank_sql(kg_edges_sql, iters=3,
                                personalize=True),
        "kg_reciprocity": f"""
            WITH edges AS ({kg_edges_sql}),
            pr AS (SELECT DISTINCT _from, _to FROM edges
                   WHERE _from <> _to),
            rc AS (SELECT a._from, a._to FROM pr a
                   JOIN pr b ON a._from = b._to AND a._to = b._from)
            SELECT (SELECT count(*) FROM pr)::BIGINT AS n_arcs,
                   (SELECT count(*) FROM rc)::BIGINT AS n_recip,
                   ((10000 * (SELECT count(*) FROM rc))
                    // greatest(1, (SELECT count(*) FROM pr)))::BIGINT
                       AS recip_bp
        """,
        "kg_pred_cooccur": f"""
            WITH edges AS ({kg_edges_sql}),
            sp AS (SELECT DISTINCT _from, pred FROM edges)
            SELECT a.pred AS pred_a, b.pred AS pred_b,
                   count(*)::BIGINT AS n_subjects
            FROM sp a JOIN sp b
              ON b._from = a._from AND b.pred > a.pred
            GROUP BY a.pred, b.pred
        """,
        "kg_pred_stats": f"""
            WITH edges AS ({kg_edges_sql})
            SELECT pred, count(*)::BIGINT AS n_edges,
                   count(DISTINCT _from)::BIGINT AS n_subjects
            FROM edges GROUP BY pred
        """,
        "kg_components": _components_sql(kg_edges_sql, iters=5),
        "kg_bfs": _bfs_sql(kg_edges_sql, iters=3),
        "kg_sssp": _bfs_sql(kg_edges_sql, iters=3,
                            weight_expr="length(pred)"),
        "kg_closeness": _closeness_sql(kg_edges_sql, n_seeds=8, iters=3),
        "kg_eccentricity": _ecc_sql(kg_edges_sql, n_seeds=8, iters=3),
        "kg_communities": _lpa_sql(kg_edges_sql, iters=2),
        "kg_modularity": _modularity_sql(kg_edges_sql, iters=2),
        # conductance off the modularity table: same spec + phi terms
        "kg_conductance": f"""
            WITH mt AS ({_modularity_sql(kg_edges_sql, iters=2)}),
            mm AS (SELECT (sum(d_sum) // 2)::BIGINT AS m FROM mt)
            SELECT community, (d_sum - 2 * e_in)::BIGINT AS cut,
                   ((1000000::HUGEINT * (d_sum - 2 * e_in))
                    // greatest(least(d_sum, 2 * mm.m - d_sum), 1))
                     ::BIGINT AS phi_e6
            FROM mt CROSS JOIN mm
        """,
        "kg_mis": _mis_sql(kg_edges_sql, iters=2),
        "kg_matching": _matching_sql(kg_edges_sql, iters=2),
        "kg_khop_sample": _khop_sql(kg_edges_sql, n_seeds=5, fanout=3,
                                    hops=2),
        "kg_betweenness": _betweenness_sql(kg_edges_sql, n_seeds=3,
                                           hops=3),
        "kg_ego": f"""
            WITH reach AS ({_bfs_sql(kg_edges_sql, iters=2)}),
            edges AS ({kg_edges_sql}),
            pr AS (SELECT DISTINCT _from AS u, _to AS v FROM edges)
            SELECT u AS _from, v AS _to FROM pr
            WHERE u IN (SELECT vertex FROM reach)
              AND v IN (SELECT vertex FROM reach)
        """,
        "kg_rpq": f"""
            WITH edges AS ({kg_edges_sql}),
            e1 AS (SELECT DISTINCT _from AS u, _to AS v FROM edges
                   WHERE pred = 'connected_to'),
            e2 AS (SELECT DISTINCT _from AS u, _to AS v FROM edges
                   WHERE pred = 'is_a')
            SELECT a.u AS src, b.v AS dst, count(*)::BIGINT AS n_paths
            FROM e1 a JOIN e2 b ON a.v = b.u GROUP BY a.u, b.v
        """,
        "kg_kcore": _kcore_sql(kg_edges_sql, k=2, iters=3),
        "kg_hits": _hits_sql(kg_edges_sql, iters=2),
        "kg_clustering": f"""
            WITH edges AS ({kg_edges_sql}),
            und AS (SELECT DISTINCT least(_from, _to) AS u,
                           greatest(_from, _to) AS v
                    FROM edges WHERE _from <> _to),
            dg AS (SELECT x AS vtx, count(*)::BIGINT AS deg FROM
                   (SELECT u AS x FROM und UNION ALL SELECT v FROM und)
                   GROUP BY x),
            tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                    FROM und e1 JOIN und e2 ON e2.u = e1.v
                    JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
            tv AS (SELECT x AS vtx, count(*)::BIGINT AS t FROM
                   (SELECT a AS x FROM tri UNION ALL SELECT b FROM tri
                    UNION ALL SELECT c FROM tri) GROUP BY x)
            SELECT dg.vtx AS vertex, dg.deg,
                   coalesce(tv.t, 0)::BIGINT AS n_tri,
                   (10000 * 2 * coalesce(tv.t, 0))
                       // (dg.deg * (dg.deg - 1)) AS cc_bp
            FROM dg LEFT JOIN tv ON dg.vtx = tv.vtx
            WHERE dg.deg >= 2
        """,
        "embedding_pca": _pca_sql(iters=3),
        "text_freq_spectrum": _TOKS_CTE + """
            , tok AS (SELECT unnest(toks) AS token FROM t)
            , tc AS (SELECT token, count(*)::BIGINT AS k FROM tok
                     GROUP BY token)
            SELECT k, count(*)::BIGINT AS n_tokens FROM tc GROUP BY k
        """,
        "docs_lang_diversity": """
            WITH c AS (SELECT source, lang, count(*)::BIGINT AS n
                       FROM documents GROUP BY source, lang)
            SELECT source, sum(n)::BIGINT AS n_docs,
                   10000 - (10000 * sum(n * n)::BIGINT)
                       // (sum(n)::BIGINT * sum(n)::BIGINT) AS gini_bp
            FROM c GROUP BY source
        """,
        "events_resample_1h": """
            WITH ev AS (
              SELECT user_id, ts,
                     CAST(round(value * 10000, 0) AS BIGINT) AS v,
                     row_number() OVER (PARTITION BY user_id, ts
                                        ORDER BY event_id DESC) AS rn
              FROM events),
            u AS (SELECT user_id, ts, v FROM ev WHERE rn = 1),
            span AS (SELECT user_id,
                            (epoch_us(min(ts)) + 3599999999)
                                // 3600000000 AS h0,
                            epoch_us(max(ts)) // 3600000000 AS h1
                     FROM events GROUP BY user_id),
            grid AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS grid_h
                     FROM span WHERE h1 >= h0),
            pts AS (SELECT user_id, grid_h,
                           make_timestamp(grid_h * 3600000000) AS gts
                    FROM grid)
            SELECT p.user_id, p.grid_h, u.v AS value_e4
            FROM pts p ASOF JOIN u
              ON p.user_id = u.user_id AND u.ts <= p.gts
        """,
        "events_value_outliers": """
            WITH ev AS (SELECT event_id, event_type,
                               CAST(round(value * 10000, 0) AS BIGINT)
                                   AS value_e4
                        FROM events),
            q AS (SELECT event_type,
                         quantile_disc(value_e4, 0.25) AS p25,
                         quantile_disc(value_e4, 0.75) AS p75
                  FROM ev GROUP BY event_type),
            b AS (SELECT event_type,
                         p25 - (3 * (p75 - p25)) // 2 AS lo,
                         p75 + (3 * (p75 - p25)) // 2 AS hi
                  FROM q)
            SELECT e.event_id, e.event_type, e.value_e4
            FROM ev e JOIN b ON e.event_type = b.event_type
            WHERE e.value_e4 < b.lo OR e.value_e4 > b.hi
        """,
        "events_user_deciles": """
            WITH u AS (
              SELECT user_id,
                     sum(CAST(round(value * 10000, 0) AS BIGINT))::BIGINT
                         AS t
              FROM events GROUP BY user_id
            ),
            b AS (SELECT
              quantile_disc(t, 0.1) AS b1, quantile_disc(t, 0.2) AS b2,
              quantile_disc(t, 0.3) AS b3, quantile_disc(t, 0.4) AS b4,
              quantile_disc(t, 0.5) AS b5, quantile_disc(t, 0.6) AS b6,
              quantile_disc(t, 0.7) AS b7, quantile_disc(t, 0.8) AS b8,
              quantile_disc(t, 0.9) AS b9 FROM u)
            SELECT ((CASE WHEN t > b1 THEN 1 ELSE 0 END)
                  + (CASE WHEN t > b2 THEN 1 ELSE 0 END)
                  + (CASE WHEN t > b3 THEN 1 ELSE 0 END)
                  + (CASE WHEN t > b4 THEN 1 ELSE 0 END)
                  + (CASE WHEN t > b5 THEN 1 ELSE 0 END)
                  + (CASE WHEN t > b6 THEN 1 ELSE 0 END)
                  + (CASE WHEN t > b7 THEN 1 ELSE 0 END)
                  + (CASE WHEN t > b8 THEN 1 ELSE 0 END)
                  + (CASE WHEN t > b9 THEN 1 ELSE 0 END))::BIGINT
                       AS decile,
                   sum(t)::BIGINT AS sum_value_e4,
                   count(*)::BIGINT AS n_users
            FROM u, b GROUP BY 1
        """,
        "events_value_mad": """
            WITH ev AS (SELECT event_type,
                               CAST(round(value * 10000, 0) AS BIGINT)
                                   AS v
                        FROM events),
            med AS (SELECT event_type,
                           quantile_disc(v, 0.5)::BIGINT AS m
                    FROM ev GROUP BY event_type),
            d AS (SELECT e.event_type, m.m, abs(e.v - m.m) AS a
                  FROM ev e JOIN med m ON e.event_type = m.event_type)
            SELECT event_type, min(m)::BIGINT AS med_e4,
                   quantile_disc(a, 0.5)::BIGINT AS mad_e4
            FROM d GROUP BY event_type
        """,
        "events_type_overlap": """
            WITH du AS (SELECT DISTINCT event_type, user_id FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*)::BIGINT AS n_users
            FROM du a JOIN du b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        """,
        "events_rolling_1h": """
            SELECT event_id,
                   CAST(count(*) OVER w AS BIGINT) AS n_win,
                   CAST(sum(CAST(round(value * 10000, 0) AS BIGINT))
                        OVER w AS BIGINT) AS sum_win_e4
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                         AND CURRENT ROW)
        """,
        "dedup_edit_pairs": f"""
            WITH aug AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + {_OFFSET},
                     CASE WHEN len(text) > 0
                          THEN substr(text, 1, len(text) - 1) || '~'
                          ELSE '~' END
              FROM documents
            ),
            b AS (SELECT doc_id,
                         substr(text, 1, 16) AS pk,
                         right(text, 64) AS tail
                  FROM aug)
            SELECT x.doc_id AS id_a, y.doc_id AS id_b,
                   levenshtein(x.tail, y.tail)::BIGINT AS dist
            FROM b x JOIN b y ON x.pk = y.pk AND x.doc_id < y.doc_id
            WHERE levenshtein(x.tail, y.tail) <= 2
        """,
        "docs_search_all": _TOKS_CTE + """
            , pairs AS (SELECT DISTINCT doc_id, unnest(toks) AS token
                        FROM t)
            , dfreq AS (SELECT token, count(*) AS n FROM pairs
                        GROUP BY token)
            , q AS (SELECT token FROM dfreq ORDER BY n DESC, token
                    LIMIT 2)
            SELECT doc_id FROM pairs
            WHERE token IN (SELECT token FROM q)
            GROUP BY doc_id HAVING count(*) = 2
        """,
        "orders_zorder_tiles": f"""
            WITH pts AS (
              SELECT (o_custkey & 65535) AS x,
                     ((epoch_us(o_orderdate) // 86400000000) & 65535) AS y
              FROM orders
            ),
            z AS (SELECT ({_zorder_sql_expr('x', 'y')}) AS zkey FROM pts)
            SELECT zkey // 65536 AS tile, count(*)::BIGINT AS n_orders
            FROM z GROUP BY tile
        """,
        "docs_inverted_index": _TOKS_CTE + """
            , pairs AS (SELECT DISTINCT doc_id, unnest(toks) AS token
                        FROM t)
            , dfreq AS (SELECT token, count(*)::BIGINT AS n_docs
                        FROM pairs GROUP BY token)
            SELECT p.token, d.n_docs,
                   string_agg(p.doc_id::VARCHAR, ','
                              ORDER BY p.doc_id) AS postings
            FROM pairs p JOIN dfreq d ON p.token = d.token
            WHERE d.n_docs BETWEEN 2 AND 400
            GROUP BY p.token, d.n_docs
        """,
        "events_approx_users": _hll_sql("events", "event_type", "user_id"),
        # CART stump replayed: per-distinct-x prefix sums, the exact
        # S(t) ranking key as one HUGEINT floor divide, argmax ties ->
        # smallest threshold
        "docs_stump": """
            WITH d AS (SELECT length(text) AS x,
                              CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
                       FROM documents),
            cnt AS (SELECT x, sum(y)::HUGEINT AS c1,
                           count(*)::HUGEINT AS n
                    FROM d GROUP BY x),
            tot AS (SELECT sum(c1) AS t1, sum(n) AS tn FROM cnt),
            p AS (SELECT x, sum(c1) OVER (ORDER BY x) AS l1,
                         sum(n) OVER (ORDER BY x) AS ln
                  FROM cnt),
            s AS (SELECT p.x AS threshold, ln AS nl, (tn - ln) AS nr,
                         l1, (t1 - l1) AS r1
                  FROM p CROSS JOIN tot WHERE ln < tn),
            k AS (SELECT threshold, nl, nr,
                         ((1000000000000::HUGEINT *
                           ((l1 * l1 + (nl - l1) * (nl - l1)) * nr
                            + (r1 * r1 + (nr - r1) * (nr - r1)) * nl))
                          // (nl * nr)) AS s_e12
                  FROM s)
            SELECT threshold::BIGINT AS threshold, s_e12::BIGINT AS s_e12,
                   nl::BIGINT AS nl, nr::BIGINT AS nr
            FROM k ORDER BY s_e12 DESC, threshold ASC LIMIT 1
        """,
        # smoothed target encoding: one exact HUGEINT floor-divide over
        # the e4 value sums (all values positive ⇒ // == floor)
        "events_target_encode": """
            WITH c AS (SELECT event_type,
                              CAST(round(value * 10000, 0) AS BIGINT) AS v
                       FROM events),
            g AS (SELECT event_type, sum(v)::HUGEINT AS s,
                         count(*)::HUGEINT AS n
                  FROM c GROUP BY event_type),
            t AS (SELECT sum(s)::HUGEINT AS gs, sum(n)::HUGEINT AS gn
                  FROM g)
            SELECT g.event_type, g.n::BIGINT AS n,
                   ((g.s * t.gn + 10 * t.gs)
                    // ((g.n + 10) * t.gn))::BIGINT AS enc_e4
            FROM g CROSS JOIN t
        """,
        # deterministic k-fold: the md5-int bridge mod 5
        # leakage-free fold = md5(text)-int60 % 5 over the doubled
        # corpus — duplicates agree by construction
        "docs_dedup_safe_split": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + {_OFFSET}, text FROM documents
            )
            SELECT doc_id,
                   (('0x' || substr(md5(coalesce(text, '')), 1, 15))
                       ::BIGINT % 5) AS fold
            FROM corpus
        """,
        "docs_kfold": """
            SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                       ::BIGINT % 5 AS fold,
                   sum(length(text))::BIGINT AS sum_chars,
                   count(*)::BIGINT AS n_docs
            FROM documents GROUP BY fold
        """,
        # RRF fusion of the exact-dot and SQ8 legs: per-leg rank lists
        # (same chains as ann_quantized_eval), per-term floored
        # 1e6/(60+rank) contributions, exact integer sums, top-10 by
        # (rrf DESC, vec_id ASC)
        "ann_rrf_top10": """
            WITH q AS MATERIALIZED (
              SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
              FROM embeddings WHERE vec_id < 8
            ),
            s AS (SELECT q.query_id, e.vec_id,
                         round(list_inner_product(
                             e.embedding::DOUBLE[], q.qe), 4) AS dot
                  FROM embeddings e CROSS JOIN q),
            tr AS (SELECT query_id, vec_id, rn FROM (
                     SELECT *, row_number() OVER (PARTITION BY query_id
                         ORDER BY dot DESC, vec_id) AS rn FROM s)
                   WHERE rn <= 10),
            u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
                         unnest(embedding)::DOUBLE AS x
                  FROM embeddings),
            b AS (SELECT dim, min(x) AS mn, max(x) AS mx
                  FROM u GROUP BY dim),
            codes AS MATERIALIZED (
              SELECT vec_id, dim,
                     CASE WHEN mx = mn THEN 0
                          ELSE least(greatest(
                              floor(((x - mn) * 255.0) / (mx - mn)),
                              0), 255)::BIGINT
                     END AS code
              FROM u JOIN b USING (dim)
            ),
            recon AS MATERIALIZED (
              SELECT c.vec_id, c.dim,
                     b.mn + c.code * ((b.mx - b.mn) / 255.0) AS r
              FROM codes c JOIN b USING (dim)
            ),
            qrec AS (SELECT t.query_id, r.dim, r.r
                     FROM (SELECT query_id FROM q) t
                     JOIN recon r ON r.vec_id = t.query_id),
            dots AS (SELECT qrec.query_id, r.vec_id,
                            round(sum(r.r * qrec.r), 4) AS qdot
                     FROM qrec JOIN recon r ON r.dim = qrec.dim
                     GROUP BY qrec.query_id, r.vec_id),
            cd AS (SELECT query_id, vec_id, rn FROM (
                     SELECT *, row_number() OVER (PARTITION BY query_id
                         ORDER BY qdot DESC, vec_id) AS rn FROM dots)
                   WHERE rn <= 10),
            legs AS (
              SELECT query_id, vec_id,
                     floor(1000000 / (60 + rn)) AS p FROM tr
              UNION ALL
              SELECT query_id, vec_id,
                     floor(1000000 / (60 + rn)) AS p FROM cd
            ),
            f AS (SELECT query_id, vec_id, sum(p)::BIGINT AS rrf_e6
                  FROM legs GROUP BY query_id, vec_id)
            SELECT query_id, vec_id, rrf_e6 FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY rrf_e6 DESC, vec_id) AS rk FROM f)
            WHERE rk <= 10
        """,
        # KMV bottom-k estimator recomputed term for term: same md5-60bit
        # value hash, row_number over hash order picks h_(k), HUGEINT
        # floor divide mirrors Python // on positive ints
        "events_kmv_users": """
            WITH h AS (
              SELECT DISTINCT event_type,
                     ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                       ::BIGINT AS h
              FROM events
            ),
            r AS (
              SELECT event_type, h,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY h) AS rn,
                     count(*) OVER (PARTITION BY event_type) AS nd
              FROM h
            )
            SELECT event_type,
                   (CASE WHEN max(nd) < 32 THEN max(nd)
                         ELSE (31::HUGEINT * (1::HUGEINT << 60))
                              // max(CASE WHEN rn = 32 THEN h END)
                    END)::BIGINT AS approx_n
            FROM r GROUP BY event_type
        """,
        "docs_rollup": """
            SELECT lang, source, count(*)::BIGINT AS n_docs
            FROM documents GROUP BY ROLLUP(lang, source)
        """,
        "docs_cube": """
            SELECT lang, source, count(*)::BIGINT AS n_docs
            FROM documents GROUP BY CUBE(lang, source)
        """,
        "media_dimensions": """
            SELECT doc_id, 'png' AS fmt,
                   CAST(1 + length(text) % 640 AS INTEGER) AS width,
                   CAST(1 + doc_id % 480 AS INTEGER) AS height
            FROM documents
        """,
        "media_audio": """
            WITH b AS (
              SELECT doc_id,
                     CASE doc_id % 3 WHEN 0 THEN 8000
                                     WHEN 1 THEN 16000
                                     ELSE 44100 END AS sample_rate,
                     1 + doc_id % 2 AS n_channels,
                     strlen(text) AS n_bytes
              FROM documents
            ), f AS (
              -- block align = channels × 2 bytes (16-bit PCM); payload
              -- is zero-padded up to a whole frame
              SELECT *, (n_bytes + n_channels * 2 - 1) // (n_channels * 2)
                         AS n_frames
              FROM b
            )
            SELECT doc_id, CAST(sample_rate AS BIGINT) AS sample_rate,
                   CAST(n_channels AS BIGINT) AS n_channels,
                   16::BIGINT AS bits_per_sample,
                   CAST(n_frames AS BIGINT) AS n_frames,
                   CAST(n_frames * 1000 // sample_rate AS BIGINT)
                       AS duration_ms
            FROM f
        """,
        "text_cms_counts": _TOKS_CTE + """
            , u AS (SELECT unnest(toks) AS token FROM t),
            exact AS (SELECT token, count(*)::BIGINT AS exact_n
                      FROM u GROUP BY token),
            top AS (SELECT * FROM exact
                    ORDER BY exact_n DESC, token ASC LIMIT 20),
            ds AS (SELECT unnest([0, 1, 2]) AS d),
            cells AS (
              SELECT ds.d,
                     ('0x' || substr(md5(CAST(ds.d AS VARCHAR) || ':'
                                         || e.token), 1, 15))::BIGINT
                       % 512 AS bucket,
                     CAST(sum(e.exact_n) AS BIGINT) AS cnt
              FROM exact e CROSS JOIN ds
              GROUP BY 1, 2
            )
            SELECT t.token, t.exact_n, CAST(min(c.cnt) AS BIGINT) AS cms_n
            FROM top t CROSS JOIN ds dd
            JOIN cells c ON c.d = dd.d
              AND c.bucket = ('0x' || substr(md5(CAST(dd.d AS VARCHAR)
                                                 || ':' || t.token),
                                             1, 15))::BIGINT % 512
            GROUP BY t.token, t.exact_n
        """,
        # upsert == anti-join base ∪ updates, replayed at query time
        "docs_upsert": f"""
            WITH up AS (
              SELECT doc_id, 'updated ' || doc_id AS text, lang,
                     source, (n_chars + 1000)::BIGINT AS n_chars
              FROM documents WHERE doc_id % 9 = 0
              UNION ALL
              SELECT doc_id + {_OFFSET},
                     'inserted ' || (doc_id + {_OFFSET}), lang,
                     source, n_chars
              FROM documents WHERE doc_id % 13 = 0
            )
            SELECT doc_id, text, lang, source, n_chars
            FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM up)
            UNION ALL
            SELECT * FROM up
        """,
        # STL-lite: dow mean (trunc-div) + residual on exact cents
        "orders_seasonal_decomp": """
            WITH d AS (
              SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                     sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                       ::BIGINT AS rev_c
              FROM orders GROUP BY 1
            ),
            w AS (SELECT day, rev_c, ((day + 4) % 7)::BIGINT AS dow
                  FROM d),
            m AS (SELECT dow, (sum(rev_c) // count(*))::BIGINT AS mu
                  FROM w GROUP BY dow)
            SELECT w.day, w.rev_c, m.mu AS dow_mean_c,
                   (w.rev_c - m.mu)::BIGINT AS residual_c
            FROM w JOIN m USING (dow)
        """,
        # Kaplan-Meier: window prefix risk sets, e6 ln terms cumulated
        # in duration order
        "events_kaplan_meier": """
            WITH d AS (SELECT user_id,
                              epoch_us(ts) // 3600000000 AS hr
                       FROM events),
            u AS (SELECT user_id, min(hr) AS fd, max(hr) AS ld
                  FROM d GROUP BY user_id),
            g AS (SELECT max(hr)::BIGINT AS mx FROM d),
            uu AS (SELECT (ld - fd)::BIGINT AS dur,
                          CASE WHEN (g.mx - ld) < 24 THEN 1 ELSE 0 END
                              AS cen
                   FROM u CROSS JOIN g),
            sp AS (SELECT dur, sum(1 - cen)::BIGINT AS d_t,
                          sum(cen)::BIGINT AS c_t
                   FROM uu GROUP BY dur),
            w AS (SELECT dur, d_t, c_t,
                         ((SELECT count(*) FROM uu)
                          - coalesce(sum(d_t + c_t) OVER (
                              ORDER BY dur ROWS BETWEEN UNBOUNDED
                              PRECEDING AND 1 PRECEDING), 0))::BIGINT
                             AS n_risk
                  FROM sp),
            t AS (SELECT dur, d_t, c_t, n_risk,
                         CASE WHEN n_risk > d_t
                              THEN floor(1000000 * ln(
                                  (n_risk - d_t)::DOUBLE / n_risk))
                              ELSE 0 END::BIGINT AS term
                  FROM w)
            SELECT dur, n_risk, d_t, c_t,
                   sum(term) OVER (ORDER BY dur)::BIGINT
                       AS ln_surv_e6
            FROM t
        """,
        # association rules on per-user type baskets: exact integer
        # confidence/lift cross-multiplies
        "events_assoc_rules": """
            WITH ut AS (SELECT DISTINCT user_id, event_type
                        FROM events),
            n_t AS (SELECT event_type, count(*)::BIGINT AS n
                    FROM ut GROUP BY event_type),
            nu AS (SELECT count(DISTINCT user_id)::BIGINT AS n
                   FROM ut),
            co AS (SELECT a.event_type AS type_a,
                          b.event_type AS type_b,
                          count(*)::BIGINT AS n_both
                   FROM ut a JOIN ut b ON a.user_id = b.user_id
                   WHERE a.event_type <> b.event_type
                   GROUP BY 1, 2)
            SELECT co.type_a, co.type_b, co.n_both,
                   (10000 * co.n_both // na.n)::BIGINT AS conf_bp,
                   (10000 * co.n_both * nu.n // (na.n * nb.n))
                     ::BIGINT AS lift_e4
            FROM co
            JOIN n_t na ON na.event_type = co.type_a
            JOIN n_t nb ON nb.event_type = co.type_b
            CROSS JOIN nu
        """,
        # PSI drift: 10 fixed bands, add-one smoothing, e6 floor terms
        "docs_psi_drift": """
            WITH d AS (
              SELECT (substr(source, 4)::BIGINT % 2)::BIGINT AS grp,
                     least(n_chars // 400, 9)::BIGINT AS bin
              FROM documents
            ),
            c AS (SELECT grp, bin, count(*)::BIGINT AS n
                  FROM d GROUP BY grp, bin),
            bins AS (SELECT unnest(range(0, 10))::BIGINT AS bin),
            t AS (SELECT
                    (SELECT coalesce(sum(n), 0) FROM c WHERE grp = 0)
                      ::BIGINT + 10 AS n1,
                    (SELECT coalesce(sum(n), 0) FROM c WHERE grp = 1)
                      ::BIGINT + 10 AS n2),
            w AS (
              SELECT b.bin,
                     coalesce((SELECT n FROM c
                               WHERE grp = 0 AND c.bin = b.bin), 0)
                       ::BIGINT + 1 AS a1,
                     coalesce((SELECT n FROM c
                               WHERE grp = 1 AND c.bin = b.bin), 0)
                       ::BIGINT + 1 AS b1
              FROM bins b),
            terms AS (
              SELECT w.bin, w.a1 - 1 AS n_even, w.b1 - 1 AS n_odd,
                     floor(1000000
                           * (w.a1::DOUBLE / t.n1
                              - w.b1::DOUBLE / t.n2)
                           * ln((w.a1 * t.n2)::DOUBLE
                                / (w.b1 * t.n1)))::BIGINT AS term_e6
              FROM w CROSS JOIN t)
            SELECT bin, n_even, n_odd, term_e6,
                   (SELECT sum(term_e6) FROM terms)::BIGINT AS psi_e6
            FROM terms
        """,
        # Cramér's V: full cross-product chi2 (absent cells included),
        # HUGEINT terms, identical double sqrt
        "docs_cramers_v": """
            WITH c AS (SELECT lang, source, count(*)::BIGINT AS n
                       FROM documents GROUP BY lang, source),
            l AS (SELECT lang, sum(n)::BIGINT AS a FROM c
                  GROUP BY lang),
            s AS (SELECT source, sum(n)::BIGINT AS b FROM c
                  GROUP BY source),
            tot AS (SELECT sum(n)::BIGINT AS nd FROM c),
            x AS (SELECT l.lang, s.source, l.a, s.b,
                         coalesce(c.n, 0)::BIGINT AS o
                  FROM l CROSS JOIN s
                  LEFT JOIN c ON c.lang = l.lang
                             AND c.source = s.source),
            chi AS (SELECT sum((1000000::HUGEINT
                                * (o * tot.nd - a::HUGEINT * b)
                                * (o * tot.nd - a::HUGEINT * b))
                               // (tot.nd::HUGEINT * a * b))::BIGINT
                           AS chi2_e6
                    FROM x CROSS JOIN tot),
            kk AS (SELECT least((SELECT count(*) FROM l) - 1,
                                (SELECT count(*) FROM s) - 1)::BIGINT
                           AS k)
            SELECT tot.nd AS n_docs, chi.chi2_e6,
                   CASE WHEN kk.k > 0 THEN
                     floor(1000000 * sqrt(chi.chi2_e6::DOUBLE
                           / (1000000::HUGEINT * tot.nd
                              * kk.k)::DOUBLE))
                   ELSE 0 END::BIGINT AS v_e6
            FROM chi CROSS JOIN tot CROSS JOIN kk
        """,
        # KS two-sample: window CDFs, cross-multiplied integer max
        "docs_ks_test": """
            WITH v AS (SELECT lang, n_chars AS x FROM documents
                       WHERE lang IN ('en', 'de')),
            s AS (SELECT x,
                         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                             ::BIGINT AS a,
                         sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)
                             ::BIGINT AS b
                  FROM v GROUP BY x),
            t AS (SELECT sum(a)::BIGINT AS n1, sum(b)::BIGINT AS n2
                  FROM s),
            c AS (SELECT x, sum(a) OVER (ORDER BY x)::HUGEINT AS ca,
                         sum(b) OVER (ORDER BY x)::HUGEINT AS cb
                  FROM s)
            SELECT t.n1, t.n2,
                   max(abs(ca * t.n2 - cb * t.n1))::BIGINT AS d_num,
                   (1000000 * max(abs(ca * t.n2 - cb * t.n1))
                    // (t.n1::HUGEINT * t.n2))::BIGINT AS d_e6
            FROM c CROSS JOIN t GROUP BY t.n1, t.n2
        """,
        # MI between lang and source: per-cell e6 ln terms, exact sum
        "docs_lang_source_mi": """
            WITH c AS (SELECT lang, source, count(*)::BIGINT AS n
                       FROM documents GROUP BY lang, source),
            l AS (SELECT lang, sum(n)::BIGINT AS nl FROM c
                  GROUP BY lang),
            s AS (SELECT source, sum(n)::BIGINT AS ns FROM c
                  GROUP BY source),
            tot AS (SELECT sum(n)::BIGINT AS nd FROM c),
            t AS (SELECT c.n,
                         floor((1000000 * c.n)
                               * ln((c.n::HUGEINT * tot.nd)::DOUBLE
                                    / (l.nl::HUGEINT * s.ns)::DOUBLE))
                             ::BIGINT AS t
                  FROM c JOIN l USING (lang)
                  JOIN s USING (source)
                  CROSS JOIN tot)
            SELECT count(*)::BIGINT AS n_cells,
                   (SELECT nd FROM tot) AS n_docs,
                   sum(t)::BIGINT AS mi_sum_e6
            FROM t
        """,
        # dow uniformity chi2: exact HUGEINT terms, same epoch-day
        # formula as the Ray side
        "orders_dow_chi2": """
            WITH c AS (
              SELECT (((epoch_us(o_orderdate) // 86400000000) + 4)
                      % 7)::BIGINT AS dow,
                     count(*)::BIGINT AS n
              FROM orders GROUP BY 1
            ),
            tot AS (SELECT sum(n)::BIGINT AS nn FROM c),
            chi AS (SELECT sum((1000000::HUGEINT * (7*n - tot.nn)
                                * (7*n - tot.nn)) // (7 * tot.nn))
                           ::BIGINT AS chi2
                    FROM c, tot)
            SELECT c.dow, c.n, chi.chi2 AS chi2_sum_e6 FROM c, chi
        """,
        # robust MAD outliers: quantile_disc median/MAD on e4 ints,
        # integer cross-multiplied 3*1.4826 threshold
        "events_mad_outliers": """
            WITH v AS (
              SELECT event_type,
                     CAST(round(value * 10000, 0) AS BIGINT) AS v
              FROM events
            ),
            m AS (SELECT event_type,
                         quantile_disc(v, 0.5)::BIGINT AS med
                  FROM v GROUP BY event_type),
            d AS (SELECT v.event_type, v.v, m.med,
                         abs(v.v - m.med)::BIGINT AS dev
                  FROM v JOIN m USING (event_type)),
            md AS (SELECT event_type,
                          quantile_disc(dev, 0.5)::BIGINT AS mad
                   FROM d GROUP BY event_type)
            SELECT d.event_type, count(*)::BIGINT AS n,
                   min(d.med)::BIGINT AS med_e4,
                   min(md.mad)::BIGINT AS mad_e4,
                   sum(CASE WHEN 10000 * d.dev > 3 * 14826 * md.mad
                            THEN 1 ELSE 0 END)::BIGINT AS n_outliers
            FROM d JOIN md USING (event_type)
            GROUP BY d.event_type
        """,
        # Pareto classes on exact cents: inclusive running share vs
        # 80%/95% via integer cross-multiplication
        "orders_abc_classes": """
            WITH r AS (
              SELECT o_custkey,
                     sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                       ::BIGINT AS rev_c
              FROM orders GROUP BY o_custkey
            ),
            c AS (
              SELECT o_custkey, rev_c,
                     sum(rev_c) OVER (ORDER BY rev_c DESC, o_custkey)
                       ::BIGINT AS cum,
                     (SELECT sum(rev_c) FROM r)::BIGINT AS tot
              FROM r
            )
            SELECT o_custkey, rev_c,
                   CASE WHEN 10000 * cum <= 8000 * tot THEN 'A'
                        WHEN 10000 * cum <= 9500 * tot THEN 'B'
                        ELSE 'C' END AS abc
            FROM c
        """,
        # C4 hygiene flags: terminal-punct line filter, sentence
        # floor, brace/lorem boilerplate tells
        "docs_c4_line_stats": """
            WITH d AS (
              SELECT doc_id, text,
                     string_split(text, chr(10)) AS lines
              FROM documents
            )
            SELECT doc_id,
                   len(lines)::BIGINT AS n_lines,
                   len(list_filter(lines,
                       l -> regexp_matches(rtrim(l), '[.!?"]$')))
                       ::BIGINT AS n_kept,
                   len(regexp_extract_all(text, '[.!?]+'))::BIGINT
                       AS n_sentences,
                   CASE WHEN contains(text, '{') THEN 1 ELSE 0 END
                       ::BIGINT AS fail_brace,
                   CASE WHEN contains(lower(text), 'lorem ipsum')
                        THEN 1 ELSE 0 END::BIGINT AS fail_lorem,
                   CASE WHEN len(regexp_extract_all(text, '[.!?]+'))
                             >= 3
                        AND len(list_filter(lines,
                            l -> regexp_matches(rtrim(l), '[.!?"]$')))
                             >= 1
                        AND NOT contains(text, '{')
                        AND NOT contains(lower(text), 'lorem ipsum')
                        THEN 1 ELSE 0 END::BIGINT AS pass_all
            FROM d
        """,
        # Gopher rule flags: token bound, mean word length, alpha-word
        # share, stopword floor, bullet-line share (4dp floors)
        "docs_gopher_rules": """
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(
                              lower(trim(text)), '\\s+') END AS toks,
                     length(regexp_replace(text, '\\s', '', 'g'))
                         AS wchars,
                     string_split(text, chr(10)) AS lines
              FROM documents
            ),
            f AS (
              SELECT doc_id, len(toks)::BIGINT AS ntok,
                     wchars::BIGINT AS wchars,
                     len(list_filter(toks,
                         x -> regexp_matches(x, '[a-z]')))::BIGINT
                         AS nalpha,
                     len(list_filter(toks,
                         x -> x IN ('the','be','to','of','and','that',
                                    'have','with')))::BIGINT AS nstop,
                     len(lines)::BIGINT AS nlines,
                     len(list_filter(lines,
                         l -> regexp_matches(ltrim(l), '^[-*]')))
                         ::BIGINT AS nbullet
              FROM d
            ),
            r AS (
              SELECT doc_id,
                     CASE WHEN ntok < 50 OR ntok > 100000
                          THEN 1 ELSE 0 END::BIGINT AS fail_tok,
                     CASE WHEN ntok = 0 OR
                          floor(10000.0 * wchars
                                / greatest(ntok, 1)) < 30000 OR
                          floor(10000.0 * wchars
                                / greatest(ntok, 1)) > 100000
                          THEN 1 ELSE 0 END::BIGINT AS fail_wlen,
                     CASE WHEN ntok = 0 OR
                          floor(10000.0 * nalpha
                                / greatest(ntok, 1)) < 8000
                          THEN 1 ELSE 0 END::BIGINT AS fail_alpha,
                     CASE WHEN nstop < 2 THEN 1 ELSE 0 END::BIGINT
                         AS fail_stop,
                     CASE WHEN floor(10000.0 * nbullet
                                     / greatest(nlines, 1)) > 9000
                          THEN 1 ELSE 0 END::BIGINT AS fail_bullet
              FROM f
            )
            SELECT *,
                   CASE WHEN fail_tok + fail_wlen + fail_alpha
                             + fail_stop + fail_bullet = 0
                        THEN 1 ELSE 0 END::BIGINT AS pass_all
            FROM r
        """,
        # alpha=1/2 temperature mixture: s_e6 = floor(1e6*sqrt(tokens)),
        # weight_bp = (1e4*s_e6) // total
        "docs_domain_mixture": """
            WITH t AS (
              SELECT source,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text),
                                                         '\\s+'))
                     END AS ntok
              FROM documents
            ),
            g AS (SELECT source, count(*)::BIGINT AS n_docs,
                         sum(ntok)::BIGINT AS n_tokens
                  FROM t GROUP BY source),
            s AS (SELECT *, floor(1000000 * sqrt(n_tokens))::BIGINT
                            AS s_e6
                  FROM g),
            tot AS (SELECT sum(s_e6)::BIGINT AS st FROM s)
            SELECT source, n_docs, n_tokens, s_e6,
                   (10000 * s_e6 // tot.st)::BIGINT AS weight_bp
            FROM s, tot
        """,
        # seed-keyed md5 permutation rank (dense, 0-based)
        "docs_epoch_shuffle": """
            SELECT doc_id,
                   row_number() OVER (
                     ORDER BY ('0x' || substr(md5(7 || ':' || doc_id),
                                              1, 15))::BIGINT,
                              doc_id) - 1 AS position
            FROM documents
        """,
        # k-anonymity + l-diversity one-row summary over the quasi-
        # identifier (nation, floor(acctbal/100))
        "customer_privacy_audit": """
            WITH g AS (
              SELECT c_nationkey::BIGINT AS nation,
                     CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_h,
                     count(*)::BIGINT AS n,
                     count(DISTINCT c_mktsegment)::BIGINT AS ndiv
              FROM customer GROUP BY 1, 2
            )
            SELECT 3::BIGINT AS k, 2::BIGINT AS l,
                   sum(n)::BIGINT AS n_rows,
                   count(*)::BIGINT AS n_groups,
                   sum(CASE WHEN n < 3 THEN 1 ELSE 0 END)::BIGINT
                     AS n_risky_groups,
                   sum(CASE WHEN n < 3 THEN n ELSE 0 END)::BIGINT
                     AS n_risky_rows,
                   sum(CASE WHEN ndiv < 2 THEN 1 ELSE 0 END)::BIGINT
                     AS n_lowdiv_groups
            FROM g
        """,
        "customer_fk_events": """
            SELECT 'ref:c_custkey' AS rule,
                   (SELECT count(*) FROM customer
                    WHERE c_custkey IS NULL OR c_custkey NOT IN
                      (SELECT user_id FROM events
                       WHERE user_id IS NOT NULL))::BIGINT
                       AS n_violations
        """,
        "orders_expectations": """
            SELECT 'in_range:o_totalprice' AS rule,
                   count(*) FILTER (o_totalprice < 0 OR
                                    o_totalprice > 200000 OR
                                    o_totalprice IS NULL)::BIGINT
                       AS n_violations
            FROM orders
            UNION ALL
            SELECT 'in_set:o_orderstatus',
                   count(*) FILTER (o_orderstatus NOT IN ('O', 'F') OR
                                    o_orderstatus IS NULL)::BIGINT
            FROM orders
            UNION ALL
            SELECT 'matches:o_orderpriority',
                   count(*) FILTER (NOT regexp_full_match(
                       coalesce(o_orderpriority, ''),
                       '[0-9]-[A-Z ]+'))::BIGINT
            FROM orders
            UNION ALL
            SELECT 'not_null:o_custkey',
                   count(*) FILTER (o_custkey IS NULL)::BIGINT
            FROM orders
            UNION ALL
            SELECT 'unique:o_orderkey',
                   (count(*) - count(DISTINCT o_orderkey))::BIGINT
            FROM orders
            ORDER BY rule
        """,
        "embedding_negatives_stratified": """
            WITH compl AS (
              SELECT l.label,
                     list(e.vec_id ORDER BY e.vec_id) AS a,
                     count(*)::BIGINT AS n
              FROM (SELECT DISTINCT label FROM embeddings) l
              JOIN embeddings e ON e.label <> l.label
              GROUP BY l.label
            ), js AS (SELECT unnest(range(3)) AS j)
            SELECT e.vec_id, e.label, js.j,
                   c.a[1 + (('0x' || substr(md5(e.vec_id::VARCHAR || ':'
                             || js.j::VARCHAR), 1, 15))::BIGINT % c.n)]
                       AS neg_id
            FROM embeddings e JOIN compl c ON e.label = c.label, js
        """,
        "embedding_negatives": """
            WITH arr AS (
              SELECT list(vec_id ORDER BY vec_id) AS a,
                     count(*)::BIGINT AS n
              FROM embeddings
            ), js AS (SELECT unnest(range(3)) AS j),
            pick AS (
              SELECT e.vec_id, js.j, arr.a, arr.n,
                     ('0x' || substr(md5(e.vec_id::VARCHAR || ':'
                                         || js.j::VARCHAR), 1, 15))
                         ::BIGINT % arr.n AS idx
              FROM embeddings e, js, arr
            )
            SELECT vec_id, j,
                   CASE WHEN a[1 + idx] = vec_id
                        THEN a[1 + ((idx + 1) % n)]
                        ELSE a[1 + idx] END AS neg_id
            FROM pick
        """,
        "embedding_jl_project": """
            WITH u AS (
              SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
                     CAST(trunc(unnest(embedding)::DOUBLE * 1000000)
                          AS BIGINT) AS x
              FROM embeddings
            ), js AS (SELECT unnest(range(8)) AS j),
            dims AS (SELECT DISTINCT dim FROM u),
            s AS (
              SELECT js.j, dims.dim,
                     CASE WHEN ('0x' || substr(md5(js.j::VARCHAR || ':'
                                || dims.dim::VARCHAR), 1, 1))::INT >= 8
                          THEN 1 ELSE -1 END AS sg
              FROM js, dims
            )
            SELECT u.vec_id, s.j, sum(u.x * s.sg)::BIGINT AS proj
            FROM u JOIN s ON u.dim = s.dim
            GROUP BY u.vec_id, s.j
        """,
        "docs_len_hdr_by_source": """
            WITH x AS (SELECT source, n_chars::BIGINT AS v
                       FROM documents),
            bk AS (
              SELECT source, CASE WHEN v < 128 THEN v
                     ELSE ((length(bin(v)) - 1 - 7) << 7)
                          + (v >> (length(bin(v)) - 1 - 7)) END AS bucket
              FROM x
            ), b AS (
              SELECT source, bucket, count(*)::BIGINT AS n
              FROM bk GROUP BY source, bucket
            ), c AS (
              SELECT source, bucket,
                     sum(n) OVER (PARTITION BY source
                                  ORDER BY bucket) AS cum
              FROM b
            ), tot AS (
              SELECT source, count(*)::BIGINT AS n FROM x GROUP BY source
            ), qs AS (SELECT unnest([50, 90, 99]) AS q_pct),
            sel AS (
              SELECT c.source, q_pct, min(bucket) AS bucket
              FROM qs, c JOIN tot ON c.source = tot.source
              WHERE 100 * c.cum >= q_pct * tot.n
              GROUP BY c.source, q_pct
            )
            SELECT source, q_pct,
                   CASE WHEN bucket < 256 THEN bucket
                        ELSE (bucket - (((bucket >> 7) - 1) << 7))
                             << ((bucket >> 7) - 1) END AS est
            FROM sel ORDER BY source, q_pct
        """,
        "docs_from_ipc": """
            SELECT lang, sum(n_chars)::BIGINT AS sum_chars,
                   count(*)::BIGINT AS n_docs
            FROM documents GROUP BY lang
        """,
        "docs_from_orc": """
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS sum_chars
            FROM documents GROUP BY source
        """,
        "events_running_distinct": """
            WITH o AS (
              SELECT user_id, ts, event_id, event_type,
                     row_number() OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id) AS rn
              FROM events
            )
            SELECT user_id, ts, event_id, event_type,
                   sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id
                             ORDER BY ts, event_id)::BIGINT AS n_distinct
            FROM o
        """,
        "lineitem_hdr_quantiles": """
            WITH x AS (
              SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
              FROM lineitem
            ), bk AS (
              SELECT CASE WHEN v < 128 THEN v
                     ELSE ((length(bin(v)) - 1 - 7) << 7)
                          + (v >> (length(bin(v)) - 1 - 7)) END AS bucket
              FROM x
            ), b AS (
              SELECT bucket, count(*)::BIGINT AS n FROM bk GROUP BY bucket
            ), c AS (
              SELECT bucket, sum(n) OVER (ORDER BY bucket) AS cum FROM b
            ), tot AS (SELECT count(*)::BIGINT AS n FROM x),
            qs AS (SELECT unnest([50, 90, 99]) AS q_pct),
            sel AS (
              SELECT q_pct, min(bucket) AS bucket FROM qs, c, tot
              WHERE 100 * c.cum >= q_pct * tot.n GROUP BY q_pct
            )
            SELECT q_pct,
                   CASE WHEN bucket < 256 THEN bucket
                        ELSE (bucket - (((bucket >> 7) - 1) << 7))
                             << ((bucket >> 7) - 1) END AS est
            FROM sel ORDER BY q_pct
        """,
        "events_scd2": """
            WITH o AS (
              SELECT user_id, ts, event_type,
                     lag(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_type) AS prev
              FROM events
            ), ch AS (
              SELECT user_id, ts, event_type FROM o
              WHERE prev IS NULL OR prev <> event_type
            )
            SELECT user_id, event_type AS value, ts AS valid_from,
                   lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_type) AS valid_to,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_type) AS version
            FROM ch
        """,
        "events_key_skew": """
            WITH c AS (SELECT user_id, count(*)::BIGINT AS n
                       FROM events GROUP BY user_id),
            tot AS (SELECT count(*)::BIGINT AS t FROM events)
            SELECT user_id, n, (10000 * n) // tot.t AS share_bp
            FROM c, tot ORDER BY n DESC, user_id LIMIT 10
        """,
        "orders_nation_revenue_auto": """
            SELECT c.c_nationkey,
                   sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                       ::BIGINT AS rev_cents,
                   count(*)::BIGINT AS n_orders
            FROM orders o JOIN customer c
              ON o.o_custkey = c.c_custkey
            GROUP BY c.c_nationkey
        """,
        "lineitem_join_cardinality": """
            SELECT count(*)::BIGINT AS n_join_rows
            FROM lineitem l JOIN orders o
              ON l.l_orderkey = o.o_orderkey
        """,
        "text_heavy_hitters_by_source": """
            WITH t AS (
              SELECT source,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(lower(text)),
                                                     '\\s+')
                     END AS toks
              FROM documents
            ), u AS (SELECT source, unnest(toks) AS token FROM t),
            c AS (SELECT source, token, count(*)::BIGINT AS n
                  FROM u GROUP BY source, token),
            tot AS (SELECT source, count(*)::BIGINT AS n_total
                    FROM u GROUP BY source)
            SELECT c.source, c.token, c.n
            FROM c JOIN tot ON c.source = tot.source
            WHERE c.n * 30 > tot.n_total
            ORDER BY c.source, c.n DESC, c.token
        """,
        "docs_gazetteer_by_source": """
            WITH t AS (
              SELECT doc_id, source,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(lower(text)),
                                                     '\\s+')
                     END AS toks
              FROM documents
            ), u AS (
              SELECT doc_id, source, unnest(toks) AS g FROM t
              UNION ALL
              SELECT doc_id, source,
                     unnest(list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i+1])) AS g
              FROM t
            )
            SELECT source, g AS term, count(*)::BIGINT AS n_mentions,
                   count(DISTINCT doc_id)::BIGINT AS n_docs
            FROM u
            WHERE g IN ('hash join', 'merge join', 'filter', 'vector')
            GROUP BY source, g ORDER BY source, term
        """,
        "text_gazetteer": _TOKS_CTE + """
            , u AS (
              SELECT doc_id, unnest(toks) AS g FROM t
              UNION ALL
              SELECT doc_id,
                     unnest(list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i+1])) AS g
              FROM t
            )
            SELECT g AS term, count(*)::BIGINT AS n_mentions,
                   count(DISTINCT doc_id)::BIGINT AS n_docs
            FROM u
            WHERE g IN ('hash join', 'merge join', 'row scan', 'filter',
                        'vector', 'customer', 'quantum entanglement')
            GROUP BY g ORDER BY term
        """,
        "text_heavy_hitters": _TOKS_CTE + """
            , u AS (SELECT unnest(toks) AS token FROM t),
            c AS (SELECT token, count(*)::BIGINT AS n
                  FROM u GROUP BY token),
            tot AS (SELECT count(*)::BIGINT AS n_total FROM u)
            SELECT token, n FROM c, tot WHERE n * 40 > n_total
            ORDER BY n DESC, token ASC
        """,
        "docs_tfidf_top3": _TOKS_CTE + """
            , u AS (SELECT doc_id, unnest(toks) AS token FROM t),
            tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf
                   FROM u GROUP BY doc_id, token),
            dfreq AS (SELECT token, count(*)::BIGINT AS df
                      FROM tf GROUP BY token),
            n AS (SELECT count(*)::BIGINT AS n FROM documents),
            s AS (SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
                         CAST(tf.tf * ((n.n * 10000) // dfreq.df)
                              AS BIGINT) AS score
                  FROM tf JOIN dfreq ON tf.token = dfreq.token
                  CROSS JOIN n),
            r AS (SELECT *, row_number() OVER (
                      PARTITION BY doc_id
                      ORDER BY score DESC, token ASC) AS rn
                  FROM s)
            SELECT doc_id, token, tf, df, score FROM r WHERE rn <= 3
        """,
        "events_unpivot": """
            SELECT user_id, event_type, count(*)::BIGINT AS n
            FROM events GROUP BY user_id, event_type
        """,
        "docs_lang_share": """
            WITH a AS (SELECT lang, sum(n_chars)::BIGINT AS chars
                       FROM documents GROUP BY lang),
            t AS (SELECT sum(chars)::BIGINT AS total FROM a)
            SELECT lang, chars,
                   ((10000 * chars) // t.total)::BIGINT AS share_bp
            FROM a, t
        """,
        "events_pivot_types": """
            SELECT user_id,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                       END)::BIGINT AS n_click,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                       END)::BIGINT AS n_error,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                       END)::BIGINT AS n_purchase,
                   sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0
                       END)::BIGINT AS n_signup,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                       END)::BIGINT AS n_view
            FROM events GROUP BY user_id
        """,
        "events_props_stats": """
            WITH x AS (
              SELECT event_type,
                     CAST(NULLIF(regexp_extract(props,
                                                '"k":\\s*(-?\\d+)', 1),
                                 '') AS BIGINT) AS k
              FROM events
            )
            SELECT event_type, count(k)::BIGINT AS n_with_k,
                   coalesce(sum(k), 0)::BIGINT AS sum_k,
                   coalesce(max(k), 0)::BIGINT AS max_k
            FROM x GROUP BY event_type
        """,
        "embedding_kmeans": _kmeans_sql(k=8, iters=2),
        "ann_pq_top10": _pq_sql(m_sub=8, k_codes=16, iters=1, topk=10),
        "docs_vocab_encode": _TOKS_CTE + """
            , u AS (SELECT doc_id, unnest(toks) AS token FROM t),
            cnt AS (SELECT token, count(*)::BIGINT AS n
                    FROM u GROUP BY token),
            v AS (SELECT token,
                         row_number() OVER (ORDER BY n DESC, token ASC)
                             - 1 AS token_id
                  FROM cnt ORDER BY n DESC, token ASC LIMIT 64)
            SELECT u.doc_id, count(*)::BIGINT AS n_tokens,
                   (count(*) - count(v.token_id))::BIGINT AS n_oov,
                   coalesce(sum(v.token_id), 0)::BIGINT AS sum_ids
            FROM u LEFT JOIN v ON u.token = v.token
            GROUP BY u.doc_id
        """,
        # Naive Bayes fit: the 256×3 smoothed-log-likelihood grid
        # recomputed term for term (per-cell floor(1e6·ln) — the
        # per-term-floor idiom; T sums only vocab-token counts)
        "docs_nb_model": _NB_CTE + """
            SELECT label, token, c, ll_e6 FROM ll
        """,
        # ... and score: per-doc Σ of the independently floored cell
        # values + floored prior; argmax tie → label ASC
        "docs_nb_pred": _NB_CTE + """
            , prior AS (
                SELECT label,
                       floor(1000000 * ln(count(*)::DOUBLE
                             / (SELECT count(*) FROM lab)))::BIGINT AS pr
                FROM lab GROUP BY label
            ),
            dtok AS (SELECT doc_id, unnest(toks) AS tok FROM lab),
            tsum AS (
                SELECT d.doc_id, ll.label, sum(ll.ll_e6) AS ts
                FROM dtok d JOIN ll ON ll.token = d.tok
                GROUP BY d.doc_id, ll.label
            ),
            scores AS (
                SELECT b.doc_id, p.label, p.pr + coalesce(ts.ts, 0) AS sc
                FROM (SELECT DISTINCT doc_id FROM lab) b
                CROSS JOIN prior p
                LEFT JOIN tsum ts
                  ON ts.doc_id = b.doc_id AND ts.label = p.label
            )
            SELECT doc_id, label AS pred, sc::BIGINT AS score_e6
            FROM (SELECT doc_id, label, sc,
                         row_number() OVER (PARTITION BY doc_id
                             ORDER BY sc DESC, label ASC) AS rn
                  FROM scores)
            WHERE rn = 1
        """,
        # per-lang exact ROC-AUC of the c0-class score: value counts
        # per (lang, score, is_pos), cumulative-negatives window,
        # HUGEINT rank-sum with half-credit ties
        "docs_nb_auc": _NB_CTE + """
            , prior AS (
                SELECT label,
                       floor(1000000 * ln(count(*)::DOUBLE
                             / (SELECT count(*) FROM lab)))::BIGINT AS pr
                FROM lab GROUP BY label
            ),
            dtok AS (SELECT doc_id, unnest(toks) AS tok FROM lab),
            ts0 AS (
                SELECT d.doc_id, sum(ll.ll_e6) AS ts
                FROM dtok d JOIN ll
                  ON ll.token = d.tok AND ll.label = 'c0'
                GROUP BY d.doc_id
            ),
            sc AS (
                SELECT b.doc_id,
                       (SELECT pr FROM prior WHERE label = 'c0')
                           + coalesce(ts0.ts, 0) AS s,
                       (b.doc_id % 3 = 0) AS is_pos
                FROM (SELECT DISTINCT doc_id FROM lab) b
                LEFT JOIN ts0 ON ts0.doc_id = b.doc_id
            ),
            scl AS (
                SELECT d.lang, sc.s, sc.is_pos
                FROM sc JOIN documents d ON d.doc_id = sc.doc_id
            ),
            vc AS (
                SELECT lang, s,
                       sum(is_pos::INT)::HUGEINT AS npos,
                       sum((NOT is_pos)::INT)::HUGEINT AS nneg
                FROM scl GROUP BY lang, s
            ),
            w AS (
                SELECT lang, npos, nneg,
                       coalesce(sum(nneg) OVER (PARTITION BY lang
                           ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS cumneg
                FROM vc
            ),
            agg AS (
                SELECT lang, sum(npos * cumneg) AS pgt,
                       sum(npos * nneg) AS ties,
                       sum(npos) AS p, sum(nneg) AS n
                FROM w GROUP BY lang
            )
            SELECT lang, p::BIGINT AS n_pos, n::BIGINT AS n_neg,
                   ((1000000 * (2 * pgt + ties))
                       // (2 * p * n))::BIGINT AS auc_e6
            FROM agg WHERE p > 0 AND n > 0
        """,
        # per-class precision/recall/F1 of the NB argmax vs the
        # id-derived truth labels: confusion counts + integer e6 folds
        "docs_nb_prf": _NB_CTE + """
            , prior AS (
                SELECT label,
                       floor(1000000 * ln(count(*)::DOUBLE
                             / (SELECT count(*) FROM lab)))::BIGINT AS pr
                FROM lab GROUP BY label
            ),
            dtok AS (SELECT doc_id, unnest(toks) AS tok FROM lab),
            tsum AS (
                SELECT d.doc_id, ll.label, sum(ll.ll_e6) AS ts
                FROM dtok d JOIN ll ON ll.token = d.tok
                GROUP BY d.doc_id, ll.label
            ),
            scores AS (
                SELECT b.doc_id, p.label, p.pr + coalesce(ts.ts, 0) AS sc
                FROM (SELECT DISTINCT doc_id FROM lab) b
                CROSS JOIN prior p
                LEFT JOIN tsum ts
                  ON ts.doc_id = b.doc_id AND ts.label = p.label
            ),
            pred AS (
                SELECT doc_id, label AS pred
                FROM (SELECT doc_id, label,
                             row_number() OVER (PARTITION BY doc_id
                                 ORDER BY sc DESC, label ASC) AS rn
                      FROM scores)
                WHERE rn = 1
            ),
            conf AS (
                SELECT 'c' || CAST(p.doc_id % 3 AS VARCHAR) AS truth,
                       p.pred, count(*)::HUGEINT AS n
                FROM pred p GROUP BY 1, 2
            ),
            cls AS (
                SELECT DISTINCT truth AS label FROM conf
                UNION
                SELECT DISTINCT pred FROM conf
            ),
            m AS (
                SELECT c.label,
                       coalesce((SELECT sum(n) FROM conf
                                 WHERE truth = c.label
                                   AND pred = c.label), 0) AS tp,
                       coalesce((SELECT sum(n) FROM conf
                                 WHERE pred = c.label), 0) AS predn,
                       coalesce((SELECT sum(n) FROM conf
                                 WHERE truth = c.label), 0) AS truen
                FROM cls c
            )
            SELECT label, tp::BIGINT AS tp,
                   (predn - tp)::BIGINT AS fp,
                   (truen - tp)::BIGINT AS fn,
                   (CASE WHEN predn = 0 THEN 0
                         ELSE (1000000 * tp) // predn
                    END)::BIGINT AS prec_e6,
                   (CASE WHEN truen = 0 THEN 0
                         ELSE (1000000 * tp) // truen
                    END)::BIGINT AS rec_e6,
                   (CASE WHEN predn + truen = 0 THEN 0
                         ELSE (2000000 * tp) // (predn + truen)
                    END)::BIGINT AS f1_e6
            FROM m
        """,
        "lineitem_range_tiles": """
            WITH c AS (
              SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
              FROM lineitem
            ),
            b AS (
              SELECT quantile_disc(v, 0.25) AS b1,
                     quantile_disc(v, 0.50) AS b2,
                     quantile_disc(v, 0.75) AS b3
              FROM c
            ),
            t AS (
              SELECT ((v > b.b1)::INT + (v > b.b2)::INT
                      + (v > b.b3)::INT)::BIGINT AS tile, v
              FROM c, b
            )
            SELECT tile, count(*)::BIGINT AS n_rows,
                   min(v) AS min_cents, max(v) AS max_cents
            FROM t GROUP BY tile
        """,
        "docs_stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                  % 1000 <
                  CASE lang WHEN 'en' THEN 100
                            WHEN 'de' THEN 500
                            WHEN 'es' THEN 500
                            WHEN 'fr' THEN 500
                            ELSE 0 END
        """,
        "tpch_salted_priority": """
            SELECT o.o_orderpriority,
                   CAST(sum(CAST(round(l.l_extendedprice * 100)
                                 AS BIGINT)) AS BIGINT)
                       AS sum_price_cents,
                   count(*)::BIGINT AS n_items
            FROM lineitem l JOIN orders o
              ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority
        """,
        # hashing trick: md5-bucketed feature cross + collision counts
        "docs_feature_hashing": """
            WITH f AS (
              SELECT ('0x' || substr(md5(lang || 'x' || source), 1, 15))
                     ::BIGINT % 64 AS bucket,
                     lang || 'x' || source AS feat
              FROM documents
            )
            SELECT bucket, count(*)::BIGINT AS n_rows,
                   count(DISTINCT feat)::BIGINT AS n_features
            FROM f GROUP BY bucket
        """,
        # Mann–Whitney U with exact 2x-scaled midranks
        "docs_mannwhitney": """
            WITH v AS (
              SELECT n_chars AS x, count(*)::BIGINT AS c,
                     sum(CASE WHEN source =
                         (SELECT min(source) FROM documents)
                         THEN 1 ELSE 0 END)::BIGINT AS a
              FROM documents GROUP BY n_chars
            ),
            w AS (
              SELECT x, c, a,
                     coalesce(sum(c) OVER (ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS strt
              FROM v
            ),
            t AS (SELECT sum(a * (2 * strt + c + 1))::BIGINT AS r2a,
                         sum(a)::BIGINT AS na, sum(c)::BIGINT AS n
                  FROM w)
            SELECT na AS n_a, (n - na)::BIGINT AS n_b,
                   (r2a - na * (na + 1))::BIGINT AS u2_a
            FROM t
        """,
        # row-group pruning correctness: footer-planned scan + residual
        # filter == plain predicate
        "orders_rowgroup_prune": """
            SELECT count(*)::BIGINT AS n,
                   sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                   ::BIGINT AS sum_cents
            FROM orders WHERE o_orderkey BETWEEN 10000 AND 20000
        """,
        # Theil–Sen: pairwise day-slope median; DuckDB // truncates =
        # raygraph trunc_div (positive denominators)
        "orders_theil_sen": """
            WITH byday AS (
              SELECT epoch_us(o_orderdate) // 86400000000 AS d,
                     sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                     ::BIGINT AS y
              FROM orders GROUP BY 1
            ),
            sl AS MATERIALIZED (
              SELECT (1000000 * (b.y - a.y)) // (b.d - a.d) AS slope
              FROM byday a JOIN byday b ON b.d > a.d
            ),
            r AS (SELECT slope,
                         row_number() OVER (ORDER BY slope) AS rn,
                         count(*) OVER () AS m
                  FROM sl)
            SELECT (SELECT count(*) FROM byday)::BIGINT AS n_days,
                   m::BIGINT AS n_pairs, slope::BIGINT AS slope_e6
            FROM r WHERE rn = (m + 1) // 2
        """,
        # Holt's recurrence replayed with a RECURSIVE CTE; DuckDB //
        # truncates toward zero = raygraph trunc_div
        "orders_holt_winters": """
            WITH RECURSIVE byday AS (
              SELECT o_orderdate AS d,
                     sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                     ::BIGINT AS y
              FROM orders GROUP BY o_orderdate
            ),
            ord AS (
              SELECT d, y, row_number() OVER (ORDER BY d) AS rn
              FROM byday
            ),
            hw AS (
              SELECT rn, d, y, y AS l, 0::BIGINT AS b
              FROM ord WHERE rn = 1
              UNION ALL
              SELECT o.rn, o.d, o.y,
                     o.y // 5 + (4 * (h.l + h.b)) // 5,
                     (o.y // 5 + (4 * (h.l + h.b)) // 5 - h.l) // 10
                     + (9 * h.b) // 10
              FROM ord o JOIN hw h ON o.rn = h.rn + 1
            )
            SELECT d AS day, l AS level_c, b AS trend_c FROM hw
        """,
        # IVM correctness: the oracle is the FULL recompute over
        # (orders minus deletes) union doubled inserts — the Ray side
        # only ever touches the delta, yet must match bit-for-bit
        "orders_ivm_view": """
            WITH eff AS (
              SELECT o_custkey,
                     CAST(round(o_totalprice * 100, 0) AS BIGINT)
                     AS cents
              FROM orders WHERE o_orderkey % 17 <> 0
              UNION ALL
              SELECT o_custkey,
                     2 * CAST(round(o_totalprice * 100, 0) AS BIGINT)
              FROM orders WHERE o_orderkey % 13 = 0
            )
            SELECT o_custkey, count(*)::BIGINT AS n_orders,
                   sum(cents)::BIGINT AS revenue_cents
            FROM eff GROUP BY o_custkey
        """,
        "orders_merged": """
            WITH b AS (
              SELECT o_orderkey AS k, o_custkey AS custkey,
                     CAST(round(o_totalprice * 100, 0) AS BIGINT)
                         AS price_cents
              FROM orders
            ),
            ch AS (
              SELECT k, 'delete' AS op, custkey, price_cents
              FROM b WHERE k % 13 = 0
              UNION ALL
              SELECT k, 'upsert', custkey, price_cents + 500
              FROM b WHERE k % 7 = 0 AND k % 13 <> 0
              UNION ALL
              SELECT k + 10000000, 'upsert', custkey, 999::BIGINT
              FROM b WHERE k % 101 = 0
            )
            SELECT b.k, b.custkey, b.price_cents FROM b
            WHERE NOT EXISTS (SELECT 1 FROM ch WHERE ch.k = b.k)
            UNION ALL
            SELECT k, custkey, price_cents FROM ch WHERE op = 'upsert'
        """,
        "docs_profile": """
            WITH p AS (
              SELECT 'doc_id' AS "column", count(*)::BIGINT AS n_rows,
                     (count(*) - count(doc_id))::BIGINT AS n_null,
                     CAST(min(doc_id) AS VARCHAR) AS min_v,
                     CAST(max(doc_id) AS VARCHAR) AS max_v,
                     count(DISTINCT doc_id)::BIGINT AS n_distinct
              FROM documents
              UNION ALL
              SELECT 'text', count(*), count(*) - count(text),
                     CAST(min(text) AS VARCHAR),
                     CAST(max(text) AS VARCHAR),
                     count(DISTINCT text) FROM documents
              UNION ALL
              SELECT 'lang', count(*), count(*) - count(lang),
                     CAST(min(lang) AS VARCHAR),
                     CAST(max(lang) AS VARCHAR),
                     count(DISTINCT lang) FROM documents
              UNION ALL
              SELECT 'source', count(*), count(*) - count(source),
                     CAST(min(source) AS VARCHAR),
                     CAST(max(source) AS VARCHAR),
                     count(DISTINCT source) FROM documents
              UNION ALL
              SELECT 'n_chars', count(*), count(*) - count(n_chars),
                     CAST(min(n_chars) AS VARCHAR),
                     CAST(max(n_chars) AS VARCHAR),
                     count(DISTINCT n_chars) FROM documents
            )
            SELECT "column", n_rows, n_null, min_v, max_v, n_distinct
            FROM p ORDER BY "column"
        """,
        "events_coverage": """
            WITH s AS (
              SELECT user_id, epoch_us(ts) AS st,
                     epoch_us(ts) + 300000000 AS en
              FROM events),
            w AS (
              SELECT user_id, st,
                     max(en) OVER (PARTITION BY user_id ORDER BY st
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cm,
                     max(en) OVER (PARTITION BY user_id ORDER BY st
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS pcm
              FROM s)
            SELECT user_id,
                   count(*)::BIGINT AS n_events,
                   sum(CASE WHEN pcm IS NULL OR st > pcm THEN 1
                            ELSE 0 END)::BIGINT AS n_islands,
                   sum(greatest(0, cm - greatest(coalesce(pcm, st), st))
                       )::BIGINT AS covered_us
            FROM w GROUP BY user_id ORDER BY user_id
        """,
        "events_ewma_tail": """
            WITH r AS (
              SELECT user_id,
                     CAST(round(value * 10000, 0) AS BIGINT) AS v,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC)
                         AS j
              FROM events)
            SELECT user_id,
                   count(*)::BIGINT AS n_events,
                   sum(CASE WHEN j <= 8 THEN v * (1 << (8 - j))
                            ELSE 0 END)::BIGINT AS ews_e4
            FROM r GROUP BY user_id ORDER BY user_id
        """,
        "events_value_moments": """
            WITH v AS (
              SELECT event_type,
                     CAST(round(value * 10000) AS BIGINT) AS v
              FROM events
            )
            SELECT event_type, count(*)::BIGINT AS n,
                   sum(v)::BIGINT AS sum_e4,
                   sum(v * v)::BIGINT AS sumsq_e8
            FROM v GROUP BY event_type
        """,
        "events_funnel": """
            WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (SELECT e.user_id, min(e.ts) AS t2
                   FROM events e JOIN s1 USING (user_id)
                   WHERE e.event_type = 'click' AND e.ts > s1.t1
                   GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, min(e.ts) AS t3
                   FROM events e JOIN s2 USING (user_id)
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                   GROUP BY e.user_id)
            SELECT 1::BIGINT AS step, 'view' AS step_type,
                   (SELECT count(*) FROM s1)::BIGINT AS n_users
            UNION ALL
            SELECT 2::BIGINT, 'click', (SELECT count(*) FROM s2)::BIGINT
            UNION ALL
            SELECT 3::BIGINT, 'purchase', (SELECT count(*) FROM s3)::BIGINT
        """,
        "events_retention": """
            WITH w AS (
              SELECT user_id,
                     ((epoch_ms(ts) // 1000) // 86400) // 7 AS week
              FROM events
            ),
            f AS (SELECT user_id, min(week) AS cohort_week
                  FROM w GROUP BY user_id),
            a AS (SELECT DISTINCT user_id, week FROM w)
            SELECT f.cohort_week::BIGINT AS cohort_week,
                   a.week::BIGINT AS week, count(*)::BIGINT AS n_users
            FROM a JOIN f USING (user_id)
            GROUP BY f.cohort_week, a.week
        """,
        "events_top_trigrams": """
            WITH s AS (
              SELECT user_id, event_type AS t3,
                     lag(event_type, 1) OVER (
                         PARTITION BY user_id
                         ORDER BY ts, event_id) AS t2,
                     lag(event_type, 2) OVER (
                         PARTITION BY user_id
                         ORDER BY ts, event_id) AS t1
              FROM events
            )
            SELECT t1, t2, t3, count(*)::BIGINT AS n
            FROM s WHERE t1 IS NOT NULL AND t2 IS NOT NULL
            GROUP BY t1, t2, t3
            ORDER BY n DESC, t1, t2, t3
            LIMIT 10
        """,
        "text_bigram_pmi": f"""
            {_TOKS_CTE},
            u AS (SELECT unnest(toks) AS w FROM t),
            uni AS (SELECT w, count(*)::BIGINT AS n FROM u GROUP BY w),
            nu AS (SELECT sum(n)::BIGINT AS n_u FROM uni),
            bg AS (
              SELECT unnest(list_transform(
                       generate_series(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i + 1])) AS bigram
              FROM t),
            big AS (SELECT bigram, count(*)::BIGINT AS n
                    FROM bg GROUP BY bigram),
            nb AS (SELECT sum(n)::BIGINT AS n_b FROM big),
            topm AS (SELECT bigram, n FROM big
                     ORDER BY n DESC, bigram LIMIT 1000),
            j AS (SELECT bigram, split_part(bigram, ' ', 1) AS w1,
                         split_part(bigram, ' ', 2) AS w2, n
                  FROM topm),
            p AS (SELECT j.bigram, j.n,
                         floor(1000000 * ln(
                           (j.n::HUGEINT * nu.n_u * nu.n_u)::DOUBLE
                           / (nb.n_b::HUGEINT * u1.n * u2.n)::DOUBLE
                         ))::BIGINT AS pmi_e6
                  FROM j, nu, nb, uni u1, uni u2
                  WHERE u1.w = j.w1 AND u2.w = j.w2)
            SELECT bigram, n, pmi_e6 FROM p
            ORDER BY pmi_e6 DESC, bigram
            LIMIT 20
        """,
        "docs_ngram_dup": """
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0 THEN text ||
                          ' the quick brown fox jumps over the lazy dog'
                          ELSE text END AS text
              FROM documents),
            t AS (SELECT doc_id,
                         regexp_split_to_array(trim(text), '\\s+') AS a
                  FROM d WHERE trim(text) <> ''),
            g AS (SELECT DISTINCT doc_id,
                         array_to_string(a[i:i+7], ' ') AS gram
                  FROM t, LATERAL unnest(generate_series(1, len(a) - 7))
                       AS s(i)),
            c AS (SELECT gram, count(*)::BIGINT AS n_docs
                  FROM g GROUP BY gram)
            SELECT g.doc_id, count(*)::BIGINT AS n_grams,
                   sum(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END)::BIGINT
                       AS n_shared
            FROM g JOIN c USING (gram)
            GROUP BY g.doc_id ORDER BY g.doc_id
        """,
        "docs_snapshot_diff": """
            WITH b AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 10 = 1 THEN text || '!'
                          ELSE text END AS text
              FROM documents WHERE doc_id % 10 <> 0
              UNION ALL
              SELECT doc_id + 10000000, text FROM documents
              WHERE doc_id % 10 = 2),
            j AS (
              SELECT CASE WHEN a.doc_id IS NULL THEN 'added'
                          WHEN b.doc_id IS NULL THEN 'removed'
                          WHEN a.text <> b.text THEN 'changed'
                          ELSE 'same' END AS status
              FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
            SELECT status, count(*)::BIGINT AS n
            FROM j GROUP BY status ORDER BY status
        """,
        "events_winsorized_mean": """
            WITH v AS (
              SELECT event_type,
                     CAST(round(value * 10000) AS BIGINT) AS v_e4
              FROM events),
            q AS (SELECT event_type,
                         quantile_disc(v_e4, 0.01) AS lo,
                         quantile_disc(v_e4, 0.99) AS hi
                  FROM v GROUP BY event_type),
            c AS (SELECT v.event_type,
                         least(greatest(v.v_e4, q.lo), q.hi) AS cv
                  FROM v JOIN q ON q.event_type = v.event_type)
            SELECT event_type, count(*)::BIGINT AS n,
                   (sum(cv) // count(*))::BIGINT AS wins_mean_e4
            FROM c GROUP BY event_type
        """,
        "events_transition_pmi": """
            WITH s AS (
              SELECT user_id, event_type,
                     lag(event_type) OVER (
                         PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev
              FROM events),
            tr AS (SELECT prev AS from_type, event_type AS to_type,
                          count(*)::BIGINT AS n
                   FROM s WHERE prev IS NOT NULL
                   GROUP BY prev, event_type),
            m AS (SELECT sum(n)::BIGINT AS n_tot FROM tr),
            fx AS (SELECT from_type, sum(n)::BIGINT AS nf
                   FROM tr GROUP BY from_type),
            ty AS (SELECT to_type, sum(n)::BIGINT AS nt
                   FROM tr GROUP BY to_type)
            SELECT t.from_type, t.to_type, t.n,
                   floor(1000000 * ln(
                     (t.n::HUGEINT * m.n_tot)::DOUBLE
                     / (fx.nf::HUGEINT * ty.nt)::DOUBLE))::BIGINT AS pmi_e6
            FROM tr t, m, fx, ty
            WHERE fx.from_type = t.from_type AND ty.to_type = t.to_type
        """,
        # DSIR importance weights: hashed unigram+bigram buckets, dim-
        # sized add-one log-ratio table, per-occurrence e6 floors
        # summed as ints per doc
        "docs_dsir_weights": """
            WITH t AS (
              SELECT doc_id, source,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(
                                 trim(lower(text)), '\\s+')
                     END AS toks
              FROM documents),
            u AS (SELECT doc_id, source, unnest(toks) AS w,
                         generate_subscripts(toks, 1) AS pos FROM t),
            bi AS (SELECT doc_id, source,
                          w || ' ' || lead(w) OVER (
                            PARTITION BY doc_id ORDER BY pos) AS gram
                   FROM u),
            g AS (SELECT doc_id, source, w AS gram FROM u
                  UNION ALL
                  SELECT doc_id, source, gram FROM bi
                  WHERE gram IS NOT NULL),
            h AS (SELECT doc_id, source,
                         ('0x' || substr(md5(gram), 1, 15))::BIGINT
                           % 1024 AS b
                  FROM g),
            cnt AS (SELECT b,
                           count(*) FILTER (WHERE source = 'src0')
                             ::BIGINT AS ct,
                           count(*)::BIGINT AS cr
                    FROM h GROUP BY b),
            tot AS (SELECT sum(ct)::BIGINT AS nt,
                           sum(cr)::BIGINT AS nr FROM cnt),
            r AS (SELECT b,
                         floor(1000000 * ln(
                           ((ct + 1) * (nr + 1024))::DOUBLE
                           / ((cr + 1) * (nt + 1024))))::BIGINT AS r_e6
                  FROM cnt, tot)
            SELECT h.doc_id, count(*)::BIGINT AS n_grams,
                   sum(r.r_e6)::BIGINT AS dsir_e6
            FROM h JOIN r USING (b) GROUP BY h.doc_id
        """,
        # CCNet-style bigram-LM perplexity: add-one over each history's
        # follower set, per-term e6 floors summed as ints
        "docs_bigram_perplexity": f"""
            {_TOKS_CTE},
            u AS (SELECT doc_id, unnest(toks) AS w,
                         generate_subscripts(toks, 1) AS pos FROM t),
            b AS (SELECT doc_id, w AS w1,
                         lead(w) OVER (PARTITION BY doc_id
                                       ORDER BY pos) AS w2
                  FROM u),
            dbt AS (SELECT doc_id, w1, w2, count(*)::BIGINT AS tf
                    FROM b WHERE w2 IS NOT NULL
                    GROUP BY doc_id, w1, w2),
            big AS (SELECT w1, w2, sum(tf)::BIGINT AS n
                    FROM dbt GROUP BY w1, w2),
            hist AS (SELECT w1, sum(n)::BIGINT AS c1h,
                            count(*)::BIGINT AS fw
                     FROM big GROUP BY w1),
            tm AS (SELECT dbt.doc_id,
                          floor((1000000 * dbt.tf)
                                * ln((hist.c1h + hist.fw)::DOUBLE
                                     / (big.n + 1)))::BIGINT AS t_e6,
                          dbt.tf
                   FROM dbt
                   JOIN big ON big.w1 = dbt.w1 AND big.w2 = dbt.w2
                   JOIN hist ON hist.w1 = dbt.w1)
            SELECT doc_id, sum(tf)::BIGINT AS n_bg,
                   (sum(t_e6) // sum(tf))::BIGINT AS ce_e6
            FROM tm GROUP BY doc_id
        """,
        "docs_unigram_surprise": f"""
            {_TOKS_CTE},
            u AS (SELECT doc_id, unnest(toks) AS w FROM t),
            dwt AS (SELECT doc_id, w, count(*)::BIGINT AS tf
                    FROM u GROUP BY doc_id, w),
            uni AS (SELECT w, sum(tf)::BIGINT AS n FROM dwt GROUP BY w),
            nu AS (SELECT sum(n)::BIGINT AS n_u FROM uni),
            tm AS (SELECT dwt.doc_id,
                          floor((1000000 * dwt.tf)
                                * ln(nu.n_u::DOUBLE / uni.n))::BIGINT
                              AS t_e6,
                          dwt.tf
                   FROM dwt, uni, nu WHERE uni.w = dwt.w)
            SELECT doc_id, sum(tf)::BIGINT AS n_tok,
                   (sum(t_e6) // sum(tf))::BIGINT AS ce_e6
            FROM tm GROUP BY doc_id
            ORDER BY ce_e6 DESC, doc_id
            LIMIT 20
        """,
        "docs_bm25_top10": f"""
            {_TOKS_CTE},
            u AS (SELECT doc_id, unnest(toks) AS w FROM t),
            tf AS (SELECT doc_id, w AS term, count(*)::BIGINT AS tf
                   FROM u WHERE w IN ('hash', 'join', 'vector', 'stream')
                   GROUP BY doc_id, w),
            dl AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM t),
            g AS (SELECT count(*)::BIGINT AS n,
                         sum(len(toks))::BIGINT AS s FROM t),
            df AS (SELECT term, count(*)::BIGINT AS df FROM tf
                   GROUP BY term),
            contrib AS (
              SELECT tf.doc_id,
                     floor((1000000 * ln((g.n - df.df + 0.5)
                                         / (df.df + 0.5)))
                           * ((22::HUGEINT * tf.tf * g.s)::DOUBLE
                              / (10::HUGEINT * tf.tf * g.s + 3 * g.s
                                 + 9 * dl.dl * g.n)::DOUBLE))::BIGINT
                         AS c
              FROM tf, dl, g, df
              WHERE dl.doc_id = tf.doc_id AND df.term = tf.term)
            SELECT doc_id, sum(c)::BIGINT AS score_e6
            FROM contrib GROUP BY doc_id
            ORDER BY score_e6 DESC, doc_id
            LIMIT 10
        """,
        "docs_rrf_fusion": """
            WITH ra AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY n_chars DESC, doc_id)
                       AS r
              FROM documents),
            rb AS (
              SELECT doc_id,
                     row_number() OVER (
                       ORDER BY (doc_id * 2654435761) % 4294967296 DESC,
                                doc_id) AS r
              FROM documents)
            SELECT a.doc_id, a.r::BIGINT AS rank_a, b.r::BIGINT AS rank_b,
                   (1000000 // (60 + a.r)
                    + 1000000 // (60 + b.r))::BIGINT AS rrf_e6
            FROM ra a JOIN rb b ON a.doc_id = b.doc_id
            ORDER BY rrf_e6 DESC, a.doc_id
            LIMIT 10
        """,
        "docs_weighted_sample": """
            SELECT doc_id, n_chars,
                   (((doc_id * 2654435761) % 4294967296) * 10000)
                   // (n_chars + 1) AS priority
            FROM documents
            ORDER BY priority, doc_id
            LIMIT 20
        """,
        "events_transitions": """
            WITH s AS (
              SELECT user_id, event_type,
                     lag(event_type) OVER (
                         PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev
              FROM events
            )
            SELECT prev AS from_type, event_type AS to_type,
                   count(*)::BIGINT AS n
            FROM s WHERE prev IS NOT NULL
            GROUP BY prev, event_type
        """,
        "events_sequences": """
            SELECT user_id,
                   string_agg(event_type, '>' ORDER BY ts, event_id)
                       AS seq
            FROM events GROUP BY user_id
        """,
        "events_latest": """
            WITH r AS (
              SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
                     CAST(round(value * 10000, 0) AS BIGINT) AS value_e4,
                     row_number() OVER (
                         PARTITION BY user_id
                         ORDER BY ts DESC, event_id ASC) AS rn
              FROM events
            )
            SELECT user_id, ts_us, event_id, event_type, value_e4
            FROM r WHERE rn = 1
        """,
        "events_top_type": """
            WITH c AS (SELECT user_id, event_type, count(*)::BIGINT AS n
                       FROM events GROUP BY user_id, event_type),
            r AS (SELECT *, row_number() OVER (
                      PARTITION BY user_id
                      ORDER BY n DESC, event_type ASC) AS rn
                  FROM c)
            SELECT user_id, event_type, n FROM r WHERE rn = 1
        """,
        # exact-integer Zipf fit: floor-e6 ln points, HUGEINT normal
        # equations, truncating // — mirrors text.zipf_slope bit-for-bit
        "text_zipf": _TOKS_CTE + """
            , tok AS (SELECT unnest(toks) AS token FROM t)
            , cnt AS (SELECT token, count(*)::BIGINT AS n
                      FROM tok GROUP BY token)
            , top AS (SELECT n, row_number()
                        OVER (ORDER BY n DESC, token) AS r
                      FROM cnt ORDER BY n DESC, token LIMIT 100)
            , pts AS (SELECT floor(1000000 * ln(r::DOUBLE))::BIGINT AS x,
                             floor(1000000 * ln(n::DOUBLE))::BIGINT AS y
                      FROM top)
            , s AS (SELECT count(*)::HUGEINT AS k, sum(x)::HUGEINT AS sx,
                           sum(y)::HUGEINT AS sy,
                           sum(x * y)::HUGEINT AS sxy,
                           sum(x * x)::HUGEINT AS sxx
                    FROM pts)
            , fit AS (SELECT k, sx, sy,
                             ((1000000::HUGEINT * (k * sxy - sx * sy))
                                 // (k * sxx - sx * sx)) AS slope
                      FROM s)
            SELECT k::BIGINT AS n_points, slope::BIGINT AS slope_e6,
                   ((sy - (slope * sx) // 1000000) // k)::BIGINT
                       AS intercept_e6
            FROM fit
        """,
        "text_hapax_ratio": _TOKS_CTE + """
            , u AS (SELECT unnest(toks) AS token FROM t)
            , c AS (SELECT token, count(*)::BIGINT AS n
                    FROM u GROUP BY token)
            SELECT count(*)::BIGINT AS n_vocab,
                   coalesce(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END),
                            0)::BIGINT AS n_hapax,
                   ((10000 * coalesce(sum(CASE WHEN n = 1 THEN 1
                                               ELSE 0 END), 0))
                       // count(*))::BIGINT AS hapax_bp
            FROM c
        """,
        "kg_pred_entropy": f"""
            WITH e AS ({kg_edges_sql}),
            c AS (SELECT pred, count(*)::BIGINT AS n FROM e
                  GROUP BY pred),
            t AS (SELECT sum(n)::BIGINT AS tot FROM c)
            SELECT count(*)::BIGINT AS n_preds, t.tot::BIGINT AS n_edges,
                   sum(floor((1000000 * c.n) * ln(t.tot::DOUBLE / c.n)
                             / t.tot))::BIGINT AS h_e6
            FROM c, t GROUP BY t.tot
        """,
        "text_top_tokens": _TOKS_CTE + """
            , u AS (SELECT unnest(toks) AS token FROM t)
            SELECT token, count(*)::BIGINT AS n
            FROM u GROUP BY token
            ORDER BY n DESC, token ASC
            LIMIT 20
        """,
        "text_top_bigrams": _TOKS_CTE + """
            , b AS (
              SELECT unnest(list_transform(
                       generate_series(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i + 1])) AS bigram
              FROM t
            )
            SELECT bigram, count(*)::BIGINT AS n
            FROM b GROUP BY bigram
            ORDER BY n DESC, bigram ASC
            LIMIT 20
        """,
        "docs_lr_score": f"""
            WITH f AS (
              SELECT doc_id, length(text) AS n_chars,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text),
                                                         '\\s+'))
                     END AS n_tokens,
                     length(regexp_replace(text, '[\\w\\s]', '', 'g'))
                         AS n_punct
              FROM documents
            )
            SELECT doc_id,
                   ({T.DEFAULT_LR_BIAS}
                    + {T.DEFAULT_LR_WEIGHTS["n_chars"]} * n_chars
                    + ({T.DEFAULT_LR_WEIGHTS["n_tokens"]}) * n_tokens
                    + ({T.DEFAULT_LR_WEIGHTS["n_punct"]}) * n_punct
                   )::BIGINT AS logit,
                   (CASE WHEN {T.DEFAULT_LR_BIAS}
                    + {T.DEFAULT_LR_WEIGHTS["n_chars"]} * n_chars
                    + ({T.DEFAULT_LR_WEIGHTS["n_tokens"]}) * n_tokens
                    + ({T.DEFAULT_LR_WEIGHTS["n_punct"]}) * n_punct > 0
                    THEN 1 ELSE 0 END)::BIGINT AS keep
            FROM f
        """,
        # Spearman = Pearson on exact 2x midranks (window cum counts)
        "lineitem_spearman": """
            WITH q AS (
              SELECT trunc(l_quantity)::BIGINT AS x,
                     trunc(l_extendedprice)::BIGINT AS y
              FROM lineitem
            ),
            cx AS (SELECT x, count(*)::BIGINT AS c FROM q GROUP BY x),
            rx AS (SELECT x, (2 * (sum(c) OVER (ORDER BY x) - c)
                              + c + 1)::BIGINT AS r2 FROM cx),
            cy AS (SELECT y, count(*)::BIGINT AS c FROM q GROUP BY y),
            ry AS (SELECT y, (2 * (sum(c) OVER (ORDER BY y) - c)
                              + c + 1)::BIGINT AS r2 FROM cy),
            r AS (SELECT 0::BIGINT AS grp, rx.r2 AS a, ry.r2 AS b
                  FROM q JOIN rx ON rx.x = q.x JOIN ry ON ry.y = q.y),
            m AS (SELECT grp, count(*)::HUGEINT AS n,
                         sum(a)::HUGEINT AS sx, sum(b)::HUGEINT AS sy,
                         sum(a * a)::HUGEINT AS sxx,
                         sum(b * b)::HUGEINT AS syy,
                         sum(a * b)::HUGEINT AS sxy
                  FROM r GROUP BY grp)
            SELECT grp, n::BIGINT AS n_rows,
                   floor((10000 * (n * sxy - sx * sy))::DOUBLE
                         / sqrt((n * sxx - sx * sx)::DOUBLE
                                * (n * syy - sy * sy)::DOUBLE))::BIGINT
                       AS corr_bp
            FROM m
            WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        """,
        "lineitem_corr": """
            WITH q AS (
              SELECT l_returnflag,
                     trunc(l_quantity)::BIGINT AS x,
                     trunc(l_extendedprice)::BIGINT AS y
              FROM lineitem
            ),
            m AS (
              SELECT l_returnflag, count(*)::HUGEINT AS n,
                     sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
                     sum(x * x)::HUGEINT AS sxx,
                     sum(y * y)::HUGEINT AS syy,
                     sum(x * y)::HUGEINT AS sxy
              FROM q GROUP BY l_returnflag
            )
            SELECT l_returnflag, n::BIGINT AS n_rows,
                   floor((10000 * (n * sxy - sx * sy))::DOUBLE
                         / sqrt((n * sxx - sx * sx)::DOUBLE
                                * (n * syy - sy * sy)::DOUBLE))::BIGINT
                       AS corr_bp
            FROM m
            WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        """,
        "corpus_span_transitions": """
            WITH idx AS (SELECT row_number() OVER () - 1 AS i
                         FROM documents),
            t AS (
              SELECT 'media' AS from_kind, 'text' AS to_kind,
                     count(*) FILTER (i % 7 = 3)::BIGINT AS n FROM idx
              UNION ALL
              SELECT 'text', 'media', count(*)::BIGINT FROM idx
            )
            SELECT from_kind, to_kind, n FROM t WHERE n > 0
            ORDER BY from_kind, to_kind
        """,
        "corpus_span_stats": """
            WITH idx AS (SELECT row_number() OVER () - 1 AS i
                         FROM documents)
            SELECT 'doc/' || i AS doc_id,
                   (CASE WHEN i % 7 = 3 THEN 3 ELSE 2 END)::BIGINT
                       AS n_spans,
                   (CASE WHEN i % 7 = 3 THEN 2 ELSE 1 END)::BIGINT
                       AS n_text,
                   1::BIGINT AS n_media
            FROM idx
        """,
        "docs_pii_scrub": """
            WITH aug AS (
              SELECT doc_id,
                     text
                     || CASE WHEN doc_id % 7 = 0
                             THEN ' mail: u' || doc_id || '@ex'
                                  || (doc_id % 10) || '.org'
                             ELSE '' END
                     || CASE WHEN doc_id % 11 = 0
                             THEN ' call '
                                  || lpad((doc_id % 1000)::VARCHAR, 3, '0')
                                  || '-555-'
                                  || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                             ELSE '' END AS text
              FROM documents
            )
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\\.[A-Za-z0-9.-]+'
                   ))::BIGINT AS n_emails,
                   len(regexp_extract_all(text,
                       '\\+?[0-9]{3}-[0-9]{3}-[0-9]{4}'))::BIGINT AS n_phones,
                   regexp_replace(
                     regexp_replace(text,
                       '[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\\.[A-Za-z0-9.-]+',
                       '<EMAIL>', 'g'),
                     '\\+?[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')
                     AS clean_text
            FROM aug
        """,
        "docs_contamination": _TOKS_CTE + """
            , u AS (SELECT doc_id, unnest(toks) AS tok,
                           generate_subscripts(toks, 1) AS pos
                    FROM t),
            g AS (SELECT doc_id,
                         tok || ' ' || lead(tok, 1) OVER w || ' '
                             || lead(tok, 2) OVER w AS ngram
                  FROM u WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
            v AS (SELECT doc_id, ngram FROM g WHERE ngram IS NOT NULL),
            bench AS (SELECT DISTINCT ngram FROM v WHERE doc_id < 20)
            SELECT v.doc_id, count(*)::BIGINT AS n_grams,
                   count(bench.ngram)::BIGINT AS n_contaminated
            FROM v LEFT JOIN bench USING (ngram)
            GROUP BY v.doc_id
        """,
        "docs_contamination_dist": _TOKS_CTE + """
            , u AS (SELECT doc_id, unnest(toks) AS tok,
                           generate_subscripts(toks, 1) AS pos
                    FROM t),
            g AS (SELECT doc_id,
                         tok || ' ' || lead(tok, 1) OVER w || ' '
                             || lead(tok, 2) OVER w AS ngram
                  FROM u WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
            v AS (SELECT doc_id, ngram FROM g WHERE ngram IS NOT NULL),
            bench AS (SELECT DISTINCT ngram FROM v WHERE doc_id < 20)
            SELECT v.doc_id, count(*)::BIGINT AS n_grams,
                   count(bench.ngram)::BIGINT AS n_contaminated
            FROM v LEFT JOIN bench USING (ngram)
            GROUP BY v.doc_id
        """,
        "docs_rebalance_sources": """
            WITH cnt AS (SELECT lang, count(*)::BIGINT AS n
                         FROM documents GROUP BY lang),
            m AS (SELECT min(n) AS mn FROM cnt),
            r AS (SELECT lang, (1000 * mn) // n AS rate FROM cnt, m)
            SELECT d.doc_id, d.lang
            FROM documents d JOIN r USING (lang)
            WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT
                  % 1000 < r.rate
        """,
        "docs_length_band": _TOKS_CTE + """
            , c AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens FROM t),
            b AS (SELECT quantile_disc(n_tokens, 0.05) AS lo,
                         quantile_disc(n_tokens, 0.95) AS hi
                  FROM c)
            SELECT doc_id, n_tokens FROM c, b
            WHERE n_tokens BETWEEN lo AND hi
        """,
        "orders_global_rownum": """
            SELECT o_orderkey,
                   row_number() OVER (ORDER BY o_orderkey)::BIGINT AS rn
            FROM orders
        """,
        "docs_normalize": """
            WITH aug AS (
              SELECT doc_id,
                     text || CASE WHEN doc_id % 5 = 0
                                  THEN ' cafe' || chr(769)
                                  ELSE '' END AS text
              FROM documents
            )
            SELECT doc_id,
                   nfc_normalize(text) AS norm_text,
                   length(nfc_normalize(text))::BIGINT AS n_chars_norm
            FROM aug
        """,
        "docs_cap_per_lang": """
            WITH k AS (
              SELECT doc_id, lang,
                     ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                         AS shuffle_key
              FROM documents
            ),
            r AS (SELECT *, row_number() OVER (
                      PARTITION BY lang
                      ORDER BY shuffle_key DESC, doc_id ASC) AS rn
                  FROM k)
            SELECT doc_id, lang, shuffle_key FROM r WHERE rn <= 5
        """,
        "docs_chunks": """
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text), '\\s+')
                     END AS toks
              FROM documents
            ),
            u AS (SELECT doc_id, unnest(toks) AS tok,
                         generate_subscripts(toks, 1) - 1 AS pos
                  FROM t)
            SELECT doc_id, (pos // 32)::BIGINT AS chunk_id,
                   count(*)::BIGINT AS n_tokens,
                   string_agg(tok, ' ' ORDER BY pos) AS chunk_text
            FROM u GROUP BY doc_id, pos // 32
        """,
        "docs_shuffle_rank": """
            WITH k AS (
              SELECT doc_id,
                     ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                         AS shuffle_key
              FROM documents
            )
            SELECT doc_id, shuffle_key,
                   row_number() OVER (ORDER BY shuffle_key, doc_id)::BIGINT
                       AS rank
            FROM k
        """,
        "docs_packing": _TOKS_CTE + """
            , c AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens FROM t),
            s AS (SELECT doc_id, n_tokens,
                         coalesce(sum(n_tokens) OVER (
                             ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0)::BIGINT AS off
                  FROM c)
            SELECT doc_id, n_tokens,
                   (off // 2048)::BIGINT AS pack_id,
                   (off % 2048)::BIGINT AS offset_in_pack
            FROM s
        """,
        # shuffle-then-pack: position = md5-rank permutation (seed 7),
        # prefix sums in position order
        "docs_prepare_packs": _TOKS_CTE + """
            , c AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens
                    FROM t),
            p AS (SELECT doc_id,
                         row_number() OVER (
                           ORDER BY ('0x' || substr(
                               md5(7 || ':' || doc_id), 1,
                               15))::BIGINT, doc_id) - 1 AS position
                  FROM documents),
            s AS (SELECT c.doc_id, c.n_tokens,
                         coalesce(sum(c.n_tokens) OVER (
                             ORDER BY p.position
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0)::BIGINT
                             AS off
                  FROM c JOIN p USING (doc_id))
            SELECT doc_id, n_tokens,
                   (off // 2048)::BIGINT AS pack_id,
                   (off % 2048)::BIGINT AS offset_in_pack
            FROM s
        """,
        "docs_repetition": _TOKS_CTE + """
            , u AS (SELECT doc_id, unnest(toks) AS tok,
                           generate_subscripts(toks, 1) AS pos
                    FROM t),
            g AS (SELECT doc_id, tok || ' ' || lead(tok, 1) OVER w AS ngram
                  FROM u WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
            c AS (SELECT doc_id, ngram, count(*)::BIGINT AS n
                  FROM g WHERE ngram IS NOT NULL GROUP BY doc_id, ngram)
            SELECT doc_id, sum(n)::BIGINT AS n_2grams,
                   max(n)::BIGINT AS max_2gram_n,
                   floor(10000.0 * max(n) / sum(n)) / 10000.0 AS top_share
            FROM c GROUP BY doc_id
        """,
        # grid-density clustering: e6-trunc quantize dims 1-2, floor
        # cell ids, core >= 5, 8-neighborhood min-label rounds —
        # mirrors raygraph.ops.cluster.grid_clusters exactly
        "embedding_grid_clusters": """
            WITH p AS (
              SELECT vec_id,
                     CAST(floor(CAST(trunc(embedding[1]::DOUBLE
                          * 1000000) AS BIGINT)::DOUBLE / 50000)
                          AS BIGINT) AS cx,
                     CAST(floor(CAST(trunc(embedding[2]::DOUBLE
                          * 1000000) AS BIGINT)::DOUBLE / 50000)
                          AS BIGINT) AS cy
              FROM embeddings
            ),
            c AS (
              SELECT cx, cy, cx::VARCHAR || ':' || cy::VARCHAR AS k,
                     count(*)::BIGINT AS n
              FROM p GROUP BY cx, cy
            ),
            core AS MATERIALIZED (SELECT * FROM c WHERE n >= 4),
            arcs AS MATERIALIZED (
              SELECT a.k AS s, b.k AS d FROM core a JOIN core b
              ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
            ),
            l0 AS (SELECT k, k AS l FROM core),
            l1 AS (SELECT a.d AS k, min(l.l) AS l FROM arcs a
                   JOIN l0 l ON a.s = l.k GROUP BY a.d),
            l2 AS (SELECT a.d AS k, min(l.l) AS l FROM arcs a
                   JOIN l1 l ON a.s = l.k GROUP BY a.d),
            l3 AS (SELECT a.d AS k, min(l.l) AS l FROM arcs a
                   JOIN l2 l ON a.s = l.k GROUP BY a.d),
            l4 AS (SELECT a.d AS k, min(l.l) AS l FROM arcs a
                   JOIN l3 l ON a.s = l.k GROUP BY a.d)
            SELECT l.l AS cluster, count(*)::BIGINT AS n_cells,
                   sum(c2.n)::BIGINT AS n_points
            FROM l4 l JOIN core c2 ON l.k = c2.k GROUP BY l.l
        """,
        "embedding_centroids": """
            WITH u AS (
              SELECT vec_id % 10 AS bucket,
                     generate_subscripts(embedding, 1) - 1 AS dim,
                     -- ::DOUBLE first: the stored vectors are float32
                     -- and the product must be computed in f64 exactly
                     -- like numpy's promoted multiply
                     CAST(trunc(unnest(embedding)::DOUBLE * 1000000)
                          AS BIGINT) AS x_e6
              FROM embeddings
            )
            SELECT bucket, dim, count(*)::BIGINT AS n_vecs,
                   -- Python-style FLOOR division (sums can be negative;
                   -- DuckDB's // truncates toward zero instead). The
                   -- float detour is exact: |sum| << 2^53 and a
                   -- non-divisible quotient sits ≥ 1/n from an integer.
                   CAST(floor(sum(x_e6)::DOUBLE / count(*)) AS BIGINT)
                     AS centroid_e6
            FROM u GROUP BY bucket, dim
        """,
        "tpch_q1_full": """
            WITH c AS (
              SELECT l_returnflag, l_linestatus,
                     CAST(round(l_quantity * 10000) AS BIGINT) AS qty_e4,
                     CAST(round(l_extendedprice * 100) AS BIGINT)
                       AS base_cents,
                     CAST(round(l_discount * 10000) AS BIGINT) AS disc_bp,
                     CAST(round(l_tax * 10000) AS BIGINT) AS tax_bp
              FROM lineitem
            ),
            s AS (
              SELECT *,
                     base_cents * (10000 - disc_bp) // 10000
                       AS disc_price_cents
              FROM c
            ),
            s2 AS (
              SELECT *,
                     disc_price_cents * (10000 + tax_bp) // 10000
                       AS charge_cents
              FROM s
            ),
            a AS (
              SELECT l_returnflag, l_linestatus,
                     sum(qty_e4)::BIGINT AS sum_qty_e4,
                     sum(base_cents)::BIGINT AS sum_base_cents,
                     sum(disc_price_cents)::BIGINT AS sum_disc_price_cents,
                     sum(charge_cents)::BIGINT AS sum_charge_cents,
                     sum(disc_bp)::BIGINT AS sum_disc_bp,
                     count(*)::BIGINT AS n_rows
              FROM s2 GROUP BY l_returnflag, l_linestatus
            )
            SELECT l_returnflag, l_linestatus, sum_qty_e4, sum_base_cents,
                   sum_disc_price_cents, sum_charge_cents, sum_disc_bp,
                   n_rows,
                   sum_qty_e4 // n_rows AS avg_qty_e4,
                   sum_base_cents // n_rows AS avg_price_cents,
                   sum_disc_bp // n_rows AS avg_disc_bp
            FROM a
        """,
        "tpch_region_revenue": """
            SELECT r_name, n_name,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
                   )::BIGINT AS revenue_micents
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
                         AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """,
        "tpch_order_priority": """
            SELECT o_orderpriority, count(*)::BIGINT AS n_orders
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate)
            GROUP BY o_orderpriority
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name, c_acctbal
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 350000)
        """,
        "lineitem_sort_top100": """
            SELECT l_orderkey, l_linenumber,
                   CAST(round(l_extendedprice * 100) AS BIGINT)
                       AS price_cents
            FROM lineitem
            ORDER BY price_cents DESC, l_orderkey, l_linenumber
            LIMIT 100
        """,
        "lineitem_price_histogram": """
            WITH c AS (
              SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
              FROM lineitem
            )
            SELECT least(greatest(v // 100000, 0), 127)::BIGINT AS bin,
                   count(*)::BIGINT AS n
            FROM c GROUP BY 1
        """,
        "orders_checksum": """
            SELECT (sum(('0x' || substr(md5(
                        o_orderkey::VARCHAR || chr(31) || o_orderstatus
                    ), 1, 15))::BIGINT)
                    % 9223372036854775808::HUGEINT)::BIGINT AS checksum,
                   count(*)::BIGINT AS n_rows
            FROM orders
        """,
        "tpch_q5_region_volume": """
            SELECT n_name,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))
                   )::BIGINT AS revenue_e4
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey
              AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey
              AND r_name = 'EUROPE'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "tpch_q9_profit": """
            SELECT n_name,
                   CAST(date_part('year', l_shipdate) AS BIGINT) AS o_year,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))
                   )::BIGINT AS profit_e4
            FROM lineitem, supplier, nation
            WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
            GROUP BY n_name, o_year
        """,
        "tpch_q10_returns": """
            SELECT c_custkey, c_name, n_name,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))
                   )::BIGINT AS revenue_e4
            FROM customer, orders, lineitem, nation
            WHERE c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND l_returnflag = 'R'
              AND c_nationkey = n_nationkey
            GROUP BY c_custkey, c_name, n_name
            ORDER BY revenue_e4 DESC, c_custkey
            LIMIT 20
        """,
        "tpch_q16_suppliers": """
            SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
                   count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
            FROM lineitem, part
            WHERE l_partkey = p_partkey
              AND p_type <> 'PROMO'
              AND p_brand <> 'Brand#13'
              AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
            GROUP BY p_brand, p_size
        """,
        "tpch_q19_revenue": """
            SELECT coalesce(sum(
                     CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))
                   ), 0)::BIGINT AS revenue_e4
            FROM lineitem, part
            WHERE l_partkey = p_partkey
              AND (
                (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                 AND l_quantity BETWEEN 1 AND 11)
                OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                    AND l_quantity BETWEEN 10 AND 20)
                OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                    AND l_quantity BETWEEN 20 AND 30)
              )
        """,
        "bloom_join_prune": """
            WITH k AS (SELECT DISTINCT o_orderkey FROM orders
                       WHERE o_orderpriority = '1-URGENT'),
            js AS (SELECT unnest([0, 1, 2]) AS j),
            bits AS (SELECT DISTINCT
                       ('0x' || substr(md5(o_orderkey::VARCHAR
                                           || '#' || j), 1, 15))::BIGINT
                       % 131072 AS pos
                     FROM k, js),
            d AS (SELECT DISTINCT l_orderkey FROM lineitem),
            probe AS (SELECT DISTINCT l_orderkey,
                        ('0x' || substr(md5(l_orderkey::VARCHAR
                                            || '#' || j), 1, 15))::BIGINT
                        % 131072 AS pos
                      FROM d, js),
            np AS (SELECT l_orderkey, count(*)::BIGINT AS n_pos
                   FROM probe GROUP BY l_orderkey),
            nh AS (SELECT p.l_orderkey, count(*)::BIGINT AS n_hit
                   FROM probe p JOIN bits b ON b.pos = p.pos
                   GROUP BY p.l_orderkey),
            pass AS (SELECT np.l_orderkey
                     FROM np JOIN nh ON nh.l_orderkey = np.l_orderkey
                     WHERE nh.n_hit = np.n_pos)
            SELECT (SELECT count(*) FROM k)::BIGINT AS n_keys,
                   (SELECT count(*) FROM lineitem
                    WHERE l_orderkey IN (SELECT o_orderkey FROM k)
                   )::BIGINT AS n_true,
                   (SELECT count(*) FROM lineitem
                    WHERE l_orderkey IN (SELECT l_orderkey FROM pass)
                   )::BIGINT AS n_bloom_pass
        """,
        "tpch_q2_min_supplier": """
            WITH shippers AS (
              SELECT DISTINCT l_partkey AS p_partkey, l_suppkey
              FROM lineitem, part
              WHERE l_partkey = p_partkey AND p_type = 'LARGE'
                AND p_size <= 15),
            cand AS (
              SELECT sh.p_partkey, sh.l_suppkey AS s_suppkey, s_name, n_name,
                     CAST(round(s_acctbal * 100) AS BIGINT) AS acct_cents,
                     row_number() OVER (
                       PARTITION BY sh.p_partkey
                       ORDER BY round(s_acctbal * 100), sh.l_suppkey) AS rn
              FROM shippers sh, supplier, nation, region
              WHERE sh.l_suppkey = supplier.s_suppkey
                AND s_nationkey = n_nationkey
                AND n_regionkey = r_regionkey AND r_name = 'EUROPE')
            SELECT p_partkey, s_suppkey, s_name, n_name, acct_cents
            FROM cand WHERE rn = 1
        """,
        "tpch_q7_volume": """
            SELECT supp_nation, cust_nation, l_year,
                   sum(volume_e4)::BIGINT AS revenue_e4
            FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                         CAST(date_part('year', l_shipdate) AS BIGINT)
                           AS l_year,
                         CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                           AS volume_e4
                  FROM supplier, lineitem, orders, customer,
                       nation n1, nation n2
                  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
                    AND c_custkey = o_custkey
                    AND s_nationkey = n1.n_nationkey
                    AND c_nationkey = n2.n_nationkey
                    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                         OR (n1.n_name = 'NATION_2'
                             AND n2.n_name = 'NATION_1'))
                    AND l_shipdate >= TIMESTAMP '1995-01-01'
                    AND l_shipdate < TIMESTAMP '1997-01-01') s
            GROUP BY supp_nation, cust_nation, l_year
        """,
        "tpch_q8_market_share": """
            WITH alln AS (
              SELECT CAST(date_part('year', o_orderdate) AS BIGINT)
                       AS o_year,
                     CAST(round(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       AS volume_e4,
                     n1.n_name AS supp_nation
              FROM part, supplier, lineitem, orders, customer,
                   nation n1, nation n2, region
              WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
                AND l_orderkey = o_orderkey AND o_custkey = c_custkey
                AND c_nationkey = n2.n_nationkey
                AND n2.n_regionkey = r_regionkey
                AND r_name = 'ASIA' AND s_nationkey = n1.n_nationkey
                AND p_type = 'ECONOMY')
            SELECT o_year,
                   ((10000 * sum(CASE WHEN supp_nation = 'NATION_3'
                                      THEN volume_e4 ELSE 0 END))
                    // sum(volume_e4))::BIGINT AS mkt_share_bp
            FROM alln GROUP BY o_year
        """,
        "tpch_q11_important_parts": """
            WITH v AS (
              SELECT l_partkey AS p_partkey,
                     sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     )::BIGINT AS value_e2
              FROM lineitem, supplier, nation
              WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
                AND n_name = 'NATION_5'
              GROUP BY l_partkey)
            SELECT p_partkey, value_e2 FROM v
            WHERE 1000 * value_e2 > (SELECT sum(value_e2) FROM v)
        """,
        "tpch_q12_late_lines": """
            SELECT l_linestatus,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END)::BIGINT AS low_line_count
            FROM orders, lineitem
            WHERE o_orderkey = l_orderkey
              AND l_shipdate >= o_orderdate + INTERVAL 90 DAY
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_linestatus
        """,
        "supplier_gini": """
            WITH rev AS (
              SELECT l_suppkey,
                     sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                     )::HUGEINT AS x
              FROM lineitem GROUP BY l_suppkey),
            r AS (
              SELECT x,
                     row_number() OVER (ORDER BY x, l_suppkey) AS i,
                     count(*) OVER ()::HUGEINT AS n,
                     sum(x) OVER ()::HUGEINT AS sx
              FROM rev)
            SELECT max(n)::BIGINT AS n_suppliers,
                   ((10000 * (2 * sum(i * x) - (max(n) + 1) * max(sx)))
                    // (max(n) * max(sx)))::BIGINT AS gini_bp
            FROM r
        """,
        "docs_source_entropy": """
            WITH c AS (
              SELECT source, lang, count(*)::BIGINT AS n
              FROM documents GROUP BY source, lang),
            t AS (SELECT source, sum(n)::BIGINT AS tot FROM c
                  GROUP BY source)
            SELECT c.source,
                   count(*)::BIGINT AS n_langs,
                   sum(floor((1000000 * c.n) * ln(t.tot::DOUBLE / c.n)
                             / t.tot))::BIGINT AS h_e6
            FROM c JOIN t USING (source)
            GROUP BY c.source ORDER BY c.source
        """,
        "orders_benford": """
            SELECT CAST(substr(CAST(
                       CAST(round(o_totalprice * 100) AS BIGINT)
                       AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                   count(*)::BIGINT AS n
            FROM orders GROUP BY digit ORDER BY digit
        """,
        "supplier_pareto_top10": """
            WITH rev AS (
              SELECT l_suppkey,
                     sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                     )::BIGINT AS rev_e4
              FROM lineitem GROUP BY l_suppkey),
            t10 AS (SELECT rev_e4 FROM rev
                    ORDER BY rev_e4 DESC, l_suppkey LIMIT 10)
            SELECT (SELECT sum(rev_e4) FROM t10)::BIGINT AS top10_rev_e4,
                   (SELECT sum(rev_e4) FROM rev)::BIGINT AS total_rev_e4,
                   ((10000 * (SELECT sum(rev_e4) FROM t10))
                    // (SELECT sum(rev_e4) FROM rev))::BIGINT AS share_bp
        """,
        "customer_order_gaps": """
            WITH d AS (
              SELECT o_custkey AS c_custkey,
                     epoch_us(o_orderdate) // 86400000000 AS day
              FROM orders),
            a AS (SELECT c_custkey, min(day) AS lo, max(day) AS hi,
                         count(*)::BIGINT AS n
                  FROM d GROUP BY c_custkey)
            SELECT c_custkey, n,
                   ((100 * (hi - lo)) // (n - 1))::BIGINT
                       AS mean_gap_cdays
            FROM a WHERE n >= 2
        """,
        "tpch_q15_top_supplier": """
            WITH rev AS (
              SELECT l_suppkey AS s_suppkey,
                     sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                     )::BIGINT AS total_revenue_e4
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1996-04-01'
              GROUP BY l_suppkey)
            SELECT r.s_suppkey, s_name, total_revenue_e4
            FROM rev r, supplier s
            WHERE r.s_suppkey = s.s_suppkey
              AND total_revenue_e4 = (SELECT max(total_revenue_e4) FROM rev)
        """,
        "tpch_q17_small_qty": """
            WITH li AS (
              SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
              FROM lineitem, part
              WHERE l_partkey = p_partkey AND p_brand = 'Brand#23'
                AND p_type = 'MEDIUM'),
            s AS (
              SELECT l_partkey, sum(qty) AS sum_qty, count(*) AS cnt
              FROM li GROUP BY l_partkey)
            SELECT (coalesce(sum(cents), 0) // 7)::BIGINT AS avg_yearly_e2
            FROM li, s
            WHERE li.l_partkey = s.l_partkey AND 5 * qty * cnt < sum_qty
        """,
        "tpch_q20_promo_suppliers": """
            WITH qty AS (
              SELECT l_suppkey,
                     sum(CAST(l_quantity AS BIGINT))::BIGINT AS total_qty
              FROM lineitem, part
              WHERE l_partkey = p_partkey AND p_name LIKE 'red %'
                AND l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1998-01-01'
              GROUP BY l_suppkey)
            SELECT s.s_suppkey, s_name, total_qty
            FROM supplier s, nation, qty
            WHERE s.s_nationkey = n_nationkey AND n_name = 'NATION_7'
              AND qty.l_suppkey = s.s_suppkey AND total_qty > 50
        """,
        "tpch_q21_waiting_suppliers": """
            WITH lo AS (
              SELECT l_orderkey, l_suppkey, l_shipdate
              FROM lineitem, orders
              WHERE l_orderkey = o_orderkey AND o_orderstatus = 'F'),
            pers AS (
              SELECT l_orderkey, l_suppkey, max(l_shipdate) AS smax
              FROM lo GROUP BY l_orderkey, l_suppkey),
            r AS (
              SELECT l_orderkey, l_suppkey,
                     rank() OVER (PARTITION BY l_orderkey
                                  ORDER BY smax DESC) AS rk,
                     count(*) OVER (PARTITION BY l_orderkey) AS nsupp
              FROM pers),
            w AS (
              SELECT l_orderkey, max(l_suppkey) AS wk
              FROM r WHERE rk = 1 AND nsupp >= 2
              GROUP BY l_orderkey HAVING count(*) = 1)
            SELECT w.wk AS s_suppkey, s_name, count(*)::BIGINT AS numwait
            FROM w, supplier WHERE w.wk = supplier.s_suppkey
            GROUP BY w.wk, s_name
            ORDER BY numwait DESC, s_suppkey
            LIMIT 100
        """,
        "kg_linkpred": f"""
            WITH edges AS ({kg_edges_sql}),
            und AS (SELECT DISTINCT least(_from, _to) AS u,
                           greatest(_from, _to) AS v
                    FROM edges WHERE _from <> _to),
            arcs AS (SELECT u AS h, v AS x FROM und
                     UNION ALL SELECT v, u FROM und),
            pairs AS (
              SELECT a1.x AS u, a2.x AS v, count(*)::BIGINT AS cn
              FROM arcs a1 JOIN arcs a2 ON a1.h = a2.h AND a1.x < a2.x
              GROUP BY a1.x, a2.x)
            SELECT p.u, p.v, p.cn
            FROM pairs p
            WHERE NOT EXISTS (SELECT 1 FROM und e
                              WHERE e.u = p.u AND e.v = p.v)
            ORDER BY p.cn DESC, p.u, p.v
            LIMIT 20
        """,
        "events_late_arrivals": """
            WITH arr AS (
              SELECT user_id, ts,
                     (event_id * 2654435761) % 4294967296 AS arrival
              FROM events),
            w AS (
              SELECT user_id, ts,
                     max(ts) OVER (PARTITION BY user_id ORDER BY arrival
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS prev_max
              FROM arr)
            SELECT user_id,
                   count(*)::BIGINT AS n_events,
                   sum(CASE WHEN ts < prev_max THEN 1 ELSE 0 END
                   )::BIGINT AS n_late
            FROM w GROUP BY user_id
        """,
        "tpch_q4_exists": """
            SELECT o_orderpriority, count(*)::BIGINT AS order_count
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_discount >= 0.08)
            GROUP BY o_orderpriority
        """,
        "tpch_q13_custdist": """
            WITH pc AS (
              SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey)
            SELECT c_count, count(*)::BIGINT AS custdist
            FROM pc GROUP BY c_count
        """,
        "tpch_q18_big_orders": """
            WITH big AS (
              SELECT l_orderkey,
                     sum(CAST(l_quantity AS BIGINT))::BIGINT AS qty_sum
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
            SELECT c_custkey, c_name, o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
                   qty_sum
            FROM big, orders, customer
            WHERE o_orderkey = l_orderkey AND c_custkey = o_custkey
            ORDER BY price_cents DESC, o_orderkey
            LIMIT 20
        """,
        "tpch_q22_idle": """
            WITH pos AS (
              SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS s,
                     count(*)::BIGINT AS n
              FROM customer WHERE c_acctbal > 0)
            SELECT c_mktsegment,
                   sum(CAST(round(c_acctbal * 100) AS BIGINT)
                   )::BIGINT AS totacctbal_cents,
                   count(*)::BIGINT AS numcust
            FROM customer, pos
            WHERE CAST(round(c_acctbal * 100) AS BIGINT) * pos.n > pos.s
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_totalprice > 300000.0)
            GROUP BY c_mktsegment
        """,
        "kg_degree_hist": f"""
            WITH edges AS ({kg_edges_sql}),
            und AS (SELECT DISTINCT least(_from, _to) AS u,
                           greatest(_from, _to) AS v
                    FROM edges WHERE _from <> _to),
            arcs AS (SELECT u AS h FROM und UNION ALL SELECT v FROM und),
            d AS (SELECT h, count(*)::BIGINT AS deg FROM arcs GROUP BY h)
            SELECT deg, count(*)::BIGINT AS n_vertices
            FROM d GROUP BY deg
        """,
        "kg_edge_support": f"""
            WITH edges AS ({kg_edges_sql}),
            und AS (SELECT DISTINCT least(_from, _to) AS u,
                           greatest(_from, _to) AS v
                    FROM edges WHERE _from <> _to),
            tri AS (
              SELECT e1.u AS x, e1.v AS y, e2.v AS z
              FROM und e1
              JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
              JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v),
            te AS (
              SELECT x AS u, y AS v FROM tri
              UNION ALL SELECT x, z FROM tri
              UNION ALL SELECT y, z FROM tri)
            SELECT u, v, count(*)::BIGINT AS support
            FROM te GROUP BY u, v
        """,
        "kg_truss3": f"""
            WITH edges AS ({kg_edges_sql}),
            e0 AS (SELECT DISTINCT least(_from, _to) AS u,
                          greatest(_from, _to) AS v
                   FROM edges WHERE _from <> _to),
            t1 AS (SELECT a.u AS x, a.v AS y, b.v AS z FROM e0 a
                   JOIN e0 b ON b.u = a.u AND b.v > a.v
                   JOIN e0 c ON c.u = a.v AND c.v = b.v),
            s1 AS (SELECT u, v, count(*) AS sup FROM (
                     SELECT x AS u, y AS v FROM t1
                     UNION ALL SELECT x, z FROM t1
                     UNION ALL SELECT y, z FROM t1) GROUP BY u, v),
            e1 AS (SELECT e0.u, e0.v FROM e0
                   JOIN s1 ON s1.u = e0.u AND s1.v = e0.v WHERE sup >= 1),
            t2 AS (SELECT a.u AS x, a.v AS y, b.v AS z FROM e1 a
                   JOIN e1 b ON b.u = a.u AND b.v > a.v
                   JOIN e1 c ON c.u = a.v AND c.v = b.v),
            s2 AS (SELECT u, v, count(*) AS sup FROM (
                     SELECT x AS u, y AS v FROM t2
                     UNION ALL SELECT x, z FROM t2
                     UNION ALL SELECT y, z FROM t2) GROUP BY u, v),
            e2 AS (SELECT e1.u, e1.v FROM e1
                   JOIN s2 ON s2.u = e1.u AND s2.v = e1.v WHERE sup >= 1)
            SELECT u, v FROM e2
        """,
        "kg_squares": f"""
            WITH edges AS ({kg_edges_sql}),
            und AS (SELECT DISTINCT least(_from, _to) AS u,
                           greatest(_from, _to) AS v
                    FROM edges WHERE _from <> _to),
            arcs AS (SELECT u AS h, v AS x FROM und
                     UNION ALL SELECT v, u FROM und),
            pairs AS (
              SELECT a.x AS u, b.x AS v, count(*)::BIGINT AS cn
              FROM arcs a JOIN arcs b ON b.h = a.h AND b.x > a.x
              GROUP BY a.x, b.x
            )
            SELECT (COALESCE(sum(cn * (cn - 1) // 2), 0)::BIGINT // 2)
                       ::BIGINT AS n_squares
            FROM pairs
        """,
        "events_cusum": """
            WITH h AS (
              SELECT event_type,
                     (epoch_us(ts) // (3600::BIGINT * 1000000)) * 3600
                         AS cusum_hour,
                     count(*)::BIGINT AS n
              FROM events GROUP BY event_type, cusum_hour
            ),
            c AS (
              SELECT event_type, cusum_hour,
                     sum(n) OVER (PARTITION BY event_type
                                  ORDER BY cusum_hour) AS cum,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY cusum_hour) AS t,
                     sum(n) OVER (PARTITION BY event_type) AS s,
                     count(*) OVER (PARTITION BY event_type) AS tt
              FROM h
            ),
            d AS (
              SELECT event_type, cusum_hour,
                     abs(tt * cum - t * s)::BIGINT AS dstat,
                     row_number() OVER (
                         PARTITION BY event_type
                         ORDER BY abs(tt * cum - t * s) DESC,
                                  cusum_hour ASC) AS rn
              FROM c
            )
            SELECT event_type, cusum_hour, dstat FROM d WHERE rn = 1
        """,
        "docs_ttr": """
            WITH t AS (
              SELECT source,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(lower(text)),
                                                     '\\s+')
                     END AS toks
              FROM documents
            ),
            u AS (SELECT source, unnest(toks) AS token FROM t),
            c AS (SELECT source, token, count(*)::BIGINT AS n
                  FROM u GROUP BY source, token)
            SELECT source,
                   sum(n)::BIGINT AS n_tokens,
                   count(*)::BIGINT AS n_types,
                   sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT
                       AS n_hapax,
                   ((10000 * count(*))::BIGINT // sum(n)::BIGINT)::BIGINT
                       AS ttr_bp,
                   ((10000 * sum(CASE WHEN n = 1 THEN 1 ELSE 0 END))
                        ::BIGINT // count(*)::BIGINT)::BIGINT AS hapax_bp
            FROM c GROUP BY source
        """,
        "kg_edge_jaccard": f"""
            WITH edges AS ({kg_edges_sql}),
            und AS (SELECT DISTINCT least(_from, _to) AS u,
                           greatest(_from, _to) AS v
                    FROM edges WHERE _from <> _to),
            arcs AS (SELECT u AS a, v AS b FROM und
                     UNION ALL SELECT v, u FROM und),
            deg AS (SELECT a AS vtx, count(*)::BIGINT AS d
                    FROM arcs GROUP BY a),
            tri AS (
              SELECT e1.u AS x, e1.v AS y, e2.v AS z
              FROM und e1
              JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
              JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v),
            te AS (
              SELECT x AS u, y AS v FROM tri
              UNION ALL SELECT x, z FROM tri
              UNION ALL SELECT y, z FROM tri),
            sup AS (SELECT u, v, count(*)::BIGINT AS support
                    FROM te GROUP BY u, v),
            j AS (
              SELECT e.u, e.v, coalesce(s.support, 0)::BIGINT AS support,
                     d1.d AS du, d2.d AS dv
              FROM und e
              LEFT JOIN sup s ON s.u = e.u AND s.v = e.v
              JOIN deg d1 ON d1.vtx = e.u
              JOIN deg d2 ON d2.vtx = e.v)
            SELECT u, v, support,
                   ((10000 * support) // (du + dv - 2 - support))::BIGINT
                       AS jacc_bp
            FROM j WHERE du + dv - 2 - support > 0
        """,
        "kg_walks3": f"""
            WITH edges AS ({kg_edges_sql}),
            und AS (SELECT DISTINCT least(_from, _to) AS u,
                           greatest(_from, _to) AS v
                    FROM edges WHERE _from <> _to),
            arcs AS (SELECT u AS a, v AS b FROM und
                     UNION ALL SELECT v, u FROM und),
            h AS (SELECT a, b,
                         ('0x' || substr(md5(a || '>' || b), 1, 15))::BIGINT
                             AS hk
                  FROM arcs),
            nxt AS (SELECT a, b AS nxt FROM (
                      SELECT a, b,
                             row_number() OVER (PARTITION BY a
                                                ORDER BY hk, b) AS rn
                      FROM h) WHERE rn = 1),
            v AS (SELECT DISTINCT a AS vertex FROM arcs)
            SELECT v.vertex, n1.nxt AS w1, n2.nxt AS w2, n3.nxt AS w3
            FROM v
            JOIN nxt n1 ON n1.a = v.vertex
            JOIN nxt n2 ON n2.a = n1.nxt
            JOIN nxt n3 ON n3.a = n2.nxt
        """,
        "kg_assortativity": f"""
            WITH edges AS ({kg_edges_sql}),
            und AS (SELECT DISTINCT least(_from, _to) AS u,
                           greatest(_from, _to) AS v
                    FROM edges WHERE _from <> _to),
            arcs AS (SELECT u AS a, v AS b FROM und
                     UNION ALL SELECT v, u FROM und),
            deg AS (SELECT a AS vtx, count(*)::BIGINT AS d
                    FROM arcs GROUP BY a),
            q AS (SELECT d1.d AS x, d2.d AS y
                  FROM arcs
                  JOIN deg d1 ON d1.vtx = arcs.a
                  JOIN deg d2 ON d2.vtx = arcs.b),
            m AS (SELECT count(*)::HUGEINT AS n,
                         sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
                         sum(x * x)::HUGEINT AS sxx,
                         sum(y * y)::HUGEINT AS syy,
                         sum(x * y)::HUGEINT AS sxy
                  FROM q)
            SELECT n::BIGINT AS n_rows,
                   floor((10000 * (n * sxy - sx * sy))::DOUBLE
                         / sqrt((n * sxx - sx * sx)::DOUBLE
                                * (n * syy - sy * sy)::DOUBLE))::BIGINT
                       AS corr_bp
            FROM m
            WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        """,
        "embedding_centroid_dot": """
            WITH u AS (
              SELECT CAST(label AS BIGINT) AS label,
                     generate_subscripts(embedding, 1) - 1 AS dim,
                     CAST(trunc(unnest(embedding)::DOUBLE * 1000)
                          AS BIGINT) AS x_e3
              FROM embeddings),
            s AS (
              SELECT label, dim, sum(x_e3)::BIGINT AS s_e3
              FROM u GROUP BY label, dim)
            SELECT a.label AS label_a, b.label AS label_b,
                   sum(a.s_e3 * b.s_e3)::BIGINT AS dot_e6
            FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
            GROUP BY a.label, b.label
        """,
        "embedding_silhouette": """
            WITH u AS (
              SELECT vec_id, CAST(label AS BIGINT) AS label,
                     generate_subscripts(embedding, 1) - 1 AS dim,
                     CAST(trunc(unnest(embedding)::DOUBLE * 1000)
                          AS BIGINT) AS x_e3
              FROM embeddings),
            s AS (SELECT label, dim, sum(x_e3)::BIGINT AS s_e3,
                         count(*)::BIGINT AS n
                  FROM u GROUP BY label, dim),
            cen AS (SELECT label, dim,
                           ((s_e3 * 1000) // n)::BIGINT AS c_e6, n
                    FROM s),
            d AS (SELECT u.vec_id, u.label AS own, cen.label AS cl,
                         sum((u.x_e3 * 1000 - cen.c_e6)
                             * (u.x_e3 * 1000 - cen.c_e6))::BIGINT AS d2
                  FROM u JOIN cen ON cen.dim = u.dim
                  GROUP BY u.vec_id, u.label, cen.label),
            ab AS (SELECT vec_id, own,
                          max(CASE WHEN cl = own THEN d2 END) AS a,
                          min(CASE WHEN cl <> own THEN d2 END) AS b
                   FROM d GROUP BY vec_id, own),
            si AS (SELECT own AS label,
                          (10000 * (b - a))
                          // greatest(greatest(a, b), 1) AS s_e4
                   FROM ab)
            SELECT label, count(*)::BIGINT AS n,
                   (sum(s_e4) // count(*))::BIGINT AS avg_s_e4
            FROM si GROUP BY label
        """,
        "orders_percent_rank": """
            SELECT o_orderkey, o_orderpriority,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
                   (10000 * (rank() OVER w - 1))
                     // greatest(count(*) OVER (
                          PARTITION BY o_orderpriority) - 1, 1) AS prank_e4
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY CAST(round(o_totalprice * 100) AS BIGINT))
        """,
        "events_type_mode": """
            WITH c AS (
              SELECT user_id, event_type, count(*)::BIGINT AS n
              FROM events GROUP BY user_id, event_type),
            r AS (
              SELECT user_id, event_type, n,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY n DESC, event_type) AS rn
              FROM c)
            SELECT user_id, event_type, n FROM r WHERE rn = 1
        """,
        "events_dod_growth": """
            WITH c AS (
              SELECT event_type,
                     CAST(epoch(date_trunc('day', ts)) AS BIGINT)
                       // 86400 AS day,
                     count(*)::BIGINT AS n
              FROM events GROUP BY event_type, day)
            SELECT c.event_type, c.day, c.n, p.n AS n_prev,
                   (10000 * (c.n - p.n)) // p.n AS growth_bp
            FROM c JOIN c p
              ON c.event_type = p.event_type AND c.day = p.day + 1
        """,
        "events_rolling_users": """
            WITH ph AS (
              SELECT DISTINCT
                     CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                       // 3600 AS h,
                     user_id
              FROM events),
            hours AS (SELECT DISTINCT h FROM ph)
            SELECT hours.h AS window_hour,
                   count(DISTINCT ph.user_id)::BIGINT AS n_users
            FROM hours JOIN ph
              ON ph.h BETWEEN hours.h - 23 AND hours.h
            GROUP BY hours.h
        """,
        "docs_readability": """
            SELECT doc_id,
                   len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_words,
                   length(regexp_replace(text, '[^.!?]', '', 'g')
                   )::BIGINT AS n_sents,
                   (10000 * len(regexp_extract_all(text, '\\S+')))
                     // greatest(length(regexp_replace(text, '[^.!?]', '',
                                                       'g')), 1)
                     AS wps_e4,
                   (10000 * len(regexp_extract_all(text,
                                                   '[aeiouAEIOU]+')))
                     // greatest(len(regexp_extract_all(text, '\\S+')), 1)
                     AS spw_e4
            FROM documents
        """,
        "part_skyline": """
            WITH agg AS (
              SELECT l_partkey,
                     sum(CAST(l_quantity AS BIGINT))::BIGINT AS qty_sum,
                     sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                     )::BIGINT AS revenue_e4
              FROM lineitem GROUP BY l_partkey)
            SELECT p.l_partkey, p.qty_sum, p.revenue_e4
            FROM agg p
            WHERE NOT EXISTS (
              SELECT 1 FROM agg q
              WHERE q.qty_sum >= p.qty_sum AND q.revenue_e4 >= p.revenue_e4
                AND (q.qty_sum > p.qty_sum OR q.revenue_e4 > p.revenue_e4))
        """,
        "customer_orders_full": """
            WITH slice AS (
              SELECT c_custkey, c_mktsegment FROM customer
              WHERE c_custkey % 3 = 0
            ),
            counts AS (
              SELECT o_custkey AS c_custkey, count(*)::BIGINT AS n_orders
              FROM orders GROUP BY o_custkey
            )
            SELECT c_custkey, c_mktsegment, n_orders
            FROM slice FULL OUTER JOIN counts USING (c_custkey)
        """,
        "docs_except_early": """
            SELECT DISTINCT lang, source FROM documents
            EXCEPT
            SELECT DISTINCT lang, source FROM documents WHERE doc_id < 50
        """,
        "docs_intersect_early": """
            SELECT DISTINCT lang, source FROM documents
            INTERSECT
            SELECT DISTINCT lang, source FROM documents WHERE doc_id < 50
        """,
        # equi-depth binning: decile cutpoints (quantile_disc = the
        # proven percentile_disc spec), bin = #cutpoints < v
        "lineitem_quantile_bins": """
            WITH v AS (
              SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                     AS c
              FROM lineitem
            ),
            cuts AS (
              SELECT unnest([
                quantile_disc(c, 0.1), quantile_disc(c, 0.2),
                quantile_disc(c, 0.3), quantile_disc(c, 0.4),
                quantile_disc(c, 0.5), quantile_disc(c, 0.6),
                quantile_disc(c, 0.7), quantile_disc(c, 0.8),
                quantile_disc(c, 0.9)]) AS cut
              FROM v
            ),
            vc AS (SELECT c, count(*)::BIGINT AS cnt FROM v GROUP BY c),
            b AS (
              SELECT c, cnt,
                     (SELECT count(*) FROM cuts WHERE cut < vc.c)
                     ::BIGINT AS bin
              FROM vc
            )
            SELECT bin, sum(cnt)::BIGINT AS n, min(c)::BIGINT AS min_v,
                   max(c)::BIGINT AS max_v
            FROM b GROUP BY bin
        """,
        # range join: containment in epoch-us integers — the SQL
        # inequality join the tiled plan reproduces exactly
        "lineitem_interval_join": """
            WITH iv AS (
              SELECT o_orderkey AS interval_id,
                     epoch_us(o_orderdate) AS lo,
                     epoch_us(o_orderdate)
                       + 86400000000 * (o_orderkey % 14 + 1) AS hi
              FROM orders WHERE o_orderkey % 97 = 0
            )
            SELECT interval_id,
                   sum(CAST(round(l_quantity * 100, 0) AS BIGINT))
                     ::BIGINT AS qty_e2,
                   count(*)::BIGINT AS n_rows
            FROM iv JOIN lineitem
              ON epoch_us(l_shipdate) >= lo AND epoch_us(l_shipdate) < hi
            GROUP BY interval_id
        """,
        "lineitem_price_quantiles": """
            WITH c AS (
              SELECT l_returnflag,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
              FROM lineitem
            )
            SELECT l_returnflag,
                   quantile_disc(pc, 0.5) AS p50,
                   quantile_disc(pc, 0.9) AS p90,
                   quantile_disc(pc, 0.99) AS p99
            FROM c GROUP BY l_returnflag
        """,
        "docs_jaccard_top10": """
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text), '\\s+')
                     END AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id,
                     CASE WHEN len(toks) = 0 THEN []::VARCHAR[]
                          WHEN len(toks) < 3
                               THEN [array_to_string(toks, ' ')]
                          ELSE list_distinct(list_transform(
                                 range(1, len(toks) - 1),
                                 i -> toks[i] || ' ' || toks[i+1] || ' '
                                      || toks[i+2]))
                     END AS gs
              FROM t
            ),
            q AS (SELECT gs AS qg FROM g WHERE doc_id = 0),
            j AS (
              SELECT g.doc_id,
                     len(list_intersect(g.gs, q.qg))::BIGINT AS n_inter,
                     (len(g.gs) + len(q.qg)
                      - len(list_intersect(g.gs, q.qg)))::BIGINT AS n_union
              FROM g, q WHERE g.doc_id <> 0
            )
            SELECT doc_id, n_inter, n_union,
                   (10000 * n_inter) // n_union AS jaccard_bp
            FROM j
            ORDER BY jaccard_bp DESC, doc_id ASC
            LIMIT 10
        """,
        "events_running_sum": """
            SELECT user_id, ts, value, event_id,
                   round(SUM(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ), 4) AS cum_value
            FROM events
        """,
        "events_distinct_users": """
            SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
            FROM events GROUP BY event_type
        """,
        "export_vertex_projection": """
            SELECT 'customer/' || c_custkey AS _id,
                   'customer' AS "@collection_name",
                   c_acctbal, c_name
            FROM customer
        """,
        "export_vertex_missing_field": """
            SELECT 'customer/' || c_custkey AS _id,
                   c_name, CAST(NULL AS VARCHAR) AS nickname
            FROM customer
        """,
        "export_edge_projection": """
            SELECT 'customer/' || o_custkey AS _from,
                   'orders/' || o_orderkey AS _to,
                   'orders_rel' AS "@collection_name",
                   o_totalprice
            FROM orders
        """,
        "export_load_all_vertices": """
            SELECT 'customer/' || c_custkey AS _id,
                   CAST(c_custkey AS VARCHAR) AS _key,
                   c_name, c_acctbal
            FROM customer
        """,
        "dedup_exact_documents": f"""
            WITH doubled AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + {_OFFSET}, text FROM documents
            )
            SELECT min(doc_id) AS doc_id, text FROM doubled GROUP BY text
        """,
        "dedup_minhash_survivors": f"""
            WITH doubled AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + {_OFFSET}, text FROM documents
            ),
            reps AS (SELECT min(doc_id) AS keep FROM doubled GROUP BY text)
            SELECT doc_id, text FROM doubled
            WHERE doc_id IN (SELECT keep FROM reps)
        """,
        "dedup_clusters": f"""
            WITH tripled AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + {_OFFSET}, text FROM documents
              UNION ALL
              SELECT doc_id + {2 * _OFFSET}, text FROM documents
            )
            SELECT doc_id,
                   (min(doc_id) OVER (PARTITION BY text))::BIGINT
                       AS cluster_id
            FROM tripled
        """,
        "dedup_embedding_pairs": f"""
            SELECT vec_id AS id_a, vec_id + {_OFFSET} AS id_b FROM embeddings
        """,
        # sentence split on the literal '. ' + space-trim, empties
        # dropped — bit-identical to dedup.sentence_dedup_stats
        "dedup_sentences": """
            WITH ex AS (
              SELECT source,
                     trim(unnest(string_split(text, '. '))) AS sent
              FROM documents
            ), cnt AS (
              SELECT source, sent, count(*)::BIGINT AS n
              FROM ex WHERE sent <> '' GROUP BY source, sent
            )
            SELECT source,
                   sum(n)::BIGINT AS n_sentences,
                   count(*)::BIGINT AS n_distinct,
                   ((10000 * (sum(n) - count(*)))::BIGINT
                       // sum(n)::BIGINT)::BIGINT AS dup_bp
            FROM cnt GROUP BY source
        """,
        # the REAL simhash recomputed in SQL: 60-bit md5 token hashes,
        # per-bit ±1 vote sums, bit set when the sum is positive —
        # bit-for-bit the raygraph.ops.dedup.simhash_batch signature
        "dedup_simhash": f"""
            WITH doubled AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + {_OFFSET}, text FROM documents
            ),
            t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text), '\\s+')
                     END AS toks
              FROM doubled
            ),
            h AS (
              SELECT doc_id,
                     list_transform(toks,
                       t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS ths
              FROM t
            ),
            s AS (SELECT doc_id, {_simhash_sql_expr()} AS simhash FROM h)
            SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS n_dups
            FROM s GROUP BY simhash
        """,
        # the REAL AllPairs prefix filter replayed in SQL: distinct
        # tokens per doc ordered by (md5(token), token), prefix length
        # c - ceil(t·c) + 1, candidates = pairs sharing a prefix token,
        # verify = exact integer jaccard_bp — identical semantics to
        # raygraph.ops.dedup.jaccard_threshold_pairs
        # deletion-vector semantics == predicate delete
        "docs_with_deletes": """
            SELECT doc_id, n_chars FROM documents
            WHERE doc_id % 7 <> 0
        """,
        # ExactSubstr profile: 8-gram window via 7 leads, the gram
        # string as its own key, dup = >=2 distinct docs, coverage =
        # distinct fanned positions — mirrors
        # dedup.duplicate_ngram_stats exactly
        "docs_exact_substrings": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + {_OFFSET},
                     coalesce(text, '')
                     || ' shared tail marker alpha beta gamma delta '
                     || 'epsilon zeta eta theta'
              FROM documents WHERE doc_id % 3 = 0
            ),
            t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(
                              trim(lower(text)), '\\s+') END AS toks
              FROM corpus
            ),
            u AS (SELECT doc_id, unnest(toks) AS tok,
                         generate_subscripts(toks, 1) AS pos FROM t),
            g AS (
              SELECT doc_id, pos,
                     tok || ' ' || lead(tok, 1) OVER w
                         || ' ' || lead(tok, 2) OVER w
                         || ' ' || lead(tok, 3) OVER w
                         || ' ' || lead(tok, 4) OVER w
                         || ' ' || lead(tok, 5) OVER w
                         || ' ' || lead(tok, 6) OVER w
                         || ' ' || lead(tok, 7) OVER w AS gram
              FROM u WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
            ),
            h AS (SELECT doc_id, pos, gram AS gh FROM g
                  WHERE gram IS NOT NULL),
            dup AS (SELECT gh FROM (
                      SELECT gh, count(DISTINCT doc_id) AS ndocs
                      FROM h GROUP BY gh) WHERE ndocs >= 2),
            occ AS (SELECT h.doc_id, h.pos FROM h JOIN dup USING (gh)),
            cov AS (SELECT DISTINCT o.doc_id, o.pos + r.range AS idx
                    FROM occ o CROSS JOIN range(0, 8) r),
            pcov AS (SELECT doc_id, count(*)::BIGINT AS n_dup
                     FROM cov GROUP BY doc_id),
            tn AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens FROM t)
            SELECT tn.doc_id, tn.n_tokens,
                   coalesce(pcov.n_dup, 0)::BIGINT AS n_dup_tokens,
                   (CASE WHEN tn.n_tokens = 0 THEN 0
                         ELSE (10000 * coalesce(pcov.n_dup, 0))
                              // tn.n_tokens END)::BIGINT AS dup_bp
            FROM tn LEFT JOIN pcov USING (doc_id)
        """,
        # ExactSubstr REMOVAL replayed: same corpus/gram/dup/occ chain,
        # kept = tokens with NO covering hit start (pos-7..pos), cleaned
        # text = string_agg in position order
        "docs_dedup_clean": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + {_OFFSET},
                     coalesce(text, '')
                     || ' shared tail marker alpha beta gamma delta '
                     || 'epsilon zeta eta theta'
              FROM documents WHERE doc_id % 3 = 0
            ),
            t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(
                              trim(lower(text)), '\\s+') END AS toks
              FROM corpus
            ),
            u AS (SELECT doc_id, unnest(toks) AS tok,
                         generate_subscripts(toks, 1) AS pos FROM t),
            g AS (
              SELECT doc_id, pos,
                     tok || ' ' || lead(tok, 1) OVER w
                         || ' ' || lead(tok, 2) OVER w
                         || ' ' || lead(tok, 3) OVER w
                         || ' ' || lead(tok, 4) OVER w
                         || ' ' || lead(tok, 5) OVER w
                         || ' ' || lead(tok, 6) OVER w
                         || ' ' || lead(tok, 7) OVER w AS gram
              FROM u WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
            ),
            h AS (SELECT doc_id, pos, gram AS gh FROM g
                  WHERE gram IS NOT NULL),
            dup AS (SELECT gh FROM (
                      SELECT gh, count(DISTINCT doc_id) AS ndocs
                      FROM h GROUP BY gh) WHERE ndocs >= 2),
            occ AS MATERIALIZED (
              SELECT h.doc_id, h.pos FROM h JOIN dup USING (gh)),
            kept AS (
              SELECT u.doc_id, u.pos, u.tok FROM u
              WHERE NOT EXISTS (
                SELECT 1 FROM occ o
                WHERE o.doc_id = u.doc_id
                  AND o.pos BETWEEN u.pos - 7 AND u.pos)
            ),
            k AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
                         string_agg(tok, ' ' ORDER BY pos)
                             AS clean_text
                  FROM kept GROUP BY doc_id)
            SELECT d.doc_id, coalesce(k.n_kept, 0)::BIGINT AS n_kept,
                   coalesce(k.clean_text, '') AS clean_text
            FROM (SELECT doc_id FROM corpus) d LEFT JOIN k USING (doc_id)
        """,
        # ER clusters: strong pairs -> unrolled min-label components ->
        # cluster-size histogram (composed from _components_sql)
        "dedup_er_clusters": (
            "SELECT size, count(*)::BIGINT AS n_clusters FROM ("
            "SELECT component, count(*)::BIGINT AS size FROM ("
            + _components_sql(
                """(WITH d AS (
                      SELECT doc_id, lang, source, n_chars,
                             lower(substr(coalesce(text, ''), 1, 16))
                             AS k
                      FROM documents),
                    r AS (
                      SELECT doc_id, lang, source, n_chars,
                             row_number() OVER (ORDER BY k, doc_id)
                             AS rn
                      FROM d)
                    SELECT a.doc_id::VARCHAR AS _from,
                           b.doc_id::VARCHAR AS _to
                    FROM r a JOIN r b
                    ON b.rn > a.rn AND b.rn - a.rn <= 3
                    WHERE (CASE WHEN a.lang = b.lang THEN 40 ELSE 0 END
                           + CASE WHEN a.source = b.source
                                  THEN 30 ELSE 0 END
                           + CASE WHEN abs(a.n_chars - b.n_chars) <= 8
                                  THEN 20 ELSE 0 END) >= 70)
                """, iters=5)
            + ") GROUP BY component) GROUP BY size"),
        # sorted-neighborhood blocking: rank by (key, id), pairs within
        # a 3-row window — mirrors raygraph.ops.dedup.
        # sorted_neighborhood_pairs (rank base cancels in the gap)
        "dedup_sn_pairs": """
            WITH d AS (
              SELECT doc_id,
                     lower(substr(coalesce(text, ''), 1, 16)) AS k
              FROM documents
            ),
            r AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY k, doc_id) AS rn
              FROM d
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   (b.rn - a.rn)::BIGINT AS gap
            FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn <= 3
        """,
        # Fellegi–Sunter agreement scoring over the sorted-neighborhood
        # window: same rank CTE + two attribute joins, integer weights
        "dedup_er_scores": """
            WITH d AS (
              SELECT doc_id, lang, source, n_chars,
                     lower(substr(coalesce(text, ''), 1, 16)) AS k
              FROM documents
            ),
            r AS (
              SELECT doc_id, lang, source, n_chars,
                     row_number() OVER (ORDER BY k, doc_id) AS rn
              FROM d
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   (CASE WHEN a.lang = b.lang THEN 40 ELSE 0 END
                    + CASE WHEN a.source = b.source THEN 30 ELSE 0 END
                    + CASE WHEN abs(a.n_chars - b.n_chars) <= 8
                           THEN 20 ELSE 0 END)::BIGINT AS score
            FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn <= 3
        """,
        "dedup_jaccard_pairs": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + {_OFFSET}, text || ' zq' FROM documents
            ),
            t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(lower(text)),
                                                     '\\s+')
                     END AS toks
              FROM corpus
            ),
            dt AS (SELECT DISTINCT doc_id, unnest(toks) AS token FROM t),
            cnt AS (SELECT doc_id, count(*)::BIGINT AS c FROM dt
                    GROUP BY doc_id),
            rk AS (
              SELECT doc_id, token,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY md5(token), token) AS rn
              FROM dt
            ),
            pf AS (
              SELECT r.doc_id, r.token
              FROM rk r JOIN cnt USING (doc_id)
              WHERE r.rn <= c - (8000 * c + 9999) // 10000 + 1
            ),
            -- BUCKET_PAIR_CAP replayed: per prefix token only the first
            -- 512 doc ids (sorted) pair up, exactly _bucket_pairs
            pfr AS (
              SELECT doc_id, token,
                     row_number() OVER (PARTITION BY token
                                        ORDER BY doc_id) AS tr
              FROM pf
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM pfr a JOIN pfr b
                ON a.token = b.token AND a.doc_id < b.doc_id
               AND a.tr <= 512 AND b.tr <= 512
            ),
            inter AS (
              SELECT cd.id_a, cd.id_b, count(*)::BIGINT AS i
              FROM cand cd
              JOIN dt x ON x.doc_id = cd.id_a
              JOIN dt y ON y.doc_id = cd.id_b AND y.token = x.token
              GROUP BY cd.id_a, cd.id_b
            )
            SELECT iv.id_a, iv.id_b,
                   (10000 * iv.i) // (ca.c + cb.c - iv.i) AS jaccard_bp
            FROM inter iv
            JOIN cnt ca ON ca.doc_id = iv.id_a
            JOIN cnt cb ON cb.doc_id = iv.id_b
            WHERE (10000 * iv.i) // (ca.c + cb.c - iv.i) >= 8000
        """,
        # the REAL banded hamming join replayed in SQL: signatures
        # recomputed bit-for-bit, candidates = pairs agreeing on any of
        # the four 15-bit chunks (the pigeonhole band), verify =
        # popcount of xor — identical semantics to
        # raygraph.ops.dedup.simhash_hamming_pairs
        "dedup_simhash_pairs": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + {_OFFSET}, text FROM documents
              UNION ALL
              SELECT doc_id + {2 * _OFFSET}, text || ' zq' FROM documents
            ),
            t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text), '\\s+')
                     END AS toks
              FROM corpus
            ),
            h AS (
              SELECT doc_id,
                     list_transform(toks,
                       t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS ths
              FROM t
            ),
            s AS (SELECT doc_id, {_simhash_sql_expr()} AS simhash FROM h)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
            FROM s a JOIN s b ON a.doc_id < b.doc_id
             AND ( ((a.simhash >> 0) & 32767) = ((b.simhash >> 0) & 32767)
                OR ((a.simhash >> 15) & 32767) = ((b.simhash >> 15) & 32767)
                OR ((a.simhash >> 30) & 32767) = ((b.simhash >> 30) & 32767)
                OR ((a.simhash >> 45) & 32767) = ((b.simhash >> 45) & 32767))
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        "text_quality": _TOKS_CTE + f"""
            , s AS (
              SELECT doc_id, n_chars, n_punct,
                     len(toks) AS n_tok,
                     len(list_filter(toks,
                         x -> list_contains({stop['en']}, x))) AS stop_hits,
                     len(list_distinct(toks)) AS n_uniq
              FROM t
            )
            SELECT doc_id,
                   floor(10000.0 * (
                       0.35 * least(n_chars / 500.0, 1.0)
                     + 0.25 * least((stop_hits / greatest(n_tok, 1)) * 4,
                                    1.0)
                     + 0.2 * (n_uniq / greatest(n_tok, 1))
                     + 0.2 * (1 - least((n_punct / greatest(n_chars, 1)) * 5,
                                        1.0))
                   )) / 10000.0 AS quality
            FROM s
        """,
        # per-lang 40th-percentile quality budget: shared quality
        # formula + quantile_disc threshold + ties-kept filter
        "docs_quality_prune": _TOKS_CTE + f"""
            , s AS (
              SELECT t.doc_id, d.lang,
                     CAST(floor(10000.0 * (
                         0.35 * least(t.n_chars / 500.0, 1.0)
                       + 0.25 * least((len(list_filter(t.toks,
                             x -> list_contains({stop['en']}, x)))
                             / greatest(len(t.toks), 1)) * 4, 1.0)
                       + 0.2 * (len(list_distinct(t.toks))
                             / greatest(len(t.toks), 1))
                       + 0.2 * (1 - least((t.n_punct
                             / greatest(t.n_chars, 1)) * 5, 1.0))
                     )) AS BIGINT) AS q_e4
              FROM t JOIN documents d USING (doc_id)
            ),
            thr AS (SELECT lang, quantile_disc(q_e4, 0.4) AS tq
                    FROM s GROUP BY lang)
            SELECT s.doc_id, s.lang, s.q_e4
            FROM s JOIN thr USING (lang)
            WHERE s.q_e4 >= thr.tq
        """,
        "docs_curate_spec": _TOKS_CTE + f"""
            , s AS (
              SELECT doc_id, n_chars,
                     floor(10000.0 * (
                         0.35 * least(n_chars / 500.0, 1.0)
                       + 0.25 * least((len(list_filter(toks,
                             x -> list_contains({stop['en']}, x)))
                             / greatest(len(toks), 1)) * 4, 1.0)
                       + 0.2 * (len(list_distinct(toks))
                             / greatest(len(toks), 1))
                       + 0.2 * (1 - least((n_punct
                             / greatest(n_chars, 1)) * 5, 1.0))
                     )) / 10000.0 AS quality
              FROM t
            ),
            f1 AS (SELECT doc_id FROM t WHERE n_chars >= 100),
            f2 AS (SELECT s.doc_id FROM s JOIN f1 USING (doc_id)
                   WHERE s.quality >= 0.5),
            f3 AS (SELECT count(DISTINCT d.text)::BIGINT AS n
                   FROM documents d JOIN f2 USING (doc_id))
            SELECT 'length_filter' AS stage,
                   (SELECT count(*) FROM f1)::BIGINT AS rows_out
            UNION ALL SELECT 'quality_filter',
                   (SELECT count(*) FROM f2)::BIGINT
            UNION ALL SELECT 'exact_dedup', (SELECT n FROM f3)
        """,
        "text_lang_id": _TOKS_CTE + f"""
            , s AS (
              SELECT doc_id,
                len(list_filter(toks, x -> list_contains({stop['en']}, x))) AS en,
                len(list_filter(toks, x -> list_contains({stop['fr']}, x))) AS fr,
                len(list_filter(toks, x -> list_contains({stop['de']}, x))) AS de,
                len(list_filter(toks, x -> list_contains({stop['es']}, x))) AS es,
                len(list_filter(toks, x -> list_contains({stop['zh']}, x))) AS zh
              FROM t
            )
            SELECT doc_id,
                   CASE WHEN greatest(en, fr, de, es, zh) = 0 THEN 'und'
                        WHEN en >= fr AND en >= de AND en >= es AND en >= zh
                             THEN 'en'
                        WHEN fr >= de AND fr >= es AND fr >= zh THEN 'fr'
                        WHEN de >= es AND de >= zh THEN 'de'
                        WHEN es >= zh THEN 'es'
                        ELSE 'zh' END AS lang_pred
            FROM s
        """,
        "docs_lang_confusion": _TOKS_CTE + f"""
            , s AS (
              SELECT doc_id,
                len(list_filter(toks, x -> list_contains({stop['en']}, x))) AS en,
                len(list_filter(toks, x -> list_contains({stop['fr']}, x))) AS fr,
                len(list_filter(toks, x -> list_contains({stop['de']}, x))) AS de,
                len(list_filter(toks, x -> list_contains({stop['es']}, x))) AS es,
                len(list_filter(toks, x -> list_contains({stop['zh']}, x))) AS zh
              FROM t
            ),
            p AS (
              SELECT doc_id,
                     CASE WHEN greatest(en, fr, de, es, zh) = 0 THEN 'und'
                          WHEN en >= fr AND en >= de AND en >= es
                               AND en >= zh THEN 'en'
                          WHEN fr >= de AND fr >= es AND fr >= zh THEN 'fr'
                          WHEN de >= es AND de >= zh THEN 'de'
                          WHEN es >= zh THEN 'es'
                          ELSE 'zh' END AS lang_pred
              FROM s
            )
            SELECT d.lang, p.lang_pred, count(*)::BIGINT AS n
            FROM documents d JOIN p USING (doc_id)
            GROUP BY d.lang, p.lang_pred
        """,
        # Horner fold of 60-bit md5 token hashes, h = (h*F + th) mod 2^63,
        # exactly FP_INIT/FP_MULT in raygraph.ops.text.doc_fingerprint
        # winnowing replayed window by window: word-3-gram md5-60bit
        # hashes, per-window rightmost-min (gh ASC, pos DESC), distinct
        # (pos, hash) fingerprints, HUGEINT checksum mod 10^15
        "docs_winnow": f"""
            WITH {_winnow_sel_sql("documents")},
            agg AS (SELECT doc_id, count(*)::BIGINT AS n_fp,
                           (sum(gh::HUGEINT)
                            % 1000000000000000)::BIGINT AS fp_cksum
                    FROM sel GROUP BY doc_id)
            SELECT d.doc_id, coalesce(a.n_fp, 0)::BIGINT AS n_fp,
                   coalesce(a.fp_cksum, 0)::BIGINT AS fp_cksum
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        # MOSS pair detection: distinct (doc, fp) per side, pair count =
        # shared-fingerprint count, threshold 3; doubled corpus makes
        # every (i, i+OFFSET) an exact-dup pair with full fp overlap
        "dedup_winnow_pairs": f"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + {_OFFSET}, text FROM documents
            ),
            {_winnow_sel_sql("corpus")},
            fpd AS (SELECT DISTINCT doc_id, gh FROM sel)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   count(*)::BIGINT AS shared
            FROM fpd a JOIN fpd b
              ON a.gh = b.gh AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
            HAVING count(*) >= 3
        """,
        # asymmetric containment pairs: distinct trigrams per doc over
        # documents ∪ 8-word prefix snippets (id + 1e8, every 7th doc);
        # exact |A∩B| via the distinct-gram self-join, integer e6
        # containments, keep max(cont) >= 0.8
        "docs_containment_pairs": """
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000000 AS doc_id,
                     array_to_string(list_slice(
                         regexp_split_to_array(trim(lower(text)),
                                               '\\s+'), 1, 8),
                         ' ') AS text
              FROM documents WHERE doc_id % 7 = 0
            ),
            t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(lower(text)),
                                                     '\\s+')
                     END AS toks
              FROM corpus
            ),
            u AS (SELECT doc_id, unnest(toks) AS tok,
                         generate_subscripts(toks, 1) AS pos FROM t),
            g AS (
              SELECT doc_id,
                     tok || ' ' || lead(tok, 1) OVER w
                         || ' ' || lead(tok, 2) OVER w AS gram
              FROM u WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
            ),
            d AS MATERIALIZED (
              SELECT DISTINCT doc_id, gram FROM g WHERE gram IS NOT NULL
            ),
            sz AS (SELECT doc_id, count(*)::BIGINT AS ng
                   FROM d GROUP BY doc_id),
            ip AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*)::BIGINT AS inter
              FROM d a JOIN d b
                ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT i.id_a, i.id_b, i.inter,
                   sa.ng AS n_a, sb.ng AS n_b,
                   ((1000000 * i.inter) // sa.ng)::BIGINT AS cont_a_e6,
                   ((1000000 * i.inter) // sb.ng)::BIGINT AS cont_b_e6
            FROM ip i
            JOIN sz sa ON sa.doc_id = i.id_a
            JOIN sz sb ON sb.doc_id = i.id_b
            WHERE greatest((1000000 * i.inter) // sa.ng,
                           (1000000 * i.inter) // sb.ng) >= 800000
        """,
        # incremental dedup: odd-id delta deduped within itself (min
        # doc_id per text) and against the even-id base epoch's
        # distinct-text index
        "docs_incremental_dedup": """
            WITH w AS (
              SELECT min(doc_id) AS doc_id, text FROM documents
              WHERE doc_id % 2 = 1 GROUP BY text
            )
            SELECT doc_id, text FROM w
            WHERE text NOT IN (SELECT text FROM documents
                               WHERE doc_id % 2 = 0)
        """,
        # group-scoped exact dedup: min-id per (lang, text), output
        # (doc_id, text) — the group is a dedup key, not carried
        "dedup_exact_grouped": f"""
            WITH doubled AS (
              SELECT doc_id, text, lang FROM documents
              UNION ALL
              SELECT doc_id + {_OFFSET} AS doc_id, text,
                     CASE WHEN doc_id % 2 = 0 THEN lang
                          ELSE lang || '_x' END AS lang
              FROM documents
            )
            SELECT min(doc_id) AS doc_id, text FROM doubled
            GROUP BY lang, text
        """,
        # group-scoped near-dedup: even-id copies keep lang (in-group
        # dup, dropped), odd-id copies get lang||'_x' (cross-group,
        # survive); verified dup == text equality within a group on
        # this corpus → replay = min-id per (lang, text)
        "dedup_minhash_grouped": f"""
            WITH doubled AS (
              SELECT doc_id, text, lang FROM documents
              UNION ALL
              SELECT doc_id + {_OFFSET} AS doc_id, text,
                     CASE WHEN doc_id % 2 = 0 THEN lang
                          ELSE lang || '_x' END AS lang
              FROM documents
            ),
            reps AS (SELECT min(doc_id) AS keep FROM doubled
                     GROUP BY lang, text)
            SELECT doc_id, text, lang FROM doubled
            WHERE doc_id IN (SELECT keep FROM reps)
        """,
        # incremental minhash: delta = odds ∪ +OFFSET copies of every
        # 4th doc ∪ +2·OFFSET copies of doc_id%4==1; verified near-dup
        # == text equality on this corpus, so replay = NOT IN base,
        # then min-id per text within the delta
        "docs_minhash_incremental": f"""
            WITH delta AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
              UNION ALL
              SELECT doc_id + {_OFFSET} AS doc_id, text FROM documents
              WHERE doc_id % 4 = 0
              UNION ALL
              SELECT doc_id + {2 * _OFFSET} AS doc_id, text
              FROM documents WHERE doc_id % 4 = 1
            ),
            after_a AS (
              SELECT doc_id, text FROM delta
              WHERE text NOT IN (SELECT text FROM documents
                                 WHERE doc_id % 2 = 0)
            ),
            reps AS (SELECT min(doc_id) AS keep FROM after_a
                     GROUP BY text)
            SELECT doc_id, text FROM after_a
            WHERE doc_id IN (SELECT keep FROM reps)
        """,
        # per-domain line dedup: df count and drop scoped to lang
        "docs_line_dedup_grouped": """
            WITH corpus AS (
              SELECT doc_id, lang,
                     coalesce(text, '') || chr(10)
                     || CASE WHEN doc_id % 2 = 0
                             THEN 'shared ' || lang
                        ELSE 'only ' || doc_id::VARCHAR END
                     || chr(10)
                     || CASE WHEN doc_id % 50 = 0
                             THEN 'rare global banner'
                        ELSE 'tail ' || doc_id::VARCHAR END AS text
              FROM documents
            ),
            lines AS (
              SELECT doc_id, lang,
                     unnest(string_split(text, chr(10))) AS line,
                     generate_subscripts(string_split(text, chr(10)),
                                         1) AS idx
              FROM corpus
            ),
            keyed AS (
              SELECT doc_id, lang, idx, line,
                     lower(trim(line, ' ' || chr(9) || chr(13))) AS lk
              FROM lines
            ),
            dup AS (
              SELECT lang, lk FROM keyed WHERE lk <> ''
              GROUP BY lang, lk HAVING count(DISTINCT doc_id) >= 2
            ),
            marked AS (
              SELECT k.doc_id, k.idx, k.line,
                     (k.lk <> '' AND EXISTS (
                         SELECT 1 FROM dup d
                         WHERE d.lang = k.lang AND d.lk = k.lk))
                         AS dropped
              FROM keyed k
            )
            SELECT doc_id,
                   count(*)::BIGINT AS n_lines,
                   sum(CASE WHEN dropped THEN 1 ELSE 0 END)::BIGINT
                       AS n_dropped,
                   coalesce(string_agg(
                       CASE WHEN NOT dropped THEN line END, chr(10)
                       ORDER BY idx), '') AS clean_text
            FROM marked GROUP BY doc_id
        """,
        # CCNet line dedup: 3-line corpus (text / footer / tail with
        # shared-boilerplate variants), normalized key = strip(' \t\r')
        # + lower, drop keys in >= 2 distinct docs, reassemble original
        # lines in order
        "docs_line_dedup": """
            WITH corpus AS (
              SELECT doc_id,
                     coalesce(text, '') || chr(10)
                     || CASE WHEN doc_id % 3 = 0 THEN
                            CASE WHEN doc_id % 2 = 0
                                 THEN 'Subscribe to our Newsletter'
                                 ELSE 'subscribe to our newsletter '
                            END
                        ELSE 'unique footer ' || doc_id::VARCHAR END
                     || chr(10)
                     || CASE WHEN doc_id % 5 = 0
                             THEN 'COOKIE notice: accept all'
                        ELSE 'tail ' || doc_id::VARCHAR END AS text
              FROM documents
            ),
            lines AS (
              SELECT doc_id,
                     unnest(string_split(text, chr(10))) AS line,
                     generate_subscripts(string_split(text, chr(10)),
                                         1) AS idx
              FROM corpus
            ),
            keyed AS (
              SELECT doc_id, idx, line,
                     lower(trim(line, ' ' || chr(9) || chr(13))) AS lk
              FROM lines
            ),
            dup AS (
              SELECT lk FROM keyed WHERE lk <> ''
              GROUP BY lk HAVING count(DISTINCT doc_id) >= 2
            ),
            marked AS (
              SELECT k.doc_id, k.idx, k.line,
                     (k.lk <> '' AND k.lk IN (SELECT lk FROM dup))
                         AS dropped
              FROM keyed k
            )
            SELECT doc_id,
                   count(*)::BIGINT AS n_lines,
                   sum(CASE WHEN dropped THEN 1 ELSE 0 END)::BIGINT
                       AS n_dropped,
                   coalesce(string_agg(
                       CASE WHEN NOT dropped THEN line END, chr(10)
                       ORDER BY idx), '') AS clean_text
            FROM marked GROUP BY doc_id
        """,
        "text_fingerprints": """
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text), '\\s+')
                     END AS toks
              FROM documents
            )
            SELECT doc_id,
                   list_reduce(
                     list_concat(
                       [1469598103934665603::BIGINT],
                       list_transform(toks,
                         t -> ('0x' || substr(md5(t), 1, 15))::BIGINT)),
                     (a, b) -> ((a::HUGEINT * 1099511628211 + b)
                                % 9223372036854775808)::BIGINT
                   ) AS fingerprint
            FROM t
        """,
        "media_frames": """
            WITH m AS (
              SELECT 'media/' || doc_id AS media_ref, text,
                     length(text) AS L
              FROM documents
            ),
            f AS (
              SELECT media_ref, text,
                     unnest(range(0, greatest(L // 64, 1), 2)) AS frame_idx
              FROM m
            )
            SELECT media_ref, frame_idx::BIGINT AS frame_idx,
                   length(substr(text, frame_idx * 64 + 1, 64))::BIGINT
                       AS n_frame_bytes,
                   ('0x' || substr(md5(substr(text, frame_idx * 64 + 1,
                                              64)), 1, 15))::BIGINT
                       AS frame_md5_60
            FROM f
        """,
        "docs_extract_emails": """
            WITH aug AS (
              SELECT doc_id,
                     text || CASE WHEN doc_id % 7 = 0
                                  THEN ' mail: u' || doc_id || '@ex'
                                       || (doc_id % 10) || '.org'
                                  ELSE '' END
                          || CASE WHEN doc_id % 11 = 0
                                  THEN ' call '
                                       || lpad((doc_id % 1000)::VARCHAR,
                                               3, '0')
                                       || '-555-'
                                       || lpad((doc_id % 10000)::VARCHAR,
                                               4, '0')
                                  ELSE '' END AS text
              FROM documents
            )
            SELECT doc_id, unnest(regexp_extract_all(text,
                '[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\\.[A-Za-z0-9.-]+'))
                AS email
            FROM aug
        """,
        "media_features": """
            SELECT 'media/' || doc_id AS media_ref,
                   CASE doc_id % 3 WHEN 0 THEN 'image'
                                   WHEN 1 THEN 'audio'
                                   ELSE 'video' END AS media_type,
                   strlen(text)::BIGINT AS n_bytes,
                   ('0x' || substr(md5(text), 1, 15))::BIGINT
                       AS payload_md5_60,
                   32::BIGINT AS feature_dim
            FROM documents
        """,
        "text_token_count": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                   END AS n_tokens
            FROM documents
        """,
        "text_stats": """
            WITH t AS (
              SELECT doc_id, length(text) AS n_chars,
                     CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text), '\\s+')
                     END AS toks
              FROM documents
            ), s AS (
              SELECT doc_id, n_chars,
                     len(toks) AS n_tokens,
                     len(list_distinct(toks)) AS n_unique_tokens,
                     list_sum(list_transform(toks, x -> length(x))) AS char_sum
              FROM t
            )
            SELECT doc_id, n_chars, n_tokens, n_unique_tokens,
                   floor(10000.0 * n_unique_tokens /
                         greatest(n_tokens, 1)) / 10000.0 AS ttr,
                   floor(10000.0 * coalesce(char_sum, 0) /
                         greatest(n_tokens, 1)) / 10000.0 AS mean_token_len
            FROM s
        """,
        "text_bpe_token_count": f"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '{bpe_pat_sql}'))::BIGINT
                       AS n_bpe_tokens
            FROM documents
        """,
        "docs_boilerplate": _TOKS_CTE + """
            , g AS (
              SELECT doc_id, unnest(list_transform(
                       generate_series(1, len(toks) - 4),
                       i -> toks[i] || ' ' || toks[i + 1] || ' ' ||
                            toks[i + 2] || ' ' || toks[i + 3] || ' ' ||
                            toks[i + 4])) AS ngram
              FROM t
            ),
            po AS (SELECT doc_id, ngram, count(*)::BIGINT AS occ
                   FROM g GROUP BY doc_id, ngram),
            dfc AS (SELECT ngram, count(*)::BIGINT AS df
                    FROM po GROUP BY ngram),
            j AS (SELECT po.doc_id, po.occ,
                         CASE WHEN dfc.df >= 5 THEN po.occ
                              ELSE 0 END AS b
                  FROM po JOIN dfc USING (ngram))
            SELECT doc_id, sum(occ)::BIGINT AS n_grams,
                   sum(b)::BIGINT AS n_boiler,
                   ((10000 * sum(b)) // sum(occ))::BIGINT AS boiler_bp
            FROM j GROUP BY doc_id
        """,
        "docs_split_assign": """
            SELECT doc_id, lang,
                   CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15)
                             )::BIGINT % 1000 < 800 THEN 'train'
                        WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15)
                             )::BIGINT % 1000 < 900 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "text_bpe_merge": _TOKS_CTE + """
            , u AS (SELECT unnest(toks) AS token FROM t)
            , tc AS (SELECT token, count(*)::BIGINT AS n FROM u
                     GROUP BY token)
            , p AS (
              SELECT unnest(list_transform(
                       generate_series(1, length(token) - 1),
                       i -> substr(token, i, 2))) AS pair, n
              FROM tc
            )
            SELECT pair, sum(n)::BIGINT AS w
            FROM p GROUP BY pair
            ORDER BY w DESC, pair ASC
            LIMIT 10
        """,
        "events_hour_profile": """
            SELECT date_part('hour', ts)::BIGINT AS hour, event_type,
                   sum(CAST(round(value * 10000, 0) AS BIGINT))::BIGINT
                       AS sum_value_e4,
                   count(*)::BIGINT AS n
            FROM events GROUP BY 1, 2
        """,
        "lineitem_weighted_disc": """
            WITH q AS (
              SELECT l_returnflag,
                     CAST(round(l_discount * 10000) AS BIGINT) AS bp,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS c
              FROM lineitem
            )
            SELECT l_returnflag,
                   (sum(bp * c)::BIGINT // sum(c)::BIGINT)::BIGINT
                       AS wavg_disc_bp
            FROM q GROUP BY l_returnflag
        """,
        "docs_from_jsonl": """
            SELECT lang, sum(n_chars)::BIGINT AS sum_chars,
                   count(*)::BIGINT AS n_docs
            FROM documents GROUP BY lang
        """,
        "tpch_promo_share": """
            WITH q AS (
              SELECT l.l_partkey,
                     CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * (10000 - CAST(round(l.l_discount * 10000)
                                       AS BIGINT)) // 10000 AS dc,
                     CASE WHEN p.p_type LIKE 'PROMO%' THEN 1
                          ELSE 0 END AS is_p
              FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            )
            SELECT sum(dc * is_p)::BIGINT AS promo_cents,
                   sum(dc)::BIGINT AS total_cents,
                   ((10000 * sum(dc * is_p)) // sum(dc))::BIGINT
                       AS promo_bp
            FROM q
        """,
        "docs_sample_10pct": """
            SELECT doc_id, text FROM documents
            WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                  % 1000 < 100
        """,
        "docs_topk_per_lang": """
            SELECT doc_id, lang, n_chars FROM (
              SELECT doc_id, lang, n_chars,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n_chars DESC, doc_id) AS rn
              FROM documents
            ) WHERE rn <= 3
        """,
        "docs_by_lang_source": """
            SELECT lang, source, sum(n_chars)::BIGINT AS total_chars,
                   count(*)::BIGINT AS n_docs
            FROM documents GROUP BY lang, source
        """,
        "top_sources_by_chars": """
            SELECT source, sum(n_chars)::BIGINT AS total_chars
            FROM documents GROUP BY source
            ORDER BY total_chars DESC, source LIMIT 10
        """,
        "tpch_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS sum_price_cents,
                   count(*)::BIGINT AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "customer_revenue_topk": """
            SELECT o_custkey AS c_custkey, c_name,
                   CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS revenue_cents,
                   count(*)::BIGINT AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY o_custkey, c_name
            ORDER BY revenue_cents DESC, o_custkey LIMIT 10
        """,
        "tpch_q6_revenue": """
            SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                            * CAST(round(l_discount * 100, 0) AS BIGINT))
                        AS BIGINT) AS revenue_cents_bp
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND CAST(round(l_discount * 100, 0) AS BIGINT) BETWEEN 5 AND 7
              AND l_quantity < 24
        """,
        "tpch_q3_shipping": """
            SELECT l.l_orderkey AS o_orderkey, o.o_orderdate,
                   CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                            * (100 - CAST(round(l.l_discount * 100, 0)
                                          AS BIGINT)))
                        AS BIGINT) AS revenue_cents_pct
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-06-15'
              AND l.l_shipdate > TIMESTAMP '1998-06-15'
            GROUP BY l.l_orderkey, o.o_orderdate
            ORDER BY revenue_cents_pct DESC, o_orderkey LIMIT 10
        """,
        "customer_rank_in_nation": """
            WITH r AS (
              SELECT o_custkey AS c_custkey,
                     CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                          AS BIGINT) AS rev_cents
              FROM orders GROUP BY o_custkey
            )
            SELECT r.c_custkey, CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
                   r.rev_cents,
                   CAST(rank() OVER (PARTITION BY c.c_nationkey
                                     ORDER BY r.rev_cents DESC) AS BIGINT)
                       AS rnk
            FROM r JOIN customer c ON r.c_custkey = c.c_custkey
        """,
        "orders_with_returns": """
            SELECT o_orderkey, o_orderpriority
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_returnflag = 'R')
        """,
        "events_gaps": """
            WITH g AS (
              SELECT user_id,
                     epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS gap
              FROM events
            )
            SELECT user_id, count(*)::BIGINT AS n_events,
                   count(gap)::BIGINT AS n_gaps,
                   coalesce(max(gap), 0)::BIGINT AS max_gap_us,
                   coalesce(sum(gap), 0)::BIGINT AS sum_gap_us
            FROM g GROUP BY user_id
        """,
        "events_interval_join": """
            WITH iv AS (
              SELECT event_type AS iv_type, min(ts) AS lo,
                     min(ts) + INTERVAL 1 DAY AS hi
              FROM events GROUP BY event_type
            )
            SELECT iv.iv_type, iv.lo, iv.hi,
                   CAST(sum(CAST(round(e.value * 10000, 0) AS BIGINT))
                        AS BIGINT) AS sum_value_e4,
                   count(*)::BIGINT AS n_events
            FROM events e JOIN iv ON e.ts >= iv.lo AND e.ts < iv.hi
            GROUP BY iv.iv_type, iv.lo, iv.hi
        """,
        "events_tumbling_1h": """
            SELECT user_id,
                   (epoch_us(ts) // (3600::BIGINT * 1000000)) * 3600
                       AS window_start,
                   count(*)::BIGINT AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events GROUP BY user_id, window_start
        """,
        "events_sessions": """
            WITH g AS (
              SELECT user_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                          THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            )
            SELECT user_id, sum(new_session)::BIGINT AS n_sessions
            FROM g GROUP BY user_id
        """,
        "events_sessionize_full": """
            WITH w AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER win IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER win)
                             > 1800000000
                          THEN 1 ELSE 0 END AS new_s
              FROM events WINDOW win AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
              SELECT user_id, ts,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) - 1
                         AS session_id
              FROM w
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   min(ts) AS session_start, max(ts) AS session_end,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM s GROUP BY user_id, session_id
        """,
        "events_session_hdr": """
            WITH w AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER win IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER win)
                             > 1800000000
                          THEN 1 ELSE 0 END AS new_s
              FROM events WINDOW win AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
              SELECT user_id, ts,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING)
                         AS session_id
              FROM w
            ), x AS (
              SELECT (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
                         AS v
              FROM s GROUP BY user_id, session_id
            ), bk AS (
              SELECT CASE WHEN v < 128 THEN v
                     ELSE ((length(bin(v)) - 1 - 7) << 7)
                          + (v >> (length(bin(v)) - 1 - 7)) END AS bucket
              FROM x
            ), b AS (
              SELECT bucket, count(*)::BIGINT AS n FROM bk GROUP BY bucket
            ), c AS (
              SELECT bucket, sum(n) OVER (ORDER BY bucket) AS cum FROM b
            ), tot AS (SELECT count(*)::BIGINT AS n FROM x),
            qs AS (SELECT unnest([50, 90, 99]) AS q_pct),
            sel AS (
              SELECT q_pct, min(bucket) AS bucket FROM qs, c, tot
              WHERE 100 * c.cum >= q_pct * tot.n GROUP BY q_pct
            )
            SELECT q_pct,
                   CASE WHEN bucket < 256 THEN bucket
                        ELSE (bucket - (((bucket >> 7) - 1) << 7))
                             << ((bucket >> 7) - 1) END AS est
            FROM sel ORDER BY q_pct
        """,
        "events_asof_join": """
            WITH r0 AS (
              SELECT user_id, ts, value FROM events
              WHERE (epoch_us(ts) // 1000000) % 10 = 0
            ),
            r AS (SELECT user_id, ts, max(value) AS value_matched
                  FROM r0 GROUP BY user_id, ts)
            SELECT l.user_id, l.ts, l.value,
                   r.value_matched, r.ts AS ts_matched
            FROM events l
            ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "events_hopping": """
            WITH ev AS (SELECT user_id, epoch_us(ts) // 1000000 AS s, value
                        FROM events),
            x AS (SELECT user_id, ((s // 1800) - i) * 1800 AS window_start,
                         value
                  FROM ev CROSS JOIN (SELECT unnest([0, 1]) AS i) t)
            SELECT user_id, window_start, count(*)::BIGINT AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM x GROUP BY user_id, window_start
        """,
        "ann_self_join": """
            WITH p AS (
              SELECT a.vec_id, b.vec_id AS nn_id,
                     round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                  b.embedding::DOUBLE[]),
                           4) AS cosine
              FROM embeddings a JOIN embeddings b
                ON a.vec_id <> b.vec_id
            ),
            r AS (SELECT *, row_number() OVER (
                      PARTITION BY vec_id
                      ORDER BY cosine DESC, nn_id) AS rn
                  FROM p)
            SELECT vec_id, nn_id, cosine FROM r WHERE rn = 1
        """,
        "ann_top10": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
                       WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                                                (SELECT qe FROM q)), 4)
                       AS cosine
            FROM embeddings
            ORDER BY list_cosine_similarity(embedding::DOUBLE[],
                                            (SELECT qe FROM q)) DESC, vec_id
            LIMIT 10
        """,
        "ann_filtered_top10": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
                       WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                                                (SELECT qe FROM q)), 4)
                       AS cosine
            FROM embeddings
            WHERE label = 1
            ORDER BY list_cosine_similarity(embedding::DOUBLE[],
                                            (SELECT qe FROM q)) DESC, vec_id
            LIMIT 10
        """,
        "embedding_argmax": """
            SELECT vec_id,
                   (list_position(embedding,
                                  list_max(embedding)) - 1)::BIGINT
                       AS dim,
                   round(list_max(embedding)::DOUBLE, 4) AS value
            FROM embeddings
        """,
        "ann_ivf_top10": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
                       WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[],
                                                (SELECT qe FROM q)), 4)
                       AS cosine
            FROM embeddings
            ORDER BY list_cosine_similarity(embedding::DOUBLE[],
                                            (SELECT qe FROM q)) DESC, vec_id
            LIMIT 10
        """,
        "embedding_norms": """
            SELECT vec_id,
                   round(sqrt(list_dot_product(embedding::DOUBLE[],
                                               embedding::DOUBLE[])), 4)
                       AS l2_norm
            FROM embeddings
        """,
        "ann_batch_top3": """
            WITH q AS (SELECT vec_id AS query_id,
                              embedding::DOUBLE[] AS qe
                       FROM embeddings WHERE vec_id < 5),
            s AS (SELECT q.query_id, e.vec_id,
                         round(list_cosine_similarity(
                             e.embedding::DOUBLE[], q.qe), 4) AS cosine
                  FROM embeddings e CROSS JOIN q),
            r AS (SELECT *, row_number() OVER (
                      PARTITION BY query_id
                      ORDER BY cosine DESC, vec_id) AS rn
                  FROM s)
            SELECT query_id, vec_id, cosine FROM r WHERE rn <= 3
        """,
        # retrieval eval replayed end to end: exact rounded-cosine truth
        # lists, int8-code integer-dot candidate lists, then the
        # per-term-floored recall/MRR/nDCG metrics
        "ann_quantized_eval": """
            WITH q AS MATERIALIZED (
              SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
              FROM embeddings WHERE vec_id < 8
            ),
            s AS (SELECT q.query_id, e.vec_id,
                         round(list_inner_product(
                             e.embedding::DOUBLE[], q.qe), 4) AS dot
                  FROM embeddings e CROSS JOIN q),
            truth AS MATERIALIZED (
              SELECT query_id, vec_id FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY dot DESC, vec_id) AS rn FROM s)
              WHERE rn <= 10
            ),
            u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
                         unnest(embedding)::DOUBLE AS x
                  FROM embeddings),
            b AS (SELECT dim, min(x) AS mn, max(x) AS mx
                  FROM u GROUP BY dim),
            codes AS MATERIALIZED (
              SELECT vec_id, dim,
                     CASE WHEN mx = mn THEN 0
                          ELSE least(greatest(
                              floor(((x - mn) * 255.0) / (mx - mn)),
                              0), 255)::BIGINT
                     END AS code
              FROM u JOIN b USING (dim)
            ),
            recon AS MATERIALIZED (
              SELECT c.vec_id, c.dim,
                     b.mn + c.code * ((b.mx - b.mn) / 255.0) AS r
              FROM codes c JOIN b USING (dim)
            ),
            qrec AS (SELECT t.query_id, r.dim, r.r
                     FROM (SELECT query_id FROM q) t
                     JOIN recon r ON r.vec_id = t.query_id),
            dots AS (SELECT qrec.query_id, r.vec_id,
                            round(sum(r.r * qrec.r), 4) AS qdot
                     FROM qrec JOIN recon r ON r.dim = qrec.dim
                     GROUP BY qrec.query_id, r.vec_id),
            cand AS MATERIALIZED (
              SELECT query_id, vec_id, rn FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY qdot DESC, vec_id) AS rn FROM dots)
              WHERE rn <= 10
            ),
            hits AS (SELECT c.query_id, c.rn
                     FROM cand c JOIN truth t
                       ON t.query_id = c.query_id AND t.vec_id = c.vec_id),
            idcg AS (SELECT sum(floor(1000000 / log2(r.x + 1)))::BIGINT
                         AS idcg_e6
                     FROM range(1, 11) r(x)),
            per AS (SELECT query_id, count(*)::BIGINT AS n_hits,
                           floor(1000000 / min(rn))::BIGINT AS mrr_e6,
                           sum(floor(1000000 / log2(rn + 1)))::BIGINT
                               AS dcg_e6
                    FROM hits GROUP BY query_id)
            SELECT b0.query_id,
                   coalesce(per.n_hits, 0)::BIGINT AS n_hits,
                   coalesce(per.mrr_e6, 0)::BIGINT AS mrr_e6,
                   coalesce(per.dcg_e6, 0)::BIGINT AS dcg_e6,
                   ((10000 * coalesce(per.dcg_e6, 0))
                    // idcg.idcg_e6)::BIGINT AS ndcg_e4
            FROM (SELECT query_id FROM q) b0
            LEFT JOIN per USING (query_id) CROSS JOIN idcg
        """,
        # Matryoshka truncation eval: per-dims candidate lists over
        # prefix-sliced embeddings, full-dim exact-dot truth, the
        # shared per-term-floored metric folds
        "ann_matryoshka_eval": """
            WITH dimset AS (SELECT unnest([4, 8, 16]) AS dims),
            q AS MATERIALIZED (
              SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
              FROM embeddings WHERE vec_id < 8
            ),
            s AS (SELECT q.query_id, e.vec_id,
                         round(list_inner_product(
                             e.embedding::DOUBLE[], q.qe), 4) AS dot
                  FROM embeddings e CROSS JOIN q),
            truth AS MATERIALIZED (
              SELECT query_id, vec_id FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY dot DESC, vec_id) AS rn FROM s)
              WHERE rn <= 10
            ),
            sc AS (SELECT d.dims, q.query_id, e.vec_id,
                          round(list_inner_product(
                              list_slice(e.embedding::DOUBLE[], 1,
                                         d.dims),
                              list_slice(q.qe, 1, d.dims)), 4) AS dot
                   FROM embeddings e CROSS JOIN q CROSS JOIN dimset d),
            cand AS MATERIALIZED (
              SELECT dims, query_id, vec_id, rn FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY dims, query_id
                    ORDER BY dot DESC, vec_id) AS rn FROM sc)
              WHERE rn <= 10
            ),
            hits AS (SELECT c.dims, c.query_id, c.rn
                     FROM cand c JOIN truth t
                       ON t.query_id = c.query_id
                      AND t.vec_id = c.vec_id),
            idcg AS (SELECT sum(floor(1000000 / log2(r.x + 1)))::BIGINT
                         AS idcg_e6
                     FROM range(1, 11) r(x)),
            per AS (SELECT dims, query_id, count(*)::BIGINT AS n_hits,
                           floor(1000000 / min(rn))::BIGINT AS mrr_e6,
                           sum(floor(1000000 / log2(rn + 1)))::BIGINT
                               AS dcg_e6
                    FROM hits GROUP BY dims, query_id)
            SELECT b0.dims, b0.query_id,
                   coalesce(per.n_hits, 0)::BIGINT AS n_hits,
                   coalesce(per.mrr_e6, 0)::BIGINT AS mrr_e6,
                   coalesce(per.dcg_e6, 0)::BIGINT AS dcg_e6,
                   ((10000 * coalesce(per.dcg_e6, 0))
                    // idcg.idcg_e6)::BIGINT AS ndcg_e4
            FROM (SELECT d.dims, q.query_id
                  FROM dimset d CROSS JOIN q) b0
            LEFT JOIN per USING (dims, query_id) CROSS JOIN idcg
        """,
        "embedding_quantized": """
            WITH u AS (
              SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
                     unnest(embedding)::DOUBLE AS x
              FROM embeddings
            ),
            b AS (SELECT dim, min(x) AS mn, max(x) AS mx
                  FROM u GROUP BY dim),
            q AS (SELECT vec_id,
                         CASE WHEN mx = mn THEN 0
                              ELSE least(greatest(
                                  floor(((x - mn) * 255.0) / (mx - mn)),
                                  0), 255)::BIGINT
                         END AS code
                  FROM u JOIN b USING (dim))
            SELECT vec_id, count(*)::BIGINT AS n_dims,
                   sum(code)::BIGINT AS q_sum
            FROM q GROUP BY vec_id
        """,
        "events_tumbling_incremental": """
            SELECT (epoch_us(ts) // 3600000000) * 3600 AS window_start,
                   event_type,
                   count(*)::BIGINT AS n,
                   sum(CAST(round(value * 10000, 0) AS BIGINT))::BIGINT
                       AS sum_e4
            FROM events
            GROUP BY window_start, event_type
            ORDER BY window_start, event_type
        """,
    }
    out["events_zscore"] = """
        WITH h AS (
          SELECT event_type,
                 (epoch_us(ts) // (3600::BIGINT * 1000000)) * 3600
                     AS hour,
                 count(*)::BIGINT AS n
          FROM events GROUP BY event_type, hour
        ),
        m AS (
          SELECT event_type, count(*)::HUGEINT AS t,
                 sum(n)::HUGEINT AS s, sum(n * n)::HUGEINT AS sxx
          FROM h GROUP BY event_type
        ),
        z AS (
          SELECT h.event_type, h.hour, h.n,
                 floor((10000 * (m.t * h.n - m.s))::DOUBLE
                       / sqrt((m.t * m.sxx - m.s * m.s)::DOUBLE))::BIGINT
                     AS z_bp
          FROM h JOIN m USING (event_type)
          WHERE m.t * m.sxx - m.s * m.s > 0
        )
        SELECT * FROM z WHERE abs(z_bp) >= 20000
    """
    out["docs_novelty"] = _TOKS_CTE + """
        , u AS (SELECT doc_id, unnest(toks) AS tok,
                       generate_subscripts(toks, 1) AS pos
                FROM t),
        g0 AS (SELECT doc_id,
                      tok || ' ' || lead(tok, 1) OVER w || ' '
                          || lead(tok, 2) OVER w AS ngram
               FROM u WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        g AS (SELECT DISTINCT doc_id, ngram FROM g0
              WHERE ngram IS NOT NULL),
        f AS (SELECT ngram, min(doc_id) AS first_doc FROM g
              GROUP BY ngram),
        tot AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM g
                GROUP BY doc_id),
        nov AS (SELECT first_doc AS doc_id, count(*)::BIGINT AS n_novel
                FROM f GROUP BY first_doc)
        SELECT tot.doc_id, tot.n_grams,
               coalesce(nov.n_novel, 0)::BIGINT AS n_novel,
               ((10000 * coalesce(nov.n_novel, 0))::BIGINT
                // tot.n_grams)::BIGINT AS novelty_bp
        FROM tot LEFT JOIN nov USING (doc_id)
    """
    out["customer_rfm"] = """
        WITH c AS (
          SELECT o_custkey,
                 max(epoch_us(o_orderdate) // 86400000000)::BIGINT
                     AS last_day,
                 count(*)::BIGINT AS n_orders,
                 sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
                     AS spend_cents
          FROM orders GROUP BY o_custkey
        ),
        mx AS (SELECT max(last_day) AS maxd FROM c),
        r AS (SELECT o_custkey, (mx.maxd - last_day)::BIGINT AS recency,
                     n_orders, spend_cents
              FROM c, mx),
        b AS (SELECT
          quantile_disc(recency, 0.25) AS r1,
          quantile_disc(recency, 0.5) AS r2,
          quantile_disc(recency, 0.75) AS r3,
          quantile_disc(n_orders, 0.25) AS f1,
          quantile_disc(n_orders, 0.5) AS f2,
          quantile_disc(n_orders, 0.75) AS f3,
          quantile_disc(spend_cents, 0.25) AS m1,
          quantile_disc(spend_cents, 0.5) AS m2,
          quantile_disc(spend_cents, 0.75) AS m3 FROM r),
        coded AS (
          SELECT o_custkey, spend_cents,
                 (100 * (1 + (recency > b.r1)::INT + (recency > b.r2)::INT
                           + (recency > b.r3)::INT)
                + 10 * (1 + (n_orders > b.f1)::INT + (n_orders > b.f2)::INT
                          + (n_orders > b.f3)::INT)
                + (1 + (spend_cents > b.m1)::INT + (spend_cents > b.m2)::INT
                     + (spend_cents > b.m3)::INT))::BIGINT AS rfm_code
          FROM r, b
        )
        SELECT rfm_code, sum(spend_cents)::BIGINT AS sum_spend_cents,
               count(*)::BIGINT AS n_customers
        FROM coded GROUP BY rfm_code
    """
    out["media_dedup"] = f"""
        WITH doubled AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + {_OFFSET}, text FROM documents
        )
        SELECT md5(text) AS digest, count(*)::BIGINT AS n_copies,
               min('media/' || doc_id) AS keeper
        FROM doubled GROUP BY md5(text)
        HAVING count(*) > 1
    """
    out["events_attribution"] = """
        WITH o AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > 1800000000
                      THEN 1 ELSE 0 END AS new_session,
                 CAST(round(value * 10000) AS BIGINT) AS v
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
          SELECT *, sum(new_session) OVER (
              PARTITION BY user_id ORDER BY ts, event_id) AS sess
          FROM o
        ),
        t AS (
          SELECT *, lag(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
                     OVER (PARTITION BY user_id, sess
                           ORDER BY ts, event_id) AS touch
          FROM s
        )
        SELECT coalesce(touch, 'direct') AS touch_type,
               sum(v)::BIGINT AS sum_value_e4,
               count(*)::BIGINT AS n_purchases
        FROM t WHERE event_type = 'purchase'
        GROUP BY 1
    """
    out["events_trend"] = """
        WITH h AS (
          SELECT event_type,
                 (epoch_us(ts) // (3600::BIGINT * 1000000)) * 3600
                     AS hour,
                 count(*)::BIGINT AS n
          FROM events GROUP BY event_type, hour
        ),
        i AS (SELECT event_type, n,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY hour) AS x
              FROM h),
        m AS (SELECT event_type, count(*)::HUGEINT AS t,
                     sum(x)::HUGEINT AS sx, sum(x * x)::HUGEINT AS sxx,
                     sum(n)::HUGEINT AS sy, sum(x * n)::HUGEINT AS sxy
              FROM i GROUP BY event_type)
        SELECT event_type, t::BIGINT AS n_buckets,
               floor((1000000 * (t * sxy - sx * sy))::DOUBLE
                     / (t * sxx - sx * sx)::DOUBLE)::BIGINT AS slope_e6
        FROM m WHERE t >= 2
    """
    out["docs_kl_drift"] = """
        WITH c AS (SELECT source, lang, count(*)::BIGINT AS n
                   FROM documents GROUP BY source, lang),
        t AS (SELECT source, sum(n)::BIGINT AS tot FROM c
              GROUP BY source),
        l AS (SELECT lang, sum(n)::BIGINT AS nl FROM c GROUP BY lang),
        g AS (SELECT sum(n)::BIGINT AS grand FROM c)
        SELECT c.source,
               sum(floor((1000000 * c.n)
                         * ln((c.n * g.grand)::DOUBLE / (t.tot * l.nl))
                         / t.tot))::BIGINT AS kl_e6
        FROM c JOIN t USING (source) JOIN l USING (lang), g
        GROUP BY c.source
    """
    knn_edges_sql = """
        SELECT 'v' || vec_id AS _from, 'v' || nn_id AS _to
        FROM (
          SELECT vec_id, nn_id,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cosine DESC, nn_id) AS rn
          FROM (
            SELECT a.vec_id, b.vec_id AS nn_id,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]),
                         4) AS cosine
            FROM embeddings a JOIN embeddings b
              ON a.vec_id <> b.vec_id
          )
        ) WHERE rn = 1
    """
    out["embedding_knn_components"] = _components_sql(knn_edges_sql,
                                                      iters=5)
    out["events_markov"] = _markov_sql(iters=3)
    out["events_twa"] = """
        WITH s AS (
          SELECT user_id,
                 trunc(value * 10000)::BIGINT AS v,
                 epoch_us(ts)::BIGINT AS t,
                 lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS t2
          FROM events
        ),
        p AS (SELECT user_id, v, (t2 - t)::BIGINT AS gap
              FROM s WHERE t2 IS NOT NULL)
        SELECT user_id, count(*)::BIGINT AS n_segments,
               (sum(v * gap)::BIGINT // sum(gap)::BIGINT)::BIGINT
                   AS twa_e4
        FROM p GROUP BY user_id
        HAVING sum(gap) > 0
    """
    # the CSV-ingest profile equals the parquet/JSONL-path profile —
    # three source formats, one oracle
    out["docs_from_csv"] = out["docs_from_jsonl"]
    # broadcast union-find, distributed components, and the auto
    # router produce identical survivor sets by contract (equivalence
    # pytest) — one oracle for all three
    out["dedup_survivors_broadcast"] = out["dedup_minhash_survivors"]
    out["dedup_survivors_auto"] = out["dedup_minhash_survivors"]
    # the streaming MG fold is row-identical to the batch heavy hitters
    # (mergeable-summaries superset + shared exact verify pass)
    out["text_heavy_hitters_incremental"] = out["text_heavy_hitters"]
    # the streaming micro-batch fold is row-identical to the batch
    # sessionize by contract — they share one oracle
    out["events_sessionize_incremental"] = out["events_sessionize_full"]
    # full-probe IVF over the persisted index == full-probe in-stream IVF
    out["ann_ivf_persisted"] = out["ann_ivf_top10"]
    # the running-distinct fold equals the batch distinct count
    out["events_distinct_users_incremental"] = out["events_distinct_users"]
    # the stream-stream as-of fold equals the batch as-of join
    out["events_asof_incremental"] = out["events_asof_join"]
    # micro-batch IVM folds to the same view as batch IVM == recompute
    out["orders_ivm_incremental"] = out["orders_ivm_view"]
    # the JSONL round-trip must reproduce the built edge table exactly
    out["kg_edges_jsonl"] = out["kg_edges"]
    # the incremental base+delta merge must reproduce it too
    out["kg_delta_edges"] = out["kg_edges"]
    out["kg_snapshot_diff"] = f"""
        WITH newe AS ({kg_edges_sql}), olde AS ({kg_base_edges_sql})
        SELECT n.pred, count(*)::BIGINT AS n_added
        FROM newe n LEFT JOIN olde o
          ON n._from = o._from AND n.pred = o.pred AND n._to = o._to
        WHERE o._from IS NULL
        GROUP BY n.pred
    """
    out["docs_curation_funnel"] = _TOKS_CTE + f"""
        , s AS (
          SELECT doc_id, n_chars, n_punct,
                 len(toks) AS n_tok,
                 len(list_filter(toks,
                     x -> list_contains({stop['en']}, x))) AS stop_hits,
                 len(list_distinct(toks)) AS n_uniq
          FROM t
        ),
        q AS (SELECT doc_id, n_chars,
                     floor(10000.0 * (
                         0.35 * least(n_chars / 500.0, 1.0)
                       + 0.25 * least((stop_hits / greatest(n_tok, 1))
                                      * 4, 1.0)
                       + 0.2 * (n_uniq / greatest(n_tok, 1))
                       + 0.2 * (1 - least((n_punct
                                           / greatest(n_chars, 1)) * 5,
                                          1.0))
                     )) / 10000.0 AS quality
              FROM s),
        f2 AS (SELECT d.doc_id, d.text, q.quality
               FROM documents d JOIN q USING (doc_id)
               WHERE q.n_chars >= 100),
        f3 AS (SELECT * FROM f2 WHERE quality >= 0.5)
        SELECT * FROM (
          SELECT 'raw' AS stage, count(*)::BIGINT AS n_docs
          FROM documents
          UNION ALL SELECT 'min_length', count(*)::BIGINT FROM f2
          UNION ALL SELECT 'quality', count(*)::BIGINT FROM f3
          UNION ALL SELECT 'dedup', count(DISTINCT text)::BIGINT FROM f3
        )
    """
    out["docs_dup_hist"] = f"""
        WITH doubled AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + {_OFFSET}, text FROM documents
        ),
        c AS (SELECT count(*)::BIGINT AS cluster_size FROM doubled
              GROUP BY md5(text))
        SELECT cluster_size, count(*)::BIGINT AS n_clusters
        FROM c GROUP BY cluster_size
    """
    out["orders_backlog"] = """
        WITH f AS (SELECT l_orderkey AS ok,
                          max(epoch_us(l_shipdate)
                              // 86400000000)::BIGINT AS fd
                   FROM lineitem GROUP BY l_orderkey),
        o AS (SELECT o_orderkey AS ok,
                     (epoch_us(o_orderdate) // 86400000000)::BIGINT
                         AS od
              FROM orders),
        j AS (SELECT o.ok, o.od, f.fd FROM o JOIN f USING (ok)),
        d AS (SELECT od AS day, 1 AS delta FROM j
              UNION ALL SELECT fd + 1, -1 FROM j),
        g AS (SELECT day, sum(delta)::BIGINT AS delta FROM d
              GROUP BY day)
        SELECT day::BIGINT AS day,
               sum(delta) OVER (ORDER BY day)::BIGINT AS n_open
        FROM g
    """
    out["embedding_outliers"] = """
        WITH u AS (
          SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
                 CAST(trunc(unnest(embedding)::DOUBLE * 1000000)
                      AS BIGINT) AS x_e6
          FROM embeddings
        ),
        c AS (SELECT dim,
                     CAST(floor(sum(x_e6)::DOUBLE / count(*)) AS BIGINT)
                         AS c_e6
              FROM u GROUP BY dim),
        d AS (SELECT u.vec_id,
                     sum((u.x_e6 - c.c_e6)
                         * (u.x_e6 - c.c_e6))::BIGINT AS d2_e12
              FROM u JOIN c USING (dim) GROUP BY u.vec_id)
        SELECT vec_id, d2_e12 FROM d
        ORDER BY d2_e12 DESC, vec_id LIMIT 10
    """
    out["events_seq_regex"] = """
        WITH s AS (SELECT user_id,
                          string_agg(substr(event_type, 1, 1), ''
                                     ORDER BY ts, event_id) AS seq
                   FROM events GROUP BY user_id)
        SELECT count(*)::BIGINT AS n_users,
               sum(CASE WHEN regexp_matches(seq, 's[cv]*p')
                        THEN 1 ELSE 0 END)::BIGINT AS n_matching
        FROM s
    """
    out["events_user_entropy"] = """
        WITH c AS (SELECT user_id, event_type, count(*)::BIGINT AS n
                   FROM events GROUP BY user_id, event_type),
        t AS (SELECT user_id, sum(n)::BIGINT AS tot FROM c
              GROUP BY user_id)
        SELECT c.user_id, count(*)::BIGINT AS n_types,
               sum(floor((1000000 * c.n) * ln(t.tot::DOUBLE / c.n)
                         / t.tot))::BIGINT AS h_e6
        FROM c JOIN t USING (user_id) GROUP BY c.user_id
    """
    out["events_missing_hours"] = """
        WITH h AS (SELECT DISTINCT event_type,
                          epoch_us(ts) // 3600000000 AS hour
                   FROM events),
        s AS (SELECT event_type, hour,
                     lead(hour) OVER (PARTITION BY event_type
                                      ORDER BY hour) AS nxt
              FROM h),
        fg AS (SELECT event_type, (min(hour) + 1)::BIGINT
                          AS first_gap_hour
               FROM s WHERE nxt IS NOT NULL AND nxt - hour > 1
               GROUP BY event_type),
        a AS (SELECT event_type, count(*)::BIGINT AS n_hours_present,
                     min(hour)::BIGINT AS mn, max(hour)::BIGINT AS mx
              FROM h GROUP BY event_type)
        SELECT a.event_type, a.n_hours_present,
               (mx - mn + 1)::BIGINT AS n_hours_span,
               (mx - mn + 1 - n_hours_present)::BIGINT AS n_missing,
               fg.first_gap_hour
        FROM a LEFT JOIN fg USING (event_type)
    """
    out["orders_reconcile"] = """
        WITH lc AS (SELECT l_orderkey AS ok,
                           sum(CAST(round(l_extendedprice
                                          * (1 - l_discount)
                                          * (1 + l_tax) * 100)
                                    AS BIGINT))::BIGINT AS line_cents
                    FROM lineitem GROUP BY l_orderkey),
        oc AS (SELECT o_orderkey AS ok,
                      CAST(round(o_totalprice * 100) AS BIGINT)
                          AS total_cents
               FROM orders),
        j AS (SELECT oc.total_cents, lc.line_cents
              FROM oc JOIN lc USING (ok))
        SELECT count(*)::BIGINT AS n_orders,
               sum(CASE WHEN total_cents <> line_cents
                        THEN 1 ELSE 0 END)::BIGINT AS n_mismatched,
               sum(abs(total_cents - line_cents))::BIGINT
                   AS abs_diff_cents
        FROM j
    """
    # RAKE: stopword-run phrases via window cumsum, deg/freq scores
    out["text_rake_keywords"] = _TOKS_CTE + """
        , u AS (SELECT doc_id, unnest(toks) AS tok,
                       generate_subscripts(toks, 1) AS pos FROM t),
        f AS (SELECT doc_id, tok, pos,
                     CASE WHEN tok IN ('the','a','of','to','and','in',
                       'is','it','you','that','was','for','on','are',
                       'with','as','i','his','they','be','at')
                     THEN 1 ELSE 0 END AS st FROM u),
        g AS (SELECT doc_id, tok, pos, st,
                     sum(st) OVER (PARTITION BY doc_id ORDER BY pos)
                     AS pid FROM f),
        w AS (SELECT doc_id, pid, tok, pos FROM g WHERE st = 0),
        p AS (SELECT doc_id, pid,
                     string_agg(tok, ' ' ORDER BY pos) AS phrase,
                     count(*)::BIGINT AS plen
              FROM w GROUP BY doc_id, pid),
        wd AS (SELECT w.tok, p.plen FROM w
               JOIN p USING (doc_id, pid)),
        ws AS (SELECT tok, (1000000 * sum(plen)) // count(*) AS s
               FROM wd GROUP BY tok),
        osc AS (SELECT w.doc_id, w.pid, p.phrase,
                       sum(ws.s)::BIGINT AS score
                FROM w JOIN p USING (doc_id, pid)
                JOIN ws ON w.tok = ws.tok
                GROUP BY w.doc_id, w.pid, p.phrase),
        res AS (SELECT phrase, count(*)::BIGINT AS n,
                       min(score)::BIGINT AS score_e6
                FROM osc GROUP BY phrase)
        SELECT phrase, n, score_e6 FROM res
        ORDER BY score_e6 DESC, phrase LIMIT 15
    """
    # Good–Turing: spectrum self-join, integer floor division
    out["text_good_turing"] = _TOKS_CTE + """
        , u AS (SELECT doc_id, unnest(toks) AS tok,
                       generate_subscripts(toks, 1) AS pos FROM t),
        b0 AS (SELECT doc_id, tok AS w1,
                      lead(tok) OVER (PARTITION BY doc_id
                                      ORDER BY pos) AS w2 FROM u),
        wc AS (SELECT w1 || ' ' || w2 AS w, count(*)::BIGINT AS n
               FROM b0 WHERE w2 IS NOT NULL GROUP BY 1),
        spec AS (SELECT n AS r, count(*)::BIGINT AS n_r
                 FROM wc GROUP BY n)
        SELECT s.r::BIGINT AS r, s.n_r,
               coalesce(s2.n_r, 0)::BIGINT AS n_next,
               ((1000000 * (s.r + 1) * coalesce(s2.n_r, 0))
                // s.n_r)::BIGINT AS gt_e6
        FROM spec s LEFT JOIN spec s2 ON s2.r = s.r + 1
        WHERE s.r BETWEEN 1 AND 10
    """
    # Dunning G²: bigram contingency, per-term e6 floor ln, ×2 after
    # the exact integer sum — mirrors text.bigram_g2_topk
    out["text_bigram_g2"] = _TOKS_CTE + """
        , u AS (SELECT doc_id, unnest(toks) AS tok,
                       generate_subscripts(toks, 1) AS pos FROM t),
        b0 AS (SELECT doc_id, tok AS w1,
                      lead(tok) OVER (PARTITION BY doc_id
                                      ORDER BY pos) AS w2 FROM u),
        bg AS MATERIALIZED (
          SELECT w1, w2, count(*)::BIGINT AS n FROM b0
          WHERE w2 IS NOT NULL GROUP BY w1, w2),
        nbm AS (SELECT sum(n)::BIGINT AS nb FROM bg),
        st AS (SELECT w1, sum(n)::BIGINT AS r FROM bg GROUP BY w1),
        en AS (SELECT w2, sum(n)::BIGINT AS c FROM bg GROUP BY w2),
        cand AS (SELECT w1, w2, n, w1 || ' ' || w2 AS bigram FROM bg
                 ORDER BY n DESC, bigram LIMIT 1000),
        sc AS (
          SELECT cand.bigram, cand.n,
                 CAST(2 * (
            (CASE WHEN cand.n > 0 THEN floor((1000000 * cand.n)
              * ln((cand.n * nb)::DOUBLE / (st.r * en.c)))
              ELSE 0 END)
          + (CASE WHEN st.r - cand.n > 0 THEN
              floor((1000000 * (st.r - cand.n))
              * ln(((st.r - cand.n) * nb)::DOUBLE
                   / (st.r * (nb - en.c)))) ELSE 0 END)
          + (CASE WHEN en.c - cand.n > 0 THEN
              floor((1000000 * (en.c - cand.n))
              * ln(((en.c - cand.n) * nb)::DOUBLE
                   / ((nb - st.r) * en.c))) ELSE 0 END)
          + (CASE WHEN nb - st.r - en.c + cand.n > 0 THEN
              floor((1000000 * (nb - st.r - en.c + cand.n))
              * ln(((nb - st.r - en.c + cand.n) * nb)::DOUBLE
                   / ((nb - st.r) * (nb - en.c)))) ELSE 0 END)
                 ) AS BIGINT) AS g2_e6
          FROM cand JOIN st USING (w1) JOIN en USING (w2)
          CROSS JOIN nbm)
        SELECT bigram, n, g2_e6 FROM sc
        ORDER BY g2_e6 DESC, bigram LIMIT 20
    """
    out["text_skipgrams"] = _TOKS_CTE + """
        , u AS (SELECT doc_id, unnest(toks) AS tok,
                       generate_subscripts(toks, 1) AS pos
                FROM t),
        g AS (SELECT doc_id, tok,
                     lead(tok, 1) OVER w AS t1,
                     lead(tok, 2) OVER w AS t2
              FROM u WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        p AS (SELECT tok || ' ' || t1 AS pair FROM g
              WHERE t1 IS NOT NULL
              UNION ALL
              SELECT tok || ' ' || t2 FROM g WHERE t2 IS NOT NULL)
        SELECT pair, count(*)::BIGINT AS n FROM p
        GROUP BY pair ORDER BY n DESC, pair LIMIT 20
    """
    out["orders_weekly"] = """
        SELECT ((epoch_us(o_orderdate) // 86400000000 + 3)
                // 7)::BIGINT AS week_id,
               sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
                   AS sum_cents,
               count(*)::BIGINT AS n_orders
        FROM orders GROUP BY week_id
    """
    out["kg_path_counts"] = _bfs_paths_sql(kg_edges_sql, iters=3)
    out["lineitem_weighted_median"] = """
        WITH c AS (SELECT l_returnflag,
                          CAST(round(l_extendedprice * 100) AS BIGINT)
                              AS pc,
                          trunc(l_quantity)::BIGINT AS q
                   FROM lineitem),
        g AS (SELECT l_returnflag, pc, sum(q)::BIGINT AS w FROM c
              GROUP BY l_returnflag, pc),
        s AS (SELECT *, sum(w) OVER (PARTITION BY l_returnflag
                                     ORDER BY pc) AS cum,
                     sum(w) OVER (PARTITION BY l_returnflag) AS tot
              FROM g)
        SELECT l_returnflag, min(pc)::BIGINT AS wmedian_cents
        FROM s WHERE 2 * cum >= tot GROUP BY l_returnflag
    """
    out["text_char_trigrams"] = """
        WITH u AS (
          SELECT unnest(list_transform(
                     generate_series(1, greatest(length(text) - 2, 0)),
                     i -> substr(lower(text), i, 3))) AS tri
          FROM documents
        )
        SELECT tri, count(*)::BIGINT AS n FROM u
        GROUP BY tri ORDER BY n DESC, tri LIMIT 20
    """
    out["docs_interleave_sources"] = """
        WITH r AS (SELECT doc_id, source,
                          row_number() OVER (PARTITION BY source
                                             ORDER BY doc_id) AS rk
                   FROM documents)
        SELECT rk::BIGINT AS rk, source, doc_id FROM r
        ORDER BY rk, source, doc_id LIMIT 50
    """
    out["events_peak_hours"] = """
        WITH h AS (SELECT event_type,
                          epoch_us(ts) // 3600000000 AS hour,
                          count(*)::BIGINT AS n
                   FROM events GROUP BY event_type, hour),
        s AS (SELECT event_type, hour, n,
                     coalesce(lag(n) OVER w, -1) AS p,
                     coalesce(lead(n) OVER w, -1) AS x
              FROM h WINDOW w AS (PARTITION BY event_type
                                  ORDER BY hour))
        SELECT event_type, hour::BIGINT AS hour, n FROM s
        WHERE n > p AND n > x
    """
    out["embedding_dim_stats"] = """
        WITH u AS (SELECT generate_subscripts(embedding, 1) - 1 AS dim,
                          CAST(trunc(unnest(embedding)::DOUBLE
                                     * 1000000) AS BIGINT) AS x
                   FROM embeddings),
        m AS (SELECT dim, count(*)::HUGEINT AS n, sum(x)::HUGEINT AS s,
                     sum(x::HUGEINT * x)::HUGEINT AS ss
              FROM u GROUP BY dim)
        SELECT dim, n::BIGINT AS n, s::BIGINT AS s, ss::BIGINT AS ss,
               floor((n * ss - s * s)::DOUBLE
                     / (n * n)::DOUBLE)::BIGINT AS var_e12
        FROM m
    """
    sign6 = " + ".join(
        f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(6))
    sign4 = " + ".join(
        f"(CASE WHEN embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(4))
    out["embedding_semdedup"] = f"""
        WITH b AS (SELECT vec_id, ({sign6})::BIGINT AS bucket,
                          list_transform(embedding,
                              x -> floor(x::DOUBLE * 1000000.0)) AS q
                   FROM embeddings),
        d AS (SELECT DISTINCT a.vec_id
              FROM b a JOIN b c
                ON a.bucket = c.bucket AND c.vec_id < a.vec_id
              WHERE round(list_cosine_similarity(a.q, c.q), 4)
                    >= 0.3500)
        SELECT vec_id, bucket FROM b
        WHERE vec_id NOT IN (SELECT vec_id FROM d)
    """
    out["embedding_proto_prune"] = f"""
        WITH b AS (SELECT vec_id, ({sign4})::BIGINT AS bucket,
                          list_transform(embedding,
                              x -> floor(x::DOUBLE * 1000.0)) AS q
                   FROM embeddings),
        u AS (SELECT bucket, vec_id, generate_subscripts(q, 1) AS dim,
                     unnest(q) AS x
              FROM b),
        c AS (SELECT bucket, dim, sum(x) AS s
              FROM u GROUP BY bucket, dim),
        ctr AS (SELECT bucket, list(s ORDER BY dim) AS ctr
                FROM c GROUP BY bucket),
        s AS (SELECT vec_id, b.bucket AS bucket,
                     round(list_cosine_similarity(q, ctr.ctr), 4)
                         AS proto
              FROM b JOIN ctr USING (bucket)),
        r AS (SELECT vec_id, bucket, proto,
                     row_number() OVER (PARTITION BY bucket
                                        ORDER BY proto DESC, vec_id)
                         AS rn
              FROM s)
        SELECT vec_id, bucket, proto FROM r WHERE rn <= 3
    """
    out["ann_hard_negatives"] = """
        WITH p AS (SELECT a.vec_id AS vec_id, b.vec_id AS neg_id,
                          round(list_cosine_similarity(
                              a.embedding::DOUBLE[],
                              b.embedding::DOUBLE[]), 4) AS cosine
                   FROM embeddings a JOIN embeddings b
                     ON a.label <> b.label),
        r AS (SELECT vec_id, neg_id, cosine,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY cosine DESC, neg_id)
                         AS neg_rank
              FROM p)
        SELECT vec_id, neg_id, cosine, neg_rank FROM r
        WHERE neg_rank <= 3
    """
    out["embedding_centroid_confusion"] = """
        WITH b AS (SELECT vec_id, label::BIGINT AS label,
                          list_transform(embedding,
                              x -> floor(x::DOUBLE * 1000.0)) AS q
                   FROM embeddings),
        u AS (SELECT label, generate_subscripts(q, 1) AS dim,
                     unnest(q) AS x
              FROM b),
        c AS (SELECT label AS clab, dim, sum(x) AS s
              FROM u GROUP BY label, dim),
        ctr AS (SELECT clab, list(s ORDER BY dim) AS cv
                FROM c GROUP BY clab),
        s AS (SELECT b.vec_id, b.label, ctr.clab,
                     round(list_cosine_similarity(b.q, ctr.cv), 4)
                         AS cos
              FROM b CROSS JOIN ctr),
        r AS (SELECT vec_id, label, clab,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY cos DESC, clab) AS rn
              FROM s)
        SELECT label, clab AS pred, count(*)::BIGINT AS n
        FROM r WHERE rn = 1 GROUP BY label, clab
    """
    out["docs_schema_evolution"] = f"""
        WITH v2 AS (
          SELECT doc_id + {_OFFSET} AS doc_id, lang,
                 (CASE doc_id % 3 WHEN 0 THEN 'gold'
                                  WHEN 1 THEN 'silver'
                                  ELSE 'bronze' END) AS quality_tier
          FROM documents
        ),
        u AS (
          SELECT doc_id, lang, n_chars, NULL::VARCHAR AS quality_tier
          FROM documents
          UNION ALL
          SELECT doc_id, lang, NULL::BIGINT, quality_tier FROM v2
        )
        SELECT lang, count(*)::BIGINT AS n_docs,
               count(n_chars)::BIGINT AS n_with_chars,
               count(quality_tier)::BIGINT AS n_with_tier
        FROM u GROUP BY lang
    """
    out["kg_adamic_adar"] = f"""
        WITH edges AS ({kg_edges_sql}),
        und AS (SELECT DISTINCT least(_from, _to) AS u,
                       greatest(_from, _to) AS v
                FROM edges WHERE _from <> _to),
        arcs AS (SELECT u AS h, v AS x FROM und
                 UNION ALL SELECT v, u FROM und),
        deg AS (SELECT h, count(*)::BIGINT AS d FROM arcs GROUP BY h),
        w AS (SELECT h, CASE WHEN d >= 2
                             THEN floor(1000000 / ln(d::DOUBLE))::BIGINT
                             ELSE 0::BIGINT END AS w
              FROM deg),
        pairs AS (
          SELECT a1.x AS u, a2.x AS v, sum(w.w)::BIGINT AS aa_e6
          FROM arcs a1
          JOIN arcs a2 ON a1.h = a2.h AND a1.x < a2.x
          JOIN w ON w.h = a1.h
          GROUP BY a1.x, a2.x)
        SELECT p.u, p.v, p.aa_e6
        FROM pairs p
        WHERE NOT EXISTS (SELECT 1 FROM und e
                          WHERE e.u = p.u AND e.v = p.v)
        ORDER BY p.aa_e6 DESC, p.u, p.v
        LIMIT 20
    """
    out["kg_pred_cardinality"] = f"""
        WITH edges AS ({kg_edges_sql}),
        a AS (SELECT DISTINCT _from, pred, _to FROM edges),
        o AS (SELECT pred, _from, count(*)::BIGINT AS n FROM a
              GROUP BY pred, _from),
        i AS (SELECT pred, _to, count(*)::BIGINT AS n FROM a
              GROUP BY pred, _to),
        mo AS (SELECT pred, max(n)::BIGINT AS max_out FROM o
               GROUP BY pred),
        mi AS (SELECT pred, max(n)::BIGINT AS max_in FROM i
               GROUP BY pred)
        SELECT mo.pred, max_out, max_in,
               CASE WHEN max_out = 1 AND max_in = 1 THEN '1:1'
                    WHEN max_out = 1 THEN 'N:1'
                    WHEN max_in = 1 THEN '1:N'
                    ELSE 'N:M' END AS card_class
        FROM mo JOIN mi USING (pred)
    """
    out["events_gap_cv"] = """
        WITH s AS (SELECT event_type, epoch_us(ts) AS t,
                          lag(epoch_us(ts)) OVER (
                              PARTITION BY event_type
                              ORDER BY ts, event_id) AS pt
                   FROM events),
        g AS (SELECT event_type, (t - pt)::HUGEINT AS gap FROM s
              WHERE pt IS NOT NULL),
        m AS (SELECT event_type, count(*)::HUGEINT AS n, sum(gap) AS s,
                     sum(gap * gap) AS ss
              FROM g GROUP BY event_type)
        SELECT event_type, n::BIGINT AS n_gaps,
               floor((10000 * (n * ss - s * s))::DOUBLE
                     / (s * s)::DOUBLE)::BIGINT AS cv2_bp
        FROM m WHERE s > 0
    """
    out["text_cond_entropy"] = _TOKS_CTE + """
        , u AS (SELECT doc_id, unnest(toks) AS tok,
                       generate_subscripts(toks, 1) AS pos
                FROM t),
        b AS (SELECT tok AS x, lead(tok) OVER w AS y
              FROM u WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        c AS (SELECT x, y, count(*)::BIGINT AS n FROM b
              WHERE y IS NOT NULL GROUP BY x, y),
        ux AS (SELECT x, sum(n)::BIGINT AS nx FROM c GROUP BY x),
        tt AS (SELECT sum(n)::BIGINT AS total FROM c)
        SELECT tt.total AS n_bigrams,
               sum(floor((1000000 * c.n) * ln(ux.nx::DOUBLE / c.n)
                         / tt.total))::BIGINT AS h_cond_e6
        FROM c JOIN ux USING (x), tt
        GROUP BY tt.total
    """
    out["docs_source_jaccard"] = _TOKS_CTE + """
        , u AS (SELECT source, unnest(toks) AS tok,
                       generate_subscripts(toks, 1) AS pos, doc_id
                FROM (SELECT d.source, t.toks, t.doc_id
                      FROM t JOIN documents d USING (doc_id))),
        g0 AS (SELECT source, tok || ' ' || lead(tok, 1) OVER w || ' '
                          || lead(tok, 2) OVER w AS ngram
               FROM u WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        g AS (SELECT DISTINCT source, ngram FROM g0
              WHERE ngram IS NOT NULL),
        sz AS (SELECT source, count(*)::BIGINT AS sz FROM g
               GROUP BY source),
        inter AS (SELECT a.source AS source_a, b.source AS source_b,
                         count(*)::BIGINT AS n_inter
                  FROM g a JOIN g b
                    ON b.ngram = a.ngram AND b.source > a.source
                  GROUP BY a.source, b.source)
        SELECT i.source_a, i.source_b, i.n_inter,
               ((10000 * i.n_inter)
                // (sa.sz + sb.sz - i.n_inter))::BIGINT AS jaccard_bp
        FROM inter i
        JOIN sz sa ON sa.source = i.source_a
        JOIN sz sb ON sb.source = i.source_b
    """
    out["events_stickiness"] = """
        WITH k AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 86400000000 AS day,
                          (epoch_us(ts) // 86400000000) // 30 AS month
                   FROM events),
        dau AS (SELECT day, month, count(DISTINCT user_id)::BIGINT
                           AS dau
                FROM k GROUP BY day, month),
        mau AS (SELECT month, count(DISTINCT user_id)::BIGINT AS mau
                FROM k GROUP BY month)
        SELECT dau.day::BIGINT AS day, dau.dau, mau.mau,
               ((10000 * dau.dau) // mau.mau)::BIGINT AS stickiness_bp
        FROM dau JOIN mau USING (month)
    """
    out["kg_rich_club"] = f"""
        WITH edges AS ({kg_edges_sql}),
        und AS (SELECT DISTINCT least(_from, _to) AS u,
                       greatest(_from, _to) AS v
                FROM edges WHERE _from <> _to),
        deg AS (SELECT x, count(*)::BIGINT AS n FROM (
                  SELECT u AS x FROM und UNION ALL SELECT v FROM und)
                GROUP BY x),
        kk AS (SELECT quantile_disc(n, 0.9)::BIGINT AS k FROM deg),
        rich AS (SELECT x FROM deg, kk WHERE n >= kk.k),
        nr AS (SELECT count(*)::BIGINT AS n_rich FROM rich),
        m AS (SELECT count(*)::BIGINT AS m_rich FROM und
              WHERE u IN (SELECT x FROM rich)
                AND v IN (SELECT x FROM rich))
        SELECT kk.k AS k_threshold, nr.n_rich, m.m_rich,
               (CASE WHEN nr.n_rich >= 2
                     THEN (10000 * m.m_rich)
                          // (nr.n_rich * (nr.n_rich - 1) // 2)
                     ELSE 0 END)::BIGINT AS phi_bp
        FROM kk, nr, m
    """
    # HLL set algebra: two sketches + register-wise max merge,
    # inclusion-exclusion intersect — hll spec replayed three times
    from raygraph.ops.sketch import ALPHA_E6 as _HA, M as _HM, W as _HW

    def _hll_regs(flt: str, name: str) -> str:
        return f"""
        h{name} AS (
          SELECT DISTINCT
                 ('0x' || substr(md5(user_id::VARCHAR), 1, 15))
                 ::BIGINT AS h
          FROM events WHERE {flt}
        ),
        r{name} AS (
          SELECT h >> {_HW} AS j,
                 max(CASE WHEN (h & ((1::BIGINT << {_HW}) - 1)) = 0
                     THEN {_HW + 1}
                     ELSE {_HW + 1} - length(bin(
                       h & ((1::BIGINT << {_HW}) - 1))) END) AS mj
          FROM h{name} GROUP BY 1
        ),
        s{name} AS (
          SELECT (sum(1::HUGEINT << (60 - mj))
                  + ({_HM} - count(*)) * (1::HUGEINT << 60)) AS S
          FROM r{name}
        ),
        e{name} AS (
          SELECT (({_HA}::HUGEINT * {_HM} * {_HM}
                   * (1::HUGEINT << 60) * 10000)
                  // (1000000::HUGEINT * S))::BIGINT AS est
          FROM s{name}
        )"""

    out["events_hll_algebra"] = ("WITH "
        + _hll_regs("event_type = (SELECT min(event_type) FROM events)",
                    "a") + ","
        + _hll_regs("event_type = (SELECT max(event_type) FROM events)",
                    "b") + """,
        ru AS (SELECT j, max(mj) AS mj FROM
               (SELECT * FROM ra UNION ALL SELECT * FROM rb)
               GROUP BY j),
        su AS (SELECT (sum(1::HUGEINT << (60 - mj))
                       + (""" + str(_HM) + """ - count(*))
                       * (1::HUGEINT << 60)) AS S FROM ru),
        eu AS (SELECT ((""" + str(_HA) + "::HUGEINT * "
        + str(_HM) + " * " + str(_HM) + """
                        * (1::HUGEINT << 60) * 10000)
                       // (1000000::HUGEINT * S))::BIGINT AS est
               FROM su)
        SELECT ea.est AS a_e4, eb.est AS b_e4, eu.est AS union_e4,
               (ea.est + eb.est - eu.est)::BIGINT AS intersect_e4
        FROM ea CROSS JOIN eb CROSS JOIN eu
    """)
    # CUPED: HUGEINT moments, one final ::DOUBLE divide
    out["events_cuped"] = """
        WITH dr AS (SELECT min(epoch_us(ts) // 86400000000) AS dmin,
                           max(epoch_us(ts) // 86400000000) AS dmax
                    FROM events),
        u AS (
          SELECT user_id,
                 sum(CASE WHEN epoch_us(ts) // 86400000000
                     < (dmin + dmax + 1) // 2
                     THEN CAST(trunc(value * 100) AS BIGINT)
                     ELSE 0 END)::BIGINT AS x,
                 sum(CASE WHEN epoch_us(ts) // 86400000000
                     < (dmin + dmax + 1) // 2
                     THEN 0
                     ELSE CAST(trunc(value * 100) AS BIGINT)
                     END)::BIGINT AS y
          FROM events CROSS JOIN dr GROUP BY user_id
        ),
        mo AS (
          SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
                 sum(y)::HUGEINT AS sy,
                 sum(x::HUGEINT * x)::HUGEINT AS sxx,
                 sum(x::HUGEINT * y)::HUGEINT AS sxy
          FROM u
        ),
        ar AS (
          SELECT user_id % 2 AS arm, count(*)::HUGEINT AS n_arm,
                 sum(x)::HUGEINT AS sx_a, sum(y)::HUGEINT AS sy_a
          FROM u GROUP BY 1
        )
        SELECT ar.arm::BIGINT AS arm, ar.n_arm::BIGINT AS n_users,
               (ar.sy_a // ar.n_arm)::BIGINT AS raw_mean_c,
               CAST(floor(
                 ((mo.n * mo.sxx - mo.sx * mo.sx) * mo.n * ar.sy_a
                  - (mo.n * mo.sxy - mo.sx * mo.sy)
                    * (mo.n * ar.sx_a - ar.n_arm * mo.sx))::DOUBLE
                 / ((mo.n * mo.sxx - mo.sx * mo.sx) * mo.n
                    * ar.n_arm)::DOUBLE) AS BIGINT) AS adj_mean_c
        FROM ar CROSS JOIN mo
    """
    # bipartite projection: distinct (user, type:hour) incidences,
    # hub-capped contexts, pair self-join, shared-context count
    out["events_bipartite_proj"] = """
        WITH lr AS (
          SELECT DISTINCT user_id::VARCHAR AS l,
                 event_type || ':' ||
                 (epoch_us(ts) // 3600000000)::VARCHAR AS r
          FROM events
        ),
        deg AS (SELECT r, count(*)::BIGINT AS d FROM lr GROUP BY r),
        small AS (SELECT r FROM deg WHERE d <= 20),
        kept AS MATERIALIZED (SELECT l, r FROM lr JOIN small USING (r))
        SELECT a.l AS u, b.l AS v, count(*)::BIGINT AS n_shared
        FROM kept a JOIN kept b ON a.r = b.r AND a.l < b.l
        GROUP BY a.l, b.l
        HAVING count(*) >= 2
    """
    out["events_ab_arms"] = """
        WITH a AS (SELECT CASE WHEN ('0x' || substr(
                                  md5(user_id::VARCHAR), 1, 15))::BIGINT
                                  % 2 = 0
                               THEN 'A' ELSE 'B' END AS arm,
                          CAST(round(value * 10000) AS BIGINT) AS v
                   FROM events),
        g AS (SELECT arm, count(*)::BIGINT AS n, sum(v)::BIGINT AS s
              FROM a GROUP BY arm)
        SELECT (SELECT n FROM g WHERE arm = 'A') AS n_a,
               (SELECT n FROM g WHERE arm = 'B') AS n_b,
               (SELECT s // n FROM g WHERE arm = 'A')::BIGINT
                   AS mean_a_e4,
               (SELECT s // n FROM g WHERE arm = 'B')::BIGINT
                   AS mean_b_e4,
               ((SELECT s // n FROM g WHERE arm = 'A')
                - (SELECT s // n FROM g WHERE arm = 'B'))::BIGINT
                   AS diff_e4
    """
    out["docs_code_score"] = """
        SELECT doc_id,
               ((10000 * len(regexp_extract_all(text, '[{};=<>()#]')))
                // greatest(length(text), 1))::BIGINT AS code_bp,
               ((10000 * len(regexp_extract_all(text, '[{};=<>()#]')))
                // greatest(length(text), 1)) >= 300 AS is_code
        FROM documents
    """
    out["orders_size_hist"] = """
        WITH per_order AS (SELECT l_orderkey,
                                  count(*)::BIGINT AS n_items
                           FROM lineitem GROUP BY l_orderkey)
        SELECT n_items, count(*)::BIGINT AS n_orders
        FROM per_order GROUP BY n_items
    """
    out["kg_bfs_hist"] = (
        "SELECT dist, count(*)::BIGINT AS n_vertices FROM ("
        + _bfs_sql(kg_edges_sql, iters=3)
        + ") GROUP BY dist")
    out["events_cohort_revenue"] = """
        WITH f AS (SELECT user_id,
                          ((epoch_us(min(ts)) // 86400000000 + 3) // 7)
                              ::BIGINT AS cohort_week
                   FROM events GROUP BY user_id),
        t AS (SELECT f.cohort_week,
                     (((epoch_us(e.ts) // 86400000000 + 3) // 7)
                      - f.cohort_week)::BIGINT AS age_weeks,
                     CAST(round(e.value * 10000) AS BIGINT) AS v
              FROM events e JOIN f USING (user_id))
        SELECT cohort_week, age_weeks,
               sum(v)::BIGINT AS revenue_e4,
               count(*)::BIGINT AS n_events
        FROM t GROUP BY cohort_week, age_weeks
    """
    out["events_dow_profile"] = """
        SELECT ((epoch_us(ts) // 86400000000 + 4) % 7)::BIGINT AS dow,
               sum(CAST(round(value * 10000) AS BIGINT))::BIGINT
                   AS sum_e4,
               count(*)::BIGINT AS n_events
        FROM events GROUP BY dow
    """
    out["events_bounce_rate"] = """
        WITH o AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > 1800000000
                      THEN 1 ELSE 0 END AS ns
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (SELECT user_id, sum(ns) OVER (PARTITION BY user_id
                                            ORDER BY ts) AS sid
              FROM o),
        c AS (SELECT user_id, sid, count(*)::BIGINT AS ne FROM s
              GROUP BY user_id, sid)
        SELECT count(*)::BIGINT AS n_sessions,
               sum(CASE WHEN ne = 1 THEN 1 ELSE 0 END)::BIGINT
                   AS n_bounce,
               ((10000 * sum(CASE WHEN ne = 1 THEN 1 ELSE 0 END))
                // count(*))::BIGINT AS bounce_bp
        FROM c
    """
    # lenient-ingest good rows == the pristine table: shared profile
    out["docs_from_jsonl_lenient"] = out["docs_from_jsonl"]
    out["kg_degree_gini"] = f"""
        WITH edges AS ({kg_edges_sql}),
        und AS (SELECT DISTINCT least(_from, _to) AS u,
                       greatest(_from, _to) AS v
                FROM edges WHERE _from <> _to),
        deg AS (SELECT x AS vtx, count(*)::HUGEINT AS d FROM (
                  SELECT u AS x FROM und UNION ALL SELECT v FROM und)
                GROUP BY x),
        r AS (SELECT d,
                     row_number() OVER (ORDER BY d, vtx) AS i,
                     count(*) OVER ()::HUGEINT AS n,
                     sum(d) OVER ()::HUGEINT AS sx
              FROM deg)
        SELECT max(n)::BIGINT AS n_vertices,
               ((10000 * (2 * sum(i * d) - (max(n) + 1) * max(sx)))
                // (max(n) * max(sx)))::BIGINT AS gini_bp
        FROM r
    """
    out["docs_length_log_hist"] = _TOKS_CTE + """
        , c AS (SELECT len(toks)::BIGINT AS n FROM t WHERE len(toks) >= 1)
        SELECT floor(log2(n::DOUBLE))::BIGINT AS log2_tokens,
               count(*)::BIGINT AS n_docs
        FROM c GROUP BY 1
    """
    out["orders_first_repeat"] = """
        WITH f AS (SELECT o_custkey, min(o_orderdate) AS fd
                   FROM orders GROUP BY o_custkey)
        SELECT CASE WHEN o.o_orderdate = f.fd THEN 'first'
                    ELSE 'repeat' END AS kind,
               sum(CAST(round(o.o_totalprice * 100) AS BIGINT))::BIGINT
                   AS sum_cents,
               count(*)::BIGINT AS n_orders
        FROM orders o JOIN f USING (o_custkey)
        GROUP BY 1
    """
    out["events_session_depth"] = """
        WITH o AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > 1800000000
                      THEN 1 ELSE 0 END AS ns
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (SELECT user_id, sum(ns) OVER (PARTITION BY user_id
                                            ORDER BY ts) AS sid
              FROM o),
        c AS (SELECT count(*)::BIGINT AS ne FROM s
              GROUP BY user_id, sid)
        SELECT quantile_disc(ne, 0.5)::BIGINT AS p50,
               quantile_disc(ne, 0.9)::BIGINT AS p90,
               quantile_disc(ne, 0.99)::BIGINT AS p99
        FROM c
    """
    out["orders_max_drawdown"] = """
        WITH r AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                          sum(CAST(round(o_totalprice * 100)
                                   AS BIGINT))::BIGINT AS cents
                   FROM orders GROUP BY day),
        s AS (SELECT day,
                     (max(cents) OVER (ORDER BY day) - cents)::BIGINT
                         AS dd
              FROM r),
        x AS (SELECT day, dd,
                     row_number() OVER (ORDER BY dd DESC, day) AS rn
              FROM s)
        SELECT (SELECT count(*)::BIGINT FROM r) AS n_days,
               dd AS max_drawdown_cents, day::BIGINT AS drawdown_day
        FROM x WHERE rn = 1
    """
    out["docs_vocab_growth"] = _TOKS_CTE + """
        , u AS (SELECT doc_id, unnest(toks) AS token FROM t),
        f AS (SELECT token, min(doc_id) AS fd FROM u GROUP BY token),
        nn AS (SELECT count(*)::BIGINT AS n FROM documents),
        d AS (SELECT least(f.fd * 10 // nn.n, 9) + 1 AS decile
              FROM f, nn),
        c AS (SELECT decile, count(*)::BIGINT AS n_new FROM d
              GROUP BY decile),
        g AS (SELECT unnest(generate_series(1, 10)) AS decile)
        SELECT g.decile::BIGINT AS decile,
               (SELECT coalesce(sum(n_new), 0)::BIGINT FROM c
                WHERE c.decile <= g.decile) AS vocab_size
        FROM g
    """
    out["kg_lineage"] = """
        WITH idx AS (SELECT row_number() OVER () - 1 AS i
                     FROM documents)
        SELECT 8::BIGINT AS n_partitions,
               (2 * count(*)
                + sum(CASE WHEN i % 7 = 3 THEN 1 ELSE 0 END))::BIGINT
                   AS triples_total
        FROM idx
    """
    out["lineitem_ship_delay"] = """
        SELECT ((epoch_us(l.l_shipdate) // 86400000000)
                - (epoch_us(o.o_orderdate) // 86400000000))::BIGINT
                   AS delay_days,
               count(*)::BIGINT AS n_lines
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1
    """
    out["text_suffix_profile"] = _TOKS_CTE + """
        , u AS (SELECT unnest(toks) AS token FROM t),
        s AS (SELECT right(token, 3) AS suffix FROM u
              WHERE length(token) >= 4)
        SELECT suffix, count(*)::BIGINT AS n FROM s
        GROUP BY suffix ORDER BY n DESC, suffix LIMIT 20
    """
    out["docs_email_domains"] = """
        WITH aug AS (
          SELECT doc_id,
                 text || CASE WHEN doc_id % 7 = 0
                              THEN ' mail: u' || doc_id || '@ex'
                                   || (doc_id % 10) || '.org'
                              ELSE '' END
                      || CASE WHEN doc_id % 11 = 0
                              THEN ' call '
                                   || lpad((doc_id % 1000)::VARCHAR,
                                           3, '0')
                                   || '-555-'
                                   || lpad((doc_id % 10000)::VARCHAR,
                                           4, '0')
                              ELSE '' END AS text
          FROM documents
        ),
        e AS (SELECT unnest(regexp_extract_all(text,
                  '[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\\.[A-Za-z0-9.-]+'))
                  AS email
              FROM aug)
        SELECT split_part(email, '@', -1) AS domain,
               count(*)::BIGINT AS n
        FROM e GROUP BY domain
    """
    out["events_slo_burn"] = """
        WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                          count(*)::BIGINT AS n,
                          sum(CASE WHEN event_type = 'error'
                                   THEN 1 ELSE 0 END)::BIGINT AS err
                   FROM events GROUP BY day),
        b AS (SELECT day, n, err,
                     ((10000 * err) // n)::BIGINT AS err_bp
              FROM d)
        SELECT day::BIGINT AS day, n, err, err_bp,
               sum(greatest(err_bp - 100, 0))
                   OVER (ORDER BY day)::BIGINT AS burn_bp
        FROM b
    """
    out["events_new_users"] = """
        WITH f AS (SELECT user_id,
                          min(epoch_us(ts) // 86400000000) AS fday
                   FROM events GROUP BY user_id),
        p AS (SELECT DISTINCT e.user_id,
                     epoch_us(e.ts) // 86400000000 AS day
              FROM events e),
        t AS (SELECT p.day,
                     CASE WHEN p.day = f.fday THEN 1 ELSE 0 END AS nw
              FROM p JOIN f USING (user_id))
        SELECT day::BIGINT AS day, count(*)::BIGINT AS n_active,
               sum(nw)::BIGINT AS n_new,
               (count(*) - sum(nw))::BIGINT AS n_returning
        FROM t GROUP BY day
    """
    out["docs_strip_markup"] = """
        WITH aug AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 9 = 0
                      THEN '<b>' || inner_t || '</b>' ELSE inner_t END
                     AS text
          FROM (SELECT doc_id,
                       CASE WHEN doc_id % 5 = 0
                            THEN '<p>' || text || '</p>' ELSE text END
                           AS inner_t
                FROM documents)
        )
        SELECT doc_id,
               len(regexp_extract_all(text, '</?[pb]>'))::BIGINT
                   AS n_tags,
               length(regexp_replace(text, '</?[pb]>', '', 'g'))::BIGINT
                   AS clean_len
        FROM aug
    """
    out["kg_edge_weight_hist"] = kg_base + """
        , ea AS (
          -- one row per (doc, edge): doc_count counts contributing
          -- DOCS (text+caption mentions of the same pair dedup per doc)
          SELECT 'entities/vertex_' || a AS f, 'connected_to' AS p,
                 'entities/vertex_' || b AS t FROM e
          UNION ALL
          SELECT 'entities/vertex_' || a, 'is_a', 'entities/node'
          FROM e WHERE i % 7 = 3
        ),
        c AS (SELECT f, p, t, count(*)::BIGINT AS doc_count FROM ea
              GROUP BY f, p, t)
        SELECT doc_count, count(*)::BIGINT AS n_edges FROM c
        GROUP BY doc_count
    """
    out["kg_scc"] = _scc_sql(kg_edges_sql, iters=5)
    out["events_asof_forward"] = """
        WITH r0 AS (
          SELECT user_id, ts, value FROM events
          WHERE (epoch_us(ts) // 1000000) % 10 = 0
        ),
        r AS (SELECT user_id, ts, max(value) AS value_matched
              FROM r0 GROUP BY user_id, ts)
        SELECT l.user_id, l.ts, l.value,
               r.value_matched, r.ts AS ts_matched
        FROM events l
        ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts <= r.ts
    """
    out["events_conversion_time"] = """
        WITH su AS (SELECT user_id, min(ts) AS s FROM events
                    WHERE event_type = 'signup' GROUP BY user_id),
        pu AS (SELECT e.user_id,
                      min(epoch_us(e.ts) - epoch_us(su.s))::BIGINT
                          AS gap_us
               FROM events e JOIN su USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts >= su.s
               GROUP BY e.user_id),
        g AS (SELECT (gap_us // 1000000)::BIGINT AS gap_s FROM pu)
        SELECT count(*)::BIGINT AS n_converted,
               quantile_disc(gap_s, 0.5)::BIGINT AS p50_s,
               quantile_disc(gap_s, 0.9)::BIGINT AS p90_s
        FROM g
    """
    # quality-gate curation survivors over the punctuation-augmented
    # corpus (synthetic docs carry no sentence punctuation, so an
    # id-derived 'fin. ' tail is injected identically on both sides —
    # the established injection discipline); rule logic repeats the
    # gopher/c4 oracles verbatim, parameterized on the aug CTE
    out["docs_curate_quality"] = """
        WITH aug AS (
          SELECT doc_id,
                 text || ' ' || repeat('fin. ', (doc_id % 5)::INT)
                     AS text,
                 n_chars
          FROM documents
        ),
        gd AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(
                          lower(trim(text)), '\\s+') END AS toks,
                 length(regexp_replace(text, '\\s', '', 'g'))
                     AS wchars,
                 string_split(text, chr(10)) AS lines
          FROM aug
        ),
        gf AS (
          SELECT doc_id, len(toks)::BIGINT AS ntok,
                 wchars::BIGINT AS wchars,
                 len(list_filter(toks,
                     x -> regexp_matches(x, '[a-z]')))::BIGINT
                     AS nalpha,
                 len(list_filter(toks,
                     x -> x IN ('the','be','to','of','and','that',
                                'have','with')))::BIGINT AS nstop,
                 len(lines)::BIGINT AS nlines,
                 len(list_filter(lines,
                     l -> regexp_matches(ltrim(l), '^[-*]')))
                     ::BIGINT AS nbullet
          FROM gd
        ),
        g AS (
          SELECT doc_id FROM gf
          WHERE ntok BETWEEN 50 AND 100000
            AND floor(10000.0 * wchars / greatest(ntok, 1))
                BETWEEN 30000 AND 100000
            AND floor(10000.0 * nalpha / greatest(ntok, 1)) >= 8000
            AND nstop >= 2
            AND floor(10000.0 * nbullet / greatest(nlines, 1)) <= 9000
        ),
        c AS (
          SELECT doc_id FROM (
            SELECT doc_id,
                   len(list_filter(string_split(text, chr(10)),
                       l -> regexp_matches(rtrim(l), '[.!?"]$')))
                       ::BIGINT AS n_kept,
                   len(regexp_extract_all(text, '[.!?]+'))::BIGINT
                       AS n_sentences,
                   contains(text, '{') AS has_brace,
                   contains(lower(text), 'lorem ipsum') AS has_lorem
            FROM aug)
          WHERE n_sentences >= 3 AND n_kept >= 1
            AND NOT has_brace AND NOT has_lorem
        )
        SELECT a.doc_id, a.n_chars
        FROM aug a
        JOIN g ON g.doc_id = a.doc_id
        JOIN c ON c.doc_id = a.doc_id
    """

    out["orders_zonemap_prune"] = """
        SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
               sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
                   AS sum_cents
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
        GROUP BY o_orderpriority
    """
    return out
