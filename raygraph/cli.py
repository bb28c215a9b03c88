"""Command-line entry point — runnable directly or via ``ray job submit``.

    # full KG construction over a corpus directory
    python -m raygraph.cli build --input /data/corpus --output /data/kg \
        --partitions 64 [--resume]

    # generate a deterministic synthetic corpus (tests/bench)
    python -m raygraph.cli synth --n-docs 100000 --output /tmp/corpus

    # export a graph database directory (GraphLoader parity surface)
    python -m raygraph.cli export --db /data/db --graph MyGraph \
        --output /tmp/export

Owns the Ray session (guarded init — under ``ray job submit`` the session
already exists).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

from .errors import GraphBuildError


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
            kwargs["address"] = "local"
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_build(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .config import GraphBuildConfig
    from .pipeline import build_graph

    cfg = GraphBuildConfig(
        input_path=args.input,
        output_path=args.output,
        num_partitions=args.partitions,
        batch_size=args.batch_size,
        resume=args.resume,
        vertex_collection=args.vertex_collection,
        edge_collection=args.edge_collection,
        canon_strategy=args.canon_strategy,
        extract_mode=args.extract_mode,
        alias_shards=args.alias_shards,
    )
    aliases = None
    if args.aliases:
        with open(args.aliases) as fh:
            aliases = json.load(fh)
    res = build_graph(cfg, aliases=aliases)
    print(json.dumps({"vertices": res.vertices_path, "edges": res.edges_path,
                      "triples": res.triples_path, **res.metrics}))
    ray.shutdown()
    return 0


def cmd_merge(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .config import GraphBuildConfig
    from .pipeline import merge_delta

    cfg = GraphBuildConfig(
        input_path=args.input,   # replaced by merge_delta; kept for validate
        output_path=args.output,
        num_partitions=args.partitions,
        batch_size=args.batch_size,
        vertex_collection=args.vertex_collection,
        edge_collection=args.edge_collection,
        canon_strategy=args.canon_strategy,
    )
    aliases = None
    if args.aliases:
        with open(args.aliases) as fh:
            aliases = json.load(fh)
    res = merge_delta(cfg, args.input, aliases=aliases, resume=args.resume)
    print(json.dumps({"vertices": res.vertices_path, "edges": res.edges_path,
                      "triples": res.triples_path, **res.metrics}))
    ray.shutdown()
    return 0


def cmd_synth(args) -> int:
    from . import synth

    synth.write_corpus(args.output, args.n_docs)
    print(json.dumps({"output": args.output, "n_docs": args.n_docs}))
    return 0


def cmd_export(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .exporter import load_named_graph

    loader = load_named_graph(args.db, args.graph,
                              vertex_fields=tuple(args.vertex_fields or ()),
                              edge_fields=tuple(args.edge_fields or ()))
    import os

    loader.vertex_dataset().write_parquet(os.path.join(args.output, "vertices"))
    loader.edge_dataset().write_parquet(os.path.join(args.output, "edges"))
    print(json.dumps({"output": args.output}))
    ray.shutdown()
    return 0


def cmd_compact(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .maintenance import compact_table

    stats = compact_table(args.input, args.output,
                          target_rows_per_file=args.target_rows,
                          resume=args.resume)
    print(json.dumps({"input": args.input, "output": args.output, **stats}))
    ray.shutdown()
    return 0


def cmd_delete(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .maintenance import delete_where

    stats = delete_where(args.input, args.col, args.op, args.value)
    print(json.dumps({"input": args.input, "col": args.col,
                      "op": args.op, "value": args.value, **stats}))
    ray.shutdown()
    return 0


def cmd_upsert(args) -> int:
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .maintenance import upsert_table

    stats = upsert_table(args.input, rd.read_parquet(args.updates),
                         args.key)
    print(json.dumps({"input": args.input, "updates": args.updates,
                      "key": args.key, **stats}))
    ray.shutdown()
    return 0


def cmd_dedup(args) -> int:
    ray = _ray_session(args.num_cpus)
    import os

    from . import io as rio
    from .ops.dedup import (exact_dedup_incremental,
                            minhash_dedup_incremental)

    delta = rio.read_table(args.input)
    if args.near:
        surv, epoch = minhash_dedup_incremental(
            delta, args.index, threshold=args.threshold,
            num_perm=args.num_perm,
            bands=args.bands, shingle=args.shingle,
            text_col=args.text_col, id_col=args.id_col,
            verify=args.verify, drop_strategy=args.drop_strategy)
    else:
        surv, epoch = exact_dedup_incremental(
            delta, args.index, text_col=args.text_col,
            id_col=args.id_col)
    n = surv.count()
    if args.output:
        from . import stateio

        stateio.makedirs(args.output)
        stateio.ray_write_parquet(surv, args.output)
    print(json.dumps({"input": args.input, "index": args.index,
                      "epoch": epoch, "survivors": n,
                      "output": args.output}))
    ray.shutdown()
    return 0


def cmd_lsh_stats(args) -> int:
    ray = _ray_session(args.num_cpus)
    from . import io as rio
    from .ops.dedup import lsh_bucket_stats

    ds = rio.read_table(args.input)
    stats = lsh_bucket_stats(
        ds, num_perm=args.num_perm,
        bands=args.bands, shingle=args.shingle,
        text_col=args.text_col, id_col=args.id_col,
        group_col=args.group_col, cap=args.cap)
    print(json.dumps({"input": args.input, **stats}))
    ray.shutdown()
    return 0


def cmd_profile(args) -> int:
    ray = _ray_session(args.num_cpus)
    from . import io as rio
    from .ops.relational import dataset_arrow_schema, profile_columns

    ds = rio.read_table(args.input)
    cols = args.columns.split(",") if args.columns \
        else dataset_arrow_schema(ds).names
    df = profile_columns(ds, cols)
    print(json.dumps({"input": args.input,
                      "columns": df.to_dict("records")}))
    ray.shutdown()
    return 0


def cmd_prepare(args) -> int:
    ray = _ray_session(args.num_cpus)
    import os

    from . import io as rio
    from .curate import compile_spec
    from .ops.relational import cogroup_join, epoch_shuffle
    from .ops.text import pack_sequences

    ds = rio.read_table(args.input)
    if args.spec:
        with open(args.spec) as fh:
            spec = json.load(fh)
        _, staged = compile_spec(ds, spec)
        ds = staged[-1] if staged else ds
    # ds fans out THREE ways below (shuffle keys, the pos join, the
    # text attach) — materialize once so the read+spec doesn't
    # re-execute per consumer; also surfaces the zero-survivor case
    ds = ds.materialize()
    from . import stateio

    if ds.count() == 0:
        # a spec that filters every row: emit an honest all-zero
        # report instead of crashing on an empty shuffle/report glob
        stateio.makedirs(args.output)
        report = {"input": args.input, "output": args.output,
                  "seq_len": args.seq_len, "seed": args.seed,
                  "n_docs": 0, "total_tokens": 0, "n_packs": 0}
        stateio.write_json_atomic(
            stateio.join(args.output, "_report.json"), report, indent=1)
        print(json.dumps(report))
        ray.shutdown()
        return 0
    pos = epoch_shuffle(ds.select_columns(["doc_id"]), seed=args.seed)
    with_pos = cogroup_join(ds, pos, on="doc_id")
    meta = pack_sequences(with_pos, budget=args.seq_len,
                          order_col="position")

    def texts(batch):
        import pyarrow as pa

        return pa.table({"doc_id": batch.column("doc_id"),
                         "__text": batch.column("text")})

    full = cogroup_join(meta, ds.map_batches(texts,
                                             batch_format="pyarrow"),
                        on="doc_id")
    stateio.makedirs(args.output)
    docs_dir = stateio.join(args.output, "docs")
    stateio.ray_write_parquet(full, docs_dir)
    # a spec that filters every row writes NO parquet files — the
    # report read would raise; emit an honest all-zero report instead
    # (mirrors run_curation's has_files guard)
    if stateio.data_files(docs_dir):
        from ray.data.aggregate import Max, Sum

        back = stateio.ray_read_parquet(
            docs_dir, columns=["n_tokens", "pack_id"])
        row = back.aggregate(Sum("n_tokens"), Max("pack_id"))
        st = (back.count(), row["sum(n_tokens)"],
              row["max(pack_id)"] + 1)
    else:
        st = (0, 0, 0)
    report = {"input": args.input, "output": args.output,
              "seq_len": args.seq_len, "seed": args.seed,
              "n_docs": int(st[0]), "total_tokens": int(st[1] or 0),
              "n_packs": int(st[2] or 0)}
    stateio.write_json_atomic(
        stateio.join(args.output, "_report.json"), report, indent=1)
    print(json.dumps(report))
    ray.shutdown()
    return 0


def cmd_index_compact(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .ops.dedup import compact_dedup_index

    stats = compact_dedup_index(args.index)
    print(json.dumps({"index": args.index, **stats}))
    ray.shutdown()
    return 0


def cmd_vacuum(args) -> int:
    from .maintenance import vacuum

    stats = vacuum(args.input)
    print(json.dumps({"input": args.input, **stats}))
    return 0


def cmd_asof(args) -> int:
    ray = _ray_session(args.num_cpus)
    import os
    from . import stateio
    from .config import GraphBuildConfig
    from .pipeline import graph_asof

    cfg = GraphBuildConfig(input_path=args.kg, output_path=args.kg,
                           num_partitions=args.partitions)
    vertices, edges = graph_asof(cfg, args.epoch)
    vp = stateio.join(args.output, "vertices")
    ep = stateio.join(args.output, "edges")
    for d in (vp, ep):
        stateio.rmtree(d)
    stateio.makedirs(args.output)
    stateio.ray_write_parquet(vertices, vp)
    stateio.ray_write_parquet(edges, ep)
    print(json.dumps({
        "kg": args.kg, "epoch": args.epoch,
        "vertices": vp, "edges": ep,
        "n_vertices": sum(stateio.pq_read_metadata(f).num_rows
                          for f in stateio.data_files(vp)),
        "n_edges": sum(stateio.pq_read_metadata(f).num_rows
                       for f in stateio.data_files(ep)),
    }))
    ray.shutdown()
    return 0


def cmd_forget(args) -> int:
    ray = _ray_session(args.num_cpus)
    from . import stateio
    from .config import GraphBuildConfig
    from .pipeline import graph_forget

    cfg = GraphBuildConfig(input_path=args.kg, output_path=args.kg,
                           num_partitions=args.partitions)
    if stateio.isdir(args.deletions) or args.deletions.endswith(".parquet"):
        keys = stateio.ray_read_parquet(args.deletions,
                                        columns=["doc_id"])
        vertices, edges = graph_forget(cfg, deletions=keys)
        n_gone = keys.count()
    else:
        gone = [d for d in args.deletions.split(",") if d]
        vertices, edges = graph_forget(cfg, deleted_doc_ids=gone)
        n_gone = len(gone)
    vp = stateio.join(args.output, "vertices")
    ep = stateio.join(args.output, "edges")
    for d in (vp, ep):
        stateio.rmtree(d)
    stateio.makedirs(args.output)
    stateio.ray_write_parquet(vertices, vp)
    stateio.ray_write_parquet(edges, ep)
    print(json.dumps({
        "kg": args.kg, "deleted_docs": n_gone,
        "vertices": vp, "edges": ep,
        "n_vertices": sum(stateio.pq_read_metadata(f).num_rows
                          for f in stateio.data_files(vp)),
        "n_edges": sum(stateio.pq_read_metadata(f).num_rows
                       for f in stateio.data_files(ep)),
    }))
    ray.shutdown()
    return 0


def cmd_validate(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .io import read_table
    from .ops.validate import check_rules

    with open(args.rules) as fh:
        rules = json.load(fh)
    report = check_rules(read_table(args.input), rules)
    total = int(report["n_violations"].sum())
    print(json.dumps({
        "input": args.input,
        "rules": len(rules),
        "total_violations": total,
        "by_rule": dict(zip(report["rule"],
                            report["n_violations"].astype(int))),
    }))
    ray.shutdown()
    return 0 if (total == 0 or not args.strict) else 3


def cmd_curate(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .curate import run_curation

    with open(args.spec) as fh:
        spec = json.load(fh)
    if args.partitions:
        from .curate import run_curation_partitioned

        report = run_curation_partitioned(
            args.input, args.output, spec,
            partitions=args.partitions, resume=args.resume,
            jobs=args.jobs)
    else:
        report = run_curation(args.input, args.output, spec,
                              mode="stream" if args.stream
                              else "funnel")
    print(json.dumps(report))
    ray.shutdown()
    return 0


def cmd_cluster(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .maintenance import cluster_table

    stats = cluster_table(args.input, args.output, col=args.col,
                          n_tiles=args.tiles, resume=args.resume)
    print(json.dumps({"input": args.input, "output": args.output,
                      "col": args.col, **stats}))
    ray.shutdown()
    return 0


def _load_registry():
    """Import the repo-root ``__ray_entry__`` registry (the driver
    contract doubles as the user-facing query catalog). Works both from
    the repo root and from an installed package next to the file."""
    import importlib
    import os

    try:
        return importlib.import_module("__ray_entry__")
    except ModuleNotFoundError:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, root)
        return importlib.import_module("__ray_entry__")


def cmd_query(args) -> int:
    ray = _ray_session(args.num_cpus)
    mod = _load_registry()
    qs = mod.queries()
    if args.list or not args.name:
        for name in sorted(qs):
            print(name)
        ray.shutdown()
        return 0
    if args.name not in qs:
        print(f"unknown query: {args.name} (see --list)", file=sys.stderr)
        ray.shutdown()
        return 2
    res = qs[args.name](args.sf_dir)
    import pandas as pd
    import pyarrow as pa

    ray_ds = None
    if isinstance(res, pd.DataFrame):
        df = res
    elif isinstance(res, pa.Table):
        df = res.to_pandas()
    else:
        ray_ds = res
        df = res.to_pandas()
    if getattr(args, "stats", False):
        # per-stage wall/cpu/rows report from Ray Data's executor — the
        # profiling surface for "where did this query spend its time".
        # Driver-side results (pandas/arrow) have no distributed plan.
        if ray_ds is not None:
            print(ray_ds.stats(), file=sys.stderr)
        else:
            print("(result was computed driver-side; no Ray Data plan "
                  "to report)", file=sys.stderr)
    if args.output:
        import pyarrow.parquet as pq

        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       args.output)
    print(df.head(args.head).to_string())
    print(json.dumps({"query": args.name, "rows": len(df),
                      "columns": list(df.columns),
                      "output": args.output}))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    logging.getLogger("ray").setLevel(logging.ERROR)
    p = argparse.ArgumentParser(prog="raygraph")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="run KG construction")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--partitions", type=int, default=64)
    b.add_argument("--batch-size", type=int, default=4096)
    b.add_argument("--resume", action="store_true")
    b.add_argument("--aliases", help="JSON file: alias -> entity key")
    b.add_argument("--vertex-collection", default="entities")
    b.add_argument("--edge-collection", default="relations")
    b.add_argument("--canon-strategy", choices=("driver", "distributed"),
                   default="driver")
    b.add_argument("--extract-mode",
                   choices=("patterns", "patterns+frames"),
                   default="patterns",
                   help="add the verb-frame SVO family on pattern-miss "
                        "spans")
    b.add_argument("--alias-shards", type=int, default=8,
                   help="hash-shard count for the alias inventory "
                        "(1 = whole-index broadcast)")
    b.add_argument("--num-cpus", type=int)
    b.set_defaults(fn=cmd_build)

    m = sub.add_parser(
        "merge",
        help="merge a delta corpus into an existing build "
             "(incremental: phase A runs only on the delta)",
    )
    m.add_argument("--input", required=True, help="delta corpus dir")
    m.add_argument("--output", required=True, help="EXISTING build dir")
    m.add_argument("--partitions", type=int, default=64)
    m.add_argument("--batch-size", type=int, default=4096)
    m.add_argument("--resume", action="store_true",
                   help="re-enter a crashed merge epoch")
    m.add_argument("--aliases", help="JSON file: alias -> entity key")
    m.add_argument("--vertex-collection", default="entities")
    m.add_argument("--edge-collection", default="relations")
    m.add_argument("--canon-strategy", choices=("driver", "distributed"),
                   default="driver")
    m.add_argument("--num-cpus", type=int)
    m.set_defaults(fn=cmd_merge)

    s = sub.add_parser("synth", help="generate deterministic corpus")
    s.add_argument("--n-docs", type=int, required=True)
    s.add_argument("--output", required=True)
    s.set_defaults(fn=cmd_synth)

    e = sub.add_parser("export", help="export a graph database directory")
    e.add_argument("--db", required=True)
    e.add_argument("--graph", required=True)
    e.add_argument("--output", required=True)
    e.add_argument("--vertex-fields", nargs="*")
    e.add_argument("--edge-fields", nargs="*")
    e.add_argument("--num-cpus", type=int)
    e.set_defaults(fn=cmd_export)

    q = sub.add_parser(
        "query", help="run a catalog query (the driver-contract registry) "
                      "over a table directory")
    q.add_argument("name", nargs="?",
                   help="query name (omit with --list to enumerate)")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                   help="directory holding the parquet tables")
    q.add_argument("--list", action="store_true",
                   help="list available queries")
    q.add_argument("--output", help="write full result parquet here")
    q.add_argument("--head", type=int, default=10)
    q.add_argument("--stats", action="store_true",
                   help="print the Ray Data per-stage execution stats "
                        "to stderr after running")
    q.add_argument("--num-cpus", type=int)
    q.set_defaults(fn=cmd_query)

    c = sub.add_parser(
        "compact", help="rewrite a parquet table dir into target-sized "
                        "files, hive-partition-by-partition, resumable")
    c.add_argument("--input", required=True)
    c.add_argument("--output", required=True)
    c.add_argument("--target-rows", type=int, default=1_000_000)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--num-cpus", type=int)
    c.set_defaults(fn=cmd_compact)

    dl = sub.add_parser(
        "delete", help="write positional deletion vectors (merge-on-"
                       "read row deletes; data files untouched)")
    dl.add_argument("--input", required=True,
                    help="parquet table directory")
    dl.add_argument("--col", required=True)
    dl.add_argument("--op", required=True,
                    choices=["mod_eq", "eq", "lt", "ge"])
    dl.add_argument("--value", required=True,
                    help="op argument (mod_eq takes 'm:r')")
    dl.add_argument("--num-cpus", type=int)
    dl.set_defaults(fn=cmd_delete)

    up = sub.add_parser(
        "upsert", help="MERGE INTO a parquet table (merge-on-read: "
                       "old versions masked via deletion sidecars, "
                       "updates land as one committed file)")
    up.add_argument("--input", required=True,
                    help="parquet table directory")
    up.add_argument("--updates", required=True,
                    help="parquet file/dir with the update rows")
    up.add_argument("--key", required=True)
    up.add_argument("--num-cpus", type=int)
    up.set_defaults(fn=cmd_upsert)

    dd = sub.add_parser(
        "dedup", help="incremental exact dedup of a delta corpus "
                      "against a persisted content-hash index "
                      "(append-only epochs; the base corpus is never "
                      "rescanned)")
    dd.add_argument("--input", required=True,
                    help="delta corpus parquet dir")
    dd.add_argument("--index", required=True,
                    help="hash-index directory (created if absent)")
    dd.add_argument("--output",
                    help="write surviving rows here as parquet")
    dd.add_argument("--text-col", default="text")
    dd.add_argument("--id-col", default="doc_id")
    dd.add_argument("--near", action="store_true",
                    help="NEAR-dup mode: LSH band index + exact "
                         "shingle-Jaccard verify instead of exact "
                         "content hashes")
    dd.add_argument("--threshold", type=float, default=0.8,
                    help="near mode: Jaccard drop threshold")
    dd.add_argument("--bands", type=int, default=16)
    dd.add_argument("--num-perm", type=int, default=64,
                    help="minhash signature length; bands must divide "
                         "it (validated up front)")
    dd.add_argument("--shingle", default="char",
                    choices=["char", "word"])
    dd.add_argument("--verify", default="text",
                    choices=["text", "signature"],
                    help="near mode: exact shingle-Jaccard against "
                         "stored rep texts, or the storage-light "
                         "signature estimate (num_perm int64s per rep)")
    dd.add_argument("--drop-strategy", default="auto",
                    choices=["auto", "broadcast", "distributed"],
                    help="near mode survivor filter: auto counts the "
                         "verified pairs in-cluster and switches to "
                         "the distributed component path past a bound "
                         "(never a silent driver union-find at scale)")
    dd.add_argument("--num-cpus", type=int)
    dd.set_defaults(fn=cmd_dedup)

    ls = sub.add_parser(
        "lsh-stats", help="LSH bucket-size profile (skew "
                          "observability): how big band buckets get, "
                          "how many exceed BUCKET_PAIR_CAP, how many "
                          "docs sit beyond it")
    ls.add_argument("--input", required=True)
    ls.add_argument("--bands", type=int, default=16)
    ls.add_argument("--num-perm", type=int, default=64,
                    help="minhash signature length; bands must divide "
                         "it (validated up front)")
    ls.add_argument("--shingle", default="char",
                    choices=["char", "word"])
    ls.add_argument("--text-col", default="text")
    ls.add_argument("--id-col", default="doc_id")
    ls.add_argument("--group-col",
                    help="group-scoped profile: buckets key on "
                         "(band, hash, group)")
    ls.add_argument("--cap", type=int,
                    help="report against this cap instead of "
                         "BUCKET_PAIR_CAP")
    ls.add_argument("--num-cpus", type=int)
    ls.set_defaults(fn=cmd_lsh_stats)

    pf = sub.add_parser(
        "profile", help="per-column data profile (rows, nulls, exact "
                        "distinct, min/max) — the ingest audit pass")
    pf.add_argument("--input", required=True)
    pf.add_argument("--columns", help="comma-separated subset "
                                      "(default: all)")
    pf.add_argument("--num-cpus", type=int)
    pf.set_defaults(fn=cmd_profile)

    pr = sub.add_parser(
        "prepare", help="make packed training shards: optional curation "
                        "spec -> seeded epoch shuffle -> sequence "
                        "packing in shuffled order; output carries "
                        "(doc_id, text, n_tokens, pack_id, "
                        "offset_in_pack)")
    pr.add_argument("--input", required=True)
    pr.add_argument("--output", required=True)
    pr.add_argument("--seq-len", type=int, default=2048)
    pr.add_argument("--seed", type=int, default=0,
                    help="epoch seed: a different seed is an "
                         "independent deterministic permutation")
    pr.add_argument("--spec", help="optional curation spec JSON to "
                                   "apply before packing")
    pr.add_argument("--num-cpus", type=int)
    pr.set_defaults(fn=cmd_prepare)

    ic = sub.add_parser(
        "index-compact", help="merge every epoch of an incremental-"
                              "dedup index into one (offline "
                              "maintenance; crash-safe by set "
                              "semantics)")
    ic.add_argument("--index", required=True)
    ic.add_argument("--num-cpus", type=int)
    ic.set_defaults(fn=cmd_index_compact)

    vc = sub.add_parser(
        "vacuum", help="GC orphaned deletion sidecars and interrupted-"
                       "commit tmp files (metadata only, no Ray)")
    vc.add_argument("--input", required=True)
    vc.set_defaults(fn=cmd_vacuum)

    va = sub.add_parser(
        "validate", help="run declarative expectation rules (JSON list) "
                         "over a table dir; --strict exits 3 on any "
                         "violation")
    va.add_argument("--input", required=True)
    va.add_argument("--rules", required=True,
                    help="path to a JSON rule list (ops.validate kinds)")
    va.add_argument("--strict", action="store_true")
    va.add_argument("--num-cpus", type=int)
    va.set_defaults(fn=cmd_validate)

    ao = sub.add_parser(
        "asof", help="time-travel read: rebuild vertices/edges as of a "
                     "partition epoch (0 = base build, e = after the "
                     "e-th delta merge) from the triples checkpoint")
    ao.add_argument("--kg", required=True,
                    help="an existing build/merge output directory")
    ao.add_argument("--epoch", type=int, required=True)
    ao.add_argument("--output", required=True)
    ao.add_argument("--partitions", type=int, default=16,
                    help="num_partitions the build used (epoch width)")
    ao.add_argument("--num-cpus", type=int)
    ao.set_defaults(fn=cmd_asof)

    fo = sub.add_parser(
        "forget", help="deletion propagation (right-to-be-forgotten): "
                       "rebuild vertices/edges with every triple from "
                       "the deleted docs removed — from the triples "
                       "checkpoint, no corpus scan")
    fo.add_argument("--kg", required=True,
                    help="an existing build/merge output directory")
    fo.add_argument("--deletions", required=True,
                    help="comma-separated doc ids, or a parquet "
                         "file/dir with a doc_id column (left_anti "
                         "path for web-scale delete sets)")
    fo.add_argument("--output", required=True)
    fo.add_argument("--partitions", type=int, default=16,
                    help="num_partitions the build used")
    fo.add_argument("--num-cpus", type=int)
    fo.set_defaults(fn=cmd_forget)

    cu = sub.add_parser(
        "curate", help="run a declarative curation spec (JSON list of "
                       "stages) over a document corpus; funnel report "
                       "by default, --stream for one fused pass")
    cu.add_argument("--input", required=True)
    cu.add_argument("--output", required=True)
    cu.add_argument("--spec", required=True,
                    help="path to a JSON spec: [{'stage': name, ...}]")
    cu.add_argument("--stream", action="store_true")
    cu.add_argument("--partitions", type=int,
                    help="shard-parallel resumable mode: one "
                         "docs/part-NNNNN dir + manifest per input "
                         "shard (per-document stages only)")
    cu.add_argument("--resume", action="store_true",
                    help="with --partitions: skip manifested units "
                         "whose recorded input-file list and spec "
                         "hash match the current run (mismatched "
                         "units are redone, never trusted)")
    cu.add_argument("--jobs", type=int, default=1,
                    help="with --partitions: overlap this many units "
                         "(each still uses the whole cluster; "
                         "avoids small units serializing)")
    cu.add_argument("--num-cpus", type=int)
    cu.set_defaults(fn=cmd_curate)

    cl = sub.add_parser(
        "cluster", help="range-cluster a parquet table dir on a column "
                        "into tile=N dirs + zone-map skip index, "
                        "resumable")
    cl.add_argument("--input", required=True)
    cl.add_argument("--output", required=True)
    cl.add_argument("--col", required=True)
    cl.add_argument("--tiles", type=int, default=8)
    cl.add_argument("--resume", action="store_true")
    cl.add_argument("--num-cpus", type=int)
    cl.set_defaults(fn=cmd_cluster)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    except GraphBuildError as e:
        # domain errors get ONE clean line, not a Ray-deep traceback;
        # exit 2 distinguishes them from crashes (validate --strict
        # reserves 3)
        print(f"error: {type(e).__name__}: {e}", file=sys.stderr)
        return 2
    except FileNotFoundError as e:
        print(f"error: not found: {e.filename or e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(main())
