"""Sources & sinks.

The reference's dump/AQL readers (S1/S2, /root/reference/src/sharding.rs:
64-308, src/aql.rs:57-243) dissolve into Ray Data's parallel fragment
reads: fragments = shards, read tasks = dump tasks, prefetch/backpressure =
the streaming executor. Column projection pushdown replaces the reference's
server-side projections (M8/M9, src/graph_loader.rs:978-1026).

Lance is the target storage format per SURVEY.md; the ``lance`` package is
not installed in this sandbox, so the Lance path is gated behind an
import-try and Parquet (same schema shape, same pushdown semantics) is the
tested path. Both are directory-of-fragments formats, so nothing else in
the engine changes.
"""

from __future__ import annotations

import glob
import os

import ray.data


def _is_lance(path: str) -> bool:
    return path.rstrip("/").endswith(".lance")


def read_table(path: str, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """Read a Lance or Parquet table as a streaming Dataset with column
    pruning pushed to the read (M8 analog)."""
    if _is_lance(path):
        try:
            import lance  # noqa: F401
        except ImportError as e:  # pragma: no cover - lance absent in sandbox
            raise ImportError(
                "lance is not installed; use a parquet path (same schema)"
            ) from e
        return ray.data.read_lance(path, columns=columns, **kwargs)
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def corpus_read_blocks(path: str, rows_per_block: int = 2048) -> int | None:
    """Read block count sized to the corpus (parquet footers only):
    ~``rows_per_block`` docs per block, capped at 2×CPUs. Ray's default
    (2×CPUs regardless of size) hands a 20k-doc delta 64 tiny tasks
    whose dispatch overhead dwarfs the work — small inputs (delta
    merges, resumes with most partitions done) want proportionally few
    blocks; big inputs keep the CPU-bound default. None = unknown
    (non-parquet dir), letting Ray choose."""
    import pyarrow.parquet as pq

    import ray

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return None
    rows = sum(pq.read_metadata(f).num_rows for f in files)
    cpus = int(ray.cluster_resources().get("CPU", 4)) \
        if ray.is_initialized() else 4
    return max(1, min(2 * cpus, rows // rows_per_block + 1))


def read_documents(path: str, **kwargs) -> ray.data.Dataset:
    """Read the interleaved-document corpus (doc_id, spans)."""
    if not _is_lance(path) and "override_num_blocks" not in kwargs:
        nb = corpus_read_blocks(path)
        if nb is not None:
            kwargs["override_num_blocks"] = nb
    return read_table(path, columns=["doc_id", "spans"], **kwargs)


def write_table(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    """Write a Dataset as a directory of part files (resumable layout)."""
    if _is_lance(path):
        try:
            import lance  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise ImportError("lance is not installed; write parquet instead") from e
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)


def partition_files(path: str, partition_col: str, value) -> list[str]:
    """Files of one hive partition under ``path``."""
    return sorted(glob.glob(os.path.join(path, f"{partition_col}={value}", "*")))


def read_documents_jsonl(path: str, **kwargs) -> "ray.data.Dataset":
    """Ingest the corpus from JSONL (one document object per line).

    Parity with the reference's JSONL batch parser (M1,
    /root/reference/src/graph_loader.rs:420-431) for corpora that arrive
    as dump files rather than columnar tables: Ray parses lines into
    Arrow blocks in parallel; a malformed line fails the read task (and
    the job after retries) — same hard-error contract as the reference.
    """
    return ray.data.read_json(path, **kwargs)


def read_union_by_name(paths: list[str], **kwargs) -> ray.data.Dataset:
    """Schema-evolution read: union several parquet tables BY COLUMN
    NAME (the Delta/Iceberg ``mergeSchema`` semantics — DuckDB's
    ``UNION ALL BY NAME``): the result schema is the name-ordered union
    of every input's columns; columns a file lacks are null-padded with
    the type observed elsewhere. Same-named columns must agree on type
    (evolution by ADDING columns, not retyping — a retype raises).

    Each input keeps its own parallel fragment read; the pad is a
    zero-copy per-batch ``append_column`` of null arrays, so the union
    streams like any other Dataset."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    types: dict[str, pa.DataType] = {}
    for p in paths:
        files = sorted(glob.glob(os.path.join(p, "**", "*.parquet"),
                                 recursive=True)) if os.path.isdir(p) \
            else [p]
        sch = pq.read_schema(files[0])
        for f in sch:
            prev = types.get(f.name)
            if prev is not None and prev != f.type:
                raise TypeError(
                    f"column {f.name!r} retyped across inputs: "
                    f"{prev} vs {f.type}")
            types.setdefault(f.name, f.type)
    names = sorted(types)
    target = pa.schema([(n, types[n]) for n in names])

    def pad(batch: pa.Table) -> pa.Table:
        cols = []
        for n in names:
            if n in batch.schema.names:
                cols.append(batch.column(n).cast(types[n]))
            else:
                cols.append(pa.nulls(batch.num_rows, types[n]))
        return pa.Table.from_arrays(cols, schema=target)

    parts = [ray.data.read_parquet(p, **kwargs)
             .map_batches(pad, batch_format="pyarrow") for p in paths]
    out = parts[0]
    return out.union(*parts[1:]) if len(parts) > 1 else out


def read_jsonl_lenient(path: str, schema=None):
    """Permissive JSONL ingest with a DEAD-LETTER lane: malformed lines
    are counted and quarantined per file instead of failing the read —
    the forgiving counterpart of :func:`read_documents_jsonl` (whose
    hard-error contract mirrors the reference parser,
    /root/reference/src/graph_loader.rs:420-431). Returns
    ``(good_ds, bad_ds)`` where ``bad_ds`` rows carry (file, line_no,
    error) — write it somewhere durable and replay after the producer
    is fixed.

    Built on ``read_binary_files`` (one task per file; JSONL cannot be
    split mid-file without a line index) + a per-batch parse that
    collects Arrow rows and dead letters in one pass."""
    import json as _json

    import pyarrow as pa

    files = sorted(glob.glob(os.path.join(path, "**", "*.json*"),
                             recursive=True)) if os.path.isdir(path) \
        else [path]
    raw = ray.data.read_binary_files(files, include_paths=True)

    def parse(kind: str):
        def fn(batch: pa.Table) -> pa.Table:
            goods: list[dict] = []
            bads: list[dict] = []
            for p, payload in zip(batch.column("path").to_pylist(),
                                  batch.column("bytes").to_pylist()):
                for i, line in enumerate(payload.splitlines()):
                    if not line.strip():
                        continue
                    try:
                        goods.append(_json.loads(line))
                    except ValueError as exc:
                        bads.append({"file": os.path.basename(p),
                                     "line_no": i + 1,
                                     "error": str(exc)[:80]})
            if kind == "good":
                if not goods:
                    return (schema.empty_table() if schema is not None
                            else pa.table({}))
                t = pa.Table.from_pylist(goods)
                return t.cast(schema) if schema is not None else t
            if not bads:
                return pa.table({"file": pa.array([], pa.string()),
                                 "line_no": pa.array([], pa.int64()),
                                 "error": pa.array([], pa.string())})
            return pa.Table.from_pylist(bads)

        return fn

    good = raw.map_batches(parse("good"), batch_format="pyarrow")
    bad = raw.map_batches(parse("bad"), batch_format="pyarrow")
    return good, bad


def read_table_orc(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """ORC shard reader — the fourth source format (after Parquet,
    JSONL, CSV). Ray Data has no native ORC source, so this maps the
    dump-shard model directly (SURVEY §2.1 S1: one reader task per
    shard): the file list becomes a one-row-per-block Dataset and each
    task decodes its file with column pruning pushed into the ORC
    stripe reader (``orc.ORCFile.read(columns=)``) — only requested
    columns leave storage, and file-level parallelism scales with the
    shard count exactly like the parquet fragment reads."""
    import pyarrow as pa

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.orc")))
    elif os.path.exists(path):
        files = [path]
    else:
        files = []
    if not files:
        raise FileNotFoundError(f"no .orc files under {path}")

    def load(batch: pa.Table) -> pa.Table:
        from pyarrow import orc

        tabs = [orc.ORCFile(p).read(columns=columns)
                for p in batch.column("path").to_pylist()]
        return pa.concat_tables(tabs)

    files_ds = ray.data.from_arrow(pa.table({"path": pa.array(files)}))
    return files_ds.repartition(len(files)).map_batches(
        load, batch_format="pyarrow")


def write_table_orc(ds: ray.data.Dataset, path: str) -> int:
    """ORC sink: one file per block (same layout contract as
    ``write_parquet`` — resumable directory-of-shards, never one giant
    file), written inside the tasks so the table never funnels through
    the driver. Returns the row count written."""
    import uuid

    import pyarrow as pa

    os.makedirs(path, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        from pyarrow import orc

        f = os.path.join(path, f"part-{uuid.uuid4().hex}.orc")
        orc.write_table(batch, f)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    counts = ds.map_batches(write_block, batch_size=None,
                            batch_format="pyarrow").to_pandas()
    return int(counts["n"].sum())


def read_table_ipc(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Arrow IPC (Feather v2) shard reader — the fifth source format
    (after Parquet, JSONL, CSV, ORC), same file-per-task shard model as
    :func:`read_table_orc` (SURVEY §2.1 S1): the file list becomes a
    one-row-per-block Dataset and each task memory-maps its file with
    column pruning pushed into the IPC reader — zero-copy into Arrow,
    the cheapest possible decode path for intermediate exchange
    tables."""
    import pyarrow as pa
    import pyarrow.feather as feather

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.arrow")))
    elif os.path.exists(path):
        files = [path]
    else:
        files = []
    if not files:
        raise FileNotFoundError(f"no .arrow files under {path}")

    def load(batch: pa.Table) -> pa.Table:
        tabs = [feather.read_table(p, columns=columns)
                for p in batch.column("path").to_pylist()]
        return pa.concat_tables(tabs)

    files_ds = ray.data.from_arrow(pa.table({"path": pa.array(files)}))
    return files_ds.repartition(len(files)).map_batches(
        load, batch_format="pyarrow")


def write_table_ipc(ds: ray.data.Dataset, path: str) -> int:
    """Arrow IPC sink: one .arrow file per block, written inside the
    tasks (same resumable directory-of-shards contract as the parquet
    and ORC sinks). Returns the row count written."""
    import uuid

    import pyarrow as pa
    import pyarrow.feather as feather

    os.makedirs(path, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        f = os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
        feather.write_feather(batch, f)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    counts = ds.map_batches(write_block, batch_size=None,
                            batch_format="pyarrow").to_pandas()
    return int(counts["n"].sum())


def read_parquet_rowgroups(path: str, col: str, lo, hi,
                           columns: list[str] | None = None) -> "ray.data.Dataset":
    """Row-group-pruned parquet scan: plans against the parquet FOOTER
    statistics (min/max per row group) and reads only the row groups
    whose [min, max] range intersects [lo, hi] — the sub-file
    counterpart of zone-map file pruning (`maintenance.prune_files`),
    i.e. predicate pushdown done by hand so the pruning is observable
    and testable (returned alongside as a plan dict via
    :func:`plan_rowgroups`).

    One reader task per file; each task opens its file once and reads
    its surviving row groups with column pruning. Rows still need the
    residual filter (a row group may straddle the bound) — the caller
    applies it; this function only guarantees a SUPERSET bounded by
    the straddling groups."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    plan = plan_rowgroups(path, col, lo, hi)
    keep = {f: gs for f, gs in plan["keep"].items() if gs}
    if not keep:
        schema = pq.read_schema(plan["files"][0])
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return ray.data.from_arrow(schema.empty_table())

    def load(batch: pa.Table) -> pa.Table:
        tabs = []
        for f in batch.column("path").to_pylist():
            pf = pq.ParquetFile(f)
            tabs.append(pf.read_row_groups(keep[f], columns=columns))
        return pa.concat_tables(tabs)

    files_ds = ray.data.from_arrow(pa.table({
        "path": pa.array(sorted(keep))}))
    return files_ds.repartition(len(keep)).map_batches(
        load, batch_format="pyarrow")


def plan_rowgroups(path: str, col: str, lo, hi) -> dict:
    """Footer-only planning pass for :func:`read_parquet_rowgroups`:
    returns {files, keep: {file: [rg indices]}, n_groups_total,
    n_groups_kept} without touching any data page."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    keep: dict[str, list[int]] = {}
    total = kept = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        gs = []
        for g in range(md.num_row_groups):
            total += 1
            st = md.row_group(g).column(idx).statistics
            if st is None or not st.has_min_max:
                gs.append(g)       # no stats: must read
                kept += 1
                continue
            if st.max >= lo and st.min <= hi:
                gs.append(g)
                kept += 1
        keep[f] = gs
    return {"files": files, "keep": keep, "n_groups_total": total,
            "n_groups_kept": kept}
