"""Table maintenance: small-file compaction.

The lakehouse pass a 100 TB deployment runs continuously: streaming
writers (this repo's checkpointed phase-A output, Ray's per-block
``write_parquet`` files, CDC appends) leave directories of many small
files, and read throughput collapses when fragment count outruns row
count — the exact failure the reference avoids by sizing its dump
batches (`/root/reference/src/sharding.rs:64-308` fixed-size shard
batches). Compaction rewrites a table directory into files of a target
row count WITHOUT changing its rows.

Scale discipline:

* **Unit = hive partition.** A directory with ``key=value`` subdirs is
  compacted one partition at a time — each unit is an independent,
  bounded Ray pipeline (read → repartition → write), so the peak
  footprint is one partition, not the table, and a multi-node run can
  fan units out as jobs.
* **Resumable.** Each finished unit commits a ``_compact/<unit>.json``
  manifest (write-then-rename, same discipline as
  :mod:`raygraph.checkpoint`); re-running with ``resume=True`` skips
  committed units, so a crashed compaction of a 10⁵-partition table
  restarts where it stopped.
* **No shuffle.** ``repartition(n)`` here is a split/coalesce of
  blocks, not an all-to-all — row order within the unit is not
  promised (parquet readers must not rely on it), but row CONTENT is,
  and the row count is verified before the manifest commits.
* **Shared storage.** All sidecar/manifest/zone-map IO routes through
  :mod:`raygraph.stateio`, so table paths may be shared-storage URLs
  on a multi-node cluster; single-file commits are
  single-object-atomic (tmp+replace locally, one PUT remotely).
"""

from __future__ import annotations

import re

from . import stateio

_HIVE_RE = re.compile(r"^[^=/]+=[^=/]*$")


def _units(input_path: str) -> list[str]:
    """Hive-partition subdirs, or [''] for a flat directory."""
    subs = sorted(
        d for d in stateio.listdir(input_path)
        if stateio.isdir(stateio.join(input_path, d))
        and _HIVE_RE.match(d)
    )
    return subs or [""]


def _manifest(output_path: str, unit: str) -> str:
    name = (unit or "_flat").replace("/", "_") + ".json"
    return stateio.join(output_path, "_compact", name)


def compact_table(
    input_path: str,
    output_path: str,
    target_rows_per_file: int = 1_000_000,
    resume: bool = False,
) -> dict:
    """Compact a parquet table directory unit-by-unit (see module doc).

    Returns ``{"units": n, "units_skipped": k, "rows": total,
    "files_in": i, "files_out": o}``. Raises if a unit's output row
    count does not match its input (the manifest never commits in that
    case, so a re-run with ``resume=True`` redoes exactly that unit).
    """
    if not stateio.isdir(input_path):
        raise FileNotFoundError(input_path)
    units = _units(input_path)
    stateio.makedirs(stateio.join(output_path, "_compact"))

    stats = {"units": len(units), "units_skipped": 0, "rows": 0,
             "files_in": 0, "files_out": 0}
    for unit in units:
        man = _manifest(output_path, unit)
        if resume and stateio.exists(man):
            m = stateio.read_json(man)
            stats["units_skipped"] += 1
            stats["rows"] += m["rows"]
            stats["files_in"] += m["files_in"]
            stats["files_out"] += m["files_out"]
            continue

        src = stateio.join(input_path, unit) if unit else input_path
        dst = stateio.join(output_path, unit) if unit else output_path
        files_in = stateio.glob(stateio.join(src, "*.parquet"))
        if unit == "" and not files_in:
            # flat dir may hold nested non-hive layout ray wrote
            files_in = stateio.glob(
                stateio.join(src, "**", "*.parquet"))
        if not files_in:
            continue
        # fold deletion vectors in: compacting a table that carries
        # _deletes sidecars MUST apply them (a raw re-read would
        # resurrect deleted rows); the rewritten unit is then clean —
        # no sidecars carry over
        if stateio.isdir(stateio.join(src, "_deletes")):
            ds = read_with_deletes(src)
        else:
            ds = stateio.ray_read_parquet(files_in)
        n_rows = ds.count()
        n_files = max(1, -(-n_rows // target_rows_per_file))
        if unit:
            stateio.rmtree(dst)
            stateio.makedirs(dst)
        else:
            for f in stateio.glob(stateio.join(dst, "*.parquet")):
                stateio.remove(f)
            stateio.makedirs(dst)
        stateio.ray_write_parquet(ds.repartition(n_files), dst)

        files_out = stateio.glob(stateio.join(dst, "*.parquet"))
        got = stateio.ray_read_parquet(files_out).count()
        if got != n_rows:
            raise RuntimeError(
                f"compaction row mismatch in unit {unit!r}: "
                f"{n_rows} in, {got} out")
        m = {"unit": unit, "rows": n_rows, "files_in": len(files_in),
             "files_out": len(files_out)}
        stateio.write_json_atomic(man, m)
        stats["rows"] += n_rows
        stats["files_in"] += len(files_in)
        stats["files_out"] += len(files_out)
    return stats


def build_zone_maps(table_path: str, columns: list[str]) -> str:
    """Build per-FILE zone maps (min/max per column) for a parquet table
    directory — the lakehouse pruning index (Iceberg/Delta file stats,
    ClickHouse minmax skip index). Stats come from the parquet FOOTERS
    (row-group statistics), so the build reads metadata, not data — a
    10⁵-file table costs 10⁵ footer reads, zero row scans.

    Written as ``_zonemaps.json`` (write-then-rename, the
    :mod:`raygraph.checkpoint` commit discipline) mapping each file to
    {column: [min, max]} with timestamps serialized as int64 µs.
    Returns the manifest path."""

    def _ser(v):
        import datetime

        import numpy as np

        if isinstance(v, datetime.datetime):
            # naive parquet stats → epoch µs without local-TZ influence
            return int(np.datetime64(v.replace(tzinfo=None), "us")
                       .astype("int64"))
        return v

    maps = {}
    for f in stateio.glob(stateio.join(table_path, "**", "*.parquet")):
        md = stateio.pq_read_metadata(f)
        stats: dict[str, list] = {}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                if name not in columns or col.statistics is None:
                    continue
                s = col.statistics
                if not s.has_min_max:
                    continue
                mn, mx = _ser(s.min), _ser(s.max)
                cur = stats.get(name)
                stats[name] = [mn, mx] if cur is None else \
                    [min(cur[0], mn), max(cur[1], mx)]
        maps[stateio.relpath(f, table_path)] = stats
    out = stateio.join(table_path, "_zonemaps.json")
    stateio.write_json_atomic(out, maps, indent=1, sort_keys=True)
    return out


def prune_files(table_path: str, col: str, lo, hi) -> tuple[list[str],
                                                            int]:
    """Filesystem-level pruning off the zone maps: the files whose
    [min, max] range for ``col`` overlaps [lo, hi] (files with no
    recorded stats are conservatively kept). Returns (paths_to_read,
    n_files_skipped) — the read plan a range query hands to
    ``read_parquet`` so skipped files never leave storage."""
    maps = stateio.read_json(stateio.join(table_path,
                                          "_zonemaps.json"))
    keep, skipped = [], 0
    for rel, stats in maps.items():
        rng = stats.get(col)
        if rng is not None and (rng[1] < lo or rng[0] > hi):
            skipped += 1
            continue
        keep.append(stateio.join(table_path, rel))
    return keep, skipped


def cluster_table(
    input_path: str,
    output_path: str,
    col: str,
    n_tiles: int = 8,
    resume: bool = False,
) -> dict:
    """Range-CLUSTER a parquet table on ``col`` into ``n_tiles``
    ``tile=<i>/`` directories (exact, layout-deterministic boundaries
    from :func:`raygraph.ops.relational.range_boundaries`) and build
    the :func:`build_zone_maps` skip index over the result — the
    lakehouse clustering pass that turns range predicates on ``col``
    into file skips (:func:`prune_files`).

    Resumable tile-at-a-time with the :func:`compact_table` manifest
    discipline (``_cluster/<tile>.json``, write-then-rename, row-count
    gate): a crashed run re-does only uncommitted tiles — boundaries
    are persisted in the FIRST run's ``_cluster/_bounds.json`` so a
    resume clusters against identical split points. Returns
    ``{"tiles": n, "tiles_skipped": k, "rows": total}``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from raygraph.ops.relational import range_boundaries, range_partition

    if not stateio.exists(input_path):  # file OR directory input
        raise FileNotFoundError(input_path)
    meta_dir = stateio.join(output_path, "_cluster")
    stateio.makedirs(meta_dir)

    # same contract as compaction: a table carrying _deletes sidecars
    # is clustered with the masks applied, never resurrected
    if stateio.isdir(input_path) \
            and stateio.isdir(stateio.join(input_path, "_deletes")):
        ds = read_with_deletes(input_path)
    else:
        ds = stateio.ray_read_parquet(input_path)

    # tile on an int64 shadow key (timestamps → epoch µs; strings →
    # order-preserving big-endian 8-byte prefix) so persisted
    # boundaries survive the JSON round-trip losslessly on resume
    def with_key(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        t = arr.type
        if (pa.types.is_string(t) or pa.types.is_large_string(t)
                or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
            import numpy as np
            vals = arr.to_pandas().fillna("").to_numpy(dtype=object)
            enc = np.char.encode(vals.astype(str), "utf-8").astype("S8")
            u = np.frombuffer(enc.tobytes(), dtype=">u8").astype(np.uint64)
            key = pa.array((u ^ np.uint64(1 << 63)).view(np.int64))
        else:
            key = arr.cast(pa.int64())
        return batch.append_column("__ck", key)

    keyed = ds.map_batches(with_key, batch_format="pyarrow")
    bpath = stateio.join(meta_dir, "_bounds.json")
    if resume and stateio.exists(bpath):
        bounds = stateio.read_json(bpath)["bounds"]
    else:
        raw = range_boundaries(keyed, "__ck", n_tiles)
        bounds = [_json_scalar(b) for b in raw]
        stateio.write_json_atomic(bpath, {"col": col,
                                          "bounds": bounds})
    tiled = range_partition(keyed, "__ck", n_tiles,
                            boundaries=bounds).materialize()

    stats = {"tiles": n_tiles, "tiles_skipped": 0, "rows": 0}
    for i in range(n_tiles):
        man = stateio.join(meta_dir, f"tile_{i}.json")
        if resume and stateio.exists(man):
            stats["rows"] += stateio.read_json(man)["rows"]
            stats["tiles_skipped"] += 1
            continue

        def pick(batch: pa.Table, _i=i) -> pa.Table:
            return batch.filter(pc.equal(batch.column("tile"),
                                         pa.scalar(_i))) \
                .drop_columns(["tile", "__ck"])

        dst = stateio.join(output_path, f"tile={i}")
        stateio.rmtree(dst)
        stateio.makedirs(dst)
        part = tiled.map_batches(pick, batch_format="pyarrow")
        n_rows = part.count()
        if n_rows:
            stateio.ray_write_parquet(part, dst)
            got = stateio.ray_read_parquet(dst).count()
            if got != n_rows:
                raise RuntimeError(
                    f"cluster row mismatch in tile {i}: "
                    f"{n_rows} in, {got} out")
        stateio.write_json_atomic(man, {"tile": i, "rows": n_rows})
        stats["rows"] += n_rows
    build_zone_maps(output_path, [col])
    return stats


def _json_scalar(v):
    """Range boundary → JSON-safe scalar (timestamps as int64 µs —
    range_partition compares consistently after the round-trip because
    tiling casts the column the same way)."""
    import datetime

    import numpy as np

    if isinstance(v, (np.datetime64, datetime.datetime)):
        return int(np.datetime64(v, "us").astype("int64"))
    if isinstance(v, np.generic):
        return v.item()
    return v


# ------------------------------------------------------- deletion vectors

_DELETE_OPS = {
    "mod_eq": lambda v, arg: v % int(arg.split(":")[0])
    == int(arg.split(":")[1]),
    "eq": lambda v, arg: v == _coerce_like(v, arg),
    "lt": lambda v, arg: v < _coerce_like(v, arg),
    "ge": lambda v, arg: v >= _coerce_like(v, arg),
}


def _coerce_like(v, arg: str):
    import numpy as np

    if np.issubdtype(np.asarray(v).dtype, np.integer):
        return int(arg)
    if np.issubdtype(np.asarray(v).dtype, np.floating):
        return float(arg)
    return arg


def _delete_dir(table_path: str) -> str:
    return stateio.join(table_path, "_deletes")


def _encode_positions(pos, n_rows: int) -> dict:
    """Deletion-vector payload encoding (adaptive, the public
    Iceberg-v2 / roaring idea at JSON-sidecar grain):

    - sparse (< ~1/64 of rows): plain ``positions`` int list — a
      5-row delete in a 10^7-row file stays a 100-byte sidecar;
    - dense: ``bitmap-z`` — the keep/drop bits packed little-endian
      (``np.packbits``) then zlib'd and base64'd. A delete matching
      10^7 rows in one file is KBs, not the ~100 MB a JSON int list
      costs, and merge-on-read stays O(rows/8) vector work instead of
      a Python set of every position.

    Readers accept both (plus legacy sidecars with no ``encoding``
    key, which are plain position lists)."""
    import base64
    import zlib

    import numpy as np

    pos = np.asarray(pos, dtype=np.int64)
    # crossover: positions cost ~8 JSON chars each, the raw bitmap
    # n_rows/8 bytes (zlib shrinks it further — this bound is
    # conservative in the bitmap's favor only for dense deletes)
    if len(pos) * 8 < max(1, n_rows // 8):
        return {"encoding": "positions", "n_rows": int(n_rows),
                "positions": [int(p) for p in pos]}
    bits = np.zeros(n_rows, dtype=np.uint8)
    bits[pos] = 1
    packed = np.packbits(bits, bitorder="little")
    return {"encoding": "bitmap-z", "n_rows": int(n_rows),
            "bitmap": base64.b64encode(
                zlib.compress(packed.tobytes())).decode()}


def _apply_sidecar(keep, d: dict) -> None:
    """Clear ``keep`` (bool array) at the sidecar's deleted positions
    — vectorized for both encodings, legacy position lists included."""
    import base64
    import zlib

    import numpy as np

    if d.get("encoding") == "bitmap-z":
        packed = np.frombuffer(
            zlib.decompress(base64.b64decode(d["bitmap"])),
            dtype=np.uint8)
        bits = np.unpackbits(packed, bitorder="little")[:len(keep)]
        keep[bits.astype(bool)] = False
        return
    p = np.asarray(d["positions"], dtype=np.int64)
    if len(p):
        keep[p] = False


def delete_where(table_path: str, col: str, op: str, arg: str) -> dict:
    """Row-level deletes WITHOUT rewriting data files — positional
    deletion vectors, the merge-on-read delete of the modern lakehouse
    (Iceberg v2 / Delta deletion vectors): for every parquet file the
    matching row positions are written to a ``_deletes/<file>.d<k>.json``
    sidecar (write-then-rename commit, stacking epochs k = 0, 1, ...);
    data files are immutable and the delete costs one pruned column
    scan, not a table rewrite.

    Per file the work is an independent Ray task (file-per-task, the
    same shard model as the ORC reader); positions index the file's
    deterministic row order, stored via :func:`_encode_positions`
    (sparse list / zlib'd bitmap). Returns {files, n_deleted}.
    """
    import numpy as np
    import pyarrow as pa

    if op not in _DELETE_OPS:
        from .errors import InvalidParameterError

        raise InvalidParameterError(f"unknown delete op: {op}")
    files = stateio.glob(stateio.join(table_path, "*.parquet"))
    if not files:
        from .errors import CollectionNotFoundError

        raise CollectionNotFoundError(f"no parquet files in {table_path}")
    ddir = _delete_dir(table_path)
    stateio.makedirs(ddir)
    pred = _DELETE_OPS[op]

    def mark(batch: pa.Table) -> pa.Table:
        from raygraph import stateio as sio

        outs = []
        for path in batch.column("path").to_pylist():
            v = sio.pq_read_table(path, columns=[col]).column(col) \
                .to_numpy(zero_copy_only=False)
            pos = np.nonzero(pred(v, arg))[0]
            base = sio.basename(path)
            k = 0
            while sio.exists(sio.join(ddir, f"{base}.d{k}.json")):
                k += 1
            sio.write_json_atomic(
                sio.join(ddir, f"{base}.d{k}.json"),
                {"file": base, "epoch": k,
                 "predicate": {"col": col, "op": op, "arg": arg},
                 **_encode_positions(pos, len(v))})
            outs.append(len(pos))
        return pa.table({"n": pa.array(outs, pa.int64())})

    import ray.data as rd

    files_ds = rd.from_arrow(pa.table({"path": pa.array(files)}))
    counts = files_ds.repartition(len(files)).map_batches(
        mark, batch_format="pyarrow").to_pandas()
    return {"files": len(files), "n_deleted": int(counts["n"].sum())}


def read_with_deletes(table_path: str,
                      columns: list[str] | None = None):
    """Merge-on-read scan: every parquet file is one reader task that
    loads its stacked deletion vectors (all epochs, positions
    unioned) and masks the deleted rows out before emitting the block
    — the read-path half of :func:`delete_where`. A table with no
    ``_deletes`` sidecars reads unchanged. Stacked epochs union as
    vectorized mask clears (:func:`_apply_sidecar` — both sidecar
    encodings plus legacy position lists), never a Python set of
    positions."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    files = stateio.glob(stateio.join(table_path, "*.parquet"))
    if not files:
        from .errors import CollectionNotFoundError

        raise CollectionNotFoundError(f"no parquet files in {table_path}")
    ddir = _delete_dir(table_path)

    def load(batch: pa.Table) -> pa.Table:
        from raygraph import stateio as sio

        tabs = []
        for path in batch.column("path").to_pylist():
            t = sio.pq_read_table(path, columns=columns)
            base = sio.basename(path)
            dels = sio.glob(sio.join(ddir, f"{base}.d*.json"))
            if dels:
                keep = np.ones(t.num_rows, dtype=bool)
                for dpath in dels:
                    _apply_sidecar(keep, sio.read_json(dpath))
                t = t.filter(pa.array(keep))
            tabs.append(t)
        return pa.concat_tables(tabs)

    files_ds = rd.from_arrow(pa.table({"path": pa.array(files)}))
    return files_ds.repartition(len(files)).map_batches(
        load, batch_format="pyarrow")


def vacuum(table_path: str) -> dict:
    """Garbage-collect a table directory's maintenance artifacts: drop
    orphaned ``_deletes`` sidecars (their data file is gone — e.g.
    after a compaction rewrote the table elsewhere and files were
    pruned), stray ``*.tmp`` files from interrupted write-then-rename
    commits, and empty artifact dirs. Never touches data files or
    live sidecars — safe to run concurrently with readers (sidecar
    removal is atomic per file and only for files that no longer
    exist). Returns {orphaned_sidecars, tmp_files}."""
    removed_sidecars = removed_tmp = 0
    ddir = _delete_dir(table_path)
    live = {stateio.basename(f)
            for f in stateio.glob(stateio.join(table_path,
                                               "*.parquet"))}
    if stateio.isdir(ddir):
        for f in stateio.glob(stateio.join(ddir, "*.json")):
            base = stateio.basename(f).split(".d")[0]
            if base not in live:
                stateio.remove(f)
                removed_sidecars += 1
        if not stateio.listdir(ddir):
            stateio.rmtree(ddir)
    for pat in ("*.tmp", "_deletes/*.tmp", "_compact/*.tmp",
                "_cluster/*.tmp", "_manifest/*.tmp"):
        for f in stateio.glob(stateio.join(table_path, pat)):
            stateio.remove(f)
            removed_tmp += 1
    return {"orphaned_sidecars": removed_sidecars,
            "tmp_files": removed_tmp}


# upsert's documented "delta-sized" contract made explicit: the updates
# key column is ray.put-broadcast to every file task and the rows land
# as ONE data file, so a table-sized updates input is a design error —
# reject it loudly instead of letting the driver concat it
UPSERT_MAX_UPDATE_ROWS = 5_000_000


def upsert_table(table_path: str, updates, key: str,
                 max_update_rows: int | None = None) -> dict:
    """MERGE INTO (upsert) without rewriting data files — the
    merge-on-read write path that completes the deletion-vector
    lakehouse surface (:func:`delete_where` / :func:`read_with_deletes`
    / :func:`compact_table`): rows whose ``key`` appears in ``updates``
    are masked via positional deletion sidecars, and the update rows
    land as ONE new parquet file whose final rename is the commit
    point.

    Crash contract (documented, vacuum-compatible): sidecars are
    write-then-rename per file; the data file is staged as ``*.tmp``
    and renamed LAST. A crash mid-upsert leaves extra delete marks and
    an orphan ``.tmp`` (collected by :func:`vacuum`); re-running the
    SAME upsert converges — positions are recomputed against the raw
    file order, so re-marking is idempotent, and the single-file
    commit can't half-land. ``updates`` must be delta-sized (its key
    column ships once via ``ray.put`` to every file task — the
    broadcast-small-side discipline) and schema-compatible with the
    table.

    Per existing file the mark step is an independent Ray task
    (file-per-task, pruned to the key column). Returns
    {files_marked, n_replaced, n_inserted, data_file}.
    """
    import numpy as np
    import pyarrow as pa

    import ray
    import ray.data as rd

    files = stateio.glob(stateio.join(table_path, "*.parquet"))
    if not files:
        from .errors import CollectionNotFoundError

        raise CollectionNotFoundError(f"no parquet files in {table_path}")
    up = updates.materialize() if hasattr(updates, "materialize") \
        else updates
    bound = UPSERT_MAX_UPDATE_ROWS if max_update_rows is None \
        else max_update_rows
    n_up = up.count() if hasattr(up, "iter_batches") else up.num_rows
    if n_up > bound:
        from .errors import InvalidParameterError

        raise InvalidParameterError(
            f"updates has {n_up} rows, past the delta-size bound "
            f"{bound} — upsert broadcasts the key column and commits "
            "ONE data file; rewrite table-sized changes with "
            "delete_where + a partitioned write (or raise "
            "max_update_rows explicitly)")
    up_tbl = pa.concat_tables(
        [b for b in up.iter_batches(batch_format="pyarrow")]) \
        if hasattr(up, "iter_batches") else up
    table_schema = stateio.pq_read_schema(files[0])
    if set(up_tbl.schema.names) != set(table_schema.names):
        from .errors import InvalidParameterError

        raise InvalidParameterError(
            "updates schema must match the table's columns")
    # cast to the table's exact schema BEFORE any sidecar writes:
    # name-only validation would let a type-mismatched updates table
    # (e.g. string key) land verbatim, leaving the directory with
    # mixed parquet schemas that break every later unified scan — an
    # incompatible cast raises here instead of corrupting the table
    try:
        up_tbl = up_tbl.select(table_schema.names).cast(table_schema)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError) as e:
        from .errors import InvalidParameterError

        raise InvalidParameterError(
            f"updates types are not castable to the table schema: {e}")
    keys = up_tbl.column(key).to_numpy(zero_copy_only=False)
    if len(np.unique(keys)) != len(keys):
        from .errors import InvalidParameterError

        raise InvalidParameterError("updates carry duplicate keys")
    key_ref = ray.put(keys)

    ddir = _delete_dir(table_path)
    stateio.makedirs(ddir)

    def mark(batch: pa.Table) -> pa.Table:
        from raygraph import stateio as sio

        ks = ray.get(key_ref)
        outs = []
        for path in batch.column("path").to_pylist():
            v = sio.pq_read_table(path, columns=[key]).column(key) \
                .to_numpy(zero_copy_only=False)
            pos = np.nonzero(np.isin(v, ks))[0]
            base = sio.basename(path)
            if len(pos):
                k = 0
                while sio.exists(sio.join(ddir,
                                          f"{base}.d{k}.json")):
                    k += 1
                sio.write_json_atomic(
                    sio.join(ddir, f"{base}.d{k}.json"),
                    {"file": base, "epoch": k,
                     "predicate": {"col": key, "op": "upsert_in",
                                   "arg": f"{len(ks)} keys"},
                     **_encode_positions(pos, len(v))})
            outs.append(len(pos))
        return pa.table({"n": pa.array(outs, pa.int64())})

    marked = rd.from_items([{"path": p} for p in files]) \
        .map_batches(mark, batch_size=1, batch_format="pyarrow") \
        .to_pandas()
    n_replaced = int(marked["n"].sum())

    k = 0
    while stateio.exists(
            stateio.join(table_path, f"upsert-{k:05d}.parquet")):
        k += 1
    final = stateio.join(table_path, f"upsert-{k:05d}.parquet")
    if stateio.is_url(final) and stateio.commit_mode(final) != "rename":
        # object store: one single-object PUT is the commit
        stateio.pq_write_table(up_tbl, final)
    else:
        tmp = final + ".tmp"
        stateio.pq_write_table(up_tbl, tmp)
        stateio.rename(tmp, final)
    return {"files_marked": int((marked["n"] > 0).sum()),
            "n_replaced": n_replaced,
            "n_inserted": up_tbl.num_rows,
            "data_file": final}
