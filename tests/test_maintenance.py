"""Small-file compaction (raygraph/maintenance.py): row preservation,
hive-unit independence, resume-skip, row-count verification gate."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_small_files(d, n_files=6, rows_per=40, offset=0):
    os.makedirs(d, exist_ok=True)
    for i in range(n_files):
        lo = offset + i * rows_per
        pq.write_table(pa.table({
            "k": pa.array(range(lo, lo + rows_per), pa.int64()),
            "v": pa.array([f"r{j}" for j in range(lo, lo + rows_per)]),
        }), os.path.join(d, f"f{i:03d}.parquet"))


def _rows(d):
    fs = sorted(glob.glob(os.path.join(d, "**", "*.parquet"),
                          recursive=True))
    t = pa.concat_tables([pq.read_table(f) for f in fs])
    return sorted(zip(t.column("k").to_pylist(), t.column("v").to_pylist()))


def test_compact_flat_dir(ray_session, tmp_path):
    from raygraph.maintenance import compact_table

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write_small_files(src, n_files=6, rows_per=40)
    stats = compact_table(src, dst, target_rows_per_file=100)
    assert stats["rows"] == 240 and stats["files_in"] == 6
    assert stats["files_out"] <= 3  # 240 rows / 100-target
    assert _rows(dst) == _rows(src)


def test_compact_hive_units_and_resume(ray_session, tmp_path):
    from raygraph.maintenance import compact_table

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write_small_files(os.path.join(src, "part=a"), 4, 25, offset=0)
    _write_small_files(os.path.join(src, "part=b"), 4, 25, offset=1000)
    stats = compact_table(src, dst, target_rows_per_file=200)
    assert stats == {"units": 2, "units_skipped": 0, "rows": 200,
                     "files_in": 8, "files_out": 2}
    assert _rows(os.path.join(dst, "part=a")) == \
        _rows(os.path.join(src, "part=a"))

    # resume skips committed units entirely (manifest-driven)
    os.remove(_one_manifest(dst, "part=b"))
    stats2 = compact_table(src, dst, target_rows_per_file=200, resume=True)
    assert stats2["units_skipped"] == 1 and stats2["rows"] == 200
    assert _rows(dst) == _rows(src)


def _one_manifest(dst, unit):
    from raygraph.maintenance import _manifest
    return _manifest(dst, unit)


def test_compact_missing_input_raises(ray_session, tmp_path):
    from raygraph.maintenance import compact_table

    with pytest.raises(FileNotFoundError):
        compact_table(str(tmp_path / "nope"), str(tmp_path / "out"))


def test_compact_cli(ray_session, tmp_path, monkeypatch):
    import ray

    from raygraph.cli import main

    # shared fixture — patch shutdown to a no-op for the in-process test
    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write_small_files(src, 3, 50)
    rc = main(["compact", "--input", src, "--output", dst,
               "--target-rows", "150"])
    assert rc == 0
    man = json.load(open(os.path.join(dst, "_compact", "_flat.json")))
    assert man["rows"] == 150


def test_zone_maps_prune_only_nonoverlapping_files(ray_session, tmp_path):
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raygraph.maintenance import build_zone_maps, prune_files

    root = str(tmp_path / "zm")
    # three range-clustered files: [0,99], [100,199], [200,299]
    for i in range(3):
        os.makedirs(os.path.join(root, f"tile={i}"))
        pq.write_table(
            pa.table({"k": pa.array(range(i * 100, i * 100 + 100),
                                    pa.int64())}),
            os.path.join(root, f"tile={i}", "part.parquet"))
    man = build_zone_maps(root, ["k"])
    assert os.path.exists(man)

    files, skipped = prune_files(root, "k", 120, 150)
    assert skipped == 2 and len(files) == 1
    assert "tile=1" in files[0]
    # overlap at a boundary keeps both files
    files, skipped = prune_files(root, "k", 99, 100)
    assert skipped == 1 and len(files) == 2
    # pruned read == full filter
    got = sorted(int(v) for f in prune_files(root, "k", 120, 150)[0]
                 for v in pq.read_table(f).column("k").to_pylist()
                 if 120 <= v <= 150)
    assert got == list(range(120, 151))


def test_cluster_table_resume_and_pruning(ray_session, tmp_path):
    import json
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raygraph.maintenance import cluster_table, prune_files

    src = str(tmp_path / "src")
    os.makedirs(src)
    ts = np.arange(0, 4000, dtype="int64") * 86_400_000_000
    pq.write_table(pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "v": pa.array(range(4000), pa.int64()),
    }), os.path.join(src, "part.parquet"))

    out = str(tmp_path / "clustered")
    stats = cluster_table(src, out, col="ts", n_tiles=4)
    assert stats == {"tiles": 4, "tiles_skipped": 0, "rows": 4000}
    # zone maps exist and a mid-range query skips tiles
    lo = int(np.datetime64("1972-01-01", "us").astype("int64"))
    hi = int(np.datetime64("1973-01-01", "us").astype("int64"))
    files, skipped = prune_files(out, "ts", lo, hi)
    assert skipped >= 2
    got = sorted(v for f in files
                 for v in pq.read_table(f).column("v").to_pylist())
    full = pq.read_table(os.path.join(src, "part.parquet")).to_pandas()
    want = sorted(full.loc[(full["ts"].astype("int64") >= lo)
                           & (full["ts"].astype("int64") <= hi), "v"])
    assert set(want) <= set(got)

    # resume: drop one tile manifest, rerun — only that tile redoes,
    # content identical (bounds reloaded from _bounds.json)
    os.remove(os.path.join(out, "_cluster", "tile_2.json"))
    stats2 = cluster_table(src, out, col="ts", n_tiles=4, resume=True)
    assert stats2 == {"tiles": 4, "tiles_skipped": 3, "rows": 4000}
    total = sum(pq.read_table(os.path.join(out, f"tile={i}")).num_rows
                for i in range(4))
    assert total == 4000
    with open(os.path.join(out, "_cluster", "_bounds.json")) as fh:
        assert len(json.load(fh)["bounds"]) == 3

def test_cluster_table_string_key(ray_session, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from raygraph.maintenance import cluster_table

    src = str(tmp_path / "src")
    os.makedirs(src)
    ids = [f"doc-{i:06d}" for i in range(1000)] + ["", "zzz-tail"]
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.string()),
        "v": pa.array(range(len(ids)), pa.int64()),
    }), os.path.join(src, "part.parquet"))

    out = str(tmp_path / "clustered")
    stats = cluster_table(src, out, col="doc_id", n_tiles=4)
    assert stats == {"tiles": 4, "tiles_skipped": 0, "rows": len(ids)}
    # tiles are disjoint prefix ranges: every tile's ids sort entirely
    # before the next tile's (8-byte big-endian prefix key is monotone)
    per_tile = [sorted(pq.read_table(os.path.join(out, f"tile={i}"))
                       .column("doc_id").to_pylist()) for i in range(4)]
    flat = [v for tile in per_tile for v in tile]
    assert flat == sorted(ids)
    assert sum(len(t) for t in per_tile) == len(ids)


def _mk_table(tmp_path, name, n=40, files=2):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / name)
    os.makedirs(d, exist_ok=True)
    per = n // files
    for f in range(files):
        lo = f * per
        pq.write_table(pa.table({
            "id": list(range(lo, lo + per)),
            "v": [i * 10 for i in range(lo, lo + per)],
        }), os.path.join(d, f"part-{f}.parquet"))
    return d


def test_delete_where_and_masked_read(ray_session, tmp_path):
    from raygraph.maintenance import delete_where, read_with_deletes

    d = _mk_table(tmp_path, "t1")
    stats = delete_where(d, "id", "mod_eq", "4:0")
    assert stats["n_deleted"] == 10
    got = read_with_deletes(d).to_pandas().sort_values("id")
    assert list(got["id"]) == [i for i in range(40) if i % 4 != 0]
    # data files untouched
    import pyarrow.parquet as pq

    assert pq.read_metadata(os.path.join(d, "part-0.parquet")) \
        .num_rows == 20


def test_delete_vectors_stack_across_epochs(ray_session, tmp_path):
    from raygraph.maintenance import delete_where, read_with_deletes

    d = _mk_table(tmp_path, "t2")
    delete_where(d, "id", "mod_eq", "2:0")   # evens
    delete_where(d, "id", "lt", "10")        # first ten (overlaps)
    got = read_with_deletes(d).to_pandas().sort_values("id")
    assert list(got["id"]) == [i for i in range(10, 40) if i % 2 == 1]
    # two epochs on disk per file
    assert len(glob.glob(os.path.join(d, "_deletes", "*.d0.json"))) == 2
    assert len(glob.glob(os.path.join(d, "_deletes", "*.d1.json"))) == 2


def test_read_without_deletes_is_plain_scan(ray_session, tmp_path):
    from raygraph.maintenance import read_with_deletes

    d = _mk_table(tmp_path, "t3")
    got = read_with_deletes(d, columns=["id"]).to_pandas()
    assert len(got) == 40


def test_delete_where_unknown_op_raises(ray_session, tmp_path):
    import pytest as _pytest

    from raygraph.errors import InvalidParameterError
    from raygraph.maintenance import delete_where

    d = _mk_table(tmp_path, "t4")
    with _pytest.raises(InvalidParameterError):
        delete_where(d, "id", "regex", "x")


def test_ipc_round_trip(ray_session, tmp_path):
    import ray.data as rd

    from raygraph.io import read_table_ipc, write_table_ipc

    ds = rd.from_arrow(pa.table({
        "id": list(range(100)), "s": [f"v{i}" for i in range(100)]}))
    d = str(tmp_path / "ipc")
    n = write_table_ipc(ds, d)
    assert n == 100
    back = read_table_ipc(d).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    assert list(back["id"]) == list(range(100))
    pruned = read_table_ipc(d, columns=["id"]).to_pandas()
    assert pruned.columns.tolist() == ["id"]


def test_ipc_missing_dir_raises(ray_session, tmp_path):
    import pytest as _pytest

    from raygraph.io import read_table_ipc

    with _pytest.raises(FileNotFoundError):
        read_table_ipc(str(tmp_path / "nope"))


def test_rowgroup_pruning_plan_and_superset(ray_session, tmp_path):
    from raygraph.io import plan_rowgroups, read_parquet_rowgroups

    d = str(tmp_path / "rg")
    os.makedirs(d)
    t = pa.table({"k": list(range(1000)),
                  "v": [i * 2 for i in range(1000)]})
    pq.write_table(t, os.path.join(d, "p.parquet"), row_group_size=100)
    plan = plan_rowgroups(d, "k", 250, 349)
    assert plan["n_groups_total"] == 10
    assert plan["n_groups_kept"] == 2          # groups [200,299],[300,399]
    got = read_parquet_rowgroups(d, "k", 250, 349).to_pandas()
    ks = set(got["k"])
    assert set(range(250, 350)) <= ks          # superset guarantee
    assert ks <= set(range(200, 400))          # only surviving groups


def test_rowgroup_pruning_empty_range(ray_session, tmp_path):
    from raygraph.io import read_parquet_rowgroups

    d = str(tmp_path / "rg2")
    os.makedirs(d)
    pq.write_table(pa.table({"k": [1, 2, 3]}),
                   os.path.join(d, "p.parquet"))
    got = read_parquet_rowgroups(d, "k", 100, 200).to_pandas()
    assert len(got) == 0


def test_compact_folds_deletion_vectors(ray_session, tmp_path):
    from raygraph.maintenance import (compact_table, delete_where,
                                      read_with_deletes)

    d = _mk_table(tmp_path, "t5", n=40, files=4)
    delete_where(d, "id", "mod_eq", "4:0")
    out = str(tmp_path / "t5c")
    stats = compact_table(d, out, target_rows_per_file=100)
    # deleted rows must NOT resurrect in the compacted output
    assert stats["rows"] == 30
    got = pq.ParquetDataset(out).read().to_pandas().sort_values("id")
    assert list(got["id"]) == [i for i in range(40) if i % 4 != 0]
    # and the output carries no sidecars
    assert not os.path.isdir(os.path.join(out, "_deletes"))
    # a masked re-read of the output equals the plain read
    assert len(read_with_deletes(out).to_pandas()) == 30


def test_cluster_folds_deletion_vectors(ray_session, tmp_path):
    from raygraph.maintenance import cluster_table, delete_where

    d = _mk_table(tmp_path, "t6", n=40, files=2)
    delete_where(d, "id", "lt", "10")
    out = str(tmp_path / "t6c")
    cluster_table(d, out, col="id", n_tiles=2)
    got = pq.ParquetDataset(
        out).read().to_pandas().sort_values("id")
    assert list(got["id"]) == list(range(10, 40))


def test_vacuum_drops_orphans_keeps_live(ray_session, tmp_path):
    from raygraph.maintenance import delete_where, vacuum

    d = _mk_table(tmp_path, "t7", n=20, files=2)
    delete_where(d, "id", "mod_eq", "2:0")
    # orphan one sidecar by removing its data file; plant a tmp file
    os.remove(os.path.join(d, "part-1.parquet"))
    open(os.path.join(d, "stray.tmp"), "w").write("x")
    stats = vacuum(d)
    assert stats == {"orphaned_sidecars": 1, "tmp_files": 1}
    # the live file's sidecar survives
    assert glob.glob(os.path.join(d, "_deletes",
                                  "part-0.parquet.d0.json"))


def test_vacuum_noop_on_clean_table(ray_session, tmp_path):
    from raygraph.maintenance import vacuum

    d = _mk_table(tmp_path, "t8")
    assert vacuum(d) == {"orphaned_sidecars": 0, "tmp_files": 0}


def _upsert_fixture(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tdir = str(tmp_path / "utab")
    os.makedirs(tdir)
    pq.write_table(pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                             "v": pa.array(["a", "b", "c"])}),
                   os.path.join(tdir, "p0.parquet"))
    pq.write_table(pa.table({"k": pa.array([4, 5], pa.int64()),
                             "v": pa.array(["d", "e"])}),
                   os.path.join(tdir, "p1.parquet"))
    return tdir


def test_upsert_replaces_and_inserts(ray_session, tmp_path):
    import pyarrow as pa

    import ray.data as rd

    from raygraph.maintenance import read_with_deletes, upsert_table

    tdir = _upsert_fixture(tmp_path)
    updates = rd.from_arrow(pa.table(
        {"k": pa.array([2, 9], pa.int64()),
         "v": pa.array(["B", "I"])}))
    res = upsert_table(tdir, updates, "k")
    assert res["n_replaced"] == 1 and res["n_inserted"] == 2
    assert res["files_marked"] == 1          # only p0 held key 2
    rows = {r["k"]: r["v"]
            for r in read_with_deletes(tdir).take_all()}
    assert rows == {1: "a", 2: "B", 3: "c", 4: "d", 5: "e", 9: "I"}


def test_upsert_rerun_converges(ray_session, tmp_path):
    import pyarrow as pa

    import ray.data as rd

    from raygraph.maintenance import read_with_deletes, upsert_table

    tdir = _upsert_fixture(tmp_path)
    updates = rd.from_arrow(pa.table(
        {"k": pa.array([2], pa.int64()), "v": pa.array(["B"])}))
    upsert_table(tdir, updates, "k")
    # a retried upsert masks the previous upsert file too: one live
    # copy survives
    upsert_table(tdir, rd.from_arrow(pa.table(
        {"k": pa.array([2], pa.int64()), "v": pa.array(["B"])})), "k")
    rows = sorted((r["k"], r["v"])
                  for r in read_with_deletes(tdir).take_all())
    assert rows == [(1, "a"), (2, "B"), (3, "c"), (4, "d"), (5, "e")]


def test_upsert_validation(ray_session, tmp_path):
    import pyarrow as pa

    import pytest as _pytest
    import ray.data as rd

    from raygraph.errors import InvalidParameterError
    from raygraph.maintenance import upsert_table

    tdir = _upsert_fixture(tmp_path)
    with _pytest.raises(InvalidParameterError):
        upsert_table(tdir, rd.from_arrow(pa.table(
            {"k": pa.array([2, 2], pa.int64()),
             "v": pa.array(["x", "y"])})), "k")
    with _pytest.raises(InvalidParameterError):
        upsert_table(tdir, rd.from_arrow(pa.table(
            {"k": pa.array([2], pa.int64())})), "k")
    # delta-size contract is enforced, not just documented: past the
    # bound upsert must refuse before any sidecar/driver-concat work
    with _pytest.raises(InvalidParameterError, match="delta-size"):
        upsert_table(tdir, rd.from_arrow(pa.table(
            {"k": pa.array([6, 7, 8], pa.int64()),
             "v": pa.array(["f", "g", "h"])})), "k",
            max_update_rows=2)


def test_upsert_type_mismatch_rejected(ray_session, tmp_path):
    # a name-compatible but type-mismatched updates table (int32 key)
    # must raise at the cast, never land as a mixed-schema parquet file
    import pyarrow as pa

    import pytest as _pytest
    import ray.data as rd

    from raygraph.maintenance import read_with_deletes, upsert_table

    from raygraph.errors import InvalidParameterError

    tdir = _upsert_fixture(tmp_path)
    bad = rd.from_arrow(pa.table(
        {"k": pa.array(["x"], pa.string()),   # not castable to int64
         "v": pa.array(["y"])}))
    with _pytest.raises(InvalidParameterError):
        upsert_table(tdir, bad, "k")
    # the table still scans cleanly end-to-end (no orphan mixed file)
    rows = {r["k"]: r["v"] for r in read_with_deletes(tdir).take_all()}
    assert rows[1] == "a" and len(rows) == 5


def test_upsert_int32_key_coerced(ray_session, tmp_path):
    # a losslessly castable updates table (int32 key, string payload)
    # is coerced to the table schema rather than rejected
    import pyarrow as pa

    import ray.data as rd

    from raygraph.maintenance import read_with_deletes, upsert_table

    tdir = _upsert_fixture(tmp_path)
    updates = rd.from_arrow(pa.table(
        {"k": pa.array([2], pa.int32()), "v": pa.array(["B"])}))
    upsert_table(tdir, updates, "k")
    rows = {r["k"]: r["v"] for r in read_with_deletes(tdir).take_all()}
    assert rows == {1: "a", 2: "B", 3: "c", 4: "d", 5: "e"}


def test_deletion_vector_bitmap_encoding_and_size(ray_session,
                                                  tmp_path):
    # dense deletes land as a zlib'd bitmap sidecar, SMALL: 10^6
    # deleted positions in one file must cost KBs, not the ~7 MB a
    # JSON int list costs; read_with_deletes output identical
    from raygraph.maintenance import delete_where, read_with_deletes

    tdir = str(tmp_path / "big")
    os.makedirs(tdir)
    n = 1_000_000
    pq.write_table(pa.table({
        "k": pa.array(range(n), pa.int64()),
        "v": pa.array(range(n), pa.int64())}),
        os.path.join(tdir, "p0.parquet"))
    stats = delete_where(tdir, "k", "lt", str(n - 5))
    assert stats["n_deleted"] == n - 5
    sidecars = glob.glob(os.path.join(tdir, "_deletes", "*.json"))
    assert len(sidecars) == 1
    size = os.path.getsize(sidecars[0])
    assert size < 50_000, f"bitmap sidecar unexpectedly {size} bytes"
    with open(sidecars[0]) as fh:
        assert json.load(fh)["encoding"] == "bitmap-z"
    got = sorted(r["k"] for r in read_with_deletes(tdir).take_all())
    assert got == list(range(n - 5, n))
    # sparse deletes stay a plain positions list
    stats2 = delete_where(tdir, "k", "eq", str(n - 1))
    assert stats2["n_deleted"] == 1
    newest = sorted(glob.glob(
        os.path.join(tdir, "_deletes", "*.json")))[-1]
    with open(newest) as fh:
        d = json.load(fh)
    assert d["encoding"] == "positions" and d["positions"] == [n - 1]
    got2 = sorted(r["k"] for r in read_with_deletes(tdir).take_all())
    assert got2 == list(range(n - 5, n - 1))


def test_deletion_vector_legacy_sidecar_read(ray_session, tmp_path):
    # pre-bitmap sidecars (bare positions list, no encoding key) must
    # keep masking — the stacked-epoch semantics are unchanged
    from raygraph.maintenance import read_with_deletes

    tdir = str(tmp_path / "legacy")
    os.makedirs(os.path.join(tdir, "_deletes"))
    pq.write_table(pa.table({"k": pa.array([0, 1, 2, 3], pa.int64())}),
                   os.path.join(tdir, "p0.parquet"))
    with open(os.path.join(tdir, "_deletes", "p0.parquet.d0.json"),
              "w") as fh:
        json.dump({"file": "p0.parquet", "epoch": 0,
                   "positions": [1, 3]}, fh)
    got = sorted(r["k"] for r in read_with_deletes(tdir).take_all())
    assert got == [0, 2]


def test_maintenance_on_file_url(ray_session, tmp_path):
    # the whole delete/read/upsert/vacuum/compact surface through the
    # fsspec route — same results as plain paths
    import pandas as pd
    import ray.data as rd

    from raygraph.maintenance import (compact_table, delete_where,
                                      read_with_deletes, upsert_table,
                                      vacuum)

    plain = str(tmp_path / "t")
    _write_small_files(plain, n_files=3, rows_per=10)
    url = "file://" + plain
    stats = delete_where(url, "k", "mod_eq", "3:0")
    assert stats["n_deleted"] == 10
    up = rd.from_arrow(pa.table({
        "k": pa.array([1, 1000], pa.int64()),
        "v": pa.array(["ONE", "NEW"])}))
    upsert_table(url, up, "k")
    rows = {r["k"]: r["v"] for r in read_with_deletes(url).take_all()}
    assert rows[1] == "ONE" and rows[1000] == "NEW"
    assert all(k % 3 != 0 or k == 1000 for k in rows)
    out_url = "file://" + str(tmp_path / "compacted")
    cstats = compact_table(url, out_url, target_rows_per_file=1000)
    assert cstats["rows"] == len(rows)
    assert vacuum(url)["tmp_files"] == 0
