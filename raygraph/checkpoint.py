"""Per-partition checkpoint manifest + resume.

The reference has NO checkpointing — a failure after retries kills the run
and cleanup merely releases server resources (SURVEY.md §4.1;
/root/reference/src/sharding.rs:140-168). The north rule requires resume,
so this module adds it: the expensive per-document phase (extract + link)
writes its output hive-partitioned by ``part_id = hash(doc_id) % P`` and
records one manifest JSON per finished partition with lineage + metrics.
On resume, completed partitions are skipped at the READ (filter before any
work) and stale files of incomplete partitions are removed (idempotent
rewrite — Ray task retries stay safe).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq

from .errors import CheckpointError

MANIFEST_DIR = "_manifest"


def partition_ids(doc_ids: pd.Series, num_partitions: int) -> pd.Series:
    """Deterministic, process-independent partition assignment.

    ``pd.util.hash_pandas_object`` uses a fixed hash key, so N- and 4N-CPU
    runs (and resumed runs) agree on every document's partition.
    """
    return (pd.util.hash_pandas_object(doc_ids, index=False) % num_partitions).astype(
        "int64"
    )


def _manifest_path(root: str, part_id: int) -> str:
    return os.path.join(root, MANIFEST_DIR, f"part-{part_id:05d}.json")


def completed_partitions(root: str) -> set[int]:
    out: set[int] = set()
    for f in glob.glob(os.path.join(root, MANIFEST_DIR, "part-*.json")):
        try:
            with open(f) as fh:
                m = json.load(fh)
        except (OSError, json.JSONDecodeError) as e:
            raise CheckpointError(f"corrupt manifest {f}: {e}") from e
        if m.get("status") == "done":
            out.add(int(m["partition_id"]))
    return out


def clean_incomplete(root: str, num_partitions: int) -> list[int]:
    """Remove data of partitions that have files but no 'done' manifest."""
    done = completed_partitions(root)
    removed = []
    for d in glob.glob(os.path.join(root, "part_id=*")):
        pid = int(d.rsplit("=", 1)[1])
        if pid not in done:
            shutil.rmtree(d)
            removed.append(pid)
    return removed


def write_partition_manifest(root: str, part_id: int, **metrics) -> None:
    os.makedirs(os.path.join(root, MANIFEST_DIR), exist_ok=True)
    path = _manifest_path(root, part_id)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"partition_id": part_id, "status": "done", **metrics}, fh)
    os.replace(tmp, path)  # atomic: a manifest either exists complete or not


def finalize_partitions(root: str, num_partitions: int) -> dict[int, dict]:
    """After a successful phase write: count rows per partition from parquet
    footers (metadata-only, no data read) and write manifests."""
    stats: dict[int, dict] = {}
    for d in glob.glob(os.path.join(root, "part_id=*")):
        pid = int(d.rsplit("=", 1)[1])
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        rows = sum(pq.read_metadata(f).num_rows for f in files)
        stats[pid] = {"rows": rows, "files": [os.path.basename(f) for f in files]}
        write_partition_manifest(root, pid, rows=rows, num_files=len(files))
    return stats


def completed_rows(root: str) -> dict[int, int]:
    """Row counts of completed partitions from their manifests
    (metadata-only — no parquet reads)."""
    out: dict[int, int] = {}
    for f in glob.glob(os.path.join(root, MANIFEST_DIR, "part-*.json")):
        try:
            with open(f) as fh:
                m = json.load(fh)
        except (OSError, json.JSONDecodeError) as e:
            raise CheckpointError(f"corrupt manifest {f}: {e}") from e
        if m.get("status") == "done":
            out[int(m["partition_id"])] = int(m.get("rows", 0))
    return out


def completed_files(root: str) -> list[str]:
    """Parquet files of all COMPLETED partitions (a resume/merge reads
    these directly — `read_parquet` takes a file list, not a list of
    directories)."""
    done = completed_partitions(root)
    files: list[str] = []
    for pid in sorted(done):
        files.extend(sorted(glob.glob(
            os.path.join(root, f"part_id={pid}", "*.parquet"))))
    return files
