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

All manifest/partition IO routes through :mod:`raygraph.stateio`, so
``root`` may be a shared-storage URL on a multi-node cluster; manifest
writes are single-object-atomic (tmp+replace locally, one PUT
remotely).
"""

from __future__ import annotations

import pandas as pd

from . import stateio
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
    return stateio.join(root, MANIFEST_DIR, f"part-{part_id:05d}.json")


def completed_partitions(root: str) -> set[int]:
    import json

    out: set[int] = set()
    for f in stateio.glob(stateio.join(root, MANIFEST_DIR,
                                       "part-*.json")):
        try:
            m = stateio.read_json(f)
        except (OSError, json.JSONDecodeError) as e:
            raise CheckpointError(f"corrupt manifest {f}: {e}") from e
        if m.get("status") == "done":
            out.add(int(m["partition_id"]))
    return out


def clean_incomplete(root: str, num_partitions: int) -> list[int]:
    """Remove data of partitions that have files but no 'done' manifest."""
    done = completed_partitions(root)
    removed = []
    for d in stateio.glob(stateio.join(root, "part_id=*")):
        pid = int(d.rsplit("=", 1)[1])
        if pid not in done:
            stateio.rmtree(d)
            removed.append(pid)
    return removed


def write_partition_manifest(root: str, part_id: int, **metrics) -> None:
    stateio.makedirs(stateio.join(root, MANIFEST_DIR))
    # atomic: a manifest either exists complete or not (tmp+replace
    # locally, single-object PUT remotely)
    stateio.write_json_atomic(
        _manifest_path(root, part_id),
        {"partition_id": part_id, "status": "done", **metrics})


def finalize_partitions(root: str, num_partitions: int) -> dict[int, dict]:
    """After a successful phase write: count rows per partition from parquet
    footers (metadata-only, no data read) and write manifests."""
    stats: dict[int, dict] = {}
    for d in stateio.glob(stateio.join(root, "part_id=*")):
        pid = int(d.rsplit("=", 1)[1])
        files = stateio.data_files(d)
        rows = sum(stateio.pq_read_metadata(f).num_rows for f in files)
        stats[pid] = {"rows": rows,
                      "files": [stateio.basename(f) for f in files]}
        write_partition_manifest(root, pid, rows=rows, num_files=len(files))
    return stats


def completed_rows(root: str) -> dict[int, int]:
    """Row counts of completed partitions from their manifests
    (metadata-only — no parquet reads)."""
    import json

    out: dict[int, int] = {}
    for f in stateio.glob(stateio.join(root, MANIFEST_DIR,
                                       "part-*.json")):
        try:
            m = stateio.read_json(f)
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
        files.extend(stateio.data_files(
            stateio.join(root, f"part_id={pid}")))
    return files
