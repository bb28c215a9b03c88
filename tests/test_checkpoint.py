"""Checkpoint / resume: per-partition manifests, interrupted-run recovery,
byte-identical completion (north rule: resumable from checkpoint with
per-partition lineage + metrics)."""

import glob
import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from raygraph import checkpoint as ckpt
from raygraph import synth
from raygraph.config import GraphBuildConfig
from raygraph.pipeline import build_graph

pytestmark = pytest.mark.usefixtures("ray_session")


def test_partition_ids_stable():
    ids = pd.Series([f"doc/{i}" for i in range(100)])
    a = ckpt.partition_ids(ids, 8)
    b = ckpt.partition_ids(ids.sample(frac=1.0, random_state=1).sort_index(), 8)
    assert list(a) == list(b)
    assert set(a.unique()) <= set(range(8))


def test_manifest_roundtrip(tmp_path):
    root = str(tmp_path)
    ckpt.write_partition_manifest(root, 3, rows=10, num_files=1)
    assert ckpt.completed_partitions(root) == {3}


def test_clean_incomplete_removes_unmanifested(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "part_id=1"))
    os.makedirs(os.path.join(root, "part_id=2"))
    ckpt.write_partition_manifest(root, 1, rows=5)
    removed = ckpt.clean_incomplete(root, 4)
    assert removed == [2]
    assert os.path.isdir(os.path.join(root, "part_id=1"))
    assert not os.path.isdir(os.path.join(root, "part_id=2"))


def _graph_tables(res):
    v = pq.ParquetDataset(res.vertices_path).read().to_pandas()
    e = pq.ParquetDataset(res.edges_path).read().to_pandas()
    return (
        v.sort_values("_key").reset_index(drop=True).sort_index(axis=1),
        e.sort_values("_key").reset_index(drop=True).sort_index(axis=1),
    )


def test_resume_after_partial_failure(tmp_path):
    """Simulate a crash after some partitions finished: a full reference
    run, then a second run where most partitions are pre-marked done (and
    one left with stale files) must (a) skip the done partitions' work and
    (b) produce byte-identical graph tables."""
    n = 100
    in_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(in_dir)
    pq.write_table(synth.corpus(n), os.path.join(in_dir, "docs.parquet"))
    aliases = synth.alias_inventory(synth.entity_space(n))

    def cfg(out, resume=False):
        return GraphBuildConfig(
            input_path=in_dir, output_path=os.path.join(str(tmp_path), out),
            num_partitions=4, linker_concurrency=(1, 2), resume=resume,
        )

    ref = build_graph(cfg("ref"), aliases=aliases)
    ref_v, ref_e = _graph_tables(ref)

    # build the 'crashed' state: copy completed triples for partitions 0,1
    # with manifests; partition 2 has stale files and NO manifest;
    # partition 3 absent entirely
    crash_out = os.path.join(str(tmp_path), "crash")
    crash_tp = os.path.join(crash_out, "triples")
    os.makedirs(crash_tp)
    for pid in (0, 1, 2):
        src = os.path.join(ref.triples_path, f"part_id={pid}")
        dst = os.path.join(crash_tp, f"part_id={pid}")
        shutil.copytree(src, dst)
    for pid in (0, 1):
        rows = sum(
            pq.read_metadata(f).num_rows
            for f in glob.glob(os.path.join(crash_tp, f"part_id={pid}", "*.parquet"))
        )
        ckpt.write_partition_manifest(crash_tp, pid, rows=rows)

    res = build_graph(cfg("crash", resume=True), aliases=aliases)
    got_v, got_e = _graph_tables(res)
    assert got_v.equals(ref_v)
    assert got_e.equals(ref_e)
    # all four partitions now carry manifests
    assert ckpt.completed_partitions(res.triples_path) == {0, 1, 2, 3}
    # lineage metrics recorded per partition
    with open(os.path.join(res.triples_path, ckpt.MANIFEST_DIR,
                           "part-00003.json")) as fh:
        m = json.load(fh)
    assert m["status"] == "done" and m["rows"] > 0


def test_resume_on_file_url_marker_mode(tmp_path):
    """The KG checkpoint/resume path end-to-end through a shared-storage
    URL (file://) under FORCED marker commit mode — the object-store
    discipline: a crashed run's completed partitions (manifests present)
    are skipped, an unmanifested partial is cleaned, and the resumed
    graph tables are byte-identical to a plain-path reference build."""
    from raygraph import stateio

    n = 100
    in_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(in_dir)
    pq.write_table(synth.corpus(n), os.path.join(in_dir, "docs.parquet"))
    aliases = synth.alias_inventory(synth.entity_space(n))

    ref = build_graph(GraphBuildConfig(
        input_path=in_dir, output_path=os.path.join(str(tmp_path), "ref"),
        num_partitions=4, linker_concurrency=(1, 2)), aliases=aliases)
    ref_v, ref_e = _graph_tables(ref)

    # crashed state mirrored under a file:// output: partitions 0,1
    # complete with manifests, partition 2 stale without manifest
    crash_plain = os.path.join(str(tmp_path), "crash")
    crash_url = "file://" + crash_plain
    crash_tp = os.path.join(crash_plain, "triples")
    os.makedirs(crash_tp)
    for pid in (0, 1, 2):
        shutil.copytree(os.path.join(ref.triples_path, f"part_id={pid}"),
                        os.path.join(crash_tp, f"part_id={pid}"))
    stateio.set_commit_mode("marker")
    try:
        for pid in (0, 1):
            rows = sum(pq.read_metadata(f).num_rows for f in glob.glob(
                os.path.join(crash_tp, f"part_id={pid}", "*.parquet")))
            ckpt.write_partition_manifest("file://" + crash_tp, pid,
                                          rows=rows)
        res = build_graph(GraphBuildConfig(
            input_path=in_dir, output_path=crash_url,
            num_partitions=4, linker_concurrency=(1, 2), resume=True),
            aliases=aliases)
    finally:
        stateio.set_commit_mode(None)
    assert res.vertices_path.startswith("file://")
    # read back through the plain-path mirror: identical tables
    got_v = pq.ParquetDataset(
        os.path.join(crash_plain, "vertices")).read().to_pandas() \
        .sort_values("_key").reset_index(drop=True).sort_index(axis=1)
    got_e = pq.ParquetDataset(
        os.path.join(crash_plain, "edges")).read().to_pandas() \
        .sort_values("_key").reset_index(drop=True).sort_index(axis=1)
    assert got_v.equals(ref_v)
    assert got_e.equals(ref_e)
    assert ckpt.completed_partitions("file://" + crash_tp) == {0, 1, 2, 3}
    assert res.metrics["partitions_skipped"] == 2


def test_resume_noop_when_all_done(tmp_path):
    """Resuming a COMPLETE run redoes no partition work and leaves
    identical outputs."""
    n = 60
    in_dir = os.path.join(str(tmp_path), "in")
    os.makedirs(in_dir)
    pq.write_table(synth.corpus(n), os.path.join(in_dir, "docs.parquet"))
    aliases = synth.alias_inventory(synth.entity_space(n))
    cfg = GraphBuildConfig(
        input_path=in_dir, output_path=os.path.join(str(tmp_path), "out"),
        num_partitions=4, linker_concurrency=(1, 2),
    )
    first = build_graph(cfg, aliases=aliases)
    v1, e1 = _graph_tables(first)
    cfg2 = GraphBuildConfig(
        input_path=in_dir, output_path=os.path.join(str(tmp_path), "out"),
        num_partitions=4, linker_concurrency=(1, 2), resume=True,
    )
    second = build_graph(cfg2, aliases=aliases)
    assert second.metrics["triples_new"] == 0       # no re-extracted rows
    assert second.metrics["partitions_skipped"] == 4
    assert second.metrics["triples_raw"] == first.metrics["triples_raw"]
    v2, e2 = _graph_tables(second)
    assert v2.equals(v1) and e2.equals(e1)