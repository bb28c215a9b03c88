"""The shared-storage path layer: primitives, the commit protocol in
both modes (rename vs marker), and crash-window semantics."""

import json
import os

import pytest

from raygraph import stateio


@pytest.fixture
def marker_mode():
    stateio.set_commit_mode("marker")
    yield
    stateio.set_commit_mode(None)


def test_primitives_local(tmp_path):
    d = str(tmp_path / "a" / "b")
    assert not stateio.exists(d)
    stateio.makedirs(d)
    assert stateio.isdir(d)
    p = stateio.join(d, "x.json")
    stateio.write_json_atomic(p, {"k": 1})
    assert stateio.read_json(p) == {"k": 1}
    assert stateio.listdir(d) == ["x.json"]
    assert stateio.glob(stateio.join(d, "*.json")) == [p]
    stateio.remove(p)
    stateio.remove(p)  # ignore-missing
    assert stateio.listdir(d) == []
    stateio.rmtree(d)
    stateio.rmtree(d)  # ignore-missing
    assert not stateio.exists(d)
    assert stateio.listdir(d) == []  # missing dir lists empty


def test_primitives_file_url(tmp_path):
    # same operations through the fsspec route (file:// URL)
    base = "file://" + str(tmp_path / "u")
    stateio.makedirs(base)
    p = stateio.join(base, "x.json")
    stateio.write_json_atomic(p, {"k": [1, 2]})
    assert stateio.read_json(p) == {"k": [1, 2]}
    assert stateio.listdir(base) == ["x.json"]
    assert stateio.glob(stateio.join(base, "*.json")) == [p]
    # and the plain-path view agrees byte-for-byte
    with open(str(tmp_path / "u" / "x.json")) as fh:
        assert json.load(fh) == {"k": [1, 2]}
    stateio.rmtree(base)
    assert not stateio.exists(base)


def test_commit_rename_mode(tmp_path):
    parent = str(tmp_path)
    tmp = os.path.join(parent, "_tmp-00000")
    final = os.path.join(parent, "epoch-00000")
    os.makedirs(tmp)
    with open(os.path.join(tmp, "f.parquet"), "w") as fh:
        fh.write("data")
    stateio.commit_dir(tmp, final)
    assert not os.path.exists(tmp)
    assert stateio.is_committed(final)
    assert stateio.committed_dirs(parent, "epoch-") == ["epoch-00000"]
    # marker written even in rename mode (uniform layout), but payload
    # listing never includes it
    assert os.path.exists(os.path.join(final, stateio.COMMIT_MARKER))
    assert stateio.data_files(final) == \
        [os.path.join(final, "f.parquet")]


def test_commit_marker_mode_and_crash_window(tmp_path, marker_mode):
    parent = str(tmp_path)
    tmp = os.path.join(parent, "_tmp-00000")
    final = os.path.join(parent, "epoch-00000")
    os.makedirs(tmp)
    with open(os.path.join(tmp, "f.parquet"), "w") as fh:
        fh.write("data")
    # crash window 1: staged only — invisible
    assert stateio.committed_dirs(parent, "epoch-") == []
    # crash window 2: copied but NOT marked — still invisible
    stateio._copy_tree(tmp, final)
    assert os.path.exists(os.path.join(final, "f.parquet"))
    assert not stateio.is_committed(final)
    assert stateio.committed_dirs(parent, "epoch-") == []
    # full commit: marker lands LAST, staging dir cleaned
    stateio.commit_dir(tmp, final)
    assert stateio.is_committed(final)
    assert stateio.committed_dirs(parent, "epoch-") == ["epoch-00000"]
    assert not os.path.exists(tmp)


def test_preexisting_local_dir_counts_committed(tmp_path):
    # pre-layer state: a dir committed by atomic rename, no marker —
    # local readers accept it
    d = os.path.join(str(tmp_path), "epoch-00003")
    os.makedirs(d)
    assert stateio.is_committed(d)
    assert stateio.committed_dirs(str(tmp_path), "epoch-") == \
        ["epoch-00003"]


def test_marker_mode_requires_marker(tmp_path, marker_mode):
    d = os.path.join(str(tmp_path), "epoch-00003")
    os.makedirs(d)
    assert not stateio.is_committed(d)


def test_ray_parquet_roundtrip_file_url(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    url = "file://" + str(tmp_path / "t")
    stateio.makedirs(url)
    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    stateio.ray_write_parquet(rd.from_pandas(df), url)
    back = stateio.ray_read_parquet(url).to_pandas() \
        .sort_values("a", ignore_index=True)
    assert back.equals(df)
    files = stateio.data_files(url)
    assert files and all(f.startswith("file://") for f in files)
    # single-file pyarrow helpers through the same layer
    md = stateio.pq_read_metadata(files[0])
    assert md.num_rows == 3
    sch = stateio.pq_read_schema(files[0])
    assert set(sch.names) == {"a", "b"}
    t = stateio.pq_read_table(files[0], columns=["a"])
    assert t.column_names == ["a"]


def test_incremental_exact_dedup_on_file_url(ray_session, tmp_path):
    # the whole persisted-index lifecycle (create, anti-join, commit,
    # second epoch, compaction) through the fsspec route — survivors
    # identical to the plain-path run
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.dedup import (compact_dedup_index,
                                    exact_dedup_incremental)

    base = pd.DataFrame({"doc_id": [1, 2],
                         "text": ["alpha", "beta"]})
    delta = pd.DataFrame({"doc_id": [3, 4, 5],
                          "text": ["alpha", "fresh", "fresh"]})

    def run(index_path):
        exact_dedup_incremental(rd.from_pandas(base), index_path)
        s, e = exact_dedup_incremental(rd.from_pandas(delta),
                                       index_path)
        rows = sorted((r["doc_id"], r["text"]) for r in s.take_all())
        stats = compact_dedup_index(index_path)
        return rows, e, stats

    plain_rows, plain_e, plain_stats = run(str(tmp_path / "plain"))
    url_rows, url_e, url_stats = run("file://" + str(tmp_path / "url"))
    assert url_rows == plain_rows == [(4, "fresh")]
    assert url_e == plain_e == 1
    assert url_stats["compacted"] and url_stats == plain_stats
    # compacted epoch visible through the layer, marker present
    assert stateio.committed_dirs(
        "file://" + str(tmp_path / "url"), "epoch-") == ["epoch-00002"]


def test_incremental_minhash_dedup_marker_mode(ray_session, tmp_path,
                                               marker_mode):
    # near-dup index under the MARKER commit protocol (the object-store
    # path): epochs only visible once marked; re-run converges
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.dedup import minhash_dedup_incremental

    la = ("the quick brown fox jumps over the lazy dog tonight ") * 4
    base = pd.DataFrame({"doc_id": [1], "text": [la]})
    idx = str(tmp_path / "idx")
    s0, e0 = minhash_dedup_incremental(rd.from_pandas(base), idx,
                                       threshold=0.9, bands=8,
                                       shingle="word")
    assert e0 == 0 and s0.count() == 1
    assert os.path.exists(os.path.join(
        idx, "epoch-00000", stateio.COMMIT_MARKER))
    delta = pd.DataFrame({"doc_id": [2, 3],
                          "text": [la, "something else entirely"]})
    s1, e1 = minhash_dedup_incremental(rd.from_pandas(delta), idx,
                                       threshold=0.9, bands=8,
                                       shingle="word")
    assert e1 == 1
    assert sorted(r["doc_id"] for r in s1.take_all()) == [3]
    # an UNMARKED epoch dir (simulated crash) is invisible: drop the
    # marker from epoch-00001 and the same delta dedups as if that
    # epoch never committed (doc 3's rep is gone, doc 3 survives again)
    os.remove(os.path.join(idx, "epoch-00001", stateio.COMMIT_MARKER))
    s2, e2 = minhash_dedup_incremental(rd.from_pandas(delta), idx,
                                       threshold=0.9, bands=8,
                                       shingle="word")
    assert e2 == 1   # epoch numbering also ignores the partial
    assert sorted(r["doc_id"] for r in s2.take_all()) == [3]


def test_incremental_minhash_dedup_on_file_url(ray_session, tmp_path):
    # the NEAR-dup index lifecycle through the fsspec route: guarded
    # (bucketed bands + bloom/reps sidecars) epochs commit and read
    # back through file:// URLs, survivors identical to the plain-path
    # run, convergence holds
    import os

    import pandas as pd
    import ray.data as rd

    from raygraph.ops.dedup import minhash_dedup_incremental

    la = ("the quick brown fox jumps over the lazy dog tonight ") * 4
    base = pd.DataFrame({"doc_id": [1], "text": [la]})
    delta = pd.DataFrame({"doc_id": [2, 3],
                          "text": [la, "something else entirely"]})

    def run(idx):
        minhash_dedup_incremental(rd.from_pandas(base), idx,
                                  threshold=0.9, bands=8,
                                  shingle="word")
        s, e = minhash_dedup_incremental(rd.from_pandas(delta), idx,
                                         threshold=0.9, bands=8,
                                         shingle="word")
        return sorted(r["doc_id"] for r in s.take_all()), e

    plain_rows, plain_e = run(str(tmp_path / "plain"))
    url_rows, url_e = run("file://" + str(tmp_path / "url"))
    assert url_rows == plain_rows == [3]
    assert url_e == plain_e == 1
    # the guarded layout landed through the URL route
    ep0 = os.path.join(str(tmp_path), "url", "epoch-00000")
    assert os.path.exists(os.path.join(ep0, "_bands_bloom.json"))
    assert os.path.exists(os.path.join(ep0, "_reps_meta.json"))
    assert any(n.startswith("bucket=")
               for n in os.listdir(os.path.join(ep0, "bands")))


def test_marker_retry_clears_stale_partial(tmp_path, marker_mode):
    # crash mid-copy leaves an UNMARKED partial at final containing
    # files the retried attempt no longer stages; the retry must start
    # from an empty target — merging would permanently commit the
    # crashed attempt's stale files (e.g. never-returned dedup hashes)
    parent = str(tmp_path)
    final = os.path.join(parent, "epoch-00000")
    # crashed attempt: copied one stale file, never marked
    os.makedirs(final)
    with open(os.path.join(final, "stale.parquet"), "w") as fh:
        fh.write("from-crashed-attempt")
    assert not stateio.is_committed(final)
    # retried attempt stages a DIFFERENT payload
    tmp = os.path.join(parent, "_tmp-retry")
    os.makedirs(tmp)
    with open(os.path.join(tmp, "fresh.parquet"), "w") as fh:
        fh.write("retry")
    stateio.commit_dir(tmp, final)
    assert stateio.is_committed(final)
    names = sorted(os.listdir(final))
    assert "stale.parquet" not in names
    assert names == [stateio.COMMIT_MARKER, "fresh.parquet"]


def test_rename_commit_file_url_refuses_existing_target(tmp_path):
    # rename mode through a file:// URL: fsspec's mv → shutil.move
    # would silently nest tmp INSIDE an existing final; the commit must
    # instead fail loudly (single-writer contract), like plain-path
    # os.rename does
    parent = str(tmp_path)
    final_url = "file://" + os.path.join(parent, "epoch-00000")
    for name in ("_tmp-a", "_tmp-b"):
        d = os.path.join(parent, name)
        os.makedirs(d)
        with open(os.path.join(d, "f.parquet"), "w") as fh:
            fh.write(name)
    stateio.commit_dir("file://" + os.path.join(parent, "_tmp-a"),
                       final_url)
    assert stateio.is_committed(final_url)
    with pytest.raises(OSError):   # FileExistsError/NotADirectoryError
        stateio.commit_dir("file://" + os.path.join(parent, "_tmp-b"),
                           final_url)
    # winner's payload intact, loser's tree never nested inside
    fin = os.path.join(parent, "epoch-00000")
    with open(os.path.join(fin, "f.parquet")) as fh:
        assert fh.read() == "_tmp-a"
    assert not os.path.isdir(os.path.join(fin, "_tmp-b"))


def test_marker_commit_multifile_tree_url(tmp_path, marker_mode):
    # marker commit of a many-file staged tree through the fsspec
    # route: the pooled copy must land every file (nested dirs too)
    # before the marker
    parent = str(tmp_path)
    tmp = os.path.join(parent, "_tmp-x")
    os.makedirs(os.path.join(tmp, "sub"))
    for i in range(10):
        with open(os.path.join(tmp, f"f{i:02d}.parquet"), "w") as fh:
            fh.write(str(i))
    with open(os.path.join(tmp, "sub", "meta.json"), "w") as fh:
        fh.write("{}")
    final = os.path.join(parent, "epoch-00000")
    stateio.commit_dir("file://" + tmp, "file://" + final)
    assert stateio.is_committed("file://" + final)
    assert len(stateio.data_files("file://" + final)) == 10
    with open(os.path.join(final, "f07.parquet")) as fh:
        assert fh.read() == "7"
    with open(os.path.join(final, "sub", "meta.json")) as fh:
        assert fh.read() == "{}"
    assert not os.path.exists(tmp)


def test_http_stub_sentinel_raises_on_use():
    # when the aiohttp-less sentinel module is installed, probing the
    # class must keep working (Ray's import probe) but USING it must
    # fail with the real cause, not a silent no-op filesystem
    import sys
    if "aiohttp" in sys.modules or _aiohttp_available():
        pytest.skip("aiohttp present; stub not installed")
    from fsspec.implementations.http import HTTPFileSystem
    with pytest.raises(ImportError, match="aiohttp"):
        HTTPFileSystem()


def _aiohttp_available() -> bool:
    import importlib.util
    return importlib.util.find_spec("aiohttp") is not None


def test_marker_commit_refuses_committed_target(tmp_path, marker_mode):
    # single-writer loudness in marker mode: committing over an
    # already-committed dir must raise, never silently merge trees
    parent = str(tmp_path)
    final = os.path.join(parent, "epoch-00000")
    for name in ("_tmp-a", "_tmp-b"):
        d = os.path.join(parent, name)
        os.makedirs(d)
        with open(os.path.join(d, "f.parquet"), "w") as fh:
            fh.write(name)
    stateio.commit_dir(os.path.join(parent, "_tmp-a"), final)
    with pytest.raises(FileExistsError):
        stateio.commit_dir(os.path.join(parent, "_tmp-b"), final)
    with open(os.path.join(final, "f.parquet")) as fh:
        assert fh.read() == "_tmp-a"   # winner's payload intact
