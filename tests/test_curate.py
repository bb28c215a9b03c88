"""Declarative curation pipeline: spec validation, funnel counts,
stream/funnel parity, CLI smoke."""

import json
import os
import subprocess
import sys

import pandas as pd
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _corpus(tmp_path):
    texts = [
        "<p>the quick brown fox jumps over the lazy dog again and "
        "again because the dog is very lazy indeed</p>",       # clean
        "the quick brown fox jumps over the lazy dog again and "
        "again because the dog is very lazy indeed",            # dup of 0
        "short",                                                 # too short
        "mail me at a@b.com " + "the dog and the fox ran " * 6,  # pii
        "zz zz zz zz zz " * 8,                                   # low quality
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts,
                       "source": ["s"] * len(texts),
                       "lang": ["en"] * len(texts)})
    d = str(tmp_path / "corpus")
    os.makedirs(d)
    pq.write_table(
        __import__("pyarrow").Table.from_pandas(df, preserve_index=False),
        os.path.join(d, "part-0.parquet"))
    return d


SPEC = [
    {"stage": "strip_markup"},
    {"stage": "pii_scrub"},
    {"stage": "length_filter", "min_chars": 50},
    {"stage": "quality_filter", "min_quality": 0.5},
    {"stage": "exact_dedup"},
]


def test_curation_funnel_counts_and_output(ray_session, tmp_path):
    from raygraph.curate import run_curation

    src = _corpus(tmp_path)
    out = str(tmp_path / "out")
    rep = run_curation(src, out, SPEC, mode="funnel")
    assert rep["rows_in"] == 5
    by = {s["stage"]: s["rows_out"] for s in rep["stages"]}
    assert by["strip_markup"] == 5          # row-preserving
    assert by["pii_scrub"] == 5
    assert by["length_filter"] == 4         # 'short' dropped
    assert by["exact_dedup"] < by["length_filter"]  # dup collapsed
    assert rep["rows_out"] == by["exact_dedup"]
    # markup + pii gone from survivors
    got = pq.ParquetDataset(os.path.join(out, "docs")).read().to_pandas()
    assert not got["text"].str.contains("<p>|a@b.com", regex=True).any()
    assert os.path.exists(os.path.join(out, "_report.json"))


def test_curation_stream_matches_funnel_survivors(ray_session, tmp_path):
    from raygraph.curate import run_curation

    src = _corpus(tmp_path)
    a = run_curation(src, str(tmp_path / "f"), SPEC, mode="funnel")
    b = run_curation(src, str(tmp_path / "s"), SPEC, mode="stream")
    ga = pq.ParquetDataset(str(tmp_path / "f/docs")).read().to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    gb = pq.ParquetDataset(str(tmp_path / "s/docs")).read().to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert ga.equals(gb)
    assert a["rows_out"] == b["rows_out"]


def test_curation_bad_spec_fails_before_work(ray_session, tmp_path):
    from raygraph.curate import run_curation
    from raygraph.errors import InvalidParameterError

    src = _corpus(tmp_path)
    with pytest.raises(InvalidParameterError, match="unknown stage"):
        run_curation(src, str(tmp_path / "x"), [{"stage": "nope"}])
    with pytest.raises(InvalidParameterError, match="bad params"):
        run_curation(src, str(tmp_path / "y"),
                     [{"stage": "length_filter", "bogus": 1}])
    with pytest.raises(InvalidParameterError, match="'stage' key"):
        run_curation(src, str(tmp_path / "z"), ["length_filter"])
    # nothing was written for any failing spec
    assert not os.path.exists(str(tmp_path / "x"))


def test_curate_cli_smoke(tmp_path):
    src = _corpus(tmp_path)
    spec_file = str(tmp_path / "spec.json")
    with open(spec_file, "w") as fh:
        json.dump(SPEC, fh)
    out = str(tmp_path / "cli_out")
    r = subprocess.run(
        [sys.executable, "-m", "raygraph.cli", "curate", "--input", src,
         "--output", out, "--spec", spec_file, "--stream",
         "--num-cpus", "2"],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    # survivors: one of the markup/plain dup pair + the scrubbed doc
    # ('short' fails length, the zz-doc fails quality)
    assert rep["rows_out"] == 2
    assert os.path.exists(os.path.join(out, "_report.json"))


def test_curation_sample_and_cap_stages(ray_session, tmp_path):
    import pyarrow as pa

    from raygraph.curate import run_curation

    df = pd.DataFrame({
        "doc_id": range(200),
        "text": [f"document number {i} with plenty of the usual words "
                 "in it for the filters" for i in range(200)],
        "source": [f"s{i % 2}" for i in range(200)],
        "lang": ["en"] * 200,
    })
    d = str(tmp_path / "c2")
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(d, "p.parquet"))

    spec = [{"stage": "cap_per_group", "group_col": "source", "cap": 30},
            {"stage": "sample", "keep_per_mille": 500}]
    rep = run_curation(d, str(tmp_path / "o2"), spec, mode="funnel")
    by = {s["stage"]: s["rows_out"] for s in rep["stages"]}
    assert by["cap_per_group"] == 60          # 30 per source, 2 sources
    assert 0 < by["sample"] < 60              # md5 split of the capped set
    got = pq.ParquetDataset(str(tmp_path / "o2/docs")).read().to_pandas()
    assert set(got.columns) == set(df.columns)  # helper column dropped
    # determinism: same spec, same survivors
    rep2 = run_curation(d, str(tmp_path / "o3"), spec, mode="stream")
    got2 = pq.ParquetDataset(str(tmp_path / "o3/docs")).read().to_pandas()
    assert sorted(got2["doc_id"]) == sorted(got["doc_id"])


def test_gopher_and_c4_filter_stages(ray_session):
    import ray.data as rd

    from raygraph.curate import compile_spec

    good = ("the quick brown fox and that dog have fun with logs. "
            * 6) + "End. Yes."
    ds = rd.from_items([
        {"doc_id": 0, "text": good},                 # survives both
        {"doc_id": 1, "text": "too short. the of"},  # gopher: n_tok
        {"doc_id": 2, "text": ("the of and that have with be to "
                               * 8)},                # c4: no sentences
    ])
    names, staged = compile_spec(ds, [{"stage": "gopher_filter"},
                                      {"stage": "c4_filter"}])
    assert names == ["gopher_filter", "c4_filter"]
    after_gopher = {r["doc_id"] for r in staged[0].take_all()}
    survivors = {r["doc_id"] for r in staged[1].take_all()}
    assert after_gopher == {0, 2}
    assert survivors == {0}


def test_line_dedup_stage_rewrites_text_keeps_columns(ray_session):
    import ray.data as rd

    from raygraph.curate import compile_spec

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["own zero\nshared footer",
                 "own one\nShared Footer ",
                 "own two\nnothing shared"],
        "source": ["a", "b", "c"],
        "lang": ["en", "de", "fr"]})
    _, staged = compile_spec(rd.from_pandas(df),
                             [{"stage": "line_dedup", "min_df": 2}])
    out = staged[-1].to_pandas().sort_values(
        "doc_id", ignore_index=True)
    assert list(out["text"]) == ["own zero", "own one",
                                 "own two\nnothing shared"]
    # non-text columns survive the rewrite
    assert list(out["source"]) == ["a", "b", "c"]
    assert list(out["lang"]) == ["en", "de", "fr"]


def test_incremental_dedup_stage(ray_session, tmp_path):
    # first curation run commits the index epoch and keeps all docs;
    # re-running the same spec on the same corpus drops everything
    # (the convergence property) while preserving non-text columns
    import ray.data as rd

    from raygraph.curate import compile_spec

    df = pd.DataFrame({
        "doc_id": [1, 2], "text": ["alpha", "beta"],
        "lang": ["en", "de"]})
    idx = str(tmp_path / "idx")
    spec = [{"stage": "incremental_dedup", "index": idx}]
    _, staged = compile_spec(rd.from_pandas(df), spec)
    out1 = staged[-1].to_pandas().sort_values("doc_id",
                                              ignore_index=True)
    assert list(out1["doc_id"]) == [1, 2]
    assert list(out1["lang"]) == ["en", "de"]
    _, staged2 = compile_spec(rd.from_pandas(df), spec)
    assert staged2[-1].count() == 0


def test_partitioned_curation_resume_and_rejection(ray_session, tmp_path):
    import json as _json
    import os as _os

    import pyarrow as _pa

    from raygraph.curate import run_curation_partitioned
    from raygraph.errors import InvalidParameterError

    src = str(tmp_path / "src")
    _os.makedirs(src)
    for i in range(4):
        df = pd.DataFrame({
            "doc_id": range(i * 10, i * 10 + 10),
            "text": [("word " * 20 if j % 2 == 0 else "tiny")
                     for j in range(10)]})
        pq.write_table(_pa.Table.from_pandas(df, preserve_index=False),
                       _os.path.join(src, f"f{i}.parquet"))
    out = str(tmp_path / "out")
    spec = [{"stage": "length_filter", "min_chars": 50}]
    rep = run_curation_partitioned(src, out, spec, partitions=2)
    assert rep["rows_out"] == 20 and rep["skipped"] == 0
    # delete one manifest: resume redoes ONLY that unit
    _os.remove(_os.path.join(out, "_manifest", "part-00001.json"))
    rep2 = run_curation_partitioned(src, out, spec, partitions=2,
                                    resume=True)
    assert rep2["rows_out"] == 20 and rep2["skipped"] == 1
    # output readable and complete
    import duckdb
    n = duckdb.sql(
        f"select count(*) from read_parquet('{out}/docs/*/*.parquet')"
    ).fetchone()[0]
    assert n == 20
    # cross-document stages are rejected up front
    with pytest.raises(InvalidParameterError):
        run_curation_partitioned(src, str(tmp_path / "x"),
                                 [{"stage": "exact_dedup"}],
                                 partitions=2)


def test_partitioned_matches_unpartitioned(ray_session, tmp_path):
    # per-document specs must produce the SAME survivor set whether run
    # as one stream or as independent shards
    import os as _os

    import duckdb
    import pyarrow as _pa

    from raygraph.curate import run_curation, run_curation_partitioned

    src = str(tmp_path / "src")
    _os.makedirs(src)
    for i in range(3):
        df = pd.DataFrame({
            "doc_id": range(i * 8, i * 8 + 8),
            "text": [("quality words repeated here " * 6
                      if j % 3 else "x") for j in range(8)]})
        pq.write_table(_pa.Table.from_pandas(df, preserve_index=False),
                       _os.path.join(src, f"f{i}.parquet"))
    spec = [{"stage": "length_filter", "min_chars": 30}]
    run_curation(src, str(tmp_path / "a"), spec, mode="stream")
    run_curation_partitioned(src, str(tmp_path / "b"), spec,
                             partitions=3)
    ga = duckdb.sql(f"select doc_id from read_parquet('{tmp_path}/a/"
                    "docs/*.parquet') order by 1").df()
    gb = duckdb.sql(f"select doc_id from read_parquet('{tmp_path}/b/"
                    "docs/*/*.parquet') order by 1").df()
    assert ga.equals(gb) and len(ga) == 15


def _mk_corpus(src, n_files=4, rows=10):
    import os as _os

    import pyarrow as _pa

    _os.makedirs(src, exist_ok=True)
    for i in range(n_files):
        df = pd.DataFrame({
            "doc_id": range(i * rows, i * rows + rows),
            "text": [("word " * 20 if j % 2 == 0 else "tiny")
                     for j in range(rows)]})
        pq.write_table(_pa.Table.from_pandas(df, preserve_index=False),
                       _os.path.join(src, f"f{i}.parquet"))


def test_partitioned_resume_redoes_on_input_change(ray_session,
                                                   tmp_path):
    # unit membership is a strided listing: adding an input file
    # reshuffles EVERY unit, so resume must redo manifested units whose
    # recorded file list differs — never trust a bare manifest
    import os as _os

    import duckdb

    from raygraph.curate import run_curation_partitioned

    src = str(tmp_path / "src")
    _mk_corpus(src, n_files=3)
    out = str(tmp_path / "out")
    spec = [{"stage": "length_filter", "min_chars": 50}]
    rep = run_curation_partitioned(src, out, spec, partitions=2)
    assert rep["skipped"] == 0
    # grow the input set 3 -> 5 files: BOTH strided units change
    # ([f0,f2] -> [f0,f2,f4], [f1] -> [f1,f3]) — nothing trusted
    _mk_corpus(src, n_files=5)
    rep2 = run_curation_partitioned(src, out, spec, partitions=2,
                                    resume=True)
    assert rep2["skipped"] == 0          # nothing trusted
    assert rep2["rows_out"] == 25        # 5 files x 5 long docs
    n = duckdb.sql(
        f"select count(*) from read_parquet('{out}/docs/*/*.parquet')"
    ).fetchone()[0]
    assert n == 25
    # same inputs + same spec: now everything is trusted
    rep3 = run_curation_partitioned(src, out, spec, partitions=2,
                                    resume=True)
    assert rep3["skipped"] == 2 and rep3["rows_out"] == 25
    # spec change invalidates too
    rep4 = run_curation_partitioned(
        src, out, [{"stage": "length_filter", "min_chars": 1}],
        partitions=2, resume=True)
    assert rep4["skipped"] == 0 and rep4["rows_out"] == 50


def test_partitioned_jobs_overlap_equivalent(ray_session, tmp_path):
    # jobs=2 overlaps units on a driver thread pool; survivors and
    # report totals must be identical to the sequential run
    import duckdb

    from raygraph.curate import run_curation_partitioned

    src = str(tmp_path / "src")
    _mk_corpus(src, n_files=4)
    spec = [{"stage": "length_filter", "min_chars": 50}]
    r1 = run_curation_partitioned(src, str(tmp_path / "seq"), spec,
                                  partitions=4)
    r2 = run_curation_partitioned(src, str(tmp_path / "par"), spec,
                                  partitions=4, jobs=2)
    assert r1["rows_out"] == r2["rows_out"]
    assert [u["rows_out"] for u in r1["units"]] == \
        [u["rows_out"] for u in r2["units"]]
    ga = duckdb.sql(f"select doc_id from read_parquet('{tmp_path}/seq/"
                    "docs/*/*.parquet') order by 1").df()
    gb = duckdb.sql(f"select doc_id from read_parquet('{tmp_path}/par/"
                    "docs/*/*.parquet') order by 1").df()
    assert ga.equals(gb)
