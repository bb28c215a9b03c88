"""CLI smoke tests (in-process — the session fixture owns Ray)."""

import json
import os

import pyarrow.parquet as pq
import pytest

from raygraph import synth
from raygraph.cli import main

pytestmark = pytest.mark.usefixtures("ray_session")


def test_cli_synth(tmp_path, capsys):
    out = os.path.join(str(tmp_path), "corpus")
    assert main(["synth", "--n-docs", "50", "--output", out]) == 0
    info = json.loads(capsys.readouterr().out.strip())
    assert info["n_docs"] == 50
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert sum(pq.read_metadata(os.path.join(out, f)).num_rows
               for f in files) == 50


def test_cli_build(tmp_path, capsys, monkeypatch):
    # keep the session alive: cli shuts Ray down, which would break the
    # shared fixture — patch shutdown to a no-op for the in-process test
    import ray

    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)
    corpus = os.path.join(str(tmp_path), "in")
    synth.write_corpus(corpus, 40)
    aliases_path = os.path.join(str(tmp_path), "aliases.json")
    with open(aliases_path, "w") as fh:
        json.dump(synth.alias_inventory(synth.entity_space(40)), fh)
    out = os.path.join(str(tmp_path), "kg")
    rc = main(["build", "--input", corpus, "--output", out,
               "--partitions", "4", "--aliases", aliases_path])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip())
    assert info["triples_raw"] > 0
    assert pq.ParquetDataset(info["edges"]).read().num_rows > 0


def test_cli_export(tmp_path, capsys, monkeypatch):
    import ray

    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)
    db = os.path.join(str(tmp_path), "db")
    synth.write_fixture_db(db)
    out = os.path.join(str(tmp_path), "export")
    rc = main(["export", "--db", db, "--graph", "IntegrationTestGraph",
               "--output", out, "--vertex-fields", "x", "y"])
    assert rc == 0
    v = pq.ParquetDataset(os.path.join(out, "vertices")).read()
    assert v.num_rows == 10 and "x" in v.schema.names


def test_cli_query_list_and_run(tmp_path, capsys, monkeypatch):
    import ray

    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)
    assert main(["query", "--list"]) == 0
    names = capsys.readouterr().out.split()
    assert "kg_degree_hist" in names and len(names) >= 150

    out = os.path.join(str(tmp_path), "dh.parquet")
    assert main(["query", "kg_degree_hist",
                 "--sf-dir", "/root/testdata/sf0.001",
                 "--output", out]) == 0
    tail = capsys.readouterr().out.strip().splitlines()[-1]
    info = json.loads(tail)
    assert info["rows"] == pq.read_metadata(out).num_rows > 0
    assert info["columns"] == ["deg", "n_vertices"]

    assert main(["query", "no_such_query"]) == 2


def test_cli_merge(tmp_path, capsys, monkeypatch):
    import ray

    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)
    base = os.path.join(str(tmp_path), "base")
    delta = os.path.join(str(tmp_path), "delta")
    synth.write_corpus(base, 40)
    synth.write_corpus(delta, 40)
    out = os.path.join(str(tmp_path), "kg")
    assert main(["build", "--input", base, "--output", out,
                 "--partitions", "4"]) == 0
    built = json.loads(capsys.readouterr().out.strip())
    assert main(["merge", "--input", delta, "--output", out,
                 "--partitions", "4"]) == 0
    merged = json.loads(capsys.readouterr().out.strip())
    # delta landed as a second epoch on the same checkpoint
    assert merged["partitions"] == 8
    assert merged["partitions_skipped"] == 4
    assert merged["triples_raw"] == 2 * built["triples_raw"]


def test_cli_asof_round_trip(tmp_path, capsys, monkeypatch):
    import ray

    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)
    d = str(tmp_path)
    corpus = os.path.join(d, "in")
    synth.write_corpus(corpus, 60)
    kg = os.path.join(d, "kg")
    assert main(["build", "--input", corpus, "--output", kg,
                 "--partitions", "4"]) == 0
    capsys.readouterr()
    assert main(["asof", "--kg", kg, "--epoch", "0", "--output",
                 os.path.join(d, "snap"), "--partitions", "4"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # no merges yet: as-of epoch 0 == the current tables
    cur = pq.ParquetDataset(os.path.join(kg, "edges")).read()
    assert rep["n_edges"] == cur.num_rows
    snap = pq.ParquetDataset(rep["edges"]).read()
    a = snap.select(["_key"]).to_pandas().sort_values(
        "_key", ignore_index=True)
    b = cur.select(["_key"]).to_pandas().sort_values(
        "_key", ignore_index=True)
    assert a.equals(b)


def test_cli_validate_strict_exit(tmp_path, capsys, monkeypatch):
    import ray

    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)
    d = str(tmp_path)
    import pandas as pd
    import pyarrow as pa

    tdir = os.path.join(d, "table")
    os.makedirs(tdir)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "k": [1, 1, 2], "v": [0.5, 2.0, 0.1]}), preserve_index=False),
        os.path.join(tdir, "t.parquet"))
    rules = [{"rule": "unique", "col": "k"},
             {"rule": "in_range", "col": "v", "lo": 0.0, "hi": 1.0}]
    rf = os.path.join(d, "rules.json")
    with open(rf, "w") as fh:
        json.dump(rules, fh)
    rc = main(["validate", "--input", tdir, "--rules", rf, "--strict"])
    rep = json.loads(capsys.readouterr().out.strip())
    assert rc == 3
    assert rep["total_violations"] == 2
    assert rep["by_rule"]["unique:k"] == 1
    # non-strict reports but exits 0
    assert main(["validate", "--input", tdir, "--rules", rf]) == 0


def test_cli_query_stats_flag(tmp_path, capsys, monkeypatch):
    import ray

    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)
    rc = main(["query", "docs_by_lang_source", "--sf-dir",
               "/root/testdata/sf0.001", "--stats"])
    assert rc == 0
    err = capsys.readouterr().err
    # the Ray Data executor's per-operator report made it to stderr
    assert "Operator" in err or "driver-side" in err


def test_cli_dedup_incremental(tmp_path, capsys, monkeypatch):
    import ray

    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)
    import pandas as pd
    import pyarrow as pa

    d = str(tmp_path)
    corpus = os.path.join(d, "delta")
    os.makedirs(corpus)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3], "text": ["a", "a", "b"]}),
        preserve_index=False), os.path.join(corpus, "t.parquet"))
    idx = os.path.join(d, "idx")
    out1 = os.path.join(d, "out1")
    assert main(["dedup", "--input", corpus, "--index", idx,
                 "--output", out1]) == 0
    rep1 = json.loads(capsys.readouterr().out.strip())
    assert rep1["epoch"] == 0 and rep1["survivors"] == 2
    # same delta again: converges, new epoch still committed
    assert main(["dedup", "--input", corpus, "--index", idx]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip())
    assert rep2["epoch"] == 1 and rep2["survivors"] == 0


def test_cli_url_output_dirs(tmp_path, capsys, monkeypatch):
    # curate / prepare / dedup accept file:// output dirs end to end:
    # the report paths route through stateio like the heavy lifting
    import ray

    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)
    import pandas as pd
    import pyarrow as pa

    d = str(tmp_path)
    corpus = os.path.join(d, "docs")
    os.makedirs(corpus)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["long enough document text here ok"] * 2
        + ["x", "another long enough document body"]}),
        preserve_index=False), os.path.join(corpus, "t.parquet"))
    spec = os.path.join(d, "spec.json")
    with open(spec, "w") as fh:
        json.dump([{"stage": "length_filter", "min_chars": 10}], fh)

    cur_out = os.path.join(d, "curated")
    assert main(["curate", "--input", corpus, "--output",
                 "file://" + cur_out, "--spec", spec]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["rows_out"] == 3
    assert os.path.exists(os.path.join(cur_out, "_report.json"))
    assert any(f.endswith(".parquet")
               for f in os.listdir(os.path.join(cur_out, "docs")))

    prep_out = os.path.join(d, "prep")
    assert main(["prepare", "--input", corpus, "--output",
                 "file://" + prep_out, "--seq-len", "8",
                 "--seed", "0"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["n_docs"] == 4 and rep["n_packs"] >= 1
    assert os.path.exists(os.path.join(prep_out, "_report.json"))

    surv_out = os.path.join(d, "surv")
    assert main(["dedup", "--input", corpus,
                 "--index", os.path.join(d, "idx"),
                 "--output", "file://" + surv_out]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["survivors"] == 3
    assert sum(pq.read_metadata(os.path.join(surv_out, f)).num_rows
               for f in os.listdir(surv_out)
               if f.endswith(".parquet")) == 3


def test_cli_bands_validated_up_front(tmp_path, capsys, monkeypatch):
    # --bands that does not divide --num-perm must exit 2 with one
    # clean line, not crash deep in the signature reshape
    import ray

    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)
    import pandas as pd
    import pyarrow as pa

    corpus = os.path.join(str(tmp_path), "delta")
    os.makedirs(corpus)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": [1, 2], "text": ["aaaa", "bbbb"]}),
        preserve_index=False), os.path.join(corpus, "t.parquet"))
    for args in (
        ["lsh-stats", "--input", corpus, "--bands", "48"],
        ["dedup", "--input", corpus, "--near",
         "--index", os.path.join(str(tmp_path), "idx"),
         "--bands", "48"],
    ):
        rc = main(args)
        err = capsys.readouterr().err
        assert rc == 2
        assert "evenly divide" in err
        assert "Traceback" not in err
    # a custom num-perm that the bands DO divide is accepted
    assert main(["lsh-stats", "--input", corpus, "--bands", "48",
                 "--num-perm", "96"]) == 0


def test_cli_domain_errors_clean_exit(tmp_path, capsys, monkeypatch):
    # domain errors exit 2 with ONE clean line, never a traceback
    import ray

    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)
    rc = main(["build", "--input", str(tmp_path / "corpus"),
               "--output", str(tmp_path / "kg"), "--partitions", "0"])
    err = capsys.readouterr().err
    assert rc == 2
    assert "InvalidParameterError" in err
    assert "Traceback" not in err


def test_cli_prepare_shuffled_packing(tmp_path, capsys, monkeypatch):
    import ray

    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)
    import duckdb
    import pandas as pd
    import pyarrow as pa

    d = str(tmp_path)
    corpus = os.path.join(d, "docs")
    os.makedirs(corpus)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": range(6),
        "text": ["w " * 6] * 6}), preserve_index=False),
        os.path.join(corpus, "t.parquet"))
    out = os.path.join(d, "prep")
    assert main(["prepare", "--input", corpus, "--output", out,
                 "--seq-len", "10", "--seed", "3"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["n_docs"] == 6 and rep["total_tokens"] == 36
    assert rep["n_packs"] == 4  # 6-token docs in 10-token windows
    got = duckdb.sql(
        f"select count(*) from read_parquet('{out}/docs/*.parquet') "
        "where offset_in_pack + n_tokens <= 10").fetchone()[0]
    # every doc whose window has room fits entirely; assignment is by
    # FIRST token (pack_sequences contract)
    assert got >= 4
    # determinism: same seed reproduces identical assignment
    out2 = os.path.join(d, "prep2")
    assert main(["prepare", "--input", corpus, "--output", out2,
                 "--seq-len", "10", "--seed", "3"]) == 0
    capsys.readouterr()
    a = duckdb.sql(f"select * from read_parquet('{out}/docs/*.parquet')"
                   " order by doc_id").df()
    b = duckdb.sql(f"select * from read_parquet('{out2}/docs/*.parquet')"
                   " order by doc_id").df()
    assert a.equals(b)


def test_cli_prepare_zero_survivors(tmp_path, capsys, monkeypatch):
    # a spec that filters EVERY row must yield an all-zero report, not
    # a crash on the empty-glob duckdb read
    import ray

    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)
    import pandas as pd
    import pyarrow as pa

    d = str(tmp_path)
    corpus = os.path.join(d, "docs")
    os.makedirs(corpus)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": range(4),
        "text": ["short"] * 4}), preserve_index=False),
        os.path.join(corpus, "t.parquet"))
    spec = os.path.join(d, "spec.json")
    with open(spec, "w") as fh:
        json.dump([{"stage": "length_filter",
                    "min_chars": 10_000}], fh)
    out = os.path.join(d, "prep")
    assert main(["prepare", "--input", corpus, "--output", out,
                 "--spec", spec, "--seq-len", "10"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["n_docs"] == 0 and rep["total_tokens"] == 0 \
        and rep["n_packs"] == 0


def test_cli_profile(tmp_path, capsys, monkeypatch):
    import ray

    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)
    import pandas as pd
    import pyarrow as pa

    d = str(tmp_path / "t")
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "k": [1, 2, 2, None], "s": ["a", "b", "b", "c"]}),
        preserve_index=False), os.path.join(d, "t.parquet"))
    assert main(["profile", "--input", d, "--columns", "k,s"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    by = {c["column"]: c for c in rep["columns"]}
    assert by["k"]["n_null"] == 1 and by["k"]["n_distinct"] == 2
    assert by["s"]["n_distinct"] == 3 and by["s"]["min_v"] == "a"


def test_cli_lsh_stats(tmp_path, capsys, monkeypatch):
    import ray

    monkeypatch.setattr(ray, "shutdown", lambda *a, **k: None)
    import pandas as pd
    import pyarrow as pa

    d = str(tmp_path / "docs")
    os.makedirs(d)
    la = ("the quick brown fox jumps over the lazy dog tonight ") * 4
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({
        "doc_id": range(5),
        "text": [la] * 4 + ["something entirely different here"]}),
        preserve_index=False), os.path.join(d, "t.parquet"))
    assert main(["lsh-stats", "--input", d, "--bands", "8",
                 "--shingle", "word", "--cap", "3"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    # 4 identical docs share all 8 band buckets; cap 3 binds in each
    assert rep["max_bucket_size"] == 4
    assert rep["buckets_over_cap"] == 8
    assert rep["docs_beyond_cap"] == 8
    assert rep["cap"] == 3
