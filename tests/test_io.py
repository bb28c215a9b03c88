"""io routing contract: Lance paths route to read_lance/write_lance with
pushdown intact; a missing lance package fails with a clear ImportError
(the package is absent in this sandbox, so the Lance branch is pinned via
mocks — SURVEY.md names Lance as the target format)."""

import sys
import types

import pytest

import raygraph.io as rio


@pytest.fixture
def fake_lance(monkeypatch):
    mod = types.ModuleType("lance")
    monkeypatch.setitem(sys.modules, "lance", mod)
    return mod


def test_lance_read_routes_with_pushdown(monkeypatch, fake_lance):
    calls = {}

    def fake_read_lance(path, columns=None, **kwargs):
        calls["path"] = path
        calls["columns"] = columns
        return "SENTINEL"

    monkeypatch.setattr(rio.ray.data, "read_lance", fake_read_lance)
    out = rio.read_table("/data/corpus.lance", columns=["doc_id", "spans"])
    assert out == "SENTINEL"
    assert calls == {"path": "/data/corpus.lance",
                     "columns": ["doc_id", "spans"]}


def test_lance_write_routes(monkeypatch, fake_lance):
    calls = {}

    class FakeDs:
        def write_lance(self, path, **kwargs):
            calls["path"] = path

        def write_parquet(self, path, **kwargs):  # pragma: no cover
            raise AssertionError("parquet path must not be taken for .lance")

    rio.write_table(FakeDs(), "/out/vertices.lance")
    assert calls == {"path": "/out/vertices.lance"}


def test_lance_missing_package_raises(monkeypatch):
    monkeypatch.setitem(sys.modules, "lance", None)  # force ImportError
    with pytest.raises(ImportError, match="lance is not installed"):
        rio.read_table("/data/corpus.lance")
    with pytest.raises(ImportError, match="lance is not installed"):
        rio.write_table(object(), "/out/t.lance")


def test_parquet_path_untouched_by_lance_gate(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"a": [1, 2], "b": ["x", "y"]}), p)
    ds = rio.read_table(p, columns=["a"])
    got = ds.take_all()
    assert [r["a"] for r in got] == [1, 2]
    assert all(set(r) == {"a"} for r in got)


def test_exporter_lance_schema_routes(monkeypatch, fake_lance, tmp_path):
    """GraphSource.collection_schema reads Lance schemas via the gated
    import (parquet reader would choke on a .lance path)."""
    import pyarrow as pa

    from raygraph.exporter import GraphSource

    (tmp_path / "V.lance").mkdir()
    schema = pa.schema([("_id", pa.string())])

    class FakeDs:
        pass

    ds = FakeDs()
    ds.schema = schema
    fake_lance.dataset = lambda path: ds
    src = GraphSource(str(tmp_path))
    assert src.collection_schema("V") is schema


def test_read_union_by_name_pads_and_rejects_retype(ray_session, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from raygraph.io import read_union_by_name

    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"k": pa.array([1, 2], pa.int64()),
                             "old": pa.array(["x", "y"], pa.string())}), a)
    pq.write_table(pa.table({"k": pa.array([3], pa.int64()),
                             "new": pa.array([7.5], pa.float64())}), b)
    out = read_union_by_name([a, b]).to_pandas().sort_values("k")
    assert list(out.columns) == ["k", "new", "old"]   # name-ordered union
    assert out["old"].tolist()[:2] == ["x", "y"]
    assert out["old"].isna().tolist() == [False, False, True]
    assert out["new"].isna().tolist() == [True, True, False]

    c = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({"k": pa.array(["oops"], pa.string())}), c)
    with pytest.raises(TypeError, match="retyped"):
        read_union_by_name([a, c])


def test_read_jsonl_lenient_quarantines_bad_lines(ray_session, tmp_path):
    import os

    import pyarrow as pa

    from raygraph.io import read_jsonl_lenient

    p = str(tmp_path / "in")
    os.makedirs(p)
    with open(os.path.join(p, "a.json"), "w") as fh:
        fh.write('{"k": 1, "v": "x"}\n')
        fh.write("garbage line\n")
        fh.write('{"k": 2, "v": "y"}\n')
        fh.write("\n")                       # blank lines are skipped
    with open(os.path.join(p, "b.json"), "w") as fh:
        fh.write('{"k": 3, "v": "z"}\n')

    schema = pa.schema([("k", pa.int64()), ("v", pa.string())])
    good, bad = read_jsonl_lenient(p, schema=schema)
    g = good.to_pandas().sort_values("k")
    assert g["k"].tolist() == [1, 2, 3]
    b = bad.to_pandas()
    assert len(b) == 1
    assert b["file"].iloc[0] == "a.json" and b["line_no"].iloc[0] == 2


def test_orc_round_trip_and_pruning(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    from raygraph.io import read_table_orc, write_table_orc

    df = pd.DataFrame({"doc_id": range(100),
                       "source": [f"s{i % 3}" for i in range(100)],
                       "n_chars": [i * 7 for i in range(100)]})
    d = str(tmp_path / "orc")
    n = write_table_orc(rd.from_pandas(df).repartition(4), d)
    assert n == 100
    import glob as g
    assert len(g.glob(d + "/*.orc")) == 4  # one file per block

    back = read_table_orc(d).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    assert back.equals(df)

    pruned = read_table_orc(d, columns=["source"])
    assert pruned.schema().names == ["source"]
    assert pruned.count() == 100

    import pytest as pt
    with pt.raises(FileNotFoundError):
        read_table_orc(str(tmp_path / "empty_dir_nope"))


def test_check_rules_all_kinds(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from raygraph.errors import InvalidParameterError
    from raygraph.ops.validate import check_rules

    df = pd.DataFrame({
        "k": [1, 2, 2, 3, 4],
        "v": [5.0, -1.0, 7.0, None, 100.0],
        "s": ["ab", "zz", "ab", None, "a9"],
    })
    ds = rd.from_pandas(df).repartition(3)
    got = check_rules(ds, [
        {"rule": "not_null", "col": "v"},
        {"rule": "in_range", "col": "v", "lo": 0.0, "hi": 50.0},
        {"rule": "matches", "col": "s", "pattern": "[a-z]+"},
        {"rule": "in_set", "col": "s", "values": ["ab", "zz"]},
        {"rule": "unique", "col": "k"},
    ])
    by = dict(zip(got["rule"], got["n_violations"]))
    assert by == {
        "not_null:v": 1,
        "in_range:v": 3,        # -1, null, 100
        "matches:s": 2,         # None and 'a9' fail the full match
        "in_set:s": 2,          # None and 'a9'
        "unique:k": 1,          # one duplicated key
    }

    with pytest.raises(InvalidParameterError, match="unknown rule"):
        check_rules(ds, [{"rule": "nope", "col": "k"}])
    with pytest.raises(InvalidParameterError, match="lo and hi"):
        check_rules(ds, [{"rule": "in_range", "col": "v"}])


def test_privacy_audit_known_groups(ray_session):
    import ray.data as rd

    from raygraph.ops.validate import privacy_audit

    # groups: (1,a)x3 seg{X,Y}, (1,b)x1 seg{X}, (2,a)x2 seg{X}
    ds = rd.from_items([
        {"q1": 1, "q2": "a", "s": "X"},
        {"q1": 1, "q2": "a", "s": "Y"},
        {"q1": 1, "q2": "a", "s": "X"},
        {"q1": 1, "q2": "b", "s": "X"},
        {"q1": 2, "q2": "a", "s": "X"},
        {"q1": 2, "q2": "a", "s": "X"},
    ])
    t = privacy_audit(ds, ["q1", "q2"], k=3, sensitive_col="s", l=2)
    row = t.to_pylist()[0]
    assert row == {"k": 3, "l": 2, "n_rows": 6, "n_groups": 3,
                   "n_risky_groups": 2, "n_risky_rows": 3,
                   "n_lowdiv_groups": 2}
    # without a sensitive column: k-anonymity only
    t2 = privacy_audit(ds, ["q1", "q2"], k=2)
    row2 = t2.to_pylist()[0]
    assert row2 == {"k": 2, "n_rows": 6, "n_groups": 3,
                    "n_risky_groups": 1, "n_risky_rows": 1}


def test_privacy_audit_rejects_bad_k(ray_session):
    import pytest as _pytest
    import ray.data as rd

    from raygraph.errors import InvalidParameterError
    from raygraph.ops.validate import privacy_audit

    ds = rd.from_items([{"q": 1}])
    with _pytest.raises(InvalidParameterError):
        privacy_audit(ds, ["q"], k=0)


def test_check_rules_ref_integrity(ray_session, tmp_path):
    # FK check against another parquet table: missing values and nulls
    # are violations; matching values are not
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from raygraph.ops.validate import check_rules
    from raygraph.errors import InvalidParameterError

    ref = str(tmp_path / "ref")
    os.makedirs(ref)
    pq.write_table(pa.Table.from_pandas(
        pd.DataFrame({"k": [1, 2, 3]}), preserve_index=False),
        os.path.join(ref, "r.parquet"))
    ds = rd.from_pandas(pd.DataFrame({"fk": [1, 1, 2, 9, None]}))
    got = check_rules(ds, [{"rule": "ref", "col": "fk",
                            "ref": ref, "ref_col": "k"}])
    assert got.loc[0, "rule"] == "ref:fk"
    assert got.loc[0, "n_violations"] == 2  # the 9 and the null
    # all-valid case
    ok = check_rules(rd.from_pandas(pd.DataFrame({"fk": [1, 2]})),
                     [{"rule": "ref", "col": "fk",
                       "ref": ref, "ref_col": "k"}])
    assert ok.loc[0, "n_violations"] == 0
    # param validation fails before cluster work
    import pytest as _pytest
    with _pytest.raises(InvalidParameterError):
        check_rules(ds, [{"rule": "ref", "col": "fk"}])
