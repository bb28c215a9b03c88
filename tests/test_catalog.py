"""Catalog integrity: every queries() entry has an oracle twin whose
SQL BINDS against the registered table views — catches column typos
and broken CTEs without running anything (duckdb EXPLAIN = binder
only). Guards future catalog additions."""

import os

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def catalog():
    import __ray_entry__ as entry

    return entry.queries(), entry.oracle_sql()


def test_every_query_has_an_oracle(catalog):
    qs, oracles = catalog
    assert set(qs) == set(oracles), (
        sorted(set(qs) ^ set(oracles)))


def test_every_oracle_binds(catalog):
    _, oracles = catalog
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{os.path.join(SF, t)}.parquet')")
    bad = []
    for name, sql in oracles.items():
        try:
            con.execute("EXPLAIN " + sql)
        except Exception as e:  # noqa: BLE001 - report them all
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad


def test_registry_keys_paired_and_unique(catalog):
    # every queries() entry has an oracle and vice versa; the dict
    # literals contain no duplicate keys (a duplicate silently rebinds
    # — the r2-advice failure class)
    import ast

    queries, oracles = catalog
    q, o = set(queries), set(oracles)
    assert q == o, (sorted(q - o)[:5], sorted(o - q)[:5])

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tree = ast.parse(open(os.path.join(root, "__ray_entry__.py")).read())
    dup = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict) and len(node.keys) > 50:
            names = [k.value for k in node.keys
                     if isinstance(k, ast.Constant)]
            seen = set()
            dup += [n for n in names if n in seen or seen.add(n)]
    assert not dup, dup
