"""Driver-style correctness self-check: run every queries() entry and its
oracle_sql() twin on the same sf dir, compare row-count + column names +
order-insensitive value hash. Usage:

    python scripts/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import logging
import os
import sys
import time

logging.getLogger("ray").setLevel(logging.ERROR)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def value_hash(df) -> str:
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for r in df.itertuples(index=False):
        rows.append("\x1f".join("NULL" if pd.isna(v) else repr(v) for v in r))
    rows.sort()
    return hashlib.sha1("\x1e".join(rows).encode()).hexdigest()


def norm_types(df):
    """Normalize representations so e.g. int32 vs int64 don't matter —
    mimic a value-level compare."""
    import numpy as np

    out = df.copy()
    for c in out.columns:
        if out[c].dtype.kind in "iu":
            out[c] = out[c].astype("int64")
        elif out[c].dtype.kind == "f":
            out[c] = out[c].astype("float64")
        elif str(out[c].dtype).startswith("datetime64"):
            out[c] = out[c].astype("datetime64[us]")
    return out


def main():
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            got = norm_types(to_pandas(fn(sf_dir)))
        except Exception as e:
            results[name] = f"RAY-ERROR {type(e).__name__}: {e}"
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            results[name] = f"rows-only rows={len(got)} ({dt:.1f}s)"
            continue
        try:
            want = norm_types(con.execute(oracles[name]).df())
        except Exception as e:
            results[name] = f"SQL-ERROR {type(e).__name__}: {e}"
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        if not problems and value_hash(got) != value_hash(want):
            problems.append("value-hash mismatch")
        results[name] = ("OK" if not problems else "FAIL " + "; ".join(problems)) \
            + f" rows={len(got)} ({dt:.1f}s)"

    width = max(len(n) for n in results)
    fails = 0
    for name, r in results.items():
        print(f"{name:<{width}}  {r}")
        if "OK" not in r and "rows-only" not in r:
            fails += 1
    print(f"\n{len(results)} queries, {fails} failing")
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
