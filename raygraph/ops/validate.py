"""Declarative data-validation (expectation) checks.

The ingestion gate of a 100 TB pipeline: a list of column rules is
evaluated in ONE streaming pass (plus one pair exchange per ``unique``
rule), emitting a per-rule violation count — the Great-Expectations
shape re-expressed as vectorized Ray Data partials. The reference's
per-record `_id`/`_from`/`_to` validation (src/graph_loader.rs:936-976,
M3/M4) is the fixed two-rule special case of this surface.

Rule objects are dicts:
    {"rule": "not_null",  "col": c}
    {"rule": "in_range",  "col": c, "lo": x, "hi": y}   (inclusive)
    {"rule": "matches",   "col": c, "pattern": regex}   (full match)
    {"rule": "in_set",    "col": c, "values": [...]}    (broadcast ref)
    {"rule": "unique",    "col": c}                      (global)
    {"rule": "ref",       "col": c, "ref": <parquet path>,
                          "ref_col": c2}                 (FK, shuffled)

Scale notes: every rule except ``unique`` folds to one int64 partial
per (batch, rule) — the exchange is |rules| rows per block. ``unique``
needs a global distinct: violations = n_rows − n_distinct, computed
with the pair-exchange discipline of ``relational.distinct_count``
(per-batch dedup first, so the shuffle carries ≤ distinct-per-batch
rows). ``in_set`` reference values ride the object store once
(``ray.put``), never per-batch closure shipping. ``ref`` is the
referential-integrity (foreign-key) check against ANOTHER TABLE:
per-batch distinct-value counts are the combiner, then one left_anti
shuffle join against the ref table's distinct keys — both sides
stream, so the ref table may be arbitrarily large (nulls count as
violations, matching ``in_set``; key types must be join-compatible).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..errors import InvalidParameterError

_KINDS = ("not_null", "in_range", "matches", "in_set", "unique",
          "ref")


def _rule_name(r: dict) -> str:
    return f"{r['rule']}:{r['col']}"


def check_rules(ds, rules: list[dict]):
    """Evaluate ``rules`` over ``ds``; returns a pandas DataFrame
    (rule, n_violations) sorted by rule — the aggregate-sized report.
    Unknown rule kinds or missing fields fail BEFORE any cluster
    work."""
    import ray

    from .relational import hash_aggregate, preagg_sum

    for i, r in enumerate(rules):
        if not isinstance(r, dict) or "rule" not in r or "col" not in r:
            raise InvalidParameterError(
                f"rule {i} must be a dict with 'rule' and 'col'")
        if r["rule"] not in _KINDS:
            raise InvalidParameterError(
                f"unknown rule {r['rule']!r}; known: {list(_KINDS)}")
        if r["rule"] == "in_range" and not {"lo", "hi"} <= r.keys():
            raise InvalidParameterError("in_range needs lo and hi")
        if r["rule"] == "matches" and "pattern" not in r:
            raise InvalidParameterError("matches needs pattern")
        if r["rule"] == "in_set" and "values" not in r:
            raise InvalidParameterError("in_set needs values")
        if r["rule"] == "ref" and not {"ref", "ref_col"} <= r.keys():
            raise InvalidParameterError("ref needs ref and ref_col")

    stream_rules = [r for r in rules
                    if r["rule"] not in ("unique", "ref")]
    unique_rules = [r for r in rules if r["rule"] == "unique"]
    ref_rules = [r for r in rules if r["rule"] == "ref"]
    set_refs = {
        _rule_name(r): ray.put(frozenset(r["values"]))
        for r in stream_rules if r["rule"] == "in_set"
    }
    patterns = {
        _rule_name(r): r["pattern"]
        for r in stream_rules if r["rule"] == "matches"
    }

    rows = []

    if stream_rules:
        def partial(batch: pa.Table) -> pa.Table:
            import ray as _ray

            out_names, out_counts = [], []
            df = None
            for r in stream_rules:
                name = _rule_name(r)
                if df is None:
                    df = batch.to_pandas()
                s = df[r["col"]]
                if r["rule"] == "not_null":
                    bad = int(s.isna().sum())
                elif r["rule"] == "in_range":
                    bad = int(((s < r["lo"]) | (s > r["hi"])
                               | s.isna()).sum())
                elif r["rule"] == "matches":
                    pat = re.compile(patterns[name])
                    bad = int((~s.fillna("").astype(str)
                               .str.fullmatch(pat).astype(bool)).sum())
                else:  # in_set
                    ref = _ray.get(set_refs[name])
                    bad = int((~s.isin(ref) | s.isna()).sum())
                out_names.append(name)
                out_counts.append(bad)
            return pa.table({
                "rule": pa.array(out_names, pa.string()),
                "n_violations": pa.array(out_counts, pa.int64()),
            })

        agg = preagg_sum(ds.map_batches(partial, batch_format="pyarrow"),
                         ["rule"], {"n_violations": "n_violations"}) \
            .to_pandas()
        rows.append(agg)

    if unique_rules:
        total = ds.count()
    for r in unique_rules:
        col = r["col"]

        def pairs(batch: pa.Table, _c=col) -> pa.Table:
            u = batch.to_pandas()[[_c]].drop_duplicates()
            return pa.table({"k": pa.array(u[_c].astype(str),
                                           pa.string())})

        distinct = hash_aggregate(
            ds.map_batches(pairs, batch_format="pyarrow"), ["k"],
            lambda df: df.drop_duplicates()).count()
        rows.append(pd.DataFrame({
            "rule": [_rule_name(r)],
            "n_violations": np.int64(total - distinct),
        }))

    for r in ref_rules:
        import ray.data as rd

        from .relational import cogroup_join

        col = r["col"]

        def nullcount(batch: pa.Table, _c=col) -> pa.Table:
            return pa.table({"n_null": pa.array(
                [int(batch.to_pandas()[_c].isna().sum())], pa.int64())})

        n_null = int(ds.map_batches(
            nullcount, batch_format="pyarrow").sum("n_null") or 0)

        def vcounts(batch: pa.Table, _c=col) -> pa.Table:
            s_ = batch.to_pandas()[_c].dropna()
            vt = batch.schema.field(_c).type
            if s_.empty:
                return pa.table({"v": pa.array([], vt),
                                 "n": pa.array([], pa.int64())})
            g = s_.value_counts()
            return pa.table({
                "v": pa.array(g.index, vt),
                "n": pa.array(g.to_numpy().astype("int64"),
                              pa.int64())})

        nonnull = preagg_sum(
            ds.map_batches(vcounts, batch_format="pyarrow"),
            ["v"], {"n": "n"})

        def ref_keys(batch: pa.Table) -> pa.Table:
            u = batch.to_pandas()[[r["ref_col"]]].drop_duplicates()
            return pa.table({"v": pa.array(u[r["ref_col"]])})

        refd = hash_aggregate(
            rd.read_parquet(r["ref"], columns=[r["ref_col"]])
            .map_batches(ref_keys, batch_format="pyarrow"),
            ["v"], lambda df: df.drop_duplicates())
        missing = cogroup_join(nonnull, refd, on="v", how="left_anti")
        n_missing = int(missing.sum("n") or 0)
        rows.append(pd.DataFrame({
            "rule": [_rule_name(r)],
            "n_violations": np.int64(n_missing + n_null)}))

    if not rows:
        return pd.DataFrame({"rule": pd.Series([], dtype=str),
                             "n_violations": pd.Series([],
                                                       dtype="int64")})
    out = pd.concat(rows, ignore_index=True)
    out["n_violations"] = out["n_violations"].astype("int64")
    return out.sort_values("rule", ignore_index=True)


def privacy_audit(ds, quasi_cols, k: int = 3, sensitive_col=None,
                  l: int = 2):
    """k-anonymity (+ optional l-diversity) audit — the privacy gate a
    training-data release needs (Sweeney 2002; Machanavajjhala 2007):
    a row is re-identifiable when its quasi-identifier combination is
    shared by fewer than ``k`` rows, and a group leaks its sensitive
    attribute when fewer than ``l`` distinct values appear in it.

    Returns a ONE-ROW summary table: k, l, n_rows, n_groups,
    n_risky_groups / n_risky_rows (size < k), and (with
    ``sensitive_col``) n_lowdiv_groups (distinct sensitive < l).

    Scale shape: group sizes via a quasi-keyed combiner preagg;
    diversity via the pair-exchange discipline of
    :func:`relational.distinct_count` (per-batch dedup first, the
    shuffle carries distinct (quasi, sensitive) pairs, never rows);
    one quasi-keyed join merges the two, then per-batch int64 partials
    fold to the single summary row — the group inventory itself never
    lands on the driver.
    """
    from .graph import _repaired
    from .relational import distinct_count, preagg_sum, shuffle_join

    if k < 1 or l < 1:
        raise InvalidParameterError("k and l must be >= 1")
    quasi_cols = list(quasi_cols)

    qtypes = dict(zip(ds.schema().names, ds.schema().types))
    qschema = [(c, qtypes[c]) for c in quasi_cols]

    sizes = _repaired(
        preagg_sum(ds.select_columns(quasi_cols), quasi_cols, {},
                   counts="n"),
        pa.schema(qschema + [("n", pa.int64())]))

    if sensitive_col is not None:
        ndiv = _repaired(
            distinct_count(ds, quasi_cols, sensitive_col, out="ndiv"),
            pa.schema(qschema + [("ndiv", pa.int64())]))
        ndiv = ndiv.rename_columns(
            {c: f"__r_{c}" for c in quasi_cols}).materialize()
        groups = _repaired(
            shuffle_join(sizes, ndiv, on=tuple(quasi_cols),
                         right_on=tuple(f"__r_{c}" for c in quasi_cols)),
            pa.schema(qschema + [("n", pa.int64()),
                                 ("ndiv", pa.int64())]))
    else:
        groups = sizes

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        risky = n < k
        row = {
            "n_rows": int(n.sum()),
            "n_groups": batch.num_rows,
            "n_risky_groups": int(risky.sum()),
            "n_risky_rows": int(n[risky].sum()),
        }
        if sensitive_col is not None:
            nd = batch.column("ndiv").to_numpy(zero_copy_only=False)
            row["n_lowdiv_groups"] = int((nd < l).sum())
        return pa.table({c: pa.array([v], pa.int64())
                         for c, v in row.items()})

    parts = groups.map_batches(partial, batch_format="pyarrow") \
        .to_pandas()
    cols = ["n_rows", "n_groups", "n_risky_groups", "n_risky_rows"]
    out = {"k": [k]}
    if sensitive_col is not None:
        out["l"] = [l]
        cols.append("n_lowdiv_groups")
    for c in cols:
        out[c] = [int(parts[c].sum())] if c in parts.columns else [0]
    return pa.table({c: pa.array(v, pa.int64())
                     for c, v in out.items()})
