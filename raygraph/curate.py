"""Declarative curation pipelines over a document corpus.

A JSON spec — an ordered list of ``{"stage": name, ...params}`` steps —
compiles to ONE streaming Ray Data pipeline composed from the operator
library (text cleanup, PII scrub, quality/language/length screens,
exact and MinHash dedup) and lands as partitioned parquet plus a
machine-readable funnel report. This is the user surface a
training-data team drives: the reference's export loop fixes its
stages at compile time (/root/reference/src/graph_loader.rs load
pipeline); here the stage list is data.

Scale contract: every stage is either a vectorized row-preserving
``map_batches`` transform or a dataset-level dedup from
:mod:`raygraph.ops.dedup`; in ``stream`` mode nothing materializes
between read and write. ``funnel`` mode pins each stage boundary in
the object store to count survivors — the per-stage counts are the
only driver-side values, but the pin is corpus-sized; use it at audit
scale, stream mode at production scale.
"""

from __future__ import annotations

import json
import re

import pandas as pd
import pyarrow as pa

from . import stateio
from .errors import InvalidParameterError

_TAG = re.compile(r"</?[A-Za-z][^>]*>")
_WS = re.compile(r"\s+")


def _strip_markup(ds):
    def fn(batch: pa.Table) -> pa.Table:
        s = batch.column("text").to_pandas().fillna("")
        clean = s.str.replace(_TAG, "", regex=True)
        i = batch.schema.get_field_index("text")
        return batch.set_column(i, "text", pa.array(clean, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def _normalize(ds, form: str = "NFC"):
    def fn(batch: pa.Table) -> pa.Table:
        s = batch.column("text").to_pandas().fillna("")
        s = s.str.normalize(form).str.replace(_WS, " ", regex=True) \
            .str.strip()
        i = batch.schema.get_field_index("text")
        return batch.set_column(i, "text", pa.array(s, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def _pii_scrub(ds):
    from .ops.text import pii_scrub

    def fn(batch: pa.Table) -> pa.Table:
        clean = pii_scrub(batch).column("clean_text")
        i = batch.schema.get_field_index("text")
        return batch.set_column(i, "text", clean)

    return ds.map_batches(fn, batch_format="pyarrow")


def _length_filter(ds, min_chars: int = 0, max_chars: int | None = None):
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.utf8_length(batch.column("text"))
        mask = pc.greater_equal(n, pa.scalar(min_chars, n.type))
        if max_chars is not None:
            mask = pc.and_(mask, pc.less_equal(
                n, pa.scalar(max_chars, n.type)))
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def _quality_filter(ds, min_quality: float = 0.5):
    from .ops.text import quality_score

    def fn(batch: pa.Table) -> pa.Table:
        q = quality_score(batch).column("quality").to_pandas()
        return batch.filter(pa.array((q >= min_quality).to_numpy()))

    return ds.map_batches(fn, batch_format="pyarrow")


def _lang_filter(ds, langs):
    from .ops.text import lang_id

    keep = frozenset(langs)

    def fn(batch: pa.Table) -> pa.Table:
        pred = lang_id(batch).column("lang_pred").to_pandas()
        return batch.filter(pa.array(pred.isin(keep).to_numpy()))

    return ds.map_batches(fn, batch_format="pyarrow")


def _gopher_filter(ds):
    from .ops.text import gopher_flags

    def fn(batch: pa.Table) -> pa.Table:
        ok = gopher_flags(batch).column("pass_all").to_numpy(
            zero_copy_only=False)
        return batch.filter(pa.array(ok == 1))

    return ds.map_batches(fn, batch_format="pyarrow")


def _c4_filter(ds):
    from .ops.text import c4_flags

    def fn(batch: pa.Table) -> pa.Table:
        ok = c4_flags(batch).column("pass_all").to_numpy(
            zero_copy_only=False)
        return batch.filter(pa.array(ok == 1))

    return ds.map_batches(fn, batch_format="pyarrow")


def _exact_dedup(ds):
    from .ops.dedup import exact_dedup

    return exact_dedup(ds)


def _line_dedup(ds, min_df: int = 2, num_buckets: int = 64):
    """Cross-document boilerplate-line removal (CCNet): rewrite
    ``text`` with :func:`raygraph.ops.dedup.line_dedup`'s cleaned
    lines, preserving every other column via ONE doc-keyed co-group
    join (the dedup pass itself already exchanges the corpus once —
    this is the keep-the-schema tax, not a second algorithm)."""
    from .ops.dedup import line_dedup
    from .ops.relational import cogroup_join

    cleaned = line_dedup(ds, min_df=min_df, num_buckets=num_buckets)

    def ct(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("doc_id"),
                         "__clean": batch.column("clean_text")})

    joined = cogroup_join(
        ds, cleaned.map_batches(ct, batch_format="pyarrow"),
        on="doc_id", how="inner", num_buckets=num_buckets)

    def swap(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("text")
        return batch.set_column(
            i, "text", batch.column("__clean").cast(pa.string())) \
            .drop_columns(["__clean"])

    return joined.map_batches(swap, batch_format="pyarrow")


def _incremental_dedup(ds, index: str, near: bool = False,
                       threshold: float = 0.8, bands: int = 16,
                       shingle: str = "char"):
    """Dedup the stream against a PERSISTED index (and itself), then
    commit the survivors' hashes/bands as a new epoch — the curation
    spec form of the crawl-increment pattern. STATEFUL: each run of a
    spec containing this stage appends one epoch to ``index`` (that is
    the point — re-curating the same delta converges to zero new
    rows). Survivor ids semi-join the stream so every column
    survives."""
    from .ops.dedup import (exact_dedup_incremental,
                            minhash_dedup_incremental)
    from .ops.relational import cogroup_join

    if near:
        surv, _ = minhash_dedup_incremental(
            ds, index, threshold=threshold, bands=bands,
            shingle=shingle)
        return surv  # keeps all columns already
    surv, _ = exact_dedup_incremental(ds, index)
    if surv.count() == 0:
        return ds.limit(0)

    def ids(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id"])

    return cogroup_join(ds, surv.map_batches(ids,
                                             batch_format="pyarrow"),
                        on="doc_id", how="left_semi")


_incremental_dedup.stateful = True


def _minhash_dedup(ds, threshold: float = 0.8, num_perm: int = 64,
                   bands: int = 16, shingle: str = "char",
                   drop_strategy: str = "auto"):
    from .ops.dedup import minhash_dedup

    return minhash_dedup(ds, threshold=threshold, num_perm=num_perm,
                         bands=bands, shingle=shingle,
                         drop_strategy=drop_strategy)


def _sample(ds, keep_per_mille: int = 100, id_col: str = "doc_id"):
    from .ops.relational import deterministic_sample

    return deterministic_sample(ds, keep_per_mille, id_col=id_col)


def _cap_per_group(ds, group_col: str, cap: int, id_col: str = "doc_id"):
    """At most ``cap`` docs per ``group_col`` value, picked by the
    content-keyed md5 order (the rebalance-a-skewed-source primitive);
    one bucketed exact group-top-k, no per-group Python."""
    import hashlib

    from .ops.relational import group_topk

    def key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pandas().astype(str)
        k = ids.map(lambda s: int(
            hashlib.md5(s.encode()).hexdigest()[:15], 16))
        return batch.append_column(
            "_cap_key", pa.array(k.to_numpy(), pa.int64()))

    capped = group_topk(ds.map_batches(key, batch_format="pyarrow"),
                        [group_col], "_cap_key", cap, tie_col=id_col)
    return capped.drop_columns(["_cap_key"])


STAGES = {
    "strip_markup": _strip_markup,
    "normalize": _normalize,
    "pii_scrub": _pii_scrub,
    "length_filter": _length_filter,
    "quality_filter": _quality_filter,
    "gopher_filter": _gopher_filter,
    "c4_filter": _c4_filter,
    "lang_filter": _lang_filter,
    "exact_dedup": _exact_dedup,
    "incremental_dedup": _incremental_dedup,
    "line_dedup": _line_dedup,
    "minhash_dedup": _minhash_dedup,
    "sample": _sample,
    "cap_per_group": _cap_per_group,
}


def compile_spec(ds, spec: list[dict], validate_only: bool = False):
    """Fold a spec onto a Dataset, returning (stage_names, staged) where
    ``staged`` is the list of lazy Datasets AFTER each stage (the last
    one is the pipeline output). Raises InvalidParameterError for an
    unknown stage name or non-dict step — at compile time, before any
    cluster work runs.

    ``validate_only`` checks names and parameter signatures WITHOUT
    invoking stages — required for STATEFUL stages (incremental_dedup
    commits an index epoch when called; a validation pass must not)."""
    import inspect

    names, staged = [], []
    for i, step in enumerate(spec):
        if not isinstance(step, dict) or "stage" not in step:
            raise InvalidParameterError(
                f"spec step {i} must be an object with a 'stage' key")
        params = dict(step)
        name = params.pop("stage")
        if name not in STAGES:
            raise InvalidParameterError(
                f"unknown stage {name!r}; known: {sorted(STAGES)}")
        try:
            if validate_only and getattr(STAGES[name], "stateful",
                                         False):
                inspect.signature(STAGES[name]).bind(ds, **params)
            else:
                ds = STAGES[name](ds, **params)
        except TypeError as e:
            raise InvalidParameterError(
                f"bad params for stage {name!r}: {e}") from e
        names.append(name)
        staged.append(ds)
    return names, staged


# stages whose semantics span documents: per-shard execution would
# silently change results (a dup pair split across shards survives),
# so the partitioned runner rejects them — global dedup is its own
# pass (or the incremental_dedup index, which is stream-order exact)
CROSS_DOC_STAGES = frozenset({
    "exact_dedup", "line_dedup", "minhash_dedup", "incremental_dedup",
    "cap_per_group"})


def _unit_fingerprint(input_path: str, unit: list[str],
                      spec: list[dict]) -> tuple[str, str]:
    """(inputs_sha1, spec_sha1) — what a unit's manifest pins. Unit
    membership comes from a strided listing, so ANY change to the input
    file set (or the spec) reshuffles every unit; a resume that trusted
    bare manifests would silently mix stale outputs with fresh ones
    (files processed twice or skipped). Paths are recorded relative to
    ``input_path`` so moving the whole tree doesn't invalidate."""
    import hashlib

    rel = [stateio.relpath(f, input_path) for f in unit]
    inputs = hashlib.sha1(
        json.dumps(rel, sort_keys=True).encode()).hexdigest()
    spec_h = hashlib.sha1(
        json.dumps(spec, sort_keys=True, default=str).encode()
    ).hexdigest()
    return inputs, spec_h


def run_curation_partitioned(input_path: str, output_path: str,
                             spec: list[dict], partitions: int = 8,
                             resume: bool = False,
                             jobs: int = 1) -> dict:
    """Shard-parallel RESUMABLE curation for per-document specs: input
    files split into ``partitions`` units, each unit curated and
    written to ``docs/part-NNNNN/`` with a manifest committed AFTER the
    write — a crashed run leaves no manifest for the unfinished unit,
    and ``resume=True`` skips every manifested unit (the KG pipeline's
    checkpoint discipline applied to curation). Cross-document stages
    are REJECTED: per-shard dedup is not global dedup.

    Resume is INPUT-PINNED: each manifest records a sha1 of the unit's
    file list (relative paths) and of the spec; a manifested unit whose
    recorded inputs or spec differ from the current run is REDONE, not
    skipped — adding/removing input files reshuffles every strided
    unit, and a blind skip would mix stale outputs with fresh ones.

    ``jobs > 1`` overlaps that many units: each unit is still one
    whole-cluster Ray Data pipeline, but small units no longer
    serialize behind each other (driver-side thread pool; concurrent
    Dataset executions share the cluster via Ray's own scheduling).
    Manifests stay one-file-per-unit, so crash/resume semantics are
    unchanged. On a multi-node cluster the same effect can be had by
    submitting units as separate Ray jobs against one output dir.
    """
    from concurrent.futures import ThreadPoolExecutor

    import ray.data as rd

    cross = [s.get("stage") for s in spec if isinstance(s, dict)
             and s.get("stage") in CROSS_DOC_STAGES]
    if cross:
        raise InvalidParameterError(
            f"stages {cross} are cross-document; partitioned curation "
            "runs shards independently — run them as a separate global "
            "pass (or incremental_dedup against a shared index)")
    files = [f for f in stateio.glob(
        stateio.join(input_path, "**", "*"))
        if f.endswith(".parquet")]
    if not files:
        raise InvalidParameterError(f"no parquet under {input_path}")
    if partitions < 1:
        raise InvalidParameterError("partitions must be >= 1")
    if jobs < 1:
        raise InvalidParameterError("jobs must be >= 1")
    n_units = min(partitions, len(files))
    units = [files[i::n_units] for i in range(n_units)]
    # validate names/params before any cluster work
    compile_spec(rd.read_parquet(files[:1]), spec, validate_only=True)

    mdir = stateio.join(output_path, "_manifest")
    stateio.makedirs(mdir)
    report: dict = {"input": input_path, "output": output_path,
                    "mode": "partitioned", "partitions": n_units,
                    "units": [], "skipped": 0}

    def run_unit(i: int) -> dict:
        unit = units[i]
        inputs_h, spec_h = _unit_fingerprint(input_path, unit, spec)
        mpath = stateio.join(mdir, f"part-{i:05d}.json")
        part_dir = stateio.join(output_path, "docs",
                                f"part-{i:05d}")
        if resume and stateio.exists(mpath):
            m = stateio.read_json(mpath)
            if (m.get("inputs_sha1") == inputs_h
                    and m.get("spec_sha1") == spec_h):
                return {"part": i, "rows_out": m["rows_out"],
                        "skipped": True}
            # stale manifest (inputs or spec changed, or a pre-pinning
            # manifest with no fingerprint): fall through and redo
        stateio.rmtree(part_dir)  # crashed remnants
        stateio.makedirs(part_dir)
        src_ds = stateio.ray_read_parquet(unit)
        _, staged = compile_spec(src_ds, spec)
        out = staged[-1] if staged else src_ds
        stateio.ray_write_parquet(out, part_dir)
        rows = sum(stateio.pq_read_metadata(f).num_rows
                   for f in stateio.data_files(part_dir))
        stateio.write_json_atomic(
            mpath, {"part": i, "rows_out": rows,
                    "n_files": len(unit), "inputs_sha1": inputs_h,
                    "spec_sha1": spec_h})
        return {"part": i, "rows_out": rows}

    if jobs == 1:
        results = [run_unit(i) for i in range(n_units)]
    else:
        with ThreadPoolExecutor(max_workers=jobs) as pool:
            results = list(pool.map(run_unit, range(n_units)))
    report["units"] = results
    report["skipped"] = sum(1 for r in results if r.get("skipped"))
    report["rows_out"] = sum(r["rows_out"] for r in results)
    stateio.write_json_atomic(
        stateio.join(output_path, "_report.json"), report, indent=1)
    return report


def run_curation(input_path: str, output_path: str, spec: list[dict],
                 mode: str = "funnel") -> dict:
    """Execute a curation spec end-to-end: read the corpus, fold the
    stages, write survivors as partitioned parquet, and return (and
    persist as ``<output>/_report.json``) the funnel report.

    ``mode="funnel"`` materializes each stage boundary to count
    survivors per stage (audit scale); ``mode="stream"`` runs one
    fused streaming pass with only the final count (production scale).
    """
    from . import io as rio

    if mode not in ("funnel", "stream"):
        raise InvalidParameterError("mode must be funnel|stream")
    ds = rio.read_table(input_path)
    report: dict = {"input": input_path, "output": output_path,
                    "mode": mode, "stages": []}
    # validate the whole spec on a throwaway lazy handle first, so a
    # bad step fails before any cluster work runs (validate_only:
    # stateful stages must not commit an epoch during validation)
    compile_spec(ds, spec, validate_only=True)
    if mode == "funnel":
        report["rows_in"] = ds.count()
        for step in spec:
            params = dict(step)
            name = params.pop("stage")
            # chain on the MATERIALIZED handle — counting stage i must
            # not re-execute stages 1..i-1
            ds = STAGES[name](ds, **params).materialize()
            report["stages"].append({"stage": name,
                                     "rows_out": ds.count()})
    else:
        names, staged = compile_spec(ds, spec)
        report["stages"] = [{"stage": n} for n in names]
        ds = staged[-1] if staged else ds
    stateio.makedirs(output_path)
    docs_dir = stateio.join(output_path, "docs")
    # a fully-filtering spec writes ZERO rows — write_parquet then
    # creates no files at all; the empty docs dir must still exist and
    # the report read must not be attempted against it
    stateio.makedirs(docs_dir)
    stateio.ray_write_parquet(ds, docs_dir)
    has_files = bool(stateio.data_files(docs_dir))
    report["rows_out"] = stateio.ray_read_parquet(docs_dir).count() \
        if has_files else 0
    stateio.write_json_atomic(stateio.join(output_path, "_report.json"),
                              report, indent=1)
    return report
