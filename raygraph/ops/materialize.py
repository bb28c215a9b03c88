"""Graph materialization — vertices / edges tables with ArangoDB identities.

Reproduces the reference's output-side semantics on the tables we build:

* ``_id = "<collection>/<key>"`` minting (id format tests/graph_loader.rs:
  140-141; ``collection_name_from_id`` src/graph_loader.rs:51-56)
* ``_from`` / ``_to`` are vertex ``_id`` strings, mandatory
  (src/graph_loader.rs:675-703)
* exact edge dedup on (subj, pred, obj) — the analog of the smart-edge
  shard anti-join A4 (src/sharding.rs:329-341): hash-shuffle + per-group
  first.

Aggregation discipline (SURVEY.md §4.2): every groupby is preceded by
per-batch partial aggregation inside ``map_batches`` (the salt), so a hub
entity with 10^6 mentions ships ≤ #batches partial rows, not 10^6.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .link import normalize_surfaces

_SEP = "\x00"


def edge_key(subj: str, pred: str, obj: str) -> str:
    """Deterministic content-derived edge key (stable across runs and
    parallelism levels — SURVEY.md §7 hard part 3)."""
    return hashlib.sha1(f"{subj}{_SEP}{pred}{_SEP}{obj}".encode()).hexdigest()[:16]


def make_apply_canon(canon: dict[str, str]):
    """LINKED_TRIPLE batch transform replacing subj/obj with canonical keys.

    ``canon`` is the small side (entity inventory) — broadcast it with
    ``ray.put`` and resolve the ref in the caller; identity for unmapped
    keys.
    """

    def apply_canon(batch: pa.Table) -> pa.Table:
        subj = pd.Series(batch.column("subj").to_pylist())
        obj = pd.Series(batch.column("obj").to_pylist())
        subj = subj.map(canon).fillna(subj)
        obj = obj.map(canon).fillna(obj)
        return batch.set_column(
            batch.schema.get_field_index("subj"), "subj", pa.array(subj, pa.string())
        ).set_column(
            batch.schema.get_field_index("obj"), "obj", pa.array(obj, pa.string())
        )

    return apply_canon


# --------------------------------------------------------------------- edges
def edge_partials(batch: pa.Table) -> pa.Table:
    """Per-batch partial: dedup (subj, pred, obj, doc_id), max conf."""
    df = pd.DataFrame(
        {
            "subj": batch.column("subj").to_pylist(),
            "pred": batch.column("pred").to_pylist(),
            "obj": batch.column("obj").to_pylist(),
            "doc_id": batch.column("doc_id").to_pylist(),
            "conf": batch.column("conf").to_numpy(zero_copy_only=False),
        }
    )
    df = (
        df.groupby(["subj", "pred", "obj", "doc_id"], as_index=False)["conf"].max()
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def _edge_group(vertex_collection: str, edge_collection: str):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        s, p, o = g["subj"].iloc[0], g["pred"].iloc[0], g["obj"].iloc[0]
        return pd.DataFrame(
            {
                "_from": [f"{vertex_collection}/{s}"],
                "_to": [f"{vertex_collection}/{o}"],
                "_key": [edge_key(s, p, o)],
                "@collection_name": [edge_collection],
                "pred": [p],
                "conf": np.array([g["conf"].max()], dtype="float32"),
                "doc_count": [int(g["doc_id"].nunique())],
            }
        )

    return fn


def build_edges(linked, canon_fn, vertex_collection: str, edge_collection: str):
    """LINKED_TRIPLE Dataset → deduped edge Dataset (EDGE_SCHEMA).

    ``canon_fn`` is the batch transform from :func:`make_apply_canon`.
    Shuffle: one groupby on (subj, pred, obj) over per-batch partials.
    """
    return (
        linked.map_batches(canon_fn, batch_format="pyarrow")
        .map_batches(edge_partials, batch_format="pyarrow")
        .groupby(["subj", "pred", "obj"])
        .map_groups(_edge_group(vertex_collection, edge_collection),
                    batch_format="pandas")
    )


# ------------------------------------------------------------------- vertices
def vertex_partials(batch: pa.Table) -> pa.Table:
    """Per-batch partial: mention counts per (key, surface_norm)."""
    df = pd.DataFrame(
        {
            "key": list(batch.column("subj").to_pylist())
            + list(batch.column("obj").to_pylist()),
            "surface": list(batch.column("subj_surface").to_pylist())
            + list(batch.column("obj_surface").to_pylist()),
        }
    )
    df["surface"] = normalize_surfaces(df["surface"])
    out = df.groupby(["key", "surface"], as_index=False).size()
    out = out.rename(columns={"size": "n"})
    return pa.Table.from_pandas(out, preserve_index=False)


def _vertex_group(vertex_collection: str):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].iloc[0]
        per_surface = g.groupby("surface")["n"].sum()
        # most frequent surface; deterministic tie-break = lexicographic min
        top = per_surface.sort_index().idxmax()
        return pd.DataFrame(
            {
                "_id": [f"{vertex_collection}/{key}"],
                "_key": [key],
                "@collection_name": [vertex_collection],
                "name": [top],
                "mention_count": [int(g["n"].sum())],
            }
        )

    return fn


def build_vertices(linked, canon_fn, vertex_collection: str):
    """LINKED_TRIPLE Dataset → canonical vertex Dataset (VERTEX_SCHEMA).

    Shuffle: one groupby on the canonical key over per-batch partial
    counts (hub-safe: a hub entity contributes ≤ one partial row per batch
    per surface form).
    """
    return (
        linked.map_batches(canon_fn, batch_format="pyarrow")
        .map_batches(vertex_partials, batch_format="pyarrow")
        .groupby("key")
        .map_groups(_vertex_group(vertex_collection), batch_format="pandas")
    )
