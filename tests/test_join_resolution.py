"""Join-based edge resolution (the scale path for giant inventories) and
JSONL ingestion parity."""

import json
import os

import pyarrow as pa
import pytest

from raygraph.ops.canon import resolve_keys_join

pytestmark = pytest.mark.usefixtures("ray_session")


def test_resolve_keys_join_matches_broadcast():
    import ray.data as rd

    linked = rd.from_arrow(
        pa.table(
            {
                "doc_id": ["d1", "d2", "d3"],
                "subj": ["k2", "k3", "k9"],
                "pred": ["p", "p", "p"],
                "obj": ["k1", "k2", "k9"],
                "conf": pa.array([0.9, 0.8, 0.7], pa.float32()),
            }
        )
    )
    canon = rd.from_items([{"key": "k2", "canon": "k1"},
                           {"key": "k1", "canon": "k1"}])
    out = resolve_keys_join(linked, canon, num_partitions=4)
    rows = {r["doc_id"]: (r["subj"], r["obj"]) for r in out.take_all()}
    assert rows == {
        "d1": ("k1", "k1"),     # k2 -> k1 via join, k1 mapped to itself
        "d2": ("k3", "k1"),     # k3 unmapped keeps identity
        "d3": ("k9", "k9"),     # fully unmapped row survives left-outer
    }
    # non-key columns survive
    assert {r["pred"] for r in out.take_all()} == {"p"}


def test_read_documents_jsonl(tmp_path):
    from raygraph.io import read_documents_jsonl
    from raygraph.ops.extract import extract_triples

    path = os.path.join(str(tmp_path), "docs.jsonl")
    with open(path, "w") as fh:
        for i in range(3):
            fh.write(json.dumps({
                "doc_id": f"doc/{i}",
                "spans": [{"kind": "text",
                           "text": f"vertex {i} is connected to vertex {i+1}.",
                           "media_ref": "", "offset": 0}],
            }) + "\n")
    ds = read_documents_jsonl(path)
    out = ds.map_batches(extract_triples, batch_format="pyarrow").take_all()
    assert len(out) == 3
    assert out[0]["pred"] == "connected_to"


def test_auto_join_strategy_and_equivalence(ray_session):
    import pandas as pd
    import ray.data as rd

    from raygraph.ops.relational import auto_join, shuffle_join

    big = rd.from_pandas(pd.DataFrame({"k": [i % 20 for i in range(500)],
                                       "v": range(500)}))
    small = rd.from_pandas(pd.DataFrame({"rk": range(20),
                                         "tag": [f"t{i}" for i
                                                 in range(20)]}))
    rep_b, rep_s = {}, {}
    jb = auto_join(big, small, on="k", right_on="rk",
                   report=rep_b).to_pandas()
    js = auto_join(big, small, on="k", right_on="rk",
                   broadcast_limit=1, report=rep_s).to_pandas()
    assert rep_b["strategy"] == "broadcast" and rep_b["right_rows"] == 20
    assert rep_s["strategy"] == "shuffle"
    key = ["k", "v"]
    a = jb.sort_values(key, ignore_index=True)
    b = js.sort_values(key, ignore_index=True)[a.columns]
    assert a.equals(b)
    ref = shuffle_join(big, small, on="k", right_on="rk").to_pandas() \
        .sort_values(key, ignore_index=True)[a.columns]
    assert a.equals(ref)
