"""End-to-end pipeline tests vs the reference-derived golden fixtures
(FIXTURES.md F1-F4; reference assertions tests/graph_loader.rs:100-647)."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from raygraph import synth
from raygraph.config import GraphBuildConfig
from raygraph.ops.spans import span_fingerprint
from raygraph.pipeline import build_graph

pytestmark = pytest.mark.usefixtures("ray_session")


def _write_corpus(tmp, table):
    d = os.path.join(tmp, "in")
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "docs.parquet"))
    return d


def _read(path):
    return pq.ParquetDataset(path).read()


def _triple_set(edges):
    return set(
        zip(
            [f.split("/", 1)[1] for f in edges.column("_from").to_pylist()],
            edges.column("pred").to_pylist(),
            [t.split("/", 1)[1] for t in edges.column("_to").to_pylist()],
        )
    )


@pytest.fixture(scope="module")
def line_result(tmp_path_factory, ray_session):
    tmp = str(tmp_path_factory.mktemp("kg_line"))
    corpus = synth.line_graph_documents()
    cfg = GraphBuildConfig(
        input_path=_write_corpus(tmp, corpus),
        output_path=os.path.join(tmp, "out"),
        num_partitions=4,
        linker_concurrency=(1, 2),
        sort_output=True,
    )
    res = build_graph(cfg, aliases=synth.alias_inventory(10))
    return corpus, res


def test_line_graph_precision_recall(line_result):
    """North rule: triple P/R >= 0.95 vs the reference fixture golden set."""
    _corpus, res = line_result
    got = _triple_set(_read(res.edges_path))
    gold = synth.line_graph_golden_triples()
    precision = len(got & gold) / len(got)
    recall = len(got & gold) / len(gold)
    assert precision >= 0.95 and recall >= 0.95


def test_line_graph_vertices(line_result):
    """Vertex identities mirror reference do_vertices assertions
    (tests/graph_loader.rs:238-247): _id = '<collection>/<key>'."""
    _corpus, res = line_result
    v = _read(res.vertices_path)
    assert v.num_rows == 10
    ids = v.column("_id").to_pylist()
    assert ids == [f"entities/vertex_{i}" for i in range(10)]
    assert set(v.column("@collection_name").to_pylist()) == {"entities"}
    assert v.column("_key").to_pylist() == [f"vertex_{i}" for i in range(10)]


def test_line_graph_edges(line_result):
    _corpus, res = line_result
    e = _read(res.edges_path)
    assert e.num_rows == 9
    assert set(e.column("@collection_name").to_pylist()) == {"relations"}
    # text span + media caption of the same doc dedup to ONE edge with
    # doc_count=1 (both mentions share the doc)
    assert set(e.column("doc_count").to_pylist()) == {1}
    froms = set(e.column("_from").to_pylist())
    assert froms == {f"entities/vertex_{i}" for i in range(9)}


def test_span_sequence_invariant(line_result):
    """Per-row span-sequence equality (kind, text, media_ref, order): the
    spans column survives the pipeline byte-identical (input_hint)."""
    corpus, res = line_result
    import ray.data as rd

    docs = rd.read_parquet(
        os.path.dirname(glob.glob(os.path.join(res.triples_path, "..", "..", "in", "*.parquet"))[0])
    )
    out_fp = {}
    for b in docs.map_batches(span_fingerprint, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        out_fp.update(zip(b.column("doc_id").to_pylist(), b.column("span_fp").to_pylist()))
    want = span_fingerprint(corpus)
    want_fp = dict(zip(want.column("doc_id").to_pylist(), want.column("span_fp").to_pylist()))
    assert out_fp == want_fp


def test_scaled_corpus_exact_graph(tmp_path):
    """Scaled corpus with alias variation + hub skew: the built edge set
    equals the generator's golden set exactly (P=R=1 by construction)."""
    n = 120
    cfg = GraphBuildConfig(
        input_path=_write_corpus(str(tmp_path), synth.corpus(n)),
        output_path=os.path.join(str(tmp_path), "out"),
        num_partitions=4,
        linker_concurrency=(1, 2),
    )
    res = build_graph(cfg, aliases=synth.alias_inventory(synth.entity_space(n)))
    got = _triple_set(_read(res.edges_path))
    assert got == synth.golden_edges(n)
    v = _read(res.vertices_path)
    assert set(v.column("_key").to_pylist()) == synth.golden_vertices(n)
    # hub entity exists and has the highest mention count
    counts = dict(zip(v.column("_key").to_pylist(), v.column("mention_count").to_pylist()))
    assert counts["vertex_0"] == max(counts.values())


def test_metrics_present(line_result):
    _corpus, res = line_result
    for k in ("phase_a_sec", "phase_b_sec", "triples_raw", "partitions",
              "entities_linked", "total_sec"):
        assert k in res.metrics


def test_agg_strategies_agree(tmp_path):
    """hash (bucketed), tree (combiner) and shuffle (sort-groupby)
    wide-step strategies produce identical graph tables."""
    n = 80
    in_dir = _write_corpus(str(tmp_path), synth.corpus(n))
    outs = {}
    for strat in ("hash", "tree", "shuffle"):
        cfg = GraphBuildConfig(
            input_path=in_dir,
            output_path=os.path.join(str(tmp_path), f"out_{strat}"),
            num_partitions=4,
            linker_concurrency=(1, 2),
            agg_strategy=strat,
        )
        res = build_graph(cfg, aliases=synth.alias_inventory(synth.entity_space(n)))
        v = _read(res.vertices_path).to_pandas().sort_values("_key").reset_index(drop=True)
        e = _read(res.edges_path).to_pandas().sort_values("_key").reset_index(drop=True)
        outs[strat] = (v, e)
    for other in ("tree", "shuffle"):
        for i in range(2):
            a, b = outs["hash"][i], outs[other][i]
            assert a.sort_index(axis=1).equals(b.sort_index(axis=1)), \
                f"{other} table {i} differs"


def test_agg_strategies_agree_on_zipf_corpus(tmp_path):
    """Salted ≡ unsalted under a HOT-ENTITY distribution: the per-batch
    partial aggregation (the salt inside agg_strategy='hash') must
    produce tables identical to the plain sort-shuffle groupby when one
    entity dominates the triple stream — canonicalization's named skew
    defense (SURVEY §4.2), pinned on a corpus where it actually binds."""
    n = 400
    table = synth.corpus_zipf(n, zipf_a=1.2)
    in_dir = _write_corpus(str(tmp_path), table)
    outs = {}
    for strat in ("hash", "shuffle"):
        cfg = GraphBuildConfig(
            input_path=in_dir,
            output_path=os.path.join(str(tmp_path), f"out_{strat}"),
            num_partitions=4,
            linker_concurrency=(1, 2),
            agg_strategy=strat,
        )
        res = build_graph(cfg, aliases=synth.alias_inventory(
            synth.entity_space(n)))
        v = _read(res.vertices_path).to_pandas() \
            .sort_values("_key").reset_index(drop=True).sort_index(axis=1)
        e = _read(res.edges_path).to_pandas() \
            .sort_values("_key").reset_index(drop=True).sort_index(axis=1)
        outs[strat] = (v, e)
    for i in range(2):
        assert outs["hash"][i].equals(outs["shuffle"][i])
    # the corpus is genuinely skewed: the hottest subject holds a
    # multiple of its fair share of the edges
    e = outs["hash"][1]
    top = e["_from"].value_counts()
    assert top.iloc[0] > 5 * len(e) / e["_from"].nunique()


def test_doc_count_exact_when_doc_straddles_blocks(ray_session):
    """A document's triples split across blocks must still yield
    doc_count=1 per edge (the exact 4-key dedup inside the reduce)."""
    import pyarrow as pa
    import ray.data as rd

    from raygraph.ops.materialize import build_edges

    def rows(block):
        return pa.table(
            {
                "doc_id": ["d1"] * len(block),
                "span_idx": pa.array(range(len(block)), pa.int32()),
                "subj": [b[0] for b in block],
                "pred": [b[1] for b in block],
                "obj": [b[2] for b in block],
                "subj_surface": [b[0] for b in block],
                "obj_surface": [b[2] for b in block],
                "conf": pa.array([0.9] * len(block), pa.float32()),
            }
        )

    # same (subj,pred,obj,doc) mention appears in TWO separate blocks
    ds = rd.from_arrow([rows([("a", "p", "b")]), rows([("a", "p", "b")])])
    for strat in ("hash", "tree", "shuffle"):
        out = build_edges(ds, None, "V", "E", strategy=strat).take_all()
        assert len(out) == 1, strat
        assert out[0]["doc_count"] == 1, strat


def test_rerun_without_resume_no_duplicates(tmp_path, ray_session):
    """Re-running a build into the same output_path with resume=False must
    clear the previous run's triples checkpoint — stale part_id dirs would
    inflate triples_raw and double mention counts on a later resume."""
    tmp = str(tmp_path)
    corpus = synth.line_graph_documents()
    cfg = GraphBuildConfig(
        input_path=_write_corpus(tmp, corpus),
        output_path=os.path.join(tmp, "out"),
        num_partitions=2,
        linker_concurrency=(1, 2),
        sort_output=True,
    )
    r1 = build_graph(cfg, aliases=synth.alias_inventory(10))
    v1 = _read(r1.vertices_path)
    r2 = build_graph(cfg, aliases=synth.alias_inventory(10))
    v2 = _read(r2.vertices_path)
    assert r1.metrics["triples_raw"] == r2.metrics["triples_raw"]
    assert v1.sort_by("_key").equals(v2.sort_by("_key"))
    # and a resume over the rerun output stays clean too
    import dataclasses

    r3 = build_graph(dataclasses.replace(cfg, resume=True),
                     aliases=synth.alias_inventory(10))
    assert r3.metrics["triples_raw"] == r1.metrics["triples_raw"]
    assert _read(r3.vertices_path).sort_by("_key").equals(v1.sort_by("_key"))


def test_canon_strategies_identical_output(tmp_path, ray_session):
    """Driver union-find + broadcast dict vs distributed label-prop +
    hash-partitioned resolve joins must produce byte-identical graph
    tables (VERDICT r1 #1: the distributed path is the 100 TB route and
    must not drift from the reference semantics)."""
    import dataclasses
    import hashlib

    tmp = str(tmp_path)
    corpus = synth.line_graph_documents()
    base = GraphBuildConfig(
        input_path=_write_corpus(tmp, corpus),
        output_path=os.path.join(tmp, "out_driver"),
        num_partitions=4,
        linker_concurrency=(1, 2),
        sort_output=True,
    )
    aliases = synth.alias_inventory(10)

    def digest(res):
        h = hashlib.sha1()
        for path in (res.vertices_path, res.edges_path):
            t = _read(path)
            t = t.select(sorted(t.schema.names))
            h.update(t.to_pandas().to_csv(index=False).encode())
        return h.hexdigest()

    d_driver = digest(build_graph(base, aliases=aliases))
    dist = dataclasses.replace(
        base,
        output_path=os.path.join(tmp, "out_dist"),
        canon_strategy="distributed",
    )
    d_dist = digest(build_graph(dist, aliases=aliases))
    assert d_driver == d_dist


def test_scaled_corpus_distributed_canon_exact(tmp_path, ray_session):
    """The distributed canonicalization path (label-prop + resolve joins)
    must reproduce the generator's golden graph exactly on the scaled
    corpus with alias variation + hub skew — not just on the tiny line
    fixture."""
    n = 120
    cfg = GraphBuildConfig(
        input_path=_write_corpus(str(tmp_path), synth.corpus(n)),
        output_path=os.path.join(str(tmp_path), "out"),
        num_partitions=4,
        linker_concurrency=(1, 2),
        canon_strategy="distributed",
    )
    res = build_graph(cfg, aliases=synth.alias_inventory(synth.entity_space(n)))
    assert _triple_set(_read(res.edges_path)) == synth.golden_edges(n)
    v = _read(res.vertices_path)
    assert set(v.column("_key").to_pylist()) == synth.golden_vertices(n)
    counts = dict(zip(v.column("_key").to_pylist(),
                      v.column("mention_count").to_pylist()))
    assert counts["vertex_0"] == max(counts.values())


def test_merge_delta_bit_identical_and_resumable(tmp_path, ray_session):
    """Incremental maintenance: building on a base corpus and merging the
    remaining documents as a delta epoch must reproduce the full build
    bit-for-bit (phase B is a pure multiset aggregation of the triple
    log), and a crashed merge must resume without duplicating triples."""
    import dataclasses
    import hashlib
    import json

    from raygraph.pipeline import merge_delta

    tmp = str(tmp_path)
    n = 120
    corpus = synth.corpus(n)
    aliases = synth.alias_inventory(synth.entity_space(n))
    half = corpus.num_rows // 2

    def write(name, table):
        d = os.path.join(tmp, name)
        os.makedirs(d, exist_ok=True)
        pq.write_table(table, os.path.join(d, "docs.parquet"))
        return d

    def digest(res):
        h = hashlib.sha1()
        for path in (res.vertices_path, res.edges_path):
            t = _read(path)
            t = t.select(sorted(t.schema.names))
            h.update(t.to_pandas().to_csv(index=False).encode())
        return h.hexdigest()

    full_cfg = GraphBuildConfig(
        input_path=write("full", corpus),
        output_path=os.path.join(tmp, "out_full"),
        num_partitions=4,
        linker_concurrency=(1, 2),
        sort_output=True,
    )
    d_full = digest(build_graph(full_cfg, aliases=aliases))

    base_cfg = dataclasses.replace(
        full_cfg,
        input_path=write("base", corpus.slice(0, half)),
        output_path=os.path.join(tmp, "out_inc"),
    )
    build_graph(base_cfg, aliases=aliases)
    delta_dir = write("delta", corpus.slice(half))
    res = merge_delta(base_cfg, delta_dir, aliases=aliases)
    assert digest(res) == d_full
    # delta landed as epoch 1: partitions 4..7 have manifests
    done = {int(json.load(open(f))["partition_id"])
            for f in __import__("glob").glob(
                os.path.join(res.triples_path, "_manifest", "part-*.json"))}
    assert done == set(range(8))

    # crash-resume: drop one DELTA manifest, re-enter with resume=True —
    # only that partition redoes, output still bit-identical
    os.remove(os.path.join(res.triples_path, "_manifest", "part-00006.json"))
    res2 = merge_delta(base_cfg, delta_dir, aliases=aliases, resume=True)
    assert res2.metrics["partitions_skipped"] == 7
    assert digest(res2) == d_full
    assert res2.metrics["triples_raw"] == res.metrics["triples_raw"]


def test_merge_delta_requires_base(tmp_path, ray_session):
    from raygraph.errors import CheckpointError
    from raygraph.pipeline import merge_delta

    cfg = GraphBuildConfig(
        input_path=str(tmp_path),
        output_path=os.path.join(str(tmp_path), "out"),
        num_partitions=4,
    )
    try:
        merge_delta(cfg, str(tmp_path))
        raise AssertionError("expected CheckpointError")
    except CheckpointError:
        pass


def test_graph_asof_reconstructs_history(tmp_path, ray_session):
    """Time travel over the append-only epoch layout: as-of epoch 0
    must equal the pre-merge base snapshot, as-of the latest epoch the
    current tables — recomputed from the triples checkpoint alone."""
    import dataclasses

    from raygraph.errors import InvalidParameterError
    from raygraph.pipeline import graph_asof, merge_delta

    tmp = str(tmp_path)
    n = 100
    corpus = synth.corpus(n)
    aliases = synth.alias_inventory(synth.entity_space(n))
    half = corpus.num_rows // 2

    def write(name, table):
        d = os.path.join(tmp, name)
        os.makedirs(d, exist_ok=True)
        pq.write_table(table, os.path.join(d, "docs.parquet"))
        return d

    cfg = GraphBuildConfig(
        input_path=write("base", corpus.slice(0, half)),
        output_path=os.path.join(tmp, "out"),
        num_partitions=4,
        linker_concurrency=(1, 2),
    )
    base = build_graph(cfg, aliases=aliases)
    base_edges = _read(base.edges_path).to_pandas() \
        .sort_values("_key", ignore_index=True)
    base_verts = _read(base.vertices_path).to_pandas() \
        .sort_values("_id", ignore_index=True)

    res = merge_delta(cfg, write("delta", corpus.slice(half)),
                      aliases=aliases)

    v0, e0 = graph_asof(cfg, epoch=0)
    got_e = e0.to_pandas().sort_values("_key", ignore_index=True)
    got_v = v0.to_pandas().sort_values("_id", ignore_index=True)
    assert got_e.equals(base_edges)
    assert got_v.equals(base_verts)

    v1, e1 = graph_asof(cfg, epoch=1)
    cur_e = _read(res.edges_path).to_pandas() \
        .sort_values("_key", ignore_index=True)
    assert e1.to_pandas().sort_values("_key", ignore_index=True) \
        .equals(cur_e)
    # epoch beyond history clamps to everything completed == latest
    _, e9 = graph_asof(cfg, epoch=9)
    assert e9.to_pandas().sort_values("_key", ignore_index=True) \
        .equals(cur_e)

    with pytest.raises(InvalidParameterError, match=">= 0"):
        graph_asof(cfg, epoch=-1)
    from raygraph.errors import CheckpointError

    empty = dataclasses.replace(cfg, output_path=os.path.join(tmp, "no"))
    with pytest.raises(CheckpointError):
        graph_asof(empty, epoch=0)


def test_alias_shards_byte_identical_output(tmp_path, ray_session):
    """Sharded alias index (SURVEY §7 M3, VERDICT r2 #1) vs the
    whole-index broadcast must produce byte-identical graph tables on
    the scaled corpus (alias variation + hub skew exercises the exact
    path hard; the fuzzy path is covered in test_link.py)."""
    import dataclasses
    import hashlib

    tmp = str(tmp_path)
    n = 120
    base = GraphBuildConfig(
        input_path=_write_corpus(tmp, synth.corpus(n)),
        output_path=os.path.join(tmp, "out_whole"),
        num_partitions=4,
        linker_concurrency=(1, 2),
        sort_output=True,
        alias_shards=1,
    )
    aliases = synth.alias_inventory(synth.entity_space(n))

    def digest(res):
        h = hashlib.sha1()
        for path in (res.vertices_path, res.edges_path):
            t = _read(path)
            t = t.select(sorted(t.schema.names))
            h.update(t.to_pandas().to_csv(index=False).encode())
        return h.hexdigest()

    d_whole = digest(build_graph(base, aliases=aliases))
    sharded = dataclasses.replace(
        base,
        output_path=os.path.join(tmp, "out_sharded"),
        alias_shards=6,
    )
    d_sharded = digest(build_graph(sharded, aliases=aliases))
    assert d_whole == d_sharded

def test_graph_forget_drops_deleted_provenance(tmp_path, ray_session):
    """Deletion propagation from the triple log: the rebuilt edge set
    equals the golden formula over SURVIVING docs exactly, and the
    broadcast-list and left_anti-Dataset paths agree bit-for-bit."""
    import pyarrow as pa
    import ray.data as rd

    from raygraph.errors import InvalidParameterError
    from raygraph.pipeline import graph_forget

    n = 120
    cfg = GraphBuildConfig(
        input_path=_write_corpus(str(tmp_path), synth.corpus(n)),
        output_path=os.path.join(str(tmp_path), "out"),
        num_partitions=4,
        linker_concurrency=(1, 2),
    )
    build_graph(cfg, aliases=synth.alias_inventory(synth.entity_space(n)))

    gone = [f"doc/{i}" for i in range(n) if i % 5 == 1]
    _, edges = graph_forget(cfg, deleted_doc_ids=gone)
    got = _triple_set(pa.Table.from_pandas(edges.to_pandas()))

    exp: set[tuple[str, str, str]] = set()
    for i in range(n):
        if i % 5 == 1:
            continue
        a, b = synth.edge_endpoints(i, n)
        exp.add((f"vertex_{a}", "connected_to", f"vertex_{b}"))
        if i % synth.IS_A_EVERY == 3:
            exp.add((f"vertex_{a}", "is_a", "node"))
    assert got == exp
    assert got < synth.golden_edges(n)  # something really got forgotten

    # Dataset (left_anti) path must agree exactly
    keys = rd.from_arrow(pa.table({"doc_id": pa.array(gone)}))
    _, edges2 = graph_forget(cfg, deletions=keys)
    got2 = _triple_set(pa.Table.from_pandas(edges2.to_pandas()))
    assert got2 == got

    # exactly one deletion source
    with pytest.raises(InvalidParameterError):
        graph_forget(cfg)
    with pytest.raises(InvalidParameterError):
        graph_forget(cfg, deleted_doc_ids=gone, deletions=keys)
