"""Exporter parity tests — mirror the reference's integration-test
scenarios (/root/reference/tests/graph_loader.rs) on the same 10-vertex /
9-edge line-graph fixture."""

import threading

import pytest

from raygraph import synth
from raygraph.config import CollectionInfo, DataLoadConfig
from raygraph.errors import (
    CollectionNotFoundError,
    GraphNotFoundError,
    InvalidParameterError,
)
from raygraph.exporter import GraphLoader, load_custom_graph, load_named_graph

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def db_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("arangodb"))
    synth.write_fixture_db(d)
    return d


class Collector:
    """Thread-safe accumulator — the reference requires Send+Sync+Clone
    callbacks (src/graph_loader.rs:379-383); same discipline here."""

    def __init__(self):
        self.lock = threading.Lock()
        self.ids = []
        self.rows = []
        self.fields = None

    def vertex_cb(self, ids, rows, field_names):
        with self.lock:
            self.ids.extend(ids)
            self.rows.extend(rows)
            self.fields = field_names

    def edge_cb(self, from_ids, to_ids, rows, field_names):
        with self.lock:
            self.ids.extend(zip(from_ids, to_ids))
            self.rows.extend(rows)
            self.fields = field_names


def test_no_fields_empty_columns(db_dir):
    """tests/graph_loader.rs:192-256: no fields requested → 10 ids, zero
    payload columns."""
    loader = load_named_graph(db_dir, "IntegrationTestGraph")
    c = Collector()
    n = loader.do_vertices(c.vertex_cb)
    assert n == 10
    assert sorted(c.ids) == sorted(
        f"IntegrationTestVertex/{i}".encode() for i in range(10)
    )
    assert c.fields == []
    assert all(r == [] for r in c.rows)


def test_explicit_xyz_fields_vertices(db_dir):
    """tests/graph_loader.rs:264-338: fields [x,y,z] → exact values."""
    loader = load_named_graph(db_dir, "IntegrationTestGraph",
                              vertex_fields=("x", "y", "z"))
    c = Collector()
    loader.do_vertices(c.vertex_cb)
    assert c.fields == ["x", "y", "z"]
    by_id = dict(zip(c.ids, c.rows))
    for i in range(10):
        assert by_id[f"IntegrationTestVertex/{i}".encode()] == [i + 1, i + 2, i + 3]


def test_explicit_xyz_fields_edges(db_dir):
    """tests/graph_loader.rs:339-390: edge endpoints + x/y/z payload."""
    loader = load_named_graph(db_dir, "IntegrationTestGraph",
                              edge_fields=("x", "y", "z"))
    c = Collector()
    n = loader.do_edges(c.edge_cb)
    assert n == 9
    by_ends = dict(zip(c.ids, c.rows))
    for i in range(9):
        k = (f"IntegrationTestVertex/{i}".encode(),
             f"IntegrationTestVertex/{i + 1}".encode())
        assert by_ends[k] == [i + 1, i + 2, i + 3]


def test_collection_name_computed_field(db_dir):
    """tests/graph_loader.rs:392-496: @collection_name synthesized from
    _id for both vertices and edges."""
    loader = load_named_graph(
        db_dir, "IntegrationTestGraph",
        vertex_fields=("@collection_name",), edge_fields=("@collection_name",),
    )
    cv, ce = Collector(), Collector()
    loader.do_vertices(cv.vertex_cb)
    loader.do_edges(ce.edge_cb)
    assert cv.fields == ["@collection_name"]
    assert {r[0] for r in cv.rows} == {"IntegrationTestVertex"}
    assert {r[0] for r in ce.rows} == {"IntegrationTestEdge"}


def test_load_all_vertex_attributes(db_dir):
    """tests/graph_loader.rs:498-553: whole doc minus _id = 5 attrs
    (x, y, z, _key, _rev)."""
    loader = load_named_graph(
        db_dir, "IntegrationTestGraph",
        config=DataLoadConfig(load_all_vertex_attributes=True),
    )
    c = Collector()
    loader.do_vertices(c.vertex_cb)
    assert len(c.fields) == 5
    assert set(c.fields) == {"x", "y", "z", "_key", "_rev"}
    assert all(len(r) == 5 for r in c.rows)


def test_load_all_edge_attributes(db_dir):
    """tests/graph_loader.rs:555-647: whole doc minus _from/_to = 6 attrs
    (x, y, z, _id, _key, _rev)."""
    loader = load_named_graph(
        db_dir, "IntegrationTestGraph",
        config=DataLoadConfig(load_all_edge_attributes=True),
    )
    c = Collector()
    loader.do_edges(c.edge_cb)
    assert len(c.fields) == 6
    assert set(c.fields) == {"x", "y", "z", "_id", "_key", "_rev"}


def test_unknown_graph_errors(db_dir):
    """tests/graph_loader.rs:649-665."""
    with pytest.raises(GraphNotFoundError):
        load_named_graph(db_dir, "UnknownGraph")


def test_custom_loader(db_dir):
    """tests/graph_loader.rs:667-695: explicit collection lists."""
    loader = load_custom_graph(
        db_dir,
        [CollectionInfo("IntegrationTestVertex", ("x",))],
        [CollectionInfo("IntegrationTestEdge", ("y",))],
    )
    cv, ce = Collector(), Collector()
    assert loader.do_vertices(cv.vertex_cb) == 10
    assert loader.do_edges(ce.edge_cb) == 9
    assert cv.fields == ["x"] and ce.fields == ["y"]


def test_validation_matrix(db_dir):
    """tests/graph_loader.rs:697-788 + src/graph_loader.rs:253-271: the
    4-combination load_all × explicit-fields matrix."""
    v = [CollectionInfo("IntegrationTestVertex", ("x",))]
    e = [CollectionInfo("IntegrationTestEdge", ("x",))]
    v0 = [CollectionInfo("IntegrationTestVertex")]
    e0 = [CollectionInfo("IntegrationTestEdge")]
    # fields + load_all on matching side → error
    with pytest.raises(InvalidParameterError):
        GraphLoader.new_custom(db_dir, v, e0,
                               DataLoadConfig(load_all_vertex_attributes=True))
    with pytest.raises(InvalidParameterError):
        GraphLoader.new_custom(db_dir, v0, e,
                               DataLoadConfig(load_all_edge_attributes=True))
    # load_all on the OTHER side is fine
    GraphLoader.new_custom(db_dir, v, e0,
                           DataLoadConfig(load_all_edge_attributes=True))
    GraphLoader.new_custom(db_dir, v0, e,
                           DataLoadConfig(load_all_vertex_attributes=True))


def test_unknown_collection_errors_at_init(db_dir):
    """tests/graph_loader.rs:877-907 (cluster behavior: fail at init)."""
    with pytest.raises(CollectionNotFoundError):
        load_custom_graph(db_dir, [CollectionInfo("NoSuchCollection")], [])


def test_missing_field_yields_null(db_dir):
    """src/graph_loader.rs:459: absent field → null, in field-list order."""
    loader = load_custom_graph(
        db_dir, [CollectionInfo("IntegrationTestVertex", ("x", "nickname"))], []
    )
    c = Collector()
    loader.do_vertices(c.vertex_cb)
    assert c.fields == ["nickname", "x"]  # deterministic sorted union (A1)
    assert all(r[0] is None and isinstance(r[1], int) for r in c.rows)


def test_vertex_dataset_streaming(db_dir):
    """Ray-idiomatic surface: the export is a streaming Dataset."""
    loader = load_named_graph(db_dir, "IntegrationTestGraph",
                              vertex_fields=("x",))
    ds = loader.vertex_dataset()
    t = ds.take_all()
    assert len(t) == 10
    assert {r["_id"] for r in t} == {f"IntegrationTestVertex/{i}" for i in range(10)}
    assert sorted(r["x"] for r in t) == list(range(1, 11))


def test_edge_without_id_collection_name_sentinel(tmp_path):
    """Edges may lack _id (src/graph_loader.rs:710-715); @collection_name
    then yields the reference's literal sentinel (src/graph_loader.rs:55)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from raygraph.schemas import MISSING_ID_COLLECTION

    db = str(tmp_path)
    pq.write_table(
        pa.table({"_id": ["V/1"], "_key": ["1"]}),
        f"{db}/V.parquet",
    )
    pq.write_table(
        pa.table({"_from": ["V/1"], "_to": ["V/1"], "w": [3]}),
        f"{db}/E.parquet",
    )
    loader = load_custom_graph(
        db, [CollectionInfo("V")],
        [CollectionInfo("E", ("@collection_name", "w"))],
    )
    c = Collector()
    loader.do_edges(c.edge_cb)
    assert c.fields == ["@collection_name", "w"]
    assert c.rows == [[MISSING_ID_COLLECTION, 3]]


def test_collection_name_no_slash_parity(tmp_path):
    """collection_name_from_id parity (src/graph_loader.rs:51-56): an _id
    with no '/' yields "", NOT the whole id and NOT the missing-id
    sentinel (which is reserved for an absent _id)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from raygraph.schemas import MISSING_ID_COLLECTION, collection_of

    assert collection_of("noslash") == ""
    assert collection_of("a/b") == "a"
    assert collection_of("a/b/c") == "a"
    assert collection_of("") == ""
    assert collection_of(None) == MISSING_ID_COLLECTION

    db = str(tmp_path)
    pq.write_table(
        pa.table({"_id": ["V/1", "noslash"], "x": [1, 2]}),
        f"{db}/V.parquet",
    )
    loader = load_custom_graph(
        db, [CollectionInfo("V", ("@collection_name", "x"))], []
    )
    rows = {r["_id"]: r["@collection_name"]
            for r in loader.vertex_dataset().take_all()}
    assert rows == {"V/1": "V", "noslash": ""}


def test_heterogeneous_union_typed_null_fill(tmp_path):
    """A field present (non-string) in one collection and absent in a
    sibling must null-fill at the sibling's declared type so the union
    keeps one schema (the schemaless reference has no such constraint)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    db = str(tmp_path)
    pq.write_table(
        pa.table({"_id": ["A/1"], "w": pa.array([7], pa.int64())}),
        f"{db}/A.parquet",
    )
    pq.write_table(pa.table({"_id": ["B/1"]}), f"{db}/B.parquet")
    loader = load_custom_graph(
        db, [CollectionInfo("A", ("w",)), CollectionInfo("B", ("w",))], []
    )
    rows = {r["_id"]: r["w"] for r in loader.vertex_dataset().take_all()}
    assert rows == {"A/1": 7, "B/1": None}


def test_empty_collection_lists_error_on_load(db_dir):
    """tests/graph_loader.rs:790-875: init with empty collection lists
    succeeds; do_vertices/do_edges fail with the reference's literal
    messages."""
    from raygraph.errors import EmptyGraphError

    loader = load_custom_graph(db_dir, [], [])  # init OK
    with pytest.raises(EmptyGraphError, match="No vertex collections given!"):
        loader.do_vertices(lambda *a: None)
    with pytest.raises(EmptyGraphError, match="No edge collections given!"):
        loader.do_edges(lambda *a: None)


def test_empty_collection_streams_zero_rows(tmp_path):
    """An EXISTING collection with zero documents loads 0 rows without
    error (single-server AQL branch, tests/graph_loader.rs:833-839)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    db = str(tmp_path)
    pq.write_table(
        pa.table({"_id": pa.array([], pa.string()),
                  "x": pa.array([], pa.int64())}),
        f"{db}/V.parquet",
    )
    loader = load_custom_graph(db, [CollectionInfo("V", ("x",))], [])
    c = Collector()
    assert loader.do_vertices(c.vertex_cb) == 0
    assert c.ids == []


def test_unknown_collection_deferred_check(db_dir):
    """Single-server branch (tests/graph_loader.rs:877-907): with
    eager_collection_check=False init succeeds and the failure surfaces
    at load time."""
    loader = load_custom_graph(
        db_dir, [CollectionInfo("NoSuchCollection")], [],
        config=DataLoadConfig(eager_collection_check=False),
    )  # init OK — the cluster branch (default config) raises here instead
    with pytest.raises(CollectionNotFoundError):
        loader.do_vertices(lambda *a: None)


def test_callbacks_run_concurrently(db_dir):
    """Reference callbacks are invoked from `parallelism` threads
    concurrently (Send+Sync contract, src/graph_loader.rs:379-383):
    with parallelism=4 and small batches, more than one callback thread
    must be observed, and all rows must arrive exactly once."""
    import threading

    loader = load_named_graph(
        db_dir, "IntegrationTestGraph", vertex_fields=("x",),
        config=DataLoadConfig(parallelism=4, batch_size=2),
    )
    seen_threads = set()
    c = Collector()

    def cb(ids, rows, fields):
        import time

        seen_threads.add(threading.get_ident())
        # hold the thread so the pool must spawn siblings — without a
        # blocking callback all 5 tiny batches can land on one thread
        time.sleep(0.2)
        c.vertex_cb(ids, rows, fields)

    n = loader.do_vertices(cb)
    assert n == 10
    assert sorted(c.ids) == sorted(
        f"IntegrationTestVertex/{i}".encode() for i in range(10)
    )
    assert len(seen_threads) > 1


def test_heterogeneous_union_first_declarer_type_wins(tmp_path):
    """Same field, int64 in one collection, string in the other: the
    FIRST collection declaring the field wins the union type and the
    sibling's values cast to it (documented in exporter._project_batch
    / _union_field_types; VERDICT r2 next-round #8)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    db = str(tmp_path)
    pq.write_table(
        pa.table({"_id": ["A/1"], "w": pa.array([7], pa.int64())}),
        f"{db}/A.parquet",
    )
    pq.write_table(
        pa.table({"_id": ["B/1"], "w": pa.array(["5"], pa.string())}),
        f"{db}/B.parquet",
    )
    # A first: int64 wins, B's "5" casts to 5
    loader = load_custom_graph(
        db, [CollectionInfo("A", ("w",)), CollectionInfo("B", ("w",))], []
    )
    ds = loader.vertex_dataset()
    assert dict(zip(ds.schema().names, ds.schema().types))["w"] == pa.int64()
    rows = {r["_id"]: r["w"] for r in ds.take_all()}
    assert rows == {"A/1": 7, "B/1": 5}

    # B first: string wins, A's 7 casts to "7"
    loader = load_custom_graph(
        db, [CollectionInfo("B", ("w",)), CollectionInfo("A", ("w",))], []
    )
    ds = loader.vertex_dataset()
    assert dict(zip(ds.schema().names, ds.schema().types))["w"] == pa.string()
    rows = {r["_id"]: r["w"] for r in ds.take_all()}
    assert rows == {"A/1": "7", "B/1": "5"}


def test_heterogeneous_union_uncastable_raises(tmp_path):
    """A sibling value the winner type cannot represent fails LOUDLY
    (never a silent mixed-schema union)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    db = str(tmp_path)
    pq.write_table(
        pa.table({"_id": ["A/1"], "w": pa.array([7], pa.int64())}),
        f"{db}/A.parquet",
    )
    pq.write_table(
        pa.table({"_id": ["B/1"], "w": pa.array(["abc"], pa.string())}),
        f"{db}/B.parquet",
    )
    loader = load_custom_graph(
        db, [CollectionInfo("A", ("w",)), CollectionInfo("B", ("w",))], []
    )
    with pytest.raises(Exception, match="abc|convert|Cast|cast"):
        loader.vertex_dataset().take_all()
