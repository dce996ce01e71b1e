"""Edge-case parity with the reference's ``test/sql/edge_cases.test``:
dim-1 vectors, duplicate vectors, k > N, missing index/table errors,
non-FLOAT[N] column rejection, multiple indexes on one column, the zero
vector, and DROP TABLE cascading to its indexes.
"""

import pytest

from tests.conftest import make_vectors_df


def test_dim1_vectors(engine):
    # edge_cases.test:10-41 — FLOAT[1] indexes, both engines
    rows = [(1, [1.0]), (2, [5.0]), (3, [3.0])]
    df = make_vectors_df(engine.spark, rows, dim=1, vec_col="val")
    engine.register_table("dim1", df, row_id="id")
    engine.create_index("dim1_idx", "dim1", "val", engine="diskann")
    got = [
        (r["row_id"], r["distance"])
        for r in engine.index_scan("dim1_idx", [2.0], 2)
        .orderBy("distance", "row_id")
        .collect()
    ]
    assert got == [(1, 1.0), (3, 1.0)]  # squared L2
    engine.drop_index("dim1_idx")
    engine.create_index("dim1_faiss", "dim1", "val", engine="faiss", index_type="Flat")
    got = engine.index_scan("dim1_faiss", [2.0], 1).collect()
    assert [(r["row_id"], r["distance"]) for r in got] == [(1, 1.0)]


def test_identical_vectors(engine):
    # edge_cases.test:43-87 — three duplicate rows all at distance 0
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),
        (3, [1.0, 0.0, 0.0]),
        (4, [0.0, 1.0, 0.0]),
    ]
    df = make_vectors_df(engine.spark, rows)
    engine.register_table("dupes", df, row_id="id")
    for name, kw in [
        ("dupes_idx", dict(engine="diskann")),
        ("dupes_faiss", dict(engine="faiss", index_type="Flat")),
    ]:
        engine.create_index(name, "dupes", "embedding", **kw)
        hits = engine.index_scan(name, [1.0, 0.0, 0.0], 4).where("distance < 0.01")
        assert hits.count() == 3
        engine.drop_index(name)


def test_k_greater_than_n(engine):
    # edge_cases.test:89-106 — k=100 over 2 vectors returns all available
    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])]
    df = make_vectors_df(engine.spark, rows)
    engine.register_table("small", df, row_id="id")
    engine.create_index("small_idx", "small", "embedding", engine="faiss", index_type="Flat")
    assert engine.index_scan("small_idx", [1.0, 0.0, 0.0], 100).count() == 2


def test_missing_index_and_table_errors(engine):
    # edge_cases.test:108-140
    rows = [(1, [1.0, 0.0, 0.0])]
    df = make_vectors_df(engine.spark, rows)
    engine.register_table("err_t", df, row_id="id")
    engine.create_index("err_idx", "err_t", "embedding", engine="faiss", index_type="Flat")
    with pytest.raises(KeyError, match="not"):
        engine.index_scan("nonexistent", [1.0, 0.0, 0.0], 1)
    with pytest.raises(KeyError, match="not"):
        engine.ann_search("err_t", "nonexistent", [1.0, 0.0, 0.0], 1)
    with pytest.raises(KeyError, match="not registered"):
        engine.ann_search("no_such_table", "err_idx", [1.0, 0.0, 0.0], 1)


def test_non_float_array_column_rejected(engine):
    # edge_cases.test:142-160 — "must be FLOAT[N]"
    df = engine.spark.createDataFrame([(1, "hello")], "id int, data string")
    engine.register_table("wrong_type", df, row_id="id")
    for eng in ("diskann", "faiss"):
        with pytest.raises(ValueError, match="FLOAT\\[N\\]"):
            engine.create_index(f"bad_{eng}", "wrong_type", "data", engine=eng)


def test_multiple_indexes_same_column(engine):
    # edge_cases.test:180-238 — DISKANN + FAISS coexist, agree on the NN
    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]), (3, [0.0, 0.0, 1.0])]
    df = make_vectors_df(engine.spark, rows)
    engine.register_table("multi", df, row_id="id")
    engine.create_index("multi_diskann", "multi", "embedding", engine="diskann")
    engine.create_index("multi_faiss", "multi", "embedding", engine="faiss", index_type="Flat")
    assert engine.ann_list().count() == 2
    for idx in ("multi_diskann", "multi_faiss"):
        got = [(r["id"], r["_distance"]) for r in
               engine.ann_search("multi", idx, [1.0, 0.0, 0.0], 1).collect()]
        assert got == [(1, 0.0)]
    engine.drop_index("multi_diskann")
    engine.drop_index("multi_faiss")
    assert engine.ann_list().count() == 0


def test_zero_vector(engine):
    # edge_cases.test:240-262
    rows = [(1, [0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0])]
    df = make_vectors_df(engine.spark, rows)
    engine.register_table("zeros", df, row_id="id")
    engine.create_index("zeros_idx", "zeros", "embedding", engine="faiss", index_type="Flat")
    got = [(r["row_id"], r["distance"]) for r in
           engine.index_scan("zeros_idx", [0.0, 0.0, 0.0], 1).collect()]
    assert got == [(1, 0.0)]


def test_drop_table_cascades_to_indexes(engine):
    # edge_cases.test:264-285 — DROP TABLE removes its indexes from the catalog
    rows = [(1, [1.0, 0.0, 0.0])]
    df = make_vectors_df(engine.spark, rows)
    engine.register_table("drop_test", df, row_id="id")
    engine.create_index("drop_diskann", "drop_test", "embedding", engine="diskann")
    engine.create_index("drop_faiss", "drop_test", "embedding", engine="faiss", index_type="Flat")
    assert engine.ann_list().count() == 2
    engine.unregister_table("drop_test")
    assert engine.ann_list().count() == 0
    with pytest.raises(KeyError):
        engine.table("drop_test")
