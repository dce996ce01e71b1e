"""Flat index + engine DDL lifecycle (FIXTURES F1/F6; reference
test/sql/faiss_basic.test, diskann_index.test, edge_cases.test)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_vectors_df

BASIS = [(1, [1, 0, 0]), (2, [0, 1, 0]), (3, [0, 0, 1])]


def _mk(engine, rows=BASIS, name="vectors"):
    df = make_vectors_df(engine.spark, rows)
    engine.register_table(name, df, row_id="id")
    return df


def test_flat_exact_search(engine):
    _mk(engine)
    engine.create_index("idx", "vectors", "embedding", engine="faiss", index_type="Flat")
    res = engine.ann_search("vectors", "idx", [1.0, 0.0, 0.0], k=2).collect()
    assert [r["id"] for r in res] == [1, 2]
    assert res[0]["_distance"] == 0.0
    assert res[1]["_distance"] == 2.0  # squared L2, diskann_basic.test:28-32


def test_k_greater_than_n(engine):
    _mk(engine, rows=[(1, [1, 0, 0]), (2, [0, 1, 0])])
    engine.create_index("idx", "vectors", engine="faiss", index_type="Flat")
    assert engine.ann_search("vectors", "idx", [1.0, 0.0, 0.0], k=100).count() == 2


def test_duplicate_vectors_all_returned(engine):
    rows = [(1, [1, 0, 0]), (2, [1, 0, 0]), (3, [1, 0, 0]), (4, [0, 1, 0])]
    _mk(engine, rows=rows)
    engine.create_index("idx", "vectors", engine="faiss", index_type="Flat")
    res = engine.ann_search("vectors", "idx", [1.0, 0.0, 0.0], k=3).collect()
    assert sorted(r["id"] for r in res) == [1, 2, 3]
    assert all(r["_distance"] == 0.0 for r in res)


def test_delete_tombstone_and_vacuum(engine):
    _mk(engine)
    engine.create_index("idx", "vectors", engine="faiss", index_type="Flat")
    engine.delete("vectors", [1])
    res = engine.ann_search("vectors", "idx", [1.0, 0.0, 0.0], k=1).collect()
    assert res[0]["id"] in (2, 3)  # nearest after delete
    info = engine.ann_index_info().collect()[0]
    assert info["num_deleted"] == 1
    engine.vacuum("idx")
    info = engine.ann_index_info().collect()[0]
    assert info["num_deleted"] == 0
    assert info["num_vectors"] == 2


def test_delete_all_returns_empty(engine):
    _mk(engine)
    engine.create_index("idx", "vectors", engine="faiss", index_type="Flat")
    engine.delete("vectors", [1, 2, 3])
    assert engine.ann_search("vectors", "idx", [1.0, 0.0, 0.0], k=5).count() == 0


def test_index_ddl_errors(engine):
    _mk(engine)
    engine.create_index("idx", "vectors", engine="faiss", index_type="Flat")
    with pytest.raises(ValueError, match="already exists"):
        engine.create_index("idx", "vectors", engine="faiss", index_type="Flat")
    engine.create_index("idx", "vectors", engine="faiss", index_type="Flat", if_not_exists=True)
    with pytest.raises(KeyError):
        engine.drop_index("nope")
    engine.drop_index("nope", if_exists=True)
    engine.drop_index("idx")
    assert engine.ann_list().count() == 0


def test_wrong_type_column_rejected(engine):
    df = engine.spark.createDataFrame([(1, "hello")], "id int, data string")
    engine.register_table("wrong_type", df, row_id="id")
    with pytest.raises(ValueError, match="FLOAT"):
        engine.create_index("idx", "wrong_type", "data", engine="diskann")


def test_ann_list_and_info(engine):
    _mk(engine)
    engine.create_index("idx_a", "vectors", engine="faiss", index_type="Flat")
    engine.create_index("idx_b", "vectors", engine="diskann")
    rows = engine.ann_list().collect()
    assert [(r["name"], r["engine"]) for r in rows] == [("idx_a", "faiss"), ("idx_b", "diskann")]
    info = {r["name"]: r for r in engine.ann_index_info().collect()}
    assert info["idx_a"]["num_vectors"] == 3
    assert not info["idx_a"]["quantized"]
    assert info["idx_a"]["size_bytes"] > 0
    assert info["idx_b"]["size_bytes"] > 0


def test_merge_indexes(engine):
    _mk(engine, rows=[(1, [1, 0, 0]), (2, [0, 1, 0])])
    df2 = make_vectors_df(engine.spark, [(10, [0, 0, 1]), (11, [0.5, 0.5, 0])])
    engine.register_table("extra", df2, row_id="id")
    engine.create_index("main", "vectors", engine="faiss", index_type="Flat")
    engine.create_index("other", "extra", engine="faiss", index_type="Flat")
    engine.merge_index("main", "other")
    assert engine.get_index("main").meta.num_vectors == 4


def test_oversample_emits_more_rows(engine):
    rows = [(i, [float(i), 0.0, 0.0]) for i in range(1, 9)]
    _mk(engine, rows=rows)
    engine.create_index("idx", "vectors", engine="faiss", index_type="Flat")
    # reference drains k*oversample results (src/ann_search.cpp:118-130)
    assert engine.ann_search("vectors", "idx", [0.0, 0.0, 0.0], k=2, oversample=3).count() == 6


def test_wrong_dim_query_returns_empty_via_search_table(engine):
    _mk(engine)
    engine.create_index("idx", "vectors", engine="faiss", index_type="Flat")
    qdf = make_vectors_df(engine.spark, [(1, [1.0, 0.0])], vec_col="q")
    out = engine.ann_search_table(qdf, "vectors", "idx", k=2)
    assert out.count() == 0


def test_faiss_factory_description_and_mode(engine):
    df = _mk(engine, name="fvecs")
    idx = engine.create_index(
        "fdesc", "fvecs", "embedding", engine="faiss",
        description="IVF2,Flat", nprobe=2, mode="auto",
    )
    assert idx.meta.index_type == "ivfflat"
    assert idx.meta.params["ivf_nlist"] == 2
    assert idx.meta.params["mode"] == "auto"
    got = engine.ann_search("fvecs", "fdesc", [1.0, 0.0, 0.0], k=1).collect()
    assert got[0]["id"] == 1

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown FAISS mode"):
        engine.create_index("bad", "fvecs", "embedding", engine="faiss", mode="tpu")
    # PQ<m> is now a supported composite (index/pq.py) — the parse succeeds
    # and validation moves to the dimension check; truly unknown composites
    # (LSH/refine/PCA chains) still reject at the parser — OPQ,IVF,PQ
    # parses as of round 5 and fails on the dimension check instead
    with _pytest.raises(ValueError, match="divisor of the vector dimension"):
        engine.create_index("bad2", "fvecs", "embedding", engine="faiss",
                            description="PQ16")
    with _pytest.raises(ValueError, match="divisor of the vector dimension"):
        engine.create_index("bad3", "fvecs", "embedding", engine="faiss",
                            description="OPQ16,IVF64,PQ16")
    with _pytest.raises(ValueError, match="unsupported FAISS factory"):
        engine.create_index("bad4", "fvecs", "embedding", engine="faiss",
                            description="IVF64,Refine(Flat)")
