"""Incremental append (reference D3 ``BoundIndex::Append``): new rows land
in a delta parquet, search brute-forces the delta and merges, vacuum/merge
compact it away (src/diskann_index.cpp:316-385, faiss_basic.test:216-256)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_vectors_df

BASE = [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]), (3, [0.0, 0.0, 1.0])]
NEW = [(10, [0.9, 0.1, 0.0]), (11, [0.0, 0.9, 0.1])]


def _setup(engine, index_type="Flat", engine_name="faiss"):
    df = make_vectors_df(engine.spark, BASE, vec_col="embedding")
    engine.register_table("docs", df, row_id="id")
    kw = {"index_type": index_type} if engine_name == "faiss" else {}
    engine.create_index("idx", "docs", "embedding", engine=engine_name, **kw)
    return df


@pytest.mark.parametrize(
    "engine_name,index_type",
    [("faiss", "Flat"), ("faiss", "IVFFlat"), ("diskann", None)],
)
def test_insert_visible_in_search(engine, engine_name, index_type):
    _setup(engine, index_type or "Flat", engine_name)
    new = make_vectors_df(engine.spark, NEW, vec_col="embedding")
    engine.insert("docs", new)
    res = engine.ann_search("docs2" if False else "docs", "idx", [0.9, 0.1, 0.0], k=2)
    # the freshly-inserted vec 10 is the exact nearest neighbor
    rows = res.collect()
    assert rows[0]["id" if "id" in res.columns else "id"] == 10 or rows[0][0] == 10


def test_insert_then_search_table(engine):
    _setup(engine)
    engine.insert("docs", make_vectors_df(engine.spark, NEW, vec_col="embedding"))
    qdf = engine.spark.createDataFrame([(5, [0.9, 0.1, 0.0])], "qid int, v array<float>")
    res = engine.ann_search_table(qdf, "docs", "idx", k=1).collect()
    assert len(res) == 1 and res[0]["id"] == 10


def test_insert_then_delete_from_delta(engine):
    _setup(engine)
    engine.insert("docs", make_vectors_df(engine.spark, NEW, vec_col="embedding"))
    engine.delete("docs", [10])
    res = engine.index_scan("idx", [0.9, 0.1, 0.0], k=1).collect()
    assert res[0]["row_id"] == 1  # 10 tombstoned; nearest base row wins


def test_vacuum_folds_delta_in(engine):
    _setup(engine)
    engine.insert("docs", make_vectors_df(engine.spark, NEW, vec_col="embedding"))
    engine.vacuum("idx")
    idx = engine.get_index("idx")
    assert idx.meta.num_vectors == len(BASE) + len(NEW)
    assert engine.catalog.delta("idx") is None
    res = engine.index_scan("idx", [0.9, 0.1, 0.0], k=1).collect()
    assert res[0]["row_id"] == 10


def test_gpu_info_stub(engine):
    row = engine.faiss_gpu_info().collect()[0]
    assert row["available"] is False and row["device"].startswith("cpu[")
