"""Regression: every driver-side createDataFrame must carry plain-Python
values. A session WITHOUT ``spark.sql.execution.arrow.pyspark.enabled``
routes createDataFrame through the row-at-a-time type verifier, which
rejects numpy scalars (np.float32 inside array columns) — the round-1
driver ran such a session and all 9 index-backed CORRECTNESS rows erred.

These tests pin Arrow OFF around the paths that build driver-side frames
(streaming_build pilot, graph search_batch) so the failure mode reproduces
locally even though AnnEngine now sets the Arrow conf defensively.
"""

import contextlib

import pytest
from pyspark.sql import functions as F

ARROW_CONF = "spark.sql.execution.arrow.pyspark.enabled"


@contextlib.contextmanager
def arrow_off(spark):
    prev = spark.conf.get(ARROW_CONF, "false")
    spark.conf.set(ARROW_CONF, "false")
    try:
        yield
    finally:
        spark.conf.set(ARROW_CONF, prev)


@pytest.fixture(scope="module")
def vec_df(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(300)]
    return spark.createDataFrame(rows, "row_id long, vector array<float>")


def test_streaming_build_and_graph_search_arrowless(engine, vec_df):
    engine.register_table("t_arrowless", vec_df, row_id="row_id")
    with arrow_off(engine.spark):
        engine.streaming_build(
            "g_arrowless", "t_arrowless", "vector", partition_rows=64
        )
        hits = engine.ann_search(
            "t_arrowless", "g_arrowless", [0.0] * 8, k=5
        ).collect()
    assert len(hits) == 5
    batch = engine.get_index("g_arrowless").search_batch(
        [[0.0] * 8, [0.5] * 8], 3
    )
    with arrow_off(engine.spark):
        rows = batch.collect()
    assert {r["query_idx"] for r in rows} == {0, 1}


def test_flat_and_ivf_search_arrowless(engine, vec_df):
    engine.register_table("t_arrowless2", vec_df, row_id="row_id")
    engine.create_index(
        "f_arrowless", "t_arrowless2", "vector", engine="faiss", index_type="Flat"
    )
    engine.create_index(
        "i_arrowless", "t_arrowless2", "vector", engine="faiss",
        index_type="IVFFlat", ivf_nlist=4, nprobe=4,
    )
    with arrow_off(engine.spark):
        assert len(engine.ann_search("t_arrowless2", "f_arrowless", [0.1] * 8, k=4).collect()) == 4
        assert len(engine.ann_search("t_arrowless2", "i_arrowless", [0.1] * 8, k=4).collect()) == 4
        batch = engine.ann_search_batch(
            "t_arrowless2", "f_arrowless", [[0.1] * 8, [0.9] * 8], k=2
        ).collect()
    assert len(batch) == 4
