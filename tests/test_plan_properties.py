"""Physical-plan property assertions for the hot paths: the things a 100 TB
deployment depends on — predicate pushdown reaching the parquet scan,
column pruning in ReadSchema, broadcast joins for k-row fetches, and no
Python evaluation in JVM-expressible pipelines.  These are the
``.explain``-level guarantees the operators were designed around; a
regression here (e.g. a refactor that slips a UDF into a scan path or
breaks pushdown) changes no answers at test scale and 10x the cost at
fleet scale."""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import make_vectors_df


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "documents.parquet")
    spark.createDataFrame(
        [(i, f"token{i % 7} text sample number {i}", i % 5) for i in range(200)],
        "doc_id long, text string, label int",
    ).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_filter_pushdown_reaches_scan(docs):
    plan = _plan(docs.where(F.col("label") == 3).select("doc_id"))
    assert "PushedFilters" in plan
    # the label predicate must reach the parquet reader, not sit in a
    # post-scan Filter only
    assert "EqualTo(label,3)" in plan.replace(" ", "")


def test_column_pruning_in_read_schema(docs):
    plan = _plan(docs.select("doc_id"))
    # ReadSchema must carry ONLY the projected column — a scan that reads
    # text for a doc_id projection is reading ~100x the bytes at corpus scale
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    assert m.group(1) == "doc_id:bigint", m.group(1)


def test_hygiene_pipeline_stays_jvm_side(docs):
    """PII scrub + repetition metrics are pure Column expressions: no
    BatchEvalPython / ArrowEvalPython / mapInPandas in the plan."""
    from duckdb_annsearch_spark.pipeline.quality import (
        dup_token_fraction,
        scrub_pii,
    )

    df = docs.select(
        "doc_id",
        scrub_pii(F.col("text")).alias("clean"),
        dup_token_fraction(F.col("text")).alias("dt"),
    )
    plan = _plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonMapInArrow", "MapInPandas"):
        assert marker not in plan, marker
    # (no WholeStageCodegen assertion: higher-order array lambdas —
    # filter/zip_with — are interpreted JVM expressions, outside codegen,
    # which is still a JVM-side vectorized scan + project, not Python)


def test_text_analysis_stays_jvm_side(docs):
    from duckdb_annsearch_spark.pipeline.text import (
        detect_language,
        doc_fingerprint,
        quality_score,
    )

    df = docs.select(
        "doc_id",
        detect_language(F.col("text")).alias("lang"),
        quality_score(F.col("text")).alias("q"),
        doc_fingerprint(F.col("text")).alias("fp"),
    )
    plan = _plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker


def test_ann_row_fetch_is_broadcast_join(engine):
    """ann_search's row fetch joins k hit rows against the base table —
    it must plan as a broadcast join (k rows vs the table), never a
    shuffle of the base table."""
    rng = np.random.RandomState(5)
    rows = [(i, rng.rand(4).astype(np.float32).tolist()) for i in range(80)]
    engine.register_table("pp", make_vectors_df(engine.spark, rows, dim=4), row_id="id")
    engine.create_index("pp_flat", "pp", engine="faiss", index_type="Flat")
    df = engine.ann_search("pp", "pp_flat", rows[0][1], k=5)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decontaminate_benchmark_side_broadcasts(spark, docs):
    from duckdb_annsearch_spark.pipeline.quality import decontaminate

    bench = docs.where(F.col("doc_id") < 5)
    plan = _plan(decontaminate(docs, bench, "doc_id", "text"))
    # the benchmark gram set must broadcast; the corpus side must not
    # shuffle into a sort-merge join
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan


def test_rerank_path_stays_broadcast_no_python(engine):
    """rerank=True adds one JVM metric_distance expression + a top-k sort
    over the broadcast row-fetch join: still a broadcast join (k*oversample
    rows vs the table), no SortMergeJoin, no Python evaluation."""
    rng = np.random.RandomState(6)
    rows = [(i, rng.rand(4).astype(np.float32).tolist()) for i in range(90)]
    engine.register_table("ppr", make_vectors_df(engine.spark, rows, dim=4), row_id="id")
    engine.create_index("ppr_pq", "ppr", engine="faiss", description="PQ4")
    df = engine.ann_search("ppr", "ppr_pq", rows[0][1], k=5, oversample=10, rerank=True)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, marker
    # the final top-k is a limit-sort (TakeOrderedAndProject), not a
    # global sort of the joined frame
    assert "TakeOrderedAndProject" in plan, plan


def test_quantized_probe_reads_only_codes(engine):
    """A quantized Flat probe's artifact scan must read (row_id, codes) —
    never the full-precision vector column (the 4-32x IO saving the codes
    exist for): column pruning asserted on the executed plan's ReadSchema."""
    rng = np.random.RandomState(8)
    rows = [(i, rng.rand(8).astype(np.float32).tolist()) for i in range(120)]
    engine.register_table("ppq", make_vectors_df(engine.spark, rows, dim=8), row_id="id")
    engine.create_index("ppq_sq4", "ppq", engine="faiss", description="SQ4")
    df = engine.ann_search("ppq", "ppq_sq4", rows[0][1], k=5, oversample=5, rerank=True)
    plan = _plan(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    probe = [s for s in schemas if "codes" in s]
    assert probe, schemas
    for s in probe:
        assert "vector" not in s and "embedding" not in s, s
