"""Bucketed co-located joins: the shuffle is paid once at write time and
the executed join plan carries NO Exchange (and no per-task Sort when the
buckets are written sorted)."""

import pytest
from pyspark.sql import functions as F

from duckdb_annsearch_spark.operators.bucketing import co_located_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_db(spark, sf_dir, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketed_wh")
    db = "bucketing_test"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, f"{db}.orders_b", "o_orderkey", 4)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        f"{db}.lineitem_b",
        "o_orderkey",
        4,
    )
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def _executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_db, sf_dir):
    db = bucketed_db
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(
            spark.table(f"{db}.orders_b"),
            spark.table(f"{db}.lineitem_b"),
            on="o_orderkey",
        ).select("o_orderkey", "o_totalprice", "l_quantity")
        plan = _executed(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # the whole point: co-located buckets read pairwise — no shuffle
        assert "Exchange" not in plan
        assert "SelectedBucketsCount: 4 out of 4" in plan
        # correctness: identical to the shuffle join over the raw parquet
        raw = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .join(
                spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
                    "l_orderkey", "o_orderkey"
                ),
                "o_orderkey",
            )
            .select("o_orderkey", "o_totalprice", "l_quantity")
        )
        assert joined.count() == raw.count()
        assert joined.exceptAll(raw).count() == 0 and raw.exceptAll(joined).count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_sorted_buckets_elide_the_join_sort(spark, bucketed_db):
    """Spark >= 3.0 drops bucketed-scan output ordering by default
    (SPARK-28595 — multi-file buckets can't guarantee it); write_bucketed
    writes ONE file per bucket precisely so the legacy conf can restore
    the fully sort-free merge join."""
    db = bucketed_db
    prev_b = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(conf, "true")
    try:
        joined = co_located_join(
            spark.table(f"{db}.orders_b"),
            spark.table(f"{db}.lineitem_b"),
            on="o_orderkey",
        ).select("o_orderkey", "l_quantity")
        plan = _executed(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert "Sort " not in plan  # sorted single-file buckets: no re-sort
    finally:
        spark.conf.set(conf, "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_b)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_db):
    db = bucketed_db
    agg = (
        spark.table(f"{db}.lineitem_b")
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = _executed(agg)
    assert "Exchange" not in plan  # already hash-distributed by the key
