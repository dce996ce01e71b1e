"""Round-9 optimization internals: evaluate-once binding, scale-adaptive
fan-out, and off-driver training execution.

These guard the three mechanisms the r9 optimization round introduced;
the *results* of every affected operator are separately pinned by the
oracle selfcheck and the existing operator tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_bind_evaluates_once_and_matches_inline(spark):
    from duckdb_annsearch_spark.pipeline.text import bind

    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, None)], "id long, t string"
    )
    toks = F.split(F.col("t"), " ")
    inline = F.size(toks) + F.size(toks)
    bound = bind(toks, lambda ts: F.size(ts) + F.size(ts))
    rows = df.select(
        F.col("id"), inline.alias("a"), bound.alias("b")
    ).orderBy("id").collect()
    # NULL input: both forms NULL-propagate identically (size(NULL) is
    # NULL under Spark 4 defaults)
    assert [(r["a"], r["b"]) for r in rows] == [(6, 6), (2, 2), (None, None)]
    # the bound form carries ONE copy of the child expression; the inline
    # form duplicates it per reference (explicit aliases so the printed
    # plan doesn't repeat the expression in a generated alias name)
    def n_splits(col):
        plan = (
            df.select(col.alias("x"))
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        return plan.count("split(")

    assert n_splits(bound) == 1
    assert n_splits(inline) == 2


def test_fan_out_small_fires_only_below_core_count(spark):
    from duckdb_annsearch_spark.pipeline.fanout import fan_out_small

    cores = spark.sparkContext.defaultParallelism
    small = spark.createDataFrame(
        [(i,) for i in range(100)], "id long"
    ).coalesce(1)
    fanned = fan_out_small(small)
    assert fanned.rdd.getNumPartitions() == cores
    # rows unchanged (round-robin only relocates)
    assert sorted(r["id"] for r in fanned.collect()) == list(range(100))
    # already-parallel input is returned untouched (the 100 TB case)
    wide = small.repartition(cores)
    assert fan_out_small(wide) is wide


def test_run_remote_matches_local_training(spark):
    from duckdb_annsearch_spark.index.pq import train_pq
    from duckdb_annsearch_spark.index.remote import run_remote

    rng = np.random.RandomState(7)
    sample = rng.randn(256, 16).astype(np.float32)
    local = train_pq(sample, 4)
    remote = run_remote(spark, train_pq, sample, 4)
    # same function, same inputs, same libraries -> bit-identical books
    assert np.array_equal(local, remote)


def test_run_remote_propagates_errors(spark):
    from duckdb_annsearch_spark.index.pq import train_pq
    from duckdb_annsearch_spark.index.remote import run_remote

    with pytest.raises(Exception):
        run_remote(spark, train_pq, "not-an-array", 4)
