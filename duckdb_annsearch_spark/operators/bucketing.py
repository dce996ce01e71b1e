"""Bucketed tables: co-located joins and aggregations without a shuffle.

At 100 TB the dominant cost of a fact-fact join (lineitem x orders,
events x sessions, chunks x embeddings) is the exchange of both sides on
the join key.  Bucketing pays that shuffle ONCE at write time: both
tables are hash-partitioned into the same number of buckets on the key
and each bucket is optionally sorted, so every later equi-join on that
key reads matching buckets pairwise — the executed plan has NO Exchange,
verified by ``tests/test_bucketing.py`` on the executed plan.  The
per-task Sort is also elided when buckets are written sorted AND
``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (Spark >= 3.0
drops scan output ordering by default, SPARK-28595; the one-file-per-
bucket write below is what makes enabling it safe).

The same write also accelerates ``groupBy(key)`` (no re-shuffle — the
data is already hash-distributed by key) and repeated self-joins.
Bucket count is a layout decision: pick ``buckets`` so one bucket of the
LARGER table fits an executor core's working set (128-256 MB compressed
is the usual target), and use the SAME count on every table that joins
on the key — mismatched counts fall back to a shuffle on one side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: str | list[str],
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and per-bucket sorted) table.

    ``table`` may be ``db.name``.  ``sort=True`` sorts each bucket by the
    bucket keys so sort-merge joins skip the per-task Sort as well — that
    elision requires ONE file per bucket (Spark re-sorts multi-file
    buckets), so the write first repartitions onto the bucket key with
    exactly ``buckets`` partitions (each write task then owns one whole
    bucket).  At very large scale drop ``sort`` if a single bucket exceeds
    a task's working set and let the join sort spill instead."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if buckets <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    if sort:
        df = df.repartition(buckets, *[df[k] for k in keys])
    w = df.write.format(fmt).mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def co_located_join(
    left: DataFrame, right: DataFrame, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Equi-join two same-bucketed tables.  This is a plain ``join`` — the
    co-location is a property of the inputs, not the operator — but going
    through this helper documents the intent and lets tests assert the
    exchange-free plan in one place."""
    return left.join(right, on=on, how=how)
