"""Brute-force exact top-k — the FAISS ``Flat`` equivalent and the engine's
fallback when no index applies (reference optimizer cost gates,
``/root/reference/src/ann_optimizer.cpp:459-481``).

``ORDER BY dist LIMIT k`` lets Catalyst plan ``TakeOrderedAndProject``:
each partition computes its local top-k (a bounded heap, map-side), only
``k`` rows per partition reach the driver-side merge. At 100 TB this is a
scan + map + O(parts·k) merge — no full sort, no shuffle of the data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duckdb_annsearch_spark.functions.distance import metric_distance, vector_lit


def topk_brute_force(
    df: DataFrame,
    vector_col: str,
    query: Sequence[float],
    k: int,
    metric: str = "l2",
    tie_break: str | Column | None = None,
    precision: str = "f32",
) -> DataFrame:
    """All columns of ``df`` + ``_distance FLOAT``, k nearest, sorted ascending.

    ``tie_break``: optional column for deterministic ordering among equal
    distances (tests and oracle comparisons pass the id column).
    """
    q = vector_lit(query)
    dim = len(query)
    dist = metric_distance(F.col(vector_col), q, metric, precision).alias("_distance")
    scored = df.where(
        F.col(vector_col).isNotNull() & (F.size(F.col(vector_col)) == dim)
    ).withColumn("_distance", dist)
    order = [F.col("_distance").asc()]
    if tie_break is not None:
        order.append(F.col(tie_break).asc() if isinstance(tie_break, str) else tie_break)
    return scored.orderBy(*order).limit(k)
