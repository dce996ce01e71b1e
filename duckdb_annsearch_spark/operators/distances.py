"""``vector_distances`` — brute-force distance of one query against a table.

Parity with the reference in-out table function
(``/root/reference/src/ann_search.cpp:693-892``):

* input: any DataFrame; the vector column is auto-detected as the FIRST
  array column with a numeric element type (``ann_search.cpp:795-817``);
* metrics: ``l2`` (squared L2, default) and ``ip`` (negated dot product)
  (``ann_search.cpp:702-720``, metric parse at 784-790);
* output: all input columns + ``_distance FLOAT``;
* NULL vectors / wrong-dimension vectors are treated as the zero vector
  (the reference leaves the gather buffer zeroed — ``ann_search.cpp:860-865``)
  so their L2 distance is ``||q||^2`` and their IP distance is ``-0``.

Spark-first: a single ``withColumn`` with a codegen'd expression — no UDF, no
shuffle; at 100 TB this is a map-only stage that pipelines with the scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_annsearch_spark.functions.distance import metric_distance, vector_lit

_NUMERIC = (
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.IntegerType,
    T.LongType,
    T.ShortType,
    T.ByteType,
)


def detect_vector_column(df: DataFrame) -> str:
    """First array column with numeric element type, per the reference rule."""
    for field in df.schema.fields:
        if isinstance(field.dataType, T.ArrayType) and isinstance(
            field.dataType.elementType, _NUMERIC
        ):
            return field.name
    raise ValueError(
        "vector_distances: input table must have a numeric LIST or ARRAY column"
    )


def vector_distances(
    df: DataFrame,
    query: Sequence[float],
    metric: str = "l2",
    vector_col: str | None = None,
) -> DataFrame:
    """Append ``_distance FLOAT`` for ``query`` against every row of ``df``."""
    m = metric.lower()
    if m in ("ip", "inner_product"):
        m = "ip"
    else:
        m = "l2"  # the reference only honors IP; anything else means L2
    col = vector_col or detect_vector_column(df)
    dim = len(query)
    q = vector_lit(query)
    dist = metric_distance(F.col(col), q, m)
    # NULL / wrong-dim rows behave like the zero vector (see module docstring).
    zero_dist = float(sum(float(v) * float(v) for v in query)) if m == "l2" else -0.0
    guarded = (
        F.when(F.col(col).isNotNull() & (F.size(col) == dim), dist)
        .otherwise(F.lit(zero_dist))
        .cast("float")
    )
    return df.withColumn("_distance", guarded)
