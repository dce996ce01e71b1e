"""SQL-surface registration of the reference's six distance functions.

The reference exposes ``array_distance`` / ``list_distance`` /
``array_inner_product`` / ``list_inner_product`` /
``array_cosine_similarity`` / ``list_cosine_similarity`` as SQL scalars its
optimizer recognizes (``/root/reference/src/ann_optimizer.cpp:386-389``).
Spark 4 SQL scalar UDFs (``CREATE TEMPORARY FUNCTION ... RETURN expr``)
let us register the same names as pure SQL expressions — JVM-side,
codegen-friendly, no Python in the loop — with semantics identical to the
Column API in :mod:`duckdb_annsearch_spark.functions.distance` (f32
accumulation, true-L2 for ``array_distance``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_SQ_L2 = (
    "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), "
    "CAST(0.0 AS FLOAT), (acc, x) -> acc + x)"
)
_DOT = (
    "aggregate(zip_with(a, b, (x, y) -> x * y), "
    "CAST(0.0 AS FLOAT), (acc, x) -> acc + x)"
)
_NORM_A = (
    "sqrt(CAST(aggregate(transform(a, x -> x * x), "
    "CAST(0.0 AS FLOAT), (acc, x) -> acc + x) AS DOUBLE))"
)
_NORM_B = _NORM_A.replace("transform(a", "transform(b")

_DEFS = {
    "array_distance": f"CAST(sqrt(CAST({_SQ_L2} AS DOUBLE)) AS FLOAT)",
    "array_inner_product": _DOT,
    "array_cosine_similarity": (
        f"CAST(CAST({_DOT} AS DOUBLE) / ({_NORM_A} * {_NORM_B}) AS FLOAT)"
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Create the six temporary SQL functions; returns the names created.

    Usage (Spark disallows SQL UDFs directly inside ORDER BY — project the
    distance first, which is also the shape the reference's optimizer
    pattern-matches)::

        register_sql_functions(spark)
        spark.sql('''SELECT * FROM (
              SELECT *, array_distance(embedding,
                        CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS d FROM docs)
            ORDER BY d LIMIT 10''')
    """
    names = []
    for base, body in _DEFS.items():
        for name in (base, base.replace("array_", "list_")):
            spark.sql(
                f"CREATE OR REPLACE TEMPORARY FUNCTION {name}"
                f"(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS FLOAT RETURN {body}"
            )
            names.append(name)
    return names
