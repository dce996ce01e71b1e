from duckdb_annsearch_spark.operators.distances import vector_distances
from duckdb_annsearch_spark.operators.topk import topk_brute_force
from duckdb_annsearch_spark.operators.bucketing import co_located_join, write_bucketed
from duckdb_annsearch_spark.operators.temporal import asof_join, range_join

__all__ = [
    "vector_distances",
    "topk_brute_force",
    "write_bucketed",
    "co_located_join",
    "asof_join",
    "range_join",
]
