from duckdb_annsearch_spark.operators.distances import vector_distances
from duckdb_annsearch_spark.operators.topk import topk_brute_force

__all__ = ["vector_distances", "topk_brute_force"]
