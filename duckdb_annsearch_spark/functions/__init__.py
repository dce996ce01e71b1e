from duckdb_annsearch_spark.functions.distance import (
    array_cosine_similarity,
    array_distance,
    array_inner_product,
    list_cosine_similarity,
    list_distance,
    list_inner_product,
    metric_distance,
    vector_lit,
)

__all__ = [
    "array_distance",
    "list_distance",
    "array_inner_product",
    "list_inner_product",
    "array_cosine_similarity",
    "list_cosine_similarity",
    "metric_distance",
    "vector_lit",
]
