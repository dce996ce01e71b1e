"""duckdb_annsearch_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference DuckDB ANN-search extension
(decisiongraph/duckdb-annsearch), re-expressed Spark-first.

The reference is a single-node DuckDB extension (C++/Rust) registering DISKANN
and FAISS index types plus a family of k-NN table functions
(``/root/reference/src/ann_extension.cpp:17-64``).  This package provides the
same surface as a library over Spark DataFrames:

* distance functions   -> native Column expressions (``functions.distance``)
* vector_distances     -> DataFrame transform (``operators.distances``)
* ann_search / batch / table-in -> ``operators.search``
* hybrid_search (BM25 + RRF)    -> ``operators.hybrid``
* index lifecycle (create/drop/delete/vacuum/merge/list/info)
                       -> ``engine.AnnEngine`` + ``index/``
* LLM-data-pipeline extras (dedup, text analysis, multimodal) -> ``pipeline/``
"""

from duckdb_annsearch_spark.engine import AnnEngine
from duckdb_annsearch_spark.functions.distance import (
    array_cosine_similarity,
    array_distance,
    array_inner_product,
    list_cosine_similarity,
    list_distance,
    list_inner_product,
    metric_distance,
)
from duckdb_annsearch_spark.functions.sql import register_sql_functions
from duckdb_annsearch_spark.operators.knn import knn_join
from duckdb_annsearch_spark.pipeline.corpus import prepare_corpus
from duckdb_annsearch_spark.pipeline.dedup import dedup_fuzzy, duplicate_clusters

__all__ = [
    "AnnEngine",
    "array_distance",
    "list_distance",
    "array_inner_product",
    "list_inner_product",
    "array_cosine_similarity",
    "list_cosine_similarity",
    "metric_distance",
    "register_sql_functions",
    "knn_join",
    "prepare_corpus",
    "dedup_fuzzy",
    "duplicate_clusters",
]

__version__ = "0.1.0"
