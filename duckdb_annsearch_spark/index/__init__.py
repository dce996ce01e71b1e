from duckdb_annsearch_spark.index.flat import FlatIndex
from duckdb_annsearch_spark.index.ivf import IvfFlatIndex
from duckdb_annsearch_spark.index.graph import GraphIndex

__all__ = ["FlatIndex", "IvfFlatIndex", "GraphIndex"]
