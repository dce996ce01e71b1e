from duckdb_annsearch_spark.plans.rewrite import TopKMatch, match_topk_sql

__all__ = ["TopKMatch", "match_topk_sql"]
