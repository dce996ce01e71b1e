from duckdb_annsearch_spark.plans.rewrite import TopKMatch, match_topk_sql
from duckdb_annsearch_spark.plans.rewrite_df import match_topk_df

__all__ = ["TopKMatch", "match_topk_sql", "match_topk_df"]
