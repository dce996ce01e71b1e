"""Continuous ANN search over an unbounded query stream.

The reference's ``ann_search_table`` is an in-out operator driven chunk by
chunk (``/root/reference/src/ann_search.cpp:390-691``) — semantically a
stream.  Structured Streaming makes that literal: the same per-task probe
(``search_batch_df``'s ``mapInPandas``) runs on micro-batches of a
streaming DataFrame, and base-table columns attach via a stream-static
inner join.  Any source works (kafka/file/rate); results go to any sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ann_search_stream(
    engine,
    queries_stream: DataFrame,
    table: str,
    index: str,
    k: int,
    query_col: str,
    id_col: str,
    search_complexity: int | None = None,
) -> DataFrame:
    """Streaming twin of ``AnnEngine.ann_search_table``.

    ``queries_stream`` must be a streaming DataFrame carrying a unique
    ``id_col`` (streams have no ``monotonically_increasing_id``) and a
    ``query_col`` vector column.  Returns a streaming DataFrame of
    ``(id_col, base-table columns, _distance)``.
    """
    if not queries_stream.isStreaming:
        raise ValueError("queries_stream must be a streaming DataFrame")
    t = engine.table(table)
    idx = engine.get_index(index)
    if id_col in t.df.columns and id_col != t.row_id:
        raise ValueError(
            f"id_col {id_col!r} collides with a base-table column; rename one"
        )
    hits = idx.search_batch_df(
        queries_stream.select(
            F.col(id_col), F.col(query_col).cast("array<float>").alias("query")
        ),
        k,
        idx_col=id_col,
        search_complexity=search_complexity,
    ).select(
        # internal name so a base table carrying its own row_id column
        # (distinct from t.row_id) cannot become ambiguous after the join
        F.col(id_col),
        F.col("row_id").alias("__hit_row_id"),
        F.col("_distance").alias("__hit_distance"),
    )
    # stream-static inner join: each micro-batch's hits pick up base columns
    joined = hits.join(
        t.df.alias("__base"),
        F.col("__hit_row_id") == F.col(f"__base.{t.row_id}"),
        "inner",
    )
    cols = [c for c in t.df.columns if c != t.row_id]
    return joined.select(
        F.col(id_col),
        F.col("__hit_row_id").alias(t.row_id),
        *[F.col(f"__base.{c}") for c in cols],
        F.col("__hit_distance").alias("_distance"),
    )
