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
    hits = idx.search_batch_df(
        queries_stream.select(
            F.col(id_col), F.col(query_col).cast("array<float>").alias("query")
        ),
        k,
        idx_col=id_col,
        search_complexity=search_complexity,
    )
    # stream-static inner join: each micro-batch's hits pick up base columns
    base = t.df.withColumnRenamed(t.row_id, "row_id") if t.row_id != "row_id" else t.df
    joined = hits.join(base, on="row_id", how="inner")
    cols = [c for c in t.df.columns if c != t.row_id]
    return joined.select(
        F.col(id_col), F.col("row_id").alias(t.row_id), *cols, "_distance"
    )
