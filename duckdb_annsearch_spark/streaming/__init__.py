"""Structured Streaming surface.

The reference's only "streaming" notions are the chunk-at-a-time in-out
table function (``ann_search_table``) and the two-pass out-of-core build
(SURVEY §2.4) — it has no watermarks/windows/stateful operators.  This
package is the engine's beyond-reference streaming story, built on
Structured Streaming:

* :func:`search.ann_search_stream` — continuous ANN search over an
  unbounded query stream (the streaming twin of ``ann_search_table``);
* :mod:`events` — watermarked windowed aggregation and session windows
  over event streams.
"""

from duckdb_annsearch_spark.streaming.dedup import (
    compact_seen,
    dedup_exact_stream,
    dedup_near_stream,
    near_dedup_increment,
    register_seen_buckets,
)
from duckdb_annsearch_spark.streaming.ingest import streaming_insert
from duckdb_annsearch_spark.streaming.events import (
    running_user_totals,
    sessionize_stream,
    windowed_event_counts,
)
from duckdb_annsearch_spark.streaming.search import ann_search_stream
from duckdb_annsearch_spark.streaming.sources import parse_vector_messages

__all__ = [
    "ann_search_stream",
    "parse_vector_messages",
    "windowed_event_counts",
    "sessionize_stream",
    "running_user_totals",
    "dedup_exact_stream",
    "dedup_near_stream",
    "near_dedup_increment",
    "register_seen_buckets",
    "compact_seen",
    "streaming_insert",
]
