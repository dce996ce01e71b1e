"""Continuous index ingest: a Structured Streaming sink that feeds
``AnnEngine.insert`` with periodic auto-vacuum compaction.

Beyond-reference (the reference has no streaming at all — its INSERT path
is ``BoundIndex::Append``, ``src/diskann_index.cpp:316-361``, driven by
batch DML); this is the natural continuous twin: every micro-batch lands
in the table and each index's delta (the brute-forced unindexed tail),
and when the accumulated tail crosses ``auto_vacuum_rows`` the indexes are
vacuumed — staged rebuild over live rows, atomic swap — so the tail stays
bounded under an unbounded ingest load.

Mechanics that matter:

* Micro-batch DataFrames are only valid inside ``foreachBatch``; the
  engine keeps LAZY references (``table.df`` union, delta reads), so each
  batch is first spooled to its own parquet dir and re-read — the engine
  only ever sees stable storage.
* Batch replay (restart from the checkpoint) is made idempotent with a
  per-batch marker file written AFTER the insert: a replayed batch whose
  marker exists is skipped.  A crash BETWEEN insert and marker can
  re-append one batch (at-least-once on that boundary — same contract as
  any foreachBatch sink without transactional state).
* Vacuum runs on the driver inside the batch callback: the stream simply
  sees one slow batch while compaction happens — no concurrent-rebuild
  races with the next batch's inserts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def streaming_insert(
    engine,
    table: str,
    stream: DataFrame,
    checkpoint_dir: str,
    auto_vacuum_rows: int | None = 100_000,
    trigger: dict | None = None,
    query_name: str | None = None,
):
    """Start a streaming query inserting ``stream`` (the table's schema)
    into ``table`` and every index on it.  Returns the StreamingQuery.

    ``auto_vacuum_rows``: vacuum all of the table's ANN indexes whenever
    at least this many rows have been inserted since the last compaction
    (None disables — the delta tail then grows until a manual vacuum).
    ``trigger``: kwargs for ``writeStream.trigger`` (e.g.
    ``{"availableNow": True}`` to drain-and-stop, or
    ``{"processingTime": "10 seconds"}``)."""
    if not stream.isStreaming:
        raise ValueError("streaming_insert expects a streaming DataFrame")
    engine.table(table)  # raise early on unknown table
    spool = os.path.join(engine.catalog.root, "_stream_spool", table)
    state = {"since_vacuum": 0}

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(spool, f"_done_{batch_id}")
        if os.path.exists(marker):
            return  # replayed batch, already applied
        bpath = os.path.join(spool, f"batch={batch_id}")
        batch_df.write.mode("overwrite").parquet(bpath)
        stable = engine.spark.read.parquet(bpath)
        n = stable.count()
        if n:
            engine.insert(table, stable)
            state["since_vacuum"] += n
        os.makedirs(spool, exist_ok=True)
        with open(marker, "w") as f:
            f.write(str(n))
        if auto_vacuum_rows and state["since_vacuum"] >= auto_vacuum_rows:
            for meta in list(engine.catalog.for_table(table)):
                if meta.engine != "fts":
                    engine.vacuum(meta.name)
            state["since_vacuum"] = 0

    writer = (
        stream.writeStream.foreachBatch(handle)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if query_name:
        writer = writer.queryName(query_name)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
