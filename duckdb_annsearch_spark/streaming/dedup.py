"""Streaming deduplication for continuous ingestion pipelines.

The batch dedup operators (pipeline/dedup.py) assume a complete corpus;
ingestion pipelines see documents arrive continuously.  Structured
Streaming's stateful ``dropDuplicates`` gives exactly the right semantics:
the first document with a given content hash passes, later copies are
dropped, and the seen-hash state store is bounded by the watermark (copies
arriving later than the watermark delay may pass again — the standard
trade-off for bounded state)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 day",
) -> DataFrame:
    """Keep the first-seen document per exact content hash.

    With ``ts_col`` set, state is watermark-bounded
    (``dropDuplicatesWithinWatermark``); without it, state grows with the
    number of distinct documents (fine for bounded streams/backfills).
    Works on batch DataFrames too (plain dropDuplicates on the hash)."""
    hashed = docs.withColumn("__content_hash", F.md5(F.col(text_col)))
    if docs.isStreaming and ts_col is not None:
        out = hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["__content_hash"]
        )
    else:
        out = hashed.dropDuplicates(["__content_hash"])
    return out.drop("__content_hash")
