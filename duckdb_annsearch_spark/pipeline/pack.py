"""Sequence packing: map documents onto fixed-token training chunks.

The last stage of a training-data pipeline: tokenized documents are
concatenated in a deterministic order and cut into ``budget``-token
chunks (GPT-style "concat then chunk"), or greedily packed whole into
bins (no-split packing for losses that cannot cross document
boundaries).

``pack_chunks`` is exact and fully distributed: the only global state is
a prefix sum of token counts in the deterministic document order, built
with the classic two-phase distributed scan — per-range-partition window
cumsum plus a driver-side prefix of the P per-partition totals (P
values, never the data).  No single-partition window anywhere, so the
operator holds at any corpus size; the result is independent of the
actual partition boundaries (a prefix sum is associative), which is what
makes the range-partitioner's sampled, nondeterministic splits safe.

``pack_greedy`` (next-fit, whole documents) is inherently sequential per
stream — each bin decision depends on every prior one — so it runs as
one ``applyInPandas`` per stream: parallel across streams, linear within
one.  Shard streams (e.g. ``lang`` x hash prefix) to bound the
per-stream scan; the chunk form above is the one to reach for when
streams are huge.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from duckdb_annsearch_spark.pipeline.text import bpe_token_count

__all__ = ["pack_chunks", "pack_greedy", "chunk_documents"]


def _tokens_col(df: DataFrame, text_col: str, token_col: str | None) -> Column:
    """Non-negative token count; NULL text (or a NULL/negative count
    column) contributes 0 tokens — a NULL reaching the prefix sum would
    silently shift every later doc's chunk/bin assignment."""
    if token_col is not None:
        raw = F.col(token_col).cast("long")
    else:
        raw = bpe_token_count(F.col(text_col)).cast("long")
    return F.greatest(F.coalesce(raw, F.lit(0)), F.lit(0))


def pack_chunks(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Concatenate-and-chunk assignment: documents ordered by ``id_col``
    form one token stream cut every ``budget`` tokens.  Emits per doc:

    * ``n_tokens`` — the doc's token count (``token_col`` if given, else
      the BPE-piece proxy of ``text_col``);
    * ``chunk_id`` — chunk containing the doc's first token;
    * ``chunk_offset`` — position of that token within the chunk;
    * ``crosses_boundary`` — whether the doc spans into the next chunk(s)
      (its attention mask needs a document-boundary reset).

    Zero-token docs occupy no space and land at the current cursor.
    """
    if budget <= 0:
        raise ValueError(f"pack_chunks: budget must be positive, got {budget}")
    d = docs.select(
        F.col(id_col), _tokens_col(docs, text_col, token_col).alias("n_tokens")
    )
    if partitions is None:
        partitions = d.sparkSession.sparkContext.defaultParallelism
    # Phase 1: range-partition on the order key, windowed cumsum WITHIN
    # each physical partition only (bounded by the range splits).
    d = d.repartitionByRange(partitions, F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(F.col(id_col).asc())
    d = d.withColumn(
        "_local_cum", F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    # localCheckpoint pins the (nondeterministic) range split so phase 2's
    # totals and the final rows see the SAME partitioning.
    d = d.localCheckpoint(eager=False)
    # Phase 2: P per-partition totals -> driver prefix -> broadcast join.
    totals = (
        d.groupBy("_pid").agg(F.sum("n_tokens").alias("_t")).orderBy("_pid").collect()
    )
    prefix, acc = {}, 0
    for row in totals:
        prefix[row["_pid"]] = acc
        acc += row["_t"]
    spark = docs.sparkSession
    off = spark.createDataFrame(
        [(int(p), int(v)) for p, v in prefix.items()] or [(0, 0)],
        T.StructType(
            [
                T.StructField("_pid", T.IntegerType(), False),
                T.StructField("_off", T.LongType(), False),
            ]
        ),
    )
    d = d.join(F.broadcast(off), "_pid", "left").withColumn(
        "_start", F.coalesce(F.col("_off"), F.lit(0)) + F.col("_local_cum") - F.col("n_tokens")
    )
    bud = int(budget)
    d = d.withColumn(
        "_end", F.col("_start") + F.greatest(F.col("n_tokens") - 1, F.lit(0))
    )
    return d.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.expr(f"_start div {bud}").alias("chunk_id"),
        F.pmod(F.col("_start"), F.lit(bud)).cast("long").alias("chunk_offset"),
        (
            (F.col("n_tokens") > 0)
            & (F.expr(f"_end div {bud}") > F.expr(f"_start div {bud}"))
        ).alias("crosses_boundary"),
    )


def pack_greedy(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    stream_col: str | None = None,
) -> DataFrame:
    """Next-fit whole-document packing: walk each stream in ``id_col``
    order, appending to the current bin until the next doc would overflow
    ``budget``, then open a new bin.  Docs longer than ``budget`` get a
    bin of their own with ``oversize=true`` (never split, never dropped).

    Output: ``(stream, <id_col>, n_tokens, bin_id, bin_fill, oversize)``
    where ``bin_id`` numbers bins within the stream in visit order and
    ``bin_fill`` is the bin's running fill AFTER this doc.  The id column
    keeps its input name and type (string/UUID ids pack fine — they just
    define the visit order).

    Sequential per stream by construction (each decision depends on all
    prior ones); distributed across streams via ``applyInPandas``.
    """
    if budget <= 0:
        raise ValueError(f"pack_greedy: budget must be positive, got {budget}")
    d = docs.select(
        (F.col(stream_col).cast("string") if stream_col else F.lit("")).alias("stream"),
        F.col(id_col),
        _tokens_col(docs, text_col, token_col).alias("n_tokens"),
    )
    out_schema = T.StructType(
        [
            T.StructField("stream", T.StringType(), True),
            d.schema[id_col],
            T.StructField("n_tokens", T.LongType(), False),
            T.StructField("bin_id", T.LongType(), False),
            T.StructField("bin_fill", T.LongType(), False),
            T.StructField("oversize", T.BooleanType(), False),
        ]
    )
    bud = int(budget)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bins, fills, overs = [], [], []
        bin_id, fill = 0, 0
        started = False
        for nt in pdf["n_tokens"]:
            nt = int(nt)
            if started and fill + nt > bud:
                bin_id += 1
                fill = 0
            started = True
            fill += nt
            bins.append(bin_id)
            fills.append(fill)
            overs.append(nt > bud)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        pdf["oversize"] = pd.Series(overs, dtype="bool")
        return pdf

    return d.groupBy("stream").applyInPandas(_pack, schema=out_schema)


def chunk_documents(
    docs: DataFrame,
    window: int = 256,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunks per document — the RAG /
    embedding-prep stage (each chunk gets embedded; ``stride < window``
    overlaps neighbors so no answer span straddles a hard cut).

    Emits ``(id_col, chunk_idx, chunk_text, n_tokens)``: whitespace
    tokens, ORIGINAL bytes preserved (chunking must not normalize — the
    chunk is what gets embedded/served), last chunk short.  ``stride``
    defaults to ``window`` (disjoint).  NULL/empty/whitespace-only docs
    emit no chunks.  Entirely map-side: one ``transform`` + ``explode``,
    no shuffle anywhere.
    """
    if window <= 0:
        raise ValueError(f"chunk_documents: window must be positive, got {window}")
    stride = window if stride is None else int(stride)
    if not 0 < stride <= window:
        raise ValueError(
            f"chunk_documents: stride must be in (0, window], got {stride}"
        )
    # filter empties rather than trim+split: F.trim strips only ASCII
    # spaces, and split(limit=-1) keeps leading/trailing empty strings —
    # a doc ending in '\n' would otherwise count a phantom token and
    # spawn a spurious chunk
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    n_chunks = (
        F.ceil(F.greatest(n - window, F.lit(0)) / F.lit(float(stride))).cast("int") + 1
    )
    chunk = lambda i: F.struct(  # noqa: E731
        i.cast("long").alias("chunk_idx"),
        F.concat_ws(" ", F.slice(toks, i * stride + 1, F.lit(window))).alias(
            "chunk_text"
        ),
        F.least(F.lit(window), n - i * stride).cast("long").alias("n_tokens"),
    )
    return (
        docs.where(F.col(text_col).isNotNull() & (n > 0))
        .select(
            F.col(id_col),
            F.explode(F.transform(F.sequence(F.lit(0), n_chunks - 1), chunk)).alias(
                "_c"
            ),
        )
        .select(id_col, "_c.chunk_idx", "_c.chunk_text", "_c.n_tokens")
    )
