"""Corpus vocabulary statistics: word/bigram frequency tables and top-N
vocabulary reports — the counting primitives behind tokenizer training
(BPE merge candidates are exactly the highest-count adjacent pairs) and
corpus audits (coverage curves, OOV-rate estimation).

No reference twin; standard practice.  Scale shape: every function is
ONE exploded groupBy with map-side partial aggregation (the gram rows
entering the shuffle are (hash-keyed) strings, count-compressed before
the exchange), plus — for the top-N report only — a
TakeOrderedAndProject of N rows and an N-row window.  Nothing
corpus-sized ever reaches the driver or a single task.

Cross-engine contract: words are the shared ``tokenize`` splits
(lowercase, non-alnum separators); ties in count break by word
ascending; ratios are double-divided then rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duckdb_annsearch_spark.operators.fts import tokenize
from duckdb_annsearch_spark.pipeline.text import bind


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, count)`` over the whole corpus — one partial-aggregating
    groupBy of the exploded token arrays.  NULL texts contribute
    nothing."""
    return (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def bigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(w1, w2, count)`` of adjacent token pairs — the BPE-style merge
    candidate table.  Pairs are built with one zip_with of the shifted
    token array (O(tokens) per row; the transform+element_at form would
    re-inline the tokenizer per position)."""
    # token array bound once (r9): the two slices otherwise re-split ~5x
    def _pairs(toks: Column) -> Column:
        n = F.size(toks)
        return F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )

    pairs = bind(tokenize(F.col(text_col)), _pairs)
    return (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("count"))
    )


def top_vocab(
    df: DataFrame, text_col: str = "text", top_n: int = 1000
) -> DataFrame:
    """The top-``top_n`` vocabulary report: ``(word, count, rank,
    cum_frac)`` where rank orders by count desc then word asc (total
    order — deterministic across runs/engines) and ``cum_frac`` is the
    running share of ALL corpus tokens covered through this rank (the
    coverage curve: 'the top 32k words cover 98.7% of tokens').

    The selection is orderBy().limit() — Spark plans
    TakeOrderedAndProject, per-partition top-N then a driver merge of
    N-row heaps, never a global sort.  The cumsum window then runs over
    the N selected rows only (bounded, documented single partition); the
    token total is one scalar aggregate broadcast-joined back."""
    # the counts table feeds both the scalar total and the top-N select —
    # pin it so the tokenize/explode/groupBy runs once (localCheckpoint,
    # not persist: blocks are reclaimed when the DataFrame is dropped)
    counts = word_counts(df, text_col).localCheckpoint(eager=False)
    total = counts.agg(F.sum("count").alias("__total"))
    top = counts.orderBy(F.col("count").desc(), F.col("word").asc()).limit(
        int(top_n)
    )
    # constant non-foldable partition key: these windows run over the
    # top_n-row report (bounded by construction), and the explicit
    # single-group spec keeps WindowExec from logging its all-data-to-one-
    # partition warning on every bench/audit run
    from duckdb_annsearch_spark.operators.hybrid import constant_partition_key

    one = constant_partition_key("count")
    w = (
        Window.partitionBy(one)
        .orderBy(F.col("count").desc(), F.col("word").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(
            Window.partitionBy(one).orderBy(
                F.col("count").desc(), F.col("word").asc()
            )
        ))
        .withColumn(
            "cum_frac",
            F.round(F.sum("count").over(w) / F.col("__total"), 6),
        )
        .select("word", "count", "rank", "cum_frac")
    )


def vocab_coverage(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    word_col: str = "word",
) -> DataFrame:
    """One-row report of how well a vocabulary covers a corpus:
    ``(n_tokens, n_in_vocab, oov_rate)``.  The vocabulary joins as a
    data-sized table (broadcast when small — Catalyst decides); tokens
    are counted per word first so the join is vocab-sized x
    distinct-words, not corpus-sized."""
    # three consumers (semi-join, total, in-vocab sum) — pin one run
    counts = word_counts(df, text_col).localCheckpoint(eager=False)
    marked = counts.join(
        vocab.select(F.col(word_col).alias("word")).distinct(),
        "word",
        "left_semi",
    )
    tot = counts.agg(
        F.coalesce(F.sum("count"), F.lit(0)).alias("n_tokens")
    )
    inv = marked.agg(F.coalesce(F.sum("count"), F.lit(0)).alias("n_in_vocab"))
    return (
        tot.crossJoin(inv)
        .withColumn(
            "oov_rate",
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    1.0 - F.col("n_in_vocab") / F.col("n_tokens"),
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
    )
