"""n-gram language-model scoring: perplexity-style document quality.

CCNet-style perplexity filtering (Wenzek et al., arXiv:1911.00359) scores
each document under a language model and drops the high-perplexity tail;
production pipelines use a KenLM 5-gram.  This module implements the
distributed shape with an add-alpha-smoothed n-gram model (unigram /
bigram) whose training AND scoring are pure DataFrame ops — counts are a
groupBy, scoring is an equi-join of exploded grams against the count
table, and every per-token cost is an exact integer (micronats:
``round(-ln(p) * 1e6)``) so per-document sums are partition-order
independent and bit-reproducible in the DuckDB oracle.

Scale shape: training is one shuffle (gram counts); scoring is one
equi-join (gram -> count) + one groupBy (doc).  The count table is
data-sized, not broadcast-assumed — at web scale the vocabulary of a
5-gram model exceeds driver memory, so the join stays a shuffle join and
Catalyst/AQE may still broadcast it when it is actually small.  No Python
UDFs anywhere (plan-asserted in tests).

Swapping in a real KenLM means replacing the count-join scoring stage
with a mapInPandas over a distributed model artifact; the surrounding
plan (explode -> score -> per-doc aggregate) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duckdb_annsearch_spark.operators.fts import tokenize
from duckdb_annsearch_spark.pipeline.fanout import fan_out_small
from duckdb_annsearch_spark.pipeline.text import bind

__all__ = ["train_ngram_counts", "lm_perplexity"]

MICRO = 1_000_000


def _grams(toks: Column, n: int) -> Column:
    """Array of n-grams from a token array; n=1 -> the tokens themselves,
    n=2 -> space-joined adjacent pairs (JVM zip_with over slices)."""
    if n == 1:
        return toks
    if n == 2:
        # token array bound once (r9): the two slices reference it 4x
        def _pairs(ts: Column) -> Column:
            left = F.slice(ts, 1, F.greatest(F.size(ts) - 1, F.lit(0)))
            right = F.slice(ts, 2, F.greatest(F.size(ts) - 1, F.lit(0)))
            return F.zip_with(left, right, lambda a, b: F.concat_ws(" ", a, b))

        return bind(toks, _pairs)
    raise ValueError(f"n must be 1 or 2, got {n}")


def train_ngram_counts(
    docs: DataFrame, text_col: str = "text", n: int = 1
) -> DataFrame:
    """``(gram, cnt)`` counts over the corpus — the model artifact.
    One shuffle; persist the result as parquet to reuse across corpora
    (CCNet trains on a clean reference corpus, scores the target)."""
    toks = tokenize(F.col(text_col))
    # fan_out_small: parallelize the tokenize/explode off a single-split
    # scan (no-op at scale); it feeds the count shuffle anyway
    return (
        fan_out_small(docs).select(F.explode(_grams(toks, n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
    )


def lm_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
    alpha: float = 1.0,
    counts: DataFrame | None = None,
    cond_counts: DataFrame | None = None,
) -> DataFrame:
    """Per-document add-alpha n-gram negative log-likelihood.

    Unigram (n=1): ``P(w) = (c(w) + alpha) / (N + alpha*V)`` with N the
    training token count and V the vocabulary size.  Bigram (n=2):
    ``P(w_i | w_{i-1}) = (c(w_{i-1} w_i) + alpha) / (c(w_{i-1}) + alpha*V)``
    (first token of each document is uncharged — context-less).

    ``counts`` (and ``cond_counts`` for n=2: the unigram counts of the
    same training corpus) default to self-training on ``docs``; pass
    tables from :func:`train_ngram_counts` to score against a reference
    corpus.  Grams unseen in training cost ``-ln(alpha / denom)`` via the
    left-join coalesce — no silent drop.

    Output: ``(id_col, n_grams, sum_nll_micro, avg_nll)`` where ``n_grams``
    is the number of scored grams (token count for n=1, bigram count for
    n=2),
    ``sum_nll_micro`` is the exact integer micronat sum (order-independent
    — a double fold would not be), ``avg_nll`` nats rounded to 6 (NULL for gram-less docs).  ``exp(avg_nll)`` is the conventional perplexity;
    it is left to the caller because exp's last-ulp varies across libm
    implementations while the rational avg is bit-stable.
    """
    counts_external = counts is not None
    if counts is None:
        # lazy checkpoint (r9): the model table feeds BOTH the totals
        # aggregate and the scoring join — without it the whole
        # tokenize/explode/count training pass runs twice
        counts = train_ngram_counts(docs, text_col, n).localCheckpoint(
            eager=False
        )
    toks = tokenize(F.col(text_col))
    grams = fan_out_small(docs).select(
        F.col(id_col), F.explode(_grams(toks, n)).alias("gram")
    )

    if n == 1:
        totals = counts.agg(
            F.sum("cnt").alias("_N"), F.count("*").alias("_V")
        )
        scored = (
            grams.join(counts, "gram", "left")
            .crossJoin(F.broadcast(totals))
            .select(
                F.col(id_col),
                (
                    (F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + F.lit(alpha))
                    / (F.col("_N").cast("double") + F.lit(alpha) * F.col("_V"))
                ).alias("_p"),
            )
        )
    elif n == 2:
        if cond_counts is None:
            if counts_external:
                # Self-training the context denominators on the TARGET
                # corpus while the bigram numerators come from a reference
                # corpus mixes two models and can yield p > 1 (negative
                # NLL) — require the matching unigram table instead.
                raise ValueError(
                    "lm_perplexity(n=2): external `counts` requires the "
                    "matching `cond_counts` (unigram counts of the SAME "
                    "training corpus)"
                )
            cond_counts = train_ngram_counts(docs, text_col, 1).localCheckpoint(
                eager=False
            )
        vocab = cond_counts.agg(F.count("*").alias("_V"))
        ctx = cond_counts.select(
            F.col("gram").alias("_ctx"), F.col("cnt").alias("_ctx_cnt")
        )
        scored = (
            grams.withColumn("_ctx", F.split_part(F.col("gram"), F.lit(" "), F.lit(1)))
            .join(counts, "gram", "left")
            .join(ctx, "_ctx", "left")
            .crossJoin(F.broadcast(vocab))
            .select(
                F.col(id_col),
                (
                    (F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + F.lit(alpha))
                    / (
                        F.coalesce(F.col("_ctx_cnt"), F.lit(0)).cast("double")
                        + F.lit(alpha) * F.col("_V")
                    )
                ).alias("_p"),
            )
        )
    else:
        raise ValueError(f"n must be 1 or 2, got {n}")

    micronats = F.round(-F.log(F.col("_p")) * MICRO).cast("long")
    per_doc = scored.select(F.col(id_col), micronats.alias("_mc")).groupBy(id_col).agg(
        F.count("*").alias("n_grams"), F.sum("_mc").alias("sum_nll_micro")
    )
    base = docs.select(id_col)
    return base.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce(F.col("sum_nll_micro"), F.lit(0)).cast("long").alias("sum_nll_micro"),
        F.when(
            F.col("n_grams") > 0,
            F.round(
                F.col("sum_nll_micro").cast("double")
                / (F.col("n_grams").cast("double") * MICRO),
                6,
            )
            + F.lit(0.0),
        ).alias("avg_nll"),
    )
