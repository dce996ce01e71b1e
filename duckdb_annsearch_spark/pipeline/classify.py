"""Hashed linear text classifier — the fastText shape (Joulin et al.
2016, arXiv:1607.01759) that production curation pipelines use for
quality filtering (CCNet scores Wikipedia-vs-crawl, GPT-3/LLaMA filter
on a linear classifier over hashed n-gram features).

Two halves, split the way deployment splits them:

- :func:`score_hashed_linear` — the 100-TB-scale SERVING path, pure
  DataFrame ops: explode hashed word n-gram features (map-only), one
  equi-join against a ``(feature, weight)`` table, one per-document
  aggregate.  The weight table is data-sized (2^20 features is normal) —
  never broadcast-assumed, though AQE will broadcast it when it is
  actually small.  score = sigmoid(bias + mean of matched feature
  weights) — exactly fastText's mean-pooled bag of features with a
  1-dimensional embedding, so any externally-trained fastText/sklearn
  linear model deploys here by dumping its coefficients.

- :func:`train_quality_classifier` — the offline TRAINING path:
  mean-pooled hashed count vectors assembled per document, then
  ``pyspark.ml`` ``LogisticRegression`` (distributed L-BFGS).  Returns
  the ``(feature, weight)`` DataFrame + bias in exactly the form the
  serving path consumes, featurized with the SAME md5 hash — train and
  serve can never disagree on the hashing trick.  Vector assembly uses
  one Arrow-batched UDF (training corpus pass, not the serving hot
  path).

Feature hashing is the package-standard 60-bit md5 ``token_hash`` mod
``n_features`` — deterministic, cross-engine reproducible (the DuckDB
oracle replays scoring bit-for-bit), and collision behavior is the
standard hashing-trick trade documented by Weinberger et al. 2009.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duckdb_annsearch_spark.operators.fts import tokenize
from duckdb_annsearch_spark.pipeline.fanout import fan_out_small
from duckdb_annsearch_spark.pipeline.text import bind, token_hash

__all__ = [
    "hashed_features",
    "score_hashed_linear",
    "train_quality_classifier",
]


def _word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array (zip_with shift)."""
    if n == 1:
        return toks
    size = F.size(toks)
    grams = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(size - j, F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda g, t: F.concat_ws(" ", g, t))
    return F.when(size >= n, F.slice(grams, 1, size - (n - 1))).otherwise(
        F.array().cast("array<string>")
    )


def hashed_features(
    text: Column, n_features: int, ngram_ns: Sequence[int] = (1, 2)
) -> Column:
    """All word n-gram feature indices of ``text`` (multiplicity
    preserved — counts matter for mean pooling): ``array<long>`` of
    ``token_hash(gram) % n_features``.  NULL text -> NULL."""
    if n_features < 1:
        raise ValueError(f"n_features must be >= 1, got {n_features}")
    if not ngram_ns or any(n < 1 for n in ngram_ns):
        raise ValueError(f"ngram_ns must be positive ints, got {ngram_ns!r}")
    # token array bound once (r9): each n-gram order references it ~2n
    # times and HOF subtrees skip subexpression elimination
    def _feats(toks: Column) -> Column:
        parts = [
            F.transform(_word_ngrams(toks, n), lambda g: token_hash(g) % n_features)
            for n in ngram_ns
        ]
        out = parts[0]
        for p in parts[1:]:
            out = F.concat(out, p)
        return out

    return bind(tokenize(text), _feats)


def score_hashed_linear(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 1 << 20,
    bias: float = 0.0,
    ngram_ns: Sequence[int] = (1, 2),
    threshold: float = 0.5,
) -> DataFrame:
    """Score documents under a linear model over hashed n-gram features.

    ``weights``: ``(feature, weight)`` rows (missing features weigh 0 —
    sparse models stay sparse).  Emits ``(id_col, n_feats, score,
    keep)`` with ``score = round(sigmoid(bias + sum(w)/n_feats), 6)``
    and ``keep = score >= threshold``; a document with no features (or
    NULL text) scores NULL / keep NULL — route explicitly, don't guess.

    Plan: map-only feature explode (16-byte rows: id + feature), one
    equi-join on feature, one per-doc aggregate — the dup_ngram cost
    class, linear in corpus token count.
    """
    # fan the md5-per-gram feature hashing across cores when the input is
    # a small single-split scan (no-op at scale — pipeline/fanout.py)
    feats = fan_out_small(df).select(
        F.col(id_col),
        F.explode(
            hashed_features(F.col(text_col), n_features, ngram_ns)
        ).alias("feature"),
    )
    # pre-aggregate the weight table: a duplicate feature row would
    # otherwise multiply matching rows through the join, inflating BOTH
    # the weight sum and n_feats (the mean's denominator counts joined
    # rows).  Summing duplicates is the linear-model reading of a
    # malformed dump, the aggregate is over the data-sized weight table
    # only, and for a well-formed table it collapses in the map side.
    w = (
        weights.select(
            F.col("feature").cast("long").alias("feature"),
            F.col("weight").cast("double").alias("_w"),
        )
        .groupBy("feature")
        .agg(F.sum("_w").alias("_w"))
    )
    per_doc = (
        feats.join(w, "feature", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.sum(F.coalesce(F.col("_w"), F.lit(0.0))).alias("_wsum"),
        )
    )
    margin = F.lit(float(bias)) + F.col("_wsum") / F.col("n_feats")
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)), 6)
    return df.select(id_col).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
        score.alias("score"),
        F.when(score.isNotNull(), score >= threshold).alias("keep"),
    )


def train_quality_classifier(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 1 << 18,
    ngram_ns: Sequence[int] = (1, 2),
    reg_param: float = 1e-4,
    max_iter: int = 50,
) -> tuple[DataFrame, float]:
    """Train the fastText-shaped model: mean-pooled hashed n-gram count
    vectors -> distributed ``pyspark.ml`` LogisticRegression.  ``df``
    needs a 0/1 ``label_col`` (1 = high quality, e.g. Wikipedia side of
    a CCNet-style reference-vs-crawl split).

    Returns ``(weights, bias)`` where ``weights`` is the sparse
    ``(feature, weight)`` DataFrame :func:`score_hashed_linear` consumes
    — same hash, same pooling, so serving reproduces training margins
    exactly.  Documents with no features are excluded from training
    (they carry no signal and L-BFGS dislikes zero vectors).  The
    sparse-vector assembly is a Python UDF — the documented slow step of
    the offline training pass; the serving path has no Python anywhere.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import Vectors, VectorUDT

    feats = df.select(
        F.col(id_col),
        F.col(label_col).cast("double").alias("_lbl"),
        F.explode(
            hashed_features(F.col(text_col), n_features, ngram_ns)
        ).alias("feature"),
    )
    # (doc, feature) counts -> mean-pooled sparse vector; the assembly
    # UDF sees pre-aggregated (sorted indices, counts) rows, one per doc.
    counts = feats.groupBy(id_col, "_lbl", "feature").agg(
        F.count("*").alias("_c")
    )
    per_doc = counts.groupBy(id_col, "_lbl").agg(
        F.array_sort(
            F.collect_list(F.struct("feature", F.col("_c").cast("double")))
        ).alias("_fc"),
        F.sum("_c").alias("_n"),
    )

    nf = int(n_features)

    @F.udf(VectorUDT())
    def _sparse(fc, n):
        return Vectors.sparse(
            nf, [int(r["feature"]) for r in fc], [r[1] / float(n) for r in fc]
        )

    train = per_doc.select(
        F.col("_lbl").alias("label"),
        _sparse(F.col("_fc"), F.col("_n")).alias("features"),
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False
    )
    model = lr.fit(train)
    co = model.coefficients
    spark = df.sparkSession
    rows = [(int(i), float(co[i])) for i in range(len(co)) if co[i] != 0.0]
    weights = spark.createDataFrame(rows or [(0, 0.0)], "feature long, weight double")
    if not rows:
        weights = weights.where(F.lit(False))
    return weights, float(model.intercept)
