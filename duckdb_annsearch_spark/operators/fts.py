"""Minimal full-text scoring layer backing ``hybrid_search``.

The reference delegates BM25 to DuckDB's FTS extension (a separate internal
connection running ``match_bm25`` — ``/root/reference/src/ann_search.cpp:
1010-1056``) and degrades to vector-only when the FTS index is missing.
This module is the Spark-native equivalent: an engine-owned FTS artifact
(postings + doc lengths, all parquet) and a BM25 scoring job.

Engine FTS semantics (documented contract, also used by the DuckDB oracle
SQL so correctness is checkable without the FTS extension):
  * tokenizer: lowercase, split on non-alphanumeric runs, drop empties
  * no stemming, no stopwords
  * Okapi BM25 with k1=1.2, b=0.75, idf = ln(1 + (N - df + 0.5)/(df + 0.5))
  * OR semantics: a document scores on every query term it contains
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def tokenize(col: Column) -> Column:
    """lowercase -> split on non-alnum -> drop empty tokens."""
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"),
        lambda t: t != "",
    )


def tokenize_py(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def build_fts_artifacts(
    df: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """(postings, doclens): postings = (term, doc_id, tf, df);
    doclens = (doc_id, dl).  Both are groupBy jobs — partial map-side
    aggregation, scales linearly with the corpus.

    ``df`` (documents containing the term) is corpus-constant, so it is
    denormalized into the postings at BUILD time — query-time scoring then
    needs zero aggregation jobs before the final per-doc sum (the
    reference's FTS extension likewise materializes df in its index
    tables)."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").cast("int").alias("tf"))
    # postings are unique on (term, doc_id) -> count over the term partition
    # IS the document frequency; one build-time shuffle, no query-time agg
    postings = postings.withColumn(
        "df", F.count("*").over(Window.partitionBy("term")).cast("int")
    )
    doclens = toks.groupBy("doc_id").agg(F.count("*").cast("int").alias("dl"))
    return postings, doclens


def bm25_scores(
    postings: DataFrame,
    doclens: DataFrame,
    n_docs: int,
    avgdl: float,
    query_terms: list[str],
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """(doc_id, _bm25_score) for documents matching >=1 query term.

    The terms list is tiny -> the postings filter is a pushed-down IN
    predicate.  Artifacts built by :func:`build_fts_artifacts` carry the
    per-term document frequency already (``df`` column), so the only
    query-time aggregation is the final per-doc sum; postings without the
    column (pre-existing artifacts, ad-hoc frames) fall back to computing
    it with one extra job.
    """
    if not query_terms:
        return postings.sparkSession.createDataFrame(
            [], "doc_id long, _bm25_score double"
        )
    terms = list(dict.fromkeys(query_terms))  # dedupe, keep order
    matched = postings.where(F.col("term").isin(terms))
    if "df" not in postings.columns:
        df_per_term = matched.groupBy("term").agg(
            F.countDistinct("doc_id").alias("df")
        )
        matched = matched.join(F.broadcast(df_per_term), "term")
    scored = (
        matched
        .join(doclens, "doc_id")
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(float(avgdl)))),
        )
        .groupBy("doc_id")
        .agg(F.sum("w").alias("_bm25_score"))
    )
    return scored
