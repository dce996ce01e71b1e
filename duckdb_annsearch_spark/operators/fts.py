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
    """(postings, doclens): postings = (term, doc_id, tf);
    doclens = (doc_id, dl).  Both are groupBy jobs — partial map-side
    aggregation, scales linearly with the corpus."""
    toks = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").cast("int").alias("tf"))
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
    predicate; the per-term doc-frequency aggregation and the final
    per-doc sum are both partial-aggregated map-side.
    """
    if not query_terms:
        return postings.sparkSession.createDataFrame(
            [], "doc_id long, _bm25_score double"
        )
    terms = list(dict.fromkeys(query_terms))  # dedupe, keep order
    matched = postings.where(F.col("term").isin(terms))
    df_per_term = matched.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        matched.join(F.broadcast(df_per_term), "term")
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
