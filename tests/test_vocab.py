"""Vocabulary statistics (pipeline/vocab.py)."""

import pytest
from pyspark.sql import functions as F

from duckdb_annsearch_spark.pipeline.vocab import (
    bigram_counts,
    top_vocab,
    vocab_coverage,
    word_counts,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_counts(spark):
    df = _docs(spark, ["a b a", "b c", None, ""])
    got = {r["word"]: r["count"] for r in word_counts(df).collect()}
    assert got == {"a": 2, "b": 2, "c": 1}


def test_bigram_counts_adjacency(spark):
    df = _docs(spark, ["a b c a b", "x"])
    got = {
        (r["w1"], r["w2"]): r["count"] for r in bigram_counts(df).collect()
    }
    # single-token and empty docs emit no pairs
    assert got == {("a", "b"): 2, ("b", "c"): 1, ("c", "a"): 1}


def test_top_vocab_rank_and_coverage(spark):
    df = _docs(spark, ["a a a b b c"])
    rows = {r["word"]: r for r in top_vocab(df, top_n=2).collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["rank"] == 1 and rows["a"]["count"] == 3
    assert rows["a"]["cum_frac"] == pytest.approx(0.5)
    assert rows["b"]["rank"] == 2
    assert rows["b"]["cum_frac"] == pytest.approx(5 / 6, abs=1e-6)


def test_top_vocab_tie_breaks_by_word(spark):
    df = _docs(spark, ["b a c b a c"])
    rows = top_vocab(df, top_n=3).orderBy("rank").collect()
    assert [r["word"] for r in rows] == ["a", "b", "c"]


def test_vocab_coverage(spark):
    df = _docs(spark, ["a a b c"])
    vocab = spark.createDataFrame([("a",), ("b",)], "word string")
    row = vocab_coverage(df, vocab).first()
    assert row["n_tokens"] == 4
    assert row["n_in_vocab"] == 3
    assert row["oov_rate"] == pytest.approx(0.25)


def test_vocab_coverage_empty_corpus(spark):
    df = _docs(spark, [None])
    vocab = spark.createDataFrame([("a",)], "word string")
    row = vocab_coverage(df, vocab).first()
    assert row["n_tokens"] is None or row["n_tokens"] == 0
    assert row["oov_rate"] == 0.0


def test_python_free_plans(spark):
    df = _docs(spark, ["a b c"])
    for out in (word_counts(df), bigram_counts(df)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_top_vocab_plans_take_ordered(spark):
    # the selection must be TakeOrderedAndProject, not a global sort
    df = _docs(spark, ["a b c d e f g h"])
    plan = (
        top_vocab(df, top_n=3)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
