"""Corpus-hygiene ops: PII scrub, repetition stats, decontamination
(pipeline/quality.py)."""

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scrub_pii_and_counts(spark):
    from duckdb_annsearch_spark.pipeline.quality import pii_counts, scrub_pii

    df = _docs(
        spark,
        [
            (1, "mail me at a.user+tag@example.co.uk or call +1 (555) 010-7788"),
            (2, "server at 10.1.255.3 responded; no pii here otherwise"),
            (3, "plain text, year 20250101 must survive"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            scrub_pii(F.col("text")).alias("clean"),
            *[c.alias(k) for k, c in pii_counts(F.col("text")).items()],
        ).collect()
    }
    assert "<EMAIL>" in out[1]["clean"] and "example" not in out[1]["clean"]
    assert "<PHONE>" in out[1]["clean"] and "555" not in out[1]["clean"]
    assert out[1]["email"] == 1 and out[1]["phone"] == 1 and out[1]["ip"] == 0
    assert "<IP>" in out[2]["clean"] and "10.1.255.3" not in out[2]["clean"]
    assert out[2]["ip"] == 1
    # long plain numbers are NOT phone numbers (no +/( anchor)
    assert out[3]["clean"] == "plain text, year 20250101 must survive"
    assert out[3]["email"] == out[3]["ip"] == out[3]["phone"] == 0


def test_scrub_phone_does_not_swallow_adjacent_numbers(spark):
    """Bounded digit groups: a phone match must stop at the number's end,
    not extend greedily across spaces into following years/ids."""
    from duckdb_annsearch_spark.pipeline.quality import scrub_pii

    df = _docs(spark, [(1, "call (555) 010-7788 1999 2024 edition")])
    clean = df.select(scrub_pii(F.col("text")).alias("c")).first()["c"]
    assert "<PHONE>" in clean
    assert "1999" in clean and "2024" in clean


def test_repetition_fractions(spark):
    from duckdb_annsearch_spark.pipeline.quality import (
        dup_line_fraction,
        dup_token_fraction,
    )

    df = _docs(
        spark,
        [
            (1, "spam spam spam spam"),  # 3/4 tokens duplicate
            (2, "all tokens unique here"),
            (3, "a\nb\na\n\n  \nb"),  # 4 non-empty lines, 2 duplicates
            (4, ""),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            dup_token_fraction(F.col("text")).alias("dt"),
            dup_line_fraction(F.col("text")).alias("dl"),
        ).collect()
    }
    assert out[1]["dt"] == 0.75
    assert out[2]["dt"] == 0.0
    assert out[3]["dl"] == 0.5
    assert out[4]["dt"] == 0.0 and out[4]["dl"] == 0.0


def test_top_bigram_char_fraction(spark):
    from duckdb_annsearch_spark.pipeline.quality import top_bigram_char_fraction

    df = _docs(
        spark,
        [
            (1, "buy now buy now buy now"),  # "buy now" x3 of 23 chars
            (2, "one two"),  # single bigram covers everything (capped at 1)
            (3, "solo"),  # no bigram -> 0
        ],
    )
    out = {
        r["doc_id"]: r["top_bigram_frac"]
        for r in top_bigram_char_fraction(df, "doc_id", "text").collect()
    }
    assert out[1] == round(3 * len("buy now") / 23, 6)
    assert out[2] == 1.0
    assert out[3] == 0.0


def test_hygiene_exprs_on_stream(spark, tmp_path):
    """The scrub/repetition expressions are stateless column expressions —
    they must run unchanged on a Structured Streaming source (the
    continuous-ingestion hygiene pass)."""
    from duckdb_annsearch_spark.pipeline.quality import (
        dup_token_fraction,
        scrub_pii,
    )

    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "mail root@host.org now"), (2, "dup dup dup")],
        "doc_id long, text string",
    ).repartition(1).write.parquet(path)
    stream = spark.readStream.schema(
        spark.read.parquet(path).schema
    ).parquet(path)
    out = stream.select(
        "doc_id",
        scrub_pii(F.col("text")).alias("clean"),
        dup_token_fraction(F.col("text")).alias("dt"),
    )
    q = (
        out.writeStream.format("memory")
        .queryName("hygienestream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in spark.table("hygienestream").collect()}
    assert got[1]["clean"] == "mail <EMAIL> now"
    assert abs(got[2]["dt"] - 2 / 3) < 1e-6


def test_decontaminate(spark):
    from duckdb_annsearch_spark.pipeline.quality import decontaminate

    words = "w%d"
    mk = lambda lo: " ".join(words % i for i in range(lo, lo + 10))
    corpus = _docs(
        spark,
        [
            (1, mk(0)),       # shares its 8-grams with the benchmark
            (2, mk(100)),     # disjoint vocabulary
            (3, mk(0) + " tail deviation"),  # prefix overlap only
            (4, "short doc"),  # <8 tokens: no grams at all
        ],
    )
    bench = _docs(spark, [(99, mk(0))])
    out = {
        r["doc_id"]: r for r in decontaminate(corpus, bench, "doc_id", "text").collect()
    }
    assert out[1]["contaminated"] and out[1]["overlap_ngrams"] == 3
    assert not out[2]["contaminated"] and out[2]["overlap_ngrams"] == 0
    assert out[3]["contaminated"] and out[3]["overlap_ngrams"] == 3
    assert not out[4]["contaminated"]


class TestSemanticDecontaminate:
    def _dfs(self, spark):
        from tests.conftest import make_vectors_df

        corpus = make_vectors_df(
            spark,
            [
                (0, [1.0, 0.0, 0.0]),      # exact benchmark copy
                (1, [0.99, 0.14, 0.0]),    # near the benchmark
                (2, [0.0, 1.0, 0.0]),      # orthogonal
                (3, None),                  # NULL vector
            ],
            id_col="doc_id",
        )
        bench = make_vectors_df(spark, [(100, [1.0, 0.0, 0.0])], id_col="bid")
        return corpus, bench

    def test_flags(self, spark):
        from duckdb_annsearch_spark.pipeline.quality import semantic_decontaminate

        corpus, bench = self._dfs(spark)
        rows = {r.doc_id: r for r in semantic_decontaminate(
            corpus, bench, threshold=0.95
        ).collect()}
        assert rows[0].contaminated and rows[0].max_benchmark_cos == 1.0
        assert rows[1].contaminated  # cos ~ 0.990
        assert not rows[2].contaminated and abs(rows[2].max_benchmark_cos) < 1e-9
        assert not rows[3].contaminated and rows[3].max_benchmark_cos is None

    def test_empty_benchmark(self, spark):
        from duckdb_annsearch_spark.pipeline.quality import semantic_decontaminate

        corpus, bench = self._dfs(spark)
        rows = semantic_decontaminate(
            corpus, bench.where("bid < 0"), threshold=0.95
        ).collect()
        assert all(not r.contaminated and r.max_benchmark_cos is None for r in rows)
