"""Curation funnel reporting (pipeline/report.py)."""

import pytest
from pyspark.sql import functions as F

from duckdb_annsearch_spark.pipeline.report import corpus_funnel, funnel


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_stage(df):
    return {
        r["stage"]: (r["stage_order"], r["n_docs"], r["n_tokens"])
        for r in df.collect()
    }


class TestFunnel:
    def test_first_failing_stage_wins(self, spark):
        df = _docs(spark, [(1, "a a"), (2, "b b"), (3, "c c"), (4, "d d")])
        out = funnel(
            df,
            [
                ("s1", F.col("doc_id") != 1),  # drops 1
                ("s2", F.col("doc_id") > 2),   # drops 2 (1 already gone)
            ],
        )
        got = _by_stage(out)
        assert got["s1"][1] == 1 and got["s2"][1] == 1
        assert got["kept"][1] == 2
        assert got["s1"][0] == 0 and got["s2"][0] == 1 and got["kept"][0] == 2

    def test_set_stage_survivor_dataframe(self, spark):
        df = _docs(spark, [(1, "x"), (2, "y"), (3, "z")])
        survivors = spark.createDataFrame([(1,), (3,)], "doc_id long")
        got = _by_stage(funnel(df, [("dedup", survivors)]))
        assert got["dedup"][1] == 1
        assert got["kept"][1] == 2

    def test_null_predicate_counts_as_drop(self, spark):
        df = _docs(spark, [(1, None), (2, "fine text")])
        out = funnel(df, [("has_text", F.length("text") > 0)])
        got = _by_stage(out)
        assert got["has_text"][1] == 1 and got["has_text"][2] == 0
        assert got["kept"][1] == 1

    def test_token_and_pct_accounting(self, spark):
        df = _docs(spark, [(1, "one two three"), (2, "four five")])
        out = funnel(df, [("drop_two", F.col("doc_id") != 2)])
        rows = {r["stage"]: r for r in out.collect()}
        assert rows["drop_two"]["n_tokens"] == 2
        assert rows["kept"]["n_tokens"] == 3
        assert rows["drop_two"]["pct_docs"] == pytest.approx(0.5)

    def test_validation(self, spark):
        df = _docs(spark, [(1, "x")])
        with pytest.raises(ValueError, match="at least one"):
            funnel(df, [])
        with pytest.raises(ValueError, match="duplicate"):
            funnel(df, [("a", F.lit(True)), ("a", F.lit(True))])

    def test_single_pass_plan(self, spark):
        # row-predicate-only funnels must be one aggregation over one scan
        df = _docs(spark, [(1, "x"), (2, "y")])
        out = funnel(
            df,
            [("a", F.lit(True)), ("b", F.length("text") > 0)],
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan ExistingRDD") <= 1


class TestCorpusFunnel:
    def test_matches_prepare_corpus_survivors(self, spark):
        rows = [
            (1, "the cat and the dog went to the park with all of us today"),
            (2, "el gato y el perro en los del que"),   # spanish -> lang
            (3, "the 5!!! 77#"),  # en-marked but digit/punct-heavy -> quality
            (4, "the cat and the dog went to the park with all of us today"),
        ]
        df = _docs(spark, rows)
        got = _by_stage(corpus_funnel(df, langs=("en",), min_quality=0.4))
        assert got["lang"][1] == 1
        assert got["quality"][1] == 1
        assert got["exact_dup"][1] == 1  # doc 4 loses to doc 1
        assert got["kept"][1] == 1
        # attribution order matches a sequential prepare_corpus run
        from duckdb_annsearch_spark.pipeline.corpus import prepare_corpus

        kept = prepare_corpus(
            df, langs=("en",), min_quality=0.4, dedup="exact"
        ).count()
        assert kept == got["kept"][1]

    def test_dedup_none(self, spark):
        df = _docs(spark, [(1, "the cat and that dog have to be with of")])
        got = _by_stage(corpus_funnel(df, min_quality=0.0, dedup="none"))
        assert set(got) == {"kept"}

    def test_gopher_and_c4_stages(self, spark):
        df = _docs(
            spark,
            [(1, "Proper sentences have the required words in them today.")],
        )
        out = corpus_funnel(
            df,
            langs=None,
            min_quality=None,
            gopher=True,
            gopher_thresholds={"min_words": 3, "min_mean_word_len": 2.0},
            c4=True,
            dedup="none",
        )
        got = _by_stage(out)
        # one line ending in '.', >= 5 words -> passes line rules but has
        # only 1 sentence -> dropped by c4 (after passing gopher)
        assert got["c4"][1] == 1
