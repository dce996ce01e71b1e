"""Gopher / C4 rule-based corpus filters (pipeline/filters.py)."""

import pytest
from pyspark.sql import functions as F

from duckdb_annsearch_spark.pipeline.filters import (
    c4_clean_text,
    c4_filter,
    gopher_filter,
    word_list,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


GOOD = (
    "the cat sat on the mat and that dog has to be with all of us here "
    "and the birds sing songs that fill the air with sound every day "
    "while people walk past the old stone wall that leads to the park "
    "where children play games and laugh together under the warm sun"
)


class TestGopher:
    def test_good_doc_passes_defaults(self, spark):
        out = gopher_filter(_docs(spark, [(1, GOOD)]))
        assert out.count() == 1

    def test_stats_values(self, spark):
        row = (
            gopher_filter(_docs(spark, [(1, "aa bb cc")]), keep_stats=True)
            .select("n_words", "mean_word_len", "n_required_words", "keep")
            .first()
        )
        assert row["n_words"] == 3
        assert row["mean_word_len"] == 2.0
        assert row["n_required_words"] == 0
        assert row["keep"] is False

    def test_null_and_empty_text(self, spark):
        out = gopher_filter(
            _docs(spark, [(1, None), (2, ""), (3, "   ")]), keep_stats=True
        ).select("doc_id", "n_words", "mean_word_len", "keep")
        for r in out.collect():
            assert r["n_words"] == 0
            assert r["mean_word_len"] == 0.0
            assert r["keep"] is False

    def test_word_count_bounds(self, spark):
        short = "the of " * 10  # 20 words, all required-word hits
        out = gopher_filter(
            _docs(spark, [(1, short)]), keep_stats=True, min_words=50
        ).first()
        assert out["keep"] is False
        out2 = gopher_filter(
            _docs(spark, [(1, short)]),
            keep_stats=True,
            min_words=5,
            min_mean_word_len=2.0,
        ).first()
        assert out2["keep"] is True

    def test_symbol_ratio_rule(self, spark):
        spam = GOOD + " " + "# " * 20
        stats = gopher_filter(
            _docs(spark, [(1, spam)]), keep_stats=True
        ).first()
        assert stats["symbol_word_ratio"] > 0.1
        assert stats["keep"] is False
        # ellipsis counts too, 3 chars at a time
        ell = gopher_filter(
            _docs(spark, [(1, "a ... b ... c")]), keep_stats=True
        ).first()
        assert ell["symbol_word_ratio"] == pytest.approx(2 / 5, abs=1e-6)

    def test_bullet_and_ellipsis_lines(self, spark):
        text = "- one thing\n* two things\nplain line\nends like this..."
        stats = gopher_filter(
            _docs(spark, [(1, text)]), keep_stats=True
        ).first()
        assert stats["bullet_line_frac"] == pytest.approx(0.5)
        assert stats["ellipsis_line_frac"] == pytest.approx(0.25)

    def test_alpha_word_fraction(self, spark):
        stats = gopher_filter(
            _docs(spark, [(1, "abc 123 4d5 999")]), keep_stats=True
        ).first()
        assert stats["alpha_word_frac"] == pytest.approx(0.5)

    def test_required_words_distinct_not_counted_twice(self, spark):
        stats = gopher_filter(
            _docs(spark, [(1, "the the the the")]), keep_stats=True
        ).first()
        assert stats["n_required_words"] == 1

    def test_filter_mode_drops_rows(self, spark):
        df = _docs(spark, [(1, GOOD), (2, "tiny")])
        kept = gopher_filter(df).select("doc_id").collect()
        assert [r["doc_id"] for r in kept] == [1]

    def test_python_free_plan(self, spark):
        plan = gopher_filter(
            _docs(spark, [(1, GOOD)]), keep_stats=True
        )._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestC4:
    def test_line_rules(self, spark):
        text = (
            "This is a proper sentence with enough words.\n"
            "short.\n"
            "no terminal punctuation in this line here\n"
            'A quoted sentence can end with a quote mark."'
        )
        clean = (
            _docs(spark, [(1, text)])
            .select(c4_clean_text(F.col("text")).alias("c"))
            .first()["c"]
        )
        lines = clean.split("\n")
        assert len(lines) == 2
        assert lines[0].startswith("This is a proper")
        assert lines[1].endswith('"')

    def test_doc_keep_needs_three_sentences(self, spark):
        two = (
            "One proper sentence sits right here today.\n"
            "Two proper sentences sit right here today."
        )
        three = two + "\nThree proper sentences sit right here today."
        out = c4_filter(_docs(spark, [(1, two), (2, three)]))
        assert [r["doc_id"] for r in out.select("doc_id").collect()] == [2]

    def test_bad_substrings_drop(self, spark):
        base = (
            "One proper sentence sits right here today.\n"
            "Two proper sentences sit right here today.\n"
            "Three proper sentences sit right here today."
        )
        rows = [
            (1, base),
            (2, base + "\nSome Lorem Ipsum filler text sits here now."),
            (3, base + "\nA brace { appears inside this long sentence."),
            (4, base + "\nEnable javascript to view this page content."),
        ]
        out = c4_filter(_docs(spark, rows))
        # lorem ipsum and '{' drop the PAGE; 'javascript' drops only the
        # LINE (paper semantics) — doc 4 survives minus that line
        kept = {r["doc_id"]: r["text"] for r in out.collect()}
        assert sorted(kept) == [1, 4]
        assert "javascript" not in kept[4]
        assert kept[4] == base

    def test_bad_substring_on_raw_page_survives_line_cleaning(self, spark):
        # C4 (1910.10683 §2.2) drops pages on RAW content: a page whose
        # only offending line the line rules remove (a code line with no
        # terminal punctuation) must still drop
        base = (
            "One proper sentence sits right here today.\n"
            "Two proper sentences sit right here today.\n"
            "Three proper sentences sit right here today."
        )
        rows = [(1, base), (2, base + "\nfunction() {")]
        out = c4_filter(_docs(spark, rows))
        assert [r["doc_id"] for r in out.select("doc_id").collect()] == [1]

    def test_text_column_replaced(self, spark):
        text = "Keep this full sentence with many words.\ndrop me"
        row = c4_filter(
            _docs(spark, [(1, text + "\nMore good words arrive in this one."
                           + "\nA third sentence closes out the document.")]),
        ).first()
        assert "drop me" not in row["text"]

    def test_null_text(self, spark):
        assert c4_filter(_docs(spark, [(1, None)])).count() == 0

    def test_keep_stats_preserves_original(self, spark):
        row = c4_filter(
            _docs(spark, [(1, "no punct line")]), keep_stats=True
        ).first()
        assert row["text"] == "no punct line"
        assert row["clean_text"] == ""
        assert row["n_lines_kept"] == 0
        assert row["keep"] is False

    def test_python_free_plan(self, spark):
        plan = c4_filter(
            _docs(spark, [(1, "A sentence stays right here today.")])
        )._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_word_list_handles_mixed_whitespace(spark):
    out = (
        spark.range(1)
        .select(word_list(F.lit("a\tb  c\nd ")).alias("w"))
        .first()["w"]
    )
    assert out == ["a", "b", "c", "d"]
