"""URL / domain curation (pipeline/urls.py)."""

import pytest
from pyspark.sql import functions as F

from duckdb_annsearch_spark.pipeline.urls import (
    cap_per_domain,
    dedup_by_url,
    domain_stats,
    normalize_url,
    registered_domain,
    url_host,
    url_path,
    url_port,
    url_query,
    url_registered_domain,
    url_scheme,
)


def _one(spark, url, expr):
    return (
        spark.createDataFrame([(url,)], "u string")
        .select(expr(F.col("u")).alias("v"))
        .first()["v"]
    )


class TestParse:
    def test_parts(self, spark):
        u = "HTTPS://User:pw@WWW.Example.COM:8443/A/b?x=1&y=2#frag"
        assert _one(spark, u, url_scheme) == "https"
        assert _one(spark, u, url_host) == "www.example.com"
        assert _one(spark, u, url_port) == "8443"
        assert _one(spark, u, url_path) == "/A/b"
        assert _one(spark, u, url_query) == "x=1&y=2"

    def test_non_url_is_null(self, spark):
        for bad in ["not a url", "www.example.com/path", ""]:
            assert _one(spark, bad, url_scheme) is None
            assert _one(spark, bad, url_host) is None
            assert _one(spark, bad, normalize_url) is None

    def test_no_path_no_query(self, spark):
        u = "http://example.com"
        assert _one(spark, u, url_path) == ""
        assert _one(spark, u, url_query) == ""
        assert _one(spark, u, url_port) == ""


class TestRegisteredDomain:
    @pytest.mark.parametrize(
        "host,expected",
        [
            ("www.example.com", "example.com"),
            ("a.b.c.example.org", "example.org"),
            ("news.bbc.co.uk", "bbc.co.uk"),
            ("bbc.co.uk", "bbc.co.uk"),
            ("co.uk", "co.uk"),  # bare suffix: nothing better to say
            ("localhost", "localhost"),
            ("example.com", "example.com"),
        ],
    )
    def test_cases(self, spark, host, expected):
        got = (
            spark.createDataFrame([(host,)], "h string")
            .select(registered_domain(F.col("h")).alias("d"))
            .first()["d"]
        )
        assert got == expected

    def test_from_url(self, spark):
        u = "https://shop.amazon.co.uk/dp/123"
        assert _one(spark, u, url_registered_domain) == "amazon.co.uk"


class TestNormalize:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("HTTP://Example.COM:80/Path", "http://example.com/Path"),
            ("https://example.com:443/", "https://example.com/"),
            ("https://example.com:8443/x", "https://example.com:8443/x"),
            ("https://example.com", "https://example.com/"),
            ("https://example.com/p#frag", "https://example.com/p"),
            (
                "https://example.com/p?utm_source=x&b=2&a=1&gclid=99",
                "https://example.com/p?a=1&b=2",
            ),
            (
                "https://example.com/p?utm_campaign=z",
                "https://example.com/p",
            ),
            ("https://u:p@example.com/x", "https://example.com/x"),
        ],
    )
    def test_cases(self, spark, raw, expected):
        assert _one(spark, raw, normalize_url) == expected

    def test_python_free_plan(self, spark):
        df = spark.createDataFrame([("https://a.com/x",)], "u string")
        plan = (
            df.select(normalize_url(F.col("u")))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_staged_matches_column_form(self, spark):
        # the DataFrame operators parse through _stage_parts — it must
        # agree byte-for-byte with the composable Column normalize_url
        from duckdb_annsearch_spark.pipeline.urls import with_normalized_url

        urls = [
            "HTTPS://u:p@WWW.Example.COM:443/A/b?utm_source=x&b=2&a=1#f",
            "http://example.co.uk:80/",
            "https://example.com",
            "ftp://Files.Example.org:21/pub",
            "not a url",
            None,
            "",
            "https://h/?gclid=1",
        ]
        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
        )
        both = with_normalized_url(df, "url").withColumn(
            "col_form", normalize_url(F.col("url"))
        )
        for r in both.collect():
            assert r["norm_url"] == r["col_form"], r["url"]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string")


class TestDedupByUrl:
    def test_recrawls_collapse(self, spark):
        df = _docs(
            spark,
            [
                (1, "https://example.com/p?utm_source=a"),
                (2, "https://example.com:443/p"),
                (3, "HTTPS://EXAMPLE.com/p#top"),
                (4, "https://example.com/other"),
            ],
        )
        kept = sorted(
            r["doc_id"] for r in dedup_by_url(df, "url", "doc_id").collect()
        )
        assert kept == [1, 4]

    def test_non_urls_all_survive(self, spark):
        df = _docs(spark, [(1, None), (2, None), (3, "junk"), (4, "junk")])
        assert dedup_by_url(df, "url", "doc_id").count() == 4


class TestDomainStats:
    def test_counts(self, spark):
        df = _docs(
            spark,
            [
                (1, "https://a.example.com/x"),
                (2, "https://b.example.com/x?utm_source=t"),
                (3, "https://b.example.com/x"),
                (4, "https://other.org/y"),
                (5, "not a url"),
            ],
        )
        rows = {
            r["domain"]: (r["n_urls"], r["n_distinct_urls"])
            for r in domain_stats(df, "url").collect()
        }
        assert rows == {"example.com": (3, 2), "other.org": (1, 1)}


class TestCapPerDomain:
    def test_cap_applies_per_domain(self, spark):
        rows = [(i, f"https://big.com/p{i}") for i in range(20)]
        rows += [(100 + i, f"https://small.org/p{i}") for i in range(2)]
        rows += [(200, None)]
        df = _docs(spark, rows)
        out = cap_per_domain(df, "url", cap=5)
        by_dom = (
            out.where(F.col("url").isNotNull())
            .groupBy(url_registered_domain(F.col("url")).alias("d"))
            .count()
            .collect()
        )
        got = {r["d"]: r["count"] for r in by_dom}
        assert got == {"big.com": 5, "small.org": 2}
        assert out.where(F.col("url").isNull()).count() == 1

    def test_deterministic_and_monotone(self, spark):
        rows = [(i, f"https://big.com/p{i}") for i in range(20)]
        df = _docs(spark, rows)
        first = {
            r["doc_id"]
            for r in cap_per_domain(df, "url", cap=5).collect()
        }
        again = {
            r["doc_id"]
            for r in cap_per_domain(df, "url", cap=5).collect()
        }
        assert first == again
        # growing the corpus only ever displaces via smaller hashes:
        # the survivor set of the subset is a superset predictor — check
        # membership is hash-prefix (survivors of 20 rows that are also
        # in the first 10 rows must survive a 10-row run OR be displaced)
        small = {
            r["doc_id"]
            for r in cap_per_domain(
                df.where("doc_id < 10"), "url", cap=5
            ).collect()
        }
        assert len(small) == 5
        assert first & set(range(10)) <= small

    def test_cap_zero_keeps_only_non_urls(self, spark):
        df = _docs(spark, [(1, "https://a.com/x"), (2, None)])
        out = cap_per_domain(df, "url", cap=0)
        assert [r["doc_id"] for r in out.collect()] == [2]

    def test_schema_preserved(self, spark):
        df = _docs(spark, [(1, "https://a.com/x")]).withColumn(
            "extra", F.lit("e")
        )
        out = cap_per_domain(df, "url", cap=3)
        assert sorted(out.columns) == ["doc_id", "extra", "url"]
