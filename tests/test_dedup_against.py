"""Cross-corpus deduplication (pipeline/dedup.py::dedup_against)."""

from pyspark.sql import functions as F

from duckdb_annsearch_spark.pipeline.dedup import dedup_against

BASE = "the quick brown fox jumps over the lazy dog near the old river bank"
NEAR = "the quick brown fox jumps over the lazy dog near the old river bend"
OTHER = "completely different words fill this sentence about spark engines"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


class TestExact:
    def test_drops_byte_identical(self, spark):
        new = _df(spark, [(1, BASE), (2, OTHER)])
        ref = _df(spark, [(100, BASE)])
        assert _ids(dedup_against(new, ref, mode="exact")) == [2]

    def test_near_duplicate_survives_exact_mode(self, spark):
        new = _df(spark, [(1, NEAR)])
        ref = _df(spark, [(100, BASE)])
        assert _ids(dedup_against(new, ref, mode="exact")) == [1]

    def test_null_text_never_a_duplicate(self, spark):
        new = _df(spark, [(1, None), (2, BASE)])
        ref = _df(spark, [(100, None), (101, BASE)])
        assert _ids(dedup_against(new, ref, mode="exact")) == [1]

    def test_within_df_duplicates_kept(self, spark):
        new = _df(spark, [(1, OTHER), (2, OTHER)])
        ref = _df(spark, [(100, BASE)])
        assert _ids(dedup_against(new, ref, mode="exact")) == [1, 2]


class TestFuzzy:
    def test_drops_exact_and_near(self, spark):
        new = _df(spark, [(1, BASE), (2, NEAR), (3, OTHER)])
        ref = _df(spark, [(100, BASE)])
        out = dedup_against(new, ref, mode="fuzzy", threshold=0.5)
        assert _ids(out) == [3]

    def test_threshold_gates_verify(self, spark):
        new = _df(spark, [(1, NEAR)])
        ref = _df(spark, [(100, BASE)])
        # one token differs -> high but not 1.0 jaccard; threshold 1.0 keeps
        out = dedup_against(new, ref, mode="fuzzy", threshold=1.0)
        assert _ids(out) == [1]

    def test_shingleless_docs(self, spark):
        # byte-identical shingle-less docs ARE duplicates (the exact
        # pre-pass catches them — minhash alone could not); NULL text and
        # non-identical short docs survive
        new = _df(spark, [(1, ""), (2, None), (3, "a b"), (4, "a c")])
        ref = _df(spark, [(100, ""), (101, "a b")])
        out = dedup_against(new, ref, mode="fuzzy", threshold=0.5)
        assert _ids(out) == [2, 4]

    def test_schema_preserved(self, spark):
        new = _df(spark, [(1, OTHER)]).withColumn("extra", F.lit(7))
        ref = _df(spark, [(100, BASE)])
        out = dedup_against(new, ref, mode="fuzzy")
        assert out.columns == ["doc_id", "text", "extra"]
        assert out.count() == 1

    def test_max_bucket_caps_reference_buckets(self, spark):
        # 30 identical ref docs form a degenerate over-cap bucket.
        # A byte-identical new doc is dropped REGARDLESS of the cap (the
        # exact pre-pass — without it the cap would let it escape); a
        # NEAR-dup of the same boilerplate loses its candidates to the
        # cap and survives — the documented recall trade of capping.
        new = _df(spark, [(1, BASE), (2, NEAR)])
        ref = _df(spark, [(100 + i, BASE) for i in range(30)])
        capped = dedup_against(new, ref, mode="fuzzy", max_bucket=5)
        assert _ids(capped) == [2]
        uncapped = dedup_against(new, ref, mode="fuzzy", threshold=0.5)
        assert _ids(uncapped) == []

    def test_ref_ids_disjoint_not_required(self, spark):
        # same id space on both sides must not confuse the anti-join
        new = _df(spark, [(1, OTHER)])
        ref = _df(spark, [(1, BASE)])
        assert _ids(dedup_against(new, ref, mode="fuzzy")) == [1]


def test_unknown_mode_raises(spark):
    import pytest

    new = _df(spark, [(1, BASE)])
    with pytest.raises(ValueError, match="mode"):
        dedup_against(new, new, mode="nope")
