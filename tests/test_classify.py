"""Hashed linear classifier (pipeline/classify.py): scoring parity vs a
pure-Python reference, train->serve round-trip separability, hashing
consistency between the two halves, NULL/empty edges, and the
Python-free serving plan."""

import math
import re

import pytest
from pyspark.sql import functions as F

from duckdb_annsearch_spark.pipeline.classify import (
    hashed_features,
    score_hashed_linear,
    train_quality_classifier,
)


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _th(g):
    import hashlib

    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16)


def _feats(text, D, ns=(1, 2)):
    ts = _toks(text)
    out = []
    for n in ns:
        out += [
            _th(" ".join(ts[i : i + n])) % D for i in range(len(ts) - n + 1)
        ]
    return out


def _ref_score(text, w, D, bias=0.0, ns=(1, 2)):
    fs = _feats(text, D, ns)
    if not fs:
        return None
    m = bias + sum(w.get(f, 0.0) for f in fs) / len(fs)
    return round(1.0 / (1.0 + math.exp(-m)), 6)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestScore:
    def test_brute_force_parity(self, spark):
        D = 64
        rows = [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "pack my box with five dozen liquor jugs"),
            (2, "aa bb aa bb aa bb"),
            (3, None),
            (4, ""),
        ]
        w = {f: ((f * 31 + 7) % 100 - 50) / 100.0 for f in range(D)}
        wdf = spark.createDataFrame(list(w.items()), "feature long, weight double")
        out = {
            r["doc_id"]: (r["n_feats"], r["score"], r["keep"])
            for r in score_hashed_linear(
                _docs(spark, rows), wdf, n_features=D, bias=0.25
            ).collect()
        }
        for i, t in rows:
            if t is None or not _toks(t):
                assert out[i] == (0, None, None), i
            else:
                want = _ref_score(t, w, D, bias=0.25)
                assert out[i][0] == len(_feats(t, D))
                assert out[i][1] == pytest.approx(want, abs=1e-6)
                assert out[i][2] == (want >= 0.5)

    def test_missing_features_weigh_zero(self, spark):
        wdf = spark.createDataFrame([(0, 5.0)], "feature long, weight double")
        out = score_hashed_linear(
            _docs(spark, [(0, "some words here")]), wdf, n_features=1024
        ).collect()[0]
        # unless a feature hashes to 0, margin is ~0 -> score ~0.5
        assert out["score"] is not None

    def test_serving_plan_python_free(self, spark):
        wdf = spark.createDataFrame([(0, 1.0)], "feature long, weight double")
        df = score_hashed_linear(_docs(spark, [(0, "a b c")]), wdf, n_features=64)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan

    def test_validation(self, spark):
        wdf = spark.createDataFrame([(0, 1.0)], "feature long, weight double")
        with pytest.raises(ValueError):
            score_hashed_linear(_docs(spark, [(0, "a")]), wdf, n_features=0)
        with pytest.raises(ValueError):
            score_hashed_linear(
                _docs(spark, [(0, "a")]), wdf, n_features=8, ngram_ns=()
            )


class TestTrainServe:
    def test_round_trip_separates(self, spark):
        """Train on an easy quality split; the returned weights must
        separate held-out docs from the same distributions through the
        SERVING path (same hash -> same margins)."""
        good_vocab = "clear prose sentence reads well structured informative"
        bad_vocab = "zzz spam spam click here buy now zzz spam"
        rows = []
        for i in range(30):
            rows.append((i, f"{good_vocab} variant {i % 5}", 1))
        for i in range(30, 60):
            rows.append((i, f"{bad_vocab} junk {i % 5}", 0))
        df = spark.createDataFrame(rows, "doc_id long, text string, label int")
        weights, bias = train_quality_classifier(
            df, n_features=1 << 12, reg_param=1e-3, max_iter=30
        )
        held = _docs(
            spark,
            [
                (100, f"{good_vocab} variant 99"),
                (101, f"{bad_vocab} junk 99"),
            ],
        )
        out = {
            r["doc_id"]: r["score"]
            for r in score_hashed_linear(
                held, weights, n_features=1 << 12, bias=bias
            ).collect()
        }
        assert out[100] > 0.5 > out[101]

    def test_feature_hash_consistency(self, spark):
        """hashed_features is the single source of truth both halves
        share — same text, same width, same indices."""
        df = _docs(spark, [(0, "alpha beta gamma")])
        got = df.select(
            hashed_features(F.col("text"), 128).alias("f")
        ).collect()[0]["f"]
        assert sorted(got) == sorted(_feats("alpha beta gamma", 128))

    def test_duplicate_weight_rows_well_defined(self, spark):
        """A weights dump with duplicate feature rows must not inflate
        n_feats through join multiplicity; duplicates sum."""
        from duckdb_annsearch_spark.pipeline.classify import score_hashed_linear

        docs = _docs(spark, [(0, "alpha beta")])
        wdup = spark.createDataFrame(
            [(f, 0.5) for f in range(64)] + [(f, 0.25) for f in range(64)],
            "feature long, weight double",
        )
        wsum = spark.createDataFrame(
            [(f, 0.75) for f in range(64)], "feature long, weight double"
        )
        a = score_hashed_linear(docs, wdup, n_features=64).collect()[0]
        b = score_hashed_linear(docs, wsum, n_features=64).collect()[0]
        assert a["n_feats"] == b["n_feats"] == 3  # 2 unigrams + 1 bigram
        assert a["score"] == b["score"]
