"""Winnowing fingerprints (pipeline/winnow.py) — brute-force parity vs a
pure-Python reference, the winnowing shared-window guarantee, NULL/short
edges, the map-only plan property, and the pairs join."""

import re

import pytest
from pyspark.sql import functions as F

from duckdb_annsearch_spark.pipeline.winnow import (
    winnow_fingerprints,
    winnow_pairs,
)


def _tokenize(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _token_hash(tok):
    import hashlib

    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)


def _ref_fingerprints(text, k, w):
    toks = _tokenize(text)
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hashes = [_token_hash(g) for g in grams]
    if not hashes:
        return []
    n_windows = max(len(hashes) - w + 1, 1)
    mins = {min(hashes[i : i + w]) for i in range(n_windows)}
    return sorted(mins)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestFingerprints:
    def test_brute_force_parity(self, spark):
        texts = [
            "the quick brown fox jumps over the lazy dog again and again",
            "pack my box with five dozen liquor jugs",
            "the quick brown fox jumps over the lazy dog",  # prefix-shares
            "a b c d e f g h i j k l m n o p q r s t",
        ]
        rows = [(i, t) for i, t in enumerate(texts)]
        got = {
            r["doc_id"]: (list(r["fingerprints"]), r["n_fingerprints"])
            for r in winnow_fingerprints(_docs(spark, rows), k=3, w=4).collect()
        }
        for i, t in rows:
            want = _ref_fingerprints(t, 3, 4)
            assert got[i] == (want, len(want)), f"doc {i}"

    def test_shared_window_guarantee(self, spark):
        """Two docs sharing a run of >= w + k - 1 tokens share >= 1
        fingerprint — the winnowing guarantee (SIGMOD 2003 thm)."""
        shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
        rows = [
            (0, "x1 y1 z1 " + shared + " p1 q1"),
            (1, "m2 n2 " + shared + " r2 s2 t2"),
        ]
        # k=3, w=4 -> guarantee needs w+k-1 = 6 shared tokens; 8 shared.
        out = {
            r["doc_id"]: set(r["fingerprints"])
            for r in winnow_fingerprints(_docs(spark, rows), k=3, w=4).collect()
        }
        assert out[0] & out[1], "shared run must yield a shared fingerprint"

    def test_null_and_short_docs(self, spark):
        rows = [(0, None), (1, ""), (2, "one two"), (3, "one two three four five")]
        out = {
            r["doc_id"]: r["fingerprints"]
            for r in winnow_fingerprints(_docs(spark, rows), k=3, w=4).collect()
        }
        assert out[0] is None
        assert out[1] == []
        assert out[2] == []  # 2 tokens < k
        assert len(out[3]) >= 1  # 3 grams < w -> single global-min window

    def test_map_only_plan(self, spark):
        df = winnow_fingerprints(_docs(spark, [(0, "a b c d e")]), k=2, w=2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for marker in ("Exchange", "BatchEvalPython", "ArrowEvalPython"):
            assert marker not in plan, plan

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            winnow_fingerprints(_docs(spark, [(0, "a")]), k=0)
        with pytest.raises(ValueError):
            winnow_fingerprints(_docs(spark, [(0, "a")]), w=0)


class TestPairs:
    def test_overlapping_pair_found(self, spark):
        shared = " ".join(f"tok{i}" for i in range(12))
        rows = [
            (0, "aa bb cc " + shared),
            (1, shared + " dd ee ff"),
            (2, "unrelated words entirely different content here now"),
        ]
        out = winnow_pairs(
            _docs(spark, rows), k=3, w=4, min_shared=1
        ).collect()
        pairs = {(r["id_a"], r["id_b"]) for r in out}
        assert (0, 1) in pairs
        assert all(p == (0, 1) for p in pairs)
        row = [r for r in out if (r["id_a"], r["id_b"]) == (0, 1)][0]
        assert 0 < row["overlap"] <= 1.0
        assert row["n_shared"] >= 1

    def test_identical_docs_full_overlap(self, spark):
        t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        out = winnow_pairs(
            _docs(spark, [(0, t), (1, t)]), k=3, w=3, min_shared=1
        ).collect()
        assert len(out) == 1
        assert out[0]["overlap"] == 1.0

    def test_max_df_cap_drops_universal_fingerprint(self, spark):
        # every doc shares one boilerplate run; with max_df below the doc
        # count the universal fingerprints are dropped and no pair forms.
        shared = "common banner line repeated everywhere always"
        rows = [(i, f"unique{i} distinct{i} " + shared) for i in range(6)]
        capped = winnow_pairs(
            _docs(spark, rows), k=3, w=3, min_shared=1, max_df=3
        ).collect()
        uncapped = winnow_pairs(
            _docs(spark, rows), k=3, w=3, min_shared=1, max_df=1000
        ).collect()
        assert len(uncapped) > len(capped)
