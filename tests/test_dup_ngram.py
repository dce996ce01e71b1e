"""dup_ngram_stats: brute-force parity + cross-document semantics."""

import re

import pytest

from duckdb_annsearch_spark.pipeline.dedup import dup_ngram_stats

DOCS = [
    (0, "alpha beta gamma delta epsilon"),
    (1, "zeta alpha beta gamma eta"),        # shares 'alpha beta gamma' with 0
    (2, "theta iota kappa"),                  # nothing shared
    (3, "mu nu mu nu mu"),                    # in-doc repeats only -> 0 dup
    (4, "alpha beta gamma delta epsilon"),    # exact dup of 0
    (5, "x"),                                 # shorter than k
    (6, ""),
]
K = 3


def _toks(t):
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


def _brute(k=K):
    grams = {d: [" ".join(_toks(t)[i:i + k])
                 for i in range(len(_toks(t)) - k + 1)] for d, t in DOCS}
    df = {}
    for d, gs in grams.items():
        for g in set(gs):
            df[g] = df.get(g, 0) + 1
    out = {}
    for d, gs in grams.items():
        nd = sum(1 for g in gs if df[g] >= 2)
        out[d] = (len(gs), nd, round(nd / len(gs), 6) if gs else None)
    return out


def test_matches_brute_force(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r.doc_id: (r.n_grams, r.n_dup_grams, r.dup_frac)
           for r in dup_ngram_stats(df, k=K).collect()}
    assert got == _brute()


def test_within_doc_repeats_not_duplicated(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r.doc_id: r.n_dup_grams for r in dup_ngram_stats(df, k=K).collect()}
    assert got[3] == 0  # 'mu nu mu' repeats inside doc 3 only
    # exact-dup pair 0/4: every gram duplicated
    rows = {r.doc_id: r for r in dup_ngram_stats(df, k=K).collect()}
    assert rows[0].dup_frac is not None and rows[4].n_dup_grams == rows[4].n_grams


def test_short_docs_zero_grams(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r.doc_id: (r.n_grams, r.dup_frac) for r in dup_ngram_stats(df, k=K).collect()}
    assert got[5] == (0, None) and got[6] == (0, None)


def test_plan_python_free(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = dup_ngram_stats(df, k=K)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_xx_hash_same_results(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    md5 = {r.doc_id: (r.n_grams, r.n_dup_grams, r.dup_frac)
           for r in dup_ngram_stats(df, k=K).collect()}
    xx = {r.doc_id: (r.n_grams, r.n_dup_grams, r.dup_frac)
          for r in dup_ngram_stats(df, k=K, hash_fn="xx").collect()}
    assert md5 == xx
    import pytest as _pytest
    with _pytest.raises(ValueError, match="hash_fn"):
        dup_ngram_stats(df, hash_fn="sha")
