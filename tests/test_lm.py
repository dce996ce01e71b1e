"""n-gram LM perplexity: brute-force parity (unigram + bigram), external
counts, unseen-gram smoothing, and a Python-free plan."""

import math
import re

import pytest
from pyspark.sql import functions as F

from duckdb_annsearch_spark.pipeline.lm import lm_perplexity, train_ngram_counts

MICRO = 1_000_000

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "cat and dog and cat"),
    (3, ""),  # token-less
    (4, None),  # NULL text
    (5, "unseen-ish Words, CAPS and punctuation!!!"),
    (6, "the the the the"),
]


def _toks(t):
    return [x for x in re.split(r"[^a-z0-9]+", (t or "").lower()) if x]


def _grams(t, n):
    toks = _toks(t)
    return toks if n == 1 else [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _brute(docs, n, alpha=1.0, train=None):
    train = docs if train is None else train
    cnt: dict[str, int] = {}
    uni: dict[str, int] = {}
    for _, t in train:
        for g in _grams(t, n):
            cnt[g] = cnt.get(g, 0) + 1
        for g in _grams(t, 1):
            uni[g] = uni.get(g, 0) + 1
    N, V = sum(cnt.values()), len(cnt)
    Vu = len(uni)
    out = {}
    for did, t in docs:
        mcs = []
        for g in _grams(t, n):
            if n == 1:
                p = (cnt.get(g, 0) + alpha) / (N + alpha * V)
            else:
                ctx = g.split(" ")[0]
                p = (cnt.get(g, 0) + alpha) / (uni.get(ctx, 0) + alpha * Vu)
            mcs.append(round(-math.log(p) * MICRO))
        s = sum(mcs)
        out[did] = (
            len(mcs),
            s,
            round(s / (len(mcs) * MICRO), 6) if mcs else None,
        )
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


@pytest.mark.parametrize("n", [1, 2])
def test_matches_brute_force(docs_df, n):
    got = {r.doc_id: (r.n_grams, r.sum_nll_micro, r.avg_nll)
           for r in lm_perplexity(docs_df, n=n).collect()}
    exp = _brute(DOCS, n)
    assert set(got) == set(exp)
    for did in exp:
        assert got[did] == exp[did], (n, did, got[did], exp[did])


def test_external_counts_score_unseen(spark, docs_df):
    """Score a target doc with grams absent from training: smoothing
    charges -ln(alpha/denom), nothing is dropped."""
    train = docs_df.where("doc_id <= 2")
    counts = train_ngram_counts(train)
    target = spark.createDataFrame([(99, "zebra quux the")], ["doc_id", "text"])
    row = lm_perplexity(target, counts=counts).collect()[0]
    exp = _brute([(99, "zebra quux the")], 1, train=[d for d in DOCS if d[0] <= 2])
    assert (row.n_grams, row.sum_nll_micro, row.avg_nll) == exp[99]
    # unseen grams must cost MORE than the frequent 'the'
    vocab_rows = {r.gram: r.cnt for r in counts.collect()}
    assert "zebra" not in vocab_rows and vocab_rows["the"] >= 4


def test_repetition_scores_lower_than_rare(docs_df):
    """Doc 6 (only 'the', the most frequent token) must have lower avg
    NLL than doc 5 (rare tokens) — the signal the filter thresholds."""
    rows = {r.doc_id: r.avg_nll for r in lm_perplexity(docs_df).collect()}
    assert rows[6] < rows[0] < rows[5]


def test_plan_python_free(docs_df):
    df = lm_perplexity(docs_df, n=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bad_n_raises(docs_df):
    with pytest.raises(ValueError, match="n must be"):
        lm_perplexity(docs_df, n=3)


def test_external_bigram_counts_require_cond_counts(spark, docs_df):
    from duckdb_annsearch_spark.pipeline.lm import train_ngram_counts

    counts = train_ngram_counts(docs_df, n=2)
    with pytest.raises(ValueError, match="cond_counts"):
        lm_perplexity(docs_df, n=2, counts=counts)
