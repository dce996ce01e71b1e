"""Sampling / mixture-composition operators (pipeline/sample.py).

Ground truth is recomputed in plain Python over the collected table with
the same md5 hash, so every assertion is an exact set (not statistical)
check; the statistical checks only bound Bernoulli rates loosely.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from duckdb_annsearch_spark.pipeline.sample import (
    HASH_SPACE,
    hash_sample,
    quota_sample,
    stratified_sample,
    token_budget_mix,
)
from duckdb_annsearch_spark.pipeline.text import bpe_token_count


def _h(key, seed=0):
    return int(hashlib.md5(f"{key}#{seed}".encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_sample_hash_matches_python(spark, docs):
    rows = (
        docs.select(
            "doc_id",
            F.conv(
                F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#7"))), 1, 15),
                16,
                10,
            ).cast("long").alias("h"),
        )
        .limit(20)
        .collect()
    )
    for r in rows:
        assert r["h"] == _h(r["doc_id"], 7)
        assert 0 <= r["h"] < HASH_SPACE


def test_hash_sample_exact_membership(docs):
    ids = [r[0] for r in docs.select("doc_id").collect()]
    rate = 0.3
    expect = {i for i in ids if _h(i) < int(round(rate * HASH_SPACE))}
    got = {r[0] for r in hash_sample(docs, rate).select("doc_id").collect()}
    assert got == expect
    # determinism + seams: rate 0 / rate 1
    assert hash_sample(docs, 0.0).count() == 0
    assert hash_sample(docs, 1.0).count() == len(ids)
    # independent draw under another seed differs (statistically certain)
    got2 = {r[0] for r in hash_sample(docs, rate, seed=1).select("doc_id").collect()}
    assert got2 != got


def test_hash_sample_rate_bounds(docs):
    n = docs.count()
    k = hash_sample(docs, 0.5).count()
    assert 0.3 * n < k < 0.7 * n  # loose binomial bound


def test_stratified_sample_exact(docs):
    rates = {"en": 1.0, "zh": 0.4}
    rows = docs.select("doc_id", "lang").collect()
    thr = {g: int(round(r * HASH_SPACE)) for g, r in rates.items()}
    expect = {
        r["doc_id"]
        for r in rows
        if r["lang"] in rates and _h(r["doc_id"]) < thr[r["lang"]]
    }
    got = {
        r[0]
        for r in stratified_sample(docs, rates, group_col="lang")
        .select("doc_id")
        .collect()
    }
    assert got == expect
    # default_rate keeps strata missing from the dict
    all_langs = {r["lang"] for r in rows}
    kept_langs = {
        r[0]
        for r in stratified_sample(docs, {"en": 0.0}, default_rate=1.0)
        .select("lang")
        .distinct()
        .collect()
    }
    assert kept_langs == all_langs - {"en"}


def test_stratified_rate_validation(docs):
    with pytest.raises(ValueError):
        stratified_sample(docs, {"en": 1.5})


def _quota_expect(rows, quotas, seed=0):
    by_g = {}
    for r in rows:
        by_g.setdefault(r["lang"], []).append(r["doc_id"])
    expect = set()
    for g, ids in by_g.items():
        q = quotas if isinstance(quotas, int) else quotas.get(g, 0)
        ids.sort(key=lambda i: (_h(i, seed), i))
        expect.update(ids[:q])
    return expect


def test_quota_sample_exact_per_stratum(docs):
    rows = docs.select("doc_id", "lang").collect()
    quotas = {"en": 25, "de": 10, "zh": 100000}
    out = quota_sample(docs, quotas, group_col="lang")
    got = {r[0] for r in out.select("doc_id").collect()}
    assert got == _quota_expect(rows, quotas)
    # int quota applies to every stratum
    got5 = quota_sample(docs, 5, group_col="lang")
    cnt = {r[0]: r[1] for r in got5.groupBy("lang").count().collect()}
    assert all(v == 5 for v in cnt.values()) and len(cnt) == 5


def test_quota_sample_presample_path_equals_full(docs):
    rows = docs.select("doc_id", "lang").collect()
    quotas = {"en": 8, "es": 3}
    out = quota_sample(
        docs, quotas, group_col="lang", presample_above=10, safety=8.0
    )
    assert {r[0] for r in out.select("doc_id").collect()} == _quota_expect(
        rows, quotas
    )


def test_quota_sample_presample_insufficient_raises(docs):
    # safety far below 1 retains ~safety*quota rows << quota: must refuse
    # rather than silently return a short (and different) answer
    with pytest.raises(RuntimeError, match="presample"):
        quota_sample(
            docs, {"en": 50}, group_col="lang", presample_above=10, safety=0.05
        )


def test_quota_sample_monotone_under_growth(docs):
    """A kept row survives corpus growth unless displaced by a smaller
    hash: quota winners of a SUBSET are a superset of the full-corpus
    winners restricted to that subset... equivalently, full-corpus winners
    that belong to the subset are exactly the subset's smallest hashes."""
    quotas = {"en": 10}
    full = {r[0] for r in quota_sample(docs, quotas, group_col="lang").select("doc_id").collect()}
    half = docs.where(F.col("doc_id") % 2 == 0)
    half_win = {r[0] for r in quota_sample(half, quotas, group_col="lang").select("doc_id").collect()}
    # every full-corpus winner that is in the half-corpus also wins there
    assert (full & {r[0] for r in half.select("doc_id").collect()}) <= half_win


def _budget_expect(rows, budgets, seed=0):
    by_g = {}
    for r in rows:
        by_g.setdefault(r["lang"], []).append((r["doc_id"], r["nt"]))
    keep = {}
    for g, items in by_g.items():
        if g not in budgets:
            continue
        items.sort(key=lambda t: (_h(t[0], seed), t[0]))
        cum = 0
        for i, nt in items:
            cum += nt
            if cum > budgets[g]:
                break
            keep[i] = cum
    return keep


@pytest.fixture(scope="module")
def docs_nt(docs):
    return docs.select(
        "doc_id", "lang", bpe_token_count(F.col("text")).alias("nt")
    ).collect()


def test_token_budget_mix_exact(docs, docs_nt):
    budgets = {"en": 800, "fr": 300}
    expect = _budget_expect(docs_nt, budgets)
    out = token_budget_mix(docs, budgets, group_col="lang")
    got = {r["doc_id"]: r["cum_tokens"] for r in out.select("doc_id", "cum_tokens").collect()}
    assert got == expect
    # budgets smaller than any single doc select nothing, not a partial doc
    tiny = token_budget_mix(docs, {"en": 1}, group_col="lang")
    assert tiny.count() == 0


def test_token_budget_mix_presample_path(docs, docs_nt):
    budgets = {"en": 500, "zh": 400}
    expect = _budget_expect(docs_nt, budgets)
    out = token_budget_mix(
        docs, budgets, group_col="lang", presample_above=10, safety=4.0
    )
    got = {r["doc_id"]: r["cum_tokens"] for r in out.collect()}
    assert got == expect


def test_token_budget_mix_presample_insufficient_raises(docs):
    with pytest.raises(RuntimeError, match="presample"):
        token_budget_mix(
            docs,
            {"en": 10_000_000},  # budget >> corpus: prefix can't overflow it
            group_col="lang",
            presample_above=10,
            safety=0.001,  # ...and the presample drops rows
        )


def test_zero_quota_and_budget_strata_are_cut_before_the_window(docs):
    """A zero quota/budget stratum contributes nothing AND never reaches
    the rank window (map-only cut) — including on the presample path,
    where a zero target would otherwise make the prefix-sufficiency check
    raise spuriously."""
    out = quota_sample(docs, {"en": 5, "zh": 0}, group_col="lang")
    assert {r[0] for r in out.select("lang").distinct().collect()} == {"en"}
    assert quota_sample(docs, 0, group_col="lang").count() == 0
    mix = token_budget_mix(
        docs, {"en": 0, "zh": 400}, group_col="lang",
        presample_above=10, safety=4.0,  # 'en' would have presampled at rate 0
    )
    assert {r[0] for r in mix.select("lang").distinct().collect()} == {"zh"}


def test_null_text_and_null_key_handling(spark):
    rows = [
        (1, "the cat sat", "en"),
        (2, None, "en"),        # NULL text: 0 tokens, admitted for free
        (None, "the dog ran", "en"),  # NULL key: dropped on every path
        (3, "a b c d e f g h", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    mix = token_budget_mix(df, {"en": 1000}, group_col="lang")
    got = {r["doc_id"]: r["n_tokens"] for r in mix.collect()}
    assert None not in got and got[2] == 0 and set(got) == {1, 2, 3}
    q = quota_sample(df, 10, group_col="lang")
    assert {r["doc_id"] for r in q.collect()} == {1, 2, 3}
    assert hash_sample(df, 1.0).count() == 3  # NULL key never samples in


def test_sampling_plans_are_python_free(docs):
    """Bernoulli stages must stay JVM-side map-only filters (no shuffle,
    no Python), and the quota window must be the only exchange."""
    plan = stratified_sample(docs, {"en": 0.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
    qplan = quota_sample(docs, 5, group_col="lang")._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in qplan


class TestTemperature:
    def _df(self, spark):
        rows = []
        i = 0
        for lang, n in [("en", 40), ("de", 10), ("fr", 5)]:
            for _ in range(n):
                rows.append((i, lang, "tok " * 10))
                i += 1
        rows.append((i, None, "null lang row"))
        return spark.createDataFrame(rows, "doc_id long, lang string, text string")

    def test_weights_math(self, spark):
        from duckdb_annsearch_spark.pipeline.sample import temperature_weights

        df = self._df(spark)
        out = {r["lang"]: r for r in temperature_weights(
            df, total_budget=300, alpha=0.5, counter=lambda c: F.lit(10)
        ).collect()}
        assert set(out) == {"en", "de", "fr"}  # NULL stratum excluded
        import math

        toks = {"en": 400, "de": 100, "fr": 50}
        z = sum(math.sqrt(v) for v in toks.values())
        for g, t in toks.items():
            assert out[g]["n_tokens"] == t
            assert out[g]["p_raw"] == pytest.approx(t / 550, abs=1e-6)
            assert out[g]["p_temp"] == pytest.approx(math.sqrt(t) / z, abs=1e-6)
            assert out[g]["budget"] == int(300 * math.sqrt(t) / z + 0.5)
        # alpha=0.5 flattens: fr's share rises above natural, en's falls
        assert out["fr"]["p_temp"] > out["fr"]["p_raw"]
        assert out["en"]["p_temp"] < out["en"]["p_raw"]

    def test_alpha_one_is_natural(self, spark):
        from duckdb_annsearch_spark.pipeline.sample import temperature_weights

        out = temperature_weights(
            self._df(spark), 100, alpha=1.0, counter=lambda c: F.lit(10)
        ).collect()
        for r in out:
            assert r["p_temp"] == pytest.approx(r["p_raw"], abs=1e-6)

    def test_mix_respects_budgets_and_determinism(self, spark):
        from duckdb_annsearch_spark.pipeline.sample import (
            temperature_mix,
            temperature_weights,
        )

        df = self._df(spark)
        cnt = lambda c: F.lit(10)  # noqa: E731
        w = {r["lang"]: r for r in temperature_weights(
            df, 300, alpha=0.5, counter=cnt
        ).collect()}
        out = temperature_mix(df, 300, alpha=0.5, counter=cnt)
        got = out.groupBy("lang").count().collect()
        for r in got:
            # each stratum fills its budget (10 tokens/doc) or is whole
            expect = min(w[r["lang"]]["budget"] // 10, {"en": 40, "de": 10, "fr": 5}[r["lang"]])
            assert r["count"] == expect, r
        # determinism: same seed -> identical membership
        a = {r["doc_id"] for r in out.collect()}
        b = {r["doc_id"] for r in temperature_mix(df, 300, alpha=0.5, counter=cnt).collect()}
        assert a == b

    def test_upsample_stratum_taken_whole(self, spark):
        from duckdb_annsearch_spark.pipeline.sample import (
            temperature_mix,
            temperature_weights,
        )

        df = self._df(spark)
        cnt = lambda c: F.lit(10)  # noqa: E731
        w = {r["lang"]: r for r in temperature_weights(
            df, 2000, alpha=0.1, counter=cnt
        ).collect()}
        assert w["fr"]["epochs"] > 1  # low-resource stratum upsampled
        out = temperature_mix(df, 2000, alpha=0.1, counter=cnt)
        assert out.where(F.col("lang") == "fr").count() == 5  # whole, no dup

    def test_validation(self, spark):
        from duckdb_annsearch_spark.pipeline.sample import temperature_weights

        with pytest.raises(ValueError):
            temperature_weights(self._df(spark), -1)
        with pytest.raises(ValueError):
            temperature_weights(self._df(spark), 10, alpha=-0.1)
