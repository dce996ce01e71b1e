"""Deterministic corpus sampling and mixture composition.

The data-mixing stage of a training pipeline: down/up-weight strata
(language, source domain, quality band) by rate, by row quota, or by token
budget.  All selection is keyed on a deterministic 60-bit md5 hash of
``(key, seed)`` so results are reproducible across runs, engines (the
DuckDB oracle replicates the hash bit-for-bit), and *incremental loads* —
a row's fate never depends on which other rows are present (Bernoulli
stages) or only on its hash rank within its stratum (quota/budget stages).

Scale design (the part that matters at 100 TB):

- ``hash_sample`` / ``stratified_sample`` are map-only row filters — no
  shuffle, no state; they push down to the scan like any other predicate.
- ``quota_sample`` / ``token_budget_mix`` need a per-stratum rank /
  running sum, which is a window over the stratum — and a naive window
  funnels the WHOLE stratum through one task.  Both therefore presample
  first: selection-by-hash-rank means the answer lives entirely inside the
  smallest-hash *prefix* of the stratum, so a map-only ``hash < t``
  filter with a safety margin bounds the window's input to
  O(safety x quota) rows per stratum regardless of stratum size.  Both
  stages compare and order by the SAME full hash, so the presample is a
  true prefix superset and the final answer is provably identical to the
  full-stratum computation whenever the margin held — which is verified
  exactly (one aggregate over the presampled rows) and raises loudly if a
  pathological hash distribution ever breached it.

Strata are assumed few (languages, source domains — tens to thousands):
per-stratum totals are collected to the driver to plan the presample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from duckdb_annsearch_spark.pipeline.text import bpe_token_count, token_hash

# Full range of the 60-bit hash. Rates are applied as `hash < rate * SPACE`
# so a rate filter selects a *prefix* of the hash order — the property the
# quota/budget presample correctness argument rests on.
HASH_SPACE = 1 << 60


def sample_hash(key: Column, seed: int = 0) -> Column:
    """Deterministic uniform 60-bit hash of ``(key, seed)`` — ``token_hash``
    (the package's one cross-engine md5 hash) over ``"{key}#{seed}"``, so
    the DuckDB oracle reproduces it exactly:
    ``('0x' || substr(md5(key::VARCHAR || '#seed'), 1, 15))::BIGINT``.
    A NULL key hashes to NULL and is dropped by every comparison below —
    NULL-keyed rows never sample in (uniformly on all paths)."""
    return token_hash(F.concat(key.cast("string"), F.lit(f"#{int(seed)}")))


def _per_group_lit(mapping: dict[str, int], default: int, group_col: str) -> Column:
    """Per-stratum integer literal: ``mapping[group]`` else ``default``
    (NULL group gets ``default`` too).  Folded in sorted key order so the
    plan's canonical string is stable across runs."""
    out: Column = F.lit(int(default))
    for g in sorted(mapping, reverse=True):
        out = F.when(F.col(group_col) == g, F.lit(int(mapping[g]))).otherwise(out)
    return out


def _rate_threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"sampling rate must be in [0, 1], got {rate}")
    return int(round(rate * HASH_SPACE))


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff
    ``hash(key, seed) < rate * 2^60``.  Map-only — no shuffle, stable under
    re-runs and incremental corpus growth; change ``seed`` for an
    independent draw."""
    return df.where(sample_hash(F.col(key_col), seed) < _rate_threshold(rate))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli rates (corpus mixing by proportion): e.g.
    ``{"en": 0.5, "zh": 1.0}`` keeps half of English and all of Chinese.
    Strata absent from ``rates`` (and NULL strata) get ``default_rate``.
    Map-only."""
    thr = _per_group_lit(
        {g: _rate_threshold(r) for g, r in rates.items()},
        _rate_threshold(default_rate),
        group_col,
    )
    return df.where(sample_hash(F.col(key_col), seed) < thr)


def _group_quota(quotas: dict[str, int] | int, group: str) -> int:
    q = quotas if isinstance(quotas, int) else quotas.get(group, 0)
    if q < 0:
        raise ValueError(f"quota for stratum {group!r} is negative: {q}")
    return int(q)


def _plan_presample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    seed: int,
    rate_for: dict[str, float],
) -> DataFrame:
    """Map-only prefix filter: per-stratum ``hash < rate * SPACE`` for the
    strata in ``rate_for``, pass-through for the rest."""
    if not rate_for:
        return df
    thr = _per_group_lit(
        {g: _rate_threshold(r) for g, r in rate_for.items()},
        HASH_SPACE,  # keep everything by default
        group_col,
    )
    return df.where(sample_hash(F.col(key_col), seed) < thr)


def quota_sample(
    df: DataFrame,
    quotas: dict[str, int] | int,
    group_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 0,
    presample_above: int = 100_000,
    safety: float = 8.0,
) -> DataFrame:
    """Exactly ``min(quota, |stratum|)`` rows per stratum — the
    smallest-hash prefix, so membership is deterministic and *monotone*
    under corpus growth (a kept row is only ever displaced by a new row
    with a smaller hash, never by reordering).  ``quotas`` is a per-stratum
    dict or one int for all strata; strata not in the dict contribute
    nothing.

    Strata larger than ``presample_above`` are first cut by a map-only
    hash-prefix filter sized ``safety * quota / count`` so the exact rank
    window sees O(safety x quota) rows, not the stratum (see module
    docstring); prefix sufficiency is verified exactly and raises if the
    safety margin were ever breached (at the default 8x the probability is
    astronomically small — a binomial lower tail at 8x its mean).
    """
    # zero-quota strata (and NULL strata / NULL keys) are cut map-only up
    # front — never funneled through the rank window just to be discarded
    base = df.where(F.col(group_col).isNotNull() & F.col(key_col).isNotNull())
    if not isinstance(quotas, int):
        base = base.where(
            F.col(group_col).isin(
                [g for g in quotas if _group_quota(quotas, g) > 0]
            )
        )
    elif _group_quota(quotas, "") == 0:  # int 0: validate sign, empty result
        return base.where(F.lit(False))
    counts = {r[0]: r[1] for r in base.groupBy(group_col).count().collect()}
    quota_of = {g: _group_quota(quotas, g) for g in counts}
    big = {
        g: min(1.0, safety * quota_of[g] / counts[g])
        for g in counts
        if counts[g] > presample_above and quota_of[g] > 0
    }
    pre = _plan_presample(base, group_col, key_col, seed, big)
    if big:
        # exact sufficiency check: the prefix must still hold >= the target
        # row count for every presampled stratum, else the rank below would
        # silently return a different (shorter) answer than the full stratum
        got = {
            r[0]: r[1]
            for r in pre.where(F.col(group_col).isin(list(big)))
            .groupBy(group_col)
            .count()
            .collect()
        }
        for g in big:
            need = min(quota_of[g], counts[g])
            if got.get(g, 0) < need:
                raise RuntimeError(
                    f"quota_sample presample for stratum {g!r} retained "
                    f"{got.get(g, 0)} < {need} rows; raise safety= (got "
                    f"{safety}) or presample_above="
                )
    w = Window.partitionBy(group_col).orderBy(
        sample_hash(F.col(key_col), seed), F.col(key_col)
    )
    quota_col: Column = (
        F.lit(int(quotas))
        if isinstance(quotas, int)
        else _per_group_lit({g: int(q) for g, q in quotas.items()}, 0, group_col)
    )
    return (
        pre.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= quota_col)
        .drop("__rk")
    )


def token_budget_mix(
    df: DataFrame,
    budgets: dict[str, int],
    text_col: str = "text",
    group_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 0,
    presample_above: int = 100_000,
    safety: float = 4.0,
    counter=bpe_token_count,
) -> DataFrame:
    """Compose a training mixture by per-stratum TOKEN budget (the unit
    mixtures are actually specified in): within each stratum, walk
    documents in hash order and keep while the running token total stays
    <= the budget.  Adds ``n_tokens`` (per-doc count from ``counter``,
    default the BPE-piece proxy) and ``cum_tokens`` (the running total that
    admitted the row).  Strata absent from ``budgets`` contribute nothing.
    A document larger than the remaining budget ends its stratum's intake
    (keep-while-prefix-fits; no skip-ahead, so membership stays a pure
    hash-prefix property).

    Strata larger than ``presample_above`` rows are prefix-presampled at
    ``safety * budget / total_tokens`` (see module docstring).  Prefix
    sufficiency — the presampled prefix either already overflows the
    budget or is the whole stratum — is verified exactly and raises
    otherwise."""
    for g, b in budgets.items():
        if b < 0:
            raise ValueError(f"token budget for stratum {g!r} is negative: {b}")
    # NULL text counts as 0 tokens (admitted for free, explicitly); NULL
    # keys and zero-budget strata are cut map-only up front — a zero
    # budget admits nothing, so its stratum must not reach the window
    # (and its presample rate would be 0, which can never be "sufficient")
    n_tok = F.coalesce(counter(F.col(text_col)).cast("long"), F.lit(0))
    base = (
        df.where(
            F.col(key_col).isNotNull()
            & F.col(group_col).isin([g for g, b in budgets.items() if b > 0])
        )
        .withColumn("n_tokens", n_tok)
    )
    totals = {
        r[0]: (r[1], r[2])
        for r in base.groupBy(group_col)
        .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("tok"))
        .collect()
    }
    big = {}
    for g, (n, tok) in totals.items():
        if n > presample_above and tok and tok > 0:
            big[g] = min(1.0, safety * budgets[g] / tok)
    pre = _plan_presample(base, group_col, key_col, seed, big)
    if big:
        got = {
            r[0]: (r[1], r[2])
            for r in pre.where(F.col(group_col).isin(list(big)))
            .groupBy(group_col)
            .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("tok"))
            .collect()
        }
        for g in big:
            n_pre, tok_pre = got.get(g, (0, 0))
            # exact iff the prefix overflows the budget (cutoff falls
            # strictly inside it) or nothing was actually dropped
            if not (tok_pre > budgets[g] or n_pre == totals[g][0]):
                raise RuntimeError(
                    f"token_budget_mix presample for stratum {g!r} retained "
                    f"{tok_pre} tokens <= budget {budgets[g]} while dropping "
                    f"rows; raise safety= (got {safety}) or presample_above="
                )
    w = (
        Window.partitionBy(group_col)
        .orderBy(sample_hash(F.col(key_col), seed), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget_col = _per_group_lit({g: int(b) for g, b in budgets.items()}, 0, group_col)
    return (
        pre.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= budget_col)
    )


def temperature_weights(
    df: DataFrame,
    total_budget: int,
    alpha: float = 0.3,
    text_col: str = "text",
    group_col: str = "lang",
    counter=bpe_token_count,
) -> DataFrame:
    """Temperature-based mixture weights (the multilingual-sampling rule
    of mBERT/XLM-R/mT5, e.g. arXiv:2010.11934 §3.1): allocate a
    ``total_budget`` of tokens across strata proportionally to
    ``n_i^alpha`` — ``alpha=1`` reproduces the natural distribution,
    ``alpha -> 0`` flattens toward uniform, the mT5 default is 0.3.

    One aggregation job emitting a STRATA-SIZED report (languages /
    source domains — tens to thousands of rows): ``(group_col, n_docs,
    n_tokens, p_raw, p_temp, budget, epochs)`` where ``p_temp =
    n_tokens^alpha / sum_j n_tokens_j^alpha``, ``budget`` is the
    allocated token count, and ``epochs = budget / n_tokens`` tells the
    trainer how often the stratum repeats (> 1 — the paper's upsampling
    of low-resource strata — means the corpus must be epoch-repeated or
    the shortfall redistributed; this operator reports, the caller
    decides).  Rows with a NULL stratum are excluded (route them
    first).  ``p_raw``/``p_temp``/``epochs`` are rounded to 6.

    Cost: the per-stratum aggregate is the only corpus-sized work (one
    partial-aggregating groupBy); the normalization window runs over the
    strata report itself.
    """
    if total_budget < 0:
        raise ValueError(f"total_budget must be >= 0, got {total_budget}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    n_tok = F.coalesce(counter(F.col(text_col)).cast("long"), F.lit(0))
    stats = (
        df.where(F.col(group_col).isNotNull())
        .select(F.col(group_col), n_tok.alias("_t"))
        .groupBy(group_col)
        .agg(F.count("*").alias("n_docs"), F.sum("_t").alias("n_tokens"))
    )
    # the window below runs over the strata-sized report, not the corpus;
    # the constant non-foldable key keeps WindowExec from logging its
    # single-partition warning (the single group is the point here)
    from duckdb_annsearch_spark.operators.hybrid import constant_partition_key

    everything = Window.partitionBy(constant_partition_key("n_docs"))
    powed = F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    p_raw = F.col("n_tokens") / F.sum("n_tokens").over(everything)
    p_temp = powed / F.sum(powed).over(everything)
    budget = F.floor(F.lit(int(total_budget)) * p_temp + F.lit(0.5)).cast("long")
    return stats.select(
        group_col,
        "n_docs",
        "n_tokens",
        F.round(p_raw, 6).alias("p_raw"),
        F.round(p_temp, 6).alias("p_temp"),
        budget.alias("budget"),
        F.round(
            F.when(F.col("n_tokens") > 0, budget / F.col("n_tokens")), 6
        ).alias("epochs"),
    )


def temperature_mix(
    df: DataFrame,
    total_budget: int,
    alpha: float = 0.3,
    text_col: str = "text",
    group_col: str = "lang",
    key_col: str = "doc_id",
    seed: int = 0,
    presample_above: int = 100_000,
    safety: float = 4.0,
    counter=bpe_token_count,
) -> DataFrame:
    """Compose the temperature mixture in one call: compute
    :func:`temperature_weights` budgets, then select documents through
    :func:`token_budget_mix` (hash-prefix membership, presampled windows
    — all the determinism and scale properties of that operator).  A
    stratum whose budget exceeds its size is taken whole; the epochs
    column of :func:`temperature_weights` is how the trainer learns to
    repeat it — selection cannot duplicate rows.

    The strata report is collected to the driver to parameterize the
    selection — strata are few by construction (module docstring).
    """
    budgets = {
        r[0]: int(r["budget"])
        for r in temperature_weights(
            df, total_budget, alpha, text_col, group_col, counter
        ).collect()
    }
    return token_budget_mix(
        df,
        budgets,
        text_col=text_col,
        group_col=group_col,
        key_col=key_col,
        seed=seed,
        presample_above=presample_above,
        safety=safety,
        counter=counter,
    )
