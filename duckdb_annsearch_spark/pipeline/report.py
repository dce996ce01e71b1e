"""Curation funnel reporting: which stage drops how much of the corpus.

Every pipeline run wants this audit (threshold tuning is impossible
without it), and the naive implementation — run each stage, count, run
the next — pays one corpus pass PER STAGE.  :func:`funnel` instead
annotates each document with the FIRST stage that would drop it (one
chained CASE expression over per-row predicates, plus data-sized left
joins for set-based stages) and aggregates once: the whole report is a
single corpus pass + one strata-sized groupBy, at any number of stages.

Semantics: stages are ordered; a document counts against the first
stage whose keep-condition it fails (the same attribution a sequential
pipeline would produce).  A NULL keep-condition counts as a drop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from duckdb_annsearch_spark.pipeline.text import bpe_token_count

KEPT = "kept"


def funnel(
    df: DataFrame,
    stages: list[tuple[str, Column | DataFrame]],
    text_col: str = "text",
    id_col: str = "doc_id",
    counter=bpe_token_count,
) -> DataFrame:
    """``(stage, stage_order, n_docs, n_tokens, pct_docs)`` — one row per
    stage that dropped anything plus a ``'kept'`` row (stage_order =
    position in ``stages``; kept = len(stages)).

    Each stage is ``(name, keep)`` where ``keep`` is either a boolean
    Column (per-row rule — quality floors, language filters, Gopher/C4
    keeps) or a DataFrame whose ``id_col`` lists the SURVIVORS of a
    set-based stage (dedup winners, decontamination passes) — joined as
    a data-sized flag, never collected.

    ``n_tokens`` counts ``counter`` over ``text_col`` (NULL text = 0);
    ``pct_docs`` is the stage's share of the input, rounded to 6."""
    if not stages:
        raise ValueError("funnel needs at least one stage")
    names = [n for n, _ in stages]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate stage names: {names}")
    if KEPT in names:
        raise ValueError(
            f"stage name {KEPT!r} is reserved for the survivors row"
        )
    out = df
    keeps: list[tuple[str, Column]] = []
    for i, (name, keep) in enumerate(stages):
        if isinstance(keep, DataFrame):
            flag = f"__keep_{i}"
            ids = (
                keep.select(F.col(id_col))
                .distinct()
                .withColumn(flag, F.lit(True))
            )
            out = out.join(ids, id_col, "left")
            keeps.append((name, F.coalesce(F.col(flag), F.lit(False))))
        else:
            keeps.append((name, keep))
    expr = None
    for name, k in keeps:
        cond = ~F.coalesce(k, F.lit(False))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    stage_col = expr.otherwise(KEPT)
    order = F.lit(len(stages))
    for i, name in enumerate(reversed(names)):
        order = F.when(F.col("stage") == name, len(names) - 1 - i).otherwise(
            order
        )
    n_tok = F.coalesce(counter(F.col(text_col)).cast("long"), F.lit(0))
    report = (
        out.select(stage_col.alias("stage"), n_tok.alias("__t"))
        .groupBy("stage")
        .agg(F.count("*").alias("n_docs"), F.sum("__t").alias("n_tokens"))
    )
    # report is stages-sized, not corpus-sized; constant non-foldable key
    # silences WindowExec's single-partition warning (single group intended)
    from duckdb_annsearch_spark.operators.hybrid import constant_partition_key

    total = Window.partitionBy(constant_partition_key("n_docs"))
    return report.select(
        "stage",
        order.cast("int").alias("stage_order"),
        "n_docs",
        "n_tokens",
        F.round(F.col("n_docs") / F.sum("n_docs").over(total), 6).alias(
            "pct_docs"
        ),
    )


def corpus_funnel(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: tuple[str, ...] | None = ("en",),
    min_quality: float | None = 0.3,
    gopher: bool = False,
    gopher_thresholds: dict | None = None,
    c4: bool = False,
    dedup: str = "exact",
) -> DataFrame:
    """The standard curation stages as a one-pass funnel, attribution
    matching :func:`~duckdb_annsearch_spark.pipeline.corpus.prepare_corpus`
    order — C4 line surgery FIRST (it rewrites the text, so every later
    stage judges the cleaned content), then the Gopher rules, then
    language and quality, then dedup.  The dedup stage is computed among
    documents surviving the per-row stages, over the SAME (cleaned when
    ``c4=True``) text a sequential pipeline would key on, so the loser
    set matches.  ``n_tokens`` always counts the ORIGINAL text (the
    funnel reports what each stage removes from the input corpus)."""
    from duckdb_annsearch_spark.pipeline.text import (
        detect_language,
        quality_score,
    )

    t = F.col(text_col)
    row_stages: list[tuple[str, Column | DataFrame]] = []
    if c4:
        from duckdb_annsearch_spark.pipeline.filters import c4_stats

        st = c4_stats(t)
        work = st["clean_text"]
        row_stages.append(("c4", st["keep"]))
    else:
        work = t
    if gopher:
        from duckdb_annsearch_spark.pipeline.filters import gopher_keep_col

        # single bound expression: the stats struct evaluates once per row
        # (gopher_keep over the stats dict re-evaluated it per rule — r9)
        row_stages.append(
            ("gopher", gopher_keep_col(work, **(gopher_thresholds or {})))
        )
    if langs is not None:
        row_stages.append(("lang", detect_language(work).isin(list(langs))))
    if min_quality is not None:
        row_stages.append(
            ("quality", quality_score(work) >= float(min_quality))
        )
    stages = list(row_stages)
    if dedup == "exact":
        from duckdb_annsearch_spark.pipeline.dedup import dedup_exact

        pre = df
        for _, keep in row_stages:
            pre = pre.where(F.coalesce(keep, F.lit(False)))
        if c4:
            # dedup keys must see the text the sequential pipeline would
            # carry at this point: the C4-cleaned form (the predicates
            # above were already applied against the original rows)
            pre = pre.withColumn(text_col, work)
        stages.append(
            ("exact_dup", dedup_exact(pre, text_col, id_col).select(id_col))
        )
    elif dedup != "none":
        raise ValueError(f"unknown funnel dedup mode {dedup!r}")
    return funnel(df, stages, text_col=text_col, id_col=id_col)
