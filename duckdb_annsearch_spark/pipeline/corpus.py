"""End-to-end training-corpus preparation: the composition the pipeline
operators exist for (SURVEY §7.1 M9) — language filter → quality floor →
deduplication — in one partition-parallel pass shape.

Each stage is a declarative DataFrame transform: langid and quality are
per-row expressions (map-only), exact dedup is one hash-keyed window,
MinHash-LSH dedup drops every member of a duplicate cluster except its
smallest id (connected components approximated by min-pair propagation:
b is dropped whenever some a<b shares an LSH band AND verified jaccard ≥
threshold — the standard candidate+verify contract)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_annsearch_spark.pipeline.dedup import (
    dedup_exact,
    dedup_fuzzy,
    ngram_jaccard_pairs,
)
from duckdb_annsearch_spark.pipeline.text import detect_language, quality_score


def prepare_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    dedup: str = "exact",
    jaccard_threshold: float = 0.8,
    scrub: bool = False,
    max_dup_token_frac: float | None = None,
    benchmark: DataFrame | None = None,
    decontaminate_n: int = 8,
    boilerplate_min_df: int | None = None,
    max_dup_ngram_frac: float | None = None,
    dup_ngram_k: int = 8,
    max_avg_nll: float | None = None,
    cut_dup_spans_k: int | None = None,
    c4_rules: bool = False,
    gopher_rules: bool = False,
    gopher_thresholds: dict | None = None,
) -> DataFrame:
    """Filtered + deduplicated corpus, original schema plus ``lang`` and
    ``quality`` columns.  ``dedup``: 'exact' | 'near' | 'fuzzy' | 'none'
    ('near' drops direct-pair losers — one posting-list join; 'fuzzy' runs
    the full MinHash-LSH → verify → connected-components pipeline, so
    transitive chains A~B~C collapse to one survivor).

    Hygiene stages (pipeline/quality.py), all optional: ``scrub=True``
    replaces PII in ``text_col`` with typed placeholders BEFORE any other
    stage (scores and dedup keys see the scrubbed text — two copies of a
    document differing only in the PII they leak are duplicates);
    ``max_dup_token_frac`` drops repetition spam (Gopher rule);
    ``benchmark`` drops any document sharing a ``decontaminate_n``-gram
    with it (test-set decontamination).

    Round-5 stages, all default-off: ``boilerplate_min_df`` strips lines
    appearing in that many docs (line-level dedup) BEFORE any scoring —
    quality/dedup then judge the content, not the banner;
    ``max_dup_ngram_frac`` drops documents whose duplicated-``dup_ngram_k``-gram
    share exceeds the threshold (ExactSubstr-style); ``max_avg_nll``
    drops the high-perplexity tail under a self-trained unigram LM
    (CCNet shape — pass a reference-corpus model via
    :func:`~duckdb_annsearch_spark.pipeline.lm.lm_perplexity` directly
    for the full CCNet deployment).

    ``cut_dup_spans_k`` (default off) runs ExactSubstr-style span
    REMOVAL (:func:`~duckdb_annsearch_spark.pipeline.spans.remove_dup_spans`)
    after boilerplate stripping: duplicated token spans of that length
    are cut out of the text (the text is then in canonical
    single-space-joined form), the surgical alternative to dropping
    whole documents via ``max_dup_ngram_frac``.

    ``c4_rules``/``gopher_rules`` (default off) prepend the published
    rule-based filters (pipeline/filters.py): C4 line surgery rewrites
    ``text_col`` FIRST so every later stage judges the cleaned content;
    the Gopher document rules then drop failing rows
    (``gopher_thresholds`` overrides the paper defaults)."""
    out = df
    if c4_rules:
        # C4 line surgery first: it rewrites text_col, so every later
        # stage (scores, dedup keys, LM) judges the cleaned content
        from duckdb_annsearch_spark.pipeline.filters import c4_filter

        out = c4_filter(out, text_col)
    if gopher_rules:
        from duckdb_annsearch_spark.pipeline.filters import gopher_filter

        out = gopher_filter(out, text_col, **(gopher_thresholds or {}))
    if scrub:
        from duckdb_annsearch_spark.pipeline.quality import scrub_pii

        out = out.withColumn(text_col, scrub_pii(F.col(text_col)))
    if boilerplate_min_df is not None:
        from duckdb_annsearch_spark.pipeline.lines import line_dedup

        cleaned = line_dedup(out, text_col, id_col, min_df=boilerplate_min_df)
        out = (
            out.drop(text_col)
            .join(cleaned.select(id_col, text_col), id_col)
        )
    if cut_dup_spans_k is not None:
        from duckdb_annsearch_spark.pipeline.spans import remove_dup_spans

        cut = remove_dup_spans(out, text_col, id_col, k=cut_dup_spans_k)
        out = (
            out.drop(text_col)
            .join(cut.select(id_col, text_col), id_col)
        )
    if max_dup_ngram_frac is not None:
        from duckdb_annsearch_spark.pipeline.dedup import dup_ngram_stats

        ok = dup_ngram_stats(out, text_col, id_col, k=dup_ngram_k).where(
            F.coalesce(F.col("dup_frac"), F.lit(0.0)) <= float(max_dup_ngram_frac)
        ).select(id_col)
        out = out.join(ok, id_col, "left_semi")
    if max_avg_nll is not None:
        from duckdb_annsearch_spark.pipeline.lm import lm_perplexity

        fluent = lm_perplexity(out, text_col, id_col).where(
            F.coalesce(F.col("avg_nll"), F.lit(0.0)) <= float(max_avg_nll)
        ).select(id_col)
        out = out.join(fluent, id_col, "left_semi")
    if max_dup_token_frac is not None:
        from duckdb_annsearch_spark.pipeline.quality import dup_token_fraction

        out = out.where(
            dup_token_fraction(F.col(text_col)) <= float(max_dup_token_frac)
        )
    if benchmark is not None:
        from duckdb_annsearch_spark.pipeline.quality import decontaminate

        bench = benchmark
        if scrub:
            # the corpus side was scrubbed above — scrub the benchmark
            # identically, or n-grams overlapping a PII span would never
            # collide and contaminated docs would slip through
            from duckdb_annsearch_spark.pipeline.quality import scrub_pii

            bench = benchmark.withColumn(text_col, scrub_pii(F.col(text_col)))
        clean = decontaminate(
            out, bench, id_col, text_col, n=decontaminate_n
        ).where(~F.col("contaminated")).select(id_col)
        out = out.join(clean, on=id_col, how="left_semi")
    out = out.withColumn("lang", detect_language(F.col(text_col))).withColumn(
        "quality", quality_score(F.col(text_col))  # already rounded to 6
    )
    if langs:
        out = out.where(F.col("lang").isin(list(langs)))
    out = out.where(F.col("quality") >= min_quality)
    if dedup == "exact":
        out = dedup_exact(out, text_col, id_col)
    elif dedup == "near":
        pairs = ngram_jaccard_pairs(out, text_col, id_col, jaccard_threshold)
        losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
        out = out.join(losers, on=id_col, how="left_anti")
    elif dedup == "fuzzy":
        losers = (
            dedup_fuzzy(out, text_col, id_col, threshold=jaccard_threshold)
            .where(~F.col("keep"))
            .select(id_col)
        )
        # no forced broadcast: the loser set scales with the corpus's
        # duplicate rate; Catalyst auto-broadcasts when it is small
        out = out.join(losers, on=id_col, how="left_anti")
    elif dedup != "none":
        raise ValueError(f"unknown dedup mode {dedup!r}")
    return out
