"""Rule-based corpus quality filters: the Gopher/MassiveText document
rules (arXiv:2112.11446 Table A1) and the C4 line/document cleaning rules
(arXiv:1910.10683 §2.2).

These are the standard first-pass heuristic filters of a pretraining data
pipeline — cheap, per-document, and deliberately conservative.  No
reference twin (the reference engine stops at vector/FTS search); the rule
sets are published practice.

Scale design: every rule here is a pure JVM column expression over one
document — map-only, no shuffle, no Python.  At 100 TB the whole stage is
a single scan that Catalyst fuses with adjacent projections; the filters
push down to the parquet reader like any other predicate.

Cross-engine determinism contract (same as pipeline/text.py): words are
non-empty ``\\s+`` splits, lines are ``\\n`` splits, every regex is
RE2-compatible, counts are exact integers, and ratios are double-divided
then compared — so the DuckDB oracle reproduces each stat bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duckdb_annsearch_spark.pipeline.text import bind

# Gopher's required-word list (arXiv:2112.11446 A1.1: "contains at least
# two of the following English words") — kept verbatim.
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# Bullet prefixes / ellipsis suffix the line-shape rules look for.  ASCII
# variants of the paper's bullet glyphs so the contract stays
# byte-deterministic in both engines.
BULLET_PREFIXES = ("- ", "* ")
ELLIPSIS_SUFFIX = "..."


def word_list(text: Column) -> Column:
    """Non-empty whitespace-separated words (the unit every Gopher rule
    counts in).  NULL text -> empty list, so downstream ratios are 0/0
    guarded, never NULL-poisoned."""
    return F.filter(
        F.split(F.coalesce(text, F.lit("")), r"\s+"), lambda w: w != ""
    )


def line_list(text: Column) -> Column:
    """Newline-separated lines, trailing ``\\r`` stripped (CRLF corpora),
    empty lines kept — the line-shape ratios count them as lines."""
    return F.transform(
        F.split(F.coalesce(text, F.lit("")), "\n"),
        lambda l: F.rtrim(l),
    )


def _occurrences(text: Column, needle: str) -> Column:
    """Count non-overlapping occurrences of a literal (replace-based, the
    same left-to-right non-overlapping semantics in Spark and DuckDB)."""
    hole = F.length(text) - F.length(F.replace(text, F.lit(needle)))
    return (hole / len(needle)).cast("long")


GOPHER_STAT_FIELDS = (
    "n_words",
    "mean_word_len",
    "symbol_word_ratio",
    "bullet_line_frac",
    "ellipsis_line_frac",
    "alpha_word_frac",
    "n_required_words",
)


def gopher_stats_struct(text: Column) -> Column:
    """Every Gopher rule statistic as ONE struct column computed in a
    single pass: the word/line/lowered arrays are bound once (r9 —
    emitting each stat as its own column re-split the text per column,
    and the 8 required-word checks each re-split the lowered text)."""
    t = F.coalesce(text, F.lit(""))
    n_symbols = _occurrences(t, "#") + _occurrences(t, ELLIPSIS_SUFFIX)

    def _stats(arrs: Column) -> Column:
        words, lines, lowered = arrs["w"], arrs["ln"], arrs["lw"]
        n_words = F.size(words).cast("long")
        n_lines = F.size(lines).cast("long")
        sum_word_len = F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        )

        def _is_bullet(l: Column) -> Column:
            cond = F.lit(False)
            for p in BULLET_PREFIXES:
                cond = cond | l.startswith(p)
            return cond

        n_bullet = F.size(F.filter(lines, _is_bullet)).cast("long")
        n_ellipsis = F.size(
            F.filter(lines, lambda l: l.endswith(ELLIPSIS_SUFFIX))
        ).cast("long")
        # "word contains a letter" via translate-deletion — the same
        # predicate as rlike('[a-zA-Z]') but without regex machinery per
        # word (measured 4x at 200k docs; this rule is one check per
        # word, the module's hottest expression)
        letters = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        n_alpha = F.size(
            F.filter(words, lambda w: F.translate(w, letters, "") != w)
        ).cast("long")
        n_required = sum(
            (
                F.array_contains(lowered, w).cast("int")
                for w in GOPHER_REQUIRED_WORDS
            ),
            start=F.lit(0),
        ).cast("int")
        nz = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(  # noqa: E731
            F.lit(0.0)
        )
        return F.struct(
            n_words.alias("n_words"),
            F.round(nz(sum_word_len, n_words), 6).alias("mean_word_len"),
            F.round(nz(n_symbols, n_words), 6).alias("symbol_word_ratio"),
            F.round(nz(n_bullet, n_lines), 6).alias("bullet_line_frac"),
            F.round(nz(n_ellipsis, n_lines), 6).alias("ellipsis_line_frac"),
            F.round(nz(n_alpha, n_words), 6).alias("alpha_word_frac"),
            n_required.alias("n_required_words"),
        )

    return bind(
        F.struct(
            word_list(t).alias("w"),
            line_list(t).alias("ln"),
            F.filter(F.split(F.lower(t), r"\s+"), lambda w: w != "").alias("lw"),
        ),
        _stats,
    )


def gopher_stats(text: Column) -> dict[str, Column]:
    """The per-document statistics behind the Gopher rules, each as a
    named column expression (pure JVM):

    - ``n_words``              non-empty whitespace words
    - ``mean_word_len``        double, 0.0 for empty docs
    - ``symbol_word_ratio``    (# '#' + # '...') / n_words
    - ``bullet_line_frac``     lines starting with a bullet prefix
    - ``ellipsis_line_frac``   lines ending in '...'
    - ``alpha_word_frac``      words containing >= 1 ASCII letter
    - ``n_required_words``     distinct GOPHER_REQUIRED_WORDS present

    Each entry is a field of :func:`gopher_stats_struct`; a consumer
    selecting SEVERAL entries as separate columns should stage the struct
    once instead (the way :func:`gopher_filter` does) — every dict entry
    re-evaluates the shared struct."""
    s = gopher_stats_struct(text)
    return {name: s[name] for name in GOPHER_STAT_FIELDS}


def gopher_keep(
    stats: dict[str, Column],
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_words: int = 2,
) -> Column:
    """The Gopher keep decision over :func:`gopher_stats` (paper defaults;
    every threshold a knob)."""
    return (
        (stats["n_words"] >= min_words)
        & (stats["n_words"] <= max_words)
        & (stats["mean_word_len"] >= min_mean_word_len)
        & (stats["mean_word_len"] <= max_mean_word_len)
        & (stats["symbol_word_ratio"] <= max_symbol_word_ratio)
        & (stats["bullet_line_frac"] <= max_bullet_line_frac)
        & (stats["ellipsis_line_frac"] <= max_ellipsis_line_frac)
        & (stats["alpha_word_frac"] >= min_alpha_word_frac)
        & (stats["n_required_words"] >= min_required_words)
    )


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    keep_stats: bool = False,
    **thresholds,
) -> DataFrame:
    """Apply the Gopher document rules: rows failing any rule are dropped.
    ``keep_stats=True`` instead RETURNS every row with the stat columns and
    a ``keep`` boolean (the audit/reporting shape — threshold tuning wants
    the marginal distributions, not the survivors)."""
    packed = gopher_stats_struct(F.col(text_col))
    if keep_stats:
        # stage the struct through its own projection (multi-ref +
        # non-cheap, so CollapseProject keeps the boundary): the stat
        # columns and the keep decision are then cheap field gets over
        # ONE evaluation per row
        out = df.withColumn("__gs", packed)
        fields = {n: F.col("__gs")[n] for n in GOPHER_STAT_FIELDS}
        for name in GOPHER_STAT_FIELDS:
            out = out.withColumn(name, F.col("__gs")[name])
        return out.withColumn(
            "keep", gopher_keep(fields, **thresholds)
        ).drop("__gs")
    return df.where(gopher_keep_col(F.col(text_col), **thresholds))


def gopher_keep_col(text: Column, **thresholds) -> Column:
    """The Gopher keep decision as ONE bound expression: the stats struct
    evaluates once and the rule conjunction reads its fields (a dict of
    :func:`gopher_stats` entries would re-evaluate the struct per rule)."""
    return bind(
        gopher_stats_struct(text),
        lambda s: gopher_keep(
            {n: s[n] for n in GOPHER_STAT_FIELDS}, **thresholds
        ),
    )


# ---------------------------------------------------------------------------
# C4 (arXiv:1910.10683 §2.2)
# ---------------------------------------------------------------------------

C4_TERMINAL_PUNCT = (".", "!", "?", '"')
# page-level drops (the paper removes the whole page for these)
C4_BAD_SUBSTRINGS = ("lorem ipsum", "{")
# line-level drop (the paper removes only the offending line — a whole-page
# drop here would discard materially more of a web crawl, where
# 'javascript' is a common incidental word)
C4_BAD_LINE_WORD = "javascript"


def _c4_line_keep(line: Column, min_words_per_line: int) -> Column:
    ends_ok = F.lit(False)
    for p in C4_TERMINAL_PUNCT:
        ends_ok = ends_ok | line.endswith(p)
    n_words = F.size(F.filter(F.split(line, r"\s+"), lambda w: w != ""))
    return (
        ends_ok
        & (n_words >= min_words_per_line)
        & ~F.lower(line).contains(C4_BAD_LINE_WORD)
    )


def c4_clean_text(text: Column, min_words_per_line: int = 5) -> Column:
    """The C4 LINE rules: keep only lines that end in terminal
    punctuation, carry at least ``min_words_per_line`` words, and do not
    contain the word 'javascript' (the paper's per-line drop); surviving
    lines are re-joined with ``\\n``."""
    kept = F.filter(
        line_list(text), lambda l: _c4_line_keep(l, min_words_per_line)
    )
    return F.array_join(kept, "\n")


def c4_stats(
    text: Column, min_words_per_line: int = 5, min_sentences: int = 3
) -> dict[str, Column]:
    """Cleaned text + the C4 document-keep decision:

    - ``clean_text``   lines surviving the line rules, ``\\n``-joined
    - ``n_lines_kept`` how many lines survived
    - ``n_sentences``  terminal-punctuation count of the cleaned text (the
      sentence proxy — C4 counts sentences by splitting on punctuation)
    - ``keep``         >= min_sentences sentences AND none of
      C4_BAD_SUBSTRINGS present (case-insensitive)

    The bad-substring check runs on the ORIGINAL page text, not the
    line-cleaned text: C4 (1910.10683 §2.2) drops pages on raw content, so
    a page whose only offending lines the line rules removed (e.g. a code
    line ``function() {`` with no terminal punctuation) must still drop.

    Each entry is a field of :func:`c4_stats_struct`; a consumer selecting
    SEVERAL entries should stage the struct once (as :func:`c4_filter`
    does) — every dict entry re-evaluates the shared struct."""
    s = c4_stats_struct(text, min_words_per_line, min_sentences)
    return {name: s[name] for name in C4_STAT_FIELDS}


C4_STAT_FIELDS = ("clean_text", "n_lines_kept", "n_sentences", "keep")


def c4_stats_struct(
    text: Column, min_words_per_line: int = 5, min_sentences: int = 3
) -> Column:
    """The :func:`c4_stats` fields as ONE struct computed in a single
    pass: the cleaned text and the sentence count are bound once (r9 —
    emitting them as separate columns re-ran the per-line word-count
    filter up to 6x per row)."""
    low = F.lower(text)
    bad = F.lit(False)
    for s in C4_BAD_SUBSTRINGS:
        bad = bad | low.contains(s)

    def _pack(clean: Column) -> Column:
        n_sent_e = sum(
            (_occurrences(clean, p) for p in (".", "!", "?")),
            start=F.lit(0).cast("long"),
        )

        def _inner(n_sent: Column) -> Column:
            kept_lines = F.when(
                clean == "", F.lit(0)
            ).otherwise(F.size(F.split(clean, "\n"))).cast("long")
            return F.struct(
                clean.alias("clean_text"),
                kept_lines.alias("n_lines_kept"),
                n_sent.alias("n_sentences"),
                ((n_sent >= min_sentences) & ~bad).alias("keep"),
            )

        return bind(n_sent_e, _inner)

    return bind(c4_clean_text(text, min_words_per_line), _pack)


def c4_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    keep_stats: bool = False,
) -> DataFrame:
    """Apply the C4 cleaning rules: ``text_col`` is REPLACED by the cleaned
    text and failing documents are dropped.  ``keep_stats=True`` returns
    every row with ``clean_text``/``n_lines_kept``/``n_sentences``/``keep``
    audit columns and the original text intact."""
    packed = c4_stats_struct(F.col(text_col), min_words_per_line, min_sentences)
    if keep_stats:
        # stage the struct once (multi-ref + non-cheap keeps the
        # projection boundary); stat columns are cheap field gets
        out = df.withColumn("__cs", packed)
        for name in C4_STAT_FIELDS:
            out = out.withColumn(name, F.col("__cs")[name])
        return out.drop("__cs")
    # filter BEFORE replacing: keep references the RAW page text, and
    # withColumn-then-where would re-resolve that reference against the
    # already-cleaned column (page-level drops are raw-content semantics).
    # The where-side struct evaluates once per row; survivors re-clean
    # once for the replacement column (a staged column + where would be
    # inlined 2x by predicate pushdown instead).
    return (
        df.where(packed["keep"])
        .withColumn(text_col, packed["clean_text"])
    )
