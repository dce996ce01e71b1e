"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

Cross-engine determinism contract: every numeric here is reproducible in
ANSI-ish SQL (the DuckDB oracle) — token hashing is md5-based
(``conv(substr(md5(t),1,15),16,10)`` == DuckDB ``('0x'||substr(md5(t),1,15))
::BIGINT``), accumulation uses exact integer arithmetic mod small primes,
and floating-point scores are computed in double then rounded.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from duckdb_annsearch_spark.operators.fts import tokenize

HASH_MOD = 2147483647  # 2^31 - 1
FP_MOD = 1000000007

# tiny marker-word lists per language (n-gram/stopword heuristic; deliberately
# small so the SQL oracle can replicate them verbatim)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
}

STOPWORDS = LANG_MARKERS["en"]


def bind(col: Column, fn) -> Column:
    """Evaluate ``col`` ONCE per row and hand it to ``fn`` as a bound
    lambda variable: ``element_at(transform(array(col), fn), 1)``.

    Catalyst excludes higher-order-function subtrees from common-
    subexpression elimination, so a Column referenced N times inside
    array lambdas is otherwise evaluated N times per row — e.g. the
    pre-fix ``word_grams`` plan re-ran the tokenizer's regexp split six
    times per row (r9 plan audit).  A HOF's input child, by contrast, is
    materialized exactly once before the lambda runs, so this wrapper
    makes "compute once, reference many" explicit.  Values are unchanged:
    ``fn`` receives exactly the value ``col`` evaluates to (including
    NULL)."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def token_hash(tok: Column) -> Column:
    """Deterministic 60-bit token hash reproducible in DuckDB SQL."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def token_count(text: Column) -> Column:
    """Whitespace/punctuation token count (BPE-ish regex split)."""
    return F.size(tokenize(text))


# GPT-2-style pretokenizer, RE2-compatible (no lookaheads, ASCII classes)
# so Spark's Java regex and DuckDB's RE2 produce identical pieces:
# contractions | space?+letters | space?+digits | space?+other | whitespace
BPE_PRETOKEN_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+|\s+"


def bpe_token_count(text: Column) -> Column:
    """Token-count proxy for BPE tokenizers: counts GPT-2-pretokenizer
    pieces of the lowercased text. A lower bound on real LLM token counts
    (BPE only splits within pieces, never merges across them) — the usual
    budget heuristic for training-data token accounting."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_PRETOKEN_RE), 0))


def detect_language(text: Column) -> Column:
    """Best-scoring language by marker-word hits; ties break in the fixed
    order en > es > de > fr; no hits -> 'und' (undetermined).

    Shape (r9): the old when-chain referenced each running best twice per
    language, doubling the expression tree per step and re-inlining the
    tokenizer into every copy (~dozens of regexp splits per row); now the
    token array is bound once and the argmax is an ``aggregate`` fold over
    (score, lang) structs — the lambda runs iteratively at runtime, so the
    tree is O(#languages).  Strictly-greater keeps the same tie order."""

    def _detect(toks: Column) -> Column:
        scores = F.array(
            *[
                F.struct(
                    F.size(F.filter(toks, lambda t: t.isin(markers))).alias("s"),
                    F.lit(lang).alias("lang"),
                )
                # dict order IS the priority order: en > es > de > fr
                for lang, markers in LANG_MARKERS.items()
            ]
        )
        best = F.aggregate(
            scores,
            F.struct(F.lit(-2).alias("s"), F.lit("und").alias("lang")),
            lambda acc, x: F.when(x["s"] > acc["s"], x).otherwise(acc),
        )
        return F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("und"))

    return bind(tokenize(text), _detect)


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1] from length / punctuation /
    stopword / digit ratios (double arithmetic, rounded to 6 so the SQL
    oracle hash-matches)."""
    n_chars = F.length(text).cast("double")
    n_punct = (
        n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    ).cast("double")
    n_digits = (
        F.length(text) - F.length(F.regexp_replace(text, r"[0-9]", ""))
    ).cast("double")

    # token array bound once (r9): n_tokens + n_stop otherwise re-run the
    # tokenizer's regexp split twice per row
    def _score(toks: Column) -> Column:
        n_tokens = F.size(toks).cast("double")
        n_stop = F.size(
            F.filter(toks, lambda t: t.isin(STOPWORDS))
        ).cast("double")
        len_score = F.least(n_tokens / 100.0, F.lit(1.0))
        punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
        digit_ratio = F.when(n_chars > 0, n_digits / n_chars).otherwise(0.0)
        stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(0.0)
        raw = (
            0.4 * len_score
            + 0.3 * F.least(stop_ratio * 3.0, F.lit(1.0))
            + 0.15 * (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0)))
            + 0.15 * (1.0 - F.least(digit_ratio * 5.0, F.lit(1.0)))
        )
        return F.round(raw, 6)

    return bind(tokenize(text), _score)


def doc_fingerprint(text: Column) -> Column:
    """Order-sensitive rolling hash over tokens:
    ``acc = (acc*31 + token_hash % FP_MOD) % FP_MOD`` — a content
    fingerprint that (unlike a set hash) distinguishes permutations."""
    hashes = F.transform(tokenize(text), lambda t: token_hash(t) % FP_MOD)
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % FP_MOD,
    )
