"""Corpus-hygiene operators for training-data pipelines: PII scrubbing,
repetition-based quality stats (Gopher-style), and benchmark
decontamination.

These extend the reference's data-processing surface the way a 100 TB
pretraining pipeline needs (no reference twin — the components are standard
published practice: repetition filters from the Gopher/MassiveText rules,
n-gram decontamination from GPT-3/PaLM appendix methodology).

Cross-engine determinism contract (same as pipeline/text.py): every regex is
RE2-compatible (no lookaheads, no backrefs, ASCII classes) so Spark's Java
regex and DuckDB's RE2 match identically; ratios are computed in double and
rounded to 6; n-gram hashing is the shared md5-based 60-bit token hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duckdb_annsearch_spark.operators.fts import tokenize
from duckdb_annsearch_spark.pipeline.fanout import fan_out_small
from duckdb_annsearch_spark.pipeline.text import bind, token_hash

# PII patterns — deliberately conservative, RE2-safe, and applied in a fixed
# order (email first: its local part can contain digits a later phone pass
# would otherwise mangle; phone last so it cannot eat IPv4 octets).
PII_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# phone numbers: anchored on a leading + or ( (so plain long numbers —
# ids, years, quantities — are never scrubbed), then 2-4 bounded digit
# groups with at most ONE separator between groups. Bounded groups, not a
# greedy separator class: ``[0-9()\-. ]{6,}`` would swallow adjacent
# non-phone digit runs ("(555) 010-7788 1999 2024" -> one <PHONE>)
# the 4th group's separator must be non-space: a space-separated trailing
# digit group is indistinguishable from following prose ("...-7788 1999")
# and RE2 has no lookahead to disambiguate — the conservative reading
# protects years/ids at the cost of the last group of rare
# all-space-separated 4-group numbers
PII_PHONE_RE = (
    r"[+(][0-9]{1,3}\)?[-. ]?\(?[0-9]{2,4}\)?[-. ]?[0-9]{3,4}(?:[-.][0-9]{1,4})?"
)

PII_RULES: list[tuple[str, str, str]] = [
    ("email", PII_EMAIL_RE, "<EMAIL>"),
    ("ip", PII_IPV4_RE, "<IP>"),
    ("phone", PII_PHONE_RE, "<PHONE>"),
]


def scrub_pii(text: Column) -> Column:
    """Text with emails/IPv4s/phone numbers replaced by typed placeholders.
    Pure JVM ``regexp_replace`` chain — whole-stage codegen, no UDF."""
    out = text
    for _, pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-type PII match counts, e.g. for routing documents to redaction.
    Counted on the same fixed rule order as :func:`scrub_pii` (each count
    sees the previous rules' replacements, so overlapping matches are
    never double-counted)."""
    out: dict[str, Column] = {}
    cur = text
    for name, pat, repl in PII_RULES:
        out[name] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, repl)
    return out


def dup_line_fraction(text: Column) -> Column:
    """Fraction of non-empty lines that are duplicates of an earlier line
    (Gopher repetition rule #1): ``1 - n_distinct/n``; empty docs -> 0."""
    def _frac(lines: Column) -> Column:
        n = F.size(lines).cast("double")
        nd = F.size(F.array_distinct(lines)).cast("double")
        return F.round(F.when(n > 0, 1.0 - nd / n).otherwise(0.0), 6)

    # line array bound once (r9): n + nd otherwise re-split the text twice
    return bind(F.filter(F.split(text, "\n"), lambda ln: F.trim(ln) != ""), _frac)


def dup_token_fraction(text: Column) -> Column:
    """Fraction of tokens that repeat an earlier token: ``1 - distinct/n``."""

    def _frac(toks: Column) -> Column:
        n = F.size(toks).cast("double")
        nd = F.size(F.array_distinct(toks)).cast("double")
        return F.round(F.when(n > 0, 1.0 - nd / n).otherwise(0.0), 6)

    return bind(tokenize(text), _frac)


def top_bigram_char_fraction(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, top_bigram_frac): fraction of the document's characters covered
    by occurrences of its most frequent token 2-gram (Gopher repetition
    rule: high = boilerplate/spam).  Shape: explode bigrams -> count per
    (doc, bigram) -> max per doc — two partial-aggregated groupBys, no
    driver work, no all-pairs anything; ties on count break by the
    lexicographically LARGEST bigram (struct max; the oracle's
    ``ORDER BY cnt DESC, bigram DESC``) for cross-engine determinism."""
    # zip_with over two shifted slices, NOT transform+element_at: an
    # element_at(tokenize(...), i) lambda re-evaluates the tokenizer per
    # element inside Generate (no subexpression elimination there) —
    # O(tokens^2) per row, measured 10x slower at 5k docs.  Token array
    # bound once (r9): the two slices + npairs otherwise re-split 4x.
    def _bigrams(toks: Column) -> Column:
        npairs = F.greatest(F.size(toks) - 1, F.lit(0))
        return F.zip_with(
            F.slice(toks, 1, npairs),
            F.slice(toks, 2, npairs),
            lambda a, b: F.concat_ws(" ", a, b),
        )

    bigrams = bind(tokenize(F.col(text_col)), _bigrams)
    # fan_out_small: parallelize the bigram build off a single-split scan
    # (no-op at scale); the explode feeds a shuffle anyway
    base = fan_out_small(df).select(
        F.col(id_col).alias("__id"),
        F.length(F.col(text_col)).cast("double").alias("__chars"),
        F.explode(bigrams).alias("bigram"),
    )
    per_bigram = base.groupBy("__id", "__chars", "bigram").agg(
        F.count("*").alias("cnt")
    )
    # most frequent bigram per doc (ties -> lexicographically largest
    # bigram: struct max orders by (cnt, bigram), which the oracle renders
    # as ORDER BY cnt DESC, bigram DESC LIMIT 1 per doc); its occurrences
    # cover cnt * len(bigram) characters — token chars + the joining
    # space, a consistent, easily oracle-able proxy for the covered span
    best = per_bigram.groupBy("__id", "__chars").agg(
        F.max(F.struct(F.col("cnt"), F.col("bigram"))).alias("top")
    )
    frac = F.when(
        F.col("__chars") > 0,
        F.col("top.cnt") * F.length(F.col("top.bigram")) / F.col("__chars"),
    ).otherwise(0.0)
    scored = best.select(
        F.col("__id").alias(id_col),
        F.round(F.least(frac, F.lit(1.0)), 6).alias("top_bigram_frac"),
    )
    # docs with <2 tokens have no bigrams at all -> 0.0
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)).alias(
                "top_bigram_frac"
            ),
        )
    )


def _ngram_hashes(text: Column, n: int) -> Column:
    """Distinct md5-hashed token n-grams of ``text`` (60-bit longs).

    Built by iterated ``zip_with`` over shifted slices — n-1 linear zips —
    never ``transform``+``element_at`` into the token array, which
    re-evaluates the tokenizer expression per element inside a Generate
    (the O(tokens^2) trap documented at :func:`top_bigram_char_fraction`).
    The token array itself is bound once (r9): the n shifted slices plus
    the shared count otherwise re-ran the tokenizer ~2n times per row."""

    def _hashes(toks: Column) -> Column:
        cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
        grams = F.slice(toks, 1, cnt)
        for j in range(1, n):
            grams = F.zip_with(
                grams, F.slice(toks, 1 + j, cnt), lambda a, b: F.concat_ws(" ", a, b)
            )
        return F.array_distinct(F.transform(grams, token_hash))

    return bind(tokenize(text), _hashes)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """(id, overlap_ngrams, contaminated): benchmark-overlap flags by
    n-gram collision — the GPT-3-style decontamination check.

    The benchmark side is aggregated to DISTINCT n-gram hashes and
    broadcast (benchmarks are small — test sets, not corpora); the corpus
    side explodes its n-grams and joins.  Per-corpus-document output rows:
    how many distinct benchmark n-grams the document shares, and a flag.
    At 100 TB the shuffle is corpus-ngrams x broadcast — map-side only."""
    bcol = bench_text_col or text_col
    bench_grams = (
        benchmark.select(F.explode(_ngram_hashes(F.col(bcol), n)).alias("gram"))
        .distinct()
    )
    # fan_out_small: parallelize the corpus-side 8-gram hashing off a
    # single-split scan (no-op at scale); the semi join is map-side either way
    doc_grams = fan_out_small(corpus).select(
        F.col(id_col), F.explode(_ngram_hashes(F.col(text_col), n)).alias("gram")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("overlap_ngrams"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("overlap_ngrams"), F.lit(0)).cast("long").alias(
                "overlap_ngrams"
            ),
            (F.coalesce(F.col("overlap_ngrams"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    bench_vec_col: str | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """(id, max_benchmark_cos, contaminated): embedding-similarity
    benchmark overlap — the semantic complement of the n-gram
    :func:`decontaminate` (paraphrased test items share no 8-gram but sit
    next to the benchmark in embedding space).

    The benchmark is broadcast (test sets, not corpora) and every corpus
    vector takes the max deterministic double-fold cosine against it —
    rounded to 6 BEFORE the max, so ties and the oracle agree bit-exactly.
    Rows with NULL vectors come back with NULL score and
    ``contaminated=false``.

    Scale shape: map-side only — corpus x broadcast, no shuffle but the
    final per-id aggregate.  Cost is O(|corpus| x |benchmark|) SQL-fold
    dot products; fine for real benchmark suites (10^3-10^5 items).  For
    benchmark sides beyond broadcast size, index the benchmark and use
    ``operators.knn.knn_join(corpus, benchmark, k=1)`` — same decision,
    index-routed.
    """
    def _f64(c):
        return F.transform(c, lambda x: x.cast("double"))

    def _norm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(_f64(c), lambda x: x * x), F.lit(0.0), lambda s, x: s + x
            )
        )

    # norms precomputed per SIDE before the cross join: _cos_double would
    # re-fold both norms inside every pair — 3x the expression work on the
    # O(|corpus| x |benchmark|) hot path for values that depend on one row
    # each.  Same deterministic left folds, so the value (and the oracle
    # hash) is bit-identical.
    bcol = bench_vec_col or vec_col
    bench = benchmark.where(F.col(bcol).isNotNull()).select(
        F.col(bcol).alias("_bvec"), _norm(F.col(bcol)).alias("_bnorm")
    )
    pairs = (
        corpus.where(F.col(vec_col).isNotNull())
        .select(F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("_cnorm"))
        .crossJoin(F.broadcast(bench))
    )
    dot = F.aggregate(
        F.zip_with(_f64(F.col(vec_col)), _f64(F.col("_bvec")), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    cos6 = (
        F.round(
            dot / F.greatest(F.col("_cnorm") * F.col("_bnorm"), F.lit(1e-300)), 6
        )
        + F.lit(0.0)
    )
    hits = (
        pairs.select(F.col(id_col), cos6.alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("max_benchmark_cos"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.col("max_benchmark_cos"),
            F.coalesce(
                F.col("max_benchmark_cos") >= F.lit(float(threshold)), F.lit(False)
            ).alias("contaminated"),
        )
    )
