"""Duplicated-span removal — the ExactSubstr deployment shape of Lee et
al. 2021 (arXiv:2107.06499, "Deduplicating Training Data Makes Language
Models Better").

:func:`..pipeline.dedup.dup_ngram_stats` measures how much of a document
is duplicated; this operator performs the actual surgery: cut from every
document each token span that also occurs elsewhere in the corpus,
keeping the rest.  The reference implementation builds a corpus-wide
suffix array; the distributed equivalent here uses the k-gram identity

    a token span of length L >= k is duplicated
      <=>  all of its L - k + 1 constituent k-grams are duplicated,

so marking every token covered by a duplicated k-gram removes exactly
the maximal duplicated spans of length >= k (spans shorter than ``k``
are below the threshold by construction — ``k`` plays the role of the
paper's 50-token minimum).  The approximation vs a true suffix array:
two *different* partners each sharing an overlapping gram with a doc
merge into one removed region — acceptable (strictly more conservative
removal) and vanishingly rare at k >= 8.

Plan shape (the thing that matters at 100 TB): the gram machinery never
carries text.  Grams explode map-only and ship only a 60-bit int64 hash
+ position (~20 bytes/row) into ONE exchange keyed on the gram hash —
duplication is decided by window aggregates over that single exchange
(``count(*) over (partition by _gh)``; the round-7 shape shuffled the
gram stream twice, once for a groupBy and again for the join back, and
the partial-agg difference defeated ReusedExchange — halving the gram
shuffle was worth ~40 GB of scratch at the 20M-doc cell).  Duplicated
start positions come back as one data-sized ``(doc, starts_array)``
table (non-empty only for documents that actually contain duplicated
spans); the final cut is a per-row array expression ``filter(tokens,
(t, i) -> not exists(starts, s -> s <= i < s + k))``.  The corpus text
touches at most ONE exchange — the final join on the id — and when the
starts table broadcasts (AQE; typical, since only dup-bearing docs have
a row) even that degrades to a local read.  Compare the naive plan —
explode all tokens, anti-join covered positions, re-aggregate per doc —
which shuffles the full corpus token stream twice regardless.

Tokens are whitespace pieces with ORIGINAL bytes (chunk_documents
convention); the cleaned text re-joins kept tokens with single spaces —
a canonical form, applied uniformly so downstream operators see one
normalization regardless of whether anything was removed.  With
``normalize=True`` gram *matching* is case-folded while output bytes
stay original.

Every occurrence of a duplicated span is removed (the semantics of the
released deduplicate-text-datasets tool); "keep one copy" would require
a corpus-global arbitrary winner per span and is deliberately not
offered — run :func:`..pipeline.dedup.exact_dedup` first if whole-doc
copies should survive once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from duckdb_annsearch_spark.pipeline.fanout import fan_out_small
from duckdb_annsearch_spark.pipeline.text import bind, token_hash

__all__ = ["remove_dup_spans", "dup_span_starts"]


def _ws_tokens(text: Column) -> Column:
    """Whitespace tokens, original bytes, boundary-empty-safe."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def _ws_grams(toks: Column, k: int) -> Column:
    """Positional k-grams over a token array (zip_with shift trick —
    O(k) array ops per row, one gram per start position).  The token
    array is bound once (r9): the shifted slices reference it ~2k times
    and HOF subtrees are excluded from subexpression elimination."""

    def _grams(ts: Column) -> Column:
        n = F.size(ts)
        grams = ts
        for j in range(1, k):
            shifted = F.slice(ts, j + 1, F.greatest(n - j, F.lit(0)))
            grams = F.zip_with(grams, shifted, lambda g, t: F.concat_ws(" ", g, t))
        return F.when(n >= k, F.slice(grams, 1, n - (k - 1))).otherwise(
            F.array().cast("array<string>")
        )

    return bind(toks, _grams)


def dup_span_starts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    scope: str = "corpus",
    normalize: bool = False,
) -> DataFrame:
    """``(id_col, starts)`` — 0-based token positions at which a
    duplicated ``k``-gram begins, one ascending-sorted array per document
    that has any.  The inspection / thresholding companion of
    :func:`remove_dup_spans` (and its entire shuffle footprint).

    ``scope='corpus'`` marks a gram duplicated when it occurs >= 2 times
    anywhere (within-doc repeats count — the paper's semantics);
    ``'cross_doc'`` requires >= 2 distinct documents (the
    ``dup_ngram_stats`` convention).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if scope not in ("corpus", "cross_doc"):
        raise ValueError(f"scope must be 'corpus' or 'cross_doc', got {scope!r}")
    gram = F.col("_gram")
    if normalize:
        gram = F.lower(gram)
    # fan_out_small: parallelize the gram build off a single-split scan
    # (no-op at scale); a round-robin exchange, so the plan-asserted
    # "<= 1 hashpartitioning(_gh)" window shape is untouched
    grams = fan_out_small(df).select(
        F.col(id_col),
        F.posexplode(_ws_grams(_ws_tokens(F.col(text_col)), k)).alias(
            "_gpos", "_gram"
        ),
    ).select(F.col(id_col), F.col("_gpos"), token_hash(gram).alias("_gh"))
    # duplication decided by window aggregates over ONE exchange of the
    # gram stream (a groupBy + join-back would exchange it twice — the
    # partial agg on mostly-unique gram keys shrinks nothing but defeats
    # ReusedExchange); cross_doc's ">= 2 distinct docs" is exactly
    # "min(id) != max(id)", which window-computes without DISTINCT
    w = Window.partitionBy("_gh")
    dup_flag = (
        (F.count(F.lit(1)).over(w) >= 2)
        if scope == "corpus"
        else (F.min(id_col).over(w) != F.max(id_col).over(w))
    )
    return (
        grams.withColumn("_dup", dup_flag)
        .where(F.col("_dup"))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("_gpos")).alias("starts"))
    )


def remove_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    scope: str = "corpus",
    normalize: bool = False,
) -> DataFrame:
    """Cut every duplicated token span of length >= ``k`` out of every
    document.  Emits ``(id_col, <text_col>, n_tokens, n_removed)``:

    - ``text_col`` — kept tokens re-joined with single spaces (canonical
      form; NULL text stays NULL, a fully-duplicated document comes back
      as the empty string — dropped-to-empty, not lost);
    - ``n_tokens`` — original whitespace-token count;
    - ``n_removed`` — tokens cut.

    The per-token coverage test is ``exists(starts, s -> s <= i < s+k)``
    — O(|tokens| x |dup starts|) per row, bounded by single-document
    size (the bound the input row itself already sets), in exchange for
    never shuffling corpus text (see module docstring).
    """
    starts_df = dup_span_starts(df, text_col, id_col, k, scope, normalize)
    starts = F.coalesce(F.col("starts"), F.array().cast("array<int>"))

    # token array and kept array each bound once (r9): the three output
    # columns otherwise re-ran the whitespace split ~3x and the
    # O(|tokens| x |starts|) coverage filter 2x per row; the struct is
    # staged through its own projection (multi-ref + non-cheap, so
    # CollapseProject leaves the boundary) and unpacked with cheap
    # field gets
    def _out(toks: Column) -> Column:
        kept_arr = F.filter(
            toks,
            lambda t, i: ~F.exists(
                starts, lambda s: (s <= i) & (i < s + F.lit(k))
            ),
        )

        def _pack(kept: Column) -> Column:
            n_tok = F.coalesce(F.size(toks), F.lit(0)).cast("long")
            return F.struct(
                F.when(
                    F.col(text_col).isNotNull(), F.concat_ws(" ", kept)
                ).alias("_txt"),
                n_tok.alias("_nt"),
                (n_tok - F.coalesce(F.size(kept), F.lit(0)))
                .cast("long")
                .alias("_nr"),
            )

        return bind(kept_arr, _pack)

    packed = bind(_ws_tokens(F.col(text_col)), _out)
    staged = fan_out_small(df).join(starts_df, id_col, "left").select(
        F.col(id_col), packed.alias("__p")
    )
    return staged.select(
        F.col(id_col),
        F.col("__p._txt").alias(text_col),
        F.col("__p._nt").alias("n_tokens"),
        F.col("__p._nr").alias("n_removed"),
    )
