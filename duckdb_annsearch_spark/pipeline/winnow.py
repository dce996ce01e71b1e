"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
SIGMOD 2003 — the MOSS algorithm).

Whole-document MinHash answers "are these two documents mostly the
same?"; winnowing answers the *local* question — "do these documents
share any contiguous run of at least ``w + k - 1`` tokens?" — with a
guarantee MinHash cannot give: every shared window of ``w`` consecutive
k-gram hashes contributes at least one IDENTICAL selected fingerprint to
both documents (the window minimum is a pure function of the window's
contents).  That makes it the right primitive for partial-overlap /
quote / clone detection in a curation pipeline, complementing the
whole-document near-dup operators in :mod:`..pipeline.dedup`.

Plan shape: ``winnow_fingerprints`` is MAP-ONLY — tokenize, k-gram,
hash, per-window ``array_min``, ``array_distinct`` all happen as array
expressions inside one projection; zero shuffles, zero Python.
``winnow_pairs`` is the same posting-list join shape as
``jaccard_pairs``: explode the (data-sized) fingerprint sets, self-join
on the fingerprint hash with a ``max_df`` hot-hash cap, one groupBy per
candidate pair — O(sum df^2) over shared fingerprints, never all-pairs.

Cross-engine determinism: gram hashes are the package-standard 60-bit
md5 hash (reproducible in the DuckDB oracle); fingerprint sets are
sorted ascending so array equality is well-defined.

Window semantics: with ``h = n_tokens - k + 1`` gram hashes, windows are
every ``w`` consecutive hashes (``h - w + 1`` of them); a document with
``0 < h < w`` yields ONE window over all its hashes (the global min), so
any document with at least ``k`` tokens carries at least one
fingerprint.  Selecting the min *value* per window (rather than the
rightmost-min *position* of robust winnowing) keeps the same guarantee —
two documents sharing a window share its min value — while staying a
pure per-row expression; positions are deliberately not tracked (the
pairs join needs only values).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duckdb_annsearch_spark.pipeline.dedup import word_grams
from duckdb_annsearch_spark.pipeline.fanout import fan_out_small
from duckdb_annsearch_spark.pipeline.text import token_hash

__all__ = ["winnow_fingerprint_col", "winnow_fingerprints", "winnow_pairs"]


def winnow_fingerprint_col(text: Column, k: int = 5, w: int = 4) -> Column:
    """Sorted-distinct winnowing fingerprint set of ``text`` as a pure
    array expression (``array<long>``; NULL text -> NULL, documents
    shorter than ``k`` tokens -> empty array)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    hashes = F.transform(word_grams(text, k), token_hash)

    # BIND the hash array to a lambda variable before windowing: a bare
    # `slice(hashes, i, w)` inside the window transform would re-inline
    # the whole gram+md5 pipeline once PER WINDOW (O(grams^2) md5 work —
    # measured 50s for 20k 100-token docs; 1.5s bound).  Same trick as
    # minhash_signatures' fold.
    def _mins(hs: Column) -> Column:
        # window mins as a zip_with/least shift chain (the word_grams
        # trick): m[i] = min(hs[i..i+w-1]) after w-1 elementwise passes —
        # no per-window slice allocation (~15% over slice+array_min;
        # md5 hashing dominates the rest).  zip_with NULL-pads the
        # shorter shifted side and `least` ignores NULLs, so trailing
        # partial windows shrink gracefully; the final slice keeps the
        # nh-w+1 full windows — or position 1 alone when nh < w, which
        # the padding has made the global min.
        nh = F.size(hs)
        m = hs
        for j in range(1, w):
            shifted = F.slice(hs, j + 1, F.greatest(nh - j, F.lit(0)))
            m = F.zip_with(m, shifted, lambda a, b: F.least(a, b))
        return F.when(
            nh > 0,
            F.array_sort(
                F.array_distinct(
                    F.slice(m, 1, F.greatest(nh - (w - 1), F.lit(1)))
                )
            ),
        )

    bound = F.element_at(F.transform(F.array(hashes), _mins), 1)
    return F.when(text.isNotNull(), F.coalesce(bound, F.array().cast("array<long>")))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """``(id_col, fingerprints, n_fingerprints)`` per document.

    Map-only (plan-asserted in tests): every stage is an array expression
    in one projection, so at 100 TB this is a pure scan-side transform —
    no shuffle, no Python workers, and the parquet scan still prunes to
    (id, text).
    """
    fp = winnow_fingerprint_col(F.col(text_col), k=k, w=w)
    return df.select(
        F.col(id_col),
        fp.alias("fingerprints"),
        F.size(fp).alias("n_fingerprints"),
    )


def winnow_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 1000,
) -> DataFrame:
    """Candidate overlapping-document pairs by shared winnowing
    fingerprints: ``(id_a, id_b, n_shared, overlap)`` with ``id_a <
    id_b`` and ``overlap = n_shared / min(|fp_a|, |fp_b|)`` (containment
    — a short quote embedded in a long document still scores high).

    Scale shape: fingerprint sets are data-sized (≈ 2/(w+1) of the gram
    count in expectation, the winnowing density guarantee), the join is
    per-fingerprint posting lists, and hashes shared by more than
    ``max_df`` documents are dropped before the self-join — a
    corpus-wide boilerplate fingerprint would otherwise contribute
    df^2 candidate rows (the same hot-key cap as ``jaccard_pairs``;
    line-level dedup is the right tool for that text, not pair
    explosion).
    """
    # barrier: the df-cap aggregate and BOTH self-join sides read the
    # fingerprint relation — without it the map-only fingerprint pipeline
    # runs three times (lazy localCheckpoint, ContextCleaner-reclaimed,
    # same reasoning as band_buckets)
    # fan_out_small: parallelize the gram-hash/window-min pass off a
    # single-split scan (no-op at scale); winnow_fingerprints itself stays
    # map-only — the fan-out is this composite caller's decision
    fps = (
        winnow_fingerprints(fan_out_small(df), text_col, id_col, k=k, w=w)
        .where(F.col("n_fingerprints") > 0)
        .localCheckpoint(eager=False)
    )
    posts = fps.select(
        F.col(id_col), F.col("n_fingerprints"), F.explode("fingerprints").alias("_fp")
    )
    # hot-hash cap as a count-over-window on the _fp exchange (r9): the
    # groupBy + join-back shape exchanged the posting stream twice and fed
    # the self-join two more exchanges; the window establishes ONE hash
    # partitioning by _fp that the self-join below reuses on both sides
    # (identical subplans -> ReusedExchange).  count over the partition is
    # exactly the groupBy count, so the filter is unchanged.
    from pyspark.sql import Window

    posts = (
        posts.withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy("_fp"))
        )
        .where(F.col("_df") <= max_df)
        .drop("_df")
        # r10: checkpoint the CAPPED postings — when AQE broadcasts one
        # self-join side (the common case at small/medium per-partition
        # sizes) there is no exchange for that side to reuse, so both
        # sides re-ran the explode + window-cap chain; the checkpoint
        # runs it once and both sides read blocks
        .localCheckpoint(eager=False)
    )
    a = posts.select(
        F.col("_fp"),
        F.col(id_col).alias("id_a"),
        F.col("n_fingerprints").alias("_na"),
    )
    b = posts.select(
        F.col("_fp"),
        F.col(id_col).alias("id_b"),
        F.col("n_fingerprints").alias("_nb"),
    )
    pairs = (
        a.join(b, "_fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("n_shared"),
            F.first("_na").alias("_na"),
            F.first("_nb").alias("_nb"),
        )
        .where(F.col("n_shared") >= min_shared)
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.col("n_shared").cast("long").alias("n_shared"),
        F.round(
            F.col("n_shared") / F.least(F.col("_na"), F.col("_nb")).cast("double"), 6
        ).alias("overlap"),
    )
