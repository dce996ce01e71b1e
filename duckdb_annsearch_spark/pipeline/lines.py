"""Line-level dedup: cross-document boilerplate removal.

The CCNet / RefinedWeb curation stage that n-gram and MinHash dedup do
not cover: navigation bars, cookie banners, license headers and other
boilerplate repeat VERBATIM across many documents while each document as
a whole stays unique.  The fix is per-line document frequency — drop any
line that appears in at least ``min_df`` distinct documents, keep the
rest in order.

Plan shape (all JVM expressions, no Python):
  1. ``posexplode(split(text))`` — map-only line table;
  2. one groupBy on the normalized line computing ``countDistinct(doc)``
     (partial aggregation applies: a line seen 10^6 times sends one
     partial row per task, not 10^6 rows, into the shuffle);
  3. a left-anti join of lines against the over-threshold set — the
     boilerplate set is the aggregate's output and is data-sized, so it
     stays a shuffle join unless AQE proves it broadcastable;
  4. per-document reassembly: ``array_sort(collect_list(struct(pos,
     line)))`` then join with the delimiter — bounded by single-document
     size — the bound the input row itself already sets.

Whole-doc NULL text stays NULL; a document whose every line is
boilerplate comes back as the empty string (dropped-to-empty, not lost).
Blank (whitespace-only) lines are never counted as boilerplate and are
always kept — structure, not content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_annsearch_spark.pipeline.fanout import fan_out_small


def _split(col, delimiter: str):
    """Literal-delimiter split (F.split takes a REGEX — quote it)."""
    return F.split(col, "\\Q" + delimiter + "\\E", -1)

__all__ = ["line_dedup", "line_df_counts"]


def _norm(col, normalize: bool):
    return F.lower(F.trim(col)) if normalize else col


def line_df_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = "\n",
    normalize: bool = True,
) -> DataFrame:
    """``(line, df)`` — distinct-document frequency per normalized
    non-blank line.  The reporting / threshold-tuning companion of
    :func:`line_dedup`."""
    lines = docs.select(
        F.col(id_col),
        F.explode(_split(F.col(text_col), delimiter)).alias("_line"),
    )
    key = _norm(F.col("_line"), normalize).alias("line")
    return (
        lines.select(F.col(id_col), key)
        # trim() regardless of `normalize`: whitespace-only lines are
        # structural and never counted as boilerplate in either mode
        .where(F.trim(F.col("line")) != "")
        .groupBy("line")
        .agg(F.count_distinct(F.col(id_col)).alias("df"))
    )


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    delimiter: str = "\n",
    normalize: bool = True,
) -> DataFrame:
    """Remove every line whose normalized form occurs in >= ``min_df``
    distinct documents; emit ``(id_col, text, n_kept, n_dropped)`` with
    the surviving lines rejoined in original order.

    ``normalize=True`` compares ``lower(trim(line))`` (case/indent
    variants of one banner are one banner); the emitted text always
    carries the ORIGINAL line bytes.  Within-document repeats of a
    boilerplate line all drop (df counts distinct docs, removal hits
    every copy).
    """
    if min_df < 2:
        raise ValueError(f"line_dedup: min_df must be >= 2, got {min_df}")
    from duckdb_annsearch_spark.pipeline.text import bind

    split_col = _split(F.col(text_col), delimiter)
    # The df-count shuffle is keyed on md5(normalized line), not the line
    # text: boilerplate lines run hundreds of bytes and the count needs
    # only identity — 32-char keys shrink that shuffle's rows ~20x.
    # md5 collisions (~2^-64) would merge two distinct lines' counts;
    # acceptable for a >=min_df threshold.  Blank test happens BEFORE
    # hashing (whitespace-only lines are structural).  fan_out_small:
    # parallelize the split/explode/md5 pass off a single-split scan
    # (no-op at scale); it feeds the df-count shuffle.
    # keys only — the r10 drop-set shape below never needs the line TEXT
    # off its source row, so the exploded relation is (id, pos, key) and
    # is lazily checkpointed: it feeds the df-count aggregate AND the
    # drop semi-join, and without the checkpoint each consumer re-ran the
    # split+explode+md5 pass (two Generate subtrees in the r9 plan).
    lines = fan_out_small(docs).select(
        F.col(id_col),
        F.posexplode(split_col).alias("pos", "_line"),
    ).select(
        F.col(id_col),
        "pos",
        F.when(
            F.trim(F.col("_line")) != "",
            F.md5(_norm(F.col("_line"), normalize)),
        ).alias("_key"),
    ).localCheckpoint(eager=False)

    boiler = (
        lines.where(F.col("_key").isNotNull())
        .groupBy("_key")
        .agg(F.count_distinct(F.col(id_col)).alias("_df"))
        .where(F.col("_df") >= min_df)
        .select("_key")
    )
    # r10 (guide §8 shape — decide with small rows, never move the text):
    # instead of anti-joining every exploded line and re-assembling the
    # survivors through a text-carrying groupBy exchange, compute only the
    # DROPPED (id, pos) pairs — the boilerplate sliver — and rebuild each
    # document from its OWN text with an index-aware array filter.  The
    # document bytes never cross an exchange carrying lines: the drop
    # relation is two integers per removed line.  Blank lines carry a
    # NULL _key, which the semi-join never matches — structurally kept.
    dropped = lines.join(boiler, "_key", "left_semi").groupBy(id_col).agg(
        F.collect_list("pos").alias("__drop"),
        F.count("*").alias("__nd"),
    )
    joined = docs.join(dropped, id_col, "left")
    drop_arr = F.coalesce(F.col("__drop"), F.array().cast("array<int>"))
    # one split per row: the token array is bound once (text.bind) and the
    # kept-lines array once more — concat/size reference them many times
    out_struct = bind(split_col, lambda toks: bind(
        F.filter(toks, lambda x, i: ~F.array_contains(drop_arr, i)),
        lambda kept: F.struct(
            F.concat_ws(delimiter, kept).alias("text_kept"),
            F.size(kept).cast("long").alias("n_kept"),
            F.size(toks).cast("long").alias("n_lines"),
        ),
    ))
    staged = joined.select(
        F.col(id_col),
        F.col(text_col).alias("_orig"),
        out_struct.alias("__s"),
    )
    return staged.select(
        F.col(id_col),
        F.when(F.col("_orig").isNotNull(), F.col("__s")["text_kept"]).alias(
            text_col
        ),
        F.coalesce(
            F.when(F.col("_orig").isNotNull(), F.col("__s")["n_kept"]), F.lit(0)
        ).cast("long").alias("n_kept"),
        (
            F.coalesce(
                F.when(F.col("_orig").isNotNull(), F.col("__s")["n_lines"]),
                F.lit(0),
            )
            - F.coalesce(
                F.when(F.col("_orig").isNotNull(), F.col("__s")["n_kept"]),
                F.lit(0),
            )
        ).cast("long").alias("n_dropped"),
    )
