"""Streaming deduplication for continuous ingestion pipelines.

The batch dedup operators (pipeline/dedup.py) assume a complete corpus;
ingestion pipelines see documents arrive continuously.  Structured
Streaming's stateful ``dropDuplicates`` gives exactly the right semantics:
the first document with a given content hash passes, later copies are
dropped, and the seen-hash state store is bounded by the watermark (copies
arriving later than the watermark delay may pass again — the standard
trade-off for bounded state).

NEAR-duplicates (the MinHash-LSH kind) cannot ride ``dropDuplicates``:
a doc's fate depends on ``bands`` independent bucket keys at once,
which no single-key state operator expresses, and a second stateful
aggregate behind ``applyInPandasWithState`` is not a supported chain.
:func:`dedup_near_stream` therefore runs the production shape — a
``foreachBatch`` incremental protocol against a persistent band-bucket
store: per micro-batch, drop docs colliding with any historical
survivor bucket, resolve in-batch collisions by bucket-minimum, sink
survivors, register their buckets.  Replay-idempotent by layout (each
batch's buckets live in their own hive partition, excluded from the
history the same batch reads), unbounded lookback (a crawl from last
year still dedups this year's copy — deliberately NOT
watermark-bounded)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 day",
) -> DataFrame:
    """Keep the first-seen document per exact content hash.

    With ``ts_col`` set, state is watermark-bounded
    (``dropDuplicatesWithinWatermark``); without it, state grows with the
    number of distinct documents (fine for bounded streams/backfills).
    Works on batch DataFrames too (plain dropDuplicates on the hash)."""
    hashed = docs.withColumn("__content_hash", F.md5(F.col(text_col)))
    if docs.isStreaming and ts_col is not None:
        out = hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["__content_hash"]
        )
    else:
        out = hashed.dropDuplicates(["__content_hash"])
    return out.drop("__content_hash")


def _real_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    shingle_k: int,
) -> DataFrame:
    """Band buckets minus the all-sentinel bucket: a document with no
    shingles (NULL/empty/too-short text) signs every row with the 2^31-1
    sentinel, so ALL degenerate docs would share one bucket and collapse
    to a single survivor.  They carry no LSH evidence — they bypass
    near-dedup entirely (kept, never registered); route them through
    :func:`dedup_exact_stream` if byte-identical empties should dedup."""
    from duckdb_annsearch_spark.pipeline.dedup import HASH_MOD, band_buckets

    sentinel = ",".join([str(HASH_MOD)] * (num_hashes // bands))
    return band_buckets(df, text_col, id_col, num_hashes, bands, shingle_k).where(
        F.col("band_hash") != sentinel
    )


def near_dedup_increment(
    batch_df: DataFrame,
    seen_dir: str,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """One incremental MinHash-LSH near-dedup step: documents of
    ``batch_df`` that are near-duplicates of NOTHING — neither of any
    earlier batch's survivor (a band bucket registered in ``seen_dir``)
    nor of an earlier-ordered survivor in this batch.

    The in-batch rule is bucket-minimum: among history-clean docs, a doc
    survives iff it is the smallest ``id_col`` in every band bucket it
    occupies.  A chain A~B~C where only B bridges can drop C although
    its sole partner B was itself dropped — strictly conservative
    over-removal, the standard greedy trade (run the batch
    ``dedup_fuzzy`` pipeline instead when transitive precision matters
    more than per-batch latency).

    ``seen_dir`` holds one hive partition per batch
    (``batch=<id>/``) of survivor ``(band, band_hash)`` keys; this
    function READS it excluding ``batch_id`` — so replaying a
    half-finished batch is idempotent by construction, no marker
    protocol needed — and does not write it (the caller registers
    survivors after sinking them; see :func:`register_seen_buckets`).

    Scale: the per-batch work is one bucket explode (``bands`` rows per
    doc) + two joins against the seen store.  The store grows with the
    corpus; at real scale compact it periodically with
    :func:`compact_seen` so the join reads few well-sized files (or swap
    the store for a key-value/Delta table — the protocol only needs
    "set of (band, band_hash)").  The empty-store probe uses a driver
    ``os.listdir`` — ``seen_dir`` must be a driver-visible filesystem
    (local/NFS); on object stores replace that probe and the hive layout
    with a Delta table, same protocol."""
    import os

    spark = batch_df.sparkSession
    _check_store_params(seen_dir, num_hashes, bands, shingle_k)
    buckets = _real_buckets(
        batch_df, text_col, id_col, num_hashes, bands, shingle_k
    )
    if os.path.isdir(seen_dir) and any(
        e.startswith("batch=") for e in os.listdir(seen_dir)
    ):
        seen = (
            spark.read.option("basePath", seen_dir)
            .parquet(seen_dir)
            .where(F.col("batch") != batch_id)
            .select("band", "band_hash")
        )
        hit = (
            buckets.join(seen, ["band", "band_hash"], "left_semi")
            .select("doc_id")
            .distinct()
        )
        clean = buckets.join(hit, "doc_id", "left_anti")
    else:
        hit = None
        clean = buckets
    bucket_min = clean.groupBy("band", "band_hash").agg(
        F.min("doc_id").alias("_min_id")
    )
    losers = (
        clean.join(bucket_min, ["band", "band_hash"])
        .where(F.col("doc_id") > F.col("_min_id"))
        .select("doc_id")
        .distinct()
    )
    dropped = losers if hit is None else hit.union(losers).distinct()
    return batch_df.join(
        dropped.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )


def register_seen_buckets(
    survivors_df: DataFrame,
    seen_dir: str,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> None:
    """Write the band buckets of a batch's survivors to
    ``seen_dir/batch=<id>`` (overwrite — replay-idempotent).  Only
    survivors register: dropped duplicates are represented by the
    canonical doc they collided with."""
    _check_store_params(seen_dir, num_hashes, bands, shingle_k)
    _real_buckets(
        survivors_df, text_col, id_col, num_hashes, bands, shingle_k
    ).select("band", "band_hash").distinct().write.mode("overwrite").parquet(
        f"{seen_dir}/batch={batch_id}"
    )


def _check_store_params(
    seen_dir: str, num_hashes: int, bands: int, shingle_k: int
) -> None:
    """Pin the store's LSH config in a ``_params.json`` sidecar on first
    touch and REFUSE mismatched later calls: every reader/writer of one
    store must band identically or the (band, band_hash) equi-join
    silently never collides — duplicates of everything previously seen
    would pass as survivors with zero errors."""
    import json
    import os

    params = {
        "num_hashes": int(num_hashes),
        "bands": int(bands),
        "shingle_k": int(shingle_k),
    }
    os.makedirs(seen_dir, exist_ok=True)
    fn = os.path.join(seen_dir, "_params.json")
    if os.path.exists(fn):
        with open(fn) as f:
            try:
                existing = json.load(f)
            except json.JSONDecodeError as e:
                raise ValueError(
                    f"seen store sidecar {fn} is corrupt (truncated write "
                    "or concurrent writer); delete it and re-pin by "
                    "calling again with the store's parameters"
                ) from e
        if existing != params:
            raise ValueError(
                f"seen store {seen_dir} was built with {existing}; "
                f"this call uses {params} — mismatched banding never "
                "collides (pass the store's parameters, or use a new "
                "store)"
            )
        return
    # atomic publish: a crash mid-write must never leave a truncated
    # sidecar that poisons every later call
    tmp = fn + ".tmp"
    with open(tmp, "w") as f:
        json.dump(params, f)
    os.replace(tmp, fn)


def seed_seen_from_corpus(
    ref_df: DataFrame,
    seen_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> None:
    """Pre-register a STATIC reference corpus's band buckets into the
    ``batch=-1`` partition, making :func:`dedup_near_stream` the
    streaming twin of ``pipeline.dedup.dedup_against``: every incoming
    micro-batch is near-deduplicated against the existing corpus from
    the first trigger (and against the stream's own history as usual).

    MERGES with any existing ``batch=-1`` content (a second reference
    corpus, or history folded there by ``compact_seen``) — a plain
    overwrite would silently erase the prior seed/compacted history and
    re-admit duplicates of everything in it.  Like ``compact_seen``, run
    between batches, not concurrently with an active stream."""
    import os
    import shutil
    import tempfile

    _check_store_params(seen_dir, num_hashes, bands, shingle_k)
    spark = ref_df.sparkSession
    new = _real_buckets(
        ref_df, text_col, id_col, num_hashes, bands, shingle_k
    ).select("band", "band_hash")
    part = os.path.join(seen_dir, "batch=-1")
    if os.path.isdir(part):
        merged = new.union(spark.read.parquet(part)).distinct()
        tmp = tempfile.mkdtemp(prefix="seen_seed_")
        merged.write.mode("overwrite").parquet(f"{tmp}/batch=-1")
        shutil.rmtree(part)
        shutil.move(f"{tmp}/batch=-1", part)
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        new.distinct().write.mode("overwrite").parquet(part)


def compact_seen(spark, seen_dir: str, partitions: int = 64) -> None:
    """Rewrite the seen store as one ``batch=-1`` partition of
    ``partitions`` files (distinct over all registered buckets).  Run
    between batches — not concurrently with an active stream."""
    import shutil
    import tempfile

    seen = (
        spark.read.option("basePath", seen_dir)
        .parquet(seen_dir)
        .select("band", "band_hash")
        .distinct()
        .repartition(partitions, "band", "band_hash")
    )
    tmp = tempfile.mkdtemp(prefix="seen_compact_")
    seen.write.mode("overwrite").parquet(f"{tmp}/batch=-1")
    import os

    params = os.path.join(seen_dir, "_params.json")
    if os.path.exists(params):  # carry the LSH-config pin across the swap
        shutil.copy(params, os.path.join(tmp, "_params.json"))
    shutil.rmtree(seen_dir, ignore_errors=True)
    shutil.move(tmp, seen_dir)


def dedup_near_stream(
    docs: DataFrame,
    seen_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    trigger: dict | None = None,
    query_name: str | None = None,
):
    """Continuous MinHash-LSH near-dedup: every micro-batch keeps only
    documents that near-duplicate nothing seen before (across batches —
    unbounded lookback via the ``seen_dir`` bucket store, NOT
    watermark-bounded like :func:`dedup_exact_stream`) and nothing
    earlier within the batch.  Survivors land in
    ``sink_dir/batch=<id>``; their buckets register in ``seen_dir``.

    Write order per batch: survivors (overwrite), then buckets
    (overwrite), both keyed by batch id — a replay at ANY crash point
    recomputes the identical survivor set (the increment excludes the
    current batch's own buckets from history), so the sink is
    exactly-once up to overwrite.  Returns the StreamingQuery."""
    if not docs.isStreaming:
        raise ValueError("dedup_near_stream expects a streaming DataFrame")
    spark = docs.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        survivors = near_dedup_increment(
            batch_df, seen_dir, batch_id, text_col, id_col,
            num_hashes, bands, shingle_k,
        )
        path = f"{sink_dir}/batch={batch_id}"
        survivors.write.mode("overwrite").parquet(path)
        stable = spark.read.parquet(path)
        register_seen_buckets(
            stable, seen_dir, batch_id, text_col, id_col,
            num_hashes, bands, shingle_k,
        )

    writer = (
        docs.writeStream.foreachBatch(handle)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if query_name:
        writer = writer.queryName(query_name)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
