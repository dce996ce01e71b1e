"""Streaming near-dedup throughput: drive ``dedup_near_stream`` over a
multi-batch synthetic corpus (planted exact + near dups across batches)
and report docs/s per micro-batch plus end-to-end dedup efficacy.

Usage: python tools/neardup_stream_bench.py [n_batches] [docs_per_batch]

Corpus: every 20th doc copies its predecessor byte-for-byte (exact dup)
and every 13th copies it with one token swapped (true near dup, ~0.94
shingle-Jaccard — caught by banding, invisible to exact hashing).  Ids
are globally sequential with one file per batch, so a dup's source
regularly sits in an EARLIER batch: cross-batch suppression via the
persistent bucket store is exercised, not just in-batch bucket-min.
Expected drop rate ~ 1/20 + 1/13 ~ 12.6%.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    import numpy as np
    import pandas as pd

    from duckdb_annsearch_spark.session import get_spark
    from duckdb_annsearch_spark.streaming import dedup_near_stream

    spark = get_spark("neardup-stream-bench")
    base = tempfile.mkdtemp(prefix="neardup_stream_")
    src = os.path.join(base, "src")
    seen = os.path.join(base, "seen")
    sink = os.path.join(base, "sink")
    ckpt = os.path.join(base, "ckpt")

    vocab = np.array([f"w{i:04d}" for i in range(1000)])
    L = 100

    def splitmix(z):
        z = (z + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
            0xFFFFFFFFFFFFFFFF
        )
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
            0xFFFFFFFFFFFFFFFF
        )
        return z ^ (z >> np.uint64(31))

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            exact = (ids % 20 == 0) & (ids > 0)
            near = (ids % 13 == 0) & ~exact & (ids > 0)
            src_ids = np.where(exact | near, ids - 1, ids)
            idx = src_ids.astype(np.uint64)[:, None] * np.uint64(L) + np.arange(
                L, dtype=np.uint64
            )
            words = vocab[(splitmix(idx) % np.uint64(len(vocab))).astype(np.int64)]
            words[near, 1] = "zznear"  # one-token swap: near, not exact
            texts = [" ".join(row) for row in words]
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    # one parquet dir per batch; ids are globally sequential so every
    # 20th doc's source sits at id-1 — possibly in the previous file
    t0 = time.time()
    for b in range(n_batches):
        (
            spark.range(b * per_batch, (b + 1) * per_batch)
            .repartition(32)
            .mapInPandas(gen, "doc_id long, text string")
            # 8 files per batch + maxFilesPerTrigger=8: batch boundaries
            # stay aligned with the planted waves while the micro-batch
            # pipeline keeps 8-way scan parallelism (1 file = 1 task for
            # every map stage of the increment)
            .coalesce(8)
            .write.mode("overwrite")
            .parquet(os.path.join(src, f"f{b}"))
        )
    gen_wall = round(time.time() - t0, 1)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 8)
        .parquet(os.path.join(src, "*"))
    )
    t0 = time.time()
    q = dedup_near_stream(
        stream, seen, sink, ckpt, trigger={"availableNow": True},
        query_name="neardup-bench",
    )
    q.awaitTermination(3600)
    total_wall = round(time.time() - t0, 1)
    walls = [
        p["durationMs"]["triggerExecution"]
        for p in q.recentProgress
        if p.get("numInputRows")
    ]

    n_in = n_batches * per_batch
    n_out = spark.read.parquet(sink).count()
    # efficacy reference: the SAME protocol as one batch over the whole
    # corpus (empty history == pure bucket-min in id order) — the stream,
    # whose arrival order is id order here, must drop the same docs
    from duckdb_annsearch_spark.streaming import near_dedup_increment

    ref_seen = os.path.join(base, "ref_seen")
    batch_out = near_dedup_increment(
        spark.read.parquet(os.path.join(src, "*")), ref_seen, 0
    ).count()
    print(
        json.dumps(
            {
                "n_batches": n_batches,
                "docs_per_batch": per_batch,
                "gen_wall_sec": gen_wall,
                "stream_wall_sec": total_wall,
                "docs_per_sec": round(n_in / total_wall) if total_wall else None,
                "batch_trigger_ms": walls,
                "docs_in": n_in,
                "docs_out": n_out,
                "dropped": n_in - n_out,
                "batch_reference_out": batch_out,
            }
        )
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
