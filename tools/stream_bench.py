"""Rate-limited continuous ANN benchmark.

Drives :func:`duckdb_annsearch_spark.streaming.ann_search_stream` with
Spark's built-in ``rate`` source — an unbounded, rate-limited generator —
so sustained streaming k-NN throughput is measured end to end (probe +
stream-static row-fetch join), not just one micro-batch.

    python tools/stream_bench.py [sf_dir] [rows_per_sec] [seconds] [k]

Prints one JSON line:
    {"metric": "stream_ann_throughput", "value": <processed rows/sec>, ...}

The query vector for row ``value`` is the embedding of ``value mod N`` from
a driver-collected sample — deterministic, no per-row randomness. Swap the
``rate`` source for ``kafka`` (``spark.readStream.format("kafka")
.option("kafka.bootstrap.servers", ...).option("subscribe", topic)``) and
parse the message value with
``duckdb_annsearch_spark.streaming.parse_vector_messages`` for a
production feed; the rest of the pipeline is identical. The kafka
connector jar is not bundled here, so the rate source is the runnable
benchmark (the parser itself is end-to-end tested against a file stream
carrying kafka-shaped payloads — tests/test_streaming.py).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> dict:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    rows_per_sec = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    from pyspark.sql import functions as F

    from duckdb_annsearch_spark.engine import AnnEngine
    from duckdb_annsearch_spark.session import get_spark
    from duckdb_annsearch_spark.streaming import ann_search_stream

    spark = get_spark("stream-bench")
    eng = AnnEngine(spark, workdir=tempfile.mkdtemp(prefix="stream_bench_"))
    eng.register_table(
        "embeddings", os.path.join(sf_dir, "embeddings.parquet"), row_id="vec_id"
    )
    eng.create_index(
        "bench_ivf", "embeddings", "embedding",
        engine="faiss", index_type="IVFFlat", ivf_nlist=64, nprobe=8,
    )

    # deterministic query pool: one embedding per `value % pool` (kept small
    # so the closure broadcast is tiny; real feeds carry their own vectors)
    pool = 256
    sample = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in eng.table("embeddings").df.where(F.col("vec_id") < pool).collect()
    }
    ids = sorted(sample)
    vecs = [sample[i] for i in ids]
    pool = len(vecs)

    queries = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .load()
        .select(
            F.col("value").alias("qid"),
            F.element_at(
                F.lit(vecs).cast("array<array<float>>"),
                (F.col("value") % pool + 1).cast("int"),
            ).alias("query"),
        )
    )
    out = ann_search_stream(
        eng, queries, "embeddings", "bench_ivf", k=k,
        query_col="query", id_col="qid",
    )
    q = (
        out.writeStream.format("noop")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="stream_bench_ckpt_"))
        .start()
    )
    time.sleep(seconds)
    if q.exception() is not None:
        raise RuntimeError(f"stream failed: {q.exception()}")
    progress = list(q.recentProgress)
    q.stop()

    # skip the cold-start batch; report steady-state processed rows/sec
    rates = [
        p["sources"][0].get("processedRowsPerSecond", 0.0)
        for p in progress[1:]
        if p.get("sources")
    ]
    done = sum(
        p["sources"][0].get("numInputRows", 0) for p in progress if p.get("sources")
    )
    batch_ms = [p.get("batchDuration", 0) for p in progress[1:]]
    result = {
        "metric": "stream_ann_throughput",
        "value": round(sum(rates) / len(rates), 1) if rates else 0.0,
        "unit": "queries/sec",
        "offered_rows_per_sec": rows_per_sec,
        "queries_processed": int(done),
        "k": k,
        "batches": len(progress),
        "mean_batch_ms": round(sum(batch_ms) / len(batch_ms), 1) if batch_ms else None,
        "sf_dir": sf_dir,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
