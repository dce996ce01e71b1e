"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Query shape mirrors the reference bench (bench/metal_diskann_bench.sql:8-100:
vector top-k, k=10, queries drawn from the table itself) plus the relational
and pipeline headliners.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    import __spark_entry__ as entrymod
    from duckdb_annsearch_spark.session import get_spark

    spark = get_spark("bench")

    qs = entrymod.queries()
    bench_queries = [
        # ANN / vector (the reference's own bench shape)
        "topk_l2",
        "vector_distances",
        "knn_join",
        "ann_search_flat",
        "ann_batch_flat",
        "ivf_full_probe",
        "graph_topk",
        "hybrid_rrf",
        # pipeline
        "minhash_sigs",
        "lsh_pairs",
        "simhash",
        "jaccard_pairs",
        "neardup_embeddings",
        "doc_stats",
        # relational
        "pricing_summary",
        "top_orders",
        "events_sessionize",
    ]

    timings = {}
    t_start = time.time()
    # warm the engine (Flat/IVF/graph/FTS index builds) as its own entry so
    # search timings measure search, not DDL
    t0 = time.time()
    entrymod._engine_for(spark, sf_dir)
    timings["index_build"] = round(time.time() - t0, 3)
    print(f"# index_build: {timings['index_build']}s", file=sys.stderr)
    for name in bench_queries:
        fn = qs[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()  # force full execution
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
    total = round(time.time() - t_start, 3)

    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
