"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Query shape mirrors the reference bench (bench/metal_diskann_bench.sql:8-100:
vector top-k, k=10, queries drawn from the table itself) plus the relational
and pipeline headliners.

MEASUREMENT CHANGE (round 5): queries are forced with a hash-all-columns
aggregate (``force_execution``) instead of ``.count()``.  A bare count let
Catalyst prune the payload of map-only queries (minhash_sigs, simhash,
doc_stats, pii_scrub, decontaminate, ...) down to a parquet row count —
those rows' r4 timings measured a file scan, not the operator.  Their
r4 -> r5 increases (e.g. minhash_sigs 0.42 -> ~2.4s) are the honest cost
becoming visible, not regressions; shuffle/agg-shaped queries were always
fully forced and are directly comparable across rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def compact_summary(payload: dict) -> tuple:
    """HARD size guard for the one-line bench record: the driver's tail
    capture is ~2.2 KB, and a summary past ~1.9 KB risks truncation
    ("parsed": null in BENCH_r06.json).  Degrades progressively —
    shorten error strings, coarsen timing precision, then spill the
    FASTEST query rows to a stderr detail dict (regressions live in the
    slow tail, so the summary keeps the rows a reader checks first) —
    and is total: any queries dict, however long, emits < 2 KB.
    Returns ``(line, spilled_rows)``."""
    payload = dict(payload)
    spill: dict = {}
    line = json.dumps(payload)
    if len(line) > 1900 and payload.get("errors"):
        payload["errors"] = {
            k: str(v)[:60] for k, v in payload["errors"].items()
        }
        line = json.dumps(payload)
    if len(line) > 1900:
        payload["queries"] = {
            k: round(float(v), 1) for k, v in payload["queries"].items()
        }
        line = json.dumps(payload)
    while len(line) > 1900 and payload["queries"]:
        fastest = min(payload["queries"], key=lambda k: payload["queries"][k])
        spill[fastest] = payload["queries"].pop(fastest)
        payload["queries_omitted"] = len(spill)
        line = json.dumps(payload)
    return line, spill


def micro_distance_bench() -> dict:
    """The reference's only published numbers are batch-L2 micro-benchmarks
    (BASELINE.md / README.md:134-146: 1 query x n candidates, µs/query).
    Same grid, same op, through the engine's actual probe kernel
    (``kernels.pairwise_distances`` — the numpy GEMM every search UDF runs),
    so BENCH and BASELINE are directly comparable."""
    import numpy as np

    from duckdb_annsearch_spark.index import kernels

    grid = [(64, 128), (64, 768), (128, 1536), (256, 1536), (512, 1536), (1024, 768)]
    rng = np.random.RandomState(0)
    out = {}
    for n, d in grid:
        x = rng.randn(n, d).astype(np.float32)
        q = rng.randn(1, d).astype(np.float32)
        kernels.pairwise_distances(q, x, "l2")  # warm
        # best-of-5 rounds of 50: this host's effective CPU speed swings
        # several-fold between windows; min is the capability number
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(50):
                kernels.pairwise_distances(q, x, "l2")
            best = min(best, (time.perf_counter() - t0) / 50)
        out[f"l2_us_n{n}_d{d}"] = round(best * 1e6, 1)
    return out


def force_execution(df) -> int:
    """Count rows while forcing EVERY output column to be computed.

    A bare ``.count()`` lets Catalyst prune the payload: map-only stages
    collapse to a parquet row count, and a left-outer join against a
    unique-keyed aggregate is eliminated outright — the timing then
    measures a file scan, not the operator (caught in round 5 when
    line_dedup "processed" 1M docs in 0.4s).  Hashing a struct of all
    columns under the aggregate pins the full computation; the hash adds
    ~ns/row, far below any operator's own cost."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.xxhash64(F.struct(*[F.col(c) for c in df.columns]))).alias("h"),
    ).collect()[0]
    return row["n"]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    # Micro kernel grid FIRST, before the Spark JVM exists: the grid measures
    # the probe kernel's single-core capability (BASELINE.md's comparison
    # point); 32 live executor threads contending for the same cores inflate
    # a 6 µs kernel call to ~9 µs and measure scheduler noise, not the kernel.
    errors = {}
    try:
        micro = micro_distance_bench()
    except Exception as exc:
        errors["micro"] = f"{type(exc).__name__}: {exc}"[:300]
        micro = {}

    import __spark_entry__ as entrymod
    from duckdb_annsearch_spark.session import get_spark

    spark = get_spark("bench")

    qs = entrymod.queries()
    bench_queries = [
        # ANN / vector (the reference's own bench shape)
        "topk_l2",
        "sql_topk",
        "vector_distances",
        "knn_join",
        "ann_search_flat",
        "ann_search_local",
        "ann_search_local_payload",
        "ann_batch_flat",
        "ivf_full_probe",
        "ivf_hier_probe",
        "graph_topk",
        "graph_pq_topk",
        "sq8_rerank",
        "sq4_rerank",
        "fp16_rerank",
        "pca_rerank",
        "lsh_rerank",
        "pq_rerank",
        "hybrid_rrf",
        # pipeline
        "stratified_sample",
        "quota_sample",
        "token_budget_mix",
        "minhash_sigs",
        "lsh_pairs",
        "dedup_clusters",
        "simhash",
        "jaccard_pairs",
        "neardup_embeddings",
        "semantic_dedup",
        "doc_stats",
        "corpus_stats",
        "pii_scrub",
        "repetition_stats",
        "decontaminate",
        "semantic_decontaminate",
        "lm_perplexity",
        "pack_chunks",
        "chunk_documents",
        "line_dedup",
        "dup_ngram_stats",
        "winnow_pairs",
        "remove_dup_spans",
        "quality_classifier",
        "bpe_merges",
        "neardup_stream_batch",
        # round-5 third-session operators
        "gopher_filter",
        "c4_filter",
        "dedup_against",
        "dedup_against_bloom",
        "url_curation",
        "url_dedup",
        "vocab_topk",
        "bigram_counts",
        "pca_ivf_rerank",
        # relational / temporal
        "pricing_summary",
        "top_orders",
        "events_sessionize",
        "events_asof",
        "events_range_agg",
    ]

    timings = {}
    t_start = time.time()
    # warm the engine (Flat/IVF/graph/FTS index builds) as its own entry so
    # search timings measure search, not DDL.  Round-5 note: index_build
    # grew r4 -> r5 (43.6s -> ~74s) because the warm family grew 13 -> 19
    # indexes — the full factory surface now builds SQ4/SQfp16/PCA32/LSH256/
    # PCA32+IVF8 plus a SECOND sharded graph (OPQ) so their bench queries
    # measure search only; per-index build cost is flat.
    t0 = time.time()
    try:
        # the two warm engines are fully independent (separate AnnEngine
        # instances, separate workdirs, engine-local table registry) and
        # each already parallelizes its own DDL — overlap them too so the
        # 18-index warm-up is bounded by the slower family, not the sum
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(2) as ex:
            fa = ex.submit(entrymod._engine_for, spark, sf_dir)
            fb = ex.submit(entrymod._sq8_engine_for, spark, sf_dir)
            fa.result()
            fb.result()
        timings["index_build"] = round(time.time() - t0, 3)
        # Per-index walls (concurrent, so they overlap) go to STDERR ONLY:
        # round 6 put them in the summary JSON and the line outgrew the
        # driver's ~2.2 KB tail capture ("parsed": null).  The summary line
        # must stay compact; regressions per index remain visible below.
        print("# BENCH_DETAIL "
              + json.dumps({"index_build_per_index":
                            dict(sorted(entrymod.BUILD_TIMINGS.items()))}),
              file=sys.stderr)
        print(f"# index_build: {timings['index_build']}s", file=sys.stderr)
    except Exception as exc:
        errors["index_build"] = f"{type(exc).__name__}: {exc}"[:300]
        print(f"# index_build: ERROR {errors['index_build']}", file=sys.stderr)
    # the driver-local single-query hot path (ann_search(local=True) minus
    # the k-row relation wrapper): the number comparable to the reference's
    # in-process µs/query serving (README.md:134-146)
    local_us = None
    try:
        eng = entrymod._engine_for(spark, sf_dir)
        eng.register_table(
            "embeddings_kv",
            spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
                "vec_id", "embedding"
            ),
            row_id="vec_id",
        )
        t = eng.table("embeddings_kv")
        idx = eng.get_index("emb_flat")
        q = entrymod._qvec(spark, sf_dir)
        eng._local_topk_rows(t, idx, q, 10)  # warm the snapshot
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(20):
                eng._local_topk_rows(t, idx, q, 10)
            best = min(best, (time.perf_counter() - t0) / 20)
        local_us = round(best * 1e6, 1)
        print(f"# local_single_query_us: {local_us}", file=sys.stderr)
        # concurrent serving over ONE warm snapshot (round-7 verdict
        # item 6): the snapshot is read-only numpy, the GEMM releases the
        # GIL, so N callers should scale near-linearly — measure it.
        # Detail line only; the summary JSON stays compact.
        per_thread = 50
        qps = {}
        for nt in (1, 2, 4, 8):
            def _worker(_i):
                for _ in range(per_thread):
                    eng._local_topk_rows(t, idx, q, 10)
            t0 = time.perf_counter()
            with ThreadPoolExecutor(nt) as ex:
                list(ex.map(_worker, range(nt)))
            qps[str(nt)] = round(nt * per_thread / (time.perf_counter() - t0))
        # the engine's actual concurrent-serving answer: ONE GEMM scores
        # the whole query block (threaded single-query is GIL-bound glue)
        batch_q = [q] * 256
        eng._local_topk_rows_batch(t, idx, batch_q, 10)  # warm
        best = float("inf")
        for _ in range(3):  # best-of-3: BLAS thread scheduling swings 2-3x
            t0 = time.perf_counter()
            eng._local_topk_rows_batch(t, idx, batch_q, 10)
            best = min(best, time.perf_counter() - t0)
        qps["batch256"] = round(256 / best)
        print("# BENCH_DETAIL " + json.dumps({"local_qps_by_threads": qps}),
              file=sys.stderr)
    except Exception as exc:
        errors["local_single_query"] = f"{type(exc).__name__}: {exc}"[:300]

    for name in bench_queries:
        fn = qs[name]
        # the ann_search_local row times the Spark wrap (force_execution
        # runs an aggregate job over the k-row relation), NOT the serving
        # hot path — that is local_single_query_us above.  Renamed so the
        # ~0.5 s wrap is never read as the serving latency.
        key = "ann_search_local_wrapped" if name == "ann_search_local" else name
        t0 = time.time()
        try:
            n = force_execution(fn(spark, sf_dir))
        except Exception as exc:  # one broken query must never zero the round
            errors[key] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {key}: ERROR {errors[key]}", file=sys.stderr)
            continue
        timings[key] = round(time.time() - t0, 3)
        print(f"# {key}: {timings[key]}s ({n} rows)", file=sys.stderr)
    total = round(time.time() - t_start, 3)

    payload = {
        "metric": "bench_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "micro_us_per_query": micro,
        "local_single_query_us": local_us,
        "sf": sf,
    }
    line, spilled = compact_summary(payload)
    if spilled:
        print("# BENCH_DETAIL " + json.dumps({"queries_spilled": spilled}),
              file=sys.stderr)
    print(f"# summary_bytes: {len(line)}", file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()
