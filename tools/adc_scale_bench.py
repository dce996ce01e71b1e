"""ADC vs decode+GEMM on a real IVFPQ probe at scale.

    SPARK_DRIVER_MEM=48g python tools/adc_scale_bench.py [N] [dim] [nlist]

Builds IVF<nlist>,PQ16 over N synthetic vectors (distributed generation,
deterministic), then times single-query ``ann_search`` (the
ADC-routed shape — per-cell query lists of size 1) against the same
search with the ADC route disabled (ADC_MAX_NQ=0 forces the
decode+GEMM path).  Asserts both routes return identical row ids.
Prints one JSON line; the measured row lives in ROADMAP.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    nlist = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    import numpy as np
    import pandas as pd

    from duckdb_annsearch_spark import AnnEngine
    from duckdb_annsearch_spark.index import kernels
    from duckdb_annsearch_spark.session import get_spark

    spark = get_spark("adc-scale")

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(int(ids[0]) + 1)
            x = rng.standard_normal((len(ids), dim)).astype(np.float32)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(x)})

    df = (
        spark.range(n)
        .repartition(64)
        .mapInPandas(gen, f"vec_id long, embedding array<float>")
    )
    eng = AnnEngine(spark, workdir=tempfile.mkdtemp(prefix="adc_scale_"))
    eng.register_table("vecs", df, row_id="vec_id")
    t0 = time.time()
    eng.create_index(
        "ivfpq", "vecs", "embedding", engine="faiss",
        description=f"IVF{nlist},PQ16", nprobe=nlist,
    )
    build_wall = round(time.time() - t0, 1)
    print(f"# build: {build_wall}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    queries = [rng.standard_normal(dim).astype(np.float32).tolist() for _ in range(5)]

    def probe_all(tag):
        walls, ids = [], []
        for q in queries:
            t = time.time()
            rows = eng.ann_search("vecs", "ivfpq", q, k=10, nprobe=nlist).collect()
            walls.append(time.time() - t)
            ids.append(tuple(r["vec_id"] for r in rows))
            print(f"# {tag}: {walls[-1]:.2f}s", file=sys.stderr)
        return walls, ids

    # warm THOROUGHLY (worker startup + OS page cache over the full
    # artifact): the first cold queries measured 2x the steady state and
    # biased whichever route ran first
    for _ in range(3):
        eng.ann_search("vecs", "ivfpq", queries[0], k=10, nprobe=nlist).collect()

    adc_walls, adc_ids = probe_all("adc")
    saved = kernels.ADC_MAX_NQ
    try:
        kernels.ADC_MAX_NQ = 0  # force decode+GEMM
        gemm_walls, gemm_ids = probe_all("gemm")
    finally:
        kernels.ADC_MAX_NQ = saved
    # second ADC pass on the now-identically-warm state guards against
    # drift across the run
    adc2_walls, adc2_ids = probe_all("adc2")
    assert adc_ids == gemm_ids == adc2_ids, "route results diverged"

    print(
        json.dumps(
            {
                "n": n, "dim": dim, "nlist": nlist, "pq_m": 16,
                "build_wall_sec": build_wall,
                "adc_s_per_query": round(sum(adc_walls) / len(adc_walls), 2),
                "gemm_s_per_query": round(sum(gemm_walls) / len(gemm_walls), 2),
                "adc2_s_per_query": round(sum(adc2_walls) / len(adc2_walls), 2),
                "identical_results": True,
            }
        )
    )


if __name__ == "__main__":
    main()
