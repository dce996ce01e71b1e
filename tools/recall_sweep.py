"""Recall sweep: recall@k of the approximate search paths vs brute force.

    python tools/recall_sweep.py [sf_dir] [n_queries] [k]

Builds an IVFFlat and a DiskANN-style graph index over the embeddings
table, then sweeps the accuracy knobs (``nprobe`` for IVF,
``search_complexity`` for the graph) and prints one JSON line per setting:
``{"index": ..., "param": ..., "value": ..., "recall_at_k": ...,
"mean_probe_sec": ...}``. Ground truth is exact brute-force top-k
(the reference's own recall-test methodology,
``test/sql/diskann_streaming.test:44-49`` — its floor there is 0.7).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import numpy as np
    from pyspark.sql import functions as F

    from duckdb_annsearch_spark.engine import AnnEngine
    from duckdb_annsearch_spark.session import get_spark

    spark = get_spark("recall-sweep")
    eng = AnnEngine(spark, workdir=tempfile.mkdtemp(prefix="recall_sweep_"))
    emb = eng.register_table(
        "embeddings", os.path.join(sf_dir, "embeddings.parquet"), row_id="vec_id"
    )
    rows = emb.select("vec_id", "embedding").collect()
    x = np.asarray([r["embedding"] for r in rows], dtype=np.float32)
    ids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    qidx = np.linspace(0, len(rows) - 1, n_queries).astype(int)

    def truth(qi: int) -> set[int]:
        d = ((x - x[qi]) ** 2).sum(axis=1)
        return set(ids[np.argsort(d, kind="stable")[:k]].tolist())

    truths = {int(qi): truth(int(qi)) for qi in qidx}

    eng.create_index(
        "sw_ivf", "embeddings", "embedding",
        engine="faiss", index_type="IVFFlat", ivf_nlist=64,
    )
    eng.create_index("sw_graph", "embeddings", "embedding", engine="diskann")

    def sweep(index: str, param: str, values: list[int]) -> None:
        for v in values:
            hit = 0
            t0 = time.time()
            for qi in qidx:
                got = {
                    r["row_id"]
                    for r in eng.index_scan(
                        index, [float(f) for f in x[qi]], k, **{param: v}
                    ).collect()
                }
                hit += len(got & truths[int(qi)])
            dt = (time.time() - t0) / len(qidx)
            print(
                json.dumps(
                    {
                        "index": index,
                        "param": param,
                        "value": v,
                        "recall_at_k": round(hit / (k * len(qidx)), 3),
                        "mean_probe_sec": round(dt, 3),
                        "k": k,
                        "n_queries": len(qidx),
                        "sf_dir": sf_dir,
                    }
                )
            )

    sweep("sw_ivf", "nprobe", [1, 2, 4, 8, 16, 64])
    sweep("sw_graph", "search_complexity", [16, 32, 64, 128])


if __name__ == "__main__":
    main()
