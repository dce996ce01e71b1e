"""k-NN join: every left row -> its k nearest right rows.

The reference reaches this shape via LATERAL per-row top-k
(``/root/reference/bench/metal_diskann_bench.sql:30-37``) and the batched
brute-force GPU path (SURVEY §2.3 R8).  Spark-first rendering: broadcast
the smaller (right) side as a numpy matrix and GEMM it against each left
partition — per-partition batched top-k, no crossJoin row explosion, no
shuffle beyond the final per-query merge (none needed: each left row's
top-k is complete within its own task).

For a right side too big to broadcast, build a Flat/IVF index on it and use
``AnnEngine.ann_search_table`` instead (query-distributed artifact scan).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from duckdb_annsearch_spark.index import kernels


def knn_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_vec: str,
    right_id: str,
    right_vec: str,
    k: int,
    metric: str = "l2",
) -> DataFrame:
    """(left_id, right_id, _distance) — exact k nearest right rows per left
    row, ascending distance, ties by right id."""
    from duckdb_annsearch_spark.shipping import ensure_shipped

    ensure_shipped(left.sparkSession)  # probe closure imports the package
    rows = right.select(right_id, right_vec).collect()
    rid = np.asarray([r[0] for r in rows], dtype=np.int64)
    mat = np.asarray([r[1] for r in rows], dtype=np.float32)
    dim = mat.shape[1] if mat.ndim == 2 else 0
    bc = left.sparkSession.sparkContext.broadcast((rid, mat))

    out_l, out_r = f"{left_id}", "__rid"

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rids, m = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = kernels.stack_vectors(pdf[left_vec], dim)
            d = kernels.pairwise_distances(q, m, metric)
            outs = []
            for i in range(d.shape[0]):
                sel = kernels.local_topk(d[i], k)
                outs.append(
                    pd.DataFrame(
                        {
                            out_l: np.full(len(sel), pdf[left_id].iloc[i]),
                            out_r: rids[sel],
                            "_distance": d[i, sel],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    res = left.select(left_id, left_vec).mapInPandas(
        probe, f"{out_l} long, {out_r} long, _distance float"
    )
    return res.withColumnRenamed(out_r, right_id if right_id != left_id else f"r_{right_id}")
