"""Numpy distance kernels + the partition-parallel batch top-k probe.

These are the Spark mapping of the reference's SIMD/GPU batch distance layer
(``/root/reference/rust_lib/src/distance.rs``, lock-step batch search in
``rust_lib/src/provider.rs:243-440``): inside each Arrow batch we amortize
distance work across all queries with one float32 GEMM — the same idea as the
reference's batched Metal/SIMD dispatch, but per Spark partition, so the work
distributes across executors.

Semantics (lower = better, identical to ``functions.distance.metric_distance``):
  l2     -> squared euclidean
  ip     -> negated dot product
  cosine -> 1 - cosine similarity
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PROBE_SCHEMA = "query_idx int, row_id long, _distance float"


def pairwise_distances(queries: np.ndarray, cands: np.ndarray, metric: str) -> np.ndarray:
    """(nq, n) float32 distance matrix; one GEMM for the whole batch.

    nq==1 takes GEMV fast paths: the GEMM identity's extra numpy dispatches
    (~1 µs each) dominate at single-query sizes, and a direct
    ``einsum('ij,ij->i')`` halves the wall time at every grid point of the
    reference's micro bench (BASELINE.md). Small problems (n*d <= ~24k)
    fuse the subtraction instead — fewer passes win when the data fits L2
    cache; above that the norms identity wins (one read of x, no (n,d)
    temp)."""
    q = np.ascontiguousarray(queries, dtype=np.float32)
    x = np.ascontiguousarray(cands, dtype=np.float32)
    if metric == "l2" and q.shape[0] == 1:  # squared L2, single query
        qv = q[0]
        if x.size <= 24576:
            diff = x - qv
            d = np.einsum("ij,ij->i", diff, diff)
        else:
            d = np.einsum("ij,ij->i", x, x)
            d -= 2.0 * (x @ qv)
            d += qv @ qv
            np.maximum(d, 0.0, out=d)
        return d[None, :]
    if metric == "ip":
        if q.shape[0] == 1:
            return -(x @ q[0])[None, :]
        return -(q @ x.T)
    if metric == "cosine":
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        if q.shape[0] == 1:
            return (1.0 - xn @ qn[0])[None, :].astype(np.float32, copy=False)
        return (1.0 - qn @ xn.T).astype(np.float32)
    # squared L2 via ||q||^2 - 2 q.x + ||x||^2 (one GEMM), clamped at 0;
    # einsum for the candidate norms avoids the (n, d) x*x temporary
    d = (
        (q * q).sum(axis=1, keepdims=True)
        - 2.0 * (q @ x.T)
        + np.einsum("ij,ij->i", x, x)[None, :]
    )
    return np.maximum(d, 0.0, out=d).astype(np.float32, copy=False)


def local_topk(dist_row: np.ndarray, k: int, ids: np.ndarray | None = None) -> np.ndarray:
    """Indices of the k smallest entries, ascending by (value, id).

    ``ids`` defaults to position. Ties that straddle the k boundary are
    resolved by the smallest id — plain ``argpartition`` keeps an arbitrary
    subset of boundary ties, which breaks the engine's documented
    "ties by row_id" determinism across partitionings (duplicate vectors
    are the common trigger)."""
    n = dist_row.shape[0]
    if ids is None:
        ids = np.arange(n)
    if k >= n:
        return np.lexsort((ids, dist_row))
    part = np.argpartition(dist_row, k - 1)
    kth = dist_row[part[k - 1]]
    below = np.flatnonzero(dist_row < kth)
    ties = np.flatnonzero(dist_row == kth)
    need = k - below.size
    if need < ties.size:
        ties = ties[np.argsort(ids[ties], kind="stable")[:need]]
    sel = np.concatenate([below, ties])
    return sel[np.lexsort((ids[sel], dist_row[sel]))]


def stack_vectors(series: pd.Series, dim: int) -> np.ndarray:
    """pandas Series of list/ndarray -> (n, dim) float32; bad rows -> zeros.

    NULL / wrong-dim vectors become the zero vector — the reference leaves its
    gather buffer zeroed for those rows (``src/ann_search.cpp:860-865``).
    """
    out = np.zeros((len(series), dim), dtype=np.float32)
    for i, v in enumerate(series):
        if v is not None:
            a = np.asarray(v, dtype=np.float32)
            if a.shape == (dim,):
                out[i] = a
    return out


def probe_partitions(
    artifact: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int,
    metric: str,
    dim: int,
    vector_col: str = "vector",
    row_id_col: str = "row_id",
    dequantize: dict | None = None,
) -> DataFrame:
    """Distributed batch brute-force top-k.

    Map side: per Arrow batch, one GEMM for all queries, local top-k per query
    (bounded memory: ``nq*k`` rows out per batch).  Reduce side: window
    ``row_number`` per query — only ``nq * k * n_partitions`` rows shuffle,
    never the data.  Returns (query_idx, row_id, _distance) with exactly the
    global top-k per query, ties broken by row_id.
    """
    qarr = np.asarray([q for _, q in queries], dtype=np.float32)
    qidx = np.asarray([i for i, _ in queries], dtype=np.int32)
    dq = dequantize  # {'mins': [...], 'scales': [...]} for SQ8 artifacts

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if dq is not None:
                codes = np.stack(
                    [np.frombuffer(b, dtype=np.uint8) for b in pdf[vector_col]]
                ).astype(np.float32)
                mins = np.asarray(dq["mins"], dtype=np.float32)
                scales = np.asarray(dq["scales"], dtype=np.float32)
                x = codes / 255.0 * scales + mins
            else:
                x = stack_vectors(pdf[vector_col], dim)
            d = pairwise_distances(qarr, x, metric)
            rid = pdf[row_id_col].to_numpy()
            outs = []
            for qi in range(d.shape[0]):
                sel = local_topk(d[qi], k, ids=rid)
                outs.append(
                    pd.DataFrame(
                        {
                            "query_idx": np.full(len(sel), qidx[qi], dtype=np.int32),
                            "row_id": rid[sel].astype(np.int64),
                            "_distance": d[qi, sel],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    partial = artifact.select(row_id_col, vector_col).mapInPandas(probe, PROBE_SCHEMA)
    w = Window.partitionBy("query_idx").orderBy(
        F.col("_distance").asc(), F.col("row_id").asc()
    )
    return (
        partial.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
