"""PCA pretransform (FAISS ``PCAMatrix`` — factory prefix ``PCA<dout>``,
``src/faiss_index.cpp:39-60`` forwards such strings to ``index_factory``).

The engine keeps every probe original-space, the same trick OPQ uses: codes
store the *reduced* f32 coordinates ``y = W (x - mean)`` (``W`` = top-dout
principal components, orthonormal rows), and the shared ``decode_codes``
path reconstructs ``x_hat = W^T y + mean`` before the distance GEMM.  The
reconstruction drops only the variance outside the subspace, so code-space
ranking is an approximation and the rerank recipe (overfetch + exact
re-score on the full-precision column) restores exactness — identical
serving shape to SQ/PQ.

Training: deterministic stride sample (the PQ sampler), mean + SVD of the
centered sample; ``W`` persisted as one npy beside the artifact like the PQ
codebooks.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from duckdb_annsearch_spark.index import kernels

PCA_FILE = "_pca_matrix.npz"  # "_"-prefix: ignored by Spark + pyarrow


def train_pca(sample: np.ndarray, dout: int) -> tuple[np.ndarray, np.ndarray]:
    """(mean (d,), W (dout, d)) from an (n, d) f32 sample.  W rows are the
    top-``dout`` right singular vectors of the centered sample — orthonormal,
    so the reconstruction is the orthogonal projection onto the subspace.
    Signs are fixed (largest-|coef| positive per row) for determinism across
    LAPACK builds."""
    x = np.asarray(sample, dtype=np.float64)
    d = x.shape[1]
    if not (0 < dout <= d):
        raise ValueError(f"PCA output dim must be in [1, {d}], got {dout}")
    mean = x.mean(axis=0) if len(x) else np.zeros(d)
    if len(x) < 2:
        # degenerate sample: identity-truncation basis keeps the pipeline
        # alive (empty-table CREATE INDEX; vacuum re-trains on real rows)
        w = np.eye(d)[:dout]
        return mean.astype(np.float32), w.astype(np.float32)
    # full matrices when the sample is rank-deficient (n-1 < dout): the
    # complete right-singular basis pads the principal rows with an
    # orthonormal completion, so W always has dout orthonormal rows
    _, _, vt = np.linalg.svd(x - mean, full_matrices=len(x) < d + 1)
    w = vt[:dout]
    sign = np.sign(w[np.arange(dout), np.abs(w).argmax(axis=1)])
    sign[sign == 0] = 1.0
    w = w * sign[:, None]
    return mean.astype(np.float32), w.astype(np.float32)


def add_pca_codes(
    artifact: DataFrame, dim: int, mean: np.ndarray, w: np.ndarray
) -> DataFrame:
    """codes = f32 bytes of ``W (x - mean)`` — 4*dout per row (column-pruned
    probes then read dout/dim of the vector bytes)."""
    mn = np.asarray(mean, dtype=np.float32)
    wt = np.asarray(w, dtype=np.float32).T  # (d, dout)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = kernels.stack_vectors(pdf["vector"], dim)
            y = (x - mn) @ wt
            pdf = pdf.copy()
            pdf["codes"] = [y[i].tobytes() for i in range(y.shape[0])]
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in artifact.schema.fields)
    return artifact.mapInPandas(encode, schema + ", codes binary")


def write_pca(artifact_dir: str, mean: np.ndarray, w: np.ndarray) -> None:
    np.savez(
        os.path.join(artifact_dir, PCA_FILE),
        mean=np.asarray(mean, dtype=np.float32),
        w=np.asarray(w, dtype=np.float32),
    )


def load_pca(artifact_dir: str) -> tuple[np.ndarray, np.ndarray]:
    z = np.load(os.path.join(artifact_dir, PCA_FILE))
    return z["mean"], z["w"]
