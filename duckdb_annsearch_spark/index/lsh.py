"""LSH binary codes (FAISS ``IndexLSH`` — factory string ``"LSH"``,
``src/faiss_index.cpp:39-60`` forwards it to ``index_factory``).

Codes are hyperplane sign bits: ``bit_j = sign(h_j . (x - mean))`` for a
seeded Gaussian projection ``H (nbits, d)``, packed MSB-first to
``ceil(nbits/8)`` bytes (1 bit/dim at the default ``nbits = d`` — the
narrowest code in the family).  Candidate ranking is Hamming distance,
realised through the engine's one GEMM path: the shared decoder maps stored
bits to ±1 vectors and ``transform_queries`` maps the query the same way,
so squared-L2 between the ±1 images equals ``4 * hamming`` — identical
ordering, no separate popcount kernel, and a forgotten transform fails
loudly on the GEMM shape.  Exact serving uses the rerank recipe (overfetch
from the codes, exact re-score on the full-precision column), same as
SQ/PQ/PCA.

The projection is drawn from a fixed seed and ALSO persisted beside the
artifact (restart safety does not depend on RandomState reproducibility).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from duckdb_annsearch_spark.index import kernels

LSH_FILE = "_lsh_planes.npz"  # "_"-prefix: ignored by Spark + pyarrow
LSH_SEED = 0x15A5D5


def lsh_planes(dim: int, nbits: int) -> np.ndarray:
    """(nbits, dim) float32 Gaussian hyperplane normals, deterministic."""
    if nbits <= 0:
        raise ValueError(f"LSH nbits must be positive, got {nbits}")
    rng = np.random.RandomState((LSH_SEED ^ (dim * 1315423911 + nbits)) & 0xFFFFFFFF)
    return rng.randn(nbits, dim).astype(np.float32)


def train_lsh(sample: np.ndarray, dim: int, nbits: int) -> tuple[np.ndarray, np.ndarray]:
    """(mean (d,), H (nbits, d)): centering the data before the sign test
    balances the bit distribution (faiss IndexLSH train_thresholds
    equivalent, one threshold per plane folded into the mean)."""
    x = np.asarray(sample, dtype=np.float64)
    mean = x.mean(axis=0) if len(x) else np.zeros(dim)
    return mean.astype(np.float32), lsh_planes(dim, nbits)


def encode_lsh(x: np.ndarray, mean: np.ndarray, h: np.ndarray) -> np.ndarray:
    """(n, d) f32 -> (n, ceil(nbits/8)) packed sign bits."""
    bits = ((x - mean) @ h.T) >= 0.0
    return np.packbits(bits, axis=1)


def add_lsh_codes(
    artifact: DataFrame, dim: int, mean: np.ndarray, h: np.ndarray
) -> DataFrame:
    mn = np.asarray(mean, dtype=np.float32)
    hp = np.asarray(h, dtype=np.float32)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = kernels.stack_vectors(pdf["vector"], dim)
            c = encode_lsh(x, mn, hp)
            pdf = pdf.copy()
            pdf["codes"] = [c[i].tobytes() for i in range(c.shape[0])]
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in artifact.schema.fields)
    return artifact.mapInPandas(encode, schema + ", codes binary")


def write_lsh(artifact_dir: str, mean: np.ndarray, h: np.ndarray) -> None:
    np.savez(
        os.path.join(artifact_dir, LSH_FILE),
        mean=np.asarray(mean, dtype=np.float32),
        h=np.asarray(h, dtype=np.float32),
    )


def load_lsh(artifact_dir: str) -> tuple[np.ndarray, np.ndarray]:
    z = np.load(os.path.join(artifact_dir, LSH_FILE))
    return z["mean"], z["h"]
