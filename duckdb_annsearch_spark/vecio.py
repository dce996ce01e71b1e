"""Vector-file interop: the reference's packed binary vector format and
text-format table reads.

The reference's out-of-core build consumes ``[u32 N][u32 D][f32 * N * D]``
little-endian files (``src/diskann_functions.cpp:140-156``,
``rust_lib/src/streaming_build.rs:42-76``).  Here the same format is read
DISTRIBUTEDLY: the 8-byte header is parsed driver-side, then each task
seeks directly to its row range — no driver materialization, so a 100 GB
vector file loads as an ordinary DataFrame provided the path is visible to
executors (shared FS / object store via a local mount; on local[*] any
path works).  The writer streams partitions through the driver one at a
time (``toLocalIterator``) — bounded memory, exact format parity.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HEADER_BYTES = 8  # u32 num_vectors | u32 dimension (little-endian)


def read_packed_vectors(
    spark: SparkSession, path: str, rows_per_task: int = 65536
) -> DataFrame:
    """(row_id LONG, vector ARRAY<FLOAT>) from a packed vector file.

    ``row_id`` is the 0-based position in the file — the same ids the
    reference's labels would carry for this input."""
    import os

    with open(path, "rb") as f:
        head = f.read(HEADER_BYTES)
    if len(head) < HEADER_BYTES:
        raise ValueError(f"{path!r} is too short for a packed vector header")
    n, dim = struct.unpack("<II", head)
    if n == 0 or dim == 0:
        raise ValueError(f"{path!r} declares zero vectors or zero dimension")
    expected = HEADER_BYTES + n * dim * 4
    actual = os.path.getsize(path)
    if actual < expected:
        # fail loudly up front — a truncated copy would otherwise surface
        # as a cryptic reshape error deep inside an executor task
        raise ValueError(
            f"{path!r} is truncated: header declares {n} x {dim} f32 "
            f"({expected} bytes), file has {actual}"
        )
    nchunks = -(-n // rows_per_task)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # sub-batch the per-task range: one pandas frame per ~8k rows of
        # float32 ndarrays (Arrow converts ndarray rows without expanding
        # to Python floats) — per-task peak stays ~a few MB regardless of
        # rows_per_task, which only controls seek granularity
        sub = 8192
        for pdf in batches:
            for c in pdf["id"]:
                start = int(c) * rows_per_task
                cnt = min(rows_per_task, n - start)
                if cnt <= 0:
                    continue
                with open(path, "rb") as f:
                    f.seek(HEADER_BYTES + start * dim * 4)
                    for off in range(0, cnt, sub):
                        take = min(sub, cnt - off)
                        buf = np.frombuffer(
                            f.read(take * dim * 4), dtype="<f4"
                        ).reshape(take, dim)
                        yield pd.DataFrame(
                            {
                                "row_id": np.arange(
                                    start + off, start + off + take, dtype=np.int64
                                ),
                                "vector": pd.Series(list(buf)),
                            }
                        )

    par = max(1, spark.sparkContext.defaultParallelism)
    return (
        spark.range(nchunks)
        .repartition(min(nchunks, par))
        .mapInPandas(gen, "row_id long, vector array<float>")
    )


def write_packed_vectors(
    df: DataFrame, path: str, vector_col: str = "vector"
) -> tuple[int, int]:
    """Write a packed vector file; returns ``(num_vectors, dimension)``.
    Rows stream through the driver partition-by-partition (bounded
    memory, ONE pass — the dimension comes from the first row and the
    header is patched at the end); NULL vectors are skipped (not
    representable in the format)."""
    n, dim = 0, None
    with open(path, "wb") as f:
        f.write(struct.pack("<II", 0, 0))  # patched after the scan
        for row in (
            df.where(F.col(vector_col).isNotNull())
            .select(vector_col)
            .toLocalIterator()
        ):
            v = np.asarray(row[0], dtype="<f4")
            if dim is None:
                dim = int(v.shape[0])
            if v.shape != (dim,):
                raise ValueError(
                    f"ragged vector of length {v.shape} (expected {dim})"
                )
            f.write(v.tobytes())
            n += 1
        if dim is None:
            raise ValueError("write_packed_vectors: no non-NULL vectors")
        f.seek(0)
        f.write(struct.pack("<II", n, dim))
    return n, dim


def read_table_auto(spark: SparkSession, path: str) -> DataFrame:
    """Format-inferred table read for ``register_table(path)``: .csv (with
    header + schema inference — the reference's test corpus COPYs from
    CSV), .json/.jsonl, .bin/.fbin (packed vectors), else parquet."""
    low = path.lower()
    if low.endswith(".csv"):
        return spark.read.csv(path, header=True, inferSchema=True)
    if low.endswith((".json", ".jsonl")):
        return spark.read.json(path)
    if low.endswith((".bin", ".fbin")):
        return read_packed_vectors(spark, path)
    return spark.read.parquet(path)
