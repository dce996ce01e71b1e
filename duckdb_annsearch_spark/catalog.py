"""Engine-owned index catalog + tombstones.

The reference persists index metadata + serialized graphs inside the .duckdb
file via a custom index type registered in the DuckDB catalog
(``/root/reference/src/ann_extension.cpp:23-27``,
``src/diskann_index.cpp:408-546``).  Spark has no extensible catalog-object
storage, so the engine owns a directory tree (local FS here; an object-store
prefix on a cluster):

    <root>/<index_name>/meta.json            index metadata (see below)
    <root>/<index_name>/data/                parquet artifact(s)
    <root>/<index_name>/tombstones/          parquet (row_id BIGINT)

Deletes are tombstones, exactly like the reference's ``deleted_labels_``
(``src/diskann_index.cpp:363-385``): search compensates by over-fetching and
anti-joining, ``vacuum`` compacts by rebuilding without deleted rows
(``src/diskann_index.cpp:701-741``).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import asdict, dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FORMAT_VERSION = 2  # mirrors the reference's versioned header (DANN v2)

ROW_ID = "__row_id"

TOMBSTONE_SCHEMA = T.StructType([T.StructField("row_id", T.LongType(), False)])


@dataclass
class IndexMeta:
    name: str
    engine: str  # 'diskann' | 'faiss'
    index_type: str  # 'diskann' | 'flat' | 'hnsw' | 'ivfflat'
    table_name: str
    column: str
    dim: int
    metric: str  # 'l2' | 'ip' | 'cosine'
    params: dict[str, Any] = field(default_factory=dict)
    num_vectors: int = 0
    num_deleted: int = 0
    quantized: bool = False
    version: int = FORMAT_VERSION
    created_at: float = 0.0
    # engine-specific payload (centroids, entry points, sq8 stats, ...)
    extra: dict[str, Any] = field(default_factory=dict)


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ---- paths ----
    def index_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def meta_path(self, name: str) -> str:
        return os.path.join(self.index_dir(name), "meta.json")

    def data_path(self, name: str) -> str:
        return os.path.join(self.index_dir(name), "data")

    def tombstone_path(self, name: str) -> str:
        return os.path.join(self.index_dir(name), "tombstones")

    def delta_path(self, name: str) -> str:
        return os.path.join(self.index_dir(name), "delta")

    def covering_path(self, name: str) -> str:
        """Covering-payload sidecar: (row_id, <payload columns>) parquet
        kept beside the vector artifact so local serving can fetch full
        rows in-process — the Spark rendering of the reference's
        in-process row fetch (src/ann_search.cpp:31-195)."""
        return os.path.join(self.index_dir(name), "covering")

    # ---- metadata CRUD ----
    def exists(self, name: str) -> bool:
        return os.path.exists(self.meta_path(name))

    def save(self, meta: IndexMeta) -> None:
        os.makedirs(self.index_dir(meta.name), exist_ok=True)
        if not meta.created_at:
            meta.created_at = time.time()
        tmp = self.meta_path(meta.name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(meta), f)
        os.replace(tmp, self.meta_path(meta.name))  # atomic swap

    def load(self, name: str) -> IndexMeta:
        if not self.exists(name):
            raise KeyError(f"ANN index {name!r} does not exist")
        with open(self.meta_path(name)) as f:
            raw = json.load(f)
        version = raw.get("version", 0)
        if version > FORMAT_VERSION:
            raise ValueError(
                f"index {name!r} has format version {version}, engine supports <= {FORMAT_VERSION}"
            )
        return IndexMeta(**raw)

    def drop(self, name: str) -> None:
        if not self.exists(name):
            raise KeyError(f"ANN index {name!r} does not exist")
        shutil.rmtree(self.index_dir(name), ignore_errors=True)

    def names(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d for d in os.listdir(self.root) if os.path.exists(self.meta_path(d))
        )

    def all(self) -> list[IndexMeta]:
        return [self.load(n) for n in self.names()]

    def for_table(self, table_name: str) -> list[IndexMeta]:
        return [m for m in self.all() if m.table_name == table_name]

    # ---- tombstones ----
    def tombstones(self, name: str) -> DataFrame:
        path = self.tombstone_path(name)
        if os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            return self.spark.read.schema(TOMBSTONE_SCHEMA).parquet(path)
        return self.spark.createDataFrame([], TOMBSTONE_SCHEMA)

    def add_tombstones(self, name: str, row_ids: DataFrame | list[int]) -> int:
        meta = self.load(name)
        if isinstance(row_ids, list):
            df = self.spark.createDataFrame(
                [(int(r),) for r in row_ids], TOMBSTONE_SCHEMA
            )
        else:
            df = row_ids.select(F.col(row_ids.columns[0]).cast("long").alias("row_id"))
        df.write.mode("append").parquet(self.tombstone_path(name))
        n = self.tombstones(name).distinct().count()
        meta.num_deleted = n
        self.save(meta)
        return n

    def clear_tombstones(self, name: str) -> None:
        shutil.rmtree(self.tombstone_path(name), ignore_errors=True)
        meta = self.load(name)
        meta.num_deleted = 0
        self.save(meta)

    # ---- delta (incremental appends, reference D3 ``BoundIndex::Append``) ----
    def delta(self, name: str) -> DataFrame | None:
        """Unindexed tail appended since the last build/compaction, or None."""
        path = self.delta_path(name)
        if os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            return self.spark.read.parquet(path)
        return None

    def add_delta(self, name: str, rows: DataFrame) -> int:
        """Append (row_id, vector) rows; returns new delta row count."""
        meta = self.load(name)
        rows.select(
            F.col("row_id").cast("long"), F.col("vector").cast("array<float>")
        ).write.mode("append").parquet(self.delta_path(name))
        n = self.delta(name).count()
        meta.extra["delta_rows"] = n
        self.save(meta)
        return n

    def clear_delta(self, name: str) -> None:
        shutil.rmtree(self.delta_path(name), ignore_errors=True)
        meta = self.load(name)
        meta.extra.pop("delta_rows", None)
        self.save(meta)
