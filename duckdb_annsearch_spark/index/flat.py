"""FAISS ``Flat`` equivalent: no index structure, exact brute force.

The reference's Flat index stores raw vectors and searches exhaustively
(``/root/reference/src/faiss_index.cpp:39-60`` — factory string "Flat" /
"IDMap,Flat").  Here the "index" is the vectors artifact itself; search is
the distributed GEMM probe (`kernels.probe_partitions`) — exact results,
map-side bounded top-k, no full shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from duckdb_annsearch_spark.catalog import Catalog, IndexMeta
from duckdb_annsearch_spark.index import kernels
from duckdb_annsearch_spark.index.base import (
    BaseIndex,
    add_sq8_codes,
    compute_sq8_stats,
    with_labels,
)


class FlatIndex(BaseIndex):
    TYPE = "flat"

    @classmethod
    def build(
        cls,
        catalog: Catalog,
        meta: IndexMeta,
        df: DataFrame,
        row_id_col: str,
        vector_col: str,
    ) -> "FlatIndex":
        art = with_labels(df, row_id_col, vector_col)
        if meta.params.get("quantization") == "sq8":
            mins, scales = compute_sq8_stats(art, meta.dim)
            art = add_sq8_codes(art, meta.dim, mins, scales)
            meta.quantized = True
            meta.extra["sq8_mins"] = mins
            meta.extra["sq8_scales"] = scales
        art.write.mode("overwrite").parquet(catalog.data_path(meta.name))
        idx = cls(catalog, meta)
        meta.num_vectors = idx.artifact().count()
        catalog.save(meta)
        return idx

    def search_batch(self, queries: list[Sequence[float]], k: int, **kw) -> DataFrame:
        dq = self._dequant_args()
        return kernels.probe_partitions(
            self.live_artifact(),
            [(i, list(q)) for i, q in enumerate(queries)],
            k,
            self.meta.metric,
            self.meta.dim,
            vector_col="codes" if dq else "vector",
            dequantize=dq,
        )
