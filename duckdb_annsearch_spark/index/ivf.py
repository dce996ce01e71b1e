"""IVFFlat index: MLlib-KMeans-trained coarse quantizer + cell-partitioned
parquet; search probes ``nprobe`` cells via partition pruning.

Reference: FAISS IVFFlat built with deterministic stride sampling when
``train_sample`` is set (``/root/reference/src/faiss_index.cpp:295-330``),
defaults ``ivf_nlist=100, nprobe=1`` (``src/include/faiss_index.hpp:37-44``).

Spark-first mapping (SURVEY §7.1 M3): the inverted lists ARE parquet
partitions (``partitionBy("cluster_id")``) — probing nprobe cells is a
partition-pruned scan, the Spark analogue of reading nprobe posting lists.
At 100 TB each cell is a directory; a search touches nprobe/nlist of the
data and Catalyst never reads the rest.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duckdb_annsearch_spark.catalog import Catalog, IndexMeta
from duckdb_annsearch_spark.index import kernels, scan
from duckdb_annsearch_spark.index.base import BaseIndex, with_labels

DEFAULT_NLIST = 100
DEFAULT_NPROBE = 1


def _train_kmeans(sample: np.ndarray, nlist: int, metric: str, seed: int = 42) -> np.ndarray:
    """Lloyd's KMeans on the (driver-side) training sample.

    The training sample is small by construction (``train_sample`` stride
    subset, or capped below); the heavy work — assigning every row to a cell —
    is distributed.  Uses numpy directly rather than MLlib to keep the
    centroid computation deterministic (fixed seed, fixed iteration count);
    MLlib KMeans remains a drop-in alternative at larger sample sizes.
    """
    rng = np.random.RandomState(seed)
    n = sample.shape[0]
    nlist = min(nlist, n)
    centroids = sample[rng.choice(n, size=nlist, replace=False)].copy()
    for _ in range(25):
        d = kernels.pairwise_distances(centroids, sample, metric)  # (nlist, n)
        assign = np.argmin(d, axis=0)
        new = np.empty_like(centroids)
        for c in range(nlist):
            members = sample[assign == c]
            new[c] = members.mean(axis=0) if len(members) else sample[rng.randint(n)]
        if np.allclose(new, centroids, atol=1e-7):
            centroids = new
            break
        centroids = new
    return centroids.astype(np.float32)


class IvfFlatIndex(BaseIndex):
    TYPE = "ivfflat"

    @classmethod
    def build(
        cls,
        catalog: Catalog,
        meta: IndexMeta,
        df: DataFrame,
        row_id_col: str,
        vector_col: str,
    ) -> "IvfFlatIndex":
        nlist = int(meta.params.get("ivf_nlist", DEFAULT_NLIST))
        train_sample = int(meta.params.get("train_sample", 0))
        art = with_labels(df, row_id_col, vector_col).cache()
        n = art.count()

        # -- train: deterministic stride sample by label order (faiss_index.cpp:302-318)
        if train_sample > 0 and train_sample < n:
            stride = n / train_sample
            wanted = {int(i * stride) for i in range(train_sample)}
            sample_df = art.where(F.col("label").isin(list(wanted)))
        else:
            # cap driver-side training work; 256 vectors per centroid matches
            # common FAISS guidance and keeps the sample O(nlist), not O(N)
            cap = max(nlist * 256, 10_000)
            if n > cap:
                stride = n / cap
                wanted = {int(i * stride) for i in range(cap)}
                sample_df = art.where(F.col("label").isin(list(wanted)))
            else:
                sample_df = art
        sample = np.asarray(
            [r["vector"] for r in sample_df.select("vector").collect()], dtype=np.float32
        )
        centroids = _train_kmeans(sample, nlist, meta.metric)

        # -- assign every row to its nearest centroid (distributed, one GEMM per batch)
        cent = centroids

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                x = kernels.stack_vectors(pdf["vector"], meta.dim)
                d = kernels.pairwise_distances(cent, x, meta.metric)
                pdf = pdf.copy()
                pdf["cluster_id"] = np.argmin(d, axis=0).astype(np.int32)
                yield pdf

        assigned = art.mapInPandas(
            assign, "label int, row_id long, vector array<float>, cluster_id int"
        )
        if meta.params.get("quantization") == "sq8":
            from duckdb_annsearch_spark.index.base import (
                add_sq8_codes,
                compute_sq8_stats,
            )

            mins, scales = compute_sq8_stats(art, meta.dim)
            assigned = add_sq8_codes(assigned, meta.dim, mins, scales)
            meta.quantized = True
            meta.extra["sq8_mins"] = mins
            meta.extra["sq8_scales"] = scales
        assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(
            catalog.data_path(meta.name)
        )
        art.unpersist()
        meta.extra["centroids"] = centroids.tolist()
        meta.extra["nlist"] = int(centroids.shape[0])
        idx = cls(catalog, meta)
        meta.num_vectors = idx.artifact().count()
        catalog.save(meta)
        return idx

    # ---- search ----
    def _probe_cells(self, queries: np.ndarray, nprobe: int) -> list[np.ndarray]:
        cent = np.asarray(self.meta.extra["centroids"], dtype=np.float32)
        nprobe = min(max(1, nprobe), cent.shape[0])
        d = kernels.pairwise_distances(queries, cent, self.meta.metric)  # (nq, nlist)
        return [kernels.local_topk(d[i], nprobe) for i in range(d.shape[0])]

    def _search_batch_impl(
        self, queries: list[Sequence[float]], k: int, nprobe: int | None = None, **kw
    ) -> DataFrame:
        nprobe = int(nprobe or self.meta.params.get("nprobe", DEFAULT_NPROBE))
        qarr = np.asarray([list(q) for q in queries], dtype=np.float32)
        cells = self._probe_cells(qarr, nprobe)
        all_cells = sorted({int(c) for cc in cells for c in cc})
        # per-cell query lists so each query only sees its own probed cells
        cell_queries: dict[int, list[int]] = {}
        for qi, cc in enumerate(cells):
            for c in cc:
                cell_queries.setdefault(int(c), []).append(qi)

        art = self.live_artifact().where(F.col("cluster_id").isin(all_cells))
        dim, metric, k_ = self.meta.dim, self.meta.metric, k
        dq = self._dequant_args()
        vcol = "codes" if dq else "vector"
        if dq:
            dq_mins = np.asarray(dq["mins"], dtype=np.float32)
            dq_scales = np.asarray(dq["scales"], dtype=np.float32)

        def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                for c, grp in pdf.groupby("cluster_id"):
                    qids = cell_queries.get(int(c))
                    if not qids:
                        continue
                    if dq:
                        codes = np.stack(
                            [np.frombuffer(b, dtype=np.uint8) for b in grp[vcol]]
                        ).astype(np.float32)
                        x = codes / 255.0 * dq_scales + dq_mins
                    else:
                        x = kernels.stack_vectors(grp[vcol], dim)
                    d = kernels.pairwise_distances(qarr[qids], x, metric)
                    rid = grp["row_id"].to_numpy()
                    outs = []
                    for row, qi in enumerate(qids):
                        sel = kernels.local_topk(d[row], k_)
                        outs.append(
                            pd.DataFrame(
                                {
                                    "query_idx": np.full(len(sel), qi, dtype=np.int32),
                                    "row_id": rid[sel].astype(np.int64),
                                    "_distance": d[row, sel],
                                }
                            )
                        )
                    if outs:
                        yield pd.concat(outs, ignore_index=True)

        partial = art.select("row_id", vcol, "cluster_id").mapInPandas(
            probe, kernels.PROBE_SCHEMA
        )
        w = Window.partitionBy("query_idx").orderBy(
            F.col("_distance").asc(), F.col("row_id").asc()
        )
        return (
            partial.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k)
            .drop("__rn")
        )

    def _search_batch_df_impl(
        self,
        queries_df: DataFrame,
        k: int,
        query_col: str = "query",
        idx_col: str = "query_idx",
        nprobe: int | None = None,
        **kw,
    ) -> DataFrame:
        """Query-distributed IVF probe: each task resolves its queries' nprobe
        cells against the (small, closure-shipped) centroid table and reads
        ONLY those hive partitions via pyarrow — per-task partition pruning,
        the executor-side twin of the inverted-list read."""
        nprobe = int(nprobe or self.meta.params.get("nprobe", DEFAULT_NPROBE))
        cent = np.asarray(self.meta.extra["centroids"], dtype=np.float32)
        nprobe = min(max(1, nprobe), cent.shape[0])
        path = self.catalog.data_path(self.meta.name)
        dim, metric = self.meta.dim, self.meta.metric
        deleted = self._deleted_rowid_array()
        dq = self._dequant_args()

        def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                valid = [
                    (int(pdf[idx_col].iloc[i]), np.asarray(v, dtype=np.float32))
                    for i, v in enumerate(pdf[query_col])
                    if v is not None and len(v) == dim
                ]
                if not valid:
                    continue
                qarr = np.stack([q for _, q in valid])
                dc = kernels.pairwise_distances(qarr, cent, metric)
                cells = [kernels.local_topk(dc[i], nprobe) for i in range(len(valid))]
                cell_queries: dict[int, list[int]] = {}
                for qi, cc in enumerate(cells):
                    for c in cc:
                        cell_queries.setdefault(int(c), []).append(qi)
                top = scan.RunningTopK(len(valid), k)
                all_cells = sorted(cell_queries)
                for rid, x, cid in _iter_cell_batches(
                    path, dim, all_cells, dequantize=dq
                ):
                    if deleted.size:
                        keep = ~np.isin(rid, deleted)
                        rid, x = rid[keep], x[keep]
                    qids = cell_queries.get(cid)
                    if not qids or rid.size == 0:
                        continue
                    d = kernels.pairwise_distances(qarr[qids], x, metric)
                    for row, qi in enumerate(qids):
                        top.update(qi, d[row], rid)
                outs = []
                for qi, (orig_idx, _) in enumerate(valid):
                    r, d = top.result(qi)
                    outs.append(
                        pd.DataFrame(
                            {
                                idx_col: np.full(len(r), orig_idx, dtype=np.int64),
                                "row_id": r,
                                "_distance": d.astype(np.float32),
                            }
                        )
                    )
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        return queries_df.select(idx_col, query_col).mapInPandas(
            probe, f"{idx_col} long, row_id long, _distance float"
        )


def _iter_cell_batches(path: str, dim: int, cells: list[int], dequantize: dict | None = None):
    """Yield (row_ids, X, cluster_id) per batch from the probed hive cells.
    SQ8 artifacts read only the codes column and dequantize."""
    import pyarrow.dataset as ds

    data = ds.dataset(path, format="parquet", partitioning="hive")
    flt = ds.field("cluster_id").isin([int(c) for c in cells])
    vcol = "codes" if dequantize else "vector"
    if dequantize:
        mins = np.asarray(dequantize["mins"], dtype=np.float32)
        scales = np.asarray(dequantize["scales"], dtype=np.float32)
    for batch in data.to_batches(
        columns=["row_id", vcol, "cluster_id"], filter=flt,
        batch_size=scan.DEFAULT_BATCH_ROWS,
    ):
        if batch.num_rows == 0:
            continue
        rid = batch.column("row_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if dequantize:
            codes = np.stack(
                [np.frombuffer(b.as_py(), dtype=np.uint8) for b in batch.column(vcol)]
            ).astype(np.float32)
            x = codes / 255.0 * scales + mins
        else:
            x = scan._fixed_matrix(batch.column(vcol), dim)
        cids = batch.column("cluster_id").to_numpy(zero_copy_only=False)
        # a record batch can straddle cells only if pyarrow merges fragments;
        # split defensively by cluster_id
        for cid in np.unique(cids):
            m = cids == cid
            yield rid[m], x[m], int(cid)
