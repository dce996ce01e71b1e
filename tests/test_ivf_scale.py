"""Scale paths of the IVFFlat build: hierarchical (two-level, distributed)
k-means training and cell-size skew splitting.

Correctness invariant for both: full probe (nprobe == nlist) is exhaustive,
so results must equal brute force exactly no matter how the cells were
trained or split — the same gate the driver's ``ivf_full_probe`` oracle
applies (reference default params: ``src/include/faiss_index.hpp:37-44``).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import make_vectors_df


@pytest.fixture(scope="module")
def rows():
    rng = np.random.RandomState(7)
    return [(i, rng.randn(8).astype(np.float32).tolist()) for i in range(400)]


def _brute_topk(rows, q, k=10):
    x = np.asarray([v for _, v in rows], dtype=np.float32)
    d = ((x - np.asarray(q, dtype=np.float32)) ** 2).sum(axis=1)
    order = np.argsort(d, kind="stable")[:k]
    return [rows[i][0] for i in order]


def _cell_counts(engine, name):
    art = engine.get_index(name).artifact()
    return {
        r["cluster_id"]: r["cnt"]
        for r in art.groupBy("cluster_id").count().withColumnRenamed("count", "cnt").collect()
    }


def test_per_group_hash_sample_independent_of_prior_sampling(spark):
    # rows already conditioned on the unseeded hash (a prior _hash_sample)
    # must still thin by ~frac — the seeded hash is independent
    from duckdb_annsearch_spark.index.ivf import _hash_sample, _per_group_hash_sample

    df = spark.range(0, 40_000).select(
        F.col("id").alias("row_id"), F.lit(0).alias("group_id")
    )
    pre = _hash_sample(df, 0.5)
    n_pre = pre.count()
    assert 0.4 * 40_000 < n_pre < 0.6 * 40_000
    thinned = _per_group_hash_sample(pre, {0: 0.2}, "group_id").count()
    assert 0.1 * n_pre < thinned < 0.3 * n_pre  # ~20%, NOT a no-op
    # determinism: same call, same rows
    assert _per_group_hash_sample(pre, {0: 0.2}, "group_id").count() == thinned


def test_train_sample_rejected_with_explicit_hierarchical(engine, rows):
    df = make_vectors_df(engine.spark, rows, dim=8)
    engine.register_table("vecs", df, row_id="id")
    with pytest.raises(ValueError, match="train_sample"):
        engine.create_index(
            "bad", "vecs", "embedding", engine="faiss", index_type="IVFFlat",
            ivf_nlist=8, train_mode="hierarchical", train_sample=100,
        )


def test_hierarchical_full_probe_exact(engine, rows):
    df = make_vectors_df(engine.spark, rows, dim=8)
    engine.register_table("vecs", df, row_id="id")
    engine.create_index(
        "hier", "vecs", "embedding", engine="faiss", index_type="IVFFlat",
        ivf_nlist=16, train_mode="hierarchical",
    )
    meta = engine.catalog.load("hier")
    assert meta.extra["train_mode"] == "hierarchical"
    nlist = int(meta.extra["nlist"])
    assert nlist >= 16  # sqrt-decomposition may round k1*k2 up
    # every row landed in some cell and none were dropped
    assert sum(_cell_counts(engine, "hier").values()) == len(rows)
    q = rows[3][1]
    got = [
        r["id"]
        for r in engine.ann_search("vecs", "hier", q, k=10, nprobe=nlist).collect()
    ]
    assert got == _brute_topk(rows, q)


def test_hierarchical_auto_selected_for_large_nlist(engine, rows):
    # nlist above the threshold flips to hierarchical without an explicit param
    df = make_vectors_df(engine.spark, rows, dim=8)
    engine.register_table("vecs", df, row_id="id")
    engine.create_index(
        "big", "vecs", "embedding", engine="faiss", index_type="IVFFlat",
        ivf_nlist=2000,
    )
    meta = engine.catalog.load("big")
    assert meta.extra["train_mode"] == "hierarchical"
    # 400 rows cap the achievable cell count; search still exact at full probe
    q = rows[0][1]
    nlist = int(meta.extra["nlist"])
    got = [
        r["id"]
        for r in engine.ann_search("vecs", "big", q, k=5, nprobe=nlist).collect()
    ]
    assert got == _brute_topk(rows, q, k=5)


def test_max_cell_rows_bounds_partitions(engine):
    # two dense blobs + one row far away -> flat kmeans with nlist=2 makes a
    # ~200-row hot cell; max_cell_rows must split it
    rng = np.random.RandomState(11)
    blob_a = rng.randn(180, 6) * 0.1
    blob_b = rng.randn(180, 6) * 0.1 + 5.0
    rows = [
        (i, v.astype(np.float32).tolist())
        for i, v in enumerate(np.vstack([blob_a, blob_b]))
    ]
    df = make_vectors_df(engine.spark, rows, dim=6)
    engine.register_table("vecs", df, row_id="id")
    engine.create_index(
        "cap", "vecs", "embedding", engine="faiss", index_type="IVFFlat",
        ivf_nlist=2, nprobe=2, max_cell_rows=60,
    )
    counts = _cell_counts(engine, "cap")
    assert sum(counts.values()) == len(rows)
    assert max(counts.values()) <= 60
    meta = engine.catalog.load("cap")
    nlist = int(meta.extra["nlist"])
    assert nlist == len(counts) >= 6  # 360 rows / 60 cap needs >= 6 cells
    q = rows[42][1]
    got = [
        r["id"]
        for r in engine.ann_search("vecs", "cap", q, k=10, nprobe=nlist).collect()
    ]
    assert got == _brute_topk(rows, q)


def test_split_preserves_probe_pruning(engine):
    # after a split, a low-nprobe search must still prune: probing 1 cell
    # reads fewer rows than the table and still finds the local neighbors
    rng = np.random.RandomState(13)
    blob = rng.randn(120, 5) * 0.05
    far = rng.randn(120, 5) * 0.05 + 9.0
    rows = [
        (i, v.astype(np.float32).tolist())
        for i, v in enumerate(np.vstack([blob, far]))
    ]
    df = make_vectors_df(engine.spark, rows, dim=5)
    engine.register_table("vecs", df, row_id="id")
    engine.create_index(
        "pr", "vecs", "embedding", engine="faiss", index_type="IVFFlat",
        ivf_nlist=2, nprobe=1, max_cell_rows=40,
    )
    q = rows[0][1]  # inside the first blob
    got = [r["id"] for r in engine.ann_search("vecs", "pr", q, k=5).collect()]
    # nprobe=1 probes one (split) cell: all hits must come from the near blob
    assert len(got) == 5
    assert all(i < 120 for i in got)
