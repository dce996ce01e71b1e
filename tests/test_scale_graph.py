"""Scale regression for the sharded out-of-core graph path: recall must
hold at row counts far beyond the unit fixtures (the suite's other graph
tests run at 200-600 rows; ROADMAP.md records the 250k/500k tool
measurements — this is the in-suite assertion of the same property).

Build shape mirrors ``tools/scale_demo.py``: distributed synthetic
vectors (no driver materialization), kmeans shards, mmap DANN sidecars on.
"""

import numpy as np
import pandas as pd
import pytest


N_ROWS = 25_000
DIM = 32
SHARDS = 16


@pytest.fixture(scope="module")
def big_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("scale") / "vectors.parquet")

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = []
            for i in ids:
                rng = np.random.RandomState(int(i) % (2**31))
                vecs.append(rng.rand(DIM).astype(np.float32).tolist())
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    (
        spark.range(N_ROWS)
        .repartition(16)
        .mapInPandas(gen, "vec_id long, embedding array<float>")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def test_sharded_graph_recall_at_25k(engine, big_table):
    import pyarrow.parquet as pq_

    engine.register_table("big", big_table, row_id="vec_id")
    engine.streaming_build(
        "big_g", "big", "embedding", shards=SHARDS, shard_by="kmeans"
    )

    t = pq_.read_table(big_table).sort_by("vec_id")
    x = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    ids = t.column("vec_id").to_numpy()
    idx = engine.get_index("big_g")

    k = 10
    recalls = []
    for qi in np.linspace(0, N_ROWS - 1, 5).astype(int):
        d = ((x - x[qi]) ** 2).sum(axis=1)
        truth = set(ids[np.argsort(d, kind="stable")[:k]].tolist())
        got = {r["row_id"] for r in idx.search(x[qi].tolist(), k).collect()}
        recalls.append(len(truth & got) / k)
    # the reference's own floor is 0.7 (diskann_streaming.test:44-49); the
    # sharded build has measured 1.0 at 50k-500k — 0.9 catches a real
    # regression without flaking on kmeans layout variation
    assert float(np.mean(recalls)) >= 0.9, recalls
    assert min(recalls) >= 0.7, recalls


def test_sharded_pq_graph_recall_at_25k(engine, big_table):
    """Round-5 twin for the PQ-quantized sharded path, served through the
    rerank recipe (10x over-fetch from 8-byte codes + exact re-score) —
    the in-suite assertion of the ROADMAP 5M-row measurement."""
    import pyarrow.parquet as pq_

    engine.register_table("big_pq", big_table, row_id="vec_id")
    engine.streaming_build(
        "big_gpq", "big_pq", "embedding", shards=SHARDS, shard_by="kmeans",
        quantization="pq", pq_m=8,
    )

    t = pq_.read_table(big_table).sort_by("vec_id")
    x = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    ids = t.column("vec_id").to_numpy()

    k = 10
    recalls = []
    for qi in np.linspace(0, N_ROWS - 1, 5).astype(int):
        d = ((x - x[qi]) ** 2).sum(axis=1)
        truth = set(ids[np.argsort(d, kind="stable")[:k]].tolist())
        got = {
            r["vec_id"]
            for r in engine.ann_search(
                "big_pq", "big_gpq", x[qi].tolist(), k,
                oversample=10, rerank=True,
            ).collect()
        }
        recalls.append(len(truth & got) / k)
    assert float(np.mean(recalls)) >= 0.9, recalls
    assert min(recalls) >= 0.7, recalls


N_CLUSTERED = 24_000
N_CLUSTERS = 200


@pytest.fixture(scope="module")
def clustered_table(spark, tmp_path_factory):
    """Mixture-of-clusters corpus (the shape real embeddings have): hash
    centers in [0,1)^dim, uniform ±0.15 within-cluster noise — the case
    kmeans-shard pruning is designed for (tools/scale_demo.py --clusters
    is the at-scale twin; ROADMAP documents uniform data as pruning's
    worst case)."""
    path = str(tmp_path_factory.mktemp("clustered") / "vectors.parquet")

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = []
            for i in ids:
                cid = int(i) % N_CLUSTERS
                center = np.random.RandomState(cid + 7777).rand(DIM)
                noise = (np.random.RandomState(int(i)).rand(DIM) - 0.5) * 0.3
                vecs.append((center + noise).astype(np.float32).tolist())
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    (
        spark.range(N_CLUSTERED)
        .repartition(16)
        .mapInPandas(gen, "vec_id long, embedding array<float>")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def test_pruned_probe_recall_on_clustered_data(engine, clustered_table):
    """nprobe_shards pruning is the 100-TB serving mode on clustered
    corpora: probing 4 of 16 kmeans shards must hold the recall floor
    because the shards capture cluster locality (round-7 verdict item 4;
    the 20M x 384-shard measurement lives in ROADMAP)."""
    import pyarrow.parquet as pq_

    engine.register_table("clus", clustered_table, row_id="vec_id")
    engine.streaming_build(
        "clus_g", "clus", "embedding", shards=16, shard_by="kmeans"
    )

    t = pq_.read_table(clustered_table).sort_by("vec_id")
    x = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    ids = t.column("vec_id").to_numpy()
    idx = engine.get_index("clus_g")

    k = 10
    recalls = []
    for qi in np.linspace(0, N_CLUSTERED - 1, 5).astype(int):
        d = ((x - x[qi]) ** 2).sum(axis=1)
        truth = set(ids[np.argsort(d, kind="stable")[:k]].tolist())
        got = {
            r["row_id"]
            for r in idx.search(x[qi].tolist(), k, nprobe_shards=4).collect()
        }
        recalls.append(len(truth & got) / k)
    assert float(np.mean(recalls)) >= 0.9, recalls
    assert min(recalls) >= 0.7, recalls
