"""Two-pass streaming build parity (reference
test/sql/diskann_streaming.test:11-131 and streaming_build.test:8-37):
recall >= 7/10 vs brute force, sample-size semantics, error cases."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def rows():
    rng = np.random.RandomState(42)
    return [(i, rng.rand(4).astype("float32").tolist()) for i in range(200)]


def _brute_top10(rows, q):
    q = np.asarray(q, dtype=np.float32)
    d = [(float(np.sum((np.asarray(v, dtype=np.float32) - q) ** 2)), i) for i, v in rows]
    return {i for _, i in sorted(d)[:10]}


def test_streaming_build_recall_and_meta(engine, rows):
    df = engine.spark.createDataFrame(rows, "id long, embedding array<float>")
    engine.register_table("docs", df, row_id="id")
    # small pilot + small partitions to force the real two-pass path
    info = engine.streaming_build(
        "sb", "docs", "embedding", sample_size=32, partition_rows=40
    )
    assert info == {"num_vectors": 200, "dimension": 4, "sample_size": 32}
    idx = engine.get_index("sb")
    assert idx.meta.num_vectors == 200

    # artifact invariants: every row present exactly once, labels dense
    art = idx.artifact()
    assert art.count() == 200
    assert art.select("label").distinct().count() == 200
    assert art.agg(F.max("label")).first()[0] == 199

    for qid in (0, 7, 42):
        q = rows[qid][1]
        got = {r["row_id"] for r in idx.search(q, 10, search_complexity=128).collect()}
        assert len(got & _brute_top10(rows, q)) >= 7, f"recall too low for q{qid}"


def test_streaming_build_small_table_all_pilot(engine, rows):
    df = engine.spark.createDataFrame(rows[:50], "id long, embedding array<float>")
    engine.register_table("small", df, row_id="id")
    info = engine.streaming_build("sb_small", "small", "embedding")
    # sample covers the whole table -> pure pilot build
    assert info["sample_size"] == 50 and info["num_vectors"] == 50
    got = engine.get_index("sb_small").search(rows[3][1], 1).collect()
    assert got[0]["row_id"] == 3


def test_create_index_autoroutes_big_diskann_to_streaming(engine, rows):
    """create_index(engine='diskann') must not collect an above-cap table to
    the driver: it routes to the kmeans-sharded out-of-core builder (full
    default-beam recall, no single-worker RAM ceiling) and registers the
    same searchable index (VERDICT r1 item 7)."""
    df = engine.spark.createDataFrame(rows, "id long, embedding array<float>")
    engine.register_table("autoroute", df, row_id="id")
    idx = engine.create_index(
        "ar", "autoroute", "embedding", engine="diskann",
        driver_build_max_rows=100, partition_rows=40,
    )
    # auto-routed builds are sharded; driver builds aren't
    assert idx.meta.extra.get("shards"), "expected the sharded out-of-core path"
    q = rows[5][1]
    got = {r["row_id"] for r in idx.search(q, 10, search_complexity=128).collect()}
    assert len(got & _brute_top10(rows, q)) >= 7


def test_streaming_build_duplicate_name_rejected(engine, rows):
    df = engine.spark.createDataFrame(rows[:50], "id long, embedding array<float>")
    engine.register_table("d2", df, row_id="id")
    engine.streaming_build("dup", "d2", "embedding")
    with pytest.raises(ValueError, match="already exists"):
        engine.streaming_build("dup", "d2", "embedding")
    info = engine.streaming_build("dup", "d2", "embedding", if_not_exists=True)
    assert info["num_vectors"] == 50


def test_sharded_build_recall_and_fanout(engine, rows):
    df = engine.spark.createDataFrame(rows, "id long, embedding array<float>")
    engine.register_table("sh_docs", df, row_id="id")
    info = engine.streaming_build("shg", "sh_docs", "embedding", shards=4)
    assert info == {"num_vectors": 200, "dimension": 4, "shards": 4}
    idx = engine.get_index("shg")
    art = idx.artifact()
    assert art.count() == 200
    assert art.select("shard").distinct().count() == 4

    for qid in (0, 7, 42):
        q = rows[qid][1]
        got = {r["row_id"] for r in idx.search(q, 10, search_complexity=128).collect()}
        assert rows[qid][0] in got  # self-match always found
        assert len(got & _brute_top10(rows, q)) >= 7, f"recall too low for q{qid}"


def test_sharded_search_table(engine, rows):
    df = engine.spark.createDataFrame(rows, "id long, embedding array<float>")
    engine.register_table("sh2", df, row_id="id")
    engine.streaming_build("shg2", "sh2", "embedding", shards=3)
    qdf = engine.spark.createDataFrame(
        [(100, rows[5][1]), (200, rows[9][1])], "qid int, v array<float>"
    )
    res = engine.ann_search_table(qdf, "sh2", "shg2", k=1).collect()
    assert {(r["qid"], r["id"]) for r in res} == {(100, 5), (200, 9)}


def test_kmeans_shards_with_pruning(engine, rows):
    """SPANN-style clustered shards: nprobe_shards routes each query to its
    nearest shards; self-match recall survives because the query's own
    cluster is always probed."""
    df = engine.spark.createDataFrame(rows, "id long, embedding array<float>")
    engine.register_table("km", df, row_id="id")
    info = engine.streaming_build("kmg", "km", "embedding", shards=4, shard_by="kmeans")
    idx = engine.get_index("kmg")
    assert idx.meta.extra.get("shard_centroids") is not None
    assert idx.artifact().count() == 200

    for qid in (0, 7, 42):
        q = rows[qid][1]
        # pruned probe: only 2 of 4 shards searched
        got = {
            r["row_id"]
            for r in idx.search(q, 10, search_complexity=128, nprobe_shards=2).collect()
        }
        assert qid in got
        assert len(got & _brute_top10(rows, q)) >= 6, f"recall too low for q{qid}"
        # full fan-out at least matches the pruned result
        full = {
            r["row_id"] for r in idx.search(q, 10, search_complexity=128).collect()
        }
        assert len(full & _brute_top10(rows, q)) >= len(got & _brute_top10(rows, q)) - 1
