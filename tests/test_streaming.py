"""Structured Streaming surface: streaming ANN search micro-batches match
the batch path; watermarked window/session aggs match their batch twins."""

import os

import pytest
from pyspark.sql import functions as F

from duckdb_annsearch_spark.streaming import (
    ann_search_stream,
    sessionize_stream,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _run_to_memory(stream_df, spark, name, output_mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_ann_search_stream_matches_batch(engine, tmp_path):
    spark = engine.spark
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    engine.register_table("embeddings", emb, row_id="vec_id")
    engine.create_index("sf", "embeddings", "embedding", engine="faiss", index_type="Flat")

    qdir = str(tmp_path / "queries")
    emb.limit(5).selectExpr("vec_id as qid", "embedding as qvec").write.parquet(qdir)
    schema = spark.read.parquet(qdir).schema
    stream = spark.readStream.schema(schema).parquet(qdir)

    out = ann_search_stream(engine, stream, "embeddings", "sf", k=3,
                            query_col="qvec", id_col="qid")
    got = _run_to_memory(out, spark, "ann_stream")
    rows = got.select("qid", "vec_id", "_distance").collect()
    assert len(rows) == 15
    # top hit per query is the query itself
    best = {r["qid"]: r["vec_id"] for r in rows if r["_distance"] < 1e-6}
    assert best == {i: i for i in range(5)}


def test_streaming_requires_stream(engine):
    emb = engine.spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    engine.register_table("embeddings", emb, row_id="vec_id")
    engine.create_index("sf2", "embeddings", "embedding", engine="faiss", index_type="Flat")
    with pytest.raises(ValueError, match="streaming"):
        ann_search_stream(engine, emb, "embeddings", "sf2", 3, "embedding", "vec_id")


def _staged_events(spark, tmp_path):
    """Spark-written copy with a plain TIMESTAMP ``ts`` column, whatever the
    raw testdata's physical type (legacy TIMESTAMP(NANOS)-as-long vs
    timestamp[us]/TIMESTAMP_NTZ) — the streaming source needs a stable,
    watermarkable timestamp."""
    path = str(tmp_path / "events")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
        if dict(raw.dtypes)["ts"] == "bigint":  # legacy nanos-as-long
            ts = F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        else:  # TIMESTAMP / TIMESTAMP_NTZ (session tz is UTC in conftest)
            ts = F.col("ts").cast("timestamp")
        raw.withColumn("ts", ts).write.parquet(path)
    finally:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    return spark.read.parquet(path), path


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    events, path = _staged_events(spark, tmp_path)
    stream = spark.readStream.schema(events.schema).parquet(path)
    batch = windowed_event_counts(events, "6 hours").orderBy("window_start", "event_type")
    streamed = _run_to_memory(
        windowed_event_counts(stream, "6 hours"), spark, "wincounts", "complete"
    ).orderBy("window_start", "event_type")
    assert [tuple(r) for r in streamed.collect()] == [tuple(r) for r in batch.collect()]


def test_sessionize_stream_matches_batch(spark, tmp_path):
    events, path = _staged_events(spark, tmp_path)
    stream = spark.readStream.schema(events.schema).parquet(path)
    batch = sessionize_stream(events, "45 minutes").orderBy("user_id", "session_start")
    streamed = _run_to_memory(
        sessionize_stream(stream, "45 minutes"), spark, "sessions", "complete"
    ).orderBy("user_id", "session_start")
    assert [tuple(r) for r in streamed.collect()] == [tuple(r) for r in batch.collect()]


def test_running_user_totals_state_across_batches(spark, tmp_path):
    from duckdb_annsearch_spark.streaming import running_user_totals

    events, path = _staged_events(spark, tmp_path)
    # force multiple micro-batches so state must carry across them
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = running_user_totals(stream)
    q = (
        out.writeStream.format("memory").queryName("usertotals")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("usertotals").toPandas()
    # last emission per user == batch-mode totals
    final = got.groupby("user_id").last().reset_index()
    expect = running_user_totals(events).toPandas().sort_values("user_id")
    final = final.sort_values("user_id")
    assert list(final["user_id"]) == list(expect["user_id"])
    assert list(final["n_events"]) == list(expect["n_events"])
    assert max(abs(final["total_value"].to_numpy() - expect["total_value"].to_numpy())) < 1e-6


def test_running_user_totals_idle_timeout_evicts(spark, tmp_path):
    # user 1 goes idle; after the watermark passes idle_timeout their state
    # is evicted and a later event restarts the total from scratch
    from datetime import datetime, timedelta

    from duckdb_annsearch_spark.streaming import running_user_totals

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    day = timedelta(days=1)
    batches = [
        [(1, 10.0, t0), (2, 5.0, t0)],
        [(2, 5.0, t0 + 10 * day)],                  # watermark jumps far past t0
        [(1, 7.0, t0 + 10 * day + timedelta(hours=1))],  # user 1 reappears
    ]
    path = str(tmp_path / "idle_events")
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "user_id long, value double, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(path)
    schema = "user_id long, value double, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = running_user_totals(
        stream, watermark="1 hour", idle_timeout="1 hour"
    )
    got = _run_to_memory(out, spark, "idle_totals", output_mode="update").toPandas()
    last = got.groupby("user_id").last()
    # user 1's state was evicted while idle: the reappearance restarts at 1
    assert int(last.loc[1, "n_events"]) == 1
    assert abs(float(last.loc[1, "total_value"]) - 7.0) < 1e-9
    # user 2 stayed active within the timeout horizon of each batch
    assert int(last.loc[2, "n_events"]) >= 1


def test_dedup_exact_stream(spark, tmp_path):
    from duckdb_annsearch_spark.streaming import dedup_exact_stream

    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "ccc"), (5, "bbb")],
        "doc_id long, text string",
    ).repartition(1).write.parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    out = dedup_exact_stream(stream)
    q = (
        out.writeStream.format("memory").queryName("dedupstream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.table("dedupstream").collect()
    assert len(got) == 3
    assert {r["text"] for r in got} == {"aaa", "bbb", "ccc"}


def test_vacuum_sharded_stays_sharded(engine):
    import numpy as np

    rng = np.random.RandomState(6)
    rows = [(i, rng.rand(4).astype("float32").tolist()) for i in range(120)]
    df = engine.spark.createDataFrame(rows, "id long, embedding array<float>")
    engine.register_table("vs", df, row_id="id")
    engine.streaming_build("vsg", "vs", "embedding", shards=3)
    engine.delete("vs", [5])
    engine.vacuum("vsg")
    idx = engine.get_index("vsg")
    assert idx.meta.extra.get("shards") == 3  # still sharded after compaction
    assert idx.meta.num_vectors == 119
    got = [r["row_id"] for r in idx.search(rows[7][1], 1).collect()]
    assert got == [7]


def test_parse_vector_messages_end_to_end(engine, tmp_path):
    # kafka-shaped payloads (JSON in a value column) through the parser
    # into the continuous search — file stream carries the same shape the
    # kafka source would deliver
    import json

    from duckdb_annsearch_spark.streaming import (
        ann_search_stream,
        parse_vector_messages,
    )

    spark = engine.spark
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    engine.register_table("embeddings", emb, row_id="vec_id")
    engine.create_index("msrc", "embeddings", "embedding", engine="faiss", index_type="Flat")
    dim = len(emb.first()["embedding"])

    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.limit(3).collect()}
    lines = [json.dumps({"qid": int(i), "qvec": [float(x) for x in v]}) for i, v in vecs.items()]
    lines.append("not json at all")                      # malformed -> dropped
    lines.append(json.dumps({"qid": 99, "qvec": [1.0]}))  # wrong dim -> dropped
    # right length but a null element -> would probe as NaN; must be dropped
    null_vec = [1.0] * dim
    null_vec[1] = None
    lines.append(json.dumps({"qid": 98, "qvec": null_vec}))
    path = tmp_path / "msgs"
    path.mkdir()
    (path / "batch0.txt").write_text("\n".join(lines))

    stream = spark.readStream.format("text").load(str(path))
    queries = parse_vector_messages(stream, dim=dim)
    out = ann_search_stream(engine, queries, "embeddings", "msrc", k=1,
                            query_col="qvec", id_col="qid")
    got = _run_to_memory(out, spark, "msg_hits")
    rows = got.select("qid", "vec_id", "_distance").collect()
    assert len(rows) == 3  # malformed + wrong-dim dropped
    assert {r["qid"]: r["vec_id"] for r in rows} == {i: i for i in vecs}
    assert all(r["_distance"] < 1e-6 for r in rows)


def test_streaming_insert_matches_batch_oracle(engine, tmp_path):
    """streaming_insert (round 5): N micro-batches ingested through
    foreachBatch -> engine.insert; after the drain, searches through the
    continuously-fed index match a batch-built oracle index over the same
    rows, and the auto-vacuum keeps the delta tail bounded (compacted into
    the artifact once the threshold crosses)."""
    import numpy as np

    from duckdb_annsearch_spark.streaming import streaming_insert

    spark = engine.spark
    rng = np.random.RandomState(21)
    dim, n_seed, n_stream = 12, 120, 240
    all_rows = [
        (i, rng.rand(dim).astype("float32").tolist())
        for i in range(n_seed + n_stream)
    ]
    schema = "id long, embedding array<float>"
    seed_df = spark.createDataFrame(all_rows[:n_seed], schema)
    engine.register_table("ing", seed_df, row_id="id")
    engine.create_index("ing_flat", "ing", "embedding", engine="faiss", index_type="Flat")

    # stream source: 3 parquet files = micro-batches (maxFilesPerTrigger=1)
    sdir = tmp_path / "stream_in"
    per = n_stream // 3
    for b in range(3):
        spark.createDataFrame(
            all_rows[n_seed + b * per : n_seed + (b + 1) * per], schema
        ).coalesce(1).write.mode("append").parquet(str(sdir))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(sdir))
    )
    q = streaming_insert(
        engine, "ing", stream,
        checkpoint_dir=str(tmp_path / "ckpt"),
        auto_vacuum_rows=150,  # crosses mid-stream -> at least one vacuum
        trigger={"availableNow": True},
    )
    q.awaitTermination(180)
    assert not q.isActive

    meta = engine.catalog.load("ing_flat")
    total = n_seed + n_stream
    # auto-vacuum compacted: the artifact holds (at least) the pre-vacuum
    # rows; the remaining delta tail is bounded below the threshold
    assert meta.num_vectors + int(meta.extra.get("delta_rows", 0)) == total
    assert int(meta.extra.get("delta_rows", 0)) < 150
    assert meta.num_vectors > n_seed

    # oracle: batch-built Flat over the same rows, same searches
    import tempfile as _tf

    from duckdb_annsearch_spark.engine import AnnEngine

    oracle = AnnEngine(spark, workdir=_tf.mkdtemp(prefix="ing_oracle_"))
    oracle.register_table("o", spark.createDataFrame(all_rows, schema), row_id="id")
    oracle.create_index("o_flat", "o", "embedding", engine="faiss", index_type="Flat")
    for qi in (5, n_seed + 17, total - 1):
        want = [r["id"] for r in oracle.ann_search("o", "o_flat", all_rows[qi][1], 5).collect()]
        got = [r["id"] for r in engine.ann_search("ing", "ing_flat", all_rows[qi][1], 5).collect()]
        assert got == want, f"query {qi}: {got} != {want}"

    # replayed batch is a no-op (marker files): re-running the same drain
    # inserts nothing new
    q2 = streaming_insert(
        engine, "ing", stream,
        checkpoint_dir=str(tmp_path / "ckpt"),  # same checkpoint
        trigger={"availableNow": True},
    )
    q2.awaitTermination(120)
    meta2 = engine.catalog.load("ing_flat")
    assert meta2.num_vectors + int(meta2.extra.get("delta_rows", 0)) == total


def test_streaming_insert_requires_stream(engine):
    import pytest as _pt

    from duckdb_annsearch_spark.streaming import streaming_insert

    df = engine.spark.range(3).selectExpr("id", "array(0.1f, 0.2f) as embedding")
    engine.register_table("ing2", df, row_id="id")
    with _pt.raises(ValueError, match="streaming"):
        streaming_insert(engine, "ing2", df, checkpoint_dir="/tmp/x")


def test_streaming_insert_into_quantized_index_retrains(engine, tmp_path):
    """Continuous ingest into a QUANTIZED index: inserts land in the
    full-precision delta, the mid-stream auto-vacuum re-trains the affine
    stats on the grown row set, and post-drain rerank searches match exact
    brute force over every ingested row."""
    import numpy as np

    from duckdb_annsearch_spark.streaming import streaming_insert

    spark = engine.spark
    rng = np.random.RandomState(33)
    dim, n_seed, n_stream = 8, 100, 150
    all_rows = [
        (i, rng.rand(dim).astype("float32").tolist())
        for i in range(n_seed + n_stream)
    ]
    schema = "id long, embedding array<float>"
    engine.register_table(
        "qing", spark.createDataFrame(all_rows[:n_seed], schema), row_id="id"
    )
    engine.create_index("qing_sq4", "qing", "embedding", engine="faiss",
                        description="SQ4")
    sdir = tmp_path / "qstream_in"
    per = n_stream // 3
    for b in range(3):
        spark.createDataFrame(
            all_rows[n_seed + b * per : n_seed + (b + 1) * per], schema
        ).coalesce(1).write.mode("append").parquet(str(sdir))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(sdir))
    )
    q = streaming_insert(
        engine, "qing", stream,
        checkpoint_dir=str(tmp_path / "qckpt"),
        auto_vacuum_rows=80,  # crosses mid-stream
        trigger={"availableNow": True},
    )
    q.awaitTermination(180)
    assert not q.isActive

    meta = engine.catalog.load("qing_sq4")
    assert meta.quantized and meta.extra.get("quantization") == "sq4"
    assert meta.num_vectors + int(meta.extra.get("delta_rows", 0)) == n_seed + n_stream
    assert int(meta.extra.get("delta_rows", 0)) < 80

    x = np.asarray([v for _, v in all_rows], dtype=np.float32)
    for qid in (3, 150, 249):
        qv = all_rows[qid][1]
        d = ((x - np.asarray(qv)) ** 2).sum(axis=1)
        exact = np.lexsort((np.arange(len(x)), d))[:5].tolist()
        got = [
            r["id"]
            for r in engine.ann_search(
                "qing", "qing_sq4", qv, k=5, oversample=10, rerank=True
            ).collect()
        ]
        assert got == exact, (qid, got, exact)
