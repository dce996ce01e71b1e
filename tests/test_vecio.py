"""Packed vector-file interop (the reference's streaming-build input,
``src/diskann_functions.cpp:140-156``) and format-inferred table reads."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_packed_roundtrip(spark, tmp_path):
    from duckdb_annsearch_spark.vecio import (
        read_packed_vectors,
        write_packed_vectors,
    )

    rng = np.random.RandomState(3)
    x = rng.rand(1000, 12).astype(np.float32)
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(1000)], "row_id long, vector array<float>"
    )
    path = str(tmp_path / "vecs.bin")
    n, dim = write_packed_vectors(df, path)
    assert (n, dim) == (1000, 12)
    with open(path, "rb") as f:
        assert struct.unpack("<II", f.read(8)) == (1000, 12)

    # distributed read with a small rows_per_task so several tasks seek
    back = read_packed_vectors(spark, path, rows_per_task=128)
    rows = back.orderBy("row_id").collect()
    assert len(rows) == 1000
    got = np.asarray([r["vector"] for r in rows], dtype=np.float32)
    # the writer streams rows in DataFrame order (single-source parquet-less
    # frame is deterministic here), so values round-trip bitwise
    np.testing.assert_array_equal(got, x)


def test_packed_rejects_garbage(spark, tmp_path):
    from duckdb_annsearch_spark.vecio import read_packed_vectors

    p = tmp_path / "short.bin"
    p.write_bytes(b"\x01\x00")
    with pytest.raises(ValueError, match="too short"):
        read_packed_vectors(spark, str(p))
    p2 = tmp_path / "zero.bin"
    p2.write_bytes(struct.pack("<II", 0, 8))
    with pytest.raises(ValueError, match="zero"):
        read_packed_vectors(spark, str(p2))
    # truncated body: header declares more rows than the file carries
    p3 = tmp_path / "trunc.bin"
    p3.write_bytes(struct.pack("<II", 100, 8) + b"\x00" * 32)
    with pytest.raises(ValueError, match="truncated"):
        read_packed_vectors(spark, str(p3))


def test_streaming_build_file_end_to_end(engine, tmp_path):
    """Reference S10 signature: bin file in, .diskann out, result row
    (num_vectors, dimension, sample_size); the registered index searches
    and the exported file re-imports to the same top-1."""
    from duckdb_annsearch_spark.vecio import write_packed_vectors

    rng = np.random.RandomState(8)
    x = rng.rand(300, 8).astype(np.float32)
    df = engine.spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(300)], "row_id long, vector array<float>"
    )
    src = str(tmp_path / "input.bin")
    write_packed_vectors(df, src)
    out = str(tmp_path / "graph.diskann")
    res = engine.streaming_build_file(src, out, name="sbf", partition_rows=64)
    assert res["num_vectors"] == 300 and res["dimension"] == 8
    assert res["sample_size"] > 0
    assert res["table"] == "__sbf_sbf"
    got = engine.ann_search(res["table"], "sbf", x[42].tolist(), k=1).collect()
    assert got[0]["row_id"] == 42
    # the exported DANN file round-trips through import
    engine.import_dann("sbf2", "__sbf_sbf", out)
    got2 = engine.index_scan("sbf2", x[42].tolist(), k=1).collect()
    assert got2[0]["row_id"] == 42


def test_register_table_csv(engine, tmp_path):
    import csv

    p = tmp_path / "t.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "name"])
        for i in range(20):
            w.writerow([i, f"n{i}"])
    df = engine.register_table("csvt", str(p), row_id="id")
    assert df.count() == 20
    assert {f.name for f in df.schema.fields} >= {"id", "name"}
