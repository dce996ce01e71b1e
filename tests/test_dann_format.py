"""DANN v2 binary interop: byte-layout invariants and engine round-trip
(clean-room implementation of rust_lib/src/file_format.rs:3-18)."""

import struct

import numpy as np
import pytest

from duckdb_annsearch_spark.index.dann_format import read_dann, write_dann
from tests.conftest import make_vectors_df

ROWS = [(i, [float(i), 0.0, 1.0]) for i in range(10)]


def test_write_read_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    vecs = rng.rand(5, 4).astype(np.float32)
    nbrs = [np.array([1, 2]), np.array([0]), np.array([3, 4, 0]), np.array([]), np.array([2])]
    p = str(tmp_path / "g.diskann")
    write_dann(p, vecs, nbrs, [2], metric="ip", max_degree=4, build_complexity=77)
    d = read_dann(p)
    assert np.allclose(d["vectors"], vecs)
    assert [list(x) for x in d["neighbors"]] == [list(x) for x in nbrs]
    assert d["entry_points"] == [2]
    assert d["metric"] == "ip" and d["max_degree"] == 4
    assert d["build_complexity"] == 77 and d["sq8"] is None


def test_header_bytes_exact(tmp_path):
    p = str(tmp_path / "h.diskann")
    write_dann(p, np.zeros((2, 3), np.float32), [np.array([1]), np.array([0])],
               [0], metric="l2", max_degree=8, build_complexity=128)
    raw = open(p, "rb").read()
    assert raw[:4] == b"DANN"
    version, n, dim, deg, neps = struct.unpack("<IIIII", raw[4:24])
    assert (version, n, dim, deg, neps) == (2, 2, 3, 8, 1)
    assert raw[24] == 0 and raw[25:28] == b"\x00\x00\x00"
    assert struct.unpack("<I", raw[28:32])[0] == 128
    # file size: 32 + 1*4 + 2*3*4 + 2*8*4 = 124
    assert len(raw) == 124
    # padding sentinel visible in adjacency
    adj = np.frombuffer(raw[60:], dtype="<u4").reshape(2, 8)
    assert adj[0, 0] == 1 and adj[0, 1] == 0xFFFFFFFF


def test_sq8_trailer_roundtrip(tmp_path):
    vecs = np.eye(3, dtype=np.float32)
    codes = np.array([[0, 255, 7], [1, 2, 3], [250, 0, 9]], dtype=np.uint8)
    p = str(tmp_path / "q.diskann")
    write_dann(p, vecs, [np.array([])] * 3, [0],
               sq8={"mins": [0.0, 0.0, 0.0], "scales": [1.0, 1.0, 1.0], "codes": codes})
    d = read_dann(p)
    assert d["sq8"] is not None
    assert np.array_equal(d["sq8"]["codes"], codes)
    assert np.allclose(d["sq8"]["scales"], [1, 1, 1])


def test_engine_export_import_same_results(engine, tmp_path):
    df = make_vectors_df(engine.spark, ROWS, vec_col="embedding")
    engine.register_table("docs", df, row_id="id")
    engine.create_index("g", "docs", "embedding", engine="diskann")
    out = str(tmp_path / "exported.diskann")
    info = engine.export_dann("g", out)
    assert info["num_vectors"] == 10

    imported = engine.import_dann("g2", "docs", out)
    q = [3.2, 0.0, 1.0]
    orig = [(r["row_id"], round(r["_distance"], 5))
            for r in engine.get_index("g").search(q, 3).collect()]
    # imported row_id == label == with_labels order == ascending id order,
    # and ids here are 0..9 contiguous, so results align 1:1
    got = [(r["row_id"], round(r["_distance"], 5))
           for r in imported.search(q, 3).collect()]
    assert got == orig


def test_export_rejects_cosine_and_sharded(engine, tmp_path):
    df = make_vectors_df(engine.spark, ROWS, vec_col="embedding")
    engine.register_table("docs2", df, row_id="id")
    engine.create_index("gc", "docs2", "embedding", engine="diskann", metric="cosine")
    with pytest.raises(ValueError, match="l2\\|ip"):
        engine.export_dann("gc", str(tmp_path / "x.diskann"))
