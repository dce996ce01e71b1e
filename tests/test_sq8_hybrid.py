"""SQ8 quantization (diskann_quantization.test:24-90) and hybrid search
(F9 fixture; RRF math of src/ann_search.cpp:1091-1106)."""

import numpy as np
import pytest

from tests.conftest import make_vectors_df

RRF_K = 60


def test_sq8_quantized_flag_and_top1(engine):
    rng = np.random.RandomState(7)
    rows = [(i, rng.rand(4).astype(np.float32).tolist()) for i in range(50)]
    df = make_vectors_df(engine.spark, rows, dim=4)
    engine.register_table("qvecs", df, row_id="id")
    engine.create_index(
        "sq8idx", "qvecs", engine="faiss", index_type="Flat", quantization="sq8"
    )
    info = {r["name"]: r for r in engine.ann_index_info().collect()}
    assert info["sq8idx"]["quantized"] is True
    # exact-match top-1 survives quantization (diskann_quantization.test)
    for probe_id in (0, 13, 42):
        q = rows[probe_id][1]
        res = engine.ann_search("qvecs", "sq8idx", q, k=1).collect()
        assert res[0]["id"] == probe_id


def test_sq8_distances_approximate_full_precision(engine):
    rng = np.random.RandomState(11)
    rows = [(i, rng.rand(8).astype(np.float32).tolist()) for i in range(100)]
    df = make_vectors_df(engine.spark, rows, dim=8)
    engine.register_table("qvecs", df, row_id="id")
    engine.create_index("full", "qvecs", engine="faiss", index_type="Flat")
    engine.create_index(
        "quant", "qvecs", engine="faiss", index_type="Flat", quantization="sq8"
    )
    q = rows[5][1]
    full = engine.ann_search("qvecs", "full", q, k=10).collect()
    quant = engine.ann_search("qvecs", "quant", q, k=10).collect()
    overlap = len({r["id"] for r in full} & {r["id"] for r in quant})
    assert overlap >= 8
    for fr, qr in zip(full, quant):
        assert qr["_distance"] == pytest.approx(fr["_distance"], abs=0.05)


CHUNKS = [
    (1, "spark query engine fast", [1.0, 0.0, 0.0, 0.0]),
    (2, "duck database analytics engine", [0.0, 1.0, 0.0, 0.0]),
    (3, "vector search index fast", [0.9, 0.1, 0.0, 0.0]),
    (4, "cat pictures and dogs", [0.0, 0.0, 1.0, 0.0]),
    (5, "fast fast fast query", [0.8, 0.2, 0.0, 0.0]),
]


def _setup_hybrid(engine):
    df = engine.spark.createDataFrame(
        [(i, t, v) for i, t, v in CHUNKS], "id int, text string, embedding array<float>"
    )
    engine.register_table("chunks", df, row_id="id")
    engine.create_index("vidx", "chunks", "embedding", engine="diskann")
    return df


def test_hybrid_vector_only_degradation(engine):
    _setup_hybrid(engine)
    out = engine.hybrid_search(
        "chunks", "vidx", "embedding", "id", [1.0, 0.0, 0.0, 0.0], "fast query", k=3
    ).collect()
    # no FTS index -> vector-only (ann_search.cpp:1056)
    assert all(r["_bm25_rank"] == 0 for r in out)
    assert out[0]["id"] == 1  # exact vector match, vector rank 1
    assert out[0]["_rrf_score"] == pytest.approx(0.7 / (RRF_K + 1), abs=1e-6)


def test_hybrid_rrf_fusion(engine):
    _setup_hybrid(engine)
    engine.create_fts_index("fts", "chunks", "id", "text")
    out = engine.hybrid_search(
        "chunks", "vidx", "embedding", "id", [1.0, 0.0, 0.0, 0.0], "fast query", k=5
    ).collect()
    rows = {r["id"]: r for r in out}
    # doc 5 has tf(fast)=3 + tf(query)=1 -> top bm25; doc 1 top vector
    assert rows[5]["_bm25_rank"] == 1
    assert rows[1]["_vector_rank"] == 1
    for r in out:
        expect = 0.0
        if r["_bm25_rank"] > 0:
            expect += 0.3 / (RRF_K + r["_bm25_rank"])
        if r["_vector_rank"] > 0:
            expect += 0.7 / (RRF_K + r["_vector_rank"])
        assert r["_rrf_score"] == pytest.approx(expect, abs=1e-6)
    scores = [r["_rrf_score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_hybrid_doc_only_in_bm25_list(engine):
    _setup_hybrid(engine)
    engine.create_fts_index("fts", "chunks", "id", "text")
    # query text matches doc 4 (cats) which is vector-far; small candidate
    # lists keep it out of the vector list
    out = engine.hybrid_search(
        "chunks", "vidx", "embedding", "id",
        [1.0, 0.0, 0.0, 0.0], "cat pictures", k=5,
        vector_candidates=2, bm25_candidates=2,
    ).collect()
    rows = {r["id"]: r for r in out}
    assert rows[4]["_bm25_rank"] >= 1 and rows[4]["_vector_rank"] == 0


def test_sq8_on_diskann_graph(engine):
    """The reference's SQ8 lives on the DISKANN index
    (diskann_quantization.test:24-90): quantized flag set, top-1 exact-match
    parity, distances approximate full precision."""
    rng = np.random.RandomState(3)
    rows = [(i, rng.rand(4).astype(np.float32).tolist()) for i in range(60)]
    df = make_vectors_df(engine.spark, rows, dim=4)
    engine.register_table("gq", df, row_id="id")
    engine.create_index("gq8", "gq", engine="diskann", quantization="sq8")
    info = {r["name"]: r for r in engine.ann_index_info().collect()}
    assert info["gq8"]["quantized"] is True
    for probe_id in (0, 17, 42):
        q = rows[probe_id][1]
        res = engine.ann_search("gq", "gq8", q, k=1).collect()
        assert res[0]["id"] == probe_id
        # quantization error bounded: ~ (scale/255)^2 * dim
        assert res[0]["_distance"] < 1e-3


def test_sq8_on_streaming_build(engine):
    rng = np.random.RandomState(5)
    rows = [(i, rng.rand(4).astype(np.float32).tolist()) for i in range(120)]
    df = make_vectors_df(engine.spark, rows, dim=4)
    engine.register_table("sq", df, row_id="id")
    engine.streaming_build(
        "sbq8", "sq", sample_size=32, partition_rows=40, quantization="sq8"
    )
    idx = engine.get_index("sbq8")
    assert idx.meta.quantized is True
    res = idx.search(rows[7][1], 1).collect()
    assert res[0]["row_id"] == 7 and res[0]["_distance"] < 1e-3


def test_sq8_on_ivfflat(engine):
    """SQ8 inside IVF cells: codes column in the hive partitions, both probe
    shapes dequantize, quantized flag set."""
    rng = np.random.RandomState(9)
    rows = [(i, rng.rand(4).astype(np.float32).tolist()) for i in range(80)]
    df = make_vectors_df(engine.spark, rows, dim=4)
    engine.register_table("ivq", df, row_id="id")
    engine.create_index(
        "ivq8", "ivq", engine="faiss", index_type="IVFFlat",
        ivf_nlist=4, nprobe=4, quantization="sq8",
    )
    idx = engine.get_index("ivq8")
    assert idx.meta.quantized is True
    for probe_id in (0, 33, 79):
        q = rows[probe_id][1]
        # data-parallel path
        res = engine.ann_search("ivq", "ivq8", q, k=1).collect()
        assert res[0]["id"] == probe_id and res[0]["_distance"] < 1e-3
        # query-distributed path
        qdf = engine.spark.createDataFrame([(1, q)], "qid int, v array<float>")
        res2 = engine.ann_search_table(qdf, "ivq", "ivq8", k=1).collect()
        assert res2[0]["id"] == probe_id
