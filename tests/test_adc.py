"""ADC (asymmetric distance) PQ scoring vs the decode+GEMM reference
(index/kernels.py::adc_distances)."""

import numpy as np
import pytest

from duckdb_annsearch_spark.index import kernels


def _setup(dim=32, m=8, n=500, nq=3, seed=0, rotate=False):
    rng = np.random.default_rng(seed)
    dsub = dim // m
    books = rng.standard_normal((m, 256, dsub)).astype(np.float32)
    codes = rng.integers(0, 256, (n, m), dtype=np.uint8)
    q = rng.standard_normal((nq, dim)).astype(np.float32)
    dq = {"codebooks": books}
    if rotate:
        # random orthogonal rotation via QR
        a = rng.standard_normal((dim, dim))
        r, _ = np.linalg.qr(a)
        dq["rotation"] = r.astype(np.float32)
    return q, codes, dq


def _reference(q, codes, dq, metric, centroid=None):
    x = kernels.decode_codes(codes, dq)
    if centroid is not None:
        x = x + centroid
    return kernels.pairwise_distances(q, x, metric)


@pytest.mark.parametrize("metric", ["l2", "ip"])
@pytest.mark.parametrize("rotate", [False, True])
def test_matches_decode_gemm(metric, rotate):
    q, codes, dq = _setup(rotate=rotate)
    got = kernels.adc_distances(q, codes, dq, metric)
    want = _reference(q, codes, dq, metric)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("metric", ["l2", "ip"])
@pytest.mark.parametrize("rotate", [False, True])
def test_residual_centroid_folds_into_query(metric, rotate):
    q, codes, dq = _setup(rotate=rotate, seed=1)
    centroid = np.random.default_rng(9).standard_normal(32).astype(np.float32)
    got = kernels.adc_distances(q, codes, dq, metric, centroid=centroid)
    want = _reference(q, codes, dq, metric, centroid=centroid)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_l2_clamped_nonnegative():
    q, codes, dq = _setup(seed=2)
    # query equal to a reconstruction -> distance exactly >= 0, no -1e-7
    x = kernels.decode_codes(codes, dq)
    got = kernels.adc_distances(x[:2], codes, dq, "l2")
    assert (got >= 0).all()
    assert got[0, 0] == pytest.approx(0.0, abs=1e-3)


def test_precomputed_tables_identical():
    # the multi-block path builds tables once and passes them in — must
    # be bit-identical to the direct call, incl. the IP residual const
    q, codes, dq = _setup(seed=7, rotate=True)
    centroid = np.random.default_rng(5).standard_normal(32).astype(np.float32)
    for metric in ("l2", "ip"):
        tabs = kernels.adc_tables(q, dq, metric, centroid=centroid)
        via_tabs = kernels.adc_distances(
            q, codes, dq, metric, tables=tabs
        )
        direct = kernels.adc_distances(q, codes, dq, metric, centroid=centroid)
        np.testing.assert_array_equal(via_tabs, direct)


def test_accepts_buffer_list():
    q, codes, dq = _setup(seed=3)
    bufs = [c.tobytes() for c in codes]
    got = kernels.adc_distances(q, bufs, dq, "l2")
    want = kernels.adc_distances(q, codes, dq, "l2")
    np.testing.assert_array_equal(got, want)


def test_supports_adc_gating():
    dq = {"codebooks": np.zeros((2, 256, 2), np.float32)}
    assert kernels.supports_adc(dq, "l2")
    assert kernels.supports_adc(dq, "ip")
    assert not kernels.supports_adc(dq, "cosine")
    assert not kernels.supports_adc(None, "l2")
    assert not kernels.supports_adc({"mins": [0], "scales": [1]}, "l2")
    assert not kernels.supports_adc({**dq, "raw_vectors": True}, "l2")


def test_probe_partitions_adc_route_matches(spark):
    """End-to-end: a PQ artifact probed through probe_partitions must
    return the same top-k on the ADC route (nq <= threshold) as on the
    decode+GEMM route (forced by exceeding the threshold with padding)."""
    rng = np.random.default_rng(4)
    dim, m, n = 16, 4, 400
    books = rng.standard_normal((m, 256, dim // m)).astype(np.float32)
    codes = rng.integers(0, 256, (n, m), dtype=np.uint8)
    dq = {"codebooks": books}
    df = spark.createDataFrame(
        [(int(i), bytearray(codes[i].tobytes())) for i in range(n)],
        "row_id long, vector binary",
    )
    qv = rng.standard_normal(dim).astype(np.float32).tolist()
    # single query -> ADC route
    adc = kernels.probe_partitions(
        df, [(0, qv)], k=10, metric="l2", dim=dim, dequantize=dq
    ).collect()
    # same query replicated past the threshold -> GEMM route; compare idx 0
    many = [(i, qv) for i in range(kernels.ADC_MAX_NQ + 1)]
    gemm = (
        kernels.probe_partitions(
            df, many, k=10, metric="l2", dim=dim, dequantize=dq
        )
        .where("query_idx = 0")
        .collect()
    )
    a = [(r["row_id"], round(r["_distance"], 3)) for r in adc]
    g = [(r["row_id"], round(r["_distance"], 3)) for r in gemm]
    assert a == g


def test_pairwise_distances_accepts_list_inputs():
    # the contiguity fast-skip reads .dtype/.flags — it must be guarded so
    # list/tuple inputs (the documented wide contract) keep working
    rng = np.random.default_rng(5)
    q = rng.standard_normal((2, 8)).astype(np.float32)
    x = rng.standard_normal((5, 8)).astype(np.float32)
    ref = kernels.pairwise_distances(q, x, "l2")
    via_list = kernels.pairwise_distances(q.tolist(), x.tolist(), "l2")
    np.testing.assert_allclose(ref, via_list, rtol=1e-5)
    # single-query tuple form, ip + cosine too
    for metric in ("l2", "ip", "cosine"):
        a = kernels.pairwise_distances(q[:1], x, metric)
        b = kernels.pairwise_distances([tuple(q[0])], [tuple(r) for r in x], metric)
        np.testing.assert_allclose(a, b, rtol=1e-5)
