"""Parity with ``test/sql/diskann_advanced.test`` and
``test/sql/diskann_metric_ip.test``: custom build parameters, k > N on a
graph index, and the IP-metric graph index including insert-then-search.
"""

from tests.conftest import make_vectors_df


def test_custom_graph_params(engine):
    # diskann_advanced.test:10-35 — max_degree/build_complexity/alpha options
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = make_vectors_df(engine.spark, rows, dim=2)
    engine.register_table("custom_vecs", df, row_id="id")
    engine.create_index(
        "custom_idx", "custom_vecs", "embedding", engine="diskann",
        max_degree=32, build_complexity=64, alpha=1.0,
    )
    meta = engine.catalog.load("custom_idx")
    assert int(meta.params["max_degree"]) == 32
    assert float(meta.params["alpha"]) == 1.0
    got = [
        (r["row_id"], r["distance"])
        for r in engine.index_scan("custom_idx", [1.0, 0.0], 2)
        .orderBy("distance")
        .collect()
    ]
    assert got == [(1, 0.0), (2, 2.0)]  # squared L2, diskann_advanced.test:27-29


def test_graph_k_greater_than_n(engine):
    # diskann_advanced.test:37-57
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = make_vectors_df(engine.spark, rows, dim=2)
    engine.register_table("small_vecs", df, row_id="id")
    engine.create_index("small_idx", "small_vecs", "embedding", engine="diskann")
    assert engine.index_scan("small_idx", [0.5, 0.5], 10).count() == 2


def test_graph_ip_metric_with_insert(engine):
    # diskann_metric_ip.test — IP graph index; nearest by dot product
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
        (4, [0.7, 0.7, 0.0]),
    ]
    df = make_vectors_df(engine.spark, rows)
    engine.register_table("vecs", df, row_id="id")
    engine.create_index("ip_idx", "vecs", "embedding", engine="diskann", metric="ip")
    assert engine.ann_list().where("name = 'ip_idx'").count() == 1
    got = [r["id"] for r in engine.ann_search("vecs", "ip_idx", [1.0, 0.0, 0.0], 1).collect()]
    assert got == [1]
    # insert a near-duplicate; the delta path must surface it at rank 2
    # (diskann_metric_ip.test:47-57)
    engine.insert("vecs", make_vectors_df(engine.spark, [(5, [0.95, 0.05, 0.0])]))
    got = [
        r["id"]
        for r in engine.ann_search("vecs", "ip_idx", [1.0, 0.0, 0.0], 2).collect()
    ]
    assert got == [1, 5]


def test_beam_search_batch_matches_single():
    """Lock-step batch search must be result-identical to per-query
    beam_search (same stable merge, visited discipline, expansion order)."""
    import numpy as np

    from duckdb_annsearch_spark.index.vamana import build_vamana

    rng = np.random.RandomState(11)
    x = rng.randn(400, 16).astype(np.float32)
    for metric in ("l2", "ip", "cosine"):
        g = build_vamana(x, metric=metric, max_degree=16, build_complexity=32)
        qs = rng.randn(23, 16).astype(np.float32)
        batch = g.beam_search_batch(qs, 10, 32)
        for i in range(len(qs)):
            labels, dists = g.beam_search(qs[i], 10, 32)
            bl, bd = batch[i]
            assert np.array_equal(labels, bl), (metric, i)
            assert np.allclose(dists, bd), (metric, i)


def test_beam_search_batch_chunked_matches():
    import numpy as np

    from duckdb_annsearch_spark.index.vamana import build_vamana

    rng = np.random.RandomState(3)
    x = rng.randn(200, 8).astype(np.float32)
    g = build_vamana(x, max_degree=12, build_complexity=24)
    qs = rng.randn(17, 8).astype(np.float32)
    full = g.beam_search_batch(qs, 5, 24)
    tiny = g.beam_search_batch(qs, 5, 24, visited_budget_bytes=1)  # chunk=1
    for (al, ad), (bl, bd) in zip(full, tiny):
        assert np.array_equal(al, bl) and np.allclose(ad, bd)
