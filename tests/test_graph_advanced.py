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
