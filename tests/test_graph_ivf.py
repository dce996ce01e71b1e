"""Graph (DiskANN-style) + IVFFlat index behavior.

Recall gate mirrors the reference: 200 random dim-4 vectors, top-10 overlap
vs brute force >= 7/10 for the reference's query points
(test/sql/diskann_streaming.test:44-49, BASELINE.md recall floor)."""

import numpy as np
import pytest

from tests.conftest import make_vectors_df

QUERY_POINTS = [
    [0.5, 0.5, 0.5, 0.5],
    [1.0, 0.0, 0.0, 0.0],
    [0.0, 0.0, 1.0, 1.0],
    [0.2, 0.8, 0.3, 0.7],
]


@pytest.fixture(scope="module")
def recall_rows():
    rng = np.random.RandomState(42)
    return [(i, rng.rand(4).astype(np.float32).tolist()) for i in range(200)]


def _brute_top10(rows, q):
    x = np.asarray([v for _, v in rows], dtype=np.float32)
    qv = np.asarray(q, dtype=np.float32)
    d = ((x - qv) ** 2).sum(axis=1)
    return [rows[i][0] for i in np.argsort(d, kind="stable")[:10]]


def test_diskann_recall_floor(engine, recall_rows):
    df = make_vectors_df(engine.spark, recall_rows, dim=4)
    engine.register_table("vecs", df, row_id="id")
    engine.create_index("gidx", "vecs", "embedding", engine="diskann")
    for q in QUERY_POINTS:
        got = [r["id"] for r in engine.ann_search("vecs", "gidx", q, k=10).collect()]
        truth = _brute_top10(recall_rows, q)
        overlap = len(set(got) & set(truth))
        assert overlap >= 7, f"recall {overlap}/10 for query {q}"


def test_diskann_exact_on_tiny(engine):
    rows = [(1, [1, 0, 0]), (2, [0, 1, 0]), (3, [0, 0, 1]), (4, [0.9, 0.1, 0.0])]
    df = make_vectors_df(engine.spark, rows)
    engine.register_table("vectors", df, row_id="id")
    engine.create_index("gidx", "vectors", engine="diskann")
    res = engine.ann_search("vectors", "gidx", [1.0, 0.0, 0.0], k=2).collect()
    assert [r["id"] for r in res] == [1, 4]
    assert res[0]["_distance"] == 0.0


def test_diskann_delete_compensation(engine):
    rows = [(1, [1, 0, 0]), (2, [0, 1, 0]), (3, [0, 0, 1]), (4, [0.9, 0.1, 0.0])]
    df = make_vectors_df(engine.spark, rows)
    engine.register_table("vectors", df, row_id="id")
    engine.create_index("gidx", "vectors", engine="diskann")
    engine.delete("vectors", [1])
    res = engine.ann_search("vectors", "gidx", [1.0, 0.0, 0.0], k=1).collect()
    assert res[0]["id"] == 4  # next nearest after tombstoning the exact match


def test_diskann_batch_search(engine, recall_rows):
    df = make_vectors_df(engine.spark, recall_rows, dim=4)
    engine.register_table("vecs", df, row_id="id")
    engine.create_index("gidx", "vecs", engine="diskann")
    out = engine.ann_search_batch("vecs", "gidx", QUERY_POINTS, k=10)
    counts = {r["query_idx"]: 1 for r in out.select("query_idx").distinct().collect()}
    assert sorted(counts) == [0, 1, 2, 3]
    assert out.count() == 40


def test_ivfflat_two_clusters_exact(engine):
    # F7: two natural clusters around axes (faiss_ivfflat.test:11-26)
    rows = [
        (1, [1.0, 0.0, 0.0]), (2, [0.9, 0.1, 0.0]), (3, [0.95, 0.05, 0.0]),
        (4, [1.1, 0.0, 0.0]), (5, [0.9, 0.0, 0.1]),
        (6, [0.0, 1.0, 0.0]), (7, [0.0, 0.9, 0.1]), (8, [0.1, 1.0, 0.0]),
        (9, [0.0, 1.1, 0.0]), (10, [0.0, 0.95, 0.05]),
    ]
    df = make_vectors_df(engine.spark, rows)
    engine.register_table("vecs", df, row_id="id")
    engine.create_index(
        "ividx", "vecs", engine="faiss", index_type="IVFFlat",
        ivf_nlist=2, nprobe=2, train_sample=5,
    )
    # nprobe = nlist -> exhaustive -> exact
    res = engine.ann_search("vecs", "ividx", [1.0, 0.0, 0.0], k=3).collect()
    # squared-L2 from [1,0,0]: id1=0, id3=0.005, id4=0.01
    assert [r["id"] for r in res] == [1, 3, 4]


def test_ivfflat_nprobe1_finds_own_cluster(engine):
    rows = [(i, [1.0 + 0.01 * i, 0.0, 0.0]) for i in range(5)] + [
        (i, [0.0, 1.0 + 0.01 * i, 0.0]) for i in range(5, 10)
    ]
    df = make_vectors_df(engine.spark, rows)
    engine.register_table("vecs", df, row_id="id")
    engine.create_index(
        "ividx", "vecs", engine="faiss", index_type="IVFFlat", ivf_nlist=2, nprobe=1
    )
    res = engine.ann_search("vecs", "ividx", [1.0, 0.0, 0.0], k=3).collect()
    assert all(r["id"] < 5 for r in res)


def test_ivfflat_recall_on_random(engine, recall_rows):
    df = make_vectors_df(engine.spark, recall_rows, dim=4)
    engine.register_table("vecs", df, row_id="id")
    engine.create_index(
        "ividx", "vecs", engine="faiss", index_type="IVFFlat", ivf_nlist=8, nprobe=4
    )
    for q in QUERY_POINTS:
        got = [r["id"] for r in engine.ann_search("vecs", "ividx", q, k=10).collect()]
        truth = _brute_top10(recall_rows, q)
        assert len(set(got) & set(truth)) >= 7
