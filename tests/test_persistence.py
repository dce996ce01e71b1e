"""Persistence/restart parity (reference CHECKPOINT/restart tests:
diskann_persist.test, faiss_bind_after_restart.test, diskann_sq8_persist):
artifacts + catalog survive a fresh engine instance ("restart"); version
mismatches error like the reference's versioned header check
(src/diskann_index.cpp:406,470-474)."""

import json

import pytest

from duckdb_annsearch_spark.engine import AnnEngine
from tests.conftest import make_vectors_df

ROWS = [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]), (3, [0.0, 0.0, 1.0])]


def _fresh_engine(spark, workdir):
    """A new AnnEngine over the same workdir = process restart."""
    return AnnEngine(spark, workdir=workdir)


@pytest.mark.parametrize("kind", ["flat", "sq8", "ivf", "graph"])
def test_index_survives_restart(spark, tmp_path, kind):
    wd = str(tmp_path / "engine")
    eng = _fresh_engine(spark, wd)
    df = make_vectors_df(spark, ROWS, vec_col="embedding")
    eng.register_table("docs", df, row_id="id")
    if kind == "flat":
        eng.create_index("p", "docs", "embedding", engine="faiss", index_type="Flat")
    elif kind == "sq8":
        eng.create_index("p", "docs", "embedding", engine="faiss", index_type="Flat",
                         quantization="sq8")
    elif kind == "ivf":
        eng.create_index("p", "docs", "embedding", engine="faiss",
                         index_type="IVFFlat", ivf_nlist=2, nprobe=2)
    else:
        eng.create_index("p", "docs", "embedding", engine="diskann")

    eng2 = _fresh_engine(spark, wd)
    idx = eng2.get_index("p")
    assert idx.meta.num_vectors == 3
    assert idx.meta.quantized == (kind == "sq8")
    got = idx.search([1.0, 0.0, 0.0], 1).collect()
    assert got[0]["row_id"] == 1


def test_tombstones_and_delta_survive_restart(spark, tmp_path):
    wd = str(tmp_path / "engine")
    eng = _fresh_engine(spark, wd)
    df = make_vectors_df(spark, ROWS, vec_col="embedding")
    eng.register_table("docs", df, row_id="id")
    eng.create_index("p", "docs", "embedding", engine="faiss", index_type="Flat")
    eng.delete("docs", [1])
    eng.insert("docs", make_vectors_df(spark, [(9, [0.9, 0.1, 0.0])], vec_col="embedding"))

    eng2 = _fresh_engine(spark, wd)
    got = eng2.index_scan("p", [1.0, 0.0, 0.0], k=1).collect()
    assert got[0]["row_id"] == 9  # delta row visible, tombstoned row gone
    assert eng2.get_index("p").meta.num_deleted == 1


def test_version_mismatch_rejected(spark, tmp_path):
    wd = str(tmp_path / "engine")
    eng = _fresh_engine(spark, wd)
    df = make_vectors_df(spark, ROWS, vec_col="embedding")
    eng.register_table("docs", df, row_id="id")
    eng.create_index("p", "docs", "embedding", engine="faiss", index_type="Flat")
    meta_path = eng.catalog.meta_path("p")
    raw = json.load(open(meta_path))
    raw["version"] = 99
    json.dump(raw, open(meta_path, "w"))
    with pytest.raises(ValueError, match="format version 99"):
        _fresh_engine(spark, wd).get_index("p")


class TestMultiSessionCatalog:
    """Two engine sessions on ONE catalog root (round 9): meta writes are
    optimistic-concurrency guarded — a session whose loaded meta lags
    another SESSION's on-disk write fails loudly instead of silently
    undoing that session's lifecycle op.  Within one session, writes stay
    last-writer-wins (engine code holds several loaded copies)."""

    def _two_engines(self, spark, tmp):
        from duckdb_annsearch_spark.engine import AnnEngine

        df = make_vectors_df(spark, ROWS, vec_col="embedding")
        e1 = AnnEngine(spark, workdir=tmp)
        e1.register_table("mv", df, row_id="id")
        e1.create_index("mv_flat", "mv", "embedding",
                        engine="faiss", index_type="Flat")
        e2 = AnnEngine(spark, workdir=tmp)
        e2.register_table("mv", df, row_id="id")
        return e1, e2

    def test_sequential_cross_session_lifecycle_ok(self, spark, tmp_path):
        # fresh-load -> save flows never conflict: each engine's lifecycle
        # op re-loads meta.json before writing
        e1, e2 = self._two_engines(spark, str(tmp_path / "cat"))
        e2.delete("mv", [ROWS[0][0]])
        e1.delete("mv", [ROWS[1][0]])  # re-loads; sees e2's tombstone count
        from duckdb_annsearch_spark.catalog import Catalog

        meta = e1.catalog.load("mv_flat")
        assert meta.num_deleted == 2
        assert meta.mutation >= 3  # create + two tombstone writes

    def test_stale_cross_session_write_is_loud(self, spark, tmp_path):
        from duckdb_annsearch_spark.catalog import ConcurrentWriteError

        e1, e2 = self._two_engines(spark, str(tmp_path / "cat"))
        stale = e1.catalog.load("mv_flat")  # session 1 snapshot
        e2.delete("mv", [ROWS[0][0]])  # session 2 writes meta.json
        stale.num_deleted = 0  # would silently undo e2's tombstone count
        with pytest.raises(ConcurrentWriteError, match="another engine session"):
            e1.catalog.save(stale)
        # re-load -> retry is the documented recovery
        fresh = e1.catalog.load("mv_flat")
        fresh.extra["note"] = 1
        e1.catalog.save(fresh)

    def test_same_session_stale_write_stays_last_writer_wins(self, spark, tmp_path):
        e1, _ = self._two_engines(spark, str(tmp_path / "cat"))
        a = e1.catalog.load("mv_flat")
        b = e1.catalog.load("mv_flat")
        a.extra["x"] = 1
        e1.catalog.save(a)
        b.extra["y"] = 2
        e1.catalog.save(b)  # same writer id: allowed, adopts the counter
        assert e1.catalog.load("mv_flat").extra["y"] == 2
