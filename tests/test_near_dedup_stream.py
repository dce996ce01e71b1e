"""Streaming MinHash-LSH near-dedup (streaming/dedup.py): batch-mode
increment semantics (history hits, in-batch bucket-min, degenerate-doc
bypass), replay idempotency by partition layout, store compaction, and
the end-to-end file-stream drive with state carried across micro-batches.
"""

import os

import pytest
from pyspark.sql import functions as F

from duckdb_annsearch_spark.streaming.dedup import (
    compact_seen,
    dedup_near_stream,
    near_dedup_increment,
    register_seen_buckets,
)

BASE = "the quick brown fox jumps over the lazy dog while birds sing in trees"
NEAR = BASE + " today"  # high-Jaccard variant: shares most shingles
OTHER = "completely different content about spark shuffles and parquet row groups"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _step(spark, rows, seen_dir, batch_id, **kw):
    surv = near_dedup_increment(_df(spark, rows), str(seen_dir), batch_id, **kw)
    out = sorted(r["doc_id"] for r in surv.collect())
    register_seen_buckets(
        _df(spark, [(i, t) for i, t in rows if i in out]),
        str(seen_dir),
        batch_id,
        **kw,
    )
    return out


class TestIncrement:
    def test_in_batch_bucket_min(self, spark, tmp_path):
        seen = tmp_path / "seen"
        out = _step(
            spark, [(1, BASE), (2, NEAR), (3, OTHER)], seen, 0
        )
        assert out == [1, 3]  # 2 collides with smaller-id 1

    def test_history_hit_across_batches(self, spark, tmp_path):
        seen = tmp_path / "seen"
        assert _step(spark, [(1, BASE), (2, OTHER)], seen, 0) == [1, 2]
        # next batch: a near-copy of doc 1 arrives with a SMALLER id —
        # history still wins (no in-batch ordering vs history)
        assert _step(spark, [(0, NEAR), (5, "fresh unseen words entirely new")], seen, 1) == [5]

    def test_degenerate_docs_bypass(self, spark, tmp_path):
        seen = tmp_path / "seen"
        rows = [(1, None), (2, ""), (3, "xy"), (4, BASE)]
        out = _step(spark, rows, seen, 0)
        assert out == [1, 2, 3, 4]  # no shingles -> no LSH evidence -> kept
        # and they never register: the next empty doc also passes
        assert _step(spark, [(9, ""), (10, None)], seen, 1) == [9, 10]

    def test_replay_idempotent(self, spark, tmp_path):
        """Replaying a batch whose buckets were already registered (crash
        between bucket write and checkpoint commit) must produce the
        identical survivor set — its own partition is excluded from the
        history it reads."""
        seen = tmp_path / "seen"
        first = _step(spark, [(1, BASE), (2, NEAR)], seen, 0)
        assert first == [1]
        replay = near_dedup_increment(
            _df(spark, [(1, BASE), (2, NEAR)]), str(seen), 0
        )
        assert sorted(r["doc_id"] for r in replay.collect()) == [1]

    def test_seed_from_static_corpus(self, spark, tmp_path):
        # the streaming twin of dedup_against: a pre-registered reference
        # corpus dedups the very first micro-batch
        from duckdb_annsearch_spark.streaming.dedup import (
            seed_seen_from_corpus,
        )

        seen = tmp_path / "seen"
        seed_seen_from_corpus(_df(spark, [(100, BASE)]), str(seen))
        out = _step(spark, [(1, NEAR), (2, OTHER)], seen, 0)
        assert out == [2]
        # seeded buckets survive compaction
        from duckdb_annsearch_spark.streaming.dedup import compact_seen

        compact_seen(spark, str(seen))
        assert _step(spark, [(3, NEAR)], seen, 1) == []

    def test_seed_merge_and_param_guard(self, spark, tmp_path):
        from duckdb_annsearch_spark.streaming.dedup import (
            seed_seen_from_corpus,
        )
        import pytest

        seen = tmp_path / "seen"
        seed_seen_from_corpus(_df(spark, [(100, BASE)]), str(seen))
        seed_seen_from_corpus(_df(spark, [(200, OTHER)]), str(seen))
        # both corpora dedup the stream: merge, not overwrite
        assert _step(spark, [(1, NEAR)], seen, 0) == []
        assert _step(spark, [(2, OTHER + " x")], seen, 1) == []
        # mismatched banding refuses loudly instead of silently never
        # colliding
        with pytest.raises(ValueError, match="mismatch|built with"):
            seed_seen_from_corpus(
                _df(spark, [(300, BASE)]), str(seen), bands=32, num_hashes=64
            )
        with pytest.raises(ValueError, match="mismatch|built with"):
            near_dedup_increment(
                _df(spark, [(9, BASE)]), str(seen), 5, bands=8, num_hashes=64
            )

    def test_compact_seen(self, spark, tmp_path):
        seen = tmp_path / "seen"
        _step(spark, [(1, BASE)], seen, 0)
        _step(spark, [(2, OTHER)], seen, 1)
        compact_seen(spark, str(seen), partitions=2)
        # one folded partition + the LSH-config pin, which must survive
        assert sorted(os.listdir(str(seen))) == ["_params.json", "batch=-1"]
        # behavior unchanged after compaction
        out = near_dedup_increment(_df(spark, [(3, NEAR)]), str(seen), 2)
        assert out.count() == 0


def test_stream_end_to_end(spark, tmp_path):
    """File stream, one file per micro-batch: batch 0 keeps the bucket-min
    of a near-dup pair, batch 1 drops a near-copy of batch 0's survivor
    via the persistent store and keeps the genuinely new doc."""
    src = tmp_path / "src"
    seen = tmp_path / "seen"
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    _df(spark, [(1, BASE), (2, NEAR), (3, OTHER)]).coalesce(1).write.parquet(
        str(src / "f0")
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = dedup_near_stream(
        stream, str(seen), str(sink), str(ckpt), trigger={"availableNow": True}
    )
    q.awaitTermination(120)
    got0 = sorted(
        r["doc_id"] for r in spark.read.parquet(str(sink)).collect()
    )
    assert got0 == [1, 3]
    # second wave: near-copy of BASE (drop), brand-new doc (keep)
    _df(
        spark, [(10, BASE + " again"), (11, "entirely novel text about nothing")]
    ).coalesce(1).write.parquet(str(src / "f1"))
    q = dedup_near_stream(
        stream, str(seen), str(sink), str(ckpt), trigger={"availableNow": True}
    )
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in spark.read.parquet(str(sink)).collect())
    assert got == [1, 3, 11]


def test_stream_requires_stream(spark):
    with pytest.raises(ValueError):
        dedup_near_stream(_df(spark, [(1, "x")]), "a", "b", "c")
