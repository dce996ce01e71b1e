"""Distributed Bloom filter over an int64 key column.

PySpark exposes no Bloom builder (Spark's ``DataFrameStatFunctions.
bloomFilter`` is JVM-only), so this is the canonical distributed build
done DataFrame-native: each partition sets its keys' bits into a local
numpy bitmap inside one Arrow-batched ``mapInPandas`` pass and emits the
bitmap as ONE binary row; the driver ORs the per-partition bitmaps
streamingly (``toLocalIterator`` — peak driver memory is two bitmaps,
never partitions × bitmap).  Membership tests run map-side from the
broadcast bitmap, vectorized over Arrow batches.

Hashing is Kirsch-Mitzenmacher double hashing (two splitmix64-derived
64-bit hashes; bit_i = (h1 + i*h2) mod m), the standard construction —
k independent hash functions are unnecessary (Kirsch & Mitzenmacher,
"Less Hashing, Same Performance", ESA 2006).

The point at 100 TB: an exactness-preserving shuffle guard.  A Bloom
has NO false negatives, so "definitely not in the reference" rows can
skip a join entirely (kept outright for anti-join semantics, dropped
outright for inner-join semantics) and only the ~fpp false-positive
sliver pays the shuffle — see ``dedup_against(ref_bloom_fpp=...)``,
where the new crawl mostly does NOT overlap the reference corpus and
the band join's left side shrinks to the actual-overlap fraction.

Sizing at scale (m = -n ln p / ln^2 2, ~= 1.2 GB per 1e9 keys at 1%):

=========  =========  ==========  =========
expected   fpp 0.01   fpp 0.05    fpp 0.10
=========  =========  ==========  =========
1e8 keys   ~120 MiB    ~75 MiB     ~60 MiB
1e9 keys   ~1.2 GiB   ~750 MiB    ~600 MiB
1e10 keys  ~12 GiB    ~7.5 GiB    ~6 GiB
=========  =========  ==========  =========

A single 12 GiB broadcast is past what torrent distribution serves
comfortably; above ~1e9 reference keys prefer (a) fpp 0.05 — the
false-positive sliver only pays the join it would have paid anyway, so
a looser filter trades a little pruning power for 40% of the bitmap —
and (b) shard-level filters: partition the reference by key range,
build one Bloom per shard, and test each new-corpus partition against
only the shards its key range can hit.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["BloomFilter", "bloom_from_df", "bloom_filter_df"]

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(z: np.ndarray) -> np.ndarray:
    """The splitmix64 finalizer — a full-avalanche 64-bit mix (public
    constant set from Steele et al. / java.util.SplittableRandom)."""
    z = (z + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
    return z ^ (z >> np.uint64(31))


class BloomFilter:
    """Immutable bitmap + parameters; picklable (rides task closures /
    broadcasts as the raw words array)."""

    def __init__(self, words: np.ndarray, num_bits: int, num_hashes: int):
        self.words = np.ascontiguousarray(words, dtype=np.uint64)
        self.num_bits = int(num_bits)
        self.num_hashes = int(num_hashes)

    @staticmethod
    def params(expected: int, fpp: float) -> tuple:
        """(num_bits, num_hashes) for an expected insert count and target
        false-positive rate — the textbook m = -n ln p / ln²2,
        k = (m/n) ln 2 formulas, word-aligned."""
        n = max(1, int(expected))
        m = int(-n * math.log(fpp) / (math.log(2.0) ** 2))
        m = max(64, (m + 63) // 64 * 64)
        k = max(1, round(m / n * math.log(2.0)))
        return m, min(16, k)

    def _bit_positions(self, keys: np.ndarray) -> np.ndarray:
        """(len(keys), k) bit indices via double hashing."""
        z = keys.astype(np.int64).view(np.uint64)
        h1 = _splitmix64(z)
        h2 = _splitmix64(z ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
        i = np.arange(self.num_hashes, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(
            self.num_bits
        )

    def add(self, keys: np.ndarray) -> None:
        pos = self._bit_positions(np.asarray(keys))
        np.bitwise_or.at(
            self.words,
            (pos >> np.uint64(6)).ravel(),
            np.uint64(1) << (pos & np.uint64(63)).ravel(),
        )

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership: bool array, no false negatives."""
        keys = np.asarray(keys)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._bit_positions(keys)
        w = self.words[(pos >> np.uint64(6))]
        bit = (w >> (pos & np.uint64(63))) & np.uint64(1)
        return bit.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.num_bits == other.num_bits
        self.words |= other.words
        return self


def bloom_from_df(
    df: DataFrame,
    col: str,
    expected: int | None = None,
    fpp: float = 0.01,
) -> BloomFilter:
    """Build a Bloom filter over an int64 column distributively: one
    Arrow-batched pass sets bits into per-partition bitmaps, the driver
    OR-reduces them streamingly.  ``expected`` sizes the filter (one
    extra count() pass when omitted); NULL keys are skipped (SQL
    semantics: NULL is never a member)."""
    # NULLs are filtered Spark-side BEFORE mapInPandas: a nullable long
    # column with any NULL in an Arrow batch round-trips to pandas as
    # float64 (NaN for NULL), silently corrupting keys > 2^53 — fatal for
    # 60-bit hash-prefix keys.  A null-free column stays int64 end-to-end.
    src = df.select(F.col(col).cast("long").alias(col)).where(
        F.col(col).isNotNull()
    )
    if expected is None:
        expected = src.count()
    num_bits, num_hashes = BloomFilter.params(expected, fpp)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bf = BloomFilter(
            np.zeros(num_bits // 64, dtype=np.uint64), num_bits, num_hashes
        )
        seen = False
        for pdf in batches:
            keys = pdf[col].to_numpy(dtype=np.int64)
            if keys.size:
                bf.add(keys)
                seen = True
        if seen:
            yield pd.DataFrame({"bitmap": [bf.words.tobytes()]})

    parts = src.mapInPandas(build, "bitmap binary")
    out = BloomFilter(
        np.zeros(num_bits // 64, dtype=np.uint64), num_bits, num_hashes
    )
    # OR-reduce the per-partition bitmaps in ONE treeReduce job:
    # toLocalIterator (the r8 shape) launches one sequential mini-job per
    # partition — 32 handshakes for a 32-partition input (r9 measurement:
    # the bloom-guarded dedup ran 62 jobs).  Memory stays bounded: an
    # executor holds at most two partial bitmaps during the merge and the
    # driver receives exactly one.

    def _or(a: bytes, b: bytes) -> bytes:
        return (
            np.frombuffer(a, dtype=np.uint64)
            | np.frombuffer(b, dtype=np.uint64)
        ).tobytes()

    try:
        merged = parts.rdd.map(lambda r: bytes(r["bitmap"])).treeReduce(_or)
    except ValueError as exc:
        # ONLY the empty-RDD case is expected (zero-row source -> empty
        # filter).  A ValueError from the merge itself (e.g. mismatched
        # bitmap buffer lengths) is corruption and must not masquerade as
        # 'no rows' — the guarded dedup would silently miss everything
        # (ADVICE r9).
        if "empty" in str(exc).lower():
            return out
        raise
    out.words |= np.frombuffer(merged, dtype=np.uint64)
    return out


def bloom_filter_df(
    df: DataFrame, col: str, bf: BloomFilter, keep: str = "maybe"
) -> DataFrame:
    """Rows whose ``col`` the filter ``'maybe'`` contains (the sliver a
    following exact join must still check) or ``'definitely_not'``
    (rows that can skip that join entirely — Bloom has no false
    negatives).  NULL keys are 'definitely not' members.  Vectorized
    Arrow-batched test against the closure-shipped bitmap."""
    if keep not in ("maybe", "definitely_not"):
        raise ValueError(f"keep must be 'maybe' or 'definitely_not', got {keep!r}")
    want_maybe = keep == "maybe"
    cols = df.columns
    # Explicit broadcast (not closure capture): one torrent-distributed
    # copy per executor regardless of task count — at 1e10-key scale the
    # bitmap is GBs and per-task closure shipping would be the bottleneck.
    bcast = df.sparkSession.sparkContext.broadcast(bf)

    def test(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local_bf = bcast.value
        for pdf in batches:
            keys = pdf["__bloom_key"].to_numpy(dtype=np.int64)
            valid = ~pdf["__bloom_null"].to_numpy(dtype=bool)
            hit = np.zeros(len(pdf), dtype=bool)
            if valid.any():
                hit[valid] = local_bf.might_contain(keys[valid])
            yield pdf[hit if want_maybe else ~hit].drop(
                columns=["__bloom_key", "__bloom_null"]
            )

    # The key must never round-trip through float64: a NULL anywhere in an
    # Arrow batch demotes a nullable long column to float64 in pandas,
    # corrupting every key > 2^53 in that batch BEFORE might_contain sees
    # it (a true duplicate could then skip its bits and survive — a false
    # negative, breaking the bloom≡plain guarantee).  Ship a coalesced
    # non-null key plus a separate null flag instead.
    key = F.col(col).cast("long")
    keyed = df.withColumn(
        "__bloom_key", F.coalesce(key, F.lit(0).cast("long"))
    ).withColumn("__bloom_null", key.isNull())
    return keyed.mapInPandas(
        test, keyed.drop("__bloom_key", "__bloom_null").schema
    ).select(*cols)
