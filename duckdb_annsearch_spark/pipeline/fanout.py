"""Scale-adaptive fan-out for expression-heavy map stages.

Problem (r9 plan audit): a small input — one parquet file, one row group —
scans as ONE task, so per-row-expensive map work (md5-per-shingle hashing,
n-gram zips, winnowing mins) runs single-threaded while every other core
idles.  At real scale the scan has hundreds+ of splits and the problem does
not exist; it is purely the small-input regime.

``fan_out_small`` round-robin-repartitions the input to the cluster's core
count ONLY when the planned partition count is below it.  The guard makes
it a provable no-op at scale (any 100 TB scan has >= cores partitions), and
when it does fire the exchange moves fewer-than-cores partitions of raw
input bytes — bounded by the smallness that triggered it.  Results are
unchanged: round-robin repartitioning only relocates rows.

This is deliberately NOT applied inside plan-asserted map-only operators
(winnow_fingerprints, chunk_documents, minhash_signatures, ...): their
zero-shuffle shape is the property that matters at scale.  Composite
operators whose expensive map feeds a shuffle anyway, and top-level callers
timing a small corpus, are the intended call sites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["fan_out_small"]


def fan_out_small(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` iff it is planned with
    fewer partitions than that (else returns ``df`` untouched)."""
    # keyless repartition sorts rows before exchanging them
    # (sortBeforeRepartition) — a MapType anywhere in the schema is
    # unorderable and would fail plan compilation (ADVICE r9); such
    # frames pass through untouched
    from pyspark.sql import types as T

    def _orderable(dt) -> bool:
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    if not all(_orderable(f.dataType) for f in df.schema.fields):
        return df
    if getattr(df, "_fanned_out", False):
        # nested call sites (composite operators over already-fanned
        # inputs): skip the physical-planning probe below entirely
        return df
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        # unplannable here (e.g. a streaming relation) — leave untouched
        return df
    if cur >= cores:
        return df
    out = df.repartition(cores)
    out._fanned_out = True
    return out
