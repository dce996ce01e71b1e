"""Off-driver execution of one-shot numpy training steps.

Concurrent index builds run from driver threads (bench warm-up, any
multi-index DDL), and the expensive training steps — the Vamana pilot
build, PQ/OPQ Lloyd iterations — are Python-loop-heavy numpy that holds
the driver GIL, so N concurrent builds serialize into one thread of
training no matter how many cores exist.  Executing the step inside a
single Spark task moves it into a Python *worker process* (its own
interpreter and GIL) on an executor: concurrent builds then train
concurrently, and the driver goes back to doing no data work
(optimization guide §5).

Numerically identical by construction: the same module-level function
runs on the same inputs with the same libraries — the task boundary only
changes *which process* executes it.  Inputs (training samples, tens of
KB to a few MB) ship in the task closure; the result returns through one
``collect``.
"""

from __future__ import annotations

__all__ = ["run_remote"]


def run_remote(spark, fn, *args, **kwargs):
    """Run ``fn(*args, **kwargs)`` in ONE Spark task and return its result.

    ``fn`` must be a module-level function of a shipped/importable module
    (pickled by reference).  ``spark=None`` resolves the active session
    (builder fallback for fresh driver threads, like _timed_builds)."""
    if spark is None:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
        )
    sc = spark.sparkContext
    return sc.parallelize([0], 1).map(lambda _: fn(*args, **kwargs)).collect()[0]
