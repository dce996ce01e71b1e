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

# Above this many bytes of ndarray arguments the step runs on the driver
# instead (the r8 behavior): a large task closure pays serialization both
# ways and the result (which scales with the input for the training steps
# routed here) must fit spark.driver.maxResultSize (default 1g) on the
# collect back — a big driver build that succeeded locally must never
# start failing because its training step was shipped (ADVICE r9).  The
# GIL-contention win this module exists for only matters for CONCURRENT
# small/medium builds; a build with a 100+ MB training input dominates its
# own wall anyway.
CLOSURE_MAX_BYTES = 128 << 20


def _args_nbytes(args, kwargs) -> int:
    import numpy as np

    total = 0
    for a in list(args) + list(kwargs.values()):
        if isinstance(a, np.ndarray):
            total += a.nbytes
    return total


def run_remote(spark, fn, *args, **kwargs):
    """Run ``fn(*args, **kwargs)`` in ONE Spark task and return its result.

    ``fn`` must be a module-level function of a shipped/importable module
    (pickled by reference).  ``spark=None`` resolves the active session
    (builder fallback for fresh driver threads, like _timed_builds).
    Inputs above ``CLOSURE_MAX_BYTES`` run driver-local instead — see the
    constant's rationale."""
    if _args_nbytes(args, kwargs) > CLOSURE_MAX_BYTES:
        return fn(*args, **kwargs)
    if spark is None:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
        )
    sc = spark.sparkContext
    from duckdb_annsearch_spark.session import job_label

    label = f"remote:{getattr(fn, '__name__', 'fn')}"
    with job_label(sc, label):
        return (
            sc.parallelize([0], 1).map(lambda _: fn(*args, **kwargs)).collect()[0]
        )
