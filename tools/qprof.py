"""Profile individual declared queries: N timed repeats of the bench's own
force_execution action, with per-run wall and the Spark job count.

Usage: python tools/qprof.py [-n REPS] query [query ...]

The first rep is reported separately (it includes plan compile + any
one-time engine warm-up); steady-state is min of the remaining reps —
matching bench.py's cold-run methodology while exposing the compile share.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]

    import __spark_entry__ as entrymod
    from bench import force_execution
    from duckdb_annsearch_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("qprof")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = entrymod.queries()
    for name in args:
        fn = qs[name]
        walls = []
        jobs = []
        for i in range(reps):
            sc.setJobDescription(f"qprof:{name}:{i}")
            j0 = tracker.getJobIdsForGroup(None)
            t0 = time.perf_counter()
            n = force_execution(fn(spark, sf_dir))
            walls.append(time.perf_counter() - t0)
            jobs.append(len(tracker.getJobIdsForGroup(None)) - len(j0))
        sc.setJobDescription(None)
        steady = min(walls[1:]) if len(walls) > 1 else walls[0]
        print(
            f"{name}: first={walls[0]:.3f}s steady={steady:.3f}s "
            f"jobs={jobs} rows={n} walls="
            + ",".join(f"{w:.3f}" for w in walls)
        )


if __name__ == "__main__":
    main()
