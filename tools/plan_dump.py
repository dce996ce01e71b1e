"""Dump .explain('formatted') for declared queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/plan_dump.py <tag> <suffix> [query ...]
  tag     e.g. r09
  suffix  'before' or 'after'
  query   names from __spark_entry__.queries(); default = the bench list.

Plans are captured WITHOUT executing the query (no warm engines needed for
pure-DataFrame queries; engine-backed queries trigger their one-time index
warm-up).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]

    import __spark_entry__ as entrymod
    from duckdb_annsearch_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_dump")
    qs = entrymod.queries()
    if not names:
        names = list(qs)
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record, keep dumping
            plan = f"ERROR {type(exc).__name__}: {exc}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"# wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
