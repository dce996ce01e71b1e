"""Self-check harness mimicking the driver's CORRECTNESS gate:
runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the same sf, compares row count + sorted column names + an
order-insensitive canonical value hash.

Usage: python tools/selfcheck.py [--vanilla] [sf_dir] [query ...]

``--vanilla`` runs against a bare driver-like session — NO engine-tuned
confs (no Arrow flag, default shuffle partitions). Round 1 shipped a bug
(np.float32 in driver-side createDataFrame) that only reproduces without
Arrow; the engine-tuned ``get_spark`` session could never catch it. Run
BOTH modes before calling a round done.
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_value(v) -> str:
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def df_hash(pdf) -> tuple[int, list[str], str]:
    cols = sorted(pdf.columns)
    rows = [
        "|".join(canon_value(row[c]) for c in cols)
        for _, row in pdf.iterrows()
    ]
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(pdf), cols, h


def vanilla_spark():
    """A session shaped like the round driver's: master + app name only,
    none of the engine's tuned confs. Environment-coupling bugs (Arrow-less
    type verification, default 200 shuffle partitions) reproduce here."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .appName("selfcheck-vanilla")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def run_selfcheck(sf_dir: str, only=None, spark=None) -> dict:
    """The driver-shaped oracle compare as a callable: run each selected
    ``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB,
    returning ``{name: (status, detail)}`` where status is one of
    OK / ROWS_ONLY / MISMATCH / SPARK_ERROR / ORACLE_ERROR.  Used by the
    CLI below and by ``tests/test_selfcheck_sweep.py`` so the sweep the
    round-close ritual cites is pytest-enforced, not ritual."""
    import duckdb

    import __spark_entry__ as entrymod
    from duckdb_annsearch_spark.session import get_spark

    only = set(only) if only else set()
    if spark is None:
        spark = get_spark("selfcheck", 8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            results[name] = ("SPARK_ERROR", str(e)[:300])
            print(f"[{name}] SPARK ERROR: {str(e)[:300]}")
            continue
        t1 = time.time()
        if name not in oracles:
            results[name] = ("ROWS_ONLY", len(spark_pdf))
            print(f"[{name}] rows-only: {len(spark_pdf)} rows ({t1-t0:.1f}s)")
            continue
        try:
            ora_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = ("ORACLE_ERROR", str(e)[:300])
            print(f"[{name}] ORACLE ERROR: {str(e)[:300]}")
            continue
        sn, sc, sh = df_hash(spark_pdf)
        on, oc, oh = df_hash(ora_pdf)
        ok = (sn, sc, sh) == (on, oc, oh)
        status = "OK" if ok else "MISMATCH"
        results[name] = (status, (sn, on, sc == oc, sh == oh))
        print(
            f"[{name}] {status}: rows {sn}/{on} cols_match={sc == oc} "
            f"hash {'=' if sh == oh else '!='} ({t1-t0:.1f}s)"
        )
        if not ok:
            if sc != oc:
                print(f"    spark cols: {sc}\n    oracle cols: {oc}")
            if sn and on:
                import pandas as pd

                scols = sorted(spark_pdf.columns)
                a = spark_pdf[scols].astype(str).sort_values(scols).head(5)
                b = ora_pdf[sorted(ora_pdf.columns)].astype(str).sort_values(sorted(ora_pdf.columns)).head(5)
                print("    spark head:", a.to_dict("records")[:3])
                print("    oracle head:", b.to_dict("records")[:3])

    bad = {k: v for k, v in results.items() if v[0] not in ("OK", "ROWS_ONLY")}
    print(f"\n{len(results) - len(bad)}/{len(results)} OK; failures: {sorted(bad)}")
    return results


def main():
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = vanilla_spark() if vanilla else None
    results = run_selfcheck(sf_dir, only=only, spark=spark)
    bad = {k: v for k, v in results.items() if v[0] not in ("OK", "ROWS_ONLY")}
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
