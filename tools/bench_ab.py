"""Idle-box A/B for named bench queries across two repo checkouts.

    python tools/bench_ab.py <repo_a> <repo_b> [--sf=DIR] [--queries=a,b]
        [--passes=3]

Each pass runs each side in a FRESH python/JVM process (fair cold state),
interleaved A,B,A,B,... after one unrecorded warm-up pass per side (page
cache parity — the round-close ritual's documented cold-cache bias is
~2x on whichever side runs first).  Per query the reported number is the
best-of-passes wall, the same convention as the micro grid.  Prints one
JSON line.

Written for the round-6 verdict item 7 (dedup-family drift: r5 vs r6
driver records moved +15-19% on untouched code) but generic over any
``queries()`` entries that need no ANN index warm-up.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

INNER = r"""
import json, os, sys, time
repo = sys.argv[1]
sf_dir = sys.argv[2]
queries = sys.argv[3].split(",")
sys.path.insert(0, repo)
os.chdir(repo)
import __spark_entry__ as entrymod
from bench import force_execution
from duckdb_annsearch_spark.session import get_spark
spark = get_spark("bench-ab")
qs = entrymod.queries()
out = {}
for name in queries:
    t0 = time.time()
    force_execution(qs[name](spark, sf_dir))
    out[name] = round(time.time() - t0, 3)
print("AB_RESULT " + json.dumps(out))
"""


def run_side(repo: str, sf_dir: str, queries: list[str]) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", INNER, repo, sf_dir, ",".join(queries)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"side {repo} produced no result; stderr tail: {proc.stderr[-2000:]}"
    )


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    repo_a, repo_b = os.path.abspath(pos[0]), os.path.abspath(pos[1])
    sf_dir = "/root/testdata/sf0.1"
    queries = ["dedup_clusters", "dedup_against", "neardup_stream_batch"]
    passes = 3
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--queries="):
            queries = a.split("=", 1)[1].split(",")
        elif a.startswith("--passes="):
            passes = int(a.split("=", 1)[1])

    results = {"a": [], "b": []}
    # warm-up pass per side (not recorded): page-cache parity
    for tag, repo in (("a", repo_a), ("b", repo_b)):
        run_side(repo, sf_dir, queries)
        print(f"# warmed {tag} ({repo})", file=sys.stderr)
    for p in range(passes):
        for tag, repo in (("a", repo_a), ("b", repo_b)):
            r = run_side(repo, sf_dir, queries)
            results[tag].append(r)
            print(f"# pass {p} side {tag}: {r}", file=sys.stderr)

    best = {
        tag: {q: min(r[q] for r in results[tag]) for q in queries}
        for tag in ("a", "b")
    }
    print(
        json.dumps(
            {
                "repo_a": repo_a,
                "repo_b": repo_b,
                "sf_dir": sf_dir,
                "passes": passes,
                "best_a": best["a"],
                "best_b": best["b"],
                "ratio_b_over_a": {
                    q: round(best["b"][q] / best["a"][q], 3) for q in queries
                },
                "all_a": results["a"],
                "all_b": results["b"],
            }
        )
    )


if __name__ == "__main__":
    main()
