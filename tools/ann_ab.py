"""A/B the ANN-serving bench block across session configurations.

    python tools/ann_ab.py [--passes=3] [--confs=NAME:k=v,k2=v2;NAME2:...]

Round-10 diagnosis harness for the r9 verdict's 18 plan-identical ANN bench
regressions at local[32]: each pass runs each configuration in a FRESH
python/JVM process that replicates bench.py's exact flow — overlapped
two-engine warm-up (``_engine_for`` + ``_sq8_engine_for``), then the ANN
query block in bench order, timed with ``force_execution`` — so the JVM
history the queries see matches the driver's bench, not an isolated qprof
loop.  Configurations are injected via SPARK_GRAFT_EXTRA_CONF (the session's
documented override hook); per query the reported number is the
best-of-passes wall.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ANN_QUERIES = [
    "topk_l2", "sql_topk", "vector_distances", "knn_join",
    "ann_search_flat", "ann_search_local", "ann_search_local_payload",
    "ann_batch_flat", "ivf_full_probe", "ivf_hier_probe",
    "graph_topk", "graph_pq_topk", "sq8_rerank", "sq4_rerank",
    "fp16_rerank", "pca_rerank", "lsh_rerank", "pq_rerank", "hybrid_rrf",
]

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
spark = get_spark("ann-ab")
from concurrent.futures import ThreadPoolExecutor
t0 = time.time()
with ThreadPoolExecutor(2) as ex:
    fa = ex.submit(entrymod._engine_for, spark, sf_dir)
    fb = ex.submit(entrymod._sq8_engine_for, spark, sf_dir)
    fa.result(); fb.result()
out = {"index_build": round(time.time() - t0, 3)}
qs = entrymod.queries()
for name in queries:
    t0 = time.time()
    force_execution(qs[name](spark, sf_dir))
    out[name] = round(time.time() - t0, 3)
print("AB_RESULT " + json.dumps(out))
"""


def run_side(repo: str, sf_dir: str, queries: list[str], extra_conf: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_EXTRA_CONF"] = extra_conf
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    proc = subprocess.run(
        [sys.executable, "-c", INNER, repo, sf_dir, ",".join(queries)],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"conf {extra_conf!r} produced no result; stderr tail: {proc.stderr[-2000:]}"
    )


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = 3
    confs = {
        "base": "",
        "fifo": "spark.scheduler.mode=FIFO",
        "lz4": "spark.io.compression.codec=lz4",
        "fifo+lz4": "spark.scheduler.mode=FIFO;spark.io.compression.codec=lz4",
    }
    for a in sys.argv[1:]:
        if a.startswith("--passes="):
            passes = int(a.split("=", 1)[1])
        elif a.startswith("--confs="):
            confs = {}
            for part in a.split("=", 1)[1].split("|"):
                name, _, kv = part.partition(":")
                confs[name] = kv
    results: dict[str, list[dict]] = {name: [] for name in confs}
    # one unrecorded warm-up (page-cache parity)
    run_side(repo, sf_dir, ANN_QUERIES, next(iter(confs.values())))
    print("# warmed", file=sys.stderr)
    for p in range(passes):
        for name, conf in confs.items():
            r = run_side(repo, sf_dir, ANN_QUERIES, conf)
            results[name].append(r)
            print(f"# pass {p} conf {name}: total_ann="
                  f"{round(sum(v for k, v in r.items() if k != 'index_build'), 2)} "
                  f"build={r['index_build']}", file=sys.stderr)
    best = {
        name: {q: min(r.get(q, r.get("ann_search_local", 0.0)) for r in rs)
               for q in (["index_build"] + ANN_QUERIES)}
        for name, rs in results.items()
    }
    print(json.dumps({"sf_dir": sf_dir, "passes": passes,
                      "best": best, "all": results}))


if __name__ == "__main__":
    main()
