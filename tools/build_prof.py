"""Profile one index build job-by-job via the Spark event log.

    python tools/build_prof.py <index_name> [solo|concurrent]

Runs the named bench index build (from __spark_entry__'s build lists) in a
fresh session with ``spark.eventLog.enabled``, then parses the event log
into per-job walls (submission -> completion) with the job's description /
callsite, so the build's sequential job chain is attributable without a UI.
``concurrent`` runs the full two-engine warm-up instead (the bench's actual
index_build shape) and reports every job grouped by scheduler pool.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> None:
    target = sys.argv[1] if len(sys.argv) > 1 else "emb_graph"
    mode = sys.argv[2] if len(sys.argv) > 2 else "solo"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = tempfile.mkdtemp(prefix="spark_events_")
    os.environ["SPARK_GRAFT_EXTRA_CONF"] = (
        os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
        + f";spark.eventLog.enabled=true;spark.eventLog.dir=file://{evdir}"
        + ";spark.eventLog.compress=false;spark.eventLog.rolling.enabled=false"
    ).lstrip(";")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from duckdb_annsearch_spark.session import get_spark

    spark = get_spark("build-prof")

    t0 = time.time()
    if mode == "concurrent":
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(2) as ex:
            fa = ex.submit(entrymod._engine_for, spark, sf_dir)
            fb = ex.submit(entrymod._sq8_engine_for, spark, sf_dir)
            fa.result(); fb.result()
        wall = time.time() - t0
        print(f"# concurrent warm-up wall: {wall:.2f}s", file=sys.stderr)
        print("# per-index:", json.dumps(dict(sorted(
            entrymod.BUILD_TIMINGS.items()))), file=sys.stderr)
    else:
        from duckdb_annsearch_spark.engine import AnnEngine

        eng = AnnEngine(spark, workdir=tempfile.mkdtemp(prefix="ann_prof_"))
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        eng.register_table("embeddings", emb, row_id="vec_id")
        if target == "emb_graph":
            eng.streaming_build("emb_graph", "embeddings", "embedding",
                                partition_rows=256)
        elif target in ("info_gsq8", "info_gpq", "info_gopq"):
            kw = {"shards": 4, "shard_by": "kmeans"}
            if target == "info_gsq8":
                kw["quantization"] = "sq8"
            else:
                kw.update(quantization="pq", pq_m=16)
            if target == "info_gopq":
                kw["opq"] = True
            eng.streaming_build(target, "embeddings", "embedding", **kw)
        elif target == "emb_ivf_hier":
            eng.create_index(target, "embeddings", "embedding", engine="faiss",
                             index_type="IVFFlat", ivf_nlist=16,
                             train_mode="hierarchical", max_cell_rows=256)
        else:
            eng.create_index(target, "embeddings", "embedding",
                             engine="faiss", index_type="Flat")
        wall = time.time() - t0
        print(f"# {target} solo build wall: {wall:.2f}s", file=sys.stderr)

    spark.stop()  # flush the event log
    logs = []
    for root, _dirs, files in os.walk(evdir):
        logs += [os.path.join(root, f) for f in files if "appstatus" not in f]
    jobs: dict[int, dict] = {}
    for fn in logs:
        with open(fn) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    props = ev.get("Properties", {})
                    jobs[ev["Job ID"]] = {
                        "t0": ev["Submission Time"],
                        "desc": props.get("spark.job.description",
                                          props.get("callSite.short", "")),
                        "pool": props.get("spark.scheduler.pool", "default"),
                        "stages": len(ev.get("Stage IDs", [])),
                    }
                elif ev.get("Event") == "SparkListenerJobEnd":
                    j = jobs.get(ev["Job ID"])
                    if j:
                        j["t1"] = ev["Completion Time"]
    rows = []
    for jid, j in sorted(jobs.items()):
        if "t1" not in j:
            continue
        rows.append((jid, (j["t1"] - j["t0"]) / 1000.0, j["pool"],
                     j["stages"], j["desc"][:110]))
    print(f"{'job':>4} {'wall_s':>8} {'stages':>6}  pool / description")
    for jid, w, pool, st, desc in rows:
        print(f"{jid:>4} {w:>8.3f} {st:>6}  [{pool}] {desc}")
    print(f"# total jobs: {len(rows)}, sum of walls: "
          f"{sum(r[1] for r in rows):.2f}s (overlapping)", file=sys.stderr)


if __name__ == "__main__":
    main()
