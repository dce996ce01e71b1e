"""Scale demonstration: sharded out-of-core graph build + serving at
hundreds of thousands of vectors (the ROADMAP 50k sweep at 4-10x).

    python tools/scale_demo.py [N] [dim] [shards] [--sq8 | --pq] [--pq-m=M]
        [--clusters=C] [--workdir=PATH] [--nprobe-shards=a,b,...]

``--clusters=C`` generates a mixture of C clusters (deterministic hash
centers in [0,1)^dim, uniform half-width-0.15 within-cluster noise)
instead of uniform vectors — the shape real embedding corpora have, and
the case kmeans-shard pruning is designed for (the uniform default is
pruning's worst case, ROADMAP "Shard pruning on UNIFORM random
vectors").  ``--workdir=PATH`` persists data+index there and SKIPS
generation/build when the index already exists, so one long build can
serve several probe sweeps.  ``--nprobe-shards=a,b`` adds pruned-probe
measurements (0 = full fan-out) after the headline full-probe pass.

Generates N synthetic vectors DISTRIBUTEDLY (mapInPandas, per-row seeded —
no driver materialization), builds the kmeans-sharded streaming graph
(mmap DANN sidecars on), then measures:
  * build wall seconds,
  * recall@10 over 20 spread queries vs exact brute force (quantized runs
    serve through the engine's rerank recipe — 10x over-fetch + exact
    re-score, ``ann_search(oversample=10, rerank=True)`` — the documented
    serving shape for lossy codes),
  * mean per-query probe wall,
  * peak python-worker RSS during the probe phase (sampled from /proc) —
    the number that decides whether a shard fits an executor.

Prints one JSON line. The measured table lives in ROADMAP.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker_rss_sampler(stop: threading.Event, out: dict) -> None:
    """Sample RSS of pyspark worker processes (python daemons forked for
    UDF execution); record peak single-process and peak total MiB."""
    me = os.getpid()
    while not stop.is_set():
        single, total = 0, 0
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == me:
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read().decode("utf-8", "ignore")
                if "pyspark" not in cmd and "daemon" not in cmd:
                    continue
                with open(f"/proc/{pid}/status") as f:
                    for line in f:
                        if line.startswith("VmRSS:"):
                            kb = int(line.split()[1])
                            single = max(single, kb)
                            total += kb
                            break
            except (OSError, ValueError):
                continue
        out["peak_worker_rss_mib"] = max(out.get("peak_worker_rss_mib", 0), single // 1024)
        out["peak_total_worker_rss_mib"] = max(
            out.get("peak_total_worker_rss_mib", 0), total // 1024
        )
        stop.wait(0.2)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 250_000
    dim = int(args[1]) if len(args) > 1 else 64
    shards = int(args[2]) if len(args) > 2 else 32
    sq8 = "--sq8" in sys.argv
    pq = "--pq" in sys.argv
    pq_m = None
    clusters = None
    workdir = None
    nprobe_sweep: list[int] = []
    for a in sys.argv[1:]:
        if a.startswith("--pq-m="):
            pq_m = int(a.split("=", 1)[1])
        elif a.startswith("--clusters="):
            clusters = int(a.split("=", 1)[1])
        elif a.startswith("--workdir="):
            workdir = a.split("=", 1)[1]
        elif a.startswith("--nprobe-shards="):
            nprobe_sweep = [
                int(v) for v in a.split("=", 1)[1].split(",") if v.strip()
            ]
    n_queries, k = 20, 10

    import numpy as np
    import pandas as pd

    from duckdb_annsearch_spark.engine import AnnEngine
    from duckdb_annsearch_spark.session import get_spark

    spark = get_spark("scale-demo")
    tmp = workdir or tempfile.mkdtemp(prefix="scale_demo_")
    os.makedirs(tmp, exist_ok=True)
    data_path = os.path.join(tmp, "vectors.parquet")

    def _splitmix_unit(idx):
        """splitmix64 of a uint64 index array -> float32 uniform [0,1);
        fully vectorized (the per-row RandomState this replaces made
        GENERATION the wall-clock bottleneck past 10M rows), deterministic
        per index so any row regenerates O(dim) for ground truth."""
        z = idx + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        return ((z >> np.uint64(11)).astype(np.float64) / float(1 << 53)).astype(
            np.float32
        )

    # disjoint hash streams: row noise, cluster assignment, cluster centers
    _CLUSTER_STREAM = np.uint64(0x5151_0000_0000_0001)
    _CENTER_STREAM = np.uint64(0xA5A5_0000_0000_0001)
    _NOISE_HALF_WIDTH = 0.15

    def hash_vectors(ids):
        """(n, dim) float32: uniform in [0,1)^dim by default; with
        --clusters=C, center(cluster(id)) + uniform noise — a
        mixture-of-clusters corpus where kmeans shards capture locality
        (the shape real embeddings have)."""
        cols = np.arange(dim, dtype=np.uint64)
        flat = ids.astype(np.uint64)[:, None] * np.uint64(dim) + cols
        x = _splitmix_unit(flat)
        if not clusters:
            return x
        cid = (
            _splitmix_unit(ids.astype(np.uint64) + _CLUSTER_STREAM)
            * float(clusters)
        ).astype(np.uint64)
        centers = _splitmix_unit(
            cid[:, None] * np.uint64(dim) + cols + _CENTER_STREAM
        )
        return (
            centers + (x - 0.5) * (2.0 * _NOISE_HALF_WIDTH)
        ).astype(np.float32)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            x = hash_vectors(ids)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [x[i].tolist() for i in range(len(ids))]}
            )

    eng = AnnEngine(spark, workdir=os.path.join(tmp, "engine"))
    # provenance sidecar: a reused workdir must have been built with the
    # SAME generation/build knobs, or the JSON would echo argv values the
    # artifact was never built with (wrong-provenance measurement)
    build_params = {
        "n": n, "dim": dim, "shards": shards, "sq8": sq8, "pq": pq,
        "pq_m": pq_m, "clusters": clusters,
    }
    params_path = os.path.join(tmp, "build_params.json")
    reused = eng.catalog.exists("big_graph") and os.path.isdir(data_path)
    if reused:
        try:
            with open(params_path) as fh:
                prior = json.load(fh)
        except OSError:
            prior = None
        if prior != build_params:
            raise SystemExit(
                f"workdir {tmp} was built with {prior}, but this run asks "
                f"for {build_params} — pick a fresh --workdir or rerun "
                "with the original flags"
            )
    if not reused:
        (
            spark.range(n)
            .repartition(64)
            .mapInPandas(gen, "vec_id long, embedding array<float>")
            .write.mode("overwrite")
            .parquet(data_path)
        )
    eng.register_table("vectors", data_path, row_id="vec_id")

    t0 = time.time()
    params = {}
    if sq8:
        params = {"quantization": "sq8"}
    elif pq:
        # no --pq-m: the engine's scale-aware default (pq.pq_m_auto) picks
        # the code width from N x dim — the knob the 20M sweep certified
        params = {"quantization": "pq"}
        if pq_m is not None:
            params["pq_m"] = pq_m
    if not reused:
        eng.streaming_build(
            "big_graph", "vectors", "embedding", shards=shards,
            shard_by="kmeans", **params,
        )
        with open(params_path, "w") as fh:
            json.dump(build_params, fh)
    build_wall = round(time.time() - t0, 1)
    effective_pq_m = eng.get_index("big_graph").meta.extra.get("pq_m") if pq else None

    # ground truth: exact brute force, driver-side numpy (this is the
    # oracle, not the operator; N*dim*4 bytes).  Per-CHUNK flatten scattered
    # by vec_id — NEVER Table.sort_by/combine_chunks on the list column:
    # pyarrow 16.1.0's sort/take silently corrupts large list<float>
    # children (element access included), which poisoned the round-5 20M
    # recall numbers with a garbage ground truth (engine was fine; see
    # index/graph._argsorted_labels and ROADMAP round 6).
    import pyarrow.parquet as pq_

    t = pq_.read_table(data_path, columns=["vec_id", "embedding"])
    ids_un = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    x = np.empty((n, dim), dtype=np.float32)
    seen = 0
    pos = 0
    for ch in t.column("embedding").chunks:
        flat = ch.flatten().to_numpy(zero_copy_only=False)
        assert flat.shape[0] == len(ch) * dim and not ch.null_count
        x[ids_un[pos : pos + len(ch)]] = flat.reshape(len(ch), dim)
        seen += len(ch)
        pos += len(ch)
    assert seen == n
    ids = np.arange(n, dtype=np.int64)
    q_ids = np.linspace(0, n - 1, n_queries).astype(int)

    stop = threading.Event()
    rss: dict = {}
    sampler = threading.Thread(target=_worker_rss_sampler, args=(stop, rss), daemon=True)
    sampler.start()

    # exact ground truth once per query, shared by every probe pass
    truths = {}
    for qi in q_ids:
        d = ((x - x[qi]) ** 2).sum(axis=1)
        truths[qi] = set(ids[np.argsort(d, kind="stable")[:k]].tolist())

    def probe_pass(nprobe_shards=None):
        extra = {"nprobe_shards": int(nprobe_shards)} if nprobe_shards else {}
        recalls, walls = [], []
        for qi in q_ids:
            q = x[qi]
            t1 = time.time()
            if pq or sq8:
                got = {
                    r["vec_id"]
                    for r in eng.ann_search(
                        "vectors", "big_graph", q.tolist(), k,
                        oversample=10, rerank=True, **extra,
                    ).collect()
                }
            else:
                got = {
                    r["row_id"]
                    for r in eng.get_index("big_graph")
                    .search(q.tolist(), k, **extra)
                    .collect()
                }
            walls.append(time.time() - t1)
            recalls.append(len(truths[qi] & got) / k)
        return {
            "recall_at_10": round(float(np.mean(recalls)), 3),
            "min_recall_at_10": round(float(np.min(recalls)), 3),
            "mean_probe_sec": round(float(np.mean(walls)), 2),
        }

    full = probe_pass()
    pruned = {}
    for ns in nprobe_sweep:
        if 0 < ns < shards:
            pruned[str(ns)] = probe_pass(ns)
        else:  # 0 / >= shards ARE the full fan-out = the headline pass
            print(
                f"# nprobe_shards={ns} is full fan-out at shards={shards}; "
                "see the headline recall/probe numbers",
                file=sys.stderr,
            )
    stop.set()
    sampler.join(timeout=2)

    print(
        json.dumps(
            {
                "n": n,
                "dim": dim,
                "shards": shards,
                "sq8": sq8,
                "pq": pq,
                "pq_m": effective_pq_m,
                "clusters": clusters,
                "reused_artifact": reused,
                "build_wall_sec": build_wall,
                **full,
                **({"pruned_probe": pruned} if pruned else {}),
                **rss,
            }
        )
    )


if __name__ == "__main__":
    main()
