"""Pipeline scale demonstration: curation-operator throughput on a
synthetic corpus of N documents (default 1M).

    python tools/pipeline_scale.py [N] [tokens_per_doc]

Generates N ~L-token documents DISTRIBUTEDLY (mapInPandas, deterministic
per id — splitmix64 token draws over a 1000-word vocabulary) with
planted structure the operators must find:
  * every 20th doc is an exact copy of its predecessor,
  * every 17th doc is a near-dup (one token changed),
  * every doc gets a shared boilerplate header line (line_dedup fodder).

Then times one full pass of each curation stage over the parquet corpus:
doc token/quality stats, exact dedup, MinHash+LSH candidate pairs,
line-level dedup, duplicated-n-gram fraction, unigram LM perplexity, and
sequence packing.  Prints ONE JSON line with wall seconds and docs/s per
stage.  The measured table lives in ROADMAP.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    toks_per_doc = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    import numpy as np
    import pandas as pd

    from duckdb_annsearch_spark.session import get_spark

    spark = get_spark("pipeline-scale")
    tmp = tempfile.mkdtemp(prefix="pipeline_scale_")
    path = os.path.join(tmp, "docs.parquet")

    vocab = np.array([f"w{i:04d}" for i in range(1000)])
    L = toks_per_doc

    def splitmix(z):
        z = z + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            # exact dups: doc 20k copies doc 20k-1 (generate from source id)
            src = np.where((ids % 20 == 0) & (ids > 0), ids - 1, ids)
            idx = src.astype(np.uint64)[:, None] * np.uint64(L) + np.arange(
                L, dtype=np.uint64
            )
            words = vocab[(splitmix(idx) % np.uint64(len(vocab))).astype(np.int64)]
            # near-dups: flip token 0 of every 17th doc.  Keyed on SRC so
            # an exact-copy doc inherits its predecessor's flip — keying
            # on ids left ~1/340 of the planted exact dups non-identical
            # (copy generated from the unflipped base while the
            # predecessor shipped flipped)
            flip = (src % 17 == 0) & (src % 20 != 0)
            words[flip, 0] = "zzflip"
            texts = [
                "BOILERPLATE HEADER COMMON TO ALL\n" + " ".join(row)
                for row in words
            ]
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    t0 = time.time()
    (
        spark.range(n)
        .repartition(64)
        .mapInPandas(gen, "doc_id long, text string")
        .write.mode("overwrite")
        .parquet(path)
    )
    gen_wall = round(time.time() - t0, 1)

    from pyspark.sql import functions as F

    from duckdb_annsearch_spark.pipeline.dedup import (
        dup_ngram_stats,
        exact_duplicates,
        lsh_duplicate_pairs,
    )
    from duckdb_annsearch_spark.pipeline.lines import line_dedup
    from duckdb_annsearch_spark.pipeline.lm import lm_perplexity
    from duckdb_annsearch_spark.pipeline.pack import pack_chunks
    from duckdb_annsearch_spark.pipeline.text import (
        bpe_token_count,
        detect_language,
        quality_score,
    )

    docs = spark.read.parquet(path)

    # one shared honest-forcing implementation — a drift between copies
    # would silently reintroduce the pruned-plan measurement bug
    from bench import force_execution

    # optional argv[3]: comma-list restricting which stages run (e.g.
    # "winnow_fingerprints,remove_dup_spans" to extend an existing table
    # without re-paying the full sweep)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    def stage(name, fn):
        if only is not None and name not in only:
            return
        t = time.time()
        rows = force_execution(fn())
        wall = round(time.time() - t, 1)
        out[name] = {
            "wall_sec": wall,
            "rows": rows,
            "docs_per_sec": round(n / wall) if wall > 0 else None,
        }
        print(f"# {name}: {wall}s ({rows} rows)", file=sys.stderr)

    out: dict = {}
    stage(
        "doc_stats",
        lambda: docs.select(
            "doc_id",
            bpe_token_count(F.col("text")).alias("bpe"),
            quality_score(F.col("text")).alias("q"),
            detect_language(F.col("text")).alias("lang"),
        ),
    )
    stage("exact_dedup", lambda: exact_duplicates(docs, "text", "doc_id"))
    stage(
        "lsh_pairs",
        lambda: lsh_duplicate_pairs(docs, "text", "doc_id", max_bucket=200),
    )
    stage("line_dedup", lambda: line_dedup(docs, min_df=2))
    stage("dup_ngram_stats", lambda: dup_ngram_stats(docs, k=8))
    stage("lm_perplexity", lambda: lm_perplexity(docs))
    stage("pack_chunks", lambda: pack_chunks(docs, budget=2048))

    from duckdb_annsearch_spark.pipeline.classify import score_hashed_linear
    from duckdb_annsearch_spark.pipeline.sample import temperature_weights
    from duckdb_annsearch_spark.pipeline.spans import remove_dup_spans
    from duckdb_annsearch_spark.pipeline.winnow import winnow_fingerprints

    stage("winnow_fingerprints", lambda: winnow_fingerprints(docs, k=5, w=4))
    stage("remove_dup_spans", lambda: remove_dup_spans(docs, k=8))

    # cross-corpus dedup with/without the Bloom shuffle guard: ref = every
    # 10th doc, new = the rest — the realistic LOW-overlap crawl shape the
    # guard exists for (only planted copies + the ~fpp sliver pay the
    # join).  NOTE: distinct stage names — a later stage reuses the name
    # "dedup_against" for the 50%-overlap odd-vs-even shape and dict
    # entries are keyed by name (a collision here once read as a result
    # mismatch; it was two different queries sharing a key).
    from duckdb_annsearch_spark.pipeline.dedup import dedup_against

    _ref = docs.where(F.col("doc_id") % 10 == 0)
    _new = docs.where(F.col("doc_id") % 10 != 0)
    stage(
        "xcorpus_dedup_ref10",
        lambda: dedup_against(_new, _ref, max_bucket=200),
    )
    stage(
        "xcorpus_dedup_ref10_bloom",
        lambda: dedup_against(_new, _ref, max_bucket=200, ref_bloom_fpp=0.01),
    )
    _weights = spark.range(1 << 18).select(
        F.col("id").alias("feature"),
        (((F.col("id") * 31 + 7) % 1000 - 500).cast("double") / 1024.0).alias(
            "weight"
        ),
    )
    stage(
        "classifier_score",
        lambda: score_hashed_linear(docs, _weights, n_features=1 << 18),
    )
    # synthetic 5-way stratum stands in for language
    stage(
        "temperature_weights",
        lambda: temperature_weights(
            docs.withColumn("lang", (F.col("doc_id") % 5).cast("string")), 10**9
        ),
    )

    from duckdb_annsearch_spark.pipeline.dedup import dedup_against
    from duckdb_annsearch_spark.pipeline.filters import c4_filter, gopher_filter
    from duckdb_annsearch_spark.pipeline.urls import cap_per_domain, normalize_url
    from duckdb_annsearch_spark.pipeline.vocab import top_vocab

    stage(
        "gopher_filter",
        lambda: gopher_filter(docs, keep_stats=True, min_required_words=0),
    )
    stage("c4_filter", lambda: c4_filter(docs, keep_stats=True))
    # cross-corpus: dedup the odd half against the even half
    stage(
        "dedup_against",
        lambda: dedup_against(
            docs.where("doc_id % 2 = 1"),
            docs.where("doc_id % 2 = 0"),
            max_bucket=200,
        ),
    )
    # synthetic URLs: ~n/50 distinct REGISTERED domains (siteN.com — a
    # shared suffix would collapse them all into one eTLD+1), ~50
    # rows/domain with tracking-param and port noise
    from duckdb_annsearch_spark.pipeline.urls import with_normalized_url

    _urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://WWW.site"),
            (F.col("doc_id") % (n // 50 + 1)).cast("string"),
            F.lit(".com:443/p/"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("?utm_source=x&q="),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    stage("url_normalize", lambda: with_normalized_url(_urls, "url"))
    stage("cap_per_domain", lambda: cap_per_domain(_urls, "url", cap=20))
    stage("top_vocab", lambda: top_vocab(docs, top_n=1000))

    from duckdb_annsearch_spark.pipeline.report import corpus_funnel

    stage(
        "curation_funnel",
        lambda: corpus_funnel(
            docs, langs=None, min_quality=0.3,
            gopher=True,
            gopher_thresholds={"min_words": 20, "min_required_words": 0},
            dedup="exact",
        ),
    )

    print(
        json.dumps(
            {
                "n_docs": n,
                "tokens_per_doc": toks_per_doc,
                "gen_wall_sec": gen_wall,
                "stages": out,
            }
        )
    )


if __name__ == "__main__":
    main()
