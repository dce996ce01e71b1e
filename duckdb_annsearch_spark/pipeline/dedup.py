"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design: every operator is shuffle-bounded by its keys —
* exact: one groupBy on the content hash (map-side partial agg);
* MinHash/LSH: signatures are per-row expressions (no shuffle), candidate
  pairs come from a self-join on (band, band_hash) buckets — the classic
  shingle→minhash→band→bucket-join pipeline, never all-pairs;
* SimHash: per-row expression;
* n-gram Jaccard: self-join on shared shingles (posting-list join), so cost
  is Σ_shingle df², not n²;
* embedding near-dup: exact all-pairs only for small/broadcastable sides,
  with a random-hyperplane LSH bucket variant as the scale path.

Determinism contract: md5-based hashing (reproducible in the DuckDB oracle),
integer arithmetic mod 2^31-1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duckdb_annsearch_spark.operators.fts import tokenize
from duckdb_annsearch_spark.pipeline.text import HASH_MOD, token_hash

DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 4


def _minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) per hash function (fixed seed)."""
    import random

    rng = random.Random(42)
    return [
        (rng.randrange(1, HASH_MOD), rng.randrange(0, HASH_MOD))
        for _ in range(num_hashes)
    ]


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-grams joined by single spaces."""
    toks = tokenize(text)
    n = F.size(toks)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array())
    return F.array_distinct(grams)


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(content_hash, dup_count, doc_ids) for texts appearing more than once."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.count("*").alias("dup_count"),
            F.sort_array(F.collect_list(F.col(id_col))).alias("doc_ids"),
        )
        .where(F.col("dup_count") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per distinct text (the actual dedup filter)."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col).asc())
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_k: int = 3,
) -> DataFrame:
    """(doc_id, minhash ARRAY<BIGINT>[num_hashes]).

    ``sig_i = min over shingles s of (a_i * h(s) + b_i) mod (2^31-1)``;
    empty-shingle docs get sig_i = 2^31-1 sentinel. Pure per-row expression —
    map-only, no shuffle."""
    params = _minhash_params(num_hashes)
    sh = word_shingles(F.col(text_col), shingle_k)
    hashes = F.transform(sh, lambda s: token_hash(s) % HASH_MOD)
    sig = F.array(
        *[
            F.coalesce(
                F.array_min(
                    F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % HASH_MOD)
                ),
                F.lit(HASH_MOD),
            ).cast("long")
            for a, b in params
        ]
    )
    return df.select(F.col(id_col).alias("doc_id"), sig.alias("minhash"))


def lsh_duplicate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = 3,
) -> DataFrame:
    """(doc_a, doc_b) candidate near-duplicate pairs: docs sharing at least
    one LSH band. Band hash join — shuffle keyed on (band, values), never
    all-pairs."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ",",
                        *[
                            F.col("minhash")[i].cast("string")
                            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """(doc_id, simhash BIGINT): sign of per-bit weighted token-hash sums.

    32-bit by default so every intermediate stays in exact BIGINT range in
    both Spark and the SQL oracle."""
    hashes = F.transform(tokenize(F.col(text_col)), lambda t: token_hash(t) % HASH_MOD)
    bit_sum = lambda b: F.aggregate(  # noqa: E731
        hashes,
        F.lit(0),
        lambda acc, h: acc
        + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
    )
    value = F.aggregate(
        F.array(
            *[
                F.when(bit_sum(b) > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
                for b in range(bits)
            ]
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(F.col(id_col).alias("doc_id"), value.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    shingle_k: int = 3,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with shingle-set Jaccard >=
    threshold. Posting-list self-join: cost Σ_shingle df², not n²."""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), shingle_k).alias("sh"),
    )
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    exploded = sh.select("doc_id", F.explode("sh").alias("shingle"))
    a, b = exploded.alias("a"), exploded.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _cos_double(a: Column, b: Column) -> Column:
    """Cosine similarity in double with deterministic left-fold order —
    reproducible by the DuckDB oracle's list_* fold."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(bd, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """(id_a, id_b, cos) exact all-pairs above a cosine threshold.

    Broadcast the (small or pre-bucketed) side; for 100 TB inputs run
    :func:`embedding_neardup_pairs_lsh` first and feed each bucket here."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    cos = F.round(_cos_double(F.col("va"), F.col("vb")), 6)
    return (
        pairs.withColumn("cos", cos)
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def embedding_neardup_pairs_lsh(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int = 16,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Scale path: random-hyperplane signature -> bucket join -> exact cosine
    verify within buckets. Recall < 1 (tunable via n_planes); each bucket
    join is an equi-join shuffle, never all-pairs."""
    import numpy as np

    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim).astype("float32")
    sig = F.concat_ws(
        "",
        *[
            F.when(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.array(*[F.lit(float(x)) for x in planes[p]]),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda s, x: s + x,
                )
                >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for p in range(n_planes)
        ],
    )
    tagged = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"), sig.alias("bucket"))
    a = tagged.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = tagged.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    pairs = a.join(b, ["bucket"]).where(F.col("id_a") < F.col("id_b"))
    cos = F.round(_cos_double(F.col("va"), F.col("vb")), 6)
    return (
        pairs.withColumn("cos", cos)
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
        .distinct()
    )
