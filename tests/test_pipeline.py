"""Pipeline operators: dedup, text analysis, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from duckdb_annsearch_spark.pipeline import dedup as D
from duckdb_annsearch_spark.pipeline import text as X
from duckdb_annsearch_spark.pipeline import multimodal as M


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup
        (4, "completely different content about spark engines"),
        (5, "el gato y el perro en la casa de los abuelos"),
        (6, "numbers 123 456 789 and punctuation !!! ??? ..."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    out = D.exact_duplicates(docs, "text", "doc_id").collect()
    assert len(out) == 1
    assert out[0]["doc_ids"] == [1, 2] and out[0]["dup_count"] == 2
    kept = D.dedup_exact(docs, "text", "doc_id").select("doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 3, 4, 5, 6]


def test_minhash_identical_docs_identical_sigs(docs):
    sigs = {r["doc_id"]: r["minhash"] for r in D.minhash_signatures(docs, "text", "doc_id").collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]
    assert len(sigs[1]) == D.DEFAULT_NUM_HASHES


def test_lsh_pairs_find_dups(docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in D.lsh_duplicate_pairs(docs, "text", "doc_id").collect()}
    assert (1, 2) in pairs  # identical docs always collide in every band
    assert (1, 4) not in pairs and (4, 5) not in pairs


def test_simhash_near_dups_close(docs):
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash(docs, "text", "doc_id").collect()}
    assert sh[1] == sh[2]
    ham = bin(sh[1] ^ sh[3]).count("1")
    ham_far = bin(sh[1] ^ sh[4]).count("1")
    assert ham < ham_far


def test_ngram_jaccard_pairs(docs):
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
           D.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5).collect()}
    assert out[(1, 2)] == 1.0
    assert (1, 3) in out  # near dup above 0.5
    assert (1, 4) not in out


def test_lsh_max_bucket_drops_degenerate_buckets(spark):
    # four identical docs collide in every band (bucket size 4 per band);
    # one distinct pair remains pairable. max_bucket=3 drops the identical
    # cluster's buckets entirely, max_bucket=None keeps all 6 pairs.
    rows = [(i, "same text for every document here") for i in range(1, 5)] + [
        (5, "a genuinely different sentence about engines"),
        (6, "a genuinely different sentence about engines"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in D.lsh_duplicate_pairs(docs, "text", "doc_id", max_bucket=3).collect()
    }
    assert capped == {(5, 6)}
    full = {
        (r["doc_a"], r["doc_b"])
        for r in D.lsh_duplicate_pairs(docs, "text", "doc_id").collect()
    }
    assert {(1, 2), (3, 4), (5, 6)} <= full


def test_ngram_jaccard_max_df_caps_hot_shingles(spark):
    # every doc shares the "common common common" boilerplate shingle; with
    # max_df set below the corpus size it leaves the universe and only the
    # discriminative tail decides the pairs
    rows = [
        (1, "common common common alpha beta gamma delta"),
        (2, "common common common alpha beta gamma delta"),
        (3, "common common common zz yy xx ww"),
        (4, "common common common qq rr ss tt"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.9, max_df=2
        ).collect()
    }
    # 1-2 still identical over the remaining shingles; 3/4 share nothing
    # but the dropped boilerplate so no pair survives
    assert out[(1, 2)] == 1.0
    assert all(p == (1, 2) for p in out)
    # default (no cap) keeps full-universe jaccard: 3 and 4 now share the
    # boilerplate shingles and rise above 0, but stay below the threshold
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.01).collect()
    }
    assert (3, 4) in full and full[(3, 4)] < 0.9


def test_bpe_token_count(spark):
    rows = [
        (1, "Hello, world!"),        # 'hello' ',' ' world' '!' -> 4
        (2, "don't stop"),           # 'don' ''t' ' stop' -> 3
        (3, "abc123 x"),             # 'abc' '123' ' x' -> 3
        (4, ""),                     # -> 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n"] for r in
           df.select("doc_id", X.bpe_token_count(F.col("text")).alias("n")).collect()}
    assert got == {1: 4, 2: 3, 3: 3, 4: 0}


def test_duplicate_clusters_transitive(spark):
    # chain 1-2-3 (1 and 3 never paired directly) must still collapse to
    # one cluster rooted at the min id; 4-5 separate; 6 singleton
    ids = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster"]
        for r in D.duplicate_clusters(ids, pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_dedup_fuzzy_end_to_end(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),   # = 1
        (3, "the quick brown fox jumps over the lazy dog at night"),  # ~ 1/2
        (4, "completely different content about spark engines"),
        (5, "completely different content about spark engines"),      # = 4
        (6, "a unique document with no duplicates anywhere"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["cluster"], r["keep"]) for r in
           D.dedup_fuzzy(docs, "text", "doc_id", threshold=0.5).collect()}
    assert len(out) == 6  # every row accounted for
    assert out[1] == (1, True) and out[2] == (1, False) and out[3] == (1, False)
    assert out[4] == (4, True) and out[5] == (4, False)
    assert out[6] == (6, True)


def test_dedup_fuzzy_max_bucket_identical_cluster(spark):
    # identical texts collide in every band; with max_bucket below the
    # cluster size the LSH stage alone finds no pairs — the exact-dup
    # pre-pass must still collapse them
    rows = [(i, "same text for every document here really") for i in range(1, 6)] + [
        (6, "one genuinely different document about engines"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["cluster"], r["keep"]) for r in
           D.dedup_fuzzy(docs, "text", "doc_id", threshold=0.5, max_bucket=3).collect()}
    assert len(out) == 6
    assert out[1] == (1, True)
    assert all(out[i] == (1, False) for i in (2, 3, 4, 5))
    assert out[6] == (6, True)


def test_null_texts_are_not_duplicates(spark):
    rows = [(1, None), (2, None), (3, "real text here"), (4, "real text here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in D.dedup_exact(docs, "text", "doc_id").collect())
    assert kept == [1, 2, 3]  # NULLs both survive; 4 is the true dup
    groups = D.exact_duplicates(docs, "text", "doc_id").collect()
    assert len(groups) == 1 and groups[0]["doc_ids"] == [3, 4]
    out = {r["doc_id"]: r["keep"] for r in
           D.dedup_fuzzy(docs, "text", "doc_id", threshold=0.5).collect()}
    assert len(out) == 4  # NULL rows not silently dropped
    assert out[1] and out[2] and out[3] and not out[4]


def test_simhash_pairs_param_guard(docs):
    with pytest.raises(ValueError, match="pigeonhole"):
        D.simhash_hamming_pairs(docs, "text", "doc_id", max_hamming=4, bands=4)


def test_zero_vectors_not_near_dups(spark):
    rows = [(1, [0.0, 0.0, 0.0]), (2, [0.0, 0.0, 0.0]), (3, [1.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # NaN cosine (0/0) must not satisfy `cos >= t` via Spark's NaN-is-largest
    pairs = D.embedding_neardup_pairs_lsh(df, "embedding", "vec_id", 0.9, n_planes=4)
    assert pairs.count() == 0
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert D.embedding_neardup_pairs_lsh(empty, "embedding", "vec_id", 0.9).count() == 0


def test_embedding_neardup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r["id_a"], r["id_b"]) for r in
             D.embedding_neardup_pairs(df, "embedding", "vec_id", 0.99).collect()}
    assert exact == {(1, 2)}
    lsh = {(r["id_a"], r["id_b"]) for r in
           D.embedding_neardup_pairs_lsh(df, "embedding", "vec_id", 0.99, n_planes=8).collect()}
    assert lsh == {(1, 2)}  # identical-direction vectors share every plane sign
    # above max_exact_rows the exact API must auto-route to the LSH scale
    # path (no driver-side collect of all vectors)
    routed = {(r["id_a"], r["id_b"]) for r in
              D.embedding_neardup_pairs(df, "embedding", "vec_id", 0.99,
                                        max_exact_rows=1, n_planes=8).collect()}
    assert routed == {(1, 2)}


def test_text_analysis(docs):
    out = {r["doc_id"]: r for r in docs.select(
        "doc_id",
        X.token_count(F.col("text")).alias("n_tok"),
        X.detect_language(F.col("text")).alias("lang"),
        X.quality_score(F.col("text")).alias("q"),
        X.doc_fingerprint(F.col("text")).alias("fp"),
    ).collect()}
    assert out[1]["n_tok"] == 9
    assert out[1]["lang"] == "en"
    assert out[5]["lang"] == "es"
    assert 0.0 <= out[1]["q"] <= 1.0
    assert out[1]["fp"] == out[2]["fp"] and out[1]["fp"] != out[3]["fp"]
    # fingerprint is order-sensitive
    rev = docs.where("doc_id = 1").select(
        X.doc_fingerprint(F.lit("dog lazy the over jumps fox brown quick the")).alias("fp")
    ).first()["fp"]
    assert rev != out[1]["fp"]


def test_multimodal_plumbing(spark):
    rows = [
        (1, "image", b"\x89PNGfake", {"w": "640"}),
        (2, "audio", b"RIFFfake", {"sr": "16000"}),
        (3, "image", None, None),
    ]
    media = M.make_media_df(spark, rows)
    feats = M.extract_features(media).collect()
    assert {r["media_id"] for r in feats} == {1, 2, 3}
    assert all(len(r["feature"]) == M.FEATURE_DIM for r in feats)
    # deterministic fake: same payload -> same features
    again = M.extract_features(media).collect()
    assert sorted(map(tuple, (r["feature"] for r in feats))) == sorted(
        map(tuple, (r["feature"] for r in again))
    )
    resized = M.resize_images(media, 224, 224).collect()
    assert all((r["meta"] or {}).get("resized") == "224x224" for r in resized)
    frames = M.sample_frames(media, every_n=10).collect()
    assert len(frames) == 9
    assert {r["frame_idx"] for r in frames} == {0, 10, 20}


def test_knn_join_operator(spark):
    from duckdb_annsearch_spark.operators.knn import knn_join

    left = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [5.0, 5.0])], "lid long, v array<float>"
    )
    right = spark.createDataFrame(
        [(10, [0.1, 0.0]), (11, [4.9, 5.0]), (12, [9.0, 9.0])],
        "rid long, w array<float>",
    )
    got = knn_join(left, right, "lid", "v", "rid", "w", k=1).collect()
    by = {r["lid"]: r["rid"] for r in got}
    assert by == {1: 10, 2: 11}


def test_prepare_corpus_exact(spark):
    from duckdb_annsearch_spark.pipeline.corpus import prepare_corpus

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and that is fine"),
        (2, "the quick brown fox jumps over the lazy dog and that is fine"),  # dup
        (3, "el rapido zorro de la casa y los perros en el jardin grande"),   # es
        (4, "zz"),                                                            # low quality
        (5, "the data for the model is that good and the text is clean for training"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_corpus(df, dedup="exact")
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 5]
    assert set(out.columns) >= {"doc_id", "text", "lang", "quality"}


def test_prepare_corpus_near(spark):
    from duckdb_annsearch_spark.pipeline.corpus import prepare_corpus

    base = "the quick brown fox jumps over the lazy dog while the sun shines on the hill"
    rows = [
        (1, base),
        (2, base + " today"),  # near-dup of 1
        (3, "the completely different text talks about the spark engine and the cluster for training data"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_corpus(df, dedup="near", jaccard_threshold=0.5)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 3]


def test_prepare_corpus_fuzzy_transitive(spark):
    from duckdb_annsearch_spark.pipeline.corpus import prepare_corpus

    base = "the quick brown fox jumps over the lazy dog while the sun shines on the hill"
    rows = [
        (1, base),
        (2, base + " today"),            # ~ 1
        (3, base + " today and forever"),  # ~ 2, farther from 1 (chain)
        (4, "the completely different text talks about the spark engine and the cluster for training data"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_corpus(df, dedup="fuzzy", jaccard_threshold=0.5)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 4]  # whole 1-2-3 chain collapses to its min id


def test_simhash_hamming_pairs(docs):
    from duckdb_annsearch_spark.pipeline.dedup import simhash_hamming_pairs

    got = simhash_hamming_pairs(docs, "text", "doc_id", max_hamming=3).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    # identical texts (docs 1 and 2 in the fixture) have hamming 0
    assert (1, 2) in pairs
    assert all(r["hamming"] <= 3 for r in got)


def test_duplicate_clusters_driver_fastpath_matches_distributed(spark):
    from duckdb_annsearch_spark.pipeline.dedup import duplicate_clusters

    ids = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    # chains, a triangle, singletons: A~B~C transitivity must hold; pairs
    # touching ids OUTSIDE the id table (100, 101) must not link anything —
    # the distributed loop only propagates through labeled nodes and the
    # fast path must match
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (12, 11), (20, 21), (21, 22), (20, 22),
         (5, 100), (100, 6), (101, 7)],
        "doc_a long, doc_b long",
    )
    fast = {
        (r["doc_id"], r["cluster"])
        for r in duplicate_clusters(ids, pairs).collect()
    }
    dist = {
        (r["doc_id"], r["cluster"])
        for r in duplicate_clusters(ids, pairs, max_driver_edges=None).collect()
    }
    assert fast == dist
    by_id = dict(fast)
    assert by_id[4] == 1 and by_id[12] == 10 and by_id[22] == 20
    assert by_id[30] == 30  # singleton keeps its own id
    # 5 and 6 are linked only through 100, which is not in ids: no merge
    assert by_id[5] == 5 and by_id[6] == 6 and by_id[7] == 7


def test_prepare_corpus_hygiene_stages(spark):
    """scrub + repetition cap + decontamination compose with the filter/
    dedup stages; scrubbing runs FIRST so PII-only-differing copies
    dedup as equals."""
    from duckdb_annsearch_spark.pipeline.corpus import prepare_corpus

    rows = [
        (1, "the quick brown fox jumps over the lazy dog write to a@x.com now"),
        (2, "the quick brown fox jumps over the lazy dog write to b@y.org now"),  # PII twin
        (3, "the spam the spam the spam the spam the spam the spam the spam"),    # repetition
        (4, "the data for the model is that good and the text is clean for training"),
        (5, "the held out benchmark sentence that must never be in the training set at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([rows[4]], "doc_id long, text string")
    out = prepare_corpus(
        df,
        dedup="exact",
        scrub=True,
        max_dup_token_frac=0.6,
        benchmark=bench,
    ).collect()
    ids = sorted(r["doc_id"] for r in out)
    # 2 dedups against 1 (identical after scrub), 3 is repetition spam,
    # 5 is contaminated; 1 and 4 survive
    assert ids == [1, 4]
    texts = {r["doc_id"]: r["text"] for r in out}
    assert "<EMAIL>" in texts[1] and "a@x.com" not in texts[1]


# ------------------------------------------------------ semantic dedup


def _semdedup_vectors(spark, n=200, dim=16, seed=3):
    """Random unit-ish vectors plus planted duplicates: ids >= 1000 are
    exact copies of id-1000, ids >= 2000 are near-copies (tiny noise)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    base = rng.randn(n, dim).astype(np.float64)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    for i in range(5):
        rows.append((1000 + i, [float(x) for x in base[i]]))  # exact dup
        # noise large enough that the cosine rounds BELOW 1.0 at the
        # contract's 6 decimals (~0.9988) yet far above the 0.95 eps
        noisy = base[10 + i] + rng.randn(dim) * 5e-2
        rows.append((2000 + i, [float(x) for x in noisy]))  # near dup
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_drops_planted_duplicates(spark):
    df = _semdedup_vectors(spark)
    out = {
        r["vec_id"]: r["keep"]
        for r in D.semantic_dedup(
            df, "embedding", "vec_id", eps=0.95, n_clusters=8, seed=1
        ).collect()
    }
    assert len(out) == 210
    for i in range(5):
        assert out[1000 + i] is False  # exact copy: smaller-id twin wins
        assert out[2000 + i] is False  # near copy
        assert out[i] is True and out[10 + i] is True


def test_semantic_dedup_clustered_equals_global_on_co_clustered_dups(spark):
    """Planted dups are (near-)identical, so they must co-cluster; the
    clustered answer then equals the n_clusters=1 exact answer."""
    df = _semdedup_vectors(spark)
    exact = {
        (r["vec_id"], r["keep"])
        for r in D.semantic_dedup(
            df, "embedding", "vec_id", eps=0.95, n_clusters=1
        ).collect()
    }
    clustered = {
        (r["vec_id"], r["keep"])
        for r in D.semantic_dedup(
            df, "embedding", "vec_id", eps=0.95, n_clusters=8, seed=1
        ).collect()
    }
    assert clustered == exact


def test_semantic_dedup_eps_one_drops_only_exact_copies(spark):
    df = _semdedup_vectors(spark)
    out = {
        r["vec_id"]: r["keep"]
        for r in D.semantic_dedup(
            df, "embedding", "vec_id", eps=1.0, n_clusters=1
        ).collect()
    }
    dropped = {k for k, v in out.items() if not v}
    assert dropped == {1000 + i for i in range(5)}


def test_semantic_dedup_guards(spark):
    df = _semdedup_vectors(spark)
    with pytest.raises(ValueError, match="eps"):
        D.semantic_dedup(df, "embedding", "vec_id", eps=0.0)
    with pytest.raises(RuntimeError, match="max_cluster_rows"):
        D.semantic_dedup(
            df, "embedding", "vec_id", n_clusters=2, max_cluster_rows=10
        )


def test_semantic_dedup_sparse_ids(spark):
    """Non-dense ids: the training sample is hash-positional, not an
    id-value stride (odd-only ids used to produce an empty sample), and
    the executor closure needs no package shipping (engine-free usage)."""
    df = _semdedup_vectors(spark).selectExpr(
        "vec_id * 2 + 1 as vec_id", "embedding"
    )
    out = {
        r["vec_id"]: r["keep"]
        for r in D.semantic_dedup(
            df, "embedding", "vec_id", eps=0.95, n_clusters=4, sample_rows=50
        ).collect()
    }
    assert len(out) == 210
    assert all(out[2 * (1000 + i) + 1] is False for i in range(5))


def test_prepare_corpus_round5_stages(spark):
    """boilerplate_min_df strips the shared banner BEFORE quality/dedup,
    max_dup_ngram_frac drops the templated doc, max_avg_nll drops the
    gibberish-rare doc; the ordinary doc survives all three."""
    from duckdb_annsearch_spark.pipeline.corpus import prepare_corpus

    banner = "the shared banner line is here"
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, banner + "\n" + shared + " unique words for document zero only right here"),
        (1, banner + "\ntotally different content for document one with its own words"),
        (2, banner + "\n" + shared),  # template: every 4-gram also in doc 0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = prepare_corpus(
        df,
        langs=(),
        min_quality=0.0,
        dedup="none",
        boilerplate_min_df=2,
        max_dup_ngram_frac=0.8,
        dup_ngram_k=4,
    )
    got = {r.doc_id: r.text for r in out.collect()}
    # the banner line is gone from every surviving doc
    assert got and all(banner not in t for t in got.values())
    # doc 2 is entirely covered by doc 0's grams -> dup_frac 1.0 -> dropped;
    # doc 0 shares only its prefix (dup_frac ~0.38) and doc 1 nothing
    assert sorted(got) == [0, 1]

    # perplexity filter: a rare-token doc scores worse than common text
    rows2 = [
        (0, ("the and of to in is " * 20).strip()),
        (1, "zzq xxv qqj wvx kkz jjq pqz vvk"),
    ]
    df2 = spark.createDataFrame(rows2, ["doc_id", "text"])
    from duckdb_annsearch_spark.pipeline.lm import lm_perplexity

    nll = {r.doc_id: r.avg_nll for r in lm_perplexity(df2).collect()}
    cut = (nll[0] + nll[1]) / 2
    out2 = prepare_corpus(
        df2, langs=(), min_quality=0.0, dedup="none", max_avg_nll=cut
    )
    assert [r.doc_id for r in out2.collect()] == [0]
