"""BPE trainer/encoder (pipeline/bpe.py): verified against an
independently written naive reference (re-tokenizes per merge — the
textbook algorithm) plus a hand-computed example; Spark encode surface
checked end-to-end."""

import numpy as np
import pandas as pd
import pytest

from duckdb_annsearch_spark.pipeline import bpe as B


def _naive_bpe(word_freqs: dict, num_merges: int, min_freq: int = 2):
    """Textbook BPE (Sennrich alg. 1), written differently from the
    library: full pair recount each round from a dict corpus."""
    corpus = {tuple(w) + (B.END_OF_WORD,): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, f in corpus.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + f
        if not pairs:
            break
        top = max(pairs.values())
        if top < min_freq:
            break
        pair = min(p for p, f in pairs.items() if f == top)
        merges.append(pair)
        new_corpus = {}
        for syms, f in corpus.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_corpus[tuple(out)] = new_corpus.get(tuple(out), 0) + f
        corpus = new_corpus
    return merges


def test_hand_example():
    # Sennrich-style toy: 'low'x5 'lower'x2 'newest'x6 'widest'x3
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    ref = _naive_bpe(wf, 8)
    # the 'est</w>' suffix family (weight 9) dominates the first merges;
    # freq-9 ties ('e','s')/('s','t')/('t','</w>') break lexicographically
    assert ref[:3] == [("e", "s"), ("es", "t"), ("est", B.END_OF_WORD)]


@pytest.mark.parametrize("seed", [0, 7])
def test_trainer_matches_naive_reference(spark, seed):
    rng = np.random.RandomState(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    texts = [
        " ".join(rng.choice(vocab, rng.randint(3, 12)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = B.train_bpe(df, num_merges=25, min_freq=2)
    wf = {}
    for t in texts:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    ref = _naive_bpe(wf, 25)
    got = list(zip(merges["left"], merges["right"]))
    assert got == ref


def test_encode_reproduces_training_segmentation(spark):
    texts = ["low lower lowest", "new newer newest", "wide widest low"] * 20
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = B.train_bpe(df, num_merges=30, min_freq=2)
    ranks = {
        (l, r): int(k)
        for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
    }
    # applying merges rank-order (training) == lowest-rank-first (serving)
    for word in ("low", "lower", "newest", "widest"):
        syms = tuple(word) + (B.END_OF_WORD,)
        for k in sorted(ranks, key=ranks.get):
            syms = B._merge_word(syms, k)
        assert list(syms) == B._encode_word(word, ranks, {})


def test_spark_encode_surface(spark):
    texts = ["the cat sat", "the cat", "sat sat sat"] * 10
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = B.train_bpe(df, num_merges=20, min_freq=2)
    out = B.bpe_encode(df, merges).collect()
    assert len(out) == len(texts)
    by_id = {r["doc_id"]: r for r in out}
    # fully-merged frequent words: 'sat sat sat' -> 3 whole-word tokens
    assert by_id[2]["n_tokens"] == 3
    assert by_id[2]["tokens"] == ["sat" + B.END_OF_WORD] * 3
    # token sequences reconstruct the text (merges never cross words)
    joined = "".join(by_id[0]["tokens"]).replace(B.END_OF_WORD, " ").strip()
    assert joined == "the cat sat"


def test_unseen_word_falls_back_to_chars(spark):
    df = spark.createDataFrame([(0, "aaa aaa aaa")], "doc_id long, text string")
    merges = B.train_bpe(df, num_merges=5, min_freq=2)
    out = B.bpe_encode(
        spark.createDataFrame([(1, "xyz")], "doc_id long, text string"), merges
    ).collect()[0]
    assert out["tokens"] == ["x", "y", "z", B.END_OF_WORD]


def test_max_words_cap_and_determinism(spark):
    texts = [f"w{i % 50} common" for i in range(500)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    m1 = B.train_bpe(df, num_merges=10, max_words=10)
    m2 = B.train_bpe(df, num_merges=10, max_words=10)
    pd.testing.assert_frame_equal(m1, m2)
    # the cap keeps only top-freq words; 'common' (freq 500) must drive
    # the first merges
    assert (m1["left"][0], m1["right"][0])[0] in set("common") | {"co", "com"}
