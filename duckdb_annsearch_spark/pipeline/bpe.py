"""BPE tokenizer training + encoding over a document corpus.

The Sennrich et al. (arXiv:1508.07909) byte-pair-encoding trainer in its
scalable production shape (subword-nmt / HuggingFace tokenizers train the
same way): ONE distributed pass reduces the corpus to a word-frequency
table (vocabulary-sized, not corpus-sized — a 100 TB corpus has millions
of distinct words, not trillions), then the merge loop iterates
driver-side over that table.  Re-tokenizing the corpus per merge — the
naive reading of the algorithm — would be ``num_merges`` full corpus
passes; iterating on word frequencies is mathematically identical because
BPE never merges across word boundaries.

Serving (``bpe_encode`` / ``bpe_token_count_learned``) broadcasts the
merge ranks and applies the standard lowest-rank-first merge loop in an
Arrow-batched ``mapInPandas`` with a per-worker word cache (text token
distributions are Zipfian — the cache hit rate is the corpus's
type/token ratio).

No DuckDB oracle for the trainer: the merge loop is inherently iterative
(the driver contract documents rows-only checks for iterative
algorithms); correctness is pinned by pytest against an independently
written naive reference implementation and a hand-computed example.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# GPT-2-style pretokenizer shape shared with text.bpe_token_count: words
# (with a leading-space convention folded away by lowercase+split),
# numbers, punctuation runs
WORD_SPLIT_RE = r"[^\p{L}\p{N}]+"
END_OF_WORD = "</w>"
DEFAULT_MAX_WORDS = 1_000_000


def word_frequencies(
    df: DataFrame, text_col: str = "text", max_words: int = DEFAULT_MAX_WORDS
) -> DataFrame:
    """(word, freq) — the ONE distributed pass of BPE training: lowercase,
    split on non-alphanumerics, explode, partial-aggregating groupBy.
    ``max_words`` caps the table at the top-frequency words (ties broken
    by word for determinism): Zipf's law puts the dropped tail's pair
    mass in the noise, and the cap bounds driver memory no matter the
    corpus size."""
    counts = (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), WORD_SPLIT_RE)
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return counts.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(
        int(max_words)
    )


def _pair_counts(word_syms: list[tuple], freqs: list[int]) -> dict:
    pairs: dict = {}
    for syms, f in zip(word_syms, freqs):
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + f
    return pairs


def _merge_word(syms: tuple, pair: tuple) -> tuple:
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 1000,
    min_freq: int = 2,
    max_words: int = DEFAULT_MAX_WORDS,
) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merge rules; returns a pandas DataFrame
    ``(rank int, left str, right str)`` ordered by rank (the artifact is
    merge-count-sized — tiny — so pandas is the honest return type; write
    it wherever the tokenizer config lives).

    Words initialize as character sequences with a terminal ``</w>``
    (Sennrich §3.2) so merges learn word-final units distinctly.  Each
    iteration merges the highest-frequency adjacent pair, ties broken
    lexicographically for cross-run determinism, stopping early when the
    best pair's frequency drops below ``min_freq``."""
    wf = word_frequencies(df, text_col, max_words).collect()
    word_syms = [tuple(r["word"]) + (END_OF_WORD,) for r in wf]
    freqs = [int(r["freq"]) for r in wf]

    merges: list[tuple] = []
    for _rank in range(int(num_merges)):
        pairs = _pair_counts(word_syms, freqs)
        if not pairs:
            break
        # deterministic argmax: max freq, ties to the lexicographically
        # smallest pair — cross-run/cross-partition determinism
        top_f = max(pairs.values())
        if top_f < int(min_freq):
            break
        best_pair = min(p for p, f in pairs.items() if f == top_f)
        merges.append(best_pair)
        word_syms = [
            _merge_word(s, best_pair) if best_pair[0] in s else s
            for s in word_syms
        ]
    return pd.DataFrame(
        {
            "rank": range(len(merges)),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
        }
    )


def _encode_word(word: str, ranks: dict, cache: dict) -> list[str]:
    """Standard BPE encode of one word: repeatedly merge the adjacent pair
    with the LOWEST learned rank until none applies."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    if len(cache) < 200_000:  # bound worker memory; Zipf makes this ample
        cache[word] = syms
    return syms


def bpe_encode(
    df: DataFrame,
    merges: pd.DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, tokens array<string>, n_tokens int): the learned
    tokenizer applied corpus-wide.  Merge ranks ride the task closure
    (merge-table-sized); per-worker word cache exploits the Zipfian
    type/token ratio so most words encode via one dict hit."""
    import re

    ranks = {
        (str(l), str(r)): int(k)
        for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
    }
    # [\W_]+ mirrors the trainer's Java-regex [^\p{L}\p{N}]+ word split
    # (underscore is a separator in both; \w alone would keep it)
    splitter = re.compile(r"[\W_]+", re.UNICODE)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            toks_col, n_col = [], []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in splitter.split((text or "").lower()):
                    if w:
                        toks.extend(_encode_word(w, ranks, cache))
                toks_col.append(toks)
                n_col.append(len(toks))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "tokens": toks_col, "n_tokens": n_col}
            )

    return df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, tokens array<string>, n_tokens int"
    )
