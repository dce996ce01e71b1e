"""Merge-loop scale curve for the incremental BPE trainer.

Feeds ``_train_from_freqs`` a synthetic Zipfian word-frequency table
(the shape ``word_frequencies`` produces at the 1M-word cap) and times
production merge counts.  The round-7 full-recount loop was
O(num_merges x total-symbols) — hours at 32k merges; the incremental
loop (pair->word posting index + lazy max-heap argmax) should clear
32k merges in minutes.

Usage: python tools/bpe_scale.py [n_words] [merge counts...]
"""

import random
import string
import sys
import time

sys.path.insert(0, ".")

from duckdb_annsearch_spark.pipeline.bpe import _train_from_freqs  # noqa: E402


def synth_vocab(n_words: int, seed: int = 7):
    """Zipf-ish (freq ~ 1/rank) vocabulary of plausible word shapes:
    lengths 2-14, characters skewed toward common letters so learned
    merges have realistic pair-frequency mass."""
    rng = random.Random(seed)
    letters = "etaoinshrdlcumwfgypbvk" + string.ascii_lowercase
    words, seen = [], set()
    while len(words) < n_words:
        w = "".join(
            rng.choice(letters) for _ in range(rng.randint(2, 14))
        )
        if w not in seen:
            seen.add(w)
            words.append(w)
    freqs = [max(1, int(2_000_000_000 / (r + 1))) for r in range(n_words)]
    return words, freqs


def main():
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    merge_counts = (
        [int(x) for x in sys.argv[2:]] if len(sys.argv) > 2 else [1000, 8000, 32000]
    )
    t0 = time.time()
    words, freqs = synth_vocab(n_words)
    print(f"vocab: {n_words} words synthesized in {time.time()-t0:.1f}s")
    for nm in merge_counts:
        t0 = time.time()
        merges = _train_from_freqs(list(words), list(freqs), nm, min_freq=2)
        dt = time.time() - t0
        print(
            f"num_merges={nm}: {len(merges)} merges learned in {dt:.1f}s "
            f"({len(merges)/dt:.0f} merges/s)"
        )


if __name__ == "__main__":
    main()
