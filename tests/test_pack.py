"""Sequence packing: brute-force parity for both forms, partition
invariance of the distributed prefix sum, edge cases."""

import pytest
from pyspark.sql import functions as F

from duckdb_annsearch_spark.pipeline.pack import pack_chunks, pack_greedy

# (doc_id, n_tokens) — includes zero-token and oversize docs
ROWS = [
    (0, 30), (1, 0), (2, 75), (3, 10), (4, 250), (5, 1),
    (6, 99), (7, 100), (8, 2), (9, 0), (10, 55), (11, 44),
]
BUDGET = 100


def _brute_chunks(rows, budget):
    out, cur = {}, 0
    for did, nt in sorted(rows):
        start = cur
        end = start + max(nt - 1, 0)
        out[did] = (
            nt,
            start // budget,
            start % budget,
            nt > 0 and end // budget > start // budget,
        )
        cur += nt
    return out


def _brute_greedy(rows, budget):
    out = {}
    bin_id, fill, started = 0, 0, False
    for did, nt in sorted(rows):
        if started and fill + nt > budget:
            bin_id, fill = bin_id + 1, 0
        started = True
        fill += nt
        out[did] = (nt, bin_id, fill, nt > budget)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "nt"])


@pytest.mark.parametrize("partitions", [1, 3, 16])
def test_chunks_matches_brute_force_any_partitioning(docs, partitions):
    got = {
        r.doc_id: (r.n_tokens, r.chunk_id, r.chunk_offset, r.crosses_boundary)
        for r in pack_chunks(
            docs, BUDGET, token_col="nt", partitions=partitions
        ).collect()
    }
    assert got == _brute_chunks(ROWS, BUDGET)


def test_chunks_from_text(spark):
    """token_col omitted -> BPE-piece proxy of the text column."""
    df = spark.createDataFrame(
        [(0, "hello world"), (1, "a b c d e"), (2, "")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r.n_tokens for r in pack_chunks(df, 4).collect()}
    assert rows[0] == 2 and rows[1] == 5 and rows[2] == 0
    # budget 4: doc0 [0..1] chunk0, doc1 starts at 2, crosses into chunk1
    got = {r.doc_id: (r.chunk_id, r.crosses_boundary)
           for r in pack_chunks(df, 4).collect()}
    assert got[0] == (0, False) and got[1] == (0, True)


def test_greedy_matches_brute_force(docs):
    got = {
        r.doc_id: (r.n_tokens, r.bin_id, r.bin_fill, r.oversize)
        for r in pack_greedy(docs, BUDGET, token_col="nt").collect()
    }
    assert got == _brute_greedy(ROWS, BUDGET)


def test_greedy_streams_pack_independently(spark):
    df = spark.createDataFrame(
        [(0, "en", 60), (1, "en", 60), (2, "de", 60), (3, "de", 60)],
        ["doc_id", "lang", "nt"],
    )
    got = {(r.stream, r.doc_id): r.bin_id
           for r in pack_greedy(df, 100, token_col="nt", stream_col="lang").collect()}
    assert got == {("en", 0): 0, ("en", 1): 1, ("de", 2): 0, ("de", 3): 1}


def test_oversize_gets_own_bin(docs):
    rows = {r.doc_id: r for r in pack_greedy(docs, BUDGET, token_col="nt").collect()}
    assert rows[4].oversize and rows[4].bin_fill == 250
    # nothing shares doc 4's bin
    assert sum(1 for r in rows.values() if r.bin_id == rows[4].bin_id) == 1


def test_validation(docs):
    for fn in (pack_chunks, pack_greedy):
        with pytest.raises(ValueError, match="budget"):
            fn(docs, 0, token_col="nt")


def test_chunk_totals_consistent(docs):
    """Every chunk except the last is exactly full: the max chunk_id equals
    total_tokens div budget (concat-and-chunk leaves no gaps)."""
    out = pack_chunks(docs, BUDGET, token_col="nt").collect()
    total = sum(nt for _, nt in ROWS)
    max_start_chunk = max(r.chunk_id for r in out)
    assert max_start_chunk <= total // BUDGET
    # offsets stay within budget
    assert all(0 <= r.chunk_offset < BUDGET for r in out)


def test_null_text_counts_zero_tokens(spark):
    """NULL text contributes 0 tokens — it must not shift the cursor."""
    df = spark.createDataFrame(
        [(0, "a b c"), (1, None), (2, "d e")], ["doc_id", "text"]
    )
    got = {r.doc_id: (r.n_tokens, r.chunk_id, r.chunk_offset)
           for r in pack_chunks(df, 4).collect()}
    assert got == {0: (3, 0, 0), 1: (0, 0, 3), 2: (2, 0, 3)}


def test_greedy_string_ids_preserved(spark):
    """String ids keep their type/name and define the visit order."""
    df = spark.createDataFrame(
        [("b", 3), ("a", 3), ("c", 3)], ["name", "nt"]
    )
    got = {r.name: r.bin_id
           for r in pack_greedy(df, 4, id_col="name", token_col="nt").collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def _brute_chunk_docs(text, window, stride):
    toks = text.strip().split()
    if not toks:
        return []
    out, i, idx = [], 0, 0
    n = len(toks)
    import math
    n_chunks = math.ceil(max(n - window, 0) / stride) + 1
    for idx in range(n_chunks):
        s = idx * stride
        out.append((idx, " ".join(toks[s:s + window]), min(window, n - s)))
    return out


def test_chunk_documents_brute_force(spark):
    from duckdb_annsearch_spark.pipeline.pack import chunk_documents

    texts = {
        0: " ".join(f"W{i}" for i in range(300)),   # overlapping chunks
        1: "one two three",                           # single short chunk
        2: " ".join(f"x{i}" for i in range(256)),    # exactly one window
        3: "",                                        # no chunks
        4: None,                                      # no chunks
        5: "   ",                                     # whitespace only
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = {}
    for r in chunk_documents(df, window=256, stride=128).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text, r.n_tokens))
    for d in got:
        got[d].sort()
    exp = {d: _brute_chunk_docs(t, 256, 128) for d, t in texts.items()
           if t and t.strip()}
    assert got == exp
    # original case preserved, overlap real
    assert got[0][1][1].startswith("W128 ")


def test_chunk_documents_validation_and_plan(spark):
    from duckdb_annsearch_spark.pipeline.pack import chunk_documents

    df = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    import pytest as _p
    with _p.raises(ValueError, match="window"):
        chunk_documents(df, window=0)
    with _p.raises(ValueError, match="stride"):
        chunk_documents(df, window=4, stride=5)
    plan = chunk_documents(df, window=4)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: no shuffle at all


def test_chunk_documents_whitespace_robust(spark):
    """Trailing newline / tabs / whitespace-only text: no phantom tokens,
    no spurious chunks (review-pass regression)."""
    from duckdb_annsearch_spark.pipeline.pack import chunk_documents

    df = spark.createDataFrame(
        [(0, "a b\n"), (1, "\n"), (2, "\tx y"), (3, "a  b")],
        "doc_id long, text string",
    )
    got = {}
    for r in chunk_documents(df, window=2, stride=1).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text, r.n_tokens))
    assert got == {
        0: [(0, "a b", 2)],
        2: [(0, "x y", 2)],
        3: [(0, "a b", 2)],
    }  # doc 1 (whitespace-only) emits nothing
