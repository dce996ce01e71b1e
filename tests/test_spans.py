"""Duplicated-span removal (pipeline/spans.py) — brute-force parity vs a
pure-Python k-gram reference, corpus vs cross_doc scope, normalize mode,
NULL/short/fully-duplicated edges, and the text-never-shuffled plan
property."""

import re

import pytest
from pyspark.sql import functions as F

from duckdb_annsearch_spark.pipeline.spans import dup_span_starts, remove_dup_spans


def _toks(text):
    return [t for t in re.split(r"\s+", text) if t]


def _ref_remove(texts, k, scope="corpus", normalize=False):
    """texts: {id: text} -> {id: (kept_text, n_tokens, n_removed)}"""
    from collections import defaultdict

    occ = defaultdict(list)  # gram -> [doc ids]
    grams = {}
    for d, t in texts.items():
        if t is None:
            continue
        ts = _toks(t)
        gs = [" ".join(ts[i : i + k]) for i in range(len(ts) - k + 1)]
        if normalize:
            gs = [g.lower() for g in gs]
        grams[d] = (ts, gs)
        for g in gs:
            occ[g].append(d)
    if scope == "corpus":
        dup = {g for g, ds in occ.items() if len(ds) >= 2}
    else:
        dup = {g for g, ds in occ.items() if len(set(ds)) >= 2}
    out = {}
    for d, t in texts.items():
        if t is None:
            out[d] = (None, 0, 0)
            continue
        ts, gs = grams.get(d, (_toks(t), []))
        covered = set()
        for i, g in enumerate(gs):
            if g in dup:
                covered.update(range(i, i + k))
        kept = [t_ for i, t_ in enumerate(ts) if i not in covered]
        out[d] = (" ".join(kept), len(ts), len(ts) - len(kept))
    return out


def _docs(spark, d):
    return spark.createDataFrame(list(d.items()), "doc_id long, text string")


def _collect(df):
    return {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"]) for r in df.collect()
    }


SHARED = "one two three four five six seven eight nine ten"


class TestRemoveDupSpans:
    def test_brute_force_parity(self, spark):
        texts = {
            0: "intro words here " + SHARED + " tail a b",
            1: "other prefix " + SHARED + " different ending now",
            2: "totally unrelated content with no shared runs at all",
            3: "self rep self rep self rep self rep self rep self rep",
        }
        for scope in ("corpus", "cross_doc"):
            want = _ref_remove(texts, k=4, scope=scope)
            got = _collect(remove_dup_spans(_docs(spark, texts), k=4, scope=scope))
            assert got == want, scope

    def test_shared_run_removed_exactly(self, spark):
        texts = {
            0: "aa bb cc " + SHARED + " dd ee",
            1: "ff gg " + SHARED + " hh ii jj",
        }
        out = _collect(remove_dup_spans(_docs(spark, texts), k=4))
        assert out[0][0] == "aa bb cc dd ee"
        assert out[1][0] == "ff gg hh ii jj"
        assert out[0][2] == 10  # the 10 shared tokens cut

    def test_within_doc_repeat_scope(self, spark):
        # a doc repeating its own 4-gram: corpus scope cuts it,
        # cross_doc scope keeps it
        texts = {0: "p q r s x y z p q r s", 1: "unrelated other words here"}
        corpus = _collect(remove_dup_spans(_docs(spark, texts), k=4, scope="corpus"))
        cross = _collect(remove_dup_spans(_docs(spark, texts), k=4, scope="cross_doc"))
        assert corpus[0][2] == 8  # both occurrences of "p q r s"
        assert corpus[0][0] == "x y z"
        assert cross[0][2] == 0

    def test_normalize_matches_case_variants(self, spark):
        texts = {0: "xx " + SHARED.upper() + " yy", 1: "zz " + SHARED + " ww"}
        raw = _collect(remove_dup_spans(_docs(spark, texts), k=4))
        norm = _collect(remove_dup_spans(_docs(spark, texts), k=4, normalize=True))
        assert raw[0][2] == 0  # case differs -> no byte-exact dup
        assert norm[0][2] == 10 and norm[1][2] == 10
        assert norm[0][0] == "xx yy"  # output keeps original bytes

    def test_edges(self, spark):
        texts = {
            0: None,
            1: "",
            2: "short doc",  # < k tokens
            3: SHARED,  # fully duplicated vs 4
            4: SHARED,
        }
        out = _collect(remove_dup_spans(_docs(spark, texts), k=4))
        assert out[0] == (None, 0, 0)
        assert out[1] == ("", 0, 0)
        assert out[2] == ("short doc", 2, 0)
        assert out[3] == ("", 10, 10)  # dropped-to-empty, not lost
        assert out[4] == ("", 10, 10)

    def test_original_bytes_kept(self, spark):
        texts = {
            0: "Keep CASE! and,punct " + SHARED,
            1: "pre " + SHARED + " post",
        }
        out = _collect(remove_dup_spans(_docs(spark, texts), k=4))
        assert out[0][0] == "Keep CASE! and,punct"

    def test_dup_span_starts(self, spark):
        texts = {0: "a b " + SHARED, 1: SHARED + " c d"}
        starts = {
            r["doc_id"]: r["starts"]
            for r in dup_span_starts(_docs(spark, texts), k=4).collect()
        }
        # doc 0: shared run begins at token 2 -> gram starts 2..8
        assert starts[0] == list(range(2, 9))
        assert starts[1] == list(range(0, 7))

    def test_validation(self, spark):
        df = _docs(spark, {0: "a"})
        with pytest.raises(ValueError):
            remove_dup_spans(df, k=0)
        with pytest.raises(ValueError):
            remove_dup_spans(df, scope="nope")

    def test_plan_shape(self, spark):
        """Every shuffle keys on doc_id or the gram hash only (the
        amplitude-bearing gram shuffle carries 16-byte rows, never
        text), the token stream is never exploded (the only Generate is
        the gram posexplode), and no Python eval node appears."""
        import re as _re

        texts = {0: "a b c d e f", 1: "a b c d e g"}
        df = remove_dup_spans(_docs(spark, texts), k=3)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]  # AQE repeats the tree
        for m in _re.finditer(r"Exchange hashpartitioning\(([^,]+),", plan):
            key = m.group(1)
            assert key.startswith(("doc_id", "_gh")), m.group(0)
        # the gram stream crosses exactly ONE exchange (round 8: window
        # dup-decision replaced the groupBy + join-back double shuffle)
        assert len(_re.findall(r"Exchange hashpartitioning\(_gh", plan)) <= 1
        assert plan.count("Generate") <= 2  # gram posexplode (+reuse)
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan


def test_custom_text_col_alias(spark):
    df = spark.createDataFrame(
        [(0, "a b " + SHARED), (1, SHARED + " c d")], "doc_id long, body string"
    )
    out = remove_dup_spans(df, text_col="body", k=4)
    assert "body" in out.columns and "text" not in out.columns


def test_prepare_corpus_cut_dup_spans(spark):
    """cut_dup_spans_k surgically removes the shared run instead of
    dropping documents; unique content survives in place."""
    from duckdb_annsearch_spark.pipeline.corpus import prepare_corpus

    rows = [
        (0, "document zero unique part " + SHARED),
        (1, SHARED + " document one keeps its own distinct tail"),
        (2, "third document shares nothing with anyone else here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = prepare_corpus(
        df, langs=(), min_quality=0.0, dedup="none", cut_dup_spans_k=4
    )
    got = {r.doc_id: r.text for r in out.collect()}
    assert got[0] == "document zero unique part"
    assert got[1] == "document one keeps its own distinct tail"
    assert got[2] == rows[2][1]
