"""line_dedup / line_df_counts: brute-force parity + edge cases."""

import pytest
from pyspark.sql import types as T

from duckdb_annsearch_spark.pipeline.lines import line_df_counts, line_dedup

DOCS = [
    (0, "unique alpha\nCopyright Notice\nunique beta"),
    (1, "copyright notice\nunique gamma\n\nunique delta"),  # case-variant banner + blank
    (2, "  Copyright Notice  \nunique epsilon\nCopyright Notice"),  # indent + in-doc repeat
    (3, "Copyright Notice"),  # all-boilerplate -> empty
    (4, ""),  # empty text: one blank line, kept
    (5, None),  # NULL stays NULL
    (6, "unique zeta\nunique zeta"),  # in-doc repeat only: df=1, kept
]


def _brute(min_df=2, normalize=True):
    def norm(s):
        return s.strip().lower() if normalize else s

    df = {}
    for _, t in DOCS:
        if t is None:
            continue
        for k in {norm(x) for x in t.split("\n") if norm(x) != ""}:
            df[k] = df.get(k, 0) + 1
    boiler = {k for k, v in df.items() if v >= min_df}
    out = {}
    for did, t in DOCS:
        if t is None:
            out[did] = (None, 0, 0)
            continue
        lines = t.split("\n")
        kept = [x for x in lines if norm(x) == "" or norm(x) not in boiler]
        out[did] = ("\n".join(kept), len(kept), len(lines) - len(kept))
    return out, df


@pytest.fixture(scope="module")
def docs(spark):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
        ]
    )
    return spark.createDataFrame(DOCS, schema)


def test_matches_brute_force(docs):
    got = {r.doc_id: (r.text, r.n_kept, r.n_dropped)
           for r in line_dedup(docs).collect()}
    exp, _ = _brute()
    assert got == exp


def test_normalization_merges_variants(docs):
    """'Copyright Notice' / 'copyright notice' / indented variant all
    counted as one line with df=4 — and every copy (incl. doc 2's
    within-doc repeat) drops."""
    counts = {r.line: r.df for r in line_df_counts(docs).collect()}
    assert counts["copyright notice"] == 4
    got = {r.doc_id: r.text for r in line_dedup(docs).collect()}
    assert got[2] == "unique epsilon"
    assert got[3] == ""  # dropped-to-empty, not lost


def test_within_doc_repeat_not_boilerplate(docs):
    """df counts distinct docs: doc 6's duplicated line has df=1, kept."""
    got = {r.doc_id: r.text for r in line_dedup(docs).collect()}
    assert got[6] == "unique zeta\nunique zeta"


def test_blank_lines_kept(docs):
    got = {r.doc_id: r.text for r in line_dedup(docs).collect()}
    assert got[1] == "unique gamma\n\nunique delta"
    assert got[4] == ""


def test_no_normalize(docs):
    got = {r.doc_id: r.text for r in line_dedup(docs, normalize=False).collect()}
    exp, _ = _brute(normalize=False)
    # exact-match mode: only the two byte-identical 'Copyright Notice'
    # lines (docs 0 and 2-line-3... actually doc 2 has indented + exact)
    assert got == {k: v[0] for k, v in exp.items()}


def test_min_df_validation(docs):
    with pytest.raises(ValueError, match="min_df"):
        line_dedup(docs, min_df=1)


def test_plan_python_free(docs):
    plan = line_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_regex_delimiter_is_literal(spark):
    """A '.' delimiter must split on dots, not on every character."""
    df = spark.createDataFrame([(0, "a.b.a"), (1, "a.c")], ["doc_id", "text"])
    got = {r.doc_id: r.text for r in line_dedup(df, delimiter=".").collect()}
    assert got == {0: "b", 1: "c"}  # 'a' has df=2 -> dropped everywhere


def test_blank_lines_kept_without_normalize(spark):
    """Whitespace-only lines are structural in BOTH modes — never counted
    as boilerplate even under normalize=False."""
    df = spark.createDataFrame(
        [(0, "x\n  \ny"), (1, "z\n  \nw")], ["doc_id", "text"]
    )
    got = {r.doc_id: r.text for r in line_dedup(df, normalize=False).collect()}
    assert got == {0: "x\n  \ny", 1: "z\n  \nw"}
