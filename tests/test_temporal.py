"""asof_join / range_join: brute-force parity on adversarial fixtures +
plan-shape assertions (no inequality-join physical operators)."""

import random

import pytest
from pyspark.sql import functions as F

from duckdb_annsearch_spark.operators.temporal import asof_join, range_join


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


@pytest.fixture(scope="module")
def sides(spark):
    """Deterministic random event streams with tie timestamps, keys with
    no right rows, and right rows after every left row."""
    rng = random.Random(7)
    left = [
        (i, rng.randrange(8), rng.randrange(0, 1000) * 10, float(i))
        for i in range(300)
    ]  # (lid, key, ts, lval)  key=7 never appears on the right
    right = [
        (1000 + i, rng.randrange(7), rng.randrange(0, 1000) * 10, float(i) / 7)
        for i in range(200)
    ]
    # forced exact-tie pairs: two right rows at one ts, and a right row at
    # exactly a left row's ts
    right += [(2001, 3, left[0][2], 1.5), (2002, 3, left[0][2], 2.5)]
    ldf = _mk(spark, left, ["lid", "key", "ts", "lval"])
    rdf = _mk(spark, right, ["rid", "key", "ts", "rval"])
    return left, right, ldf, rdf


def _brute_asof(left, right, tolerance=None):
    out = {}
    for lid, k, lts, _ in left:
        cands = [r for r in right if r[1] == k and r[2] <= lts]
        if tolerance is not None:
            cands = [r for r in cands if lts - r[2] <= tolerance]
        if cands:
            best = max(cands, key=lambda r: (r[2], r[0]))  # ts, then tiebreak
            out[lid] = (best[0], best[3])
        else:
            out[lid] = (None, None)
    return out


def test_asof_matches_brute_force(sides):
    left, right, ldf, rdf = sides
    got = asof_join(
        ldf, rdf, on="key", right_cols=["rid", "rval"], tiebreak="rid"
    ).collect()
    exp = _brute_asof(left, right)
    assert len(got) == len(left)
    for row in got:
        assert (row.matched_rid, row.matched_rval) == exp[row.lid], row


def test_asof_tolerance(sides):
    left, right, ldf, rdf = sides
    got = asof_join(
        ldf, rdf, on="key", right_cols=["rid"], tiebreak="rid", tolerance=50
    ).collect()
    exp = _brute_asof(left, right, tolerance=50)
    for row in got:
        assert row.matched_rid == exp[row.lid][0], row


def test_asof_tie_right_at_left_ts_matches(sides):
    """A right row AT the left timestamp matches, and among equal-ts right
    rows the largest tiebreak wins (rid 2002 over 2001)."""
    left, right, ldf, rdf = sides
    lts0 = left[0][2]
    one = _mk(spark=ldf.sparkSession, rows=[(9, 3, lts0, 0.0)], cols=["lid", "key", "ts", "lval"])
    row = asof_join(one, rdf, on="key", right_cols=["rid"], tiebreak="rid").collect()[0]
    exp = _brute_asof([(9, 3, lts0, 0.0)], right)
    assert row.matched_rid == exp[9][0]


def test_asof_plan_has_no_inequality_join(sides):
    _, _, ldf, rdf = sides
    df = asof_join(ldf, rdf, on="key", right_cols=["rid"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the whole operator is a union + one window — no join at all
    assert "Join" not in plan


def _brute_range(left, right, lo, hi):
    out = []
    for lid, k, lts, _ in left:
        for rid, rk, rts, rval in right:
            if rk == k and lts + lo <= rts <= lts + hi:
                out.append((lid, rid))
    return sorted(out)


def test_range_join_matches_brute_force(sides):
    left, right, ldf, rdf = sides
    got = range_join(ldf, rdf, on="key", lo=-70, hi=200).select("lid", "rid").collect()
    assert sorted((r.lid, r.rid) for r in got) == _brute_range(left, right, -70, 200)


def test_range_join_left_outer(sides):
    left, right, ldf, rdf = sides
    got = range_join(ldf, rdf, on="key", lo=0, hi=40, how="left").collect()
    matches = _brute_range(left, right, 0, 40)
    matched_l = {l for l, _ in matches}
    # every match present + every unmatched left row exactly once with NULLs
    assert sorted((r.lid, r.rid) for r in got if r.rid is not None) == matches
    unmatched = [r for r in got if r.rid is None]
    assert sorted(r.lid for r in unmatched) == sorted(
        l[0] for l in left if l[0] not in matched_l
    )
    assert all(r.rval is None for r in unmatched)


def test_range_join_zero_width_and_validation(sides):
    left, right, ldf, rdf = sides
    got = range_join(ldf, rdf, on="key", lo=0, hi=0).select("lid", "rid").collect()
    assert sorted((r.lid, r.rid) for r in got) == _brute_range(left, right, 0, 0)
    with pytest.raises(ValueError, match="hi"):
        range_join(ldf, rdf, on="key", lo=10, hi=0)
    with pytest.raises(ValueError, match="how"):
        range_join(ldf, rdf, on="key", lo=0, hi=1, how="full")


def test_range_join_plan_is_equijoin(sides):
    _, _, ldf, rdf = sides
    df = range_join(ldf, rdf, on="key", lo=0, hi=600)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_negative_timestamps(spark):
    """pmod bucketing & window ordering hold for pre-epoch (negative) ts."""
    ldf = _mk(spark, [(1, 0, -95), (2, 0, 5)], ["lid", "key", "ts"])
    rdf = _mk(spark, [(10, 0, -100), (11, 0, -90), (12, 0, 0)], ["rid", "key", "ts"])
    rows = {r.lid: r.matched_rid for r in
            asof_join(ldf, rdf, on="key", right_cols=["rid"]).collect()}
    assert rows == {1: 10, 2: 12}
    pairs = sorted(
        (r.lid, r.rid)
        for r in range_join(ldf, rdf, on="key", lo=-10, hi=10).collect()
    )
    assert pairs == [(1, 10), (1, 11), (2, 12)]


def test_asof_null_right_value_stays_atomic(spark):
    """A genuine NULL in a carried right column must NOT be back-filled
    from an older right row (struct-carry atomicity)."""
    ldf = _mk(spark, [(1, 0, 30)], ["lid", "key", "ts"])
    rdf = _mk(
        spark,
        [(10, 0, 10, 5.0), (11, 0, 20, None)],
        ["rid", "key", "ts", "rval"],
    )
    row = asof_join(
        ldf, rdf, on="key", right_cols=["rid", "rval"], tiebreak="rid"
    ).collect()[0]
    assert row.matched_rid == 11 and row.matched_rval is None


def test_asof_null_keys_never_match(spark):
    ldf = _mk(spark, [(1, None, 30), (2, 0, 30)], ["lid", "key", "ts"])
    rdf = _mk(spark, [(10, None, 10), (11, 0, 10)], ["rid", "key", "ts"])
    rows = {r.lid: r.matched_rid for r in
            asof_join(ldf, rdf, on="key", right_cols=["rid"]).collect()}
    assert rows == {1: None, 2: 11}


def test_asof_null_tiebreak_loses(spark):
    """At equal ts, a right row with a NULL tiebreak loses to any real
    value (ORDER BY tie DESC NULLS LAST semantics)."""
    ldf = _mk(spark, [(1, 0, 10)], ["lid", "key", "ts"])
    rdf = _mk(spark, [(None, 0, 10, 1.0), (7, 0, 10, 2.0)],
              ["rid", "key", "ts", "rval"])
    row = asof_join(ldf, rdf, on="key", right_cols=["rid", "rval"],
                    tiebreak="rid").collect()[0]
    assert row.matched_rid == 7 and row.matched_rval == 2.0


def test_range_left_outer_null_payload_multiplicity(spark):
    """A left row with a NULL payload column must not reappear as a
    spurious unmatched row (null-safe anti-join)."""
    ldf = spark.createDataFrame(
        [(1, 0, 100, None), (2, 0, 500, None)],
        "lid long, key long, ts long, note string",
    )
    rdf = _mk(spark, [(10, 0, 105)], ["rid", "key", "ts"])
    got = range_join(ldf, rdf, on="key", lo=0, hi=10, how="left").collect()
    by_lid = {}
    for r in got:
        by_lid.setdefault(r.lid, []).append(r.rid)
    assert by_lid == {1: [10], 2: [None]}


def _brute_asof_fwd(left, right, tolerance=None):
    out = {}
    for lid, k, lts, _ in left:
        cands = [r for r in right if r[1] == k and r[2] >= lts]
        if tolerance is not None:
            cands = [r for r in cands if r[2] - lts <= tolerance]
        if cands:
            best = min(cands, key=lambda r: (r[2], -r[0]))  # earliest ts, largest tiebreak
            out[lid] = best[0]
        else:
            out[lid] = None
    return out


def test_asof_forward_matches_brute_force(sides):
    left, right, ldf, rdf = sides
    got = {r.lid: r.matched_rid for r in asof_join(
        ldf, rdf, on="key", right_cols=["rid"], tiebreak="rid",
        direction="forward",
    ).collect()}
    exp = _brute_asof_fwd(left, right)
    assert got == exp


def test_asof_forward_tolerance_and_validation(sides):
    left, right, ldf, rdf = sides
    got = {r.lid: r.matched_rid for r in asof_join(
        ldf, rdf, on="key", right_cols=["rid"], tiebreak="rid",
        direction="forward", tolerance=50,
    ).collect()}
    exp = _brute_asof_fwd(left, right, tolerance=50)
    assert got == exp
    with pytest.raises(ValueError, match="direction"):
        asof_join(ldf, rdf, on="key", right_cols=["rid"], direction="nearest")
