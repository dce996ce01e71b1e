"""Temporal joins: as-of join and bounded range (interval) join.

Neither exists in the reference (it has no event-time operators at all) —
these are the two joins every event/feature pipeline at scale needs and
that naive SQL expresses as an inequality join, which Spark executes as
BroadcastNestedLoopJoin or a cartesian range explosion.  Both operators
here are re-expressed in shuffle-bounded shapes:

* ``asof_join`` — union the two sides, one window pass per key ordered by
  time, ``last(..., ignorenulls=True)`` carries the most recent right row
  forward onto each left row.  ONE hash shuffle on the key, zero row
  amplification, no inequality join anywhere in the plan.  This is the
  classic distributed as-of shape (the same trick Flink's temporal join
  and pandas ``merge_asof``'s sorted scan realize single-node).

* ``range_join`` — left rows match right rows with
  ``right_ts ∈ [left_ts + lo, left_ts + hi]``.  Bucketize time into
  ``hi - lo``-wide buckets; each left row joins only the 2–3 buckets its
  window can touch (an equi-join on (key, bucket) after a small explode),
  then the exact interval predicate filters.  Work is O(matches + bucket
  collisions), never O(|L| × |R|) — the standard bucketed interval-join
  decomposition (cf. Spark's own range-join hints in Databricks runtime,
  absent from OSS).

Both keep every expression JVM-side (no Python UDFs).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    tolerance: int | None = None,
    prefix: str = "matched_",
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right.ts <= left.ts`` on the same key (backward as-of, pandas
    ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics; ties at equal
    timestamps DO match).  ``direction='forward'`` flips the comparison:
    the EARLIEST right row with ``right.ts >= left.ts`` wins instead
    (same plan, inverted window order).  pandas' third mode ('nearest')
    is deliberately absent — it needs a unique left row identity to
    reconcile the two directions; run both and pick in caller code.

    Parameters
    ----------
    on: equality key column name(s) shared by both sides.
    left_ts / right_ts: event-time columns (any mutually comparable
        orderable type; epoch-microsecond LONGs recommended — see
        ``_event_ts_us`` in the entry module for why float micros are
        not epoch-exact).
    right_cols: right columns to carry onto the match, each emitted as
        ``{prefix}{col}``; all are NULL when no right row precedes.
    tolerance: optional max allowed ``left_ts - right_ts`` (or
        ``right_ts - left_ts`` under ``direction='forward'``; same unit
        as the ts columns); farther matches are nulled out, like pandas
        ``merge_asof(tolerance=...)``.
    tiebreak: right-side column ordering the winner among right rows
        sharing one timestamp (the LARGEST tiebreak value wins, so the
        result is deterministic).  Defaults to the first of
        ``right_cols``.

    Scale: one shuffle (hash by ``on``) + one window sort — the same cost
    as a groupBy over the union, independent of match distance.  Skewed
    keys behave exactly like a skewed groupBy (AQE-splittable).
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = list(right_cols)
    if not right_cols:
        raise ValueError("asof_join: right_cols must name at least one column")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join: direction must be 'backward' or 'forward', got {direction!r}"
        )
    tiebreak = tiebreak or right_cols[0]

    carry = list(dict.fromkeys([*right_cols, tiebreak]))  # right payload, deduped
    # Union layout: keys + _ts + _side (0=right sorts first at ties, so a
    # right row AT the left timestamp is visible to it) + ONE struct of the
    # whole right payload + the right timestamp.  The struct is what makes
    # the match atomic: per-column last(ignorenulls) would stitch values
    # from DIFFERENT right rows whenever a carried column holds a genuine
    # NULL (the ignorenulls skip would reach past it to an older row).
    # Right rows with a NULL key are dropped up front — NULL equality keys
    # never match (pandas merge_asof / SQL join semantics); left rows with
    # NULL keys survive with NULL matches (their window partition then
    # contains no right rows).
    key_ok = F.lit(True)
    for kcol in keys:
        key_ok = key_ok & F.col(kcol).isNotNull()
    r = right.where(key_ok).select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tie"),
        F.struct(
            F.col(right_ts).alias("__rts"), *[F.col(c).alias(c) for c in carry]
        ).alias("_r"),
    )
    left_payload = [c for c in left.columns if c not in keys and c != left_ts]
    l = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        *[F.col(c) for c in left_payload],
    )
    unioned = r.unionByName(l, allowMissingColumns=True)

    # Right rows first at equal _ts (_side asc); among equal-_ts right rows
    # the largest NON-NULL tiebreak is scanned last, so last(ignorenulls)
    # picks it (nulls_first: a NULL tiebreak loses to any real value, the
    # way ORDER BY ... DESC NULLS LAST would rank them).
    ts_order = (
        F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("_side").asc(), F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = F.last(F.col("_r"), ignorenulls=True).over(w)

    out = (
        unioned.select("*", matched.alias("_m"))
        .where(F.col("_side") == 1)
    )
    ok: Column = F.lit(True)
    if tolerance is not None:
        delta = (
            F.col("_ts") - F.col("_m.__rts")
            if direction == "backward"
            else F.col("_m.__rts") - F.col("_ts")
        )
        ok = delta <= F.lit(tolerance)
    return out.select(
        *keys,
        F.col("_ts").alias(left_ts),
        *left_payload,
        *[
            F.when(ok, F.col(f"_m.{c}")).alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lo: int = 0,
    hi: int = 0,
    how: str = "inner",
) -> DataFrame:
    """Join left to every right row with
    ``left_ts + lo <= right_ts <= left_ts + hi`` on the same key, as an
    equi-join on (key, time-bucket) — never an inequality join.

    ``lo``/``hi`` are in the ts columns' own unit (epoch micros
    recommended); both ts columns must be integral.  ``how`` is ``inner``
    or ``left`` (unmatched left rows survive with NULL right columns).

    Plan shape: right is bucketed once (map-only); left explodes to the
    ceil((hi-lo)/W)+1 = 2 buckets its interval can touch (W = hi-lo, so
    the explode factor is exactly 2 — constant, not data-dependent), then
    a plain hash equi-join on (key, bucket) and the exact range filter.
    Shuffle volume is 2·|L| + |R| rows; a skewed (key, bucket) is an
    ordinary AQE-splittable hot hash key.  Right columns are emitted with
    an ``r_`` prefix when they collide with left names.
    """
    if hi < lo:
        raise ValueError(f"range_join: hi ({hi}) < lo ({lo})")
    keys = [on] if isinstance(on, str) else list(on)
    width = max(hi - lo, 1)

    # pmod keeps the floor-division bucket correct for negative epochs, and
    # `div` keeps the arithmetic integral throughout (a `/` would be double
    # division — lossy for LONG epoch-ns past double's 53-bit mantissa).
    def _with_bucket(df: DataFrame, col: Column, out: str) -> DataFrame:
        floored = col - F.pmod(col, F.lit(width))
        return df.withColumn("_tb", floored).withColumn(
            out, F.expr(f"_tb div {width}")
        ).drop("_tb")

    rb = _with_bucket(right, F.col(right_ts), "_bucket")
    # Interval [ts+lo, ts+hi] of length width spans at most 2 width-wide
    # buckets (inclusive endpoints), so the explode factor is exactly 2.
    lb = _with_bucket(left, F.col(left_ts) + F.lit(lo), "_b0")
    lb = lb.withColumn(
        "_bucket", F.explode(F.array(F.col("_b0"), F.col("_b0") + 1))
    ).drop("_b0")

    lcols = set(left.columns)
    rsel = [rb[c].alias(c if c not in lcols else f"r_{c}") for c in right.columns if c not in keys]
    rts_out = right_ts if right_ts not in lcols else f"r_{right_ts}"

    joined = lb.join(rb, on=[*keys, "_bucket"], how="inner").select(
        *[lb[c] for c in left.columns], *rsel
    )
    exact = joined.where(
        (F.col(rts_out) >= F.col(left_ts) + F.lit(lo))
        & (F.col(rts_out) <= F.col(left_ts) + F.lit(hi))
    )
    if how == "inner":
        return exact
    if how != "left":
        raise ValueError(f"range_join: how must be 'inner' or 'left', got {how!r}")
    # Left outer: run the inner form, then union back the left rows that
    # found nothing.  The anti-join condition must be NULL-SAFE (eqNullSafe
    # per column): a left row carrying a NULL payload value would never
    # equal its own entry in the match set under plain equality and would
    # come back a second time as a spurious "unmatched" row.  exact is
    # lazily checkpointed so the bucketed join executes once, not once per
    # branch.
    exact = exact.localCheckpoint(eager=False)
    matched_keys = exact.select(*left.columns).dropDuplicates(left.columns)
    mk = matched_keys.alias("_mk")
    lf = left.alias("_lf")
    cond = F.lit(True)
    for c in left.columns:
        cond = cond & F.col(f"_lf.{c}").eqNullSafe(F.col(f"_mk.{c}"))
    unmatched = lf.join(mk, on=cond, how="left_anti").select(
        *[F.col(f"_lf.{c}").alias(c) for c in left.columns]
    )
    null_right = unmatched.select(
        "*",
        *[
            F.lit(None).cast(dict(exact.dtypes)[a]).alias(a)
            for a in exact.columns
            if a not in left.columns
        ],
    )
    return exact.unionByName(null_right)
