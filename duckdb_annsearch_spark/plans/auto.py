"""Implicit query acceleration — the session-hook twin of the reference's
pre-optimizer rewrite (``/root/reference/src/ann_optimizer.cpp:568-576``),
which rewrites EVERY query unasked.

Spark exposes no Python-side optimizer-rule injection, so opting a session
in patches the two surfaces a query must pass through on its way to
execution:

* ``DataFrame.collect`` / ``DataFrame.toPandas`` (class-level): the plan is
  first offered to :meth:`AnnEngine.accelerate`; non-matching plans run
  unchanged (the matcher walks the analyzed plan only — no jobs).
* ``spark.sql`` (instance-level, this engine's session only): routed
  through :meth:`AnnEngine.sql`, the parsed-plan rewrite.

A thread-local re-entrancy flag keeps the engine's own internal actions
(tombstone reads, probe construction) out of the matcher, and every hook
fails open — any error in matching falls back to the original action, so
enabling acceleration can never break a query.  ``disable()`` restores the
original methods exactly.
"""

from __future__ import annotations

import threading

_STATE: dict = {
    "engine": None,
    "df_cls": None,
    "orig_collect": None,
    "orig_toPandas": None,
    "orig_sql": None,
    "session": None,
}
_tls = threading.local()


def _runtime_df_class(spark):
    """The CONCRETE DataFrame class this session instantiates — pyspark 4
    splits the public ``pyspark.sql.DataFrame`` ABC from the classic /
    connect implementations, and the implementation overrides ``collect``,
    so the base class must not be patched."""
    return type(spark.range(0))


def _offer(df):
    """Give the engine one shot at rewriting ``df``; fail open.

    Only DataFrames of the enabled engine's OWN session are offered — the
    collect/toPandas patch is class-level, so without this guard a second
    SparkSession in the same process would have its queries walked (and
    semanticEquals-probed) by the wrong engine's matcher.  The engine's
    internal actions on its own session do pass through here (the busy
    flag only covers re-entrancy from inside accelerate/sql); each offer
    is a jobless analyzed-plan check, a few py4j calls — latency noise
    next to the Spark action it precedes, and any matcher error falls
    back to the unmodified action."""
    eng = _STATE["engine"]
    if eng is None or getattr(_tls, "busy", False):
        return df
    try:
        if df.sparkSession is not eng.spark:
            return df
    except Exception:
        return df
    _tls.busy = True
    try:
        try:
            return eng.accelerate(df)
        except Exception:
            return df
    finally:
        _tls.busy = False


def enable(engine) -> None:
    """Route this session's DataFrame actions and ``spark.sql`` through
    ``engine``'s transparent top-k rewrite. Last enable wins; idempotent."""
    st = _STATE
    cls = _runtime_df_class(engine.spark)
    if st["df_cls"] is not None and st["df_cls"] is not cls:
        # a different concrete DataFrame class (e.g. classic vs connect
        # sessions in one process): unhook the old class so "last enable
        # wins" holds for the class patch too, not just the engine slot
        st["df_cls"].collect = st["orig_collect"]
        st["df_cls"].toPandas = st["orig_toPandas"]
        st["df_cls"] = None
    if st["df_cls"] is None:
        st["df_cls"] = cls
        st["orig_collect"] = cls.collect
        st["orig_toPandas"] = cls.toPandas

        def collect(df):
            return st["orig_collect"](_offer(df))

        def toPandas(df):
            return st["orig_toPandas"](_offer(df))

        collect.__doc__ = cls.collect.__doc__
        toPandas.__doc__ = cls.toPandas.__doc__
        cls.collect = collect
        cls.toPandas = toPandas
    st["engine"] = engine

    spark = engine.spark
    if st["session"] is not spark:
        if st["session"] is not None and st["orig_sql"] is not None:
            try:
                st["session"].sql = st["orig_sql"]
            except Exception:
                pass
        st["orig_sql"] = spark.sql
        st["session"] = spark

        def sql(text, *args, **kwargs):
            eng = st["engine"]
            if (
                eng is None
                or args
                or kwargs  # parameterized sql: pass through untouched
                or getattr(_tls, "busy", False)
            ):
                return st["orig_sql"](text, *args, **kwargs)
            _tls.busy = True
            try:
                try:
                    return eng.sql(text)
                except Exception:
                    return st["orig_sql"](text)
            finally:
                _tls.busy = False

        spark.sql = sql


def disable() -> None:
    """Restore the original DataFrame actions and ``spark.sql``."""
    st = _STATE
    if st["df_cls"] is not None and st["orig_collect"] is not None:
        st["df_cls"].collect = st["orig_collect"]
        st["df_cls"].toPandas = st["orig_toPandas"]
    if st["session"] is not None and st["orig_sql"] is not None:
        try:
            st["session"].sql = st["orig_sql"]
        except Exception:
            pass
    st.update(
        engine=None, df_cls=None, orig_collect=None, orig_toPandas=None,
        orig_sql=None, session=None,
    )
