"""Implicit query acceleration — the session-hook twin of the reference's
pre-optimizer rewrite (``/root/reference/src/ann_optimizer.cpp:568-576``),
which rewrites EVERY query unasked.

Spark exposes no Python-side optimizer-rule injection, so opting a session
in patches every surface a query must pass through on its way to
execution:

* **All DataFrame actions** (class-level): ``collect``, ``toPandas``,
  ``show``, ``count``, ``take`` (and through it ``head``/``first``),
  ``tail``, ``toLocalIterator``, ``foreach``, ``foreachPartition``,
  ``isEmpty``, ``writeTo``, plus the ``write`` property (so
  ``df.write.parquet(...)`` saves the accelerated result).  Each action
  first offers its plan to :meth:`AnnEngine.accelerate`; non-matching
  plans run unchanged (the matcher walks the analyzed plan only — no
  jobs).  The reference rewrites at the optimizer, so a ``COPY``/``CTAS``
  over a top-k query is accelerated too — hooking only collect/toPandas
  (rounds ≤4) left ``show``/``count``/``write`` running brute force.
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

# Every public eager entry point on DataFrame.  `head`/`first` delegate to
# `take` in both classic and connect implementations, so patching `take`
# covers them; `summary`/`describe` return DataFrames (lazy) and need no
# hook.  Names missing on a given concrete class are skipped.
_ACTION_METHODS = (
    "collect",
    "toPandas",
    "show",
    "count",
    "take",
    "tail",
    "toLocalIterator",
    "foreach",
    "foreachPartition",
    "isEmpty",
    "writeTo",
)

_STATE: dict = {
    "engine": None,
    "df_cls": None,
    "orig": {},          # method/property name -> original class attribute
    "orig_sql": None,
    "session": None,
}
_tls = threading.local()


def _runtime_df_class(spark):
    """The CONCRETE DataFrame class this session instantiates — pyspark 4
    splits the public ``pyspark.sql.DataFrame`` ABC from the classic /
    connect implementations, and the implementation overrides the actions,
    so the base class must not be patched."""
    return type(spark.range(0))


def _offer(df):
    """Give the engine one shot at rewriting ``df``; fail open.

    Only DataFrames of the enabled engine's OWN session are offered — the
    action patch is class-level, so without this guard a second
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


def _unpatch_class() -> None:
    st = _STATE
    cls = st["df_cls"]
    if cls is None:
        return
    for name, orig in st["orig"].items():
        try:
            setattr(cls, name, orig)
        except Exception:
            pass
    st["df_cls"] = None
    st["orig"] = {}


def _patch_class(cls) -> None:
    st = _STATE
    st["df_cls"] = cls
    st["orig"] = {}

    def make_wrapper(name, orig):
        def wrapper(df, *args, **kwargs):
            return orig(_offer(df), *args, **kwargs)

        wrapper.__name__ = name
        wrapper.__doc__ = getattr(orig, "__doc__", None)
        return wrapper

    for name in _ACTION_METHODS:
        orig = getattr(cls, name, None)
        if orig is None:
            continue
        st["orig"][name] = orig
        setattr(cls, name, make_wrapper(name, orig))

    # `write` is a property returning a DataFrameWriter bound to the frame;
    # rebinding it to the accelerated frame makes df.write.parquet(...)
    # persist the index-served result (the reference's CTAS-over-top-k).
    orig_write = getattr(cls, "write", None)
    if isinstance(orig_write, property) and orig_write.fget is not None:
        st["orig"]["write"] = orig_write
        cls.write = property(
            lambda self: orig_write.fget(_offer(self)),
            doc=orig_write.__doc__,
        )


def enable(engine) -> None:
    """Route this session's DataFrame actions and ``spark.sql`` through
    ``engine``'s transparent top-k rewrite. Last enable wins; idempotent."""
    st = _STATE
    cls = _runtime_df_class(engine.spark)
    if st["df_cls"] is not None and st["df_cls"] is not cls:
        # a different concrete DataFrame class (e.g. classic vs connect
        # sessions in one process): unhook the old class so "last enable
        # wins" holds for the class patch too, not just the engine slot
        _unpatch_class()
    if st["df_cls"] is None:
        _patch_class(cls)
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
    _unpatch_class()
    if st["session"] is not None and st["orig_sql"] is not None:
        try:
            st["session"].sql = st["orig_sql"]
        except Exception:
            pass
    st.update(engine=None, orig_sql=None, session=None)
