"""Logical-plan pattern matching for the transparent top-k rewrite.

The reference hooks DuckDB's pre-optimizer and rewrites
``LIMIT k → ORDER BY dist_fn(col, const) ASC → PROJECTION → SCAN`` plans
into an index scan (``/root/reference/src/ann_optimizer.cpp:348-530``).
The Spark-native twin: ``AnnEngine.sql`` parses the SQL into Catalyst's
*unresolved* logical plan (function calls are still named there — after
analysis, SQL-defined UDFs inline into raw aggregate expressions) and
pattern-matches the same shape:

    GlobalLimit(k)
      LocalLimit(k)
        Sort([single ASC key])
          Project([*, dist_fn(col, const) AS alias])   (or dist_fn in Sort)
            UnresolvedRelation([table])

Any other node in between — in particular a Filter, mirroring
``HasFilterBetween`` (``ann_optimizer.cpp:158-171,478-481``) — fails the
match and the query runs unrewritten through ``spark.sql``.

Everything here reads the plan through py4j; nothing executes.
"""

from __future__ import annotations

from dataclasses import dataclass

DISTANCE_FUNCTIONS = {
    "array_distance": "l2",
    "list_distance": "l2",
    "array_inner_product": "ip",
    "list_inner_product": "ip",
    "array_cosine_similarity": "cosine",
    "list_cosine_similarity": "cosine",
}


@dataclass
class TopKMatch:
    table: str
    column: str
    query_vector: list[float]
    k: int
    fn_name: str            # one of DISTANCE_FUNCTIONS
    metric: str             # required index metric (l2 | ip | cosine)
    alias: str | None       # distance output column, None when ORDER BY holds the call
    filter_sql: str | None = None  # WHERE clause found between sort and scan
    # (the reference refuses to rewrite then — ann_optimizer.cpp:478-481 —
    # but the query must still execute; Spark 4 can't even run a SQL UDF
    # inside Sort, so the engine brute-forces matched-but-unrewritten plans)


def _cls(node) -> str:
    return node.getClass().getSimpleName()


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _seq(jseq):
    return [jseq.apply(i) for i in range(jseq.size())]


def _name_parts(expr) -> list[str]:
    return [str(p) for p in _seq(expr.nameParts())]


def _literal_int(expr) -> int | None:
    if _cls(expr) != "Literal":
        return None
    try:
        return int(str(expr.value()))
    except (TypeError, ValueError):
        return None


def _unwrap_cast(expr):
    while _cls(expr) in ("Cast", "UnresolvedCast"):
        expr = _children(expr)[0]
    return expr


def _vector_literal(expr) -> list[float] | None:
    """Extract [floats] from ``CAST(array(...) AS ARRAY<FLOAT>)`` /
    ``array(...)`` — the constant-vector arg the reference also unwraps
    casts and array_value calls around (``ann_optimizer.cpp:194-223``)."""
    expr = _unwrap_cast(expr)
    if _cls(expr) == "UnresolvedFunction" and _name_parts(expr)[-1].lower() in (
        "array",
        "array_value",
        "list_value",
    ):
        vals = []
        for a in _seq(expr.arguments()):
            a = _unwrap_cast(a)
            if _cls(a) != "Literal":
                return None
            try:
                vals.append(float(str(a.value())))
            except (TypeError, ValueError):
                return None
        return vals
    return None


def _match_distance_call(expr) -> tuple[str, str, list[float]] | None:
    """dist_fn(colref, const) or dist_fn(const, colref) →
    (fn_name, column, vector)."""
    expr = _unwrap_cast(expr)
    if _cls(expr) != "UnresolvedFunction":
        return None
    fn = _name_parts(expr)[-1].lower()
    if fn not in DISTANCE_FUNCTIONS:
        return None
    args = _seq(expr.arguments())
    if len(args) != 2:
        return None
    col = vec = None
    for a in args:
        u = _unwrap_cast(a)
        if _cls(u) == "UnresolvedAttribute":
            col = _name_parts(u)[-1]
        else:
            v = _vector_literal(a)
            if v is not None:
                vec = v
    if col is None or vec is None:
        return None
    return fn, col, vec


def _match_project(node) -> tuple[dict[str, tuple], str, list[str]] | None:
    """Project of [UnresolvedStar, aliased distance calls…] over the
    relation, tolerating SubqueryAlias and Filter on the way down.
    Returns ({alias: (fn, col, vec)}, table, [filter sql texts])."""
    aliases: dict[str, tuple] = {}
    filters: list[str] = []
    while True:
        c = _cls(node)
        if c == "SubqueryAlias":
            node = _children(node)[0]
        elif c == "Filter":
            filters.append(str(node.condition().sql()))
            node = _children(node)[0]
        elif c == "Project":
            for p in _seq(node.projectList()):
                pc = _cls(p)
                if pc == "UnresolvedStar":
                    continue
                if pc == "UnresolvedAlias":
                    p = _children(p)[0]
                    pc = _cls(p)
                if pc == "Alias":
                    m = _match_distance_call(_children(p)[0])
                    if m is not None:
                        aliases[str(p.name())] = m
                        continue
                # any other projection item (computed column, renamed col)
                # leaves base-table semantics — refuse, like the reference's
                # strict projection match (ann_optimizer.cpp:367-392)
                return None
            node = _children(node)[0]
        elif c == "UnresolvedRelation":
            ident = node.multipartIdentifier()
            # full multipart name: `db.docs` must not alias a flat `docs`
            table = ".".join(str(ident.apply(i)) for i in range(ident.size()))
            return aliases, table, filters
        else:
            return None


def match_topk_sql(spark, sql_text: str) -> TopKMatch | None:
    """Parse ``sql_text`` and return a :class:`TopKMatch` when it has the
    rewritable shape, else None. Never raises on unparseable/unmatched SQL —
    callers fall back to plain ``spark.sql``."""
    try:
        plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(sql_text)
    except Exception:
        return None
    try:
        return _match_plan(plan)
    except Exception:
        return None


def _match_plan(plan) -> TopKMatch | None:
    if _cls(plan) != "GlobalLimit":
        return None
    k = _literal_int(plan.limitExpr())
    if k is None or k <= 0:
        return None
    (local,) = _children(plan)
    if _cls(local) != "LocalLimit":
        return None
    (sort,) = _children(local)
    if _cls(sort) != "Sort":
        return None
    order = _seq(sort.order())
    if len(order) != 1:
        return None
    so = order[0]
    if "Ascending" not in str(so.direction()):
        # exactly one ASC key, like ann_optimizer.cpp:351-365
        return None
    key = so.child()
    (below,) = _children(sort)

    direct = _match_distance_call(key)
    if direct is not None:
        # ORDER BY dist_fn(col, const) directly
        m = _match_project(below)
        if m is None:
            return None
        aliases, table, filters = m
        if aliases:
            return None  # SELECT list computed extra columns — refuse
        fn, col, vec = direct
        return TopKMatch(
            table, col, vec, k, fn, DISTANCE_FUNCTIONS[fn], None,
            " AND ".join(filters) or None,
        )

    if _cls(key) == "UnresolvedAttribute":
        # ORDER BY alias of a projected distance call
        name = _name_parts(key)[-1]
        m = _match_project(below)
        if m is None:
            return None
        aliases, table, filters = m
        if name not in aliases or len(aliases) != 1:
            return None
        fn, col, vec = aliases[name]
        return TopKMatch(
            table, col, vec, k, fn, DISTANCE_FUNCTIONS[fn], name,
            " AND ".join(filters) or None,
        )
    return None
