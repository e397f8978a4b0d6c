"""Property-based expression parity: hypothesis generates random typed
expression trees, rendered twice — once in the MultiSQL dialect (executed
through the engine's dialect shim + Spark) and once in DuckDB SQL — and
the row sets must agree exactly.

The grammar covers the reference's expression surface (SURVEY §2.8):
int arithmetic, comparisons (3-valued logic with NULLs), BETWEEN,
IS [NOT] NULL, CASE WHEN, IIF, IFNULL/NULLIF, UPPER/LOWER/REPLACE/
CONCAT(||)/LEFT/RIGHT/LEN. Division is exercised separately in the corpus
tests (its int/int semantics are a deliberate dialect divergence from
DuckDB's float `/`).

The reference has no property-based testing at all (SURVEY §5); this is
the layer where dialect-shim bugs would hide.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from multisql_spark.session import MultiSQLSession
from multisql_spark.testing import canon_rows

ROWS = [
    (1, 2, "abc", True),
    (-3, 7, "XyZ", False),
    (0, None, "", None),
    (None, 4, None, True),
    (10, -10, "hello world", False),
    (5, 5, "abc", None),
]


@pytest.fixture(scope="module")
def engines(spark):
    import duckdb

    glue = MultiSQLSession(spark)
    glue.execute("DROP TABLE IF EXISTS prop")
    glue.execute(
        "CREATE TABLE prop (i INTEGER NULL, j INTEGER NULL, s TEXT NULL,"
        " b BOOLEAN NULL)"
    )
    for i, j, s, b in ROWS:
        vals = ", ".join(
            "NULL"
            if v is None
            else (f"'{v}'" if isinstance(v, str) else str(v).upper()
                  if isinstance(v, bool) else str(v))
            for v in (i, j, s, b)
        )
        glue.execute(f"INSERT INTO prop (i, j, s, b) VALUES ({vals})")
    duck = duckdb.connect()
    duck.execute("CREATE TABLE prop (i BIGINT, j BIGINT, s TEXT, b BOOLEAN)")
    duck.executemany("INSERT INTO prop VALUES (?, ?, ?, ?)", ROWS)
    return glue, duck


# --- expression AST: each node renders to (multisql_sql, duck_sql) ---------


class E:
    def __init__(self, ms: str, dk: str):
        self.ms = ms
        self.dk = dk


def _bin(op):
    return lambda a, b: E(f"({a.ms} {op} {b.ms})", f"({a.dk} {op} {b.dk})")


def _fn(name_ms, name_dk=None):
    name_dk = name_dk or name_ms

    def build(*args):
        ms = ", ".join(a.ms for a in args)
        dk = ", ".join(a.dk for a in args)
        return E(f"{name_ms}({ms})", f"{name_dk}({dk})")

    return build


num_lit = st.integers(-5, 9).map(lambda n: E(str(n), str(n)))
num_col = st.sampled_from(["i", "j"]).map(lambda c: E(c, c))
str_lit = st.sampled_from(["'ab'", "''", "'XyZ'", "'b'"]).map(
    lambda s: E(s, s)
)
str_col = st.just(E("s", "s"))
small_n = st.integers(0, 5).map(lambda n: E(str(n), str(n)))


def num_expr(depth: int):
    base = num_lit | num_col
    if depth <= 0:
        return base
    sub = num_expr(depth - 1)
    strsub = str_expr(depth - 1)
    boolsub = bool_expr(depth - 1)
    return (
        base
        | st.tuples(sub, sub).map(lambda t: _bin("+")(*t))
        | st.tuples(sub, sub).map(lambda t: _bin("-")(*t))
        | st.tuples(sub, sub).map(lambda t: _bin("*")(*t))
        | st.tuples(sub, sub).map(lambda t: _fn("IFNULL", "coalesce")(*t))
        | st.tuples(sub, sub).map(lambda t: _fn("NULLIF", "nullif")(*t))
        | strsub.map(lambda s: E(f"LEN({s.ms})", f"strlen({s.dk})"))
        | st.tuples(boolsub, sub, sub).map(
            lambda t: E(
                f"IIF({t[0].ms}, {t[1].ms}, {t[2].ms})",
                f"(CASE WHEN {t[0].dk} THEN {t[1].dk} ELSE {t[2].dk} END)",
            )
        )
        | st.tuples(boolsub, sub, sub).map(
            lambda t: E(
                f"(CASE WHEN {t[0].ms} THEN {t[1].ms} ELSE {t[2].ms} END)",
                f"(CASE WHEN {t[0].dk} THEN {t[1].dk} ELSE {t[2].dk} END)",
            )
        )
    )


def str_expr(depth: int):
    base = str_lit | str_col
    if depth <= 0:
        return base
    sub = str_expr(depth - 1)
    return (
        base
        | sub.map(lambda s: _fn("UPPER", "upper")(s))
        | sub.map(lambda s: _fn("LOWER", "lower")(s))
        | st.tuples(sub, sub).map(
            lambda t: E(f"({t[0].ms} || {t[1].ms})", f"({t[0].dk} || {t[1].dk})")
        )
        | st.tuples(sub, str_lit, str_lit).map(
            lambda t: _fn("REPLACE", "replace")(*t)
        )
        | st.tuples(sub, small_n).map(lambda t: _fn("LEFT", "left")(*t))
        | st.tuples(sub, small_n).map(lambda t: _fn("RIGHT", "right")(*t))
    )


def bool_expr(depth: int):
    cmps = st.sampled_from(["=", "!=", "<", "<=", ">", ">="])
    sub_n = num_expr(max(0, depth - 1))
    base = st.tuples(sub_n, cmps, sub_n).map(
        lambda t: E(
            f"({t[0].ms} {t[1]} {t[2].ms})", f"({t[0].dk} {t[1]} {t[2].dk})"
        )
    ) | st.sampled_from(["i", "j", "s"]).flatmap(
        lambda c: st.sampled_from(["IS NULL", "IS NOT NULL"]).map(
            lambda op: E(f"({c} {op})", f"({c} {op})")
        )
    )
    if depth <= 0:
        return base
    sub = bool_expr(depth - 1)
    return (
        base
        | st.tuples(sub, sub).map(lambda t: _bin("AND")(*t))
        | st.tuples(sub, sub).map(lambda t: _bin("OR")(*t))
        | sub.map(lambda b: E(f"(NOT {b.ms})", f"(NOT {b.dk})"))
        | st.tuples(sub_n, num_lit, num_lit).map(
            lambda t: E(
                f"({t[0].ms} BETWEEN {t[1].ms} AND {t[2].ms})",
                f"({t[0].dk} BETWEEN {t[1].dk} AND {t[2].dk})",
            )
        )
    )


any_expr = num_expr(3) | str_expr(3)


def _agg_item(k: int):
    """Aggregates restricted to cross-engine-exact outputs: int sums,
    min/max, counts (floats excluded — summation order differs)."""
    sub = num_expr(1)
    return st.one_of(
        sub.map(lambda e: E(f"SUM({e.ms}) AS a{k}", f"SUM({e.dk}) AS a{k}")),
        sub.map(lambda e: E(f"MIN({e.ms}) AS a{k}", f"MIN({e.dk}) AS a{k}")),
        sub.map(lambda e: E(f"MAX({e.ms}) AS a{k}", f"MAX({e.dk}) AS a{k}")),
        sub.map(
            lambda e: E(f"COUNT({e.ms}) AS a{k}", f"COUNT({e.dk}) AS a{k}")
        ),
        st.just(E(f"COUNT(1) AS a{k}", f"COUNT(1) AS a{k}")),
    )


group_key = st.sampled_from(
    [
        ("i", "i"),
        ("j", "j"),
        ("s", "s"),
        ("b", "b"),
        ("(i + j)", "(i + j)"),
        ("(i IS NULL)", "(i IS NULL)"),
    ]
).map(lambda t: E(*t))


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    key=group_key,
    aggs=st.lists(
        st.integers(0, 3), min_size=1, max_size=3, unique=True
    ).flatmap(
        lambda ks: st.tuples(*[_agg_item(k) for k in ks])
    ),
)
def test_groupby_parity(engines, key, aggs):
    """Random GROUP BY queries (grouping on expressions, NULL groups,
    multiple aggregates) must agree with DuckDB row-for-row."""
    glue, duck = engines
    ms = ", ".join(a.ms for a in aggs)
    dk = ", ".join(a.dk for a in aggs)
    payload = glue.execute(
        f"SELECT {key.ms} AS g, {ms} FROM prop GROUP BY {key.ms}"
    )
    rel = duck.execute(
        f"SELECT {key.dk} AS g, {dk} FROM prop GROUP BY {key.dk}"
    )
    duck_rows = rel.fetchall()
    cols = [d[0] for d in rel.description]
    assert canon_rows(payload.labels, payload.rows) == canon_rows(
        cols, duck_rows
    ), f"\nkey: {key.ms}\naggs: {ms}"


@settings(
    max_examples=40,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(exprs=st.lists(any_expr, min_size=1, max_size=6))
def test_expression_parity(engines, exprs):
    glue, duck = engines
    ms_items = ", ".join(f"({e.ms}) AS c{k}" for k, e in enumerate(exprs))
    dk_items = ", ".join(f"({e.dk}) AS c{k}" for k, e in enumerate(exprs))
    payload = glue.execute(f"SELECT {ms_items} FROM prop")
    duck_rel = duck.execute(f"SELECT {dk_items} FROM prop")
    duck_rows = duck_rel.fetchall()
    cols = [d[0] for d in duck_rel.description]
    got = canon_rows(payload.labels, payload.rows)
    want = canon_rows(cols, duck_rows)
    assert got == want, f"\nMS:  {ms_items}\nDK:  {dk_items}"


# --- QUALIFY equivalence: engine rewrite vs DuckDB native QUALIFY ----------


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fn=st.sampled_from(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"]),
    part=st.sampled_from(["b", "j % 2", ""]),
    order=st.sampled_from(["i", "j DESC", "s"]),
    k=st.integers(1, 4),
)
def test_qualify_parity(engines, fn, part, order, k):
    """The engine's QUALIFY rewrite (nested windowed select) must agree
    with DuckDB's native QUALIFY for random window predicates.  The
    ORDER BY carries no total tie-break on purpose for RANK/DENSE_RANK
    (ties produce identical rank sets on both engines); ROW_NUMBER gets
    the tie-break to keep it deterministic."""
    # Spark and DuckDB disagree on default NULL placement (ASC: NULLS
    # FIRST vs LAST), so the generator pins it explicitly — that
    # divergence is Spark-vs-DuckDB, not the QUALIFY rewrite under test
    order = f"{order} NULLS LAST"
    if fn == "ROW_NUMBER()":
        order += (
            ", i NULLS LAST, j NULLS LAST, s NULLS LAST"
        )
    pb = f"PARTITION BY {part} " if part else ""
    sql = (
        f"SELECT i, j, s, b FROM prop "
        f"QUALIFY {fn} OVER ({pb}ORDER BY {order}) <= {k}"
    )
    glue, duck = engines
    cols = ["i", "j", "s", "b"]
    ours = canon_rows(cols, glue.execute(sql).rows)
    theirs = canon_rows(cols, duck.execute(sql).fetchall())
    assert ours == theirs
