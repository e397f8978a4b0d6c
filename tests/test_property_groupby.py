"""Property-based GROUP BY / aggregate / HAVING parity: hypothesis draws
grouping expressions, aggregate lists, and HAVING predicates; the query
runs through the engine's dialect shim + Spark AND through DuckDB, and
the multisets must agree exactly.

This pins SURVEY §2.4 semantics across the random surface — NULLs form
one group, COUNT(col) skips NULLs (the intended semantics of the
reference's `aggregate.rs:15-23`, whose null-counting accumulator arm is
a documented bug we do not reproduce, DIVERGENCES #9), HAVING filters
post-aggregation with aggregates allowed (superset of the reference's
pre-group HAVING, DIVERGENCES #11), and grouping by computed
expressions (`select/mod.rs` GROUP BY evaluation) — where single-example
corpus tests would miss interactions (e.g. expression key + NULL group +
aggregate HAVING).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from multisql_spark.session import MultiSQLSession
from multisql_spark.testing import canon_rows

# duplicates + NULLs in every column so groups collide and null groups
# and null-skipping aggregates are always exercised
ROWS = [
    (1, 10, "ab", True),
    (1, 11, "ab", False),
    (2, 20, "cd", True),
    (2, None, "CD", None),
    (3, 30, None, False),
    (None, 40, "ef", True),
    (None, None, "ab", None),
    (5, 50, "gh", False),
    (5, 55, "gh", True),
    (6, -10, "", None),
    (7, 70, "ab", True),
    (2, 21, "cd", False),
]


@pytest.fixture(scope="module")
def engines(spark):
    import duckdb

    glue = MultiSQLSession(spark)
    glue.execute("DROP TABLE IF EXISTS gp")
    glue.execute(
        "CREATE TABLE gp (i INTEGER NULL, j INTEGER NULL, s TEXT NULL,"
        " b BOOLEAN NULL)"
    )
    for i, j, s, b in ROWS:
        vals = ", ".join(
            "NULL"
            if v is None
            else (
                f"'{v}'"
                if isinstance(v, str)
                else str(v).upper() if isinstance(v, bool) else str(v)
            )
            for v in (i, j, s, b)
        )
        glue.execute(f"INSERT INTO gp (i, j, s, b) VALUES ({vals})")
    duck = duckdb.connect()
    duck.execute("CREATE TABLE gp (i BIGINT, j BIGINT, s TEXT, b BOOLEAN)")
    duck.executemany("INSERT INTO gp VALUES (?, ?, ?, ?)", ROWS)
    return glue, duck


GROUP_KEYS = [
    "i",
    "s",
    "b",
    "i % 3",
    "UPPER(s)",
    "LEFT(s, 1)",
    "CASE WHEN i > 2 THEN 'hi' ELSE 'lo' END",
    "IFNULL(i, -1)",
]
AGGREGATES = [
    "COUNT(1)",
    "COUNT(i)",
    "COUNT(s)",
    "COUNT(DISTINCT i)",
    "SUM(i)",
    "SUM(i + j)",
    "MIN(i)",
    "MAX(j)",
    "MIN(s)",
    "MAX(s)",
    "SUM(CASE WHEN b THEN 1 ELSE 0 END)",
    # AVG is deliberately NOT DuckDB-parity: the engine reproduces the
    # reference's SUM/COUNT integer-division AVG (recipe/new.rs:117-129,
    # DIVERGENCES #2/#3) — pinned in test_avg_integer_division below.
]
HAVINGS = [
    None,
    "COUNT(1) > 1",
    "SUM(i) > 3",
    "MIN(i) IS NOT NULL",
    "MAX(j) < 40 OR MAX(j) IS NULL",
    "COUNT(i) = COUNT(1)",
]


@given(
    keys=st.lists(
        st.sampled_from(GROUP_KEYS), min_size=1, max_size=2, unique=True
    ),
    aggs=st.lists(
        st.sampled_from(AGGREGATES), min_size=1, max_size=3, unique=True
    ),
    having=st.sampled_from(HAVINGS),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_groupby_parity(engines, keys, aggs, having):
    glue, duck = engines
    key_items = ", ".join(
        f"{k} AS g{n}" for n, k in enumerate(keys)
    )
    agg_items = ", ".join(f"{a} AS a{n}" for n, a in enumerate(aggs))
    sql = (
        f"SELECT {key_items}, {agg_items} FROM gp "
        f"GROUP BY {', '.join(keys)}"
    )
    if having is not None:
        sql += f" HAVING {having}"
    pay = glue.execute(sql)
    rel = duck.execute(sql)
    got = canon_rows(pay.labels, pay.rows)
    want = canon_rows([d[0] for d in rel.description], rel.fetchall())
    assert got == want, sql


def test_avg_integer_division(engines):
    """AVG(int) is the reference's plan-time SUM/COUNT decomposition with
    integer division (recipe/new.rs:117-129) — truncating toward zero on
    negative sums like Rust i64 `/` (NOT floor), surfaced DOUBLE-typed by
    the runtime div CASE (DIVERGENCES #3).  DuckDB emulates it as
    TRUNC(SUM/COUNT)."""
    glue, duck = engines
    glue.execute("DROP TABLE IF EXISTS avgt")
    glue.execute("CREATE TABLE avgt (g TEXT NULL, i INTEGER NULL)")
    rows = [("p", 1), ("p", 2), ("n", -7), ("n", 2), ("z", None), ("z", 5)]
    for g, i in rows:
        glue.execute(
            "INSERT INTO avgt VALUES ("
            f"'{g}', {'NULL' if i is None else i})"
        )
    duck.execute("DROP TABLE IF EXISTS avgt")
    duck.execute("CREATE TABLE avgt (g TEXT, i BIGINT)")
    duck.executemany("INSERT INTO avgt VALUES (?, ?)", rows)
    pay = glue.execute("SELECT g, AVG(i) AS a FROM avgt GROUP BY g")
    rel = duck.execute(
        "SELECT g, CAST(TRUNC(CAST(SUM(i) AS DOUBLE) / COUNT(i)) AS DOUBLE)"
        " AS a FROM avgt GROUP BY g"
    )
    got = canon_rows(pay.labels, pay.rows)
    want = canon_rows([d[0] for d in rel.description], rel.fetchall())
    # p: 3/2 -> 1.0;  n: -5/2 -> -2.0 (trunc, not floor's -3.0);  z: 5/1
    assert got == want
    assert ("f:-2.0", "s:n") in got


@given(
    agg=st.sampled_from(AGGREGATES),
    where=st.sampled_from(
        [None, "i > 1", "j IS NOT NULL", "b", "s <> 'ab'"]
    ),
)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_global_aggregate_parity(engines, agg, where):
    """Implicit global group (no GROUP BY): one row even over an empty
    filtered input, with SQL-standard NULL/0 identity per aggregate."""
    glue, duck = engines
    sql = f"SELECT {agg} AS v FROM gp"
    if where is not None:
        sql += f" WHERE {where}"
    pay = glue.execute(sql)
    rel = duck.execute(sql)
    got = canon_rows(pay.labels, pay.rows)
    want = canon_rows([d[0] for d in rel.description], rel.fetchall())
    assert got == want, sql
