"""Reference test-corpus port: the queries + expected semantics from
/root/reference/tests/ re-run against our engine (SURVEY §5 strategy).

Row-set comparisons are order-insensitive unless ORDER BY is present,
mirroring the reference's assert_select! discipline."""

from __future__ import annotations

import pytest

from multisql_spark.session import EngineError, MultiSQLSession


@pytest.fixture(scope="module")
def glue(spark):
    return MultiSQLSession(spark)


def rows(glue, sql):
    return sorted(glue.execute(sql).rows)


def count1(glue, sql):
    return glue.execute(sql).rows[0][0]


# --- tests/ability/base/filter/arithmetic.rs -------------------------------


def test_filter_arithmetic_int_division(glue):
    glue.execute("DROP TABLE IF EXISTS Arith")
    glue.execute("CREATE TABLE Arith (id INTEGER, num INTEGER, name TEXT)")
    glue.execute(
        "INSERT INTO Arith (id, num, name) VALUES"
        " (1, 6, 'A'), (2, 8, 'B'), (3, 4, 'C'), (4, 2, 'D'), (5, 3, 'E')"
    )
    cases = [
        ("SELECT COUNT(1) c FROM Arith WHERE id = 1 + 1", 1),
        ("SELECT COUNT(1) c FROM Arith WHERE id < id + 1", 5),
        ("SELECT COUNT(1) c FROM Arith WHERE id < num + id", 5),
        ("SELECT COUNT(1) c FROM Arith WHERE id + 1 < 5", 3),
        ("SELECT COUNT(1) c FROM Arith WHERE id = 2 - 1", 1),
        ("SELECT COUNT(1) c FROM Arith WHERE 2 - 1 = id", 1),
        ("SELECT COUNT(1) c FROM Arith WHERE id > id - 1", 5),
        ("SELECT COUNT(1) c FROM Arith WHERE id > id - num", 5),
        ("SELECT COUNT(1) c FROM Arith WHERE 5 - id < 3", 3),
        ("SELECT COUNT(1) c FROM Arith WHERE id = 2 * 2", 1),
        ("SELECT COUNT(1) c FROM Arith WHERE 3 * id < 4", 1),
        # reference integer division (binary.rs:66-92): 5/2 = 2
        ("SELECT COUNT(1) c FROM Arith WHERE id = 5 / 2", 1),
        ("SELECT COUNT(1) c FROM Arith WHERE id > id / 2", 5),
        ("SELECT COUNT(1) c FROM Arith WHERE id > num / id", 3),
        ("SELECT COUNT(1) c FROM Arith WHERE 10 / id = 2", 2),
        ("SELECT COUNT(1) c FROM Arith WHERE 1 + 1 = id", 1),
    ]
    for sql, expected in cases:
        assert count1(glue, sql) == expected, sql
    glue.execute("UPDATE Arith SET id = id + 1")
    glue.execute("UPDATE Arith SET id = id - 1 WHERE id != 6")
    assert count1(glue, "SELECT COUNT(1) c FROM Arith WHERE id <= 2") == 2
    glue.execute("UPDATE Arith SET id = id * 2")
    glue.execute("UPDATE Arith SET id = id / 2")
    assert count1(glue, "SELECT COUNT(1) c FROM Arith WHERE id <= 2") == 2


# --- tests/ability/index/filter/general.rs ---------------------------------


def test_index_filter_general(glue):
    glue.execute("DROP TABLE IF EXISTS indexed")
    glue.execute("CREATE TABLE indexed (a INTEGER)")
    glue.execute("INSERT INTO indexed (a) VALUES (1),(2),(3),(3),(4),(100)")
    glue.execute("CREATE INDEX index_a ON indexed (a)")
    assert rows(glue, "SELECT a FROM indexed") == [
        (1,), (2,), (3,), (3,), (4,), (100,),
    ]
    # duplicates preserved, identical with and without the index
    assert rows(glue, "SELECT a FROM indexed WHERE a > 2") == [
        (3,), (3,), (4,), (100,),
    ]
    assert rows(glue, "SELECT a FROM indexed WHERE a < 4") == [
        (1,), (2,), (3,), (3,),
    ]
    assert rows(glue, "SELECT a FROM indexed WHERE a >= 3") == [
        (3,), (3,), (4,), (100,),
    ]
    assert rows(glue, "SELECT a FROM indexed WHERE a <= 3") == [
        (1,), (2,), (3,), (3,),
    ]
    assert rows(glue, "SELECT a FROM indexed WHERE a > 1 + 1") == [
        (3,), (3,), (4,), (100,),
    ]


# --- tests/functionality/statement/data_query/nullable.rs ------------------


def test_nullable(glue):
    glue.execute("DROP TABLE IF EXISTS NullTest")
    glue.execute(
        "CREATE TABLE NullTest (id INTEGER NULL, num INTEGER, name TEXT)"
    )
    glue.execute(
        "INSERT INTO NullTest (id, num, name) VALUES"
        " (NULL, 2, 'Hello'), (1, 9, 'World'), (3, 4, 'Great')"
    )
    assert rows(
        glue, "SELECT id, num FROM NullTest WHERE id IS NULL"
    ) == [(None, 2)]
    assert rows(
        glue,
        "SELECT id, num FROM NullTest WHERE id IS NULL AND name = 'Hello'",
    ) == [(None, 2)]
    assert rows(
        glue, "SELECT id, num FROM NullTest WHERE id IS NOT NULL"
    ) == [(1, 9), (3, 4)]
    # NULL arithmetic propagates (reference binary.rs:68-70)
    assert rows(glue, "SELECT id + 1 AS x FROM NullTest WHERE id IS NULL") == [
        (None,)
    ]


# --- tests/ability/column_option/* -----------------------------------------


def test_column_option_types(glue):
    glue.execute("DROP TABLE IF EXISTS Typed")
    glue.execute(
        "CREATE TABLE Typed (b BOOLEAN, i INTEGER, f FLOAT, t TEXT,"
        " ts TIMESTAMP NULL)"
    )
    glue.execute(
        "INSERT INTO Typed (b, i, f, t, ts) VALUES"
        " (TRUE, 7, 1.5, 'x', CONVERT('TIMESTAMP', '2024-01-02', 022))"
    )
    out = glue.execute("SELECT b, i, f, t, YEAR(ts) AS y FROM Typed")
    assert out.rows == [(True, 7, 1.5, "x", 2024)]
    # I64→F64 widening on insert (reference value/mod.rs:232-260)
    glue.execute("INSERT INTO Typed (b, i, f, t, ts) VALUES"
                 " (FALSE, 1, 2, 'y', NULL)")
    assert sorted(glue.execute("SELECT f FROM Typed").rows) == [(1.5,), (2.0,)]


def test_unique_violation_on_update(glue):
    glue.execute("DROP TABLE IF EXISTS Uniq")
    glue.execute("CREATE TABLE Uniq (a INTEGER UNIQUE, b INTEGER)")
    glue.execute("INSERT INTO Uniq (a, b) VALUES (1, 1), (2, 2)")
    with pytest.raises(EngineError):
        glue.execute("UPDATE Uniq SET a = 1 WHERE b = 2")
    # state unchanged after rejected update? reference aborts statement
    assert rows(glue, "SELECT a FROM Uniq") == [(1,), (2,)]


def test_default_expressions(glue):
    glue.execute("DROP TABLE IF EXISTS Dft")
    glue.execute(
        "CREATE TABLE Dft (id INTEGER, v INTEGER DEFAULT 10 + 5, t TEXT"
        " DEFAULT UPPER('ab'))"
    )
    glue.execute("INSERT INTO Dft (id) VALUES (1)")
    assert rows(glue, "SELECT id, v, t FROM Dft") == [(1, 15, "AB")]


# --- tests/functionality set operations ------------------------------------


def test_set_operations_and_misalignment(glue):
    glue.execute("DROP TABLE IF EXISTS SetA; DROP TABLE IF EXISTS SetB")
    glue.execute("CREATE TABLE SetA (a INTEGER); CREATE TABLE SetB (a INTEGER)")
    glue.execute("INSERT INTO SetA (a) VALUES (1),(2),(2),(3)")
    glue.execute("INSERT INTO SetB (a) VALUES (2),(3),(4)")
    assert rows(glue, "SELECT a FROM SetA UNION SELECT a FROM SetB") == [
        (1,), (2,), (3,), (4,),
    ]
    assert len(rows(glue, "SELECT a FROM SetA UNION ALL SELECT a FROM SetB")) == 7
    assert rows(glue, "SELECT a FROM SetA EXCEPT SELECT a FROM SetB") == [(1,)]
    assert rows(glue, "SELECT a FROM SetA INTERSECT SELECT a FROM SetB") == [
        (2,), (3,),
    ]
    # column-count misalignment errors (reference set_expr.rs:67-69)
    with pytest.raises(Exception):
        glue.execute("SELECT a, a FROM SetA UNION SELECT a FROM SetB")


# --- tests/query/with.rs (CTEs) + values -----------------------------------


def test_cte_and_values(glue):
    out = glue.execute(
        "WITH nums AS (SELECT * FROM VALUES (1),(2),(3) AS t(n)),"
        " doubled AS (SELECT n * 2 AS d FROM nums)"
        " SELECT SUM(d) AS s FROM doubled"
    )
    assert out.rows == [(12,)]


# --- tests/misc error shapes ----------------------------------------------


def test_error_shapes(glue):
    with pytest.raises(EngineError):
        glue.execute("SELECT * FROM no_such_table_xyz_insert")
    with pytest.raises(EngineError):
        glue.execute("INSERT INTO no_such_table_xyz_insert (a) VALUES (1)")
    with pytest.raises(EngineError):
        glue.execute("CREATE TABLE Uniq (a INTEGER)")  # already exists
    with pytest.raises(EngineError):
        glue.execute("SELECT totally_bogus_column FROM Uniq")
