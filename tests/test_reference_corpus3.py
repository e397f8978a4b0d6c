"""Reference test-corpus port, part 3: base/basic.rs, filter/gt_lt.rs,
functionality set.rs (session variables), functionality values.rs /
simple_insert.rs-style content."""

from __future__ import annotations

import pytest

from multisql_spark.session import MultiSQLSession


@pytest.fixture(scope="module")
def glue(spark):
    return MultiSQLSession(spark)


def nrows(glue, sql):
    return len(glue.execute(sql).rows)


# --- tests/ability/base/basic.rs -------------------------------------------


def test_basic(glue):
    for t in ("basic_0", "basic_1", "basic_a"):
        glue.execute(f"DROP TABLE IF EXISTS {t}")
    for n in (0, 1):
        glue.execute(
            f"CREATE TABLE basic_{n} (id INTEGER, num INTEGER, name TEXT)"
        )
    glue.execute(
        "INSERT INTO basic_0 (id, num, name) VALUES (1, 2, 'Hello')"
    )
    glue.execute(
        "INSERT INTO basic_0 (id, num, name) VALUES (1, 9, 'World')"
    )
    glue.execute(
        "INSERT INTO basic_0 (id, num, name) VALUES (3, 4, 'Great'),"
        " (4, 7, 'Job')"
    )
    glue.execute(
        "INSERT INTO basic_1 (id, num, name)"
        " SELECT id, num, name FROM basic_0"
    )
    glue.execute("CREATE TABLE basic_a (id INTEGER)")
    glue.execute("INSERT INTO basic_a (id) SELECT id FROM basic_0")
    assert sorted(glue.execute("SELECT * FROM basic_a").rows) == [
        (1,), (1,), (3,), (4,),
    ]
    expected = [
        (1, 2, "Hello"), (1, 9, "World"), (3, 4, "Great"), (4, 7, "Job"),
    ]
    for t in ("basic_0", "basic_1"):
        out = glue.execute(f"SELECT id, num, name FROM {t}")
        assert out.labels == ["id", "num", "name"]
        assert sorted(out.rows) == expected
    glue.execute("UPDATE basic_0 SET id = 2")
    assert glue.execute("SELECT id FROM basic_0").rows == [(2,)] * 4
    assert sorted(glue.execute("SELECT id, num FROM basic_0").rows) == [
        (2, 2), (2, 4), (2, 7), (2, 9),
    ]


# --- tests/ability/base/filter/gt_lt.rs ------------------------------------


GT_LT_CASES = [
    (1, "SELECT * FROM Operator WHERE id < 2"),
    (2, "SELECT * FROM Operator WHERE id <= 2"),
    (3, "SELECT * FROM Operator WHERE id > 2"),
    (4, "SELECT * FROM Operator WHERE id >= 2"),
    (1, "SELECT * FROM Operator WHERE 2 > id"),
    (2, "SELECT * FROM Operator WHERE 2 >= id"),
    (3, "SELECT * FROM Operator WHERE 2 < id"),
    (4, "SELECT * FROM Operator WHERE 2 <= id"),
    (5, "SELECT * FROM Operator WHERE 1 < 3"),
    (5, "SELECT * FROM Operator WHERE 3 >= 3"),
    (0, "SELECT * FROM Operator WHERE 3 > 3"),
    (2, "SELECT * FROM Operator WHERE name < 'Azzzzzzzzzz'"),
    (1, "SELECT * FROM Operator WHERE name < 'Az'"),
    (5, "SELECT * FROM Operator WHERE name < 'zz'"),
    (5, "SELECT * FROM Operator WHERE 'aa' < 'zz'"),
    (4, "SELECT * FROM Operator WHERE 'Romeo' >= name"),
]


@pytest.fixture(scope="module")
def operator_table(glue):
    glue.execute("DROP TABLE IF EXISTS Operator")
    glue.execute("CREATE TABLE Operator (id INTEGER, name TEXT)")
    glue.execute(
        "INSERT INTO Operator (id, name) VALUES (1, 'Abstract'),"
        " (2, 'Azzzz'), (3, 'July'), (4, 'Romeo'), (5, 'Trade')"
    )
    return glue


@pytest.mark.parametrize("expected,sql", GT_LT_CASES)
def test_gt_lt(operator_table, expected, sql):
    assert nrows(operator_table, sql) == expected, sql


# --- tests/functionality/statement/set.rs ----------------------------------


def test_set_variable_statement(glue):
    glue.execute("DROP TABLE IF EXISTS basic")
    glue.execute("CREATE TABLE basic (a INTEGER)")
    glue.execute("INSERT INTO basic (a) VALUES (1)")
    glue.execute("SET @variable = 1")
    out = glue.execute("VALUES (@variable)")
    assert out.labels == ["unnamed_0"]
    assert out.rows == [(1,)]
    assert glue.execute(
        "SELECT a + @variable AS s FROM basic"
    ).rows == [(2,)]
    assert glue.execute(
        "SELECT a FROM basic WHERE @variable = 1"
    ).rows == [(1,)]
    assert glue.execute(
        "SELECT a FROM basic WHERE @variable = 0"
    ).rows == []


# --- tests/ability/column_option/auto_increment.rs -------------------------


def test_auto_increment_counter_semantics(glue):
    """Explicit ids don't consume the counter; duplicates are legal
    without UNIQUE (reference sled/auto_increment.rs)."""
    glue.execute("DROP TABLE IF EXISTS AITest")
    glue.execute(
        "CREATE TABLE AITest (id INTEGER AUTO_INCREMENT NOT NULL,"
        " name TEXT)"
    )
    glue.execute("INSERT INTO AITest (name) VALUES ('test1')")
    glue.execute("INSERT INTO AITest (name) VALUES ('test2'), ('test3')")
    glue.execute("INSERT INTO AITest (name, id) VALUES ('test4', NULL)")
    glue.execute("INSERT INTO AITest (name, id) VALUES ('test5', 6)")
    glue.execute("INSERT INTO AITest (name) VALUES ('test6')")
    glue.execute("INSERT INTO AITest (name) VALUES ('test7')")
    assert sorted(glue.execute("SELECT id, name FROM AITest").rows) == [
        (1, "test1"), (2, "test2"), (3, "test3"), (4, "test4"),
        (5, "test6"), (6, "test5"), (6, "test7"),
    ]
    glue.execute("DROP TABLE IF EXISTS AIUniq")
    glue.execute(
        "CREATE TABLE AIUniq (id INTEGER AUTO_INCREMENT NOT NULL UNIQUE,"
        " name TEXT)"
    )
    glue.execute(
        "INSERT INTO AIUniq (name, id) VALUES ('test1', NULL), ('test2', 3)"
    )
    assert sorted(glue.execute("SELECT id, name FROM AIUniq").rows) == [
        (1, "test1"), (3, "test2"),
    ]


# --- tests/functionality/statement/data_query/values.rs --------------------


def test_values_statement(glue):
    out = glue.execute("VALUES (1, 'a'), (2, 'b')")
    assert out.labels == ["unnamed_0", "unnamed_1"]
    assert sorted(out.rows) == [(1, "a"), (2, "b")]
