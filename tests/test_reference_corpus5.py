"""Reference test-corpus port, part 5 — the residual suites:
tests/ability/column_option/default.rs, tests/ability/column_option/
types.rs, tests/ability/index/create_table.rs, tests/api/csv.rs,
tests/api/insert.rs, tests/functionality/statement/data_query/select.rs,
tests/functionality/statement/simple_insert.rs,
tests/functionality/statement/truncate.rs, tests/misc/cast.rs.

(tests/functionality/statement/data_query/set_operation/{union,except,
intersect}.rs are ported in test_reference_corpus4.py::
test_values_set_operations; tests/query/function/func_timestamp.rs in
test_reference_functions.py::test_func_timestamp; the
tests/databases/{memory,csv,sheet}.rs backend registry — including its
per-backend exception lists — is mirrored by test_backend_matrix.py.)
"""

from __future__ import annotations

import pytest

from multisql_spark.session import EngineError, MultiSQLSession


@pytest.fixture(scope="module")
def glue(spark):
    return MultiSQLSession(spark)


# --- tests/ability/column_option/default.rs ---------------------------------


def test_column_option_default(glue):
    glue.execute(
        "CREATE TABLE DefT (id INTEGER DEFAULT 1, num INTEGER,"
        " flag BOOLEAN NULL DEFAULT false)"
    )
    glue.execute("INSERT INTO DefT VALUES (8, 80, true)")
    glue.execute("INSERT INTO DefT (num) VALUES (10)")
    glue.execute("INSERT INTO DefT (num, id) VALUES (20, 2)")
    glue.execute(
        "INSERT INTO DefT (num, flag) VALUES (30, NULL), (40, true)"
    )
    out = glue.execute("SELECT * FROM DefT WHERE flag IS NOT NULL")
    assert sorted(out.rows) == [
        (1, 10, False),
        (1, 40, True),
        (2, 20, False),
        (8, 80, True),
    ]
    glue.execute("DROP TABLE DefT")


# --- tests/ability/column_option/types.rs -----------------------------------


def test_column_option_types_errors(glue):
    glue.execute("CREATE TABLE TableB (id BOOLEAN)")
    glue.execute(
        "CREATE TABLE TableC (uid INTEGER, null_val INTEGER NULL)"
    )
    glue.execute("INSERT INTO TableB VALUES (FALSE)")
    glue.execute("INSERT INTO TableC VALUES (1, NULL)")

    # IncompatibleDataType: I64 into BOOLEAN via INSERT SELECT
    with pytest.raises(EngineError):
        glue.execute("INSERT INTO TableB SELECT uid FROM TableC")
    # IncompatibleDataType: Str into INTEGER ("A" is a string literal in
    # the reference dialect)
    with pytest.raises(EngineError):
        glue.execute('INSERT INTO TableC (uid) VALUES ("A")')
    # NullValueOnNotNullField
    with pytest.raises(EngineError):
        glue.execute("INSERT INTO TableC VALUES (NULL, 30)")
    # WrongNumberOfValues: one select item for a two-column table
    with pytest.raises(EngineError):
        glue.execute("INSERT INTO TableC SELECT null_val FROM TableC")
    # IncompatibleDataType on UPDATE: Bool into INTEGER
    with pytest.raises(EngineError):
        glue.execute("UPDATE TableC SET uid = TRUE")
    # NullValueOnNotNullField on UPDATE
    with pytest.raises(EngineError):
        glue.execute("UPDATE TableC SET uid = NULL")
    # the failed statements must not have mutated state
    assert glue.execute("SELECT * FROM TableC").rows == [(1, None)]
    glue.execute("DROP TABLE TableB")
    glue.execute("DROP TABLE TableC")


# --- tests/ability/index/create_table.rs ------------------------------------


def test_primary_key_accepted(glue):
    """The reference only asserts that PRIMARY KEY parses on CREATE
    (the inline-INDEX forms are commented out as TODO there)."""
    glue.execute("CREATE TABLE basic_keyed (a INTEGER PRIMARY KEY)")
    glue.execute("INSERT INTO basic_keyed VALUES (1)")
    assert glue.execute("SELECT a FROM basic_keyed").rows == [(1,)]
    glue.execute("DROP TABLE basic_keyed")


# --- tests/api/csv.rs + tests/api/insert.rs ---------------------------------


def test_select_as_csv_api(glue):
    glue.execute("CREATE TABLE basic5 (a INTEGER)")
    glue.execute("INSERT INTO basic5 (a) VALUES (1)")
    assert glue.select_as_csv("SELECT * FROM basic5") == "a\n1\n"
    glue.execute("INSERT INTO basic5 VALUES (2),(3),(4),(5)")
    assert (
        glue.select_as_csv("SELECT * FROM basic5 ORDER BY a")
        == "a\n1\n2\n3\n4\n5\n"
    )
    glue.execute("DROP TABLE basic5")


# --- tests/functionality/statement/data_query/select.rs,
#     .../simple_insert.rs, .../truncate.rs ----------------------------------


def test_simple_statement_smoke(glue):
    glue.execute("CREATE TABLE basic6 (a INTEGER)")
    glue.execute("INSERT INTO basic6 (a) VALUES (1)")
    assert glue.execute("SELECT a FROM basic6").rows == [(1,)]
    glue.execute("TRUNCATE TABLE basic6")
    assert glue.execute("SELECT a FROM basic6").rows == []
    glue.execute("DROP TABLE basic6")


# --- tests/misc/cast.rs -----------------------------------------------------


def test_value_cast_matrix(glue):
    """The reference's Value::cast_datatype matrix (tests/misc/cast.rs)
    expressed as CAST expressions through the engine."""

    def one(expr):
        return glue.execute(f"VALUES ({expr})").rows[0][0]

    # Same-type casts
    assert one("CAST(TRUE AS BOOLEAN)") is True
    assert one("CAST('a' AS TEXT)") == "a"
    assert one("CAST(1 AS INTEGER)") == 1
    assert one("CAST(1.0 AS FLOAT)") == 1.0
    # → Boolean
    assert one("CAST('true' AS BOOLEAN)") is True
    assert one("CAST('false' AS BOOLEAN)") is False
    assert one("CAST(1 AS BOOLEAN)") is True
    assert one("CAST(0 AS BOOLEAN)") is False
    assert one("CAST(1.0 AS BOOLEAN)") is True
    assert one("CAST(0.0 AS BOOLEAN)") is False
    assert one("CAST(NULL AS BOOLEAN)") is None
    # → Integer (truncation, bool mapping, string parse)
    assert one("CAST(TRUE AS INTEGER)") == 1
    assert one("CAST(FALSE AS INTEGER)") == 0
    assert one("CAST(1.1 AS INTEGER)") == 1
    assert one("CAST('11' AS INTEGER)") == 11
    assert one("CAST(NULL AS INTEGER)") is None
    # → Float
    assert one("CAST(TRUE AS FLOAT)") == 1.0
    assert one("CAST(FALSE AS FLOAT)") == 0.0
    assert one("CAST(1 AS FLOAT)") == 1.0
    assert one("CAST('11' AS FLOAT)") == 11.0
    assert one("CAST(NULL AS FLOAT)") is None
    # → Text
    assert one("CAST(TRUE AS TEXT)") == "true"
    assert one("CAST(FALSE AS TEXT)") == "false"
    assert one("CAST(11 AS TEXT)") == "11"
    assert one("CAST(1.0 AS TEXT)") == "1.0"
    assert one("CAST(NULL AS TEXT)") is None
