"""Reference test-corpus port, part 4: tests/ability/alter/* (table,
view, database), tests/misc/error.rs, tests/query/explain.rs.

The reference's 3-argument ``assert_error!``/``assert_success!`` macros
bind the expected value as a match-anything pattern (tests/util/mod.rs:
187-217), so only the 2-argument ``expect_err`` asserts and
``assert_select!`` row/label comparisons are load-bearing there; this
port asserts the stricter behavior our engine actually implements.
"""

from __future__ import annotations

import pytest

from multisql_spark.session import EngineError, MultiSQLSession


@pytest.fixture(scope="module")
def glue(spark):
    return MultiSQLSession(spark)


def rows(glue, sql):
    return glue.execute(sql).rows


# --- tests/ability/alter/table/alter_table.rs -------------------------------


def test_alter_table_corpus(glue):
    for t in ("Foo", "Bar"):
        glue.execute(f"DROP TABLE IF EXISTS {t}")
    glue.execute("CREATE TABLE Foo (id INTEGER)")
    glue.execute("INSERT INTO Foo VALUES (1), (2), (3)")
    assert sorted(rows(glue, "SELECT id FROM Foo")) == [(1,), (2,), (3,)]
    # AlterTableError::TableNotFound
    with pytest.raises(EngineError):
        glue.execute("ALTER TABLE Foo2 RENAME TO Bar")
    glue.execute("ALTER TABLE Foo RENAME TO Bar")
    assert sorted(rows(glue, "SELECT id FROM Bar")) == [(1,), (2,), (3,)]
    glue.execute("ALTER TABLE Bar RENAME COLUMN id TO new_id")
    assert sorted(rows(glue, "SELECT new_id FROM Bar")) == [
        (1,), (2,), (3,)
    ]
    # AlterTableError::RenamingColumnNotFound
    with pytest.raises(EngineError):
        glue.execute("ALTER TABLE Bar RENAME COLUMN hello TO idid")
    glue.execute("CREATE TABLE Foo (id INTEGER)")
    glue.execute("INSERT INTO Foo VALUES (1), (2)")
    # AlterTableError::DefaultValueRequired (non-empty table, no DEFAULT)
    with pytest.raises(EngineError):
        glue.execute("ALTER TABLE Foo ADD COLUMN amount INTEGER")
    # AlterTableError::AddingColumnAlreadyExists
    with pytest.raises(EngineError):
        glue.execute("ALTER TABLE Foo ADD COLUMN id INTEGER")
    # AlterError::UnsupportedDataType
    with pytest.raises(EngineError):
        glue.execute("ALTER TABLE Foo ADD COLUMN something SOMEWHAT")
    # AlterError::UnsupportedColumnOption
    with pytest.raises(EngineError):
        glue.execute(
            "ALTER TABLE Foo ADD COLUMN something INTEGER CHECK (true)"
        )
    # the reference's success assert here is vacuous and its later DROP
    # error shows the column was never added: a NOT-NULL-by-default column
    # on a non-empty table without DEFAULT cannot be added
    with pytest.raises(EngineError):
        glue.execute("ALTER TABLE Foo ADD COLUMN something FLOAT UNIQUE")
    glue.execute("ALTER TABLE Foo DROP COLUMN IF EXISTS something")
    # AlterTableError::DroppingColumnNotFound
    with pytest.raises(EngineError):
        glue.execute("ALTER TABLE Foo DROP COLUMN something")
    glue.execute("ALTER TABLE Foo DROP COLUMN IF EXISTS opt2")
    # nullable columns CAN be added to a non-empty table (rows get NULL)
    glue.execute("ALTER TABLE Foo ADD COLUMN opt BOOLEAN NULL")
    assert sorted(rows(glue, "SELECT id, opt FROM Foo")) == [
        (1, None), (2, None)
    ]


# --- tests/ability/alter/table/create_table.rs ------------------------------


def test_create_table_corpus(glue):
    for t in ("CreateTable1", "CreateTable2", "Gluery"):
        glue.execute(f"DROP TABLE IF EXISTS {t}")
    glue.execute(
        "CREATE TABLE CreateTable1 (id INTEGER NULL, num INTEGER,"
        " name TEXT)"
    )
    # CreateError::AlreadyExists
    with pytest.raises(EngineError):
        glue.execute(
            "CREATE TABLE CreateTable1 (id INTEGER NULL, num INTEGER,"
            " name TEXT)"
        )
    glue.execute(
        "CREATE TABLE IF NOT EXISTS CreateTable2 (id INTEGER NULL,"
        " num INTEGER, name TEXT)"
    )
    # IF NOT EXISTS tolerates a different column list (no-op)
    glue.execute(
        "CREATE TABLE IF NOT EXISTS CreateTable2 (id2 INTEGER NULL,)"
    )
    glue.execute("INSERT INTO CreateTable2 VALUES (NULL, 1, '1')")
    # AlterError::UnsupportedDataType
    with pytest.raises(EngineError):
        glue.execute("CREATE TABLE Gluery (id SOMEWHAT)")
    # AlterError::UnsupportedColumnOption
    with pytest.raises(EngineError):
        glue.execute("CREATE TABLE Gluery (id INTEGER CHECK (true))")


# --- tests/ability/alter/table/drop_table.rs --------------------------------


def test_drop_table_corpus(glue):
    glue.execute("DROP TABLE IF EXISTS DropTable")
    glue.execute(
        "CREATE TABLE DropTable (id INT, num INT, name TEXT)"
    )
    glue.execute(
        "INSERT INTO DropTable (id, num, name) VALUES (1, 2, 'Hello')"
    )
    assert len(rows(glue, "SELECT id, num, name FROM DropTable")) == 1
    glue.execute("DROP TABLE DropTable")
    # AlterError::TableNotFound
    with pytest.raises(EngineError):
        glue.execute("DROP TABLE DropTable")
    glue.execute("CREATE TABLE DropTable (id INT, num INT, name TEXT)")
    glue.execute("DROP TABLE IF EXISTS DropTable")
    glue.execute("DROP TABLE IF EXISTS DropTable")
    # FetchError::TableNotFound
    with pytest.raises(EngineError):
        glue.execute("SELECT id, num, name FROM DropTable")
    glue.execute("CREATE TABLE DropTable (id INT, num INT, name TEXT)")
    assert rows(glue, "SELECT id, num, name FROM DropTable") == []


# --- tests/ability/alter/view/create_view.rs --------------------------------


def test_create_view_corpus(glue):
    glue.execute("DROP TABLE IF EXISTS basic_v")
    glue.execute("CREATE TABLE basic_v (a INTEGER)")
    glue.execute("INSERT INTO basic_v (a) VALUES (1)")
    # parenthesized view body
    glue.execute(
        "CREATE VIEW basic_view AS (SELECT a FROM basic_v)"
    )
    assert rows(glue, "SELECT a FROM basic_view") == [(1,)]
    glue.execute("DROP VIEW basic_view")


# --- tests/ability/alter/database/create_database.rs ------------------------


def test_create_database_corpus(glue, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("otherdb")) + "/"
    # CREATE TABLE into an unattached database errors
    with pytest.raises(EngineError):
        glue.execute("CREATE TABLE other.simple (id INTEGER, val FLOAT)")
    glue.execute(f"CREATE DATABASE other LOCATION '{loc}'")
    # duplicate attach errors; IF NOT EXISTS tolerated
    with pytest.raises(EngineError):
        glue.execute(f"CREATE DATABASE other LOCATION '{loc}'")
    glue.execute(f"CREATE DATABASE IF NOT EXISTS other LOCATION '{loc}'")
    # CREATE TABLE into the attached database persists to its directory
    glue.execute("CREATE TABLE other.simple (id INTEGER, val FLOAT)")
    glue.execute("INSERT INTO other.simple (id, val) VALUES (1, 1.5)")
    assert rows(glue, "SELECT id, val FROM other.simple") == [(1, 1.5)]
    import os

    assert os.path.exists(os.path.join(loc, "simple.parquet"))
    # main. addresses the primary namespace
    glue.execute("DROP TABLE IF EXISTS mainsimple")
    glue.execute("CREATE TABLE main.mainsimple (id INTEGER)")
    glue.execute("INSERT INTO mainsimple (id) VALUES (7)")
    assert rows(glue, "SELECT id FROM mainsimple") == [(7,)]


# --- tests/misc/error.rs ----------------------------------------------------


def test_error_shapes(glue):
    glue.execute("DROP TABLE IF EXISTS TableA")
    glue.execute("CREATE TABLE TableA (id INTEGER)")
    glue.execute("INSERT INTO TableA (id) VALUES (1)")
    # ExecuteError::QueryNotSupported
    with pytest.raises(EngineError):
        glue.execute("COMMIT")
    # ExecuteError::TableNotExists
    with pytest.raises(EngineError):
        glue.execute("INSERT INTO Nothing VALUES (1)")
    with pytest.raises(EngineError):
        glue.execute("UPDATE Nothing SET a = 1")
    # FetchError::TableNotFound
    with pytest.raises(EngineError):
        glue.execute("SELECT * FROM Nothing")
    # RecipeError::MissingColumn
    with pytest.raises(EngineError):
        glue.execute("SELECT * FROM TableA WHERE noname = 1")
    # ValidateError::ColumnNotFound
    with pytest.raises(EngineError):
        glue.execute("INSERT INTO TableA (id2) VALUES (1)")
    with pytest.raises(EngineError):
        glue.execute("INSERT INTO TableA (id2, id) VALUES (100)")
    # ValidateError::WrongNumberOfValues
    with pytest.raises(EngineError):
        glue.execute("INSERT INTO TableA VALUES (100), (100, 200)")
    # beyond reference: scalar subqueries in WHERE are supported here
    # (the reference raises ManualError::UnimplementedSubquery)
    assert rows(
        glue,
        "SELECT * FROM TableA WHERE id ="
        " (SELECT id FROM TableA WHERE id = 1)",
    ) == [(1,)]


# --- tests/query/explain.rs -------------------------------------------------


def test_explain_corpus(glue):
    glue.execute("DROP TABLE IF EXISTS simple")
    glue.execute("CREATE TABLE simple (id INTEGER, val FLOAT)")
    # EXPLAIN <table> lists (column, data_type) with ValueType names
    assert rows(glue, "EXPLAIN simple") == [("id", "Int"), ("val", "Float")]
    assert rows(glue, "EXPLAIN main.simple") == [
        ("id", "Int"), ("val", "Float")
    ]
    # EXPLAIN main lists primary-namespace tables
    out = glue.execute("EXPLAIN main")
    assert out.labels == ["table"]
    assert ("simple",) in out.rows
    with pytest.raises(EngineError):
        glue.execute("EXPLAIN nonsense")
    out = glue.execute("EXPLAIN ALL")
    assert out.labels == ["database"]
    out = glue.execute("EXPLAIN ALL_TABLE")
    assert out.labels == ["database", "table"]
    assert ("main", "simple") in out.rows


def test_explain_attached_database_table(glue, tmp_path_factory, sf_dir):
    """EXPLAIN db.table resolves 2-part names for attached databases
    (reference explain.rs:9-12)."""
    glue.execute(f"CREATE DATABASE exdb LOCATION '{sf_dir}/'")
    out = glue.execute("EXPLAIN exdb.nation")
    assert out.labels == ["column", "data_type"]
    cols = dict(out.rows)
    assert cols["n_nationkey"] == "Int"
    assert cols["n_name"] == "Text"


# --- dialect lexical surfaces the reference's sqlparser accepts -------------


def test_comments_and_double_quoted_strings(glue):
    """SQL comments are stripped; double-quoted literals are strings like
    the reference corpus writes them (nullable.rs:14-18 inserts "Hello"
    and expects Str values)."""
    assert rows(glue, "SELECT 1 AS a -- trailing comment") == [(1,)]
    assert rows(glue, "SELECT /* inline */ 2 AS a") == [(2,)]
    glue.execute("DROP TABLE IF EXISTS dqt")
    glue.execute("CREATE TABLE dqt (id INTEGER NULL, num INTEGER,"
                 " name TEXT)")
    glue.execute('INSERT INTO dqt (id, num, name) VALUES (NULL, 2, "Hello")')
    assert rows(glue, 'SELECT num FROM dqt WHERE name = "Hello"') == [(2,)]
    # embedded quote escaping: "" inside double quotes, '' inside single
    assert rows(glue, "SELECT \"say \"\"hi\"\"\" AS s") == [('say "hi"',)]


# --- tests/ability/base/filter/filter_simple.rs -----------------------------


def test_filter_simple(glue):
    for t in ("Boss", "Hunter"):
        glue.execute(f"DROP TABLE IF EXISTS {t}")
    glue.execute(
        "CREATE TABLE Boss (id INTEGER, name TEXT, strength FLOAT)"
    )
    glue.execute("CREATE TABLE Hunter (id INTEGER, name TEXT)")
    glue.execute(
        "INSERT INTO Boss (id, name, strength) VALUES"
        " (1, 'Amelia', 10.10), (2, 'Doll', 20.20), (3, 'Gascoigne', 30.30),"
        " (4, 'Gehrman', 40.40), (5, 'Maria', 50.50)"
    )
    glue.execute(
        "INSERT INTO Hunter (id, name) VALUES"
        " (1, 'Gascoigne'), (2, 'Gehrman'), (3, 'Maria')"
    )
    cases = [
        (3, "SELECT id, name FROM Boss WHERE id BETWEEN 2 AND 4"),
        (3, "SELECT id, name FROM Boss WHERE name BETWEEN 'Doll'"
            " AND 'Gehrman'"),
        (2, "SELECT name FROM Boss WHERE name NOT BETWEEN 'Doll'"
            " AND 'Gehrman'"),
        (2, "SELECT strength, name FROM Boss WHERE name NOT BETWEEN"
            " 'Doll' AND 'Gehrman'"),
        (5, "SELECT name FROM Boss WHERE +1 = 1"),
        (3, "SELECT id FROM Hunter WHERE -1 = -1"),
        (5, "SELECT name FROM Boss WHERE -2.0 < -1.0"),
        (3, "SELECT id FROM Hunter WHERE +2 > +1.0"),
        (2, "SELECT name FROM Boss WHERE id <= +2"),
        (2, "SELECT name FROM Boss WHERE +id <= 2"),
        (5, "SELECT name FROM Boss WHERE 2 = 1.0 + 1"),
        (3, "SELECT id FROM Hunter WHERE -1.0 - 1.0 < -1"),
        (5, "SELECT name FROM Boss WHERE -2.0 * -3.0 = 6"),
        (3, "SELECT id FROM Hunter WHERE +2 / 1.0 > +1.0"),
        # EXISTS / NOT EXISTS: the reference TODO'd these
        # (filter_simple.rs:63-79); we run them (strict superset)
        (3, "SELECT name FROM Boss WHERE EXISTS"
            " (SELECT * FROM Hunter WHERE Hunter.name = Boss.name)"),
        (2, "SELECT name FROM Boss WHERE NOT EXISTS"
            " (SELECT * FROM Hunter WHERE Hunter.name = Boss.name)"),
    ]
    for expected, sql in cases:
        assert len(rows(glue, sql)) == expected, sql


# --- tests/ability/base/aggregate/old.rs ------------------------------------


def test_aggregate_old(glue):
    glue.execute("DROP TABLE IF EXISTS AggItem")
    glue.execute(
        "CREATE TABLE AggItem (id INTEGER, quantity INTEGER,"
        " age INTEGER NULL)"
    )
    glue.execute(
        "INSERT INTO AggItem (id, quantity, age) VALUES"
        " (1, 10, 11), (2, 0, 90), (3, 9, NULL), (4, 3, 3), (5, 25, NULL)"
    )
    out = glue.execute("SELECT COUNT(1) FROM AggItem")
    assert out.labels == ["unnamed_0"] and out.rows == [(5,)]
    out = glue.execute("SELECT COUNT(1), COUNT(1) FROM AggItem")
    assert out.labels == ["unnamed_0", "unnamed_1"]
    assert out.rows == [(5, 5)]
    assert rows(
        glue,
        "SELECT SUM(quantity), MAX(quantity), MIN(quantity) FROM AggItem",
    ) == [(47, 25, 0)]
    assert rows(glue, "SELECT SUM(quantity + 1) FROM AggItem") == [(52,)]
    # int `/` parity inside aggregate arithmetic: 3 / 1 dispatches to
    # integer division (binary.rs:66-92)
    assert rows(
        glue,
        "SELECT SUM(quantity) * 2 + MAX(quantity) - 3 / 1 FROM AggItem",
    ) == [(116,)]
    assert rows(
        glue, "SELECT SUM(age), MAX(age), MIN(age) FROM AggItem"
    ) == [(104, 90, 3)]
    assert rows(
        glue, "SELECT SUM(age) + SUM(quantity) FROM AggItem"
    ) == [(151,)]
    # reference AVG = SUM/COUNT over ints gives 9 (int division); we
    # return the same value float-typed (DIVERGENCES #3)
    assert rows(glue, "SELECT AVG(quantity) FROM AggItem") == [(9.0,)]
    assert rows(glue, "SELECT SUM(1 + 2) FROM AggItem") == [(15,)]
    out = glue.execute(
        "SELECT id, COUNT(1) FROM AggItem GROUP BY id"
    )
    assert out.labels == ["id", "unnamed_1"]
    assert sorted(out.rows) == [(1, 1), (2, 1), (3, 1), (4, 1), (5, 1)]


# --- tests/ability/index/create.rs + create_table.rs ------------------------


def test_index_create_corpus(glue):
    glue.execute("DROP TABLE IF EXISTS basic_ix")
    glue.execute("DROP TABLE IF EXISTS basic_keyed")
    glue.execute("CREATE TABLE basic_ix (a INTEGER)")
    # the reference even allows `index` as the index name
    glue.execute("CREATE INDEX index ON basic_ix (a)")
    glue.execute("INSERT INTO basic_ix (a) VALUES (1), (2)")
    assert sorted(rows(glue, "SELECT a FROM basic_ix WHERE a >= 1")) == [
        (1,), (2,)
    ]
    # PRIMARY KEY column option = NOT NULL + UNIQUE
    glue.execute("CREATE TABLE basic_keyed (a INTEGER PRIMARY KEY)")
    glue.execute("INSERT INTO basic_keyed (a) VALUES (1)")
    with pytest.raises(EngineError):
        glue.execute("INSERT INTO basic_keyed (a) VALUES (1)")
    with pytest.raises(EngineError):
        glue.execute("INSERT INTO basic_keyed (a) VALUES (NULL)")


# --- tests/functionality/statement/data_query/set_operation/*.rs ------------


def test_values_set_operations(glue):
    """Ported from:
    tests/functionality/statement/data_query/set_operation/union.rs
    tests/functionality/statement/data_query/set_operation/except.rs
    tests/functionality/statement/data_query/set_operation/intersect.rs
    — VALUES operands on both sides of every set operator, with
    unnamed_{i} labels intact (intended-distinct semantics, not the
    reference's adjacent-dedup; DIVERGENCES)."""
    # union.rs: VALUES as both operands, unnamed_{i} labels survive
    out = glue.execute(
        "VALUES ('Test', 1), ('Test2', 2) UNION VALUES ('Test3', 3)"
    )
    assert out.labels == ["unnamed_0", "unnamed_1"]
    assert sorted(out.rows) == [("Test", 1), ("Test2", 2), ("Test3", 3)]
    out = glue.execute(
        "VALUES ('Test', 1), ('Test2', 2), ('Test3', 3)"
        " UNION VALUES ('Test3', 3)"
    )
    assert sorted(out.rows) == [("Test", 1), ("Test2", 2), ("Test3", 3)]
    out = glue.execute(
        "VALUES ('Test', 1), ('Test2', 2), ('Test3', 3)"
        " UNION ALL VALUES ('Test3', 3)"
    )
    assert sorted(out.rows) == [
        ("Test", 1), ("Test2", 2), ("Test3", 3), ("Test3", 3)
    ]
    # except.rs
    out = glue.execute(
        "VALUES ('Test', 1), ('Test2', 2), ('Test3', 3), ('Test4', 4)"
        " EXCEPT VALUES ('Test3', 3)"
    )
    assert sorted(out.rows) == [("Test", 1), ("Test2", 2), ("Test4", 4)]
    # intersect.rs
    out = glue.execute(
        "VALUES ('Test', 1), ('Test2', 2), ('Test3', 3), ('Test4', 4)"
        " INTERSECT VALUES ('Test3', 3), ('Test1', 1), ('Test5', 5),"
        " ('Test2', 2)"
    )
    assert sorted(out.rows) == [("Test2", 2), ("Test3", 3)]
    # mixed operands: VALUES against a table SELECT
    glue.execute("DROP TABLE IF EXISTS setop_t")
    glue.execute("CREATE TABLE setop_t (a INTEGER)")
    glue.execute("INSERT INTO setop_t (a) VALUES (9)")
    out = glue.execute("VALUES (1) UNION SELECT a FROM setop_t")
    assert sorted(out.rows) == [(1,), (9,)]


# --- tests/ability/index/filter/gt_lt.rs ------------------------------------


def test_index_filter_gt_lt(glue):
    glue.execute("DROP TABLE IF EXISTS OperatorIx")
    # the reference writes a trailing comma in the column list
    glue.execute(
        "CREATE TABLE OperatorIx (\n id INTEGER,\n name TEXT,\n )"
    )
    glue.execute(
        "INSERT INTO OperatorIx (id, name) VALUES (1, 'Abstract'),"
        " (2, 'Azzzz'), (3, 'July'), (4, 'Romeo'), (5, 'Trade')"
    )
    glue.execute("CREATE INDEX OperatorIx_id ON OperatorIx (id)")
    glue.execute("CREATE INDEX OperatorIx_name ON OperatorIx (name)")
    cases = [
        (1, "SELECT * FROM OperatorIx WHERE id < 2"),
        (2, "SELECT * FROM OperatorIx WHERE id <= 2"),
        (3, "SELECT * FROM OperatorIx WHERE id > 2"),
        (4, "SELECT * FROM OperatorIx WHERE id >= 2"),
        (1, "SELECT * FROM OperatorIx WHERE 2 > id"),
        (2, "SELECT * FROM OperatorIx WHERE 2 >= id"),
        (3, "SELECT * FROM OperatorIx WHERE 2 < id"),
        (4, "SELECT * FROM OperatorIx WHERE 2 <= id"),
        (5, "SELECT * FROM OperatorIx WHERE 1 < 3"),
        (5, "SELECT * FROM OperatorIx WHERE 3 >= 3"),
        (0, "SELECT * FROM OperatorIx WHERE 3 > 3"),
        (2, "SELECT * FROM OperatorIx WHERE name < 'Azzzzzzzzzz'"),
        (1, "SELECT * FROM OperatorIx WHERE name < 'Az'"),
        (5, "SELECT * FROM OperatorIx WHERE name < 'zz'"),
        (5, "SELECT * FROM OperatorIx WHERE 'aa' < 'zz'"),
        (4, "SELECT * FROM OperatorIx WHERE 'Romeo' >= name"),
        (5, "SELECT * FROM OperatorIx WHERE NOT (1 != 1)"),
    ]
    for expected, sql in cases:
        assert len(rows(glue, sql)) == expected, sql
