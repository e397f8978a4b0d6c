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


# --- tests/ability/column_option/unique.rs ---------------------------------


def test_unique_null_semantics(glue):
    """NULLs never collide in UNIQUE columns (reference
    validate_unique.rs); duplicates reject inserts and updates."""
    from multisql_spark.session import EngineError

    for t in ("UTestA", "UTestB", "UTestC"):
        glue.execute(f"DROP TABLE IF EXISTS {t}")
    glue.execute("CREATE TABLE UTestA (id INTEGER UNIQUE, num INTEGER)")
    glue.execute(
        "CREATE TABLE UTestB (id INTEGER UNIQUE, num INTEGER UNIQUE)"
    )
    # reference unique.rs:26-29: TestC is `id INTEGER NULL UNIQUE`
    glue.execute("CREATE TABLE UTestC (id INTEGER NULL UNIQUE, num INTEGER)")
    glue.execute("INSERT INTO UTestA VALUES (1, 1)")
    glue.execute("INSERT INTO UTestA VALUES (2, 1), (3, 1)")
    glue.execute("INSERT INTO UTestB VALUES (1, 1)")
    glue.execute("INSERT INTO UTestB VALUES (2, 2), (3, 3)")
    # multiple NULLs are legal in a UNIQUE column
    glue.execute("INSERT INTO UTestC VALUES (NULL, 1)")
    glue.execute("INSERT INTO UTestC VALUES (2, 2), (NULL, 3)")
    glue.execute("UPDATE UTestC SET id = 1 WHERE num = 1")
    glue.execute("UPDATE UTestC SET id = NULL WHERE num = 1")
    assert sorted(
        glue.execute("SELECT num FROM UTestC WHERE id IS NULL").rows
    ) == [(1,), (3,)]
    for bad in (
        "INSERT INTO UTestA VALUES (2, 2)",
        "INSERT INTO UTestA VALUES (4, 4), (4, 5)",
        "UPDATE UTestA SET id = 2 WHERE id = 1",
        "INSERT INTO UTestB VALUES (1, 3)",
    ):
        with pytest.raises(EngineError):
            glue.execute(bad)


# --- tests/ability/insert/basic_insert.rs + api/csv.rs ---------------------


def test_insert_variants_and_csv_export(glue):
    glue.execute("DROP TABLE IF EXISTS ins_t; DROP TABLE IF EXISTS ins_s")
    # trailing comma in the column list (reference's sqlparser tolerates it)
    # reference basic_insert.rs:6-16: nullable columns
    glue.execute("CREATE TABLE ins_t (a INTEGER NULL, b TEXT NULL,)")
    glue.execute("CREATE TABLE ins_s (x INTEGER NULL, y TEXT NULL)")
    glue.execute("INSERT INTO ins_s (x, y) VALUES (10, 'j')")
    for sql, n in [
        ("INSERT INTO ins_t VALUES (1, 'a')", 1),
        ("INSERT INTO ins_t (a, b) VALUES (2, 'b')", 1),
        ("INSERT INTO ins_t (a) VALUES (3)", 1),
        ("INSERT INTO ins_t (b) VALUES ('c')", 1),
        ("INSERT INTO ins_t SELECT * FROM ins_s", 1),
        ("INSERT INTO ins_t (a, b) SELECT * FROM ins_s", 1),
    ]:
        p = glue.execute(sql)
        assert p.kind == "Insert" and p.count == n, sql
    assert glue.execute("SELECT COUNT(*) AS n FROM ins_t").rows == [(6,)]
    # api/csv.rs: select_as_csv exact shape (header + newline rows)
    glue.execute("DROP TABLE IF EXISTS capi")
    glue.execute("CREATE TABLE capi (a INTEGER)")
    glue.execute("INSERT INTO capi (a) VALUES (1)")
    assert glue.execute("SELECT * FROM capi").as_csv() == "a\n1\n"
    glue.execute("INSERT INTO capi VALUES (2),(3),(4),(5)")
    assert (
        glue.execute("SELECT * FROM capi ORDER BY a").as_csv()
        == "a\n1\n2\n3\n4\n5\n"
    )


# --- tests/functionality/statement/data_query/values.rs --------------------


def test_values_statement(glue):
    out = glue.execute("VALUES (1, 'a'), (2, 'b')")
    assert out.labels == ["unnamed_0", "unnamed_1"]
    assert sorted(out.rows) == [(1, "a"), (2, "b")]


# --- reference TOP clause: parsed and ignored (manual/mod.rs:48) ------------


def test_top_accepted_and_ignored(glue):
    glue.execute("DROP TABLE IF EXISTS topt")
    glue.execute("CREATE TABLE topt (a INTEGER)")
    glue.execute("INSERT INTO topt (a) VALUES (1),(2),(3)")
    # reference binds `top: _` — all rows come back despite TOP 1
    assert sorted(glue.execute("SELECT TOP 1 a FROM topt").rows) == [
        (1,), (2,), (3,)
    ]


# --- reference label semantics (planned.rs:252-274, refine_item.rs) ---------


def test_select_item_labels(glue):
    glue.execute("DROP TABLE IF EXISTS lbl_a; DROP TABLE IF EXISTS lbl_b")
    glue.execute("CREATE TABLE lbl_a (id INTEGER, num INTEGER)")
    glue.execute("CREATE TABLE lbl_b (id INTEGER, tag TEXT)")
    glue.execute("INSERT INTO lbl_a (id, num) VALUES (1, 10)")
    glue.execute("INSERT INTO lbl_b (id, tag) VALUES (1, 'x')")
    # bare column in a single-table query keeps its own name
    assert glue.execute("SELECT id FROM lbl_a").labels == ["id"]
    # unaliased expressions label unnamed_{i} by selection index
    assert glue.execute(
        "SELECT id, num + 1, UPPER('a') FROM lbl_a"
    ).labels == ["id", "unnamed_1", "unnamed_2"]
    # multi-table query: dotted columns keep the table.column label
    out = glue.execute(
        "SELECT lbl_a.num, lbl_b.tag FROM lbl_a"
        " JOIN lbl_b ON lbl_a.id = lbl_b.id"
    )
    assert out.labels == ["lbl_a.num", "lbl_b.tag"]
    # BARE columns in a multi-table query also label table.column —
    # the schema snapshot resolves each column's owning table
    # (planned.rs:252-274 include_table; closes DIVERGENCES #21)
    out = glue.execute(
        "SELECT num, tag FROM lbl_a JOIN lbl_b ON lbl_a.id = lbl_b.id"
    )
    assert out.labels == ["lbl_a.num", "lbl_b.tag"]
    # aliased relations STILL label with the real table name — the
    # reference labels column.table.name (ComplexTableName keeps the
    # alias separate; refine_item.rs:42, planned.rs:263)
    out = glue.execute(
        "SELECT num, tag FROM lbl_a x JOIN lbl_b y ON x.id = y.id"
    )
    assert out.labels == ["lbl_a.num", "lbl_b.tag"]
    # ... including when the column is referenced THROUGH the alias
    out = glue.execute(
        "SELECT x.num, y.tag FROM lbl_a x JOIN lbl_b y ON x.id = y.id"
    )
    assert out.labels == ["lbl_a.num", "lbl_b.tag"]
    # explicit aliases always win
    assert glue.execute("SELECT num + 1 AS n1 FROM lbl_a").labels == ["n1"]


def test_int_division_static_type(glue):
    """Reference int `/` int is I64 (binary.rs:66-92).  With the schema
    snapshot the dialect statically types known-int column divisions, so
    the declared result type is BIGINT — not the runtime-dispatch DOUBLE
    (closes DIVERGENCES #3 for subquery-free queries)."""
    glue.execute("DROP TABLE IF EXISTS divt")
    glue.execute("CREATE TABLE divt (a INTEGER, b INTEGER, f FLOAT)")
    glue.execute("INSERT INTO divt VALUES (7, 2, 1.5)")
    out = glue.execute("SELECT a / b FROM divt")
    assert out.rows == [(3,)]
    assert isinstance(out.rows[0][0], int)  # I64, not 3.5 / not 3.0
    # mixed int/float stays float division
    out = glue.execute("SELECT a / f FROM divt")
    assert out.rows == [(pytest.approx(7 / 1.5),)]
    # UPDATE SET int/int writes back integer-typed (DIVERGENCES #22)
    glue.execute("UPDATE divt SET a = a / b")
    assert glue.execute("SELECT a FROM divt").rows == [(3,)]
