"""Declared-``ANY`` columns carry per-row dynamic values.

Reference semantics (``src/data/value/value_type/mod.rs:17`` —
``ValueType::Any``; ``src/data/value/mod.rs:240`` —
``(ValueType::Any, _) => Ok(())``; ``src/data/value/value_type/cast.rs:14``
— cast to Any is the identity): a column declared ``ANY`` accepts every
value kind per row and surfaces each value with its own type.  The Spark
implementation stores the column as VARIANT and the Payload layer
collapses ``VariantVal`` cells to native Python values — the column-level
completion of the ``IIF`` literal-branch VARIANT work (DIVERGENCES #4)."""

from __future__ import annotations

import pytest

from multisql_spark import MultiSQLSession
from multisql_spark.session import UniqueViolation


@pytest.fixture(scope="module")
def glue(spark):
    return MultiSQLSession(spark)


def test_any_column_mixed_kinds_roundtrip(glue):
    glue.execute("DROP TABLE IF EXISTS anyt")
    glue.execute("CREATE TABLE anyt (id INTEGER, x ANY NULL)")
    glue.execute(
        "INSERT INTO anyt (id, x) VALUES (1, 'word'), (2, 17), "
        "(3, 2.5), (4, TRUE), (5, NULL)"
    )
    out = glue.execute("SELECT id, x FROM anyt")
    got = {r[0]: r[1] for r in out.rows}
    assert got[1] == "word" and isinstance(got[1], str)
    assert got[2] == 17 and isinstance(got[2], int)
    assert got[3] == 2.5 and isinstance(got[3], float)
    assert got[4] is True
    assert got[5] is None


def test_any_column_insert_select_passthrough(glue):
    glue.execute("DROP TABLE IF EXISTS anys; DROP TABLE IF EXISTS anyd")
    glue.execute("CREATE TABLE anys (v TEXT)")
    glue.execute("INSERT INTO anys (v) VALUES ('alpha'), ('beta')")
    glue.execute("CREATE TABLE anyd (v ANY)")
    glue.execute("INSERT INTO anyd (v) SELECT v FROM anys")
    out = glue.execute("SELECT v FROM anyd")
    assert sorted(r[0] for r in out.rows) == ["alpha", "beta"]


def test_cast_to_any_is_identity(glue):
    # reference cast.rs:14: (ValueType::Any, _) => Ok(self.clone())
    out = glue.execute("SELECT CAST(5 AS ANY) AS a, CAST('x' AS ANY) AS b")
    assert out.rows == [(5, "x")]
    assert out.labels == ["a", "b"]


def test_any_column_unique_enforced(glue):
    glue.execute("DROP TABLE IF EXISTS anyu")
    glue.execute("CREATE TABLE anyu (x ANY UNIQUE)")
    glue.execute("INSERT INTO anyu (x) VALUES (1), ('1')")  # distinct kinds
    with pytest.raises(UniqueViolation):
        glue.execute("INSERT INTO anyu (x) VALUES (1)")


def test_any_column_unique_cross_kind_numeric(glue):
    """Reference ``implicit_float_conversion`` (value/mod.rs:159, on by
    default): I64(1) == F64(1.0) in validate_unique — inserting 1 then
    1.0 into an ANY UNIQUE column is a duplicate, while the STRING '1'
    and the non-integral 1.5 stay distinct."""
    glue.execute("DROP TABLE IF EXISTS anyuq")
    glue.execute("CREATE TABLE anyuq (x ANY UNIQUE)")
    glue.execute("INSERT INTO anyuq (x) VALUES (1)")
    with pytest.raises(UniqueViolation):
        glue.execute("INSERT INTO anyuq (x) VALUES (1.0)")
    # and the reverse kind order, plus within a single batch
    glue.execute("DROP TABLE IF EXISTS anyuq2")
    glue.execute("CREATE TABLE anyuq2 (x ANY UNIQUE)")
    glue.execute("INSERT INTO anyuq2 (x) VALUES (2.0)")
    with pytest.raises(UniqueViolation):
        glue.execute("INSERT INTO anyuq2 (x) VALUES (2)")
    with pytest.raises(UniqueViolation):
        glue.execute("INSERT INTO anyuq2 (x) VALUES (3), (3.0)")
    # distinct kinds/values still accepted
    glue.execute("INSERT INTO anyuq2 (x) VALUES ('2'), (2.5), (TRUE)")
    assert len(glue.execute("SELECT x FROM anyuq2").rows) == 4


def test_any_column_update_changes_kind(glue):
    # UPDATE may swap an Any cell's kind per row (reference Value::is
    # accepts any incoming value for ValueType::Any)
    glue.execute("DROP TABLE IF EXISTS anyup")
    glue.execute("CREATE TABLE anyup (id INTEGER, x ANY NULL)")
    glue.execute("INSERT INTO anyup (id, x) VALUES (1, 'str'), (2, 2)")
    glue.execute("UPDATE anyup SET x = 99 WHERE id = 1")
    got = {r[0]: r[1] for r in glue.execute("SELECT id, x FROM anyup").rows}
    assert got[1] == 99 and isinstance(got[1], int)
    assert got[2] == 2


def test_iif_mixed_column_branches_dynamic(glue):
    """r4 completion of DIVERGENCES #4: IIF whose BRANCHES are columns
    of different kinds returns each row with the chosen branch's own
    type (reference function.rs over Value::Any) — the schema snapshot
    types the branches and the dialect emits VARIANT."""
    glue.execute("DROP TABLE IF EXISTS iifc")
    glue.execute(
        "CREATE TABLE iifc (id INTEGER, n INTEGER, s TEXT, f FLOAT)"
    )
    glue.execute(
        "INSERT INTO iifc (id, n, s, f) VALUES"
        " (1, 10, 'ten', 1.5), (2, 20, 'twenty', 2.5)"
    )
    out = glue.execute("SELECT id, IIF(id = 1, n, s) AS x FROM iifc")
    got = {r[0]: r[1] for r in out.rows}
    assert got[1] == 10 and isinstance(got[1], int)
    assert got[2] == "twenty" and isinstance(got[2], str)
    # int column vs float column: per-row I64 / F64, not a double column
    out = glue.execute("SELECT id, IIF(id = 1, n, f) AS x FROM iifc")
    got = {r[0]: r[1] for r in out.rows}
    assert got[1] == 10 and isinstance(got[1], int)
    assert got[2] == 2.5 and isinstance(got[2], float)
    # int literal vs float literal likewise (r4: num kinds split)
    out = glue.execute("SELECT id, IIF(id = 1, 1, 2.5) AS x FROM iifc")
    got = {r[0]: r[1] for r in out.rows}
    assert got[1] == 1 and isinstance(got[1], int)
    assert got[2] == 2.5 and isinstance(got[2], float)
    # same-kind branches keep the plain static column
    out = glue.execute("SELECT id, IIF(id = 1, n, n + 1) AS x FROM iifc")
    assert {r[0]: r[1] for r in out.rows} == {1: 10, 2: 21}


def test_iif_mixed_computed_branches(glue):
    """r5 closure of the last DIVERGENCES #4 sliver: IIF branches that are
    COMPUTED expressions (``n + 1``) resolve their reference kind through
    the dialect's expression typer (value/mod.rs:232-241 — I64 op I64
    stays I64, promotion to F64, ``||`` is Str), so mixed-kind computed
    branches take the per-row VARIANT path like literals and columns."""
    glue.execute("DROP TABLE IF EXISTS iifx")
    glue.execute(
        "CREATE TABLE iifx (id INTEGER, n INTEGER, s TEXT, f FLOAT,"
        " a ANY NULL)"
    )
    glue.execute(
        "INSERT INTO iifx (id, n, s, f, a) VALUES"
        " (1, 10, 'ten', 1.5, 7), (2, 20, 'twenty', 2.5, 'w')"
    )
    # computed int expr vs string column: per-row I64 / Str
    out = glue.execute("SELECT id, IIF(id = 1, n + 1, s) AS x FROM iifx")
    got = {r[0]: r[1] for r in out.rows}
    assert got[1] == 11 and isinstance(got[1], int)
    assert got[2] == "twenty" and isinstance(got[2], str)
    # computed int expr vs string literal (the VERDICT's named case)
    out = glue.execute("SELECT id, IIF(id = 1, n + 1, 's') AS x FROM iifx")
    got = {r[0]: r[1] for r in out.rows}
    assert got[1] == 11 and isinstance(got[1], int)
    assert got[2] == "s" and isinstance(got[2], str)
    # computed int expr vs computed float expr: per-row I64 / F64
    out = glue.execute(
        "SELECT id, IIF(id = 1, n * 2, f + 1.0) AS x FROM iifx"
    )
    got = {r[0]: r[1] for r in out.rows}
    assert got[1] == 20 and isinstance(got[1], int)
    assert got[2] == 3.5 and isinstance(got[2], float)
    # function-typed branch vs computed int expr
    out = glue.execute(
        "SELECT id, IIF(id = 1, UPPER(s), n - 1) AS x FROM iifx"
    )
    got = {r[0]: r[1] for r in out.rows}
    assert got[1] == "TEN" and isinstance(got[1], str)
    assert got[2] == 19 and isinstance(got[2], int)
    # declared-ANY column vs a computed branch: the 'any' kind forces
    # the VARIANT wrap even against an expression (ADVICE r4)
    out = glue.execute("SELECT id, IIF(id = 1, a, n + 1) AS x FROM iifx")
    got = {r[0]: r[1] for r in out.rows}
    assert got[1] == 7 and isinstance(got[1], int)
    assert got[2] == 21 and isinstance(got[2], int)
    # same-kind computed branches keep the plain static column
    out = glue.execute(
        "SELECT id, IIF(id = 1, n + 1, n * 2) AS x FROM iifx"
    )
    assert {r[0]: r[1] for r in out.rows} == {1: 11, 2: 40}


def test_any_column_persists_through_attached_storage(glue, tmp_path):
    """An Any column written back to an attached parquet database keeps
    its per-row value kinds across a FRESH attach (VARIANT survives the
    storage roundtrip; the pyarrow nanos probe skips files whose logical
    types it can't parse)."""
    from multisql_spark import MultiSQLSession

    d = str(tmp_path / "anydb")
    import os

    os.makedirs(d, exist_ok=True)
    glue.execute(f"CREATE DATABASE adper LOCATION '{d}/'")
    glue.execute("CREATE TABLE adper.t (id INTEGER, x ANY NULL)")
    glue.execute(
        "INSERT INTO adper.t (id, x) VALUES (1, 'w'), (2, 9), (3, 2.5)"
    )
    g2 = MultiSQLSession(glue.spark)
    g2.execute(f"CREATE DATABASE adper2 LOCATION '{d}/'")
    rows = sorted(g2.execute("SELECT id, x FROM adper2.t").rows)
    assert rows == [(1, "w"), (2, 9), (3, 2.5)]
    assert isinstance(rows[1][1], int) and isinstance(rows[2][1], float)


def test_any_column_explain_displays_any(glue):
    glue.execute("DROP TABLE IF EXISTS anye")
    glue.execute("CREATE TABLE anye (x ANY NULL)")
    out = glue.execute("EXPLAIN anye")
    assert any("Any" in str(r) for r in out.rows)
