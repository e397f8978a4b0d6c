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
