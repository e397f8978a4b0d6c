"""Engine-layer tests modeled on the reference test corpus
(tests/ability/base/basic.rs, column_option/*, functionality/statement/*)."""

from __future__ import annotations

import pytest

from multisql_spark.session import EngineError, MultiSQLSession


@pytest.fixture(scope="module")
def glue(spark):
    return MultiSQLSession(spark)


def _fresh(glue, name):
    glue.execute(f"DROP TABLE IF EXISTS {name}")


def test_basic_select(glue):
    """Reference smoke test tests/ability/base/basic.rs:5-60."""
    _fresh(glue, "basic_0")
    glue.execute("CREATE TABLE basic_0 (id INTEGER, num INTEGER, name TEXT)")
    glue.execute(
        "INSERT INTO basic_0 (id, num, name) VALUES (1, 2, 'Hello')"
    )
    glue.execute(
        "INSERT INTO basic_0 (id, num, name) VALUES (1, 9, 'World')"
    )
    glue.execute(
        "INSERT INTO basic_0 (id, num, name) VALUES (3, 4, 'Great'), (4, 7, 'Job')"
    )
    out = glue.execute("SELECT id, num, name FROM basic_0 WHERE id > 1")
    assert out.labels == ["id", "num", "name"]
    assert sorted(out.rows) == [(3, 4, "Great"), (4, 7, "Job")]


def test_insert_select_and_update(glue):
    _fresh(glue, "basic_1")
    glue.execute("CREATE TABLE basic_1 (id INTEGER, num INTEGER, name TEXT)")
    p = glue.execute("INSERT INTO basic_1 SELECT id, num, name FROM basic_0")
    assert p.kind == "Insert" and p.count == 4
    p = glue.execute("UPDATE basic_1 SET id = 2")
    assert p.kind == "Update" and p.count == 4
    out = glue.execute("SELECT id FROM basic_1")
    assert [r[0] for r in out.rows] == [2, 2, 2, 2]
    p = glue.execute("UPDATE basic_1 SET num = num * 10 WHERE name = 'Job'")
    assert p.count == 1
    out = glue.execute("SELECT num FROM basic_1 WHERE name = 'Job'")
    assert out.rows == [(70,)]


def test_delete_truncate(glue):
    _fresh(glue, "d0")
    glue.execute("CREATE TABLE d0 (a INTEGER)")
    glue.execute("INSERT INTO d0 (a) VALUES (1),(2),(3),(4)")
    p = glue.execute("DELETE FROM d0 WHERE a >= 3")
    assert p.count == 2
    assert glue.execute("SELECT a FROM d0").count == 2
    glue.execute("TRUNCATE TABLE d0")
    assert glue.execute("SELECT a FROM d0").count == 0


def test_column_options(glue):
    _fresh(glue, "opts")
    glue.execute(
        "CREATE TABLE opts ("
        " id INTEGER AUTO_INCREMENT,"
        " name TEXT NOT NULL,"
        " code INTEGER UNIQUE,"
        " score FLOAT DEFAULT 1.5)"
    )
    glue.execute("INSERT INTO opts (name, code) VALUES ('a', 10), ('b', 20)")
    out = glue.execute("SELECT id, name, code, score FROM opts")
    assert sorted(out.rows) == [(1, "a", 10, 1.5), (2, "b", 20, 1.5)]
    # NOT NULL enforcement (reference validate.rs:276-282)
    with pytest.raises(EngineError):
        glue.execute("INSERT INTO opts (code) VALUES (30)")
    # UNIQUE enforcement (reference validate_unique.rs)
    with pytest.raises(EngineError):
        glue.execute("INSERT INTO opts (name, code) VALUES ('c', 10)")
    # auto-increment continues
    glue.execute("INSERT INTO opts (name, code) VALUES ('d', 40)")
    out = glue.execute("SELECT id FROM opts WHERE name = 'd'")
    assert out.rows == [(3,)]


def test_set_variable(glue):
    """Reference tests/functionality/statement/set.rs."""
    glue.execute("SET @variable = 1")
    out = glue.execute("SELECT 2 + @variable AS v")
    assert out.rows == [(3,)]
    _fresh(glue, "basic")
    glue.execute("CREATE TABLE basic (a INTEGER)")
    glue.execute("INSERT INTO basic (a) VALUES (1)")
    assert glue.execute("SELECT a FROM basic WHERE @variable = 1").count == 1
    assert glue.execute("SELECT a FROM basic WHERE @variable = 0").count == 0


def test_dialect_functions(glue):
    out = glue.execute(
        "SELECT IIF(TRUE, 'y', 'n') AS a, IFNULL(NULL, 5) AS b,"
        " NULLIF(3, 3) AS c, LEN('héllo') AS d,"
        " LEFT('spark', 2) AS e, ROUND(2.567, 2) AS f"
    )
    assert [tuple(float(v) if i == 5 else v for i, v in enumerate(r)) for r in out.rows] == [
        ("y", 5, None, 6, "sp", 2.57)
    ]


def test_timestamp_functions(glue):
    out = glue.execute(
        "SELECT YEAR(DATEFROMPARTS(2024, 3, 5)) AS y,"
        " MONTH(DATEADD('MONTH', 2, DATEFROMPARTS(2024, 3, 5))) AS m,"
        " DAY(CONVERT('TIMESTAMP', '2024-03-05', 022)) AS d,"
        " CONVERT('TEXT', 86400, 'DATETIME') AS s"
    )
    assert out.rows == [(2024, 5, 5, "1970-01-02 00:00:00")]


def test_views_and_explain(glue):
    _fresh(glue, "vt")
    glue.execute("CREATE TABLE vt (a INTEGER)")
    glue.execute("INSERT INTO vt (a) VALUES (1),(2),(3)")
    glue.execute("CREATE VIEW v_big AS SELECT a FROM vt WHERE a > 1")
    assert glue.execute("SELECT * FROM v_big").count == 2
    tables = glue.execute("EXPLAIN ALL_TABLE")
    # reference explain.rs:26-40: ALL_TABLE rows are (database, table)
    assert ("main", "vt") in tables.rows
    cols = glue.execute("EXPLAIN vt")
    # reference ValueType display (value_type/cast.rs:38): I64 → "Int"
    assert ("a", "Int") in cols.rows
    # beyond-reference: EXPLAIN <query> returns the Spark physical plan
    plan = glue.execute("EXPLAIN SELECT a FROM vt WHERE a > 1")
    assert plan.labels == ["plan"]
    assert any("Filter" in r[0] for r in plan.rows)


def test_alter_table(glue):
    _fresh(glue, "alt")
    _fresh(glue, "alt2")
    glue.execute("CREATE TABLE alt (a INTEGER)")
    glue.execute("INSERT INTO alt (a) VALUES (1)")
    glue.execute("ALTER TABLE alt ADD COLUMN b TEXT DEFAULT 'x'")
    assert glue.execute("SELECT a, b FROM alt").rows == [(1, "x")]
    glue.execute("ALTER TABLE alt RENAME COLUMN b TO c")
    assert glue.execute("SELECT c FROM alt").rows == [("x",)]
    glue.execute("ALTER TABLE alt DROP COLUMN c")
    assert glue.execute("SELECT * FROM alt").labels == ["a"]
    glue.execute("ALTER TABLE alt RENAME TO alt2")
    assert glue.execute("SELECT a FROM alt2").count == 1


def test_create_table_as_and_database(glue, sf_dir):
    _fresh(glue, "nat_copy")
    glue.execute(f"CREATE DATABASE tpch LOCATION '{sf_dir}/'")
    out = glue.execute("SELECT count(*) AS n FROM tpch.nation")
    assert out.rows == [(25,)]
    glue.execute(
        "CREATE TABLE nat_copy AS SELECT * FROM tpch.nation WHERE n_regionkey = 0"
    )
    assert glue.execute("SELECT count(*) AS n FROM nat_copy").rows[0][0] == 5
    dbs = glue.execute("EXPLAIN ALL")
    assert ("tpch",) in dbs.rows


def test_insert_vec_and_payload_convert(glue):
    _fresh(glue, "pv")
    glue.execute("CREATE TABLE pv (a INTEGER, b TEXT)")
    p = glue.insert_vec("pv", ["a", "b"], [(1, "x"), (2, "y")])
    assert p.count == 2
    out = glue.execute("SELECT a, b FROM pv")
    assert '"a": 1' in out.as_json()
    assert out.as_csv().startswith("a,b")


def test_execute_file(glue, tmp_path):
    _fresh(glue, "ef")
    script = tmp_path / "s.sql"
    script.write_text(
        "CREATE TABLE ef (a INTEGER);"
        "INSERT INTO ef (a) VALUES (1),(2);"
        "SELECT SUM(a) AS s FROM ef;"
    )
    out = glue.execute(f"EXECUTE FILE('{script}')")
    assert out.rows == [(3,)]


def test_insert_action_budget(glue, monkeypatch):
    """Constraint validation folds into one aggregation action: an INSERT
    into a table with NOT NULL + UNIQUE + AUTO_INCREMENT triggers at most
    2 driver actions (stats aggregate + one semi-join count per UNIQUE
    column).  Job counts are AQE-dependent; actions are the contract."""
    from pyspark.sql import DataFrame

    _fresh(glue, "jb")
    glue.execute(
        "CREATE TABLE jb (id INTEGER AUTO_INCREMENT NOT NULL,"
        " v TEXT UNIQUE, w INTEGER NOT NULL)"
    )
    glue.execute("INSERT INTO jb (v, w) VALUES ('seed', 0)")
    actions = {"n": 0}
    orig_collect, orig_count = DataFrame.collect, DataFrame.count

    def counting_collect(self):
        actions["n"] += 1
        return orig_collect(self)

    def counting_count(self):
        actions["n"] += 1
        return orig_count(self)

    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    monkeypatch.setattr(DataFrame, "count", counting_count)
    glue.execute("INSERT INTO jb (v, w) VALUES ('a', 1), ('b', 2)")
    assert actions["n"] <= 2, f"INSERT ran {actions['n']} driver actions"


def test_extend_reduce_api(glue, sf_dir):
    """Programmatic attach/detach (reference Glue::try_extend_from_path /
    Glue::reduce, glue/mod.rs:108-149)."""
    assert glue.extend("ext1", f"{sf_dir}/") is True
    assert glue.extend("ext1", f"{sf_dir}/") is False  # already attached
    assert glue.execute("SELECT COUNT(*) AS n FROM ext1.region").rows == [
        (5,)
    ]
    assert glue.reduce("ext1") is True
    assert glue.reduce("ext1") is False
    with pytest.raises(EngineError):
        glue.execute("SELECT COUNT(*) AS n FROM ext1.region")


def test_drop_database_cleans_state(glue, sf_dir):
    glue.execute(f"CREATE DATABASE dd1 LOCATION '{sf_dir}/'")
    assert glue.execute("SELECT COUNT(*) AS n FROM dd1.nation").count == 1
    glue.execute("DROP DATABASE dd1")
    with pytest.raises(EngineError):
        glue.execute("SELECT COUNT(*) AS n FROM dd1.nation")
    # re-attach works cleanly after the drop
    glue.execute(f"CREATE DATABASE dd1 LOCATION '{sf_dir}/'")
    assert glue.execute("SELECT COUNT(*) AS n FROM dd1.nation").count == 1
    glue.execute("DROP DATABASE dd1")


def test_select_converters(glue):
    """Glue-level SELECT-only converters (reference select.rs:14-82):
    non-SELECT statements raise QueryNotSupported-shaped errors."""
    _fresh(glue, "conv")
    glue.execute("CREATE TABLE conv (a INTEGER, b BOOLEAN NULL)")
    glue.execute("INSERT INTO conv (a, b) VALUES (1, TRUE), (2, NULL)")
    assert glue.select_as_string("SELECT a, b FROM conv ORDER BY a") == [
        ["a", "b"], ["1", "true"], ["2", "NULL"]
    ]
    assert glue.select_as_csv("SELECT a FROM conv ORDER BY a") == "a\n1\n2\n"
    assert '"a": 1' in glue.select_json("SELECT a FROM conv ORDER BY a")
    with pytest.raises(EngineError):
        glue.select_json("INSERT INTO conv (a, b) VALUES (3, TRUE)")


def test_typed_error_classes(glue):
    """Error families mirror the reference's typed enum (DIVERGENCES #15):
    host code can catch the specific class, all subclass EngineError."""
    from multisql_spark import (
        AlreadyExistsError,
        ColumnNotFoundError,
        NotNullViolation,
        TableNotFoundError,
        UniqueViolation,
        UnsupportedError,
    )

    _fresh(glue, "terr")
    glue.execute(
        "CREATE TABLE terr (a INTEGER NOT NULL, b INTEGER UNIQUE)"
    )
    glue.execute("INSERT INTO terr (a, b) VALUES (1, 1)")
    with pytest.raises(TableNotFoundError):
        glue.execute("SELECT * FROM no_such_table_xyz")
    with pytest.raises(ColumnNotFoundError):
        glue.execute("INSERT INTO terr (nope) VALUES (1)")
    with pytest.raises(AlreadyExistsError):
        glue.execute("CREATE TABLE terr (a INTEGER)")
    with pytest.raises(NotNullViolation):
        glue.execute("INSERT INTO terr (a, b) VALUES (NULL, 2)")
    with pytest.raises(UniqueViolation):
        glue.execute("INSERT INTO terr (a, b) VALUES (2, 1)")
    with pytest.raises(UnsupportedError):
        glue.execute("COMMIT")


def test_group_by_alias_and_ordinal(glue):
    """Spark-native GROUP BY forms must not be mangled by the
    loose-group-by rewrite (reference has neither form; strict
    superset): grouping by a select-item alias or by 1-based ordinal
    leaves that item grouped, not wrapped in first()."""
    _fresh(glue, "galias")
    glue.execute("CREATE TABLE galias (k INTEGER, v INTEGER)")
    glue.execute(
        "INSERT INTO galias (k, v) VALUES (1, 10), (1, 20), (2, 30)"
    )
    out = glue.execute(
        "SELECT k AS grp, SUM(v) AS s FROM galias GROUP BY grp"
    )
    assert out.labels == ["grp", "s"]
    assert sorted(out.rows) == [(1, 30), (2, 30)]
    out = glue.execute("SELECT k, SUM(v) AS s FROM galias GROUP BY 1")
    assert out.labels == ["k", "s"]
    assert sorted(out.rows) == [(1, 30), (2, 30)]
    # expression items grouped by ordinal
    out = glue.execute(
        "SELECT k + 1 AS k1, SUM(v) AS s FROM galias GROUP BY 1"
    )
    assert sorted(out.rows) == [(2, 30), (3, 30)]


def test_correlated_scalar_subquery(glue):
    """Correlated scalar subquery over managed (post-INSERT union-shaped)
    tables — exercises the checkpoint fallback for the Spark 4.1 planner
    fault (NoSuchElementException on Union outer plans)."""
    _fresh(glue, "csq_p")
    _fresh(glue, "csq_c")
    glue.execute("CREATE TABLE csq_p (id INTEGER, cat INTEGER)")
    glue.execute("INSERT INTO csq_p (id, cat) VALUES (1, 1), (2, 2)")
    glue.execute("CREATE TABLE csq_c (cat INTEGER, label TEXT)")
    glue.execute(
        "INSERT INTO csq_c (cat, label) VALUES (1, 'low'), (2, 'high')"
    )
    sql = (
        "SELECT id, (SELECT label FROM csq_c WHERE csq_c.cat = csq_p.cat)"
        " AS lbl FROM csq_p"
    )
    assert sorted(glue.execute(sql).rows) == [(1, "low"), (2, "high")]
    # mutate after the fallback's checkpoint, query again (fresh Union)
    glue.execute("INSERT INTO csq_p (id, cat) VALUES (3, 1)")
    assert sorted(glue.execute(sql).rows) == [
        (1, "low"), (2, "high"), (3, "low")
    ]


def test_values_derived_table_labels(glue):
    """VALUES usable as a derived table / join operand with the
    reference's unnamed_{i} labels, and as a trailing set-op operand."""
    _fresh(glue, "vdt")
    glue.execute("CREATE TABLE vdt (id INTEGER)")
    glue.execute("INSERT INTO vdt (id) VALUES (1), (2), (3)")
    out = glue.execute("SELECT unnamed_0 FROM (VALUES (10), (20)) t")
    assert out.labels == ["unnamed_0"]
    assert sorted(out.rows) == [(10,), (20,)]
    out = glue.execute(
        "SELECT vdt.id AS pid FROM vdt"
        " JOIN (VALUES (1), (2)) v ON vdt.id = v.unnamed_0"
    )
    assert sorted(out.rows) == [(1,), (2,)]
    # explicit column aliases still win over unnamed_{i}
    out = glue.execute(
        "SELECT t.a FROM (VALUES (1, 'x'), (2, 'y')) AS t(a, b)"
    )
    assert sorted(out.rows) == [(1,), (2,)]
    # VALUES as the second set-operation operand; trailing ORDER BY /
    # LIMIT still scope over the whole set operation
    out = glue.execute("SELECT id FROM vdt UNION VALUES (99)")
    assert sorted(out.rows) == [(1,), (2,), (3,), (99,)]
    out = glue.execute(
        "SELECT id FROM vdt UNION VALUES (99) ORDER BY 1 DESC LIMIT 2"
    )
    assert out.rows == [(99,), (3,)]
    out = glue.execute("SELECT id FROM vdt WHERE id IN (VALUES (1), (3))")
    assert sorted(out.rows) == [(1,), (3,)]


def test_register_udf(glue):
    """Host-registered scalar functions are callable from engine SQL —
    both row-wise and Arrow-vectorized pandas variants (SURVEY §2.10:
    beyond-reference; the reference has no function extensibility)."""
    glue.execute("DROP TABLE IF EXISTS UdfT")
    glue.execute("CREATE TABLE UdfT (id INTEGER NULL, s TEXT NULL)")
    glue.execute(
        "INSERT INTO UdfT (id, s) VALUES (1, 'ab'), (2, 'xyz'), (3, NULL)"
    )

    glue.register_udf("shout", lambda s: s.upper() + "!" if s else None)
    assert sorted(
        glue.execute("SELECT shout(s) AS r FROM UdfT").rows,
        key=lambda r: (r[0] is None, r[0]),
    ) == [("AB!",), ("XYZ!",), (None,)]

    def squared(col):
        return col * col

    glue.register_udf("squared", squared, "bigint", pandas=True)
    assert sorted(
        glue.execute("SELECT squared(id) AS sq FROM UdfT").rows
    ) == [(1,), (4,), (9,)]


def test_register_udaf_and_udtf(glue):
    """Aggregate and table functions registered from the host language,
    used from engine SQL (SURVEY §2.10 — the full UDF/UDAF/UDTF surface
    the reference lacks)."""
    import pandas as pd

    glue.execute("DROP TABLE IF EXISTS FnT")
    glue.execute("CREATE TABLE FnT (g INTEGER, x INTEGER)")
    glue.execute(
        "INSERT INTO FnT (g, x) VALUES (1, 2), (1, 8), (2, 5), (2, 5)"
    )

    def second_moment(v: pd.Series) -> float:
        return float((v.astype("float64") ** 2).mean())

    glue.register_udaf("second_moment", second_moment, "double")
    assert glue.execute(
        "SELECT g, second_moment(x) AS m2 FROM FnT GROUP BY g ORDER BY g"
    ).rows == [(1, 34.0), (2, 25.0)]

    from pyspark.sql.functions import udtf

    @udtf(returnType="word STRING, wlen INT")
    class SplitWords:
        def eval(self, s: str):
            for w in (s or "").split(" "):
                yield (w, len(w))

    glue.register_udtf("split_words", SplitWords)
    assert glue.execute(
        "SELECT word, wlen FROM split_words('scan join agg')"
    ).rows == [("scan", 4), ("join", 4), ("agg", 3)]


def test_merge_upsert_delete_and_errors(glue):
    """MERGE INTO (beyond-reference): matched UPDATE, unmatched INSERT
    through the validated write path, matched DELETE, standard-mandated
    error on a target row matching multiple source rows."""
    import pytest

    from multisql_spark.session import EngineError

    _fresh(glue, "m_t")
    _fresh(glue, "m_s")
    glue.execute("CREATE TABLE m_t (id INTEGER, v TEXT NULL, n INTEGER NULL)")
    glue.execute("INSERT INTO m_t VALUES (1,'a',10),(2,'b',20),(3,'c',30)")
    glue.execute("CREATE TABLE m_s (id INTEGER, v TEXT NULL)")
    glue.execute("INSERT INTO m_s VALUES (2,'B'),(4,'D')")
    p = glue.execute(
        "MERGE INTO m_t USING m_s ON m_t.id = m_s.id"
        " WHEN MATCHED THEN UPDATE SET v = m_s.v, n = m_t.n + 1"
        " WHEN NOT MATCHED THEN INSERT (id, v, n) VALUES (m_s.id, m_s.v, 0)"
    )
    assert p.kind == "Merge" and p.count == 2
    assert sorted(glue.execute("SELECT * FROM m_t").rows) == [
        (1, "a", 10), (2, "B", 21), (3, "c", 30), (4, "D", 0),
    ]
    glue.execute(
        "MERGE INTO m_t USING (SELECT 4 AS id) AS s ON m_t.id = s.id"
        " WHEN MATCHED THEN DELETE"
    )
    assert sorted(r[0] for r in glue.execute("SELECT id FROM m_t").rows) \
        == [1, 2, 3]
    glue.execute("INSERT INTO m_s VALUES (2,'Z')")
    with pytest.raises(EngineError, match="multiple source rows"):
        glue.execute(
            "MERGE INTO m_t USING m_s ON m_t.id = m_s.id"
            " WHEN MATCHED THEN UPDATE SET v = m_s.v"
        )
    with pytest.raises(EngineError):
        glue.execute(
            "MERGE INTO m_t USING m_s ON m_t.id = m_s.id"
            " WHEN NOT MATCHED THEN DELETE"
        )


def test_insert_overwrite_replaces_contents(glue):
    """INSERT OVERWRITE replaces table data, keeps constraints and the
    auto-increment counter, and restores the old contents when the
    incoming batch fails validation."""
    import pytest

    from multisql_spark.session import EngineError, UniqueViolation

    _fresh(glue, "ow")
    glue.execute("CREATE TABLE ow (id INTEGER AUTO_INCREMENT, v TEXT UNIQUE)")
    glue.execute("INSERT INTO ow (v) VALUES ('a'), ('b')")
    p = glue.execute("INSERT OVERWRITE ow (v) VALUES ('c'), ('d'), ('e')")
    assert p.count == 3
    rows = sorted(glue.execute("SELECT id, v FROM ow").rows)
    # counter continued from 2 — overwrite is not a counter reset
    assert rows == [(3, "c"), (4, "d"), (5, "e")]
    with pytest.raises((EngineError, UniqueViolation)):
        glue.execute("INSERT OVERWRITE ow (v) VALUES ('x'), ('x')")
    # failed overwrite must not lose the previous contents
    assert sorted(r[0] for r in glue.execute("SELECT v FROM ow").rows) \
        == ["c", "d", "e"]
    glue.execute("INSERT OVERWRITE TABLE ow (v) VALUES ('z')")
    assert [r[0] for r in glue.execute("SELECT v FROM ow").rows] == ["z"]


def test_materialized_view_refresh_cycle(glue):
    """Materialized views pin their query's result until REFRESH: reads
    between refreshes see the stale snapshot; refresh re-evaluates; drop
    removes it."""
    import pytest

    from multisql_spark.session import TableNotFoundError

    _fresh(glue, "mv_base")
    glue.execute("DROP MATERIALIZED VIEW IF EXISTS mv_sum")
    glue.execute("CREATE TABLE mv_base (a INTEGER)")
    glue.execute("INSERT INTO mv_base (a) VALUES (1),(2),(3)")
    glue.execute(
        "CREATE MATERIALIZED VIEW mv_sum AS"
        " SELECT COUNT(1) AS n, SUM(a) AS s FROM mv_base"
    )
    assert glue.execute("SELECT n, s FROM mv_sum").rows == [(3, 6)]
    glue.execute("INSERT INTO mv_base (a) VALUES (10)")
    # stale until refreshed
    assert glue.execute("SELECT n, s FROM mv_sum").rows == [(3, 6)]
    glue.execute("REFRESH MATERIALIZED VIEW mv_sum")
    assert glue.execute("SELECT n, s FROM mv_sum").rows == [(4, 16)]
    glue.execute("DROP MATERIALIZED VIEW mv_sum")
    with pytest.raises(TableNotFoundError):
        glue.execute("REFRESH MATERIALIZED VIEW mv_sum")


def test_qualify_window_filter(glue):
    """QUALIFY (DuckDB/BigQuery-style window-filter sugar) rewrites into
    a nested windowed select; predicates may reference select-item
    aliases or inline window functions, and tail ORDER/LIMIT applies to
    the filtered rows."""
    glue.execute("CREATE TABLE Ql (grp INTEGER NULL, v INTEGER NULL)")
    glue.execute(
        "INSERT INTO Ql VALUES (1, 10), (1, 20), (2, 5), (2, 7), (2, 3)"
    )
    assert sorted(
        glue.execute(
            "SELECT grp, v, ROW_NUMBER() OVER "
            "(PARTITION BY grp ORDER BY v DESC) AS rn "
            "FROM Ql QUALIFY rn = 1"
        ).rows
    ) == [(1, 20, 1), (2, 7, 1)]
    assert sorted(
        glue.execute(
            "SELECT grp, v FROM Ql QUALIFY ROW_NUMBER() OVER "
            "(PARTITION BY grp ORDER BY v DESC) <= 2 "
            "ORDER BY grp, v LIMIT 3"
        ).rows
    ) == [(1, 10), (1, 20), (2, 5)]
    assert glue.execute(
        "SELECT grp, SUM(v) AS s FROM Ql GROUP BY grp "
        "QUALIFY RANK() OVER (ORDER BY SUM(v) DESC) = 1"
    ).rows == [(1, 30)]
    glue.execute("DROP TABLE Ql")


def test_recursive_cte(glue):
    """WITH RECURSIVE passes through the dialect to Spark 4's native
    recursive-CTE execution (beyond reference — the reference has plain
    CTEs only, tests/query/with.rs).  Bounded recursion: series
    generation and a DAG hierarchy rollup.  (Cycle-safe UNION recursion
    is not yet in Spark; cyclic graphs use the iterative semi-naive
    loop in operators/dedup.py::connected_components instead.)"""
    rows = glue.execute(
        "WITH RECURSIVE r (n) AS ("
        " SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 5"
        ") SELECT n FROM r ORDER BY n"
    ).rows
    assert rows == [(1,), (2,), (3,), (4,), (5,)]

    glue.execute("CREATE TABLE OrgR (id INTEGER, mgr INTEGER NULL)")
    glue.execute(
        "INSERT INTO OrgR VALUES (1, NULL), (2, 1), (3, 1), (4, 2), (5, 2)"
    )
    rows = glue.execute(
        "WITH RECURSIVE chain (id, depth) AS ("
        " SELECT id, 0 FROM OrgR WHERE mgr IS NULL"
        " UNION ALL"
        " SELECT o.id, c.depth + 1 FROM OrgR o JOIN chain c ON o.mgr = c.id"
        ") SELECT depth, COUNT(*) AS n FROM chain GROUP BY depth"
        " ORDER BY depth"
    ).rows
    assert rows == [(0, 1), (1, 2), (2, 2)]
    glue.execute("DROP TABLE OrgR")


def test_explain_analyze(glue):
    """EXPLAIN ANALYZE executes the query and returns the AQE-resolved
    executed plan (beyond reference — it has no plan introspection)."""
    glue.execute("CREATE TABLE Ea (v INTEGER NULL)")
    glue.execute("INSERT INTO Ea VALUES (1), (2), (3)")
    rows = glue.execute(
        "EXPLAIN ANALYZE SELECT SUM(v) AS s FROM Ea"
    ).rows
    text = "\n".join(r[0] for r in rows)
    assert "AdaptiveSparkPlan" in text and "isFinalPlan=true" in text
    assert "HashAggregate" in text
    glue.execute("DROP TABLE Ea")


def test_show_statements(glue, sf_dir):
    _fresh(glue, "sh1")
    glue.execute("CREATE TABLE sh1 (a INTEGER, b TEXT)")
    dbs = glue.execute("SHOW DATABASES")
    assert dbs.labels == ["database"] and ("main",) in dbs.rows
    tables = glue.execute("SHOW TABLES")
    assert ("sh1",) in tables.rows
    cols = glue.execute("SHOW COLUMNS FROM sh1")
    assert cols.rows == [("a", "Int"), ("b", "Text")]
    assert glue.execute("DESCRIBE sh1").rows == cols.rows
    assert glue.execute("DESC sh1").rows == cols.rows
    glue.execute(f"CREATE DATABASE IF NOT EXISTS shdb LOCATION '{sf_dir}/'")
    ext = glue.execute("SHOW TABLES FROM shdb")
    assert ("nation",) in ext.rows
    import pytest as _pytest

    from multisql_spark.session import UnsupportedError

    with _pytest.raises(UnsupportedError):
        glue.execute("SHOW GRANTS")


def test_export_import_database(glue, tmp_path):
    _fresh(glue, "exp1")
    _fresh(glue, "exp2")
    glue.execute(
        "CREATE TABLE exp1 (id INTEGER AUTO_INCREMENT, v TEXT UNIQUE)"
    )
    glue.execute("INSERT INTO exp1 (v) VALUES ('a'), ('b')")
    glue.execute("CREATE TABLE exp2 (x INTEGER NULL)")
    glue.execute("INSERT INTO exp2 VALUES (1), (NULL)")
    root = str(tmp_path / "dump")
    out = glue.execute(f"EXPORT DATABASE TO '{root}'")
    assert out.rows[0][0] >= 2

    glue.execute("DROP TABLE exp1")
    glue.execute("DROP TABLE exp2")
    res = glue.execute(f"IMPORT DATABASE FROM '{root}'")
    assert res.rows[0][0] >= 2
    assert sorted(glue.execute("SELECT * FROM exp1").rows) == [
        (1, "a"), (2, "b"),
    ]
    assert sorted(
        glue.execute("SELECT * FROM exp2").rows, key=lambda r: (r[0] is None, r)
    ) == [(1,), (None,)]
    # options survive: auto-increment continues, UNIQUE still enforced
    glue.execute("INSERT INTO exp1 (v) VALUES ('c')")
    assert (3, "c") in glue.execute("SELECT * FROM exp1").rows
    import pytest as _pytest

    from multisql_spark.session import UniqueViolation

    with _pytest.raises(UniqueViolation):
        glue.execute("INSERT INTO exp1 (v) VALUES ('a')")


def test_export_includes_dunder_named_table(glue, tmp_path, sf_dir):
    """A managed table legitimately named a__b must survive the dump:
    attached-db shadow entries are excluded structurally (persist_path),
    not by a '__' name substring (ADVICE r2 #3)."""
    _fresh(glue, "a__b")
    glue.execute("CREATE TABLE a__b (id INTEGER)")
    glue.execute("INSERT INTO a__b VALUES (7)")
    glue.execute(
        f"CREATE DATABASE IF NOT EXISTS expdb LOCATION '{sf_dir}/'"
    )
    root = str(tmp_path / "dump2")
    glue.execute(f"EXPORT DATABASE TO '{root}'")
    import json
    import os

    with open(os.path.join(root, "_manifest.json")) as fh:
        manifest = json.load(fh)
    assert "a__b" in manifest
    # attached-db tables are excluded by design (they live in sf_dir)
    assert not any(k.startswith("expdb__") for k in manifest)
    glue.execute("DROP TABLE a__b")
    glue.execute(f"IMPORT DATABASE FROM '{root}'")
    assert glue.execute("SELECT * FROM a__b").rows == [(7,)]
