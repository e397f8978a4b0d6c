"""Engine-layer (DDL/DML) queries — the reference's statement surface
(SURVEY.md §2.11) driven end-to-end through :class:`MultiSQLSession`,
with declarative DuckDB oracles describing the expected final state.

Each query builds a scratch table from parquet data via the engine's SQL
path (CREATE / INSERT / UPDATE / DELETE / SET / VIEW), then returns the
resulting relation; the oracle reproduces the same state with plain
SELECT algebra (UPDATE ≡ CASE projection, DELETE ≡ negated filter,
AUTO_INCREMENT ≡ ROW_NUMBER).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from multisql_spark.queries import register
from multisql_spark.session import MultiSQLSession
from multisql_spark.tables import load_tables


def _engine(spark: SparkSession, sf_dir: str) -> MultiSQLSession:
    load_tables(spark, sf_dir)
    return MultiSQLSession(spark)


@register(
    "dml_insert_values_select",
    oracle="""
    SELECT CAST(id AS BIGINT) AS id, name, CAST(qty AS BIGINT) AS qty
    FROM (
      VALUES (1, 'seed-a', 10), (2, 'seed-b', 20)
    ) AS seed(id, name, qty)
    UNION ALL
    SELECT CAST(n_nationkey + 100 AS BIGINT), n_name,
           CAST(n_regionkey AS BIGINT)
    FROM nation WHERE n_regionkey >= 3
    """,
    tags=("dml", "insert"),
)
def dml_insert_values_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT … VALUES + INSERT … SELECT through the engine write path
    (reference alter_row/insert.rs:10-98: both sources share the SELECT
    machinery)."""
    g = _engine(spark, sf_dir)
    g.execute("DROP TABLE IF EXISTS ins_demo")
    g.execute("CREATE TABLE ins_demo (id INTEGER, name TEXT, qty INTEGER)")
    g.execute(
        "INSERT INTO ins_demo (id, name, qty) VALUES"
        " (1, 'seed-a', 10), (2, 'seed-b', 20)"
    )
    g.execute(
        "INSERT INTO ins_demo SELECT n_nationkey + 100, n_name, n_regionkey"
        " FROM nation WHERE n_regionkey >= 3"
    )
    return g.sql("SELECT id, name, qty FROM ins_demo")


@register(
    "dml_update_where",
    oracle="""
    SELECT
      CAST(n_nationkey AS BIGINT) AS n_nationkey,
      CASE WHEN n_regionkey = 0 THEN upper(n_name) ELSE n_name END AS n_name,
      CAST(CASE WHEN n_regionkey = 0 THEN n_regionkey + 10
           ELSE n_regionkey END AS BIGINT) AS n_regionkey
    FROM nation
    """,
    tags=("dml", "update"),
)
def dml_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE with WHERE and multi-column SET (reference
    alter_row/update.rs:12-138) ≡ CASE projection oracle."""
    g = _engine(spark, sf_dir)
    g.execute("DROP TABLE IF EXISTS upd_demo")
    g.execute("CREATE TABLE upd_demo AS SELECT * FROM nation")
    g.execute(
        "UPDATE upd_demo SET n_name = UPPER(n_name),"
        " n_regionkey = n_regionkey + 10 WHERE n_regionkey = 0"
    )
    return g.sql(
        "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,"
        " CAST(n_regionkey AS BIGINT) AS n_regionkey FROM upd_demo"
    )


@register(
    "dml_delete_where",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment
    FROM customer
    WHERE NOT (c_acctbal < 0 OR c_mktsegment = 'MACHINERY')
    """,
    tags=("dml", "delete"),
)
def dml_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE WHERE (reference alter_row/delete.rs:11-71) ≡ negated
    filter oracle."""
    g = _engine(spark, sf_dir)
    g.execute("DROP TABLE IF EXISTS del_demo")
    g.execute(
        "CREATE TABLE del_demo AS SELECT c_custkey, c_acctbal, c_mktsegment"
        " FROM customer"
    )
    g.execute(
        "DELETE FROM del_demo WHERE c_acctbal < 0 OR c_mktsegment ="
        " 'MACHINERY'"
    )
    return g.sql(
        "SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment"
        " FROM del_demo"
    )


@register(
    "dml_auto_increment",
    oracle="""
    SELECT
      CAST(ROW_NUMBER() OVER (ORDER BY r_regionkey) AS BIGINT) AS id,
      r_name AS name
    FROM region
    """,
    tags=("dml", "auto-increment"),
)
def dml_auto_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTO_INCREMENT id assignment on insert (reference
    alter_row/auto_increment.rs; dense row_number-based ids — SURVEY
    §2.11 notes the 100 TB tradeoff)."""
    g = _engine(spark, sf_dir)
    g.execute("DROP TABLE IF EXISTS ai_demo")
    g.execute("CREATE TABLE ai_demo (id INTEGER AUTO_INCREMENT, name TEXT)")
    g.execute(
        "INSERT INTO ai_demo (name)"
        " SELECT r_name FROM region ORDER BY r_regionkey"
    )
    return g.sql("SELECT id, name FROM ai_demo")


@register(
    "session_variables",
    oracle="""
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
           CAST(p_size AS BIGINT) AS p_size,
           CAST(p_size * 3 AS BIGINT) AS scaled
    FROM part WHERE p_size > 40
    """,
    tags=("session", "variables"),
)
def session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET @var substitution at plan time (reference set_variable.rs +
    simplify_by_tempdb, recipe/new.rs:24-47)."""
    g = _engine(spark, sf_dir)
    g.execute("SET @threshold = 40")
    g.execute("SET @factor = 3")
    return g.sql(
        "SELECT CAST(p_partkey AS BIGINT) AS p_partkey,"
        " CAST(p_size AS BIGINT) AS p_size,"
        " CAST(p_size * @factor AS BIGINT) AS scaled"
        " FROM part WHERE p_size > @threshold"
    )


@register(
    "view_over_join",
    oracle="""
    SELECT n_name, COUNT(*) AS n_cust
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c_acctbal > 0
    GROUP BY n_name
    """,
    tags=("view",),
)
def view_over_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE VIEW + query-through-view (reference create/view.rs:7-61,
    resolved at scan time via get_view_query)."""
    g = _engine(spark, sf_dir)
    g.execute(
        "CREATE OR REPLACE VIEW v_cust_nation AS"
        " SELECT n_name, c_acctbal FROM customer c"
        " JOIN nation n ON c.c_nationkey = n.n_nationkey"
    )
    return g.sql(
        "SELECT n_name, COUNT(*) AS n_cust FROM v_cust_nation"
        " WHERE c_acctbal > 0 GROUP BY n_name"
    )


@register(
    "multi_database_join",
    oracle="""
    SELECT r_name, COUNT(*) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r_name
    """,
    tags=("database", "federation"),
)
def multi_database_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-database query with db.table names (reference multi-database
    federation, src/glue/mod.rs:34-36, src/data/types.rs:29-33)."""
    g = _engine(spark, sf_dir)
    g.execute(f"CREATE DATABASE lake LOCATION '{sf_dir}/'")
    # r_name is aliased explicitly: with attached-db schemas visible the
    # dialect now labels bare columns `table.column` in multi-table
    # queries (reference planned.rs:252-274), and the oracle contract
    # wants the plain name
    return g.sql(
        "SELECT r_name AS r_name, COUNT(*) AS n_nations"
        " FROM lake.nation n JOIN lake.region r"
        " ON n.n_regionkey = r.r_regionkey GROUP BY r_name"
    )


@register(
    "dml_merge_upsert",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
           CASE WHEN n_regionkey >= 2 THEN lower(n_name) ELSE n_name END
             AS n_name,
           CAST(CASE WHEN n_regionkey >= 2 THEN n_regionkey + 100
                ELSE n_regionkey END AS BIGINT) AS n_regionkey
    FROM nation
    UNION ALL
    SELECT CAST(n_nationkey + 500 AS BIGINT),
           'new_' || n_name,
           CAST(-1 AS BIGINT)
    FROM nation WHERE n_regionkey = 0
    """,
    tags=("dml", "merge"),
)
def dml_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (beyond-reference upsert — the ingestion-pipeline DML):
    matched rows update column-wise from the source, unmatched source
    rows insert through the validated write path. Oracle ≡ CASE
    projection UNION the anti-joined inserts."""
    g = _engine(spark, sf_dir)
    g.execute("DROP TABLE IF EXISTS mrg_demo")
    g.execute(
        "CREATE TABLE mrg_demo AS"
        " SELECT n_nationkey, n_name, n_regionkey FROM nation"
    )
    g.execute(
        "MERGE INTO mrg_demo AS t USING ("
        " SELECT n_nationkey AS k, lower(n_name) AS nm FROM nation"
        " WHERE n_regionkey >= 2"
        " UNION ALL"
        " SELECT n_nationkey + 500, 'new_' || n_name FROM nation"
        " WHERE n_regionkey = 0"
        ") AS s ON t.n_nationkey = s.k"
        " WHEN MATCHED THEN UPDATE SET n_name = s.nm,"
        " n_regionkey = t.n_regionkey + 100"
        " WHEN NOT MATCHED THEN INSERT (n_nationkey, n_name, n_regionkey)"
        " VALUES (s.k, s.nm, -1)"
    )
    return g.sql(
        "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,"
        " CAST(n_regionkey AS BIGINT) AS n_regionkey FROM mrg_demo"
    )


@register(
    "dml_matview_refresh",
    oracle="""
    SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
           COUNT(*) AS n
    FROM (
      SELECT n_regionkey FROM nation
      UNION ALL
      SELECT 9 AS n_regionkey
    ) GROUP BY n_regionkey
    """,
    tags=("dml", "matview"),
)
def dml_matview_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view lifecycle through the engine: snapshot a rollup,
    mutate the base, REFRESH, read the re-evaluated result. Oracle ≡ the
    rollup over the mutated base."""
    g = _engine(spark, sf_dir)
    g.execute("DROP TABLE IF EXISTS mvr_base")
    g.execute("DROP MATERIALIZED VIEW IF EXISTS mvr_roll")
    g.execute("CREATE TABLE mvr_base AS SELECT n_regionkey FROM nation")
    g.execute(
        "CREATE MATERIALIZED VIEW mvr_roll AS"
        " SELECT n_regionkey, COUNT(1) AS n FROM mvr_base GROUP BY n_regionkey"
    )
    g.execute("INSERT INTO mvr_base (n_regionkey) VALUES (9)")
    g.execute("REFRESH MATERIALIZED VIEW mvr_roll")
    return g.sql(
        "SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,"
        " CAST(n AS BIGINT) AS n FROM mvr_roll"
    )
