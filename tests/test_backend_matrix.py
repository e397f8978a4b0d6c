"""Storage-conformance matrix: the SAME smoke content runs against every
backend — identical test body per backend, mirroring the reference's
registry in tests/databases/memory.rs, tests/databases/sled.rs,
tests/databases/csv.rs, tests/databases/sheet.rs (each submits the
shared suite with a per-backend exception list; SURVEY §5).

Backends here: managed temp-view (= memory), parquet directory (= sled,
the native store), CSV file, JSON-lines file, XLSX workbook. Each gets
the same DDL-equivalent setup, DML sequence, and query assertions; the
file-backed ones additionally prove persistence across a re-attach.
"""

from __future__ import annotations

import pytest

from multisql_spark.session import MultiSQLSession

CONTENT = [
    (1, "alpha", 10),
    (2, "beta", 20),
    (3, "gamma", 30),
]


def _seed_file(backend: str, path: str) -> None:
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE smoke (id BIGINT, name TEXT, val BIGINT)")
    con.executemany("INSERT INTO smoke VALUES (?, ?, ?)", CONTENT)
    if backend == "parquet":
        con.execute(f"COPY smoke TO '{path}/smoke.parquet'")
    elif backend == "csv":
        con.execute(f"COPY smoke TO '{path}' (HEADER, DELIMITER ',')")
    elif backend == "json":
        con.execute(f"COPY smoke TO '{path}'")
    elif backend == "xlsx":
        from multisql_spark.sources import xlsx

        xlsx.write_workbook(
            path,
            {"smoke": [["id", "name", "val"], *[list(r) for r in CONTENT]]},
        )


@pytest.mark.parametrize(
    "backend", ["memory", "parquet", "csv", "json", "xlsx"]
)
def test_backend_conformance(backend, spark, tmp_path_factory):
    g = MultiSQLSession(spark)
    if backend == "memory":
        g.execute("DROP TABLE IF EXISTS smoke")
        g.execute("CREATE TABLE smoke (id INTEGER, name TEXT, val INTEGER)")
        g.execute(
            "INSERT INTO smoke (id, name, val) VALUES"
            " (1, 'alpha', 10), (2, 'beta', 20), (3, 'gamma', 30)"
        )
        table = "smoke"
    else:
        base = tmp_path_factory.mktemp(f"bk_{backend}")
        path = {
            "parquet": str(base),
            "csv": str(base / "smoke.csv"),
            "json": str(base / "smoke.json"),
            "xlsx": str(base / "smoke.xlsx"),
        }[backend]
        _seed_file(backend, path)
        loc = path + "/" if backend == "parquet" else path
        g.execute(f"CREATE DATABASE bk_{backend} LOCATION '{loc}'")
        table = f"bk_{backend}.smoke"

    # identical smoke body per backend (reference databases/*.rs style)
    assert g.execute(f"SELECT COUNT(*) AS n FROM {table}").rows == [(3,)]
    assert sorted(
        g.execute(f"SELECT name FROM {table} WHERE val >= 20").rows
    ) == [("beta",), ("gamma",)]
    assert g.execute(
        f"SELECT SUM(val) AS s, MIN(id) AS mn FROM {table}"
    ).rows == [(60, 1)]

    g.execute(f"INSERT INTO {table} (id, name, val) VALUES (4, 'delta', 40)")
    g.execute(f"UPDATE {table} SET val = val + 1 WHERE id = 1")
    g.execute(f"DELETE FROM {table} WHERE id = 2")
    assert sorted(g.execute(f"SELECT id, val FROM {table}").rows) == [
        (1, 11), (3, 30), (4, 40),
    ]

    if backend != "memory":
        # persistence: a fresh attach must see the mutations
        g2 = MultiSQLSession(spark)
        g2.execute(f"CREATE DATABASE rk_{backend} LOCATION '{loc}'")
        assert sorted(
            g2.execute(f"SELECT id, val FROM rk_{backend}.smoke").rows
        ) == [(1, 11), (3, 30), (4, 40)]


def test_cross_database_insert_select(spark, tmp_path_factory):
    """INSERT INTO db1.t SELECT ... FROM db2.t — write path and read path
    each resolve through a different attached backend (reference
    multi-database federation, src/glue/mod.rs:33-37)."""
    base_a = tmp_path_factory.mktemp("xdb_a")
    base_b = tmp_path_factory.mktemp("xdb_b")
    _seed_file("parquet", str(base_a))
    _seed_file("csv", str(base_b / "smoke.csv"))
    g = MultiSQLSession(spark)
    g.execute(f"CREATE DATABASE da LOCATION '{base_a}/'")
    g.execute(f"CREATE DATABASE db LOCATION '{base_b / 'smoke.csv'}'")
    g.execute(
        "INSERT INTO da.smoke (id, name, val)"
        " SELECT id + 10, name, val * 2 FROM db.smoke WHERE val >= 20"
    )
    assert sorted(g.execute("SELECT id, val FROM da.smoke").rows) == [
        (1, 10), (2, 20), (3, 30), (12, 40), (13, 60),
    ]
    # joined read across both backends after the write
    out = g.execute(
        "SELECT COUNT(*) AS n FROM da.smoke a"
        " JOIN db.smoke b ON a.name = b.name"
    )
    assert out.rows == [(5,)]


def test_parquet_backend_runs_base_suite(spark, tmp_path):
    """The reference runs its full `base` ability suite against sled with
    no exceptions (tests/databases/sled.rs `exceptions: &[]`); parquet is
    our sled-equivalent native store, so the condensed base bodies
    (basic.rs, filter, aggregate, join) must all work against an attached
    parquet database — DDL, row-at-a-time DML, and query shapes included."""
    g = MultiSQLSession(spark)
    g.execute(f"CREATE DATABASE sledp LOCATION '{tmp_path}/'")

    # tests/ability/base/basic.rs
    for num in (0, 1):
        g.execute(
            f"CREATE TABLE sledp.basic_{num}"
            " (id INTEGER, num INTEGER, name TEXT)"
        )
    g.execute("INSERT INTO sledp.basic_0 (id, num, name) VALUES (1, 2, 'Hello')")
    g.execute("INSERT INTO sledp.basic_0 (id, num, name) VALUES (1, 9, 'World')")
    g.execute(
        "INSERT INTO sledp.basic_0 (id, num, name)"
        " VALUES (3, 4, 'Great'), (4, 7, 'Job')"
    )
    g.execute(
        "INSERT INTO sledp.basic_1 (id, num, name)"
        " SELECT id, num, name FROM sledp.basic_0"
    )
    g.execute("CREATE TABLE sledp.basic_a (id INTEGER)")
    g.execute("INSERT INTO sledp.basic_a (id) SELECT id FROM sledp.basic_0")
    assert sorted(g.execute("SELECT id FROM sledp.basic_a").rows) == [
        (1,), (1,), (3,), (4,),
    ]
    assert sorted(
        g.execute("SELECT id, num, name FROM sledp.basic_1").rows
    ) == [(1, 2, "Hello"), (1, 9, "World"), (3, 4, "Great"), (4, 7, "Job")]
    g.execute("UPDATE sledp.basic_0 SET id = 2")
    assert g.execute("SELECT id FROM sledp.basic_0").rows == [
        (2,), (2,), (2,), (2,),
    ]

    # filter + aggregate + join shapes against the same attached store
    assert sorted(
        g.execute(
            "SELECT name FROM sledp.basic_1 WHERE num * 2 >= 8 AND id < 4"
        ).rows
    ) == [("Great",), ("World",)]
    assert g.execute(
        "SELECT id, SUM(num) AS s, COUNT(1) AS n FROM sledp.basic_1"
        " GROUP BY id HAVING SUM(num) > 4 ORDER BY id"
    ).rows == [(1, 11, 2), (4, 7, 1)]
    assert sorted(
        g.execute(
            "SELECT a.name, b.id FROM sledp.basic_1 a"
            " JOIN sledp.basic_a b ON a.id = b.id WHERE a.num < 5"
        ).rows
    ) == [("Great", 3), ("Hello", 1), ("Hello", 1)]

    # persistence of every mutation across a re-attach
    g2 = MultiSQLSession(spark)
    g2.execute(f"CREATE DATABASE sledq LOCATION '{tmp_path}/'")
    assert g2.execute("SELECT id FROM sledq.basic_0").rows == [
        (2,), (2,), (2,), (2,),
    ]
    assert len(g2.execute("SELECT * FROM sledq.basic_a").rows) == 4
