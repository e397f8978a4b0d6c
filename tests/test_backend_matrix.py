"""Storage-conformance matrix: the SAME smoke content runs against every
backend (reference tests/databases/{memory,sled,csv,sheet}.rs — identical
test body per backend; SURVEY §5).

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
