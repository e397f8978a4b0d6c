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
