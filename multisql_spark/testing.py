"""Local duckdb-oracle comparison harness.

Mirrors the driver's t2 check: run the Spark query and the oracle SQL on
the same parquet tables, then compare row count, column names and the
order-insensitive multiset of values. Exact equality here is strictly
stronger than any value-hash the driver applies.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from multisql_spark.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Bound the oracle's resources: a pair-explosive oracle at a large SF
    # must FAIL FAST with a clean out-of-temp error, not spill until the
    # machine's disk is full (the pagerank oracle wrote 73 GB of spill at
    # sf0.1 before this cap existed).  Extreme-scale sweeps (derived
    # sf1000, where LEGITIMATE oracles need tens of GB of sort spill)
    # raise the caps per-run via the env knobs instead of loosening the
    # fail-fast default for everyone.
    import os

    con.execute(
        "SET memory_limit="
        f"'{os.environ.get('SPARK_GRAFT_ORACLE_MEM', '24GB')}'"
    )
    # Per-PROCESS spill dir: DuckDB temp block filenames are generated
    # from a per-process counter, so two concurrent oracle processes
    # sharing a cwd-relative '.tmp' CLOBBER each other's spill blocks —
    # seen as "Cannot open file .tmp/duckdb_temp_block-...: No such
    # file or directory" in the r10 parallel sf1000 sweep (and the
    # likely cause of r9's unexplained 'co-load transient' oracle
    # failures).  The per-pid suffix makes parallel sweep streams safe;
    # atexit reclaims the directory.
    tmpdir = f".tmp/p{os.getpid()}"
    # DuckDB's SET temp_directory mkdirs ONE level lazily at first
    # spill: with no pre-existing '.tmp' the parent is missing and the
    # first spilling oracle dies with "Failed to create directory
    # '.tmp/p<pid>': No such file or directory" (seen when a fresh
    # checkout ran the r10 sweep — the campaign tree only worked
    # because a pre-fix flat '.tmp' was still lying around).
    os.makedirs(tmpdir, exist_ok=True)
    if not getattr(duckdb_connection, "_cleanup_registered", False):
        import atexit
        import shutil

        atexit.register(shutil.rmtree, tmpdir, ignore_errors=True)
        duckdb_connection._cleanup_registered = True
    con.execute(f"SET temp_directory='{tmpdir}'")
    con.execute(
        "SET max_temp_directory_size="
        f"'{os.environ.get('SPARK_GRAFT_ORACLE_SPILL', '20GB')}'"
    )

    for name in TABLE_NAMES:
        path = f"{sf_dir}/{name}.parquet"
        # derived scale factors (tools/make_scaled_sf.py) are Spark
        # multi-file parquet DIRECTORIES; the driver's testdata is
        # single files — glob accordingly
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM {src}")
    return con


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, datetime.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"t:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return f"s:{v}"


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (like the driver), then sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        tuple(canon_cell(row[i]) for i in order) for row in rows
    )


def compare(spark_df, con, oracle_sql: str) -> dict:
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(oracle_sql)
    oracle_cols = [d[0] for d in rel.description]
    oracle_rows = rel.fetchall()

    result = {
        "rows_match": len(spark_rows) == len(oracle_rows),
        "schema_match": sorted(c.lower() for c in spark_cols)
        == sorted(c.lower() for c in oracle_cols),
        "spark_rows": len(spark_rows),
        "oracle_rows": len(oracle_rows),
        "spark_cols": spark_cols,
        "oracle_cols": oracle_cols,
    }
    if result["rows_match"] and result["schema_match"]:
        sc = canon_rows([c.lower() for c in spark_cols], spark_rows)
        oc = canon_rows([c.lower() for c in oracle_cols], oracle_rows)
        result["values_match"] = sc == oc
        if not result["values_match"]:
            diffs = [
                (a, b) for a, b in zip(sc, oc) if a != b
            ]
            result["first_diffs"] = diffs[:3]
    else:
        result["values_match"] = False
    result["ok"] = (
        result["rows_match"]
        and result["schema_match"]
        and result["values_match"]
    )
    return result
