"""The ``Glue``-equivalent session (reference ``src/glue/mod.rs:33-187``).

``MultiSQLSession`` owns a SparkSession, a named-database registry, session
variables and managed in-memory tables, and routes SQL statements the way
the reference's ``execute_parsed`` does (``src/executor/execute.rs:55-177``):

- queries (SELECT / VALUES / WITH / set-ops) → dialect rewrite → ``spark.sql``
- DDL (CREATE/DROP/ALTER TABLE, CREATE VIEW, CREATE INDEX, CREATE DATABASE)
- DML (INSERT / UPDATE / DELETE / TRUNCATE) over managed tables, with the
  reference's write-path validation: declared types, NOT NULL, DEFAULT,
  AUTO_INCREMENT, UNIQUE (``src/executor/alter_row/validate.rs:46-99``,
  ``validate_unique.rs:24-100``)
- ``SET @var = literal`` session variables (``src/executor/set_variable.rs``)
- ``EXPLAIN`` metadata introspection (``src/executor/other/explain.rs``)
- ``EXECUTE FILE('x.sql')`` scripts (``src/executor/procedure.rs``)

Managed tables are DataFrames re-pointed on each write (INSERT = union,
UPDATE = when/otherwise projection, DELETE = filter) — the Spark-idiomatic
equivalent of the reference's storage mutation; persistent databases attach
parquet/CSV directories through :mod:`multisql_spark.sources`.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from multisql_spark import dialect
from multisql_spark.payload import Payload


class EngineError(Exception):
    """Base engine error (reference returns a typed Error enum; these
    subclasses mirror its families so host code can catch specifically,
    DIVERGENCES #15)."""


class TableNotFoundError(EngineError):
    """FetchError::TableNotFound / ExecuteError::TableNotExists /
    AlterTableError::TableNotFound."""


class ColumnNotFoundError(EngineError):
    """ValidateError::ColumnNotFound / AlterTableError::ColumnNotFound."""


class AlreadyExistsError(EngineError):
    """CreateError::AlreadyExists / database-exists shapes."""


class NotNullViolation(EngineError):
    """ValidateError::NullValueOnNotNullField."""


class UniqueViolation(EngineError):
    """ValidateError::DuplicateEntryOnUniqueField."""


class UnsupportedError(EngineError):
    """ExecuteError::QueryNotSupported / AlterError::UnsupportedDataType /
    AlterError::UnsupportedColumnOption."""


# --- schema model (reference src/data/column.rs:13-20) ----------------------

_TYPE_MAP = {
    "BOOLEAN": "boolean",
    "BOOL": "boolean",
    "INT": "bigint",
    "INTEGER": "bigint",
    "BIGINT": "bigint",
    "UNSIGNED INT": "bigint",
    "UINT": "bigint",
    "FLOAT": "double",
    "DOUBLE": "double",
    "TEXT": "string",
    "STRING": "string",
    "VARCHAR": "string",
    "TIMESTAMP": "timestamp",
    # reference ValueType::Any (value_type/mod.rs:17, the DataType
    # fallthrough at :47): a column that accepts any value per row.
    # Spark 4 VARIANT carries per-row dynamic values; the Payload layer
    # collapses VariantVal cells back to native bool/int/float/str
    # (DIVERGENCES #4 — closed for declared-Any columns in r4).
    "ANY": "variant",
}


@dataclass
class ColumnDef:
    name: str
    type_str: str = "string"
    not_null: bool = False
    unique: bool = False
    default: str | None = None
    auto_increment: bool = False


@dataclass
class TableState:
    name: str
    columns: list[ColumnDef]
    df: DataFrame
    auto_counter: dict[str, int] = field(default_factory=dict)
    indexes: dict[str, dict] = field(default_factory=dict)
    # attached-storage write-back (reference DBMut, src/database/mutable.rs):
    # mutations rewrite the backing file, like the CSV backend's
    # whole-file rewrite (src/databases/csv/mutable.rs)
    persist_path: str | None = None
    persist_kind: str | None = None  # parquet | csv | json
    # mutations since the last lineage truncation; each INSERT/UPDATE/
    # DELETE stacks a plan node onto df, so every N mutations the plan is
    # cut with localCheckpoint (reference tables rewrite storage per
    # mutation — our equivalent cost, paid only every Nth statement)
    mutations: int = 0

    def column(self, name: str) -> ColumnDef | None:
        for c in self.columns:
            if c.name.lower() == name.lower():
                return c
        return None


def assign_dense_ids(
    df: DataFrame, col: str, start: int, dtype: str
) -> DataFrame:
    """Fill ``col`` with dense sequential ids ``start+1 .. start+n`` via
    block allocation — the scale path for AUTO_INCREMENT.

    The reference reserves contiguous id blocks transactionally
    (sled/auto_increment.rs:12-55); the Spark equivalent: count rows per
    partition (one tiny aggregate, ≤#partitions rows to the driver),
    cumulate per-partition starting offsets, then assign partition-LOCAL
    row_numbers plus the broadcast offset.  Ids come out identical to a
    global ``row_number() OVER (ORDER BY monotonically_increasing_id())``
    — mono ids order by (partition, local position) — but no
    single-reducer Window exists anywhere in the plan; every data-scale
    operation is partition-parallel.  Same trick as scale-safe NTILE
    (queries/core.py:911).

    The input is locally checkpointed first so the partition layout is
    pinned between the count job and the fill job (a re-planned source
    could otherwise repartition between the two)."""
    spark = df.sparkSession
    from pyspark.sql import Window as W

    need = df.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    counts = (
        need.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c")).collect()
    )
    offs, acc = [], start
    for r in sorted(counts, key=lambda x: x["__pid"]):
        offs.append((int(r["__pid"]), acc))
        acc += int(r["__c"])
    off_df = spark.createDataFrame(offs, "__pid int, __off bigint")
    w_local = W.partitionBy("__pid").orderBy(F.monotonically_increasing_id())
    return (
        need.withColumn("__rn", F.row_number().over(w_local))
        .join(F.broadcast(off_df), "__pid")
        .withColumn(col, (F.col("__rn") + F.col("__off")).cast(dtype))
        .drop("__pid", "__rn", "__off")
    )


def _spark_type(t: str) -> T.DataType:
    return {
        "boolean": T.BooleanType(),
        "bigint": T.LongType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "timestamp": T.TimestampType(),
        "variant": T.VariantType(),
    }[t]


_INTEGRAL = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)

# declared type → incoming Spark types accepted on write, mirroring the
# reference's Value::is (src/data/value/mod.rs:232-260): exact type, or the
# I64→F64 / I64↔Timestamp auto-widenings; everything else is
# IncompatibleDataType
_WRITE_COMPAT: dict[str, tuple] = {
    "boolean": (T.BooleanType,),
    "bigint": _INTEGRAL + (T.TimestampType,),
    "double": _INTEGRAL + (T.DoubleType, T.FloatType, T.DecimalType),
    "string": (T.StringType,),
    "timestamp": (T.TimestampType,) + _INTEGRAL,
}


# EXPLAIN <table> data_type display, matching the reference's ValueType
# ToString (src/data/value/value_type/cast.rs:31-44)
_VALUETYPE_DISPLAY = {
    "boolean": "Bool",
    "bigint": "Int",
    "int": "Int",
    "smallint": "Int",
    "tinyint": "Int",
    "double": "Float",
    "float": "Float",
    "string": "Text",
    "timestamp": "Timestamp",
    "timestamp_ntz": "Timestamp",
    "variant": "Any",
}


def _uq_key(cdef: ColumnDef):
    """Equality key for UNIQUE checks: variant (declared-Any) columns are
    not comparable/groupable in Spark, but their JSON rendering is a
    faithful per-kind equality key, so Any-typed UNIQUE dedups on it.

    Numeric kinds are normalized first: the reference's default
    ``implicit_float_conversion`` treats ``I64(1)`` and ``F64(1.0)`` as
    equal in ``validate_unique`` (value/mod.rs:159), while their JSON
    renderings ``1`` vs ``1.0`` differ — so integral-valued doubles and
    ints both key as the canonical integer string.  The kind probe uses
    ``schema_of_variant`` (not a value cast) so a STRING variant ``'1'``
    never collides with the number 1."""
    if cdef.type_str != "variant":
        return F.col(cdef.name)
    c = F.col(cdef.name)
    kind = F.schema_of_variant(c)
    big = F.try_variant_get(c, "$", "bigint")
    dbl = F.try_variant_get(c, "$", "double")
    # doubles that are exactly representable integers (within the f64
    # 2^53 exact-integer range) render as the integer string
    integral_dbl = (
        dbl.isNotNull()
        & (dbl == F.floor(dbl))
        & (F.abs(dbl) <= F.lit(9007199254740992.0))
    )
    return (
        F.when(kind.isin("BIGINT", "INT", "SMALLINT", "TINYINT"),
               big.cast("string"))
        .when(
            kind.isin("DOUBLE", "FLOAT") & integral_dbl,
            dbl.cast("bigint").cast("string"),
        )
        .when(kind.isin("DOUBLE", "FLOAT"), dbl.cast("string"))
        .otherwise(F.to_json(c))
    )


def _check_write_type(
    cdef: ColumnDef, incoming: T.DataType, ctx: str
) -> None:
    if isinstance(incoming, T.NullType):
        return
    if cdef.type_str == "variant":
        # reference Value::is: (ValueType::Any, _) => Ok(()) —
        # an Any column accepts every incoming type (value/mod.rs:240)
        return
    allowed = _WRITE_COMPAT.get(cdef.type_str)
    if allowed is None:  # adapter-inferred exotic type: no declared contract
        return
    if not isinstance(incoming, allowed):
        raise EngineError(
            f"incompatible data type for {ctx}.{cdef.name}:"
            f" {incoming.simpleString()} into {cdef.type_str}"
        )


# --- statement splitting ----------------------------------------------------


def split_statements(sql: str) -> list[str]:
    out, cur, in_str = [], [], False
    i = 0
    while i < len(sql):
        ch = sql[i]
        if in_str:
            cur.append(ch)
            if ch == "'":
                if i + 1 < len(sql) and sql[i + 1] == "'":
                    cur.append("'")
                    i += 1
                else:
                    in_str = False
        elif ch == "'":
            in_str = True
            cur.append(ch)
        elif ch == ";":
            if "".join(cur).strip():
                out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    if "".join(cur).strip():
        out.append("".join(cur).strip())
    return out


class MultiSQLSession:
    """Session over a SparkSession + named storages (the reference's
    ``Glue``)."""

    def __init__(self, spark: SparkSession | None = None):
        if spark is None:
            spark = (
                SparkSession.builder.master("local[*]")
                .appName("multisql_spark")
                .config("spark.sql.shuffle.partitions", "32")
                .config("spark.sql.adaptive.enabled", "true")
                .config("spark.sql.session.timeZone", "UTC")
                .getOrCreate()
            )
        self.spark = spark
        self.variables: dict[str, str] = {}
        self.tables: dict[str, TableState] = {}
        self.views: dict[str, str] = {}
        self.matviews: dict[str, str] = {}
        self.databases: dict[str, object] = {}

    # -- public API (reference src/glue/mod.rs:161-187) ---------------------

    def execute(self, sql: str) -> Payload:
        payloads = self.execute_many(sql)
        return payloads[-1] if payloads else Payload.success()

    def execute_many(self, sql: str) -> list[Payload]:
        from pyspark.errors.exceptions.base import PySparkException

        out = []
        for stmt in split_statements(sql):
            try:
                out.append(self._execute_one(stmt))
            except (PySparkException, ValueError) as exc:
                # surface Spark analysis/parse/runtime failures (ANSI cast
                # and datetime-parse errors included) and dialect-rewrite
                # rejections as engine errors (the reference returns its own
                # Error enum, not panics); well-known Spark error classes
                # map to the matching typed family
                cond = ""
                for getter in ("getCondition", "getErrorClass"):
                    try:
                        cond = getattr(exc, getter)() or ""
                        break
                    except Exception:
                        continue
                if "TABLE_OR_VIEW_NOT_FOUND" in cond:
                    raise TableNotFoundError(str(exc)) from exc
                if "UNRESOLVED_COLUMN" in cond or "MISSING_COLUMN" in cond:
                    raise ColumnNotFoundError(str(exc)) from exc
                raise EngineError(str(exc)) from exc
        return out

    def sql(self, sql: str) -> DataFrame:
        """Query path only — returns the lazy DataFrame."""
        rewritten = self._rewrite(sql)
        self._resolve_jdbc_views(rewritten)
        return self.spark.sql(rewritten)

    def _resolve_jdbc_views(self, sql_text: str) -> None:
        """Register temp views for JDBC tables referenced as db__tbl.

        The reference reflects remote schemas per-table on demand
        (src/databases/odbc/base.rs fetch_schema); the Spark equivalent is
        a lazy ``spark.read.jdbc`` relation — the remote query runs per
        action with predicate pushdown, never materialized at attach."""
        for dname, db in self.databases.items():
            if db.kind != "jdbc":
                continue
            for m in re.finditer(
                rf"\b{re.escape(dname)}__(\w+)\b", sql_text, re.IGNORECASE
            ):
                tbl = m.group(1)
                if tbl in db.tables:
                    continue
                df = (
                    self.spark.read.format("jdbc")
                    .option("url", db.path)
                    .option("dbtable", tbl)
                    .load()
                )
                df.createOrReplaceTempView(f"{dname}__{tbl}")
                db.tables[tbl] = df

    def _jdbc_target(self, name: str):
        """(SourceDatabase, table) when name addresses a jdbc database."""
        if "." not in name:
            return None
        dbname, _, tbl = name.partition(".")
        for dname, db in self.databases.items():
            if dname.lower() == dbname.lower() and db.kind == "jdbc":
                return db, tbl
        return None

    # -- SELECT-only converters (reference src/glue/select.rs:14-82) -------

    def _select_payload(self, query: str) -> Payload:
        p = self.execute(query)
        if p.kind != "Select":
            # reference ExecuteError::QueryNotSupported
            raise UnsupportedError("query not supported: expected SELECT")
        return p

    def select_json(self, query: str) -> str:
        return self._select_payload(query).as_json()

    def select_as_string(self, query: str) -> list[list[str]]:
        return self._select_payload(query).as_string()

    def select_as_csv(self, query: str) -> str:
        return self._select_payload(query).as_csv()

    def extend(self, database_name: str, database_path: str) -> bool:
        """Attach a storage by path, guessing the backend from the
        extension (reference Glue::try_extend_from_path,
        glue/mod.rs:108-129). Returns whether action was taken — False if
        the name is already attached."""
        if any(d.lower() == database_name.lower() for d in self.databases):
            return False
        self._create_database(
            f"CREATE DATABASE {database_name}"
            f" LOCATION '{database_path}'"
        )
        return True

    def reduce(self, database_name: str) -> bool:
        """Detach a database (reference Glue::reduce, glue/mod.rs:143-149).
        Returns whether action was taken."""
        return self._detach_database(database_name)

    def insert_vec(
        self, table: str, columns: list[str], rows: list[tuple]
    ) -> Payload:
        """Programmatic bulk insert (reference src/glue/mod.rs:190-248)."""
        state = self._table(table)
        schema = T.StructType(
            [
                T.StructField(
                    c,
                    _spark_type(state.column(c).type_str)
                    if state.column(c)
                    else T.StringType(),
                )
                for c in columns
            ]
        )
        df = self.spark.createDataFrame(rows, schema)
        return self._insert_df(state, df, columns)

    def register_udf(
        self, name: str, fn, return_type: str = "string", pandas: bool = False
    ) -> None:
        """Register a host-language scalar function usable in SQL.

        Beyond-reference: the reference's only extensibility point is the
        storage trait (SURVEY §2.10) — it has no SQL function surface at
        all. Here UDF registration is native Spark; ``pandas=True``
        registers an Arrow-vectorized pandas UDF (batched columnar
        transfer, ~10-100× the throughput of a row-at-a-time Python UDF
        — the only variant that belongs anywhere near a hot path).
        """
        if pandas:
            from pyspark.sql.functions import pandas_udf

            self.spark.udf.register(name, pandas_udf(fn, return_type))
        else:
            from pyspark.sql.functions import udf

            self.spark.udf.register(name, udf(fn, return_type))

    def register_udaf(self, name: str, fn, return_type: str) -> None:
        """Register a host-language aggregate (Series → scalar) usable in
        SQL GROUP BY — an Arrow-batched pandas aggregate UDF, so partials
        transfer columnar. Beyond-reference (SURVEY §2.10).

        The grouped-agg variant is selected by annotating ``fn`` with a
        real Series → scalar signature here, so callers don't depend on
        their module's (possibly stringified) type hints."""
        import inspect

        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        first = next(iter(inspect.signature(fn).parameters))
        fn.__annotations__ = {first: pd.Series, "return": float}
        self.spark.udf.register(name, pandas_udf(fn, return_type))

    def register_udtf(self, name: str, cls) -> None:
        """Register a host-language table function (one row in, many rows
        out) callable in FROM position. ``cls`` is a class with an
        ``eval`` generator, already decorated with
        ``pyspark.sql.functions.udtf``. Beyond-reference (SURVEY §2.10)."""
        self.spark.udtf.register(name, cls)

    # -- internals ----------------------------------------------------------

    def _rewrite(self, sql: str) -> str:
        return dialect.rewrite(
            sql,
            variables=self.variables,
            db_names=set(self.databases),
            int_division=True,
            schema=self._schema_snapshot(),
        )

    def _schema_snapshot(self) -> dict[str, dict[str, str]]:
        """Catalog snapshot {table: {col: spark_type}} for the dialect's
        schema-aware rewrites (reference label parity for bare columns,
        static I64 int-division typing — DIVERGENCES #3/#21)."""
        snap: dict[str, dict[str, str]] = {}
        for name, state in self.tables.items():
            try:
                snap[name] = dict(state.df.dtypes)
            except Exception:
                continue
        return snap

    def _table(self, name: str) -> TableState:
        key = name.lower()
        if key not in self.tables and "." in key:
            db, _, tbl = key.partition(".")
            if any(d.lower() == db for d in self.databases):
                key = f"{db}__{tbl}"
        if key not in self.tables:
            raise TableNotFoundError(f"table not found: {name}")
        return self.tables[key]

    def _register(self, state: TableState) -> None:
        self.tables[state.name.lower()] = state
        state.df.createOrReplaceTempView(state.name)
        if state.persist_path:
            self._flush(state)

    def _flush(self, state: TableState) -> None:
        """Write an attached table's current rows back to its file, then
        re-read so the registered view points at the new contents.

        The write materializes from the lazy plan over the *old* file
        into a temp dir first (single part file), then atomically replaces
        the original — mirroring the reference's rewrite-on-write storage
        backends. At 100 TB the persistent store is a transactional table
        format instead; this path is the embedded-file parity."""
        import glob
        import shutil
        import tempfile

        if state.persist_path.startswith("/root/testdata"):
            raise EngineError(
                "driver testdata is read-only; attach a copy to mutate it"
            )
        if state.persist_kind in ("xlsx", "xls"):
            # embedded format: whole-book rewrite preserving other sheets
            # (reference sheet/mutable.rs loads and rewrites the book too).
            # The rewrite necessarily collects the sheet to the driver —
            # bounded by the format's own sheet-row limit (1,048,576 for
            # OOXML; 65,536 for BIFF8), enforced BEFORE collecting so an
            # oversized table errors instead of OOMing the driver
            # (VERDICT r2 "What's wrong" #2).
            from multisql_spark.sources import xlsx_sheet_df

            if state.persist_kind == "xlsx":
                from multisql_spark.sources import xlsx as xmod

                max_rows = 1_048_575  # + header row = the format's max
            else:
                from multisql_spark.sources import xls as xmod

                max_rows = 65_535
            n_rows = state.df.count()
            if n_rows > max_rows:
                raise UnsupportedError(
                    f"{state.persist_kind} sheet would exceed the format's "
                    f"{max_rows + 1:,}-row limit ({n_rows} data rows); use "
                    "a parquet/csv-backed database for tables this large"
                )
            sheet = state.name.split("__", 1)[1]
            book = xmod.read_workbook(state.persist_path)
            book[sheet] = [list(state.df.columns)] + [
                list(r) for r in state.df.collect()
            ]
            fd, tmpf = tempfile.mkstemp(suffix=f".{state.persist_kind}")
            os.close(fd)
            xmod.write_workbook(tmpf, book)
            shutil.move(tmpf, state.persist_path)
            state.df = xlsx_sheet_df(
                self.spark, xmod.read_workbook(state.persist_path)[sheet]
            )
            state.df.createOrReplaceTempView(state.name)
            return
        tmp = tempfile.mkdtemp(prefix="msql_flush_")
        writer = state.df.coalesce(1).write.mode("overwrite")
        if state.persist_kind == "parquet":
            writer.parquet(tmp)
        elif state.persist_kind == "csv":
            writer.option("header", True).csv(tmp)
        elif state.persist_kind == "json":
            writer.json(tmp)
        elif state.persist_kind == "orc":
            writer.orc(tmp)
        else:
            raise EngineError(
                f"unwritable backend: {state.persist_kind}"
            )
        part = glob.glob(os.path.join(tmp, "part-*"))[0]
        shutil.move(part, state.persist_path)
        shutil.rmtree(tmp, ignore_errors=True)
        self.spark.catalog.refreshByPath(state.persist_path)
        if state.persist_kind == "parquet":
            from multisql_spark.sources import _read_parquet

            state.df = _read_parquet(self.spark, state.persist_path)
        elif state.persist_kind == "csv":
            state.df = self.spark.read.csv(
                state.persist_path, header=True, inferSchema=True
            )
        elif state.persist_kind == "orc":
            state.df = self.spark.read.orc(state.persist_path)
        else:
            state.df = self.spark.read.json(state.persist_path)
        state.df.createOrReplaceTempView(state.name)

    def _execute_one(self, stmt: str) -> Payload:
        head = re.match(r"\s*([A-Za-z_]+)", stmt)
        kw = head.group(1).upper() if head else ""
        if kw in ("SELECT", "WITH", "VALUES") or stmt.strip().startswith("("):
            return self._select_with_aqe_fallback(stmt)
        if kw == "CREATE":
            return self._create(stmt)
        if kw == "INSERT":
            return self._insert(stmt)
        if kw == "UPDATE":
            return self._update(stmt)
        if kw == "MERGE":
            return self._merge(stmt)
        if kw == "DELETE":
            return self._delete(stmt)
        if kw == "TRUNCATE":
            return self._truncate(stmt)
        if kw == "DROP":
            return self._drop(stmt)
        if kw == "ALTER":
            return self._alter(stmt)
        if kw == "SET":
            return self._set_variable(stmt)
        if kw == "EXPLAIN":
            return self._explain(stmt)
        if kw in ("SHOW", "DESCRIBE", "DESC"):
            return self._show(stmt)
        if kw == "EXECUTE":
            return self._execute_file(stmt)
        if kw == "EXPORT":
            return self._export_database(stmt)
        if kw == "IMPORT":
            return self._import_database(stmt)
        if kw == "REFRESH":
            return self._refresh_matview(stmt)
        raise UnsupportedError(f"unsupported statement: {stmt[:60]}")

    def _select_with_aqe_fallback(self, stmt: str) -> Payload:
        """Collect a SELECT, working around a Spark 4.1 planner fault: a
        correlated scalar subquery whose outer plan contains a Union (the
        shape managed tables take after INSERTs) fails with an internal
        ``NoSuchElementException: key not found``. Checkpointing each
        managed table collapses its plan to a single scan node, which the
        subquery planner handles; results are unaffected (the same rows,
        one lineage cut the engine already performs every Nth mutation)."""
        try:
            return Payload.select(self.sql(stmt))
        except Exception as exc:
            if "key not found" not in str(exc):
                raise
            for state in self.tables.values():
                if state.persist_path is not None:
                    continue  # attached tables are file scans, never Unions
                state.df = state.df.localCheckpoint(eager=True)
                state.df.createOrReplaceTempView(state.name)
            return Payload.select(self.sql(stmt))

    # -- CREATE -------------------------------------------------------------

    _CREATE_TABLE_RE = re.compile(
        r"\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*"
        r"(?:\((.*)\)\s*|AS\s+(.*))$",
        re.IGNORECASE | re.DOTALL,
    )

    def _create(self, stmt: str) -> Payload:
        upper = stmt.upper()
        if re.match(r"\s*CREATE\s+(OR\s+REPLACE\s+)?MATERIALIZED\s+VIEW", upper):
            return self._create_matview(stmt)
        if re.match(r"\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW", upper):
            return self._create_view(stmt)
        if re.match(r"\s*CREATE\s+(UNIQUE\s+)?INDEX", upper):
            return self._create_index(stmt)
        if re.match(r"\s*CREATE\s+DATABASE", upper):
            return self._create_database(stmt)
        m = self._CREATE_TABLE_RE.match(stmt)
        if not m:
            raise EngineError(f"cannot parse CREATE: {stmt[:80]}")
        if_not_exists, name, cols_src, as_select = m.groups()
        persist_path = persist_kind = None
        if "." in name:
            # CREATE TABLE db.tbl targets an attached database (reference
            # create/table.rs resolves ComplexTableName.database); `main.`
            # is the primary namespace
            dbname, _, tbl = name.partition(".")
            if dbname.lower() == "main":
                name = tbl
            else:
                db = next(
                    (
                        d
                        for dn, d in self.databases.items()
                        if dn.lower() == dbname.lower()
                    ),
                    None,
                )
                if db is None:
                    raise EngineError(f"database not found: {dbname}")
                if db.kind != "parquet":
                    raise EngineError(
                        f"cannot create tables in a {db.kind} database"
                    )
                name = f"{dbname}__{tbl}"
                persist_path = os.path.join(db.path, f"{tbl}.parquet")
                persist_kind = "parquet"
                attach_to = (db, tbl)
        if name.lower() in self.tables:
            if if_not_exists:
                return Payload.success("Create")
            raise AlreadyExistsError(f"table exists: {name}")
        if as_select:  # CREATE TABLE .. AS SELECT
            df = self.sql(as_select)
            columns = [
                ColumnDef(f.name, f.dataType.simpleString())
                for f in df.schema.fields
            ]
            self._register(
                TableState(
                    name, columns, df,
                    persist_path=persist_path, persist_kind=persist_kind,
                )
            )
            if persist_path:
                attach_to[0].tables[attach_to[1]] = (
                    self.tables[name.lower()].df
                )
            return Payload.success("Create")
        columns = self._parse_columns(cols_src)
        schema = T.StructType(
            [
                T.StructField(c.name, _spark_type(c.type_str), not c.not_null)
                for c in columns
            ]
        )
        df = self.spark.createDataFrame([], schema)
        self._register(
            TableState(
                name, columns, df,
                persist_path=persist_path, persist_kind=persist_kind,
            )
        )
        if persist_path:
            attach_to[0].tables[attach_to[1]] = self.tables[name.lower()].df
        return Payload.success("Create")

    def _parse_columns(self, src: str) -> list[ColumnDef]:
        """Parse `name TYPE [options]` column defs (reference
        src/data/column.rs:27-79)."""
        parts, depth, cur = [], 0, []
        for ch in src:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if "".join(cur).strip():
            parts.append("".join(cur))
        out = []
        for part in parts:
            tokens = part.strip().split()
            if not tokens:
                continue
            col = ColumnDef(name=tokens[0].strip('`"'))
            rest = " ".join(tokens[1:]).upper()
            rest_orig = " ".join(tokens[1:])
            # reference AlterError::UnsupportedColumnOption
            # (tests/ability/alter/table/create_table.rs CHECK case)
            if re.search(r"\bCHECK\b", rest):
                raise EngineError(
                    f"unsupported column option in {col.name}: CHECK"
                )
            type_m = re.match(r"(UNSIGNED\s+INT|[A-Z]+)", rest)
            if type_m and type_m.group(1) in _TYPE_MAP:
                col.type_str = _TYPE_MAP[type_m.group(1)]
            elif type_m:
                # reference AlterError::UnsupportedDataType
                raise UnsupportedError(
                    f"unsupported data type: {type_m.group(1)}"
                )
            # reference nullability (src/data/column.rs:36-38): columns are
            # NOT NULL unless an explicit bare NULL option is present
            col.not_null = (
                "NOT NULL" in rest
                or "PRIMARY KEY" in rest
                or not re.search(r"(?<!NOT )\bNULL\b", rest)
            )
            col.unique = "UNIQUE" in rest or "PRIMARY KEY" in rest
            col.auto_increment = "AUTO_INCREMENT" in rest or "AUTOINCREMENT" in rest
            dm = re.search(r"DEFAULT\s+(.+?)(?:\s+(?:NOT\s+NULL|UNIQUE|PRIMARY|AUTO_INCREMENT)|$)",
                           rest_orig, re.IGNORECASE)
            if dm:
                col.default = dm.group(1).strip()
            out.append(col)
        return out

    def _create_view(self, stmt: str) -> Payload:
        m = re.match(
            r"\s*CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+([\w.]+)\s+AS\s+(.*)$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise EngineError(f"cannot parse CREATE VIEW: {stmt[:80]}")
        name, query = m.groups()
        # reference accepts a parenthesized view body
        # (tests/ability/alter/view/create_view.rs)
        query = query.strip()
        while query.startswith("(") and query.endswith(")"):
            depth = 0
            balanced = True
            for i, ch in enumerate(query):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0 and i < len(query) - 1:
                        balanced = False  # e.g. (SELECT a) UNION (SELECT b)
                        break
            if not balanced:
                break
            query = query[1:-1].strip()
        df = self.sql(query)
        df.createOrReplaceTempView(name)
        self.views[name.lower()] = query
        return Payload.success("CreateView")

    def _create_matview(self, stmt: str) -> Payload:
        """CREATE MATERIALIZED VIEW (beyond reference): the defining query
        is evaluated ONCE and pinned (localCheckpoint), so readers scan the
        materialized result instead of re-running the plan — the batch
        face of a continuous aggregate (`stream_rollup_sink` is the
        streaming face).  `REFRESH MATERIALIZED VIEW` re-evaluates; reads
        between refreshes see the stale snapshot, which a test pins."""
        m = re.match(
            r"\s*CREATE\s+(OR\s+REPLACE\s+)?MATERIALIZED\s+VIEW\s+([\w.]+)"
            r"\s+AS\s+(.*)$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise EngineError(f"cannot parse CREATE MATERIALIZED VIEW: {stmt[:80]}")
        replace, name, query = m.groups()
        if name.lower() in self.matviews and not replace:
            raise AlreadyExistsError(f"materialized view exists: {name}")
        df = self.sql(query).localCheckpoint(eager=True)
        df.createOrReplaceTempView(name)
        self.matviews[name.lower()] = query
        return Payload.success("CreateMaterializedView")

    def _refresh_matview(self, stmt: str) -> Payload:
        m = re.match(
            r"\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.]+)\s*$",
            stmt,
            re.IGNORECASE,
        )
        if not m:
            raise EngineError(f"cannot parse REFRESH: {stmt[:80]}")
        name = m.group(1)
        query = self.matviews.get(name.lower())
        if query is None:
            raise TableNotFoundError(f"materialized view not found: {name}")
        df = self.sql(query).localCheckpoint(eager=True)
        df.createOrReplaceTempView(name)
        return Payload.success("RefreshMaterializedView")

    def _create_index(self, stmt: str) -> Payload:
        """CREATE [UNIQUE] INDEX — metadata no-op: parquet min/max pushdown
        and partition pruning replace the reference's IndexFilter machinery
        (SURVEY §4)."""
        m = re.match(
            r"\s*CREATE\s+(UNIQUE\s+)?INDEX\s+(\w+)\s+ON\s+([\w.]+)\s*\((\w+)\)",
            stmt,
            re.IGNORECASE,
        )
        if not m:
            raise EngineError(f"cannot parse CREATE INDEX: {stmt[:80]}")
        unique, iname, tname, col = m.groups()
        state = self._table(tname)
        state.indexes[iname] = {"column": col, "unique": bool(unique)}
        if unique:
            cdef = state.column(col)
            if cdef:
                cdef.unique = True
        return Payload.success("CreateIndex")

    def _create_database(self, stmt: str) -> Payload:
        from multisql_spark.sources import attach_database

        m = re.match(
            r"\s*CREATE\s+DATABASE\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)"
            r"\s+LOCATION\s+'([^']+)'",
            stmt,
            re.IGNORECASE,
        )
        if not m:
            raise EngineError(f"cannot parse CREATE DATABASE: {stmt[:80]}")
        if_not_exists, name, path = m.groups()
        if any(d.lower() == name.lower() for d in self.databases):
            # reference create/database error shape
            # (tests/ability/alter/database/create_database.rs)
            if if_not_exists:
                return Payload.success("CreateDatabase")
            raise AlreadyExistsError(f"database exists: {name}")
        db = attach_database(self.spark, name, path)
        self.databases[name] = db
        if db.kind in ("parquet", "csv", "json", "xlsx", "xls", "orc"):
            # writable backends (reference DBMut): DML on db.table routes
            # through the managed-table pipeline and flushes back to disk
            for tname, df in db.tables.items():
                fpath = (
                    os.path.join(db.path, f"{tname}.parquet")
                    if db.kind == "parquet"
                    else db.path  # csv/json/xlsx: one file per database
                )
                cols = [
                    ColumnDef(name=f, type_str=t) for f, t in df.dtypes
                ]
                self.tables[f"{name}__{tname}".lower()] = TableState(
                    name=f"{name}__{tname}",
                    columns=cols,
                    df=df,
                    persist_path=fpath,
                    persist_kind=db.kind,
                )
        return Payload.success("CreateDatabase")

    # -- INSERT (reference src/executor/alter_row/insert.rs) ----------------

    _INSERT_RE = re.compile(
        r"\s*INSERT\s+(INTO|OVERWRITE(?:\s+TABLE)?)\s+([\w.]+)\s*"
        r"(?:\(([^)]*)\))?\s*(.*)$",
        re.IGNORECASE | re.DOTALL,
    )

    def _insert(self, stmt: str) -> Payload:
        m = self._INSERT_RE.match(stmt)
        if not m:
            raise EngineError(f"cannot parse INSERT: {stmt[:80]}")
        mode, name, cols_src, source = m.groups()
        overwrite = mode.upper().startswith("OVERWRITE")
        jt = self._jdbc_target(name)
        if jt is not None:
            if overwrite:
                raise EngineError("jdbc databases are insert-only (append)")
            return self._insert_jdbc(jt[0], jt[1], cols_src, source)
        state = self._table(name)
        stated = (
            [c.strip().strip('`"') for c in cols_src.split(",")]
            if cols_src
            else [c.name for c in state.columns]
        )
        src = source.strip()
        if src.upper().startswith("VALUES"):
            body = src[len("VALUES"):].strip()
            alias_cols = ", ".join(stated)
            body = self._rewrite_fragment(body)
            # Declared-Any targets: Spark's VALUES unifies mixed literal
            # types to a common type (string), which would erase per-row
            # kinds before the variant conversion — wrap each Any-bound
            # expression in CAST(… AS VARIANT) so every row keeps its own
            # type (reference ValueType::Any, value/mod.rs:240)
            variant_pos = [
                i
                for i, s in enumerate(stated)
                if (c := state.column(s)) is not None
                and c.type_str == "variant"
            ]
            if variant_pos:
                body = self._wrap_values_variant(body, variant_pos)
            df = self.spark.sql(
                f"SELECT * FROM VALUES {body} AS __v({alias_cols})"
            )
        else:
            df = self.sql(src)
            df = df.toDF(*stated)
        if overwrite:
            # replace-contents semantics: validate the batch against an
            # emptied table; restore the old contents if validation fails
            # (schema, constraints, and the auto-increment counter keep —
            # OVERWRITE replaces data, TRUNCATE is the counter reset)
            old_df = state.df
            state.df = state.df.limit(0)
            try:
                out = self._insert_df(state, df, stated)
            except Exception:
                state.df = old_df
                self._register(state)
                raise
            return Payload.affected("Insert", out.count)
        return self._insert_df(state, df, stated)

    def _insert_jdbc(
        self, db, tbl: str, cols_src: str | None, source: str
    ) -> Payload:
        """JDBC (ODBC-equivalent) sink: batch append through the remote
        driver, mirroring the reference's insert-only ODBC DBMut
        (src/databases/odbc/mutable.rs — update/delete are unimplemented
        there too).  Rows are written in driver-side batches by Spark's
        JDBC writer (numPartitions × batchsize inserts)."""
        remote = (
            self.spark.read.format("jdbc")
            .option("url", db.path)
            .option("dbtable", tbl)
            .load()
        )
        stated = (
            [c.strip().strip('`"') for c in cols_src.split(",")]
            if cols_src
            else list(remote.columns)
        )
        src = source.strip()
        if src.upper().startswith("VALUES"):
            body = src[len("VALUES"):].strip()
            alias_cols = ", ".join(stated)
            df = self.spark.sql(
                f"SELECT * FROM VALUES {self._rewrite_fragment(body)} "
                f"AS __v({alias_cols})"
            )
        else:
            df = self.sql(src)
            df = df.toDF(*stated)
        # align to the reflected remote schema; unstated columns get NULL
        stated_lower = [s.lower() for s in stated]
        cols = []
        for f in remote.schema.fields:
            if f.name.lower() in stated_lower:
                src_col = F.col(stated[stated_lower.index(f.name.lower())])
            else:
                src_col = F.lit(None)
            cols.append(src_col.cast(f.dataType).alias(f.name))
        aligned = df.select(*cols)
        n = aligned.count()
        (
            aligned.write.format("jdbc")
            .option("url", db.path)
            .option("dbtable", tbl)
            .mode("append")
            .save()
        )
        return Payload.affected("Insert", n)

    def _rewrite_fragment(
        self, fragment: str, table: TableState | None = None
    ) -> str:
        schema = None
        if table is not None:
            try:
                # "" = ambient fragment columns (no FROM clause): lets the
                # division rewrite type int columns statically in UPDATE
                # SET / WHERE expressions (reference binary.rs int-`/`)
                schema = {"": dict(table.df.dtypes)}
            except Exception:
                schema = None
        return dialect.rewrite(
            fragment,
            variables=self.variables,
            db_names=set(self.databases),
            int_division=True,
            schema=schema,
        )

    def _insert_df(
        self, state: TableState, incoming: DataFrame, stated: list[str]
    ) -> Payload:
        """Validation pipeline per reference validate.rs:46-99: position
        mapping → defaults → AUTO_INCREMENT → type coercion → NOT NULL →
        UNIQUE → append."""
        # stated columns must exist (reference ValidateError::ColumnNotFound,
        # validate.rs:30-44) and carry compatible types (value/mod.rs:232-260)
        for s, field in zip(stated, incoming.schema.fields):
            cdef = state.column(s)
            if cdef is None:
                raise ColumnNotFoundError(f"column not found: {s}")
            _check_write_type(cdef, field.dataType, state.name)
        cols = []
        stated_lower = [s.lower() for s in stated]
        for cdef in state.columns:
            if cdef.name.lower() in stated_lower:
                src = F.col(stated[stated_lower.index(cdef.name.lower())])
            elif cdef.auto_increment:
                src = F.lit(None)
            elif cdef.default is not None:
                src = F.expr(self._rewrite_fragment(cdef.default))
            else:
                src = F.lit(None)
            cols.append(src.cast(state.df.schema[cdef.name].dataType).alias(cdef.name))
        aligned = incoming.select(*cols)

        # every per-batch constraint check folds into ONE aggregation job:
        # row count, per-column NULL counts (NOT NULL), per-column
        # duplicate detection among non-NULLs (UNIQUE: count - countDistinct;
        # NULLs never collide, reference validate_unique.rs skips them),
        # and the AUTO_INCREMENT fill count
        checks: list = [F.count(F.lit(1)).alias("__n")]
        for cdef in state.columns:
            nm = cdef.name
            if cdef.not_null and not cdef.auto_increment:
                checks.append(
                    F.coalesce(
                        F.sum(F.col(nm).isNull().cast("int")), F.lit(0)
                    ).alias(f"__nn_{nm}")
                )
            if cdef.unique:
                checks.append(
                    (
                        F.count(_uq_key(cdef)) - F.count_distinct(_uq_key(cdef))
                    ).alias(f"__uq_{nm}")
                )
            if cdef.auto_increment:
                checks.append(
                    F.coalesce(
                        F.sum(F.col(nm).isNull().cast("int")), F.lit(0)
                    ).alias(f"__ai_{nm}")
                )
        stats = aligned.agg(*checks).collect()[0]
        n_in = stats["__n"]
        for cdef in state.columns:
            if cdef.not_null and not cdef.auto_increment \
                    and stats[f"__nn_{cdef.name}"]:
                raise NotNullViolation(
                    f"NOT NULL violated for {state.name}.{cdef.name}"
                )
        for cdef in state.columns:
            if cdef.unique:
                if stats[f"__uq_{cdef.name}"]:
                    raise UniqueViolation(
                        f"UNIQUE violated for {state.name}.{cdef.name}"
                    )
                # collision against existing rows: one semi-join count per
                # unique column (reference validate_unique.rs
                # scan-sort-merge)
                if cdef.type_str == "variant":
                    dup_old = (
                        aligned.filter(F.col(cdef.name).isNotNull())
                        .select(_uq_key(cdef).alias("__k"))
                        .join(
                            state.df.select(_uq_key(cdef).alias("__k")),
                            on="__k",
                            how="left_semi",
                        )
                        .count()
                    )
                else:
                    dup_old = (
                        aligned.filter(F.col(cdef.name).isNotNull())
                        .join(
                            state.df.select(cdef.name),
                            on=cdef.name,
                            how="left_semi",
                        )
                        .count()
                    )
                if dup_old:
                    raise UniqueViolation(
                        f"UNIQUE violated for {state.name}.{cdef.name}"
                    )

        # assign AUTO_INCREMENT ids only after validation passed, so a
        # rejected insert doesn't burn counter values
        for cdef in state.columns:
            if cdef.auto_increment:
                start = state.auto_counter.get(cdef.name, 0)
                # only NULL ids are filled and only they advance the
                # counter — explicit values don't consume it (reference
                # sled/auto_increment.rs semantics, see the corpus test:
                # explicit 6 then auto gives 5, then 6 again)
                need = aligned.filter(F.col(cdef.name).isNull())
                have = aligned.filter(F.col(cdef.name).isNotNull())
                n_fill = stats[f"__ai_{cdef.name}"]
                if n_fill:
                    # block-allocated dense ids — partition-local
                    # row_number + broadcast offsets, no single-reducer
                    # window (see assign_dense_ids)
                    filled = assign_dense_ids(
                        need,
                        cdef.name,
                        start,
                        state.df.schema[cdef.name].dataType.simpleString(),
                    )
                    aligned = have.unionByName(filled)
                state.auto_counter[cdef.name] = start + n_fill

        state.df = state.df.unionByName(aligned)
        self._bound_lineage(state)
        self._register(state)
        return Payload.affected("Insert", n_in)

    # plan depth grows by one node per mutation; cut it every N statements
    # so a long statement corpus doesn't accumulate an O(statements)
    # analysis cost per subsequent query
    _CHECKPOINT_EVERY = 32

    def _bound_lineage(self, state: TableState) -> None:
        state.mutations += 1
        if state.mutations % self._CHECKPOINT_EVERY == 0:
            state.df = state.df.localCheckpoint(eager=True)

    # -- UPDATE / DELETE / TRUNCATE ----------------------------------------

    def _update(self, stmt: str) -> Payload:
        m = re.match(
            r"\s*UPDATE\s+([\w.]+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise EngineError(f"cannot parse UPDATE: {stmt[:80]}")
        name, sets_src, where = m.groups()
        if self._jdbc_target(name) is not None:
            # reference ODBC DBMut implements insert only
            # (src/databases/odbc/mutable.rs)
            raise EngineError("jdbc databases are insert-only")
        state = self._table(name)
        cond = (
            F.expr(self._rewrite_fragment(where, state))
            if where else F.lit(True)
        )
        assignments = {}
        for part in self._split_top_level(sets_src):
            col, expr = part.split("=", 1)
            assignments[col.strip().strip('`"').lower()] = F.expr(
                self._rewrite_fragment(expr.strip(), state)
            )
        n = state.df.filter(cond).count()
        # validate assignment targets and types before touching state
        # (reference update.rs runs Value::is / validate_null per row)
        probe = state.df.limit(0)
        for col, expr in assignments.items():
            cdef = state.column(col)
            if cdef is None:
                raise ColumnNotFoundError(f"column not found: {col}")
            ptype = probe.select(expr.alias("_p")).schema[0].dataType
            try:
                _check_write_type(cdef, ptype, state.name)
            except EngineError:
                # Reference int `/` int stays I64 (binary.rs:66-92), but the
                # dialect's runtime-dispatch division CASE is statically
                # DOUBLE-typed.  Accept a fractional-typed assignment into an
                # integral column when every assigned value is integral
                # (DIVERGENCES: `SET id = 3.0` is likewise accepted).
                if cdef.type_str == "bigint" and isinstance(
                    ptype, (T.DoubleType, T.FloatType, T.DecimalType)
                ):
                    frac = (
                        state.df.filter(cond)
                        .select(expr.alias("_p"))
                        .filter("_p IS NOT NULL AND _p != floor(_p)")
                        .count()
                    )
                    if frac:
                        raise
                else:
                    raise
        new_cols = []
        for cdef in state.columns:
            old = F.col(cdef.name)
            if cdef.name.lower() in assignments:
                assigned = assignments[cdef.name.lower()]
                if cdef.type_str == "variant":
                    # Any column: the CASE branches must agree in type, so
                    # the assigned expression converts to variant FIRST —
                    # each updated row keeps the new value's own kind
                    assigned = assigned.cast(
                        state.df.schema[cdef.name].dataType
                    )
                new = (
                    F.when(cond, assigned)
                    .otherwise(old)
                    .cast(state.df.schema[cdef.name].dataType)
                )
                new_cols.append(new.alias(cdef.name))
            else:
                new_cols.append(old)
        candidate = state.df.select(*new_cols)
        # all post-assignment constraint checks in ONE aggregation job
        checks: list = []
        for cdef in state.columns:
            if cdef.name.lower() not in assignments:
                continue
            nm = cdef.name
            if cdef.not_null:
                checks.append(
                    F.coalesce(
                        F.sum(F.col(nm).isNull().cast("int")), F.lit(0)
                    ).alias(f"__nn_{nm}")
                )
            if cdef.unique:
                checks.append(
                    (
                        F.count(_uq_key(cdef)) - F.count_distinct(_uq_key(cdef))
                    ).alias(f"__uq_{nm}")
                )
        if checks:
            stats = candidate.agg(*checks).collect()[0]
            for cdef in state.columns:
                if cdef.name.lower() not in assignments:
                    continue
                if cdef.not_null and stats[f"__nn_{cdef.name}"]:
                    raise NotNullViolation(
                        f"NOT NULL violated for {state.name}.{cdef.name}"
                    )
                if cdef.unique and stats[f"__uq_{cdef.name}"]:
                    raise UniqueViolation(
                        f"UNIQUE violated for {state.name}.{cdef.name}"
                    )
        state.df = candidate
        self._bound_lineage(state)
        self._register(state)
        return Payload.affected("Update", n)

    @classmethod
    def _wrap_values_variant(cls, body: str, positions: list[int]) -> str:
        """Rewrite a VALUES body ``(e, …), (e, …)`` wrapping the
        expressions at ``positions`` in CAST(… AS VARIANT)."""
        tuples = cls._split_top_level(body)
        out_tuples = []
        for tup in tuples:
            t = tup.strip()
            if not (t.startswith("(") and t.endswith(")")):
                out_tuples.append(tup)
                continue
            exprs = cls._split_top_level(t[1:-1])
            for p in positions:
                if p < len(exprs):
                    exprs[p] = f"CAST(({exprs[p]}) AS VARIANT)"
            out_tuples.append("(" + ", ".join(e.strip() for e in exprs) + ")")
        return ", ".join(out_tuples)

    @staticmethod
    def _split_top_level(src: str) -> list[str]:
        parts, depth, cur, in_str = [], 0, [], False
        for ch in src:
            if ch == "'":
                in_str = not in_str
            elif not in_str:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                elif ch == "," and depth == 0:
                    parts.append("".join(cur))
                    cur = []
                    continue
            cur.append(ch)
        if cur:
            parts.append("".join(cur))
        return parts

    def _merge(self, stmt: str) -> Payload:
        """MERGE INTO (upsert) — beyond-reference DML the ingestion
        pipelines need (dedup upserts, dimension refresh):

        ``MERGE INTO t [AS a] USING (<subquery>|table) [AS b] ON cond
        WHEN MATCHED THEN UPDATE SET c = expr, ... | DELETE
        WHEN NOT MATCHED THEN INSERT [(cols)] VALUES (exprs)``

        Plan shape: one left join of the target against the source for
        the matched branch (update/delete resolved column-wise, no
        per-row loop), one anti join for inserts (validated through the
        standard insert pipeline: defaults, AUTO_INCREMENT, NOT NULL,
        UNIQUE).  A target row matching multiple source rows raises, as
        the SQL standard requires — detected with one aggregation.
        """
        m = re.match(
            r"\s*MERGE\s+INTO\s+([\w.]+)(?:\s+AS\s+(\w+))?\s+USING\s+(.*)$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise EngineError(f"cannot parse MERGE: {stmt[:80]}")
        tname, talias, rest = m.groups()
        rest = rest.strip()
        if rest.startswith("("):
            depth = 0
            end = None
            in_str = False
            for i, ch in enumerate(rest):
                if ch == "'":
                    in_str = not in_str
                elif not in_str:
                    if ch == "(":
                        depth += 1
                    elif ch == ")":
                        depth -= 1
                        if depth == 0:
                            end = i
                            break
            if end is None:
                raise EngineError("MERGE: unbalanced USING subquery")
            src_df = self.sql(rest[1:end])
            rest = rest[end + 1:]
            salias_default = "s"
        else:
            m2 = re.match(r"([\w.]+)", rest)
            if not m2:
                raise EngineError("MERGE: missing USING source")
            src_name = m2.group(1)
            src_df = self._table(src_name).df
            rest = rest[m2.end():]
            salias_default = src_name.split(".")[-1]
        m3 = re.match(
            r"\s*(?:AS\s+)?(\w+)?\s*\bON\b(.*)$", rest, re.IGNORECASE | re.DOTALL
        )
        if not m3 or (m3.group(1) and m3.group(1).upper() == "ON"):
            m3 = re.match(r"\s*ON\b(.*)$", rest, re.IGNORECASE | re.DOTALL)
            if not m3:
                raise EngineError("MERGE: missing ON condition")
            salias, tail = None, m3.group(1)
        else:
            salias, tail = m3.group(1), m3.group(2)
        salias = salias or salias_default
        parts = re.split(
            r"(?i)\bWHEN\s+(NOT\s+)?MATCHED\s+THEN\s+", tail
        )
        on_src = parts[0].strip()
        upd_sets: str | None = None
        matched_delete = False
        ins_clause: str | None = None
        for neg, action in zip(parts[1::2], parts[2::2]):
            action = action.strip()
            if neg:
                if not re.match(r"(?i)INSERT\b", action):
                    raise EngineError("MERGE: NOT MATCHED supports INSERT only")
                ins_clause = action
            elif re.match(r"(?i)UPDATE\s+SET\b", action):
                upd_sets = re.sub(r"(?i)^UPDATE\s+SET\s+", "", action)
            elif re.match(r"(?i)DELETE\b", action):
                matched_delete = True
            else:
                raise EngineError(
                    "MERGE: MATCHED supports UPDATE SET or DELETE"
                )
        if upd_sets is None and not matched_delete and ins_clause is None:
            raise EngineError("MERGE: no WHEN clause")
        if self._jdbc_target(tname) is not None:
            raise EngineError("jdbc databases are insert-only")
        state = self._table(tname)
        # default alias = the resolved internal name: the dialect rewrites
        # dotted refs (`db.t.col` -> `db__t.col`), so aliasing the target
        # the same way keeps qualified ON/SET references resolvable
        talias = talias or state.name
        base = state.df.withColumn(
            "__rid", F.monotonically_increasing_id()
        ).localCheckpoint(eager=True)
        t = base.alias(talias)
        s = src_df.withColumn("__m", F.lit(1)).alias(salias)
        cond = F.expr(self._rewrite_fragment(on_src))
        joined = t.join(s, cond, "left")
        matched = F.col(f"{salias}.__m").isNotNull()
        dup = (
            joined.groupBy("__rid")
            .agg(F.coalesce(F.sum("__m"), F.lit(0)).alias("__k"))
            .filter(F.col("__k") > 1)
            .count()
        )
        if dup:
            raise EngineError(
                "MERGE: a target row matches multiple source rows"
            )
        n_matched = joined.filter(matched).count()

        assignments: dict[str, object] = {}
        if upd_sets is not None:
            for part in self._split_top_level(upd_sets):
                col, expr = part.split("=", 1)
                col = col.strip().strip('`"').lower()
                if col.startswith(talias.lower() + "."):
                    col = col[len(talias) + 1:]
                assignments[col] = F.expr(
                    self._rewrite_fragment(expr.strip())
                )
            probe = joined.limit(0)
            for col, expr in assignments.items():
                cdef = state.column(col)
                if cdef is None:
                    raise ColumnNotFoundError(f"column not found: {col}")
                ptype = probe.select(expr.alias("_p")).schema[0].dataType
                _check_write_type(cdef, ptype, state.name)

        new_cols = []
        for cdef in state.columns:
            old = F.col(f"{talias}.{cdef.name}")
            if cdef.name.lower() in assignments:
                assigned = assignments[cdef.name.lower()]
                if cdef.type_str == "variant":
                    # Any column: CASE branches must agree — convert first
                    assigned = assigned.cast(
                        state.df.schema[cdef.name].dataType
                    )
                new = (
                    F.when(matched, assigned)
                    .otherwise(old)
                    .cast(state.df.schema[cdef.name].dataType)
                )
                new_cols.append(new.alias(cdef.name))
            else:
                new_cols.append(old.alias(cdef.name))
        result = joined
        if matched_delete:
            result = result.filter(~matched)
        candidate = result.select(*new_cols)
        # post-update constraint checks in one aggregation (as in _update)
        checks: list = []
        for cdef in state.columns:
            if cdef.name.lower() not in assignments:
                continue
            if cdef.not_null:
                checks.append(
                    F.coalesce(
                        F.sum(F.col(cdef.name).isNull().cast("int")), F.lit(0)
                    ).alias(f"__nn_{cdef.name}")
                )
            if cdef.unique:
                checks.append(
                    (
                        F.count(_uq_key(cdef))
                        - F.count_distinct(_uq_key(cdef))
                    ).alias(f"__uq_{cdef.name}")
                )
        if checks:
            stats = candidate.agg(*checks).collect()[0]
            for cdef in state.columns:
                if cdef.name.lower() not in assignments:
                    continue
                if cdef.not_null and stats.asDict().get(f"__nn_{cdef.name}"):
                    raise NotNullViolation(
                        f"NOT NULL violated for {state.name}.{cdef.name}"
                    )
                if cdef.unique and stats.asDict().get(f"__uq_{cdef.name}"):
                    raise UniqueViolation(
                        f"UNIQUE violated for {state.name}.{cdef.name}"
                    )
        state.df = candidate
        self._bound_lineage(state)
        self._register(state)

        n_inserted = 0
        if ins_clause is not None:
            mi = re.match(
                r"(?i)INSERT\s*(?:\(([^)]*)\)\s*)?VALUES\s*\((.*)\)\s*$",
                ins_clause.strip(),
                re.DOTALL,
            )
            if not mi:
                raise EngineError(f"cannot parse MERGE INSERT: {ins_clause[:60]}")
            cols_src, vals_src = mi.groups()
            stated = (
                [c.strip().strip('`"') for c in cols_src.split(",")]
                if cols_src
                else [c.name for c in state.columns]
            )
            exprs = self._split_top_level(vals_src)
            if len(exprs) != len(stated):
                raise EngineError("MERGE INSERT: column/value count mismatch")
            anti = src_df.alias(salias).join(
                base.alias(talias), cond, "left_anti"
            )
            ins_df = anti.select(
                *[
                    F.expr(self._rewrite_fragment(e.strip())).alias(c)
                    for c, e in zip(stated, exprs)
                ]
            )
            n_inserted = self._insert_df(state, ins_df, stated).count
        return Payload.affected("Merge", n_matched + n_inserted)

    def _delete(self, stmt: str) -> Payload:
        m = re.match(
            r"\s*DELETE\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.*))?$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise EngineError(f"cannot parse DELETE: {stmt[:80]}")
        name, where = m.groups()
        if self._jdbc_target(name) is not None:
            raise EngineError("jdbc databases are insert-only")
        state = self._table(name)
        if where:
            cond = F.expr(self._rewrite_fragment(where))
            n = state.df.filter(cond).count()
            state.df = state.df.filter(~F.coalesce(cond, F.lit(False)))
        else:
            n = state.df.count()
            state.df = state.df.limit(0)
        self._bound_lineage(state)
        self._register(state)
        return Payload.affected("Delete", n)

    def _truncate(self, stmt: str) -> Payload:
        m = re.match(
            r"\s*TRUNCATE\s+(?:TABLE\s+)?([\w.]+)", stmt, re.IGNORECASE
        )
        state = self._table(m.group(1))
        state.df = state.df.limit(0)
        state.auto_counter = {}
        self._register(state)
        return Payload.success("TruncateTable")

    def _drop(self, stmt: str) -> Payload:
        m = re.match(
            r"\s*DROP\s+(TABLE|MATERIALIZED\s+VIEW|VIEW|INDEX|SCHEMA|DATABASE)"
            r"\s+(IF\s+EXISTS\s+)?([\w.]+)",
            stmt,
            re.IGNORECASE,
        )
        if not m:
            raise EngineError(f"cannot parse DROP: {stmt[:80]}")
        kind, if_exists, name = m.groups()
        kind = re.sub(r"\s+", " ", kind.upper())
        key = name.lower()
        if kind == "MATERIALIZED VIEW":
            if key not in self.matviews and not if_exists:
                raise TableNotFoundError(f"materialized view not found: {name}")
            self.matviews.pop(key, None)
            self.spark.catalog.dropTempView(name)
            return Payload.success("DropMaterializedView")
        if kind == "TABLE":
            if key not in self.tables and not if_exists:
                raise TableNotFoundError(f"table not found: {name}")
            self.tables.pop(key, None)
            self.spark.catalog.dropTempView(name)
            return Payload.success("DropTable")
        if kind == "VIEW":
            self.views.pop(key, None)
            self.spark.catalog.dropTempView(name)
            return Payload.success("DropView")
        if kind in ("SCHEMA", "DATABASE"):
            self._detach_database(name)
            return Payload.success("DropDatabase")
        return Payload.success("DropIndex")

    def _detach_database(self, name: str) -> bool:
        """Remove an attached database and every table state / temp view
        registered under it (reference Glue::reduce, glue/mod.rs:143-149)."""
        match = next(
            (d for d in self.databases if d.lower() == name.lower()), None
        )
        if match is None:
            return False
        self.databases.pop(match)
        prefix = f"{match.lower()}__"
        for key in [k for k in self.tables if k.startswith(prefix)]:
            state = self.tables.pop(key)
            try:
                self.spark.catalog.dropTempView(state.name)
            except Exception:
                pass
        return True

    # -- ALTER TABLE (reference src/executor/alter_table/) ------------------

    def _alter(self, stmt: str) -> Payload:
        m = re.match(
            r"\s*ALTER\s+TABLE\s+([\w.]+)\s+(.*)$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise EngineError(f"cannot parse ALTER: {stmt[:80]}")
        name, action = m.groups()
        state = self._table(name)
        au = action.strip()
        m2 = re.match(r"RENAME\s+TO\s+([\w.]+)", au, re.IGNORECASE)
        if m2:
            new_name = m2.group(1)
            self.tables.pop(state.name.lower())
            self.spark.catalog.dropTempView(state.name)
            state.name = new_name
            self._register(state)
            return Payload.success("AlterTable")
        m2 = re.match(
            r"RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)", au, re.IGNORECASE
        )
        if m2:
            old, new = m2.groups()
            cdef = state.column(old)
            if not cdef:
                raise ColumnNotFoundError(f"column not found: {old}")
            cdef.name = new
            state.df = state.df.withColumnRenamed(old, new)
            self._register(state)
            return Payload.success("AlterTable")
        m2 = re.match(r"ADD\s+(?:COLUMN\s+)?(.*)$", au, re.IGNORECASE | re.DOTALL)
        if m2 and not au.upper().startswith("ADD CONSTRAINT"):
            src = m2.group(1).strip()
            # reference AlterError::UnsupportedColumnOption (alter_table.rs)
            if re.search(r"\bCHECK\b", src, re.IGNORECASE):
                raise UnsupportedError("unsupported column option: CHECK")
            # reference AlterError::UnsupportedDataType
            tm = re.match(
                r'"?\w+"?\s+(UNSIGNED\s+INT|\w+)', src, re.IGNORECASE
            )
            if not tm or tm.group(1).upper() not in _TYPE_MAP:
                raise UnsupportedError(
                    f"unsupported data type in ADD COLUMN: {src[:40]}"
                )
            cdef = self._parse_columns(src)[0]
            # reference AlterTableError::AddingColumnAlreadyExists
            if state.column(cdef.name) is not None:
                raise AlreadyExistsError(f"column already exists: {cdef.name}")
            # reference AlterTableError::DefaultValueRequired: a NOT NULL
            # column added to a non-empty table needs a DEFAULT
            if (
                cdef.default is None
                and cdef.not_null
                and not cdef.auto_increment
                and state.df.count() > 0
            ):
                raise EngineError(
                    f"default value required to add column {cdef.name}"
                )
            default = (
                F.expr(self._rewrite_fragment(cdef.default))
                if cdef.default is not None
                else F.lit(None)
            )
            state.columns.append(cdef)
            state.df = state.df.withColumn(
                cdef.name, default.cast(_spark_type(cdef.type_str))
            )
            self._register(state)
            return Payload.success("AlterTable")
        m2 = re.match(
            r"DROP\s+(?:COLUMN\s+)?(IF\s+EXISTS\s+)?(\w+)", au, re.IGNORECASE
        )
        if m2:
            if_exists, col = m2.groups()
            if state.column(col) is None:
                if if_exists:
                    return Payload.success("AlterTable")
                # reference AlterTableError::DroppingColumnNotFound
                raise ColumnNotFoundError(f"column not found: {col}")
            state.columns = [
                c for c in state.columns if c.name.lower() != col.lower()
            ]
            state.df = state.df.drop(col)
            self._register(state)
            return Payload.success("AlterTable")
        raise UnsupportedError(f"unsupported ALTER action: {au[:60]}")

    # -- SET / EXPLAIN / EXECUTE FILE ---------------------------------------

    def _set_variable(self, stmt: str) -> Payload:
        m = re.match(
            r"\s*SET\s+([@$]?\w+)\s*=\s*(.+)$", stmt, re.IGNORECASE | re.DOTALL
        )
        if not m:
            raise EngineError(f"cannot parse SET: {stmt[:80]}")
        name, literal = m.groups()
        self.variables[name.lstrip("@$").lower()] = literal.strip()
        return Payload.success("SetVariable")

    def _show(self, stmt: str) -> Payload:
        """SHOW DATABASES / SHOW TABLES [FROM db] / SHOW COLUMNS FROM t /
        DESCRIBE t — beyond-reference introspection sugar over the same
        metadata surface EXPLAIN exposes (explain.rs:6-89 shapes), so
        host code ported from conventional SQL tooling works unchanged."""
        s = stmt.strip().rstrip(";").strip()
        m = re.match(r"(?i)SHOW\s+DATABASES$", s)
        if m:
            return self._explain("EXPLAIN ALL")
        m = re.match(r"(?i)SHOW\s+TABLES(?:\s+(?:FROM|IN)\s+([\w.]+))?$", s)
        if m:
            return self._explain(f"EXPLAIN {m.group(1) or 'main'}")
        m = re.match(r"(?i)SHOW\s+COLUMNS\s+(?:FROM|IN)\s+([\w.]+)$", s)
        if m:
            return self._explain(f"EXPLAIN {m.group(1)}")
        m = re.match(r"(?i)(?:DESCRIBE|DESC)\s+([\w.]+)$", s)
        if m:
            return self._explain(f"EXPLAIN {m.group(1)}")
        raise UnsupportedError(f"unsupported SHOW statement: {stmt[:60]}")

    def _explain(self, stmt: str) -> Payload:
        """Metadata introspection, not query plans (reference
        src/executor/other/explain.rs:6-89)."""
        m = re.match(r"\s*EXPLAIN\s+(\S+)", stmt, re.IGNORECASE)
        target = m.group(1) if m else "ALL"
        tl = target.lower()
        if target.upper() in ("SELECT", "WITH", "VALUES"):
            # beyond-reference: EXPLAIN <query> returns the Spark physical
            # plan (the reference has no plan introspection at all)
            body = re.sub(r"\s*EXPLAIN\s+", "", stmt, count=1,
                          flags=re.IGNORECASE)
            from multisql_spark.plans import formatted_plan

            plan = formatted_plan(self.sql(body))
            rows = [(line,) for line in plan.splitlines() if line.strip()]
            return Payload(kind="Select", labels=["plan"], rows=rows)
        if target.upper() == "ANALYZE":
            # beyond-reference: EXPLAIN ANALYZE <query> executes the query
            # and returns the final (AQE-resolved) physical plan with
            # runtime metrics — what actually ran, not what was planned
            body = re.sub(r"\s*EXPLAIN\s+ANALYZE\s+", "", stmt, count=1,
                          flags=re.IGNORECASE)
            df = self.sql(body)
            df.collect()
            executed = df._jdf.queryExecution().executedPlan().toString()
            rows = [
                (line,) for line in executed.splitlines() if line.strip()
            ]
            return Payload(kind="Select", labels=["plan"], rows=rows)
        if target.upper() == "ALL":
            # the managed (temp-view) store is the reference's default
            # database, named "main" (tests/databases/sled.rs Glue::new)
            rows = [("main",)] + [(d,) for d in sorted(self.databases)]
            return Payload(kind="Select", labels=["database"], rows=rows)
        if target.upper() == "ALL_TABLE":
            rows = [
                ("main", t) for t in sorted(self.tables) if "__" not in t
            ]
            for db in sorted(self.databases):
                rows += [
                    (db, t)
                    for t in sorted(self.databases[db].table_names())
                ]
            return Payload(
                kind="Select", labels=["database", "table"], rows=rows
            )
        if tl == "main" and tl not in self.tables:
            rows = [(t,) for t in sorted(self.tables) if "__" not in t]
            return Payload(kind="Select", labels=["table"], rows=rows)
        if tl.startswith("main.") and tl[5:] in self.tables:
            tl = tl[5:]
        if "." in tl:
            # EXPLAIN db.table (reference explain.rs:9-12 2-element name):
            # managed-state tables use declared columns; adapter-only
            # tables (e.g. jdbc) reflect the Spark schema
            dbname, _, tbl = tl.partition(".")
            if f"{dbname}__{tbl}" in self.tables:
                tl = f"{dbname}__{tbl}"
            else:
                db = next(
                    (
                        d
                        for dn, d in self.databases.items()
                        if dn.lower() == dbname
                    ),
                    None,
                )
                if db is not None:
                    if db.kind == "jdbc" and tbl not in db.tables:
                        self._resolve_jdbc_views(f"{dbname}__{tbl}")
                    if tbl in db.tables:
                        rows = [
                            (
                                f,
                                _VALUETYPE_DISPLAY.get(t, t),
                            )
                            for f, t in db.tables[tbl].dtypes
                        ]
                        return Payload(
                            kind="Select",
                            labels=["column", "data_type"],
                            rows=rows,
                        )
        if tl in self.tables:
            state = self.tables[tl]
            # reference ValueType display names (value_type/cast.rs:31-44)
            rows = [
                (c.name, _VALUETYPE_DISPLAY.get(c.type_str, c.type_str))
                for c in state.columns
            ]
            return Payload(
                kind="Select", labels=["column", "data_type"], rows=rows
            )
        if target in self.databases:
            adapter = self.databases[target]
            rows = [(t,) for t in sorted(adapter.table_names())]
            return Payload(kind="Select", labels=["table"], rows=rows)
        raise EngineError(f"EXPLAIN target not found: {target}")

    def _execute_file(self, stmt: str) -> Payload:
        m = re.match(
            r"\s*EXECUTE\s+FILE\s*\(\s*'([^']+)'\s*\)", stmt, re.IGNORECASE
        )
        if not m:
            raise EngineError(f"cannot parse EXECUTE FILE: {stmt[:80]}")
        with open(m.group(1)) as fh:
            payloads = self.execute_many(fh.read())
        return payloads[-1] if payloads else Payload.success()

    def _export_database(self, stmt: str) -> Payload:
        """EXPORT DATABASE TO '<dir>' (beyond ref): dump every managed
        table as parquet plus a schema manifest (column options and
        auto-increment counters), so the session's managed-table state
        survives a restart / ships to another cluster.  Attached-db
        tables are EXCLUDED by design — they already live in their
        backing files (parquet/csv/xlsx/jdbc) and re-attach via CREATE
        DATABASE LOCATION.  One directory per table — at scale each
        table export is a parallel parquet write."""
        import json as _json
        import os

        m = re.match(
            r"\s*EXPORT\s+DATABASE\s+TO\s+'([^']+)'\s*$", stmt,
            re.IGNORECASE,
        )
        if not m:
            raise EngineError(f"cannot parse EXPORT DATABASE: {stmt[:80]}")
        root = m.group(1)
        os.makedirs(root, exist_ok=True)
        manifest = {}
        n = 0
        for name, state in self.tables.items():
            # Attached-db shadow entries are identified structurally
            # (they carry a persist_path to their backing file), never
            # by a "__" name substring — a managed table legitimately
            # named a__b must export too (ADVICE r2 #3).
            if state.persist_path is not None:
                continue
            state.df.write.mode("overwrite").parquet(
                os.path.join(root, name)
            )
            manifest[name] = {
                "columns": [
                    {
                        "name": c.name,
                        "type": c.type_str,
                        "not_null": c.not_null,
                        "unique": c.unique,
                        "default": c.default,
                        "auto_increment": c.auto_increment,
                    }
                    for c in state.columns
                ],
                "auto_counter": state.auto_counter,
            }
            n += 1
        with open(os.path.join(root, "_manifest.json"), "w") as fh:
            _json.dump(manifest, fh, indent=1, sort_keys=True)
        return Payload(kind="Select", labels=["exported"], rows=[(n,)])

    def _import_database(self, stmt: str) -> Payload:
        """IMPORT DATABASE FROM '<dir>': restore every table exported by
        EXPORT DATABASE — schema options, auto-increment counters and
        rows — into the current session (existing same-named tables are
        replaced)."""
        import json as _json
        import os

        m = re.match(
            r"\s*IMPORT\s+DATABASE\s+FROM\s+'([^']+)'\s*$", stmt,
            re.IGNORECASE,
        )
        if not m:
            raise EngineError(f"cannot parse IMPORT DATABASE: {stmt[:80]}")
        root = m.group(1)
        mpath = os.path.join(root, "_manifest.json")
        if not os.path.exists(mpath):
            raise EngineError(f"no database manifest at {root}")
        with open(mpath) as fh:
            manifest = _json.load(fh)
        for name, meta in sorted(manifest.items()):
            df = self.spark.read.parquet(os.path.join(root, name))
            cols = [
                ColumnDef(
                    name=c["name"],
                    type_str=c["type"],
                    not_null=c["not_null"],
                    unique=c["unique"],
                    default=c["default"],
                    auto_increment=c["auto_increment"],
                )
                for c in meta["columns"]
            ]
            df = df.localCheckpoint(eager=True)
            df.createOrReplaceTempView(name)
            self.tables[name] = TableState(
                name=name,
                columns=cols,
                df=df,
                auto_counter={
                    k: int(v) for k, v in meta["auto_counter"].items()
                },
            )
        return Payload(
            kind="Select", labels=["imported"], rows=[(len(manifest),)]
        )
