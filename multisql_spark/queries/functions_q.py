"""Scalar function parity queries (SURVEY.md §2.8).

The reference's function surface lives in
``src/data/value/methods/{function,utility,timestamp}.rs`` with dispatch in
``src/data/recipe/from/method.rs:13-56``. Each query below exercises a
cluster of those functions over the TPC-H-ish tables, aliased identically
on the Spark and DuckDB sides. Quirks carried over (and documented):

- ``LEN`` is *byte* length (utility.rs:77-80) → ``octet_length`` / DuckDB
  ``strlen``.
- ``CONCAT`` / ``||`` propagate NULL (binary.rs:117-130) → Spark ``concat``
  matches; DuckDB's ``concat`` ignores NULLs so the oracle uses ``||``.
- float→int CAST truncates (cast.rs:79-99) → Spark matches; DuckDB CAST
  rounds, so oracles use ``trunc()`` explicitly.
- integer ``/`` is integer division in the reference (§1.2) — exercised via
  explicit FLOOR to keep both engines aligned on positive operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multisql_spark.queries import register
from multisql_spark.tables import load_tables


@register(
    "fn_string",
    oracle="""
    SELECT
      p_partkey,
      upper(p_name) AS up_name,
      lower(p_brand) AS low_brand,
      substr(p_name, 1, 5) AS left5,
      substr(p_name, length(p_name) - 2, 3) AS right3,
      CAST(strlen(p_name) AS INT) AS byte_len,
      p_brand || '-' || p_type AS brand_type,
      replace(p_type, 'a', '@') AS replaced,
      trim(p_name) AS trimmed,
      CAST(instr(p_name, 'a') AS BIGINT) AS pos_a
    FROM part
    """,
    tags=("functions", "string"),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPPER/LOWER/LEFT/RIGHT/LEN/CONCAT/REPLACE (reference utility.rs
    33-93); LEN is byte-length parity, hence octet_length."""
    t = load_tables(spark, sf_dir, ["part"])
    p = t["part"]
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("low_brand"),
        F.substring("p_name", 1, 5).alias("left5"),
        F.expr("substring(p_name, -3, 3)").alias("right3"),
        F.octet_length("p_name").alias("byte_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.expr("replace(p_type, 'a', '@')").alias("replaced"),
        F.trim("p_name").alias("trimmed"),
        F.instr("p_name", "a").cast("long").alias("pos_a"),
    )


@register(
    "fn_concat_null_propagation",
    oracle="""
    SELECT
      c_custkey,
      c_name || nullif(c_mktsegment, 'BUILDING') AS maybe_null,
      coalesce(c_name || nullif(c_mktsegment, 'BUILDING'), '<null>')
        AS filled
    FROM customer
    """,
    tags=("functions", "string", "null"),
)
def fn_concat_null_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONCAT propagates NULL in the reference (string_concat,
    binary.rs:117-130) — Spark concat matches; DuckDB oracle uses `||`."""
    t = load_tables(spark, sf_dir, ["customer"])
    c = t["customer"]
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        F.concat(F.col("c_name"), seg).alias("maybe_null"),
        F.coalesce(F.concat(F.col("c_name"), seg), F.lit("<null>")).alias(
            "filled"
        ),
    )


@register(
    "fn_math",
    oracle="""
    SELECT
      p_partkey,
      round(p_retailprice, 1) AS rounded1,
      round(p_retailprice) AS rounded0,
      CAST(power(p_size, 2) AS DOUBLE) AS size_sq,
      abs(p_size - 25) AS dist25,
      CAST(p_size % 7 AS INT) AS m7,
      CAST(floor(p_retailprice / 100) AS BIGINT) AS bucket,
      CAST(ceil(p_retailprice / 100) AS BIGINT) AS bucket_up,
      sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt
    FROM part
    """,
    tags=("functions", "math"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUND/POW plus the math surface the reference lacks (ABS/SQRT —
    absent per §2.8; native in Spark)."""
    t = load_tables(spark, sf_dir, ["part"])
    p = t["part"]
    return p.select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("rounded1"),
        F.round("p_retailprice", 0).alias("rounded0"),
        F.pow("p_size", 2).alias("size_sq"),
        F.abs(F.col("p_size") - 25).alias("dist25"),
        (F.col("p_size") % 7).alias("m7"),
        F.floor(F.col("p_retailprice") / 100).alias("bucket"),
        F.ceil(F.col("p_retailprice") / 100).alias("bucket_up"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT
      s_suppkey,
      if(s_acctbal > 5000, 'rich', 'modest') AS wealth,
      ifnull(nullif(s_nationkey, 0), -1) AS nation_or_neg,
      nullif(s_nationkey, 3) AS maybe_nation,
      coalesce(nullif(s_name, s_name), s_name, 'x') AS always_name,
      CASE s_nationkey % 3 WHEN 0 THEN 'zero' WHEN 1 THEN 'one'
           ELSE 'two' END AS mod_class
    FROM supplier
    """,
    tags=("functions", "conditional"),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IIF / IFNULL / NULLIF / COALESCE / CASE-operand (reference
    function.rs:37-51, recipe new.rs:218-240)."""
    t = load_tables(spark, sf_dir, ["supplier"])
    s = t["supplier"]
    return s.select(
        "s_suppkey",
        F.when(F.col("s_acctbal") > 5000, "rich")
        .otherwise("modest")
        .alias("wealth"),
        F.ifnull(F.nullif(F.col("s_nationkey"), F.lit(0)), F.lit(-1)).alias(
            "nation_or_neg"
        ),
        F.nullif(F.col("s_nationkey"), F.lit(3)).alias("maybe_nation"),
        F.coalesce(
            F.nullif(F.col("s_name"), F.col("s_name")),
            F.col("s_name"),
            F.lit("x"),
        ).alias("always_name"),
        F.when(F.col("s_nationkey") % 3 == 0, "zero")
        .when(F.col("s_nationkey") % 3 == 1, "one")
        .otherwise("two")
        .alias("mod_class"),
    )


@register(
    "fn_cast",
    oracle="""
    SELECT
      o_orderkey,
      CAST(trunc(o_totalprice) AS BIGINT) AS price_int,
      CAST(o_orderkey AS VARCHAR) AS key_str,
      CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS roundtrip,
      CAST(o_orderkey % 2 = 0 AS INT) AS even_int,
      CAST('123' AS BIGINT) + 1 AS parsed,
      CAST('1.5' AS DOUBLE) * 2 AS parsed_f
    FROM orders
    """,
    tags=("functions", "cast"),
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST semantics (reference cast.rs:24-145): float→int truncates
    (Spark matches; DuckDB oracle uses trunc()), bool⇄int 1/0,
    string⇄number round-trips."""
    t = load_tables(spark, sf_dir, ["orders"])
    o = t["orders"]
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("long").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("long").alias("roundtrip"),
        (F.col("o_orderkey") % 2 == 0).cast("int").alias("even_int"),
        (F.lit("123").cast("long") + 1).alias("parsed"),
        (F.lit("1.5").cast("double") * 2).alias("parsed_f"),
    )


@register(
    "fn_timestamp_extract",
    oracle="""
    SELECT
      event_id,
      CAST(year(ts) AS INT) AS y,
      CAST(month(ts) AS INT) AS mo,
      CAST(day(ts) AS INT) AS d,
      CAST(hour(ts) AS INT) AS h,
      CAST(minute(ts) AS INT) AS mi,
      CAST(second(ts) AS INT) AS s,
      CAST(dayofweek(ts) AS INT) AS dow,
      strftime(ts, '%Y-%m-%d') AS day_str
    FROM events
    WHERE event_id < 200
    """,
    tags=("functions", "timestamp"),
)
def fn_timestamp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YEAR..SECOND extraction (reference timestamp.rs:118-143 over
    unix-second i64; ours over real timestamps, UTC-pinned)."""
    t = load_tables(spark, sf_dir, ["events"])
    e = t["events"]
    return e.filter(F.col("event_id") < 200).select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("s"),
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),  # 0=Sunday, both
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
    )


@register(
    "fn_timestamp_arith",
    oracle="""
    SELECT
      o_orderkey,
      CAST(date_part('epoch', o_orderdate + INTERVAL 3 MONTH) AS BIGINT)
        AS plus3m,
      CAST(date_part('epoch', o_orderdate + INTERVAL 10 DAY) AS BIGINT)
        AS plus10d,
      CAST(date_part('epoch', o_orderdate - INTERVAL 1 YEAR) AS BIGINT)
        AS minus1y,
      CAST(date_part('epoch', make_timestamp(2024, 5, 17, 0, 0, 0.0))
        AS BIGINT) AS fixed_ts,
      CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
        AS days_since
    FROM orders
    WHERE o_orderkey < 500
    """,
    tags=("functions", "timestamp"),
)
def fn_timestamp_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATEADD / DATEFROMPARTS (reference timestamp.rs:146-313) via
    Spark timestampadd/make_timestamp; epoch-seconds output keeps the
    comparison timezone-proof."""
    t = load_tables(spark, sf_dir, ["orders"])
    o = t["orders"]
    return o.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.unix_timestamp(F.expr("timestampadd(MONTH, 3, o_orderdate)"))
        .alias("plus3m"),
        F.unix_timestamp(F.expr("timestampadd(DAY, 10, o_orderdate)"))
        .alias("plus10d"),
        F.unix_timestamp(F.expr("timestampadd(YEAR, -1, o_orderdate)"))
        .alias("minus1y"),
        F.unix_timestamp(F.expr("make_timestamp(2024, 5, 17, 0, 0, 0)"))
        .alias("fixed_ts"),
        F.expr("datediff(DAY, timestamp'1995-01-01', o_orderdate)")
        .cast("long")
        .alias("days_since"),
    )


@register(
    "fn_convert_rules",
    oracle="""
    SELECT
      CAST(date_part('epoch', strptime('2024-03-05 10:20:30',
        '%Y-%m-%d %H:%M:%S')) AS BIGINT) AS rule_020,
      CAST(date_part('epoch', strptime('05/03/2024 10:20',
        '%d/%m/%Y %H:%M')) AS BIGINT) AS rule_060,
      CAST(date_part('epoch', strptime('20240305', '%Y%m%d')) AS BIGINT)
        AS rule_040,
      strftime(to_timestamp(86400), '%Y-%m-%d %H:%M:%S') AS txt_datetime,
      '$' || format('{:,}', CAST(trunc(round(1234567.891, 2)) AS BIGINT))
          || '.' || lpad(CAST(CAST(round((round(1234567.891, 2)
               - trunc(round(1234567.891, 2))) * 100) AS BIGINT) AS VARCHAR),
               2, '0') AS txt_money
    """,
    tags=("functions", "convert"),
)
def fn_convert_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERT rule codes (reference cast.rs:216-300): 020 database
    format, 060 AU locale, 040 compact date; TEXT output rules DATETIME
    and MONEY (cast.rs:170-200). Runs through the dialect shim."""
    from multisql_spark.dialect import rewrite

    sql = """
    SELECT
      CAST(unix_timestamp(CONVERT('TIMESTAMP', '2024-03-05 10:20:30', 020))
        AS BIGINT) AS rule_020,
      CAST(unix_timestamp(CONVERT('TIMESTAMP', '05/03/2024 10:20', 060))
        AS BIGINT) AS rule_060,
      CAST(unix_timestamp(CONVERT('TIMESTAMP', '20240305', 040)) AS BIGINT)
        AS rule_040,
      CONVERT('TEXT', 86400, 'DATETIME') AS txt_datetime,
      CONVERT('TEXT', 1234567.891, 'MONEY') AS txt_money
    """
    load_tables(spark, sf_dir, [])
    return spark.sql(rewrite(sql))


@register(
    "fn_like_in",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_name LIKE '%a%' AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND p_type NOT LIKE 'x%'
    """,
    tags=("functions", "like", "in"),
)
def fn_like_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / IN — absent from the reference grammar
    (RecipeError::UnimplementedExpression, new.rs:306); native here."""
    t = load_tables(spark, sf_dir, ["part"])
    p = t["part"]
    return p.select("p_partkey", "p_name", "p_brand").filter(
        F.col("p_name").like("%a%")
        & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & ~F.col("p_type").like("x%")
    )


@register(
    "fn_json_extract",
    oracle="""
    SELECT
      event_id,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
      CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    WHERE event_id < 300
    """,
    tags=("functions", "json"),
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction over the events.props payload column —
    beyond-reference; Spark get_json_object is codegen'd JVM-side."""
    t = load_tables(spark, sf_dir, ["events"])
    e = t["events"]
    k = F.get_json_object("props", "$.k").cast("long")
    return e.filter(F.col("event_id") < 300).select(
        "event_id",
        k.alias("k_val"),
        (k % 10).alias("k_mod"),
    )


@register(
    "fn_regex",
    oracle="""
    SELECT
      doc_id,
      regexp_replace(text, '[aeiou]', '*', 'g') AS devoweled,
      regexp_matches(text, 'data|table') AS mentions_data,
      CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT)
        AS n_tokens
    FROM documents
    WHERE doc_id < 100
    """,
    tags=("functions", "regex"),
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex replace/match — absent in the reference; Spark native.
    (Token count via length-diff: identical trick both engines.)"""
    t = load_tables(spark, sf_dir, ["documents"])
    d = t["documents"]
    return d.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.regexp_replace("text", "[aeiou]", "*").alias("devoweled"),
        F.col("text").rlike("data|table").alias("mentions_data"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", " ", ""))
            + 1
        ).cast("int").alias("n_tokens"),
    )
