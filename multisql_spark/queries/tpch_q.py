"""Decision-support query shapes (TPC-H-style) over the driver testdata.

The reference cannot run any of these (no subqueries, no EXISTS/IN, no
DISTINCT aggregation — SURVEY §2.8 "absent"); they are the beyond-
reference proof that the engine handles the classic analytic patterns
with the plans you want at 100 TB:

- EXISTS/IN       → left-semi joins (never a per-row subquery);
- groupwise-max   → aggregate once, join back (or window top-k);
- count-distinct  → partial-aggregated exact distinct (and
  `approx_sketches` for the 100 TB interactive path);
- left-join count → distribution without losing zero-count rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multisql_spark.queries import register
from multisql_spark.tables import load_tables

DEC = "decimal(18,2)"


@register(
    "tpch_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
      )
    GROUP BY o.o_orderpriority
    """,
    tags=("tpch", "exists", "semi-join"),
)
def tpch_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS as a LEFT SEMI join — one shuffle on the join key,
    no per-row subquery; the semi join short-circuits on first match so
    the lineitem side never materializes duplicates."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    o, l = t["orders"], t["lineitem"]
    big = l.filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        o.filter(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1996-01-01")
        )
        .join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_cust_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("tpch", "left-join", "distribution"),
)
def tpch_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: per-customer order counts (LEFT join keeps zero-order
    customers) re-aggregated into a distribution. Two shuffles total —
    join+count on c_custkey, then a tiny re-agg on the count value."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    c, o = t["customer"], t["orders"]
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@register(
    "tpch_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey,
             SUM(CAST(round(l_extendedprice * (1 - l_discount), 4)
                 AS DECIMAL(18,4))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("tpch", "groupwise-max", "view"),
)
def tpch_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: revenue view + groupwise max. The max is a scalar
    aggregate broadcast into the filter (no second scan of lineitem:
    Spark reuses the revenue aggregation subtree for both consumers)."""
    t = load_tables(spark, sf_dir, ["supplier", "lineitem"])
    s, l = t["supplier"], t["lineitem"]
    revenue = (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                ).cast("decimal(18,4)")
            ).alias("total_revenue")
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(revenue, s.s_suppkey == revenue.l_suppkey)
        .join(
            F.broadcast(max_rev),
            revenue.total_revenue == F.col("m"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_brand_supplier_count",
    oracle="""
    SELECT p.p_brand, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#3' AND p.p_size IN (1, 5, 9)
    GROUP BY p.p_brand, p.p_size
    """,
    tags=("tpch", "count-distinct"),
)
def tpch_brand_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: exact COUNT(DISTINCT) per group. Spark plans this as a
    two-phase expand/aggregate (distinct keys partially deduped map-side);
    at 100 TB prefer `approx_sketches`' HLL for interactive use."""
    t = load_tables(spark, sf_dir, ["part", "lineitem"])
    p, l = t["part"], t["lineitem"]
    return (
        p.filter(
            (F.col("p_brand") != "Brand#3")
            & F.col("p_size").isin(1, 5, 9)
        )
        .join(l, p.p_partkey == l.l_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "tpch_large_orders",
    oracle=f"""
    SELECT c.c_name, o.o_orderkey,
           CAST(floor(date_part('epoch', o.o_orderdate)) AS BIGINT)
             AS o_date,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 210
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate
    """,
    tags=("tpch", "in-subquery", "having"),
)
def tpch_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: IN over a grouped HAVING → semi join against the
    aggregated key set. The heavy lineitem aggregation happens once;
    the key set (rare orders) then semi-joins back — at scale the key
    set is small enough for a broadcast semi join under AQE."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    c, o, l = t["customer"], t["orders"], t["lineitem"]
    big_keys = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 210)
        .select("l_orderkey")
    )
    return (
        o.join(
            big_keys.withColumnRenamed("l_orderkey", "bk"),
            o.o_orderkey == F.col("bk"),
            "left_semi",
        )
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .groupBy(
            "c_name",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("o_date"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).alias("total_qty")
        )
    )


@register(
    "tpch_cheapest_lineitem",
    oracle="""
    WITH ranked AS (
      SELECT l_partkey, l_orderkey, l_suppkey, l_extendedprice,
             ROW_NUMBER() OVER (
               PARTITION BY l_partkey
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
             ) AS rn
      FROM lineitem
    )
    SELECT l_partkey, l_orderkey, l_suppkey, l_extendedprice
    FROM ranked WHERE rn = 1
    """,
    tags=("tpch", "groupwise-min", "window"),
)
def tpch_cheapest_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shaped groupwise-min (cheapest sale per part) via a window
    row_number with a total tie-break — one shuffle on the partition key,
    no self-join back (the join-back formulation shuffles lineitem
    twice)."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ["lineitem"])
    w = W.partitionBy("l_partkey").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return (
        t["lineitem"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_partkey", "l_orderkey", "l_suppkey", "l_extendedprice")
    )


@register(
    "tpch_nation_volume",
    oracle="""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                    AS DECIMAL(18,4))) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    WHERE ns.n_nationkey < 3 AND nc.n_nationkey < 3
      AND ns.n_nationkey <> nc.n_nationkey
    GROUP BY 1, 2, 3
    """,
    tags=("tpch", "multi-join", "volume"),
)
def tpch_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: shipping volume between nation pairs by year — a
    five-way join where the two nation legs broadcast (tiny dims), the
    fact tables shuffle once each on their join keys, and the year
    extraction stays in codegen."""
    t = load_tables(
        spark, sf_dir, ["lineitem", "orders", "customer", "supplier", "nation"]
    )
    l, o, c, s, n = (
        t["lineitem"], t["orders"], t["customer"], t["supplier"], t["nation"]
    )
    small_n = n.filter(F.col("n_nationkey") < 3)
    ns = F.broadcast(
        small_n.select(
            F.col("n_nationkey").alias("ns_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    nc = F.broadcast(
        small_n.select(
            F.col("n_nationkey").alias("nc_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(nc, c.c_nationkey == F.col("nc_key"))
        .join(ns, s.s_nationkey == F.col("ns_key"))
        .filter(F.col("ns_key") != F.col("nc_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                ).cast("decimal(18,4)")
            ).alias("volume")
        )
    )


@register(
    "tpch_promo_share",
    oracle="""
    SELECT strftime(date_trunc('month', l.l_shipdate), '%Y-%m') AS ship_month,
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                         AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             AS promo_revenue,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                    AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
    tags=("tpch", "conditional-agg"),
)
def tpch_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional revenue share per month — one fact shuffle,
    the part dimension broadcasts, and the CASE folds into the partial
    aggregate (no second pass over lineitem).

    r12, tried and REVERTED on measurement (guide §1.1): a spread of
    the four needed columns ahead of the fused
    probe+date_format+aggregate won 2.6× at sf0.1 (1.21 → 0.45 s; the
    single-row-group scan pins the fused aggregate to one core) but
    LOST 20–30 % at derived sf10, where the scan has a few real splits
    and the full-corpus exchange costs more than the extra parallelism
    recovers.  The safe `only_if_serial` variant never fires here
    because Spark's 4 MB split packing gives the local file phantom
    empty splits (getNumPartitions()=3, one non-empty).  Kept the
    exchange-free shape: it is the right plan at every real scale, and
    the aggregation parallelizes naturally once the table has >1 row
    group.  (cube_status_priority differs: its orders file IS a single
    split locally, so its only_if_serial spread fires there and
    no-ops at sf10 — see core.py.)"""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    l, p = t["lineitem"], t["part"]
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
    ).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            F.date_format("l_shipdate", "yyyy-MM").alias("ship_month")
        )
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
            ).alias("promo_revenue"),
            F.sum(rev).alias("total_revenue"),
        )
    )


@register(
    "tpch_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount), 4)
                AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 5)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 15)
    """,
    tags=("tpch", "disjunctive"),
)
def tpch_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunction of conjunctive brackets over a join.
    Catalyst extracts the common join key as an equi condition and keeps
    the OR brackets as a residual, so the plan stays a hash/broadcast
    join (never a nested loop); the brand/size sides of each bracket
    that mention only `part` columns are pushed to the part scan as an
    OR-of-ANDs filter."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    l, p = t["lineitem"], t["part"]
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 5)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & (F.col("l_quantity") >= 10)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & (F.col("l_quantity") >= 15)
        )
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(bracket)
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                ).cast("decimal(18,4)")
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                  AS DECIMAL(18,4)) AS volume,
             s.s_nationkey
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p   ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE p.p_type = 'STANDARD'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN s_nationkey = 1 THEN volume
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             AS nation_volume,
           CAST(SUM(volume) AS DOUBLE) AS total_volume,
           round(CAST(SUM(CASE WHEN s_nationkey = 1 THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM vol GROUP BY o_year
    """,
    tags=("tpch", "market-share", "conditional-agg"),
)
def tpch_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: the target nation's share of STANDARD-part revenue per
    order year. One conditional aggregation over the joined fact — the
    share is numerator/denominator of the SAME decimal-exact sums, so no
    second pass; part/supplier broadcast, lineitem-orders shuffle once."""
    t = load_tables(
        spark, sf_dir, ["lineitem", "orders", "part", "supplier"]
    )
    l, o, p, s = t["lineitem"], t["orders"], t["part"], t["supplier"]
    vol = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
    ).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    nation_vol = F.sum(
        F.when(F.col("s_nationkey") == 1, vol).otherwise(zero)
    ).cast("double")
    total_vol = F.sum(vol).cast("double")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p.filter(F.col("p_type") == "STANDARD")),
              l.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(s), l.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            nation_vol.alias("nation_volume"),
            total_vol.alias("total_volume"),
            F.round(nation_vol / total_vol, 6).alias("mkt_share"),
        )
    )


@register(
    "tpch_wealthy_inactive",
    oracle="""
    WITH cutoff AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS total_bal
    FROM customer c, cutoff
    WHERE c.c_acctbal > cutoff.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
    tags=("tpch", "anti-join", "scalar-subquery"),
)
def tpch_wealthy_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers with no orders, counted
    per nation. The positive-balance average is a 1-row broadcast
    (scalar-subquery pattern), the no-orders test is a LEFT ANTI join on
    o_custkey — both scale-safe; nothing but customer/orders shuffles."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    c, o = t["customer"], t["orders"]
    cutoff = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    return (
        c.join(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bal"),
        )
    )


@register(
    "tpch_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue,
           CAST(floor(date_part('epoch', o_orderdate)) AS BIGINT)
             AS orderdate_sec,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '2024-03-15'
      AND l_shipdate > TIMESTAMP '2024-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, orderdate_sec, l_orderkey
    LIMIT 10
    """,
    tags=("tpch", "q3", "topk"),
)
def tpch_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape (shipping priority): top-10 unshipped orders by revenue
    for one market segment.

    Both date predicates and the segment filter push into their parquet
    scans; customer (segment-filtered) broadcasts onto orders, the
    aggregation partial-combines on l_orderkey, and the top-10 is a
    TakeOrderedAndProject heap — never a global sort of the revenue
    table.  Total (revenue, date, orderkey) tie-break keeps the limit
    deterministic."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    o = t["orders"].filter(F.col("o_orderdate") < "2024-03-15").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = t["lineitem"].filter(F.col("l_shipdate") > "2024-03-15").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    rev = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(18,4)")
    return (
        li.join(
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
            li.l_orderkey == o.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev), 4).alias("revenue"))
        .select(
            "l_orderkey",
            F.col("revenue").cast("double").alias("revenue"),
            F.unix_timestamp("o_orderdate")
            .cast("long")
            .alias("orderdate_sec"),
            "o_orderpriority",
        )
        .orderBy(
            F.desc("revenue"), F.asc("orderdate_sec"), F.asc("l_orderkey")
        )
        .limit(10)
    )


@register(
    "tpch_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice * l_discount
             AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue_delta
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2024-01-01'
      AND l_shipdate < TIMESTAMP '2025-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "q6", "scan-agg"),
)
def tpch_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape (forecasting revenue change): one filtered scan, one
    global sum — the canonical pushdown showcase.  Every predicate
    (date range, discount band, quantity cap) reaches the parquet scan
    as PushedFilters; the sum partial-aggregates per file split, so a
    single 8-byte partial crosses the exchange per task."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= "2024-01-01")
        & (F.col("l_shipdate") < "2025-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(18,4)"
                )
            ),
            4,
        )
        .cast("double")
        .alias("revenue_delta")
    )


@register(
    "tpch_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue,
           round(c_acctbal, 2) AS c_acctbal,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '2024-01-01'
      AND o_orderdate < TIMESTAMP '2024-07-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch", "q10", "returned"),
)
def tpch_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape (returned item reporting): top-20 customers by revenue
    lost to returns in a half-year window.

    The returnflag and date filters push to the scans; nation (25 rows)
    broadcasts; the customer-grain aggregation partial-combines; top-20
    is a TakeOrderedAndProject heap with a c_custkey tie-break."""
    t = load_tables(
        spark, sf_dir, ["customer", "orders", "lineitem", "nation"]
    )
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "2024-01-01")
        & (F.col("o_orderdate") < "2024-07-01")
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    rev = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(t["customer"], o.o_custkey == F.col("c_custkey"))
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(rev), 4).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            F.col("revenue").cast("double").alias("revenue"),
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    tags=("tpch", "q5", "local-supplier"),
)
def tpch_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape (local supplier volume): revenue where the customer and
    the supplier share a nation, summed per nation for one region-year.

    The region→nation leg broadcasts (tiny dims) and prunes suppliers
    BEFORE the fact join; the c_nationkey = s_nationkey condition rides
    the supplier equi-join as an extra equality (Catalyst keeps it in the
    hash-join key set, not a residual), so the only shuffles are the two
    fact joins on their natural keys."""
    t = load_tables(
        spark, sf_dir,
        ["customer", "orders", "lineitem", "supplier", "nation", "region"],
    )
    c, o, l, s = t["customer"], t["orders"], t["lineitem"], t["supplier"]
    asia_nations = (
        t["nation"]
        .join(
            t["region"].filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    s_asia = s.join(
        F.broadcast(asia_nations), s.s_nationkey == F.col("n_nationkey")
    )
    o_year = o.filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    return (
        l.join(o_year, l.l_orderkey == o_year.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(
            s_asia,
            (l.l_suppkey == s_asia.s_suppkey)
            & (c.c_nationkey == s_asia.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                ).cast("decimal(18,4)")
            ).alias("revenue")
        )
    )


@register(
    "tpch_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                    AS DECIMAL(18,4)))
              - SUM(CAST(round(0.6 * p.p_retailprice * l.l_quantity, 4)
                    AS DECIMAL(18,4))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
    tags=("tpch", "q9", "profit"),
)
def tpch_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (product-type profit): per supplier-nation per year,
    revenue minus supply cost for one part family.  The reference schema
    has no partsupp table, so supply cost is modeled as 60% of the part's
    retail price — the join topology (fact × 2 broadcast dims × orders)
    is the load-bearing part.

    The `p_name LIKE` filter prunes part BEFORE broadcast, which then
    semi-prunes lineitem through the broadcast hash join; revenue and
    cost are separate decimal-exact sums subtracted after aggregation
    (addition-order-independent, so bit-stable at any parallelism)."""
    t = load_tables(
        spark, sf_dir, ["lineitem", "part", "supplier", "orders", "nation"]
    )
    l, p, s, o, n = (
        t["lineitem"], t["part"], t["supplier"], t["orders"], t["nation"]
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
    ).cast("decimal(18,4)")
    cost = F.round(
        0.6 * F.col("p_retailprice") * F.col("l_quantity"), 4
    ).cast("decimal(18,4)")
    return (
        l.join(
            F.broadcast(p.filter(F.col("p_name").like("%widget%"))),
            l.l_partkey == p.p_partkey,
        )
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            (F.sum(rev) - F.sum(cost)).cast("double").alias("profit")
        )
    )


@register(
    "tpch_important_stock",
    oracle="""
    WITH value_per_part AS (
      SELECT l.l_partkey,
             SUM(CAST(round(l.l_extendedprice * l.l_quantity, 2)
                 AS DECIMAL(18,2))) AS part_value
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey < 5
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM value_per_part
    WHERE part_value > (SELECT SUM(part_value) * 0.0005 FROM value_per_part)
    """,
    tags=("tpch", "q11", "having-scalar"),
)
def tpch_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (important stock): per-part traded value restricted to
    one supplier region, keeping parts above a fraction of the TOTAL
    value — a grouped aggregate filtered against a scalar aggregate of
    itself.

    The per-part aggregation runs once; the total re-aggregates its
    (small) output and broadcasts as a 1-row literal join — no second
    scan of lineitem, no correlated subquery.  Value sums are exact
    DECIMAL so the threshold comparison is engine-independent."""
    t = load_tables(spark, sf_dir, ["lineitem", "supplier"])
    l, s = t["lineitem"], t["supplier"]
    per_part = (
        l.join(
            F.broadcast(s.filter(F.col("s_nationkey") < 5)),
            l.l_suppkey == s.s_suppkey,
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * F.col("l_quantity"), 2
                ).cast("decimal(18,2)")
            ).alias("part_value")
        )
    )
    threshold = per_part.agg(
        (F.sum("part_value") * 0.0005).alias("cut")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("cut"))
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
    )


@register(
    "tpch_shipmode_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY l.l_linestatus
    """,
    tags=("tpch", "q12", "late-shipment"),
)
def tpch_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (shipping modes / order priority): count late-shipped
    lines (shipped >60 days after ordering) per line status, split by
    order priority — the canonical conditional-count pair.

    One shuffle (the orderkey join); the lateness predicate is a
    timestamp-interval comparison evaluated post-join in codegen; both
    CASE counts fold into the same partial aggregate."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    o, l = t["orders"], t["lineitem"]
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_part_promotion",
    oracle="""
    WITH q96 AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty96
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'SMALL'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ),
    q97 AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty97
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'SMALL'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    )
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_parts_grown
    FROM q97
    JOIN q96 ON q97.l_suppkey = q96.l_suppkey
            AND q97.l_partkey = q96.l_partkey
    JOIN supplier s ON s.s_suppkey = q97.l_suppkey
    WHERE q97.qty97 * 2 > q96.qty96 * 3
    GROUP BY 1, 2
    """,
    tags=("tpch", "q20", "correlated-agg"),
)
def tpch_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (part promotion): suppliers whose shipped quantity of a
    part family GREW >1.5× year-over-year — the decorrelated form of
    "quantity > threshold derived from my own correlated aggregate".

    Both per-(supplier, part) aggregates share the broadcast-pruned
    lineitem⋈part subtree; their join is on the same (suppkey, partkey)
    grouping key, so under AQE the second shuffle co-locates with the
    first.  The 1.5× test is integer-scaled decimal (×2 vs ×3) — exact,
    no float boundary."""
    t = load_tables(spark, sf_dir, ["lineitem", "part", "supplier"])
    l, p, s = t["lineitem"], t["part"], t["supplier"]
    small = l.join(
        F.broadcast(p.filter(F.col("p_type") == "SMALL")),
        l.l_partkey == p.p_partkey,
    )

    def year_qty(lo: str, hi: str, out: str) -> DataFrame:
        return (
            small.filter(
                (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
            )
            .groupBy("l_suppkey", "l_partkey")
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias(out)
            )
        )

    q96 = year_qty("1996-01-01", "1997-01-01", "qty96")
    q97 = year_qty("1997-01-01", "1998-01-01", "qty97")
    return (
        q97.join(q96, ["l_suppkey", "l_partkey"])
        .filter(F.col("qty97") * 2 > F.col("qty96") * 3)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_parts_grown"))
    )


@register(
    "tpch_waiting_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name,
           COUNT(DISTINCT o.o_orderkey) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 75 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 75 DAY
      )
    GROUP BY 1, 2
    """,
    tags=("tpch", "q21", "exists-not-exists"),
)
def tpch_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (suppliers who kept orders waiting): for finished orders
    with >1 supplier, find the SOLE supplier who shipped late.

    The oracle states it with correlated EXISTS + NOT EXISTS; running
    that literally is two extra passes over lineitem per outer row.  The
    Spark plan decorrelates to ONE aggregation over the joined fact:
    per order, count distinct suppliers, count distinct LATE suppliers,
    and remember the (unique) late supplier via a conditional MAX —
    orders with n_supp > 1 and n_late = 1 yield their culprit directly.
    One orderkey shuffle instead of three; bit-identical result."""
    t = load_tables(spark, sf_dir, ["supplier", "lineitem", "orders"])
    s, l, o = t["supplier"], t["lineitem"], t["orders"]
    late = (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 75 DAYS")
    )
    per_order = (
        l.join(
            o.filter(F.col("o_orderstatus") == "F"),
            l.l_orderkey == o.o_orderkey,
        )
        .withColumn("is_late", late)
        .groupBy("o_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(
                F.when(F.col("is_late"), F.col("l_suppkey"))
            ).alias("n_late"),
            F.max(
                F.when(F.col("is_late"), F.col("l_suppkey"))
            ).alias("late_supp"),
        )
    )
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.countDistinct("o_orderkey").alias("numwait"))
    )
