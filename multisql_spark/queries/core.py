"""Core relational operator parity queries (SURVEY.md §2.2-2.7).

Each query reproduces a capability of the reference engine
(scan/project/filter, joins of all five types, aggregation, HAVING,
ORDER BY with null placement, LIMIT/OFFSET, set operations, VALUES, CTEs,
DISTINCT) expressed Spark-first: declarative DataFrame ops that Catalyst
compiles to pushed-down columnar scans, broadcast/SMJ joins and partial
aggregation — the reference's hand-rolled equivalents live in
``src/executor/query/select/`` (see SURVEY.md §3-4 for the mapping).

Scale notes are attached per query: at 100 TB the same plans hold because
every join keys on high-cardinality columns (shuffle hash / SMJ with AQE),
small dimensions are broadcast, and aggregates are partial-agg'd map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multisql_spark.queries import register
from multisql_spark.tables import load_tables

DEC = "decimal(18,2)"  # exact money arithmetic: order-independent sums


# ---------------------------------------------------------------------------
# Scan / projection / filter  (reference: src/executor/query/select/mod.rs:62-75)
# ---------------------------------------------------------------------------


@register(
    "scan_project_filter",
    oracle="""
    SELECT p_partkey, p_name, p_size
    FROM part
    WHERE p_size > 30
    """,
    tags=("scan", "filter", "projection"),
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan + projection + filter; Catalyst pushes both into the
    parquet reader (PushedFilters + ReadSchema) — the reference re-reads
    full rows and prunes per-expression (planned.rs:150-169)."""
    t = load_tables(spark, sf_dir, ["part"])
    return (
        t["part"]
        .select("p_partkey", "p_name", "p_size")
        .filter(F.col("p_size") > 30)
    )


@register(
    "filter_arithmetic",
    oracle="""
    SELECT p_partkey, p_size, p_retailprice
    FROM part
    WHERE p_size > 15 + 15 OR (p_retailprice / 2.0 > 700.0 AND p_size % 2 = 0)
    """,
    tags=("filter", "expressions"),
)
def filter_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic inside predicates (reference test ability/index/filter:
    `a > 1 + 1`); constant folding is Catalyst's ConstantFolding rule."""
    t = load_tables(spark, sf_dir, ["part"])
    p = t["part"]
    return p.select("p_partkey", "p_size", "p_retailprice").filter(
        (F.col("p_size") > 15 + 15)
        | ((F.col("p_retailprice") / 2.0 > 700.0) & (F.col("p_size") % 2 == 0))
    )


@register(
    "projection_case_between",
    oracle="""
    SELECT
      c_custkey,
      CASE WHEN c_acctbal < 0 THEN 'neg'
           WHEN c_acctbal < 5000 THEN 'mid'
           ELSE 'high' END AS bal_class,
      (c_acctbal BETWEEN 0 AND 5000) AS in_range,
      c_mktsegment = 'BUILDING' AS is_building,
      c_nationkey + 100 AS shifted
    FROM customer
    """,
    tags=("projection", "case", "between"),
)
def projection_case_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / BETWEEN / boolean and arithmetic projection — the
    reference Recipe surface (src/data/recipe/new.rs:218-270)."""
    t = load_tables(spark, sf_dir, ["customer"])
    c = t["customer"]
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_class"),
        F.col("c_acctbal").between(0, 5000).alias("in_range"),
        (F.col("c_mktsegment") == "BUILDING").alias("is_building"),
        (F.col("c_nationkey") + 100).alias("shifted"),
    )


# ---------------------------------------------------------------------------
# Aggregation  (reference: src/executor/query/select/mod.rs:76-183)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount), 4)
        AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      ROUND(AVG(l_quantity), 4) AS avg_qty,
      ROUND(AVG(l_discount), 4) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("aggregate", "groupby", "flagship"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (flagship). Partial aggregation
    map-side, 2-column group key — at 100 TB this is a near-perfect
    map-combine plan with a tiny shuffle (few groups)."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    l = t["lineitem"]
    return (
        l.filter(F.col("l_shipdate") <= "2000-12-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).alias("sum_base_price"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                ).cast("decimal(18,4)")
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_global",
    oracle=f"""
    SELECT
      COUNT(*) AS n_rows,
      CAST(COUNT(l_quantity) AS BIGINT) AS n_qty,
      CAST(MIN(l_orderkey) AS BIGINT) AS min_ok,
      CAST(MAX(l_orderkey) AS BIGINT) AS max_ok,
      CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) AS sum_price,
      ROUND(AVG(l_extendedprice), 4) AS avg_price
    FROM lineitem
    """,
    tags=("aggregate",),
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit global aggregation (reference: any aggregate select item
    triggers one-group mode, select/mod.rs:76-86)."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    l = t["lineitem"]
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_quantity").alias("n_qty"),
        F.min("l_orderkey").alias("min_ok"),
        F.max("l_orderkey").alias("max_ok"),
        F.sum(F.col("l_extendedprice").cast(DEC)).alias("sum_price"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
    )


@register(
    "group_having",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) > 5
    """,
    tags=("aggregate", "having"),
)
def group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + aggregate HAVING — exceeds the reference, which errors on
    aggregates in HAVING (SelectError::UnimplementedAggregateHaving)."""
    t = load_tables(spark, sf_dir, ["orders"])
    o = t["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("total_spend"),
        )
        .filter(F.col("n_orders") > 5)
    )


@register(
    "group_by_expr",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("aggregate", "groupby-expression"),
)
def group_by_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY on computed expressions (reference allows expression
    groupers, select/mod.rs:100-107)."""
    t = load_tables(spark, sf_dir, ["orders"])
    o = t["orders"]
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("o_year"),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("total"),
        )
    )


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    tags=("distinct",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT — the reference parses-and-ignores it
    (manual/mod.rs:47); we implement the intended semantics."""
    t = load_tables(spark, sf_dir, ["customer"])
    return t["customer"].select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------------------
# Joins  (reference: src/executor/query/select/join/)
# ---------------------------------------------------------------------------


@register(
    "join_inner_agg",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS {DEC})) AS DOUBLE) AS spend
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    tags=("join", "inner"),
)
def join_inner_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join + aggregate. The reference's ColumnEqColumn
    sort-merge (join/method.rs:108-276); Catalyst picks broadcast here
    (customer ≪ orders) and SMJ/shuffle-hash at 100 TB."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    c, o = t["customer"], t["orders"]
    return (
        c.join(o, c.c_custkey == o.o_custkey, "inner")
        .groupBy(c.c_custkey, c.c_name)
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("spend"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
      ON c.c_custkey = o.o_custkey
    """,
    tags=("join", "left"),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with null padding on the probe-miss side
    (reference join/method.rs:219-247)."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    c = t["customer"]
    o = t["orders"].filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "o_orderkey"
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey
    FROM (SELECT * FROM customer WHERE c_acctbal < 0) c
    RIGHT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    tags=("join", "right"),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    c = t["customer"].filter(F.col("c_acctbal") < 0)
    o = t["orders"]
    return c.join(o, c.c_custkey == o.o_custkey, "right").select(
        "o_orderkey", "c_custkey"
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT a.k AS left_k, b.k AS right_k
    FROM (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal < 0) a
    FULL JOIN (SELECT DISTINCT o_custkey AS k FROM orders
               WHERE o_totalprice > 350000) b
      ON a.k = b.k
    """,
    tags=("join", "full"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with nulls emitted on both sides
    (reference join/method.rs:248-276)."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    a = (
        t["customer"]
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    b = (
        t["orders"]
        .filter(F.col("o_totalprice") > 350000)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    return a.join(b, a.k == b.k, "full").select(
        a.k.alias("left_k"), b.k.alias("right_k")
    )


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    tags=("join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross product (reference JoinMethod::All, join/method.rs:48-57).
    Only sane with a bounded side; Spark requires explicit crossJoin."""
    t = load_tables(spark, sf_dir, ["region", "nation"])
    return t["region"].crossJoin(t["nation"]).select("r_name", "n_name")


@register(
    "join_theta",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey
    FROM supplier s
    JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    """,
    tags=("join", "theta"),
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """θ-join: equi component + inequality residual. The reference drops to
    a nested-loop General join (join/method.rs:58-107); Catalyst keeps the
    equi key for the shuffle and evaluates the residual post-match —
    still a hash join at scale, not a cartesian."""
    t = load_tables(spark, sf_dir, ["supplier", "customer"])
    s, c = t["supplier"], t["customer"]
    return s.join(
        c,
        (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal),
        "inner",
    ).select("s_suppkey", "c_custkey")


@register(
    "join_multi_revenue",
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
               AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
    """,
    tags=("join", "multi", "tpch-q5"),
)
def join_multi_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-table join (TPC-H Q5 shape). Catalyst broadcast-joins the
    dimension chain (region→nation→customer) and shuffles only the
    orders⋈lineitem edge — the plan the reference's left-deep fold can't
    produce. At 100 TB: dims broadcast, fact-fact SMJ on l_orderkey."""
    t = load_tables(
        spark, sf_dir, ["customer", "orders", "lineitem", "nation", "region"]
    )
    c, o, l, n, r = (
        t["customer"],
        t["orders"],
        t["lineitem"],
        t["nation"],
        t["region"],
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter((r.r_name == "ASIA") & (o.o_orderdate >= "1996-01-01"))
        .groupBy(n.n_name)
        .agg(
            F.sum(
                F.round(
                    l.l_extendedprice * (1 - l.l_discount), 4
                ).cast("decimal(18,4)")
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "join_semi_anti",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 200000)) AS n_with_big_order,
      (SELECT COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)) AS n_no_orders
    """,
    tags=("join", "semi", "anti"),
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins (EXISTS / NOT EXISTS) — absent from the reference
    grammar; first-class left_semi/left_anti joins in Spark (no row
    duplication, build side only hashes keys)."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    c, o = t["customer"], t["orders"]
    # one lazy plan, no driver-side actions: orders pre-aggregates to one
    # row per customer (semi ≡ has any row, anti ≡ no row), then a single
    # left join + conditional aggregate answers both counts in one job
    per_cust = o.groupBy("o_custkey").agg(
        F.max((F.col("o_totalprice") > 200000).cast("int")).alias("has_big")
    )
    joined = c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
    return joined.agg(
        F.coalesce(
            F.sum(F.when(F.col("has_big") == 1, 1).otherwise(0)), F.lit(0)
        ).alias("n_with_big_order"),
        F.coalesce(
            F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)),
            F.lit(0),
        ).alias("n_no_orders"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / offset  (reference: order.rs, query/mod.rs:55-100)
# ---------------------------------------------------------------------------


@register(
    "order_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 5
    """,
    tags=("sort", "limit", "offset"),
)
def order_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-term ORDER BY + LIMIT/OFFSET with a total tie-break so the
    selected window is deterministic. Spark plans TakeOrderedAndProject —
    a per-partition top-(k+offset) then merge, no full sort at scale."""
    t = load_tables(spark, sf_dir, ["orders"])
    return (
        t["orders"]
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(5)
        .limit(20)
    )


@register(
    "order_nulls_placement",
    oracle="""
    SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
    FROM customer
    ORDER BY seg NULLS FIRST, c_custkey
    LIMIT 50
    """,
    tags=("sort", "nulls"),
)
def order_nulls_placement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS FIRST/LAST placement (reference order.rs:12-119 — its null
    comparator is asymmetric; we implement the declared semantics)."""
    t = load_tables(spark, sf_dir, ["customer"])
    c = t["customer"]
    return (
        c.select(
            "c_custkey",
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        )
        .orderBy(F.col("seg").asc_nulls_first(), F.col("c_custkey"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Set operations  (reference: src/executor/query/set_expr.rs:53-81)
# ---------------------------------------------------------------------------

_SET_LEFT = "SELECT o_custkey AS k FROM orders WHERE o_totalprice > 250000"
_SET_RIGHT = "SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000"


def _set_sides(spark: SparkSession, sf_dir: str):
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    left = (
        t["orders"]
        .filter(F.col("o_totalprice") > 250000)
        .select(F.col("o_custkey").alias("k"))
    )
    right = (
        t["customer"]
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("k"))
    )
    return left, right


@register(
    "set_union_distinct",
    oracle=f"{_SET_LEFT} UNION {_SET_RIGHT}",
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with distinct semantics — the reference's `.dedup()` only
    removes adjacent duplicates (set_expr.rs:78-80, a bug); we implement
    the intended semantics per SURVEY §2.7."""
    left, right = _set_sides(spark, sf_dir)
    return left.union(right).distinct()


@register(
    "set_union_all",
    oracle=f"{_SET_LEFT} UNION ALL {_SET_RIGHT}",
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    left, right = _set_sides(spark, sf_dir)
    return left.union(right)


@register(
    "set_except",
    oracle=f"{_SET_LEFT} EXCEPT {_SET_RIGHT}",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    left, right = _set_sides(spark, sf_dir)
    return left.subtract(right)


@register(
    "set_except_all",
    oracle=f"{_SET_LEFT} EXCEPT ALL {_SET_RIGHT}",
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    left, right = _set_sides(spark, sf_dir)
    return left.exceptAll(right)


@register(
    "set_intersect",
    oracle=f"{_SET_LEFT} INTERSECT {_SET_RIGHT}",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    left, right = _set_sides(spark, sf_dir)
    return left.intersect(right)


@register(
    "set_intersect_all",
    oracle=f"{_SET_LEFT} INTERSECT ALL {_SET_RIGHT}",
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    left, right = _set_sides(spark, sf_dir)
    return left.intersectAll(right)


# ---------------------------------------------------------------------------
# VALUES / CTE / subqueries  (reference: set_expr.rs:26-52, query/mod.rs:72-91)
# ---------------------------------------------------------------------------


@register(
    "values_inline",
    oracle="""
    SELECT CAST(id AS BIGINT) AS id, name, CAST(score AS DOUBLE) AS score
    FROM (VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5), (3, 'gamma', NULL))
         AS t(id, name, score)
    """,
    tags=("values",),
)
def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone VALUES rows (reference set_expr.rs:26-52, labels
    unnamed_{i}; we use explicit aliases so both sides agree)."""
    return spark.sql(
        """
        SELECT CAST(id AS BIGINT) AS id, name, CAST(score AS DOUBLE) AS score
        FROM VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5), (3, 'gamma', NULL)
             AS t(id, name, score)
        """
    )


@register(
    "cte_chained",
    oracle=f"""
    WITH big_orders AS (
      SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 100000
    ),
    spend AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS {DEC})) AS total
      FROM big_orders GROUP BY o_custkey
    )
    SELECT c.c_name, CAST(s.total AS DOUBLE) AS total
    FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
    WHERE s.total > 500000
    """,
    tags=("cte",),
)
def cte_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained CTEs (reference eagerly materializes each into tempdb,
    query/mod.rs:72-91; Spark inlines them lazily — strictly better)."""
    load_tables(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        f"""
        WITH big_orders AS (
          SELECT o_custkey, o_totalprice FROM orders
          WHERE o_totalprice > 100000
        ),
        spend AS (
          SELECT o_custkey, SUM(CAST(o_totalprice AS {DEC})) AS total
          FROM big_orders GROUP BY o_custkey
        )
        SELECT c.c_name, s.total
        FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
        WHERE s.total > 500000
        """
    )


@register(
    "subquery_scalar_in",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
      AND c_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_regionkey <= 2)
    """,
    tags=("subquery",),
)
def subquery_scalar_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar + IN subqueries — the reference disabled subqueries entirely
    (recipe/new.rs:271-304 commented out); Catalyst decorrelates these."""
    load_tables(spark, sf_dir, ["customer", "nation"])
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
          AND c_nationkey IN (SELECT n_nationkey FROM nation
                              WHERE n_regionkey <= 2)
        """
    )


# ---------------------------------------------------------------------------
# Window functions / grouping sets (beyond reference — SURVEY §2.5)
# ---------------------------------------------------------------------------


@register(
    "window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via row_number window — the canonical OLAP pattern
    the reference cannot express (no OVER support, recipe/new.rs:306)."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ["orders"])
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t["orders"]
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_lag",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS {DEC})) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS running,
           LAG(o_orderkey) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS prev_ok,
           CAST(RANK() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT)
             AS price_rank
    FROM orders
    """,
    tags=("window", "running", "lag"),
)
def window_running_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ["orders"])
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC))
        .over(wo.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("running"),
        F.lag("o_orderkey").over(wo).alias("prev_ok"),
        F.rank().over(wr).cast("long").alias("price_rank"),
    )


@register(
    "rollup_region_nation",
    oracle="""
    SELECT r.r_name, n.n_name, COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    tags=("rollup", "groupingsets"),
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (absent in reference — SURVEY §2.4 'free on
    Spark'); partial aggregation still applies per grouping set."""
    t = load_tables(spark, sf_dir, ["customer", "nation", "region"])
    c, n, r = t["customer"], t["nation"], t["region"]
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", "n_name")
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "pivot_status_by_year",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
      COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
      COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial,
      CAST(SUM(CAST(o_totalprice AS {DEC}))
        FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_total
    FROM orders
    GROUP BY 1
    """,
    tags=("pivot",),
)
def pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot as conditional aggregation — shuffle-free width expansion
    (one pass, map-side combine) vs. the .pivot() API's two-pass."""
    t = load_tables(spark, sf_dir, ["orders"])
    o = t["orders"]

    def n_status(s: str):
        return F.count(F.when(F.col("o_orderstatus") == s, 1))

    return (
        o.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            n_status("O").alias("n_open"),
            n_status("F").alias("n_filled"),
            n_status("P").alias("n_partial"),
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "O",
                    F.col("o_totalprice").cast(DEC),
                )
            ).alias("open_total"),
        )
    )


@register(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("cube", "groupingsets"),
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping combinations in one pass —
    Spark plans a single Expand + aggregate, scanning orders once).

    r12 (guide §2.2/§2.5): scale-adaptive `spread` of the three needed
    columns ahead of the fused Expand(4×)+aggregate, which otherwise
    runs on ONE core over the local single-row-group scan.  Bit-safe:
    COUNT and an exact DECIMAL sum are order-independent.  Values
    identical (A/B + oracle ×3 SFs); 0.42 → 0.22 s fresh noop at
    sf0.1; no-op at cluster scale where the scan splits."""
    from multisql_spark.operators import spread

    t = load_tables(spark, sf_dir, ["orders"])
    o = spread(
        t["orders"].select(
            "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
        ),
        key="o_orderkey",
        only_if_serial=True,
    ).drop("o_orderkey")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("total"),
        )
    )


@register(
    "grouping_sets_mixed",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("groupingsets",),
)
def grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (two independent 1-d summaries + grand
    total, one scan)."""
    t = load_tables(spark, sf_dir, ["orders"])
    t["orders"].createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "window_ntile_quartiles",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile,
             o_totalprice
      FROM orders
    )
    SELECT quartile, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM t GROUP BY quartile
    """,
    tags=("window", "ntile"),
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) quartiles with no global single-partition sort.

    ``NTILE(4) OVER (ORDER BY ...)`` forces every row through one reducer.
    The scale-safe equivalent computed here is bit-exact to NTILE:

    1. approx_percentile cutpoints split the key space into ~32 range
       buckets (one small aggregate; cutpoints are literals thereafter);
    2. row_number partitioned by bucket gives a local rank (the only
       data-scale Window, partitioned — no single-reducer exchange);
    3. per-bucket counts cumulate into offsets over the tiny (≤33-row)
       aggregated frame, broadcast back; global rank = offset + local;
    4. NTILE's bucket arithmetic (first N%4 buckets take one extra row)
       in integer math on the exact rank.

    Ties never straddle buckets: the bucket key is o_totalprice alone, so
    equal keys share a bucket and the composite (price, orderkey) order
    inside the partitioned window stays total."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ["orders"])
    o = t["orders"].select("o_totalprice", "o_orderkey")
    probs = [i / 32 for i in range(1, 32)]
    cuts = sorted(
        set(
            o.agg(
                F.percentile_approx(
                    "o_totalprice", F.lit(probs), F.lit(10000)
                ).alias("c")
            ).collect()[0]["c"]
            or []  # empty input: no cutpoints, one bucket
        )
    )
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + F.when(
            F.col("o_totalprice") > F.lit(c), 1
        ).otherwise(0)
    w_local = W.partitionBy("_pid").orderBy("o_totalprice", "o_orderkey")
    local = o.withColumn("_pid", bucket).withColumn(
        "_lr", F.row_number().over(w_local)
    )
    sizes = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_tiny = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    w_all = W.orderBy("_pid").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    offs = sizes.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_tiny), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(w_all).alias("_total"),
    )
    ranked = (
        local.join(F.broadcast(offs), "_pid")
        .withColumn("_rank", F.col("_off") + F.col("_lr"))
        .withColumn("_q", F.expr("_total div 4"))
        .withColumn("_rem", F.expr("_total % 4"))
        .withColumn(
            "quartile",
            F.expr(
                "CAST(CASE WHEN _rank <= _rem * (_q + 1)"
                " THEN (_rank + _q) div (_q + 1)"
                " ELSE _rem + (_rank - _rem * (_q + 1) + _q - 1)"
                "       div greatest(_q, 1) END AS INT)"
            ),
        )
    )
    return (
        ranked.groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("total"),
        )
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey AS region,
           array_to_string(list_sort(list(n_name)), '|') AS nations,
           string_agg(n_name, ',' ORDER BY n_name) AS csv_names
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("aggregate", "collect"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-to-array and ordered string aggregation. Arrays are sorted
    post-collect (collect_list order is partition-dependent — the
    deterministic form is the only one that hash-matches across engines,
    and the only one that's reproducible at scale at all). The array is
    emitted as a '|'-joined string: the driver's pandas canonicalizer
    cannot hash list cells (test_oracle_parity keeps an array-form
    assertion locally)."""
    t = load_tables(spark, sf_dir, ["nation"])
    return (
        t["nation"]
        .groupBy(F.col("n_regionkey").alias("region"))
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("n_name")), "|"
            ).alias("nations"),
            F.array_join(
                F.sort_array(F.collect_list("n_name")), ","
            ).alias("csv_names"),
        )
    )


@register(
    "window_rank_distribution",
    # pr/cd are quantized to integer MICRO-UNITS with floor(x*1e6 + 0.5)
    # — both engines compute the same IEEE double for (rank-1)/(n-1), so
    # the multiply/add/floor chain is bit-identical, where a decimal
    # round(x, 6) diverges at shortest-repr ...5 boundaries (Spark
    # HALF_UP on Double.toString vs DuckDB on the binary value — first
    # hit at sf100's 15M-row partitions, r9 sweep).
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT)
             AS pr_micro,
           CAST(floor(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT)
             AS cd_micro,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice,
                 o_orderkey)
    """,
    tags=("window", "distribution"),
)
def window_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile within priority groups — the
    distribution-rank window family. Partitioned on o_orderpriority (a
    bounded set, but each partition's sort is distributed; for a single
    global distribution at 100 TB use the approx-percentile cutpoint
    pattern of `window_ntile_quartiles`). Total order via the
    (o_totalprice, o_orderkey) tie-break keeps ranks engine-identical;
    micro-unit quantization keeps the emitted values engine-identical
    (see oracle note)."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ["orders"])
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return t["orders"].select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.percent_rank().over(w) * 1000000 + 0.5).alias("pr_micro"),
        F.floor(F.cume_dist().over(w) * 1000000 + 0.5).alias("cd_micro"),
        F.ntile(4).over(w).alias("quartile"),
    )
