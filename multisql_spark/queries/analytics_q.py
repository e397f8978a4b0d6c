"""Round-2 analytics additions: ROWS-frame window statistics, batch
gap-sessionization, robust (median/MAD) outlier screening, int8-quantized
vector search, per-group sampling caps, and the TPC-H Q17 small-quantity
revenue shape.

Every query is hash-matched against a DuckDB oracle computing the
identical arithmetic (integer or quantized fixed-point wherever floats
would be order-sensitive)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from multisql_spark.queries import register
from multisql_spark.tables import load_tables

_EPOCH = "CAST(floor(date_part('epoch', ts)) AS BIGINT)"


# ---------------------------------------------------------------------------
# Window frames: ROWS-bounded moving aggregates + positional values
# ---------------------------------------------------------------------------


@register(
    "window_frame_stats",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      round(sum(o_totalprice) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS moving_sum3,
      round(first_value(o_totalprice) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
        AS first_price,
      round(last_value(o_totalprice) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
        AS last_price,
      round(nth_value(o_totalprice, 2) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
        AS second_price,
      round(percent_rank() OVER (
        PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey), 6)
        AS pct_rank,
      round(cume_dist() OVER (
        PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey), 6)
        AS cume
    FROM orders
    """,
    tags=("window", "frames"),
)
def window_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS-frame moving sum plus positional window values
    (first/last/nth) and rank distributions (percent_rank/cume_dist).

    Beyond-reference window coverage (the reference has no window
    functions at all).  Both windows partition by ``o_custkey`` — a
    high-cardinality key — so at 100 TB this is one hash shuffle on the
    customer key and per-partition sorts; no global ordering anywhere.
    The ORDER BY carries ``o_orderkey`` as a total tie-break so frame
    contents are engine-identical."""
    t = load_tables(spark, sf_dir, ["orders"])
    seq = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = seq.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    rank_w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(seq.rowsBetween(-2, 0)), 2
        ).alias("moving_sum3"),
        F.round(F.first("o_totalprice").over(full), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(full), 2).alias("last_price"),
        F.round(
            F.nth_value("o_totalprice", 2).over(full), 2
        ).alias("second_price"),
        F.round(F.percent_rank().over(rank_w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(rank_w), 6).alias("cume"),
    )


# ---------------------------------------------------------------------------
# Batch gap-sessionization (lag → gap flag → cumulative session index)
# ---------------------------------------------------------------------------


@register(
    "events_sessionize_batch",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, event_type, {_EPOCH} AS ts_sec,
        CASE WHEN {_EPOCH} - lag({_EPOCH}) OVER (
          PARTITION BY user_id ORDER BY ts, event_id) > 1800
          OR lag({_EPOCH}) OVER (
          PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sess AS (
      SELECT user_id, event_id, event_type, ts_sec,
        sum(is_new) OVER (
          PARTITION BY user_id ORDER BY ts_sec, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      FROM seq
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(session_idx AS INT) AS session_idx,
           COUNT(*) AS n_events,
           CAST(max(ts_sec) - min(ts_sec) AS BIGINT) AS duration_sec,
           min(event_id) AS first_event_id
    FROM sess
    GROUP BY user_id, session_idx
    """,
    tags=("temporal", "sessionize"),
)
def events_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-sessionization: 30-minute inactivity closes a session.

    The canonical lag → new-session flag → running-sum session index
    pattern (the batch twin of ``stream_session``'s session window).
    Both window passes and the final groupBy share the ``user_id``
    hash partitioning, so Catalyst plans ONE exchange; at 100 TB the
    per-user event history sorts locally inside its partition."""
    t = load_tables(spark, sf_dir, ["events"])
    ts = F.unix_timestamp("ts").cast("long")
    seq = W.partitionBy("user_id").orderBy("ts_sec", "event_id")
    e = t["events"].select(
        "user_id", "event_id", "event_type", ts.alias("ts_sec")
    )
    gap = F.col("ts_sec") - F.lag("ts_sec").over(seq)
    e = e.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    e = e.withColumn(
        "session_idx",
        F.sum("is_new").over(seq.rowsBetween(W.unboundedPreceding, 0)),
    )
    return e.groupBy(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("session_idx").cast("int").alias("session_idx"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_sec") - F.min("ts_sec")).cast("long").alias(
            "duration_sec"
        ),
        F.min("event_id").alias("first_event_id"),
    )


# ---------------------------------------------------------------------------
# Robust outlier screen: exact median + MAD per group
# ---------------------------------------------------------------------------


@register(
    "events_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           round(max(d.med), 6) AS median_value,
           round(max(m.mad), 6) AS mad_value,
           COUNT(*) AS n,
           CAST(sum(CASE WHEN d.adev > 3 * 1.4826 * m.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
    tags=("monitor", "robust", "outliers"),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier screen: exact median + median absolute
    deviation, flagging |x − med| > 3·1.4826·MAD.

    Complements ``events_outlier_flags``'s 3-sigma screen — MAD is
    immune to the outliers it hunts.  Two bounded aggregations (group
    count = |event_type|, tiny) with broadcast joins back onto the
    stream; Spark's exact ``percentile`` and DuckDB's ``quantile_cont``
    share linear-interpolation semantics.  At 100 TB the exact median
    would swap to ``approx_percentile`` (documented in SCALE.md); the
    exact form is the correctness baseline."""
    t = load_tables(spark, sf_dir, ["events"])
    e = t["events"].select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 6).alias("median_value"),
            F.round(F.max("mad"), 6).alias("mad_value"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.col("adev") > 3 * 1.4826 * F.col("mad"), 1
                ).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Int8-quantized similarity search (integer dot products — exact hashes)
# ---------------------------------------------------------------------------

# round-half-up via floor(x + 0.5) so Spark and DuckDB quantize
# bit-identically (their ROUND tie rules differ)
_QUANT = (
    "CASE WHEN mx = 0 THEN 0 ELSE "
    "CAST(floor(x * 127.0 / mx + 0.5) AS INT) END"
)


@register(
    "sim_quantized_topk",
    oracle="""
    WITH emb AS (
      SELECT vec_id, embedding AS v,
             list_max(list_transform(embedding, x -> abs(x))) AS mx
      FROM embeddings
    ),
    q8 AS (
      SELECT vec_id,
             list_transform(v, x -> CASE WHEN mx = 0 THEN 0
               ELSE CAST(floor(x * 127.0 / mx + 0.5) AS INT) END) AS qv
      FROM emb
    ),
    qs AS (SELECT vec_id AS q_id, qv AS qq FROM q8 WHERE vec_id < 5),
    scored AS (
      SELECT q_id, c.vec_id AS cand_id,
             CAST(list_sum(list_transform(range(1, len(qq) + 1),
               i -> qq[i] * c.qv[i])) AS BIGINT) AS qdot
      FROM qs, q8 c WHERE c.vec_id <> q_id
    )
    SELECT q_id, cand_id, qdot FROM (
      SELECT q_id, cand_id, qdot,
             row_number() OVER (
               PARTITION BY q_id ORDER BY qdot DESC, cand_id) AS rk
      FROM scored
    ) WHERE rk <= 10
    """,
    tags=("similarity", "quantized", "knn"),
)
def sim_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 by int8-quantized dot product (vec_id < 5 query set).

    The quantized-vector scale path: per-vector symmetric int8
    quantization (scale = max|x|/127) shrinks the corpus 4× before it
    is ever shuffled or broadcast, and the scoring loop is integer
    multiply-adds — exactly reproducible across engines, so this is
    hash-checked (the float baseline `sim_bruteforce_topk` needs
    quantized scores).  Query set broadcasts; the corpus never shuffles;
    top-k per query is a WindowGroupLimit heap, not a global sort."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    emb = t["embeddings"].select(
        "vec_id",
        F.col("embedding").alias("v"),
        F.array_max(
            F.transform(F.col("embedding"), lambda x: F.abs(x))
        ).alias("mx"),
    )
    q8 = emb.select(
        "vec_id",
        F.transform(
            F.col("v"),
            lambda x: F.when(F.col("mx") == 0, F.lit(0)).otherwise(
                F.floor(x * 127.0 / F.col("mx") + 0.5).cast("int")
            ),
        ).alias("qv"),
    )
    qs = q8.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("qv").alias("qq")
    )
    scored = (
        q8.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("cand_id"),
            F.aggregate(
                F.zip_with(
                    F.col("qq"), F.col("qv"), lambda a, b: a * b
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("qdot"),
        )
    )
    rk = F.row_number().over(
        W.partitionBy("q_id").orderBy(F.desc("qdot"), F.asc("cand_id"))
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= 10)
        .select("q_id", "cand_id", "qdot")
    )


# ---------------------------------------------------------------------------
# Per-group sampling cap (per-domain document budget)
# ---------------------------------------------------------------------------


@register(
    "sample_per_group_cap",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    ) WHERE rk <= 10
    """,
    tags=("sampling", "cap"),
)
def sample_per_group_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source document cap: keep the 10 docs with the
    smallest md5(doc_id) per source.

    The per-domain budget primitive for mixture construction (cap any
    one domain's contribution).  Hash order makes the sample
    deterministic and repartition-stable; row_number-with-limit plans as
    WindowGroupLimit — a per-group top-k heap pushed before the final
    sort, never a global sort.  One shuffle on ``source``."""
    t = load_tables(spark, sf_dir, ["documents"])
    rk = F.row_number().over(
        W.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    return (
        t["documents"]
        .select("doc_id", "source")
        .withColumn("rk", rk)
        .filter(F.col("rk") <= 10)
        .select("doc_id", "source")
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: small-quantity order revenue vs per-part average
# ---------------------------------------------------------------------------


@register(
    "tpch_small_qty_revenue",
    oracle="""
    SELECT CAST(round(sum(l_extendedprice) / 7.0, 2) AS DOUBLE)
           AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
    tags=("tpch", "q17"),
)
def tpch_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue from orders below 20% of the part's average
    quantity (correlated scalar subquery per part).

    Spark-first decorrelation: the per-part average is ONE bounded
    pre-aggregation (|part| rows) broadcast back onto the lineitem
    scan — no correlated per-row subquery execution, no second lineitem
    shuffle.  The brand filter prunes the part side before both the
    aggregate probe and the join."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    li, part = t["lineitem"], t["part"]
    brand_parts = part.filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    # per-part avg only over parts that survive the brand filter: the
    # aggregation input is semi-join-pruned before it shuffles
    avg_q = (
        li.join(
            F.broadcast(brand_parts),
            li.l_partkey == brand_parts.p_partkey,
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg((F.avg("l_quantity") * 0.2).alias("qty_cut"))
    )
    picked = (
        li.join(F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(avg_q), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
    )
    return picked.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2)
        .cast("double")
        .alias("avg_yearly")
    )
