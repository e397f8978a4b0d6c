"""Streaming / temporal queries over ``events`` (operators in
:mod:`multisql_spark.streaming`): tumbling / sliding / session windows and
an as-of join.

``stream_tumbling`` runs through a REAL Structured Streaming query
(readStream → watermark → window agg → memory sink, driven to completion)
and still hash-matches the DuckDB oracle — batch/stream unification made
concrete. The others use the identical operators in batch mode to keep the
correctness sweep fast."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multisql_spark import streaming
from multisql_spark.queries import REGISTRY, register
from multisql_spark.tables import load_tables

# DuckDB-side helpers: epoch seconds of ns-timestamps, aligned to window
_EPOCH = "CAST(floor(date_part('epoch', ts)) AS BIGINT)"


@register(
    "stream_tumbling",
    oracle=f"""
    SELECT
      ({_EPOCH} // 300) * 300 AS win_start,
      event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "tumbling"),
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling windows per event_type — executed as a real
    Structured Streaming query with a 10-minute watermark."""
    load_tables(spark, sf_dir, ["events"])
    return streaming.run_stream_to_memory(
        spark, sf_dir, lambda s: streaming.tumbling_counts(s, minutes=5)
    )


@register(
    "stream_sliding",
    oracle=f"""
    WITH starts AS (
      SELECT event_type, ({_EPOCH} // 300) * 300 AS s0 FROM events
    ),
    expanded AS (
      SELECT event_type, unnest([s0, s0 - 300]) AS win_start FROM starts
    )
    SELECT win_start, event_type, COUNT(*) AS n
    FROM expanded GROUP BY 1, 2
    """,
    tags=("streaming", "sliding"),
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding by 5 — each event lands in exactly 2
    windows (window start is a pure function of ts: map-side, no state)."""
    t = load_tables(spark, sf_dir, ["events"])
    return streaming.sliding_counts(t["events"], length_min=10, slide_min=5)


@register(
    "stream_session",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM ordered
    )
    SELECT CAST(floor(date_part('epoch', MIN(ts))) AS BIGINT) AS sess_start,
           CAST(user_id AS BIGINT) AS user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM sessions
    GROUP BY user_id, sess_id
    """,
    tags=("streaming", "session"),
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows per user (native session_window operator;
    oracle = classic lag/gap-islands SQL — same semantics)."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        streaming.session_windows(t["events"], gap_min=30)
        .select("sess_start", "user_id", "n_events", "total_value")
    )


@register(
    "stream_stream_join",
    oracle="""
    SELECT CAST(p.event_id AS BIGINT) AS purchase_id,
           CAST(c.event_id AS BIGINT) AS click_id,
           CAST(p.user_id AS BIGINT) AS user_id,
           CAST(floor(date_part('epoch', p.ts)) AS BIGINT) AS purchase_ts,
           CAST(floor(date_part('epoch', c.ts)) AS BIGINT) AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts > p.ts - INTERVAL 60 MINUTE
     AND c.ts <= p.ts
    """,
    tags=("streaming", "stream-stream-join"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (watermark-bounded state) run as a REAL
    streaming query — hash-matches the equivalent batch join, proving
    batch/stream unification on a binary stateful operator."""
    load_tables(spark, sf_dir, ["events"])
    return streaming.stream_stream_join(spark, sf_dir, window_min=60)


@register(
    "stream_stateful_sessionize",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM ordered
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(floor(date_part('epoch', MIN(ts))) AS BIGINT) AS sess_start,
           CAST(floor(date_part('epoch', MAX(ts))) AS BIGINT) AS sess_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
             AS total_cents,
           MAX(value) AS max_value
    FROM sessions
    GROUP BY user_id, sid
    """,
    tags=("streaming", "stateful", "applyInPandasWithState"),
)
def stream_stateful_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user session
    state machine with event-time timeouts, run through a REAL streaming
    query — and still hash-matched against an exact SQL oracle (integer-
    cents arithmetic makes the stateful path exactly reproducible)."""
    load_tables(spark, sf_dir, ["events"])
    return streaming.stateful_sessionize(spark, sf_dir, gap_min=30)


@register(
    "asof_join_events",
    oracle=f"""
    SELECT CAST(p.event_id AS BIGINT) AS purchase_id,
           CAST(p.user_id AS BIGINT) AS user_id,
           CAST(floor(date_part('epoch', p.ts)) AS BIGINT) AS purchase_ts,
           CAST(c.event_id AS BIGINT) AS last_click_id,
           CAST(floor(date_part('epoch', c.ts)) AS BIGINT) AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("asof", "join"),
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (reference lacks it; DuckDB has native ASOF JOIN):
    for each purchase, the user's most recent prior-or-equal click.

    Spark-first implementation: union the two streams tagged, one window
    pass per user ordered by (ts, tag) carrying the last click forward
    with last_value(ignoreNulls) — a single shuffle on user_id, no
    nested-loop, scales to arbitrarily many rows per user (vs. the
    naive join + filter + argmax which re-shuffles pairs)."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ["events"])
    e = t["events"]
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    # clicks sort before purchases at equal ts (tag 0 < 1) so "prior or
    # equal" matches ASOF's >= semantics
    tagged = clicks.withColumn("tag", F.lit(0)).unionByName(
        purchases.withColumn("tag", F.lit(1))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = tagged.select(
        "user_id",
        "ts",
        "purchase_id",
        F.last("click_id", ignorenulls=True).over(w).alias("last_click_id"),
        F.last(
            F.when(F.col("click_id").isNotNull(), F.col("ts")),
            ignorenulls=True,
        )
        .over(w)
        .alias("click_ts"),
    )
    return carried.filter(F.col("purchase_id").isNotNull()).select(
        F.col("purchase_id").cast("long").alias("purchase_id"),
        F.col("user_id").cast("long"),
        F.unix_timestamp("ts").alias("purchase_ts"),
        F.col("last_click_id").cast("long"),
        F.unix_timestamp("click_ts").alias("click_ts"),
    )


@register(
    "stream_dedup",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(floor(date_part('epoch', ts)) AS BIGINT) AS ts_sec,
           CAST(user_id AS BIGINT) AS user_id,
           event_type,
           CAST(value AS DOUBLE) AS value
    FROM events
    """,
    tags=("streaming", "dedup"),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup: the source redelivers every event in
    a second microbatch; ``dropDuplicatesWithinWatermark(event_id)`` must
    emit each exactly once — so the output equals the batch table."""
    load_tables(spark, sf_dir, ["events"])
    return streaming.stream_dedup_exactly_once(spark, sf_dir)


@register(
    "stream_dedup_digest",
    oracle="""
    WITH base AS (
      SELECT CAST(event_id AS BIGINT) AS event_id,
             CAST(floor(date_part('epoch', ts)) AS BIGINT) AS ts_sec,
             CAST(user_id AS BIGINT) AS user_id,
             event_type,
             CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value_s
      FROM events
    ),
    strs AS (
      -- coalesce each field to a sentinel: '||' nulls the whole string
      -- on any NULL field (md5 drops out of SUM but not COUNT) while
      -- Spark's concat_ws silently skips NULLs — either way the two
      -- digests would diverge on the first NULL, so pin both sides to
      -- the same explicit encoding (chr(31) = unit separator)
      SELECT coalesce(CAST(event_id AS VARCHAR), chr(31)) || '|'
             || coalesce(CAST(ts_sec AS VARCHAR), chr(31)) || '|'
             || coalesce(CAST(user_id AS VARCHAR), chr(31)) || '|'
             || coalesce(event_type, chr(31)) || '|'
             || coalesce(value_s, chr(31)) AS s
      FROM base
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT))
                AS BIGINT) AS digest_sum
    FROM strs
    """,
    tags=("streaming", "dedup", "digest", "extreme-scale"),
)
def stream_dedup_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once dedup certified WITHOUT driver materialization
    (VERDICT r8 ask #4): same double-delivery stream and
    ``dropDuplicatesWithinWatermark`` as `stream_dedup`, but through the
    distributed parquet file sink, then reduced to an order-independent
    value digest — (row count, sum over rows of the first 48 bits of
    md5(canonical row string)).  The digest pins every row's full
    content (any changed/missing/duplicated row moves the sum), yet the
    driver only ever sees ONE row — so the exactly-once path certifies
    at derived sf1000 where the memory-sink twin's O(events) driver
    transfer kills the JVM.  The oracle recomputes the identical digest
    in DuckDB over the batch table (exactly-once output == batch
    table)."""
    load_tables(spark, sf_dir, ["events"])
    d = streaming.stream_dedup_exactly_once(spark, sf_dir, sink="parquet")
    # NULL-symmetric canonicalization (ADVICE r9): concat_ws SKIPS null
    # fields (row still hashed, separator dropped) while the oracle's
    # '||' nulls the whole string — coalesce every field to the same
    # chr(31) sentinel on both sides so a future NULL-bearing fixture
    # fails loudly on content, not silently on encoding.
    nul = F.lit("\x1f")
    s = F.concat_ws(
        "|",
        F.coalesce(F.col("event_id").cast("string"), nul),
        F.coalesce(F.col("ts_sec").cast("string"), nul),
        F.coalesce(F.col("user_id").cast("string"), nul),
        F.coalesce(F.col("event_type"), nul),
        F.coalesce(F.col("value").cast("decimal(18,2)").cast("string"), nul),
    )
    # 32-bit per-row digests summed as exact int64 (≤ 2^62 for 2^30
    # rows): a 48-bit digest summed needs >2^53 and silently rides
    # decimal→double conversion on both compare paths — the typed local
    # parity gate caught that in r9.
    return d.select(s.alias("s")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long")
        ).alias("digest_sum"),
    )


@register(
    "stream_incremental_dedup",
    oracle="""
    WITH hashed AS (
      SELECT doc_id, md5(lower(trim(text))) AS h FROM documents
    ),
    idx AS (
      SELECT h, min(doc_id) AS canonical_id
      FROM hashed WHERE doc_id % 10 <> 0 GROUP BY h
    )
    SELECT CAST(n.doc_id AS BIGINT) AS doc_id,
           i.canonical_id IS NOT NULL AS is_dup,
           CAST(i.canonical_id AS BIGINT) AS canonical_id
    FROM hashed n LEFT JOIN idx i USING (h)
    WHERE n.doc_id % 10 = 0
    """,
    tags=("streaming", "dedup", "ingestion"),
)
def stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: newly ingested documents arrive as a real
    ``readStream`` and probe the standing corpus's static (hash → min-id)
    index per microbatch; output must equal the batch `dedup_incremental`
    query (shared oracle). No watermark state — append-mode resolution
    on arrival."""
    load_tables(spark, sf_dir, ["documents"])
    return streaming.stream_static_incremental_dedup(spark, sf_dir)


@register(
    "stream_rollup_sink",
    oracle=f"""
    SELECT ({_EPOCH} // 3600) * 3600 AS win_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "sink", "rollup"),
)
def stream_rollup_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming → parquet-table sink via foreachBatch with atomic
    swap-on-write (idempotent under redelivery); the returned relation is
    a scan of the materialized table and must equal the batch hourly
    rollup (shared oracle shape with `events_rollup_hourly`)."""
    load_tables(spark, sf_dir, ["events"])
    return streaming.stream_rollup_to_table(spark, sf_dir, minutes=60)


@register(
    "stream_upsert_sink",
    oracle=f"""
    SELECT user_id, last_ts_sec, last_event_id, last_value, last_type
    FROM (
      SELECT CAST(user_id AS BIGINT) AS user_id,
             {_EPOCH} AS last_ts_sec,
             event_id AS last_event_id,
             value AS last_value,
             event_type AS last_type,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY {_EPOCH} DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("streaming", "sink", "upsert", "cdc"),
)
def stream_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming keyed-upsert sink: per-user latest state merged into a
    parquet table by ``foreachBatch`` (update mode — only changed keys
    flow), hash-matched against the batch last-writer-wins snapshot."""
    load_tables(spark, sf_dir, ["events"])
    return streaming.stream_upsert_to_table(spark, sf_dir)


@register(
    "stream_heavy_hitters_cms",
    oracle=None,  # set below: shares the batch CMS oracle verbatim
    tags=("streaming", "sketch", "count-min"),
)
def stream_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Count-Min sketch: per-microbatch partial cell counts
    merge ADDITIVELY into a standing parquet cell table (foreachBatch +
    applied-batch ledger for exactly-once), then candidates probe the
    final sketch — hash-matched against the SAME DuckDB oracle as the
    batch `text_heavy_hitters_cms`, proving streaming ingestion
    converges to the batch sketch."""
    return streaming.stream_cms_heavy_hitters(spark, sf_dir)


# share the batch oracle so the driver's t2 hash-compare applies the
# identical ground truth to the streamed sketch
from multisql_spark.queries.text_q import CMS_ORACLE as _CMS_ORACLE  # noqa: E402

REGISTRY["stream_heavy_hitters_cms"].oracle = _CMS_ORACLE


@register(
    "stream_incremental_minhash",
    oracle=None,  # set below: shares the batch incremental-minhash oracle
    tags=("streaming", "dedup", "lsh", "incremental"),
)
def stream_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup ingestion: new documents probe the standing
    corpus's banded-LSH index per microbatch (stream-static, one-sided);
    the drained sink bit-matches the batch `dedup_incremental_minhash`
    and shares its DuckDB oracle."""
    return streaming.stream_minhash_ingest(spark, sf_dir)


from multisql_spark.queries.dedup_q import (  # noqa: E402
    _incremental_minhash_oracle as _IMH,
)

REGISTRY["stream_incremental_minhash"].oracle = _IMH()


@register(
    "stream_hll_sink",
    oracle=None,  # set below: shares the batch deterministic-HLL oracle
    tags=("streaming", "sketch", "hll", "sink"),
)
def stream_hll_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deterministic-HLL register sink: microbatch partials
    MAX-merge into a standing 4096-register table (idempotent — no
    applied-batch ledger needed, unlike the additive CMS), and the
    drained sketch hash-matches the batch `sketch_hll_deterministic`'s
    DuckDB oracle — streaming ingestion provably converges to the batch
    estimate, not just the same row shape."""
    return streaming.stream_hll_sink(spark, sf_dir)


from multisql_spark.queries import pipeline_q as _pq  # noqa: E402, F401

REGISTRY["stream_hll_sink"].oracle = REGISTRY["sketch_hll_deterministic"].oracle


@register(
    "stream_quantile_sink",
    oracle=None,  # set below: shares the batch bottom-k quantile oracle
    tags=("streaming", "sketch", "quantile", "sink"),
)
def stream_quantile_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming bottom-k sample sink: microbatch candidates min-merge
    into a standing ≤1024-row sample (idempotent — the min-k monoid
    needs no redelivery ledger, like the HLL registers), and the drained
    sample's order statistics hash-match the batch
    `sketch_quantile_bottomk`'s DuckDB oracle verbatim."""
    return streaming.stream_quantile_sink(spark, sf_dir)


REGISTRY["stream_quantile_sink"].oracle = (
    REGISTRY["sketch_quantile_bottomk"].oracle
)
