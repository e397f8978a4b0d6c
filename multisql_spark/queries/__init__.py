"""Query inventory registry.

Every implemented operator from SURVEY.md §2 (plus the beyond-reference
extensions) is declared here as a named query with:

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation;
- ``oracle`` — an equivalent ANSI-SQL string DuckDB can run on the same
  parquet tables (``None`` for genuinely non-SQL-expressible ops, which
  get a weaker rows-only check from the driver).

Conventions that make the driver's hash-compare deterministic:
- every computed column is aliased identically on both sides;
- money aggregates are summed as DECIMAL (exact, order-independent);
- floating aggregates are rounded to a fixed number of decimals;
- timestamps are returned as epoch-second BIGINTs or formatted strings;
- every LIMIT query carries a total tie-breaking ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from functools import wraps

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def canonical_output(df: DataFrame) -> DataFrame:
    """Cast DecimalType result columns to DOUBLE at the output boundary.

    Aggregates accumulate as DECIMAL internally (exact, order-independent)
    but the driver canonicalizes results via pandas, where
    ``Decimal('221589.00')`` vs the oracle's float64 ``221589.0`` is a
    trailing-zero string mismatch.  Every oracle mirrors this with
    ``CAST(... AS DOUBLE)`` on its decimal aggregates."""
    cols = []
    changed = False
    for f in df.schema.fields:
        if isinstance(f.dataType, T.DecimalType):
            cols.append(F.col(f.name).cast("double").alias(f.name))
            changed = True
        else:
            cols.append(F.col(f.name))
    return df.select(*cols) if changed else df


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        @wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            return canonical_output(fn(spark, sf_dir))

        REGISTRY[name] = QuerySpec(
            name=name, fn=wrapped, oracle=oracle, tags=tags,
            doc=fn.__doc__ or ""
        )
        return fn

    return deco


# The driver records correctness rows for the first 50 registered queries
# only, so registration order is load-bearing.  This window rotates per
# round: round 1 verified the core relational set (indices 0-49 of module
# order); round 3+ should front the (large) remainder that has no driver
# row after rounds 1-2 — rotate _DRIVER_WINDOW at the START of each
# round, never mid-round.  Round 2 fronts everything that got no driver
# row in round 1 —
# all of functions/timestamp/convert, similarity, text, streaming, tpch,
# pipeline — plus the nine queries whose canonicalization fix needs a
# fresh green row.  Queries outside the window keep their local pytest
# oracle gate (strictly stronger: exact multiset equality).
_DRIVER_WINDOW: tuple[str, ...] = (
    # families with no round-1 driver row (39 oracle-bearing)
    "fn_cast",
    "fn_timestamp_extract",
    "fn_timestamp_arith",
    "fn_convert_rules",
    "fn_like_in",
    "fn_json_extract",
    "fn_regex",
    "mm_metadata_stats",
    "events_rollup_hourly",
    "range_join_events",
    "asof_join_events",
    "sample_hash_split",
    "sample_stratified",
    "agg_salted_skew",
    "join_skew_salted",
    "embedding_component_stats",
    "sim_bruteforce_topk",
    "sim_lsh_buckets",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_embedding_neardup",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_stream_join",
    "stream_stateful_sessionize",
    "text_token_stats",
    "text_quality",
    "text_langid",
    "text_fingerprints",
    "text_vocab_topk",
    "text_edit_distance",
    "agg_percentiles_exact",
    "tpch_order_priority",
    "tpch_cust_distribution",
    "tpch_top_supplier",
    "tpch_brand_supplier_count",
    "tpch_large_orders",
    "tpch_cheapest_lineitem",
    # round-1 red rows flipped by the DOUBLE/array canonicalization fix
    "pricing_summary",
    "group_having",
    "group_by_expr",
    "join_inner_agg",
    "cte_chained",
    "window_running_lag",
    "cube_status_priority",
    "window_ntile_quartiles",
    "agg_collect_sorted",
    # new round-2 operators that deserve a driver row (the core set was
    # driver-green in round 1; scan_project_filter's slot goes to the
    # KMeans-IVF variant)
    "sim_ann_ivf_kmeans",
    "dedup_cluster_components",
)


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (side effect: fills REGISTRY) and return
    them with the driver-checked window fronted (see _DRIVER_WINDOW)."""
    from multisql_spark.queries import (  # noqa: F401
        analytics_q,
        core,
        dedup_q,
        engine_q,
        functions_q,
        mm_q,
        pipeline_q,
        similarity_q,
        streaming_q,
        text_q,
        tpch_q,
    )

    ordered: dict[str, QuerySpec] = {}
    for name in _DRIVER_WINDOW:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    # Past the explicit window, front queries that have never had a
    # driver correctness row (round 1 checked exactly the 50 names in
    # _ROUND1_CHECKED): under ANY driver cap this maximizes the number
    # of first-time driver rows per round.
    for name, spec in REGISTRY.items():
        if name not in ordered and name not in _ROUND1_CHECKED:
            ordered[name] = spec
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


# The 50 queries that received a CORRECTNESS_r01 driver row (41 green +
# 9 canonicalization-red now fixed); kept verbatim so window rotation can
# always deprioritize already-checked names.
_ROUND1_CHECKED: frozenset[str] = frozenset({
    "scan_project_filter", "filter_arithmetic", "projection_case_between",
    "pricing_summary", "agg_global", "group_having", "group_by_expr",
    "distinct_rows", "join_inner_agg", "join_left_outer",
    "join_right_outer", "join_full_outer", "join_cross", "join_theta",
    "join_multi_revenue", "join_semi_anti", "order_limit_offset",
    "order_nulls_placement", "set_union_distinct", "set_union_all",
    "set_except", "set_except_all", "set_intersect", "set_intersect_all",
    "values_inline", "cte_chained", "subquery_scalar_in",
    "window_topk_per_group", "window_running_lag", "rollup_region_nation",
    "pivot_status_by_year", "cube_status_priority", "grouping_sets_mixed",
    "window_ntile_quartiles", "agg_collect_sorted", "dedup_exact",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
    "dml_insert_values_select", "dml_update_where", "dml_delete_where",
    "dml_auto_increment", "session_variables", "view_over_join",
    "multi_database_join", "fn_string", "fn_concat_null_propagation",
    "fn_math", "fn_conditional",
})
