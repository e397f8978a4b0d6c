"""Deterministic, cross-engine-exact sketches.

The HLL here differs from Spark's own ``approx_count_distinct`` (HLL++,
engine-private register layout → only rows-only checkable) in that every
step is pinned to public md5 arithmetic, so a DuckDB oracle reproduces
the ESTIMATE bit-for-bit:

- rho (leading-zero rank) comes from hex-string inspection, never float
  ``log2`` whose ulp behavior is engine-specific;
- the harmonic denominator Σ 2^(-rho) is summed in fixed point — each
  term as the integer ``2^(61-rho)`` in DECIMAL(38,0) — so partial
  aggregation order cannot perturb the sum; the single cast to DOUBLE
  happens once, on the same integer, in every engine.

Register algebra: registers merge by MAX, which is associative,
commutative, AND idempotent — so the streaming sink needs no
applied-batch ledger (redelivered batches re-MAX to the same state),
unlike the additive CMS cells.  Reference parity: the reference has no
sketch operators (its COUNT DISTINCT is exact); beyond-reference scale
family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M = 4096  # registers (p = 12)
TWO61 = float(2**61)  # 2^61 exactly, as a double
ALPHA_M2 = (0.7213 / (1.0 + 1.079 / float(M))) * float(M) * float(M)


def hll_registers(
    df: DataFrame,
    col: str,
    label: str | None = None,
    group_col: str | None = None,
) -> DataFrame:
    """(col_name, bucket, rho) registers for one column: bucket = first
    12 md5 bits, rho = leading-zero count of the next 60 bits + 1.
    Shuffles at most m=4096 rows per column at ANY input size (MAX
    combines map-side).

    With ``group_col``, registers are kept PER GROUP (col_name takes the
    group value) — m rows per group, the GROUP BY sketch shape for
    distinct-count dashboards."""
    hx = F.md5(F.col(col).cast("string"))
    stripped = F.regexp_replace(F.substring(hx, 4, 15), "^0*", "")
    first = F.substring(stripped, 1, 1)
    extra = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = F.when(stripped == "", 61).otherwise(
        (15 - F.length(stripped)) * 4 + extra + 1
    )
    name = (
        F.col(group_col).cast("string")
        if group_col is not None
        else F.lit(label or col)
    )
    return (
        df.select(
            name.alias("col_name"),
            F.conv(F.substring(hx, 1, 3), 16, 10).cast("int").alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("col_name", "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*register_dfs: DataFrame) -> DataFrame:
    """MAX-merge register sets — the idempotent monoid that makes the
    sketch incrementally maintainable without redelivery bookkeeping."""
    out = register_dfs[0]
    for r in register_dfs[1:]:
        out = out.unionByName(r)
    return out.groupBy("col_name", "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """Per col_name: (buckets_used, hll_estimate) via the fixed-point
    harmonic sum + linear-counting small-range correction."""
    s = registers.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), 61 - rho) AS DECIMAL(38,0))"
            )
        ).alias("sum_present"),
    )
    denom = F.col("sum_present").cast("double") + (
        (M - F.col("present")).cast("double") * F.lit(TWO61)
    )
    raw = F.lit(ALPHA_M2) * F.lit(TWO61) / denom
    empty = (M - F.col("present")).cast("bigint")
    est = F.round(
        F.when(
            (raw <= F.lit(2.5 * float(M))) & (empty > 0),
            F.lit(float(M)) * F.log(F.lit(float(M)) / empty.cast("double")),
        ).otherwise(raw),
        4,
    )
    return s.select(
        "col_name",
        F.col("present").cast("bigint").alias("buckets_used"),
        est.alias("hll_estimate"),
    )
