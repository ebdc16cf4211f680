"""Distinct-count sketches for 100 TB-scale analytics.

``COUNT(DISTINCT x)`` at scale forces a full shuffle of every distinct
value.  Sketches bound the per-group state to ``k`` values and merge
associatively, which is what makes planet-scale distinct counting feasible
(cf. the KMV / theta-sketch family: Bar-Yossef et al. 2002, "Counting
distinct elements in a data stream"; Apache DataSketches).

Spark ships HLL++ (``approx_count_distinct``), but its binary registers are
not reproducible against any other engine, so it can't be oracle-checked.
This module implements the **K-Minimum-Values** estimator from engine-
portable primitives instead: md5 maps values to (effectively) uniform
hashes, the k smallest distinct hashes per group are an order statistic --
identical in any engine -- and the estimator ``(k-1) / h_(k)`` (with the
k-th smallest hash normalized to (0,1)) is one IEEE division on exactly
representable operands, so Spark and DuckDB agree bit-for-bit.

Why the hash truncates to 13 hex digits: 13 nibbles = 52 bits, below
ieee754's 53-bit mantissa, so the integer -> double cast is EXACT and no
engine-specific rounding can creep in.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

HEX13_SCALE = float(1 << 52)  # hashes normalize against 16^13 = 2^52


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """Per-group K-Minimum-Values distinct-count estimate.

    Returns ``(group_col, n_in_sketch, kth_hash, kmv_estimate)`` where the
    estimate is exact (= ``n_in_sketch``) whenever a group holds fewer than
    ``k`` distinct values, and ``(k-1) / normalized(h_(k))`` otherwise.

    Plan shape: one distinct-aggregation shuffle on (group, hash) -- the
    same shuffle an exact COUNT(DISTINCT) needs -- then a per-group top-k
    window over hashes.  The window sorts only *distinct hashes already
    co-partitioned by group*, and its output state is k rows per group.
    On a stream or across partitioned corpora the sketch merges by
    unioning hash sets and re-taking the k minima (associative +
    commutative), which is the property that makes it a sketch; expressing
    the merge as a bounded-state partial aggregate (a custom UDAF) rather
    than a window is the remaining JVM-side refinement.
    """
    h = (
        df.select(
            F.col(group_col), F.md5(F.col(value_col).cast("string")).alias("h")
        )
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("h")
    sk = (
        h.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_in_sketch"),
            F.max("h").alias("kth_hash"),
        )
    )
    # first 13 hex digits -> exact 52-bit integer -> exact double
    kth_int = F.conv(F.substring("kth_hash", 1, 13), 16, 10).cast("long")
    estimate = F.when(
        F.col("n_in_sketch") < k, F.col("n_in_sketch").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(HEX13_SCALE) / kth_int.cast("double")
    )
    return sk.select(
        group_col,
        "n_in_sketch",
        F.substring("kth_hash", 1, 13).alias("kth_hash"),
        estimate.alias("kmv_estimate"),
    )


def sql_kmv_estimate(k: int, kth_hash_expr: str = "kth_hash") -> str:
    """The DuckDB mirror of the estimator arithmetic: digit-wise hex
    decode (pure BIGINT literals, no float intermediates) and the same
    single IEEE division."""
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr({kth_hash_expr}, {i}, 1)) - 1) "
        f"* {16 ** (13 - i)}"
        for i in range(1, 14)
    )
    # bare numeric literals parse as DECIMAL in DuckDB (whose multiply
    # overflows at this magnitude); explicit DOUBLE casts force the same
    # ieee754 arithmetic Spark performs
    return (
        f"CAST({k - 1} AS DOUBLE) * CAST({1 << 52} AS DOUBLE)"
        f" / CAST(({digits}) AS DOUBLE)"
    )
