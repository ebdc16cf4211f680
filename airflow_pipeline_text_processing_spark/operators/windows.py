"""Scale-safe global-order window helpers.

``Window.orderBy(...)`` with no ``partitionBy`` moves the ENTIRE input to a
single partition (Spark even warns: "No Partition Defined for Window
operation").  That is the one plan shape guaranteed to die at 100 TB.  The
helpers here express the same semantics as a two-level computation:

1. ``repartitionByRange`` on the total order -- partition i holds a
   contiguous, ordered slice, partitions ascend with the order;
2. a per-partition window (parallel across partitions) for the local
   running value;
3. a tiny per-partition-totals aggregate (one row per partition, i.e.
   O(parallelism) rows, not O(data)) whose prefix sums become additive
   offsets, broadcast-joined back.

Because both branches hang off the same range exchange, Spark materializes
the shuffle once and reuses it (ReusedExchange) -- the input is scanned a
single time.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def ordered_running_sum(
    df: DataFrame,
    order_by: Sequence[Column],
    value_col: str,
    out_col: str = "running_sum",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Running total of ``value_col`` over a TOTAL order, scale-safe.

    ``order_by`` must be a total order (break ties with a unique key):
    range partitioning splits the data on exactly those expressions, and a
    tie straddling a partition boundary would make the split ambiguous.
    Result is identical to
    ``F.sum(value_col).over(Window.orderBy(*order_by))`` -- the naive
    single-partition form -- for any partition count.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *order_by).withColumn(
        "_pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("_pid").orderBy(*order_by)
    local = parted.withColumn("_local", F.sum(F.col(value_col)).over(local_w))
    # one row per partition; the unpartitioned window below is over
    # O(parallelism) rows, which is scale-independent
    totals = parted.groupBy("_pid").agg(F.sum(F.col(value_col)).alias("_ptotal"))
    off_w = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_ptotal").over(off_w), F.lit(0))
    ).select("_pid", "_offset")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_local") + F.col("_offset"))
        .drop("_pid", "_local", "_offset")
    )


def concurrency_peaks(
    events: DataFrame,
    ts_col: str = "ts",
    id_col: str = "event_id",
    span_minutes: int = 10,
) -> DataFrame:
    """Sweep-line interval concurrency: each event opens a
    ``span_minutes`` interval; the concurrency level is the running sum
    of +1/-1 boundary deltas over the global (pt, delta, id) order, and
    the per-day peak is the max level at any boundary in the day --
    including the level carried in from the previous day's last
    boundary.  Output: ``day, peak_concurrency, n_starts``.

    Ties at an instant order ends (-1) before starts (+1), so touching
    intervals never count as concurrent.  The global running sum runs
    through :func:`ordered_running_sum` (range-partitioned two-level
    prefix sum), NOT a single-partition window; the day-level carry
    relation is days-sized.
    """
    starts = events.select(
        F.col(ts_col).alias("pt"), F.lit(1).alias("delta"),
        F.col(id_col).alias("bid"),
    )
    ends = events.select(
        (F.col(ts_col) + F.expr(f"INTERVAL {span_minutes} MINUTES")).alias("pt"),
        F.lit(-1).alias("delta"),
        F.col(id_col).alias("bid"),
    )
    pts = starts.unionByName(ends)
    run = ordered_running_sum(
        pts, [F.col("pt"), F.col("delta"), F.col("bid")], "delta", "conc"
    )
    daily = run.groupBy(F.to_date("pt").alias("day")).agg(
        F.max("conc").cast("long").alias("in_day_max"),
        # conc at the day's LAST boundary = level carried into the next
        # day (struct max: pt/delta/bid form a unique total order)
        F.max(F.struct("pt", "delta", "bid", "conc"))["conc"]
        .cast("long")
        .alias("day_last"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_starts"),
    )
    w = Window.orderBy("day")  # days-sized relation, never raw events
    return daily.select(
        "day",
        F.greatest(
            F.col("in_day_max"),
            F.coalesce(F.lag("day_last").over(w), F.lit(0)),
        ).alias("peak_concurrency"),
        "n_starts",
    )
