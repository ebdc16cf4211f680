"""Extension query surface: streaming-as-batch-checkable runs, pivot/cube,
window frames, correlated SQL, CSV source round-trip, salted join, exact
percentiles.

Everything here follows the same contract as ``queries.py``: a named
DataFrame plan plus an ANSI-SQL DuckDB oracle, deterministic down to the
value hash (money canonicalized to integer cents; every computed column
aliased identically in both formulations).

The two ``stream_*`` entries are REAL Structured Streaming executions
(``readStream`` -> transformation -> memory sink, ``availableNow`` trigger)
whose final results are batch-comparable -- promoting the streaming surface
(SURVEY.md §2 Part B "streaming", ops 45 family) into the driver's
correctness scoreboard instead of pytest-only coverage.
"""

from __future__ import annotations

import itertools
import tempfile
import threading
from typing import Callable, Dict, Optional, Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .queries import _cents, _money_sum, _sql_money_sum, _t, _tspread

_MEM_SEQ = itertools.count()
_DRAIN_LOCK = threading.Lock()


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a STREAMING DataFrame with a proper event-time
    ``ts`` column (same nanos handling as the batch ``_t`` path)."""
    import os

    batch = _t(spark, sf_dir, "events")  # sets the nanos conf, resolves schema
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file streaming source requires a DIRECTORY; expose the single
    # parquet file through a temp dir symlink (testdata is read-only)
    stream_dir = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(
        f"{sf_dir}/events.parquet", os.path.join(stream_dir, "events.parquet")
    )
    stream = spark.readStream.schema(raw_schema).parquet(stream_dir)
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _ = batch  # only needed for the conf side effect / schema parity
    return stream


def _run_to_memory(
    result: DataFrame,
    output_mode: str,
    name_prefix: str,
    shuffle_partitions: int = 8,
) -> Tuple[str, object]:
    """Run a streaming DataFrame to a memory sink with availableNow; returns
    (table_name, query) after termination.

    A stateful stream creates one state store per shuffle partition and the
    count is PINNED into the checkpoint at first start -- so it is a
    deliberate per-stream choice, not session spillover.  These one-shot
    oracle drains carry tiny state; 8 stores instead of 32 halves their
    fixed overhead (measured).  A production stream sizes this to its
    target parallelism before the first start instead.

    The override is session-global while the drain runs, so drains are
    serialized under a module lock: a concurrent BATCH query started on
    the same session during a drain would otherwise silently plan with 8
    shuffle partitions.  (Spark reads the value once at stream start;
    there is no per-query knob for it.)
    """
    spark = result.sparkSession
    with _DRAIN_LOCK:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        try:
            name = f"{name_prefix}_{next(_MEM_SEQ)}"
            q = (
                result.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .option(
                    "checkpointLocation",
                    tempfile.mkdtemp(prefix=f"ckpt_{name_prefix}_"),
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return name, q


def stream_hourly_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation executed AS A STREAM
    (streaming/windows.py::watermarked_hourly_counts): readStream over the
    events parquet, 1-hour event-time windows with a 2-hour watermark,
    complete-mode memory sink.  With availableNow the stream drains in one
    pass, so the final table equals the batch formulation -- which is
    exactly what the oracle asserts."""
    from ..streaming.windows import watermarked_hourly_counts

    ev = _events_stream(spark, sf_dir)
    name, _q = _run_to_memory(
        watermarked_hourly_counts(ev), "complete", "hourly_wm"
    )
    return spark.table(name).orderBy("window_start", "event_type")


STREAM_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR("value"*100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
"""


def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator executed for real
    (streaming/windows.py): running per-user totals, update-mode memory
    sink.  availableNow drains the source in one micro-batch, so the
    emitted rows are the final state per user -- batch-checkable against
    a plain GROUP BY.

    Uses the Spark 4 ``transformWithStateInPandas`` port
    (``stateful_user_totals_v2``) when the interpreter has protobuf (the
    new API's state-server protocol needs it; any real Spark cluster
    ships it), else the legacy ``applyInPandasWithState`` form -- both
    are asserted against the same batch ground truth in pytest, so the
    oracle contract is identical either way."""
    from ..streaming.windows import (
        HAS_TWS_PROTOBUF,
        stateful_user_totals,
        stateful_user_totals_v2,
    )

    op = stateful_user_totals_v2 if HAS_TWS_PROTOBUF else stateful_user_totals
    ev = _events_stream(spark, sf_dir)
    name, _q = _run_to_memory(op(ev), "update", "user_totals")
    return spark.table(name).orderBy("user_id")


STREAM_TOTALS_SQL = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR("value"*100) AS BIGINT)) AS BIGINT) / 100.0
         AS total_value,
       arg_max(event_type, ts) AS last_event_type
FROM events
GROUP BY user_id
ORDER BY user_id
"""


_PSI_VALUE_BUCKETS = 64


def stream_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PSI drift monitor in its PRODUCTION shape (r11): bucket
    counts accumulate IN A STREAM -- readStream over the events
    parquet, per-(event_type, value-cents-bucket) counts as a
    complete-mode streaming aggregation drained with availableNow --
    and the drained counts feed the same exact fixed-point PSI scoring
    as the batch operator (queries_scale._psi_from_counts).  This is
    how drift monitoring actually deploys: the heavy counting keeps
    running state on the stream, the metadata-sized scoring runs
    between micro-batch windows.  With availableNow the drained counts
    equal the batch GROUP BY, so the oracle certifies the full
    stream->score composition."""
    from .queries_scale import _psi_from_counts

    ev = _events_stream(spark, sf_dir)
    counts = ev.groupBy(
        "event_type",
        F.pmod(
            F.floor(F.col("value") * 100).cast("long"),
            F.lit(_PSI_VALUE_BUCKETS),
        ).alias("b"),
    ).count()
    name, _q = _run_to_memory(counts, "complete", "psi_counts")
    # rebase the drained counts onto a fresh local relation: the PSI
    # scoring self-joins sb against its own aggregates, and MemoryPlan
    # leaves conflicting attribute ids the analyzer refuses to dedup
    # ("Conflicting attributes: b").  The relation is bounded at
    # event-types x value buckets -- metadata-sized by construction.
    drained = spark.table(name).select(
        "event_type", "b", F.col("count").alias("c_sb")
    )
    sb = spark.createDataFrame(
        drained.collect(), "event_type string, b long, c_sb long"
    )
    return _psi_from_counts(sb, "event_type", count_name="n_events")


def _stream_psi_sql() -> str:
    from .queries_scale import _psi_sql_from_sb

    sb = f"""sb AS (
  SELECT event_type,
         ((CAST(FLOOR("value"*100) AS BIGINT) % {_PSI_VALUE_BUCKETS})
           + {_PSI_VALUE_BUCKETS}) % {_PSI_VALUE_BUCKETS} AS b,
         CAST(COUNT(*) AS BIGINT) AS c_sb
  FROM events GROUP BY 1, 2)"""
    return _psi_sql_from_sb(sb, "event_type", count_name="n_events")


def stream_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUSUM drift chart in its PRODUCTION shape (r12, the same
    composition as stream_psi_drift): per-(event_type, day) revenue
    accumulates as a complete-mode STREAMING aggregation (readStream
    over the events parquet, availableNow drain), and the drained
    daily relation feeds the identical exact integer scoring epilogue
    as the batch query (_cusum_from_daily).  The heavy counting keeps
    running state on the stream; the days-sized scoring runs between
    micro-batch windows.  With availableNow the drained dailies equal
    the batch GROUP BY, so the oracle certifies the full
    stream->score composition."""
    ev = _events_stream(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.expr("CAST(FLOOR(value * 100) AS BIGINT)")).alias("y")
    )
    name, _q = _run_to_memory(daily, "complete", "cusum_daily")
    drained = spark.table(name).select("event_type", "day", "y")
    # rebase onto a fresh local relation (same MemoryPlan attribute-id
    # dedup issue as stream_psi_drift); days x types -- metadata-sized
    local = spark.createDataFrame(
        drained.collect(), "event_type string, day date, y long"
    )
    return _cusum_from_daily(local)


# ---------------------------------------------------------------- pivot/cube

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def pivot_segment_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (crosstab): order counts per year x market segment.  Explicit
    pivot values keep the column set deterministic (and skip the extra
    distinct-scan Spark otherwise runs to discover them)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .withColumn("order_year", F.year("o_orderdate"))
        .groupBy("order_year")
        .pivot("c_mktsegment", _SEGMENTS)
        .count()
        .na.fill(0, _SEGMENTS)
        .orderBy("order_year")
    )


PIVOT_SQL = f"""
SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS order_year,
       {", ".join(
           f"COUNT(*) FILTER (WHERE c.c_mktsegment = '{s}') AS {s}"
           for s in _SEGMENTS
       )}
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
ORDER BY order_year
"""


def agg_cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (priority, status): all 4 grouping combinations in one
    pass (Part B grouping-sets surface; rollup already covered)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            _money_sum(F.col("o_totalprice"), "total_price"),
        )
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


CUBE_SQL = f"""
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       {_sql_money_sum('o_totalprice', 'total_price')}
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
"""


# ------------------------------------------------------------- window frames


def window_frames_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-function surface in one query: lag/lead, rank/percent_rank,
    ntile, and a RANGE frame (trailing 30 days by event time) -- the frame
    types Part B's window row lists beyond plain running sums."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        _cents(F.col("o_totalprice")).alias("price_cents"),
    )
    by_cust = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # RANGE frame needs a numeric order: integer DAY number (datediff from a
    # fixed epoch), not epoch seconds -- under a DST-observing session
    # timezone two dates 30 calendar days apart can differ by +-3600 s,
    # which would diverge from the oracle's INTERVAL 30 DAY.  Day arithmetic
    # is timezone-independent.
    range_w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-30, 0)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            "price_cents",
            F.lag("price_cents").over(by_cust).alias("prev_cents"),
            F.lead("price_cents").over(by_cust).alias("next_cents"),
            F.rank().over(by_cust).alias("rnk"),
            F.percent_rank().over(by_cust).alias("pct_rank"),
            F.ntile(4).over(by_cust).alias("quartile"),
            F.sum("price_cents").over(range_w).alias("cents_30d"),
        )
    )  # no trailing sort: driver hash + local gate are order-insensitive


FRAMES_SQL = """
SELECT o_orderkey, o_custkey, price_cents,
       LAG(price_cents) OVER w AS prev_cents,
       LEAD(price_cents) OVER w AS next_cents,
       RANK() OVER w AS rnk,
       PERCENT_RANK() OVER w AS pct_rank,
       NTILE(4) OVER w AS quartile,
       CAST(SUM(price_cents) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cents_30d
FROM (
  SELECT o_orderkey, o_custkey, o_orderdate,
         CAST(FLOOR(o_totalprice*100) AS BIGINT) AS price_cents
  FROM orders
)
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, rnk, o_orderkey
"""


# ---------------------------------------------------- correlated SQL surface


def sql_correlated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-entrypoint query (spark.sql over temp views) with a correlated
    scalar subquery AND a correlated EXISTS -- decorrelated by Catalyst into
    joins (the engine's SQL surface, not just the DataFrame API).  The
    average is taken over exact cents so the predicate threshold is
    bit-identical in both engines."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey,
               CAST(FLOOR(o.o_totalprice*100) AS BIGINT) AS price_cents
        FROM orders_v o
        WHERE CAST(FLOOR(o.o_totalprice*100) AS BIGINT) >
              (SELECT AVG(CAST(FLOOR(o2.o_totalprice*100) AS BIGINT))
               FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
          AND EXISTS (SELECT 1 FROM customer_v c
                      WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 0)
        """
    )  # no trailing sort: driver hash + local gate are order-insensitive


CORRELATED_SQL = """
SELECT o.o_orderkey, o.o_custkey,
       CAST(FLOOR(o.o_totalprice*100) AS BIGINT) AS price_cents
FROM orders o
WHERE CAST(FLOOR(o.o_totalprice*100) AS BIGINT) >
      (SELECT AVG(CAST(FLOOR(o2.o_totalprice*100) AS BIGINT))
       FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
  AND EXISTS (SELECT 1 FROM customer c
              WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 0)
ORDER BY o.o_orderkey
"""


# ----------------------------------------------------------- csv round trip


def csv_roundtrip_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink surface: write nation out as CSV, read it back with
    an explicit schema, broadcast-join region, aggregate.  Values are
    integers/strings only, so the text round trip is lossless and the
    oracle (over the original parquet) must agree exactly."""
    import hashlib
    import os

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out = os.path.join(tempfile.gettempdir(), f"nation_csv_{tag}")
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    nation.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(
        "n_nationkey long, n_name string, n_regionkey long"
    ).option("header", True).csv(out)
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        back.join(F.broadcast(region), back.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_nations"),
            F.min("n_name").alias("first_nation"),
        )
        .orderBy("r_name")
    )


CSV_ROUNDTRIP_SQL = """
SELECT r.r_name, COUNT(*) AS n_nations, MIN(n.n_name) AS first_nation
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
"""


def orc_xml_roundtrip_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC + XML source/sink surface (sources/tabular.py): the part table
    lands as ORC (Spark's second schema-carrying columnar built-in) and a
    projection lands as rowTag-framed XML (built-in since Spark 4, read
    back under an explicit schema -- inference would re-scan and can
    widen types); the two round-tripped relations join on the part key
    and aggregate per brand.  Integer/string columns only, so both
    round trips are lossless and the oracle over the original parquet
    agrees exactly."""
    import hashlib
    import os

    from ..sources.tabular import read_table, write_table

    # stable per-sf_dir location (overwritten each call), not
    # mkdtemp-per-call: repeated harness runs don't orphan directories
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"part_orc_xml_{tag}")
    part = _t(spark, sf_dir, "part")
    write_table(
        part.select("p_partkey", "p_brand", "p_size"),
        f"{base}/orc",
        format="orc",
    )
    write_table(
        part.select("p_partkey", "p_type"),
        f"{base}/xml",
        format="xml",
        rowTag="part",
    )
    orc_back = read_table(spark, f"{base}/orc", format="orc")
    xml_back = read_table(
        spark,
        f"{base}/xml",
        format="xml",
        schema="p_partkey long, p_type string",  # type: ignore[arg-type]
        rowTag="part",
    )
    return (
        orc_back.join(xml_back, "p_partkey")
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum(F.col("p_size").cast("long")).alias("total_size"),
            F.count_distinct("p_type").alias("n_types"),
        )
        .orderBy("p_brand")
    )


ORC_XML_SQL = """
SELECT p_brand, COUNT(*) AS n_parts,
       CAST(SUM(p_size) AS BIGINT) AS total_size,
       COUNT(DISTINCT p_type) AS n_types
FROM part
GROUP BY p_brand
ORDER BY p_brand
"""


# -------------------------------------------------------------- salted join


def join_salted_lineitem_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted equi-join (operators/skew.py::salted_join): lineitem
    (fact) x supplier (dim replicated across salts), then aggregate.  The
    oracle is the plain join -- salting is a pure plan rewrite."""
    from ..operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_quantity", _cents(F.col("l_extendedprice")).alias("cents")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    joined = salted_join(
        li.withColumnRenamed("l_suppkey", "s_suppkey"),
        supp,
        ["s_suppkey"],
        num_salts=16,
    )
    return (
        joined.groupBy("s_name")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
            (F.sum("cents").cast("double") / 100.0).alias("total_price"),
        )
        .orderBy("s_name")
    )


SALTED_JOIN_SQL = """
SELECT s.s_name,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0
         AS total_price
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_name
ORDER BY s.s_name
"""


# --------------------------------------------------------------- percentiles


def percentile_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) percentiles per group -- order statistics over
    integer cents, so the linear interpolation is bit-identical across
    engines (no float-sum ordering anywhere)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", _cents(F.col("value")).alias("cents")
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.percentile(F.col("cents"), F.lit(0.25)).alias("p25_cents"),
            F.percentile(F.col("cents"), F.lit(0.5)).alias("p50_cents"),
            F.percentile(F.col("cents"), F.lit(0.75)).alias("p75_cents"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


PERCENTILE_SQL = """
SELECT event_type,
       quantile_cont(CAST(FLOOR("value"*100) AS BIGINT), 0.25) AS p25_cents,
       quantile_cont(CAST(FLOOR("value"*100) AS BIGINT), 0.5)  AS p50_cents,
       quantile_cont(CAST(FLOOR("value"*100) AS BIGINT), 0.75) AS p75_cents,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def join_full_outer_year_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (completes the join-type surface: inner/semi/anti/
    left are covered elsewhere): per-customer order counts of two years,
    keeping customers active in either year, with null-safe coalesced
    output."""
    orders = _t(spark, sf_dir, "orders")

    def year_counts(year: int, alias: str) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == year)
            .groupBy(F.col("o_custkey").alias("custkey"))
            .agg(F.count("*").alias(alias))
        )

    a = year_counts(1996, "n_1996")
    b = year_counts(1997, "n_1997")
    return (
        a.join(b, "custkey", "full_outer")
        .select(
            "custkey",
            F.coalesce("n_1996", F.lit(0)).alias("n_1996"),
            F.coalesce("n_1997", F.lit(0)).alias("n_1997"),
            (F.coalesce("n_1996", F.lit(0)) + F.coalesce("n_1997", F.lit(0))).alias(
                "n_both"
            ),
        )
        .orderBy("custkey")
    )


FULL_OUTER_SQL = """
WITH a AS (
  SELECT o_custkey AS custkey, COUNT(*) AS n_1996 FROM orders
  WHERE EXTRACT(year FROM o_orderdate) = 1996 GROUP BY 1
), b AS (
  SELECT o_custkey AS custkey, COUNT(*) AS n_1997 FROM orders
  WHERE EXTRACT(year FROM o_orderdate) = 1997 GROUP BY 1
)
SELECT COALESCE(a.custkey, b.custkey) AS custkey,
       COALESCE(n_1996, 0) AS n_1996,
       COALESCE(n_1997, 0) AS n_1997,
       COALESCE(n_1996, 0) + COALESCE(n_1997, 0) AS n_both
FROM a FULL OUTER JOIN b ON a.custkey = b.custkey
ORDER BY custkey
"""


def array_scalar_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/regexp/null-handling scalar breadth over the embeddings table:
    element access, slicing, size, fixed-point array reductions (min/max of
    floored milli-units -- exact, order-free), zip_with pairing, plus
    coalesce/nullif.  Complements the string/date scalar showcases."""
    vecs = _tspread(spark, sf_dir, "embeddings")
    milli = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("long")
    )
    return vecs.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at(milli, 1).alias("first_milli"),
        F.element_at(milli, -1).alias("last_milli"),
        F.array_min(milli).alias("min_milli"),
        F.array_max(milli).alias("max_milli"),
        F.aggregate(
            F.slice(milli, 1, 8), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("head8_sum_milli"),
        F.size(F.filter(milli, lambda x: x > 0)).alias("n_positive"),
        F.aggregate(
            F.zip_with(
                F.slice(milli, 1, 4),
                F.slice(milli, 5, 4),
                lambda a, b: a * b,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("paired_dot_milli"),
        F.coalesce(
            F.nullif(F.element_at(milli, 1), F.lit(0)), F.lit(-1)
        ).alias("first_or_neg1"),
    ).orderBy("vec_id")


ARRAY_SCALAR_SQL = """
WITH m AS (
  SELECT vec_id,
         [CAST(FLOOR(CAST(x AS DOUBLE)*1000) AS BIGINT) FOR x IN embedding]
           AS milli,
         len(embedding) AS dim
  FROM embeddings
)
SELECT vec_id,
       CAST(dim AS INT) AS dim,
       milli[1] AS first_milli,
       milli[-1] AS last_milli,
       list_min(milli) AS min_milli,
       list_max(milli) AS max_milli,
       CAST(list_sum(milli[1:8]) AS BIGINT) AS head8_sum_milli,
       CAST(len(list_filter(milli, x -> x > 0)) AS INT) AS n_positive,
       CAST(list_sum(list_transform(list_zip(milli[1:4], milli[5:8]),
                                    p -> p[1] * p[2])) AS BIGINT)
         AS paired_dot_milli,
       COALESCE(NULLIF(milli[1], 0), -1) AS first_or_neg1
FROM m
ORDER BY vec_id
"""


# ------------------------------------------------ LLM-pipeline round 2


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS, not just pairs: jaccard pairs -> connected
    components (operators/dedup.py::connected_components, iterative
    min-label propagation).  The oracle computes the same transitive
    closure with a recursive CTE."""
    from .queries_llm import _planted_docs
    from ..operators import dedup as D

    pairs = D.jaccard_pairs(
        _planted_docs(spark, sf_dir), threshold=0.6
    ).select("doc_a", "doc_b")
    return D.connected_components(pairs).orderBy("doc_id")


def _clusters_sql() -> str:
    from .queries_llm import SHINGLES_CTE, _planted_sql

    return f"""
WITH RECURSIVE corpus AS ({_planted_sql()}),
{SHINGLES_CTE},
pairs AS (SELECT doc_a, doc_b FROM jaccards WHERE jaccard >= 0.6),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(src, dst) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id, MIN(dst) AS cluster_id
FROM reach GROUP BY src ORDER BY doc_id
"""


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 tf-idf terms (rational idf -- see
    operators/text.py::tfidf_top_terms for why not log)."""
    from ..operators.text import tfidf_top_terms

    return tfidf_top_terms(_tspread(spark, sf_dir, "documents"), k=3)


def _tfidf_sql() -> str:
    from .queries_llm import TOKS_SQL

    return f"""
WITH tok AS (
  SELECT doc_id, UNNEST({TOKS_SQL}) AS token FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dfc AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs_total FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfc.df,
         CAST(tf.tf * n.n_docs_total AS DOUBLE) / dfc.df AS tfidf
  FROM tf JOIN dfc ON tf.token = dfc.token CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, token) AS term_rank
  FROM scored
)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       tfidf, CAST(term_rank AS BIGINT) AS term_rank
FROM ranked WHERE term_rank <= 3
ORDER BY doc_id, term_rank
"""


_SAMPLE_RATES = {"click": 0.25, "purchase": 0.5, "error": 1.0}


def sample_stratified_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based stratified sampling
    (operators/sampling.py): per-event-type keep rates via md5 threshold --
    reproducible across engines/reruns, pure pushdown-able predicate."""
    from ..operators.sampling import stratified_sample

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type")
    return stratified_sample(
        ev, "event_type", _SAMPLE_RATES, F.col("event_id")
    ).orderBy("event_id")


def _sample_sql() -> str:
    from ..operators.sampling import rate_threshold

    cases = " ".join(
        f"WHEN event_type = '{s}' THEN '{rate_threshold(r)}'"
        for s, r in sorted(_SAMPLE_RATES.items())
    )
    return f"""
SELECT event_id, event_type FROM events
WHERE md5(CAST(event_id AS VARCHAR)) <
      (CASE {cases} ELSE '{rate_threshold(0.0)}' END)
ORDER BY event_id
"""


def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window training chunks (50-token windows, stride 40) --
    narrow 1->N fan-out, chunk content fingerprinted by md5."""
    from ..operators.text import token_window_chunks

    return token_window_chunks(_tspread(spark, sf_dir, "documents"), size=50, stride=40)


def _chunk_windows_sql() -> str:
    from .queries_llm import TOKS_SQL

    return f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS tk FROM documents),
starts AS (
  SELECT doc_id, tk,
         UNNEST(generate_series(1, greatest(len(tk), 1), 40)) AS start
  FROM toks
)
SELECT doc_id,
       CAST((start - 1) / 40 AS INT) AS chunk_idx,
       CAST(len(tk[start : start + 49]) AS INT) AS n_chunk_tokens,
       md5(array_to_string(tk[start : start + 49], ' ')) AS chunk_hash
FROM starts
ORDER BY doc_id, chunk_idx
"""


QueryFn = Callable[[SparkSession, str], DataFrame]



# =====================================================================
# Round-2 additions: decontamination, sketches, PII scrub, quantization,
# streaming dedup
# =====================================================================

_TOKS_SQL = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '')"
)


def _sql_shingle_rows(src_cte: str, id_alias: str = "doc_id") -> str:
    """DuckDB rows (id, shingle): distinct word 3-gram shingles of ``text``
    in CTE ``src_cte`` -- the exact mirror of ``dedup.word_shingles(n=3)``."""
    return f"""
  SELECT doc_id AS {id_alias}, UNNEST(list_distinct(
    [array_to_string(tk[i:i+2], ' ')
     FOR i IN generate_series(1, greatest(len(tk) - 2, 1))])) AS shingle
  FROM (SELECT doc_id, {_TOKS_SQL} AS tk FROM {src_cte})
"""


def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing >= 2 distinct
    word 3-gram shingles with any eval-set doc (operators/dedup.py::
    contamination_report -- broadcast eval inverted index, no shuffle of
    the training side).  Fixture: eval = docs 0-39 verbatim; train = docs
    40-199 plus 80%-prefix twins of docs 0-199, so every twin of an eval
    doc is a planted contamination."""
    from ..operators.dedup import contamination_report

    docs = _tspread(spark, sf_dir, "documents").select("doc_id", "text")
    eval_docs = docs.filter(F.col("doc_id") < 40)
    twins = docs.filter(F.col("doc_id") < 200).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr(
            "substring(text, 1, cast(floor(length(text)*0.8) as int))"
        ).alias("text"),
    )
    train = (
        docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 200))
        .unionAll(twins)
    )
    return contamination_report(train, eval_docs, n=3, min_overlap=2)


DECONTAMINATE_SQL = f"""
WITH eval_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 40
),
train AS (
  SELECT doc_id, text FROM documents WHERE doc_id >= 40 AND doc_id < 200
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         substring(text, 1, CAST(FLOOR(LENGTH(text)*0.8) AS INT)) AS text
  FROM documents WHERE doc_id < 200
),
tr_sh AS ({_sql_shingle_rows('train')}),
ev_sh AS ({_sql_shingle_rows('eval_docs', 'eval_id')})
SELECT t.doc_id, e.eval_id, COUNT(*) AS n_shared_shingles
FROM tr_sh t JOIN ev_sh e ON t.shingle = e.shingle
GROUP BY t.doc_id, e.eval_id
HAVING COUNT(*) >= 2
ORDER BY t.doc_id, e.eval_id
"""


KMV_K = 32


def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch (operators/sketches.py) for users per
    event type, joined against the exact COUNT(DISTINCT) so the result
    carries both the estimate and its ground truth."""
    from ..operators.sketches import kmv_distinct

    ev = _t(spark, sf_dir, "events")
    sk = kmv_distinct(ev, "event_type", "user_id", k=KMV_K)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return (
        sk.join(exact, "event_type")
        .select(
            "event_type", "n_exact", "n_in_sketch", "kth_hash", "kmv_estimate"
        )
        .orderBy("event_type")
    )


def _kmv_sql() -> str:
    from ..operators.sketches import sql_kmv_estimate

    return f"""
WITH h AS (
  SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM events
),
rk AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h
),
sk AS (
  SELECT event_type, COUNT(*) AS n_in_sketch,
         substr(MAX(h), 1, 13) AS kth_hash
  FROM rk WHERE rn <= {KMV_K} GROUP BY event_type
),
ex AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
  FROM events GROUP BY event_type
)
SELECT s.event_type, e.n_exact, s.n_in_sketch, s.kth_hash,
       CASE WHEN s.n_in_sketch < {KMV_K} THEN CAST(s.n_in_sketch AS DOUBLE)
            ELSE {sql_kmv_estimate(KMV_K)} END AS kmv_estimate
FROM sk s JOIN ex e ON s.event_type = e.event_type
ORDER BY s.event_type
"""


def sketch_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-operation estimates (operators/sketches.py::kmv_overlap):
    distinct-user union / Jaccard / intersection between the low-value
    click cohort and the low-value purchase cohort, from the two bounded
    sketches alone -- the mergeable-synopsis answer to cross-cohort
    overlap at 100 TB.  k=32 < both cohort cardinalities, so the actual
    estimator arithmetic (not the exact small-set path) is under the
    gate; joined against the exact figures so the row carries its own
    ground truth."""
    from ..operators.sketches import kmv_overlap

    ev = _t(spark, sf_dir, "events")
    a = ev.filter((F.col("event_type") == "click") & (F.col("value") < 30))
    b = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") < 30)
    )
    sk = kmv_overlap(a, b, "user_id", k=KMV_K)
    exact = a.select("user_id").distinct().unionAll(
        b.select("user_id").distinct()
    ).groupBy("user_id").agg(F.count("*").alias("_sides"))
    ex_row = exact.agg(
        F.count("*").alias("n_exact_union"),
        F.sum((F.col("_sides") == 2).cast("long")).alias(
            "n_exact_intersection"
        ),
    )
    return sk.crossJoin(ex_row).select(
        "n_exact_union",
        "n_exact_intersection",
        "n_a_sketch",
        "n_b_sketch",
        "n_union_sketch",
        "union_kth_hash",
        "n_common_in_k",
        "est_distinct_union",
        "est_jaccard",
        "est_distinct_intersection",
    )


def _kmv_overlap_sql() -> str:
    from ..operators.sketches import sql_kmv_estimate

    est = sql_kmv_estimate(KMV_K, "union_kth_hash")
    return f"""
WITH a AS (
  SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h FROM events
  WHERE event_type = 'click' AND "value" < 30
),
b AS (
  SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h FROM events
  WHERE event_type = 'purchase' AND "value" < 30
),
sa AS (SELECT h FROM a ORDER BY h LIMIT {KMV_K}),
sb AS (SELECT h FROM b ORDER BY h LIMIT {KMV_K}),
pooled AS (
  SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
  ORDER BY h LIMIT {KMV_K}
),
marks AS (
  SELECT p.h,
         CASE WHEN p.h IN (SELECT h FROM sa)
               AND p.h IN (SELECT h FROM sb) THEN 1 ELSE 0 END AS common
  FROM pooled p
),
cnt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_union_sketch,
         substr(MAX(h), 1, 13) AS union_kth_hash,
         CAST(SUM(common) AS BIGINT) AS n_common_in_k
  FROM marks
),
sides AS (
  SELECT CAST((SELECT COUNT(*) FROM sa) AS BIGINT) AS n_a_sketch,
         CAST((SELECT COUNT(*) FROM sb) AS BIGINT) AS n_b_sketch
),
ex AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_union,
         CAST(SUM(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_exact_intersection
  FROM (
    SELECT user_id, COUNT(*) AS sides FROM (
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'click' AND "value" < 30
      UNION ALL
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase' AND "value" < 30
    ) GROUP BY user_id
  )
)
SELECT ex.n_exact_union, ex.n_exact_intersection,
       sides.n_a_sketch, sides.n_b_sketch,
       cnt.n_union_sketch, cnt.union_kth_hash, cnt.n_common_in_k,
       CASE WHEN cnt.n_union_sketch < {KMV_K}
            THEN CAST(cnt.n_union_sketch AS DOUBLE)
            ELSE {est} END AS est_distinct_union,
       CAST(cnt.n_common_in_k AS DOUBLE) / CAST(cnt.n_union_sketch AS DOUBLE)
         AS est_jaccard,
       (CASE WHEN cnt.n_union_sketch < {KMV_K}
             THEN CAST(cnt.n_union_sketch AS DOUBLE)
             ELSE {est} END)
         * (CAST(cnt.n_common_in_k AS DOUBLE)
            / CAST(cnt.n_union_sketch AS DOUBLE))
         AS est_distinct_intersection
FROM cnt, sides, ex
"""


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (operators/text.py::pii_scrub) over a corpus with
    deterministically planted emails / phone numbers / IPv4s -- counts and
    the scrubbed-content hash per document."""
    from ..operators.text import pii_scrub

    docs = _tspread(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" reach user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 4 == 1, F.lit(" call 555-867-5309")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 2,
                F.concat(
                    F.lit(" from 192.168."),
                    (F.col("doc_id") % 250).cast("string"),
                    F.lit(".42"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_scrub(planted).orderBy("doc_id")


def _pii_sql() -> str:
    from ..operators.text import PII_EMAIL, PII_IPV4, PII_PHONE

    return f"""
WITH planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 4 = 1 THEN ' call 555-867-5309' ELSE '' END
         || CASE WHEN doc_id % 5 = 2
                 THEN ' from 192.168.' || CAST(doc_id % 250 AS VARCHAR) || '.42'
                 ELSE '' END AS text
  FROM documents WHERE doc_id < 150
),
scrubbed AS (
  SELECT doc_id, text,
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
             '{PII_PHONE}', '<PHONE>', 'g'),
           '{PII_IPV4}', '<IP>', 'g') AS stext
  FROM planted
)
SELECT doc_id,
       len(regexp_extract_all(text, '{PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(text, '{PII_PHONE}')) AS n_phones,
       len(regexp_extract_all(text, '{PII_IPV4}')) AS n_ips,
       LENGTH(stext) AS scrubbed_len,
       md5(stext) AS scrubbed_hash
FROM scrubbed
ORDER BY doc_id
"""


def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization of the embedding corpus
    (operators/similarity.py::quantize_int8): scale params, a hash of the
    code array, and the fixed-point reconstruction-error sum."""
    from ..operators.similarity import quantize_int8

    vecs = _tspread(spark, sf_dir, "embeddings")
    return quantize_int8(vecs).orderBy("vec_id")


QUANTIZE_SQL = """
WITH q AS (
  SELECT vec_id,
         CAST(list_min(embedding) AS DOUBLE) AS qmin,
         CAST(list_max(embedding) AS DOUBLE) AS qmax,
         embedding
  FROM embeddings
),
c AS (
  SELECT vec_id, qmin, qmax, embedding,
         CASE WHEN qmax - qmin = 0
              THEN list_transform(embedding, x -> 0)
              ELSE list_transform(embedding, x ->
                     CAST(LEAST(FLOOR((CAST(x AS DOUBLE) - qmin)
                                      / (qmax - qmin) * 255.0),
                                255.0) AS INT))
         END AS codes
  FROM q
)
SELECT vec_id, qmin, qmax,
       md5(array_to_string(codes, ',')) AS codes_hash,
       CAST(list_sum(list_transform(
         list_zip(embedding,
                  list_transform(codes,
                                 qq -> qmin + CAST(qq AS DOUBLE)/255.0
                                       * (qmax - qmin))),
         p -> CAST(FLOOR(ABS(CAST(p[1] AS DOUBLE) - p[2]) * 1000000.0)
              AS BIGINT))) AS BIGINT) AS abs_err_fp
FROM c
ORDER BY vec_id
"""


_PC_DIM, _PC_ITERS = 64, 3


def embed_top_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-principal-component projection scores for every embedding
    (operators/linalg.py::top_pc_projections): one distributed
    mapInPandas pass turns each Arrow batch into an exact int64 Gram
    GEMM row, the driver combines moments in arbitrary-precision ints
    (``n*G - s s^T``, the covariance scaled by n^2), a 3-step
    fixed-point power iteration finds the dominant direction on the
    64x64 matrix, and one broadcast-literal projection pass scores
    the corpus -- the aggregate-big/iterate-small split PageRank and
    Lloyd use, applied to distributed covariance/PCA.  The oracle
    unrolls the identical iteration as HUGEINT CTEs."""
    from ..operators.linalg import top_pc_projections

    vecs = _tspread(spark, sf_dir, "embeddings")
    return top_pc_projections(
        vecs, dim=_PC_DIM, iters=_PC_ITERS
    ).orderBy("vec_id")


def _pc_iteration_ctes(iters: int) -> str:
    """w{t}/m{t}/v{t} CTEs: one matrix-vector multiply + max-abs
    renormalization per step, floor division via the non-negative-
    remainder device (`//` truncates toward zero on both engines)."""
    out = []
    for t in range(1, iters + 1):
        prev = "v0" if t == 1 else f"v{t - 1}"
        out.append(
            f"""w{t} AS (
  SELECT c.i, CAST(SUM(c.m * v.v) AS HUGEINT) AS w
  FROM cmat c JOIN {prev} v ON v.i = c.j GROUP BY c.i),
m{t} AS (SELECT MAX(ABS(w)) AS mx FROM w{t}),
v{t} AS (
  SELECT i, CASE WHEN mx = 0 THEN CAST(0 AS HUGEINT)
                 ELSE (num - ((num % mx) + mx) % mx) // mx END AS v
  FROM (SELECT i, w * CAST(1000000 AS HUGEINT) AS num FROM w{t})
  CROSS JOIN m{t})"""
        )
    return ",\n".join(out)


TOP_PC_SQL = f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
  FROM embeddings),
ex AS (
  SELECT vec_id, i, q[i] AS qi
  FROM qv, UNNEST(generate_series(1, {_PC_DIM})) AS t(i)),
nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM qv),
ssum AS (SELECT i, CAST(SUM(qi) AS HUGEINT) AS s FROM ex GROUP BY i),
gmat AS (
  SELECT a.i AS i, b.i AS j, CAST(SUM(a.qi * b.qi) AS HUGEINT) AS g
  FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2),
cmat AS (
  SELECT g.i, g.j, nn.n * g.g - sa.s * sb.s AS m
  FROM gmat g
  CROSS JOIN nn
  JOIN ssum sa ON sa.i = g.i
  JOIN ssum sb ON sb.i = g.j),
v0 AS (
  SELECT i, CAST(1 AS HUGEINT) AS v
  FROM UNNEST(generate_series(1, {_PC_DIM})) AS t(i)),
{_pc_iteration_ctes(_PC_ITERS)}
SELECT e.vec_id, CAST(SUM(e.qi * v.v) AS BIGINT) AS proj_fp
FROM ex e JOIN v{_PC_ITERS} v ON v.i = e.i
GROUP BY e.vec_id
ORDER BY e.vec_id
"""


_JL_IN_DIM, _JL_OUT_DIM = 64, 16


def embed_jl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign-random projection of the embedding
    corpus, 64 -> 16 dimensions (operators/linalg.py::jl_project):
    Achlioptas-style {+1,-1} entries derived from md5 parity of
    ``"jl|i|j"`` -- NO stored or broadcast matrix, both engines
    regenerate it from the shared portable-hash device -- applied as
    exact integer multiply-adds over micro-quantized components.  The
    projected vectors feed the same downstream machinery (LSH
    bucketing, k-means, rerank) at a quarter of the component count;
    the JL lemma's distance-preservation guarantee is pinned
    statistically in tests/test_linalg.py.  Output: one row per
    (vector, output dim) with the exact integer projection; the
    conventional 1/sqrt(k) scale is a constant factor left out so the
    values stay BIGINT.  Scale shape: the projection is a per-row
    closed form in whole-stage codegen (nested higher-order functions,
    no UDF, no shuffle); only the output explode + order touches the
    exchange."""
    from ..operators.linalg import jl_project

    # r15: _tspread (the single-row-group scan otherwise serializes the
    # interpreted projection onto one core) + a lazy checkpoint of the
    # exploded rows before the oracle orderBy (range partitioning samples
    # its child, so an un-cut global sort executes the projection twice).
    vecs = _tspread(spark, sf_dir, "embeddings")
    proj = jl_project(
        vecs, in_dim=_JL_IN_DIM, out_dim=_JL_OUT_DIM, salt="jl"
    )
    return (
        proj.select(
            "vec_id", F.posexplode("proj").alias("j", "y_q")
        )
        .localCheckpoint(eager=False)
        .orderBy("vec_id", "j")
    )


JL_PROJECT_SQL = f"""
WITH comp AS (
  SELECT vec_id, i,
         CAST(FLOOR(CAST(embedding[i + 1] AS DOUBLE) * 1000000) AS BIGINT)
           AS q
  FROM embeddings,
       (SELECT UNNEST(generate_series(0, {_JL_IN_DIM - 1})) AS i)
),
signs AS (
  SELECT i, j,
         CAST(1 - 2 * ((strpos('0123456789abcdef',
                        substr(md5('jl|' || i || '|' || j), 1, 1)) - 1) % 2)
              AS BIGINT) AS s
  FROM (SELECT UNNEST(generate_series(0, {_JL_IN_DIM - 1})) AS i),
       (SELECT UNNEST(generate_series(0, {_JL_OUT_DIM - 1})) AS j)
)
SELECT c.vec_id, s.j, CAST(SUM(c.q * s.s) AS BIGINT) AS y_q
FROM comp c JOIN signs s ON c.i = s.i
GROUP BY 1, 2
ORDER BY vec_id, j
"""


def stream_dedup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact deduplication: ``dropDuplicates`` on
    (user_id, event_type) executed AS A STREAM (append-mode memory sink,
    availableNow).  The drained sink holds each pair exactly once, so a
    batch count per event type equals plain COUNT(DISTINCT user_id) --
    which is what the oracle asserts."""
    ev = _events_stream(spark, sf_dir)
    deduped = ev.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    name, _q = _run_to_memory(deduped, "append", "stream_dedup")
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_distinct_users"))
        .orderBy("event_type")
    )


def stream_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup: ``dropDuplicatesWithinWatermark``
    evicts per-key state once the event-time watermark passes it, unlike
    plain ``dropDuplicates`` whose state grows with every distinct key
    forever -- the contract an unbounded 100 TB stream actually needs.
    The availableNow drain delivers all input inside the first micro-batch
    (before the watermark advances), so the result equals a global
    distinct and the plain-dedup oracle applies; in production the
    semantics are dedup-within-horizon with O(keys in horizon) state."""
    from ..streaming.windows import _ensure_event_time

    ev = _ensure_event_time(_events_stream(spark, sf_dir))
    deduped = (
        ev.select("user_id", "event_type", "ts")
        .withWatermark("ts", "30 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    name, _q = _run_to_memory(deduped, "append", "stream_dedup_wm")
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_distinct_users"))
        .orderBy("event_type")
    )


STREAM_DEDUP_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_users
FROM events GROUP BY event_type ORDER BY event_type
"""




def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest near-dup check (operators/dedup.py::
    incremental_minhash_dedup): a small new batch (80%-prefix twins of docs
    0-59) probes the existing corpus's LSH band table via a broadcast join;
    exact Jaccard verifies candidate pairs only."""
    from ..operators.dedup import incremental_minhash_dedup

    docs = _tspread(spark, sf_dir, "documents").select("doc_id", "text")
    existing = docs.filter(F.col("doc_id") < 300)
    new_batch = docs.filter(F.col("doc_id") < 60).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr(
            "substring(text, 1, cast(floor(length(text)*0.8) as int))"
        ).alias("text"),
    )
    return incremental_minhash_dedup(
        new_batch, existing, threshold=0.5, num_perm=16, band_size=4
    )


INCREMENTAL_LSH_SQL = f"""
WITH existing AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 300
),
new_docs AS (
  SELECT doc_id + 100000 AS doc_id,
         substring(text, 1, CAST(FLOOR(LENGTH(text)*0.8) AS INT)) AS text
  FROM documents WHERE doc_id < 60
),
corpus AS (SELECT * FROM existing UNION ALL SELECT * FROM new_docs),
toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM corpus),
sets AS (
  SELECT doc_id, list_distinct(
    [array_to_string(tk[i:i+2], ' ')
     FOR i IN generate_series(1, greatest(len(tk) - 2, 1))]) AS sh
  FROM toks
),
shrows AS (SELECT doc_id, UNNEST(sh) AS shingle FROM sets),
sig AS (
  SELECT doc_id, p.perm AS perm,
         MIN(md5(CAST(p.perm AS VARCHAR) || '|' || shingle)) AS minhash
  FROM shrows, LATERAL (SELECT UNNEST(generate_series(0, 15)) AS perm) p
  GROUP BY doc_id, p.perm
),
bands AS (
  SELECT doc_id, perm // 4 AS band,
         string_agg(minhash, ',' ORDER BY perm) AS band_sig
  FROM sig GROUP BY doc_id, perm // 4
),
cand AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS existing_id
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
  WHERE a.doc_id >= 100000 AND b.doc_id < 100000
)
SELECT c.new_id, c.existing_id,
       CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
         AS jaccard
FROM cand c
JOIN sets sa ON sa.doc_id = c.new_id
JOIN sets sb ON sb.doc_id = c.existing_id
WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
        / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.5
ORDER BY c.new_id, c.existing_id
"""




PACK_BUDGET = 500


def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM training (operators/text.py::
    pack_sequences): each document's bin and offset in the concatenated
    token stream at a fixed token budget per bin.  The global prefix sum
    runs through the range-partitioned two-level running sum -- no
    single-partition window."""
    from ..operators.text import pack_sequences

    docs = _tspread(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=PACK_BUDGET)


def _pack_sql() -> str:
    from ..operators.text import BPE_PATTERN

    pat = BPE_PATTERN.replace("'", "''")
    return f"""
WITH toks AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{pat}')) AS n_bpe_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_bpe_tokens,
         CAST(SUM(n_bpe_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM toks
)
SELECT doc_id, n_bpe_tokens,
       cum - n_bpe_tokens AS prefix_tokens,
       (cum - n_bpe_tokens) // {PACK_BUDGET} AS bin_id,
       (cum - n_bpe_tokens) % {PACK_BUDGET} AS offset_in_bin
FROM c ORDER BY doc_id
"""




def text_pack_bins_bfd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-straddle best-fit-decreasing packing (operators/text.py::
    pack_bins_bfd): documents land whole in fixed-budget bins, shard-local
    BFD over 8 doc_id-hash shards, with the per-bin fill efficiency
    (tokens/budget) as an output column -- packing QUALITY is measured
    in-query, not assumed.  The oracle replays the exact algorithm as a
    lockstep recursive CTE (one recursion step per in-shard rank, all
    shards advancing together), so both tie rules and the overflow rule
    are under the gate."""
    from ..operators.text import pack_bins_bfd

    docs = _tspread(spark, sf_dir, "documents")
    return pack_bins_bfd(docs, budget=PACK_BUDGET, num_shards=8).orderBy(
        "doc_id"
    )


def _pack_bfd_sql(budget: int = PACK_BUDGET, num_shards: int = 8) -> str:
    from ..operators.text import BPE_PATTERN

    pat = BPE_PATTERN.replace("'", "''")
    # inline these (no LATERAL aliases inside the recursive branch):
    # fullest bin that still fits this doc, and its 1-based position
    # (list_position returns the FIRST occurrence = lowest bin id, the
    # same tie rule as the pandas kernel)
    best = f"list_max(list_filter(b.loads, x -> x + o.n <= {budget}))"
    pos = f"list_position(b.loads, {best})"
    return f"""
WITH RECURSIVE ord AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n,
         CAST(doc_id % {num_shards} AS INT) AS shard,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id % {num_shards}
           ORDER BY len(regexp_extract_all(text, '{pat}')) DESC, doc_id
         ) AS rn
  FROM documents
),
bfd AS (
  SELECT shard, CAST(0 AS BIGINT) AS rn,
         CAST([] AS BIGINT[]) AS loads,
         CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS n,
         CAST(NULL AS INT) AS bin_in_shard,
         CAST(NULL AS BIGINT) AS offset_in_bin
  FROM (SELECT DISTINCT shard FROM ord)
  UNION ALL
  SELECT o.shard, b.rn + 1,
         CASE WHEN {best} IS NULL THEN list_append(b.loads, o.n)
              ELSE list_concat(
                     list_concat(b.loads[1:{pos} - 1], [{best} + o.n]),
                     b.loads[{pos} + 1:len(b.loads)])
         END,
         o.doc_id, o.n,
         CAST(CASE WHEN {best} IS NULL THEN len(b.loads)
                   ELSE {pos} - 1 END AS INT),
         COALESCE({best}, 0)
  FROM bfd b JOIN ord o ON o.shard = b.shard AND o.rn = b.rn + 1
)
SELECT doc_id, n AS n_bpe_tokens, shard, bin_in_shard, offset_in_bin,
       CAST(SUM(n) OVER (PARTITION BY shard, bin_in_shard) AS BIGINT)
         AS bin_tokens,
       CAST(SUM(n) OVER (PARTITION BY shard, bin_in_shard) AS DOUBLE)
         / {budget} AS fill_pct
FROM bfd WHERE doc_id IS NOT NULL
ORDER BY doc_id
"""


def curation_packed_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end round-2 curation (plans/curation.py::curate_and_pack):
    exact dedup (planted verbatim copies removed) -> benchmark
    decontamination (planted eval twins removed) -> token floor -> sequence
    packing into 500-token training bins."""
    from ..plans.curation import curate_and_pack

    docs = _tspread(spark, sf_dir, "documents").select("doc_id", "text")
    eval_docs = docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 340)
    )
    train = (
        docs.filter(F.col("doc_id") < 300)
        .unionAll(
            docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 320))
            .select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                F.expr(
                    "substring(text, 1, cast(floor(length(text)*0.8) as int))"
                ).alias("text"),
            )
        )
        .unionAll(
            docs.filter(F.col("doc_id") < 20).select(
                (F.col("doc_id") + 200000).alias("doc_id"), "text"
            )
        )
    )
    return curate_and_pack(
        train, eval_docs, min_tokens=20, pack_budget=PACK_BUDGET
    )


def _curation_packed_sql() -> str:
    from ..operators.text import BPE_PATTERN

    pat = BPE_PATTERN.replace("'", "''")
    return f"""
WITH eval_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id >= 300 AND doc_id < 340
),
train AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 300
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         substring(text, 1, CAST(FLOOR(LENGTH(text)*0.8) AS INT)) AS text
  FROM documents WHERE doc_id >= 300 AND doc_id < 320
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id < 20
),
dedup AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM train
  ) WHERE rn = 1
),
tr_sh AS ({_sql_shingle_rows('dedup')}),
ev_sh AS ({_sql_shingle_rows('eval_docs', 'eval_id')}),
contaminated AS (
  SELECT DISTINCT doc_id FROM (
    SELECT t.doc_id, e.eval_id
    FROM tr_sh t JOIN ev_sh e ON t.shingle = e.shingle
    GROUP BY t.doc_id, e.eval_id
    HAVING COUNT(*) >= 2
  )
),
clean AS (
  SELECT d.doc_id, d.text FROM dedup d
  WHERE d.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
kept AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{pat}')) AS n_bpe_tokens
  FROM clean
  WHERE len(regexp_extract_all(text, '{pat}')) >= 20
),
c AS (
  SELECT doc_id, n_bpe_tokens,
         CAST(SUM(n_bpe_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM kept
)
SELECT doc_id, n_bpe_tokens,
       cum - n_bpe_tokens AS prefix_tokens,
       (cum - n_bpe_tokens) // {PACK_BUDGET} AS bin_id,
       (cum - n_bpe_tokens) % {PACK_BUDGET} AS offset_in_bin
FROM c ORDER BY doc_id
"""




def agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width distribution histogram per group: event values bucketed
    into 10 integer-cents-wide bins (floor division -- no width_bucket,
    whose open-interval edge rules differ subtly across engines), plus
    each bin's share in exact per-mille (integer cross-product, not a
    rounded ratio).  One map-side-combinable aggregation; the profiling
    companion to ``profile_table``."""
    ev = _t(spark, sf_dir, "events")
    cents = _cents(F.col("value"))
    bucket = F.least(
        F.greatest(F.floor(cents / 1000).cast("long"), F.lit(0)), F.lit(9)
    )
    hist = (
        ev.groupBy(F.col("event_type"), bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
    )
    totals = hist.groupBy("event_type").agg(F.sum("n").alias("n_total"))
    return (
        hist.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "bucket",
            "n",
            F.floor(F.col("n") * 1000 / F.col("n_total")).cast("long").alias(
                "per_mille"
            ),
        )
        .orderBy("event_type", "bucket")
    )


HISTOGRAM_SQL = """
WITH h AS (
  SELECT event_type,
         LEAST(GREATEST(CAST(FLOOR(CAST(FLOOR("value"*100) AS BIGINT) / 1000.0)
                        AS BIGINT), 0), 9) AS bucket,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_total FROM h GROUP BY 1)
SELECT h.event_type, h.bucket, h.n,
       CAST(FLOOR(h.n * 1000.0 / t.n_total) AS BIGINT) AS per_mille
FROM h JOIN t ON t.event_type = h.event_type
ORDER BY h.event_type, h.bucket
"""


def events_resample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap filling: a dense daily spine per
    event type (built with ``sequence`` over the observed date range --
    no data shuffle, the spine is generated), left-joined onto the
    per-day aggregates; missing days read 0 events and carry the last
    observed daily total forward (``last(..., ignorenulls)`` over an
    ordered per-type window).  The standard resample/ffill primitive for
    feature pipelines over irregular event streams; at scale the spine
    is tiny (types x days) and the join broadcasts it."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.to_date("ts").alias("day")
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("value_cents"),
        )
    )
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = (
        ev.select("event_type").distinct()
        .crossJoin(F.broadcast(bounds))  # 5x1 constant carrier
        .select(
            "event_type",
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            # ISO string, not DATE: duckdb DATE arrives in pandas as
            # datetime64 and renders with a time part -- strings compare
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("value_cents", F.lit(0)).alias("value_cents"),
            F.last("value_cents", ignorenulls=True)
            .over(w)
            .alias("last_seen_cents"),
        )
        .orderBy("event_type", "day")
    )


RESAMPLE_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(FLOOR("value"*100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events
),
spine AS (
  SELECT event_type, CAST(day_ts AS DATE) AS day FROM (
    SELECT t.event_type,
           UNNEST(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS day_ts
    FROM (SELECT DISTINCT event_type FROM events) t, bounds b
  )
)
SELECT s.event_type, strftime(s.day, '%Y-%m-%d') AS day,
       COALESCE(d.n_events, 0) AS n_events,
       COALESCE(d.value_cents, 0) AS value_cents,
       LAST_VALUE(d.value_cents IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS last_seen_cents
FROM spine s LEFT JOIN daily d
  ON d.event_type = s.event_type AND d.day = s.day
ORDER BY s.event_type, s.day
"""


def agg_mode_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MODE per group (Spark has no mode aggregate): count the
    integerized values per group -- map-side combinable -- then one
    window over the (group, value) count relation with a deterministic
    (count DESC, value ASC) tiebreak.  The window runs over the count
    relation, never the raw events."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.floor("value").cast("long").alias("v")
    )
    counts = ev.groupBy("event_type", "v").agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("v").asc()
    )
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "event_type",
            F.col("v").alias("mode_value"),
            F.col("n").alias("n_mode"),
        )
        .orderBy("event_type")
    )


MODE_SQL = """
WITH counts AS (
  SELECT event_type, CAST(FLOOR("value") AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY event_type ORDER BY n DESC, v ASC) AS rn
  FROM counts
)
SELECT event_type, v AS mode_value, n AS n_mode
FROM ranked WHERE rn = 1 ORDER BY event_type
"""


def merge_upsert_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE on a manifest-backed parquet table
    (sources/manifest.py): the part table lands as 8 range-partitioned
    files + stats sidecar, an update batch overwrites keys < 100 and
    appends 10 brand-new keys, and only the touched files are rewritten
    (file-level property asserted in tests/test_manifest.py; this query
    verifies the RELATIONAL contract -- upsert-then-read-back equals the
    anti-join-union the oracle computes directly)."""
    import hashlib
    import os as _os

    from ..sources.manifest import (
        merge_upsert,
        read_live,
        write_manifest_table,
    )

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base_path = _os.path.join(tempfile.gettempdir(), f"part_merge_{tag}")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_name", "p_size")
    write_manifest_table(part, base_path, "p_partkey", 8)
    updates = (
        part.filter(F.col("p_partkey") < 100)
        .select(
            "p_partkey",
            F.concat(F.lit("upd "), F.col("p_name")).alias("p_name"),
            (F.col("p_size") + F.lit(1000)).alias("p_size"),
        )
        .unionByName(
            part.filter(F.col("p_partkey") < 10).select(
                (F.col("p_partkey") + F.lit(1000000)).alias("p_partkey"),
                "p_name",
                "p_size",
            )
        )
    )
    merge_upsert(spark, base_path, updates, "p_partkey")
    return (
        read_live(spark, base_path)  # manifest view: tombstones excluded
        .select("p_partkey", "p_name", "p_size")
        .orderBy("p_partkey")
    )


MERGE_SQL = """
WITH base AS (SELECT p_partkey, p_name, p_size FROM part),
upd AS (
  SELECT p_partkey, 'upd ' || p_name AS p_name, p_size + 1000 AS p_size
  FROM part WHERE p_partkey < 100
  UNION ALL
  SELECT p_partkey + 1000000, p_name, p_size FROM part WHERE p_partkey < 10
),
merged AS (
  SELECT * FROM base
  WHERE p_partkey NOT IN (SELECT p_partkey FROM upd)
  UNION ALL
  SELECT * FROM upd
)
SELECT p_partkey, p_name, p_size FROM merged ORDER BY p_partkey
"""


def events_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly flags over the daily event-count series:
    per (event_type, day), the trailing-7-day mean (excluding the
    current day) in exact milli-units and a flag for days whose count
    deviates from that mean by more than 50%.  One map-side-combined daily
    pre-aggregate, one bounded rows-frame window per type -- the window
    runs over the tiny daily series, never over raw events."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n_events"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    trailing = daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events",
        F.sum("n_events").over(w).alias("trail_sum"),
        F.count("n_events").over(w).alias("trail_n"),
    )
    return (
        trailing.filter(F.col("trail_n") >= 3)
        .select(
            "event_type",
            "day",
            "n_events",
            F.expr("(trail_sum * 1000) div trail_n").alias("trail_mean_milli"),
            F.expr(
                "CASE WHEN n_events * 1000 * trail_n > trail_sum * 1500"
                " OR n_events * 1000 * trail_n * 2 < trail_sum * 1000"
                " THEN 1 ELSE 0 END"
            ).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


ANOMALY_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
trail AS (
  SELECT event_type, day, n_events,
         CAST(SUM(n_events) OVER w AS BIGINT) AS trail_sum,
         CAST(COUNT(n_events) OVER w AS BIGINT) AS trail_n
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n_events,
       (trail_sum * 1000) // trail_n AS trail_mean_milli,
       CASE WHEN n_events * 1000 * trail_n > trail_sum * 1500
              OR n_events * 1000 * trail_n * 2 < trail_sum * 1000
            THEN 1 ELSE 0 END AS is_anomaly
FROM trail WHERE trail_n >= 3
ORDER BY event_type, day
"""


def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct-user counts (DAU and exact 7-day WAU) per day.
    Distinct counts do NOT sum across a sliding window, so WAU uses the
    contribution expansion: each (user, active_day) pair is exploded
    into the 7 report days it supports, then counted distinct per day --
    linear in activity x window, exact, and fully map-side-partial.  The
    day spine bounds report days to the observed range."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    act = ev.distinct()
    dau = act.groupBy("day").agg(F.count("*").alias("dau"))
    contrib = act.select(
        "user_id",
        F.explode(
            F.expr("sequence(day, date_add(day, 6))")
        ).alias("report_day"),
    ).distinct()
    bounds = ev.agg(F.max("day").alias("d_max"))
    wau = (
        contrib.crossJoin(F.broadcast(bounds))
        .filter(F.col("report_day") <= F.col("d_max"))
        .groupBy("report_day")
        .agg(F.count("*").alias("wau"))
    )
    return (
        dau.join(wau, dau.day == wau.report_day)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.expr("(dau * 1000) div wau").alias("stickiness_milli"),
        )
        .orderBy("day")
    )


ROLLING_SQL = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day FROM events
),
act AS (SELECT DISTINCT user_id, day FROM ev),
dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM act GROUP BY 1),
contrib AS (
  SELECT DISTINCT a.user_id, CAST(u.rd AS DATE) AS report_day
  FROM act a,
       UNNEST(generate_series(a.day, a.day + INTERVAL 6 DAY,
                              INTERVAL 1 DAY)) AS u(rd)
),
bounds AS (SELECT MAX(day) AS d_max FROM ev),
wau AS (
  SELECT report_day, CAST(COUNT(*) AS BIGINT) AS wau
  FROM contrib CROSS JOIN bounds
  WHERE report_day <= d_max GROUP BY 1
)
SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
       (d.dau * 1000) // w.wau AS stickiness_milli
FROM dau d JOIN wau w ON d.day = w.report_day
ORDER BY day
"""


def graph_pagerank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank over the event-type transition graph
    (operators/graph.py): edges from per-user consecutive transitions
    (lag window, the log-to-graph aggregation that IS the heavy step at
    100 TB), then 3 exact integer power iterations on the small graph.
    rank_fp is in 10^12 units; see graph.py for the overflow headroom
    argument."""
    from ..operators.graph import pagerank_fixed, transition_edges

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    edges = transition_edges(ev)
    return pagerank_fixed(nodes, edges, iterations=3)


def _pagerank_sql(iterations: int = 3) -> str:
    steps = []
    prev = "r0"
    for i in range(1, iterations + 1):
        steps.append(f"""
f{i} AS (
  SELECT ep.dst AS node,
         CAST(SUM((r.rank_fp * ep.p_fp) // 1000000) AS BIGINT) AS inflow
  FROM ep JOIN {prev} r ON ep.src = r.node GROUP BY 1
),
r{i} AS (
  SELECT n.node,
         ((1000000000000 * 15) // 100) // nd.n_nodes
           + (85 * COALESCE(f.inflow, 0)) // 100 AS rank_fp
  FROM nodes n LEFT JOIN f{i} f USING (node) CROSS JOIN nd
)""")
        prev = f"r{i}"
    chain = ",".join(steps)
    return f"""
WITH lagged AS (
  SELECT LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
edges AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM lagged WHERE src IS NOT NULL GROUP BY 1, 2
),
outt AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM edges GROUP BY 1),
ep AS (
  SELECT e.src, e.dst, (e.w * 1000000) // o.out_w AS p_fp
  FROM edges e JOIN outt o USING (src)
),
nodes AS (SELECT DISTINCT event_type AS node FROM events),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes),
r0 AS (
  SELECT node, (1000000000000 // n_nodes) AS rank_fp
  FROM nodes CROSS JOIN nd
),{chain}
SELECT node, rank_fp FROM {prev} ORDER BY node
"""


def sketch_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise KMV set-overlap matrix
    (operators/sketches.py::kmv_overlap_matrix): shared-user estimates
    between EVERY pair of event types, from one bounded sketch per type
    built in a single pass -- the S x S cross-source overlap /
    contamination report at sketch cost.  The pair algebra runs on the
    S*k-row sketch relation only; nothing pairwise is corpus-sized."""
    from ..operators.sketches import kmv_overlap_matrix

    ev = _t(spark, sf_dir, "events")
    return kmv_overlap_matrix(ev, "event_type", "user_id", k=KMV_K).orderBy(
        "ga", "gb"
    )


def _kmv_matrix_sql() -> str:
    from ..operators.sketches import sql_kmv_estimate

    est = sql_kmv_estimate(KMV_K, "_kth13")
    return f"""
WITH hashed AS (
  SELECT DISTINCT event_type AS g, md5(CAST(user_id AS VARCHAR)) AS h
  FROM events WHERE user_id IS NOT NULL
),
sk AS (
  SELECT g, h FROM hashed
  QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) <= {KMV_K}
),
pairs AS (
  SELECT a.g AS ga, b.g AS gb
  FROM (SELECT DISTINCT g FROM sk) a, (SELECT DISTINCT g FROM sk) b
  WHERE a.g < b.g
),
pooled AS (
  SELECT DISTINCT p.ga, p.gb, s.h
  FROM pairs p JOIN sk s ON s.g = p.ga OR s.g = p.gb
),
topk AS (
  SELECT ga, gb, h FROM pooled
  QUALIFY ROW_NUMBER() OVER (PARTITION BY ga, gb ORDER BY h) <= {KMV_K}
),
per_pair AS (
  SELECT t.ga, t.gb,
         CAST(COUNT(*) AS BIGINT) AS n_union_sketch,
         substr(MAX(t.h), 1, 13) AS _kth13,
         CAST(SUM(CASE WHEN ma.h IS NOT NULL AND mb.h IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_common_in_k
  FROM topk t
  LEFT JOIN sk ma ON ma.g = t.ga AND ma.h = t.h
  LEFT JOIN sk mb ON mb.g = t.gb AND mb.h = t.h
  GROUP BY t.ga, t.gb
)
SELECT ga, gb, n_union_sketch, n_common_in_k,
       CASE WHEN n_union_sketch < {KMV_K}
            THEN CAST(n_union_sketch AS DOUBLE) ELSE {est} END
         AS est_distinct_union,
       CAST(n_common_in_k AS DOUBLE) / CAST(n_union_sketch AS DOUBLE)
         AS est_jaccard,
       (CASE WHEN n_union_sketch < {KMV_K}
             THEN CAST(n_union_sketch AS DOUBLE) ELSE {est} END)
         * (CAST(n_common_in_k AS DOUBLE)
            / CAST(n_union_sketch AS DOUBLE))
         AS est_distinct_intersection
FROM per_pair
ORDER BY ga, gb
"""


SURPRISAL_STRATA_RATES = {0: 0.10, 1: 0.20, 2: 0.20, 3: 0.40}


def sample_surprisal_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-stratified sampling -- the curation practice of
    drawing training data across DIFFICULTY strata instead of uniformly:
    per-doc unigram surprisal (operators/lm.py, exact Q8), exact
    quartile strata via the scale-safe two-level global rank (never a
    single-partition window over data), then a deterministic md5-rate
    draw per stratum (operators/sampling.py::stratified_sample) that
    up-weights the high-surprisal tail.  Map-only selection -- no
    per-stratum top-k window whose 4 partitions would bottleneck a
    100 TB corpus."""
    from ..operators import lm as L
    from ..operators.sampling import stratified_sample
    from ..operators.windows import ordered_running_sum

    docs = _tspread(spark, sf_dir, "documents").select("doc_id", "text")
    sc = L.unigram_surprisal(docs).select("doc_id", "bpt_milli")
    n_df = sc.agg(F.count("*").alias("_n"))
    ranked = ordered_running_sum(
        sc.withColumn("_one", F.lit(1).cast("long")),
        [F.col("bpt_milli"), F.col("doc_id")],
        "_one",
        "rk",
    ).drop("_one")
    with_stratum = ranked.crossJoin(F.broadcast(n_df)).select(
        "doc_id",
        "bpt_milli",
        F.expr("CAST(((rk - 1) * 4) div _n AS INT)").alias("stratum"),
    )
    picked = stratified_sample(
        with_stratum,
        "stratum",
        SURPRISAL_STRATA_RATES,
        key=F.col("doc_id"),
    )
    return picked.select("doc_id", "stratum", "bpt_milli").orderBy("doc_id")


def _surprisal_strata_sql() -> str:
    from ..operators.lm import fixed_log2_sql
    from ..operators.sampling import rate_threshold
    from .queries_llm import TOKS_SQL

    vocab_chain = fixed_log2_sql(
        """
SELECT token, n_total + v_size AS _num, c + 1 AS _den FROM model
CROSS JOIN (SELECT CAST(SUM(c) AS BIGINT) AS n_total,
                   CAST(COUNT(*) AS BIGINT) AS v_size FROM model)""",
        "token",
        "_num",
        "_den",
        "s_q8",
    )
    cases = " ".join(
        f"WHEN stratum = {s} THEN '{rate_threshold(r)}'"
        for s, r in sorted(SURPRISAL_STRATA_RATES.items())
    )
    return f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS tk FROM documents),
items AS (SELECT doc_id, UNNEST(tk) AS token FROM toks),
model AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c
          FROM items GROUP BY 1),
vscores AS ({vocab_chain}),
per_doc AS (
  SELECT i.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(v.s_q8) AS BIGINT) AS bits_q8
  FROM items i JOIN vscores v USING (token) GROUP BY 1),
sc AS (
  SELECT doc_id, (bits_q8 * 1000) // (256 * n_tokens) AS bpt_milli
  FROM per_doc),
ranked AS (
  SELECT doc_id, bpt_milli,
         ROW_NUMBER() OVER (ORDER BY bpt_milli, doc_id) AS rk,
         COUNT(*) OVER () AS _n
  FROM sc),
strat AS (
  SELECT doc_id, bpt_milli,
         CAST(((rk - 1) * 4) // _n AS INT) AS stratum
  FROM ranked)
SELECT doc_id, stratum, bpt_milli FROM strat
WHERE md5(CAST(doc_id AS VARCHAR)) <
      (CASE {cases} ELSE '{rate_threshold(0.0)}' END)
ORDER BY doc_id
"""


DSIR_BUCKETS = 256
DSIR_TOPK = 100


def curation_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance selection (operators/lm.py::dsir_weights): score
    every document by the hashed-token Q8 log-likelihood ratio of the
    English subset (the target distribution) vs the whole corpus, and
    keep the top 100 by (weight, doc_id) -- the published
    importance-resampling recipe for LLM pretraining data selection.
    Distributed top-k via orderBy+limit (TakeOrdered); the bounded
    result then gets a rank column."""
    from ..operators import lm as L

    docs = _tspread(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    target = docs.filter(F.col("lang") == "en").select("doc_id", "text")
    w = L.dsir_weights(
        docs.select("doc_id", "text"), target, n_buckets=DSIR_BUCKETS
    )
    top = w.orderBy(F.col("weight_q8").desc(), "doc_id").limit(DSIR_TOPK)
    rk = Window.orderBy(F.col("weight_q8").desc(), "doc_id")
    return top.withColumn(
        "rk", F.row_number().over(rk).cast("long")
    ).orderBy("rk")


def _dsir_sql() -> str:
    from ..operators.lm import fixed_log2_sql
    from .queries_llm import TOKS_SQL

    bucket = _sql_hex13_mod("substr(md5(item), 1, 13)", DSIR_BUCKETS)
    grid_inner = f"""
SELECT b, _nr, _dr, _nt, _dt FROM (
  SELECT rb.b,
         (SELECT SUM(c) FROM raw_b) + {DSIR_BUCKETS} AS _nr,
         rb.c + 1 AS _dr,
         COALESCE((SELECT SUM(c) FROM tgt_b), 0) + {DSIR_BUCKETS} AS _nt,
         COALESCE(tb.c, 0) + 1 AS _dt
  FROM raw_b rb LEFT JOIN tgt_b tb USING (b))"""
    chain = fixed_log2_sql(grid_inner, "b, _nt, _dt", "_nr", "_dr", "s_raw")
    chain = fixed_log2_sql(chain, "b, s_raw", "_nt", "_dt", "s_tgt")
    return f"""
WITH toks AS (SELECT doc_id, lang, {TOKS_SQL} AS tk FROM documents),
items AS (SELECT doc_id, lang, UNNEST(tk) AS item FROM toks),
ib AS (SELECT doc_id, lang, {bucket} AS b FROM items),
raw_b AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM ib GROUP BY 1),
tgt_b AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM ib
          WHERE lang = 'en' GROUP BY 1),
scores AS (SELECT b, s_raw - s_tgt AS w_b FROM ({chain})),
doc_b AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c
          FROM ib GROUP BY 1, 2),
weights AS (
  SELECT d.doc_id, CAST(SUM(d.c * s.w_b) AS BIGINT) AS weight_q8
  FROM doc_b d JOIN scores s USING (b) GROUP BY 1),
top AS (
  SELECT doc_id, weight_q8 FROM weights
  ORDER BY weight_q8 DESC, doc_id LIMIT {DSIR_TOPK})
SELECT doc_id, weight_q8,
       CAST(ROW_NUMBER() OVER (ORDER BY weight_q8 DESC, doc_id)
            AS BIGINT) AS rk
FROM top
ORDER BY rk
"""


def graph_label_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-label propagation communities
    (operators/graph.py::label_propagation) over the event-type
    transition graph, symmetrized: 3 synchronous rounds, labels init to
    node ids, ties to the smaller label -- fully deterministic, no RNG.
    Complements PageRank (centrality) and the dedup connected
    components (reachability): weight-majority voting keeps
    weakly-bridged clusters apart."""
    from ..operators.graph import label_propagation, transition_edges

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    nodes = ev.select(F.col("event_type").alias("node")).distinct()
    edges = transition_edges(ev)
    labels = label_propagation(nodes, edges, iterations=3)
    sizes = labels.groupBy("label").agg(
        F.count("*").cast("long").alias("csize")
    )
    return labels.join(sizes, "label").select(
        "node", "label", "csize"
    ).orderBy("node")


def _label_prop_sql(iterations: int = 3) -> str:
    steps = []
    prev = "l0"
    for i in range(1, iterations + 1):
        steps.append(f"""
v{i} AS (
  SELECT u.src, l.label, CAST(SUM(u.w) AS BIGINT) AS vw
  FROM und u JOIN {prev} l ON u.dst = l.node GROUP BY 1, 2
),
n{i} AS (
  SELECT src AS node, label FROM v{i}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY src
            ORDER BY vw DESC, label) = 1
),
l{i} AS (
  SELECT o.node, COALESCE(n.label, o.label) AS label
  FROM {prev} o LEFT JOIN n{i} n USING (node)
)"""
        )
        prev = f"l{i}"
    chain = ",".join(steps)
    return f"""
WITH lagged AS (
  SELECT LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
edges AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM lagged WHERE src IS NOT NULL GROUP BY 1, 2
),
und AS (
  SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM (
    SELECT src, dst, w FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst, w FROM edges
  ) GROUP BY 1, 2
),
nodes AS (SELECT DISTINCT event_type AS node FROM events),
l0 AS (SELECT node, node AS label FROM nodes),{chain},
sizes AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS csize
  FROM {prev} GROUP BY 1
)
SELECT l.node, l.label, s.csize
FROM {prev} l JOIN sizes s USING (label)
ORDER BY l.node
"""


def sample_temperature_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain resampling (operators/sampling.py::
    temperature_resample): per-source quotas proportional to
    sqrt(count) -- the low-resource-domain up-weighting used in
    multilingual training mixes -- filled by deterministic md5-rank
    draw.  sqrt is IEEE-correctly-rounded and immediately floored to
    Q20 fixed point, so quotas and the draw are bit-identical across
    engines."""
    from ..operators.sampling import temperature_resample

    docs = _tspread(spark, sf_dir, "documents").select("doc_id", "source")
    return temperature_resample(docs, "source", "doc_id")


TEMPERATURE_SQL = """
WITH counts AS (
  SELECT source AS domain, CAST(COUNT(*) AS BIGINT) AS c_d
  FROM documents GROUP BY 1
),
w AS (
  SELECT domain, c_d,
         CAST(FLOOR(sqrt(CAST(c_d AS DOUBLE)) * 1048576) AS BIGINT) AS w_fp
  FROM counts
),
tot AS (
  SELECT CAST(SUM(c_d) AS BIGINT) AS n_total,
         CAST(SUM(w_fp) AS BIGINT) AS w_sum FROM w
),
targets AS (
  SELECT domain, c_d, w_fp,
         LEAST(((n_total // 2) * w_fp) // w_sum, c_d) AS target_n
  FROM w CROSS JOIN tot
),
ranked AS (
  SELECT source AS domain, doc_id AS id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
  FROM documents
)
SELECT r.domain, r.id, r.rk, t.c_d, t.target_n
FROM ranked r JOIN targets t USING (domain)
WHERE r.rk <= t.target_n
ORDER BY r.domain, r.id
"""


def join_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join (operators/joins.py::fuzzy_name_pairs): distinct
    part names plus a deterministically corrupted twin of each (chars
    3-4 replaced with 'zq', edit distance <= 2), matched back via
    q-gram blocking + Levenshtein verify.  Every planted twin must find
    its original without any cross join."""
    from ..operators.joins import fuzzy_name_pairs

    names = (
        _t(spark, sf_dir, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
    )
    corrupted = names.select(
        F.concat(
            F.expr("substring(name, 1, 2)"),
            F.lit("zq"),
            F.expr("substring(name, 5)"),
        ).alias("name")
    )
    corpus = names.unionAll(corrupted).distinct()
    return fuzzy_name_pairs(corpus, "name", max_dist=2, q=3, max_df=50)


FUZZY_SQL = """
WITH names AS (SELECT DISTINCT p_name AS name FROM part),
corpus AS (
  SELECT name FROM names
  UNION
  SELECT (substr(name, 1, 2) || 'zq' || substr(name, 5)) FROM names
),
grams AS (
  SELECT name, unnest(list_distinct(list_transform(
           generate_series(1, greatest(length(name) - 2, 1)),
           i -> substr(name, i, 3)))) AS g
  FROM corpus
),
rare AS (
  SELECT g FROM (SELECT g, COUNT(*) AS gdf FROM grams GROUP BY 1)
  WHERE gdf <= 50
),
blocked AS (SELECT gr.name, gr.g FROM grams gr JOIN rare USING (g)),
cand AS (
  SELECT DISTINCT a.name AS name_a, b.name AS name_b
  FROM blocked a JOIN blocked b USING (g)
  WHERE a.name < b.name
    AND abs(length(a.name) - length(b.name)) <= 2
)
SELECT name_a, name_b, levenshtein(name_a, name_b) AS dist
FROM cand WHERE levenshtein(name_a, name_b) <= 2
ORDER BY name_a, name_b
"""


# Benford expected leading-digit shares, floor(log10(1 + 1/d) * 1e6):
# fixed published constants (no libm at query time on either engine)
_BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910,
    5: 79181, 6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


def dq_benford_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals -- the classic forensic
    data-quality screen (fabricated or synthetically capped monetary
    data drifts from the log-uniform leading-digit law).  The leading
    digit comes from the DIGIT STRING of exact integer cents (never a
    float log10); observed shares are exact ppm via integer division;
    expected shares are the published Benford constants as fixed ppm
    literals.  Emits per digit: count, observed ppm, expected ppm,
    and the signed deviation -- the inputs of any chi-square/MAD
    conformity test downstream.

    Scale shape: one map-only digit projection + one 9-row hash
    aggregate; nothing after the scan exceeds nine rows."""
    od = _t(spark, sf_dir, "orders").select(
        F.expr(
            "substring(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT)"
            " AS STRING), 1, 1)"
        ).alias("digit_s")
    ).filter(F.col("digit_s").between("1", "9"))
    counts = od.groupBy(
        F.col("digit_s").cast("long").alias("digit")
    ).agg(F.count("*").cast("long").alias("n"))
    total = counts.agg(F.sum("n").alias("n_total"))
    exp_col = F.create_map(
        *[
            x
            for d, ppm in _BENFORD_PPM.items()
            for x in (F.lit(d).cast("long"), F.lit(ppm).cast("long"))
        ]
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.expr("(n * 1000000) div n_total").alias("obs_ppm"),
            exp_col[F.col("digit")].alias("exp_ppm"),
        )
        .withColumn("dev_ppm", F.col("obs_ppm") - F.col("exp_ppm"))
        .orderBy("digit")
    )


BENFORD_SQL = f"""
WITH d AS (
  SELECT CAST(substring(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT)
              AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
  WHERE substring(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT)
        AS VARCHAR), 1, 1) BETWEEN '1' AND '9'
),
counts AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM counts),
exp AS (
  SELECT * FROM (VALUES
    {", ".join(f"({d}, {ppm})" for d, ppm in _BENFORD_PPM.items())}
  ) AS t(digit, exp_ppm)
)
SELECT c.digit, c.n,
       CAST((c.n * 1000000) // t.n_total AS BIGINT) AS obs_ppm,
       CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
       CAST((c.n * 1000000) // t.n_total - e.exp_ppm AS BIGINT) AS dev_ppm
FROM counts c CROSS JOIN tot t JOIN exp e ON e.digit = c.digit
ORDER BY c.digit
"""


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared per-(event_type, day) revenue rollup in exact integer
    cents -- the base relation of the whole daily-statistics family
    (Spearman / Kendall / ANOVA / Theil-Sen / change-point).  One
    map-side-combinable hash aggregate; the cents canonicalization
    (``FLOOR(value*100)`` -> BIGINT) lives HERE and in ``DAILY_CTE``
    only, so an exactness change touches exactly two sites."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.expr("CAST(FLOOR(value * 100) AS BIGINT)").alias("cents"),
    )
    return ev.groupBy("event_type", "day").agg(F.sum("cents").alias("y"))


# the SQL mirror of _daily_cents, spliced into every family oracle
DAILY_CTE = """daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS y
  FROM events GROUP BY 1, 2
)"""



_PATH_TOPK = 25


def events_path_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining, bounded form: the top-25 most common
    3-step event-type paths across all users -- two LEAD windows over
    each user's time-ordered stream, one hash-agg, one
    TakeOrderedAndProject.  The "what do users do next" complement to
    events_markov_transitions' 1-step conditionals and the funnel's
    FIXED pattern: this discovers the frequent paths instead of
    checking a known one.

    Scale shape: the lag/lead window shuffles on user_id (never
    global); the path relation is bounded by |event_type|^3 after the
    aggregate, so the top-k is driver-trivial.  Ties break on the
    lexicographic path -- fully deterministic."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.select(
            F.col("event_type").alias("step1"),
            F.lead("event_type", 1).over(w).alias("step2"),
            F.lead("event_type", 2).over(w).alias("step3"),
        )
        .filter(F.col("step3").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(F.count("*").cast("long").alias("n_paths"))
    )
    return (
        paths.orderBy(
            F.desc("n_paths"), "step1", "step2", "step3"
        ).limit(_PATH_TOPK)
    )


PATH_NGRAMS_SQL = f"""
WITH seq AS (
  SELECT event_type AS step1,
         LEAD(event_type, 1) OVER w AS step2,
         LEAD(event_type, 2) OVER w AS step3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT step1, step2, step3, CAST(COUNT(*) AS BIGINT) AS n_paths
FROM seq WHERE step3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n_paths DESC, step1, step2, step3
LIMIT {_PATH_TOPK}
"""


_CP_SCALE = 1000


def events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detection per event type -- the binary-
    segmentation step every change-point algorithm iterates: over the
    daily-revenue series, pick the split t that maximizes the absolute
    between-segment mean gap |mean(1..t) - mean(t+1..n)|, scored in
    exact integer milli-cents: ``gap_milli = floor(|ps*(n-t) -
    (S-ps)*t| * 1000 / (t*(n-t)))`` (one cross-multiplication per
    split, no float means).  Ties break on the earliest split day.

    Scale shape: one map-side-combinable daily rollup, a per-type
    (never global) prefix-sum window over the days-sized relation, one
    scoring projection, and a per-type argmax window -- nothing
    touches data after the rollup.  Magnitude: |d_num| <= S*n; with
    daily cents S <= ~1e10 and n <= ~1e4 days the scaled numerator
    stays under ~1e17 -- int64-safe; beyond that, lift to
    DECIMAL/HUGEINT like the chi2/ANOVA path."""
    daily = _daily_cents(spark, sf_dir)
    wday = Window.partitionBy("event_type").orderBy("day")
    wall = Window.partitionBy("event_type")
    pre = daily.select(
        "event_type",
        "day",
        F.row_number().over(wday).cast("long").alias("t"),
        F.sum("y").over(wday).cast("long").alias("ps"),
        F.sum("y").over(wall).cast("long").alias("s_all"),
        F.count("*").over(wall).cast("long").alias("n_days"),
    ).filter(F.col("t") < F.col("n_days"))
    d_num = F.abs(
        F.col("ps") * (F.col("n_days") - F.col("t"))
        - (F.col("s_all") - F.col("ps")) * F.col("t")
    )
    den = F.col("t") * (F.col("n_days") - F.col("t"))
    scored = pre.select(
        "event_type",
        "day",
        "t",
        "n_days",
        (d_num * _CP_SCALE).alias("_num"),
        den.alias("_den"),
    ).select(
        "event_type",
        "day",
        "t",
        "n_days",
        # BIGINT `div` end-to-end (a float `/` is only exact below 2^53
        # and the engines round a double->BIGINT cast differently);
        # _num >= 0 so truncation equals floor
        F.expr("_num div _den").cast("long").alias("gap_milli"),
    )
    wrank = Window.partitionBy("event_type").orderBy(
        F.desc("gap_milli"), "t"
    )
    return (
        scored.withColumn("rk", F.row_number().over(wrank))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            "n_days",
            # dates emit as strings (the repo's date-output convention:
            # DuckDB's pandas bridge widens DATE to datetime64)
            F.date_format("day", "yyyy-MM-dd").alias("split_day"),
            F.col("t").alias("split_t"),
            "gap_milli",
        )
        .orderBy("event_type")
    )


CHANGEPOINT_SQL = f"""
WITH {DAILY_CTE}, pre AS (
  SELECT event_type, day,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS t,
         CAST(SUM(y) OVER w AS BIGINT) AS ps,
         CAST(SUM(y) OVER (PARTITION BY event_type) AS BIGINT) AS s_all,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
), scored AS (
  SELECT event_type, day, t, n_days,
         ABS(ps * (n_days - t) - (s_all - ps) * t) * {_CP_SCALE} AS num,
         t * (n_days - t) AS den
  FROM pre WHERE t < n_days
), g AS (
  SELECT event_type, day, t, n_days,
         CAST((num - ((num % den) + den) % den) // den AS BIGINT)
           AS gap_milli
  FROM scored
)
SELECT event_type, n_days, strftime(day, '%Y-%m-%d') AS split_day,
       t AS split_t, gap_milli
FROM g
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
          ORDER BY gap_milli DESC, t) = 1
ORDER BY event_type
"""


def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: users count
    toward step k only if the step-k event happened strictly AFTER their
    step-(k-1) entry time.  Each stage is one filtered min-aggregate on
    user_id joined to the previous stage's user-level relation -- k
    user-keyed shuffles for a k-step funnel, never an event-level
    self-join, so the plan is the one you'd run on a 100 TB event log.
    Conversion is exact integer milli-rate against step 1."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        s1.agg(F.count("*").alias("n_users"))
        .select(F.lit(1).alias("step_idx"), F.lit("view").alias("step"), "n_users")
        .unionAll(
            s2.agg(F.count("*").alias("n_users")).select(
                F.lit(2).alias("step_idx"),
                F.lit("click").alias("step"),
                "n_users",
            )
        )
        .unionAll(
            s3.agg(F.count("*").alias("n_users")).select(
                F.lit(3).alias("step_idx"),
                F.lit("purchase").alias("step"),
                "n_users",
            )
        )
    )
    first = counts.filter(F.col("step_idx") == 1).select(
        F.col("n_users").alias("n_first")
    )
    return (
        counts.crossJoin(F.broadcast(first))  # 1-row constant carrier
        .select(
            "step_idx",
            "step",
            "n_users",
            F.expr("(n_users * 1000) div nullif(n_first, 0)").alias(
                "conv_milli"
            ),
        )
        .orderBy("step_idx")
    )


FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
),
c AS (
  SELECT 1 AS step_idx, 'view' AS step,
         CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
  UNION ALL
  SELECT 2, 'click', CAST(COUNT(*) AS BIGINT) FROM s2
  UNION ALL
  SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT) FROM s3
)
SELECT step_idx, step, n_users,
       (n_users * 1000) // NULLIF((SELECT n_users FROM c WHERE step_idx = 1), 0)
         AS conv_milli
FROM c ORDER BY step_idx
"""


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by first-seen date, then
    for day offsets 0..7 the count of cohort members active that day and
    the exact milli-rate against cohort size.  Shapes: one user-keyed
    min-aggregate (cohort), one distinct on (user, day) -- both
    map-side-combinable -- one user-keyed join, and a broadcast of the
    tiny per-cohort size relation.  No event-level self-join, no window
    over data."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = ev.distinct()
    cohort_sizes = first.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_n")
    )
    joined = (
        act.join(first, "user_id")
        .withColumn(
            "offset_days",
            F.datediff(F.col("day"), F.col("cohort_day")).cast("long"),
        )
        .filter(F.col("offset_days") <= 7)
    )
    return (
        joined.groupBy("cohort_day", "offset_days")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(cohort_sizes), "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "offset_days",
            "n_active",
            "cohort_n",
            F.expr("(n_active * 1000) div cohort_n").alias("retention_milli"),
        )
        .orderBy("cohort_day", "offset_days")
    )


RETENTION_SQL = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day FROM events
),
first AS (
  SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY 1
),
act AS (SELECT DISTINCT user_id, day FROM ev),
sizes AS (
  SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_n
  FROM first GROUP BY 1
),
cells AS (
  SELECT f.cohort_day,
         CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS offset_days,
         CAST(COUNT(*) AS BIGINT) AS n_active
  FROM act a JOIN first f USING (user_id)
  WHERE date_diff('day', f.cohort_day, a.day) <= 7
  GROUP BY 1, 2
)
SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day, c.offset_days,
       c.n_active, s.cohort_n,
       (c.n_active * 1000) // s.cohort_n AS retention_milli
FROM cells c JOIN sizes s USING (cohort_day)
ORDER BY cohort_day, offset_days
"""


CURATION_BOILER = (
    "shared boilerplate notice repeated verbatim across many corpus "
    "documents here"
)


def curation_full_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 end-to-end curation (plans/curation.py::curate_full):
    exact dedup -> sub-document boilerplate excision -> Gopher top-2-gram
    gate -> decontamination -> token floor -> packing.  The planted
    corpus carries all four defect classes: verbatim copies (exact-dedup
    prey), a 10-token boilerplate sentence appended to every 5th document
    (sub-document excision prey), a looping 'spam ham' document whose
    unique spacer tokens defeat 8-gram excision but whose top 2-gram
    dominates (repetition-gate prey -- the only stage that catches it),
    and eval-set twins (decontamination prey)."""
    from ..plans.curation import curate_full

    docs = _tspread(spark, sf_dir, "documents").select("doc_id", "text")
    eval_docs = docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 340)
    )
    base = docs.filter(F.col("doc_id") < 300).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" " + CURATION_BOILER)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    train = base.unionAll(
        docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 320))
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.expr(
                "substring(text, 1, cast(floor(length(text)*0.8) as int))"
            ).alias("text"),
        )
    ).unionAll(
        base.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 200000).alias("doc_id"), "text"
        )
    ).unionAll(
        spark.range(1).select(
            F.lit(900000).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(30)),
                    lambda i: F.concat(
                        F.lit("spam ham u"), i.cast("string")
                    ),
                ),
                " ",
            ).alias("text"),
        )
    )
    return curate_full(
        train, eval_docs, span_n=8, min_tokens=20, pack_budget=PACK_BUDGET
    ).orderBy("doc_id")


def _curation_full_sql() -> str:
    from ..operators.text import BPE_PATTERN

    pat = BPE_PATTERN.replace("'", "''")
    return f"""
WITH eval_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id >= 300 AND doc_id < 340
),
base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' {CURATION_BOILER}'
              ELSE text END AS text
  FROM documents WHERE doc_id < 300
),
train AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         substring(text, 1, CAST(FLOOR(LENGTH(text)*0.8) AS INT)) AS text
  FROM documents WHERE doc_id >= 300 AND doc_id < 320
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text FROM base WHERE doc_id < 20
  UNION ALL
  SELECT 900000 AS doc_id,
         array_to_string(['spam ham u' || CAST(i AS VARCHAR)
                          FOR i IN generate_series(1, 30)], ' ') AS text
),
dedup AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM train
  ) WHERE rn = 1
),
toks8 AS (SELECT doc_id, text, {_TOKS_SQL} AS tk FROM dedup),
ps AS (
  SELECT doc_id,
         UNNEST(generate_series(1, len(tk) - 7)) AS pos,
         UNNEST([substr(md5(array_to_string(tk[i:i+7], ' ')), 1, 16)
                 FOR i IN generate_series(1, len(tk) - 7)]) AS shingle
  FROM toks8 WHERE len(tk) >= 8
),
rep AS (SELECT shingle FROM ps GROUP BY shingle HAVING COUNT(*) >= 2),
hits AS (SELECT doc_id, pos FROM ps WHERE shingle IN (SELECT shingle FROM rep)),
lagged AS (
  SELECT doc_id, pos,
         LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM hits
),
isl AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM lagged
),
spans AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + 8 AS e
  FROM isl GROUP BY doc_id, grp
),
span_lists AS (
  SELECT doc_id, list({{'s': s, 'e': e}}) AS sp FROM spans GROUP BY doc_id
),
rebuilt AS (
  SELECT t.doc_id,
         CASE WHEN l.doc_id IS NULL THEN t.text
              ELSE COALESCE(array_to_string(
                [t.tk[p] FOR p IN generate_series(1, len(t.tk))
                 IF len(list_filter(l.sp,
                       x -> p >= x.s AND p < x.e)) = 0], ' '), '')
         END AS text
  FROM toks8 t LEFT JOIN span_lists l ON l.doc_id = t.doc_id
),
toks2 AS (SELECT doc_id, text, {_TOKS_SQL} AS tk FROM rebuilt),
grams AS (
  SELECT doc_id, UNNEST([array_to_string(tk[i:i+1], ' ')
                         FOR i IN generate_series(1, len(tk) - 1)]) AS gram
  FROM toks2
),
pg AS (SELECT doc_id, gram, COUNT(*) AS gn FROM grams GROUP BY ALL),
rep2 AS (
  SELECT doc_id, CAST(SUM(gn) AS BIGINT) AS n_grams,
         CAST(MAX(gn) AS BIGINT) AS top FROM pg GROUP BY doc_id
),
keepers AS (
  SELECT t.doc_id, t.text
  FROM toks2 t LEFT JOIN rep2 r ON r.doc_id = t.doc_id
  WHERE COALESCE(r.top, 0) * 5 <= COALESCE(r.n_grams, 0)
),
tr_sh AS ({_sql_shingle_rows('keepers')}),
ev_sh AS ({_sql_shingle_rows('eval_docs', 'eval_id')}),
contaminated AS (
  SELECT DISTINCT doc_id FROM (
    SELECT t.doc_id, e.eval_id
    FROM tr_sh t JOIN ev_sh e ON t.shingle = e.shingle
    GROUP BY t.doc_id, e.eval_id
    HAVING COUNT(*) >= 2
  )
),
clean AS (
  SELECT k.doc_id, k.text FROM keepers k
  WHERE k.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
kept AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{pat}')) AS n_bpe_tokens
  FROM clean
  WHERE len(regexp_extract_all(text, '{pat}')) >= 20
),
c AS (
  SELECT doc_id, n_bpe_tokens,
         CAST(SUM(n_bpe_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM kept
)
SELECT doc_id, n_bpe_tokens,
       cum - n_bpe_tokens AS prefix_tokens,
       (cum - n_bpe_tokens) // {PACK_BUDGET} AS bin_id,
       (cum - n_bpe_tokens) % {PACK_BUDGET} AS offset_in_bin
FROM c ORDER BY doc_id
"""


def curation_incremental_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest curation end-to-end
    (plans/curation.py::curate_incremental): an arriving batch planted
    with five defect classes, each caught by exactly one batch-vs-corpus
    stage -- verbatim corpus copies (exact anti-join), 80%-prefix twins
    of corpus docs (incremental LSH), corpus-prefix + unique-filler docs
    (incremental span excision: the borrowed prefix is cut, the doc
    survives excised), eval-set twins (decontamination), and 30-char
    stubs (token floor) -- plus wholly-novel docs that must pass
    untouched.  The corpus itself is never re-emitted; the oracle
    replays all five stages in pipeline order, and content_md5 is over
    post-excision text so the stage-3 rewrite is value-checked."""
    from ..plans.curation import curate_incremental

    docs = _tspread(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 300)
    eval_docs = docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 340)
    )
    prefix80 = "substring(text, 1, cast(floor(length(text)*0.8) as int))"

    # expression strings throughout (r15): the Column-API form of this
    # six-branch planted batch cost ~200 py4j round trips per build
    # (three builds per bench entry); each branch is now one selectExpr.
    # Same expressions, same rows.
    def filler(tag: str, shift: int, count: int) -> str:
        return (
            f"array_join(transform(sequence(1, {count}),"
            f" i -> concat('{tag}', CAST(doc_id + {shift} AS STRING),"
            " 'x', CAST(i AS STRING))), ' ')"
        )

    batch = (
        docs.filter("doc_id < 10")
        .selectExpr("doc_id + 200000 AS doc_id", "text")
        .unionAll(
            docs.filter("doc_id >= 10 AND doc_id < 25")
            .selectExpr("doc_id + 100000 AS doc_id", f"{prefix80} AS text")
        )
        .unionAll(
            # two-step select: a single select would resolve the
            # filler's doc_id against the LATERAL alias (doc_id+300000)
            # and double-shift the planted token ids
            docs.filter("doc_id >= 25 AND doc_id < 35")
            .selectExpr(
                "doc_id",
                "concat(substring(text, 1, 80), ' ', "
                + filler("u", 300000, 40)
                + ") AS text",
            )
            .selectExpr("doc_id + 300000 AS doc_id", "text")
        )
        .unionAll(
            docs.filter("doc_id >= 300 AND doc_id < 310")
            .selectExpr("doc_id + 400000 AS doc_id", f"{prefix80} AS text")
        )
        .unionAll(
            docs.filter("doc_id >= 50 AND doc_id < 55")
            .selectExpr(
                "doc_id + 500000 AS doc_id",
                "substring(text, 1, 30) AS text",
            )
        )
        .unionAll(
            docs.filter("doc_id >= 60 AND doc_id < 75")
            .selectExpr("doc_id", filler("w", 600000, 60) + " AS text")
            .selectExpr("doc_id + 600000 AS doc_id", "text")
        )
    )
    return curate_incremental(batch, corpus, eval_docs).orderBy("doc_id")


def _curation_incremental_sql() -> str:
    from ..operators.text import BPE_PATTERN

    pat = BPE_PATTERN.replace("'", "''")
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
eval_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id >= 300 AND doc_id < 340
),
batch AS (
  SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id < 10
  UNION ALL
  SELECT doc_id + 100000,
         substring(text, 1, CAST(FLOOR(LENGTH(text)*0.8) AS INT))
  FROM documents WHERE doc_id >= 10 AND doc_id < 25
  UNION ALL
  SELECT doc_id + 300000,
         substring(text, 1, 80) || ' ' ||
         array_to_string(
           ['u' || CAST(doc_id + 300000 AS VARCHAR) || 'x'
                || CAST(i AS VARCHAR) FOR i IN generate_series(1, 40)], ' ')
  FROM documents WHERE doc_id >= 25 AND doc_id < 35
  UNION ALL
  SELECT doc_id + 400000,
         substring(text, 1, CAST(FLOOR(LENGTH(text)*0.8) AS INT))
  FROM documents WHERE doc_id >= 300 AND doc_id < 310
  UNION ALL
  SELECT doc_id + 500000, substring(text, 1, 30)
  FROM documents WHERE doc_id >= 50 AND doc_id < 55
  UNION ALL
  SELECT doc_id + 600000,
         array_to_string(
           ['w' || CAST(doc_id + 600000 AS VARCHAR) || 'x'
                || CAST(i AS VARCHAR) FOR i IN generate_series(1, 60)], ' ')
  FROM documents WHERE doc_id >= 60 AND doc_id < 75
),
b1 AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text, md5(text) AS h,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM batch
  ) WHERE rn = 1 AND h NOT IN (SELECT md5(text) FROM corpus)
),
comb AS (SELECT * FROM b1 UNION ALL SELECT * FROM corpus),
toksj AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM comb),
sets AS (
  SELECT doc_id, list_distinct(
    [array_to_string(tk[i:i+2], ' ')
     FOR i IN generate_series(1, greatest(len(tk) - 2, 1))]) AS sh
  FROM toksj
),
shrows AS (SELECT doc_id, UNNEST(sh) AS shingle FROM sets),
sig AS (
  SELECT doc_id, p.perm AS perm,
         MIN(md5(CAST(p.perm AS VARCHAR) || '|' || shingle)) AS minhash
  FROM shrows, LATERAL (SELECT UNNEST(generate_series(0, 15)) AS perm) p
  GROUP BY doc_id, p.perm
),
bands AS (
  SELECT doc_id, perm // 4 AS band,
         string_agg(minhash, ',' ORDER BY perm) AS band_sig
  FROM sig GROUP BY doc_id, perm // 4
),
cand AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS existing_id
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
  WHERE a.doc_id >= 100000 AND b.doc_id < 100000
),
flagged AS (
  SELECT DISTINCT c.new_id AS doc_id
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.new_id
  JOIN sets sb ON sb.doc_id = c.existing_id
  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
          / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
        >= 0.5
),
b2 AS (
  SELECT doc_id, text FROM b1
  WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
),
sp_src AS (SELECT * FROM b2 UNION ALL SELECT * FROM corpus),
toks8 AS (SELECT doc_id, text, {_TOKS_SQL} AS tk FROM sp_src),
ps AS (
  SELECT doc_id,
         UNNEST(generate_series(1, len(tk) - 7)) AS pos,
         UNNEST([substr(md5(array_to_string(tk[i:i+7], ' ')), 1, 16)
                 FOR i IN generate_series(1, len(tk) - 7)]) AS shingle
  FROM toks8 WHERE len(tk) >= 8
),
rep AS (SELECT shingle FROM ps GROUP BY shingle HAVING COUNT(*) >= 2),
hits AS (
  SELECT doc_id, pos FROM ps
  WHERE shingle IN (SELECT shingle FROM rep) AND doc_id >= 100000
),
lagged AS (
  SELECT doc_id, pos,
         LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM hits
),
isl AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM lagged
),
spans AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + 8 AS e
  FROM isl GROUP BY doc_id, grp
),
span_lists AS (
  SELECT doc_id, list({{'s': s, 'e': e}}) AS sp FROM spans GROUP BY doc_id
),
rebuilt AS (
  SELECT t.doc_id,
         CASE WHEN l.doc_id IS NULL THEN t.text
              ELSE COALESCE(array_to_string(
                [t.tk[p] FOR p IN generate_series(1, len(t.tk))
                 IF len(list_filter(l.sp,
                       x -> p >= x.s AND p < x.e)) = 0], ' '), '')
         END AS text
  FROM toks8 t LEFT JOIN span_lists l ON l.doc_id = t.doc_id
  WHERE t.doc_id >= 100000
),
tr_sh AS ({_sql_shingle_rows('rebuilt')}),
ev_sh AS ({_sql_shingle_rows('eval_docs', 'eval_id')}),
contaminated AS (
  SELECT DISTINCT doc_id FROM (
    SELECT t.doc_id, e.eval_id
    FROM tr_sh t JOIN ev_sh e ON t.shingle = e.shingle
    GROUP BY t.doc_id, e.eval_id
    HAVING COUNT(*) >= 2
  )
),
clean AS (
  SELECT doc_id, text FROM rebuilt
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)
         AS n_bpe_tokens,
       md5(text) AS content_md5
FROM clean
WHERE len(regexp_extract_all(text, '{pat}')) >= 20
ORDER BY doc_id
"""


def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows executed AS A STREAM with the native
    ``session_window`` stateful operator (streaming/windows.py::
    session_windows), complete-mode memory sink.  The oracle rebuilds the
    same sessions with the lag/running-sum islands formulation at exact
    microsecond precision."""
    from ..streaming.windows import session_windows

    ev = _events_stream(spark, sf_dir)
    name, _q = _run_to_memory(
        session_windows(ev), "complete", "session_win"
    )
    return spark.table(name).orderBy("user_id", "session_start")


STREAM_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, "value",
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts, "value",
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR("value"*100) AS BIGINT)) AS BIGINT) AS value_cents
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""




def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the events STREAM joins the static
    customer dimension (broadcast -- the dimension ships to every task
    once per micro-batch, the stream side never shuffles for the join),
    then a watermarked aggregation by market segment.  The standard
    "enrich events with reference data" streaming topology."""
    ev = _events_stream(spark, sf_dir)
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = ev.join(F.broadcast(dim), "user_id")
    agg = joined.groupBy("c_mktsegment", "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
    )
    name, _q = _run_to_memory(agg, "complete", "stream_enrich")
    return spark.table(name).orderBy("c_mktsegment", "event_type")


STREAM_ENRICH_SQL = """
SELECT c.c_mktsegment, e.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(e."value"*100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment, e.event_type
ORDER BY c.c_mktsegment, e.event_type
"""


def stream_stream_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked STREAM-STREAM interval join
    (streaming/windows.py::interval_join_streams): two event streams
    derived from the events source (views vs clicks) joined per user with
    the click inside ``[view_ts, view_ts + 4 hours]``, both sides
    watermarked at 2 hours.  This is the impressions-join-clicks topology
    and the one Structured Streaming operator class the engine lacked
    through round 3.  The joined pairs land append-mode in the memory
    sink; the returned aggregation (pairs + exact microsecond lag sum per
    user) runs in batch over the sink so the oracle compares a compact
    deterministic result.  State note: each side buffers only rows newer
    than the other side's watermark minus the 4-hour interval, so state
    is bounded regardless of stream length."""
    from ..streaming.windows import interval_join_streams

    views = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
    )
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    pairs = interval_join_streams(
        views, clicks, "user_id", "view_ts", "click_ts",
        max_delay="4 hours", watermark="2 hours",
    )
    name, _q = _run_to_memory(pairs, "append", "stream_ssjoin")
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(
                F.unix_micros("click_ts") - F.unix_micros("view_ts")
            ).alias("total_lag_us"),
        )
        .orderBy("user_id")
    )


STREAM_SSJOIN_SQL = """
WITH v AS (SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click')
SELECT v.user_id, COUNT(*) AS n_pairs,
       CAST(SUM(epoch_us(c.click_ts) - epoch_us(v.view_ts)) AS BIGINT)
         AS total_lag_us
FROM v JOIN c
  ON v.user_id = c.user_id
 AND c.click_ts >= v.view_ts
 AND c.click_ts <= v.view_ts + INTERVAL 4 HOUR
GROUP BY v.user_id
ORDER BY v.user_id
"""


def json_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source/sink surface: write an events projection out as
    JSONL, read it back with an explicit schema (no inference scan), and
    aggregate.  Timestamps round-trip as ISO strings; integers and event
    types are lossless, so the oracle over the original parquet must agree
    exactly."""
    import hashlib
    import os

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out = os.path.join(tempfile.gettempdir(), f"events_json_{tag}")
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        _cents(F.col("value")).alias("value_cents"),
    )
    ev.write.mode("overwrite").json(out)
    back = spark.read.schema(
        "event_id long, user_id long, event_type string, value_cents long"
    ).json(out)
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value_cents").alias("total_cents"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


JSON_ROUNDTRIP_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR("value"*100) AS BIGINT)) AS BIGINT) AS total_cents,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct sketch: Spark's native
    ``approx_count_distinct`` (rsd 2%) per event type.  The sketch is the
    100 TB path -- fixed ~kB of state per group versus a shuffle of every
    distinct value -- and the companion to the engine's own KMV sketch
    (operators/sketches.py).  Checkability without exactness: the query
    emits the EXACT distinct count plus a boolean asserting the sketch
    landed within 5% of it; the oracle recomputes the exact count and
    expects the boolean TRUE, so a drifting sketch hash-fails the gate."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("_approx"),
        F.countDistinct("user_id").alias("n_users_exact"),
    )
    return agg.select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("_approx") - F.col("n_users_exact"))
            / F.col("n_users_exact")
            <= 0.05
        ).alias("sketch_within_5pct"),
    ).orderBy("event_type")


HLL_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users_exact,
       TRUE AS sketch_within_5pct
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling (operators/quality.py::profile_table): per-column
    null/distinct/min/max statistics for the documents table in one
    aggregation pass, exact-distinct mode so the oracle can mirror it.
    Doubles are excluded by column choice: float-to-string rendering is
    not engine-portable."""
    from ..operators.quality import profile_table

    docs = _tspread(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    return profile_table(docs, exact=True)


def _profile_sql() -> str:
    cols = ["doc_id", "lang", "source", "n_chars"]
    parts = [
        f"""
SELECT '{c}' AS column_name,
       COUNT(*) AS n_rows,
       COUNT({c}) AS n_nonnull,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_value,
       CAST(MAX({c}) AS VARCHAR) AS max_value
FROM documents"""
        for c in cols
    ]
    return " UNION ALL ".join(parts) + " ORDER BY column_name"


def dq_events_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract validation (operators/quality.py::validate_expectations):
    row-level expectations over events evaluated in one aggregation pass;
    violation counts are the oracle-checked output, so a contract drift in
    either engine surfaces as a hash mismatch."""
    from ..operators.quality import validate_expectations

    ev = _t(spark, sf_dir, "events")
    rules = [
        ("event_id_not_null", F.col("event_id").isNotNull()),
        ("ts_not_null", F.col("ts").isNotNull()),
        ("user_id_positive", F.col("user_id") > 0),
        (
            "event_type_known",
            F.col("event_type").isin(
                "click", "view", "purchase", "error", "login"
            ),
        ),
        ("value_non_negative", F.col("value") >= 0),
    ]
    return validate_expectations(ev, rules)


DQ_EVENTS_SQL = """
WITH agg AS (
  SELECT COUNT(*) AS n_rows,
    SUM(CASE WHEN event_id IS NOT NULL THEN 0 ELSE 1 END) AS event_id_not_null,
    SUM(CASE WHEN ts IS NOT NULL THEN 0 ELSE 1 END) AS ts_not_null,
    SUM(CASE WHEN COALESCE(user_id > 0, FALSE) THEN 0 ELSE 1 END) AS user_id_positive,
    SUM(CASE WHEN COALESCE(event_type IN ('click','view','purchase','error','login'), FALSE)
             THEN 0 ELSE 1 END) AS event_type_known,
    SUM(CASE WHEN COALESCE("value" >= 0, FALSE) THEN 0 ELSE 1 END) AS value_non_negative
  FROM events
), long AS (
  SELECT 'event_id_not_null' AS rule_name, n_rows, event_id_not_null AS n_violations FROM agg
  UNION ALL SELECT 'ts_not_null', n_rows, ts_not_null FROM agg
  UNION ALL SELECT 'user_id_positive', n_rows, user_id_positive FROM agg
  UNION ALL SELECT 'event_type_known', n_rows, event_type_known FROM agg
  UNION ALL SELECT 'value_non_negative', n_rows, value_non_negative FROM agg
)
SELECT rule_name, n_rows, CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS passed
FROM long ORDER BY rule_name
"""


def map_scalar_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-scalar surface: per user, an event_type -> count map built with
    ``map_from_entries`` over a sorted entry list, then consumed with
    ``size`` / ``map_keys`` / ``element_at`` (null on absent key) /
    ``map_values`` + ``aggregate``.  The oracle reproduces every derived
    column relationally, so the comparison stays engine-portable while the
    Spark side genuinely exercises the map type."""
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return m.select(
        "user_id",
        F.size("m").cast("long").alias("n_types"),
        F.array_join(F.map_keys("m"), ",").alias("types_csv"),
        F.coalesce(F.element_at("m", F.lit("click")), F.lit(0)).alias(
            "n_clicks"
        ),
        F.coalesce(F.element_at("m", F.lit("purchase")), F.lit(0)).alias(
            "n_purchases"
        ),
        F.aggregate(
            F.map_values("m"), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("n_total"),
    ).orderBy("user_id")


MAP_SCALAR_SQL = """
SELECT user_id,
       COUNT(DISTINCT event_type) AS n_types,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv,
       COUNT(*) FILTER (WHERE event_type = 'click') AS n_clicks,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
       COUNT(*) AS n_total
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (overlapping) event-time windows: 1-hour length, 15-minute
    slide, so every event contributes to exactly 4 windows.  Uses the
    built-in ``F.window(ts, length, slide)`` -- the same operator
    Structured Streaming shares, where the slide grid is what the
    watermark advances over.  The oracle expands the 4-window membership
    explicitly from the epoch-microsecond grid."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
        .orderBy("window_start", "event_type")
    )


SLIDING_SQL = """
WITH k AS (SELECT UNNEST([0, 1, 2, 3]) AS k),
g AS (
  SELECT ts - (epoch_us(ts) % 900000000) * INTERVAL 1 MICROSECOND
            - k.k * INTERVAL 15 MINUTE AS window_start,
         event_type,
         CAST(FLOOR("value"*100) AS BIGINT) AS cents
  FROM events CROSS JOIN k
)
SELECT window_start, event_type, COUNT(*) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS value_cents
FROM g
GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


def bucketed_join_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact-to-fact join (sources/tabular.py::write_bucketed):
    orders and lineitem land as 8-bucket tables hashed on the order key,
    then join WITHOUT a shuffle on either side (the executed plan is
    asserted Exchange-free in tests/test_skew.py) and aggregate per order
    priority.  This is the 100 TB pattern for joins that recur on the same
    key every run: pay the bucketing once at write time, never shuffle the
    fact table again."""
    import hashlib
    import os

    from ..sources.tabular import write_bucketed

    # Stable external location per sf_dir (NOT mkdtemp-per-call): repeated
    # harness runs overwrite the same two table dirs and reuse the same
    # catalog names instead of orphaning a new directory each invocation.
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"bucketed_{tag}")
    for t in ("bq_orders", "bq_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed(
        _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        ),
        "bq_orders",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
        path=os.path.join(base, "orders"),
    )
    write_bucketed(
        _t(spark, sf_dir, "lineitem").select(
            "l_orderkey", _cents(F.col("l_extendedprice")).alias("price_cents")
        ),
        "bq_lineitem",
        ["l_orderkey"],
        8,
        sort_cols=["l_orderkey"],
        path=os.path.join(base, "lineitem"),
    )
    joined = spark.table("bq_orders").join(
        spark.table("bq_lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("price_cents").alias("price_cents"),
        )
        .orderBy("o_orderpriority")
    )


BUCKETED_JOIN_SQL = """
SELECT o.o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice*100) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


def stats_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-database statistics from EXACT integer moments: per order
    priority, the least-squares trend (slope cents/day + intercept) of
    daily revenue over the day number.  Spark's native ``regr_slope``/
    ``covar_samp`` accumulate running float sums (order-dependent, not
    oracle-portable); instead the five sufficient statistics (n, Sx, Sy,
    Sxy, Sxx) are exact BIGINTs from one map-side-combinable aggregation,
    and the closed-form slope/intercept are then two IEEE divisions that
    every engine rounds identically.  This is also the 100 TB shape:
    moments merge associatively across partitions, so a regression over
    any corpus costs one groupBy.

    Magnitude headroom: n*Sxy stays under 2^63 through sf0.1 with ~100x
    to spare; at corpus scales beyond that, shift the x origin per group
    (min day) and/or aggregate dollars instead of cents before the
    moment pass -- same closed form, smaller integers."""
    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.select(
            "o_orderpriority",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1992-01-01").cast("date"),
            ).cast("long").alias("d"),
            _cents(F.col("o_totalprice")).alias("cents"),
        )
        .groupBy("o_orderpriority", "d")
        .agg(F.sum("cents").alias("y"))
    )
    moms = daily.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_days"),
        F.sum("d").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("d") * F.col("y")).alias("sxy"),
        F.sum(F.col("d") * F.col("d")).alias("sxx"),
    )
    n, sx, sy = F.col("n_days"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    den = (n * F.col("sxx") - sx * sx).cast("double")
    slope = num / den
    return moms.select(
        "o_orderpriority",
        "n_days",
        slope.alias("slope_cents_per_day"),
        ((sy.cast("double") - slope * sx.cast("double")) / n.cast("double")).alias(
            "intercept_cents"
        ),
    ).orderBy("o_orderpriority")


LINEAR_TREND_SQL = """
WITH daily AS (
  SELECT o_orderpriority,
         date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS d,
         SUM(CAST(FLOOR(o_totalprice*100) AS BIGINT)) AS y
  FROM orders GROUP BY 1, 2
),
moms AS (
  SELECT o_orderpriority,
         COUNT(*) AS n_days,
         CAST(SUM(d) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(d*y) AS BIGINT) AS sxy,
         CAST(SUM(d*d) AS BIGINT) AS sxx
  FROM daily GROUP BY 1
)
SELECT o_orderpriority, n_days,
       CAST(n_days*sxy - sx*sy AS DOUBLE) / CAST(n_days*sxx - sx*sx AS DOUBLE)
         AS slope_cents_per_day,
       (CAST(sy AS DOUBLE)
          - (CAST(n_days*sxy - sx*sy AS DOUBLE)
             / CAST(n_days*sxx - sx*sx AS DOUBLE)) * CAST(sx AS DOUBLE))
         / CAST(n_days AS DOUBLE) AS intercept_cents
FROM moms ORDER BY o_orderpriority
"""


CMS_WIDTH, CMS_DEPTH = 64, 4


def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch (operators/sketches.py::cms_table):
    per-event-type user-frequency sketches of 4x64 counters, probed for
    user ids 0-9, alongside the exact counts and the two CMS guarantee
    booleans (estimate never under-counts; over-count bounded by the
    colliding mass).  The sketch is md5-bucketed, so DuckDB reproduces
    every counter bit-for-bit -- the same engine-portability trick as the
    KMV sketch, applied to frequency estimation."""
    from ..operators.sketches import cms_estimates, cms_table

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.col("event_type").alias("g"),
        F.col("user_id").cast("string").alias("item"),
    )
    cms = cms_table(base, "g", "item", width=CMS_WIDTH, depth=CMS_DEPTH)
    probes = (
        base.select("g").distinct()
        .crossJoin(  # 5 x 10 constant probe grid, not a data cartesian
            spark.range(10).select(F.col("id").cast("string").alias("item"))
        )
    )
    est = cms_estimates(cms, probes, width=CMS_WIDTH, depth=CMS_DEPTH)
    exact = base.groupBy("g", "item").agg(F.count("*").alias("_n"))
    totals = base.groupBy("g").agg(F.count("*").alias("_ng"))
    out = (
        est.join(exact, ["g", "item"], "left")
        .join(F.broadcast(totals), "g")
        .select(
            F.col("g").alias("event_type"),
            F.col("item").cast("long").alias("user_id"),
            F.coalesce("_n", F.lit(0)).alias("exact_n"),
            "cms_est",
            (F.col("cms_est") >= F.coalesce("_n", F.lit(0))).alias(
                "never_undercounts"
            ),
            (
                F.col("cms_est")
                <= F.coalesce("_n", F.lit(0))
                + F.floor(F.col("_ng") * 3 / CMS_WIDTH).cast("long")
            ).alias("overcount_bounded"),
        )
    )
    return out.orderBy("event_type", "user_id")


def _sql_hex13_mod(expr: str, mod: int) -> str:
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr({expr}, {i}, 1)) - 1) "
        f"* {16 ** (13 - i)}"
        for i in range(1, 14)
    )
    return f"(({digits}) % {mod})"


CMS_SQL = f"""
WITH base AS (
  SELECT event_type AS g, CAST(user_id AS VARCHAR) AS item FROM events
),
rows_d AS (
  SELECT g, item, UNNEST(generate_series(0, {CMS_DEPTH - 1})) AS d FROM base
),
cms AS (
  SELECT g, d,
         {_sql_hex13_mod("substr(md5(CAST(d AS VARCHAR) || '|' || item), 1, 13)", CMS_WIDTH)}
           AS bucket,
         COUNT(*) AS cnt
  FROM rows_d GROUP BY ALL
),
probes AS (
  SELECT g, CAST(i AS VARCHAR) AS item
  FROM (SELECT DISTINCT g FROM base), (SELECT UNNEST(generate_series(0, 9)) AS i)
),
probed AS (
  SELECT g, item, UNNEST(generate_series(0, {CMS_DEPTH - 1})) AS d FROM probes
),
pb AS (
  SELECT g, item, d,
         {_sql_hex13_mod("substr(md5(CAST(d AS VARCHAR) || '|' || item), 1, 13)", CMS_WIDTH)}
           AS bucket
  FROM probed
),
est AS (
  SELECT pb.g, pb.item,
         CAST(MIN(COALESCE(cms.cnt, 0)) AS BIGINT) AS cms_est
  FROM pb LEFT JOIN cms
    ON cms.g = pb.g AND cms.d = pb.d AND cms.bucket = pb.bucket
  GROUP BY pb.g, pb.item
),
exact AS (SELECT g, item, COUNT(*) AS n FROM base GROUP BY g, item),
totals AS (SELECT g, COUNT(*) AS ng FROM base GROUP BY g)
SELECT est.g AS event_type, CAST(est.item AS BIGINT) AS user_id,
       CAST(COALESCE(exact.n, 0) AS BIGINT) AS exact_n,
       est.cms_est,
       est.cms_est >= COALESCE(exact.n, 0) AS never_undercounts,
       est.cms_est <= COALESCE(exact.n, 0)
         + CAST(FLOOR(totals.ng * 3.0 / {CMS_WIDTH}) AS BIGINT)
         AS overcount_bounded
FROM est
LEFT JOIN exact ON exact.g = est.g AND exact.item = est.item
JOIN totals ON totals.g = est.g
ORDER BY event_type, user_id
"""


def sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-quantile sketch: ``percentile_approx`` (Greenwald-Khanna
    variant, mergeable bounded state -- the 100 TB path where the exact
    percentile's full sort/shuffle of every value is not) per event type.
    Same checkability pattern as ``sketch_hll_distinct``: emit the EXACT
    p50/p90 and booleans asserting the sketch landed within the accuracy
    bound, so oracle comparison is exact while the sketch is still the
    thing being exercised."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    ranked = (
        ev.select("event_type", cents.alias("cents"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("cents")
            ),
        )
        .withColumn(
            "n", F.count("*").over(Window.partitionBy("event_type"))
        )
    )
    # type-1 (discrete) quantile: the value at rank ceil(p*n).  Integer
    # domain + an explicit rank definition = bit-identical across engines
    # (interpolating forms like percentile/quantile_cont are NOT: their
    # a+g*(b-a) vs (1-g)*a+g*b orderings differ in the last ulp).  The
    # per-type window is the exact VERIFIER (5 fat partitions); the sketch
    # under test is the scale path.
    exact = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == F.ceil(F.col("n") * 0.5), F.col("cents"))).alias("p50_cents"),
        F.max(F.when(F.col("rn") == F.ceil(F.col("n") * 0.9), F.col("cents"))).alias("p90_cents"),
        F.count("*").alias("n_events"),
    )
    sketch = ev.groupBy("event_type").agg(
        F.percentile_approx(cents, [0.5, 0.9], 1000).alias("_approx")
    )
    joined = exact.join(F.broadcast(sketch), "event_type")
    tol50 = F.abs(F.col("p50_cents")) * 0.05 + 50.0
    tol90 = F.abs(F.col("p90_cents")) * 0.05 + 50.0
    return joined.select(
        "event_type",
        "n_events",
        "p50_cents",
        "p90_cents",
        (
            F.abs(F.element_at("_approx", 1) - F.col("p50_cents")) <= tol50
        ).alias("p50_sketch_ok"),
        (
            F.abs(F.element_at("_approx", 2) - F.col("p90_cents")) <= tol90
        ).alias("p90_sketch_ok"),
    ).orderBy("event_type")


QUANTILE_SKETCH_SQL = """
WITH ranked AS (
  SELECT event_type,
         CAST(FLOOR("value"*100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY CAST(FLOOR("value"*100) AS BIGINT)) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_events,
       MAX(CASE WHEN rn = CEIL(n * 0.5) THEN cents END) AS p50_cents,
       MAX(CASE WHEN rn = CEIL(n * 0.9) THEN cents END) AS p90_cents,
       TRUE AS p50_sketch_ok,
       TRUE AS p90_sketch_ok
FROM ranked
GROUP BY event_type
ORDER BY event_type
"""


def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL entrypoint: per-priority, per-status and
    grand-total aggregates in ONE pass (the general form of rollup/cube),
    with GROUPING() ids disambiguating the null produced by the set from a
    null in the data."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               GROUPING(o_orderpriority) AS g_priority,
               GROUPING(o_orderstatus) AS g_status,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice*100) AS BIGINT)) AS BIGINT)
                 AS price_cents
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY g_priority, g_status, o_orderpriority, o_orderstatus
        """
    )


GROUPING_SETS_SQL = """
SELECT o_orderpriority, o_orderstatus,
       GROUPING(o_orderpriority) AS g_priority,
       GROUPING(o_orderstatus) AS g_status,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice*100) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
ORDER BY g_priority, g_status, o_orderpriority, o_orderstatus
"""


def stats_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group statistics: the 10%-trimmed mean of event value
    per event_type -- drop the lowest and highest decile by a total
    (cents, event_id) order, average the core in exact integer
    micro-units.  The rank is a per-group window (partitioned, never
    global); every aggregate is a BIGINT so the result is identical in
    any order.  Trimming by rank rather than percentile value keeps the
    cut deterministic under ties."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr("CAST(FLOOR(value * 100) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    ranked = ev.withColumn("rk", F.row_number().over(w)).withColumn(
        "cnt", F.count("*").over(Window.partitionBy("event_type"))
    )
    lo = F.expr("cnt div 10")
    kept = ranked.filter((F.col("rk") > lo) & (F.col("rk") <= F.col("cnt") - lo))
    return (
        kept.groupBy("event_type")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("cents").alias("cents_lo"),
            F.max("cents").alias("cents_hi"),
            # explicit floor-div (pmod form): Spark div truncates toward
            # zero, DuckDB // floors -- they differ on negative sums, and
            # testdata regenerates per round
            F.expr(
                "(SUM(cents) * 1000"
                " - pmod(SUM(cents) * 1000, COUNT(*))) div COUNT(*)"
            ).alias("trimmed_mean_milli"),
        )
        .orderBy("event_type")
    )


TRIMMED_MEAN_SQL = """
WITH ev AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events
), ranked AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY cents, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS cnt
  FROM ev
), kept AS (
  SELECT event_type, cents FROM ranked
  WHERE rk > cnt // 10 AND rk <= cnt - cnt // 10
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(MIN(cents) AS BIGINT) AS cents_lo,
       CAST(MAX(cents) AS BIGINT) AS cents_hi,
       CAST((SUM(cents) * 1000) // COUNT(*) AS BIGINT) AS trimmed_mean_milli
FROM kept GROUP BY event_type ORDER BY event_type
"""


def stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of documents.lang vs source, in
    exact integer arithmetic: the per-cell term (o - e)^2 / e rewrites
    as (o*T - r*c)^2 / (T*r*c) over BIGINT contingency counts, floored
    to micro-units per cell BEFORE the sum, so the statistic is the
    identical BIGINT on every engine and in any aggregation order.
    Zero cells (a lang x source combo with no documents) contribute
    r*c/T and are materialized via the marginals grid -- a
    constant-size cross join of the two tiny marginal relations, never
    the corpus.  One map-side-combinable corpus aggregate; everything
    after is marginal-sized."""
    docs = _tspread(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count("*").alias("o"))
    rows_m = cells.groupBy("lang").agg(F.sum("o").alias("r"))
    cols_m = cells.groupBy("source").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("t"))
    grid = (
        rows_m.crossJoin(cols_m)  # marginals grid: |langs| x |sources|
        .join(cells, ["lang", "source"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang", "source", "r", "c", "t",
            F.coalesce(F.col("o"), F.lit(0)).cast("long").alias("o"),
        )
    )
    term = F.expr("(1000000 * (o*t - r*c) * (o*t - r*c)) div (t * r * c)")
    return grid.agg(
        F.max("t").alias("n_docs"),
        F.count("*").alias("n_cells"),
        (
            (F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1)
        ).alias("dof"),
        F.sum(term).alias("chi2_micro"),
    )


CHI_SQUARE_SQL = """
WITH cells AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
  FROM documents GROUP BY lang, source
), rm AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY lang),
cm AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY source),
tt AS (SELECT CAST(SUM(o) AS BIGINT) AS t FROM cells),
grid AS (
  SELECT rm.lang, cm.source, rm.r, cm.c, tt.t,
         CAST(COALESCE(cells.o, 0) AS BIGINT) AS o
  FROM rm CROSS JOIN cm CROSS JOIN tt
  LEFT JOIN cells ON cells.lang = rm.lang AND cells.source = cm.source
)
SELECT CAST(MAX(t) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST((COUNT(DISTINCT lang) - 1) * (COUNT(DISTINCT source) - 1)
            AS BIGINT) AS dof,
       CAST(SUM((1000000 * (o*t - r*c) * (o*t - r*c)) // (t * r * c))
            AS BIGINT) AS chi2_micro
FROM grid
"""


def events_concurrency_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval concurrency
    (operators/windows.py::concurrency_peaks): every event opens a
    10-minute interval; per-day peak of the running +1/-1 boundary sum,
    with the cross-midnight level carried via a days-sized lag.  The
    global running sum is the range-partitioned two-level prefix sum --
    never a single-partition window over the event stream."""
    from ..operators.windows import concurrency_peaks

    peaks = concurrency_peaks(_t(spark, sf_dir, "events"))
    return peaks.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "peak_concurrency",
        "n_starts",
    ).orderBy("day")


CONCURRENCY_SQL = """
WITH pts AS (
  SELECT ts AS pt, 1 AS delta, event_id AS bid FROM events
  UNION ALL
  SELECT ts + INTERVAL 10 MINUTE, -1, event_id FROM events
), run AS (
  SELECT pt, delta, bid,
         CAST(SUM(delta) OVER (ORDER BY pt, delta, bid
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
  FROM pts
), daily AS (
  SELECT CAST(pt AS DATE) AS day,
         CAST(MAX(conc) AS BIGINT) AS in_day_max,
         CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_starts
  FROM run GROUP BY day
), dl AS (
  SELECT CAST(pt AS DATE) AS day, CAST(conc AS BIGINT) AS day_last
  FROM run
  QUALIFY ROW_NUMBER() OVER (PARTITION BY CAST(pt AS DATE)
            ORDER BY pt DESC, delta DESC, bid DESC) = 1
)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       GREATEST(d.in_day_max,
                COALESCE(LAG(dl.day_last) OVER (ORDER BY d.day), 0))
         AS peak_concurrency,
       d.n_starts
FROM daily d JOIN dl ON d.day = dl.day ORDER BY d.day
"""


def stats_spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between day number and daily revenue,
    per event_type: is the metric monotonically trending, robust to
    outliers the Pearson slope (stats_linear_trend) is sensitive to.
    Day ranks and value ranks are ``row_number`` over per-group TOTAL
    orders (ties broken by day), so both rank vectors are exact integer
    permutations and the classic closed form
    ``rho = 1 - 6*sum(d^2) / (n^3 - n)`` is an exact rational --
    emitted as ``rho_ppm`` via the pmod floor-division device (BOTH
    engines' integer division truncates toward zero -- Spark ``div``
    and DuckDB ``//`` alike -- so each side subtracts the non-negative
    remainder first; rho can be negative).  No libm anywhere
    (engine-conventions memo).

    Scale shape: one map-side-combinable daily rollup, then per-group
    (never global) windows over the days-sized relation, then one
    group-sized aggregate.  Magnitude headroom: with n days per group,
    the largest intermediate is ``6e6 * sum(d^2) <= 2e6 * n^3``; BIGINT
    holds through n ~= 16k days (~45 years of dailies) with room to
    spare -- beyond that, compute rho per year and Fisher-combine."""
    daily = _daily_cents(spark, sf_dir)
    wx = Window.partitionBy("event_type").orderBy("day")
    wy = Window.partitionBy("event_type").orderBy("y", "day")
    ranked = daily.select(
        "event_type",
        F.row_number().over(wx).cast("long").alias("rx"),
        F.row_number().over(wy).cast("long").alias("ry"),
    )
    d2 = (F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))
    moms = ranked.groupBy("event_type").agg(
        F.count("*").alias("n_days"), F.sum(d2).alias("sd2")
    )
    n = F.col("n_days")
    den = n * n * n - n
    num = F.lit(1000000) * den - F.lit(6000000) * F.col("sd2")
    # BIGINT `div` end-to-end (a float `/` is only exact below 2^53 and
    # the engines round a double->BIGINT cast differently)
    fin = moms.select(
        "event_type", "n_days", "sd2", num.alias("_num"), den.alias("_den")
    )
    rho = F.expr("(_num - pmod(_num, _den)) div _den").cast("long")
    return fin.select(
        "event_type", "n_days", "sd2", rho.alias("rho_ppm")
    ).orderBy("event_type")


SPEARMAN_SQL = f"""
WITH {DAILY_CTE}, ranked AS (
  SELECT event_type,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY day) AS BIGINT) AS rx,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY y, day) AS BIGINT) AS ry
  FROM daily
), moms AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM((rx - ry) * (rx - ry)) AS BIGINT) AS sd2
  FROM ranked GROUP BY 1
)
SELECT event_type, n_days, sd2,
       -- explicit FLOOR division: DuckDB's integer // truncates toward
       -- zero (negative rho would round the wrong way); subtract the
       -- non-negative remainder first, same device as the Spark side
       CAST((num - ((num % den) + den) % den) // den AS BIGINT) AS rho_ppm
FROM (SELECT event_type, n_days, sd2,
             1000000 * (n_days*n_days*n_days - n_days) - 6000000 * sd2
               AS num,
             n_days*n_days*n_days - n_days AS den
      FROM moms)
ORDER BY event_type
"""


_ACF_LAGS = (1, 2, 3)


def stats_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank autocorrelation (Spearman ACF) of the daily revenue series
    at lags 1..3, per event_type -- the seasonality/persistence dial a
    metrics pipeline reads before trusting a trend test: a series that
    correlates with its own yesterday violates the independence the
    plain trend tests assume.  Rank form keeps it exact: for each lag
    the paired relation (y_t, y_{t+lag}) is ranked on both sides by
    ``row_number`` over total orders (value, then day -- exact integer
    permutations), and the closed form ``rho = 1 - 6*sum(d^2)/(n^3-n)``
    lands as ``rho_ppm`` via the pmod floor device (rho can be
    negative; both engines' int division truncates toward zero).
    Groups with fewer than 2 pairs report 0 (the n^3 - n denominator
    vanishes).

    Scale shape: one map-side-combinable daily rollup, ONE ordered
    window pass computing all three leads, a stack to long format,
    then per-(event_type, lag) windows over the days-sized relation --
    the event stream itself is touched once.  Magnitude: same
    6e6 * n^3 headroom as stats_spearman_daily (n = days per group)."""
    daily = _daily_cents(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    led = daily.select(
        "event_type",
        "day",
        "y",
        *[F.lead("y", lag).over(w).alias(f"_y{lag}") for lag in _ACF_LAGS],
    )
    stack_args = ", ".join(
        f"CAST({lag} AS BIGINT), _y{lag}" for lag in _ACF_LAGS
    )
    stacked = led.selectExpr(
        "event_type",
        "day",
        "y",
        f"stack({len(_ACF_LAGS)}, {stack_args}) AS (lag, ylead)",
    ).filter(F.col("ylead").isNotNull())
    wx = Window.partitionBy("event_type", "lag").orderBy("y", "day")
    wy = Window.partitionBy("event_type", "lag").orderBy("ylead", "day")
    ranked = stacked.select(
        "event_type",
        "lag",
        F.row_number().over(wx).cast("long").alias("rx"),
        F.row_number().over(wy).cast("long").alias("ry"),
    )
    d2 = (F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))
    moms = ranked.groupBy("event_type", "lag").agg(
        F.count("*").alias("n_pairs"), F.sum(d2).alias("sd2")
    )
    n = F.col("n_pairs")
    den = n * n * n - n
    num = F.lit(1000000) * den - F.lit(6000000) * F.col("sd2")
    fin = moms.select(
        "event_type",
        "lag",
        "n_pairs",
        "sd2",
        num.alias("_num"),
        den.alias("_den"),
    )
    rho = F.expr(
        "CASE WHEN _den = 0 THEN CAST(0 AS BIGINT)"
        " ELSE (_num - pmod(_num, _den)) div _den END"
    ).cast("long")
    return fin.select(
        "event_type", "lag", "n_pairs", "sd2", rho.alias("rho_ppm")
    ).orderBy("event_type", "lag")


ACF_SQL = f"""
WITH {DAILY_CTE}, led AS (
  SELECT event_type, day, y,
         {", ".join(f"LEAD(y, {lag}) OVER (PARTITION BY event_type ORDER BY day) AS _y{lag}" for lag in _ACF_LAGS)}
  FROM daily
), stacked AS (
  {" UNION ALL ".join(f"SELECT event_type, day, y, CAST({lag} AS BIGINT) AS lag, _y{lag} AS ylead FROM led WHERE _y{lag} IS NOT NULL" for lag in _ACF_LAGS)}
), ranked AS (
  SELECT event_type, lag,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type, lag
                                 ORDER BY y, day) AS BIGINT) AS rx,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type, lag
                                 ORDER BY ylead, day) AS BIGINT) AS ry
  FROM stacked
), moms AS (
  SELECT event_type, lag,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM((rx - ry) * (rx - ry)) AS BIGINT) AS sd2
  FROM ranked GROUP BY 1, 2
)
SELECT event_type, lag, n_pairs, sd2,
       CAST(CASE WHEN den = 0 THEN 0
            ELSE (num - ((num % den) + den) % den) // den
            END AS BIGINT) AS rho_ppm
FROM (SELECT event_type, lag, n_pairs, sd2,
             1000000 * (n_pairs*n_pairs*n_pairs - n_pairs) - 6000000 * sd2
               AS num,
             n_pairs*n_pairs*n_pairs - n_pairs AS den
      FROM moms)
ORDER BY event_type, lag
"""


def events_cusum_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift statistic over the daily revenue series,
    per event_type -- the sequential change-detection chart
    (Page 1954) next to the single-split change-point test
    (events_changepoint): CUSUM accumulates small sustained shifts that
    no single split maximizes, which is how production metric monitors
    catch slow drifts.

    The textbook recurrence ``S_t = max(0, S_{t-1} + dev_t)`` looks
    inherently sequential, but it has a CLOSED WINDOWED FORM:
    ``S_t = P_t - min(0, min_{j<=t} P_j)`` with ``P`` the prefix sum of
    deviations (and the mirrored form with a running max for the
    downward side) -- so both engines compute it with two ordered
    windows, no recursion, no iterative loop.  Exactness: deviations
    are scaled by the group size (``dev_i = n*y_i - sum_y`` -- the
    mean subtraction without a rational mean), so every quantity is a
    BIGINT and the oracle matches bit-for-bit.

    Scale shape: one map-side-combinable daily rollup, a broadcast of
    the group moments, and two per-group ordered windows over the
    days-sized relation -- the event stream is touched once.
    Magnitude: |P_t| <= n^2 * max|y| ~ 2.5e3^2 * 1e8 at a century of
    dailies, inside BIGINT."""
    return _cusum_from_daily(_daily_cents(spark, sf_dir))


def _cusum_from_daily(daily: DataFrame) -> DataFrame:
    """The CUSUM scoring epilogue shared by the batch query above and
    the streamed monitor below: input is any (event_type, day, y)
    relation; output the exact two-sided statistics."""
    moms = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("y").cast("long").alias("_sy"),
    )
    j = daily.join(F.broadcast(moms), "event_type")
    dev = (F.col("_n") * F.col("y") - F.col("_sy")).alias("dev_scaled")
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_p = j.select(
        "event_type", "day", dev
    ).select(
        "event_type",
        "day",
        "dev_scaled",
        F.sum("dev_scaled").over(w).alias("_p"),
    )
    return with_p.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        "dev_scaled",
        (
            F.col("_p")
            - F.least(F.min("_p").over(w), F.lit(0).cast("long"))
        ).cast("long").alias("cusum_up"),
        (
            F.greatest(F.max("_p").over(w), F.lit(0).cast("long"))
            - F.col("_p")
        ).cast("long").alias("cusum_down"),
    ).orderBy("event_type", "day")


CUSUM_SQL = f"""
WITH {DAILY_CTE}, moms AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS sy
  FROM daily GROUP BY 1
), devs AS (
  SELECT d.event_type, d.day, CAST(m.n * d.y - m.sy AS BIGINT) AS dev_scaled
  FROM daily d JOIN moms m USING (event_type)
), pre AS (
  SELECT event_type, day, dev_scaled,
         CAST(SUM(dev_scaled) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
  FROM devs
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, dev_scaled,
       CAST(p - LEAST(MIN(p) OVER (
         PARTITION BY event_type ORDER BY day ROWS UNBOUNDED PRECEDING),
         0) AS BIGINT) AS cusum_up,
       CAST(GREATEST(MAX(p) OVER (
         PARTITION BY event_type ORDER BY day ROWS UNBOUNDED PRECEDING),
         0) - p AS BIGINT) AS cusum_down
FROM pre
ORDER BY event_type, day
"""


def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily revenue series, per
    event_type -- the nonparametric randomness check a metrics monitor
    runs before trusting i.i.d.-assuming tests: too FEW runs above/
    below the median means clustering (trend/regime), too MANY means
    oscillation.  Exact integers throughout: the median split is a
    rank cut (row_number over the (y, day) total order -- days at or
    below the lower-median rank go 'low'), the run count is a window
    lag comparison, and the expected-run count and its variance are
    the textbook rationals emitted as exact milli/micro fixed point:

        E[R]   = 2*n1*n2/(n1+n2) + 1
        Var[R] = 2*n1*n2*(2*n1*n2 - n1 - n2)
                 / ((n1+n2)^2 * (n1+n2-1))

    (floor divisions; both quantities non-negative).  The caller
    compares ``n_runs`` against ``expected_runs_milli`` at
    ``var_runs_micro`` scale -- no sqrt, no libm, fully portable.

    Scale shape: one daily rollup, per-group rank + lag windows over
    the days-sized relation, one group-sized aggregate."""
    daily = _daily_cents(spark, sf_dir)
    wrank = Window.partitionBy("event_type").orderBy("y", "day")
    wn = Window.partitionBy("event_type")
    marked = daily.select(
        "event_type",
        "day",
        F.row_number().over(wrank).cast("long").alias("_rk"),
        F.count("*").over(wn).cast("long").alias("_n"),
    ).select(
        "event_type",
        "day",
        # lower-median split: ranks 1..ceil(n/2) are 'low'
        (F.col("_rk") <= (F.col("_n") + 1) / 2).cast("int").alias("_low"),
    )
    wday = Window.partitionBy("event_type").orderBy("day")
    runs = marked.select(
        "event_type",
        "_low",
        F.when(
            F.lag("_low").over(wday).isNull()
            | (F.lag("_low").over(wday) != F.col("_low")),
            1,
        )
        .otherwise(0)
        .alias("_new_run"),
    )
    agg = runs.groupBy("event_type").agg(
        F.sum("_low").cast("long").alias("n_low"),
        (F.count("*") - F.sum("_low")).cast("long").alias("n_high"),
        F.sum("_new_run").cast("long").alias("n_runs"),
    )
    n1, n2 = F.col("n_low"), F.col("n_high")
    tot = n1 + n2
    return agg.select(
        "event_type",
        "n_low",
        "n_high",
        "n_runs",
        F.expr(
            "CASE WHEN n_low + n_high = 0 THEN CAST(0 AS BIGINT)"
            " ELSE (2000 * n_low * n_high) div (n_low + n_high) + 1000 END"
        ).alias("expected_runs_milli"),
        F.expr(
            "CASE WHEN n_low + n_high < 2 THEN CAST(0 AS BIGINT)"
            " ELSE (2000000 * n_low * n_high"
            "       * (2 * n_low * n_high - n_low - n_high))"
            " div ((n_low + n_high) * (n_low + n_high)"
            "      * (n_low + n_high - 1)) END"
        ).alias("var_runs_micro"),
    ).orderBy("event_type")


RUNS_SQL = f"""
WITH {DAILY_CTE}, marked AS (
  SELECT event_type, day,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY y, day)
              <= (COUNT(*) OVER (PARTITION BY event_type) + 1) / 2
              THEN 1 ELSE 0 END AS low
  FROM daily
), runs AS (
  SELECT event_type, low,
         CASE WHEN LAG(low) OVER (PARTITION BY event_type ORDER BY day)
                   IS DISTINCT FROM low
              THEN 1 ELSE 0 END AS new_run
  FROM marked
), agg AS (
  SELECT event_type,
         CAST(SUM(low) AS BIGINT) AS n_low,
         CAST(COUNT(*) - SUM(low) AS BIGINT) AS n_high,
         CAST(SUM(new_run) AS BIGINT) AS n_runs
  FROM runs GROUP BY 1
)
SELECT event_type, n_low, n_high, n_runs,
       CAST(CASE WHEN n_low + n_high = 0 THEN 0
            ELSE (2000 * n_low * n_high) // (n_low + n_high) + 1000
            END AS BIGINT) AS expected_runs_milli,
       CAST(CASE WHEN n_low + n_high < 2 THEN 0
            ELSE (2000000 * n_low * n_high
                  * (2 * n_low * n_high - n_low - n_high))
                 // ((n_low + n_high) * (n_low + n_high)
                     * (n_low + n_high - 1)) END AS BIGINT)
         AS var_runs_micro
FROM agg
ORDER BY event_type
"""


def events_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile of daily revenue, per
    event_type -- the weekly shape a forecaster subtracts before any
    trend/drift test (CUSUM, changepoint) is meaningful: per (type,
    weekday) the day count and total, the weekday total scaled against
    the group's overall daily level (``dow_index_milli = 1000 * n_days
    * sum_dow / (n_dow * sum_all)`` -- 1000 means an average weekday),
    all as exact n-scaled BIGINT ratios.  ISO weekday numbering (1 =
    Monday) on both engines.

    Scale shape: two map-side-combinable rollups (daily, then
    weekday) -- the event stream is touched once; the profile relation
    is |types| x 7."""
    daily = _daily_cents(spark, sf_dir)
    wk = daily.select(
        "event_type",
        F.dayofweek(F.col("day")).alias("_dow_sun1"),
        "y",
    ).select(
        "event_type",
        # Spark dayofweek: 1=Sunday; ISO: 1=Monday
        F.expr("CASE WHEN _dow_sun1 = 1 THEN 7 ELSE _dow_sun1 - 1 END")
        .cast("long")
        .alias("dow_iso"),
        "y",
    )
    per_dow = wk.groupBy("event_type", "dow_iso").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("y").cast("long").alias("sum_cents"),
    )
    moms = per_dow.groupBy("event_type").agg(
        F.sum("n_days").cast("long").alias("_nd_all"),
        F.sum("sum_cents").cast("long").alias("_sum_all"),
    )
    j = per_dow.join(F.broadcast(moms), "event_type")
    return j.select(
        "event_type",
        "dow_iso",
        "n_days",
        "sum_cents",
        F.expr(
            "CASE WHEN _sum_all = 0 OR n_days = 0 THEN CAST(0 AS BIGINT)"
            " ELSE (1000 * _nd_all * sum_cents) div (n_days * _sum_all) END"
        ).alias("dow_index_milli"),
    ).orderBy("event_type", "dow_iso")


DOW_SQL = f"""
WITH {DAILY_CTE}, wk AS (
  SELECT event_type, isodow(day) AS dow_iso, y FROM daily
), per_dow AS (
  SELECT event_type, CAST(dow_iso AS BIGINT) AS dow_iso,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(y) AS BIGINT) AS sum_cents
  FROM wk GROUP BY 1, 2
), moms AS (
  SELECT event_type,
         CAST(SUM(n_days) AS BIGINT) AS nd_all,
         CAST(SUM(sum_cents) AS BIGINT) AS sum_all
  FROM per_dow GROUP BY 1
)
SELECT p.event_type, p.dow_iso, p.n_days, p.sum_cents,
       CAST(CASE WHEN m.sum_all = 0 OR p.n_days = 0 THEN 0
            ELSE (1000 * m.nd_all * p.sum_cents)
                 // (p.n_days * m.sum_all) END AS BIGINT)
         AS dow_index_milli
FROM per_dow p JOIN moms m USING (event_type)
ORDER BY p.event_type, p.dow_iso
"""


_MAD_CUT_MILLI = 4448  # floor(3 * 1.4826 * 1000): the z=3 cut in MAD units


def stats_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier days by median absolute deviation, per
    event_type -- the rank-based companion to the mean/std z-score
    flags (stats_sigma_outliers): one wild day inflates the std and
    hides itself; the median and MAD barely move.  Everything exact:
    the center is the LOWER MEDIAN by row_number over the (y, day)
    total order (rank (n+1) div 2 -- an actual data value, no
    averaging), MAD is the lower median of |y - med| the same way, and
    every day carries an ``is_outlier`` flag set when ``1000 * |y - med| > {cut} * MAD`` -- the
    classic 3-sigma-equivalent cut with the 1.4826 normal-consistency
    constant folded into one documented milli literal (both engines
    compare the same BIGINTs).  Degenerate MAD = 0 (over half the days
    identical) flags every deviating day, the textbook behavior.  All
    days are emitted (flag column), so the verifier grades the full
    median/MAD computation, not just the filtered tail.

    Scale shape: one daily rollup, two per-group rank windows over the
    days-sized relation, one broadcast-back join -- the event stream
    is touched once."""
    daily = _daily_cents(spark, sf_dir)
    wrank = Window.partitionBy("event_type").orderBy("y", "day")
    wn = Window.partitionBy("event_type")
    ranked = daily.select(
        "event_type",
        "day",
        "y",
        F.row_number().over(wrank).cast("long").alias("_rk"),
        F.count("*").over(wn).cast("long").alias("_n"),
    )
    med = ranked.filter(
        F.col("_rk") == F.expr("(_n + 1) div 2")
    ).select("event_type", F.col("y").alias("med_cents"))
    dev = daily.join(F.broadcast(med), "event_type").select(
        "event_type",
        "day",
        "y",
        "med_cents",
        F.abs(F.col("y") - F.col("med_cents")).cast("long").alias("dev_cents"),
    )
    wdev = Window.partitionBy("event_type").orderBy("dev_cents", "day")
    dev_ranked = dev.select(
        "*",
        F.row_number().over(wdev).cast("long").alias("_rk"),
        F.count("*")
        .over(Window.partitionBy("event_type"))
        .cast("long")
        .alias("_n"),
    )
    mad = dev_ranked.filter(
        F.col("_rk") == F.expr("(_n + 1) div 2")
    ).select("event_type", F.col("dev_cents").alias("mad_cents"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            F.col("y").alias("y_cents"),
            "med_cents",
            "dev_cents",
            "mad_cents",
            (
                F.col("dev_cents") * 1000
                > F.lit(_MAD_CUT_MILLI) * F.col("mad_cents")
            ).alias("is_outlier"),
        )
        .orderBy("event_type", "day")
    )


stats_mad_outliers.__doc__ = stats_mad_outliers.__doc__.format(
    cut=_MAD_CUT_MILLI
)


MAD_SQL = f"""
WITH {DAILY_CTE}, ranked AS (
  SELECT event_type, day, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY y, day) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily
), med AS (
  SELECT event_type, CAST(y AS BIGINT) AS med_cents
  FROM ranked WHERE rk = (n + 1) // 2
), dev AS (
  SELECT d.event_type, d.day, CAST(d.y AS BIGINT) AS y,
         m.med_cents,
         CAST(ABS(d.y - m.med_cents) AS BIGINT) AS dev_cents
  FROM daily d JOIN med m USING (event_type)
), dev_ranked AS (
  SELECT event_type, dev_cents,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY dev_cents, day) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
), mad AS (
  SELECT event_type, CAST(dev_cents AS BIGINT) AS mad_cents
  FROM dev_ranked WHERE rk = (n + 1) // 2
)
SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
       d.y AS y_cents, d.med_cents, d.dev_cents, m.mad_cents,
       d.dev_cents * 1000 > {_MAD_CUT_MILLI} * m.mad_cents AS is_outlier
FROM dev d JOIN mad m USING (event_type)
ORDER BY d.event_type, d.day
"""


def stats_kendall_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-a trend test between day order and daily revenue,
    per event_type -- the pairwise-concordance complement to
    stats_spearman_daily (rank-difference) and stats_linear_trend
    (Pearson slope): tau counts, over all day pairs (i < j), whether
    the later day's revenue is higher (concordant), lower (discordant)
    or tied, and ``tau = (C - D) / (n*(n-1)/2)`` -- emitted as exact
    ``tau_ppm`` via the pmod floor-division device (tau can be
    negative; both engines' integer division truncates toward zero,
    so the non-negative remainder is subtracted first -- engine-
    conventions memo).  Ties count as neither (the tau-a form); the
    tie count is emitted so a tau-b re-normalization is one extra
    division away.

    Scale shape: one map-side-combinable daily rollup, then a
    PER-TYPE day-pair self-join -- an equi-join on event_type whose
    fan-out is bounded by days^2 per group (a decade of dailies is
    ~6.7M pairs per type: a worker-local nested loop, never a global
    product).  Magnitude: |C - D| * 1e6 <= 1e6 * n^2 holds inside
    BIGINT through n ~= 3e6 days.  Beyond centuries of dailies,
    switch to the merge-sort inversion-count formulation; pair
    counting is the honest bounded-group form."""
    daily = _daily_cents(spark, sf_dir)
    a = daily.select(
        "event_type", F.col("day").alias("da"), F.col("y").alias("ya")
    )
    b = daily.select(
        "event_type", F.col("day").alias("db"), F.col("y").alias("yb")
    )
    pairs = a.join(b, "event_type").filter(F.col("da") < F.col("db"))
    moms = pairs.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum((F.col("yb") > F.col("ya")).cast("long"))
        .cast("long")
        .alias("n_conc"),
        F.sum((F.col("yb") < F.col("ya")).cast("long"))
        .cast("long")
        .alias("n_disc"),
    )
    # BIGINT `div` end-to-end (a float `/` is only exact below 2^53 and
    # the engines round a double->BIGINT cast differently)
    fin = moms.select(
        "event_type",
        "n_pairs",
        "n_conc",
        "n_disc",
        ((F.col("n_conc") - F.col("n_disc")) * F.lit(1000000)).alias(
            "_num"
        ),
        F.col("n_pairs").alias("_den"),
    )
    tau = F.expr("(_num - pmod(_num, _den)) div _den").cast("long")
    return fin.select(
        "event_type",
        "n_pairs",
        "n_conc",
        "n_disc",
        (F.col("n_pairs") - F.col("n_conc") - F.col("n_disc")).alias(
            "n_ties"
        ),
        tau.alias("tau_ppm"),
    ).orderBy("event_type")


def stats_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic of daily revenue across event types --
    the classical "do the group means differ" test completing the
    trend/shift family (Kendall/Spearman: within-group trend;
    Mann-Whitney: two-group shift; this: k-group means).  Everything
    is exact integer cents lifted to DECIMAL(38,0) (Spark) / HUGEINT
    (DuckDB):

    - per group ``t_g = S_g^2`` and ``sb_g = floor(t_g / n_g)``, the
      floor spelled as ``(t_g - t_g % n_g) / n_g`` so the division is
      of an exact multiple (both engines agree; all terms
      non-negative);
    - ``SSB = max(0, sum(sb_g) - floor(S^2/n))`` (Cauchy-Schwarz makes
      the true value >= 0; the clamp absorbs sub-unit floor jitter),
      ``SSW = Q - sum(sb_g)`` with ``Q = sum(y^2)``;
    - ``F_milli = floor(1000 * (SSB*(n-k)) / (SSW*(k-1)))`` via the
      chi2-style two-stage floor division, so the big products stay in
      128-bit while the quotient lands in BIGINT.

    Headroom: daily cents S <= ~1e13 gives S^2*(n-k) <= ~1e30 < 1e38.
    Degenerate inputs (k < 2, n <= k, or SSW = 0) emit F_milli = 0.

    Scale shape: one map-side-combinable daily rollup, one k-row group
    aggregate, one 1-row total -- nothing beyond the rollup touches
    data."""
    daily = _daily_cents(spark, sf_dir)
    g = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum("y").cast("long").alias("s_g"),
        F.sum(
            F.expr("CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))")
        ).alias("q_g"),
    )
    per = g.select(
        "n_g",
        "s_g",
        "q_g",
        F.expr(
            "CAST((CAST(s_g AS DECIMAL(38,0)) * CAST(s_g AS DECIMAL(38,0))"
            " - CAST(s_g AS DECIMAL(38,0)) * CAST(s_g AS DECIMAL(38,0))"
            "   % CAST(n_g AS DECIMAL(38,0)))"
            " / CAST(n_g AS DECIMAL(38,0)) AS DECIMAL(38,0))"
        ).alias("sb_g"),
    )
    tot = per.agg(
        F.count("*").cast("long").alias("k_groups"),
        F.sum("n_g").cast("long").alias("n_days"),
        F.sum("s_g").cast("long").alias("s_all"),
        F.sum("q_g").alias("q_all"),
        F.sum("sb_g").alias("sb_all"),
    )
    expr = """
      CAST(s_all AS DECIMAL(38,0)) * CAST(s_all AS DECIMAL(38,0))
    """
    out = tot.select(
        "k_groups",
        "n_days",
        F.expr(
            f"CAST(GREATEST(CAST(0 AS DECIMAL(38,0)), sb_all -"
            f" CAST(({expr} - {expr} % CAST(n_days AS DECIMAL(38,0)))"
            f" / CAST(n_days AS DECIMAL(38,0)) AS DECIMAL(38,0)))"
            f" AS DECIMAL(38,0))"
        ).alias("ssb"),
        F.expr("CAST(q_all - sb_all AS DECIMAL(38,0))").alias("ssw"),
    ).select(
        "k_groups",
        "n_days",
        "ssb",
        "ssw",
        F.expr(
            "ssb * CAST(n_days - k_groups AS DECIMAL(38,0))"
        ).alias("num"),
        F.expr(
            "ssw * CAST(k_groups - 1 AS DECIMAL(38,0))"
        ).alias("den"),
    )
    return out.select(
        "k_groups",
        "n_days",
        F.expr("CAST(ssb AS BIGINT)").alias("ssb_cents2"),
        F.expr("CAST(ssw AS BIGINT)").alias("ssw_cents2"),
        F.expr(
            "CASE WHEN k_groups < 2 OR n_days <= k_groups OR ssw = 0"
            " THEN CAST(0 AS BIGINT)"
            # an essentially-zero SSW makes the quotient astronomically
            # large; past 10^12 the test is a foregone conclusion, and
            # an unclamped cast would wrap on Spark while DuckDB throws
            # -- cap F at 10^15 milli on BOTH engines.  The guard is
            # spelled num div 1e12 >= den (equivalent for integer den,
            # den > 0 in this branch): den * 1e12 could itself overflow
            # DECIMAL(38,0) -> NULL on Spark when den >= ~1e26 while
            # DuckDB's HUGEINT still evaluates it (r11 ADVICE fix);
            # num div 1e12 <= ~1e18 always fits
            " WHEN num div CAST(1000000000000 AS DECIMAL(38,0)) >= den"
            " THEN CAST(1000000000000000 AS BIGINT)"
            " ELSE CAST((num div den) * 1000 + ((num % den) * 1000) div den"
            "      AS BIGINT) END"
        ).alias("f_milli"),
    )


def agg_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over orders -- the classic
    recency/frequency/monetary quintile grid, with every quintile cut
    computed scale-safely: each dimension ranks through the two-level
    ``ordered_running_sum`` (range partition + per-partition window +
    O(parallelism) offset merge -- never a single-partition global
    window) and buckets by the exact integer cut ``((rank-1)*5) div
    n`` (the shuffle-shard formula).  Recency is whole days behind
    the corpus's latest order date; monetary is exact cents.  Output:
    customers per (r_q, f_q, m_q) cell -- at most 125 rows whatever
    the corpus size."""
    from ..operators.windows import ordered_running_sum

    od = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("od"),
        F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)").alias(
            "cents"
        ),
    )
    # per_cust feeds the 1-row scalars agg AND the base projection --
    # two different derivations, so without a cut the orders rollup
    # executes twice (three times with a separate n_total agg -- the
    # review-found waste); one checkpoint + one combined scalars row
    per_cust = (
        od.groupBy("o_custkey")
        .agg(
            F.max("od").alias("last_day"),
            F.count("*").cast("long").alias("freq"),
            F.sum("cents").cast("long").alias("mon"),
        )
        .localCheckpoint(eager=False)
    )
    scalars = per_cust.agg(
        F.max("last_day").alias("anchor"),
        F.count("*").cast("long").alias("n"),
    )
    base = (
        per_cust.crossJoin(F.broadcast(scalars))
        .select(
            "o_custkey",
            F.datediff("anchor", "last_day").cast("long").alias("rec"),
            "freq",
            "mon",
            "n",
        )
        .withColumn("one", F.lit(1).cast("long"))
    )
    ranked = ordered_running_sum(
        base, [F.col("rec"), F.col("o_custkey")], "one", "rr"
    )
    ranked = ordered_running_sum(
        ranked, [F.col("freq"), F.col("o_custkey")], "one", "rf"
    )
    ranked = ordered_running_sum(
        ranked, [F.col("mon"), F.col("o_custkey")], "one", "rm"
    )
    cells = ranked.select(
        F.expr("((rr - 1) * 5) div n").alias("r_q"),
        F.expr("((rf - 1) * 5) div n").alias("f_q"),
        F.expr("((rm - 1) * 5) div n").alias("m_q"),
    )
    return (
        cells.groupBy("r_q", "f_q", "m_q")
        .agg(F.count("*").cast("long").alias("n_customers"))
        .orderBy("r_q", "f_q", "m_q")
    )


RFM_SQL = """
WITH pc AS (
  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_day,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS mon
  FROM orders GROUP BY 1
), b AS (
  SELECT o_custkey,
         CAST(date_diff('day', last_day,
              (SELECT MAX(last_day) FROM pc)) AS BIGINT) AS rec,
         freq, mon
  FROM pc
), r AS (
  SELECT o_custkey,
         CAST(ROW_NUMBER() OVER (ORDER BY rec, o_custkey) AS BIGINT)
           AS rr,
         CAST(ROW_NUMBER() OVER (ORDER BY freq, o_custkey) AS BIGINT)
           AS rf,
         CAST(ROW_NUMBER() OVER (ORDER BY mon, o_custkey) AS BIGINT)
           AS rm,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM b
)
SELECT ((rr - 1) * 5) // n AS r_q,
       ((rf - 1) * 5) // n AS f_q,
       ((rm - 1) * 5) // n AS m_q,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM r GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def stats_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type: the MEDIAN of all
    pairwise day-slopes of daily revenue -- the classical
    outlier-resistant complement to stats_linear_trend's OLS slope
    (one wild day moves OLS arbitrarily, but not the slope median).

    Exactness: each pairwise slope quantizes once to milli-cents/day
    via the integer floor device ``(dy*1000 - pmod) div dx`` (dx =
    day difference in whole days, always > 0), then the median is the
    exact lower median (rank ``(n+1) div 2`` over a per-type total
    order (slope, rank-of-pair)) -- no float averaging of the two
    middle elements, fully deterministic on both engines.

    Scale shape: the day-pair self-join is calendar-bounded exactly
    like stats_kendall_daily (years of dailies = millions of pairs
    per type, worker-local); the median is a per-type (never global)
    rank window over the pair relation.  Magnitude: |dy|*1000 <=
    ~1e13 at 1e10 daily cents -- int64-safe."""
    daily = _daily_cents(spark, sf_dir)
    a = daily.select(
        "event_type", F.col("day").alias("da"), F.col("y").alias("ya")
    )
    b = daily.select(
        "event_type", F.col("day").alias("db"), F.col("y").alias("yb")
    )
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("da") < F.col("db"))
        .select(
            "event_type",
            ((F.col("yb") - F.col("ya")) * F.lit(1000)).alias("_num"),
            F.datediff("db", "da").cast("long").alias("_den"),
        )
        .select(
            "event_type",
            F.expr("(_num - pmod(_num, _den)) div _den").alias(
                "slope_milli"
            ),
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope_milli")
    ranked = pairs.select(
        "event_type",
        "slope_milli",
        F.row_number().over(w).cast("long").alias("rk"),
        F.count("*")
        .over(Window.partitionBy("event_type"))
        .cast("long")
        .alias("n_slopes"),
    )
    return (
        ranked.filter(
            F.col("rk") == F.expr("(n_slopes + 1) div 2")
        )
        .select(
            "event_type",
            "n_slopes",
            F.col("slope_milli").alias("median_slope_milli"),
        )
        .orderBy("event_type")
    )


THEIL_SEN_SQL = f"""
WITH {DAILY_CTE}, pairs AS (
  SELECT a.event_type,
         (b.y - a.y) * 1000 AS num,
         CAST(date_diff('day', a.day, b.day) AS BIGINT) AS den
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
), slopes AS (
  SELECT event_type,
         CAST((num - ((num % den) + den) % den) // den AS BIGINT)
           AS slope_milli
  FROM pairs
), ranked AS (
  SELECT event_type, slope_milli,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY slope_milli) AS BIGINT) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
           AS n_slopes
  FROM slopes
)
SELECT event_type, n_slopes, slope_milli AS median_slope_milli
FROM ranked
WHERE rk = (n_slopes + 1) // 2
ORDER BY event_type
"""


ANOVA_SQL = f"""
WITH {DAILY_CTE}, g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(y) AS BIGINT) AS s_g,
         CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT)
           AS q_g
  FROM daily GROUP BY 1
), per AS (
  SELECT n_g, s_g, q_g,
         (CAST(s_g AS HUGEINT) * CAST(s_g AS HUGEINT))
           // CAST(n_g AS HUGEINT) AS sb_g
  FROM g
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
         CAST(SUM(n_g) AS BIGINT) AS n_days,
         CAST(SUM(s_g) AS HUGEINT) AS s_all,
         CAST(SUM(q_g) AS HUGEINT) AS q_all,
         CAST(SUM(sb_g) AS HUGEINT) AS sb_all
  FROM per
), fin AS (
  SELECT k_groups, n_days,
         GREATEST(CAST(0 AS HUGEINT),
                  sb_all - (s_all * s_all) // CAST(n_days AS HUGEINT))
           AS ssb,
         q_all - sb_all AS ssw
  FROM tot
)
SELECT k_groups, n_days,
       CAST(ssb AS BIGINT) AS ssb_cents2,
       CAST(ssw AS BIGINT) AS ssw_cents2,
       CASE WHEN k_groups < 2 OR n_days <= k_groups OR ssw = 0
            THEN CAST(0 AS BIGINT)
            WHEN num // CAST(1000000000000 AS HUGEINT) >= den
            THEN CAST(1000000000000000 AS BIGINT)
            ELSE CAST((num // den) * 1000 + ((num % den) * 1000) // den
                 AS BIGINT) END AS f_milli
FROM (SELECT *, ssb * CAST(n_days - k_groups AS HUGEINT) AS num,
             ssw * CAST(k_groups - 1 AS HUGEINT) AS den
      FROM fin)
"""


KENDALL_SQL = f"""
WITH {DAILY_CTE}, pairs AS (
  SELECT a.event_type,
         CASE WHEN b.y > a.y THEN 1 ELSE 0 END AS c,
         CASE WHEN b.y < a.y THEN 1 ELSE 0 END AS d
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
), moms AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(c) AS BIGINT) AS n_conc,
         CAST(SUM(d) AS BIGINT) AS n_disc
  FROM pairs GROUP BY 1
)
SELECT event_type, n_pairs, n_conc, n_disc,
       CAST(n_pairs - n_conc - n_disc AS BIGINT) AS n_ties,
       -- floor division via the non-negative-remainder device (tau can
       -- be negative; both engines' / on BIGINTs truncates toward zero)
       CAST((num - ((num % den) + den) % den) // den AS BIGINT) AS tau_ppm
FROM (SELECT *, (n_conc - n_disc) * 1000000 AS num, n_pairs AS den
      FROM moms)
ORDER BY event_type
"""


def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily revenue per event
    type, exact fixed point: over the trailing 8-row window (oldest
    first, weights 1,2,4,...,2^(m-1) so the newest day carries half the
    mass), ``ewma = floor(sum(v_j * 2^(j-1)) / (2^m - 1))`` -- pure
    BIGINT shifts, no float alpha, identical on any engine; short
    leading windows (m < 8) renormalize over the weights present.  The
    trend-smoothing primitive feature pipelines layer on dailies.

    Scale shape: one map-side-combinable daily rollup, then a per-type
    (never global) ordered window over the days-sized relation; the
    window list is at most 8 elements.  Magnitude headroom: daily cents
    * 2^7 * 8 stays far inside int64 up to ~9e15 cents/day.  The frame
    list ``_h`` is referenced three times in its consuming projection,
    which keeps it materialized (the used-once CollapseProject trap)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(_cents(F.col("value"))).alias("value_cents"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, Window.currentRow)
    )
    hist = daily.select(
        "event_type", "day", "value_cents",
        F.collect_list("value_cents").over(w).alias("_h"),
    )
    num = F.expr(
        "aggregate(zip_with(_h, sequence(0, size(_h) - 1),"
        " (v, i) -> v * shiftleft(CAST(1 AS BIGINT), i)),"
        " CAST(0 AS BIGINT), (a, x) -> a + x)"
    )
    den = F.expr("shiftleft(CAST(1 AS BIGINT), size(_h)) - 1")
    scored = hist.select(
        "event_type", "day", "value_cents",
        num.alias("_num"), den.alias("_den"),
    )
    # explicit floor division (value_cents can be negative): subtract
    # the non-negative remainder first, same device as stats_spearman
    ewma = F.expr("(_num - pmod(_num, _den)) div _den")
    return scored.select(
        "event_type",
        # ISO string, not DATE: duckdb DATE arrives in pandas as a
        # midnight datetime (same device as events_resample_daily)
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "value_cents",
        ewma.alias("ewma_cents"),
    ).orderBy("event_type", "day")


EWMA_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM events GROUP BY 1, 2
), win AS (
  SELECT event_type, day, value_cents,
         list(value_cents) OVER (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS h
  FROM daily
), scored AS (
  SELECT event_type, day, value_cents,
         CAST(list_sum(list_transform(range(0, len(h)),
           i -> h[i + 1] * (CAST(1 AS BIGINT) << i))) AS BIGINT) AS num,
         (CAST(1 AS BIGINT) << len(h)) - 1 AS den
  FROM win
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, value_cents,
       CAST((num - ((num % den) + den) % den) // den AS BIGINT) AS ewma_cents
FROM scored
ORDER BY event_type, day
"""


def sample_weighted_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling
    (operators/sampling.py::weighted_bottom_k): 20 orders per priority
    class drawn with probability rising in order value -- integer
    priority sampling (md5-hash div weight, bottom-k per group).  The
    quality-weighted subsampling step of a curation pipeline, exactly
    reproducible across engines and reruns."""
    from ..operators.sampling import weighted_bottom_k

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey",
        _cents(F.col("o_totalprice")).alias("weight_cents"),
    )
    return weighted_bottom_k(
        orders, "o_orderpriority", "o_orderkey", "weight_cents", k=20
    ).orderBy("o_orderpriority", "rk")


def _weighted_sample_sql() -> str:
    # 13 hex digits = 52 bits; mod 2^52 is the identity, so the shared
    # digit-sum device doubles as a plain hex->BIGINT conversion
    h = _sql_hex13_mod(
        "substr(md5('wbk|' || CAST(o_orderkey AS VARCHAR)), 1, 13)", 1 << 52
    )
    return f"""
WITH base AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS weight_cents,
         {h} AS h
  FROM orders
  WHERE CAST(FLOOR(o_totalprice * 100) AS BIGINT) > 0
), pr AS (
  SELECT o_orderpriority, o_orderkey, weight_cents,
         h // weight_cents AS p
  FROM base
)
SELECT o_orderpriority, o_orderkey, weight_cents,
       rk
FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
              ORDER BY p, o_orderkey) AS BIGINT) AS rk
  FROM pr)
WHERE rk <= 20
ORDER BY o_orderpriority, rk
"""


TOPIC_DIM = 32   # hashed bag-of-words feature width
TOPIC_K = 5
TOPIC_ITERS = 2


def text_topics_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-free topic clustering -- the hashed bag-of-words
    k-means a training-data pipeline uses for domain balancing when no
    encoder is in the loop: tokens feature-hash into ``TOPIC_DIM``
    buckets (the sketches' shared md5-hex13 device), each document
    becomes an exact integer count vector, and fixed-point Lloyd k-means
    (operators/clustering.py) assigns topics.  Output: one row per
    tokenized document ``(doc_id, cid, d2)``.

    Scale shape: tokenize + bucket is codegen-resident scan work; the
    vector assembly is one (doc, bucket) aggregate and one map lookup
    per dimension; clustering adds one aggregate exchange per Lloyd
    round (see kmeans_fixed_point).  No stage touches doc x doc."""
    from ..operators.clustering import kmeans_fixed_point
    from ..operators.text import tokens

    docs = _tspread(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("item")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("item")), 1, 13), 16, 10)
        .cast("long") % TOPIC_DIM
    )
    counts = toks.groupBy("doc_id", bucket.alias("b")).agg(
        F.count("*").alias("cnt")
    )
    vecs = (
        counts.groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("b", "cnt"))
            ).alias("_m")
        )
        .select(
            F.col("doc_id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(TOPIC_DIM - 1)),
                lambda b: F.coalesce(
                    F.element_at("_m", b.cast("long")), F.lit(0).cast("long")
                ),
            ).alias("q"),
        )
    )
    assigned, _cents = kmeans_fixed_point(vecs, k=TOPIC_K, iters=TOPIC_ITERS)
    return assigned.select(
        F.col("vec_id").alias("doc_id"), "cid", "d2"
    ).orderBy("doc_id")


def _topics_sql() -> str:
    from .queries_llm import TOKS_SQL, _kmeans_ctes

    bucket = _sql_hex13_mod("substr(md5(item), 1, 13)", TOPIC_DIM)
    return f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS tk FROM documents),
items AS (SELECT doc_id, UNNEST(tk) AS item FROM toks),
counts AS (
  SELECT doc_id, {bucket} AS b, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM items GROUP BY 1, 2),
grid AS (
  SELECT d.doc_id, t.b
  FROM (SELECT DISTINCT doc_id FROM counts) d,
       (SELECT UNNEST(range(0, {TOPIC_DIM})) AS b) t),
vsrc AS (
  SELECT g.doc_id AS vec_id, list(COALESCE(c.cnt, 0) ORDER BY g.b) AS q
  FROM grid g LEFT JOIN counts c ON c.doc_id = g.doc_id AND c.b = g.b
  GROUP BY g.doc_id),
{_kmeans_ctes("vsrc", TOPIC_K, TOPIC_ITERS, dim=TOPIC_DIM)}
SELECT vec_id AS doc_id, cid, d2 FROM aF ORDER BY doc_id
"""


def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) of each event type's value
    distribution against the rest of the corpus -- the distribution-
    shift test a curation pipeline runs on a new ingest source.  Exact
    midranks with ties: ranks double to stay integer (a tie group's
    average rank is (lo + hi)/2, so ``2r = lo + hi`` exactly), giving
    ``u_x2 = 2*R1 - n1*(n1+1)`` and ``u_other_x2 = 2*n1*n2 - u_x2``
    with every term BIGINT -- bit-identical on any engine, no libm.

    Scale shape: the pooled ranking needs ONE running count over the
    DISTINCT cents values (ordered_running_sum's two-level prefix sums,
    never a single-partition window over data), one equi-join back on
    value, and a per-type aggregate.  Magnitude headroom: doubled rank
    sums peak at ~2*N^2, inside int64 through N ~ 2e9 rows; shard the
    test (per day/source) beyond that."""
    from ..operators.windows import ordered_running_sum

    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("t"), _cents(F.col("value")).alias("v")
    )
    byv = ev.groupBy("v").agg(F.count("*").alias("c"))
    cum = ordered_running_sum(byv, [F.col("v")], "c", "hi")
    # 2 * midrank of every row holding value v: lo + hi = 2*hi - c + 1
    ranked = cum.select(
        "v", (F.lit(2) * F.col("hi") - F.col("c") + F.lit(1)).alias("r2")
    )
    per_t = (
        ev.join(ranked, "v")
        .groupBy("t")
        .agg(F.count("*").alias("n1"), F.sum("r2").alias("rsum2"))
    )
    totals = per_t.groupBy().agg(F.sum("n1").alias("_n"))
    n1, N = F.col("n1"), F.col("_n")
    u_x2 = F.col("rsum2") - n1 * (n1 + 1)
    return (
        per_t.crossJoin(F.broadcast(totals))
        .select(
            F.col("t").alias("event_type"),
            "n1",
            (N - n1).alias("n2"),
            u_x2.alias("u_x2"),
            (F.lit(2) * n1 * (N - n1) - u_x2).alias("u_other_x2"),
        )
        .orderBy("event_type")
    )


MANN_WHITNEY_SQL = """
WITH ev AS (
  SELECT event_type AS t, CAST(FLOOR(value * 100) AS BIGINT) AS v
  FROM events
), byv AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM ev GROUP BY v
), cum AS (
  SELECT v, c,
         CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS hi
  FROM byv
), ranked AS (
  SELECT v, 2 * hi - c + 1 AS r2 FROM cum
), per_t AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS n1,
         CAST(SUM(r2) AS BIGINT) AS rsum2
  FROM ev JOIN ranked USING (v) GROUP BY t
), totals AS (SELECT CAST(SUM(n1) AS BIGINT) AS n FROM per_t)
SELECT t AS event_type, n1, n - n1 AS n2,
       rsum2 - n1 * (n1 + 1) AS u_x2,
       2 * n1 * (n - n1) - (rsum2 - n1 * (n1 + 1)) AS u_other_x2
FROM per_t, totals
ORDER BY event_type
"""


def stats_sigma_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-sigma outlier detection per event_type WITHOUT computing
    a standard deviation: ``|x - mean| > 3*stddev`` squares to
    ``(n*x - S)^2 > 9*(n*Q - S^2)`` with ``S = sum(x), Q = sum(x^2)`` --
    every term a BIGINT, so the flag is bit-identical in any engine and
    any partition order, with no sqrt, no division, no float anywhere
    (the engine-conventions memo's no-libm rule taken to its limit).

    Scale shape: one map-side-combinable moments pass, the tiny
    per-group moment row broadcast back, then a narrow scan flags rows
    -- two corpus scans total, the same shape every mean/std filter has
    at 100 TB.  Magnitude headroom: the largest term is ``(n*x)^2``;
    with x in integer dollars (<= ~1e3) it stays under 2^63 through
    n ~= 3e6 rows per group (~5x the sf0.1 corpus).  Past that, shift
    the moments to per-(group, day) or DECIMAL(38).
    """
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr("CAST(FLOOR(value) AS BIGINT)").alias("d"),
    )
    moms = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("d").alias("s"),
        F.sum(F.col("d") * F.col("d")).alias("q"),
    )
    flagged = ev.join(F.broadcast(moms), "event_type").withColumn(
        "is_out",
        (
            (F.col("n") * F.col("d") - F.col("s"))
            * (F.col("n") * F.col("d") - F.col("s"))
        )
        > F.lit(9) * (F.col("n") * F.col("q") - F.col("s") * F.col("s")),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.max("n").alias("n_events"),
            F.sum(F.when(F.col("is_out"), 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
            F.min(F.when(F.col("is_out"), F.col("d"))).alias("min_outlier"),
            F.max(F.when(F.col("is_out"), F.col("d"))).alias("max_outlier"),
        )
        .orderBy("event_type")
    )


SIGMA_OUTLIERS_SQL = """
WITH ev AS (
  SELECT event_id, event_type, CAST(FLOOR(value) AS BIGINT) AS d
  FROM events
), moms AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(d) AS BIGINT) AS s,
         CAST(SUM(d * d) AS BIGINT) AS q
  FROM ev GROUP BY 1
), flagged AS (
  SELECT ev.event_type, d,
         n,
         (n*d - s)*(n*d - s) > 9 * (n*q - s*s) AS is_out
  FROM ev JOIN moms ON ev.event_type = moms.event_type
)
SELECT event_type,
       MAX(n) AS n_events,
       CAST(SUM(CASE WHEN is_out THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       MIN(CASE WHEN is_out THEN d END) AS min_outlier,
       MAX(CASE WHEN is_out THEN d END) AS max_outlier
FROM flagged GROUP BY event_type ORDER BY event_type
"""


def curation_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle + balanced sharding -- the last
    stage of a training-data pipeline: place every document at a
    pseudo-random but reproducible global position (order by
    ``md5(doc_id)``), then cut the order into ``k`` near-equal shards
    so training reads i.i.d.-looking data with no hot shard.

    The naive form is ``ntile(k) OVER (ORDER BY md5(...))`` -- a
    single-partition global window, the one plan shape that dies at
    100 TB.  Here the global rank comes from
    :func:`..operators.windows.ordered_running_sum` (range partition on
    the shuffle key, per-partition window, O(parallelism)-row offset
    relation broadcast back), and the shard cut is pure arithmetic on
    the rank: ``shard = floor((rank-1) * k / n)``, ``pos`` relative to
    the shard's first rank -- identical closed form in both engines, no
    ntile edge-semantics dependence.  Shard sizes differ by at most 1.
    """
    from ..operators.windows import ordered_running_sum

    k = 16
    docs = _tspread(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("skey")
    ).withColumn("one", F.lit(1).cast("long"))
    ranked = ordered_running_sum(
        docs, [F.col("skey"), F.col("doc_id")], "one", "rank"
    )
    n_total = docs.groupBy().agg(F.count("*").alias("n"))
    # single-row broadcast carrier (the accepted constant-grid pattern)
    out = ranked.crossJoin(F.broadcast(n_total))
    # all-nonnegative integer division stays in BIGINT via `div` (a
    # float `/` is only exact below 2^53 -- at trillion-row corpora
    # rank*k crosses it)
    return (
        out.withColumn("shard", F.expr(f"((rank - 1) * {k}) div n"))
        .withColumn(
            "pos",
            F.expr(f"(rank - 1) - ((shard * n + {k} - 1) div {k})"),
        )
        .select("doc_id", "skey", "shard", "pos")
        .orderBy("shard", "pos")
    )


SHUFFLE_SHARDS_SQL = """
WITH ranked AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS skey,
         CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                 doc_id) - 1 AS BIGINT) AS r0,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM documents
)
SELECT doc_id, skey,
       CAST((r0 * 16) // n AS BIGINT) AS shard,
       CAST(r0 - (((r0 * 16) // n) * n + 15) // 16 AS BIGINT) AS pos
FROM ranked ORDER BY shard, pos
"""


def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-seeded bootstrap confidence interval for total monthly
    revenue -- the distributed form of the reference's bootstrap sample
    generator (SURVEY §2 op 3, ``dags/dag.py:426-443``): where the
    reference fabricates a sample input when the directory is empty,
    a metrics pipeline fabricates B resampled replicates of its
    estimator to put an interval around it without distributional
    assumptions.

    Fully deterministic and engine-portable: replicate ``b``'s draw
    ``i`` picks unit ``md5(b || '-' || i) % N + 1`` (a 60-bit hex
    fingerprint -- both engines compute the identical index), units are
    the N monthly revenue totals in integer cents, each replicate's
    statistic is an exact BIGINT sum, and the 95% interval is the pair
    of rank statistics (5th / 195th smallest of B=200 replicate
    totals) -- no RNG state, no floats, bit-identical everywhere.

    Scale shape: the unit rollup is the only pass over the data
    (distributed groupBy); the bootstrap operates on the
    AGGREGATE-sized relation -- the draw grid is N x B ~ 16k rows, the
    unit table broadcasts, and the single-partition rank windows sort
    dozens-to-hundreds of rows (bounded by the calendar and B, never by
    corpus size)."""
    B = 200
    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(F.sum(_cents(F.col("o_totalprice"))).alias("total_cents"))
    ranked = monthly.select(
        "total_cents",
        F.row_number().over(Window.orderBy("month")).cast("long").alias("rn"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n"),
    # the ranked unit table feeds three consumers (draw grid, join side,
    # observed totals); the lazy lineage cut makes the orders scan run
    # ONCE and pins only the months-sized relation (bounded by the
    # calendar -- the sweep API reclaims it between batches)
    ).localCheckpoint(eager=False)
    draws = (
        ranked.select(F.col("rn").alias("i"), "n")
        .withColumn("b", F.explode(F.sequence(F.lit(1), F.lit(B))))
        .withColumn(
            "idx",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "-",
                                F.col("b").cast("string"),
                                F.col("i").cast("string"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n")
            )
            + 1,
        )
    )
    boot = (
        draws.join(
            F.broadcast(
                ranked.select(
                    F.col("rn").alias("idx"), F.col("total_cents").alias("u_total")
                )
            ),
            "idx",
        )
        .groupBy("b")
        .agg(F.sum("u_total").alias("rep_total"))
    )
    ordered = boot.select(
        "rep_total", F.row_number().over(Window.orderBy("rep_total")).alias("rk")
    )
    # rank picks as global AGGREGATES (not filters): on an empty orders
    # relation the whole query still emits one all-NULL row, matching
    # the oracle's scalar subqueries (a filter would cross-join to zero
    # rows and break the one-row output contract; r14 review)
    lo = ordered.agg(
        F.max(F.when(F.col("rk") == 5, F.col("rep_total"))).alias(
            "boot_lo_cents"
        )
    )
    hi = ordered.agg(
        F.max(F.when(F.col("rk") == 195, F.col("rep_total"))).alias(
            "boot_hi_cents"
        )
    )
    obs = ranked.agg(
        F.max("n").cast("long").alias("n_units"),
        F.lit(B).cast("long").alias("n_replicates"),
        F.sum("total_cents").cast("long").alias("observed_total_cents"),
    )
    return obs.crossJoin(F.broadcast(lo)).crossJoin(F.broadcast(hi))


BOOTSTRAP_CI_SQL = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         SUM(CAST(FLOOR(o_totalprice*100) AS BIGINT)) AS total_cents
  FROM orders GROUP BY 1
), ranked AS (
  SELECT month, total_cents, ROW_NUMBER() OVER (ORDER BY month) AS rn,
         COUNT(*) OVER () AS n
  FROM monthly
), draws AS (
  SELECT b.b, r.rn AS i,
         (('0x' || substr(md5(b.b || '-' || r.rn), 1, 15))::UBIGINT % r.n) + 1
           AS idx
  FROM ranked r, (SELECT unnest(generate_series(1,200)) AS b) b
), boot AS (
  SELECT d.b, SUM(m.total_cents) AS rep_total
  FROM draws d JOIN ranked m ON m.rn = d.idx GROUP BY d.b
), ordered AS (
  SELECT rep_total, ROW_NUMBER() OVER (ORDER BY rep_total) AS rk FROM boot
)
SELECT (SELECT CAST(MAX(n) AS BIGINT) FROM ranked) AS n_units,
       CAST(200 AS BIGINT) AS n_replicates,
       (SELECT CAST(SUM(total_cents) AS BIGINT) FROM monthly)
         AS observed_total_cents,
       (SELECT CAST(rep_total AS BIGINT) FROM ordered WHERE rk = 5)
         AS boot_lo_cents,
       (SELECT CAST(rep_total AS BIGINT) FROM ordered WHERE rk = 195)
         AS boot_hi_cents
"""


REGISTRY: Dict[str, Tuple[QueryFn, Optional[str]]] = {
    "events_concurrency_peaks": (events_concurrency_peaks, CONCURRENCY_SQL),
    "stats_bootstrap_ci": (stats_bootstrap_ci, BOOTSTRAP_CI_SQL),
    "stats_chi_square": (stats_chi_square, CHI_SQUARE_SQL),
    "stats_trimmed_mean": (stats_trimmed_mean, TRIMMED_MEAN_SQL),
    "stream_hourly_watermarked": (stream_hourly_watermarked, STREAM_HOURLY_SQL),
    "stream_psi_drift": (stream_psi_drift, _stream_psi_sql()),
    "stream_stateful_user_totals": (
        stream_stateful_user_totals,
        STREAM_TOTALS_SQL,
    ),
    "pivot_segment_year": (pivot_segment_year, PIVOT_SQL),
    "agg_cube_priority_status": (agg_cube_priority_status, CUBE_SQL),
    "window_frames_showcase": (window_frames_showcase, FRAMES_SQL),
    "sql_correlated_above_avg": (sql_correlated_above_avg, CORRELATED_SQL),
    "csv_roundtrip_nation_region": (
        csv_roundtrip_nation_region,
        CSV_ROUNDTRIP_SQL,
    ),
    "join_salted_lineitem_supplier": (
        join_salted_lineitem_supplier,
        SALTED_JOIN_SQL,
    ),
    "percentile_value_by_type": (percentile_value_by_type, PERCENTILE_SQL),
    "join_full_outer_year_cohorts": (
        join_full_outer_year_cohorts,
        FULL_OUTER_SQL,
    ),
    "array_scalar_showcase": (array_scalar_showcase, ARRAY_SCALAR_SQL),
    "dedup_clusters": (dedup_clusters, _clusters_sql()),
    "text_tfidf_top_terms": (text_tfidf_top_terms, _tfidf_sql()),
    "sample_stratified_events": (sample_stratified_events, _sample_sql()),
    "text_chunk_windows": (text_chunk_windows, _chunk_windows_sql()),
    "text_decontaminate": (text_decontaminate, DECONTAMINATE_SQL),
    "sketch_kmv_distinct": (sketch_kmv_distinct, _kmv_sql()),
    "sketch_kmv_overlap": (sketch_kmv_overlap, _kmv_overlap_sql()),
    "text_pii_scrub": (text_pii_scrub, _pii_sql()),
    "embed_quantize_int8": (embed_quantize_int8, QUANTIZE_SQL),
    "embed_top_pc": (embed_top_pc, TOP_PC_SQL),
    "embed_jl_project": (embed_jl_project, JL_PROJECT_SQL),
    "stream_dedup_users": (stream_dedup_users, STREAM_DEDUP_SQL),
    "stream_dedup_watermarked": (stream_dedup_watermarked, STREAM_DEDUP_SQL),
    "dedup_incremental_lsh": (dedup_incremental_lsh, INCREMENTAL_LSH_SQL),
    "text_pack_sequences": (text_pack_sequences, _pack_sql()),
    "text_pack_bins_bfd": (text_pack_bins_bfd, _pack_bfd_sql()),
    "curation_packed_set": (curation_packed_set, _curation_packed_sql()),
    "curation_full_set": (curation_full_set, _curation_full_sql()),
    "curation_incremental_set": (
        curation_incremental_set,
        _curation_incremental_sql(),
    ),
    "stream_session_windows": (stream_session_windows, STREAM_SESSION_SQL),
    "stream_static_enrich": (stream_static_enrich, STREAM_ENRICH_SQL),
    "stream_stream_join_pairs": (stream_stream_join_pairs, STREAM_SSJOIN_SQL),
    "sql_grouping_sets": (sql_grouping_sets, GROUPING_SETS_SQL),
    "json_roundtrip_events": (json_roundtrip_events, JSON_ROUNDTRIP_SQL),
    "sketch_hll_distinct": (sketch_hll_distinct, HLL_SQL),
    "sketch_quantiles": (sketch_quantiles, QUANTILE_SKETCH_SQL),
    "sketch_cms_heavy_hitters": (sketch_cms_heavy_hitters, CMS_SQL),
    "stats_linear_trend": (stats_linear_trend, LINEAR_TREND_SQL),
    "stats_spearman_daily": (stats_spearman_daily, SPEARMAN_SQL),
    "stats_acf_daily": (stats_acf_daily, ACF_SQL),
    "events_cusum_daily": (events_cusum_daily, CUSUM_SQL),
    "stats_runs_test": (stats_runs_test, RUNS_SQL),
    "events_dow_profile": (events_dow_profile, DOW_SQL),
    "stream_cusum_drift": (stream_cusum_drift, CUSUM_SQL),
    "stats_mad_outliers": (stats_mad_outliers, MAD_SQL),
    "stats_kendall_daily": (stats_kendall_daily, KENDALL_SQL),
    "stats_anova_f": (stats_anova_f, ANOVA_SQL),
    "stats_theil_sen": (stats_theil_sen, THEIL_SEN_SQL),
    "agg_rfm_segments": (agg_rfm_segments, RFM_SQL),
    "dq_benford_totals": (dq_benford_totals, BENFORD_SQL),
    "events_path_ngrams": (events_path_ngrams, PATH_NGRAMS_SQL),
    "events_changepoint": (events_changepoint, CHANGEPOINT_SQL),
    "stats_sigma_outliers": (stats_sigma_outliers, SIGMA_OUTLIERS_SQL),
    "stats_mann_whitney": (stats_mann_whitney, MANN_WHITNEY_SQL),
    "events_ewma_daily": (events_ewma_daily, EWMA_SQL),
    "text_topics_kmeans": (text_topics_kmeans, _topics_sql()),
    "sample_weighted_orders": (sample_weighted_orders, _weighted_sample_sql()),
    "curation_shuffle_shards": (curation_shuffle_shards, SHUFFLE_SHARDS_SQL),
    "events_resample_daily": (events_resample_daily, RESAMPLE_SQL),
    "join_fuzzy_names": (join_fuzzy_names, FUZZY_SQL),
    "sample_temperature_sources": (sample_temperature_sources, TEMPERATURE_SQL),
    "graph_pagerank_events": (graph_pagerank_events, _pagerank_sql()),
    "graph_label_communities": (graph_label_communities, _label_prop_sql()),
    "curation_dsir_select": (curation_dsir_select, _dsir_sql()),
    "sample_surprisal_strata": (
        sample_surprisal_strata,
        _surprisal_strata_sql(),
    ),
    "sketch_overlap_matrix": (sketch_overlap_matrix, _kmv_matrix_sql()),
    "events_anomaly_days": (events_anomaly_days, ANOMALY_SQL),
    "merge_upsert_part": (merge_upsert_part, MERGE_SQL),
    "agg_mode_per_type": (agg_mode_per_type, MODE_SQL),
    "events_rolling_active_users": (events_rolling_active_users, ROLLING_SQL),
    "events_funnel_steps": (events_funnel_steps, FUNNEL_SQL),
    "events_retention_cohorts": (events_retention_cohorts, RETENTION_SQL),
    "agg_value_histogram": (agg_value_histogram, HISTOGRAM_SQL),
    "orc_xml_roundtrip_part": (orc_xml_roundtrip_part, ORC_XML_SQL),
    "events_sliding_windows": (events_sliding_windows, SLIDING_SQL),
    "map_scalar_showcase": (map_scalar_showcase, MAP_SCALAR_SQL),
    "profile_documents": (profile_documents, _profile_sql()),
    "dq_events_expectations": (dq_events_expectations, DQ_EVENTS_SQL),
    "bucketed_join_order_totals": (
        bucketed_join_order_totals,
        BUCKETED_JOIN_SQL,
    ),
}
