"""The driver-facing query surface: named DataFrame plans + DuckDB oracles.

Every entry exercises one line of SURVEY.md §2's operator inventory on the
synthetic tables in ``/root/testdata`` and is paired with an ANSI-SQL oracle
that DuckDB runs on the same parquet (see ``__spark_entry__.py``).  Queries
without an oracle (codec UDF outputs DuckDB cannot express) get the driver's
rows-only check; their correctness is carried by the property tests.

Determinism rules (so order-insensitive value hashes match exactly):

* **No raw double aggregation.**  Partial-aggregation order differs between
  engines, and ``CAST(double AS DECIMAL)`` rounds differently (Spark goes
  through the shortest decimal string, DuckDB through the exact binary
  value).  All money/value sums canonicalize per row to integer cents with
  ``FLOOR(x*100)`` -- exact on IEEE doubles in both engines -- then sum
  exactly in BIGINT and divide back at the end.
* Every computed column is aliased identically in both formulations.
* Sorts feeding LIMIT always carry a unique tiebreaker key.
* Timestamps stay in UTC (session zone pinned in session.py).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.codec_udfs import decode_chunks, encode_chunks


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    try:
        # oracle parity for every tz-sensitive expression (unix_timestamp on
        # NTZ, NTZ<->TIMESTAMP casts, window rendering) assumes UTC; the
        # driver harness builds its own bare session, so pin it here too
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked down; platform value wins
    if name == "events":
        # events.parquet stores ts as INT64 TIMESTAMP(NANOS), which a vanilla
        # Spark session refuses to read (PARQUET_TYPE_ILLEGAL).  The conf must
        # be set on whatever session the caller hands us -- the driver harness
        # builds its own bare session, so set it here, not only in session.py.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # conf locked down; the read below will surface the real error
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as raw int64; convert to a microsecond
        # timestamp with integer math (nanos overflow doubles)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


# Partition sizing for un-splittable small scans: shared with the document
# source (sources/spread.py holds the tuned constants and the measurement
# notes); `_spread` stays the registry-local name used throughout.
from ..sources.spread import spread_small_scan as _spread  # noqa: E402


def _tspread(
    spark: SparkSession, sf_dir: str, name: str, cap: Optional[int] = None
) -> DataFrame:
    """Load a testdata table with scan-parallelism protection (see
    ``_spread``)."""
    return _spread(spark, _t(spark, sf_dir, name), cap)


def _cents(col):
    """Deterministic per-row canonicalization: value -> integer cents."""
    return F.floor(col * 100).cast("long")


def _money_sum(col, alias: str):
    return (F.sum(_cents(col)).cast("double") / 100.0).alias(alias)


# SQL fragment mirroring _money_sum
def _sql_money_sum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST(FLOOR(({expr})*100) AS BIGINT)) AS DOUBLE)/100.0 AS {alias}"


# =====================================================================
# Aggregations / filters (SURVEY ops 18-20; TPC-H-style workloads)
# =====================================================================


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan+filter+hash-agg+sort: the classic pricing summary."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            _money_sum(F.col("l_extendedprice"), "sum_base_price"),
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"
            ),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       {_sql_money_sum('l_extendedprice', 'sum_base_price')},
       {_sql_money_sum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + deterministic top-k (ops 16-17, 22)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate,
       {_sql_money_sum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way snowflake join with broadcast dims + group agg."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            _money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy("r_name", "n_name")
    )


Q5_SQL = f"""
SELECT r_name, n_name,
       {_sql_money_sum('l_extendedprice * (1 - l_discount)', 'revenue')},
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


# =====================================================================
# Joins: semi / anti (SURVEY ops 13, 16-17)
# =====================================================================


def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: customers having at least one order, counted by segment."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


SEMI_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def join_anti_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI -- the reference's tracking-dedup join shape (op 13):
    customers with no order in 1997 (scoped so the result is non-empty)."""
    cust = _t(spark, sf_dir, "customer")
    orders_97 = _t(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1997
    )
    return (
        cust.join(orders_97, cust.c_custkey == orders_97.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND EXTRACT(year FROM o_orderdate) = 1997
)
ORDER BY c_custkey
"""


# =====================================================================
# Distinct aggregation / windows / sort-limit / set ops
# =====================================================================


def agg_supplier_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregation, formulated as pre-deduped branches.

    ``countDistinct(a), countDistinct(b)`` in one agg compiles to Expand
    (3x the fact table through a single 4-key shuffle).  Pre-deduplicating
    each (suppkey, key) pair separately keeps every shuffle map-side
    combined and carries only deduped pairs -- measured ~2x faster at
    sf0.1 and strictly less shuffle volume at scale; the per-suppkey
    branch results (|suppliers| rows) join for free."""
    li = _t(spark, sf_dir, "lineitem")
    parts = (
        li.select("l_suppkey", "l_partkey").distinct()
        .groupBy("l_suppkey").agg(F.count("*").alias("n_distinct_parts"))
    )
    orders = (
        li.select("l_suppkey", "l_orderkey").distinct()
        .groupBy("l_suppkey").agg(F.count("*").alias("n_distinct_orders"))
    )
    qty = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("total_qty")
    )
    return (
        qty.join(parts, "l_suppkey")
        .join(orders, "l_suppkey")
        .select("l_suppkey", "n_distinct_parts", "n_distinct_orders", "total_qty")
        .orderBy("l_suppkey")
    )


AGG_DISTINCT_SQL = """
SELECT l_suppkey,
       COUNT(DISTINCT l_partkey) AS n_distinct_parts,
       COUNT(DISTINCT l_orderkey) AS n_distinct_orders,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem
GROUP BY l_suppkey
ORDER BY l_suppkey
"""


def agg_rollup_priority_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (priority, year) -> subtotals -> grand total.

    SURVEY §2 Part B lists cube/rollup as engine surface beyond reference
    semantics; NULL marks the rolled-up levels in both engines identically
    (o_orderpriority is never NULL in the data, so no ambiguity)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .rollup("o_orderpriority", "order_year")
        .agg(
            F.count("*").alias("n_orders"),
            _money_sum(F.col("o_totalprice"), "total_price"),
        )
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("order_year").asc_nulls_first(),
        )
    )


ROLLUP_SQL = f"""
SELECT o_orderpriority, EXTRACT(year FROM o_orderdate)::INT AS order_year,
       COUNT(*) AS n_orders,
       {_sql_money_sum('o_totalprice', 'total_price')}
FROM orders
GROUP BY ROLLUP (o_orderpriority, order_year)
ORDER BY o_orderpriority ASC NULLS FIRST, order_year ASC NULLS FIRST
"""


def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 orders per customer by value (§2 Part B)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rank_in_customer", F.row_number().over(w))
        .filter(F.col("rank_in_customer") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_customer")
        .orderBy("o_custkey", "rank_in_customer")
    )


WINDOW_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rank_in_customer
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_customer
  FROM orders
)
WHERE rank_in_customer <= 3
ORDER BY o_custkey, rank_in_customer
"""


def window_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window with frame: running spend per customer over time."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.sum(_cents(F.col("o_totalprice"))).over(w).cast("double") / 100.0).alias(
            "running_spend"
        ),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(FLOOR(o_totalprice*100) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0
         AS running_spend
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


def sort_global_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT (top-k, §2 Part B)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(25)
    )


TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
"""


def set_ops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT in one plan (§2 Part B set ops)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    big_spenders = (
        orders.filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    machinery = cust.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_custkey").alias("custkey")
    )
    return (
        building.union(big_spenders)
        .intersect(cust.select(F.col("c_custkey").alias("custkey")))
        .exceptAll(machinery)
        .distinct()
        .orderBy("custkey")
    )


SET_OPS_SQL = """
SELECT DISTINCT custkey FROM (
  (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
   UNION
   SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000)
  INTERSECT
  SELECT c_custkey AS custkey FROM customer
  EXCEPT
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
)
ORDER BY custkey
"""


# =====================================================================
# Scalar function showcases (SURVEY ops 24-31)
# =====================================================================


def str_scalar_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 / lengths / case / substring / format_string / concat (ops 24-29)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.encode("text", "UTF-8")).alias("text_md5"),
        F.length("text").alias("n_chars_calc"),
        F.octet_length("text").alias("n_bytes"),
        F.upper(F.substring("text", 1, 12)).alias("head_upper"),
        F.format_string("dna_chunk_%03d", (F.col("doc_id") % 1000).cast("int")).alias(
            "chunk_id_style"
        ),
        F.concat_ws("/", F.lit("corpus"), "lang", "source").alias("virtual_path"),
        F.element_at(F.split(F.concat_ws("/", F.lit("corpus"), "lang", "source"), "/"), -1).alias(
            "basename"
        ),
    ).orderBy("doc_id")


STR_SQL = """
SELECT doc_id,
       md5(text) AS text_md5,
       LENGTH(text) AS n_chars_calc,
       OCTET_LENGTH(CAST(text AS BLOB)) AS n_bytes,
       UPPER(SUBSTRING(text, 1, 12)) AS head_upper,
       printf('dna_chunk_%03d', CAST(doc_id % 1000 AS INT)) AS chunk_id_style,
       CONCAT_WS('/', 'corpus', lang, source) AS virtual_path,
       source AS basename
FROM documents
ORDER BY doc_id
"""


def date_scalar_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/quarter/month, date_trunc, datediff, date_format (op 30)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(
            F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_before_y2k"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_date"),
    )  # no trailing sort: driver hash + local gate are order-insensitive


DATE_SQL = """
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS order_quarter,
       CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(DATE '2000-01-01' - CAST(o_orderdate AS DATE) AS INT) AS days_before_y2k,
       strftime(o_orderdate, '%Y-%m-%d') AS iso_date
FROM orders
ORDER BY o_orderkey
"""


def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction + agg over events.props (op 31 family)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("k").cast("long")).alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


JSON_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# =====================================================================
# Event-time analytics (streaming semantics, batch-checkable)
# =====================================================================


def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (Part B streaming analog).

    Two-level formulation: pre-aggregate by (hour, type, user) -- count and
    cents sum combine map-side -- then roll up per (hour, type), where the
    user count is a plain count of the pre-deduped rows.  Avoids the Expand
    plan (2x the event stream through one shuffle) that mixing
    countDistinct with plain aggregates would generate."""
    ev = _t(spark, sf_dir, "events")
    per_user = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
            "user_id",
        )
        .agg(
            F.count("*").alias("_n"),
            F.sum(_cents(F.col("value"))).alias("_cents"),
        )
    )
    return (
        per_user.groupBy("hour", "event_type")
        .agg(
            F.sum("_n").alias("n_events"),
            F.count("*").alias("n_users"),
            (F.sum("_cents").cast("double") / 100.0).alias("total_value"),
        )
        .orderBy("hour", "event_type")
    )


HOURLY_SQL = f"""
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {_sql_money_sum('"value"', 'total_value')}
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running sum --
    the batch formulation of stateful session windows.

    Single-shuffle plan: every stage clusters by ``user_id``, and Spark's
    ClusteredDistribution accepts a subset partitioning, so the
    (user, session) window and the per-user rollup reuse the first
    exchange (sorts only, no reshuffle).  ``session_id`` is a 1-based
    running count, so ``max(session_id)`` IS the session count -- the
    per-user aggregate becomes two more window functions plus a
    one-row-per-user filter instead of two groupBy shuffles."""
    ev = _t(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    by_user_all = Window.partitionBy("user_id")
    by_session = Window.partitionBy("user_id", "session_id")
    sessions = (
        ev.withColumn("prev_ts", F.lag("ts").over(by_user))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > 1800)
            ).cast("int"),
        )
        .withColumn("session_id", F.sum("new_session").over(by_user))
        .withColumn("n_events", F.count("*").over(by_session))
        .withColumn("_rn", F.row_number().over(by_user))
    )
    return (
        sessions.withColumn("n_sessions", F.max("session_id").over(by_user_all))
        .withColumn("max_session_events", F.max("n_events").over(by_user_all))
        .filter(F.col("_rn") == 1)
        .select("user_id", "n_sessions", "max_session_events")
        .orderBy("user_id")
    )


SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events
  FROM numbered GROUP BY user_id, session_id
)
SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events) AS max_session_events
FROM per_session
GROUP BY user_id
ORDER BY user_id
"""


# =====================================================================
# Order-sensitive reassembly (SURVEY op 21-22) -- on synthetic chunks
# =====================================================================


def reassembly_ordered_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The signature order-sensitive aggregate: split every document into
    40-char pieces, shuffle them into a chunk table, then reassemble in
    index order and verify equality with the source text."""
    docs = _t(spark, sf_dir, "documents")
    pieces = docs.select(
        "doc_id",
        "text",
        F.posexplode(
            F.expr(
                "transform(sequence(0, cast(ceil(length(text)/40.0) as int) - 1),"
                " i -> substring(text, i*40 + 1, 40))"
            )
        ).alias("idx", "piece"),
    )
    rebuilt = (
        pieces.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "piece"))),
                    lambda c: c["piece"],
                ),
                "",
            ).alias("rebuilt")
        )
    )
    return (
        rebuilt.join(docs, "doc_id")
        .select(
            "doc_id",
            (F.col("rebuilt") == F.col("text")).alias("roundtrip_ok"),
            F.length("rebuilt").alias("rebuilt_len"),
        )
        .orderBy("doc_id")
    )


REASSEMBLY_SQL = """
WITH pieces AS (
  SELECT doc_id, i.idx AS idx, substring(text, i.idx*40 + 1, 40) AS piece
  FROM documents,
       LATERAL (SELECT UNNEST(range(0, CAST(ceil(length(text)/40.0) AS INT))) AS idx) i
), rebuilt AS (
  SELECT doc_id, string_agg(piece, '' ORDER BY idx) AS rebuilt
  FROM pieces GROUP BY doc_id
)
SELECT d.doc_id, r.rebuilt = d.text AS roundtrip_ok, LENGTH(r.rebuilt) AS rebuilt_len
FROM rebuilt r JOIN documents d ON r.doc_id = d.doc_id
ORDER BY d.doc_id
"""


# =====================================================================
# Codec queries (SURVEY ops 23, 32-44) -- DuckDB cannot run the codec;
# roundtrip_count is oracle-checkable because success == plain COUNT(*).
# =====================================================================


def codec_roundtrip_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode+decode every document; if the codec is correct, the number of
    successful round trips equals COUNT(*) -- which IS the oracle."""
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    enc = docs.withColumn("chunks", encode_chunks(F.col("text")))
    dec = enc.withColumn("rebuilt", decode_chunks(F.col("chunks")))
    return dec.select(
        F.count("*").alias("n_docs"),
        F.sum((F.col("rebuilt") == F.col("text")).cast("long")).alias("n_roundtrip_ok"),
    )


CODEC_ROUNDTRIP_SQL = """
SELECT COUNT(*) AS n_docs, COUNT(*) AS n_roundtrip_ok FROM documents
"""


def codec_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document chunk statistics with a full oracle (ops 19, 23, 36, 40).

    ``n_chunks`` and ``total_bytes`` are exactly SQL-expressible (the corpus
    is ASCII, so byte-budget chunking degenerates to ceil(bytes/chunk_size)
    and total original bytes == octet_length).  The DNA output itself is
    bound by two invariant columns the oracle pins to TRUE: homopolymer-free
    (op 40 -- the codec's signature guarantee) and the Goldman expansion
    factor staying inside [4.9, 5.2] bases/byte (log3(256) ~ 5.047).  The
    raw ``total_dna_bases`` value stays property-test-carried
    (tests/test_codec.py) -- not SQL-expressible."""
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    enc = docs.withColumn("chunks", encode_chunks(F.col("text")))
    total_bases = F.aggregate(
        "chunks",
        F.lit(0).cast("long"),
        lambda acc, c: acc + F.length(c["dna_sequence"]),
    )
    total_bytes = F.aggregate(
        "chunks",
        F.lit(0).cast("long"),
        lambda acc, c: acc + c["original_length_bytes"].cast("long"),
    )
    homopoly_free = F.aggregate(
        "chunks",
        F.lit(True),
        lambda acc, c: acc & ~F.regexp_like(c["dna_sequence"], F.lit(r"(.)\1")),
    )
    return (
        enc.select(
            "doc_id",
            F.size("chunks").alias("n_chunks"),
            total_bytes.alias("total_bytes"),
            homopoly_free.alias("dna_homopolymer_free"),
            (
                (total_bases >= total_bytes * 4.9)
                & (total_bases <= total_bytes * 5.2)
            ).alias("dna_expansion_ok"),
        )
        .orderBy("doc_id")
    )


CODEC_CHUNK_STATS_SQL = """
SELECT doc_id,
       CAST(ceil(octet_length(encode(text)) / 1000.0) AS INT) AS n_chunks,
       CAST(octet_length(encode(text)) AS BIGINT) AS total_bytes,
       TRUE AS dna_homopolymer_free,
       TRUE AS dna_expansion_ok
FROM documents
ORDER BY doc_id
"""


def codec_repair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reed-Solomon repair end-to-end (SURVEY op 42, the decode path the
    reference defines but never calls -- live here): RS-encode each
    document's head, deterministically corrupt 3 bytes, repair, and verify
    byte-exact recovery.  The oracle is the invariant: 3 flips never exceed
    the 5-error/codeword budget of nsym=10, so every repair must succeed."""
    from ..functions.codec_udfs import corrupt_bytes, rs_encode_stream, rs_repair

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    enc = (
        docs.select(
            "doc_id", F.encode(F.substring("text", 1, 200), "UTF-8").alias("payload")
        )
        .withColumn("encoded", rs_encode_stream("payload"))
        .withColumn("corrupted", corrupt_bytes("encoded", F.col("doc_id")))
        .withColumn("repaired", rs_repair("corrupted"))
    )
    return enc.select(
        "doc_id",
        F.lit(3).alias("n_errors_injected"),
        (F.col("corrupted") != F.col("encoded")).alias("corruption_real"),
        (F.col("repaired") == F.col("payload")).alias("repaired_ok"),
    ).orderBy("doc_id")


CODEC_REPAIR_SQL = """
SELECT doc_id, 3 AS n_errors_injected,
       TRUE AS corruption_real, TRUE AS repaired_ok
FROM documents
ORDER BY doc_id
"""


def codec_trit_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-string <-> trits bridge (SURVEY §2 ops 34-35, ref
    ``plugins/utils/dna_encoding.py:78-130`` -- dead code in the
    reference, live here; this entry closes the operator surface to
    52/52).

    Semantics are the reference's exactly: a binary digit string is one
    big-endian unsigned integer, converted whole to minimal base-3
    digits (op 34) and back with left-zero-fill to the target bit
    length (op 35).  The engine's form is NOT the reference's Python
    bignum loop: each document's 60-bit content fingerprint
    (``substr(md5(text),1,15)``) becomes a binary string and hops
    through ``F.conv(bits, 2, 3)`` / ``F.conv(trits, 3, 2)`` -- native
    JVM expressions inside whole-stage codegen, zero Python, zero
    shuffle before the final order.  The Python kernels
    (codec/goldman.py::binary_to_trits / trits_to_binary) pin the
    reference semantics in pytest; the oracle recomputes the base-3
    digits arithmetically with exact 3^k constants.

    Scale shape: per-row scalar expressions over the scan -- no
    exchange, no UDF; at 100 TB this is a pure map stage."""
    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    h = F.substring(F.md5("text"), 1, 15)
    bits = F.lpad(F.conv(h, 16, 2), 60, "0")
    trits = F.conv(bits, 2, 3)
    back = F.lpad(F.conv(trits, 3, 2), 60, "0")
    return docs.select(
        "doc_id",
        bits.alias("binary_string"),
        F.length(trits).cast("int").alias("n_trits"),
        F.substring(trits, 1, 16).alias("trits_head"),
        (back == bits).alias("roundtrip_ok"),
    ).orderBy("doc_id")


_POW3 = ", ".join(str(3**k) for k in range(37, -1, -1))

# The UBIGINT hex cast + literal 3^k powers keep every step exact-integer;
# 3^38 > 2^60-1, so 38 digits always cover the 60-bit fingerprint.
CODEC_TRIT_BRIDGE_SQL = f"""
WITH base AS (
  SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::UBIGINT AS h
  FROM documents
), tr AS (
  SELECT doc_id, h,
         coalesce(nullif(ltrim(array_to_string(
           [((h // p) % 3)::VARCHAR FOR p IN [{_POW3}]], ''), '0'), ''), '0')
           AS trits
  FROM base
)
SELECT doc_id,
       lpad(bin(h), 60, '0') AS binary_string,
       CAST(length(trits) AS INT) AS n_trits,
       substr(trits, 1, 16) AS trits_head,
       TRUE AS roundtrip_ok
FROM tr
ORDER BY doc_id
"""


# =====================================================================
# Registry
# =====================================================================

QueryFn = Callable[[SparkSession, str], DataFrame]

# name -> (spark_fn, oracle_sql | None)
def join_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/joins.py): every purchase event annotated with
    the user's most recent click at-or-before it; purchases with no prior
    click keep nulls.  Merge-scan formulation -- one shuffle on user_id,
    no correlated lookups."""
    from ..operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    return (
        asof_join(
            purchases,
            clicks,
            on=["user_id"],
            left_ts="ts",
            right_ts="ts",
            payload=["event_id", "ts", "value"],
            prefix="click_",
            tiebreak=["event_id"],
        )
        .select(
            "event_id", "user_id", "ts", "value",
            "click_event_id", "click_ts", "click_value",
        )
    )  # no trailing sort: driver hash + local gate are order-insensitive


ASOF_SQL = """
SELECT p.event_id, p.user_id, p.ts, p.value,
       c.event_id AS click_event_id, c.ts AS click_ts, c.value AS click_value
FROM events p
LEFT JOIN LATERAL (
  SELECT event_id, ts, value
  FROM events c
  WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
  ORDER BY c.ts DESC, c.event_id DESC
  LIMIT 1
) c ON true
WHERE p.event_type = 'purchase'
ORDER BY p.event_id
"""


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (operators/joins.py::asof_join,
    ``direction="nearest"`` -- pandas merge_asof parity): every error
    event annotated with the same user's closest click in EITHER time
    direction, ties to the earlier (backward) click, equal-timestamp
    ties to the greatest event_id.  Same merge-scan plan as the
    backward form plus one extra local sort: one shuffle on user_id,
    two ordered window scans, no pair explosion."""
    from ..operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "ts", "user_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    return asof_join(
        errors,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload=["event_id", "ts", "value"],
        prefix="click_",
        tiebreak=["event_id"],
        direction="nearest",
    ).select(
        "event_id", "user_id", "ts",
        "click_event_id", "click_ts", "click_value",
    )  # no trailing sort: driver hash + local gate are order-insensitive


ASOF_NEAREST_SQL = """
SELECT e.event_id, e.user_id, e.ts,
       c.event_id AS click_event_id, c.ts AS click_ts,
       c.value AS click_value
FROM events e
LEFT JOIN LATERAL (
  SELECT event_id, ts, value
  FROM events c
  WHERE c.user_id = e.user_id AND c.event_type = 'click'
  ORDER BY CASE WHEN c.ts <= e.ts THEN e.ts - c.ts ELSE c.ts - e.ts END ASC,
           CASE WHEN c.ts <= e.ts THEN 0 ELSE 1 END ASC,
           c.event_id DESC
  LIMIT 1
) c ON true
WHERE e.event_type = 'error'
ORDER BY e.event_id
"""


def join_range_error_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (operators/joins.py): per error event, the count and
    fixed-point value sum of the same user's events in the 10 minutes
    strictly after it.  Bucketed equi-join -- no per-key cross product."""
    from ..operators.joins import range_join_bucketed

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "ts", "user_id"
    )
    others = ev.select(
        F.col("user_id"),
        F.col("ts").alias("o_ts"),
        F.col("event_id").alias("o_event_id"),
        F.col("value").alias("o_value"),
    )
    matched = range_join_bucketed(
        errors,
        others,
        on=["user_id"],
        left_ts="ts",
        right_ts="o_ts",
        min_offset_s=0,
        max_offset_s=600,
    )
    follow = matched.groupBy("event_id").agg(
        F.count("o_event_id").alias("n_follow"),
        F.sum(_cents(F.col("o_value"))).alias("follow_value_cents"),
    )
    return (
        errors.join(follow, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("n_follow", F.lit(0)).alias("n_follow"),
            F.coalesce("follow_value_cents", F.lit(0)).alias("follow_value_cents"),
        )
    )  # no trailing sort: driver hash + local gate are order-insensitive


RANGE_JOIN_SQL = """
SELECT e.event_id, ANY_VALUE(e.user_id) AS user_id,
       COUNT(o.event_id) AS n_follow,
       CAST(COALESCE(SUM(CAST(FLOOR(o.value*100) AS BIGINT)), 0) AS BIGINT) AS follow_value_cents
FROM (SELECT event_id, ts, user_id FROM events WHERE event_type = 'error') e
LEFT JOIN events o
  ON o.user_id = e.user_id
 AND o.ts > e.ts
 AND o.ts <= e.ts + INTERVAL 10 MINUTE
GROUP BY e.event_id
ORDER BY e.event_id
"""


def window_follow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as ``join_range_error_window`` through the
    aggregate-only fast path (operators/joins.py::range_aggregate): a RANGE
    window frame over integer microseconds computes each error's follow-on
    count/sum in ONE shuffle on user_id -- no interval explode, no pair
    materialization, no re-aggregate, no join back.  The pair-producing
    bucketed range join remains the operator for callers that need the
    matching rows themselves."""
    from ..operators.joins import range_aggregate

    ev = _t(spark, sf_dir, "events")
    stats = range_aggregate(
        ev.select("event_id", "ts", "user_id", "event_type", "value"),
        on=["user_id"],
        ts="ts",
        aggs=[
            (F.count("event_id"), "n_follow"),
            (F.sum(_cents(F.col("value"))), "_follow_cents"),
        ],
        min_offset_s=0,
        max_offset_s=600,
    )
    return (
        stats.filter(F.col("event_type") == "error")
        .select(
            "event_id",
            "user_id",
            "n_follow",
            F.coalesce("_follow_cents", F.lit(0)).alias("follow_value_cents"),
        )
        .orderBy("event_id")
    )


def agg_salted_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation (operators/skew.py::salted_agg): lineitem
    grouped by (returnflag, linestatus) -- ~4 distinct keys over the whole
    table, i.e. every key is hot -- via salt -> partial -> combine.
    Result is identical to the plain GROUP BY (the oracle)."""
    from ..operators.skew import salted_agg

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        _cents(F.col("l_extendedprice")).alias("price_cents"),
        "l_quantity",
    )
    return salted_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_price_cents": ("price_cents", "sum"),
            "n_rows": ("l_quantity", "count"),
            "min_qty": ("l_quantity", "min"),
            "max_qty": ("l_quantity", "max"),
        },
        num_salts=32,
    ).orderBy("l_returnflag", "l_linestatus")


SALTED_AGG_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       COUNT(l_quantity) AS n_rows,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


REGISTRY: Dict[str, Tuple[QueryFn, Optional[str]]] = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_nation_volume": (q5_nation_volume, Q5_SQL),
    "join_semi_active_customers": (join_semi_active_customers, SEMI_SQL),
    "join_anti_idle_customers": (join_anti_idle_customers, ANTI_SQL),
    "join_asof_last_click": (join_asof_last_click, ASOF_SQL),
    "join_asof_nearest": (join_asof_nearest, ASOF_NEAREST_SQL),
    "join_range_error_window": (join_range_error_window, RANGE_JOIN_SQL),
    "agg_supplier_part_stats": (agg_supplier_part_stats, AGG_DISTINCT_SQL),
    "agg_rollup_priority_year": (agg_rollup_priority_year, ROLLUP_SQL),
    "agg_salted_hot_keys": (agg_salted_hot_keys, SALTED_AGG_SQL),
    "window_top_orders_per_customer": (window_top_orders_per_customer, WINDOW_SQL),
    "window_running_customer_spend": (window_running_customer_spend, WINDOW_RUNNING_SQL),
    "sort_global_topk_orders": (sort_global_topk_orders, TOPK_SQL),
    "set_ops_customer_cohorts": (set_ops_customer_cohorts, SET_OPS_SQL),
    "str_scalar_showcase": (str_scalar_showcase, STR_SQL),
    "date_scalar_showcase": (date_scalar_showcase, DATE_SQL),
    "json_props_extract": (json_props_extract, JSON_SQL),
    "events_hourly_rollup": (events_hourly_rollup, HOURLY_SQL),
    "events_sessionize": (events_sessionize, SESSION_SQL),
    "reassembly_ordered_chunks": (reassembly_ordered_chunks, REASSEMBLY_SQL),
    "codec_roundtrip_count": (codec_roundtrip_count, CODEC_ROUNDTRIP_SQL),
    "codec_chunk_stats": (codec_chunk_stats, CODEC_CHUNK_STATS_SQL),
    "codec_repair_stats": (codec_repair_stats, CODEC_REPAIR_SQL),
    "codec_trit_bridge": (codec_trit_bridge, CODEC_TRIT_BRIDGE_SQL),
    "window_follow_stats": (window_follow_stats, RANGE_JOIN_SQL),
}
