#!/usr/bin/env python
"""Explicit Bloom-bitmap prefilter vs Spark's native runtime Bloom filter
(VERDICT r8 ask #7 / r9 ask #7).

`join_bloom_prefilter` (plans/queries_scale.py) hand-builds a 512 KiB-capped
bitmap from the dim side and applies it as a map-side predicate on the fact
scan.  Spark 3.3+ has the same idea built in:
``spark.sql.optimizer.runtime.bloomFilter.enabled`` injects a
BloomFilterAggregate/might_contain pair around shuffle joins when one side
is small and selective.  This harness times the SAME join shape three ways
in the regime where the comparison is meaningful -- autoBroadcast DISABLED,
i.e. the 100 TB case where the dim side is too big to broadcast as a hash
join but a bitmap of its keys still fits:

  native-off : plain shuffle semi join, no bloom anywhere
  native-on  : shuffle semi join + Spark's runtime bloom (thresholds
               lowered so it fires at bench scale; plan is asserted to
               contain might_contain)
  explicit   : the engine's bitmap prefilter before the shuffle

When the dim side is broadcastable Spark plans a broadcast join and
neither bloom matters -- that regime is excluded on purpose.

Usage: python tools/bloom_compare.py [sf_dir]   (idle machine, ~1 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def _shape(orders, keys):
    """The shared join shape: revenue by priority for qualifying orders."""
    confirmed = orders.join(
        keys, orders.o_custkey == keys.c_custkey, "left_semi"
    )
    return (
        confirmed.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("rev"))
        .orderBy("o_orderpriority")
    )


def main() -> None:
    from airflow_pipeline_text_processing_spark.plans.queries_scale import (
        _BLOOM_BITS_PER_KEY,
        _BLOOM_MAX_BITS,
        _BLOOM_MIN_BITS,
        _next_pow2,
        bloom_bitmap,
        bloom_might_contain,
    )
    from airflow_pipeline_text_processing_spark.session import get_spark

    spark = get_spark("bloom-compare")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    keys = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders.count(), keys.count()  # warm scans

    def timed(fn, warm=1, runs=2):
        for _ in range(warm):
            fn().collect()
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn().collect()
            best = min(best, time.perf_counter() - t0)
        return best

    results = {}

    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    results["native-off"] = timed(lambda: _shape(orders, keys))

    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    plan = _shape(orders, keys)._jdf.queryExecution().executedPlan().toString()
    fired = "might_contain" in plan or "bloom" in plan.lower()
    results["native-on"] = timed(lambda: _shape(orders, keys))
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")

    def explicit():
        n_keys = keys.count()
        m_bits = min(
            _BLOOM_MAX_BITS,
            max(_BLOOM_MIN_BITS, _next_pow2(n_keys * _BLOOM_BITS_PER_KEY)),
        )
        carrier = bloom_bitmap(keys, "c_custkey", m_bits)
        pre = (
            orders.join(F.broadcast(carrier))
            .filter(bloom_might_contain("o_custkey", m_bits))
            .drop("bloom")
        )
        return _shape(pre, keys)

    results["explicit"] = timed(explicit)

    # the at-scale lever neither wall clock shows at bench size: how many
    # fact rows reach the shuffle.  selectivity = keys fraction; the
    # bitmap passes ~selectivity + FP-rate of the fact side.
    n_orders = orders.count()
    n_keys = keys.count()
    m_bits = min(
        _BLOOM_MAX_BITS,
        max(_BLOOM_MIN_BITS, _next_pow2(n_keys * _BLOOM_BITS_PER_KEY)),
    )
    carrier = bloom_bitmap(keys, "c_custkey", m_bits)
    n_pass = (
        orders.join(F.broadcast(carrier))
        .filter(bloom_might_contain("o_custkey", m_bits))
        .count()
    )
    n_true = _shape(orders, keys).agg(F.sum("n_orders")).collect()[0][0]

    print(f"\nsf_dir={SF_DIR} (autoBroadcast OFF -- shuffle-join regime)")
    print(f"native runtime bloom fired in plan: {fired}")
    for name, wall in results.items():
        print(f"  {name:12s} {wall:6.2f}s")
    print(
        f"shuffle-row reduction: {n_orders} fact rows -> {n_pass} past the "
        f"bitmap ({n_true} true matches; FP overhead "
        f"{(n_pass - n_true) / max(n_true, 1):.1%}); without a prefilter "
        f"all {n_orders} rows shuffle"
    )
    spark.stop()


if __name__ == "__main__":
    main()
