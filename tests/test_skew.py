"""Salted aggregation / salted join vs their unsalted forms on a
hot-key-skewed fixture, plus the tabular source/sink round-trip."""

import random

import pyspark.sql.functions as F
import pytest

from airflow_pipeline_text_processing_spark.operators.skew import (
    salted_agg,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    rng = random.Random(3)
    # key 0 holds 80% of rows (the hot key); values include negatives
    rows = [
        (i, 0 if rng.random() < 0.8 else rng.randint(1, 20), rng.randint(-5, 100))
        for i in range(2000)
    ]
    return spark.createDataFrame(rows, "row_id long, k long, v long")


def test_salted_agg_equals_plain_groupby(spark, skewed):
    plain = {
        r.k: (r.s, r.n, r.mn, r.mx)
        for r in skewed.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    for num_salts in (1, 8, 64):
        got = {
            r.k: (r.s, r.n, r.mn, r.mx)
            for r in salted_agg(
                skewed,
                ["k"],
                {
                    "s": ("v", "sum"),
                    "n": ("v", "count"),
                    "mn": ("v", "min"),
                    "mx": ("v", "max"),
                },
                num_salts=num_salts,
            ).collect()
        }
        assert got == plain, f"num_salts={num_salts}"


def test_salted_agg_rejects_non_combinable(spark, skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["k"], {"a": ("v", "avg")})


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [(k, f"name_{k}") for k in range(0, 15)], "k long, k_name string"
    )
    plain_inner = {
        (r.row_id, r.k_name) for r in skewed.join(dim, "k").collect()
    }
    plain_left = {
        (r.row_id, r.k_name) for r in skewed.join(dim, "k", "left").collect()
    }
    for num_salts in (1, 16):
        got_inner = {
            (r.row_id, r.k_name)
            for r in salted_join(skewed, dim, ["k"], num_salts=num_salts).collect()
        }
        assert got_inner == plain_inner
        got_left = {
            (r.row_id, r.k_name)
            for r in salted_join(
                skewed, dim, ["k"], num_salts=num_salts, how="left"
            ).collect()
        }
        assert got_left == plain_left  # unmatched keys keep null names


def test_tabular_round_trip_all_formats(spark, tmp_path):
    from airflow_pipeline_text_processing_spark.sources.tabular import (
        read_table,
        write_table,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.0), (3, None, 0.25)],
        "id long, s string, x double",
    )
    expected = {(r.id, r.s, r.x) for r in df.collect()}
    for fmt in ("parquet", "csv", "json", "orc", "xml"):
        path = str(tmp_path / fmt)
        opts = {"rowTag": "row"} if fmt == "xml" else {}
        write_table(df, path, format=fmt, **opts)
        back = read_table(
            spark, path, format=fmt,
            schema=df.schema if fmt not in ("parquet", "orc") else None,
            **opts,
        )
        assert {(r.id, r.s, r.x) for r in back.collect()} == expected, fmt


def test_write_partitioned_parquet_prunes(spark, tmp_path):
    from airflow_pipeline_text_processing_spark.sources.tabular import (
        read_table,
        write_table,
    )

    df = spark.createDataFrame(
        [(i, i % 3, i * 1.0) for i in range(30)], "id long, part long, x double"
    )
    path = str(tmp_path / "parts")
    write_table(df, path, partition_by=["part"])
    back = read_table(spark, path).filter(F.col("part") == 1)
    assert back.count() == 10
    # partition pruning: the physical scan must carry a partition filter
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "part" in plan.split("PartitionFilters")[1][:80]


def test_compact_files_reduces_file_count(spark, tmp_path):
    import pyspark.sql.functions as FF

    from airflow_pipeline_text_processing_spark.sources.tabular import (
        compact_files,
        read_table,
    )

    src = str(tmp_path / "frag")
    out = str(tmp_path / "compacted")
    df = spark.range(10000).select("id", (FF.col("id") * 2).alias("v"))
    df.repartition(20).write.parquet(src)
    assert len(spark.read.parquet(src).inputFiles()) == 20
    n_out = compact_files(spark, src, out, target_bytes=128 * 1024 * 1024)
    assert n_out == 1  # tiny dataset fits one target-size file
    got = read_table(spark, out).orderBy("id").collect()
    assert len(got) == 10000 and got[5].v == 10


def test_read_evolving_parquet_merges_schemas(spark, tmp_path):
    import pyspark.sql.functions as FF

    from airflow_pipeline_text_processing_spark.sources.tabular import (
        read_evolving_parquet,
    )

    base = str(tmp_path / "evolving")
    spark.range(5).select("id").write.parquet(f"{base}/batch=1")
    spark.range(5, 10).select(
        "id", (FF.col("id") * 10).alias("extra")
    ).write.parquet(f"{base}/batch=2")
    df = read_evolving_parquet(spark, base)
    assert set(df.columns) == {"id", "extra", "batch"}
    rows = {r.id: r.extra for r in df.collect()}
    assert rows[2] is None and rows[7] == 70  # old files null-fill new cols


def test_bucketed_join_skips_the_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts must
    join with NO Exchange on either side (the co-location contract
    write_bucketed promises), and an equality filter on the bucket column
    must prune the scan to a single bucket."""
    import pyspark.sql.functions as FF

    from airflow_pipeline_text_processing_spark.sources.tabular import (
        write_bucketed,
    )

    orders = spark.range(1000).select(
        FF.col("id").alias("o_orderkey"),
        (FF.col("id") % 7).alias("o_status"),
    )
    items = spark.range(4000).select(
        (FF.col("id") % 1000).alias("l_orderkey"),
        (FF.col("id") * 3).alias("l_qty"),
    )
    write_bucketed(
        orders, "b_orders", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"], path=str(tmp_path / "b_orders"),
    )
    write_bucketed(
        items, "b_items", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"], path=str(tmp_path / "b_items"),
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # forbid broadcast so the plan must prove co-location, not dodge it
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_items"),
            FF.col("o_orderkey") == FF.col("l_orderkey"),
        )
        assert joined.count() == 4000  # every item matches exactly one order
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, plan
        # bucket pruning: an equality filter reads 1 of the 8 buckets
        # (autoBucketedScan drops the bucketed layout when no join/agg asks
        # for it, which also hides pruning -- pin it on for the assertion)
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        pruned = spark.table("b_items").filter(FF.col("l_orderkey") == 42)
        pplan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in pplan
        assert pruned.count() == 4
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")


def test_scale_smoke_five_million_rows(spark):
    """Headroom check on the two scale-critical shapes with generated
    data two orders of magnitude past the unit fixtures: the single-shuffle
    range-frame aggregate and the range-partitioned running sum must
    complete without driver-side collection and produce exact results
    (integer ground truth computable in closed form)."""
    import pyspark.sql.functions as FF

    from airflow_pipeline_text_processing_spark.operators.joins import (
        range_aggregate,
    )
    from airflow_pipeline_text_processing_spark.operators.windows import (
        ordered_running_sum,
    )

    n = 5_000_000
    ev = spark.range(n).select(
        FF.col("id").alias("event_id"),
        FF.timestamp_micros(
            FF.lit(1700000000000000) + FF.col("id") * 1000000
        ).alias("ts"),
        (FF.col("id") % 100000).alias("user_id"),
        ((FF.col("id") % 97) * 100).alias("cents"),
    )
    stats = range_aggregate(
        ev, ["user_id"], "ts", [(FF.count("event_id"), "n")], 0, 600
    )
    assert stats.count() == n
    s = ordered_running_sum(
        ev.select("event_id", "cents"), [FF.col("event_id")], "cents"
    )
    last = s.orderBy(FF.col("event_id").desc()).limit(1).collect()[0]
    assert last.running_sum == sum((i % 97) * 100 for i in range(n))


def test_aqe_splits_skewed_join_partition_at_runtime(spark):
    """The session's AQE skew-join config must actually fire: a join whose
    shuffle has one dominant key gets its oversized partition SPLIT at
    runtime (the executed plan marks the sort-merge join ``skew=true``).
    This is the mechanism that rescues real skewed joins at scale without
    manual salting; the salted operators remain for aggregation skew,
    which AQE does not rewrite."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # shrink thresholds so local-scale data can trip the detector
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))  # 90% on key 0
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("w")
        )
        joined = fact.join(dim, "k").groupBy().sum("w")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)
