"""SparkSession factory with scale-oriented defaults.

The engine targets multi-executor clusters reading ~100 TB; the defaults here
encode that stance (AQE on, skew handling on, Arrow for the codec UDFs,
partition sizing) while remaining correct on local[N] test runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "airflow-pipeline-text-processing-spark") -> SparkSession:
    """Return the active session, or build a local one with engine defaults.

    On a real cluster the session is built by the platform; this factory only
    fills in engine-level SQL conf that is safe to set either way.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    active = SparkSession.getActiveSession()
    if active is not None:
        _apply_runtime_conf(active)
        return active
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # one shuffle partition per core locally; on a cluster AQE coalesces
        .config("spark.sql.shuffle.partitions", cpus)
        # oracle comparisons and run reproducibility need a fixed zone
        .config("spark.sql.session.timeZone", "UTC")
        # the driver's events.parquet carries TIMESTAMP(NANOS); read the
        # raw int64 and convert explicitly (sources read it via timestamp_micros)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def sweep_persistent_rdds(spark: SparkSession) -> int:
    """Unpersist every persistent RDD block and return how many were
    swept.  The lazy ``localCheckpoint`` lineage cuts in the NB / eval
    family (operators/lm.py) pin corpus-sized RDD blocks once their
    query's action runs, and nothing unpersists them when the query
    completes -- a long-lived session (a serving deployment, a bench
    run, the driver's grading loop) accretes residue that fights later
    queries' execution memory, measured at x30 as a 10x wall swing
    (PROFILE_r13 §5).  This is the engine's cleanup API (ADVICE r13:
    the sweep previously lived only in the bench harness): call it
    between logical batches.  Blocks are safe to drop at any point --
    every query builds fresh lineage per call, and a swept checkpoint
    simply re-materializes on next use."""
    import gc

    gc.collect()  # drop Python-side refs so the JVM map is the truth
    n = 0
    for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        jrdd.unpersist()
        n += 1
    return n


def _apply_runtime_conf(spark: SparkSession) -> None:
    for key, val in [
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ]:
        try:
            spark.conf.set(key, val)
        except Exception:
            pass  # immutable on some deployments; platform value wins
