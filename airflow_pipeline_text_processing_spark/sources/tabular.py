"""Tabular source/sink surface: parquet / csv / json / text, one entry
point each way.

The reference's only sources are a directory of whole .txt files and a
Postgres tracking table (SURVEY.md ops 1-4); its sinks are text, per-chunk
files, JSON reports, and tracking inserts (ops 5-11).  The engine
generalizes both ends to the standard Spark formats so a user can point
the same pipeline at parquet/csv/json datasets without touching operator
code.  Scale notes: parquet is the only format with predicate pushdown +
column pruning + vectorized reading; csv/json scans are line-parallel but
schema-on-read -- always pass an explicit schema in production (schema
inference reads the data twice).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# orc: Spark's second built-in columnar format (schema-carrying, predicate
# pushdown); xml: built-in since Spark 4 (rowTag-framed; pass an explicit
# schema on read -- inference re-scans and can widen types)
_READ_FORMATS = {"parquet", "csv", "json", "text", "orc", "xml"}


def read_table(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    schema: Optional[StructType] = None,
    **options: str,
) -> DataFrame:
    """Read a dataset directory/file as a DataFrame.

    csv defaults to ``header=true``; pass an explicit ``schema`` wherever
    the format cannot carry one (csv/json/text) to avoid the inference
    scan and to pin column types for oracle-stable comparisons.
    """
    if format not in _READ_FORMATS:
        raise ValueError(f"unsupported format: {format}")
    reader = spark.read.format(format)
    if format == "csv":
        reader = reader.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: Optional[list] = None,
    **options: str,
) -> None:
    """Write a DataFrame out; ``partition_by`` produces hive-style
    directory partitioning (the scale path for selective reads: partition
    pruning skips whole directories)."""
    if format not in _READ_FORMATS:
        raise ValueError(f"unsupported format: {format}")
    writer = df.write.format(format).mode(mode)
    if format == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list,
    n_buckets: int,
    sort_cols: Optional[list] = None,
    path: Optional[str] = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Write ``df`` as a BUCKETED table: rows are hash-partitioned into
    ``n_buckets`` files per task-output by ``bucket_cols`` (optionally
    sorted within each bucket by ``sort_cols``).

    This is the 100 TB co-location primitive: two tables bucketed by the
    same key with the same bucket count join WITHOUT any Exchange -- the
    bucketing metadata proves both sides already share the join
    partitioning, so a fact-to-fact join (e.g. orders-lineitem, repeated
    every day) skips its shuffle entirely.  Equality filters on the bucket
    column also prune to a single bucket's files at scan time
    (``SelectedBucketsCount`` in the scan).  Bucketing requires the table
    catalog (``saveAsTable``); pass ``path`` to keep the data external.
    """
    writer = df.write.format(format).mode(mode).bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_evolving_parquet(
    spark: SparkSession, *paths: str, **options: str
) -> DataFrame:
    """Read parquet written under an EVOLVING schema (columns added over
    time) as one DataFrame: ``mergeSchema`` unions the footers' schemas and
    older files surface the missing columns as nulls.

    Schema merge is footer metadata work, not a data scan, so the cost is
    per-file-footer -- at 100 TB prefer pinning the latest schema via
    ``.schema(...)`` once it is known and letting the reader null-fill,
    which skips the merge pass entirely; this helper is the
    discovery/backfill path.
    """
    reader = spark.read.option("mergeSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.parquet(*paths)


def compact_files(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    format: str = "parquet",
) -> int:
    """Small-file compaction: rewrite a dataset into files of roughly
    ``target_bytes`` each; returns the output file count.

    Long-running ingest (streaming micro-batches, per-task commits at high
    parallelism) strews datasets with tiny files whose per-file open/footer
    cost eventually dominates scans.  The output file count derives from
    the actual input byte size (driver-side filesystem metadata -- no data
    scan, no collect); the rewrite itself is one narrow-into-shuffle
    repartition.  Hive-partitioned layouts should compact per partition
    directory (call this once per partition path) so partition pruning
    survives the rewrite.
    """
    import math

    df = read_table(spark, in_path, format=format)
    files = df.inputFiles()
    # Hadoop FileSystem status works on every Spark-supported filesystem
    # (local, HDFS, S3A, ...) -- os.path.getsize would silently read 0 on
    # object stores and collapse the rewrite to a single file/task.
    sizes: list[int] = []
    try:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        for uri in files:
            p = jvm.org.apache.hadoop.fs.Path(uri)
            sizes.append(p.getFileSystem(hconf).getFileStatus(p).getLen())
        total = sum(sizes)
    except Exception:
        # JVM gateway unavailable (mocked session, connect-only client):
        # assume inputs already average the target size so the output file
        # count matches the input file count -- never collapse to 1.
        total = len(files) * target_bytes
    n_out = max(1, math.ceil(total / target_bytes))
    write_table(df.repartition(n_out), out_path, format=format)
    out = read_table(spark, out_path, format=format)
    return len(out.inputFiles())
