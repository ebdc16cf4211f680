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

_READ_FORMATS = {"parquet", "csv", "json", "text"}


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
