"""Document ingestion sources.

Reference semantics (SURVEY.md ops 1-2, 12, 14): list a directory, keep
``*.txt`` regular files, read each whole file as one UTF-8 string, and build
the file descriptor ``{file_path, file_hash, file_size, filename}``
(``/root/reference/dags/dag.py:421-424``, ``:452-470``).

Spark-first design: the directory listing, extension filter and whole-file
read are one distributed ``text`` scan with ``wholetext`` +
``pathGlobFilter`` -- the driver never lists or hashes files itself, so a
100 TB corpus ingests with executor parallelism and no driver bottleneck.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_text_dir(
    spark: SparkSession,
    input_dir: str,
    glob: str = "*.txt",
) -> DataFrame:
    """Whole-file read of a directory into the canonical documents schema:
    ``path, filename, text, file_hash, file_size``.

    ``file_hash`` is md5 of the UTF-8 bytes (ref ``dags/dag.py:456``) and
    ``file_size`` the byte length (ref ``:457``).
    """
    raw = (
        spark.read.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", glob)
        .load(input_dir)
        .select(
            F.input_file_name().alias("path"),
            F.col("value").alias("text"),
        )
    )
    return with_descriptor(raw)


def with_descriptor(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the reference's file-descriptor columns to any text DataFrame."""
    utf8 = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "*",
        F.element_at(F.split(F.col("path"), "/"), -1).alias("filename"),
        F.md5(utf8).alias("file_hash"),
        F.octet_length(F.col(text_col)).cast("long").alias("file_size"),
    )


def documents_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver's synthetic ``documents`` parquet with descriptor columns
    mapped onto the reference schema (doc_id stands in for the path)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("path"),
        "text",
        "doc_id",
        "lang",
        "source",
        "n_chars",
    ).transform(lambda d: d.select(
        "*",
        F.md5(F.encode("text", "UTF-8")).alias("file_hash"),
        F.octet_length("text").cast("long").alias("file_size"),
    ))
