"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` -- flagship pipeline on sf0.001 (smoke check).
``queries()`` / ``oracle_sql()`` -- the SURVEY.md §2 operator surface,
verified by the driver against a DuckDB oracle at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from airflow_pipeline_text_processing_spark.plans.queries import REGISTRY as _CORE
from airflow_pipeline_text_processing_spark.plans.queries_ext import REGISTRY as _EXT
from airflow_pipeline_text_processing_spark.plans.queries_llm import REGISTRY as _LLM

REGISTRY = {**_CORE, **_LLM, **_EXT}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full DNA encode/validate/reconstruct pipeline over the
    sf0.001 documents corpus; one report row per document."""
    import pyspark.sql.functions as F

    from airflow_pipeline_text_processing_spark.plans.pipeline import (
        encode_documents,
    )
    from airflow_pipeline_text_processing_spark.sources.text_dir import (
        documents_table,
    )

    docs = documents_table(spark, "/root/testdata/sf0.001")
    encoded = encode_documents(docs)
    return encoded.select(
        "doc_id",
        "file_hash",
        "dna_chunks_count",
        "total_dna_bases",
        (F.col("reconstructed_checksum") == F.col("file_hash")).alias("roundtrip_ok"),
        "status",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
