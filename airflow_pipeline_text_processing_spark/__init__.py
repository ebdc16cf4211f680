"""PySpark-native analytics engine with the query / data-processing surface of
AslaneMortreau/Airflow-Pipeline-Text-Processing, re-designed Spark-first.

The reference (read-only at /root/reference) is an Airflow-orchestrated batch
ETL that encodes UTF-8 text into homopolymer-free DNA sequences (Goldman
base-3 codec, ``plugins/utils/dna_encoding.py``) with Reed-Solomon parity,
validates/reconstructs them, and tracks processed files by content hash in
Postgres (``dags/dag.py``).  This package re-expresses that entire surface --
plus large-scale LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) -- as declarative PySpark DataFrame plans
with a small set of Arrow-vectorized pandas UDF kernels.

Layout:
    codec/      pure-Python kernels (Goldman codec, Reed-Solomon, chunker)
    functions/  pandas-UDF registry + built-in-expression helpers
    operators/  dedup, similarity, text-analysis, multimodal operators
    sources/    readers (text dirs, parquet tables) + tracking table
    plans/      composable DataFrame pipelines + the driver query surface
    streaming/  Structured Streaming ingest + reliability (retry/breaker/DLQ)
"""

__version__ = "0.1.0"
