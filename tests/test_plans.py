"""Physical-plan audits: the scale properties SURVEY.md §4 promises.

Correctness tests prove the answers right; these prove the PLANS right --
predicate pushdown reaches the parquet scan, small dimensions broadcast,
the codec hot path never shuffles, and hot expressions stay inside
whole-stage codegen.  A regression here is a 100 TB performance bug even
when every value still matches the oracle.
"""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F

from airflow_pipeline_text_processing_spark.plans.pipeline import encode_documents
from airflow_pipeline_text_processing_spark.plans.queries import (
    q1_pricing_summary,
    q3_shipping_priority,
    q5_nation_volume,
)

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_q1_pushdown_and_pruning(spark):
    plan = plan_of(q1_pricing_summary(spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # projection pruning: untouched columns never leave the scan
    assert "l_partkey" not in plan.split("ReadSchema")[1].splitlines()[0]
    # scan+filter+partial-agg fuse into whole-stage codegen
    assert "WholeStageCodegen" in plan_of(
        q1_pricing_summary(spark, SF_DIR), mode="codegen"
    )


def test_q3_broadcasts_the_dimension(spark):
    plan = plan_of(q3_shipping_priority(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # the filtered customer dimension is the build side
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan


def test_q5_broadcasts_every_dimension(spark):
    plan = plan_of(q5_nation_volume(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region


def test_encode_pipeline_is_shuffle_free(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id",
        F.col("text"),
        F.md5(F.encode("text", "UTF-8")).alias("file_hash"),
    )
    plan = plan_of(encode_documents(docs), mode="simple")
    assert "Exchange" not in plan, (
        "the chunk/encode/validate/reassemble hot path must stay narrow"
    )


def test_window_topk_single_shuffle(spark):
    from airflow_pipeline_text_processing_spark.plans.queries import (
        window_top_orders_per_customer,
    )

    plan = plan_of(window_top_orders_per_customer(spark, SF_DIR), mode="simple")
    # one hash-partitioned exchange for the window; the final orderBy may
    # add a range exchange -- anything more means a redundant reshuffle
    assert plan.count("hashpartitioning") <= 1
