"""Residue cleanup is an ENGINE property, not a harness courtesy
(VERDICT r14 ask #1).

Every registry query pins persistent RDD blocks -- lazy
``localCheckpoint(eager=False)`` shared-subplan cuts that materialize at
the caller's action, plus fn-internal materializations (NB model
training, IVF-PQ index builds).  Through r14 only the bench/scale
harnesses swept them (``sweep_persistent_rdds``); a plain library
session accreted the PROFILE_r13 §5 10x wall swing.  Since r15 the
registry boundary itself scopes the residue: the returned DataFrame
unpersists every pinned block after each terminal action and rebuilds
fresh lineage if re-used.  These tests pin that contract on
residue-HEAVY queries (ones measured to leave multiple corpus-sized
blocks behind) run twice, exactly as the verdict's done-criterion asks.
"""

from __future__ import annotations

import pytest


def _blocks(spark) -> int:
    return len(dict(spark.sparkContext._jsc.getPersistentRDDs()))


def _swept(spark) -> None:
    # make any pre-existing residue (other tests in the session) a
    # non-factor before asserting this test's own bookkeeping
    from airflow_pipeline_text_processing_spark.session import (
        sweep_persistent_rdds,
    )

    sweep_persistent_rdds(spark)


# curation_entropy_filtered: lazy localCheckpoint feeding three consumers
# (plans/queries_llm.py); text_langid_profile: NB training materializations
# (operators/lm.py) -- the exact family VERDICT r14 named as the leak.
RESIDUE_HEAVY = ["curation_entropy_filtered", "text_langid_profile"]


@pytest.mark.parametrize("name", RESIDUE_HEAVY)
def test_registry_query_leaves_zero_blocks_after_each_action(
    spark, sf_dir, name
):
    import __spark_entry__ as e

    _swept(spark)
    fn, _sql = e.REGISTRY[name]

    first = fn(spark, sf_dir).collect()
    assert _blocks(spark) == 0, "first run left persistent RDD residue"

    second = fn(spark, sf_dir).collect()
    assert _blocks(spark) == 0, "second run left persistent RDD residue"

    # the sweep never changes values: both runs are bit-identical
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))


def test_scoped_frame_survives_repeated_actions(spark, sf_dir):
    """A swept local checkpoint cannot recompute -- the scope must
    therefore rebuild fresh lineage when the SAME result frame is acted
    on again (driver re-collects, a notebook re-runs a cell)."""
    import __spark_entry__ as e

    _swept(spark)
    fn, _sql = e.REGISTRY["curation_entropy_filtered"]
    df = fn(spark, sf_dir)
    r1 = df.collect()
    assert _blocks(spark) == 0
    assert df.count() == len(r1)  # count() on the now-stale frame rebuilds
    assert _blocks(spark) == 0
    r2 = df.collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    assert _blocks(spark) == 0


def test_scoped_frame_is_a_dataframe_with_intact_schema(spark, sf_dir):
    """The scope must be invisible to the driver contract: the result is
    a real DataFrame (isinstance), schema/columns readable without
    triggering actions, toPandas covered."""
    from pyspark.sql import DataFrame

    import __spark_entry__ as e

    fn, _sql = e.REGISTRY["codec_trit_bridge"]
    df = fn(spark, sf_dir)
    assert isinstance(df, DataFrame)
    assert df.columns  # schema access is action-free and works
    pdf = df.toPandas()
    assert list(pdf.columns) == df.columns
    assert _blocks(spark) == 0


def test_residue_scope_context_manager(spark, sf_dir):
    """Library compositions outside the registry get the same guarantee
    via the context-manager form."""
    from airflow_pipeline_text_processing_spark.session import residue_scope

    _swept(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with residue_scope(spark):
        pinned = docs.select("doc_id").localCheckpoint(eager=False)
        assert pinned.count() > 0
        assert _blocks(spark) >= 1  # pinned inside the scope
    assert _blocks(spark) == 0  # released on exit

    # exceptional exit releases too
    with pytest.raises(RuntimeError):
        with residue_scope(spark):
            docs.select("doc_id").localCheckpoint(eager=False).count()
            raise RuntimeError("boom")
    assert _blocks(spark) == 0
