"""Round-14 debut queries.

Wave 1: the capped Fleiss panel in its SERVING shape (VERDICT r13 ask
#1) -- the NB rater scores from the persisted profile-capped model slot
instead of re-training in-query; bit-identity with the capped form is
the pinned contract.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_fleiss_served_is_bit_identical_to_capped(spark):
    # the entire amortization claim: training determinism makes the
    # served rater's predictions -- and therefore the whole panel
    # closed form -- bit-identical to the capped train-in-query panel
    from airflow_pipeline_text_processing_spark.plans.queries_llm import (
        eval_fleiss_kappa_capped,
        eval_fleiss_kappa_served,
    )

    served = eval_fleiss_kappa_served(spark, SF).collect()
    capped = eval_fleiss_kappa_capped(spark, SF).collect()
    assert len(served) == len(capped) == 1
    assert served[0].asDict() == capped[0].asDict()


def test_fleiss_served_rater_matches_served_langid(spark):
    # one persisted model serves every consumer: the panel's third
    # rater and text_langid_served must read the SAME slot and emit
    # identical predictions
    from airflow_pipeline_text_processing_spark.plans.queries_llm import (
        _nb_served_scores,
        text_langid_served,
    )

    panel_rater = _nb_served_scores(spark, SF).select("doc_id", "label_pred")
    langid = text_langid_served(spark, SF).select("doc_id", "label_pred")
    assert panel_rater.exceptAll(langid).count() == 0
    assert langid.exceptAll(panel_rater).count() == 0


def test_fleiss_served_repeat_call_serves_from_slot(spark):
    # the second call within a process must not rebuild the model slot:
    # the slot path is registered after the first call, and results stay
    # identical across calls (deterministic serve)
    from airflow_pipeline_text_processing_spark.operators.ann_index import (
        process_index_slot,
    )
    from airflow_pipeline_text_processing_spark.plans.queries_llm import (
        _NB_MODEL_SLOTS,
        eval_fleiss_kappa_served,
    )

    first = eval_fleiss_kappa_served(spark, SF).collect()[0]
    assert process_index_slot(f"nb_model:{SF}") in _NB_MODEL_SLOTS
    import os

    slot = process_index_slot(f"nb_model:{SF}")
    mtime = max(
        os.path.getmtime(os.path.join(root, f))
        for root, _d, files in os.walk(slot)
        for f in files
    )
    second = eval_fleiss_kappa_served(spark, SF).collect()[0]
    mtime2 = max(
        os.path.getmtime(os.path.join(root, f))
        for root, _d, files in os.walk(slot)
        for f in files
    )
    assert mtime2 == mtime  # no retrain: the model files were untouched
    assert second.asDict() == first.asDict()
