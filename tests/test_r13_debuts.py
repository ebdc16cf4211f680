"""Round-13 debut operators/queries.

Wave 1: the Fleiss panel with the NB rater routed through the
Cavnar-Trenkle profile cap (VERDICT r12 ask #3) -- same closed form,
bounded broadcast model.
"""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_fleiss_capped_panel_same_shape_and_bounded_items(spark):
    from airflow_pipeline_text_processing_spark.plans.queries_llm import (
        eval_fleiss_kappa,
        eval_fleiss_kappa_capped,
    )

    cap = eval_fleiss_kappa_capped(spark, SF).collect()[0]
    unc = eval_fleiss_kappa(spark, SF).collect()[0]
    assert cap.asDict().keys() == unc.asDict().keys()
    assert cap.n_raters == 3
    # the capped NB abstains on docs with no in-profile trigram, and
    # Fleiss drops items missing a rating -- so capped items can only
    # be fewer, never more
    assert 0 < cap.n_items <= unc.n_items
    # kappa bounds: ppm kappa is in [-1e6, 1e6] by construction
    for row in (cap, unc):
        assert -1_000_000 <= row.kappa_ppm <= 1_000_000
        assert 0 <= row.pbar_ppm <= 1_000_000
        assert 0 <= row.pe_ppm <= 1_000_000


def test_fleiss_capped_rater_is_the_profile_capped_nb(spark):
    # the panel's third rater must agree exactly with the standalone
    # profile-capped classifier (same cap constant, same kernel)
    from airflow_pipeline_text_processing_spark.operators import lm as L
    from airflow_pipeline_text_processing_spark.plans.queries_llm import (
        _LANGID_PROFILE_K,
        _tspread,
    )

    docs = _tspread(spark, SF, "documents")
    standalone = L.nb_classify(
        docs,
        label_col="lang",
        feature_fn=L.char_trigrams,
        top_k_features=_LANGID_PROFILE_K,
    ).select("doc_id", "label_pred")
    again = L.nb_classify(
        docs,
        label_col="lang",
        feature_fn=L.char_trigrams,
        top_k_features=_LANGID_PROFILE_K,
    ).select("doc_id", "label_pred")
    assert standalone.exceptAll(again).count() == 0  # deterministic

    # and the capped model stays well-formed: every prediction is one
    # of the training labels
    labels = {r.lang for r in docs.select("lang").distinct().collect()}
    preds = {r.label_pred for r in standalone.distinct().collect()}
    assert preds <= labels


def test_ivfpq_index_search_equals_in_query_form(spark):
    """r13 wave 2 (VERDICT r12 ask #2): the persisted-index serve path
    with the sidecar auto depth returns BIT-IDENTICAL rows to the
    in-query trainer -- training determinism end-to-end."""
    from airflow_pipeline_text_processing_spark.plans.queries_llm import (
        sim_ivfpq_auto_depth,
        sim_ivfpq_index_search,
    )

    served = sim_ivfpq_index_search(spark, SF).collect()
    in_query = sim_ivfpq_auto_depth(spark, SF).collect()
    assert served == in_query
    assert len(served) == 15  # 3 queries x top-5
    # repeat serve from the already-built slot: same rows (the
    # amortized path is deterministic, not merely cached)
    assert sim_ivfpq_index_search(spark, SF).collect() == served


def test_vad16_query_segments_follow_the_planted_pattern(spark):
    """r13 wave 3 (VERDICT r12 ask #4): the 16-bit VAD query's planted
    loud/quiet frame pattern (loud iff frame % 3 == 0) must segment as
    planted for every doc -- 10 frames, 4 active, 4 segments."""
    from airflow_pipeline_text_processing_spark.plans.queries_llm import (
        mm_audio_vad16,
    )

    rows = mm_audio_vad16(spark, SF).collect()
    assert rows, "no docs at sf0.001?"
    for r in rows:
        assert r.n_frames == 10
        assert r.n_active == 4        # frames 0, 3, 6, 9
        assert r.n_segments == 4      # isolated singles


def test_langid_served_equals_train_in_query(spark):
    """r13 wave 5: the persisted-model serving path returns
    BIT-IDENTICAL predictions to the train-in-query capped classifier
    (training determinism end-to-end through a parquet roundtrip)."""
    from airflow_pipeline_text_processing_spark.plans.queries_llm import (
        text_langid_profile,
        text_langid_served,
    )

    served = text_langid_served(spark, SF).collect()
    in_query = text_langid_profile(spark, SF).collect()
    assert served == in_query
    assert served, "no docs at sf0.001?"
    # repeat serve from the saved model: identical again
    assert text_langid_served(spark, SF).collect() == served
