"""Round-11 debut operators: PSI drift and ROUGE-N clipped overlap.

PSI is pinned by construction properties (identity source -> 0, planted
disjoint-vocabulary drift -> large and ordered, every term
non-negative by the shared-sign identity) plus an independent
pure-Python reimplementation of the exact Q8 pipeline on a tiny corpus.
ROUGE-2 is pinned against hand-computed clipped counts, including the
repetition case clipping exists for.
"""

import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------- PSI


def _psi_rows(spark, rows):
    from airflow_pipeline_text_processing_spark.plans.queries_scale import (
        stats_psi_drift,
    )
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="psi_docs_")
    spark.createDataFrame(
        [(i, t, s, "en", len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, source string, lang string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return {r.source: r for r in stats_psi_drift(spark, d).collect()}


def test_psi_identity_source_is_zero(spark):
    # one source IS the corpus: p_b == q_b on every bucket -> PSI 0
    got = _psi_rows(spark, [("alpha beta gamma delta", "only")] * 4)
    assert got["only"].psi_q8 == 0


def test_psi_orders_planted_drift(spark):
    # three sources: 'same' mirrors the corpus-dominant vocabulary,
    # 'half' shares half of it, 'disjoint' shares none -> PSI strictly
    # increasing in drift, and zero only for the exact-mirror case
    base = "w0 w1 w2 w3 w4 w5 w6 w7"
    rows = (
        [(base, "same")] * 8
        + [("w0 w1 w2 w3 x0 x1 x2 x3", "half")] * 8
        + [("y0 y1 y2 y3 y4 y5 y6 y7", "disjoint")] * 8
    )
    got = _psi_rows(spark, rows)
    assert got["disjoint"].psi_q8 > got["half"].psi_q8 > 0
    # 'same' is NOT the whole corpus here, so its PSI is small but
    # non-negative; every psi_q8 is >= 0 by the shared-sign identity
    assert all(r.psi_q8 >= 0 for r in got.values())


def test_psi_matches_pure_python_q8_pipeline(spark):
    """Independent reimplementation of the EXACT integer pipeline
    (md5 bucketing, cross-multiplied ratio, Q8 log2 via the same
    mantissa-squaring recurrence, floor division) -- not a float
    approximation, so equality is exact."""
    import hashlib

    def toks(t):
        import re

        return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]

    def fixed_log2(num, den):
        t = (num << 16) // den
        e = t.bit_length() - 17
        m = t >> e
        frac = 0
        for _ in range(8):
            m = (m * m) >> 16
            bit = 1 if m >= (1 << 17) else 0
            frac = (frac << 1) | bit
            if bit:
                m >>= 1
        return e * 256 + frac

    rows = [
        ("the quick brown fox", "a"),
        ("the quick brown fox jumps", "a"),
        ("lorem ipsum dolor sit amet", "b"),
        ("the lorem the ipsum", "b"),
        ("zeta eta theta iota", "c"),
    ]
    sb, cb = {}, {}
    for t, s in rows:
        for w in toks(t):
            b = int(hashlib.md5(w.encode()).hexdigest()[:13], 16) % 256
            sb[(s, b)] = sb.get((s, b), 0) + 1
            cb[b] = cb.get(b, 0) + 1
    tots = {}
    for (s, b), c in sb.items():
        tots[s] = tots.get(s, 0) + c
    tot_c = sum(cb.values())
    want = {}
    for s in tots:
        acc = 0
        for (s2, b), c_sb in sb.items():
            if s2 != s:
                continue
            a_, b_ = c_sb * tot_c, tots[s] * cb[b]
            if max(a_, b_) == min(a_, b_):
                continue
            acc += abs(a_ - b_) * fixed_log2(max(a_, b_), min(a_, b_))
        want[s] = acc // (tots[s] * tot_c)
    got = _psi_rows(spark, rows)
    assert {s: r.psi_q8 for s, r in got.items()} == want


# -------------------------------------------------------------- ROUGE


def _rouge(spark, pairs, n=2):
    from airflow_pipeline_text_processing_spark.operators.text import (
        rouge_n_overlap,
    )

    df = spark.createDataFrame(
        pairs, "pair_id long, cand_text string, ref_text string"
    )
    return {r.pair_id: r for r in rouge_n_overlap(df, n=n).collect()}


def test_rouge2_hand_computed_with_clipping(spark):
    # cand bigrams: (the cat)x3, (cat the)x2  -- "the cat the cat the cat"
    # ref  bigrams: (the cat)x1, (cat sat)x1  -- "the cat sat"
    # clipped overlap = min(3,1) = 1; n_cand=5, n_ref=2
    got = _rouge(spark, [(0, "the cat the cat the cat", "the cat sat")])
    r = got[0]
    assert (r.n_cand_grams, r.n_ref_grams, r.n_clipped) == (5, 2, 1)
    assert r.precision_ppm == 1_000_000 // 5
    assert r.recall_ppm == 1_000_000 // 2
    p, q = 200_000, 500_000
    assert r.f1_ppm == (2 * p * q) // (p + q)


def test_rouge2_identical_and_disjoint(spark):
    got = _rouge(
        spark,
        [
            (1, "alpha beta gamma", "alpha beta gamma"),
            (2, "alpha beta gamma", "delta epsilon zeta"),
        ],
    )
    assert (got[1].precision_ppm, got[1].recall_ppm, got[1].f1_ppm) == (
        1_000_000, 1_000_000, 1_000_000,
    )
    assert (got[2].n_clipped, got[2].f1_ppm) == (0, 0)


def test_rouge2_short_sides_are_zero_not_null(spark):
    # one-token / empty sides have no bigrams: row survives with zeros
    got = _rouge(
        spark,
        [(3, "word", "the cat sat"), (4, "", ""), (5, "a b", "b")],
    )
    assert (got[3].n_cand_grams, got[3].precision_ppm) == (0, 0)
    assert (got[4].n_cand_grams, got[4].n_ref_grams, got[4].f1_ppm) == (0, 0, 0)
    assert (got[5].n_cand_grams, got[5].n_ref_grams) == (1, 0)
    assert got[5].recall_ppm == 0


def test_rouge1_unigram_mode(spark):
    # n=1: unigram overlap; cand "a a b", ref "a b b" -> clip a:1, b:1
    got = _rouge(spark, [(7, "a a b", "a b b")], n=1)
    r = got[7]
    assert (r.n_cand_grams, r.n_ref_grams, r.n_clipped) == (3, 3, 2)
    assert r.precision_ppm == r.recall_ppm == (2 * 1_000_000) // 3


# -------------------------------------------------------------- NDCG


def test_fixed_log2_py_matches_dataframe_kernel(spark):
    """The scalar reference must equal the distributed kernel bit-for-
    bit -- it inlines the NDCG discount literals, so any divergence
    would silently skew every discounted sum."""
    from airflow_pipeline_text_processing_spark.operators.lm import (
        fixed_log2,
        fixed_log2_py,
    )

    cases = [(2, 1), (3, 1), (6, 5), (1000, 7), (2**40, 3), (1, 1)]
    df = spark.createDataFrame(cases, "num long, den long")
    got = {
        (r.num, r.den): r.lg
        for r in fixed_log2(df, "num", "den", "lg").collect()
    }
    for num, den in cases:
        assert got[(num, den)] == fixed_log2_py(num, den)


def _ndcg(spark, system, relevance, k=3):
    from airflow_pipeline_text_processing_spark.operators.similarity import (
        ndcg_at_k,
    )

    s = spark.createDataFrame(system, "query_id long, neighbor_id long, rk long")
    r = spark.createDataFrame(relevance, "query_id long, neighbor_id long, rel long")
    return {row.query_id: row for row in ndcg_at_k(s, r, k=k).collect()}


def test_ndcg_perfect_reversed_and_empty(spark):
    from airflow_pipeline_text_processing_spark.operators.lm import (
        fixed_log2_py,
    )

    rel = [(1, 10, 3), (1, 11, 2), (1, 12, 1)]
    perfect = [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
    got = _ndcg(spark, perfect, rel)[1]
    assert got.ndcg_ppm == 1_000_000
    # hand-recompute the discounted sum with the same Q8 literals
    lg = [fixed_log2_py(r + 1, 1) for r in (1, 2, 3)]
    dcg = sum((g * 256000) // l for g, l in zip((3, 2, 1), lg))
    assert got.dcg_milli == got.idcg_milli == dcg

    rev = [(1, 12, 1), (1, 11, 2), (1, 10, 3)]
    got = _ndcg(spark, rev, rel)[1]
    want_dcg = sum((g * 256000) // l for g, l in zip((1, 2, 3), lg))
    assert got.dcg_milli == want_dcg and 0 < got.ndcg_ppm < 1_000_000
    assert got.ndcg_ppm == (want_dcg * 1_000_000) // dcg

    # served docs with NO relevance grade contribute 0; a query whose
    # relevance is all-zero reports ndcg 0 (guarded division)
    got = _ndcg(spark, [(2, 99, 1)], rel + [(2, 99, 0)])
    assert (got[2].dcg_milli, got[2].idcg_milli, got[2].ndcg_ppm) == (0, 0, 0)


def test_ndcg_registry_query_bounds(spark, sf_dir):
    """search_ndcg_eval on the driver embeddings: valid per-query rows,
    ndcg in (0, 1e6], and idcg equals the fixed ideal sum (grades are
    always 5..1 by construction)."""
    from airflow_pipeline_text_processing_spark.operators.lm import (
        fixed_log2_py,
    )
    from airflow_pipeline_text_processing_spark.plans.queries_llm import (
        search_ndcg_eval,
    )

    rows = search_ndcg_eval(spark, sf_dir).collect()
    assert [r.query_id for r in rows] == [3, 10, 42]
    lg = [fixed_log2_py(r + 1, 1) for r in range(1, 6)]
    ideal = sum((g * 256000) // l for g, l in zip((5, 4, 3, 2, 1), lg))
    for r in rows:
        assert r.idcg_milli == ideal
        assert 0 < r.ndcg_ppm <= 1_000_000


# ----------------------------------------------------------- lang-id


def test_char_trigrams_extraction(spark):
    from airflow_pipeline_text_processing_spark.operators.lm import (
        char_trigrams,
    )

    df = spark.createDataFrame(
        [("Ab  cD",), ("xy",), ("",)], "t string"
    ).select(char_trigrams(F.col("t")).alias("g"))
    got = [r.g for r in df.collect()]
    # whitespace collapses, text lowercases, 1-based sliding window
    assert got[0] == ["ab ", "b c", " cd"]
    # shorter than 3 chars: no trigrams (filtered, not padded)
    assert got[1] == [] and got[2] == []


def test_trigram_langid_beats_marker_heuristic(spark, sf_dir):
    """The r11 debut's reason to exist: on the driver corpus the
    Cavnar-Trenkle trigram NB must dominate the marker-word heuristic's
    accuracy (it reads sub-word signal markers can't see)."""
    import pyspark.sql.functions as F

    from airflow_pipeline_text_processing_spark.operators.text import lang_id
    from airflow_pipeline_text_processing_spark.plans.queries_llm import (
        text_langid_trigram,
    )

    tri_acc = (
        text_langid_trigram(spark, sf_dir).agg(F.avg("correct")).collect()[0][0]
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mk_acc = (
        lang_id(docs)
        .select(
            (F.col("predicted_lang") == F.col("labeled_lang"))
            .cast("int")
            .alias("c")
        )
        .agg(F.avg("c"))
        .collect()[0][0]
    )
    assert tri_acc > mk_acc


def test_trigram_langid_separates_real_languages(spark):
    """On genuinely multilingual text the trigram NB is near-perfect:
    plant 4 docs per language with characteristic function words and
    morphology; self-classification must recover every label."""
    from airflow_pipeline_text_processing_spark.operators.lm import (
        char_trigrams,
        nb_classify,
    )

    texts = {
        "en": [
            "the quick brown fox jumps over the lazy dog and runs away",
            "she said that they would have been there with the others",
            "a house with many windows and the door that never closes",
            "what would you think about the weather this time of year",
        ],
        "de": [
            "der schnelle braune fuchs springt ueber den faulen hund",
            "sie sagte dass sie dort gewesen waeren mit den anderen",
            "ein haus mit vielen fenstern und der tuer die nie schliesst",
            "was wuerdest du ueber das wetter um diese jahreszeit denken",
        ],
        "es": [
            "el rapido zorro marron salta sobre el perro perezoso",
            "ella dijo que habrian estado alli con los otros amigos",
            "una casa con muchas ventanas y la puerta que nunca cierra",
            "que pensarias sobre el clima en esta epoca del anio",
        ],
    }
    rows = []
    i = 0
    for lang, docs in texts.items():
        for t in docs:
            rows.append((i, t, lang))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = nb_classify(df, label_col="lang", feature_fn=char_trigrams)
    got = {r.doc_id: r.correct for r in out.collect()}
    assert all(got.values()), f"misclassified ids: {[k for k,v in got.items() if not v]}"
