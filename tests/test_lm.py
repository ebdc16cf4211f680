"""Exact fixed-point log2 kernel + the LM operators built on it
(operators/lm.py).

The kernel claim under test: ``fixed_log2`` equals a pure-Python
big-int reference BIT-EXACTLY (so any engine implementing the same
integer chain agrees -- cross-engine parity is then a structural fact,
not a float coincidence), and approximates true log2 within
2^-8 + 2^-16 bits.  The operator claims: surprisal ranks rare-token
documents above common-token documents, and Naive Bayes recovers a
vocabulary-separable labeling exactly.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from airflow_pipeline_text_processing_spark.operators.lm import (
    FRAC_BITS,
    fixed_log2,
    nb_classify,
    unigram_surprisal,
)


def _ref_fixed_log2(num: int, den: int) -> int:
    """Pure-Python big-int reference of the exact kernel."""
    t = (num << 16) // den
    e = t.bit_length() - 17
    m = t >> e
    frac = 0
    for _ in range(FRAC_BITS):
        m = (m * m) >> 16
        frac <<= 1
        if m >= (1 << 17):
            m >>= 1
            frac |= 1
    return e * 256 + frac


def test_fixed_log2_matches_reference_and_true_log2(spark):
    # deterministic pseudo-random (num, den) pairs spanning 1..2^46
    pairs = []
    x = 123456789
    for _ in range(300):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        den = 1 + x % (10**9)
        num = den + x % (1 << 46 - 1) % (1 << 45)
        pairs.append((num, den))
    pairs += [(1, 1), (2, 1), (3, 2), (2**46, 1), (47, 46)]
    df = spark.createDataFrame(pairs, "num long, den long")
    got = {
        (r.num, r.den): r.s_q8
        for r in fixed_log2(df, "num", "den", "s_q8").collect()
    }
    for num, den in pairs:
        ref = _ref_fixed_log2(num, den)
        assert got[(num, den)] == ref, (num, den)
        true = math.log2(num / den) * 256
        # truncation-only error: kernel floors, never exceeds truth
        assert true - (2 + 256 * 2**-16) <= got[(num, den)] <= true + 1e-6


def test_unigram_surprisal_ranks_rare_above_common(spark):
    # 40 docs of one common sentence; 2 docs of unique rare words
    rows = [(i, "the cat sat on the mat") for i in range(40)]
    rows += [(100, "zyx wvu tsr qpo"), (101, "aab bbc ccd dde")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in unigram_surprisal(docs).collect()}
    assert len(out) == 42
    common_bpt = out[0].bpt_milli
    assert out[100].bpt_milli > common_bpt
    assert out[101].bpt_milli > common_bpt
    # identical docs score identically (pure function of content)
    assert out[0].bits_q8 == out[39].bits_q8
    # per-token surprisal of the rare docs must approach log2(N+V)
    # (each token occurs once): sanity that magnitudes are log-scaled
    assert out[100].bpt_milli < 20_000  # < 20 bits/token


def test_nb_classify_separable_vocabulary(spark):
    rows = []
    for i in range(30):
        rows.append((i, "alpha beta gamma delta", "greek"))
        rows.append((100 + i, "north south east west", "compass"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = nb_classify(docs, label_col="lang").collect()
    assert len(out) == 60
    assert all(r.correct == 1 for r in out)
    assert {r.label_pred for r in out} == {"greek", "compass"}


def test_nb_profile_cut_restricts_model_and_drops_oop_docs(spark):
    """top_k_features (r12): the model keeps only the union of each
    class's top-k features; scoring ignores out-of-profile features, and
    a document with NO in-profile feature drops out of the output."""
    rows = []
    for i in range(20):
        # 'alpha' dominates greek; 'north' dominates compass; the other
        # words are the tail the k=1 profile must cut
        rows.append((i, "alpha alpha alpha beta gamma", "greek"))
        rows.append((100 + i, "north north north south east", "compass"))
    # doc made ONLY of tail words: out-of-profile at k=1, so it vanishes
    rows.append((999, "beta gamma south east", "greek"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = nb_classify(docs, label_col="lang", top_k_features=1).collect()
    assert {r.doc_id for r in out} == {r[0] for r in rows} - {999}
    assert all(r.correct == 1 for r in out)
    # uncapped keeps everyone, including 999
    full = nb_classify(docs, label_col="lang").collect()
    assert len(full) == len(rows)
    # k large enough to keep the whole vocabulary == exact uncapped model
    capped_all = nb_classify(docs, label_col="lang", top_k_features=100).collect()
    assert capped_all == full


def test_nb_plan_broadcasts_model_not_corpus(spark):
    rows = [(i, "w%d common token" % (i % 7), "l%d" % (i % 3)) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    plan = nb_classify(docs, label_col="lang")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bigram_backoff_fires_on_unseen_pairs(spark):
    from airflow_pipeline_text_processing_spark.operators.lm import (
        BACKOFF_PENALTY_Q8,
        bigram_surprisal_backoff,
    )

    train = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "the dog sat")],
        "doc_id long, text string",
    )
    evald = spark.createDataFrame(
        [
            (10, "the cat sat"),   # every bigram seen: zero backoff
            (11, "cat the"),       # 'cat the' unseen: one backoff
            (12, "zzz"),           # single OOV token: unigram path only
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_surprisal_backoff(train, evald).collect()}
    assert out[10].n_backoff == 0
    assert out[11].n_backoff == 1
    assert out[12].n_backoff == 0 and out[12].n_tokens == 1
    # a fully-seen doc must be cheaper per token than its backoff sibling
    assert out[10].bpt_milli < out[11].bpt_milli
    # OOV unigram surprisal: fixed_log2(N + V, 1); N=9 tokens, V=5
    assert out[12].total_q8 == _ref_fixed_log2(9 + 5, 1)
    # penalty constant is log2(2.5)*256 truncated
    import math
    assert BACKOFF_PENALTY_Q8 == int(math.log2(2.5) * 256)


def test_bigram_plan_no_cartesian_and_broadcast_models(spark):
    from airflow_pipeline_text_processing_spark.operators.lm import (
        bigram_surprisal_backoff,
    )

    train = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(50)],
        "doc_id long, text string",
    )
    evald = spark.createDataFrame(
        [(100 + i, "alpha beta zeta") for i in range(50)],
        "doc_id long, text string",
    )
    plan = (
        bigram_surprisal_backoff(train, evald)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_lm_scale_smoke_200k_docs(spark):
    """Unigram surprisal + NB classifier over 200k generated documents
    with a skewed vocabulary (one hot token in every doc): the corpus
    side must stay explode + groupBy + broadcast join, finishing within
    a generous wall bound; spot values recomputed exactly in Python."""
    import time

    import pyspark.sql.functions as F
    from airflow_pipeline_text_processing_spark.operators.lm import (
        nb_classify,
        unigram_surprisal,
    )

    n = 200_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("hot common"),
            F.lit(" tok"), (F.col("id") % 1000).cast("string"),
            F.lit(" tok"), ((F.col("id") + 7) % 1000).cast("string"),
        ).alias("text"),
        (F.col("id") % 4).cast("string").alias("lang"),
    )
    t0 = time.time()
    out = unigram_surprisal(docs)
    assert out.count() == n
    nb = nb_classify(docs, label_col="lang")
    assert nb.count() == n
    wall = time.time() - t0
    assert wall < 120, f"LM family too slow at 200k docs: {wall:.1f}s"

    # exact spot check for doc 0: tokens hot, common, tok0, tok7
    # counts: hot/common appear n times; tokN appears 400 times
    # (200 as id%1000==N plus 200 as (id+7)%1000==N); N=4n tokens,
    # V=1002 distinct
    row = out.filter(F.col("doc_id") == 0).collect()[0]
    N, V = 4 * n, 1002
    exp = (
        2 * _ref_fixed_log2(N + V, n + 1)
        + 2 * _ref_fixed_log2(N + V, 400 + 1)
    )
    assert row.bits_q8 == exp
    assert row.n_tokens == 4


def test_cooccurrence_pmi_planted_collocation(spark):
    """A pair that only ever appears together must outrank independent
    pairs, with the exactly-representable PMI value: df_a = df_b =
    df_ab = 4 over N = 16 docs -> PMI = log2(16/4) = 2.0 -> Q8 512."""
    from airflow_pipeline_text_processing_spark.operators.lm import (
        cooccurrence_pmi,
    )

    fillers = ["aa bb", "bb cc", "cc aa", "aa cc"]
    rows = [(i, "xx yy " + fillers[i % 4]) for i in range(4)]
    rows += [(4 + i, fillers[i % 4] + " " + fillers[(i + 1) % 4]) for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = cooccurrence_pmi(docs, top_n=5).collect()
    top = out[0]
    assert (top.tok_a, top.tok_b) == ("xx", "yy")
    assert (top.df_a, top.df_b, top.df_ab) == (4, 4, 4)
    assert top.pmi_fp == 2 * 256
    # every other surviving pair is strictly less associated
    assert all(r.pmi_fp < 512 for r in out[1:])
