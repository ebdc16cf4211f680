"""Round-12 fifth-wave debuts: classification report (macro P/R/F1),
BLEU-2 overlap, lexical diversity, rank-autocorrelation of dailies.

Every test checks the Spark operator against an INDEPENDENT pure-Python
reference built from first principles (collections.Counter + the scalar
fixed_log2_py kernel), never against the operator's own expressions.
"""

from __future__ import annotations

import re
from collections import Counter

from airflow_pipeline_text_processing_spark.operators.lm import fixed_log2_py
from airflow_pipeline_text_processing_spark.operators.quality import (
    classification_report,
)
from airflow_pipeline_text_processing_spark.operators.text import (
    LOG2E_Q8,
    bleu_overlap,
    lexical_diversity,
)


def _toks(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


# ---------------------------------------------------------------------
# classification_report
# ---------------------------------------------------------------------


def _report_py(pairs):
    """Reference macro report: dict label -> (n_actual, n_pred, tp, p, r, f1)."""
    labels = sorted({x for p in pairs for x in p})
    out = {}
    for l in labels:
        n_actual = sum(1 for a, _ in pairs if a == l)
        n_pred = sum(1 for _, b in pairs if b == l)
        tp = sum(1 for a, b in pairs if a == b == l)
        p = tp * 1_000_000 // n_pred if n_pred else 0
        r = tp * 1_000_000 // n_actual if n_actual else 0
        f1 = 2 * p * r // (p + r) if p + r else 0
        out[l] = (n_actual, n_pred, tp, p, r, f1)
    n = len(labels)
    out["__macro__"] = (
        sum(v[0] for v in out.values()),
        sum(v[1] for v in out.values()),
        sum(v[2] for v in out.values()),
        sum(v[3] for v in out.values()) // n,
        sum(v[4] for v in out.values()) // n,
        sum(v[5] for v in out.values()) // n,
    )
    return out


def test_classification_report_matches_reference(spark):
    pairs = (
        [("en", "en")] * 6
        + [("en", "de")] * 2
        + [("de", "de")] * 3
        + [("de", "unknown")] * 1
        + [("fr", "en")] * 2  # fr never predicted: recall>0 impossible, p=r=0
    )
    df = spark.createDataFrame(pairs, "a string, b string")
    rows = classification_report(df, "a", "b").collect()
    ref = _report_py(pairs)
    assert [r.label for r in rows] == sorted(ref)  # __macro__ sorts first
    for r in rows:
        exp = ref[r.label]
        got = (r.n_actual, r.n_pred, r.tp, r.precision_ppm, r.recall_ppm, r.f1_ppm)
        assert got == exp, (r.label, got, exp)


def test_classification_report_label_only_predicted(spark):
    # 'x' never occurs in actuals: n_actual=0, recall=0, no div-by-zero
    pairs = [("a", "x"), ("a", "a"), ("b", "b")]
    rows = {
        r.label: r
        for r in classification_report(
            spark.createDataFrame(pairs, "a string, b string"), "a", "b"
        ).collect()
    }
    assert rows["x"].n_actual == 0 and rows["x"].recall_ppm == 0
    assert rows["x"].n_pred == 1 and rows["x"].precision_ppm == 0
    assert rows["b"].f1_ppm == 1_000_000


# ---------------------------------------------------------------------
# bleu_overlap
# ---------------------------------------------------------------------


def _bleu_py(cand, ref):
    ct, rt = _toks(cand), _toks(ref)

    def grams(ts, n):
        return Counter(
            " ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)
        )

    res = {}
    for n in (1, 2):
        cg, rg = grams(ct, n), grams(rt, n)
        res[f"tot{n}"] = sum(cg.values())
        res[f"clip{n}"] = sum(min(c, rg[g]) for g, c in cg.items())
    c, r = len(ct), len(rt)
    nl1 = fixed_log2_py(res["tot1"] + 1, res["clip1"] + 1)
    nl2 = fixed_log2_py(res["tot2"] + 1, res["clip2"] + 1)
    bp = 0 if c >= r else (r - c) * LOG2E_Q8 // max(c, 1)
    return {
        "n_cand_tokens": c,
        "n_ref_tokens": r,
        "clip1": res["clip1"],
        "clip2": res["clip2"],
        "p1_ppm": (res["clip1"] + 1) * 1_000_000 // (res["tot1"] + 1),
        "p2_ppm": (res["clip2"] + 1) * 1_000_000 // (res["tot2"] + 1),
        "bp_q8": bp,
        "neg_log2_bleu2_q8": (nl1 + nl2) // 2 + bp,
    }


def _bleu_spark(spark, cases):
    df = spark.createDataFrame(
        [(i, c, r) for i, (c, r) in enumerate(cases)],
        "pair_id long, cand_text string, ref_text string",
    )
    return {r.pair_id: r for r in bleu_overlap(df).collect()}


def test_bleu_matches_reference(spark):
    cases = [
        ("the cat sat on the mat", "the cat sat on the mat"),  # exact
        ("the the the the", "the cat"),  # degenerate repetition: clipped
        ("cat", "the cat sat on the mat"),  # short candidate: BP bites
        ("completely different words here", "nothing shared at all ok"),
        ("", "some reference text"),  # empty candidate: c clamped to 1
        ("one two three", ""),  # empty reference
    ]
    got = _bleu_spark(spark, cases)
    assert set(got) == set(range(len(cases)))
    for i, (cand, ref) in enumerate(cases):
        exp = _bleu_py(cand, ref)
        row = got[i]
        for k, v in exp.items():
            assert getattr(row, k) == v, (i, k, getattr(row, k), v)


def test_bleu_exact_cover_scores_zero(spark):
    row = _bleu_spark(spark, [("a b c d", "a b c d")])[0]
    assert row.neg_log2_bleu2_q8 == 0 and row.bp_q8 == 0
    assert row.p1_ppm == 1_000_000 and row.p2_ppm == 1_000_000


def test_bleu_clipping_punishes_repetition(spark):
    # 4x 'the' vs one 'the' in the reference: clip1 = 1 of 4
    row = _bleu_spark(spark, [("the the the the", "the cat")])[0]
    assert row.clip1 == 1 and row.clip2 == 0
    # brevity penalty is 0 here (candidate longer than reference)
    assert row.bp_q8 == 0
    assert row.neg_log2_bleu2_q8 > 0


def test_bleu_brevity_penalty_direction(spark):
    # same unigram precision, shorter candidate must score strictly worse
    long_row = _bleu_spark(spark, [("the cat sat on", "the cat sat on")])[0]
    short_row = _bleu_spark(spark, [("the cat", "the cat sat on")])[0]
    assert short_row.bp_q8 == (4 - 2) * LOG2E_Q8 // 2
    assert short_row.neg_log2_bleu2_q8 > long_row.neg_log2_bleu2_q8


# ---------------------------------------------------------------------
# lexical_diversity
# ---------------------------------------------------------------------


def _lexdiv_py(text):
    c = Counter(_toks(text))
    n, v = sum(c.values()), len(c)
    h = sum(1 for x in c.values() if x == 1)
    if n < 2:
        return (n, v, h, 0, 0, 0)
    return (
        n,
        v,
        h,
        v * 1_000_000 // n,
        h * 1_000_000 // n,
        fixed_log2_py(max(v, 1), 1) * 1000 // fixed_log2_py(n, 1),
    )


def test_lexical_diversity_matches_reference(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "word word word word word"),  # V=1: herdan = 0/log2(5) = 0
        (2, "all distinct tokens here now"),  # all hapax, ttr = 1e6
        (3, "x"),  # N=1: everything guarded to 0
        (4, ""),  # N=0
        (5, "a b a b c d c d e f g h i j k"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = lexical_diversity(df).collect()
    assert [r.doc_id for r in got] == [0, 1, 2, 3, 4, 5]
    for r in got:
        exp = _lexdiv_py(dict(rows)[r.doc_id])
        assert (
            r.n_tokens,
            r.n_types,
            r.n_hapax,
            r.ttr_ppm,
            r.hapax_ppm,
            r.herdan_milli,
        ) == exp, (r.doc_id, exp)
    by_id = {r.doc_id: r for r in got}
    assert by_id[2].ttr_ppm == 1_000_000 and by_id[2].hapax_ppm == 1_000_000
    assert by_id[1].herdan_milli == 0
    # herdan of the all-distinct doc is exactly 1000 (log2 V == log2 N)
    assert by_id[2].herdan_milli == 1000


# ---------------------------------------------------------------------
# stats_acf_daily (query-level: reference replay on the real sf0.001)
# ---------------------------------------------------------------------


def _spearman_ppm(xs):
    """Reference rho_ppm of a list of (sort-key pairs already formed)."""
    n = len(xs)
    if n < 2:
        return 0
    rx = {id(p): i + 1 for i, p in enumerate(sorted(xs, key=lambda p: (p[0], p[2])))}
    ry = {id(p): i + 1 for i, p in enumerate(sorted(xs, key=lambda p: (p[1], p[2])))}
    sd2 = sum((rx[id(p)] - ry[id(p)]) ** 2 for p in xs)
    den = n**3 - n
    num = 1_000_000 * den - 6_000_000 * sd2
    return num // den  # python // floors, matching the pmod device


def test_acf_daily_matches_reference(spark, sf_dir):
    import pandas as pd

    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        stats_acf_daily,
    )

    got = {
        (r.event_type, r.lag): r for r in stats_acf_daily(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].dt.date
    ev["cents"] = (ev["value"] * 100).apply(lambda v: int(v // 1))
    daily = (
        ev.groupby(["event_type", "day"])["cents"].sum().reset_index(name="y")
    )
    for (etype, lag), row in got.items():
        g = daily[daily.event_type == etype].sort_values("day")
        ys = list(g["y"])
        days = list(g["day"])
        pairs = [
            (ys[i], ys[i + lag], days[i]) for i in range(len(ys) - lag)
        ]
        assert row.n_pairs == len(pairs)
        assert row.rho_ppm == _spearman_ppm(pairs), (etype, lag)


def test_acf_monotone_series_is_rho_one(spark):
    # structural sanity on the closed form: strictly increasing series
    # autocorrelates perfectly at every lag (both rank orders coincide)
    xs = [(i, i + 1, i) for i in range(10)]
    assert _spearman_ppm(xs) == 1_000_000
