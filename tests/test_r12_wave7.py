"""Round-12 seventh-wave debut: SQ8 asymmetric top-k search
(operators/similarity.py::sq8_topk), checked against an independent
numpy reference (quantize + dequantize + floor-dot built from scratch
here, never from the operator's expressions).
"""

from __future__ import annotations

import math

import numpy as np

from airflow_pipeline_text_processing_spark.operators.similarity import sq8_topk


def _vecs_df(spark, arr):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(arr)],
        "vec_id long, embedding array<float>",
    )


def _ref_scores(arr, qi):
    """Independent reference: (approx_fp, exact_fp) per candidate."""
    q = arr[qi].astype(np.float64)
    out = {}
    for j, c in enumerate(arr):
        if j == qi:
            continue
        c = c.astype(np.float64)
        vmin, vmax = float(c.min()), float(c.max())
        scale = vmax - vmin
        if scale == 0:
            codes = np.zeros_like(c)
        else:
            codes = np.minimum(np.floor((c - vmin) / scale * 255.0), 255.0)
        dq = vmin + codes / 255.0 * scale
        approx = sum(int(math.floor(float(a) * float(b) * 1e6)) for a, b in zip(q, dq))
        exact = sum(int(math.floor(float(a) * float(b) * 1e6)) for a, b in zip(q, c))
        out[j] = (approx, exact)
    return out


def test_sq8_matches_numpy_reference(spark):
    rng = np.random.RandomState(4)
    arr = rng.randn(30, 8).astype(np.float32)
    df = _vecs_df(spark, arr)
    got = sq8_topk(df.filter("vec_id < 3"), df, k=4, shortlist=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for qi in range(3):
        ref = _ref_scores(arr, qi)
        # the shortlist is the top-10 by (approx desc, id asc); the final
        # ranks are by (exact desc, id asc) within it
        short = sorted(ref, key=lambda j: (-ref[j][0], j))[:10]
        expect = sorted(short, key=lambda j: (-ref[j][1], j))[:4]
        rows = sorted(by_q[qi], key=lambda r: r.rank)
        assert [r.neighbor_id for r in rows] == expect, qi
        for r in rows:
            assert (r.approx_fp, r.exact_fp) == ref[r.neighbor_id]


def test_sq8_full_shortlist_equals_exact_bruteforce(spark):
    # with shortlist >= corpus, the rerank sees everything: the output
    # must equal the exact-dot brute force ranking regardless of
    # quantization error
    rng = np.random.RandomState(8)
    arr = rng.randn(25, 6).astype(np.float32)
    df = _vecs_df(spark, arr)
    got = sq8_topk(df.filter("vec_id < 2"), df, k=5, shortlist=100).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for qi in range(2):
        ref = _ref_scores(arr, qi)
        expect = sorted(ref, key=lambda j: (-ref[j][1], j))[:5]
        rows = sorted(by_q[qi], key=lambda r: r.rank)
        assert [r.neighbor_id for r in rows] == expect


def test_sq8_quantization_error_bounded(spark):
    # |approx - exact| per pair is bounded by sum_j |q_j| * step_j * 1e6
    # plus one floor unit per component
    rng = np.random.RandomState(1)
    arr = rng.randn(20, 8).astype(np.float32)
    df = _vecs_df(spark, arr)
    rows = sq8_topk(df.filter("vec_id < 5"), df, k=3, shortlist=19).collect()
    for r in rows:
        q = arr[r.query_id].astype(np.float64)
        c = arr[r.neighbor_id].astype(np.float64)
        step = (c.max() - c.min()) / 255.0
        bound = (np.abs(q).sum() * step) * 1e6 + len(q)
        assert abs(r.approx_fp - r.exact_fp) <= bound


def test_sq8_flat_vector_degenerates_to_min(spark):
    # a constant candidate quantizes to code 0 everywhere and
    # dequantizes back to its own constant: approx == exact
    arr = np.vstack(
        [np.ones(4, np.float32) * 2.5, np.arange(4, dtype=np.float32)]
    )
    df = _vecs_df(spark, arr)
    rows = sq8_topk(df.filter("vec_id = 1"), df, k=1, shortlist=5).collect()
    assert len(rows) == 1 and rows[0].neighbor_id == 0
    assert rows[0].approx_fp == rows[0].exact_fp


# ---------------------------------------------------------------------
# fleiss_kappa (wave 8): independent reference from the textbook formula
# ---------------------------------------------------------------------


def _fleiss_py(items):
    """items: list of per-item label lists (equal length n)."""
    n = len(items[0])
    cats = sorted({c for row in items for c in row})
    counts = [
        {c: row.count(c) for c in cats} for row in items
    ]
    N = len(items)
    s = sum(v * (v - 1) for row in counts for v in row.values())
    t2 = sum(
        sum(row[c] for row in counts) ** 2 for c in cats
    )
    num = (s * N * n - (n - 1) * t2) * 1_000_000
    den = (n - 1) * (N * N * n * n - t2)
    return {
        "n_items": N,
        "s_pairs": s,
        "sum_t2": t2,
        "pbar_ppm": s * 1_000_000 // (N * n * (n - 1)),
        "pe_ppm": t2 * 1_000_000 // (N * N * n * n),
        "kappa_ppm": 0 if den == 0 else num // den,  # python // floors
    }


def _fleiss_spark(spark, items, n_raters=3):
    from airflow_pipeline_text_processing_spark.operators.quality import (
        fleiss_kappa,
    )

    rows = [
        (i, lbl) for i, labels in enumerate(items) for lbl in labels
    ]
    df = spark.createDataFrame(rows, "item_id long, label string")
    return fleiss_kappa(df, "item_id", "label", n_raters=n_raters).collect()[0]


def test_fleiss_matches_reference(spark):
    items = [
        ["a", "a", "a"],
        ["a", "a", "b"],
        ["b", "b", "b"],
        ["a", "b", "c"],
        ["c", "c", "b"],
        ["b", "a", "b"],
    ]
    row = _fleiss_spark(spark, items)
    ref = _fleiss_py(items)
    for k, v in ref.items():
        assert getattr(row, k) == v, (k, getattr(row, k), v)
    assert 0 < row.kappa_ppm < 1_000_000


def test_fleiss_unanimity_degenerates_to_zero(spark):
    # every rating one category: chance agreement is 1, denominator 0
    row = _fleiss_spark(spark, [["x", "x", "x"]] * 5)
    assert row.kappa_ppm == 0 and row.pbar_ppm == 1_000_000


def test_fleiss_negative_for_systematic_disagreement(spark):
    items = [["a", "b", "c"]] * 6  # never two raters agree
    row = _fleiss_spark(spark, items)
    ref = _fleiss_py(items)
    assert row.kappa_ppm == ref["kappa_ppm"] < 0


def test_fleiss_excludes_partial_panels(spark):
    from airflow_pipeline_text_processing_spark.operators.quality import (
        fleiss_kappa,
    )

    rows = [(0, "a"), (0, "a"), (0, "b"), (1, "a"), (1, "b")]  # item 1: 2 raters
    df = spark.createDataFrame(rows, "item_id long, label string")
    row = fleiss_kappa(df, "item_id", "label", n_raters=3).collect()[0]
    assert row.n_items == 1  # only the full panel counts
    ref = _fleiss_py([["a", "a", "b"]])
    assert row.kappa_ppm == ref["kappa_ppm"]


# ---------------------------------------------------------------------
# readability (wave 9): independent reference from the published formulas
# ---------------------------------------------------------------------


def _readability_py(text):
    words = _re.findall(r"[a-z0-9]+", text.lower())
    w = len(words)
    s = max(len(_re.findall(r"[.!?]+", text)), 1)
    y = sum(max(len(_re.findall(r"[aeiouy]+", wd)), 1) for wd in words)
    if w == 0:
        return (0, s, 0, 0, 0, 0, 0)
    return (
        w,
        s,
        y,
        1000 * w // s,
        1000 * y // w,
        390 * w // s + 11800 * y // w - 15590,
        206835 - 1015 * w // s - 84600 * y // w,
    )


def test_readability_matches_reference(spark):
    import re as _re_mod

    global _re
    _re = _re_mod
    rows = [
        (0, "The cat sat. The dog ran! Did it?"),
        (1, "Incomprehensibility notwithstanding, perspicacious "
            "individuals nevertheless persevere."),
        (2, "no punctuation at all just words"),
        (3, ""),  # zero words: all metrics guarded to 0
        (4, "a. b. c. d."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from airflow_pipeline_text_processing_spark.operators.text import (
        readability,
    )

    got = readability(df).collect()
    for r in got:
        w, s, y, wps, spw, fk, ease = _readability_py(dict(rows)[r.doc_id])
        if w == 0:
            assert (r.n_words, r.wps_milli, r.spw_milli, r.fk_grade_milli,
                    r.flesch_ease_milli) == (0, 0, 0, 0, 0)
        else:
            assert (r.n_words, r.n_sentences, r.n_syllables) == (w, s, y)
            assert (r.wps_milli, r.spw_milli) == (wps, spw)
            assert (r.fk_grade_milli, r.flesch_ease_milli) == (fk, ease)
    by = {r.doc_id: r for r in got}
    # the polysyllabic doc must grade far harder than the primer
    assert by[1].fk_grade_milli > by[0].fk_grade_milli + 5000
    assert by[1].flesch_ease_milli < by[0].flesch_ease_milli


# ---------------------------------------------------------------------
# events_cusum_daily (wave 10): closed windowed form vs the textbook
# sequential recurrence
# ---------------------------------------------------------------------


def _cusum_ref(series):
    """Textbook recurrences, run sequentially."""
    n = len(series)
    sy = sum(series)
    devs = [n * y - sy for y in series]
    up, down, out = 0, 0, []
    for d in devs:
        up = max(0, up + d)
        down = max(0, down - d)
        out.append((d, up, down))
    return out


def test_cusum_closed_form_equals_recurrence(spark, sf_dir):
    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        events_cusum_daily,
    )

    rows = events_cusum_daily(spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert by_type
    import pandas as pd

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].dt.date
    ev["cents"] = (ev["value"] * 100).apply(lambda v: int(v // 1))
    daily = (
        ev.groupby(["event_type", "day"])["cents"].sum().reset_index(name="y")
    )
    for etype, got in by_type.items():
        got = sorted(got, key=lambda r: r.day)
        series = list(
            daily[daily.event_type == etype].sort_values("day")["y"]
        )
        ref = _cusum_ref(series)
        assert len(got) == len(ref)
        for r, (d, up, down) in zip(got, ref):
            assert (r.dev_scaled, r.cusum_up, r.cusum_down) == (d, up, down)


def test_cusum_detects_planted_shift():
    # structural sanity on the reference itself: a mean shift makes the
    # upward statistic grow linearly after the break while the
    # pre-break values stay near zero
    series = [100] * 20 + [200] * 20
    ref = _cusum_ref(series)
    pre = max(up for _, up, _ in ref[:20])
    post = ref[-1][1]
    assert post > pre * 3


# ---------------------------------------------------------------------
# stats_runs_test / events_dow_profile (wave 12): references replayed
# on the real sf data
# ---------------------------------------------------------------------


def test_runs_test_matches_reference(spark, sf_dir):
    import pandas as pd

    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        stats_runs_test,
    )

    got = {r.event_type: r for r in stats_runs_test(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].dt.date
    ev["cents"] = (ev["value"] * 100).apply(lambda v: int(v // 1))
    daily = (
        ev.groupby(["event_type", "day"])["cents"].sum().reset_index(name="y")
    )
    for etype, row in got.items():
        g = daily[daily.event_type == etype]
        order = sorted(zip(g["y"], g["day"]))
        n = len(order)
        low_keys = {(y, d) for y, d in order[: (n + 1) // 2]}
        seq = [
            1 if (y, d) in low_keys else 0
            for d, y in sorted(zip(g["day"], g["y"]))
        ]
        runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
        n1, n2 = sum(seq), n - sum(seq)
        assert (row.n_low, row.n_high, row.n_runs) == (n1, n2, runs), etype
        assert row.expected_runs_milli == 2000 * n1 * n2 // (n1 + n2) + 1000
        exp_var = (
            2_000_000 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
            // ((n1 + n2) ** 2 * (n1 + n2 - 1))
        )
        assert row.var_runs_micro == exp_var


def test_runs_reference_detects_clustering():
    # sanity on the statistic itself: a perfectly clustered sequence
    # has 2 runs, far below E[R] ~ n/2 + 1
    seq = [1] * 10 + [0] * 10
    runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    assert runs == 2
    expected = 2 * 10 * 10 / 20 + 1  # 11
    assert runs < expected / 3


def test_dow_profile_matches_reference(spark, sf_dir):
    import pandas as pd

    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        events_dow_profile,
    )

    got = events_dow_profile(spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].dt.date
    ev["cents"] = (ev["value"] * 100).apply(lambda v: int(v // 1))
    daily = (
        ev.groupby(["event_type", "day"])["cents"].sum().reset_index(name="y")
    )
    daily["dow"] = pd.to_datetime(daily["day"]).dt.isocalendar().day
    for r in got:
        g = daily[daily.event_type == r.event_type]
        sub = g[g.dow == r.dow_iso]
        assert r.n_days == len(sub)
        assert r.sum_cents == int(sub["y"].sum())
        nd_all, sum_all = len(g), int(g["y"].sum())
        exp = (
            0
            if sum_all == 0 or len(sub) == 0
            else 1000 * nd_all * int(sub["y"].sum()) // (len(sub) * sum_all)
        )
        assert r.dow_index_milli == exp
    # indexes average to ~1000 by construction
    import statistics

    by_type = {}
    for r in got:
        by_type.setdefault(r.event_type, []).append(r.dow_index_milli)
    for vals in by_type.values():
        assert 800 < statistics.mean(vals) < 1200


# ---------------------------------------------------------------------
# stats_mad_outliers (wave 14): reference replay on the real sf data
# ---------------------------------------------------------------------


def test_mad_outliers_match_reference(spark, sf_dir):
    import pandas as pd

    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        _MAD_CUT_MILLI,
        stats_mad_outliers,
    )

    got = stats_mad_outliers(spark, sf_dir).collect()
    assert got
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].dt.date
    ev["cents"] = (ev["value"] * 100).apply(lambda v: int(v // 1))
    daily = (
        ev.groupby(["event_type", "day"])["cents"].sum().reset_index(name="y")
    )

    def lower_median(pairs):
        # pairs: (value, tiebreak); lower median = rank (n+1)//2 in
        # (value, tiebreak) order
        s = sorted(pairs)
        return s[(len(s) + 1) // 2 - 1][0]

    by_type = {}
    for etype in daily.event_type.unique():
        g = daily[daily.event_type == etype]
        med = lower_median(list(zip(g["y"], g["day"])))
        devs = [(abs(int(y) - med), d) for y, d in zip(g["y"], g["day"])]
        mad = lower_median(devs)
        by_type[etype] = (med, mad)
    for r in got:
        med, mad = by_type[r.event_type]
        assert r.med_cents == med and r.mad_cents == mad, r.event_type
        assert r.dev_cents == abs(r.y_cents - med)
        assert r.is_outlier == (r.dev_cents * 1000 > _MAD_CUT_MILLI * mad)


def test_mad_robust_to_planted_wild_day():
    # the statistic itself: one wild value barely moves median/MAD
    def lower_median(vals):
        s = sorted(vals)
        return s[(len(s) + 1) // 2 - 1]

    base = [100, 101, 102, 103, 104, 105, 106]
    med0 = lower_median(base)
    wild = base + [10_000]
    med1 = lower_median(wild)
    assert abs(med1 - med0) <= 2
    mad1 = lower_median([abs(v - med1) for v in wild])
    # the wild day sits far beyond the cut; the ordinary days inside
    assert 10_000 - med1 > 4448 * mad1 / 1000
    assert all((abs(v - med1)) * 1000 <= 4448 * mad1 for v in base[1:-1])
