"""Dedicated tests for the round-10 sixth-wave debuts: Zipf log-log
slope and one-way ANOVA F.  Pure-Python references reimplement the
identical fixed-point arithmetic (the repo's reference-test style) so
every floor/clamp is pinned independently of the oracle data."""

from __future__ import annotations

import datetime as dt
import math
import os
import random
import tempfile

from airflow_pipeline_text_processing_spark.operators.lm import (
    zipf_loglog_slope,
)

_Q, FRAC = 16, 8


def _ref_fixed_log2(num: int, den: int) -> int:
    t = (num << _Q) // den
    e = t.bit_length() - (_Q + 1)
    m = t >> e if e >= 0 else t << (-e)
    f = 0
    for _ in range(FRAC):
        sq = (m * m) >> _Q
        if sq >= 1 << (_Q + 1):
            m, f = sq // 2, f * 2 + 1
        else:
            m, f = sq, f * 2
    return e * (1 << FRAC) + f


def _ref_zipf(counts: list[int]) -> tuple[int, int]:
    """counts already sorted the way the operator ranks them."""
    n = len(counts)
    xs = [_ref_fixed_log2(r, 1) for r in range(1, n + 1)]
    ys = [_ref_fixed_log2(c, 1) for c in counts]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    num = (n * sxy - sx * sy) * 1_000_000
    den = n * sxx - sx * sx
    return n, (num // den if n >= 2 else 0)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_zipf_slope_matches_reference(spark):
    # corpus with known counts: token wK repeated (40 - 3k) times
    texts = []
    counts = {}
    for k in range(12):
        tok, c = f"w{k:02d}", 40 - 3 * k
        counts[tok] = c
        texts.append(" ".join([tok] * c))
    row = zipf_loglog_slope(
        _docs_df(spark, texts), topn=100
    ).collect()[0]
    ordered = [
        c for _t, c in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    ]
    n_ref, slope_ref = _ref_zipf(ordered)
    assert (row.n_terms, row.slope_ppm) == (n_ref, slope_ref)
    # a decaying rank-frequency curve slopes negative
    assert row.slope_ppm < 0


def test_zipf_slope_ties_and_topn_cut(spark):
    # 5 tokens, two tied counts -- tie order is (cnt desc, token asc);
    # topn=3 keeps only the first 3 of the tie-ordered list
    texts = ["aa aa aa bb bb cc cc dd ee"]
    row = zipf_loglog_slope(_docs_df(spark, texts), topn=3).collect()[0]
    n_ref, slope_ref = _ref_zipf([3, 2, 2])  # aa, bb, cc
    assert (row.n_terms, row.slope_ppm) == (n_ref, slope_ref)


def test_zipf_degenerate_single_term(spark):
    row = zipf_loglog_slope(_docs_df(spark, ["solo solo"]), topn=10).collect()[0]
    assert (row.n_terms, row.slope_ppm) == (1, 0)


# ---------------------------------------------------------------------
# one-way ANOVA F
# ---------------------------------------------------------------------


def _ref_anova(groups: dict[str, list[int]]):
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    sb_all = sum(
        (sum(v) * sum(v)) // len(v) for v in groups.values()
    )
    s_all = sum(sum(v) for v in groups.values())
    q_all = sum(y * y for v in groups.values() for y in v)
    ssb = max(0, sb_all - (s_all * s_all) // n)
    ssw = q_all - sb_all
    if k < 2 or n <= k or ssw == 0:
        f = 0
    else:
        num, den = ssb * (n - k), ssw * (k - 1)
        if num >= den * 10**12:  # the engines' overflow clamp
            f = 10**15
        else:
            f = (num // den) * 1000 + ((num % den) * 1000) // den
    return k, n, ssb, ssw, f


def _anova_run(spark, groups: dict[str, list[float]]):
    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        stats_anova_f,
    )

    rows = []
    eid = 0
    for etype, ys in groups.items():
        for d, y in enumerate(ys):
            rows.append(
                (eid, dt.datetime(2024, 1, 1) + dt.timedelta(days=d),
                 1, etype, float(y), "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as td:
        ev.write.parquet(os.path.join(td, "events.parquet"))
        return stats_anova_f(spark, td).collect()[0]


def test_anova_f_matches_reference(spark):
    rng = random.Random(21)
    groups = {
        "lo": [rng.uniform(1, 5) for _ in range(8)],
        "mid": [rng.uniform(4, 9) for _ in range(10)],
        "hi": [rng.uniform(9, 15) for _ in range(7)],
    }
    got = _anova_run(spark, groups)
    cents = {
        k: [int(math.floor(y * 100)) for y in v] for k, v in groups.items()
    }
    k, n, ssb, ssw, f = _ref_anova(cents)
    assert (
        got.k_groups, got.n_days, got.ssb_cents2, got.ssw_cents2, got.f_milli
    ) == (k, n, ssb, ssw, f)
    # well-separated means -> large F
    assert got.f_milli > 10_000


def test_anova_f_identical_groups_is_near_zero(spark):
    groups = {"a": [5.0] * 6, "b": [5.0] * 6, "c": [5.0] * 6}
    got = _anova_run(spark, groups)
    # zero within-group variance -> SSW = 0 -> guarded F of 0
    assert got.ssw_cents2 == 0 and got.f_milli == 0
    groups2 = {"a": [5.0, 7.0] * 3, "b": [7.0, 5.0] * 3}
    got2 = _anova_run(spark, groups2)
    # identical group means, real within-variance: SSB clamps to ~0
    assert got2.ssb_cents2 == 0 and got2.f_milli == 0


def test_anova_f_floor_parity_on_uneven_groups(spark):
    # group sizes that do NOT divide their sums -- the per-group floor
    # (t_g - t_g % n_g)/n_g is exactly what the reference's // does
    groups = {
        "x": [1.01, 2.02, 3.03],
        "y": [2.5, 2.5, 2.5, 9.99],
        "z": [7.77],
    }
    got = _anova_run(spark, groups)
    cents = {
        k: [int(math.floor(y * 100)) for y in v] for k, v in groups.items()
    }
    assert (
        got.k_groups, got.n_days, got.ssb_cents2, got.ssw_cents2, got.f_milli
    ) == _ref_anova(cents)


# ---------------------------------------------------------------------
# Theil-Sen robust median slope
# ---------------------------------------------------------------------


def _ref_theil_sen(day_cents: list[tuple[int, int]]):
    slopes = []
    for i in range(len(day_cents)):
        for j in range(i + 1, len(day_cents)):
            dx = day_cents[j][0] - day_cents[i][0]
            num = (day_cents[j][1] - day_cents[i][1]) * 1000
            slopes.append(num // dx)  # python // floors, like the device
    slopes.sort()
    return len(slopes), slopes[(len(slopes) + 1) // 2 - 1]


def test_theil_sen_matches_reference_and_resists_outlier(spark):
    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        stats_theil_sen,
    )

    rng = random.Random(33)
    rows, series = [], {}
    eid = 0
    for etype in ("steady", "spiked"):
        pts = []
        for d in range(15):
            y = 10.0 + 2.0 * d + rng.uniform(0, 0.5)
            if etype == "spiked" and d == 7:
                y += 10_000.0  # one wild day
            pts.append((d, y))
            rows.append(
                (eid, dt.datetime(2024, 6, 1) + dt.timedelta(days=d),
                 1, etype, y, "{}")
            )
            eid += 1
        series[etype] = pts
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as td:
        ev.write.parquet(os.path.join(td, "events.parquet"))
        got = {
            r.event_type: (r.n_slopes, r.median_slope_milli)
            for r in stats_theil_sen(spark, td).collect()
        }
    for etype, pts in series.items():
        cents = [(d, int(math.floor(y * 100))) for d, y in pts]
        assert got[etype] == _ref_theil_sen(cents), etype
    # the median slope shrugs off the spike: both series read ~2/day
    # (200 cents = 200_000 milli-cents), while an OLS slope on the
    # spiked series would be wildly off
    assert abs(got["steady"][1] - 200_000) < 60_000
    assert abs(got["spiked"][1] - 200_000) < 60_000


def test_anova_f_clamps_astronomical_quotients(spark):
    # huge between-group separation with a near-zero (but nonzero)
    # within-group variance: the raw quotient would overflow BIGINT
    # (Spark wraps, DuckDB throws) -- both engines must report the
    # 10^15-milli cap instead
    groups = {
        "a": [10_000_000.00, 10_000_000.00, 10_000_000.01],
        "b": [20_000_000.00, 20_000_000.00, 20_000_000.00],
    }
    got = _anova_run(spark, groups)
    cents = {
        k: [int(math.floor(y * 100)) for y in v] for k, v in groups.items()
    }
    ref = _ref_anova(cents)
    assert (
        got.k_groups, got.n_days, got.ssb_cents2, got.ssw_cents2, got.f_milli
    ) == ref
    assert got.f_milli == 10**15  # the clamp actually fired
