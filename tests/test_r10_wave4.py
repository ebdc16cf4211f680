"""Dedicated tests for the round-10 fourth-wave debuts: RA link
prediction, Markov transition matrix, Gopher §A1 quality rules, and
Kendall tau-a.  Each operator gets (a) a seeded random-reference
comparison against a brute-force pure-Python implementation and/or
(b) constructed boundary cases pinning the edge logic the sf0.01
oracle data may not exercise (the repo convention: oracle + property
pytest per operator)."""

from __future__ import annotations

import itertools
import random

import pyspark.sql.functions as F

from airflow_pipeline_text_processing_spark.operators.graph import (
    RA_SCALE,
    link_prediction_ra,
    transition_edges,
)
from airflow_pipeline_text_processing_spark.operators.text import (
    gopher_quality_rules,
)


# ---------------------------------------------------------------------
# Resource-Allocation link prediction
# ---------------------------------------------------------------------


def _edges_df(spark, edges):
    return spark.createDataFrame(
        sorted(edges) or [(0, 1)], "src long, dst long"
    )


def _rand_edges(rng, n, p):
    return {
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if rng.random() < p
    }


def _ra_bruteforce(edges, max_center_deg):
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    out: dict[tuple[int, int], tuple[int, int]] = {}
    for v, ns in nbrs.items():
        if len(ns) > max_center_deg:
            continue
        for u, w in itertools.combinations(sorted(ns), 2):
            if w in nbrs.get(u, set()):
                continue  # existing edge: not a candidate
            cn, ra = out.get((u, w), (0, 0))
            out[(u, w)] = (cn + 1, ra + RA_SCALE // len(ns))
    return out


def test_link_prediction_matches_bruteforce():
    # pure reference-vs-reference sanity on a hand graph first:
    # path 0-1-2 predicts (0,2) through center 1 (deg 2)
    want = _ra_bruteforce({(0, 1), (1, 2)}, 64)
    assert want == {(0, 2): (1, RA_SCALE // 2)}


def test_link_prediction_random_graphs(spark):
    for seed in range(6):
        rng = random.Random(1000 + seed)
        n = rng.randint(6, 14)
        edges = _rand_edges(rng, n, rng.uniform(0.2, 0.6))
        if not edges:
            continue
        cap = rng.choice([2, 3, 64])
        want = _ra_bruteforce(edges, cap)
        got = {
            (r.src, r.dst): (r.cn, r.ra_fp)
            for r in link_prediction_ra(
                _edges_df(spark, edges), max_center_deg=cap
            ).collect()
        }
        assert got == want, f"seed {seed} cap {cap}"


def test_link_prediction_hub_center_capped(spark):
    # star: hub 0 adjacent to 1..9 (deg 9); spokes have deg 1.
    # cap 8 drops the hub as a center -> no wedge has a live center
    # -> zero candidates; cap 9 restores all C(9,2) spoke pairs.
    star = {(0, i) for i in range(1, 10)}
    assert link_prediction_ra(
        _edges_df(spark, star), max_center_deg=8
    ).count() == 0
    rows = link_prediction_ra(
        _edges_df(spark, star), max_center_deg=9
    ).collect()
    assert len(rows) == 36
    assert all(r.cn == 1 and r.ra_fp == RA_SCALE // 9 for r in rows)


# ---------------------------------------------------------------------
# Markov transitions (the p_ppm layer over transition_edges)
# ---------------------------------------------------------------------


def test_markov_transition_probabilities(spark):
    # user 1: a->b, b->a, a->b   user 2: a->c
    # src a: {b:2, c:1} out 3 -> p(b|a)=666666, p(c|a)=333333
    from pyspark.sql import Window

    ev = spark.createDataFrame(
        [
            (1, 1, 10, "a"),
            (2, 1, 20, "b"),
            (3, 1, 30, "a"),
            (4, 1, 40, "b"),
            (5, 2, 10, "a"),
            (6, 2, 20, "c"),
        ],
        "event_id long, user_id long, ts long, event_type string",
    )
    e = transition_edges(ev)
    out = e.withColumn(
        "out_w", F.sum("w").over(Window.partitionBy("src"))
    ).select(
        "src",
        "dst",
        F.expr("CAST((w * 1000000) DIV out_w AS BIGINT)").alias("p_ppm"),
    )
    got = {(r.src, r.dst): r.p_ppm for r in out.collect()}
    assert got == {
        ("a", "b"): 666666,
        ("a", "c"): 333333,
        ("b", "a"): 1000000,
    }


# ---------------------------------------------------------------------
# Gopher §A1 quality rules: constructed boundary docs
# ---------------------------------------------------------------------


def _gopher_row(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return gopher_quality_rules(df).collect()[0]


def test_gopher_word_count_boundary(spark):
    r49 = _gopher_row(spark, " ".join(["word"] * 49))
    r50 = _gopher_row(spark, " ".join(["word"] * 50))
    assert (r49.r_word_count, r50.r_word_count) == (0, 1)
    assert r50.n_words == 50


def test_gopher_mean_word_len_boundaries(spark):
    # mean 2 (< 3) fails; mean exactly 3 passes; mean exactly 10
    # passes; mean 11 fails -- integer cross-product, no rounding
    assert _gopher_row(spark, "ab " * 60).r_mean_word_len == 0
    assert _gopher_row(spark, "abc " * 60).r_mean_word_len == 1
    assert _gopher_row(spark, "abcdefghij " * 60).r_mean_word_len == 1
    assert _gopher_row(spark, "abcdefghijk " * 60).r_mean_word_len == 0


def test_gopher_symbol_ratios_hash_and_ellipsis_separate(spark):
    # Rae et al. SSA1 bounds hash and ellipsis SEPARATELY at 0.1.
    # Boundary per flag: n=10 words with 1 hash -> 1*10 is not < 10,
    # fails at exactly 0.1; 11 words passes.
    txt = " ".join(["w"] * 9) + " hi#"
    row = _gopher_row(spark, txt)
    assert (row.n_words, row.n_hash, row.n_ellipsis) == (10, 1, 0)
    assert (row.r_hash_ratio, row.r_ellipsis_ratio) == (0, 1)
    assert _gopher_row(spark, " ".join(["w"] * 10) + " hi#").r_hash_ratio == 1
    # the split's point (the pre-r11 combined flag got this WRONG):
    # 0.05 hash-ratio AND 0.05 ellipsis-ratio passes both flags even
    # though the combined ratio is exactly 0.1
    both = " ".join(["w"] * 18) + " hi# bye..."
    row = _gopher_row(spark, both)
    assert (row.n_words, row.n_hash, row.n_ellipsis) == (20, 1, 1)
    assert (row.r_hash_ratio, row.r_ellipsis_ratio) == (1, 1)
    # unicode ellipsis and '...' runs both count toward n_ellipsis
    row = _gopher_row(spark, " ".join(["w"] * 9) + " x… y...")
    assert row.n_ellipsis == 2 and row.r_ellipsis_ratio == 0


def test_gopher_line_rules(spark):
    # 10 lines, 9 bullets: 9*10 <= 10*9 passes; 10 bullets fails
    nine = "\n".join(["- b"] * 9 + ["plain"])
    ten = "\n".join(["- b"] * 10)
    assert _gopher_row(spark, nine).r_bullet_lines == 1
    assert _gopher_row(spark, ten).r_bullet_lines == 0
    # ellipsis-end: 3 of 10 passes, 4 of 10 fails
    ok = "\n".join(["end..."] * 3 + ["x"] * 7)
    bad = "\n".join(["end..."] * 4 + ["x"] * 6)
    assert _gopher_row(spark, ok).r_ellipsis_lines == 1
    assert _gopher_row(spark, bad).r_ellipsis_lines == 0
    # unicode ellipsis and bullet count too
    assert _gopher_row(spark, "\n".join(["end…"] * 4 + ["x"] * 6)).r_ellipsis_lines == 0
    assert _gopher_row(spark, "\n".join(["• b"] * 10)).r_bullet_lines == 0


def test_gopher_alpha_and_stopwords(spark):
    # exactly 80% alpha words passes (4 of 5); 3 of 5 fails
    assert _gopher_row(spark, "aa bb cc dd 11").r_alpha_words == 1
    assert _gopher_row(spark, "aa bb cc 11 22").r_alpha_words == 0
    # stopwords are DISTINCT: 'the the the' is 1, not 3
    assert _gopher_row(spark, "the the the").r_stopwords == 0
    assert _gopher_row(spark, "the and x").r_stopwords == 1
    assert _gopher_row(spark, "the the and").n_req_stopwords == 2


def test_gopher_passes_conjunction(spark):
    good = " ".join(
        ["the", "and", "with"] + ["quality"] * 47
    )  # 50 words, mean len in range, no symbols, no lines issues
    row = _gopher_row(spark, good)
    assert row.passes_gopher == 1
    assert (
        row.r_word_count,
        row.r_mean_word_len,
        row.r_hash_ratio,
        row.r_ellipsis_ratio,
        row.r_bullet_lines,
        row.r_ellipsis_lines,
        row.r_alpha_words,
        row.r_stopwords,
    ) == (1, 1, 1, 1, 1, 1, 1, 1)
    # flipping one rule (shorten below 50 words) kills the conjunction
    assert _gopher_row(spark, "the and with quality").passes_gopher == 0


# ---------------------------------------------------------------------
# Kendall tau-a: random series vs brute force (incl. negative tau
# floor division)
# ---------------------------------------------------------------------


def _tau_bruteforce(ys):
    n = len(ys)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            if ys[j] > ys[i]:
                conc += 1
            elif ys[j] < ys[i]:
                disc += 1
    pairs = n * (n - 1) // 2
    num = (conc - disc) * 1000000
    # python's // is floor division -- the reference semantics
    return conc, disc, pairs, num // pairs


def test_kendall_tau_matches_bruteforce(spark):
    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        stats_kendall_daily,
    )
    import datetime as dt
    import tempfile, os

    rng = random.Random(7)
    rows = []
    series = {}
    for t, etype in enumerate(["up", "down", "noisy"]):
        ys = {
            "up": list(range(1, 13)),
            "down": list(range(12, 0, -1)),
            "noisy": [rng.randint(1, 9) for _ in range(12)],
        }[etype]
        series[etype] = ys
        for d, y in enumerate(ys):
            rows.append(
                (
                    t * 100 + d,
                    dt.datetime(2024, 1, 1 + d),
                    1,
                    etype,
                    float(y),
                    "{}",
                )
            )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as td:
        ev.write.parquet(os.path.join(td, "events.parquet"))
        got = {
            r.event_type: (r.n_conc, r.n_disc, r.n_pairs, r.tau_ppm)
            for r in stats_kendall_daily(spark, td).collect()
        }
    for etype, ys in series.items():
        cents = [int(y * 100) for y in ys]
        conc, disc, pairs, tau = _tau_bruteforce(cents)
        assert got[etype] == (conc, disc, pairs, tau), etype
    # monotone-up is exactly +1e6, monotone-down exactly -1e6 (the
    # negative branch exercises the pmod floor device)
    assert got["up"][3] == 1000000
    assert got["down"][3] == -1000000
