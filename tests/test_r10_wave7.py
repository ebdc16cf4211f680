"""Dedicated tests for the round-10 seventh-wave debuts: frequent
3-step path mining and binary-segmentation change-point detection.
Pure-Python references replicate the exact integer scoring (the repo's
reference-test style); planted series pin the argmax and tie logic."""

from __future__ import annotations

import datetime as dt
import os
import random
import tempfile


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def _write_run(spark, rows, fn):
    ev = _events(spark, rows)
    with tempfile.TemporaryDirectory() as td:
        ev.write.parquet(os.path.join(td, "events.parquet"))
        return fn(spark, td).collect()


def test_path_ngrams_counts_and_ties(spark):
    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        events_path_ngrams,
    )

    rows = []
    eid = 0
    t0 = dt.datetime(2024, 1, 1)

    def add(uid, seq):
        nonlocal eid
        for i, et in enumerate(seq):
            rows.append(
                (eid, t0 + dt.timedelta(minutes=i), uid, et, 1.0, "{}")
            )
            eid += 1

    add(1, ["a", "b", "c", "a", "b", "c"])  # abc x2, bca, cab
    add(2, ["a", "b", "c"])                  # abc
    add(3, ["x", "y"])                       # too short: no trigram
    got = [
        (r.step1, r.step2, r.step3, r.n_paths)
        for r in _write_run(spark, rows, events_path_ngrams)
    ]
    # brute force over the same sequences
    want = {}
    for seq in (["a", "b", "c", "a", "b", "c"], ["a", "b", "c"]):
        for i in range(len(seq) - 2):
            k = tuple(seq[i : i + 3])
            want[k] = want.get(k, 0) + 1
    want_rows = sorted(
        [(k[0], k[1], k[2], n) for k, n in want.items()],
        key=lambda r: (-r[3], r[0], r[1], r[2]),
    )
    assert got == want_rows
    assert got[0] == ("a", "b", "c", 3)  # count ties broken lexically


def test_path_ngrams_respects_event_id_tiebreak(spark):
    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        events_path_ngrams,
    )

    # same timestamp everywhere: order comes from event_id alone
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (3, t0, 1, "c", 1.0, "{}"),
        (1, t0, 1, "a", 1.0, "{}"),
        (2, t0, 1, "b", 1.0, "{}"),
    ]
    got = _write_run(spark, rows, events_path_ngrams)
    assert [(r.step1, r.step2, r.step3, r.n_paths) for r in got] == [
        ("a", "b", "c", 1)
    ]


def _ref_changepoint(cents_by_day: list[int], scale: int = 1000):
    n = len(cents_by_day)
    s = sum(cents_by_day)
    best = None
    ps = 0
    for t in range(1, n):
        ps += cents_by_day[t - 1]
        num = abs(ps * (n - t) - (s - ps) * t) * scale
        den = t * (n - t)
        gap = num // den
        if best is None or gap > best[1]:
            best = (t, gap)
    return best


def test_changepoint_finds_planted_step(spark):
    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        events_changepoint,
    )

    rng = random.Random(9)
    rows = []
    eid = 0
    series = {}
    for etype, shift_at in (("stepup", 12), ("flat", None)):
        ys = []
        for d in range(20):
            base = 100.0 if (shift_at is not None and d >= shift_at) else 10.0
            y = base + rng.uniform(0, 1)
            ys.append(y)
            rows.append(
                (eid, dt.datetime(2024, 3, 1) + dt.timedelta(days=d),
                 1, etype, y, "{}")
            )
            eid += 1
        series[etype] = ys
    got = {
        r.event_type: (r.split_t, r.gap_milli, r.split_day, r.n_days)
        for r in _write_run(spark, rows, events_changepoint)
    }
    import math

    for etype, ys in series.items():
        cents = [int(math.floor(y * 100)) for y in ys]
        t, gap = _ref_changepoint(cents)
        day = (dt.date(2024, 3, 1) + dt.timedelta(days=t - 1)).isoformat()
        assert got[etype] == (t, gap, day, 20), etype
    # the planted step lands exactly at the shift boundary
    assert got["stepup"][0] == 12


def test_changepoint_tie_takes_earliest_split(spark):
    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        events_changepoint,
    )

    # symmetric series 1,2,2,1: splits t=1 and t=3 score identically;
    # the window tiebreak must pick t=1
    rows = [
        (i, dt.datetime(2024, 5, 1) + dt.timedelta(days=i), 1, "sym",
         float(v), "{}")
        for i, v in enumerate([1, 2, 2, 1])
    ]
    got = _write_run(spark, rows, events_changepoint)[0]
    t_ref, gap_ref = _ref_changepoint([100, 200, 200, 100])
    assert (got.split_t, got.gap_milli) == (t_ref, gap_ref)
    assert got.split_t == 1
