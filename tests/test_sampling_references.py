"""Randomized reference tests for the deterministic samplers: every
sampler is a pure function of row keys through md5 thresholds or
order statistics, so an independent pure-Python replication must agree
row for row -- the property (rerun/backfill/engine stability) the
operators exist to provide."""

from __future__ import annotations

import hashlib
import math
import random

from airflow_pipeline_text_processing_spark.operators.sampling import (
    hash_split,
    rate_threshold,
    stratified_sample,
    temperature_resample,
    weighted_bottom_k,
)

import pyspark.sql.functions as F


def _md5(s):
    return hashlib.md5(str(s).encode()).hexdigest()


def test_stratified_sample_matches_python_reference(spark):
    rates = {"a": 0.3, "b": 0.75, "c": 1.0}
    for seed in range(4):
        rng = random.Random(seed)
        rows = [
            (i, rng.choice(["a", "b", "c", "d"])) for i in range(300)
        ]
        df = spark.createDataFrame(rows, "id long, stratum string")
        got = {
            r.id
            for r in stratified_sample(
                df, "stratum", rates, F.col("id")
            ).collect()
        }
        want = {
            i
            for i, s in rows
            if _md5(i) < rate_threshold(rates.get(s, 0.0))
        }
        assert got == want, f"seed {seed}"


def test_hash_split_matches_python_reference(spark):
    fr = {"train": 0.7, "val": 0.2, "test": 0.1}
    rows = [(i,) for i in range(500)]
    df = spark.createDataFrame(rows, "id long")
    got = {r.id: r.split for r in hash_split(df, F.col("id"), fr).collect()}
    want = {}
    for (i,) in rows:
        d = _md5(i)
        if d < rate_threshold(0.7):
            want[i] = "train"
        elif d < rate_threshold(0.9):
            want[i] = "val"
        else:
            want[i] = "test"
    assert got == want
    # every key assigned, proportions sane
    assert len(got) == 500 and set(got.values()) == {"train", "val", "test"}


def test_weighted_bottom_k_matches_python_reference(spark):
    for seed in range(4):
        rng = random.Random(10 + seed)
        rows = [
            (i, rng.choice(["g1", "g2"]), rng.randint(-1, 20))
            for i in range(120)
        ]
        df = spark.createDataFrame(rows, "id long, grp string, w long")
        k = 5
        got = {
            (r.grp, r.id)
            for r in weighted_bottom_k(df, "grp", "id", "w", k).collect()
        }
        pri = {}
        for i, g, w in rows:
            if w <= 0:
                continue
            h = int(_md5(f"wbk|{i}")[:13], 16)
            pri.setdefault(g, []).append((h // w, i))
        want = set()
        for g, ps in pri.items():
            for _, i in sorted(ps)[:k]:
                want.add((g, i))
        assert got == want, f"seed {seed}"


def test_temperature_resample_matches_python_reference(spark):
    for seed in range(3):
        rng = random.Random(30 + seed)
        rows = [
            (i, rng.choice(["big"] * 6 + ["mid"] * 3 + ["rare"]))
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "id long, domain string")
        got = {
            (r.domain, r.id)
            for r in temperature_resample(df, "domain", "id").collect()
        }
        # python reference: sqrt-temperature targets, md5-order draw
        counts = {}
        for _, d in rows:
            counts[d] = counts.get(d, 0) + 1
        n_total = sum(counts.values())
        w_fp = {d: math.floor(math.sqrt(c) * 1048576) for d, c in counts.items()}
        w_sum = sum(w_fp.values())
        budget = n_total // 2
        target = {
            d: min(budget * w_fp[d] // w_sum, counts[d]) for d in counts
        }
        want = set()
        for d in counts:
            members = sorted(
                (i for i, dd in rows if dd == d),
                key=lambda i: (_md5(i), i),
            )
            want.update((d, i) for i in members[: target[d]])
        assert got == want, f"seed {seed}"
