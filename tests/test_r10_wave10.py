"""Dedicated tests for the round-10 tenth-wave debuts: pointer-doubling
hierarchy traversal and RFM quintile segmentation.  Random forests and
constructed order books compared exactly against brute-force
pure-Python references."""

from __future__ import annotations

import datetime as dt
import math
import os
import random
import tempfile

from airflow_pipeline_text_processing_spark.operators.graph import (
    ancestor_doubling,
)


def _forest_df(spark, parents):
    return spark.createDataFrame(
        sorted(parents.items()), "node long, parent long"
    )


def _walk(parents, u):
    d = 0
    while parents[u] != u:
        u = parents[u]
        d += 1
    return u, d


def test_ancestor_doubling_random_forests(spark):
    for seed in range(5):
        rng = random.Random(100 + seed)
        n = rng.randint(8, 30)
        parents = {0: 0}
        for u in range(1, n):
            parents[u] = rng.randrange(0, u)  # parent < child: acyclic
            if rng.random() < 0.15:
                parents[u] = u  # extra roots
        got = {
            r.node: (r.root, r.depth)
            for r in ancestor_doubling(
                _forest_df(spark, parents), rounds=5
            ).collect()
        }
        want = {u: _walk(parents, u) for u in parents}
        assert got == want, f"seed {seed}"


def test_ancestor_doubling_chain_depth_coverage(spark):
    # a pure chain 0 <- 1 <- 2 ... <- 12: rounds=4 (2^4 = 16 >= 12)
    # resolves every depth exactly; rounds=2 (covers 4) returns the
    # 4-step partial ancestor for deeper nodes -- the documented
    # bounded-rounds contract
    parents = {0: 0}
    for u in range(1, 13):
        parents[u] = u - 1
    full = {
        r.node: (r.root, r.depth)
        for r in ancestor_doubling(
            _forest_df(spark, parents), rounds=4
        ).collect()
    }
    assert full[12] == (0, 12) and full[0] == (0, 0)
    partial = {
        r.node: (r.root, r.depth)
        for r in ancestor_doubling(
            _forest_df(spark, parents), rounds=2
        ).collect()
    }
    assert partial[12] == (8, 4)  # 4-step ancestor, partial depth


def _ref_rfm(rows):
    # rows: (custkey, date, cents)
    per = {}
    for c, d, cents in rows:
        lastd, f, m = per.get(c, (d, 0, 0))
        per[c] = (max(lastd, d), f + 1, m + cents)
    anchor = max(v[0] for v in per.values())
    base = {
        c: ((anchor - v[0]).days, v[1], v[2]) for c, v in per.items()
    }
    n = len(base)

    def quintile(metric_idx):
        order = sorted(base, key=lambda c: (base[c][metric_idx], c))
        return {c: ((r * 5) // n) for r, c in enumerate(order)}

    rq, fq, mq = quintile(0), quintile(1), quintile(2)
    cells = {}
    for c in base:
        k = (rq[c], fq[c], mq[c])
        cells[k] = cells.get(k, 0) + 1
    return cells


def test_rfm_segments_match_reference(spark):
    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        agg_rfm_segments,
    )

    rng = random.Random(55)
    rows = []
    raw = []
    okey = 0
    for c in range(40):
        for _ in range(rng.randint(1, 6)):
            d = dt.date(2024, 1, 1) + dt.timedelta(days=rng.randrange(90))
            price = rng.uniform(10, 500)
            raw.append((c, d, int(math.floor(price * 100))))
            rows.append(
                (
                    okey,
                    c,
                    "O",
                    price,
                    dt.datetime(d.year, d.month, d.day),
                    "1-URGENT",
                )
            )
            okey += 1
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as td:
        orders.write.parquet(os.path.join(td, "orders.parquet"))
        got = {
            (r.r_q, r.f_q, r.m_q): r.n_customers
            for r in agg_rfm_segments(spark, td).collect()
        }
    assert got == _ref_rfm(raw)
    assert sum(got.values()) == 40  # every customer lands in one cell
    for (rq, fq, mq) in got:
        assert 0 <= rq <= 4 and 0 <= fq <= 4 and 0 <= mq <= 4
