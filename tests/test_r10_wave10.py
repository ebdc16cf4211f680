"""Dedicated tests for the round-10 late-wave debuts: pointer-doubling
hierarchy traversal and RFM quintile segmentation (wave 10), the exact
prefix-filtering set-similarity join (wave 11), the Benford
leading-digit audit (wave 12), and Davies-Bouldin cluster quality
(wave 13).  Random forests, random corpora, and constructed order
books compared exactly against brute-force pure-Python references."""

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


# ---------------------------------------------------------------------
# prefix-filtering exact set-similarity join
# ---------------------------------------------------------------------


def _brute_jaccard_pairs(texts, t_num, t_den, n=3):
    import re

    def shingles(t):
        toks = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
        if len(toks) <= n - 1:
            return {" ".join(toks[0:n])} if toks else {""}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sets = {i: shingles(t) for i, t in enumerate(texts)}
    out = {}
    for a in sets:
        for b in sets:
            if a >= b:
                continue
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if inter * t_den >= t_num * union:
                out[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    return out


def test_prefix_filter_is_lossless_vs_bruteforce(spark):
    from airflow_pipeline_text_processing_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    vocab = [f"w{k}" for k in range(12)]
    for seed in range(5):
        rng = random.Random(400 + seed)
        texts = []
        for i in range(14):
            base = " ".join(rng.choices(vocab, k=rng.randint(4, 12)))
            texts.append(base)
            if rng.random() < 0.5:  # plant near-dups: append a word
                texts.append(base + " " + rng.choice(vocab))
        t_num, t_den = rng.choice([(5, 10), (6, 10), (8, 10)])
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        got = {
            (r.doc_a, r.doc_b): (r.n_common, r.size_a, r.size_b)
            for r in prefix_filter_pairs(
                df, t_num=t_num, t_den=t_den
            ).collect()
        }
        want = _brute_jaccard_pairs(texts, t_num, t_den)
        assert got == want, f"seed {seed} t={t_num}/{t_den}"


def test_prefix_filter_exact_threshold_boundary(spark):
    from airflow_pipeline_text_processing_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    # two docs engineered to J exactly 6/10: 6 common shingles,
    # union 10 -- must be KEPT by the integer cross-product (a float
    # >= 0.6 comparison is representation-dependent)
    a = "c1 c2 c3 c4 c5 c6 c7 c8"  # 6 3-shingles
    b = "c1 c2 c3 c4 c5 c6 c7 c8 x1 x2 x3 x4"  # 10: the 6 + 4 new
    df = spark.createDataFrame(
        [(0, a), (1, b)], "doc_id long, text string"
    )
    rows = prefix_filter_pairs(df, t_num=6, t_den=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_common, r.size_a, r.size_b) == (6, 6, 10)


def test_ancestor_doubling_dangling_parent_is_terminal(spark):
    # node 50's parent 99 has no row of its own: the walk must stop
    # there (root 99, the hop counted), NOT silently drop the node --
    # the inner-join hazard the LEFT-join semantics fix
    parents = {0: 0, 1: 0, 50: 99, 51: 50}
    got = {
        r.node: (r.root, r.depth)
        for r in ancestor_doubling(
            _forest_df(spark, parents), rounds=4
        ).collect()
    }
    assert got == {
        0: (0, 0),
        1: (0, 1),
        50: (99, 1),
        51: (99, 2),
    }


# ---------------------------------------------------------------------
# Benford's-law leading-digit audit
# ---------------------------------------------------------------------


def test_benford_constants_match_the_law():
    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        _BENFORD_PPM,
    )

    for d, ppm in _BENFORD_PPM.items():
        assert ppm == int(math.floor(math.log10(1 + 1 / d) * 1_000_000)), d
    # nine floors each lose < 1 ppm: the sum sits just under 10^6
    assert 999990 <= sum(_BENFORD_PPM.values()) <= 1000000


def test_benford_audit_matches_reference(spark):
    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        _BENFORD_PPM,
        dq_benford_totals,
    )

    rng = random.Random(77)
    prices = [rng.uniform(0.5, 9000) for _ in range(400)]
    rows = [
        (i, i % 20, "O", p, dt.datetime(2024, 1, 1), "1-URGENT")
        for i, p in enumerate(prices)
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as td:
        orders.write.parquet(os.path.join(td, "orders.parquet"))
        got = {
            r.digit: (r.n, r.obs_ppm, r.exp_ppm, r.dev_ppm)
            for r in dq_benford_totals(spark, td).collect()
        }
    # brute force: leading digit of integer cents
    counts = {}
    for p in prices:
        c = int(math.floor(p * 100))
        d = int(str(c)[0])
        if 1 <= d <= 9:
            counts[d] = counts.get(d, 0) + 1
    total = sum(counts.values())
    for d, n in counts.items():
        obs = (n * 1_000_000) // total
        assert got[d] == (n, obs, _BENFORD_PPM[d], obs - _BENFORD_PPM[d]), d
    assert set(got) == set(counts)


# ---------------------------------------------------------------------
# Davies-Bouldin-style cluster quality
# ---------------------------------------------------------------------


def test_cluster_db_index_matches_reference_layer(spark):
    from airflow_pipeline_text_processing_spark.operators.clustering import (
        kmeans_fixed_point,
        quantized,
    )
    from airflow_pipeline_text_processing_spark.plans.queries_llm import (
        cluster_db_index,
    )
    import pyspark.sql.functions as F

    # two tight, well-separated lobes in 8-dim space
    rng = random.Random(88)
    rows = []
    for i in range(60):
        center = 0.8 if i % 2 == 0 else -0.8
        rows.append(
            (i, [center + rng.uniform(-0.02, 0.02) for _ in range(8)], 0)
        )
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    with tempfile.TemporaryDirectory() as td:
        vecs.write.parquet(os.path.join(td, "embeddings.parquet"))
        got = {
            r.cid: (r.n_members, r.s2, r.worst_cid, r.r_milli)
            for r in cluster_db_index(spark, td).collect()
        }
        # reference: replay the DB arithmetic in python from the SAME
        # kmeans output the query composes
        q = spark.read.parquet(os.path.join(td, "embeddings.parquet")).select(
            "vec_id", quantized(F.col("embedding")).alias("q")
        )
        assigned, cents = kmeans_fixed_point(q, k=8, iters=3)
        asg = [(r.cid, r.d2) for r in assigned.collect()]
        cs = {r.cid: list(r.c) for r in cents.collect()}
    agg = {}
    for cid, d2 in asg:
        n, s = agg.get(cid, (0, 0))
        agg[cid] = (n + 1, s + d2)
    s2 = {cid: s // n for cid, (n, s) in agg.items()}
    want = {}
    for ci in s2:
        best = None
        for cj in sorted(s2):  # ascending: first max = smallest cj tie
            if cj == ci:
                continue
            m2 = sum((a - b) ** 2 for a, b in zip(cs[ci], cs[cj]))
            r = 10**15 if m2 == 0 else ((s2[ci] + s2[cj]) * 1000) // m2
            if best is None or r > best[1]:
                best = (cj, r)
        want[ci] = (agg[ci][0], s2[ci], best[0], best[1])
    assert got == want
    # tight well-separated lobes: scatter tiny relative to separation
    assert all(r[3] < 100_000 for r in got.values())
