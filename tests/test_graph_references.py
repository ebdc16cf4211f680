"""Randomized reference tests for the graph operators: seeded
Erdos-Renyi-ish graphs, Spark results compared exactly against
brute-force pure-Python references (triangles by closed-wedge
enumeration over all node triples; k-core by literal round-by-round
peeling).  Complements the planted hub/clique tests with breadth --
the degree-orientation tiebreak and the peeling round semantics get
exercised across many random shapes instead of one constructed one."""

from __future__ import annotations

import itertools
import random

from airflow_pipeline_text_processing_spark.operators.graph import (
    kcore_peel,
    triangle_counts,
)


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


def test_triangle_counts_match_bruteforce(spark):
    for seed in range(6):
        rng = random.Random(seed)
        n = rng.randint(6, 14)
        edges = _rand_edges(rng, n, rng.uniform(0.2, 0.6))
        if not edges:
            continue
        want = {}
        es = set(edges)
        for a, b, c in itertools.combinations(range(n), 3):
            if (a, b) in es and (b, c) in es and (a, c) in es:
                for v in (a, b, c):
                    want[v] = want.get(v, 0) + 1
        got = {
            r.node: r.n_tri
            for r in triangle_counts(_edges_df(spark, edges)).collect()
        }
        assert got == want, f"seed {seed}"


def test_kcore_peel_matches_literal_peeling(spark):
    for seed in range(6):
        rng = random.Random(50 + seed)
        n = rng.randint(6, 14)
        edges = _rand_edges(rng, n, rng.uniform(0.2, 0.6))
        if not edges:
            continue
        k, rounds = rng.randint(2, 4), rng.randint(1, 3)
        live = set(edges)
        for _ in range(rounds):
            deg = {}
            for a, b in live:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            keep = {v for v, d in deg.items() if d >= k}
            live = {(a, b) for a, b in live if a in keep and b in keep}
        want = {}
        for a, b in live:
            want[a] = want.get(a, 0) + 1
            want[b] = want.get(b, 0) + 1
        got = {
            r.node: r.deg
            for r in kcore_peel(
                _edges_df(spark, edges), k=k, rounds=rounds
            ).collect()
        }
        assert got == want, f"seed {seed} k={k} rounds={rounds}"
