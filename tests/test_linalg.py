"""Tests for the distributed exact covariance + power-iteration
operators (operators/linalg.py): seeded random corpora compared
against brute-force pure-Python/numpy references, a planted dominant
direction the component must recover, and the degenerate zero-matrix
edge."""

from __future__ import annotations

import math
import random

from airflow_pipeline_text_processing_spark.operators.linalg import (
    QSCALE,
    VSCALE,
    centered_moment_matrix,
    gram_moments,
    power_iteration,
    top_pc_projections,
)

DIM = 6


def _vecs_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        "vec_id long, embedding array<float>",
    )


def _quant(v):
    # float32 -> float64 -> *1000 -> floor, the operator's exact path
    import numpy as np

    return [
        int(math.floor(float(np.float32(x)) * QSCALE)) for x in v
    ]


def test_gram_moments_match_bruteforce(spark):
    rng = random.Random(3)
    rows = [
        [rng.uniform(-1, 1) for _ in range(DIM)] for _ in range(40)
    ]
    n, s, G = gram_moments(_vecs_df(spark, rows), dim=DIM)
    qs = [_quant(v) for v in rows]
    assert n == 40
    assert s == [sum(q[i] for q in qs) for i in range(DIM)]
    for i in range(DIM):
        for j in range(DIM):
            assert G[i][j] == sum(q[i] * q[j] for q in qs), (i, j)


def test_power_iteration_reference_and_bounds():
    rng = random.Random(5)
    for _ in range(4):
        M = [
            [rng.randint(-1000, 1000) for _ in range(DIM)]
            for _ in range(DIM)
        ]
        # symmetrize (covariance matrices are symmetric)
        M = [
            [M[i][j] + M[j][i] for j in range(DIM)]
            for i in range(DIM)
        ]
        v = [1] * DIM
        for _ in range(3):
            w = [
                sum(M[i][j] * v[j] for j in range(DIM))
                for i in range(DIM)
            ]
            mx = max(abs(x) for x in w)
            if mx == 0:
                v = [0] * DIM
                break
            v = [(x * VSCALE) // mx for x in w]
        assert power_iteration(M, iters=3) == v
        assert all(abs(x) <= VSCALE for x in v)


def test_power_iteration_degenerate_zero_matrix():
    M = [[0] * DIM for _ in range(DIM)]
    assert power_iteration(M, iters=3) == [0] * DIM


def test_top_pc_recovers_planted_direction(spark):
    # corpus varies strongly along axis 2, weakly elsewhere: the
    # dominant component must load on axis 2 (sign-agnostic) and the
    # projection scores must separate the two planted lobes
    rng = random.Random(11)
    rows = []
    for k in range(60):
        v = [rng.uniform(-0.02, 0.02) for _ in range(DIM)]
        v[2] = 0.9 if k % 2 == 0 else -0.9
        rows.append(v)
    n, s, G = gram_moments(_vecs_df(spark, rows), dim=DIM)
    comp = power_iteration(centered_moment_matrix(n, s, G), iters=3)
    assert abs(comp[2]) == max(abs(x) for x in comp)
    assert abs(comp[2]) >= 10 * max(
        abs(x) for i, x in enumerate(comp) if i != 2
    )
    proj = {
        r.vec_id: r.proj_fp
        for r in top_pc_projections(
            _vecs_df(spark, rows), dim=DIM, iters=3
        ).collect()
    }
    evens = [proj[i] for i in range(0, 60, 2)]
    odds = [proj[i] for i in range(1, 60, 2)]
    # the two lobes sit on opposite sides with a wide margin
    assert max(evens) < min(odds) or max(odds) < min(evens)


def test_top_pc_projection_is_exact_dot(spark):
    rows = [[0.5] * DIM, [-0.25] * DIM, [0.0] * DIM]
    df = _vecs_df(spark, rows)
    n, s, G = gram_moments(df, dim=DIM)
    comp = power_iteration(centered_moment_matrix(n, s, G), iters=3)
    proj = {
        r.vec_id: r.proj_fp
        for r in top_pc_projections(df, dim=DIM, iters=3).collect()
    }
    for i, v in enumerate(rows):
        q = _quant(v)
        assert proj[i] == sum(q[d] * comp[d] for d in range(DIM)), i


# ---------------------------------------------------------------------
# Johnson-Lindenstrauss sign-random projection (r14)
# ---------------------------------------------------------------------


def test_jl_project_matches_independent_reference(spark):
    import hashlib
    import math

    from airflow_pipeline_text_processing_spark.operators.linalg import (
        jl_project,
    )

    vecs = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(5)
    got = {r.vec_id: list(r.proj) for r in jl_project(vecs).collect()}

    def sign(i, j):
        h = hashlib.md5(f"jl|{i}|{j}".encode()).hexdigest()
        return 1 - 2 * (int(h[0], 16) % 2)

    for r in vecs.collect():
        q = [math.floor(float(x) * 1000000) for x in r.embedding]
        ref = [
            sum(q[i] * sign(i, j) for i in range(64)) for j in range(16)
        ]
        assert got[r.vec_id] == ref


def test_jl_projection_preserves_pairwise_distances(spark):
    # the JL lemma, checked statistically: for sign-random projections
    # the expected squared projected distance is out_dim * the original
    # squared distance; per-pair ratios concentrate around 1 after the
    # 1/out_dim normalization.  Tolerance is generous (the lemma is a
    # concentration bound at k=16, eps~0.5) -- what the test pins is
    # that distances are PRESERVED in aggregate, not distorted or
    # collapsed.
    import math

    from airflow_pipeline_text_processing_spark.operators.linalg import (
        jl_project,
    )

    vecs = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(40)
    orig = {
        r.vec_id: [math.floor(float(x) * 1000000) for x in r.embedding]
        for r in vecs.collect()
    }
    proj = {r.vec_id: list(r.proj) for r in jl_project(vecs).collect()}
    ids = sorted(orig)
    ratios = []
    for a_i in range(0, len(ids), 3):
        for b_i in range(a_i + 1, len(ids), 5):
            a, b = ids[a_i], ids[b_i]
            d2 = sum((x - y) ** 2 for x, y in zip(orig[a], orig[b]))
            p2 = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
            if d2:
                ratios.append(p2 / (16 * d2))
    assert len(ratios) >= 50
    mean = sum(ratios) / len(ratios)
    assert 0.7 < mean < 1.3          # unbiased in aggregate
    assert all(0.2 < r < 3.0 for r in ratios)  # no pair collapses/explodes


def test_jl_project_plan_is_shuffle_free(spark):
    # the 100 TB claim: the projection itself is a per-row closed form
    # -- no Exchange in the plan before the output stage
    from airflow_pipeline_text_processing_spark.operators.linalg import (
        jl_project,
    )

    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = jl_project(vecs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
