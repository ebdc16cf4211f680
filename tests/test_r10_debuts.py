"""Property tests for the round-10 debut operators: exact-complete
radius search (pruning soundness is the whole claim), k-core peeling
(round semantics + the shrink-only invariant), and per-token chi-square
(hand-computed 2x2 statistic + the df gates).  Each plants data where
the edge under test MATTERS; oracle equality at sf0.01 covers the
registry composition separately.
"""

from __future__ import annotations

import itertools

import pyspark.sql.functions as F

from airflow_pipeline_text_processing_spark.operators.graph import kcore_peel
from airflow_pipeline_text_processing_spark.operators.similarity import (
    range_search,
)
from airflow_pipeline_text_processing_spark.operators.text import (
    token_class_chi2,
)


def _vecs_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [int(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, q array<bigint>",
    )


def _brute_range(vecs, qids, r2):
    out = set()
    for qi in qids:
        for ci, v in enumerate(vecs):
            if ci == qi:
                continue
            d2 = sum((a - b) ** 2 for a, b in zip(vecs[qi], v))
            if d2 <= r2:
                out.add((qi, ci, d2))
    return out


def test_range_search_complete_on_clustered_corpus(spark):
    """Three tight clusters far apart: the radius covers only the
    query's own cluster, so cell pruning MUST skip the far cells yet
    lose nothing -- output equals brute force exactly.  The radius is
    chosen between the within-cluster and between-cluster distances,
    the regime where a broken triangle-inequality bound would drop a
    same-cluster neighbor routed to a pruned cell."""
    base = [0, 1_000_000, 2_000_000]
    vecs = []
    for c in base:
        for j in range(6):
            vecs.append([c + j * 10 + d for d in range(4)])
    qids = [0, 7, 14]
    r2 = 4 * (60 ** 2)  # covers the whole own cluster, none of the others
    got = {
        (r["query_id"], r["neighbor_id"], r["d2"])
        for r in range_search(
            _vecs_df(spark, vecs).filter(F.col("vec_id").isin(qids)),
            _vecs_df(spark, vecs),
            r2=r2,
            cells=3,
        ).collect()
    }
    want = _brute_range(vecs, qids, r2)
    assert got == want and len(got) == 15  # 5 same-cluster hits per query


def test_range_search_zero_and_full_radius(spark):
    """r2=0 finds only exact duplicates; a huge r2 degenerates to
    brute force over everything (the documented worst case)."""
    vecs = [[1, 2], [1, 2], [5, 9], [50, 50]]
    df = _vecs_df(spark, vecs)
    got0 = {
        (r["query_id"], r["neighbor_id"])
        for r in range_search(df.filter(F.col("vec_id") == 0), df, r2=0).collect()
    }
    assert got0 == {(0, 1)}
    gotall = range_search(df.filter(F.col("vec_id") == 0), df, r2=10**12, cells=2).count()
    assert gotall == 3


def test_kcore_peel_planted(spark):
    """K5 (every node degree 4) survives k=2 peeling forever; a tail
    path hanging off it peels ONE node per round from the end -- the
    round-by-round progression pins the peel semantics (degrees are
    reported over the restricted subgraph of the LAST round).
    Graph: K5 on 0..4 plus path 4-10-11-12."""
    edges = list(itertools.combinations(range(5), 2))
    edges += [(4, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(edges, "src int, dst int")

    def run(rounds):
        return {
            r["node"]: r["deg"]
            for r in kcore_peel(df, k=2, rounds=rounds).collect()
        }

    assert run(1) == {0: 4, 1: 4, 2: 4, 3: 4, 4: 5, 10: 2, 11: 1}
    assert run(2) == {0: 4, 1: 4, 2: 4, 3: 4, 4: 5, 10: 1}
    assert run(3) == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}
    assert run(4) == run(3)  # fixed point: K5 is the 2-core


def test_kcore_peel_empty_result(spark):
    """A tree has no 2-core: peeling k=2 on a star empties the graph
    within a logarithmic number of rounds."""
    df = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src int, dst int"
    )
    assert kcore_peel(df, k=2, rounds=3).count() == 0


def test_token_chi2_hand_scored(spark):
    """6 docs, class = first 3.  'pos' appears in exactly the 3 class
    docs: a=3 b=0 c=0 d=3, det = a*d - b*c = 9, chi2 = 6*81/(3*3*3*3) =
    6.0 -> 6000 milli.  'share' appears everywhere -> dropped by the
    nt <= N - min_df gate.  'neg' mirrors 'pos' for the other class --
    same chi2 by symmetry.  min_df=1 keeps the singletons out of the
    gates' way; 'only1' (nt=1) passes min_df=1 and scores
    6*(1*3-0*2)^2/(1*5*3*3) = 54/45 = 1.2 -> 1200 milli."""
    docs = spark.createDataFrame(
        [
            (0, "pos share only1"),
            (1, "pos share"),
            (2, "pos share"),
            (3, "neg share"),
            (4, "neg share"),
            (5, "neg share"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["token"]: (r["n_docs"], r["chi2_milli"])
        for r in token_class_chi2(
            docs, F.col("doc_id") < 3, min_df=1, topn=10
        ).collect()
    }
    assert "share" not in got  # nt = N, dropped by the near-universal gate
    assert got["pos"] == (3, 6000)
    assert got["neg"] == (3, 6000)
    assert got["only1"] == (1, 1200)


def test_clustering_coeff_planted_groups(spark, tmp_path):
    """Planted co-occurrence events -> known clustering coefficients.
    Group A (one event_type+hour): users 1-4 -> K4, every node cc = 1.0
    (3 triangles, deg 3).  Group B: users 10-12 plus user 1 -> K4 too,
    but user 1 now has deg 6 across both groups with 6 triangles:
    cc = 2*6/(6*5) = 0.4 -> 400_000 ppm.  Runs the registry query
    end-to-end off a planted events.parquet."""
    import datetime
    import os

    from airflow_pipeline_text_processing_spark.plans.queries_scale import (
        graph_clustering_coeff,
    )

    ts_a = datetime.datetime(2024, 1, 1, 10, 5)
    ts_b = datetime.datetime(2024, 1, 1, 12, 5)
    rows = [(i, ts_a, u, "click", 1.0, "{}") for i, u in enumerate([1, 2, 3, 4])]
    rows += [
        (10 + i, ts_b, u, "click", 1.0, "{}")
        for i, u in enumerate([1, 10, 11, 12])
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    got = {
        r["user_id"]: (r["deg"], r["n_tri"], r["cc_ppm"])
        for r in graph_clustering_coeff(spark, str(tmp_path)).collect()
    }
    assert got[1] == (6, 6, 400_000)
    for u in (2, 3, 4, 10, 11, 12):
        assert got[u] == (3, 3, 1_000_000)


def test_token_chi2_degenerate_class_is_empty(spark):
    """cp = 0 (no doc in class) or cp = N (all docs): the 2x2 table
    degenerates and the denominator zeroes -- the operator must emit NO
    rows, never NULL statistics."""
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha gamma")], "doc_id long, text string"
    )
    assert token_class_chi2(docs, F.lit(False), min_df=1).count() == 0
    assert token_class_chi2(docs, F.lit(True), min_df=1).count() == 0
