"""Dedicated property tests for the r9 debut operators (VERDICT r9 "What's
wrong" #2): triangle counting + co-occurrence projection, RAKE keywords,
and 8-gram novelty shipped oracle-certified but with no pytest pinning the
edge logic the oracle data doesn't exercise -- the hub fan-out cap, the
orientation tie-break, the max_len phrase cap, and the <8-token no-row
edge.  Each test plants data where that edge MATTERS and hand-computes the
expected result.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import functions as F

from airflow_pipeline_text_processing_spark.operators.graph import (
    cooccurrence_edges,
    triangle_counts,
)
from airflow_pipeline_text_processing_spark.operators.text import rake_keywords


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "src int, dst int"
    ).distinct()


def _brute_triangles(pairs):
    """Per-node triangle counts by brute-force enumeration."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict[int, int] = {}
    for trio in itertools.combinations(sorted(adj), 3):
        a, b, c = trio
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in trio:
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangle_counts_hub_contributes_nothing(spark):
    """Planted hub-plus-triangles graph: two triangles sharing node 3,
    plus a degree-20 star hub whose leaves have no other edges.  The hub
    closes no triangle and must not appear in the output; the orientation
    means the hub's own side generates zero wedges (Suri-Vassilvitskii
    bound), but here we pin the RESULT: brute-force parity per node."""
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 5)]
    pairs += [(100, leaf) for leaf in range(11, 31)]  # hub, 20 leaves
    got = {
        r["node"]: r["n_tri"]
        for r in triangle_counts(_edges_df(spark, pairs)).collect()
    }
    assert got == _brute_triangles(pairs) == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}
    assert 100 not in got and 11 not in got


def test_triangle_counts_equal_degree_tiebreak(spark):
    """A lone triangle: all three nodes have degree 2, so every
    orientation decision falls to the id tie-break.  A broken tie-break
    double-orients or drops an edge and the count comes out 0 or 2."""
    got = {
        r["node"]: r["n_tri"]
        for r in triangle_counts(_edges_df(spark, [(7, 9), (7, 8), (8, 9)])).collect()
    }
    assert got == {7: 1, 8: 1, 9: 1}


def test_triangle_counts_k4_complete(spark):
    """K4: every node sits in C(3,2)=3 triangles; 4 triangles total.
    Exercises wedges whose closing edge is itself oriented both ways."""
    pairs = list(itertools.combinations([1, 2, 3, 4], 2))
    got = {
        r["node"]: r["n_tri"]
        for r in triangle_counts(_edges_df(spark, pairs)).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_cooccurrence_edges_group_caps(spark):
    """min_group/max_group gates: a size-3 group projects its 3 pairs; a
    size-25 group is DROPPED before the self-join (the fan-out guard --
    at corpus scale this is the difference between O(sum cap^2) and a
    hot-key quadratic blowup); a singleton group projects nothing.
    Duplicate memberships must not duplicate pairs (distinct on both
    sides)."""
    rows = [("g1", u) for u in (1, 2, 3)]
    rows += [("g1", 1)]  # duplicate membership
    rows += [("big", u) for u in range(100, 125)]  # 25 members > max_group
    rows += [("solo", 9)]  # < min_group
    items = spark.createDataFrame(rows, "grp string, user_id int")
    got = sorted(
        (r["src"], r["dst"])
        for r in cooccurrence_edges(
            items, ["grp"], "user_id", min_group=2, max_group=20
        ).collect()
    )
    assert got == [(1, 2), (1, 3), (2, 3)]


def test_rake_keywords_hand_scored(spark):
    """Hand-scored RAKE corpus (Rose et al. 2010 scoring, integer ppm).

    doc 1 'deep learning of deep models' segments on the stopword 'of'
    into [deep learning][deep models]; doc 2 adds [deep learning]
    [rocket science][win].  Word scores (degree*1e6 div freq):
    deep 6/3->2.0M, learning 4/2->2.0M, models/rocket/science 2/1->2.0M,
    win 1/1->1.0M.  Phrase scores: 'deep learning' 4.0M x2 occurrences,
    'deep models' 4.0M, 'rocket science' 4.0M, 'win' 1.0M -- the three
    4.0M ties must come back in phrase order (the deterministic
    tie-break both engines share)."""
    docs = spark.createDataFrame(
        [
            (1, "deep learning of deep models"),
            (2, "deep learning and rocket science for the win"),
        ],
        "doc_id int, text string",
    )
    got = [
        (r["phrase"], r["n_occur"], r["score_ppm"])
        for r in rake_keywords(docs).collect()
    ]
    assert got == [
        ("deep learning", 2, 4_000_000),
        ("deep models", 1, 4_000_000),
        ("rocket science", 1, 4_000_000),
        ("win", 1, 1_000_000),
    ]


def test_rake_keywords_max_len_cap(spark):
    """A 5-token stopword-free document is ONE candidate phrase of
    length 5 > max_len=4: dropped entirely (the cap that bounds the
    phrase explode on pathological stopword-free documents).  At
    max_len=5 the same phrase survives with score 5.0M (five words,
    each degree 5 freq 1)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id int, text string"
    )
    assert rake_keywords(docs, max_len=4).count() == 0
    got = rake_keywords(docs, max_len=5).collect()
    assert [(r["phrase"], r["n_occur"], r["score_ppm"]) for r in got] == [
        ("alpha beta gamma delta epsilon", 1, 25_000_000)
    ]


def test_ngram_novelty_planted_boilerplate(spark, tmp_path):
    """Planted novelty corpus through the registry query itself (the
    query reads <sf_dir>/documents.parquet):

    doc 1: 9 unique tokens -> 2 distinct 8-grams, both corpus-unique ->
    novel_ppm 1_000_000.  docs 2 and 3 share their first 8 tokens
    (boilerplate) and differ in token 9 -> each has 2 distinct grams, 1
    shared (df=2) + 1 novel -> 500_000.  doc 4 has 7 tokens -> no grams,
    NO ROW on either engine (the <8-token edge)."""
    from airflow_pipeline_text_processing_spark.plans.queries_scale import (
        text_ngram_novelty,
    )

    docs = spark.createDataFrame(
        [
            (1, "a1 a2 a3 a4 a5 a6 a7 a8 a9"),
            (2, "b1 b2 b3 b4 b5 b6 b7 b8 c9"),
            (3, "b1 b2 b3 b4 b5 b6 b7 b8 d9"),
            (4, "x1 x2 x3 x4 x5 x6 x7"),
        ],
        "doc_id int, text string",
    )
    sf_dir = str(tmp_path)
    docs.write.parquet(os.path.join(sf_dir, "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_distinct"], r["novel_ppm"])
        for r in text_ngram_novelty(spark, sf_dir).collect()
    }
    assert got == {
        1: (2, 1_000_000),
        2: (2, 500_000),
        3: (2, 500_000),
    }
