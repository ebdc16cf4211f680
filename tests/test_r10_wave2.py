"""Property tests for the second-wave round-10 operators: directed
shingle containment (the asymmetric subset case Jaccard under-reports),
quality-canonical survivor pick (one keeper per cluster, argmax
semantics, singleton survival), and MMR re-ranking (the duplicate
demotion that IS the operator's purpose, plus the integer-objective
invariants).  Each plants data where the edge under test matters;
oracle equality at sf0.01 covers the registry compositions separately.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from airflow_pipeline_text_processing_spark.operators.dedup import (
    canonical_pick,
    containment_pairs,
)
from airflow_pipeline_text_processing_spark.operators.similarity import (
    mmr_rerank,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_containment_catches_subset_jaccard_misses(spark):
    """Doc A is a strict prefix of doc B (10 of B's 20 tokens): every one
    of A's 8 word-3-shingles appears in B's 18, so containment(A in B) is
    exactly 1e6 ppm while Jaccard is only 8/18 ~ 0.44 -- the asymmetric
    duplicate a 0.5-Jaccard threshold would silently keep.  A disjoint
    third doc must produce no pair at all."""
    a = " ".join(f"w{i}" for i in range(10))
    b = a + " " + " ".join(f"x{i}" for i in range(10))
    c = " ".join(f"z{i}" for i in range(10))
    out = containment_pairs(
        _docs(spark, [a, b, c]), threshold_ppm=700_000
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (0, 1)
    assert (r.n_common, r.size_a, r.size_b) == (8, 8, 18)
    assert r.cont_a_in_b_ppm == 1_000_000
    assert r.cont_b_in_a_ppm == (8 * 1_000_000) // 18  # 444_444
    # the Jaccard this pair would have scored: below a 0.5 dedup threshold
    assert r.n_common / (r.size_a + r.size_b - r.n_common) < 0.5


def test_containment_threshold_filters_both_directions(spark):
    """The filter keys on the LARGER direction: a half-overlap pair
    (cont 500k/500k) dies at 700k but survives at 400k."""
    a = " ".join(f"w{i}" for i in range(10)) + " " + " ".join(
        f"y{i}" for i in range(10)
    )
    b = " ".join(f"w{i}" for i in range(10)) + " " + " ".join(
        f"x{i}" for i in range(10)
    )
    docs = _docs(spark, [a, b])
    assert containment_pairs(docs, threshold_ppm=700_000).count() == 0
    kept = containment_pairs(docs, threshold_ppm=400_000).collect()
    assert len(kept) == 1 and kept[0].n_common == 8


def test_canonical_pick_keeps_best_quality_and_singletons(spark):
    """Cluster {0,1,2} linked only transitively (0-1, 1-2); doc 1 is
    crafted to out-score its twins on the quality heuristic (stopword-rich,
    all-unique, no punctuation) while 0 and 2 are junk.  Exactly one
    keeper per cluster; the keeper is the quality argmax; the unlinked
    doc 3 survives as its own singleton cluster."""
    junk = "zz zz zz zz zz !!!! ;;;; ...."
    good = "the a and of to in is for on with unique tokens here"
    other = "completely different singleton content"
    docs = _docs(spark, [junk, good, junk + " extra", other])
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2)], "doc_a long, doc_b long"
    )
    rows = {r.doc_id: r for r in canonical_pick(docs, pairs).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert all(rows[d].cluster_id == 0 for d in (0, 1, 2))
    assert [rows[d].n_members for d in (0, 1, 2, 3)] == [3, 3, 3, 1]
    assert [rows[d].is_kept for d in (0, 1, 2, 3)] == [0, 1, 0, 1]
    assert rows[3].cluster_id == 3
    # the pick really is the argmax of the emitted quality_ppm
    best = max((rows[d] for d in (0, 1, 2)),
               key=lambda r: (r.quality_ppm, -r.doc_id))
    assert best.is_kept == 1


def test_canonical_pick_tiebreak_on_doc_id(spark):
    """Identical texts => identical quality_ppm: the survivor must be the
    LOWEST doc_id (the deterministic tiebreak both engines share)."""
    same = "the same exact words repeated here for every copy"
    docs = _docs(spark, [same, same, same])
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2)], "doc_a long, doc_b long"
    )
    rows = {r.doc_id: r for r in canonical_pick(docs, pairs).collect()}
    assert [rows[d].is_kept for d in (0, 1, 2)] == [1, 0, 0]
    assert len({rows[d].quality_ppm for d in (0, 1, 2)}) == 1


def _vecs(spark, ids_vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in ids_vecs],
        "vec_id long, embedding array<float>",
    )


def test_mmr_demotes_duplicate_candidate(spark):
    """The operator's reason to exist: candidates 1 and 2 are IDENTICAL
    vectors (an exact duplicate pair atop the relevance ranking -- rel
    ties, id breaks it), candidate 3 matches their relevance but points
    elsewhere, candidate 4 is irrelevant.  Pure relevance order is
    [1, 2, 3, 4]; MMR must pick 1, then 3 (2's redundancy penalty is the
    full 1e6), and only then 2."""
    q = _vecs(spark, [(0, [100, 0, 0, 0])])
    cands = _vecs(
        spark,
        [
            (1, [90, 44, 0, 0]),
            (2, [90, 44, 0, 0]),
            (3, [90, 0, 44, 0]),
            (4, [0, 0, 0, 100]),
        ],
    )
    out = mmr_rerank(q, cands, k=4, pool=4).collect()
    assert [r.cand_id for r in out] == [1, 3, 2, 4]
    by_id = {r.cand_id: r for r in out}
    # relevance ties between the duplicate pair and the diverse candidate
    assert by_id[1].rel_ppm == by_id[2].rel_ppm == by_id[3].rel_ppm
    # the duplicate's penalty is the full similarity ceiling
    assert by_id[2].penalty_ppm >= 999_999
    # pick 1 pays no redundancy penalty
    assert out[0].penalty_ppm == 0 and out[0].pick_order == 1
    # the integer objective is exactly what the column claims
    for r in out:
        assert r.mmr_score == 7 * r.rel_ppm - 3 * r.penalty_ppm


def test_mmr_pick_one_is_pure_relevance_argmax(spark):
    """With k=1 MMR degenerates to top-1 by (rel_ppm, cand_id) -- the
    floored-ppm ranking, not the raw-double ranking, on both engines."""
    q = _vecs(spark, [(0, [100, 0, 0, 0])])
    cands = _vecs(
        spark, [(5, [50, 1, 0, 0]), (7, [100, 1, 0, 0]), (9, [3, 9, 9, 9])]
    )
    out = mmr_rerank(q, cands, k=1, pool=3).collect()
    assert len(out) == 1
    assert out[0].cand_id == 7 and out[0].pick_order == 1


def test_strip_boilerplate_removes_corpus_frequent_lines(spark):
    """Three docs share a footer line (df=3 = min_df -> stripped
    everywhere); each doc's own content line (df=1) survives in order;
    blank lines never count; a doc that is ONLY boilerplate keeps an
    empty string; a doc with no non-blank lines still emits (0, 0, '')."""
    from airflow_pipeline_text_processing_spark.operators.text import (
        strip_boilerplate,
    )

    footer = "all rights reserved"
    docs = _docs(
        spark,
        [
            f"alpha content\n\n{footer}",
            f"beta first\nbeta second\n{footer}",
            footer,
            "gamma only unique",
            "\n\n",
        ],
    )
    rows = {r.doc_id: r for r in strip_boilerplate(docs, min_df=3).collect()}
    assert rows[0].kept_text == "alpha content"
    assert (rows[0].n_lines, rows[0].n_removed_lines) == (2, 1)  # blank skipped
    assert rows[1].kept_text == "beta first\nbeta second"
    assert (rows[1].n_lines, rows[1].n_removed_lines) == (3, 1)
    assert rows[2].kept_text == "" and rows[2].n_removed_lines == 1
    assert rows[3].kept_text == "gamma only unique"
    assert rows[3].n_removed_lines == 0
    assert (rows[4].n_lines, rows[4].n_removed_lines, rows[4].kept_text) == (
        0, 0, "",
    )
    # df=2 stays below the bar: nothing stripped
    two = _docs(spark, [f"x\n{footer}", f"y\n{footer}"])
    out2 = {r.doc_id: r for r in strip_boilerplate(two, min_df=3).collect()}
    assert out2[0].n_removed_lines == 0 and footer in out2[0].kept_text
