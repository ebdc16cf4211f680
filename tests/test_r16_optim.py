"""Round-16 optimization pins.

Each test guards an operator rewrite that changed internals while
keeping results bit-identical:

* ``lm.char_trigrams`` -- one codegen'd ``regexp_extract_all`` replaced
  the interpreted HOF pipeline (r12 form).  The pin replays the OLD
  formulation (transform/filter/sequence/substring) next to the new one
  over adversarial inputs: supplementary-plane characters (the bare
  zero-width lookahead splits surrogate pairs -- the consuming-dot
  pattern must not), Unicode line separators (``(?s)`` required), null
  text (must stay the empty array, not null), and short strings.
* ``text.tokens`` -- ``regexp_extract_all('[a-z0-9]+')`` replaced
  split-on-complement + drop-empties; the pin replays the old split
  form on the same adversarial set.
* ``dedup._star_round`` -- one parameterized ``spark.sql`` text
  replaced the ~35-py4j-call DataFrame chain; the pin replays the old
  DataFrame formulation (and the unfused ``_small_star(_large_star())``
  reference) over adversarial graphs, and checks the folded round-1
  fingerprint loop end to end via ``connected_components``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airflow_pipeline_text_processing_spark.operators.lm import char_trigrams
from airflow_pipeline_text_processing_spark.operators.text import tokens


def _old_char_trigrams(col):
    """The r12 HOF formulation, verbatim (the semantics being pinned)."""
    s = F.regexp_replace(F.lower(col), r"\s+", " ")
    return F.transform(
        F.array(s),
        lambda sv: F.filter(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(sv) - 2, F.lit(1))),
                lambda i: F.substring(sv, i, 3),
            ),
            lambda g: F.length(g) == 3,
        ),
    )[0]


def _old_tokens(col):
    """The pre-r16 split + filter formulation, verbatim."""
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )


ADVERSARIAL = [
    None,
    "",
    " ",
    "ab",
    "abc",
    "abcd",
    "a  b\t\nc d",
    "tab\tand\x0bvt\x0cff\rcr mix",
    "héllo wörld straße",
    "ÉΣΩ aBc MiXeD",
    " nbsp padded ",
    "line sep andnel",  # line separators: (?s) territory
    "emoji \U0001F600\U0001F601 pair",  # surrogate pairs in UTF-16
    "\U0001F600\U0001F601\U0001F602",  # supplementary-only text
    "a\U0001F600b\U0001F601c",  # BMP/astral interleave
    "ligature ﬁle İstanbul ı",
    "digits 12345 mixed a1b2c3",
    "  leading and trailing  ",
    "!!!only---separators???",
]


@pytest.mark.parametrize("fn_new,fn_old", [
    (char_trigrams, _old_char_trigrams),
    (tokens, _old_tokens),
], ids=["char_trigrams", "tokens"])
def test_regexp_rewrites_match_old_formulations(spark, fn_new, fn_old):
    df = spark.createDataFrame([(s,) for s in ADVERSARIAL], "text string")
    rows = df.select(
        "text", fn_old(F.col("text")).alias("a"), fn_new(F.col("text")).alias("b")
    ).collect()
    for r in rows:
        assert r.a == r.b, (
            f"rewrite diverges on {r.text!r}: old={r.a!r} new={r.b!r}"
        )
    # the fixture exercises the regimes the rewrite could break:
    # non-empty output exists, and the null row yields [] for trigrams
    by_text = {r.text: r for r in rows}
    assert by_text[None].b is not None or fn_new is tokens  # trigrams: []
    assert any(r.b for r in rows)


def _old_star_round(edges):
    """The pre-r16 DataFrame-API star round, verbatim."""
    from airflow_pipeline_text_processing_spark.operators.dedup import (
        _small_star,
    )

    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mnv"))
        .select("u", F.least("u", "mnv").alias("mn"))
    )
    large = (
        sym.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    return _small_star(large)


# graphs that exercise every star-round regime: chains (diameter),
# stars already converged, two components, self-contained triangles,
# duplicate/reversed edges, a long path, and a hub
_GRAPHS = [
    [],
    [(1, 2)],
    [(2, 1)],
    [(1, 2), (2, 3)],
    [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7)],
    [(10, 20), (30, 40)],
    [(1, 2), (2, 3), (1, 3)],
    [(5, 1), (5, 2), (5, 3), (5, 4)],
    [(1, 2), (2, 1), (1, 2)],
    [(7, 3), (3, 9), (9, 2), (2, 8), (100, 50), (50, 60)],
]


def test_star_round_sql_matches_dataframe_formulation(spark):
    from airflow_pipeline_text_processing_spark.operators.dedup import (
        _large_star,
        _small_star,
        _star_round,
    )

    for g in _GRAPHS:
        edges = spark.createDataFrame(
            g or [(0, 0)], "u long, v long"
        ).filter(F.lit(bool(g)))
        new = sorted(map(tuple, _star_round(edges).collect()))
        old = sorted(map(tuple, _old_star_round(edges).collect()))
        ref = sorted(map(tuple, _small_star(_large_star(edges)).collect()))
        assert new == old == ref, f"star round diverges on {g}: {new} vs {old}"


def test_connected_components_folded_fingerprint_loop(spark):
    from airflow_pipeline_text_processing_spark.operators.dedup import (
        connected_components,
    )

    # chain: one component rooted at the minimum
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}

    # already-converged star input: round 1's folded fingerprint pair
    # must detect the fixed point without extra rounds
    star = spark.createDataFrame([(2, 1), (3, 1)], "doc_a long, doc_b long")
    got = {
        (r.doc_id, r.cluster_id) for r in connected_components(star).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1)}

    # empty edge set: both tag groups absent -> (0, None) fingerprints
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(empty).count() == 0


def test_assign_top_cells_literal_path_matches_collect_path(spark):
    """r16: callers thread the driver-held centroid literal into
    assign_top_cells (skipping one collect action per assignment pass);
    the literal path must produce the identical memberships, including
    ties (stable argsort -> smaller cid) and r > k clamping."""
    from airflow_pipeline_text_processing_spark.operators.clustering import (
        assign_top_cells,
        kmeans_fixed_point,
    )

    vecs = spark.createDataFrame(
        [(i, [(i * 7) % 13, (i * 3) % 5, i % 2, 10 - (i % 11)])
         for i in range(40)],
        "vec_id long, q array<bigint>",
    )
    _, cents, lit = kmeans_fixed_point(vecs, k=4, iters=2, return_lit=True)
    for r in (1, 2, 99):  # plain, spill, r > k clamp
        via_collect = sorted(
            map(tuple, assign_top_cells(vecs, cents, r).collect())
        )
        via_lit = sorted(
            map(tuple, assign_top_cells(vecs, None, r, cents_lit=lit).collect())
        )
        assert via_collect == via_lit
    # two-tuple call form unchanged for existing callers
    assigned, cents2 = kmeans_fixed_point(vecs, k=4, iters=2)
    assert sorted(map(tuple, cents2.collect())) == sorted(
        map(tuple, cents.collect())
    )


def test_kth_smallest_multi_matches_single_rank_walks(spark):
    """r16: _kth_smallest_multi shares one histogram action per round
    across ranks; each rank's narrowing walk must be identical to the
    single-rank reference on tie-heavy, skewed, and narrow-range data."""
    from airflow_pipeline_text_processing_spark.plans.queries_scale import (
        _kth_smallest,
        _kth_smallest_multi,
    )

    datasets = [
        # heavy ties: one value owns most of the mass
        [5] * 9000 + list(range(100000, 101000)),
        # uniform wide range (forces several narrowing rounds)
        [i * 104729 % 100000007 for i in range(20000)],
        # narrow range below the cap (no histogram rounds at all)
        [i % 37 for i in range(5000)],
        # two far-apart clumps (empty middle buckets)
        [7] * 4000 + [10**9 + i for i in range(4000)],
    ]
    for data in datasets:
        df = spark.createDataFrame([(v,) for v in data], "v long")
        cents = df.localCheckpoint()
        n, lo, hi = len(data), min(data), max(data)
        ks = [(q, (n * q + 99) // 100) for q in (25, 50, 75)]
        multi = _kth_smallest_multi(cents, ks, lo, hi)
        data_sorted = sorted(data)
        for q, k in ks:
            single = _kth_smallest(cents, k, lo, hi)
            assert multi[q] == single == data_sorted[k - 1], (
                f"q={q} k={k}: multi={multi[q]} single={single} "
                f"true={data_sorted[k - 1]}"
            )
