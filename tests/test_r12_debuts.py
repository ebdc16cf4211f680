"""Round-12 debut operators: Cohen's kappa + per-domain quality cap."""

from __future__ import annotations

from airflow_pipeline_text_processing_spark.operators.quality import cohen_kappa
from airflow_pipeline_text_processing_spark.plans.curation import domain_cap


def _kappa_py(pairs):
    """Independent reference: integer kappa_ppm from first principles."""
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    labels = {x for p in pairs for x in p}
    s = sum(
        sum(1 for a, _ in pairs if a == k) * sum(1 for _, b in pairs if b == k)
        for k in labels
    )
    if n * n == s:
        return 0
    return (n * agree - s) * 1_000_000 // (n * n - s)  # python // floors


def _kappa_spark(spark, pairs):
    df = spark.createDataFrame(pairs, "a string, b string")
    return cohen_kappa(df, "a", "b").collect()[0]


def test_kappa_perfect_and_degenerate(spark):
    perfect = [("x", "x")] * 7 + [("y", "y")] * 3
    row = _kappa_spark(spark, perfect)
    assert row.n_rows == 10 and row.n_agree == 10
    assert row.po_ppm == 1_000_000
    assert row.kappa_ppm == _kappa_py(perfect)
    # one class on both sides: pe = 1, the N^2 == S guard must yield 0
    # on both engines instead of 0/0
    degenerate = [("x", "x")] * 5
    assert _kappa_spark(spark, degenerate).kappa_ppm == 0


def test_kappa_matches_reference_incl_negative(spark):
    # worse-than-chance agreement: systematic disagreement on a 50/50
    # mix gives kappa = -1; the floor device must round toward -inf
    # identically to python
    anti = [("x", "y")] * 5 + [("y", "x")] * 5
    row = _kappa_spark(spark, anti)
    assert row.kappa_ppm == _kappa_py(anti) == -1_000_000
    mixed = (
        [("x", "x")] * 4 + [("x", "y")] * 2 + [("y", "y")] * 3
        + [("y", "x")] * 1 + [("z", "x")] * 1
    )
    row = _kappa_spark(spark, mixed)
    assert row.kappa_ppm == _kappa_py(mixed)
    assert 0 < row.kappa_ppm < 1_000_000


def test_domain_cap_keeps_best_n_per_source(spark):
    # quality_score ranks longer, stopword-ier docs higher; what matters
    # here is that the cap keeps EXACTLY per_source rows per source and
    # that the kept set is the top of the (quality_ppm, doc_id) order
    rows = []
    for src in ("a", "b"):
        for i in range(6):
            base = 100 if src == "a" else 200
            # doc i repeats 'the word' i+1 times: quality varies with i
            rows.append(
                (base + i, "the word " * (i + 1) + "tail%d" % i, src)
            )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = domain_cap(docs, per_source=2).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert set(by_src) == {"a", "b"}
    for src, kept in by_src.items():
        assert len(kept) == 2
        assert sorted(r.rk for r in kept) == [1, 2]
    # rank 1 must have the max quality_ppm in its source (doc_id tiebreak)
    from airflow_pipeline_text_processing_spark.operators.text import (
        quality_score,
    )

    q = {
        r.doc_id: r
        for r in quality_score(docs).select("doc_id", "quality").collect()
    }
    for src, kept in by_src.items():
        src_ids = [d for d, _t, s in rows if s == src]
        best = max(
            src_ids,
            key=lambda d: (int(q[d].quality * 1_000_000), -d),
        )
        assert min(kept, key=lambda r: r.rk).doc_id == best


def test_domain_cap_sources_smaller_than_cap_survive_whole(spark):
    docs = spark.createDataFrame(
        [(1, "the a and of to", "tiny"), (2, "the a and of to in", "tiny")],
        "doc_id long, text string, source string",
    )
    out = domain_cap(docs, per_source=10).collect()
    assert {r.doc_id for r in out} == {1, 2}
    assert {r.rk for r in out} == {1, 2}


def test_leakage_safe_split_clusters_never_straddle(spark):
    from airflow_pipeline_text_processing_spark.plans.curation import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, "t%d" % i) for i in range(40)], "doc_id long, text string"
    )
    # chain 0-1-2 one cluster; 10-11 another; rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "doc_a long, doc_b long"
    )
    out = leakage_safe_split(docs, pairs).collect()
    assert len(out) == 40
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    # the structural property: one split per cluster
    assert all(len(s) == 1 for s in by_cluster.values())
    rows = {r.doc_id: r for r in out}
    assert rows[0].cluster_id == rows[1].cluster_id == rows[2].cluster_id == 0
    assert rows[0].n_members == 3
    assert rows[10].split == rows[11].split
    # singleton reduces exactly to the per-doc hash_split
    from airflow_pipeline_text_processing_spark.operators.sampling import (
        hash_split,
    )
    import pyspark.sql.functions as F

    solo = {
        r.doc_id: r.split
        for r in hash_split(docs, F.col("doc_id")).collect()
    }
    for d in range(3, 10):
        assert rows[d].split == solo[d]


def test_token_budget_greedy_fill_semantics(spark):
    from airflow_pipeline_text_processing_spark.plans.curation import (
        token_budget_select,
    )

    # source 'a': three docs of ~10/20/30 tokens with quality ordered by
    # construction (more stopwords -> higher quality score here)
    rows = [
        (1, "the a and of to in is for on with", "a"),       # 10 toks, high q
        (2, "word " * 20, "a"),                               # 20 toks
        (3, "zz " * 30, "a"),                                 # 30 toks
        (10, "the a and of to", "b"),                         # 5 toks
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: r for r in token_budget_select(docs, 25).collect()}
    # source a: doc 1 (10 toks, cum 10 < 25 start 0) kept; next by rank
    # fills until the budget line; the doc that STARTS past 25 is cut
    kept_a = [d for d in out.values() if d.source == "a"]
    cum = 0
    for r in sorted(kept_a, key=lambda r: r.rk):
        assert cum < 25  # it started before the budget was exhausted
        cum += r.n_tokens
        assert r.cum_tokens == cum
    # source b fits entirely
    assert out[10].cum_tokens == 5 and out[10].rk == 1
    # determinism: rerun is identical
    again = {r.doc_id: r for r in token_budget_select(docs, 25).collect()}
    assert {d: (r.rk, r.cum_tokens) for d, r in out.items()} == {
        d: (r.rk, r.cum_tokens) for d, r in again.items()
    }
