"""Event-analytics semantics: ordered funnel sequencing and cohort
retention (plans/queries_ext.py::events_funnel_steps /
events_retention_cohorts).

The hard parts under test: a user whose click precedes their first view
must NOT advance in the funnel (ordering, not mere co-occurrence), and a
user active only on their cohort day contributes only to offset 0.  The
planted corpus is written to a tmp parquet dir shaped like a testdata
sf_dir, so the queries run exactly as the driver runs them.
"""

from __future__ import annotations

import datetime as dt

from airflow_pipeline_text_processing_spark.plans.queries_ext import (
    events_funnel_steps,
    events_retention_cohorts,
)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_funnel_requires_strict_ordering(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: view -> click -> purchase (full conversion)
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + m, 1, "click", 1.0, "{}"),
        (3, t0 + 2 * m, 1, "purchase", 1.0, "{}"),
        # user 2: click BEFORE view -- must stop at step 1
        (4, t0, 2, "click", 1.0, "{}"),
        (5, t0 + m, 2, "view", 1.0, "{}"),
        # user 3: view -> click, purchase before the click -- stops at 2
        (6, t0, 3, "purchase", 1.0, "{}"),
        (7, t0 + m, 3, "view", 1.0, "{}"),
        (8, t0 + 2 * m, 3, "click", 1.0, "{}"),
        # user 4: never views -- not even step 1
        (9, t0, 4, "click", 1.0, "{}"),
        (10, t0 + m, 4, "purchase", 1.0, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {r.step_idx: r for r in events_funnel_steps(spark, sf_dir).collect()}
    assert out[1].n_users == 3  # users 1, 2, 3 viewed
    assert out[2].n_users == 2  # users 1 and 3 clicked after viewing
    assert out[3].n_users == 1  # only user 1 purchased after clicking
    assert out[1].conv_milli == 1000
    assert out[3].conv_milli == 333


def test_retention_offsets_count_active_days(spark, tmp_path):
    d = lambda day, hour=9: dt.datetime(2024, 1, day, hour, 0, 0)
    rows = [
        # user 1: cohort day 1, active days 1, 2, 4
        (1, d(1), 1, "view", 1.0, "{}"),
        (2, d(2), 1, "view", 1.0, "{}"),
        (3, d(2, 15), 1, "click", 1.0, "{}"),  # same day: one active day
        (4, d(4), 1, "view", 1.0, "{}"),
        # user 2: cohort day 1, active day 1 only
        (5, d(1), 2, "view", 1.0, "{}"),
        # user 3: cohort day 2, active days 2 and 12 (offset 10 > 7: cut)
        (6, d(2), 3, "view", 1.0, "{}"),
        (7, d(12), 3, "view", 1.0, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {
        (r.cohort_day, r.offset_days): r
        for r in events_retention_cohorts(spark, sf_dir).collect()
    }
    assert out[("2024-01-01", 0)].n_active == 2
    assert out[("2024-01-01", 0)].cohort_n == 2
    assert out[("2024-01-01", 1)].n_active == 1  # user 1 on day 2, once
    assert out[("2024-01-01", 3)].n_active == 1
    assert ("2024-01-01", 2) not in out
    assert out[("2024-01-02", 0)].n_active == 1
    assert ("2024-01-02", 10) not in out  # offset beyond 7 excluded
    assert out[("2024-01-01", 1)].retention_milli == 500


def test_pagerank_star_graph_ranks_hub_highest(spark):
    from airflow_pipeline_text_processing_spark.operators.graph import (
        SCALE,
        pagerank_fixed,
    )

    # star digraph: a,b,c all point to hub; hub points back to a only
    nodes = spark.createDataFrame(
        [("hub",), ("a",), ("b",), ("c",)], "node string"
    )
    edges = spark.createDataFrame(
        [("a", "hub", 10), ("b", "hub", 10), ("c", "hub", 10),
         ("hub", "a", 5)],
        "src string, dst string, w long",
    )
    out = {r.node: r.rank_fp for r in pagerank_fixed(nodes, edges, 3).collect()}
    assert out["hub"] > out["a"] > out["b"]  # a gets hub's flow back
    assert out["b"] == out["c"]              # symmetric leaves
    # mass is bounded by SCALE (dangling simplification loses mass only)
    assert sum(out.values()) <= SCALE


def test_transition_edges_respects_per_user_order(spark):
    import datetime as dt
    from airflow_pipeline_text_processing_spark.operators.graph import (
        transition_edges,
    )

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1: view -> click -> view
        (1, t0, 1, "view"), (2, t0 + s, 1, "click"), (3, t0 + 2 * s, 1, "view"),
        # user 2: click -> view; the cross-user boundary must NOT create
        # a (view@u1, click@u2) edge
        (4, t0 + 3 * s, 2, "click"), (5, t0 + 4 * s, 2, "view"),
        # same-ts tie within user 3 broken by event_id
        (6, t0, 3, "purchase"), (7, t0, 3, "error"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {(r.src, r.dst): r.w for r in transition_edges(ev).collect()}
    assert got == {
        ("view", "click"): 1,
        ("click", "view"): 2,
        ("purchase", "error"): 1,
    }


from airflow_pipeline_text_processing_spark.plans.queries_ext import (
    events_anomaly_days,
    events_rolling_active_users,
)


def test_anomaly_days_flags_planted_spike(spark, tmp_path):
    import datetime as dt

    rows = []
    eid = 0
    # 10 steady days of 10 events, then a 30-event spike, then steady
    for day in range(1, 15):
        n = 30 if day == 12 else 10
        for k in range(n):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, day, 8, 0, k), 1, "view", 1.0, "{}")
            )
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {r.day: r for r in events_anomaly_days(spark, sf_dir).collect()}
    assert out["2024-01-12"].is_anomaly == 1
    assert out["2024-01-11"].is_anomaly == 0
    # the spike inflates the NEXT day's trailing mean but 10 vs
    # mean~12.8 is within 50%: not flagged
    assert out["2024-01-13"].is_anomaly == 0
    # first 3 days have trail_n < 3: excluded from output
    assert "2024-01-02" not in out and "2024-01-03" not in out


def test_rolling_active_users_exact_wau(spark, tmp_path):
    import datetime as dt

    rows = [
        # user 1 active days 1 and 5; user 2 active day 3 only
        (1, dt.datetime(2024, 1, 1), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 5), 1, "view", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 3), 2, "view", 1.0, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {
        r.day: r for r in events_rolling_active_users(spark, sf_dir).collect()
    }
    # report days limited to observed DAU days (inner join with dau)
    assert out["2024-01-01"].dau == 1 and out["2024-01-01"].wau == 1
    # day 3: users 1 (active day 1) and 2 (active day 3) in window
    assert out["2024-01-03"].dau == 1 and out["2024-01-03"].wau == 2
    # day 5: user 1 counted ONCE despite two active days in window
    assert out["2024-01-05"].dau == 1 and out["2024-01-05"].wau == 2
    assert out["2024-01-03"].stickiness_milli == 500


def test_concurrency_peaks_known_intervals_and_midnight_carry(spark):
    """Hand-built schedule: three overlapping 10-min intervals peak at
    3; a burst that starts before midnight must carry its level into
    the next day even if that day's own boundaries never reach it."""
    import pyspark.sql.functions as F

    from airflow_pipeline_text_processing_spark.operators.windows import (
        concurrency_peaks,
    )

    rows = [
        # day 1: a,b,c overlap (peak 3), d isolated
        (0, "2024-03-01 10:00:00"),
        (1, "2024-03-01 10:03:00"),
        (2, "2024-03-01 10:06:00"),
        (3, "2024-03-01 18:00:00"),
        # burst straddling midnight: 4 intervals open at 00:00
        (4, "2024-03-01 23:55:00"),
        (5, "2024-03-01 23:56:00"),
        (6, "2024-03-01 23:57:00"),
        (7, "2024-03-01 23:58:00"),
        # day 2: one lonely event
        (8, "2024-03-02 12:00:00"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts string").select(
        "event_id", F.to_timestamp("ts").alias("ts")
    )
    out = {str(r.day): (r.peak_concurrency, r.n_starts)
           for r in concurrency_peaks(ev).collect()}
    assert out["2024-03-01"] == (4, 8)
    # day 2 peak: the 4-deep burst is still open at midnight (carry);
    # its own boundaries (ends at 00:05-00:08 + event 8) never exceed it
    assert out["2024-03-02"] == (4, 1)

    # partition-independence of the two-level prefix sum + carry
    out2 = {str(r.day): (r.peak_concurrency, r.n_starts)
            for r in concurrency_peaks(ev.repartition(7)).collect()}
    assert out2 == out


def test_chi_square_zero_on_independent_table(spark, tmp_path):
    """A contingency table whose cells exactly equal the product of its
    marginals must score chi2 == 0; perturbing one cell must not."""
    import pyspark.sql.functions as F

    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        stats_chi_square,
    )

    def write_docs(counts, name):
        rows = []
        i = 0
        for (lang, src), n in counts.items():
            for _ in range(n):
                rows.append((i, "x", lang, src, 1))
                i += 1
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        d = str(tmp_path / name)
        df.write.parquet(d + "/documents.parquet")
        return d

    indep = {("en", "a"): 10, ("en", "b"): 20, ("fr", "a"): 30, ("fr", "b"): 60}
    r = stats_chi_square(spark, write_docs(indep, "indep")).collect()[0]
    assert (r.chi2_micro, r.dof, r.n_docs, r.n_cells) == (0, 1, 120, 4)

    skew = {("en", "a"): 25, ("en", "b"): 5, ("fr", "a"): 15, ("fr", "b"): 75}
    r2 = stats_chi_square(spark, write_docs(skew, "skew")).collect()[0]
    assert r2.chi2_micro > 0


def test_trimmed_mean_drops_exact_deciles(spark, tmp_path):
    """10 rows of 1.00..10.00: a 10% trim drops exactly the min and max
    row, and the core mean is exact in milli-units."""
    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        stats_trimmed_mean,
    )

    rows = [(i, "click", float(i + 1)) for i in range(10)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    d = str(tmp_path / "sf")
    df.write.parquet(d + "/events.parquet")
    r = stats_trimmed_mean(spark, d).collect()[0]
    assert (r.event_type, r.n_kept) == ("click", 8)
    assert (r.cents_lo, r.cents_hi) == (200, 900)
    assert r.trimmed_mean_milli == 550_000


def test_ewma_daily_exact_fixed_point_weights(spark, tmp_path):
    """Planted 4-day series 10/20/30/40 cents: the power-of-two weight
    ladder gives exactly floor((sum v_j * 2^(j-1)) / (2^m - 1)) --
    10, 16, 24, 32 -- with short leading windows renormalized over the
    weights present."""
    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        events_ewma_daily,
    )

    rows = [
        (d, dt.datetime(2024, 1, d, 8, 0, 0), 1, "view", d * 0.10, "{}")
        for d in range(1, 5)
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {r.day: r for r in events_ewma_daily(spark, sf_dir).collect()}
    assert [out[f"2024-01-0{d}"].value_cents for d in range(1, 5)] == [
        10, 20, 30, 40,
    ]
    # (10)/1, (10+40)/3, (10+40+120)/7, (10+40+120+320)/15 -- floored
    assert [out[f"2024-01-0{d}"].ewma_cents for d in range(1, 5)] == [
        10, 16, 24, 32,
    ]


def test_mann_whitney_hand_case_with_ties(spark, tmp_path):
    """Hand-ranked pooled sample with a tie straddling the groups:
    A = {1.00, 2.00, 3.00}, B = {2.00, 4.00}.  Midranks
    1, 2.5, 2.5, 4, 5 give U_A = 1.5, U_B = 4.5 -- doubled to stay
    integer: u_x2 = 3 and 9, and each row's u_other mirrors the other
    group's U (U_A + U_B = n1*n2)."""
    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        stats_mann_whitney,
    )

    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
    rows = [
        (1, t0, 1, "a", 1.0, "{}"),
        (2, t0, 1, "a", 2.0, "{}"),
        (3, t0, 1, "a", 3.0, "{}"),
        (4, t0, 2, "b", 2.0, "{}"),
        (5, t0, 2, "b", 4.0, "{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {r.event_type: r for r in stats_mann_whitney(spark, sf_dir).collect()}
    a, b = out["a"], out["b"]
    assert (a.n1, a.n2, a.u_x2, a.u_other_x2) == (3, 2, 3, 9)
    assert (b.n1, b.n2, b.u_x2, b.u_other_x2) == (2, 3, 9, 3)
    # identity: u_x2 + u_other_x2 == 2 * n1 * n2
    for r in (a, b):
        assert r.u_x2 + r.u_other_x2 == 2 * r.n1 * r.n2


def test_topics_kmeans_assigns_every_tokenized_doc_once(spark):
    """Hashed-BoW topic clustering on the real sf0.001 corpus: every
    document with at least one token is assigned exactly once, cluster
    ids come from the seeded range, and documents with IDENTICAL text
    (the corpus's planted exact dups) land in the same cluster at the
    same distance (the vectorization is a pure function of text)."""
    import pyspark.sql.functions as F

    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        text_topics_kmeans,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tokenized = docs.filter(
        F.size(F.split(F.lower("text"), "[^a-z0-9]+")) > 0
    )
    out = text_topics_kmeans(spark, sf_dir).collect()
    assert len(out) == len({r.doc_id for r in out})

    by_doc = {r.doc_id: (r.cid, r.d2) for r in out}
    assert all(1 <= cid <= 5 for cid, _ in by_doc.values())

    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert set(by_doc) == {
        did for did, t in texts.items()
        if any(c.isalnum() for c in t.lower())
    }
    from collections import defaultdict
    groups = defaultdict(list)
    for did, t in texts.items():
        groups[t].append(did)
    for dids in groups.values():
        if len(dids) > 1:
            assert len({by_doc[d] for d in dids if d in by_doc}) <= 1
