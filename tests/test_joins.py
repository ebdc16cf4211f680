"""As-of and range join operators vs naive (per-row / theta-join)
reference computations on adversarial fixtures: equal-timestamp ties,
missing matches, bucket-boundary straddles."""

import datetime as dt

import pyspark.sql.functions as F

from airflow_pipeline_text_processing_spark.operators.joins import (
    asof_join,
    range_join_bucketed,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds):
    return T0 + dt.timedelta(seconds=seconds)


def _fixture(spark):
    # (event_id, ts, user_id, kind, value) -- crafted ties:
    #   user 1: right rows at t=10 and t=10 (tie -> greater event_id wins),
    #           left row exactly AT t=10 (inclusive semantics boundary)
    #   user 2: left before any right (no match)
    rows = [
        (1, _ts(5), 1, "r", 1.0),
        (2, _ts(10), 1, "r", 2.0),
        (3, _ts(10), 1, "r", 3.0),
        (4, _ts(10), 1, "l", 0.0),
        (5, _ts(20), 1, "l", 0.0),
        (6, _ts(3), 2, "l", 0.0),
        (7, _ts(8), 2, "r", 4.0),
        (8, _ts(9), 2, "l", 0.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, kind string, value double"
    )


def _naive_asof(rows_l, rows_r, inclusive=True):
    out = {}
    for l in rows_l:
        cands = [
            r
            for r in rows_r
            if r.user_id == l.user_id
            and (r.ts <= l.ts if inclusive else r.ts < l.ts)
        ]
        best = max(cands, key=lambda r: (r.ts, r.event_id), default=None)
        out[l.event_id] = best.event_id if best else None
    return out


def test_asof_join_matches_naive_with_ties(spark):
    df = _fixture(spark)
    left = df.filter(F.col("kind") == "l").drop("kind")
    right = df.filter(F.col("kind") == "r").drop("kind")
    got = {
        r.event_id: r.m_event_id
        for r in asof_join(
            left, right, ["user_id"], "ts", "ts",
            payload=["event_id", "ts", "value"], prefix="m_",
            tiebreak=["event_id"],
        ).collect()
    }
    expected = _naive_asof(left.collect(), right.collect(), inclusive=True)
    assert got == expected
    # the t=10 tie must pick event_id 3 (greatest), not 2
    assert got[4] == 3
    # no-match left keeps nulls
    assert got[6] is None


def test_asof_join_strict_excludes_equal_ts(spark):
    df = _fixture(spark)
    left = df.filter(F.col("kind") == "l").drop("kind")
    right = df.filter(F.col("kind") == "r").drop("kind")
    got = {
        r.event_id: r.m_event_id
        for r in asof_join(
            left, right, ["user_id"], "ts", "ts",
            payload=["event_id"], prefix="m_", tiebreak=["event_id"],
            allow_exact_matches=False,
        ).collect()
    }
    expected = _naive_asof(left.collect(), right.collect(), inclusive=False)
    assert got == expected
    assert got[4] == 1  # t=10 rights excluded, falls back to t=5


def test_range_join_bucketed_equals_theta_join(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, _ts(rng.uniform(0, 2000)), rng.randint(1, 5), rng.random())
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    r = df.select(
        "user_id",
        F.col("ts").alias("o_ts"),
        F.col("event_id").alias("o_event_id"),
    )
    naive = (
        df.alias("a")
        .join(r.alias("b"), "user_id")
        .filter(
            (F.col("o_ts") > F.col("ts"))
            & (F.col("o_ts") <= F.col("ts") + F.expr("INTERVAL 90 SECONDS"))
        )
        .select("event_id", "o_event_id")
    )
    expected = {(x.event_id, x.o_event_id) for x in naive.collect()}
    # widths below / at / above the span, all must agree exactly
    for width in (30, 90, 250):
        got = {
            (x.event_id, x.o_event_id)
            for x in range_join_bucketed(
                df, r, ["user_id"], "ts", "o_ts", 0, 90, bucket_seconds=width
            ).collect()
        }
        assert got == expected, f"width={width}"


def test_range_aggregate_matches_pair_join_aggregation(spark):
    """range_aggregate's frame stats must equal aggregating the bucketed
    range join's pairs, including zero-match rows and sub-second strict
    boundaries."""
    import random

    from airflow_pipeline_text_processing_spark.operators.joins import (
        range_aggregate,
    )

    rng = random.Random(23)
    rows = [
        (i, _ts(rng.uniform(0, 2000)), rng.randint(1, 5), rng.random())
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    r = df.select(
        "user_id",
        F.col("ts").alias("o_ts"),
        F.col("event_id").alias("o_event_id"),
    )
    pairs = range_join_bucketed(df, r, ["user_id"], "ts", "o_ts", 0, 90)
    expected = {
        row.event_id: row.n
        for row in pairs.groupBy("event_id")
        .agg(F.count("o_event_id").alias("n"))
        .collect()
    }
    got = {
        row.event_id: row.n_follow
        for row in range_aggregate(
            df, ["user_id"], "ts", [(F.count("event_id"), "n_follow")], 0, 90
        ).collect()
    }
    assert len(got) == 300  # every row gets stats, zero-match included
    for eid, n in got.items():
        assert n == expected.get(eid, 0)


def test_asof_join_forward_matches_naive(spark):
    """Forward as-of: least right_ts >= left_ts per key, against a naive
    per-row correlated computation."""
    import random

    rng = random.Random(7)
    left_rows = [
        (i, _ts(rng.uniform(0, 1000)), rng.randint(1, 4)) for i in range(120)
    ]
    right_rows = [
        (1000 + i, _ts(rng.uniform(0, 1000)), rng.randint(1, 4))
        for i in range(150)
    ]
    left = spark.createDataFrame(
        left_rows, "event_id long, ts timestamp, user_id long"
    )
    right = spark.createDataFrame(
        right_rows, "r_id long, ts timestamp, user_id long"
    )
    got = {
        r.event_id: r.m_r_id
        for r in asof_join(
            left, right, ["user_id"], "ts", "ts",
            payload=["r_id"], prefix="m_", direction="forward",
        ).collect()
    }
    rights_by_user = {}
    for rid, ts, uid in right_rows:
        rights_by_user.setdefault(uid, []).append((ts, rid))
    for eid, ts, uid in left_rows:
        cands = [(rts, rid) for rts, rid in rights_by_user.get(uid, []) if rts >= ts]
        want = min(cands)[1] if cands else None
        assert got[eid] == want, (eid, got[eid], want)


def test_asof_join_tolerance_nulls_stale_matches(spark):
    """tolerance_s must null matches farther than the horizon while
    keeping rows (merge_asof parity), verified against a naive scan."""
    import random

    rng = random.Random(31)
    left_rows = [
        (i, _ts(rng.uniform(0, 500)), rng.randint(1, 3)) for i in range(80)
    ]
    right_rows = [
        (1000 + i, _ts(rng.uniform(0, 500)), rng.randint(1, 3))
        for i in range(60)
    ]
    left = spark.createDataFrame(
        left_rows, "event_id long, ts timestamp, user_id long"
    )
    right = spark.createDataFrame(
        right_rows, "r_id long, ts timestamp, user_id long"
    )
    got = {
        r.event_id: r.m_r_id
        for r in asof_join(
            left, right, ["user_id"], "ts", "ts",
            payload=["r_id"], prefix="m_", tolerance_s=30,
        ).collect()
    }
    rights_by_user = {}
    for rid, ts, uid in right_rows:
        rights_by_user.setdefault(uid, []).append((ts, rid))
    for eid, ts, uid in left_rows:
        cands = [
            (rts, rid)
            for rts, rid in rights_by_user.get(uid, [])
            if rts <= ts
        ]
        want = max(cands)[1] if cands else None
        if want is not None and (ts - max(cands)[0]).total_seconds() > 30:
            want = None
        assert got[eid] == want, (eid, got[eid], want)


def test_fuzzy_name_pairs_finds_planted_twins_without_cross_join(spark):
    from airflow_pipeline_text_processing_spark.operators.joins import (
        fuzzy_name_pairs,
    )
    import pyspark.sql.functions as F

    names = [
        "small ring", "red widget", "blue bolt", "hot gear", "small gizmo",
    ]
    rows = [(n,) for n in names]
    # one-char corruption of each (char 3 -> 'q'): dist 1 twins
    rows += [(n[:2] + "q" + n[3:],) for n in names]
    df = spark.createDataFrame(rows, "name string")
    out = fuzzy_name_pairs(df, "name", max_dist=2)
    pairs = {(r.name_a, r.name_b) for r in out.collect()}
    for n in names:
        twin = n[:2] + "q" + n[3:]
        a, b = sorted([n, twin])
        assert (a, b) in pairs, (a, b)
    dists = {r.dist for r in out.collect()}
    assert dists <= {1, 2}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_name_pairs_identical_names_collapse(spark):
    from airflow_pipeline_text_processing_spark.operators.joins import (
        fuzzy_name_pairs,
    )

    # a "hot" name repeated 500x must not pairwise-expand: distinct-name
    # relation means zero dist-0 pairs and one row per unique name
    rows = [("popular name",)] * 500 + [("popular nqme",)]
    df = spark.createDataFrame(rows, "name string")
    out = fuzzy_name_pairs(df, "name", max_dist=2).collect()
    assert len(out) == 1
    assert out[0].dist == 1


def _naive_nearest(rows_l, rows_r, inclusive=True, tol_s=None):
    out = {}
    for l in rows_l:
        back = [
            r for r in rows_r
            if r.user_id == l.user_id
            and (r.ts <= l.ts if inclusive else r.ts < l.ts)
        ]
        fwd = [
            r for r in rows_r
            if r.user_id == l.user_id
            and (r.ts >= l.ts if inclusive else r.ts > l.ts)
        ]
        b = max(back, key=lambda r: (r.ts, r.event_id), default=None)
        f = min(fwd, key=lambda r: (r.ts, -r.event_id), default=None)
        if tol_s is not None:
            lim = dt.timedelta(seconds=tol_s)
            if b is not None and l.ts - b.ts > lim:
                b = None
            if f is not None and f.ts - l.ts > lim:
                f = None
        if b is not None and (f is None or l.ts - b.ts <= f.ts - l.ts):
            best = b
        else:
            best = f
        out[l.event_id] = best.event_id if best else None
    return out


def test_asof_nearest_matches_naive(spark):
    df = _fixture(spark)
    left = df.filter(F.col("kind") == "l").drop("kind")
    right = df.filter(F.col("kind") == "r").drop("kind")
    got = {
        r.event_id: r.m_event_id
        for r in asof_join(
            left, right, ["user_id"], "ts", "ts",
            payload=["event_id", "ts", "value"], prefix="m_",
            tiebreak=["event_id"], direction="nearest",
        ).collect()
    }
    assert got == _naive_nearest(left.collect(), right.collect())
    # event 6 (t=3, user 2) now matches FORWARD to event 7 (t=8) --
    # exactly the row plain backward as-of leaves null
    assert got[6] == 7


def test_asof_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 1)], "event_id long, ts timestamp, user_id long"
    )
    right = spark.createDataFrame(
        [(90, _ts(5), 1, 1.0), (91, _ts(15), 1, 2.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    rows = asof_join(
        left, right, ["user_id"], "ts", "ts",
        payload=["event_id"], prefix="m_", tiebreak=["event_id"],
        direction="nearest",
    ).collect()
    assert rows[0].m_event_id == 90  # equal 5 s gap both ways -> backward


def test_asof_nearest_strict_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 1), (2, _ts(100), 1)],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [(90, _ts(10), 1, 1.0), (91, _ts(12), 1, 2.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    # strict: the equal-ts right is excluded, forward t=12 wins
    got = asof_join(
        left, right, ["user_id"], "ts", "ts",
        payload=["event_id"], prefix="m_", tiebreak=["event_id"],
        direction="nearest", allow_exact_matches=False,
    ).collect()
    by_id = {r.event_id: r.m_event_id for r in got}
    assert by_id[1] == 91
    # tolerance: the t=100 left is 88 s from its nearest right -> null
    got_tol = asof_join(
        left, right, ["user_id"], "ts", "ts",
        payload=["event_id"], prefix="m_", tiebreak=["event_id"],
        direction="nearest", tolerance_s=30.0,
    ).collect()
    by_id_tol = {r.event_id: r.m_event_id for r in got_tol}
    assert by_id_tol[1] == 90 and by_id_tol[2] is None
    ref = _naive_nearest(left.collect(), right.collect(), tol_s=30.0)
    assert by_id_tol == ref


def test_asof_tolerance_scientific_notation_values(spark):
    """Tolerances whose float repr is scientific notation (1e-05, 2e+16)
    used to die at plan time -- Spark's INTERVAL literal parser rejects
    exponent notation; _interval_s's make_interval form must plan and
    evaluate for any magnitude (r11 ADVICE fix)."""
    left = spark.createDataFrame(
        [(1, _ts(100.0), 1), (2, _ts(200.0), 1)],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [(10, _ts(100.0), 1), (20, _ts(199.999999), 1)],
        "r_id long, ts timestamp, user_id long",
    )
    # 1e-05 s: the exact co-timed match survives, the 1 us-earlier one
    # also survives (1 us <= 10 us); a 0-tolerance check pins the edge
    got = {
        r.event_id: r.m_r_id
        for r in asof_join(
            left, right, ["user_id"], "ts", "ts",
            payload=["r_id"], prefix="m_", tolerance_s=1e-05,
        ).collect()
    }
    assert got == {1: 10, 2: 20}
    # huge tolerance (scientific repr 1e+16): everything in range
    got = {
        r.event_id: r.m_r_id
        for r in asof_join(
            left, right, ["user_id"], "ts", "ts",
            payload=["r_id"], prefix="m_", direction="nearest",
            tolerance_s=1e16,
        ).collect()
    }
    assert got == {1: 10, 2: 20}
