"""Structured Streaming: ingest dedup, watermarked windows, custom state.

Each test drives a real streaming query with ``availableNow`` triggers
(catch-up-then-stop), the deterministic local twin of the reference's
30-minute cron cadence (SURVEY.md §2 op 45).
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
import pytest

from airflow_pipeline_text_processing_spark.plans.pipeline import PipelineConfig
from airflow_pipeline_text_processing_spark.sources.tracking import TrackingTable
from airflow_pipeline_text_processing_spark.streaming.ingest import streaming_ingest
from airflow_pipeline_text_processing_spark.streaming.windows import (
    stateful_user_totals,
    watermarked_hourly_counts,
)


def _await(query, timeout=120):
    query.awaitTermination(timeout)
    assert not query.isActive


def test_streaming_ingest_dedups_by_content(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    (inp / "a.txt").write_text("hello streaming world", encoding="utf-8")
    (inp / "b.txt").write_text("autre document éàç", encoding="utf-8")
    cfg = PipelineConfig(
        input_dir=str(inp),
        output_dir=str(tmp_path / "out"),
        tracking_path=str(tmp_path / "tracking"),
        dlq_dir=str(tmp_path / "dlq"),
    )
    _await(streaming_ingest(spark, cfg, str(tmp_path / "ckpt1")))
    tracking = TrackingTable(spark, cfg.tracking_path)
    assert tracking.count() == 2
    chunks = spark.read.parquet(f"{cfg.output_dir}/chunks")
    assert chunks.count() >= 2

    # same CONTENT at a new path + genuinely new content: only the new
    # content may process (content-hash dedup, stronger than the file-source
    # checkpoint's path dedup -- SURVEY.md §4)
    (inp / "a_copy.txt").write_text("hello streaming world", encoding="utf-8")
    (inp / "c.txt").write_text("troisième document", encoding="utf-8")
    _await(streaming_ingest(spark, cfg, str(tmp_path / "ckpt2")))
    assert tracking.count() == 3
    hashes = [r.file_hash for r in tracking.current().collect()]
    assert len(set(hashes)) == 3


def test_watermarked_hourly_counts_stream_matches_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(events.dtypes).get("ts") == "bigint":
        events = events.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    src = tmp_path / "events"
    events.coalesce(2).write.parquet(str(src))

    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).parquet(str(src))
    out = watermarked_hourly_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("hourly_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.value_cents)
        for r in spark.sql("SELECT * FROM hourly_counts").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.value_cents)
        for r in watermarked_hourly_counts(
            spark.read.parquet(str(src))
        ).collect()
    }
    # append mode only emits windows the watermark has closed; everything
    # emitted must match the batch answer exactly, and most windows close
    assert got, "stream emitted nothing"
    assert set(got).issubset(set(want))
    for k, v in got.items():
        assert want[k] == v
    assert len(got) >= len(want) * 0.5


def test_checkpoint_recovery_is_exactly_once(spark, tmp_path):
    """Kill-and-resume durability: a stateful streaming query stopped
    mid-input and restarted from its checkpoint must (a) restore state --
    totals over the resumed run include the pre-crash contribution, (b) not
    re-read files the checkpoint already committed, and (c) be a no-op when
    restarted with no new input.  This is the recovery story the memory-sink
    oracle queries can't show."""
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .limit(600)
        .cache()
    )
    part_a = events.filter(F.col("event_id") % 2 == 0)
    part_b = events.filter(F.col("event_id") % 2 == 1)
    src, sink, ckpt = tmp_path / "events", tmp_path / "sink", tmp_path / "ckpt"
    part_a.repartition(3).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema

    def run_until_drained():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )

        def sink_batch(df, _bid):
            df.write.mode("append").parquet(str(sink))

        q = (
            stateful_user_totals(stream)
            .writeStream.foreachBatch(sink_batch)
            .outputMode("update")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        _await(q)

    # run 1: only part A exists; the query drains it and stops (the
    # checkpoint now holds the committed source offsets + per-user state)
    run_until_drained()
    run1 = spark.read.parquet(str(sink)).toPandas()

    # part B lands while the query is down; run 2 resumes from the checkpoint
    part_b.repartition(3).write.mode("append").parquet(str(src))
    run_until_drained()
    run2 = spark.read.parquet(str(sink)).toPandas()

    # (b) the resumed run only processed NEW files: every user it emitted is
    # a part-B user (a re-read of part A would re-emit its users too).
    # Rows appended by run 2 = sink rows not present after run 1; emissions
    # are distinguishable because n_events strictly grows per user.
    users_b = {r.user_id for r in part_b.select("user_id").distinct().collect()}
    assert len(run2) > len(run1)
    run2_only = run2.merge(
        run1, how="outer", indicator=True
    ).query("_merge == 'left_only'")
    assert set(run2_only["user_id"]) <= users_b

    # (a) final state per user equals the batch ground truth over A UNION B:
    # the resumed query restored A's state rather than starting from zero,
    # and nothing was double-counted
    final = run2.loc[run2.groupby("user_id")["n_events"].idxmax()]
    truth = {
        r.user_id: (r.n, r.cents)
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert len(final) == len(truth)
    for _, row in final.iterrows():
        n, cents = truth[row["user_id"]]
        assert int(row["n_events"]) == n
        assert abs(row["total_value"] - cents / 100.0) < 1e-9

    # (c) restart with NO new input: the checkpoint replays nothing
    run_until_drained()
    assert len(spark.read.parquet(str(sink)).toPandas()) == len(run2)


def test_stateful_user_totals_accumulates_across_batches(spark, tmp_path):
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .limit(400)
        .cache()
    )
    if dict(events.dtypes).get("ts") == "bigint":
        events = events.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    src = tmp_path / "events"
    # several files -> several availableNow micro-batches (maxFilesPerTrigger)
    events.repartition(4).write.parquet(str(src))

    stream = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stateful_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    # the LAST emission per user must equal the batch ground truth
    emitted = spark.sql(
        "SELECT user_id, n_events, total_value FROM user_totals"
    ).toPandas()
    final = emitted.groupby("user_id").apply(
        lambda g: g.loc[g["n_events"].idxmax()], include_groups=False
    )
    truth = {
        r.user_id: (r.n, r.cents)
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert len(final) == len(truth)
    for user_id, row in final.iterrows():
        n, cents = truth[user_id]
        assert int(row["n_events"]) == n
        assert abs(row["total_value"] - cents / 100.0) < 1e-9


def test_stateful_totals_on_rocksdb_state_store(spark, tmp_path):
    """The custom stateful operator must run unchanged on the RocksDB
    state store provider -- the disk-backed backend a 100 TB deployment
    uses so streaming state is bounded by disk, not executor heap -- and
    produce the same totals as the batch ground truth."""
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .limit(300)
        .cache()
    )
    src = tmp_path / "events"
    events.repartition(2).write.parquet(str(src))
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(
            spark.read.parquet(str(src)).schema
        ).parquet(str(src))
        q = (
            stateful_user_totals(stream)
            .writeStream.format("memory")
            .queryName("rocksdb_totals")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        _await(q)
        got = {
            r.user_id: r.n_events
            for r in spark.sql("SELECT * FROM rocksdb_totals").collect()
        }
        want = {
            r.user_id: r.n
            for r in events.groupBy("user_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == want
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_stream_stream_left_outer_emits_on_watermark_advance(spark, tmp_path):
    """Watermarked stream-stream LEFT OUTER interval join semantics, shown
    with two real micro-batches: (a) matches emit as found; (b) an
    unmatched left row emits its null-padded outer row only after a LATER
    batch advances the right watermark past its match interval; (c) an
    unmatched left row still inside the final watermark when input ends
    stays unemitted (the documented Structured Streaming contract)."""
    import time as _time

    from airflow_pipeline_text_processing_spark.streaming.windows import (
        interval_join_streams,
    )

    src = tmp_path / "events"

    def mk(rows):
        return spark.createDataFrame(
            rows, "user_id long, ts string, kind string, eid string"
        ).select(
            "user_id",
            F.to_timestamp("ts").alias("ts"),
            "kind",
            "eid",
        )

    # batch 1: one matched view, one match-less view (outer candidate)
    mk([
        (1, "2024-01-01 00:00:00", "view", "V1"),
        (1, "2024-01-01 00:10:00", "click", "C1"),
        (2, "2024-01-01 00:00:00", "view", "V2"),
    ]).coalesce(1).write.mode("append").parquet(str(src))
    _time.sleep(1.1)  # distinct mod-times => deterministic file order
    # batch 2: ten hours later -- advances the watermark far past V2's
    # interval end; V4 has no click and stays inside the final watermark
    mk([
        (3, "2024-01-01 10:00:00", "view", "V3"),
        (3, "2024-01-01 10:05:00", "click", "C3"),
        (4, "2024-01-01 10:00:00", "view", "V4"),
    ]).coalesce(1).write.mode("append").parquet(str(src))

    schema = spark.read.parquet(str(src)).schema

    def stream(kind, ts_name, eid_name):
        s = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        return s.filter(F.col("kind") == kind).select(
            "user_id",
            F.col("ts").alias(ts_name),
            F.col("eid").alias(eid_name),
        )

    joined = interval_join_streams(
        stream("view", "view_ts", "view_id"),
        stream("click", "click_ts", "click_id"),
        "user_id",
        "view_ts",
        "click_ts",
        max_delay="30 minutes",
        watermark="10 minutes",
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        r.view_id: r.click_id for r in spark.table("ssj_outer").collect()
    }
    assert rows.get("V1") == "C1"
    assert rows.get("V3") == "C3"
    # V2's outer row flushed by batch 2's watermark advance
    assert "V2" in rows and rows["V2"] is None
    # V4 is still inside the final watermark: correctly NOT emitted
    assert "V4" not in rows
    # the watermark BOUNDS join state: after the last batch the state
    # store holds only rows still inside the watermark horizon (batch 1's
    # six-row contribution was evicted when batch 2 advanced it) -- this
    # is the property that keeps an unbounded stream's state finite
    state = (q.lastProgress or {}).get("stateOperators") or []
    assert state, "stream-stream join reported no state operator"
    assert state[0]["numRowsTotal"] < 6, state[0]["numRowsTotal"]


def test_stateful_ttl_expires_idle_keys(spark, tmp_path):
    """Processing-time state TTL: a key idle past the TTL gets its
    timeout callback -- the final row arrives flagged expired=True and
    the state is REMOVED (the key's next appearance restarts from zero).
    This is the state-GC mechanism that keeps a custom stateful operator
    bounded under an unbounded key space.  Runs under a continuous
    processing-time trigger (timers need the clock to advance between
    micro-batches; availableNow stops before idle timers fire)."""
    import time as _time

    from airflow_pipeline_text_processing_spark.streaming.windows import (
        stateful_user_totals_with_ttl,
    )

    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"

    def mk(rows):
        return spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, "
            "event_type string, value double",
        ).select(
            "event_id", F.to_timestamp("ts").alias("ts"),
            "user_id", "event_type", "value",
        )

    mk([
        (1, "2024-01-01 00:00:00", 1, "view", 1.0),
        (2, "2024-01-01 00:00:01", 2, "view", 2.5),
    ]).coalesce(1).write.mode("append").parquet(str(src))

    def sink_batch(df, _bid):
        df.write.mode("append").parquet(str(sink))

    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).parquet(str(src))
    q = (
        stateful_user_totals_with_ttl(stream)
        .writeStream.foreachBatch(sink_batch)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        def sink_rows():
            try:
                return spark.read.parquet(str(sink)).collect()
            except Exception:
                return []

        # both users get TTL'd once idle past _TTL_MS
        deadline = _time.time() + 60
        while _time.time() < deadline:
            if len([r for r in sink_rows() if r.expired]) >= 2:
                break
            _time.sleep(0.3)
        expired = {r.user_id: r for r in sink_rows() if r.expired}
        assert set(expired) == {1, 2}
        assert expired[1].n_events == 1 and expired[2].n_events == 1
        assert expired[2].total_value == 2.5

        # user 2 reappears AFTER expiry: state was removed, so the fresh
        # row restarts at n_events=1 (not 2)
        mk([(3, "2024-01-01 00:10:00", 2, "click", 0.5)]).coalesce(
            1
        ).write.mode("append").parquet(str(src))
        deadline = _time.time() + 60
        fresh = []
        while _time.time() < deadline:
            fresh = [
                r for r in sink_rows()
                if r.user_id == 2 and not r.expired
                and r.last_event_type == "click"
            ]
            if fresh:
                break
            _time.sleep(0.3)
        assert fresh and fresh[0].n_events == 1
        assert fresh[0].total_value == 0.5
    finally:
        q.stop()


_tws = __import__(
    "airflow_pipeline_text_processing_spark.streaming.windows",
    fromlist=["HAS_TWS_PROTOBUF", "TWS_GATE_REASON"],
)


@pytest.mark.skipif(
    not _tws.HAS_TWS_PROTOBUF,
    reason=_tws.TWS_GATE_REASON
    or "transformWithStateInPandas needs protobuf",
)
def test_stateful_user_totals_v2_matches_legacy(spark, tmp_path):
    """The transformWithStateInPandas port must emit the same final state
    as the legacy applyInPandasWithState operator and the batch ground
    truth — the contract that lets the registry query pick either API by
    capability."""
    from airflow_pipeline_text_processing_spark.streaming.windows import (
        stateful_user_totals_v2,
    )

    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .limit(300)
        .cache()
    )
    if dict(events.dtypes).get("ts") == "bigint":
        events = events.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    src = tmp_path / "events"
    events.repartition(2).write.parquet(str(src))
    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).parquet(str(src))
    q = (
        stateful_user_totals_v2(stream)
        .writeStream.format("memory")
        .queryName("v2_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM v2_totals").collect()
    }
    want = {
        r.user_id: (r.n, r.cents / 100.0)
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert got == want


def test_tws_capability_gate_is_honest(spark):
    """The registry's stream_stateful_user_totals picks the new API iff
    protobuf is importable; in this container that must be False AND the
    v2 operators must still construct their plans (the gate is a runtime
    protocol dependency, not an import error)."""
    import importlib

    from airflow_pipeline_text_processing_spark.streaming.windows import (
        HAS_TWS_PROTOBUF,
        TWS_GATE_REASON,
        stateful_user_totals_v2,
    )

    # Compare against the SAME import the gate probes (ADVICE r8): a
    # find_spec('google.protobuf') proxy can be True while the generated
    # StateMessage_pb2 still fails on a version-incompatible protobuf,
    # in which case the gate is correctly False and the proxy would make
    # this test fail on the honest answer.
    try:
        importlib.import_module("pyspark.sql.streaming.proto.StateMessage_pb2")
        probe_ok = True
    except ImportError:
        probe_ok = False
    assert HAS_TWS_PROTOBUF == probe_ok
    if not HAS_TWS_PROTOBUF:
        # the gate must name the exact failing import, not a vague proxy
        assert "StateMessage_pb2" in TWS_GATE_REASON
        assert "google" in TWS_GATE_REASON
    events = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "view", 1.0)],
        "event_id long, ts string, user_id long, event_type string, "
        "value double",
    ).select(
        "event_id", F.to_timestamp("ts").alias("ts"), "user_id",
        "event_type", "value",
    )
    df = stateful_user_totals_v2(events.sparkSession.readStream.format(
        "rate"
    ).load().selectExpr(
        "value AS event_id", "timestamp AS ts", "value % 3 AS user_id",
        "'view' AS event_type", "1.0 AS value",
    ))
    assert [f.name for f in df.schema.fields] == [
        "user_id", "n_events", "total_value", "last_event_type",
    ]


def test_stream_psi_drift_equals_batch_scoring(spark, sf_dir):
    """The streamed drift monitor (r11): bucket counts accumulated by
    the complete-mode streaming aggregation and scored by the shared
    PSI epilogue must equal scoring the SAME counts computed as a
    plain batch GROUP BY -- the stream adds plumbing, never values."""
    import pyspark.sql.functions as F

    from airflow_pipeline_text_processing_spark.plans.queries_ext import (
        _PSI_VALUE_BUCKETS,
        stream_psi_drift,
    )
    from airflow_pipeline_text_processing_spark.plans.queries import _t
    from airflow_pipeline_text_processing_spark.plans.queries_scale import (
        _psi_from_counts,
    )

    got = [tuple(r) for r in stream_psi_drift(spark, sf_dir).collect()]

    ev = _t(spark, sf_dir, "events")
    sb = ev.groupBy(
        "event_type",
        F.pmod(
            F.floor(F.col("value") * 100).cast("long"),
            F.lit(_PSI_VALUE_BUCKETS),
        ).alias("b"),
    ).agg(F.count("*").alias("c_sb"))
    want = [
        tuple(r)
        for r in _psi_from_counts(sb, "event_type", count_name="n_events")
        .collect()
    ]
    assert got == want and len(got) > 0
