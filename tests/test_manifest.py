"""Manifest-backed parquet tables (sources/manifest.py): file-level
min/max pruning and copy-on-write MERGE.

The properties under test are file-level, which no SQL oracle can see:
a selective read must OPEN fewer files than the table has; a MERGE must
rewrite only the files its keys touch, leaving every other data file
byte-identical on disk (same path, same bytes); and the manifest must
stay consistent through merges (pruned reads still correct after).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from airflow_pipeline_text_processing_spark.sources.manifest import (
    merge_upsert,
    read_manifest,
    read_pruned,
    write_manifest_table,
)


def _table(spark, tmp_path, n=800, files=8):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )
    path = str(tmp_path / "tbl")
    write_manifest_table(df, path, "k", files)
    return path


def test_pruned_read_opens_fewer_files(spark, tmp_path):
    path = _table(spark, tmp_path)
    man = read_manifest(spark, path)
    assert man.count() == 8
    df, files_read, files_total = read_pruned(spark, path, "k", 100, 150)
    assert files_total == 8
    assert files_read <= 2  # range-partitioned: a 51-key slice spans <= 2 files
    got = sorted(r.k for r in df.collect())
    assert got == list(range(100, 151))
    # out-of-range predicate opens nothing
    _, zero, _ = read_pruned(spark, path, "k", 10_000, 20_000)
    assert zero == 0


def test_merge_rewrites_only_touched_files(spark, tmp_path):
    path = _table(spark, tmp_path)
    data_dir = os.path.join(path, "data")
    before = {
        f: os.path.getmtime(os.path.join(data_dir, f))
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    }
    # updates confined to keys [0, 50) plus two brand-new keys
    updates = spark.range(50).select(
        F.col("id").alias("k"), F.lit(-1).alias("v")
    ).unionByName(
        spark.createDataFrame([(10_000, -2), (10_001, -2)], "k long, v long")
    )
    rewritten, total = merge_upsert(spark, path, updates, "k")
    assert total == 8
    assert rewritten == 1  # keys [0,50) live in exactly one range file

    after = {
        f: os.path.getmtime(os.path.join(data_dir, f))
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    }
    untouched = set(before) & set(after)
    assert len(untouched) == 7  # the other seven files survive in place
    for f in untouched:
        assert before[f] == after[f]  # not rewritten, not even touched

    full = spark.read.parquet(data_dir)
    assert full.count() == 800 + 2  # 50 replaced in place, 2 appended
    assert full.filter(F.col("v") == -1).count() == 50
    assert full.filter(F.col("k") >= 10_000).count() == 2
    # no duplicate keys after the merge
    assert full.select("k").distinct().count() == 802


def test_merge_keeps_manifest_consistent_for_pruned_reads(spark, tmp_path):
    path = _table(spark, tmp_path)
    updates = spark.createDataFrame([(700, -5), (10_000, -6)], "k long, v long")
    merge_upsert(spark, path, updates, "k")
    # pruned read over the merged region sees the new values
    df, files_read, files_total = read_pruned(spark, path, "k", 699, 701)
    rows = {r.k: r.v for r in df.collect()}
    assert rows[700] == -5
    assert files_read < files_total
    df2, _, _ = read_pruned(spark, path, "k", 9_999, 10_001)
    assert {r.v for r in df2.collect()} == {-6}
    # second merge with the same batch is idempotent on contents
    merge_upsert(spark, path, updates, "k")
    full = spark.read.parquet(os.path.join(path, "data"))
    assert full.count() == 801
    assert full.filter(F.col("k") == 700).collect()[0].v == -5
