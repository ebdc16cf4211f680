"""Manifest-backed parquet tables: per-file min/max statistics, file
pruning, and copy-on-write MERGE (upsert) on plain parquet.

This is the table-format layer (what Delta/Iceberg provide) rebuilt on
primitives available in this container: a ``_manifest`` parquet sidecar
records, for every data file, its row count and the min/max of the
cluster key.  Reads prune at FILE granularity before Spark ever opens a
footer; MERGE rewrites only the files whose key range overlaps the
update batch, leaving every other file byte-identical -- the property
that makes upserts affordable on a 100 TB table (rewrite O(touched
files), not O(table)).

Honest caveats, by design not omission:
* No transaction log: concurrent writers are NOT coordinated (same
  single-writer assumption as the tracking table in tracking.py).  A
  production deployment would wrap the swap step in a log commit.
* File moves use local-filesystem rename; on an object store the same
  sequence runs through the FileCommitProtocol.
* The driver-side lists are FILE lists (manifest-sized, thousands of
  entries for a 100 TB table), never data -- the same planning-time
  metadata a real table format ships to the coordinator.

The write path range-partitions by the cluster key, so file key ranges
are disjoint and min/max pruning is maximally selective (the
one-dimensional sibling of the Z-order layout in tabular.py).
"""

from __future__ import annotations

import os
import shutil
from typing import List, Optional, Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_DATA = "data"
_MANIFEST = "_manifest"


def _build_manifest(
    spark: SparkSession, path: str, key_col: str, files: Optional[List[str]] = None
) -> DataFrame:
    """Per-file stats by scanning back with ``input_file_name`` -- the
    portable equivalent of collecting footer stats at write time.  Only
    the key column is read (column pruning), so the stats pass is a
    narrow scan."""
    src = (
        spark.read.parquet(*files)
        if files
        else spark.read.parquet(os.path.join(path, _DATA))
    )
    return (
        src.select(
            F.col(key_col).alias("_k"), F.input_file_name().alias("file")
        )
        .groupBy("file")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("_k").alias("k_min"),
            F.max("_k").alias("k_max"),
        )
    )


def write_manifest_table(
    df: DataFrame, path: str, key_col: str, n_files: int
) -> None:
    """(Re)write ``df`` as ``n_files`` range-partitioned parquet files
    under ``path/data`` plus the ``path/_manifest`` stats sidecar."""
    if os.path.exists(path):
        shutil.rmtree(path)
    spark = df.sparkSession
    df.repartitionByRange(n_files, key_col).write.parquet(
        os.path.join(path, _DATA)
    )
    _build_manifest(spark, path, key_col).write.mode("overwrite").parquet(
        os.path.join(path, _MANIFEST)
    )


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, _MANIFEST))


def read_pruned(
    spark: SparkSession,
    path: str,
    key_col: str,
    lo,
    hi,
) -> Tuple[DataFrame, int, int]:
    """Read only the files whose [k_min, k_max] overlaps [lo, hi], with
    the residual row filter applied on top (pruning is file-level).
    Returns ``(df, files_read, files_total)`` so callers -- and tests --
    can see the skipping."""
    man = read_manifest(spark, path).collect()  # file-count-sized
    keep = [r.file for r in man if r.k_max >= lo and r.k_min <= hi]
    total = len(man)
    if not keep:
        empty = spark.read.parquet(os.path.join(path, _DATA)).limit(0)
        return empty, 0, total
    df = spark.read.parquet(*keep).filter(
        (F.col(key_col) >= lo) & (F.col(key_col) <= hi)
    )
    return df, len(keep), total


def merge_upsert(
    spark: SparkSession, path: str, updates: DataFrame, key_col: str
) -> Tuple[int, int]:
    """Copy-on-write MERGE: rows in ``updates`` replace same-key rows;
    new keys append.  Only data files whose key range overlaps the
    update batch are rewritten.  Returns ``(files_rewritten,
    files_total_before)``.

    Plan shape: the hit-file list comes from a broadcast join of the
    update keys against the manifest ranges (metadata-sized); survivors
    are read from ONLY the hit files and anti-joined against the update
    keys (keyed shuffle bounded by touched-file volume, not table
    volume); untouched files are never opened.
    """
    man_rows = read_manifest(spark, path).collect()
    data_dir = os.path.join(path, _DATA)

    upd = updates.localCheckpoint(eager=True)  # stable across the two uses
    bounds = upd.agg(
        F.min(key_col).alias("lo"), F.max(key_col).alias("hi")
    ).collect()[0]
    if bounds.lo is None:
        return 0, len(man_rows)

    man_df = spark.createDataFrame(man_rows)
    hit = (
        man_df.join(
            F.broadcast(upd.select(F.col(key_col).alias("_uk")).distinct()),
            (F.col("_uk") >= F.col("k_min")) & (F.col("_uk") <= F.col("k_max")),
        )
        .select("file")
        .distinct()
        .collect()
    )
    hit_files = [r.file for r in hit]

    new_parts = upd
    if hit_files:
        survivors = spark.read.parquet(*hit_files).join(
            F.broadcast(upd.select(key_col).distinct()), key_col, "left_anti"
        )
        new_parts = survivors.unionByName(upd)

    # merge epoch for deterministic, collision-free new file names
    epoch = 1 + max(
        (
            int(os.path.basename(r.file).split("-")[1])
            for r in man_rows
            if os.path.basename(r.file).startswith("merge-")
        ),
        default=0,
    )
    staging = os.path.join(path, f"_staging_{epoch}")
    new_parts.write.parquet(staging)

    moved = []
    seq = 0
    for name in sorted(os.listdir(staging)):
        if not name.endswith(".parquet"):
            continue
        dst = os.path.join(data_dir, f"merge-{epoch}-{seq:05d}.parquet")
        os.rename(os.path.join(staging, name), dst)
        moved.append(dst)
        seq += 1
    shutil.rmtree(staging)
    for f in hit_files:
        os.remove(f.replace("file://", "") if f.startswith("file:") else f)

    keep_rows = [r for r in man_rows if r.file not in set(hit_files)]
    new_stats = _build_manifest(spark, path, key_col, files=moved).collect()
    man_out = spark.createDataFrame(keep_rows + new_stats)
    # two-phase manifest swap: write beside, then rename over
    tmp_man = os.path.join(path, "_manifest_next")
    man_out.coalesce(1).write.parquet(tmp_man)
    shutil.rmtree(os.path.join(path, _MANIFEST))
    os.rename(tmp_man, os.path.join(path, _MANIFEST))
    return len(hit_files), len(man_rows)
