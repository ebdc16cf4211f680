"""Partition sizing for un-splittable small scans (shared by the query
registry and the document source so the tuned constants cannot drift --
ADVICE r8 found two diverged inline copies).

The driver's testdata tables are each ONE single-row-group parquet file,
which the parquet reader cannot split, so without intervention every
downstream codec/tokenize/Arrow-UDF stage would serialize onto one core.
The target is bytes-proportional: ~96 KB of parquet per task, floor 4,
cap core count -- measured (3x-solo at sf0.1, PROFILE_r08 §2) to beat
both the 1-partition layout (1.7x on CDC chunking, 2-4x on BPE and
repetition kernels) and the full-core-count split (32-way spread of the
0.6 MB documents corpus LOST 0.3-0.9 s/query to task-scheduling
overhead).  At real scale the scan has >= cores files and this is a
no-op -- no shuffle is ever added on a well-laid-out table.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

SPREAD_BYTES_PER_TASK = 96 * 1024
SPREAD_MIN = 4


def spread_small_scan(
    spark: SparkSession, df: DataFrame, cap: Optional[int] = None
) -> DataFrame:
    """Repartition ``df`` so map-side work parallelizes when its scan has
    fewer input files than cores.  Callers that bound their input far
    below the scan size (e.g. planted corpora that filter to a few
    hundred docs, invisible to the file-size heuristic) pass ``cap``.
    File count/size (driver-side metadata) stand in for partition count:
    ``df.rdd`` would answer it exactly but forces a Python-RDD
    conversion boundary."""
    para = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        # non-file-backed plans (in-memory relations, streaming) have no
        # scan to resize
        return df
    if len(files) >= para:
        return df
    size = 0
    local = True
    for p in files:
        lp = p.removeprefix("file:")
        try:
            size += os.path.getsize(lp)
        except OSError:
            local = False
            break
    if local:
        target = max(SPREAD_MIN, min(para, size // SPREAD_BYTES_PER_TASK + 1))
    else:
        # non-local few-file scan: no cheap size probe; use core count
        target = para
    if cap:
        target = min(target, cap)
    if len(files) < target:
        return df.repartition(int(target))
    return df
