"""Deterministic, engine-portable sampling.

``df.sample``/``sampleBy`` draw from Spark's per-partition RNG: the result
depends on partitioning and seed plumbing, is not reproducible across
engines, and cannot be oracle-checked.  The operators here hash a stable
key instead -- a row is kept iff ``md5(key)`` falls below a per-stratum
threshold -- which is the standard trick for reproducible holdout/mixture
sampling in training-data pipelines:

* the same row always samples the same way (reruns, backfills, other
  engines agree);
* rates are exact in expectation and independent of partitioning;
* the filter is a pure narrow predicate -- at 100 TB it pushes into the
  scan stage, no shuffle, no state.

Threshold comparison happens lexicographically on the hex digest (hex
chars are ASCII-ordered, so string order == numeric order) -- no 128-bit
arithmetic needed, and DuckDB/Trino/Spark all agree byte for byte.
"""

from __future__ import annotations

from typing import Dict, Mapping

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def rate_threshold(rate: float) -> str:
    """32-hex-char threshold t such that P[md5(key) < t] == rate (for
    uniformly distributed digests).  rate >= 1.0 keeps everything."""
    if rate >= 1.0:
        return "g" * 32  # greater than every hex digest
    if rate <= 0.0:
        return "0" * 32
    scaled = int(rate * (1 << 64))  # 16 hex chars of precision
    return format(scaled, "016x") + "0" * 16


def deterministic_sample(
    df: DataFrame, rate: float, key: Column
) -> DataFrame:
    """Keep ~rate of rows, chosen by hash of ``key`` (reproducible)."""
    return df.filter(F.md5(key.cast("string")) < F.lit(rate_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: Mapping[str, float],
    key: Column,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps ~rates[s] of its
    rows.  Strata missing from ``rates`` keep ``default_rate``."""
    thresh: Column = F.lit(rate_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(stratum_col) == stratum, F.lit(rate_threshold(rate))
        ).otherwise(thresh)
    return df.filter(F.md5(key.cast("string")) < thresh)
