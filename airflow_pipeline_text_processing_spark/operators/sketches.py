"""Distinct-count sketches for 100 TB-scale analytics.

``COUNT(DISTINCT x)`` at scale forces a full shuffle of every distinct
value.  Sketches bound the per-group state to ``k`` values and merge
associatively, which is what makes planet-scale distinct counting feasible
(cf. the KMV / theta-sketch family: Bar-Yossef et al. 2002, "Counting
distinct elements in a data stream"; Apache DataSketches).

Spark ships HLL++ (``approx_count_distinct``), but its binary registers are
not reproducible against any other engine, so it can't be oracle-checked.
This module implements the **K-Minimum-Values** estimator from engine-
portable primitives instead: md5 maps values to (effectively) uniform
hashes, the k smallest distinct hashes per group are an order statistic --
identical in any engine -- and the estimator ``(k-1) / h_(k)`` (with the
k-th smallest hash normalized to (0,1)) is one IEEE division on exactly
representable operands, so Spark and DuckDB agree bit-for-bit.

Why the hash truncates to 13 hex digits: 13 nibbles = 52 bits, below
ieee754's 53-bit mantissa, so the integer -> double cast is EXACT and no
engine-specific rounding can creep in.

Shuffle bound (the property that makes this a *sketch* and not a disguised
exact COUNT(DISTINCT)): hashing is a narrow JVM projection; the k-minima
are then reduced *inside each input partition* (``_partition_kmv_minima``,
an Arrow ``mapInPandas`` with O(groups x k) state and no shuffle), so the
one shuffle that follows carries at most ``partitions x groups x k`` rows
-- independent of the number of distinct values.  Min-k is associative and
commutative, so the partition-local sketches merge to exactly the global
k smallest distinct hashes.
"""

from __future__ import annotations

import heapq
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

HEX13_SCALE = float(1 << 52)  # hashes normalize against 16^13 = 2^52

# membership sets may grow past k between prunes; prune back to the k
# minima whenever a group's set exceeds this multiple of k
_PRUNE_FACTOR = 8


def _partition_kmv_minima(
    df: DataFrame, group_col: str, value_col: str, k: int
) -> DataFrame:
    """Phase 1 -- map-side bounded state: per input partition, the (at
    most) ``k`` smallest distinct md5 hashes per group.  Narrow plan: a
    JVM md5 projection then one Arrow ``mapInPandas`` pass; nothing
    shuffles.  Null values are ignored, matching ``COUNT(DISTINCT)``."""
    hashed = df.select(
        F.col(group_col).alias("g"),
        F.md5(F.col(value_col).cast("string")).alias("h"),
    )
    gtype = hashed.schema["g"].dataType.simpleString()

    def topk_per_partition(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        state: dict = {}  # group -> set of candidate minima (<= _PRUNE_FACTOR*k)
        for pdf in batches:
            # drop NULL VALUES only -- a blanket dropna() would also
            # discard rows whose GROUP key is null, silently losing the
            # null group that exact GROUP BY (and the oracle) reports
            # (r14 review).  Null group keys normalize to None so the
            # state dict merges them across batches (NaN != NaN would
            # fragment a numeric null group into per-batch entries).
            pdf = pdf[pdf["h"].notna()].drop_duplicates()
            if pdf["g"].isna().any():
                pdf = pdf.assign(
                    g=pdf["g"].astype(object).where(pdf["g"].notna(), None)
                )
            for g, hs in pdf.groupby("g", sort=False, dropna=False)["h"]:
                cur = state.setdefault(g, set())
                cur.update(hs)
                if len(cur) > _PRUNE_FACTOR * k:
                    state[g] = set(heapq.nsmallest(k, cur))
        rows = [
            (g, h) for g, cur in state.items() for h in heapq.nsmallest(k, cur)
        ]
        yield pd.DataFrame(rows, columns=["g", "h"])

    return hashed.mapInPandas(topk_per_partition, schema=f"g {gtype}, h string")


def _merge_topk(partial: DataFrame, k: int, key_cols=()) -> DataFrame:
    """Merge partition sketches into THE sketch: the k smallest DISTINCT
    hashes, per key when ``key_cols`` is given -- the ONE merge rule
    every KMV estimator reads (r14 review: five inline copies of this
    block could drift apart).  Input is sketch-sized; the unkeyed form's
    global-order window sorts <= partitions x k rows."""
    w = (
        Window.partitionBy(*key_cols) if key_cols else Window.partitionBy()
    ).orderBy("h")
    return (
        partial.distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """Per-group K-Minimum-Values distinct-count estimate.

    Returns ``(group_col, n_in_sketch, kth_hash, kmv_estimate)`` where the
    estimate is exact (= ``n_in_sketch``) whenever a group holds fewer than
    ``k`` distinct values, and ``(k-1) / normalized(h_(k))`` otherwise.

    Plan shape: phase 1 (:func:`_partition_kmv_minima`) bounds map-side
    state at k hashes per (partition, group) with zero shuffle; phase 2
    shuffles only that bounded relation to merge partition sketches --
    dedup + per-group k-minima window + one-row-per-group aggregate.
    Shuffle bytes are O(partitions x groups x k), not O(distinct values),
    which is the 100 TB difference vs exact COUNT(DISTINCT).
    """
    partial = _partition_kmv_minima(df, group_col, value_col, k)
    sk = (
        _merge_topk(partial, k, ["g"])
        .groupBy("g")
        .agg(
            F.count("*").alias("n_in_sketch"),
            F.max("h").alias("kth_hash"),
        )
        .withColumnRenamed("g", group_col)
    )
    # first 13 hex digits -> exact 52-bit integer -> exact double
    kth_int = F.conv(F.substring("kth_hash", 1, 13), 16, 10).cast("long")
    estimate = F.when(
        F.col("n_in_sketch") < k, F.col("n_in_sketch").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(HEX13_SCALE) / kth_int.cast("double")
    )
    return sk.select(
        group_col,
        "n_in_sketch",
        F.substring("kth_hash", 1, 13).alias("kth_hash"),
        estimate.alias("kmv_estimate"),
    )


def sql_kmv_estimate(k: int, kth_hash_expr: str = "kth_hash") -> str:
    """The DuckDB mirror of the estimator arithmetic: digit-wise hex
    decode (pure BIGINT literals, no float intermediates) and the same
    single IEEE division."""
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr({kth_hash_expr}, {i}, 1)) - 1) "
        f"* {16 ** (13 - i)}"
        for i in range(1, 14)
    )
    # bare numeric literals parse as DECIMAL in DuckDB (whose multiply
    # overflows at this magnitude); explicit DOUBLE casts force the same
    # ieee754 arithmetic Spark performs
    return (
        f"CAST({k - 1} AS DOUBLE) * CAST({1 << 52} AS DOUBLE)"
        f" / CAST(({digits}) AS DOUBLE)"
    )


def kmv_overlap(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """Set-operation estimates between two value sets from their KMV
    sketches alone -- distinct |A|, |B|, |A∪B|, Jaccard, and |A∩B| without
    ever shuffling the raw values (Beyer et al. 2007, "On synopses for
    distinct-value estimation under multiset operations").

    The union of two KMV sketches is itself a KMV sketch (k smallest of
    the pooled hashes), giving ``D(A∪B) ~ (k-1)/h_(k)``; the Jaccard
    estimator is the match fraction ``|K ∩ S_A ∩ S_B| / |K|`` over the
    union sketch's k minima, and intersection is their product -- the
    mergeability that makes sketches the 100 TB answer to "how many users
    do these two cohorts share?".  When the pooled sketch holds fewer
    than k hashes BOTH sides are complete, so every output is exact.

    Engine-portable like ``kmv_distinct``: md5 order statistics + one
    IEEE division on 52-bit-exact operands, so a DuckDB oracle matches
    bit-for-bit.  Each side runs the bounded two-phase minima plan; the
    set algebra then touches <= 2k rows.  Output is ONE row:
    ``(n_a_sketch, n_b_sketch, n_union_sketch, union_kth_hash,
    n_common_in_k, est_distinct_union, est_jaccard,
    est_distinct_intersection)``."""
    sa = _merge_topk(
        _partition_kmv_minima(
            a.select(F.lit(0).alias("_g"), value_col), "_g", value_col, k
        ).select("h"),
        k,
    ).select(F.col("h").alias("ha"))
    sb = _merge_topk(
        _partition_kmv_minima(
            b.select(F.lit(0).alias("_g"), value_col), "_g", value_col, k
        ).select("h"),
        k,
    ).select(F.col("h").alias("hb"))
    pooled = _merge_topk(
        sa.select(F.col("ha").alias("h")).unionAll(
            sb.select(F.col("hb").alias("h"))
        ),
        k,
    )
    in_both = (
        pooled.join(sa, pooled.h == sa.ha, "left")
        .join(sb, pooled.h == sb.hb, "left")
        .select(
            "h",
            (F.col("ha").isNotNull() & F.col("hb").isNotNull())
            .cast("long")
            .alias("common"),
        )
    )
    counts = in_both.agg(
        F.count("*").alias("n_union_sketch"),
        F.max(F.substring("h", 1, 13)).alias("union_kth_hash"),
        F.sum("common").alias("n_common_in_k"),
    )
    na = sa.agg(F.count("*").alias("n_a_sketch"))
    nb = sb.agg(F.count("*").alias("n_b_sketch"))
    row = na.crossJoin(nb).crossJoin(counts)  # three 1-row relations
    kth_int = F.conv(F.col("union_kth_hash"), 16, 10).cast("long")
    est_union = F.when(
        F.col("n_union_sketch") < k, F.col("n_union_sketch").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(HEX13_SCALE) / kth_int.cast("double")
    )
    est_jac = F.col("n_common_in_k").cast("double") / F.col(
        "n_union_sketch"
    ).cast("double")
    return row.select(
        "n_a_sketch",
        "n_b_sketch",
        "n_union_sketch",
        "union_kth_hash",
        "n_common_in_k",
        est_union.alias("est_distinct_union"),
        est_jac.alias("est_jaccard"),
        (est_union * est_jac).alias("est_distinct_intersection"),
    )


# ----------------------------------------------------------- count-min


def _cms_bucket(width: int):
    """md5(d || '|' || item) truncated to 52 bits, mod width -- the shared
    portable hash for sketch build and probe (13 hex digits = exact BIGINT,
    same truncation rule as KMV)."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col("d").cast("string"), F.lit("|"), F.col("item"))
                ),
                1, 13,
            ),
            16, 10,
        ).cast("long") % width
    )


def cms_table(
    df: DataFrame,
    group_col: str,
    item_col: str,
    width: int = 64,
    depth: int = 4,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) as a RELATION:
    ``(group, d, bucket, cnt)`` -- ``depth`` rows of ``width`` counters
    per group, bucket = md5(d || item) mod width.

    Like the KMV sketch above, this is built from engine-portable
    primitives (md5 + integer mod) instead of Spark's binary
    ``count_min_sketch`` aggregate, so a DuckDB oracle reproduces every
    counter bit-for-bit.  State per group is ``depth x width`` counters
    regardless of item cardinality -- the property that makes frequency
    estimation feasible where an exact per-item count would shuffle every
    distinct item.  Plan: one narrow explode of ``depth`` hash rows per
    input row, then ONE map-side-combinable groupBy; merging sketches
    across partitions/days is counter addition, which the aggregation
    performs implicitly.
    """
    rows = df.select(
        F.col(group_col).alias("g"),
        F.col(item_col).cast("string").alias("item"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    # build and probe MUST hash identically -- _cms_bucket is the single
    # definition both sides share (a drifted copy would write counters the
    # probe never reads, silently breaking never-undercount)
    bucket = _cms_bucket(width)
    return (
        rows.select("g", "d", bucket.alias("bucket"))
        .groupBy("g", "d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimates(
    cms: DataFrame,
    probes: DataFrame,
    width: int = 64,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates from a ``cms_table`` relation: for each
    ``(g, item)`` probe row, ``est = min over d of cnt[d][bucket(d,item)]``
    (missing buckets read 0).  The classic CMS guarantee -- ``est >=
    true`` always, ``est <= true + eps*N`` with high probability -- is what
    callers should assert; the companion query emits both bounds as
    booleans.  The sketch side is ``groups x depth x width`` rows (fixed,
    tiny) and broadcasts onto the probes.

    ``width``/``depth`` MUST equal the ``cms_table`` call's parameters:
    a larger ``depth`` or different ``width`` probes buckets the sketch
    never wrote, which read 0 and silently BREAK the never-undercount
    guarantee.  The sketch relation cannot carry its parameters (it is a
    plain DataFrame), so this is the caller's contract -- share constants,
    as ``sketch_cms_heavy_hitters`` does with CMS_WIDTH/CMS_DEPTH."""
    p = probes.select(
        F.col("g"), F.col("item").cast("string").alias("item"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    bucket = _cms_bucket(width)
    probed = p.select("g", "item", "d", bucket.alias("bucket"))
    joined = probed.join(F.broadcast(cms), ["g", "d", "bucket"], "left")
    return (
        joined.groupBy("g", "item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def kmv_overlap_matrix(
    df: DataFrame, group_col: str, value_col: str, k: int = 32
) -> DataFrame:
    """Pairwise set-overlap estimates between EVERY pair of groups from
    their KMV sketches -- the S x S contamination/overlap matrix a
    curation pipeline wants across sources, built from ONE pass over the
    data (``kmv_overlap`` generalized from 2 fixed sides to all pairs).

    Phase 1/2 are ``kmv_distinct``'s bounded sketch build (one sketch of
    k hashes per group); the pair algebra then runs entirely on the
    S*k-row sketch relation: for each unordered pair (ga < gb), pool the
    two sketches, keep the k smallest, and read off union size, match
    fraction (Jaccard), and intersection -- Beyer et al.'s multiset
    estimators.  When the pooled sketch holds < k hashes both sides are
    complete and every figure is exact.  Nothing in the pair stage is
    corpus-sized: S^2 pairs x <= 2k rows, a metadata relation at any
    corpus scale.

    Output: one row per (ga, gb) pair, ga < gb:
    ``(ga, gb, n_union_sketch, n_common_in_k, est_distinct_union,
    est_jaccard, est_distinct_intersection)``.
    """
    partial = _partition_kmv_minima(df, group_col, value_col, k)
    sk = _merge_topk(partial, k, ["g"]).select("g", "h")
    sk = sk.localCheckpoint(eager=False)  # reused three times below
    groups = sk.select("g").distinct()
    pairs = (
        groups.select(F.col("g").alias("ga"))
        .crossJoin(groups.select(F.col("g").alias("gb")))
        .filter(F.col("ga") < F.col("gb"))
    )
    pooled = pairs.join(sk, pairs.ga == sk.g).select(
        "ga", "gb", "h"
    ).unionAll(pairs.join(sk, pairs.gb == sk.g).select("ga", "gb", "h"))
    topk = _merge_topk(pooled, k, ["ga", "gb"])
    mark_a = sk.select(
        F.col("g").alias("ga"), "h", F.lit(1).alias("_in_a")
    )
    mark_b = sk.select(
        F.col("g").alias("gb"), "h", F.lit(1).alias("_in_b")
    )
    per_pair = (
        topk.join(mark_a, ["ga", "h"], "left")
        .join(mark_b, ["gb", "h"], "left")
        .groupBy("ga", "gb")
        .agg(
            F.count("*").alias("n_union_sketch"),
            F.max(F.substring("h", 1, 13)).alias("_kth13"),
            F.sum(
                (
                    F.col("_in_a").isNotNull() & F.col("_in_b").isNotNull()
                ).cast("long")
            ).alias("n_common_in_k"),
        )
    )
    kth_int = F.conv(F.col("_kth13"), 16, 10).cast("long")
    est_union = F.when(
        F.col("n_union_sketch") < k, F.col("n_union_sketch").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(HEX13_SCALE) / kth_int.cast("double")
    )
    est_jac = F.col("n_common_in_k").cast("double") / F.col(
        "n_union_sketch"
    ).cast("double")
    return per_pair.select(
        "ga",
        "gb",
        "n_union_sketch",
        "n_common_in_k",
        est_union.alias("est_distinct_union"),
        est_jac.alias("est_jaccard"),
        (est_union * est_jac).alias("est_distinct_intersection"),
    )
