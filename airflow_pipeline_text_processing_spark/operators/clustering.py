"""Fixed-point Lloyd k-means and SemDeDup-style semantic dedup.

Clustering is the scale path for embedding-space curation: SemDeDup
(Abbas et al. 2023) clusters the corpus first so the expensive pairwise
cosine pass runs only WITHIN clusters -- k-means turns an O(n^2)
semantic-dedup problem into k small ones, the same cost shape as the
IVF index in similarity.py.

Everything here is integer fixed-point so a SQL oracle can replay it
bit for bit (the repo's engine-portability conventions):

* components quantize to BIGINT micro-units (``floor(x * 1e6)``);
* squared-L2 distances are exact BIGINT sums (|q| <= ~1.1e6, 64 dims
  -> max ~3e14, far inside int64);
* centroid updates use an explicit floored integer division
  ``(s - pmod(s, n)) / n`` -- Spark's ``div`` truncates toward zero
  while DuckDB's ``//`` floors, so the pmod form is spelled out to make
  both engines compute the identical floor;
* seeding is the k vectors with the smallest ``md5(vec_id)`` (the
  repo's one hash), a deterministic draw with no RNG;
* assignment ties break on the smaller centroid id.

Distributed shape (the 100 TB story): the centroid relation is k rows
and always broadcast; assignment is a narrow vecs x k computation (the
irreducible Lloyd cost); the update is one map-side-combinable
(cid, dim) aggregate.  Iteration count is a fixed small constant, and
each round's centroid relation is checkpointed so lineage stays flat.
"""

from __future__ import annotations

from typing import Tuple

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

QUANT = 1_000_000


def quantized(vec_col: Column) -> Column:
    """array<float> -> array<long> micro-units (exact on both engines:
    float->double widening is value-preserving, *1e6 and floor are
    deterministic IEEE ops)."""
    return F.transform(
        vec_col, lambda x: F.floor(x.cast("double") * QUANT).cast("long")
    )


def unit_quantized(vec_col: Column) -> Column:
    """Normalize to the unit sphere BEFORE quantizing, so Euclidean
    k-means clusters by direction (cosine) and a scaled copy of a
    vector lands in the same cluster as the original.  The norm comes
    from the per-component-floored integer norm2 (order-independent),
    then one double divide per component -- identical everywhere."""
    n2 = F.aggregate(
        F.transform(
            vec_col,
            lambda x: F.floor(
                x.cast("double") * x.cast("double") * QUANT
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    norm = F.sqrt(n2.cast("double") / F.lit(float(QUANT)))
    return F.transform(
        vec_col,
        lambda x: F.floor(x.cast("double") / norm * QUANT).cast("long"),
    )


def _sqdist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def assign_to_centroids(qvecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment of a ``(vec_id, q)`` relation against
    a ``(cid, c)`` centroid relation (ties to the smaller cid).  This is
    the INCREMENTAL path: once a corpus has settled centroids, a new
    ingest batch is assigned by broadcasting the k-row centroid relation
    against the batch alone -- the corpus is never rescanned, the same
    economics as the incremental LSH and span-dedup operators."""
    scored = qvecs.select("vec_id", "q").crossJoin(F.broadcast(cents)).select(
        "vec_id", "q", "cid", _sqdist(F.col("q"), F.col("c")).alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def kmeans_fixed_point(
    qvecs: DataFrame, k: int = 8, iters: int = 3
) -> Tuple[DataFrame, DataFrame]:
    """Lloyd's algorithm over a ``(vec_id, q)`` relation (q already
    quantized).  Runs ``iters`` assign+update rounds, then one final
    assignment against the settled centroids.  Returns
    ``(assignment, centroids)`` where assignment is
    ``vec_id, q, cid, d2`` and centroids is ``cid, c``.

    A cluster that loses all members simply drops out of the next
    round's centroid relation -- both engines compute the identical
    arithmetic, so the oracle drops it too; no RNG re-seeding.
    """
    base = qvecs.select("vec_id", "q").localCheckpoint(eager=False)
    seed_order = [F.md5(F.col("vec_id").cast("string")), F.col("vec_id")]
    # k-row relation: the global row_number window is seed-sized, never data
    cents = (
        base.orderBy(*seed_order)
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy(*seed_order)).alias("cid"),
            F.col("q").alias("c"),
        )
    )

    def assign(cents_df: DataFrame) -> DataFrame:
        return assign_to_centroids(base, cents_df)

    for _ in range(iters):
        assigned = assign(cents)
        sums = (
            assigned.select("cid", F.posexplode("q").alias("dim", "v"))
            .groupBy("cid", "dim")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        )
        cents = (
            sums.select(
                "cid",
                "dim",
                # explicit floor division: Spark div truncates, DuckDB
                # // floors; (s - pmod(s,n)) is exactly divisible
                F.expr("(s - pmod(s, n)) div n").alias("cv"),
            )
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "cv"))),
                    lambda st: st["cv"],
                ).alias("c")
            )
            .localCheckpoint(eager=False)  # k rows; keeps lineage flat
        )
    return assign(cents), cents


def semantic_dedup(
    vecs: DataFrame,
    k: int = 8,
    iters: int = 3,
    tau_micro: int = 950_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (the published form): cluster on the unit sphere, then
    run the pairwise-cosine pass WITHIN each cluster only; a vector is
    a duplicate iff some LOWER-id vector in its cluster reaches
    ``tau_micro`` cosine micro-units (keep-lowest-id, the repo's
    standard deterministic survivor rule).  Output:
    ``vec_id, cid, n_sim_earlier, is_dup``.

    Cost shape: the all-pairs join is confined to a cluster (an equi-
    join on cid, never cartesian over the corpus); with k scaled as
    n / target_cluster_size the per-cluster quadratic stays constant-
    sized -- exactly the economics the clustering exists to buy.
    Integer norms are projected per vector BEFORE the join, so each
    pair costs one dot product.  cos_fp floors to micro-units so the
    threshold compare is exact on every engine.
    """
    q = vecs.select(
        F.col(id_col).alias("vec_id"),
        unit_quantized(F.col(vec_col)).alias("q"),
    )
    assigned, _cents = kmeans_fixed_point(q, k=k, iters=iters)
    n2q = F.aggregate(
        F.transform("q", lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    pn = assigned.select("vec_id", "cid", "q", n2q.alias("n2q"))
    pn = pn.localCheckpoint(eager=False)  # both sides of the pair join
    a, b = pn.alias("a"), pn.alias("b")
    dot = F.aggregate(
        F.zip_with("a.q", "b.q", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    cos_fp = F.floor(
        dot.cast("double")
        / (
            F.sqrt(F.col("a.n2q").cast("double"))
            * F.sqrt(F.col("b.n2q").cast("double"))
        )
        * QUANT
    ).cast("long")
    sim = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos_fp >= F.lit(tau_micro))
        .groupBy(F.col("b.vec_id").alias("vec_id"))
        .agg(F.count("*").alias("n_sim"))
    )
    return pn.join(sim, "vec_id", "left").select(
        "vec_id",
        "cid",
        F.coalesce(F.col("n_sim"), F.lit(0)).cast("long").alias("n_sim_earlier"),
        (F.coalesce(F.col("n_sim"), F.lit(0)) > 0).alias("is_dup"),
    )


def pooled_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    prefilter: int = 50,
    block: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage exact-integer nearest neighbors: a COARSE pass on
    block-sum-pooled vectors (dim/block components) keeps ``prefilter``
    candidates per query; the EXACT squared-L2 rerank runs only on the
    survivors.  The pattern is the product-quantization economics --
    full-dimension distances on a prefiltered sliver instead of the
    whole corpus -- with every distance a BIGINT and every tie broken
    on (d2, id), so results replay identically on any engine.

    Scale shape: the coarse pass is queries x corpus on vectors
    ``block``x narrower (the stage you shard/bucket at 100 TB); the
    expensive full-width distance touches ``prefilter`` rows per query.
    The per-query top-n cuts are partitioned windows, never global.
    """
    def pooled(qcol):
        n_blocks = None  # expression works for any dim divisible by block
        return F.expr(
            f"transform(sequence(0, CAST(size({qcol}) / {block} AS INT) - 1),"
            f" b -> aggregate(slice({qcol}, b * {block} + 1, {block}),"
            f" CAST(0 AS BIGINT), (acc, x) -> acc + x))"
        )

    def prep(df, prefix):
        q = quantized(F.col(vec_col))
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            q.alias(f"{prefix}_q"),
        ).withColumn(f"{prefix}_p", pooled(f"{prefix}_q"))

    qs = prep(queries, "query").localCheckpoint(eager=False)
    cs = prep(corpus, "cand").localCheckpoint(eager=False)
    coarse = (
        qs.crossJoin(cs)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id", "cand_id", "query_q", "cand_q",
            _sqdist(F.col("query_p"), F.col("cand_p")).alias("cd2"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy("cd2", "cand_id")
    survivors = (
        coarse.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= prefilter)
        .drop("_rn", "cd2")
    )
    exact = survivors.select(
        "query_id",
        "cand_id",
        _sqdist(F.col("query_q"), F.col("cand_q")).alias("d2"),
    )
    we = Window.partitionBy("query_id").orderBy("d2", "cand_id")
    return (
        exact.withColumn("_rn", F.row_number().over(we))
        .filter(F.col("_rn") <= k)
        .select("query_id", F.col("cand_id").alias("neighbor_id"), "d2", F.col("_rn").alias("rk"))
    )
