#!/usr/bin/env python
"""ANN recall@10 on a CLUSTERED synthetic corpus (VERDICT r8 ask #5 /
r9 ask #4).

The driver's uniform testdata embeddings suffer distance concentration
(PROFILE_r08 s3): every inter-point distance is nearly equal, so recall
there says little.  This harness builds a deterministic mixture-of-
centroids corpus -- 25 well-separated centroids, per-vector noise an
order of magnitude smaller than the inter-centroid distance -- where
"the true top-10" genuinely means "10 same-cluster members", and
measures recall@10 of every ANN path in the engine against the exact
baseline of its own metric:

  cosine methods (IVF, LSH multi-table)   vs brute_force_topk
  Euclidean-code methods (PQ-ADC, IVF-PQ,
  persisted IVF-PQ index)                 vs exact quantized-L2 top-10

Queries are 20 FRESH vectors (ids >= 10^6, never in the corpus) drawn
around 20 distinct centroids, so no method gets a self-match freebie.

Usage: python tools/recall_bench.py   (idle machine; ~2 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import Window

N_CORPUS = 5_000
N_CLUSTERS = 25
N_QUERIES = 20
K = 10
BASE = "/tmp/recall_bench"


def _component(cluster_expr, j, noise_key):
    """One embedding component: centroid(cluster, j) + small noise.
    Centroid components lie in [-1, 1) on a coarse hash grid; noise is
    +-0.05 -- ~20x smaller than typical inter-centroid distance."""
    cent = (
        F.pmod(F.hash(F.concat(cluster_expr.cast("string"), F.lit(f"_c{j}"))), 2000)
        / 1000.0
        - 1.0
    )
    noise = (
        F.pmod(F.hash(F.concat(noise_key.cast("string"), F.lit(f"_n{j}"))), 201)
        - 100
    ) / 2000.0
    return (cent + noise).cast("float")


def _vec(cluster_expr, noise_key):
    return F.array(*[_component(cluster_expr, j, noise_key) for j in range(64)])


def clustered_corpus(spark):
    ids = spark.range(N_CORPUS)
    cluster = F.col("id") % N_CLUSTERS
    return ids.select(
        F.col("id").alias("vec_id"), _vec(cluster, F.col("id")).alias("embedding")
    )


def clustered_queries(spark):
    ids = spark.range(N_QUERIES)
    cluster = F.col("id") % N_CLUSTERS
    return ids.select(
        (F.col("id") + 1_000_000).alias("vec_id"),
        _vec(cluster, F.col("id") + 7_777_777).alias("embedding"),
    )


def _pairs(df, qcol="query_id", ncol="neighbor_id"):
    return {(r[qcol], r[ncol]) for r in df.collect()}


def _recall(got, truth):
    return len(got & truth) / len(truth)


def exact_l2_topk(queries_q, corpus_q, k=K):
    """Exact quantized-L2 top-k: the truth for the PQ-code methods."""
    d2 = F.aggregate(
        F.zip_with("q", "cq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        queries_q.select(F.col("vec_id").alias("query_id"), "q")
        .crossJoin(
            corpus_q.select(F.col("vec_id").alias("neighbor_id"), F.col("q").alias("cq"))
        )
        .select("query_id", "neighbor_id", d2.alias("d2"))
    )
    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    )


def main() -> None:
    from airflow_pipeline_text_processing_spark.operators.ann_index import (
        build_ivfpq_index,
        ivfpq_index_search,
    )
    from airflow_pipeline_text_processing_spark.operators.clustering import quantized
    from airflow_pipeline_text_processing_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        ivfpq_topk,
        lsh_topk,
        pq_adc_topk,
        pq_train_encode,
    )
    from airflow_pipeline_text_processing_spark.session import get_spark

    spark = get_spark("recall-bench")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = clustered_corpus(spark).localCheckpoint()
    queries = clustered_queries(spark).localCheckpoint()
    corpus_q = corpus.select("vec_id", quantized(F.col("embedding")).alias("q")) \
        .localCheckpoint()
    queries_q = queries.select("vec_id", quantized(F.col("embedding")).alias("q")) \
        .localCheckpoint()

    print(f"corpus={N_CORPUS} clusters={N_CLUSTERS} queries={N_QUERIES} k={K}")
    results = {}

    cos_truth = _pairs(brute_force_topk(queries, corpus, k=K))
    l2_truth = _pairs(exact_l2_topk(queries_q, corpus_q))
    overlap = _recall(cos_truth, l2_truth)
    print(f"truth sets: |cos ^ l2| = {overlap:.2f} (same-cluster regime)")

    t0 = time.perf_counter()
    got = _pairs(ivf_topk(queries, corpus, k=K, num_centroids=16, nprobe=4))
    results["ivf (16 cells, nprobe=4)"] = (_recall(got, cos_truth), time.perf_counter() - t0)

    t0 = time.perf_counter()
    got = _pairs(lsh_topk(queries, corpus, k=K, num_planes=8, num_tables=6))
    results["lsh (8 planes x 6 tables)"] = (_recall(got, cos_truth), time.perf_counter() - t0)

    t0 = time.perf_counter()
    codes, cents = pq_train_encode(corpus_q, dim=64, m=8, k=16, iters=2)
    got = _pairs(pq_adc_topk(queries_q, codes, cents, dim=64, m=8, k=K))
    results["pq-adc (m=8, k_cb=16)"] = (_recall(got, l2_truth), time.perf_counter() - t0)

    # the rerank-depth dial: within-cluster ranking sits below any m=8
    # code's resolution, so recall@10 tracks prefilter vs the ~200-member
    # cluster size (routing recall is 1.0; see ivfpq_topk's docstring)
    # "auto" = prefilter=None -> max(4k, 2 * p90 cell occupancy), the
    # r11 default (similarity.auto_rerank_depth); the fixed dials stay
    # for the recall to show WHY the auto rule picks what it picks
    for pf in (25, 100, 200, None):
        t0 = time.perf_counter()
        got = _pairs(
            ivfpq_topk(queries_q, corpus_q, dim=64, nprobe=4, prefilter=pf, k=K)
        )
        results[f"ivf-pq + rerank (prefilter={pf or 'auto'})"] = (
            _recall(got, l2_truth), time.perf_counter() - t0,
        )

    path = os.path.join(BASE, "index")
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.perf_counter()
    build_ivfpq_index(corpus_q, path, dim=64)
    t_build = time.perf_counter() - t0
    for pf in (25, 200, None):
        t0 = time.perf_counter()
        got = _pairs(
            ivfpq_index_search(
                spark, path, queries_q, corpus_q, nprobe=4, prefilter=pf, k=K
            )
        )
        results[f"persisted index (prefilter={pf or 'auto'})"] = (
            _recall(got, l2_truth), time.perf_counter() - t0,
        )
    print(f"(index build: {t_build:.1f}s, paid once)")

    # recall-after-adds (VERDICT r9 ask #6 tail): quantizers train on a
    # 90% split, the held-out 10% arrives via MERGE-add AFTER the freeze
    # -- the structures never saw those vectors.  Recall vs the same
    # full-corpus truth tells whether incremental ingest degrades search
    # on clustered data, relative to the built-on-everything rows above.
    from airflow_pipeline_text_processing_spark.operators.ann_index import (
        ivfpq_index_add,
    )

    path_adds = os.path.join(BASE, "index_adds")
    shutil.rmtree(path_adds, ignore_errors=True)
    build_ivfpq_index(
        corpus_q.filter(F.col("vec_id") % 10 != 0), path_adds, dim=64
    )
    ivfpq_index_add(
        spark, path_adds, corpus_q.filter(F.col("vec_id") % 10 == 0)
    )
    for pf in (25, 200, None):
        t0 = time.perf_counter()
        got = _pairs(
            ivfpq_index_search(
                spark, path_adds, queries_q, corpus_q,
                nprobe=4, prefilter=pf, k=K,
            )
        )
        results[f"index 90%-built +10% adds (pf={pf or 'auto'})"] = (
            _recall(got, l2_truth), time.perf_counter() - t0,
        )

    # skew-adversarial auto depth (r12, VERDICT r11 ask #5): 90% of the
    # corpus in ONE cluster drives the occupancy p90 toward n, so the
    # uncapped auto rule (max(4k, 2*p90)) degenerates to exact search
    # over the mega-cell -- perfect recall at brute-force cost.  The
    # capped run bounds the shortlist; the recall it gives up is
    # confined to queries whose true neighbors sit INSIDE the mega-cell
    # (where the m-code cannot rank).  Both rows measured against the
    # skewed corpus's own exact-L2 truth.
    skew_cluster = F.when(F.col("id") % 10 != 0, F.lit(0)).otherwise(
        (F.col("id") / 10).cast("long") % (N_CLUSTERS - 1) + 1
    )
    skew_corpus = (
        spark.range(N_CORPUS)
        .select(
            F.col("id").alias("vec_id"),
            _vec(skew_cluster, F.col("id")).alias("embedding"),
        )
        .localCheckpoint()
    )
    skew_corpus_q = skew_corpus.select(
        "vec_id", quantized(F.col("embedding")).alias("q")
    ).localCheckpoint()
    # queries: half aimed at the mega-cluster, half at the tail clusters
    skew_qcluster = F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(
        F.col("id") % (N_CLUSTERS - 1) + 1
    )
    skew_queries_q = (
        spark.range(N_QUERIES)
        .select(
            (F.col("id") + 1_000_000).alias("vec_id"),
            _vec(skew_qcluster, F.col("id") + 7_777_777).alias("embedding"),
        )
        .select("vec_id", quantized(F.col("embedding")).alias("q"))
        .localCheckpoint()
    )
    skew_truth = _pairs(exact_l2_topk(skew_queries_q, skew_corpus_q))
    for cap in (None, 500):
        t0 = time.perf_counter()
        got = _pairs(
            ivfpq_topk(
                skew_queries_q, skew_corpus_q, dim=64, nprobe=4,
                prefilter=None, k=K, auto_depth_cap=cap,
            )
        )
        results[f"SKEW 90%-one-cell (cap={cap or 'off'})"] = (
            _recall(got, skew_truth), time.perf_counter() - t0,
        )

    print(f"\n{'method':38s} {'recall@10':>9s} {'wall':>7s}")
    for name, (rec, wall) in results.items():
        print(f"{name:38s} {rec:9.2f} {wall:6.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
