#!/usr/bin/env python
"""10x scale check for the heaviest registry queries.

Synthesizes table directories at 1x and 10x the sf0.1 row counts with the
same deterministic generators, runs the SAME registry query functions on
both, and prints wall seconds plus the 10x/1x ratio.  The point is the
empirical check behind every "amortizes at scale" plan-shape claim: a
scale-safe query's wall must grow at most ~linearly in its input (ratio
<< quadratic's 100x; job-overhead-dominated queries sit well below 10x).

Usage: python tools/scale_bench.py  (idle machine; ~3 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

BASE = "/tmp/scale_bench"
SF01 = "/root/testdata/sf0.1"

# sf0.1 row counts the ratios are anchored to
N_DOCS = 5_000
N_VECS = 5_000

def _curate_full_all_docs(spark, sf_dir):
    """curation_full_set's registry form runs on a PLANTED 320-doc
    corpus by design (oracle determinism), so for the scale check the
    composition is driven directly over the WHOLE synthetic documents
    table, with a 40-doc eval set."""
    from airflow_pipeline_text_processing_spark.plans.curation import (
        curate_full,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    eval_docs = docs.filter(F.col("doc_id") < 40)
    return curate_full(docs, eval_docs)


def _sorted_neighborhood_all_docs(spark, sf_dir):
    """dedup_sorted_neighborhood's registry form runs on a 240-doc
    planted corpus by design (oracle determinism); the scale check
    drives the operator over the WHOLE synthetic documents table."""
    from airflow_pipeline_text_processing_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return sorted_neighborhood_pairs(docs, window=8, max_hamming=6)


def _semantic_scaled_k(spark, sf_dir):
    """SemDeDup at its DOCUMENTED operating point: k grows with the
    corpus so per-cluster size (and so each task's pairwise block) stays
    constant -- the fixed-k registry row above it shows what happens
    when you hold k and let clusters grow quadratically instead."""
    from airflow_pipeline_text_processing_spark.operators.clustering import (
        semantic_dedup,
    )

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    k = max(8, vecs.count() // 625)
    return semantic_dedup(vecs.select("vec_id", "embedding"), k=k)


QUERIES = [
    ("dedup_semantic_clusters", None),
    ("semantic_dedup[k~n]", _semantic_scaled_k),
    ("dedup_cdc_chunks", None),
    ("dedup_cdc_rolling", None),
    ("sim_lsh_multitable", None),
    ("curation_full[all-docs]", _curate_full_all_docs),
    ("stream_stream_join_pairs", None),
    ("text_topics_kmeans", None),
    ("sorted_neighborhood[all-docs]", _sorted_neighborhood_all_docs),
    ("sim_pq_adc_topk", None),
    ("sim_ivfpq_topk", None),
]


def synth_documents(spark, n):
    """Pseudo-text corpus: 60 words per doc from a 9973-word vocab, a
    fixed boilerplate sentence planted in every 20th doc (real work for
    the span-excision stage), every 37th doc an exact copy of its
    neighbor (real work for exact dedup)."""
    def words(idcol, lo, hi):
        # hash-mixed word ids: an arithmetic progression here makes every
        # 3-gram in the corpus share its +step shape, which the
        # decontamination stage then matches everywhere (measured: output
        # collapses to 0 rows) -- a generator artifact, not pipeline work
        return F.array_join(
            F.transform(
                F.sequence(F.lit(lo), F.lit(hi)),
                lambda j: F.concat(
                    F.lit("w"),
                    F.pmod(
                        F.hash(F.concat(idcol.cast("string"), F.lit("_"),
                                        j.cast("string"))),
                        F.lit(9973),
                    ).cast("string"),
                ),
            ),
            " ",
        )

    boiler = F.lit(
        "subscribe to our newsletter for updates terms of service apply "
        "all rights reserved"
    )
    eff = F.when(F.col("id") % 37 == 0, F.col("id") + 1).otherwise(F.col("id"))
    body = F.when(
        F.col("id") % 20 == 5,
        F.concat(words(eff, 0, 29), F.lit(" "), boiler, F.lit(" "),
                 words(eff, 30, 59)),
    ).otherwise(words(eff, 0, 59))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        body.alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias("source"),
        F.length(body).cast("long").alias("n_chars"),
    )


def synth_embeddings(spark, n):
    """Deterministic 64-dim float vectors in [-1, 1)."""
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: (((F.col("id") * 131 + j * 7919) % 1000) / 500.0 - 1.0)
        .cast("float"),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        vec.alias("embedding"),
        (F.col("id") % 10).cast("int").alias("label"),
    )


def scaled_events(spark, mult):
    """The real sf0.1 events table replicated ``mult``x with disjoint
    event_id/user_id ranges: same time density, mult-x users and rows,
    so watermark state scales linearly with input."""
    ev = spark.read.parquet(f"{SF01}/events.parquet")
    parts = [
        ev.select(
            (F.col("event_id") + F.lit(k * 10_000_000)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(k * 1_000_000)).alias("user_id"),
            "event_type", "value", "props",
        )
        for k in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def build_dir(spark, tag, mult):
    d = os.path.join(BASE, tag)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    synth_documents(spark, N_DOCS * mult).repartition(max(4, 4 * mult)) \
        .write.parquet(os.path.join(d, "documents.parquet"))
    synth_embeddings(spark, N_VECS * mult).repartition(max(4, 4 * mult)) \
        .write.parquet(os.path.join(d, "embeddings.parquet"))
    # events must be a single FILE named events.parquet: the streaming
    # source (_events_stream) symlinks it into its watch directory, the
    # same layout the driver's testdata uses
    staging = os.path.join(d, "_events_staging")
    scaled_events(spark, mult).coalesce(1).write.parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    os.rename(os.path.join(staging, part), os.path.join(d, "events.parquet"))
    shutil.rmtree(staging)
    return d


def main() -> None:
    from __spark_entry__ import REGISTRY
    from airflow_pipeline_text_processing_spark.session import get_spark

    spark = get_spark("scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    d1 = build_dir(spark, "x1", 1)
    d10 = build_dir(spark, "x10", 10)

    print(f"{'query':34s} {'x1':>7s} {'x10':>8s} {'ratio':>6s}")
    for name, override in QUERIES:
        fn = override if override is not None else REGISTRY[name][0]
        fn(spark, d1).count()  # warm plans/codegen on the small input
        walls = {}
        for tag, d in (("x1", d1), ("x10", d10)):
            t0 = time.perf_counter()
            fn(spark, d).count()
            walls[tag] = time.perf_counter() - t0
        print(
            f"{name:34s} {walls['x1']:6.2f}s {walls['x10']:7.2f}s "
            f"{walls['x10'] / walls['x1']:5.1f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
