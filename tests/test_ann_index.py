"""Persisted IVF-PQ index (operators/ann_index.py): the build-once /
incrementally-grow / serve lifecycle.  Oracle equality of the end-to-end
search is covered by ``sim_ivfpq_persisted`` in the registry; these pin
the lifecycle mechanics the oracle can't see -- frozen structures stay
frozen across adds, MERGE locality, staleness accounting, and persisted
search matching the inline (train-inside-the-query) operator when the
training sets coincide.
"""

import json
import os

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def qvecs(spark, sf_dir):
    from airflow_pipeline_text_processing_spark.operators.clustering import (
        quantized,
    )

    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", quantized(F.col("embedding")).alias("q"))
        .localCheckpoint(eager=True)
    )


def _frozen_blobs(path):
    fz = os.path.join(path, "_frozen")
    out = {}
    for name in ("centroids.parquet", "codebooks.parquet"):
        with open(os.path.join(fz, name), "rb") as fh:
            out[name] = fh.read()
    return out


def test_add_does_not_retrain_and_staleness_counts(spark, qvecs, tmp_path):
    from airflow_pipeline_text_processing_spark.operators.ann_index import (
        build_ivfpq_index,
        ivfpq_index_add,
        ivfpq_index_staleness,
    )

    path = str(tmp_path / "idx")
    train = qvecs.filter(F.col("vec_id") % 10 != 0)
    build_ivfpq_index(train, path, dim=64)
    before = _frozen_blobs(path)
    st0 = ivfpq_index_staleness(spark, path)
    assert st0["live_n"] == st0["trained_n"] == train.count()
    assert st0["added_frac_ppm"] == 0

    ivfpq_index_add(spark, path, qvecs.filter(F.col("vec_id") % 10 == 0))
    # frozen quantizers byte-identical after the add: no retraining
    assert _frozen_blobs(path) == before
    st1 = ivfpq_index_staleness(spark, path)
    assert st1["live_n"] == qvecs.count()
    added = st1["live_n"] - st1["trained_n"]
    assert st1["added_frac_ppm"] == added * 1_000_000 // st1["trained_n"]


def test_merge_rewrites_only_overlapping_files(spark, qvecs, tmp_path):
    """A key-local batch (fresh ids past the table's key range) must
    touch at most the boundary file -- the manifest MERGE's O(touched
    files) guarantee is what makes incremental adds affordable."""
    from airflow_pipeline_text_processing_spark.operators.ann_index import (
        build_ivfpq_index,
        ivfpq_index_add,
    )

    path = str(tmp_path / "idx")
    build_ivfpq_index(qvecs, path, dim=64, n_files=8)
    batch = qvecs.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "q"
    )
    rewritten, live_before = ivfpq_index_add(spark, path, batch)
    assert live_before == 8
    assert rewritten <= 1, (
        "appending past the key range must not rewrite interior files"
    )


def test_persisted_search_matches_inline_operator(spark, qvecs, tmp_path):
    """Same training set => the persisted index must serve EXACTLY what
    the inline ivfpq_topk computes (same routing, ADC, rerank, ties)."""
    from airflow_pipeline_text_processing_spark.operators.ann_index import (
        build_ivfpq_index,
        ivfpq_index_search,
    )
    from airflow_pipeline_text_processing_spark.operators.similarity import (
        ivfpq_topk,
    )

    path = str(tmp_path / "idx")
    build_ivfpq_index(qvecs, path, dim=64)
    queries = qvecs.filter(F.col("vec_id").isin(3, 10, 42))
    got = [
        tuple(r)
        for r in ivfpq_index_search(spark, path, queries, qvecs).collect()
    ]
    want = [tuple(r) for r in ivfpq_topk(queries, qvecs, dim=64).collect()]
    assert got == want


def test_meta_records_training_shape(qvecs, tmp_path):
    from airflow_pipeline_text_processing_spark.operators.ann_index import (
        build_ivfpq_index,
    )

    path = str(tmp_path / "idx")
    build_ivfpq_index(qvecs, path, dim=64, m=8, k_codebook=16, cells=8)
    with open(os.path.join(path, "_frozen", "meta.json")) as fh:
        meta = json.load(fh)
    assert meta["dim"] == 64 and meta["m"] == 8
    assert meta["trained_n"] == qvecs.count()


def test_rebuild_if_stale_recovers_fresh_index(spark, qvecs, tmp_path):
    """The staleness loop end-to-end (VERDICT r9 ask #6): train on 60%
    of the corpus, MERGE in the other 40% (staleness 666,666 ppm), and
    let the dial trigger a rebuild.  Deterministic training means the
    rebuilt index must serve BIT-IDENTICAL results to an index freshly
    built on the full corpus -- and below the threshold the dial must
    not fire."""
    from airflow_pipeline_text_processing_spark.operators.ann_index import (
        build_ivfpq_index,
        ivfpq_index_add,
        ivfpq_index_rebuild_if_stale,
        ivfpq_index_search,
        ivfpq_index_staleness,
    )

    path = str(tmp_path / "idx")
    train = qvecs.filter(F.col("vec_id") % 5 > 1)  # 60%
    build_ivfpq_index(train, path, dim=64)
    ivfpq_index_add(spark, path, qvecs.filter(F.col("vec_id") % 5 <= 1))
    st = ivfpq_index_staleness(spark, path)
    assert st["added_frac_ppm"] > 600_000

    # dial below threshold: no rebuild, frozen structures untouched
    assert not ivfpq_index_rebuild_if_stale(
        spark, path, qvecs, threshold_ppm=700_000
    )
    assert ivfpq_index_staleness(spark, path) == st

    # dial crossed: rebuild retrains on the CURRENT corpus in place
    assert ivfpq_index_rebuild_if_stale(
        spark, path, qvecs, threshold_ppm=200_000
    )
    assert ivfpq_index_staleness(spark, path)["added_frac_ppm"] == 0

    fresh = str(tmp_path / "fresh")
    build_ivfpq_index(qvecs, fresh, dim=64)
    assert _frozen_blobs(path) == _frozen_blobs(fresh)

    queries = qvecs.filter(F.col("vec_id").isin(3, 10, 42))
    got = [
        tuple(r)
        for r in ivfpq_index_search(spark, path, queries, qvecs).collect()
    ]
    want = [
        tuple(r)
        for r in ivfpq_index_search(spark, fresh, queries, qvecs).collect()
    ]
    assert got == want


def test_build_raises_on_empty_training_corpus(spark, qvecs, tmp_path):
    from airflow_pipeline_text_processing_spark.operators.ann_index import (
        build_ivfpq_index,
    )

    with pytest.raises(ValueError, match="empty training corpus"):
        build_ivfpq_index(
            qvecs.filter(F.col("vec_id") < 0), str(tmp_path / "idx"), dim=64
        )


def test_streaming_ingest_into_index(spark, qvecs, tmp_path):
    """The index as a STREAMING sink (r10): build on a base corpus,
    then drain a 2-batch vector stream through
    ivfpq_index_stream_add's foreachBatch -> MERGE path.  The streamed
    vectors must be live (staleness counts them) and searchable -- a
    planted near-twin arriving via the stream must come back rank 1
    for its query."""
    import os

    from airflow_pipeline_text_processing_spark.operators.ann_index import (
        build_ivfpq_index,
        ivfpq_index_search,
        ivfpq_index_staleness,
        ivfpq_index_stream_add,
    )

    path = str(tmp_path / "idx")
    build_ivfpq_index(qvecs, path, dim=64)
    n0 = qvecs.count()

    # two parquet batch files: fresh ids, incl. a near-twin of vec 3
    src = str(tmp_path / "stream_src")
    twin = qvecs.filter(F.col("vec_id") == 3).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("q", lambda x: x + F.lit(500)).alias("q"),
    )
    twin.coalesce(1).write.parquet(os.path.join(src, "b0"))
    # batch b1 carries a DUPLICATE key: two conflicting rows for
    # 2_000_007 in one micro-batch -- the sink must collapse to one
    # live row (deterministic max-q winner), not append both
    others = qvecs.filter(F.col("vec_id").isin(7, 9)).select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"), "q"
    )
    dup_loser = qvecs.filter(F.col("vec_id") == 7).select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"),
        F.transform("q", lambda x: x - F.lit(1)).alias("q"),
    )
    others.unionAll(dup_loser).coalesce(1).write.parquet(
        os.path.join(src, "b1")
    )

    stream = (
        spark.readStream.schema("vec_id long, q array<bigint>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = ivfpq_index_stream_add(
        stream, path, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    st = ivfpq_index_staleness(spark, path)
    assert st["live_n"] == n0 + 3 and st["trained_n"] == n0

    base = qvecs.unionAll(twin).unionAll(others)
    queries = qvecs.filter(F.col("vec_id") == 3)
    got = ivfpq_index_search(spark, path, queries, base).collect()
    assert got[0].neighbor_id == 1_000_003  # the streamed twin at rank 1
