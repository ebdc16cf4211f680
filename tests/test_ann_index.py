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


def test_auto_rerank_depth_rule():
    """The r11 default dial: max(4k, 2 * p90 of cell occupancy).
    Pure-function contract -- empty stats fall back to the legacy 25
    floor (still >= 4k), skewed occupancy tracks the dense cells."""
    from airflow_pipeline_text_processing_spark.operators.similarity import (
        auto_rerank_depth,
    )

    assert auto_rerank_depth([], k=5) == 25
    assert auto_rerank_depth([], k=50) == 200  # 4k floor beats legacy 25
    # 10 cells, p90 = 9th sorted value = 90 -> depth 180
    assert auto_rerank_depth(list(range(10, 101, 10)), k=5) == 180
    # uniform tiny cells: floor wins
    assert auto_rerank_depth([3] * 100, k=5) == 20
    # single cell: p90 = its count
    assert auto_rerank_depth([200], k=5) == 400
    # skew cap (r12, VERDICT r11 ask #5): a mega-cell drives p90 toward
    # n; the cap bounds the shortlist...
    assert auto_rerank_depth([4500, 100, 100], k=5, depth_cap=500) == 500
    # ...but never below the 4k floor...
    assert auto_rerank_depth([4500, 100, 100], k=200, depth_cap=500) == 800
    # ...and is inert when the auto rule is already under it
    assert auto_rerank_depth([3] * 100, k=5, depth_cap=500) == 20
    assert auto_rerank_depth([200], k=5, depth_cap=10_000) == 400


def test_build_records_occupancy_and_add_refreshes_it(spark, qvecs, tmp_path):
    """The meta sidecar carries the per-cell occupancy map summing to
    the corpus size, and an incremental add FOLDS its batch counts in
    (O(batch), not an O(index) rescan -- r11 review); under key churn
    (re-adding an existing key) the map over-counts by design (the
    safe direction for a rerank depth)."""
    import json as _json

    from airflow_pipeline_text_processing_spark.operators.ann_index import (
        build_ivfpq_index,
        ivfpq_index_add,
    )

    path = str(tmp_path / "idx")
    train = qvecs.filter(F.col("vec_id") % 10 != 0)
    build_ivfpq_index(train, path, dim=64, cells=8)

    def _occ():
        with open(os.path.join(path, "_frozen", "meta.json")) as fh:
            return _json.load(fh)["cell_occupancy"]

    occ0 = _occ()
    assert sum(occ0.values()) == train.count()

    # fresh keys: the fold is exact
    ivfpq_index_add(spark, path, qvecs.filter(F.col("vec_id") % 10 == 0))
    occ1 = _occ()
    assert sum(occ1.values()) == qvecs.count(), "add must fold batch counts"

    # key churn: re-adding existing keys may only grow the estimate
    ivfpq_index_add(spark, path, qvecs.filter(F.col("vec_id") < 20))
    occ2 = _occ()
    assert sum(occ2.values()) >= sum(occ1.values())
    assert all(occ2.get(c, 0) >= n for c, n in occ1.items())


def test_auto_prefilter_spans_dense_cells(spark, tmp_path):
    """The r10 footgun, reproduced then fixed: a clustered corpus (4
    clusters x 100 members) where a fixed prefilter=25 cannot span one
    cluster, so recall@10 of the DEFAULT dial was ~0.1.  With the auto
    depth (2 x p90 occupancy ~ 200), every true same-cluster neighbor
    must survive the shortlist -- recall 1.0 against exact quantized-L2
    on the build-time training set."""
    from airflow_pipeline_text_processing_spark.operators.ann_index import (
        build_ivfpq_index,
        ivfpq_index_search,
    )

    # 4 well-separated clusters in quantized space: base corner +-jitter
    base = spark.range(400).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: (
                (F.col("id") % 4) * 100_000
                + F.pmod(F.hash(F.col("id").cast("string"), j.cast("string")), 200)
            ).cast("long"),
        ).alias("q"),
    ).localCheckpoint(eager=True)

    path = str(tmp_path / "idx")
    build_ivfpq_index(base, path, dim=64, cells=8)
    queries = base.filter(F.col("vec_id").isin(0, 1, 2, 3))

    # exact truth: same-metric brute force (quantized L2), k=10
    from airflow_pipeline_text_processing_spark.operators.similarity import (
        _pq_sqdist,
    )
    from pyspark.sql import Window

    scored = (
        queries.select(F.col("vec_id").alias("query_id"), F.col("q").alias("qq"))
        .crossJoin(
            base.select(F.col("vec_id").alias("neighbor_id"), F.col("q").alias("cq"))
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", _pq_sqdist(F.col("qq"), F.col("cq")).alias("d2"))
    )
    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    truth = {
        (r.query_id, r.neighbor_id)
        for r in scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10).collect()
    }

    got_auto = {
        (r.query_id, r.neighbor_id)
        for r in ivfpq_index_search(spark, path, queries, base, k=10).collect()
    }
    got_25 = {
        (r.query_id, r.neighbor_id)
        for r in ivfpq_index_search(
            spark, path, queries, base, prefilter=25, k=10
        ).collect()
    }
    recall_auto = len(got_auto & truth) / len(truth)
    recall_25 = len(got_25 & truth) / len(truth)
    assert recall_auto >= 0.95, f"auto depth recall {recall_auto}"
    assert recall_auto > recall_25, (
        f"auto ({recall_auto}) must beat the fixed-25 footgun ({recall_25})"
    )


def test_auto_depth_accepts_legacy_list_sidecar_and_churn_recounts(
    spark, qvecs, tmp_path
):
    """Second-pass review fixes: (a) a sidecar storing occupancy as the
    earlier sorted-count LIST (no cell ids) must serve auto-depth
    searches and be migrated -- not crash -- by the next add; (b) an
    update-heavy churn (re-adding the same keys repeatedly) must
    trigger the amortized exact recount so the estimate stays within
    2x of the true counts instead of growing without bound."""
    import json as _json

    from airflow_pipeline_text_processing_spark.operators.ann_index import (
        build_ivfpq_index,
        ivfpq_index_add,
        ivfpq_index_search,
    )

    path = str(tmp_path / "idx")
    build_ivfpq_index(qvecs, path, dim=64, cells=8)
    meta_path = os.path.join(path, "_frozen", "meta.json")

    def _meta():
        with open(meta_path) as fh:
            return _json.load(fh)

    # rewrite the sidecar into the legacy list form
    meta = _meta()
    true_counts = sorted(meta["cell_occupancy"].values())
    meta["cell_occupancy"] = true_counts
    meta.pop("occupancy_folded_n", None)
    with open(meta_path, "w") as fh:
        _json.dump(meta, fh)

    # (a) search with the default dial must work off the list form
    queries = qvecs.filter(F.col("vec_id").isin(3, 10))
    assert ivfpq_index_search(spark, path, queries, qvecs).count() > 0

    # the next add migrates the list to an exact {cid: count} map
    batch = qvecs.filter(F.col("vec_id") < 10)
    ivfpq_index_add(spark, path, batch)  # pure churn: keys already live
    meta = _meta()
    assert isinstance(meta["cell_occupancy"], dict)
    assert sum(meta["cell_occupancy"].values()) == qvecs.count()

    # (b) churn loop: fold drift must stay bounded by the recount rule
    n = qvecs.count()
    for _ in range(4):
        ivfpq_index_add(spark, path, qvecs)  # re-add EVERYTHING
    est = sum(_meta()["cell_occupancy"].values())
    assert est <= 2 * n, f"churn estimate {est} exceeds 2x true size {n}"
