"""End-to-end pipeline tests: encode/validate/reassemble, tracking
idempotency, DLQ routing -- the reference's runtime self-verification
(SURVEY.md §5) as a test suite."""

import hashlib
import os

import pyspark.sql.functions as F
import pytest

from airflow_pipeline_text_processing_spark.plans.pipeline import (
    PipelineConfig,
    chunk_table,
    encode_documents,
    reassemble_from_chunk_table,
    run_pipeline,
    validate_chunk_table,
)
from airflow_pipeline_text_processing_spark.sources.text_dir import with_descriptor
from airflow_pipeline_text_processing_spark.sources.tracking import TrackingTable

TEXTS = [
    "hello world",
    "Test encodage.",
    "éàçùñ déjà vu " * 120,          # multi-chunk, multibyte
    "",                                # empty document
    "x" * 999 + "é" + "y" * 50,       # code point straddling the boundary
]


def _docs(spark, texts=TEXTS):
    df = spark.createDataFrame(
        [(f"file:///in/doc_{i}.txt", t) for i, t in enumerate(texts)],
        "path string, text string",
    )
    return with_descriptor(df)


def test_encode_roundtrip_and_status(spark):
    encoded = encode_documents(_docs(spark))
    rows = encoded.select("text", "reconstructed_text", "status").collect()
    assert len(rows) == len(TEXTS)
    for r in rows:
        assert r.reconstructed_text == r.text
        assert r.status == "completed"


def test_chunk_table_and_declarative_reassembly(spark):
    encoded = encode_documents(_docs(spark))
    chunks = chunk_table(encoded)
    validated = validate_chunk_table(chunks)
    assert validated.filter(~F.col("valid")).count() == 0
    # homopolymer-free invariant, in pure SQL (SURVEY.md op 40)
    assert chunks.filter(F.regexp_like("dna_sequence", F.lit(r"(.)\1"))).count() == 0
    # dense indices
    bad_idx = (
        chunks.groupBy("file_hash")
        .agg(F.count("*").alias("n"), F.max("index").alias("mx"))
        .filter(F.col("mx") != F.col("n") - 1)
    )
    assert bad_idx.count() == 0
    # shuffle-safe ordered reassembly equals the original text
    rebuilt = reassemble_from_chunk_table(chunks)
    joined = rebuilt.join(_docs(spark), "file_hash").filter(F.col("text") != "")
    assert joined.filter(F.col("reconstructed_text") != F.col("text")).count() == 0


def test_corrupted_chunk_fails_document(spark):
    encoded = encode_documents(_docs(spark, ["good text here"]))
    corrupted = encoded.withColumn(
        "chunks",
        F.transform(
            "chunks",
            # appending a base multiplies the decoded bignum by 3 -- a real
            # value corruption (prepending T's would only add leading zeros)
            lambda c: c.withField("dna_sequence", F.concat(c["dna_sequence"], F.lit("A"))),
        ),
    ).drop("reconstructed_text", "reconstructed_checksum", "status")
    from airflow_pipeline_text_processing_spark.functions.codec_udfs import decode_chunks

    res = corrupted.withColumn("rebuilt", decode_chunks("chunks")).collect()
    assert res[0].rebuilt is None


def test_repair_recovers_corrupted_chunks(spark):
    """Opt-in RS repair (op 42): corrupt <= nsym/2 bytes of a chunk's
    payload, re-encode to DNA so the stored checksum/parity no longer match
    the raw decode, then verify validate_chunk_table(repair=True) corrects
    the payload back to the original bytes."""
    from airflow_pipeline_text_processing_spark.codec import goldman
    from airflow_pipeline_text_processing_spark.codec.chunker import DEFAULT_RS_NSYM

    texts = ["the quick brown fox jumps over the lazy dog", "second doc body"]
    chunks = chunk_table(encode_documents(_docs(spark, texts))).collect()

    corrupted_rows = []
    for r in chunks:
        raw = goldman.dna_to_bytes(r.dna_sequence, r.original_length_bytes)
        bad = bytearray(raw)
        for pos in (1, 5, 9)[: max(1, DEFAULT_RS_NSYM // 2 - 2)]:
            bad[pos % len(bad)] ^= 0xFF
        d = r.asDict()
        d["dna_sequence"] = goldman.bytes_to_dna(bytes(bad))
        corrupted_rows.append(d)
    corrupted = spark.createDataFrame(corrupted_rows, chunk_table(
        encode_documents(_docs(spark, texts))).schema)

    plain = validate_chunk_table(corrupted)
    assert plain.filter(F.col("valid")).count() == 0  # corruption detected

    fixed = validate_chunk_table(corrupted, repair=True)
    rows = fixed.collect()
    assert all(r.valid and r.repaired_ok for r in rows)
    # repaired payloads reassemble to the original documents byte-exact
    rebuilt = {
        r.file_hash: hashlib.md5(r.data_bytes).hexdigest() for r in rows
    }
    for r in rows:
        assert rebuilt[r.file_hash] == r.checksum

    # beyond-capacity corruption stays invalid (no false repair)
    hopeless_rows = []
    for r in chunks:
        raw = goldman.dna_to_bytes(r.dna_sequence, r.original_length_bytes)
        bad = bytearray(raw)
        for pos in range(min(len(bad), DEFAULT_RS_NSYM)):  # > nsym/2 errors
            bad[pos] ^= 0xA5
        d = r.asDict()
        d["dna_sequence"] = goldman.bytes_to_dna(bytes(bad))
        hopeless_rows.append(d)
    hopeless = spark.createDataFrame(hopeless_rows, corrupted.schema)
    assert (
        validate_chunk_table(hopeless, repair=True).filter(F.col("valid")).count()
        == 0
    )


def test_run_pipeline_idempotent(spark, tmp_path):
    in_dir = tmp_path / "input"
    in_dir.mkdir()
    for i, t in enumerate(["alpha bravo", "charlie delta", "écho foxtrot"]):
        (in_dir / f"f{i}.txt").write_text(t, encoding="utf-8")
    (in_dir / "ignored.csv").write_text("not,text")

    cfg = PipelineConfig(
        input_dir=str(in_dir),
        output_dir=str(tmp_path / "out"),
        tracking_path=str(tmp_path / "tracking"),
        dlq_dir=str(tmp_path / "dlq"),
    )
    r1 = run_pipeline(spark, cfg)
    assert r1 == {"processed": 3, "failed": 0, "skipped": 0, "status": "success"}

    tracking = TrackingTable(spark, cfg.tracking_path)
    assert tracking.count() == 3

    # second run: all content already processed -> no new work, table stable
    r2 = run_pipeline(spark, cfg)
    assert r2["processed"] == 0 and r2["failed"] == 0 and r2["skipped"] == 3
    assert tracking.count() == 3

    # same content at a NEW path is still skipped (content-hash semantics,
    # SURVEY.md §4 -- stronger than path-based checkpointing)
    (in_dir / "copy_of_f0.txt").write_text("alpha bravo", encoding="utf-8")
    r3 = run_pipeline(spark, cfg)
    assert r3["processed"] == 0 and tracking.count() == 3

    # genuinely new content is processed
    (in_dir / "new.txt").write_text("golf hotel", encoding="utf-8")
    r4 = run_pipeline(spark, cfg)
    assert r4["processed"] == 1 and tracking.count() == 4

    # outputs exist and round-trip
    out = spark.read.json(str(tmp_path / "out" / "processed"))
    assert out.count() == 4
    reports = spark.read.json(str(tmp_path / "out" / "reports"))
    assert reports.filter(F.col("status") != "completed").count() == 0
    chunks = spark.read.parquet(str(tmp_path / "out" / "chunks"))
    assert chunks.count() >= 4


def test_bootstrap_sample_only_when_empty(tmp_path):
    from airflow_pipeline_text_processing_spark.sources.text_dir import (
        bootstrap_sample,
    )

    made = bootstrap_sample(str(tmp_path / "inp"))
    assert made is not None and made.endswith("sample_input.txt")
    assert bootstrap_sample(str(tmp_path / "inp")) is None  # idempotent


def test_tracking_status_update(spark, tmp_path):
    t = TrackingTable(spark, str(tmp_path / "track"))
    recs = spark.createDataFrame(
        [("h1", "/a", 10), ("h2", "/b", 20)], "file_hash string, file_path string, file_size long"
    ).select(
        "*",
        F.current_timestamp().alias("processed_at"),
        F.lit("processing").alias("status"),
        F.lit(None).cast("string").alias("output_file"),
        F.lit(None).cast("string").alias("error_message"),
        F.current_timestamp().alias("created_at"),
    )
    t.append_new(recs)
    # conflicting re-insert is a no-op (ON CONFLICT DO NOTHING)
    t.append_new(recs.withColumn("status", F.lit("pending")))
    assert t.count() == 2
    assert t.current().filter(F.col("status") == "processing").count() == 2

    t.update_status(spark.createDataFrame([("h1",)], "file_hash string"), "completed")
    cur = {r.file_hash: r.status for r in t.current().collect()}
    assert cur == {"h1": "completed", "h2": "processing"}

    with pytest.raises(ValueError):
        t.update_status(spark.createDataFrame([("h1",)], "file_hash string"), "bogus")

    t.compact()
    assert t.count() == 2
    assert {r.file_hash: r.status for r in t.current().collect()} == cur


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/data/input"), reason="reference absent"
)
def test_jdbc_tracking_roundtrip(spark, tmp_path):
    """Op-4 JDBC parity path (ref init-scripts.sql:5-14, dags/dag.py:446):
    real spark.read/write.jdbc round trip against embedded Derby (the JDBC
    engine Spark ships), including ON-CONFLICT-DO-NOTHING idempotency."""
    url = f"jdbc:derby:{tmp_path}/trackdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    tt = TrackingTable(spark, str(tmp_path / "unused_parquet"))

    recs = spark.createDataFrame(
        [
            ("h1", "/in/a.txt", 11, "completed", "/out/a.txt"),
            ("h2", "/in/b.txt", 22, "completed", "/out/b.txt"),
        ],
        "file_hash string, file_path string, file_size long, "
        "status string, output_file string",
    ).select(
        "*",
        F.current_timestamp().alias("processed_at"),
        F.lit(None).cast("string").alias("error_message"),
        F.current_timestamp().alias("created_at"),
    )
    tt.write_jdbc(recs, url, properties=props)
    back = tt.read_jdbc(url, properties=props)
    assert back.count() == 2
    assert set(r.FILE_HASH if hasattr(r, "FILE_HASH") else r.file_hash
               for r in back.select("file_hash").collect()) == {"h1", "h2"}

    # idempotent append: re-writing the same keys inserts nothing
    tt.write_jdbc(recs, url, properties=props)
    assert tt.read_jdbc(url, properties=props).count() == 2

    # partitioned parallel read over a numeric column
    ranged = tt.read_jdbc(
        url, properties=props, partition_column="file_size", num_partitions=2
    )
    assert ranged.count() == 2
    assert ranged.rdd.getNumPartitions() == 2


def test_golden_reference_corpus(spark, tmp_path):
    cfg = PipelineConfig(
        input_dir="/root/reference/data/input",
        output_dir=str(tmp_path / "out"),
        tracking_path=str(tmp_path / "tracking"),
        dlq_dir=str(tmp_path / "dlq"),
    )
    res = run_pipeline(spark, cfg)
    assert res["processed"] == 4 and res["failed"] == 0
    out = spark.read.json(str(tmp_path / "out" / "processed")).collect()
    for row in out:
        golden = os.path.join("/root/reference/data/input", row.filename)
        with open(golden, encoding="utf-8") as f:
            assert row.text == f.read()


def test_sql_registered_udf_surface(spark):
    """register_all makes the whole codec surface SQL-callable (SURVEY §2
    UDF/UDAF/UDTF row): scalar UDFs compose in SQL, and the chunker runs as
    a real LATERAL UDTF with correct byte budgets and reassembly."""
    from airflow_pipeline_text_processing_spark.functions.codec_udfs import (
        register_all,
    )

    register_all(spark)
    spark.createDataFrame(
        [(1, "héllo wörld, " * 7), (2, "plain ascii text")],
        "doc_id long, text string",
    ).createOrReplaceTempView("sql_docs")

    # scalar UDFs compose: encode -> decode round trip in pure SQL
    rt = spark.sql(
        """
        SELECT doc_id,
               decode(dna_decode(dna_encode(encode(text, 'utf-8')),
                                 octet_length(text)), 'utf-8') AS back,
               text
        FROM sql_docs
        """
    ).collect()
    assert all(r.back == r.text for r in rt)

    # UDTF: LATERAL 1->N chunking, UTF-8-safe at a tiny byte budget
    rows = spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.index, c.chunk_text, c.n_bytes
        FROM sql_docs d, LATERAL chunk_text(d.text, 20) c
        """
    ).collect()
    assert all(r.n_bytes <= 20 for r in rows)
    assert all(len(r.chunk_text.encode()) == r.n_bytes for r in rows)
    by_doc = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r["index"])):
        by_doc.setdefault(r.doc_id, []).append(r.chunk_text)
    originals = {r.doc_id: r.text for r in spark.table("sql_docs").collect()}
    assert {d: "".join(ps) for d, ps in by_doc.items()} == originals
