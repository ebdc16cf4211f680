"""Arrow-vectorized pandas UDFs around the codec kernels.

These are the engine's only Python kernels (SURVEY.md §2 ops 23, 32-42);
everything else is built-in Catalyst expressions.  Two design rules for
100 TB scale:

* **Fused hot path.**  ``encode_chunks`` chunk-splits, RS-protects,
  checksums and Goldman-encodes a document in ONE Arrow round trip,
  returning the full chunk-struct array.  The alternative (explode, then
  one UDF per field) would cross the Python boundary four times per chunk.
  ``decode_chunks`` reconstructs a whole document the same way, which lets
  the round-trip pipeline run with ZERO shuffles (chunks never leave their
  document's row until the caller explicitly asks for a chunk table).
* **Fine-grained UDFs stay available** (``dna_encode`` etc.) and are SQL
  registered, because chunk-level relational work (validation filters,
  per-chunk sinks) composes better from small pieces.

Reference parity: chunk fields and formats match
``/root/reference/plugins/utils/dna_encoding.py:270-335`` (see codec/).
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..codec import chunker, goldman, reed_solomon

CHUNK_FIELDS = [
    StructField("chunk_id", StringType()),
    StructField("index", IntegerType()),
    StructField("dna_sequence", StringType()),
    StructField("original_length_bytes", IntegerType()),
    StructField("error_correction_code", BinaryType()),
    StructField("checksum", StringType()),
    StructField("chunk_size", IntegerType()),
]
CHUNK_STRUCT = StructType(CHUNK_FIELDS)


@pandas_udf(StringType())
def dna_encode(data: pd.Series) -> pd.Series:
    """binary -> Goldman DNA string (ops 32+36+38)."""
    return data.map(lambda b: goldman.bytes_to_dna(b) if b is not None else None)


@pandas_udf(BinaryType())
def dna_decode(seq: pd.Series, target_len: pd.Series) -> pd.Series:
    """DNA string + original byte length -> binary (ops 33+37+39)."""
    return pd.Series(
        [
            goldman.dna_to_bytes(s, int(n)) if s is not None else None
            for s, n in zip(seq, target_len)
        ]
    )


@pandas_udf(BinaryType())
def rs_parity(data: pd.Series) -> pd.Series:
    """binary -> Reed-Solomon tail, reference-compatible (op 41)."""
    return data.map(
        lambda b: reed_solomon.rs_parity_tail(b, chunker.DEFAULT_RS_NSYM)
        if b is not None
        else None
    )


@pandas_udf(BinaryType())
def rs_encode_stream(data: pd.Series) -> pd.Series:
    """binary -> full systematic RS stream (payload + interleaved parity).

    Unlike :func:`rs_parity` (the reference's stored artifact,
    ``/root/reference/plugins/utils/dna_encoding.py:232-248``), this keeps
    payload and parity together so the stream is self-repairing -- the form
    :func:`rs_repair` consumes (op 42)."""
    return data.map(
        lambda b: reed_solomon.rs_encode(b, chunker.DEFAULT_RS_NSYM)
        if b is not None
        else None
    )


@pandas_udf(BinaryType())
def corrupt_bytes(data: pd.Series, seed: pd.Series) -> pd.Series:
    """Deterministically flip 3 distinct bytes (XOR 0x5A) at seed-derived
    positions -- the error-injection harness for the repair path.  With
    nsym=10 RS corrects up to 5 errors per 255-byte codeword, so 3 flips
    are always recoverable regardless of how they fall across blocks."""

    def _corrupt(b: Optional[bytes], s) -> Optional[bytes]:
        if b is None:
            return None
        buf = bytearray(b)
        n = len(buf)
        if n == 0:
            return b
        k = min(3, n)
        p0 = int(s) % n
        for j in range(k):
            buf[(p0 + j * (n // k)) % n] ^= 0x5A
        return bytes(buf)

    return pd.Series([_corrupt(b, s) for b, s in zip(data, seed)])


@pandas_udf(BinaryType())
def rs_repair(encoded: pd.Series) -> pd.Series:
    """Correct a full rs_encode stream; None when uncorrectable (op 42)."""
    def _repair(b: Optional[bytes]) -> Optional[bytes]:
        if b is None:
            return None
        try:
            return reed_solomon.rs_decode(b, chunker.DEFAULT_RS_NSYM)
        except reed_solomon.RSError:
            return None

    return encoded.map(_repair)


def make_encode_chunks(chunk_size: int = chunker.DEFAULT_CHUNK_SIZE,
                       nsym: int = chunker.DEFAULT_RS_NSYM):
    """Build the fused text -> array<chunk struct> UDF for a given config."""

    @pandas_udf(ArrayType(CHUNK_STRUCT))
    def _encode_chunks(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in batches:
            yield pd.Series(
                [
                    None
                    if t is None
                    else [
                        (
                            r["chunk_id"],
                            r["index"],
                            r["dna_sequence"],
                            r["original_length_bytes"],
                            r["error_correction_code"],
                            r["checksum"],
                            r["chunk_size"],
                        )
                        for r in chunker.build_chunks(t, chunk_size, nsym)
                    ]
                    for t in texts
                ]
            )

    return _encode_chunks


encode_chunks = make_encode_chunks()


@pandas_udf(StringType())
def decode_chunks(chunks: pd.Series) -> pd.Series:
    """array<chunk struct> -> reconstructed document text.

    Order-sensitive reassembly (SURVEY.md op 21): sort by index, decode each
    chunk to bytes at its original width, concatenate bytes, decode UTF-8.
    Returns None when any chunk fails checksum or UTF-8 validation, which
    the pipeline routes to the DLQ.
    """

    def _rebuild(arr) -> Optional[str]:
        if arr is None:
            return None
        try:
            ordered = sorted(arr, key=lambda c: c["index"])
            pieces = []
            for c in ordered:
                raw = goldman.dna_to_bytes(
                    c["dna_sequence"], int(c["original_length_bytes"])
                )
                if hashlib.md5(raw).hexdigest() != c["checksum"]:
                    return None
                pieces.append(raw)
            return b"".join(pieces).decode("utf-8")
        except Exception:
            return None

    return pd.Series([_rebuild(a) for a in chunks])


def make_chunk_text_udtf():
    """The UTF-8-safe byte chunker as a real Python UDTF (SURVEY.md op 23
    is "UDTF-shaped": 1 text row -> N chunk rows).  SQL usage:

        SELECT d.doc_id, c.* FROM docs d,
        LATERAL chunk_text(d.text, 40) c

    Emits the text piece per chunk (not the DNA -- that is what
    ``encode_chunks`` fuses); useful for any byte-budget splitting, not
    just the codec path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id string, index int, chunk_text string, n_bytes int")
    class ChunkText:
        def eval(self, text: Optional[str], chunk_size: int):
            if text is None:
                return
            for i, piece in enumerate(chunker.chunk_utf8_bytes(text, chunk_size)):
                yield (f"dna_chunk_{i:03d}", i, piece.decode("utf-8"), len(piece))

    return ChunkText


def register_all(spark: SparkSession) -> None:
    """Register every codec UDF (and the chunker UDTF) for SQL use."""
    spark.udf.register("dna_encode", dna_encode)
    spark.udf.register("dna_decode", dna_decode)
    spark.udf.register("rs_parity", rs_parity)
    spark.udf.register("rs_encode_stream", rs_encode_stream)
    spark.udf.register("rs_repair", rs_repair)
    spark.udf.register("encode_chunks", encode_chunks)
    spark.udf.register("decode_chunks", decode_chunks)
    try:
        spark.udtf.register("chunk_text", make_chunk_text_udtf())
    except Exception:
        pass  # pyspark < 3.5: UDTFs unavailable; the pandas-UDF path covers it
