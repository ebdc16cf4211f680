"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY.md north-star): image/audio/video travel as ``binary``
columns next to a typed metadata struct.  The Spark-side machinery --
schema, partition-parallel Arrow batches, UDF signatures -- is real and
tested; the actual media decoding is STUBBED because no image/audio
libraries exist in this container.  ``decode_media`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake (byte-histogram features, synthetic dimensions) stands
in so the batch shapes and schemas can be exercised end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_KINDS = ("image", "audio", "video")

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo multimodal table from the documents corpus: the UTF-8 bytes act
    as the opaque payload; kind is sniffed deterministically from the first
    byte (stand-in for magic-number sniffing)."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.ascii(F.substring(text_col, 1, 1)) % 3) + 1,
    )
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        kind.alias("kind"),
        F.struct(
            F.octet_length(text_col).cast("long").alias("n_bytes"),
            F.lit("utf-8-demo").alias("codec"),
        ).alias("media_meta"),
    )


def decode_media(payload: bytes, kind: str, fake: bool = False):
    """Decode one media payload.  REAL DECODING IS NOT IMPLEMENTED in this
    environment (no PIL/ffmpeg); ``fake=True`` returns a deterministic
    byte-histogram feature vector so the distributed plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in "
            "this container; pass fake=True for the deterministic stub"
        )
    if payload is None:
        return None
    buckets = [0, 0, 0, 0]
    for byte in payload:
        buckets[byte // 64] += 1
    total = max(len(payload), 1)
    return [b / total for b in buckets]


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", BinaryType()),
        StructField("frame_offset", LongType()),
    ]
)


def sample_frames(
    media: DataFrame, num_frames: int = 4, frame_size: int = 256
) -> DataFrame:
    """1 -> N frame sampling over video payloads (``mapInPandas``).

    REAL FRAME DECODE IS STUBBED (no ffmpeg in this container): a "frame"
    is a deterministic evenly-strided byte slice of the payload.  The
    distributed shape is the real thing -- Arrow-batched row expansion with
    a binary output column, exactly how a video pipeline fans frames out
    for downstream embedding at scale.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, idxs, frames, offsets = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                stride = max(len(payload) // num_frames, 1)
                for i in range(min(num_frames, len(payload))):
                    off = i * stride
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(payload[off : off + frame_size]))
                    offsets.append(off)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_bytes": pd.Series(frames, dtype="object"),
                    "frame_offset": pd.Series(offsets, dtype="int64"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(_sample, FRAME_SCHEMA)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each partition streams batches of (doc_id, payload,
    kind) through Python once -- the exact shape a real image-embedding
    or audio-fingerprint stage would use at scale.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "features": [
                        decode_media(p, k, fake=fake)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )

    return media.select("doc_id", "payload", "kind").mapInPandas(
        _extract, FEATURE_SCHEMA
    )
