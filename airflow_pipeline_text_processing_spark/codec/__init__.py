"""Pure-Python computational kernels (no Spark imports).

These are the only non-declarative pieces of the engine; everything else is
built-in Spark expressions.  They are wrapped as Arrow pandas UDFs in
``..functions.codec_udfs``.
"""

from .goldman import (
    bytes_to_trits,
    trits_to_bytes,
    trits_to_dna,
    dna_to_trits,
    bytes_to_dna,
    dna_to_bytes,
    has_homopolymer,
)
from .reed_solomon import rs_encode, rs_parity_tail, rs_decode, RSError
from .chunker import chunk_utf8_bytes, build_chunks

__all__ = [
    "bytes_to_trits",
    "trits_to_bytes",
    "trits_to_dna",
    "dna_to_trits",
    "bytes_to_dna",
    "dna_to_bytes",
    "has_homopolymer",
    "rs_encode",
    "rs_parity_tail",
    "rs_decode",
    "RSError",
    "chunk_utf8_bytes",
    "build_chunks",
]
