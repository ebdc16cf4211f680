"""UDF registry + expression helpers.

``codec_udfs`` holds the only Python kernels in the engine (Arrow pandas
UDFs around the Goldman/RS codec).  ``text`` is pure built-in-expression
text analytics (JVM-side, no Python in the hot path).
"""

from .codec_udfs import (
    CHUNK_STRUCT,
    dna_encode,
    dna_decode,
    rs_parity,
    rs_repair,
    encode_chunks,
    decode_chunks,
    register_all,
)

__all__ = [
    "CHUNK_STRUCT",
    "dna_encode",
    "dna_decode",
    "rs_parity",
    "rs_repair",
    "encode_chunks",
    "decode_chunks",
    "register_all",
]
