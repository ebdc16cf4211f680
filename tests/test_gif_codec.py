"""From-scratch GIF/LZW codec (codec/gif.py) and G.711 mu-law
(operators/multimodal.py) -- certified against INDEPENDENT
implementations written in this file from the published specs, never
against the codec's own helpers.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from airflow_pipeline_text_processing_spark.codec.gif import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)
from airflow_pipeline_text_processing_spark.operators.multimodal import (
    mulaw_decode,
    mulaw_encode,
)


# ---------------------------------------------------------------------
# independent LZW decoder: different structure on purpose (int-keyed
# dict of LISTS, a generator-based MSB...-free bit reader written from
# the GIF89a Appendix F description)
# ---------------------------------------------------------------------


def _ref_lzw_decode(data: bytes, mcs: int) -> bytes:
    bits = 0
    acc = 0
    pos = 0
    clear, eoi = 1 << mcs, (1 << mcs) + 1

    def read(width):
        nonlocal bits, acc, pos
        while bits < width:
            if pos >= len(data):
                raise ValueError("ref: truncated")
            acc |= data[pos] << bits
            pos += 1
            bits += 8
        out = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        return out

    def fresh():
        return {i: [i] for i in range(clear)}

    table = fresh()
    width = mcs + 1
    next_code = eoi + 1
    prev = None
    out = []
    while True:
        code = read(width)
        if code == clear:
            table, width, next_code, prev = fresh(), mcs + 1, eoi + 1, None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            seq = table[code]
        elif code in table:
            seq = table[code]
            if next_code < 4096:
                table[next_code] = table[prev] + [seq[0]]
                next_code += 1
        elif code == next_code and next_code < 4096:
            seq = table[prev] + [table[prev][0]]
            table[next_code] = seq
            next_code += 1
        else:
            raise ValueError(f"ref: bad code {code}")
        out.extend(seq)
        prev = code
        # the decoder trails the encoder's dictionary by one entry, so
        # the width grows one entry early (spec Appendix F behavior)
        if next_code >= (1 << width) - 1 and width < 12:
            width += 1


def test_lzw_encoder_read_by_independent_decoder():
    rng = np.random.RandomState(3)
    for mcs in (2, 3, 5, 8):
        for size in (0, 1, 2, 17, 4097, 60000):
            data = bytes(rng.randint(0, 1 << mcs, size).astype(np.uint8))
            enc = lzw_encode(data, mcs)
            assert _ref_lzw_decode(enc, mcs) == data, (mcs, size)
            assert lzw_decode(enc, mcs) == data, (mcs, size)


def test_lzw_kwkwk_and_runs():
    # 'ababab...' forces the code==next_code (KwKwK) branch immediately
    for pattern in (b"\x00\x01" * 4000, b"\x00" * 9000, b"\x02\x02\x01" * 3000):
        enc = lzw_encode(pattern, 2)
        assert _ref_lzw_decode(enc, 2) == pattern
        assert lzw_decode(enc, 2) == pattern


def test_lzw_dictionary_reset_on_noise():
    # 256-symbol noise > 4096 dictionary entries -> CLEAR mid-stream
    rng = np.random.RandomState(11)
    data = bytes(rng.randint(0, 256, 30000).astype(np.uint8))
    enc = lzw_encode(data, 8)
    assert _ref_lzw_decode(enc, 8) == data
    assert lzw_decode(enc, 8) == data


def test_lzw_rejects_garbage():
    with pytest.raises(ValueError):
        lzw_decode(b"\xff\xff\xff\xff", 2)  # out-of-range codes
    with pytest.raises(ValueError):
        lzw_decode(b"", 2)  # truncated before any code
    with pytest.raises(ValueError):
        lzw_encode(b"", 1)  # min code size below the spec floor


# ---------------------------------------------------------------------
# GIF container
# ---------------------------------------------------------------------


def test_gif_container_roundtrip():
    rng = np.random.RandomState(5)
    for n_colors, shape in [(2, (5, 7)), (16, (16, 16)), (256, (48, 32)), (7, (1, 3))]:
        pal = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
        idx = rng.randint(0, n_colors, shape).astype(np.uint8)
        dec = decode_gif(encode_gif(idx, pal))
        assert dec.shape == shape + (3,)
        assert (dec == pal[idx]).all()


def test_gif_skips_extension_blocks():
    pal = np.array([[10, 20, 30], [40, 50, 60]], np.uint8)
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    gif = bytearray(encode_gif(idx, pal))
    # splice a graphic-control extension right before the image block
    img_at = gif.index(0x2C, 13)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = bytes(gif[:img_at]) + gce + bytes(gif[img_at:])
    assert (decode_gif(patched) == pal[idx]).all()


def test_gif_interlaced_decode():
    # hand-build an interlaced frame: rows stored in 4-pass order
    rng = np.random.RandomState(9)
    h, w, n = 13, 6, 8
    pal = rng.randint(0, 256, (n, 3)).astype(np.uint8)
    idx = rng.randint(0, n, (h, w)).astype(np.uint8)
    order = []
    for first, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(first, h, step))
    stored = idx[np.asarray(order)]
    mcs = 3
    data = lzw_encode(stored.tobytes(), mcs)
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HH", w, h)
    out += bytes([0x80 | (7 << 4) | 2, 0, 0])  # GCT of 8 entries
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<4H", 0, 0, w, h)
    out += bytes([0x40])  # interlace flag, no LCT
    out += bytes([mcs])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    assert (decode_gif(bytes(out)) == pal[idx]).all()


def test_gif_malformed_inputs_raise_valueerror():
    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    idx = np.zeros((4, 4), np.uint8)
    gif = encode_gif(idx, pal)
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + gif[6:])
    with pytest.raises(ValueError):
        decode_gif(gif[:10])  # truncated header
    with pytest.raises(ValueError):
        decode_gif(gif[:-10])  # truncated data stream
    with pytest.raises(ValueError):
        decode_gif(gif[:13])  # header only, no frame
    with pytest.raises(ValueError):
        encode_gif(np.zeros((2, 2), np.uint8) + 5, pal)  # index > palette


def test_gif_large_image_with_reset_roundtrips():
    rng = np.random.RandomState(2)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    idx = rng.randint(0, 256, (120, 150)).astype(np.uint8)
    assert (decode_gif(encode_gif(idx, pal)) == pal[idx]).all()


def test_gif_routes_through_image_pixels():
    from airflow_pipeline_text_processing_spark.operators.multimodal import (
        _image_pixels,
    )

    pal = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    idx = np.array([[0, 1, 0]], np.uint8)
    assert (_image_pixels(encode_gif(idx, pal)) == pal[idx]).all()


# ---------------------------------------------------------------------
# G.711 mu-law: independent reference via the published segment table
# ---------------------------------------------------------------------

_SEG_ENDS = [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF]


def _mulaw_encode_ref(x: int) -> int:
    """Sun/G.711 reference shape: segment search over the table."""
    sign = 0x80 if x < 0 else 0
    mag = min(abs(x), 32635) + 0x84
    seg = next(i for i, end in enumerate(_SEG_ENDS) if mag <= end)
    mantissa = (mag >> (seg + 3)) & 0x0F
    return ~(sign | (seg << 4) | mantissa) & 0xFF


def _mulaw_decode_ref(code: int) -> int:
    code = ~code & 0xFF
    seg = (code >> 4) & 0x07
    mantissa = code & 0x0F
    mag = (((mantissa << 3) + 0x84) << seg) - 0x84
    return -mag if code & 0x80 else mag


def test_mulaw_matches_reference_over_full_domain():
    xs = np.arange(-32768, 32768, dtype=np.int64)
    codes = mulaw_encode(xs)
    dec = mulaw_decode(codes)
    # spot the dense center + segment boundaries exhaustively via numpy,
    # and sample every 97th point against the scalar reference
    for x in list(range(-300, 300)) + list(xs[::97]):
        x = int(x)
        c = _mulaw_encode_ref(x)
        assert int(codes[x + 32768]) == c, x
        assert int(dec[x + 32768]) == _mulaw_decode_ref(c), x


def test_mulaw_properties():
    xs = np.arange(-32768, 32768, dtype=np.int64)
    codes = mulaw_encode(xs)
    dec = mulaw_decode(codes).astype(np.int64)
    assert len(np.unique(codes)) == 256  # every code word reachable
    assert int(mulaw_decode(mulaw_encode(np.array([0])))[0]) == 0
    # decode is a fixed point of the codec (re-encoding decoded samples
    # reproduces them exactly)
    assert (mulaw_decode(mulaw_encode(dec)).astype(np.int64) == dec).all()
    # quantization error bounded by the largest segment step
    err = np.abs(dec - np.clip(xs, -32635, 32635))
    assert int(err.max()) <= 1 << 10
    # monotone: decode values ordered by signed magnitude of input
    assert int(dec.min()) == -32124 and int(dec.max()) == 32124
