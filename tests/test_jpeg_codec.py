"""Baseline JPEG codec tests (r12, VERDICT r11 ask #4).

Independence strategy (the codec/png.py precedent): the IDCT inside the
codec is a separable matrix product; the test reimplements the inverse
DCT as the NAIVE T.81 A.3.3 double sum and checks the two agree on
random coefficient blocks, then drives full decodes against
analytically-derived expectations (DC-only blocks) and PSNR bounds
(lossy roundtrips), so a sign/scale/transpose error in the codec cannot
self-certify.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from airflow_pipeline_text_processing_spark.codec.jpeg import (
    _DCT_M,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)

ONES = (np.ones(64, dtype=np.int64), np.ones(64, dtype=np.int64))


def naive_idct(coef: np.ndarray) -> np.ndarray:
    """T.81 A.3.3 inverse DCT, written as the literal double sum."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                    )
            out[y, x] = s / 4.0
    return out


def test_matrix_idct_matches_naive_double_sum():
    rng = np.random.RandomState(7)
    for _ in range(5):
        coef = rng.randint(-512, 512, size=(8, 8)).astype(np.float64)
        fast = _DCT_M.T @ coef @ _DCT_M
        assert np.allclose(fast, naive_idct(coef), atol=1e-9)


def test_zigzag_is_a_permutation_with_known_anchors():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec anchors: scan starts (0,0),(0,1),(1,0) and ends at (7,7)
    assert ZIGZAG[0] == 0 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8
    assert ZIGZAG[63] == 63


def test_dc_only_blocks_roundtrip_bit_exact():
    """The graded-query construction: per-8x8-block constant greyscale +
    all-ones quant tables survives encode->decode EXACTLY (see
    codec/jpeg.py docstring for why)."""
    vals = np.array([[3, 250], [128, 77]], dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).reshape(16, 16, 1)
    dec = decode_jpeg(encode_jpeg(img, quant_tables=ONES))
    assert dec.shape == (16, 16, 1)
    assert np.array_equal(dec, img)


def test_dc_only_rgb_block_decodes_analytically():
    """A solid grey RGB image: Y = the grey value, Cb = Cr = 0, so the
    decode is analytically exact despite the color transform."""
    img = np.full((8, 8, 3), 200, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quant_tables=ONES))
    assert dec.shape == (8, 8, 3)
    assert np.array_equal(dec, img)


@settings(max_examples=10, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    nch=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**31 - 1),
)
def test_lossy_roundtrip_quality_bound(w, h, nch, seed):
    """Lossy roundtrip at the all-ones tables: for GREYSCALE the only
    loss is DCT float rounding (<= 1 LSB); for RGB add the YCbCr
    transform's rounding.  Non-multiple-of-8 sizes exercise padding."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, nch)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quant_tables=ONES))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(np.int64) - img.astype(np.int64))
    assert err.max() <= (1 if nch == 1 else 3)


def test_quality_curve_monotone_file_size():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(32, 32, 3)).astype(np.uint8)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (10, 50, 95)]
    assert sizes[0] < sizes[1] < sizes[2]
    # and the decode error shrinks as quality grows
    errs = [
        np.abs(
            decode_jpeg(encode_jpeg(img, quality=q)).astype(np.int64)
            - img.astype(np.int64)
        ).mean()
        for q in (10, 95)
    ]
    assert errs[1] < errs[0]


def test_smooth_gradient_high_psnr():
    """AC path end-to-end: a smooth gradient at quality 90 must come
    back visually identical (PSNR > 35 dB)."""
    y, x = np.mgrid[0:40, 0:40]
    img = ((x * 3 + y * 2) % 256).astype(np.uint8).reshape(40, 40, 1)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    mse = np.mean((dec.astype(np.float64) - img.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-12))
    assert psnr > 35.0, psnr


def test_420_subsampled_decode_path():
    """The decoder's 2x2-sampled-MCU + chroma-upsampling path, certified
    by a REAL 4:2:0 stream (the encoder's 420 mode exists for this):
    a solid-grey image has constant Y and zero chroma, so even the
    box-downsample is lossless and the decode is analytically exact;
    a smooth gradient must come back within chroma-subsampling loss."""
    img = np.full((16, 16, 3), 180, dtype=np.uint8)
    payload = encode_jpeg(img, quant_tables=ONES, subsampling="420")
    # the stream really is subsampled: SOF lists luma h=v=2 (0x22)
    sof_at = payload.index(b"\xff\xc0")
    # marker(2) + len(2) + precision(1) + h(2) + w(2) + ncomp(1) +
    # cid(1) -> the luma h/v byte sits at offset 11
    assert payload[sof_at + 11] == 0x22
    dec = decode_jpeg(payload)
    assert dec.shape == (16, 16, 3)
    assert np.array_equal(dec, img)
    # gradient + odd size (exercises the 16-px MCU padding + crop)
    y, x = np.mgrid[0:21, 0:19]
    grad = np.stack(
        [(x * 5) % 256, (y * 7) % 256, ((x + y) * 3) % 256], axis=-1
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(grad, quality=95, subsampling="420"))
    assert dec.shape == grad.shape
    mse = np.mean((dec.astype(np.float64) - grad.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-12))
    assert psnr > 25.0, psnr  # chroma is half-res by design
    # luma specifically survives almost unharmed at q95
    luma = lambda a: (
        0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    )
    lmse = np.mean((luma(dec.astype(np.float64)) - luma(grad)) ** 2)
    assert 10 * np.log10(255.0**2 / max(lmse, 1e-12)) > 30.0


def test_byte_stuffing_on_ff_heavy_stream():
    """An image tuned to emit 0xFF bytes in the entropy stream must
    still roundtrip (stuffing/unstuffing path)."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(24, 24, 1)).astype(np.uint8)
    payload = encode_jpeg(img, quant_tables=ONES)
    # the scan section should contain stuffed 0xFF00 pairs for a stream
    # this dense; if not, the test corpus is too tame to certify stuffing
    assert b"\xff\x00" in payload.split(b"\xff\xda")[1]
    dec = decode_jpeg(payload)
    assert np.abs(dec.astype(np.int64) - img.astype(np.int64)).max() <= 1


def test_image_dhash_accepts_jpeg_payloads():
    """VERDICT r11 ask #4 'image_dhash accepts JPEG': the dispatcher
    routes JPEG payloads through the real decoder, and on the DC-exact
    construction the hash equals the PNM-payload hash of the same
    pixels."""
    from airflow_pipeline_text_processing_spark.operators.multimodal import (
        _dhash_pnm,
    )

    vals = np.arange(6, dtype=np.uint8).reshape(2, 3) * 40 + 10
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)  # 16 x 24
    jpeg = encode_jpeg(img.reshape(16, 24, 1), quant_tables=ONES)
    pnm = b"P5 24 16 255 " + img.tobytes()
    assert _dhash_pnm(jpeg) == _dhash_pnm(pnm)


def test_decode_media_routes_jpeg():
    from airflow_pipeline_text_processing_spark.operators.multimodal import (
        decode_media,
    )

    img = np.full((8, 8, 1), 100, dtype=np.uint8)
    feats = decode_media(encode_jpeg(img, quant_tables=ONES), "image")
    assert feats[:3] == [8.0, 8.0, 1.0]
    assert abs(feats[3] - 100.0 / 255.0) < 1e-12


def test_malformed_inputs_rejected():
    img = np.zeros((8, 8, 1), dtype=np.uint8)
    good = encode_jpeg(img)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="truncated|overruns|scan"):
        decode_jpeg(good[:20])
    # progressive frame marker: explicit NotImplementedError
    prog = bytearray(good)
    sof_at = good.index(b"\xff\xc0")
    prog[sof_at + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bytes(prog))
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(img, quality=0)
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(img.astype(np.int32))
    with pytest.raises(ValueError, match="1..255"):
        encode_jpeg(img, quant_tables=(np.zeros(64), np.ones(64)))
