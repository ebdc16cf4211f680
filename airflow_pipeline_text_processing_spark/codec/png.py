"""Pure-Python PNG codec: stdlib ``zlib`` + numpy, no external imaging
libraries.

The multimodal operators (operators/multimodal.py) treat media as opaque
binary columns and decode inside Arrow-batched ``mapInPandas`` workers.
Until r11 only uncompressed formats decoded for real (PNM images, PCM
WAV); PNG is a fully-public, fully-specified format (RFC 2083 / the W3C
PNG spec) whose only compression is DEFLATE -- which the stdlib already
ships -- so gating it behind ``NotImplementedError`` was laziness, not a
container limitation.  This module implements the spec subset that
matters for a data pipeline's image payloads:

* 8-bit samples, color types 0 (gray), 2 (RGB), 3 (palette), 4
  (gray+alpha), 6 (RGBA);
* all five scanline filters (None/Sub/Up/Average/Paeth), exact integer
  arithmetic per the spec's unsigned-mod-256 rules;
* BOTH interlace methods (r13): non-interlaced and Adam7 -- each of
  the seven Adam7 passes is an independently-filtered sub-image
  scattered onto the 8x8 pixel grid; empty passes (narrow/short
  images) contribute zero bytes, exactly per spec.

``encode_png`` writes filter-0 scanlines by default (always valid,
deterministic -- what ``resize_images`` re-emits) and forward-filters
a caller-given per-row filter cycle for real (how adaptive encoders
write PNGs); decode(encode(img)) == img bit-exactly for every filter
type, pinned by hypothesis round-trip tests.

Reference parity note: the reference pipeline has no image surface at
all (BASELINE.md); this backs the LLM-pipeline multimodal extension.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (before palette expansion)
_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(payload: bytes):
    """Yield ``(type, data)`` for each chunk; validates CRC32."""
    pos = len(PNG_SIG)
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        # bounds-check BEFORE slicing the CRC: a chunk truncated inside
        # its 4-byte CRC field must raise the documented ValueError, not
        # struct.error from a short unpack (r12, ADVICE)
        if len(payload) < pos + 12 + length:
            raise ValueError("truncated PNG chunk")
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND chunk")


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters.  ``raw`` is the decompressed
    stream: each row is 1 filter-type byte + ``stride`` filtered bytes.
    Returns ``(h, stride)`` uint8.

    Row-sequential by spec (Up/Average/Paeth reference the prior
    RECONSTRUCTED row).  Work shape, honestly stated (r11 review):
    None/Up are whole-row numpy; Sub is a per-residue-class cumsum
    (mod 256 distributes over addition, so the within-row recurrence
    IS a prefix sum -- ``bpp`` numpy ops per row); Average/Paeth are
    inherently left-sequential (floor/branch on the RECONSTRUCTED left
    neighbor cannot be expressed as a scan) and run as per-byte Python
    over plain lists -- the fastest pure-Python form, but still
    O(stride) interpreted steps per such row.  Externally-encoded
    photographic PNGs are mostly Paeth rows; budget accordingly."""
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG data length {len(raw)} != expected {h * (stride + 1)}"
        )
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = int(ftypes[y])
        cur = arr[y, 1:].astype(np.int32)
        if ft == 0:  # None
            rec = cur
        elif ft == 1:  # Sub: per-residue-class prefix sum mod 256
            # int64 accumulator: the pre-mod running sum reaches
            # 255 * stride/bpp, past int32 for rows wider than ~8M px
            rec = cur.astype(np.int64)
            for r in range(bpp):
                np.cumsum(rec[r::bpp], out=rec[r::bpp])
            rec = (rec & 0xFF).astype(np.int32)
        elif ft == 2:  # Up
            rec = (cur + prior) & 0xFF
        elif ft == 3:  # Average (sequential: floor of reconstructed left)
            rl, pl = cur.tolist(), prior.tolist()
            for x in range(bpp):
                rl[x] = (rl[x] + pl[x] // 2) & 0xFF
            for x in range(bpp, stride):
                rl[x] = (rl[x] + (rl[x - bpp] + pl[x]) // 2) & 0xFF
            rec = np.asarray(rl, dtype=np.int32)
        elif ft == 4:  # Paeth (sequential: branch on reconstructed left)
            rl, pl = cur.tolist(), prior.tolist()
            for x in range(bpp):
                rl[x] = (rl[x] + pl[x]) & 0xFF  # a=c=0 -> pred=b
            for x in range(bpp, stride):
                a, b, c = rl[x - bpp], pl[x], pl[x - bpp]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                rl[x] = (rl[x] + pred) & 0xFF
            rec = np.asarray(rl, dtype=np.int32)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prior = rec
    return out


# Adam7 pass grid: (x origin, y origin, x step, y step) per pass.
# Public constants from the PNG spec §8.2 (also RFC 2083 §2.6).
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _deinterlace(raw: bytes, w: int, h: int, nch: int) -> np.ndarray:
    """Reassemble an Adam7 stream: each pass is an independently
    filtered sub-image (its own scanlines, its own prior-row state);
    unfilter each with the SAME engine as the sequential path and
    scatter it onto the (y0::dy, x0::dx) grid.  Returns (h, w, nch)."""
    img = np.zeros((h, w, nch), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue  # empty pass: zero bytes, per spec
        stride = pw * nch
        need = ph * (stride + 1)
        sub = _unfilter(raw[pos : pos + need], ph, stride, bpp=nch)
        img[y0::dy, x0::dx] = sub.reshape(ph, pw, nch)
        pos += need
    if pos != len(raw):
        raise ValueError(
            f"Adam7 data length {len(raw)} != expected {pos}"
        )
    return img


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG payload to an ``(h, w, nch)`` uint8 array.

    nch is 1 (gray), 2 (gray+alpha), 3 (RGB -- including palette
    images, expanded through PLTE), or 4 (RGBA).  Both interlace
    methods decode (Adam7 since r13).  Raises ValueError on malformed
    input, NotImplementedError on spec features outside the supported
    subset (16-bit and sub-byte depths)."""
    if payload[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    ihdr = None
    plte = None
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if w == 0 or h == 0:
        raise ValueError("zero-dimension PNG")
    if comp != 0 or filt != 0:
        raise ValueError("unknown PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} not supported")
    if ctype_n not in _SAMPLES:
        raise ValueError(f"invalid PNG color type {ctype_n}")
    nch = _SAMPLES[ctype_n]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        # keep the documented "ValueError on malformed input" contract:
        # a missing/corrupt IDAT stream is malformed input, not a leak
        # of zlib internals to the caller (r12, ADVICE)
        raise ValueError(f"corrupt PNG IDAT stream: {exc}") from exc
    if interlace == 1:
        img = _deinterlace(raw, w, h, nch)
    else:
        stride = w * nch
        rows = _unfilter(raw, h, stride, bpp=nch)
        img = rows.reshape(h, w, nch)
    if ctype_n == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        if int(img.max()) >= len(plte):
            raise ValueError("palette index out of range")
        img = plte[img[:, :, 0]]
    return img


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _filter_row(cur: list, prior: list, ft: int, bpp: int) -> bytes:
    """FORWARD-filter one scanline per the spec: filtered[x] =
    raw[x] - predictor mod 256 (the encoder side of ``_unfilter``;
    predictors read RAW values, which the encoder has)."""
    stride = len(cur)
    out = bytearray([ft])
    for x in range(stride):
        a = cur[x - bpp] if x >= bpp else 0
        b = prior[x]
        c = prior[x - bpp] if x >= bpp else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) // 2
        elif ft == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out.append((cur[x] - pred) & 0xFF)
    return bytes(out)


def _filtered_rows(rows: np.ndarray, filters, nch: int) -> bytes:
    """Serialize the scanlines of one (sub-)image: filter 0 everywhere
    when ``filters`` is None, else forward-filter with the cycled
    per-row filter types.  Prior-row state starts at zero -- each Adam7
    pass (and the whole sequential image) filters independently."""
    h = rows.shape[0]
    if filters is None:
        return b"".join(b"\x00" + rows[y].tobytes() for y in range(h))
    parts = []
    prior = [0] * rows.shape[1]
    for y in range(h):
        cur = rows[y].tolist()
        parts.append(
            _filter_row(cur, prior, int(filters[y % len(filters)]), nch)
        )
        prior = cur
    return b"".join(parts)


def encode_png(img: np.ndarray, filters=None, interlace: bool = False) -> bytes:
    """Encode an ``(h, w)`` or ``(h, w, nch)`` uint8 array (nch in
    {1, 2, 3, 4}) as an 8-bit PNG.  Deterministic: fixed zlib level 6,
    single IDAT.

    ``filters=None`` writes filter 0 on every scanline (the fast
    always-valid choice -- whole-row numpy, what ``resize_images``
    re-emits).  Pass a per-row sequence of filter types (cycled if
    shorter than the scanline count) to forward-filter scanlines for
    real -- how adaptive encoders write PNGs, and what lets the oracle
    query ``mm_png_roundtrip_stats`` exercise every decoder filter
    branch, not just the trivial one (r11 review).

    ``interlace=True`` writes Adam7 (r13): the seven passes serialize
    in spec order, each independently filtered (the filter cycle
    restarts per pass, matching the decoder's per-pass prior-row
    reset)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    if h == 0 or w == 0:
        raise ValueError("zero-dimension image")
    ctype_n = {1: 0, 2: 4, 3: 2, 4: 6}.get(nch)
    if ctype_n is None:
        raise ValueError(f"unsupported channel count {nch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_n, 0, 0, int(interlace))
    if filters is not None and len(filters) == 0:
        # an empty (non-None) sequence would ZeroDivisionError on the
        # y % len(filters) cycle below; fail with the real diagnosis
        # (r12, ADVICE)
        raise ValueError("filters must be None or a non-empty sequence")
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            ph, pw = sub.shape[0], sub.shape[1]
            if pw == 0 or ph == 0:
                continue
            parts.append(
                _filtered_rows(sub.reshape(ph, pw * nch), filters, nch)
            )
        raw = b"".join(parts)
    else:
        raw = _filtered_rows(img.reshape(h, w * nch), filters, nch)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )
