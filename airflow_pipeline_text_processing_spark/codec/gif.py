"""Pure-Python GIF codec: from-scratch LZW + numpy, no imaging libraries.

The multimodal operators (operators/multimodal.py) decode image payloads
inside Arrow-batched ``mapInPandas`` workers; r11 de-gated PNG (stdlib
DEFLATE) and r12 baseline JPEG (from-scratch Huffman+IDCT).  GIF is the
third fully-public format real corpora carry in volume, and its only
compression is the variable-code-width LZW scheme the GIF89a spec
defines completely -- so this module implements it from scratch:

* ``decode_gif``: GIF87a/GIF89a, global and local color tables,
  extension-block skipping (GCE/comment/application), the full LZW
  decompressor (code widths 3..12, CLEAR/EOI, the KwKwK case, deferred
  clear with a full dictionary), interlaced row order (the 4-pass
  scheme), first frame of an animation;
* ``encode_gif``: single-frame GIF89a with a caller palette and REAL
  LZW compression -- dictionary growth synchronized with the decoder's
  width schedule and a CLEAR-code reset when the table reaches 4096.

``decode_gif(encode_gif(indices, palette))`` equals
``palette[indices]`` bit-exactly (pinned by round-trip tests against an
independently-written decoder in tests/test_gif_codec.py).

Reference parity note: the reference pipeline has no image surface at
all (BASELINE.md); this backs the LLM-pipeline multimodal extension.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGS = (b"GIF87a", b"GIF89a")

_MAX_CODE_WIDTH = 12
_TABLE_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096

# interlaced GIFs store rows in 4 passes: (first row, step) per pass
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


class _BitReader:
    """LSB-first bit reader over the concatenated image sub-blocks."""

    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0  # bit position

    def read(self, width: int) -> int:
        end = self._pos + width
        if end > len(self._data) * 8:
            raise ValueError("truncated GIF LZW stream")
        out = 0
        got = 0
        pos = self._pos
        while got < width:
            byte = self._data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, width - got)
            out |= ((byte >> (pos & 7)) & ((1 << take) - 1)) << got
            got += take
            pos += take
        self._pos = pos
        return out


class _BitWriter:
    """LSB-first bit writer (the encoder mirror of ``_BitReader``)."""

    def __init__(self):
        self._acc = 0
        self._nbits = 0
        self._out = bytearray()

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._nbits
        self._nbits += width
        while self._nbits >= 8:
            self._out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def finish(self) -> bytes:
        if self._nbits:
            self._out.append(self._acc & 0xFF)
        return bytes(self._out)


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW decompression of the concatenated sub-block
    bytes.  Returns the palette-index byte string.  Raises
    ``ValueError`` on any malformed stream (out-of-range code, stream
    ending before EOI with no pixels, truncation mid-code)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"GIF min code size {min_code_size} out of range")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    reader = _BitReader(data)
    table = list(base)
    width = min_code_size + 1
    prev: int | None = None
    out = bytearray()
    while True:
        code = reader.read(width)
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code after clear not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < _TABLE_LIMIT:  # deferred clear: stop growing
                table.append(table[prev] + entry[:1])
        elif code == len(table) and len(table) < _TABLE_LIMIT:
            entry = table[prev] + table[prev][:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW: code {code} out of range")
        out += entry
        prev = code
        # the decoder's table lags the encoder's by exactly one entry
        # (the encoder assigns a code at every emission, the decoder
        # only from the second code after a clear), so the width bump
        # fires one entry EARLY to read the next code at the width the
        # encoder wrote it
        if len(table) >= (1 << width) - 1 and width < _MAX_CODE_WIDTH:
            width += 1
    return bytes(out)


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW compression of a palette-index byte string.
    Emits CLEAR up front, resets the dictionary at 4096 entries, and
    grows the code width on the same schedule ``lzw_decode`` expects
    (width bumps when the table size reaches ``1 << width``)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"GIF min code size {min_code_size} out of range")
    clear = 1 << min_code_size
    eoi = clear + 1
    writer = _BitWriter()
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    writer.write(clear, width)
    cur = b""
    for b in indices:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        writer.write(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        # decoder bumps width when its table size hits 1 << width; its
        # table size after consuming the code just written == next_code
        if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        cur = nxt[-1:]
        if next_code == _TABLE_LIMIT:
            writer.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            width = min_code_size + 1
            next_code = eoi + 1
    if cur:
        writer.write(table[cur], width)
    writer.write(eoi, width)
    return writer.finish()


def _read_sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``pos``; returns
    ``(data, position after the 0x00 terminator)``."""
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-blocks")
        size = payload[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        if pos + size > len(payload):
            raise ValueError("truncated GIF sub-block")
        out += payload[pos : pos + size]
        pos += size


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Reorder stored interlaced rows into display order."""
    h = rows.shape[0]
    order = []
    for first, step in _INTERLACE_PASSES:
        order.extend(range(first, h, step))
    out = np.empty_like(rows)
    out[np.asarray(order, dtype=np.int64)] = rows
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first frame of a GIF payload to an ``(h, w, 3)``
    uint8 RGB array.  Raises ``ValueError`` on malformed input."""
    if payload[:6] not in GIF_SIGS:
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(payload):
            raise ValueError("truncated GIF global color table")
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte + sub-blocks
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            pos += 1
            _, pos = _read_sub_blocks(payload, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        _left, _top, w, h = struct.unpack("<4H", payload[pos : pos + 8])
        ipacked = payload[pos + 8]
        pos += 9
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(payload):
                raise ValueError("truncated GIF local color table")
            palette = np.frombuffer(
                payload[pos : pos + 3 * n], np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF frame has no color table")
        if pos >= len(payload):
            raise ValueError("truncated GIF image data")
        mcs = payload[pos]
        pos += 1
        data, pos = _read_sub_blocks(payload, pos)
        idx = np.frombuffer(lzw_decode(data, mcs), np.uint8)
        if idx.size != w * h:
            raise ValueError(
                f"GIF pixel count {idx.size} != {w}x{h}"
            )
        if idx.size and int(idx.max()) >= palette.shape[0]:
            raise ValueError("GIF palette index out of range")
        rows = idx.reshape(h, w)
        if ipacked & 0x40:
            rows = _deinterlace(rows)
        return palette[rows]
    raise ValueError("GIF contains no image frame")


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode a single-frame GIF89a from an ``(h, w)`` uint8 index
    array and an ``(n, 3)`` uint8 palette (n <= 256).  The palette is
    zero-padded to the next power of two; pixels are LZW-compressed for
    real and chopped into <= 255-byte sub-blocks."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2:
        raise ValueError("indices must be (h, w)")
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
        raise ValueError("palette must be (n, 3) with 1 <= n <= 256")
    if idx.size and int(idx.max()) >= pal.shape[0]:
        raise ValueError("palette index out of range")
    h, w = idx.shape
    # stored table size is 2^(k+1); min code size floors at 2 per spec
    k = max(1, int(pal.shape[0] - 1).bit_length() - 1)
    n_entries = 2 << k
    mcs = max(2, k + 1)
    padded = np.zeros((n_entries, 3), np.uint8)
    padded[: pal.shape[0]] = pal
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (7 << 4) | k, 0, 0])  # GCT flag, bg, aspect
    out += padded.tobytes()
    out += b"\x2c" + struct.pack("<4H", 0, 0, w, h) + b"\x00"
    out += bytes([mcs])
    data = lzw_encode(idx.tobytes(), mcs)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
