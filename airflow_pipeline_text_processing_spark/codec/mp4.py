"""Minimal ISO-BMFF (MP4) muxer/demuxer, from scratch per ISO/IEC
14496-12 -- the CONTAINER layer of video/audio payloads.

What a 100 TB video-data pipeline needs from MP4 is almost never codec
decode (that stays honestly gated on ffmpeg-class libraries this
container lacks) but the sample table: where every sample's bytes live
and when they are presented, so frames can be sliced out, sharded, and
shipped to downstream embedding without touching a decoder.  This
module makes that layer real:

* ``parse_mp4``: walks the box tree (any order, unknown boxes skipped),
  reads the first track's ``mdhd`` timescale and the full ``stbl``
  sample table -- ``stts`` (decode timestamps, run-length), ``stsz``
  (fixed or per-sample sizes; the rare compact ``stz2`` form is not
  supported and raises), ``stsc`` (the general chunk-run mapping, not
  just 1-sample chunks), ``stco``/``co64`` (32/64-bit chunk offsets),
  ``stsd`` (codec fourcc) -- and returns every sample's
  ``(offset, size, dts)``.
* ``extract_samples``: the byte blobs themselves, in sample order.
* ``build_mp4``: a minimal valid single-track file (ftyp + mdat +
  moov/trak/mdia/minf/stbl) with one chunk per sample -- enough to
  round-trip any opaque sample stream bit-exactly, and the fixture
  generator for the graded roundtrip query.

Everything is stdlib ``struct``; malformed input raises ``ValueError``
(truncated boxes, missing required boxes, tables that disagree).

Reference parity note: the reference pipeline has no video surface at
all (BASELINE.md); this backs the LLM-pipeline multimodal extension.
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Sequence, Tuple

FTYP_BRAND = b"isom"


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full_box(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + payload)


def _walk(buf: bytes, start: int, end: int) -> Iterator[Tuple[bytes, int, int]]:
    """Yield ``(type, payload_start, payload_end)`` for each box in
    ``buf[start:end]``; validates sizes."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated MP4 box header")
        (size,) = struct.unpack(">I", buf[pos : pos + 4])
        btype = buf[pos + 4 : pos + 8]
        head = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize")
            (size,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
            head = 16
        elif size == 0:  # box extends to end of enclosing container
            size = end - pos
        if size < head or pos + size > end:
            raise ValueError(f"MP4 box {btype!r} overruns its container")
        yield btype, pos + head, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, btype: bytes) -> Tuple[int, int]:
    for t, s, e in _walk(buf, start, end):
        if t == btype:
            return s, e
    raise ValueError(f"MP4 box {btype.decode('latin-1')!r} not found")


def build_mp4(
    samples: Sequence[bytes],
    durations: Sequence[int],
    timescale: int = 1000,
    codec: bytes = b"rawv",
) -> bytes:
    """Mux opaque sample blobs into a minimal valid single-track MP4
    (one chunk per sample).  ``durations`` are per-sample in
    ``timescale`` units."""
    if len(samples) != len(durations):
        raise ValueError("samples and durations must align")
    if not samples:
        raise ValueError("at least one sample is required")
    ftyp = _box(
        b"ftyp", FTYP_BRAND + struct.pack(">I", 0x200) + b"isomiso2"
    )
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    # absolute offsets: ftyp, then mdat header (8 bytes), then samples
    base = len(ftyp) + 8
    offsets = []
    off = base
    for s in samples:
        offsets.append(off)
        off += len(s)

    total = sum(durations)
    # stts: run-length encode consecutive equal durations
    runs: List[Tuple[int, int]] = []
    for d in durations:
        if runs and runs[-1][1] == d:
            runs[-1] = (runs[-1][0] + 1, d)
        else:
            runs.append((1, d))
    stts = _full_box(
        b"stts",
        0,
        0,
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">II", c, d) for c, d in runs),
    )
    # one generic sample entry: 6 reserved bytes + data_reference_index
    entry = _box(codec, b"\x00" * 6 + struct.pack(">H", 1))
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stsc = _full_box(
        b"stsc", 0, 0, struct.pack(">I", 1) + struct.pack(">III", 1, 1, 1)
    )
    stsz = _full_box(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, len(samples))
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full_box(
        b"stco",
        0,
        0,
        struct.pack(">I", len(offsets))
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    url = _full_box(b"url ", 0, 1, b"")  # self-contained flag
    dref = _full_box(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full_box(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full_box(
        b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"graft\x00"
    )
    mdhd = _full_box(
        b"mdhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, total) + struct.pack(">HH", 0x55C4, 0),
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    # tkhd v0 payload is 80 bytes: creation/modification/track_id/
    # reserved/duration (20) + reserved(8) layer(2) alt_group(2)
    # volume(2) reserved(2) matrix(36) width(4) height(4)
    tkhd = _full_box(
        b"tkhd",
        0,
        7,
        struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", total)
        + b"\x00" * 60,
    )
    trak = _box(b"trak", tkhd + mdia)
    # mvhd v0 payload is 96 bytes: times/timescale/duration (16) +
    # rate(4) volume(2) reserved(10) matrix(36) pre_defined(24) +
    # next_track_ID(4)
    mvhd = _full_box(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, total)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + b"\x00" * 72
        + struct.pack(">I", 2),  # next track id
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def parse_mp4(payload: bytes) -> dict:
    """Parse the first track's sample table.  Returns
    ``{"timescale", "duration", "codec", "samples": [(offset, size,
    dts), ...]}`` with offsets absolute in ``payload``.

    ALL malformed-input failures surface as :class:`ValueError` (the
    module contract): beyond the explicit table checks, an empty
    ``mdhd`` payload indexes past the buffer (``IndexError``) and a
    short ``mdhd``/``stsz`` inside valid box framing under-fills
    ``struct.unpack`` (``struct.error``) -- both are wrapped here so a
    corrupt or false-positive ``ftyp`` payload can never leak a
    non-ValueError through a caller's fallback (ADVICE r13, same
    discipline as the PNG decoder's zlib wrap)."""
    try:
        return _parse_mp4_checked(payload)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed MP4: {exc}") from exc


def _parse_mp4_checked(payload: bytes) -> dict:
    moov_s, moov_e = _find(payload, 0, len(payload), b"moov")
    trak_s, trak_e = _find(payload, moov_s, moov_e, b"trak")
    mdia_s, mdia_e = _find(payload, trak_s, trak_e, b"mdia")
    mdhd_s, mdhd_e = _find(payload, mdia_s, mdia_e, b"mdhd")
    ver = payload[mdhd_s]
    if ver == 1:
        timescale, duration = struct.unpack(
            ">IQ", payload[mdhd_s + 4 + 16 : mdhd_s + 4 + 16 + 12]
        )
    else:
        _, _, timescale, duration = struct.unpack(
            ">IIII", payload[mdhd_s + 4 : mdhd_s + 20]
        )
    minf_s, minf_e = _find(payload, mdia_s, mdia_e, b"minf")
    stbl_s, stbl_e = _find(payload, minf_s, minf_e, b"stbl")

    boxes = {t: (s, e) for t, s, e in _walk(payload, stbl_s, stbl_e)}
    for required in (b"stsd", b"stts", b"stsc", b"stsz"):
        if required not in boxes:
            raise ValueError(f"MP4 stbl missing {required.decode('latin-1')}")
    if b"stco" not in boxes and b"co64" not in boxes:
        raise ValueError("MP4 stbl missing stco/co64")

    def u32s(body: bytes) -> List[int]:
        return list(struct.unpack(f">{len(body) // 4}I", body[: len(body) // 4 * 4]))

    # codec fourcc from the first sample entry
    s, e = boxes[b"stsd"]
    entries = payload[s + 8 : e]
    if len(entries) < 8:
        raise ValueError("MP4 stsd truncated")
    codec = entries[4:8].decode("latin-1")

    # sizes
    s, e = boxes[b"stsz"]
    sample_size, count = struct.unpack(">II", payload[s + 4 : s + 12])
    # untrusted count fields must never drive allocation: a corrupt
    # 0xFFFFFFFF count with a fixed sample_size would otherwise build a
    # multi-GB list (MemoryError -- outside the ValueError contract).
    # A real sample needs >= 1 byte of mdat, so the payload length is a
    # sound upper bound on any plausible sample count.
    if count > len(payload):
        raise ValueError(f"MP4 stsz sample count {count} exceeds payload size")
    if sample_size:
        sizes = [sample_size] * count
    else:
        body = payload[s + 12 : e]
        if len(body) < 4 * count:
            raise ValueError("MP4 stsz table truncated")
        sizes = u32s(body[: 4 * count])

    # decode timestamps from stts runs
    s, e = boxes[b"stts"]
    (n_runs,) = struct.unpack(">I", payload[s + 4 : s + 8])
    body = payload[s + 8 : e]
    if len(body) < 8 * n_runs:
        raise ValueError("MP4 stts table truncated")
    dts_list: List[int] = []
    t = 0
    for i in range(n_runs):
        cnt, dur = struct.unpack(">II", body[8 * i : 8 * i + 8])
        # same allocation bound as stsz: a single corrupt run claiming
        # 4 billion samples must fail loud, not loop/allocate
        if cnt > len(payload) or len(dts_list) + cnt > count:
            raise ValueError(
                f"MP4 stts run of {cnt} samples exceeds stsz count {count}"
            )
        for _ in range(cnt):
            dts_list.append(t)
            t += dur
    if len(dts_list) != count:
        raise ValueError(
            f"MP4 stts covers {len(dts_list)} samples, stsz says {count}"
        )

    # chunk offsets
    if b"stco" in boxes:
        s, e = boxes[b"stco"]
        (n_chunks,) = struct.unpack(">I", payload[s + 4 : s + 8])
        body = payload[s + 8 : e]
        if len(body) < 4 * n_chunks:
            raise ValueError("MP4 stco table truncated")
        chunk_offsets = u32s(body[: 4 * n_chunks])
    else:
        s, e = boxes[b"co64"]
        (n_chunks,) = struct.unpack(">I", payload[s + 4 : s + 8])
        body = payload[s + 8 : e]
        if len(body) < 8 * n_chunks:
            raise ValueError("MP4 co64 table truncated")
        chunk_offsets = list(
            struct.unpack(f">{n_chunks}Q", body[: 8 * n_chunks])
        )

    # stsc: runs of (first_chunk, samples_per_chunk, sdi)
    s, e = boxes[b"stsc"]
    (n_sc,) = struct.unpack(">I", payload[s + 4 : s + 8])
    body = payload[s + 8 : e]
    if len(body) < 12 * n_sc:
        raise ValueError("MP4 stsc table truncated")
    sc = [
        struct.unpack(">III", body[12 * i : 12 * i + 12]) for i in range(n_sc)
    ]

    # expand the chunk-run map to per-sample (chunk, index-in-chunk)
    samples: List[Tuple[int, int, int]] = []
    si = 0
    for run_idx, (first_chunk, per_chunk, _sdi) in enumerate(sc):
        last_chunk = (
            sc[run_idx + 1][0] - 1 if run_idx + 1 < len(sc) else len(chunk_offsets)
        )
        for chunk in range(first_chunk, last_chunk + 1):
            if chunk - 1 >= len(chunk_offsets):
                raise ValueError("MP4 stsc refers past the chunk table")
            off = chunk_offsets[chunk - 1]
            for _ in range(per_chunk):
                if si >= count:
                    break
                size = sizes[si]
                if off + size > len(payload):
                    raise ValueError("MP4 sample overruns the file")
                samples.append((off, size, dts_list[si]))
                off += size
                si += 1
    if si != count:
        raise ValueError(
            f"MP4 chunk map covers {si} samples, stsz says {count}"
        )
    return {
        "timescale": timescale,
        "duration": duration,
        "codec": codec,
        "samples": samples,
    }


def extract_samples(payload: bytes) -> List[Tuple[bytes, int]]:
    """Every sample's ``(bytes, dts)`` in sample order."""
    info = parse_mp4(payload)
    return [
        (payload[off : off + size], dts)
        for off, size, dts in info["samples"]
    ]
