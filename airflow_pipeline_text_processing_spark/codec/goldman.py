"""Goldman base-3 DNA codec -- semantics-parity re-implementation.

Matches the observable behavior of the reference encoder
(``/root/reference/plugins/utils/dna_encoding.py:47-204``):

* ``bytes_to_trits`` (ref ``:47-61``): interpret the payload as one
  big-endian unsigned integer and emit its minimal base-3 digits,
  most-significant first.  Empty input and the zero integer both yield
  ``[0]``.  Leading NUL bytes therefore vanish into the integer; decode
  restores them via the fixed target width (see ``trits_to_bytes``).
* ``trits_to_bytes`` (ref ``:63-76``): Horner-accumulate base 3, render
  big-endian at exactly ``target_length_bytes`` (left-pad with NULs,
  keep the rightmost bytes when too long).
* ``trits_to_dna`` (ref ``:132-163``): rotation code over ``ACGT``.  The
  first trit indexes ``A/C/G``; every later trit indexes the three bases
  distinct from the previous one (in ``ACGT`` order), so the output never
  contains two equal adjacent bases (homopolymer-free invariant).
* ``dna_to_trits`` (ref ``:165-194``): exact inverse; unrecognised bases
  decode as trit 0.

The implementation here is a fresh one optimised for batch throughput
inside Arrow pandas UDFs: trit extraction peels 48 digits per bignum
divmod instead of one, and the rotation code runs off a precomputed
(prev-base, trit) lookup table.
"""

from __future__ import annotations

from typing import List

_BASES = "ACGT"

# next-base lookup: _NEXT[prev_base][trit] -> base; first trit uses _FIRST.
_FIRST = "ACG"
_NEXT = {p: "".join(b for b in _BASES if b != p) for p in _BASES}

# inverse lookup: (prev_base, base) -> trit, defaulting to 0 for unknowns.
_INV_FIRST = {b: i for i, b in enumerate(_FIRST)}
_INV_NEXT = {
    p: {b: i for i, b in enumerate(_NEXT[p])} for p in _BASES
}

# peel this many base-3 digits per big-integer divmod (3**48 < 2**77,
# keeps the inner loop on machine-sized ints).
_TRITS_PER_LIMB = 48
_LIMB = 3**_TRITS_PER_LIMB


def bytes_to_trits(data: bytes) -> List[int]:
    """Big-endian bignum -> minimal base-3 digits (MSD first); b''/0 -> [0]."""
    if not data:
        return [0]
    value = int.from_bytes(data, "big")
    if value == 0:
        return [0]
    limbs: List[int] = []
    while value > 0:
        value, rem = divmod(value, _LIMB)
        limbs.append(rem)
    # all limbs except the most significant contribute exactly
    # _TRITS_PER_LIMB digits; the last one contributes its minimal digits.
    out: List[int] = []
    top = limbs.pop()
    while top > 0:
        top, d = divmod(top, 3)
        out.append(d)
    out.reverse()
    for limb in reversed(limbs):
        digits = [0] * _TRITS_PER_LIMB
        for i in range(_TRITS_PER_LIMB - 1, -1, -1):
            limb, digits[i] = divmod(limb, 3)
        out.extend(digits)
    return out


def trits_to_bytes(trits: List[int], target_length_bytes: int) -> bytes:
    """Base-3 digits (MSD first) -> big-endian bytes of fixed width."""
    value = 0
    n = len(trits)
    for i in range(0, n, _TRITS_PER_LIMB):
        block = trits[i : i + _TRITS_PER_LIMB]
        acc = 0
        for t in block:
            acc = acc * 3 + t
        value = value * (3 ** len(block)) + acc
    width = max(1, target_length_bytes)
    data = value.to_bytes(max(width, (value.bit_length() + 7) // 8 or 1), "big")
    if len(data) < target_length_bytes:
        data = b"\x00" * (target_length_bytes - len(data)) + data
    elif len(data) > target_length_bytes:
        data = data[-target_length_bytes:]
    return data


def trits_to_dna(trits: List[int]) -> str:
    """Rotation-encode trits into a homopolymer-free ACGT string."""
    if not trits:
        return ""
    out = [_FIRST[trits[0] % 3]]
    prev = out[0]
    nxt = _NEXT
    for t in trits[1:]:
        prev = nxt[prev][t % 3]
        out.append(prev)
    return "".join(out)


def dna_to_trits(seq: str) -> List[int]:
    """Inverse rotation decode; unknown bases map to trit 0."""
    trits: List[int] = []
    prev = None
    for base in seq.upper():
        if prev is None:
            trits.append(_INV_FIRST.get(base, 0))
        elif prev in _INV_NEXT:
            trits.append(_INV_NEXT[prev].get(base, 0))
        else:
            # unknown previous base: nothing is excluded, so the candidate
            # list is all four bases (ref filters ``b != previous_base``)
            trits.append(_BASES.index(base) if base in _BASES else 0)
        prev = base
    return trits


def bytes_to_dna(data: bytes) -> str:
    """bytes -> trits -> DNA (ref ``:196-199``)."""
    return trits_to_dna(bytes_to_trits(data))


def dna_to_bytes(seq: str, target_length_bytes: int) -> bytes:
    """DNA -> trits -> fixed-width bytes (ref ``:201-204``)."""
    return trits_to_bytes(dna_to_trits(seq), target_length_bytes)


def has_homopolymer(seq: str) -> bool:
    """True iff two equal adjacent bases exist (ref ``:206-230`` check)."""
    return any(seq[i] == seq[i + 1] for i in range(len(seq) - 1))
