"""Round-15 optimization pins.

Every test here guards an optimization that restructured an operator's
internals while keeping its results bit-identical:

* ``embedding_dedup_pairs``' lossless cosine prefilter (operators/dedup.py)
  -- the pair condition now short-circuits on flat normalized-component
  arithmetic before the exact fixed-point cosine; the pin checks the
  output against an independent pure-Python replay of the exact
  semantics on adversarial inputs (near-threshold pairs, tiny norms,
  ragged widths, scaled twins).
"""

from __future__ import annotations

import math

import pytest

from airflow_pipeline_text_processing_spark.operators.dedup import (
    embedding_dedup_pairs,
)

DIM = 64
SCALE = 1_000_000.0
THRESHOLD = 0.99


def _fixed_dot(a, b):
    """Pure-Python replay of operators/similarity.py::scaled_dot for
    equal-length inputs (Python floats ARE IEEE doubles, so the floor
    device matches Spark bit-for-bit)."""
    return sum(int(math.floor(x * y * SCALE)) for x, y in zip(a, b))


def _expected_pairs(vecs):
    """Independent reference: every (a < b) pair whose exact fixed-point
    cosine reaches THRESHOLD, replaying the engine's arithmetic."""
    out = []
    items = sorted(vecs.items())
    for i, (ida, va) in enumerate(items):
        for idb, vb in items[i + 1:]:
            if len(va) != len(vb):
                continue  # zip_with pads with null -> null cosine -> dropped
            n = _fixed_dot(va, vb)
            da, db = _fixed_dot(va, va), _fixed_dot(vb, vb)
            denom = math.sqrt(float(da)) * math.sqrt(float(db))
            if denom == 0.0:
                continue
            if float(n) / denom >= THRESHOLD:
                out.append((ida, idb))
    return sorted(out)


def _unit(seed: int):
    """Deterministic pseudo-random unit vector (no RNG state)."""
    import hashlib

    raw = []
    for i in range(DIM):
        h = hashlib.md5(f"v|{seed}|{i}".encode()).hexdigest()
        raw.append((int(h[:8], 16) / 2**31) - 1.0)
    nrm = math.sqrt(sum(x * x for x in raw))
    return [x / nrm for x in raw]


def _rotate_toward(base, ortho, cosine: float):
    """A vector at exactly the requested float cosine from ``base``
    (both unit), built from an orthogonalized companion."""
    d = sum(x * y for x, y in zip(base, ortho))
    perp = [y - d * x for x, y in zip(base, ortho)]
    pn = math.sqrt(sum(x * x for x in perp))
    s = math.sqrt(max(1.0 - cosine * cosine, 0.0))
    return [cosine * x + s * (y / pn) for x, y in zip(base, perp)]


@pytest.fixture(scope="module")
def adversarial_vecs():
    vecs = {}
    # scaled twins (cosine 1.0 with each other)
    vecs[0] = _unit(0)
    vecs[1] = [2.0 * x for x in _unit(0)]
    # a fan of near-threshold pairs: cosines straddling 0.99 by +-1e-4
    # and +-1e-3 -- the prefilter bound must keep every >= pair
    base, comp = _unit(10), _unit(11)
    for k, cos in enumerate(
        [0.9889, 0.9899, 0.98995, 0.99, 0.99005, 0.9901, 0.9911]
    ):
        vecs[100 + k] = base
        vecs[200 + k] = _rotate_toward(base, comp, cos)
    # tiny norms: norm^2 ~ 4e-4 -> D ~ 400 (< 1000*G: the escape hatch
    # must route these to the exact check, which still finds the twin)
    tiny = [0.02 * x for x in _unit(20)]
    vecs[300], vecs[301] = tiny, list(tiny)
    # ragged width (63 components): zip_with pads -> dropped, both paths
    vecs[400] = _unit(30)[:-1]
    vecs[401] = _unit(30)
    # ragged width BELOW the prefilter depth (5 components): element_at
    # past the row's width must not abort the query under ANSI mode
    # (try_element_at pin, r16 ADVICE) -- routed to the exact check and
    # dropped like any other ragged pair
    vecs[410] = _unit(31)[:5]
    # unrelated noise
    for k in range(12):
        vecs[500 + k] = _unit(40 + k)
    return vecs


def test_prefiltered_pairs_match_exact_reference(spark, adversarial_vecs):
    rows = [(i, v) for i, v in sorted(adversarial_vecs.items())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sorted(
        (r.id_a, r.id_b)
        for r in embedding_dedup_pairs(df, threshold=THRESHOLD).collect()
    )
    want = _expected_pairs(adversarial_vecs)
    assert got == want
    # sanity on the fixture itself: the twin pair and the >=0.99 fan
    # members are present, so the assertion is not vacuous
    assert (0, 1) in want
    assert len(want) >= 5


def test_prefilter_keeps_exact_cosine_values(spark, adversarial_vecs):
    """The emitted cosine VALUES are the exact fixed-point expression's
    (the prefilter must not substitute its float approximation)."""
    rows = [(i, v) for i, v in sorted(adversarial_vecs.items())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for r in embedding_dedup_pairs(df, threshold=THRESHOLD).collect():
        va = adversarial_vecs[r.id_a]
        vb = adversarial_vecs[r.id_b]
        n = _fixed_dot(va, vb)
        expect = float(n) / (
            math.sqrt(float(_fixed_dot(va, va)))
            * math.sqrt(float(_fixed_dot(vb, vb)))
        )
        assert r.cosine == expect
