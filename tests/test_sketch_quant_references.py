"""Randomized reference tests for the KMV distinct sketch and int8
scalar quantization: pure-Python replications of the md5 order
statistics (including the exact 52-bit estimator arithmetic) and the
FAISS-SQ8-style affine code/dequant/error pipeline, compared exactly
against the Spark operators."""

from __future__ import annotations

import hashlib
import math
import random

from airflow_pipeline_text_processing_spark.operators.sketches import (
    kmv_distinct,
)
from airflow_pipeline_text_processing_spark.operators.similarity import (
    quantize_int8,
)


def _md5(s):
    return hashlib.md5(str(s).encode()).hexdigest()


def test_kmv_distinct_matches_python_reference(spark):
    k = 8
    for seed in range(4):
        rng = random.Random(seed)
        rows = [
            (rng.choice(["a", "b", "c"]), rng.randint(0, 60))
            for _ in range(400)
        ]
        df = spark.createDataFrame(rows, "grp string, v long")
        got = {
            r.grp: (r.n_in_sketch, r.kth_hash, r.kmv_estimate)
            for r in kmv_distinct(df, "grp", "v", k=k).collect()
        }
        want = {}
        by_g = {}
        for g, v in rows:
            by_g.setdefault(g, set()).add(v)
        for g, vals in by_g.items():
            hs = sorted(_md5(v) for v in vals)[:k]
            n = len(hs)
            kth = hs[-1][:13]
            est = (
                float(n)
                if n < k
                else (k - 1) * float(1 << 52) / float(int(kth, 16))
            )
            want[g] = (n, kth, est)
        assert got == want, f"seed {seed}"


def test_quantize_int8_matches_python_reference(spark):
    for seed in range(4):
        rng = random.Random(20 + seed)
        vecs = [
            [float(rng.randint(-40, 40)) for _ in range(8)]
            for _ in range(30)
        ]
        vecs.append([5.0] * 8)  # degenerate flat vector -> all-zero codes
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        got = {
            r.vec_id: (r.qmin, r.qmax, r.codes_hash, r.abs_err_fp)
            for r in quantize_int8(df).collect()
        }
        want = {}
        for i, v in enumerate(vecs):
            vmin, vmax = min(v), max(v)
            scale = vmax - vmin
            if scale == 0:
                codes = [0] * len(v)
            else:
                codes = [
                    min(math.floor((x - vmin) / scale * 255.0), 255)
                    for x in v
                ]
            dq = [vmin + q / 255.0 * scale for q in codes]
            err = sum(
                math.floor(abs(x - d) * 1e6) for x, d in zip(v, dq)
            )
            ch = hashlib.md5(
                ",".join(str(q) for q in codes).encode()
            ).hexdigest()
            want[i] = (vmin, vmax, ch, err)
        assert got == want, f"seed {seed}"
