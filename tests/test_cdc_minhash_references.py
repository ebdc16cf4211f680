"""Randomized reference tests for MinHash-LSH dedup and content-defined
chunking: seeded corpora (with planted near-copies for LSH) compared
exactly against pure-Python reimplementations of the md5-permutation
MinHash + banding pipeline and both CDC boundary rules (per-position
md5 and the base-37 rolling polynomial)."""

from __future__ import annotations

import hashlib
import random
import re
import string

from airflow_pipeline_text_processing_spark.operators.dedup import (
    CDC_ROLL_BASE,
    CDC_ROLL_KEEP,
    CDC_ROLL_MOD,
    CDC_THRESHOLD,
    CDC_WINDOW,
    cdc_chunks,
    cdc_chunks_rolling,
    minhash_dedup_pairs,
)

VOCAB = [f"w{i}" for i in range(10)]


def _py_tokens(t):
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


def _py_shingles(t, n=3):
    tk = _py_tokens(t)
    m = max(len(tk) - (n - 1), 1)
    return {" ".join(tk[i : i + n]) for i in range(m)}


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_minhash_pairs(texts, threshold=0.5, num_perm=16, band_size=4):
    sh = {i: _py_shingles(t) for i, t in enumerate(texts)}
    sigs = {
        i: [
            min(
                hashlib.md5(f"{p}|{s}".encode()).hexdigest()
                for s in shingles
            )
            for p in range(num_perm)
        ]
        for i, shingles in sh.items()
    }
    buckets = {}
    for i, sig in sigs.items():
        for band in range(num_perm // band_size):
            key = (band, ",".join(sig[band * band_size : (band + 1) * band_size]))
            buckets.setdefault(key, []).append(i)
    cands = set()
    for members in buckets.values():
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                a, b = sorted((members[ai], members[bi]))
                cands.add((a, b))
    out = {}
    for a, b in cands:
        inter = len(sh[a] & sh[b])
        jac = inter / (len(sh[a]) + len(sh[b]) - inter)
        if jac >= threshold:
            out[(a, b)] = jac
    return out


def test_minhash_lsh_matches_python_reference(spark):
    for seed in range(4):
        rng = random.Random(seed)
        texts = []
        for i in range(14):
            if i >= 3 and rng.random() < 0.4:
                base = _py_tokens(texts[rng.randrange(i)])
                base[rng.randrange(len(base))] = rng.choice(VOCAB)
                texts.append(" ".join(base))
            else:
                texts.append(
                    " ".join(
                        rng.choice(VOCAB) for _ in range(rng.randint(6, 20))
                    )
                )
        got = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in minhash_dedup_pairs(_mk_docs(spark, texts)).collect()
        }
        want = _py_minhash_pairs(texts)
        assert got == want, f"seed {seed}"


def _py_cdc(text, boundary_fn, window=CDC_WINDOW):
    n = len(text)
    bnd = (
        [i for i in range(window, n + 1) if boundary_fn(text[i - window : i])]
        if n >= window
        else []
    )
    starts = [0] + bnd
    ends = bnd + [n]
    chunks = [text[s:e] for s, e in zip(starts, ends) if e > s]
    return [
        (idx, c, hashlib.md5(c.encode()).hexdigest(), len(c))
        for idx, c in enumerate(chunks)
    ]


def _md5_boundary(win):
    return hashlib.md5(win.encode()).hexdigest() < CDC_THRESHOLD


def _poly_boundary(win):
    v = 0
    for ch in win:
        v = v * CDC_ROLL_BASE + ord(ch)
    return v % CDC_ROLL_MOD < CDC_ROLL_KEEP


def test_cdc_chunks_match_python_reference(spark):
    for seed in range(4):
        rng = random.Random(70 + seed)
        texts = [
            "".join(
                rng.choice(string.ascii_lowercase + " ")
                for _ in range(rng.randint(1, 120))
            )
            for _ in range(12)
        ]
        for op, rule in (
            (cdc_chunks, _md5_boundary),
            (cdc_chunks_rolling, _poly_boundary),
        ):
            got = {}
            for r in op(_mk_docs(spark, texts)).collect():
                got.setdefault(r.doc_id, []).append(
                    (r.chunk_idx, r.chunk, r.chunk_hash, r.chunk_len)
                )
            for v in got.values():
                v.sort()
            want = {
                i: _py_cdc(t, rule)
                for i, t in enumerate(texts)
                if _py_cdc(t, rule)
            }
            assert got == want, f"seed {seed} op {op.__name__}"
