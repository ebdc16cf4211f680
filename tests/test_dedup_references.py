"""Randomized reference tests for the blocking/fingerprinting dedup
operators: winnowing (SIGMOD'03 window-minimum selection with the
rightmost-min tie rule), simhash signatures, and sorted-neighborhood
blocking -- each compared exactly against an independent pure-Python
reimplementation over seeded corpora planted with mutated near-copies
(so sub-threshold Hamming pairs and >= k+w-1 shared runs really
occur)."""

from __future__ import annotations

import hashlib
import random
import re

from airflow_pipeline_text_processing_spark.operators.dedup import (
    simhash_signatures,
    sorted_neighborhood_pairs,
    winnow_fingerprints,
    winnow_overlap_pairs,
)

VOCAB = [f"w{i}" for i in range(10)]


def _py_tokens(t):
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _mutated_corpus(rng, n_docs=16):
    texts = []
    for i in range(n_docs):
        if i >= 4 and rng.random() < 0.4:
            base = _py_tokens(texts[rng.randrange(i)])
            j = rng.randrange(len(base))
            base[j] = rng.choice(VOCAB)  # one-token mutation: near-copy
            texts.append(" ".join(base))
        else:
            texts.append(
                " ".join(
                    rng.choice(VOCAB) for _ in range(rng.randint(8, 24))
                )
            )
    return texts


# ------------------------------------------------------------ winnowing


def _py_winnow_fps(text, k=4, w=4):
    tk = _py_tokens(text)
    n_grams = len(tk) - k + 1
    if n_grams < 1:
        return set()
    enc = {}
    for pos in range(1, n_grams + 1):
        sh = " ".join(tk[pos - 1 : pos - 1 + k])
        h = int(hashlib.md5(sh.encode()).hexdigest()[:10], 16)
        enc[pos] = h * 65536 + (65536 - pos)
    fps = set()
    for p in range(1, n_grams - (w - 1) + 1):
        m = min(enc[q] for q in range(p, p + w))
        fps.add(m // 65536)
    return fps


def test_winnow_fingerprints_match_python_reference(spark):
    for seed in range(4):
        rng = random.Random(seed)
        texts = _mutated_corpus(rng)
        got = {}
        for r in winnow_fingerprints(_mk_docs(spark, texts)).collect():
            got.setdefault(r.doc_id, set()).add(r.fp)
        want = {
            i: fps
            for i, t in enumerate(texts)
            if (fps := _py_winnow_fps(t))
        }
        assert got == want, f"seed {seed}"


def test_winnow_overlap_pairs_match_python_reference(spark):
    for seed in range(4):
        rng = random.Random(20 + seed)
        texts = _mutated_corpus(rng)
        min_shared, df_cap = 2, 6
        fps = {i: _py_winnow_fps(t) for i, t in enumerate(texts)}
        df = {}
        for s in fps.values():
            for f in s:
                df[f] = df.get(f, 0) + 1
        rare = {i: {f for f in s if df[f] <= df_cap} for i, s in fps.items()}
        want = {}
        ids = sorted(rare)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                shared = len(rare[a] & rare[b])
                if shared >= min_shared:
                    na, nb = len(rare[a]), len(rare[b])
                    want[(a, b)] = (
                        shared, na, nb,
                        shared * 1_000_000 // min(na, nb),
                    )
        got = {
            (r.doc_a, r.doc_b): (
                r.n_shared, r.n_fp_a, r.n_fp_b, r.overlap_ppm
            )
            for r in winnow_overlap_pairs(
                _mk_docs(spark, texts),
                min_shared=min_shared,
                df_cap=df_cap,
            ).collect()
        }
        assert got == want, f"seed {seed}"


# ---------------------------------------- simhash + sorted neighborhood


def _py_simhash(text, bits=32):
    votes = [0] * bits
    for tok in _py_tokens(text):
        h = hashlib.md5(tok.encode()).hexdigest()
        for b in range(bits):
            hexval = int(h[b // 4], 16)
            bit = (hexval >> (b % 4)) & 1
            votes[b] += 1 if bit else -1
    return "".join("1" if v > 0 else "0" for v in votes)


def test_simhash_signatures_match_python_reference(spark):
    for seed in range(4):
        rng = random.Random(40 + seed)
        texts = _mutated_corpus(rng)
        got = {
            r.doc_id: r.simhash
            for r in simhash_signatures(_mk_docs(spark, texts)).collect()
        }
        want = {i: _py_simhash(t) for i, t in enumerate(texts)}
        assert got == want, f"seed {seed}"


def test_sorted_neighborhood_matches_python_reference(spark):
    for seed in range(60, 63):
        rng = random.Random(seed)
        texts = _mutated_corpus(rng)
        window, max_hamming = 5, 8
        sigs = {i: _py_simhash(t) for i, t in enumerate(texts)}
        order = sorted(sigs, key=lambda i: (sigs[i], i))
        rank = {i: r + 1 for r, i in enumerate(order)}
        want = {}
        for b in order:
            for gap in range(1, window + 1):
                ra = rank[b] - gap
                if ra < 1:
                    continue
                a = order[ra - 1]
                ham = sum(
                    1 for x, y in zip(sigs[a], sigs[b]) if x != y
                )
                if ham <= max_hamming:
                    want[(a, b)] = (gap, ham)
        got = {
            (r.doc_a, r.doc_b): (r.gap, r.hamming)
            for r in sorted_neighborhood_pairs(
                _mk_docs(spark, texts),
                window=window,
                max_hamming=max_hamming,
            ).collect()
        }
        assert got == want, f"seed {seed}"
