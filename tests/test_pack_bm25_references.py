"""Randomized reference tests for BFD bin packing and BM25 scoring:
pure-Python replications of the shard-local best-fit-decreasing
algorithm (both tie rules + the oversized-doc rule) and the rational
no-log BM25 with per-term micro flooring, compared exactly against the
Spark operators -- guarding the applyInPandas shard plumbing and the
IEEE expression tree respectively."""

from __future__ import annotations

import math
import random
import re

from airflow_pipeline_text_processing_spark.operators.text import (
    BPE_PATTERN,
    bm25_scores,
    pack_bins_bfd,
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "the", "of"]


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_bfd(doc_tokens, budget, num_shards):
    out = {}
    for shard in range(num_shards):
        members = sorted(
            (i for i in doc_tokens if i % num_shards == shard),
            key=lambda i: (-doc_tokens[i], i),
        )
        loads = []
        for i in members:
            n = doc_tokens[i]
            best = -1
            for load in loads:
                if load + n <= budget and load > best:
                    best = load
            if best < 0:
                loads.append(0)
                idx = len(loads) - 1
            else:
                idx = loads.index(best)
            out[i] = (shard, idx, loads[idx])
            loads[idx] += n
        for i in members:
            shard_, idx, off = out[i]
            out[i] = (shard_, idx, off, loads[idx])
    return out


def test_pack_bins_bfd_matches_python_reference(spark):
    budget, num_shards = 40, 3
    for seed in range(4):
        rng = random.Random(seed)
        texts = [
            " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 50)))
            for _ in range(24)
        ]
        doc_tokens = {
            i: len(re.findall(BPE_PATTERN, t)) for i, t in enumerate(texts)
        }
        want = _py_bfd(doc_tokens, budget, num_shards)
        got = {
            r.doc_id: (r.shard, r.bin_in_shard, r.offset_in_bin, r.bin_tokens)
            for r in pack_bins_bfd(
                _mk_docs(spark, texts), budget=budget, num_shards=num_shards
            ).collect()
        }
        assert got == want, f"seed {seed}"
        # fill_pct sanity: every bin holding a within-budget doc is <= 1
        for r in pack_bins_bfd(
            _mk_docs(spark, texts), budget=budget, num_shards=num_shards
        ).collect():
            if doc_tokens[r.doc_id] <= budget:
                assert r.bin_tokens <= budget


def test_bm25_matches_python_reference(spark):
    query = ["alpha", "zeta", "missingterm"]
    for seed in range(4):
        rng = random.Random(10 + seed)
        texts = [
            " ".join(rng.choice(WORDS) for _ in range(rng.randint(2, 30)))
            for _ in range(20)
        ]
        k1, b = 1.2, 0.75
        # python reference with the identical IEEE expression tree
        tok = [
            [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
            for t in texts
        ]
        dls = [len(ts) for ts in tok]
        n_docs, avgdl = len(texts), sum(dls) / len(texts)
        terms = sorted({t.lower() for t in query})
        df = {
            term: sum(1 for ts in tok if term in ts) for term in terms
        }
        want = {}
        for i, ts in enumerate(tok):
            hits = 0
            micro = 0
            for term in terms:
                tf = ts.count(term)
                if tf == 0:
                    continue
                hits += 1
                idf = (n_docs - df[term] + 0.5) / (df[term] + 0.5)
                sat = (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * dls[i] / avgdl)
                )
                micro += math.floor(idf * sat * 1_000_000.0)
            if hits:
                want[i] = (hits, micro)
        got = {
            r.doc_id: (r.n_terms_hit, r.bm25_micro)
            for r in bm25_scores(_mk_docs(spark, texts), query).collect()
        }
        assert got == want, f"seed {seed}"
