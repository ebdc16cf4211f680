"""Randomized reference tests for RAKE keyword extraction and n-gram
novelty: seeded random corpora from a small vocabulary (forcing real
stopword runs, repeated phrases, and cross-document gram collisions),
Spark results compared exactly against independent pure-Python
reimplementations of the published algorithms."""

from __future__ import annotations

import random
import re

from airflow_pipeline_text_processing_spark.operators.dedup import (
    ngram_novelty,
)
from airflow_pipeline_text_processing_spark.operators.text import (
    STOPWORDS,
    rake_keywords,
)

CONTENT = [f"w{i}" for i in range(8)]


def _py_tokens(t):
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_rake(texts, max_len=4):
    phrases = []  # every phrase OCCURRENCE as a token tuple
    for t in texts:
        run = []
        for tok in _py_tokens(t) + [None]:
            if tok is None or tok in STOPWORDS:
                if run:
                    if len(run) <= max_len:
                        phrases.append(tuple(run))
                    run = []
            else:
                run.append(tok)
    wdeg, wfreq = {}, {}
    for p in phrases:
        for w in p:  # duplicates inside a phrase count per occurrence
            wdeg[w] = wdeg.get(w, 0) + len(p)
            wfreq[w] = wfreq.get(w, 0) + 1
    wscore = {w: wdeg[w] * 1_000_000 // wfreq[w] for w in wdeg}
    counts = {}
    for p in phrases:
        counts[p] = counts.get(p, 0) + 1
    rows = [
        (" ".join(p), c, sum(wscore[w] for w in p))
        for p, c in counts.items()
    ]
    rows.sort(key=lambda r: (-r[2], r[0]))
    return rows


def test_rake_matches_python_reference(spark):
    for seed in range(5):
        rng = random.Random(seed)
        texts = [
            " ".join(
                rng.choice(CONTENT + STOPWORDS)
                for _ in range(rng.randint(4, 25))
            )
            for _ in range(12)
        ]
        want = _py_rake(texts)
        got = [
            (r.phrase, r.n_occur, r.score_ppm)
            for r in rake_keywords(
                _mk_docs(spark, texts), topn=10_000
            ).collect()
        ]
        assert got == want, f"seed {seed}"


def test_ngram_novelty_matches_python_reference(spark):
    n = 4  # shorter grams than the registry's 8 so collisions happen
    for seed in range(5):
        rng = random.Random(40 + seed)
        texts = [
            " ".join(
                rng.choice(CONTENT) for _ in range(rng.randint(0, 12))
            )
            for _ in range(15)
        ]
        per_doc = []
        for t in texts:
            tk = _py_tokens(t)
            per_doc.append(
                {
                    " ".join(tk[i : i + n])
                    for i in range(len(tk) - n + 1)
                }
                if len(tk) >= n
                else set()
            )
        df = {}
        for gs in per_doc:
            for g in gs:
                df[g] = df.get(g, 0) + 1
        want = {
            i: (
                len(gs),
                sum(1 for g in gs if df[g] == 1) * 1_000_000 // len(gs),
            )
            for i, gs in enumerate(per_doc)
            if gs  # short docs emit no row
        }
        got = {
            r.doc_id: (r.n_distinct, r.novel_ppm)
            for r in ngram_novelty(_mk_docs(spark, texts), n=n).collect()
        }
        assert got == want, f"seed {seed}"
