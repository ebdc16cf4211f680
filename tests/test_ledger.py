"""Process locks from VERDICT r8 Next-round #1/#2: the registry count in the
docs is derived-and-asserted (r6 and r8 both shipped drifted counts), and the
grading-window rotation ledger is machine-checked instead of comment-honored.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def _registry():
    import __spark_entry__ as entrymod

    return entrymod


def test_registry_count_matches_docs():
    """README.md and SURVEY.md each state the oracle-checked query count as
    'N oracle-checked queries'; N must equal the actual registry size (every
    entry is oracle-checked -- zero rows-only entries is itself asserted)."""
    entrymod = _registry()
    n_queries = len(entrymod.queries())
    n_oracles = len(entrymod.oracle_sql())
    assert n_queries == n_oracles, (
        f"{n_queries - n_oracles} registry entries lack an oracle; the docs "
        "claim a fully oracle-checked registry"
    )
    for doc in ("README.md", "SURVEY.md"):
        text = open(os.path.join(REPO, doc)).read()
        claims = re.findall(r"(\d+) oracle-checked queries", text)
        assert claims, f"{doc} no longer states the oracle-checked count"
        for c in claims:
            assert int(c) == n_queries, (
                f"{doc} says '{c} oracle-checked queries' but the registry "
                f"has {n_queries} -- update the doc (this is the r6/r8 "
                "last-commit drift, now a test failure instead)"
            )


def test_grading_ledger_invariants():
    """grading_ledger.json rotation invariants (see tools/ledger.py):
    new queries debut in-window; fn/oracle-changed queries re-enter the
    window; changed kernel modules keep an in-window representative."""
    import ledger

    errors = ledger.check()
    assert not errors, "\n".join(errors)


def test_window_size_is_the_driver_contract():
    import ledger

    entrymod = _registry()
    assert ledger.WINDOW_SIZE == 50
    assert len(entrymod.REGISTRY) >= 50


def test_coverage_doc_mentions_every_registry_query():
    """COVERAGE.md is the line-by-line parity doc the judge reads; it
    silently stopped tracking new queries after round 6 (38 missing by
    round 10).  Mechanical lock, same spirit as the count assertion:
    every registry query name must appear in COVERAGE.md."""
    entrymod = _registry()
    cov = open(os.path.join(REPO, "COVERAGE.md")).read()
    missing = [n for n in entrymod.queries() if n not in cov]
    assert not missing, (
        f"COVERAGE.md is missing {len(missing)} registry queries: "
        f"{missing[:8]}{'...' if len(missing) > 8 else ''}"
    )


def test_bench_headline_list_is_valid():
    """bench.py's BENCH_QUERIES is executed verbatim by the round
    driver; a renamed or mistyped entry crashes the whole benchmark
    run (KeyError into REGISTRY).  Mechanical lock: every headline
    name must exist in the registry, with no duplicates."""
    import ast

    entrymod = _registry()
    tree = ast.parse(open(os.path.join(REPO, "bench.py")).read())
    names = None
    for node in tree.body:
        if (
            isinstance(node, ast.Assign)
            and getattr(node.targets[0], "id", None) == "BENCH_QUERIES"
        ):
            names = ast.literal_eval(node.value)
    assert names, "BENCH_QUERIES not found in bench.py"
    missing = [n for n in names if n not in entrymod.REGISTRY]
    dupes = sorted({n for n in names if names.count(n) > 1})
    assert not missing and not dupes, (missing, dupes)
    # r15 (VERDICT r14 ask #3): FULL-registry receipts -- every queries()
    # entry must have a bench wall-time receipt, so a future debut cannot
    # ship receipt-less
    unbenched = sorted(set(entrymod.REGISTRY) - set(names))
    assert not unbenched, f"registry entries without a bench receipt: {unbenched}"
