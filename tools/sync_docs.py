#!/usr/bin/env python3
"""Keep the 'N oracle-checked queries' strings in README.md / SURVEY.md in
sync with the actual registry size (len(__spark_entry__.queries())).

This is the mechanical fix for the r6/r8/r9 last-commit count drift:
`tests/test_ledger.py::test_registry_count_matches_docs` catches the drift
at pytest time, but the end-of-round snapshot commit was landing without a
pytest run.  The installed git pre-commit hook (see tools/install_hooks.py)
runs `sync_docs.py --fix` on every commit and stages the corrected docs, so
a registry-size change can no longer ship with a stale doc count.

Usage:
    python tools/sync_docs.py --check   # exit 1 on drift, print diffs
    python tools/sync_docs.py --fix     # rewrite docs in place
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOCS = ("README.md", "SURVEY.md")
PATTERN = re.compile(r"\d+ oracle-checked queries")


def registry_count() -> int:
    import __spark_entry__ as entrymod

    n_q = len(entrymod.queries())
    n_o = len(entrymod.oracle_sql())
    if n_q != n_o:
        print(
            f"FATAL: {n_q} queries but {n_o} oracles -- registry must stay "
            "fully oracle-checked",
            file=sys.stderr,
        )
        sys.exit(2)
    return n_q


def run(fix: bool) -> int:
    n = registry_count()
    want = f"{n} oracle-checked queries"
    drifted = []
    for doc in DOCS:
        path = os.path.join(REPO, doc)
        text = open(path).read()
        if not PATTERN.search(text):
            print(f"FATAL: {doc} no longer contains the count string", file=sys.stderr)
            return 2
        new = PATTERN.sub(want, text)
        if new != text:
            drifted.append(doc)
            if fix:
                open(path, "w").write(new)
    if drifted:
        verb = "fixed" if fix else "DRIFTED"
        print(f"{verb}: {', '.join(drifted)} -> '{want}'")
        return 0 if fix else 1
    print(f"in sync: '{want}'")
    return 0


if __name__ == "__main__":
    sys.exit(run(fix="--fix" in sys.argv))
