#!/usr/bin/env python
"""Machine-readable grading-window ledger (VERDICT r8, Next-round #2).

``grading_ledger.json`` records, per registry query, the last round with a
fully-green driver CORRECTNESS row and the query's fingerprint (md5 of the
query function's own source + its oracle SQL) as of that grade, plus a
digest of every package module.  ``tests/test_ledger.py`` asserts the
rotation invariants against it:

  (1) every registry query has a ledger row, or sits inside the driver
      window (first ``window_size`` entries of ``_ORDER``) -- new queries
      must debut in-window;
  (2) any query whose (fn source + oracle SQL) fingerprint changed since
      its last grade is in-window;
  (3) for every package module whose digest changed since the ledger
      snapshot, at least one in-window query is defined in a registry
      module that imports it -- a rewritten kernel (the r8
      ``cluster_kmeans_embeddings`` case) cannot sit ungraded;
  (4) no ghost rows: ledger names are a subset of the registry.

Usage:
  python tools/ledger.py rebuild   # after a new CORRECTNESS_rN.json lands
  python tools/ledger.py check     # the same assertions the test runs
"""

from __future__ import annotations

import ast
import glob
import hashlib
import inspect
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG = "airflow_pipeline_text_processing_spark"
LEDGER_PATH = os.path.join(REPO, "grading_ledger.json")
WINDOW_SIZE = 50


def _green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
        and not row.get("err")
    )


def last_graded_rounds() -> dict[str, int]:
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        n = int(os.path.basename(path).split("_r")[1].split(".")[0])
        for name, row in json.load(open(path)).items():
            if _green(row):
                out[name] = max(out.get(name, 0), n)
    return out


def query_fp(fn, oracle: str | None) -> str:
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = repr(fn)
    return hashlib.md5((src + (oracle or "")).encode()).hexdigest()


def module_digests() -> dict[str, str]:
    pkg_dir = os.path.join(REPO, PKG)
    out = {}
    for root, _dirs, files in os.walk(pkg_dir):
        for f in sorted(files):
            if f.endswith(".py"):
                p = os.path.join(root, f)
                rel = os.path.relpath(p, REPO)
                with open(p, "rb") as fh:
                    out[rel] = hashlib.md5(fh.read()).hexdigest()
    return out


def registry_module_imports() -> dict[str, set[str]]:
    """For each registry file (plans/queries*.py): the set of package module
    relpaths it imports, transitively (one-level closure over package
    imports is iterated to a fixed point)."""
    pkg_dir = os.path.join(REPO, PKG)
    # direct import edges for every package module
    edges: dict[str, set[str]] = {}
    mod_by_dotted: dict[str, str] = {}
    for root, _dirs, files in os.walk(pkg_dir):
        for f in files:
            if not f.endswith(".py"):
                continue
            p = os.path.join(root, f)
            rel = os.path.relpath(p, REPO)
            dotted = rel[:-3].replace(os.sep, ".")
            if dotted.endswith(".__init__"):
                dotted = dotted[: -len(".__init__")]
            mod_by_dotted[dotted] = rel
    for dotted, rel in mod_by_dotted.items():
        tree = ast.parse(open(os.path.join(REPO, rel)).read())
        deps: set[str] = set()
        for node in ast.walk(tree):
            names: list[str] = []
            if isinstance(node, ast.Import):
                names = [a.name for a in node.names]
            elif isinstance(node, ast.ImportFrom) and node.module:
                base = node.module
                if node.level:  # relative import -- resolve against pkg
                    parts = dotted.split(".")
                    base = ".".join(parts[: -node.level]) + "." + node.module
                names = [base] + [f"{base}.{a.name}" for a in node.names]
            for n in names:
                while n:
                    if n in mod_by_dotted:
                        deps.add(mod_by_dotted[n])
                        break
                    n = n.rpartition(".")[0]
        edges[rel] = deps
    # transitive closure
    changed = True
    while changed:
        changed = False
        for rel, deps in edges.items():
            extra = set()
            for d in deps:
                extra |= edges.get(d, set())
            if not extra <= deps:
                deps |= extra
                changed = True
    return {
        rel: deps | {rel}
        for rel, deps in edges.items()
        if os.path.basename(rel).startswith("queries")
    }


def current_state():
    import __spark_entry__ as entrymod

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    fps = {n: query_fp(fn, oracles.get(n)) for n, fn in queries.items()}
    defining = {}
    for n, fn in queries.items():
        try:
            # unwrap: registry fns are residue-scoped (functools.wraps)
            # since r15 -- attribute to the defining module, not session.py
            defining[n] = os.path.relpath(
                inspect.getfile(inspect.unwrap(fn)), REPO
            )
        except TypeError:
            defining[n] = ""
    order = list(entrymod.REGISTRY)
    return order, fps, defining


def rebuild() -> None:
    order, fps, defining = current_state()
    last = last_graded_rounds()
    ledger = {
        "window_size": WINDOW_SIZE,
        "queries": {
            n: {"last_graded": last.get(n, 0), "fp": fps[n], "module": defining[n]}
            for n in order
            if n in last
        },
        "modules": module_digests(),
    }
    with open(LEDGER_PATH, "w") as fh:
        json.dump(ledger, fh, indent=1, sort_keys=True)
    print(f"wrote {LEDGER_PATH}: {len(ledger['queries'])} graded queries")


def check() -> list[str]:
    with open(LEDGER_PATH) as fh:
        ledger = json.load(fh)
    order, fps, defining = current_state()
    window = set(order[: ledger["window_size"]])
    errors = []
    # (4) ghosts
    for n in ledger["queries"]:
        if n not in fps:
            errors.append(f"ledger ghost row: {n!r} not in registry")
    # (1) new queries in-window
    for n in order:
        if n not in ledger["queries"] and n not in window:
            errors.append(f"new query {n!r} must debut inside the driver window")
    # (2) fn/oracle fingerprint drift in-window
    for n, row in ledger["queries"].items():
        if n in fps and fps[n] != row["fp"] and n not in window:
            errors.append(
                f"{n!r}: fn/oracle changed since its last driver grade "
                f"(r{row['last_graded']}) but is outside the window"
            )
    # (3) changed package modules have an in-window representative
    current_mods = module_digests()
    imports = registry_module_imports()
    for rel, digest in current_mods.items():
        if ledger["modules"].get(rel) == digest:
            continue
        affected = {
            n
            for n in order
            if defining.get(n) in imports and rel in imports[defining[n]]
        }
        if affected and not (affected & window):
            errors.append(
                f"module {rel} changed since ledger snapshot but no affected "
                f"query is in the driver window"
            )
    return errors


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "check"
    if cmd == "rebuild":
        rebuild()
        return 0
    errors = check()
    for e in errors:
        print(f"LEDGER: {e}")
    print("ledger check:", "OK" if not errors else f"{len(errors)} violations")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
