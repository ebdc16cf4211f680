#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` against its
``oracle_sql()`` via DuckDB on the same parquet tables, then compares
row count, column names, and values (columns sorted by name, rows sorted,
exact equality after light normalization).  If this passes with *exact*
equality, any order-insensitive value hash the driver computes passes too.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm_cell(v):
        # DTYPE-SENSITIVE: int and float are distinct even when numerically
        # equal -- the driver hashes the rendered frame, where DuckDB HUGEINT
        # becomes float64 ("1.0") vs Spark int64 ("1").  Collapsing them here
        # is exactly the gate hole that let round-1's 5 hash-fails through.
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return ("f", float(v))
        if hasattr(v, "isoformat"):  # datetime/date
            return ("t", v.isoformat().replace("+00:00", ""))
        if isinstance(v, (list, tuple)):
            return ("a", tuple(norm_cell(x) for x in v))
        if isinstance(v, (bytes, bytearray)):
            return ("b", bytes(v).hex())
        import decimal
        if isinstance(v, decimal.Decimal):
            return ("f", float(v))
        import numpy as np
        if isinstance(v, np.integer):
            return ("i", int(v))
        if isinstance(v, np.floating):
            return ("f", float(v))
        if isinstance(v, (bool, np.bool_)):
            return ("z", bool(v))
        if isinstance(v, (int,)):
            return ("i", int(v))
        return ("s", str(v))

    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    # keep rows as python tuples: round-tripping through a DataFrame would
    # turn None back into NaN in numeric columns and break NULL comparison
    return sorted(df.columns), rows


def compare(name: str, spark_df, oracle_df) -> list[str]:
    issues = []
    (cols_a, a), (cols_b, b) = normalize(spark_df), normalize(oracle_df)
    if cols_a != cols_b:
        issues.append(f"columns differ: spark={cols_a} oracle={cols_b}")
        return issues
    if len(a) != len(b):
        issues.append(f"row count differs: spark={len(a)} oracle={len(b)}")
        return issues
    for i in range(len(a)):
        ra, rb = a[i], b[i]
        if ra != rb:
            issues.append(f"row {i} differs:\n  spark : {ra}\n  oracle: {rb}")
            if len(issues) >= 4:
                issues.append("...")
                break
    return issues


_CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".oracle_cache.json")


def _fingerprints(entrymod) -> dict:
    """Per-query change fingerprint for ``--changed`` mode: md5 of the
    query's DEFINING registry-module file PLUS every registry file in its
    transitive import closure + its oracle SQL + a digest of every package
    module outside the registry files.  The import closure (shared with
    tools/ledger.py) closes the ADVICE r9 hole: queries_scale.py imports
    DataFrame helpers (_t, _tspread, _money_sum) from queries.py, so an
    edit to queries.py must also invalidate the cached green results of
    every registry module that imports it, not just queries.py's own
    entries.  Editing any operator/source module still conservatively
    re-runs everything (the non-registry digest covers those)."""
    import hashlib
    import inspect

    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(repo_dir, "airflow_pipeline_text_processing_spark")
    sys.path.insert(0, os.path.join(repo_dir, "tools"))
    import ledger

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()

    registry_files = set()
    for fn in queries.values():
        try:
            # unwrap: registry fns are residue-scoped (functools.wraps)
            # since r15; the fingerprint must track the DEFINING module,
            # not the wrapper's (session.py)
            registry_files.add(
                os.path.abspath(inspect.getfile(inspect.unwrap(fn)))
            )
        except TypeError:
            pass
    shared = hashlib.md5()
    file_digest = {}
    for root, _dirs, files in os.walk(pkg_dir):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            with open(path, "rb") as fh:
                data = fh.read()
            if os.path.abspath(path) in registry_files:
                file_digest[os.path.abspath(path)] = hashlib.md5(data).hexdigest()
            else:
                shared.update(data)
    shared_hex = shared.hexdigest()

    # registry-relpath -> transitive import closure (registry relpaths incl.
    # itself); non-registry imports are already in the shared digest.
    closure = ledger.registry_module_imports()

    def _closure_hex(abspath: str) -> str:
        rel = os.path.relpath(abspath, repo_dir)
        deps = sorted(closure.get(rel, {rel}))
        return "|".join(
            file_digest.get(os.path.join(repo_dir, d), "") for d in deps
        )

    out = {}
    for name, fn in queries.items():
        try:
            mod_hex = _closure_hex(
                os.path.abspath(inspect.getfile(inspect.unwrap(fn)))
            )
        except TypeError:
            mod_hex = repr(fn)
        out[name] = hashlib.md5(
            (shared_hex + mod_hex + oracles.get(name, "")).encode()
        ).hexdigest()
    return out


def main() -> int:
    import json

    args = [a for a in sys.argv[1:] if a != "--changed"]
    changed_only = "--changed" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod

    fps = _fingerprints(entrymod)
    cache = {}
    if changed_only and os.path.exists(_CACHE_PATH):
        with open(_CACHE_PATH) as fh:
            cache = json.load(fh).get(sf_dir, {})

    # VANILLA session on purpose: the driver harness builds a bare
    # SparkSession with none of session.py's confs, so the local gate must
    # too -- otherwise conf-dependent reads (events nanos) pass locally and
    # fail under the driver (round-1 post-mortem, VERDICT.md #4).
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-oracle-vanilla")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed, passed, rows_only = [], [], []
    skipped = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if changed_only and cache.get(name) == fps[name]:
            skipped += 1
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            rows_only.append((name, len(sdf)))
            print(f"~ {name}: rows-only ({len(sdf)} rows)")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        issues = compare(name, sdf, odf)
        if issues:
            failed.append(name)
            print(f"✗ {name}")
            for msg in issues:
                print(f"    {msg}")
        else:
            passed.append(name)
            print(f"✓ {name} ({len(sdf)} rows)")
    suffix = f", {skipped} unchanged-skipped" if changed_only else ""
    print(
        f"\n{len(passed)} passed, {len(failed)} failed, "
        f"{len(rows_only)} rows-only{suffix}"
    )
    # record green fingerprints so --changed skips them until they change
    # (MERGED into the stored map -- a name-filtered run must not clobber
    # other queries' entries); failed names are evicted.  A FULL run (no
    # --changed, no name filter) still validates everything and must
    # remain the end-of-round gate.
    stored = {}
    if os.path.exists(_CACHE_PATH):
        with open(_CACHE_PATH) as fh:
            stored = json.load(fh)
    merged = dict(stored.get(sf_dir, {}))
    for name in passed + [n for n, _ in rows_only]:
        merged[name] = fps[name]
    for name in failed:
        merged.pop(name, None)
    stored[sf_dir] = merged
    with open(_CACHE_PATH, "w") as fh:
        json.dump(stored, fh)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
