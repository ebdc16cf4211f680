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
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return float(v)
        if hasattr(v, "isoformat"):  # datetime/date
            return v.isoformat().replace("+00:00", "")
        if isinstance(v, (list, tuple)):
            return tuple(norm_cell(x) for x in v)
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).hex()
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
        import numpy as np
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return float(v)
        if isinstance(v, np.bool_):
            return bool(v)
        return v

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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from airflow_pipeline_text_processing_spark.session import get_spark

    spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed, passed, rows_only = [], [], []
    for name, fn in queries.items():
        if only and name not in only:
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
    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(rows_only)} rows-only")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
