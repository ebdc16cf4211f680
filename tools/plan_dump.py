#!/usr/bin/env python
"""Dump ``explain('formatted')`` for named registry queries to files.

Round-15 deliverable support: the optimization judge checks plan claims
(Exchange counts, join strategies, PushedFilters, BatchEvalPython nodes)
against committed ``plans/r15/<query>_{before,after}.txt`` files.

Usage:
    python tools/plan_dump.py --out plans/r15 --suffix before q1 q2 ...

Each query's plan is captured from a fresh plan build (``fn(spark,
sf_dir)``) WITHOUT executing the terminal action, except where the query
function itself materializes state at plan time (model training, index
builds, stream drains) -- those run as they would in any caller.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="plans/r15")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from __spark_entry__ import REGISTRY

    from airflow_pipeline_text_processing_spark.session import get_spark

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(os.path.join(REPO, args.out), exist_ok=True)
    names = (
        list(REGISTRY) if args.queries == ["ALL"] else args.queries
    )
    for name in names:
        fn, _ = REGISTRY[name]
        path = os.path.join(REPO, args.out, f"{name}_{args.suffix}.txt")
        try:
            df = fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 -- record, keep dumping
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}"
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
