"""Anti-pattern sweep over the ENTIRE registry: every non-streaming
query's executed plan must be free of the two shapes that cannot
survive 100 TB -- a cartesian product over data and row-at-a-time
Python evaluation (``BatchEvalPython``; Arrow-vectorized
``ArrowEvalPython``/``MapInPandas`` are the sanctioned Python path).

Per-query audits assert the POSITIVE shape (broadcasts, pruned scans);
this sweep is the safety net that no future query regresses the
baseline rules.  Streaming queries are skipped (building them drains
real streams; their shapes are asserted in test_streaming.py), as are
the BPE queries whose construction runs training collects -- their
plans are audited in test_plans.py.
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"

_SKIP_PREFIXES = ("stream_",)
# construction cost, not plan risk: plans audited in their own tests
_SKIP_EXACT = {"text_bpe_train", "text_bpe_encode", "curation_full_set",
               "curation_incremental_set"}


def test_no_cartesian_or_row_python_in_any_query_plan(spark):
    import __spark_entry__ as e

    qs = e.queries()
    names = [
        n
        for n in qs
        if not n.startswith(_SKIP_PREFIXES) and n not in _SKIP_EXACT
    ]
    offenders = {}
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        bad = []
        if "CartesianProduct" in plan:
            bad.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            bad.append("BatchEvalPython (row-at-a-time Python UDF)")
        if bad:
            offenders[name] = bad
    assert not offenders, offenders
