"""Data-quality operators: table profiling and expectation validation.

A training-data pipeline gates every ingest on two questions -- "what does
this data look like?" (profiling) and "does it satisfy the contract?"
(expectations).  Both operators answer them in ONE aggregation pass over
the table (a single shuffle-free partial+final agg), emitting a long-format
result that is stable to compare across snapshots and engines.

Scale notes: ``profile_table`` defaults to the HLL++ sketch for distinct
counts (bounded state; ``exact=True`` switches to ``count_distinct``, which
compiles to an Expand of |columns| copies through one shuffle -- the
verifier path, not the 100 TB path).  ``validate_expectations`` evaluates
every rule as a codegen-resident conditional sum, so adding rules adds
columns to one aggregate, never extra scans.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _check_names(kind: str, names: Sequence[str]) -> None:
    """Both operators unpivot through a ``selectExpr(stack(...))`` string;
    an empty list builds malformed ``stack(0, )`` SQL and a quote/backtick
    in a name breaks out of its literal.  Fail fast with a real message
    instead of an opaque parse error."""
    if not names:
        raise ValueError(f"at least one {kind} is required")
    for name in names:
        if "'" in name or "`" in name:
            raise ValueError(
                f"{kind} name {name!r} must not contain quotes or backticks"
            )


def profile_table(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    exact: bool = False,
) -> DataFrame:
    """Per-column profile: ``column_name, n_rows, n_nonnull, n_nulls,
    n_distinct, min_value, max_value`` (min/max rendered as strings so one
    schema fits every column type).

    One aggregation over the table computes all columns' statistics; the
    wide single-row result is then unpivoted driver-free via ``stack``.
    """
    cols = list(cols or df.columns)
    _check_names("column", cols)
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        distinct = (
            F.count_distinct(F.col(c)) if exact else F.approx_count_distinct(c)
        )
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nonnull"),
            distinct.alias(f"{c}__distinct"),
            # min/max in the column's NATIVE order, rendered to string
            # afterwards (casting first would compare lexicographically)
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__nonnull`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return (
        row.selectExpr(
            "__n AS n_rows",
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nonnull, n_distinct, min_value, max_value)",
        )
        .select(
            "column_name",
            "n_rows",
            "n_nonnull",
            (F.col("n_rows") - F.col("n_nonnull")).alias("n_nulls"),
            "n_distinct",
            "min_value",
            "max_value",
        )
        .orderBy("column_name")
    )


def validate_expectations(
    df: DataFrame,
    rules: Sequence[Tuple[str, Column]],
) -> DataFrame:
    """Row-level contract checks: for each ``(rule_name, predicate)`` emit
    ``rule_name, n_rows, n_violations, passed``.

    A NULL predicate result counts as a violation (the conservative
    reading: an unevaluable contract is a broken contract).  All rules run
    in one aggregation pass.
    """
    _check_names("rule", [name for name, _ in rules])
    aggs = [F.count("*").alias("__n")] + [
        F.sum(
            F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
        ).alias(f"{name}__v")
        for name, cond in rules
    ]
    row = df.agg(*aggs)
    stack_args = ", ".join(f"'{name}', `{name}__v`" for name, _ in rules)
    return (
        row.selectExpr(
            "__n AS n_rows",
            f"stack({len(rules)}, {stack_args}) AS (rule_name, n_violations)",
        )
        .select(
            "rule_name",
            "n_rows",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
        .orderBy("rule_name")
    )
