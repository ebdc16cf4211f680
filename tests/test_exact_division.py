"""Regression lock for the exact-floor-division convention.

The repo's fixed-point operators floor-divide scaled BIGINTs whose
magnitudes can exceed 2^53, where float64 stops representing integers
exactly -- and the engines disagree on a double->BIGINT cast (Spark
truncates, DuckDB rounds).  A self-review in round 10 found several
sites using `(num - pmod(num, den)) / den` (a FLOAT division of an
exact multiple); they now use Spark `div` / DuckDB `//`.  These tests
pin the device itself past 2^53 on both engines so the float form
cannot silently return.
"""

from __future__ import annotations

import duckdb

# 2^53 + 3: the smallest awkward neighborhood -- (2^53+3)*3 is an exact
# multiple of 3 that float64 cannot represent
BIG = (1 << 53) + 3
CASES = [
    (BIG * 3, 3),            # positive, past 2^53
    (-BIG * 3, 3),           # negative exact multiple
    (BIG * 3 + 2, 3),        # positive with remainder
    (-(BIG * 3) - 2, 3),     # negative with remainder (floor != trunc)
    ((1 << 61) + 7, 1000),   # near the int64 ceiling
]


def _py_floor(num: int, den: int) -> int:
    return num // den  # python floors -- the reference semantics


def test_spark_div_device_is_exact_past_2_53(spark):
    df = spark.createDataFrame(CASES, "num long, den long")
    rows = df.selectExpr(
        "num", "den", "(num - pmod(num, den)) div den AS q"
    ).collect()
    for r in rows:
        assert r.q == _py_floor(r.num, r.den), (r.num, r.den)


def test_spark_float_division_would_fail_here():
    # documents WHY the convention exists: float64 cannot express the
    # quotient's neighborhood, so the old `/`-based device is off by one
    num, den = BIG * 3, 3
    assert int(float(num) / den) != num // den


def test_duckdb_floor_device_is_exact_past_2_53():
    con = duckdb.connect()
    for num, den in CASES:
        q = con.execute(
            f"SELECT (num - ((num % den) + den) % den) // den"
            f" FROM (SELECT CAST({num} AS BIGINT) AS num,"
            f" CAST({den} AS BIGINT) AS den)"
        ).fetchone()[0]
        assert q == _py_floor(num, den), (num, den)


def test_duckdb_float_slash_diverges_from_spark_trunc():
    # the cross-engine hazard the fix removes: DuckDB CAST(DOUBLE AS
    # BIGINT) rounds half-even while Spark cast(double as long)
    # truncates -- on a quotient float64 can't represent, the two
    # engines would disagree
    con = duckdb.connect()
    num, den = BIG * 3, 3
    via_float = con.execute(
        f"SELECT CAST(CAST({num} AS BIGINT) / CAST({den} AS BIGINT)"
        f" AS BIGINT)"
    ).fetchone()[0]
    assert via_float != num // den  # the float path IS wrong here
