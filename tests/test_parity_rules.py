"""Executable pins for the cross-engine parity rules the oracle suite
rests on (documented in queries.py / BASELINE.md). If any of these break —
a Spark upgrade changing round semantics, a DuckDB regex flavor change —
every downstream hash gate becomes untrustworthy, so they are pinned here
as facts, not folklore."""

from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from pyspark.sql import functions as F

#: boundary doubles: exact ties, shortest-repr traps, negatives
BOUNDARY = [0.5, 1.5, 2.5, -0.5, -2.5, 0.49999999999999994,
            0.77031249999999994, 14.499999999999996, 0.1234565,
            -0.1234565, 123456.4999999999, 0.0, 1e-9]


@pytest.mark.parametrize("nd", [0, 2, 6])
def test_spark_round_equals_duckdb_round(spark, nd):
    # Spark F.round (BigDecimal HALF_UP on the shortest decimal repr) ==
    # DuckDB round (ties away from zero on the binary double), on every
    # boundary class we rely on — including negatives.
    df = spark.createDataFrame([(x,) for x in BOUNDARY], "x double")
    got = [r[0] for r in df.select(F.round("x", nd)).collect()]
    want = [duckdb.sql(f"SELECT round({x!r}::DOUBLE, {nd})").fetchone()[0]
            for x in BOUNDARY]
    assert got == want


def test_decimal_repr_rule_matches_spark_round(spark):
    # The Python-side twin used inside reducers/UDFs:
    # Decimal(repr(x)).quantize(HALF_UP) == Spark F.round(x) — the
    # shortest-repr rule from the fold/oracle parity notes.
    df = spark.createDataFrame([(x,) for x in BOUNDARY], "x double")
    got = [r[0] for r in df.select(F.round("x", 6)).collect()]
    want = [float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                            ROUND_HALF_UP))
            for x in BOUNDARY]
    assert got == want


def test_md5_identical_across_engines(spark):
    vals = ["", "a", "strat:123", "hello world", "0:the cat sat"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r[0] for r in df.select(F.md5("v")).collect()]
    import hashlib
    py = [hashlib.md5(v.encode()).hexdigest() for v in vals]
    duck = [duckdb.sql(f"SELECT md5({v!r})").fetchone()[0] for v in vals]
    assert got == py == duck


def test_ascii_whitespace_split_parity(spark):
    # Java \s (ASCII) == DuckDB RE2 \s (ASCII); the unicode NBSP must NOT
    # split in either engine (Python re needs the explicit ASCII class).
    s = "a b\tc\xa0d"  # tab splits, NBSP must not
    got = spark.createDataFrame([(s,)], "t string").select(
        F.split(F.col("t"), r"\s+")).first()[0]
    duck = duckdb.execute(
        "SELECT regexp_split_to_array(?, '\\s+')", [s]).fetchone()[0]
    assert got == duck == ["a", "b", "c\xa0d"]
