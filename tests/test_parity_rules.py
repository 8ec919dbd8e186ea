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


def test_trim_strips_spaces_only(spark):
    # Both engines' trim() strips the SPACE character only — a leading tab
    # survives, producing a leading empty token after the \s+ split. This
    # is the rule text_profile's Python twin mirrors with strip(' ').
    s = "\tfoo bar\n"
    got = spark.createDataFrame([(s,)], "t string").select(
        F.trim(F.col("t"))).first()[0]
    duck = duckdb.execute("SELECT trim(?)", [s]).fetchone()[0]
    assert got == duck == "\tfoo bar\n"


def test_duckdb_re2_vertical_tab_gap():
    # Known, documented divergence: RE2's \s = [ \t\n\f\r] EXCLUDES \x0b,
    # while Java/Python-ASCII \s includes it. Oracle-gated text therefore
    # must not contain \x0b (the synthetic corpus doesn't); everything
    # else in the ASCII whitespace class agrees. Pinned so an engine
    # upgrade that closes (or widens) the gap is noticed.
    assert duckdb.execute(
        "SELECT regexp_split_to_array(?, '\\s+')",
        ["a\x0bb"]).fetchone()[0] == ["a\x0bb"]
    assert duckdb.execute(
        "SELECT regexp_split_to_array(?, '\\s+')",
        ["a\fb"]).fetchone()[0] == ["a", "b"]


def test_python_log_equals_duckdb_ln_bitwise():
    # Python's math.log and DuckDB's ln are the same glibc libm call —
    # bitwise equal on every N/df ratio the tf-idf operators produce.
    # (java.lang.Math.log is NOT: it differs by 1 ulp on some arguments,
    # which is why quality.tfidf_top_terms computes idf Python-side.)
    import math
    import struct
    for n in (500, 5000):
        duck = [r[0] for r in duckdb.sql(
            f"SELECT ln({n} * 1.0 / i) "
            f"FROM generate_series(1, {n}) t(i)").fetchall()]
        py = [math.log(n * 1.0 / i) for i in range(1, n + 1)]
        assert all(struct.pack("d", a) == struct.pack("d", b)
                   for a, b in zip(py, duck))


def test_text_profile_duckdb_parity_edge_whitespace(spark):
    # Full-profile three-way check on edge-whitespace docs: the shipped
    # mapInPandas profile == the SQL_TEXT_PROFILE oracle, row for row
    # (\x0b excluded per the RE2 gap above).
    import pandas as pd

    from photon_spark.functions import text
    from photon_spark.queries_northstar import SQL_TEXT_PROFILE
    from tests.test_northstar import EDGE_WS_DOCS

    docs = [(i, t) for i, t in enumerate(EDGE_WS_DOCS) if "\x0b" not in t]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fast = sorted(tuple(r) for r in text.text_profile(df).collect())
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs, columns=["doc_id", "text"]))
    oracle = sorted(tuple(r) for r in con.execute(SQL_TEXT_PROFILE).fetchall())
    assert fast == oracle


def test_no_engine_private_types_in_any_oracle(sf_dir):
    # Round-3 postmortem (VERDICT.md): every driver-red query — and only
    # those — had a DuckDB HUGEINT column in its oracle (SUM(BIGINT)
    # promotes); the driver's hasher canonicalizes HUGEINT differently
    # from int64, so the gate diverged even with identical values. Pin:
    # every ORACLES entry's LIMIT-0 result schema contains only portable
    # types (lint_oracle_types allowlist), so the defect cannot recur.
    from tools.lint_oracle_types import bad_columns, connect

    from photon_spark import queries as q

    con = connect(sf_dir)
    offenders = {}
    for name, sql in q.ORACLES.items():
        bad = bad_columns(con, sql)
        if bad:
            offenders[name] = bad
    assert offenders == {}


def test_lint_flags_complex_typed_output_columns(sf_dir):
    # Round-5 postmortem (VERDICT.md): `user_journeys` returned a raw
    # array<string> column; the driver's canonicalizer sorts raw columns
    # with pandas and died with `unhashable type: 'list'` — a red gate
    # row for a correct answer. Pin: the lint flags ANY top-level
    # complex-typed output column (even with fully portable element
    # types), so the next array-returning query fails locally before it
    # ever reaches a driver window.
    from tools.lint_oracle_types import bad_columns, connect

    con = connect(sf_dir)
    for sql, col in [
        ("SELECT 1 AS ok, ['a', 'b'] AS seq", "seq"),          # LIST
        ("SELECT {'a': 1} AS st", "st"),                       # STRUCT
        ("SELECT map(['k'], [1]) AS m", "m"),                  # MAP
        ("SELECT list(event_id) AS ids FROM events", "ids"),   # agg list
    ]:
        bad = bad_columns(con, sql)
        assert [c for c, _ in bad] == [col], (sql, bad)
        assert "driver-unhashable" in bad[0][1]
    # scalar rendering of the same data passes
    assert bad_columns(
        con, "SELECT array_to_string(['a', 'b'], '>') AS seq") == []


def test_gate_window_covers_unverified_backlog():
    # The driver hash-checks only the FIRST 50 registry entries per
    # round. Invariant: every query never seen green in a driver
    # CORRECTNESS file must sit inside the window (or be explicitly
    # parked in _DEFER_PAST_BACKLOG) — a registry edit that silently
    # pushes an unverified query past position 50 re-opens the
    # five-round trust gap round 6 closed.
    import glob
    import json
    import os

    from photon_spark import queries as q

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    union = set()
    for p in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        try:
            rec = json.load(open(p))
        except Exception:
            continue
        union |= {k for k, v in rec.items()
                  if isinstance(v, dict) and v.get("hash_match")}
    if not union:  # no driver records present (fresh clone)
        return
    order = list(q.QUERIES.keys())
    window = set(order[:50])
    missing = [n for n in order
               if n not in union and n not in window
               and n not in q._DEFER_PAST_BACKLOG]
    assert missing == [], missing
    # deferred entries must still be adjacent to the window, not lost at
    # the registry tail
    for n in q._DEFER_PAST_BACKLOG:
        if n in order:
            assert order.index(n) < 50 + len(q._DEFER_PAST_BACKLOG) + 5, n


def test_gate_window_covers_every_unchecked_query():
    """Registry hygiene guard (round-8): the driver hash-checks only the
    FIRST 50 entries of the registry per round, so a query that has
    never been driver-checked must either sit inside the next window or
    be explicitly deferred — otherwise it can stay unverified forever
    (the round-6 backlog failure mode). Also catches stale names in the
    window-control lists after a rename."""
    from photon_spark import queries as q

    order = list(q.QUERIES)
    window = set(order[:50])
    never = [n for n in order if n not in q._DRIVER_CHECKED]
    stranded = [n for n in never
                if n not in window and n not in q._DEFER_PAST_BACKLOG]
    assert not stranded, (
        f"queries that can never reach the driver's 50-entry window: "
        f"{stranded} — pin them in _NEWEST_FIRST or defer explicitly")
    for lst in (q._NEWEST_FIRST, q._CHANGED_THIS_ROUND,
                q._DEFER_PAST_BACKLOG):
        ghosts = [n for n in lst if n not in q.QUERIES]
        assert not ghosts, f"window-control names not in registry: {ghosts}"
    # a checked name missing from the registry is a rename (bug) unless
    # it was deliberately retired and documented in _RETIRED
    ghosts = [n for n in q._DRIVER_CHECKED
              if n not in q.QUERIES and n not in q._RETIRED]
    assert not ghosts, f"_DRIVER_CHECKED names not in registry: {ghosts}"
    # and a _RETIRED name still in the registry is a stale retirement
    undead = [n for n in q._RETIRED if n in q.QUERIES]
    assert not undead, f"_RETIRED names still gated: {undead}"
