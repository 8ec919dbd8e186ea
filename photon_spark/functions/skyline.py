"""Distributed 2-D skyline (Pareto front) — the multi-objective
"best trade-offs" operator relational engines ship as SKYLINE OF.

Semantics (minimize both axes): a row p survives iff no row q STRICTLY
dominates it, i.e. no q with (q.x <= p.x AND q.y <= p.y) and at least
one strict inequality. Rows with identical (x, y) never dominate each
other, so duplicate optimal points all survive — matching the standard
NOT EXISTS spec the DuckDB oracle states directly.

Scale design — the classic two-phase plan:

1. LOCAL skyline per input partition (one Arrow/pandas pass, a sort +
   linear scan; no shuffle, no Python-per-row). A partition's skyline
   is a superset filter: anything dominated locally is dominated
   globally, so phase 1 only discards. The survivor count per
   partition is bounded by the number of distinct x values on the
   front, which for real distributions is tiny relative to the data.
2. GLOBAL skyline over the union of local skylines — a relation of at
   most n_partitions x |local front| rows, evaluated with two Catalyst
   windows: per-x group minimum of y, and the running minimum of y
   over STRICTLY smaller x (RANGE ... 1 PRECEDING on the integer x).
   The unpartitioned window is deliberate and bounded: its input is
   the phase-1 candidate set, never the raw relation.

The sort+scan rule used in both phases: after ordering by (x asc),
p survives iff y == min(y | same x) AND y < min(y | x' < x). That is
exactly strict dominance — a dominator with smaller x is caught by the
running minimum, a dominator at equal x by the group minimum, and
equal points survive together.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

_INT_TYPES = (ByteType, ShortType, IntegerType, LongType)


def _require_integer_axes(df: DataFrame, x: str, y: str) -> None:
    """Both skyline axes must be INTEGRAL. This is a semantic contract,
    not a convenience: the global pass expresses "strictly smaller x" as
    ``RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING``, which on a
    float x misses a dominator with 0 < dx < 1 (a strictly dominated row
    would silently survive), and the local pass keeps its running-min
    lag exact through a nullable Int64 cast that refuses non-integral
    floats. Quantize float axes upstream (e.g. integer cents, epoch-ns)
    — which is also what makes the result engine-portable at 6dp."""
    by_name = {f.name: f.dataType for f in df.schema.fields}
    for axis, col in (("x", x), ("y", y)):
        dt = by_name.get(col)
        if dt is None:
            raise ValueError(f"skyline: column {col!r} not in relation")
        if not isinstance(dt, _INT_TYPES):
            raise TypeError(
                f"skyline: {axis} axis {col!r} has type {dt.simpleString()}"
                " — both axes must be integral (byte/short/int/long); "
                "quantize floats upstream (cents, epoch-ns, 6dp grid)")


def local_skyline(df: DataFrame, x: str, y: str) -> DataFrame:
    """Phase 1: per-partition skyline (minimize ``x`` and ``y``).
    Map-only — output schema equals input schema. Integer axes only
    (see :func:`_require_integer_axes`)."""
    _require_integer_axes(df, x, y)
    schema = df.schema
    xn, yn = x, y

    def scan(batches: Iterator) -> Iterator:
        import pandas as pd

        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        if pdf.empty:
            yield pdf
            return
        p = pdf.sort_values([xn, yn], kind="mergesort")
        grp_min = p.groupby(xn)[yn].transform("min")
        per_x_min = p.groupby(xn, sort=True)[yn].min()
        # shift(1) on an int64 Series would promote to float64 and
        # collapse values past 2^53 (epoch-ns axes live there), turning
        # the strict < into a false equality and dropping true front
        # members; the nullable Int64 dtype keeps the lag exact
        prev_min = per_x_min.cummin().astype("Int64").shift(1)
        prev = p[xn].map(prev_min)
        keep = (p[yn] == grp_min) & (prev.isna()
                                     | (p[yn] < prev.fillna(0)))
        yield p[keep]

    return df.mapInPandas(scan, schema=schema)


def skyline_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Full two-phase distributed skyline, minimizing ``x`` and ``y``
    (negate a column upstream to maximize it). BOTH axes must be
    INTEGRAL — the global pass expresses strict x-dominance as a
    ``RANGE ... 1 PRECEDING`` frame, which is only "strictly smaller"
    on an integer axis (validated up front; quantize floats upstream)."""
    _require_integer_axes(df, x, y)
    cand = local_skyline(df, x, y)
    w_same = Window.partitionBy(x)
    w_prev = (Window.orderBy(F.asc(x))
              .rangeBetween(Window.unboundedPreceding, -1))
    min_same = F.min(y).over(w_same)
    min_prev = F.min(y).over(w_prev)
    return (cand.withColumn("__ms", min_same)
                .withColumn("__mp", min_prev)
                .where((F.col(y) == F.col("__ms"))
                       & (F.col("__mp").isNull()
                          | (F.col(y) < F.col("__mp"))))
                .drop("__ms", "__mp"))
