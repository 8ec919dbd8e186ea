"""Gap-based sessionization over an ordered event stream.

A session = a maximal run of a key's events where consecutive gaps are ≤
``gap_ns``. This is the standard training-pipeline primitive for turning an
event log into behavioural units (and the photon analogue of a per-stream
ordered scan, streams.clj:340-366, with a derived grouping).

Scale design: ONE shuffle, on the session key — the lag and the running sum
share partitioning and ordering, so Catalyst plans one Exchange + one
in-partition sort and both Window operators consume the same sorted run
(pinned in tests/test_pipeline.py). Key cardinality (stream × user) is high, so
partitions balance; no global sort, no driver state. At 100 TB the same
plan holds — sessionization cost is the one keyed shuffle, which is the
information-theoretic floor for this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: default gap: 24 h in nanoseconds (event_time is an epoch-ns long).
DEFAULT_GAP_NS = 24 * 3600 * 1_000_000_000


def sessionize(df: DataFrame, key_cols: list[str], ts_col: str = "ts",
               tiebreak_col: str | None = None,
               gap_ns: int = DEFAULT_GAP_NS) -> DataFrame:
    """Append an integer ``session_idx`` (1-based per key) to ``df``.

    Ordering within a key is (ts, tiebreak) — the tiebreak makes the fold
    deterministic when timestamps collide. Integer ns arithmetic keeps the
    gap test exact (double division of epoch-ns loses precision past 2^53).
    """
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    gap = F.col(ts_col) - F.lag(ts_col).over(w)
    is_new = F.when(gap.isNull() | (gap > F.lit(gap_ns)), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_idx", F.sum(is_new).over(run))


def session_bounds(df: DataFrame, key_cols: list[str], ts_col: str = "ts",
                   tiebreak_col: str | None = None,
                   gap_ns: int = DEFAULT_GAP_NS) -> DataFrame:
    """One row per session: key cols + session_idx, n_events, start/end ts.

    The per-session aggregate groups on a superset of the window key, so
    the partial (map-side) aggregation collapses each session locally
    before the second, much smaller shuffle.
    """
    s = sessionize(df, key_cols, ts_col, tiebreak_col, gap_ns)
    return (s.groupBy(*key_cols, "session_idx")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.min(ts_col).alias("start_ts"),
                  F.max(ts_col).alias("end_ts")))
