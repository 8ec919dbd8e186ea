"""As-of (backward-looking temporal) join.

The reference has no joins at all (SURVEY.md §2.8 — nothing in
/root/reference/src joins two streams), but correlating an event with the
most recent prior event of another stream is the first thing a feature /
training-data pipeline does over an event log, and Spark has no native
as-of join. This implements it Spark-first.

Design (the 100 TB shape): a naive formulation is a range join —
``l JOIN r ON key AND r.ts <= l.ts`` + argmax — which Catalyst executes as
a broadcast-nested-loop or a per-key explosion (O(n·m) within key). Instead
we UNION the two sides with a side tag and take a running
``last(right_struct, ignorenulls=True)`` over
``Window.partitionBy(keys).orderBy(ts, side, tiebreak)``:

* exactly ONE hash shuffle on the join keys + one sort — identical cost to
  a single window aggregation, linear in |l| + |r|;
* no row amplification ever, regardless of match density;
* the right row travels as ONE struct column, so right rows whose payload
  fields are legitimately NULL still match (``last(ignorenulls)`` skips
  only rows where the struct itself is NULL, i.e. left rows).

Skew note: all events of one join key sort within one partition — inherent
to per-key ordering semantics (same bound as photon's per-stream serial
order, streams.clj:288-301). For a pathological hot key, pre-split by a
time-bucket salt and stitch bucket boundaries; not needed for the driver
datasets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_R = "__asof_right"


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str | None = None,
              right_cols: list[str] | None = None,
              strict: bool = False,
              tiebreak: str | None = None) -> DataFrame:
    """For every left row, attach the latest right row of the same key with
    ``right_ts <= left_ts`` (``<`` when ``strict``). Left outer: unmatched
    left rows keep NULL right columns.

    Returns left's columns plus ``right_cols`` (each aliased
    ``asof_<name>``) and ``asof_ts`` = the matched right timestamp.

    ``tiebreak``: optional right column ordering equal-timestamp right rows
    (last one wins); required for determinism when right timestamps can
    collide within a key.
    """
    right_ts = right_ts or left_ts
    right_cols = right_cols or [c for c in right.columns
                                if c not in on and c != right_ts]

    left_keep = [c for c in left.columns if c not in on and c != left_ts]
    r_struct = F.struct(F.col(right_ts).cast("long").alias("ts"),
                        *[F.col(c) for c in right_cols])

    # Side ordering at equal ts decides <= vs <: inclusive → right rows
    # sort BEFORE left rows so an equal-ts right row is inside the left
    # row's frame; strict → after, so it is excluded.
    r_side, l_side = (0, 1) if not strict else (1, 0)

    l_u = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).cast("long").alias(_TS),
        F.lit(l_side).alias(_SIDE),
        F.lit(None).cast("long").alias("__tb"),
        F.lit(None).cast(
            "struct<ts:long," + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}"
                for c in right_cols) + ">").alias(_R),
        *[F.col(c) for c in left_keep])
    r_u = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).cast("long").alias(_TS),
        F.lit(r_side).alias(_SIDE),
        (F.col(tiebreak).cast("long") if tiebreak
         else F.lit(0).cast("long")).alias("__tb"),
        r_struct.alias(_R),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_keep])

    w = (Window.partitionBy(*on).orderBy(_TS, _SIDE, "__tb")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (l_u.unionByName(r_u)
               .withColumn(_R, F.last(_R, ignorenulls=True).over(w))
               .where(F.col(_SIDE) == l_side))

    return matched.select(
        *[F.col(c) for c in on],
        F.col(_TS).alias(left_ts),
        *[F.col(c) for c in left_keep],
        F.col(f"{_R}.ts").alias("asof_ts"),
        *[F.col(f"{_R}.{c}").alias(f"asof_{c}") for c in right_cols])
