"""Shared plan helpers for the function library."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: superbucket fan-out for exclusive_prefix_offsets: the driver never
#: collects more than this many rows, whatever the bucket count. 16 Ki
#: longs is a sub-MB driver message — far below any driver-memory
#:  hazard — while keeping every test-scale consumer (≤~10k buckets)
#: on the zero-extra-job direct tier; the ~1e5-1e6-bucket 100 TB shapes
#: the tree tier exists for are comfortably above it.
PREFIX_FANOUT = 16384


def exclusive_prefix_offsets(
        totals: DataFrame, bucket_col: str, total_col: str,
        fanout: int = PREFIX_FANOUT) -> tuple[dict | None, DataFrame | None]:
    """EXCLUSIVE prefix sum over per-bucket totals with a driver share
    bounded by the CONSTANT ``fanout`` whatever the bucket count.
    Returns ``(offsets_dict, None)`` or ``(None, offsets_df)``:

    - **≤ fanout buckets** (every test-scale consumer): one bounded
      probe-and-collect (``head(fanout+1)`` — at most that many rows
      ever reach the driver) IS the data; prefix-sum it locally and
      hand the caller the plain dict, so the caller keeps its original
      plan shape (literal map or tiny broadcast relation) with zero
      added exchanges.
    - **> fanout buckets** (~1e5-1e6 at 100 TB): TREE ROLLUP, returned
      as a distributed ``(bucket_col, _offset)`` relation. The totals
      relation is materialized once (eager localCheckpoint — n/W rows,
      small by construction, read by three consumers); buckets group
      into adaptively-wide superbuckets (count ≤ fanout), an ordinary
      window computes the exclusive running sum WITHIN each superbucket
      (parallel, ≤width rows per task), and only the ≤fanout
      superbucket totals reach the driver for the top-level prefix
      before rejoining as a broadcast. The driver never touches the
      per-bucket relation.

    NULL buckets are dropped (callers give NULL-keyed rows NULL
    offsets). Empty input → ``({}, None)``.
    """
    spark = totals.sparkSession
    t = totals.where(F.col(bucket_col).isNotNull())
    # bounded probe-and-collect: ≤ fanout+1 rows ever reach the driver
    head = (t.select(F.col(bucket_col).cast("long").alias("_b"),
                     F.col(total_col).cast("long").alias("_t"))
             .head(fanout + 1))
    if len(head) <= fanout:
        offsets, acc = {}, 0
        for b, tot in sorted((r["_b"], r["_t"]) for r in head):
            offsets[b] = acc
            # an all-NULL value_col bucket sums to NULL — contribute 0,
            # matching the old cumulative_by_bucket driver loop
            acc += tot or 0
        return offsets, None

    # tree tier: materialize totals once; three consumers read it
    t = t.localCheckpoint(eager=True)
    # 1-row bounded collect: the bucket-ordinal RANGE sets the adaptive
    # superbucket width (count ≤ fanout by construction — anchoring at
    # min keeps the bound for negative ordinals too)
    r0 = t.agg(F.min(bucket_col).alias("n"),
               F.max(bucket_col).alias("m")).first()
    mn, mx = int(r0["n"]), int(r0["m"])
    width = max(1, (mx - mn + fanout) // fanout)
    # integer `div`, not `/`: bucket ordinals can be large enough that
    # double-division floor misrounds near exact multiples
    sb = t.withColumn(
        "_sb", F.expr(f"(CAST({bucket_col} AS BIGINT) - {mn}) div {width}"))
    w = (Window.partitionBy("_sb").orderBy(bucket_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    intra = sb.withColumn(
        "_intra", F.coalesce(F.sum(total_col).over(w), F.lit(0)))
    # ≤fanout-row bounded collect: superbucket totals for the top level
    super_tot = sorted(
        (int(r["_sb"]), int(r["_t"] or 0)) for r in
        sb.groupBy("_sb").agg(F.sum(total_col).alias("_t")).collect())
    offs, acc = [], 0
    for s, tot in super_tot:
        offs.append((s, acc))
        acc += tot
    sb_off = spark.createDataFrame(offs, "_sb long, _sb_off long")
    off_df = (intra.join(F.broadcast(sb_off), "_sb")
              .select(F.col(bucket_col).cast("long").alias(bucket_col),
                      (F.col("_intra") + F.col("_sb_off"))
                      .cast("long").alias("_offset")))
    return None, off_df


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Rebalance a DataFrame across the cluster's cores when the source scan
    produced too few partitions (tiny parquet files read as one split, which
    serializes every downstream per-row expression on one core).

    At scale this is a no-op: a 100 TB scan already has thousands of file
    splits, so the condition never triggers and no shuffle is added. The
    shuffle it does add on small inputs moves only the raw input rows —
    always cheaper than single-threading the compute that follows.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
