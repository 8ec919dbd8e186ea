"""Shared plan helpers for the function library."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
