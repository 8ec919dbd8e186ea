"""Skew mitigation utilities — the manual salting technique for the hot
keys AQE's runtime skew-join splitting can't always save (e.g. a
broadcast-ineligible dimension joined on a power-law key, or a
high-cardinality-state aggregate like collect_list where map-side
partial aggregation doesn't shrink the hot key's state).

Session defaults already enable AQE skew handling
(photon_spark/session.py: spark.sql.adaptive.skewJoin.enabled); these
helpers are for the cases where the salt must be in the PLAN: AQE splits
a skewed shuffle partition only for sort-merge joins after stats are
known, while salting rewrites the key space so no partition is ever
skewed in the first place.

Both helpers are value-transparent: results equal the unsalted form
row-for-row (pinned in tests on a constructed power-law key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default salt fan-out — bounds any one key's share of a reduce task to
#: ~1/SALT of its rows
DEFAULT_SALT = 16


def salted_join(big: DataFrame, small: DataFrame, on: str,
                salt: int = DEFAULT_SALT, how: str = "inner") -> DataFrame:
    """Equi-join where ``big``'s hot keys are spread across ``salt``
    sub-keys: big rows get a deterministic salt from their full row hash,
    small rows replicate ``salt``× (one per salt value), and the join key
    becomes (key, salt). A key holding 40% of the table now occupies at
    most ~40/salt % of any reduce task.

    Cost model: replicating ``small`` salt× is the price — use only when
    ``small`` is too big to broadcast outright but salt×|small| still
    shuffles cheaper than the hot key's skew stalls the stage. Result is
    row-identical to ``big.join(small, on, how)`` (salt columns are
    internal and dropped)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    bcols, scols = big.columns, [c for c in small.columns if c != on]
    # deterministic per-row salt: stable across retries (a random salt
    # would break task re-execution determinism)
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in bcols]),
                        F.lit(salt)).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    j = b.join(s, [on, "_salt"], how)
    return j.select(*bcols, *scols)


def salted_collect_list(df: DataFrame, key: str, value: str | Column,
                        salt: int = DEFAULT_SALT,
                        sorted_lists: bool = False) -> DataFrame:
    """groupBy(key).collect_list(value) for skewed keys: aggregate per
    (key, salt) first — each partial list is ≤ ~1/salt of the hot key's
    rows — then merge the ≤ ``salt`` partial lists per key with flatten.
    Map-side partial aggregation can't shrink collect_list state, so a
    hot key otherwise concentrates its entire list in one task; salting
    caps per-task state.

    The salt mixes the value hash with ``spark_partition_id()`` so
    duplicate (key, value) rows spread across salt buckets instead of
    all hashing to one (a value hash alone gives a hot key with a
    low-cardinality value column no relief); still deterministic under
    task retry (a retried task re-reads the same input split, so its
    partition id is stable).

    ``sorted_lists``: sort each final list by the value's natural
    ordering (struct values compare field-by-field in declaration
    order — put the sort key first). Without it list order is
    partition-dependent, exactly as with plain collect_list."""
    v = F.col(value) if isinstance(value, str) else value
    d = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(key), v.cast("string"),
                                   F.spark_partition_id()),
                        F.lit(salt)).cast("int"))
    part = (d.groupBy(key, "_salt")
             .agg(F.collect_list(v).alias("_part")))
    merged = (part.groupBy(key)
                  .agg(F.flatten(F.collect_list("_part")).alias("values")))
    if sorted_lists:
        merged = merged.select(
            key, F.array_sort("values").alias("values"))
    return merged
