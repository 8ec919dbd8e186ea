"""Reproducible global training order — the seeded corpus shuffle every
training run needs: a deterministic permutation of the corpus, stable
across engines, partitionings and re-runs, plus the shard/position
assignment a data loader consumes.

Photon's reference has no analogue (its replay order is ingest order,
`/root/reference` events are consumed oldest-first); this is the
training-data-pipeline operator the north-star brief adds on top: "shuffle
the corpus once, reproducibly, then stream shards in order".

Order contract: documents are ordered by ``md5(seed ':' id)`` (ties — which
cannot occur for distinct ids — would break by id). md5 renders identically
on Spark and DuckDB (lowercase hex), so the permutation is engine-portable
and seed-stable: changing the seed re-permutes, re-running does not.

Scale design (the point of this module): a naive
``row_number() OVER (ORDER BY key)`` is a single-partition window — the
one shape that cannot scale past one executor. Instead:

1. every row gets a DETERMINISTIC range bucket from its key's leading 16
   hash bits (``floor(prefix16 · B / 65536)``) — no sampled range
   boundaries, so no persist-or-resample hazard between passes, and bucket
   membership is monotone in the key: ordering by (bucket, key) IS the
   global key order;
2. per-bucket dense ranks come from an ordinary windowed ``row_number``
   partitioned by bucket — B independent sorts of ~n/B rows each (md5
   prefixes are uniform, so buckets are balanced within sampling noise);
3. bucket offsets are the running sum of the B bucket counts — a B-row
   aggregate collected to the driver and re-broadcast as a literal map.

At 100 TB: B scales to O(cluster partitions) (65 536 distinct prefixes
max at 4 hex chars; extend the prefix for more), the counts aggregate is
map-side-combined to B rows, and no single task ever sees more than one
bucket's worth of rows. Cost: exactly one shuffle (the bucket window) and
one B-row driver round-trip. Offsets ride back as a literal map, fine to
a few thousand buckets; past that, swap the literal for a broadcast join
on the B-row offsets table — same plan shape, no driver-side expression
bloat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: deterministic range buckets from the leading 16 key bits
DEFAULT_BUCKETS = 64


def order_key(id_col, seed: int):
    """``md5(seed ':' id)`` — the engine-portable shuffle key.

    ``concat`` (not ``concat_ws``) on purpose: a NULL id must propagate
    to a NULL key — the oracle's ``||`` does the same — so a bad row
    surfaces as a NULL position instead of being silently slotted under
    ``md5(seed)``.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(F.lit(f"{seed}:"), c.cast("string")))


def bucketed_global_rank(df: DataFrame, bucket_col: str,
                         order_cols: list) -> DataFrame:
    """THE bucketed-rank kernel, shared by every consumer that needs a
    global 0-based rank without a single-partition window
    (seeded_shuffle, the z-order audit): ``bucket_col`` must be
    order-monotone in the sort key, so ordering by (bucket, order_cols)
    IS the global order. Per-bucket ``row_number`` windows run in
    parallel; bucket offsets come from
    :func:`photon_spark.functions._util.exclusive_prefix_offsets`, whose
    driver share is bounded by the CONSTANT PREFIX_FANOUT: ≤fanout
    buckets ride back as the original LONG-keyed literal map (int64
    end-to-end — mixed int32/int64 map keys silently return NULL, the
    bug this shared copy exists to fix exactly once); above it the
    two-level tree rollup computes the prefix DISTRIBUTED and rejoins
    as a broadcast, so the kernel scales to any bucket count (band ×
    bucket composite keys included) with no driver-side literal-map
    expression bloat.

    Rows with a NULL bucket get a NULL rank (they never consume a slot)
    — the caller's signal for bad keys, matching seeded_shuffle's NULL-id
    contract (NULL misses both the literal map and the LEFT offset
    join, so the rank is NULL by the same arithmetic)."""
    from photon_spark.functions._util import exclusive_prefix_offsets

    offsets, off_df = exclusive_prefix_offsets(
        df.groupBy(F.col(bucket_col).cast("long").alias(bucket_col))
          .agg(F.count(F.lit(1)).alias("_n")),
        bucket_col, "_n")
    w = Window.partitionBy(bucket_col).orderBy(*order_cols)
    if off_df is None:
        if offsets:
            off_map = F.create_map(
                *[x for b in sorted(offsets)
                  for x in (F.lit(int(b)).cast("long"),
                            F.lit(int(offsets[b])).cast("long"))])
            offset = F.element_at(off_map, F.col(bucket_col).cast("long"))
        else:  # empty input (or nothing but NULL buckets)
            offset = F.lit(None).cast("long")
        return df.withColumn(
            "global_rank",
            (offset + F.row_number().over(w) - 1).cast("long"))
    return (df.withColumn("_bkt_key", F.col(bucket_col).cast("long"))
              .join(F.broadcast(off_df.withColumnRenamed(
                  bucket_col, "_bkt_key")), "_bkt_key", "left")
              .withColumn(
                  "global_rank",
                  (F.col("_offset") + F.row_number().over(w) - 1)
                  .cast("long"))
              .drop("_bkt_key", "_offset"))


def seeded_shuffle(df: DataFrame, id_col: str = "doc_id", seed: int = 42,
                   docs_per_shard: int = 64,
                   buckets: int = DEFAULT_BUCKETS,
                   band_col=None) -> DataFrame:
    """Assign every row its position in the seeded global permutation.

    Returns ``(id_col[, band], global_pos, shard_id, pos_in_shard)`` with
    ``global_pos`` ∈ [0, n) the rank under the md5 order, ``shard_id`` =
    ``global_pos // docs_per_shard``, ``pos_in_shard`` the remainder —
    i.e. shard k holds permutation slots [k·D, (k+1)·D).

    ``band_col`` (an integer Column) turns the permutation into a
    CURRICULUM order: rows sort by (band ASC, md5 key) — whole bands in
    order, a fresh seeded shuffle within each band. The bucket trick is
    unchanged: (band, bucket) composite groups stay order-monotone
    because the bucket is monotone in the key within every band.
    """
    cols = [F.col(id_col), order_key(id_col, seed).alias("okey")]
    if band_col is not None:
        cols.append(band_col.cast("long").alias("band"))
    keyed = df.select(*cols)
    # leading 16 bits of the key → deterministic, order-monotone bucket
    pfx = F.conv(F.substring("okey", 1, 4), 16, 10).cast("long")
    keyed = keyed.withColumn(
        "bkt", F.floor(pfx * F.lit(buckets) / F.lit(65536)).cast("long"))
    if band_col is not None:
        # one composite group key: band · B + bucket (band ≥ 0 required)
        keyed = keyed.withColumn(
            "bkt", F.col("band") * F.lit(buckets) + F.col("bkt"))

    # NULL ids → NULL key → NULL bucket → NULL position via the shared
    # kernel (they never consume a slot): the bad rows surface instead
    # of crashing or silently slotting.
    ranked = bucketed_global_rank(keyed, "bkt", ["okey", id_col])
    keep = [F.col(id_col)] + ([F.col("band")] if band_col is not None else [])
    return (ranked
            .select(*keep, F.col("global_rank").alias("global_pos"))
            .withColumn("shard_id",
                        F.floor(F.col("global_pos") / F.lit(docs_per_shard))
                         .cast("long"))
            .withColumn("pos_in_shard",
                        (F.col("global_pos") % F.lit(docs_per_shard))
                        .cast("long")))
