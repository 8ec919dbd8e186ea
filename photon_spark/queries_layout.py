"""Data-layout queries: the Z-order file-skipping audit.

Scan cost at 100 TB is a layout decision: this query lays the events
table out two ways — Z-order (Morton curve over a normalized
user_id × event-hour grid) vs insertion order (which for an event log
is time order) — computes each layout's per-file min-max ranges, and
counts the rows a reader would scan for three query shapes. The
insertion layout prunes time queries perfectly and user queries not at
all; the Z layout bounds the damage across BOTH — which is the whole
argument for multi-dimensional clustering. Everything is exact integer
arithmetic, so the audit hash-matches DuckDB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from photon_spark.functions.layout import zvalue_expr

HOUR_NS = 3_600_000_000_000
T0_NS = 1_704_067_200_000_000_000          # 2024-01-01 00:00:00 UTC
GRID_BITS = 8                               #: normalized grid per dim
FILE_ROWS = 250                             #: rows per "file", both layouts
ZBUCKETS = 32                               #: range buckets for the z rank
#: audited query shapes: a user-only range, an hour-only range, a 2-D box
UQ = (40, 45)
HQ = (200, 240)
BOX = (40, 80, 200, 400)


def _events(spark, sf_dir):
    from photon_spark.queries import _t
    return _t(spark, sf_dir, "events")


def q_zorder_skipping_audit(spark, sf_dir):
    """File-skipping audit: Z-order vs insertion order for three query
    shapes (user-only, hour-only, 2-D box), equal file sizes.

    Both dimensions are first normalized onto a 2^{GRID_BITS} grid
    (value·256 div (max+1)) — raw interleaving would hand the curve's
    high bits to whichever column has more of them, degrading it to a
    single-column sort. Files are {FILE_ROWS}-row runs of the z-sorted
    (resp. insertion-sorted) order; a file is scanned when its min-max
    box intersects the query — exactly parquet row-group pruning.

    File assignment is the bucketed-rank kernel (functions/ordering.py's
    shape), NOT a global `row_number` window: the z-value's leading bits
    give a deterministic order-monotone range bucket ({ZBUCKETS}
    independent per-bucket sorts), bucket offsets are a {ZBUCKETS}-row
    driver rollup, and the global rank — hence the file grid — is
    identical to the single-window form while no task ever sorts more
    than one bucket. The production writer (functions/layout.py:
    repartitionByRange on z) shares the same no-global-sort property;
    the audit itself is two keyed aggregations plus three 1-row
    conditional-sum passes.
    """
    e = _events(spark, sf_dir).select(
        "event_id", "user_id",
        F.expr(f"(ts - {T0_NS}) div {HOUR_NS}").alias("hour"))
    mx = e.agg(F.max("user_id"), F.max("hour")).collect()[0]
    max_u, max_h = mx[0], mx[1]
    g = e.select(
        "event_id", "user_id", "hour",
        F.expr(f"(user_id * 256) div ({max_u} + 1)").alias("ux"),
        F.expr(f"(hour * 256) div ({max_h} + 1)").alias("hx"))
    z = F.expr(zvalue_expr("ux", "hx", GRID_BITS, "spark"))
    # z ∈ [0, 2^(2·GRID_BITS)); leading bits → order-monotone bucket, so
    # ordering by (bkt, z, event_id) IS the global (z, event_id) order
    zspace = 1 << (2 * GRID_BITS)
    from photon_spark.functions.ordering import bucketed_global_rank
    keyed = g.select(
        "event_id", "user_id", "hour", z.alias("z"),
        F.expr(f"event_id div {FILE_ROWS}").alias("linfile")) \
        .withColumn("bkt",
                    F.floor(F.col("z") * F.lit(ZBUCKETS) / F.lit(zspace))
                     .cast("long"))
    lay = bucketed_global_rank(keyed, "bkt", ["z", "event_id"]).select(
        "user_id", "hour",
        (F.col("global_rank") / F.lit(FILE_ROWS)).cast("long")
         .alias("zfile"),
        "linfile")

    u1, u2 = UQ
    h1, h2 = HQ
    b1, b2, b3, b4 = BOX

    def layout_stats(bucket: str, tag: str):
        gg = (lay.groupBy(bucket)
                 .agg(F.count(F.lit(1)).alias("n_rows"),
                      F.min("user_id").alias("lu"),
                      F.max("user_id").alias("hu"),
                      F.min("hour").alias("lh"),
                      F.max("hour").alias("hh")))
        admits = {
            "userq": (F.col("lu") <= u2) & (F.col("hu") >= u1),
            "hourq": (F.col("lh") <= h2) & (F.col("hh") >= h1),
            "boxq": ((F.col("lu") <= b2) & (F.col("hu") >= b1)
                     & (F.col("lh") <= b4) & (F.col("hh") >= b3)),
        }
        return gg.agg(
            F.count(F.lit(1)).alias(f"n_files_{tag}"),
            *[F.sum(F.when(cond, F.col("n_rows")).otherwise(0))
               .alias(f"scan_{q}_{tag}") for q, cond in admits.items()])

    zs = layout_stats("zfile", "z")
    ls = layout_stats("linfile", "lin")
    m = lay.agg(
        F.sum(F.col("user_id").between(u1, u2).cast("long"))
         .alias("match_userq"),
        F.sum(F.col("hour").between(h1, h2).cast("long"))
         .alias("match_hourq"),
        F.sum((F.col("user_id").between(b1, b2)
               & F.col("hour").between(b3, b4)).cast("long"))
         .alias("match_boxq"))
    return (zs.crossJoin(ls).crossJoin(m)
              .select("n_files_z", "n_files_lin",
                      "scan_userq_z", "scan_userq_lin", "match_userq",
                      "scan_hourq_z", "scan_hourq_lin", "match_hourq",
                      "scan_boxq_z", "scan_boxq_lin", "match_boxq"))


def _sql_zorder_audit() -> str:
    z = zvalue_expr("ux", "hx", GRID_BITS, "duckdb")
    u1, u2 = UQ
    h1, h2 = HQ
    b1, b2, b3, b4 = BOX
    admits = {
        "userq": f"(lu <= {u2} AND hu >= {u1})",
        "hourq": f"(lh <= {h2} AND hh >= {h1})",
        "boxq": (f"(lu <= {b2} AND hu >= {b1}"
                 f" AND lh <= {b4} AND hh >= {b3})"),
    }

    def stats(src: str, tag: str) -> str:
        sums = ", ".join(
            f"sum(CASE WHEN {cond} THEN n_rows ELSE 0 END) AS scan_{q}_{tag}"
            for q, cond in admits.items())
        return f"SELECT count(*) AS n_files_{tag}, {sums} FROM {src}"

    return f"""
WITH e AS (
  SELECT event_id, user_id,
         (epoch_ns(ts) - {T0_NS}) // {HOUR_NS} AS hour
  FROM events
), mx AS (SELECT max(user_id) AS mu, max(hour) AS mh FROM e),
g AS (
  SELECT event_id, user_id, hour,
         (user_id * 256) // (mx.mu + 1) AS ux,
         (hour * 256) // (mx.mh + 1) AS hx
  FROM e, mx
), lay AS (
  SELECT user_id, hour,
         (row_number() OVER (ORDER BY {z}, event_id) - 1)
           // {FILE_ROWS} AS zfile,
         event_id // {FILE_ROWS} AS linfile
  FROM g
), zg AS (
  SELECT zfile, count(*) AS n_rows,
         min(user_id) AS lu, max(user_id) AS hu,
         min(hour) AS lh, max(hour) AS hh
  FROM lay GROUP BY 1
), lg AS (
  SELECT linfile, count(*) AS n_rows,
         min(user_id) AS lu, max(user_id) AS hu,
         min(hour) AS lh, max(hour) AS hh
  FROM lay GROUP BY 1
), zs AS ({stats('zg', 'z')}),
ls AS ({stats('lg', 'lin')}),
m AS (
  SELECT sum(CASE WHEN user_id BETWEEN {u1} AND {u2}
             THEN 1 ELSE 0 END) AS match_userq,
         sum(CASE WHEN hour BETWEEN {h1} AND {h2}
             THEN 1 ELSE 0 END) AS match_hourq,
         sum(CASE WHEN user_id BETWEEN {b1} AND {b2}
                   AND hour BETWEEN {b3} AND {b4}
             THEN 1 ELSE 0 END) AS match_boxq
  FROM lay
)
SELECT n_files_z, n_files_lin,
       CAST(scan_userq_z AS BIGINT) AS scan_userq_z,
       CAST(scan_userq_lin AS BIGINT) AS scan_userq_lin,
       CAST(match_userq AS BIGINT) AS match_userq,
       CAST(scan_hourq_z AS BIGINT) AS scan_hourq_z,
       CAST(scan_hourq_lin AS BIGINT) AS scan_hourq_lin,
       CAST(match_hourq AS BIGINT) AS match_hourq,
       CAST(scan_boxq_z AS BIGINT) AS scan_boxq_z,
       CAST(scan_boxq_lin AS BIGINT) AS scan_boxq_lin,
       CAST(match_boxq AS BIGINT) AS match_boxq
FROM zs, ls, m
"""


# ------------------------------------------------ compaction bin plan

DAY_NS = 86_400_000_000_000
#: target compacted-file size; ~7 source days per bin at sf0.01
COMPACT_TARGET_BYTES = 4000


def q_compaction_bin_plan(spark, sf_dir):
    """SMALL-FILES COMPACTION PLAN — the table-maintenance shape every
    lakehouse runs nightly: treat each (event_type, day) partition of
    the event log as one small file (its payload bytes = summed props
    length), then assign files to target-size compaction bins by the
    sorted-fill rule bin = floor(bytes_before / target) within each
    event type — time-adjacent files merge together, preserving the
    time-pruning property of the layout (the zorder audit's insertion
    layout). Output per (event_type, bin): file count, total bytes,
    and the day range the compacted file would span — exactly the
    job manifest a compaction executor consumes.

    Plan: one keyed aggregate builds the file relation (map-side
    combine collapses the event stream), a per-type running sum over
    the per-type file lists (|days| rows per type — bounded by the
    calendar, not the data), and a map-side final rollup. The
    exclusive prefix sum means a file never splits: each bin may
    overflow the target by at most one file, the standard greedy
    guarantee. All integers.
    """
    from pyspark.sql import Window
    from photon_spark.queries import _t

    e = _t(spark, sf_dir, "events")
    files = (e.select("event_type",
                      (F.col("ts") - F.col("ts") % DAY_NS).alias("day_ns"),
                      F.length("props").alias("b"))
              .groupBy("event_type", "day_ns")
              .agg(F.count(F.lit(1)).alias("n_rows"),
                   F.sum("b").alias("bytes")))
    w_prev = (Window.partitionBy("event_type").orderBy("day_ns")
              .rowsBetween(Window.unboundedPreceding, -1))
    binned = files.withColumn(
        "bin",
        (F.coalesce(F.sum("bytes").over(w_prev), F.lit(0))
         / COMPACT_TARGET_BYTES).cast("long"))
    return (binned.groupBy("event_type", "bin")
                  .agg(F.count(F.lit(1)).alias("n_files"),
                       F.sum("n_rows").alias("n_rows"),
                       F.sum("bytes").alias("total_bytes"),
                       F.min("day_ns").alias("from_day_ns"),
                       F.max("day_ns").alias("to_day_ns"))
                  .withColumn("over_target",
                              F.col("total_bytes")
                              > COMPACT_TARGET_BYTES))


SQL_COMPACTION_BIN_PLAN = f"""
WITH files AS (
  SELECT event_type,
         epoch_ns(ts) - epoch_ns(ts) % {DAY_NS} AS day_ns,
         count(*) AS n_rows, sum(length(props)) AS bytes
  FROM events GROUP BY 1, 2
), binned AS (
  SELECT *,
         coalesce(sum(bytes) OVER (PARTITION BY event_type ORDER BY day_ns
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // {COMPACT_TARGET_BYTES} AS bin
  FROM files
)
SELECT event_type, CAST(bin AS BIGINT) AS bin, count(*) AS n_files,
       CAST(sum(n_rows) AS BIGINT) AS n_rows,
       CAST(sum(bytes) AS BIGINT) AS total_bytes,
       min(day_ns) AS from_day_ns, max(day_ns) AS to_day_ns,
       sum(bytes) > {COMPACT_TARGET_BYTES} AS over_target
FROM binned GROUP BY 1, 2
"""



QUERIES = {
    "zorder_skipping_audit": q_zorder_skipping_audit,
    "compaction_bin_plan": q_compaction_bin_plan,
}

ORACLES = {
    "zorder_skipping_audit": _sql_zorder_audit(),
    "compaction_bin_plan": SQL_COMPACTION_BIN_PLAN,
}
