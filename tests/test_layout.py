"""Layout operators: z-order audit invariants, the range-partitioned
z-writer, and bucketed co-located joins (shuffle-free plan pin)."""

import os

from pyspark.sql import functions as F

from photon_spark import queries_layout as ql
from photon_spark.functions.layout import zorder_layout, zvalue_expr


def test_zorder_audit_sound(spark, sf_dir):
    r = ql.q_zorder_skipping_audit(spark, sf_dir).collect()[0]
    # pruning is SOUND: every admitted-file row count covers the matches
    for q in ("userq", "hourq", "boxq"):
        assert r[f"scan_{q}_z"] >= r[f"match_{q}"]
        assert r[f"scan_{q}_lin"] >= r[f"match_{q}"]
    # equal file economics
    assert r["n_files_z"] == r["n_files_lin"]


def test_zorder_audit_workload_wins_at_granularity(spark, sf_dir):
    """With enough files for the curve to matter (sf0.01 → 40 files),
    the z layout scans less across the 3-query workload, and beats the
    insertion layout outright on the user-only query it cannot prune."""
    # needs the sf0.01 granularity regardless of the suite's default SF;
    # derive it from the configured data root rather than hardcoding.
    sf001_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
    r = (ql.q_zorder_skipping_audit(spark, sf001_dir)
           .collect()[0])
    z_total = sum(r[f"scan_{q}_z"] for q in ("userq", "hourq", "boxq"))
    l_total = sum(r[f"scan_{q}_lin"] for q in ("userq", "hourq", "boxq"))
    assert z_total < l_total
    assert r["scan_userq_z"] < r["scan_userq_lin"]


def test_zorder_writer_partitions_are_disjoint_z_ranges(spark, sf_dir):
    """The production writer (repartitionByRange on the z-value) really
    range-partitions: per-partition [min_z, max_z] intervals are
    pairwise disjoint, rows are conserved, and rows are z-sorted within
    each partition — the layout contract parquet min-max stats feed on."""
    from photon_spark.queries import _t
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.expr(f"(ts - {ql.T0_NS}) div {ql.HOUR_NS}").alias("hour"))
    zed = zorder_layout(e, "user_id", "hour", bits=10, n_ranges=8)
    z = F.expr(zvalue_expr("user_id", "hour", 10, "spark"))
    boxes = (zed.withColumn("f", F.spark_partition_id())
                .withColumn("z", z)
                .groupBy("f")
                .agg(F.min("z").alias("lo"), F.max("z").alias("hi"),
                     F.count(F.lit(1)).alias("n"))
                .orderBy("lo").collect())
    assert sum(b["n"] for b in boxes) == e.count()
    for prev, cur in zip(boxes, boxes[1:]):
        assert prev["hi"] <= cur["lo"]
    # z-sorted within partitions: per-partition sortedness via a lag scan
    def part_sorted(it):
        last = None
        for row in it:
            if last is not None and row.z < last:
                yield row
            last = row.z
    bad = (zed.withColumn("z", z).rdd.mapPartitions(part_sorted).count())
    assert bad == 0


def test_zvalue_expr_spark_duckdb_agree(spark):
    import duckdb
    rows = [(u, h) for u in (0, 3, 17, 255) for h in (0, 5, 128, 255)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {(r["x"], r["y"]): r["z"] for r in df.select(
        "x", "y", F.expr(zvalue_expr("x", "y", 8, "spark")).alias("z"))
        .collect()}
    con = duckdb.connect()
    for (x, y), z in got.items():
        dz = con.execute(
            f"SELECT {zvalue_expr(str(x), str(y), 8, 'duckdb')}"
        ).fetchone()[0]
        assert dz == z
    # interleave is a bijection on the grid
    assert len(set(got.values())) == len(rows)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Co-located bucketed join: two tables bucketed+sorted on the join
    key join WITHOUT any Exchange in the plan — the layout that turns a
    100 TB fact-fact join from a full shuffle into a local merge."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet") \
                  .select("event_id", "user_id", "event_type")
    a = e.where(F.col("event_type") == "click")
    b = e.where(F.col("event_type") == "purchase")
    for name, df in (("t_click", a), ("t_buy", b)):
        (df.write.mode("overwrite").bucketBy(8, "user_id")
           .sortBy("user_id").format("parquet")
           .option("path", str(tmp_path / name)).saveAsTable(name))
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table("t_click").alias("c")
             .join(spark.table("t_buy").alias("b"), "user_id")
             .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # the whole pipeline — scan, join, agg on the bucket key — runs
        # with ZERO Exchange: buckets ARE the partitioning
        assert "Exchange" not in plan
        n = j.count()
        # sanity: equals the unbucketed result
        m = (a.join(b, "user_id").groupBy("user_id")
              .agg(F.count(F.lit(1))).count())
        assert n == m
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE t_click")
        spark.sql("DROP TABLE t_buy")
