"""Skyline operator: the two-phase distributed plan must equal the
brute-force NOT EXISTS spec on adversarial inputs — duplicates,
all-equal axes, single rows, and seeded random clouds."""

import random

from pyspark.sql import functions as F

from photon_spark.functions.skyline import local_skyline, skyline_2d


def _brute(rows):
    out = []
    for p in rows:
        dominated = any(
            q[1] <= p[1] and q[2] <= p[2] and (q[1] < p[1] or q[2] < p[2])
            for q in rows)
        if not dominated:
            out.append(p)
    return sorted(out)


def _run(spark, rows, n_parts=5):
    df = spark.createDataFrame(rows, "k long, x long, y long") \
              .repartition(n_parts)
    got = sorted(tuple(r) for r in skyline_2d(df, "x", "y").collect())
    assert got == _brute(rows)


def test_skyline_random_cloud(spark):
    rng = random.Random(8)
    rows = [(i, rng.randrange(0, 50), rng.randrange(0, 50))
            for i in range(400)]
    _run(spark, rows)


def test_skyline_duplicate_optimal_points_all_survive(spark):
    # two identical non-dominated points: neither strictly dominates
    # the other, so both belong to the front
    rows = [(1, 0, 5), (2, 0, 5), (3, 1, 1), (4, 2, 0), (5, 3, 3)]
    _run(spark, rows, n_parts=3)


def test_skyline_equal_x_keeps_only_min_y(spark):
    rows = [(1, 2, 9), (2, 2, 3), (3, 2, 3), (4, 5, 2)]
    got = sorted(tuple(r) for r in
                 skyline_2d(
                     spark.createDataFrame(rows, "k long, x long, y long")
                          .repartition(2), "x", "y").collect())
    assert got == [(2, 2, 3), (3, 2, 3), (4, 5, 2)]


def test_skyline_single_row_and_chain(spark):
    _run(spark, [(1, 7, 7)], n_parts=2)
    # strictly descending staircase: every point survives
    rows = [(i, i, 10 - i) for i in range(10)]
    _run(spark, rows, n_parts=4)


def test_local_skyline_is_superset_filter(spark):
    # phase 1 alone may keep extra rows (locally undominated) but must
    # never drop a global-front member
    rng = random.Random(11)
    rows = [(i, rng.randrange(0, 30), rng.randrange(0, 30))
            for i in range(300)]
    df = spark.createDataFrame(rows, "k long, x long, y long") \
              .repartition(7)
    cand = {tuple(r) for r in local_skyline(df, "x", "y").collect()}
    assert set(_brute(rows)) <= cand
    assert len(cand) <= len(rows)


def test_pareto_front_parts_not_dominated(spark, sf_dir):
    from photon_spark.queries_relational import q_pareto_front_parts
    front = q_pareto_front_parts(spark, sf_dir).collect()
    parts = (spark.read.parquet(f"{sf_dir}/part.parquet")
             .select("p_partkey", "p_size",
                     F.round(F.col("p_retailprice") * 100).cast("long")
                      .alias("pc")).collect())
    all_pts = [(r["p_partkey"], r["pc"], -r["p_size"]) for r in parts]
    expect = {(k, x, -ny) for (k, x, ny) in _brute(all_pts)}
    got = {(r["p_partkey"], r["price_cents"], r["p_size"]) for r in front}
    assert got == expect and got


def test_skyline_exact_past_2_53(spark):
    # int64 y values past 2^53: a float64 lag would collapse
    # 2^53+1 == 2^53 and drop a true front member (epoch-ns axes
    # live in this range)
    rows = [(1, 1, 2**53 + 1), (2, 2, 2**53), (3, 3, 2**53 + 7)]
    _run(spark, rows, n_parts=2)


def test_skyline_rejects_float_axes(spark):
    # RANGE ... 1 PRECEDING is "strictly smaller" only on an integer
    # axis: with float x, a dominator at 0 < dx < 1 falls outside the
    # frame and a dominated row would silently survive — so float axes
    # must be refused loudly, in BOTH phases
    import pytest

    df = spark.createDataFrame(
        [(1, 0.5, 3), (2, 1.0, 1)], "k long, x double, y long")
    with pytest.raises(TypeError, match="integral"):
        skyline_2d(df, "x", "y")
    with pytest.raises(TypeError, match="integral"):
        local_skyline(df, "x", "y")
    dfy = spark.createDataFrame(
        [(1, 1, 0.5)], "k long, x long, y double")
    with pytest.raises(TypeError, match="integral"):
        skyline_2d(dfy, "x", "y")
    with pytest.raises(ValueError, match="not in relation"):
        skyline_2d(df, "nope", "y")
