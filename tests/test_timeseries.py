"""Time-series / vocab-induction operators (events_rolling_stats,
events_anomaly_zscore, bpe_first_merges, shipping_priority): naive
recompute equivalence, constructed golden cases, and plan pins."""

from pyspark.sql import functions as F

from photon_spark.queries_pipeline import (ROLL_N, Z_CUT,
                                           q_bpe_first_merges,
                                           q_events_anomaly_zscore,
                                           q_events_rolling_stats)
from photon_spark.queries_relational import q_shipping_priority


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rolling_stats_matches_naive(spark, sf_dir):
    from photon_spark.queries import _t
    rows = q_events_rolling_stats(spark, sf_dir).collect()
    assert rows
    ev = (_t(spark, sf_dir, "events")
          .select("user_id", "ts", "event_id",
                  F.round(F.col("value") * 100).cast("long").alias("c"))
          .collect())
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    naive = {}
    for u, es in by_user.items():
        es.sort(key=lambda r: (r.ts, r.event_id))
        for i, r in enumerate(es):
            frame = es[max(0, i - (ROLL_N - 1)):i + 1]
            naive[(u, r.event_id)] = (len(frame), sum(x.c for x in frame))
    for r in rows:
        n, c = naive[(r.user_id, r.event_id)]
        assert r.roll_n == n
        assert abs(r.roll_sum - c / 100) < 1e-9
    # top-k really is the global max of the naive rolling sums
    assert max(v[1] for v in naive.values()) == round(rows[0].roll_sum * 100)


def test_rolling_plan_is_takeordered(spark, sf_dir):
    plan = _plan(q_events_rolling_stats(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # top-50, not a global sort


def test_anomaly_zscore_constructed_outlier(spark, sf_dir, tmp_path):
    # 99 values at 10.00, one at 1000.00 -> exactly one >3-sigma outlier
    import pandas as pd
    pdf = pd.DataFrame({
        "event_id": range(100),
        "ts": pd.to_datetime(range(100), unit="s"),
        "user_id": ["u"] * 100,
        "event_type": ["t"] * 100,
        "value": [10.0] * 99 + [1000.0],
        "props": ["{}"] * 100,
    })
    p = str(tmp_path / "events.parquet")
    spark.createDataFrame(pdf).write.parquet(p)
    out = q_events_anomaly_zscore(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].n_events == 100
    assert out[0].n_anomalies == 1
    assert out[0].max_abs_z > Z_CUT


def test_anomaly_zscore_broadcast_stats(spark, sf_dir):
    plan = _plan(q_events_anomaly_zscore(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # 5-row stats join, no fact shuffle


def test_bpe_first_merges_golden(spark, tmp_path):
    # corpus: 'abab' x3 + 'cd' x2 -> pairs ab:6 (x2 per word), ba:3, cd:2
    df = spark.createDataFrame(
        [(1, "abab abab abab cd cd", "en", "s", 20)],
        "doc_id long, text string, lang string, source string, n_chars long")
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.pair: r.pair_count
           for r in q_bpe_first_merges(spark, str(tmp_path)).collect()}
    assert out == {"ab": 6, "ba": 3, "cd": 2}


def test_shipping_priority_plan_and_values(spark, sf_dir):
    df = q_shipping_priority(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan      # customer dim broadcasts
    assert "TakeOrderedAndProject" in plan  # top-10
    rows = df.collect()
    assert 0 < len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_large_orders_aggregates_before_join(spark, sf_dir):
    from photon_spark.queries_relational import q_large_orders
    df = q_large_orders(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan  # customer dim
    rows = df.collect()
    assert rows == sorted(rows, key=lambda r: (-r.total_qty, r.o_orderkey))


def test_top_customers_per_segment_group_limit(spark, sf_dir):
    from photon_spark.queries_relational import (SEG_TOPN,
                                                 q_top_customers_per_segment)
    df = q_top_customers_per_segment(spark, sf_dir)
    # rank pushdown: Spark 4 stops each window partition at k
    assert "WindowGroupLimit" in _plan(df)
    rows = df.collect()
    segs = {r.c_mktsegment for r in rows}
    for s in segs:
        rks = sorted(r.rk for r in rows if r.c_mktsegment == s)
        assert rks == list(range(1, len(rks) + 1))
        assert len(rks) <= SEG_TOPN


def test_revenue_rollup_levels_consistent(spark, sf_dir):
    from photon_spark.queries_relational import q_revenue_rollup
    rows = q_revenue_rollup(spark, sf_dir).collect()
    grand = [r for r in rows if r.nation == "ALL" and r.year == "ALL"]
    assert len(grand) == 1
    per_nation = [r for r in rows if r.nation != "ALL" and r.year == "ALL"]
    leaves = [r for r in rows if r.nation != "ALL" and r.year != "ALL"]
    assert sum(r.n_orders for r in per_nation) == grand[0].n_orders
    assert sum(r.n_orders for r in leaves) == grand[0].n_orders
    # one aggregation pass (Expand + partial/final agg), not 3 queries
    plan = q_revenue_rollup(spark, sf_dir)._jdf.queryExecution()\
        .executedPlan().toString()
    assert "Expand" in plan


def test_events_pivot_row_conservation(spark, sf_dir):
    from photon_spark.queries_relational import q_events_pivot
    from photon_spark.queries import _t
    rows = q_events_pivot(spark, sf_dir).collect()
    total = sum(r.click + r.purchase + r.signup + r.view + r.error
                for r in rows)
    assert total == _t(spark, sf_dir, "events").count()


def test_idle_customers_anti_join_plan(spark, sf_dir):
    from photon_spark.queries_relational import q_idle_customers
    df = q_idle_customers(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert df.count() > 0  # the cutoff keeps the gate non-trivial


def test_rolling_active_users_short_span(spark, tmp_path):
    # a dataset spanning fewer than RAU_DAYS distinct days has no
    # full trailing week: the calendar must be EMPTY (as the oracle's
    # generate_series returns), not a sequence(start > stop) crash
    import datetime as dt

    from photon_spark.queries_pipeline import q_rolling_active_users

    rows = [(i, dt.datetime(2024, 1, 1 + i % 2, 12, 0, 0), i % 3,
             "view", 1.0, "{}") for i in range(6)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    d = str(tmp_path / "short")
    df.coalesce(1).write.parquet(f"{d}/events.parquet")
    assert q_rolling_active_users(spark, d).count() == 0
