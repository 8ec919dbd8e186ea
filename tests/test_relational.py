"""Relational coverage (queries_relational) + conversion funnel: value
sanity and — the point of these queries — plan-shape pins for warehouse
join planning (dimensions broadcast, fact shuffles once, aggregates run
partial-then-final).
"""

from pyspark.sql import functions as F

from photon_spark.queries_relational import (q_pricing_summary,
                                             q_revenue_by_nation)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_partial_agg(spark, sf_dir):
    plan = _plan(q_pricing_summary(spark, sf_dir))
    # map-side partial aggregation before the exchange: two HashAggregate
    # levels around one short-key shuffle
    assert plan.count("HashAggregate") >= 2
    rows = q_pricing_summary(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert sum(r["count_order"] for r in rows) == li.count()
    assert all(r["sum_disc_price"] <= r["sum_base_price"] for r in rows)


def test_revenue_by_nation_plan_and_totals(spark, sf_dir):
    df = q_revenue_by_nation(spark, sf_dir)
    plan = _plan(df)
    # nation + customer broadcast; the only hash exchanges belong to the
    # lineitem-orders join key and the final short-key aggregate
    assert plan.count("BroadcastHashJoin") >= 2
    assert all("n_nationkey" not in ln and "c_custkey" not in ln
               for ln in plan.splitlines()
               if "Exchange hashpartitioning" in ln)
    rows = df.collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert sum(r["n_items"] for r in rows) == li.count()
    assert all(r["revenue"] > 0 for r in rows)


def test_events_funnel_matches_naive(spark, sf_dir):
    from photon_spark.queries_pipeline import (FUNNEL_WINDOW_NS,
                                               q_events_funnel)
    from photon_spark.queries import _t
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts").collect()
    first_view: dict[int, int] = {}
    for r in ev:
        if r["event_type"] == "view":
            u = r["user_id"]
            first_view[u] = min(first_view.get(u, r["ts"]), r["ts"])
    conv: dict[int, int] = {}
    for r in ev:
        u = r["user_id"]
        if (r["event_type"] == "purchase" and u in first_view
                and first_view[u] <= r["ts"]
                <= first_view[u] + FUNNEL_WINDOW_NS):
            conv[u] = min(conv.get(u, r["ts"]), r["ts"])
    row = q_events_funnel(spark, sf_dir).collect()[0]
    assert row["n_users_with_view"] == len(first_view)
    assert row["n_converted"] == len(conv)
    if conv:
        avg = sum(conv[u] - first_view[u] for u in conv) / len(conv) / 1e9
        assert abs(row["avg_sec_to_convert"] - avg) < 1e-5
    else:
        assert row["avg_sec_to_convert"] is None


def test_ann_topk_filtered_pushdown_and_equivalence(spark, sf_dir):
    from photon_spark.queries_select import (ANN_FILT_LABEL,
                                             q_ann_topk_filtered)
    df = q_ann_topk_filtered(spark, sf_dir)
    # filter-then-score: the label predicate reaches the parquet scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "label" in plan
    rows = df.collect()
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    allowed = {r["vec_id"] for r in
               e.where(F.col("label") == ANN_FILT_LABEL).collect()}
    assert {r["vec_id"] for r in rows} <= allowed


def test_sliding_window_covers_tumbling(spark, sf_dir):
    """Each event lands in exactly N_SLIDES sliding windows, so total
    weighted count is N_SLIDES x the event count; the tumbling bucket is
    one of the covering starts."""
    from photon_spark.queries_pipeline import (N_SLIDES,
                                               q_events_sliding_window)
    from photon_spark.queries import _t
    n_events = _t(spark, sf_dir, "events").count()
    rows = q_events_sliding_window(spark, sf_dir).collect()
    assert sum(r["n_events"] for r in rows) == N_SLIDES * n_events


def test_revenue_trend_lag_consistency(spark, sf_dir):
    from photon_spark.queries_relational import q_revenue_trend
    rows = sorted(q_revenue_trend(spark, sf_dir).collect(),
                  key=lambda r: r["month"])
    assert rows[0]["mom_delta"] is None  # no prior month
    for prev, cur in zip(rows, rows[1:]):
        assert cur["mom_delta"] is not None
        assert abs((cur["revenue"] - prev["revenue"]) - cur["mom_delta"]) \
            < 0.011  # two 2dp-rounded figures differ by at most 1 cent


def test_price_quantity_corr_matches_numpy(spark, sf_dir):
    import numpy as np

    from photon_spark.queries_relational import q_price_quantity_corr
    rows = {r["l_returnflag"]: (r["n"], r["corr_qty_price"])
            for r in q_price_quantity_corr(spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
              .select("l_returnflag", "l_quantity", "l_extendedprice") \
              .collect()
    by_flag: dict = {}
    for r in li:
        by_flag.setdefault(r["l_returnflag"], []).append(
            (round(r["l_quantity"] * 100), round(r["l_extendedprice"] * 100)))
    assert set(rows) == set(by_flag)
    for flag, pts in by_flag.items():
        x = np.array([p[0] for p in pts], dtype=np.float64)
        y = np.array([p[1] for p in pts], dtype=np.float64)
        want = float(np.corrcoef(x, y)[0, 1])
        n, got = rows[flag]
        assert n == len(pts)
        assert abs(got - want) < 1e-6
        assert -1.0 <= got <= 1.0


def test_small_quantity_revenue_matches_naive(spark, sf_dir):
    from collections import defaultdict
    from photon_spark.queries_relational import q_small_quantity_revenue
    out = {r["p_brand"]: r for r in q_small_quantity_revenue(spark,
                                                             sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .select("l_partkey", "l_quantity", "l_extendedprice").collect()
    brand = {r["p_partkey"]: r["p_brand"]
             for r in spark.read.parquet(f"{sf_dir}/part.parquet").collect()}
    agg = defaultdict(lambda: [0, 0])
    for r in li:
        k = r["l_partkey"]
        agg[k][0] += 1
        agg[k][1] += round(r["l_quantity"] * 100)
    exp = defaultdict(lambda: [0, 0])
    for r in li:
        cnt, sq = agg[r["l_partkey"]]
        if round(r["l_quantity"] * 100) * cnt * 5 < sq:
            b = brand[r["l_partkey"]]
            exp[b][0] += 1
            exp[b][1] += round(r["l_extendedprice"] * 100)
    assert set(out) == set(exp)
    for b, (n, cents) in exp.items():
        assert out[b]["n_lines"] == n
        assert abs(out[b]["avg_yearly"] - cents / 100 / 7.0) < 0.02


def test_lone_late_supplier_matches_naive(spark, sf_dir):
    from collections import defaultdict
    from photon_spark.queries_relational import (_LATE_NS,
                                                 q_lone_late_supplier)
    from photon_spark.queries import _t
    out = {r["s_suppkey"]: r["numwait"]
           for r in q_lone_late_supplier(spark, sf_dir).collect()}
    li = _t(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_suppkey", "l_shipdate").collect()
    od = {r["o_orderkey"]: r["o_orderdate"]
          for r in _t(spark, sf_dir, "orders").collect()}
    late = {}
    for r in li:
        k = (r["l_orderkey"], r["l_suppkey"])
        is_late = r["l_shipdate"] - od[r["l_orderkey"]] > _LATE_NS
        late[k] = late.get(k, False) or is_late
    per_order = defaultdict(lambda: [0, 0])
    for (ok, sk), fl in late.items():
        per_order[ok][0] += 1
        per_order[ok][1] += int(fl)
    exp = defaultdict(int)
    for (ok, sk), fl in late.items():
        ns, nl = per_order[ok]
        if fl and ns > 1 and nl == 1:
            exp[sk] += 1
    assert out == dict(exp)
    assert exp, "no lone-late suppliers in corpus — query is vacuous"


def test_revenue_cube_lattice_consistency(spark, sf_dir):
    from photon_spark.queries_relational import q_revenue_cube
    rows = q_revenue_cube(spark, sf_dir).collect()
    base = [r for r in rows if r["gid"] == 0]
    by_nation = {r["n_name"]: r for r in rows
                 if r["gid"] == 1 and r["n_name"] is not None}
    total = [r for r in rows if r["gid"] == 3]
    assert len(total) == 1
    # every lattice level conserves the order count
    assert sum(r["n_orders"] for r in base) == total[0]["n_orders"]
    for name, r in by_nation.items():
        assert r["n_orders"] == sum(b["n_orders"] for b in base
                                    if b["n_name"] == name)
    assert len({r["gid"] for r in rows}) == 4  # all four cube cells


def test_user_journeys_matches_naive(spark, sf_dir):
    from collections import defaultdict
    from photon_spark.queries import _t
    from photon_spark.queries_relational import (JOURNEY_LEN,
                                                 q_user_journeys)
    out = {r["user_id"]: r for r in q_user_journeys(spark,
                                                    sf_dir).collect()}
    ev = _t(spark, sf_dir, "events") \
        .select("user_id", "ts", "event_id", "event_type").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"],
                                      r["event_type"]))
    assert set(out) == set(by_user)
    for u, rows in by_user.items():
        rows.sort()
        assert out[u]["n_events"] == len(rows)
        # gated journey is the '>'-joined string rendering (driver
        # scalar-primitive rule); order must match the naive sort exactly
        assert out[u]["journey"] == ">".join(
            t for _, _, t in rows[:JOURNEY_LEN])


def test_customer_spend_quartiles_balanced(spark, sf_dir):
    from photon_spark.queries_relational import q_customer_spend_quartiles
    rows = q_customer_spend_quartiles(spark, sf_dir).collect()
    seg = {}
    for r in rows:
        seg.setdefault(r["c_mktsegment"], {})[r["quartile"]] = r
    for s, qs in seg.items():
        assert set(qs) <= {1, 2, 3, 4}
        counts = [qs[q]["n_customers"] for q in sorted(qs)]
        # ntile fill rule: sizes differ by at most 1, larger buckets first
        assert max(counts) - min(counts) <= 1
        assert counts == sorted(counts, reverse=True)
        # spend is non-increasing across quartiles (avg per quartile)
        avgs = [qs[q]["avg_spend"] for q in sorted(qs)]
        assert avgs == sorted(avgs, reverse=True)


def test_order_count_distribution_conserves(spark, sf_dir):
    from photon_spark.queries_relational import (_rd,
                                                 q_order_count_distribution)
    rows = q_order_count_distribution(spark, sf_dir).collect()
    n_cust = _rd(spark, sf_dir, "customer").count()
    n_orders = _rd(spark, sf_dir, "orders") \
        .where(F.col("o_orderpriority") != "1-URGENT").count()
    # the histogram partitions ALL customers (zero bucket via the outer
    # join) and its weighted sum re-counts every non-urgent order
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert sum(r["c_count"] * r["n_customers"] for r in rows) == n_orders
    # zero bucket == customers with NO non-urgent order (outer-join rows);
    # exact, because at small sf every customer may well have orders
    with_orders = _rd(spark, sf_dir, "orders") \
        .where(F.col("o_orderpriority") != "1-URGENT") \
        .select("o_custkey").distinct().count()
    zero = sum(r["n_customers"] for r in rows if r["c_count"] == 0)
    assert zero == n_cust - with_orders


def test_events_unpivot_conserves_counts(spark, sf_dir):
    from photon_spark.queries import _t
    from photon_spark.queries_relational import q_events_unpivot
    rows = {r["metric"]: r for r in q_events_unpivot(spark,
                                                     sf_dir).collect()}
    e = _t(spark, sf_dir, "events")
    per_type = {r["event_type"]: r["n"] for r in
                e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
                 .collect()}
    n_cohorts = e.select(F.pmod("user_id", F.lit(10))).distinct().count()
    assert set(rows) == set(per_type)  # all five streams melt back out
    for t, n in per_type.items():
        assert rows[t]["total"] == n          # melt loses nothing
        assert rows[t]["n_cohorts"] == n_cohorts
        assert rows[t]["n_cohorts_active"] <= n_cohorts
