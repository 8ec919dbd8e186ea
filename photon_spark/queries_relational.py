"""Relational coverage — classic warehouse queries over the TPC-H-ish
star schema. The reference has NO joins or SQL operators (SURVEY §2.8);
on Spark they are free, and these queries are the evidence: the fact
table shuffles once on its join key, every dimension broadcasts, and
aggregates run partial-then-final. Float policy: money math is exact
integer cents (prices/discounts are 2dp), divided once at the end.

- pricing_summary: TPC-H Q1 flavor — one scan of lineitem, short-key agg.
- revenue_by_nation: Q5 flavor — lineitem ⋈ orders (the one shuffle)
  ⋈ customer ⋈ nation (broadcasts), revenue by nation.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from photon_spark.relations import read_base as _read_base


def _rd(spark, sf_dir, name):
    return _read_base(spark, sf_dir, name)


#: exact cents: 2dp double -> integer (prices and discounts are 2dp)
def _cents(c):
    return F.round(c * 100).cast("long")


#: broadcast-hint cap for dimensions that grow with scale factor.
#: Catalyst's own size estimate gates the hint; tests set this to 0 to
#: pin the shuffled-join fallback.
_BCAST_CAP_BYTES = 256 << 20


def _bcast_dim(df):
    """Size-gated broadcast hint for dimensions that GROW with scale
    factor (customer 150k·sf, part 200k·sf, supplier 10k·sf — unlike
    nation/region, which are constant-size and stay unconditionally
    hinted). A forced ``F.broadcast`` overrides Spark's size checks, so
    at a genuine 100× the build side stops fitting and the hint becomes
    an executor OOM instead of a fallback. This helper consults
    Catalyst's optimized-plan size estimate (the same statistic the
    autoBroadcastJoinThreshold and AQE consult — no job is triggered)
    and hints only below ``_BCAST_CAP_BYTES``; above it, the relation is
    returned unhinted and AQE picks the join strategy at runtime
    (shuffled hash / sort-merge — these are key-equi joins, so the
    fallback is never a nested-loop join; pinned in
    tests/test_plans.py). If the estimate is unavailable the helper
    also declines to hint — wrong-but-safe beats fast-but-OOM."""
    try:
        size = int(df._jdf.queryExecution().optimizedPlan()
                     .stats().sizeInBytes())
    except Exception:
        return df
    return F.broadcast(df) if size <= _BCAST_CAP_BYTES else df


# ------------------------------------------------------- pricing summary

def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 flavor: per (returnflag, linestatus) — quantities, gross
    and discounted revenue, averages. One scan, map-side partial
    aggregation into 4-6 groups; revenue summed as exact integer
    cents·cents (4dp) and divided once."""
    li = _rd(spark, sf_dir, "lineitem")
    qty = _cents(F.col("l_quantity"))        # 2dp-exact integer units
    price = _cents(F.col("l_extendedprice"))
    disc_rev = price * _cents(F.lit(1.0) - F.col("l_discount"))  # 4dp int
    n = F.count(F.lit(1))
    return (li.groupBy("l_returnflag", "l_linestatus")
              .agg(n.alias("count_order"),
                   F.round(F.sum(qty) / 100, 2).alias("sum_qty"),
                   F.round(F.sum(price) / 100, 2).alias("sum_base_price"),
                   F.round(F.sum(disc_rev) / 10000, 2)
                    .alias("sum_disc_price"),
                   F.round(F.sum(qty) / n / 100, 6).alias("avg_qty"),
                   F.round(F.sum(price) / n / 100, 6).alias("avg_price")))


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus, count(*) AS count_order,
       round(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0, 2)
         AS sum_qty,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2)
         AS sum_base_price,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round((1.0 - l_discount) * 100) AS BIGINT))
             / 10000.0, 2) AS sum_disc_price,
       round(sum(CAST(round(l_quantity * 100) AS BIGINT)) * 1.0
             / count(*) / 100, 6) AS avg_qty,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) * 1.0
             / count(*) / 100, 6) AS avg_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# ----------------------------------------------------- revenue by nation

def q_revenue_by_nation(spark, sf_dir):
    """TPC-H Q5 flavor: discounted revenue by customer nation. Join
    order/strategy matters at 100 TB and Catalyst gets it right when the
    plan is declared: nation (25 rows) and customer (0.15M at sf1)
    broadcast; lineitem ⋈ orders is the single shuffle, keyed on
    orderkey. Plan pinned in tests: exactly one hash-partitioned
    exchange pair, two-plus broadcasts."""
    li = _rd(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (_cents(F.col("l_extendedprice"))
         * _cents(F.lit(1.0) - F.col("l_discount"))).alias("rev4"))
    o = _rd(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _rd(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _rd(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
           .join(_bcast_dim(c), o.o_custkey == c.c_custkey)
           .join(F.broadcast(n), c.c_nationkey == n.n_nationkey))
    return (j.groupBy("n_name")
             .agg(F.count(F.lit(1)).alias("n_items"),
                  F.round(F.sum("rev4") / 10000, 2).alias("revenue")))


SQL_REVENUE_BY_NATION = """
SELECT n.n_name, count(*) AS n_items,
       round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * CAST(round((1.0 - l.l_discount) * 100) AS BIGINT))
             / 10000.0, 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


# ------------------------------------------------------- revenue trend

def q_revenue_trend(spark, sf_dir):
    """Monthly revenue trend with month-over-month delta — the ordered
    analytic-window shape (lag over a time series). The global window is
    safe BECAUSE it runs after aggregation: months are bounded (~100 rows
    at any scale factor), so the fact table reduces map-side to one row
    per month before the single-partition sort ever happens. Cent math
    stays integral through the lag; division happens last."""
    from pyspark.sql import Window
    from photon_spark.queries import _t

    o = _t(spark, sf_dir, "orders")
    month = F.to_date(F.date_trunc(
        "month", F.timestamp_seconds(F.expr("o_orderdate div 1000000000"))))
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    m = (o.groupBy(month.alias("month"))
          .agg(F.count(F.lit(1)).alias("n_orders"),
               F.sum(cents).alias("c")))
    w = Window.orderBy("month")
    return m.select(
        "month", "n_orders",
        F.round(F.col("c") / 100, 2).alias("revenue"),
        F.round((F.col("c") - F.lag("c").over(w)) / 100, 2)
         .alias("mom_delta"))


SQL_REVENUE_TREND = """
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         count(*) AS n_orders,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS c
  FROM orders GROUP BY 1
)
SELECT month, n_orders, round(c / 100.0, 2) AS revenue,
       round((c - lag(c) OVER (ORDER BY month)) / 100.0, 2) AS mom_delta
FROM m
"""


#: 1998-06-01 UTC in epoch-ns (the _t contract: timestamps are ns longs)
_Q3_CUT_NS = 896_659_200 * 1_000_000_000


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 flavor: top-10 unshipped orders by discounted revenue for
    one market segment. The fact join shuffles lineitem⋈orders once on
    orderkey; the filtered customer dimension broadcasts; both date
    predicates sit in the scan (pushed to parquet), so at 100 TB the
    shuffle carries only the post-filter fact rows. Revenue is exact
    4dp integer money divided once."""
    from photon_spark.queries import _t_pruned

    c = (_rd(spark, sf_dir, "customer")
         .where(F.col("c_mktsegment") == "BUILDING")
         .select("c_custkey"))
    o = (_t_pruned(spark, sf_dir, "orders",
                   {"o_orderdate": (None, _Q3_CUT_NS)})
         .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"))
    # strict > on µs-quantized data ≡ >= cut + 1µs, keeping the bound
    # scan-prunable
    li = (_t_pruned(spark, sf_dir, "lineitem",
                    {"l_shipdate": (_Q3_CUT_NS + 1_000, None)})
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    rev = (_cents(F.col("l_extendedprice"))
           * _cents(F.lit(1.0) - F.col("l_discount")))
    date = F.to_date(F.timestamp_seconds(
        F.expr("o_orderdate div 1000000000")))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(_bcast_dim(c), o.o_custkey == c.c_custkey)
              .groupBy("o_orderkey", date.alias("o_orderdate"),
                       "o_orderpriority")
              .agg(F.sum(rev).alias("rc"))
              .select("o_orderkey", "o_orderdate", "o_orderpriority",
                      F.round(F.col("rc") / 10000, 4).alias("revenue"))
              .orderBy(F.desc("revenue"), "o_orderdate", "o_orderkey")
              .limit(10))


SQL_SHIPPING_PRIORITY = """
SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS o_orderdate,
       o.o_orderpriority,
       round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * CAST(round((1.0 - l.l_discount) * 100) AS BIGINT))
             / 10000.0, 4) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o_orderdate, o_orderkey LIMIT 10
"""


LARGE_ORDER_QTY = 150


def q_large_orders(spark, sf_dir):
    """TPC-H Q18 flavor: orders whose total lineitem quantity exceeds a
    threshold, with the customer attached. The HAVING runs on the
    pre-aggregated lineitem relation (map-side partials shrink it before
    the shuffle), the few surviving orderkeys then join orders and the
    broadcast customer dim — aggregate-then-join, never join-then-
    aggregate. Quantities are 2dp-exact integer units."""
    li = _rd(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
             .agg(F.sum(_cents(F.col("l_quantity"))).alias("qc"))
             .where(F.col("qc") > LARGE_ORDER_QTY * 100))
    o = _rd(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    c = _rd(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (big.join(o, big.l_orderkey == o.o_orderkey)
               .join(_bcast_dim(c), o.o_custkey == c.c_custkey)
               .select("c_name", "o_orderkey",
                       F.round(F.col("qc") / 100, 2).alias("total_qty"),
                       F.round(F.col("o_totalprice"), 2).alias("o_totalprice"))
               .orderBy(F.desc("total_qty"), "o_orderkey")
               .limit(20))


SQL_LARGE_ORDERS = f"""
WITH big AS (
  SELECT l_orderkey,
         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qc
  FROM lineitem GROUP BY 1
  HAVING qc > {LARGE_ORDER_QTY * 100}
)
SELECT c.c_name, o.o_orderkey, round(qc / 100.0, 2) AS total_qty,
       round(o.o_totalprice, 2) AS o_totalprice
FROM big JOIN orders o ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY total_qty DESC, o_orderkey LIMIT 20
"""


SEG_TOPN = 3


def q_top_customers_per_segment(spark, sf_dir):
    """Rank window over an aggregate: each market segment's top-3
    customers by lifetime order value. The orders fact reduces to one
    row per customer BEFORE the window (partial agg + one custkey
    shuffle); the rank then runs over the small per-customer relation
    and Spark's WindowGroupLimit stops each partition at k — never a
    full per-segment sort of ranked output."""
    from pyspark.sql import Window
    o = _rd(spark, sf_dir, "orders")
    c = _rd(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment")
    per_cust = (o.groupBy("o_custkey")
                 .agg(F.sum(_cents(F.col("o_totalprice"))).alias("vc"),
                      F.count(F.lit(1)).alias("n_orders")))
    w = (Window.partitionBy("c_mktsegment")
               .orderBy(F.desc("vc"), F.asc("c_custkey")))
    return (per_cust.join(_bcast_dim(c),
                          per_cust.o_custkey == c.c_custkey)
                    .withColumn("rk", F.row_number().over(w))
                    .where(F.col("rk") <= SEG_TOPN)
                    .select("c_mktsegment", "rk", "c_name", "n_orders",
                            F.round(F.col("vc") / 100, 2)
                             .alias("lifetime_value")))


SQL_TOP_CUSTOMERS_PER_SEGMENT = f"""
WITH per_cust AS (
  SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS vc,
         count(*) AS n_orders
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT c.c_mktsegment,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY vc DESC, o_custkey) AS rk,
         c.c_name, n_orders, round(vc / 100.0, 2) AS lifetime_value
  FROM per_cust JOIN customer c ON per_cust.o_custkey = c.c_custkey
)
SELECT c_mktsegment, rk, c_name, n_orders, lifetime_value
FROM ranked WHERE rk <= {SEG_TOPN}
"""


def q_revenue_rollup(spark, sf_dir):
    """ROLLUP aggregate: revenue at (nation, year), per-nation subtotal,
    and grand total in one pass — Spark expands grouping sets map-side,
    so the rollup costs one shuffle of (nation, year, partials), not
    three queries. NULL grouping keys are the subtotal markers (coalesced
    to labels so the oracle hash agrees on sort order)."""
    from photon_spark.queries import _t
    o = _t(spark, sf_dir, "orders")
    c = _rd(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _rd(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    yr = F.year(F.timestamp_seconds(F.expr("o_orderdate div 1000000000")))
    j = (o.join(_bcast_dim(c), o.o_custkey == c.c_custkey)
          .join(F.broadcast(n), c.c_nationkey == n.n_nationkey))
    return (j.rollup(F.col("n_name").alias("nation"), yr.alias("year"))
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  F.sum(_cents(F.col("o_totalprice"))).alias("vc"))
             .select(F.coalesce("nation", F.lit("ALL")).alias("nation"),
                     F.coalesce(F.col("year").cast("string"), F.lit("ALL"))
                      .alias("year"),
                     "n_orders",
                     F.round(F.col("vc") / 100, 2).alias("revenue")))


SQL_REVENUE_ROLLUP = """
SELECT coalesce(n.n_name, 'ALL') AS nation,
       coalesce(CAST(year(o.o_orderdate) AS VARCHAR), 'ALL') AS year,
       count(*) AS n_orders,
       round(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0, 2)
         AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP (n.n_name, year(o.o_orderdate))
"""


def q_events_pivot(spark, sf_dir):
    """Pivot: per-user-cohort (user_id mod 10) event counts spread across
    event types as columns — the wide-format report shape. The pivot
    values are declared literally, so this is ONE pass with conditional
    aggregation (exactly what the SQL oracle spells out), not
    count-distinct-then-N-queries."""
    from photon_spark.queries import _t
    e = _t(spark, sf_dir, "events")
    types = ["click", "purchase", "signup", "view", "error"]
    return (e.groupBy(F.pmod("user_id", F.lit(10)).alias("cohort"))
             .pivot("event_type", types)
             .agg(F.count(F.lit(1)))
             .na.fill(0, types))


SQL_EVENTS_PIVOT = """
SELECT user_id % 10 AS cohort,
       CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END), 0)
            AS BIGINT) AS click,
       CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0)
            AS BIGINT) AS purchase,
       CAST(coalesce(sum(CASE WHEN event_type = 'signup' THEN 1 END), 0)
            AS BIGINT) AS signup,
       CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN 1 END), 0)
            AS BIGINT) AS view,
       CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN 1 END), 0)
            AS BIGINT) AS error
FROM events GROUP BY 1
"""


#: 2001-01-01 UTC epoch-ns — "no order in the final data year"
_IDLE_CUT_NS = 978_307_200 * 1_000_000_000


def q_idle_customers(spark, sf_dir):
    """Anti-join: customers with no RECENT order (none in the final data
    year), counted per market segment with their parked balance.
    Compiles to a broadcast/shuffled hash anti-join on custkey — the
    orders side is date-filtered in the scan and reduced to DISTINCT
    custkeys before the join (aggregate-then-join again), so the anti
    probe is against a set, not the fact table."""
    from photon_spark.queries import _t_pruned
    c = _rd(spark, sf_dir, "customer")
    o = (_t_pruned(spark, sf_dir, "orders",
                   {"o_orderdate": (_IDLE_CUT_NS, None)})
         .select("o_custkey").distinct())
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
             .groupBy("c_mktsegment")
             .agg(F.count(F.lit(1)).alias("n_idle"),
                  F.round(F.sum(F.round(F.col("c_acctbal") * 100)
                                .cast("long")) / 100, 2)
                   .alias("parked_balance")))


SQL_IDLE_CUSTOMERS = """
SELECT c_mktsegment, count(*) AS n_idle,
       round(sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0, 2)
         AS parked_balance
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY 1
"""


# ------------------------------------------------- nation-pair volume

#: Q7-flavor ship-date window, epoch-ns (1996-01-01 .. 1998-01-01)
_Q7_LO_NS = 820_454_400 * 1_000_000_000
_Q7_HI_NS = 883_612_800 * 1_000_000_000


def q_nation_trade_volume(spark, sf_dir):
    """TPC-H Q7 flavor: trade volume between every (supplier nation,
    customer nation) pair over a two-year ship window. The pattern this
    adds to the relational evidence: a fact row joining TWO different
    dimension chains (lineitem→supplier→nation and
    lineitem→orders→customer→nation) with a cross-dimension predicate
    (nations differ) that can only be applied after both chains land.

    Plan: supplier/customer/nation broadcast; lineitem⋈orders is the one
    real shuffle, keyed on orderkey; the pair groupBy collapses map-side
    to ≤ nations² rows. Date predicate sits in the lineitem scan.
    """
    from photon_spark.queries import _t_pruned
    li = (_t_pruned(spark, sf_dir, "lineitem",
                    {"l_shipdate": (_Q7_LO_NS, _Q7_HI_NS)})
          .select("l_orderkey", "l_suppkey",
                  (_cents(F.col("l_extendedprice"))
                   * _cents(F.lit(1.0) - F.col("l_discount")))
                  .alias("rev4")))
    o = _rd(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _rd(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _rd(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = _rd(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    n2 = _rd(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
           .join(_bcast_dim(c), o.o_custkey == c.c_custkey)
           .join(_bcast_dim(s), li.l_suppkey == s.s_suppkey)
           .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sk"))
           .join(F.broadcast(n2), F.col("c_nationkey") == F.col("ck"))
           .where(F.col("supp_nation") != F.col("cust_nation")))
    return (j.groupBy("supp_nation", "cust_nation")
             .agg(F.count(F.lit(1)).alias("n_items"),
                  F.round(F.sum("rev4") / 10000, 2).alias("volume")))


SQL_NATION_TRADE_VOLUME = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       count(*) AS n_items,
       round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * CAST(round((1.0 - l.l_discount) * 100) AS BIGINT))
             / 10000.0, 2) AS volume
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
  AND n1.n_name != n2.n_name
GROUP BY 1, 2
"""


# --------------------------------------------------- promo revenue share

#: Q14-flavor window (1997-01-01 .. 1997-07-01) and the "promo" class
_Q14_LO_NS = 852_076_800 * 1_000_000_000
_Q14_HI_NS = 867_715_200 * 1_000_000_000
_PROMO_TYPE = "ECONOMY"


def q_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 flavor: the share of revenue from one part class in a
    ship window — the conditional-aggregate-ratio pattern (two exact
    integer sums in ONE fact pass, one final division). Part broadcasts;
    the only wide thing that moves is the date-pruned lineitem scan."""
    from photon_spark.queries import _t_pruned
    li = (_t_pruned(spark, sf_dir, "lineitem",
                    {"l_shipdate": (_Q14_LO_NS, _Q14_HI_NS)})
          .select("l_partkey",
                  (_cents(F.col("l_extendedprice"))
                   * _cents(F.lit(1.0) - F.col("l_discount")))
                  .alias("rev4")))
    p = _rd(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(_bcast_dim(p), li.l_partkey == p.p_partkey)
    promo = F.when(F.col("p_type") == _PROMO_TYPE, F.col("rev4")) \
             .otherwise(F.lit(0))
    return j.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(promo) / 10000, 2).alias("promo_revenue"),
        F.round(F.sum("rev4") / 10000, 2).alias("total_revenue"),
        F.round((F.lit(100.0) * F.sum(promo).cast("double"))
                / F.sum("rev4").cast("double"), 6).alias("promo_share_pct"))


SQL_PROMO_REVENUE_SHARE = f"""
WITH j AS (
  SELECT p.p_type,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * CAST(round((1.0 - l.l_discount) * 100) AS BIGINT) AS rev4
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-07-01'
)
SELECT count(*) AS n_items,
       round(sum(CASE WHEN p_type = '{_PROMO_TYPE}' THEN rev4 ELSE 0 END)
             / 10000.0, 2) AS promo_revenue,
       round(sum(rev4) / 10000.0, 2) AS total_revenue,
       round((100.0 * sum(CASE WHEN p_type = '{_PROMO_TYPE}'
                          THEN rev4 ELSE 0 END)::DOUBLE)
             / sum(rev4)::DOUBLE, 6) AS promo_share_pct
FROM j
"""


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "revenue_trend": q_revenue_trend,
    "shipping_priority": q_shipping_priority,
    "large_orders": q_large_orders,
    "top_customers_per_segment": q_top_customers_per_segment,
    "revenue_rollup": q_revenue_rollup,
    "events_pivot": q_events_pivot,
    "idle_customers": q_idle_customers,
}

# ------------------------------------------------ exact correlation

def q_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue locked in small-quantity orders — lines
    whose quantity is below 20% of their part's average, rolled up per
    brand as forgone average-yearly revenue. The correlated-scalar-
    subquery classic, decorrelated the way Catalyst does: the per-part
    aggregate is an ordinary relation joined back on partkey (at scale:
    one shuffle each side on l_partkey, or broadcast when parts fit).
    The 20%-of-average predicate cross-multiplies to exact integers
    (5·qty·cnt < Σqty in cents) — no float threshold to disagree on."""
    li = _rd(spark, sf_dir, "lineitem")
    p = _rd(spark, sf_dir, "part")
    qc = _cents(F.col("l_quantity"))
    pc = _cents(F.col("l_extendedprice"))
    per_part = (li.groupBy("l_partkey")
                  .agg(F.count(F.lit(1)).alias("cnt"),
                       F.sum(qc).alias("sq")))
    j = (li.select("l_partkey", qc.alias("qc"), pc.alias("pc"))
           .join(per_part, "l_partkey")
           .where(F.col("qc") * F.col("cnt") * 5 < F.col("sq"))
           .join(p.select(F.col("p_partkey").alias("l_partkey"), "p_brand"),
                 "l_partkey"))
    return (j.groupBy("p_brand")
             .agg(F.count(F.lit(1)).alias("n_lines"),
                  F.round(F.sum("pc") / 100 / 7.0, 2).alias("avg_yearly")))


SQL_SMALL_QUANTITY_REVENUE = """
WITH per_part AS (
  SELECT l_partkey, count(*) AS cnt,
         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sq
  FROM lineitem GROUP BY 1
)
SELECT p.p_brand, count(*) AS n_lines,
       round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
             / 100.0 / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN per_part pp ON pp.l_partkey = l.l_partkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE CAST(round(l.l_quantity * 100) AS BIGINT) * pp.cnt * 5 < pp.sq
GROUP BY 1
"""


#: a line is "late" when it ships more than 60 days after the order date
_LATE_NS = 60 * 86_400_000_000_000


def q_lone_late_supplier(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who single-handedly kept multi-supplier
    orders waiting — on orders served by >1 supplier, exactly one of whom
    shipped late (> 60 days after order date), count the offenses per
    supplier. The EXISTS / NOT-EXISTS double-correlation classic,
    expressed as two stacked aggregates over ONE orderkey exchange
    instead of correlated subqueries (or the aggregate+self-join the r10
    verdict flagged): lineitem repartitions by l_orderkey at the scan —
    hash(l_orderkey) satisfies the (orderkey, suppkey) aggregate's AND
    the per-order aggregate's distribution, so the broadcast orders
    join, the late-flag fold, and the ns/nl/lone-supplier rollup all run
    in the same stage with no further shuffle; when nl == 1 the lone
    late supplier IS max(suppkey where late), so no join back to f is
    ever needed. Only the tiny per-supplier count shuffles again. Time
    arithmetic is pure epoch-ns integers on both engines (the _t
    contract)."""
    from photon_spark.queries import _t

    li = (_t(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_shipdate")
          .repartition("l_orderkey"))
    # orders is a FACT (1.5M·sf rows) — never force-broadcast it; AQE
    # broadcasts at test scale on its own, and at scale the SMJ shuffles
    # only the orders side (li already carries hash(l_orderkey))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    f = (li.join(o, li.l_orderkey == o.o_orderkey)
           .groupBy("l_orderkey", "l_suppkey")
           .agg(F.max((F.col("l_shipdate") - F.col("o_orderdate")
                       > _LATE_NS).cast("int")).alias("late")))
    a = (f.groupBy("l_orderkey")
          .agg(F.count(F.lit(1)).alias("ns"),
               F.sum("late").alias("nl"),
               F.max(F.when(F.col("late") == 1, F.col("l_suppkey")))
                .alias("l_suppkey")))
    lone = a.where((F.col("ns") > 1) & (F.col("nl") == 1))
    s = _rd(spark, sf_dir, "supplier")
    return (lone.groupBy("l_suppkey")
                .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
                .join(_bcast_dim(
                    s.select(F.col("s_suppkey").alias("l_suppkey"),
                             "s_name")), "l_suppkey")
                .select(F.col("l_suppkey").alias("s_suppkey"), "s_name",
                        "numwait"))


SQL_LONE_LATE_SUPPLIER = f"""
WITH f AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN epoch_ns(l_shipdate) - epoch_ns(o_orderdate)
                       > {_LATE_NS} THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
), a AS (
  SELECT l_orderkey, count(*) AS ns, sum(late) AS nl FROM f GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM f JOIN a USING (l_orderkey)
JOIN supplier s ON s.s_suppkey = f.l_suppkey
WHERE f.late = 1 AND a.ns > 1 AND a.nl = 1
GROUP BY 1, 2
"""


def q_revenue_cube(spark, sf_dir):
    """CUBE aggregate: revenue by (customer nation × order year) with ALL
    subtotal combinations and a grouping_id marking which axes each row
    aggregates away — the OLAP lattice shape (GROUP BY CUBE), distinct
    from the linear ROLLUP already gated. Cent-exact sums; year from the
    epoch-ns contract under the pinned UTC session."""
    from photon_spark.queries import _t

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year(F.timestamp_seconds(F.expr("o_orderdate div 1000000000")))
         .alias("yr"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    c = _rd(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _rd(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (o.join(_bcast_dim(c), o.o_custkey == c.c_custkey)
           .join(F.broadcast(n), c.c_nationkey == n.n_nationkey))
    return (j.cube("n_name", "yr")
             .agg(F.grouping_id().cast("long").alias("gid"),
                  F.count(F.lit(1)).alias("n_orders"),
                  F.round(F.sum("cents") / 100, 2).alias("revenue")))


SQL_REVENUE_CUBE = """
SELECT n.n_name, year(o.o_orderdate) AS yr,
       CAST(GROUPING(n.n_name, year(o.o_orderdate)) AS BIGINT) AS gid,
       count(*) AS n_orders,
       round(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0, 2)
         AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY CUBE (n.n_name, year(o.o_orderdate))
"""


#: leading events kept per user journey
JOURNEY_LEN = 10


def q_user_journeys(spark, sf_dir):
    """Ordered-array aggregation: each user's first {JOURNEY_LEN} event
    types in (ts, event_id) order — behavioral sequences as data (the
    journey relation a sequence model trains on), and the gate's exercise
    of deterministic ORDER-SENSITIVE list aggregation. One keyed shuffle;
    the sort is per-group. The gated output is the '>'-joined STRING form
    of the sequence (not the raw array): every gated output column must be
    a scalar primitive, because the driver's canonicalizer sorts raw
    columns with pandas and cannot hash array cells (round-5 verdict —
    the order-sensitivity this query exists to prove survives the join
    verbatim)."""
    from photon_spark.queries import _t

    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id",
                                           "event_type")
    arr = F.array_sort(F.collect_list(
        F.struct("ts", "event_id", "event_type")))
    g = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"),
                                 arr.alias("a"))
    # slice BEFORE projecting: touch at most JOURNEY_LEN elements per user
    journey = F.array_join(F.transform(
        F.slice("a", 1, JOURNEY_LEN), lambda s: s["event_type"]), ">")
    return g.select("user_id", "n_events", journey.alias("journey"))


SQL_USER_JOURNEYS = f"""
WITH o AS (
  SELECT user_id, epoch_ns(ts) AS tns, event_id, event_type FROM events
)
SELECT user_id, count(*) AS n_events,
       array_to_string((list(event_type ORDER BY tns, event_id))
                       [1:{JOURNEY_LEN}], '>') AS journey
FROM o GROUP BY user_id
"""


def q_customer_spend_quartiles(spark, sf_dir):
    """ntile quartiles: customers ranked into spend quartiles WITHIN their
    market segment (ntile's equal-fill bucket rule, deterministic under
    the (spend desc, custkey) total order), rolled up per (segment,
    quartile) — the cohort-banding shape every LTV analysis uses. The
    window partitions by segment, so no single-partition sort."""
    from pyspark.sql import Window

    o = _rd(spark, sf_dir, "orders").select(
        "o_custkey", F.round(F.col("o_totalprice") * 100).cast("long")
        .alias("cents"))
    spend = o.groupBy("o_custkey").agg(F.sum("cents").alias("sc"),
                                       F.count(F.lit(1)).alias("n_ord"))
    c = _rd(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = c.join(spend, c.c_custkey == spend.o_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("sc"),
                                                   "c_custkey")
    q = j.withColumn("quartile", F.ntile(4).over(w).cast("long"))
    return (q.groupBy("c_mktsegment", "quartile")
             .agg(F.count(F.lit(1)).alias("n_customers"),
                  F.sum("n_ord").alias("n_orders"),
                  F.round(F.sum("sc") / 100, 2).alias("total_spend"),
                  F.round(F.sum("sc") / F.count(F.lit(1)) / 100, 6)
                   .alias("avg_spend")))


SQL_CUSTOMER_SPEND_QUARTILES = """
WITH spend AS (
  SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sc,
         count(*) AS n_ord
  FROM orders GROUP BY 1
), q AS (
  SELECT c.c_mktsegment, s.sc, s.n_ord,
         CAST(ntile(4) OVER (PARTITION BY c.c_mktsegment
                             ORDER BY s.sc DESC, c.c_custkey) AS BIGINT)
           AS quartile
  FROM customer c JOIN spend s ON c.c_custkey = s.o_custkey
)
SELECT c_mktsegment, quartile, count(*) AS n_customers,
       CAST(sum(n_ord) AS BIGINT) AS n_orders,
       round(sum(sc) / 100.0, 2) AS total_spend,
       round(sum(sc) * 1.0 / count(*) / 100, 6) AS avg_spend
FROM q GROUP BY 1, 2
"""


def q_price_quantity_corr(spark, sf_dir):
    """Pearson correlation of quantity vs extended price per return
    flag — single-pass distributed statistics done hash-gateably: the
    five moment sums accumulate as EXACT integers (2dp-cent inputs,
    decimal(38) products so n·Σxy cannot overflow), and the only floats
    are the final casts, two IEEE-correctly-rounded sqrts, and one
    division — bit-identical on both engines.

    Plan: one fact scan, map-side partial moments, 3-group final
    aggregate. The same shape yields a full covariance matrix at d²
    columns per group.
    """
    li = _rd(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        _cents(F.col("l_quantity")).alias("x"),
        _cents(F.col("l_extendedprice")).alias("y"))
    dec = "decimal(38,0)"
    g = (li.groupBy("l_returnflag")
           .agg(F.count(F.lit(1)).cast(dec).alias("n"),
                F.sum("x").cast(dec).alias("sx"),
                F.sum("y").cast(dec).alias("sy"),
                F.sum(F.col("x").cast(dec) * F.col("x").cast(dec))
                 .alias("sxx"),
                F.sum(F.col("y").cast(dec) * F.col("y").cast(dec))
                 .alias("syy"),
                F.sum(F.col("x").cast(dec) * F.col("y").cast(dec))
                 .alias("sxy")))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        .cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) \
        .cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")) \
        .cast("double")
    return (g.select("l_returnflag", F.col("n").cast("long").alias("n"),
                     F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6)
                      .alias("corr_qty_price"))
             .orderBy("l_returnflag"))


SQL_PRICE_QUANTITY_CORR = """
WITH m AS (
  SELECT l_returnflag,
         CAST(round(l_quantity * 100) AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
), g AS (
  SELECT l_returnflag, count(*)::HUGEINT AS n,
         sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
         sum(x::HUGEINT * x::HUGEINT) AS sxx,
         sum(y::HUGEINT * y::HUGEINT) AS syy,
         sum(x::HUGEINT * y::HUGEINT) AS sxy
  FROM m GROUP BY 1
)
SELECT l_returnflag, n::BIGINT AS n,
       round((n * sxy - sx * sy)::DOUBLE
             / (sqrt((n * sxx - sx * sx)::DOUBLE)
                * sqrt((n * syy - sy * sy)::DOUBLE)), 6)
         AS corr_qty_price
FROM g ORDER BY 1
"""


QUERIES["nation_trade_volume"] = q_nation_trade_volume
QUERIES["promo_revenue_share"] = q_promo_revenue_share
QUERIES["price_quantity_corr"] = q_price_quantity_corr
QUERIES["small_quantity_revenue"] = q_small_quantity_revenue
def q_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 flavor: the distribution of orders-per-customer
    INCLUDING the zero bucket — customers with no (non-urgent) orders
    only exist through the outer join, the relational shape no inner
    join can express (and the one §2.8 gap row the gate didn't yet
    demonstrate: left-outer + double aggregation).

    Plan shape: aggregate orders FIRST (one custkey shuffle with
    map-side combine collapses the fact table to ≤ |customers| rows),
    then left-join customers and aggregate the counts — never a
    customers×orders join of raw rows. At 100 TB the first aggregate is
    the only heavy exchange and AQE broadcasts the collapsed side."""
    o = (_rd(spark, sf_dir, "orders")
         .where(F.col("o_orderpriority") != "1-URGENT")
         .groupBy("o_custkey")
         .agg(F.count(F.lit(1)).alias("c_count")))
    c = _rd(spark, sf_dir, "customer").select("c_custkey")
    return (c.join(o, c.c_custkey == o.o_custkey, "left")
             .select(F.coalesce("c_count", F.lit(0)).cast("long")
                      .alias("c_count"))
             .groupBy("c_count")
             .agg(F.count(F.lit(1)).alias("n_customers")))


SQL_ORDER_COUNT_DISTRIBUTION = """
SELECT c_count, count(*) AS n_customers FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey)
GROUP BY c_count
"""


def q_events_unpivot(spark, sf_dir):
    """UNPIVOT (stack): melt the wide per-cohort pivot report back into
    long (cohort, metric, n) form and summarize per metric — the
    wide→long reshape that completes the pivot/unpivot pair
    (`events_pivot` is the long→wide half). `stack` is a map-side
    Generate: zero extra shuffles beyond the pivot's own aggregate, and
    the melt is where a 100-column feature report becomes the
    (entity, feature, value) triples a feature store ingests."""
    from photon_spark.queries import _t
    e = _t(spark, sf_dir, "events")
    types = ["click", "purchase", "signup", "view", "error"]
    wide = (e.groupBy(F.pmod("user_id", F.lit(10)).alias("cohort"))
             .pivot("event_type", types)
             .agg(F.count(F.lit(1)))
             .na.fill(0, types))
    stack_args = ", ".join(f"'{t}', {t}" for t in types)
    long = wide.select(
        "cohort",
        F.expr(f"stack({len(types)}, {stack_args}) AS (metric, n)"))
    return (long.groupBy("metric")
                .agg(F.count(F.lit(1)).alias("n_cohorts"),
                     F.sum((F.col("n") > 0).cast("long"))
                      .alias("n_cohorts_active"),
                     F.sum("n").cast("long").alias("total"),
                     F.max("n").cast("long").alias("max_per_cohort")))


SQL_EVENTS_UNPIVOT = """
WITH long AS (
  SELECT user_id % 10 AS cohort, event_type AS metric, count(*) AS n
  FROM events
  WHERE event_type IN ('click', 'purchase', 'signup', 'view', 'error')
  GROUP BY 1, 2
), cohorts AS (
  SELECT DISTINCT user_id % 10 AS cohort FROM events
), metrics AS (
  SELECT unnest(['click', 'purchase', 'signup', 'view', 'error'])
    AS metric
), dense AS (
  SELECT c.cohort, m.metric, coalesce(l.n, 0) AS n
  FROM cohorts c CROSS JOIN metrics m
  LEFT JOIN long l ON l.cohort = c.cohort AND l.metric = m.metric
)
SELECT metric, count(*) AS n_cohorts,
       CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cohorts_active,
       CAST(sum(n) AS BIGINT) AS total,
       CAST(max(n) AS BIGINT) AS max_per_cohort
FROM dense GROUP BY metric
"""


# --------------------------------------------- Q11: value concentration

def q_part_value_concentration(spark, sf_dir):
    """TPC-H Q11 shape (adapted: no partsupp table in the testdata, so
    lineitem revenue stands in for stock value): parts whose total
    revenue exceeds 1.2× the average part's — the group-by + HAVING
    against a scalar subquery over the SAME aggregate.

    Plan: ONE shuffle (groupBy partkey over cents); the grand
    total/count re-aggregate from the ~|parts| relation and broadcast
    back as one row. The threshold compare is INTEGER-exact
    (rev·5·n > 6·total ⇔ rev > 1.2·avg) — no double boundary to flip
    cross-engine; the share divides once at output."""
    li = _rd(spark, sf_dir, "lineitem")
    rev = F.col("revenue_c")
    parts = (li.groupBy("l_partkey")
               .agg(F.sum(_cents(F.col("l_extendedprice")
                                 * (1 - F.col("l_discount"))))
                     .alias("revenue_c")))
    tot = parts.agg(F.sum("revenue_c").alias("t"),
                    F.count(F.lit(1)).alias("n"))
    return (parts.crossJoin(F.broadcast(tot))
                 .where(rev * 5 * F.col("n") > 6 * F.col("t"))
                 .select("l_partkey",
                         F.round(rev / 100, 2).alias("revenue"),
                         F.round(rev / F.col("t"), 6).alias("share")))


SQL_PART_VALUE_CONCENTRATION = """
WITH parts AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS revenue_c
  FROM lineitem GROUP BY 1
), tot AS (
  SELECT sum(revenue_c) AS t, count(*) AS n FROM parts
)
SELECT l_partkey, round(revenue_c / 100.0, 2) AS revenue,
       round(revenue_c * 1.0 / t, 6) AS share
FROM parts, tot
WHERE revenue_c * 5 * n > 6 * t
"""


# ------------------------------------------------- Q15: top supplier

def q_top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) with THE maximum revenue over a
    ship-date quarter — the revenue-view + scalar-max + equality-join
    form (ties kept, exactly Q15's contract).

    Plan: window-filtered lineitem aggregates once by suppkey (cents,
    exact); the one-row max broadcasts back; the equality filter keeps
    the top tie set; the supplier dim broadcasts for the name. Integer
    equality — no float boundary."""
    from photon_spark.queries import _t_pruned
    li = _t_pruned(spark, sf_dir, "lineitem",
                   {"l_shipdate": (_Q14_LO_NS, _Q14_HI_NS)})
    rev = (li.groupBy("l_suppkey")
             .agg(F.sum(_cents(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))))
                   .alias("revenue_c")))
    mx = rev.agg(F.max("revenue_c").alias("mx"))
    s = _rd(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (rev.crossJoin(F.broadcast(mx))
               .where(F.col("revenue_c") == F.col("mx"))
               .join(_bcast_dim(s),
                     F.col("l_suppkey") == F.col("s_suppkey"))
               .select(F.col("s_suppkey"), F.col("s_name"),
                       F.round(F.col("revenue_c") / 100, 2)
                        .alias("total_revenue")))


SQL_TOP_SUPPLIER_REVENUE = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS revenue_c
  FROM lineitem
  WHERE epoch_ns(l_shipdate) >= 852076800000000000
    AND epoch_ns(l_shipdate) < 867715200000000000
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, round(r.revenue_c / 100.0, 2)
         AS total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.revenue_c = (SELECT max(revenue_c) FROM rev)
"""


# --------------------------------------------- Q22: idle rich customers

def q_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: customers with an above-average (among positive
    balances) account balance and no RECENT order (none in the final
    data year — every synthetic customer has SOME order, so the literal
    "no orders ever" predicate is vacuous here), rolled up by nation.
    The Q22 form survives intact: scalar-subquery threshold + NOT
    EXISTS anti-join.

    Plan: the positive-balance average reduces to one broadcast row; the
    anti probe is against date-filtered DISTINCT o_custkey
    (aggregate-then-join); threshold compare is integer-exact
    (bal·n_pos > sum_pos)."""
    from photon_spark.queries import _t_pruned
    c = (_rd(spark, sf_dir, "customer")
         .withColumn("bal_c", _cents(F.col("c_acctbal"))))
    pos = (c.where(F.col("bal_c") > 0)
            .agg(F.sum("bal_c").alias("s"), F.count(F.lit(1)).alias("n")))
    o = (_t_pruned(spark, sf_dir, "orders",
                   {"o_orderdate": (_IDLE_CUT_NS, None)})
         .select("o_custkey").distinct())
    return (c.crossJoin(F.broadcast(pos))
             .where(F.col("bal_c") * F.col("n") > F.col("s"))
             .join(o, c.c_custkey == o.o_custkey, "left_anti")
             .groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
             .agg(F.count(F.lit(1)).alias("n_custs"),
                  F.round(F.sum("bal_c") / 100, 2).alias("total_acctbal")))


SQL_IDLE_RICH_CUSTOMERS = """
WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer
), pos AS (
  SELECT sum(bal_c) AS s, count(*) AS n FROM c WHERE bal_c > 0
)
SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS n_custs,
       round(sum(bal_c) / 100.0, 2) AS total_acctbal
FROM c, pos
WHERE bal_c * n > s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY 1
"""


QUERIES["lone_late_supplier"] = q_lone_late_supplier
QUERIES["order_count_distribution"] = q_order_count_distribution
QUERIES["events_unpivot"] = q_events_unpivot
QUERIES["revenue_cube"] = q_revenue_cube
QUERIES["user_journeys"] = q_user_journeys
QUERIES["customer_spend_quartiles"] = q_customer_spend_quartiles
QUERIES["part_value_concentration"] = q_part_value_concentration
QUERIES["top_supplier_revenue"] = q_top_supplier_revenue
QUERIES["idle_rich_customers"] = q_idle_rich_customers

ORACLES = {
    "pricing_summary": SQL_PRICING_SUMMARY,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
    "revenue_trend": SQL_REVENUE_TREND,
    "shipping_priority": SQL_SHIPPING_PRIORITY,
    "large_orders": SQL_LARGE_ORDERS,
    "top_customers_per_segment": SQL_TOP_CUSTOMERS_PER_SEGMENT,
    "revenue_rollup": SQL_REVENUE_ROLLUP,
    "events_pivot": SQL_EVENTS_PIVOT,
    "idle_customers": SQL_IDLE_CUSTOMERS,
    "nation_trade_volume": SQL_NATION_TRADE_VOLUME,
    "promo_revenue_share": SQL_PROMO_REVENUE_SHARE,
    "price_quantity_corr": SQL_PRICE_QUANTITY_CORR,
    "small_quantity_revenue": SQL_SMALL_QUANTITY_REVENUE,
    "lone_late_supplier": SQL_LONE_LATE_SUPPLIER,
    "order_count_distribution": SQL_ORDER_COUNT_DISTRIBUTION,
    "events_unpivot": SQL_EVENTS_UNPIVOT,
    "revenue_cube": SQL_REVENUE_CUBE,
    "user_journeys": SQL_USER_JOURNEYS,
    "customer_spend_quartiles": SQL_CUSTOMER_SPEND_QUARTILES,
    "part_value_concentration": SQL_PART_VALUE_CONCENTRATION,
    "top_supplier_revenue": SQL_TOP_SUPPLIER_REVENUE,
    "idle_rich_customers": SQL_IDLE_RICH_CUSTOMERS,
}


# ---------------------------------------------- late-shipment priorities

#: Q4-flavor order window, epoch-ns (1997-Q1) and the 60-day lateness bar
_Q4_LO_NS = 852_076_800 * 1_000_000_000
_Q4_HI_NS = 859_852_800 * 1_000_000_000
_Q4_LATE_NS = 60 * 86_400 * 1_000_000_000


def q_late_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: orders placed in one quarter that had at least
    one line shipped more than 60 days after the order date, counted by
    priority — the correlated-EXISTS pattern. Spark compiles the EXISTS
    to a LEFT SEMI hash join on orderkey; the cross-table lateness
    predicate (l_shipdate > o_orderdate + 60d, pure ns-long arithmetic)
    rides along as the join's residual condition, so the fact table is
    touched once and nothing but orderkeys shuffle wide. The quarter
    filter prunes the orders scan before the join."""
    from photon_spark.queries import _t, _t_pruned
    o = (_t_pruned(spark, sf_dir, "orders",
                   {"o_orderdate": (_Q4_LO_NS, _Q4_HI_NS)})
         .select("o_orderkey", "o_orderdate", "o_orderpriority"))
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (o.join(li, (o.o_orderkey == li.l_orderkey)
                   & (li.l_shipdate > o.o_orderdate + F.lit(_Q4_LATE_NS)),
                   "left_semi"))
    return (late.groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("n_late_orders")))


SQL_LATE_ORDER_PRIORITY = """
SELECT o_orderpriority, count(*) AS n_late_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


# ---------------------------------------------- min-cost supplier (Q2)

def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for every part in a slice (STANDARD type, small
    sizes), the supplier(s) with the MINIMUM total supply cost — the
    min-per-group + tie-keeping-join-back pattern (the testdata has no
    partsupp table, so cost is the exact-cents total each supplier
    billed for the part across lineitem; same correlated-min shape).
    Cost is an exact integer, so the tie-keeping min compare is safe
    cross-engine. Plan: the fact is scanned ONCE — a (partkey, suppkey)
    shuffle builds the cost relation, then the per-part min is an
    unbounded window over the already-reduced relation (suppliers per
    part, not lineitems), so the second exchange moves only
    (partkey, suppkey, cost) longs; a min-per-group + join-back
    formulation would scan and aggregate the fact twice (Catalyst does
    not reuse the common subtree across a self-join). Supplier
    (100 rows at sf0.01) and nation broadcast onto the winners."""
    from pyspark.sql import Window
    p = (_rd(spark, sf_dir, "part")
         .where((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 25))
         .select("p_partkey"))
    li = _rd(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", _cents(F.col("l_extendedprice")).alias("c"))
    cost = (li.join(_bcast_dim(p), li.l_partkey == p.p_partkey)
              .groupBy("l_partkey", "l_suppkey")
              .agg(F.sum("c").alias("cost_c")))
    wmin = F.min("cost_c").over(Window.partitionBy("l_partkey"))
    s = _rd(spark, sf_dir, "supplier").select("s_suppkey", "s_name",
                                              "s_nationkey")
    n = _rd(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (cost.withColumn("min_c", wmin)
                .where(F.col("cost_c") == F.col("min_c"))
                .join(_bcast_dim(s), cost.l_suppkey == s.s_suppkey)
                .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
                .select(F.col("l_partkey").alias("partkey"),
                        F.col("s_name").alias("supplier"),
                        F.col("n_name").alias("nation"),
                        F.round(F.col("cost_c") / 100, 2)
                         .alias("supply_cost")))


SQL_MIN_COST_SUPPLIER = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_c
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_type = 'STANDARD' AND p.p_size <= 25
  GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey AS bp, min(cost_c) AS min_c FROM cost GROUP BY 1
)
SELECT c.l_partkey AS partkey, s.s_name AS supplier, n.n_name AS nation,
       round(c.cost_c / 100.0, 2) AS supply_cost
FROM cost c
JOIN best b ON c.l_partkey = b.bp AND c.cost_c = b.min_c
JOIN supplier s ON c.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
"""


# ------------------------------------------- disjunctive revenue (Q19)

def q_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: revenue over an OR of three brand/size/quantity
    conjunct groups — the disjunctive-pushdown pattern. Catalyst factors
    the common join key and pushes the derivable bounds into BOTH scans
    (part: brand IN (...) AND size <= 15; lineitem: quantity <= 30) while
    the full disjunction evaluates after the broadcast join — exactly
    what you want at 100 TB: the fact scan is pre-pruned by the weakest
    common envelope, and no second pass is needed for the OR."""
    li = _rd(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity",
        (_cents(F.col("l_extendedprice"))
         * _cents(F.lit(1.0) - F.col("l_discount"))).alias("rev4"))
    p = _rd(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(_bcast_dim(p), li.l_partkey == p.p_partkey)
    q, b, z = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    disj = (((b == "Brand#12") & z.between(1, 5) & q.between(1, 11))
            | ((b == "Brand#23") & z.between(1, 10) & q.between(10, 20))
            | ((b == "Brand#4") & z.between(1, 15) & q.between(20, 30)))
    return (j.where(disj)
             .agg(F.count(F.lit(1)).alias("n_items"),
                  F.round(F.sum("rev4") / 10000, 2).alias("revenue")))


SQL_DISJUNCTIVE_REVENUE = """
SELECT count(*) AS n_items,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round((1.0 - l_discount) * 100) AS BIGINT))
             / 10000.0, 2) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# ------------------------------------------ excess-quantity suppliers

#: Q20-flavor ship year (1998) and the per-(supplier, part) quantity bar
_Q20_LO_NS = 883_612_800 * 1_000_000_000
_Q20_HI_NS = 915_148_800 * 1_000_000_000
_Q20_QTY_BAR = 40


def q_excess_part_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers that moved an outsized quantity
    (> 40 units in the 1998 ship year) of some red part — the
    chained-semi-join pattern: a name-predicate part slice gates the
    fact scan, a (suppkey, partkey) aggregate crosses the threshold, and
    suppliers are kept by a DISTINCT-reduced semi probe. Quantities are
    integral by construction (2dp-exact), so the bar is an exact-integer
    compare. Nothing wider than (suppkey, partkey, qty) ever shuffles;
    supplier and nation broadcast onto the ~1% of survivors."""
    from photon_spark.queries import _t_pruned
    p = (_rd(spark, sf_dir, "part")
         .where(F.col("p_name").startswith("red"))
         .select("p_partkey"))
    li = (_t_pruned(spark, sf_dir, "lineitem",
                    {"l_shipdate": (_Q20_LO_NS, _Q20_HI_NS)})
          .select("l_partkey", "l_suppkey",
                  F.round(F.col("l_quantity")).cast("long").alias("units")))
    excess = (li.join(_bcast_dim(p), li.l_partkey == p.p_partkey)
                .groupBy("l_suppkey", "l_partkey")
                .agg(F.sum("units").alias("qty"))
                .where(F.col("qty") > _Q20_QTY_BAR))
    s = _rd(spark, sf_dir, "supplier").select("s_suppkey", "s_name",
                                              "s_nationkey")
    n = _rd(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (excess.groupBy("l_suppkey")
                  .agg(F.count(F.lit(1)).alias("n_excess_parts"),
                       F.sum("qty").alias("total_units"))
                  .join(_bcast_dim(s), F.col("l_suppkey") == s.s_suppkey)
                  .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
                  .select(F.col("s_suppkey").alias("suppkey"),
                          F.col("s_name").alias("supplier"),
                          F.col("n_name").alias("nation"),
                          "n_excess_parts", "total_units"))


SQL_EXCESS_PART_SUPPLIERS = f"""
WITH q AS (
  SELECT l_suppkey, l_partkey, CAST(sum(round(l_quantity)) AS BIGINT) AS qty
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE 'red%'
    AND l.l_shipdate >= TIMESTAMP '1998-01-01'
    AND l.l_shipdate < TIMESTAMP '1999-01-01'
  GROUP BY 1, 2
), ex AS (
  SELECT l_suppkey, count(*) AS n_excess_parts,
         CAST(sum(qty) AS BIGINT) AS total_units
  FROM q WHERE qty > {_Q20_QTY_BAR} GROUP BY 1
)
SELECT s.s_suppkey AS suppkey, s.s_name AS supplier, n.n_name AS nation,
       ex.n_excess_parts, ex.total_units
FROM ex
JOIN supplier s ON ex.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
"""


# --------------------------------------------- returned-item customers

#: Q10-flavor order window, epoch-ns (1997-Q3)
_Q10_LO_NS = 867_715_200 * 1_000_000_000
_Q10_HI_NS = 875_664_000 * 1_000_000_000
_Q10_TOPK = 20


def q_returned_item_customers(spark, sf_dir):
    """TPC-H Q10 shape: the top 20 customers by revenue lost to RETURNED
    items for orders placed in one quarter — filter-join-aggregate-rank.
    The returnflag filter rides the lineitem scan and the quarter filter
    the orders scan; revenue aggregates per customer BEFORE the
    (broadcast) customer/nation attribute join, and the top-k is ranked
    on the exact integer rev4 with the unique custkey as tie-break, so
    the cutoff is total and engine-stable. Compiles to
    TakeOrderedAndProject — no global sort materializes."""
    from photon_spark.queries import _t_pruned
    li = (_rd(spark, sf_dir, "lineitem")
          .where(F.col("l_returnflag") == "R")
          .select("l_orderkey",
                  (_cents(F.col("l_extendedprice"))
                   * _cents(F.lit(1.0) - F.col("l_discount")))
                  .alias("rev4")))
    o = (_t_pruned(spark, sf_dir, "orders",
                   {"o_orderdate": (_Q10_LO_NS, _Q10_HI_NS)})
         .select("o_orderkey", "o_custkey"))
    per_cust = (li.join(o, li.l_orderkey == o.o_orderkey)
                  .groupBy("o_custkey")
                  .agg(F.count(F.lit(1)).alias("n_returned"),
                       F.sum("rev4").alias("rev4")))
    c = _rd(spark, sf_dir, "customer").select("c_custkey", "c_name",
                                              "c_acctbal", "c_nationkey")
    n = _rd(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (per_cust
            .orderBy(F.desc("rev4"), F.asc("o_custkey"))
            .limit(_Q10_TOPK)
            .join(_bcast_dim(c), F.col("o_custkey") == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .select(F.col("o_custkey").alias("custkey"),
                    F.col("c_name").alias("customer"),
                    F.col("n_name").alias("nation"),
                    F.col("n_returned"),
                    F.round(F.col("rev4") / 10000, 2).alias("lost_revenue"),
                    F.round(_cents(F.col("c_acctbal")) / 100, 2)
                     .alias("acctbal")))


SQL_RETURNED_ITEM_CUSTOMERS = f"""
WITH per_cust AS (
  SELECT o.o_custkey, count(*) AS n_returned,
         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * CAST(round((1.0 - l.l_discount) * 100) AS BIGINT)) AS rev4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1997-07-01'
    AND o.o_orderdate < TIMESTAMP '1997-10-01'
  GROUP BY 1
), topk AS (
  SELECT * FROM per_cust ORDER BY rev4 DESC, o_custkey ASC
  LIMIT {_Q10_TOPK}
)
SELECT t.o_custkey AS custkey, c.c_name AS customer, n.n_name AS nation,
       t.n_returned, round(t.rev4 / 10000.0, 2) AS lost_revenue,
       round(CAST(round(c.c_acctbal * 100) AS BIGINT) / 100.0, 2)
         AS acctbal
FROM topk t
JOIN customer c ON t.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


# --------------------------------------------------- market share (Q8)

def q_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_7's share of PROMO-part revenue delivered
    into ASIA, per order year — the five-join star with a two-level
    (conditional-sum over group) aggregate. Every dimension chain
    (part slice, supplier→nation, customer→nation→region) broadcasts;
    the single wide shuffle is lineitem ⋈ orders on orderkey. The year
    comes from the ns-long order date via the repo's exact
    div-1e9 → timestamp_seconds idiom pinned to UTC (identical to
    DuckDB's year() on the µs-read value, dates being day-aligned), and
    the share is one bigint/bigint division rounded once."""
    from photon_spark.queries import _t
    li = _rd(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        (_cents(F.col("l_extendedprice"))
         * _cents(F.lit(1.0) - F.col("l_discount"))).alias("rev4"))
    p = (_rd(spark, sf_dir, "part")
         .where(F.col("p_type") == "PROMO").select("p_partkey"))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey",
                                           "o_orderdate")
    c = _rd(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cn = (_rd(spark, sf_dir, "nation")
          .where(F.col("n_regionkey") == 2).select("n_nationkey"))
    sn = (_rd(spark, sf_dir, "nation")
          .select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation")))
    s = _rd(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    j = (li.join(_bcast_dim(p), li.l_partkey == p.p_partkey)
           .join(o, li.l_orderkey == o.o_orderkey)
           .join(_bcast_dim(c), o.o_custkey == c.c_custkey)
           .join(F.broadcast(cn), c.c_nationkey == cn.n_nationkey)
           .join(_bcast_dim(s), li.l_suppkey == s.s_suppkey)
           .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key")))
    year = F.year(F.timestamp_seconds(
        F.expr("o_orderdate div 1000000000")))
    target = F.when(F.col("supp_nation") == "NATION_7", F.col("rev4")) \
              .otherwise(F.lit(0))
    return (j.groupBy(year.alias("order_year"))
             .agg(F.count(F.lit(1)).alias("n_items"),
                  F.round(F.sum(target) / 10000, 2).alias("nation_revenue"),
                  F.round(F.sum("rev4") / 10000, 2).alias("total_revenue"),
                  F.round(F.sum(target).cast("double")
                          / F.sum("rev4").cast("double"), 6)
                   .alias("mkt_share")))


SQL_MARKET_SHARE = """
WITH j AS (
  SELECT year(o.o_orderdate) AS order_year, sn.n_name AS supp_nation,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * CAST(round((1.0 - l.l_discount) * 100) AS BIGINT) AS rev4
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey AND cn.n_regionkey = 2
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
)
SELECT order_year, count(*) AS n_items,
       round(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev4 ELSE 0 END)
             / 10000.0, 2) AS nation_revenue,
       round(sum(rev4) / 10000.0, 2) AS total_revenue,
       round(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev4
                 ELSE 0 END)::DOUBLE / sum(rev4)::DOUBLE, 6) AS mkt_share
FROM j GROUP BY 1
"""


QUERIES["late_order_priority"] = q_late_order_priority
QUERIES["min_cost_supplier"] = q_min_cost_supplier
QUERIES["disjunctive_revenue"] = q_disjunctive_revenue
QUERIES["excess_part_suppliers"] = q_excess_part_suppliers
QUERIES["returned_item_customers"] = q_returned_item_customers
QUERIES["market_share"] = q_market_share
ORACLES["late_order_priority"] = SQL_LATE_ORDER_PRIORITY
ORACLES["min_cost_supplier"] = SQL_MIN_COST_SUPPLIER
ORACLES["disjunctive_revenue"] = SQL_DISJUNCTIVE_REVENUE
ORACLES["excess_part_suppliers"] = SQL_EXCESS_PART_SUPPLIERS
ORACLES["returned_item_customers"] = SQL_RETURNED_ITEM_CUSTOMERS
ORACLES["market_share"] = SQL_MARKET_SHARE


# ---------------------------------------- forecast revenue change (Q6)

#: 1997-01-01 / 1998-01-01 UTC in epoch-ns (the _t contract)
_Q6_LO_NS = 852_076_800 * 1_000_000_000
_Q6_HI_NS = 883_612_800 * 1_000_000_000


def q_forecast_revenue_change(spark, sf_dir):
    """TPC-H Q6 shape: revenue that would have been gained by dropping a
    discount band — the pure pushed-filter scalar aggregate. All three
    predicates (ship year, discount band, quantity cap) reach the
    parquet scan as PushedFilters (pinned in tests/test_plans.py), so at
    100 TB the scan is row-group-pruned before a single byte of the
    wide columns moves; the aggregate itself is one partial-then-final
    pass over (price, discount) pairs. The discount band compares the
    stored 2dp doubles against the same literals on both engines — no
    re-rounding, so parity is bit-exact; revenue is the exact integer
    cents x cents product divided once at the end."""
    from photon_spark.queries import _t_pruned
    li = (_t_pruned(spark, sf_dir, "lineitem",
                    {"l_shipdate": (_Q6_LO_NS, _Q6_HI_NS)})
          .where((F.col("l_discount") >= 0.04)
                 & (F.col("l_discount") <= 0.06)
                 & (F.col("l_quantity") < 24)))
    rev4 = _cents(F.col("l_extendedprice")) * _cents(F.col("l_discount"))
    return li.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(rev4) / 10000, 2).alias("forecast_revenue"))


SQL_FORECAST_REVENUE_CHANGE = """
SELECT count(*) AS n_items,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l_discount * 100) AS BIGINT))
             / 10000.0, 2) AS forecast_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
"""


# --------------------------------------- late-line priority mix (Q12)

_Q12_LATE_NS = 90 * 86_400 * 1_000_000_000


def q_late_line_priority_mix(spark, sf_dir):
    """TPC-H Q12 shape: per line class (returnflag standing in for the
    absent shipmode), how many LATE-shipped lines belonged to critical
    vs non-critical orders — the join + conditional CASE-sum aggregate.
    One wide shuffle (lineitem |><| orders on orderkey); the 90-day
    lateness predicate is pure ns-long arithmetic evaluated as the
    join's residual, and both priority counters come out of a single
    pass over the joined rows (no second scan, no pivot)."""
    from photon_spark.queries import _t, _t_pruned
    li = (_t_pruned(spark, sf_dir, "lineitem",
                    {"l_shipdate": (_Q6_LO_NS, _Q6_HI_NS)})
          .select("l_orderkey", "l_returnflag", "l_shipdate"))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate",
                                           "o_orderpriority")
    j = li.join(o, (li.l_orderkey == o.o_orderkey)
                & (li.l_shipdate > o.o_orderdate + F.lit(_Q12_LATE_NS)))
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (j.groupBy("l_returnflag")
             .agg(F.sum(F.when(crit, 1).otherwise(0))
                   .alias("high_priority_lines"),
                  F.sum(F.when(crit, 0).otherwise(1))
                   .alias("low_priority_lines")))


SQL_LATE_LINE_PRIORITY_MIX = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
GROUP BY 1
"""


# --------------------------------------- nation profit by year (Q9)

def q_nation_profit_by_year(spark, sf_dir):
    """TPC-H Q9 shape: profit per (supplier nation, order year) for one
    part family — the LIKE-sliced multi-join star whose measure can go
    NEGATIVE (profit = discounted revenue minus a cost leg), which rules
    out the non-negative-sum shortcuts the revenue queries use. The
    testdata has no partsupp, so the cost leg is the part's retail price
    x quantity (same correlated-cost shape). Part (LIKE-filtered),
    supplier and nation broadcast; the single wide exchange is
    lineitem |><| orders on orderkey. Profit stays in exact 1e-4-dollar
    integer units through the sum — quantity is an integral double cast
    losslessly to long — and divides once at the end."""
    from photon_spark.queries import _t
    li = _rd(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        (_cents(F.col("l_extendedprice"))
         * _cents(F.lit(1.0) - F.col("l_discount"))).alias("rev4"),
        F.round(F.col("l_quantity")).cast("long").alias("qty"))
    p = (_rd(spark, sf_dir, "part")
         .where(F.col("p_name").like("%red%"))
         .select("p_partkey", _cents(F.col("p_retailprice")).alias("rp_c")))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _rd(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _rd(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (li.join(_bcast_dim(p), li.l_partkey == p.p_partkey)
           .join(o, li.l_orderkey == o.o_orderkey)
           .join(_bcast_dim(s), li.l_suppkey == s.s_suppkey)
           .join(F.broadcast(n), s.s_nationkey == n.n_nationkey))
    year = F.year(F.timestamp_seconds(
        F.expr("o_orderdate div 1000000000")))
    profit4 = (F.col("rev4")
               - F.col("rp_c") * F.col("qty") * F.lit(100))
    return (j.groupBy(F.col("n_name").alias("nation"),
                      year.alias("order_year"))
             .agg(F.count(F.lit(1)).alias("n_items"),
                  F.round(F.sum(profit4) / 10000, 2).alias("profit")))


SQL_NATION_PROFIT_BY_YEAR = """
WITH j AS (
  SELECT n.n_name AS nation, year(o.o_orderdate) AS order_year,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * CAST(round((1.0 - l.l_discount) * 100) AS BIGINT)
         - CAST(round(p.p_retailprice * 100) AS BIGINT)
           * CAST(round(l.l_quantity) AS BIGINT) * 100 AS profit4
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
)
SELECT nation, order_year, count(*) AS n_items,
       round(sum(profit4) / 10000.0, 2) AS profit
FROM j GROUP BY 1, 2
"""


# --------------------------------------- part supplier counts (Q16)

_Q16_SIZES = (1, 4, 9, 14, 19, 23, 36, 45)


def q_part_supplier_counts(spark, sf_dir):
    """TPC-H Q16 shape: distinct suppliers able to supply each part
    slice, excluding a complaint blacklist — the NOT-IN-subquery +
    count-distinct pattern. The supply relation is the distinct
    (partkey, suppkey) projection of lineitem (no partsupp table in the
    testdata): ONE exchange reduces the fact to id pairs before
    anything joins. The NOT IN compiles to a LEFT ANTI join against the
    broadcast blacklist (name-pattern stand-in for photon-era
    complaints); part broadcasts; the final count-distinct groups the
    already-tiny pair relation. Nothing wider than two ids ever
    shuffles, at any scale factor."""
    ps = (_rd(spark, sf_dir, "lineitem")
          .select("l_partkey", "l_suppkey").distinct())
    p = (_rd(spark, sf_dir, "part")
         .where((F.col("p_brand") != "Brand#3")
                & (F.col("p_type") != "PROMO")
                & F.col("p_size").isin(*_Q16_SIZES))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad = (_rd(spark, sf_dir, "supplier")
           .where(F.col("s_name").like("%7"))
           .select("s_suppkey"))
    return (ps.join(_bcast_dim(p), ps.l_partkey == p.p_partkey)
              .join(_bcast_dim(bad), ps.l_suppkey == bad.s_suppkey,
                    "left_anti")
              .groupBy("p_brand", "p_type", "p_size")
              .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


SQL_PART_SUPPLIER_COUNTS = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM ps
JOIN part p ON ps.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#3' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                           WHERE s_name LIKE '%7')
GROUP BY 1, 2, 3
"""


QUERIES["forecast_revenue_change"] = q_forecast_revenue_change
QUERIES["late_line_priority_mix"] = q_late_line_priority_mix
QUERIES["nation_profit_by_year"] = q_nation_profit_by_year
QUERIES["part_supplier_counts"] = q_part_supplier_counts
ORACLES["forecast_revenue_change"] = SQL_FORECAST_REVENUE_CHANGE
ORACLES["late_line_priority_mix"] = SQL_LATE_LINE_PRIORITY_MIX
ORACLES["nation_profit_by_year"] = SQL_NATION_PROFIT_BY_YEAR
ORACLES["part_supplier_counts"] = SQL_PART_SUPPLIER_COUNTS


# --------------------------------------------------- RFM segmentation

def q_customer_rfm_segments(spark, sf_dir):
    """RFM SEGMENTATION — the classic marketing cohorting the quartile
    rollup (q_customer_spend_quartiles) is one axis of: every customer
    scored 1-4 on Recency (latest order), Frequency (order count) and
    Monetary (lifetime spend), each ntile'd WITHIN the market segment
    (4 = most recent / most frequent / biggest spender), rolled up per
    (segment, 'r{r}f{f}m{m}') cell with population and spend stats.

    Plan: one keyed aggregate builds the per-customer (recency ns,
    frequency, cents) triple; the three ntile windows share ONE
    segment-keyed exchange (same partitioning, per-window sort only —
    no single-partition sort, no second shuffle); the final rollup
    collapses map-side. Cents stay exact integers until the two final
    divisions.
    """
    from pyspark.sql import Window

    o = _rd(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").alias("od_ns"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    per_cust = o.groupBy("o_custkey").agg(
        F.max("od_ns").alias("recency_ns"),
        F.count(F.lit(1)).alias("freq"),
        F.sum("cents").alias("sc"))
    c = _rd(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = c.join(per_cust, c.c_custkey == per_cust.o_custkey)

    def score(metric):
        w = Window.partitionBy("c_mktsegment").orderBy(F.asc(metric),
                                                       F.asc("c_custkey"))
        return F.ntile(4).over(w)

    scored = (j.withColumn("r", score("recency_ns"))
               .withColumn("f", score("freq"))
               .withColumn("m", score("sc")))
    seg = F.concat(F.lit("r"), F.col("r"), F.lit("f"), F.col("f"),
                   F.lit("m"), F.col("m")).alias("rfm_segment")
    return (scored.groupBy("c_mktsegment", seg)
                  .agg(F.count(F.lit(1)).alias("n_customers"),
                       F.sum("freq").alias("n_orders"),
                       F.round(F.sum("sc") / 100, 2).alias("total_spend"),
                       F.round(F.sum("sc") / F.count(F.lit(1)) / 100, 6)
                        .alias("avg_spend")))


SQL_CUSTOMER_RFM_SEGMENTS = """
WITH per_cust AS (
  SELECT o_custkey, max(epoch_ns(o_orderdate)) AS recency_ns,
         count(*) AS freq,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sc
  FROM orders GROUP BY 1
), scored AS (
  SELECT c.c_mktsegment, p.freq, p.sc,
         ntile(4) OVER (PARTITION BY c.c_mktsegment
                        ORDER BY p.recency_ns, c.c_custkey) AS r,
         ntile(4) OVER (PARTITION BY c.c_mktsegment
                        ORDER BY p.freq, c.c_custkey) AS f,
         ntile(4) OVER (PARTITION BY c.c_mktsegment
                        ORDER BY p.sc, c.c_custkey) AS m
  FROM customer c JOIN per_cust p ON c.c_custkey = p.o_custkey
)
SELECT c_mktsegment,
       'r' || r || 'f' || f || 'm' || m AS rfm_segment,
       count(*) AS n_customers, CAST(sum(freq) AS BIGINT) AS n_orders,
       round(sum(sc) / 100.0, 2) AS total_spend,
       round(sum(sc) * 1.0 / count(*) / 100.0, 6) AS avg_spend
FROM scored GROUP BY 1, 2
"""

QUERIES["customer_rfm_segments"] = q_customer_rfm_segments
ORACLES["customer_rfm_segments"] = SQL_CUSTOMER_RFM_SEGMENTS


# ----------------------------------------------- skyline / Pareto front

def q_pareto_front_parts(spark, sf_dir):
    """SKYLINE query — the multi-objective "best trade-offs" operator:
    parts on the (cheapest price, largest size) Pareto front, i.e. no
    other part is both <= price and >= size with one strict. The
    classic catalog question ("show me every part not strictly beaten
    on both axes") that no single ORDER BY can answer.

    Plan (functions/skyline.py): per-partition local skyline first —
    one Arrow sort+scan pass, no shuffle, discards everything locally
    dominated — then the bounded candidate union (<= n_partitions x
    front size) resolves globally with two Catalyst windows (per-x
    group min + running min over strictly smaller price via a RANGE
    frame). The unpartitioned window only ever sees phase-1 survivors,
    never the raw relation, so the shape survives 100 TB. Prices gate
    as exact integer cents; maximize-size is minimize(-size).
    """
    from photon_spark.functions.skyline import skyline_2d

    p = _rd(spark, sf_dir, "part").select(
        "p_partkey", "p_size",
        F.round(F.col("p_retailprice") * 100).cast("long")
         .alias("price_cents"),
        (-F.col("p_size")).cast("long").alias("neg_size"))
    front = skyline_2d(p, x="price_cents", y="neg_size")
    return front.select("p_partkey", "price_cents",
                        F.col("p_size").cast("long").alias("p_size"))


SQL_PARETO_FRONT_PARTS = """
WITH p AS (
  SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT)
           AS price_cents, p_size
  FROM part
)
SELECT p_partkey, price_cents, CAST(p_size AS BIGINT) AS p_size
FROM p
WHERE NOT EXISTS (
  SELECT 1 FROM p q
  WHERE q.price_cents <= p.price_cents AND q.p_size >= p.p_size
    AND (q.price_cents < p.price_cents OR q.p_size > p.p_size))
"""

QUERIES["pareto_front_parts"] = q_pareto_front_parts
ORACLES["pareto_front_parts"] = SQL_PARETO_FRONT_PARTS
