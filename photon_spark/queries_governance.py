"""Governance & cohort queries: declarative data-quality constraint
auditing over the star schema, weekly cohort retention over the event
log, and triangle/clustering statistics of the near-dup graph — each
hash-gated against a DuckDB oracle.

All three emit only exact integers (plus single-division ratios), so
the gates hold with no float tolerance.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from photon_spark.relations import read_base as _read_base


def _events(spark, sf_dir):
    from photon_spark.queries import _t
    return _t(spark, sf_dir, "events")


def _rd(spark, sf_dir, name):
    return _read_base(spark, sf_dir, name)


# ------------------------------------------------- constraint audit

def q_constraint_audit(spark, sf_dir):
    """Declarative data-quality audit (the dbt-test / expectations
    shape): each constraint is one aggregate — uniqueness of the
    lineitem PK, referential integrity orders→customer and
    lineitem→orders, null payloads, and domain ranges on discount/
    quantity/acctbal. Output is the long-format (constraint, violations,
    checked) relation a quality dashboard ingests.

    Plan notes: uniqueness is a keyed count>1 aggregate (map-side
    partials collapse duplicates); referential integrity is an ANTI
    join against the parent's key set — at 100 TB the parent key
    relation is orders-of-magnitude thinner than the fact and both
    anti-joins shuffle ids only. Every check is independent, so the
    union evaluates them in parallel stages.
    """
    li = _rd(spark, sf_dir, "lineitem")
    o = _rd(spark, sf_dir, "orders")
    c = _rd(spark, sf_dir, "customer")
    e = _events(spark, sf_dir)

    dup_pk = (li.groupBy("l_orderkey", "l_linenumber")
                .agg(F.count(F.lit(1)).alias("n"))
                .agg(F.coalesce(F.sum(F.when(F.col("n") > 1,
                                             F.col("n") - 1)), F.lit(0))
                      .alias("violations"),
                     F.count(F.lit(1)).alias("checked"))
                .select(F.lit("lineitem_pk_unique").alias("check_name"),
                        "violations", "checked"))
    orphan_orders = (o.join(c.select(F.col("c_custkey").alias("k")),
                            o.o_custkey == F.col("k"), "left_anti")
                      .agg(F.count(F.lit(1)).alias("violations"))
                      .crossJoin(o.agg(F.count(F.lit(1)).alias("checked")))
                      .select(F.lit("orders_custkey_fk").alias("check_name"),
                              "violations", "checked"))
    orphan_li = (li.join(o.select(F.col("o_orderkey").alias("k")),
                         li.l_orderkey == F.col("k"), "left_anti")
                   .agg(F.count(F.lit(1)).alias("violations"))
                   .crossJoin(li.agg(F.count(F.lit(1)).alias("checked")))
                   .select(F.lit("lineitem_orderkey_fk").alias("check_name"),
                           "violations", "checked"))
    null_props = (e.agg(F.sum(F.col("props").isNull().cast("long"))
                         .alias("violations"),
                        F.count(F.lit(1)).alias("checked"))
                   .select(F.lit("events_props_not_null").alias("check_name"),
                           "violations", "checked"))
    disc_range = (li.agg(F.sum(((F.col("l_discount") < 0)
                                | (F.col("l_discount") > 1)).cast("long"))
                          .alias("violations"),
                         F.count(F.lit(1)).alias("checked"))
                    .select(F.lit("lineitem_discount_0_1")
                             .alias("check_name"),
                            "violations", "checked"))
    qty_pos = (li.agg(F.sum((F.col("l_quantity") <= 0).cast("long"))
                       .alias("violations"),
                      F.count(F.lit(1)).alias("checked"))
                 .select(F.lit("lineitem_quantity_positive")
                          .alias("check_name"),
                         "violations", "checked"))
    return (dup_pk.unionAll(orphan_orders).unionAll(orphan_li)
                  .unionAll(null_props).unionAll(disc_range)
                  .unionAll(qty_pos))


SQL_CONSTRAINT_AUDIT = """
SELECT 'lineitem_pk_unique' AS check_name,
       CAST(coalesce(sum(CASE WHEN n > 1 THEN n - 1 END), 0) AS BIGINT)
         AS violations,
       count(*) AS checked
FROM (SELECT l_orderkey, l_linenumber, count(*) AS n
      FROM lineitem GROUP BY 1, 2)
UNION ALL
SELECT 'orders_custkey_fk' AS check_name,
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)),
       (SELECT count(*) FROM orders)
UNION ALL
SELECT 'lineitem_orderkey_fk' AS check_name,
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)),
       (SELECT count(*) FROM lineitem)
UNION ALL
SELECT 'events_props_not_null' AS check_name,
       (SELECT CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)
               AS BIGINT)
        FROM events),
       (SELECT count(*) FROM events)
UNION ALL
SELECT 'lineitem_discount_0_1' AS check_name,
       (SELECT CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1
                   THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem),
       (SELECT count(*) FROM lineitem)
UNION ALL
SELECT 'lineitem_quantity_positive' AS check_name,
       (SELECT CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)
               AS BIGINT)
        FROM lineitem),
       (SELECT count(*) FROM lineitem)
"""


# ------------------------------------------------- cohort retention

#: epoch-ns of 2024-01-01 (events table origin) and one week
_T0_NS = 1_704_067_200_000_000_000
_WEEK_NS = 7 * 86_400_000_000_000


def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention: users grouped by first-seen week, then
    distinct-user counts per (cohort_week, week_offset) — the retention
    triangle every product-analytics stack computes.

    Plan: first-seen is one keyed min; the activity relation joins the
    tiny per-user cohort map back (at 100 TB: a keyed join on user_id,
    ids only) and collapses to distinct (cohort, offset, user) before
    counting — the distinct bounds shuffle rows at users × weeks.
    """
    e = _events(spark, sf_dir).select(
        "user_id", F.expr(f"(ts - {_T0_NS}) div {_WEEK_NS}").alias("week"))
    first = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (e.join(first, "user_id")
             .select("cohort_week",
                     (F.col("week") - F.col("cohort_week"))
                     .alias("week_offset"), "user_id")
             .distinct()
             .groupBy("cohort_week", "week_offset")
             .agg(F.count(F.lit(1)).alias("n_users"))
             .orderBy("cohort_week", "week_offset"))


SQL_COHORT_RETENTION = f"""
WITH e AS (
  SELECT user_id, (epoch_ns(ts) - {_T0_NS}) // {_WEEK_NS} AS week
  FROM events
), first AS (
  SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1
)
SELECT f.cohort_week, e.week - f.cohort_week AS week_offset,
       count(DISTINCT e.user_id) AS n_users
FROM e JOIN first f ON e.user_id = f.user_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --------------------------------------- dup-graph triangles/clustering

def q_dup_graph_clustering(spark, sf_dir):
    """Global clustering statistics of the near-duplicate graph:
    triangle count, open-wedge count, and the clustering coefficient
    3·triangles / wedges — high values mean duplication comes in dense
    boilerplate CLUSTERS (dedup by connected components pays off), low
    values mean pairwise noise.

    Triangles enumerate on the ordered edge relation (a<b<c): one
    self-join on the shared endpoint builds wedges, one semi-check
    against the edge set closes them — ids only, and the wedge join is
    keyed, never a cross. Wedge totals come from the degree relation
    (deg·(deg−1)/2 summed — exact integers).
    """
    from photon_spark.functions import dedup
    from photon_spark import pair_cache
    pairs = pair_cache.near_dup_pairs(spark, sf_dir)
    edges = pairs.select("lo_id", "hi_id").persist()
    # wedges rooted at a: (a<b) ⋈ (a<c), b<c — then close with (b,c)
    e1 = edges.select(F.col("lo_id").alias("a"), F.col("hi_id").alias("b"))
    e2 = edges.select(F.col("lo_id").alias("a2"), F.col("hi_id").alias("c"))
    wedge = (e1.join(e2, (F.col("a") == F.col("a2"))
                     & (F.col("b") < F.col("c"))).drop("a2"))
    closed = wedge.join(
        edges.select(F.col("lo_id").alias("b"), F.col("hi_id").alias("c")),
        ["b", "c"], "left_semi")
    tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    ends = (edges.select(F.col("lo_id").alias("id"))
                 .unionAll(edges.select(F.col("hi_id").alias("id"))))
    deg = ends.groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
    wedges = deg.agg(
        F.sum(F.expr("deg * (deg - 1) div 2")).alias("n_wedges"),
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("deg").alias("deg_sum"))
    out = (tri.crossJoin(wedges)
              .select("n_nodes", F.expr("deg_sum div 2").alias("n_edges"), "n_wedges", "n_triangles",
                      F.round((F.lit(3.0) * F.col("n_triangles")
                               .cast("double"))
                              / F.col("n_wedges").cast("double"), 6)
                       .alias("clustering_coeff")))
    out._photon_cached = getattr(pairs, "_photon_cached", []) + [edges]
    return out


def _docs(spark, sf_dir):
    return _read_base(spark, sf_dir, "documents")


def _sql_clustering() -> str:
    from photon_spark.queries_northstar import SQL_MINHASH_NEAR_DUPS
    return f"""
WITH pairs AS ({SQL_MINHASH_NEAR_DUPS}),
edges AS (SELECT lo_id, hi_id FROM pairs),
wedge AS (
  SELECT e1.lo_id AS a, e1.hi_id AS b, e2.hi_id AS c
  FROM edges e1 JOIN edges e2
    ON e1.lo_id = e2.lo_id AND e1.hi_id < e2.hi_id
),
tri AS (
  SELECT count(*) AS n_triangles
  FROM wedge w
  WHERE EXISTS (SELECT 1 FROM edges e
                WHERE e.lo_id = w.b AND e.hi_id = w.c)
),
ends AS (
  SELECT lo_id AS id FROM edges UNION ALL SELECT hi_id FROM edges
),
deg AS (SELECT id, count(*) AS deg FROM ends GROUP BY 1),
w AS (
  SELECT sum(deg * (deg - 1) // 2) AS n_wedges, count(*) AS n_nodes,
         sum(deg) AS deg_sum
  FROM deg
)
SELECT n_nodes, CAST(deg_sum // 2 AS BIGINT) AS n_edges,
       CAST(n_wedges AS BIGINT) AS n_wedges, n_triangles,
       round((3.0 * n_triangles::DOUBLE) / n_wedges::DOUBLE, 6)
         AS clustering_coeff
FROM tri, w
"""


# --------------------------------------------- robust outliers (MAD)

def q_value_mad_outliers(spark, sf_dir):
    """Robust outlier audit per event stream: median, median absolute
    deviation, and the count of events beyond 3·MAD — the
    heavy-tail-safe alternative to the z-score (events_anomaly_zscore),
    which a single whale event can blind.

    INTEGER-ONLY exactness: values are 2dp cents; both medians use the
    percentile_disc integer rank ((n·50+99) div 100); deviations and
    the 3·MAD threshold stay longs — the whole audit has no float until
    the final rate division. Scale: two keyed rank windows (per-type
    sort; the 100 TB path swaps in the mergeable histogram sketch with
    this query as its truth) and a 5-row broadcast join back.
    """
    from pyspark.sql import Window
    e = _events(spark, sf_dir).select(
        "event_type", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("v"))
    w = Window.partitionBy("event_type").orderBy("v", "event_id")
    nw = Window.partitionBy("event_type")
    r = (e.withColumn("rn", F.row_number().over(w))
          .withColumn("n", F.count(F.lit(1)).over(nw)))
    med = (r.groupBy("event_type")
            .agg(F.max(F.when(F.col("rn")
                              == F.expr("(n * 50 + 99) div 100"),
                              F.col("v"))).alias("median_cents")))
    dev = (e.join(F.broadcast(med), "event_type")
            .select("event_type", "event_id",
                    F.abs(F.col("v") - F.col("median_cents")).alias("d")))
    wd = Window.partitionBy("event_type").orderBy("d", "event_id")
    rd = (dev.withColumn("rn", F.row_number().over(wd))
             .withColumn("n", F.count(F.lit(1)).over(nw)))
    mad = (rd.groupBy("event_type")
             .agg(F.max(F.when(F.col("rn")
                               == F.expr("(n * 50 + 99) div 100"),
                               F.col("d"))).alias("mad_cents")))
    return (dev.join(F.broadcast(mad), "event_type")
               .groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("n_events"),
                    F.sum((F.col("d") > 3 * F.col("mad_cents"))
                          .cast("long")).alias("n_outliers"))
               .join(F.broadcast(med), "event_type")
               .join(F.broadcast(mad), "event_type")
               .select("event_type", "n_events", "median_cents",
                       "mad_cents", "n_outliers",
                       F.round(F.col("n_outliers").cast("double")
                               / F.col("n_events").cast("double"), 6)
                        .alias("outlier_rate")))


SQL_VALUE_MAD_OUTLIERS = """
WITH e AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
), r AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY v, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM e
), med AS (
  SELECT event_type,
         max(CASE WHEN rn = (n * 50 + 99) // 100 THEN v END)
           AS median_cents
  FROM r GROUP BY 1
), dev AS (
  SELECT e.event_type, e.event_id,
         abs(e.v - m.median_cents) AS d
  FROM e JOIN med m ON m.event_type = e.event_type
), rd AS (
  SELECT event_type, d,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY d, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM dev
), mad AS (
  SELECT event_type,
         max(CASE WHEN rn = (n * 50 + 99) // 100 THEN d END) AS mad_cents
  FROM rd GROUP BY 1
), agg AS (
  SELECT dev.event_type, count(*) AS n_events,
         CAST(sum(CASE WHEN dev.d > 3 * mad.mad_cents
             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
  FROM dev JOIN mad ON mad.event_type = dev.event_type
  GROUP BY 1
)
SELECT a.event_type, a.n_events, m.median_cents, d.mad_cents,
       a.n_outliers,
       round(a.n_outliers::DOUBLE / a.n_events::DOUBLE, 6)
         AS outlier_rate
FROM agg a
JOIN med m ON m.event_type = a.event_type
JOIN mad d ON d.event_type = a.event_type
"""


# --------------------------------------------- source diversity audit

def q_source_diversity(spark, sf_dir):
    """Per-source corpus diversity: distinct tokens, token mass, Simpson
    collision index Σcᵢ²/total² (the probability two random tokens
    coincide — LOW means diverse), effective vocabulary 1/Simpson, and
    the top-token share. Diversity is the cheap early-warning for
    template/boilerplate sources in a training mix.

    Entropy needs a cross-engine ln, so we use the Simpson index
    instead: exact integer sums of squared counts with single IEEE
    divisions at the end — hash-gateable where Shannon entropy never
    could be. Plan: one (source, token) aggregate (map-side partials),
    then a per-source reduce of short rows; top share via max(c).
    """
    from photon_spark.functions.text import tokens
    d = _read_base(spark, sf_dir, "documents")
    toks = (d.select("source", F.explode(
                F.transform(tokens("text"), lambda t: F.lower(t)))
             .alias("tok"))
             .groupBy("source", "tok")
             .agg(F.count(F.lit(1)).alias("c")))
    return (toks.groupBy("source")
                .agg(F.count(F.lit(1)).alias("n_distinct_tokens"),
                     F.sum("c").alias("token_mass"),
                     F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
                     F.max("c").alias("top_c"))
                .select("source", "n_distinct_tokens", "token_mass",
                        F.round(F.col("sum_c2").cast("double")
                                / (F.col("token_mass")
                                   * F.col("token_mass")).cast("double"), 9)
                         .alias("simpson"),
                        F.round((F.col("token_mass")
                                 * F.col("token_mass")).cast("double")
                                / F.col("sum_c2").cast("double"), 6)
                         .alias("effective_vocab"),
                        F.round(F.col("top_c").cast("double")
                                / F.col("token_mass").cast("double"), 6)
                         .alias("top_token_share")))


SQL_SOURCE_DIVERSITY = """
WITH toks AS (
  SELECT source, lower(t) AS tok
  FROM documents,
       unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\\s+') END) u(t)
), counts AS (
  SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2
)
SELECT source, count(*) AS n_distinct_tokens,
       CAST(sum(c) AS BIGINT) AS token_mass,
       round(sum(c * c)::DOUBLE
             / (sum(c) * sum(c))::DOUBLE, 9) AS simpson,
       round((sum(c) * sum(c))::DOUBLE
             / sum(c * c)::DOUBLE, 6) AS effective_vocab,
       round(max(c)::DOUBLE / sum(c)::DOUBLE, 6) AS top_token_share
FROM counts GROUP BY source
"""


# --------------------------------------------- co-purchase mining

MIN_SUPPORT = 3     #: minimum co-occurrence count
COPURCHASE_TOPK = 25


def q_copurchase_pairs(spark, sf_dir):
    """Frequent-itemset mining, pairwise tier: part pairs bought in the
    same order, with support ≥ {MIN_SUPPORT} and lift — the
    market-basket signal behind recommenders.

    Plan: APRIORI PRUNE first — a pair's support is ≤ min of its parts'
    supports (monotonicity), so parts with psup < {MIN_SUPPORT} cannot
    appear in any surviving pair and the baskets semi-join to frequent
    parts BEFORE the self-join, shrinking the pair-generation input
    (the classic frequent-item first pass). The basket self-join is
    keyed on l_orderkey and baskets are small by construction
    (lineitems per order), so pair generation is Σ|basket|² over the
    PRUNED baskets — linear in orders, never corpus-quadratic. The
    basket distinct rides a hash(l_orderkey) repartition (which
    satisfies the (orderkey, partkey) dedup's distribution AND the
    self-join's). The basket and frequent-parts relations each appear
    three times in the STATIC plan (prune + both self-join legs;
    prune + both support joins) but AQE's runtime exchange reuse
    materializes each underlying exchange once — measured faster than
    pinning them with localCheckpoint (whose row-object scans lose
    columnar batching) or persist; an in-basket array-combination
    rewrite (collect_set + flatten/transform, no self-join stage) was
    also measured ~25% SLOWER — ObjectHashAggregate loses to the
    codegen'd join. The order total rides along as a
    crossJoin(broadcast(<1-row count>)) instead of a separate driver
    .collect() job, so the whole row is ONE Spark action. Pair counts
    collapse map-side; the surviving pairs' part supports join back
    broadcast (every surviving part is frequent, so the frequent-parts
    relation carries them all). Lift's denominator is a product of two
    integers over the integer order count — single IEEE ops, 6dp.
    """
    li = (_rd(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey")
          .repartition("l_orderkey")
          .dropDuplicates(["l_orderkey", "l_partkey"]))
    n_orders = (_rd(spark, sf_dir, "orders")
                .agg(F.count(F.lit(1)).alias("n_orders")))
    # size-gated hints: the frequent-parts relation is bounded by |part|
    # (200k·sf — nearly ALL parts clear MIN_SUPPORT on TPC-H's uniform
    # baskets), so a forced broadcast would OOM at a genuine 100×;
    # _bcast_dim hints only below the cap and lets AQE pick the join
    # strategy above it
    from photon_spark.queries_relational import _bcast_dim
    psup = (li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("psup"))
              .where(F.col("psup") >= MIN_SUPPORT))
    lif = li.join(_bcast_dim(psup.select("l_partkey")), "l_partkey")
    a = lif.select("l_orderkey", F.col("l_partkey").alias("p1"))
    b = lif.select("l_orderkey", F.col("l_partkey").alias("p2"))
    pairs = (a.join(b, "l_orderkey")
              .where(F.col("p1") < F.col("p2"))
              .groupBy("p1", "p2")
              .agg(F.count(F.lit(1)).alias("support"))
              .where(F.col("support") >= MIN_SUPPORT))
    lift = ((F.col("support").cast("double")
             * F.col("n_orders").cast("double"))
            / (F.col("s1").cast("double") * F.col("s2").cast("double")))
    return (pairs
            .join(_bcast_dim(psup.select(F.col("l_partkey").alias("p1"),
                                         F.col("psup").alias("s1"))), "p1")
            .join(_bcast_dim(psup.select(F.col("l_partkey").alias("p2"),
                                         F.col("psup").alias("s2"))), "p2")
            .crossJoin(F.broadcast(n_orders))
            .select("p1", "p2", "support", "s1", "s2",
                    F.round(lift, 6).alias("lift"))
            .orderBy(F.desc("support"), F.asc("p1"), F.asc("p2"))
            .limit(COPURCHASE_TOPK))


SQL_COPURCHASE_PAIRS = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS support
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                      AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_SUPPORT}
), psup AS (
  SELECT l_partkey, count(*) AS psup FROM li GROUP BY 1
), n AS (SELECT count(*) AS n_orders FROM orders)
SELECT p.p1, p.p2, p.support, s1.psup AS s1, s2.psup AS s2,
       round((p.support::DOUBLE * n.n_orders::DOUBLE)
             / (s1.psup::DOUBLE * s2.psup::DOUBLE), 6) AS lift
FROM pairs p
JOIN psup s1 ON s1.l_partkey = p.p1
JOIN psup s2 ON s2.l_partkey = p.p2, n
ORDER BY support DESC, p1 ASC, p2 ASC
LIMIT {COPURCHASE_TOPK}
"""


# ------------------------------------------- embedding coverage audit

#: expected embedding dimensionality for the corpus's vector table
EMB_DIM = 64


def q_embedding_coverage_audit(spark, sf_dir):
    """Vector-table governance: per label — vector count, wrong-dim
    vectors, vectors with no matching document (dangling vec_id), exact
    zero-norm vectors (dead embeddings an ANN index silently drops),
    and the mean squared norm. The constraint_audit pattern applied to
    the docs↔embeddings alignment every similarity pipeline assumes.

    Scale shape: norms are map-side sequential folds (per-row 6dp ints
    before any aggregation — float policy); the missing-doc check joins
    ids only; one 10-key label aggregate."""
    e = _rd(spark, sf_dir, "embeddings")
    d = _rd(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), F.lit(1).alias("has_doc"))
    v = F.transform("embedding", lambda x: x.cast("double"))
    norm2 = F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)
    n2_int = F.round(F.round(norm2, 6) * 1e6).cast("long")
    j = (e.select("vec_id", "label",
                  F.size("embedding").alias("dim"),
                  n2_int.alias("n2"))
          .join(d, "vec_id", "left"))
    return (j.groupBy("label")
             .agg(F.count(F.lit(1)).alias("n_vecs"),
                  F.sum((F.col("dim") != EMB_DIM).cast("long"))
                   .alias("n_dim_bad"),
                  F.sum(F.col("has_doc").isNull().cast("long"))
                   .alias("n_missing_doc"),
                  F.sum((F.col("n2") == 0).cast("long"))
                   .alias("n_zero_norm"),
                  F.round(F.sum("n2") / F.count(F.lit(1)) / 1e6, 6)
                   .alias("avg_norm2")))


SQL_EMBEDDING_COVERAGE_AUDIT = f"""
WITH per AS (
  SELECT e.vec_id, e.label, len(e.embedding) AS dim,
         CAST(round(round(list_aggregate(list_transform(
                e.embedding, x -> x::DOUBLE * x::DOUBLE), 'sum'), 6)
              * 1000000) AS BIGINT) AS n2,
         d.doc_id AS has_doc
  FROM embeddings e LEFT JOIN documents d ON e.vec_id = d.doc_id
)
SELECT label, count(*) AS n_vecs,
       CAST(sum(CASE WHEN dim != {EMB_DIM} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dim_bad,
       CAST(sum(CASE WHEN has_doc IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_missing_doc,
       CAST(sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero_norm,
       round(sum(n2) * 1.0 / count(*) / 1000000, 6) AS avg_norm2
FROM per GROUP BY label
"""


# ------------------------------------------------ skew-salted aggregates

def q_skew_salted_agg(spark, sf_dir):
    """The skew toolkit under the hash gate: event_type is this table's
    maximal skew key (5 values across every row), so both manual
    mitigations run against it and their outputs hash-check against the
    PLAIN forms — salting is value-transparent or it is wrong.

    - `skew.salted_collect_list` gathers every type's cent values in
      ≤ 1/{SALT}-of-a-hot-key partial lists; the gated column is the md5
      of the ','-joined ASCENDING list (scalar-primitive rule; multiset
      equality is what salting must preserve).
    - `skew.salted_join` joins each event row to its type's 5-row stats
      relation through (key, salt) sub-keys; the offset checksum
      Σ(event_id − type min_id) is exact-integer proof every row met the
      right stats row. (A 5-row small side would of course broadcast in
      production — the point here is gating the salted plan's values,
      and the small side is replicated salt×, never the events.)
    """
    from photon_spark.functions import skew

    from photon_spark.queries import _t
    e = _t(spark, sf_dir, "events").select(
        "event_type", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    lists = skew.salted_collect_list(e, "event_type", "cents",
                                     sorted_lists=True)
    digest = lists.select(
        "event_type",
        F.md5(F.array_join(
            F.transform("values", lambda x: x.cast("string")), ","))
         .alias("values_md5"))
    stats = e.groupBy("event_type").agg(F.min("event_id").alias("min_id"))
    j = skew.salted_join(e, stats, on="event_type")
    agg = (j.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("cents") / 100.0, 2).alias("sum_value"),
                 F.sum(F.col("event_id") - F.col("min_id"))
                  .alias("offset_checksum")))
    return agg.join(digest, "event_type")


SQL_SKEW_SALTED_AGG = """
WITH e AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), s AS (
  SELECT event_type, min(event_id) AS min_id FROM e GROUP BY 1
), d AS (
  SELECT event_type,
         md5(string_agg(cents, ',' ORDER BY cents)) AS values_md5
  FROM e GROUP BY 1
)
SELECT e.event_type, count(*) AS n_events,
       round(sum(e.cents) / 100.0, 2) AS sum_value,
       CAST(sum(e.event_id - s.min_id) AS BIGINT) AS offset_checksum,
       d.values_md5
FROM e JOIN s USING (event_type) JOIN d USING (event_type)
GROUP BY e.event_type, d.values_md5
"""


QUERIES = {
    "constraint_audit": q_constraint_audit,
    "skew_salted_agg": q_skew_salted_agg,
    "embedding_coverage_audit": q_embedding_coverage_audit,
    "cohort_retention": q_cohort_retention,
    "dup_graph_clustering": q_dup_graph_clustering,
    "copurchase_pairs": q_copurchase_pairs,
    "source_diversity": q_source_diversity,
    "value_mad_outliers": q_value_mad_outliers,
}

ORACLES = {
    "constraint_audit": SQL_CONSTRAINT_AUDIT,
    "skew_salted_agg": SQL_SKEW_SALTED_AGG,
    "embedding_coverage_audit": SQL_EMBEDDING_COVERAGE_AUDIT,
    "cohort_retention": SQL_COHORT_RETENTION,
    "dup_graph_clustering": _sql_clustering(),
    "copurchase_pairs": SQL_COPURCHASE_PAIRS,
    "source_diversity": SQL_SOURCE_DIVERSITY,
    "value_mad_outliers": SQL_VALUE_MAD_OUTLIERS,
}


# -------------------------------------------- corpus version diff

def q_corpus_version_diff(spark, sf_dir):
    """Snapshot diff between two corpus versions — the data-versioning
    operator every managed training corpus needs (what changed between
    crawl N and crawl N+1, per source). Two versions are derived
    deterministically from the gated table (md5 buckets pick which docs
    each version holds and which text was revised), then diffed the way
    REAL snapshots are: a FULL OUTER join on doc_id comparing content
    hashes — the classifier never peeks at the version rule.

    Scale: both sides project to (doc_id, source, length, md5(text)) AT
    THE SCAN, so the one wide exchange ships ~50 bytes/doc and the text
    column never moves; status is a null/hash compare after the join and
    the per-(source, status) rollup collapses map-side. A 100 TB corpus
    diff is one id-keyed shuffle of fingerprints."""
    d = (_rd(spark, sf_dir, "documents")
         .select("doc_id", "source", "text",
                 F.substring(F.md5(F.concat(F.lit("ver:"),
                             F.col("doc_id").cast("string"))), 1, 2)
                  .alias("h2")))
    rev = (F.col("h2") >= "1a") & (F.col("h2") < "40")
    t2 = F.when(rev, F.concat(F.col("text"), F.lit(" [rev]"))) \
          .otherwise(F.col("text"))
    v1 = (d.where(F.col("h2") >= "0d")
           .select(F.col("doc_id").alias("id1"),
                   F.col("source").alias("src1"),
                   F.length("text").alias("len1"),
                   F.md5("text").alias("hash1")))
    v2 = (d.where((F.col("h2") < "0d") | (F.col("h2") >= "1a"))
           .select(F.col("doc_id").alias("id2"),
                   F.col("source").alias("src2"),
                   F.length(t2).alias("len2"),
                   F.md5(t2).alias("hash2")))
    j = v1.join(v2, v1.id1 == v2.id2, "full_outer")
    status = (F.when(F.col("id1").isNull(), "added")
               .when(F.col("id2").isNull(), "removed")
               .when(F.col("hash1") != F.col("hash2"), "changed")
               .otherwise("unchanged"))
    delta = F.coalesce(F.col("len2"), F.lit(0)) \
        - F.coalesce(F.col("len1"), F.lit(0))
    return (j.groupBy(F.coalesce("src2", "src1").alias("source"),
                      status.alias("status"))
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(delta).alias("chars_delta")))


SQL_CORPUS_VERSION_DIFF = """
WITH b AS (
  SELECT doc_id, source, text,
         substr(md5('ver:' || doc_id::VARCHAR), 1, 2) AS h2
  FROM documents),
v1 AS (
  SELECT doc_id AS id1, source AS src1, length(text) AS len1,
         md5(text) AS hash1
  FROM b WHERE h2 >= '0d'),
v2 AS (
  SELECT doc_id AS id2, source AS src2,
         length(CASE WHEN h2 >= '1a' AND h2 < '40'
                THEN text || ' [rev]' ELSE text END) AS len2,
         md5(CASE WHEN h2 >= '1a' AND h2 < '40'
             THEN text || ' [rev]' ELSE text END) AS hash2
  FROM b WHERE h2 < '0d' OR h2 >= '1a')
SELECT coalesce(src2, src1) AS source,
       CASE WHEN id1 IS NULL THEN 'added'
            WHEN id2 IS NULL THEN 'removed'
            WHEN hash1 != hash2 THEN 'changed'
            ELSE 'unchanged' END AS status,
       count(*) AS n_docs,
       CAST(sum(coalesce(len2, 0) - coalesce(len1, 0)) AS BIGINT)
         AS chars_delta
FROM v1 FULL OUTER JOIN v2 ON id1 = id2
GROUP BY 1, 2
"""

QUERIES["corpus_version_diff"] = q_corpus_version_diff
ORACLES["corpus_version_diff"] = SQL_CORPUS_VERSION_DIFF


# -------------------------------------------- fuzzy entity pairs

def q_fuzzy_name_pairs(spark, sf_dir):
    """Fuzzy entity resolution over the part-name vocabulary — the
    blocked edit-distance self-join every data-cleaning pipeline needs
    (deduping free-text entity names without an n² comparison). Two
    classic moves, both load-bearing at 100 TB:

    1. **Vocabulary reduce first**: the fact collapses to DISTINCT
       names + counts before any pairing, so the join runs on the
       vocabulary (bounded), never the rows.
    2. **Multi-pass blocking**: candidate pairs come from TWO cheap
       equality blocks (same first word; same second word) UNION-deduped
       — each pass is an equi-join Catalyst hashes, and Levenshtein runs
       only inside blocks. Pairs agreeing on neither word are missed BY
       DESIGN (the standard blocking recall trade; add passes to raise
       recall). Nothing here is a cross join — plan-lint applies.

    Both engines evaluate the same classic Levenshtein, so the distance
    column is exact cross-engine."""
    names = (_rd(spark, sf_dir, "part")
             .groupBy(F.col("p_name").alias("name"))
             .agg(F.count(F.lit(1)).alias("n_parts")))
    a = names.select(F.col("name").alias("name_a"),
                     F.col("n_parts").alias("n_parts_a"))
    b = names.select(F.col("name").alias("name_b"),
                     F.col("n_parts").alias("n_parts_b"))

    def block(word_idx):
        cond = ((F.split_part(F.col("name_a"), F.lit(" "),
                              F.lit(word_idx))
                 == F.split_part(F.col("name_b"), F.lit(" "),
                                 F.lit(word_idx)))
                & (F.col("name_a") < F.col("name_b")))
        return a.join(b, cond)

    cand = block(1).unionByName(block(2)).distinct()
    lev = F.levenshtein("name_a", "name_b")
    return (cand.where(lev <= 3)
                .select("name_a", "name_b",
                        lev.cast("long").alias("lev_dist"),
                        "n_parts_a", "n_parts_b"))


SQL_FUZZY_NAME_PAIRS = """
WITH names AS (
  SELECT p_name AS name, count(*) AS n_parts FROM part GROUP BY 1),
blocked AS (
  SELECT a.name AS name_a, b.name AS name_b,
         a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
  FROM names a JOIN names b
    ON split_part(a.name, ' ', 1) = split_part(b.name, ' ', 1)
   AND a.name < b.name
  UNION
  SELECT a.name, b.name, a.n_parts, b.n_parts
  FROM names a JOIN names b
    ON split_part(a.name, ' ', 2) = split_part(b.name, ' ', 2)
   AND a.name < b.name)
SELECT name_a, name_b,
       CAST(levenshtein(name_a, name_b) AS BIGINT) AS lev_dist,
       n_parts_a, n_parts_b
FROM blocked WHERE levenshtein(name_a, name_b) <= 3
"""

QUERIES["fuzzy_name_pairs"] = q_fuzzy_name_pairs
ORACLES["fuzzy_name_pairs"] = SQL_FUZZY_NAME_PAIRS


# ------------------------------------------------- k-anonymity audit

def q_k_anonymity_audit(spark, sf_dir):
    """K-ANONYMITY audit over the customer quasi-identifiers — the
    privacy-governance pass a dataset release needs: treating
    (market segment, nation, account-balance band) as the
    quasi-identifier tuple an adversary could link on, every customer
    falling in an equivalence class of size < k is re-identifiable at
    k-anonymity level k. Output is the per-segment risk report: class
    counts and population by anonymity band (k=1 unique, 2-4, 5-9,
    10+), the minimum class size, and the 6dp share of customers in
    sub-5 classes — the number a privacy review reads first.

    Plan: ONE keyed aggregate over the quasi-identifier tuple builds
    the class-size relation (map-side combine collapses everything),
    then a per-segment rollup over |classes| rows — at 100 TB the
    second stage input is bounded by the QI cardinality, not the
    population. Integer bands via floor division; no floats until the
    final share division.
    """
    c = _rd(spark, sf_dir, "customer")
    qi = (c.select("c_mktsegment",
                   F.col("c_nationkey").alias("nation"),
                   F.floor(F.col("c_acctbal") / 1000).cast("long")
                    .alias("bal_band"))
           .groupBy("c_mktsegment", "nation", "bal_band")
           .agg(F.count(F.lit(1)).alias("k")))
    band = (F.when(F.col("k") == 1, "k=1")
             .when(F.col("k") <= 4, "k=2-4")
             .when(F.col("k") <= 9, "k=5-9")
             .otherwise("k>=10")).alias("band")
    per_band = (qi.groupBy("c_mktsegment", band)
                  .agg(F.count(F.lit(1)).alias("n_classes"),
                       F.sum("k").alias("n_customers")))
    seg = (qi.groupBy("c_mktsegment")
             .agg(F.min("k").alias("min_k"),
                  F.sum("k").alias("seg_total"),
                  F.sum(F.when(F.col("k") < 5, F.col("k"))
                         .otherwise(F.lit(0))).alias("at_risk")))
    return (per_band.join(seg, "c_mktsegment")
                    .select("c_mktsegment", "band", "n_classes",
                            "n_customers", "min_k",
                            F.round(F.col("at_risk")
                                    / F.col("seg_total"), 6)
                             .alias("seg_risk_share")))


SQL_K_ANONYMITY_AUDIT = """
WITH qi AS (
  SELECT c_mktsegment, c_nationkey AS nation,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
         count(*) AS k
  FROM customer GROUP BY 1, 2, 3
), per_band AS (
  SELECT c_mktsegment,
         CASE WHEN k = 1 THEN 'k=1'
              WHEN k <= 4 THEN 'k=2-4'
              WHEN k <= 9 THEN 'k=5-9'
              ELSE 'k>=10' END AS band,
         count(*) AS n_classes,
         CAST(sum(k) AS BIGINT) AS n_customers
  FROM qi GROUP BY 1, 2
), seg AS (
  SELECT c_mktsegment, CAST(min(k) AS BIGINT) AS min_k,
         sum(k) AS seg_total,
         sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS at_risk
  FROM qi GROUP BY 1
)
SELECT p.c_mktsegment, p.band, p.n_classes, p.n_customers, s.min_k,
       round(s.at_risk * 1.0 / s.seg_total, 6) AS seg_risk_share
FROM per_band p JOIN seg s USING (c_mktsegment)
"""

QUERIES["k_anonymity_audit"] = q_k_anonymity_audit
ORACLES["k_anonymity_audit"] = SQL_K_ANONYMITY_AUDIT


# ---------------------------------------- erasure propagation audit

#: deterministic erasure cohort: the users who filed deletion requests
ERASE_MOD, ERASE_RESIDUE = 97, 13


def q_erasure_propagation_audit(spark, sf_dir):
    """RIGHT-TO-BE-FORGOTTEN propagation audit — before purging an
    erasure cohort (user_id % 97 == 13), a compliance pass must
    enumerate every relation that still references those subjects and
    how much of it goes: the raw event log, the latest-state view (the
    argmax each CDC consumer materializes), and the daily-activity
    rollup. Output per relation: total rows, rows referencing the
    cohort, distinct cohort subjects present, and the exact row count
    a purge would leave — the numbers a deletion-request SLA report
    carries.

    Scale: each relation is audited by ONE aggregate with the erasure
    predicate as a map-side flag — no joins against a subject list
    (the cohort is a predicate here; a literal subject table would
    broadcast), no second pass to size the purge. The latest-state
    audit rides the same single-shuffle argmax as upsert_merge."""
    from photon_spark.queries import _t

    ev = _t(spark, sf_dir, "events")
    erased = (F.col("user_id") % ERASE_MOD) == ERASE_RESIDUE

    def audit(df, name):
        return df.agg(
            F.lit(name).alias("relation"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(erased.cast("long")).alias("n_rows_erased"),
            F.count_distinct(F.when(erased, F.col("user_id")))
             .alias("n_subjects"),
            (F.count(F.lit(1)) - F.sum(erased.cast("long")))
             .alias("n_rows_after_purge"))

    log = audit(ev, "event_log")
    state = audit(
        ev.groupBy("user_id", "event_type")
          .agg(F.max(F.struct("ts", "event_id")).alias("r")),
        "latest_state")
    daily = audit(
        ev.select("user_id",
                  (F.col("ts") - F.pmod("ts", F.lit(86_400_000_000_000)))
                   .alias("day")).distinct(),
        "daily_activity")
    return log.unionByName(state).unionByName(daily)


SQL_ERASURE_PROPAGATION_AUDIT = f"""
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_ns(ts) AS ts_ns
  FROM events
), lg AS (
  SELECT 'event_log' AS relation, count(*) AS n_rows,
         sum(CASE WHEN user_id % {ERASE_MOD} = {ERASE_RESIDUE}
             THEN 1 ELSE 0 END) AS n_rows_erased,
         count(DISTINCT CASE WHEN user_id % {ERASE_MOD} = {ERASE_RESIDUE}
               THEN user_id END) AS n_subjects
  FROM ev
), st AS (
  SELECT 'latest_state' AS relation, count(*) AS n_rows,
         sum(CASE WHEN user_id % {ERASE_MOD} = {ERASE_RESIDUE}
             THEN 1 ELSE 0 END) AS n_rows_erased,
         count(DISTINCT CASE WHEN user_id % {ERASE_MOD} = {ERASE_RESIDUE}
               THEN user_id END) AS n_subjects
  FROM (SELECT user_id, event_type FROM ev GROUP BY 1, 2)
), dy AS (
  SELECT 'daily_activity' AS relation, count(*) AS n_rows,
         sum(CASE WHEN user_id % {ERASE_MOD} = {ERASE_RESIDUE}
             THEN 1 ELSE 0 END) AS n_rows_erased,
         count(DISTINCT CASE WHEN user_id % {ERASE_MOD} = {ERASE_RESIDUE}
               THEN user_id END) AS n_subjects
  FROM (SELECT DISTINCT user_id,
               ts_ns - ts_ns % 86400000000000 AS day FROM ev)
)
SELECT relation, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_rows_erased AS BIGINT) AS n_rows_erased,
       CAST(n_subjects AS BIGINT) AS n_subjects,
       CAST(n_rows - n_rows_erased AS BIGINT) AS n_rows_after_purge
FROM (SELECT * FROM lg UNION ALL SELECT * FROM st
      UNION ALL SELECT * FROM dy)
"""

QUERIES["erasure_propagation_audit"] = q_erasure_propagation_audit
ORACLES["erasure_propagation_audit"] = SQL_ERASURE_PROPAGATION_AUDIT

# ---------------------------------------------- l-diversity audit

#: minimum distinct-sensitive-value count a released class must carry
L_MIN = 3


def q_l_diversity_audit(spark, sf_dir):
    """L-DIVERSITY audit — the companion check k-anonymity
    (q_k_anonymity_audit) cannot make: a class can be large (k high)
    yet still leak if every member shares the same sensitive value
    (the homogeneity attack). Treating (market segment, nation) as the
    quasi-identifier of a released orders extract and the order
    priority as the sensitive attribute, each QI class is scored by
    l = |distinct sensitive values| and by the dominant-value share
    (1.0 means total homogeneity). Output per class: order count, l,
    the dominant share at 6dp, and the l < L_MIN violation flag a
    release gate reads.

    Plan: the fact joins the size-gated customer dim once (ids only —
    the QI columns project before the join), then TWO stacked keyed
    aggregates: (QI, sensitive) counts collapse map-side first, so the
    second stage input is bounded by |QI|·|sensitive domain| (125·5
    here; still tiny at 100 TB), never by the fact. Dominant share is
    max(count)/sum(count) — exact integers until one final division.
    """
    from photon_spark.queries_relational import _bcast_dim

    o = _rd(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = _rd(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", F.col("c_nationkey").alias("nation"))
    cls = (o.join(_bcast_dim(c), o.o_custkey == c.c_custkey)
             .groupBy("c_mktsegment", "nation", "o_orderpriority")
             .agg(F.count(F.lit(1)).alias("n")))
    return (cls.groupBy("c_mktsegment", "nation")
               .agg(F.sum("n").alias("n_orders"),
                    F.count(F.lit(1)).alias("l_distinct"),
                    F.max("n").alias("dom"))
               .select("c_mktsegment", "nation", "n_orders", "l_distinct",
                       F.round(F.col("dom") / F.col("n_orders"), 6)
                        .alias("dominant_share"),
                       (F.col("l_distinct") < L_MIN).alias("violates_l")))


SQL_L_DIVERSITY_AUDIT = f"""
WITH cls AS (
  SELECT c_mktsegment, c_nationkey AS nation, o_orderpriority,
         count(*) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2, 3
)
SELECT c_mktsegment, nation, CAST(sum(n) AS BIGINT) AS n_orders,
       count(*) AS l_distinct,
       round(max(n) * 1.0 / sum(n), 6) AS dominant_share,
       count(*) < {L_MIN} AS violates_l
FROM cls GROUP BY 1, 2
"""

QUERIES["l_diversity_audit"] = q_l_diversity_audit
ORACLES["l_diversity_audit"] = SQL_L_DIVERSITY_AUDIT


# ------------------------------------- differentially-private release

#: truncation bound of the discrete-Laplace noise support [-K, K]
DP_K = 8
#: seed baked into the noise hash — changing it re-draws every noise
DP_SEED = "dp-release-r9"
#: (noise value, 12-hex-char cumulative threshold) for eps=1 truncated
#: discrete Laplace, computed ONCE in Python (P(k) ∝ exp(-|k|)) and
#: compared LEXICOGRAPHICALLY against the md5-prefix draw — hex-string
#: order equals numeric order of the 48-bit prefix, so no float, no
#: exp(), no integer-parse of hex ever crosses an engine boundary
DP_THRESHOLDS = [
    (-8, "000a29530809"), (-7, "0025c874ffd2"), (-6, "0070ddc9dc5c"),
    (-5, "013cf6c8dd52"), (-4, "0367c2480387"), (-3, "094bd90b6ef4"),
    (-2, "194f422f6911"), (-1, "44d69cb6bbf6"), (0, "bb2963494409"),
    (1, "e6b0bdd096ee"), (2, "f6b426f4910b"), (3, "fc983db7fc78"),
    (4, "fec3093722ad"), (5, "ff8f223623a3"), (6, "ffda378b002d"),
    (7, "fff5d6acf7f6"), (8, "ffffffffffff"),
]

#: the [-K, K] truncation CLAMPS the discrete-Laplace tails onto the
#: boundary values (the last/first threshold buckets absorb them), which
#: breaks PURE eps-DP: for neighboring counts the extreme outputs get
#: probability 0 on one side, so the likelihood ratio is unbounded on an
#: event whose mass is the clamped tail, P(|Z| >= K) = 2·p^K/(1+p) with
#: p = e^(-eps). The honest release label is therefore (eps, delta)-DP
#: with delta = that tail mass (conservative two-boundary bound),
#: rounded to 9dp so both engines carry the identical double literal.
DP_DELTA = round(2 * math.e ** -DP_K / (1 + math.e ** -1), 9)


def _noise_expr(key_col, seed: str):
    """The deterministic truncated discrete-Laplace draw as ONE shared
    Catalyst expression: first 12 hex chars of md5(key ':' seed) mapped
    through the precomputed cumulative thresholds by LEXICOGRAPHIC
    comparison (CASE chain built largest-threshold-down so the smallest
    matching bound wins bottom-up). One definition across every DP
    release — the probe_cells rule: a convention change (prefix width,
    comparison, table shape) can never desynchronize one release's
    Spark draw from its oracle twin (:func:`_sql_noise_cases`)."""
    h = F.substring(F.md5(F.concat(key_col, F.lit(":" + seed))), 1, 12)
    expr = F.lit(DP_THRESHOLDS[-1][0])
    for k, t in reversed(DP_THRESHOLDS[:-1]):
        expr = F.when(h <= F.lit(t), F.lit(k)).otherwise(expr)
    return expr


def _sql_noise_cases() -> str:
    """The oracle twin of :func:`_noise_expr`'s CASE chain, over a
    column named ``h`` holding the same 12-hex md5 prefix."""
    return " ".join(
        f"WHEN h <= '{t}' THEN {k}" for k, t in DP_THRESHOLDS[:-1])


def q_dp_noisy_event_counts(spark, sf_dir):
    """DIFFERENTIALLY-PRIVATE count release (the governance tier's
    output side): per event_type, the true count plus truncated
    discrete-Laplace noise at eps=1 (sensitivity 1 for count queries) —
    the standard DP histogram release, with the noise draw made
    DETERMINISTIC and engine-portable so it can sit under the hash
    gate: the uniform draw is the first 12 hex chars of
    md5(event_type ':' seed), mapped through Python-precomputed
    cumulative thresholds by LEXICOGRAPHIC comparison (hex order =
    numeric order; no exp/float/hex-parse in either engine). A seeded
    draw is also what production DP systems need for replayable
    releases; rotating DP_SEED re-draws all noise.

    Privacy accounting (audit metadata): the ±DP_K truncation of the
    draw table clamps the Laplace tails, which breaks PURE eps-DP (see
    DP_DELTA) — the release is labeled (eps=1, delta=DP_DELTA)-DP, the
    same truncation-honesty correction the noisy-max row carries. The
    truncated table is what keeps the draw engine-portable and
    hash-gateable; an untruncated geometric mechanism would be pure
    eps-DP but not cross-engine exact.

    Plan: one keyed count aggregate + a per-group CASE chain over 17
    literal thresholds — map-side combine, constant release size.
    Audit columns keep the true count beside the noisy one (this is a
    correctness AUDIT row; a real release publishes only n_noisy)."""
    from photon_spark.queries import _t

    e = _t(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_true"))
    expr = _noise_expr(F.col("event_type"), DP_SEED)
    return (agg.select("event_type", "n_true",
                       expr.cast("long").alias("noise"))
               .withColumn("n_noisy",
                           F.greatest(F.col("n_true") + F.col("noise"),
                                      F.lit(0)).cast("long"))
               .withColumn("epsilon", F.lit(1.0))
               .withColumn("delta", F.lit(DP_DELTA)))


def _sql_dp_noisy_event_counts() -> str:
    cases = _sql_noise_cases()
    return f"""
WITH agg AS (
  SELECT event_type, count(*) AS n_true FROM events GROUP BY 1
), drawn AS (
  SELECT event_type, n_true,
         substring(md5(event_type || ':{DP_SEED}'), 1, 12) AS h
  FROM agg
)
SELECT event_type, n_true,
       CAST(CASE {cases} ELSE {DP_K} END AS BIGINT) AS noise,
       CAST(greatest(n_true + CASE {cases} ELSE {DP_K} END, 0)
            AS BIGINT) AS n_noisy,
       CAST(1.0 AS DOUBLE) AS epsilon,
       CAST({DP_DELTA!r} AS DOUBLE) AS delta
FROM drawn
"""


QUERIES["dp_noisy_event_counts"] = q_dp_noisy_event_counts
ORACLES["dp_noisy_event_counts"] = _sql_dp_noisy_event_counts()


# ----------------------------------------- DP selection (noisy argmax)

#: seed for the RNM draw — distinct from DP_SEED so the two releases'
#: noise draws are independent
DP_RNM_SEED = "dp-rnm-r9"


def q_dp_noisy_max_event_type(spark, sf_dir):
    """REPORT-NOISY-MAX — the differentially-private SELECTION
    mechanism beside the count release (dp_noisy_event_counts): which
    event_type is most common, released by adding an independent
    truncated discrete-Laplace draw to every candidate's count and
    reporting the argmax (plus its noisy score; a strict release
    publishes the identity alone — this is the audit form, the house
    convention). Selection via noisy argmax satisfies eps-DP without
    the composition cost of releasing every noisy count — the standard
    mechanism for "which bucket wins" questions over sensitive data.

    Engine-portable determinism: same trick as the count release —
    md5-prefix uniform draw mapped through Python-precomputed
    cumulative thresholds by lexicographic hex comparison, keyed by
    (event_type, RNM seed); the argmax tie-breaks on event_type so
    equal noisy scores release identically in both engines.

    Privacy accounting (audit metadata): the noise is the SAME
    two-sided discrete Laplace at the eps=1 scale as the count
    release — report-noisy-max with two-sided noise at that scale
    satisfies 2·eps-DP (the eps-DP bound needs one-sided
    exponential/Gumbel noise), so the released ``epsilon`` is 2.0.
    The ±DP_K truncation of the draw table additionally
    makes the guarantee approximate (a tail event is clamped rather
    than released) — pure-DP claims should use an untruncated
    mechanism; the truncated table is what keeps the draw
    engine-portable and hash-gateable.

    Plan: one keyed count aggregate, map-side CASE chain, a 1-row
    TakeOrderedAndProject. Constant release size."""
    from photon_spark.queries import _t

    e = _t(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_true"))
    expr = _noise_expr(F.col("event_type"), DP_RNM_SEED)
    noisy = agg.select("event_type",
                       (F.col("n_true") + expr).cast("long")
                       .alias("noisy_score"))
    return (noisy.orderBy(F.desc("noisy_score"), F.asc("event_type"))
                 .limit(1)
                 .withColumn("epsilon", F.lit(2.0)))


def _sql_dp_noisy_max() -> str:
    cases = _sql_noise_cases()
    return f"""
WITH agg AS (
  SELECT event_type, count(*) AS n_true FROM events GROUP BY 1
), drawn AS (
  SELECT event_type, n_true,
         substring(md5(event_type || ':{DP_RNM_SEED}'), 1, 12) AS h
  FROM agg
)
SELECT event_type,
       CAST(n_true + CASE {cases} ELSE {DP_K} END AS BIGINT)
         AS noisy_score,
       CAST(2.0 AS DOUBLE) AS epsilon
FROM drawn
ORDER BY noisy_score DESC, event_type ASC
LIMIT 1
"""


QUERIES["dp_noisy_max_event_type"] = q_dp_noisy_max_event_type
ORACLES["dp_noisy_max_event_type"] = _sql_dp_noisy_max()


# ------------------- USER-LEVEL DP: per-user contribution bounding

#: per-user contribution cap — each user's first CAP events (by
#: event_id) are the only ones that may influence the release
DP_USER_CAP = 2
#: seed for this release's noise draws, independent of the other two
DP_USER_SEED = "dp-user-r11"
#: with neighbors differing by up to CAP events, the clamp-failure
#: events widen to the top CAP cells of the truncated support:
#: delta = 2·p^(K-CAP+1)/(1+p), p = e^(-1) (see DP_DELTA's derivation)
DP_USER_DELTA = round(2 * math.e ** -(DP_K - DP_USER_CAP + 1)
                      / (1 + math.e ** -1), 9)


def q_dp_user_bounded_counts(spark, sf_dir):
    """USER-LEVEL differentially-private count release — the release
    the two event-level DP rows cannot make: `dp_noisy_event_counts`
    protects one EVENT (sensitivity 1), but a real user contributes
    many events, so its guarantee degrades by the user's (unbounded)
    activity. The standard production fix is CONTRIBUTION BOUNDING:
    keep each user's first {cap} events (deterministic rank by
    event_id), so add/remove of a whole USER changes the histogram by
    at most {cap} — and the same truncated discrete-Laplace table at
    unit scale then gives an (eps={cap}, delta=DP_USER_DELTA)-DP
    USER-level guarantee (group/sensitivity composition: unit-scale
    noise at L1-sensitivity C costs C·eps; the clamp-failure tail
    widens to the top C cells, see DP_USER_DELTA).

    Audit columns keep the unbounded true count AND the bounded count
    beside the noisy release, so the row also gates the bounding
    operator itself (a type whose events all fall outside its users'
    first-{cap} windows releases from 0 — visible, not dropped). The
    (release_epsilon, release_delta) guarantee covers ``n_noisy``
    ALONE — n_true/n_bounded/noise are exact audit columns a real
    release omits, which is why the metadata columns carry the
    ``release_`` prefix.

    Plan: ONE user-keyed shuffle (the window rank that every
    user-level bounding must pay — only (user_id, event_type,
    event_id) triples move), a map-side-combined count per type, a
    tiny per-type left join to the unbounded counts, and the literal
    CASE chain. At 100 TB nothing but the 3-column projection ever
    shuffles, and the release is constant-size."""
    from pyspark.sql import Window

    from photon_spark.queries import _t

    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id")
    w = Window.partitionBy("user_id").orderBy("event_id")
    bounded = (e.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= DP_USER_CAP))
    agg = (bounded.groupBy("event_type")
                  .agg(F.count(F.lit(1)).alias("n_bounded")))
    true_agg = (e.groupBy("event_type")
                 .agg(F.count(F.lit(1)).alias("n_true")))
    expr = _noise_expr(F.col("event_type"), DP_USER_SEED)
    return (true_agg.join(agg, "event_type", "left")
            .select("event_type", "n_true",
                    F.coalesce("n_bounded", F.lit(0)).cast("long")
                     .alias("n_bounded"),
                    expr.cast("long").alias("noise"))
            .withColumn("n_noisy",
                        F.greatest(F.col("n_bounded") + F.col("noise"),
                                   F.lit(0)).cast("long"))
            .withColumn("release_epsilon", F.lit(float(DP_USER_CAP)))
            .withColumn("release_delta", F.lit(DP_USER_DELTA)))


q_dp_user_bounded_counts.__doc__ = q_dp_user_bounded_counts.__doc__.format(
    cap=DP_USER_CAP)


def _sql_dp_user_bounded_counts() -> str:
    cases = _sql_noise_cases()
    return f"""
WITH b AS (
  SELECT event_type FROM (
    SELECT event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id)
             AS rn
    FROM events) WHERE rn <= {DP_USER_CAP}
), agg AS (
  SELECT event_type, count(*) AS n_bounded FROM b GROUP BY 1
), t AS (
  SELECT event_type, count(*) AS n_true FROM events GROUP BY 1
), drawn AS (
  SELECT t.event_type, t.n_true,
         coalesce(a.n_bounded, 0) AS n_bounded,
         substring(md5(t.event_type || ':{DP_USER_SEED}'), 1, 12) AS h
  FROM t LEFT JOIN agg a USING (event_type)
)
SELECT event_type, n_true,
       CAST(n_bounded AS BIGINT) AS n_bounded,
       CAST(CASE {cases} ELSE {DP_K} END AS BIGINT) AS noise,
       CAST(greatest(n_bounded + CASE {cases} ELSE {DP_K} END, 0)
            AS BIGINT) AS n_noisy,
       CAST({float(DP_USER_CAP)!r} AS DOUBLE) AS release_epsilon,
       CAST({DP_USER_DELTA!r} AS DOUBLE) AS release_delta
FROM drawn
"""


QUERIES["dp_user_bounded_counts"] = q_dp_user_bounded_counts
ORACLES["dp_user_bounded_counts"] = _sql_dp_user_bounded_counts()


# ----------------- USER-LEVEL DP: bounded + clamped + quantized SUM

#: per-event value clamp for the sum release, in integer cents —
#: [0, 100.00] keeps one heavy event from dominating a user's L1
DP_VALUE_CAP_CENTS = 10_000
#: the release granularity AND the user-level L1 sensitivity of the
#: bounded clamped sum: CAP events x VALUE_CAP cents each
DP_SUM_GRAIN_CENTS = DP_USER_CAP * DP_VALUE_CAP_CENTS
#: seed for this release's noise draws, independent of the other three
DP_USER_SUM_SEED = "dp-user-sum-r12"
#: a user's CAP bounded events can SPAN up to CAP event types, each
#: moving that type's floored unit count by at most 1 (per-type
#: contribution <= GRAIN) — so the released per-type vector changes in
#: <= CAP coordinates by <= 1 unit each, and basic composition over the
#: independent per-type unit-scale draws prices the release at
#: eps = CAP x 1 with clamp-failure delta <= CAP x delta_1 (union
#: bound over the affected types' widened tails)
DP_USER_SUM_DELTA = round(DP_USER_CAP * DP_DELTA, 9)


def q_dp_user_bounded_sum(spark, sf_dir):
    """USER-LEVEL differentially-private SUM release — the numeric
    companion to `dp_user_bounded_counts`, built from the three
    standard production ingredients (the Google DP-SQL "bounded sum"
    shape): (1) CONTRIBUTION BOUNDING — each user's first
    {cap} events by event_id, the same deterministic window as the
    count release; (2) VALUE CLAMPING — each event's value clamped to
    [0, {vb}] and quantized to integer cents (order-free long sums, the
    repo float policy), so one whale event cannot blow up the
    sensitivity; (3) GRANULARITY QUANTIZATION — the bounded clamped
    sum is floored to units of GRAIN = CAP x VALUE_CAP cents, the
    whole-user L1 bound. Adding or removing one USER moves any single
    type's cents sum by at most GRAIN, hence that type's UNIT count by
    at most 1 — but the user's CAP events can SPAN up to CAP types, so
    the released per-type vector changes in up to CAP coordinates and
    basic composition over the independent per-type unit-scale draws
    prices the release at user-level (eps={cap},
    delta=DP_USER_SUM_DELTA = CAP x delta_1)-DP (see the constant's
    derivation); the published estimate ``release_sum`` = noisy units x
    GRAIN carries quantization error <= GRAIN — the precision/privacy
    dial (smaller GRAIN = finer estimate but more unit sensitivity to
    buy back with eps).

    The (release_epsilon, release_delta) guarantee covers
    ``release_units``/``release_sum`` ALONE — sum_clamped_cents,
    sum_bounded_cents, units and noise are exact audit columns gating
    the clamp, the bounding and the quantization operators themselves;
    a real release omits them.

    Plan: the count release's plan plus one clamped projection — ONE
    user-keyed shuffle for the bounding window (4 narrow columns move),
    two map-side-combined per-type sums joined per-type, the literal
    CASE chain. Constant release size at any corpus scale."""
    from pyspark.sql import Window

    from photon_spark.queries import _t

    cents = (F.round(F.least(F.greatest(F.col("value"), F.lit(0.0)),
                             F.lit(DP_VALUE_CAP_CENTS / 100.0)) * 100)
             .cast("long"))
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", cents.alias("v_cents"))
    w = Window.partitionBy("user_id").orderBy("event_id")
    bounded = (ev.withColumn("rn", F.row_number().over(w))
                 .where(F.col("rn") <= DP_USER_CAP))
    bs = (bounded.groupBy("event_type")
                 .agg(F.sum("v_cents").alias("sum_bounded_cents")))
    cs = (ev.groupBy("event_type")
            .agg(F.sum("v_cents").alias("sum_clamped_cents")))
    expr = _noise_expr(F.col("event_type"), DP_USER_SUM_SEED)
    units = F.floor(F.col("sum_bounded_cents")
                    / F.lit(float(DP_SUM_GRAIN_CENTS))).cast("long")
    return (cs.join(bs, "event_type", "left")
            .select("event_type", "sum_clamped_cents",
                    F.coalesce("sum_bounded_cents", F.lit(0)).cast("long")
                     .alias("sum_bounded_cents"))
            .select("event_type", "sum_clamped_cents", "sum_bounded_cents",
                    units.alias("units"),
                    expr.cast("long").alias("noise"))
            .withColumn("release_units",
                        F.greatest(F.col("units") + F.col("noise"),
                                   F.lit(0)).cast("long"))
            .withColumn("release_sum",
                        F.round(F.col("release_units")
                                * F.lit(DP_SUM_GRAIN_CENTS / 100.0), 2))
            .withColumn("release_epsilon", F.lit(float(DP_USER_CAP)))
            .withColumn("release_delta", F.lit(DP_USER_SUM_DELTA)))


q_dp_user_bounded_sum.__doc__ = q_dp_user_bounded_sum.__doc__.format(
    cap=DP_USER_CAP, vb=DP_VALUE_CAP_CENTS / 100.0)


def _sql_dp_user_bounded_sum() -> str:
    cases = _sql_noise_cases()
    vb = DP_VALUE_CAP_CENTS / 100.0
    g = DP_SUM_GRAIN_CENTS
    return f"""
WITH ev AS (
  SELECT user_id, event_type, event_id,
         CAST(round(least(greatest(value, 0.0), {vb}) * 100) AS BIGINT)
           AS v_cents
  FROM events
), b AS (
  SELECT event_type, v_cents FROM (
    SELECT event_type, v_cents,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id)
             AS rn
    FROM ev) WHERE rn <= {DP_USER_CAP}
), bs AS (
  SELECT event_type, sum(v_cents) AS sum_bounded_cents FROM b GROUP BY 1
), cs AS (
  SELECT event_type, sum(v_cents) AS sum_clamped_cents FROM ev GROUP BY 1
), drawn AS (
  SELECT cs.event_type,
         CAST(cs.sum_clamped_cents AS BIGINT) AS sum_clamped_cents,
         CAST(coalesce(bs.sum_bounded_cents, 0) AS BIGINT)
           AS sum_bounded_cents,
         CAST(floor(coalesce(bs.sum_bounded_cents, 0) * 1.0 / {g})
              AS BIGINT) AS units,
         substring(md5(cs.event_type || ':{DP_USER_SUM_SEED}'), 1, 12)
           AS h
  FROM cs LEFT JOIN bs USING (event_type)
)
SELECT event_type, sum_clamped_cents, sum_bounded_cents, units,
       CAST(CASE {cases} ELSE {DP_K} END AS BIGINT) AS noise,
       CAST(greatest(units + CASE {cases} ELSE {DP_K} END, 0) AS BIGINT)
         AS release_units,
       round(CAST(greatest(units + CASE {cases} ELSE {DP_K} END, 0)
                  AS BIGINT) * {g} / 100.0, 2) AS release_sum,
       CAST({float(DP_USER_CAP)!r} AS DOUBLE) AS release_epsilon,
       CAST({DP_USER_SUM_DELTA!r} AS DOUBLE) AS release_delta
FROM drawn
"""


QUERIES["dp_user_bounded_sum"] = q_dp_user_bounded_sum
ORACLES["dp_user_bounded_sum"] = _sql_dp_user_bounded_sum()


# ------------------- USER-LEVEL DP: mean as composed post-processing

#: the mean pairs the two component releases: basic composition adds
#: their budgets, (eps_count + eps_sum, delta_count + delta_sum)
DP_USER_MEAN_EPS = float(2 * DP_USER_CAP)
DP_USER_MEAN_DELTA = round(DP_USER_DELTA + DP_USER_SUM_DELTA, 9)


def q_dp_user_bounded_mean(spark, sf_dir):
    """USER-LEVEL differentially-private MEAN — the textbook DP mean as
    POST-PROCESSING of the two already-gated component releases:
    noisy-sum / noisy-count per event_type, each with its own bounding
    pipeline and independent seed. Post-processing is free, so the
    release prices at the BASIC COMPOSITION of its inputs —
    (eps = CAP + CAP, delta = DP_USER_DELTA + DP_USER_SUM_DELTA) —
    and because the same seeds re-yield the identical draws as the
    standalone rows, publishing this row alongside them costs no
    budget beyond that composition (replayable-release determinism
    doing real accounting work). n_noisy = 0 releases a NULL mean
    (engine-portable) rather than dividing by zero; release_sum is an
    exact multiple of GRAIN cents so the single IEEE division + 6dp
    round is cross-engine stable.

    The (release_epsilon, release_delta) guarantee covers
    (n_noisy, release_sum, release_mean) jointly; no exact audit
    columns appear in this row at all — it is shaped like the release
    a governance tier would actually publish.

    Plan: the union of the two component plans (both are one
    user-keyed window + tiny per-type aggregates) joined on the
    constant-size type relation — constant release size at any
    corpus scale."""
    counts = q_dp_user_bounded_counts(spark, sf_dir).select(
        "event_type", "n_noisy")
    sums = q_dp_user_bounded_sum(spark, sf_dir).select(
        "event_type", "release_sum")
    mean = F.round(F.col("release_sum")
                   / F.nullif(F.col("n_noisy").cast("double"),
                              F.lit(0.0)), 6)
    return (counts.join(sums, "event_type")
            .select("event_type", "n_noisy", "release_sum",
                    mean.alias("release_mean"))
            .withColumn("release_epsilon", F.lit(DP_USER_MEAN_EPS))
            .withColumn("release_delta", F.lit(DP_USER_MEAN_DELTA)))


def _sql_dp_user_bounded_mean() -> str:
    cases = _sql_noise_cases()
    vb = DP_VALUE_CAP_CENTS / 100.0
    g = DP_SUM_GRAIN_CENTS
    return f"""
WITH cb AS (
  SELECT event_type FROM (
    SELECT event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id)
             AS rn
    FROM events) WHERE rn <= {DP_USER_CAP}
), cagg AS (
  SELECT event_type, count(*) AS n_bounded FROM cb GROUP BY 1
), ct AS (
  SELECT DISTINCT event_type FROM events
), cdrawn AS (
  SELECT ct.event_type, coalesce(cagg.n_bounded, 0) AS n_bounded,
         substring(md5(ct.event_type || ':{DP_USER_SEED}'), 1, 12) AS h
  FROM ct LEFT JOIN cagg USING (event_type)
), counts AS (
  SELECT event_type,
         CAST(greatest(n_bounded + CASE {cases} ELSE {DP_K} END, 0)
              AS BIGINT) AS n_noisy
  FROM cdrawn
), sev AS (
  SELECT user_id, event_type, event_id,
         CAST(round(least(greatest(value, 0.0), {vb}) * 100) AS BIGINT)
           AS v_cents
  FROM events
), sb AS (
  SELECT event_type, v_cents FROM (
    SELECT event_type, v_cents,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id)
             AS rn
    FROM sev) WHERE rn <= {DP_USER_CAP}
), sagg AS (
  SELECT event_type, sum(v_cents) AS sum_bounded_cents FROM sb GROUP BY 1
), sdrawn AS (
  SELECT ct.event_type,
         CAST(floor(coalesce(sagg.sum_bounded_cents, 0) * 1.0 / {g})
              AS BIGINT) AS units,
         substring(md5(ct.event_type || ':{DP_USER_SUM_SEED}'), 1, 12)
           AS h
  FROM ct LEFT JOIN sagg USING (event_type)
), sums AS (
  SELECT event_type,
         round(CAST(greatest(units + CASE {cases} ELSE {DP_K} END, 0)
                    AS BIGINT) * {g} / 100.0, 2) AS release_sum
  FROM sdrawn
)
SELECT c.event_type, c.n_noisy, s.release_sum,
       round(s.release_sum / nullif(CAST(c.n_noisy AS DOUBLE), 0.0), 6)
         AS release_mean,
       CAST({DP_USER_MEAN_EPS!r} AS DOUBLE) AS release_epsilon,
       CAST({DP_USER_MEAN_DELTA!r} AS DOUBLE) AS release_delta
FROM counts c JOIN sums s USING (event_type)
"""


QUERIES["dp_user_bounded_mean"] = q_dp_user_bounded_mean
ORACLES["dp_user_bounded_mean"] = _sql_dp_user_bounded_mean()


# ---------------- USER-LEVEL DP: quantiles from one histogram release

#: value-domain bucket width in cents; {NB} buckets cover the clamp
#: range [0, DP_VALUE_CAP_CENTS]
DP_HIST_BUCKET_CENTS = 625
DP_HIST_NB = DP_VALUE_CAP_CENTS // DP_HIST_BUCKET_CENTS  # = 16
#: seed for the histogram cells' draws, independent of the other four
DP_USER_QUANT_SEED = "dp-user-quant-r12"


def q_dp_user_bounded_quantiles(spark, sf_dir):
    """USER-LEVEL differentially-private QUANTILES — the production way
    (one DP HISTOGRAM, quantiles as free post-processing) rather than a
    per-quantile mechanism: the user-bounded events' clamped values
    bucket into {nb} fixed cells of the clamp domain, EVERY
    (event_type, bucket) cell releases count+noise — absent cells
    included, because releasing only non-empty cells leaks which cells
    were empty — and q25/q50/q75 read off the noisy CDF (smallest
    bucket whose cumulative reaches ceil(q·total), via exact integer
    4·cum ≥ q4·total comparisons; NULL when the noisy total is 0). The
    whole row — total AND all three quantiles, and any other statistic
    anyone later derives from the same histogram — is covered by ONE
    (eps=CAP, delta=DP_USER_DELTA) user-level budget: a user's CAP
    bounded events move the cell vector by L1 ≤ CAP (eps = CAP·1 by
    composition over the independent unit-scale draws), and the
    clamp-failure bound is the concentration worst case — all CAP in
    one cell widens that cell's tail to DP_USER_DELTA, which dominates
    the spread cases (CAP·DP_DELTA < DP_USER_DELTA at these
    constants). Quantile error is ± one bucket width ({bw} cents) plus
    noise — the histogram resolution/privacy dial.

    Plan: the bounding window's one user-keyed shuffle, a
    (type, bucket) count collapse, the constant {nb}-cell grid built by
    an explode over the distinct types (no crossJoin), the shared CASE
    chain per cell, one cumulative window over {nb}-row partitions.
    Constant release size at any corpus scale."""
    from pyspark.sql import Window

    from photon_spark.queries import _t

    cents = (F.round(F.least(F.greatest(F.col("value"), F.lit(0.0)),
                             F.lit(DP_VALUE_CAP_CENTS / 100.0)) * 100)
             .cast("long"))
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", cents.alias("v_cents"))
    w = Window.partitionBy("user_id").orderBy("event_id")
    bucket = F.least(
        F.floor(F.col("v_cents") / F.lit(float(DP_HIST_BUCKET_CENTS))),
        F.lit(DP_HIST_NB - 1)).cast("long")
    bounded = (ev.withColumn("rn", F.row_number().over(w))
                 .where(F.col("rn") <= DP_USER_CAP)
                 .select("event_type", bucket.alias("bucket")))
    counts = (bounded.groupBy("event_type", "bucket")
                     .agg(F.count(F.lit(1)).alias("c")))
    grid = (ev.select("event_type").distinct()
              .select("event_type",
                      F.explode(F.sequence(
                          F.lit(0), F.lit(DP_HIST_NB - 1))).alias("b"))
              .select("event_type", F.col("b").cast("long").alias("bucket")))
    key = F.concat(F.col("event_type"), F.lit(":"),
                   F.col("bucket").cast("string"))
    cells = (grid.join(counts, ["event_type", "bucket"], "left")
                 .select("event_type", "bucket",
                         F.coalesce("c", F.lit(0)).cast("long").alias("n"),
                         _noise_expr(key, DP_USER_QUANT_SEED)
                         .cast("long").alias("noise"))
                 .withColumn("n_noisy",
                             F.greatest(F.col("n") + F.col("noise"),
                                        F.lit(0)).cast("long")))
    wc = (Window.partitionBy("event_type").orderBy("bucket")
                .rowsBetween(Window.unboundedPreceding,
                             Window.currentRow))
    wt = Window.partitionBy("event_type")
    j = (cells.withColumn("cum", F.sum("n_noisy").over(wc))
              .withColumn("total_noisy", F.sum("n_noisy").over(wt)))

    def qv(q4):
        b = F.min(F.when(
            (F.col("total_noisy") > 0)
            & (F.col("cum") * 4 >= F.col("total_noisy") * q4),
            F.col("bucket")))
        return F.round((b + 1) * F.lit(DP_HIST_BUCKET_CENTS / 100.0), 2)

    return (j.groupBy("event_type")
             .agg(F.max("total_noisy").alias("total_noisy"),
                  qv(1).alias("q25_value"),
                  qv(2).alias("q50_value"),
                  qv(3).alias("q75_value"))
             .withColumn("release_epsilon", F.lit(float(DP_USER_CAP)))
             .withColumn("release_delta", F.lit(DP_USER_DELTA)))


q_dp_user_bounded_quantiles.__doc__ = (
    q_dp_user_bounded_quantiles.__doc__.format(
        nb=DP_HIST_NB, bw=DP_HIST_BUCKET_CENTS))


def _sql_dp_user_bounded_quantiles() -> str:
    cases = _sql_noise_cases()
    vb = DP_VALUE_CAP_CENTS / 100.0
    bw = DP_HIST_BUCKET_CENTS
    return f"""
WITH ev AS (
  SELECT user_id, event_type, event_id,
         CAST(round(least(greatest(value, 0.0), {vb}) * 100) AS BIGINT)
           AS v_cents
  FROM events
), b AS (
  SELECT event_type,
         least(CAST(floor(v_cents * 1.0 / {bw}) AS BIGINT),
               {DP_HIST_NB - 1}) AS bucket
  FROM (
    SELECT event_type, v_cents,
           row_number() OVER (PARTITION BY user_id ORDER BY event_id)
             AS rn
    FROM ev) WHERE rn <= {DP_USER_CAP}
), counts AS (
  SELECT event_type, bucket, count(*) AS c FROM b GROUP BY 1, 2
), grid AS (
  SELECT t.event_type, gs.bucket
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(range({DP_HIST_NB})) AS bucket) gs
), cells AS (
  SELECT g.event_type, g.bucket,
         coalesce(c.c, 0) AS n,
         substring(md5(g.event_type || ':' ||
                       CAST(g.bucket AS VARCHAR)
                       || ':{DP_USER_QUANT_SEED}'), 1, 12) AS h
  FROM grid g LEFT JOIN counts c USING (event_type, bucket)
), noisy AS (
  SELECT event_type, bucket,
         CAST(greatest(n + CASE {cases} ELSE {DP_K} END, 0) AS BIGINT)
           AS n_noisy
  FROM cells
), cdf AS (
  SELECT event_type, bucket, n_noisy,
         sum(n_noisy) OVER (PARTITION BY event_type ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING) AS cum,
         sum(n_noisy) OVER (PARTITION BY event_type) AS total_noisy
  FROM noisy
)
SELECT event_type,
       CAST(max(total_noisy) AS BIGINT) AS total_noisy,
       round((min(CASE WHEN total_noisy > 0 AND cum * 4 >= total_noisy
                       THEN bucket END) + 1) * {bw} / 100.0, 2)
         AS q25_value,
       round((min(CASE WHEN total_noisy > 0 AND cum * 4 >= total_noisy * 2
                       THEN bucket END) + 1) * {bw} / 100.0, 2)
         AS q50_value,
       round((min(CASE WHEN total_noisy > 0 AND cum * 4 >= total_noisy * 3
                       THEN bucket END) + 1) * {bw} / 100.0, 2)
         AS q75_value,
       CAST({float(DP_USER_CAP)!r} AS DOUBLE) AS release_epsilon,
       CAST({DP_USER_DELTA!r} AS DOUBLE) AS release_delta
FROM cdf GROUP BY event_type
"""


QUERIES["dp_user_bounded_quantiles"] = q_dp_user_bounded_quantiles
ORACLES["dp_user_bounded_quantiles"] = _sql_dp_user_bounded_quantiles()
