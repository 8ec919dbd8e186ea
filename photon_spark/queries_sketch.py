"""Sketch-operator queries: deterministic HLL / KMV / Count-Min audits
over the documents vocabulary, each hash-gated against a DuckDB oracle
that rebuilds the identical md5-derived registers (see
photon_spark/functions/sketches.py for the exact-integer design that
makes approximate sketches bit-reproducible across engines).

Each audit pairs the sketch estimate with the exact answer computed in
the same query, so the gate checks BOTH the sketch registers and the
ground truth the estimate is judged against.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from photon_spark.functions import sketches
from photon_spark.functions.text import tokens
from photon_spark.relations import read_base as _read_base


def _docs(spark, sf_dir):
    return _read_base(spark, sf_dir, "documents")


def _source_tokens(spark, sf_dir):
    """(source, tok) — lowercased non-empty whitespace tokens."""
    return (_docs(spark, sf_dir)
            .select("source", F.explode(tokens(F.col("text"))).alias("t"))
            .where(F.col("t") != "")
            .select("source", F.lower("t").alias("tok")))


#: DuckDB twin of :func:`_source_tokens`
_SQL_SOURCE_TOKENS = """
  SELECT source, lower(t) AS tok
  FROM documents,
       unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\\s+') END) u(t)
  WHERE t <> ''
"""


# ------------------------------------------------------------ HLL audit

def q_hll_distinct_audit(spark, sf_dir):
    """Per-source vocabulary size: exact distinct vs the 1024-register
    deterministic HLL. One token scan feeds both; the sketch side
    shuffles only (source, register) pairs."""
    toks = _source_tokens(spark, sf_dir).persist()
    est = sketches.hll_estimate(toks, "source", F.col("tok"))
    exact = (toks.groupBy("source")
                 .agg(F.count_distinct("tok").alias("exact_distinct")))
    out = est.join(exact, "source").select(
        "source", "register_sum", "n_zero_regs", "est_distinct",
        "exact_distinct")
    out._photon_cached = [toks]  # type: ignore[attr-defined]
    return out


SQL_HLL_DISTINCT_AUDIT = f"""
WITH est AS ({sketches.sql_hll_estimate(_SQL_SOURCE_TOKENS, "source", "tok")}),
exact AS (
  SELECT source, count(DISTINCT tok) AS exact_distinct
  FROM ({_SQL_SOURCE_TOKENS}) GROUP BY 1
)
SELECT est.source, register_sum, n_zero_regs, est_distinct, exact_distinct
FROM est JOIN exact ON est.source = exact.source
"""


# ------------------------------------------------------------ KMV audit

def q_kmv_distinct_audit(spark, sf_dir):
    """Per-source vocabulary size via the 256-minimum-values sketch."""
    toks = _source_tokens(spark, sf_dir).persist()
    est = sketches.kmv_estimate(toks, "source", F.col("tok"))
    exact = (toks.groupBy("source")
                 .agg(F.count_distinct("tok").alias("exact_distinct")))
    out = est.join(exact, "source").select(
        "source", "n_kept", "kth_hash", "est_distinct", "exact_distinct")
    out._photon_cached = [toks]  # type: ignore[attr-defined]
    return out


SQL_KMV_DISTINCT_AUDIT = f"""
WITH est AS ({sketches.sql_kmv_estimate(_SQL_SOURCE_TOKENS, "source", "tok")}),
exact AS (
  SELECT source, count(DISTINCT tok) AS exact_distinct
  FROM ({_SQL_SOURCE_TOKENS}) GROUP BY 1
)
SELECT est.source, n_kept, kth_hash, est_distinct, exact_distinct
FROM est JOIN exact ON est.source = exact.source
"""


# ------------------------------------------------------- Count-Min audit

CM_TOPN = 20


def q_countmin_token_freq(spark, sf_dir):
    """Top-20 corpus tokens (exact count, tie-broken by token) with the
    Count-Min estimate for each — est >= exact by construction; the gap
    is the sketch's collision over-count. The 4×1024-cell sketch is
    built once from the per-token counts and broadcast to the probes."""
    toks = (_source_tokens(spark, sf_dir)
            .select(F.col("tok").alias("item"))
            .persist())
    top = (toks.groupBy("item")
               .agg(F.count(F.lit(1)).alias("exact_count"))
               .orderBy(F.desc("exact_count"), F.asc("item"))
               .limit(CM_TOPN))
    est = sketches.countmin_point_estimates(toks, top, "item", "item")
    out = (top.join(est, "item")
              .select("item", "exact_count", "est_count"))
    out._photon_cached = [toks]  # type: ignore[attr-defined]
    return out


def _sql_cm() -> str:
    cells = ", ".join(
        f"struct_pack(r := {r}, cell := {sketches.sql_cm_cell('it', r)})"
        for r in range(sketches.CM_D))
    ests = ", ".join(
        f"""(SELECT coalesce(any_value(total), 0) FROM cm
             WHERE cm.r = {r}
               AND cm.cell = {sketches.sql_cm_cell('top.item', r)})"""
        for r in range(sketches.CM_D))
    return f"""
WITH toks AS (
  SELECT tok AS it FROM ({_SQL_SOURCE_TOKENS})
),
per_item AS (
  SELECT it, count(*) AS c FROM toks GROUP BY 1
),
cm AS (
  SELECT rc.r AS r, rc.cell AS cell, sum(c) AS total
  FROM per_item, unnest([{cells}]) u(rc)
  GROUP BY 1, 2
),
top AS (
  SELECT it AS item, c AS exact_count FROM per_item
  ORDER BY c DESC, it LIMIT {CM_TOPN}
)
SELECT item, exact_count,
       least({ests})::BIGINT AS est_count
FROM top
"""


# ------------------------------------------------- histogram quantiles

def q_quality_histogram_quantiles(spark, sf_dir):
    """Per-source quality quantiles (p50/p90/p99) from the 1024-bin
    histogram sketch — the mergeable, never-rescan quantile path whose
    small-scale truth is the exact-rank q_quality_quantiles_by_lang.
    One Arrow profile pass collapses map-side to ≤1024 (source, bin)
    rows; no per-group sort of document scores anywhere."""
    from photon_spark.functions import text
    d = _docs(spark, sf_dir)
    prof = (text.text_profile(d).select("doc_id", "quality")
            .join(d.select("doc_id", "source"), "doc_id"))
    return sketches.histogram_quantiles(prof, "source", F.col("quality"))


def _sql_hist() -> str:
    from photon_spark.queries_northstar import SQL_TEXT_PROFILE
    table = f"""
  SELECT s.source, p.quality
  FROM ({SQL_TEXT_PROFILE}) p
  JOIN documents s ON p.doc_id = s.doc_id
"""
    return sketches.sql_histogram_quantiles(table, "source", "quality")


# ------------------------------------- CM join-cardinality estimation

def q_join_size_estimate(spark, sf_dir):
    """Join-size estimation from Count-Min sketches (the AMS/CM inner
    product): est = min over rows r of Σ_cell cmA[r]·cmB[r] — the
    statistic a 100 TB planner uses to choose join strategy WITHOUT
    touching either table again. Gated next to the exact join size
    Σ_k c_A(k)·c_B(k), so the overestimate factor is part of the fact.

    Both sketches are d×w = 4096-row relations built from per-key
    aggregates (map-side combinable); the estimate is a 4096-key join of
    two sketches. The exact branch joins only per-key COUNT relations —
    keys and counts, never the fact rows.
    """
    e = (_read_base(spark, sf_dir, "events")
              .select(F.col("user_id").cast("string").alias("it")))
    o = (_read_base(spark, sf_dir, "orders")
              .select(F.col("o_custkey").cast("string").alias("it")))
    cma = sketches.countmin_table(e, "it")
    cmb = sketches.countmin_table(o, "it")
    prods = (cma.join(cmb.select("r", "cell",
                                 F.col("total").alias("tb")),
                      ["r", "cell"])
                .groupBy("r")
                .agg(F.sum(F.col("total") * F.col("tb")).alias("ip")))
    est = prods.agg(F.min("ip").alias("est_join_size"))
    ca = e.groupBy("it").agg(F.count(F.lit(1)).alias("ca"))
    cb = o.groupBy("it").agg(F.count(F.lit(1)).alias("cb"))
    exact = (ca.join(cb, "it")
               .agg(F.coalesce(F.sum(F.col("ca") * F.col("cb")),
                               F.lit(0)).alias("exact_join_size")))
    return (est.crossJoin(exact)
               .select("exact_join_size", "est_join_size",
                       F.round(F.col("est_join_size").cast("double")
                               / F.col("exact_join_size").cast("double"), 6)
                        .alias("overestimate_ratio")))


def _sql_join_size() -> str:
    def cm(src: str, key: str, name: str) -> str:
        rows = " UNION ALL ".join(
            f"SELECT {r} AS r, {sketches.sql_cm_cell('it', r)} AS cell, c "
            f"FROM {name}_k"
            for r in range(sketches.CM_D))
        return (f"{name}_k AS (SELECT {key}::VARCHAR AS it, count(*) AS c "
                f"FROM {src} GROUP BY 1), "
                f"{name} AS (SELECT r, cell, sum(c) AS total "
                f"FROM ({rows}) GROUP BY 1, 2)")

    return f"""
WITH {cm('events', 'user_id', 'cma')},
{cm('orders', 'o_custkey', 'cmb')},
prods AS (
  SELECT a.r, sum(a.total * b.total) AS ip
  FROM cma a JOIN cmb b ON a.r = b.r AND a.cell = b.cell
  GROUP BY 1
),
est AS (SELECT min(ip) AS est_join_size FROM prods),
exact AS (
  SELECT coalesce(sum(a.c * b.c), 0) AS exact_join_size
  FROM cma_k a JOIN cmb_k b ON a.it = b.it
)
SELECT CAST(exact_join_size AS BIGINT) AS exact_join_size,
       CAST(est_join_size AS BIGINT) AS est_join_size,
       round(est_join_size::DOUBLE / exact_join_size::DOUBLE, 6)
         AS overestimate_ratio
FROM est, exact
"""


# -------------------------------------------- KMV set-algebra overlap

#: shared-shingle-space audit between every source pair
KMV_OV_K = sketches.KMV_K


def q_kmv_source_overlap(spark, sf_dir):
    """Content-space overlap between every pair of sources: KMV union /
    intersection ESTIMATES (inclusion–exclusion over merged sketches)
    next to the exact answers they approximate — the sketch set-algebra
    that lets a 100 TB governance job answer "how much n-gram space do
    crawls A and B share?" from k-hash summaries instead of a full
    distinct-join.

    Shape: the full (source, shingle-hash) relation exists once (and at
    scale only to produce the exact audit columns; the sketch path needs
    just the ≤ k kept hashes per source, a 20×256-row relation that
    BROADCASTS). Merged pair sketches come from two equi-joins of the
    kept relation against the source-pair matrix — never a shuffle of
    the shingle space. Estimates are (k-1)·2^60/kth — one IEEE division
    of exact integers, rounded 2dp; the inclusion–exclusion sum is three
    such doubles combined in fixed order, so the gate holds exactly.
    """
    from pyspark.sql import Window
    from photon_spark.functions.dedup import _own_cache, shingles_udf
    k = KMV_OV_K

    # One gram-keyed aggregate replaces the old shape's FOUR wide
    # exchanges over the shingle space ((source, h60) distinct, a
    # second per-source aggregate for the exact counts, and an h60
    # SELF-JOIN — two more exchanges — for the exact intersections;
    # guide §2.4). collect_set dedups map-side, the per-gram source
    # SETS are ≤ |sources| long, and every downstream relation derives
    # from this one persisted pass:
    #   - exact intersections: in-set source pairs, counted per pair —
    #     the pair explode is bounded by C(|sources|, 2) per gram, so
    #     the second aggregate's input is pairs, never the gram space;
    #   - the distinct (source, h60) relation: a map-side explode.
    d = _docs(spark, sf_dir)
    hg = (d.select("source", F.explode(shingles_udf("text")).alias("g"))
           .select("source", sketches._h60(F.col("g")).alias("h60"))
           .groupBy("h60")
           .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
           .persist())

    pair_structs = F.flatten(F.transform(
        "srcs", lambda a, i: F.transform(
            F.slice("srcs", i + F.lit(2), F.size("srcs")),
            lambda b: F.struct(a.alias("source_a"), b.alias("source_b")))))
    inter = (hg.where(F.size("srcs") >= 2)
               .select(F.explode(pair_structs).alias("p"))
               .groupBy("p.source_a", "p.source_b")
               .agg(F.count(F.lit(1)).alias("exact_intersection")))

    hs = hg.select(F.explode("srcs").alias("source"), "h60")

    # ONE windowed pass per source yields the kept (≤ k smallest) rows
    # AND, on the row at rank min(n, k), the full per-source summary:
    # nk = min(n, k), kth = h60 at that rank, n_exact = the partition
    # count — the old separate per/exact aggregates for free.
    w = Window.partitionBy("source").orderBy("h60")
    wc = Window.partitionBy("source")
    ranked = (hs.withColumn("rn", F.row_number().over(w))
                .withColumn("n_exact", F.count(F.lit(1)).over(wc))
                .where(F.col("rn") <= k)).persist()
    kept = ranked.select("source", "h60")

    def est(n_kept, kth):
        return F.round(
            F.when(n_kept < k, n_kept.cast("double"))
             .otherwise(F.lit(float(k - 1) * sketches.KMV_DOMAIN)
                        / kth.cast("double")), 2)

    summary = (ranked.where(F.col("rn") == F.least(F.col("n_exact"),
                                                   F.lit(k)))
                     .select("source",
                             est(F.col("rn"), F.col("h60")).alias("est"),
                             "n_exact"))

    srcs = summary.select("source")
    pairs = (srcs.select(F.col("source").alias("source_a"))
                 .join(srcs.select(F.col("source").alias("source_b")),
                       F.col("source_a") < F.col("source_b")))
    m = (pairs.join(kept, F.col("source") == F.col("source_a"))
              .select("source_a", "source_b", "h60")
              .unionAll(
         pairs.join(kept, F.col("source") == F.col("source_b"))
              .select("source_a", "source_b", "h60"))
              .distinct())
    wm = Window.partitionBy("source_a", "source_b").orderBy("h60")
    mu = (m.withColumn("rn", F.row_number().over(wm))
           .where(F.col("rn") <= k)
           .groupBy("source_a", "source_b")
           .agg(F.count(F.lit(1)).alias("nk"), F.max("h60").alias("kth")))
    mu = mu.select("source_a", "source_b",
                   est(F.col("nk"), F.col("kth")).alias("est_union"))

    out = (mu
           .join(summary.select(F.col("source").alias("source_a"),
                                F.col("est").alias("est_a"),
                                F.col("n_exact").alias("n_a")), "source_a")
           .join(summary.select(F.col("source").alias("source_b"),
                                F.col("est").alias("est_b"),
                                F.col("n_exact").alias("n_b")), "source_b")
           .join(inter, ["source_a", "source_b"], "left")
           .na.fill({"exact_intersection": 0})
           .select("source_a", "source_b", "est_union",
                   F.round(F.col("est_a") + F.col("est_b")
                           - F.col("est_union"), 2)
                    .alias("est_intersection"),
                   (F.col("n_a") + F.col("n_b")
                    - F.col("exact_intersection")).alias("exact_union"),
                   "exact_intersection"))
    return _own_cache(out, [hg, ranked])


def _sql_kmv_overlap() -> str:
    from photon_spark.queries_northstar import _SQL_GRAMS, _SQL_NORM
    k = KMV_OV_K
    dom = float(k - 1) * sketches.KMV_DOMAIN
    est = (f"round(CASE WHEN nk < {k} THEN nk::DOUBLE "
           f"ELSE {dom!r} / kth::DOUBLE END, 2)")
    return f"""
WITH norm AS (
  SELECT source, string_split({_SQL_NORM}, ' ') AS t FROM documents
), grams AS (
  SELECT source, {_SQL_GRAMS} AS g FROM norm WHERE len(t) >= 3
), h AS (
  SELECT DISTINCT source, {sketches.sql_h60('gr')} AS h60
  FROM (SELECT source, unnest(g) AS gr FROM grams WHERE len(g) > 0)
), kept AS (
  SELECT source, h60 FROM (
    SELECT source, h60,
           row_number() OVER (PARTITION BY source ORDER BY h60) AS rn
    FROM h) WHERE rn <= {k}
), per AS (
  SELECT source, {est} AS est FROM (
    SELECT source, count(*) AS nk, max(h60) AS kth FROM kept GROUP BY 1)
), exact AS (
  SELECT source, count(*) AS n_exact FROM h GROUP BY 1
), pairs AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM (SELECT DISTINCT source FROM h) a,
       (SELECT DISTINCT source FROM h) b
  WHERE a.source < b.source
), m AS (
  SELECT DISTINCT source_a, source_b, h60 FROM (
    SELECT p.source_a, p.source_b, kk.h60
    FROM pairs p JOIN kept kk ON kk.source = p.source_a
    UNION ALL
    SELECT p.source_a, p.source_b, kk.h60
    FROM pairs p JOIN kept kk ON kk.source = p.source_b)
), mu AS (
  SELECT source_a, source_b, {est} AS est_union FROM (
    SELECT source_a, source_b, count(*) AS nk, max(h60) AS kth FROM (
      SELECT source_a, source_b, h60,
             row_number() OVER (PARTITION BY source_a, source_b
                                ORDER BY h60) AS rn
      FROM m) WHERE rn <= {k}
    GROUP BY 1, 2)
), inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         count(*) AS exact_intersection
  FROM h a JOIN h b ON a.h60 = b.h60 AND a.source < b.source
  GROUP BY 1, 2
)
SELECT mu.source_a, mu.source_b, mu.est_union,
       round(pa.est + pb.est - mu.est_union, 2) AS est_intersection,
       ea.n_exact + eb.n_exact - coalesce(i.exact_intersection, 0)
         AS exact_union,
       coalesce(i.exact_intersection, 0) AS exact_intersection
FROM mu
JOIN per pa ON pa.source = mu.source_a
JOIN per pb ON pb.source = mu.source_b
JOIN exact ea ON ea.source = mu.source_a
JOIN exact eb ON eb.source = mu.source_b
LEFT JOIN inter i ON i.source_a = mu.source_a AND i.source_b = mu.source_b
"""


QUERIES = {
    "hll_distinct_audit": q_hll_distinct_audit,
    "kmv_distinct_audit": q_kmv_distinct_audit,
    "countmin_token_freq": q_countmin_token_freq,
    "quality_histogram_quantiles": q_quality_histogram_quantiles,
    "kmv_source_overlap": q_kmv_source_overlap,
    "join_size_estimate": q_join_size_estimate,
}

ORACLES = {
    "hll_distinct_audit": SQL_HLL_DISTINCT_AUDIT,
    "kmv_distinct_audit": SQL_KMV_DISTINCT_AUDIT,
    "countmin_token_freq": _sql_cm(),
    "quality_histogram_quantiles": _sql_hist(),
    "kmv_source_overlap": _sql_kmv_overlap(),
    "join_size_estimate": _sql_join_size(),
}
