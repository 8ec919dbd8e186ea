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


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


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


QUERIES = {
    "hll_distinct_audit": q_hll_distinct_audit,
    "kmv_distinct_audit": q_kmv_distinct_audit,
    "countmin_token_freq": q_countmin_token_freq,
    "quality_histogram_quantiles": q_quality_histogram_quantiles,
}

ORACLES = {
    "hll_distinct_audit": SQL_HLL_DISTINCT_AUDIT,
    "kmv_distinct_audit": SQL_KMV_DISTINCT_AUDIT,
    "countmin_token_freq": _sql_cm(),
    "quality_histogram_quantiles": _sql_hist(),
}
