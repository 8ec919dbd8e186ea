"""Training-set assembly queries — the last mile before the trainer:
a reproducible seeded global shuffle (order + shard assignment), a
fixed-weight linear quality-classifier filter (the fasttext-style
model-based keep/drop stage), and per-cluster embedding pruning (drop
the farthest tail of every semantic cell).

Photon's reference stops at replay/projection (`/root/reference/src` has
no corpus-shaping stage); these operators implement the north-star
training-data brief on top of the same tables. Float policy follows
queries.py: classifier features are the 6dp-rounded text-profile columns
(identical doubles on both engines), the squash is the rational
``0.5 + 0.5·z/(1+|z|)`` — no ``exp``, whose last-ulp behavior is not
pinned across JVM/DuckDB — and every aggregate over scores sums exact
quantized longs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from photon_spark.functions import text
from photon_spark.functions.clustering import (Q, kmeans_fit, member_dist2)
from photon_spark.functions.ordering import seeded_shuffle
from photon_spark.queries_curation import KM_ITERS, KM_K
from photon_spark.queries_northstar import SQL_TEXT_PROFILE

#: seeded-shuffle parameters: seed, docs per training shard
SHUFFLE_SEED, DOCS_PER_SHARD = 42, 64

#: classifier weights (bias, alpha_ratio, stopword_ratio, len_feat,
#: quality) — fixed, as if trained offline — and the keep threshold
CLS_BIAS, CLS_W = -2.0, (1.2, 0.8, 1.0, 2.0)
CLS_KEEP = 0.78

#: prune the top 1/PRUNE_DIV farthest members of every cluster
PRUNE_DIV = 20


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# -------------------------------------------------------- seeded shuffle

def q_seeded_shuffle_plan(spark, sf_dir):
    """Every document's slot in the seeded global permutation plus its
    (shard, position) assignment — the reproducible training order. The
    scalable two-pass bucket design (never a single-partition window)
    lives in functions/ordering.py."""
    return seeded_shuffle(_docs(spark, sf_dir), "doc_id",
                          seed=SHUFFLE_SEED, docs_per_shard=DOCS_PER_SHARD)


SQL_SEEDED_SHUFFLE_PLAN = f"""
WITH k AS (
  SELECT doc_id,
         md5('{SHUFFLE_SEED}' || ':' || doc_id) AS okey
  FROM documents
), p AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY okey, doc_id) - 1 AS BIGINT)
           AS global_pos
  FROM k
)
SELECT doc_id, global_pos,
       global_pos // {DOCS_PER_SHARD} AS shard_id,
       global_pos % {DOCS_PER_SHARD} AS pos_in_shard
FROM p
"""


# ----------------------------------------------------- classifier filter

def _cls_score(prof):
    """Rounded [0,1] score: linear head over rounded profile features,
    rational squash. Must stay textually parallel to the SQL below —
    identical operand order means identical float association."""
    len_feat = F.least(F.col("n_tokens") / F.lit(64.0), F.lit(1.0))
    z = (F.lit(CLS_BIAS)
         + F.lit(CLS_W[0]) * F.col("alpha_ratio")
         + F.lit(CLS_W[1]) * F.col("stopword_ratio")
         + F.lit(CLS_W[2]) * len_feat
         + F.lit(CLS_W[3]) * F.col("quality"))
    return F.round(F.lit(0.5) + F.lit(0.5) * z / (F.lit(1.0) + F.abs(z)), 6)


def q_quality_classifier_filter(spark, sf_dir):
    """Model-based corpus filter: a fixed-weight linear classifier scored
    over the text profile, thresholded at {CLS_KEEP}; per (source, kept) —
    doc count, mean score, surviving token mass. One Arrow profile pass +
    an id-only join for source + a short-key aggregate; the decision
    relation (doc → keep) never shuffles document text."""
    d = _docs(spark, sf_dir)
    prof = text.text_profile(d).join(d.select("doc_id", "source"), "doc_id")
    sc = prof.withColumn("score", _cls_score(prof))
    s_int = F.round(F.col("score") * 1e6).cast("long")
    return (sc.withColumn("kept", (F.col("score") >= F.lit(CLS_KEEP))
                          .cast("boolean"))
              .groupBy("source", "kept")
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.round(F.sum(s_int) / F.count(F.lit(1)) / 1e6, 6)
                    .alias("avg_score"),
                   F.sum("n_tokens").alias("total_tokens")))


SQL_QUALITY_CLASSIFIER_FILTER = f"""
WITH prof AS ({SQL_TEXT_PROFILE}), sc AS (
  SELECT p.doc_id, d.source, p.n_tokens,
         round(0.5 + 0.5 * z / (1.0 + abs(z)), 6) AS score
  FROM (SELECT doc_id, n_tokens,
               {CLS_BIAS} + {CLS_W[0]} * alpha_ratio
                          + {CLS_W[1]} * stopword_ratio
                          + {CLS_W[2]} * least(n_tokens / 64.0, 1.0)
                          + {CLS_W[3]} * quality AS z
        FROM prof) p
  JOIN documents d USING (doc_id)
)
SELECT source, score >= {CLS_KEEP} AS kept,
       count(*) AS n_docs,
       round(SUM(CAST(round(score * 1000000) AS BIGINT)) * 1.0
             / count(*) / 1000000, 6) AS avg_score,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM sc GROUP BY 1, 2
"""


# ------------------------------------------------------ curriculum order

#: curriculum bands: band = BAND_BASE - floor(score·BAND_SCALE), ascending
#: band = descending quality (best band streams first)
BAND_BASE, BAND_SCALE = 20, 20


def q_curriculum_order_plan(spark, sf_dir):
    """Quality-curriculum training order: classifier-score bands stream
    best-first, with a fresh seeded shuffle WITHIN each band — the
    standard curriculum compromise (ordered difficulty, no intra-band
    ordering bias). Same two-pass bucket design; the band simply prefixes
    the composite group key (functions/ordering.py)."""
    d = _docs(spark, sf_dir)
    prof = text.text_profile(d)
    sc = prof.select("doc_id", _cls_score(prof).alias("score"))
    band = F.lit(BAND_BASE) - F.floor(F.col("score") * F.lit(BAND_SCALE))
    return seeded_shuffle(sc, "doc_id", seed=SHUFFLE_SEED,
                          docs_per_shard=DOCS_PER_SHARD, band_col=band)


def _sql_curriculum_order_plan() -> str:
    return f"""
WITH prof AS ({SQL_TEXT_PROFILE}), sc AS (
  SELECT doc_id,
         round(0.5 + 0.5 * z / (1.0 + abs(z)), 6) AS score
  FROM (SELECT doc_id,
               {CLS_BIAS} + {CLS_W[0]} * alpha_ratio
                          + {CLS_W[1]} * stopword_ratio
                          + {CLS_W[2]} * least(n_tokens / 64.0, 1.0)
                          + {CLS_W[3]} * quality AS z
        FROM prof)
), b AS (
  SELECT doc_id,
         CAST({BAND_BASE} - floor(score * {BAND_SCALE}) AS BIGINT) AS band,
         md5('{SHUFFLE_SEED}' || ':' || doc_id) AS okey
  FROM sc
), p AS (
  SELECT doc_id, band,
         CAST(row_number() OVER (ORDER BY band, okey, doc_id) - 1 AS BIGINT)
           AS global_pos
  FROM b
)
SELECT doc_id, band, global_pos,
       global_pos // {DOCS_PER_SHARD} AS shard_id,
       global_pos % {DOCS_PER_SHARD} AS pos_in_shard
FROM p
"""


# ------------------------------------------------------- embedding prune

def q_embedding_prune_plan(spark, sf_dir):
    """Per-cluster tail pruning over the deterministic k-means cells: the
    ceil(|cell|/{PRUNE_DIV}) members farthest from their centroid (ties →
    lowest vec_id), with their quantized distance and in-cell rank — the
    SemDeDup-companion curation step that drops each semantic cell's
    noisiest tail. Rank logic is pure integers; the distance is the
    engine-pinned sequential fold (clustering.member_dist2)."""
    assigned, cents = kmeans_fit(_emb(spark, sf_dir), k=KM_K, iters=KM_ITERS)
    d = member_dist2(assigned, cents)
    w = Window.partitionBy("cluster_id").orderBy(F.desc("ri"), "vec_id")
    wc = Window.partitionBy("cluster_id")
    r = (d.withColumn("rnk", F.row_number().over(w).cast("long"))
          .withColumn("n_members", F.count(F.lit(1)).over(wc)))
    keep_n = F.floor((F.col("n_members") + F.lit(PRUNE_DIV - 1))
                     / F.lit(PRUNE_DIV)).cast("long")
    return (r.filter(F.col("rnk") <= keep_n)
             .select("vec_id", "cluster_id",
                     F.round(F.col("ri") / F.lit(Q), 6).alias("dist2"),
                     "rnk", F.col("n_members").cast("long")
                     .alias("n_members")))


def _sql_embedding_prune_plan() -> str:
    from photon_spark.queries_curation import _km_ctes
    return f"""
WITH {_km_ctes()}, fin AS (
  SELECT a.vec_id, a.cl AS cluster_id,
         CAST(round(((list_dot_product(b.v, b.v)
                      - 2 * list_dot_product(b.v, c.cv))
                     + list_dot_product(c.cv, c.cv)) * {Q}) AS BIGINT) AS ri
  FROM a2 a JOIN base b ON a.vec_id = b.vec_id JOIN c2 c ON a.cl = c.cl
), rk AS (
  SELECT vec_id, cluster_id, ri,
         CAST(row_number() OVER (PARTITION BY cluster_id
                                 ORDER BY ri DESC, vec_id) AS BIGINT) AS rnk,
         count(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM fin
)
SELECT vec_id, cluster_id, round(ri / {Q}.0, 6) AS dist2, rnk,
       CAST(n_members AS BIGINT) AS n_members
FROM rk
WHERE rnk <= (n_members + {PRUNE_DIV - 1}) // {PRUNE_DIV}
"""


QUERIES = {
    "seeded_shuffle_plan": q_seeded_shuffle_plan,
    "quality_classifier_filter": q_quality_classifier_filter,
    "curriculum_order_plan": q_curriculum_order_plan,
    "embedding_prune_plan": q_embedding_prune_plan,
}

ORACLES = {
    "seeded_shuffle_plan": SQL_SEEDED_SHUFFLE_PLAN,
    "quality_classifier_filter": SQL_QUALITY_CLASSIFIER_FILTER,
    "curriculum_order_plan": _sql_curriculum_order_plan(),
    "embedding_prune_plan": _sql_embedding_prune_plan(),
}
