"""Corpus-shaping queries: context-window chunking, training-sequence
packing, and semantic (k-means) clustering — the post-filter/post-dedup
stage of an LLM data pipeline, each with an exact DuckDB oracle.

Parity rules (queries.py float policy): chunking is pure integer/string
work; packing divides exactly-summed longs once per row; k-means makes the
*only* cross-partition float reduction (the centroid mean) order-free by
integer-quantizing coordinates before summing, and every distance is the
same sequential left-fold association on both engines
(F.aggregate ≡ list_dot_product — pinned in tests/test_parity_rules.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from photon_spark.functions import text
from photon_spark.functions.chunking import chunk_docs, pack_sequences
from photon_spark.functions.clustering import kmeans_cluster_profile

#: context-window chunking: 200-char windows, 40-char overlap (stride 160)
CHUNK_SIZE, CHUNK_OVERLAP = 200, 40
_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP

#: training-sequence token budget
PACK_BUDGET = 512

#: semantic clustering: 8 cells, 2 Lloyd iterations
KM_K, KM_ITERS = 8, 2


def _docs(spark, sf_dir):
    from photon_spark.relations import read_base
    return read_base(spark, sf_dir, "documents")


def _emb(spark, sf_dir):
    from photon_spark.relations import read_base
    return read_base(spark, sf_dir, "embeddings")


# ------------------------------------------------------------- chunking

def q_doc_chunking(spark, sf_dir):
    """Every document split into overlapping context windows; the md5 of
    each chunk pins exact content. Map-side explode — no shuffle at any
    scale (functions/chunking.py)."""
    return chunk_docs(_docs(spark, sf_dir), CHUNK_SIZE, CHUNK_OVERLAP)


SQL_DOC_CHUNKING = f"""
WITH d AS (
  SELECT doc_id, text, length(text) AS L FROM documents
), n AS (
  SELECT doc_id, text,
         CASE WHEN L <= {CHUNK_SIZE} THEN 1
              ELSE CAST(ceil((L - {CHUNK_SIZE}) / {_STRIDE}.0) AS BIGINT) + 1
         END AS nc
  FROM d
), e AS (
  SELECT doc_id, text, unnest(range(0, nc)) AS chunk_idx FROM n
)
SELECT doc_id, chunk_idx, chunk_idx * {_STRIDE} AS chunk_start,
       length(substr(text, chunk_idx * {_STRIDE} + 1, {CHUNK_SIZE}))
         AS chunk_len,
       md5(substr(text, chunk_idx * {_STRIDE} + 1, {CHUNK_SIZE}))
         AS chunk_md5
FROM e
"""


# -------------------------------------------------------------- packing

def q_sequence_packing(spark, sf_dir):
    """Concat-and-chunk packing audit over whitespace token counts: which
    training sequence(s) each document lands in under a {PACK_BUDGET}-token
    budget, documents laid end-to-end in doc_id order.

    The running total uses the bucketed two-pass prefix sum
    (functions/chunking.py) — no global single-partition window; the
    oracle's plain windowed cumsum checks the bucketing is invisible."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.size(text.tokens("text")).cast("long").alias("n_tokens"))
    return pack_sequences(d, PACK_BUDGET, "n_tokens")


def _sql_sequence_packing() -> str:
    from photon_spark.queries_northstar import _SQL_TOKS
    return f"""
WITH toks AS (
  SELECT doc_id, len({_SQL_TOKS})::BIGINT AS n_tokens FROM documents
), nz AS (
  SELECT * FROM toks WHERE n_tokens > 0
), c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
           AS cum
  FROM nz
)
SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum_tokens,
       CAST(floor((cum - n_tokens) / {PACK_BUDGET}) AS BIGINT) AS first_seq,
       CAST(floor((cum - 1) / {PACK_BUDGET}) AS BIGINT) AS last_seq,
       CAST(floor((cum - n_tokens) / {PACK_BUDGET}) AS BIGINT)
         != CAST(floor((cum - 1) / {PACK_BUDGET}) AS BIGINT)
         AS spans_boundary
FROM c
"""


# ------------------------------------------------------------- clustering

def q_kmeans_embeddings(spark, sf_dir):
    """Per-cluster size + inertia after {KM_ITERS} deterministic Lloyd
    iterations (functions/clustering.py — quantized order-free centroid
    means, sequential-fold distances)."""
    return kmeans_cluster_profile(_emb(spark, sf_dir), k=KM_K,
                                  iters=KM_ITERS)


def _km_assign_sql(cent_cte: str) -> str:
    """Assignment CTE body: argmin |c|² - 2·v·c, ties → lowest cluster."""
    return f"""
  SELECT vec_id, cl FROM (
    SELECT b.vec_id, c.cl,
           row_number() OVER (
             PARTITION BY b.vec_id
             ORDER BY list_dot_product(c.cv, c.cv)
                      - 2 * list_dot_product(b.v, c.cv) ASC, c.cl ASC
           ) AS rn
    FROM base b CROSS JOIN {cent_cte} c) WHERE rn = 1"""


def _km_update_sql(assign_cte: str, prev_cte: str) -> str:
    """Quantized-mean centroid update; empty clusters keep the previous."""
    return f"""
  SELECT p.cl, COALESCE(m.cv2, p.cv) AS cv
  FROM {prev_cte} p LEFT JOIN (
    SELECT cl, list(s * 1.0 / c / {1_000_000}.0 ORDER BY pos) AS cv2
    FROM (
      SELECT cl, pos, SUM(CAST(round(x * {1_000_000}) AS BIGINT)) AS s,
             COUNT(*) AS c
      FROM (SELECT a.cl AS cl, unnest(b.v) AS x,
                   unnest(range(1, len(b.v) + 1)) AS pos
            FROM {assign_cte} a JOIN base b ON a.vec_id = b.vec_id)
      GROUP BY cl, pos)
    GROUP BY cl) m ON p.cl = m.cl"""


def _km_ctes() -> str:
    """Shared CTE chain ending in ``a2`` (the final deterministic k-means
    assignment) — consumed by the kmeans profile AND semdedup oracles."""
    return f"""base AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), init AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, v AS cv
  FROM (SELECT * FROM base ORDER BY vec_id LIMIT {KM_K})
), a0 AS ({_km_assign_sql('init')}
), c1 AS ({_km_update_sql('a0', 'init')}
), a1 AS ({_km_assign_sql('c1')}
), c2 AS ({_km_update_sql('a1', 'c1')}
), a2 AS ({_km_assign_sql('c2')}
)"""


def _sql_kmeans_embeddings() -> str:
    q = 1_000_000
    return f"""
WITH {_km_ctes()}, fin AS (
  SELECT a.cl AS cluster_id,
         CAST(round(((list_dot_product(b.v, b.v)
                      - 2 * list_dot_product(b.v, c.cv))
                     + list_dot_product(c.cv, c.cv)) * {q}) AS BIGINT) AS ri
  FROM a2 a JOIN base b ON a.vec_id = b.vec_id JOIN c2 c ON a.cl = c.cl
)
SELECT cluster_id, COUNT(*) AS n_members,
       round(SUM(ri) / {q}.0, 6) AS inertia,
       round(SUM(ri) * 1.0 / COUNT(*) / {q}.0, 6) AS avg_dist2
FROM fin GROUP BY cluster_id ORDER BY cluster_id
"""


# -------------------------------------------------------------- semdedup

#: within-cluster cosine floor for semantic near-dup pairs
SEM_THETA = 0.30


def q_semdedup_pairs(spark, sf_dir):
    """SemDeDup-style semantic near-duplicate mining: k-means first, then
    exact cosine only WITHIN each cluster — the pruning that makes
    embedding dedup tractable at 100 TB (pairs across clusters are never
    scored; with balanced cells the pair space shrinks k×, and each cell's
    pairs are data-local once the table is written bucketed by
    cluster_id).

    Determinism: the cluster assignment is the gate-proven quantized
    k-means (functions/clustering.py); pair scoring runs the
    grouped-GEMM screen + sequential-verify kernel
    (clustering.within_cluster_pairs) whose exact fold matches the
    brute-force miner and the oracle bit-for-bit at 6dp — the r1
    interpreted zip_with self-join cost 3.7 s at sf0.1 where the GEMM
    kernel pays one keyed vector shuffle."""
    from photon_spark.functions.clustering import (kmeans_fit,
                                                   within_cluster_pairs)

    assigned, _ = kmeans_fit(_emb(spark, sf_dir), k=KM_K, iters=KM_ITERS)
    return within_cluster_pairs(assigned, SEM_THETA)


def _sql_semdedup_pairs() -> str:
    return f"""
WITH {_km_ctes()}
SELECT x.cl AS cluster_id, x.vec_id AS lo_id, y.vec_id AS hi_id,
       round(list_cosine_similarity(bx.v, by.v), 6) AS cosine
FROM a2 x JOIN a2 y ON x.cl = y.cl AND x.vec_id < y.vec_id
JOIN base bx ON x.vec_id = bx.vec_id
JOIN base by ON y.vec_id = by.vec_id
WHERE round(list_cosine_similarity(bx.v, by.v), 6) >= {SEM_THETA}
"""


# ------------------------------------------------- cluster-balanced sample

#: per-cluster sample quota
CB_QUOTA = 24


def q_cluster_balanced_sample(spark, sf_dir):
    """Cluster-balanced selection: exactly {CB_QUOTA} vectors per k-means
    cell (all, if the cell is smaller), picked by md5 rank — the
    "diversify across semantic clusters" sampling step that pairs with
    SemDeDup (prune dups within cells, then draw evenly across cells).

    Per-cluster quota = rank-by-hash ≤ N: deterministic, re-runnable,
    and the rank predicate gets Catalyst's WindowGroupLimit pushdown (≤ N
    rows per cell per map partition shuffle — the same scale shape as
    token_topk). The output pins exact membership via the sampled-id sum,
    not just counts."""
    from photon_spark.functions.clustering import kmeans_fit
    from pyspark.sql import Window

    assigned, _ = kmeans_fit(_emb(spark, sf_dir), k=KM_K, iters=KM_ITERS)
    h = F.md5(F.concat(F.lit("cb:"), F.col("vec_id").cast("string")))
    w = Window.partitionBy("cluster_id").orderBy(h.alias("h"), "vec_id")
    ranked = assigned.select("cluster_id", "vec_id",
                             F.row_number().over(w).alias("rn"))
    picked = F.col("rn") <= CB_QUOTA
    return (ranked.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.sum(F.when(picked, 1).otherwise(0)).cast("long")
                  .alias("n_sampled"),
                 F.sum(F.when(picked, F.col("vec_id")).otherwise(0))
                  .cast("long").alias("sampled_id_sum")))


def _sql_cluster_balanced_sample() -> str:
    return f"""
WITH {_km_ctes()}, ranked AS (
  SELECT cl AS cluster_id, vec_id,
         row_number() OVER (
           PARTITION BY cl
           ORDER BY md5('cb:' || vec_id::VARCHAR), vec_id) AS rn
  FROM a2
)
SELECT cluster_id, count(*) AS n_members,
       CAST(sum(CASE WHEN rn <= {CB_QUOTA} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sampled,
       CAST(sum(CASE WHEN rn <= {CB_QUOTA} THEN vec_id ELSE 0 END)
            AS BIGINT) AS sampled_id_sum
FROM ranked GROUP BY cluster_id
"""


# ------------------------------------------------------ shard export plan

#: sequences per training shard for the export manifest
SEQS_PER_SHARD = 8


def q_export_shard_plan(spark, sf_dir):
    """The SINK plan: contiguous training shards over the packed token
    stream — which shard owns each doc (shard of its first sequence),
    per-shard doc/sequence/token totals and boundary-doc counts (the
    manifest a training loader consumes). Pure arithmetic over the
    packing relation; no shuffle beyond pack_sequences' bucket exchange
    (functions/export.py; the file writer is pytest-covered)."""
    from photon_spark.functions.export import shard_plan
    d = _docs(spark, sf_dir).select(
        "doc_id", F.size(text.tokens("text")).cast("long").alias("n_tokens"))
    return shard_plan(pack_sequences(d, PACK_BUDGET, "n_tokens"),
                      SEQS_PER_SHARD)


def _sql_export_shard_plan() -> str:
    from photon_spark.queries_northstar import _SQL_TOKS
    return f"""
WITH toks AS (
  SELECT doc_id, len({_SQL_TOKS})::BIGINT AS n_tokens FROM documents
), nz AS (
  SELECT * FROM toks WHERE n_tokens > 0
), c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
           AS cum
  FROM nz
), packed AS (
  SELECT doc_id, n_tokens,
         CAST(floor((cum - n_tokens) / {PACK_BUDGET}) AS BIGINT) AS first_seq,
         CAST(floor((cum - 1) / {PACK_BUDGET}) AS BIGINT) AS last_seq
  FROM c
)
SELECT first_seq // {SEQS_PER_SHARD} AS shard_id,
       count(*) AS n_docs,
       CAST(max(last_seq) - min(first_seq) + 1 AS BIGINT) AS n_seqs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN first_seq != last_seq THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boundary_docs
FROM packed GROUP BY 1
"""


# ------------------------------------------------- cluster label purity

def q_cluster_label_purity(spark, sf_dir):
    """CLUSTER QUALITY eval against ground-truth labels — the external
    validation the k-means profile (kmeans_embeddings) cannot give: per
    cluster, the member count, how many distinct labels it mixes, the
    majority label, and the majority share (1.0 = a pure cluster). The
    corpus-curation read: impure clusters are where SemDeDup pruning
    and cluster-balanced sampling quietly mix topics.

    Plan: the gate-proven quantized k-means assignment (one broadcast
    of k centroids, map-side argmin) joins the label column id-to-id,
    then TWO stacked keyed aggregates — (cluster, label) counts first
    (map-side combine bounds the second stage by k·|labels|), then the
    per-cluster rollup; the majority label lifts out by one more
    row_number over the k·|labels| relation, tie-broken (count desc,
    label asc). Integers until the single share division.
    """
    from pyspark.sql import Window
    from photon_spark.functions.clustering import kmeans_fit

    emb = _emb(spark, sf_dir)
    assigned, _ = kmeans_fit(emb, k=KM_K, iters=KM_ITERS)
    lab = assigned.select("cluster_id", "vec_id").join(
        emb.select("vec_id", "label"), "vec_id")
    cl = (lab.groupBy("cluster_id", "label")
             .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n"), F.asc("label"))
    top = (cl.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1)
             .select("cluster_id", F.col("label").cast("long")
                      .alias("majority_label"), F.col("n").alias("n_top")))
    per = (cl.groupBy("cluster_id")
             .agg(F.sum("n").alias("n_members"),
                  F.count(F.lit(1)).alias("n_labels")))
    return (per.join(top, "cluster_id")
               .select("cluster_id", "n_members", "n_labels",
                       "majority_label",
                       F.round(F.col("n_top") / F.col("n_members"), 6)
                        .alias("majority_share")))


def _sql_cluster_label_purity() -> str:
    return f"""
WITH {_km_ctes()}, lab AS (
  SELECT a2.cl AS cluster_id, e.label
  FROM a2 JOIN embeddings e USING (vec_id)
), cl AS (
  SELECT cluster_id, label, count(*) AS n FROM lab GROUP BY 1, 2
), top AS (
  SELECT cluster_id, CAST(label AS BIGINT) AS majority_label, n AS n_top
  FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
                                     ORDER BY n DESC, label ASC) AS rn
        FROM cl)
  WHERE rn = 1
), per AS (
  SELECT cluster_id, CAST(sum(n) AS BIGINT) AS n_members,
         count(*) AS n_labels
  FROM cl GROUP BY 1
)
SELECT p.cluster_id, p.n_members, p.n_labels, t.majority_label,
       round(t.n_top * 1.0 / p.n_members, 6) AS majority_share
FROM per p JOIN top t USING (cluster_id)
"""



QUERIES = {
    "doc_chunking": q_doc_chunking,
    "sequence_packing": q_sequence_packing,
    "kmeans_embeddings": q_kmeans_embeddings,
    "semdedup_pairs": q_semdedup_pairs,
    "cluster_balanced_sample": q_cluster_balanced_sample,
    "cluster_label_purity": q_cluster_label_purity,
    "export_shard_plan": q_export_shard_plan,
}

ORACLES = {
    "doc_chunking": SQL_DOC_CHUNKING,
    "sequence_packing": _sql_sequence_packing(),
    "kmeans_embeddings": _sql_kmeans_embeddings(),
    "semdedup_pairs": _sql_semdedup_pairs(),
    "cluster_balanced_sample": _sql_cluster_balanced_sample(),
    "cluster_label_purity": _sql_cluster_label_purity(),
    "export_shard_plan": _sql_export_shard_plan(),
}
