"""North-star queries (BASELINE.json): dedup, similarity search, text
analysis over the documents/embeddings tables — each with an exact DuckDB
oracle (md5-based signatures are engine-portable; regex/array semantics
mirrored with the 'g' flag on the DuckDB side).

Approximate-by-design operators (LSH top-k, IVF top-k) ship without an
oracle (driver records a rows-only check); their recall against the exact
brute force is pinned in tests/test_northstar.py instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from photon_spark.functions import (dedup, multimodal, quality, similarity,
                                    text)


def _docs(spark, sf_dir):
    from photon_spark.relations import read_base
    return read_base(spark, sf_dir, "documents")


def _emb(spark, sf_dir):
    from photon_spark.relations import read_base
    return read_base(spark, sf_dir, "embeddings")


# -------------------------------------------------------------- shared SQL

#: DuckDB fragments mirroring photon_spark.functions.text exactly.
_SQL_TOKS = ("CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) "
             "ELSE regexp_split_to_array(trim(text), '\\s+') END")
_SQL_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_SQL_GRAMS = ("list_distinct(list_transform(generate_series(1, len(t)-2), "
              "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))")

_STOPWORDS_SQL = "[" + ", ".join(f"'{w}'" for w in text.EN_STOPWORDS) + "]"


# ------------------------------------------------------------ text profile

def q_text_profile(spark, sf_dir):
    # no orderBy: the gate hash is order-insensitive and a global sort of
    # every profiled row is exactly the shuffle this operator avoids.
    return text.text_profile(_docs(spark, sf_dir))


def _lang_case() -> str:
    hits = {lang: ("len(list_filter(lt, x -> list_contains(["
                   + ", ".join(f"'{w}'" for w in text.LANG_MARKERS[lang])
                   + "], x)))")
            for lang in sorted(text.LANG_MARKERS)}
    g = "greatest(" + ", ".join(hits[l] for l in sorted(hits)) + ")"
    case = f"CASE WHEN {g} = 0 THEN 'und'"
    for lang in sorted(hits):
        case += f" WHEN {hits[lang]} = {g} THEN '{lang}'"
    return case + " END"


SQL_TEXT_PROFILE = f"""
WITH base AS (
  SELECT doc_id, text, {_SQL_TOKS} AS t,
         lower(text) IS NOT NULL AS _x
  FROM documents
), c AS (
  SELECT doc_id, text, t,
         list_transform(t, x -> lower(x)) AS lt,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS n_punct,
         len(t) AS n_tokens
  FROM base
)
SELECT doc_id,
       n_chars::BIGINT AS n_chars,
       n_tokens::BIGINT AS n_tokens,
       (ceil(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) / 4.0)
        + len(list_filter(regexp_split_to_array(text, '[A-Za-z0-9\\s]+'),
                          s -> s != '')))::BIGINT AS n_bpe_tokens,
       round(n_alpha * 1.0 / greatest(n_chars, 1), 6) AS alpha_ratio,
       round(CASE WHEN n_tokens = 0 THEN 0.0
             ELSE len(list_filter(lt, x -> list_contains({_STOPWORDS_SQL}, x)))
                  * 1.0 / n_tokens END, 6) AS stopword_ratio,
       round(0.5 * (n_alpha * 1.0 / greatest(n_chars, 1))
             + 0.3 * least((n_alpha * 1.0 / greatest(n_tokens, 1)) / 8.0, 1.0)
             + 0.2 * (1.0 - least((n_punct * 1.0 / greatest(n_chars, 1)) * 5,
                                  1.0)), 6) AS quality,
       {_lang_case()} AS lang_pred,
       md5({_SQL_NORM}) AS fingerprint
FROM c
"""


def q_lang_quality_by_source(spark, sf_dir):
    # Grouped text analytics: per declared lang, doc counts + mean quality +
    # token mass — one scan + one short-key shuffle.
    d = _docs(spark, sf_dir)
    prof = text.text_profile(d).join(d.select("doc_id", "lang"), "doc_id")
    # avg over EXACT integers (quality is 6dp-rounded, so quality*1e6 is
    # integral): float avg() is partial-aggregation-order dependent in the
    # last ulp and round(.,6) sits on the boundary — the r1 flaky hash.
    # Integer sum → one double division → identical on both engines.
    q_int = F.round(F.col("quality") * 1e6).cast("long")
    return (prof.groupBy("lang")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.round(F.sum(q_int) / F.count(F.lit(1)) / 1e6, 6)
                      .alias("avg_quality"),
                     F.sum("n_tokens").alias("total_tokens")))


SQL_LANG_QUALITY_BY_SOURCE = f"""
WITH prof AS ({SQL_TEXT_PROFILE})
SELECT d.lang, count(*) AS n_docs,
       round(sum(CAST(round(p.quality * 1000000) AS BIGINT)) * 1.0
             / count(*) / 1000000, 6) AS avg_quality,
       CAST(sum(p.n_tokens) AS BIGINT) AS total_tokens
FROM prof p JOIN documents d USING (doc_id)
GROUP BY d.lang
"""


# ------------------------------------------------------------------- dedup

def q_dedup_exact_stats(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(text.fingerprint("text")).alias("n_unique"),
        (F.count(F.lit(1)) - F.count_distinct(text.fingerprint("text")))
        .alias("n_exact_dups"))


SQL_DEDUP_EXACT_STATS = f"""
SELECT count(*) AS n_docs,
       count(DISTINCT md5({_SQL_NORM})) AS n_unique,
       count(*) - count(DISTINCT md5({_SQL_NORM})) AS n_exact_dups
FROM documents
"""


def q_ngram_jaccard_pairs(spark, sf_dir):
    return dedup.jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.8)


#: Mirrors dedup.jaccard_pairs exactly: Jaccard over the capped
#: ("informative") shingle space — shingles with document frequency >
#: MAX_SHINGLE_DF are dropped from both the inverted index and the per-doc
#: set sizes.
SQL_NGRAM_JACCARD_PAIRS = f"""
WITH norm AS (
  SELECT doc_id, string_split({_SQL_NORM}, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, {_SQL_GRAMS} AS g FROM norm WHERE len(t) >= 3
), ex AS (
  SELECT doc_id, unnest(g) AS gr FROM grams WHERE len(g) > 0
), exr AS (
  SELECT doc_id, gr FROM (
    SELECT doc_id, gr, count(*) OVER (PARTITION BY gr) AS df_g FROM ex)
  WHERE df_g <= {dedup.MAX_SHINGLE_DF}
), n_sh AS (
  SELECT doc_id, count(*) AS n_sh FROM exr GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS lo_id, b.doc_id AS hi_id, count(*) AS n_common
  FROM exr a JOIN exr b ON a.gr = b.gr AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.lo_id, c.hi_id, c.n_common,
       round(c.n_common * 1.0 / (na.n_sh + nb.n_sh - c.n_common), 6)
         AS jaccard
FROM common c
JOIN n_sh na ON na.doc_id = c.lo_id
JOIN n_sh nb ON nb.doc_id = c.hi_id
WHERE round(c.n_common * 1.0 / (na.n_sh + nb.n_sh - c.n_common), 6) >= 0.8
"""


def q_dedup_clusters(spark, sf_dir):
    """Connected components over the MinHash-LSH near-dup pairs →
    per-cluster sizes (keeper = min doc_id = the cluster id). LSH is the
    pair source because it is the miner that scales (candidate generation
    is banded, not all-pairs) — clustering its output is exactly the 100 TB
    dedup pipeline. Adaptive union-find/label-propagation on Spark;
    recursive-CTE transitive closure on DuckDB."""
    from photon_spark import pair_cache
    pairs = pair_cache.near_dup_pairs(
        spark, sf_dir, num_hashes=_NUM_HASHES, bands=_BANDS,
        threshold=0.7)
    labels = dedup.dup_clusters(pairs)
    return labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"))


#: connected-components CTE chain (ends in ``comp(id, cluster_id)``) over a
#: ``{pairs}`` relation — shared by the cluster-sizes oracle and the
#: cluster-aware split oracle (queries_training).
SQL_COMP_CTES = """pairs_src AS ({pairs}),
edges AS (
  SELECT lo_id AS s, hi_id AS d FROM pairs_src
  UNION
  SELECT hi_id AS s, lo_id AS d FROM pairs_src
),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
),
comp AS (
  SELECT s AS id, least(s, min(d)) AS cluster_id FROM reach GROUP BY s
)"""

SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {SQL_COMP_CTES}
SELECT cluster_id, count(*) AS n_members FROM comp GROUP BY cluster_id
"""


_NUM_HASHES, _BANDS, _ROWS_PER_BAND = 16, 4, 4


def q_dedup_cluster_bcubed(spark, sf_dir):
    """B-CUBED clustering quality of the MinHash-LSH dedup clusters
    against the EXACT-duplicate truth (groups by md5 of the normalized
    text) — the standard extrinsic clustering metric (Bagga & Baldwin;
    the one Amigo et al. showed uniquely satisfies all four clustering-
    eval constraints): per doc, precision = |C(d) ∩ T(d)| / |C(d)| and
    recall = |C(d) ∩ T(d)| / |T(d)| where C is the doc's predicted
    near-dup cluster (singletons = their own cluster) and T its truth
    group; per-source averages + F1. Low precision = the near-dup
    threshold over-merges; recall < 1 = exact duplicates the bands
    missed. This is the tuning evidence behind minhash_calibration,
    promoted to a per-source hash-gated audit.

    Float policy: per-doc ratios quantize to integer MILLIONTHS
    (the classifier_train_gd pattern) so the per-source sums are
    order-free long sums; one division at the end, F1 from the rounded
    P/R in the same association both engines. At 100 TB the ppm
    quantization runs per (cluster, truth-group) pair with bounded
    counts — n_ct·10^6 fits a long far past this corpus's size; swap
    to per-group ppm-of-ratio if clusters ever exceed ~10^12 docs.
    """
    from photon_spark import pair_cache
    d = _docs(spark, sf_dir)
    base = d.select("doc_id", "source",
                    F.md5(dedup.normalize_text(F.col("text")))
                     .alias("tid"))
    pairs = pair_cache.near_dup_pairs(
        spark, sf_dir, num_hashes=_NUM_HASHES, bands=_BANDS,
        threshold=0.7)
    labels = (dedup.dup_clusters(pairs)
              .withColumnRenamed("id", "doc_id"))
    a = (base.join(labels, "doc_id", "left")
         .select("doc_id", "source", "tid",
                 F.coalesce("cluster_id", F.col("doc_id")).alias("cid")))
    n_ct = a.groupBy("cid", "tid").agg(F.count(F.lit(1)).alias("n_ct"))
    n_c = a.groupBy("cid").agg(F.count(F.lit(1)).alias("n_c"))
    n_t = a.groupBy("tid").agg(F.count(F.lit(1)).alias("n_t"))
    per_doc = (a.join(n_ct, ["cid", "tid"]).join(n_c, "cid")
                .join(n_t, "tid")
                .select("source",
                        F.round(F.col("n_ct") * 1_000_000
                                / F.col("n_c")).cast("long").alias("pp"),
                        F.round(F.col("n_ct") * 1_000_000
                                / F.col("n_t")).cast("long").alias("rp")))
    agg = (per_doc.groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("pp").alias("sp"), F.sum("rp").alias("sr")))
    pr = F.round(F.col("sp") / (F.col("n_docs") * 1_000_000.0), 6)
    rc = F.round(F.col("sr") / (F.col("n_docs") * 1_000_000.0), 6)
    out = (agg.select("source", "n_docs",
                      pr.alias("b3_precision"), rc.alias("b3_recall"))
           .withColumn("b3_f1",
                       F.round(2.0 * F.col("b3_precision")
                               * F.col("b3_recall")
                               / (F.col("b3_precision")
                                  + F.col("b3_recall")), 6)))
    out._photon_cached = getattr(pairs, "_photon_cached", [])
    return out


def _sql_dedup_cluster_bcubed() -> str:
    return f"""
WITH RECURSIVE {{comp_ctes}},
a AS (
  SELECT d.doc_id, d.source, md5({_SQL_NORM}) AS tid,
         coalesce(c.cluster_id, d.doc_id) AS cid
  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
), nct AS (
  SELECT cid, tid, count(*) AS n_ct FROM a GROUP BY 1, 2
), nc AS (
  SELECT cid, count(*) AS n_c FROM a GROUP BY 1
), nt AS (
  SELECT tid, count(*) AS n_t FROM a GROUP BY 1
), per_doc AS (
  SELECT a.source,
         CAST(round(x.n_ct * 1000000.0 / c.n_c) AS BIGINT) AS pp,
         CAST(round(x.n_ct * 1000000.0 / t.n_t) AS BIGINT) AS rp
  FROM a JOIN nct x ON x.cid = a.cid AND x.tid = a.tid
  JOIN nc c ON c.cid = a.cid
  JOIN nt t ON t.tid = a.tid
), agg AS (
  SELECT source, count(*) AS n_docs, sum(pp) AS sp, sum(rp) AS sr
  FROM per_doc GROUP BY 1
), pr AS (
  SELECT source, n_docs,
         round(sp / (n_docs * 1000000.0), 6) AS b3_precision,
         round(sr / (n_docs * 1000000.0), 6) AS b3_recall
  FROM agg
)
SELECT source, n_docs, b3_precision, b3_recall,
       round(2.0 * b3_precision * b3_recall
             / (b3_precision + b3_recall), 6) AS b3_f1
FROM pr
"""



def q_minhash_near_dups(spark, sf_dir):
    return dedup.minhash_near_duplicates(
        _docs(spark, sf_dir), num_hashes=_NUM_HASHES, bands=_BANDS,
        threshold=0.7)


def _sql_minhash(source: str = "documents") -> str:
    """DuckDB rebuild of the MinHash-LSH near-dup miner over any
    ``source`` relation exposing (doc_id, text) — ``documents`` by
    default; the paragraph-level miner (queries_substring) passes a
    chunk CTE."""
    mins = ", ".join(
        f"list_aggregate(list_transform(g, x -> md5('{s}:' || x)), 'min')"
        for s in range(_NUM_HASHES))
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        f"md5(array_to_string(sig[{b * _ROWS_PER_BAND + 1}:"
        f"{(b + 1) * _ROWS_PER_BAND}], '|')) AS bucket FROM sigs"
        for b in range(_BANDS))
    return f"""
WITH norm AS (
  SELECT doc_id, string_split({_SQL_NORM}, ' ') AS t FROM {source}
), grams AS (
  SELECT doc_id, {_SQL_GRAMS} AS g FROM norm WHERE len(t) >= 3
), sigs AS (
  SELECT doc_id, g, [{mins}] AS sig FROM grams WHERE len(g) > 0
), buckets AS ({bands}),
cands AS (
  SELECT DISTINCT a.doc_id AS lo_id, b.doc_id AS hi_id
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT c.lo_id, c.hi_id,
       round(len(list_intersect(ga.g, gb.g)) * 1.0 /
             greatest(len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g)),
                      1), 6) AS jaccard
FROM cands c
JOIN grams ga ON ga.doc_id = c.lo_id
JOIN grams gb ON gb.doc_id = c.hi_id
WHERE round(len(list_intersect(ga.g, gb.g)) * 1.0 /
            greatest(len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g)),
                     1), 6) >= 0.7
"""


SQL_MINHASH_NEAR_DUPS = _sql_minhash()


def q_simhash_buckets(spark, sf_dir):
    return dedup.simhash_duplicates(_docs(spark, sf_dir))


def _sql_simhash() -> str:
    terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(h, x -> substring(x, {j + 1}, 1) >= '8'))"
        f" - len(h) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(16))
    return f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents
), hs AS (
  SELECT doc_id, list_transform(t, x -> md5(lower(x))) AS h FROM toks
), sh AS (
  SELECT doc_id, ({terms})::BIGINT AS simhash FROM hs
)
SELECT simhash, count(*) AS n_docs, min(doc_id) AS keep_id
FROM sh GROUP BY simhash HAVING count(*) > 1
"""


SQL_SIMHASH_BUCKETS = _sql_simhash()


# -------------------------------------------------------------- similarity

_TOPK, _QUERY_ID = 10, 0


def q_ann_topk_bruteforce(spark, sf_dir):
    return similarity.brute_force_topk(_emb(spark, sf_dir), _QUERY_ID, k=_TOPK)


SQL_ANN_TOPK_BRUTEFORCE = f"""
SELECT b.vec_id,
       round(list_cosine_similarity(b.embedding::DOUBLE[],
                                    q.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings b,
     (SELECT embedding FROM embeddings WHERE vec_id = {_QUERY_ID}) q
WHERE b.vec_id != {_QUERY_ID}
ORDER BY cosine DESC, b.vec_id
LIMIT {_TOPK}
"""


def q_embedding_near_dup_pairs(spark, sf_dir):
    return dedup.embedding_near_duplicates(_emb(spark, sf_dir), threshold=0.35)


SQL_EMBEDDING_NEAR_DUP_PAIRS = """
SELECT a.vec_id AS lo_id, b.vec_id AS hi_id,
       round(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                   b.embedding::DOUBLE[]), 6) >= 0.35
"""


def q_ann_topk_lsh(spark, sf_dir):
    # Approximate *by design*, but fully deterministic: the hyperplanes are
    # md5-derived (similarity._plane_coeff), so the DuckDB oracle recomputes
    # the identical signatures and the probe set "Hamming ≤ 2 of the query
    # signature" becomes bit_count(xor(sig, qsig)) <= 2. Recall vs brute
    # force additionally pinned in tests/test_northstar.py.
    return similarity.lsh_topk(_emb(spark, sf_dir), _QUERY_ID, k=_TOPK)


# Oracle twin of similarity.lsh_topk(n_planes=6, probe_hamming=2): the
# per-plane projection is a sequential left-to-right fold on both engines
# (Spark F.aggregate over zip_with ≡ DuckDB list_dot_product — bit-identical,
# pinned in tests/test_parity_rules.py), so the sign bits agree exactly.
SQL_ANN_TOPK_LSH = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), planes AS (
  SELECT p.range AS p,
         list_transform(range(d.dim),
           i -> CAST(('0x' || substr(md5(p.range::VARCHAR || ':' ||
                                         i::VARCHAR), 1, 8)) AS BIGINT)
                / 2147483648.0 - 1.0) AS c
  FROM range(6) p, (SELECT len(embedding) AS dim
                    FROM embeddings LIMIT 1) d
), sigs AS (
  SELECT b.vec_id,
         SUM(CASE WHEN list_dot_product(b.v, p.c) >= 0
                  THEN (1 << p.p) ELSE 0 END)::BIGINT AS sig
  FROM base b CROSS JOIN planes p
  GROUP BY b.vec_id
)
SELECT b.vec_id,
       round(list_cosine_similarity(b.v, q.v), 6) AS cosine
FROM base b
JOIN sigs s ON s.vec_id = b.vec_id,
     (SELECT v FROM base WHERE vec_id = {_QUERY_ID}) q,
     (SELECT sig AS qsig FROM sigs WHERE vec_id = {_QUERY_ID}) qs
WHERE bit_count(xor(s.sig, qs.qsig)) <= 2 AND b.vec_id != {_QUERY_ID}
ORDER BY cosine DESC, b.vec_id
LIMIT {_TOPK}
"""


def q_ann_topk_ivf(spark, sf_dir):
    # Approximate (probes 4/16 cells) but deterministic: centroids are the
    # 16 lowest-id embeddings, assignment is argmax-cosine with
    # lowest-cell-id tie-break — both reproducible in SQL, so the driver
    # hash-gates this too. Recall floor pinned in tests/test_northstar.py.
    return similarity.ivf_topk(_emb(spark, sf_dir), _QUERY_ID, k=_TOPK,
                               n_cells=16, n_probe=4)


# Oracle twin of similarity.ivf_topk(n_cells=16, n_probe=4). The Spark side
# assigns cells with an Arrow-batched numpy GEMM; cell choice only differs
# from the SQL cosine if a vector's best-vs-second-best centroid margin is
# within float reassociation error (~1e-13) — margins at this corpus are
# pinned far larger in tests/test_northstar.py.
SQL_ANN_TOPK_IVF = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), cents AS (
  SELECT vec_id AS cell_id, v AS cv FROM base ORDER BY vec_id LIMIT 16
), assign AS (
  SELECT vec_id, cell_id FROM (
    SELECT b.vec_id, c.cell_id,
           row_number() OVER (
             PARTITION BY b.vec_id
             ORDER BY list_cosine_similarity(b.v, c.cv) DESC, c.cell_id
           ) AS rn
    FROM base b CROSS JOIN cents c) WHERE rn = 1
), probe AS (
  -- 6dp round-before-rank: the Spark side picks probes with a different
  -- cosine kernel (probe_cells' sequential fold); see similarity.py
  SELECT cell_id FROM (
    SELECT c.cell_id,
           row_number() OVER (
             ORDER BY round(list_cosine_similarity(c.cv, q.v), 6) DESC,
                      c.cell_id
           ) AS rn
    FROM cents c, (SELECT v FROM base WHERE vec_id = {_QUERY_ID}) q)
  WHERE rn <= 4
)
SELECT b.vec_id,
       round(list_cosine_similarity(b.v, q.v), 6) AS cosine
FROM base b
JOIN assign a ON a.vec_id = b.vec_id,
     (SELECT v FROM base WHERE vec_id = {_QUERY_ID}) q
WHERE a.cell_id IN (SELECT cell_id FROM probe) AND b.vec_id != {_QUERY_ID}
ORDER BY cosine DESC, b.vec_id
LIMIT {_TOPK}
"""


def q_embedding_quantize_stats(spark, sf_dir):
    # int8 storage-path audit: map-only per-vector error columns + one
    # global aggregate of order-insensitive reductions (max / long sums) —
    # see similarity.quantize_stats for the hash-parity analysis.
    return similarity.quantize_stats(_emb(spark, sf_dir))


SQL_EMBEDDING_QUANTIZE_STATS = """
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), sc AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM base
), per AS (
  SELECT vec_id,
         CASE WHEN scale = 0 THEN 0.0
              ELSE list_max(list_transform(
                     v, x -> abs(round(x / scale) * scale - x))) END AS me,
         CASE WHEN scale = 0 THEN 0
              ELSE len(list_filter(
                     v, x -> abs(round(x / scale)) >= 127)) END AS ns
  FROM sc
)
SELECT count(*) AS n_vectors, CAST(sum(ns) AS BIGINT) AS total_saturated,
       round(max(me), 6) AS worst_max_abs_err,
       round(sum(CAST(round(me * 1000000) AS BIGINT)) * 1.0
             / count(*) / 1000000, 6) AS avg_max_abs_err
FROM per
"""


# ------------------------------------------------------- quality signals

def q_repetition_profile(spark, sf_dir):
    # Gopher-style repetition filters as one map-only Arrow pass (no
    # shuffle): distinct-token fraction, top word-bigram + its mass,
    # duplicate-trigram fraction.
    return quality.repetition_profile(_docs(spark, sf_dir))


SQL_REPETITION_PROFILE = f"""
WITH norm AS (
  SELECT doc_id, {_SQL_NORM} AS nt FROM documents
), toks AS (
  SELECT doc_id, CASE WHEN nt = '' THEN CAST([] AS VARCHAR[])
                 ELSE string_split(nt, ' ') END AS t
  FROM norm
), base AS (
  SELECT doc_id, t, len(t) AS n FROM toks
), bi AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS g
  FROM base, unnest(generate_series(1, len(t) - 1)) u(i)
  WHERE len(t) >= 2
), bic AS (
  SELECT doc_id, g, count(*) AS c FROM bi GROUP BY 1, 2
), topbi AS (
  SELECT doc_id, g, c FROM (
    SELECT doc_id, g, c,
           row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rn
    FROM bic)
  WHERE rn = 1
)
SELECT b.doc_id, b.n AS n_tokens,
       CASE WHEN b.n = 0 THEN 0.0
            ELSE round(len(list_distinct(b.t)) * 1.0 / b.n, 6)
       END AS distinct_frac,
       tb.g AS top_bigram,
       CASE WHEN b.n < 2 THEN 0.0
            ELSE round(tb.c * 1.0 / (b.n - 1), 6) END AS top_bigram_frac,
       CASE WHEN b.n < 3 THEN 0.0
            ELSE round((b.n - 2 - len(list_distinct(list_transform(
                   generate_series(1, b.n - 2),
                   i -> b.t[i] || ' ' || b.t[i+1] || ' ' || b.t[i+2]))))
                 * 1.0 / (b.n - 2), 6)
       END AS dup_trigram_frac
FROM base b LEFT JOIN topbi tb USING (doc_id)
"""


def q_winnow_overlap_pairs(spark, sf_dir):
    # Winnowing rolling-hash fingerprints → df-capped inverted-index
    # self-join → pairs sharing >= 15 selected hashes (verbatim-span
    # overlap that token-level Jaccard dilutes away).
    return quality.winnow_overlap_pairs(_docs(spark, sf_dir))


SQL_WINNOW_OVERLAP_PAIRS = f"""
WITH norm AS (
  SELECT doc_id, {_SQL_NORM} AS nt FROM documents
), grams AS (
  SELECT doc_id, i, md5(substring(nt, i, {quality.WINNOW_K})) AS h
  FROM norm, unnest(generate_series(1, length(nt) - {quality.WINNOW_K - 1}))
       t(i)
  WHERE length(nt) >= {quality.WINNOW_K}
), mins AS (
  SELECT doc_id, i,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW
                      AND {quality.WINNOW_W - 1} FOLLOWING) AS fp,
         count(*) OVER (PARTITION BY doc_id) AS ng
  FROM grams
), ex AS (
  SELECT DISTINCT doc_id, fp FROM mins
  WHERE i <= ng - {quality.WINNOW_W - 1}
), capped AS (
  SELECT doc_id, fp FROM (
    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df FROM ex)
  WHERE df <= {quality.MAX_FP_DF}
)
SELECT a.doc_id AS lo_id, b.doc_id AS hi_id, count(*) AS n_shared
FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 15
"""


def q_tfidf_top_terms(spark, sf_dir):
    # Vocabulary-dim join + rank-limited window: top-3 TF-IDF terms/doc.
    return quality.tfidf_top_terms(_docs(spark, sf_dir), top_k=3)


SQL_TFIDF_TOP_TERMS = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split({_SQL_NORM}, ' ')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks WHERE term != ''
  GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT count(DISTINCT doc_id) AS n_docs FROM documents
), scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         round(t.tf * ln(n.n_docs * 1.0 / d.df), 6) AS score
  FROM tf t JOIN dfreq d USING (term), n
)
SELECT doc_id, term, tf, df, score, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term) AS rank
  FROM scored)
WHERE rank <= 3
"""


def q_media_stats(spark, sf_dir):
    # Multimodal plumbing on the deterministic synthetic media table (no
    # testdata media table exists). The table is seeded by media_id, so the
    # aggregate has exact literal expectations — hash-gated via a VALUES
    # oracle instead of the r1 rows-only check.
    media = multimodal.synthesize_media(spark, n=64)
    return multimodal.media_stats(media)


#: synthesize_media(n=64, kind="image"): blob length 256+(i%5)*64,
#: duration 1000*(1+i%10) — closed-form totals.
SQL_MEDIA_STATS = """
SELECT 'image' AS kind, 'image/fake' AS mime, 64::BIGINT AS n_items,
       24448::BIGINT AS total_bytes, 382.0::DOUBLE AS avg_bytes,
       10000::BIGINT AS max_duration_ms
"""


def q_frame_sample_stats(spark, sf_dir):
    """Multimodal 1:N plumbing under the hash gate: sample frames from the
    deterministic synthetic video table and aggregate blob-free stats. The
    oracle derives the same numbers independently in SQL from the synthesis
    formulas (media i: blob len 256+(i%5)*64, duration 1000*(1+i%10); frame
    k of n is the strided slice content[k::n][:64], so its length is
    min(64, ceil((len-k)/n)))."""
    media = multimodal.synthesize_media(spark, n=64, kind="video")
    frames = multimodal.sample_frames(media, every_ms=1000, max_frames=8)
    return frames.agg(
        F.count_distinct("media_id").alias("n_media"),
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.length("frame")).alias("total_frame_bytes"),
        F.max("frame_idx").cast("long").alias("max_frame_idx"))


SQL_FRAME_SAMPLE_STATS = """
WITH m AS (
  SELECT i, 256 + (i % 5) * 64 AS len, least(8, 1 + i % 10) AS n
  FROM generate_series(0, 63) t(i)
), fr AS (
  SELECT i, unnest(generate_series(0, n - 1)) AS k, len, n FROM m
)
SELECT count(DISTINCT i) AS n_media, count(*) AS n_frames,
       CAST(sum(least(64, CAST(ceil((len - k) * 1.0 / n) AS BIGINT)))
            AS BIGINT) AS total_frame_bytes,
       max(k)::BIGINT AS max_frame_idx
FROM fr
"""


#: PNG fixture size for the gated decode relation
PNG_N = 48


def q_image_decode_stats(spark, sf_dir):
    """REAL image decode under the hash gate: per-image pixel statistics
    (dims, exact luma sum, min/max, 6dp mean) from actually-decoded PNG
    pixel data — the fixture encodes each image with all five PNG
    scanline filters cycling per row, and the engine decodes with the
    pure-stdlib codec (multimodal.decode_png: zlib inflate + per-row
    unfilter, CRC-checked; no PIL). The oracle re-derives every statistic
    from the pixel closed form (pixel (x,y) of image i =
    (31i + 7y + 3x) mod 256, dims (16 + i mod 9) × (12 + i mod 7))
    entirely in SQL — a hash match therefore proves
    encode → inflate → unfilter reproduces ground-truth pixels
    value-for-value. Map-only Arrow pass; blobs never shuffle."""
    media = multimodal.synthesize_png_media(spark, n=PNG_N)
    return multimodal.image_decode_features(media)


SQL_IMAGE_DECODE_STATS = f"""
WITH m AS (
  SELECT i, 16 + i % 9 AS w, 12 + i % 7 AS h FROM range({PNG_N}) t(i)
), px AS (
  SELECT m.i, m.w, m.h,
         (31 * m.i + 7 * (g.j // m.w) + 3 * (g.j % m.w)) % 256 AS v
  FROM m CROSS JOIN generate_series(0, 24 * 18 - 1) g(j)
  WHERE g.j < m.w * m.h
)
SELECT i AS media_id, CAST(w AS INTEGER) AS decoded_w,
       CAST(h AS INTEGER) AS decoded_h,
       count(*) AS n_pixels, CAST(sum(v) AS BIGINT) AS luma_sum,
       CAST(min(v) AS INTEGER) AS min_luma,
       CAST(max(v) AS INTEGER) AS max_luma,
       round(CAST(sum(v) AS BIGINT) / (count(*) * 1.0), 6) AS mean_luma
FROM px GROUP BY i, w, h
"""


#: RGB fixture size and resize target for the gated resize relation
RGB_PNG_N, RESIZE_WH = 48, 8


def q_image_resize_stats(spark, sf_dir):
    """REAL decode + REAL resample under the hash gate: per-image
    PER-CHANNEL pixel statistics of truecolor PNGs nearest-neighbor-
    resized to {RESIZE_WH}×{RESIZE_WH} — the thumbnail/normalize step of
    a vision-training pipeline. The fixture encodes RGB images (all five
    PNG scanline filters cycling per row, bpp=3 left-neighbor paths);
    the engine decodes with the pure-stdlib codec and resamples with the
    floor rule src = (dst·src_dim) div out_dim; the oracle re-derives
    every post-resize subpixel from the closed form (channel c of pixel
    (x,y) of image i = (31i + 7y + 3x + 11c) mod 256) entirely in SQL —
    a hash match proves encode → inflate → unfilter → resample
    reproduces ground truth value-for-value. Map-only Arrow pass."""
    media = multimodal.synthesize_rgb_png_media(spark, n=RGB_PNG_N)
    return multimodal.image_resize_channel_stats(
        media, out_w=RESIZE_WH, out_h=RESIZE_WH)


SQL_IMAGE_RESIZE_STATS = f"""
WITH m AS (
  SELECT i, 16 + i % 9 AS w, 12 + i % 7 AS h FROM range({RGB_PNG_N}) t(i)
), px AS (
  -- output pixel (xo, yo) = j % {RESIZE_WH}, j // {RESIZE_WH} samples
  -- source pixel ((xo·w) // {RESIZE_WH}, (yo·h) // {RESIZE_WH})
  SELECT m.i, m.w, m.h, c.c AS channel,
         (31 * m.i + 7 * (((g.j // {RESIZE_WH}) * m.h) // {RESIZE_WH})
                   + 3 * (((g.j % {RESIZE_WH}) * m.w) // {RESIZE_WH})
                   + 11 * c.c) % 256 AS v
  FROM m
  CROSS JOIN generate_series(0, {RESIZE_WH * RESIZE_WH - 1}) g(j)
  CROSS JOIN (VALUES (0), (1), (2)) c(c)
)
SELECT i AS media_id, CAST(channel AS INTEGER) AS channel,
       CAST(w AS INTEGER) AS decoded_w, CAST(h AS INTEGER) AS decoded_h,
       count(*) AS n_px, CAST(sum(v) AS BIGINT) AS px_sum,
       CAST(min(v) AS INTEGER) AS px_min,
       CAST(max(v) AS INTEGER) AS px_max,
       round(CAST(sum(v) AS BIGINT) / (count(*) * 1.0), 6) AS px_mean
FROM px GROUP BY i, channel, w, h
"""


#: audio window parameters for the gated feature relation
AUDIO_WIN_MS, AUDIO_MAX_WIN = 500, 8


def q_audio_window_energy(spark, sf_dir):
    """Audio windowed energy under the hash gate: the full per-window
    feature relation (id, window, start, bytes, energy, peak) over the
    deterministic synthetic audio table — the oracle rebuilds every
    window sum from the blob's closed form (byte j of media i =
    (31i+7j) mod 256, length 256+(i mod 5)·64, duration 1000·(1+i mod
    10) ms) entirely in SQL, so the gate certifies the 1:N mapInPandas
    plumbing value-for-value, not just counts."""
    media = multimodal.synthesize_media(spark, n=64, kind="audio")
    return multimodal.audio_window_features(media, window_ms=AUDIO_WIN_MS,
                                            max_windows=AUDIO_MAX_WIN)


SQL_AUDIO_WINDOW_ENERGY = f"""
WITH m AS (
  SELECT i, 256 + (i % 5) * 64 AS len, 1000 * (1 + i % 10) AS dur,
         least({AUDIO_MAX_WIN},
               greatest(1, (1000 * (1 + i % 10)) // {AUDIO_WIN_MS})) AS n
  FROM range(64) t(i)
), bytes AS (
  -- byte j of media i belongs to window k = ⌊((j+1)·n − 1) / len⌋ —
  -- the exact inverse of the Python slice a_k = k·len // n (DuckDB's
  -- generate_series can't take lateral column bounds, so windows are
  -- assigned per byte instead of bytes enumerated per window)
  SELECT m.i, m.dur, m.n,
         ((g.j + 1) * m.n - 1) // m.len AS k,
         (31 * m.i + 7 * g.j) % 256 AS v
  FROM m CROSS JOIN generate_series(0, 511) g(j)
  WHERE g.j < m.len
)
SELECT i AS media_id, CAST(k AS INTEGER) AS win_idx,
       (k * dur) // n AS win_start_ms,
       count(*) AS n_bytes,
       CAST(sum(v) AS BIGINT) AS energy,
       CAST(max(v) AS INTEGER) AS peak
FROM bytes GROUP BY i, k, dur, n
"""


# ---------------------------------------------------------- n-gram novelty

def q_doc_ngram_novelty(spark, sf_dir):
    """Per-document n-gram novelty: what share of a doc's distinct word
    3-grams first appear in THIS doc (first = lowest doc_id) — the
    span-level dup signal behind substring-dedup policies ("drop docs
    whose content is mostly already seen").

    Plan: shingle once (vectorized UDF), explode to (doc, gram) postings
    that feed BOTH the first-occurrence aggregate and the per-doc join —
    persisted once, released via dedup.release_cache. Only gram+id pairs
    shuffle; at 100 TB the first-occurrence table is the standard
    min-reduce over the posting list (map-side combinable)."""
    from photon_spark.functions.dedup import _own_cache, _shingled
    sh = _shingled(_docs(spark, sf_dir), "text", "doc_id", 3)
    ex = sh.select("id", F.explode("sh").alias("g")).persist()
    first = ex.groupBy("g").agg(F.min("id").alias("first_doc"))
    novel = F.sum(F.when(F.col("id") == F.col("first_doc"), 1)
                  .otherwise(0)).cast("long")
    return _own_cache(
        ex.join(first, "g")
          .groupBy(F.col("id").alias("doc_id"))
          .agg(F.count(F.lit(1)).alias("n_shingles"),
               novel.alias("n_novel"),
               F.round(novel / F.count(F.lit(1)), 6).alias("novelty_rate")),
        [ex])


SQL_DOC_NGRAM_NOVELTY = f"""
WITH norm AS (
  SELECT doc_id, string_split({_SQL_NORM}, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, {_SQL_GRAMS} AS g FROM norm WHERE len(t) >= 3
), ex AS (
  SELECT doc_id, unnest(g) AS gr FROM grams WHERE len(g) > 0
), fo AS (
  SELECT gr, min(doc_id) AS first_doc FROM ex GROUP BY gr
)
SELECT e.doc_id, count(*) AS n_shingles,
       CAST(sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       round(sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS novelty_rate
FROM ex e JOIN fo f ON e.gr = f.gr
GROUP BY e.doc_id
"""


# --------------------------------------------------------------- PQ ANN

_PQ_M, _PQ_KS, _PQ_RERANK = 4, 16, 100


def q_ann_topk_pq(spark, sf_dir):
    """Product-quantization ANN (similarity.pq_topk): 128× index
    compression, ADC shortlist via literal table lookups (no shuffle),
    exact cosine re-rank on the {_PQ_RERANK}-candidate shortlist. The
    oracle rebuilds codebooks/codes/ADC tables in SQL from the same
    first-{_PQ_KS} deterministic convention."""
    return similarity.pq_topk(_emb(spark, sf_dir), _QUERY_ID, k=_TOPK,
                              m_sub=_PQ_M, ks=_PQ_KS, rerank=_PQ_RERANK)


def _sql_ann_topk_pq() -> str:
    ds = 64 // _PQ_M
    sub = lambda src, m: f"list_slice({src}, {m * ds + 1}, {(m + 1) * ds})"  # noqa: E731
    enc_joins = "\n".join(
        f"JOIN (SELECT vec_id, code FROM enc WHERE m = {m}) e{m} "
        f"ON e{m}.vec_id = b.vec_id" for m in range(_PQ_M))
    adc_joins = "\n".join(
        f"JOIN adc a{m} ON a{m}.m = {m} AND a{m}.j = e{m}.code"
        for m in range(_PQ_M))
    score = "((a0.d + a1.d) + a2.d) + a3.d"
    return f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), cb AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v
  FROM (SELECT * FROM base ORDER BY vec_id LIMIT {_PQ_KS})
), cbs AS (
  SELECT j, 0 AS m, {sub('v', 0)} AS cm FROM cb UNION ALL
  SELECT j, 1, {sub('v', 1)} FROM cb UNION ALL
  SELECT j, 2, {sub('v', 2)} FROM cb UNION ALL
  SELECT j, 3, {sub('v', 3)} FROM cb
), subv AS (
  SELECT vec_id, 0 AS m, {sub('v', 0)} AS vm FROM base UNION ALL
  SELECT vec_id, 1, {sub('v', 1)} FROM base UNION ALL
  SELECT vec_id, 2, {sub('v', 2)} FROM base UNION ALL
  SELECT vec_id, 3, {sub('v', 3)} FROM base
), enc AS (
  SELECT vec_id, m, j AS code FROM (
    SELECT s.vec_id, s.m, c.j,
           row_number() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY list_dot_product(c.cm, c.cm)
                      - 2 * list_dot_product(s.vm, c.cm) ASC, c.j ASC) AS rn
    FROM subv s JOIN cbs c ON s.m = c.m) WHERE rn = 1
), q AS (
  SELECT m, vm AS qm FROM subv WHERE vec_id = {_QUERY_ID}
), adc AS (
  SELECT c.m, c.j,
         (list_dot_product(q.qm, q.qm)
          - 2 * list_dot_product(q.qm, c.cm))
         + list_dot_product(c.cm, c.cm) AS d
  FROM cbs c JOIN q ON q.m = c.m
), scored AS (
  SELECT b.vec_id, {score} AS dist2
  FROM (SELECT DISTINCT vec_id FROM base) b
  {enc_joins}
  {adc_joins}
), short AS (
  SELECT vec_id FROM scored WHERE vec_id != {_QUERY_ID}
  ORDER BY dist2 ASC, vec_id LIMIT {_PQ_RERANK}
)
SELECT e.vec_id,
       round(list_cosine_similarity(e.embedding::DOUBLE[],
                                    q.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings e
JOIN short s ON e.vec_id = s.vec_id,
     (SELECT embedding FROM embeddings WHERE vec_id = {_QUERY_ID}) q
ORDER BY cosine DESC, e.vec_id LIMIT {_TOPK}
"""


# ----------------------------------------------------------- IVF-PQ ANN

_IVFPQ_CELLS, _IVFPQ_PROBE = 16, 4


def q_ivf_pq_topk(spark, sf_dir):
    """IVF + PQ composed (similarity.ivf_pq_topk) — the FAISS-IVFPQ
    serving shape: coarse cells prune the corpus to
    {_IVFPQ_PROBE}/{_IVFPQ_CELLS} (partition pruning at scale), PQ ADC
    scores only probed candidates from 2-byte codes, exact cosine
    re-ranks the shortlist. The oracle composes the already-gated IVF
    assign/probe CTEs with the PQ codebook/enc/ADC CTEs — same
    conventions, one SQL rebuild."""
    return similarity.ivf_pq_topk(_emb(spark, sf_dir), _QUERY_ID, k=_TOPK,
                                  n_cells=_IVFPQ_CELLS,
                                  n_probe=_IVFPQ_PROBE,
                                  m_sub=_PQ_M, ks=_PQ_KS,
                                  rerank=_PQ_RERANK)


def _sql_ivf_pq_topk() -> str:
    ds = 64 // _PQ_M
    sub = lambda src, m: f"list_slice({src}, {m * ds + 1}, {(m + 1) * ds})"  # noqa: E731
    enc_joins = "\n".join(
        f"JOIN (SELECT vec_id, code FROM enc WHERE m = {m}) e{m} "
        f"ON e{m}.vec_id = b.vec_id" for m in range(_PQ_M))
    adc_joins = "\n".join(
        f"JOIN adc a{m} ON a{m}.m = {m} AND a{m}.j = e{m}.code"
        for m in range(_PQ_M))
    score = "((a0.d + a1.d) + a2.d) + a3.d"
    return f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), cents AS (
  SELECT vec_id AS cell_id, v AS cv FROM base
  ORDER BY vec_id LIMIT {_IVFPQ_CELLS}
), assign AS (
  SELECT vec_id, cell_id FROM (
    SELECT b.vec_id, c.cell_id,
           row_number() OVER (
             PARTITION BY b.vec_id
             ORDER BY list_cosine_similarity(b.v, c.cv) DESC, c.cell_id
           ) AS rn
    FROM base b CROSS JOIN cents c) WHERE rn = 1
), probe AS (
  -- 6dp round-before-rank, same convention as the IVF oracle above
  SELECT cell_id FROM (
    SELECT c.cell_id,
           row_number() OVER (
             ORDER BY round(list_cosine_similarity(c.cv, q.v), 6) DESC,
                      c.cell_id
           ) AS rn
    FROM cents c, (SELECT v FROM base WHERE vec_id = {_QUERY_ID}) q)
  WHERE rn <= {_IVFPQ_PROBE}
), cand AS (
  SELECT a.vec_id FROM assign a
  WHERE a.cell_id IN (SELECT cell_id FROM probe)
), cb AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v
  FROM (SELECT * FROM base ORDER BY vec_id LIMIT {_PQ_KS})
), cbs AS (
  SELECT j, 0 AS m, {sub('v', 0)} AS cm FROM cb UNION ALL
  SELECT j, 1, {sub('v', 1)} FROM cb UNION ALL
  SELECT j, 2, {sub('v', 2)} FROM cb UNION ALL
  SELECT j, 3, {sub('v', 3)} FROM cb
), subv AS (
  SELECT b.vec_id, 0 AS m, {sub('b.v', 0)} AS vm
  FROM base b JOIN cand USING (vec_id) UNION ALL
  SELECT b.vec_id, 1, {sub('b.v', 1)}
  FROM base b JOIN cand USING (vec_id) UNION ALL
  SELECT b.vec_id, 2, {sub('b.v', 2)}
  FROM base b JOIN cand USING (vec_id) UNION ALL
  SELECT b.vec_id, 3, {sub('b.v', 3)}
  FROM base b JOIN cand USING (vec_id)
), enc AS (
  SELECT vec_id, m, j AS code FROM (
    SELECT s.vec_id, s.m, c.j,
           row_number() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY list_dot_product(c.cm, c.cm)
                      - 2 * list_dot_product(s.vm, c.cm) ASC, c.j ASC) AS rn
    FROM subv s JOIN cbs c ON s.m = c.m) WHERE rn = 1
), q AS (
  SELECT m, vm AS qm FROM (
    SELECT 0 AS m, {sub('v', 0)} AS vm FROM base
    WHERE vec_id = {_QUERY_ID} UNION ALL
    SELECT 1, {sub('v', 1)} FROM base WHERE vec_id = {_QUERY_ID} UNION ALL
    SELECT 2, {sub('v', 2)} FROM base WHERE vec_id = {_QUERY_ID} UNION ALL
    SELECT 3, {sub('v', 3)} FROM base WHERE vec_id = {_QUERY_ID})
), adc AS (
  SELECT c.m, c.j,
         (list_dot_product(q.qm, q.qm)
          - 2 * list_dot_product(q.qm, c.cm))
         + list_dot_product(c.cm, c.cm) AS d
  FROM cbs c JOIN q ON q.m = c.m
), scored AS (
  SELECT b.vec_id, {score} AS dist2
  FROM cand b
  {enc_joins}
  {adc_joins}
), short AS (
  SELECT vec_id FROM scored WHERE vec_id != {_QUERY_ID}
  ORDER BY dist2 ASC, vec_id LIMIT {_PQ_RERANK}
)
SELECT e.vec_id,
       round(list_cosine_similarity(e.embedding::DOUBLE[],
                                    q.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings e
JOIN short s ON e.vec_id = s.vec_id,
     (SELECT embedding FROM embeddings WHERE vec_id = {_QUERY_ID}) q
ORDER BY cosine DESC, e.vec_id LIMIT {_TOPK}
"""


# ------------------------------------------------------ media phash dedup

#: Hamming ceiling for perceptual near-dup verification
PHASH_HAM_T = 4


def q_media_phash_near_dups(spark, sf_dir):
    """Perceptual-hash near-duplicate mining over binary media: banded
    64-bit aHash keys generate candidates via an equi-join on
    (band, key) — the image-dedup analogue of MinHash-LSH — then exact
    Hamming distance (bit_count of XORed band keys, pure Catalyst)
    verifies candidates only. Blobs never shuffle: the fingerprint pass
    is map-only, and everything downstream moves (id, 4 longs).

    The oracle recomputes the identical fingerprints from the synthetic
    blob's closed form (byte j of media i = (31i+7j) mod 256, length
    64·(4+i%5)) entirely in SQL — the hash gate covers the full
    band/candidate/verify pipeline, not just counts."""
    media = multimodal.synthesize_media(spark, n=64)
    # the fingerprint relation feeds FOUR plan branches (two join sides of
    # candidate gen + two band lookups) — materialize it once (64 rows)
    # instead of running the UDF per branch
    ph = multimodal.phash_bands(media).localCheckpoint(eager=True)
    ex = ph.select("media_id", F.posexplode("bands").alias("band", "key"))
    a, b = ex.alias("a"), ex.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.media_id") < F.col("b.media_id")))
             .select(F.col("a.media_id").alias("lo_id"),
                     F.col("b.media_id").alias("hi_id")).distinct())
    pl = ph.select(F.col("media_id").alias("lo_id"), F.col("bands").alias("ba"))
    pr = ph.select(F.col("media_id").alias("hi_id"), F.col("bands").alias("bb"))
    ham = sum(
        F.bit_count(F.element_at("ba", m + 1)
                    .bitwiseXOR(F.element_at("bb", m + 1)))
        for m in range(4)).cast("long")
    return (cand.join(pl, "lo_id").join(pr, "hi_id")
                .select("lo_id", "hi_id", ham.alias("hamming"))
                .where(F.col("hamming") <= PHASH_HAM_T))


SQL_MEDIA_PHASH_NEAR_DUPS = f"""
WITH m AS (
  SELECT CAST(i AS BIGINT) AS media_id, 64 * (4 + i % 5) AS L
  FROM range(64) t(i)
), vals AS (
  SELECT media_id, L, unnest(generate_series(0, L - 1)) AS j FROM m
), seg AS (
  SELECT media_id, j // (L // 64) AS k,
         CAST(sum((media_id * 31 + j * 7) % 256) AS BIGINT) AS sv
  FROM vals GROUP BY 1, 2
), tot AS (
  SELECT media_id, CAST(sum(sv) AS BIGINT) AS tv FROM seg GROUP BY 1
), bits AS (
  SELECT s.media_id, s.k,
         CASE WHEN s.sv * 64 >= t.tv THEN 1 ELSE 0 END AS bit
  FROM seg s JOIN tot t USING (media_id)
), cand AS (
  SELECT DISTINCT a.media_id AS lo_id, b.media_id AS hi_id
  FROM (SELECT media_id, k // 16 AS band,
               CAST(sum(bit << (k % 16)) AS BIGINT) AS key
        FROM bits GROUP BY 1, 2) a
  JOIN (SELECT media_id, k // 16 AS band,
               CAST(sum(bit << (k % 16)) AS BIGINT) AS key
        FROM bits GROUP BY 1, 2) b
    ON a.band = b.band AND a.key = b.key AND a.media_id < b.media_id
)
SELECT c.lo_id, c.hi_id,
       CAST(sum(CASE WHEN ba.bit != bb.bit THEN 1 ELSE 0 END) AS BIGINT)
         AS hamming
FROM cand c
JOIN bits ba ON ba.media_id = c.lo_id
JOIN bits bb ON bb.media_id = c.hi_id AND bb.k = ba.k
GROUP BY 1, 2
HAVING hamming <= {PHASH_HAM_T}
"""


# ------------------------------------------------- media keep-best

def q_media_keep_best(spark, sf_dir):
    """The media-granularity dedup DECISION: cluster the phash near-dup
    pairs (connected components over the banded-aHash miner) and keep
    one representative per cluster — the LARGEST blob (the
    highest-fidelity copy in a real pipeline; ties → lowest media_id).
    Per cluster: member count, keeper, kept bytes, dropped bytes — the
    audit a media-dedup pass emits before deleting anything.

    Scale shape: the pair relation is the already-banded miner output;
    clustering and the byte-argmax move (id, long) pairs only — blobs
    never shuffle (their lengths ride the fingerprint relation)."""
    from photon_spark.functions import dedup as _dd
    media = multimodal.synthesize_media(spark, n=64)
    pairs = q_media_phash_near_dups(spark, sf_dir)
    labels = _dd.dup_clusters(
        pairs.select(F.col("lo_id"), F.col("hi_id")))
    sizes = media.select(F.col("media_id").alias("id"),
                         F.length("content").cast("long").alias("n_bytes"))
    mem = labels.join(sizes, "id")
    best = (mem.groupBy("cluster_id")
               .agg(F.max(F.struct(F.col("n_bytes"),
                                   (-F.col("id")).alias("neg_id")))
                     .alias("b"))
               .select("cluster_id", F.col("b.n_bytes").alias("keep_bytes"),
                       (-F.col("b.neg_id")).alias("keep_id")))
    agg = (mem.groupBy("cluster_id")
              .agg(F.count(F.lit(1)).alias("n_members"),
                   F.sum("n_bytes").cast("long").alias("total_bytes")))
    return (agg.join(best, "cluster_id")
               .select("cluster_id", "n_members", "keep_id", "keep_bytes",
                       (F.col("total_bytes") - F.col("keep_bytes"))
                        .cast("long").alias("dropped_bytes")))


SQL_MEDIA_KEEP_BEST = f"""
WITH RECURSIVE pairs_src AS ({SQL_MEDIA_PHASH_NEAR_DUPS}),
edges AS (
  SELECT lo_id AS s, hi_id AS d FROM pairs_src
  UNION
  SELECT hi_id AS s, lo_id AS d FROM pairs_src
),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
),
comp AS (
  SELECT s AS id, least(s, min(d)) AS cluster_id FROM reach GROUP BY s
),
sizes AS (
  SELECT CAST(i AS BIGINT) AS id, CAST(64 * (4 + i % 5) AS BIGINT)
           AS n_bytes
  FROM range(64) t(i)
),
mem AS (
  SELECT c.cluster_id, c.id, z.n_bytes
  FROM comp c JOIN sizes z ON c.id = z.id
),
best AS (
  SELECT cluster_id, id AS keep_id, n_bytes AS keep_bytes FROM (
    SELECT cluster_id, id, n_bytes,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY n_bytes DESC, id ASC) AS rn
    FROM mem) WHERE rn = 1
)
SELECT m.cluster_id, count(*) AS n_members, any_value(b.keep_id) AS keep_id,
       any_value(b.keep_bytes) AS keep_bytes,
       CAST(sum(m.n_bytes) - any_value(b.keep_bytes) AS BIGINT)
         AS dropped_bytes
FROM mem m JOIN best b ON m.cluster_id = b.cluster_id
GROUP BY m.cluster_id
"""


# ------------------------------------------------- dup-graph analytics

def q_dup_graph_degree(spark, sf_dir):
    """Degree distribution of the near-duplicate graph: how many docs
    have 1, 2, ... near-dup partners — the shape that tells a curation
    run whether duplication is pairwise noise or dense boilerplate
    clusters. Two short aggregations over the (lo, hi) pair relation
    (ids only, text long gone): degree per doc, then docs per degree."""
    from photon_spark import pair_cache
    pairs = pair_cache.near_dup_pairs(spark, sf_dir)
    ends = (pairs.select(F.col("lo_id").alias("id"))
                 .unionAll(pairs.select(F.col("hi_id").alias("id"))))
    deg = ends.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))
    return (deg.groupBy("degree")
               .agg(F.count(F.lit(1)).alias("n_docs"))
               .orderBy("degree"))


SQL_DUP_GRAPH_DEGREE = """
WITH pairs AS ({pairs}),
ends AS (
  SELECT lo_id AS id FROM pairs UNION ALL SELECT hi_id FROM pairs
),
deg AS (
  SELECT id, count(*) AS degree FROM ends GROUP BY 1
)
SELECT degree, count(*) AS n_docs FROM deg GROUP BY 1 ORDER BY degree
"""


# ------------------------------------------------------------- kNN graph

KNN_K = 3


def q_knn_graph(spark, sf_dir):
    """Exact kNN graph (k=3 cosine neighbors per vector) via the
    blocked-GEMM kernel — vectors shuffle once into packed blocks, every
    block pair is one BLAS task, candidates re-verify with the
    sequential fold the O(n²) SQL oracle computes."""
    return similarity.knn_graph(_emb(spark, sf_dir), k=KNN_K)


SQL_KNN_GRAPH = f"""
WITH pairs AS (
  SELECT a.vec_id AS id, b.vec_id AS nbr,
         round(list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]), 6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT id, nbr, cosine,
         row_number() OVER (PARTITION BY id
                            ORDER BY cosine DESC, nbr) AS rn
  FROM pairs
)
SELECT id, nbr, cosine FROM ranked WHERE rn <= {KNN_K}
"""


# --------------------------------------------------- mutual kNN pairs

def q_mutual_knn_pairs(spark, sf_dir):
    """MUTUAL-kNN graph — the symmetrized backbone every
    manifold/clustering pipeline (UMAP-style) builds from a raw kNN
    graph: keep pair (a, b) only when b is in a's top-k AND a is in
    b's top-k. Directed kNN edges are asymmetric by construction (a
    hub can be someone's neighbor without reciprocating), and the
    mutual filter is the standard noise cut before graph clustering.
    Output: undirected (lo, hi, cosine) survivors plus each side's
    rank of the other.

    Plan: the kNN manifest (blocked-GEMM kernel, one packed-block
    shuffle) self-joins on the REVERSED pair — a k·n-row relation
    joining itself on its own key, never the corpus — so the mutual
    filter costs one hash join over bounded input at any corpus size.
    """
    g = similarity.knn_graph(_emb(spark, sf_dir), k=KNN_K)
    return _mutual_pairs_from_graph(g)


SQL_MUTUAL_KNN_PAIRS = f"""
WITH pairs AS (
  SELECT a.vec_id AS id, b.vec_id AS nbr,
         round(list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]), 6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT id, nbr, cosine,
         row_number() OVER (PARTITION BY id
                            ORDER BY cosine DESC, nbr) AS rn
  FROM pairs
),
knn AS (SELECT id, nbr, cosine, rn FROM ranked WHERE rn <= {KNN_K})
SELECT f.id AS lo_id, f.nbr AS hi_id, f.cosine,
       CAST(f.rn AS BIGINT) AS lo_rank, CAST(r.rn AS BIGINT) AS hi_rank
FROM knn f JOIN knn r ON r.id = f.nbr AND r.nbr = f.id
WHERE f.id < f.nbr
"""



# ------------------------------------------------- kNN label-purity eval

KNN_EVAL_K = 5


def q_knn_label_eval(spark, sf_dir):
    """kNN classification eval — the embedding-quality probe every vector
    store runs: predict each vector's label as the majority label of its
    {KNN_EVAL_K} exact nearest neighbors (tie → lowest label), score
    against the declared label, report per-label accuracy. Low kNN
    accuracy on a label = that class is not linearly separated in
    embedding space — the signal that decides whether cluster-based
    curation (SemDeDup, prune plans) can be trusted for it.

    Plan: the neighbor relation IS the gated blocked-GEMM kNN kernel
    (similarity.knn_graph — vectors shuffle once into packed blocks);
    everything after is id+label joins (labels ride integer columns,
    vectors never shuffle again), one vote aggregate, one
    WindowGroupLimit argmax, one 4-row accuracy rollup.

    Scale path: the gate runs the EXACT graph tier (O(n²) flops by
    contract — the small-n audit configuration); at corpus scale run the
    same eval on similarity.knn_graph_ivf's relation via
    :func:`label_eval_from_graph` (identical schema, IVF-manifest-pruned
    flops) — agreement with the exact tier is recall-floor-pinned in
    tests/test_knn.py."""
    g = similarity.knn_graph(_emb(spark, sf_dir), k=KNN_EVAL_K)
    return label_eval_from_graph(g, _emb(spark, sf_dir))


def label_eval_from_graph(g, emb):
    """Per-label kNN accuracy from ANY (id, nbr, cosine) neighbor
    relation — exact (similarity.knn_graph) and IVF-manifest
    (similarity.knn_graph_ivf) tiers share this consumer, so switching
    tiers at scale is a one-argument change, not a rewrite."""
    from pyspark.sql import Window

    e = emb.select("vec_id", "label")
    lab = (g.join(e.select(F.col("vec_id").alias("nbr"),
                           F.col("label").alias("nbr_label")), "nbr")
            .join(e.select(F.col("vec_id").alias("id"),
                           F.col("label").alias("true_label")), "id"))
    votes = (lab.groupBy("id", "true_label", "nbr_label")
                .agg(F.count(F.lit(1)).alias("v")))
    w = Window.partitionBy("id").orderBy(F.desc("v"), F.asc("nbr_label"))
    pred = (votes.withColumn("rn", F.row_number().over(w))
                 .where(F.col("rn") == 1))
    hit = (F.col("nbr_label") == F.col("true_label")).cast("long")
    return (pred.groupBy(F.col("true_label").cast("long").alias("label"))
                .agg(F.count(F.lit(1)).alias("n_vectors"),
                     F.sum(hit).alias("n_correct"),
                     F.round(F.sum(hit) / F.count(F.lit(1)), 6)
                      .alias("knn_accuracy")))


SQL_KNN_LABEL_EVAL = f"""
WITH pairs AS (
  SELECT a.vec_id AS id, a.label AS true_label,
         b.vec_id AS nbr, b.label AS nbr_label,
         round(list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]), 6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
), knn AS (
  SELECT id, true_label, nbr_label FROM (
    SELECT id, true_label, nbr_label,
           row_number() OVER (PARTITION BY id
                              ORDER BY cosine DESC, nbr) AS rn
    FROM pairs) WHERE rn <= {KNN_EVAL_K}
), votes AS (
  SELECT id, true_label, nbr_label, count(*) AS v
  FROM knn GROUP BY 1, 2, 3
), pred AS (
  SELECT id, true_label, nbr_label FROM (
    SELECT id, true_label, nbr_label,
           row_number() OVER (PARTITION BY id
                              ORDER BY v DESC, nbr_label) AS rn
    FROM votes) WHERE rn = 1
)
SELECT CAST(true_label AS BIGINT) AS label,
       count(*) AS n_vectors,
       CAST(sum(CASE WHEN nbr_label = true_label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       round(sum(CASE WHEN nbr_label = true_label THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS knn_accuracy
FROM pred GROUP BY 1
"""


# ------------------------------------------------- IVF-pruned kNN graph

KNN_IVF_PROBE = 3

#: staged IVF indexes, corpus path -> ((stamp, k, iters), store dir) —
#: see _staged_ivf
_IVF_INDEXES: dict[str, tuple[tuple, str]] = {}
_IVF_SWEEP_REGISTERED = False


def _staged_ivf(spark, sf_dir) -> str:
    """Process-scoped STAGED IVF index over the embeddings corpus —
    fitted ONCE per corpus (the `_staged_pair_table` pattern) and
    materialized into the SAME generation-pointer cell store every
    other IVF consumer uses (similarity.materialize_ivf_index: the
    ``batch=base/cell_id=K`` layout with ``_centroids.json`` and the
    atomic ``_generation`` pointer). ONE index lifecycle: ann probes
    (ivf_topk_from_index), appends (append_to_ivf_index) and the graph
    builds here all resolve the same store, so a graph build sees every
    batch appended before it — pinned in tests/test_knn.py. Returns the
    store's root directory.

    In production the k-means index is fitted and persisted once, then
    every kNN-graph / mutual-kNN build pays only the manifest-pruned
    GEMM; the fit-from-scratch cost stays visible in its own row
    (`kmeans_embeddings` IS the fit benchmark). Keyed by the corpus
    content stamp so a regenerated corpus re-fits — the superseded
    store is deleted on the stamp miss, not left until exit; tempdirs
    still standing are swept at interpreter exit."""
    import atexit
    import os
    import shutil
    import tempfile

    from photon_spark.functions import similarity
    from photon_spark.functions.clustering import kmeans_fit
    from photon_spark.pair_cache import _corpus_stamp
    from photon_spark.queries_curation import KM_ITERS, KM_K

    global _IVF_SWEEP_REGISTERED
    corpus = os.path.join(os.path.abspath(sf_dir), "embeddings.parquet")
    key = (_corpus_stamp(corpus), KM_K, KM_ITERS)
    got = _IVF_INDEXES.get(corpus)
    if got is not None and got[0] == key:
        return got[1]
    if got is not None:
        # corpus regenerated in place: evict the superseded store NOW
        shutil.rmtree(got[1], ignore_errors=True)
        del _IVF_INDEXES[corpus]
    if not _IVF_SWEEP_REGISTERED:
        # a flag, not an "is the dict empty" check — a failed first fit
        # must not re-register a duplicate handler on the next call
        atexit.register(lambda: [shutil.rmtree(p, ignore_errors=True)
                                 for _, p in _IVF_INDEXES.values()])
        _IVF_SWEEP_REGISTERED = True
    base = tempfile.mkdtemp(prefix="photon_ivf_idx_")
    # sweep the tempdir if the fit/write raises — the atexit sweep
    # only covers directories that made it into _IVF_INDEXES
    try:
        assigned, cents = kmeans_fit(_emb(spark, sf_dir), k=KM_K,
                                     iters=KM_ITERS)
        similarity.materialize_ivf_index(
            None, base,
            cents=[(i, [float(x) for x in c])
                   for i, c in enumerate(cents)],
            assigned=assigned.withColumnRenamed("cluster_id", "cell_id"))
    except BaseException:
        shutil.rmtree(base, ignore_errors=True)
        raise
    _IVF_INDEXES[corpus] = (key, base)
    return base


def q_knn_graph_ivf(spark, sf_dir):
    """Approximate kNN graph over the IVF-pruned block-pair manifest
    (cells = the deterministic k-means of kmeans_embeddings, per-cell
    n_probe most-similar cells) — the 100 TB form of knn_graph: the
    GEMM task count drops from n_cells²/2 to ~n_cells·n_probe while the
    kernel (margin screen + JVM sequential re-verify) is unchanged.
    The index comes pre-fitted from the staged per-corpus store
    (`_staged_ivf` — fit once, build many; the fit cost is its own row,
    `kmeans_embeddings`), and the build reads the store's LIVE
    generation (similarity.knn_graph_from_index), so vectors appended
    through append_to_ivf_index appear in later graph builds — the
    probe/append/graph consumers share one index. Deterministic
    end-to-end, so the oracle rebuilds the identical manifest and graph
    in SQL. Recall vs the exact graph is pinned in tests."""
    return similarity.knn_graph_from_index(
        spark, _staged_ivf(spark, sf_dir), k=KNN_K,
        n_probe=KNN_IVF_PROBE)


def _sql_knn_graph_ivf() -> str:
    from photon_spark.queries_curation import _km_ctes
    return f"""
WITH {_km_ctes()},
cn AS (
  SELECT cl, list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
           AS nv
  FROM c2
),
man AS (
  SELECT DISTINCT least(ca, cb) AS lo, greatest(ca, cb) AS hi
  FROM (
    SELECT a.cl AS ca, b.cl AS cb,
           row_number() OVER (
             PARTITION BY a.cl
             ORDER BY round(list_dot_product(a.nv, b.nv), 6) DESC, b.cl
           ) AS rn
    FROM cn a CROSS JOIN cn b)
  WHERE rn <= {KNN_IVF_PROBE}
),
cand AS (
  SELECT x.vec_id AS id, y.vec_id AS nbr
  FROM a2 x JOIN a2 y ON x.vec_id <> y.vec_id
  JOIN man m ON least(x.cl, y.cl) = m.lo AND greatest(x.cl, y.cl) = m.hi
),
scored AS (
  SELECT c.id, c.nbr,
         round(list_cosine_similarity(e1.embedding::DOUBLE[],
                                      e2.embedding::DOUBLE[]), 6) AS cosine
  FROM cand c
  JOIN embeddings e1 ON c.id = e1.vec_id
  JOIN embeddings e2 ON c.nbr = e2.vec_id
)
SELECT id, nbr, cosine FROM (
  SELECT id, nbr, cosine,
         row_number() OVER (PARTITION BY id
                            ORDER BY cosine DESC, nbr) AS rn
  FROM scored)
WHERE rn <= {KNN_K}
"""


def q_mutual_knn_pairs_ivf(spark, sf_dir):
    """MUTUAL-kNN over the IVF-MANIFEST graph — the PRODUCTION tier of
    mutual_knn_pairs: the directed kNN relation comes from
    similarity.knn_graph_ivf (GEMM tasks pruned to the per-cell n_probe
    most-similar cells — ~n_cells·n_probe tasks instead of n_cells²/2),
    and the mutual filter is the identical one-hash-join-on-the-
    reversed-pair over that k·n manifest. This is the one-argument tier
    swap label_eval_from_graph documents, now hash-gated on the scale
    path itself: at 100 TB the flops are manifest-bounded and the
    mutual join input is k·n rows, never the corpus².

    Recall of the IVF tier vs the exact tier is floor-pinned in
    tests/test_knn.py; here the oracle REBUILDS the same deterministic
    manifest + graph in SQL, so the hash gate proves the pruned tier's
    mutual symmetrization value-for-value."""
    g = similarity.knn_graph_from_index(
        spark, _staged_ivf(spark, sf_dir), k=KNN_K,
        n_probe=KNN_IVF_PROBE)
    return _mutual_pairs_from_graph(g)


def _mutual_pairs_from_graph(g):
    """Mutual symmetrization of ANY (id, nbr, cosine) kNN relation —
    exact (knn_graph) and IVF (knn_graph_ivf) tiers share this consumer
    exactly as label_eval_from_graph is shared by the eval rows."""
    from pyspark.sql import Window
    w = Window.partitionBy("id").orderBy(F.desc("cosine"), F.asc("nbr"))
    r = g.withColumn("rank", F.row_number().over(w).cast("long"))
    fwd = (r.where(F.col("id") < F.col("nbr"))
            .select(F.col("id").alias("lo_id"), F.col("nbr").alias("hi_id"),
                    "cosine", F.col("rank").alias("lo_rank")))
    rev = (r.where(F.col("id") > F.col("nbr"))
            .select(F.col("nbr").alias("lo_id"), F.col("id").alias("hi_id"),
                    F.col("rank").alias("hi_rank")))
    return fwd.join(rev, ["lo_id", "hi_id"]).select(
        "lo_id", "hi_id", "cosine", "lo_rank", "hi_rank")


def _sql_mutual_knn_pairs_ivf() -> str:
    from photon_spark.queries_curation import _km_ctes
    return f"""
WITH {_km_ctes()},
cn AS (
  SELECT cl, list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
           AS nv
  FROM c2
),
man AS (
  SELECT DISTINCT least(ca, cb) AS lo, greatest(ca, cb) AS hi
  FROM (
    SELECT a.cl AS ca, b.cl AS cb,
           row_number() OVER (
             PARTITION BY a.cl
             ORDER BY round(list_dot_product(a.nv, b.nv), 6) DESC, b.cl
           ) AS rn
    FROM cn a CROSS JOIN cn b)
  WHERE rn <= {KNN_IVF_PROBE}
),
cand AS (
  SELECT x.vec_id AS id, y.vec_id AS nbr
  FROM a2 x JOIN a2 y ON x.vec_id <> y.vec_id
  JOIN man m ON least(x.cl, y.cl) = m.lo AND greatest(x.cl, y.cl) = m.hi
),
scored AS (
  SELECT c.id, c.nbr,
         round(list_cosine_similarity(e1.embedding::DOUBLE[],
                                      e2.embedding::DOUBLE[]), 6) AS cosine
  FROM cand c
  JOIN embeddings e1 ON c.id = e1.vec_id
  JOIN embeddings e2 ON c.nbr = e2.vec_id
),
knn AS (
  SELECT id, nbr, cosine, rn FROM (
    SELECT id, nbr, cosine,
           row_number() OVER (PARTITION BY id
                              ORDER BY cosine DESC, nbr) AS rn
    FROM scored)
  WHERE rn <= {KNN_K}
)
SELECT f.id AS lo_id, f.nbr AS hi_id, f.cosine,
       CAST(f.rn AS BIGINT) AS lo_rank, CAST(r.rn AS BIGINT) AS hi_rank
FROM knn f JOIN knn r ON r.id = f.nbr AND r.nbr = f.id
WHERE f.id < f.nbr
"""


#: palette fixture size for the gated indexed-color decode relation
PAL_PNG_N = 48


def q_image_palette_decode_stats(spark, sf_dir):
    """REAL indexed-color decode under the hash gate: per-image pixel
    statistics of PALETTE PNGs (color type 3 — the third and last
    stdlib-decodable PNG color family after grey and RGB) from
    actually-dereferenced palette pixels. The fixture filters the INDEX
    stream with all five PNG scanline filters, so a decoder that
    dereferences before unfiltering (or unfilters the colors) cannot
    match; the oracle re-derives every statistic from the closed forms
    (index of pixel (x,y) of image i = (i + 3y + 5x) mod n_pal with
    n_pal = 16 + i mod 17; palette entry k = ((7k+3i) mod 256,
    (11k+5i) mod 256, (13k+2i) mod 256); integer Rec.601 luma) entirely
    in SQL — a hash match proves inflate -> unfilter -> palette
    dereference -> luma reproduces ground truth value-for-value.
    Map-only Arrow pass; blobs never shuffle."""
    media = multimodal.synthesize_palette_png_media(spark, n=PAL_PNG_N)
    return multimodal.image_decode_features(media)


SQL_IMAGE_PALETTE_DECODE_STATS = f"""
WITH m AS (
  SELECT i, 16 + i % 9 AS w, 12 + i % 7 AS h, 16 + i % 17 AS n_pal
  FROM range({PAL_PNG_N}) t(i)
), px AS (
  SELECT m.i, m.w, m.h,
         (m.i + 3 * (g.j // m.w) + 5 * (g.j % m.w)) % m.n_pal AS k
  FROM m CROSS JOIN generate_series(0, 24 * 18 - 1) g(j)
  WHERE g.j < m.w * m.h
), luma AS (
  SELECT i, w, h,
         (299 * ((7 * k + 3 * i) % 256)
          + 587 * ((11 * k + 5 * i) % 256)
          + 114 * ((13 * k + 2 * i) % 256)) // 1000 AS v
  FROM px
)
SELECT i AS media_id, CAST(w AS INTEGER) AS decoded_w,
       CAST(h AS INTEGER) AS decoded_h,
       count(*) AS n_pixels, CAST(sum(v) AS BIGINT) AS luma_sum,
       CAST(min(v) AS INTEGER) AS min_luma,
       CAST(max(v) AS INTEGER) AS max_luma,
       round(CAST(sum(v) AS BIGINT) / (count(*) * 1.0), 6) AS mean_luma
FROM luma GROUP BY i, w, h
"""


#: GIF fixture size for the gated real-decode relation
GIF_N = 48


def q_image_gif_decode_stats(spark, sf_dir):
    """REAL GIF decode under the hash gate: per-image pixel statistics
    of single-frame GIFs from actually LZW-decoded, (de)interlaced,
    palette-dereferenced pixels. The fixture's palettes are SMALL
    (4–16 entries), so the LZW stream starts at 3–4 bit codes and the
    variable code width grows mid-stream — a decoder that fixes the
    width (or desyncs the growth rule from the table size) cannot
    match; odd rows are interlaced, so the four-pass row reorder is
    exercised too. The oracle re-derives every statistic from the
    closed forms (index of pixel (x,y) of image i = (2i + y + 3x) mod
    n_pal with n_pal = 4 + i mod 13; palette entry k = ((5k+7i) mod
    256, (9k+3i) mod 256, (11k+4i) mod 256); integer Rec.601 luma)
    entirely in SQL — a hash match proves LZW -> deinterlace ->
    palette dereference -> luma reproduces ground truth
    value-for-value. Map-only Arrow pass; blobs never shuffle."""
    media = multimodal.synthesize_gif_media(spark, n=GIF_N)
    return multimodal.image_decode_features(media)


SQL_IMAGE_GIF_DECODE_STATS = f"""
WITH m AS (
  SELECT i, 16 + i % 9 AS w, 12 + i % 7 AS h, 4 + i % 13 AS n_pal
  FROM range({GIF_N}) t(i)
), px AS (
  SELECT m.i, m.w, m.h,
         (2 * m.i + (g.j // m.w) + 3 * (g.j % m.w)) % m.n_pal AS k
  FROM m CROSS JOIN generate_series(0, 24 * 18 - 1) g(j)
  WHERE g.j < m.w * m.h
), luma AS (
  SELECT i, w, h,
         (299 * ((5 * k + 7 * i) % 256)
          + 587 * ((9 * k + 3 * i) % 256)
          + 114 * ((11 * k + 4 * i) % 256)) // 1000 AS v
  FROM px
)
SELECT i AS media_id, CAST(w AS INTEGER) AS decoded_w,
       CAST(h AS INTEGER) AS decoded_h,
       count(*) AS n_pixels, CAST(sum(v) AS BIGINT) AS luma_sum,
       CAST(min(v) AS INTEGER) AS min_luma,
       CAST(max(v) AS INTEGER) AS max_luma,
       round(CAST(sum(v) AS BIGINT) / (count(*) * 1.0), 6) AS mean_luma
FROM luma GROUP BY i, w, h
"""


#: mixed-codec fixture size for the gated fallback-audit relation
MIX_PNG_N = 48
#: JPEG fixture size for the gated real-decode relation
JPEG_N = 48


def q_image_jpeg_decode_stats(spark, sf_dir):
    """REAL baseline-JPEG decode under the hash gate: per-image pixel
    statistics of SOF0 JPEGs from actually entropy-decoded, dequantized,
    IDCT'd (and for odd rows YCbCr-inverted) pixels. The fixture is the
    flat-8x8-tile closed form with all-ones quantization — the one
    configuration where a LOSSY codec round-trips byte-exactly (a flat
    block's DCT is a lone integer DC coefficient), so the oracle
    re-derives every decoded value from ``(37·i + 11·(y div 8) +
    5·(x div 8)) mod 256`` entirely in SQL. Even rows are
    single-component greyscale; odd rows run the FULL 3-component
    YCbCr path with R=G=B content (Cb/Cr quantize to exactly 128, so
    the integer Rec.601 luma equals the tile value). A hash match
    proves Huffman -> dequant -> de-zigzag -> IDCT -> color transform
    reproduces ground truth value-for-value. Map-only Arrow pass;
    blobs never shuffle."""
    media = multimodal.synthesize_jpeg_media(spark, n=JPEG_N)
    return multimodal.image_decode_features(media)


SQL_IMAGE_JPEG_DECODE_STATS = f"""
WITH m AS (
  SELECT i, 8 * (2 + i % 3) AS w, 8 * (2 + i % 2) AS h
  FROM range({JPEG_N}) t(i)
), luma AS (
  SELECT m.i, m.w, m.h,
         (37 * m.i + 11 * ((g.j // m.w) // 8)
          + 5 * ((g.j % m.w) // 8)) % 256 AS v
  FROM m CROSS JOIN generate_series(0, 32 * 24 - 1) g(j)
  WHERE g.j < m.w * m.h
)
SELECT i AS media_id, CAST(w AS INTEGER) AS decoded_w,
       CAST(h AS INTEGER) AS decoded_h,
       count(*) AS n_pixels, CAST(sum(v) AS BIGINT) AS luma_sum,
       CAST(min(v) AS INTEGER) AS min_luma,
       CAST(max(v) AS INTEGER) AS max_luma,
       round(CAST(sum(v) AS BIGINT) / (count(*) * 1.0), 6) AS mean_luma
FROM luma GROUP BY i, w, h
"""


def q_media_decode_fallback_audit(spark, sf_dir):
    """PER-ROW DECODE DEGRADE under the hash gate — the mixed-codec
    reality check: a corpus interleaving real PNGs, CORRUPT PNGs
    (valid signature, junk body — the decoder RAISES, exercising the
    except-ValueError degrade, not just the unknown-signature
    short-circuit), undecodable fake blobs, REAL baseline JPEGs
    (decoded for real since round 9 — these rows used to certify the
    byte proxy), CORRUPT JPEGs, REAL GIFs (LZW + interlace +
    palette dereference) and CORRUPT GIFs must come through the
    feature pass with REAL decoded luma on the good rows and the
    documented deterministic byte-mean proxy on every bad class, one
    row per input, no job failure. The oracle re-derives ALL SEVEN
    paths closed-form (PNG pixel formula; JPEG tile formula; GIF
    palette formula; signature+junk byte formulas; raw byte
    formula), so a hash match
    proves the router sends each row down the right path and no path
    contaminates another — the contract that lets a 100 TB run
    survive a bad object without losing the partition. Map-only
    Arrow pass."""
    media = multimodal.synthesize_mixed_media(spark, n=MIX_PNG_N)
    feats = multimodal.image_features(media, target_size=32)
    return (feats.join(media.select("media_id", "mime"), "media_id")
                 .select("media_id", "mime", "mean_luma"))


#: sum of the 8 PNG signature bytes (\\x89 P N G \\r \\n \\x1a \\n)
_PNG_SIG_SUM, _PNG_SIG_LEN = 425, 8
#: sum/length of the 2 JPEG SOI bytes (\\xff \\xd8)
_JPEG_SOI_SUM, _JPEG_SOI_LEN = 471, 2
#: sum/length of the 6 GIF89a signature bytes (G I F 8 9 a)
_GIF_SIG_SUM, _GIF_SIG_LEN = 424, 6

SQL_MEDIA_DECODE_FALLBACK_AUDIT = f"""
WITH m AS (
  SELECT i, i % 7 AS cls, 16 + i % 9 AS w, 12 + i % 7 AS h,
         256 + (i % 5) * 64 AS len,
         8 * (2 + i % 3) AS jw, 8 * (2 + i % 2) AS jh,
         256 + (i % 11) * 32 AS jlen,
         4 + i % 13 AS n_pal,
         256 + (i % 5) * 32 AS glen
  FROM range({MIX_PNG_N}) t(i)
), png AS (
  SELECT m.i,
         round(avg((31 * m.i + 7 * (g.j // m.w) + 3 * (g.j % m.w))
                   % 256), 6) AS mean_luma
  FROM m CROSS JOIN generate_series(0, 24 * 18 - 1) g(j)
  WHERE m.cls = 0 AND g.j < m.w * m.h
  GROUP BY 1
), corrupt AS (
  -- byte mean over signature + junk: the except-ValueError degrade
  SELECT m.i,
         round((CAST({_PNG_SIG_SUM} AS BIGINT)
                + sum((m.i * 31 + g.j * 7) % 256)) * 1.0
               / ({_PNG_SIG_LEN} + m.len), 6) AS mean_luma
  FROM m CROSS JOIN generate_series(0, 511) g(j)
  WHERE m.cls = 1 AND g.j < m.len
  GROUP BY m.i, m.len
), fake AS (
  SELECT m.i,
         round(avg((m.i * 31 + g.j * 7) % 256), 6) AS mean_luma
  FROM m CROSS JOIN generate_series(0, 511) g(j)
  WHERE m.cls = 2 AND g.j < m.len
  GROUP BY 1
), jpeg AS (
  -- REAL decode: the flat-tile closed form (grey and YCbCr rows agree)
  SELECT m.i,
         round(avg((37 * m.i + 11 * ((g.j // m.jw) // 8)
                    + 5 * ((g.j % m.jw) // 8)) % 256), 6) AS mean_luma
  FROM m CROSS JOIN generate_series(0, 32 * 24 - 1) g(j)
  WHERE m.cls = 3 AND g.j < m.jw * m.jh
  GROUP BY 1
), jbad AS (
  SELECT m.i,
         round((CAST({_JPEG_SOI_SUM} AS BIGINT)
                + sum((m.i * 29 + g.j * 13) % 256)) * 1.0
               / ({_JPEG_SOI_LEN} + m.jlen), 6) AS mean_luma
  FROM m CROSS JOIN generate_series(0, 575) g(j)
  WHERE m.cls = 4 AND g.j < m.jlen
  GROUP BY m.i, m.jlen
), gif AS (
  -- REAL decode: palette dereference of the GIF index closed form
  SELECT i, round(avg(v), 6) AS mean_luma FROM (
    SELECT m.i,
           (299 * ((5 * ((2 * m.i + (g.j // m.w) + 3 * (g.j % m.w))
                         % m.n_pal) + 7 * m.i) % 256)
            + 587 * ((9 * ((2 * m.i + (g.j // m.w) + 3 * (g.j % m.w))
                           % m.n_pal) + 3 * m.i) % 256)
            + 114 * ((11 * ((2 * m.i + (g.j // m.w) + 3 * (g.j % m.w))
                            % m.n_pal) + 4 * m.i) % 256)) // 1000 AS v
    FROM m CROSS JOIN generate_series(0, 24 * 18 - 1) g(j)
    WHERE m.cls = 5 AND g.j < m.w * m.h
  ) GROUP BY 1
), gbad AS (
  SELECT m.i,
         round((CAST({_GIF_SIG_SUM} AS BIGINT)
                + sum((m.i * 17 + g.j * 11) % 256)) * 1.0
               / ({_GIF_SIG_LEN} + m.glen), 6) AS mean_luma
  FROM m CROSS JOIN generate_series(0, 511) g(j)
  WHERE m.cls = 6 AND g.j < m.glen
  GROUP BY m.i, m.glen
)
SELECT i AS media_id, 'image/png' AS mime, mean_luma FROM png
UNION ALL
SELECT i, 'image/png-bad', mean_luma FROM corrupt
UNION ALL
SELECT i, 'image/fake', mean_luma FROM fake
UNION ALL
SELECT i, 'image/jpeg', mean_luma FROM jpeg
UNION ALL
SELECT i, 'image/jpeg-bad', mean_luma FROM jbad
UNION ALL
SELECT i, 'image/gif', mean_luma FROM gif
UNION ALL
SELECT i, 'image/gif-bad', mean_luma FROM gbad
"""


QUERIES = {
    "text_profile": q_text_profile,
    "lang_quality_by_source": q_lang_quality_by_source,
    "dedup_exact_stats": q_dedup_exact_stats,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "dedup_clusters": q_dedup_clusters,
    "dedup_cluster_bcubed": q_dedup_cluster_bcubed,
    "minhash_near_dups": q_minhash_near_dups,
    "simhash_buckets": q_simhash_buckets,
    "ann_topk_bruteforce": q_ann_topk_bruteforce,
    "embedding_near_dup_pairs": q_embedding_near_dup_pairs,
    "ann_topk_lsh": q_ann_topk_lsh,
    "ann_topk_ivf": q_ann_topk_ivf,
    "embedding_quantize_stats": q_embedding_quantize_stats,
    "media_stats": q_media_stats,
    "frame_sample_stats": q_frame_sample_stats,
    "repetition_profile": q_repetition_profile,
    "winnow_overlap_pairs": q_winnow_overlap_pairs,
    "tfidf_top_terms": q_tfidf_top_terms,
    "doc_ngram_novelty": q_doc_ngram_novelty,
    "media_phash_near_dups": q_media_phash_near_dups,
    "media_keep_best": q_media_keep_best,
    "ann_topk_pq": q_ann_topk_pq,
    "ivf_pq_topk": q_ivf_pq_topk,
    "knn_graph": q_knn_graph,
    "mutual_knn_pairs": q_mutual_knn_pairs,
    "mutual_knn_pairs_ivf": q_mutual_knn_pairs_ivf,
    "knn_label_eval": q_knn_label_eval,
    "audio_window_energy": q_audio_window_energy,
    "image_decode_stats": q_image_decode_stats,
    "image_resize_stats": q_image_resize_stats,
    "image_palette_decode_stats": q_image_palette_decode_stats,
    "image_gif_decode_stats": q_image_gif_decode_stats,
    "media_decode_fallback_audit": q_media_decode_fallback_audit,
    "image_jpeg_decode_stats": q_image_jpeg_decode_stats,
    "knn_graph_ivf": q_knn_graph_ivf,
    "dup_graph_degree": q_dup_graph_degree,
}

ORACLES = {
    "text_profile": SQL_TEXT_PROFILE,
    "lang_quality_by_source": SQL_LANG_QUALITY_BY_SOURCE,
    "dedup_exact_stats": SQL_DEDUP_EXACT_STATS,
    "ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
    "dedup_clusters": SQL_DEDUP_CLUSTERS.replace("{pairs}", SQL_MINHASH_NEAR_DUPS),
    "dedup_cluster_bcubed": _sql_dedup_cluster_bcubed().replace(
        "{comp_ctes}", SQL_COMP_CTES.replace("{pairs}",
                                             SQL_MINHASH_NEAR_DUPS)),
    "minhash_near_dups": SQL_MINHASH_NEAR_DUPS,
    "simhash_buckets": SQL_SIMHASH_BUCKETS,
    "ann_topk_bruteforce": SQL_ANN_TOPK_BRUTEFORCE,
    "embedding_near_dup_pairs": SQL_EMBEDDING_NEAR_DUP_PAIRS,
    "media_stats": SQL_MEDIA_STATS,
    "embedding_quantize_stats": SQL_EMBEDDING_QUANTIZE_STATS,
    "frame_sample_stats": SQL_FRAME_SAMPLE_STATS,
    "repetition_profile": SQL_REPETITION_PROFILE,
    "winnow_overlap_pairs": SQL_WINNOW_OVERLAP_PAIRS,
    "tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
    "doc_ngram_novelty": SQL_DOC_NGRAM_NOVELTY,
    "media_phash_near_dups": SQL_MEDIA_PHASH_NEAR_DUPS,
    "media_keep_best": SQL_MEDIA_KEEP_BEST,
    # ANN oracles: approximate operators, but their randomness is
    # md5-derived / first-k deterministic, so DuckDB reproduces them exactly.
    "ann_topk_lsh": SQL_ANN_TOPK_LSH,
    "ann_topk_ivf": SQL_ANN_TOPK_IVF,
    "ann_topk_pq": _sql_ann_topk_pq(),
    "ivf_pq_topk": _sql_ivf_pq_topk(),
    "knn_graph": SQL_KNN_GRAPH,
    "mutual_knn_pairs": SQL_MUTUAL_KNN_PAIRS,
    "mutual_knn_pairs_ivf": _sql_mutual_knn_pairs_ivf(),
    "knn_label_eval": SQL_KNN_LABEL_EVAL,
    "audio_window_energy": SQL_AUDIO_WINDOW_ENERGY,
    "image_decode_stats": SQL_IMAGE_DECODE_STATS,
    "image_resize_stats": SQL_IMAGE_RESIZE_STATS,
    "image_palette_decode_stats": SQL_IMAGE_PALETTE_DECODE_STATS,
    "image_gif_decode_stats": SQL_IMAGE_GIF_DECODE_STATS,
    "media_decode_fallback_audit": SQL_MEDIA_DECODE_FALLBACK_AUDIT,
    "image_jpeg_decode_stats": SQL_IMAGE_JPEG_DECODE_STATS,
    "knn_graph_ivf": _sql_knn_graph_ivf(),
    "dup_graph_degree": SQL_DUP_GRAPH_DEGREE.replace(
        "{pairs}", SQL_MINHASH_NEAR_DUPS),
}
