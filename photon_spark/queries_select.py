"""Corpus selection & governance queries — the decision stage of an LLM
data pipeline, after mining signals exist: which doc survives a near-dup
cluster (keep-best canonical selection), which val docs leak into train
(split leakage audit), which new docs duplicate the existing corpus
(incremental dedup against an LSH band index), and a broadcast-free
decontamination path (Bloom-filter probe membership).

Reference anchor: photon has no analytics operators (SURVEY §2.8); these
are driver-mandated north-star extensions layered on the `documents`
table, composed from the gate-proven dedup/text kernels.

Parity rules (queries.py float policy): quality is compared as 6dp
integers (the lang_quality fix); jaccard is rounded to 6dp before any
threshold or max; everything else is integer/string work.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from photon_spark.functions import dedup, text
from photon_spark.queries_northstar import (SQL_MINHASH_NEAR_DUPS,
                                            SQL_TEXT_PROFILE, _NUM_HASHES,
                                            _BANDS, _SQL_NORM, _SQL_GRAMS)
from photon_spark.queries_pipeline import BENCH_MOD, CONTAM_N
from photon_spark.relations import read_base as _read_base

#: near-dup threshold shared by every miner in this module (matches the
#: minhash_near_dups gate query)
NEAR_DUP_T = 0.7

#: md5-hex split: doc is validation iff md5('split:'||doc_id) < '1a'
#: (≈ 26/256 ≈ 10.2%) — same portable membership idiom as
#: queries_pipeline.SAMPLE_HEX_LT
VAL_HEX_LT = "1a"

#: incremental dedup: docs with doc_id % NEW_MOD == NEW_REM play the
#: "newly arrived batch"; the rest are the existing corpus
NEW_MOD, NEW_REM = 10, 7

#: Bloom decontamination: 2^16-bit filter as 2048 32-bit words (stored in
#: BIGINTs so shifts never overflow on either engine), K=3 md5-derived
#: probes per gram
BLOOM_BITS = 1 << 16
BLOOM_WORD_BITS = 32
BLOOM_WORDS = BLOOM_BITS // BLOOM_WORD_BITS
BLOOM_K = 3


def _docs(spark, sf_dir):
    return _read_base(spark, sf_dir, "documents")


def _near_dup_pairs(spark, sf_dir):
    # Mined once per corpus via the shared pair table (pair_cache):
    # keep-best / leakage / cross-source are decisions OVER the pair
    # relation, not re-mines of it.
    from photon_spark import pair_cache
    return pair_cache.near_dup_pairs(
        spark, sf_dir, num_hashes=_NUM_HASHES, bands=_BANDS,
        threshold=NEAR_DUP_T)


# --------------------------------------------------- keep-best canonical

def q_dedup_keep_best(spark, sf_dir):
    """Canonical-representative selection: cluster the MinHash-LSH
    near-dups, keep exactly ONE doc per cluster — the highest quality
    (6dp-int compared; ties → lowest doc_id) — and report the per-source
    keep/drop audit. This is the decision step every fuzzy-dedup pipeline
    ends with: mining pairs is not dedup until one survivor is chosen.

    Scale shape: pairs/labels are minuscule next to the corpus, so the
    label join back to documents is effectively broadcast; the per-cluster
    argmax shuffles only (cluster_id, q_int, doc_id) triples — text never
    moves. Singletons (docs in no cluster) are their own cluster and are
    always kept, via coalesce rather than ever materializing them as
    graph nodes."""
    d = _docs(spark, sf_dir)
    pairs = _near_dup_pairs(spark, sf_dir)
    labels = dedup.dup_clusters(pairs)
    q_int = F.round(F.col("quality") * 1e6).cast("long").alias("q_int")
    prof = text.text_profile(d).select("doc_id", q_int)
    dd = (d.select("doc_id", "source")
           .join(labels.withColumnRenamed("id", "doc_id"), "doc_id", "left")
           .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
           .join(prof, "doc_id"))
    # argmax by (quality, then lowest id): max over (q_int, -doc_id) structs
    best = (dd.groupBy("cluster_id")
              .agg(F.max(F.struct(F.col("q_int"),
                                  (-F.col("doc_id")).alias("neg_id")))
                    .alias("b"))
              .select("cluster_id", (-F.col("b.neg_id")).alias("keep_id")))
    kept = F.col("doc_id") == F.col("keep_id")
    return dedup._own_cache(
        dd.join(best, "cluster_id")
          .groupBy("source")
          .agg(F.count(F.lit(1)).alias("n_docs"),
               F.sum(kept.cast("long")).alias("n_kept"),
               F.sum((~kept).cast("long")).alias("n_dropped"),
               F.round(F.sum(F.when(kept, F.col("q_int")).otherwise(0))
                       / 1e6, 6).alias("kept_quality_sum"),
               F.sum(F.when(kept, F.col("doc_id")).otherwise(0))
                .cast("long").alias("kept_id_sum")),
        getattr(pairs, "_photon_cached", []))


SQL_DEDUP_KEEP_BEST = f"""
WITH RECURSIVE pairs_src AS ({SQL_MINHASH_NEAR_DUPS}),
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
prof AS (
  SELECT doc_id, CAST(round(quality * 1000000) AS BIGINT) AS q_int
  FROM ({SQL_TEXT_PROFILE})
),
lab AS (
  SELECT d.doc_id, d.source,
         coalesce(c.cluster_id, d.doc_id) AS cluster_id, p.q_int
  FROM documents d
  LEFT JOIN comp c ON d.doc_id = c.id
  JOIN prof p ON d.doc_id = p.doc_id
),
best AS (
  SELECT cluster_id, doc_id AS keep_id FROM (
    SELECT cluster_id, doc_id,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY q_int DESC, doc_id ASC) AS rn
    FROM lab) WHERE rn = 1
)
SELECT l.source, count(*) AS n_docs,
       CAST(sum(CASE WHEN l.doc_id = b.keep_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(sum(CASE WHEN l.doc_id = b.keep_id THEN 0 ELSE 1 END) AS BIGINT)
         AS n_dropped,
       round(sum(CASE WHEN l.doc_id = b.keep_id THEN l.q_int ELSE 0 END)
             / 1000000.0, 6) AS kept_quality_sum,
       CAST(sum(CASE WHEN l.doc_id = b.keep_id THEN l.doc_id ELSE 0 END)
            AS BIGINT) AS kept_id_sum
FROM lab l JOIN best b ON l.cluster_id = b.cluster_id
GROUP BY l.source
"""


# --------------------------------------------------- split leakage audit

def _is_val(c):
    return F.md5(F.concat(F.lit("split:"), c.cast("string"))) < VAL_HEX_LT


def q_split_leakage(spark, sf_dir):
    """Train/val split leakage audit: deterministic ~10% hash split, then
    every near-dup pair that CROSSES the split marks its val member as
    leaked (its content is effectively in train). The decontamination
    check eval sets need before any loss is trusted.

    Scale shape: the split predicate is a map-side hash — no membership
    table to join; leakage derives from the already-bounded LSH pair
    relation, symmetrized and filtered, so the audit costs one short
    aggregation beyond the miner."""
    d = _docs(spark, sf_dir)
    pairs = _near_dup_pairs(spark, sf_dir)
    sym = (pairs.select(F.col("lo_id").alias("a"), F.col("hi_id").alias("b"))
                .union(pairs.select(F.col("hi_id").alias("a"),
                                    F.col("lo_id").alias("b"))))
    leaked = (sym.where(_is_val(F.col("a")) & ~_is_val(F.col("b")))
                 .select(F.col("a").alias("doc_id")).distinct()
                 .withColumn("leak", F.lit(1)))
    val_docs = d.where(_is_val(F.col("doc_id"))).select("doc_id", "source")
    leak = F.coalesce(F.col("leak"), F.lit(0))
    return dedup._own_cache(
        val_docs.join(leaked, "doc_id", "left")
                .groupBy("source")
                .agg(F.count(F.lit(1)).alias("n_val"),
                     F.sum(leak).cast("long").alias("n_leaked"),
                     F.round(F.sum(leak) / F.count(F.lit(1)), 6)
                      .alias("leak_rate"),
                     F.sum(F.when(leak == 1, F.col("doc_id"))
                            .otherwise(0)).cast("long")
                      .alias("leaked_id_sum")),
        getattr(pairs, "_photon_cached", []))


SQL_SPLIT_LEAKAGE = f"""
WITH pairs_src AS ({SQL_MINHASH_NEAR_DUPS}),
sym AS (
  SELECT lo_id AS a, hi_id AS b FROM pairs_src
  UNION ALL
  SELECT hi_id AS a, lo_id AS b FROM pairs_src
),
leaked AS (
  SELECT DISTINCT a AS doc_id FROM sym
  WHERE md5('split:' || a::VARCHAR) < '{VAL_HEX_LT}'
    AND md5('split:' || b::VARCHAR) >= '{VAL_HEX_LT}'
)
SELECT d.source, count(*) AS n_val,
       CAST(sum(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_leaked,
       round(sum(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS leak_rate,
       CAST(sum(CASE WHEN l.doc_id IS NOT NULL THEN d.doc_id ELSE 0 END)
            AS BIGINT) AS leaked_id_sum
FROM documents d LEFT JOIN leaked l ON d.doc_id = l.doc_id
WHERE md5('split:' || d.doc_id::VARCHAR) < '{VAL_HEX_LT}'
GROUP BY d.source
"""


# ------------------------------------------------------ split repair plan

def q_split_repair_plan(spark, sf_dir):
    """The DECISION on top of the leakage audit (q_split_leakage
    measures; this repairs), at CLUSTER granularity: a near-dup
    connected component whose members straddle the split is moved to
    train IN FULL — every val member goes, not just the ones with a
    direct train partner. One-hop moving is NOT closed (moving val doc
    B, whose partner C is in train, turns B's other val partner A into
    a fresh leak); whole-cluster moving is closed in one pass — after
    it, no val doc has a near-dup partner outside val, so the eval set
    is leakage-free by construction and no document is discarded.
    Val-only clusters stay in val untouched (val-val duplication leaks
    nothing). Per source: before/after val counts, how many moved, the
    post-repair val fraction, and the moved-id sum (pins WHICH docs
    moved, not just how many).

    Scale shape: the split is a map-side hash; clusters derive from the
    shared pair table (≪ corpus), the has-train flag is one aggregate
    over the labels, and the rollup joins (doc_id, source) against the
    tiny move set."""
    d = _docs(spark, sf_dir)
    pairs = _near_dup_pairs(spark, sf_dir)
    labels = dedup.dup_clusters(pairs)  # (id, cluster_id), members only
    tainted = (labels.where(~_is_val(F.col("id")))
                     .select("cluster_id").distinct())
    moved = (labels.join(tainted, "cluster_id", "left_semi")
                   .where(_is_val(F.col("id")))
                   .select(F.col("id").alias("doc_id"))
                   .withColumn("mv", F.lit(1)))
    mv = F.coalesce(F.col("mv"), F.lit(0))
    is_val = _is_val(F.col("doc_id")).cast("long")
    return dedup._own_cache(
        d.select("doc_id", "source")
         .join(moved, "doc_id", "left")
         .groupBy("source")
         .agg(F.count(F.lit(1)).alias("n_docs"),
              F.sum(is_val).cast("long").alias("n_val_before"),
              F.sum(mv).cast("long").alias("n_moved"),
              (F.sum(is_val) - F.sum(mv)).cast("long").alias("n_val_after"),
              F.round((F.sum(is_val) - F.sum(mv)) / F.count(F.lit(1)), 6)
               .alias("val_frac_after"),
              F.sum(F.when(mv == 1, F.col("doc_id")).otherwise(0))
               .cast("long").alias("moved_id_sum")),
        getattr(pairs, "_photon_cached", []))


SQL_SPLIT_REPAIR_PLAN = f"""
WITH RECURSIVE pairs_src AS ({SQL_MINHASH_NEAR_DUPS}),
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
tainted AS (
  SELECT DISTINCT cluster_id FROM comp
  WHERE md5('split:' || id::VARCHAR) >= '{VAL_HEX_LT}'
),
moved AS (
  SELECT c.id AS doc_id FROM comp c
  JOIN tainted t ON c.cluster_id = t.cluster_id
  WHERE md5('split:' || c.id::VARCHAR) < '{VAL_HEX_LT}'
)
SELECT d.source, count(*) AS n_docs,
       CAST(sum(CASE WHEN md5('split:' || d.doc_id::VARCHAR)
                          < '{VAL_HEX_LT}' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_val_before,
       CAST(sum(CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_moved,
       CAST(sum(CASE WHEN md5('split:' || d.doc_id::VARCHAR)
                          < '{VAL_HEX_LT}' THEN 1 ELSE 0 END)
            - sum(CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_val_after,
       round((sum(CASE WHEN md5('split:' || d.doc_id::VARCHAR)
                            < '{VAL_HEX_LT}' THEN 1 ELSE 0 END)
              - sum(CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END))
             * 1.0 / count(*), 6) AS val_frac_after,
       CAST(sum(CASE WHEN m.doc_id IS NOT NULL THEN d.doc_id ELSE 0 END)
            AS BIGINT) AS moved_id_sum
FROM documents d LEFT JOIN moved m ON d.doc_id = m.doc_id
GROUP BY d.source
"""


# ------------------------------------------------------ incremental dedup

def q_dedup_incremental(spark, sf_dir):
    """Incremental dedup: a newly-arrived batch (doc_id % {NEW_MOD} ==
    {NEW_REM}, ~10%) is checked against the EXISTING corpus through the
    LSH band index — new docs that collide with a corpus doc in any band
    are verified with exact Jaccard; survivors report how many corpus
    near-dups they hit and the best score. This is the day-2 shape of
    dedup at 100 TB: the corpus index is a persisted table bucketed by
    (band, bucket); each incoming batch joins against it without ever
    re-scanning corpus text — only candidate ids fetch their shingles
    for verification.

    Asymmetric by construction: corpus-vs-corpus and new-vs-new pairs are
    never generated (the quadratic bulk the batch miner pays)."""
    d = _docs(spark, sf_dir)
    sh = dedup._shingled(d, "text", "doc_id", 3).persist()
    buckets = dedup.minhash_band_buckets(sh, _NUM_HASHES, _BANDS)
    is_new = (F.col("id") % NEW_MOD) == NEW_REM
    new_b, corp_b = buckets.where(is_new), buckets.where(~is_new)
    cands = (new_b.alias("a")
             .join(corp_b.alias("b"),
                   (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bucket") == F.col("b.bucket")))
             .select(F.col("a.id").alias("new_id"),
                     F.col("b.id").alias("corp_id"))
             .distinct())
    hits = dedup.verify_candidate_pairs(cands, sh, NEAR_DUP_T,
                                        left="new_id", right="corp_id")
    return dedup._own_cache(
        hits.groupBy("new_id")
            .agg(F.count(F.lit(1)).alias("n_corpus_dups"),
                 F.max("jaccard").alias("best_jaccard")),
        [sh])


SQL_DEDUP_INCREMENTAL = f"""
WITH norm AS (
  SELECT doc_id, string_split({_SQL_NORM}, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, {_SQL_GRAMS} AS g FROM norm WHERE len(t) >= 3
), sigs AS (
  SELECT doc_id, g, [{{mins}}] AS sig FROM grams WHERE len(g) > 0
), buckets AS ({{bands}}),
cands AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corp_id
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bucket = b.bucket
   AND a.doc_id % {NEW_MOD} = {NEW_REM} AND b.doc_id % {NEW_MOD} != {NEW_REM}
), j AS (
  SELECT c.new_id,
         round(len(list_intersect(ga.g, gb.g)) * 1.0 /
               greatest(len(ga.g) + len(gb.g)
                        - len(list_intersect(ga.g, gb.g)), 1), 6) AS jaccard
  FROM cands c
  JOIN grams ga ON ga.doc_id = c.new_id
  JOIN grams gb ON gb.doc_id = c.corp_id
)
SELECT new_id, count(*) AS n_corpus_dups, max(jaccard) AS best_jaccard
FROM j WHERE jaccard >= {NEAR_DUP_T} GROUP BY new_id
"""


def _sql_dedup_incremental() -> str:
    mins = ", ".join(
        f"list_aggregate(list_transform(g, x -> md5('{s}:' || x)), 'min')"
        for s in range(_NUM_HASHES))
    rpb = _NUM_HASHES // _BANDS
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        f"md5(array_to_string(sig[{b * rpb + 1}:{(b + 1) * rpb}], '|')) "
        f"AS bucket FROM sigs"
        for b in range(_BANDS))
    return (SQL_DEDUP_INCREMENTAL
            .replace("{mins}", mins).replace("{bands}", bands))


# ------------------------------------- durable pair table (incremental)

#: staged base pair tables, one per (corpus, params) — see
#: _staged_pair_table
_PAIR_TABLE_BASES: dict[tuple, str] = {}


def _staged_pair_table(spark, sf_dir):
    """Process-scoped STAGED base pair table over the base corpus
    (doc_id % NEW_MOD != NEW_REM) — built ONCE per corpus, exactly the
    `_staged_event_store` pattern the streaming folds use: in the
    mine-once→append-forever pipeline the base mine is amortized over
    every later batch, so the gated audit measures the UPDATE (the
    operator that runs per batch at 100 TB), not base staging it never
    re-pays. The mine-from-scratch cost stays visible in its own row
    (`minhash_near_dups` IS the mining benchmark). Keyed by the corpus
    content stamp, so a regenerated corpus re-stages instead of serving
    stale pairs. Tempdirs are swept at interpreter exit."""
    import atexit
    import os
    import shutil
    import tempfile
    from photon_spark.pair_cache import PairTable, _corpus_stamp

    corpus = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    key = (corpus, _corpus_stamp(corpus), _NUM_HASHES, _BANDS, 3,
           NEAR_DUP_T)
    base = _PAIR_TABLE_BASES.get(key)
    if base is None:
        base = tempfile.mkdtemp(prefix="photon_pairtab_base_")
        if not _PAIR_TABLE_BASES:
            atexit.register(lambda: [shutil.rmtree(p, ignore_errors=True)
                                     for p in _PAIR_TABLE_BASES.values()])
        pt = PairTable(spark, base, num_hashes=_NUM_HASHES, bands=_BANDS,
                       shingle_n=3, threshold=NEAR_DUP_T)
        is_new = (F.col("doc_id") % NEW_MOD) == NEW_REM
        pt.build(_docs(spark, sf_dir).where(~is_new))
        _PAIR_TABLE_BASES[key] = base
        return pt
    return PairTable(spark, base, num_hashes=_NUM_HASHES, bands=_BANDS,
                     shingle_n=3, threshold=NEAR_DUP_T)


def q_pair_table_incremental_audit(spark, sf_dir):
    """The durable shared pair table, PROVEN incremental: with the base
    corpus (doc_id % {NEW_MOD} != {NEW_REM}) already mined into a staged
    table (`_staged_pair_table` — built once per corpus, the amortized
    mine-once cost), fold the remaining ~10% in as a later batch through
    the persisted LSH band index (pair_cache.PairTable.update —
    batch×corpus probe + batch-local mine, corpus text untouched), and
    return the table's full pair relation. The oracle is DuckDB's
    from-scratch full-corpus mine (`_sql_minhash`), so a hash match is
    the identity pairs(A ∪ B) = pairs(A) ∪ probe(B × (A ∪ B)) checked
    cross-engine — the guarantee that lets a 100 TB pipeline mine once
    and append forever instead of re-mining per batch.

    Re-invocation safety: `update` of the SAME batch is a retry by
    construction (its batch tag derives from the batch ids; it
    overwrites its own partitions and the band probe excludes the
    batch's own already-indexed ids), so gate re-runs and bench
    warm-ups converge to identical table contents — the measured cost
    is one real incremental UPDATE against a standing table, which is
    what every batch after the first pays in production."""
    from photon_spark.pair_cache import PairTable

    d = _docs(spark, sf_dir)
    is_new = (F.col("doc_id") % NEW_MOD) == NEW_REM
    pt = _staged_pair_table(spark, sf_dir)
    pt.update(d.where(is_new), corpus_docs=d.where(~is_new))
    return pt.pairs().select(
        F.col("lo_id").cast("long").alias("lo_id"),
        F.col("hi_id").cast("long").alias("hi_id"),
        F.col("jaccard").cast("double").alias("jaccard"))


def _sql_pair_table_incremental_audit() -> str:
    from photon_spark.queries_northstar import _sql_minhash
    return _sql_minhash("documents")


# -------------------------------------------------- Bloom decontamination

def _pow2(bit):
    """2^bit as an exact long for bit ∈ [0, 31] (double pow is exact far
    past 2^31) — Spark's shiftleft only takes a Python-int shift amount,
    so a column-valued shift is expressed as a power instead."""
    return F.pow(F.lit(2.0), bit).cast("long")


def _bloom_positions(g, k: int = BLOOM_K):
    """K bit positions in [0, BLOOM_BITS) for gram ``g`` — the first 16
    md5 bits under K seeds; portable because both engines read the same
    4 hex chars ('0x'-cast in DuckDB, conv(16,10) in Spark)."""
    return [F.conv(F.substring(F.md5(F.concat(F.lit(f"bf{i}:"), g)), 1, 4),
                   16, 10).cast("int")
            for i in range(k)]


def build_bloom(gram_df, gram_col: str = "g") -> list[int]:
    """Aggregate a gram relation into the BLOOM_WORDS-word bitmap and
    collect it — the tiny driver-side summary (16 KiB regardless of probe
    set size) that replaces broadcasting the probe grams themselves."""
    pos = F.explode(F.array(*_bloom_positions(F.col(gram_col)))).alias("p")
    words = (gram_df.select(pos)
             .select(F.shiftright("p", 5).alias("w"),
                     _pow2(F.col("p").bitwiseAND(F.lit(31))).alias("m"))
             .groupBy("w").agg(F.bit_or("m").alias("bits"))
             .collect())
    bitmap = [0] * BLOOM_WORDS
    for r in words:
        bitmap[r["w"]] = r["bits"]
    return bitmap


def _bloom_flag_count_udf(bitmap: list[int]):
    """Per-doc count of grams whose BLOOM_K bit positions are all set, as
    one Arrow-batched pandas UDF. The 16 KiB bitmap rides in the closure
    (broadcast once per executor); each gram pays BLOOM_K md5s with an
    early exit on the first clear bit — the Catalyst higher-order-filter
    form ran the same math as an interpreted per-element expression and
    was 8× slower at sf0.1. Hashing matches _bloom_positions exactly
    (hashlib md5 hex == Spark md5 == DuckDB md5; int(hex[:4],16) ==
    conv(substr(h,1,4),16,10) == ('0x'||substr(h,1,4))::INT)."""
    words = tuple(bitmap)
    seeds = tuple(f"bf{i}:" for i in range(BLOOM_K))

    @F.pandas_udf("int")
    def _n_flagged(shs: pd.Series) -> pd.Series:
        import hashlib
        out = []
        for sh in shs:
            n = 0
            for g in (sh if sh is not None else ()):
                for s in seeds:
                    p = int(hashlib.md5((s + g).encode()).hexdigest()[:4],
                            16)
                    if not (words[p >> 5] >> (p & 31)) & 1:
                        break
                else:
                    n += 1
            out.append(n)
        return pd.Series(out)

    return _n_flagged


def q_contamination_bloom(spark, sf_dir):
    """Decontamination via a Bloom filter of the benchmark probe grams:
    the {BLOOM_BITS}-bit bitmap is built once from the probe set (docs
    with doc_id % BENCH_MOD == 0, as in contamination_check), collected
    (16 KiB — constant in benchmark size), shipped once per executor in
    the scan kernel's closure, and the corpus scan tests each gram's
    {BLOOM_K} bit positions map-side in one Arrow pass. The corpus gram test is join-free map work (vs
    the exact check's semi-join against the gram set); the only join
    left carries (doc_id, n_flagged) ints to pick up `source` — grams
    never move. At 100 TB this is the decontamination shape whose cost
    does not grow with the benchmark suite.

    Bloom semantics are deterministic (same md5-derived positions on both
    engines), so the oracle reproduces the false-positive set exactly;
    the FP envelope vs the exact semi-join is pinned in pytest."""
    from photon_spark.functions.dedup import _own_cache, _shingled
    d = _docs(spark, sf_dir)
    sh = _shingled(d, "text", "doc_id", CONTAM_N).persist()
    is_bench = F.col("id") % BENCH_MOD == 0
    bitmap = build_bloom(
        sh.where(is_bench).select(F.explode("sh").alias("g")).distinct())
    per_doc = (sh.where(~is_bench)
                 .select(F.col("id").alias("doc_id"),
                         _bloom_flag_count_udf(bitmap)("sh")
                          .alias("n_flagged")))
    hit = (F.col("n_flagged") > 0).cast("long")
    return _own_cache(
        d.join(per_doc, "doc_id")
         .groupBy("source")
         .agg(F.count(F.lit(1)).alias("n_docs"),
              F.sum(hit).alias("n_flagged_docs"),
              F.sum("n_flagged").cast("long").alias("flagged_gram_total"),
              F.round(F.sum(hit) / F.count(F.lit(1)), 6).alias("flag_rate")),
        [sh])


def _sql_contamination_bloom() -> str:
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(CONTAM_N))
    grams = (f"list_distinct(list_transform("
             f"generate_series(1, len(t)-{CONTAM_N - 1}), i -> {gram}))")
    pos = ", ".join(
        f"('0x' || substr(md5('bf{i}:' || gr), 1, 4))::INT"
        for i in range(BLOOM_K))
    return f"""
WITH norm AS (
  SELECT doc_id, string_split({_SQL_NORM}, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, {grams} AS g FROM norm WHERE len(t) >= {CONTAM_N}
), bench AS (
  SELECT DISTINCT unnest(g) AS gr FROM grams WHERE doc_id % {BENCH_MOD} = 0
), bloom AS (
  SELECT p // 32 AS w, bit_or(1::BIGINT << (p % 32)) AS bits
  FROM (SELECT unnest([{pos}]) AS p FROM bench) GROUP BY 1
), corp AS (
  SELECT doc_id, unnest(g) AS gr FROM grams WHERE doc_id % {BENCH_MOD} != 0
), cpos AS (
  SELECT doc_id, gr, unnest([{pos}]) AS p FROM corp
), hits AS (
  SELECT doc_id, gr
  FROM cpos JOIN bloom b ON b.w = p // 32
                        AND (b.bits >> (p % 32)) & 1 = 1
  GROUP BY doc_id, gr HAVING count(*) = {BLOOM_K}
), per_doc AS (
  SELECT g.doc_id, count(h.gr) AS n_flagged
  FROM (SELECT doc_id FROM grams WHERE doc_id % {BENCH_MOD} != 0) g
  LEFT JOIN hits h ON g.doc_id = h.doc_id
  GROUP BY g.doc_id
)
SELECT d.source, count(*) AS n_docs,
       CAST(sum(CASE WHEN p.n_flagged > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged_docs,
       CAST(sum(p.n_flagged) AS BIGINT) AS flagged_gram_total,
       round(sum(CASE WHEN p.n_flagged > 0 THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS flag_rate
FROM documents d JOIN per_doc p ON d.doc_id = p.doc_id
GROUP BY d.source
"""


# ------------------------------------------- cross-source duplication map

def q_cross_source_dups(spark, sf_dir):
    """Provenance audit: near-dup pairs aggregated by the (unordered)
    source pair — which sources duplicate each other, how often, and how
    strongly. The governance signal for choosing which feed to drop when
    two crawls overlap.

    Scale shape: the pair relation is the already-bounded LSH output;
    attaching sources is two joins that move only (doc_id, source), and
    the matrix aggregate has at most |sources|² keys."""
    d = _docs(spark, sf_dir)
    pairs = _near_dup_pairs(spark, sf_dir)
    src = d.select("doc_id", "source")
    j = (pairs
         .join(src.select(F.col("doc_id").alias("lo_id"),
                          F.col("source").alias("s_lo")), "lo_id")
         .join(src.select(F.col("doc_id").alias("hi_id"),
                          F.col("source").alias("s_hi")), "hi_id"))
    # jaccard is already 6dp — average it as exact 1e6 ints (float policy)
    j_int = F.round(F.col("jaccard") * 1e6).cast("long")
    return dedup._own_cache(
        j.select(F.least("s_lo", "s_hi").alias("source_a"),
                 F.greatest("s_lo", "s_hi").alias("source_b"),
                 j_int.alias("j_int"))
         .groupBy("source_a", "source_b")
         .agg(F.count(F.lit(1)).alias("n_pairs"),
              F.round(F.sum("j_int") / F.count(F.lit(1)) / 1e6, 6)
               .alias("avg_jaccard")),
        getattr(pairs, "_photon_cached", []))


SQL_CROSS_SOURCE_DUPS = f"""
WITH pairs_src AS ({SQL_MINHASH_NEAR_DUPS})
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       count(*) AS n_pairs,
       round(sum(CAST(round(p.jaccard * 1000000) AS BIGINT)) * 1.0
             / count(*) / 1000000, 6) AS avg_jaccard
FROM pairs_src p
JOIN documents da ON p.lo_id = da.doc_id
JOIN documents db ON p.hi_id = db.doc_id
GROUP BY 1, 2
"""


# --------------------------------------------------- lang-ID confusion map

def q_lang_confusion(spark, sf_dir):
    """Language-ID audit: declared ``lang`` vs the n-gram-heuristic
    ``lang_pred``, as a confusion matrix — the data-quality check run
    before trusting either label for mixture planning. One scan, one
    short-key shuffle (≤ |langs|² groups)."""
    d = _docs(spark, sf_dir)
    prof = text.text_profile(d).select("doc_id", "lang_pred")
    return (d.select("doc_id", "lang").join(prof, "doc_id")
             .groupBy("lang", "lang_pred")
             .agg(F.count(F.lit(1)).alias("n_docs")))


SQL_LANG_CONFUSION = f"""
WITH prof AS ({SQL_TEXT_PROFILE})
SELECT d.lang, p.lang_pred, count(*) AS n_docs
FROM documents d JOIN prof p ON d.doc_id = p.doc_id
GROUP BY d.lang, p.lang_pred
"""


# ------------------------------------------------------- batch ANN top-k

#: every vec_id % ANN_QMOD == 0 is a query; k neighbors from the rest
ANN_QMOD, ANN_MULTI_K = 97, 5


def q_ann_topk_multi(spark, sf_dir):
    """Batch ANN: exact cosine top-{ANN_MULTI_K} for EVERY query vector
    (vec_id % {ANN_QMOD} == 0) in one pass — the realistic serving shape,
    where a query batch amortizes the corpus scan that a single-query
    top-k pays in full.

    Scale shape: the query batch broadcasts (it is small by construction);
    the corpus computes all cosines map-side and only (query_id, vec_id,
    cosine) triples reach the per-query rank, which Catalyst executes as
    WindowGroupLimit — ≤ k rows per query survive each map partition
    before the shuffle. Corpus vectors never move."""
    from pyspark.sql import Window
    from photon_spark.functions.similarity import cosine

    e = _read_base(spark, sf_dir, "embeddings")
    is_q = F.col("vec_id") % ANN_QMOD == 0
    q = (e.where(is_q)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("qv")))
    scored = (e.where(~is_q).crossJoin(F.broadcast(q))
               .select("query_id", "vec_id",
                       F.round(cosine(F.col("embedding"), F.col("qv")), 6)
                        .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= ANN_MULTI_K))


SQL_ANN_TOPK_MULTI = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding FROM embeddings
  WHERE vec_id % {ANN_QMOD} = 0
), s AS (
  SELECT q.query_id, b.vec_id,
         round(list_cosine_similarity(b.embedding::DOUBLE[],
                                      q.embedding::DOUBLE[]), 6) AS cosine
  FROM embeddings b, q WHERE b.vec_id % {ANN_QMOD} != 0
), r AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM s
)
SELECT query_id, vec_id, cosine, rank FROM r WHERE rank <= {ANN_MULTI_K}
"""


# --------------------------------------------------- ANN recall audit

#: batch-IVF parameters for the recall audit
RECALL_CELLS, RECALL_PROBE = 16, 4


def q_ann_recall_audit(spark, sf_dir):
    """Recall@k of batch IVF against batch exact — the eval every ANN
    deployment runs before trusting an index: for the same query batch as
    ann_topk_multi, compute exact top-{ANN_MULTI_K} and IVF
    (probe {RECALL_PROBE}/{RECALL_CELLS} cells) top-{ANN_MULTI_K}, then
    per query the overlap count and recall fraction.

    Scale shape: corpus cell-assignment is the map-only GEMM screen
    (similarity.ivf_assign_cells); PROBE selection is Catalyst's exact
    sequential-fold cosine over queries × {RECALL_CELLS} centroids (a
    broadcast-tiny crossJoin), so probe choice carries no GEMM
    re-association risk; candidates join probed cells by cell_id (at
    100 TB: partition pruning on a cell-bucketed table) and only
    (query_id, vec_id, cosine) triples reach the per-query
    WindowGroupLimit rank. The recall join is ids-only.
    """
    from pyspark.sql import Window
    from photon_spark.functions.similarity import (cosine, ivf_assign_cells,
                                                   ivf_train_cells)

    e = _read_base(spark, sf_dir, "embeddings")
    is_q = F.col("vec_id") % ANN_QMOD == 0
    q = (e.where(is_q)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("qv")))
    corpus = e.where(~is_q)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("vec_id"))

    # exact ground truth IS the ann_topk_multi relation — call it, so the
    # audit can never desynchronize from the query it audits
    exact = q_ann_topk_multi(spark, sf_dir).select("query_id", "vec_id")

    # batch IVF: train on the FULL table (ivf_topk convention), assign the
    # corpus, probe per query with the exact Catalyst cosine
    cents = ivf_train_cells(e, RECALL_CELLS)
    assigned = ivf_assign_cells(corpus, cents)
    cents_df = spark.createDataFrame(
        [(c, v) for c, v in cents], "cell_id long, cv array<double>")
    wp = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(),
                                                F.col("cell_id"))
    # probe cosines are ROUNDED to 6dp before ranking (repo float-parity
    # policy): the two engines compute them with different kernels
    # (Catalyst sequential fold vs DuckDB list_cosine_similarity), and an
    # unrounded rank could flip on a sub-ulp disagreement; at 6dp ties
    # break on cell_id identically on both sides
    probe = (q.crossJoin(F.broadcast(cents_df))
              .select("query_id", "cell_id",
                      F.round(cosine(F.col("qv"), F.col("cv")), 6)
                       .alias("ccos"))
              .withColumn("prank", F.row_number().over(wp))
              .where(F.col("prank") <= RECALL_PROBE)
              .select("query_id", "cell_id"))
    ivf = (assigned.join(F.broadcast(probe), "cell_id")
                   .join(F.broadcast(q), "query_id")
                   .select("query_id", "vec_id",
                           F.round(cosine(F.col("embedding"), F.col("qv")), 6)
                            .alias("cosine"))
                   .withColumn("rank", F.row_number().over(w))
                   .where(F.col("rank") <= ANN_MULTI_K)
                   .select("query_id", "vec_id", F.lit(1).alias("hit")))

    return (exact.join(ivf, ["query_id", "vec_id"], "left")
                 .groupBy("query_id")
                 .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("long")
                       .alias("n_hits"),
                      F.round(F.sum(F.coalesce("hit", F.lit(0)))
                              / F.lit(ANN_MULTI_K), 6).alias("recall")))


SQL_ANN_RECALL_AUDIT = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id % {ANN_QMOD} = 0
), corpus AS (
  SELECT vec_id, v FROM base WHERE vec_id % {ANN_QMOD} != 0
), exact AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, c.vec_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(c.v, q.qv), 6) DESC,
                      c.vec_id) AS rank
    FROM corpus c CROSS JOIN q) WHERE rank <= {ANN_MULTI_K}
), cents AS (
  SELECT vec_id AS cell_id, v AS cv FROM base
  ORDER BY vec_id LIMIT {RECALL_CELLS}
), assign AS (
  SELECT vec_id, cell_id FROM (
    SELECT c.vec_id, ce.cell_id,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY list_cosine_similarity(c.v, ce.cv) DESC, ce.cell_id
           ) AS rn
    FROM corpus c CROSS JOIN cents ce) WHERE rn = 1
), probe AS (
  SELECT query_id, cell_id FROM (
    SELECT q.query_id, ce.cell_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(q.qv, ce.cv), 6) DESC,
                      ce.cell_id
           ) AS prank
    FROM q CROSS JOIN cents ce) WHERE prank <= {RECALL_PROBE}
), ivf AS (
  SELECT query_id, vec_id FROM (
    SELECT p.query_id, c.vec_id,
           row_number() OVER (
             PARTITION BY p.query_id
             ORDER BY round(list_cosine_similarity(c.v, q.qv), 6) DESC,
                      c.vec_id) AS rank
    FROM corpus c
    JOIN assign a ON a.vec_id = c.vec_id
    JOIN probe p ON p.cell_id = a.cell_id
    JOIN q ON q.query_id = p.query_id) WHERE rank <= {ANN_MULTI_K}
)
SELECT e.query_id,
       CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       round(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / {ANN_MULTI_K}, 6) AS recall
FROM exact e
LEFT JOIN ivf i ON i.query_id = e.query_id AND i.vec_id = e.vec_id
GROUP BY 1
"""


# ------------------------------------- ANN recall audit, FIXED query batch

#: size of the fixed evaluation query set — a CONSTANT, not a corpus
#: fraction, which is what makes the audit corpus-linear
RECALL_FIXEDQ_K = 8


def q_ann_recall_audit_fixedq(spark, sf_dir):
    """Recall@k with a FIXED-SIZE query batch — the production form of
    `ann_recall_audit`, making its documented scale caveat real instead
    of documented: that audit's query set is ``vec_id % {qmod} == 0``,
    a corpus FRACTION, so a 10x corpus is also 10x queries and the
    exact side scores 100x pairs (7.2x wall measured, BASELINE.md).
    A deployed eval pins the query set; here it is the
    {fk} smallest query-eligible vec_ids — deterministic, corpus-stable
    under append (new ids are larger), and CONSTANT in corpus size, so
    both the exact side (|Q|·n) and the IVF side are corpus-LINEAR.

    Same IVF construction, probe selection, rounding, and tie-break
    rules as `ann_recall_audit` (the caveat fix changes the query
    relation only), so the two rows differ in exactly the property
    under test."""
    from pyspark.sql import Window
    from photon_spark.functions.similarity import (cosine, ivf_assign_cells,
                                                   ivf_train_cells)

    e = _read_base(spark, sf_dir, "embeddings")
    is_q = F.col("vec_id") % ANN_QMOD == 0
    # the fixed batch: smallest RECALL_FIXEDQ_K query-eligible ids — a
    # TakeOrdered over the (tiny) query-eligible relation, then broadcast
    q = (e.where(is_q)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("qv"))
          .orderBy("query_id").limit(RECALL_FIXEDQ_K))
    corpus = e.where(~is_q)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("vec_id"))

    # exact ground truth against the fixed batch: one corpus scan,
    # |Q| = const cosines per corpus row, WindowGroupLimit rank
    exact = (corpus.crossJoin(F.broadcast(q))
                   .select("query_id", "vec_id",
                           F.round(cosine(F.col("embedding"), F.col("qv")),
                                   6).alias("cosine"))
                   .withColumn("rank", F.row_number().over(w))
                   .where(F.col("rank") <= ANN_MULTI_K)
                   .select("query_id", "vec_id"))

    cents = ivf_train_cells(e, RECALL_CELLS)
    assigned = ivf_assign_cells(corpus, cents)
    cents_df = spark.createDataFrame(
        [(c, v) for c, v in cents], "cell_id long, cv array<double>")
    wp = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(),
                                                F.col("cell_id"))
    probe = (q.crossJoin(F.broadcast(cents_df))
              .select("query_id", "cell_id",
                      F.round(cosine(F.col("qv"), F.col("cv")), 6)
                       .alias("ccos"))
              .withColumn("prank", F.row_number().over(wp))
              .where(F.col("prank") <= RECALL_PROBE)
              .select("query_id", "cell_id"))
    ivf = (assigned.join(F.broadcast(probe), "cell_id")
                   .join(F.broadcast(q), "query_id")
                   .select("query_id", "vec_id",
                           F.round(cosine(F.col("embedding"), F.col("qv")),
                                   6).alias("cosine"))
                   .withColumn("rank", F.row_number().over(w))
                   .where(F.col("rank") <= ANN_MULTI_K)
                   .select("query_id", "vec_id", F.lit(1).alias("hit")))

    # fixedq form: the hinted side is ≤ |Q|·k rows with the CONSTANT
    # query batch — broadcast beats the post-window SortMergeJoin
    # (see ann_recall_audit_fixedq); the sampled parent stays un-hinted.
    return (exact.join(F.broadcast(ivf), ["query_id", "vec_id"], "left")
                 .groupBy("query_id")
                 .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("long")
                       .alias("n_hits"),
                      F.round(F.sum(F.coalesce("hit", F.lit(0)))
                              / F.lit(ANN_MULTI_K), 6).alias("recall")))


q_ann_recall_audit_fixedq.__doc__ = q_ann_recall_audit_fixedq.__doc__.format(
    qmod=ANN_QMOD, fk=RECALL_FIXEDQ_K)


SQL_ANN_RECALL_AUDIT_FIXEDQ = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id % {ANN_QMOD} = 0
  ORDER BY vec_id LIMIT {RECALL_FIXEDQ_K}
), corpus AS (
  SELECT vec_id, v FROM base WHERE vec_id % {ANN_QMOD} != 0
), exact AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, c.vec_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(c.v, q.qv), 6) DESC,
                      c.vec_id) AS rank
    FROM corpus c CROSS JOIN q) WHERE rank <= {ANN_MULTI_K}
), cents AS (
  SELECT vec_id AS cell_id, v AS cv FROM base
  ORDER BY vec_id LIMIT {RECALL_CELLS}
), assign AS (
  SELECT vec_id, cell_id FROM (
    SELECT c.vec_id, ce.cell_id,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY list_cosine_similarity(c.v, ce.cv) DESC, ce.cell_id
           ) AS rn
    FROM corpus c CROSS JOIN cents ce) WHERE rn = 1
), probe AS (
  SELECT query_id, cell_id FROM (
    SELECT q.query_id, ce.cell_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(q.qv, ce.cv), 6) DESC,
                      ce.cell_id
           ) AS prank
    FROM q CROSS JOIN cents ce) WHERE prank <= {RECALL_PROBE}
), ivf AS (
  SELECT query_id, vec_id FROM (
    SELECT p.query_id, c.vec_id,
           row_number() OVER (
             PARTITION BY p.query_id
             ORDER BY round(list_cosine_similarity(c.v, q.qv), 6) DESC,
                      c.vec_id) AS rank
    FROM corpus c
    JOIN assign a ON a.vec_id = c.vec_id
    JOIN probe p ON p.cell_id = a.cell_id
    JOIN q ON q.query_id = p.query_id) WHERE rank <= {ANN_MULTI_K}
)
SELECT e.query_id,
       CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       round(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / {ANN_MULTI_K}, 6) AS recall
FROM exact e
LEFT JOIN ivf i ON i.query_id = e.query_id AND i.vec_id = e.vec_id
GROUP BY 1
"""


# ------------------------------------------------------ ANN nDCG audit

#: fixed-point DCG discount table: floor(1e6 / log2(rank+1)) for rank
#: 1..k, computed ONCE in Python and inlined as the same integer
#: literals into both engines' plans — neither engine ever calls a libm
#: log, so the DCG integer sums are exact cross-engine (the repo
#: float-parity policy applied to ranking metrics)
NDCG_W = [int(10**6 / math.log2(i + 1)) for i in range(1, ANN_MULTI_K + 1)]
#: ideal DCG: the exact list in exact order, graded rel k..1
NDCG_IDCG = sum((ANN_MULTI_K - i) * w for i, w in enumerate(NDCG_W))


def q_ann_ndcg_audit(spark, sf_dir):
    """nDCG@k of the IVF tier against the exact ranking — the metric
    that distinguishes "found the right five" from "found them in the
    right ORDER", which recall@k cannot see: graded relevance comes
    from the exact list (rank 1 is worth {ANN_MULTI_K}, rank k worth
    1), the IVF list is scored position-by-position with the
    fixed-point discount table, and nDCG = DCG/IDCG. An index can hold
    recall at 1.0 while its nDCG decays — the first symptom of probe
    starvation reordering the head of the list.

    Integer-exact: discounts are precomputed integer literals (module
    constant NDCG_W) identical in both plans; DCG is an integer
    dot-product; only the final nDCG division rounds to 6dp. Scale
    shape identical to ann_recall_audit (the IVF candidate pipeline is
    the same construction): map-only cell assignment, broadcast probe,
    WindowGroupLimit rank, ids-only eval join."""
    from pyspark.sql import Window
    from photon_spark.functions.similarity import (cosine, ivf_assign_cells,
                                                   ivf_train_cells)

    e = _read_base(spark, sf_dir, "embeddings")
    is_q = F.col("vec_id") % ANN_QMOD == 0
    q = (e.where(is_q)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("qv")))
    corpus = e.where(~is_q)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("vec_id"))

    # graded ground truth from the exact relation (rank 1 → rel k)
    exact = (q_ann_topk_multi(spark, sf_dir)
             .select("query_id", "vec_id",
                     (F.lit(ANN_MULTI_K + 1) - F.col("rank"))
                      .alias("rel")))

    cents = ivf_train_cells(e, RECALL_CELLS)
    assigned = ivf_assign_cells(corpus, cents)
    cents_df = spark.createDataFrame(
        [(c, v) for c, v in cents], "cell_id long, cv array<double>")
    wp = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(),
                                                F.col("cell_id"))
    probe = (q.crossJoin(F.broadcast(cents_df))
              .select("query_id", "cell_id",
                      F.round(cosine(F.col("qv"), F.col("cv")), 6)
                       .alias("ccos"))
              .withColumn("prank", F.row_number().over(wp))
              .where(F.col("prank") <= RECALL_PROBE)
              .select("query_id", "cell_id"))
    ivf = (assigned.join(F.broadcast(probe), "cell_id")
                   .join(F.broadcast(q), "query_id")
                   .select("query_id", "vec_id",
                           F.round(cosine(F.col("embedding"), F.col("qv")), 6)
                            .alias("cosine"))
                   .withColumn("rank", F.row_number().over(w))
                   .where(F.col("rank") <= ANN_MULTI_K)
                   .select("query_id", "vec_id", "rank"))

    disc = F.element_at(F.array(*[F.lit(x) for x in NDCG_W]),
                        F.col("rank").cast("int"))
    return (ivf.join(exact, ["query_id", "vec_id"], "left")
               .groupBy("query_id")
               .agg(F.sum(F.coalesce(F.col("rel"), F.lit(0)) * disc)
                     .cast("long").alias("dcg_units"),
                    F.round(F.sum(F.coalesce(F.col("rel"), F.lit(0)) * disc)
                            / F.lit(NDCG_IDCG), 6).alias("ndcg")))


def _sql_ann_ndcg_audit() -> str:
    disc = " ".join(f"WHEN {i + 1} THEN {w}"
                    for i, w in enumerate(NDCG_W))
    return f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id % {ANN_QMOD} = 0
), corpus AS (
  SELECT vec_id, v FROM base WHERE vec_id % {ANN_QMOD} != 0
), exact AS (
  SELECT query_id, vec_id, {ANN_MULTI_K} + 1 - rank AS rel FROM (
    SELECT q.query_id, c.vec_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(c.v, q.qv), 6) DESC,
                      c.vec_id) AS rank
    FROM corpus c CROSS JOIN q) WHERE rank <= {ANN_MULTI_K}
), cents AS (
  SELECT vec_id AS cell_id, v AS cv FROM base
  ORDER BY vec_id LIMIT {RECALL_CELLS}
), assign AS (
  SELECT vec_id, cell_id FROM (
    SELECT c.vec_id, ce.cell_id,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY list_cosine_similarity(c.v, ce.cv) DESC, ce.cell_id
           ) AS rn
    FROM corpus c CROSS JOIN cents ce) WHERE rn = 1
), probe AS (
  SELECT query_id, cell_id FROM (
    SELECT q.query_id, ce.cell_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(q.qv, ce.cv), 6) DESC,
                      ce.cell_id
           ) AS prank
    FROM q CROSS JOIN cents ce) WHERE prank <= {RECALL_PROBE}
), ivf AS (
  SELECT query_id, vec_id, rank FROM (
    SELECT p.query_id, c.vec_id,
           row_number() OVER (
             PARTITION BY p.query_id
             ORDER BY round(list_cosine_similarity(c.v, q.qv), 6) DESC,
                      c.vec_id) AS rank
    FROM corpus c
    JOIN assign a ON a.vec_id = c.vec_id
    JOIN probe p ON p.cell_id = a.cell_id
    JOIN q ON q.query_id = p.query_id) WHERE rank <= {ANN_MULTI_K}
)
SELECT i.query_id,
       CAST(sum(coalesce(e.rel, 0)
                * (CASE i.rank {disc} END)) AS BIGINT) AS dcg_units,
       round(sum(coalesce(e.rel, 0) * (CASE i.rank {disc} END)) * 1.0
             / {NDCG_IDCG}, 6) AS ndcg
FROM ivf i
LEFT JOIN exact e ON e.query_id = i.query_id AND e.vec_id = i.vec_id
GROUP BY 1
"""


#: Matryoshka audit: leading dims kept by the truncated index
MRL_DIM = 16


def q_matryoshka_recall_audit(spark, sf_dir):
    """Matryoshka-truncation audit: recall@k of top-k search run on the
    LEADING {MRL_DIM} dimensions against full-dimension top-k, per query —
    the decision input for MRL-style tiered indexes (store a short prefix
    hot, re-rank the survivors against the full vector cold). Both sides
    are exact rounded cosines with vec_id tie-breaks — fully deterministic
    on both engines (no GEMM anywhere in this audit, unlike the IVF one).

    Scale shape: identical to ann_topk_multi twice — broadcast query
    batch, corpus scans map-side, WindowGroupLimit rank; the truncated
    pass reads {MRL_DIM}/dim of the vector bytes (at 100 TB with a
    column-sliced layout, proportionally less I/O)."""
    from pyspark.sql import Window
    from photon_spark.functions.similarity import cosine

    e = _read_base(spark, sf_dir, "embeddings")
    is_q = F.col("vec_id") % ANN_QMOD == 0
    tr = F.slice(F.col("embedding"), 1, MRL_DIM)
    q = (e.where(is_q)
          .select(F.col("vec_id").alias("query_id"),
                  tr.alias("qt")))
    corpus = e.where(~is_q).select("vec_id", tr.alias("vt"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("vec_id"))
    full = q_ann_topk_multi(spark, sf_dir).select("query_id", "vec_id")
    short = (corpus.crossJoin(F.broadcast(q))
                   .select("query_id", "vec_id",
                           F.round(cosine(F.col("vt"), F.col("qt")), 6)
                            .alias("cosine"))
                   .withColumn("rank", F.row_number().over(w))
                   .where(F.col("rank") <= ANN_MULTI_K)
                   .select("query_id", "vec_id", F.lit(1).alias("hit")))
    return (full.join(short, ["query_id", "vec_id"], "left")
                .groupBy("query_id")
                .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("long")
                      .alias("n_hits"),
                     F.round(F.sum(F.coalesce("hit", F.lit(0)))
                             / F.lit(ANN_MULTI_K), 6).alias("recall")))


SQL_MATRYOSHKA_RECALL_AUDIT = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv, v[1:{MRL_DIM}] AS qt
  FROM base WHERE vec_id % {ANN_QMOD} = 0
), corpus AS (
  SELECT vec_id, v, v[1:{MRL_DIM}] AS vt
  FROM base WHERE vec_id % {ANN_QMOD} != 0
), full_k AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, c.vec_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(c.v, q.qv), 6) DESC,
                      c.vec_id) AS rank
    FROM corpus c CROSS JOIN q) WHERE rank <= {ANN_MULTI_K}
), short_k AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, c.vec_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(c.vt, q.qt), 6) DESC,
                      c.vec_id) AS rank
    FROM corpus c CROSS JOIN q) WHERE rank <= {ANN_MULTI_K}
)
SELECT f.query_id,
       CAST(sum(CASE WHEN s.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       round(sum(CASE WHEN s.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / {ANN_MULTI_K}, 6) AS recall
FROM full_k f
LEFT JOIN short_k s ON s.query_id = f.query_id AND s.vec_id = f.vec_id
GROUP BY 1
"""


# ---------------------------- fixed-batch twins of the remaining audits
#
# The sampled-query audits (ndcg / int8 / matryoshka, like the recall
# audit before round 10) take their query batch as a corpus FRACTION
# (vec_id % ANN_QMOD == 0), so corpus growth multiplies queries AND
# candidates — the quadratic audit ceiling the verdicts documented.
# These twins pin the batch to the same constant RECALL_FIXEDQ_K set as
# ann_recall_audit_fixedq, making every eval side corpus-linear. The
# metric constructions (grading, probe selection, quantization,
# truncation, rounding, tie-breaks) are exactly the parents'.

def _fixedq_float(e):
    """The fixed evaluation batch with FLOAT vectors: the
    RECALL_FIXEDQ_K smallest query-eligible vec_ids — deterministic,
    corpus-stable under append, constant in corpus size."""
    is_q = F.col("vec_id") % ANN_QMOD == 0
    return (e.where(is_q)
             .select(F.col("vec_id").alias("query_id"),
                     F.col("embedding").alias("qv"))
             .orderBy("query_id").limit(RECALL_FIXEDQ_K))


def _exact_topk_fixed(e, q, with_rank: bool = False):
    """Exact float-cosine top-k for an EXPLICIT query batch — one
    corpus scan, |Q|=const cosines per row, WindowGroupLimit rank; the
    corpus-linear exact side every fixed-batch audit shares."""
    from pyspark.sql import Window
    from photon_spark.functions.similarity import cosine

    corpus = e.where(~(F.col("vec_id") % ANN_QMOD == 0))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("vec_id"))
    r = (corpus.crossJoin(F.broadcast(q))
               .select("query_id", "vec_id",
                       F.round(cosine(F.col("embedding"), F.col("qv")), 6)
                        .alias("cosine"))
               .withColumn("rank", F.row_number().over(w))
               .where(F.col("rank") <= ANN_MULTI_K))
    cols = ["query_id", "vec_id"] + (["rank"] if with_rank else [])
    return r.select(*cols)


def _with_fixed_q(sql: str) -> str:
    """Oracle twin builder: append the fixed-batch LIMIT to the parent
    oracle's q CTE. The needle is anchored to the CTE-closing paren —
    the eligibility predicate must be the LAST clause of the q CTE,
    exactly once — so a future oracle edit that appends a clause after
    the WHERE (which would otherwise get the LIMIT spliced mid-clause)
    fails the assert here instead of producing invalid SQL at the gate."""
    needle = f"WHERE vec_id % {ANN_QMOD} = 0\n)"
    assert sql.count(needle) == 1, "q-CTE predicate not CTE-final/unique"
    return sql.replace(
        needle,
        f"WHERE vec_id % {ANN_QMOD} = 0"
        f"\n  ORDER BY vec_id LIMIT {RECALL_FIXEDQ_K}\n)")


def q_ann_ndcg_audit_fixedq(spark, sf_dir):
    """nDCG@k of the IVF tier with the CONSTANT query batch — the
    production form of `ann_ndcg_audit` (same fixed-point discount
    table, same probe selection and tie-breaks; only the query relation
    changes), so ordering quality is monitorable at any corpus size."""
    from pyspark.sql import Window
    from photon_spark.functions.similarity import (cosine, ivf_assign_cells,
                                                   ivf_train_cells)

    e = _read_base(spark, sf_dir, "embeddings")
    q = _fixedq_float(e)
    corpus = e.where(~(F.col("vec_id") % ANN_QMOD == 0))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("vec_id"))
    exact = (_exact_topk_fixed(e, q, with_rank=True)
             .select("query_id", "vec_id",
                     (F.lit(ANN_MULTI_K + 1) - F.col("rank")).alias("rel")))

    cents = ivf_train_cells(e, RECALL_CELLS)
    assigned = ivf_assign_cells(corpus, cents)
    cents_df = spark.createDataFrame(
        [(c, v) for c, v in cents], "cell_id long, cv array<double>")
    wp = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(),
                                                F.col("cell_id"))
    probe = (q.crossJoin(F.broadcast(cents_df))
              .select("query_id", "cell_id",
                      F.round(cosine(F.col("qv"), F.col("cv")), 6)
                       .alias("ccos"))
              .withColumn("prank", F.row_number().over(wp))
              .where(F.col("prank") <= RECALL_PROBE)
              .select("query_id", "cell_id"))
    ivf = (assigned.join(F.broadcast(probe), "cell_id")
                   .join(F.broadcast(q), "query_id")
                   .select("query_id", "vec_id",
                           F.round(cosine(F.col("embedding"), F.col("qv")),
                                   6).alias("cosine"))
                   .withColumn("rank", F.row_number().over(w))
                   .where(F.col("rank") <= ANN_MULTI_K)
                   .select("query_id", "vec_id", "rank"))

    disc = F.element_at(F.array(*[F.lit(x) for x in NDCG_W]),
                        F.col("rank").cast("int"))
    # fixedq form: the hinted side is ≤ |Q|·k rows with the CONSTANT
    # query batch — broadcast beats the post-window SortMergeJoin
    # (see ann_recall_audit_fixedq); the sampled parent stays un-hinted.
    return (ivf.join(F.broadcast(exact), ["query_id", "vec_id"], "left")
               .groupBy("query_id")
               .agg(F.sum(F.coalesce(F.col("rel"), F.lit(0)) * disc)
                     .cast("long").alias("dcg_units"),
                    F.round(F.sum(F.coalesce(F.col("rel"), F.lit(0)) * disc)
                            / F.lit(NDCG_IDCG), 6).alias("ndcg")))


def q_ann_int8_recall_audit_fixedq(spark, sf_dir):
    """Recall@k of the int8 scoring tier with the CONSTANT query batch —
    the production form of `ann_int8_recall_audit` (same symmetric
    quantization, exact int64 lattice dots, dequant and rounding rules;
    only the query relation changes)."""
    from pyspark.sql import Window

    e = _read_base(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    s = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    qa = F.transform(v, lambda x: F.coalesce(
        F.round(x / F.nullif(s, F.lit(0.0))), F.lit(0.0))
        .cast("long"))
    base = e.select("vec_id", s.alias("xs"), qa.alias("xa"))
    is_q = F.col("vec_id") % ANN_QMOD == 0
    # same id set as _fixedq_float: smallest RECALL_FIXEDQ_K eligible
    q = (base.where(is_q)
             .select(F.col("vec_id").alias("query_id"),
                     F.col("xa").alias("qa"))
             .orderBy("query_id").limit(RECALL_FIXEDQ_K))
    corpus = base.where(~is_q)

    int_dot = F.aggregate(
        F.zip_with("xa", "qa", lambda a, b: a * b),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    scored = (corpus.crossJoin(F.broadcast(q))
                    .select("query_id", "vec_id",
                            F.round(F.col("xs") * int_dot, 6)
                             .alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("vec_id"))
    int8 = (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= ANN_MULTI_K)
                  .select("query_id", "vec_id", F.lit(1).alias("hit")))

    exact = _exact_topk_fixed(e, _fixedq_float(e))
    # int8 is ≤ |Q|·k rows with the constant fixedq batch — broadcast
    # (see ann_recall_audit_fixedq)
    return (exact.join(F.broadcast(int8), ["query_id", "vec_id"], "left")
                 .groupBy("query_id")
                 .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("long")
                       .alias("n_hits"),
                      F.round(F.sum(F.coalesce("hit", F.lit(0)))
                              / F.lit(ANN_MULTI_K), 6).alias("recall")))


def q_matryoshka_recall_audit_fixedq(spark, sf_dir):
    """Matryoshka-truncation recall with the CONSTANT query batch — the
    production form of `matryoshka_recall_audit` (same leading-MRL_DIM
    truncation, exact cosines both sides; only the query relation
    changes)."""
    from pyspark.sql import Window
    from photon_spark.functions.similarity import cosine

    e = _read_base(spark, sf_dir, "embeddings")
    is_q = F.col("vec_id") % ANN_QMOD == 0
    tr = F.slice(F.col("embedding"), 1, MRL_DIM)
    q = (e.where(is_q)
          .select(F.col("vec_id").alias("query_id"), tr.alias("qt"))
          .orderBy("query_id").limit(RECALL_FIXEDQ_K))
    corpus = e.where(~is_q).select("vec_id", tr.alias("vt"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("vec_id"))
    full = _exact_topk_fixed(e, _fixedq_float(e))
    short = (corpus.crossJoin(F.broadcast(q))
                   .select("query_id", "vec_id",
                           F.round(cosine(F.col("vt"), F.col("qt")), 6)
                            .alias("cosine"))
                   .withColumn("rank", F.row_number().over(w))
                   .where(F.col("rank") <= ANN_MULTI_K)
                   .select("query_id", "vec_id", F.lit(1).alias("hit")))
    # fixedq form: the hinted side is ≤ |Q|·k rows with the CONSTANT
    # query batch — broadcast beats the post-window SortMergeJoin
    # (see ann_recall_audit_fixedq); the sampled parent stays un-hinted.
    return (full.join(F.broadcast(short), ["query_id", "vec_id"], "left")
                .groupBy("query_id")
                .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("long")
                      .alias("n_hits"),
                     F.round(F.sum(F.coalesce("hit", F.lit(0)))
                             / F.lit(ANN_MULTI_K), 6).alias("recall")))


# ------------------------------------------------- IVF staleness audit

#: the "appended after index build" slice: vec_id % STALE_MOD == STALE_REM
STALE_MOD, STALE_REM = 3, 1


def q_ivf_staleness_audit(spark, sf_dir):
    """The re-centroid decision input every production ANN service needs
    once it appends under fixed centroids (similarity.append_to_ivf_index
    = the FAISS ``add`` shape): after N appended batches, how stale is
    the index? Two measurements over the same corpus and query batch as
    ann_recall_audit: (1) ASSIGNMENT CHURN — the fraction of corpus
    vectors whose coarse cell under the STALE centroids (trained before
    the appended slice, vec_id % {STALE_MOD} == {STALE_REM}, arrived)
    differs from their cell under a FRESH re-train over everything; (2)
    RECALL@k of the stale index vs the fresh index against exact ground
    truth, per query. High churn + a stale-fresh recall gap = re-train;
    flat = keep appending.

    SAMPLED form — the query batch is a corpus FRACTION, so its exact
    ground truth is corpus-quadratic: retired from the gate in round 12
    (the same r11 retirement the four ann_*_audit parents got) and kept
    as the small-n audit tier. The gated production form is
    :func:`q_ivf_staleness_audit_fixedq`."""
    e = _read_base(spark, sf_dir, "embeddings")
    is_q = F.col("vec_id") % ANN_QMOD == 0
    q = (e.where(is_q)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("qv")))
    exact = q_ann_topk_multi(spark, sf_dir).select("query_id", "vec_id")
    return _ivf_staleness_body(spark, e, q, exact, bounded_q=False)


def q_ivf_staleness_audit_fixedq(spark, sf_dir):
    """IVF staleness audit with the CONSTANT query batch — the
    production form of `ivf_staleness_audit` (same stale/fresh centroid
    tiers, churn measurement and probe rules; only the query relation
    changes to the fixed {fk}-query batch), making the whole row
    corpus-LINEAR: churn is two map-only Arrow GEMM passes joined once
    on vec_id, and the recall legs score |Q|=const cosines per corpus
    row with WindowGroupLimit ranks — no corpus-quadratic ground truth
    anywhere. At 100 TB the monitoring cost is O(corpus), which is what
    lets a real service run this audit on a schedule."""
    e = _read_base(spark, sf_dir, "embeddings")
    q = _fixedq_float(e)
    exact = _exact_topk_fixed(e, q)
    return _ivf_staleness_body(spark, e, q, exact, bounded_q=True)


q_ivf_staleness_audit_fixedq.__doc__ = (
    q_ivf_staleness_audit_fixedq.__doc__.format(fk=RECALL_FIXEDQ_K))


def _ivf_staleness_body(spark, e, q, exact, bounded_q: bool = False):
    """Shared staleness-audit kernel over an EXPLICIT query batch ``q``
    (query_id, qv) and exact ground-truth relation ``exact``
    (query_id, vec_id) — the sampled and fixedq forms differ only in
    those two inputs. ``bounded_q``: True when the query batch is a
    CONSTANT (fixedq) — only then is the hits relation ≤ 2·|Q|·k rows
    at any corpus size and safe to broadcast into the recall join; the
    sampled form's |Q| grows with the corpus, so it keeps the un-hinted
    join (the r11 review removed exactly this class of forced broadcast
    on sf-growing relations).

    Scale shape: both centroid sets are driver-tiny lists trained from
    ONE TakeOrdered collect (both are id-prefix selections, so one
    bounded head of the table yields both — with an exact per-tier
    fallback if the head is too filtered); both cell assignments run in
    ONE map-only Arrow GEMM pass whose output relation carries both
    cell columns, so the churn comparison is a plain aggregate — no
    vec_id join, no shuffle; probes and recall sides are the
    ann_recall_audit shapes (broadcast query batch, WindowGroupLimit
    rank)."""
    from pyspark.sql import Window
    from photon_spark.functions.similarity import (cosine,
                                                   ivf_assign_cells_pair,
                                                   ivf_train_cells)

    corpus = e.where(~(F.col("vec_id") % ANN_QMOD == 0))

    # stale: trained before the appended slice existed (ivf_topk's
    # full-table ORDER BY vec_id LIMIT n convention, minus the slice);
    # fresh: the same training over everything. Both selections are
    # prefixes of the id-sorted table, so one head collect derives
    # both; the rare head-too-filtered case (synthetic id spaces) falls
    # back to the per-tier exact query — semantics identical.
    head = (e.orderBy("vec_id").limit(3 * RECALL_CELLS)
             .select("vec_id", "embedding").collect())
    as_cents = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
                for r in head]
    cents_fresh = as_cents[:RECALL_CELLS]
    cents_stale = [c for c in as_cents
                   if c[0] % STALE_MOD != STALE_REM][:RECALL_CELLS]
    if len(cents_stale) < RECALL_CELLS or len(cents_fresh) < RECALL_CELLS:
        old = e.where(F.col("vec_id") % STALE_MOD != STALE_REM)
        cents_stale = ivf_train_cells(old, RECALL_CELLS)
        cents_fresh = ivf_train_cells(e, RECALL_CELLS)

    # ONE persisted dual-assignment pass feeds all three consumers (the
    # churn aggregate and both tiers' candidate joins); without the
    # persist the map pass would execute per consumer (Catalyst does
    # not deduplicate repeated subtrees). Freed via release_cache.
    from photon_spark.functions.dedup import _own_cache
    both = ivf_assign_cells_pair(corpus, cents_stale, cents_fresh) \
        .persist()
    a_stale = both.select("vec_id", "embedding",
                          F.col("cell_a").alias("cell_id"))
    a_fresh = both.select("vec_id", "embedding",
                          F.col("cell_b").alias("cell_id"))
    churned = F.sum(F.when(F.col("cell_a") != F.col("cell_b"), 1)
                    .otherwise(0)).cast("long")
    churn = both.agg(churned.alias("n_churned"),
                     F.round(churned / F.count(F.lit(1)), 6)
                      .alias("churn_rate"))

    # Both tiers' recall legs run as ONE pipeline: the tiny per-tier
    # probe tables union with a tier tag, the dual assignment unpivots
    # map-side into (tier, cell_id) rows, and a single broadcast-join +
    # rank window scores both tiers' candidates — per-tier semantics
    # identical to two separate legs (tier is the leading window key),
    # at half the stage count.
    wp = Window.partitionBy("tier", "query_id") \
               .orderBy(F.col("ccos").desc(), F.col("cell_id"))
    w = Window.partitionBy("tier", "query_id") \
              .orderBy(F.col("cosine").desc(), F.col("vec_id"))

    def probe_for(cents, tier):
        cents_df = spark.createDataFrame(
            [(c, v) for c, v in cents], "cell_id long, cv array<double>")
        # 6dp round-before-rank (repo float-parity policy — see
        # ann_recall_audit for the kernel-disagreement analysis)
        return (q.crossJoin(F.broadcast(cents_df))
                 .select(F.lit(tier).alias("tier"), "query_id", "cell_id",
                         F.round(cosine(F.col("qv"), F.col("cv")), 6)
                          .alias("ccos")))

    probes = (probe_for(cents_stale, "s")
              .unionByName(probe_for(cents_fresh, "f"))
              .withColumn("prank", F.row_number().over(wp))
              .where(F.col("prank") <= RECALL_PROBE)
              .select("tier", "query_id", "cell_id"))
    unp = (both.select(
        "vec_id", "embedding",
        F.explode(F.array(
            F.struct(F.lit("s").alias("tier"),
                     F.col("cell_a").alias("cell_id")),
            F.struct(F.lit("f").alias("tier"),
                     F.col("cell_b").alias("cell_id")))).alias("tc"))
        .select("vec_id", "embedding", "tc.tier", "tc.cell_id"))
    hits = (unp.join(F.broadcast(probes), ["tier", "cell_id"])
               .join(F.broadcast(q), "query_id")
               .select("tier", "query_id", "vec_id",
                       F.round(cosine(F.col("embedding"), F.col("qv")), 6)
                        .alias("cosine"))
               .withColumn("rank", F.row_number().over(w))
               .where(F.col("rank") <= ANN_MULTI_K)
               .select("tier", "query_id", "vec_id"))

    def rec(tier):
        return F.sum(F.when(F.col("tier") == tier, 1).otherwise(0))

    # fixedq: hits is ≤ 2·|Q|·k rows (two tiers × constant query batch ×
    # rank cutoff) at ANY corpus size — broadcast makes the recall join
    # a BroadcastHashJoin instead of a SortMergeJoin with two exchanges
    # over the similarly-bounded exact relation (guide §3.1: size
    # estimates after windows are wrong, hint when the bound is
    # provable). Sampled form: un-hinted (|Q| grows with the corpus).
    hits_rel = F.broadcast(hits) if bounded_q else hits
    per_q = (exact
             .join(hits_rel, ["query_id", "vec_id"], "left")
             .groupBy("query_id")
             .agg(rec("s").cast("long").alias("n_hits_stale"),
                  F.round(rec("s") / F.lit(ANN_MULTI_K), 6)
                   .alias("recall_stale"),
                  rec("f").cast("long").alias("n_hits_fresh"),
                  F.round(rec("f") / F.lit(ANN_MULTI_K), 6)
                   .alias("recall_fresh")))
    return _own_cache(per_q.crossJoin(F.broadcast(churn)), [both])


SQL_IVF_STALENESS_AUDIT = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id % {ANN_QMOD} = 0
), corpus AS (
  SELECT vec_id, v FROM base WHERE vec_id % {ANN_QMOD} != 0
), cents_s AS (
  SELECT vec_id AS cell_id, v AS cv FROM base
  WHERE vec_id % {STALE_MOD} != {STALE_REM}
  ORDER BY vec_id LIMIT {RECALL_CELLS}
), cents_f AS (
  SELECT vec_id AS cell_id, v AS cv FROM base
  ORDER BY vec_id LIMIT {RECALL_CELLS}
), assign_s AS (
  SELECT vec_id, cell_id FROM (
    SELECT c.vec_id, ce.cell_id,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY list_cosine_similarity(c.v, ce.cv) DESC, ce.cell_id
           ) AS rn
    FROM corpus c CROSS JOIN cents_s ce) WHERE rn = 1
), assign_f AS (
  SELECT vec_id, cell_id FROM (
    SELECT c.vec_id, ce.cell_id,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY list_cosine_similarity(c.v, ce.cv) DESC, ce.cell_id
           ) AS rn
    FROM corpus c CROSS JOIN cents_f ce) WHERE rn = 1
), churn AS (
  SELECT CAST(sum(CASE WHEN s.cell_id != f.cell_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_churned,
         round(sum(CASE WHEN s.cell_id != f.cell_id THEN 1 ELSE 0 END)
               * 1.0 / count(*), 6) AS churn_rate
  FROM assign_s s JOIN assign_f f USING (vec_id)
), exact AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, c.vec_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(c.v, q.qv), 6) DESC,
                      c.vec_id) AS rank
    FROM corpus c CROSS JOIN q) WHERE rank <= {ANN_MULTI_K}
), probe_s AS (
  SELECT query_id, cell_id FROM (
    SELECT q.query_id, ce.cell_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(q.qv, ce.cv), 6) DESC,
                      ce.cell_id
           ) AS prank
    FROM q CROSS JOIN cents_s ce) WHERE prank <= {RECALL_PROBE}
), probe_f AS (
  SELECT query_id, cell_id FROM (
    SELECT q.query_id, ce.cell_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(q.qv, ce.cv), 6) DESC,
                      ce.cell_id
           ) AS prank
    FROM q CROSS JOIN cents_f ce) WHERE prank <= {RECALL_PROBE}
), ivf_s AS (
  SELECT query_id, vec_id FROM (
    SELECT p.query_id, c.vec_id,
           row_number() OVER (
             PARTITION BY p.query_id
             ORDER BY round(list_cosine_similarity(c.v, q.qv), 6) DESC,
                      c.vec_id) AS rank
    FROM corpus c
    JOIN assign_s a ON a.vec_id = c.vec_id
    JOIN probe_s p ON p.cell_id = a.cell_id
    JOIN q ON q.query_id = p.query_id) WHERE rank <= {ANN_MULTI_K}
), ivf_f AS (
  SELECT query_id, vec_id FROM (
    SELECT p.query_id, c.vec_id,
           row_number() OVER (
             PARTITION BY p.query_id
             ORDER BY round(list_cosine_similarity(c.v, q.qv), 6) DESC,
                      c.vec_id) AS rank
    FROM corpus c
    JOIN assign_f a ON a.vec_id = c.vec_id
    JOIN probe_f p ON p.cell_id = a.cell_id
    JOIN q ON q.query_id = p.query_id) WHERE rank <= {ANN_MULTI_K}
)
SELECT e.query_id,
       CAST(sum(CASE WHEN s.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits_stale,
       round(sum(CASE WHEN s.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / {ANN_MULTI_K}, 6) AS recall_stale,
       CAST(sum(CASE WHEN f.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits_fresh,
       round(sum(CASE WHEN f.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / {ANN_MULTI_K}, 6) AS recall_fresh,
       ch.n_churned, ch.churn_rate
FROM exact e
LEFT JOIN ivf_s s ON s.query_id = e.query_id AND s.vec_id = e.vec_id
LEFT JOIN ivf_f f ON f.query_id = e.query_id AND f.vec_id = e.vec_id
CROSS JOIN churn ch
GROUP BY e.query_id, ch.n_churned, ch.churn_rate
"""


# ----------------------------------------------- token-budget selection

#: per-source token budget for the trim audit (binds at sf >= 0.01)
TOKEN_BUDGET = 4000


def q_budget_trim(spark, sf_dir):
    """Exact data selection under a token budget: per source, keep docs in
    (quality DESC, doc_id ASC) order while the running token total stays
    ≤ {TOKEN_BUDGET} — the "best docs until the budget is spent" step of
    corpus curation.

    The naive form is one window per source — a single-partition sort of
    everything a source holds, which dies when one source is 30 TB. This
    implementation uses the threshold trick: quality is a 6dp integer, so
    (source, q_int) LEVEL aggregates are a tiny relation; the level-wise
    running total finds each source's boundary level, every doc joins the
    broadcast level table map-side, and only the boundary level's docs
    (one quality value per source) need a within-level prefix sum. The
    oracle runs the naive window — proving the decomposition is
    invisible."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    q_int = F.round(F.col("quality") * 1e6).cast("long").alias("q_int")
    # persist: prof feeds the level table, the doc join AND the boundary
    # window — without it the Arrow text_profile pass re-runs per consumer
    prof = (text.text_profile(d).select("doc_id", q_int, "n_tokens")
            .join(d.select("doc_id", "source"), "doc_id")
            .persist())
    lev = (prof.groupBy("source", "q_int")
               .agg(F.sum("n_tokens").alias("tok_l")))
    wl = (Window.partitionBy("source")
                .orderBy(F.col("q_int").desc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    lev = (lev.withColumn("cum", F.sum("tok_l").over(wl))
              .withColumn("cum_before", F.col("cum") - F.col("tok_l"))
              .select("source", "q_int", "cum", "cum_before"))
    B = F.lit(TOKEN_BUDGET)
    docs2 = prof.join(F.broadcast(lev), ["source", "q_int"])
    full = F.col("cum") <= B
    # <= on cum_before (not <): a zero-token doc heading the level that
    # starts exactly at the budget is kept by the prefix rule
    boundary = (F.col("cum_before") <= B) & (F.col("cum") > B)
    wb = (Window.partitionBy("source", "q_int").orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    bkeep = (docs2.where(boundary)
                  .withColumn("pre", F.sum("n_tokens").over(wb))
                  .where(F.col("cum_before") + F.col("pre") <= B)
                  .select("doc_id", F.lit(1).alias("bkept")))
    kept = full | F.coalesce(F.col("bkept") == 1, F.lit(False))
    out = (docs2.join(bkeep, "doc_id", "left")
                .groupBy("source")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum(kept.cast("long")).alias("n_kept"),
                     F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
                      .cast("long").alias("tokens_kept"),
                     F.round(F.min(F.when(kept, F.col("q_int"))) / 1e6, 6)
                      .alias("min_kept_quality"),
                     F.first(B).alias("budget")))
    out._photon_cached = [prof]  # type: ignore[attr-defined]
    return out


SQL_BUDGET_TRIM = f"""
WITH prof AS ({SQL_TEXT_PROFILE}),
p AS (
  SELECT d.doc_id, d.source,
         CAST(round(pr.quality * 1000000) AS BIGINT) AS q_int, pr.n_tokens
  FROM prof pr JOIN documents d ON pr.doc_id = d.doc_id
), c AS (
  SELECT *, sum(n_tokens) OVER (
      PARTITION BY source ORDER BY q_int DESC, doc_id ASC
      ROWS UNBOUNDED PRECEDING) AS cum
  FROM p
)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN cum <= {TOKEN_BUDGET} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(sum(CASE WHEN cum <= {TOKEN_BUDGET} THEN n_tokens ELSE 0 END)
            AS BIGINT) AS tokens_kept,
       round(min(CASE WHEN cum <= {TOKEN_BUDGET} THEN q_int END)
             / 1000000.0, 6) AS min_kept_quality,
       {TOKEN_BUDGET} AS budget
FROM c GROUP BY source
"""


# --------------------------------------------- minhash calibration audit

def q_minhash_calibration(spark, sf_dir):
    """Sketch-accuracy audit: for every mined near-dup pair, the MinHash
    ESTIMATE of Jaccard (fraction of agreeing signature components) vs
    the exact value — summarized as mean absolute error and worst error.
    The calibration number that justifies trusting the sketch when the
    exact verify is too expensive to run corpus-wide.

    One extra join of the (id, sig) relation onto the already-bounded
    pair relation; signatures are {_NUM_HASHES} short digests."""
    d = _docs(spark, sf_dir)
    sh = dedup._shingled(d, "text", "doc_id", 3).persist()
    # one signature pass feeds BOTH the band buckets and the estimate join
    sig = sh.select("id", dedup.minhash_sig_udf("sh", _NUM_HASHES)
                          .alias("sig")).persist()
    cands = dedup.minhash_lsh_candidates(d, num_hashes=_NUM_HASHES,
                                         bands=_BANDS, _shingled_df=sh,
                                         _sig_df=sig)
    pairs = dedup.verify_candidate_pairs(cands, sh, NEAR_DUP_T)
    j = (pairs
         .join(sig.select(F.col("id").alias("lo_id"),
                          F.col("sig").alias("sig_a")), "lo_id")
         .join(sig.select(F.col("id").alias("hi_id"),
                          F.col("sig").alias("sig_b")), "hi_id"))
    n_agree = F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                         lambda a, b: a == b),
                              lambda x: x))
    # err in exact 1e6-int space: estimate is a k/16 rational, jaccard is
    # already 6dp — the abs diff stays integral for order-free summing
    est_int = (n_agree * F.lit(1_000_000 // _NUM_HASHES)).cast("long")
    jac_int = F.round(F.col("jaccard") * 1e6).cast("long")
    err = F.abs(est_int - jac_int)
    return dedup._own_cache(
        j.select(err.alias("err"))
         .agg(F.count(F.lit(1)).alias("n_pairs"),
              F.round(F.sum("err") / F.count(F.lit(1)) / 1e6, 6)
               .alias("mae"),
              F.round(F.max("err") / 1e6, 6).alias("max_err")),
        [sh, sig])


def _sql_minhash_calibration() -> str:
    agree = " + ".join(
        f"(CASE WHEN sa.sig[{i + 1}] = sb.sig[{i + 1}] THEN 1 ELSE 0 END)"
        for i in range(_NUM_HASHES))
    mins = ", ".join(
        f"list_aggregate(list_transform(g, x -> md5('{s}:' || x)), 'min')"
        for s in range(_NUM_HASHES))
    return f"""
WITH pairs_src AS ({SQL_MINHASH_NEAR_DUPS}),
norm AS (
  SELECT doc_id, string_split({_SQL_NORM}, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, {_SQL_GRAMS} AS g FROM norm WHERE len(t) >= 3
), sigs AS (
  SELECT doc_id, [{mins}] AS sig FROM grams WHERE len(g) > 0
), e AS (
  SELECT abs(({agree}) * {1_000_000 // _NUM_HASHES}
             - CAST(round(p.jaccard * 1000000) AS BIGINT)) AS err
  FROM pairs_src p
  JOIN sigs sa ON p.lo_id = sa.doc_id
  JOIN sigs sb ON p.hi_id = sb.doc_id
)
SELECT count(*) AS n_pairs,
       round(sum(err) * 1.0 / count(*) / 1000000, 6) AS mae,
       round(max(err) / 1000000.0, 6) AS max_err
FROM e
"""


# ------------------------------------------------------ corpus data card

def q_corpus_datacard(spark, sf_dir):
    """One-row corpus data card: the summary block a dataset release ships
    — doc/source/lang counts, token mass, exact-dup rate (fingerprint
    collisions), mean quality, and declared-vs-predicted language
    agreement. One text-profile scan, one global aggregate; every ratio
    is an exact-integer division (float policy)."""
    d = _docs(spark, sf_dir)
    prof = (text.text_profile(d)
            .join(d.select("doc_id", "lang", "source"), "doc_id"))
    q_int = F.round(F.col("quality") * 1e6).cast("long")
    agree = (F.col("lang") == F.col("lang_pred")).cast("long")
    n = F.count(F.lit(1))
    return prof.agg(
        n.alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.countDistinct("fingerprint").alias("n_distinct_fp"),
        F.round((n - F.countDistinct("fingerprint")) / n, 6)
         .alias("exact_dup_rate"),
        F.round(F.sum(q_int) / n / 1e6, 6).alias("avg_quality"),
        F.round(F.sum(agree) / n, 6).alias("lang_agreement"))


SQL_CORPUS_DATACARD = f"""
WITH prof AS ({SQL_TEXT_PROFILE})
SELECT count(*) AS n_docs,
       count(DISTINCT d.source) AS n_sources,
       count(DISTINCT d.lang) AS n_langs,
       CAST(sum(p.n_tokens) AS BIGINT) AS total_tokens,
       count(DISTINCT p.fingerprint) AS n_distinct_fp,
       round((count(*) - count(DISTINCT p.fingerprint)) * 1.0 / count(*), 6)
         AS exact_dup_rate,
       round(sum(CAST(round(p.quality * 1000000) AS BIGINT)) * 1.0
             / count(*) / 1000000, 6) AS avg_quality,
       round(sum(CASE WHEN d.lang = p.lang_pred THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS lang_agreement
FROM prof p JOIN documents d ON p.doc_id = d.doc_id
"""


# ---------------------------------------------------- filtered (hybrid) ANN

#: metadata predicate for the filtered search: corpus restricted to label
ANN_FILT_LABEL, ANN_FILT_K = 3, 10


def q_ann_topk_filtered(spark, sf_dir):
    """Filtered ("hybrid") vector search: exact cosine top-{ANN_FILT_K}
    among vectors whose label == {ANN_FILT_LABEL} — the
    metadata-predicate-plus-similarity query every vector store serves.

    The predicate applies BEFORE any distance math (filter-then-score):
    it reaches the parquet scan as a PushedFilter (pinned in tests), so
    with the table partitioned by label this is partition pruning — the
    engine never scores a vector the filter would drop."""
    from photon_spark.functions.similarity import brute_force_topk

    e = _read_base(spark, sf_dir, "embeddings")
    return brute_force_topk(e, 0, k=ANN_FILT_K,
                            predicate=F.col("label") == ANN_FILT_LABEL)


SQL_ANN_TOPK_FILTERED = f"""
SELECT b.vec_id,
       round(list_cosine_similarity(b.embedding::DOUBLE[],
                                    q.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings b,
     (SELECT embedding FROM embeddings WHERE vec_id = 0) q
WHERE b.label = {ANN_FILT_LABEL} AND b.vec_id != 0
ORDER BY cosine DESC, b.vec_id
LIMIT {ANN_FILT_K}
"""


# ------------------------------------------------------ containment pairs

#: near-containment floor (C = |A∩B| / min|A|,|B|)
CONTAIN_T = 0.9


def q_containment_pairs(spark, sf_dir):
    """Doc-inside-doc mining: pairs whose smaller shingle set is >= 90%
    contained in the larger — the duplication mode Jaccard structurally
    misses when sizes differ (a short doc embedded in one 3x its size has
    C = 1.0 but J <= 0.33). The jaccard column in the output shows which
    of these a Jaccard-thresholded dedup would have kept
    (functions/dedup.py:containment_pairs — same df-capped inverted
    index as the Jaccard miner, minus the size-ratio prune, because
    size-mismatched pairs are the quarry)."""
    return dedup.containment_pairs(_docs(spark, sf_dir), n=3,
                                   threshold=CONTAIN_T)


def _sql_containment_pairs() -> str:
    return f"""
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
), deg AS (
  SELECT doc_id, count(*) AS deg FROM exr GROUP BY doc_id
), common AS (
  SELECT a.doc_id AS lo_id, b.doc_id AS hi_id, count(*) AS n_common
  FROM exr a JOIN exr b ON a.gr = b.gr AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.lo_id, c.hi_id, c.n_common,
       round(c.n_common * 1.0 / least(da.deg, db.deg), 6) AS containment,
       round(c.n_common * 1.0 / (da.deg + db.deg - c.n_common), 6)
         AS jaccard
FROM common c
JOIN deg da ON da.doc_id = c.lo_id
JOIN deg db ON db.doc_id = c.hi_id
WHERE round(c.n_common * 1.0 / least(da.deg, db.deg), 6) >= {CONTAIN_T}
"""


QUERIES = {
    "dedup_keep_best": q_dedup_keep_best,
    "split_leakage": q_split_leakage,
    "split_repair_plan": q_split_repair_plan,
    "dedup_incremental": q_dedup_incremental,
    "pair_table_incremental_audit": q_pair_table_incremental_audit,
    "contamination_bloom": q_contamination_bloom,
    "cross_source_dups": q_cross_source_dups,
    "lang_confusion": q_lang_confusion,
    "ann_topk_multi": q_ann_topk_multi,
    "budget_trim": q_budget_trim,
    "minhash_calibration": q_minhash_calibration,
    "corpus_datacard": q_corpus_datacard,
    "ann_topk_filtered": q_ann_topk_filtered,
    "containment_pairs": q_containment_pairs,
    # The SAMPLED audit parents (q_ann_recall_audit, q_ann_ndcg_audit,
    # q_matryoshka_recall_audit, q_ann_int8_recall_audit) were RETIRED
    # from the gate in round 11: their query batch is a corpus FRACTION
    # (quadratic eval cost — the documented r8/r9 caveat), and the
    # fixedq twins below are the corpus-linear production form of the
    # identical metrics. The functions and their oracles remain as the
    # documented small-n audit tier, pytest-pinned (tests/test_select)
    # and the base the twins' oracles splice from (_with_fixed_q).
    "ann_recall_audit_fixedq": q_ann_recall_audit_fixedq,
    "ann_ndcg_audit_fixedq": q_ann_ndcg_audit_fixedq,
    "matryoshka_recall_audit_fixedq": q_matryoshka_recall_audit_fixedq,
}

ORACLES = {
    "dedup_keep_best": SQL_DEDUP_KEEP_BEST,
    "split_leakage": SQL_SPLIT_LEAKAGE,
    "split_repair_plan": SQL_SPLIT_REPAIR_PLAN,
    "dedup_incremental": _sql_dedup_incremental(),
    "pair_table_incremental_audit": _sql_pair_table_incremental_audit(),
    "contamination_bloom": _sql_contamination_bloom(),
    "cross_source_dups": SQL_CROSS_SOURCE_DUPS,
    "lang_confusion": SQL_LANG_CONFUSION,
    "ann_topk_multi": SQL_ANN_TOPK_MULTI,
    "budget_trim": SQL_BUDGET_TRIM,
    "minhash_calibration": _sql_minhash_calibration(),
    "corpus_datacard": SQL_CORPUS_DATACARD,
    "ann_topk_filtered": SQL_ANN_TOPK_FILTERED,
    "containment_pairs": _sql_containment_pairs(),
    "ann_recall_audit_fixedq": SQL_ANN_RECALL_AUDIT_FIXEDQ,
    "ann_ndcg_audit_fixedq": _with_fixed_q(_sql_ann_ndcg_audit()),
    "matryoshka_recall_audit_fixedq": _with_fixed_q(
        SQL_MATRYOSHKA_RECALL_AUDIT),
}


# --------------------------------------------- end-to-end corpus build

E2E_BUDGET = 200_000     #: global token budget for the final stage
E2E_MIN_QUALITY = 0.5    #: 6dp-gated profile quality floor


def q_corpus_build_e2e(spark, sf_dir):
    """The whole curation pipeline as ONE job — profile → quality/lang
    filter → exact dedup (keep lowest id per fingerprint) → global
    token-budget selection — reported as a per-stage funnel (stage,
    n_docs, n_tokens). The integration story: every stage is the
    already-gated operator, composed on one persisted profile relation
    (one Arrow pass over text; afterwards only ids, fingerprints and
    counts move).

    Scale notes: the budget stage reuses the threshold trick (level
    aggregates + boundary-level prefix) so the global "best docs until
    the budget is spent" order never becomes a single-partition sort of
    the corpus; dedup shuffles fingerprints, not text.
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    prof = (text.text_profile(d)
            .select("doc_id", "n_tokens", "lang_pred", "fingerprint",
                    F.round(F.col("quality") * 1e6).cast("long")
                     .alias("q_int"))
            .persist())

    s1 = prof.where((F.col("q_int") >= int(E2E_MIN_QUALITY * 1e6))
                    & (F.col("lang_pred") != "und"))
    keep = (s1.groupBy("fingerprint")
              .agg(F.min("doc_id").alias("doc_id")))
    s2 = s1.join(keep, ["fingerprint", "doc_id"])

    # global threshold-trick budget over (q_int) levels. The level
    # cumsum runs best-first (q_int desc); levels are bounded at 1e6+1
    # rows, but even that must not become one task's sort at 100 TB —
    # the bucketed prefix-sum kernel (chunking.cumulative_by_bucket)
    # computes the identical inclusive cumsum with per-bucket windows +
    # a ≤245-row driver offset rollup. `ord` = 1e6 − q_int makes the
    # kernel's ascending order the desired descending-quality order.
    from photon_spark.functions.chunking import cumulative_by_bucket
    lev = s2.groupBy("q_int").agg(F.sum("n_tokens").alias("tok_l"))
    lev = cumulative_by_bucket(
        lev.withColumn("ord", (F.lit(1_000_000) - F.col("q_int"))
           .cast("long")),
        "tok_l", "ord", bucket_width=4096)
    lev = (lev.withColumn("cum_before", F.col("cum") - F.col("tok_l"))
              .drop("ord"))
    B = F.lit(E2E_BUDGET)
    docs2 = s2.join(F.broadcast(lev.select("q_int", "cum", "cum_before")),
                    "q_int")
    full = F.col("cum") <= B
    boundary = (F.col("cum_before") <= B) & (F.col("cum") > B)
    wb = (Window.partitionBy("q_int").orderBy("doc_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    bkeep = (docs2.where(boundary)
                  .withColumn("pre", F.sum("n_tokens").over(wb))
                  .where(F.col("cum_before") + F.col("pre") <= B)
                  .select("doc_id", F.lit(1).alias("bkept")))
    kept = full | F.coalesce(F.col("bkept") == 1, F.lit(False))
    s3 = (docs2.join(bkeep, "doc_id", "left")
               .where(kept).select("doc_id", "n_tokens"))

    def stage(idx, name, df):
        return df.agg(F.lit(idx).alias("stage_idx"),
                      F.lit(name).alias("stage"),
                      F.count(F.lit(1)).alias("n_docs"),
                      F.coalesce(F.sum("n_tokens"), F.lit(0))
                       .cast("long").alias("n_tokens"))

    out = (stage(0, "input", prof)
           .unionByName(stage(1, "quality_lang", s1))
           .unionByName(stage(2, "exact_dedup", s2))
           .unionByName(stage(3, "token_budget", s3)))
    out._photon_cached = [prof]  # type: ignore[attr-defined]
    return out


SQL_CORPUS_BUILD_E2E = f"""
WITH prof AS ({SQL_TEXT_PROFILE}),
p AS (
  SELECT doc_id, n_tokens, lang_pred, fingerprint,
         CAST(round(quality * 1000000) AS BIGINT) AS q_int
  FROM prof
),
s1 AS (
  SELECT * FROM p
  WHERE q_int >= {int(E2E_MIN_QUALITY * 1e6)} AND lang_pred <> 'und'
),
s2 AS (
  SELECT s1.* FROM s1
  JOIN (SELECT fingerprint, min(doc_id) AS doc_id
        FROM s1 GROUP BY fingerprint) k
    ON s1.fingerprint = k.fingerprint AND s1.doc_id = k.doc_id
),
c AS (
  SELECT doc_id, n_tokens, sum(n_tokens) OVER (
      ORDER BY q_int DESC, doc_id ASC ROWS UNBOUNDED PRECEDING) AS cum
  FROM s2
),
s3 AS (SELECT doc_id, n_tokens FROM c WHERE cum <= {E2E_BUDGET})
SELECT 0 AS stage_idx, 'input' AS stage, count(*) AS n_docs,
       coalesce(sum(n_tokens), 0)::BIGINT AS n_tokens FROM p
UNION ALL
SELECT 1, 'quality_lang', count(*), coalesce(sum(n_tokens), 0)::BIGINT
FROM s1
UNION ALL
SELECT 2, 'exact_dedup', count(*), coalesce(sum(n_tokens), 0)::BIGINT
FROM s2
UNION ALL
SELECT 3, 'token_budget', count(*), coalesce(sum(n_tokens), 0)::BIGINT
FROM s3
"""

QUERIES["corpus_build_e2e"] = q_corpus_build_e2e
ORACLES["corpus_build_e2e"] = SQL_CORPUS_BUILD_E2E
# the sampled parent (q_ivf_staleness_audit) is retired from the gate
# (round 12) — its recall leg's exact ground truth pairs a corpus-
# FRACTION query batch with the whole corpus (quadratic eval cost, the
# same caveat that retired the four ann_*_audit parents in round 11);
# the fixedq twin below is the gated corpus-linear production form.
# The sampled function, its oracle and its tests remain as the
# documented small-n audit tier.
QUERIES["ivf_staleness_audit_fixedq"] = q_ivf_staleness_audit_fixedq
ORACLES["ivf_staleness_audit_fixedq"] = _with_fixed_q(
    SQL_IVF_STALENESS_AUDIT)


# ---------------------------------------- int8 quantized-serving recall

def q_ann_int8_recall_audit(spark, sf_dir):
    """Recall@k of INT8-QUANTIZED scoring against exact float cosine —
    the eval that decides whether the 4x-cheaper integer tier can serve
    retrieval (the production int8 GEMM path every vector store offers),
    complementing the storage-side error audit
    (embedding_quantize_stats) with the RETRIEVAL consequence of those
    errors. Same query batch as ann_topk_multi/ann_recall_audit
    (vec_id % {qmod} == 0), k = {k}.

    Quantized score: both sides quantize symmetrically (scale =
    max|x|/127, round-half-away), the dot product runs on EXACT int64
    lattice points (hash-safe — no float GEMM re-association anywhere),
    and one IEEE multiply by the corpus vector's scale de-quantizes it
    (the query's scale is constant per query and cannot change ranks,
    so both engines omit it). Scores round to 6dp before ranking (repo
    float-parity policy), ties break on vec_id.

    Plan: map-only quantization, broadcast query batch, integer
    zip_with dot JVM-side, per-query WindowGroupLimit top-k, ids-only
    recall join. Corpus vectors never shuffle.
    """
    from pyspark.sql import Window

    e = _read_base(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    s = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    # nullif guards the all-zeros vector: under ANSI semantics x/0
    # raises even inside the unselected CASE branch of an array
    # transform, so divide by NULL instead and coalesce the result
    qa = F.transform(v, lambda x: F.coalesce(
        F.round(x / F.nullif(s, F.lit(0.0))), F.lit(0.0))
        .cast("long"))
    base = e.select("vec_id", s.alias("xs"), qa.alias("xa"))
    is_q = F.col("vec_id") % ANN_QMOD == 0
    q = (base.where(is_q)
             .select(F.col("vec_id").alias("query_id"),
                     F.col("xa").alias("qa")))
    corpus = base.where(~is_q)

    int_dot = F.aggregate(
        F.zip_with("xa", "qa", lambda a, b: a * b),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    scored = (corpus.crossJoin(F.broadcast(q))
                    .select("query_id", "vec_id",
                            F.round(F.col("xs") * int_dot, 6)
                             .alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(),
                                               F.col("vec_id"))
    int8 = (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= ANN_MULTI_K)
                  .select("query_id", "vec_id", F.lit(1).alias("hit")))

    exact = q_ann_topk_multi(spark, sf_dir).select("query_id", "vec_id")
    return (exact.join(int8, ["query_id", "vec_id"], "left")
                 .groupBy("query_id")
                 .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("long")
                       .alias("n_hits"),
                      F.round(F.sum(F.coalesce("hit", F.lit(0)))
                              / F.lit(ANN_MULTI_K), 6).alias("recall")))


q_ann_int8_recall_audit.__doc__ = q_ann_int8_recall_audit.__doc__.format(
    qmod=ANN_QMOD, k=ANN_MULTI_K)


SQL_ANN_INT8_RECALL_AUDIT = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
), quant AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS xs,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
              THEN list_transform(v, x -> 0::BIGINT)
              ELSE list_transform(v, x -> CAST(round(
                     x / (list_max(list_transform(v, y -> abs(y)))
                          / 127.0)) AS BIGINT)) END AS xa
  FROM base
), q AS (
  SELECT vec_id AS query_id, v AS qv, xa AS qa FROM quant
  WHERE vec_id % {ANN_QMOD} = 0
), corpus AS (
  SELECT vec_id, v, xs, xa FROM quant WHERE vec_id % {ANN_QMOD} != 0
), exact AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, c.vec_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(c.v, q.qv), 6) DESC,
                      c.vec_id) AS rank
    FROM corpus c CROSS JOIN q) WHERE rank <= {ANN_MULTI_K}
), dots AS (
  SELECT q.query_id, c.vec_id, c.xs,
         sum(c.xa[s.i] * q.qa[s.i]) AS int_dot
  FROM corpus c CROSS JOIN q CROSS JOIN generate_series(1, 64) s(i)
  GROUP BY 1, 2, 3
), int8 AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY round(xs * int_dot, 6) DESC, vec_id) AS rank
    FROM dots) WHERE rank <= {ANN_MULTI_K}
)
SELECT e.query_id,
       CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       round(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / {ANN_MULTI_K}, 6) AS recall
FROM exact e
LEFT JOIN int8 i ON i.query_id = e.query_id AND i.vec_id = e.vec_id
GROUP BY 1
"""


# the sampled parent (q_ann_int8_recall_audit) is retired from the gate
# (round 11) — see the registry note above; only the fixedq twin is gated
QUERIES["ann_int8_recall_audit_fixedq"] = q_ann_int8_recall_audit_fixedq
ORACLES["ann_int8_recall_audit_fixedq"] = _with_fixed_q(
    SQL_ANN_INT8_RECALL_AUDIT)
