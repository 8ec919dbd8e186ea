"""Exact-substring & paragraph-level dedup gate queries — the two dedup
modalities beside set-similarity (MinHash/SimHash/Jaccard/containment,
queries_northstar/select): exact repeated token spans (Lee et al. 2021)
and exact repeated fixed-window "paragraphs" (the Gopher/MassiveText
duplicate-paragraph-fraction signal).

Reference anchor: photon has no dedup surface (SURVEY §2.8); these are
driver-mandated north-star extensions over the documents table, built on
functions/substring.py and functions/chunking.py.

The corpus here is single-line synthetic text (no newlines), so
"paragraph" is a fixed non-overlapping character window — the operator
shape (chunk → exact content hash → corpus-wide repeat count → per-source
fraction) is exactly what a newline-split paragraph dedup runs; only the
chunker changes.

Float policy (queries.py): all measures are integer counts; the only
divisions are final ratios rounded to 6dp on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from photon_spark.functions import substring
from photon_spark.functions.chunking import chunk_docs
from photon_spark.queries_northstar import _SQL_TOKS
from photon_spark.relations import read_base as _read_base

#: repeated-span gram length (tokens) — see substring.SPAN_L
SPAN_L = substring.SPAN_L
#: pair-mining posting cap — see substring.SPAN_MAX_OCC
SPAN_MAX_OCC = substring.SPAN_MAX_OCC
#: "paragraph" window for the corpus's single-line docs (chars,
#: non-overlapping)
PARA_SIZE = 100


def _docs(spark, sf_dir):
    return _read_base(spark, sf_dir, "documents")


# ------------------------------------------------- pairwise maximal spans

def q_exact_substring_dedup(spark, sf_dir):
    """Maximal cross-doc repeated spans ≥ SPAN_L tokens, aggregated per
    document pair: how many distinct maximal spans two docs share, the
    longest one, and the total span tokens — the exact-substring dedup
    relation a trim/removal pass consumes. Scale shape in
    functions/substring.py (gram postings + diagonal chaining; no global
    suffix sort, posting-capped pair join)."""
    spans = substring.repeated_spans(_docs(spark, sf_dir), SPAN_L,
                                     SPAN_MAX_OCC)
    return (spans.groupBy("lo_id", "hi_id")
                 .agg(F.count(F.lit(1)).alias("n_spans"),
                      F.max("span_len").cast("long").alias("max_span_len"),
                      F.sum("span_len").cast("long").alias("span_tokens")))


SQL_EXACT_SUBSTRING_DEDUP = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents
),
g AS (
  SELECT doc_id, i - 1 AS pos,
         md5(array_to_string(t[i:i+{SPAN_L}-1], ' ')) AS gh
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, len(t) - {SPAN_L} + 1)) AS i)
  WHERE len(t) >= {SPAN_L}
),
occ AS (
  SELECT doc_id, pos, gh, count(*) OVER (PARTITION BY gh) AS occ FROM g
),
dup AS (
  SELECT doc_id, pos, gh FROM occ
  WHERE occ BETWEEN 2 AND {SPAN_MAX_OCC}
),
m AS (
  SELECT a.doc_id AS lo_id, b.doc_id AS hi_id, a.pos AS pa,
         a.pos - b.pos AS diag
  FROM dup a JOIN dup b ON a.gh = b.gh AND a.doc_id < b.doc_id
),
r AS (
  SELECT lo_id, hi_id, diag, pa,
         CASE WHEN pa - lag(pa) OVER w = 1 THEN 0 ELSE 1 END AS nr
  FROM m WINDOW w AS (PARTITION BY lo_id, hi_id, diag ORDER BY pa)
),
runs AS (
  SELECT lo_id, hi_id, diag, pa,
         sum(nr) OVER (PARTITION BY lo_id, hi_id, diag ORDER BY pa
                       ROWS UNBOUNDED PRECEDING) AS run_id
  FROM r
),
spans AS (
  SELECT lo_id, hi_id, max(pa) - min(pa) + {SPAN_L} AS span_len
  FROM runs GROUP BY lo_id, hi_id, diag, run_id
)
SELECT lo_id, hi_id, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(max(span_len) AS BIGINT) AS max_span_len,
       CAST(sum(span_len) AS BIGINT) AS span_tokens
FROM spans GROUP BY lo_id, hi_id
"""


# ------------------------------------------------ per-doc span coverage

def q_exact_substring_doc_fraction(spark, sf_dir):
    """Per-document repeated-span token coverage (the Lee-et-al dedup
    signal a removal threshold is applied to): docs with ≥ 1 token
    inside a corpus-duplicated span of ≥ SPAN_L tokens, with the exact
    covered-token count and fraction. No pair relation — one gram-keyed
    exchange + one doc-keyed window (functions/substring.py)."""
    return substring.repeated_span_profile(_docs(spark, sf_dir), SPAN_L)


SQL_EXACT_SUBSTRING_DOC_FRACTION = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents
),
g AS (
  SELECT doc_id, len(t)::BIGINT AS n_tokens, i - 1 AS pos,
         md5(array_to_string(t[i:i+{SPAN_L}-1], ' ')) AS gh
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, len(t) - {SPAN_L} + 1)) AS i)
  WHERE len(t) >= {SPAN_L}
),
occ AS (
  SELECT doc_id, n_tokens, pos,
         count(*) OVER (PARTITION BY gh) AS occ
  FROM g
),
dup AS (
  SELECT doc_id, n_tokens, pos FROM occ WHERE occ >= 2
),
cov AS (
  SELECT doc_id, n_tokens,
         coalesce(least({SPAN_L}, lead(pos) OVER w - pos), {SPAN_L}) AS c
  FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
)
SELECT doc_id, n_tokens, CAST(sum(c) AS BIGINT) AS dup_tokens,
       round(sum(c) / CAST(n_tokens AS DOUBLE), 6) AS dup_frac
FROM cov GROUP BY doc_id, n_tokens
"""


# ------------------------------------------- paragraph (chunk) exact dedup

def q_paragraph_dedup(spark, sf_dir):
    """Duplicate-paragraph fraction per source: split every doc into
    fixed {PARA_SIZE}-char non-overlapping windows (the corpus is
    single-line; see module docstring), hash exact content, count
    corpus-wide repeats, and report per source how many paragraphs are
    duplicated and how many docs carry at least one.

    Scale shape: chunking is a map-side explode (functions/chunking.py);
    the repeat count is one exchange on the content hash; the source
    rollup moves (doc, source, flag) only — text never shuffles past the
    md5."""
    d = _docs(spark, sf_dir)
    chunks = chunk_docs(d, PARA_SIZE, 0)
    from pyspark.sql import Window
    occ = chunks.withColumn(
        "occ", F.count(F.lit(1)).over(Window.partitionBy("chunk_md5")))
    per_doc = (occ.groupBy(F.col("doc_id"))
                  .agg(F.count(F.lit(1)).alias("n_chunks"),
                       F.sum((F.col("occ") >= 2).cast("long"))
                        .alias("n_dup_chunks")))
    return (per_doc.join(d.select("doc_id", "source"), "doc_id")
                   .groupBy("source")
                   .agg(F.count(F.lit(1)).alias("n_docs"),
                        F.sum("n_chunks").cast("long").alias("n_paras"),
                        F.sum("n_dup_chunks").cast("long")
                         .alias("n_dup_paras"),
                        F.sum((F.col("n_dup_chunks") > 0).cast("long"))
                         .alias("n_docs_with_dup"),
                        F.round(F.sum("n_dup_chunks")
                                / F.sum("n_chunks"), 6)
                         .alias("dup_para_frac")))


SQL_PARAGRAPH_DEDUP = f"""
WITH d AS (
  SELECT doc_id, source, text, length(text) AS L FROM documents
),
n AS (
  SELECT doc_id, source, text,
         CASE WHEN L <= {PARA_SIZE} THEN 1
              ELSE CAST(ceil((L - {PARA_SIZE}) / {PARA_SIZE}.0) AS BIGINT) + 1
         END AS nc
  FROM d
),
e AS (
  SELECT doc_id, source, text, unnest(range(0, nc)) AS ci FROM n
),
h AS (
  SELECT doc_id, source,
         md5(substr(text, ci * {PARA_SIZE} + 1, {PARA_SIZE})) AS chunk_md5
  FROM e
),
occ AS (
  SELECT doc_id, source,
         count(*) OVER (PARTITION BY chunk_md5) AS occ
  FROM h
),
per_doc AS (
  SELECT doc_id, source, count(*) AS n_chunks,
         sum(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS n_dup_chunks
  FROM occ GROUP BY doc_id, source
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chunks) AS BIGINT) AS n_paras,
       CAST(sum(n_dup_chunks) AS BIGINT) AS n_dup_paras,
       CAST(sum(CASE WHEN n_dup_chunks > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_with_dup,
       round(sum(n_dup_chunks) / CAST(sum(n_chunks) AS DOUBLE), 6)
         AS dup_para_frac
FROM per_doc GROUP BY source
"""


# ------------------------------------------------ trim (removal) plan

def q_exact_substring_trim(spark, sf_dir):
    """The removal decision: keep the globally-first occurrence of each
    duplicated ≥SPAN_L-token gram, plan to cut the rest — per doc, the
    exact token count a trim pass removes and what survives. One rank
    window on the already-exchanged gram key beyond the profile's cost
    (functions/substring.py trim_plan)."""
    return substring.trim_plan(_docs(spark, sf_dir), SPAN_L)


SQL_EXACT_SUBSTRING_TRIM = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents
),
g AS (
  SELECT doc_id, len(t)::BIGINT AS n_tokens, i - 1 AS pos,
         md5(array_to_string(t[i:i+{SPAN_L}-1], ' ')) AS gh
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, len(t) - {SPAN_L} + 1)) AS i)
  WHERE len(t) >= {SPAN_L}
),
occ AS (
  SELECT doc_id, n_tokens, pos,
         count(*) OVER (PARTITION BY gh) AS occ,
         row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rk
  FROM g
),
removable AS (
  SELECT doc_id, n_tokens, pos FROM occ WHERE occ >= 2 AND rk >= 2
),
cov AS (
  SELECT doc_id, n_tokens,
         coalesce(least({SPAN_L}, lead(pos) OVER w - pos), {SPAN_L}) AS c
  FROM removable WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
)
SELECT doc_id, n_tokens, CAST(sum(c) AS BIGINT) AS trim_tokens,
       CAST(n_tokens - sum(c) AS BIGINT) AS kept_tokens
FROM cov GROUP BY doc_id, n_tokens
"""


# --------------------------------------- paragraph-level NEAR dedup

#: synthetic chunk-id stride: chunk_id = doc_id * _CHUNK_ID_STRIDE + idx
#: (doc_id ≲ 5e4 even at sf0.1 → ids fit comfortably in a BIGINT)
_CHUNK_ID_STRIDE = 100000


def _chunk_relation(spark, sf_dir):
    """(chunk_id, text) fixed-window chunk relation — the SAME
    chunk_docs windows as q_paragraph_dedup (with_text=True; one shared
    boundary rule, no drift), chunk_id encodes (doc, idx)."""
    chunks = chunk_docs(_docs(spark, sf_dir), PARA_SIZE, 0, with_text=True)
    return chunks.select(
        (F.col("doc_id") * _CHUNK_ID_STRIDE + F.col("chunk_idx"))
         .alias("doc_id"),
        F.col("chunk_text").alias("text"))


def q_paragraph_minhash_dedup(spark, sf_dir):
    """Paragraph-level NEAR dedup: the MinHash-LSH miner run at chunk
    granularity (the composition the round-4 verdict sketched — chunker
    + MinHash over chunks), then rolled up to DOCUMENT pairs: which doc
    pairs share near-duplicate paragraphs, how many, and how strong.
    Catches partial-overlap docs whose whole-doc Jaccard is diluted
    below the doc-level threshold.

    Scale shape: chunking is a map-side explode; the miner is the
    banded, candidate-verified pipeline from functions/dedup.py at ~3×
    the row count and ~1/3 the text per row; the rollup moves id pairs
    only."""
    from photon_spark.functions import dedup
    chunks = _chunk_relation(spark, sf_dir)
    pairs = dedup.minhash_near_duplicates(chunks)
    lo_doc = F.expr(f"lo_id div {_CHUNK_ID_STRIDE}")
    hi_doc = F.expr(f"hi_id div {_CHUNK_ID_STRIDE}")
    doc_lo = F.least(lo_doc, hi_doc)
    doc_hi = F.greatest(lo_doc, hi_doc)
    j_int = F.round(F.col("jaccard") * 1e6).cast("long")
    return dedup._own_cache(
        pairs.select(doc_lo.alias("doc_lo"), doc_hi.alias("doc_hi"),
                     j_int.alias("j_int"))
             .where(F.col("doc_lo") != F.col("doc_hi"))
             .groupBy("doc_lo", "doc_hi")
             .agg(F.count(F.lit(1)).alias("n_chunk_pairs"),
                  F.round(F.max("j_int") / 1e6, 6).alias("max_jaccard")),
        getattr(pairs, "_photon_cached", []))


def _sql_paragraph_minhash() -> str:
    from photon_spark.queries_northstar import _sql_minhash
    chunk_src = f"""(
  SELECT doc_id * {_CHUNK_ID_STRIDE} + ci AS doc_id,
         substr(text, ci * {PARA_SIZE} + 1, {PARA_SIZE}) AS text
  FROM (
    SELECT doc_id, text,
           unnest(range(0, CASE WHEN length(text) <= {PARA_SIZE} THEN 1
                  ELSE CAST(ceil((length(text) - {PARA_SIZE})
                            / {PARA_SIZE}.0) AS BIGINT) + 1 END)) AS ci
    FROM documents))"""
    return f"""
WITH chunk_pairs AS ({_sql_minhash(chunk_src)})
SELECT least(lo_id // {_CHUNK_ID_STRIDE}, hi_id // {_CHUNK_ID_STRIDE})
         AS doc_lo,
       greatest(lo_id // {_CHUNK_ID_STRIDE}, hi_id // {_CHUNK_ID_STRIDE})
         AS doc_hi,
       CAST(count(*) AS BIGINT) AS n_chunk_pairs,
       round(max(CAST(round(jaccard * 1000000) AS BIGINT)) / 1000000.0, 6)
         AS max_jaccard
FROM chunk_pairs
WHERE lo_id // {_CHUNK_ID_STRIDE} != hi_id // {_CHUNK_ID_STRIDE}
GROUP BY 1, 2
"""


SQL_PARAGRAPH_MINHASH_DEDUP = _sql_paragraph_minhash()


QUERIES = {
    "exact_substring_dedup": q_exact_substring_dedup,
    "exact_substring_doc_fraction": q_exact_substring_doc_fraction,
    "paragraph_dedup": q_paragraph_dedup,
    "paragraph_minhash_dedup": q_paragraph_minhash_dedup,
    "exact_substring_trim": q_exact_substring_trim,
}

ORACLES = {
    "exact_substring_dedup": SQL_EXACT_SUBSTRING_DEDUP,
    "exact_substring_doc_fraction": SQL_EXACT_SUBSTRING_DOC_FRACTION,
    "paragraph_dedup": SQL_PARAGRAPH_DEDUP,
    "paragraph_minhash_dedup": SQL_PARAGRAPH_MINHASH_DEDUP,
    "exact_substring_trim": SQL_EXACT_SUBSTRING_TRIM,
}
