"""Exact-substring deduplication — the Lee-et-al. ("Deduplicating
Training Data Makes Language Models Better", 2021) modality: find exact
token spans of length ≥ L that occur more than once in the corpus, and
report (a) the maximal repeated spans per document pair and (b) each
document's repeated-span token fraction.

Reference anchor: photon has no dedup operators at all (its test surface
only counts events, test/photon/current/projections.clj:96-110); this is
the driver-mandated exact-substring member of the dedup family beside
MinHash/SimHash/Jaccard/containment (functions/dedup.py).

Scale shape — suffix-array semantics WITHOUT a global suffix sort:

- The suffix array's only job here is finding repeats ≥ L; fixed-L
  token-gram postings find exactly the same repeats (a repeated span of
  length S ≥ L is a run of S − L + 1 repeated L-grams), and postings are
  embarrassingly parallel: one map-side explode per document, one
  exchange on the gram hash to count occurrences.
- Per-doc coverage (:func:`repeated_span_profile`) is an interval union
  of equal-length intervals: one doc-keyed window, coverage =
  Σ min(L, next_pos − pos) — no pair relation is ever built, so the
  profile costs two exchanges at any corpus size.
- Pair spans (:func:`repeated_spans`) join duplicated-gram postings on
  the gram hash — bounded by the occurrence cap exactly like the
  MAX_SHINGLE_DF posting cap in dedup.py (an uncapped boilerplate gram
  in 10⁶ docs would emit 10¹² matches; capped, the join output is
  ≤ cap² per gram). Runs of consecutive matches merge per (pair,
  diagonal) with one window — the classic dot-plot diagonal chaining,
  all JVM-side.

Only (gram_hash, doc, pos) triples ever shuffle; token arrays stay in
the map stage and document text never moves. Gram identity is md5 of the
joined tokens (128-bit; collisions negligible and the DuckDB oracle
hashes identically, so the gate would surface one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from photon_spark.functions import text

#: default repeated-span threshold, in tokens. Lee et al. use 50 BPE
#: tokens on web corpora; the synthetic corpus here averages ~50 tokens
#: per doc, so the scaled analogue is 15.
SPAN_L = 15

#: posting cap for the pair miner (same role as dedup.MAX_SHINGLE_DF):
#: grams occurring more than this many times are boilerplate and are
#: excluded from PAIR mining (the per-doc profile keeps them — coverage
#: needs no join, so it can afford exactness).
SPAN_MAX_OCC = 50


def token_grams(df: DataFrame, n: int, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, pos, gh): every length-``n`` token gram of every
    document with its 0-based start position and md5 gram hash.
    Documents shorter than ``n`` tokens contribute nothing (they cannot
    contain a repeated span of length ≥ n)."""
    base = (df.select(F.col(id_col).alias("id"),
                      text.tokens(text_col).alias("t"))
              .where(F.size("t") >= n))
    grams = F.expr(
        f"transform(sequence(0, size(t) - {n}), "
        f"i -> struct(i AS pos, md5(array_join(slice(t, i + 1, {n}), ' ')) "
        f"AS gh))")
    return (base.select("id", F.size("t").cast("long").alias("n_tokens"),
                        F.explode(grams).alias("x"))
                .select("id", "n_tokens",
                        F.col("x.pos").cast("long").alias("pos"),
                        F.col("x.gh").alias("gh")))


def _coverage(occurrences: DataFrame, n: int) -> DataFrame:
    """Exact interval union of the equal-length windows [pos, pos+n)
    over each doc's occurrence rows → (doc_id, n_tokens, covered
    tokens). With positions sorted per doc, each occurrence contributes
    min(n, next_pos − pos), the last one n. ONE definition shared by
    the profile and the trim plan, so the two can never disagree on
    what 'covered' means."""
    wd = Window.partitionBy("id").orderBy("pos")
    covered = F.coalesce(
        F.least(F.lit(n).cast("long"), F.lead("pos").over(wd) - F.col("pos")),
        F.lit(n).cast("long"))
    return (occurrences.withColumn("c", covered)
            .groupBy(F.col("id").alias("doc_id"), "n_tokens")
            .agg(F.sum("c").cast("long").alias("covered")))


def _dup_occurrences(grams: DataFrame, min_occ: int = 2,
                     max_occ: int | None = None) -> DataFrame:
    """Gram occurrences whose corpus-wide occurrence count is in
    [min_occ, max_occ] — the windowed-count idiom from dedup.py's df cap
    (one exchange on gh, which downstream joins need anyway)."""
    w = Window.partitionBy("gh")
    occ = grams.withColumn("occ", F.count(F.lit(1)).over(w))
    out = occ.where(F.col("occ") >= min_occ)
    if max_occ is not None:
        out = out.where(F.col("occ") <= max_occ)
    return out


def repeated_span_profile(df: DataFrame, n: int = SPAN_L,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Per-document repeated-span coverage: (doc_id, n_tokens,
    dup_tokens, dup_frac) for every doc with ≥ 1 token covered by a
    corpus-duplicated span of ≥ ``n`` tokens. "Duplicated" counts every
    repeat — cross-doc AND within-doc — matching Lee et al.'s
    any-second-occurrence rule.

    Coverage is the union of the equal-length intervals
    [pos, pos + n) over the doc's duplicated grams: with positions
    sorted, each contributes min(n, next_pos − pos) (the last one n) —
    an exact interval union in one doc-keyed window (_coverage), no
    pair relation."""
    grams = token_grams(df, n, text_col, id_col)
    dup = _dup_occurrences(grams)
    return (_coverage(dup, n)
            .select("doc_id", "n_tokens",
                    F.col("covered").alias("dup_tokens"),
                    F.round(F.col("covered") / F.col("n_tokens"), 6)
                     .alias("dup_frac")))


def trim_plan(df: DataFrame, n: int = SPAN_L, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """The removal DECISION on top of the span signal — Lee et al. keep
    one copy of each duplicated span and cut the rest. Keeper rule:
    the globally-first occurrence of each duplicated gram (lowest
    doc_id, then lowest pos) survives; every later occurrence is
    removable. Returns per doc (doc_id, n_tokens, trim_tokens,
    kept_tokens): the exact token count a trim pass would cut (interval
    union of the removable occurrences' [pos, pos+n) windows).

    Scale shape: identical to repeated_span_profile plus ONE rank
    window on the gram key the occurrence count already exchanged on —
    no joins, no pair relation."""
    grams = token_grams(df, n, text_col, id_col)
    wg = Window.partitionBy("gh")
    wr = Window.partitionBy("gh").orderBy("id", "pos")
    occ = (grams.withColumn("occ", F.count(F.lit(1)).over(wg))
                .withColumn("rk", F.row_number().over(wr)))
    removable = occ.where((F.col("occ") >= 2) & (F.col("rk") >= 2))
    return (_coverage(removable, n)
            .select("doc_id", "n_tokens",
                    F.col("covered").alias("trim_tokens"),
                    (F.col("n_tokens") - F.col("covered")).cast("long")
                     .alias("kept_tokens")))


def repeated_spans(df: DataFrame, n: int = SPAN_L,
                   max_occ: int = SPAN_MAX_OCC, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Maximal cross-document repeated spans ≥ ``n`` tokens:
    (lo_id, hi_id, start_a, start_b, span_len), one row per maximal
    span. A shared span of length S appears as S − n + 1 consecutive
    shared grams on one (pair, diagonal = pos_a − pos_b); chaining those
    runs back into spans is one window + one aggregation.

    Maximality is per diagonal (the dot-plot sense): a span is not
    extendable left or right on its own alignment. Grams occurring more
    than ``max_occ`` times are excluded from pair mining (posting cap —
    see SPAN_MAX_OCC); the profile keeps them, so capping here never
    silently hides corpus-level duplication, only which PAIRS carry it."""
    grams = token_grams(df, n, text_col, id_col)
    dup = _dup_occurrences(grams, 2, max_occ).select("id", "pos", "gh")
    a, b = dup.alias("a"), dup.alias("b")
    m = (a.join(b, (F.col("a.gh") == F.col("b.gh"))
                & (F.col("a.id") < F.col("b.id")))
          .select(F.col("a.id").alias("lo_id"), F.col("b.id").alias("hi_id"),
                  F.col("a.pos").alias("pa"), F.col("b.pos").alias("pb"),
                  (F.col("a.pos") - F.col("b.pos")).alias("diag")))
    w = Window.partitionBy("lo_id", "hi_id", "diag").orderBy("pa")
    new_run = F.when(F.col("pa") - F.lag("pa").over(w) == 1,
                     F.lit(0)).otherwise(F.lit(1))
    runs = (m.withColumn("nr", new_run)
             .withColumn("run_id", F.sum("nr").over(w)))
    return (runs.groupBy("lo_id", "hi_id", "diag", "run_id")
                .agg(F.min("pa").alias("start_a"),
                     F.min("pb").alias("start_b"),
                     (F.max("pa") - F.min("pa") + n).cast("long")
                      .alias("span_len"))
                .drop("diag", "run_id"))
