"""Round-3 operators: mixture resampling, bucketed range join, exact
quantiles, collocations, SemDeDup, n-gram novelty, media phash dedup,
PQ-ANN — behavior + plan-shape pins.

The DuckDB hash gate (tools/check_correctness.py) covers value parity;
these tests pin the SEMANTIC guarantees (equivalence to naive forms,
recall floors, invariants) and the scale-critical plan shapes.
"""

import pytest
from pyspark.sql import functions as F

from photon_spark.functions import multimodal, similarity


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    spark.catalog.clearCache()
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------ mixture resample

def test_mixture_resample_matches_plan_expectation(spark, sf_dir):
    """n_copies ∈ {⌊w⌋, ⌊w⌋+1} per doc, and the realized per-lang copy
    mass stays within the binomial envelope of the planned weight."""
    from photon_spark.queries_enrich import (q_mixture_resample,
                                             q_mixture_reweight_plan)
    plan = {r["lang"]: r["weight"]
            for r in q_mixture_reweight_plan(spark, sf_dir).collect()}
    rows = q_mixture_resample(spark, sf_dir).collect()
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["n_copies"])
    assert set(by_lang) == set(plan)
    import math
    for lang, copies in by_lang.items():
        w = plan[lang]
        lo, hi = math.floor(w), math.floor(w) + 1
        assert all(c in (lo, hi) for c in copies)
        n = len(copies)
        # mean realized copies ≈ weight: 4σ binomial envelope
        frac = w - lo
        sd = math.sqrt(max(frac * (1 - frac), 1e-12) / n)
        assert abs(sum(copies) / n - w) < 4 * sd + 1e-6


def test_mixture_resample_is_map_only_after_broadcast(spark, sf_dir):
    # the corpus side must never shuffle: one broadcast join, no
    # hash-partitioning exchange on the doc stream
    from photon_spark.queries_enrich import q_mixture_resample
    plan = _plan(q_mixture_resample(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    doc_exchanges = [ln for ln in plan.splitlines()
                     if "Exchange hashpartitioning" in ln and "doc_id" in ln]
    assert not doc_exchanges


# ------------------------------------------------------------ range join

def test_range_join_equals_naive_inequality_join(spark, sf_dir):
    from photon_spark.queries import _t
    from photon_spark.queries_enrich import RANGE_NS, q_events_range_join
    got = {(r["purchase_id"], r["user_id"]): r["n_clicks_1h"]
           for r in q_events_range_join(spark, sf_dir).collect()}
    e = _t(spark, sf_dir, "events")
    p = (e.where(F.col("event_type") == "purchase")
          .select(F.col("event_id").alias("pid"), "user_id",
                  F.col("ts").alias("pts")))
    c = (e.where(F.col("event_type") == "click")
          .select(F.col("user_id").alias("cu"), F.col("ts").alias("cts")))
    naive = (p.join(c, (F.col("user_id") == F.col("cu"))
                    & (F.col("cts") >= F.col("pts") - F.lit(RANGE_NS))
                    & (F.col("cts") <= F.col("pts")), "left")
              .groupBy("pid", "user_id")
              .agg(F.count("cts").alias("n")))
    want = {(r["pid"], r["user_id"]): r["n"] for r in naive.collect()}
    assert got == want


def test_range_join_avoids_nested_loop(spark, sf_dir):
    from photon_spark.queries_enrich import q_events_range_join
    plan = _plan(q_events_range_join(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# -------------------------------------------------------- exact quantiles

def test_quality_quantiles_are_order_stats(spark, sf_dir):
    from photon_spark.queries_pipeline import q_quality_quantiles_by_lang
    from photon_spark.functions import text
    rows = q_quality_quantiles_by_lang(spark, sf_dir).collect()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    by_lang = {}
    prof = (text.text_profile(d).select("doc_id", "quality")
            .join(d.select("doc_id", "lang"), "doc_id").collect())
    for r in prof:
        by_lang.setdefault(r["lang"], []).append(r["quality"])
    for r in rows:
        vals = sorted(by_lang[r["lang"]])
        n = len(vals)
        assert r["n_docs"] == n
        assert r["p25"] <= r["p50"] <= r["p75"] <= r["p90"]
        for p in (25, 50, 75, 90):
            assert r[f"p{p}"] == vals[(n * p + 99) // 100 - 1]


# ---------------------------------------------------------- collocations

def test_bigram_lift_invariants(spark, sf_dir):
    from photon_spark.queries_pipeline import (LIFT_TOPK, MIN_COOC,
                                               q_bigram_lift_topk)
    rows = q_bigram_lift_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= LIFT_TOPK
    assert all(r["n_cooc"] >= MIN_COOC for r in rows)
    assert all(r["lift"] > 0 for r in rows)
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)


# -------------------------------------------------------------- semdedup

def test_semdedup_pairs_subset_of_bruteforce(spark, sf_dir):
    """Every SemDeDup pair is a true ≥θ pair (no false positives — the
    cluster prune only drops cross-cluster candidates), and within-cluster
    coverage is exact: the intersection of brute-force pairs with
    same-cluster membership equals the semdedup output."""
    from photon_spark.functions.clustering import kmeans_fit
    from photon_spark.functions.dedup import embedding_near_duplicates_bruteforce
    from photon_spark.queries_curation import (KM_ITERS, KM_K, SEM_THETA,
                                               q_semdedup_pairs)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {(r["lo_id"], r["hi_id"]) for r in
           q_semdedup_pairs(spark, sf_dir).collect()}
    brute = {(r["lo_id"], r["hi_id"]) for r in
             embedding_near_duplicates_bruteforce(
                 emb, threshold=SEM_THETA).collect()}
    assert got <= brute
    assigned, _ = kmeans_fit(emb, k=KM_K, iters=KM_ITERS)
    cl = {r["vec_id"]: r["cluster_id"] for r in assigned.collect()}
    same_cluster = {p for p in brute if cl[p[0]] == cl[p[1]]}
    assert got == same_cluster


def test_cluster_balanced_sample_quota(spark, sf_dir):
    """Every cell yields min(quota, size) samples, and the id sum matches
    an independent recomputation of the md5 rank rule."""
    import hashlib
    from photon_spark.functions.clustering import kmeans_fit
    from photon_spark.queries_curation import (CB_QUOTA, KM_ITERS, KM_K,
                                               q_cluster_balanced_sample)
    rows = q_cluster_balanced_sample(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned, _ = kmeans_fit(emb, k=KM_K, iters=KM_ITERS)
    members: dict[int, list[int]] = {}
    for r in assigned.collect():
        members.setdefault(r["cluster_id"], []).append(r["vec_id"])
    assert {r["cluster_id"] for r in rows} == set(members)
    for r in rows:
        ids = members[r["cluster_id"]]
        assert r["n_members"] == len(ids)
        assert r["n_sampled"] == min(CB_QUOTA, len(ids))
        picked = sorted(ids, key=lambda i: (
            hashlib.md5(f"cb:{i}".encode()).hexdigest(), i))[:CB_QUOTA]
        assert r["sampled_id_sum"] == sum(picked)


# -------------------------------------------------------- n-gram novelty

def test_ngram_novelty_invariants(spark, sf_dir):
    from photon_spark.queries_northstar import q_doc_ngram_novelty
    rows = q_doc_ngram_novelty(spark, sf_dir).collect()
    assert rows
    by_id = {r["doc_id"]: r for r in rows}
    first = by_id[min(by_id)]
    # the lowest-id doc introduces every one of its shingles
    assert first["n_novel"] == first["n_shingles"]
    assert first["novelty_rate"] == 1.0
    assert all(0 <= r["n_novel"] <= r["n_shingles"] for r in rows)


# ------------------------------------------------------------ media phash

def test_phash_bands_formula_and_candidates(spark):
    """Band keys match the closed-form recomputation, and every ≤T pair
    shares ≥1 band (the LSH guarantee the equi-join relies on)."""
    media = multimodal.synthesize_media(spark, n=32)
    got = {r["media_id"]: r["bands"] for r in
           multimodal.phash_bands(media).collect()}
    import numpy as np
    for i in range(32):
        L = 256 + (i % 5) * 64
        arr = np.array([(i * 31 + j * 7) % 256 for j in range(L)],
                       dtype=np.int64)
        segs = arr.reshape(64, L // 64).sum(axis=1)
        bits = segs * 64 >= segs.sum()
        want = [int(sum(1 << k for k in range(16) if bits[16 * m + k]))
                for m in range(4)]
        assert got[i] == want


def test_phash_near_dups_verified_by_hamming(spark, sf_dir):
    from photon_spark.queries_northstar import (PHASH_HAM_T,
                                                q_media_phash_near_dups)
    rows = q_media_phash_near_dups(spark, sf_dir).collect()
    assert rows
    assert all(0 <= r["hamming"] <= PHASH_HAM_T for r in rows)
    assert all(r["lo_id"] < r["hi_id"] for r in rows)


# ---------------------------------------------------------------- PQ ANN

def test_pq_topk_recall_vs_bruteforce(emb):
    """ADC shortlist + exact re-rank must recover most of the exact
    cosine top-10 — the recall floor that makes the 128× compression
    acceptable (the shortlist bounds it; rerank makes survivors exact)."""
    exact = {r["vec_id"] for r in
             similarity.brute_force_topk(emb, 0, k=10).collect()}
    pq = {r["vec_id"] for r in similarity.pq_topk(emb, 0, k=10).collect()}
    assert len(pq & exact) >= 5


def test_pq_rerank_scores_are_exact(emb):
    """Every returned (vec_id, cosine) matches the brute-force cosine for
    that id — the rerank pass is exact, only the candidate SET is
    approximate."""
    brute = {r["vec_id"]: r["cosine"] for r in
             similarity.brute_force_topk(emb, 0, k=500,
                                         exclude_query=True).collect()}
    for r in similarity.pq_topk(emb, 0, k=10).collect():
        assert r["cosine"] == brute[r["vec_id"]]


def test_pq_plan_shape(emb):
    # ADC shortlist: literal lookups + TakeOrdered (no window, no
    # cartesian); rerank joins the tiny shortlist back via broadcast —
    # the vector table itself never hash-shuffles
    plan = _plan(similarity.pq_topk(emb, 0, k=10))
    assert plan.count("TakeOrderedAndProject") == 2
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert not [ln for ln in plan.splitlines()
                if "Exchange hashpartitioning" in ln and "embedding" in ln]


def test_pq_self_query_is_top(emb):
    """Vec 0 is in the codebook, so its ADC self-distance is 0 in every
    subspace: querying with vec 0's literal vector must return vec 0 at
    cosine 1.0."""
    q = [float(x) for x in
         emb.where(F.col("vec_id") == 0).first()["embedding"]]
    top = similarity.pq_topk(emb, q, k=1).collect()[0]
    assert top["vec_id"] == 0
    assert top["cosine"] == 1.0
