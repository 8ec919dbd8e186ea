"""Retrieval & ranking operators (queries_ranking.py): naive-recompute
equivalence and plan pins."""

import math

from pyspark.sql import functions as F

from photon_spark import queries_ranking as qr


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------- BM25

def test_bm25_matches_naive_recompute(spark, sf_dir):
    got = {r["doc_id"]: r["bm25"]
           for r in qr.q_bm25_topk(spark, sf_dir).collect()}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                     .select("doc_id", "text").collect()
    toks = {r["doc_id"]: (r["text"] or "").strip(" ").split()
            for r in docs}
    toks = {d: [t.lower() for t in ts] for d, ts in toks.items() if ts}
    n = len(toks)
    total = sum(len(ts) for ts in toks.values())
    k1, b = qr.BM25_K1, qr.BM25_B
    want = {}
    for d, ts in toks.items():
        s = 0.0
        hit = False
        for term in qr.BM25_TERMS:
            tf = sum(1 for t in ts if t == term)
            df_t = sum(1 for ts2 in toks.values() if term in ts2)
            hit = hit or tf > 0
            idf = float(2 * n - 2 * df_t + 1) / float(2 * df_t + 1)
            s += idf * (tf * (k1 + 1.0)) / (
                tf + (k1 * (1.0 - b) + (k1 * b * float(len(ts))
                                        * float(n) / float(total))))
        if hit:
            want[d] = s
    top = sorted(want, key=lambda d: (-want[d], d))[:qr.BM25_TOPK]
    assert set(got) == set(top)
    for d in top:
        assert math.isclose(got[d], want[d], rel_tol=0, abs_tol=5e-7)


def test_bm25_plan_is_take_ordered(spark, sf_dir):
    plan = _plan(qr.q_bm25_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------ decay

def test_decay_popularity_matches_naive(spark, sf_dir):
    got = {r["event_type"]: (r["n_events"], r["decayed_units"])
           for r in qr.q_events_decay_popularity(spark, sf_dir).collect()}

    from photon_spark.queries import _t
    rows = _t(spark, sf_dir, "events").select("event_type", "ts").collect()
    want: dict = {}
    for r in rows:
        age_days = (qr.DECAY_REF_NS - r["ts"]) // qr.DAY_NS
        step = min(age_days // qr.DECAY_STEP_DAYS, qr.DECAY_MAX_STEP)
        w = 1 << (qr.DECAY_MAX_STEP - step)
        n, u = want.get(r["event_type"], (0, 0))
        want[r["event_type"]] = (n + 1, u + w)
    assert got == want


def test_decay_weight_bounds(spark, sf_dir):
    # decayed_count ∈ (n_events * 2^-MAX_STEP, n_events]
    for r in qr.q_events_decay_popularity(spark, sf_dir).collect():
        assert r["decayed_count"] <= r["n_events"]
        assert r["decayed_count"] >= r["n_events"] / qr.DECAY_SCALE
        assert r["decayed_units"] == round(r["decayed_count"]
                                           * qr.DECAY_SCALE)


# ------------------------------------------------- priority sampling

def test_priority_sample_matches_naive(spark, sf_dir):
    got = {(r["source"], r["rank"]): r["doc_id"]
           for r in qr.q_priority_sample(spark, sf_dir).collect()}

    import hashlib
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                     .select("source", "doc_id", "n_chars").collect()
    by_src: dict = {}
    for r in docs:
        u = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:15],
                16) + 1
        by_src.setdefault(r["source"], []).append(
            (-(r["n_chars"] / u), r["doc_id"]))
    for src, items in by_src.items():
        items.sort()
        for i, (_, doc_id) in enumerate(items[:qr.PRIO_PER_SOURCE], 1):
            assert got[(src, i)] == doc_id


def test_priority_sample_window_group_limit(spark, sf_dir):
    plan = _plan(qr.q_priority_sample(spark, sf_dir))
    assert "WindowGroupLimit" in plan
