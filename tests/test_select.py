"""Corpus selection & governance operators (queries_select):
keep-best canonical dedup, split leakage, incremental dedup, Bloom
decontamination.

The DuckDB hash gate covers value parity; these tests pin the SEMANTIC
guarantees: keeper choice matches a naive union-find + argmax, leakage
matches a naive recomputation from the pair relation, the incremental
miner agrees with the batch miner restricted to new×corpus pairs, and
the Bloom filter flags a superset of the exact hits within the FP
envelope.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from photon_spark.functions import dedup, text
from photon_spark.queries_select import (BLOOM_WORDS, NEW_MOD, NEW_REM,
                                         VAL_HEX_LT, _near_dup_pairs,
                                         q_contamination_bloom,
                                         q_dedup_incremental,
                                         q_dedup_keep_best, q_split_leakage)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    spark.catalog.clearCache()
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def pairs(spark, sf_dir, docs):
    return [(r["lo_id"], r["hi_id"])
            for r in _near_dup_pairs(spark, sf_dir).collect()]


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


# ------------------------------------------------------- keep-best dedup

def test_keep_best_matches_naive_union_find_argmax(spark, sf_dir, docs, pairs):
    qual = {r["doc_id"]: int(round(r["quality"] * 1e6))
            for r in text.text_profile(docs)
                          .select("doc_id", "quality").collect()}
    src = {r["doc_id"]: r["source"]
           for r in docs.select("doc_id", "source").collect()}
    label = _union_find(pairs)
    clusters: dict[int, list[int]] = {}
    for d in src:
        clusters.setdefault(label.get(d, d), []).append(d)
    expect: dict[str, dict[str, int]] = {}
    for cl, members in clusters.items():
        keep = max(members, key=lambda d: (qual[d], -d))
        for d in members:
            e = expect.setdefault(src[d], dict(n_docs=0, n_kept=0,
                                               n_dropped=0, kept_id_sum=0))
            e["n_docs"] += 1
            if d == keep:
                e["n_kept"] += 1
                e["kept_id_sum"] += d
            else:
                e["n_dropped"] += 1
    got = {r["source"]: r for r in q_dedup_keep_best(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for s, e in expect.items():
        for k in ("n_docs", "n_kept", "n_dropped", "kept_id_sum"):
            assert got[s][k] == e[k], (s, k)


def test_keep_best_audit_is_consistent(spark, sf_dir):
    rows = q_dedup_keep_best(spark, sf_dir).collect()
    assert all(r["n_docs"] == r["n_kept"] + r["n_dropped"] for r in rows)
    assert all(r["n_kept"] >= 1 for r in rows)


# --------------------------------------------------------- split leakage

def _is_val(doc_id: int) -> bool:
    return (hashlib.md5(f"split:{doc_id}".encode()).hexdigest()
            < VAL_HEX_LT)


def test_split_leakage_matches_naive(spark, sf_dir, docs, pairs):
    src = {r["doc_id"]: r["source"]
           for r in docs.select("doc_id", "source").collect()}
    leaked = {a for a, b in
              [(a, b) for lo, hi in pairs for a, b in ((lo, hi), (hi, lo))]
              if _is_val(a) and not _is_val(b)}
    got = {r["source"]: r for r in q_split_leakage(spark, sf_dir).collect()}
    n_val = sum(1 for d in src if _is_val(d))
    assert sum(r["n_val"] for r in got.values()) == n_val
    assert sum(r["n_leaked"] for r in got.values()) == len(leaked)
    assert (sum(r["leaked_id_sum"] for r in got.values())
            == sum(leaked))
    # every leaked doc is a val doc by construction
    assert all(_is_val(d) for d in leaked)


# ----------------------------------------------------- incremental dedup

def test_incremental_agrees_with_batch_miner(spark, sf_dir, docs, pairs):
    """The batch miner restricted to new×corpus pairs and the incremental
    miner see the same band index and the same verify rule, so the new-doc
    hit sets and per-doc counts must be identical."""
    expect: dict[int, int] = {}
    for lo, hi in pairs:
        for new, corp in ((lo, hi), (hi, lo)):
            if new % NEW_MOD == NEW_REM and corp % NEW_MOD != NEW_REM:
                expect[new] = expect.get(new, 0) + 1
    got = {r["new_id"]: r["n_corpus_dups"]
           for r in q_dedup_incremental(spark, sf_dir).collect()}
    assert got == expect


def test_incremental_only_reports_new_batch_ids(spark, sf_dir):
    rows = q_dedup_incremental(spark, sf_dir).collect()
    assert all(r["new_id"] % NEW_MOD == NEW_REM for r in rows)
    assert all(r["best_jaccard"] >= 0.7 for r in rows)


# ------------------------------------------------- Bloom decontamination

def test_bloom_flags_superset_of_exact_hits(spark, sf_dir):
    from photon_spark.queries_pipeline import q_contamination_check
    exact = {r["source"]: r for r in
             q_contamination_check(spark, sf_dir).collect()}
    bloom = {r["source"]: r for r in
             q_contamination_bloom(spark, sf_dir).collect()}
    # bloom never misses (no false negatives), and the FP envelope for a
    # 2^16-bit / K=3 filter over this probe set is far below 2% of docs
    for s, e in exact.items():
        if s not in bloom:  # bloom inner-joins docs that HAVE >=8-grams
            assert e["n_contaminated"] == 0
            continue
        assert bloom[s]["n_flagged_docs"] >= e["n_contaminated"]
        assert (bloom[s]["flag_rate"]
                <= e["contamination_rate"] + 0.02 + 1e-9)


def test_build_bloom_bitmap_shape(spark, sf_dir, docs):
    from photon_spark.queries_select import build_bloom
    grams = (dedup._shingled(docs, "text", "doc_id", 3)
             .select(F.explode("sh").alias("g")).limit(500).distinct())
    bm = build_bloom(grams)
    assert len(bm) == BLOOM_WORDS
    assert any(w != 0 for w in bm)
    assert all(0 <= w < (1 << 32) for w in bm)


# --------------------------------------------- cross-source dup matrix

def test_cross_source_dups_totals(spark, sf_dir, pairs):
    from photon_spark.queries_select import q_cross_source_dups
    rows = q_cross_source_dups(spark, sf_dir).collect()
    assert sum(r["n_pairs"] for r in rows) == len(pairs)
    assert all(r["source_a"] <= r["source_b"] for r in rows)
    assert all(0.7 <= r["avg_jaccard"] <= 1.0 for r in rows)


# ------------------------------------------------- lang confusion matrix

def test_lang_confusion_marginals(spark, sf_dir, docs):
    from photon_spark.queries_select import q_lang_confusion
    rows = q_lang_confusion(spark, sf_dir).collect()
    per_lang = {}
    for r in rows:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + r["n_docs"]
    expect = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
                  .collect()}
    assert per_lang == expect


# ------------------------------------------------------- batch ANN top-k

def test_ann_topk_multi_matches_numpy(spark, sf_dir):
    import numpy as np
    from photon_spark.queries_select import (ANN_MULTI_K, ANN_QMOD,
                                             q_ann_topk_multi)
    e = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
         for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
                       .collect()}
    queries = sorted(v for v in e if v % ANN_QMOD == 0)
    corpus = sorted(v for v in e if v % ANN_QMOD != 0)
    got = {}
    for r in q_ann_topk_multi(spark, sf_dir).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    assert set(got) == set(queries)
    for qid in queries:
        qv = e[qid]
        scored = sorted(
            ((-round(float(np.dot(qv, e[c]) /
                           (np.linalg.norm(qv) * np.linalg.norm(e[c]))), 6),
              c) for c in corpus))
        expect = [c for _, c in scored[:ANN_MULTI_K]]
        assert [v for _, v in sorted(got[qid])] == expect


def test_ann_topk_multi_plan_shape(spark, sf_dir):
    from photon_spark.queries_select import q_ann_topk_multi
    plan = (q_ann_topk_multi(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    # query batch broadcasts; per-query rank runs as WindowGroupLimit so
    # <= k rows per query survive each map partition
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan


# --------------------------------------------------- token-budget trim

def test_budget_trim_matches_naive_prefix_rule(spark, sf_dir, docs):
    from photon_spark.queries_select import TOKEN_BUDGET, q_budget_trim
    prof = {r["doc_id"]: (int(round(r["quality"] * 1e6)), r["n_tokens"])
            for r in text.text_profile(docs)
                          .select("doc_id", "quality", "n_tokens").collect()}
    src = {r["doc_id"]: r["source"]
           for r in docs.select("doc_id", "source").collect()}
    by_src: dict[str, list[int]] = {}
    for d in prof:
        by_src.setdefault(src[d], []).append(d)
    expect = {}
    for s, ids in by_src.items():
        ids.sort(key=lambda d: (-prof[d][0], d))
        cum, n_kept, tok_kept = 0, 0, 0
        for d in ids:
            cum += prof[d][1]
            if cum <= TOKEN_BUDGET:
                n_kept += 1
                tok_kept += prof[d][1]
        expect[s] = (len(ids), n_kept, tok_kept)
    got = {r["source"]: (r["n_docs"], r["n_kept"], r["tokens_kept"])
           for r in q_budget_trim(spark, sf_dir).collect()}
    assert got == expect


def test_budget_trim_respects_budget(spark, sf_dir):
    from photon_spark.queries_select import q_budget_trim
    rows = q_budget_trim(spark, sf_dir).collect()
    assert all(r["tokens_kept"] <= r["budget"] for r in rows)
    assert all(0 <= r["n_kept"] <= r["n_docs"] for r in rows)


# ------------------------------------------------- minhash calibration

def test_minhash_calibration_bounds(spark, sf_dir, pairs):
    from photon_spark.queries_select import q_minhash_calibration
    row = q_minhash_calibration(spark, sf_dir).collect()[0]
    assert row["n_pairs"] == len(pairs)
    # pairs are jaccard >= 0.7; a 16-hash sketch is coarse (1/16 steps)
    # but must stay inside a loose calibration envelope on true near-dups
    assert 0.0 <= row["mae"] <= 0.25
    assert row["max_err"] <= 0.5 + 1e-9


# ------------------------------------------------------ corpus data card

def test_corpus_datacard_consistency(spark, sf_dir, docs):
    from photon_spark.queries_select import q_corpus_datacard
    row = q_corpus_datacard(spark, sf_dir).collect()[0]
    assert row["n_docs"] == docs.count()
    assert row["n_sources"] == docs.select("source").distinct().count()
    assert row["n_langs"] == docs.select("lang").distinct().count()
    assert 0 <= row["exact_dup_rate"] < 1
    assert 0 <= row["lang_agreement"] <= 1
    assert row["n_distinct_fp"] <= row["n_docs"]
    assert row["total_tokens"] > 0


# ------------------------------------------------------ containment pairs

def test_containment_catches_what_jaccard_misses(spark):
    """A short doc fully embedded in a 3x-longer one: containment = 1.0
    while jaccard is far below the 0.7 near-dup bar."""
    words = [f"w{i}" for i in range(40)]
    short = " ".join(words[:12])
    long_ = " ".join(words)  # the short doc is its prefix
    df = spark.createDataFrame(
        [(1, short), (2, long_)], "doc_id long, text string")
    rows = dedup.containment_pairs(df, threshold=0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["lo_id"], r["hi_id"]) == (1, 2)
    assert r["containment"] == 1.0
    assert r["jaccard"] < 0.7


def test_containment_bounds_and_dominance(spark, sf_dir):
    from photon_spark.queries_select import q_containment_pairs
    rows = q_containment_pairs(spark, sf_dir).collect()
    assert all(0.9 <= r["containment"] <= 1.0 for r in rows)
    # containment >= jaccard always (min-denominator dominates union)
    assert all(r["containment"] >= r["jaccard"] for r in rows)


def test_corpus_build_e2e_funnel_monotone(spark, sf_dir):
    from photon_spark.queries_select import E2E_BUDGET, q_corpus_build_e2e
    rows = {r.stage: r for r in q_corpus_build_e2e(spark, sf_dir).collect()}
    assert list(rows) == ["input", "quality_lang", "exact_dedup",
                          "token_budget"] or len(rows) == 4
    seq = [rows[s] for s in ("input", "quality_lang", "exact_dedup",
                             "token_budget")]
    for a, b in zip(seq, seq[1:]):
        assert b.n_docs <= a.n_docs
        assert b.n_tokens <= a.n_tokens
    assert seq[3].n_tokens <= E2E_BUDGET


def test_split_repair_is_closed_and_supersets_audit(spark, sf_dir):
    """The repair plan's move set contains every doc the audit flagged
    (and possibly more — whole tainted clusters move), counts are
    conserved, and the CLOSURE guarantee holds: after applying the
    moves, no val doc has a near-dup partner outside val."""
    from photon_spark.queries_select import (_is_val, _near_dup_pairs,
                                             q_split_leakage,
                                             q_split_repair_plan)

    audit = {r["source"]: r for r in
             q_split_leakage(spark, sf_dir).collect()}
    plan = {r["source"]: r for r in
            q_split_repair_plan(spark, sf_dir).collect()}
    for src, p in plan.items():
        n_leaked = audit[src]["n_leaked"] if src in audit else 0
        assert p["n_moved"] >= n_leaked
        assert p["n_val_after"] == p["n_val_before"] - p["n_moved"]
        assert 0 <= p["val_frac_after"] <= 1

    # closure: recompute the final assignment and scan every pair
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    val0 = {r["doc_id"] for r in
            d.select("doc_id").where(_is_val(F.col("doc_id"))).collect()}
    pairs = [(r["lo_id"], r["hi_id"]) for r in
             _near_dup_pairs(spark, sf_dir).collect()]
    # rebuild the moved set the same way the plan defines it: clusters
    # touching train lose all their val members
    parent = {}
    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x
    for a, b in pairs:
        parent.setdefault(a, a); parent.setdefault(b, b)
        parent[find(a)] = find(b)
    from collections import defaultdict
    members = defaultdict(set)
    for x in list(parent):
        members[find(x)].add(x)
    moved = set()
    for comp in members.values():
        if any(m not in val0 for m in comp):
            moved |= {m for m in comp if m in val0}
    val_after = val0 - moved
    for a, b in pairs:
        assert not (a in val_after) ^ (b in val_after),             f"cross-split pair survives repair: {(a, b)}"
    # and the per-source moved counts match this recompute
    src_of = {r["doc_id"]: r["source"]
              for r in d.select("doc_id", "source").collect()}
    from collections import Counter
    want = Counter(src_of[m] for m in moved)
    for src, p in plan.items():
        assert p["n_moved"] == want.get(src, 0)


def test_ann_recall_audit_matches_naive(spark, sf_dir):
    import numpy as np
    from photon_spark.queries_select import (ANN_MULTI_K, ANN_QMOD,
                                             RECALL_CELLS, RECALL_PROBE,
                                             q_ann_recall_audit)
    out = {r["query_id"]: r for r in q_ann_recall_audit(spark,
                                                        sf_dir).collect()}
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding").collect()
    vid = np.array([r["vec_id"] for r in rows])
    mat = np.array([[float(x) for x in r["embedding"]] for r in rows])
    nrm = np.linalg.norm(mat, axis=1)
    is_q = vid % ANN_QMOD == 0
    cents_idx = np.argsort(vid)[:RECALL_CELLS]

    def cos(a, b):
        return float(mat[a] @ mat[b] / (nrm[a] * nrm[b]))

    corpus = [i for i in range(len(vid)) if not is_q[i]]
    # corpus cell assignment: argmax cosine, lowest cell id on ties
    assign = {}
    for i in corpus:
        best = min(((-(cos(i, j)), vid[j]) for j in cents_idx))
        assign[i] = best[1]
    expected = {}
    for qi in (i for i in range(len(vid)) if is_q[i]):
        exact = sorted(corpus,
                       key=lambda i: (-round(cos(qi, i), 6), vid[i]))[:ANN_MULTI_K]
        probes = {vid[j] for j in sorted(
            cents_idx, key=lambda j: (-cos(qi, j), vid[j]))[:RECALL_PROBE]}
        cand = [i for i in corpus if assign[i] in probes]
        ivf = sorted(cand,
                     key=lambda i: (-round(cos(qi, i), 6), vid[i]))[:ANN_MULTI_K]
        hits = len(set(exact) & set(ivf))
        expected[int(vid[qi])] = hits
    assert set(out) == set(expected)
    for q, hits in expected.items():
        assert out[q]["n_hits"] == hits
        assert abs(out[q]["recall"] - hits / ANN_MULTI_K) < 2e-6


def test_recall_probe_margins_dominate_float_error():
    # The recall audit now ROUNDS probe cosines to 6dp before ranking
    # (both engines), so a flip needs a true cosine within kernel
    # disagreement (~1e-13) of a 5e-7 rounding boundary. This pin is the
    # second belt: the PROBE-th/(PROBE+1)-th margin dominates float error
    # at EVERY testdata scale factor (enumerated from /root/testdata, not
    # a hardcoded pair, so a future gate sf is covered automatically).
    import glob
    import os

    import numpy as np
    import pyarrow.parquet as pq
    from tests.conftest import SF_DIR
    from photon_spark.queries_select import (ANN_QMOD, RECALL_CELLS,
                                             RECALL_PROBE)
    # the configured test sf plus every driver testdata sf present
    dirs = {SF_DIR, *glob.glob("/root/testdata/sf*")}
    dirs = [d for d in sorted(dirs)
            if os.path.exists(f"{d}/embeddings.parquet")]
    assert dirs, "no embeddings testdata found"
    for sf in dirs:
        t = pq.read_table(f"{sf}/embeddings.parquet")
        vid = np.array(t["vec_id"])
        order = np.argsort(vid)
        m = np.array(t["embedding"].to_pylist(), dtype=np.float64)[order]
        vid = vid[order]
        c = m[:RECALL_CELLS]
        qs = m[vid % ANN_QMOD == 0]
        sims = (qs / np.linalg.norm(qs, axis=1, keepdims=True)) @ \
               (c / np.linalg.norm(c, axis=1, keepdims=True)).T
        ranked = np.sort(sims, axis=1)[:, ::-1]
        margins = ranked[:, RECALL_PROBE - 1] - ranked[:, RECALL_PROBE]
        assert margins.min() > 1e-9, (sf, margins.min())


def test_matryoshka_recall_audit_matches_naive(spark, sf_dir):
    import numpy as np
    from photon_spark.queries_select import (ANN_MULTI_K, ANN_QMOD, MRL_DIM,
                                             q_matryoshka_recall_audit)
    out = {r["query_id"]: r
           for r in q_matryoshka_recall_audit(spark, sf_dir).collect()}
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding").collect()
    vid = np.array([r["vec_id"] for r in rows])
    mat = np.array([[float(x) for x in r["embedding"]] for r in rows])
    is_q = vid % ANN_QMOD == 0
    corpus = [i for i in range(len(vid)) if not is_q[i]]

    def topk(qi, dims):
        def cos(i):
            a, b = mat[qi][:dims], mat[i][:dims]
            return round(float(a @ b /
                               (np.linalg.norm(a) * np.linalg.norm(b))), 6)
        return set(sorted(corpus, key=lambda i: (-cos(i), vid[i]))
                   [:ANN_MULTI_K])

    expected = {}
    for qi in (i for i in range(len(vid)) if is_q[i]):
        full = topk(qi, mat.shape[1])
        short = topk(qi, MRL_DIM)
        expected[int(vid[qi])] = len(full & short)
    assert set(out) == set(expected)
    for q, hits in expected.items():
        assert out[q]["n_hits"] == hits
        assert abs(out[q]["recall"] - hits / ANN_MULTI_K) < 2e-6


def test_pair_table_multi_batch_update_equals_full_mine(spark, sf_dir,
                                                        tmp_path):
    # The durable pair table's core identity, at 3-batch depth: build on
    # a third of the corpus, fold the other two thirds in as successive
    # update() batches, and the pair relation must equal a from-scratch
    # full-corpus mine exactly (ids AND 6dp jaccards) — append-forever
    # maintenance never re-mines and never misses.
    from photon_spark.functions import dedup
    from photon_spark.pair_cache import PairTable

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pt = PairTable(spark, str(tmp_path / "pt"))
    pt.build(docs.where(F.col("doc_id") % 3 == 0))
    # corpus_docs = everything already indexed at each update's point
    pt.update(docs.where(F.col("doc_id") % 3 == 1),
              corpus_docs=docs.where(F.col("doc_id") % 3 == 0))
    pt.update(docs.where(F.col("doc_id") % 3 == 2),
              corpus_docs=docs.where(F.col("doc_id") % 3 != 2))
    got = {(r["lo_id"], r["hi_id"], r["jaccard"])
           for r in pt.pairs().collect()}
    full = dedup.minhash_near_duplicates(docs)
    want = {(r["lo_id"], r["hi_id"], r["jaccard"])
            for r in full.collect()}
    dedup.release_cache(full)
    assert want  # corpus has near-dups; an empty compare proves nothing
    assert got == want


def test_pair_table_update_rejects_partial_corpus(spark, sf_dir, tmp_path):
    # corpus_docs must be the FULL already-indexed corpus: a candidate id
    # missing from it would silently vanish through the inner shingle
    # join, breaking the pairs(A∪B) identity — update() must fail loudly
    # instead.
    from photon_spark.pair_cache import PairTable

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pt = PairTable(spark, str(tmp_path / "pt"))
    base, batch = (docs.where(F.col("doc_id") % 2 == 0),
                   docs.where(F.col("doc_id") % 2 == 1))
    pt.build(base)
    # base has near-dup pairs (asserted by the identity test above), so a
    # half-empty corpus is guaranteed to strand some candidate ids
    with pytest.raises(ValueError, match="missing indexed docs"):
        pt.update(batch, corpus_docs=base.where(F.col("doc_id") % 4 == 0))


def test_pair_table_update_retry_is_idempotent(spark, sf_dir, tmp_path):
    # At-least-once callers may retry an update; the batch=<tag>
    # overwrite contract must make the retry clobber its own partitions,
    # never double-append pairs.
    from photon_spark.pair_cache import PairTable

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pt = PairTable(spark, str(tmp_path / "pt"))
    base, batch = (docs.where(F.col("doc_id") % 2 == 0),
                   docs.where(F.col("doc_id") % 2 == 1))
    pt.build(base)
    pt.update(batch, corpus_docs=base)
    first = sorted((r["lo_id"], r["hi_id"], r["jaccard"])
                   for r in pt.pairs().collect())
    pt.update(batch, corpus_docs=base)  # the retry
    second = sorted((r["lo_id"], r["hi_id"], r["jaccard"])
                    for r in pt.pairs().collect())
    assert first and second == first


def test_stale_centroid_margins_dominate_float_error():
    # ivf_staleness_audit introduces a SECOND centroid set (trained
    # without the vec_id % STALE_MOD == STALE_REM slice); its assignment
    # and probe margins must dominate float error at every testdata sf,
    # same belt as test_recall_probe_margins_dominate_float_error.
    import glob
    import os

    import numpy as np
    import pyarrow.parquet as pq
    from tests.conftest import SF_DIR
    from photon_spark.queries_select import (ANN_QMOD, RECALL_CELLS,
                                             RECALL_PROBE, STALE_MOD,
                                             STALE_REM)
    dirs = {SF_DIR, *glob.glob("/root/testdata/sf*")}
    dirs = [d for d in sorted(dirs)
            if os.path.exists(f"{d}/embeddings.parquet")]
    assert dirs, "no embeddings testdata found"
    for sf in dirs:
        t = pq.read_table(f"{sf}/embeddings.parquet")
        vid = np.array(t["vec_id"])
        order = np.argsort(vid)
        m = np.array(t["embedding"].to_pylist(), dtype=np.float64)[order]
        vid = vid[order]
        cs = m[vid % STALE_MOD != STALE_REM][:RECALL_CELLS]
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        csn = cs / np.linalg.norm(cs, axis=1, keepdims=True)
        # assignment margins (best vs second-best centroid, every vector)
        sims = mn @ csn.T
        top2 = np.sort(sims, axis=1)[:, -2:]
        assert (top2[:, 1] - top2[:, 0]).min() > 1e-9, sf
        # probe margins (PROBE-th vs PROBE+1-th, every query)
        qsims = sims[vid % ANN_QMOD == 0]
        ranked = np.sort(qsims, axis=1)[:, ::-1]
        margins = ranked[:, RECALL_PROBE - 1] - ranked[:, RECALL_PROBE]
        assert margins.min() > 1e-9, (sf, margins.min())


def test_ivf_staleness_audit_detects_drift(spark, tmp_path):
    """The re-centroid trigger works: on a constructed corpus whose
    appended slice (vec_id % STALE_MOD == STALE_REM) drifted into four
    new sub-modes living in a subspace the base clusters never touch,
    the stale index scatters the drifted vectors across base cells by
    jitter (n_probe misses most of a query's true neighbors) while a
    fresh re-train captures the sub-modes — so the audit must report
    churn, a strictly worse stale recall on EVERY drifted query, and no
    fresh-worse-than-stale query anywhere. Base-cluster queries stay at
    equal recall: drift detection must not invent a problem where the
    index is still fine."""
    import hashlib
    import math

    from photon_spark.queries_select import (ANN_QMOD, STALE_MOD,
                                             STALE_REM,
                                             q_ivf_staleness_audit)

    def jit(i, j, salt):
        h = int(hashlib.md5(f"{i}:{j}:{salt}".encode())
                .hexdigest()[:8], 16)
        return h / 0xFFFFFFFF - 0.5

    dim, n = 16, 8 * ANN_QMOD + 1
    rows = []
    for i in range(n):
        v = [0.0] * dim
        if i % STALE_MOD == STALE_REM:
            # drifted: flat across the base axes (+ assignment jitter),
            # plus one of four sub-mode directions in dims 8..15 (+ tiny
            # ranking jitter) — assignment and ranking live in DISJOINT
            # subspaces, so a stale probe carries no information about
            # where a query's true neighbors were filed
            m = (i // 3) % 4
            for j in range(8):
                v[j] = 1.0 + 0.15 * jit(i, j, 1)
                v[8 + j] = 0.02 * jit(i, j, 2)
            v[8 + 2 * m] += 1.0
            v[9 + 2 * m] += 1.0
        else:
            # base: equal-norm two-axis patterns, jitter-free — centroid
            # norms must not vary, or the shared norm bias correlates
            # probe choice with assignment and masks the staleness
            a = i % 8
            v[a] = 1.0
            v[(a + 1 + (i // 8) % 7) % 8] = 0.3
        nrm = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / nrm for x in v]))
    spark.createDataFrame(rows, "vec_id long, embedding array<double>") \
         .write.parquet(str(tmp_path / "embeddings.parquet"))

    out = {r["query_id"]: r
           for r in q_ivf_staleness_audit(spark, str(tmp_path)).collect()}
    assert out, "no query rows"
    drifted = [qid for qid in out if qid % STALE_MOD == STALE_REM]
    assert len(drifted) >= 3, "fixture must include drifted queries"
    r0 = next(iter(out.values()))
    assert r0["n_churned"] > 0 and r0["churn_rate"] > 0
    for qid in drifted:
        assert out[qid]["recall_fresh"] > out[qid]["recall_stale"], out[qid]
    assert all(r["recall_fresh"] >= r["recall_stale"]
               for r in out.values()), out
    base = [r for qid, r in out.items() if qid not in drifted]
    assert all(r["recall_fresh"] == r["recall_stale"] for r in base), base


def test_ann_ndcg_audit_matches_naive_metric(spark, sf_dir):
    # Recompute nDCG in plain Python from the SAME two ranked lists the
    # query consumes (exact via q_ann_topk_multi; IVF via the audit's
    # own candidate relation is not exposed, so rebuild the metric from
    # the output's integer dcg_units): dcg_units must be a sum of
    # rel*discount terms with rel in 0..k, and ndcg == dcg/IDCG at 6dp.
    from photon_spark.queries_select import (q_ann_ndcg_audit,
                                             q_ann_topk_multi,
                                             NDCG_W, NDCG_IDCG,
                                             ANN_MULTI_K)
    rows = q_ann_ndcg_audit(spark, sf_dir).collect()
    assert rows, "audit must cover the query batch"
    exact_q = {r["query_id"] for r in
               q_ann_topk_multi(spark, sf_dir).collect()}
    feasible = set()
    # all integer combos sum(rel_i * w_i) over list lengths 1..k where
    # grade 0 (not in the exact list) may repeat but each nonzero grade
    # (a specific exact doc) appears at most once
    import itertools
    grades = list(range(ANN_MULTI_K + 1))
    for length in range(1, ANN_MULTI_K + 1):
        for combo in itertools.product(grades, repeat=length):
            nz = [g for g in combo if g]
            if len(nz) == len(set(nz)):
                feasible.add(sum(g * w for g, w in zip(combo, NDCG_W)))
    for r in rows:
        assert r["query_id"] in exact_q
        assert 0 <= r["dcg_units"] <= NDCG_IDCG
        assert r["ndcg"] == round(r["dcg_units"] / NDCG_IDCG, 6)
        assert r["dcg_units"] in feasible


def test_ndcg_discount_table_is_shared_literal():
    # The discount constants inlined into the SQL oracle must be the
    # very integers the Spark plan uses — the cross-engine exactness
    # rests on both sides multiplying by the SAME literals.
    from photon_spark.queries_select import (_sql_ann_ndcg_audit, NDCG_W,
                                             NDCG_IDCG)
    sql = _sql_ann_ndcg_audit()
    for i, w in enumerate(NDCG_W):
        assert f"WHEN {i + 1} THEN {w}" in sql
    assert str(NDCG_IDCG) in sql


# ------------------------------------------- int8 quantized recall

def test_ann_int8_recall_audit_matches_python(spark, tmp_path):
    """Full audit on a controlled embeddings table (query at vec_id 0,
    six corpus vectors; a high-magnitude off-axis coordinate coarsens
    one vector's quantization grid): per-query hits equal a pure-Python
    recompute with the same quantize/score/rank/tie rules. (Zero
    vectors are outside the embedding table's unit-norm data contract —
    the shared exact-cosine leg rejects them by design.)"""
    from photon_spark.queries_select import (ANN_MULTI_K,
                                             q_ann_int8_recall_audit)

    dim = 64

    def vec(lead, fill=0.01, lead2=0.0):
        v = [fill] * dim
        v[0], v[1] = lead, lead2
        return v

    rows = [(0, vec(1.0), 0)]                 # the query (0 % 97 == 0)
    corpus = {
        1: vec(0.90), 2: vec(0.80), 3: vec(0.70, lead2=0.9),
        4: vec(0.60), 5: vec(0.50), 6: vec(0.55, lead2=-0.9),
    }
    rows += [(i, v, 1) for i, v in sorted(corpus.items())]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long")
    path = str(tmp_path / "emb")
    df.coalesce(1).write.parquet(path + "/embeddings.parquet")

    got = {r["query_id"]: (r["n_hits"], r["recall"])
           for r in q_ann_int8_recall_audit(spark, path).collect()}

    # python recompute with the audited rules
    def quant(v):
        s = max(abs(x) for x in v) / 127.0
        if s == 0:
            return s, [0] * len(v)
        return s, [round(x / s) for x in v]

    import math
    q = vec(1.0)
    _, qa = quant(q)
    nq = math.sqrt(sum(x * x for x in q))

    def cos(v):
        n = math.sqrt(sum(x * x for x in v))
        return 0.0 if n == 0 else sum(a * b for a, b in zip(v, q)) / n / nq

    exact = sorted(corpus, key=lambda i: (-round(cos(corpus[i]), 6), i))
    exact = set(exact[:ANN_MULTI_K])
    scored = {}
    for i, v in corpus.items():
        s, xa = quant(v)
        scored[i] = round(s * sum(a * b for a, b in zip(xa, qa)), 6)
    int8 = sorted(corpus, key=lambda i: (-scored[i], i))[:ANN_MULTI_K]
    hits = len(exact & set(int8))
    assert got == {0: (hits, round(hits / ANN_MULTI_K, 6))}
