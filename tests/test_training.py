"""Training-set assembly: seeded global shuffle, classifier filter,
embedding prune plan (photon_spark/queries_training.py)."""

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from photon_spark.functions.ordering import seeded_shuffle
from photon_spark.queries_training import (CLS_BIAS, CLS_KEEP, CLS_W,
                                           PRUNE_DIV,
                                           q_embedding_prune_plan,
                                           q_quality_classifier_filter,
                                           q_seeded_shuffle_plan)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


# --------------------------------------------------------- seeded shuffle

def _naive_order(ids, seed):
    key = {i: hashlib.md5(f"{seed}:{i}".encode()).hexdigest() for i in ids}
    return sorted(ids, key=lambda i: (key[i], i))


def test_seeded_shuffle_is_the_md5_permutation(spark, docs):
    out = {r["doc_id"]: r["global_pos"]
           for r in seeded_shuffle(docs, "doc_id", seed=42).collect()}
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    expect = {i: p for p, i in enumerate(_naive_order(ids, 42))}
    assert out == expect


def test_seeded_shuffle_positions_are_a_permutation(spark, sf_dir):
    rows = q_seeded_shuffle_plan(spark, sf_dir).collect()
    n = len(rows)
    assert sorted(r["global_pos"] for r in rows) == list(range(n))
    for r in rows:
        assert r["shard_id"] == r["global_pos"] // 64
        assert r["pos_in_shard"] == r["global_pos"] % 64


def test_seeded_shuffle_seed_changes_order_rerun_does_not(spark, docs):
    a = {r["doc_id"]: r["global_pos"]
         for r in seeded_shuffle(docs, seed=42).collect()}
    b = {r["doc_id"]: r["global_pos"]
         for r in seeded_shuffle(docs, seed=42).collect()}
    c = {r["doc_id"]: r["global_pos"]
         for r in seeded_shuffle(docs, seed=7).collect()}
    assert a == b
    assert a != c


def test_seeded_shuffle_bucket_count_invariant(spark, docs):
    # position assignment is independent of the bucket fan-out
    a = {r["doc_id"]: r["global_pos"]
         for r in seeded_shuffle(docs, seed=42, buckets=4).collect()}
    b = {r["doc_id"]: r["global_pos"]
         for r in seeded_shuffle(docs, seed=42, buckets=256).collect()}
    assert a == b


def test_seeded_shuffle_null_ids_get_null_positions(spark):
    df = spark.createDataFrame([(1,), (None,), (2,), (None,)],
                               "doc_id long")
    rows = {r["doc_id"]: r["global_pos"]
            for r in seeded_shuffle(df, "doc_id", seed=3).collect()}
    # NULL ids surface as NULL positions; real ids still get 0..n-1
    assert rows[None] is None
    assert sorted(v for k, v in rows.items() if k is not None) == [0, 1]


def test_seeded_shuffle_null_ids_oracle_parity(spark):
    # BOTH engines must give NULL ids NULL positions: the Spark side via
    # the NULL bucket exclusion, the oracle via its non-null-ranked CTE.
    import duckdb
    from photon_spark.queries_training import SQL_SEEDED_SHUFFLE_PLAN
    rows = [(1,), (None,), (7,), (None,), (3,)]
    df = spark.createDataFrame(rows, "doc_id long")
    s_rows = sorted(((r["doc_id"], r["global_pos"], r["shard_id"],
                      r["pos_in_shard"])
                     for r in seeded_shuffle(df, "doc_id", seed=42).collect()),
                    key=str)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?)", rows)
    o_rows = sorted(con.execute(SQL_SEEDED_SHUFFLE_PLAN).fetchall(),
                    key=str)
    assert s_rows == o_rows
    assert sum(1 for r in s_rows if r[1] is None) == 2


def test_seeded_shuffle_empty_input_keeps_id_type(spark):
    df = spark.createDataFrame([], "doc_uuid string")
    out = seeded_shuffle(df, "doc_uuid", seed=1)
    assert out.count() == 0
    assert dict(out.dtypes)["doc_uuid"] == "string"
    assert [f for f, _ in out.dtypes] == ["doc_uuid", "global_pos",
                                          "shard_id", "pos_in_shard"]


def test_seeded_shuffle_plan_has_no_global_window(spark, docs):
    plan = seeded_shuffle(docs, seed=42)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the sort must be bucket-partitioned, never a single global partition
    assert "hashpartitioning(bkt" in plan


def test_curriculum_bands_stream_best_first(spark, sf_dir):
    from photon_spark.queries_training import q_curriculum_order_plan
    rows = sorted(q_curriculum_order_plan(spark, sf_dir).collect(),
                  key=lambda r: r["global_pos"])
    n = len(rows)
    assert [r["global_pos"] for r in rows] == list(range(n))
    # bands are non-decreasing along the order (best band first)
    bands = [r["band"] for r in rows]
    assert bands == sorted(bands)
    assert len(set(bands)) > 1, "degenerate: single band"
    # within a band the order is the seeded md5 shuffle of that band
    by_band = {}
    for r in rows:
        by_band.setdefault(r["band"], []).append(r["doc_id"])
    for b, ids in by_band.items():
        assert ids == _naive_order(ids, 42)


# ------------------------------------------------------ classifier filter

def _naive_score(prof_row):
    z = (CLS_BIAS + CLS_W[0] * prof_row["alpha_ratio"]
         + CLS_W[1] * prof_row["stopword_ratio"]
         + CLS_W[2] * min(prof_row["n_tokens"] / 64.0, 1.0)
         + CLS_W[3] * prof_row["quality"])
    s = 0.5 + 0.5 * z / (1.0 + abs(z))
    return float(Decimal(repr(s)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


def test_classifier_filter_matches_naive_recompute(spark, sf_dir, docs):
    from photon_spark.functions import text
    out = {(r["source"], r["kept"]): r
           for r in q_quality_classifier_filter(spark, sf_dir).collect()}
    prof = text.text_profile(docs).join(
        docs.select("doc_id", "source"), "doc_id").collect()
    agg = {}
    for p in prof:
        s = _naive_score(p)
        k = (p["source"], s >= CLS_KEEP)
        n, tot, toks = agg.get(k, (0, 0, 0))
        agg[k] = (n + 1, tot + round(s * 1e6), toks + p["n_tokens"])
    assert set(out) == set(agg)
    for k, (n, tot, toks) in agg.items():
        assert out[k]["n_docs"] == n
        assert out[k]["total_tokens"] == toks
        assert abs(out[k]["avg_score"] - tot / n / 1e6) < 2e-6
    assert any(kept for _, kept in agg) and any(not kept for _, kept in agg)


# ---------------------------------------------------- cluster-aware split

def test_cluster_split_never_splits_a_cluster(spark, sf_dir):
    from photon_spark import pair_cache
    from photon_spark.functions import dedup
    from photon_spark.queries_training import (SPLIT_TRAIN_LT, SPLIT_VAL_LT,
                                               q_cluster_split_assign)
    out = {(r["split"], r["source"]): r
           for r in q_cluster_split_assign(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "source").collect()
    # independent naive recompute: roots from dup_clusters, split from the
    # root hash — then compare the QUERY's aggregates against it, so a
    # query that hashed doc_id instead of root (cluster-splitting leakage)
    # fails on the per-(split, source) counts
    pairs = pair_cache.near_dup_pairs(spark, sf_dir, threshold=0.7)
    labels = {r["id"]: r["cluster_id"]
              for r in dedup.dup_clusters(pairs).collect()}

    def split_of(root):
        p = hashlib.md5(f"csplit:{root}".encode()).hexdigest()[:2]
        return ("train" if p < SPLIT_TRAIN_LT
                else "val" if p < SPLIT_VAL_LT else "test")

    expect = {}
    for r in docs:
        root = labels.get(r["doc_id"], r["doc_id"])
        k = (split_of(root), r["source"])
        n, roots, idsum = expect.get(k, (0, set(), 0))
        roots = roots | {root}
        expect[k] = (n + 1, roots, idsum + r["doc_id"])
    assert set(out) == set(expect)
    for k, (n, roots, idsum) in expect.items():
        assert out[k]["n_docs"] == n
        assert out[k]["n_clusters"] == len(roots)
        assert out[k]["doc_id_sum"] == idsum
    # non-degenerate: at least one multi-member cluster exists, and it
    # landed intact (its docs share one split by the root construction —
    # verified here against the query's own counts, not the formula)
    multi = [c for c, ms in _members(labels).items() if len(ms) > 1]
    assert multi, "corpus has no near-dup cluster; test is vacuous"
    train = sum(v[0] for k, v in expect.items() if k[0] == "train")
    assert train > 0.7 * len(docs)


def _members(labels):
    ms = {}
    for i, c in labels.items():
        ms.setdefault(c, []).append(i)
    return ms


# ----------------------------------------------------------- GD training

def test_classifier_train_gd_matches_naive_fit(spark, sf_dir):
    from photon_spark.queries_training import (GD_ITERS, GD_LR,
                                               q_classifier_train_gd,
                                               _features)
    out = {r["coef"]: r["value"]
           for r in q_classifier_train_gd(spark, sf_dir).collect()}
    feats = _features(spark, sf_dir).collect()
    w = [0.0] * 5
    for _ in range(GD_ITERS):
        s = [0] * 5
        for r in feats:
            x = (1.0, r["f1"], r["f2"], r["f3"], r["f4"])
            z = (w[0] + w[1] * x[1] + w[2] * x[2] + w[3] * x[3]
                 + w[4] * x[4])
            p = 0.5 + 0.5 * z / (1.0 + abs(z))
            resid = r["y"] - p
            for j in range(5):
                g = resid * x[j] * 1e6
                # Spark round(): decimal HALF_UP (away from zero)
                s[j] += int(Decimal(repr(g)).quantize(
                    Decimal("1"), rounding=ROUND_HALF_UP))
        n = len(feats)
        w = [w[j] + GD_LR * (s[j] / n / 1e6) for j in range(5)]
    for j in range(5):
        assert out[f"w{j}"] == w[j], (j, out[f"w{j}"], w[j])
    ok = 0
    for r in feats:
        z = (w[0] + w[1] * r["f1"] + w[2] * r["f2"] + w[3] * r["f3"]
             + w[4] * r["f4"])
        ok += int((z >= 0) == (r["y"] == 1.0))
    assert abs(out["train_acc"] - ok / len(feats)) < 2e-6
    assert out["n_docs"] == len(feats)
    assert any(w[j] != 0.0 for j in range(5)), "training did not move"


# -------------------------------------------------------- embedding prune

def test_prune_plan_takes_percluster_ceil_tail(spark, sf_dir):
    rows = q_embedding_prune_plan(spark, sf_dir).collect()
    by_cl = {}
    for r in rows:
        by_cl.setdefault(r["cluster_id"], []).append(r)
    assert by_cl, "prune plan returned nothing"
    for cl, rs in by_cl.items():
        n = rs[0]["n_members"]
        keep_n = (n + PRUNE_DIV - 1) // PRUNE_DIV
        assert len(rs) == keep_n
        assert sorted(r["rnk"] for r in rs) == list(range(1, keep_n + 1))
        # ranks descend with distance; ties break by vec_id
        rs = sorted(rs, key=lambda r: r["rnk"])
        for a, b in zip(rs, rs[1:]):
            assert (a["dist2"], -a["vec_id"]) >= (b["dist2"], -b["vec_id"])


def test_prune_plan_flags_constructed_outlier(spark):
    import numpy as np
    rng = np.random.default_rng(0)
    base = rng.normal(0.0, 0.05, size=(40, 8))
    base[1::2] += 1.0          # two genuine clusters at 0 and 1
    base[7] = 3.0              # moderate outlier: joins the 1-cluster,
    #                            too close to capture a centroid of its own
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(40)],
        "vec_id long, embedding array<float>")
    from photon_spark.functions.clustering import kmeans_fit, member_dist2
    assigned, cents = kmeans_fit(df, k=2, iters=2)
    d = member_dist2(assigned, cents)
    top = d.orderBy(F.desc("ri")).first()
    assert top["vec_id"] == 7


def test_classifier_eval_split_matches_naive(spark, sf_dir):
    from photon_spark.queries_training import (GD_ITERS, GD_LR,
                                               _doc_splits, _features,
                                               q_classifier_eval_split)
    out = {r["split"]: r
           for r in q_classifier_eval_split(spark, sf_dir).collect()}
    rooted, _cached = _doc_splits(spark, sf_dir)
    split_of = {r["doc_id"]: r["split"] for r in rooted.collect()}
    feats = _features(spark, sf_dir).collect()
    train = [r for r in feats if split_of[r["doc_id"]] == "train"]
    w = [0.0] * 5
    for _ in range(GD_ITERS):
        s = [0] * 5
        for r in train:
            x = (1.0, r["f1"], r["f2"], r["f3"], r["f4"])
            z = sum(w[j] * x[j] for j in range(5))
            # identical association to _gd_z: left-to-right adds
            z = (w[0] + w[1] * x[1] + w[2] * x[2] + w[3] * x[3]
                 + w[4] * x[4])
            p = 0.5 + 0.5 * z / (1.0 + abs(z))
            for j in range(5):
                s[j] += int(Decimal(repr((r["y"] - p) * x[j] * 1e6))
                            .quantize(Decimal("1"),
                                      rounding=ROUND_HALF_UP))
        w = [w[j] + GD_LR * (float(s[j]) / len(train) / 1e6)
             for j in range(5)]
    expect = {}
    for r in feats:
        sp = split_of[r["doc_id"]]
        z = (w[0] + w[1] * r["f1"] + w[2] * r["f2"] + w[3] * r["f3"]
             + w[4] * r["f4"])
        n, ok = expect.get(sp, (0, 0))
        expect[sp] = (n + 1, ok + int((z >= 0) == (r["y"] == 1.0)))
    assert set(out) == set(expect)
    for sp, (n, ok) in expect.items():
        assert out[sp]["n_docs"] == n
        assert out[sp]["n_correct"] == ok
        assert abs(out[sp]["accuracy"] - ok / n) < 2e-6
    assert "train" in expect and len(train) > 0


def test_calibration_curve_matches_naive(spark, sf_dir):
    # Naive recompute from the per-doc score relation: band membership,
    # integer-millionth mean score, and positive rate must all agree.
    from collections import defaultdict
    from photon_spark.functions import text
    from photon_spark.queries_training import (CAL_BANDS, _cls_score,
                                               _docs,
                                               q_classifier_calibration_curve)
    out = {r["band"]: r
           for r in q_classifier_calibration_curve(spark, sf_dir).collect()}
    d = _docs(spark, sf_dir)
    prof = text.text_profile(d).join(d.select("doc_id", "lang"), "doc_id")
    rows = prof.withColumn("score", _cls_score(prof)) \
               .select("score", "lang").collect()
    agg = defaultdict(lambda: [0, 0, 0])  # n, sum_s_int, n_pos
    for r in rows:
        b = min(int(r["score"] * CAL_BANDS), CAL_BANDS - 1)
        agg[b][0] += 1
        agg[b][1] += round(r["score"] * 1e6)
        agg[b][2] += 1 if r["lang"] == "en" else 0
    assert set(out) == set(agg)
    for b, (n, s, p) in agg.items():
        assert out[b]["n_docs"] == n
        assert out[b]["n_pos"] == p
        assert abs(out[b]["avg_score"] - s / n / 1e6) < 2e-6
        assert abs(out[b]["pos_rate"] - p / n) < 2e-6
