"""knn_graph: exactness vs the per-query brute force, graph shape
invariants, and block-count invariance (the blocking is a physical
choice — it must never change the result)."""

from pyspark.sql import functions as F

from photon_spark.functions import similarity


def test_knn_graph_matches_bruteforce_per_query(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    g = similarity.knn_graph(emb, k=3)
    rows = g.collect()
    ids = {r.id for r in rows}
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r.id, []).append((r.nbr, r.cosine))
    n = emb.count()
    assert len(ids) == n          # every vector has neighbors
    assert all(len(v) == 3 for v in by_id.values())
    assert all(r.id != r.nbr for r in rows)
    # spot-check 5 ids against the single-query exact top-k
    for qid in sorted(ids)[:5]:
        exact = similarity.brute_force_topk(emb, qid, k=3).collect()
        assert [(e.vec_id, e.cosine) for e in exact] == by_id[qid]


def test_knn_graph_block_count_invariant(spark, sf_dir):
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .where(F.col("vec_id") < 60))
    a = set(map(tuple, similarity.knn_graph(emb, k=2, n_blocks=3).collect()))
    b = set(map(tuple, similarity.knn_graph(emb, k=2, n_blocks=7).collect()))
    assert a == b


def test_dup_graph_degree_handshake(spark, sf_dir):
    from photon_spark.functions import dedup
    from photon_spark.queries_northstar import q_dup_graph_degree
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_pairs = dedup.minhash_near_duplicates(docs).count()
    rows = q_dup_graph_degree(spark, sf_dir)
    got = rows.collect()
    # handshake lemma: sum of degrees == 2 * |edges|
    assert sum(r.degree * r.n_docs for r in got) == 2 * n_pairs
    dedup.release_cache(rows)


def test_knn_graph_ivf_recall_floor(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {(r.id, r.nbr)
             for r in similarity.knn_graph(emb, k=3).collect()}
    approx = {(r.id, r.nbr)
              for r in similarity.knn_graph_ivf(
                  emb, k=3, n_cells=8, n_probe=3).collect()}
    recall = len(exact & approx) / len(exact)
    # sf0.001 embeddings are near-uniform, so cells barely concentrate
    # neighbors; the floor is "meaningfully above the 3-of-8 = 0.375
    # random-manifest baseline", not a production recall claim (larger
    # corpora with real cluster structure probe far better)
    assert recall >= 0.45, recall
    # ids covered: every vector still gets k neighbors from its manifest
    assert {i for i, _ in approx} == {i for i, _ in exact}
