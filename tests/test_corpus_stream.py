"""Streaming corpus ingest with online near-dup rejection
(streaming/corpus.py): invariants over a 3-batch drive of the documents
table, checkpoint idempotence, and resume with a pre-existing index.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from photon_spark.functions import dedup
from photon_spark.streaming.corpus import StreamingCorpusIngest

MINER = dict(num_hashes=16, bands=4, threshold=0.7)


def _drop_batches(spark, sf_dir, src, n_batches=3):
    rows = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text", "lang", "source")
            .orderBy("doc_id").collect())
    os.makedirs(src, exist_ok=True)
    per = (len(rows) + n_batches - 1) // n_batches
    for b in range(n_batches):
        with open(f"{src}/batch_{b}.json", "w") as f:
            for r in rows[b * per:(b + 1) * per]:
                f.write(json.dumps(r.asDict()) + "\n")
    return len(rows)


@pytest.fixture(scope="module")
def ingested(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus_stream")
    src, corpus, index = (str(root / d) for d in ("src", "corpus", "index"))
    n_rows = _drop_batches(spark, sf_dir, src)
    ing = StreamingCorpusIngest(spark, src, corpus, index,
                                checkpoint_dir=str(root / "ckpt"), **MINER)
    acc, rej = ing.run()
    return dict(src=src, corpus=corpus, index=index, ing=ing,
                n_rows=n_rows, accepted=acc, rejected=rej,
                root=root)


def test_counts_conserved(ingested, spark):
    assert ingested["accepted"] + ingested["rejected"] == ingested["n_rows"]
    assert ingested["rejected"] > 0  # the corpus does contain near-dups
    got = spark.read.parquet(ingested["corpus"]).count()
    assert got == ingested["accepted"]


def test_accepted_corpus_has_no_near_dup_pairs(ingested, spark):
    """THE invariant: re-mining the accepted corpus with the same miner
    finds nothing."""
    corpus = spark.read.parquet(ingested["corpus"])
    pairs = dedup.minhash_near_duplicates(corpus, **MINER)
    assert pairs.count() == 0


def test_index_matches_accepted_docs(ingested, spark):
    corpus_ids = {r["doc_id"] for r in
                  spark.read.parquet(ingested["corpus"])
                       .select("doc_id").collect()}
    idx_ids = {r["id"] for r in
               spark.read.parquet(ingested["index"])
                    .select("id").distinct().collect()}
    # every indexed id is accepted; accepted docs missing from the index
    # are only those with no shingles (too short to mine)
    assert idx_ids <= corpus_ids
    corpus = spark.read.parquet(ingested["corpus"])
    n_shingleable = dedup._shingled(corpus, "text", "doc_id", 3).count()
    assert len(idx_ids) == n_shingleable


def test_rerun_is_idempotent(ingested, spark):
    """The checkpoint remembers processed files: draining again ingests
    nothing new."""
    ing2 = StreamingCorpusIngest(
        spark, ingested["src"], ingested["corpus"], ingested["index"],
        checkpoint_dir=str(ingested["root"] / "ckpt"), **MINER)
    acc, rej = ing2.run()
    assert (acc, rej) == (0, 0)
    assert (spark.read.parquet(ingested["corpus"]).count()
            == ingested["accepted"])


def test_new_batch_respects_existing_index(ingested, spark):
    """A fresh ingest session (new checkpoint) over exact copies of
    already-accepted docs rejects all of them against the persisted
    index — resume semantics for day-2 arrivals."""
    root = ingested["root"]
    src2 = str(root / "src2")
    os.makedirs(src2, exist_ok=True)
    sample = (spark.read.parquet(ingested["corpus"])
              .join(spark.read.parquet(ingested["index"])
                         .select(F.col("id").alias("doc_id")).distinct(),
                    "doc_id", "left_semi")
              .orderBy("doc_id").limit(20).collect())
    with open(f"{src2}/dups.json", "w") as f:
        for r in sample:
            d = r.asDict()
            d["doc_id"] = d["doc_id"] + 10_000_000  # new ids, same text
            f.write(json.dumps(d) + "\n")
    before = spark.read.parquet(ingested["corpus"]).count()
    ing3 = StreamingCorpusIngest(
        spark, src2, ingested["corpus"], ingested["index"],
        checkpoint_dir=str(root / "ckpt2"), **MINER)
    acc, rej = ing3.run()
    assert acc == 0
    assert rej == len(sample)
    # the day-2 session (fresh checkpoint, batch ids restarting at 0)
    # must not clobber day-1's batch partitions
    assert spark.read.parquet(ingested["corpus"]).count() == before


def test_replay_ignores_own_ghost_partition(spark, sf_dir, tmp_path):
    """Crash simulation: a partial write of THIS batch's own partition
    (the ghost left when a crash hits between the writes and the
    checkpoint commit) must not make the replay reject the batch against
    itself."""
    import shutil
    src, corpus, index = (str(tmp_path / d)
                          for d in ("src", "corpus", "index"))
    _drop_batches(spark, sf_dir, src, n_batches=1)
    ing = StreamingCorpusIngest(spark, src, corpus, index,
                                checkpoint_dir=str(tmp_path / "ckpt"),
                                **MINER)
    # fabricate the ghost: what batch 0 of this checkpoint would write
    cur = f"{ing._ck}-0"
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text", "lang", "source"))
    docs.write.parquet(f"{corpus}/batch={cur}")
    from photon_spark.functions import dedup
    sh = dedup._shingled(docs, "text", "doc_id", 3)
    dedup.minhash_band_buckets(sh, 16, 4).write.parquet(
        f"{index}/batch={cur}")
    ing2 = StreamingCorpusIngest(spark, src, corpus, index,
                                 checkpoint_dir=str(tmp_path / "ckpt"),
                                 **MINER)
    acc, rej = ing2.run()
    # the replay OVERWRITES the ghost and accepts what a clean first run
    # would have accepted — not zero
    assert acc > 0
    corpus_df = spark.read.parquet(corpus)
    assert corpus_df.count() == acc
    assert dedup.minhash_near_duplicates(corpus_df, **MINER).count() == 0
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_hybrid_exact_dedup_stage(spark, tmp_path):
    """dropDuplicatesWithinWatermark + band-index hybrid: exact copies
    (different doc_id, identical text) are dropped by the bounded-state
    exact stage before any shingling; near-dups (non-identical text)
    still fall through to the LSH band-index rejection."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    base = ("spark shuffle partition broadcast join hash table scan "
            "filter window sort merge batch row column value key")
    near = base + " appended"  # jaccard 15/16 ≈ 0.94, not exact
    uniq = " ".join(f"tok{i}" for i in range(20))
    batches = [
        [(1, base), (2, uniq)],
        [(3, base)],          # exact copy of doc 1 → exact stage drops it
        [(4, near)],          # near-dup of doc 1 → band index rejects it
    ]
    import time
    now = time.time()
    for b, rows in enumerate(batches):
        path = f"{src}/batch_{b}.json"
        with open(path, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text,
                                    "lang": "en", "source": "s"}) + "\n")
        # FileStreamSource orders batches by mtime: pin arrival order so
        # the exact-copy and near-dup land AFTER their originals
        os.utime(path, (now + 10 * b, now + 10 * b))
    ing = StreamingCorpusIngest(
        spark, src, str(tmp_path / "corpus"), str(tmp_path / "index"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        exact_dedup_watermark="1 hour", **MINER)
    acc, rej = ing.run()
    got = {r["doc_id"] for r in
           spark.read.parquet(str(tmp_path / "corpus")).collect()}
    # doc 3 was dropped by the exact stage (never reached the near-dup
    # counters); doc 4 reached them and was rejected by the band index
    assert got == {1, 2}
    assert (acc, rej) == (2, 1)
    # no exact-content duplicates anywhere in the accepted corpus
    texts = [r["text"] for r in
             spark.read.parquet(str(tmp_path / "corpus")).collect()]
    assert len(texts) == len(set(texts))


def test_annotate_mode_pair_table_equals_batch_mine(spark, sf_dir,
                                                    tmp_path):
    """Annotate-only mode (reject=False, pair_dir set): nothing is
    dropped, every discovered pair is recorded — and the accumulated
    streaming pair table over a 3-batch drive equals the batch miner's
    full-corpus mine EXACTLY (ids and 6dp jaccards). This is the
    streaming half of the shared mine-once pair relation
    (pair_cache.PairTable is the batch half; both rest on band
    membership being doc-local)."""
    src, corpus, index, pairs_dir = (str(tmp_path / d) for d in
                                     ("src", "corpus", "index", "pairs"))
    n_rows = _drop_batches(spark, sf_dir, src)
    ing = StreamingCorpusIngest(spark, src, corpus, index,
                                checkpoint_dir=str(tmp_path / "ckpt"),
                                pair_dir=pairs_dir, reject=False, **MINER)
    acc, rej = ing.run()
    assert (acc, rej) == (n_rows, 0)  # annotate mode never drops
    got = {(r["lo_id"], r["hi_id"], r["jaccard"]) for r in
           spark.read.parquet(pairs_dir)
                .select("lo_id", "hi_id", "jaccard").collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    full = dedup.minhash_near_duplicates(docs, **MINER)
    want = {(r["lo_id"], r["hi_id"], r["jaccard"])
            for r in full.collect()}
    dedup.release_cache(full)
    assert want and got == want
