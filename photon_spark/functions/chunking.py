"""Context-window chunking and sequence packing — the two "shape the
corpus for training" operators every LLM data pipeline runs after
filtering/dedup (reference has no analogue; these are driver-mandated
north-star extensions layered on the documents table).

- :func:`chunk_docs` — split each document into fixed-size character
  windows with overlap. Pure map-side explode: scan → per-row sequence →
  explode → project. No shuffle at any scale; 100 TB chunks exactly like
  100 MB.
- :func:`pack_sequences` — GPT-style concat-and-chunk packing: lay all
  documents end-to-end in ``doc_id`` order and cut the token stream into
  fixed-budget training sequences. The global running token total is the
  classic distributed prefix sum: a *bucketed* cumulative sum (one shuffle
  by ``doc_id div W`` with an in-bucket window) plus driver-side exclusive
  offsets of the tiny per-bucket totals, broadcast back. No
  single-partition global window — the r1-verdict scale-killer this
  design avoids — and the result is independent of ``bucket_width``,
  which is what the DuckDB oracle (a plain windowed cumsum) checks.

Float policy (queries.py): every measure here is integer arithmetic
(lengths, counts, md5 of exact substrings); the only division is a final
ratio rounded to 6dp on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_docs(df: DataFrame, chunk_size: int, overlap: int,
               text_col: str = "text", id_col: str = "doc_id",
               with_text: bool = False) -> DataFrame:
    """Overlapping character windows: chunk i covers
    ``[i*stride, i*stride + chunk_size)`` with ``stride = chunk_size -
    overlap``; the last window is the first one reaching the end of the
    document; every document yields ≥ 1 chunk (empty text included, as a
    single empty chunk).

    Returns (id, chunk_idx, chunk_start, chunk_len, chunk_md5) — the md5
    pins exact chunk *content* in the hash gate, not just boundaries.
    ``with_text=True`` adds the chunk text itself as ``chunk_text``
    (for downstream re-analysis like paragraph-level MinHash) — every
    consumer shares THIS window arithmetic, so the boundary rule cannot
    drift between the exact and near paragraph-dedup paths.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    length = F.length(F.col(text_col))
    n_chunks = F.when(length <= chunk_size, F.lit(1)).otherwise(
        F.ceil((length - chunk_size) / F.lit(stride)).cast("long") + 1)
    exploded = df.select(
        F.col(id_col), F.col(text_col), length.alias("_len"),
        F.explode(F.sequence(F.lit(0).cast("long"),
                             n_chunks - 1)).alias("chunk_idx"))
    start = (F.col("chunk_idx") * stride).cast("long")
    chunk = F.col(text_col).substr(start + 1, F.lit(chunk_size))
    cols = [
        F.col(id_col),
        F.col("chunk_idx"),
        start.alias("chunk_start"),
        F.length(chunk).cast("long").alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    ]
    if with_text:
        cols.append(chunk.alias("chunk_text"))
    return exploded.select(*cols)


def cumulative_by_bucket(df: DataFrame, value_col: str, order_col: str,
                         bucket_width: int) -> DataFrame:
    """Distributed inclusive prefix sum of ``value_col`` in ``order_col``
    order, as an extra ``cum`` column.

    Stage 1: shuffle once by ``bucket = order div W``; window-cumsum within
    each bucket (parallel across buckets). Stage 2: per-bucket totals are
    exclusive-prefix-summed with a CONSTANT-bounded driver share
    (:func:`photon_spark.functions._util.exclusive_prefix_offsets`):
    ≤PREFIX_FANOUT buckets collect directly (the plan below is then the
    original one-level form); above that the two-level tree rollup runs
    the per-bucket prefix DISTRIBUTED and only superbucket totals — a
    constant — reach the driver. Total data moved twice: once keyed by
    bucket, once a broadcast of O(n/W) longs. At 100 TB pick W so the
    bucket count stays ~1e5-1e6: every heavy step is parallel and the
    driver's share never grows with it.
    """
    from photon_spark.functions._util import exclusive_prefix_offsets

    b = df.withColumn("_bucket", (F.col(order_col) / bucket_width)
                      .cast("long"))
    w = (Window.partitionBy("_bucket").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = b.withColumn("_local_cum", F.sum(value_col).over(w))
    offsets, off_df = exclusive_prefix_offsets(
        b.groupBy("_bucket").agg(F.sum(value_col).alias("_t")),
        "_bucket", "_t")
    spark = df.sparkSession
    if off_df is None:
        off_df = spark.createDataFrame(
            [(k, v) for k, v in offsets.items()],
            "_bucket long, _offset long")
    return (local.join(F.broadcast(off_df), "_bucket")
                 .withColumn("cum", F.col("_local_cum") + F.col("_offset"))
                 .drop("_bucket", "_local_cum", "_offset"))


def pack_sequences(df: DataFrame, budget: int, token_count_col: str,
                   id_col: str = "doc_id",
                   bucket_width: int = 128) -> DataFrame:
    """Concat-and-chunk packing audit: documents are concatenated in
    ``id_col`` order and the token stream is cut every ``budget`` tokens.
    Per document: the first and last training sequence it lands in, and
    whether it straddles a sequence boundary (``spans_boundary``) — the
    docs a loader must split or mask across sequences.

    Zero-token documents are excluded (they occupy no stream positions).
    """
    d = df.where(F.col(token_count_col) > 0)
    cum = cumulative_by_bucket(d, token_count_col, id_col, bucket_width)
    first_seq = F.floor((F.col("cum") - F.col(token_count_col)) / budget)
    last_seq = F.floor((F.col("cum") - 1) / budget)
    return cum.select(
        F.col(id_col),
        F.col(token_count_col).alias("n_tokens"),
        F.col("cum").alias("cum_tokens"),
        first_seq.cast("long").alias("first_seq"),
        last_seq.cast("long").alias("last_seq"),
        (first_seq != last_seq).alias("spans_boundary"))
