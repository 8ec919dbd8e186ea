"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio libraries, so the decode kernels are
deterministic fakes behind ``_decode_*`` seams (clearly marked; swap in
PIL/ffmpeg in production). Everything Spark-side is real and tested:
schemas, Arrow-batched ``mapInPandas`` plumbing, batch shapes, partition
behavior — the parts that matter at 100 TB.

Design: binary payloads never enter a shuffle. Feature extraction is a
map-only ``mapInPandas`` pass (scan → features), and downstream analytics
join on the small feature table, not the blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried alongside every binary payload.
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),      # image/video
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),   # audio/video
    T.StructField("content", T.BinaryType()),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("mean_luma", T.DoubleType()),
    T.StructField("resized_w", T.IntegerType()),
    T.StructField("resized_h", T.IntegerType()),
])

FRAME_SAMPLE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_ts_ms", T.LongType()),
    T.StructField("frame", T.BinaryType()),
])


def synthesize_media(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media table (seeded by media_id) for tests.
    Built as ONE partition at the source: scattering 64 rows across
    default parallelism costs a Python-worker roundtrip per core on every
    downstream pass (and a post-hoc coalesce(1) serializes those
    roundtrips instead of removing them)."""
    rows = []
    for i in range(n):
        blob = bytes((i * 31 + j * 7) % 256 for j in range(256 + (i % 5) * 64))
        rows.append((i, kind, f"{kind}/fake", 64 + i % 32, 48 + i % 32,
                     1000 * (1 + i % 10), blob))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), MEDIA_SCHEMA)


# ----------------------------------------------------------- decode seams

def _decode_image(content: bytes, width: int, height: int):
    """STUB decode: production swaps in PIL. The deterministic fake returns
    per-byte mean as 'luma' so tests have exact expectations."""
    if content is None:
        raise NotImplementedError("image decode of NULL content")
    mean = sum(content) / len(content) if content else 0.0
    return {"mean_luma": mean}


def _resize_dims(width: int, height: int, target: int):
    if not width or not height:
        return (target, target)
    scale = target / max(width, height)
    return (max(1, round(width * scale)), max(1, round(height * scale)))


# ------------------------------------------------------------- operators

def image_features(df: DataFrame, target_size: int = 32) -> DataFrame:
    """Decode + feature-extract + resize metadata, as one Arrow-batched
    map-only pass (no shuffle; blobs stay in their scan partition)."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            feats = []
            for rec in pdf.itertuples(index=False):
                content = bytes(rec.content) if rec.content is not None else b""
                d = _decode_image(content, rec.width, rec.height)
                w, h = _resize_dims(rec.width, rec.height, target_size)
                feats.append((rec.media_id, len(content),
                              round(d["mean_luma"], 6), w, h))
            yield pd.DataFrame(feats, columns=[f.name for f in
                                               IMAGE_FEATURES_SCHEMA.fields])

    return df.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  max_frames: int = 8) -> DataFrame:
    """Frame sampling for video rows: emits one row per sampled frame
    (1:N mapInPandas — output rows != input rows, the shape that matters).
    Frame payloads are deterministic fakes (content slice)."""

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                dur = int(rec.duration_ms or 0)
                n = min(max_frames, max(1, dur // every_ms))
                content = bytes(rec.content) if rec.content is not None else b""
                for k in range(n):
                    ts = k * every_ms
                    frame = content[k::max(1, n)][:64]  # fake decode slice
                    out.append((rec.media_id, k, ts, frame))
            yield pd.DataFrame(out, columns=[f.name for f in
                                             FRAME_SAMPLE_SCHEMA.fields])

    return df.mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)


AUDIO_WINDOW_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("win_idx", T.IntegerType()),
    T.StructField("win_start_ms", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("energy", T.LongType()),
    T.StructField("peak", T.IntegerType()),
])


def audio_window_features(df: DataFrame, window_ms: int = 500,
                          max_windows: int = 8) -> DataFrame:
    """Windowed audio features: split each audio payload into
    ``min(max_windows, duration_ms // window_ms)`` equal byte windows and
    emit per-window energy (byte sum) and peak — the 1:N audio analogue
    of video frame sampling (speech/VAD pipelines consume exactly this
    relation before any model runs).

    Decode seam: a real pipeline decodes PCM and sums |samples|; this
    container has no codecs, so energy runs over the raw payload bytes —
    integer-exact, so the whole relation is oracle-checkable from the
    synthetic blob's closed form. Map-only Arrow pass; blobs never
    shuffle — only (id, 5 scalars) per window leave the scan."""

    def windows(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                dur = int(rec.duration_ms or 0)
                content = bytes(rec.content) if rec.content is not None \
                    else b""
                n = min(max_windows, max(1, dur // window_ms))
                ln = len(content)
                for k in range(n):
                    a, b = k * ln // n, (k + 1) * ln // n
                    if a == b:
                        # zero-byte window (blob shorter than n): the
                        # per-byte oracle grouping has no row for it, so
                        # emit none here either — the engines agree for
                        # arbitrary short/empty blobs, not just the
                        # gated synth data
                        continue
                    seg = content[a:b]
                    out.append((rec.media_id, k, k * dur // n,
                                b - a, sum(seg), max(seg)))
            yield pd.DataFrame(out, columns=[f.name for f in
                                             AUDIO_WINDOW_SCHEMA.fields])

    return df.mapInPandas(windows, schema=AUDIO_WINDOW_SCHEMA)


def phash_bands(df: DataFrame, content_col: str = "content",
                id_col: str = "media_id") -> DataFrame:
    """64-bit aHash-style perceptual fingerprint, emitted as 4 × 16-bit
    band keys (banding is the LSH trick: near-identical media agree on at
    least one band, so candidate generation is an equi-join on
    (band, key) — never an all-pairs scan).

    Decode seam: a real pipeline aHashes the decoded luma plane;
    this container has no codecs, so the hash runs over the raw payload
    bytes (64 equal segments; bit k = segment-k mean ≥ global mean, kept
    exact as ``sum_k·64 ≥ total``). The banding/join/verify plumbing is
    the production shape either way. Map-only Arrow pass; blobs never
    shuffle — only (id, 4 longs) leave the scan."""

    @F.pandas_udf("array<long>")
    def _ph(blobs: pd.Series) -> pd.Series:
        import numpy as np
        out = []
        for b in blobs:
            a = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.int64)
            s = max(a.size // 64, 1)
            segs = a[:64 * s].reshape(-1, s).sum(axis=1)
            if segs.size < 64:  # blob shorter than 64 bytes: pad zero segs
                segs = np.pad(segs, (0, 64 - segs.size))
            total = int(segs.sum())
            bits = segs * 64 >= total
            out.append([int(sum(1 << k for k in range(16)
                                if bits[16 * m + k])) for m in range(4)])
        return pd.Series(out)

    return df.select(F.col(id_col), _ph(F.col(content_col)).alias("bands"))


def media_stats(df: DataFrame) -> DataFrame:
    """Blob-free metadata aggregation (the analytics side): per kind/mime,
    counts + size stats. Pure built-ins — blobs are pruned from the scan
    (only length is read)."""
    return (df.select("kind", "mime", F.length("content").alias("n_bytes"),
                      "duration_ms")
              .groupBy("kind", "mime")
              .agg(F.count(F.lit(1)).alias("n_items"),
                   F.sum("n_bytes").alias("total_bytes"),
                   F.round(F.avg("n_bytes"), 2).alias("avg_bytes"),
                   F.max("duration_ms").alias("max_duration_ms")))
