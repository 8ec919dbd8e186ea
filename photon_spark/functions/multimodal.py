"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

PNG images decode for REAL: ``decode_png`` is a pure-stdlib decoder (zlib
inflate + per-row unfilter, all five PNG filter types, CRC-checked) — no
PIL needed — and ``_decode_image`` routes PNG payloads through it, so
luma statistics come from actual pixel values. Non-PNG codecs (JPEG,
audio, video) remain deterministic fakes behind the ``_decode_*`` seams
(clearly marked; swap in PIL/ffmpeg in production). Everything Spark-side
is real and tested: schemas, Arrow-batched ``mapInPandas`` plumbing, batch
shapes, partition behavior — the parts that matter at 100 TB.

Design: binary payloads never enter a shuffle. Feature extraction is a
map-only ``mapInPandas`` pass (scan → features), and downstream analytics
join on the small feature table, not the blobs.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32
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


def synthesize_png_media(spark, n: int = 48) -> DataFrame:
    """Deterministic REAL-PNG media table: image ``i`` is a
    ``(16 + i%9) × (12 + i%7)`` 8-bit greyscale PNG whose pixel at
    ``(x, y)`` is ``(31·i + 7·y + 3·x) mod 256`` — a closed form an
    oracle can re-derive per pixel without any decoder. Rows cycle
    through all five PNG scanline filters (see encode_png), so decoding
    these is a full-codec exercise, not a filter-0 special case. One
    source partition (see synthesize_media's rationale)."""
    rows = []
    for i in range(n):
        w, h = 16 + i % 9, 12 + i % 7
        px = bytes((31 * i + 7 * y + 3 * x) % 256
                   for y in range(h) for x in range(w))
        rows.append((i, "image", "image/png", w, h, 0,
                     encode_png(px, w, h)))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), MEDIA_SCHEMA)


def synthesize_rgb_png_media(spark, n: int = 48) -> DataFrame:
    """Deterministic truecolor-PNG media table: image ``i`` is a
    ``(16 + i%9) × (12 + i%7)`` 8-bit RGB PNG whose channel ``c`` of
    pixel ``(x, y)`` is ``(31·i + 7·y + 3·x + 11·c) mod 256`` — a closed
    form an oracle can re-derive per subpixel without any decoder. Rows
    cycle through all five PNG scanline filters (encode_png), and with
    bpp=3 the filters' left-neighbor terms exercise the multi-byte
    pixel paths a greyscale fixture cannot. One source partition (see
    synthesize_media's rationale)."""
    rows = []
    for i in range(n):
        w, h = 16 + i % 9, 12 + i % 7
        px = bytes((31 * i + 7 * y + 3 * x + 11 * c) % 256
                   for y in range(h) for x in range(w) for c in range(3))
        rows.append((i, "image", "image/png", w, h, 0,
                     encode_png(px, w, h, channels=3)))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), MEDIA_SCHEMA)


def synthesize_palette_png_media(spark, n: int = 48) -> DataFrame:
    """Deterministic indexed-color-PNG media table: image ``i`` is a
    ``(16 + i%9) × (12 + i%7)`` 8-bit palette PNG (color type 3) with
    ``16 + i%17`` palette entries where entry ``k`` is
    ``((7k+3i) % 256, (11k+5i) % 256, (13k+2i) % 256)`` and the index
    of pixel ``(x, y)`` is ``(i + 3y + 5x) mod n_pal`` — closed forms
    an oracle can re-derive per pixel without any decoder. Rows cycle
    through all five PNG scanline filters on the INDEX stream
    (bpp=1), exercising the unfilter-then-dereference order the spec
    mandates (filters apply to indices, never to the palette colors).
    One source partition (see synthesize_media's rationale)."""
    rows = []
    for i in range(n):
        w, h = 16 + i % 9, 12 + i % 7
        n_pal = 16 + i % 17
        pal = [((7 * k + 3 * i) % 256, (11 * k + 5 * i) % 256,
                (13 * k + 2 * i) % 256) for k in range(n_pal)]
        idx = bytes((i + 3 * y + 5 * x) % n_pal
                    for y in range(h) for x in range(w))
        rows.append((i, "image", "image/png", w, h, 0,
                     encode_palette_png(idx, pal, w, h)))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), MEDIA_SCHEMA)


def synthesize_mixed_media(spark, n: int = 48) -> DataFrame:
    """Deterministic MIXED media table — the honest production shape
    where a corpus carries more than one codec AND broken objects:
    row ``i`` is a real greyscale PNG (the synthesize_png_media
    closed form) when ``i % 3 == 0``; a CORRUPT PNG (the 8-byte PNG
    signature followed by deterministic junk — decode_png RAISES on
    it, exercising image_features' except-ValueError degrade, not
    just the non-PNG seam) when ``i % 3 == 1``, mime image/png-bad;
    and an undecodable fake blob (the synthesize_media byte form,
    mime image/fake, which short-circuits before the decoder) when
    ``i % 3 == 2``. Exists to put BOTH per-row decode-DEGRADE paths
    under the hash gate, not just under pytest."""
    rows = []
    for i in range(n):
        if i % 3 == 0:
            w, h = 16 + i % 9, 12 + i % 7
            px = bytes((31 * i + 7 * y + 3 * x) % 256
                       for y in range(h) for x in range(w))
            rows.append((i, "image", "image/png", w, h, 0,
                         encode_png(px, w, h)))
        elif i % 3 == 1:
            junk = bytes((i * 31 + j * 7) % 256
                         for j in range(256 + (i % 5) * 64))
            rows.append((i, "image", "image/png-bad", 16, 16, 0,
                         PNG_SIG + junk))
        else:
            blob = bytes((i * 31 + j * 7) % 256
                         for j in range(256 + (i % 5) * 64))
            rows.append((i, "image", "image/fake", 64 + i % 32,
                         48 + i % 32, 0, blob))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), MEDIA_SCHEMA)


IMAGE_RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("channel", T.IntegerType()),
    T.StructField("decoded_w", T.IntegerType()),
    T.StructField("decoded_h", T.IntegerType()),
    T.StructField("n_px", T.LongType()),
    T.StructField("px_sum", T.LongType()),
    T.StructField("px_min", T.IntegerType()),
    T.StructField("px_max", T.IntegerType()),
    T.StructField("px_mean", T.DoubleType()),
])


def image_resize_channel_stats(df: DataFrame, out_w: int = 8,
                               out_h: int = 8) -> DataFrame:
    """Decode PNG payloads, nearest-neighbor-resample to ``out_w × out_h``
    and emit per-image PER-CHANNEL statistics of the RESIZED pixels —
    the thumbnail/normalize step every vision-training pipeline runs
    before batching, with values that depend on real decode + real
    resample (so the hash gate certifies both). The sample map is the
    standard floor rule ``src = (dst · src_dim) div out_dim`` — integer
    arithmetic both engines reproduce exactly. Map-only Arrow pass:
    blobs never shuffle; 3 stat rows per image leave the scan."""

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from photon_spark.functions.quality import _r6
        cols = [f.name for f in IMAGE_RESIZE_SCHEMA.fields]
        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                content = bytes(rec.content) if rec.content is not None \
                    else b""
                w, h, ch, px = decode_png(content)
                arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
                iy = (np.arange(out_h) * h) // out_h
                ix = (np.arange(out_w) * w) // out_w
                rs = arr[iy][:, ix].astype(np.int64)   # (out_h, out_w, ch)
                n = out_h * out_w
                for c in range(ch):
                    plane = rs[:, :, c]
                    s = int(plane.sum())
                    out.append((rec.media_id, c, w, h, n, s,
                                int(plane.min()), int(plane.max()),
                                _r6(s / n)))
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(extract, schema=IMAGE_RESIZE_SCHEMA)


IMAGE_DECODE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("decoded_w", T.IntegerType()),
    T.StructField("decoded_h", T.IntegerType()),
    T.StructField("n_pixels", T.LongType()),
    T.StructField("luma_sum", T.LongType()),
    T.StructField("min_luma", T.IntegerType()),
    T.StructField("max_luma", T.IntegerType()),
    T.StructField("mean_luma", T.DoubleType()),
])


def image_decode_features(df: DataFrame) -> DataFrame:
    """Decode PNG payloads and emit per-image pixel statistics — REAL
    decoded values (stdlib inflate + unfilter), not payload-byte fakes.
    Map-only Arrow pass: blobs never shuffle; only (id, 7 scalars) leave
    the scan. The luma sum is an exact integer, so the relation is
    hash-gateable; the mean divides once at the end (long → double,
    matching the oracle's cast-then-divide)."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        from photon_spark.functions.quality import _r6
        for pdf in batches:
            out = []
            for rec in pdf.itertuples(index=False):
                content = bytes(rec.content) if rec.content is not None \
                    else b""
                d = _decode_image(content, rec.width, rec.height)
                if "n_pixels" not in d:
                    raise ValueError(
                        f"media_id={rec.media_id}: not a PNG payload — "
                        "image_decode_features requires real decodable "
                        "images")
                n = d["n_pixels"]
                mean = _r6(d["luma_sum"] / n) if n else 0.0
                out.append((rec.media_id, d["decoded_w"], d["decoded_h"],
                            n, d["luma_sum"], d["min_luma"], d["max_luma"],
                            mean))
            yield pd.DataFrame(out, columns=[f.name for f in
                                             IMAGE_DECODE_SCHEMA.fields])

    return df.mapInPandas(extract, schema=IMAGE_DECODE_SCHEMA)


# --------------------------------------------------------- PNG codec
# Pure-stdlib PNG (RFC 2083): 8-bit greyscale (color type 0) and
# truecolor (color type 2), non-interlaced. zlib handles DEFLATE; the
# filter/unfilter passes implement the spec's five per-scanline filters.

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", crc32(tag + data) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_scanlines(pixels: bytes, width: int, height: int,
                      bpp: int) -> bytes:
    """Apply the five PNG scanline filters, cycling ``y % 5`` —
    deliberately using ALL spec filters so a decoder must implement
    every unfilter path to round-trip the image."""
    stride = width * bpp
    raw = bytearray()
    prior = bytes(stride)
    for y in range(height):
        row = pixels[y * stride:(y + 1) * stride]
        ft = y % 5
        raw.append(ft)
        for i in range(stride):
            a = row[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if ft == 0:
                f = row[i]
            elif ft == 1:
                f = row[i] - a
            elif ft == 2:
                f = row[i] - b
            elif ft == 3:
                f = row[i] - (a + b) // 2
            else:
                f = row[i] - _paeth(a, b, c)
            raw.append(f & 0xFF)
        prior = row
    return bytes(raw)


def encode_png(pixels: bytes, width: int, height: int,
               channels: int = 1) -> bytes:
    """Encode raw 8-bit pixel rows (greyscale or RGB, row-major) as a
    real PNG (filters cycle per row — see _filter_scanlines)."""
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    raw = _filter_scanlines(pixels, width, height, channels)
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 9))
            + _png_chunk(b"IEND", b""))


def encode_palette_png(indices: bytes, palette: list, width: int,
                       height: int) -> bytes:
    """Encode 8-bit palette indices + an RGB palette as a real
    indexed-color PNG (color type 3, PLTE chunk). The index stream is
    filtered exactly like a greyscale image (bpp=1), per the spec."""
    if len(indices) != width * height:
        raise ValueError("index buffer does not match dimensions")
    if not 1 <= len(palette) <= 256:
        raise ValueError("palette must hold 1-256 entries")
    if any(i >= len(palette) for i in indices):
        raise ValueError("index out of palette range")
    raw = _filter_scanlines(indices, width, height, 1)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    plte = bytes(v for rgb in palette for v in rgb)
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", plte)
            + _png_chunk(b"IDAT", zlib.compress(raw, 9))
            + _png_chunk(b"IEND", b""))


def decode_png(content: bytes):
    """Decode a PNG (8-bit grey, RGB, or palette-indexed,
    non-interlaced) to raw pixel bytes. Returns ``(width, height,
    channels, pixels)`` — palette images (color type 3) come back as
    expanded RGB (channels=3), so downstream luma/resize paths treat
    all color images uniformly. Chunk CRCs are verified; truncated or
    unsupported files raise ValueError."""
    if content[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, width = 8, None
    height = channels = None
    ctype, palette = None, None
    idat, iend = bytearray(), False
    while pos + 8 <= len(content):
        (ln,) = struct.unpack(">I", content[pos:pos + 4])
        tag = content[pos + 4:pos + 8]
        if pos + 12 + ln > len(content):  # data AND its CRC must fit
            raise ValueError("truncated chunk")
        data = content[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", content[pos + 8 + ln:pos + 12 + ln])
        if crc != (crc32(tag + data) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            # the spec fixes IHDR at 13 bytes; a valid-CRC IHDR of any
            # other length would raise struct.error here, escaping the
            # per-row except-ValueError degrade contract downstream
            if ln != 13:
                raise ValueError(f"bad IHDR length {ln} (must be 13)")
            width, height, depth, ctype, comp, filt, ilace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8 or ctype not in (0, 2, 3) or ilace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={ctype} "
                    f"interlace={ilace}); only 8-bit grey/RGB/palette "
                    "non-interlaced")
            channels = 3 if ctype == 2 else 1
        elif tag == b"PLTE":
            if ln == 0 or ln % 3 or ln > 768:
                raise ValueError("bad PLTE length")
            palette = data
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            iend = True
            pos += 12 + ln
            break
        pos += 12 + ln
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    if iend and pos != len(content):
        # trailing bytes after IEND are smuggled payload — the same
        # contract dec.unused_data enforces inside the IDAT stream
        raise ValueError("trailing bytes after IEND")
    if not iend:
        # a file that runs out mid-chunk-header never reaches the
        # truncated-chunk check above; require the IEND terminator so
        # any truncation is an error, not a silent partial decode
        raise ValueError("truncated PNG (missing IEND)")
    bpp, stride = channels, width * channels
    expected = height * (stride + 1)
    # bounded inflate: cap output at expected+1 so a small IDAT claiming
    # huge dimensions (or hiding extra data) cannot balloon executor
    # memory before the size check
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected + 1)
    except zlib.error as e:
        raise ValueError(f"bad IDAT stream: {e}") from None
    if (len(raw) != expected or dec.unconsumed_tail or not dec.eof
            or dec.unused_data):
        # not dec.eof: a stream cut after the last deflate block but
        # before the adler32 trailer returns all `expected` bytes
        # without error — require the verified end-of-stream marker so
        # the integrity check is never silently skipped. unused_data:
        # bytes after a complete stream inside IDAT are smuggled
        # payload, not a valid image
        raise ValueError("decompressed size does not match dimensions")
    out = bytearray(height * stride)
    prior = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)]
        row = bytearray(stride)
        for i in range(stride):
            a = row[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            x = line[i]
            if ft == 0:
                v = x
            elif ft == 1:
                v = x + a
            elif ft == 2:
                v = x + b
            elif ft == 3:
                v = x + (a + b) // 2
            elif ft == 4:
                v = x + _paeth(a, b, c)
            else:
                raise ValueError(f"bad filter type {ft}")
            row[i] = v & 0xFF
        out[y * stride:(y + 1) * stride] = row
        prior = bytes(row)
    if ctype == 3:
        # expand palette indices to RGB; a missing PLTE or an index past
        # the palette end is file corruption, not a decodable image
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        n_pal = len(palette) // 3
        rgb = bytearray(len(out) * 3)
        for k, idx in enumerate(out):
            if idx >= n_pal:
                raise ValueError("palette index out of range")
            rgb[3 * k:3 * k + 3] = palette[3 * idx:3 * idx + 3]
        return width, height, 3, bytes(rgb)
    return width, height, channels, bytes(out)


# ----------------------------------------------------------- decode seams

def _decode_image(content: bytes, width: int, height: int):
    """PNG payloads decode for REAL (``decode_png`` above — stdlib zlib +
    unfilter, no PIL): luma is computed from actual pixel values (RGB via
    the integer Rec.601 weights). Non-PNG payloads keep the deterministic
    byte-mean fake — the documented seam where production swaps in
    PIL/libjpeg for other codecs."""
    if content is None:
        raise NotImplementedError("image decode of NULL content")
    if content[:8] == PNG_SIG:
        w, h, ch, px = decode_png(content)
        if ch == 1:
            lumas = px
        else:
            lumas = [(299 * px[i] + 587 * px[i + 1] + 114 * px[i + 2])
                     // 1000 for i in range(0, len(px), 3)]
        n = len(lumas)
        return {"mean_luma": sum(lumas) / n if n else 0.0,
                "decoded_w": w, "decoded_h": h,
                "luma_sum": sum(lumas),
                "min_luma": min(lumas) if n else 0,
                "max_luma": max(lumas) if n else 0,
                "n_pixels": n}
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

        from photon_spark.functions.quality import _r6
        for pdf in batches:
            feats = []
            for rec in pdf.itertuples(index=False):
                content = bytes(rec.content) if rec.content is not None else b""
                try:
                    d = _decode_image(content, rec.width, rec.height)
                except ValueError:
                    # per-row degrade: an unsupported or corrupt PNG
                    # (RGBA/16-bit/interlaced, bad CRC, bad palette)
                    # falls back to the byte-mean fake instead of
                    # failing the whole extraction job; the gated
                    # strict path is image_decode_features, which
                    # requires real decode. The routing itself is
                    # hash-gated by media_decode_fallback_audit.
                    d = {"mean_luma": (sum(content) / len(content))
                         if content else 0.0}
                w, h = _resize_dims(rec.width, rec.height, target_size)
                feats.append((rec.media_id, len(content),
                              _r6(d["mean_luma"]), w, h))
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
