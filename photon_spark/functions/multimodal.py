"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

PNG, baseline JPEG and GIF images decode for REAL: ``decode_png`` is a
pure-stdlib decoder (zlib inflate + per-row unfilter, all five PNG
filter types, CRC-checked), ``decode_jpeg`` is a stdlib+numpy
baseline SOF0 decoder (Huffman entropy decode, dequant, IDCT, YCbCr,
restart intervals) and ``decode_gif`` is a pure-stdlib single-frame
GIF87a/89a decoder (variable-width LZW, interlace, palette
dereference) — no PIL needed — and ``_decode_image`` routes all three
signatures through them, so luma statistics come from actual pixel
values. Remaining codecs (progressive JPEG, WebP, audio, video) stay
deterministic fakes behind the ``_decode_*`` seams (clearly marked;
swap in PIL/ffmpeg in production). Everything Spark-side is real and
tested: schemas, Arrow-batched ``mapInPandas`` plumbing, batch shapes,
partition behavior — the parts that matter at 100 TB.

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


def _jpeg_tile_pixels(i: int, w: int, h: int) -> bytes:
    """The closed-form flat-8x8-tile greyscale image the JPEG fixtures
    share: pixel (x, y) of image i is ``(37·i + 11·(y div 8) +
    5·(x div 8)) mod 256`` — constant per 8x8 block, so with all-ones
    quantization the lossy pipeline round-trips byte-exactly and a SQL
    oracle re-derives every decoded value (see the JPEG codec notes)."""
    return bytes((37 * i + 11 * (y // 8) + 5 * (x // 8)) % 256
                 for y in range(h) for x in range(w))


def _jpeg_fixture_dims(i: int):
    """8-multiple dims (no edge padding in play), varied per image."""
    return 8 * (2 + i % 3), 8 * (2 + i % 2)


def synthesize_jpeg_media(spark, n: int = 48) -> DataFrame:
    """Deterministic REAL-JPEG media table: image ``i`` is a baseline
    SOF0 JPEG of the :func:`_jpeg_tile_pixels` closed form — greyscale
    (single component) for even ``i``, RGB 4:4:4 with R=G=B for odd
    ``i`` (grey content through the FULL YCbCr forward/inverse path:
    Cb/Cr quantize to exactly 128, so decoded channels equal the tile
    value and the Rec.601 integer luma is the tile value itself). One
    source partition (see synthesize_media's rationale)."""
    rows = []
    for i in range(n):
        w, h = _jpeg_fixture_dims(i)
        grey = _jpeg_tile_pixels(i, w, h)
        if i % 2 == 0:
            blob = encode_jpeg(grey, w, h, 1)
        else:
            rgb = bytes(v for v in grey for _ in range(3))
            blob = encode_jpeg(rgb, w, h, 3)
        rows.append((i, "image", "image/jpeg", w, h, 0, blob))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), MEDIA_SCHEMA)


def synthesize_mixed_media(spark, n: int = 48) -> DataFrame:
    """Deterministic MIXED media table — the honest production shape
    where a corpus carries more than one codec AND broken objects.
    Row ``i`` by ``i % 7``:

    - 0: a real greyscale PNG (the synthesize_png_media closed form);
    - 1: a CORRUPT PNG (signature + deterministic junk — decode_png
      RAISES, exercising the except-ValueError degrade), image/png-bad;
    - 2: an undecodable fake blob (the synthesize_media byte form,
      image/fake — the unknown-signature seam);
    - 3: a REAL baseline JPEG (the _jpeg_tile_pixels closed form, grey
      or RGB-through-YCbCr by ``i % 2``) — since round 9 these rows
      decode for real instead of certifying the byte proxy;
    - 4: a CORRUPT JPEG (SOI + deterministic junk — decode_jpeg
      RAISES), image/jpeg-bad;
    - 5: a REAL single-frame GIF (the synthesize_gif_media closed
      form, interlaced on odd ``i``);
    - 6: a CORRUPT GIF (signature + deterministic junk — decode_gif
      RAISES), image/gif-bad.

    Exists to put every decode/degrade routing under the hash gate,
    not just under pytest."""
    rows = []
    for i in range(n):
        if i % 7 == 0:
            w, h = 16 + i % 9, 12 + i % 7
            px = bytes((31 * i + 7 * y + 3 * x) % 256
                       for y in range(h) for x in range(w))
            rows.append((i, "image", "image/png", w, h, 0,
                         encode_png(px, w, h)))
        elif i % 7 == 1:
            junk = bytes((i * 31 + j * 7) % 256
                         for j in range(256 + (i % 5) * 64))
            rows.append((i, "image", "image/png-bad", 16, 16, 0,
                         PNG_SIG + junk))
        elif i % 7 == 2:
            blob = bytes((i * 31 + j * 7) % 256
                         for j in range(256 + (i % 5) * 64))
            rows.append((i, "image", "image/fake", 64 + i % 32,
                         48 + i % 32, 0, blob))
        elif i % 7 == 3:
            w, h = _jpeg_fixture_dims(i)
            grey = _jpeg_tile_pixels(i, w, h)
            blob = (encode_jpeg(grey, w, h, 1) if i % 2 == 0 else
                    encode_jpeg(bytes(v for v in grey
                                      for _ in range(3)), w, h, 3))
            rows.append((i, "image", "image/jpeg", w, h, 0, blob))
        elif i % 7 == 4:
            junk = bytes((i * 29 + j * 13) % 256
                         for j in range(256 + (i % 11) * 32))
            rows.append((i, "image", "image/jpeg-bad", 16, 16, 0,
                         JPEG_SOI + junk))
        elif i % 7 == 5:
            w, h = 16 + i % 9, 12 + i % 7
            n_pal = 4 + i % 13
            pal = [((5 * k + 7 * i) % 256, (9 * k + 3 * i) % 256,
                    (11 * k + 4 * i) % 256) for k in range(n_pal)]
            idx = bytes((2 * i + y + 3 * x) % n_pal
                        for y in range(h) for x in range(w))
            rows.append((i, "image", "image/gif", w, h, 0,
                         encode_gif(idx, pal, w, h,
                                    interlace=bool(i % 2))))
        else:
            junk = bytes((i * 17 + j * 11) % 256
                         for j in range(256 + (i % 5) * 32))
            rows.append((i, "image", "image/gif-bad", 16, 16, 0,
                         b"GIF89a" + junk))
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
                w, h, ch, px = decode_image_any(content)
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
                        f"media_id={rec.media_id}: not a PNG/JPEG "
                        "payload — image_decode_features requires real "
                        "decodable images")
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

def decode_image_any(content: bytes):
    """Signature-routed real decode -> (w, h, channels, pixel bytes):
    PNG via :func:`decode_png`, baseline JPEG via :func:`decode_jpeg`,
    GIF via :func:`decode_gif`. ValueError on anything else (the
    per-row degrade contract)."""
    if content[:8] == PNG_SIG:
        return decode_png(content)
    if content[:2] == JPEG_SOI:
        return decode_jpeg(content)
    if content[:4] == b"GIF8":
        return decode_gif(content)
    raise ValueError("unknown image signature (PNG, baseline JPEG and "
                     "GIF decode for real; other codecs are the "
                     "documented byte-proxy seam)")


def _decode_image(content: bytes, width: int, height: int):
    """PNG, baseline-JPEG and GIF payloads decode for REAL
    (``decode_png`` / ``decode_jpeg`` / ``decode_gif`` — stdlib +
    numpy, no PIL): luma is computed from actual pixel values (RGB via
    the integer Rec.601 weights). Other payloads keep the
    deterministic byte-mean fake — the documented seam where
    production swaps in PIL/ffmpeg for further codecs."""
    if content is None:
        raise NotImplementedError("image decode of NULL content")
    if (content[:8] == PNG_SIG or content[:2] == JPEG_SOI
            or content[:4] == b"GIF8"):
        w, h, ch, px = decode_image_any(content)
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


# --------------------------------------------------------- JPEG codec
# Pure-stdlib-plus-numpy BASELINE JPEG (ITU-T T.81, sequential DCT,
# SOF0): 8-bit precision, single-component (greyscale) or 3-component
# 4:4:4 YCbCr, standard Annex K luminance Huffman tables, optional
# restart intervals on decode. Everything else of T.81 — progressive
# (SOF2), arithmetic coding, 12-bit, chroma subsampling — raises
# ValueError (the per-row degrade contract routes those rows to the
# byte-mean proxy, hash-gated by media_decode_fallback_audit).
#
# The encoder exists so fixtures are self-contained (as encode_png is
# for PNG): with all-ones quantization tables and per-8x8-FLAT tiles
# the DCT carries only an integer DC coefficient, so the full
# Huffman -> dequant -> IDCT -> (YCbCr) pipeline round-trips
# BYTE-EXACTLY to a closed form a SQL oracle re-derives — lossless by
# construction, so the hash gate can certify a lossy codec.

#: T.81 Figure A.6 zig-zag: k-th coefficient -> row-major block index
JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: T.81 Annex K.3.1 luminance Huffman table specs (BITS, HUFFVAL)
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

JPEG_SOI = b"\xff\xd8"


def _huff_codes(bits, vals):
    """Canonical Huffman codes (T.81 C.2): symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_matrix():
    import math

    import numpy as np
    m = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.n = 0, 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:            # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


def _mag_bits(v: int):
    """(size category, appended bits) for a DC diff / AC value —
    T.81 F.1.2.1: negatives encode as v - 1 in `size` low bits."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _encode_block(bw, coefs, dc_pred, dc_codes, ac_codes):
    """One 8x8 block of quantized coefficients (row-major) -> entropy
    stream. Returns the new DC predictor."""
    dc = int(coefs[0])
    size, extra = _mag_bits(dc - dc_pred)
    c, ln = dc_codes[size]
    bw.write(c, ln)
    if size:
        bw.write(extra, size)
    run = 0
    for k in range(1, 64):
        v = int(coefs[JPEG_ZIGZAG[k]])
        if v == 0:
            run += 1
            continue
        while run > 15:                       # ZRL
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            run -= 16
        size, extra = _mag_bits(v)
        c, ln = ac_codes[(run << 4) | size]
        bw.write(c, ln)
        bw.write(extra, size)
        run = 0
    if run:                                   # EOB
        c, ln = ac_codes[0x00]
        bw.write(c, ln)
    return dc


def encode_jpeg(pixels: bytes, width: int, height: int,
                channels: int = 1, restart_interval: int = 0) -> bytes:
    """Baseline SOF0 encoder: 8-bit grey (1 channel, row-major) or RGB
    (3 channels interleaved, converted to 4:4:4 YCbCr). Quantization
    tables are ALL ONES — maximal fidelity, and the property the
    fixtures lean on: a per-8x8-flat image round-trips exactly.
    Edges pad by replication to 8x8 multiples. ``restart_interval``
    > 0 emits a DRI segment and RSTn markers every that-many MCUs
    (with DC predictor resets) — the resync structure real encoders
    write, here so the decoder's restart path is testable."""
    import numpy as np

    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    arr = np.frombuffer(bytes(pixels), dtype=np.uint8) \
            .reshape(height, width, channels).astype(np.float64)
    if channels == 3:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        comps = [0.299 * r + 0.587 * g + 0.114 * b,
                 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b]
    elif channels == 1:
        comps = [arr[:, :, 0]]
    else:
        raise ValueError("channels must be 1 or 3")

    bw8, bh8 = -(-width // 8), -(-height // 8)
    m = _dct_matrix()
    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _BitWriter()
    preds = [0] * len(comps)
    padded = []
    for comp in comps:
        p = np.empty((bh8 * 8, bw8 * 8))
        p[:height, :width] = comp
        p[height:, :width] = comp[-1:, :]          # replicate bottom edge
        p[:, width:] = p[:, width - 1:width]       # replicate right edge
        padded.append(p)
    scan_parts = []
    n_mcu, rst = 0, 0
    for by in range(bh8):
        for bx in range(bw8):                      # MCU = 1 block/comp
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                scan_parts.append(bw.flush())
                scan_parts.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                bw = _BitWriter()
                preds = [0] * len(comps)
            n_mcu += 1
            for ci, p in enumerate(padded):
                blk = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coefs = np.rint(m @ blk @ m.T).astype(np.int64)
                preds[ci] = _encode_block(bw, coefs.ravel(), preds[ci],
                                          dc_codes, ac_codes)
    scan_parts.append(bw.flush())
    scan = b"".join(scan_parts)

    def seg(marker, payload):
        return marker + struct.pack(">H", len(payload) + 2) + payload

    dqt = seg(b"\xff\xdb", b"\x00" + bytes([1] * 64))
    nc = len(comps)
    sof = seg(b"\xff\xc0", struct.pack(">BHHB", 8, height, width, nc)
              + b"".join(struct.pack(">BBB", i + 1, 0x11, 0)
                         for i in range(nc)))
    dht = seg(b"\xff\xc4",
              b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
              + b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    sos = seg(b"\xff\xda", bytes([nc])
              + b"".join(struct.pack(">BB", i + 1, 0x00)
                         for i in range(nc))
              + b"\x00\x3f\x00")
    dri = (seg(b"\xff\xdd", struct.pack(">H", restart_interval))
           if restart_interval else b"")
    return JPEG_SOI + dqt + sof + dri + dht + sos + scan + b"\xff\xd9"


class _BitReader:
    """Entropy-segment bit reader: MSB-first, un-stuffs 0xFF00, stops
    at (and exposes) real markers."""

    def __init__(self, data: bytes, pos: int):
        self.d, self.pos = data, pos
        self.acc, self.n = 0, 0
        self.marker = None

    def _fill(self) -> bool:
        if self.pos >= len(self.d):
            return False
        b = self.d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.d):
                return False
            nxt = self.d[self.pos + 1]
            if nxt == 0x00:                    # stuffed data byte
                self.pos += 2
            else:                              # a real marker: stop
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8
        return True

    def bit(self) -> int:
        if self.n == 0 and not self._fill():
            raise ValueError("truncated JPEG entropy stream")
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self):
        """Byte-align and consume an expected RST marker; returns it."""
        self.acc, self.n = 0, 0
        if self.pos + 1 < len(self.d) and self.d[self.pos] == 0xFF:
            mk = self.d[self.pos + 1]
            self.pos += 2
            self.marker = None
            return mk
        raise ValueError("expected restart marker")


def _huff_decode(br, table):
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: received bits -> signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(content: bytes):
    """Baseline SOF0 decoder -> (width, height, channels, pixel bytes)
    (grey: 1 byte/px; color: RGB interleaved), mirroring decode_png's
    contract. Supports 8-bit sequential, 1 or 3 components WITHOUT
    chroma subsampling, per-file Huffman + quantization tables,
    restart intervals. Raises ValueError (never a raw struct/index
    error) on anything else: progressive/arithmetic/12-bit/subsampled
    streams, truncation, bad markers, invalid codes."""
    import numpy as np

    if content[:2] != JPEG_SOI:
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtabs, htabs = {}, {}
    frame = None
    dri = 0
    while True:
        if pos + 4 > len(content):
            raise ValueError("truncated JPEG (no SOS)")
        if content[pos] != 0xFF:
            raise ValueError("bad JPEG marker structure")
        mk = content[pos + 1]
        pos += 2
        if mk == 0xD8:
            continue
        if mk in (0xD9,):
            raise ValueError("JPEG ended before scan")
        (ln,) = struct.unpack(">H", content[pos:pos + 2])
        if pos + ln > len(content):
            raise ValueError("truncated JPEG segment")
        body = content[pos + 2:pos + ln]
        pos += ln
        if mk == 0xDB:                                     # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                if i + 65 > len(body):
                    raise ValueError("truncated DQT")
                qtabs[tq] = list(body[i + 1:i + 65])
                i += 65
        elif mk == 0xC4:                                   # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                if len(vals) < nv:
                    raise ValueError("truncated DHT")
                codes = _huff_codes(bits, vals)
                htabs[(tc, th)] = {(l, c): sym
                                   for sym, (c, l) in codes.items()}
                i += 17 + nv
        elif mk == 0xC0 or mk == 0xC1:                     # SOF0/1
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            if nc not in (1, 3):
                raise ValueError("only 1- or 3-component JPEG")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                if hv != 0x11:
                    raise ValueError("chroma subsampling unsupported "
                                     "(4:4:4 only)")
                comps.append((cid, tq))
            frame = (w, h, comps)
        elif mk in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                    0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic)")
        elif mk == 0xDD:                                   # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif mk == 0xDA:                                   # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if ns != len(frame[2]):
                raise ValueError("partial scans unsupported")
            sel = {}
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                sel[cs] = (tt >> 4, tt & 0xF)
            break
        # APPn/COM/others: skipped
    w, h, comps = frame
    bw8, bh8 = -(-w // 8), -(-h // 8)
    m = _dct_matrix()
    br = _BitReader(content, pos)
    preds = {cid: 0 for cid, _ in comps}
    planes = {cid: np.zeros((bh8 * 8, bw8 * 8)) for cid, _ in comps}
    zz = np.array(JPEG_ZIGZAG)
    n_mcu = 0
    for by in range(bh8):
        for bx in range(bw8):
            if dri and n_mcu and n_mcu % dri == 0:
                mk = br.align_to_marker()
                if not (0xD0 <= mk <= 0xD7):
                    raise ValueError("expected RSTn marker")
                preds = {cid: 0 for cid, _ in comps}
            n_mcu += 1
            for cid, tq in comps:
                if tq not in qtabs:
                    raise ValueError("missing quant table")
                dc_t, ac_t = sel[cid]
                try:
                    dct = htabs[(0, dc_t)]
                    act = htabs[(1, ac_t)]
                except KeyError:
                    raise ValueError("missing Huffman table") from None
                size = _huff_decode(br, dct)
                diff = _extend(br.bits(size), size)
                preds[cid] += diff
                coefs = np.zeros(64)
                coefs[0] = preds[cid] * qtabs[tq][0]
                k = 1
                while k < 64:
                    sym = _huff_decode(br, act)
                    if sym == 0x00:                        # EOB
                        break
                    if sym == 0xF0:                        # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    k += run
                    if k > 63 or size == 0:
                        raise ValueError("corrupt AC coefficient run")
                    coefs[k] = (_extend(br.bits(size), size)
                                * qtabs[tq][k])
                    k += 1
                blk = np.zeros(64)
                blk[zz] = coefs                            # de-zigzag
                sp = m.T @ blk.reshape(8, 8) @ m + 128.0
                planes[cid][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = sp
    # the scan must END at a marker (EOI; fill 0xFF bytes allowed) —
    # junk entropy data that happens to decode as valid codes almost
    # never lands byte-exactly on FFD9, so this is the integrity check
    # that catches smuggled/corrupt tails (decode_png's unused_data
    # rule, JPEG edition)
    p = br.pos
    while p + 1 < len(content) and content[p] == 0xFF \
            and content[p + 1] == 0xFF:
        p += 1                                     # fill bytes
    if not (p + 1 < len(content) and content[p] == 0xFF
            and content[p + 1] == 0xD9):
        raise ValueError("JPEG scan does not end at EOI")
    nc = len(comps)
    outs = [np.clip(np.rint(planes[cid][:h, :w]), 0, 255)
            for cid, _ in comps]
    if nc == 1:
        return w, h, 1, bytes(outs[0].astype(np.uint8).tobytes())
    y, cb, cr = outs
    r = np.clip(np.rint(y + 1.402 * (cr - 128.0)), 0, 255)
    g = np.clip(np.rint(y - 0.344136 * (cb - 128.0)
                        - 0.714136 * (cr - 128.0)), 0, 255)
    b = np.clip(np.rint(y + 1.772 * (cb - 128.0)), 0, 255)
    rgb = np.stack([r, g, b], axis=-1).astype(np.uint8)
    return w, h, 3, bytes(rgb.tobytes())


# ----------------------------------------------------------- GIF codec

GIF_SIG = b"GIF8"          #: both GIF87a and GIF89a start with this
#: interlace pass structure: (first row, row step) per pass
_GIF_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _lzw_emissions(indices: bytes, min_code_size: int) -> list:
    """Greedy GIF-LZW compression to a CODE sequence (clear-prefixed,
    end-terminated). Dictionary indices mirror the decoder's append
    order exactly (one entry per emission, starting at clear+2); a
    clear code is emitted when the table would outgrow the 12-bit code
    space, resetting both sides in lockstep."""
    clear = 1 << min_code_size
    end = clear + 1
    emissions = [clear]
    dict_ = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    w = b""
    for b in indices:
        wc = w + bytes([b])
        if wc in dict_:
            w = wc
            continue
        emissions.append(dict_[w])
        if next_code < 4096:
            dict_[wc] = next_code
            next_code += 1
        else:
            emissions.append(clear)
            dict_ = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
        w = bytes([b])
    if w:
        emissions.append(dict_[w])
    emissions.append(end)
    return emissions


def _lzw_pack(emissions: list, min_code_size: int) -> bytes:
    """Serialize a code sequence to the GIF LSB-first bitstream,
    replaying the DECODER's width evolution (width grows when its
    table size reaches 2^width, capped at 12 bits; resets on clear) so
    both sides always agree on every code's width."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = npos = 0
    width = min_code_size + 1
    n = clear + 2
    first = True
    for code in emissions:
        acc |= code << npos
        npos += width
        while npos >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            npos -= 8
        if code == clear:
            width, n, first = min_code_size + 1, clear + 2, True
        elif code == end:
            break
        elif first:
            first = False
        else:
            n += 1
            if n == (1 << width) and width < 12:
                width += 1
    if npos:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode_gif(data: bytes, min_code_size: int,
                    expected_len: int) -> bytes:
    """GIF-variant LZW decode (LSB-first variable-width codes, clear /
    end codes, 12-bit cap, KwKwK case). Output is bounded by
    ``expected_len`` so a malicious stream cannot balloon executor
    memory; over- or under-production raises ValueError."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    big = int.from_bytes(data, "little")
    nbits = len(data) * 8
    pos = 0
    width = min_code_size + 1
    table: list = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev = None
    out = bytearray()
    while True:
        if pos + width > nbits:
            raise ValueError("truncated LZW stream (no end code)")
        code = (big >> pos) & ((1 << width) - 1)
        pos += width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("first LZW code is not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]          # the KwKwK case
        else:
            raise ValueError(f"LZW code {code} beyond table")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        out += entry
        if len(out) > expected_len:
            raise ValueError("LZW output exceeds pixel count")
        prev = entry
    if len(out) != expected_len:
        raise ValueError("LZW output short of pixel count")
    return bytes(out)


def encode_gif(indices: bytes, palette: list, width: int, height: int,
               interlace: bool = False) -> bytes:
    """Encode index bytes + an RGB palette as a single-frame GIF89a
    with a global color table (padded to the next power of two ≥ 2)
    and REAL LZW compression — dictionary references and width growth
    included, not a literal-only stream. ``interlace`` writes the four
    GIF interlace passes."""
    n_pal = len(palette)
    if not indices or len(indices) != width * height:
        raise ValueError("indices must be width*height bytes")
    if not 1 <= n_pal <= 256 or max(indices) >= n_pal:
        raise ValueError("palette size / index range")
    gct_bits = max(1, (max(n_pal - 1, 1)).bit_length())
    gct_size = 1 << gct_bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (gct_bits - 1), 0, 0])   # GCT flag + size
    for k in range(gct_size):
        r, g, b = palette[k] if k < n_pal else (0, 0, 0)
        out += bytes([r, g, b])
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
    out += bytes([0x40 if interlace else 0x00])   # no LCT
    if interlace:
        rows = []
        for first, step in _GIF_PASSES:
            rows.extend(range(first, height, step))
        indices = b"".join(indices[y * width:(y + 1) * width]
                           for y in rows)
    min_code = max(2, gct_bits)
    packed = _lzw_pack(_lzw_emissions(indices, min_code), min_code)
    out += bytes([min_code])
    for off in range(0, len(packed), 255):
        chunk = packed[off:off + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(content: bytes):
    """Decode a single-frame GIF (87a/89a, global or local color
    table, interlaced or not) to ``(width, height, 3, rgb_bytes)`` —
    palette indices dereferenced to RGB like palette PNGs, so
    downstream luma/resize treat all color images uniformly. Animated
    GIFs (a second image descriptor), frames not covering the logical
    screen, missing color tables, out-of-range indices, truncation,
    bad LZW streams, and trailing bytes after the trailer all raise
    ValueError (the per-row degrade contract)."""
    if content[:4] != GIF_SIG or content[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF (bad signature)")
    if len(content) < 13:
        raise ValueError("truncated GIF header")
    sw, sh = struct.unpack("<HH", content[6:10])
    packed = content[10]
    pos = 13
    gct = None
    if packed & 0x80:
        size = 3 * (1 << ((packed & 0x07) + 1))
        if pos + size > len(content):
            raise ValueError("truncated global color table")
        gct = content[pos:pos + size]
        pos += size
    frame = None

    def _subblocks(p: int):
        chunks = bytearray()
        while True:
            if p >= len(content):
                raise ValueError("truncated sub-block chain")
            ln = content[p]
            p += 1
            if ln == 0:
                return bytes(chunks), p
            if p + ln > len(content):
                raise ValueError("truncated sub-block")
            chunks += content[p:p + ln]
            p += ln

    while True:
        if pos >= len(content):
            raise ValueError("truncated GIF (missing trailer)")
        block = content[pos]
        pos += 1
        if block == 0x3B:                       # trailer
            break
        if block == 0x21:                       # extension: skip
            if pos >= len(content):
                raise ValueError("truncated extension")
            pos += 1                            # label
            _, pos = _subblocks(pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if frame is not None:
            raise ValueError("animated GIF (multiple frames)")
        if pos + 9 > len(content):
            raise ValueError("truncated image descriptor")
        left, top, w, h = struct.unpack("<HHHH", content[pos:pos + 8])
        ipacked = content[pos + 8]
        pos += 9
        if (left, top, w, h) != (0, 0, sw, sh):
            raise ValueError("frame does not cover the logical screen")
        table = gct
        if ipacked & 0x80:
            size = 3 * (1 << ((ipacked & 0x07) + 1))
            if pos + size > len(content):
                raise ValueError("truncated local color table")
            table = content[pos:pos + size]
            pos += size
        if table is None:
            raise ValueError("no color table")
        if pos >= len(content):
            raise ValueError("truncated before LZW min code size")
        min_code = content[pos]
        data, pos = _subblocks(pos + 1)
        idx = _lzw_decode_gif(data, min_code, w * h)
        if ipacked & 0x40:                      # deinterlace
            rows = []
            for first, step in _GIF_PASSES:
                rows.extend(range(first, h, step))
            ordered = bytearray(w * h)
            for src_y, dst_y in enumerate(rows):
                ordered[dst_y * w:(dst_y + 1) * w] = \
                    idx[src_y * w:(src_y + 1) * w]
            idx = bytes(ordered)
        frame = (w, h, idx, table)
    if frame is None:
        raise ValueError("GIF with no image data")
    if pos != len(content):
        raise ValueError("trailing bytes after GIF trailer")
    w, h, idx, table = frame
    n_pal = len(table) // 3
    rgb = bytearray(len(idx) * 3)
    for k, i in enumerate(idx):
        if i >= n_pal:
            raise ValueError("color index out of range")
        rgb[3 * k:3 * k + 3] = table[3 * i:3 * i + 3]
    return w, h, 3, bytes(rgb)


def synthesize_gif_media(spark, n: int = 48) -> DataFrame:
    """Deterministic REAL-GIF media table: image ``i`` is a
    ``(16 + i%9) × (12 + i%7)`` single-frame GIF with ``4 + i%13``
    palette entries where entry ``k`` is ``((5k+7i) % 256,
    (9k+3i) % 256, (11k+4i) % 256)`` and the index of pixel ``(x, y)``
    is ``(2i + y + 3x) mod n_pal`` — closed forms an oracle re-derives
    per pixel without any decoder. Odd rows are INTERLACED (the four
    GIF passes), and the small palettes start LZW at 3–4 bit codes so
    the variable code width actually grows mid-stream. One source
    partition (see synthesize_media's rationale)."""
    rows = []
    for i in range(n):
        w, h = 16 + i % 9, 12 + i % 7
        n_pal = 4 + i % 13
        pal = [((5 * k + 7 * i) % 256, (9 * k + 3 * i) % 256,
                (11 * k + 4 * i) % 256) for k in range(n_pal)]
        idx = bytes((2 * i + y + 3 * x) % n_pal
                    for y in range(h) for x in range(w))
        rows.append((i, "image", "image/gif", w, h, 0,
                     encode_gif(idx, pal, w, h, interlace=bool(i % 2))))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), MEDIA_SCHEMA)
