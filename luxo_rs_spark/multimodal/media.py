"""Multimodal columns at scale (SURVEY.md §2.2-K): image/audio/video as
opaque BINARY columns + typed metadata, processed via mapInPandas.

The Spark-side plumbing is real and tested: schema, Arrow batch shapes,
partition-parallel mapInPandas, feature-column production. Decode is
GENUINE for four containers that need no codec library — uncompressed
BMP images, PNG images (stdlib zlib inflate + full five-filter
reconstruction), baseline JPEG (pure-Python Huffman + DCT, Annex-K
tables, encoder AND decoder), and PCM RIFF/WAVE audio, parsed from
real bytes with pure struct/bytes code — and deterministically FAKED
for formats whose decoders require external libraries
(MP3/MP4 need libraries absent in this container): those media
bytes carry a 16-byte LUXM header (kind, width, height, sample_rate)
that ``decode_media`` parses, and "features" are a seeded
hash-projection of the payload. Swapping in Pillow/ffmpeg changes ONE
dispatch function (`_decode_payload`) — the distributed plumbing
(schema, batching, partitioning) is identical.

Scale notes (100 TB of media): BINARY columns ride Parquet like any
other column; mapInPandas streams Arrow record batches through the
Python worker so peak memory is one batch, not one partition — set
``spark.sql.execution.arrow.maxRecordsPerBatch`` to bound batch bytes
for large blobs. Decode is map-side only: no shuffle enters the
pipeline until a downstream agg/join, so media pipelines scale linearly
with executors.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: magic prefix of the deterministic fake media container
_MAGIC = b"LUXM"
_HEADER_FMT = "<4sBxHHI"  # magic, kind, width, height, sample_rate
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)

_KINDS = {0: "image", 1: "audio", 2: "video"}
_KIND_IDS = {v: k for k, v in _KINDS.items()}

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, sample_rate int, "
    "payload_bytes long, checksum long"
)

FEATURE_DIM = 16
FEATURES_SCHEMA = f"media_id long, kind string, features array<float>"

FRAMES_SCHEMA = "media_id long, frame_idx int, frame_offset long, frame_bytes long"


def spread_docs(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Hash-repartition a synth input to total-core parallelism before a
    HEAVY Python encode/decode lane (optimization guide §2.5: the
    documents fixture is a SINGLE parquet row group, so its scan is one
    task and the whole synth+decode pipeline would otherwise serialize
    on one core — measured 3.98 s -> 1.52 s for q454 at sf0.1/local[32]).
    Keyed on ``key`` so the row->partition assignment is deterministic
    under task retry (guide §2.5's SPARK-38388 note); defaultParallelism
    tracks the cluster, not a constant, so the shape is scale-adaptive.

    Deliberately OPT-IN per call site, not baked into every synth: a
    32-task Python stage has a measured ~0.35-0.40 s flat wall cost at
    local[32] (worker attach + Arrow channel per task — an identity
    mapInPandas over 32 partitions costs that with zero compute), so
    spreading only pays where the single-task Python compute exceeds
    ~1 s (video/FLAC/arith-JPEG/hier-DCT/JPEG-in-TIFF/WebP-anim lanes).
    Applying it inside the synths regressed the light lanes — q478
    unions NINE synth outputs over tiny doc slices and went 0.80 ->
    4.10 s. A finer split is also worse for the heavy lanes themselves
    (q454 at 128 partitions: 5.0 s — per-task overhead dominates), so
    total cores is the right grain.

    Guarded on the CURRENT partition count, so an input that already
    has scan parallelism (the 100 TB case: thousands of splits) never
    pays a pointless extra shuffle. Round 11: delegates to the shared
    ``functions.spread.spread`` helper (same guard, same key)."""
    from luxo_rs_spark.functions.spread import spread

    return spread(docs, key)


def synth_media_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media derived from the documents fixture: the
    doc text bytes become the payload behind a LUXM header. Exercises
    BINARY columns + STRUCT metadata end-to-end without codec libs."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                payload = (text or "").encode("utf-8")
                kind_id = int(doc_id) % 3
                w, h = (int(doc_id) % 64 + 1) * 16, (int(doc_id) % 48 + 1) * 16
                sr = 8000 * (int(doc_id) % 4 + 1)
                header = struct.pack(_HEADER_FMT, _MAGIC, kind_id, w, h, sr)
                rows.append(
                    {
                        "media_id": int(doc_id),
                        "kind": _KINDS[kind_id],
                        "content": header + payload,
                        "meta": {
                            "width": w,
                            "height": h,
                            "sample_rate": sr,
                            "n_bytes": len(payload),
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_bmp(content: bytes) -> dict:
    """GENUINE decoder: uncompressed 24/32-bit BMP (BITMAPINFOHEADER),
    pure struct/bytes — no codec library. Payload is the raw pixel
    array (rows bottom-up, 4-byte-aligned stride, per the format spec).
    """
    if len(content) < 54:
        raise ValueError("BMP truncated: header needs 54 bytes")
    pixel_offset, = struct.unpack_from("<I", content, 10)
    dib_size, width, height = struct.unpack_from("<Iii", content, 14)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression, = struct.unpack_from("<I", content, 30)
    if dib_size < 40 or compression != 0:
        raise NotImplementedError(
            "only uncompressed BITMAPINFOHEADER BMPs are supported"
        )
    if bpp not in (24, 32):
        raise NotImplementedError(f"unsupported BMP bit depth: {bpp}")
    stride = (width * (bpp // 8) + 3) & ~3
    n_pixel_bytes = stride * abs(height)
    payload = content[pixel_offset : pixel_offset + n_pixel_bytes]
    if len(payload) < n_pixel_bytes:
        raise ValueError("BMP truncated: pixel array shorter than header claims")
    return {
        "kind": "image",
        "width": width,
        "height": abs(height),
        "sample_rate": 0,
        "payload": payload,
    }


#: Adam7 pass grid: (x0, y0, dx, dy) per pass, PNG spec §8.2
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(
    raw: bytes, offset: int, h: int, w: int, channels: int
) -> "np.ndarray":
    """Invert the five PNG scanline filters (None / Sub / Up / Average
    / Paeth, spec §9) over ``h`` rows of ``w`` pixels starting at
    ``offset``; filter state (the prior row) is LOCAL to the call —
    each Adam7 pass is an independent reduced image."""
    stride = w * channels
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(h):
        ftype = raw[offset + y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=offset + y * (stride + 1) + 1,
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub: add left neighbor
            cur = line
            for x in range(bpp, stride):
                cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
        elif ftype == 2:  # Up: add prior row
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average of left and up
            cur = line
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth predictor
            cur = line
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out


def _decode_png(content: bytes) -> dict:
    """GENUINE decoder: PNG via stdlib ``zlib`` — no codec library.
    Parses the chunk stream (IHDR geometry, concatenated IDAT deflate
    stream), inflates, and inverts all five scanline filters (None /
    Sub / Up / Average / Paeth, PNG spec §9) — per reduced image for
    Adam7 INTERLACED streams (spec §8.2, round 7: seven passes, each
    independently filtered, scattered back on the pass grid; empty
    passes contribute zero bytes). Supports the 8-bit color types real
    encoders emit: greyscale (0), RGB (2), grey+alpha (4), RGBA (6).
    Payload is the raw top-down pixel array (width * channels bytes
    per row)."""
    import zlib

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(content):
        size, cid = struct.unpack_from(">I4s", content, pos)
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif cid == b"IDAT":
            idat.append(body)
        elif cid == b"IEND":
            break
        pos += 12 + size  # length + type + body + CRC
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    width, height, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8:
        raise NotImplementedError("only 8-bit PNGs are supported")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise NotImplementedError(f"unsupported PNG color type {color_type}")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if interlace == 0:
        if len(raw) != height * (stride + 1):
            raise ValueError("PNG pixel data length mismatch")
        out = _png_unfilter(raw, 0, height, width, channels)
    else:
        out = np.zeros((height, width, channels), dtype=np.uint8)
        ofs = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = -(-(width - x0) // dx) if width > x0 else 0
            ph = -(-(height - y0) // dy) if height > y0 else 0
            if pw <= 0 or ph <= 0:
                continue
            sub = _png_unfilter(raw, ofs, ph, pw, channels)
            ofs += ph * (pw * channels + 1)
            out[y0::dy, x0::dx] = sub.reshape(ph, pw, channels)
        if ofs != len(raw):
            raise ValueError("PNG interlaced data length mismatch")
        out = out.reshape(height, stride)
    return {
        "kind": "image",
        "width": width,
        "height": height,
        "sample_rate": 0,
        "payload": out.tobytes(),
    }


def _pixels_to_png(arr: "np.ndarray", interlace: bool = False) -> bytes:
    """Minimal PNG encoder (stdlib zlib, filter type 0 per row) for
    (h, w, channels) uint8 arrays — lets sinks and tests produce real
    PNG bytes without any imaging library. ``interlace=True`` emits
    the Adam7 layout (round 7): the seven reduced images concatenated
    pass-major, each row carrying its own filter byte."""
    import zlib

    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + cid
            + body
            + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", w, h, 8, color_type, 0, 0, 1 if interlace else 0
    )
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.extend(
                b"\x00" + sub[y].tobytes() for y in range(sub.shape[0])
            )
        raw = b"".join(parts)
    else:
        raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81): genuine pure-Python encode + decode.
#
# Round-2 verdict item #4: a real multimodal corpus is JPEG-heavy, so
# the dispatch seam gets a GENUINE baseline sequential DCT codec —
# stdlib struct/bytes + numpy only, no codec library. Scope (raises
# NotImplementedError outside it, like the other decoders):
#   - baseline DCT (SOF0), 8-bit samples, Huffman entropy coding
#   - grayscale or YCbCr 4:4:4 (all sampling factors 1x1) — the shape
#     our encoder emits; subsampled/progressive real-world files raise
#   - restart markers (DRI/RSTn) are honored
# Tables are the JPEG Annex K defaults (quant scaled by the standard
# IJG quality curve; Huffman tables K.3.1/K.3.2). The decoder is
# validated against a hand-assembled spec vector (all-grey 8x8 — DC
# category 0 + EOB under the Annex K code books) so encoder and
# decoder cannot hide a mirrored bug, plus quantization-bounded
# round-trip tests (tests/test_sources_multimodal.py).
# ---------------------------------------------------------------------------

#: zigzag scan order (T.81 Figure A.6): _ZIGZAG[i] = block index of the
#: i-th coefficient in scan order
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: Annex K.1/K.2 reference quantization tables (natural order)
_QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QUANT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

#: Annex K.3 default Huffman specs: (BITS[1..16], HUFFVAL)
_HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HUFF_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix D: coeffs = D @ block @ D.T."""
    d = np.zeros((8, 8))
    for i in range(8):
        scale = np.sqrt(0.125) if i == 0 else 0.5
        for j in range(8):
            d[i, j] = scale * np.cos((2 * j + 1) * i * np.pi / 16.0)
    return d


_DCT = _dct_matrix()


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(
    bits: list[int], vals: list[int]
) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, inverse of :func:`_huff_codes`."""
    return {
        (length, code): sym
        for sym, (code, length) in _huff_codes(bits, vals).items()
    }


def _quality_scaled(table: np.ndarray, quality: int) -> np.ndarray:
    """Standard IJG quality scaling of an Annex K table."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    cat = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _encode_component_block(
    writer: _BitWriter,
    coeffs_zz: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    dc = int(coeffs_zz[0])
    cat, bits = _magnitude(dc - pred)
    code, length = dc_codes[cat]
    writer.write(code, length)
    if cat:
        writer.write(bits, cat)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if coeffs_zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(coeffs_zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        cat, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | cat]
        writer.write(code, length)
        writer.write(bits, cat)
        run = 0
    if last_nz != 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return dc


# 12-bit (extended sequential, SOF1) Huffman books: Annex K's books
# only cover 8-bit category ranges, so the 12-bit path ships its own
# canonical books — DC difference categories 0..15 (15 five-bit codes +
# one six-bit), AC (run,size) for size 1..14 plus EOB/ZRL, all at eight
# bits (226 symbols; max canonical code 225 < 255, so no all-ones code).
_HUFF_DC_12 = (
    [0, 0, 0, 0, 15, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    list(range(16)),
)
_AC12_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 15)
]
_HUFF_AC_12 = (
    [0, 0, 0, 0, 0, 0, 0, len(_AC12_VALS), 0, 0, 0, 0, 0, 0, 0, 0],
    _AC12_VALS,
)


def _pixels_to_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
    precision: int = 8,
    entropy: str = "huffman",
) -> bytes:
    """Minimal GENUINE JPEG encoder for (h, w, 1|3) uint8 arrays:
    level shift, 8x8 orthonormal DCT, Annex-K quant tables at the IJG
    quality curve, default Huffman books, JFIF wrapper.

    - ``subsampling``: "444" or "420" (box-averaged half-res chroma,
      4 Y + Cb + Cr blocks per MCU).
    - ``restart_interval`` > 0 emits DRI + byte-aligned RSTn markers
      with predictor resets (T.81 E.1.4) in every scan.
    - ``progressive`` emits an SOF2 stream (T.81 G.1.2): interleaved
      DC first scan at Al=1, DC refinement (raw bits), per-component
      AC spectral-selection first scans at Al=1 (bands 1-5 and 6-63),
      and per-component AC successive-approximation refinement scans
      (Ah=1, Al=0) with buffered correction bits — the web's default
      JPEG progression shape. EOB runs are never accumulated across
      blocks (plain per-block EOB is legal and keeps the Annex K books
      sufficient); the decoder still handles general EOB runs.

    ``entropy="arith"`` swaps the entropy coder for the T.81 Annex D
    QM arithmetic coder (SOF9, or SOF10 when progressive) with DAC
    conditioning defaults — the QUANTIZED COEFFICIENTS are identical
    to the Huffman stream's, which is what the cross-coder
    bit-identity tests assert.

    Output decodes in any JPEG decoder."""
    h, w, ch = arr.shape
    if ch not in (1, 3):
        raise NotImplementedError("JPEG encoder: 1 or 3 channels only")
    if subsampling not in ("444", "420"):
        raise NotImplementedError("JPEG encoder: 444 or 420 only")
    if precision not in (8, 12):
        raise NotImplementedError("JPEG encoder: 8- or 12-bit precision")
    if entropy not in ("huffman", "arith"):
        raise NotImplementedError("JPEG encoder: huffman or arith entropy")
    half = float(1 << (precision - 1))
    if ch == 3:  # JFIF RGB -> YCbCr (BT.601)
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = half - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = half + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        planes = [y, cb, cr]
        sampling = (
            [(2, 2), (1, 1), (1, 1)] if subsampling == "420" else [(1, 1)] * 3
        )
    else:
        planes = [arr[..., 0].astype(np.float64)]
        sampling = [(1, 1)]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    q_lum = _quality_scaled(_QUANT_LUM, quality)
    q_chr = _quality_scaled(_QUANT_CHR, quality)
    if precision == 12:
        # scale the 8-bit Annex K tables by 16 (the sample range grew
        # 16x); entries then exceed 255, which is what DQT Pq=1 is for
        q_lum = np.clip(q_lum * 16, 1, 65535)
        q_chr = np.clip(q_chr * 16, 1, 65535)
    qtabs = [q_lum] + ([q_chr, q_chr] if ch == 3 else [])

    # bring each component to its own resolution (box-average the
    # subsampled chroma), pad to its MCU multiple, and quantize every
    # 8x8 block up front into a zigzag coefficient store — baseline
    # emits it as one scan, progressive re-walks it per band/precision
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    qblocks: list[np.ndarray] = []
    for ci, ((hi, vi), p) in enumerate(zip(sampling, planes)):
        fy, fx = vmax // vi, hmax // hi
        if (fy, fx) != (1, 1):
            ph_, pw_ = -(-h // fy) * fy, -(-w // fx) * fx
            p = np.pad(p, ((0, ph_ - h), (0, pw_ - w)), mode="edge")
            p = p.reshape(ph_ // fy, fy, pw_ // fx, fx).mean(axis=(1, 3))
        th_, tw_ = mcuy * vi * 8, mcux * hi * 8
        p = np.pad(
            p, ((0, th_ - p.shape[0]), (0, tw_ - p.shape[1])), mode="edge"
        )
        nbh, nbw = th_ // 8, tw_ // 8
        store = np.zeros((nbh, nbw, 64), dtype=np.int64)
        for by in range(nbh):
            for bx in range(nbw):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - half
                coeffs = _DCT @ block @ _DCT.T
                quant = np.round(
                    coeffs / qtabs[ci].reshape(8, 8)
                ).astype(np.int64)
                store[by, bx] = quant.reshape(64)[_ZIGZAG]
        qblocks.append(store)

    if precision == 12:
        dc_lum = dc_chr = _huff_codes(*_HUFF_DC_12)
        ac_lum = ac_chr = _huff_codes(*_HUFF_AC_12)
    else:
        dc_lum = _huff_codes(*_HUFF_DC_LUM)
        ac_lum = _huff_codes(*_HUFF_AC_LUM)
        dc_chr = _huff_codes(*_HUFF_DC_CHR)
        ac_chr = _huff_codes(*_HUFF_AC_CHR)
    books = [(dc_lum, ac_lum)] + (
        [(dc_chr, ac_chr), (dc_chr, ac_chr)] if ch == 3 else []
    )

    def rst_marker(scan: bytearray, writer: _BitWriter, rst: int) -> _BitWriter:
        scan += writer.flush()
        scan += bytes([0xFF, 0xD0 + (rst % 8)])
        return _BitWriter()

    scans: list[tuple[bytes, bytes]] = []  # (sos_header_body, entropy)

    def sos_body(members: list[int], ss2: int, se2: int, ah2: int, al2: int) -> bytes:
        b = bytes([len(members)])
        for ci in members:
            td_ta = 0x00 if ci == 0 else 0x11
            b += bytes([ci + 1, td_ta])
        return b + bytes([ss2, se2, (ah2 << 4) | al2])

    if entropy == "arith":
        scans = _arith_scans(
            qblocks, sampling, mcuy, mcux, restart_interval,
            progressive, sos_body, h, w, hmax, vmax,
        )
    elif not progressive:
        scan = bytearray()
        writer = _BitWriter()
        preds = [0] * len(planes)
        mcu = rst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    writer = rst_marker(scan, writer, rst)
                    rst += 1
                    preds = [0] * len(planes)
                for ci, (hi, vi) in enumerate(sampling):
                    for by in range(vi):
                        for bx in range(hi):
                            zz = qblocks[ci][my * vi + by, mx * hi + bx]
                            preds[ci] = _encode_component_block(
                                writer, zz, preds[ci],
                                books[ci][0], books[ci][1],
                            )
                mcu += 1
        scan += writer.flush()
        scans.append((sos_body(list(range(ch)), 0, 63, 0, 0), bytes(scan)))
    else:
        scans = _progressive_scans(
            qblocks, sampling, books, mcuy, mcux, restart_interval,
            sos_body, rst_marker, h, w, hmax, vmax,
        )

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    def dqt(tq: int, q: np.ndarray) -> bytes:
        if precision == 12:  # Pq=1: 16-bit big-endian entries
            return seg(
                0xFFDB,
                bytes([0x10 | tq])
                + q[_ZIGZAG].astype(">u2").tobytes(),
            )
        return seg(0xFFDB, bytes([tq]) + bytes(q[_ZIGZAG].astype(np.uint8)))

    out += dqt(0, q_lum)
    if ch == 3:
        out += dqt(1, q_chr)
    comps = b"".join(
        struct.pack(
            "BBB",
            cid + 1,
            (sampling[cid][0] << 4) | sampling[cid][1],
            0 if cid == 0 else 1,
        )
        for cid in range(ch)
    )
    if entropy == "arith":
        sof_marker = 0xFFCA if progressive else 0xFFC9
    else:
        sof_marker = (
            0xFFC2 if progressive else (0xFFC1 if precision == 12 else 0xFFC0)
        )
    out += seg(sof_marker, struct.pack(">BHHB", precision, h, w, ch) + comps)
    if entropy == "arith":  # DAC: declare the conditioning explicitly
        dac = [
            (0x00, (_ARITH_DC_U << 4) | _ARITH_DC_L),
            (0x10, _ARITH_AC_KX),
        ] + ([(0x01, (_ARITH_DC_U << 4) | _ARITH_DC_L),
              (0x11, _ARITH_AC_KX)] if ch == 3 else [])
        out += seg(0xFFCC, bytes(b for pair in dac for b in pair))
    elif precision == 12:
        dht_books = [(0x00, _HUFF_DC_12), (0x10, _HUFF_AC_12)] + (
            [(0x01, _HUFF_DC_12), (0x11, _HUFF_AC_12)] if ch == 3 else []
        )
        for tc_th, (bits, vals) in dht_books:
            out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    else:
        dht_books = [(0x00, _HUFF_DC_LUM), (0x10, _HUFF_AC_LUM)] + (
            [(0x01, _HUFF_DC_CHR), (0x11, _HUFF_AC_CHR)] if ch == 3 else []
        )
        for tc_th, (bits, vals) in dht_books:
            out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    for sos, entropy in scans:
        out += seg(0xFFDA, sos)
        out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _progressive_scans(
    qblocks, sampling, books, mcuy, mcux, restart_interval,
    sos_body, rst_marker, h, w, hmax, vmax, differential=False,
):
    """Emit the T.81 G.1.2 progressive scan sequence over the quantized
    coefficient store: DC first (Al=1, interleaved) -> DC refinement ->
    per-component AC bands 1-5 / 6-63 at Al=1 -> per-component AC
    refinement (Ah=1, Al=0) with buffered correction bits. With
    `differential` (SOF6, Annex J) the DC first scan codes each block's
    value against a ZERO prediction."""
    nch = len(sampling)
    scans: list[tuple[bytes, bytes]] = []

    # --- DC first scan: interleaved, point transform >> 1 ----------------
    scan = bytearray()
    writer = _BitWriter()
    preds = [0] * nch
    mcu = rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer = rst_marker(scan, writer, rst)
                rst += 1
                preds = [0] * nch
            for ci, (hi, vi) in enumerate(sampling):
                for by in range(vi):
                    for bx in range(hi):
                        dc = int(qblocks[ci][my * vi + by, mx * hi + bx][0]) >> 1
                        base = 0 if differential else preds[ci]
                        cat, bits_v = _magnitude(dc - base)
                        code, length = books[ci][0][cat]
                        writer.write(code, length)
                        if cat:
                            writer.write(bits_v, cat)
                        preds[ci] = dc
            mcu += 1
    scan += writer.flush()
    scans.append((sos_body(list(range(nch)), 0, 0, 0, 1), bytes(scan)))

    # --- DC refinement scan: raw low bits, no Huffman --------------------
    scan = bytearray()
    writer = _BitWriter()
    mcu = rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer = rst_marker(scan, writer, rst)
                rst += 1
            for ci, (hi, vi) in enumerate(sampling):
                for by in range(vi):
                    for bx in range(hi):
                        writer.write(
                            int(qblocks[ci][my * vi + by, mx * hi + bx][0]) & 1,
                            1,
                        )
            mcu += 1
    scan += writer.flush()
    scans.append((sos_body(list(range(nch)), 0, 0, 1, 0), bytes(scan)))

    # per-component block rasters (non-interleaved scan geometry)
    def comp_blocks(ci):
        hi, vi = sampling[ci]
        cw = -(-w * hi // hmax)
        chh = -(-h * vi // vmax)
        for by in range(-(-chh // 8)):
            for bx in range(-(-cw // 8)):
                yield qblocks[ci][by, bx]

    # --- AC first scans (Al=1): spectral bands 1-5 then 6-63 -------------
    for ss2, se2 in ((1, 5), (6, 63)):
        for ci in range(nch):
            ac = books[ci][1]
            scan = bytearray()
            writer = _BitWriter()
            blk_n = rst = 0
            for zz in comp_blocks(ci):
                if restart_interval and blk_n and blk_n % restart_interval == 0:
                    writer = rst_marker(scan, writer, rst)
                    rst += 1
                run = 0
                for k in range(ss2, se2 + 1):
                    v = int(zz[k])
                    vt = (abs(v) >> 1) * (1 if v >= 0 else -1)
                    if vt == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac[0xF0]
                        writer.write(code, length)
                        run -= 16
                    cat, bits_v = _magnitude(vt)
                    code, length = ac[(run << 4) | cat]
                    writer.write(code, length)
                    writer.write(bits_v, cat)
                    run = 0
                if run:
                    code, length = ac[0x00]  # plain EOB, no run accumulation
                    writer.write(code, length)
                blk_n += 1
            scan += writer.flush()
            scans.append((sos_body([ci], ss2, se2, 0, 1), bytes(scan)))

    # --- AC refinement scans (Ah=1, Al=0): G.1.2.3 -----------------------
    # The encoder MIRRORS the decoder's walk exactly: each emitted
    # symbol owns a positional WINDOW of the band, and the correction
    # bits that follow it are precisely the already-significant
    # coefficients the decoder traverses inside that window — a ZRL's
    # window ends at its 16th zero-history slot, NOT at the next
    # newly-significant coefficient (flushing the whole pending buffer
    # there desynchronizes streams whose pending zero run exceeds 15
    # with a significant coefficient inside the overflow).
    for ci in range(nch):
        ac = books[ci][1]
        scan = bytearray()
        writer = _BitWriter()
        blk_n = rst = 0
        for zz in comp_blocks(ci):
            if restart_interval and blk_n and blk_n % restart_interval == 0:
                writer = rst_marker(scan, writer, rst)
                rst += 1
            band = [int(zz[k]) for k in range(1, 64)]
            events = [i for i, v in enumerate(band) if abs(v) == 1]
            ptr = 0  # decoder-walk position within `band`

            def corr(i: int) -> None:
                writer.write(abs(band[i]) & 1, 1)

            for ev in events:
                run = sum(
                    1 for i in range(ptr, ev) if band[i] == 0
                )
                while run > 15:
                    code, length = ac[0xF0]
                    writer.write(code, length)
                    zcnt = 0
                    while zcnt < 16:  # the ZRL window: 16 zero slots
                        if band[ptr] == 0:
                            zcnt += 1
                        else:
                            corr(ptr)
                        ptr += 1
                    run -= 16
                code, length = ac[(run << 4) | 1]
                writer.write(code, length)
                writer.write(1 if band[ev] > 0 else 0, 1)
                while ptr < ev:  # window tail: bits for passed nonzeros
                    if band[ptr] != 0:
                        corr(ptr)
                    ptr += 1
                ptr = ev + 1
            if ptr < len(band):
                code, length = ac[0x00]
                writer.write(code, length)
                for i in range(ptr, len(band)):
                    if band[i] != 0:
                        corr(i)
            blk_n += 1
        scan += writer.flush()
        scans.append((sos_body([ci], 1, 63, 1, 0), bytes(scan)))
    return scans


# ---------------------------------------------------------------------------
# Arithmetic-coded JPEG (T.81 Annexes D, F.1.4/F.2.4, G.2): the QM
# binary arithmetic coder with the Table D.3 probability-estimation
# state machine, plus the DC/AC statistical models — SOF9 (extended
# sequential) and SOF10 (progressive). Both the ENCODER and the DECODER
# are implemented from the spec flowcharts, so every arithmetic stream
# in the tests round-trips AND bit-matches the decode of the same
# quantized coefficients through the completely independent Huffman
# entropy path. Byte stuffing follows T.81 B.1.1.5 (0xFF in entropy
# data is followed by 0x00), the convention every interoperable
# implementation (IJG lineage) produces.
# ---------------------------------------------------------------------------

#: T.81 Table D.3 — (Qe, NMPS, NLPS, SWITCH) per estimation state;
#: index 113 is the conventional non-adaptive "fixed 1/2" bin used for
#: AC sign and refinement decisions (NMPS = NLPS = self, no switch).
_ARITH_QE = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 110, 1), (0x50E7, 107, 111, 0), (0x4B85, 103, 110, 0),
    (0x5597, 109, 112, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)

#: statistics-area sizes per T.81 Table F.4 (DC: S0..S19 + X1 chain +
#: magnitude bits; AC: 3 bins per k + X2/X3 chains at 189/217 + bits)
_DC_STAT_BINS = 64
_AC_STAT_BINS = 256
_FIXED_STATE = 113 << 1  # index 113, MPS 0 — never adapts


class _ArithEncoder:
    """T.81 D.1 QM encoder. Registers per INITENC: A=0x10000, C=0,
    CT=11; BYTEOUT emits C bits 19..26 with carry resolved by walking
    the raw byte list (a carry turns a trailing 0xFF run into 0x00s
    and increments the byte before it — a run can never reach the
    stream head, since that would put the code point at >= 1.0).
    ``flush`` performs the D.1.8 CLEARBITS termination, drops trailing
    zero bytes, and applies 0xFF -> 0xFF 0x00 stuffing."""

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.raw: list[int] = []

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            i = len(self.raw) - 1
            while i >= 0 and self.raw[i] == 0xFF:
                self.raw[i] = 0x00
                i -= 1
            if i < 0:
                raise ValueError("arithmetic coder carry out of stream")
            self.raw[i] += 1
            t &= 0xFF
        self.raw.append(t)
        self.c &= 0x7FFFF

    def _renorm(self) -> None:
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8

    def code(self, st: bytearray, i: int, bit: int) -> None:
        state = st[i]
        qe, nmps, nlps, switch = _ARITH_QE[state >> 1]
        mps = state & 1
        self.a -= qe
        if bit != mps:  # LPS path (D.1.3, CODELPS)
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            if switch:
                mps ^= 1
            st[i] = (nlps << 1) | mps
            self._renorm()
        else:  # MPS path (D.1.3, CODEMPS)
            if self.a >= 0x8000:
                return  # no renorm -> no estimation update
            if self.a < qe:  # conditional exchange
                self.c += self.a
                self.a = qe
            st[i] = (nmps << 1) | mps
            self._renorm()

    def flush(self) -> bytes:
        # D.1.8: pick the code point in [C, C+A) with the most trailing
        # zeros, push out the final bits, drop all-zero tail bytes
        t = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c & 0xF8000000:
            i = len(self.raw) - 1
            while i >= 0 and self.raw[i] == 0xFF:
                self.raw[i] = 0x00
                i -= 1
            if i < 0:
                raise ValueError("arithmetic coder carry out of stream")
            self.raw[i] += 1
        if self.c & 0x7FFF800:
            self.raw.append((self.c >> 19) & 0xFF)
            if self.c & 0x7F800:
                self.raw.append((self.c >> 11) & 0xFF)
        out = bytearray()
        for b in self.raw:
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


class _ArithDecoder:
    """T.81 D.2 QM decoder. INITDEC loads the first two entropy bytes
    into C bits 16..31 with A = 0x10000 (the spec's 16-bit registers
    treat the initial A = X'0000' as 2^16, and Chigh carries the next
    16 un-decoded code-string bits in the same scale as A).
    Entropy bytes are read with 0xFF 0x00 unstuffing; a
    marker (0xFF followed by non-zero) ends the data — its position is
    remembered and zero bytes are supplied from then on (the encoder's
    flush dropped trailing zeros, so the tail regenerates exactly)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.bp = pos
        self.marker_pos: int | None = None
        self.c = self._next_byte() << 16
        self._bytein()
        self.c = (self.c << 8) & 0xFFFFFFFF
        self.ct = 0
        self.a = 0x10000

    def _next_byte(self) -> int:
        if self.marker_pos is not None:
            return 0
        d, p = self.data, self.bp
        if p >= len(d):
            self.marker_pos = len(d)
            return 0
        b = d[p]
        if b == 0xFF:
            if p + 1 < len(d) and d[p + 1] == 0x00:
                self.bp = p + 2  # stuffed zero: literal 0xFF data byte
                return 0xFF
            self.marker_pos = p  # marker: stop consuming, feed zeros
            return 0
        self.bp = p + 1
        return b

    def _bytein(self) -> None:
        self.c = (self.c + (self._next_byte() << 8)) & 0xFFFFFFFF
        self.ct = 8

    def decode(self, st: bytearray, i: int) -> int:
        state = st[i]
        qe, nmps, nlps, switch = _ARITH_QE[state >> 1]
        mps = state & 1
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < self.a:
            if self.a & 0x8000:
                return mps
            # MPS_EXCHANGE (D.2.3): renorm needed, estimation updates
            if self.a < qe:  # conditional exchange
                d = mps ^ 1
                if switch:
                    mps ^= 1
                st[i] = (nlps << 1) | mps
            else:
                d = mps
                st[i] = (nmps << 1) | mps
        else:
            # LPS_EXCHANGE (D.2.4)
            self.c = (self.c - (self.a << 16)) & 0xFFFFFFFF
            if self.a < qe:  # conditional exchange
                d = mps
                st[i] = (nmps << 1) | mps
            else:
                d = mps ^ 1
                if switch:
                    mps ^= 1
                st[i] = (nlps << 1) | mps
            self.a = qe
        while self.a < 0x8000:  # RENORMD
            if self.ct == 0:
                self._bytein()
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.a <<= 1
            self.ct -= 1
        return d


#: conditioning defaults (T.81 F.1.4.4.1.4 / F.1.4.4.2.1): DC lower/
#: upper difference thresholds and the AC low/high-spectrum split index
_ARITH_DC_L, _ARITH_DC_U, _ARITH_AC_KX = 0, 1, 5


def _arith_put_dc(enc, st: bytearray, c0: int, diff: int,
                  l: int, u: int) -> int:
    """Encode one DC difference per F.1.4.1 (decision tree Figures
    F.5-F.9) and return the conditioning context for the next block."""
    if diff == 0:
        enc.code(st, c0, 0)
        return 0
    enc.code(st, c0, 1)
    sign = 1 if diff < 0 else 0
    enc.code(st, c0 + 1, sign)
    pos = c0 + 2 + sign
    v = abs(diff) - 1
    m = 0
    if v:
        enc.code(st, pos, 1)
        m = 1
        pos = 20  # Table F.4: X1
        v2 = v
        while v2 >> 1:
            enc.code(st, pos, 1)
            m <<= 1
            pos += 1
            v2 >>= 1
    enc.code(st, pos, 0)
    if m < ((1 << l) >> 1):
        ctx = 0
    elif m > ((1 << u) >> 1):
        ctx = 12 + 4 * sign
    else:
        ctx = 4 + 4 * sign
    pos += 14  # magnitude bits share ONE bin per exponent (Table F.4)
    mm = m >> 1
    while mm:
        enc.code(st, pos, 1 if v & mm else 0)
        mm >>= 1
    return ctx


def _arith_get_dc(dec, st: bytearray, c0: int,
                  l: int, u: int) -> tuple[int, int]:
    """Decode one DC difference; returns (diff, next context)."""
    if dec.decode(st, c0) == 0:
        return 0, 0
    sign = dec.decode(st, c0 + 1)
    pos = c0 + 2 + sign
    m = dec.decode(st, pos)
    if m:
        pos = 20
        while dec.decode(st, pos):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            pos += 1
    if m < ((1 << l) >> 1):
        ctx = 0
    elif m > ((1 << u) >> 1):
        ctx = 12 + 4 * sign
    else:
        ctx = 4 + 4 * sign
    v = m
    pos += 14
    mm = m >> 1
    while mm:
        if dec.decode(st, pos):
            v |= mm
        mm >>= 1
    v += 1
    return (-v if sign else v), ctx


def _arith_put_ac(enc, st: bytearray, fixed: bytearray, k: int,
                  val: int, kx: int) -> None:
    """Encode one nonzero AC value per F.1.4.3 (sign on the fixed bin,
    magnitude category on the per-k bins with the X2/X3 chains)."""
    enc.code(fixed, 0, 1 if val < 0 else 0)
    pos = 3 * (k - 1) + 2
    v = abs(val) - 1
    m = 0
    if v:
        enc.code(st, pos, 1)
        m = 1
        v2 = v >> 1
        if v2:
            enc.code(st, pos, 1)
            m = 2
            pos = 189 if k <= kx else 217  # Table F.4: X2 / X3
            while v2 >> 1:
                enc.code(st, pos, 1)
                m <<= 1
                pos += 1
                v2 >>= 1
    enc.code(st, pos, 0)
    pos += 14
    mm = m >> 1
    while mm:
        enc.code(st, pos, 1 if v & mm else 0)
        mm >>= 1


def _arith_get_ac(dec, st: bytearray, fixed: bytearray, k: int,
                  kx: int) -> int:
    """Decode one nonzero AC value (the significance decision has
    already been consumed by the caller)."""
    sign = dec.decode(fixed, 0)
    pos = 3 * (k - 1) + 2
    m = dec.decode(st, pos)
    if m:
        if dec.decode(st, pos):
            m = 2
            pos = 189 if k <= kx else 217
            while dec.decode(st, pos):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("arithmetic AC magnitude overflow")
                pos += 1
    v = m
    pos += 14
    mm = m >> 1
    while mm:
        if dec.decode(st, pos):
            v |= mm
        mm >>= 1
    v += 1
    return -v if sign else v


def _arith_scans(
    qblocks, sampling, mcuy, mcux, restart_interval,
    progressive, sos_body, h, w, hmax, vmax, differential=False,
):
    """Arithmetic twin of the Huffman scan emitters: one interleaved
    sequential scan (SOF9), or the same G.1.2 progressive script the
    Huffman path uses (SOF10) — DC first at Al=1, DC refinement,
    per-component AC bands 1-5 / 6-63 at Al=1, AC refinement at Al=0.
    Statistics areas, DC contexts and predictors reset at every
    restart marker (F.1.4.x), with the coder flushed and re-primed."""
    nch = len(sampling)
    l, u, kx = _ARITH_DC_L, _ARITH_DC_U, _ARITH_AC_KX
    scans: list[tuple[bytes, bytes]] = []

    def fresh():
        return {
            "enc": _ArithEncoder(),
            "dc": [bytearray(_DC_STAT_BINS) for _ in range(2)],
            "ac": [bytearray(_AC_STAT_BINS) for _ in range(2)],
            "fixed": bytearray([_FIXED_STATE]),
            "preds": [0] * nch,
            "ctx": [0] * nch,
        }

    def rst_flush(scan: bytearray, s: dict, rst: int) -> dict:
        scan += s["enc"].flush()
        scan += bytes([0xFF, 0xD0 + (rst % 8)])
        return fresh()

    def ac_first_block(s, tid, zz, ss, se, al):
        """AC scan walk (F.1.4.3): sequential is the ss=1..63, al=0
        special case; progressive shifts magnitudes toward zero."""
        enc, st = s["enc"], s["ac"][tid]
        band = {}
        ke = ss - 1
        for k in range(ss, se + 1):
            vv = int(zz[k])
            vt = (abs(vv) >> al) * (1 if vv >= 0 else -1)
            band[k] = vt
            if vt:
                ke = k
        k = ss
        while k <= ke:
            enc.code(st, 3 * (k - 1), 0)  # not end-of-block yet
            while band[k] == 0:
                enc.code(st, 3 * (k - 1) + 1, 0)
                k += 1
            enc.code(st, 3 * (k - 1) + 1, 1)
            _arith_put_ac(enc, st, s["fixed"], k, band[k], kx)
            k += 1
        if k <= se:
            enc.code(st, 3 * (k - 1), 1)  # end-of-block

    def seq_block(s, ci, zz):
        tid = 0 if ci == 0 else 1
        dc = int(zz[0])
        base = 0 if differential else s["preds"][ci]
        s["ctx"][ci] = _arith_put_dc(
            s["enc"], s["dc"][tid], s["ctx"][ci], dc - base, l, u
        )
        s["preds"][ci] = dc
        ac_first_block(s, tid, zz, 1, 63, 0)

    if not progressive:
        scan = bytearray()
        s = fresh()
        mcu = rst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    s = rst_flush(scan, s, rst)
                    rst += 1
                for ci, (hi, vi) in enumerate(sampling):
                    for by in range(vi):
                        for bx in range(hi):
                            seq_block(
                                s, ci, qblocks[ci][my * vi + by, mx * hi + bx]
                            )
                mcu += 1
        scan += s["enc"].flush()
        scans.append((sos_body(list(range(nch)), 0, 63, 0, 0), bytes(scan)))
        return scans

    # --- progressive: DC first scan (interleaved, point transform >> 1)
    scan = bytearray()
    s = fresh()
    mcu = rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                s = rst_flush(scan, s, rst)
                rst += 1
            for ci, (hi, vi) in enumerate(sampling):
                tid = 0 if ci == 0 else 1
                for by in range(vi):
                    for bx in range(hi):
                        dc = int(qblocks[ci][my * vi + by, mx * hi + bx][0]) >> 1
                        base = 0 if differential else s["preds"][ci]
                        s["ctx"][ci] = _arith_put_dc(
                            s["enc"], s["dc"][tid], s["ctx"][ci],
                            dc - base, l, u,
                        )
                        s["preds"][ci] = dc
            mcu += 1
    scan += s["enc"].flush()
    scans.append((sos_body(list(range(nch)), 0, 0, 0, 1), bytes(scan)))

    # --- DC refinement: one fixed-probability bit per block ---------------
    scan = bytearray()
    s = fresh()
    mcu = rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                s = rst_flush(scan, s, rst)
                rst += 1
            for ci, (hi, vi) in enumerate(sampling):
                for by in range(vi):
                    for bx in range(hi):
                        s["enc"].code(
                            s["fixed"], 0,
                            int(qblocks[ci][my * vi + by, mx * hi + bx][0]) & 1,
                        )
            mcu += 1
    scan += s["enc"].flush()
    scans.append((sos_body(list(range(nch)), 0, 0, 1, 0), bytes(scan)))

    def comp_blocks(ci):
        hi, vi = sampling[ci]
        cw = -(-w * hi // hmax)
        chh = -(-h * vi // vmax)
        for by in range(-(-chh // 8)):
            for bx in range(-(-cw // 8)):
                yield qblocks[ci][by, bx]

    # --- AC first scans (Al=1): spectral bands 1-5 then 6-63 --------------
    for ss2, se2 in ((1, 5), (6, 63)):
        for ci in range(nch):
            tid = 0 if ci == 0 else 1
            scan = bytearray()
            s = fresh()
            blk_n = rst = 0
            for zz in comp_blocks(ci):
                if restart_interval and blk_n and blk_n % restart_interval == 0:
                    s = rst_flush(scan, s, rst)
                    rst += 1
                ac_first_block(s, tid, zz, ss2, se2, 1)
                blk_n += 1
            scan += s["enc"].flush()
            scans.append((sos_body([ci], ss2, se2, 0, 1), bytes(scan)))

    # --- AC refinement scans (Ah=1, Al=0): G.2.2 walk ---------------------
    # The EOB decision is only coded at positions past the previous
    # scan's end-of-band (kex); zero-history slots consume a
    # significance decision each, already-significant coefficients a
    # correction bit on their third bin, signs ride the fixed bin.
    for ci in range(nch):
        tid = 0 if ci == 0 else 1
        scan = bytearray()
        s = fresh()
        blk_n = rst = 0
        for zz in comp_blocks(ci):
            if restart_interval and blk_n and blk_n % restart_interval == 0:
                s = rst_flush(scan, s, rst)
                rst += 1
            enc, st = s["enc"], s["ac"][tid]
            band = [int(zz[k]) for k in range(64)]
            ke = kex = 0
            for k in range(1, 64):
                if band[k]:
                    ke = k
                if abs(band[k]) >> 1:
                    kex = k
            k = 1
            while k <= ke:
                if k > kex:
                    enc.code(st, 3 * (k - 1), 0)
                while True:
                    t = abs(band[k])
                    if t >> 1:  # significant before this scan
                        enc.code(st, 3 * (k - 1) + 2, t & 1)
                        break
                    if t:  # newly significant (magnitude 1)
                        enc.code(st, 3 * (k - 1) + 1, 1)
                        enc.code(s["fixed"], 0, 1 if band[k] < 0 else 0)
                        break
                    enc.code(st, 3 * (k - 1) + 1, 0)
                    k += 1
                k += 1
            if k <= 63:
                enc.code(st, 3 * (k - 1), 1)
            blk_n += 1
        scan += s["enc"].flush()
        scans.append((sos_body([ci], 1, 63, 1, 0), bytes(scan)))
    return scans


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    non-stuffing marker (the caller inspects it)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("read past marker in entropy segment")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = 0xFF00 | nxt
                raise _MarkerHit()
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


class _MarkerHit(Exception):
    pass


def _extend(v: int, cat: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `cat` amplitude bits to a signed value."""
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _huff_read(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _decode_jpeg(content: bytes) -> dict:
    """GENUINE decoder: baseline sequential (SOF0/SOF1) AND progressive
    (SOF2) JPEG, 8-bit, grayscale or YCbCr at any integer
    sampling-factor grid — 4:4:4, 4:2:0 (the real-corpus common case),
    4:2:2/4:4:0 — with DRI/RSTn restart markers honored in every scan.

    Architecture: every SOS scan decodes into a per-component
    COEFFICIENT store (zigzag order); baseline is the degenerate single
    scan (Ss=0..63, Ah=Al=0, interleaved). Progressive scans update the
    store per T.81 G.1.2: DC first/refinement via the point transform,
    AC spectral-selection bands with EOB-run skipping, and AC
    successive-approximation refinement with interleaved correction
    bits. Reconstruction (dequantize + IDCT + chroma replication +
    BT.601) runs once at EOI over the accumulated coefficients.

    Lossless (SOF3, T.81 process 14) is also decoded: predictive DPCM
    with all 7 predictors, point transform, 2-16-bit precision,
    restart-marker prediction resets — no DCT, no color transform,
    payload is the exact source samples (uint8, or little-endian
    uint16 when precision > 8).

    Arithmetic-coded frames (SOF9 extended sequential, SOF10
    progressive) are decoded too: the T.81 Annex D QM coder with the
    F.2.4/G.2 statistical models, DAC conditioning honored. So are
    arithmetic LOSSLESS frames (SOF11, Annex H.1.1 model) and
    hierarchical pyramids (Annex J: DHP/EXP with differential lossless
    SOF7/SOF15 frames AND all four differential DCT frame kinds —
    SOF5/SOF6 Huffman, SOF13/SOF14 arithmetic — grayscale or color,
    with SUBSAMPLED differential chroma residuals supported since
    round 10: each residual plane decodes at its component grid and
    the fold replicates it up). The FULL T.81 SOF matrix decodes;
    remaining honest constraints: hierarchical DCT frames are 8-bit,
    lossless frames are unsubsampled, sampling factors are 1/2/4.
    Payload is the raw interleaved pixel array ((h, w, channels)
    uint8, RGB)."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    progressive = False
    lossless = False
    arith = False
    dc_cond: dict[int, tuple[int, int]] = {}
    ac_cond: dict[int, int] = {}
    samples: np.ndarray | None = None  # (h, w, nf) for the lossless process
    restart_interval = 0
    coef: list[np.ndarray] | None = None  # per component (nbh, nbw, 64) zigzag
    geom: list[tuple[int, int, int, int]] | None = None  # hi, vi, nbh, nbw (MCU-padded)
    # hierarchical (Annex J) state: DHP geometry, the reconstructed
    # previous level, the EXP flags pending for the next frame, and the
    # expanded reference the current differential frame codes against
    hier: tuple[int, int, int] | None = None  # (P, Y, X)
    pending_exp = (0, 0)
    prev_recon: np.ndarray | None = None
    differential = False
    ref_arr: np.ndarray | None = None

    def _finish_hier_level() -> None:
        """Fold the just-decoded frame into the level reconstruction.
        Lossless frames: non-differential stand alone, differential add
        to the expanded reference mod 2^16 (J.1.1.4), masked to P bits.
        DCT frames (grayscale): dequant + IDCT — with the level shift
        for non-differential frames, without it for differential ones
        (J.1.5), rounded once together with the reference and clamped
        to [0, 2^P-1]."""
        nonlocal prev_recon
        if lossless:
            if samples is None:
                return
            # subsampled lossless frames store component grids
            # top-left in `samples`: replicate them up to the frame
            # size BEFORE the fold (round 10)
            h_, w_, comps_, llhm, llvm = sof
            if (llhm, llvm) != (1, 1):
                planes = []
                for ci, (_cid, hi, vi, _tq) in enumerate(comps_):
                    yc = -(-h_ * vi // llvm)
                    xc = -(-w_ * hi // llhm)
                    p_ = samples[:yc, :xc, ci]
                    p_ = np.repeat(
                        np.repeat(p_, llvm // vi, axis=0),
                        llhm // hi,
                        axis=1,
                    )[:h_, :w_]
                    planes.append(p_)
                full = np.stack(planes, axis=-1)
            else:
                full = samples
            if differential and ref_arr is not None:
                lvl = (ref_arr.astype(np.int64) + full) & 0xFFFF
            else:
                lvl = full.astype(np.int64) & 0xFFFF
            prev_recon = lvl & ((1 << precision) - 1)
            return
        if not coef or geom is None or sof is None:
            return
        h_, w_, comps_, hm_, vm_ = sof
        half = float(1 << (precision - 1))
        top = (1 << precision) - 1
        planes = []
        for ci, ((_cid, hi, vi, tq), (_ghi, _gvi, nbh, nbw)) in enumerate(
            zip(comps_, geom)
        ):
            q = qtabs[tq]
            plane = np.zeros((nbh * 8, nbw * 8), dtype=np.float64)
            for by in range(nbh):
                for bx in range(nbw):
                    natural = np.empty(64, dtype=np.int64)
                    natural[_ZIGZAG] = coef[ci][by, bx]
                    deq = (natural * q).reshape(8, 8)
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        _DCT.T @ deq.astype(np.float64) @ _DCT
                    )
            ch_, cw_ = -(-h_ * vi // vm_), -(-w_ * hi // hm_)
            plane = plane[:ch_, :cw_]
            if (hi, vi) != (hm_, vm_):
                plane = np.repeat(
                    np.repeat(plane, vm_ // vi, axis=0), hm_ // hi, axis=1
                )
            planes.append(plane[:h_, :w_])
        if differential and ref_arr is not None:
            # differential residuals are coded componentwise in the
            # OUTPUT space — no color transform (J.1.5)
            stack = np.stack(planes, axis=-1)
            lvl = np.clip(
                np.round(ref_arr.astype(np.float64) + stack), 0, top
            )
        elif len(planes) == 3:
            # non-differential color base frame: the standard YCbCr
            # reconstruction, bit-identical to _reconstruct_jpeg
            y = planes[0] + half
            cb = planes[1] + half
            cr = planes[2] + half
            r = y + 1.402 * (cr - half)
            g = y - 0.344136 * (cb - half) - 0.714136 * (cr - half)
            b = y + 1.772 * (cb - half)
            lvl = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, top)
        else:
            lvl = np.clip(np.round(planes[0] + half), 0, top)[:, :, None]
        prev_recon = lvl.astype(np.int64)

    while pos < len(content):
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI
            break
        size = struct.unpack_from(">H", content, pos + 2)[0]
        body = content[pos + 4 : pos + 2 + size]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq == 0:
                    zz = np.frombuffer(
                        body, dtype=np.uint8, count=64, offset=off + 1
                    ).astype(np.int64)
                    off += 65
                else:  # Pq=1: 16-bit big-endian entries (12-bit frames)
                    zz = np.frombuffer(
                        body, dtype=">u2", count=64, offset=off + 1
                    ).astype(np.int64)
                    off += 129
                nat = np.empty(64, dtype=np.int64)
                nat[_ZIGZAG] = zz  # stored zigzag -> natural order
                qtabs[tq] = nat
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                huff[(tc, th)] = _huff_decode_table(bits, vals)
                off += 17 + n
        elif marker == 0xDE:  # DHP: hierarchical progression (Annex J)
            precision, hy, hx, _hnf = struct.unpack_from(">BHHB", body, 0)
            hier = (precision, hy, hx)
        elif marker == 0xDF:  # EXP: expand reference before next frame
            if hier is None:
                raise ValueError("EXP outside a hierarchical stream")
            pending_exp = (body[0] >> 4, body[0] & 0x0F)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            # baseline/extended/progressive DCT (Huffman or, for
            # SOF9/SOF10, arithmetic), lossless (SOF3 Huffman / SOF11
            # arithmetic), or — inside a hierarchical stream — the
            # differential twins (SOF5 sequential DCT, SOF7 / SOF15
            # lossless)
            # round 8: non-differential progressive/arithmetic DCT
            # frames (0xC2/0xC9/0xCA) are legal hierarchy BASE frames —
            # their scans accumulate into coef like anywhere else and
            # the fold reconstructs them with _reconstruct_jpeg's exact
            # arithmetic.
            if marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF) and hier is None:
                raise ValueError("differential frame outside hierarchy")
            if hier is not None:
                _finish_hier_level()  # fold the previous frame, if any
            progressive = marker in (0xC2, 0xC6, 0xCA, 0xCE)
            arith = marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
            lossless = marker in (0xC3, 0xC7, 0xCB, 0xCF)
            differential = marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF)
            precision, h, w, nf = struct.unpack_from(">BHHB", body, 0)
            if lossless:
                if not 2 <= precision <= 16:
                    raise ValueError("lossless JPEG precision out of range")
            elif precision not in (8, 12):
                raise NotImplementedError("only 8- or 12-bit DCT samples")
            comps = []
            for i in range(nf):
                cid, hv, tq = struct.unpack_from("BBB", body, 6 + 3 * i)
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2, 4) or vi not in (1, 2, 4):
                    raise NotImplementedError(
                        f"JPEG sampling factors {hi}x{vi} out of range"
                    )
                comps.append((cid, hi, vi, tq))
            if lossless:
                llhm = max(c[1] for c in comps)
                llvm = max(c[2] for c in comps)
                if (llhm, llvm) != (1, 1):
                    # round 8: subsampled lossless frames decode (comp
                    # grids per T.81 A.2, replicated up at the finish).
                    # Round 10: ALSO inside a hierarchy — differential
                    # residuals code at the component grid with zero
                    # prediction, the level fold replicates them up
                    # before the mod-2^16 add, and modular arithmetic
                    # keeps every SAMPLED position exact (the stream's
                    # final full-resolution frame corrects the rest).
                    # Arithmetic-coded subsampled lossless remains a
                    # declared boundary (its own raise).
                    for _cid2, hi2, vi2, _tq2 in comps:
                        if llhm % hi2 or llvm % vi2:
                            raise NotImplementedError(
                                "non-integer sampling ratio"
                            )
                sof = (h, w, comps, llhm, llvm)
                if differential:
                    if prev_recon is None:
                        raise ValueError("SOF7 with no reference frame")
                    eh, ev = pending_exp
                    pending_exp = (0, 0)
                    ref_arr = _jpeg_expand(prev_recon, eh, ev, h, w)
                else:
                    ref_arr = None
                samples = np.zeros((h, w, nf), dtype=np.int32)
                geom, coef = [], []  # unused in the lossless process
                continue_pos = pos + 2 + size
                pos = continue_pos
                continue
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for _cid, hi, vi, _tq in comps:
                if hmax % hi or vmax % vi:
                    raise NotImplementedError(
                        "non-integer chroma upsampling ratio"
                    )
            sof = (h, w, comps, hmax, vmax)
            mcuy, mcux = -(-h // (8 * vmax)), -(-w // (8 * hmax))
            geom = [
                (hi, vi, mcuy * vi, mcux * hi) for _cid, hi, vi, _tq in comps
            ]
            coef = [
                np.zeros((nbh, nbw, 64), dtype=np.int32)
                for _hi, _vi, nbh, nbw in geom
            ]
            if hier is not None:
                samples = None  # this frame is DCT, not lossless
                # round 10 (closing the last T.81 corner): SUBSAMPLED
                # differential color frames decode too — each residual
                # plane is coded at its component grid and the fold
                # replicates it up before adding to the output-space
                # reference (the same expansion the non-differential
                # color path uses); the hierarchical stream's final
                # lossless frame corrects any expansion loss, so
                # bit-exactness is preserved end to end.
                if differential:
                    if prev_recon is None:
                        raise ValueError("SOF5 with no reference frame")
                    eh, ev = pending_exp
                    pending_exp = (0, 0)
                    ref_arr = _jpeg_expand(prev_recon, eh, ev, h, w)
                else:
                    ref_arr = None

        elif marker == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            off = 0
            while off + 1 < len(body):
                tc, tb = body[off] >> 4, body[off] & 0x0F
                val = body[off + 1]
                if tc == 0:
                    dc_cond[tb] = (val & 0x0F, val >> 4)  # (L, U)
                else:
                    ac_cond[tb] = val  # Kx
                off += 2
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body)[0]
        elif marker == 0xDA:  # SOS — one scan of entropy data follows
            if sof is None or coef is None or geom is None:
                raise ValueError("JPEG SOS before SOF")
            if lossless and arith:
                pos = _decode_lossless_arith_scan(
                    content, pos, size, body, sof, samples, dc_cond,
                    restart_interval, precision, differential,
                )
            elif lossless:
                pos = _decode_lossless_scan(
                    content, pos, size, body, sof, samples, huff,
                    restart_interval, precision, differential,
                )
            elif arith:
                pos = _decode_jpeg_arith_scan(
                    content, pos, size, body, sof, geom, coef,
                    dc_cond, ac_cond, restart_interval, progressive,
                    differential,
                )
            else:
                pos = _decode_jpeg_scan(
                    content, pos, size, body, sof, geom, coef, huff,
                    restart_interval, progressive, differential,
                )
            continue
        pos += 2 + size
    if sof is None or coef is None or geom is None:
        raise ValueError("JPEG had no frame")
    if hier is not None:
        _finish_hier_level()
        h, w, comps, _hmax, _vmax = sof
        if (hier[1], hier[2]) != (h, w):
            raise ValueError("hierarchical final frame is not full size")
        arr = prev_recon
        if precision <= 8:
            payload = arr.astype(np.uint8).tobytes()
        else:
            payload = arr.astype("<u2").tobytes()
        return {
            "kind": "image",
            "width": w,
            "height": h,
            "sample_rate": None,
            "payload": payload,
        }
    if lossless:
        h, w, comps, llhm, llvm = sof
        if (llhm, llvm) != (1, 1):
            # round 8: replicate each component grid up to (h, w) —
            # the subsampled-lossless output convention (no transform,
            # chroma repeats its decimated samples)
            planes = []
            for ci, (_cid, hi, vi, _tq) in enumerate(comps):
                yc, xc = -(-h * vi // llvm), -(-w * hi // llhm)
                p_ = samples[:yc, :xc, ci]
                p_ = np.repeat(
                    np.repeat(p_, llvm // vi, axis=0), llhm // hi, axis=1
                )[:h, :w]
                planes.append(p_)
            arr = np.stack(planes, axis=-1)
        else:
            arr = samples
        if precision <= 8:
            payload = arr.astype(np.uint8).tobytes()
        else:
            payload = arr.astype("<u2").tobytes()
        return {
            "kind": "image",
            "width": w,
            "height": h,
            "sample_rate": None,
            "payload": payload,
        }
    return _reconstruct_jpeg(sof, geom, coef, qtabs, precision)


def _decode_jpeg_scan(
    content: bytes,
    pos: int,
    size: int,
    body: bytes,
    sof,
    geom,
    coef,
    huff,
    restart_interval: int,
    progressive: bool,
    differential: bool = False,
) -> int:
    """Decode ONE entropy-coded scan into the coefficient store and
    return the byte position of the marker following it. Implements
    T.81 F.2 (sequential) and G.1.2 (progressive DC/AC first +
    refinement, EOB runs, correction bits). In `differential` mode
    (SOF5, Annex J) the DC coefficient has NO prediction — each block's
    DC is the coded value itself."""
    h, w, comps, hmax, vmax = sof
    ns = body[0]
    scan_sel = []
    for i in range(ns):
        cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
        scan_sel.append((cs, tdta >> 4, tdta & 0x0F))
    ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0x0F
    if not progressive:
        ss, se, ah, al = 0, 63, 0, 0
    idx_by_id = {cid: i for i, (cid, _hi, _vi, _tq) in enumerate(comps)}
    members = []  # (comp_index, td, ta)
    for cs, td, ta in scan_sel:
        members.append((idx_by_id[cs], td, ta))

    reader = _BitReader(content, pos + 2 + size)
    state = {"eobrun": 0}
    preds = [0] * len(members)

    def decode_block(mi: int, ci: int, by: int, bx: int) -> None:
        _ci, td, ta = members[mi]
        blk = coef[ci][by, bx]
        if ss == 0:  # DC (or full baseline) band
            if ah == 0:
                cat = _huff_read(reader, huff[(0, td)])
                diff = _extend(reader.bits(cat), cat)
                if differential:
                    blk[0] = diff << al
                else:
                    preds[mi] += diff
                    blk[0] = preds[mi] << al
            else:
                if reader.bit():
                    blk[0] |= 1 << al
            k0 = 1
        else:
            k0 = ss
        if se == 0 or (progressive and ss == 0):
            return  # progressive DC scans carry no AC
        if ah == 0:  # AC first pass (baseline falls in here too)
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                return
            k = k0
            while k <= se:
                rs = _huff_read(reader, huff[(1, ta)])
                run, sz = rs >> 4, rs & 0x0F
                if sz == 0:
                    if run == 15:
                        k += 16  # ZRL
                        continue
                    eob = (1 << run) - 1
                    if run:
                        eob += reader.bits(run)
                    state["eobrun"] = eob
                    break
                k += run
                if k > 63:
                    raise ValueError("AC index overflow")
                blk[k] = _extend(reader.bits(sz), sz) << al
                k += 1
        else:  # AC successive-approximation refinement (G.1.2.3)
            p1, m1 = 1 << al, -1 << al

            def correct(k: int) -> None:
                if blk[k] and reader.bit() and not (blk[k] & p1):
                    blk[k] += p1 if blk[k] > 0 else m1

            # NOTE the EOBRUN convention differs from the first pass:
            # here the count INCLUDES the current block (libjpeg's
            # convention), because even the EOB-starting block must
            # sweep correction bits over its band tail below
            k = k0
            if state["eobrun"] == 0:
                while k <= se:
                    rs = _huff_read(reader, huff[(1, ta)])
                    run, sz = rs >> 4, rs & 0x0F
                    newval = 0
                    if sz == 0:
                        if run != 15:
                            eob = 1 << run
                            if run:
                                eob += reader.bits(run)
                            state["eobrun"] = eob
                            break
                        # ZRL: run stays 15 -> skip 16 zero-history slots
                    else:
                        if sz != 1:
                            raise ValueError(
                                "refinement scan size must be 1"
                            )
                        newval = p1 if reader.bit() else m1
                    while k <= se:
                        if blk[k]:
                            correct(k)
                        else:
                            if run == 0:
                                if newval:
                                    blk[k] = newval
                                k += 1
                                break
                            run -= 1
                        k += 1
            # EOB region: correction bits only over the band remainder
            if state["eobrun"] > 0:
                while k <= se:
                    correct(k)
                    k += 1
                state["eobrun"] -= 1

    mcuy_b, mcux_b = -(-h // (8 * vmax)), -(-w // (8 * hmax))
    try:
        if len(members) > 1:  # interleaved: MCU order
            mcu = 0
            for my in range(mcuy_b):
                for mx in range(mcux_b):
                    if restart_interval and mcu and mcu % restart_interval == 0:
                        reader.align()
                        m = struct.unpack_from(">H", content, reader.pos)[0]
                        if not (0xFFD0 <= m <= 0xFFD7):
                            raise ValueError("expected RSTn marker")
                        reader.pos += 2
                        preds[:] = [0] * len(members)
                        state["eobrun"] = 0
                    for mi, (ci, _td, _ta) in enumerate(members):
                        hi, vi, _nbh, _nbw = geom[ci]
                        for by in range(vi):
                            for bx in range(hi):
                                decode_block(
                                    mi, ci, my * vi + by, mx * hi + bx
                                )
                    mcu += 1
        else:  # non-interleaved: the component's own block raster
            ci = members[0][0]
            hi, vi, _nbh, _nbw = geom[ci]
            cw = -(-w * hi // hmax)
            chh = -(-h * vi // vmax)
            nbw_s, nbh_s = -(-cw // 8), -(-chh // 8)
            blk_n = 0
            for by in range(nbh_s):
                for bx in range(nbw_s):
                    if restart_interval and blk_n and blk_n % restart_interval == 0:
                        reader.align()
                        m = struct.unpack_from(">H", content, reader.pos)[0]
                        if not (0xFFD0 <= m <= 0xFFD7):
                            raise ValueError("expected RSTn marker")
                        reader.pos += 2
                        preds[:] = [0]
                        state["eobrun"] = 0
                    decode_block(0, ci, by, bx)
                    blk_n += 1
    except _MarkerHit:
        raise ValueError("JPEG entropy data ended early")
    # skip to the next marker (align; tolerate pad 0xFF fill bytes)
    p = reader.pos
    while p + 1 < len(content) and not (
        content[p] == 0xFF and content[p + 1] != 0x00
    ):
        p += 1
    return p


def _decode_jpeg_arith_scan(
    content: bytes,
    pos: int,
    size: int,
    body: bytes,
    sof,
    geom,
    coef,
    dc_cond: dict,
    ac_cond: dict,
    restart_interval: int,
    progressive: bool,
    differential: bool = False,
) -> int:
    """Arithmetic twin of ``_decode_jpeg_scan``: decode ONE SOF9/SOF10
    entropy-coded scan into the coefficient store and return the byte
    position of the following marker. Statistical models per T.81
    F.2.4 (sequential DC/AC) and G.2 (progressive first/refinement);
    statistics areas, DC contexts and predictors reset per scan and at
    every restart marker, where the QM decoder re-primes from the
    bytes after RSTn."""
    h, w, comps, hmax, vmax = sof
    ns = body[0]
    scan_sel = []
    for i in range(ns):
        cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
        scan_sel.append((cs, tdta >> 4, tdta & 0x0F))
    ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0x0F
    if not progressive:
        ss, se, ah, al = 0, 63, 0, 0
    idx_by_id = {cid: i for i, (cid, _hi, _vi, _tq) in enumerate(comps)}
    members = [(idx_by_id[cs], td, ta) for cs, td, ta in scan_sel]

    state: dict = {}

    def reset_state(at: int) -> None:
        state["dec"] = _ArithDecoder(content, at)
        state["dc"] = {td: bytearray(_DC_STAT_BINS) for _, td, _t in members}
        state["ac"] = {ta: bytearray(_AC_STAT_BINS) for _, _t, ta in members}
        state["fixed"] = bytearray([_FIXED_STATE])
        state["preds"] = [0] * len(members)
        state["ctx"] = [0] * len(members)

    reset_state(pos + 2 + size)

    def next_marker() -> int:
        dec = state["dec"]
        p = dec.marker_pos if dec.marker_pos is not None else dec.bp
        while p + 1 < len(content) and not (
            content[p] == 0xFF and content[p + 1] != 0x00
        ):
            p += 1
        return p

    def restart() -> None:
        p = next_marker()
        m = struct.unpack_from(">H", content, p)[0]
        if not (0xFFD0 <= m <= 0xFFD7):
            raise ValueError("expected RSTn marker")
        reset_state(p + 2)

    def ac_band(dec, st, fixed, blk, kx) -> None:
        """F.2.4.2 / G.2.2.2: sequential AC is the ss=1, al=0 case."""
        k = max(ss, 1)
        while k <= se:
            if dec.decode(st, 3 * (k - 1)):
                break  # end-of-block
            while dec.decode(st, 3 * (k - 1) + 1) == 0:
                k += 1
                if k > se:
                    raise ValueError("arithmetic AC index overflow")
            v = _arith_get_ac(dec, st, fixed, k, kx)
            blk[k] = v << al
            k += 1

    def ac_refine(dec, st, fixed, blk) -> None:
        """G.2.2.3: correction bits for known coefficients,
        significance decisions for zero-history slots, EOB decisions
        only past the previous scan's end-of-band."""
        p1, m1 = 1 << al, -1 << al
        kex = ss - 1
        for i in range(se, ss - 1, -1):
            if blk[i]:
                kex = i
                break
        k = ss
        while k <= se:
            if k > kex and dec.decode(st, 3 * (k - 1)):
                break
            while True:
                if blk[k]:
                    if dec.decode(st, 3 * (k - 1) + 2):
                        blk[k] += p1 if blk[k] > 0 else m1
                    break
                if dec.decode(st, 3 * (k - 1) + 1):
                    blk[k] = m1 if dec.decode(fixed, 0) else p1
                    break
                k += 1
                if k > se:
                    raise ValueError("arithmetic AC refine overflow")
            k += 1

    def decode_block(mi: int, ci: int, by: int, bx: int) -> None:
        _ci, td, ta = members[mi]
        dec, fixed = state["dec"], state["fixed"]
        blk = coef[ci][by, bx]
        if ss == 0:
            if ah == 0:
                l, u = dc_cond.get(td, (_ARITH_DC_L, _ARITH_DC_U))
                diff, ctx = _arith_get_dc(
                    dec, state["dc"][td], state["ctx"][mi], l, u
                )
                state["ctx"][mi] = ctx
                if differential:
                    blk[0] = diff << al
                else:
                    state["preds"][mi] += diff
                    blk[0] = state["preds"][mi] << al
            else:
                if dec.decode(fixed, 0):
                    blk[0] |= 1 << al
            if progressive:
                return
        kx = ac_cond.get(ta, _ARITH_AC_KX)
        if ah == 0:
            ac_band(dec, state["ac"][ta], fixed, blk, kx)
        else:
            ac_refine(dec, state["ac"][ta], fixed, blk)

    mcuy_b, mcux_b = -(-h // (8 * vmax)), -(-w // (8 * hmax))
    if len(members) > 1:  # interleaved: MCU order
        mcu = 0
        for my in range(mcuy_b):
            for mx in range(mcux_b):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    restart()
                for mi, (ci, _td, _ta) in enumerate(members):
                    hi, vi, _nbh, _nbw = geom[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            decode_block(mi, ci, my * vi + by, mx * hi + bx)
                mcu += 1
    else:  # non-interleaved: the component's own block raster
        ci = members[0][0]
        hi, vi, _nbh, _nbw = geom[ci]
        cw = -(-w * hi // hmax)
        chh = -(-h * vi // vmax)
        blk_n = 0
        for by in range(-(-chh // 8)):
            for bx in range(-(-cw // 8)):
                if restart_interval and blk_n and blk_n % restart_interval == 0:
                    restart()
                decode_block(0, ci, by, bx)
                blk_n += 1
    return next_marker()


def _reconstruct_jpeg(sof, geom, coef, qtabs, precision: int = 8) -> dict:
    """Dequantize + IDCT the accumulated coefficient store, crop each
    component to its nominal dims (T.81 A.1.1), replicate chroma up to
    full resolution, convert to RGB. 12-bit frames level-shift around
    2048, clamp to [0, 4095], and emit little-endian uint16 payloads."""
    h, w, comps, hmax, vmax = sof
    half = float(1 << (precision - 1))
    top = (1 << precision) - 1
    planes = []
    for ci, ((_cid, hi, vi, tq), (_ghi, _gvi, nbh, nbw)) in enumerate(
        zip(comps, geom)
    ):
        q = qtabs[tq]
        blocks = coef[ci]
        plane = np.zeros((nbh * 8, nbw * 8), dtype=np.float64)
        for by in range(nbh):
            for bx in range(nbw):
                natural = np.empty(64, dtype=np.int64)
                natural[_ZIGZAG] = blocks[by, bx]
                deq = (natural * q).reshape(8, 8)
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _DCT.T @ deq.astype(np.float64) @ _DCT + half
                )
        ch_, cw_ = -(-h * vi // vmax), -(-w * hi // hmax)
        plane = plane[:ch_, :cw_]
        if (hi, vi) != (hmax, vmax):
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )
        planes.append(plane[:h, :w])
    if len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - half)
        g = y - 0.344136 * (cb - half) - 0.714136 * (cr - half)
        b = y + 1.772 * (cb - half)
        px = np.stack([r, g, b], axis=-1)
    else:
        px = planes[0][..., None]
    px = np.clip(np.round(px), 0, top).astype(
        np.uint8 if precision <= 8 else "<u2"
    )
    return {
        "kind": "image",
        "width": w,
        "height": h,
        "sample_rate": 0,
        "payload": px.tobytes(),
    }



# ---------------------------------------------------------------------------
# Lossless JPEG (SOF3, T.81 process 14 / Annex H): predictive DPCM, no
# DCT and no color transform — the archival/medical-imaging JPEG
# variant (and the base of DNG raws). The decoder below shares the
# bit reader / Huffman machinery with the DCT path; differences are
# coded exactly like DC coefficients (category + EXTEND bits), with
# SSSS=16 meaning a difference of 32768 carried with no extra bits,
# and all arithmetic modulo 2^16 (T.81 H.1.2.1).
# ---------------------------------------------------------------------------

_LL_PRED_DEFAULT = 0  # sentinel index; real default is 1 << (P - Pt - 1)


def _ll_predict(
    row: np.ndarray,
    prev: np.ndarray | None,
    x: int,
    psel: int,
    default: int,
    fresh: bool,
) -> int:
    """One sample's prediction (T.81 H.1.1). `fresh` marks the first
    sample after start-of-scan / restart: it takes the default; the
    rest of that first line uses Ra; the first sample of later lines
    uses Rb; everything else uses the selected predictor."""
    if fresh:
        return default
    if prev is None:  # first line: Ra
        return int(row[x - 1])
    if x == 0:  # first column: Rb
        return int(prev[0])
    ra, rb, rc = int(row[x - 1]), int(prev[x]), int(prev[x - 1])
    if psel == 1:
        return ra
    if psel == 2:
        return rb
    if psel == 3:
        return rc
    if psel == 4:
        return ra + rb - rc
    if psel == 5:
        return ra + ((rb - rc) >> 1)
    if psel == 6:
        return rb + ((ra - rc) >> 1)
    if psel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"invalid lossless predictor {psel}")


def _ll_predict2d(
    g: np.ndarray, r: int, x: int, psel: int, default: int
) -> int:
    """H.1.1 prediction on a component's own 2-D sample grid (the
    subsampled-interleave path; no restart support there, so the
    scan-start rules are purely positional)."""
    if r == 0 and x == 0:
        return default
    if r == 0:
        return int(g[0, x - 1])  # first line: Ra
    if x == 0:
        return int(g[r - 1, 0])  # first column: Rb
    ra, rb, rc = int(g[r, x - 1]), int(g[r - 1, x]), int(g[r - 1, x - 1])
    if psel == 1:
        return ra
    if psel == 2:
        return rb
    if psel == 3:
        return rc
    if psel == 4:
        return ra + rb - rc
    if psel == 5:
        return ra + ((rb - rc) >> 1)
    if psel == 6:
        return rb + ((ra - rc) >> 1)
    if psel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"invalid lossless predictor {psel}")


def _decode_lossless_scan_sampled(
    content: bytes,
    pos: int,
    size: int,
    body: bytes,
    sof,
    samples: np.ndarray,
    huff,
    restart_interval: int,
    precision: int,
    differential: bool = False,
) -> int:
    """Lossless scan decode for SUBSAMPLED frames (T.81 A.2): the MCU
    carries hi x vi samples per member from each component's OWN grid
    (yc = ceil(h*vi/vmax), xc = ceil(w*hi/hmax)), padded up to whole
    MCUs (pad samples are coded but discarded). Prediction runs on the
    component grid; in ``differential`` frames (SOF7 inside a
    hierarchy, round 10) there is NO prediction — the coded values are
    the raw mod-2^16 residuals. Grids land top-left in `samples`; the
    frame finish replicates them up to full resolution."""
    h, w, comps, hmax, vmax = sof
    ns = body[0]
    members = []
    for i in range(ns):
        cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
        ci = next(j for j, c in enumerate(comps) if c[0] == cs)
        members.append((ci, tdta >> 4))
    psel = body[1 + 2 * ns]
    pt = body[3 + 2 * ns] & 0x0F
    default = 1 << (precision - pt - 1)
    mask = (1 << 16) - 1
    out_mask = (1 << precision) - 1

    if ns > 1:
        mcuy, mcux = -(-h // vmax), -(-w // hmax)
        shapes = [(comps[ci][2], comps[ci][1]) for ci, _ in members]
    else:
        ci0 = members[0][0]
        yc0 = -(-h * comps[ci0][2] // vmax)
        xc0 = -(-w * comps[ci0][1] // hmax)
        mcuy, mcux = yc0, xc0
        shapes = [(1, 1)]
    grids = [
        np.zeros((mcuy * vi, mcux * hi), dtype=np.int64)
        for (vi, hi) in shapes
    ]

    reader = _BitReader(content, pos + 2 + size)
    # restart convention (round 10): byte-align into RSTn every Ri
    # MCUs, each member's NEXT sample takes the default prediction —
    # the encoder twin writes the same convention, pinned by tests
    fresh = [False] * len(members)
    since_restart = 0
    rst_expect = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and since_restart
                and since_restart % restart_interval == 0
            ):
                reader.align()
                p_ = reader.pos
                if not (
                    content[p_] == 0xFF
                    and content[p_ + 1] == 0xD0 + (rst_expect % 8)
                ):
                    raise ValueError(
                        "expected RSTn marker in lossless scan"
                    )
                reader.pos = p_ + 2
                rst_expect += 1
                fresh = [True] * len(members)
                since_restart = 0
            since_restart += 1
            for m, (ci, td) in enumerate(members):
                vi, hi = shapes[m]
                table = huff[(0, td)]
                g = grids[m]
                for by in range(vi):
                    for bx in range(hi):
                        cat = _huff_read(reader, table)
                        if cat == 16:
                            diff = 32768
                        elif cat == 0:
                            diff = 0
                        else:
                            diff = _extend(reader.bits(cat), cat)
                        r_, x_ = my * vi + by, mx * hi + bx
                        if differential:
                            pred = 0
                        elif fresh[m]:
                            pred = default
                            fresh[m] = False
                        else:
                            pred = _ll_predict2d(g, r_, x_, psel, default)
                        g[r_, x_] = (pred + diff) & mask
    for m, (ci, _td) in enumerate(members):
        yc = -(-h * comps[ci][2] // vmax)
        xc = -(-w * comps[ci][1] // hmax)
        samples[:yc, :xc, ci] = (grids[m][:yc, :xc] << pt) & out_mask
    # skip to the next marker (EOI or the next segment)
    p = reader.pos
    while p + 1 < len(content) and not (
        content[p] == 0xFF and content[p + 1] not in (0x00,)
        and not 0xD0 <= content[p + 1] <= 0xD7
    ):
        p += 1
    return p


def _decode_lossless_scan(
    content: bytes,
    pos: int,
    size: int,
    body: bytes,
    sof,
    samples: np.ndarray,
    huff,
    restart_interval: int,
    precision: int,
    differential: bool = False,
) -> int:
    """Decode one SOF3 scan into `samples` (h, w, nf). Interleaved when
    Ns > 1 (MCU = one sample per component); returns the position after
    the entropy-coded segment. In `differential` mode (SOF7, Annex J)
    there is NO sample prediction — the coded values are mod-2^16
    differences against the expanded reference, stored raw for the
    caller to add."""
    h, w, comps, _hm, _vm = sof
    if (_hm, _vm) != (1, 1):  # round 8: subsampled frames (T.81 A.2)
        return _decode_lossless_scan_sampled(
            content, pos, size, body, sof, samples, huff,
            restart_interval, precision, differential,
        )
    ns = body[0]
    members = []
    for i in range(ns):
        cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
        ci = next(j for j, c in enumerate(comps) if c[0] == cs)
        members.append((ci, tdta >> 4))
    psel = body[1 + 2 * ns]  # Ss = predictor selector
    pt = body[3 + 2 * ns] & 0x0F  # Al = point transform
    default = 1 << (precision - pt - 1)
    mask = (1 << 16) - 1

    reader = _BitReader(content, pos + 2 + size)
    # decoded rows per member component (values AFTER the point
    # transform; the shift back happens at the end)
    rows: list[np.ndarray] = [np.zeros(w, dtype=np.int64) for _ in members]
    prevs: list[np.ndarray | None] = [None] * len(members)
    fresh = [True] * len(members)
    since_restart = 0
    rst_expect = 0
    for y in range(h):
        for x in range(w):
            if (
                restart_interval
                and since_restart
                and since_restart % restart_interval == 0
            ):
                reader.align()
                p = reader.pos
                if not (
                    content[p] == 0xFF
                    and content[p + 1] == 0xD0 + (rst_expect % 8)
                ):
                    raise ValueError("expected RSTn marker in lossless scan")
                reader.pos = p + 2
                rst_expect += 1
                fresh = [True] * len(members)
                prevs = [None] * len(members)
                since_restart = 0
            for m, (ci, td) in enumerate(members):
                table = huff[(0, td)]
                cat = _huff_read(reader, table)
                if cat == 16:
                    diff = 32768
                elif cat == 0:
                    diff = 0
                else:
                    diff = _extend(reader.bits(cat), cat)
                if differential:
                    pred = 0
                else:
                    pred = _ll_predict(
                        rows[m], prevs[m], x, psel, default, fresh[m]
                    )
                val = (pred + diff) & mask
                rows[m][x] = val
                fresh[m] = False
            since_restart += 1
        for m, (ci, _td) in enumerate(members):
            if differential:
                # raw mod-2^16 differences; precision mask applies only
                # after the caller adds the reference (J.1.1.4)
                samples[y, :, ci] = (rows[m] << pt) & mask
            else:
                samples[y, :, ci] = (rows[m] << pt) & ((1 << precision) - 1)
            prevs[m] = rows[m].copy()
    # skip to the next marker (EOI or the next segment)
    p = reader.pos
    while p + 1 < len(content) and not (
        content[p] == 0xFF and content[p + 1] not in (0x00,)
        and not 0xD0 <= content[p + 1] <= 0xD7
    ):
        p += 1
    return p


# a single canonical Huffman book over difference categories 0..16:
# 15 five-bit codes (cats 0-14) + 2 six-bit codes (cats 15, 16).
_HUFF_LL = ([0, 0, 0, 0, 15, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            list(range(17)))


def _pixels_to_jpeg_lossless(
    arr: np.ndarray,
    predictor: int = 1,
    pt: int = 0,
    precision: int | None = None,
    restart_interval: int = 0,
    sampling: list[tuple[int, int]] | None = None,
) -> bytes:
    """GENUINE lossless-JPEG (SOF3) encoder for (h, w) or (h, w, c)
    integer arrays: per-component DPCM with the selected predictor,
    point transform `pt`, differences Huffman-coded as DC categories,
    optional DRI/RSTn with prediction resets. Components are stored
    directly (the lossless process has no color transform), so decode
    returns the EXACT input samples — the property q401 oracles.

    Restart convention (T.81 H.2.3): a restart reinitializes prediction
    as at start of scan — the first sample after RSTn takes the
    2^(P-Pt-1) default and the remainder of that row region predicts
    with Ra; row context (Rb/Rc) rebuilds from the full previous row
    once a new row completes. Encoder and decoder implement the same
    convention and it is pinned by round-trip tests."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if precision is None:
        precision = 8 if arr.dtype == np.uint8 else 16
    if not 1 <= predictor <= 7:
        raise ValueError("lossless predictor must be 1..7")
    default = 1 << (precision - pt - 1)
    mask = (1 << 16) - 1
    codes = _huff_codes(*_HUFF_LL)
    if sampling is not None and any(s != (1, 1) for s in sampling):
        return _pixels_to_jpeg_lossless_sampled(
            arr, predictor, pt, precision, restart_interval, sampling,
            default, mask, codes,
        )
    writer = _BitWriter()
    scan = bytearray()
    shifted = (arr.astype(np.int64) >> pt)
    prevs: list[np.ndarray | None] = [None] * nc
    rows = [np.zeros(w, dtype=np.int64) for _ in range(nc)]
    fresh = [True] * nc
    since_restart = 0
    rst = 0
    for y in range(h):
        for x in range(w):
            if (
                restart_interval
                and since_restart
                and since_restart % restart_interval == 0
            ):
                scan += writer.flush()
                scan += bytes([0xFF, 0xD0 + (rst % 8)])
                writer = _BitWriter()
                rst += 1
                fresh = [True] * nc
                prevs = [None] * nc
                since_restart = 0
            for c in range(nc):
                pred = _ll_predict(
                    rows[c], prevs[c], x, predictor, default, fresh[c]
                )
                val = int(shifted[y, x, c])
                rows[c][x] = val
                fresh[c] = False
                d = (val - pred) & mask
                if d == 32768:
                    cat = 16
                    code, ln = codes[16]
                    writer.write(code, ln)
                else:
                    sd = d - 65536 if d > 32768 else d
                    cat = abs(sd).bit_length()
                    code, ln = codes[cat]
                    writer.write(code, ln)
                    if cat:
                        amp = sd if sd >= 0 else sd + (1 << cat) - 1
                        writer.write(amp, cat)
            since_restart += 1
        for c in range(nc):
            prevs[c] = rows[c].copy()
    scan += writer.flush()

    def seg(marker: int, b: bytes) -> bytes:
        return struct.pack(">HH", marker, len(b) + 2) + b

    out = bytearray(b"\xff\xd8")
    comps = b"".join(
        struct.pack("BBB", c + 1, 0x11, 0) for c in range(nc)
    )
    out += seg(0xFFC3, struct.pack(">BHHB", precision, h, w, nc) + comps)
    bits, vals = _HUFF_LL
    out += seg(0xFFC4, b"\x00" + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([nc]) + b"".join(
        bytes([c + 1, 0x00]) for c in range(nc)
    ) + bytes([predictor, 0, pt])
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


def _pixels_to_jpeg_lossless_sampled(
    arr: np.ndarray,
    predictor: int,
    pt: int,
    precision: int,
    restart_interval: int,
    sampling: list[tuple[int, int]],
    default: int,
    mask: int,
    codes,
) -> bytes:
    """SUBSAMPLED lossless SOF3 (round 8; T.81 A.2 interleave): each
    component is decimated top-left to its own grid (yc = ceil(h*vi/
    vmax), xc = ceil(w*hi/hmax)), edge-replicated up to whole MCUs,
    and coded MCU-interleaved (hi x vi samples per component per MCU)
    with H.1.1 prediction running on the component grid. The decoder
    replicates grids back up to (h, w), so the roundtrip contract is
    payload[y, x, c] = source[y - y % (vmax/vi), x - x % (hmax/hi), c]
    — exact, and SQL-expressible for the q401 oracle."""
    h, w, nc = arr.shape
    if len(sampling) != nc:
        raise ValueError("sampling needs one (hi, vi) per component")
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    for hi, vi in sampling:
        if hmax % hi or vmax % vi:
            raise ValueError("non-integer sampling ratio")
    shifted = arr.astype(np.int64) >> pt
    mcuy, mcux = -(-h // vmax), -(-w // hmax)
    grids = []
    for c, (hi, vi) in enumerate(sampling):
        plane = shifted[:: vmax // vi, :: hmax // hi, c]
        yc, xc = plane.shape
        g = np.zeros((mcuy * vi, mcux * hi), dtype=np.int64)
        g[:yc, :xc] = plane
        if xc < g.shape[1]:  # edge-replicate the MCU padding
            g[:yc, xc:] = g[:yc, xc - 1 : xc]
        if yc < g.shape[0]:
            g[yc:, :] = g[yc - 1 : yc, :]
        grids.append(g)

    # restart convention for the SAMPLED interleave (round 10, pinned
    # by round-trip tests like the 1-D path's): every Ri MCUs the
    # entropy stream byte-aligns into RSTn and each component's NEXT
    # coded sample takes the default prediction; later samples resume
    # the normal 2-D neighbor rules
    scan_bytes = bytearray()
    writer = _BitWriter()
    fresh = [False] * nc
    since_restart = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and since_restart
                and since_restart % restart_interval == 0
            ):
                scan_bytes += writer.flush()
                scan_bytes += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                writer = _BitWriter()
                fresh = [True] * nc
                since_restart = 0
            since_restart += 1
            for c, (hi, vi) in enumerate(sampling):
                g = grids[c]
                for by in range(vi):
                    for bx in range(hi):
                        r_, x_ = my * vi + by, mx * hi + bx
                        if fresh[c]:
                            pred = default
                            fresh[c] = False
                        else:
                            pred = _ll_predict2d(
                                g, r_, x_, predictor, default
                            )
                        d = (int(g[r_, x_]) - pred) & mask
                        if d == 32768:
                            code, ln = codes[16]
                            writer.write(code, ln)
                        else:
                            sd = d - 65536 if d > 32768 else d
                            cat = abs(sd).bit_length()
                            code, ln = codes[cat]
                            writer.write(code, ln)
                            if cat:
                                amp = sd if sd >= 0 else sd + (1 << cat) - 1
                                writer.write(amp, cat)

    def seg(marker: int, b: bytes) -> bytes:
        return struct.pack(">HH", marker, len(b) + 2) + b

    out = bytearray(b"\xff\xd8")
    comps = b"".join(
        struct.pack("BBB", c + 1, (hi << 4) | vi, 0)
        for c, (hi, vi) in enumerate(sampling)
    )
    out += seg(0xFFC3, struct.pack(">BHHB", precision, h, w, nc) + comps)
    bits, vals = _HUFF_LL
    out += seg(0xFFC4, b"\x00" + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([nc]) + b"".join(
        bytes([c + 1, 0x00]) for c in range(nc)
    ) + bytes([predictor, 0, pt])
    out += seg(0xFFDA, sos)
    out += bytes(scan_bytes)
    out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _decode_wav(content: bytes) -> dict:
    """GENUINE decoder: PCM RIFF/WAVE, pure struct/bytes. Walks the
    chunk list (fmt / data may be preceded by LIST etc.), validates
    PCM, returns the raw sample bytes as the payload. width/height
    carry channels/bits-per-sample (the schema's image slots double as
    the audio geometry; documented in DECODED_SCHEMA users)."""
    if len(content) < 12 or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, fmt, data, fact_samples = 12, None, None, None
    while pos + 8 <= len(content):
        cid, size = struct.unpack_from("<4sI", content, pos)
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        elif cid == b"fact" and size >= 4:
            (fact_samples,) = struct.unpack_from("<I", body, 0)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, _byte_rate, _align, bits = fmt
    if audio_format == 0x11:  # IMA/DVI ADPCM -> 16-bit linear
        data = _ima_adpcm_decode(
            data, _align, fact_samples, channels
        ).tobytes()
        bits = 16
    elif audio_format in (6, 7):  # G.711 A-law / mu-law -> 16-bit linear
        lut = _ALAW_LUT if audio_format == 6 else _ULAW_LUT
        data = (
            lut[np.frombuffer(data, dtype=np.uint8)].astype("<i2").tobytes()
        )
        bits = 16
    elif audio_format != 1:
        raise NotImplementedError(
            f"only PCM and G.711 WAV are supported (format tag "
            f"{audio_format})"
        )
    return {
        "kind": "audio",
        "width": channels,
        "height": bits,
        "sample_rate": sample_rate,
        "payload": data,
    }


def _ulaw2linear(u: int) -> int:
    """ITU-T G.711 mu-law expansion (the CCITT reference formula)."""
    u = ~u & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return 0x84 - t if u & 0x80 else t - 0x84


def _alaw2linear(a: int) -> int:
    """ITU-T G.711 A-law expansion (the CCITT reference formula)."""
    a ^= 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if a & 0x80 else -t


_ULAW_LUT = np.array([_ulaw2linear(i) for i in range(256)], dtype=np.int16)
_ALAW_LUT = np.array([_alaw2linear(i) for i in range(256)], dtype=np.int16)


# ---------------------------------------------------------------------------
# GIF (GIF87a/GIF89a): genuine from-scratch codec — variable-width LZW
# with clear/EOI codes and 12-bit dictionary cap, interlace passes,
# 89a extensions (GCE transparency/delay, NETSCAPE loop), multi-frame
# compositing for animations. Encoder AND decoder, so every stream in
# the tests round-trips and the q414 oracle can recompute the full
# decoded payload md5 in SQL (lossless, q401-strength).
# Width-growth convention (the classic off-by-one pair): the encoder
# grows when the next free slot EXCEEDS 2^width (it may emit the entry
# it just added — the KwKwK continuation); the decoder, whose table
# lags one entry behind, grows when its next free slot REACHES
# 2^width. The LZW unit battery drives both through dictionary
# overflow, mid-stream clears, and the full 9->12-bit ladder.
# ---------------------------------------------------------------------------


def _lzw_compress(data: bytes, mcs: int) -> bytes:
    """GIF LZW: ``data`` are palette indices < 2**mcs; returns the
    code stream (caller sub-blocks it)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> tuple[dict, int, int, int]:
        return (
            {bytes([i]): i for i in range(1 << mcs)},
            eoi + 1,
            mcs + 1,
            eoi + 1,
        )

    # Width growth counts CODES, not table entries (the giflib-lineage
    # convention): rc advances on every data code on BOTH sides, so
    # encoder and decoder grow at identical stream positions even at
    # the segment tail, where the final data code and the EOI follow
    # an entry the decoder adds one code later than the encoder did.
    table, next_slot, width, rc = fresh()
    emit(clear, width)

    def emit_data(code: int) -> None:
        nonlocal width, rc
        emit(code, width)
        rc += 1
        if rc > (1 << width) and width < 12:
            width += 1

    cur = b""
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit_data(table[cur])
        if next_slot == 4096:  # dictionary full: reset both sides
            emit(clear, width)
            table, next_slot, width, rc = fresh()
        else:
            table[nxt] = next_slot
            next_slot += 1
        cur = bytes([b])
    if cur:
        emit_data(table[cur])
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, mcs: int) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    pos = nbits = acc = 0

    def read(width: int) -> int:
        nonlocal pos, nbits, acc
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
    next_slot, width, rc = eoi + 1, mcs + 1, eoi + 1
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
            next_slot, width, rc = eoi + 1, mcs + 1, eoi + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < next_slot:
            entry = table[code]
        elif code == next_slot:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        if prev is not None and next_slot < 4096:
            table.append(prev + entry[:1])
            next_slot += 1
        # code-counting growth — mirrors the encoder exactly
        rc += 1
        if rc > (1 << width) and width < 12:
            width += 1
        prev = entry


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step) passes


def _gif_row_order(h: int) -> list[int]:
    return [r for start, step in _GIF_INTERLACE for r in range(start, h, step)]


def _pixels_to_gif(
    idx: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    frames: list[tuple] | None = None,
) -> bytes:
    """Indexed (h, w) uint8 image + (n<=256, 3) palette -> GIF bytes.
    ``frames`` switches to GIF89a animation: a list of
    (idx, left, top, delay_cs, transparent_or_None) drawn over the
    first image in order (disposal 1)."""
    h, w = idx.shape
    n = len(palette)
    bits = max((n - 1).bit_length(), 1)
    gct = np.zeros((1 << bits, 3), dtype=np.uint8)
    gct[:n] = palette
    mcs = max(bits, 2)  # LZW minimum code size must be >= 2

    def image_block(
        arr: np.ndarray, left: int, top: int, ilace: bool
    ) -> bytes:
        ih, iw = arr.shape
        rows = _gif_row_order(ih) if ilace else range(ih)
        seq = b"".join(arr[r].tobytes() for r in rows)
        blk = struct.pack(
            "<BHHHHB", 0x2C, left, top, iw, ih, 0x40 if ilace else 0x00
        )
        blk += bytes([mcs])
        lzw = _lzw_compress(seq, mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            blk += bytes([len(chunk)]) + chunk
        return blk + b"\x00"

    animated = bool(frames)
    out = bytearray(b"GIF89a" if animated else b"GIF87a")
    out += struct.pack(
        "<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0
    )
    out += gct.tobytes()
    if animated:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
        out += image_block(idx, 0, 0, interlace)
        for farr, left, top, delay, transparent in frames:
            tf = 0x01 if transparent is not None else 0x00
            out += struct.pack(
                "<BBBBHBB", 0x21, 0xF9, 4, (1 << 2) | tf, delay,
                transparent or 0, 0,
            )
            out += image_block(farr, left, top, False)
    else:
        out += image_block(idx, 0, 0, interlace)
    out += b"\x3b"
    return bytes(out)


def _decode_gif(content: bytes) -> dict:
    """GIF87a/89a -> RGB payload: single images decode directly;
    animations composite every frame over the canvas (disposal
    draw-over, transparency honored) and return the FINAL canvas, with
    frame count in sample_rate (frames stand in for the time axis the
    schema's sample_rate carries for audio). Disposal-to-background /
    restore-previous are the documented boundary."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        ncol = 2 << (flags & 0x07)
        gct = np.frombuffer(
            content, dtype=np.uint8, count=ncol * 3, offset=pos
        ).reshape(ncol, 3)
        pos += ncol * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:, :] = gct[0]
    n_frames = 0
    transparent: int | None = None
    while pos < len(content):
        b0 = content[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = content[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                sz = content[pos]
                packed = content[pos + 1]
                disposal = (packed >> 2) & 0x07
                if disposal > 1:
                    raise NotImplementedError(
                        "GIF disposal-to-background/restore-previous"
                    )
                transparent = (
                    content[pos + 4] if packed & 0x01 else None
                )
                pos += sz + 1
            while content[pos] != 0:  # remaining sub-blocks
                pos += content[pos] + 1
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        left, top, iw, ih, iflags = struct.unpack_from("<HHHHB", content, pos + 1)
        pos += 10
        pal = gct
        if iflags & 0x80:  # local color table
            ncol = 2 << (iflags & 0x07)
            pal = np.frombuffer(
                content, dtype=np.uint8, count=ncol * 3, offset=pos
            ).reshape(ncol, 3)
            pos += ncol * 3
        if pal is None:
            raise ValueError("GIF image without any color table")
        mcs = content[pos]
        pos += 1
        lzw = bytearray()
        while content[pos] != 0:
            ln = content[pos]
            lzw += content[pos + 1 : pos + 1 + ln]
            pos += ln + 1
        pos += 1
        seq = _lzw_decompress(bytes(lzw), mcs)
        if len(seq) < iw * ih:
            raise ValueError("GIF frame pixel data short")
        arr = np.frombuffer(seq[: iw * ih], dtype=np.uint8).reshape(ih, iw)
        if iflags & 0x40:  # deinterlace
            un = np.empty_like(arr)
            un[_gif_row_order(ih)] = arr
            arr = un
        region = canvas[top : top + ih, left : left + iw]
        if transparent is not None:
            mask = arr != transparent
            region[mask] = pal[arr[mask]]
        else:
            region[:, :] = pal[arr]
        n_frames += 1
        transparent = None
    return {
        "kind": "image" if n_frames <= 1 else "video",
        "width": w,
        "height": h,
        "sample_rate": None if n_frames <= 1 else n_frames,
        "payload": canvas.tobytes(),
    }


def _decode_payload(content: bytes) -> dict:
    """Container dispatch. Three GENUINE pure-Python decoders (no codec
    libs needed): uncompressed BMP images, zlib-inflated PNG images,
    and PCM WAV audio — real bytes from real encoders decode
    end-to-end. The LUXM fake container covers the formats whose
    decoders genuinely need external libraries (JPEG/MP3/MP4): swapping
    in Pillow / libav changes only this dispatch, the distributed
    plumbing is identical. Foreign bytes raise, the way a real decoder
    raises on corrupt input."""
    if content[:4] == _MAGIC:
        magic, kind_id, w, h, sr = struct.unpack(
            _HEADER_FMT, content[:_HEADER_SIZE]
        )
        return {
            "kind": _KINDS[kind_id],
            "width": w,
            "height": h,
            "sample_rate": sr,
            "payload": content[_HEADER_SIZE:],
        }
    if content[:2] == b"BM":
        return _decode_bmp(content)
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(content)
    if content[:2] == b"\xff\xd8":
        return _decode_jpeg(content)
    if content[:4] == b"RIFF":
        if content[8:12] == b"AVI ":
            return _decode_avi(content)
        if content[8:12] == b"WEBP":
            return _decode_webp(content)
        return _decode_wav(content)
    if content[:4] == b"GIF8":
        return _decode_gif(content)
    if content[:4] == b"fLaC":
        return _decode_flac(content)
    if content[:2] in (b"II", b"MM") and len(content) >= 4:
        bo = "<" if content[:2] == b"II" else ">"
        if struct.unpack_from(f"{bo}H", content, 2)[0] == 42:
            return _decode_tiff(content)
    raise NotImplementedError(
        "undecodable media container: expected LUXM, BMP, PNG, JPEG, "
        "GIF, TIFF, or RIFF/WAVE (MP3/MP4 need codec libraries absent "
        "here)"
    )


def decode_media(media: DataFrame) -> DataFrame:
    """content BINARY -> typed decode columns, partition-parallel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = _decode_payload(bytes(content))
                out.append(
                    {
                        "media_id": int(mid),
                        "kind": d["kind"],
                        "width": d["width"],
                        "height": d["height"],
                        "sample_rate": d["sample_rate"],
                        "payload_bytes": len(d["payload"]),
                        "checksum": int(
                            np.frombuffer(
                                d["payload"].ljust(8, b"\0")[:8], dtype="<u8"
                            )[0]
                        )
                        & 0x7FFFFFFFFFFFFFFF,
                    }
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(run, DECODED_SCHEMA)


def decode_media_digest(media: DataFrame) -> DataFrame:
    """media_id + geometry + md5 of the FULL decoded payload: the
    cross-entropy-coder identity queries (q411/q412) decode the same
    source through two independent entropy paths (Huffman vs QM
    arithmetic) and assert the digests match pixel-for-pixel."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = _decode_payload(bytes(content))
                out.append(
                    {
                        "media_id": int(mid),
                        "width": d["width"],
                        "height": d["height"],
                        "payload_bytes": len(d["payload"]),
                        "payload_md5": hashlib.md5(d["payload"]).hexdigest(),
                    }
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        run,
        "media_id long, width int, height int, payload_bytes long, "
        "payload_md5 string",
    )


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Deterministic fake feature extraction: seeded random projection
    of payload byte histograms -> array<float>. Stands in for a vision/
    audio encoder; batch shape and schema are the real contract."""
    rng = np.random.default_rng(1234)
    proj = rng.standard_normal((256, dim)).astype(np.float32)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, mids, kinds = [], [], []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                payload = bytes(content)[_HEADER_SIZE:]
                hist = np.bincount(
                    np.frombuffer(payload, dtype=np.uint8), minlength=256
                ).astype(np.float32)
                denom = max(len(payload), 1)
                feats.append((hist / denom) @ proj)
                mids.append(int(mid))
                kinds.append(kind)
            yield pd.DataFrame(
                {"media_id": mids, "kind": kinds, "features": [f.tolist() for f in feats]}
            )

    return media.select("media_id", "kind", "content").mapInPandas(
        run, FEATURES_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Deterministic frame sampling over video payloads: fixed-stride
    offsets, one row per sampled frame (the explode-shaped output a real
    frame sampler produces)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                if kind != "video":
                    continue
                payload_len = len(bytes(content)) - _HEADER_SIZE
                for i in range(min(max_frames, payload_len // every_n_bytes)):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": i,
                            "frame_offset": _HEADER_SIZE + i * every_n_bytes,
                            "frame_bytes": every_n_bytes,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "frame_offset", "frame_bytes"],
            )

    return media.select("media_id", "kind", "content").mapInPandas(
        run, FRAMES_SCHEMA
    )


# ---------------------------------------------------------------------------
# GENUINE image resize + audio feature extraction (no codec libraries):
# BMP pixels and PCM samples are plain numpy arrays once the container
# is parsed, so nearest-neighbor resampling and FFT band energies are
# real implementations, not stubs. Both run map-side via mapInPandas —
# the 100 TB shape: linear in media bytes, zero shuffle.
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = "media_id long, width int, height int, content binary"

AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_samples long, duration_sec double, rms double, "
    "zcr double, peak int, band_energy array<float>"
)


def _bmp_pixels(content: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP into an (h, w, 3) uint8
    array (channel order as stored: BGR), honoring bottom-up rows and
    the 4-byte-aligned stride."""
    pixel_offset, = struct.unpack_from("<I", content, 10)
    _dib, width, height = struct.unpack_from("<Iii", content, 14)
    _planes, bpp = struct.unpack_from("<HH", content, 26)
    compression, = struct.unpack_from("<I", content, 30)
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError("only uncompressed 24/32-bit BMPs")
    ch = bpp // 8
    stride = (width * ch + 3) & ~3
    h = abs(height)
    raw = np.frombuffer(
        content, dtype=np.uint8, count=stride * h, offset=pixel_offset
    ).reshape(h, stride)
    arr = raw[:, : width * ch].reshape(h, width, ch)[:, :, :3]
    if height > 0:  # bottom-up storage -> flip to top-down
        arr = arr[::-1]
    return arr


def _tile_text_pixels(text, h: int, w: int) -> np.ndarray:
    """(h, w, 3) uint8 pixel block tiling the utf-8 bytes of ``text``.

    Empty/NULL text is an EXPLICIT case: all-zero pixels (the natural
    empty image), not a silent ``" "`` sentinel — any oracle that
    recomputes pixel content from the raw text can mirror this with a
    trivial CASE, whereas a hidden space substitution diverges from
    every function of the true text (round-6 verdict item 8; same
    class as the round-5 gif/g711 md5 fix)."""
    payload = (text or "").encode("utf-8")
    need = h * w * 3
    if not payload:
        return np.zeros((h, w, 3), dtype=np.uint8)
    tiled = np.frombuffer(payload, dtype=np.uint8)
    reps = need // len(tiled) + 1
    return np.tile(tiled, reps)[:need].reshape(h, w, 3)


def _pixels_to_bmp(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a 24-bit bottom-up BMP."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1].reshape(h, w * 3)
    pixels = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + dib + pixels


def resize_images(
    media: DataFrame, out_w: int = 32, out_h: int = 32
) -> DataFrame:
    """GENUINE nearest-neighbor image resize over BMP BINARY columns:
    decode -> numpy integer-grid index sample -> re-encode as BMP.
    Non-BMP rows are skipped (a real thumbnailing stage filters on
    container type the same way)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                if raw[:2] != b"BM":
                    continue
                arr = _bmp_pixels(raw)
                h, w = arr.shape[:2]
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                resized = arr[yi][:, xi]
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": out_w,
                        "height": out_h,
                        "content": _pixels_to_bmp(resized),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "content"]
            )

    return media.select("media_id", "content").mapInPandas(run, RESIZED_SCHEMA)


def audio_features(media: DataFrame, n_bands: int = 8) -> DataFrame:
    """GENUINE audio feature extraction from PCM WAV bytes: int16
    samples -> RMS energy, zero-crossing rate, peak amplitude, and
    n_bands equal-width FFT band-energy fractions (numpy rFFT — a real
    spectral feature, the first stage of every audio fingerprint /
    speech-quality filter). Multi-channel audio is mixed to mono first.
    Non-WAV rows are skipped."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                if raw[:4] != b"RIFF":
                    continue
                d = _decode_wav(raw)
                channels, bits = d["width"], d["height"]
                if bits != 16:
                    raise NotImplementedError("only 16-bit PCM supported")
                samples = np.frombuffer(d["payload"], dtype="<i2")
                if channels > 1:
                    samples = samples[: len(samples) // channels * channels]
                    samples = (
                        samples.reshape(-1, channels).mean(axis=1)
                    ).astype(np.float64)
                else:
                    samples = samples.astype(np.float64)
                n = len(samples)
                if n == 0:
                    continue
                x = samples / 32768.0
                rms = float(np.sqrt(np.mean(x * x)))
                zcr = (
                    float(np.mean(np.abs(np.diff(np.signbit(x)))))
                    if n > 1
                    else 0.0
                )
                peak = int(np.max(np.abs(samples)))
                spec = np.abs(np.fft.rfft(x)) ** 2
                total = float(spec.sum()) or 1.0
                edges = np.linspace(0, len(spec), n_bands + 1).astype(int)
                bands = [
                    float(spec[edges[i]: edges[i + 1]].sum() / total)
                    for i in range(n_bands)
                ]
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_samples": n,
                        "duration_sec": n / float(d["sample_rate"]),
                        "rms": rms,
                        "zcr": zcr,
                        "peak": peak,
                        "band_energy": np.asarray(bands, dtype=np.float32),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_samples", "duration_sec", "rms",
                    "zcr", "peak", "band_energy",
                ],
            )

    return media.select("media_id", "content").mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
    )


def synth_bmp_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Real-encoder BMP synthesis from the documents fixture: per doc a
    genuine 24-bit BMP whose dims derive from doc_id and whose pixels
    tile the text bytes. Real container in, real container out — the
    resize pipeline (q276) runs on encoder-faithful bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                w = (int(doc_id) % 8 + 1) * 4
                h = (int(doc_id) % 6 + 1) * 4
                arr = _tile_text_pixels(text, h, w)
                rows.append(
                    {
                        "media_id": int(doc_id),
                        "orig_w": w,
                        "orig_h": h,
                        "content": _pixels_to_bmp(arr),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, orig_w int, orig_h int, content binary"
    )


def synth_wav_table(docs: DataFrame, clean_col: str = "clean") -> DataFrame:
    """Real-encoder PCM WAV synthesis: 16-bit mono 8 kHz samples
    derived from the printable-ASCII characters of the text
    (sample_i = (code_i - 64) * 256). The SAME derivation is
    expressible in ANSI SQL over the text column, which is what makes
    the audio-feature pipeline (q277) oracle-checkable end to end."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, clean in zip(pdf["doc_id"], pdf[clean_col]):
                if not clean:
                    continue
                codes = np.frombuffer(
                    clean.encode("ascii"), dtype=np.uint8
                ).astype(np.int32)
                samples = ((codes - 64) * 256).astype("<i2").tobytes()
                fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
                body = (
                    b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", len(samples)) + samples
                )
                rows.append(
                    {
                        "media_id": int(doc_id),
                        "content": b"RIFF"
                        + struct.pack("<I", len(body))
                        + body,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return docs.select("doc_id", clean_col).mapInPandas(
        gen, "media_id long, content binary"
    )


def synth_jpeg_table(
    docs: DataFrame,
    text_col: str = "text",
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
    dims: str = "small",
    progressive: bool = False,
    precision: int = 8,
    entropy: str = "huffman",
) -> DataFrame:
    """Real-encoder JPEG synthesis from the documents fixture: per doc
    a genuine baseline-DCT JFIF file (our pure-Python encoder) whose
    dims derive from doc_id and whose pixels tile the text bytes — the
    JPEG decode path (marker parse, Huffman, dequant, IDCT, YCbCr)
    runs on encoder-faithful bytes and the geometry output stays
    oracle-expressible arithmetic. ``subsampling``/``restart_interval``
    pass through to the encoder (q394 uses 420 + restarts — the real-
    corpus shape); dims="mcu" sizes images at 14..36 x 10..22 so a
    4:2:0 stream spans multiple 16x16 MCUs with partial edges."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                if dims == "mcu":
                    w = int(doc_id) % 23 + 14
                    h = int(doc_id) % 13 + 10
                else:
                    w = int(doc_id) % 11 + 6
                    h = int(doc_id) % 5 + 4
                arr = _tile_text_pixels(text, h, w)
                if precision == 12:  # byte-derived 12-bit samples
                    arr = (arr.astype(np.uint16) << 4)
                rows.append(
                    {
                        "media_id": int(doc_id),
                        "content": _pixels_to_jpeg(
                            arr, quality, subsampling, restart_interval,
                            progressive, precision, entropy,
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )


def synth_gif_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Real-encoder GIF synthesis from the documents fixture: per doc a
    genuine LZW-compressed GIF whose indices tile the md5 hex of the
    text over a 256-gray palette, dims derived from doc_id (odd docs
    interlaced). GIF is lossless, so the decoded payload md5 is
    SQL-recomputable: each tiled hex char triples into (i, i, i)."""
    import hashlib

    pal = np.arange(256, dtype=np.uint8).repeat(3).reshape(256, 3)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                w = int(doc_id) % 11 + 6
                h = int(doc_id) % 5 + 4
                hx = hashlib.md5(
                    (text or "").encode("utf-8")
                ).hexdigest().encode("ascii")
                need = h * w
                idx = np.frombuffer(
                    (hx * (need // 32 + 1))[:need], dtype=np.uint8
                ).reshape(h, w)
                rows.append(
                    {
                        "media_id": int(doc_id),
                        "content": _pixels_to_gif(
                            idx, pal, interlace=bool(int(doc_id) % 2)
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )


def synth_g711_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Real-encoder G.711 WAV synthesis: per doc a RIFF/WAVE file whose
    fmt tag is 7 (mu-law, even doc_ids) or 6 (A-law, odd), whose data
    bytes tile the md5 hex of the text doc_id%4+1 times — 16 distinct
    companded byte values whose linear expansions the oracle carries
    as a 32-row VALUES lookup, making every decoded sample
    SQL-checkable via exact integer sums."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                hx = hashlib.md5(
                    (text or "").encode("utf-8")
                ).hexdigest().encode("ascii")
                data = hx * (int(doc_id) % 4 + 1)
                tag = 7 if int(doc_id) % 2 == 0 else 6
                fmt = struct.pack("<HHIIHH", tag, 1, 8000, 8000, 1, 8)
                wav = (
                    b"RIFF"
                    + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
                    + b"WAVE"
                    + b"fmt "
                    + struct.pack("<I", len(fmt))
                    + fmt
                    + b"data"
                    + struct.pack("<I", len(data))
                    + data
                )
                rows.append({"media_id": int(doc_id), "content": wav})
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )


def decode_media_pcm_stats(media: DataFrame) -> DataFrame:
    """Decode audio and reduce the 16-bit PCM payload to exact integer
    statistics (count/sum/min/max of samples) — the oracle-checkable
    shape for lossy-free audio transforms like the G.711 expansion."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = _decode_payload(bytes(content))
                pcm = np.frombuffer(d["payload"], dtype="<i2")
                out.append(
                    {
                        "media_id": int(mid),
                        "sample_rate": d["sample_rate"],
                        "n_samples": len(pcm),
                        "sample_sum": int(pcm.sum(dtype=np.int64)),
                        "sample_min": int(pcm.min()),
                        "sample_max": int(pcm.max()),
                    }
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        run,
        "media_id long, sample_rate int, n_samples long, "
        "sample_sum long, sample_min int, sample_max int",
    )


def synth_png_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Real-encoder PNG synthesis from the documents fixture: per doc a
    genuine zlib-compressed RGB PNG whose dims derive from doc_id and
    whose pixels tile the text bytes — so the PNG decode path (inflate
    + filter reconstruction) runs on encoder-faithful bytes and its
    geometry output stays oracle-expressible arithmetic."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                w = int(doc_id) % 13 + 3
                h = int(doc_id) % 7 + 2
                arr = _tile_text_pixels(text, h, w)
                rows.append(
                    {
                        "media_id": int(doc_id),
                        # odd docs Adam7-interlaced (round 7) — a
                        # layout change only, decode is lossless
                        "content": _pixels_to_png(
                            arr, interlace=bool(int(doc_id) % 2)
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )


def synth_jpeg_lossless_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Lossless-JPEG (SOF3) synthesis from the documents fixture: per
    doc a genuine DPCM stream whose pixels tile the ASCII md5 hex of
    the text and whose predictor sweeps doc_id % 7 + 1 — so decode
    must reproduce EVERY pixel bit-exactly (q401 oracles the md5 of
    the full decoded payload, not just geometry: lossless means the
    whole image is SQL-recomputable). Round 8: doc_id%9==4 lanes are
    4:2:0-subsampled and doc_id%9==8 lanes 4:2:2 (T.81 A.2 interleave;
    chroma decimates top-left and the decode replicates it back, so
    the payload stays an exact index-arithmetic function of the
    tile)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                did = int(doc_id)
                w = did % 11 + 6
                h = did % 5 + 4
                hx = hashlib.md5(
                    (text or "").encode("utf-8")
                ).hexdigest().encode("ascii")
                need = h * w * 3
                arr = np.tile(
                    np.frombuffer(hx, dtype=np.uint8), need // 32 + 1
                )[:need].reshape(h, w, 3)
                if did % 9 == 4:
                    sampling = [(2, 2), (1, 1), (1, 1)]  # 4:2:0
                elif did % 9 == 8:
                    sampling = [(2, 1), (1, 1), (1, 1)]  # 4:2:2
                else:
                    sampling = None
                rows.append(
                    {
                        "media_id": did,
                        "content": _pixels_to_jpeg_lossless(
                            arr,
                            predictor=did % 7 + 1,
                            sampling=sampling,
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )


# ---------------------------------------------------------------------------
# TIFF 6.0 (baseline bilevel/gray/RGB subset) — encoder AND decoder,
# from the public Adobe TIFF 6.0 specification (1992). Supported on
# both sides: II/MM byte orders, multi-strip layout (RowsPerStrip),
# Compression 1 (none) / 32773 (PackBits, spec §9) / 5 (LZW, spec §13
# — MSB-first bit packing, 9-bit start, EARLY code-width change at
# table size 2^w - 1, Clear at 4094: the convention that differs from
# GIF's count-codes rule), Predictor 2 (horizontal differencing, spec
# §14), PhotometricInterpretation 0/1 (gray, expanded to RGB on
# decode), 2 (RGB) and 3 (palette + ColorMap), TILED layout (spec §15:
# TileWidth/TileLength multiples of 16, zero-padded edge tiles cropped
# on decode) and PlanarConfiguration 2 (plane-major segments, per-plane
# predictor) — both added in round 7; tiled is the default layout for
# large scanned/geo imagery. TIFF is lossless, so the decoded payload
# md5 is SQL-recomputable — the q401-strength oracle shape.
# Boundary (raises NotImplementedError): CCITT/JPEG-in-TIFF
# compression, non-8-bit samples.
# ---------------------------------------------------------------------------

def _packbits_encode(data: bytes) -> bytes:
    """PackBits (TIFF spec §9): literal runs n in [0,127] = n+1 raw
    bytes; repeat runs n in [-127,-1] = 1-n copies of the next byte."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length of identical bytes at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            continue
        # literal: extend until a >=3 repeat starts (2-byte repeats are
        # cheaper folded into the literal) or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out.extend(data[i:j])
        i = j
    return bytes(out)


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:
            out.extend(data[i : i + b + 1])
            i += b + 1
        elif b > 128:
            out.extend(data[i : i + 1] * (257 - b))
            i += 1
        # b == 128: no-op per spec
    if len(out) != expected:
        raise ValueError("PackBits strip decoded to wrong length")
    return bytes(out)


class _MsbBitWriter:
    """MSB-first bit packer (TIFF LZW; GIF's is LSB-first)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def done(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.buf)


_TIFF_CLEAR, _TIFF_EOI = 256, 257


def _tiff_lzw_compress(data: bytes) -> bytes:
    """TIFF spec §13 LZW. Width growth counts CODES on both sides (the
    convention the GIF codec above proved against giflib goldens),
    shifted one code EARLIER — that is exactly TIFF's famous
    early-change rule ("the code width changes one code sooner than a
    GIF-convention reader expects"). The encoder emits ClearCode when
    the table reaches 4094 entries, keeping every code <= 12 bits."""
    w = _MsbBitWriter()

    def fresh() -> tuple[dict, int, int, int]:
        return {bytes([i]): i for i in range(256)}, 258, 9, 258

    table, next_code, width, rc = fresh()
    w.put(_TIFF_CLEAR, width)

    def emit_data(code: int) -> None:
        nonlocal width, rc
        w.put(code, width)
        rc += 1
        if rc > (1 << width) - 1 and width < 12:
            width += 1

    prefix = b""
    for ch in data:
        cand = prefix + bytes([ch])
        if cand in table:
            prefix = cand
            continue
        emit_data(table[prefix])
        if next_code >= 4094:  # table full: reset both sides
            w.put(_TIFF_CLEAR, width)
            table, next_code, width, rc = fresh()
        else:
            table[cand] = next_code
            next_code += 1
        prefix = bytes([ch])
    if prefix:
        emit_data(table[prefix])
    w.put(_TIFF_EOI, width)
    return w.done()


def _tiff_lzw_decompress(data: bytes, expected: int) -> bytes:
    """Decoder mirror: same code-counting early-change width rule, the
    spec §13 pseudo-code's KwKwK handling, Clear resets."""
    out = bytearray()
    pos_bits, total_bits = 0, len(data) * 8
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width, rc = 9, 258
    old: bytes | None = None

    def get() -> int:
        nonlocal pos_bits
        if pos_bits + width > total_bits:
            return _TIFF_EOI
        v = 0
        for _ in range(width):
            v = (v << 1) | ((data[pos_bits >> 3] >> (7 - (pos_bits & 7))) & 1)
            pos_bits += 1
        return v

    while len(out) < expected:
        code = get()
        if code == _TIFF_EOI:
            break
        if code == _TIFF_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width, rc = 9, 258
            old = None
            continue
        if old is None:
            if code >= 256:
                raise ValueError("LZW stream must open with a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4094:
                table.append(old + entry[:1])
        elif code == len(table):
            entry = old + old[:1]  # KwKwK
            table.append(entry)
        else:
            raise ValueError("corrupt LZW code")
        out.extend(entry)
        old = entry
        rc += 1
        if rc > (1 << width) - 1 and width < 12:
            width += 1
    if len(out) != expected:
        raise ValueError("LZW strip decoded to wrong length")
    return bytes(out)


def _tiff_predict2_encode(row: np.ndarray, spp: int) -> np.ndarray:
    """Horizontal differencing (spec §14): per channel, left-to-right
    deltas mod 256; first pixel kept verbatim."""
    r = row.reshape(-1, spp).astype(np.int16)
    d = r.copy()
    d[1:] = (r[1:] - r[:-1]) & 0xFF
    return d.astype(np.uint8).reshape(-1)


# ---------------------------------------------------------------------------
# CCITT Group 4 (ITU-T Rec. T.6, 1988) bilevel codec — encoder AND
# decoder from the public spec (round-8 verdict item 4; TIFF
# Compression=4, the dominant format of scanned-document corpora).
# T.6 is pure 2-D MMR coding: every line codes against the line above
# (an imaginary all-white line for the first), choosing per changing
# element among PASS (0001), VERTICAL (a1 within +-3 of b1) and
# HORIZONTAL (001 + two T.4 modified-Huffman run codes). No EOLs;
# EOFB terminates the stream (our decoder stops after h lines and
# never needs it, but we emit it per spec). Run codes are the T.4
# §2 white/black terminating (0-63) + makeup (64-1728) tables plus
# the shared extended makeups (1792-2560). The tables below are
# transcribed from the published standard; the hand-derived golden
# bitstream and falsification batteries in
# tests/test_sources_multimodal.py pin the conventions (a reader
# with a flipped vertical-direction or swapped color table MUST
# fail).
# Reference parity note: the reference repo has no codecs; this
# extends the same multimodal boundary q422 documents.
# ---------------------------------------------------------------------------

_T4_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}
_T4_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}
_T4_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
}
_T4_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}
_T4_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}
#: T.6 vertical-mode codes keyed by a1 - b1
_T6_VERT = {
    0: "1", 1: "011", 2: "000011", 3: "0000011",
    -1: "010", -2: "000010", -3: "0000010",
}
_T6_PASS = "0001"
_T6_HORIZ = "001"

#: decoder lookup: bitstring -> (run, is_terminating), per color
_T4_DECODE = {
    0: {
        **{b: (r, True) for r, b in _T4_WHITE_TERM.items()},
        **{b: (r, False) for r, b in _T4_WHITE_MAKEUP.items()},
        **{b: (r, False) for r, b in _T4_EXT_MAKEUP.items()},
    },
    1: {
        **{b: (r, True) for r, b in _T4_BLACK_TERM.items()},
        **{b: (r, False) for r, b in _T4_BLACK_MAKEUP.items()},
        **{b: (r, False) for r, b in _T4_EXT_MAKEUP.items()},
    },
}
_T6_MODES = {
    _T6_PASS: "P", _T6_HORIZ: "H",
    **{b: ("V", d) for d, b in _T6_VERT.items()},
}


def _g4_line_transitions(line: np.ndarray) -> list[int]:
    """Positions where the line's color changes, relative to an
    imaginary white pixel before index 0 — so the list alternates
    strictly: index 0 flips to black, 1 back to white, ..."""
    ext = np.concatenate(([0], np.asarray(line, dtype=np.uint8)))
    return np.flatnonzero(ext[1:] != ext[:-1]).tolist()


def _g4_next_flip(trans: list[int], pos: int, color: int, w: int) -> int:
    """First changing element strictly right of ``pos`` whose NEW color
    is the opposite of ``color`` (i.e. transition index parity: even
    flips to black). Sentinel ``w`` when none — the imaginary change
    at line end."""
    want = 0 if color == 0 else 1
    for k, t in enumerate(trans):
        if t > pos and k % 2 == want:
            return t
    return w


def _g4_next_any(trans: list[int], pos: int, w: int) -> int:
    """First changing element strictly right of ``pos``; sentinel w."""
    for t in trans:
        if t > pos:
            return t
    return w


def _g4_mh_run(r: int, color: int) -> str:
    """T.4 modified-Huffman encoding of one run: extended makeups for
    the tail past 2623, one color makeup for the 64-multiple, always
    ending on a terminating code (0-63)."""
    out = []
    while r > 2623:
        out.append(_T4_EXT_MAKEUP[2560])
        r -= 2560
    if r >= 64:
        m = (r // 64) * 64
        out.append(
            _T4_EXT_MAKEUP[m]
            if m > 1728
            else (_T4_WHITE_MAKEUP if color == 0 else _T4_BLACK_MAKEUP)[m]
        )
        r -= m
    out.append((_T4_WHITE_TERM if color == 0 else _T4_BLACK_TERM)[r])
    return "".join(out)


def _g4_encode(bitmap: np.ndarray) -> bytes:
    """T.6 MMR encode of an (h, w) 0/1 bitmap (1 = black). Returns the
    packed MSB-first stream, EOFB-terminated, zero-padded to a byte."""
    h, w = bitmap.shape
    out: list[str] = []
    ref_t: list[int] = []  # imaginary all-white line above row 0
    for y in range(h):
        cur_t = _g4_line_transitions(bitmap[y])
        a0, color = -1, 0
        while a0 < w:
            a1 = _g4_next_flip(cur_t, a0, color, w)
            b1 = _g4_next_flip(ref_t, a0, color, w)
            b2 = _g4_next_any(ref_t, b1, w)
            if b2 < a1:
                out.append(_T6_PASS)
                a0 = b2
            elif abs(a1 - b1) <= 3:
                out.append(_T6_VERT[a1 - b1])
                a0 = a1
                color ^= 1
            else:
                a2 = _g4_next_any(cur_t, a1, w)
                start = a0 if a0 >= 0 else 0
                out.append(_T6_HORIZ)
                out.append(_g4_mh_run(a1 - start, color))
                out.append(_g4_mh_run(a2 - a1, color ^ 1))
                a0 = a2
        ref_t = cur_t
    out.append("000000000001" * 2)  # EOFB
    bits = "".join(out)
    bits += "0" * (-len(bits) % 8)
    return bytes(
        int(bits[i : i + 8], 2) for i in range(0, len(bits), 8)
    )


class _G4BitReader:
    """MSB-first prefix-code reader over the packed T.6 stream."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def _bit(self) -> str:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("G4 stream truncated")
        b = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return "1" if b else "0"

    def code(self, table: dict, max_len: int, what: str):
        acc = ""
        for _ in range(max_len):
            acc += self._bit()
            if acc in table:
                return table[acc]
        raise ValueError(f"invalid G4 {what} code {acc!r}")


def _g4_decode_runlen(rd: "_G4BitReader", color: int) -> int:
    """One MH run: accumulate makeups until a terminating code."""
    total = 0
    while True:
        run, term = rd.code(_T4_DECODE[color], 14, "run")
        total += run
        if term:
            return total


def _g4_decode(data: bytes, w: int, h: int) -> np.ndarray:
    """T.6 MMR decode to an (h, w) 0/1 bitmap (1 = black). Raises
    ValueError on any structural inconsistency — truncation, invalid
    prefix, or a line overrunning the declared width (the
    falsification battery corrupts streams and expects exactly this,
    never a silently wrong image)."""
    rd = _G4BitReader(data)
    out = np.zeros((h, w), dtype=np.uint8)
    ref_t: list[int] = []
    for y in range(h):
        cur = out[y]
        a0, color = -1, 0
        while a0 < w:
            kind = rd.code(_T6_MODES, 7, "mode")
            if kind == "P":
                b1 = _g4_next_flip(ref_t, a0, color, w)
                b2 = _g4_next_any(ref_t, b1, w)
                if b2 > w:
                    raise ValueError("G4 pass mode past line end")
                cur[max(a0, 0) : b2] = color
                a0 = b2
            elif kind == "H":
                r1 = _g4_decode_runlen(rd, color)
                r2 = _g4_decode_runlen(rd, color ^ 1)
                start = a0 if a0 >= 0 else 0
                if start + r1 + r2 > w:
                    raise ValueError("G4 horizontal runs overrun line")
                if start + r1 + r2 <= a0:
                    raise ValueError("G4 horizontal made no progress")
                cur[start : start + r1] = color
                cur[start + r1 : start + r1 + r2] = color ^ 1
                a0 = start + r1 + r2
            else:
                _v, d = kind
                b1 = _g4_next_flip(ref_t, a0, color, w)
                a1 = b1 + d
                if not 0 <= a1 <= w or a1 <= a0:
                    raise ValueError("G4 vertical mode out of range")
                cur[max(a0, 0) : a1] = color
                a0 = a1
                color ^= 1
        if a0 != w:
            raise ValueError("G4 line overran declared width")
        ref_t = _g4_line_transitions(cur)
    return out


def _encode_tiff_g4(
    ink: np.ndarray,
    byte_order: str = "II",
    photometric: int = 0,
    rows_per_strip: int | None = None,
    compression: int = 4,
    t4_two_d: bool = True,
) -> bytes:
    """Bilevel TIFF with Compression=4 (T.6): ``ink`` is the DISPLAY
    bitmap (1 = black ink). Photometric 0 (WhiteIsZero, the fax
    convention) stores ink bits directly as G4 black; photometric 1
    (BlackIsZero) stores the inverse — the decoded display payload is
    lane-invariant, which is exactly what the oracle asserts. Strips
    restart T.6 coding with a fresh imaginary white reference line
    (each strip is an independent coding segment per TIFF spec §2
    Compression notes)."""
    bo = "<" if byte_order == "II" else ">"
    h, w_ = ink.shape
    stored = ink if photometric == 0 else (1 - ink)
    rps = rows_per_strip or h
    if compression == 4:
        enc = _g4_encode
    elif compression == 3:
        def enc(b):
            return _t4_g3_encode(b, two_d=t4_two_d, k=4)
    elif compression == 2:
        enc = _ccitt_rle_encode
    else:
        raise NotImplementedError(f"bilevel compression {compression}")
    strips = [
        enc(np.ascontiguousarray(stored[y0 : y0 + rps]))
        for y0 in range(0, h, rps)
    ]
    out = bytearray()
    out += struct.pack(f"{bo}2sHI", byte_order.encode(), 42, 0)
    strip_offsets = []
    for s in strips:
        strip_offsets.append(len(out))
        out += s
    if len(out) & 1:
        out += b"\0"
    n = len(strips)
    entries: list[tuple[int, int, int, int | tuple]] = [
        (256, 4, 1, w_),
        (257, 4, 1, h),
        (258, 3, 1, 1),            # BitsPerSample 1
        (259, 3, 1, compression),  # 2=MH-RLE, 3=T.4 G3, 4=T.6 G4
        (262, 3, 1, photometric),
        (277, 3, 1, 1),
        (278, 4, 1, rps),
    ]
    if compression == 4:
        entries.append((293, 4, 1, 0))  # T6Options: no uncompressed
    elif compression == 3:
        entries.append((292, 4, 1, 1 if t4_two_d else 0))  # T4Options
    ext: list[bytes] = []
    if n == 1:
        entries.append((273, 4, 1, strip_offsets[0]))
        entries.append((279, 4, 1, len(strips[0])))
    else:
        entries.append((273, 4, n, ("ext", 0)))
        entries.append((279, 4, n, ("ext", 1)))
        ext = [
            struct.pack(f"{bo}{n}I", *strip_offsets),
            struct.pack(f"{bo}{n}I", *[len(s) for s in strips]),
        ]
    entries.sort(key=lambda e: e[0])
    ifd_ofs = len(out)
    struct.pack_into(f"{bo}I", out, 4, ifd_ofs)
    ext_base = ifd_ofs + 2 + 12 * len(entries) + 4
    ext_offsets = []
    cur = ext_base
    for p in ext:
        ext_offsets.append(cur)
        cur += len(p)
    ifd = bytearray(struct.pack(f"{bo}H", len(entries)))
    for t, typ, cnt, val in entries:
        ifd += struct.pack(f"{bo}HHI", t, typ, cnt)
        if isinstance(val, tuple):
            ifd += struct.pack(f"{bo}I", ext_offsets[val[1]])
        else:
            ifd += struct.pack(
                f"{bo}{'H' if typ == 3 else 'I'}", int(val)
            ).ljust(4, b"\0")
    ifd += struct.pack(f"{bo}I", 0)
    out += ifd
    for p in ext:
        out += p
    return bytes(out)


def _tiff_predict2_decode(row: np.ndarray, spp: int) -> np.ndarray:
    r = row.reshape(-1, spp).astype(np.uint16)
    acc = np.cumsum(r, axis=0, dtype=np.uint64) & 0xFF
    return acc.astype(np.uint8).reshape(-1)


def _pixels_to_tiff(
    arr: "np.ndarray",
    byte_order: str = "II",
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int = 3,
    gray: bool = False,
    palette: "np.ndarray | None" = None,
    tile: "tuple[int, int] | None" = None,
    planar: int = 1,
    jpeg_predictor: int = 1,
) -> bytes:
    """Encode HxWx3 uint8 RGB (or, with gray=True, HxW uint8; or, with
    palette=(256,3) uint8, HxW palette INDICES + a ColorMap of 16-bit
    entries v*257) to a baseline TIFF. Strips of rows_per_strip rows —
    or, with ``tile=(tw, tl)`` (multiples of 16 per spec §15), the
    TILED layout: left-to-right top-to-bottom tiles, edge tiles
    zero-PADDED to full tile size, compression/predictor applied per
    tile row of the PADDED width. ``planar=2`` (spec PlanarConfig 2)
    stores each sample plane's segments separately, plane-major
    (all R segments, then G, then B); per-plane rows difference with
    spp=1 semantics under Predictor 2. IFD written after the pixel
    data; inline IFD values are LEFT-justified in the file byte order
    per spec §2 (the classic MM gotcha)."""
    bo = "<" if byte_order == "II" else ">"
    if palette is not None:
        if arr.ndim == 3:
            arr = arr[:, :, 0]
        h, w_ = arr.shape
        spp, photometric = 1, 3
    elif gray:
        if arr.ndim == 3:
            arr = arr[:, :, 0]
        h, w_ = arr.shape
        spp, photometric = 1, 1
    else:
        h, w_, _ = arr.shape
        spp, photometric = 3, 2
    data = arr.reshape(h, w_, spp)
    # planar=2 has no effect (and emits identical segments) for spp=1
    planes = (
        [data[:, :, p : p + 1] for p in range(spp)]
        if planar == 2 and spp > 1
        else [data]
    )
    seg_spp = 1 if (planar == 2 and spp > 1) else spp

    def _enc_segment(rows: list[bytes]) -> bytes:
        if compression == 7:
            # new-style JPEG-in-TIFF (TechNote 2): every segment is a
            # COMPLETE self-contained JPEG stream; we emit lossless
            # SOF3 so the container stays bit-exact (TIFF's own
            # Predictor must stay 1 — SOF3 predicts internally)
            if predictor != 1:
                raise ValueError("Compression 7 requires Predictor 1")
            stack = np.stack(
                [
                    np.frombuffer(r, dtype=np.uint8).reshape(-1, seg_spp)
                    for r in rows
                ]
            )
            a = stack if seg_spp > 1 else stack[:, :, 0]
            return _pixels_to_jpeg_lossless(a, predictor=jpeg_predictor)
        if predictor == 2:
            rows = [
                _tiff_predict2_encode(
                    np.frombuffer(r, dtype=np.uint8), seg_spp
                ).tobytes()
                for r in rows
            ]
        seg = b"".join(rows)
        if compression == 5:
            return _tiff_lzw_compress(seg)
        if compression == 32773:
            return _packbits_encode(seg)
        if compression != 1:
            raise NotImplementedError(f"TIFF compression {compression}")
        return seg

    strips: list[bytes] = []
    if tile is not None:
        tw, tl = tile
        if tw % 16 or tl % 16:
            raise ValueError("TileWidth/TileLength must be multiples of 16")
        for plane in planes:
            for ty in range(0, h, tl):
                for tx in range(0, w_, tw):
                    block = np.zeros((tl, tw, seg_spp), dtype=np.uint8)
                    sub = plane[ty : ty + tl, tx : tx + tw]
                    block[: sub.shape[0], : sub.shape[1]] = sub
                    strips.append(
                        _enc_segment(
                            [block[r].reshape(-1).tobytes() for r in range(tl)]
                        )
                    )
    else:
        for plane in planes:
            raw_rows = [plane[y].reshape(-1).tobytes() for y in range(h)]
            for y0 in range(0, h, rows_per_strip):
                strips.append(_enc_segment(raw_rows[y0 : y0 + rows_per_strip]))

    out = bytearray()
    out += struct.pack(f"{bo}2sHI", byte_order.encode(), 42, 0)  # patch ofs
    strip_offsets: list[int] = []
    for s in strips:
        strip_offsets.append(len(out))
        out += s
    if len(out) & 1:
        out += b"\0"

    # external value arrays (anything wider than the 4-byte slot)
    extra: list[tuple[int, bytes]] = []

    def _ext(payload: bytes) -> int:
        extra.append((0, payload))
        return len(extra) - 1

    entries: list[tuple[int, int, int, bytes | int]] = []

    def tag(t: int, typ: int, cnt: int, val) -> None:
        entries.append((t, typ, cnt, val))

    n_strips = len(strips)
    ofs_tag, cnt_tag = (324, 325) if tile is not None else (273, 279)
    tag(256, 4, 1, w_)  # ImageWidth LONG
    tag(257, 4, 1, h)  # ImageLength LONG
    if spp == 3:
        bps = struct.pack(f"{bo}3H", 8, 8, 8)
        tag(258, 3, 3, ("ext", _ext(bps)))
    else:
        tag(258, 3, 1, 8)
    tag(259, 3, 1, compression)
    tag(262, 3, 1, photometric)
    if n_strips == 1:
        tag(ofs_tag, 4, 1, ("strip0",))
    else:
        tag(ofs_tag, 4, n_strips, ("ext", _ext(b"")))  # patched below
        _strip_ofs_ext = len(extra) - 1
    tag(277, 3, 1, spp)
    if tile is not None:
        tag(322, 4, 1, tile[0])  # TileWidth
        tag(323, 4, 1, tile[1])  # TileLength
    else:
        tag(278, 4, 1, rows_per_strip)
    tag(284, 3, 1, planar)  # PlanarConfiguration
    if n_strips == 1:
        tag(cnt_tag, 4, 1, len(strips[0]))
    else:
        counts = struct.pack(f"{bo}{n_strips}I", *[len(s) for s in strips])
        tag(cnt_tag, 4, n_strips, ("ext", _ext(counts)))
    if predictor != 1:
        tag(317, 3, 1, predictor)
    if palette is not None:
        # spec §5: entries are 16-bit, planes R..G..B; v*257 maps an
        # 8-bit channel to the full 16-bit range (and >>8 back)
        cm = (
            palette.astype(np.uint32).T.reshape(-1) * 257
        ).astype(np.uint16)
        tag(320, 3, len(cm), ("ext", _ext(
            cm.astype(f"{bo}u2").tobytes()
        )))
    entries.sort(key=lambda e: e[0])  # IFD entries must be tag-ordered

    ifd_ofs = len(out)
    struct.pack_into(f"{bo}I", out, 4, ifd_ofs)
    ifd = bytearray(struct.pack(f"{bo}H", len(entries)))
    ext_base = ifd_ofs + 2 + 12 * len(entries) + 4
    # resolve external payload offsets (strip-offsets array last so it
    # can reference the already-final strip positions)
    ext_payloads: list[bytes] = []
    ofs_cursor = ext_base
    ext_offsets: list[int] = []
    for i, (_z, payload) in enumerate(extra):
        if n_strips > 1 and i == _strip_ofs_ext:
            payload = struct.pack(f"{bo}{n_strips}I", *strip_offsets)
        if len(payload) & 1:
            payload += b"\0"
        ext_offsets.append(ofs_cursor)
        ext_payloads.append(payload)
        ofs_cursor += len(payload)
    type_size = {3: 2, 4: 4}
    for t, typ, cnt, val in entries:
        ifd += struct.pack(f"{bo}HHI", t, typ, cnt)
        if isinstance(val, tuple) and val[0] == "ext":
            ifd += struct.pack(f"{bo}I", ext_offsets[val[1]])
        elif isinstance(val, tuple) and val[0] == "strip0":
            ifd += struct.pack(f"{bo}I", strip_offsets[0])
        else:
            # inline values sit LEFT-justified in the file byte order
            # (for MM the big-endian pack already left-justifies)
            ifd += struct.pack(
                f"{bo}{'H' if typ == 3 else 'I'}", int(val)
            ).ljust(4, b"\0")
        if typ not in type_size:
            raise NotImplementedError("encoder emits SHORT/LONG only")
    ifd += struct.pack(f"{bo}I", 0)  # next IFD
    out += ifd
    for p in ext_payloads:
        out += p
    return bytes(out)


def _decode_tiff(content: bytes) -> dict:
    """GENUINE decoder: baseline + extension TIFF per the 6.0 spec.
    Returns RGB payload (gray expanded x3), segment-reassembled from
    STRIPS or TILES (§15: padded edge tiles cropped into place), in
    chunky or planar (PlanarConfiguration 2, plane-major segments)
    layout, de-predicted, decompressed. Raises NotImplementedError on
    the documented boundary (CCITT/JPEG compression, non-8-bit
    samples)."""
    if len(content) < 8 or content[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF")
    bo = "<" if content[:2] == b"II" else ">"
    magic, ifd_ofs = struct.unpack_from(f"{bo}HI", content, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (n_entries,) = struct.unpack_from(f"{bo}H", content, ifd_ofs)
    type_size = {1: 1, 3: 2, 4: 4}
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        t, typ, cnt, = struct.unpack_from(
            f"{bo}HHI", content, ifd_ofs + 2 + 12 * i
        )
        slot_ofs = ifd_ofs + 2 + 12 * i + 8
        if typ not in type_size:
            continue  # RATIONAL etc: irrelevant to the baseline subset
        width = type_size[typ]
        total = width * cnt
        if total <= 4:
            base = slot_ofs  # inline, left-justified
        else:
            (base,) = struct.unpack_from(f"{bo}I", content, slot_ofs)
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[t] = list(
            struct.unpack_from(f"{bo}{cnt}{fmt}", content, base)
        )
    w_ = tags[256][0]
    h = tags[257][0]
    compression = tags.get(259, [1])[0]
    photometric = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [1])
    predictor = tags.get(317, [1])[0]
    planar = tags.get(284, [1])[0]
    rows_per_strip = tags.get(278, [h])[0]
    tiled = 322 in tags or 323 in tags
    if photometric == 3 and 320 not in tags:
        raise ValueError("palette-color TIFF missing ColorMap")
    if photometric not in (0, 1, 2, 3):
        raise NotImplementedError(f"TIFF photometric {photometric}")
    if planar not in (1, 2):
        raise ValueError(f"bad PlanarConfiguration {planar}")
    if compression in (2, 3, 4):
        # CCITT fax family — bilevel single-plane strips (the
        # scanned-document shape); every coder restarts per strip
        if spp != 1 or bps != [1] or planar != 1 or tiled:
            raise NotImplementedError(
                "CCITT TIFF: bilevel single-sample strip layout only"
            )
        if photometric not in (0, 1):
            raise ValueError(f"CCITT TIFF photometric {photometric}")
        offsets = tags[273]
        counts = tags.get(279)
        if counts is None:
            raise ValueError("missing StripByteCounts")
        two_d = bool(tags.get(292, [0])[0] & 1)
        stored = np.zeros((h, w_), dtype=np.uint8)
        for i, (ofs, cnt) in enumerate(zip(offsets, counts)):
            y0 = i * rows_per_strip
            n_rows = min(rows_per_strip, h - y0)
            seg = content[ofs : ofs + cnt]
            if compression == 4:
                block = _g4_decode(seg, w_, n_rows)
            elif compression == 3:
                block = _t4_g3_decode(seg, w_, n_rows, two_d=two_d)
            else:
                block = _ccitt_rle_decode(seg, w_, n_rows)
            stored[y0 : y0 + n_rows] = block
        ink = stored if photometric == 0 else (1 - stored)
        rgb = np.repeat(
            np.where(ink.reshape(-1) == 1, 0, 255).astype(np.uint8), 3
        )
        return {
            "kind": "image",
            "width": w_,
            "height": h,
            "sample_rate": 0,
            "payload": rgb.tobytes(),
        }
    if any(b != 8 for b in bps):
        raise NotImplementedError("only 8 bits per sample supported")
    if compression not in (1, 5, 32773, 7):
        raise NotImplementedError(f"TIFF compression {compression}")
    if compression == 7 and predictor != 1:
        raise ValueError("Compression 7 requires Predictor 1")
    # planar=2: segments are plane-major with spp=1 row semantics
    # (spec §14 note: Predictor 2 then differences within one plane)
    n_planes = spp if (planar == 2 and spp > 1) else 1
    pspp = 1 if n_planes > 1 else spp

    def _unseg(seg: bytes, n_rows: int, row_px: int) -> bytes:
        expected = n_rows * row_px * pspp
        if compression == 7:
            # new-style JPEG-in-TIFF: the segment IS a complete JPEG
            # stream (strip or padded tile); geometry must agree with
            # the container's declaration
            d = _decode_jpeg(bytes(seg))
            if d["width"] != row_px or d["height"] != n_rows:
                raise ValueError(
                    "JPEG segment geometry disagrees with the IFD"
                )
            out = d["payload"]
            if len(out) != expected:
                raise ValueError("JPEG segment decoded to wrong length")
            return out
        if compression == 5:
            seg = _tiff_lzw_decompress(seg, expected)
        elif compression == 32773:
            seg = _packbits_decode(seg, expected)
        elif len(seg) < expected:
            raise ValueError("short uncompressed segment")
        seg = seg[:expected]
        if predictor == 2:
            rb = row_px * pspp
            seg = b"".join(
                _tiff_predict2_decode(
                    np.frombuffer(seg[r * rb : (r + 1) * rb], dtype=np.uint8),
                    pspp,
                ).tobytes()
                for r in range(n_rows)
            )
        return seg

    full = np.zeros((h, w_, spp), dtype=np.uint8)
    if tiled:
        # spec §15: tiles left-to-right top-to-bottom (plane-major for
        # planar=2), EVERY tile padded to full (TileLength, TileWidth)
        # — decode whole tiles, then crop edge tiles into place
        tw = tags[322][0]
        tl = tags[323][0]
        offsets = tags[324]
        counts = tags.get(325)
        if counts is None:
            raise ValueError("missing TileByteCounts")
        across = -(-w_ // tw)
        per_plane = across * (-(-h // tl))
        for i, (ofs, cnt) in enumerate(zip(offsets, counts)):
            p, ti = divmod(i, per_plane) if n_planes > 1 else (0, i)
            ty = (ti // across) * tl
            tx = (ti % across) * tw
            block = np.frombuffer(
                _unseg(content[ofs : ofs + cnt], tl, tw), dtype=np.uint8
            ).reshape(tl, tw, pspp)
            hh = min(tl, h - ty)
            ww = min(tw, w_ - tx)
            if n_planes > 1:
                full[ty : ty + hh, tx : tx + ww, p] = block[:hh, :ww, 0]
            else:
                full[ty : ty + hh, tx : tx + ww] = block[:hh, :ww]
    else:
        offsets = tags[273]
        counts = tags.get(279)
        if counts is None:
            if compression != 1 or len(offsets) != 1:
                raise ValueError("missing StripByteCounts")
            counts = [h * w_ * spp]
        strips_per_plane = -(-h // rows_per_strip)
        for i, (ofs, cnt) in enumerate(zip(offsets, counts)):
            p, si = divmod(i, strips_per_plane) if n_planes > 1 else (0, i)
            y0 = si * rows_per_strip
            n_rows = min(rows_per_strip, h - y0)
            block = np.frombuffer(
                _unseg(content[ofs : ofs + cnt], n_rows, w_), dtype=np.uint8
            ).reshape(n_rows, w_, pspp)
            if n_planes > 1:
                full[y0 : y0 + n_rows, :, p] = block[:, :, 0]
            else:
                full[y0 : y0 + n_rows] = block
    arr = full.reshape(-1)
    if spp == 1:
        if photometric == 3:
            # ColorMap: 3 * 2^bps 16-bit entries, all reds then greens
            # then blues; display value = entry >> 8 (spec §5)
            cm = np.asarray(tags[320], dtype=np.uint16).reshape(3, -1)
            rgb = (cm[:, arr] >> 8).astype(np.uint8).T.reshape(-1)
        else:
            if photometric == 0:  # WhiteIsZero: invert to BlackIsZero
                arr = 255 - arr
            rgb = np.repeat(arr, 3)
    else:
        rgb = arr
    return {
        "kind": "image",
        "width": w_,
        "height": h,
        "sample_rate": 0,
        "payload": rgb.tobytes(),
    }


def synth_tiff_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Real-encoder TIFF synthesis: per doc a baseline TIFF whose dims
    derive from doc_id and whose pixels tile the md5 hex of the text —
    even doc_ids RGB (payload = the tiled hex bytes), odd grayscale
    (payload = each tiled byte repeated x3), so the decoded payload md5
    is recomputable in SQL exactly like q401/q414. Variant coverage
    cycles by doc_id: compression none/PackBits/LZW (doc_id%3),
    horizontal predictor on the doc_id%6==5 LZW lane, MM byte order on
    doc_id%5==0, and LAYOUT by doc_id%7 — 1: TILED chunky, 3:
    PlanarConfiguration-2 strips, 5: tiled planar-2, else multi-strip
    chunky (rows_per_strip=3). Tiled lanes use the larger q394 dims
    (14..36 x 10..22) so a 16x16 tile grid spans multiple tiles with
    partial edges; layout never changes the decoded payload, only the
    container bytes — exactly what the oracle asserts."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                did = int(doc_id)
                layout = did % 7
                if layout in (1, 5):
                    w_ = did % 23 + 14
                    h = did % 13 + 10
                else:
                    w_ = did % 11 + 6
                    h = did % 5 + 4
                hx = hashlib.md5(
                    (text or "").encode("utf-8")
                ).hexdigest().encode("ascii")
                gray = bool(did % 2)
                need = h * w_ * (1 if gray else 3)
                tiled = (hx * (need // 32 + 1))[:need]
                arr = np.frombuffer(tiled, dtype=np.uint8)
                arr = (
                    arr.reshape(h, w_)
                    if gray
                    else arr.reshape(h, w_, 3)
                )
                compression = {0: 1, 1: 32773, 2: 5}[did % 3]
                predictor = 2 if did % 6 == 5 else 1
                byte_order = "MM" if did % 5 == 0 else "II"
                rows.append(
                    {
                        "media_id": did,
                        "content": _pixels_to_tiff(
                            arr,
                            byte_order=byte_order,
                            compression=compression,
                            predictor=predictor,
                            rows_per_strip=3,
                            gray=gray,
                            tile=(16, 16) if layout in (1, 5) else None,
                            planar=2 if layout in (3, 5) else 1,
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )


# ---------------------------------------------------------------------------
# IMA / DVI ADPCM (WAV format tag 0x11) — encoder AND decoder, from
# the public IMA Digital Audio Focus Group algorithm (1992; also RFC
# 3551 §4.5.1 and the Microsoft WAVE registry). 4-bit differential
# coding over an 89-entry step table: genuinely compressed audio
# (4:1 vs 16-bit PCM) with an EXACT integer decode — every sample is
# integer arithmetic, so decoded-sample sums are oracle-checkable.
# Mono, block-structured per the WAV spec: each block = 4-byte header
# (predictor int16, step index uint8, reserved) + 2 samples/byte
# low-nibble-first; the fact chunk carries the true sample count for
# the padded final block.
# ---------------------------------------------------------------------------

_IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _ima_decode_nibble(nib: int, pred: int, idx: int) -> tuple[int, int]:
    """One IMA ADPCM step: returns (new_pred, new_idx)."""
    step = _IMA_STEP_TABLE[idx]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    if nib & 8:
        pred -= diff
    else:
        pred += diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX_TABLE[nib]))
    return pred, idx


def _ima_encode_nibble(sample: int, pred: int, idx: int) -> int:
    """Quantize (sample - pred) against step_table[idx] — the IMA
    reference encoder's bit-building loop."""
    step = _IMA_STEP_TABLE[idx]
    delta = sample - pred
    nib = 0
    if delta < 0:
        nib = 8
        delta = -delta
    if delta >= step:
        nib |= 4
        delta -= step
    if delta >= step >> 1:
        nib |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nib |= 1
    return nib


def _ima_adpcm_encode(samples: "np.ndarray", block_align: int = 256) -> bytes:
    """Int16 samples -> IMA ADPCM block stream: (n,) mono, or (n, 2)
    stereo (round-6 verdict item 4). Each block stores one 4-byte
    header PER CHANNEL (first sample verbatim — the standard WAV
    layout), then, for stereo, the nibble stream in the spec's
    interleaved 4-byte-per-channel groups: 8 left nibbles, 8 right
    nibbles, repeating. Step indices persist per channel across
    blocks. The final block's unused nibbles encode a held last sample
    (decoder truncates via fact)."""
    stereo = samples.ndim == 2
    ch = 2 if stereo else 1
    if stereo and samples.shape[1] != 2:
        raise NotImplementedError("IMA ADPCM: mono or 2-channel only")
    if stereo and (block_align - 8) % 8:
        raise ValueError("stereo block_align must be 8 + multiple of 8")
    groups = (block_align - 4 * ch) // (4 * ch)
    spb = groups * 8 + 1  # samples per channel per block
    out = bytearray()
    idxs = [0] * ch
    n = len(samples)
    cols = samples.reshape(n, ch)
    for b0 in range(0, n, spb):
        chunk = cols[b0 : b0 + spb]
        nibs: list[list[int]] = []
        for c in range(ch):
            pred = int(chunk[0, c])
            idx = idxs[c]
            out += struct.pack("<hBB", pred, idx, 0)
            cn: list[int] = []
            last = pred
            for k in range(1, spb):
                target = int(chunk[k, c]) if k < len(chunk) else last
                nib = _ima_encode_nibble(target, pred, idx)
                pred, idx = _ima_decode_nibble(nib, pred, idx)
                cn.append(nib)
                last = target
            idxs[c] = idx
            nibs.append(cn)
        for g in range(groups):
            for c in range(ch):
                seg = nibs[c][g * 8 : (g + 1) * 8]
                for lo, hi in zip(seg[0::2], seg[1::2]):
                    out.append(lo | (hi << 4))
    return bytes(out)


def _ima_adpcm_decode(
    data: bytes,
    block_align: int,
    total_samples: int | None,
    channels: int = 1,
) -> "np.ndarray":
    """Returns channel-INTERLEAVED int16 samples (the WAV data layout);
    ``total_samples`` is per channel (the fact-chunk convention)."""
    if channels not in (1, 2):
        raise NotImplementedError("IMA ADPCM: mono or 2-channel only")
    groups = (block_align - 4 * channels) // (4 * channels)
    chans: list[list[int]] = [[] for _ in range(channels)]
    for b0 in range(0, len(data), block_align):
        block = data[b0 : b0 + block_align]
        if len(block) < 4 * channels:
            raise ValueError("short ADPCM block header")
        states = []
        for c in range(channels):
            pred, idx, _rsv = struct.unpack_from("<hBB", block, 4 * c)
            if idx > 88:
                raise ValueError("ADPCM step index out of range")
            chans[c].append(pred)
            states.append([pred, idx])
        p = 4 * channels
        if channels == 1:
            st = states[0]
            for byte in block[p:]:
                for nib in (byte & 0x0F, byte >> 4):
                    st[0], st[1] = _ima_decode_nibble(nib, st[0], st[1])
                    chans[0].append(st[0])
        else:
            for _g in range(groups):
                for c in range(channels):
                    st = states[c]
                    for byte in block[p : p + 4]:
                        for nib in (byte & 0x0F, byte >> 4):
                            st[0], st[1] = _ima_decode_nibble(
                                nib, st[0], st[1]
                            )
                            chans[c].append(st[0])
                    p += 4
    if total_samples is not None:
        chans = [c[:total_samples] for c in chans]
    arr = np.array(chans, dtype="<i2")  # (ch, n)
    return arr.T.reshape(-1)


def synth_adpcm_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Real-encoder IMA ADPCM WAV synthesis: 16-bit samples derived
    from the text bytes (sample_i = (byte_i - 100) * 231, a swing wide
    enough to exercise the step-table ladder), ADPCM-encoded in
    block_align=256 blocks with a fact chunk carrying the true
    per-channel sample count. Odd doc_ids are STEREO (round 7): the
    right channel derives from the REVERSED byte sequence, encoded in
    the spec's interleaved 4-byte-per-channel groups. Lossy by design
    — the oracle recomputes the decode sequentially (q33/q40 recipe),
    and the spec batteries in tests/test_sources_multimodal.py pin the
    codec itself."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                b = (text or "x").encode("utf-8")[:1500]
                mono = (
                    (np.frombuffer(b, dtype=np.uint8).astype(np.int32) - 100)
                    * 231
                ).astype("<i2")
                stereo = bool(int(doc_id) % 2)
                block_align = 256
                if stereo:
                    samples = np.stack([mono, mono[::-1]], axis=1)
                    ch = 2
                    spb = (block_align - 8) + 1
                else:
                    samples = mono
                    ch = 1
                    spb = (block_align - 4) * 2 + 1
                adata = _ima_adpcm_encode(samples, block_align)
                fmt = struct.pack(
                    "<HHIIHHHH",
                    0x11, ch, 8000,
                    8000 * block_align // spb,
                    block_align, 4, 2, spb,
                )
                body = (
                    b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"fact" + struct.pack("<II", 4, len(mono))
                    + b"data" + struct.pack("<I", len(adata)) + adata
                )
                rows.append(
                    {
                        "media_id": int(doc_id),
                        "content": b"RIFF"
                        + struct.pack("<I", len(body))
                        + body,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )


# ---------------------------------------------------------------------------
# AVI / MJPEG video (RIFF 'AVI ' container, public Microsoft "AVI RIFF
# File Reference" layout) — writer AND parser from scratch. MJPEG is
# intra-only (every frame an independent JPEG), so the frame payloads
# ride the genuine JPEG codec family above: the synth uses LOSSLESS
# (SOF3) frames, making every sampled frame's decoded payload md5
# SQL-recomputable (q401 strength); baseline-JPEG frames decode
# through the same path (geometry-oracled in tests). This is the
# "video frame-sample" operator of the LLM-pipeline north star:
# container parse + stride sampling + per-frame decode, all inside one
# mapInPandas map stage.
# ---------------------------------------------------------------------------


def _riff_chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\0" * (len(body) & 1))


def _riff_list(kind: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", kind + body)


def _frames_to_avi(
    frames: list[bytes],
    w: int,
    h: int,
    fps: int = 10,
    audio: bytes | None = None,
    audio_rate: int = 8000,
    audio_format: int = 1,
    audio_samples: int | None = None,
    block_align: int = 0,
) -> bytes:
    """Wrap pre-encoded JPEG frames as an MJPEG AVI ('00dc' chunks +
    idx1 index), per the public AVI RIFF reference. With `audio`, a
    second 'auds' stream is declared and the bytes are interleaved as
    '01wb' chunks, one per video frame — the classic A/V interleave
    the format is named for. ``audio_format`` is the WAVE format tag
    of the already-ENCODED bytes: 1 = 16-bit mono PCM (the default), 6
    / 7 = G.711 A-law / mu-law (1 byte per sample), 0x11 = IMA ADPCM
    (``block_align``-byte blocks — chunk splits land on block
    boundaries so each '01wb' chunk is independently block-aligned,
    and ``audio_samples`` carries the true per-channel sample count in
    the stream header's dwLength, the AVI analogue of WAV's fact)."""
    uspf = 1_000_000 // fps
    maxb = max(len(f) for f in frames) if frames else 0
    n_streams = 2 if audio is not None else 1
    avih = struct.pack(
        "<14I", uspf, maxb * fps, 0, 0x10, len(frames), 0, n_streams,
        maxb, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIii", 0, 0, 0, 0, 1, fps, 0, len(frames),
                      maxb, -1, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<I2i2H4s5i", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    strl = _riff_list(
        b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)
    )
    if audio is not None:
        # the byte unit a chunk split must not break: one codec block
        # for ADPCM, one sample otherwise
        unit = {1: 2, 6: 1, 7: 1}.get(audio_format, block_align or 1)
        if audio_format == 1:
            n_samples = len(audio) // 2
            align, bits, byte_rate = 2, 16, audio_rate * 2
        elif audio_format in (6, 7):
            n_samples = len(audio)
            align, bits, byte_rate = 1, 8, audio_rate
        elif audio_format == 0x11:
            if not block_align or audio_samples is None:
                raise ValueError("ADPCM audio needs block_align + samples")
            n_samples = audio_samples
            spb = (block_align - 4) * 2 + 1
            align, bits = block_align, 4
            byte_rate = audio_rate * block_align // spb
        else:
            raise NotImplementedError(f"AVI audio format {audio_format}")
        strh_a = (
            b"auds" + b"\0\0\0\0"
            + struct.pack("<IHHIIIIIIii", 0, 0, 0, 0, 1, audio_rate, 0,
                          n_samples, len(audio), -1, unit)
            + struct.pack("<4H", 0, 0, 0, 0)
        )
        strf_a = struct.pack(
            "<HHIIHH", audio_format, 1, audio_rate, byte_rate, align, bits
        )
        if audio_format == 0x11:
            strf_a += struct.pack("<HH", 2, spb)  # cbSize + samples/block
        strl += _riff_list(
            b"strl",
            _riff_chunk(b"strh", strh_a) + _riff_chunk(b"strf", strf_a),
        )
    hdrl = _riff_list(b"hdrl", _riff_chunk(b"avih", avih) + strl)
    movi_items = []
    if audio is None:
        movi_items = [(b"00dc", f) for f in frames]
    else:
        # split the stream into per-frame chunks on codec-unit bounds
        nf = max(1, len(frames))
        per = (len(audio) // unit // nf) * unit
        apos = 0
        for i, f in enumerate(frames):
            movi_items.append((b"00dc", f))
            take = len(audio) - apos if i == nf - 1 else per
            movi_items.append((b"01wb", audio[apos : apos + take]))
            apos += take
    encoded = [_riff_chunk(cid, b) for cid, b in movi_items]
    movi = _riff_list(b"movi", b"".join(encoded))
    idx = bytearray()
    ofs = 4  # offsets are relative to the start of the 'movi' list data
    for (cid, b), item in zip(movi_items, encoded):
        idx += cid + struct.pack("<III", 0x10, ofs, len(b))
        ofs += len(item)
    body = b"AVI " + hdrl + movi + _riff_chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_demux(
    content: bytes,
) -> tuple[list[bytes], int, int, int, bytes, tuple | None, int | None]:
    """Full A/V demux of an AVI: returns (jpeg frame chunks, width,
    height, fps, concatenated audio stream bytes, audio WAVEFORMAT
    tuple or None, audio per-channel sample count from the 'auds'
    stream header's dwLength or None). Walks the RIFF tree; frames
    come from the movi list's 00dc/00db chunks, audio from the
    interleaved 01wb chunks (the idx1 index is advisory and not
    required)."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    w = h = 0
    fps = 0
    frames: list[bytes] = []
    audio_chunks: list[bytes] = []
    audio_fmt: tuple | None = None
    audio_len: int | None = None
    last_strh_type = b""

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal w, h, fps, audio_fmt, audio_len, last_strh_type
        while pos + 8 <= end:
            cid, size = struct.unpack_from("<4sI", buf, pos)
            body_start = pos + 8
            if cid == b"LIST":
                kind = buf[body_start : body_start + 4]
                if kind in (b"hdrl", b"strl", b"movi"):
                    walk(buf, body_start + 4, body_start + size)
            elif cid == b"avih":
                uspf, _mb, _pad, _fl, _tf, _if, _ns, _sb, aw, ah = (
                    struct.unpack_from("<10I", buf, body_start)
                )
                w, h = aw, ah
                fps = 1_000_000 // uspf if uspf else 0
            elif cid == b"strh":
                last_strh_type = buf[body_start : body_start + 4]
                if last_strh_type == b"auds":
                    # dwLength (samples per channel) sits after
                    # fccType/fccHandler + flags/prio/lang/init/
                    # scale/rate/start = byte 32 of the chunk body
                    (audio_len,) = struct.unpack_from(
                        "<I", buf, body_start + 32
                    )
            elif cid == b"strf" and last_strh_type == b"auds":
                audio_fmt = struct.unpack_from("<HHIIHH", buf, body_start)
            elif cid in (b"00dc", b"00db"):
                frames.append(buf[body_start : body_start + size])
            elif cid == b"01wb":
                audio_chunks.append(buf[body_start : body_start + size])
            pos = body_start + size + (size & 1)

    walk(content, 12, len(content))
    if w == 0 or h == 0:
        raise ValueError("AVI missing avih header")
    return frames, w, h, fps, b"".join(audio_chunks), audio_fmt, audio_len


def _avi_frames(content: bytes) -> tuple[list[bytes], int, int, int]:
    """Video-only view of :func:`_avi_demux` (the q424 frame path)."""
    frames, w, h, fps, _audio, _fmt, _n = _avi_demux(content)
    return frames, w, h, fps


def _decode_avi(content: bytes) -> dict:
    """Container decode for the generic media pipeline: geometry from
    the header, frame count in sample_rate (the GIF convention), and
    the LAST frame's decoded pixels as the payload."""
    frames, w, h, fps = _avi_frames(content)
    if not frames:
        raise ValueError("AVI has no video frames")
    d = _decode_payload(frames[-1])
    return {
        "kind": "video",
        "width": w,
        "height": h,
        "sample_rate": len(frames),
        "payload": d["payload"],
    }


def sample_video_frames(
    media: DataFrame, stride: int = 2
) -> DataFrame:
    """Video frame sampling: every stride-th frame of each container is
    decoded to (media_id, frame_idx, width, height, payload_bytes,
    payload_md5). Container parse + JPEG decode run map-side over
    bounded Arrow batches; no shuffle is introduced."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                frames, w, h, _fps = _avi_frames(bytes(content))
                for fi in range(0, len(frames), stride):
                    d = _decode_payload(frames[fi])
                    out.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": fi,
                            "width": d["width"],
                            "height": d["height"],
                            "payload_bytes": len(d["payload"]),
                            "payload_md5": hashlib.md5(
                                d["payload"]
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "frame_idx", "width", "height",
                    "payload_bytes", "payload_md5",
                ],
            )

    return media.select("media_id", "content").mapInPandas(
        run,
        "media_id long, frame_idx int, width int, height int, "
        "payload_bytes long, payload_md5 string",
    )


def synth_avi_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Real-encoder MJPEG AVI synthesis: per doc an AVI of
    doc_id%4+2 lossless-JPEG (SOF3) frames; frame f tiles the md5 hex
    of the text ROTATED by f characters, so each sampled frame's
    decoded payload md5 is recomputable in SQL. Predictor sweeps
    (doc_id+f)%7+1 across frames."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                did = int(doc_id)
                w_ = did % 11 + 6
                h = did % 5 + 4
                hx = hashlib.md5(
                    (text or "").encode("utf-8")
                ).hexdigest().encode("ascii")
                need = h * w_ * 3
                frames = []
                for f in range(did % 4 + 2):
                    rot = hx[f:] + hx[:f]
                    arr = np.frombuffer(
                        (rot * (need // 32 + 1))[:need], dtype=np.uint8
                    ).reshape(h, w_, 3)
                    frames.append(
                        _pixels_to_jpeg_lossless(
                            arr, predictor=(did + f) % 7 + 1
                        )
                    )
                rows.append(
                    {
                        "media_id": did,
                        "content": _frames_to_avi(frames, w_, h, fps=10),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )


# ---------------------------------------------------------------------------
# Hierarchical JPEG (T.81 Annex J) — lossless pyramid: a DHP header,
# a non-differential SOF3 frame at the smallest pyramid level, then
# EXP + differential SOF7 frames, each coding the mod-2^16 difference
# against the J.1.1.2-interpolated expansion of the previous level.
# The final frame is full size, and because every frame is lossless
# the decode reproduces the source bit-exactly (q401-strength oracle).
# Remaining honest boundary: differential DCT frames (SOF5/6) and the
# arithmetic lossless/differential processes (SOF11/13/14/15).
# ---------------------------------------------------------------------------


def _jpeg_expand(
    ref: np.ndarray, eh: int, ev: int, out_h: int, out_w: int
) -> np.ndarray:
    """T.81 J.1.1.2 reference expansion: output even samples copy the
    input, odd samples are the rounded mean of the two neighbors
    (edge-replicated); horizontal first, then vertical (the spec's
    pseudo-code order), cropped to the next frame's dimensions."""
    r = ref.astype(np.int64)
    if eh:
        nxt = np.concatenate([r[:, 1:], r[:, -1:]], axis=1)
        out = np.empty((r.shape[0], 2 * r.shape[1], r.shape[2]), np.int64)
        out[:, 0::2] = r
        out[:, 1::2] = (r + nxt + 1) >> 1
        r = out
    if ev:
        nxt = np.concatenate([r[1:], r[-1:]], axis=0)
        out = np.empty((2 * r.shape[0], r.shape[1], r.shape[2]), np.int64)
        out[0::2] = r
        out[1::2] = (r + nxt + 1) >> 1
        r = out
    if r.shape[0] < out_h or r.shape[1] < out_w:
        raise ValueError("EXP reference smaller than the next frame")
    return r[:out_h, :out_w]


def _ll_entropy_scan(d16: np.ndarray) -> bytes:
    """Entropy-code an (h, w, nc) array of mod-2^16 difference values
    in (y, x, component) order with the canonical lossless book —
    shared by the hierarchical encoder's first and differential
    frames."""
    codes = _huff_codes(*_HUFF_LL)
    writer = _BitWriter()
    flat = d16.reshape(-1)
    for d in flat:
        d = int(d)
        if d == 32768:
            code, ln = codes[16]
            writer.write(code, ln)
            continue
        sd = d - 65536 if d > 32768 else d
        cat = abs(sd).bit_length()
        code, ln = codes[cat]
        writer.write(code, ln)
        if cat:
            amp = sd if sd >= 0 else sd + (1 << cat) - 1
            writer.write(amp, cat)
    return writer.flush()


def _pixels_to_jpeg_hierarchical(
    arr: np.ndarray, levels: int = 3, precision: int | None = None,
    residual_subsampling: str = "444",
) -> bytes:
    """GENUINE hierarchical-lossless encoder: decimated pyramid
    (levels deep), smallest level as a plain SOF3 frame (predictor 1),
    each larger level as EXP(1,1) + SOF7 differential frame.

    ``residual_subsampling="420"`` (3-channel, round 10 — the last
    lossless corner): INTERMEDIATE differential frames code their
    chroma residuals at a 4:2:0 component grid (decimated; the decoder
    fold replicates them up, and modular mod-2^16 arithmetic keeps
    every sampled position exact); the FINAL full-size frame stays
    1x1, so the decode is bit-exact end to end regardless."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if precision is None:
        precision = 8 if arr.dtype == np.uint8 else 16
    if levels < 2:
        raise ValueError("a hierarchy needs at least 2 levels")
    sub_mid = residual_subsampling == "420" and nc == 3
    if residual_subsampling not in ("444", "420"):
        raise NotImplementedError(
            f"residual subsampling {residual_subsampling!r}"
        )
    pyr = [arr.astype(np.int64)]
    for _ in range(levels - 1):
        pyr.append(pyr[-1][::2, ::2])
    pyr = pyr[::-1]  # smallest first

    def seg(marker: int, b: bytes) -> bytes:
        return struct.pack(">HH", marker, len(b) + 2) + b

    comps = b"".join(struct.pack("BBB", c + 1, 0x11, 0) for c in range(nc))
    sub_fac = [(2, 2)] + [(1, 1)] * (nc - 1)
    comps_sub = b"".join(
        struct.pack("BBB", c + 1, (hi << 4) | vi, 0)
        for c, (hi, vi) in enumerate(sub_fac)
    )
    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDE, struct.pack(">BHHB", precision, h, w, nc) + comps)
    bits, vals = _HUFF_LL
    out += seg(0xFFC4, b"\x00" + bytes(bits) + bytes(vals))
    default = 1 << (precision - 1)
    out_mask = (1 << precision) - 1
    codes = _huff_codes(*_HUFF_LL)
    prev: np.ndarray | None = None
    for li, lvl in enumerate(pyr):
        lh, lw = lvl.shape[:2]
        subsample_this = sub_mid and 0 < li < len(pyr) - 1
        if li == 0:
            d = np.zeros_like(lvl)
            d[:, 1:] = lvl[:, 1:] - lvl[:, :-1]
            d[1:, 0] = lvl[1:, 0] - lvl[:-1, 0]
            d[0, 0] = lvl[0, 0] - default
            sofm, psel = 0xFFC3, 1
        else:
            out += seg(0xFFDF, bytes([0x11]))  # EXP: 2x both directions
            ref = _jpeg_expand(prev, 1, 1, lh, lw)
            d = lvl - ref
            sofm, psel = 0xFFC7, 0
        if not subsample_this:
            out += seg(
                sofm, struct.pack(">BHHB", precision, lh, lw, nc) + comps
            )
            sos = (
                bytes([nc])
                + b"".join(bytes([c + 1, 0x00]) for c in range(nc))
                + bytes([psel, 0, 0])
            )
            out += seg(0xFFDA, sos)
            out += _ll_entropy_scan(d & 0xFFFF)
            prev = lvl
            continue
        # SUBSAMPLED differential frame: residual grids per component
        # (decimated), interleaved T.81 A.2 MCU order, zero prediction
        out += seg(
            sofm, struct.pack(">BHHB", precision, lh, lw, nc) + comps_sub
        )
        sos = (
            bytes([nc])
            + b"".join(bytes([c + 1, 0x00]) for c in range(nc))
            + bytes([psel, 0, 0])
        )
        out += seg(0xFFDA, sos)
        mcuy, mcux = -(-lh // 2), -(-lw // 2)
        padded = []
        for c, (hi, vi) in enumerate(sub_fac):
            g = (d[:: 2 // vi, :: 2 // hi, c]) & 0xFFFF
            gp = np.zeros((mcuy * vi, mcux * hi), dtype=np.int64)
            gp[: g.shape[0], : g.shape[1]] = g
            padded.append(gp)
        writer = _BitWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for c, (hi, vi) in enumerate(sub_fac):
                    for by in range(vi):
                        for bx in range(hi):
                            v = int(padded[c][my * vi + by, mx * hi + bx])
                            if v == 32768:
                                code, ln = codes[16]
                                writer.write(code, ln)
                                continue
                            sd = v - 65536 if v > 32768 else v
                            cat = abs(sd).bit_length()
                            code, ln = codes[cat]
                            writer.write(code, ln)
                            if cat:
                                amp = (
                                    sd
                                    if sd >= 0
                                    else sd + (1 << cat) - 1
                                )
                                writer.write(amp, cat)
        out += writer.flush()
        # mirror the decoder's fold: masked grids replicate up, add to
        # the reference mod 2^16, mask to P bits
        planes = []
        for c, (hi, vi) in enumerate(sub_fac):
            yc, xc = -(-lh * vi // 2), -(-lw * hi // 2)
            p_ = padded[c][:yc, :xc] & out_mask
            p_ = np.repeat(
                np.repeat(p_, 2 // vi, axis=0), 2 // hi, axis=1
            )[:lh, :lw]
            planes.append(p_)
        full = np.stack(planes, axis=-1)
        prev = ((ref + full) & 0xFFFF) & out_mask
    out += b"\xff\xd9"
    return bytes(out)


def synth_jpeg_hier_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Hierarchical-JPEG synthesis (q425): per doc a 2-4 level lossless
    pyramid (levels = doc_id%3+2) whose full-size pixels tile the md5
    hex of the text — the decoded payload md5 is SQL-recomputable
    exactly as for q401. Round 10: even doc_ids code their
    INTERMEDIATE differential frames with 4:2:0 chroma residuals (the
    closed subsampled-lossless-in-hierarchy corner); decode stays
    bit-exact, so the oracle is unchanged."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                did = int(doc_id)
                w_ = did % 11 + 6
                h = did % 5 + 4
                hx = hashlib.md5(
                    (text or "").encode("utf-8")
                ).hexdigest().encode("ascii")
                need = h * w_ * 3
                arr = np.frombuffer(
                    (hx * (need // 32 + 1))[:need], dtype=np.uint8
                ).reshape(h, w_, 3)
                rows.append(
                    {
                        "media_id": did,
                        "content": _pixels_to_jpeg_hierarchical(
                            arr, levels=did % 3 + 2,
                            residual_subsampling="420"
                            if did % 2 == 0
                            else "444",
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )


# ---------------------------------------------------------------------------
# Arithmetic LOSSLESS JPEG (SOF11, T.81 process: lossless arithmetic;
# plus SOF15, its differential twin inside hierarchical streams) —
# the Annex H.1.1 statistical model over the Annex D QM coder already
# built for SOF9/SOF10: each difference is coded with the DC decision
# tree conditioned on the 5x5 classification of (Da, Db) — the diffs
# coded immediately left and above — giving 25 four-bin contexts plus
# two X/M magnitude-chain sets (second set when Db classifies large):
# 25*4 + 2*29 = 158 statistics bins, the spec's H.1.1 bank size.
# ---------------------------------------------------------------------------

_LL_STAT_BINS = 158


def _arith_ll_classify(diff: int, l: int, u: int) -> int:
    """5-way conditioning class of a previously-coded difference:
    0 zero/near-zero, 1/2 small +/-, 3/4 large +/- (the same L/U
    banding the SOF9 DC model uses, from the DAC segment)."""
    if diff == 0:
        return 0
    sign = 1 if diff < 0 else 0
    v = abs(diff) - 1
    m = 0 if v == 0 else 1 << (v.bit_length() - 1)
    if m < ((1 << l) >> 1):
        return 0
    if m > ((1 << u) >> 1):
        return 3 + sign
    return 1 + sign


def _arith_put_ll(enc, st: bytearray, c0: int, sbase: int, sd: int) -> None:
    """Code one signed difference on the 4-bin tree at c0 with the
    X/M chain at sbase (H.1.1 tree = the F.1.4.1 DC tree)."""
    if sd == 0:
        enc.code(st, c0, 0)
        return
    enc.code(st, c0, 1)
    sign = 1 if sd < 0 else 0
    enc.code(st, c0 + 1, sign)
    pos = c0 + 2 + sign
    v = abs(sd) - 1
    m = 0
    if v:
        enc.code(st, pos, 1)
        m = 1
        pos = sbase
        v2 = v
        while v2 >> 1:
            enc.code(st, pos, 1)
            m <<= 1
            pos += 1
            v2 >>= 1
    enc.code(st, pos, 0)
    pos += 14
    mm = m >> 1
    while mm:
        enc.code(st, pos, 1 if v & mm else 0)
        mm >>= 1


def _arith_get_ll(dec, st: bytearray, c0: int, sbase: int) -> int:
    if dec.decode(st, c0) == 0:
        return 0
    sign = dec.decode(st, c0 + 1)
    pos = c0 + 2 + sign
    m = dec.decode(st, pos)
    if m:
        pos = sbase
        while dec.decode(st, pos):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic lossless magnitude overflow")
            pos += 1
    v = m
    pos += 14
    mm = m >> 1
    while mm:
        if dec.decode(st, pos):
            v |= mm
        mm >>= 1
    v += 1
    return -v if sign else v


def _decode_lossless_arith_scan_sampled(
    content: bytes,
    pos: int,
    size: int,
    body: bytes,
    sof,
    samples: np.ndarray,
    dc_cond: dict,
    restart_interval: int,
    precision: int,
    differential: bool = False,
) -> int:
    """QM-coded lossless scan for SUBSAMPLED frames (round 10 — the
    arithmetic twin of _decode_lossless_scan_sampled): T.81 A.2 MCU
    interleave over each component's OWN grid, (Da, Db) conditioning
    from per-grid difference history, zero prediction in differential
    frames. Restart markers in sampled scans stay a loud boundary
    (mirroring the Huffman convention)."""
    h, w, comps, hmax, vmax = sof
    ns = body[0]
    members = []
    for i in range(ns):
        cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
        ci = next(j for j, c in enumerate(comps) if c[0] == cs)
        members.append((ci, tdta >> 4))
    psel = body[1 + 2 * ns]
    pt = body[3 + 2 * ns] & 0x0F
    default = 1 << (precision - pt - 1)
    mask = 0xFFFF
    if restart_interval:
        raise NotImplementedError(
            "restart markers in subsampled lossless scans"
        )
    if ns > 1:
        mcuy, mcux = -(-h // vmax), -(-w // hmax)
        shapes = [(comps[ci][2], comps[ci][1]) for ci, _ in members]
    else:
        ci0 = members[0][0]
        mcuy = -(-h * comps[ci0][2] // vmax)
        mcux = -(-w * comps[ci0][1] // hmax)
        shapes = [(1, 1)]
    grids = [
        np.zeros((mcuy * vi, mcux * hi), dtype=np.int64)
        for (vi, hi) in shapes
    ]
    diffs = [np.zeros_like(g) for g in grids]
    dec = _ArithDecoder(content, pos + 2 + size)
    stats = {td: bytearray(_LL_STAT_BINS) for _, td in members}
    for my in range(mcuy):
        for mx in range(mcux):
            for m, (ci, td) in enumerate(members):
                vi, hi = shapes[m]
                l, u = dc_cond.get(td, (0, 1))
                g, dg = grids[m], diffs[m]
                for by in range(vi):
                    for bx in range(hi):
                        r_, x_ = my * vi + by, mx * hi + bx
                        da = int(dg[r_, x_ - 1]) if x_ > 0 else 0
                        db = int(dg[r_ - 1, x_]) if r_ > 0 else 0
                        ca = _arith_ll_classify(da, l, u)
                        cb = _arith_ll_classify(db, l, u)
                        c0 = 4 * (5 * cb + ca)
                        sbase = 129 if cb >= 3 else 100
                        sd = _arith_get_ll(dec, stats[td], c0, sbase)
                        pred = (
                            0
                            if differential
                            else _ll_predict2d(g, r_, x_, psel, default)
                        )
                        g[r_, x_] = (pred + sd) & mask
                        dg[r_, x_] = sd
    out_mask = mask if differential else ((1 << precision) - 1)
    for m, (ci, _td) in enumerate(members):
        yc = -(-h * comps[ci][2] // vmax)
        xc = -(-w * comps[ci][1] // hmax)
        samples[:yc, :xc, ci] = (grids[m][:yc, :xc] << pt) & out_mask
    p = dec.marker_pos if dec.marker_pos is not None else dec.bp
    while p + 1 < len(content) and not (
        content[p] == 0xFF and content[p + 1] != 0x00
    ):
        p += 1
    return p


def _decode_lossless_arith_scan(
    content: bytes,
    pos: int,
    size: int,
    body: bytes,
    sof,
    samples: np.ndarray,
    dc_cond: dict,
    restart_interval: int,
    precision: int,
    differential: bool = False,
) -> int:
    """Decode one SOF11/SOF15 scan into `samples` — the QM twin of
    _decode_lossless_scan with (Da, Db)-conditioned contexts. Restart
    markers re-prime the coder and reset statistics, prediction, and
    the difference history (mirroring the Huffman convention)."""
    h, w, comps, _hm, _vm = sof
    if (_hm, _vm) != (1, 1):  # round 10: the last lossless corner
        return _decode_lossless_arith_scan_sampled(
            content, pos, size, body, sof, samples, dc_cond,
            restart_interval, precision, differential,
        )
    ns = body[0]
    members = []
    for i in range(ns):
        cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
        ci = next(j for j, c in enumerate(comps) if c[0] == cs)
        members.append((ci, tdta >> 4))
    psel = body[1 + 2 * ns]
    pt = body[3 + 2 * ns] & 0x0F
    default = 1 << (precision - pt - 1)
    mask = 0xFFFF

    state: dict = {}

    def reset_state(at: int) -> None:
        state["dec"] = _ArithDecoder(content, at)
        state["st"] = {td: bytearray(_LL_STAT_BINS) for _, td in members}
        state["fresh"] = [True] * len(members)
        state["prevs"] = [None] * len(members)
        state["dprev"] = [
            np.zeros(w, dtype=np.int64) for _ in members
        ]
        state["drow"] = [np.zeros(w, dtype=np.int64) for _ in members]

    reset_state(pos + 2 + size)
    rows = [np.zeros(w, dtype=np.int64) for _ in members]

    def next_marker() -> int:
        dec = state["dec"]
        p = dec.marker_pos if dec.marker_pos is not None else dec.bp
        while p + 1 < len(content) and not (
            content[p] == 0xFF and content[p + 1] != 0x00
        ):
            p += 1
        return p

    since_restart = 0
    for y in range(h):
        for x in range(w):
            if (
                restart_interval
                and since_restart
                and since_restart % restart_interval == 0
            ):
                p = next_marker()
                mk = struct.unpack_from(">H", content, p)[0]
                if not 0xFFD0 <= mk <= 0xFFD7:
                    raise ValueError("expected RSTn in arithmetic scan")
                reset_state(p + 2)
                since_restart = 0
            dec = state["dec"]
            for m, (ci, td) in enumerate(members):
                l, u = dc_cond.get(td, (0, 1))
                da = int(state["drow"][m][x - 1]) if x > 0 else 0
                db = int(state["dprev"][m][x])
                ca = _arith_ll_classify(da, l, u)
                cb = _arith_ll_classify(db, l, u)
                c0 = 4 * (5 * cb + ca)
                sbase = 129 if cb >= 3 else 100
                sd = _arith_get_ll(dec, state["st"][td], c0, sbase)
                if differential:
                    pred = 0
                else:
                    pred = _ll_predict(
                        rows[m], state["prevs"][m], x, psel, default,
                        state["fresh"][m],
                    )
                rows[m][x] = (pred + sd) & mask
                state["drow"][m][x] = sd
                state["fresh"][m] = False
            since_restart += 1
        for m, (ci, _td) in enumerate(members):
            if differential:
                samples[y, :, ci] = (rows[m] << pt) & mask
            else:
                samples[y, :, ci] = (rows[m] << pt) & ((1 << precision) - 1)
            state["prevs"][m] = rows[m].copy()
            state["dprev"][m] = state["drow"][m].copy()
    return next_marker()


def _ll_arith_entropy(
    values: np.ndarray,
    pred_mode: str,
    psel: int,
    precision: int,
    pt: int,
    restart_interval: int,
    cond: tuple[int, int],
) -> bytes:
    """Entropy body for SOF11 ('predict' mode: values are samples,
    predictor applied) or SOF15 ('diff' mode: values are mod-2^16
    differences coded directly). Returns scan bytes incl. RSTn."""
    h, w, nc = values.shape
    default = 1 << (precision - pt - 1)
    mask = 0xFFFF
    l, u = cond
    out = bytearray()

    def fresh_state():
        # ONE statistics bank: every component declares conditioning
        # table 0, and the spec banks statistics per table destination
        # (the decoder shares accordingly)
        return (
            _ArithEncoder(),
            bytearray(_LL_STAT_BINS),
            [True] * nc,
            [None] * nc,
            [np.zeros(w, dtype=np.int64) for _ in range(nc)],
            [np.zeros(w, dtype=np.int64) for _ in range(nc)],
        )

    enc, st, fresh, prevs, dprev, drow = fresh_state()
    rows = [np.zeros(w, dtype=np.int64) for _ in range(nc)]
    shifted = values.astype(np.int64) >> pt if pred_mode == "predict" else values
    since_restart = 0
    rst = 0
    for y in range(h):
        for x in range(w):
            if (
                restart_interval
                and since_restart
                and since_restart % restart_interval == 0
            ):
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                enc, st, fresh, prevs, dprev, drow = fresh_state()
                since_restart = 0
            for c in range(nc):
                da = int(drow[c][x - 1]) if x > 0 else 0
                db = int(dprev[c][x])
                ca = _arith_ll_classify(da, l, u)
                cb = _arith_ll_classify(db, l, u)
                c0 = 4 * (5 * cb + ca)
                sbase = 129 if cb >= 3 else 100
                if pred_mode == "predict":
                    pred = _ll_predict(
                        rows[c], prevs[c], x, psel, default, fresh[c]
                    )
                    val = int(shifted[y, x, c])
                    d16 = (val - pred) & mask
                else:
                    val = int(shifted[y, x, c]) & mask
                    d16 = val
                sd = d16 if d16 <= 32768 else d16 - 65536
                _arith_put_ll(enc, st, c0, sbase, sd)
                rows[c][x] = (0 + sd) & mask if pred_mode == "diff" else val
                drow[c][x] = sd
                fresh[c] = False
            since_restart += 1
        for c in range(nc):
            prevs[c] = rows[c].copy()
            dprev[c] = drow[c].copy()
    out += enc.flush()
    return bytes(out)


def _pixels_to_jpeg_lossless_arith(
    arr: np.ndarray,
    predictor: int = 1,
    pt: int = 0,
    precision: int | None = None,
    restart_interval: int = 0,
    cond: tuple[int, int] = (0, 1),
) -> bytes:
    """GENUINE arithmetic-lossless (SOF11) encoder: the same DPCM
    prediction as the Huffman SOF3 encoder, entropy-coded by the QM
    coder under the H.1.1 model. A DAC segment carries the (L, U)
    conditioning when it differs from the (0, 1) default."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if precision is None:
        precision = 8 if arr.dtype == np.uint8 else 16
    if not 1 <= predictor <= 7:
        raise ValueError("lossless predictor must be 1..7")

    def seg(marker: int, b: bytes) -> bytes:
        return struct.pack(">HH", marker, len(b) + 2) + b

    out = bytearray(b"\xff\xd8")
    comps = b"".join(struct.pack("BBB", c + 1, 0x11, 0) for c in range(nc))
    out += seg(0xFFCB, struct.pack(">BHHB", precision, h, w, nc) + comps)
    if cond != (0, 1):
        out += seg(0xFFCC, bytes([0x00, cond[0] | (cond[1] << 4)]))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([nc]) + b"".join(
        bytes([c + 1, 0x00]) for c in range(nc)
    ) + bytes([predictor, 0, pt])
    out += seg(0xFFDA, sos)
    out += _ll_arith_entropy(
        arr, "predict", predictor, precision, pt, restart_interval, cond
    )
    out += b"\xff\xd9"
    return bytes(out)


def _pixels_to_jpeg_hierarchical_arith(
    arr: np.ndarray, levels: int = 3, precision: int | None = None,
    residual_subsampling: str = "444",
) -> bytes:
    """Hierarchical lossless pyramid with ARITHMETIC entropy coding:
    SOF11 base frame + EXP + differential SOF15 frames (the QM twin of
    _pixels_to_jpeg_hierarchical, incl. the round-10
    ``residual_subsampling='420'`` intermediate-frame mode)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if precision is None:
        precision = 8 if arr.dtype == np.uint8 else 16
    if levels < 2:
        raise ValueError("a hierarchy needs at least 2 levels")
    sub_mid = residual_subsampling == "420" and nc == 3
    if residual_subsampling not in ("444", "420"):
        raise NotImplementedError(
            f"residual subsampling {residual_subsampling!r}"
        )
    pyr = [arr.astype(np.int64)]
    for _ in range(levels - 1):
        pyr.append(pyr[-1][::2, ::2])
    pyr = pyr[::-1]

    def seg(marker: int, b: bytes) -> bytes:
        return struct.pack(">HH", marker, len(b) + 2) + b

    comps = b"".join(struct.pack("BBB", c + 1, 0x11, 0) for c in range(nc))
    sub_fac = [(2, 2)] + [(1, 1)] * (nc - 1)
    comps_sub = b"".join(
        struct.pack("BBB", c + 1, (hi << 4) | vi, 0)
        for c, (hi, vi) in enumerate(sub_fac)
    )
    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDE, struct.pack(">BHHB", precision, h, w, nc) + comps)
    out_mask = (1 << precision) - 1
    prev: np.ndarray | None = None
    for li, lvl in enumerate(pyr):
        lh, lw = lvl.shape[:2]
        subsample_this = sub_mid and 0 < li < len(pyr) - 1
        if li == 0:
            vals, mode, psel, sofm = lvl, "predict", 1, 0xFFCB
        else:
            out += seg(0xFFDF, bytes([0x11]))
            ref = _jpeg_expand(prev, 1, 1, lh, lw)
            vals, mode, psel, sofm = (lvl - ref) & 0xFFFF, "diff", 0, 0xFFCF
        hdr = comps_sub if subsample_this else comps
        out += seg(sofm, struct.pack(">BHHB", precision, lh, lw, nc) + hdr)
        sos = (
            bytes([nc])
            + b"".join(bytes([c + 1, 0x00]) for c in range(nc))
            + bytes([psel, 0, 0])
        )
        out += seg(0xFFDA, sos)
        if not subsample_this:
            out += _ll_arith_entropy(
                vals, mode, psel, precision, 0, 0, (0, 1)
            )
            prev = lvl
            continue
        # subsampled differential frame: decimated residual grids, MCU
        # interleave, the decoder's exact context/statistics evolution
        mcuy, mcux = -(-lh // 2), -(-lw // 2)
        padded = []
        for c, (hi, vi) in enumerate(sub_fac):
            g = vals[:: 2 // vi, :: 2 // hi, c] & 0xFFFF
            gp = np.zeros((mcuy * vi, mcux * hi), dtype=np.int64)
            gp[: g.shape[0], : g.shape[1]] = g
            padded.append(gp)
        out += _ll_arith_entropy_sampled(padded, sub_fac, mcuy, mcux)
        planes = []
        for c, (hi, vi) in enumerate(sub_fac):
            yc, xc = -(-lh * vi // 2), -(-lw * hi // 2)
            p_ = padded[c][:yc, :xc] & 0xFFFF
            p_ = np.repeat(
                np.repeat(p_, 2 // vi, axis=0), 2 // hi, axis=1
            )[:lh, :lw]
            planes.append(p_)
        full = np.stack(planes, axis=-1)
        prev = ((ref + full) & 0xFFFF) & out_mask
    out += b"\xff\xd9"
    return bytes(out)


def _ll_arith_entropy_sampled(
    padded: list, sub_fac: list, mcuy: int, mcux: int
) -> bytes:
    """QM entropy body for a SUBSAMPLED differential lossless frame:
    per-MCU member interleave over the padded component grids, (Da, Db)
    conditioning from each grid's own difference history — the exact
    order/contexts _decode_lossless_arith_scan_sampled replays."""
    enc = _ArithEncoder()
    st = bytearray(_LL_STAT_BINS)
    l, u = 0, 1
    diffs = [np.zeros_like(g) for g in padded]
    for my in range(mcuy):
        for mx in range(mcux):
            for c, (hi, vi) in enumerate(sub_fac):
                dg = diffs[c]
                for by in range(vi):
                    for bx in range(hi):
                        r_, x_ = my * vi + by, mx * hi + bx
                        da = int(dg[r_, x_ - 1]) if x_ > 0 else 0
                        db = int(dg[r_ - 1, x_]) if r_ > 0 else 0
                        ca = _arith_ll_classify(da, l, u)
                        cb = _arith_ll_classify(db, l, u)
                        c0 = 4 * (5 * cb + ca)
                        sbase = 129 if cb >= 3 else 100
                        d16 = int(padded[c][r_, x_]) & 0xFFFF
                        sd = d16 if d16 <= 32768 else d16 - 65536
                        _arith_put_ll(enc, st, c0, sbase, sd)
                        dg[r_, x_] = sd
    return enc.flush()


def synth_jpeg_arith_lossless_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Arithmetic-lossless synthesis (q426): even doc_ids a flat SOF11
    frame (predictor sweeping doc_id%7+1, restarts on the doc_id%4==3
    lane), odd doc_ids a hierarchical SOF11+SOF15 pyramid (levels
    doc_id%3+2; round 10: doc_id%4==1 lanes code intermediate
    differential frames with 4:2:0 chroma residuals — the subsampled
    ARITHMETIC lossless corner, closed). Both are lossless, so the decoded payload md5 is the
    tiled md5 hex — SQL-recomputable like q401/q425."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                did = int(doc_id)
                w_ = did % 11 + 6
                h = did % 5 + 4
                hx = hashlib.md5(
                    (text or "").encode("utf-8")
                ).hexdigest().encode("ascii")
                need = h * w_ * 3
                arr = np.frombuffer(
                    (hx * (need // 32 + 1))[:need], dtype=np.uint8
                ).reshape(h, w_, 3)
                if did % 2 == 0:
                    content = _pixels_to_jpeg_lossless_arith(
                        arr,
                        predictor=did % 7 + 1,
                        restart_interval=5 if did % 4 == 3 else 0,
                    )
                else:
                    content = _pixels_to_jpeg_hierarchical_arith(
                        arr, levels=did % 3 + 2,
                        residual_subsampling="420"
                        if did % 4 == 1
                        else "444",
                    )
                rows.append({"media_id": did, "content": content})
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )


# ---------------------------------------------------------------------------
# FLAC (Free Lossless Audio Codec, public xiph.org format spec /
# RFC 9639) — encoder AND decoder from scratch: fLaC + STREAMINFO
# (incl. the raw-audio MD5), fixed-blocksize frames with UTF-8 frame
# numbers and CRC-8 / CRC-16 integrity (both verified on decode),
# subframe types CONSTANT / VERBATIM / FIXED order 0-4 (encoder picks
# the cheapest order per block), LPC subframes on the DECODE side
# (integer FIR + shift), rice residuals with partition orders and the
# 5-bit escape, wasted-bits unary fields. Mono; 4-32 bit samples.
# FLAC is lossless, so decoded samples EQUAL the source — the q417
# LUT oracle recomputes their exact integer statistics in SQL.
# Boundary (raises): multi-channel assignments (incl. stereo
# decorrelation) and variable-blocksize streams.
# ---------------------------------------------------------------------------


def _crc8_flac(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16_flac(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


def _flac_utf8_number(n: int) -> bytes:
    """FLAC's extended UTF-8 coding of frame/sample numbers."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (5 * nbytes + 1)):  # k-byte capacity = 5k+1 bits
        nbytes += 1
    first_prefix = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(first_prefix | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _flac_read_utf8(data: bytes, pos: int) -> tuple[int, int]:
    b0 = data[pos]
    if b0 < 0x80:
        return b0, pos + 1
    nbytes = 0
    m = b0
    while m & 0x80:
        nbytes += 1
        m = (m << 1) & 0xFF
    n = b0 & (0x7F >> nbytes)
    for i in range(1, nbytes):
        n = (n << 6) | (data[pos + i] & 0x3F)
    return n, pos + nbytes


_FLAC_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _flac_fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


class _FlacBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (v & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.put(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _FlacBitReader:
    """MSB-first bit reader over a bytes buffer. Reads are chunked
    through int.from_bytes (not per-bit Python loops) — the rice
    residual path dominates FLAC decode wall time, and q427's bench
    lane runs ~3x faster with the chunked reader."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos * 8

    def get(self, bits: int) -> int:
        if bits == 0:
            return 0
        start = self.pos
        self.pos += bits
        first = start >> 3
        last = (self.pos - 1) >> 3
        word = int.from_bytes(self.data[first : last + 1], "big")
        drop = 7 - ((self.pos - 1) & 7)
        return (word >> drop) & ((1 << bits) - 1)

    def get_unary(self) -> int:
        data = self.data
        pos = self.pos
        q = 0
        # fast-path whole bytes of zeros, then the bit tail
        while True:
            byte = data[pos >> 3]
            rem = 8 - (pos & 7)
            chunk = byte & ((1 << rem) - 1)
            if chunk == 0:
                q += rem
                pos += rem
                continue
            lead = rem - chunk.bit_length()
            q += lead
            pos += lead + 1
            self.pos = pos
            return q

    def get_signed(self, bits: int) -> int:
        v = self.get(bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def align(self) -> None:
        if self.pos & 7:
            self.pos += 8 - (self.pos & 7)

    def byte_pos(self) -> int:
        return self.pos >> 3


def _flac_rice_cost(res: np.ndarray, p: int) -> int:
    zz = np.where(res >= 0, res.astype(np.int64) * 2, -res.astype(np.int64) * 2 - 1)
    return int((zz >> p).sum()) + len(res) * (p + 1)


def _flac_write_residual(w: "_FlacBitWriter", res: np.ndarray) -> None:
    """Rice method 0, partition order 0, parameter chosen by exhaustive
    cost over 0..14 with the 5-bit verbatim escape as fallback."""
    best_p, best_c = 0, None
    for p in range(15):
        c = _flac_rice_cost(res, p)
        if best_c is None or c < best_c:
            best_p, best_c = p, c
    w.put(0, 2)  # coding method: rice 4-bit
    w.put(0, 4)  # partition order 0
    w.put(best_p, 4)
    for v in res:
        v = int(v)
        zz = 2 * v if v >= 0 else -2 * v - 1
        w.put_unary(zz >> best_p)
        if best_p:
            w.put(zz, best_p)


def _flac_read_residual(
    r: "_FlacBitReader", n: int, order: int
) -> np.ndarray:
    method = r.get(2)
    if method not in (0, 1):
        raise ValueError("reserved FLAC residual method")
    pbits, escape = (4, 0xF) if method == 0 else (5, 0x1F)
    porder = r.get(4)
    nparts = 1 << porder
    out = np.zeros(n, dtype=np.int64)
    idx = 0
    for part in range(nparts):
        cnt = (n + order) // nparts - (order if part == 0 else 0)
        param = r.get(pbits)
        if param == escape:
            raw = r.get(5)
            for i in range(cnt):
                out[idx] = r.get_signed(raw) if raw else 0
                idx += 1
        else:
            for i in range(cnt):
                q = r.get_unary()
                zz = (q << param) | (r.get(param) if param else 0)
                out[idx] = (zz >> 1) ^ -(zz & 1)
                idx += 1
    return out


def _flac_encode_subframe(
    body: "_FlacBitWriter", blk: np.ndarray, bits: int
) -> None:
    """Write one subframe: CONSTANT when flat, else the cheapest of
    FIXED order 0-4 vs VERBATIM (the mono encoder's chooser, reused
    per channel for stereo)."""
    nb = len(blk)
    if nb and np.all(blk == blk[0]):
        body.put(0, 1)
        body.put(0, 6)  # CONSTANT
        body.put(0, 1)
        body.put(int(blk[0]), bits)
        return
    best_order, best_cost, best_res = 0, None, None
    for order in range(0, min(5, nb)):
        res = _flac_fixed_residual(blk, order)
        cost = min(_flac_rice_cost(res, p) for p in range(15))
        cost += order * bits
        if best_cost is None or cost < best_cost:
            best_order, best_cost, best_res = order, cost, res
    verb_cost = nb * bits
    if best_cost is None or verb_cost < best_cost:
        body.put(0, 1)
        body.put(1, 6)  # VERBATIM
        body.put(0, 1)
        for v in blk:
            body.put(int(v), bits)
    else:
        body.put(0, 1)
        body.put(8 + best_order, 6)  # FIXED, order
        body.put(0, 1)  # no wasted bits
        for v in blk[:best_order]:
            body.put(int(v), bits)
        _flac_write_residual(body, best_res)


def _pcm_to_flac(
    samples: np.ndarray,
    sample_rate: int = 8000,
    bits: int = 16,
    block_size: int = 4096,
    force_assignment: int | None = None,
    variable_blocksize: bool = False,
) -> bytes:
    """Encode integer samples to a spec-conformant FLAC stream: (n,)
    mono, or (n, 2) stereo — stereo frames pick the cheapest channel
    assignment per block among independent / left-side / right-side /
    mid-side (the spec's inter-channel decorrelation; the side channel
    carries bits+1). force_assignment pins one code for tests.

    ``variable_blocksize=True`` emits the spec's VARIABLE strategy
    (round-6 verdict item 4): the frame-header strategy bit is 1, the
    UTF-8 coded number is the frame's first SAMPLE number (up to 36
    bits / 7 coded bytes) instead of the frame ordinal, and block
    sizes cycle a deterministic pattern so both explicit blocksize
    field widths (8-bit code 0110 and 16-bit code 0111) appear."""
    import hashlib

    x = samples.astype(np.int64)
    stereo = x.ndim == 2
    if stereo and x.shape[1] != 2:
        raise NotImplementedError("FLAC encoder: mono or 2-channel only")
    n_total = x.shape[0]
    if bits != 16:
        raise NotImplementedError("encoder emits 16-bit streams")
    md5 = hashlib.md5(x.astype("<i2").tobytes()).digest()

    if variable_blocksize:
        cycle = [
            block_size,
            max(2, block_size // 2 - 1),
            max(1, block_size // 3 + 1),
        ]
        starts = []
        s = 0
        while s < n_total:
            starts.append(s)
            # block k gets cycle[k % 3], so the FIRST block is the
            # nominal block_size (review fix: len(starts) is already
            # k+1 here, which skipped cycle[0] entirely)
            s += cycle[(len(starts) - 1) % len(cycle)]
    else:
        starts = list(range(0, n_total, block_size))

    frames = bytearray()
    fno = 0
    min_fs = max_fs = None
    min_bs = max_bs = None
    for si_, start in enumerate(starts):
        end = starts[si_ + 1] if si_ + 1 < len(starts) else n_total
        blk = x[start:end]
        nb = len(blk)
        # RFC 9639 excludes the (possibly short) LAST frame from the
        # STREAMINFO minimum — same rule the fixed branch applies —
        # so a partial tail never drags the written min below 16
        if si_ + 1 < len(starts):
            min_bs = nb if min_bs is None else min(min_bs, nb)
        max_bs = nb if max_bs is None else max(max_bs, nb)

        def _body_for(assignment: int) -> "_FlacBitWriter":
            body = _FlacBitWriter()
            if not stereo:
                _flac_encode_subframe(body, blk, bits)
                return body
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if assignment == 0b0001:
                chans = [(left, bits), (right, bits)]
            elif assignment == 0b1000:  # left/side
                chans = [(left, bits), (side, bits + 1)]
            elif assignment == 0b1001:  # right/side
                chans = [(side, bits + 1), (right, bits)]
            else:  # 0b1010 mid/side
                chans = [((left + right) >> 1, bits), (side, bits + 1)]
            for ch, chbits in chans:
                _flac_encode_subframe(body, ch, chbits)
            return body

        if not stereo:
            assignment = 0
            body = _body_for(0)
        elif force_assignment is not None:
            assignment = force_assignment
            body = _body_for(assignment)
        else:
            cands = [
                (a, _body_for(a)) for a in (0b0001, 0b1000, 0b1001, 0b1010)
            ]
            assignment, body = min(
                cands, key=lambda ab: (len(ab[1].buf), ab[0])
            )

        w = _FlacBitWriter()
        w.put(0b11111111111110, 14)
        w.put(0, 1)  # reserved
        w.put(1 if variable_blocksize else 0, 1)  # blocksize strategy
        # explicit 8-bit (0110) or 16-bit (0111) blocksize field: 0111
        # is spec-legal for ANY nb, so variable streams alternate the
        # two widths by frame parity when nb fits 8 bits (review fix:
        # the synth corpora never reach nb > 256, which made the 16-bit
        # variable path unreachable outside unit tests), and are forced
        # to 16-bit when nb > 256.
        if variable_blocksize:
            bs_code = 0b0110 if (nb <= 256 and fno % 2 == 0) else 0b0111
        else:
            bs_code = 0b0111
        w.put(bs_code, 4)
        w.put(0b0000, 4)  # sample rate: from STREAMINFO
        w.put(assignment, 4)  # channel assignment
        w.put(0b100, 3)  # sample size: 16 bit
        w.put(0, 1)  # reserved
        # variable strategy: the coded number is the frame's first
        # SAMPLE; fixed strategy: the frame ordinal
        for b in _flac_utf8_number(start if variable_blocksize else fno):
            w.put(b, 8)
        w.put(nb - 1, 8 if bs_code == 0b0110 else 16)
        w.align()
        header_bytes = w.bytes()
        header_bytes += bytes([_crc8_flac(header_bytes)])

        body.align()
        frame = header_bytes + body.bytes()
        frame += struct.pack(">H", _crc16_flac(frame))
        frames += frame
        fs = len(frame)
        min_fs = fs if min_fs is None else min(min_fs, fs)
        max_fs = fs if max_fs is None else max(max_fs, fs)
        fno += 1

    si = _FlacBitWriter()
    if variable_blocksize:
        # actual min (excluding the last frame, per RFC 9639) / max
        # over the frames; the written minimum is additionally clamped
        # to the spec floor of 16 so strict third-party decoders never
        # see an out-of-range STREAMINFO — but never above the max
        # (single-tiny-frame streams keep their honest sizes; they are
        # not spec-representable either way)
        mx = max_bs if max_bs is not None else block_size
        mn = min_bs if min_bs is not None else mx
        if mx >= 16:
            mn = min(max(16, mn), mx)
        si.put(mn, 16)
        si.put(mx, 16)
    else:
        # fixed streams: min == max == the nominal size (RFC 9639
        # excludes the possibly-short LAST frame from the minimum)
        si.put(min(block_size, n_total or block_size), 16)
        si.put(block_size, 16)
    si.put(min_fs or 0, 24)
    si.put(max_fs or 0, 24)
    si.put(sample_rate, 20)
    si.put(1 if stereo else 0, 3)  # channels - 1
    si.put(bits - 1, 5)
    si.put(n_total, 36)
    streaminfo = si.bytes() + md5
    out = b"fLaC"
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    return out + bytes(frames)


def _decode_flac(content: bytes) -> dict:
    """GENUINE decoder with integrity verification: CRC-8 per frame
    header, CRC-16 per frame, STREAMINFO MD5 over the decoded audio."""
    import hashlib

    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        hdr = content[pos]
        btype = hdr & 0x7F
        last = bool(hdr & 0x80)
        size = int.from_bytes(content[pos + 1 : pos + 4], "big")
        body = content[pos + 4 : pos + 4 + size]
        if btype == 0:
            streaminfo = body
        pos += 4 + size
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    r = _FlacBitReader(streaminfo, 0)
    _min_bs = r.get(16)
    _max_bs = r.get(16)
    r.get(24), r.get(24)
    sample_rate = r.get(20)
    channels = r.get(3) + 1
    bits = r.get(5) + 1
    n_total = r.get(36)
    want_md5 = streaminfo[18:34]
    if channels > 2:
        raise NotImplementedError(">2-channel FLAC not supported")

    out = np.zeros((n_total, channels), dtype=np.int64)
    idx = 0
    fcount = 0
    while idx < n_total:
        fr = _FlacBitReader(content, pos)
        sync = fr.get(14)
        if sync != 0b11111111111110:
            raise ValueError("FLAC frame sync lost")
        fr.get(1)
        strategy = fr.get(1)
        bs_code = fr.get(4)
        sr_code = fr.get(4)
        ch_code = fr.get(4)
        ss_code = fr.get(3)
        fr.get(1)
        if ch_code not in (0, 1, 8, 9, 10):
            raise NotImplementedError(
                f"FLAC channel assignment {ch_code} not supported"
            )
        fr.align()
        _fno, bytepos = _flac_read_utf8(content, fr.byte_pos())
        # variable strategy (round 7): the coded number is the frame's
        # first SAMPLE number — cross-check it against the running
        # decode position (fixed strategy codes the frame ordinal)
        if strategy == 1:
            if _fno != idx:
                raise ValueError(
                    f"FLAC sample number {_fno} != decode position {idx}"
                )
        elif _fno != fcount:
            raise ValueError(
                f"FLAC frame number {_fno} != frame count {fcount}"
            )
        fr = _FlacBitReader(content, bytepos)
        if bs_code == 0b0110:
            nb = fr.get(8) + 1
        elif bs_code == 0b0111:
            nb = fr.get(16) + 1
        else:
            table = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                     8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                     13: 8192, 14: 16384, 15: 32768}
            nb = table[bs_code]
        if sr_code in (0b1100, 0b1101, 0b1110):
            fr.get(8 if sr_code == 0b1100 else 16)
        fr.align()
        hdr_end = fr.byte_pos()
        if _crc8_flac(content[pos:hdr_end]) != content[hdr_end]:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        fr = _FlacBitReader(content, hdr_end + 1)

        ss_bits = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}.get(ss_code, bits)

        def read_subframe(sub_bits: int) -> np.ndarray:
            if fr.get(1):
                raise ValueError("invalid subframe padding bit")
            stype = fr.get(6)
            wasted = 0
            if fr.get(1):
                wasted = 1 + fr.get_unary()
            eff_bits = sub_bits - wasted
            if stype == 0:  # CONSTANT
                blk = np.full(nb, fr.get_signed(eff_bits), dtype=np.int64)
            elif stype == 1:  # VERBATIM
                blk = np.array(
                    [fr.get_signed(eff_bits) for _ in range(nb)],
                    dtype=np.int64,
                )
            elif 8 <= stype <= 12:  # FIXED
                order = stype - 8
                warm = [fr.get_signed(eff_bits) for _ in range(order)]
                res = _flac_read_residual(fr, nb - order, order)
                blk = np.empty(nb, dtype=np.int64)
                blk[:order] = warm
                coefs = _FLAC_FIXED_COEFS[order]
                for i in range(order, nb):
                    pred = sum(
                        c * blk[i - 1 - j] for j, c in enumerate(coefs)
                    )
                    blk[i] = pred + res[i - order]
            elif stype >= 32:  # LPC
                order = stype - 31
                warm = [fr.get_signed(eff_bits) for _ in range(order)]
                prec = fr.get(4) + 1
                if prec == 16:
                    raise ValueError("invalid LPC precision code")
                shift = fr.get_signed(5)
                coefs = [fr.get_signed(prec) for _ in range(order)]
                res = _flac_read_residual(fr, nb - order, order)
                blk = np.empty(nb, dtype=np.int64)
                blk[:order] = warm
                for i in range(order, nb):
                    pred = sum(
                        c * blk[i - 1 - j] for j, c in enumerate(coefs)
                    ) >> shift
                    blk[i] = pred + res[i - order]
            else:
                raise ValueError(f"reserved FLAC subframe type {stype}")
            if wasted:
                blk = blk << wasted
            return blk

        if ch_code == 0:
            chans = [read_subframe(ss_bits)]
        elif ch_code == 1:
            chans = [read_subframe(ss_bits), read_subframe(ss_bits)]
        elif ch_code == 8:  # left/side
            left = read_subframe(ss_bits)
            side = read_subframe(ss_bits + 1)
            chans = [left, left - side]
        elif ch_code == 9:  # right/side
            side = read_subframe(ss_bits + 1)
            right = read_subframe(ss_bits)
            chans = [right + side, right]
        else:  # 10: mid/side — mid = (L+R)>>1 drops a bit that the
            # side's parity restores: M2 = (mid<<1)|(S&1)
            mid = read_subframe(ss_bits)
            side = read_subframe(ss_bits + 1)
            m2 = (mid << 1) | (side & 1)
            chans = [(m2 + side) >> 1, (m2 - side) >> 1]
        if len(chans) != channels:
            raise ValueError("FLAC frame channel count mismatch")
        fr.align()
        crc_end = fr.byte_pos()
        want = struct.unpack_from(">H", content, crc_end)[0]
        if _crc16_flac(content[pos:crc_end]) != want:
            raise ValueError("FLAC frame CRC-16 mismatch")
        for c, blk in enumerate(chans):
            out[idx : idx + nb, c] = blk
        idx += nb
        fcount += 1
        pos = crc_end + 2

    flat = out.reshape(-1) if channels > 1 else out[:, 0]
    payload = (
        flat.astype("<i2").tobytes()
        if bits <= 16
        else flat.astype("<i4").tobytes()
    )
    if hashlib.md5(payload).digest() != want_md5:
        raise ValueError("FLAC STREAMINFO MD5 mismatch")
    return {
        "kind": "audio",
        "width": channels,
        "height": bits,
        "sample_rate": sample_rate,
        "payload": payload,
    }


def synth_flac_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Real-encoder FLAC synthesis (q427): 16-bit samples derived from
    the md5 hex of the text ((byte-100)*231), tiled doc_id%5+2 times,
    encoded with block_size=48 (multiple frames + a partial tail).
    doc_id%3==1 lanes use the VARIABLE blocksize strategy (round 7) —
    UTF-8 sample-number frame addressing, cycling block sizes, and
    BOTH explicit blocksize field widths (the encoder alternates the
    8-bit 0110 and spec-legal 16-bit 0111 forms by frame parity, so
    every multi-frame variable lane carries both; did%6==1 lanes also
    use a 300-sample nominal block). FLAC is lossless, so the LAYOUT never
    changes the decoded samples and the oracle recomputes exact
    integer stats from a 16-row hex-char LUT unchanged (q417
    recipe)."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                did = int(doc_id)
                hx = hashlib.md5(
                    (text or "").encode("utf-8")
                ).hexdigest().encode("ascii")
                data = hx * (did % 5 + 2)
                samples = (
                    (np.frombuffer(data, dtype=np.uint8).astype(np.int32)
                     - 100) * 231
                ).astype("<i2")
                variable = did % 3 == 1
                rows.append(
                    {
                        "media_id": did,
                        "content": _pcm_to_flac(
                            samples,
                            sample_rate=8000,
                            block_size=300 if did % 6 == 1 else 48,
                            variable_blocksize=variable,
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )


def _pixels_to_jpeg_hierarchical_dct(
    arr: np.ndarray, levels: int = 3, quality: int = 85,
    progressive: bool = False, entropy: str = "huffman",
    subsampling: str = "444", base_progressive: bool = False,
    base_entropy: str = "huffman", residual_subsampling: str = "444",
) -> bytes:
    """Hierarchical DCT progression with a LOSSLESS finish (T.81
    Annex J's flagship use): a lossy baseline (SOF0) frame at the
    smallest pyramid level, EXP + differential sequential-DCT (SOF5)
    refinements coding the quantized DCT of (level - expanded
    reference) with no level shift and no DC prediction, and a final
    same-size differential LOSSLESS (SOF7) frame that corrects the
    lossy reconstruction to the exact source — so the decode is
    bit-exact despite the DCT stages (8-bit; grayscale OR — round 8 —
    RGB, where the lossy base frame is the ordinary YCbCr baseline
    encode and every differential frame codes componentwise residuals
    in the OUTPUT color space, no transform). Round 10 closes the last
    T.81 corner: ``residual_subsampling`` ("420"/"422") codes the
    differential frames' CHROMA residual planes at a subsampled grid
    (decimated residual, replicated back up by the decoder's fold) —
    legal per Annex J, and still bit-exact because the final lossless
    frame corrects whatever the expansion loses. The encoder mirrors
    the decoder's reconstruction arithmetic at every stage to compute
    the next difference."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype != np.uint8:
        raise NotImplementedError("hierarchical DCT encoder: 8-bit samples")
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("hierarchical DCT encoder: 1 or 3 channels")
    if levels < 2:
        raise ValueError("a hierarchy needs at least 2 levels")
    pyr = [arr.astype(np.int64)]
    for _ in range(levels - 1):
        pyr.append(pyr[-1][::2, ::2])
    pyr = pyr[::-1]

    def seg(marker: int, b: bytes) -> bytes:
        return struct.pack(">HH", marker, len(b) + 2) + b

    comps_b = b"".join(struct.pack("BBB", c + 1, 0x11, 0) for c in range(nc))
    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDE, struct.pack(">BHHB", 8, h, w, nc) + comps_b)

    # base frame: the plain sequential encoder's output minus SOI/EOI
    # (color bases may be chroma-subsampled — the decoder's fold
    # replicates chroma up exactly like _reconstruct_jpeg; residual
    # frames are always full-resolution 1x1)
    base = _pixels_to_jpeg(
        pyr[0].astype(np.uint8), quality, subsampling if nc == 3 else "444",
        progressive=base_progressive, entropy=base_entropy,
    )
    out += base[2:-2]
    recon = np.frombuffer(
        _decode_jpeg(base)["payload"], dtype=np.uint8
    ).reshape(pyr[0].shape).astype(np.int64)

    qt = _quality_scaled(_QUANT_LUM, quality)
    dc_codes = _huff_codes(*_HUFF_DC_12)  # categories up to 15
    ac_codes = _huff_codes(*_HUFF_AC_12)
    # residual-frame sampling factors (round 10): chroma residuals may
    # be coded at a subsampled grid; grayscale / "444" stays 1x1
    if nc == 3 and residual_subsampling == "420":
        rfac = [(2, 2), (1, 1), (1, 1)]
    elif nc == 3 and residual_subsampling == "422":
        rfac = [(2, 1), (1, 1), (1, 1)]
    elif residual_subsampling == "444" or nc == 1:
        rfac = [(1, 1)] * nc
    else:
        raise NotImplementedError(
            f"residual subsampling {residual_subsampling!r}"
        )
    rhmax = max(f[0] for f in rfac)
    rvmax = max(f[1] for f in rfac)
    comps_res_b = b"".join(
        struct.pack("BBB", c + 1, (hi << 4) | vi, 0)
        for c, (hi, vi) in enumerate(rfac)
    )
    for lvl in pyr[1:]:
        lh, lw = lvl.shape[:2]
        out += seg(0xFFDF, bytes([0x11]))  # EXP 2x both directions
        ref = _jpeg_expand(recon, 1, 1, lh, lw)
        d = (lvl - ref).astype(np.float64)
        mcuy, mcux = -(-lh // (8 * rvmax)), -(-lw // (8 * rhmax))
        out += seg(
            0xFFDB, bytes([0]) + bytes(qt[_ZIGZAG].astype(np.uint8))
        )
        bits12, vals12 = _HUFF_DC_12
        out += seg(0xFFC4, b"\x00" + bytes(bits12) + bytes(vals12))
        abits12, avals12 = _HUFF_AC_12
        out += seg(0xFFC4, b"\x10" + bytes(abits12) + bytes(avals12))
        if entropy == "arith":
            sofm_dct = 0xFFCE if progressive else 0xFFCD
        else:
            sofm_dct = 0xFFC6 if progressive else 0xFFC5
        out += seg(
            sofm_dct, struct.pack(">BHHB", 8, lh, lw, nc) + comps_res_b
        )
        stores = []
        rec_planes = []
        for c, (hi, vi) in enumerate(rfac):
            nbh, nbw = mcuy * vi, mcux * hi
            # component residual at ITS grid: decimate (the decoder's
            # fold replicates back up; the lossless finish corrects)
            sub = d[:: rvmax // vi, :: rhmax // hi, c]
            sub = np.pad(
                sub,
                ((0, nbh * 8 - sub.shape[0]), (0, nbw * 8 - sub.shape[1])),
            )
            rec_plane = np.zeros((nbh * 8, nbw * 8), dtype=np.float64)
            store = np.zeros((nbh, nbw, 64), dtype=np.int64)
            for by in range(nbh):
                for bx in range(nbw):
                    block = sub[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    coeffs = _DCT @ block @ _DCT.T  # NO level shift
                    quant = np.round(
                        coeffs / qt.reshape(8, 8)
                    ).astype(np.int64)
                    store[by, bx] = quant.reshape(64)[_ZIGZAG]
                    rec_plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        _DCT.T
                        @ (quant * qt.reshape(8, 8)).astype(np.float64)
                        @ _DCT
                    )
            stores.append(store)
            rec_planes.append(rec_plane)

        def _sosb(members, ss2, se2, ah2, al2):
            b = bytes([len(members)])
            for ci in members:
                # arith statistics areas follow the coder's tid rule
                # (component 0 -> area 0, chroma -> area 1); the
                # Huffman path defines table 0 only
                tbl = 0x11 if (entropy == "arith" and ci > 0) else 0x00
                b += bytes([ci + 1, tbl])
            return b + bytes([ss2, se2, (ah2 << 4) | al2])

        def _rst(scan, writer, rst):
            scan += writer.flush()
            scan += bytes([0xFF, 0xD0 + (rst % 8)])
            return _BitWriter()

        if entropy == "arith":
            for sosb, data in _arith_scans(
                stores, rfac, mcuy, mcux, 0, progressive,
                _sosb, lh, lw, rhmax, rvmax, differential=True,
            ):
                out += seg(0xFFDA, sosb)
                out += data
        elif progressive:
            for sosb, data in _progressive_scans(
                stores, rfac, [(dc_codes, ac_codes)] * nc,
                mcuy, mcux, 0, _sosb, _rst, lh, lw, rhmax, rvmax,
                differential=True,
            ):
                out += seg(0xFFDA, sosb)
                out += data
        else:
            out += seg(
                0xFFDA,
                bytes([nc])
                + b"".join(bytes([c + 1, 0x00]) for c in range(nc))
                + bytes([0, 63, 0]),
            )
            writer = _BitWriter()
            for my in range(mcuy):
                for mx in range(mcux):
                    for c, (hi, vi) in enumerate(rfac):
                        for by in range(vi):  # interleaved MCU order
                            for bx in range(hi):
                                _encode_component_block(
                                    writer,
                                    stores[c][my * vi + by, mx * hi + bx],
                                    0, dc_codes, ac_codes,
                                )
            out += writer.flush()
        # mirror the decoder's fold exactly: crop each plane to its
        # component grid, replicate subsampled planes up, crop to the
        # level dims, then round the SUM once
        planes = []
        for (hi, vi), rp in zip(rfac, rec_planes):
            ch_, cw_ = -(-lh * vi // rvmax), -(-lw * hi // rhmax)
            p = rp[:ch_, :cw_]
            if (hi, vi) != (rhmax, rvmax):
                p = np.repeat(
                    np.repeat(p, rvmax // vi, axis=0), rhmax // hi, axis=1
                )
            planes.append(p[:lh, :lw])
        rec = np.stack(planes, axis=-1)
        recon = np.clip(
            np.round(ref.astype(np.float64) + rec), 0, 255
        ).astype(np.int64)

    # final lossless correction frame (same size, no EXP)
    d16 = (pyr[-1] - recon) & 0xFFFF
    bits, vals = _HUFF_LL
    out += seg(0xFFC4, b"\x00" + bytes(bits) + bytes(vals))
    out += seg(0xFFC7, struct.pack(">BHHB", 8, h, w, nc) + comps_b)
    out += seg(
        0xFFDA,
        bytes([nc])
        + b"".join(bytes([c + 1, 0x00]) for c in range(nc))
        + bytes([0, 0, 0]),
    )
    out += _ll_entropy_scan(d16)
    out += b"\xff\xd9"
    return bytes(out)


def synth_jpeg_hier_dct_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Hierarchical-DCT synthesis (q431): lossy SOF0 base +
    a differential-DCT pyramid cycling ALL FOUR differential DCT frame
    kinds by doc_id%4 — sequential/progressive Huffman (SOF5/SOF6) and
    sequential/progressive ARITHMETIC (SOF13/SOF14) — finished by a
    lossless SOF7 correction frame: decode is bit-exact, so the
    payload md5 is the tiled md5 hex itself. Levels cycle doc_id%3+2,
    quality cycles {50,75,92}. Round 8: doc_id%5>=3 lanes are RGB
    (color base frame — 4:2:0 chroma-subsampled on the even ids).
    Round 10: the color lanes' RESIDUAL frames cycle subsampling too —
    doc_id%3==0 codes the differential chroma residuals at 4:2:0 (the
    last T.81 corner, closed) — the rest stay full-resolution; decode
    is bit-exact regardless, so the md5 oracle is unchanged."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                did = int(doc_id)
                w_ = did % 11 + 6
                h = did % 5 + 4
                color = did % 5 >= 3
                hx = hashlib.md5(
                    (text or "").encode("utf-8")
                ).hexdigest().encode("ascii")
                need = h * w_ * (3 if color else 1)
                arr = np.frombuffer(
                    (hx * (need // 32 + 1))[:need], dtype=np.uint8
                ).reshape((h, w_, 3) if color else (h, w_))
                rows.append(
                    {
                        "media_id": did,
                        "content": _pixels_to_jpeg_hierarchical_dct(
                            arr,
                            levels=did % 3 + 2,
                            quality={0: 50, 1: 75, 2: 92}[did % 3],
                            progressive=bool(did % 2),
                            entropy="arith" if did % 4 >= 2 else "huffman",
                            subsampling="420"
                            if color and did % 2 == 0
                            else "444",
                            # round 8: the base frame itself cycles
                            # progressive (SOF2) and arithmetic
                            # (SOF9/SOF10) non-differential kinds
                            base_progressive=did % 7 in (1, 4),
                            base_entropy="arith"
                            if did % 7 >= 5
                            else "huffman",
                            residual_subsampling="420"
                            if color and did % 3 == 0
                            else "444",
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )


def sniff_media_format(content: bytes) -> str:
    """Magic-byte format sniffing over the supported container set —
    the dispatch _decode_payload uses, surfaced as a value."""
    if content[:4] == _MAGIC:
        return "luxm"
    if content[:2] == b"BM":
        return "bmp"
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if content[:2] == b"\xff\xd8":
        return "jpeg"
    if content[:4] == b"RIFF":
        return "avi" if content[8:12] == b"AVI " else "wav"
    if content[:4] == b"GIF8":
        return "gif"
    if content[:4] == b"fLaC":
        return "flac"
    if content[:2] in (b"II", b"MM") and len(content) >= 4:
        bo = "<" if content[:2] == b"II" else ">"
        if struct.unpack_from(f"{bo}H", content, 2)[0] == 42:
            return "tiff"
    return "unknown"


def synth_mixed_media_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Mixed-format corpus (q434): five container formats cycling by
    doc_id%5, all built from the SAME md5-hex tiling with the SAME
    geometry rule so one SQL oracle covers every lane —
    0 TIFF (RGB, compression cycling), 1 GIF (palette, decoded pixels
    = each char x3), 2 lossless JPEG (RGB), 3 hierarchical arithmetic
    lossless JPEG (RGB), 4 MJPEG AVI (last frame = hex rotated by
    n_frames-1)."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                did = int(doc_id)
                w_ = did % 11 + 6
                h = did % 5 + 4
                hx = hashlib.md5(
                    (text or "").encode("utf-8")
                ).hexdigest().encode("ascii")
                need = h * w_ * 3
                rgb = np.frombuffer(
                    (hx * (need // 32 + 1))[:need], dtype=np.uint8
                ).reshape(h, w_, 3)
                lane = did % 5
                if lane == 0:
                    content = _pixels_to_tiff(
                        rgb,
                        compression={0: 1, 1: 32773, 2: 5}[did % 3],
                        byte_order="MM" if did % 2 else "II",
                    )
                elif lane == 1:
                    gray = np.frombuffer(
                        (hx * (h * w_ // 32 + 1))[: h * w_], dtype=np.uint8
                    ).reshape(h, w_)
                    idx = np.zeros((h, w_), dtype=np.uint8)
                    pal = np.zeros((256, 3), dtype=np.uint8)
                    uniq = np.unique(gray)
                    for i, v in enumerate(uniq):
                        pal[i] = (v, v, v)
                        idx[gray == v] = i
                    content = _pixels_to_gif(idx, pal, interlace=bool(did % 2))
                elif lane == 2:
                    content = _pixels_to_jpeg_lossless(
                        rgb, predictor=did % 7 + 1
                    )
                elif lane == 3:
                    content = _pixels_to_jpeg_hierarchical_arith(
                        rgb, levels=did % 3 + 2
                    )
                else:
                    frames = []
                    for f in range(did % 4 + 2):
                        rot = hx[f:] + hx[:f]
                        arr = np.frombuffer(
                            (rot * (need // 32 + 1))[:need], dtype=np.uint8
                        ).reshape(h, w_, 3)
                        frames.append(
                            _pixels_to_jpeg_lossless(
                                arr, predictor=(did + f) % 7 + 1
                            )
                        )
                    content = _frames_to_avi(frames, w_, h)
                rows.append({"media_id": did, "content": content})
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )


def decode_mixed_media(media: DataFrame) -> DataFrame:
    """Sniff + uniform decode of a mixed-format corpus: one map stage
    per batch, format from the magic bytes, payload digest from the
    format's own decoder."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                d = _decode_payload(b)
                out.append(
                    {
                        "media_id": int(mid),
                        "format": sniff_media_format(b),
                        "width": d["width"],
                        "height": d["height"],
                        "payload_bytes": len(d["payload"]),
                        "payload_md5": hashlib.md5(d["payload"]).hexdigest(),
                    }
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        run,
        "media_id long, format string, width int, height int, "
        "payload_bytes long, payload_md5 string",
    )


def demux_avi_av(media: DataFrame) -> DataFrame:
    """A/V demux statistics per container: video frame count + exact
    integer stats of the interleaved PCM audio track (the shape that
    makes the audio side oracle-checkable, as in q417/q427). One map
    stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                frames, w, h, fps, audio, fmt, alen = _avi_demux(
                    bytes(content)
                )
                if fmt is None:
                    raise ValueError("AVI has no audio stream to demux")
                tag, ch, rate, _br, align, bits = fmt
                if tag == 1:  # 16-bit linear PCM
                    pcm = np.frombuffer(audio, dtype="<i2")
                elif tag in (6, 7):  # G.711 A-law / mu-law
                    lut = _ALAW_LUT if tag == 6 else _ULAW_LUT
                    pcm = lut[np.frombuffer(audio, dtype=np.uint8)]
                elif tag == 0x11:  # IMA ADPCM, truncated via dwLength
                    pcm = _ima_adpcm_decode(audio, align, alen, ch)
                else:
                    raise NotImplementedError(
                        f"AVI audio format {tag} not supported"
                    )
                out.append(
                    {
                        "media_id": int(mid),
                        "n_frames": len(frames),
                        "width": w,
                        "height": h,
                        "sample_rate": int(rate),
                        "n_samples": len(pcm),
                        "sample_sum": int(pcm.astype(np.int64).sum()),
                        "sample_min": int(pcm.min()) if len(pcm) else 0,
                        "sample_max": int(pcm.max()) if len(pcm) else 0,
                    }
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        run,
        "media_id long, n_frames int, width int, height int, "
        "sample_rate int, n_samples long, sample_sum long, "
        "sample_min int, sample_max int",
    )


def synth_avi_av_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """A/V AVI synthesis (q437): doc_id%4+2 lossless-JPEG frames (the
    q424 rotated tilings) INTERLEAVED with an audio track whose codec
    cycles by doc_id%4 (round 7 — the compressed-audio lanes):

    - 0: 16-bit PCM, samples = (hex byte - 100) * 231 (the q427 rule)
      tiled doc_id%3+1 times;
    - 1 / 3: G.711 mu-law / A-law — the '01wb' bytes ARE the tiled hex
      chars, so decoded samples are the q417 16-char LUT values;
    - 2: IMA ADPCM — the q427-rule samples tiled (doc_id%3+1)*24 times
      (several 256-byte blocks, so chunk splits land on real block
      boundaries), dwLength carrying the true sample count."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                did = int(doc_id)
                w_ = did % 11 + 6
                h = did % 5 + 4
                hx = hashlib.md5(
                    (text or "").encode("utf-8")
                ).hexdigest().encode("ascii")
                need = h * w_ * 3
                frames = []
                for f in range(did % 4 + 2):
                    rot = hx[f:] + hx[:f]
                    arr = np.frombuffer(
                        (rot * (need // 32 + 1))[:need], dtype=np.uint8
                    ).reshape(h, w_, 3)
                    frames.append(
                        _pixels_to_jpeg_lossless(
                            arr, predictor=(did + f) % 7 + 1
                        )
                    )
                lane = did % 4
                reps = did % 3 + 1
                kw: dict = {}
                if lane == 0:
                    audio = (
                        (np.frombuffer(hx * reps, dtype=np.uint8)
                         .astype(np.int32) - 100) * 231
                    ).astype("<i2").tobytes()
                elif lane in (1, 3):
                    audio = hx * reps
                    kw = {"audio_format": 7 if lane == 1 else 6}
                else:
                    samples = (
                        (np.frombuffer(hx * (reps * 24), dtype=np.uint8)
                         .astype(np.int32) - 100) * 231
                    ).astype("<i2")
                    audio = _ima_adpcm_encode(samples, 256)
                    kw = {
                        "audio_format": 0x11,
                        "block_align": 256,
                        "audio_samples": len(samples),
                    }
                rows.append(
                    {
                        "media_id": did,
                        "content": _frames_to_avi(
                            frames, w_, h, fps=10, audio=audio, **kw
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )


def synth_g4_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Real-encoder CCITT G4 TIFF synthesis (round 8): per doc a
    bilevel TIFF whose ink bitmap is the md5-hex NIBBLE bits of the
    text tiled over w*h pixels (pixel p = bit (3 - p%4) of hex digit
    p//4) — a pure SQL-recomputable rule, so the decoded ink sequence
    is under a full oracle. Lane cycle: photometric 0/1 by parity
    (the stored fax sense inverts, the decoded ink NEVER does), MM
    byte order on doc_id%5==0, multi-strip (rows_per_strip=4,
    per-strip coder restart) on doc_id%3==0, and the WHOLE CCITT
    family by doc_id%4 — G4/T.6 MMR, Compression=2 MH-RLE, T.4 G3
    1-D (EOL lines), T.4 G3 2-D (tag bits + K-factor). Compression
    changes container bytes, never the ink — exactly what the oracle
    asserts. One mapInPandas map stage, zero shuffle."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                did = int(doc_id)
                w_ = did % 19 + 9
                h = did % 7 + 5
                hx = hashlib.md5(
                    (text or "").encode("utf-8")
                ).hexdigest()
                need_nibbles = -(-(w_ * h) // 4) + 1
                tiled = (hx * (need_nibbles // 32 + 1))
                ink = np.empty(w_ * h, dtype=np.uint8)
                for p in range(w_ * h):
                    ink[p] = (int(tiled[p // 4], 16) >> (3 - p % 4)) & 1
                comp = {0: 4, 1: 2, 2: 3, 3: 3}[did % 4]
                blob = _encode_tiff_g4(
                    ink.reshape(h, w_),
                    byte_order="MM" if did % 5 == 0 else "II",
                    photometric=did % 2,
                    rows_per_strip=4 if did % 3 == 0 else None,
                    compression=comp,
                    t4_two_d=(did % 4 == 3),
                )
                rows.append({"media_id": did, "content": blob})
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )


def decode_g4_ink_digest(media: DataFrame) -> DataFrame:
    """Decode bilevel TIFFs and digest the INK bit sequence: black
    pixel count, a rank-weighted integer checksum (position-sensitive
    — transposed or shifted ink cannot collide), and md5 of the
    '0'/'1' character string (full-strength, and SQL-buildable unlike
    a raw 0x00/0xFF blob, which DuckDB varchars cannot carry)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = _decode_tiff(bytes(content))
                rgb = np.frombuffer(d["payload"], dtype=np.uint8)
                ink = (rgb[::3] == 0).astype(np.uint8)
                bits = "".join("1" if v else "0" for v in ink)
                out.append(
                    {
                        "media_id": int(mid),
                        "width": d["width"],
                        "height": d["height"],
                        "black_px": int(ink.sum()),
                        "ink_checksum": int(
                            (np.arange(1, len(ink) + 1, dtype=np.int64)
                             * ink).sum()
                        ),
                        "ink_md5": hashlib.md5(
                            bits.encode("ascii")
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        run,
        "media_id long, width int, height int, black_px long, "
        "ink_checksum long, ink_md5 string",
    )


def synth_shot_avi_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Shot-structured MJPEG AVI synthesis (round 8, verdict item 7):
    per doc an AVI of S = doc_id%2+2 SHOTS of L = doc_id%3+2 frames
    each, all lossless SOF3. Shot s's base image tiles
    md5(text || ':' || s) hex over w*h*3 bytes; frame k within the
    shot adds k to every byte (hex ASCII <= 0x66 and k <= 3, so no
    wrap) — small constant within-shot motion (energy exactly w*h*3
    per step) against abrupt content cuts at shot boundaries. Every
    byte of every decoded frame is therefore pure doc_id/text
    arithmetic the oracle replays in SQL."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                did = int(doc_id)
                w_ = did % 11 + 6
                h = did % 5 + 4
                L = did % 3 + 2
                S = did % 2 + 2
                need = h * w_ * 3
                frames = []
                f = 0
                for s in range(S):
                    hx = hashlib.md5(
                        ((text or "") + f":{s}").encode("utf-8")
                    ).hexdigest().encode("ascii")
                    base = np.frombuffer(
                        (hx * (need // 32 + 1))[:need], dtype=np.uint8
                    ).reshape(h, w_, 3)
                    for k in range(L):
                        frames.append(
                            _pixels_to_jpeg_lossless(
                                base + np.uint8(k),
                                predictor=(did + f) % 7 + 1,
                            )
                        )
                        f += 1
                rows.append(
                    {
                        "media_id": did,
                        "content": _frames_to_avi(frames, w_, h, fps=10),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )


def detect_video_shots(media: DataFrame, threshold_factor: int = 2) -> DataFrame:
    """Shot-boundary detection — the standard video-dataset curation
    op: decode every frame, compute the EXACT integer frame-difference
    energy E(f) = sum |frame_f - frame_{f-1}| over all samples, and
    open a new shot whenever E(f) > threshold_factor * w * h * 3
    (i.e. mean absolute change above ``threshold_factor`` levels —
    in-shot motion sits at or near 1). Emits one row per detected
    shot: frame span, the boundary energy that OPENED the shot (0 for
    the first), total motion energy inside the shot, and the md5 of
    the shot's first decoded frame (the keyframe a curation pipeline
    would thumbnail). Container parse + per-frame decode + the energy
    algebra all run map-side over bounded Arrow batches — zero
    shuffle before the final orderBy; at 100 TB this is one map stage
    per video row."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                frames, w, h, _fps = _avi_frames(bytes(content))
                thr = threshold_factor * w * h * 3
                decoded = [
                    np.frombuffer(
                        _decode_payload(fr)["payload"], dtype=np.uint8
                    ).astype(np.int64)
                    for fr in frames
                ]
                energies = [0] + [
                    int(np.abs(decoded[f] - decoded[f - 1]).sum())
                    for f in range(1, len(decoded))
                ]
                starts = [0] + [
                    f for f in range(1, len(decoded)) if energies[f] > thr
                ]
                for si, st in enumerate(starts):
                    en = (
                        starts[si + 1] - 1
                        if si + 1 < len(starts)
                        else len(decoded) - 1
                    )
                    out.append(
                        {
                            "media_id": int(mid),
                            "shot_idx": si,
                            "start_frame": st,
                            "end_frame": en,
                            "n_frames": en - st + 1,
                            "entry_energy": energies[st],
                            "motion_energy": int(
                                sum(energies[st + 1 : en + 1])
                            ),
                            "keyframe_md5": hashlib.md5(
                                decoded[st].astype(np.uint8).tobytes()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "shot_idx", "start_frame", "end_frame",
                    "n_frames", "entry_energy", "motion_energy",
                    "keyframe_md5",
                ],
            )

    return media.select("media_id", "content").mapInPandas(
        run,
        "media_id long, shot_idx int, start_frame int, end_frame int, "
        "n_frames int, entry_energy long, motion_energy long, "
        "keyframe_md5 string",
    )


# ---------------------------------------------------------------------------
# Deep-sample grayscale TIFF (round 8, verdict item 8): BitsPerSample
# 16 (words in the file byte order) and 12 (MSB-first bit-packed, each
# row starting on a byte boundary per spec §4 "Compression" /
# PackBits notes) — the non-8-bit boundary the baseline codec raised
# on, built with the 12-bit machinery the JPEG family already proved
# out. Uncompressed and PackBits (runs over the PACKED bytes) lanes.
# ---------------------------------------------------------------------------


def _encode_tiff_gray_deep(
    vals: np.ndarray,
    bits: int = 16,
    byte_order: str = "II",
    rows_per_strip: int | None = None,
    compression: int = 1,
) -> bytes:
    """Encode (h, w) uint16 grayscale (values < 2^bits) at 12 or 16
    bits per sample, photometric 1 (BlackIsZero), strip layout."""
    if bits not in (12, 16):
        raise ValueError("deep gray encoder: bits 12 or 16 only")
    bo = "<" if byte_order == "II" else ">"
    h, w_ = vals.shape
    if int(vals.max(initial=0)) >= (1 << bits):
        raise ValueError(f"sample exceeds {bits}-bit range")
    rps = rows_per_strip or h

    def row_bytes(row: np.ndarray) -> bytes:
        if bits == 16:
            return row.astype(f"{bo}u2").tobytes()
        s = "".join(f"{int(v):012b}" for v in row)
        s += "0" * (-len(s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))

    strips = []
    for y0 in range(0, h, rps):
        seg = b"".join(row_bytes(vals[y]) for y in range(y0, min(y0 + rps, h)))
        if compression == 32773:
            seg = _packbits_encode(seg)
        elif compression != 1:
            raise NotImplementedError(
                f"deep gray TIFF compression {compression}"
            )
        strips.append(seg)

    out = bytearray()
    out += struct.pack(f"{bo}2sHI", byte_order.encode(), 42, 0)
    strip_offsets = []
    for s in strips:
        strip_offsets.append(len(out))
        out += s
    if len(out) & 1:
        out += b"\0"
    n = len(strips)
    entries = [
        (256, 4, 1, w_), (257, 4, 1, h), (258, 3, 1, bits),
        (259, 3, 1, compression), (262, 3, 1, 1), (277, 3, 1, 1),
        (278, 4, 1, rps),
    ]
    ext: list[bytes] = []
    if n == 1:
        entries.append((273, 4, 1, strip_offsets[0]))
        entries.append((279, 4, 1, len(strips[0])))
    else:
        entries.append((273, 4, n, ("ext", 0)))
        entries.append((279, 4, n, ("ext", 1)))
        ext = [
            struct.pack(f"{bo}{n}I", *strip_offsets),
            struct.pack(f"{bo}{n}I", *[len(s) for s in strips]),
        ]
    entries.sort(key=lambda e: e[0])
    ifd_ofs = len(out)
    struct.pack_into(f"{bo}I", out, 4, ifd_ofs)
    ext_base = ifd_ofs + 2 + 12 * len(entries) + 4
    ext_offsets, cur = [], ext_base
    for p in ext:
        ext_offsets.append(cur)
        cur += len(p)
    ifd = bytearray(struct.pack(f"{bo}H", len(entries)))
    for t, typ, cnt, val in entries:
        ifd += struct.pack(f"{bo}HHI", t, typ, cnt)
        if isinstance(val, tuple):
            ifd += struct.pack(f"{bo}I", ext_offsets[val[1]])
        else:
            ifd += struct.pack(
                f"{bo}{'H' if typ == 3 else 'I'}", int(val)
            ).ljust(4, b"\0")
    ifd += struct.pack(f"{bo}I", 0)
    out += ifd
    for p in ext:
        out += p
    return bytes(out)


def _decode_tiff_gray_deep(content: bytes) -> dict:
    """Decode a 12/16-bit grayscale strip TIFF to exact uint16 samples
    (kind 'image16'; payload = big-endian 2-byte words). Raises on
    anything outside the declared deep-gray envelope."""
    bo = "<" if content[:2] == b"II" else ">"
    (_n,) = struct.unpack_from(f"{bo}H", content, struct.unpack_from(
        f"{bo}I", content, 4)[0])
    # reuse the main tag walk by re-parsing (cheap):
    ifd_ofs = struct.unpack_from(f"{bo}I", content, 4)[0]
    (n_entries,) = struct.unpack_from(f"{bo}H", content, ifd_ofs)
    type_size = {1: 1, 3: 2, 4: 4}
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        t, typ, cnt = struct.unpack_from(
            f"{bo}HHI", content, ifd_ofs + 2 + 12 * i
        )
        if typ not in type_size:
            continue
        slot = ifd_ofs + 2 + 12 * i + 8
        total = type_size[typ] * cnt
        base = (
            slot
            if total <= 4
            else struct.unpack_from(f"{bo}I", content, slot)[0]
        )
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[t] = list(struct.unpack_from(f"{bo}{cnt}{fmt}", content, base))
    w_, h = tags[256][0], tags[257][0]
    bits = tags[258][0]
    compression = tags.get(259, [1])[0]
    rps = tags.get(278, [h])[0]
    if bits not in (12, 16) or tags.get(277, [1])[0] != 1:
        raise NotImplementedError("deep gray decoder: 12/16-bit spp=1")
    row_bytes = w_ * 2 if bits == 16 else (w_ * 12 + 7) // 8
    vals = np.zeros((h, w_), dtype=np.uint16)
    for i, (ofs, cnt) in enumerate(zip(tags[273], tags[279])):
        y0 = i * rps
        n_rows = min(rps, h - y0)
        seg = content[ofs : ofs + cnt]
        if compression == 32773:
            seg = _packbits_decode(seg, n_rows * row_bytes)
        elif compression != 1:
            raise NotImplementedError(
                f"deep gray TIFF compression {compression}"
            )
        if len(seg) < n_rows * row_bytes:
            raise ValueError("short deep-gray segment")
        for r in range(n_rows):
            rb = seg[r * row_bytes : (r + 1) * row_bytes]
            if bits == 16:
                vals[y0 + r] = np.frombuffer(rb, dtype=f"{bo}u2")[:w_]
            else:
                bits_s = "".join(f"{b:08b}" for b in rb)
                vals[y0 + r] = [
                    int(bits_s[12 * x : 12 * x + 12], 2) for x in range(w_)
                ]
    return {
        "kind": "image16",
        "width": w_,
        "height": h,
        "bits": bits,
        "payload": vals.astype(">u2").tobytes(),
    }


def synth_deep_tiff_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deep-gray TIFF synthesis: sample p of doc is the integer value
    of md5-hex digits [bpp/4 per sample] read directly off the tiled
    hex string — so the decoded samples' hex rendering IS the tiled
    string (md5-oracle for free) and every per-sample integer stat is
    SQL arithmetic. Lanes: 12/16 bits by parity, MM on doc_id%5==0,
    multi-strip on %3==0, PackBits on %4 in (2,3)."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                did = int(doc_id)
                w_ = did % 13 + 5
                h = did % 7 + 3
                bits = 12 if did % 2 else 16
                nd = bits // 4
                hx = hashlib.md5(
                    (text or "").encode("utf-8")
                ).hexdigest()
                need = w_ * h * nd
                tiled = (hx * (need // 32 + 2))[:need]
                vals = np.array(
                    [
                        int(tiled[p * nd : (p + 1) * nd], 16)
                        for p in range(w_ * h)
                    ],
                    dtype=np.uint16,
                ).reshape(h, w_)
                rows.append(
                    {
                        "media_id": did,
                        "content": _encode_tiff_gray_deep(
                            vals,
                            bits=bits,
                            byte_order="MM" if did % 5 == 0 else "II",
                            rows_per_strip=3 if did % 3 == 0 else None,
                            compression=32773 if did % 4 in (2, 3) else 1,
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )


def decode_deep_tiff_digest(media: DataFrame) -> DataFrame:
    """Per-media exact integer stats + md5 of the decoded samples'
    canonical hex rendering (3 or 4 lowercase digits per sample, row-
    major) — bit-for-bit the synthesis hex tiling, so fully SQL-
    recomputable."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                d = _decode_tiff_gray_deep(bytes(content))
                vals = np.frombuffer(d["payload"], dtype=">u2").astype(
                    np.int64
                )
                nd = d["bits"] // 4
                hex_s = "".join(f"{int(v):0{nd}x}" for v in vals)
                out.append(
                    {
                        "media_id": int(mid),
                        "width": d["width"],
                        "height": d["height"],
                        "bits": d["bits"],
                        "sample_sum": int(vals.sum()),
                        "sample_min": int(vals.min()),
                        "sample_max": int(vals.max()),
                        "pos_checksum": int(
                            (np.arange(1, len(vals) + 1, dtype=np.int64)
                             * vals).sum()
                        ),
                        "samples_md5": hashlib.md5(
                            hex_s.encode("ascii")
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        run,
        "media_id long, width int, height int, bits int, "
        "sample_sum long, sample_min long, sample_max long, "
        "pos_checksum long, samples_md5 string",
    )


def synth_jpeg_tiff_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """JPEG-in-TIFF (Compression=7) synthesis: the q422 pixel rule
    (even ids RGB = tiled md5-hex bytes; odd gray = tiled byte x3 on
    decode) carried by complete lossless SOF3 JPEG streams per
    segment. Lanes: layout by doc_id%3 (strips / 16x16 tiles /
    planar-2 strips), MM on %5==0, SOF3 predictor (doc_id%7)+1.
    Tiled lanes use the larger q394 dims so edge tiles pad."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                did = int(doc_id)
                layout = did % 3
                if layout == 1:
                    w_ = did % 23 + 14
                    h = did % 13 + 10
                else:
                    w_ = did % 11 + 6
                    h = did % 5 + 4
                hx = hashlib.md5(
                    (text or "").encode("utf-8")
                ).hexdigest().encode("ascii")
                gray = bool(did % 2)
                need = h * w_ * (1 if gray else 3)
                arr = np.frombuffer(
                    (hx * (need // 32 + 1))[:need], dtype=np.uint8
                ).reshape((h, w_) if gray else (h, w_, 3))
                if gray:
                    arr = arr[:, :, None].repeat(1, axis=2)
                kw = dict(
                    byte_order="MM" if did % 5 == 0 else "II",
                    compression=7,
                    gray=gray,
                    jpeg_predictor=did % 7 + 1,
                )
                if layout == 1:
                    kw["tile"] = (16, 16)
                elif layout == 2 and not gray:
                    kw["planar"] = 2
                    kw["rows_per_strip"] = 3
                else:
                    kw["rows_per_strip"] = 3
                rows.append(
                    {
                        "media_id": did,
                        "content": _pixels_to_tiff(
                            arr if not gray else arr[:, :, 0], **kw
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )


# ---------------------------------------------------------------------------
# CCITT Group 3 (ITU-T T.4) — the other fax compressions scanned-
# document TIFFs arrive in (round 8, extending the G4 closure):
#   Compression=2 — "Modified Huffman RLE": each row is an
#     independent 1-D MH run sequence (starting with a white run, 0
#     allowed), rows byte-aligned, no EOLs. Reuses the T.4 run tables.
#   Compression=3 — T.4 G3: every line prefixed by an EOL
#     (000000000001, arbitrary zero fill tolerated before it); with
#     T4Options bit 0 set, a tag bit after each EOL selects 1-D (1) or
#     2-D (0) coding for the line, 2-D lines using the same
#     pass/vertical/horizontal modes as T.6 against the PREVIOUS scan
#     line, with a 1-D line forced every K lines (the fax K-factor).
# ---------------------------------------------------------------------------


def _mh_encode_line(line: np.ndarray) -> str:
    """One 1-D MH line: alternating white/black run codes, first run
    white (length 0 if the line starts black)."""
    w = len(line)
    out = []
    pos, color = 0, 0
    while pos < w:
        run = 0
        while pos + run < w and line[pos + run] == color:
            run += 1
        out.append(_g4_mh_run(run, color))
        pos += run
        color ^= 1
    if color == 1 and w > 0:
        pass  # line ended on a white run boundary; nothing to close
    return "".join(out)


def _mh_decode_line(rd: "_G4BitReader", w: int) -> np.ndarray:
    line = np.zeros(w, dtype=np.uint8)
    pos, color = 0, 0
    while pos < w:
        run = _g4_decode_runlen(rd, color)
        if pos + run > w:
            raise ValueError("MH run overruns line")
        line[pos : pos + run] = color
        pos += run
        color ^= 1
    return line


def _ccitt_rle_encode(bitmap: np.ndarray) -> bytes:
    """TIFF Compression=2: per-row MH, rows byte-aligned."""
    out = []
    for y in range(bitmap.shape[0]):
        bits = _mh_encode_line(bitmap[y])
        bits += "0" * (-len(bits) % 8)
        out.append(bits)
    s = "".join(out)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _ccitt_rle_decode(data: bytes, w: int, h: int) -> np.ndarray:
    rd = _G4BitReader(data)
    out = np.zeros((h, w), dtype=np.uint8)
    for y in range(h):
        out[y] = _mh_decode_line(rd, w)
        rd.pos += -rd.pos % 8  # rows are byte-aligned
    return out


_T4_EOL = "000000000001"


def _t4_encode_2d_line(cur_t, ref_t, w) -> str:
    """One 2-D coded line against the previous scan line — the same
    pass/vertical/horizontal modes as T.6 (T.4 §4.2.1)."""
    out = []
    a0, color = -1, 0
    while a0 < w:
        a1 = _g4_next_flip(cur_t, a0, color, w)
        b1 = _g4_next_flip(ref_t, a0, color, w)
        b2 = _g4_next_any(ref_t, b1, w)
        if b2 < a1:
            out.append(_T6_PASS)
            a0 = b2
        elif abs(a1 - b1) <= 3:
            out.append(_T6_VERT[a1 - b1])
            a0 = a1
            color ^= 1
        else:
            a2 = _g4_next_any(cur_t, a1, w)
            start = a0 if a0 >= 0 else 0
            out.append(_T6_HORIZ)
            out.append(_g4_mh_run(a1 - start, color))
            out.append(_g4_mh_run(a2 - a1, color ^ 1))
            a0 = a2
    return "".join(out)


def _t4_g3_encode(bitmap: np.ndarray, two_d: bool = False, k: int = 4) -> bytes:
    """TIFF Compression=3 stream: EOL before every line; with
    ``two_d``, a tag bit selects the coding (1-D forced on line 0 and
    every k-th line — the fax K-factor)."""
    h, w = bitmap.shape
    out = []
    ref_t = None
    for y in range(h):
        out.append(_T4_EOL)
        use_1d = not two_d or (y % k == 0)
        if two_d:
            out.append("1" if use_1d else "0")
        cur_t = _g4_line_transitions(bitmap[y])
        if use_1d:
            out.append(_mh_encode_line(bitmap[y]))
        else:
            out.append(_t4_encode_2d_line(cur_t, ref_t, w))
        ref_t = cur_t
    s = "".join(out)
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _t4_g3_decode(
    data: bytes, w: int, h: int, two_d: bool = False
) -> np.ndarray:
    rd = _G4BitReader(data)

    def expect_eol() -> None:
        zeros = 0
        while True:
            b = rd._bit()
            if b == "0":
                zeros += 1
                if zeros > 64:
                    raise ValueError("G3 fill run too long (no EOL)")
            else:
                if zeros < 11:
                    raise ValueError("G3 EOL malformed")
                return

    out = np.zeros((h, w), dtype=np.uint8)
    ref_t: list[int] | None = None
    for y in range(h):
        expect_eol()
        use_1d = True
        if two_d:
            use_1d = rd._bit() == "1"
        if use_1d:
            out[y] = _mh_decode_line(rd, w)
        else:
            if ref_t is None:
                raise ValueError("G3 2-D line before any 1-D line")
            cur = out[y]
            a0, color = -1, 0
            while a0 < w:
                kind = rd.code(_T6_MODES, 7, "mode")
                if kind == "P":
                    b1 = _g4_next_flip(ref_t, a0, color, w)
                    b2 = _g4_next_any(ref_t, b1, w)
                    if b2 > w:
                        raise ValueError("G3 pass mode past line end")
                    cur[max(a0, 0) : b2] = color
                    a0 = b2
                elif kind == "H":
                    r1 = _g4_decode_runlen(rd, color)
                    r2 = _g4_decode_runlen(rd, color ^ 1)
                    start = a0 if a0 >= 0 else 0
                    if start + r1 + r2 > w or start + r1 + r2 <= a0:
                        raise ValueError("G3 horizontal runs invalid")
                    cur[start : start + r1] = color
                    cur[start + r1 : start + r1 + r2] = color ^ 1
                    a0 = start + r1 + r2
                else:
                    _v, d = kind
                    b1 = _g4_next_flip(ref_t, a0, color, w)
                    a1 = b1 + d
                    if not 0 <= a1 <= w or a1 <= a0:
                        raise ValueError("G3 vertical mode out of range")
                    cur[max(a0, 0) : a1] = color
                    a0 = a1
                    color ^= 1
        ref_t = _g4_line_transitions(out[y])
    return out


# ---------------------------------------------------------------------------
# WebP lossless (VP8L) — encoder + decoder from the public bitstream
# spec (RFC 9649 / Google "WebP Lossless Bitstream Specification";
# round 9, verdict item 8). The top real-web image format the corpus
# lanes did not cover. Lossless, so the q401-strength full-payload-md5
# oracle applies. Both sides are from scratch: an LSB-first bit reader/
# writer, canonical prefix codes (including the meta code-length code
# with 16/17/18 repeats and the max_symbol early-out), the color
# cache (0x1e35a7bd multiplicative hash), LZ77 backward references,
# and all four transforms — predictor (14 modes), color (signed 3.5
# fixed-point cross-channel deltas), subtract-green, and color
# indexing with sub-byte pixel bundling.
# ---------------------------------------------------------------------------

#: short-distance map: LZ77 distance codes 1..120 address a (dx, dy)
#: pixel neighborhood instead of a raw scanline distance (transcribed
#: from the spec's table; dist = dy * xsize + dx, min 1). The synth
#: encoder only emits codes it can round-trip through this table or
#: raw codes (> 120), so the two sides always agree.
_VP8L_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (6, 5), (-6, 5), (5, 6), (-5, 6),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3), (3, 8),
    (-3, 8), (8, 4), (4, 8), (-4, 8), (8, 5), (-8, 5),
]

#: code-length-code read order (shared with deflate's idea, different
#: constant): index i of this list is the i-th 3-bit length in the
#: stream
_VP8L_CLC_ORDER = [
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
]


class _VP8LBitReader:
    """LSB-first bit reader (VP8L convention: the first bit read is the
    least-significant bit of the value)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte_i, bit_i = divmod(self.pos, 8)
            if byte_i >= len(self.data):
                raise ValueError("VP8L: bitstream truncated")
            v |= ((self.data[byte_i] >> bit_i) & 1) << i
            self.pos += 1
        return v


class _VP8LBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.bit = 0

    def bits(self, v: int, n: int) -> None:
        for i in range(n):
            if self.bit == 0:
                self.out.append(0)
            if (v >> i) & 1:
                self.out[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) % 8

    def bytes(self) -> bytes:
        return bytes(self.out)


def _vp8l_canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical prefix codes from lengths: {symbol: (length, code)}
    with codes assigned in (length, symbol) order — the stream writes/
    reads code bits MSB first."""
    pairs = sorted(
        (ln, sym) for sym, ln in enumerate(lengths) if ln > 0
    )
    codes: dict[int, tuple[int, int]] = {}
    code, prev_len = 0, 0
    for ln, sym in pairs:
        code <<= ln - prev_len
        codes[sym] = (ln, code)
        code += 1
        prev_len = ln
    return codes


class _VP8LPrefixCode:
    """Decoder-side prefix code: either a 0-bit single symbol or a
    (length, code)->symbol walk."""

    def __init__(self, lengths: list[int] | None, single: int | None = None):
        if single is not None:
            self.single = single
            self.table = None
            return
        self.single = None
        nz = [ln for ln in lengths if ln > 0]
        if len(nz) == 1:
            self.single = lengths.index(1) if 1 in lengths else (
                next(s for s, ln in enumerate(lengths) if ln > 0)
            )
            self.table = None
            return
        self.table = {
            (ln, code): sym
            for sym, (ln, code) in _vp8l_canonical_codes(lengths).items()
        }
        # completeness check (kraft) is implicit: unresolvable walks
        # raise at read time

    def read(self, rd: _VP8LBitReader) -> int:
        if self.single is not None:
            return self.single
        acc, ln = 0, 0
        while True:
            acc = (acc << 1) | rd.bits(1)
            ln += 1
            if ln > 15:
                raise ValueError("VP8L: invalid prefix code walk")
            sym = self.table.get((ln, acc))
            if sym is not None:
                return sym


def _vp8l_build_lengths(freqs: dict[int, int], max_len: int = 15):
    """LENGTH-LIMITED prefix-code lengths from symbol frequencies:
    plain Huffman first; if any depth exceeds ``max_len`` (a
    sufficiently skewed distribution — Fibonacci-like frequencies over
    the 280-symbol green alphabet — legitimately can), apply the
    classic depth-rebalancing fixup: clamp to ``max_len``, then move
    codes deeper per-length-count until the Kraft equality
    sum(2^-len) == 1 is restored, and reassign lengths to symbols by
    descending frequency (shortest codes to the most frequent). The
    result is always a complete, decodable canonical code within the
    format's 15-bit cap."""
    import heapq
    import itertools as _it

    syms = sorted(freqs)
    if not syms:
        raise ValueError("VP8L: empty alphabet")
    if len(syms) == 1:
        return {syms[0]: 1}
    cnt = _it.count()
    heap = [(f, next(cnt), {s: 0}) for s, f in sorted(freqs.items())]
    heapq.heapify(heap)
    while len(heap) > 1:
        fa, _ia, da = heapq.heappop(heap)
        fb, _ib, db = heapq.heappop(heap)
        merged = {s: d + 1 for s, d in da.items()}
        merged.update({s: d + 1 for s, d in db.items()})
        heapq.heappush(heap, (fa + fb, next(cnt), merged))
    depths = heap[0][2]
    if max(depths.values()) <= max_len:
        return depths
    # clamp overlong depths, then restore Kraft equality: each step
    # removes one code at max_len and splits one shorter code into two
    # one level deeper — net Kraft change is exactly -1 (scaled by
    # 2^max_len), terminating at equality
    num = [0] * (max_len + 1)
    for d in depths.values():
        num[min(d, max_len)] += 1
    total = sum(n << (max_len - ln) for ln, n in enumerate(num) if ln)
    while total > (1 << max_len):
        num[max_len] -= 1
        for i in range(max_len - 1, 0, -1):
            if num[i]:
                num[i] -= 1
                num[i + 1] += 2
                break
        total -= 1
    # deterministic assignment: most frequent symbol -> shortest code,
    # symbol id breaks frequency ties
    order = iter(sorted(freqs, key=lambda s: (-freqs[s], s)))
    out = {}
    for ln in range(1, max_len + 1):
        for _ in range(num[ln]):
            out[next(order)] = ln
    return out


def _vp8l_write_code(w: _VP8LBitWriter, lengths_by_sym: dict[int, int],
                     alphabet_size: int) -> None:
    """Write one prefix code: the SIMPLE form for <= 2 symbols, else
    the normal code-length-coded form (literal code-length symbols,
    max_symbol early-out)."""
    syms = sorted(lengths_by_sym)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        w.bits(1, 1)  # simple
        w.bits(len(syms) - 1, 1)
        first_8 = 1 if syms[0] > 1 else 0
        w.bits(first_8, 1)
        w.bits(syms[0], 8 if first_8 else 1)
        if len(syms) == 2:
            w.bits(syms[1], 8)
        return
    w.bits(0, 1)  # normal
    lengths = [lengths_by_sym.get(s, 0) for s in range(alphabet_size)]
    last_nz = max(s for s, ln in enumerate(lengths) if ln > 0)
    used = lengths[: last_nz + 1]
    # code-length code over the literal length symbols we will emit
    clc_freq: dict[int, int] = {}
    for ln in used:
        clc_freq[ln] = clc_freq.get(ln, 0) + 1
    clc_lengths = _vp8l_build_lengths(clc_freq, max_len=7)
    # num_code_lengths: enough positions of the CLC order to cover
    # every used code-length symbol
    need = max(
        _VP8L_CLC_ORDER.index(s) for s in clc_lengths
    ) + 1
    num_cl = max(4, need)
    w.bits(num_cl - 4, 4)
    for i in range(num_cl):
        w.bits(clc_lengths.get(_VP8L_CLC_ORDER[i], 0), 3)
    # max_symbol early-out: we emit exactly len(used) literal symbols
    n_emit = len(used)
    if n_emit == alphabet_size:
        w.bits(0, 1)
    else:
        w.bits(1, 1)
        # length_nbits = 2 + 2*k; max_symbol = 2 + bits(length_nbits)
        k = 0
        while (2 + ((1 << (2 + 2 * k)) - 1)) < n_emit:
            k += 1
        w.bits(k, 3)
        w.bits(n_emit - 2, 2 + 2 * k)
    clc_codes = _vp8l_canonical_codes(
        [clc_lengths.get(s, 0) for s in range(19)]
    )
    single_clc = len(clc_lengths) == 1
    for ln in used:
        if single_clc:
            continue  # 0-bit code
        bits_n, code = clc_codes[ln]
        for i in range(bits_n - 1, -1, -1):
            w.bits((code >> i) & 1, 1)


def _vp8l_read_code_lengths(
    rd: _VP8LBitReader, alphabet_size: int
) -> _VP8LPrefixCode:
    """Read one prefix code (simple or normal form)."""
    if rd.bits(1):  # simple
        n_sym = rd.bits(1) + 1
        first_8 = rd.bits(1)
        s0 = rd.bits(8 if first_8 else 1)
        if n_sym == 1:
            return _VP8LPrefixCode(None, single=s0)
        s1 = rd.bits(8)
        lengths = [0] * alphabet_size
        lengths[s0] = 1
        lengths[s1] = 1
        return _VP8LPrefixCode(lengths)
    num_cl = rd.bits(4) + 4
    clc_lengths = [0] * 19
    for i in range(num_cl):
        clc_lengths[_VP8L_CLC_ORDER[i]] = rd.bits(3)
    clc = _VP8LPrefixCode(clc_lengths)
    if rd.bits(1):  # use max_symbol
        length_nbits = 2 + 2 * rd.bits(3)
        max_symbol = 2 + rd.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8  # spec default
    symbol = 0
    while symbol < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = clc.read(rd)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s:
                prev = s
        elif s == 16:
            for _ in range(3 + rd.bits(2)):
                if symbol >= alphabet_size:
                    raise ValueError("VP8L: repeat past alphabet")
                lengths[symbol] = prev
                symbol += 1
        elif s == 17:
            symbol += 3 + rd.bits(3)
        else:  # 18
            symbol += 11 + rd.bits(7)
        if symbol > alphabet_size:
            raise ValueError("VP8L: code lengths overrun alphabet")
    return _VP8LPrefixCode(lengths)


def _vp8l_prefix_value(rd: _VP8LBitReader, sym: int) -> int:
    """LZ77 length/distance prefix decoding: small symbols literal,
    larger ones (offset << extra) + extra bits."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + rd.bits(extra) + 1


def _vp8l_prefix_encode(value: int) -> tuple[int, int, int]:
    """Inverse of `_vp8l_prefix_value`: value -> (symbol, extra_bits,
    n_extra)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    hi = v.bit_length() - 1
    extra = hi - 1
    sym = 2 * hi + ((v >> extra) & 1)
    return sym, v & ((1 << extra) - 1), extra


def _vp8l_cache_key(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


def _vp8l_decode_image(
    rd: _VP8LBitReader, w: int, h: int, is_level0: bool
) -> list[int]:
    """One entropy-coded image stream -> flat ARGB list (row-major).
    Sub-resolution images (transform data, palettes, meta codes) are
    the same stream minus the meta-prefix option."""
    cache_bits = 0
    cache: list[int] = []
    if rd.bits(1):
        cache_bits = rd.bits(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"VP8L: invalid color-cache bits {cache_bits}")
        cache = [0] * (1 << cache_bits)

    meta_codes: list[int] | None = None
    meta_block_bits = 0
    n_groups = 1
    if is_level0 and rd.bits(1):
        meta_block_bits = rd.bits(3) + 2
        mw = -(-w >> meta_block_bits)
        mh = -(-h >> meta_block_bits)
        meta_img = _vp8l_decode_image(rd, mw, mh, False)
        meta_codes = [
            ((p >> 8) & 0xFFFF) for p in meta_img
        ]  # (red << 8) | green
        n_groups = max(meta_codes) + 1

    sizes = [256 + 24 + len(cache), 256, 256, 256, 40]
    groups = [
        [_vp8l_read_code_lengths(rd, sz) for sz in sizes]
        for _ in range(n_groups)
    ]

    out: list[int] = [0] * (w * h)
    pos = 0
    n = w * h
    while pos < n:
        x, y = pos % w, pos // w
        if meta_codes is not None:
            mw = -(-w >> meta_block_bits)
            g = groups[
                meta_codes[(y >> meta_block_bits) * mw
                           + (x >> meta_block_bits)]
            ]
        else:
            g = groups[0]
        s = g[0].read(rd)
        if s < 256:  # literal: green, then red, blue, alpha
            red = g[1].read(rd)
            blue = g[2].read(rd)
            alpha = g[3].read(rd)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = argb
            if cache_bits:
                cache[_vp8l_cache_key(argb, cache_bits)] = argb
            pos += 1
        elif s < 256 + 24:  # LZ77 backward reference
            length = _vp8l_prefix_value(rd, s - 256)
            dist_code = _vp8l_prefix_value(rd, g[4].read(rd))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _VP8L_DIST_MAP[dist_code - 1]
                dist = max(1, dy * w + dx)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backward reference out of range")
            for _ in range(length):
                argb = out[pos - dist]
                out[pos] = argb
                if cache_bits:
                    cache[_vp8l_cache_key(argb, cache_bits)] = argb
                pos += 1
        else:  # color-cache hit
            idx = s - 256 - 24
            if idx >= len(cache):
                raise ValueError("VP8L: cache index past cache size")
            out[pos] = cache[idx]
            pos += 1
    return out


def _vp8l_avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((((a) & 0xFF) + ((b) & 0xFF)) >> 1)
    )


def _vp8l_chans(p: int):
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _vp8l_select(left: int, top: int, topleft: int) -> int:
    la, lr, lg, lb = _vp8l_chans(left)
    ta, tr, tg, tb = _vp8l_chans(top)
    xa, xr, xg, xb = _vp8l_chans(topleft)
    pa, pr, pg, pb = la + ta - xa, lr + tr - xr, lg + tg - xg, lb + tb - xb
    p_left = abs(pa - la) + abs(pr - lr) + abs(pg - lg) + abs(pb - lb)
    p_top = abs(pa - ta) + abs(pr - tr) + abs(pg - tg) + abs(pb - tb)
    return left if p_left < p_top else top


def _clamp255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _vp8l_clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clamp255(
            ((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)
        ) << sh
    return out


def _vp8l_clamp_add_sub_half(ave: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        av = (ave >> sh) & 0xFF
        cc = (c >> sh) & 0xFF
        d = av - cc
        # C-style truncation toward zero for the half-delta
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= _clamp255(av + half) << sh
    return out


def _vp8l_predict(mode: int, data: list[int], pos: int, w: int) -> int:
    x, y = pos % w, pos // w
    left = data[pos - 1] if x > 0 else 0
    top = data[pos - w] if y > 0 else 0
    topleft = data[pos - w - 1] if (x > 0 and y > 0) else 0
    # libwebp convention: top-right of the last column reads one past
    # the row above, which is the current row's first pixel
    topright = data[pos - w + 1] if y > 0 else 0
    if pos == 0:
        return 0xFF000000
    if y == 0:
        return left
    if x == 0:
        return top
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _vp8l_avg2(_vp8l_avg2(left, topright), top)
    if mode == 6:
        return _vp8l_avg2(left, topleft)
    if mode == 7:
        return _vp8l_avg2(left, top)
    if mode == 8:
        return _vp8l_avg2(topleft, top)
    if mode == 9:
        return _vp8l_avg2(top, topright)
    if mode == 10:
        return _vp8l_avg2(
            _vp8l_avg2(left, topleft), _vp8l_avg2(top, topright)
        )
    if mode == 11:
        return _vp8l_select(left, top, topleft)
    if mode == 12:
        return _vp8l_clamp_add_sub_full(left, top, topleft)
    if mode == 13:
        return _vp8l_clamp_add_sub_half(_vp8l_avg2(left, top), topleft)
    raise ValueError(f"VP8L: invalid predictor mode {mode}")


def _vp8l_ct_delta(t: int, c: int) -> int:
    """Color-transform delta: (int8(t) * int8(c)) >> 5 (arithmetic)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _decode_webp(content: bytes) -> dict:
    """RIFF/WEBP VP8L (lossless) decode -> RGB payload (alpha verified
    opaque for the synth lanes' gray corpus is NOT assumed — alpha is
    simply not part of the RGB payload convention shared with
    BMP/PNG/GIF)."""
    if content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("not a WEBP container")
    if content[12:16] == b"VP8X":  # extended/animated (round 10)
        return _decode_webp_anim(content)
    if content[12:16] != b"VP8L":
        raise NotImplementedError(
            "only VP8L (lossless) WebP is implemented; lossy VP8 needs "
            "the full DCT/bool-coder stack"
        )
    size = struct.unpack("<I", content[16:20])[0]
    data = content[20 : 20 + size]
    if not data or data[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    rd = _VP8LBitReader(data)
    rd.bits(8)
    w = rd.bits(14) + 1
    h = rd.bits(14) + 1
    rd.bits(1)  # alpha hint
    if rd.bits(3) != 0:
        raise ValueError("VP8L: unknown version")

    # transforms (each at most once), applied inverse in reverse order
    transforms = []
    cur_w = w
    while rd.bits(1):
        ttype = rd.bits(2)
        if any(t[0] == ttype for t in transforms):
            raise ValueError("VP8L: duplicate transform")
        if ttype in (0, 1):  # predictor / color: block subimage
            size_bits = rd.bits(3) + 2
            bw = -(-cur_w >> size_bits)
            bh = -(-h >> size_bits)
            sub = _vp8l_decode_image(rd, bw, bh, False)
            transforms.append((ttype, size_bits, sub))
        elif ttype == 2:  # subtract green
            transforms.append((2, None, None))
        else:  # color indexing
            n_colors = rd.bits(8) + 1
            pal_raw = _vp8l_decode_image(rd, n_colors, 1, False)
            pal = []
            acc = 0
            for p in pal_raw:  # componentwise cumulative deltas
                a0, r0, g0, b0 = _vp8l_chans(acc)
                a1, r1, g1, b1 = _vp8l_chans(p)
                acc = (
                    ((a0 + a1) & 0xFF) << 24
                    | ((r0 + r1) & 0xFF) << 16
                    | ((g0 + g1) & 0xFF) << 8
                    | ((b0 + b1) & 0xFF)
                )
                pal.append(acc)
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append((3, (width_bits, pal), None))
            cur_w = -(-cur_w >> width_bits) if width_bits else cur_w

    data_px = _vp8l_decode_image(rd, cur_w, h, True)

    for t in reversed(transforms):
        ttype = t[0]
        if ttype == 3:  # color indexing: unbundle + palette lookup
            width_bits, pal = t[1]
            if width_bits:
                xbits = 8 >> width_bits
                mask = (1 << xbits) - 1
                per = 1 << width_bits
                wide = []
                for y in range(h):
                    row = []
                    for xp in range(cur_w):
                        g = (data_px[y * cur_w + xp] >> 8) & 0xFF
                        for k in range(per):
                            row.append((g >> (k * xbits)) & mask)
                    wide.extend(row[:w])
                idxs = wide
            else:
                idxs = [((p >> 8) & 0xFF) for p in data_px]
            data_px = [
                pal[i] if i < len(pal) else 0 for i in idxs
            ]
            cur_w = w
        elif ttype == 2:  # add green back
            for i, p in enumerate(data_px):
                g = (p >> 8) & 0xFF
                r = ((p >> 16) & 0xFF) + g & 0xFF
                b = ((p & 0xFF) + g) & 0xFF
                data_px[i] = (p & 0xFF00FF00) | (r << 16) | b
        elif ttype == 0:  # predictor: add residual to prediction
            size_bits, sub = t[1], t[2]
            bw = -(-w >> size_bits)
            for pos in range(w * h):
                x, y = pos % w, pos // w
                mode = (
                    sub[(y >> size_bits) * bw + (x >> size_bits)] >> 8
                ) & 0xFF
                pred = _vp8l_predict(mode, data_px, pos, w)
                pa, pr, pg, pb = _vp8l_chans(pred)
                da, dr, dg, db = _vp8l_chans(data_px[pos])
                data_px[pos] = (
                    ((pa + da) & 0xFF) << 24
                    | ((pr + dr) & 0xFF) << 16
                    | ((pg + dg) & 0xFF) << 8
                    | ((pb + db) & 0xFF)
                )
        else:  # color transform inverse
            size_bits, sub = t[1], t[2]
            bw = -(-w >> size_bits)
            for pos in range(w * h):
                x, y = pos % w, pos // w
                cte = sub[(y >> size_bits) * bw + (x >> size_bits)]
                g2r = cte & 0xFF
                g2b = (cte >> 8) & 0xFF
                r2b = (cte >> 16) & 0xFF
                p = data_px[pos]
                a, r, g, b = _vp8l_chans(p)
                r = (r + _vp8l_ct_delta(g2r, g)) & 0xFF
                b = (b + _vp8l_ct_delta(g2b, g)) & 0xFF
                b = (b + _vp8l_ct_delta(r2b, r)) & 0xFF
                data_px[pos] = (a << 24) | (r << 16) | (g << 8) | b

    payload = bytearray()
    for p in data_px:
        payload += bytes(
            (((p >> 16) & 0xFF), ((p >> 8) & 0xFF), (p & 0xFF))
        )
    return {
        "kind": "image",
        "width": w,
        "height": h,
        "sample_rate": 0,
        "payload": bytes(payload),
    }


def _vp8l_emit_sym(wtr: _VP8LBitWriter, codes, sym: int) -> None:
    if len(codes) == 1:
        return  # single-symbol code: zero bits on the wire
    ln, code = codes[sym]
    for i in range(ln - 1, -1, -1):
        wtr.bits((code >> i) & 1, 1)


def _vp8l_write_image(
    wtr: _VP8LBitWriter, tokens: list, cache_bits: int, is_level0: bool
) -> None:
    """Write one entropy-coded image stream from a prepared token list
    (('lit', argb) | ('copy', length, dist_code) | ('cache', idx))."""
    if cache_bits:
        wtr.bits(1, 1)
        wtr.bits(cache_bits, 4)
    else:
        wtr.bits(0, 1)
    if is_level0:
        wtr.bits(0, 1)  # no meta prefix codes
    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}

    def bump(d, k):
        d[k] = d.get(k, 0) + 1

    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = _vp8l_chans(t[1])
            bump(gf, g)
            bump(rf, r)
            bump(bf, b)
            bump(af, a)
        elif t[0] == "copy":
            lsym, _lx, _ln = _vp8l_prefix_encode(t[1])
            bump(gf, 256 + lsym)
            dsym, _dx, _dn = _vp8l_prefix_encode(t[2])
            bump(df, dsym)
        else:
            bump(gf, 256 + 24 + t[1])
    for d in (rf, bf, af, df):
        if not d:
            d[0] = 1  # unused channel still needs a wellformed code
    cache_size = (1 << cache_bits) if cache_bits else 0
    sizes = [256 + 24 + cache_size, 256, 256, 256, 40]
    all_lengths = [
        _vp8l_build_lengths(f) for f in (gf, rf, bf, af, df)
    ]
    all_codes = []
    for lengths, size in zip(all_lengths, sizes):
        _vp8l_write_code(wtr, lengths, size)
        full = [lengths.get(s, 0) for s in range(size)]
        all_codes.append(
            _vp8l_canonical_codes(full) if len(lengths) > 1
            else {next(iter(lengths)): (0, 0)}
        )
    gc, rc, bc, ac, dc = all_codes
    gsingle = len(gf) == 1
    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = _vp8l_chans(t[1])
            if not gsingle:
                _vp8l_emit_sym(wtr, gc, g)
            elif len(gc) > 1:
                _vp8l_emit_sym(wtr, gc, g)
            _vp8l_emit_sym(wtr, rc, r)
            _vp8l_emit_sym(wtr, bc, b)
            _vp8l_emit_sym(wtr, ac, a)
        elif t[0] == "copy":
            lsym, lx, ln = _vp8l_prefix_encode(t[1])
            _vp8l_emit_sym(wtr, gc, 256 + lsym)
            wtr.bits(lx, ln)
            dsym, dx, dn = _vp8l_prefix_encode(t[2])
            _vp8l_emit_sym(wtr, dc, dsym)
            wtr.bits(dx, dn)
        else:
            _vp8l_emit_sym(wtr, gc, 256 + 24 + t[1])


def _vp8l_literal_tokens(pixels: list[int]) -> list:
    return [("lit", p) for p in pixels]


def _pixels_to_webp(rgb: "np.ndarray", mode: str = "plain") -> bytes:
    """Encode an (h, w, 3) uint8 array as a lossless WebP (VP8L).
    Modes cycle the bitstream features (bit layout per transform:
    [1 more=1][2 type][transform data] ... [1 more=0][image stream]):

    - ``plain``: literal pixels, normal prefix codes;
    - ``subtract_green``: the subtract-green transform;
    - ``palette``: color-indexing transform (with sub-byte pixel
      bundling whenever the palette allows it);
    - ``predictor``: block predictor transform, mode = block index
      mod 14 — every predictor exercised on a big enough image;
    - ``color``: cross-channel color transform, one block;
    - ``cache_lz77``: color cache + LZ77 (row-above references via
      short-distance map code 1 and raw > 120 codes).
    """
    h, w = int(rgb.shape[0]), int(rgb.shape[1])
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L: dims out of range")
    pixels = [
        0xFF000000
        | (int(rgb[y, x, 0]) << 16)
        | (int(rgb[y, x, 1]) << 8)
        | int(rgb[y, x, 2])
        for y in range(h)
        for x in range(w)
    ]
    wtr = _VP8LBitWriter()
    wtr.bits(0x2F, 8)
    wtr.bits(w - 1, 14)
    wtr.bits(h - 1, 14)
    wtr.bits(0, 1)  # alpha hint
    wtr.bits(0, 3)  # version

    if mode == "plain":
        wtr.bits(0, 1)  # no transforms
        _vp8l_write_image(wtr, _vp8l_literal_tokens(pixels), 0, True)

    elif mode == "subtract_green":
        wtr.bits(1, 1)
        wtr.bits(2, 2)  # SUBTRACT_GREEN (no data)
        wtr.bits(0, 1)  # end of transforms
        enc = []
        for p in pixels:
            a, r, g, b = _vp8l_chans(p)
            enc.append(
                (a << 24) | (((r - g) & 0xFF) << 16) | (g << 8)
                | ((b - g) & 0xFF)
            )
        _vp8l_write_image(wtr, _vp8l_literal_tokens(enc), 0, True)

    elif mode == "palette":
        pal = sorted(set(pixels))
        if len(pal) > 256:
            raise ValueError("palette mode: > 256 distinct colors")
        idx_of = {p: i for i, p in enumerate(pal)}
        n = len(pal)
        wtr.bits(1, 1)
        wtr.bits(3, 2)  # COLOR_INDEXING
        wtr.bits(n - 1, 8)
        # palette subimage: componentwise DELTAS of consecutive entries
        deltas, prev = [], 0
        for p in pal:
            a0, r0, g0, b0 = _vp8l_chans(prev)
            a1, r1, g1, b1 = _vp8l_chans(p)
            deltas.append(
                ((a1 - a0) & 0xFF) << 24
                | ((r1 - r0) & 0xFF) << 16
                | ((g1 - g0) & 0xFF) << 8
                | ((b1 - b0) & 0xFF)
            )
            prev = p
        _vp8l_write_image(wtr, _vp8l_literal_tokens(deltas), 0, False)
        wtr.bits(0, 1)  # end of transforms
        if n <= 2:
            width_bits = 3
        elif n <= 4:
            width_bits = 2
        elif n <= 16:
            width_bits = 1
        else:
            width_bits = 0
        if width_bits:
            per = 1 << width_bits
            xbits = 8 >> width_bits
            packed_w = -(-w // per)
            enc = []
            for y in range(h):
                for xp in range(packed_w):
                    gbyte = 0
                    for k in range(per):
                        x = xp * per + k
                        if x < w:
                            gbyte |= idx_of[pixels[y * w + x]] << (
                                k * xbits
                            )
                    enc.append(0xFF000000 | (gbyte << 8))
        else:
            enc = [
                0xFF000000 | (idx_of[p] << 8) for p in pixels
            ]
        _vp8l_write_image(wtr, _vp8l_literal_tokens(enc), 0, True)

    elif mode == "predictor":
        size_bits = 2  # 4x4 blocks
        bw = -(-w >> size_bits)
        bh = -(-h >> size_bits)
        modes = [
            0xFF000000 | (((i % 14)) << 8) for i in range(bw * bh)
        ]
        wtr.bits(1, 1)
        wtr.bits(0, 2)  # PREDICTOR
        wtr.bits(size_bits - 2, 3)
        _vp8l_write_image(wtr, _vp8l_literal_tokens(modes), 0, False)
        wtr.bits(0, 1)  # end of transforms
        # residuals in raster order against the ORIGINAL neighbors
        # (exactly what the decoder reconstructs progressively)
        enc = []
        for pos in range(w * h):
            x, y = pos % w, pos // w
            m = (modes[(y >> size_bits) * bw + (x >> size_bits)] >> 8) & 0xFF
            pred = _vp8l_predict(m, pixels, pos, w)
            pa, pr, pg, pb = _vp8l_chans(pred)
            a, r, g, b = _vp8l_chans(pixels[pos])
            enc.append(
                ((a - pa) & 0xFF) << 24
                | ((r - pr) & 0xFF) << 16
                | ((g - pg) & 0xFF) << 8
                | ((b - pb) & 0xFF)
            )
        _vp8l_write_image(wtr, _vp8l_literal_tokens(enc), 0, True)

    elif mode == "color":
        size_bits = 9  # one block for any fixture-sized image
        g2r, g2b, r2b = 0x2A, 0xD6, 0x15  # fixed signed 3.5 deltas
        cte = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
        wtr.bits(1, 1)
        wtr.bits(1, 2)  # COLOR transform
        wtr.bits(size_bits - 2, 3)
        bw = -(-w >> size_bits)
        bh = -(-h >> size_bits)
        _vp8l_write_image(
            wtr, _vp8l_literal_tokens([cte] * (bw * bh)), 0, False
        )
        wtr.bits(0, 1)  # end of transforms
        enc = []
        for p in pixels:
            a, r, g, b = _vp8l_chans(p)
            r_enc = (r - _vp8l_ct_delta(g2r, g)) & 0xFF
            b_enc = (
                b - _vp8l_ct_delta(g2b, g) - _vp8l_ct_delta(r2b, r)
            ) & 0xFF
            enc.append((a << 24) | (r_enc << 16) | (g << 8) | b_enc)
        _vp8l_write_image(wtr, _vp8l_literal_tokens(enc), 0, True)

    elif mode == "stacked":
        # TWO transforms on one image: subtract-green THEN predictor —
        # the decoder must invert them in reverse order (predictor
        # first, then add-green); encoder mirrors: subtract green
        # first, then predict over the green-subtracted plane
        wtr.bits(1, 1)
        wtr.bits(2, 2)  # SUBTRACT_GREEN
        sg = []
        for p in pixels:
            a, r, g, b = _vp8l_chans(p)
            sg.append(
                (a << 24) | (((r - g) & 0xFF) << 16) | (g << 8)
                | ((b - g) & 0xFF)
            )
        size_bits = 2
        bw = -(-w >> size_bits)
        bh = -(-h >> size_bits)
        modes_px = [
            0xFF000000 | ((i % 14) << 8) for i in range(bw * bh)
        ]
        wtr.bits(1, 1)
        wtr.bits(0, 2)  # PREDICTOR
        wtr.bits(size_bits - 2, 3)
        _vp8l_write_image(wtr, _vp8l_literal_tokens(modes_px), 0, False)
        wtr.bits(0, 1)  # end of transforms
        enc = []
        for pos in range(w * h):
            x, y = pos % w, pos // w
            pm = (
                modes_px[(y >> size_bits) * bw + (x >> size_bits)] >> 8
            ) & 0xFF
            pred = _vp8l_predict(pm, sg, pos, w)
            pa, pr, pg, pb = _vp8l_chans(pred)
            a, r, g, b = _vp8l_chans(sg[pos])
            enc.append(
                ((a - pa) & 0xFF) << 24
                | ((r - pr) & 0xFF) << 16
                | ((g - pg) & 0xFF) << 8
                | ((b - pb) & 0xFF)
            )
        _vp8l_write_image(wtr, _vp8l_literal_tokens(enc), 0, True)

    elif mode == "meta":
        # meta prefix codes: 4x4 tiles alternate between TWO huffman
        # groups (checkerboard), each group trained on its own tile
        # population — the decoder's meta-image path
        wtr.bits(0, 1)  # no transforms
        wtr.bits(0, 1)  # no color cache
        wtr.bits(1, 1)  # meta prefix codes present
        block_bits = 2
        wtr.bits(block_bits - 2, 3)
        mw = -(-w >> block_bits)
        mh = -(-h >> block_bits)
        meta = [
            ((bx + by) % 2) for by in range(mh) for bx in range(mw)
        ]
        # meta image pixels: group id in (red << 8) | green
        meta_px = [
            0xFF000000 | ((g >> 8) << 16) | ((g & 0xFF) << 8)
            for g in meta
        ]
        _vp8l_write_image(wtr, _vp8l_literal_tokens(meta_px), 0, False)
        # per-group token lists in raster order
        group_of = [
            meta[(y >> block_bits) * mw + (x >> block_bits)]
            for y in range(h)
            for x in range(w)
        ]
        # write the two groups' codes then emit pixels group-switched;
        # reuse _vp8l_write_image's internals by hand here
        # the number of groups the DECODER will read is
        # max(meta)+1 — a degenerate checkerboard (single block
        # row+column) has ONE group, and writing two would desync
        n_groups = max(meta) + 1
        per_group_tokens = [[] for _ in range(n_groups)]
        for pos, p in enumerate(pixels):
            per_group_tokens[group_of[pos]].append(("lit", p))
        groups_codes = []
        for gi in range(n_groups):
            gf, rf, bf, af = {}, {}, {}, {}
            for _t, p in per_group_tokens[gi] or [("lit", 0xFF000000)]:
                a, r, g, b = _vp8l_chans(p)
                for d, k in ((gf, g), (rf, r), (bf, b), (af, a)):
                    d[k] = d.get(k, 0) + 1
            df = {0: 1}
            sizes = [256 + 24, 256, 256, 256, 40]
            codes5 = []
            for f, size in zip((gf, rf, bf, af, df), sizes):
                lengths = _vp8l_build_lengths(f)
                _vp8l_write_code(wtr, lengths, size)
                full = [lengths.get(s, 0) for s in range(size)]
                codes5.append(
                    _vp8l_canonical_codes(full)
                    if len(lengths) > 1
                    else {next(iter(lengths)): (0, 0)}
                )
            groups_codes.append(codes5)
        for pos, p in enumerate(pixels):
            gc, rc, bc, ac, _dc = groups_codes[group_of[pos]]
            a, r, g, b = _vp8l_chans(p)
            _vp8l_emit_sym(wtr, gc, g)
            _vp8l_emit_sym(wtr, rc, r)
            _vp8l_emit_sym(wtr, bc, b)
            _vp8l_emit_sym(wtr, ac, a)

    elif mode == "cache_lz77":
        wtr.bits(0, 1)  # no transforms
        cache_bits = 6
        cache = [None] * (1 << cache_bits)
        tokens = []
        pos = 0
        n = w * h
        while pos < n:
            p = pixels[pos]
            # row-above run? (distance w == short-map code 1 = (0, 1))
            run = 0
            while (
                pos + run < n
                and pos + run >= w
                and pixels[pos + run] == pixels[pos + run - w]
            ):
                run += 1
            if run >= 4:
                # alternate map code 1 and raw code for coverage
                dist_code = 1 if (pos % 2 == 0) else w + 120
                tokens.append(("copy", run, dist_code))
                for i in range(run):
                    q = pixels[pos + i]
                    cache[_vp8l_cache_key(q, cache_bits)] = q
                pos += run
                continue
            key = _vp8l_cache_key(p, cache_bits)
            if cache[key] == p:
                tokens.append(("cache", key))
            else:
                tokens.append(("lit", p))
                cache[key] = p
            pos += 1
        _vp8l_write_image(wtr, tokens, cache_bits, True)

    else:
        raise ValueError(f"unknown VP8L synth mode {mode!r}")

    data = wtr.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _le24(v: int) -> bytes:
    return bytes([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF])


def _riff_chunk(fourcc: bytes, payload: bytes) -> bytes:
    c = fourcc + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        c += b"\x00"
    return c


def _pixels_seq_to_webp_anim(
    frames: list, modes: list[str] | None = None, duration_ms: int = 40
) -> bytes:
    """ANIMATED WebP (round 10): VP8X (animation flag + canvas dims) +
    ANIM (loop forever) + one ANMF per frame whose payload is a real
    VP8L lossless bitstream from the round-9 encoder — every frame
    full-canvas at (0, 0), no blending, so decode is compositing-free
    and bit-exact."""
    if not frames:
        raise ValueError("animation needs at least one frame")
    h, w = frames[0].shape[:2]
    modes = modes or ["plain"]
    chunks = bytearray()
    vp8x = bytes([0x02]) + b"\x00\x00\x00" + _le24(w - 1) + _le24(h - 1)
    chunks += _riff_chunk(b"VP8X", vp8x)
    chunks += _riff_chunk(b"ANIM", struct.pack("<IH", 0xFFFFFFFF, 0))
    for i, fr in enumerate(frames):
        if fr.shape[:2] != (h, w):
            raise ValueError("animation frames must share the canvas")
        full = _pixels_to_webp(fr, modes[i % len(modes)])
        vp8l_chunk = full[12:]  # the padded VP8L chunk
        anmf = (
            _le24(0)  # frame x / 2
            + _le24(0)  # frame y / 2
            + _le24(w - 1)
            + _le24(h - 1)
            + _le24(duration_ms)
            + bytes([0])  # no blend, keep-canvas disposal
        )
        chunks += _riff_chunk(b"ANMF", anmf + vp8l_chunk)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + len(chunks))
        + b"WEBP"
        + bytes(chunks)
    )


def _webp_anim_frames(content: bytes):
    """Extended (VP8X) WebP walk -> (standalone-webp frame list, w, h).
    Honest subset: every ANMF frame must be full-canvas at (0, 0)
    (compositing/blending of partial frames raises loudly); lossy VP8
    frame payloads raise loudly; ALPH/EXIF/XMP/ICCP chunks skip."""
    if content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("not a WEBP container")
    if content[12:16] != b"VP8X":
        raise ValueError("not an extended (VP8X) WEBP")
    pos = 12
    canvas_w = canvas_h = None
    frames: list[bytes] = []
    while pos + 8 <= len(content):
        fourcc = content[pos : pos + 4]
        size = struct.unpack("<I", content[pos + 4 : pos + 8])[0]
        payload = content[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8X":
            canvas_w = int.from_bytes(payload[4:7], "little") + 1
            canvas_h = int.from_bytes(payload[7:10], "little") + 1
        elif fourcc == b"ANMF":
            fx = int.from_bytes(payload[0:3], "little") * 2
            fy = int.from_bytes(payload[3:6], "little") * 2
            fw = int.from_bytes(payload[6:9], "little") + 1
            fh = int.from_bytes(payload[9:12], "little") + 1
            if (fx, fy) != (0, 0) or (fw, fh) != (canvas_w, canvas_h):
                raise NotImplementedError(
                    "sub-canvas animation frames (compositing) are "
                    "not implemented"
                )
            sub = payload[16:]
            sp = 0
            while sp + 8 <= len(sub):
                fc = sub[sp : sp + 4]
                ssz = struct.unpack("<I", sub[sp + 4 : sp + 8])[0]
                if fc == b"VP8L":
                    body = sub[sp : sp + 8 + ssz + (ssz & 1)]
                    frames.append(
                        b"RIFF"
                        + struct.pack("<I", 4 + len(body))
                        + b"WEBP"
                        + body
                    )
                    break
                if fc == b"VP8 ":
                    raise NotImplementedError(
                        "lossy VP8 animation frames are not implemented"
                    )
                sp += 8 + ssz + (ssz & 1)  # ALPH etc.: skip
        elif fourcc == b"VP8 ":
            raise NotImplementedError(
                "only VP8L (lossless) WebP is implemented; lossy VP8 "
                "needs the full DCT/bool-coder stack"
            )
        elif fourcc == b"VP8L":
            # VP8X-wrapped STILL image: one frame
            body = content[pos : pos + 8 + size + (size & 1)]
            frames.append(
                b"RIFF"
                + struct.pack("<I", 4 + len(body))
                + b"WEBP"
                + body
            )
        pos += 8 + size + (size & 1)
    if canvas_w is None:
        raise ValueError("VP8X chunk missing")
    return frames, canvas_w, canvas_h


def _decode_webp_anim(content: bytes) -> dict:
    """Animated/extended WebP decode for the generic media pipeline —
    the AVI convention: geometry from the canvas, frame count in
    sample_rate, the LAST frame's decoded pixels as the payload."""
    frames, w, h = _webp_anim_frames(content)
    if not frames:
        raise ValueError("extended WEBP has no decodable frames")
    d = _decode_payload(frames[-1])
    return {
        "kind": "video",
        "width": w,
        "height": h,
        "sample_rate": len(frames),
        "payload": d["payload"],
    }


def sample_webp_anim_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """Animated-WebP frame sampling (the sample_video_frames twin):
    every stride-th ANMF frame decodes map-side to
    (media_id, frame_idx, width, height, payload_bytes, payload_md5);
    no shuffle is introduced."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                frames, _w, _h = _webp_anim_frames(bytes(content))
                for fi in range(0, len(frames), stride):
                    d = _decode_payload(frames[fi])
                    out.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": fi,
                            "width": d["width"],
                            "height": d["height"],
                            "payload_bytes": len(d["payload"]),
                            "payload_md5": hashlib.md5(
                                d["payload"]
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "frame_idx", "width", "height",
                    "payload_bytes", "payload_md5",
                ],
            )

    return media.select("media_id", "content").mapInPandas(
        run,
        "media_id long, frame_idx int, width int, height int, "
        "payload_bytes long, payload_md5 string",
    )


def synth_webp_anim_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Animated-WebP synthesis: per doc an animation of doc_id%4+2
    VP8L frames on a doc_id-derived canvas; frame f's gray pixels tile
    the md5 hex of the text ROTATED by f characters (the AVI recipe on
    the q474 pixel convention), modes cycling the encoder feature sets
    — every sampled frame's payload md5 is recomputable in SQL."""
    import hashlib

    modes = (
        "plain", "subtract_green", "palette", "predictor",
        "color", "cache_lz77",
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                did = int(doc_id)
                w = did % 12 + 5
                h = did % 6 + 4
                hx = hashlib.md5(
                    (text or "").encode("utf-8")
                ).hexdigest().encode("ascii")
                n_frames = did % 4 + 2
                frames = []
                need = h * w
                for f in range(n_frames):
                    rot = hx[f:] + hx[:f]
                    idx = np.frombuffer(
                        (rot * (need // 32 + 1))[:need], dtype=np.uint8
                    ).reshape(h, w)
                    frames.append(idx[:, :, None].repeat(3, axis=2))
                rows.append(
                    {
                        "media_id": did,
                        "content": _pixels_seq_to_webp_anim(
                            frames,
                            modes=[modes[(did + f) % len(modes)]
                                   for f in range(n_frames)],
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )


def synth_webp_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Real-encoder WebP-lossless synthesis from the documents fixture:
    per doc a genuine VP8L bitstream whose gray pixels tile the md5 hex
    of the text (each hex char i -> pixel (i, i, i) — exactly the GIF
    lane's tiling, so the decoded-payload md5 oracle is the same SQL
    shape), dims derived from doc_id, and the encode MODE cycling the
    bitstream features by doc_id % 8: literals / subtract-green /
    color-indexing (16-gray palette -> 2-pixels-per-byte bundling) /
    per-block predictors / cross-channel color transform / color-cache
    + LZ77 / meta prefix codes / stacked transforms. Lossless end to end: decode must reproduce every pixel."""
    import hashlib

    modes = (
        "plain", "subtract_green", "palette", "predictor",
        "color", "cache_lz77", "meta", "stacked",
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                w = int(doc_id) % 12 + 5
                h = int(doc_id) % 6 + 4
                hx = hashlib.md5(
                    (text or "").encode("utf-8")
                ).hexdigest().encode("ascii")
                need = h * w
                idx = np.frombuffer(
                    (hx * (need // 32 + 1))[:need], dtype=np.uint8
                ).reshape(h, w)
                arr = idx[:, :, None].repeat(3, axis=2)
                rows.append(
                    {
                        "media_id": int(doc_id),
                        "content": _pixels_to_webp(
                            arr, modes[int(doc_id) % 8]
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", text_col).mapInPandas(
        gen, "media_id long, content binary"
    )
