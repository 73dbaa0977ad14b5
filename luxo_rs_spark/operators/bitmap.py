"""Roaring bitmaps as a RELATION (SURVEY §2.2-D sketch-relation family,
the EXACT-cardinality complement to the approximate members HLL / KMV /
t-digest / CMS): per-group compressed bitmaps of a uint32 value set,
built container-by-container so the shuffle state is bounded, carried
as BINARY columns in the spec's portable serialization, and merged /
intersected with set algebra.

Format: the public RoaringFormatSpec (RoaringBitmap/RoaringFormatSpec
on GitHub) — serial cookie 12347 (with run containers) | 12346,
per-64k-key containers of three kinds with the reference library's
sizing rule:

- array  (sorted uint16 list)            — cardinality <= 4096
- bitmap (fixed 8 KiB)                   — cardinality  > 4096
- run    (RLE (start, length-1) pairs)   — when 2 + 4*n_runs is
  smaller than the other encoding (runOptimize's rule)

Scale design: stage 1 groups by (group, high16) — each task holds at
most ONE container's 65536 values — and emits container bytes; stage 2
assembles the per-group container list into the portable blob. Both
stages are ordinary shuffles on bounded state; the blobs themselves are
the mergeable aggregation state (union/intersect without touching the
raw data again), which is the whole point of the structure in OLAP
engines (Druid/ClickHouse/Lucene all carry this format).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347


def _container_encode(vals16: np.ndarray) -> tuple[int, int, bytes]:
    """Encode one container's sorted uint16 values. Returns
    (type 0=array/1=bitmap/2=run, cardinality, payload bytes)."""
    card = len(vals16)
    # run-length structure
    breaks = np.where(np.diff(vals16.astype(np.int64)) != 1)[0]
    starts = np.concatenate([[0], breaks + 1])
    ends = np.concatenate([breaks, [card - 1]])
    n_runs = len(starts)
    run_size = 2 + 4 * n_runs
    arr_size = 2 * card
    bmp_size = 8192
    if run_size < min(arr_size if card <= 4096 else bmp_size, bmp_size):
        body = struct.pack("<H", n_runs) + b"".join(
            struct.pack(
                "<HH",
                int(vals16[s]),
                int(vals16[e]) - int(vals16[s]),
            )
            for s, e in zip(starts, ends)
        )
        return 2, card, body
    if card <= 4096:
        return 0, card, vals16.astype("<u2").tobytes()
    bits = np.zeros(1024, dtype="<u8")
    idx = vals16.astype(np.int64)
    np.bitwise_or.at(bits, idx >> 6, (np.uint64(1) << (idx & 63).astype("u8")))
    return 1, card, bits.tobytes()


def _container_decode(ctype: int, card: int, body: bytes) -> np.ndarray:
    if ctype == 0:
        return np.frombuffer(body, dtype="<u2", count=card).astype(np.uint32)
    if ctype == 1:
        bits = np.frombuffer(body, dtype="<u8", count=1024)
        out = np.flatnonzero(
            np.unpackbits(
                bits.view(np.uint8).reshape(-1, 8)[:, ::-1], axis=1
            )[:, ::-1].reshape(-1)
        )
        return out.astype(np.uint32)
    (n_runs,) = struct.unpack_from("<H", body, 0)
    vals = []
    for i in range(n_runs):
        s, ln = struct.unpack_from("<HH", body, 2 + 4 * i)
        vals.append(np.arange(s, s + ln + 1, dtype=np.uint32))
    return np.concatenate(vals) if vals else np.empty(0, dtype=np.uint32)


def roaring_serialize(values: np.ndarray) -> bytes:
    """uint32 values (any order, dupes allowed) -> portable Roaring
    blob (always the run-aware 12347 layout)."""
    vals = np.unique(np.asarray(values, dtype=np.uint32))
    highs = (vals >> 16).astype(np.uint16)
    keys, first = np.unique(highs, return_index=True)
    bounds = list(first) + [len(vals)]
    containers = []
    for i, k in enumerate(keys):
        lo = (vals[bounds[i] : bounds[i + 1]] & 0xFFFF).astype(np.uint16)
        containers.append((int(k), *_container_encode(lo)))
    n = len(containers)
    out = bytearray()
    out += struct.pack("<HH", _COOKIE_RUN, n - 1 if n else 0)
    bitset = bytearray((n + 7) // 8)
    for i, (_k, ct, _c, _b) in enumerate(containers):
        if ct == 2:
            bitset[i // 8] |= 1 << (i % 8)
    out += bytes(bitset)
    for k, _ct, card, _b in containers:
        out += struct.pack("<HH", k, card - 1)
    # offset header only required for >= 4 containers in the spec when
    # no runs; the run layout omits it below this size — we always
    # write it for uniform parsing
    header_end = len(out) + 4 * n
    ofs = header_end
    offsets = []
    for _k, _ct, _card, body in containers:
        offsets.append(ofs)
        ofs += len(body)
    for o in offsets:
        out += struct.pack("<I", o)
    for _k, _ct, _card, body in containers:
        out += body
    return bytes(out)


def roaring_deserialize(blob: bytes) -> np.ndarray:
    cookie, nm1 = struct.unpack_from("<HH", blob, 0)
    if cookie not in (_COOKIE_RUN, _COOKIE_NO_RUN):
        raise ValueError("not a portable Roaring blob")
    if len(blob) == 4 and cookie == _COOKIE_RUN:
        return np.empty(0, dtype=np.uint32)
    n = nm1 + 1
    pos = 4
    runbits = b"\x00" * ((n + 7) // 8)
    if cookie == _COOKIE_RUN:
        runbits = blob[pos : pos + (n + 7) // 8]
        pos += (n + 7) // 8
    descr = []
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", blob, pos)
        pos += 4
        descr.append((k, cm1 + 1))
    offsets = []
    for i in range(n):
        offsets.append(struct.unpack_from("<I", blob, pos)[0])
        pos += 4
    out = []
    for i, ((k, card), ofs) in enumerate(zip(descr, offsets)):
        is_run = bool(runbits[i // 8] & (1 << (i % 8)))
        if is_run:
            ctype = 2
        elif card <= 4096:
            ctype = 0
        else:
            ctype = 1
        lo = _container_decode(ctype, card, blob[ofs:])
        out.append((np.uint32(k) << np.uint32(16)) | lo)
    return np.concatenate(out) if out else np.empty(0, dtype=np.uint32)


def roaring_stats(blob: bytes) -> tuple[int, int, int, int]:
    """(cardinality, n_array, n_bitmap, n_run) of a portable blob."""
    cookie, nm1 = struct.unpack_from("<HH", blob, 0)
    n = nm1 + 1 if len(blob) > 4 else 0
    pos = 4
    runbits = blob[pos : pos + (n + 7) // 8]
    pos += (n + 7) // 8
    card = n_arr = n_bmp = n_run = 0
    for i in range(n):
        _k, cm1 = struct.unpack_from("<HH", blob, pos)
        pos += 4
        c = cm1 + 1
        card += c
        if runbits[i // 8] & (1 << (i % 8)):
            n_run += 1
        elif c <= 4096:
            n_arr += 1
        else:
            n_bmp += 1
    return card, n_arr, n_bmp, n_run


def roaring_and_card(a: bytes, b: bytes) -> int:
    """Intersection cardinality of two blobs."""
    va, vb = roaring_deserialize(a), roaring_deserialize(b)
    return int(len(np.intersect1d(va, vb, assume_unique=True)))


def build_group_bitmaps(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """(group, uint32 value) rows -> (group, rbm BINARY, plus exact
    container statistics). Two bounded-state stages: per-(group, high16)
    container encode, then per-group assembly of the sorted container
    list."""
    bucketed = df.select(
        F.col(group_col).alias("g"),
        (F.col(value_col).cast("long") % F.lit(1 << 32)).alias("v"),
    ).withColumn("high", (F.col("v") / F.lit(65536)).cast("int"))

    def encode_containers(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for (g, high), grp in pdf.groupby(["g", "high"]):
                lo = np.unique(
                    (grp["v"].to_numpy().astype(np.int64) & 0xFFFF)
                ).astype(np.uint16)
                ct, card, body = _container_encode(lo)
                rows.append(
                    {
                        "g": g,
                        "high": int(high),
                        "ctype": ct,
                        "card": card,
                        "body": body,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["g", "high", "ctype", "card", "body"]
            )

    containers = (
        bucketed.repartition("g", "high")
        .mapInPandas(
            encode_containers,
            "g string, high int, ctype int, card int, body binary",
        )
        # one (g, high) bucket can span Arrow batches: merge duplicates
        # by decoding + re-encoding (bounded at 65536 values)
        .groupBy("g", "high")
        .applyInPandas(
            lambda pdf: _merge_same_bucket(pdf),
            "g string, high int, ctype int, card int, body binary",
        )
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("high")
        conts = [
            (int(h), int(ct), int(c), bytes(b))
            for h, ct, c, b in zip(
                pdf["high"], pdf["ctype"], pdf["card"], pdf["body"]
            )
        ]
        n = len(conts)
        out = bytearray()
        out += struct.pack("<HH", _COOKIE_RUN, n - 1 if n else 0)
        bitset = bytearray((n + 7) // 8)
        for i, (_k, ct, _c, _b) in enumerate(conts):
            if ct == 2:
                bitset[i // 8] |= 1 << (i % 8)
        out += bytes(bitset)
        for k, _ct, card, _b in conts:
            out += struct.pack("<HH", k, card - 1)
        ofs = len(out) + 4 * n
        for _k, _ct, _c, b in conts:
            out += struct.pack("<I", ofs)
            ofs += len(b)
        for _k, _ct, _c, b in conts:
            out += b
        blob = bytes(out)
        card, n_arr, n_bmp, n_run = roaring_stats(blob)
        return pd.DataFrame(
            [
                {
                    "g": pdf["g"].iloc[0],
                    "rbm": blob,
                    "cardinality": card,
                    "n_array": n_arr,
                    "n_bitmap": n_bmp,
                    "n_run": n_run,
                }
            ]
        )

    return containers.groupBy("g").applyInPandas(
        assemble,
        "g string, rbm binary, cardinality long, "
        "n_array int, n_bitmap int, n_run int",
    )


def _merge_same_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    if len(pdf) == 1:
        return pdf
    vals = np.unique(
        np.concatenate(
            [
                _container_decode(int(ct), int(c), bytes(b))
                for ct, c, b in zip(pdf["ctype"], pdf["card"], pdf["body"])
            ]
        )
    ).astype(np.uint16)
    ct, card, body = _container_encode(vals)
    return pd.DataFrame(
        [
            {
                "g": pdf["g"].iloc[0],
                "high": int(pdf["high"].iloc[0]),
                "ctype": ct,
                "card": card,
                "body": body,
            }
        ]
    )


def merge_bitmap_tables(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two (g, rbm, ...) bitmap tables group-wise: blobs merge
    WITHOUT touching raw data (the mergeable-relation contract the
    sketch family shares — here the merge is exact, not approximate).
    Emits the same schema build_group_bitmaps produces."""

    def union_blobs(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = np.unique(
            np.concatenate(
                [roaring_deserialize(bytes(b_)) for b_ in pdf["rbm"]]
            )
        )
        blob = roaring_serialize(vals)
        card, na, nb, nr = roaring_stats(blob)
        return pd.DataFrame(
            [
                {
                    "g": pdf["g"].iloc[0],
                    "rbm": blob,
                    "cardinality": card,
                    "n_array": na,
                    "n_bitmap": nb,
                    "n_run": nr,
                }
            ]
        )

    cols = ["g", "rbm", "cardinality", "n_array", "n_bitmap", "n_run"]
    return (
        a.select(*cols)
        .unionByName(b.select(*cols))
        .groupBy("g")
        .applyInPandas(
            union_blobs,
            "g string, rbm binary, cardinality long, "
            "n_array int, n_bitmap int, n_run int",
        )
    )
