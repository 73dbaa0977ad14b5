"""ZIP archive source/sink (§2.2-A; round 7) — writer AND reader from
the public PKWARE APPNOTE layout, no zipfile dependency in the data
path (struct + stdlib zlib only, so the member walk, CRC verification
and method dispatch are all OURS and testable).

Why an engine needs this: crawl dumps, model-eval bundles and vendor
drops arrive as archives of many small documents. The scalable shape
is NOT one-file-per-doc (the small-files problem) but one archive per
partition-ish group, exploded executor-side. Both directions here are
that shape:

- :func:`zip_documents` — applyInPandas per group key: each group's
  docs become ONE zip blob (a genuine shuffle, the write-side
  compaction pattern);
- :func:`read_zip_members` — mapInPandas over (archive_id, content):
  walks the central directory, inflates/copies each member, verifies
  its CRC-32, and yields one row per member — container parse stays
  in the executor, zero driver involvement.

Layout implemented: local file headers (PK\\x03\\x04), member data,
central directory (PK\\x01\\x02), end-of-central-directory (PK\\x05\\x06);
methods 0 (stored) and 8 (raw deflate, wbits=-15). General-purpose bit
3 (data descriptors) is not emitted; the reader trusts the central
directory (the robust convention — local headers can lie).
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_zip(members: list[tuple[str, bytes, int]]) -> bytes:
    """One zip blob from (name, payload, method) members; method 0 =
    stored, 8 = deflate. Deterministic: fixed DOS timestamp, members
    in the given order."""
    out = bytearray()
    central = bytearray()
    dos_time, dos_date = 0, 0x21 << 9 | 1 << 5 | 1  # 2013-01-01 00:00 (1980+33)
    for name, payload, method in members:
        if method == 8:
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            blob = co.compress(payload) + co.flush()
        elif method == 0:
            blob = payload
        else:
            raise NotImplementedError(f"zip method {method}")
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        nb = name.encode("utf-8")
        ofs = len(out)
        out += struct.pack(
            "<4sHHHHHIIIHH", b"PK\x03\x04", 20, 0, method,
            dos_time, dos_date, crc, len(blob), len(payload), len(nb), 0,
        )
        out += nb + blob
        central += struct.pack(
            "<4sHHHHHHIIIHHHHHII", b"PK\x01\x02", 20, 20, 0, method,
            dos_time, dos_date, crc, len(blob), len(payload),
            len(nb), 0, 0, 0, 0, 0, ofs,
        )
        central += nb
    cd_ofs = len(out)
    out += central
    out += struct.pack(
        "<4sHHHHIIH", b"PK\x05\x06", 0, 0, len(members), len(members),
        len(central), cd_ofs, 0,
    )
    return bytes(out)


def parse_zip(content: bytes) -> list[dict]:
    """Walk the central directory; per member return name, method,
    sizes, the decoded payload and whether its CRC-32 verified."""
    eocd = content.rfind(b"PK\x05\x06")
    if eocd < 0:
        raise ValueError("not a zip: EOCD missing")
    (_sig, _dn, _cdn, n_here, n_total, cd_size, cd_ofs, _cl) = struct.unpack_from(
        "<4sHHHHIIH", content, eocd
    )
    members = []
    pos = cd_ofs
    for _ in range(n_total):
        (sig, _vm, _vn, _fl, method, _t, _d, crc, csize, usize,
         nlen, xlen, clen, _dk, _ia, _ea, lofs) = struct.unpack_from(
            "<4sHHHHHHIIIHHHHHII", content, pos
        )
        if sig != b"PK\x01\x02":
            raise ValueError("bad central directory entry")
        name = content[pos + 46 : pos + 46 + nlen].decode("utf-8")
        pos += 46 + nlen + xlen + clen
        # local header: re-read name/extra lengths — they may differ
        (lsig, _lv, _lf, lmethod, _lt, _ld, _lcrc, _lcs, _lus,
         lnlen, lxlen) = struct.unpack_from("<4sHHHHHIIIHH", content, lofs)
        if lsig != b"PK\x03\x04":
            raise ValueError("bad local header")
        data_ofs = lofs + 30 + lnlen + lxlen
        blob = content[data_ofs : data_ofs + csize]
        if method == 0:
            payload = blob
        elif method == 8:
            payload = zlib.decompress(blob, -15)
        else:
            raise NotImplementedError(f"zip method {method}")
        members.append(
            {
                "name": name,
                "method": int(method),
                "compressed_bytes": int(csize),
                "payload": payload,
                "crc_ok": (zlib.crc32(payload) & 0xFFFFFFFF) == crc
                and len(payload) == usize,
            }
        )
    return members


def zip_documents(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    docs_per_archive: int | None = None,
) -> DataFrame:
    """(group, n_members, content) — one zip blob per group; member
    doc_{id}.txt carries the utf-8 text, method cycling stored/deflate
    by id parity, members id-ordered (deterministic blob).

    ``docs_per_archive`` bounds archive size by salting the group key
    with ``id div docs_per_archive`` — the 100 TB shape: a group is
    never one giant executor-side blob; archives cap at a deterministic
    member count and the shuffle spreads across group*bucket keys."""
    key = F.col(group_col)
    if docs_per_archive is not None:
        key = F.concat_ws(
            "#",
            F.col(group_col),
            # integer div, not `/` (Spark `/` promotes to DOUBLE and
            # ids past 2^53 would misbucket)
            F.expr(f"{id_col} div {int(docs_per_archive)}").cast("string"),
        )

    def make(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        members = [
            (
                f"doc_{int(i)}.txt",
                (t or "").encode("utf-8"),
                8 if int(i) % 2 else 0,
            )
            for i, t in zip(pdf[id_col], pdf[text_col])
        ]
        return pd.DataFrame(
            [
                {
                    "group": pdf["__akey"].iloc[0],
                    "n_members": len(members),
                    "content": build_zip(members),
                }
            ]
        )

    return (
        docs.select(
            key.alias("__akey"), F.col(id_col), F.col(text_col)
        )
        .groupBy("__akey")
        .applyInPandas(make, "group string, n_members int, content binary")
    )


def read_zip_members(archives: DataFrame) -> DataFrame:
    """Explode (group, content) archives to one row per member with
    the payload md5 and CRC verdict — executor-side container walk."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for grp, content in zip(pdf["group"], pdf["content"]):
                ms = parse_zip(bytes(content))
                for m in ms:
                    rows.append(
                        {
                            "group": grp,
                            "name": m["name"],
                            "method": m["method"],
                            "payload_bytes": len(m["payload"]),
                            "payload_md5": hashlib.md5(
                                m["payload"]
                            ).hexdigest(),
                            "crc_ok": m["crc_ok"],
                            "archive_members": len(ms),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "group", "name", "method", "payload_bytes",
                    "payload_md5", "crc_ok", "archive_members",
                ],
            )

    return archives.select("group", "content").mapInPandas(
        run,
        "group string, name string, method int, payload_bytes long, "
        "payload_md5 string, crc_ok boolean, archive_members int",
    )


# ---------------------------------------------------------------------------
# ustar TAR (+ .tar.gz) — the other archive format corpora arrive in.
# Writer AND parser from the POSIX.1-1988 ustar layout (512-byte
# headers, octal fields, the space-filled-checksum rule); gzip
# wrapping via stdlib (RFC 1952), mtime pinned 0 for determinism.
# stdlib `tarfile` interop is pinned in tests both directions.
# ---------------------------------------------------------------------------


def _tar_header(name: str, size: int) -> bytes:
    h = bytearray(512)
    nb = name.encode("utf-8")
    if len(nb) > 100:
        raise ValueError("tar member name > 100 bytes")
    h[0 : len(nb)] = nb
    h[100:108] = b"0000644\0"          # mode
    h[108:116] = b"0000000\0"          # uid
    h[116:124] = b"0000000\0"          # gid
    h[124:136] = f"{size:011o}".encode() + b"\0"
    h[136:148] = b"00000000000\0"      # mtime 0
    h[148:156] = b" " * 8              # chksum: spaces while summing
    h[156] = ord("0")                  # typeflag: regular file
    h[257:263] = b"ustar\0"
    h[263:265] = b"00"
    chk = sum(h)
    h[148:156] = f"{chk:06o}".encode() + b"\0 "
    return bytes(h)


def build_tar(members: list[tuple[str, bytes]], gz: bool = False) -> bytes:
    """ustar blob from (name, payload) members; two zero blocks at the
    end; ``gz=True`` wraps the whole stream as one deterministic gzip
    member (mtime 0)."""
    out = bytearray()
    for name, payload in members:
        out += _tar_header(name, len(payload))
        out += payload
        pad = -len(payload) % 512
        out += b"\0" * pad
    out += b"\0" * 1024
    if gz:
        import gzip as _gzip

        return _gzip.compress(bytes(out), compresslevel=9, mtime=0)
    return bytes(out)


def parse_tar(content: bytes) -> list[dict]:
    """Walk ustar headers (auto-gunzips RFC 1952 streams): per member
    name, payload, and whether the header checksum verified."""
    if content[:2] == b"\x1f\x8b":  # gzip magic
        content = zlib.decompress(content, 16 + zlib.MAX_WBITS)
    members = []
    pos = 0
    while pos + 512 <= len(content):
        h = content[pos : pos + 512]
        if h == b"\0" * 512:
            break
        name = h[0:100].rstrip(b"\0").decode("utf-8")
        size = int(h[124:136].rstrip(b"\0 ").decode() or "0", 8)
        stored = int(h[148:156].rstrip(b"\0 ").decode() or "0", 8)
        summed = sum(h[:148]) + 8 * 0x20 + sum(h[156:])
        payload = content[pos + 512 : pos + 512 + size]
        members.append(
            {
                "name": name,
                "payload": payload,
                "chksum_ok": stored == summed and len(payload) == size,
            }
        )
        pos += 512 + size + (-size % 512)
    return members


def tar_documents(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    gz: bool = True,
) -> DataFrame:
    """(group, n_members, content) — one (gzipped) tar per group,
    member doc_{id}.txt per doc, id-ordered (deterministic blob)."""

    def make(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        members = [
            (f"doc_{int(i)}.txt", (t or "").encode("utf-8"))
            for i, t in zip(pdf[id_col], pdf[text_col])
        ]
        return pd.DataFrame(
            [
                {
                    "group": pdf[group_col].iloc[0],
                    "n_members": len(members),
                    "content": build_tar(members, gz=gz),
                }
            ]
        )

    return (
        docs.select(group_col, id_col, text_col)
        .groupBy(group_col)
        .applyInPandas(make, "group string, n_members int, content binary")
    )


def read_tar_members(archives: DataFrame) -> DataFrame:
    """Explode (group, content) tars to one row per member — the
    executor-side ustar walk, gzip-transparent."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for grp, content in zip(pdf["group"], pdf["content"]):
                ms = parse_tar(bytes(content))
                for m in ms:
                    rows.append(
                        {
                            "group": grp,
                            "name": m["name"],
                            "payload_bytes": len(m["payload"]),
                            "payload_md5": hashlib.md5(
                                m["payload"]
                            ).hexdigest(),
                            "chksum_ok": m["chksum_ok"],
                            "archive_members": len(ms),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "group", "name", "payload_bytes", "payload_md5",
                    "chksum_ok", "archive_members",
                ],
            )

    return archives.select("group", "content").mapInPandas(
        run,
        "group string, name string, payload_bytes long, "
        "payload_md5 string, chksum_ok boolean, archive_members int",
    )


def read_archive_members(archives: DataFrame) -> DataFrame:
    """MAGIC-SNIFFED unified archive reader (round 7 — the q434
    mixed-container story for archives): one binary column may carry
    zip, bare ustar, or gzipped tar blobs; each is dispatched by
    signature (PK\\x03\\x04 / \\x1f\\x8b / the ustar magic at offset 257)
    and exploded to the SAME member schema, integrity from the
    format's own check (CRC-32 for zip, header checksum for tar)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for grp, content in zip(pdf["group"], pdf["content"]):
                blob = bytes(content)
                if blob[:4] in (b"PK\x03\x04", b"PK\x05\x06"):
                    container = "zip"
                    ms = [
                        (m["name"], m["payload"], m["crc_ok"])
                        for m in parse_zip(blob)
                    ]
                elif blob[:2] == b"\x1f\x8b" or (
                    len(blob) > 262 and blob[257:262] == b"ustar"
                ):
                    container = "tar.gz" if blob[:2] == b"\x1f\x8b" else "tar"
                    ms = [
                        (m["name"], m["payload"], m["chksum_ok"])
                        for m in parse_tar(blob)
                    ]
                else:
                    raise ValueError("unknown archive signature")
                for name, payload, ok in ms:
                    rows.append(
                        {
                            "group": grp,
                            "container": container,
                            "name": name,
                            "payload_bytes": len(payload),
                            "payload_md5": hashlib.md5(payload).hexdigest(),
                            "integrity_ok": ok,
                            "archive_members": len(ms),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "group", "container", "name", "payload_bytes",
                    "payload_md5", "integrity_ok", "archive_members",
                ],
            )

    return archives.select("group", "content").mapInPandas(
        run,
        "group string, container string, name string, payload_bytes long, "
        "payload_md5 string, integrity_ok boolean, archive_members int",
    )
