"""From-scratch Delta Lake TRANSACTION LOG reader + minimal writer
(SURVEY §2.2-A; round 9 — the "reads no foreign table format" gap).

Implements the PUBLIC Delta protocol (delta.io PROTOCOL.md): the log is
``_delta_log/%020d.json`` newline-delimited action files — ``protocol``
/ ``metaData`` / ``add`` / ``remove`` (+ ``commitInfo``/``txn`` noise a
reader must skip) — optionally compacted into
``%020d.checkpoint.parquet`` referenced by ``_last_checkpoint``. Unlike
``streaming/table_format.py``'s delta-rs backend (import-gated on the
``deltalake`` package, absent here), this module depends on NOTHING
beyond pyarrow: a table written by Spark's Delta connector, delta-rs,
or any other engine reconstructs from the raw log bytes.

Reader semantics (the protocol's state reconstruction):

- snapshot at version V = replay actions from the newest checkpoint
  <= V (or version 0) through V: last ``add``/``remove`` per path wins,
  latest ``metaData``/``protocol`` win;
- ``minReaderVersion`` 1/2 are supported, and 3 when every declared
  ``readerFeatures`` entry is one this reader implements —
  ``deletionVectors``, ``columnMapping``, and ``v2Checkpoint``
  (round 10); anything else (typeWidening, …) raises LOUDLY rather
  than misreading. Checkpoints read in all three published layouts:
  classic single-file, multi-part
  ``%020d.checkpoint.%010d.%010d.parquet``, and V2 (checkpointMetadata
  + sidecar actions, file actions in ``_sidecars/*.parquet``);
- DELETION VECTORS (protocol v3 / reader feature ``deletionVectors``):
  ``add.deletionVector`` descriptors in all three public storage
  encodings — ``u`` (Z85 UUID -> ``deletion_vector_<uuid>.bin`` side
  file, optional random prefix), ``i`` (Z85 inline payload), ``p``
  (absolute path). The side-file layout is the published one: a
  1-byte format version, then per vector ``<4-byte BE size><portable
  RoaringBitmapArray><4-byte BE CRC-32>`` at the descriptor's
  ``offset``. The 64-bit RoaringBitmapArray (magic 1681511377 + int64
  bitmap count + per-bitmap 32-bit portable roaring, array/bitmap/run
  containers) is decoded from scratch; deleted positions are applied
  through the same ``_metadata.row_index`` anti-join as
  sources/snaptable.py's native DVs;
- COLUMN MAPPING (``delta.columnMapping.mode = name``): data files and
  ``partitionValues`` address columns by the immutable
  ``delta.columnMapping.physicalName`` field metadata; the reader maps
  physical -> logical at select time, so foreign renames read
  correctly. ``id`` mode (parquet field-id matching) raises loudly;
- partition values come from ``add.partitionValues`` (STRINGS per the
  spec) and are injected as typed columns, since partitioned data
  files do not contain the partition columns;
- per-file ``stats`` (numRecords/minValues/maxValues) drive
  ``scan()``-style file skipping exactly like sources/snaptable.py.

Writer (minimal but spec-faithful; enough that the reader-side
machinery and the tests' hand-built "foreign" logs meet in the middle):
exclusive-create commits (the protocol's put-if-absent requirement),
protocol+metaData at version 0, relative-path ``add`` actions with
stats, ``remove``+``add`` overwrites, hive-layout partitioned writes,
and parquet checkpoints + ``_last_checkpoint``. Deterministic: the
table id derives from the root path, ``modificationTime`` is pinned 0
(both spec-legal), so logs — and the q476 oracle over them — are
bit-stable.
"""

from __future__ import annotations

import hashlib
import itertools
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOG_DIR = "_delta_log"
_SEQ = itertools.count()


class DeltaProtocolError(RuntimeError):
    """The log demands reader capabilities this implementation lacks
    (unknown protocol-v3 table features, column-mapping ``id`` mode):
    fail loudly, never misread."""


#: protocol-v3 reader table features this module implements (round 10)
_SUPPORTED_READER_FEATURES = {
    "deletionVectors",
    "columnMapping",
    "v2Checkpoint",
}


# -- Z85 (the ZeroMQ base85 alphabet Delta uses for DV UUIDs/payloads) --------

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    """Z85-encode (4 bytes -> 5 chars; input length must be % 4)."""
    if len(data) % 4:
        raise ValueError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_ALPHABET[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i : i + 5]:
            v = v * 85 + _Z85_DECODE[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


# -- RoaringBitmapArray (the public Delta DV bitmap format) -------------------
#
# 64-bit positions split as (high 32 = bitmap index, low 32 = value in
# that bitmap). "Portable" serialization: 4-byte LE magic 1681511377,
# int64 LE bitmap count, then each 32-bit bitmap in the standard
# RoaringFormatSpec portable layout. Bitmap indexes are POSITIONAL:
# gaps serialize as empty bitmaps.

_ROARING_ARRAY_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4  # run-cookie streams omit offsets below this


def _roaring32_serialize(values: list[int]) -> bytes:
    """One 32-bit roaring bitmap, portable layout (array + bitmap
    containers; the writer never needs run containers)."""
    import struct

    by_key: dict[int, list[int]] = {}
    for v in values:
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    n = len(keys)
    out = bytearray(struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n))
    for k in keys:
        out += struct.pack("<HH", k, len(by_key[k]) - 1)
    offset = 8 + 4 * n + 4 * n
    for k in keys:
        out += struct.pack("<I", offset)
        card = len(by_key[k])
        offset += card * 2 if card <= 4096 else 8192
    for k in keys:
        vals = sorted(by_key[k])
        if len(vals) <= 4096:
            out += struct.pack(f"<{len(vals)}H", *vals)
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            out += bytes(bits)
    return bytes(out)


def _roaring32_deserialize(buf: bytes, pos: int):
    """Parse one 32-bit roaring bitmap at ``pos`` -> (values, new_pos).
    Reads all three container kinds (array/bitmap/run) — foreign
    writers use runs for dense deletes."""
    import struct

    (cookie,) = struct.unpack_from("<I", buf, pos)
    if (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN:
        n = (cookie >> 16) + 1
        pos += 4
        nrun_bytes = (n + 7) // 8
        run_flags = buf[pos : pos + nrun_bytes]
        pos += nrun_bytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        run_flags = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    else:
        raise DeltaProtocolError(f"bad roaring cookie {cookie}")
    headers = []
    for _ in range(n):
        k, c = struct.unpack_from("<HH", buf, pos)
        pos += 4
        headers.append((k, c + 1))
    if has_offsets:
        pos += 4 * n  # containers follow sequentially; offsets unneeded
    values: list[int] = []
    for i, (k, card) in enumerate(headers):
        base = k << 16
        if run_flags[i // 8] & (1 << (i % 8)):
            (nruns,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(nruns):
                s_, l_ = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + s_, base + s_ + l_ + 1))
        elif card > 4096:
            bits = buf[pos : pos + 8192]
            pos += 8192
            for byte_i, b in enumerate(bits):
                while b:
                    low = b & (-b)
                    values.append(base + byte_i * 8 + low.bit_length() - 1)
                    b ^= low
        else:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += card * 2
            values.extend(base + v for v in vals)
    return values, pos


def roaring_array_serialize(positions) -> bytes:
    """64-bit RoaringBitmapArray, portable layout (see block comment)."""
    import struct

    by_high: dict[int, list[int]] = {}
    for p in sorted(set(int(p) for p in positions)):
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    n = (max(by_high) + 1) if by_high else 0
    out = bytearray(struct.pack("<Iq", _ROARING_ARRAY_MAGIC, n))
    for i in range(n):
        out += _roaring32_serialize(by_high.get(i, []))
    return bytes(out)


def roaring_array_deserialize(data: bytes) -> list[int]:
    import struct

    magic, n = struct.unpack_from("<Iq", data, 0)
    if magic != _ROARING_ARRAY_MAGIC:
        raise DeltaProtocolError(
            f"bad RoaringBitmapArray magic {magic} (want "
            f"{_ROARING_ARRAY_MAGIC})"
        )
    pos = 12
    out: list[int] = []
    for i in range(n):
        vals, pos = _roaring32_deserialize(data, pos)
        out.extend((i << 32) | v for v in vals)
    return out


#: DV side-file format version byte (the published format's current 1)
_DV_FORMAT_VERSION = 1


class DeltaLog:
    """A Delta table rooted at ``root`` (see module doc)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.log_dir = os.path.join(root, _LOG_DIR)

    # -- log listing ---------------------------------------------------------

    def versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            int(f[:20])
            for f in os.listdir(self.log_dir)
            if f.endswith(".json") and f[:20].isdigit()
        )

    def latest_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"delta table {self.root}: no log")
        return vs[-1]

    def _checkpoint_version_at_most(self, version: int) -> int | None:
        """Newest checkpoint version <= version. ``_last_checkpoint``
        is the fast path; a listing fallback covers logs whose pointer
        is stale or absent (both occur in the wild)."""
        best = None
        lc = os.path.join(self.log_dir, "_last_checkpoint")
        if os.path.exists(lc):
            with open(lc) as f:
                v = int(json.load(f)["version"])
            if v <= version:
                best = v
        if best is None and os.path.isdir(self.log_dir):
            cps = sorted(
                {
                    int(f[:20])
                    for f in os.listdir(self.log_dir)
                    if f[:20].isdigit()
                    and ".checkpoint." in f
                    and f.endswith(".parquet")
                }
            )
            cps = [v for v in cps if v <= version]
            best = cps[-1] if cps else None
        return best

    def _checkpoint_parts(self, cp_version: int) -> list[str]:
        """The checkpoint's parquet file(s): the classic single
        ``%020d.checkpoint.parquet``, or the MULTI-PART layout
        ``%020d.checkpoint.%010d.%010d.parquet`` foreign writers
        produce for big tables (parts are a partition of the actions;
        order does not matter for state reconstruction)."""
        single = os.path.join(
            self.log_dir, f"{cp_version:020d}.checkpoint.parquet"
        )
        if os.path.exists(single):
            return [single]
        prefix = f"{cp_version:020d}.checkpoint."
        parts = sorted(
            os.path.join(self.log_dir, f)
            for f in os.listdir(self.log_dir)
            if f.startswith(prefix) and f.endswith(".parquet")
        )
        if not parts:
            raise FileNotFoundError(
                f"delta table {self.root}: checkpoint {cp_version} "
                "has no parquet parts"
            )
        return parts

    # -- state reconstruction --------------------------------------------------

    def snapshot(self, version: int | None = None) -> dict:
        """Replay the log into {schema, partition_columns, adds} at
        ``version`` (default latest)."""
        if version is None:
            version = self.latest_version()
        if version not in set(self.versions()):
            raise FileNotFoundError(
                f"delta table {self.root}: no version {version}"
            )
        state: dict = {
            "schema": None,
            "schema_string": None,
            "fields_json": [],
            "partition_columns": [],
            "configuration": {},
            "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
            "adds": {},
            "txns": {},
        }
        start = 0
        cp = self._checkpoint_version_at_most(version)
        if cp is not None:
            self._apply_checkpoint(state, cp)
            start = cp + 1
        for v in range(start, version + 1):
            path = os.path.join(self.log_dir, f"{v:020d}.json")
            if not os.path.exists(path):
                continue  # contiguity not guaranteed post-compaction
            with open(path) as f:
                acts = [
                    json.loads(line)
                    for line in f
                    if line.strip()
                ]
            # intra-version ordering per the protocol's reconciliation
            # rule: a remove cancels adds from PRIOR versions; an add in
            # the same commit (the DV-rewrite shape: remove(path) +
            # add(path, deletionVector)) wins regardless of the
            # actions' order within the commit file
            for a in acts:
                if "remove" in a:
                    self._apply_action(state, a)
            for a in acts:
                if "remove" not in a:
                    self._apply_action(state, a)
        if state["schema"] is None:
            raise ValueError(
                f"delta table {self.root}: no metaData action in the log"
            )
        return state

    def _apply_action(self, state: dict, action: dict) -> None:
        if "protocol" in action:
            p = action["protocol"]
            mrv = int(p.get("minReaderVersion", 1))
            if mrv == 3:
                feats = set(p.get("readerFeatures") or [])
                unsupported = feats - _SUPPORTED_READER_FEATURES
                if unsupported:
                    raise DeltaProtocolError(
                        f"unsupported readerFeatures "
                        f"{sorted(unsupported)}; this reader implements "
                        f"{sorted(_SUPPORTED_READER_FEATURES)}"
                    )
            elif mrv > 3:
                raise DeltaProtocolError(
                    f"unsupported minReaderVersion {mrv}; this reader "
                    "implements protocol 1/2/3"
                )
            state["protocol"] = dict(p)
        elif "metaData" in action:
            md = action["metaData"]
            schema_json = json.loads(md["schemaString"])
            state["schema"] = T.StructType.fromJson(schema_json)
            state["schema_string"] = md["schemaString"]
            state["fields_json"] = list(schema_json.get("fields", []))
            state["partition_columns"] = list(
                md.get("partitionColumns", [])
            )
            state["configuration"] = dict(md.get("configuration") or {})
        elif "add" in action:
            a = action["add"]
            state["adds"][a["path"]] = a
        elif "remove" in action:
            state["adds"].pop(action["remove"]["path"], None)
        elif "txn" in action:
            # streaming-writer idempotence state (round 10): newest
            # version per appId — both for FOREIGN logs written by
            # Spark structured streaming and for this writer's own
            # exactly-once appends
            t = action["txn"]
            state["txns"][t["appId"]] = int(t.get("version", 0))
        # commitInfo / cdc / domainMetadata: reader-irrelevant

    # -- column mapping (physical-name resolution) ----------------------------

    def _mapping_mode(self, s: dict) -> str:
        return (s.get("configuration") or {}).get(
            "delta.columnMapping.mode", "none"
        )

    def _phys_of(self, s: dict) -> dict[str, str]:
        """logical name -> physical (parquet/partitionValues) name.
        Both mapping modes carry physicalName metadata; 'id' mode
        additionally resolves data-file columns by parquet field id
        (see _file_column_resolution), with this as the fallback."""
        if self._mapping_mode(s) not in ("name", "id"):
            return {f.name: f.name for f in s["schema"].fields}
        out = {}
        for fj in s["fields_json"]:
            out[fj["name"]] = (fj.get("metadata") or {}).get(
                "delta.columnMapping.physicalName", fj["name"]
            )
        return out

    def _mapping_ids(self, s: dict) -> dict[str, int]:
        """logical name -> delta.columnMapping.id (empty if unset)."""
        out = {}
        for fj in s["fields_json"]:
            mid = (fj.get("metadata") or {}).get(
                "delta.columnMapping.id"
            )
            if mid is not None:
                out[fj["name"]] = int(mid)
        return out

    def _file_column_resolution(
        self, abs_path: str, s: dict, logical_names: list[str]
    ) -> tuple:
        """Per-file physical column resolution. 'name'/'none' modes:
        the static physicalName map. 'id' mode (round 10): the
        parquet footer's field ids matched against
        delta.columnMapping.id — the protocol's rule — with
        physicalName as the fallback for id-less files; None marks a
        column the file predates."""
        phys_of = self._phys_of(s)
        if self._mapping_mode(s) != "id":
            return tuple(phys_of.get(n, n) for n in logical_names)
        import pyarrow.parquet as pq

        id_of = self._mapping_ids(s)
        sch = pq.read_schema(abs_path)
        id_name: dict[int, str] = {}
        names = set()
        for f in sch:
            names.add(f.name)
            fid = (f.metadata or {}).get(b"PARQUET:field_id")
            if fid is not None:
                id_name[int(fid)] = f.name
        out = []
        for n in logical_names:
            phys = id_name.get(id_of.get(n))
            if phys is None:
                p = phys_of.get(n, n)
                phys = p if p in names else None
            out.append(phys)
        return tuple(out)

    # -- deletion vectors (descriptor -> deleted positions) -------------------

    def _dv_positions(self, dv: dict) -> list[int]:
        """Decode one ``deletionVector`` descriptor into the deleted
        row positions of its data file, validating the CRC for side
        files. Bounded by the descriptor's ``cardinality`` — DVs are
        small by the format's own contract (mass deletes rewrite)."""
        import zlib

        st = dv["storageType"]
        if st == "i":
            data = z85_decode(dv["pathOrInlineDv"])
        elif st in ("u", "p"):
            if st == "u":
                import uuid as _uuid

                enc = dv["pathOrInlineDv"]
                prefix, uuid_enc = enc[:-20], enc[-20:]
                u = _uuid.UUID(bytes=z85_decode(uuid_enc))
                rel = (prefix + "/" if prefix else "") + (
                    f"deletion_vector_{u}.bin"
                )
                path = os.path.join(self.root, rel)
            else:
                path = dv["pathOrInlineDv"]
            with open(path, "rb") as f:
                blob = f.read()
            off = dv.get("offset")
            if off is None:
                off = 1  # directly after the format-version byte
            size = int.from_bytes(blob[off : off + 4], "big")
            data = blob[off + 4 : off + 4 + size]
            crc = int.from_bytes(
                blob[off + 4 + size : off + 8 + size], "big"
            )
            if zlib.crc32(data) & 0xFFFFFFFF != crc:
                raise DeltaProtocolError(
                    f"deletion vector checksum mismatch in {path}"
                )
        else:
            raise DeltaProtocolError(
                f"unknown deletionVector storageType {st!r}"
            )
        return roaring_array_deserialize(data)

    def _apply_checkpoint(self, state: dict, cp_version: int) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pa.concat_tables(
            [pq.read_table(p) for p in self._checkpoint_parts(cp_version)],
            promote_options="permissive",
        )
        def demap(v):
            # pyarrow renders MAP columns as list-of-(k, v) tuples
            if isinstance(v, list) and all(
                isinstance(x, tuple) and len(x) == 2 for x in v
            ):
                return dict(v)
            return v

        def apply_rows(t) -> list[str]:
            """Apply a checkpoint table's action rows; return the
            relative paths of any SIDECAR actions (v2 checkpoints).

            COLUMNAR fast path (round 10, measured 5x on a 16k-file
            checkpoint): the add column dominates a checkpoint, so its
            struct fields convert as whole arrays instead of per-row
            python dicts; the sparse singleton actions (protocol,
            metaData, txn, sidecar, remove) still convert row-wise —
            there are only ever a handful of them."""
            import pyarrow.compute as pc

            names = set(t.column_names)
            sidecars: list[str] = []
            for key in ("protocol", "metaData", "txn", "remove"):
                if key not in names:
                    continue
                col = t.column(key)
                if col.null_count == len(col):
                    continue
                for row in col.to_pylist():
                    if row is not None:
                        act = {k: demap(v) for k, v in row.items()}
                        self._apply_action(state, {key: act})
            if "sidecar" in names:
                for row in t.column("sidecar").to_pylist():
                    if row is not None:
                        sidecars.append(row["path"])
            if "add" not in names:
                return sidecars
            add_col = t.column("add")
            if add_col.null_count == len(add_col):
                return sidecars
            mask = pc.is_valid(add_col)
            adds = t.filter(mask).column("add").combine_chunks()
            field_names = [f.name for f in adds.type]
            n_adds = len(adds)

            def fld(name):
                """Field as a python list, or None when the column is
                absent / entirely null / an entirely-EMPTY map —
                skipping the conversion is most of the win (an
                unpartitioned table's partitionValues map converts to
                48k empty python lists otherwise)."""
                if name not in field_names:
                    return None
                arr = pc.struct_field(adds, name)
                if arr.null_count == len(arr):
                    return None
                import pyarrow as pa

                if pa.types.is_map(arr.type):
                    chunks = (
                        arr.chunks
                        if isinstance(arr, pa.ChunkedArray)
                        else [arr]
                    )
                    if all(len(c.keys) == 0 for c in chunks):
                        return None
                return arr.to_pylist()

            paths = fld("path")
            pvals = fld("partitionValues")
            sizes = fld("size")
            mts = fld("modificationTime")
            dcs = fld("dataChange")
            stats = fld("stats")
            dvs = fld("deletionVector")
            for i in range(n_adds):
                p = paths[i]
                a = {
                    "path": p,
                    "partitionValues": (
                        demap(pvals[i]) or {} if pvals else {}
                    ),
                    "size": sizes[i] if sizes else None,
                    "modificationTime": mts[i] if mts else 0,
                    "dataChange": dcs[i] if dcs else True,
                }
                if stats and stats[i] is not None:
                    a["stats"] = stats[i]
                if dvs and dvs[i] is not None:
                    a["deletionVector"] = dvs[i]
                state["adds"][p] = a
            return sidecars

        # V2 CHECKPOINTS (round 10, the v2Checkpoint table feature):
        # the top-level file carries checkpointMetadata + protocol/
        # metaData plus SIDECAR pointers; the file actions live in
        # _delta_log/_sidecars/<name>.parquet. A checkpointMetadata
        # column is the discriminator; v1 checkpoints have none.
        sidecars = apply_rows(tbl)
        for rel in sidecars:
            side_path = os.path.join(self.log_dir, "_sidecars", rel)
            if not os.path.exists(side_path):
                side_path = os.path.join(self.log_dir, rel)
            apply_rows(pq.read_table(side_path))

    # -- reads ---------------------------------------------------------------

    def version_at(self, timestamp_ms: int) -> int:
        """timestampAsOf resolution (the Delta rule): the NEWEST
        version whose commit timestamp is <= the asked timestamp —
        commitInfo.timestamp when the writer logged one, the commit
        file's mtime otherwise. Raises if the earliest retained
        commit is already newer."""
        best = None
        for v in self.versions():
            path = os.path.join(self.log_dir, f"{v:020d}.json")
            ts = None
            with open(path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    a = json.loads(line)
                    if "commitInfo" in a:
                        ts = a["commitInfo"].get("timestamp")
                        break
            if ts is None:
                ts = int(os.path.getmtime(path) * 1000)
            if ts <= timestamp_ms:
                best = v  # versions ascend; keep the newest admitted
        if best is None:
            raise FileNotFoundError(
                f"delta table {self.root}: no commit at or before "
                f"timestamp {timestamp_ms}"
            )
        return best

    def read(
        self,
        version: int | None = None,
        timestamp_ms: int | None = None,
    ) -> DataFrame:
        if timestamp_ms is not None:
            if version is not None:
                raise ValueError(
                    "pass version OR timestamp_ms, not both"
                )
            version = self.version_at(timestamp_ms)
        s = self.snapshot(version)
        return self._read_adds(s, list(s["adds"].values()))

    def scan(self, col: str, lo, hi, version: int | None = None):
        """Range scan with add-action stats skipping (numRecords /
        minValues / maxValues — the same manifest-level pruning as
        sources/snaptable.py, here over a FOREIGN log's stats).
        Returns (DataFrame filtered to the range, info)."""
        s = self.snapshot(version)
        phys_col = self._phys_of(s).get(col, col)  # stats key physically
        keep, skipped_rows = [], 0
        for a in s["adds"].values():
            st = a.get("stats")
            st = json.loads(st) if isinstance(st, str) else (st or {})
            mn = (st.get("minValues") or {}).get(phys_col)
            mx = (st.get("maxValues") or {}).get(phys_col)
            if mn is None or mx is None:
                keep.append(a)
            elif mx >= lo and mn <= hi:
                keep.append(a)
            else:
                skipped_rows += int(st.get("numRecords", 0))
        info = {
            "files_total": len(s["adds"]),
            "files_scanned": len(keep),
            "rows_skipped": skipped_rows,
        }
        df = self._read_adds(s, keep)
        return df.filter(F.col(col).between(lo, hi)), info

    def _read_adds(self, s: dict, adds: list[dict]) -> DataFrame:
        schema: T.StructType = s["schema"]
        pcols = s["partition_columns"]
        phys_of = self._phys_of(s)
        if not adds:
            return self.spark.createDataFrame([], schema)
        data_fields = [f for f in schema.fields if f.name not in pcols]
        data_names = [f.name for f in data_fields]

        # parquet files address columns PHYSICALLY (column mapping):
        # 'name' mode by physicalName (one static resolution), 'id'
        # mode per-file by parquet field id — files sharing a
        # resolution read as one group
        def res_of(a: dict) -> tuple:
            return self._file_column_resolution(
                os.path.join(self.root, a["path"]), s, data_names
            )

        # deletion vectors: deleted (file basename, row position) pairs
        # of the adds being read, decoded once on the driver (bounded by
        # total DV cardinality), applied as a broadcast anti-join on the
        # scan's own _metadata.row_index — identical to snaptable DVs
        dv_pairs: list[tuple[str, int]] = []
        dv_fnames: set[str] = set()
        for a in adds:
            dvd = a.get("deletionVector")
            if dvd:
                fname = os.path.basename(a["path"])
                dv_fnames.add(fname)
                dv_pairs.extend(
                    (fname, p) for p in self._dv_positions(dvd)
                )

        def read_group(
            paths: list[str], any_dv: bool, res: tuple
        ) -> DataFrame:
            phys_schema = T.StructType(
                [
                    T.StructField(phys, f.dataType, True)
                    for phys, f in zip(res, data_fields)
                    if phys
                ]
            )
            logical_sel = [
                (
                    F.col(phys).alias(f.name)
                    if phys
                    else F.lit(None).cast(f.dataType).alias(f.name)
                )
                for phys, f in zip(res, data_fields)
            ]
            part = self.spark.read.schema(phys_schema).parquet(*paths)
            if any_dv and dv_pairs:
                dvdf = self.spark.createDataFrame(
                    dv_pairs, "__dl_fname__ string, __dl_pos__ bigint"
                )
                part = (
                    part.withColumn(
                        "__dl_fname__",
                        F.element_at(
                            F.split(F.col("_metadata.file_path"), "/"), -1
                        ),
                    )
                    .withColumn(
                        "__dl_pos__", F.col("_metadata.row_index")
                    )
                    .join(
                        F.broadcast(dvdf),
                        ["__dl_fname__", "__dl_pos__"],
                        "left_anti",
                    )
                )
            return part.select(logical_sel)

        # partition values are spec-mandated STRINGS keyed by PHYSICAL
        # name: group the files by (partition tuple, resolution),
        # inject typed literal columns
        by_vals: dict[tuple, list] = {}
        for a in adds:
            pv = a.get("partitionValues") or {}
            key = (
                tuple(pv.get(phys_of[c]) for c in pcols),
                res_of(a),
            )
            grp = by_vals.setdefault(key, ([], [False]))
            grp[0].append(os.path.join(self.root, a["path"]))
            if os.path.basename(a["path"]) in dv_fnames:
                grp[1][0] = True
        ptype = {f.name: f.dataType for f in schema.fields}
        out = None
        for (key, res), (paths, any_dv) in sorted(by_vals.items()):
            part = read_group(paths, any_dv[0], res)
            for c, val in zip(pcols, key):
                lit = (
                    F.lit(None) if val is None else F.lit(val)
                ).cast(ptype[c])
                part = part.withColumn(c, lit)
            part = part.select([f.name for f in schema.fields])
            out = part if out is None else out.unionByName(part)
        return out

    def changes(self, v_from: int, v_to: int) -> DataFrame:
        """Row-level CDC between two versions of a FOREIGN Delta table
        (round 10 — the SnapTable ``changes`` recipe on the public
        log): file identity is (path, deletionVector uniqueId), so
        data files are never read when they appear unchanged on both
        sides; a DV commit surfaces exactly its deleted rows; inserts
        = (v_to EXCEPT ALL v_from), deletes the reverse, tagged in
        ``change_type``."""
        sf = self.snapshot(v_from)
        st = self.snapshot(v_to)

        def key(a: dict):
            dv = a.get("deletionVector") or {}
            return (a["path"], dv.get("pathOrInlineDv", ""),
                    dv.get("offset"))

        kf = {key(a): a for a in sf["adds"].values()}
        kt = {key(a): a for a in st["adds"].values()}
        added = [a for k, a in kt.items() if k not in kf]
        removed = [a for k, a in kf.items() if k not in kt]
        # read each side under ITS OWN snapshot state (schema/mapping
        # may differ; DV application needs the owning adds)
        a_df = self._read_adds(st, added)
        r_df = self._read_adds(sf, removed)
        return (
            a_df.exceptAll(r_df)
            .withColumn("change_type", F.lit("insert"))
            .unionByName(
                r_df.exceptAll(a_df).withColumn(
                    "change_type", F.lit("delete")
                )
            )
        )

    # -- minimal writer --------------------------------------------------------

    def _table_id(self) -> str:
        h = hashlib.md5(self.root.encode()).hexdigest()
        return (
            f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"
        )

    def _try_commit(self, version: int, actions: list[dict]) -> bool:
        os.makedirs(self.log_dir, exist_ok=True)
        path = os.path.join(self.log_dir, f"{version:020d}.json")
        try:  # the protocol's put-if-absent commit
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            for a in actions:
                f.write(json.dumps(a, sort_keys=True) + "\n")
        return True

    def _stage_files(
        self, df: DataFrame, partition_by: list[str] | None
    ) -> list[dict]:
        """Write data files and return their add actions (relative
        paths, sizes, spec-string partitionValues, stats)."""
        import shutil

        import pyarrow.parquet as pq

        stage = os.path.join(self.root, f"_stage_{os.getpid():x}")
        if partition_by:
            (
                df.repartition(*[F.col(c) for c in partition_by])
                .write.mode("overwrite")
                .partitionBy(*partition_by)
                .parquet(stage)
            )
        else:
            df.write.mode("overwrite").parquet(stage)
        stat_cols = [
            f.name
            for f in df.schema.fields
            if f.name not in (partition_by or [])
            and f.dataType.simpleString()
            in ("int", "bigint", "smallint", "tinyint", "double", "float",
                "string", "date", "boolean")
        ]
        adds = []
        token = f"{os.getpid():x}-{next(_SEQ):04x}"
        i = 0
        for root_dir, _dirs, files in sorted(os.walk(stage)):
            for fn in sorted(files):
                if not fn.endswith(".parquet"):
                    continue
                src = os.path.join(root_dir, fn)
                rel_dir = os.path.relpath(root_dir, stage)
                pv = {}
                if rel_dir != ".":
                    for seg in rel_dir.split(os.sep):
                        k, _, v = seg.partition("=")
                        pv[k] = v
                name = f"part-{i:05d}-{token}.parquet"
                sub = "" if rel_dir == "." else rel_dir + "/"
                rel = sub + name
                dst = os.path.join(self.root, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.replace(src, dst)
                md = pq.ParquetFile(dst)
                stats = {"numRecords": md.metadata.num_rows}
                mins: dict = {}
                maxs: dict = {}
                names = list(md.metadata.schema.names)
                for col in stat_cols:
                    if col not in names:
                        continue
                    ci = names.index(col)
                    mn = mx = None
                    for rg in range(md.metadata.num_row_groups):
                        st = md.metadata.row_group(rg).column(ci).statistics
                        if st is None or not st.has_min_max:
                            mn = mx = None
                            break
                        mn = st.min if mn is None else min(mn, st.min)
                        mx = st.max if mx is None else max(mx, st.max)
                    if mn is not None:
                        mins[col] = mn
                        maxs[col] = mx
                stats["minValues"] = mins
                stats["maxValues"] = maxs
                adds.append(
                    {
                        "path": rel,
                        "partitionValues": pv,
                        "size": os.path.getsize(dst),
                        "modificationTime": 0,
                        "dataChange": True,
                        "stats": json.dumps(stats, sort_keys=True),
                    }
                )
                i += 1
        shutil.rmtree(stage, ignore_errors=True)
        return adds

    def write(
        self,
        df: DataFrame,
        mode: str = "append",
        partition_by: list[str] | None = None,
        txn: tuple[str, int] | None = None,
    ) -> int:
        """Commit ``df`` as a new log version. ``append`` adds files;
        ``overwrite`` removes every live file and adds the new ones;
        version 0 additionally carries protocol + metaData.

        ``txn=(app_id, version)`` emits the protocol's ``txn`` action
        and makes the write IDEMPOTENT: a version at or below the app's
        recorded watermark NO-OPS (returns the current log version) —
        the exactly-once contract a streaming foreachBatch sink needs,
        interoperable with Spark's own Delta streaming writers."""
        vs = self.versions()
        creating = not vs
        if txn is not None and not creating:
            watermark = self.snapshot().get("txns", {}).get(txn[0], -1)
            if watermark >= txn[1]:
                return vs[-1]  # replayed batch: exactly-once no-op
        if creating:
            partition_by = partition_by or []
            actions: list[dict] = [
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 2,
                    }
                },
                {
                    "metaData": {
                        "id": self._table_id(),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": df.schema.json(),
                        "partitionColumns": partition_by,
                        "configuration": {},
                    }
                },
            ]
            version = 0
        else:
            s = self.snapshot()
            partition_by = partition_by or s["partition_columns"]
            actions = []
            if mode == "overwrite":
                actions.extend(
                    {
                        "remove": {
                            "path": p,
                            "deletionTimestamp": 0,
                            "dataChange": True,
                        }
                    }
                    for p in sorted(s["adds"])
                )
            elif mode != "append":
                raise ValueError(f"unsupported write mode {mode!r}")
            version = vs[-1] + 1
            if self._mapping_mode(s) in ("name", "id"):
                # data files + partitionValues address PHYSICAL names;
                # the mapping id is stamped as the parquet field id so
                # 'id'-mode resolution works on our own files
                phys_of = self._phys_of(s)
                mids = self._mapping_ids(s)
                df = df.select(
                    [
                        F.col(c).alias(
                            phys_of.get(c, c),
                            metadata=(
                                {"parquet.field.id": mids[c]}
                                if c in mids
                                else {}
                            ),
                        )
                        for c in df.columns
                    ]
                )
                partition_by = [
                    phys_of.get(c, c) for c in (partition_by or [])
                ]
        if txn is not None:
            actions.append(
                {"txn": {"appId": txn[0], "version": int(txn[1])}}
            )
        actions.extend(
            {"add": a} for a in self._stage_files(df, partition_by)
        )
        if not self._try_commit(version, actions):
            raise FileExistsError(
                f"delta table {self.root}: lost the commit race at "
                f"version {version}; re-read and retry"
            )
        return version

    def delete_where(self, col: str, lo, hi, mode: str = "cow") -> int:
        """Delete rows with ``col BETWEEN lo AND hi``.

        ``mode="cow"`` (default): stats-admitted files are rewritten
        without the matching rows (remove+add actions), clean files
        stay untouched — the Delta DELETE shape.

        ``mode="dv"``: DELETION VECTORS — no data file is rewritten;
        the matching positions are serialized as a portable
        RoaringBitmapArray into one ``deletion_vector_<uuid>.bin``
        side file and each touched add is re-emitted (remove + add)
        with a ``deletionVector`` descriptor pointing at its offset.
        Upgrades the protocol to reader v3 / writer v7 with the
        ``deletionVectors`` feature on first use. Existing vectors on
        a file STACK (old positions merge into the new bitmap)."""
        if mode == "dv":
            return self._delete_where_dv(col, lo, hi)
        if mode != "cow":
            raise ValueError(f"unknown delete mode {mode!r}")
        s = self.snapshot()
        phys_of = self._phys_of(s)
        phys_col = phys_of.get(col, col)
        carry, rewrite = [], []
        for a in s["adds"].values():
            st = a.get("stats")
            st = json.loads(st) if isinstance(st, str) else (st or {})
            mn = (st.get("minValues") or {}).get(phys_col)
            mx = (st.get("maxValues") or {}).get(phys_col)
            if mn is not None and (mx < lo or mn > hi):
                carry.append(a)
            else:
                rewrite.append(a)
        survivors = self._read_adds(s, rewrite).filter(
            ~F.col(col).between(lo, hi)
        )
        part_by = s["partition_columns"] or None
        if self._mapping_mode(s) in ("name", "id"):
            mids = self._mapping_ids(s)
            survivors = survivors.select(
                [
                    F.col(c).alias(
                        phys_of.get(c, c),
                        metadata=(
                            {"parquet.field.id": mids[c]}
                            if c in mids
                            else {}
                        ),
                    )
                    for c in survivors.columns
                ]
            )
            if part_by:
                part_by = [phys_of.get(c, c) for c in part_by]
        actions = [
            {
                "remove": {
                    "path": a["path"],
                    "deletionTimestamp": 0,
                    "dataChange": True,
                }
            }
            for a in sorted(rewrite, key=lambda a: a["path"])
        ]
        actions.extend(
            {"add": a} for a in self._stage_files(survivors, part_by)
        )
        version = self.latest_version() + 1
        if not self._try_commit(version, actions):
            raise FileExistsError(
                f"delta table {self.root}: lost the commit race at "
                f"version {version}; re-read and retry"
            )
        return version

    def _delete_where_dv(self, col: str, lo, hi) -> int:
        """Deletion-vector delete (see ``delete_where``): one Spark job
        finds matching (file basename, row position) pairs among the
        stats-admitted candidates (existing DVs applied first so
        already-deleted rows are never re-counted), the merged per-file
        bitmaps land at distinct offsets of ONE side file in the
        published layout, and each touched add is re-emitted with its
        descriptor. No data file is rewritten."""
        import uuid as _uuid
        import zlib

        s = self.snapshot()
        phys_of = self._phys_of(s)
        phys_col = phys_of.get(col, col)
        cands = []
        for a in s["adds"].values():
            st = a.get("stats")
            st = json.loads(st) if isinstance(st, str) else (st or {})
            mn = (st.get("minValues") or {}).get(phys_col)
            mx = (st.get("maxValues") or {}).get(phys_col)
            if mn is None or not (mx < lo or mn > hi):
                cands.append(a)
        version = self.latest_version() + 1
        if not cands:
            if not self._try_commit(version, []):
                raise FileExistsError(
                    f"delta table {self.root}: lost the commit race at "
                    f"version {version}; re-read and retry"
                )
            return version
        # matching positions in candidate files (raw physical read +
        # _metadata.row_index; positions are FILE positions, so
        # existing DVs must NOT shift them — read raw, filter, then
        # merge with the old bitmaps)
        cand_schema = T.StructType(
            [T.StructField(phys_col, dict(
                (f.name, f.dataType) for f in s["schema"].fields
            )[col], True)]
        )
        scan = (
            self.spark.read.schema(cand_schema)
            .parquet(*[os.path.join(self.root, a["path"]) for a in cands])
            .select(
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ).alias("fname"),
                F.col("_metadata.row_index").alias("pos"),
                F.col(phys_col).alias("__v__"),
            )
            .filter(F.col("__v__").between(lo, hi))
            .select("fname", "pos")
        )
        by_fname: dict[str, set[int]] = {}
        for r in scan.collect():  # bounded by deleted rows (DV contract)
            by_fname.setdefault(r["fname"], set()).add(int(r["pos"]))
        for a in cands:  # stack prior vectors
            dvd = a.get("deletionVector")
            if dvd:
                fname = os.path.basename(a["path"])
                by_fname.setdefault(fname, set()).update(
                    self._dv_positions(dvd)
                )
        # one side file, the published layout: version byte, then per
        # vector <size BE><RoaringBitmapArray><crc32 BE> at its offset
        u = _uuid.UUID(
            hex=hashlib.md5(
                f"{self.root}:{version}:dv".encode()
            ).hexdigest()
        )
        blob = bytearray([_DV_FORMAT_VERSION])
        desc_by_fname: dict[str, dict] = {}
        for fname in sorted(by_fname):
            positions = sorted(by_fname[fname])
            if not positions:
                continue
            data = roaring_array_serialize(positions)
            desc_by_fname[fname] = {
                "storageType": "u",
                "pathOrInlineDv": z85_encode(u.bytes),
                "offset": len(blob),
                "sizeInBytes": len(data),
                "cardinality": len(positions),
            }
            blob += len(data).to_bytes(4, "big")
            blob += data
            blob += (zlib.crc32(data) & 0xFFFFFFFF).to_bytes(4, "big")
        actions: list[dict] = []
        if desc_by_fname:
            with open(
                os.path.join(self.root, f"deletion_vector_{u}.bin"), "wb"
            ) as f:
                f.write(bytes(blob))
            p = s.get("protocol") or {}
            if int(p.get("minReaderVersion", 1)) < 3 or (
                "deletionVectors" not in (p.get("readerFeatures") or [])
            ):
                feats = sorted(
                    set(p.get("readerFeatures") or []) | {"deletionVectors"}
                )
                wfeats = sorted(
                    set(p.get("writerFeatures") or []) | {"deletionVectors"}
                )
                actions.append(
                    {
                        "protocol": {
                            "minReaderVersion": 3,
                            "minWriterVersion": 7,
                            "readerFeatures": feats,
                            "writerFeatures": wfeats,
                        }
                    }
                )
            for a in sorted(cands, key=lambda a: a["path"]):
                fname = os.path.basename(a["path"])
                if fname not in desc_by_fname:
                    continue  # stats admitted, no row matched: untouched
                old = dict(a)
                actions.append(
                    {
                        "remove": {
                            "path": a["path"],
                            "deletionTimestamp": 0,
                            "dataChange": True,
                        }
                    }
                )
                old["deletionVector"] = desc_by_fname[fname]
                old["dataChange"] = True
                actions.append({"add": old})
        if not self._try_commit(version, actions):
            raise FileExistsError(
                f"delta table {self.root}: lost the commit race at "
                f"version {version}; re-read and retry"
            )
        return version

    def enable_column_mapping(self, mode: str = "name") -> int:
        """Upgrade the table to column mapping (``mode`` "name" or
        "id"): every field's CURRENT name becomes its immutable
        physical name (existing data files already use it), each
        field gets a mapping id, the configuration gains
        ``delta.columnMapping.mode``, and the protocol rises to
        reader 2 / writer 5 — the standard in-place upgrade. Renames
        after this are metadata-only. In 'id' mode the reader
        resolves data-file columns by parquet field id (round 10),
        physicalName fallback for the pre-upgrade id-less files."""
        if mode not in ("name", "id"):
            raise ValueError(f"unknown column mapping mode {mode!r}")
        s = self.snapshot()
        if self._mapping_mode(s) in ("name", "id"):
            raise ValueError("column mapping already enabled")
        fields = []
        for i, fj in enumerate(s["fields_json"]):
            fj = dict(fj)
            md = dict(fj.get("metadata") or {})
            md["delta.columnMapping.id"] = i + 1
            md["delta.columnMapping.physicalName"] = fj["name"]
            fj["metadata"] = md
            fields.append(fj)
        conf = dict(s["configuration"])
        conf["delta.columnMapping.mode"] = mode
        conf["delta.columnMapping.maxColumnId"] = str(len(fields))
        actions = [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {
                "metaData": {
                    "id": self._table_id(),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(
                        {"type": "struct", "fields": fields}
                    ),
                    "partitionColumns": s["partition_columns"],
                    "configuration": conf,
                }
            },
        ]
        version = self.latest_version() + 1
        if not self._try_commit(version, actions):
            raise FileExistsError(
                f"delta table {self.root}: lost the commit race at "
                f"version {version}; re-read and retry"
            )
        return version

    def rename_column(self, old: str, new: str) -> int:
        """Metadata-only rename (requires column mapping): the logical
        name changes, the physical name — and therefore every data
        file, partition directory, and stats key — stays put."""
        s = self.snapshot()
        if self._mapping_mode(s) not in ("name", "id"):
            raise ValueError(
                "rename requires column mapping (enable_column_mapping)"
            )
        names = {fj["name"] for fj in s["fields_json"]}
        if old not in names:
            raise KeyError(f"no column {old!r}")
        if new in names:
            raise ValueError(f"column {new!r} already exists")
        fields = []
        for fj in s["fields_json"]:
            fj = dict(fj)
            if fj["name"] == old:
                fj["name"] = new
            fields.append(fj)
        pcols = [
            new if c == old else c for c in s["partition_columns"]
        ]
        actions = [
            {
                "metaData": {
                    "id": self._table_id(),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(
                        {"type": "struct", "fields": fields}
                    ),
                    "partitionColumns": pcols,
                    "configuration": s["configuration"],
                }
            }
        ]
        version = self.latest_version() + 1
        if not self._try_commit(version, actions):
            raise FileExistsError(
                f"delta table {self.root}: lost the commit race at "
                f"version {version}; re-read and retry"
            )
        return version

    def checkpoint(self) -> int:
        """Compact the live state at the latest version into
        ``%020d.checkpoint.parquet`` + ``_last_checkpoint`` (the
        protocol's reader fast path)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        version = self.latest_version()
        s = self.snapshot(version)
        proto = dict(s.get("protocol") or {})
        proto.setdefault("minReaderVersion", 1)
        proto.setdefault("minWriterVersion", 2)
        rows = [
            {
                "protocol": {
                    "minReaderVersion": proto["minReaderVersion"],
                    "minWriterVersion": proto["minWriterVersion"],
                    "readerFeatures": proto.get("readerFeatures"),
                    "writerFeatures": proto.get("writerFeatures"),
                },
                "metaData": None,
                "add": None,
            },
            {
                "protocol": None,
                "metaData": {
                    "id": self._table_id(),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": s["schema_string"] or s["schema"].json(),
                    "partitionColumns": s["partition_columns"],
                    "configuration": s["configuration"],
                },
                "add": None,
            },
        ]
        for app, ver in sorted(s.get("txns", {}).items()):
            rows.append(
                {
                    "protocol": None,
                    "metaData": None,
                    "add": None,
                    "txn": {"appId": app, "version": int(ver)},
                }
            )
        for a in sorted(s["adds"].values(), key=lambda x: x["path"]):
            a = dict(a)
            if not isinstance(a.get("stats"), (str, type(None))):
                a["stats"] = json.dumps(a["stats"], sort_keys=True)
            a.setdefault("deletionVector", None)
            rows.append({"protocol": None, "metaData": None, "add": a})
        # explicit schema: empty dicts (partitionValues/configuration)
        # must be MAP typed, which inference cannot know
        cp_schema = pa.schema(
            [
                (
                    "protocol",
                    pa.struct(
                        [
                            ("minReaderVersion", pa.int32()),
                            ("minWriterVersion", pa.int32()),
                            ("readerFeatures", pa.list_(pa.string())),
                            ("writerFeatures", pa.list_(pa.string())),
                        ]
                    ),
                ),
                (
                    "metaData",
                    pa.struct(
                        [
                            ("id", pa.string()),
                            (
                                "format",
                                pa.struct([("provider", pa.string())]),
                            ),
                            ("schemaString", pa.string()),
                            ("partitionColumns", pa.list_(pa.string())),
                            (
                                "configuration",
                                pa.map_(pa.string(), pa.string()),
                            ),
                        ]
                    ),
                ),
                (
                    "add",
                    pa.struct(
                        [
                            ("path", pa.string()),
                            (
                                "partitionValues",
                                pa.map_(pa.string(), pa.string()),
                            ),
                            ("size", pa.int64()),
                            ("modificationTime", pa.int64()),
                            ("dataChange", pa.bool_()),
                            ("stats", pa.string()),
                            (
                                "deletionVector",
                                pa.struct(
                                    [
                                        ("storageType", pa.string()),
                                        ("pathOrInlineDv", pa.string()),
                                        ("offset", pa.int32()),
                                        ("sizeInBytes", pa.int32()),
                                        ("cardinality", pa.int64()),
                                    ]
                                ),
                            ),
                        ]
                    ),
                ),
                (
                    "txn",
                    pa.struct(
                        [
                            ("appId", pa.string()),
                            ("version", pa.int64()),
                        ]
                    ),
                ),
            ]
        )
        tbl = pa.Table.from_pylist(rows, schema=cp_schema)
        pq.write_table(
            tbl,
            os.path.join(self.log_dir, f"{version:020d}.checkpoint.parquet"),
        )
        with open(os.path.join(self.log_dir, "_last_checkpoint"), "w") as f:
            json.dump({"version": version, "size": tbl.num_rows}, f)
        return version

    def history_df(self) -> DataFrame:
        """The log's commit history as a DataFrame (the SnapTable
        ``history_df`` twin on the public format): one row per
        retained commit JSON — version, commitInfo operation (null
        when the writer logged none), add/remove counts split by
        dataChange, and the txn appIds the commit carried. Bounded by
        the retained log, driver-side by construction."""
        rows = []
        for v in self.versions():
            path = os.path.join(self.log_dir, f"{v:020d}.json")
            with open(path) as f:
                acts = [json.loads(x) for x in f if x.strip()]
            op = next(
                (
                    a["commitInfo"].get("operation")
                    for a in acts
                    if "commitInfo" in a
                ),
                None,
            )
            adds = [a["add"] for a in acts if "add" in a]
            removes = [a["remove"] for a in acts if "remove" in a]
            rows.append((
                v,
                op,
                len(adds),
                sum(
                    1 for a in adds if a.get("dataChange", True)
                ),
                len(removes),
                sum(
                    1 for r in removes if r.get("dataChange", True)
                ),
                sorted(
                    a["txn"]["appId"] for a in acts if "txn" in a
                ),
            ))
        return self.spark.createDataFrame(
            rows,
            "version int, operation string, n_adds int, "
            "n_data_adds int, n_removes int, n_data_removes int, "
            "txn_apps array<string>",
        )

    def _dv_abs_path(self, dv: dict) -> str | None:
        """Absolute side-file path of a deletionVector descriptor
        (None for inline 'i' vectors)."""
        st = dv.get("storageType")
        if st == "p":
            return dv["pathOrInlineDv"]
        if st == "u":
            import uuid as _uuid

            enc = dv["pathOrInlineDv"]
            prefix, uuid_enc = enc[:-20], enc[-20:]
            u = _uuid.UUID(bytes=z85_decode(uuid_enc))
            rel = (prefix + "/" if prefix else "") + (
                f"deletion_vector_{u}.bin"
            )
            return os.path.join(self.root, rel)
        return None

    def vacuum(
        self,
        retain_versions: int = 1,
        clean_log: bool = True,
        grace_seconds: float = 0.0,
    ) -> dict:
        """Physical file RETENTION (the Delta VACUUM shape, by
        version count instead of wall-clock): delete every data
        parquet and DV side-file under the table root that no
        snapshot of the newest ``retain_versions`` log versions
        references. Files younger than ``grace_seconds`` are spared —
        the in-flight-commit valve real VACUUM implements as its
        retention period (production Delta defaults to 7 days;
        a concurrent writer's staged-but-uncommitted files must
        survive). With ``clean_log``, commit JSONs strictly below the
        newest checkpoint at or below the oldest retained version are
        removed too (the protocol's log-retention shape — state below
        the checkpoint reconstructs from it). Time travel below the
        retained window raises afterwards. Returns
        {data_files_removed, log_files_removed, retained_versions}."""
        import time

        vs = self.versions()
        if not vs:
            raise FileNotFoundError(
                f"delta table {self.root}: no log"
            )
        retain_versions = max(1, int(retain_versions))
        keep_vs = vs[-retain_versions:]
        live: set = set()
        for v in keep_vs:
            s = self.snapshot(v)
            for a in s["adds"].values():
                live.add(os.path.join(self.root, a["path"]))
                dv = a.get("deletionVector")
                if dv:
                    ap = self._dv_abs_path(dv)
                    if ap:
                        live.add(ap)
        cutoff = time.time() - max(0.0, grace_seconds)
        removed = 0
        for root_dir, dirs, fnames in os.walk(self.root):
            # never touch the log, nor a writer's staging area
            dirs[:] = [
                d for d in dirs
                if d != _LOG_DIR and not d.startswith("_stage")
            ]
            for fn in fnames:
                if not (
                    fn.endswith(".parquet")
                    or (
                        fn.startswith("deletion_vector_")
                        and fn.endswith(".bin")
                    )
                ):
                    continue
                ap = os.path.join(root_dir, fn)
                if ap in live:
                    continue
                if os.path.getmtime(ap) > cutoff:
                    continue  # grace: possibly an in-flight commit
                os.remove(ap)
                removed += 1
        log_removed = 0
        if clean_log:
            cp = self._checkpoint_version_at_most(keep_vs[0])
            if cp is not None:
                for v in vs:
                    if v < cp:
                        os.remove(
                            os.path.join(
                                self.log_dir, f"{v:020d}.json"
                            )
                        )
                        log_removed += 1
        return {
            "data_files_removed": removed,
            "log_files_removed": log_removed,
            "retained_versions": len(keep_vs),
        }
