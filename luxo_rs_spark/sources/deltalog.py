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
- ``minReaderVersion`` 1/2 are supported; 3+ (reader table features —
  deletion vectors, column mapping, v2 checkpoints) raises LOUDLY
  rather than misreading;
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
    (minReaderVersion >= 3 table features): fail loudly, never misread."""


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
                int(f[:20])
                for f in os.listdir(self.log_dir)
                if f.endswith(".checkpoint.parquet") and f[:20].isdigit()
            )
            cps = [v for v in cps if v <= version]
            best = cps[-1] if cps else None
        return best

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
            "partition_columns": [],
            "adds": {},
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
                for line in f:
                    line = line.strip()
                    if line:
                        self._apply_action(state, json.loads(line))
        if state["schema"] is None:
            raise ValueError(
                f"delta table {self.root}: no metaData action in the log"
            )
        return state

    def _apply_action(self, state: dict, action: dict) -> None:
        if "protocol" in action:
            p = action["protocol"]
            if int(p.get("minReaderVersion", 1)) >= 3:
                feats = p.get("readerFeatures") or []
                raise DeltaProtocolError(
                    f"unsupported minReaderVersion "
                    f"{p['minReaderVersion']} (readerFeatures={feats}); "
                    "this reader implements protocol 1/2"
                )
        elif "metaData" in action:
            md = action["metaData"]
            state["schema"] = T.StructType.fromJson(
                json.loads(md["schemaString"])
            )
            state["partition_columns"] = list(
                md.get("partitionColumns", [])
            )
        elif "add" in action:
            a = action["add"]
            state["adds"][a["path"]] = a
        elif "remove" in action:
            state["adds"].pop(action["remove"]["path"], None)
        # commitInfo / txn / cdc / domainMetadata: reader-irrelevant

    def _apply_checkpoint(self, state: dict, cp_version: int) -> None:
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            os.path.join(self.log_dir, f"{cp_version:020d}.checkpoint.parquet")
        )
        def demap(v):
            # pyarrow renders MAP columns as list-of-(k, v) tuples
            if isinstance(v, list) and all(
                isinstance(x, tuple) and len(x) == 2 for x in v
            ):
                return dict(v)
            return v

        for row in tbl.to_pylist():
            for key in ("protocol", "metaData", "add", "remove"):
                if row.get(key) is not None:
                    act = {
                        k: demap(v) for k, v in row[key].items()
                    }
                    self._apply_action(state, {key: act})

    # -- reads ---------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        s = self.snapshot(version)
        return self._read_adds(s, list(s["adds"].values()))

    def scan(self, col: str, lo, hi, version: int | None = None):
        """Range scan with add-action stats skipping (numRecords /
        minValues / maxValues — the same manifest-level pruning as
        sources/snaptable.py, here over a FOREIGN log's stats).
        Returns (DataFrame filtered to the range, info)."""
        s = self.snapshot(version)
        keep, skipped_rows = [], 0
        for a in s["adds"].values():
            st = a.get("stats")
            st = json.loads(st) if isinstance(st, str) else (st or {})
            mn = (st.get("minValues") or {}).get(col)
            mx = (st.get("maxValues") or {}).get(col)
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
        if not adds:
            return self.spark.createDataFrame([], schema)
        data_fields = [f for f in schema.fields if f.name not in pcols]
        data_schema = T.StructType(data_fields)
        if not pcols:
            paths = [os.path.join(self.root, a["path"]) for a in adds]
            return self.spark.read.schema(data_schema).parquet(*paths)
        # partition values are spec-mandated STRINGS: group the files
        # by their partition tuple, inject typed literal columns
        by_vals: dict[tuple, list[str]] = {}
        for a in adds:
            pv = a.get("partitionValues") or {}
            key = tuple(pv.get(c) for c in pcols)
            by_vals.setdefault(key, []).append(
                os.path.join(self.root, a["path"])
            )
        ptype = {f.name: f.dataType for f in schema.fields}
        out = None
        for key, paths in sorted(by_vals.items()):
            part = self.spark.read.schema(data_schema).parquet(*paths)
            for c, val in zip(pcols, key):
                lit = (
                    F.lit(None) if val is None else F.lit(val)
                ).cast(ptype[c])
                part = part.withColumn(c, lit)
            part = part.select([f.name for f in schema.fields])
            out = part if out is None else out.unionByName(part)
        return out

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
    ) -> int:
        """Commit ``df`` as a new log version. ``append`` adds files;
        ``overwrite`` removes every live file and adds the new ones;
        version 0 additionally carries protocol + metaData."""
        vs = self.versions()
        creating = not vs
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
        actions.extend(
            {"add": a} for a in self._stage_files(df, partition_by)
        )
        if not self._try_commit(version, actions):
            raise FileExistsError(
                f"delta table {self.root}: lost the commit race at "
                f"version {version}; re-read and retry"
            )
        return version

    def delete_where(self, col: str, lo, hi) -> int:
        """Copy-on-write delete: stats-admitted files are rewritten
        without the matching rows (remove+add actions), clean files
        stay untouched — the Delta DELETE shape."""
        s = self.snapshot()
        carry, rewrite = [], []
        for a in s["adds"].values():
            st = a.get("stats")
            st = json.loads(st) if isinstance(st, str) else (st or {})
            mn = (st.get("minValues") or {}).get(col)
            mx = (st.get("maxValues") or {}).get(col)
            if mn is not None and (mx < lo or mn > hi):
                carry.append(a)
            else:
                rewrite.append(a)
        survivors = self._read_adds(s, rewrite).filter(
            ~F.col(col).between(lo, hi)
        )
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
            {"add": a}
            for a in self._stage_files(survivors, s["partition_columns"] or None)
        )
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
        rows = [
            {
                "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
                "metaData": None,
                "add": None,
            },
            {
                "protocol": None,
                "metaData": {
                    "id": self._table_id(),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": s["schema"].json(),
                    "partitionColumns": s["partition_columns"],
                    "configuration": {},
                },
                "add": None,
            },
        ]
        for a in sorted(s["adds"].values(), key=lambda x: x["path"]):
            a = dict(a)
            if not isinstance(a.get("stats"), (str, type(None))):
                a["stats"] = json.dumps(a["stats"], sort_keys=True)
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
