"""Foreign Delta tables as a Structured Streaming SOURCE
("deltastream" format): ``spark.readStream.format("deltastream")
.load(root)`` tails a Delta transaction log written by ANY engine,
over the from-scratch protocol reader (sources/deltalog.py) — no
delta-spark, no deltalake wheel.

Semantics mirror Spark's own Delta streaming source (public
delta.io PROTOCOL.md semantics; parity target
reference/src/main.rs:12-22 is only the engine bootstrap — the
streaming surface itself is SURVEY §2.2-A/§2.2-I ground):

- The OFFSET IS THE LOG VERSION. A micro-batch delivers the rows of
  ``add`` actions with ``dataChange`` true committed in
  ``(start, end]``; offsets replay deterministically because commit
  files are immutable.
- The FIRST batch is the full live snapshot at the then-latest
  version (Delta's default start point), unless
  ``.option("startingVersion", N)`` asks for the commit walk from
  version N onward (``startingVersion=0`` replays all history as
  appends, exactly like Delta).
- OPTIMIZE-shaped commits (adds + removes all ``dataChange=false``)
  are INVISIBLE — no duplicate rows, no stall.
- A commit that removes live data (a ``dataChange=true`` remove:
  DELETE / UPDATE / MERGE / DV rewrite) RAISES by default — the
  append-only stream cannot express the retraction.
  ``.option("ignoreDeletes", "true")`` skips delete-only commits;
  ``.option("skipChangeCommits", "true")`` skips any row-changing
  commit entirely (both are the Delta option names, with the Delta
  meanings).
- Column mapping ('name' mode) and deletion vectors on delivered
  adds are honored exactly as in the batch reader: files are read by
  PHYSICAL name and aliased back; a DV add delivers only live rows.

Scale design: micro-batch PLANNING is driver-side metadata work
(bounded by commit-file size, like every Delta client); row READING
is executor-side — ``partitions()`` ships one ``InputPartition`` per
data file and ``read()`` opens the parquet with pyarrow on the
worker, so batch throughput scales with the cluster exactly like the
batch DataSource (sources/snapsource.py, the house pattern).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

from luxo_rs_spark.sources.deltalog import (
    DeltaLog,
    DeltaProtocolError,
    _LOG_DIR,
)


def _typed_partition_value(raw: str | None, dt: T.DataType):
    """Delta serializes partition values as STRINGS (PROTOCOL.md
    "Partition Value Serialization"); parse back to the schema type.
    None stays None (null partition)."""
    if raw is None:
        return None
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType,
                       T.LongType)):
        return int(raw)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return float(raw)
    if isinstance(dt, T.BooleanType):
        return raw == "true"
    if isinstance(dt, T.DecimalType):
        from decimal import Decimal

        return Decimal(raw)
    if isinstance(dt, T.DateType):
        from datetime import date

        return date.fromisoformat(raw)
    if isinstance(dt, T.TimestampType):
        from datetime import datetime

        return datetime.fromisoformat(raw)
    if isinstance(dt, T.StringType):
        return raw
    raise DeltaProtocolError(
        f"unsupported partition-column type {dt.simpleString()!r} "
        "in the deltastream source"
    )


class _DeltaFilePartition(InputPartition):
    """One data file of one micro-batch. ``columns`` is aligned to
    the stream schema: ("data", physical_name) reads the parquet
    column; ("part", value) injects the driver-typed partition
    literal. ``dead`` is the file's decoded deletion-vector positions
    (tuple; empty for DV-less files)."""

    def __init__(self, abs_path: str, columns: list[tuple],
                 dead: tuple):
        self.abs_path = abs_path
        self.columns = columns
        self.dead = dead


class _DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema: T.StructType):
        self.root = options["path"]
        self.schema = schema
        self.skip_change = (
            str(options.get("skipchangecommits", "")).lower() == "true"
        )
        self.ignore_deletes = (
            str(options.get("ignoredeletes", "")).lower() == "true"
        )
        sv = options.get("startingversion")
        # offset v = newest version already delivered; -1 with
        # snapshot=True means "nothing yet: first batch is the live
        # snapshot", while startingVersion=N enters the commit walk
        # at N (deliver N, N+1, ...).
        if sv is None:
            self._initial = {"v": -1, "snapshot": True}
        else:
            self._initial = {"v": int(sv) - 1, "snapshot": False}
        self._log = DeltaLog(None, self.root)

    # -- offsets ------------------------------------------------------------

    def initialOffset(self) -> dict:
        return dict(self._initial)

    def latestOffset(self) -> dict:
        vs = self._log.versions()
        if not vs:
            raise FileNotFoundError(
                f"delta table {self.root}: no log to stream"
            )
        return {"v": vs[-1], "snapshot": False}

    def commit(self, end: dict) -> None:
        pass  # commit files are immutable; nothing to release

    # -- batch planning (driver-side metadata work) -------------------------

    def _commit_actions(self, v: int) -> list[dict]:
        path = os.path.join(
            self.root, _LOG_DIR, f"{v:020d}.json"
        )
        if not os.path.exists(path):
            return []  # vacuumed pre-checkpoint commit: history only
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def _batch_adds(self, start: dict, end: dict) -> list[dict]:
        """The ``add`` actions this batch delivers (protocol
        eligibility + the change-commit gate)."""
        v_from, v_to = int(start["v"]), int(end["v"])
        if v_to <= v_from and not (
            start.get("snapshot") and v_to >= 0
        ):
            return []
        if start.get("snapshot"):
            # first batch: the live snapshot at v_to
            return list(self._log.snapshot(v_to)["adds"].values())
        out: list[dict] = []
        for v in range(v_from + 1, v_to + 1):
            acts = self._commit_actions(v)
            adds = [
                a["add"] for a in acts
                if "add" in a and a["add"].get("dataChange", True)
            ]
            removes = [
                a["remove"] for a in acts
                if "remove" in a
                and a["remove"].get("dataChange", True)
            ]
            if removes:
                if self.skip_change:
                    continue
                if self.ignore_deletes and not adds:
                    continue  # delete-only commit, explicitly waived
                raise DeltaProtocolError(
                    f"delta table {self.root}: version {v} removes "
                    "data (DELETE/UPDATE/MERGE); an append-only "
                    "stream cannot express it. Set ignoreDeletes to "
                    "skip delete-only commits or skipChangeCommits "
                    "to skip all row-changing commits."
                )
            out.extend(adds)
        return out

    def partitions(self, start: dict, end: dict):
        adds = self._batch_adds(start, end)
        if not adds:
            return [_DeltaFilePartition("", [], ())]
        # schema / column mapping / partition typing resolved at the
        # batch's END snapshot (the stream's analyzed schema — the
        # Delta source behavior under metadata evolution)
        s = self._log.snapshot(int(end["v"]))
        phys_of = self._log._phys_of(s)
        pcols = set(s["partition_columns"])
        data_names = [
            f.name for f in self.schema.fields if f.name not in pcols
        ]
        parts = []
        for a in adds:
            pv = a.get("partitionValues") or {}
            # per-file resolution: physicalName ('name' mode) or
            # parquet field id ('id' mode); None = file predates col
            res = iter(self._log._file_column_resolution(
                os.path.join(self.root, a["path"]), s, data_names
            ))
            columns: list[tuple] = []
            for f in self.schema.fields:
                if f.name in pcols:
                    columns.append((
                        "part",
                        _typed_partition_value(
                            pv.get(phys_of.get(f.name, f.name)),
                            f.dataType,
                        ),
                    ))
                else:
                    columns.append(("data", next(res)))
            dvd = a.get("deletionVector")
            dead = (
                tuple(self._log._dv_positions(dvd)) if dvd else ()
            )
            parts.append(_DeltaFilePartition(
                os.path.join(self.root, a["path"]), columns, dead
            ))
        return parts

    # -- row reading (executor-side) ----------------------------------------

    def read(self, partition: _DeltaFilePartition):
        if not partition.abs_path:
            return iter(())
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.abs_path)
        n = tbl.num_rows
        cols = []
        for kind, spec in partition.columns:
            if kind == "part":
                cols.append([spec] * n)
            elif spec in tbl.column_names:
                cols.append(tbl.column(spec).to_pylist())
            else:
                cols.append([None] * n)  # add-column evolution
        dead = set(partition.dead)
        return (
            tuple(col[i] for col in cols)
            for i in range(n)
            if i not in dead
        )


def _freeze(v):
    """Hashable stand-in for a row value (the snaptable CDF tail's
    tag-wrapping — pyarrow yields lists/dicts for array/map cells,
    which cannot key a Counter)."""
    if isinstance(v, list):
        return ("__dl_list__", tuple(_freeze(x) for x in v))
    if isinstance(v, dict):
        return ("__dl_map__", tuple(sorted(
            (k, _freeze(x)) for k, x in v.items()
        )))
    if isinstance(v, tuple):
        return tuple(_freeze(x) for x in v)
    return v


def _thaw(v):
    if isinstance(v, tuple) and len(v) == 2 and v[0] == "__dl_list__":
        return [_thaw(x) for x in v[1]]
    if isinstance(v, tuple) and len(v) == 2 and v[0] == "__dl_map__":
        return {k: _thaw(x) for k, x in v[1]}
    if isinstance(v, tuple):
        return tuple(_thaw(x) for x in v)
    return v


class _DeltaCDFStreamReader(SimpleDataSourceStreamReader):
    """Change-feed tail (``.option("readChangeFeed", "true")`` — the
    Delta CDF streaming shape) over a FOREIGN log: each micro-batch
    is the ROW-LEVEL multiset diff between the committed version and
    the current latest, every row tagged ``change_type`` 'insert' or
    'delete' (a CoW update surfaces as the delete+insert pair, an
    OPTIMIZE nets to zero). File identity is (path, DV descriptor),
    so files unchanged on both sides are NEVER read; each side reads
    under ITS OWN snapshot state (column mapping / DV application) —
    the batch ``DeltaLog.changes`` semantics, streamed. Driver-side
    at micro-batch granularity (the Simple reader contract, same as
    the snaptable CDF tail); the partition-parallel path is the
    non-CDF reader above."""

    def __init__(self, options, schema: T.StructType):
        self.root = options["path"]
        # schema = (change_type, *table columns)
        self.fields = list(schema.fields[1:])
        self._log = DeltaLog(None, self.root)

    def initialOffset(self):
        return {"v": -1}  # before v0: first batch = all live rows

    def _adds_by_key(self, s: dict | None) -> dict:
        if s is None:
            return {}

        def key(a: dict):
            dv = a.get("deletionVector") or {}
            return (a["path"], dv.get("pathOrInlineDv", ""),
                    dv.get("offset"))

        return {key(a): a for a in s["adds"].values()}

    def _file_rows(self, s: dict, a: dict):
        import pyarrow.parquet as pq

        pcols = set(s["partition_columns"])
        phys_of = self._log._phys_of(s)
        data_fields = [f for f in self.fields if f.name not in pcols]
        ap = os.path.join(self.root, a["path"])
        res = dict(zip(
            (f.name for f in data_fields),
            self._log._file_column_resolution(
                ap, s, [f.name for f in data_fields]
            ),
        ))
        tbl = pq.read_table(ap)
        n = tbl.num_rows
        pv = a.get("partitionValues") or {}
        cols = []
        for f in self.fields:
            if f.name in pcols:
                cols.append([_typed_partition_value(
                    pv.get(phys_of.get(f.name, f.name)), f.dataType
                )] * n)
            else:
                phys = res.get(f.name)
                if phys and phys in tbl.column_names:
                    cols.append(tbl.column(phys).to_pylist())
                else:
                    cols.append([None] * n)
        dvd = a.get("deletionVector")
        dead = set(self._log._dv_positions(dvd)) if dvd else ()
        for i in range(n):
            if i in dead:
                continue
            yield tuple(col[i] for col in cols)

    def _diff_rows(self, v_from: int, v_to: int):
        from collections import Counter

        if v_to <= v_from:
            return iter([])  # list-backed: Spark copy()s the iterator
        s_from = self._log.snapshot(v_from) if v_from >= 0 else None
        s_to = self._log.snapshot(v_to)
        kf = self._adds_by_key(s_from)
        kt = self._adds_by_key(s_to)

        def side(s, own, other):
            c: Counter = Counter()
            for k, a in own.items():
                if k in other:
                    continue  # unchanged file: cancels unread
                for r in self._file_rows(s, a):
                    c[tuple(_freeze(v) for v in r)] += 1
            return c

        added = side(s_to, kt, kf)
        removed = side(s_from, kf, kt) if s_from else Counter()
        out = []
        for r, n in (added - removed).items():
            out.extend(
                [("insert",) + tuple(_thaw(v) for v in r)] * n
            )
        for r, n in (removed - added).items():
            out.extend(
                [("delete",) + tuple(_thaw(v) for v in r)] * n
            )
        return iter(out)

    def read(self, start):
        vs = self._log.versions()
        cur = vs[-1] if vs else -1
        return self._diff_rows(int(start["v"]), cur), {"v": cur}

    def readBetweenOffsets(self, start, end):
        # deterministic replay: commit files are immutable
        return self._diff_rows(int(start["v"]), int(end["v"]))


class DeltaStreamDataSource(DataSource):
    """spark.readStream.format("deltastream").load(root)
    [.option("startingVersion", N)] [.option("ignoreDeletes", "true")]
    [.option("skipChangeCommits", "true")]
    [.option("readChangeFeed", "true")]"""

    @classmethod
    def name(cls):
        return "deltastream"

    def _cdf(self) -> bool:
        return str(
            self.options.get("readchangefeed", "")
        ).lower() == "true"

    def schema(self):
        s = DeltaLog(None, self.options["path"]).snapshot()
        if self._cdf():
            return T.StructType(
                [T.StructField("change_type", T.StringType(), False)]
                + list(s["schema"].fields)
            )
        return s["schema"]

    def streamReader(self, schema):
        if self._cdf():
            # routes Spark's reader lookup to simpleStreamReader —
            # the documented fallback protocol
            from pyspark.errors import PySparkNotImplementedError

            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={
                    "feature": "streamReader with readChangeFeed"
                },
            )
        return _DeltaStreamReader(self.options, schema)

    def simpleStreamReader(self, schema):
        return _DeltaCDFStreamReader(self.options, schema)


def register(spark) -> None:
    """Idempotently register the deltastream source on a session."""
    spark.dataSource.register(DeltaStreamDataSource)
