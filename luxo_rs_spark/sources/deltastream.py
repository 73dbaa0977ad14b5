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


class DeltaStreamDataSource(DataSource):
    """spark.readStream.format("deltastream").load(root)
    [.option("startingVersion", N)] [.option("ignoreDeletes", "true")]
    [.option("skipChangeCommits", "true")]"""

    @classmethod
    def name(cls):
        return "deltastream"

    def schema(self):
        s = DeltaLog(None, self.options["path"]).snapshot()
        return s["schema"]

    def streamReader(self, schema):
        return _DeltaStreamReader(self.options, schema)


def register(spark) -> None:
    """Idempotently register the deltastream source on a session."""
    spark.dataSource.register(DeltaStreamDataSource)
