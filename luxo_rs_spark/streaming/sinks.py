"""Exactly-once streaming upsert sink (SURVEY.md §2.2-I sink adjunct):
``foreachBatch`` merging micro-batches into a versioned parquet table.

Structured Streaming's ``foreachBatch`` gives at-least-once delivery:
after a crash the last in-flight micro-batch is REPLAYED with the same
``batch_id``. Exactly-once therefore needs an idempotent sink — the
standard recipe (Spark docs, Delta's own sink) is a transaction log
keyed by batch id:

1. compute the merged table (copy-on-write ``merge_upsert`` — the same
   plan Delta/Iceberg run underneath),
2. write it to a fresh immutable version directory ``v{N}``,
3. atomically publish ``_latest.json`` = {version, batch_id} via
   write-temp + ``os.replace`` (POSIX atomic rename),
4. on replay, a batch id <= the committed one is SKIPPED.

A crash between (2) and (3) leaves an orphaned, unpublished version dir
— harmless, never read, and re-created deterministically by the replay.
Readers always load exactly one published version, so they see either
the pre-batch or post-batch table, never a torn write.

Scale notes (100 TB): the log is O(1) metadata per commit; the merge is
one anti-join keyed on the merge key (AQE-skew-joinable). The
copy-on-write rewrite is full-table here because plain parquet has no
file-level pruning — with a real table format the identical plan
rewrites only the files containing touched keys. State never lives on
the driver: versions are immutable directory snapshots.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from luxo_rs_spark.operators.merge import merge_upsert

__all__ = ["VersionedParquetTable", "upsert_sink"]

_META = "_latest.json"


class VersionedParquetTable:
    """A minimal ACID-ish parquet table: immutable version dirs + an
    atomically-replaced pointer file recording (version, batch_id)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- log ----------------------------------------------------------------

    def _meta(self) -> dict | None:
        p = os.path.join(self.path, _META)
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def current_version(self) -> int:
        m = self._meta()
        return -1 if m is None else int(m["version"])

    def last_batch_id(self) -> int:
        m = self._meta()
        return -1 if m is None else int(m["batch_id"])

    # -- read / commit ------------------------------------------------------

    def read(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame | None:
        """Read the published snapshot — or, with ``version``, TIME
        TRAVEL to any still-retained earlier version (immutable dirs
        make every commit a queryable snapshot, Delta/Iceberg-style)."""
        v = self.current_version() if version is None else version
        if v < 0:
            return None
        p = os.path.join(self.path, f"v{v}")
        if version is not None and not os.path.isdir(p):
            raise FileNotFoundError(
                f"version {version} not retained (vacuumed or never written)"
            )
        return spark.read.parquet(p)

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop version dirs older than the newest ``keep_last``
        (never the published one). Returns the dropped version numbers.
        Readers of the published pointer are unaffected; time travel to
        dropped versions stops working — the Delta VACUUM contract."""
        import shutil as _shutil

        cur = self.current_version()
        dropped = []
        for name in os.listdir(self.path):
            if not name.startswith("v"):
                continue
            try:
                v = int(name[1:])
            except ValueError:
                continue
            if v <= cur - keep_last:
                _shutil.rmtree(os.path.join(self.path, name))
                dropped.append(v)
        return sorted(dropped)

    def commit(self, df: DataFrame, batch_id: int) -> None:
        """Write ``df`` as the next version and publish it atomically."""
        v = self.current_version() + 1
        df.write.mode("overwrite").parquet(os.path.join(self.path, f"v{v}"))
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".json.tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump({"version": v, "batch_id": int(batch_id)}, fh)
        os.replace(tmp, os.path.join(self.path, _META))


def upsert_sink(table: VersionedParquetTable, key: str):
    """``foreachBatch`` hook: exactly-once keyed upsert into ``table``.

    Replayed batches (id <= last committed) are no-ops, so crash/restart
    from the streaming checkpoint cannot double-apply a batch. Within a
    batch, duplicate keys are collapsed to an arbitrary-but-deterministic
    winner (max by key order of arrival is NOT defined on a shuffled
    batch, so callers needing last-write-wins must pre-aggregate).
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= table.last_batch_id():
            return  # replayed after restart: already committed
        updates = batch_df.dropDuplicates([key])
        base = table.read(batch_df.sparkSession)
        merged = updates if base is None else merge_upsert(base, updates, key)
        # foreachBatch may lazily re-trigger the batch plan on each
        # action; the version write is the single action here.
        table.commit(merged, batch_id)

    return write


class RowAuditWriter:
    """Per-row ForeachWriter (§2.2-I sink surface): the row-at-a-time
    escape hatch for sinks with no batch API (alerts, webhooks, legacy
    stores). Each partition-epoch opens its own JSONL file under
    ``out_dir`` so executor-side writes never contend; idempotent
    replays overwrite the same (partition, epoch) file, which is what
    makes the at-least-once contract safe to re-run. foreachBatch
    (``upsert_sink``) remains the right tool when the target CAN absorb
    batches — this writer exists for when it can't."""

    def __init__(self, out_dir: str, columns: list[str]) -> None:
        self.out_dir = out_dir
        self.columns = columns

    def open(self, partition_id: int, epoch_id: int) -> bool:
        import os

        os.makedirs(self.out_dir, exist_ok=True)
        self._fh = open(
            os.path.join(
                self.out_dir, f"p{partition_id:05d}_e{epoch_id:010d}.jsonl"
            ),
            "w",
        )
        return True

    def process(self, row) -> None:
        import json

        self._fh.write(
            json.dumps({c: row[c] for c in self.columns}, default=str) + "\n"
        )

    def close(self, error) -> None:
        self._fh.close()
        if error is not None:
            raise error


def row_audit_sink(df, out_dir: str, checkpoint: str, columns: list[str]):
    """Wire a stream into the per-row JSONL audit writer; returns the
    started StreamingQuery."""
    return (
        df.writeStream.foreach(RowAuditWriter(out_dir, columns))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def snaptable_txn_sink(
    table, app_id: str, stat_cols=(), bucket_col: str | None = None
):
    """Exactly-once foreachBatch sink into a SnapTable via TXN VERSIONS
    (round 10 — the Delta ``txn`` action): each committed manifest
    records the newest ``batch_id`` per ``app_id``, and a replayed
    batch (a restart re-delivering work the checkpoint had not yet
    acknowledged) NO-OPS inside the table's own commit protocol — the
    dedupe survives table restores and concurrent writers because it
    rides the manifest, not sink-side state.

    cites reference src/main.rs:12-22 (the reference's logging loop is
    the closest it gets to an ingest path; the exactly-once contract
    here is the table-format upgrade of it)."""

    def write(batch_df, batch_id) -> None:
        bid = int(batch_id)
        if not table.versions():
            try:
                table.create(
                    batch_df,
                    stat_cols=list(stat_cols),
                    bucket_col=bucket_col,
                    txn=(app_id, bid),
                )
                return
            except FileExistsError:
                pass  # lost a concurrent-create race: append instead
        table.append(batch_df, bucket_col=bucket_col, txn=(app_id, bid))

    return write
