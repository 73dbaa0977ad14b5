"""State-store backend selection for stateful streaming (SURVEY.md
§2.2-I scale path).

The default HDFS-backed state store keeps every key's state in executor
HEAP — fine for windowed aggs over bounded key spaces, fatal for
pipelines whose state is corpus-sized (e.g. key-only dedup over months
of events, per-key t-digests over millions of keys). Spark ships a
RocksDB-backed provider that spills state to local SSD with a bounded
in-memory block cache, which is the production answer once state
outgrows the heap: state size is then limited by executor DISK, and
checkpoint deltas (changelog checkpointing) replace full-snapshot
uploads, so commit latency stays flat as state grows.

Session-level because the provider class is a per-query-run static: it
must be set BEFORE a streaming query starts and cannot change across a
checkpoint's lifetime (the state files on disk are provider-specific).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


def enable_rocksdb_state(
    spark: SparkSession, changelog_checkpointing: bool = True
) -> None:
    """Switch stateful streaming queries started AFTER this call to the
    RocksDB state store. ``changelog_checkpointing=True`` uploads only
    per-batch deltas to the checkpoint (snapshots are compacted in the
    background) — the setting that keeps end-to-end latency flat when
    state reaches tens of GB per executor."""
    spark.conf.set(_PROVIDER_KEY, ROCKSDB_PROVIDER)
    spark.conf.set(
        _CHANGELOG_KEY, "true" if changelog_checkpointing else "false"
    )


@contextmanager
def rocksdb_state(
    spark: SparkSession, changelog_checkpointing: bool = True
) -> Iterator[None]:
    """Scoped variant for shared sessions (tests, notebooks): restores
    the previous provider on exit so queries outside the block keep the
    backend they were checkpointed with."""
    prev_provider = spark.conf.get(_PROVIDER_KEY, None)
    prev_changelog = spark.conf.get(_CHANGELOG_KEY, None)
    enable_rocksdb_state(spark, changelog_checkpointing)
    try:
        yield
    finally:
        for key, prev in ((_PROVIDER_KEY, prev_provider),
                          (_CHANGELOG_KEY, prev_changelog)):
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)


def read_state(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int = 0,
    store_name: str | None = None,
    batch_id: int | None = None,
):
    """Offline state inspection via the state-store data source (Spark
    4 ``statestore`` format): read a stopped (or running) streaming
    query's checkpointed state as a DataFrame of (key, value,
    partition_id) structs — the ops answer to "what is this stateful
    query actually holding?" without instrumenting the query itself.
    Works against both HDFS-backed and RocksDB state, any operator in
    the checkpoint (``operator_id``) and any committed micro-batch
    (``batch_id``, default latest)."""
    reader = spark.read.format("statestore").option(
        "operatorId", operator_id
    )
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    return reader.load(checkpoint)
