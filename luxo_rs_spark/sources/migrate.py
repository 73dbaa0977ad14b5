"""Cross-format TABLE MIGRATION (round 10): one-call moves between
the foreign formats this engine reads from scratch (Delta, Iceberg)
and its native SnapTable — the practical path for "a user of the
reference switches to this repo": read the foreign log, land the rows
in the native format with stats/bucketing chosen for the new layout,
or export a snapshot back out for a foreign engine.

Each migration is ONE Spark job over the source's live rows (the
foreign readers apply deletion vectors / position deletes / column
mapping before the write, so the target holds exactly the LIVE state)
plus the target format's own metadata commit. Nothing lands on the
driver beyond the target's normal metadata plane.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from luxo_rs_spark.sources.deltalog import DeltaLog
from luxo_rs_spark.sources.iceberg import IcebergTable
from luxo_rs_spark.sources.snaptable import SnapTable


def delta_to_snaptable(
    spark: SparkSession,
    delta_root: str,
    snap_root: str,
    stat_cols: list[str],
    bucket_col: str | None = None,
    version: int | None = None,
    bloom_cols: list[str] | None = None,
) -> SnapTable:
    """Foreign Delta table (protocol 1/2/3, DVs + column mapping +
    all checkpoint layouts) -> a fresh SnapTable with the requested
    skipping layout. Returns the new table at version 1."""
    df = DeltaLog(spark, delta_root).read(version)
    t = SnapTable(spark, snap_root)
    t.create(df, stat_cols=stat_cols, bucket_col=bucket_col,
             bloom_cols=bloom_cols)
    return t


def iceberg_to_snaptable(
    spark: SparkSession,
    ice_root: str,
    snap_root: str,
    stat_cols: list[str],
    bucket_col: str | None = None,
    snapshot_id: int | None = None,
) -> SnapTable:
    """Foreign Iceberg v1/v2 table (position + equality deletes
    applied) -> a fresh SnapTable."""
    df = IcebergTable(spark, ice_root).read(snapshot_id)
    t = SnapTable(spark, snap_root)
    t.create(df, stat_cols=stat_cols, bucket_col=bucket_col)
    return t


def snaptable_to_delta(
    spark: SparkSession,
    snap_root: str,
    delta_root: str,
    partition_by: list[str] | None = None,
    version: int | None = None,
) -> DeltaLog:
    """SnapTable snapshot -> a NEW Delta log any foreign engine can
    read (protocol v1, plain adds with stats)."""
    df = SnapTable(spark, snap_root).read(version)
    t = DeltaLog(spark, delta_root)
    t.write(df, partition_by=partition_by)
    return t


def snaptable_to_iceberg(
    spark: SparkSession,
    snap_root: str,
    ice_root: str,
    partition_by: str | None = None,
    version: int | None = None,
) -> IcebergTable:
    """SnapTable snapshot -> a NEW Iceberg v2 table (manifest bounds +
    partition summaries written, so foreign scans prune)."""
    df = SnapTable(spark, snap_root).read(version)
    t = IcebergTable(spark, ice_root)
    t.write(df, partition_by=partition_by)
    return t
