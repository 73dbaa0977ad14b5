"""CSV / JSON readers and parquet sinks (SURVEY.md §2.2-A).

STRICT schemas (§1.2): explicit ``StructType`` required — inference is
a convenience Spark offers, but a declared engine contract needs stable
column types, and at 100 TB schema inference means an extra full pass
over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from luxo_rs_spark.sources.registry import ensure_session_confs


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    ensure_session_confs(spark)
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), **options)
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: T.StructType, **options: str
) -> DataFrame:
    ensure_session_confs(spark)
    return spark.read.schema(schema).options(**options).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink. `partition_by` gives directory partitioning — the
    layout that turns downstream key-range filters into partition
    pruning at scale."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ~target-sized files (copy-on-write via a staging directory +
    atomic rename). The streaming-ingest pathology at scale: a
    minutely micro-batch sink leaves thousands of KB-sized files per
    partition, and every downstream scan pays per-file open/footer
    costs plus scheduler pressure — compaction restores scan
    efficiency. Optional ``sort_cols`` re-sorts while rewriting so
    row-group min-max stats become selective again (q124's z-order
    pairs with this).

    Returns {"files_before", "files_after", "rows"} for audit logs.
    """
    import glob
    import os
    import shutil

    files_before = len(glob.glob(os.path.join(path, "*.parquet")))
    df = spark.read.parquet(path)
    rows = df.count()
    total_bytes = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(path, "*.parquet"))
    )
    n_out = max(1, -(-total_bytes // target_file_bytes))
    staged = path.rstrip("/") + ".compact_tmp"
    out = df.repartition(n_out)
    if sort_cols:
        out = out.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    out.write.mode("overwrite").parquet(staged)
    # atomic-ish swap (single-filesystem rename)
    backup = path.rstrip("/") + ".compact_old"
    os.rename(path, backup)
    os.rename(staged, path)
    shutil.rmtree(backup)
    files_after = len(glob.glob(os.path.join(path, "*.parquet")))
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows": rows,
    }
