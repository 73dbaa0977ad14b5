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
