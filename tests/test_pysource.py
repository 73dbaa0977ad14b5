"""Custom Python DataSource (Spark 4 extension point): batch
partition-parallelism, determinism across partition counts, and the
micro-batch stream reader must agree with the batch corpus."""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import functions as F

from luxo_rs_spark.sources.pysource import register
import pytest

TMP = Path("/root/repo/.tmp")


def _read(spark, rows, parts):
    register(spark)
    return (
        spark.read.format("synthdocs")
        .option("rows", rows)
        .option("partitions", parts)
        .load()
    )


@pytest.mark.slow
def test_batch_read_counts_and_schema(spark):
    df = _read(spark, 500, 8)
    assert df.columns == ["doc_id", "text", "n_words"]
    assert df.count() == 500
    assert df.select(F.countDistinct("doc_id")).head()[0] == 500
    row = df.filter(F.col("doc_id") == 7).head()
    assert row.n_words == len(row.text.split(" "))


@pytest.mark.slow
def test_partition_count_is_respected(spark):
    df = _read(spark, 1000, 8)
    assert df.rdd.getNumPartitions() == 8


def test_deterministic_across_partitionings(spark):
    """The corpus is a pure function of row id: 3 partitions and 8
    partitions must produce identical tables (the re-runnability
    contract that makes the source usable for benchmarks)."""
    a = _read(spark, 300, 3).orderBy("doc_id").collect()
    b = _read(spark, 300, 8).orderBy("doc_id").collect()
    assert a == b


@pytest.mark.slow
def test_stream_reader_matches_batch(spark):
    """availableNow micro-batch run over the streaming face of the
    source equals the batch corpus."""
    register(spark)
    ckpt = TMP / f"pysrc_ck_{uuid.uuid4().hex[:8]}"
    out = TMP / f"pysrc_out_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.format("synthdocs")
        .option("rows", 250)
        .option("rowsperbatch", 100)
        .load()
    )
    # a SimpleDataSourceStreamReader advances ONE batch per
    # availableNow trigger; re-running against the same checkpoint
    # continues from the committed offset (the restart-resume contract
    # — file sinks support checkpoint recovery, the memory sink does
    # not)
    for _ in range(5):
        q = (
            stream.writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if spark.read.parquet(str(out)).count() >= 250:
            break
    got = spark.read.parquet(str(out)).orderBy("doc_id").collect()
    want = _read(spark, 250, 4).orderBy("doc_id").collect()
    assert got == want
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)


def test_pushdown_reader_prunes_generated_range(spark):
    """Spark 4 Python DataSource filter pushdown (opt-in): doc_id range
    predicates reach pushFilters and narrow the GENERATED range — the
    partition list shrinks to the surviving ids, results stay exact,
    and unsupported predicates still apply above the source."""
    from luxo_rs_spark.sources.pysource import (
        SynthDocsDataSource,
        _SynthDocsPushdownReader,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(SynthDocsDataSource)
        df = (
            spark.read.format("synthdocs")
            .option("rows", 1000)
            .option("pushdown", "true")
            .load()
        )
        got = sorted(
            r.doc_id
            for r in df.filter(
                "doc_id >= 990 AND doc_id < 995 AND n_words >= 0"
            ).collect()
        )
        assert got == [990, 991, 992, 993, 994]
        # equality prunes to a single row
        assert df.filter("doc_id = 7").count() == 1

        # unit-level: the reader's surviving partitions cover only the
        # pruned range, and non-id filters are handed back to Spark
        from pyspark.sql.datasource import (
            GreaterThanOrEqual,
            LessThan,
            StringContains,
        )

        r = _SynthDocsPushdownReader({"rows": "1000", "partitions": "4"})
        leftover = list(
            r.pushFilters(
                [
                    GreaterThanOrEqual(("doc_id",), 990),
                    LessThan(("doc_id",), 995),
                    StringContains(("text",), "hash"),
                ]
            )
        )
        assert [type(f).__name__ for f in leftover] == ["StringContains"]
        parts = r.partitions()
        assert min(p.start for p in parts) == 990
        assert max(p.end for p in parts) == 995
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
