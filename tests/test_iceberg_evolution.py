"""Iceberg SCHEMA EVOLUTION (sources/iceberg.py, round 10): rename /
add_column are metadata-only commits; data files resolve BY PARQUET
FIELD ID (the spec's column-resolution rule), so files written
before a rename keep reading, files written before an add surface
NULLs, bounds-based skipping survives renames (bounds key by id),
equality deletes written before a rename keep applying, and the
streaming source sees the evolved schema. Hand-built files without
field ids fall back to name matching."""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from luxo_rs_spark.sources.iceberg import (
    IcebergProtocolError,
    IcebergTable,
)

ROOT = "/tmp/luxo_iceberg_evolution_tests"


@pytest.fixture()
def base():
    path = os.path.join(ROOT, uuid.uuid4().hex[:8])
    os.makedirs(path)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def test_rename_is_metadata_only_and_files_keep_reading(spark, base):
    root = os.path.join(base, "t")
    t = IcebergTable(spark, root)
    t.write(spark.createDataFrame(
        [(1, "a"), (2, "b")], "k bigint, s string"
    ).coalesce(1))
    files_before = sorted(os.listdir(os.path.join(root, "data")))

    t.rename_column("s", "label")
    assert sorted(os.listdir(os.path.join(root, "data"))) == files_before
    got = t.read()
    assert got.columns == ["k", "label"]
    assert {(r["k"], r["label"]) for r in got.collect()} == {
        (1, "a"), (2, "b"),
    }

    # post-rename appends mix with pre-rename files transparently
    t.write(spark.createDataFrame(
        [(3, "c")], "k bigint, label string"
    ).coalesce(1))
    assert {(r["k"], r["label"]) for r in t.read().collect()} == {
        (1, "a"), (2, "b"), (3, "c"),
    }

    # duplicate / missing names rejected
    with pytest.raises(KeyError):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError):
        t.rename_column("k", "label")


def test_rename_keeps_bounds_skipping(spark, base):
    root = os.path.join(base, "t")
    t = IcebergTable(spark, root)
    t.write(spark.createDataFrame(
        [(k, k * 2) for k in range(100)], "k bigint, v bigint"
    ).coalesce(1))
    t.write(spark.createDataFrame(
        [(k, k * 2) for k in range(1000, 1100)], "k bigint, v bigint"
    ).coalesce(1))
    t.rename_column("k", "key")

    df, info = t.scan("key", 0, 50)
    assert info["files_scanned"] == 1  # bounds keyed by id survive
    assert df.count() == 51


def test_add_column_nulls_in_older_files(spark, base):
    root = os.path.join(base, "t")
    t = IcebergTable(spark, root)
    t.write(spark.createDataFrame([(1,), (2,)], "k bigint").coalesce(1))
    t.add_column("w", "long")
    got = {(r["k"], r["w"]) for r in t.read().collect()}
    assert got == {(1, None), (2, None)}

    t.write(spark.createDataFrame(
        [(3, 30)], "k bigint, w bigint"
    ).coalesce(1))
    got = {(r["k"], r["w"]) for r in t.read().collect()}
    assert got == {(1, None), (2, None), (3, 30)}

    with pytest.raises(ValueError):
        t.add_column("k", "long")
    with pytest.raises(IcebergProtocolError):
        t.add_column("nested", "struct<int>")


def test_eq_delete_written_before_rename_still_applies(spark, base):
    root = os.path.join(base, "t")
    t = IcebergTable(spark, root)
    t.write(spark.createDataFrame(
        [(k, f"s{k}") for k in range(10)], "k bigint, s string"
    ).coalesce(1))
    t.delete_equality(spark.createDataFrame([(3,), (4,)], "k bigint"))
    t.rename_column("k", "key")
    got = sorted(r["key"] for r in t.read().collect())
    assert got == [0, 1, 2, 5, 6, 7, 8, 9]


def test_rename_partition_source_is_a_loud_boundary(spark, base):
    root = os.path.join(base, "t")
    t = IcebergTable(spark, root)
    t.write(
        spark.createDataFrame(
            [(k, k % 3) for k in range(9)], "k bigint, b bigint"
        ).coalesce(1),
        partition_by="b",
    )
    with pytest.raises(IcebergProtocolError, match="partition source"):
        t.rename_column("b", "bucket")
    t.rename_column("k", "key")  # non-source renames stay fine
    assert sorted(t.read().columns) == ["b", "key"]


def test_stream_sees_evolved_schema(spark, base):
    from luxo_rs_spark.sources.icebergstream import register

    root = os.path.join(base, "t")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    t = IcebergTable(spark, root)
    t.write(spark.createDataFrame(
        [(1, "a"), (2, "b")], "k bigint, s string"
    ).coalesce(1))
    t.rename_column("s", "label")
    t.add_column("w", "long")
    t.write(spark.createDataFrame(
        [(3, "c", 33)], "k bigint, label string, w bigint"
    ).coalesce(1))

    register(spark)
    q = (
        spark.readStream.format("icebergstream").load(root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert set(got.columns) == {"k", "label", "w"}
    rows = {(r["k"], r["label"], r["w"]) for r in got.collect()}
    assert rows == {(1, "a", None), (2, "b", None), (3, "c", 33)}


def test_multi_column_identity_partitioning(spark, base):
    """Round 10: multi-column identity partition specs — spec fields
    1000+i, per-field manifest-list summaries, hive-style nested
    layout, both columns injected typed on read, and two-level
    manifest pruning on the FIRST spec field."""
    root = os.path.join(base, "t")
    t = IcebergTable(spark, root)
    df = spark.createDataFrame(
        [(k, k % 3, ["eu", "us"][k % 2], f"s{k}") for k in range(60)],
        "k bigint, b bigint, region string, s string",
    )
    t.write(df, partition_by=["b", "region"])

    got = t.read()
    assert set(got.columns) == {"k", "b", "region", "s"}
    rows = {(r["k"], r["b"], r["region"]) for r in got.collect()}
    assert rows == {(k, k % 3, ["eu", "us"][k % 2]) for k in range(60)}

    # appends default to the declared multi-column spec
    t.write(spark.createDataFrame(
        [(100, 1, "eu", "s100")],
        "k bigint, b bigint, region string, s string",
    ))
    assert t.read().count() == 61

    # pruning on the first spec field: the b=0 scan must admit every
    # b=0 file (conservative pruning may keep more, never fewer)
    minfo: dict = {}
    files = t.data_files(prune=("b", 0, 0), minfo=minfo)
    assert minfo["manifests_scanned"] <= minfo["manifests_total"]
    b0 = {
        fl["path"] for fl in t.data_files()
        if fl["partition"]["b"] == 0
    }
    assert b0 <= {fl["path"] for fl in files}
    # every file's partition struct carries BOTH fields
    assert all(
        set(fl["partition"]) == {"b", "region"}
        for fl in t.data_files()
    )
