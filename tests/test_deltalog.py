"""From-scratch Delta transaction-log reader/writer
(sources/deltalog.py): hand-built FOREIGN logs (the reader's reason to
exist), writer round-trips, overwrite/delete/time-travel semantics,
checkpoints, stats skipping, and the protocol-v3 loud boundary."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from luxo_rs_spark.sources.deltalog import DeltaLog, DeltaProtocolError

ROOT = "/tmp/luxo_deltalog_tests"


@pytest.fixture()
def root():
    path = os.path.join(ROOT, "t")
    shutil.rmtree(path, ignore_errors=True)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(k, f"s{k % 5}", k * 2) for k in rows],
        "k bigint, s string, v bigint",
    )


def test_foreign_log_reads_without_our_writer(spark, root):
    """A log as ANOTHER ENGINE would write it: commitInfo noise lines,
    txn actions, unknown extra fields, string stats — built from raw
    JSON, never via DeltaLog.write. The reader must reconstruct the
    exact live state."""
    os.makedirs(os.path.join(root, "_delta_log"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"k": [1, 2, 3], "s": ["a", "b", "c"]}),
        os.path.join(root, "f1.parquet"),
    )
    pq.write_table(
        pa.table({"k": [10, 20], "s": ["x", "y"]}),
        os.path.join(root, "f2.parquet"),
    )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "s", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    }
    v0 = [
        {"commitInfo": {"operation": "WRITE", "engineInfo": "other-engine"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": "11111111-2222-3333-4444-555555555555",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {},
            "createdTime": 1700000000000,
        }},
        {"add": {
            "path": "f1.parquet", "partitionValues": {}, "size": 600,
            "modificationTime": 1700000000000, "dataChange": True,
            "stats": json.dumps({
                "numRecords": 3, "minValues": {"k": 1},
                "maxValues": {"k": 3}, "nullCount": {"k": 0},
            }),
            "tags": {"SOME_FUTURE_TAG": "ignored"},
        }},
        {"txn": {"appId": "someStream", "version": 7}},
    ]
    v1 = [
        {"commitInfo": {"operation": "WRITE"}},
        {"add": {
            "path": "f2.parquet", "partitionValues": {}, "size": 400,
            "modificationTime": 1700000001000, "dataChange": True,
        }},
    ]
    v2 = [
        {"commitInfo": {"operation": "DELETE"}},
        {"remove": {
            "path": "f1.parquet", "deletionTimestamp": 1700000002000,
            "dataChange": True,
        }},
    ]
    for v, actions in enumerate((v0, v1, v2)):
        with open(
            os.path.join(root, "_delta_log", f"{v:020d}.json"), "w"
        ) as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")

    t = DeltaLog(spark, root)
    assert t.versions() == [0, 1, 2]
    assert sorted(r["k"] for r in t.read(0).collect()) == [1, 2, 3]
    assert sorted(r["k"] for r in t.read(1).collect()) == [1, 2, 3, 10, 20]
    assert sorted(r["k"] for r in t.read().collect()) == [10, 20]
    # stats skipping off the foreign stats
    df, info = t.scan("k", 0, 5, version=1)
    assert info["files_total"] == 2
    # f2 has no stats -> must scan; f1 admits
    assert info["files_scanned"] == 2
    df, info = t.scan("k", 100, 200, version=1)
    assert info["files_scanned"] == 1 and info["rows_skipped"] == 3
    assert df.count() == 0


def test_writer_roundtrip_append_overwrite_timetravel(spark, root):
    t = DeltaLog(spark, root)
    assert t.write(_mk(spark, range(50)), mode="append") == 0
    assert t.write(_mk(spark, range(50, 80))) == 1
    assert t.read().count() == 80
    assert t.read(0).count() == 50
    t.write(_mk(spark, range(1000, 1010)), mode="overwrite")
    assert sorted(r["k"] for r in t.read().collect()) == list(
        range(1000, 1010)
    )
    assert t.read(1).count() == 80  # time travel across the overwrite
    # the log is newline-delimited JSON a foreign reader could parse
    raw = open(
        os.path.join(root, "_delta_log", f"{0:020d}.json")
    ).read().splitlines()
    kinds = [next(iter(json.loads(ln))) for ln in raw]
    assert kinds[0] == "protocol" and kinds[1] == "metaData"
    assert all(k == "add" for k in kinds[2:])


def test_delete_where_rewrites_only_admitted_files(spark, root):
    t = DeltaLog(spark, root)
    # two writes -> distinct files with distinct k ranges
    t.write(_mk(spark, range(100)))
    t.write(_mk(spark, range(1000, 1100)))
    s = t.snapshot()
    paths_before = set(s["adds"])
    t.delete_where("k", 20, 29)
    s2 = t.snapshot()
    # the 1000-range file(s) carried over untouched
    carried = paths_before & set(s2["adds"])
    assert carried  # at least the clean file survived
    assert set(r["k"] for r in t.read().collect()) == (
        set(range(100)) - set(range(20, 30))
    ) | set(range(1000, 1100))


def test_partitioned_write_and_read(spark, root):
    t = DeltaLog(spark, root)
    df = spark.createDataFrame(
        [(k, ["eu", "us"][k % 2], k * 3) for k in range(60)],
        "k bigint, region string, v bigint",
    )
    t.write(df, partition_by=["region"])
    s = t.snapshot()
    assert s["partition_columns"] == ["region"]
    assert all(
        a["partitionValues"].get("region") in ("eu", "us")
        for a in s["adds"].values()
    )
    out = t.read()
    assert set(out.columns) == {"k", "region", "v"}
    assert out.filter("region = 'eu'").count() == 30
    assert out.agg(F.sum("k")).first()[0] == sum(range(60))


def test_checkpoint_fast_path(spark, root):
    t = DeltaLog(spark, root)
    t.write(_mk(spark, range(40)))
    t.write(_mk(spark, range(40, 70)))
    t.delete_where("k", 0, 9)
    cp = t.checkpoint()
    assert cp == 2
    assert os.path.exists(
        os.path.join(root, "_delta_log", f"{cp:020d}.checkpoint.parquet")
    )
    # commits after the checkpoint replay on top of it
    t.write(_mk(spark, range(200, 210)))
    got = set(r["k"] for r in t.read().collect())
    assert got == set(range(10, 70)) | set(range(200, 210))
    # delete the PRE-checkpoint json logs: the reader must still
    # reconstruct the latest state purely from checkpoint + tail
    for v in (0, 1):
        os.remove(os.path.join(root, "_delta_log", f"{v:020d}.json"))
    t2 = DeltaLog(spark, root)
    assert set(r["k"] for r in t2.read().collect()) == got


def test_protocol_v3_features_raise_loudly(spark, root):
    os.makedirs(os.path.join(root, "_delta_log"))
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}}]}
    actions = [
        {"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        }},
        {"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [], "configuration": {},
        }},
    ]
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    with pytest.raises(DeltaProtocolError, match="deletionVectors"):
        DeltaLog(spark, root).read()


def test_crosscheck_with_deltalake_if_available(spark, root):
    """When the deltalake package IS present (not in this container),
    its writer's log must read back identically through ours."""
    deltalake = pytest.importorskip("deltalake")
    import pyarrow as pa

    deltalake.write_deltalake(
        root, pa.table({"k": [1, 2, 3], "s": ["a", "b", "c"]})
    )
    t = DeltaLog(spark, root)
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2, 3]
