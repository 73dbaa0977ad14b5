"""Foreign-Iceberg Structured Streaming source
(sources/icebergstream.py): snapshot-then-tail delivery, exactly-once
checkpoint restarts, replace (compaction) invisibility, the
delete/overwrite snapshot gates, startingSequence replay, and
position/equality deletes + typed partition values on streamed
rows. Also pins IcebergTable.compact() itself."""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from luxo_rs_spark.sources.iceberg import IcebergTable
from luxo_rs_spark.sources.icebergstream import register

ROOT = "/tmp/luxo_icebergstream_tests"


@pytest.fixture()
def base():
    path = os.path.join(ROOT, uuid.uuid4().hex[:8])
    os.makedirs(path)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(k, f"s{k % 5}", k * 2) for k in rows],
        "k bigint, s string, v bigint",
    )


def _sink_ks(spark, out):
    if not os.path.isdir(out) or not any(
        f.endswith(".parquet") for f in os.listdir(out)
    ):
        return set()
    return {
        r["k"] for r in spark.read.parquet(out).select("k").collect()
    }


def _drain(spark, root, out, ckpt, **options):
    """Drain the icebergstream source into a parquet sink; restarts
    until the sink AND the checkpoint's committed batches stop
    changing (python sources run one micro-batch per availableNow
    start)."""
    register(spark)

    def committed():
        d = os.path.join(ckpt, "commits")
        return sorted(os.listdir(d)) if os.path.isdir(d) else []

    for _ in range(6):
        before = (_sink_ks(spark, out), committed())
        reader = spark.readStream.format("icebergstream")
        for k, v in options.items():
            reader = reader.option(k, v)
        q = (
            reader.load(root)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        after = (_sink_ks(spark, out), committed())
        if after == before:
            return after[0]
    return _sink_ks(spark, out)


def test_snapshot_then_tail_exactly_once(spark, base):
    root = os.path.join(base, "t")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    t = IcebergTable(spark, root)
    t.write(_mk(spark, [1, 2, 3]))
    t.write(_mk(spark, [10, 11]))

    assert _drain(spark, root, out, ckpt) == {1, 2, 3, 10, 11}
    assert _drain(spark, root, out, ckpt) == {1, 2, 3, 10, 11}

    t.write(_mk(spark, [20, 21]))
    assert _drain(spark, root, out, ckpt) == {1, 2, 3, 10, 11, 20, 21}


def test_compact_replace_snapshot_is_invisible(spark, base):
    root = os.path.join(base, "t")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    t = IcebergTable(spark, root)
    t.write(_mk(spark, [1, 2]))
    t.write(_mk(spark, [3, 4]))
    assert _drain(spark, root, out, ckpt) == {1, 2, 3, 4}

    sid = t.compact()
    snap = t._snapshot(t.metadata(), sid)
    assert snap["summary"]["operation"] == "replace"
    # batch read still exact post-compaction
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2, 3, 4]

    # the tail delivers NOTHING for the replace…
    assert _drain(spark, root, out, ckpt) == {1, 2, 3, 4}
    # …and survives it: the next append flows (and only it)
    t.write(_mk(spark, [9]))
    assert _drain(spark, root, out, ckpt) == {1, 2, 3, 4, 9}


def test_delete_and_overwrite_gates(spark, base):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    root = os.path.join(base, "t")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    t = IcebergTable(spark, root)
    t.write(_mk(spark, range(10)))
    assert _drain(spark, root, out, ckpt) == set(range(10))

    t.delete_where("k", 3, 5)  # merge-on-read position delete
    with pytest.raises(
        StreamingQueryException, match="streaming-skip-delete-snapshots"
    ):
        _drain(spark, root, out, ckpt)
    t.write(_mk(spark, [100]))
    got = _drain(
        spark, root, out, ckpt,
        **{"streaming-skip-delete-snapshots": "true"},
    )
    assert got == set(range(10)) | {100}

    t.write(_mk(spark, [200]), mode="overwrite")
    with pytest.raises(
        StreamingQueryException,
        match="streaming-skip-overwrite-snapshots",
    ):
        _drain(
            spark, root, out, ckpt,
            **{"streaming-skip-delete-snapshots": "true"},
        )
    t.write(_mk(spark, [201]))
    got = _drain(
        spark, root, out, ckpt,
        **{
            "streaming-skip-delete-snapshots": "true",
            "streaming-skip-overwrite-snapshots": "true",
        },
    )
    assert got == set(range(10)) | {100, 201}


def test_starting_sequence_replays_appends(spark, base):
    root = os.path.join(base, "t")
    t = IcebergTable(spark, root)
    t.write(_mk(spark, [1, 2]))
    t.write(_mk(spark, [3]))
    t.write(_mk(spark, [4, 5]))

    got = _drain(
        spark, root,
        os.path.join(base, "o1"), os.path.join(base, "c1"),
        startingSequence="1",
    )
    assert got == {1, 2, 3, 4, 5}

    got = _drain(
        spark, root,
        os.path.join(base, "o3"), os.path.join(base, "c3"),
        startingSequence="3",
    )
    assert got == {4, 5}


def test_deletes_and_typed_partitions_on_streamed_rows(spark, base):
    root = os.path.join(base, "t")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    df = spark.createDataFrame(
        [(k, k % 3, f"s{k}") for k in range(20)],
        "k bigint, bucket bigint, s string",
    )
    t = IcebergTable(spark, root)
    t.write(df, partition_by="bucket")
    t.delete_where("k", 4, 8)  # position delete
    t.delete_equality(  # equality delete on k
        spark.createDataFrame([(15,), (16,)], "k bigint")
    )

    # snapshot start AFTER the churn: streamed rows == batch read —
    # both delete kinds applied, typed partition values injected
    got = _drain(spark, root, out, ckpt)
    want = {r["k"] for r in t.read().collect()}
    assert got == want
    assert not got & (set(range(4, 9)) | {15, 16})
    st = spark.read.parquet(out)
    assert dict(st.dtypes)["bucket"] == "bigint"
    assert {
        (r["k"] % 3) == r["bucket"] for r in st.collect()
    } == {True}
