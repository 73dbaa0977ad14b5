"""Foreign-Delta Structured Streaming source
(sources/deltastream.py): snapshot-then-tail delivery, exactly-once
restarts off the checkpoint, OPTIMIZE invisibility, the
change-commit gate (raise / ignoreDeletes / skipChangeCommits),
startingVersion replay, and column mapping + deletion vectors +
typed partition values on the streamed rows."""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from luxo_rs_spark.sources.deltalog import DeltaLog
from luxo_rs_spark.sources.deltastream import register

ROOT = "/tmp/luxo_deltastream_tests"


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
    """Drain the deltastream source into a parquet sink and return
    the sink's k-set. Python streaming sources fall back to
    single-batch execution under availableNow (one micro-batch per
    start), so this restarts until the sink stops growing — each
    restart resumes exactly-once off the checkpoint."""
    register(spark)

    def committed():
        d = os.path.join(ckpt, "commits")
        return (
            sorted(os.listdir(d)) if os.path.isdir(d) else []
        )

    for _ in range(6):
        before = (_sink_ks(spark, out), committed())
        reader = spark.readStream.format("deltastream")
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
    t = DeltaLog(spark, root)
    t.write(_mk(spark, [1, 2, 3]))
    t.write(_mk(spark, [10, 11]))

    # first run: the live snapshot (both commits) in one pass
    assert _drain(spark, root, out, ckpt) == {1, 2, 3, 10, 11}

    # nothing new: a restart from the same checkpoint delivers nothing
    assert _drain(spark, root, out, ckpt) == {1, 2, 3, 10, 11}

    # append lands; only ITS rows are delivered on the next pass
    t.write(_mk(spark, [20, 21, 22]))
    assert _drain(spark, root, out, ckpt) == {
        1, 2, 3, 10, 11, 20, 21, 22,
    }


def test_optimize_commit_is_invisible(spark, base):
    root = os.path.join(base, "t")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    t = DeltaLog(spark, root)
    t.write(_mk(spark, [1, 2]))
    t.write(_mk(spark, [3, 4]))
    assert _drain(spark, root, out, ckpt) == {1, 2, 3, 4}

    # hand-write an OPTIMIZE-shaped commit: one compacted file,
    # adds AND removes all dataChange=false (the Delta compaction
    # contract) — the stream must deliver NOTHING for it
    import pyarrow as pa
    import pyarrow.parquet as pq

    s = t.snapshot()
    live = sorted(s["adds"])
    compacted = "compacted-000.parquet"
    rows = spark.read.parquet(
        *[os.path.join(root, p) for p in live]
    ).orderBy("k")
    pq.write_table(
        pa.Table.from_pandas(rows.toPandas(), preserve_index=False),
        os.path.join(root, compacted),
    )
    actions = [{"commitInfo": {"operation": "OPTIMIZE"}}]
    actions.append({"add": {
        "path": compacted, "partitionValues": {}, "size": 1,
        "modificationTime": 0, "dataChange": False,
    }})
    actions.extend({"remove": {
        "path": p, "deletionTimestamp": 0, "dataChange": False,
    }} for p in live)
    v = t.latest_version() + 1
    with open(
        os.path.join(root, "_delta_log", f"{v:020d}.json"), "w"
    ) as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")

    assert _drain(spark, root, out, ckpt) == {1, 2, 3, 4}

    # the tail is still alive after the skipped commit
    t.write(_mk(spark, [9]))
    assert _drain(spark, root, out, ckpt) == {1, 2, 3, 4, 9}


def test_change_commit_gate(spark, base):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    root = os.path.join(base, "t")
    t = DeltaLog(spark, root)
    t.write(_mk(spark, range(10)))
    out1 = os.path.join(base, "out1")
    ck1 = os.path.join(base, "ck1")
    assert _drain(spark, root, out1, ck1) == set(range(10))

    t.delete_where("k", 3, 5)  # CoW: remove+add, dataChange=true

    # default: the stream REFUSES the retraction, loudly
    with pytest.raises(StreamingQueryException, match="skipChangeCommits"):
        _drain(spark, root, out1, ck1)

    # ignoreDeletes is NOT enough (the commit also adds files)
    with pytest.raises(StreamingQueryException, match="skipChangeCommits"):
        _drain(spark, root, out1, ck1, ignoreDeletes="true")

    # skipChangeCommits: the commit vanishes; later appends still flow
    t.write(_mk(spark, [100]))
    assert _drain(
        spark, root, out1, ck1, skipChangeCommits="true"
    ) == set(range(10)) | {100}


def test_ignore_deletes_waives_delete_only_commits(spark, base):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    root = os.path.join(base, "t")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    t = DeltaLog(spark, root)
    t.write(_mk(spark, [1, 2]))
    t.write(_mk(spark, [3, 4]))
    assert _drain(spark, root, out, ckpt) == {1, 2, 3, 4}

    # a delete-ONLY commit (whole file dropped, no adds)
    target = sorted(t.snapshot()["adds"])[0]
    v = t.latest_version() + 1
    with open(
        os.path.join(root, "_delta_log", f"{v:020d}.json"), "w"
    ) as f:
        f.write(json.dumps({"remove": {
            "path": target, "deletionTimestamp": 0, "dataChange": True,
        }}) + "\n")

    with pytest.raises(StreamingQueryException, match="ignoreDeletes"):
        _drain(spark, root, out, ckpt)
    t.write(_mk(spark, [7]))
    assert _drain(
        spark, root, out, ckpt, ignoreDeletes="true"
    ) == {1, 2, 3, 4, 7}


def test_starting_version_replays_history_as_appends(spark, base):
    root = os.path.join(base, "t")
    t = DeltaLog(spark, root)
    t.write(_mk(spark, [1, 2]))
    t.write(_mk(spark, [3]))
    t.write(_mk(spark, [4, 5]))

    # from version 0: every commit's adds, in one availableNow pass
    got = _drain(
        spark, root,
        os.path.join(base, "o0"), os.path.join(base, "c0"),
        startingVersion="0",
    )
    assert got == {1, 2, 3, 4, 5}

    # from version 2: only the last append
    got = _drain(
        spark, root,
        os.path.join(base, "o2"), os.path.join(base, "c2"),
        startingVersion="2",
    )
    assert got == {4, 5}


def test_column_mapping_dv_and_typed_partitions(spark, base):
    root = os.path.join(base, "t")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    df = spark.createDataFrame(
        [(k, k % 3, f"s{k}") for k in range(20)],
        "k bigint, bucket int, s string",
    )
    t = DeltaLog(spark, root)
    t.write(df, partition_by=["bucket"])
    t.enable_column_mapping()
    t.rename_column("s", "label")
    t.delete_where("k", 4, 8, mode="dv")

    # snapshot start AFTER the churn: streamed rows == batch read,
    # logical names, typed partition column, DV-deleted rows absent
    register(spark)
    q = (
        spark.readStream.format("deltastream").load(root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert set(got.columns) == {"k", "bucket", "label"}
    assert dict(got.dtypes)["bucket"] == "int"
    rows = {(r["k"], r["bucket"], r["label"]) for r in got.collect()}
    want = {
        (r["k"], r["bucket"], r["label"])
        for r in t.read().collect()
    }
    assert rows == want
    assert all(not (4 <= k <= 8) for k, _, _ in rows)
    # the tail survives: a post-churn append streams through
    t.write(
        spark.createDataFrame(
            [(100, 1, "s100")], "k bigint, bucket int, label string"
        ),
        partition_by=["bucket"],
    )
    q = (
        spark.readStream.format("deltastream").load(root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ks = {
        r["k"] for r in spark.read.parquet(out).select("k").collect()
    }
    assert 100 in ks and len(ks) == len(rows) + 1


def _drain_cdf(spark, root, out, ckpt):
    """Drain the CDF tail; returns {(change_type, k)} multiset as a
    sorted list."""
    register(spark)
    for _ in range(4):
        before = _sink_ks(spark, out)
        q = (
            spark.readStream.format("deltastream")
            .option("readChangeFeed", "true")
            .load(root)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        if _sink_ks(spark, out) == before:
            break
    return sorted(
        (r["change_type"], r["k"])
        for r in spark.read.parquet(out).collect()
    )


def test_cdf_stream_tail(spark, base):
    """readChangeFeed: inserts for the initial state, exact delete
    rows for a CoW delete, net-zero for an OPTIMIZE-shaped rewrite,
    inserts for appends — the batch DeltaLog.changes semantics,
    streamed exactly-once."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = os.path.join(base, "t")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    t = DeltaLog(spark, root)
    t.write(_mk(spark, range(6)))

    got = _drain_cdf(spark, root, out, ckpt)
    assert got == [("insert", k) for k in range(6)]

    # CoW delete: exactly the removed rows, tagged delete
    t.delete_where("k", 2, 3)
    got = _drain_cdf(spark, root, out, ckpt)
    assert sorted(g for g in got if g[0] == "delete") == [
        ("delete", 2), ("delete", 3),
    ]
    n_after_delete = len(got)

    # OPTIMIZE-shaped rewrite: rows unchanged -> the diff nets to ZERO
    s = t.snapshot()
    live = sorted(s["adds"])
    rows = spark.read.parquet(*[os.path.join(root, p) for p in live])
    pq.write_table(
        pa.Table.from_pandas(rows.toPandas(), preserve_index=False),
        os.path.join(root, "compacted-cdf.parquet"),
    )
    acts = [{"add": {
        "path": "compacted-cdf.parquet", "partitionValues": {},
        "size": 1, "modificationTime": 0, "dataChange": False,
    }}]
    acts.extend({"remove": {
        "path": p, "deletionTimestamp": 0, "dataChange": False,
    }} for p in live)
    v = t.latest_version() + 1
    with open(
        os.path.join(root, "_delta_log", f"{v:020d}.json"), "w"
    ) as f:
        for a in acts:
            f.write(json.dumps(a) + "\n")
    assert len(_drain_cdf(spark, root, out, ckpt)) == n_after_delete

    # append streams as inserts
    t.write(_mk(spark, [100]))
    got = _drain_cdf(spark, root, out, ckpt)
    assert ("insert", 100) in got
    assert len(got) == n_after_delete + 1


def test_cdf_stream_dv_delete_surfaces_exact_rows(spark, base):
    root = os.path.join(base, "t")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    t = DeltaLog(spark, root)
    t.write(_mk(spark, range(10)))
    assert len(_drain_cdf(spark, root, out, ckpt)) == 10

    t.delete_where("k", 4, 6, mode="dv")  # merge-on-read
    got = _drain_cdf(spark, root, out, ckpt)
    deletes = sorted(g for g in got if g[0] == "delete")
    assert deletes == [("delete", 4), ("delete", 5), ("delete", 6)]
    # no spurious inserts from the DV re-add of the same file
    assert sum(1 for g in got if g[0] == "insert") == 10
