"""Roaring bitmap relation (operators/bitmap.py, q432): portable-format
round-trips across every container-type transition, the runOptimize
sizing rule, blob set algebra, and the bounded two-stage Spark build."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from luxo_rs_spark.operators.bitmap import (
    build_group_bitmaps,
    roaring_and_card,
    roaring_deserialize,
    roaring_serialize,
    roaring_stats,
)


def test_roaring_roundtrip_container_transitions():
    rng = np.random.default_rng(30)
    cases = {
        "empty": np.array([], dtype=np.uint32),
        "single": np.array([7], dtype=np.uint32),
        "run": np.arange(100, dtype=np.uint32),
        "array_small": rng.choice(4096, 1000, replace=False).astype(np.uint32),
        "array_boundary": np.arange(0, 8192, 2, dtype=np.uint32),  # 4096 card
        "bitmap": np.arange(0, 65536, 3, dtype=np.uint32)[:5000] * 3 // 3,
        "dense_runs": rng.choice(70000, 60000, replace=False).astype(np.uint32),
        "multi_block": np.concatenate(
            [np.arange(5000, dtype=np.uint32),
             np.array([1 << 31, (1 << 32) - 1], dtype=np.uint32)]
        ),
        "dupes": np.array([5, 5, 5, 9, 9], dtype=np.uint32),
    }
    for name, vals in cases.items():
        blob = roaring_serialize(vals)
        back = roaring_deserialize(blob)
        want = np.sort(np.unique(vals))
        assert (back == want).all(), name
        card, na, nb, nr = roaring_stats(blob)
        assert card == len(want), name


def test_roaring_sizing_rule_pins_types():
    """runOptimize: a full-range run beats both encodings; stride-2
    never runs; > 4096 cardinality without runs is a bitmap."""
    full = roaring_serialize(np.arange(65536, dtype=np.uint32))
    assert roaring_stats(full) == (65536, 0, 0, 1)
    stride = roaring_serialize(np.arange(0, 65536, 2, dtype=np.uint32))
    assert roaring_stats(stride) == (32768, 0, 1, 0)
    small = roaring_serialize(np.arange(0, 200, 2, dtype=np.uint32))
    assert roaring_stats(small) == (100, 1, 0, 0)


def test_roaring_algebra():
    a = roaring_serialize(np.arange(1000, dtype=np.uint32))
    b = roaring_serialize(np.arange(500, 2000, dtype=np.uint32))
    assert roaring_and_card(a, b) == 500
    union = np.union1d(roaring_deserialize(a), roaring_deserialize(b))
    assert len(union) == 2000
    # re-serializing the union is still a valid blob (mergeability)
    assert roaring_stats(roaring_serialize(union))[0] == 2000


def test_roaring_rejects_foreign_bytes():
    with pytest.raises(ValueError):
        roaring_deserialize(b"\x00\x01\x02\x03\x04")


def test_build_group_bitmaps_spark(spark):
    """The two-stage distributed build equals a local per-group
    serialize, byte for byte — across Arrow-batch splits and shuffles."""
    rng = np.random.default_rng(31)
    rows = [
        (f"g{k}", int(v))
        for k in range(4)
        for v in rng.choice(200000, 3000, replace=False)
    ]
    # one group gets a pure run to force the run container distributed
    rows += [("grun", v) for v in range(70000, 71000)]
    df = spark.createDataFrame(rows, "g string, v long").repartition(8)
    got = {r.g: r for r in build_group_bitmaps(df, "g", "v").collect()}
    import collections

    local = collections.defaultdict(list)
    for g, v in rows:
        local[g].append(v)
    for g, vals in local.items():
        blob = roaring_serialize(np.array(vals, dtype=np.uint32))
        r = got[g]
        assert bytes(r.rbm) == blob, g
        card, na, nb, nr = roaring_stats(blob)
        assert (r.cardinality, r.n_array, r.n_bitmap, r.n_run) == (
            card, na, nb, nr,
        ), g
