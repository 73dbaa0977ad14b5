"""Semantics tests for the as-of join, boundary-case style per the
reference's search tests (odd keys probed with even/equal needles,
src/algo/search.rs:126-373): backward = greatest_not_exceeding floor
(src/algo/search.rs:51-80, inclusive), forward = next_largest successor
(src/algo/search.rs:96-124, STRICT >)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from luxo_rs_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    # builds at odd t = 1,3,5,7,9 (the reference fixture's key pattern)
    build = spark.createDataFrame(
        [(1, t, f"b{t}") for t in (1, 3, 5, 7, 9)] + [(2, 4, "other")],
        "k long, bt long, tag string",
    )
    # probes: below-min, exact-hit, between, at-max, above-max
    probe = spark.createDataFrame(
        [(1, 0, "p0"), (1, 3, "p3"), (1, 6, "p6"), (1, 9, "p9"), (1, 12, "p12")],
        "k long, pt long, pid string",
    )
    return probe, build


def _run(probe, build, direction):
    out = asof_join(
        probe,
        build,
        on="k",
        probe_time="pt",
        build_time="bt",
        payload={"bt": "match_t"},
        direction=direction,
    )
    return {r.pid: r.match_t for r in out.collect()}


def test_backward_floor_semantics(frames):
    probe, build = frames
    got = _run(probe, build, "backward")
    # floor: greatest build <= probe; exact hit matches itself
    assert got == {"p0": None, "p3": 3, "p6": 5, "p9": 9, "p12": 9}


def test_forward_successor_is_strict(frames):
    probe, build = frames
    got = _run(probe, build, "forward")
    # successor: least build > probe — STRICTLY greater, so the exact
    # hit at t=3 matches 5, and t=9 (the max) matches nothing
    # (reference next_largest returns None when needle >= max,
    # src/algo/search.rs:354-372)
    assert got == {"p0": 1, "p3": 5, "p6": 7, "p9": None, "p12": None}


def test_keys_do_not_leak_across_partitions(frames):
    probe, build = frames
    out = asof_join(
        probe.withColumn("k", F.lit(3)),  # key with NO builds
        build,
        on="k",
        probe_time="pt",
        build_time="bt",
        payload={"bt": "match_t"},
    )
    assert all(r.match_t is None for r in out.collect())


def test_tolerance_masks_stale_matches(frames):
    probe, build = frames
    out = asof_join(
        probe,
        build,
        on="k",
        probe_time="pt",
        build_time="bt",
        payload={"bt": "match_t"},
        tolerance=1,
    )
    got = {r.pid: r.match_t for r in out.collect()}
    # floor matches: p3->3 (gap 0), p6->5 (gap 1) survive; p9->9 (gap 0)
    # survives; p12->9 (gap 3) is masked; p0 never matched.
    assert got == {"p0": None, "p3": 3, "p6": 5, "p9": 9, "p12": None}


def test_tolerance_forward_direction(frames):
    probe, build = frames
    out = asof_join(
        probe,
        build,
        on="k",
        probe_time="pt",
        build_time="bt",
        payload={"bt": "match_t"},
        direction="forward",
        tolerance=1,
    )
    got = {r.pid: r.match_t for r in out.collect()}
    # strict successor with gap <= 1: p0->1, p6->7; p3->5 (gap 2) masked,
    # p9->None (no successor), p12->None.
    assert got == {"p0": 1, "p3": None, "p6": 7, "p9": None, "p12": None}
