"""PageRank semantics vs an exact dense numpy power iteration —
the same cross-check style as the k-means / t-digest operators."""

from __future__ import annotations

import numpy as np
import pytest

from luxo_rs_spark.operators.graph import (
    out_degrees,
    pagerank,
    pagerank_fixedpoint,
)


def _python_pagerank_fp(edge_list, iters, num=17, den=20, scale=10**15):
    """Sequential reference for the fixed-point variant: the SAME
    integer floor-division recurrence, so equality is exact."""
    nodes = sorted({u for e in edge_list for u in e})
    n = len(nodes)
    out: dict[int, int] = {}
    for s, _ in edge_list:
        out[s] = out.get(s, 0) + 1
    r = {u: scale // n for u in nodes}
    for _ in range(iters):
        g = {u: 0 for u in nodes}
        for s, d in edge_list:
            g[d] += r[s] // out[s]
        dm = sum(r[u] for u in nodes if u not in out)
        r = {
            u: ((den - num) * scale) // (den * n)
            + (num * (g[u] + dm // n)) // den
            for u in nodes
        }
    return r


def _numpy_pagerank(edge_list, damping, iters):
    nodes = sorted({u for e in edge_list for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edge_list:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        for s, d in edge_list:
            nxt[idx[d]] += r[idx[s]] / out[idx[s]]
        dangling = r[out == 0].sum()
        r = (1 - damping) / n + damping * (nxt + dangling / n)
    return {u: r[idx[u]] for u in nodes}


@pytest.mark.parametrize("iters", [1, pytest.param(10, marks=pytest.mark.slow)])
def test_pagerank_matches_numpy(spark, iters):
    # 5-node graph with a cycle, a hub, and a DANGLING node (5)
    edge_list = [(1, 2), (2, 3), (3, 1), (1, 4), (4, 1), (2, 5), (3, 5)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(edges, 0.85, iters).collect()}
    want = _numpy_pagerank(edge_list, 0.85, iters)
    assert set(got) == set(want)
    for u in want:
        assert abs(got[u] - want[u]) < 1e-12, (u, got[u], want[u])
    # ranks are a probability distribution
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_out_degrees(spark):
    edges = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "src long, dst long")
    got = {r["node"]: r["out_deg"] for r in out_degrees(edges).collect()}
    assert got == {1: 2, 2: 1}


@pytest.mark.slow
def test_pagerank_deterministic_across_partitionings(spark):
    edge_list = [(i, (i * 7) % 23) for i in range(23)] + [(3, 11), (11, 3)]
    e1 = spark.createDataFrame(edge_list, "src long, dst long").repartition(2)
    e2 = spark.createDataFrame(edge_list, "src long, dst long").repartition(16)
    r1 = sorted((r["node"], round(r["rank"], 12)) for r in pagerank(e1, 0.85, 5).collect())
    r2 = sorted((r["node"], round(r["rank"], 12)) for r in pagerank(e2, 0.85, 5).collect())
    assert r1 == r2


def test_pagerank_empty_graph(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank(edges, 0.85, 3).count() == 0


def test_pagerank_fixedpoint_exact_vs_python(spark):
    # includes a dangling node (5) — exercises the __dm integer path
    edge_list = [(1, 2), (2, 3), (3, 1), (1, 4), (4, 1), (2, 5), (3, 5)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r["node"]: r["r"]
        for r in pagerank_fixedpoint(edges, iters=4).collect()
    }
    assert got == _python_pagerank_fp(edge_list, 4)


def test_pagerank_fixedpoint_lazy_no_dangling_matches_checkpointed(spark):
    # symmetric graph (no dangling): the fully-lazy single-plan form
    # must equal the checkpointed general form EXACTLY (integers)
    base = [(i, (i * 5) % 13) for i in range(13) if i != (i * 5) % 13]
    edge_list = base + [(d, s) for s, d in base]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    lazy = pagerank_fixedpoint(
        edges, iters=3, assume_no_dangling=True, checkpoint=False
    )
    chk = pagerank_fixedpoint(edges, iters=3)
    assert sorted(map(tuple, lazy.collect())) == sorted(
        map(tuple, chk.collect())
    )
    assert sorted(map(tuple, lazy.collect())) == sorted(
        _python_pagerank_fp(edge_list, 3).items()
    )


def test_pagerank_fixedpoint_tracks_float_ranks(spark):
    # quantization bound: fixed-point/scale within ~1e-12 of the float
    # iteration (same rounds, same damping)
    edge_list = [(1, 2), (2, 3), (3, 1), (1, 4), (4, 1), (2, 5), (3, 5)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    fp = {
        r["node"]: r["r"] / 1e15
        for r in pagerank_fixedpoint(edges, iters=5).collect()
    }
    fl = _numpy_pagerank(edge_list, 0.85, 5)
    for u in fl:
        assert abs(fp[u] - fl[u]) < 1e-9, (u, fp[u], fl[u])


def test_triangle_count_hand_graph(spark):
    """K4 (every node in 3 triangles), a triangle with a pendant, a
    4-cycle (none), a skewed star (none); dupes/self-loops/reversed
    edges tolerated."""
    from luxo_rs_spark.operators.graph import triangle_count

    edges = [
        # K4 on 1..4
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (2, 1), (3, 3),  # reversed dupe + self-loop: ignored
        # triangle 10,11,12 with pendant 13
        (10, 11), (11, 12), (12, 10), (12, 13),
        # 4-cycle 20..23
        (20, 21), (21, 22), (22, 23), (23, 20),
        # star around 30
        (30, 31), (30, 32), (30, 33), (30, 34),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 10: 1, 11: 1, 12: 1}


def test_geo_grid_candidates_and_haversine(spark):
    """Hand-checkable geometry: the grid join surfaces exactly the
    3x3-neighborhood pairs, and haversine hits textbook anchors
    (quarter meridian ~10007.5 km, 1 degree of latitude ~111.19 km)."""
    from pyspark.sql import functions as F

    from luxo_rs_spark.operators.geo import grid_candidates, haversine_km

    left = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 50.5, 120.5)], "id long, lat double, lon double"
    )
    right = spark.createDataFrame(
        [
            (10, 1.0, 1.0),     # neighbor cell of point 1
            (11, 5.0, 5.0),     # far from both
            (12, 49.5, 119.5),  # neighbor cell of point 2
        ],
        "rid long, r_lat double, r_lon double",
    )
    pairs = {
        (r["id"], r["rid"])
        for r in grid_candidates(left, right, cell_deg=2.0).collect()
    }
    assert pairs == {(1, 10), (2, 12)}

    d = spark.range(1).select(
        haversine_km(F.lit(0.0), F.lit(0.0), F.lit(90.0), F.lit(0.0)).alias(
            "quarter"
        ),
        haversine_km(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0)).alias(
            "one_deg"
        ),
    ).head()
    assert abs(d["quarter"] - 10007.5) < 1.0
    assert abs(d["one_deg"] - 111.19) < 0.01
