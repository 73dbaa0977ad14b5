"""Property-based tests (hypothesis) for the sketch cores — the pure
numpy/python layers of operators/tdigest.py and operators/sketch.py,
exercised directly so the properties run over hundreds of random inputs
without a Spark session."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from luxo_rs_spark.operators.sketch import _mg_summary
from luxo_rs_spark.operators.tdigest import (
    _digest_of,
    _merge_centroids,
)

values = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=500,
)


@given(values)
@settings(max_examples=100, deadline=None)
def test_tdigest_weight_conservation(vals):
    """Total centroid weight always equals the input count, and means
    stay inside [min, max] — no mass is ever lost or fabricated."""
    d = _digest_of(np.array(vals), delta=50.0)
    assert abs(sum(d["weights"]) - len(vals)) < 1e-9
    for m in d["means"]:
        assert d["mn"] - 1e-9 <= m <= d["mx"] + 1e-9


@given(values)
@settings(max_examples=100, deadline=None)
def test_tdigest_centroids_sorted_and_bounded(vals):
    """Centroid means are non-decreasing (required for quantile
    interpolation) and the summary stays O(delta)."""
    d = _digest_of(np.array(vals), delta=50.0)
    means = d["means"]
    assert all(means[i] <= means[i + 1] + 1e-9 for i in range(len(means) - 1))
    assert len(means) <= 2 * 50 + 2


@given(values, values)
@settings(max_examples=50, deadline=None)
def test_tdigest_merge_conserves_weight(a, b):
    """Merging two digests' centroid lists conserves total mass and
    ordering — the invariant incremental rollups rely on."""
    da = _digest_of(np.array(a), delta=50.0)
    db = _digest_of(np.array(b), delta=50.0)
    m, w = _merge_centroids(
        np.array(da["means"] + db["means"]),
        np.array(da["weights"] + db["weights"]),
        50.0,
    )
    assert abs(w.sum() - (len(a) + len(b))) < 1e-6
    assert all(m[i] <= m[i + 1] + 1e-9 for i in range(len(m) - 1))


@given(values)
@settings(max_examples=60, deadline=None)
def test_tdigest_median_rank_error(vals):
    """Interpolated median lands within 10% rank of the true median on
    arbitrary inputs (loose envelope: tiny adversarial inputs; the
    1% envelope on realistic data is pinned in test_tdigest.py)."""
    arr = np.array(vals, dtype=np.float64)
    d = _digest_of(arr, delta=100.0)
    m = np.asarray(d["means"]); w = np.asarray(d["weights"])
    total = d["total"]
    cum = np.cumsum(w) - w / 2
    xs = np.concatenate(([0.0], cum, [total]))
    ys = np.concatenate(([d["mn"]], m, [d["mx"]]))
    est = float(np.interp(0.5 * total, xs, ys))
    rank = (arr <= est).mean()
    # account for ties: rank of the value just below est must bracket 0.5
    rank_lo = (arr < est).mean()
    assert rank_lo - 0.10 <= 0.5 <= rank + 0.10, (est, rank_lo, rank)


items = st.lists(
    st.sampled_from([f"i{j}" for j in range(30)]), min_size=1, max_size=400
)


@given(items, st.integers(min_value=2, max_value=12))
@settings(max_examples=100, deadline=None)
def test_mg_superset_and_size(stream, k):
    """Misra-Gries over any stream: every item with count > n/k is in
    the summary, and the summary never exceeds k entries."""
    fold = _mg_summary(k, "term")
    # feed as multiple batches to exercise the fold path
    third = max(1, len(stream) // 3)
    batches = [
        pd.DataFrame({"term": stream[i : i + third]})
        for i in range(0, len(stream), third)
    ]
    out = pd.concat(list(fold(iter(batches))))
    cands = set(out["term"])
    assert len(cands) <= k
    n = len(stream)
    from collections import Counter

    for it, c in Counter(stream).items():
        if c > n / k:
            assert it in cands, (it, c, n, k, cands)
