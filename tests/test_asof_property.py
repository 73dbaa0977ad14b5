"""Property-based differential test for asof_join: for ALL randomly
generated (probe, build) tables, the Spark as-of join must agree with
pandas.merge_asof — the widely-trusted reference implementation of the
floor/successor matching the reference engine pins in
src/algo/search.rs:51-80 (backward) and :96-124 (forward).

Hypothesis drives the shapes (duplicate keys, empty sides, equal
timestamps, sparse matches); one shared Spark session executes each
case. Integer time columns keep the comparison exact.
"""

from __future__ import annotations

import pandas as pd
import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from luxo_rs_spark.operators.asof import asof_join

pytestmark = pytest.mark.slow  # heavy suite: full-lane only

keys = st.integers(min_value=0, max_value=3)
times = st.integers(min_value=0, max_value=100)

rows = st.lists(st.tuples(keys, times), min_size=0, max_size=25)


def _spark_asof(spark, probe_rows, build_rows, direction):
    probe = spark.createDataFrame(
        pd.DataFrame(
            [(i, k, t) for i, (k, t) in enumerate(probe_rows)],
            columns=["pid", "k", "pt"],
        ),
        "pid long, k long, pt long",
    )
    build = spark.createDataFrame(
        pd.DataFrame(
            [(k, t, k * 1000 + t) for (k, t) in build_rows],
            columns=["k", "bt", "val"],
        ),
        "k long, bt long, val long",
    )
    out = asof_join(
        probe,
        build,
        on="k",
        probe_time="pt",
        build_time="bt",
        payload={"val": "val"},
        direction=direction,
    )
    return {
        r.pid: r.val for r in out.select("pid", "val").collect()
    }


def _pandas_asof(probe_rows, build_rows, direction):
    probe = (
        pd.DataFrame(
            [(i, k, t) for i, (k, t) in enumerate(probe_rows)],
            columns=["pid", "k", "pt"],
        )
        .astype({"pid": "int64", "k": "int64", "pt": "int64"})
        .sort_values("pt", kind="stable")
    )
    build = pd.DataFrame(
        [(k, t, k * 1000 + t) for (k, t) in build_rows],
        columns=["k", "bt", "val"],
    ).astype({"k": "int64", "bt": "int64", "val": "int64"})
    # pandas needs dedup per (k, bt): keep the max val like the Spark
    # operator's deterministic last-wins ordering
    build = (
        build.groupby(["k", "bt"], as_index=False)["val"].max()
        .sort_values("bt", kind="stable")
    )
    if len(probe) == 0:
        return {}
    merged = pd.merge_asof(
        probe,
        build,
        left_on="pt",
        right_on="bt",
        by="k",
        direction=direction,
        allow_exact_matches=(direction == "backward"),
    )
    return {
        int(r.pid): (None if pd.isna(r.val) else int(r.val))
        for r in merged.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward"])
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(probe_rows=rows, build_rows=rows)
def test_asof_matches_pandas(spark, direction, probe_rows, build_rows):
    got = _spark_asof(spark, probe_rows, build_rows, direction)
    want = _pandas_asof(probe_rows, build_rows, direction)
    assert got == want
