"""As-of join: for each probe row, the latest build row not exceeding it.

This is exactly the reference's ``greatest_not_exceeding`` floor search
(reference src/algo/search.rs:51-80 — "index of the greatest element
<= needle") lifted from a sorted in-memory slice to a distributed join:
per key, per probe timestamp, find the greatest build timestamp <= the
probe's and carry its payload.

Spark has no native as-of join, so we use the union + running-``last``
window formulation (SURVEY.md §2.2-C):

1. project build rows to  (key, t, payload..., is_probe=0)
2. project probe rows to  (key, t, NULL payload, is_probe=1)
3. union, then per key ordered by (t, is_probe):
   ``last(payload, ignorenulls=True) OVER (... ROWS UNBOUNDED PRECEDING)``
4. keep probe rows: each now carries the floor-match payload.

Probes sort AFTER builds at equal t (is_probe tiebreak), giving the
inclusive (<=) floor semantics of the reference (search.rs:63-66 returns
the exact match when the needle exists).

Scale notes (100 TB): this is ONE shuffle of (build ∪ probe) on the key
— the same cost as the shuffled join you cannot avoid — followed by an
in-partition sort; no per-row Python, no driver collect. Window
partition = key, so skew in a hot key is the hazard; mitigate upstream
with AQE skew handling or key salting when the build side is static per
salt. For the broadcast-able case (small build side) a range-join +
``max_by`` formulation would also work, but the window form is one
generic plan that survives both shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_time: str,
    build_time: str,
    payload: dict[str, str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join `probe` against `build`.

    Parameters
    ----------
    on          : equality key column name (must exist in both sides,
                  or pass pre-renamed frames)
    probe_time  : probe-side event-time column
    build_time  : build-side event-time column
    payload     : {build_col: out_col} columns to carry from the matched
                  build row; default carries `build_time` as `asof_time`
    direction   : 'backward' (greatest build_time <= probe_time, the
                  reference floor-search semantics) or 'forward'
                  (least build_time > probe_time, the reference
                  successor search, src/algo/search.rs:96-124)
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: bad direction {direction!r}")
    payload = payload or {build_time: "asof_time"}

    out_cols = list(payload.values())
    b = build.select(
        F.col(on).alias("__k"),
        F.col(build_time).alias("__t"),
        F.lit(0).alias("__probe"),
        *[F.col(src).alias(dst) for src, dst in payload.items()],
    )
    p = probe.select(
        F.col(on).alias("__k"),
        F.col(probe_time).alias("__t"),
        F.lit(1).alias("__probe"),
        *[F.lit(None).cast(b.schema[dst].dataType).alias(dst) for dst in out_cols],
        *[F.col(c) for c in probe.columns],
    )
    b = b.select(*p.columns[:3], *out_cols)  # align for unionByName
    u = b.unionByName(p, allowMissingColumns=True)

    if direction == "backward":
        # probes after builds at equal t => inclusive floor (<=)
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__t").asc(), F.col("__probe").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picker = [F.last(c, ignorenulls=True).over(w).alias(c) for c in out_cols]
    else:
        # builds BEFORE probes at equal t, so an equal-t build falls
        # outside the probe's [current, following) frame => strict
        # successor (>), matching the reference's next_largest
        # (src/algo/search.rs:96-124: first element > needle, None when
        # needle >= max)
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__t").asc(), F.col("__probe").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        picker = [F.first(c, ignorenulls=True).over(w).alias(c) for c in out_cols]

    matched = u.select(
        "__probe", *[c for c in probe.columns], *picker
    ).filter(F.col("__probe") == 1)
    return matched.select(*probe.columns, *out_cols)
