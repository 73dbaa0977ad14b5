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
    tolerance: str | int | float | None = None,
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
    tolerance   : optional max staleness: an INTERVAL string (e.g.
                  ``'30 days'``, for timestamp time columns) or a number
                  (same units as the time columns). A match further than
                  this from the probe time is discarded (payload
                  nulled) — pandas ``merge_asof(tolerance=...)``
                  semantics. Applied as a post-window mask, so it adds
                  zero shuffles.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: bad direction {direction!r}")
    payload = payload or {build_time: "asof_time"}
    if tolerance is not None:
        # carry the matched build time so the staleness mask can see it
        payload = {**payload, build_time: payload.get(build_time, "__mt")}

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
        "__probe", F.col("__t").alias("__pt"), *[c for c in probe.columns], *picker
    ).filter(F.col("__probe") == 1)

    if tolerance is not None:
        mt = payload[build_time]
        gap = (
            F.col("__pt") - F.col(mt)
            if direction == "backward"
            else F.col(mt) - F.col("__pt")
        )
        tol = (
            F.expr(f"INTERVAL {tolerance}")
            if isinstance(tolerance, str)
            else F.lit(tolerance)
        )
        in_tol = F.col(mt).isNotNull() & (gap <= tol)
        user_cols = [c for c in out_cols if c != "__mt"]
        matched = matched.select(
            *probe.columns,
            *[F.when(in_tol, F.col(c)).alias(c) for c in user_cols],
        )
        return matched
    return matched.select(*probe.columns, *out_cols)
