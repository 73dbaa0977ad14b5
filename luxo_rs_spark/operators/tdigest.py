"""Mergeable t-digest quantile tables (SURVEY.md §2.2-D approx-sketch
extension) — the quantile analog of the HLL rollup in
``operators/sketch.py``.

Spark's built-in ``approx_percentile`` answers one query over one scan;
what a 100 TB rollup table needs is a STORED, MERGEABLE summary: build
one digest per (key, day) once, persist it as an ordinary column, and
answer any later percentile question at any coarser grain by merging
digests — never re-reading raw data. The digest here is Dunning's
merging t-digest (Dunning & Ertl, "Computing extremely accurate
quantiles using t-digests", 2019): centroids sorted by mean, chunked
under the k1 scale function k(q) = (δ/2π)·asin(2q−1), which bounds
centroid width ~q(1−q) — tight at the tails where p99/p999 live, loose
in the middle where accuracy is cheap.

Determinism: centroids are processed in (mean, weight) sort order and
all arithmetic is fixed-order numpy float64, so the same input rows
always produce the same digest — required for the driver's re-run
stability and for incremental==from-scratch assertions in tests.

Scale shape: stage 1 builds per-input-partition digests with
``mapInPandas`` (no shuffle of raw rows); stage 2 shuffles only the
δ-bounded centroid lists per key and merges them with
``applyInPandas``. The shuffle payload compresses from n rows to
O(δ) doubles per (key, partition) — that compression is the entire
point at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tdigest_table",
    "merge_tdigest_tables",
    "tdigest_rollup",
    "tdigest_quantiles",
]

#: digest storage layout: parallel arrays + bounds + total weight
DIGEST_FIELDS = (
    "means array<double>, weights array<double>, "
    "mn double, mx double, total double"
)


def _k(q: np.ndarray, delta: float) -> np.ndarray:
    return (delta / (2 * np.pi)) * np.arcsin(2 * q - 1)


def _k_inv(k: np.ndarray, delta: float) -> np.ndarray:
    return (np.sin(k * (2 * np.pi) / delta) + 1) / 2


def _merge_centroids(
    means: np.ndarray, weights: np.ndarray, delta: float
) -> tuple[np.ndarray, np.ndarray]:
    """Dunning's merging pass: one sorted sweep, chunk boundaries from
    the k1 scale function."""
    order = np.lexsort((weights, means))
    means, weights = means[order], weights[order]
    total = weights.sum()
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    q0 = 0.0  # cumulative quantile below the current chunk
    for m, w in zip(means[1:], weights[1:]):
        q_limit = float(_k_inv(_k(np.array([q0]), delta) + 1, delta)[0])
        if (q0 * total + cur_w + w) <= q_limit * total:
            cur_m += (m - cur_m) * (w / (cur_w + w))
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            q0 += cur_w / total
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.array(out_m), np.array(out_w)


def _digest_of(values: np.ndarray, delta: float) -> dict:
    """Vectorized initial build: for SORTED unit-weight values the
    merging pass reduces to clustering by floor(k(q)) — every value
    lands in the chunk its cumulative quantile maps to under the scale
    function, giving the same <=1 k-unit chunk-width guarantee as the
    sequential sweep with zero Python-per-value cost (np.add.reduceat
    over the chunk boundaries). The sequential ``_merge_centroids``
    pass is still used where inputs are weighted centroid lists (the
    merge path), whose size is O(delta), not O(n)."""
    values = values[~np.isnan(values)].astype(np.float64)
    n = len(values)
    if n == 0:
        return {
            "means": [], "weights": [], "mn": None, "mx": None, "total": 0.0
        }
    values = np.sort(values)
    q = (np.arange(n) + 0.5) / n
    cl = np.floor(_k(q, delta)).astype(np.int64)
    starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
    sums = np.add.reduceat(values, starts)
    counts = np.diff(np.r_[starts, n]).astype(np.float64)
    return {
        "means": list(sums / counts),
        "weights": list(counts),
        "mn": float(values[0]),
        "mx": float(values[-1]),
        "total": float(n),
    }


def tdigest_table(
    df: DataFrame,
    keys: list[str],
    col: str,
    delta: float = 100.0,
) -> DataFrame:
    """Finest-granularity digest table: one t-digest of ``col`` per
    ``keys`` group. Two-level build — per-partition partial digests
    (mapInPandas, raw rows never shuffle) merged per key
    (applyInPandas over δ-bounded centroid lists)."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema
    ) + ", " + DIGEST_FIELDS

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for kv, grp in pdf.groupby(keys, sort=True, dropna=False):
                kv = kv if isinstance(kv, tuple) else (kv,)
                d = _digest_of(grp[col].to_numpy(), delta)
                rows.append(dict(zip(keys, kv)) | d)
            if rows:
                yield pd.DataFrame(rows)

    partial = df.select(*keys, col).mapInPandas(partials, schema)
    return _merge_digest_rows(partial, keys, delta, schema)


def _merge_digest_rows(
    digests: DataFrame, keys: list[str], delta: float, schema: str
) -> DataFrame:
    def merge(kv: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        means: list[np.ndarray] = []
        weights: list[np.ndarray] = []
        mn, mx, total = np.inf, -np.inf, 0.0
        for _, r in pdf.iterrows():
            if r["total"] and len(r["means"]):
                means.append(np.asarray(r["means"], dtype=np.float64))
                weights.append(np.asarray(r["weights"], dtype=np.float64))
                mn, mx = min(mn, r["mn"]), max(mx, r["mx"])
                total += r["total"]
        if total == 0:
            d = {"means": [], "weights": [], "mn": None, "mx": None,
                 "total": 0.0}
        else:
            m, w = _merge_centroids(
                np.concatenate(means), np.concatenate(weights), delta
            )
            d = {"means": list(m), "weights": list(w), "mn": float(mn),
                 "mx": float(mx), "total": float(total)}
        return pd.DataFrame([dict(zip(keys, kv)) | d])

    return digests.groupBy(*keys).applyInPandas(merge, schema)


def merge_tdigest_tables(
    snapshot: DataFrame,
    delta_tbl: DataFrame,
    keys: list[str],
    delta: float = 100.0,
) -> DataFrame:
    """Merge two digest tables (same layout) — the incremental rollup /
    coarser-grain primitive: union the centroid lists per key and
    re-run the merging pass. Input and output are both δ-bounded, so
    repeated merging cannot grow the summary."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in snapshot.select(*keys).schema
    ) + ", " + DIGEST_FIELDS
    return _merge_digest_rows(
        snapshot.unionByName(delta_tbl), keys, delta, schema
    )


def tdigest_quantiles(
    table: DataFrame,
    qs: list[float],
    out_prefix: str = "p",
) -> DataFrame:
    """Evaluate quantiles from the stored digests (no raw data): linear
    interpolation between centroid midpoints, clamped to the exact
    [mn, mx] kept in the digest."""

    @F.pandas_udf("array<double>")
    def qeval(
        means: pd.Series, weights: pd.Series, mns: pd.Series,
        mxs: pd.Series, totals: pd.Series,
    ) -> pd.Series:
        out = []
        for m, w, mn, mx, total in zip(means, weights, mns, mxs, totals):
            if not total or not len(m):
                out.append([None] * len(qs))
                continue
            m = np.asarray(m); w = np.asarray(w)
            # centroid midpoints in cumulative-weight space
            cum = np.cumsum(w) - w / 2
            xs = np.concatenate(([0.0], cum, [total]))
            ys = np.concatenate(([mn], m, [mx]))
            ranks = np.array(qs) * total
            out.append(list(np.interp(ranks, xs, ys)))
        return pd.Series(out)

    evaled = table.withColumn(
        "__qs", qeval("means", "weights", "mn", "mx", "total")
    )
    picks = [
        F.element_at("__qs", i + 1).alias(
            f"{out_prefix}{str(q).replace('0.', '').ljust(2, '0')}"
        )
        for i, q in enumerate(qs)
    ]
    keep = [c for c in table.columns
            if c not in {"means", "weights", "mn", "mx", "total"}]
    return evaled.select(
        *keep, F.col("total").cast("bigint").alias("n"), *picks
    )


def tdigest_rollup(
    table: DataFrame,
    keys: list[str],
    delta: float = 100.0,
) -> DataFrame:
    """Roll a digest table up to coarser ``keys`` by merging the stored
    centroid lists — the quantile twin of ``sketch.hll_rollup``: any
    later percentile question at any grain, without raw data."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in table.select(*keys).schema
    ) + ", " + DIGEST_FIELDS
    return _merge_digest_rows(table, keys, delta, schema)
