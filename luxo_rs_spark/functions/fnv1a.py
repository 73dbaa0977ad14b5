"""Reference-exact FNV-1a 64-bit hash as a vectorized pandas UDF.

This is the ONE reference behavior replicated bit-for-bit (SURVEY.md §0
item 3). Semantics pinned by the reference (`/root/reference/src/algo/
fnv1a.rs`, cited per rule):

- offset basis ``0xcbf29ce484222325`` (fnv1a.rs:15), prime
  ``0x100000001b3`` (fnv1a.rs:18)
- per byte: ``state ^= byte; state = state.wrapping_mul(prime)``
  (fnv1a.rs:38-41; the u128-widening multiply truncates to u64, which is
  exactly numpy uint64 wrapping multiplication)
- seeded construction ``create_init(seed)`` starts the state at ``seed``
  (fnv1a.rs:26-28) — used by the MinHash permutation family
- typed appenders: bool hashes as i32 1231/1237 (Java Boolean.hashCode,
  fnv1a.rs:44-53); byte slices byte-wise (fnv1a.rs:55-64); 32/64-bit ints
  via little-endian bytes (fnv1a.rs:68-95)
- chaining: composite keys hash by concatenating field byte streams in
  order (fnv1a.rs:9-11 — `iterate` returns the hasher)

Golden vectors G1-G8 from the reference's unit tests (fnv1a.rs:97-171)
are enforced in ``tests/test_fnv1a.py``.

Execution model: row-at-a-time Python UDFs would serialize every row
through the Python worker; instead the hash is computed over Arrow
batches in numpy uint64, vectorized ACROSS rows (one pass per byte
position, all rows at once). That keeps the per-row Python cost ~zero and
scales linearly with bytes, matching SURVEY.md §4.3's do-not-port note.
Spark's own engine-internal hashing (shuffles, hash agg/join) remains
Murmur3/xxHash64 — fnv1a64 is a user-facing function, not a replacement
for Spark internals (SURVEY.md §2.1 R4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

FNV_OFFSET_BASIS = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3

_U64_OFFSET = np.uint64(FNV_OFFSET_BASIS)
_U64_PRIME = np.uint64(FNV_PRIME)
_MASK64 = 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# pure-python scalar core (used by tests and driver-side helpers)
# ---------------------------------------------------------------------------

def fnv1a64_bytes_py(data: bytes, seed: int = FNV_OFFSET_BASIS) -> int:
    """Scalar FNV-1a over a byte string; returns the u64 state."""
    state = seed & _MASK64
    for b in data:
        state = ((state ^ b) * FNV_PRIME) & _MASK64
    return state


def fnv1a64_int_py(value: int, nbytes: int, seed: int = FNV_OFFSET_BASIS) -> int:
    """Scalar FNV-1a over an integer's little-endian bytes."""
    data = (value & ((1 << (8 * nbytes)) - 1)).to_bytes(nbytes, "little")
    return fnv1a64_bytes_py(data, seed)


def fnv1a64_bool_py(value: bool, seed: int = FNV_OFFSET_BASIS) -> int:
    """Scalar FNV-1a over a bool (i32 1231/1237, fnv1a.rs:48-51)."""
    return fnv1a64_int_py(1231 if value else 1237, 4, seed)


# ---------------------------------------------------------------------------
# vectorized numpy core
# ---------------------------------------------------------------------------

def _hash_bytes_batch(states: np.ndarray, values, valid: np.ndarray) -> np.ndarray:
    """Fold a column of byte strings into per-row states.

    Vectorized across rows, one xor-mul step per byte *position*. Rows
    are sorted by length (desc) first so each position's update touches
    only the still-active prefix: total work is sum(len) byte-ops —
    linear in scanned bytes — instead of n_rows x max_len. Matters when
    one long outlier row would otherwise stretch every row's loop.
    """
    n = len(values)
    lens = np.zeros(n, dtype=np.int64)
    bufs = [b""] * n
    for i, v in enumerate(values):
        if valid[i] and v is not None:
            bufs[i] = v
            lens[i] = len(v)
    maxlen = int(lens.max()) if n else 0
    if maxlen == 0:
        return states
    order = np.argsort(-lens, kind="stable")
    lens_s = lens[order]
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    for row, src in enumerate(order):
        if lens_s[row]:
            mat[row, : lens_s[row]] = np.frombuffer(bufs[src], dtype=np.uint8)
    st = states[order].copy()
    for pos in range(maxlen):
        k = int(np.searchsorted(-lens_s, -(pos + 1), side="right"))
        if k == 0:
            break
        st[:k] = (st[:k] ^ mat[:k, pos].astype(np.uint64)) * _U64_PRIME
    out = np.empty_like(states)
    out[order] = st
    return out


def _hash_int_batch(
    states: np.ndarray, values: np.ndarray, nbytes: int
) -> np.ndarray:
    """Fold an integer column (LE bytes, fnv1a.rs:70-73) into states."""
    v = values.astype(np.int64).view(np.uint64)
    for k in range(nbytes):
        byte = (v >> np.uint64(8 * k)) & np.uint64(0xFF)
        states = (states ^ byte) * _U64_PRIME
    return states


def _fold_series(states: np.ndarray, s: pd.Series, kind: str, valid: np.ndarray) -> np.ndarray:
    if kind == "string":
        vals = [x.encode("utf-8") if isinstance(x, str) else x for x in s]
        return _hash_bytes_batch(states, vals, valid)
    if kind == "binary":
        return _hash_bytes_batch(states, [bytes(x) if x is not None else None for x in s], valid)
    if kind in ("int", "long"):
        nbytes = 4 if kind == "int" else 8
        filled = s.fillna(0).to_numpy()
        nxt = _hash_int_batch(states, filled, nbytes)
        return np.where(valid, nxt, states)
    if kind == "boolean":
        as_int = np.where(s.fillna(False).to_numpy().astype(bool), 1231, 1237)
        nxt = _hash_int_batch(states, as_int, 4)
        return np.where(valid, nxt, states)
    raise ValueError(f"fnv1a64: unsupported column kind {kind!r}")


def _make_udf(kinds: tuple[str, ...], seed: int):
    """Build a pandas UDF chaining `kinds`-typed columns (fnv1a.rs:9-11)."""

    @pandas_udf("long")
    def fnv1a64_udf(*cols: pd.Series) -> pd.Series:
        n = len(cols[0])
        states = np.full(n, np.uint64(seed & _MASK64), dtype=np.uint64)
        # SQL semantics: NULL in any key field -> NULL hash
        valid = np.ones(n, dtype=bool)
        for s in cols:
            valid &= ~s.isna().to_numpy()
        for s, kind in zip(cols, kinds):
            states = _fold_series(states, s, kind, valid)
        signed = states.view(np.int64)
        return pd.Series(signed, dtype="int64").mask(~valid)

    return fnv1a64_udf


_KIND_FOR_SPARK_TYPE = {
    "string": "string",
    "binary": "binary",
    "int": "int",
    "integer": "int",
    "bigint": "long",
    "long": "long",
    "boolean": "boolean",
}


def fnv1a64_col(*cols: Column | str, kinds: tuple[str, ...] = ("string",), seed: int = FNV_OFFSET_BASIS) -> Column:
    """Column expression: chained FNV-1a 64 over the given columns.

    ``kinds`` gives the reference-typed appender for each column
    (string | binary | int | long | boolean). Returns LongType — the
    two's-complement reinterpretation of the u64 state (mask with
    ``& 0xFFFFFFFFFFFFFFFF`` to compare against reference constants).
    """
    kinds = tuple(_KIND_FOR_SPARK_TYPE[k] for k in kinds)
    if len(kinds) != len(cols):
        raise ValueError("fnv1a64_col: one kind per column required")
    udf = _make_udf(kinds, seed)
    return udf(*[F.col(c) if isinstance(c, str) else c for c in cols])


def register_fnv1a64(spark: SparkSession) -> None:
    """Register SQL-callable variants: fnv1a64 (string), fnv1a64_binary,
    fnv1a64_long, fnv1a64_int, fnv1a64_bool."""
    spark.udf.register("fnv1a64", _make_udf(("string",), FNV_OFFSET_BASIS))
    spark.udf.register("fnv1a64_binary", _make_udf(("binary",), FNV_OFFSET_BASIS))
    spark.udf.register("fnv1a64_long", _make_udf(("long",), FNV_OFFSET_BASIS))
    spark.udf.register("fnv1a64_int", _make_udf(("int",), FNV_OFFSET_BASIS))
    spark.udf.register("fnv1a64_bool", _make_udf(("boolean",), FNV_OFFSET_BASIS))
