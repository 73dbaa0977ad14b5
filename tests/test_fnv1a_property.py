"""Property-based tests (hypothesis) for the reference-exact fnv1a64
kernels: the vectorized numpy batch paths must agree with the scalar
Python fold for ALL inputs, not just the golden vectors — in
particular across the length-sorted byte-matrix path in
_hash_bytes_batch (reference semantics: src/algo/fnv1a.rs:38-41 byte
fold, :68-95 LE int appenders, :9-11 chaining)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from luxo_rs_spark.functions.fnv1a import (
    FNV_OFFSET_BASIS,
    _hash_bytes_batch,
    _hash_int_batch,
    fnv1a64_bytes_py,
    fnv1a64_int_py,
)

_U64_OFFSET = np.uint64(FNV_OFFSET_BASIS)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=64), min_size=1, max_size=40))
def test_bytes_batch_equals_scalar(vals):
    states = np.full(len(vals), _U64_OFFSET, dtype=np.uint64)
    got = _hash_bytes_batch(states, vals, np.ones(len(vals), dtype=bool))
    want = [fnv1a64_bytes_py(v) for v in vals]
    assert [int(x) for x in got] == want


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=40,
    )
)
def test_long_batch_equals_scalar(vals):
    states = np.full(len(vals), _U64_OFFSET, dtype=np.uint64)
    got = _hash_int_batch(states, np.array(vals, dtype=np.int64), 8)
    want = [fnv1a64_int_py(v, 8) for v in vals]
    assert [int(x) for x in got] == want


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=32), st.binary(min_size=0, max_size=32))
def test_chaining_is_concatenation(a, b):
    # reference chaining (fnv1a.rs:9-11): hashing a then b from a's
    # state == hashing the concatenated byte stream
    chained = fnv1a64_bytes_py(b, seed=fnv1a64_bytes_py(a))
    assert chained == fnv1a64_bytes_py(a + b)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_i32_u32_agree(v):
    # the reference's own tests pin that 1337i32 and 1337u32 hash
    # identically (fnv1a.rs:118-134) — holds for every non-negative i32
    assert fnv1a64_int_py(v, 4) == fnv1a64_int_py(v & 0xFFFFFFFF, 4)
