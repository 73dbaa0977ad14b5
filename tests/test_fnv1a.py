"""Golden-vector tests G1-G8 for fnv1a64 (FIXTURES.md §3).

Vectors taken verbatim from the reference's unit tests
(/root/reference/src/algo/fnv1a.rs:97-171) — the only bit-exact
behavioral contract the reference defines.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from luxo_rs_spark.functions.fnv1a import (
    FNV_OFFSET_BASIS,
    fnv1a64_bool_py,
    fnv1a64_bytes_py,
    fnv1a64_col,
    fnv1a64_int_py,
)

MASK = 0xFFFFFFFFFFFFFFFF


# -- G1-G8 on the scalar python core ----------------------------------------

def test_g1_fresh_state_is_offset_basis():
    assert fnv1a64_bytes_py(b"") == 0xCBF29CE484222325


def test_g2_seeded_init():
    assert fnv1a64_bytes_py(b"", seed=1337) == 1337


def test_g3_g4_int32_1337():
    # i32 and u32 hash identically via LE bytes (fnv1a.rs:118-134)
    assert fnv1a64_int_py(1337, 4) == 0x9358F934873276DB


def test_g5_g6_int64_1337():
    assert fnv1a64_int_py(1337, 8) == 0x41FF8641D035260B


def test_g7_bool_false():
    assert fnv1a64_bool_py(False) == 0x4B91CD1C0E0A959C


def test_g8_bytes_deadbeef():
    assert fnv1a64_bytes_py(b"deadbeef") == 0xCD4F3B6F56D93515


# -- same vectors through the vectorized pandas UDF on Spark -----------------

@pytest.fixture(scope="module")
def hashed(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "s": ["deadbeef", "", None],
                "i": [1337, 0, None],
                "l": [1337, 0, None],
                "b": [False, True, None],
            }
        ).astype({"i": "Int32", "l": "Int64", "b": "boolean"})
    )
    out = df.select(
        fnv1a64_col("s").alias("hs"),
        fnv1a64_col("i", kinds=("int",)).alias("hi"),
        fnv1a64_col("l", kinds=("long",)).alias("hl"),
        fnv1a64_col("b", kinds=("boolean",)).alias("hb"),
        fnv1a64_col("s", "i", kinds=("string", "int")).alias("chained"),
    ).collect()
    return out


def test_udf_golden_vectors(hashed):
    row = hashed[0]
    assert row.hs & MASK == 0xCD4F3B6F56D93515
    assert row.hi & MASK == 0x9358F934873276DB
    assert row.hl & MASK == 0x41FF8641D035260B
    assert row.hb & MASK == 0x4B91CD1C0E0A959C


def test_udf_empty_string_is_offset_basis(hashed):
    assert hashed[1].hs & MASK == FNV_OFFSET_BASIS


def test_udf_null_propagates(hashed):
    row = hashed[2]
    assert row.hs is None and row.hi is None
    assert row.hl is None and row.hb is None
    assert row.chained is None


def test_udf_chaining_matches_scalar_composition(hashed):
    # composite key = hash bytes of field1 then field2 (fnv1a.rs:9-11)
    state = fnv1a64_bytes_py(b"deadbeef")
    expected = fnv1a64_int_py(1337, 4, seed=state)
    assert hashed[0].chained & MASK == expected


def test_sql_registration(engine):
    row = engine.sql(
        "SELECT fnv1a64('deadbeef') AS h, fnv1a64_long(1337l) AS hl"
    ).collect()[0]
    assert row.h & MASK == 0xCD4F3B6F56D93515
    assert row.hl & MASK == 0x41FF8641D035260B
