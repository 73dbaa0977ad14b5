from luxo_rs_spark.functions.fnv1a import (
    FNV_OFFSET_BASIS,
    FNV_PRIME,
    fnv1a64_bytes_py,
    fnv1a64_col,
    register_fnv1a64,
)

__all__ = [
    "FNV_OFFSET_BASIS",
    "FNV_PRIME",
    "fnv1a64_bytes_py",
    "fnv1a64_col",
    "register_fnv1a64",
]
