from luxo_rs_spark.operators.asof import asof_join
from luxo_rs_spark.operators.rank import (
    global_lead,
    global_ntile,
    global_row_number,
    global_running_sum,
)
from luxo_rs_spark.operators.skew import salted_agg_count, salted_join, with_salt
from luxo_rs_spark.operators.topk import top_k, top_k_per_group

__all__ = [
    "asof_join",
    "global_lead",
    "global_ntile",
    "global_row_number",
    "global_running_sum",
    "salted_agg_count",
    "salted_join",
    "top_k",
    "top_k_per_group",
    "with_salt",
]
