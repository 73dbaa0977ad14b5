from luxo_rs_spark.plans.queries import QUERIES
from luxo_rs_spark.plans.oracle import ORACLE_SQL

__all__ = ["QUERIES", "ORACLE_SQL"]
