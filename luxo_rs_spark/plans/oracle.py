"""DuckDB oracle SQL for every oracle-checkable query in QUERIES.

Keys match ``luxo_rs_spark.plans.queries.QUERIES``. The driver registers
the fixture parquet files as views named region/nation/customer/supplier/
part/orders/lineitem/events/documents/embeddings, then hash-compares
each query's result with ours (column names sorted before hashing, so
aliases must match exactly).

Queries implemented with semantics DuckDB cannot express (seeded fnv1a64
hashing, LSH signatures) are intentionally absent — the driver records a
rows-only check for those and Spark-internal tests pin their semantics.
"""

ORACLE_SQL: dict[str, str] = {}

ORACLE_SQL["q01_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                            AS sum_qty,
       round(sum(l_extendedprice), 2)                                       AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                    AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)      AS sum_charge,
       round(avg(l_quantity), 2)                                            AS avg_qty,
       round(avg(l_extendedprice), 2)                                       AS avg_price,
       round(avg(l_discount), 2)                                            AS avg_disc,
       count(*)                                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
