"""Z-order layout tests (functions/zorder.py): the Morton interleave is
bit-exact vs a Python reference, and a z-ordered parquet write actually
bounds BOTH dimensions per row group — the min-max-stat locality that
makes data skipping work on either predicate column at scale.
"""

from __future__ import annotations

import shutil
import uuid

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from luxo_rs_spark.functions.zorder import z2, z2_sql
from luxo_rs_spark.sources.registry import load_table

from conftest import SF_DIR


def _z_ref(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_z2_matches_python_reference(spark):
    cases = [(0, 0), (1, 0), (0, 1), (5, 3), (255, 255), (170, 85)]
    df = spark.createDataFrame(cases, "a INT, b INT")
    got = (
        df.select("a", "b", z2(F.col("a"), F.col("b"), bits=8).alias("z"))
        .orderBy("a", "b")
        .collect()
    )
    for row in got:
        assert row.z == _z_ref(row.a, row.b, 8), (row.a, row.b)


def test_z2_sql_matches_z2(spark):
    df = spark.createDataFrame([(i, 50 - i) for i in range(51)], "a INT, b INT")
    df.createOrReplaceTempView("zt")
    sql = spark.sql(f"SELECT a, b, {z2_sql('a', 'b', 8)} AS z FROM zt")
    fluent = df.select("a", "b", z2(F.col("a"), F.col("b"), 8).alias("z"))
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, fluent.collect()))


def test_zorder_write_bounds_both_dims(spark):
    """After a z-ordered repartitionByRange + sortWithinPartitions write,
    every parquet row group must cover a small fraction of BOTH value
    domains — whereas a single-column sort scatters the other column
    across its full range."""
    part = load_table(spark, SF_DIR, "part").select(
        F.col("p_size").cast("bigint").alias("sz"),
        F.floor(F.col("p_retailprice") / 100.0).cast("bigint").alias("pb"),
    )
    z = z2(F.col("sz"), F.col("pb"), bits=8)
    path = f"/root/repo/.tmp/zorder_{uuid.uuid4().hex[:8]}"
    try:
        (
            part.repartitionByRange(8, z)
            .sortWithinPartitions(z)
            .write.mode("overwrite")
            .parquet(path)
        )
        frs = []
        import glob

        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                stats = {
                    g.column(i).path_in_schema: g.column(i).statistics
                    for i in range(g.num_columns)
                }
                frs.append(
                    (
                        stats["sz"].max - stats["sz"].min,
                        stats["pb"].max - stats["pb"].min,
                    )
                )
        assert len(frs) >= 4  # enough granules for the claim to mean anything
        # global ranges: sz 1..50 (span 49), pb ~9..~20 (span >= 8)
        avg_sz = sum(r[0] for r in frs) / len(frs)
        avg_pb = sum(r[1] for r in frs) / len(frs)
        assert avg_sz < 49 * 0.8, f"sz not clustered: avg span {avg_sz}"
        assert avg_pb < 12 * 0.8, f"pb not clustered: avg span {avg_pb}"
    finally:
        shutil.rmtree(path, ignore_errors=True)
