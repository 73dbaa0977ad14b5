"""Driver-replica correctness gate.

Mimics the driver's t2 comparison more faithfully than tests/test_oracle.py:
- a FOREIGN SparkSession (no Engine defaults, America/New_York JVM tz) to
  prove queries don't depend on our session conf;
- sf0.01 (the driver's scale) by default;
- column-name-sorted, row-sorted exact value compare.

Usage: python tools/replica_check.py [query_substr ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
from pyspark.sql import SparkSession


def main() -> int:
    sf_dir = os.environ.get("REPLICA_SF_DIR", "/root/testdata/sf0.01")
    pats = sys.argv[1:]
    # 8 threads matches the driver's t2 box at sf0.01; the sf1 gate
    # (REPLICA_SF_DIR one decade up) overrides via REPLICA_CPUS
    cpus = os.environ.get("REPLICA_CPUS", "8")

    spark = (
        SparkSession.builder.appName("replica")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        # default 1g heap OOMs at sf1; a higher CAP is free at sf0.01
        .config(
            "spark.driver.memory",
            os.environ.get("REPLICA_DRIVER_MEM", "8g"),
        )
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=America/New_York")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    from luxo_rs_spark.plans.oracle import (  # noqa: PLC0415
        ORACLE_SQL,
        install_precomputed_oracles,
    )
    from luxo_rs_spark.plans.queries import QUERIES  # noqa: PLC0415

    install_precomputed_oracles()  # lazy q367/q380 VALUES oracles
    from luxo_rs_spark.sources.registry import TABLES  # noqa: PLC0415

    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM '{sf_dir}/{name}.parquet'"
        )

    names = [
        n
        for n in sorted(ORACLE_SQL)
        if not pats or any(p in n for p in pats)
    ]
    failed = []
    for name in names:
        try:
            a = QUERIES[name](spark, sf_dir).toPandas()
            b = con.sql(ORACLE_SQL[name]).df()
            a = a[sorted(a.columns)].sort_values(by=sorted(a.columns)).reset_index(drop=True)
            b = b[sorted(b.columns)].sort_values(by=sorted(b.columns)).reset_index(drop=True)
            assert list(a.columns) == list(b.columns), "columns differ"
            assert len(a) == len(b), f"rows {len(a)} vs {len(b)}"
            for col in a.columns:
                for i, (x, y) in enumerate(zip(a[col].tolist(), b[col].tolist())):
                    if (
                        isinstance(x, float)
                        and isinstance(y, float)
                        and math.isnan(x)
                        and math.isnan(y)
                    ):
                        continue
                    ok = (
                        abs(x - y) <= 1e-9
                        if isinstance(x, float) and isinstance(y, float)
                        else str(x) == str(y)
                    )
                    assert ok, f"{col}[{i}]: {x!r} != {y!r}"
            print(f"OK    {name}")
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: {e}")
    print(f"{len(names) - len(failed)}/{len(names)} matched")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
