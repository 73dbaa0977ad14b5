from __future__ import annotations

import duckdb
import pytest

from luxo_rs_spark.engine import Engine
from luxo_rs_spark.sources.registry import TABLES

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_001 = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def engine() -> Engine:
    # local[8]: test jobs are tiny, so wall time is scheduling waves,
    # not compute — 8 cores run a default 8-partition shuffle in ONE
    # wave (measured ~15% off the suite vs local[4] on this 32-cpu box)
    eng = Engine(
        app_name="luxo-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_confs={"spark.ui.enabled": "false"},
    )
    yield eng
    eng.spark.stop()


@pytest.fixture(scope="session")
def spark(engine):
    return engine.spark


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Replicates the driver's oracle setup: one view per fixture table."""
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


@pytest.fixture(scope="session")
def oracle():
    con = duckdb_con(SF_DIR)
    yield con
    con.close()
