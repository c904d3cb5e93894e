from __future__ import annotations

import duckdb
import pytest

from demo_segmenter_spark.session import get_spark
from demo_segmenter_spark.sources.tables import TABLES

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus="4", shuffle_partitions=4, driver_memory="4g")
    yield s


@pytest.fixture(scope="session")
def ddb():
    """DuckDB connection with the same views the driver pre-registers."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()
