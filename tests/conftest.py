from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from etl_ecommerce_data_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def oracle_con():
    from etl_ecommerce_data_spark.testing import duckdb_connection

    con = duckdb_connection(SF_SMOKE)
    yield con
    con.close()
