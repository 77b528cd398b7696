from __future__ import annotations

import os

import pytest

from log_formatter_spark.session import get_spark

# sf0.001 keeps the suite fast; the driver's gate runs at sf0.01 — run
# `SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 pytest tests/test_contract.py`
# to replicate the gate at the driver's scale exactly.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lfs-tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
