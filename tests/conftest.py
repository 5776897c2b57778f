from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("engine-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle_normalize():
    """The gate's own dataframe normalizer (tools/check_oracle.normalize),
    shared by every cross-engine parity test so the comparison contract
    lives in exactly one place."""
    tools_dir = os.path.join(os.path.dirname(__file__), "..", "tools")
    if tools_dir not in sys.path:
        sys.path.insert(0, tools_dir)
    from check_oracle import normalize

    return normalize
