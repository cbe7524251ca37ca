"""Shared pytest fixtures: one small local SparkSession for the suite."""

from __future__ import annotations

import pytest

from data_warehousing_assignment_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "pytest",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.execution.arrow.pyspark.enabled": "true"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


SF_SMALL = "/root/testdata/sf0.001"
