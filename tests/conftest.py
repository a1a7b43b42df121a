"""Shared fixtures: one SparkSession per test session, sf0.001 tables."""

from __future__ import annotations

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_schema_builder_spark.session import get_spark, load_tables  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="dbt-schema-builder-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            # static conf: must be set at session build (bucketed tables);
            # fresh dir per session — the in-memory catalog forgets tables
            # but their old locations would block saveAsTable
            "spark.sql.warehouse.dir": tempfile.mkdtemp(
                prefix="spark-warehouse-tests-"
            ),
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    return load_tables(spark, sf_dir)
