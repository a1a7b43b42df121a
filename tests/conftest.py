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


# r14 fast/slow gate split (see pytest.ini): the modules below are the
# hypothesis/differential/property/probe tiers — the ~55 min of the
# suite that outgrew the round driver's pytest budget. Marked centrally
# here (one place to audit) instead of per-file pytestmark lines. The
# default run (`pytest tests/`) excludes them via pytest.ini addopts;
# the builder's round-end certification runs the FULL suite with
# `-m "slow or not slow"`. Membership rule: a module goes here iff it
# is dominated by random-corpus/hypothesis differentials or subprocess
# probe sweeps; every fixed-shape parity test, the driver-mimicking
# oracle gate (test_oracle_parity), the window audit, plan pins, the
# vanilla-session gate and the manifest check stay in the fast gate.
SLOW_MODULES = {
    "test_analytics_properties",
    "test_config_differentials",
    "test_degenerate_gate",
    "test_embedding_differentials",
    "test_events_differentials",
    "test_line_dedup",
    "test_llm_ops_properties",
    "test_partition_invariance",
    "test_policy_properties",
    "test_privacy",
    "test_tpch_differentials",
    "test_urls",
    "test_warc",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
