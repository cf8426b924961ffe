from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

# Activate the pure-Python protobuf shim (compat/purepb) BEFORE any
# SparkSession exists: the transformWithState state client runs in
# JVM-spawned python workers that inherit the driver environment, so
# PYTHONPATH must carry the shim before the JVM starts. A no-op when a
# real google.protobuf is installed.
from real_time_big_data_analytics_spark.compat import (  # noqa: E402
    enable_protobuf_shim,
)

enable_protobuf_shim()


@pytest.fixture(scope="session")
def spark():
    from real_time_big_data_analytics_spark.session import get_spark

    s = get_spark("rtba-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
