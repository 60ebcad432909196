import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdf2hk_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # AQE off for the test session: per-shuffle re-planning is pure driver
    # latency on fixture-sized data and nearly doubled suite wall time. AQE
    # behavior itself is exercised by bench.py, the scaling sweep and the
    # driver's own CORRECTNESS session (which configures its own SparkSession).
    # Test-session perf posture (correctness-identical, latency-oriented):
    # AQE off (per-shuffle re-planning is pure driver latency on fixture-sized
    # data), whole-stage codegen off (janino compiles 64KB+ methods for the
    # term kernel and then falls back to interpreted anyway), few shuffle
    # partitions. Production behavior (AQE, codegen, partition sizing) is
    # exercised by bench.py, the scaling sweep and the driver's own session.
    extra = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.codegen.wholeStage": "false",
        "spark.sql.codegen.factoryMode": "NO_CODEGEN",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_TEST_SHUFFLE", "4"
        ),
    }
    s = get_spark(
        app="rdf2hk_spark_tests",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
        extra=extra,
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
