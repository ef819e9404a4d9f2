from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from d2b_dataframework_spark.core.session import get_session  # noqa: E402


@pytest.fixture(scope="session", params=["ansi_off", "ansi_on"])
def spark(request):
    """One JVM, two legs: the engine must be correct under either ANSI
    setting (the driver's harness runs Spark 4's default ANSI **on**,
    while get_session defaults it off for pandas-coerce semantics).
    ``ansi.enabled`` is a runtime conf, so both legs share the session.
    Set SPARK_GRAFT_ANSI_LEG=off to run the fast single-leg suite.
    """
    leg = os.environ.get("SPARK_GRAFT_ANSI_LEG")
    if leg and request.param != f"ansi_{leg}":
        pytest.skip(f"SPARK_GRAFT_ANSI_LEG={leg}")
    session = get_session(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "2g", "spark.sql.warehouse.dir": "/tmp/spark-tests-wh"},
    )
    session.conf.set("spark.sql.ansi.enabled", str(request.param == "ansi_on").lower())
    session.sparkContext.setLogLevel("ERROR")
    yield session


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
