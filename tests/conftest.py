from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from d2b_dataframework_spark.core.session import get_session  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "single_leg: ANSI-independent test — runs only on the ansi_off "
        "spark leg (connector/auth/sink/streaming logic whose behavior "
        "cannot depend on spark.sql.ansi.enabled); expression-level "
        "tests must NOT use this marker",
    )


def pytest_collection_modifyitems(config, items):
    """Deselect the ansi_on duplicate of tests marked single_leg: the
    dual-leg spark fixture doubles every test, but ANSI only changes
    SQL expression semantics — fake-transport connector logic, auth
    state machines, file-sink behavior and microbatch bookkeeping are
    identical on both legs, and re-running them costs ~half the suite
    wall-time for zero coverage."""
    deselected, remaining = [], []
    for item in items:
        cs = getattr(item, "callspec", None)
        if (
            item.get_closest_marker("single_leg")
            and cs is not None
            and cs.params.get("spark") == "ansi_on"
        ):
            deselected.append(item)
        else:
            remaining.append(item)
    if deselected:
        config.hook.pytest_deselected(items=deselected)
        items[:] = remaining


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
    # per-process warehouse dir so several pytest processes can run
    # concurrently (tools/fast_suite.sh) without metastore collisions
    session = get_session(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "2g",
            "spark.sql.warehouse.dir": f"/tmp/spark-tests-wh-{os.getpid()}",
        },
    )
    session.conf.set("spark.sql.ansi.enabled", str(request.param == "ansi_on").lower())
    session.sparkContext.setLogLevel("ERROR")
    yield session


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
