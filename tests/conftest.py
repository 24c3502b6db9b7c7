from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("XORQ_SPARK_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "gated: surfaces blocked on an absent environment dependency "
        "(jar/wheel); each test XFAILs with the missing dependency "
        "named when it is absent and runs the real surface when "
        "present — `pytest -m gated` lists the env-blocked perimeter.",
    )


@pytest.fixture(scope="session")
def spark():
    from xorq_spark.session import connect

    os.environ.setdefault("XORQ_SPARK_SHUFFLE_PARTITIONS", "8")
    s = connect(master="local[4]", app_name="xorq_spark_tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
