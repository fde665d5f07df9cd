from __future__ import annotations

import os

import pytest

from kaflow_spark.session import get_spark

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

# Spark python workers must be able to import test modules (handler
# closures reference classes defined in them).
_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_DIR = os.path.dirname(_TESTS_DIR)
os.environ["PYTHONPATH"] = os.pathsep.join(
    p
    for p in (_REPO_DIR, _TESTS_DIR, os.environ.get("PYTHONPATH"))
    if p
)


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    s = get_spark(
        "kaflow_spark-tests",
        master="local[4]",
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
