from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.session import (  # noqa: E402
    get_spark,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[8]")
    yield s
    s.stop()
