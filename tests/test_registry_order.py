"""Registration-order contract (VERDICT r01 item 1).

The driver's CORRECTNESS pass covers the first ~50 registered queries;
the registry pins an explicit canonical window so every SURVEY §2
operator ID earns a driver-green row across rounds. A refactor that
perturbs import order must not silently shuffle the window.
"""

import end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries as _qpkg
from end_to_end_mlops_airflow_cloudformation_great_expectations_spark.queries import (
    ORACLES,
    QUERIES,
)


def test_window_is_the_pinned_canonical_list():
    assert list(QUERIES)[:50] == _qpkg._DRIVER_WINDOW_FIRST


def test_window_queries_all_have_oracles():
    """Window slots are wasted on rows-only checks — everything in the
    driver window must be hash-checkable."""
    missing = [n for n in _qpkg._DRIVER_WINDOW_FIRST if n not in ORACLES]
    assert missing == []


def test_registry_is_consistent():
    assert set(ORACLES) <= set(QUERIES)
    assert len(QUERIES) >= 100
