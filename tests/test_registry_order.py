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


def test_coverage_md_totals_match_registry():
    """VERDICT r07 item 3: COVERAGE.md's totals header drifted once
    (169/160 vs the real 319/310); pin it to the live registry so it
    can't drift again."""
    import pathlib
    import re

    text = pathlib.Path(__file__).resolve().parents[1].joinpath(
        "COVERAGE.md"
    ).read_text()
    m = re.search(
        r"\*\*(\d+) registered queries \((\d+) with DuckDB oracles, "
        r"(\d+) rows-only\)\*\*",
        text,
    )
    assert m, "COVERAGE.md totals header missing or reformatted"
    total, with_oracle, rows_only = map(int, m.groups())
    assert total == len(QUERIES)
    assert with_oracle == len(ORACLES)
    assert rows_only == len(QUERIES) - len(ORACLES)


def test_round9_queue_is_staged_and_disjoint():
    """VERDICT r07 item 7: the 42 remaining round-8 queue names are
    committed now for the r9 window. They must all be registered,
    oracle-backed, and disjoint from the current window, so that
    window ∪ queue closes the ledger at 310/310 in two rotations."""
    r9 = _qpkg._ROUND9_QUEUE
    assert len(r9) == 42
    assert not set(r9) & set(_qpkg._DRIVER_WINDOW_FIRST)
    assert [n for n in r9 if n not in ORACLES] == []


def test_round9_window_is_staged():
    """The exact r9 window (queue + 8 round-8 additions) is staged so
    next round's rotation is a mechanical swap: 50 names, all
    oracle-backed and registered, disjoint from the r8 window."""
    w9 = _qpkg._ROUND9_WINDOW
    assert len(w9) == 50
    assert len(set(w9)) == 50
    assert not set(w9) & set(_qpkg._DRIVER_WINDOW_FIRST)
    assert [n for n in w9 if n not in ORACLES] == []
