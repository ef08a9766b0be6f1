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


def test_round9_window_is_live_and_disjoint_from_r8():
    """VERDICT r08 item 1: the staged r9 window is now the live
    driver window — 50 names, all oracle-backed, zero overlap with
    the greened r8 window (no wasted slots)."""
    w9 = _qpkg._ROUND9_WINDOW
    assert _qpkg._DRIVER_WINDOW_FIRST is w9
    assert len(w9) == 50
    assert len(set(w9)) == 50
    assert not set(w9) & set(_qpkg._ROUND8_WINDOW)
    assert [n for n in w9 if n not in ORACLES] == []
    assert w9[:42] == _qpkg._ROUND9_QUEUE


def test_round10_window_is_staged():
    """VERDICT r08 item 2: the r10 window is pinned now — the 47
    never-driver-checked oracle-backed names (computed from the
    CORRECTNESS_r01..r08 artifacts union) + 3 driver-green pads, so
    greening r9+r10 closes the ledger at 365/365 without
    re-litigating composition."""
    import json
    import pathlib

    w10 = _qpkg._ROUND10_WINDOW
    assert len(w10) == 50
    assert len(set(w10)) == 50
    assert [n for n in w10 if n not in ORACLES] == []
    # pads come last and are already driver-green (r8 window)
    pads = set(w10) & set(_qpkg._ROUND8_WINDOW)
    assert pads == {"sql_tpch_q1", "sql_tpch_q6", "sql_tpch_q12"}
    assert set(w10[-3:]) == pads
    # the other 47 are exactly the never-checked remainder
    root = pathlib.Path(__file__).resolve().parents[1]
    green = set()
    for f in sorted(root.glob("CORRECTNESS_r0*.json")):
        for name, row in json.loads(f.read_text()).items():
            if isinstance(row, dict) and row.get("rows_match") and row.get("err") is None:
                green.add(name)
    never = set(ORACLES) - green - set(_qpkg._ROUND9_WINDOW)
    # round-9+ additions queue for r11 behind the pinned r10 window;
    # an addition that forgets to enqueue in _ROUND11_QUEUE fails here
    assert set(w10[:-3]) | set(_qpkg._ROUND11_QUEUE) == never
    assert not set(_qpkg._ROUND11_QUEUE) & set(w10)
    assert [n for n in _qpkg._ROUND11_QUEUE if n not in ORACLES] == []


def test_every_headline_query_has_a_bar_and_is_registered():
    """VERDICT r08 item 5: BASELINE_bars.json is the canonical gate
    input — every bench HEADLINE name must be registered and have a
    bar (a new headline entry without a recorded bar would silently
    escape the 2x gate)."""
    import json
    import pathlib

    import bench

    root = pathlib.Path(__file__).resolve().parents[1]
    bars = json.loads((root / "BASELINE_bars.json").read_text())["bars"]
    missing_bar = [n for n in bench.HEADLINE if n not in bars]
    unregistered = [n for n in bench.HEADLINE if n not in QUERIES]
    assert missing_bar == []
    assert unregistered == []
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
