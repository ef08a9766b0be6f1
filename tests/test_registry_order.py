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


def test_round9_window_is_greened_history():
    """The r9 window greened in CORRECTNESS_r09 (50/50); keep its
    composition pinned so the ledger accounting stays auditable."""
    w9 = _qpkg._ROUND9_WINDOW
    assert len(w9) == 50
    assert len(set(w9)) == 50
    assert not set(w9) & set(_qpkg._ROUND8_WINDOW)
    assert [n for n in w9 if n not in ORACLES] == []
    assert w9[:42] == _qpkg._ROUND9_QUEUE


def test_round10_window_is_greened_history():
    """The r10 window greened in CORRECTNESS_r10 (50/50); keep its
    composition pinned so the ledger accounting stays auditable."""
    w10 = _qpkg._ROUND10_WINDOW
    assert len(w10) == 50
    assert len(set(w10)) == 50
    assert [n for n in w10 if n not in ORACLES] == []
    pads = set(w10) & set(_qpkg._ROUND8_WINDOW)
    assert pads == {"sql_tpch_q1", "sql_tpch_q6", "sql_tpch_q12"}
    assert set(w10[-3:]) == pads


def test_round11_window_is_live():
    """VERDICT r10 item 1: CORRECTNESS_r10 landed 50/50 green, so the
    staged r11 window is now the live driver window — the 21 round-9
    additions (never driver-checked) + 29 driver-green pads from the
    greened r9 window. Greening it closes the pre-round-10 ledger at
    386/386. The never-checked partition is recomputed from the
    CORRECTNESS_r01.. artifact union — an addition that forgets to
    enqueue in the newest _ROUND*_QUEUE fails here."""
    import json
    import pathlib

    w11 = _qpkg._ROUND11_WINDOW
    assert _qpkg._DRIVER_WINDOW_FIRST is w11
    assert len(w11) == 50
    assert len(set(w11)) == 50
    assert [n for n in w11 if n not in ORACLES] == []
    assert w11[:21] == _qpkg._ROUND11_QUEUE
    # pads are r9-queue names, all greened in CORRECTNESS_r09
    assert set(w11[21:]) <= set(_qpkg._ROUND9_QUEUE)
    assert not set(w11) & set(_qpkg._ROUND10_WINDOW)
    # the 21 queue names + the staged r12/r13 batches are exactly the
    # never-checked remainder
    root = pathlib.Path(__file__).resolve().parents[1]
    green = set()
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(f.read_text()).items():
            if isinstance(row, dict) and row.get("rows_match") and row.get("err") is None:
                green.add(name)
    never = set(ORACLES) - green
    queued = set(_qpkg._ROUND12_QUEUE) | set(_qpkg._ROUND13_QUEUE)
    assert set(_qpkg._ROUND11_QUEUE) | queued == never
    assert not queued & set(w11)
    assert not set(_qpkg._ROUND12_QUEUE) & set(_qpkg._ROUND13_QUEUE)
    assert [n for n in queued if n not in ORACLES] == []


def test_round12_window_is_staged():
    """VERDICT r10 item 2: the r12 window is pinned now — the 7
    round-10 additions (never driver-checked) + 43 driver-green pads
    from the greened r10 window. Swap once CORRECTNESS_r11 lands
    green; greening it closes the ENTIRE pre-round-11 oracle-backed
    ledger at 393/393."""
    w12 = _qpkg._ROUND12_WINDOW
    assert len(w12) == 50
    assert len(set(w12)) == 50
    assert [n for n in w12 if n not in ORACLES] == []
    assert w12[:7] == _qpkg._ROUND12_QUEUE
    # pads are r10-window names, all greened in CORRECTNESS_r10
    assert set(w12[7:]) <= set(_qpkg._ROUND10_WINDOW)
    # no overlap with the live r11 window (no wasted slots)
    assert not set(w12) & set(_qpkg._ROUND11_WINDOW)


def test_rerecord_refuses_throttled_host():
    """VERDICT r09 item 5: bar re-records must be refused when the
    host-health control query runs slow — machine episodes invalidate
    the RUN, not the bars (synthetic-artifact unit test of the pure
    decision core)."""
    import bench

    bars = {bench._CONTROL_QUERY: 1.0, "q_slow": 2.0}
    # healthy host: control at 1.1x -> accepted
    ok, msg = bench._rerecord_decision(
        {bench._CONTROL_QUERY: 1.1, "q_slow": 3.0}, bars, ["q_slow"]
    )
    assert ok, msg
    # throttled host: control at 1.5x -> refused
    ok, msg = bench._rerecord_decision(
        {bench._CONTROL_QUERY: 1.5, "q_slow": 3.0}, bars, ["q_slow"]
    )
    assert not ok and "host suspect" in msg
    # control missing from the run -> refused
    ok, msg = bench._rerecord_decision({"q_slow": 3.0}, bars, ["q_slow"])
    assert not ok and "not timed" in msg
    # named query missing a timing -> refused
    ok, msg = bench._rerecord_decision(
        {bench._CONTROL_QUERY: 1.0}, bars, ["q_slow"]
    )
    assert not ok and "no timing" in msg


def test_control_query_has_a_stable_bar():
    """The control must exist in both HEADLINE and the bars file, or
    the suspect-host check silently never fires."""
    import json
    import pathlib

    import bench

    root = pathlib.Path(__file__).resolve().parents[1]
    bars = json.loads((root / "BASELINE_bars.json").read_text())["bars"]
    assert bench._CONTROL_QUERY in bench.HEADLINE
    assert bars.get(bench._CONTROL_QUERY)


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
