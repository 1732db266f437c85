"""Rotation invariants for the bounded driver window (VERDICT r5 items 1+4).

The correctness driver samples a bounded prefix (historically 50) of the
registry each round.  These tests pin, without a SparkSession, that the
prefix is spent only on queries that can produce a hash verdict:

* rows-only queries (no ORACLE entry) never occupy a window slot — they
  can only ever return ``err: no_oracle`` (r5 burned a slot on
  ``q_approx_topk`` this way);
* the four LLM-pipeline flagships named by the r5 verdict lead the
  window while they lack a driver row;
* the stale-evidence redo ``q_window_range_7d`` keeps its slot until a
  fresh driver row lands.
"""

from __future__ import annotations

import glob
import json
import os

from smart_energy_consumption_analytics_using_big_data_spark.plans import ORACLE, QUERIES
from smart_energy_consumption_analytics_using_big_data_spark.plans.registry import (
    _FLAGSHIP_PRIORITY,
    _STALE_PRIORITY,
)

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
WINDOW = 50


def _driver_seen() -> tuple[set, set, set]:
    """(seen, failed_latest, reconfirmed) — mirrors the rotation's own
    computation (registry._driver_history): a query whose row in the
    MOST RECENT round was a mismatch or error is a sanctioned window
    repeat, not a wasted slot (r6: the two BPE hash-FAILs correctly led
    the r7 window and this test red-flagged them until it learned the
    failure-redo rule); a stale-evidence redo retires the moment ANY
    post-migration round has a green row for it."""
    import re

    from smart_energy_consumption_analytics_using_big_data_spark.plans.registry import (
        _STALE_FIXED_ROUND,
    )

    seen: set = set()
    failed: set = set()
    reconfirmed: set = set()
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rows = json.load(open(path))
        seen.update(rows.keys())
        failed = {
            k
            for k, v in rows.items()
            if v.get("err") not in (None, "no_oracle")
            or v.get("rows_match") is False
            or v.get("hash_match") is False
        }
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m and int(m.group(1)) >= _STALE_FIXED_ROUND:
            reconfirmed.update(rows.keys() - failed)
    return seen, failed, reconfirmed


def _driver_last_row_round() -> dict:
    """name -> most recent round with a GREEN driver row (rows-only
    queries count `err: no_oracle` as green, same as the registry's
    `_driver_history` last_green)."""
    import re

    last: dict = {}
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        rows = json.load(open(path))
        for k, v in rows.items():
            ok = (
                v.get("err") in (None, "no_oracle")
                and v.get("rows_match") is not False
                and v.get("hash_match") is not False
            )
            if ok:
                last[k] = max(rnd, last.get(k, 0))
    return last


def test_window_rows_only_queries_are_one_shot():
    """A rows-only query may hold a window slot ONLY while it has never
    been driver-run (VERDICT r8 item 2: one slot buys its row-count
    evidence, then `seen` retires it for good) — with ONE sanctioned
    exception: the one-time liveness refresh (`_ROWS_ONLY_REFRESH`,
    VERDICT r10 item 3 / r12 item 3) re-pins a fixed (name, min_round)
    list of rows-only queries with stale driver evidence, each for
    exactly one more slot. A pin retires the moment a driver row at or
    after its min_round exists. Any OTHER seen rows-only query in the
    window is the r5 q_approx_topk waste, re-asserted."""
    from smart_energy_consumption_analytics_using_big_data_spark.plans.registry import (
        _ROWS_ONLY_REFRESH,
    )

    seen, _, _ = _driver_seen()
    last_row = _driver_last_row_round()
    active_refresh = {
        k for k, min_rnd in _ROWS_ONLY_REFRESH if last_row.get(k, 0) < min_rnd
    }
    head = list(QUERIES)[:WINDOW]
    wasted = [
        k for k in head if k not in ORACLE and k in seen and k not in active_refresh
    ]
    assert wasted == [], f"seen rows-only queries waste driver slots: {wasted}"


def test_window_prefers_unseen_oracled_backlog():
    """Every window slot is either never-driver-run or an explicit redo
    (stale-evidence OR latest-round driver failure)."""
    seen, failed_latest, reconfirmed = _driver_seen()
    head = list(QUERIES)[:WINDOW]
    # a stale redo is only a sanctioned repeat while it still lacks
    # fresh (post-migration) green evidence
    allowed_seen = (set(_STALE_PRIORITY) - reconfirmed) | failed_latest
    stale_windowed = [k for k in head if k in seen and k not in allowed_seen]
    backlog = [k for k in QUERIES if k not in seen and k in ORACLE]
    # only flag wasted slots while a backlog exists to fill them
    if len(backlog) >= WINDOW - len(allowed_seen):
        assert stale_windowed == [], (
            f"already-confirmed queries displace backlog: {stale_windowed}"
        )


def test_flagships_lead_window_until_confirmed():
    seen, _, _ = _driver_seen()
    pending = [k for k in _FLAGSHIP_PRIORITY if k not in seen]
    head = list(QUERIES)[: len(pending)]
    assert head == pending, f"window head {head} != pending flagships {pending}"
    for name in _FLAGSHIP_PRIORITY:
        assert name in QUERIES and name in ORACLE


def test_rest_orders_oracled_by_staleness_rows_only_last():
    """Post-backlog window slots refresh the STALEST driver evidence:
    `_order_rest` cycles oracled queries by ascending last-green round
    (seen-but-never-green first), with rows-only names always last —
    they can never produce a hash verdict, so they must never reach
    the bounded window once the backlog stops filling it (the state
    every round after the backlog clears)."""
    from smart_energy_consumption_analytics_using_big_data_spark.plans.registry import _order_rest

    rest = ["a", "b", "c", "d", "e", "f"]
    oracled = {"a", "b", "c", "e"}
    last_green = {"a": 6, "b": 1, "e": 3}  # c seen-but-never-green; d/f rows-only
    assert _order_rest(rest, oracled, last_green) == ["c", "b", "e", "a", "d", "f"]
    # stability: equal staleness keeps registry order
    assert _order_rest(["x", "y"], {"x", "y"}, {}) == ["x", "y"]


def test_reverify_pins_lead_until_driver_green_at_min_round():
    """Code-changed queries (`_REVERIFY_PRIORITY`) pin to the window
    head until the driver re-verifies them AT OR AFTER the round that
    changed them — local green is not driver green. r9: the two BPE
    rewrites must lead the window (behind any failure redos) while
    their newest driver evidence predates round 9; a green row in
    round >= 9 retires the pin."""
    import re

    from smart_energy_consumption_analytics_using_big_data_spark.plans.registry import (
        _REVERIFY_PRIORITY,
    )

    last_green: dict = {}
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        rows = json.load(open(path))
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        for k, v in rows.items():
            ok = (
                v.get("err") in (None, "no_oracle")
                and v.get("rows_match") is not False
                and v.get("hash_match") is not False
            )
            if ok:
                last_green[k] = max(rnd, last_green.get(k, 0))
    pending = [
        k for k, mr in _REVERIFY_PRIORITY if last_green.get(k, 0) < mr
    ]
    _, failed, _ = _driver_seen()
    redo = [k for k in failed if k in QUERIES]
    head = list(QUERIES)[len(redo) : len(redo) + len(pending)]
    assert head == pending, f"window head {head} != pending reverify {pending}"
    for k, _mr in _REVERIFY_PRIORITY:
        assert k in QUERIES and k in ORACLE
