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


def _driver_seen() -> tuple[set, set]:
    seen: set = set()
    latest: set = set()
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rows = json.load(open(path))
        seen.update(rows.keys())
        latest = set(rows.keys())
    return seen, latest


def test_window_has_no_rows_only_queries():
    head = list(QUERIES)[:WINDOW]
    rows_only = [k for k in head if k not in ORACLE]
    assert rows_only == [], f"rows-only queries waste driver slots: {rows_only}"


def test_window_prefers_unseen_oracled_backlog():
    """Every window slot is either never-driver-run or an explicit redo."""
    seen, latest = _driver_seen()
    head = list(QUERIES)[:WINDOW]
    allowed_seen = set(_STALE_PRIORITY)  # explicit stale-evidence redos
    stale_windowed = [k for k in head if k in seen and k not in allowed_seen]
    backlog = [k for k in QUERIES if k not in seen and k in ORACLE]
    # only flag wasted slots while a backlog exists to fill them
    if len(backlog) >= WINDOW - len(allowed_seen):
        assert stale_windowed == [], (
            f"already-confirmed queries displace backlog: {stale_windowed}"
        )


def test_flagships_lead_window_until_confirmed():
    seen, _ = _driver_seen()
    pending = [k for k in _FLAGSHIP_PRIORITY if k not in seen]
    head = list(QUERIES)[: len(pending)]
    assert head == pending, f"window head {head} != pending flagships {pending}"
    for name in _FLAGSHIP_PRIORITY:
        assert name in QUERIES and name in ORACLE
