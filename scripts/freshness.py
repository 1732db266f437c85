"""Driver-evidence freshness audit.

Prints, for every registered query, the newest CORRECTNESS_r*.json
round with a green driver row (oracled or rows-only `no_oracle`), plus
a histogram by round — the tool behind the staleness-drain plan
(VERDICT r9 item 1: no oracled query's newest driver evidence should
be older than r6 once the r10/r11 rotation rounds complete).

Usage: python scripts/freshness.py [--stale-before N]
Exit code 0 always (reporting tool, not a gate).
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from smart_energy_consumption_analytics_using_big_data_spark.plans import ORACLE, QUERIES
from smart_energy_consumption_analytics_using_big_data_spark.plans.registry import (
    _driver_history,
)


def main() -> int:
    stale_before = 6
    if "--stale-before" in sys.argv:
        stale_before = int(sys.argv[sys.argv.index("--stale-before") + 1])
    seen, failed, _reconfirmed, last_green = _driver_history()

    hist: Counter[int] = Counter()
    stale, never = [], []
    for name in QUERIES:
        rnd = last_green.get(name, 0)
        hist[rnd] += 1
        if rnd == 0:
            never.append(name)
        elif rnd < stale_before:
            stale.append((rnd, name))

    print("newest green driver round -> #queries")
    for rnd in sorted(hist):
        label = f"r{rnd:02d}" if rnd else "never"
        print(f"  {label}: {hist[rnd]}")
    print(
        f"\n{len(QUERIES)} registered ({len(ORACLE)} oracled); "
        f"{len(stale)} with evidence older than r{stale_before}; "
        f"{len(never)} never driver-green; "
        f"{len(failed)} failed in the latest round"
    )
    for rnd, name in sorted(stale):
        print(f"  stale r{rnd}: {name}{'' if name in ORACLE else '  (rows-only)'}")
    for name in never:
        print(f"  never: {name}{'' if name in ORACLE else '  (rows-only)'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
