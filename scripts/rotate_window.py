"""Print the recommended _PRIORITY_ORDER for the NEXT round.

The driver's correctness snapshot covers the first 50 registered
queries, and the standing policy (VERDICT r3 ask #1, enforced by
tests/test_registry_order.py) is that no query's latest driver row may
be more than one round old. This script derives the rotation from the
CORRECTNESS_r*.json artifacts:

  1. never-checked queries (new this round) first,
  2. then queries whose latest driver row is stale (< max round),
  3. then everything else, most-recently-checked last.

Paste the output into registry._PRIORITY_ORDER at round start, keeping
any new queries the round adds inside the first 50.

Usage: python scripts/rotate_window.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from overturelink_data_pipeline_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    registry.load_all()
    latest = registry.latest_driver_rounds(REPO)
    current = max(latest.values()) if latest else 0
    names = list(registry.QUERIES)
    never = [n for n in names if n not in latest]
    stale = [n for n in names if 0 < latest.get(n, 0) < current]
    fresh = [n for n in names if latest.get(n, 0) == current]
    order = never + stale + fresh
    window = order[:50]
    print(f"# derived from CORRECTNESS_r1..r{current}; window = first 50")
    print(f"# never-checked: {len(never)}, stale: {len(stale)}, fresh: {len(fresh)}")
    overflow = [n for n in never + stale if n not in window]
    if overflow:
        print(f"# WARNING: {len(overflow)} stale/new queries overflow the window: {overflow}")
    for n in order:
        print(f'    "{n}",')


if __name__ == "__main__":
    main()
