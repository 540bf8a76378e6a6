"""Inspect the derived driver-window rotation for the NEXT round.

Since round 5 the rotation is applied AUTOMATICALLY inside
``registry.load_all()`` (never-checked -> stale -> fresh, derived from
the CORRECTNESS_r*.json artifacts), so there is nothing to paste; this
script just prints the order load_all() will use, for inspection, and
warns if the stale/new tiers overflow the 50-query driver window.

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
    order = list(registry.QUERIES)  # load_all() already applied the derivation
    never = [n for n in order if n not in latest]
    stale = [n for n in order if 0 < latest.get(n, 0) < current]
    window = order[:50]
    print(f"# derived from CORRECTNESS_r1..r{current}; window = first 50 (auto-applied)")
    print(
        f"# never-checked: {len(never)}, stale: {len(stale)}, "
        f"fresh: {len(order) - len(never) - len(stale)}"
    )
    overflow = [n for n in never + stale if n not in window]
    if overflow:
        print(f"# WARNING: {len(overflow)} stale/new queries overflow the window: {overflow}")
    for n in order:
        mark = "NEW" if n not in latest else f"r{latest[n]}"
        print(f"    {n}  # {mark}")


if __name__ == "__main__":
    main()
