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
    report = registry.rotation_report(REPO)  # the SAME tiering load_all applied
    latest = registry.latest_driver_rounds(REPO)
    current = max(latest.values()) if latest else 0
    order = [n for n, _ in report]
    assert order == list(registry.QUERIES), "report/order drift — registry bug"
    # must-be-in-window = everything not green in the current round:
    # NEW, oracle-gap, and stale-round marks all qualify
    due = [n for n, mark in report if mark != f"r{current}"]
    window = order[:50]
    print(f"# derived from CORRECTNESS_r1..r{current}; window = first 50 (auto-applied)")
    counts: dict[str, int] = {}
    for _, mark in report:
        kind = mark if mark in ("NEW", "oracle-gap") else ("fresh" if mark == f"r{current}" else "stale")
        counts[kind] = counts.get(kind, 0) + 1
    print("# " + ", ".join(f"{k}: {v}" for k, v in sorted(counts.items())))
    overflow = [n for n in due if n not in window]
    if overflow:
        print(f"# WARNING: {len(overflow)} due queries overflow the window: {overflow}")
    for n, mark in report:
        print(f"    {n}  # {mark}")


if __name__ == "__main__":
    main()
