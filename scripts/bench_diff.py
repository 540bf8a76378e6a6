#!/usr/bin/env python
"""Per-query diff of two committed round bench artifacts.

Usage: python scripts/bench_diff.py r6 r7 [--floor-sec 1.0] [--ratio 1.25]

Prints every query whose batched wall time moved by more than
``--ratio`` in either direction AND whose baseline round time is at
least ``--floor-sec`` — the explicit floor the BENCH_SF1.md ledger
line cites (VERDICT r7 ask #3: the hand-written "zero >25%
regressions" claim was falsified by sub-second and near-floor movers;
this script GENERATES the line instead, with the floor it applied
stated in the output). Also prints added/retired queries and the
total delta, so each round's ledger attribution starts from the same
mechanical base.

Movers below the floor are batched-protocol noise by the pinned
measurement doctrine (the box drifts ~1.5× between sessions and
sub-second queries sit on Spark's job-submission floor); they are
listed separately rather than silently dropped, so the ledger never
claims more than the artifact shows.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(tag: str) -> dict:
    m = re.fullmatch(r"r?(\d+)", tag)
    if not m:
        sys.exit(f"bad round tag {tag!r} (want e.g. r6)")
    path = os.path.join(REPO, f"BENCH_LOCAL_r{int(m.group(1)):02d}.json")
    if not os.path.exists(path):
        sys.exit(f"no committed artifact {path}")
    with open(path) as f:
        return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old", help="baseline round, e.g. r6")
    ap.add_argument("new", help="comparison round, e.g. r7")
    ap.add_argument(
        "--floor-sec",
        type=float,
        default=1.0,
        help="ignore queries whose OLD time is below this (default 1.0 s)",
    )
    ap.add_argument(
        "--ratio",
        type=float,
        default=1.25,
        help="report movers beyond this ratio either way (default 1.25)",
    )
    args = ap.parse_args()

    a, b = _load(args.old), _load(args.new)
    qa, qb = a["queries"], b["queries"]

    print(
        f"total: {a['value']:.1f} s ({len(qa)} queries) -> "
        f"{b['value']:.1f} s ({len(qb)} queries), "
        f"delta {b['value'] - a['value']:+.1f} s"
    )
    added = sorted(set(qb) - set(qa))
    gone = sorted(set(qa) - set(qb))
    if added:
        print("added:   " + ", ".join(f"{q} ({qb[q]:.2f}s)" for q in added))
    if gone:
        print("retired: " + ", ".join(f"{q} ({qa[q]:.2f}s)" for q in gone))

    movers, noise = [], []
    for q in sorted(set(qa) & set(qb)):
        old, new = qa[q], qb[q]
        if old <= 0:
            continue
        r = new / old
        if r > args.ratio or r < 1 / args.ratio:
            (movers if old >= args.floor_sec else noise).append((q, old, new, r))

    movers.sort(key=lambda t: -abs(t[3] - 1))
    noise.sort(key=lambda t: -abs(t[3] - 1))
    print(
        f"\nmovers beyond {args.ratio}x with old >= {args.floor_sec}s "
        f"({len(movers)}):"
    )
    for q, old, new, r in movers:
        print(f"  {q:40s} {old:7.2f} -> {new:7.2f} s  ({r:.2f}x)")
    if not movers:
        print("  (none)")
    print(
        f"\nbelow-floor movers (old < {args.floor_sec}s — protocol noise, "
        f"listed for honesty) ({len(noise)}):"
    )
    for q, old, new, r in noise:
        print(f"  {q:40s} {old:7.2f} -> {new:7.2f} s  ({r:.2f}x)")
    if not noise:
        print("  (none)")

    print(
        f"\nledger line: among queries >= {args.floor_sec} s in {args.old}, "
        f"{sum(1 for *_, r in movers if r > 1)} regressed and "
        f"{sum(1 for *_, r in movers if r < 1)} improved beyond "
        f"{args.ratio}x ({args.old} -> {args.new})."
    )


if __name__ == "__main__":
    main()
