#!/usr/bin/env python
"""Decade sweep for the batched heavyweights (VERDICT r7 ask #4).

The r7 decade sweep covered the three incremental probes; this one
measures the four most expensive REGISTERED queries —
graph_pagerank_dupes, dedup_clusters, dedup_simhash,
sink_training_shards — at sf1/sf3/sf10 and reports the observed
growth exponent alpha (wall ∝ sf^alpha, least-squares over log-log),
so any superlinear entry gets a named cause or a documented bound in
BENCH_SF1.md.

Protocol: the pinned fresh-session discipline (each measurement in
its own subprocess: q1 warm-up, target warm-up, median of N runs —
default 3); NEVER run concurrently with other Spark work on this box.

Usage: python scripts/bench_heavy_scale.py [--runs N] [query ...]
"""

from __future__ import annotations

import argparse
import json
import math
import subprocess
import sys

SFS = [
    (1.0, "/tmp/testdata/sf1"),
    (3.0, "/tmp/testdata/sf3"),
    (10.0, "/tmp/testdata/sf10"),
]

DEFAULT = [
    "graph_pagerank_dupes",
    "dedup_clusters",
    "dedup_simhash",
    "sink_training_shards",
]

_CHILD = r"""
import sys, time, json
sys.path.insert(0, "/root/repo")
from overturelink_data_pipeline_spark.session import get_spark
from overturelink_data_pipeline_spark import registry
registry.load_all()
spark = get_spark(app_name="heavy-scale-child", cpus="32")
name, sf, runs = sys.argv[1], sys.argv[2], int(sys.argv[3])
registry.QUERIES["q1_pricing_summary"](spark, sf).count()
registry.QUERIES[name](spark, sf).count()  # warm-up
ts = []
for _ in range(runs):
    t0 = time.time()
    registry.QUERIES[name](spark, sf).count()
    ts.append(time.time() - t0)
ts.sort()
print("CHILD_RESULT " + json.dumps({"spark_s": ts[len(ts) // 2], "all": ts}))
"""


def measure(name: str, sf_dir: str, runs: int) -> float:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, name, sf_dir, str(runs)],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])["spark_s"]
    raise RuntimeError(
        f"{name}@{sf_dir}: no CHILD_RESULT\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    queries = args.queries or DEFAULT

    results: dict[str, dict[float, float]] = {}
    for q in queries:
        results[q] = {}
        for sf, sf_dir in SFS:
            t = measure(q, sf_dir, args.runs)
            results[q][sf] = t
            print(f"{q} sf{sf:g}: {t:.2f} s", flush=True)

    print("\n| query | sf1 | sf3 | sf10 | alpha (wall ∝ sf^alpha) |")
    print("|---|---|---|---|---|")
    for q, by_sf in results.items():
        xs = [math.log(sf) for sf in by_sf]
        ys = [math.log(t) for t in by_sf.values()]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        alpha = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        cells = " | ".join(f"{by_sf[sf]:.2f}" for sf, _ in SFS)
        print(f"| {q} | {cells} | {alpha:.2f} |")
    print("\n" + json.dumps(results))


if __name__ == "__main__":
    main()
