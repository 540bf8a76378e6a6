"""Fresh-session per-query A/B timing at the BENCH's timed action
(noop sink): one subprocess per query, q1 + first-run warm-up, then
median of 3 noop-sink runs. The per-query companion to bench.py for
before/after evidence — bench_sf1_weak.py stays the Spark-vs-DuckDB
weak-entry protocol (count-based, includes the oracle side).

Usage: python scripts/ab_query.py <sf_dir> <query> [query ...]
"""

from __future__ import annotations

import json
import subprocess
import sys

_CHILD = r"""
import sys, time, json
sys.path.insert(0, "/root/repo")
from overturelink_data_pipeline_spark.session import get_spark
from overturelink_data_pipeline_spark import registry
registry.load_all()
spark = get_spark(app_name="ab-child", cpus="32")
name, sf = sys.argv[1], sys.argv[2]

def noop(df):
    df.write.format("noop").mode("overwrite").save()

noop(registry.QUERIES["q1_pricing_summary"](spark, sf))
noop(registry.QUERIES[name](spark, sf))  # warm-up
ts = []
for _ in range(3):
    spark.catalog.clearCache()
    spark._jvm.System.gc()
    t0 = time.perf_counter()
    noop(registry.QUERIES[name](spark, sf))
    ts.append(time.perf_counter() - t0)
ts.sort()
print("CHILD_RESULT " + json.dumps({"median_s": ts[1], "runs": ts}))
"""


def main() -> None:
    sf = sys.argv[1]
    for name in sys.argv[2:]:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, name, sf],
            capture_output=True,
            text=True,
            timeout=900,
        )
        res = None
        for line in out.stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                res = json.loads(line.split(" ", 1)[1])
        if res is None:
            print(f"{name:40s} CHILD FAILED: {out.stderr[-300:]}")
            continue
        runs = " ".join(f"{t:.2f}" for t in res["runs"])
        print(f"{name:40s} median {res['median_s']:6.2f}s  [{runs}]", flush=True)


if __name__ == "__main__":
    main()
