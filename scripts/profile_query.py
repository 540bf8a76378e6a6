"""Empirical stage profile of ONE registered query (guide §1.1/§7.1):
fresh session with the UI enabled, noop-sink the query, then scrape the
REST API for per-stage wall time, task count, I/O and shuffle bytes.

Usage::

    python scripts/profile_query.py <query> [sf_dir] [runs]

Prints one line per stage (submitted order): duration, tasks, input,
shuffle read/write, and the stage name's first line — the map from
operators to where the time actually goes.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from overturelink_data_pipeline_spark import registry
from overturelink_data_pipeline_spark.session import get_spark


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    registry.load_all()
    spark = get_spark(
        app_name=f"profile-{name}", extra_conf={"spark.ui.enabled": "true"}
    )
    # warm-up: JVM, parquet footers, Arrow workers (bench.py's recipe)
    registry.QUERIES["q1_pricing_summary"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    for i in range(runs):
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"{name} run{i}")
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        print(f"== run {i}: {dt:.3f}s", flush=True)

    ui = spark.sparkContext.uiWebUrl
    app = _get(f"{ui}/api/v1/applications")[0]["id"]
    stages = _get(f"{ui}/api/v1/applications/{app}/stages?status=complete")
    stages.sort(key=lambda s: s.get("submissionTime", ""))
    print(
        f"{'stage':>6} {'sec':>7} {'tasks':>5} {'inMB':>7} {'shRdMB':>7} "
        f"{'shWrMB':>7} {'desc/name'}"
    )
    for s in stages:
        sub, comp = s.get("submissionTime"), s.get("completionTime")
        if not sub or not comp:
            continue
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        dur = (
            datetime.strptime(comp, fmt) - datetime.strptime(sub, fmt)
        ).total_seconds()
        desc = (s.get("description") or s["name"].splitlines()[0])[:90]
        print(
            f"{s['stageId']:>6} {dur:7.3f} {s['numCompleteTasks']:>5} "
            f"{s['inputBytes'] / 1e6:7.1f} {s['shuffleReadBytes'] / 1e6:7.1f} "
            f"{s['shuffleWriteBytes'] / 1e6:7.1f} {desc}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
