"""Honest sf1 weak-entry measurement: each query runs in its OWN fresh
Spark session (subprocess), warm (median of 3 post-warm-up runs), vs
DuckDB running the oracle (median of 3). Batched same-session timing
overstates queries that run late (accumulated persist/GC state:
sessions_30min_gap measured 15.6 s batched vs 1.5 s fresh).

Usage: python scripts/bench_sf1_weak.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata/sf1"

DEFAULT = [
    "dedup_ngram_jaccard",
    "text_fingerprint_audit",
    "text_lang_id",
    "text_quality_score",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "sessions_30min_gap",
    "dedup_exact_normalized",
    "agg_percentiles_exact",
    "join_asof_last_signup",
    "json_try_cast",
    "text_repetition_filter",
    "text_decontaminate_audit",  # r13 merge of text_decontaminate
    "ann_pq_topk",
    "dedup_simhash",
    "dedup_clusters",
]

QUERIES = sys.argv[2:] or DEFAULT

_CHILD = r"""
import sys, time, json
sys.path.insert(0, "/root/repo")
from overturelink_data_pipeline_spark.session import get_spark
from overturelink_data_pipeline_spark import registry
registry.load_all()
spark = get_spark(app_name="sf1-weak-child", cpus="32")
name, sf = sys.argv[1], sys.argv[2]
registry.QUERIES["q1_pricing_summary"](spark, sf).count()
registry.QUERIES[name](spark, sf).count()  # warm-up
ts = []
for _ in range(3):
    t0 = time.time()
    registry.QUERIES[name](spark, sf).count()
    ts.append(time.time() - t0)
ts.sort()
print("CHILD_RESULT " + json.dumps({"spark_s": ts[1]}))
"""


def duck_time(name: str) -> float | None:
    from overturelink_data_pipeline_spark.testing import duckdb_connect

    from overturelink_data_pipeline_spark import registry

    registry.load_all()
    if name not in registry.ORACLE:
        return None
    con = duckdb_connect(SF)
    ts = []
    for _ in range(3):
        t0 = time.time()
        con.sql(registry.ORACLE[name]).fetchall()
        ts.append(time.time() - t0)
        if ts[-1] > 10:  # slow oracle: one run is evidence enough
            break
    con.close()
    ts.sort()
    return ts[len(ts) // 2]


def main() -> None:
    sys.path.insert(0, "/root/repo")
    for name in QUERIES:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, name, SF],
            capture_output=True,
            text=True,
            timeout=600,
        )
        spark_s = None
        for line in out.stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                spark_s = json.loads(line.split(" ", 1)[1])["spark_s"]
        if spark_s is None:
            print(f"{name:28s} CHILD FAILED: {out.stderr[-300:]}")
            continue
        td = duck_time(name)
        ratio = f"{spark_s / td:5.2f}x" if td else "  n/a"
        td_s = f"{td:6.2f}" if td is not None else "   n/a"
        print(f"{name:28s} spark {spark_s:6.2f}s  duckdb {td_s}s  {ratio}", flush=True)


if __name__ == "__main__":
    main()
