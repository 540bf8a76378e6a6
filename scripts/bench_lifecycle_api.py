#!/usr/bin/env python
"""Lifecycle-API decade sweep — the PRODUCT-path cost-∝-crawl
measurement behind BENCH_SF1.md's round-8 API table.

For each (index class, sf_dir): build the index from the documents
(or embeddings) table in a fresh subprocess, probe a fixed-size crawl
(80%-prefix rewrites of hash-chosen docs / first-dim-perturbed
vectors), report build wall + warm median-of-3 probe wall. The probe
should stay FLAT across sf1 → sf3 → sf10 (fixed crawl, 10× corpus);
the build is the amortized release-time cost and may grow with the
corpus scan.

Usage: python scripts/bench_lifecycle_api.py [posting|band|semantic ...]
       (default: all three, over /tmp/testdata/sf{1,3,10})
NEVER run concurrently with other Spark work (pinned protocol).
"""

from __future__ import annotations

import json
import subprocess
import sys

SFS = ["/tmp/testdata/sf1", "/tmp/testdata/sf3", "/tmp/testdata/sf10"]
MODES = sys.argv[1:] or ["posting", "band", "semantic"]

_TEXT_CHILD = r"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from overturelink_data_pipeline_spark.session import get_spark, read_table, ensure_parallelism
from overturelink_data_pipeline_spark.operators.lifecycle import PostingIndex, BandIndex, temp_name
mode, sf = sys.argv[1], sys.argv[2]
cls = {"posting": PostingIndex, "band": BandIndex}[mode]
spark = get_spark(app_name="lifecycle-bench", cpus="32")
docs = ensure_parallelism(read_table(spark, sf, "documents")).select("doc_id", "text")
n = docs.count()
frac = min(1.0, 5000 / max(n, 1))
crawl = (docs.filter(F.abs(F.xxhash64("doc_id")) % 10000 < int(frac * 10000))
    .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.substring("text", 1, F.floor(F.length("text") * 0.8).cast("int")).alias("text")))
idx = cls(spark, temp_name("lb"))
t0 = time.time(); idx.build(docs); build_s = time.time() - t0
idx.probe(crawl).count()
ts = []
for _ in range(3):
    t0 = time.time(); m = idx.probe(crawl).count(); ts.append(time.time() - t0)
ts.sort()
print("CHILD_RESULT", __import__("json").dumps(
    {"corpus": n, "build_s": round(build_s, 1), "probe_s": round(ts[1], 2), "matches": m}))
idx.drop()
"""

_SEM_CHILD = r"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from overturelink_data_pipeline_spark.session import get_spark, read_table, ensure_parallelism
from overturelink_data_pipeline_spark.operators.lifecycle import SemanticRelease, temp_name
sf = sys.argv[2]
spark = get_spark(app_name="lifecycle-bench", cpus="32")
emb = ensure_parallelism(read_table(spark, sf, "embeddings")).select(
    "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
n = emb.count()
crawl = (emb.filter(F.abs(F.xxhash64("vec_id")) % 10000 < min(10000, int(2000 / max(n, 1) * 10000)))
    .select((F.col("vec_id") + 10_000_000).alias("vec_id"),
            F.concat(F.array(F.element_at("v", 1) + 0.05),
                     F.slice("v", 2, F.size("v") - 1)).alias("v")))
rel = SemanticRelease(spark, temp_name("lbsem"))  # k=None -> auto (k ∝ n)
t0 = time.time(); rel.build(emb); build_s = time.time() - t0
rel.probe(crawl).count()
ts = []
for _ in range(3):
    t0 = time.time(); m = rel.probe(crawl).count(); ts.append(time.time() - t0)
ts.sort()
print("CHILD_RESULT", __import__("json").dumps(
    {"corpus": n, "k": rel.k, "build_s": round(build_s, 1), "probe_s": round(ts[1], 2), "matches": m}))
rel.drop()
"""


def main() -> None:
    for mode in MODES:
        child = _SEM_CHILD if mode == "semantic" else _TEXT_CHILD
        for sf in SFS:
            out = subprocess.run(
                [sys.executable, "-c", child, mode, sf],
                capture_output=True,
                text=True,
                timeout=900,
            )
            res = None
            for line in out.stdout.splitlines():
                if line.startswith("CHILD_RESULT "):
                    res = json.loads(line.split(" ", 1)[1])
            if res is None:
                print(f"{mode} @ {sf}: CHILD FAILED {out.stderr[-300:]}")
                continue
            print(json.dumps({"mode": mode, "sf_dir": sf, **res}), flush=True)


if __name__ == "__main__":
    main()
