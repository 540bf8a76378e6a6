"""Stream-operator scaling sweep (VERDICT r4 ask #6): run the
stateful streaming ops at sf1 and sf3 in fresh subprocesses and report
wall time next to STATE-STORE telemetry (peak state rows / bytes,
micro-batch count) captured from the replay's StreamingQuery progress
(run_to_completion.last_state_metrics).

The claim under test: state grows with the KEY population (users /
hour buckets), not with event volume, so a 3× event corpus should
show ≈3× state only where the key space itself scales (gen_sf1 shifts
user_id per copy — user-keyed state IS expected to scale ~linearly)
while wall time stays ≈linear in events.

A second axis (VERDICT r5 ask #3 / r6 ask #3): ``--provider rocksdb``
re-runs the sweep with the RocksDB state-store provider instead of the
default HDFS-backed in-memory provider — the production knob for the
superlinear state-commit term the r5 sf3 sweep surfaced (the HDFS
provider snapshots its entire in-heap map per commit; RocksDB commits
are incremental and state lives off-heap).

Usage: python scripts/bench_stream_scale.py [--provider rocksdb] [sf_dir ...]
"""

from __future__ import annotations

import json
import subprocess
import sys

_ARGS = sys.argv[1:]
PROVIDER = "default"
if "--provider" in _ARGS:
    i = _ARGS.index("--provider")
    if i + 1 >= len(_ARGS):
        sys.exit("--provider needs a value: default | rocksdb")
    PROVIDER = _ARGS[i + 1]
    del _ARGS[i : i + 2]
# validate HERE, not in the child: a typo ('rocksd') would otherwise
# silently measure the default provider while labeling every output
# row with the requested name — mislabeled A/B evidence
if PROVIDER not in ("default", "rocksdb"):
    sys.exit(f"unknown provider {PROVIDER!r}: default | rocksdb")
QUERIES = ["stream_session_window", "stream_dedup_hourly"]
if "--queries" in _ARGS:
    i = _ARGS.index("--queries")
    QUERIES = _ARGS[i + 1].split(",")
    del _ARGS[i : i + 2]
DIRS = _ARGS or ["/tmp/testdata/sf1", "/tmp/testdata/sf3"]

_CHILD = r"""
import sys, time, json
sys.path.insert(0, "/root/repo")
from overturelink_data_pipeline_spark.session import get_spark
from overturelink_data_pipeline_spark import registry
from overturelink_data_pipeline_spark.streaming.events import run_to_completion
registry.load_all()
# maxResultSize: run_to_completion's replay drains into a MEMORY sink
# (that is what makes streaming results oracle-comparable), so the
# full output lands in driver memory — at sf10 stream_session_window
# emits ~9.5M closed sessions (>1 GiB serialized), over the 1 GiB
# default. A production writeStream goes to a real sink and never
# pays this; the sweep raises the cap rather than switching sinks so
# the measured plan stays the one the driver gate runs.
spark = get_spark(
    app_name="stream-scale-child",
    cpus="32",
    extra_conf={"spark.driver.maxResultSize": "8g"},
)
name, sf, provider = sys.argv[1], sys.argv[2], sys.argv[3]
# Since the r8 wiring, run_to_completion sets the provider conf
# per-run (wide-state ops auto-select RocksDB), so a session-level
# conf here would be silently overridden. The env knob is the
# documented override lever for exactly this A/B.
import os
os.environ["SPARK_GRAFT_STATE_PROVIDER"] = provider
registry.QUERIES["q1_pricing_summary"](spark, sf).count()
# unregistered streaming ops (e.g. stream_stream_attribution — no
# registry slot at the 100-query ceiling) resolve from the module
from overturelink_data_pipeline_spark.operators import streaming_ops as _so
fn = registry.QUERIES.get(name) or getattr(_so, name)
fn(spark, sf).count()  # warm-up (JVM + state-store init)
ts, metrics = [], None
for _ in range(3):
    t0 = time.time()
    fn(spark, sf).count()
    ts.append(time.time() - t0)
    metrics = getattr(run_to_completion, "last_state_metrics", None)
ts.sort()
print("CHILD_RESULT " + json.dumps({"wall_s": round(ts[1], 2), "state": metrics}))
"""


def main() -> None:
    for d in DIRS:
        for name in QUERIES:
            try:
                out = subprocess.run(
                    [sys.executable, "-c", _CHILD, name, d, PROVIDER],
                    capture_output=True,
                    text=True,
                    timeout=600,
                )
            except subprocess.TimeoutExpired:
                # one hung child must not abort the rest of the sweep
                print(f"{name} @ {d}: CHILD TIMEOUT (600s)")
                continue
            res = None
            for line in out.stdout.splitlines():
                if line.startswith("CHILD_RESULT "):
                    res = json.loads(line.split(" ", 1)[1])
            if res is None:
                print(f"{name} @ {d}: CHILD FAILED {out.stderr[-300:]}")
                continue
            print(
                json.dumps(
                    {"query": name, "sf_dir": d, "provider": PROVIDER, **res}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
