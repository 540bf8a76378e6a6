"""A/B harness for the batched-session streaming variance (VERDICT r10
ask #1): do terminated stream replays leave loaded state-store
providers that slow later replays in the same session?

Runs every registered stream_* query in a loop (3 passes) in ONE
session, printing per-replay wall plus the JVM's loadedProviders count
after each. Arms:

  python scripts/ab_stream_unload.py baseline   # code as committed
  python scripts/ab_stream_unload.py unload     # + unloadOnCommit conf

Findings (r11, sf0.1, same-day):

- BEFORE the run_to_completion unload fix, providers accumulated
  across replays (stream-stream join: +32 per run — its 4 join stores
  per partition bypass even spark.sql.streaming.stateStore.
  unloadOnCommit) and lingered until the 60 s maintenance tick,
  holding RocksDB native handles / in-heap maps and running
  maintenance against already-deleted checkpoint dirs. First batched
  pass of all 8 stream queries: 65.3 s; stream_stream_attribution
  20.6 s.
- WITH stale providers removed (unloadOnCommit arm, and equivalently
  the StateStore.stop() in run_to_completion's finally): first pass
  36.4 s, attribution 6.7 s; steady-state ~3.8-5.2 s.
- The residual first-run excess (~3 s) is one-time session warm-up
  (RocksDB JNI load + symmetric-hash-join codegen) — bench.py now
  warms both explicitly.
"""
import sys
import time

import os as _os

sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

from overturelink_data_pipeline_spark import registry
from overturelink_data_pipeline_spark.session import get_spark


def loaded_count(spark):
    """One implementation of the reflection probe lives in
    streaming/events.py (review r11 dedupe); '?' when not reflectable."""
    from overturelink_data_pipeline_spark.streaming.events import (
        loaded_provider_count,
    )

    n = loaded_provider_count(spark)
    return "?" if n is None else n


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    registry.load_all()
    spark = get_spark(app_name=f"stream-ab-{mode}")
    if mode == "unload":
        spark.conf.set(
            "spark.sql.streaming.stateStore.unloadOnCommit", "true"
        )
    names = sorted(n for n in registry.QUERIES if n.startswith("stream_"))
    # one streaming lifecycle so JVM init isn't billed to pass 0
    registry.QUERIES[names[0]](spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()
    print(f"after warmup: loaded={loaded_count(spark)}", flush=True)
    for p in range(3):
        for n in names:
            t0 = time.perf_counter()
            registry.QUERIES[n](spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            w = time.perf_counter() - t0
            print(
                f"pass{p} {n:32s} {w:7.2f}s loaded={loaded_count(spark)}",
                flush=True,
            )
            spark.catalog.clearCache()
            for t in spark.catalog.listTables():
                if t.isTemporary and t.name.startswith(("s", "warm")):
                    spark.catalog.dropTempView(t.name)
            spark._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()
