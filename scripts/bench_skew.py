"""Skew bench: run the three band-join dedup queries on the planted
boilerplate corpus (scripts/gen_skew_corpus.py) and report per-stage
evidence from the Spark UI REST API — task counts, run-time quantiles
(median vs max — a single-task straggler shows up as max >> p50 with
tiny task counts), and shuffle bytes.

The hot-key guards are env-tunable, so one script serves both sides of
the comparison:

    python scripts/gen_skew_corpus.py                      # build corpus
    python scripts/bench_skew.py                           # capped (defaults)
    SPARK_GRAFT_BUCKET_CAP=1000000000 \
    SPARK_GRAFT_NGRAM_DF_CAP=1000000000 \
      python scripts/bench_skew.py                         # uncapped

Usage: python scripts/bench_skew.py [skew_dir]
Prints one JSON line per query: wall seconds, output rows, and the
top-3 stages by executor run time with task quantiles + shuffle sizes.
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

QUERIES = ("dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash")


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def _stage_report(base: str, app_id: str, min_submission_ms: float) -> list[dict]:
    stages = _api(base, f"/api/v1/applications/{app_id}/stages?status=complete")
    out = []
    for s in stages:
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        if not sub:
            continue
        # ISO8601 'GMT' suffix → epoch ms
        from datetime import datetime, timezone

        ts = datetime.strptime(sub.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        if ts.timestamp() * 1000 < min_submission_ms:
            continue
        try:
            q = _api(
                base,
                f"/api/v1/applications/{app_id}/stages/"
                f"{s['stageId']}/{s['attemptId']}/taskSummary"
                "?quantiles=0.5,1.0",
            )
            p50_ms, max_ms = q["executorRunTime"]
        except Exception:
            p50_ms = max_ms = None
        out.append(
            {
                "stage": s["stageId"],
                "tasks": s["numCompleteTasks"],
                "run_s": round(s["executorRunTime"] / 1000, 1),
                "task_p50_s": None if p50_ms is None else round(p50_ms / 1000, 2),
                "task_max_s": None if max_ms is None else round(max_ms / 1000, 2),
                "shuffle_write_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
                "shuffle_read_mb": round(s["shuffleReadBytes"] / 1e6, 1),
            }
        )
    out.sort(key=lambda r: -r["run_s"])
    return out[:3]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata/sf1skew"
    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        sys.exit(f"no documents.parquet under {sf_dir} — run gen_skew_corpus.py first")
    registry.load_all()
    # the engine session disables the UI; this bench needs its REST API
    spark = get_spark(
        app_name="skew-bench", extra_conf={"spark.ui.enabled": "true"}
    )
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    from overturelink_data_pipeline_spark.operators import dedup, multimodal

    print(
        json.dumps(
            {
                "corpus": sf_dir,
                "ngram_df_cap": dedup.NGRAM_DF_CAP,
                "band_bucket_cap": dedup.BAND_BUCKET_CAP,
                "mm_band_bucket_cap": multimodal.MM_BAND_BUCKET_CAP,
            }
        ),
        flush=True,
    )
    # warm JVM/scan once so stage timings are steady-state
    registry.QUERIES["dedup_exact"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    runs = [(name, sf_dir) for name in QUERIES]
    # mm_dedup_phash skew leg: the companion hot-asset corpus
    # (gen_skew_corpus.py writes <skew_dir>_asset) plants one
    # byte-identical payload cluster; capped (star path) candidate
    # volume is O(cluster), uncapped is O(cluster²). Tune with
    # SPARK_GRAFT_MM_BUCKET_CAP the way the text caps are tuned.
    asset_dir = sf_dir.rstrip("/") + "_asset"
    if os.path.exists(os.path.join(asset_dir, "documents.parquet")):
        runs.append(("mm_dedup_phash", asset_dir))
    for name, data_dir in runs:
        t0 = time.time()
        df = registry.QUERIES[name](spark, data_dir)
        n = df.count()
        wall = time.time() - t0
        print(
            json.dumps(
                {
                    "query": name,
                    "corpus": data_dir,
                    "wall_s": round(wall, 1),
                    "pairs": n,
                    "top_stages": _stage_report(base, app_id, t0 * 1000),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
