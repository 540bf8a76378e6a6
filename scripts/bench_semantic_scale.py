"""SemDeDup k ∝ n scale probe (round-4 closure of the r3 fixed-k
caveat): run ``semantic_prune`` at two corpus scales with k sized to a
constant target cell, and report the per-cell size / pair-count
distribution — the claim under test is that the per-cell GEMM cost
(≈ cell²) stays FLAT as n grows, i.e. total work is linear in n.

Usage:
    python scripts/gen_sf1.py /tmp/testdata/sf1 10     # once
    python scripts/gen_sf1.py /tmp/testdata/sf3 30     # once
    python scripts/bench_semantic_scale.py [dir ...]

Prints one JSON line per (corpus, mode): n vectors, k, cell stats
(mean/p95/max), total + max per-cell candidate pairs, pruned rows,
wall seconds. Runs fixed k=8 alongside for the contrast column.

``--incremental`` instead measures the semantic leg of the
frozen-index lifecycle (semantic_prune_incremental): the frozen
corpus's cell assignment is written ONCE as a bucketBy(cl) release
table; each probe assigns ONLY a fixed-size delta with the frozen
centroids and cogroup-prunes per cell. Claims measured: probe wall
~flat in CORPUS size at the same absolute delta (sf1 vs sf3), and the
frozen side's plan subtree read from the bucketed table. Each corpus
runs in its own subprocess (bench-isolation rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from overturelink_data_pipeline_spark.session import get_spark

#: Mean vectors per k-means cell the k ∝ n mode targets.
TARGET_CELL = 600


def cell_stats(spark, sf_dir: str, k: int):
    """Assignment-level census for the given k (the internal surfaces
    semantic_prune itself uses)."""
    from overturelink_data_pipeline_spark.operators.dedup import with_planted_copies
    from overturelink_data_pipeline_spark.operators.similarity import (
        SEMDEDUP_MODULUS,
        _lloyd_assign,
        _lloyd_fit,
    )
    from overturelink_data_pipeline_spark.session import ensure_parallelism, read_table

    emb = ensure_parallelism(read_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    perturbed = F.concat(
        F.array(F.element_at("v", 1) + 0.05),
        F.slice("v", 2, F.size("v") - 1),
    )
    corpus = with_planted_copies(
        emb, SEMDEDUP_MODULUS, mangle={"v": perturbed}, id_col="vec_id"
    )
    sizes = (
        _lloyd_assign(corpus, _lloyd_fit(corpus, k=k))
        .groupBy("cl")
        .count()
        .select(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("count").alias("n"),
            F.round(F.avg("count"), 1).alias("mean_cell"),
            F.percentile_approx("count", 0.95).alias("p95_cell"),
            F.max("count").alias("max_cell"),
            F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("total_pairs"),
            F.max(F.col("count") * (F.col("count") - 1) / 2).alias("max_cell_pairs"),
        )
        .collect()[0]
    )
    return sizes.asDict()


_INCR_CHILD = r"""
import json, shutil, sys, time
sys.path.insert(0, "/root/repo")
corpus_dir, wh = sys.argv[1], sys.argv[2]
shutil.rmtree(wh, ignore_errors=True)
from pyspark.sql import SparkSession, functions as F
spark = (
    SparkSession.builder.master("local[32]")
    .appName("bench-incr-semantic")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.warehouse.dir", wh)
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from overturelink_data_pipeline_spark.operators.similarity import (
    KMEANS_K, _lloyd_assign, _lloyd_fit, incremental_cell_prune,
)

TARGET_CELL = 600
emb = spark.read.parquet(f"{corpus_dir}/embeddings.parquet").select(
    "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
)
n = emb.count()
k = max(KMEANS_K, round(n / TARGET_CELL))

# ---- release time: fit on the frozen corpus, write assignment
# bucketed by cell id (the artifact every probe reads in place) ------
t0 = time.time()
cents = _lloyd_fit(emb, k=k)
(
    _lloyd_assign(emb, cents)
    .write.bucketBy(32, "cl")
    .mode("overwrite")
    .saveAsTable("frozen_cells")
)
build_s = round(time.time() - t0, 2)

# probe-session setup (once per session, amortized across the month's
# probes): the Python cogroup demands exact HashPartitioning(cl, 32) —
# bucketing alone does not satisfy FlatMapCoGroupsInPandas — so load
# the release table into a persisted cl-partitioned cache; every probe
# then reads the frozen side partition-local with NO corpus exchange
# (the dedup_incremental posting recipe, cell-keyed).
t0 = time.time()
frozen = spark.table("frozen_cells").repartition(32, "cl").persist()
frozen.count()
setup_s = round(time.time() - t0, 2)

def probe_frame(target_docs):
    frac = min(1.0, target_docs / max(n, 1))
    delta = emb.filter(
        F.abs(F.xxhash64("vec_id")) % 10000 < int(frac * 10000)
    ).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("v", 1) + 0.05),
            F.slice("v", 2, F.size("v") - 1),
        ).alias("v"),
    )
    return incremental_cell_prune(frozen, _lloyd_assign(delta, cents))

# plan-shape assertion: the persisted cl-partitioned cache must feed
# the cogroup WITHOUT a second exchange — only the delta side's
# assignment output may shuffle.
plan = probe_frame(2000)._jdf.queryExecution().executedPlan().toString()
frozen_bucketed = "SelectedBucketsCount" in plan or "Bucketed: true" in plan
import re as _re
# distinct cl-keyed exchanges: expect exactly ONE (the delta side's
# assignment output) — a second means the persisted frozen cache is
# being re-exchanged, i.e. the probe re-shuffles the corpus
cl_exchanges = len(set(
    m.group(1)
    for m in _re.finditer(
        r"Exchange hashpartitioning\(cl#.*?\[plan_id=(\d+)\]", plan
    )
))
assert cl_exchanges <= 1, plan[:3000]

rows = []
for target in (500, 2000):
    probe_frame(target).write.format("noop").mode("overwrite").save()  # warm
    times = []
    for _ in range(3):
        t0 = time.time()
        probe_frame(target).write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    times.sort()
    rows.append(
        {
            "corpus": corpus_dir,
            "n_vectors": n,
            "k": k,
            "delta_vectors": target,
            "probe_s": round(times[1], 2),
            "pruned": probe_frame(target).count(),
        }
    )

print(
    "RESULT "
    + json.dumps(
        {
            "build_s": build_s,
            "setup_s": setup_s,
            "frozen_bucketed": frozen_bucketed,
            "cl_exchanges_per_probe": cl_exchanges,
            "rows": rows,
        }
    )
)
"""


def _run_incremental(dirs) -> None:
    import os as _os
    import subprocess as _sp

    for d in dirs:
        if not _os.path.exists(_os.path.join(d, "embeddings.parquet")):
            print(f"skip {d}: no embeddings.parquet (run gen_sf1.py)")
            continue
        wh = f"/tmp/incr_sem_wh_{_os.path.basename(d)}"
        try:
            r = _sp.run(
                [sys.executable, "-c", _INCR_CHILD, d, wh],
                capture_output=True,
                text=True,
                timeout=900,
            )
        except _sp.TimeoutExpired:
            print(f"CHILD TIMEOUT for {d}")
            continue
        line = next(
            (l for l in r.stdout.splitlines() if l.startswith("RESULT ")), None
        )
        if line is None:
            print(
                f"CHILD FAILED for {d}:\n"
                f"{r.stdout[-1500:]}\n{r.stderr[-1500:]}"
            )
            continue
        print(line[len("RESULT ") :], flush=True)


def main() -> None:
    argv = sys.argv[1:]
    if "--incremental" in argv:
        argv.remove("--incremental")
        _run_incremental(argv or ["/tmp/testdata/sf1", "/tmp/testdata/sf3"])
        return
    dirs = argv or ["/tmp/testdata/sf1", "/tmp/testdata/sf3"]
    spark = get_spark(app_name="semantic-scale")
    from overturelink_data_pipeline_spark.operators.similarity import (
        KMEANS_K,
        semantic_prune,
    )

    for d in dirs:
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            sys.exit(f"no embeddings.parquet under {d} — run gen_sf1.py first")
        n = spark.read.parquet(os.path.join(d, "embeddings.parquet")).count()
        k_scaled = max(KMEANS_K, round(n / TARGET_CELL))
        for mode, k in (("fixed", KMEANS_K), ("k_prop_n", k_scaled)):
            stats = cell_stats(spark, d, k)
            t0 = time.time()
            pruned = semantic_prune(spark, d, k=k).count()
            wall = round(time.time() - t0, 1)
            print(
                json.dumps(
                    {
                        "corpus": d,
                        "mode": mode,
                        "k": k,
                        "pruned_rows": pruned,
                        "wall_s": wall,
                        **{m: float(v) for m, v in stats.items()},
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
