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


def main() -> None:
    dirs = sys.argv[1:] or ["/tmp/testdata/sf1", "/tmp/testdata/sf3"]
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
