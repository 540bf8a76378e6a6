"""Shared grouped-top-k building block.

THE two-phase pattern (knn_join introduced it; sample_reservoir and
agg_quantile_sampled reuse it): a single window over the group key
funnels each group's entire population through ONE reducer — the
dominant-source straggler. Phase 1 ranks within (group, input
partition): the shuffle key is salted by ``spark_partition_id()``, so
no reducer sees more than one partition's share, and at most ``k``
rows per (group, partition) survive. Phase 2 ranks the surviving
``≤ k × P`` rows per group — a frame bounded by k × shuffle width,
never by the data. Per-partition top-k is also the mergeable-sample
property that makes hash reservoirs the standard distributed sampler.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column | str],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-``k`` rows per group in the order given by ``order_cols``
    (pass ``desc()`` columns for descending), with a ``row_number``
    rank 1..k in ``rank_col`` — ties get distinct ranks, so exactly
    ``k`` rows survive per group. Two-phase: see module doc."""
    local = Window.partitionBy(*group_cols, F.spark_partition_id()).orderBy(
        *order_cols
    )
    survivors = df.withColumn("_lrk", F.row_number().over(local)).filter(
        F.col("_lrk") <= k
    )
    final = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        survivors.withColumn(rank_col, F.row_number().over(final))
        .filter(F.col(rank_col) <= k)
        .drop("_lrk")
    )
