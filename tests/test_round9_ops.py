"""Round-9 surfaces: the per-shard manifest that replaced
sink_training_shards' driver-side glob (VERDICT r8 ask #2)."""

from __future__ import annotations

import glob
import os

from overturelink_data_pipeline_spark import registry

registry.load_all()


def test_shard_manifest_matches_disk(spark, sf_dir):
    """The manifest committed next to the shard dataset must account
    for exactly the on-disk files (one row per shard) and exactly the
    input rows — the audit trusts it instead of globbing, so this is
    the test that keeps it honest."""
    from overturelink_data_pipeline_spark.operators.curation import SHARD_OUT_DIR

    audit = registry.QUERIES["sink_training_shards"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    man = spark.read.parquet(SHARD_OUT_DIR + "_manifest")
    disk_files = glob.glob(
        os.path.join(SHARD_OUT_DIR, "source=*", "salt=*", "*.parquet")
    )
    assert man.count() == len(disk_files)
    man_paths = {
        r["path"].removeprefix("file://") for r in man.select("path").collect()
    }
    assert man_paths == {os.path.abspath(p) for p in disk_files}
    assert sum(r["n_rows"] for r in audit) == n_docs
    assert sum(r["n_files"] for r in audit) == len(disk_files)
    # per-shard row bound holds in the manifest itself
    from overturelink_data_pipeline_spark.operators.curation import SHARD_MAX_ROWS

    assert man.filter(f"rows > {SHARD_MAX_ROWS}").count() == 0
