"""Engine-wide physical-plan lint: no registered query may compile to
the two anti-patterns that break at 100 TB —

- ``BatchEvalPython``: a row-at-a-time Python UDF in the plan (every
  Python boundary here must be Arrow-batched: ArrowEvalPython /
  FlatMapGroupsInPandas / MapInPandas);
- ``CartesianProduct``: an unbroadcast all-pairs join (the intended
  1-row/bounded cross joins compile to BroadcastNestedLoopJoin).

Building ``executedPlan`` also executes the driver-bounded eager parts
(k-means fits, streaming drains), so this doubles as a smoke pass.
"""

from __future__ import annotations

import pytest

from overturelink_data_pipeline_spark import registry

registry.load_all()

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_no_slow_path_operators(spark, sf_dir, name, monkeypatch):
    # localCheckpoint TRUNCATES the logical plan (that is its job in
    # the iterative ops), which would blind this lint to everything
    # upstream of the checkpoint — no-op it so the full lineage of
    # dedup_clusters / graph_pagerank_dupes is linted too.
    from pyspark.sql import DataFrame

    monkeypatch.setattr(
        DataFrame, "localCheckpoint", lambda self, eager=True: self
    )
    df = registry.QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    hits = [k for k in FORBIDDEN if k in plan]
    assert not hits, f"{name}: forbidden physical operators {hits}"
