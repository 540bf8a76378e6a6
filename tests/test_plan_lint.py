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


def _plan(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def _strip_aqe_initial_sections(plan):
    """AQE's plan printer renders the SAME subtree in both its
    "== Initial Plan ==" and final sections; any test that COUNTS
    operators over the raw string would double-count. Keep only the
    final renderings."""
    import re

    return re.split(r"== Initial Plan ==", plan)[0] + "".join(
        part.split("== Final Plan ==", 1)[-1]
        for part in re.split(r"== Initial Plan ==", plan)[1:]
        if "== Final Plan ==" in part
    )


def test_substring_postings_single_exchange(spark, sf_dir):
    """The round-5/6 posting recipe: dedup_exact_substring's EXECUTED
    plan must carry exactly ONE hash exchange of the posting table
    keyed on h (the explicit repartition) — the per-doc distinct, the
    df window, and the collect_list fan-out all consume it
    partition-local. The branch-free round-6 plan references the
    posting subtree three times (cold fan-out + both hot-array join
    sides), so the INITIAL plan prints three textually-identical
    h-exchanges; at runtime AQE's stage reuse collapses them to one
    shuffle write and, on natural corpora, empty-relation propagation
    deletes the hot joins outright. Lint what actually ran: execute,
    then count h-exchanges in the final adaptive plan."""
    import re

    from overturelink_data_pipeline_spark import registry

    df = registry.QUERIES["dedup_exact_substring"](spark, sf_dir)
    df.collect()  # materialize so AQE renders the final plan
    plan = _strip_aqe_initial_sections(
        df._jdf.queryExecution().executedPlan().toString()
    )
    h_exchanges = {
        m.group(2)
        for m in re.finditer(
            r"Exchange hashpartitioning\(([^)]*)\).*?\[plan_id=(\d+)\]", plan
        )
        if re.search(r"\bh#\d+", m.group(1))
    }
    # classification aid (ADVICE r6): a failure with multiple DISTINCT
    # plan_ids and no reuse markers means the recipe itself regressed
    # (a second repartition was introduced); multiple plan_ids that
    # also show ReusedExchange / repeated ShuffleQueryStage ids means
    # AQE's exchange-reuse behavior drifted (Spark version/config), not
    # the recipe — the two need different fixes.
    reuse_markers = sorted(
        set(re.findall(r"ReusedExchange|ShuffleQueryStage \d+", plan))
    )
    assert len(h_exchanges) == 1, (
        f"expected exactly one executed h-keyed posting exchange "
        f"(REPARTITION_BY_COL), got plan_ids {sorted(h_exchanges)}; "
        f"reuse markers present in the final plan: {reuse_markers} "
        f"(none -> second repartition introduced; markers repeating a "
        f"stage id -> AQE reuse regression)"
    )


def test_incremental_minhash_band_single_exchange(spark, sf_dir):
    """dedup_incremental_minhash's frozen-LSH-table stand-in: the band
    table is clustered by ONE explicit (band, bucket) repartition and
    persisted, so the bucket-cap census, the delta filter, and both
    probe-join sides consume it partition-local — the executed plan
    must carry exactly one DISTINCT band-keyed exchange (the
    REPARTITION_BY_COL; the cached-plan subtree prints it once per
    InMemoryTableScan reference, so count plan_ids, not occurrences).
    A second distinct band exchange means the probe re-shuffled the
    corpus — the exact cost the operator exists to avoid."""
    import re

    from overturelink_data_pipeline_spark import registry

    df = registry.QUERIES["dedup_incremental_minhash"](spark, sf_dir)
    df.collect()
    plan = _strip_aqe_initial_sections(
        df._jdf.queryExecution().executedPlan().toString()
    )
    band_exchanges = {
        m.group(2)
        for m in re.finditer(
            r"Exchange hashpartitioning\(([^)]*)\).*?\[plan_id=(\d+)\]", plan
        )
        if re.search(r"\bband#\d+", m.group(1))
    }
    assert len(band_exchanges) == 1, (
        f"expected exactly one distinct band-keyed exchange, "
        f"got plan_ids {sorted(band_exchanges)}"
    )


def test_cms_probe_plan_has_no_joins(spark, sf_dir):
    """agg_count_min_tokens probes the driver-collected grid via
    constant-folded literal arrays: the final plan must contain NO
    join operator at all (the vocabulary min-agg shuffle + broadcast
    join of the round-4 shape are the regression this pins)."""
    plan = _plan(spark, sf_dir, "agg_count_min_tokens")
    assert "Join" not in plan, "CMS probe should be join-free"


def test_bloom_probe_scan_side_is_join_free(spark, sf_dir):
    """text_bloom_decontaminate's shingle probe is a literal-array
    membership test in codegen; the only join allowed is the final
    per-doc left join of hit counts back onto doc ids. (The parent is
    direct-call since the r13 merge, so build the plan off the
    function, not the registry.)"""
    from overturelink_data_pipeline_spark.operators.curation import (
        text_bloom_decontaminate,
    )

    df = text_bloom_decontaminate(spark, sf_dir)
    plan = _strip_aqe_initial_sections(
        df._jdf.queryExecution().executedPlan().toString()
    )
    joins = [l for l in plan.splitlines() if "Join" in l]
    assert len(joins) <= 1, f"expected at most the final doc-id join, got:\n" + "\n".join(joins)
