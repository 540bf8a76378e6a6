"""Registration-order contract — the standing two-round rotation policy.

The driver's correctness snapshot covers exactly the first 50 registered
queries, so ordering is part of verification. With 90 registered queries
and a 50-row window, the policy (VERDICT r3 ask #1) is: no query's most
recent driver row may ever be more than one round old. This test derives
staleness directly from the CORRECTNESS_r*.json artifacts, so it
re-enforces the policy automatically as new rounds land: after the
driver writes CORRECTNESS_r04.json, the r3-green queries become the
stale set and _PRIORITY_ORDER must rotate them back in for r5.
"""

from __future__ import annotations

from pathlib import Path

from overturelink_data_pipeline_spark import registry

registry.load_all()

REPO = Path(__file__).resolve().parent.parent

DRIVER_WINDOW = 50


def _latest_driver_round() -> dict[str, int]:
    """Shared artifact parser — the rotation generator reads the same
    function, so test and tool can never disagree."""
    return registry.latest_driver_rounds(str(REPO))


def test_stale_queries_inside_driver_window():
    """Every query whose latest driver row predates the most recent round
    (or that has never been checked) must sit inside the first-50 window."""
    latest = _latest_driver_round()
    assert latest, "no CORRECTNESS_r*.json artifacts found"
    current = max(latest.values())
    stale = {n for n in registry.QUERIES if latest.get(n, 0) < current}
    window = set(list(registry.QUERIES)[:DRIVER_WINDOW])
    overflow = stale - window
    # The policy is feasible only while |stale| <= window size; if a
    # round ever adds so many queries that the stale set exceeds 50,
    # fail loudly so the rotation is re-planned rather than silently
    # dropping names.
    assert len(stale) <= DRIVER_WINDOW, (
        f"stale set ({len(stale)}) exceeds the driver window; "
        "two-round rotation is no longer feasible — re-plan"
    )
    assert not overflow, f"stale queries outside driver's first-50 window: {sorted(overflow)}"


def test_priority_order_is_total_and_exact():
    names = set(registry.QUERIES)
    listed = set(registry._PRIORITY_ORDER)
    assert names == listed, (
        f"unlisted queries (would float by import order): {sorted(names - listed)}; "
        f"stale priority entries: {sorted(listed - names)}"
    )
    assert len(registry._PRIORITY_ORDER) == len(listed), "duplicate priority entries"


def test_registration_order_matches_priority_list():
    assert list(registry.QUERIES) == [
        n for n in registry._PRIORITY_ORDER if n in registry.QUERIES
    ]
