"""Registration-order contract — the standing two-round rotation policy.

The driver's correctness snapshot covers exactly the first 50 registered
queries, so ordering is part of verification. The policy (VERDICT r3
ask #1) is: no query's most recent driver row may ever be more than one
round old. Since round 5 the order is DERIVED inside
``registry.load_all()`` from the CORRECTNESS_r*.json artifacts
(never-checked -> stale -> fresh), so these tests assert the derivation
holds rather than a hand-pasted list. The registered-query count grows
round over round (98 as of r4); with a 50-row window the policy stays
feasible while the stale tier fits in 50 — the feasibility assert below
fails loudly if a round ever adds too many queries for two-round
rotation.
"""

from __future__ import annotations

from pathlib import Path

from overturelink_data_pipeline_spark import registry

registry.load_all()

REPO = Path(__file__).resolve().parent.parent

DRIVER_WINDOW = 50


def _latest_driver_round() -> dict[str, int]:
    """Shared artifact parser — the rotation generator and load_all()
    read the same function, so test and tool can never disagree."""
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
    """_PRIORITY_ORDER remains the explicit tie-break base order: every
    registered query must be listed (a new query can't silently float on
    import order) and no stale names may linger."""
    names = set(registry.QUERIES)
    listed = set(registry._PRIORITY_ORDER)
    assert names == listed, (
        f"unlisted queries (add to _PRIORITY_ORDER): {sorted(names - listed)}; "
        f"stale priority entries: {sorted(listed - names)}"
    )
    assert len(registry._PRIORITY_ORDER) == len(listed), "duplicate priority entries"


def test_registration_order_is_the_derived_rotation():
    """load_all() must have applied exactly the derived order."""
    assert list(registry.QUERIES) == registry.derived_rotation_order(str(REPO))


def test_derived_order_tiers():
    """Never-checked queries precede stale ones, which precede fresh
    ones, and stale queries come oldest-round-first. An oracle-backed
    query whose driver rows all predate its oracle (hash_only latest
    = 0) counts as never-checked, mirroring derived_rotation_order."""
    latest = _latest_driver_round()
    hashed = registry.latest_driver_rounds(str(REPO), hash_only=True)
    current = max(latest.values()) if latest else 0

    def tier(n: str) -> tuple[int, int]:
        rnd = latest.get(n, 0)
        if n in registry.ORACLE and hashed.get(n, 0) == 0:
            rnd = 0
        return (0 if rnd == 0 else (1 if rnd < current else 2), rnd)

    tiers = [tier(n) for n in registry.QUERIES]
    assert tiers == sorted(tiers), "derived order violates tier monotonicity"


def test_errored_rows_do_not_count_as_fresh(tmp_path):
    """A driver row with a non-null err (other than the no_oracle
    sentinel) must not mark the query fresh (ADVICE r4)."""
    import json

    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "ok_q": {"hash_match": True, "err": None},
                "rows_only_q": {"hash_match": None, "err": "no_oracle"},
                "crashed_q": {"hash_match": None, "err": "OOM in oracle"},
            }
        )
    )
    latest = registry.latest_driver_rounds(str(tmp_path))
    assert latest == {"ok_q": 1, "rows_only_q": 1}
