"""Registration-order contract — the standing two-round rotation policy.

The driver's correctness snapshot covers exactly the first 50 registered
queries, so ordering is part of verification. The policy (VERDICT r3
ask #1) is: no query's most recent driver row may ever be more than one
round old. Since round 5 the order is DERIVED inside
``registry.load_all()`` from the CORRECTNESS_r*.json artifacts
(never-checked -> stale -> fresh), so these tests assert the derivation
holds rather than a hand-pasted list. The registered-query count is
100 as of r5 — the HARD CEILING for a 50-row window under two-round
rotation (50 stale + 0 free slots every round); adding a query now
requires retiring one, and the feasibility assert below fails loudly
if a round ever violates that.
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
                "ok_q": {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "err": None,
                },
                "rows_only_q": {"hash_match": None, "err": "no_oracle"},
                "crashed_q": {"hash_match": None, "err": "OOM in oracle"},
                # ran but MISMATCHED: must stay stale, not retire to the
                # fresh tail (review r5)
                "mismatched_q": {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": False,
                    "err": None,
                },
            }
        )
    )
    latest = registry.latest_driver_rounds(str(tmp_path))
    assert latest == {"ok_q": 1, "rows_only_q": 1}


def test_derived_rotation_on_synthetic_artifacts(tmp_path, monkeypatch):
    """End-to-end check of derived_rotation_order against synthetic
    CORRECTNESS artifacts: never-checked first, then an oracle-gap
    query (rows predate its oracle), then stale oldest-first, then
    fresh — with _PRIORITY_ORDER breaking ties."""
    import json

    green = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"stale_old": green, "gap_q": {"err": "no_oracle"}})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {
                "fresh_a": green,
                "fresh_b": green,
                "gap_q": {"err": "no_oracle"},
                "crashed": {"err": "oracle OOM"},
            }
        )
    )
    fake_queries = {
        n: (lambda s, d: None)
        for n in ["fresh_b", "fresh_a", "stale_old", "gap_q", "crashed", "brand_new"]
    }
    monkeypatch.setattr(registry, "QUERIES", fake_queries)
    monkeypatch.setattr(registry, "ORACLE", {"gap_q": "SELECT 1", "fresh_a": "SELECT 1"})
    monkeypatch.setattr(
        registry,
        "_PRIORITY_ORDER",
        ("fresh_a", "fresh_b", "stale_old", "gap_q", "crashed", "brand_new"),
    )
    order = registry.derived_rotation_order(str(tmp_path))
    # tier 0: brand_new (never), crashed (errored rows never count),
    # gap_q (oracle-backed, rows all predate the oracle) — priority
    # tie-break puts gap_q before crashed before brand_new;
    # tier 1: stale_old (r1 < r2); tier 2: fresh (r2), priority order.
    assert order == ["gap_q", "crashed", "brand_new", "stale_old", "fresh_a", "fresh_b"]


def test_list_shaped_artifact_counts_latest_not_hashed(tmp_path):
    """review r10 / ADVICE r10: a list-shaped CORRECTNESS artifact
    (bare query names) counts its entries as latest-checked that round
    — but a bare name carries no hash evidence, so it must NOT mark
    them oracle-hash-verified (a list of attempted-but-unhashed
    queries would wrongly skip the rotate-to-front policy)."""
    import json

    from overturelink_data_pipeline_spark.registry import _driver_round_maps

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(["q_a", "q_b"]))
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q_a": {"rows_match": True, "schema_match": True,
                            "hash_match": True, "err": None}})
    )
    latest, hashed = _driver_round_maps(str(tmp_path))
    assert latest == {"q_a": 2, "q_b": 1}
    assert hashed == {"q_a": 2}
