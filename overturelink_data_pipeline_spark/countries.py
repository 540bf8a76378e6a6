"""Global country registry (reference config/countries.py:13-30,
data/countries.json).

The data file is the reference's public registry verbatim — 176
countries of {name, iso2, iso3, region, bbox} where bbox is Natural
Earth [min_lon, min_lat, max_lon, max_lat] in EPSG:4326. ISO codes and
country bounding boxes are public geographic facts; only the data is
shared, the lookup machinery below is new.

Unlike the reference's linear scans (config/countries.py:44-66 loops
over all countries for ISO3 and name lookups), lookups here go through
prebuilt dict indexes — O(1) per call, which matters when a driver
resolves countries inside a 176-country batch export loop.
"""

from __future__ import annotations

import os
from functools import lru_cache

from overturelink_data_pipeline_spark.plans.models import Country, load_countries

_DATA = os.path.join(os.path.dirname(__file__), "data", "countries.json")


@lru_cache(maxsize=1)
def _registry() -> tuple[dict[str, Country], dict[str, Country], dict[str, Country]]:
    """(by_iso2, by_iso3, by_lower_name) indexes over the packaged data
    — parsed by plans.models.load_countries (the one countries.json
    parser in the codebase)."""
    countries = list(load_countries(_DATA).values())
    return (
        {c.iso2.upper(): c for c in countries},
        {c.iso3.upper(): c for c in countries},
        {c.name.lower(): c for c in countries},
    )


def get_country(identifier: str) -> Country | None:
    """Resolve by ISO2, ISO3, exact name, or name substring (the
    reference's lookup ladder, config/countries.py:37-66) — first three
    tiers are dict hits; the substring tier falls back to one scan."""
    by2, by3, byname = _registry()
    up = identifier.upper()
    hit = by2.get(up) or by3.get(up) or byname.get(identifier.lower())
    if hit is not None:
        return hit
    # substring tier only for name-length inputs: a 2-3 char token that
    # failed the ISO tiers is a bad code, and letting it substring-match
    # ("zz" ⊂ "Brazzaville") would turn typos into wrong countries
    if len(identifier) <= 3:
        return None
    low = identifier.lower()
    for name, c in byname.items():
        if low in name:
            return c
    return None


def require_country(identifier: str) -> Country:
    """get_country or a ValueError naming near-misses — CLI-facing."""
    c = get_country(identifier)
    if c is None:
        raise ValueError(
            f"unknown country {identifier!r}; use an ISO2/ISO3 code or name "
            f"(see `countries` subcommand)"
        )
    return c


def list_countries(region: str | None = None) -> list[Country]:
    by2, _, _ = _registry()
    out = sorted(by2.values(), key=lambda c: c.iso2)
    if region is not None:
        low = region.lower()
        out = [c for c in out if low in c.region.lower()]
    return out


def list_regions() -> list[str]:
    by2, _, _ = _registry()
    return sorted({c.region for c in by2.values() if c.region})
