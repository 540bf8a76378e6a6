"""YAML config loading (reference config_loader.py:167-277 merges
queries.yml + metadata + country registry; here the query subset).

Only the data-selection fields become plan inputs; AGOL/metadata
fields are sink concerns carried through opaquely.
"""

from __future__ import annotations

import yaml

from overturelink_data_pipeline_spark.plans.models import Query


def parse_queries(text: str) -> dict[str, Query]:
    """queries.yml text → name → Query."""
    raw = yaml.safe_load(text) or {}
    out: dict[str, Query] = {}
    for name, cfg in raw.items():
        out[name] = Query(
            name=name,
            theme=cfg["theme"],
            type=cfg["type"],
            filter=cfg.get("filter"),
            building_filter=cfg.get("building_filter"),
            geometry_split=bool(cfg.get("geometry_split", False)),
            sector_title=cfg.get("sector_title"),
            sector_tag=cfg.get("sector_tag"),
        )
    return out


def load_queries(path: str) -> dict[str, Query]:
    with open(path) as f:
        return parse_queries(f.read())


#: The engine's built-in query set — same data-selection semantics as
#: the reference's shipped configs (reference data/queries.yml: roads,
#: buildings, education, health, markets, places, power).
BUILTIN_QUERIES_YAML = """
roads:
  theme: transportation
  type: segment
  sector_title: Road Network
  sector_tag: roads

buildings:
  theme: buildings
  type: building
  sector_title: Building Footprints
  sector_tag: buildings

education:
  theme: places
  type: place
  filter: "categories.primary = 'education'"
  building_filter: "subtype = 'education'"
  sector_title: Education Facilities
  sector_tag: education

health:
  theme: places
  type: place
  filter: "categories.primary = 'health_and_medical'"
  building_filter: "subtype = 'medical'"
  sector_title: Health Facilities
  sector_tag: health

markets:
  theme: places
  type: place
  filter: "categories.primary IN ('retail', 'shopping', 'food_and_drink')"
  building_filter: "subtype IN ('service', 'commercial')"
  sector_title: Marketplaces
  sector_tag: markets

places:
  theme: places
  type: place
  sector_title: Points of Interest
  sector_tag: places

power:
  theme: base
  type: infrastructure
  filter: "subtype = 'power'"
  geometry_split: true
  sector_title: Power Infrastructure
  sector_tag: power
"""


def builtin_queries() -> dict[str, Query]:
    return parse_queries(BUILTIN_QUERIES_YAML)


def render_metadata(template: dict, context: dict) -> dict:
    """T10 — metadata template interpolation (reference
    config_loader.py:280-408). ``{placeholder}`` fields format against
    the context; a tags value shaped ``"{tags_base} + ['a', 'b']"``
    merges the base list with the literal list via ast.literal_eval —
    replacing the reference's ``eval`` (config_loader.py:380, noted in
    SURVEY.md §7.4) with a parse that cannot execute code."""
    import ast

    out: dict = {}
    for key, value in template.items():
        if not isinstance(value, str):
            out[key] = value
            continue
        if "+" in value and "[" in value and key == "tags":
            base_part, _, list_part = value.partition("+")
            base_key = base_part.strip().strip("{}").strip()
            base = list(context.get(base_key, []))
            extra = ast.literal_eval(list_part.strip())
            if not isinstance(extra, list):
                raise ValueError(f"tags suffix must be a list literal: {value!r}")
            out[key] = base + extra
        else:
            out[key] = value.format(**context)
    return out
