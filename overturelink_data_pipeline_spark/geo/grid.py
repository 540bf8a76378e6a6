"""Spatial partitioning keys — the scale extension the reference never
needed (its unit of parallelism is one country) but a 100 TB Spark
deployment lives by: writing feature tables bucketed/partitioned by a
spatial cell key makes country clips partition-prunable and spatial
joins co-located.

Two keys, both pure Catalyst arithmetic (whole-stage codegen, usable
in ``partitionBy``/``bucketBy`` and in Parquet row-group stats):

- ``grid_cell``: row-major cell id on a fixed degree grid;
- ``morton_cell``: Z-order (Morton) interleaving of the cell coords —
  neighboring cells share id prefixes, so range scans over id ranges
  touch spatially-local data (the classic space-filling-curve layout).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cell_coords(lon: Column, lat: Column, res_deg: float) -> tuple[Column, Column]:
    """Integer cell coordinates on a res_deg grid anchored at
    (-180, -90); clamped so the antimeridian/pole edge rows land in
    the last cell instead of one past it."""
    nx = int(360 / res_deg)
    ny = int(180 / res_deg)
    cx = F.least(F.floor((lon + 180.0) / res_deg), F.lit(nx - 1)).cast("long")
    cy = F.least(F.floor((lat + 90.0) / res_deg), F.lit(ny - 1)).cast("long")
    return cx, cy


def grid_cell(lon: Column, lat: Column, res_deg: float = 1.0) -> Column:
    """Row-major cell id: cy * nx + cx."""
    nx = int(360 / res_deg)
    cx, cy = cell_coords(lon, lat, res_deg)
    return (cy * nx + cx).cast("long")


def morton_cell(lon: Column, lat: Column, res_deg: float = 1.0, bits: int = 16) -> Column:
    """Z-order cell id: bitwise interleave of (cx, cy), cx in the even
    positions. Built as 2·bits codegen'd shift/mask terms — no UDF.

    ``bits`` must cover the grid: at fine resolutions 2^bits < nx would
    silently alias cells 2^bits columns apart into one key — the
    widened count is derived here instead of erroring at query time."""
    nx = int(360 / res_deg)
    ny = int(180 / res_deg)
    need = max(nx, ny).bit_length()
    if bits < need:
        bits = need
    if 2 * bits > 63:
        raise ValueError(
            f"res_deg={res_deg} needs {need} bits/axis; interleaved code "
            "would overflow a long"
        )
    cx, cy = cell_coords(lon, lat, res_deg)
    code = F.lit(0).cast("long")
    for i in range(bits):
        bit_x = F.shiftright(cx, i).bitwiseAND(F.lit(1))
        bit_y = F.shiftright(cy, i).bitwiseAND(F.lit(1))
        code = code + F.shiftleft(bit_x, 2 * i) + F.shiftleft(bit_y, 2 * i + 1)
    return code
