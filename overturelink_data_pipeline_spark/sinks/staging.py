"""S13 — staging-file creation for publish uploads (reference
export.py:148-253): materialize a frame (or multi-layer dict) as a
temporary GeoJSON / GPKG / zipped-FileGDB artifact the publish sink
can hand to a feature service's ``add item`` call.

Driver-side by design, like the reference: staged artifacts are
single files bounded at country scale. The scalable path for bulk
data movement is the distributed sinks (GeoParquet / GeoJSONSeq);
staging exists only to feed S12-style service seeding.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame

from overturelink_data_pipeline_spark.sinks.geojson import write_geojson
from overturelink_data_pipeline_spark.sinks.geoparquet import write_filegdb
from overturelink_data_pipeline_spark.sinks.gpkg import write_gpkg_layers


def stage_file(
    layers: dict[str, DataFrame] | DataFrame,
    fmt: str = "geojson",
    staging_dir: str | None = None,
    name: str = "staged",
) -> str:
    """Create a staging artifact; returns its path. ``fmt`` is one of
    ``geojson`` and ``gpkg`` (both always available — GPKG is the
    pure-stdlib sqlite3 writer, sinks/gpkg.py) or ``fgdb`` (the one
    format still gated on pyogrio/GDAL, S10; fgdb output is zipped as
    the reference zips the .gdb directory, export.py:227-246)."""
    staging_dir = staging_dir or tempfile.mkdtemp(prefix="ol_stage_")
    os.makedirs(staging_dir, exist_ok=True)
    if fmt == "geojson":
        path = os.path.join(staging_dir, f"{name}.geojson")
        write_geojson(layers, path)
        return path
    frames = {"layer": layers} if isinstance(layers, DataFrame) else layers
    if fmt == "gpkg":
        path = os.path.join(staging_dir, f"{name}.gpkg")
        # the canonical multi-layer loop lives in the sink (review r10:
        # staging hand-rolled the same 'w'-first/'a'-rest dance)
        write_gpkg_layers(frames, path)
        return path
    if fmt == "fgdb":
        gdb_dir = os.path.join(staging_dir, f"{name}.gdb")
        # fresh dataset per staging run (review r10): layering onto a
        # leftover .gdb in a caller-provided staging_dir would append
        # rows into stale same-name layers under GDAL's append
        # semantics instead of replacing them
        shutil.rmtree(gdb_dir, ignore_errors=True)
        for i, (layer_name, df) in enumerate(frames.items()):
            write_filegdb(df, gdb_dir, layer=layer_name, mode="w" if i == 0 else "a")
        zipped = shutil.make_archive(gdb_dir, "zip", staging_dir, f"{name}.gdb")
        return zipped
    raise ValueError(f"unknown staging format {fmt!r}")


def cleanup_staging(path: str) -> None:
    """Remove a staged artifact and its temp dir (reference registers
    cleanup handlers, cleanup.py; ours is explicit). In a
    caller-provided staging dir (no ol_stage_ prefix) the artifact's
    companions go too: an fgdb staging leaves the unzipped ``.gdb``
    directory next to the zip, which otherwise accumulated one full
    FileGDB per publish cycle (review r10)."""
    d = os.path.dirname(os.path.abspath(path))
    if os.path.basename(d).startswith("ol_stage_"):
        shutil.rmtree(d, ignore_errors=True)
        return
    if path.endswith(".gdb.zip"):
        shutil.rmtree(path[: -len(".zip")], ignore_errors=True)
    if os.path.exists(path):
        os.remove(path)
