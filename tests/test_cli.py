"""CLI lifecycle tests (VERDICT r1 item 7): one end-to-end
``python -m``-equivalent invocation per reference lifecycle
(export §3.2, cache §3.3 --download-only, dump §3.3 mirror), plus the
registry surface. main() is called in-process so the session fixture's
JVM is reused; the argv paths are exactly what a shell invocation hits.
"""

from __future__ import annotations

import json
import os
import sqlite3

import pytest

from overturelink_data_pipeline_spark import countries as registry
from overturelink_data_pipeline_spark.cli import main


@pytest.fixture(autouse=True)
def _reuse_session_spark(spark, monkeypatch):
    """Route the CLI's session factory at the test session (getOrCreate
    would anyway, but this keeps conf untouched)."""
    import overturelink_data_pipeline_spark.cli as cli

    monkeypatch.setattr(cli, "_spark", lambda args: spark)


def test_registry_lookups():
    af = registry.get_country("AF")
    assert af is not None and af.iso3 == "AFG" and len(af.bbox) == 4
    assert registry.get_country("AFG") == af
    assert registry.get_country("Afghanistan") == af
    assert registry.get_country("afghan") == af  # substring tier
    assert registry.get_country("ZZ") is None
    with pytest.raises(ValueError):
        registry.require_country("ZZ")
    assert len(registry.list_countries()) == 176
    sa = registry.list_countries(region="South Asia")
    assert af in sa and all("South Asia" in c.region for c in sa)
    assert "South Asia" in registry.list_regions()


def test_cli_countries(capsys):
    assert main(["countries", "--region", "South Asia"]) == 0
    out = capsys.readouterr().out
    assert "AF\tAFG" in out
    assert main(["countries", "--regions"]) == 0
    assert "South Asia" in capsys.readouterr().out


def test_cli_export_geojson(tmp_path, capsys):
    out = str(tmp_path / "aaa_roads.geojson")
    assert main([
        "export", "roads", out, "--country", "AA", "--format", "geojson",
        "--limit", "50",
    ]) == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["written"] == out
    with open(out) as f:
        fc = json.load(f)
    assert fc["type"] == "FeatureCollection"
    assert 0 < len(fc["features"]) <= 50
    assert result["features"] == len(fc["features"])
    # normalized schema: metadata enrichment columns present
    props = fc["features"][0]["properties"]
    assert props["country_iso3"] == "AAA"


def test_cli_export_gpkg_multilayer(tmp_path, capsys):
    out = str(tmp_path / "aaa_education.gpkg")
    assert main([
        "export", "education", out, "--country", "AA", "--format", "gpkg",
    ]) == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(result["layers"]) >= {"places", "buildings"}
    con = sqlite3.connect(out)
    names = {r[0] for r in con.execute(
        "SELECT table_name FROM gpkg_contents"
    )}
    assert {"places", "buildings"} <= names
    n = con.execute('SELECT count(*) FROM "places"').fetchone()[0]
    con.close()
    assert n > 0 and result["features"] >= n


def test_cli_cache_lifecycle(tmp_path, capsys):
    root = str(tmp_path / "cache")
    assert main([
        "cache", "education", "--country", "AA", "--cache-root", root,
    ]) == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["country"] == "AA" and result["rows"] > 0
    assert os.path.exists(result["cached"])
    # sidecar exists next to the parquet (S5)
    assert os.path.exists(result["cached"] + ".meta.json") or any(
        f.endswith(".json") for f in os.listdir(os.path.dirname(result["cached"]))
    )


def test_cli_dump_lifecycle(tmp_path, capsys):
    root = str(tmp_path / "dump")
    assert main([
        "dump", "places", "--dump-root", root, "--release", "2026-05-15.0",
    ]) == 0
    side = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert side["complete"] and side["release"] == "2026-05-15.0"
    assert os.path.isdir(os.path.join(root, "theme=places"))


def test_cli_export_shapefile(tmp_path, capsys):
    out = str(tmp_path / "aaa_roads.shp")
    assert main([
        "export", "roads", out, "--country", "AA", "--format", "shapefile",
        "--limit", "25",
    ]) == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["features"] > 0
    for ext in (".shp", ".shx", ".dbf", ".prj", ".cpg"):
        assert os.path.exists(out[:-4] + ext), ext
    from overturelink_data_pipeline_spark.sinks.shapefile import read_shapefile

    rows = read_shapefile(out)
    assert len(rows) == result["features"]
    # roads are LineStrings → PolyLine (3); attrs carry the ISO3 tag
    assert all(r["shape_type"] in (0, 3) for r in rows)
    assert rows[0]["attrs"].get("COUNTRY_IS") == "AAA"


def test_cli_publish_lifecycle(capsys):
    assert main([
        "publish", "education", "--country", "AA", "--seed-count", "10",
        "--batch-size", "50",
    ]) == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["mode"] == "initial"
    assert set(result["layers"]) >= {"places", "buildings"}
    for layer in result["layers"].values():
        assert layer["rows"] == layer["uploaded"] >= 0
    assert any(v["rows"] > 0 for v in result["layers"].values())


def test_cli_export_geoparquet_multilayer(tmp_path, capsys):
    out = str(tmp_path / "aaa_education_gpq")
    assert main([
        "export", "education", out, "--country", "AA",
        "--format", "geoparquet",
    ]) == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # every layer written, feature count reported (was: first layer
    # only + features: null)
    assert result["features"] > 0
    for name in result["layers"]:
        assert os.path.isdir(os.path.join(out, f"layer={name}")), name


def test_cli_admin_commands(tmp_path, capsys):
    # list-queries
    assert main(["list-queries"]) == 0
    out = capsys.readouterr().out
    assert "education" in out and "multilayer" in out
    # populate a cache, then list + clear it
    root = str(tmp_path / "cache")
    main(["cache", "roads", "--country", "AA", "--cache-root", root])
    capsys.readouterr()
    assert main(["list-cache", "--cache-root", root]) == 0
    out = capsys.readouterr().out
    assert "transportation/segment" in out
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["files"] >= 1 if "files" in stats else stats
    assert main(["clear-cache", "--cache-root", root]) == 0
    assert json.loads(capsys.readouterr().out.strip())["removed"] >= 1
    assert main(["list-cache", "--cache-root", root]) == 0
    assert "transportation/segment" not in capsys.readouterr().out
    # version
    assert main(["version"]) == 0
    v = json.loads(capsys.readouterr().out.strip())
    assert v["engine"] == "overturelink_data_pipeline_spark"
