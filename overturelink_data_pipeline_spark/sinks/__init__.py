"""Sinks (SURVEY.md §7.1 steps 5+7): GeoJSON / GeoJSONSeq /
GeoParquet writers and the publish Sink protocol."""
