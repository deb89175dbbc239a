"""Sinks: GeoJSON feature emission and batched HTTP POST."""
