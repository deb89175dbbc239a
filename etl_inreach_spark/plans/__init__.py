"""Composed pipelines (the reference's control() bodies as plans)."""
