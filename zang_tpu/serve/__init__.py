"""Batch serving: render fleets of independent songs (SCALING.md tier 3)."""

from .batch import BatchRenderer, RenderJob, SharedGraphCache  # noqa: F401
