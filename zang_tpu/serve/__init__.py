"""Serving: batch song fleets (tier 3) + live session fleets (tier 4)."""

from .batch import BatchRenderer, RenderJob, SharedGraphCache  # noqa: F401
from .live import LiveFleet  # noqa: F401
