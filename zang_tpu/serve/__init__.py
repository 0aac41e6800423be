"""Serving: batch song fleets (tier 3) + live session fleets and their TCP front-end (tier 4)."""

from .batch import BatchRenderer, RenderJob, SharedGraphCache  # noqa: F401
from .client import TerminalPlayer  # noqa: F401
from .live import LiveFleet  # noqa: F401
from .server import LiveClient, LiveServer  # noqa: F401
