"""Graph layer: instrument protocol, performance assembly, chunked renderer."""

from .render import Performance, RenderCtx, render_performance  # noqa: F401
