"""Serving tiers: batch WAV rendering (tier 3) and live sessions (tier 4).

Lazy re-exports: `python -m zang_tpu.serve.server` must not re-execute a
module this package already imported (runpy warns), and importing the
thin TCP client should not pay for the jax-heavy batch machinery.
"""

_LAZY = {
    "BatchRenderer": ("zang_tpu.serve.batch", "BatchRenderer"),
    "RenderJob": ("zang_tpu.serve.batch", "RenderJob"),
    "SharedGraphCache": ("zang_tpu.serve.batch", "SharedGraphCache"),
    "TerminalPlayer": ("zang_tpu.serve.client", "TerminalPlayer"),
    "LiveFleet": ("zang_tpu.serve.live", "LiveFleet"),
    "LiveClient": ("zang_tpu.serve.server", "LiveClient"),
    "LiveServer": ("zang_tpu.serve.server", "LiveServer"),
    "MultiInstrumentServer": ("zang_tpu.serve.server",
                              "MultiInstrumentServer"),
    "RenderHTTPServer": ("zang_tpu.serve.http", "RenderHTTPServer"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'zang_tpu.serve' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
