"""Central gate for the Pallas fast paths.

On a TPU backend the kernels run natively. Setting ZANG_PALLAS_INTERPRET=1
forces the same kernel paths on ANY backend in Pallas interpreter mode —
used by the multi-chip sharding tests to exercise the production kernels
under GSPMD on the virtual CPU mesh (tests/test_parallel.py), where the
default gate would silently fall back to the affine-scan paths.

Both flags are read at TRACE time: toggling them after a surrounding jit
cache is warm has no effect in the same process (same caveat as
ZANG_SVF_TABLE / ZANG_LOOKUP_INTERPRET).
"""

import os

import jax


def force_interpret() -> bool:
    """True when ZANG_PALLAS_INTERPRET=1 demands interpreter-mode kernels."""
    return os.environ.get("ZANG_PALLAS_INTERPRET", "0") == "1"


def enabled() -> bool:
    """Should the Pallas kernel paths be taken on this backend?"""
    return jax.default_backend() != "cpu" or force_interpret()
