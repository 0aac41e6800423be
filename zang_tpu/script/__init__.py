"""zangscript: the modular-synthesis DSL, retargeted to JAX.

A ground-up Python port of the reference compiler pipeline
(src/zangscript/): tokenizer -> recursive-descent parser -> bytecode
codegen (buffer/float SSA-ish IR with ref-counted temps), plus a JAX
backend that builds device render functions from the bytecode (replacing
the reference's Zig source emitter and its bit-rotted runtime interpreter —
re-jit on reload is strictly more capable: script delays honor their
declared lengths and track calls work, unlike runtime.zig:292,508-514).
"""

from .compile import compile_script, CompiledScript  # noqa: F401
from .errors import ScriptError  # noqa: F401
