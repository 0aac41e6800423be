"""zang_tpu — a TPU-native modular audio synthesis framework.

A ground-up rebuild of the capabilities of dbandstra/zang (a Zig real-time
audio synthesis library) designed for TPU hardware with JAX/XLA/Pallas:

- Modules are pure functions ``(state, params) -> (state, audio)`` over
  ``[..., time]`` tensors instead of imperative per-sample paint loops
  (reference: src/zang.zig:1-41, module protocol src/modules/SineOsc.zig:8-31).
- Note events compile host-side into dense segment tables ("events become
  data"); the Trigger/ImpulseQueue span machinery (src/zang/trigger.zig,
  src/zang/notes.zig) runs on host and produces tensors the device consumes.
- Per-sample recurrences (SVF filter, envelopes, delays) are reformulated as
  chunked affine scans / gather programs that keep the time axis parallel.
- Polyphony is a leading voice axis; mixdown is a sum (shardable with psum
  over a device mesh).

Subpackages:
  core      host-side event system, timeline compiler, mixdown, WAV, pitch
  ops       TPU kernels for the 13 DSP modules + scan utilities
  graph     module protocol, voices, offline renderer
  oracle    NumPy/C++ reference engine with exact zang semantics (golden)
  parallel  device-mesh sharding (voice/batch axes)
  script    zangscript compiler (tokenizer/parser/codegen/JAX backend)
  host      song parser, instruments, example programs
"""

__version__ = "0.1.0"

from . import core  # noqa: F401
