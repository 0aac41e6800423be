"""Builtin module/enum registry for zangscript.

The reference builds this via comptime reflection over the Zig module
structs (src/zangscript/builtins.zig); here the same information is
declared explicitly. Param order matches the Zig Params struct field order
(it matters for call-arg positional binding of `sample_rate` threading and
for dump output). Sampler is intentionally absent (builtins.zig:175): its
param types aren't representable in the DSL.
"""

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


@dataclass(frozen=True)
class BuiltinEnumValue:
    label: str
    payload: Optional[str] = None  # None or "f32"


@dataclass(frozen=True)
class BuiltinEnum:
    name: str
    values: Tuple[BuiltinEnumValue, ...]

    def allows(self, label: str, has_float_payload: bool) -> bool:
        for v in self.values:
            if v.label == label:
                return (v.payload == "f32") == has_float_payload
        return False


PAINT_CURVE = BuiltinEnum("PaintCurve", (
    BuiltinEnumValue("instantaneous"),
    BuiltinEnumValue("linear", "f32"),
    BuiltinEnumValue("squared", "f32"),
    BuiltinEnumValue("cubed", "f32"),
))

INTERPOLATION_FUNCTION = BuiltinEnum("InterpolationFunction", (
    BuiltinEnumValue("linear"),
    BuiltinEnumValue("smoothstep"),
))

DISTORTION_TYPE = BuiltinEnum("DistortionType", (
    BuiltinEnumValue("overdrive"),
    BuiltinEnumValue("clip"),
))

FILTER_TYPE = BuiltinEnum("FilterType", (
    BuiltinEnumValue("bypass"),
    BuiltinEnumValue("low_pass"),
    BuiltinEnumValue("band_pass"),
    BuiltinEnumValue("high_pass"),
    BuiltinEnumValue("notch"),
    BuiltinEnumValue("all_pass"),
))

NOISE_COLOR = BuiltinEnum("NoiseColor", (
    BuiltinEnumValue("white"),
    BuiltinEnumValue("pink"),
))


@dataclass(frozen=True)
class ParamType:
    """kind: boolean | buffer | constant | constant_or_buffer | curve | one_of"""

    kind: str
    enum: Optional[BuiltinEnum] = None

    def __str__(self) -> str:
        return self.enum.name if self.kind == "one_of" else self.kind


BOOLEAN = ParamType("boolean")
BUFFER = ParamType("buffer")
CONSTANT = ParamType("constant")
COB = ParamType("constant_or_buffer")
CURVE = ParamType("curve")


def one_of(e: BuiltinEnum) -> ParamType:
    return ParamType("one_of", e)


@dataclass(frozen=True)
class ModuleParam:
    name: str
    param_type: ParamType


@dataclass(frozen=True)
class BuiltinModule:
    name: str
    params: Tuple[ModuleParam, ...]
    num_temps: int = 0
    num_outputs: int = 1


def _p(name, pt) -> ModuleParam:
    return ModuleParam(name, pt)


BUILTIN_MODULES: List[BuiltinModule] = [
    BuiltinModule("Curve", (
        _p("sample_rate", CONSTANT),
        _p("function", one_of(INTERPOLATION_FUNCTION)),
        _p("curve", CURVE),
    )),
    BuiltinModule("Cycle", (
        _p("sample_rate", CONSTANT),
        _p("speed", COB),
    )),
    BuiltinModule("Decimator", (
        _p("sample_rate", CONSTANT),
        _p("input", BUFFER),
        _p("fake_sample_rate", CONSTANT),
    )),
    BuiltinModule("Distortion", (
        _p("input", BUFFER),
        _p("type", one_of(DISTORTION_TYPE)),
        _p("ingain", CONSTANT),
        _p("outgain", CONSTANT),
        _p("offset", CONSTANT),
    )),
    BuiltinModule("Envelope", (
        _p("sample_rate", CONSTANT),
        _p("attack", one_of(PAINT_CURVE)),
        _p("decay", one_of(PAINT_CURVE)),
        _p("release", one_of(PAINT_CURVE)),
        _p("sustain_volume", CONSTANT),
        _p("note_on", BOOLEAN),
    )),
    BuiltinModule("Filter", (
        _p("input", BUFFER),
        _p("type", one_of(FILTER_TYPE)),
        _p("cutoff", COB),
        _p("res", COB),
    )),
    BuiltinModule("Gate", (
        _p("note_on", BOOLEAN),
    )),
    BuiltinModule("Noise", (
        _p("color", one_of(NOISE_COLOR)),
    )),
    BuiltinModule("Portamento", (
        _p("sample_rate", CONSTANT),
        _p("curve", one_of(PAINT_CURVE)),
        _p("goal", CONSTANT),
        _p("note_on", BOOLEAN),
        _p("prev_note_on", BOOLEAN),
    )),
    BuiltinModule("PulseOsc", (
        _p("sample_rate", CONSTANT),
        _p("freq", COB),
        _p("color", CONSTANT),
    )),
    BuiltinModule("SineOsc", (
        _p("sample_rate", CONSTANT),
        _p("freq", COB),
        _p("phase", COB),
    )),
    BuiltinModule("TriSawOsc", (
        _p("sample_rate", CONSTANT),
        _p("freq", COB),
        _p("color", CONSTANT),
    )),
]

BUILTIN_ENUMS: List[BuiltinEnum] = [
    PAINT_CURVE,
    INTERPOLATION_FUNCTION,
    DISTORTION_TYPE,
    FILTER_TYPE,
    NOISE_COLOR,
]
