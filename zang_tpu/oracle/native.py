"""Build and load the oracle's native (C++) inner loops via ctypes.

Compiled on demand with g++ (strict fp: -ffp-contract=off, no fast-math) and
cached next to the source; rebuilt when the source is newer than the .so.
"""

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "zang_oracle.cpp")
_SO = os.path.join(_HERE, "native", "zang_oracle.so")

_lib = None


def _build() -> None:
    cmd = [
        "g++",
        "-O2",
        "-std=c++17",
        "-fPIC",
        "-shared",
        "-ffp-contract=off",
        "-fno-fast-math",
        _SRC,
        "-o",
        _SO,
    ]
    subprocess.run(cmd, check=True)


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _build()
    L = ctypes.CDLL(_SO)

    f32p = ctypes.POINTER(ctypes.c_float)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32 = ctypes.c_int
    i64 = ctypes.c_int64
    f32 = ctypes.c_float

    L.zo_sine_exact.argtypes = [f32p, i32, f32p, i32, f32, f32p, i32, f32, f32p, f32]
    L.zo_sine_parity.argtypes = [f32p, i32, u32p, i32, f32, f32p, i32, f32, f32p, f32]
    L.zo_pulse_const.argtypes = [f32p, i32, u32p, f32, f32, f32]
    L.zo_pulse_ctl.argtypes = [f32p, i32, u32p, f32, f32p, f32]
    L.zo_trisaw_const.argtypes = [f32p, i32, u32p, f32, f32, f32]
    L.zo_trisaw_ctl_exact.argtypes = [f32p, i32, f32p, f32, f32p, f32]
    L.zo_trisaw_ctl_parity.argtypes = [f32p, i32, u32p, f32, f32p, f32]
    L.zo_paint_toward.argtypes = [
        f32p, i32, i32, f32p, f32p, f32, i32, f32, f32, f32,
        ctypes.POINTER(ctypes.c_int),
    ]
    L.zo_paint_toward.restype = i32
    L.zo_filter.argtypes = [f32p, f32p, i32, f32p, f32p, f32, f32, f32, i32, f32, f32p, i32, f32, f32p]
    L.zo_noise_pink.argtypes = [f32p, f32p, i32, f32p]
    L.zo_decimator_exact.argtypes = [f32p, f32p, i32, f32p, f32p, f32]
    L.zo_distortion.argtypes = [f32p, f32p, i32, i32, f32, f32, f32]
    L.zo_cycle_exact.argtypes = [f32p, i32, f32p, i32, f32, f32p, f32]
    L.zo_sampler_resample_exact.argtypes = [f32p, i32, f32p, f32, u8p, i64, i32, i32, i32, i32]
    L.zo_sampler_resample_parity.argtypes = [f32p, i32, f32p, f32, u8p, i64, i32, i32, i32, i32]
    L.zo_sampler_copy.argtypes = [f32p, i32, f32, u8p, i64, i32, i32, i32, i32]
    L.zo_curve_linear_exact.argtypes = [f32p, i32, f32, f32]
    L.zo_curve_smoothstep_exact.argtypes = [f32p, i32, f32, f32, f32, f32]
    L.zo_curve_linear_parity.argtypes = [f32p, i32, f32, f32]
    L.zo_curve_smoothstep_parity.argtypes = [f32p, i32, f32, f32, f32, f32]
    L.zo_fm_feedback.argtypes = [f32p, f32p, i32, f32, i32, f32p, f32p]

    _lib = L
    return L


def fptr(a: np.ndarray):
    assert a.dtype == np.float32 and a.flags.c_contiguous
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def u32ptr(a: np.ndarray):
    assert a.dtype == np.uint32 and a.flags.c_contiguous
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def u8ptr(a: np.ndarray):
    assert a.dtype == np.uint8 and a.flags.c_contiguous
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


NULL_F32 = ctypes.POINTER(ctypes.c_float)()
