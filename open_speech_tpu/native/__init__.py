"""ctypes bindings for libosaudio (native host-side codec/DSP).

Loads ``libosaudio.so`` built from ``native/osaudio.cpp`` (``make -C
native``). Every function has a numpy fallback in ops.audio; this module
only reports availability and exposes typed wrappers.
"""

from __future__ import annotations

import ctypes
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_LIB_PATH = Path(__file__).parent / "libosaudio.so"
_lib: ctypes.CDLL | None = None


def _build() -> bool:
    """Compile libosaudio.so from source (dev checkouts; Docker runs
    ``make -C native`` at image build). Best-effort: numpy fallbacks in
    ops.audio cover every entry point when no toolchain is present."""
    import shutil
    import subprocess

    src = Path(__file__).resolve().parents[2] / "native" / "osaudio.cpp"
    cxx = shutil.which("g++") or shutil.which("c++")
    if not src.exists() or cxx is None:
        return False
    try:
        subprocess.run(
            [cxx, "-O3", "-fPIC", "-std=c++17", "-shared",
             "-o", str(_LIB_PATH), str(src)],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except (subprocess.SubprocessError, OSError) as e:
        logger.warning("libosaudio build failed: %s", e)
        return False


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:  # pragma: no cover
        logger.warning("libosaudio failed to load: %s", e)
        return None
    i16p = ctypes.POINTER(ctypes.c_int16)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    lib.osa_pcm16_to_f32.argtypes = [i16p, f32p, i64]
    lib.osa_f32_to_pcm16.argtypes = [f32p, i16p, i64]
    lib.osa_ulaw_decode.argtypes = [u8p, i16p, i64]
    lib.osa_ulaw_encode.argtypes = [i16p, u8p, i64]
    lib.osa_alaw_decode.argtypes = [u8p, i16p, i64]
    lib.osa_alaw_encode.argtypes = [i16p, u8p, i64]
    lib.osa_linear_resample_i16.argtypes = [i16p, i64, i16p, i64]
    lib.osa_rms_normalize_f32.argtypes = [f32p, i64, ctypes.c_float]
    lib.osa_trim_bounds_f32.argtypes = [
        f32p, i64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.osa_version.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def pcm16_to_f32(ints: np.ndarray) -> np.ndarray:
    lib = _load()
    ints = np.ascontiguousarray(ints, dtype=np.int16)
    out = np.empty(ints.shape, np.float32)
    lib.osa_pcm16_to_f32(
        _ptr(ints, ctypes.c_int16), _ptr(out, ctypes.c_float), ints.size
    )
    return out


def f32_to_pcm16(floats: np.ndarray) -> np.ndarray:
    lib = _load()
    floats = np.ascontiguousarray(floats, dtype=np.float32)
    out = np.empty(floats.shape, np.int16)
    lib.osa_f32_to_pcm16(
        _ptr(floats, ctypes.c_float), _ptr(out, ctypes.c_int16), floats.size
    )
    return out


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    lib = _load()
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    out = np.empty(codes.shape, np.int16)
    lib.osa_ulaw_decode(
        _ptr(codes, ctypes.c_uint8), _ptr(out, ctypes.c_int16), codes.size
    )
    return out


def ulaw_encode(pcm: np.ndarray) -> np.ndarray:
    lib = _load()
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    out = np.empty(pcm.shape, np.uint8)
    lib.osa_ulaw_encode(
        _ptr(pcm, ctypes.c_int16), _ptr(out, ctypes.c_uint8), pcm.size
    )
    return out


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    lib = _load()
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    out = np.empty(codes.shape, np.int16)
    lib.osa_alaw_decode(
        _ptr(codes, ctypes.c_uint8), _ptr(out, ctypes.c_int16), codes.size
    )
    return out


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    lib = _load()
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    out = np.empty(pcm.shape, np.uint8)
    lib.osa_alaw_encode(
        _ptr(pcm, ctypes.c_int16), _ptr(out, ctypes.c_uint8), pcm.size
    )
    return out


def linear_resample_i16(ints: np.ndarray, n_out: int) -> np.ndarray:
    lib = _load()
    ints = np.ascontiguousarray(ints, dtype=np.int16)
    out = np.empty(n_out, np.int16)
    lib.osa_linear_resample_i16(
        _ptr(ints, ctypes.c_int16), ints.size, _ptr(out, ctypes.c_int16), n_out
    )
    return out


def rms_normalize_f32(buf: np.ndarray, target_dbfs: float) -> np.ndarray:
    lib = _load()
    buf = np.ascontiguousarray(buf, dtype=np.float32).copy()
    lib.osa_rms_normalize_f32(
        _ptr(buf, ctypes.c_float), buf.size, ctypes.c_float(target_dbfs)
    )
    return buf


def trim_bounds_f32(buf: np.ndarray, threshold: float) -> tuple[int, int]:
    lib = _load()
    buf = np.ascontiguousarray(buf, dtype=np.float32)
    start = ctypes.c_int64()
    end = ctypes.c_int64()
    lib.osa_trim_bounds_f32(
        _ptr(buf, ctypes.c_float), buf.size, ctypes.c_float(threshold),
        ctypes.byref(start), ctypes.byref(end),
    )
    return start.value, end.value
