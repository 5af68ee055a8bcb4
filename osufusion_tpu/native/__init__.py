"""ctypes bindings for the native C++ components (star rating, Bezier kernels).

The reference's equivalents are the Rust ``rosu-pp`` crate and the compiled
``bezier`` package (SURVEY.md section 2.6). Build with ``native/build.sh``
(plain g++) or cmake; every function has a pure-Python fallback in
``osufusion_tpu.osu.{difficulty,bezier_math}``, so the native library is a
performance upgrade for the input-pipeline hot path, not a hard dependency.
If the shared library is missing at import, ``available()`` is False and the
wrappers transparently call the Python implementations.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent / "libosufusion_native.so"
_lib = None


def _try_load() -> None:
    global _lib
    if _lib is not None or not _LIB_PATH.exists():
        return
    lib = ctypes.CDLL(str(_LIB_PATH))
    dp = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    lib.osu_star_rating.restype = ctypes.c_double
    lib.osu_star_rating.argtypes = [dp] * 9 + [u8p, u8p, ctypes.c_int64, ctypes.c_double]

    lib.bezier_evaluate_multi.restype = None
    lib.bezier_evaluate_multi.argtypes = [dp, ctypes.c_int64, ctypes.c_int32, dp, ctypes.c_int64, dp]

    lib.bezier_hodograph_multi.restype = None
    lib.bezier_hodograph_multi.argtypes = [dp, ctypes.c_int64, ctypes.c_int32, dp, ctypes.c_int64, dp]

    lib.bezier_curve_length.restype = ctypes.c_double
    lib.bezier_curve_length.argtypes = [dp, ctypes.c_int64, ctypes.c_int32]

    _lib = lib


_try_load()


def available() -> bool:
    return _lib is not None


def build() -> bool:
    """Compile the shared library in place (requires g++)."""
    script = Path(__file__).parents[2] / "native" / "build.sh"
    try:
        subprocess.run(["sh", str(script)], check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    _try_load()
    return available()


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


# ------------------------------------------------------------- star rating


def star_rating_attrs(at) -> float:
    """Evaluate a ``difficulty.MapAttributes`` table through the C++ core
    (the exact mirror of ``difficulty.evaluate``)."""
    if _lib is None:
        raise RuntimeError("native library not built; use osufusion_tpu.osu.difficulty")
    cols = [
        np.ascontiguousarray(getattr(at, f), dtype=np.float64)
        for f in (
            "start_time", "delta_time", "strain_time", "lazy_jump", "min_jump",
            "min_jump_time", "travel_dist", "travel_time", "angle",
        )
    ]
    u8 = ctypes.POINTER(ctypes.c_uint8)
    is_slider = np.ascontiguousarray(at.is_slider, dtype=np.uint8)
    is_spinner = np.ascontiguousarray(at.is_spinner, dtype=np.uint8)
    return _lib.osu_star_rating(
        *[_dp(c) for c in cols],
        is_slider.ctypes.data_as(u8),
        is_spinner.ctypes.data_as(u8),
        at.n,
        at.od,
    )


def calculate_star_rating(beatmap) -> float:
    """Same surface as osufusion_tpu.osu.difficulty.calculate_star_rating;
    the (Python) preprocessing is shared, the evaluator core dispatches to
    C++ when built, Python otherwise."""
    from osufusion_tpu.osu import difficulty

    at = difficulty.preprocess(beatmap)
    if at is None:
        return 0.0
    if _lib is None:
        return difficulty.evaluate(at)
    return float(star_rating_attrs(at))


# ------------------------------------------------------------------ bezier


def bezier_evaluate(nodes: np.ndarray, ts: np.ndarray) -> np.ndarray:
    if _lib is None:
        from osufusion_tpu.osu import bezier_math

        return bezier_math.evaluate(nodes, ts)
    nodes = np.ascontiguousarray(nodes, dtype=np.float64)
    ts = np.ascontiguousarray(np.atleast_1d(ts), dtype=np.float64)
    out = np.empty((len(ts), nodes.shape[1]), dtype=np.float64)
    _lib.bezier_evaluate_multi(_dp(nodes), nodes.shape[0], nodes.shape[1], _dp(ts), len(ts), _dp(out))
    return out


def bezier_curve_length(nodes: np.ndarray) -> float:
    if _lib is None:
        from osufusion_tpu.osu import bezier_math

        return bezier_math.curve_length(nodes)
    nodes = np.ascontiguousarray(nodes, dtype=np.float64)
    return float(_lib.bezier_curve_length(_dp(nodes), nodes.shape[0], nodes.shape[1]))
