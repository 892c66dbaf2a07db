"""ctypes bindings for the native C++ reference kernel (SURVEY.md §9 P6).

The shared library is built on demand with g++ (no pybind11 in this
environment; plain C ABI + ctypes).  ``-ffp-contract=off -O2`` keeps float32
arithmetic IEEE-exact and bit-identical to the NumPy oracle.
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
import tempfile
from pathlib import Path

import numpy as np

from ..oracle.align import AlignResult
from ..types import GAP

_SRC = Path(__file__).parent / "gotoh.cpp"
_LIB: ctypes.CDLL | None = None


def _build_library() -> Path:
    out_dir = Path(tempfile.gettempdir()) / "praline_tpu_native"
    out_dir.mkdir(exist_ok=True)
    tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    so = out_dir / f"gotoh_{tag}.so"
    if not so.exists():
        tmp = so.with_suffix(".building.so")
        cmd = [
            "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
            "-ffp-contract=off", "-fno-fast-math",
            str(_SRC), "-o", str(tmp),
        ]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        tmp.replace(so)
    return so


def load_library() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(str(_build_library()))
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.praline_gotoh_align.restype = ctypes.c_int
        lib.praline_gotoh_align.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            i32p, i32p,
        ]
        lib.praline_gotoh_scores.restype = ctypes.c_int
        lib.praline_gotoh_scores.argtypes = [
            f32p, i32p, i32p, i32p, ctypes.c_int, f32p, ctypes.c_int,
            ctypes.c_int, f32p, i32p,
        ]
        _LIB = lib
    return _LIB


_MODES = {"global": 0, "semiglobal": 1, "local": 2}


def native_align_scores(
    h: np.ndarray, gap_series: tuple[int, ...], mode: str
) -> AlignResult:
    """C++ twin of oracle.align_scores (same AlignResult contract)."""
    lib = load_library()
    h = np.ascontiguousarray(h, dtype=np.float32)
    L1, L2 = h.shape
    if L1 == 0 or L2 == 0:
        from ..oracle.align import _degenerate

        return _degenerate(L1, L2, gap_series, mode)
    g = np.ascontiguousarray(gap_series, dtype=np.float32)
    score = ctypes.c_float()
    ti = ctypes.c_int()
    tj = ctypes.c_int()
    ncols = ctypes.c_int()
    cols_x = np.zeros(L1 + L2, dtype=np.int32)
    cols_y = np.zeros(L1 + L2, dtype=np.int32)
    rc = lib.praline_gotoh_align(
        h, L1, L2, g, len(gap_series), _MODES[mode],
        ctypes.byref(score), ctypes.byref(ti), ctypes.byref(tj),
        ctypes.byref(ncols), cols_x, cols_y,
    )
    if rc != 0:
        raise ValueError(f"native kernel failed (rc={rc})")
    n = ncols.value
    cx = cols_x[:n].copy()
    cy = cols_y[:n].copy()
    xs = cx[cx != GAP]
    ys = cy[cy != GAP]
    x_range = (int(xs.min()), int(xs.max()) + 1) if xs.size else (0, 0)
    y_range = (int(ys.min()), int(ys.max()) + 1) if ys.size else (0, 0)
    return AlignResult(float(score.value), cx, cy, x_range, y_range, mode)


def native_batch_scores(
    hs: list[np.ndarray], gap_series: tuple[int, ...], mode: str
) -> tuple[np.ndarray, np.ndarray]:
    """Scores+lengths for a batch of problems through one native call."""
    lib = load_library()
    n = len(hs)
    l1s = np.array([h.shape[0] for h in hs], dtype=np.int32)
    l2s = np.array([h.shape[1] for h in hs], dtype=np.int32)
    offsets = np.zeros(n, dtype=np.int32)
    total = 0
    for i, h in enumerate(hs):
        offsets[i] = total
        total += h.size
    flat = np.empty(total, dtype=np.float32)
    for i, h in enumerate(hs):
        flat[offsets[i] : offsets[i] + h.size] = np.ascontiguousarray(
            h, dtype=np.float32
        ).ravel()
    g = np.ascontiguousarray(gap_series, dtype=np.float32)
    scores = np.zeros(n, dtype=np.float32)
    lengths = np.zeros(n, dtype=np.int32)
    rc = lib.praline_gotoh_scores(
        flat, offsets, l1s, l2s, n, g, len(gap_series), _MODES[mode], scores, lengths
    )
    if rc != 0:
        raise ValueError(f"native kernel failed (rc={rc})")
    return scores, lengths
