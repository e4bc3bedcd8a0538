"""ctypes bindings for the native host-side data-pipeline library.

The C++ kernels (native/priorflow_io.cc) accelerate .flo decoding (with
fused u-wrap), horizontal-roll augmentation, and eraser occlusion on the
host — the reference's per-sample hot path in its DataLoader workers
(SURVEY.md §3.1). Every function has a numpy fallback so the framework
works without the compiled library; ``available()`` reports which path is
active.

Build the library with ``make -C native`` (or ``python -m
prior_flow_tpu.data.native`` which shells out to make).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpriorflow_io.so")

_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.pf_flo_dims.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_int),
                                ctypes.POINTER(ctypes.c_int)]
    lib.pf_flo_dims.restype = ctypes.c_int
    lib.pf_read_flo.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.pf_read_flo.restype = ctypes.c_int
    lib.pf_roll.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
                            ctypes.c_int, ctypes.c_int, ctypes.c_int,
                            ctypes.c_int]
    lib.pf_roll.restype = None
    lib.pf_erase_rect.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_float)]
    lib.pf_erase_rect.restype = None
    lib.pf_mean_color.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_float)]
    lib.pf_mean_color.restype = None
    _lib = lib
    return lib


def build(quiet: bool = False) -> bool:
    """Compile the native library via make. Returns success."""
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True,
                       capture_output=quiet)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def available() -> bool:
    return _load() is not None


def read_flo(path: str, wrap_u: bool = False) -> np.ndarray:
    """Native .flo reader with optional fused u-wrap; numpy fallback."""
    lib = _load()
    if lib is None:
        from . import frame_utils
        flow = frame_utils.read_flo(path)
        if wrap_u:
            W = flow.shape[1]
            flow[:, :, 0] = (flow[:, :, 0] + W / 2) % W - W / 2
        return flow
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.pf_flo_dims(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise ValueError(f"{path}: bad .flo file (rc={rc})")
    out = np.empty((h.value, w.value, 2), np.float32)
    rc = lib.pf_read_flo(path.encode(),
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                         h.value, w.value, int(wrap_u))
    if rc != 0:
        raise ValueError(f"{path}: truncated .flo file (rc={rc})")
    return out


def roll(arr: np.ndarray, shift: int) -> np.ndarray:
    """np.roll(arr, shift, axis=1) for HWC arrays via the native kernel."""
    lib = _load()
    if lib is None:
        return np.roll(arr, shift, axis=1)
    arr = np.ascontiguousarray(arr)
    out = np.empty_like(arr)
    h, w = arr.shape[:2]
    c = 1 if arr.ndim == 2 else arr.shape[2]
    lib.pf_roll(arr.ctypes.data_as(ctypes.c_char_p),
                out.ctypes.data_as(ctypes.c_char_p),
                h, w, c, int(shift), arr.itemsize)
    return out


def erase_rect(img: np.ndarray, x0: int, y0: int, dx: int, dy: int,
               color: np.ndarray) -> None:
    """In-place mean-colour rectangle paint (uint8 RGB)."""
    lib = _load()
    if lib is None or img.dtype != np.uint8 or img.shape[-1] != 3 \
            or not img.flags.c_contiguous:
        img[y0:y0 + dy, x0:x0 + dx, :] = color
        return
    c = np.ascontiguousarray(color, np.float32)
    lib.pf_erase_rect(img.ctypes.data_as(ctypes.c_char_p),
                      img.shape[0], img.shape[1], x0, y0, dx, dy,
                      c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))


def mean_color(img: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None or img.dtype != np.uint8 or img.shape[-1] != 3 \
            or not img.flags.c_contiguous:
        return np.mean(img.reshape(-1, 3), axis=0)
    out = np.empty(3, np.float32)
    lib.pf_mean_color(img.ctypes.data_as(ctypes.c_char_p),
                      img.shape[0], img.shape[1],
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


if __name__ == "__main__":
    ok = build()
    print(f"native build: {'ok' if ok else 'FAILED'}; available={available()}")
