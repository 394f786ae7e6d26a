"""ctypes bridge to the native (C++) EuRoC loader.

Builds on demand (make in okvis2_tpu/native) and falls back to the pure
Python EurocDatasetReader when the toolchain/OpenCV is unavailable. The
native path decodes PNGs and syncs frames off the GIL with an
N-frames-ahead prefetcher (see native/dataloader.cpp), so host image IO
overlaps device compute — the TPU-era replacement for the reference's
reader thread (DatasetReader.cpp processing thread).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libokvis2_native.so")


def _ensure_built() -> Optional[str]:
    # rebuild when any source is newer than the binary so a stale .so
    # can't shadow changes to dataloader.cpp
    if os.path.exists(_LIB_PATH):
        lib_mtime = os.path.getmtime(_LIB_PATH)
        stale = any(
            os.path.getmtime(os.path.join(_NATIVE_DIR, f)) > lib_mtime
            for f in os.listdir(_NATIVE_DIR)
            if f.endswith((".cpp", ".hpp", ".h")) or f == "Makefile"
        )
        if not stale:
            return _LIB_PATH
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH if os.path.exists(_LIB_PATH) else None
    except Exception:
        return None


_lib = None


def load_native_lib():
    global _lib
    if _lib is not None:
        return _lib
    path = _ensure_built()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.euroc_open.restype = ctypes.c_void_p
    lib.euroc_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_double]
    lib.euroc_close.argtypes = [ctypes.c_void_p]
    for fn in ("euroc_num_frames", "euroc_num_imu", "euroc_width",
               "euroc_height"):
        getattr(lib, fn).restype = ctypes.c_int
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.euroc_imu_data.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
    ]
    lib.euroc_frame_time.restype = ctypes.c_double
    lib.euroc_frame_time.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.euroc_read_frame.restype = ctypes.c_int
    lib.euroc_read_frame.argtypes = [
        ctypes.c_void_p, ctypes.c_int, np.ctypeslib.ndpointer(np.float32)
    ]
    lib.euroc_prefetch_start.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.euroc_prefetch_next.restype = ctypes.c_int
    lib.euroc_prefetch_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_double),
        np.ctypeslib.ndpointer(np.float32),
    ]
    _lib = lib
    return lib


class NativeEurocReader:
    """Same event-stream contract as pipeline.dataset.EurocDatasetReader,
    backed by the C++ loader with prefetching."""

    def __init__(self, path: str, num_cameras: int = 2,
                 sync_tolerance: float = 0.005, prefetch: int = 8):
        lib = load_native_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable (build failed)")
        self._lib = lib
        self._h = lib.euroc_open(path.encode(), num_cameras, sync_tolerance)
        if not self._h:
            raise IOError(f"cannot open EuRoC dataset at {path}")
        self.num_cameras = num_cameras
        self.num_frames = lib.euroc_num_frames(self._h)
        self.width = lib.euroc_width(self._h)
        self.height = lib.euroc_height(self._h)
        self._prefetch = prefetch

        n_imu = lib.euroc_num_imu(self._h)
        self._imu_t = np.zeros(n_imu)
        self._imu_gyr = np.zeros((n_imu, 3))
        self._imu_acc = np.zeros((n_imu, 3))
        lib.euroc_imu_data(
            self._h, self._imu_t, self._imu_gyr.reshape(-1),
            self._imu_acc.reshape(-1)
        )

    def close(self):
        if self._h:
            self._lib.euroc_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def stream(self, sync_tolerance: float = 0.005) -> Iterator[tuple]:
        """Yield ('imu', t, acc, gyr) / ('images', t, [img...]) in order,
        images decoded ahead by the native prefetcher."""
        lib = self._lib
        lib.euroc_prefetch_start(self._h, self._prefetch)
        buf = np.zeros(
            (self.num_cameras, self.height, self.width), np.float32
        )
        t_out = ctypes.c_double()
        ii = 0
        for _ in range(self.num_frames):
            idx = lib.euroc_prefetch_next(
                self._h, ctypes.byref(t_out), buf.reshape(-1)
            )
            if idx < 0:
                break
            t = t_out.value
            while ii < len(self._imu_t) and self._imu_t[ii] <= t + 0.005:
                yield ("imu", self._imu_t[ii], self._imu_acc[ii],
                       self._imu_gyr[ii])
                ii += 1
            yield ("images", t, [buf[c].copy() for c in range(self.num_cameras)])
        while ii < len(self._imu_t):
            yield ("imu", self._imu_t[ii], self._imu_acc[ii], self._imu_gyr[ii])
            ii += 1


def open_euroc(path: str, num_cameras: int = 2, sync_tolerance: float = 0.005):
    """Prefer the native reader, fall back to Python."""
    try:
        return NativeEurocReader(path, num_cameras, sync_tolerance)
    except Exception:
        from okvis2_tpu.pipeline.dataset import EurocDatasetReader

        return EurocDatasetReader(path, num_cameras)
