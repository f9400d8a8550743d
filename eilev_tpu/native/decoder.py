"""ctypes bindings + on-demand build for the native libav video decoder.

The shared library is compiled once (g++ against system libav) and cached next
to this file; decode calls run without the GIL, so a thread pool of decoders
overlaps host decode with device compute - replacing the reference's
pytorchvideo/PyAV DataLoader-worker decode stage.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "video_decoder.cpp")
_LIB = os.path.join(_HERE, "libeilev_decoder.so")
_BUILD_LOCK = threading.Lock()
_LIB_HANDLE: Optional[ctypes.CDLL] = None
_BUILD_ERROR: Optional[str] = None


def _build() -> Optional[str]:
    cmd = [
        "g++",
        "-O2",
        "-shared",
        "-fPIC",
        _SRC,
        "-lavformat",
        "-lavcodec",
        "-lavutil",
        "-lswscale",
        "-o",
        _LIB,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"build failed: {e}"
    if proc.returncode != 0:
        return f"build failed:\n{proc.stderr[-2000:]}"
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB_HANDLE, _BUILD_ERROR
    if _LIB_HANDLE is not None:
        return _LIB_HANDLE
    with _BUILD_LOCK:
        if _LIB_HANDLE is not None:
            return _LIB_HANDLE
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            err = _build()
            if err is not None:
                _BUILD_ERROR = err
                return None
        lib = ctypes.CDLL(_LIB)
        lib.vd_open.restype = ctypes.c_void_p
        lib.vd_open.argtypes = [ctypes.c_char_p]
        lib.vd_error.restype = ctypes.c_char_p
        lib.vd_error.argtypes = [ctypes.c_void_p]
        lib.vd_duration.restype = ctypes.c_double
        lib.vd_duration.argtypes = [ctypes.c_void_p]
        lib.vd_fps.restype = ctypes.c_double
        lib.vd_fps.argtypes = [ctypes.c_void_p]
        lib.vd_width.restype = ctypes.c_int
        lib.vd_width.argtypes = [ctypes.c_void_p]
        lib.vd_height.restype = ctypes.c_int
        lib.vd_height.argtypes = [ctypes.c_void_p]
        lib.vd_close.argtypes = [ctypes.c_void_p]
        lib.vd_decode_clip.restype = ctypes.c_int
        lib.vd_decode_clip.argtypes = [
            ctypes.c_void_p,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        _LIB_HANDLE = lib
        return lib


def decoder_available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _BUILD_ERROR


class VideoDecoder:
    """One open video file; decode uniform-sampled clips as (C, T, H, W) uint8."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native decoder unavailable: {_BUILD_ERROR}")
        self._lib = lib
        self._h = lib.vd_open(path.encode())
        err = lib.vd_error(self._h).decode()
        if err:
            msg = f"{path}: {err}"
            lib.vd_close(self._h)
            self._h = None
            raise RuntimeError(msg)

    @property
    def duration(self) -> float:
        return self._lib.vd_duration(self._h)

    @property
    def fps(self) -> float:
        return self._lib.vd_fps(self._h)

    @property
    def size(self) -> tuple[int, int]:
        return self._lib.vd_height(self._h), self._lib.vd_width(self._h)

    def decode_clip(
        self,
        start_sec: float,
        end_sec: float,
        num_frames: int,
        *,
        height: int = 0,
        width: int = 0,
    ) -> np.ndarray:
        """Returns (C=3, num_frames, H, W) uint8 RGB."""
        h = height or self.size[0]
        w = width or self.size[1]
        out = np.empty((num_frames, h, w, 3), np.uint8)
        ret = self._lib.vd_decode_clip(
            self._h,
            float(start_sec),
            float(end_sec),
            int(num_frames),
            int(h),
            int(w),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        if ret != 0:
            raise RuntimeError(
                f"decode failed ({ret}): {self._lib.vd_error(self._h).decode()}"
            )
        return np.ascontiguousarray(out.transpose(3, 0, 1, 2))

    def close(self) -> None:
        if self._h is not None:
            self._lib.vd_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
