"""ctypes bindings for the native host runtime (native/batcher.cpp).

The library is optional: everything falls back to numpy when
native/libtpuva.so hasn't been built (`make -C native`). The native pieces
run batch assembly and BGR->gray conversion off the GIL inside the decode
thread (SURVEY.md: the reference's native surface was its C++ data-loader
path — cv2.VideoCapture — and the rebuild keeps a real native component on
that boundary).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "native",
        "libtpuva.so",
    )


def load_library() -> Optional[ctypes.CDLL]:
    """The native library, or None if not built."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.tv_batcher_create.restype = ctypes.c_void_p
    lib.tv_batcher_create.argtypes = [
        ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
    ]
    lib.tv_batcher_push_frame.restype = ctypes.c_int
    lib.tv_batcher_push_frame.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.tv_batcher_pop_batch.restype = ctypes.c_int
    lib.tv_batcher_pop_batch.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.tv_batcher_close.argtypes = [ctypes.c_void_p]
    lib.tv_batcher_depth.restype = ctypes.c_int
    lib.tv_batcher_depth.argtypes = [ctypes.c_void_p]
    lib.tv_batcher_destroy.argtypes = [ctypes.c_void_p]
    lib.tv_bgr2gray.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return load_library() is not None


class NativeBatcher:
    """SPSC frame-batch ring buffer backed by the C++ library.

    Producer thread pushes frames; consumer pops shape-stable padded
    batches: (n_valid, (batch, *frame_shape) uint8). n_valid == 0 signals
    end of stream.
    """

    def __init__(self, frame_shape, batch: int, depth: int = 2):
        lib = load_library()
        if lib is None:
            raise RuntimeError(
                "native library not built; run `make -C native`"
            )
        self._lib = lib
        self.frame_shape = tuple(frame_shape)
        self.batch = batch
        self._frame_bytes = int(np.prod(self.frame_shape))
        self._h = lib.tv_batcher_create(self._frame_bytes, batch, depth)

    def push(self, frame: np.ndarray) -> None:
        frame = np.ascontiguousarray(frame, np.uint8)
        assert frame.nbytes == self._frame_bytes, (
            f"{frame.shape} != {self.frame_shape}"
        )
        rc = self._lib.tv_batcher_push_frame(
            self._h, frame.ctypes.data_as(ctypes.c_void_p)
        )
        if rc != 0:
            raise RuntimeError("push on closed batcher")

    def pop(self):
        out = np.empty((self.batch,) + self.frame_shape, np.uint8)
        n = self._lib.tv_batcher_pop_batch(
            self._h, out.ctypes.data_as(ctypes.c_void_p)
        )
        if n < 0:
            raise RuntimeError("batcher error")
        if n == 0:
            return 0, None
        return n, out

    @property
    def depth(self) -> int:
        return self._lib.tv_batcher_depth(self._h)

    def close(self) -> None:
        self._lib.tv_batcher_close(self._h)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.tv_batcher_close(self._h)
                self._lib.tv_batcher_destroy(self._h)
                self._h = None
        except Exception:
            pass


def bgr2gray(frame: np.ndarray, out: Optional[np.ndarray] = None) -> np.ndarray:
    """cv2-exact fixed-point BGR->gray via the native kernel."""
    lib = load_library()
    frame = np.ascontiguousarray(frame, np.uint8)
    h, w = frame.shape[:2]
    if out is None:
        out = np.empty((h, w), np.uint8)
    if lib is None:
        # numpy fallback with the same fixed-point arithmetic
        f = frame.astype(np.uint32)
        out[:] = (
            (1868 * f[..., 0] + 9617 * f[..., 1] + 4899 * f[..., 2] + 8192)
            >> 14
        ).astype(np.uint8)
        return out
    lib.tv_bgr2gray(
        frame.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        h * w,
    )
    return out
