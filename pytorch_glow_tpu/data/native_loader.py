"""ctypes bindings for the native C++ batch decoder (native/dataloader.cc).

Builds the shared library on first use (g++ -O3, links libjpeg/libpng) and
caches it under native/build/.  Falls back cleanly: callers check
`available()` and use the PIL path otherwise (pytorch_glow_tpu/data/celeba.py).

The native path is the TPU-native replacement for the reference's
DataLoader fork-workers (SURVEY.md §2.2 item 4): C++ threads decode
JPEG/PNG, center-crop, bilinear-resize and assemble the uint8 NHWC batch
without touching the GIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "dataloader.cc")
_SO = os.path.join(_NATIVE_DIR, "build", "libglowdata.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_error: str | None = None


def _build() -> str | None:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _SO, _SRC,
        "-ljpeg", "-lpng", "-lz", "-pthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:  # no toolchain
        return f"{type(e).__name__}: {e}"
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load() -> ctypes.CDLL | None:
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.isfile(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build_error = _build()
            if _build_error is not None:
                return None
        lib = ctypes.CDLL(_SO)
        lib.gdl_decode_batch.restype = ctypes.c_int
        lib.gdl_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_char_p, ctypes.c_int,
        ]
        lib.gdl_image_dims.restype = ctypes.c_int
        lib.gdl_image_dims.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)
        ]
        lib.gdl_version.restype = ctypes.c_char_p
        lib.gdl_pool_create.restype = ctypes.c_void_p
        lib.gdl_pool_create.argtypes = [ctypes.c_int]
        lib.gdl_pool_destroy.restype = None
        lib.gdl_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.gdl_pool_submit.restype = ctypes.c_int
        lib.gdl_pool_submit.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.gdl_pool_wait.restype = ctypes.c_int
        lib.gdl_pool_wait.argtypes = [ctypes.c_void_p, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _build_error


def decode_batch(paths: list[str], size: int, threads: int = 0) -> np.ndarray:
    """Decode+crop+resize `paths` into one (N, size, size, 3) uint8 batch.

    Failed images are zero-filled; raises only if the library is missing.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    n = len(paths)
    out = np.empty((n, size, size, 3), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    err = ctypes.create_string_buffer(512)
    threads = threads or min(16, max(1, (os.cpu_count() or 1)))
    failures = lib.gdl_decode_batch(
        arr, n, size, threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), err, len(err),
    )
    if failures:
        import warnings

        warnings.warn(
            f"native decode: {failures}/{n} images failed "
            f"({err.value.decode(errors='replace')}); slots zero-filled"
        )
    return out


class DecodePool:
    """Persistent async decode pool (native/dataloader.cc gdl_pool_*).

    `submit(paths)` queues a batch decode on the C++ worker threads and
    returns a job id immediately; `wait(job)` blocks until that batch's
    uint8 NHWC array is ready.  Submitting batch i+1 before waiting on
    batch i double-buffers decode against consumption with no thread
    re-spawn per batch and no GIL involvement in the decode itself.
    """

    def __init__(self, size: int, threads: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self._lib = lib
        self.size = size
        self._threads = threads or min(16, max(1, (os.cpu_count() or 1)))
        self._handle = lib.gdl_pool_create(self._threads)
        self._bufs: dict[int, np.ndarray] = {}  # job id -> output (kept alive)

    def submit(self, paths: list[str]) -> int:
        assert self._handle, "pool is closed"
        n = len(paths)
        out = np.empty((n, self.size, self.size, 3), dtype=np.uint8)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        job = self._lib.gdl_pool_submit(
            self._handle, arr, n, self.size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        if job < 0:
            raise RuntimeError("gdl_pool_submit failed")
        self._bufs[job] = out
        return job

    def wait(self, job: int) -> np.ndarray:
        out = self._bufs.pop(job)
        failures = self._lib.gdl_pool_wait(self._handle, job)
        if failures:
            import warnings

            warnings.warn(f"native decode: {failures}/{out.shape[0]} images "
                          "failed; slots zero-filled")
        return out

    def close(self) -> None:
        if self._handle:
            for job in list(self._bufs):  # drain: buffers must outlive work
                self.wait(job)
            self._lib.gdl_pool_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def image_dims(path: str) -> tuple[int, int] | None:
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.gdl_image_dims(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    return w.value, h.value
