"""ctypes bindings + threaded prefetcher for the native data loader.

The shared library (loader.cc) is compiled on first use with the system
toolchain and cached next to this file; when a compiler or the image
libraries are missing, every caller falls back to PIL transparently
(data/readers.py uses `get_loader()` which may return None).

The decode/resize entry points release the GIL (plain ctypes calls), so the
``Prefetcher`` gets true multi-threaded frame loading -- the reference's
loader decodes synchronously on the demo thread (capture_stream.py:194-206).
"""
from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Callable, Iterable, Iterator, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libbfloader.so")
_SRC = os.path.join(_DIR, "loader.cc")

_loader: Optional["NativeLoader"] = None
_tried = False


def _build() -> bool:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO,
                "-lpng", "-ljpeg", "-lz",
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


class NativeLoader:
    """Thin ctypes wrapper over libbfloader."""

    def __init__(self, so_path: str = _SO):
        lib = ctypes.CDLL(so_path)
        lib.bf_decode_png.restype = ctypes.c_int
        lib.bf_decode_png.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.bf_decode_jpeg.restype = ctypes.c_int
        lib.bf_decode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.bf_resize_rgb_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
        lib.bf_resize_f32.argtypes = lib.bf_resize_rgb_u8.argtypes
        lib.bf_free.argtypes = [ctypes.c_void_p]
        self._lib = lib

    def decode_png(self, data: bytes) -> np.ndarray:
        """PNG bytes -> (H, W[, C]) uint8 or uint16 array."""
        out = ctypes.c_void_p()
        w = ctypes.c_int()
        h = ctypes.c_int()
        ch = ctypes.c_int()
        depth = ctypes.c_int()
        rc = self._lib.bf_decode_png(
            data, len(data), ctypes.byref(out), ctypes.byref(w),
            ctypes.byref(h), ctypes.byref(ch), ctypes.byref(depth),
        )
        if rc != 0:
            raise ValueError(f"bf_decode_png failed rc={rc}")
        try:
            dt = np.uint16 if depth.value == 16 else np.uint8
            n = h.value * w.value * ch.value
            arr = np.ctypeslib.as_array(
                ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8)),
                (n * np.dtype(dt).itemsize,),
            ).view(dt)[:n].copy()
        finally:
            self._lib.bf_free(out)
        shape = (h.value, w.value) if ch.value == 1 else (h.value, w.value, ch.value)
        return arr.reshape(shape)

    def decode_jpeg(self, data: bytes) -> np.ndarray:
        out = ctypes.c_void_p()
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self._lib.bf_decode_jpeg(
            data, len(data), ctypes.byref(out), ctypes.byref(w), ctypes.byref(h)
        )
        if rc != 0:
            raise ValueError(f"bf_decode_jpeg failed rc={rc}")
        try:
            n = h.value * w.value * 3
            arr = np.ctypeslib.as_array(
                ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8)), (n,)
            ).copy()
        finally:
            self._lib.bf_free(out)
        return arr.reshape(h.value, w.value, 3)

    def resize_rgb(self, img: np.ndarray, size_wh) -> np.ndarray:
        w, h = size_wh
        if (img.shape[1], img.shape[0]) == (w, h):
            return img
        src = np.ascontiguousarray(img, np.uint8)
        dst = np.empty((h, w, 3), np.uint8)
        self._lib.bf_resize_rgb_u8(
            src.ctypes.data, img.shape[0], img.shape[1], dst.ctypes.data, h, w
        )
        return dst

    def resize_f32(self, img: np.ndarray, size_wh) -> np.ndarray:
        w, h = size_wh
        if (img.shape[1], img.shape[0]) == (w, h):
            return img
        src = np.ascontiguousarray(img, np.float32)
        dst = np.empty((h, w), np.float32)
        self._lib.bf_resize_f32(
            src.ctypes.data, img.shape[0], img.shape[1], dst.ctypes.data, h, w
        )
        return dst


def native_available() -> bool:
    return get_loader() is not None


def get_loader() -> Optional[NativeLoader]:
    """Build (once) and return the native loader, or None."""
    global _loader, _tried
    if _loader is None and not _tried:
        _tried = True
        if _build():
            try:
                _loader = NativeLoader()
            except OSError:
                _loader = None
    return _loader


class Prefetcher:
    """Background-thread frame prefetch over any Frame iterable.

    The reference decodes frames synchronously inside the demo loop; here
    decode/IO overlaps with device compute.
    """

    def __init__(self, iterable: Iterable, depth: int = 4):
        self._it = iter(iterable)
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._error: BaseException | None = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._it:
                self._q.put(item)
        except BaseException as e:  # re-raised in the consumer, not swallowed
            self._error = e
        finally:
            self._q.put(self._done)

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is self._done:
                if self._error is not None:
                    raise RuntimeError("prefetch producer failed") from self._error
                return
            yield item
