"""ctypes bindings for the native C++ image loader (_native/loader.cpp).

Auto-builds the shared library with g++ on first use (cached next to the
source); falls back gracefully (`get_native_loader()` returns None) when the
toolchain or image libraries are unavailable, in which case DataPipeline
uses its PIL/numpy path.
"""

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger("simple_sr").getChild(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "_native")
_SRC = os.path.join(_NATIVE_DIR, "loader.cpp")
_SO = os.path.join(_NATIVE_DIR, "libssrloader.so")

_build_lock = threading.Lock()
_loader_singleton = None
_load_failed = False


def _build_library():
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", _SRC, "-o", _SO,
           "-lpng", "-ljpeg", "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)


def _bind(lib):
    lib.ssr_create_loader.restype = ctypes.c_void_p
    lib.ssr_create_loader.argtypes = [ctypes.c_int, ctypes.c_size_t]
    lib.ssr_destroy_loader.argtypes = [ctypes.c_void_p]
    lib.ssr_image_size.restype = ctypes.c_int
    lib.ssr_image_size.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
    lib.ssr_load_image.restype = ctypes.c_int
    lib.ssr_load_image.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_float)]
    lib.ssr_load_crops.restype = ctypes.c_int
    lib.ssr_load_crops.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.ssr_load_image_u8.restype = ctypes.c_int
    lib.ssr_load_image_u8.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_uint8)]
    lib.ssr_load_crops_u8.restype = ctypes.c_int
    lib.ssr_load_crops_u8.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8)]
    return lib


class NativeLoader:
    """Thread-pooled decode + crop server backed by the C++ library."""

    def __init__(self, num_threads=0, cache_bytes=2 << 30):
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            with _build_lock:
                if not os.path.exists(_SO) or \
                        os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                    _build_library()
        self._lib = _bind(ctypes.CDLL(_SO))
        self._handle = self._lib.ssr_create_loader(num_threads, cache_bytes)
        if not self._handle:
            raise RuntimeError("failed to create native loader")

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.ssr_destroy_loader(self._handle)
        except Exception:
            pass

    def image_size(self, path):
        h = ctypes.c_int()
        w = ctypes.c_int()
        rc = self._lib.ssr_image_size(self._handle, str(path).encode(),
                                      ctypes.byref(h), ctypes.byref(w))
        if rc != 0:
            raise IOError(f"could not decode {path}")
        return h.value, w.value

    def load_image(self, path):
        h, w = self.image_size(path)
        out = np.empty((h, w, 3), np.float32)
        rc = self._lib.ssr_load_image(
            self._handle, str(path).encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise IOError(f"could not decode {path}")
        return out

    def load_image_u8(self, path):
        """Whole image as uint8 (pure memcpy out of the decode cache — the
        cheap carrier for host→device transfer)."""
        h, w = self.image_size(path)
        out = np.empty((h, w, 3), np.uint8)
        rc = self._lib.ssr_load_image_u8(
            self._handle, str(path).encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise IOError(f"could not decode {path}")
        return out

    def load_crops(self, paths, tops, lefts, patch_h, patch_w, dtype=np.float32):
        """Fill an (n, ph, pw, 3) batch of crop windows, decoding and
        slicing in parallel in C++. dtype float32 (converted) or uint8
        (row memcpy)."""
        n = len(paths)
        c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
        c_tops = np.ascontiguousarray(tops, np.int32)
        c_lefts = np.ascontiguousarray(lefts, np.int32)
        if dtype == np.uint8:
            out = np.empty((n, patch_h, patch_w, 3), np.uint8)
            failures = self._lib.ssr_load_crops_u8(
                self._handle, c_paths,
                c_tops.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                c_lefts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                n, patch_h, patch_w,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        else:
            out = np.empty((n, patch_h, patch_w, 3), np.float32)
            failures = self._lib.ssr_load_crops(
                self._handle, c_paths,
                c_tops.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                c_lefts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                n, patch_h, patch_w,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if failures:
            raise IOError(f"{failures}/{n} crop loads failed")
        return out


def get_native_loader(num_threads=0, cache_bytes=2 << 30):
    """Process-wide loader singleton, or None when native isn't available."""
    global _loader_singleton, _load_failed
    if _load_failed:
        return None
    if _loader_singleton is None:
        try:
            _loader_singleton = NativeLoader(num_threads, cache_bytes)
        except Exception as e:  # toolchain/libs missing — fall back to PIL
            log.warning("native loader unavailable (%s); using PIL fallback", e)
            _load_failed = True
            return None
    return _loader_singleton
