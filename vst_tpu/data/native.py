"""ctypes bindings for the native flow-I/O library (native/vstio.cc).

Falls back to the pure-numpy readers in vst_tpu.data.flowio when the shared
library hasn't been built (``make -C native``); behavior is identical
(tests assert bit-equality).
"""

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "libvstio.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vstio_pfm_header.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double)]
    lib.vstio_pfm_header.restype = ctypes.c_int
    lib.vstio_read_pfm.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.vstio_read_pfm.restype = ctypes.c_int
    lib.vstio_flo_header.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64)]
    lib.vstio_flo_header.restype = ctypes.c_int
    lib.vstio_read_flo.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.vstio_read_flo.restype = ctypes.c_int
    lib.vstio_read_flow_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64]
    lib.vstio_read_flow_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_pfm(path: str) -> np.ndarray:
    """(H, W[, 3]) float32, top-down rows — matches flowio.read_pfm data."""
    lib = _load()
    if lib is None:
        from vst_tpu.data import flowio

        return flowio.read_pfm(path)[0].astype(np.float32)
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    ch = ctypes.c_int64()
    scale = ctypes.c_double()
    rc = lib.vstio_pfm_header(path.encode(), ctypes.byref(h), ctypes.byref(w),
                              ctypes.byref(ch), ctypes.byref(scale))
    if rc != 0:
        raise IOError(f"vstio_pfm_header({path}) failed: {rc}")
    shape = (h.value, w.value, ch.value) if ch.value == 3 else (h.value, w.value)
    out = np.empty(shape, np.float32)
    rc = lib.vstio_read_pfm(path.encode(), _fptr(out), out.size)
    if rc != 0:
        raise IOError(f"vstio_read_pfm({path}) failed: {rc}")
    return out


def read_flo(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        from vst_tpu.data import flowio

        return flowio.read_flo(path)
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    rc = lib.vstio_flo_header(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"vstio_flo_header({path}) failed: {rc}")
    out = np.empty((h.value, w.value, 2), np.float32)
    rc = lib.vstio_read_flo(path.encode(), _fptr(out), out.size)
    if rc != 0:
        raise IOError(f"vstio_read_flo({path}) failed: {rc}")
    return out


def read_flow_batch(paths: list[str], shape: tuple,
                    num_threads: int = 8) -> np.ndarray:
    """Decode N same-shaped flow files into one (N, *shape) float32 array
    using the native thread pool (falls back to a Python loop)."""
    kind = 0 if paths[0].endswith(".pfm") else 1
    lib = _load()
    per = int(np.prod(shape))
    out = np.empty((len(paths),) + tuple(shape), np.float32)
    if lib is None:
        for i, p in enumerate(paths):
            out[i] = read_pfm(p) if kind == 0 else read_flo(p)
        return out
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    rc = lib.vstio_read_flow_batch(blob, len(paths), kind, _fptr(out), per,
                                   num_threads)
    if rc != 0:
        raise IOError(f"vstio_read_flow_batch failed: {rc}")
    return out
