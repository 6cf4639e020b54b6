"""ctypes bridge to the native host ops (host_ops.cpp).

The shared library is compiled on first import if missing (g++ is in the
image; there is no pip/pybind11). Every entry point degrades gracefully: if
the toolchain or the .so is unavailable, `lib` is None and callers fall back
to the numpy implementations (utils/boxes.py, data/rle.py).
"""

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "host_ops.cpp")
_SO = os.path.join(_DIR, "libhostops.so")

lib = None


def _build():
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global lib
    if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        try:
            _build()
        except Exception as e:  # no toolchain / sandbox: fall back to numpy
            logger.warning("native host_ops build failed (%s); using numpy "
                           "fallbacks", e)
            return
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        logger.warning("native host_ops load failed (%s)", e)
        return

    lib.nms.restype = ctypes.c_int
    lib.nms.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                        ctypes.c_float, ctypes.POINTER(ctypes.c_int)]
    lib.bbox_overlaps.restype = None
    lib.bbox_overlaps.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double)]
    lib.rle_decode.restype = ctypes.c_int
    lib.rle_decode.argtypes = [ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
                               ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    lib.rle_encode.restype = ctypes.c_int
    lib.rle_encode.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                               ctypes.POINTER(ctypes.c_uint32)]
    lib.poly_to_counts.restype = ctypes.c_int
    lib.poly_to_counts.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint32)]
    lib.rle_intersection.restype = ctypes.c_int64
    lib.rle_intersection.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int]


_load()


def available():
    return lib is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def nms(dets, thresh):
    """Greedy NMS; identical to utils/boxes.nms. dets (N, 5) float32."""
    dets = np.ascontiguousarray(dets, np.float32)
    n = dets.shape[0]
    if n == 0:
        return []
    keep = np.empty(n, np.int32)
    n_keep = lib.nms(_ptr(dets, ctypes.c_float), n, float(thresh),
                     _ptr(keep, ctypes.c_int))
    return keep[:n_keep].tolist()


def bbox_overlaps(boxes, query):
    boxes = np.ascontiguousarray(boxes, np.float64)
    query = np.ascontiguousarray(query, np.float64)
    out = np.zeros((boxes.shape[0], query.shape[0]), np.float64)
    if out.size:
        lib.bbox_overlaps(_ptr(boxes, ctypes.c_double), boxes.shape[0],
                          _ptr(query, ctypes.c_double), query.shape[0],
                          _ptr(out, ctypes.c_double))
    return out


def rle_decode(counts, h, w):
    counts = np.ascontiguousarray(counts, np.uint32)
    mask = np.empty(h * w, np.uint8)
    rc = lib.rle_decode(_ptr(counts, ctypes.c_uint32), len(counts),
                        _ptr(mask, ctypes.c_uint8), h * w)
    assert rc == 0, "invalid RLE"
    return mask.reshape((h, w), order="F")


def rle_encode(mask):
    h, w = mask.shape
    flat = np.asfortranarray(mask).reshape(-1, order="F").astype(np.uint8)
    flat = np.ascontiguousarray(flat)
    counts = np.empty(h * w + 1, np.uint32)
    m = lib.rle_encode(_ptr(flat, ctypes.c_uint8), h * w,
                       _ptr(counts, ctypes.c_uint32))
    return counts[:m].tolist()


def poly_to_counts(xy, h, w):
    xy = np.ascontiguousarray(xy, np.float64)
    k = len(xy) // 2
    counts = np.empty(h * w + 2, np.uint32)
    m = lib.poly_to_counts(_ptr(xy, ctypes.c_double), k, h, w,
                           _ptr(counts, ctypes.c_uint32))
    return counts[:m].tolist()


def rle_intersection(counts_a, counts_b):
    a = np.ascontiguousarray(counts_a, np.uint32)
    b = np.ascontiguousarray(counts_b, np.uint32)
    return int(lib.rle_intersection(_ptr(a, ctypes.c_uint32), len(a),
                                    _ptr(b, ctypes.c_uint32), len(b)))
