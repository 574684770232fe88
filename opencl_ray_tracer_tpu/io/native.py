"""ctypes bindings to the native C++ IO library (native/).

The reference's asset-ingestion layer is native C++ (utility.cpp OBJ parsing,
hdrloader.cpp RGBE decoding, bitmap_io.cpp BMP encoding); this module binds
our C++ equivalents when the shared library has been built
(``make -C native``), and returns None from each loader otherwise so the
pure-Python fallbacks in obj.py / hdr.py / bmp.py take over.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("OCLRT_NATIVE", "1") == "0":
        return None
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "liboclrt_native.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.oclrt_load_obj.restype = ctypes.c_int
    lib.oclrt_load_obj.argtypes = [
        ctypes.c_char_p,                      # path
        ctypes.POINTER(ctypes.c_float),       # scale[3]
        ctypes.POINTER(ctypes.c_float),       # translate[3]
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),  # out tris
        ctypes.POINTER(ctypes.c_int),         # out n_tris
        ctypes.POINTER(ctypes.c_float),       # out aabb[6]
    ]
    lib.oclrt_free.restype = None
    lib.oclrt_free.argtypes = [ctypes.c_void_p]
    lib.oclrt_load_hdr.restype = ctypes.c_int
    lib.oclrt_load_hdr.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),  # w
        ctypes.POINTER(ctypes.c_int),  # h
    ]
    lib.oclrt_write_bmp.restype = ctypes.c_int
    lib.oclrt_write_bmp.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int, ctypes.c_int,
    ]
    _LIB = lib
    return _LIB


def load_obj_native(path, scale, translate):
    lib = _lib()
    if lib is None:
        return None
    s = (ctypes.c_float * 3)(*[float(x) for x in scale])
    t = (ctypes.c_float * 3)(*[float(x) for x in translate])
    tris_ptr = ctypes.POINTER(ctypes.c_float)()
    n_tris = ctypes.c_int(0)
    aabb = (ctypes.c_float * 6)()
    rc = lib.oclrt_load_obj(path.encode(), s, t, ctypes.byref(tris_ptr),
                            ctypes.byref(n_tris), aabb)
    if rc != 0:
        return None
    n = n_tris.value
    tris = np.ctypeslib.as_array(tris_ptr, shape=(n, 3, 3)).copy()
    lib.oclrt_free(tris_ptr)
    return tris, (np.array(aabb[0:3], np.float32),
                  np.array(aabb[3:6], np.float32))


def load_hdr_native(path):
    lib = _lib()
    if lib is None:
        return None
    img_ptr = ctypes.POINTER(ctypes.c_float)()
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    rc = lib.oclrt_load_hdr(path.encode(), ctypes.byref(img_ptr),
                            ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    img = np.ctypeslib.as_array(img_ptr,
                                shape=(h.value, w.value, 3)).copy()
    lib.oclrt_free(img_ptr)
    return img


def write_bmp_native(path, img_u8):
    lib = _lib()
    if lib is None:
        return False
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    h, w, _ = img_u8.shape
    rc = lib.oclrt_write_bmp(
        path.encode(),
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), w, h)
    return rc == 0
