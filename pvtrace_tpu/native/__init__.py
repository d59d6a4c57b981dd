"""Native (C++) kernels loaded via ctypes.

`load()` returns the mesh kernel library (building it on first use when
a compiler is available) or None; callers keep a numpy fallback.
"""
import ctypes
import os

import numpy as np

HERE = os.path.dirname(os.path.realpath(__file__))
LIBRARY = os.path.join(HERE, "_mesh_kernel.so")

_lib = None
_tried = False


def is_available() -> bool:
    return load() is not None


def load():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(LIBRARY):
        try:
            from pvtrace_tpu.native.build import build

            build(verbose=False)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(LIBRARY)
    except OSError:
        return None
    c_double_p = ctypes.POINTER(ctypes.c_double)
    c_int64_p = ctypes.POINTER(ctypes.c_int64)
    c_int32_p = ctypes.POINTER(ctypes.c_int32)
    lib.pvtrace_build_tris.argtypes = [
        c_double_p, c_int64_p, ctypes.c_int64, c_double_p,
    ]
    lib.pvtrace_ray_hits.restype = ctypes.c_int64
    lib.pvtrace_ray_hits.argtypes = [
        c_double_p, ctypes.c_int64, c_double_p, c_double_p,
        ctypes.c_double, c_double_p, c_int64_p, ctypes.c_int64,
    ]
    lib.pvtrace_contains.restype = ctypes.c_int
    lib.pvtrace_contains.argtypes = [
        c_double_p, ctypes.c_int64, c_double_p, ctypes.c_double,
    ]
    lib.pvtrace_nearest_face.restype = ctypes.c_int64
    lib.pvtrace_nearest_face.argtypes = [
        c_double_p, ctypes.c_int64, c_double_p, c_double_p,
    ]
    lib.pvtrace_batch_intersect.argtypes = [
        c_double_p, ctypes.c_int64, c_double_p, c_double_p,
        ctypes.c_int64, ctypes.c_double, c_double_p, c_int32_p,
    ]
    _lib = lib
    return _lib


def _ptr(array, ctype):
    return array.ctypes.data_as(ctypes.POINTER(ctype))


class MeshKernel:
    """ctypes wrapper around the triangle-soup kernel for one mesh."""

    def __init__(self, vertices, faces):
        lib = load()
        if lib is None:
            raise RuntimeError("native mesh kernel unavailable")
        self._lib = lib
        vertices = np.ascontiguousarray(vertices, dtype=np.float64)
        faces = np.ascontiguousarray(faces, dtype=np.int64)
        self.n_faces = len(faces)
        self.tris = np.empty((self.n_faces, 9), dtype=np.float64)
        lib.pvtrace_build_tris(
            _ptr(vertices, ctypes.c_double),
            _ptr(faces, ctypes.c_int64),
            self.n_faces,
            _ptr(self.tris, ctypes.c_double),
        )

    def ray_hits(self, origin, direction, t_min=0.0, max_hits=64):
        origin = np.ascontiguousarray(origin, dtype=np.float64)
        direction = np.ascontiguousarray(direction, dtype=np.float64)
        out_t = np.empty(max_hits, dtype=np.float64)
        out_face = np.empty(max_hits, dtype=np.int64)
        n = self._lib.pvtrace_ray_hits(
            _ptr(self.tris, ctypes.c_double), self.n_faces,
            _ptr(origin, ctypes.c_double), _ptr(direction, ctypes.c_double),
            float(t_min), _ptr(out_t, ctypes.c_double),
            _ptr(out_face, ctypes.c_int64), max_hits,
        )
        return out_t[:n], out_face[:n]

    def contains(self, point, eps=1e-10):
        point = np.ascontiguousarray(point, dtype=np.float64)
        return bool(
            self._lib.pvtrace_contains(
                _ptr(self.tris, ctypes.c_double), self.n_faces,
                _ptr(point, ctypes.c_double), float(eps),
            )
        )

    def nearest_face(self, point):
        point = np.ascontiguousarray(point, dtype=np.float64)
        dist = ctypes.c_double()
        face = self._lib.pvtrace_nearest_face(
            _ptr(self.tris, ctypes.c_double), self.n_faces,
            _ptr(point, ctypes.c_double), ctypes.byref(dist),
        )
        return int(face), float(dist.value)

    def batch_intersect(self, origins, dirs, t_min=0.0):
        origins = np.ascontiguousarray(origins, dtype=np.float64)
        dirs = np.ascontiguousarray(dirs, dtype=np.float64)
        n_rays = len(origins)
        out_t = np.empty((n_rays, 2), dtype=np.float64)
        out_count = np.empty(n_rays, dtype=np.int32)
        self._lib.pvtrace_batch_intersect(
            _ptr(self.tris, ctypes.c_double), self.n_faces,
            _ptr(origins, ctypes.c_double), _ptr(dirs, ctypes.c_double),
            n_rays, float(t_min), _ptr(out_t, ctypes.c_double),
            _ptr(out_count, ctypes.c_int32),
        )
        return out_t, out_count
