"""ctypes bindings for the native host runtime (OBJ loader + BVH builder).

Compiled on demand with g++ into this directory; every entry point degrades
gracefully to the pure-Python path when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "flexlight_native.cpp")
_LIB = os.path.join(_DIR, "libflexlight_native.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        src_mtime = os.path.getmtime(_SRC)
        if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= src_mtime:
            return True
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _build():
        return None
    lib = ctypes.CDLL(_LIB)
    lib.fl_load_obj.restype = ctypes.c_void_p
    lib.fl_load_obj.argtypes = [ctypes.c_char_p]
    lib.fl_num_tris.restype = ctypes.c_int64
    lib.fl_num_tris.argtypes = [ctypes.c_void_p]
    lib.fl_num_slots.restype = ctypes.c_int64
    lib.fl_num_slots.argtypes = [ctypes.c_void_p]
    lib.fl_material_names.restype = ctypes.c_char_p
    lib.fl_material_names.argtypes = [ctypes.c_void_p]
    lib.fl_copy_tris.restype = None
    lib.fl_copy_tris.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 4
    lib.fl_copy_stream.restype = None
    lib.fl_copy_stream.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 4
    lib.fl_release.restype = None
    lib.fl_release.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


class ObjData:
    """Parsed OBJ + flattened BVH stream from the native loader."""

    def __init__(self, verts, normals, uvs, mats, material_names,
                 kind, aabb, skip, tri_index):
        self.verts = verts              # [T, 9] f32
        self.normals = normals          # [T, 9] f32
        self.uvs = uvs                  # [T, 6] f32
        self.mats = mats                # [T] int32 material index (-1 none)
        self.material_names = material_names
        self.kind = kind                # [S] int32 (1 node, 2 triangle)
        self.aabb = aabb                # [S, 6] f32
        self.skip = skip                # [S] int32
        self.tri_index = tri_index      # [S] int32 (-1 for nodes)


def load_obj(path: str) -> ObjData | None:
    lib = get_lib()
    if lib is None:
        return None
    handle = lib.fl_load_obj(path.encode())
    if not handle:
        raise FileNotFoundError(path)
    try:
        t = lib.fl_num_tris(handle)
        s = lib.fl_num_slots(handle)
        verts = np.empty((t, 9), dtype=np.float32)
        normals = np.empty((t, 9), dtype=np.float32)
        uvs = np.empty((t, 6), dtype=np.float32)
        mats = np.empty(t, dtype=np.int32)
        lib.fl_copy_tris(handle, verts.ctypes.data, normals.ctypes.data,
                         uvs.ctypes.data, mats.ctypes.data)
        kind = np.empty(s, dtype=np.int32)
        aabb = np.empty((s, 6), dtype=np.float32)
        skip = np.empty(s, dtype=np.int32)
        tri_index = np.empty(s, dtype=np.int32)
        lib.fl_copy_stream(handle, kind.ctypes.data, aabb.ctypes.data,
                           skip.ctypes.data, tri_index.ctypes.data)
        names = lib.fl_material_names(handle).decode()
        material_names = names.split("\n") if names else []
        return ObjData(verts, normals, uvs, mats, material_names,
                       kind, aabb, skip, tri_index)
    finally:
        lib.fl_release(handle)
