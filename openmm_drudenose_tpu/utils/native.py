"""ctypes bindings to the native host runtime (native/drudenose_native.cpp).

The shared library is compiled lazily with g++ on first use and cached next
to the source.  Every entry point has a pure-Python fallback, so the package
works without a toolchain; the native path makes million-atom system builds
fast (the reference keeps these host paths in C++ inside OpenMM for the same
reason).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def get_lib():
    """Returns the loaded library or None (fallbacks used)."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        src_dir = _native_dir()
        src = os.path.join(src_dir, "drudenose_native.cpp")
        so = os.path.join(src_dir, "libdrudenose_native.so")
        if not os.path.exists(src):
            return None
        # rebuild whenever the source content changes (hash sidecar, not
        # mtime: a stale or foreign .so must never be dlopen'd — the
        # library is .gitignore'd and always built locally from source)
        with open(src, "rb") as f:
            src_hash = hashlib.sha256(f.read()).hexdigest()
        stamp = so + ".hash"
        try:
            if not os.path.exists(so) or not os.path.exists(stamp) or \
                    open(stamp).read().strip() != src_hash:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", so, src],
                    check=True, capture_output=True)
                with open(stamp, "w") as f:
                    f.write(src_hash)
            lib = ctypes.CDLL(so)
        except (OSError, subprocess.CalledProcessError):
            return None
        lib.dn_molecule_ids.restype = ctypes.c_int64
        lib.dn_molecule_ids.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.dn_parse_pdb.restype = ctypes.c_int64
        lib.dn_parse_pdb.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double)]
        lib.dn_residue_masses.restype = None
        lib.dn_residue_masses.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double)]
        _lib = lib
        return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def molecule_ids_native(n: int, edges: np.ndarray):
    """edges: (m, 2) int64.  Returns (labels int32, n_molecules) or None."""
    lib = get_lib()
    if lib is None:
        return None
    edges = np.ascontiguousarray(edges, np.int64)
    labels = np.empty(n, np.int32)
    n_mol = lib.dn_molecule_ids(n, _ptr(edges, ctypes.c_int64),
                                len(edges), _ptr(labels, ctypes.c_int32))
    return labels, int(n_mol)


def parse_pdb_native(path: str, max_atoms: int = 8_000_000):
    lib = get_lib()
    if lib is None:
        return None
    coords = np.empty((max_atoms, 3), np.float64)
    res_seq = np.empty(max_atoms, np.int32)
    names = np.zeros(max_atoms * 8, np.uint8)
    res_names = np.zeros(max_atoms * 8, np.uint8)
    box = np.zeros(3, np.float64)
    count = lib.dn_parse_pdb(
        path.encode(), max_atoms, _ptr(coords, ctypes.c_double),
        _ptr(res_seq, ctypes.c_int32),
        names.ctypes.data_as(ctypes.c_char_p),
        res_names.ctypes.data_as(ctypes.c_char_p),
        _ptr(box, ctypes.c_double))
    if count < 0:
        raise IOError(f"dn_parse_pdb failed for {path!r} (code {count})")
    names = names.reshape(max_atoms, 8)[:count]
    res_names = res_names.reshape(max_atoms, 8)[:count]
    to_str = lambda arr: [bytes(r).rstrip(b"\0").decode() for r in arr]
    return (coords[:count].copy(), res_seq[:count].copy(),
            to_str(names), to_str(res_names),
            box if box.any() else None)


def residue_masses_native(resid: np.ndarray, masses: np.ndarray,
                          n_res: int):
    lib = get_lib()
    if lib is None:
        return None
    resid = np.ascontiguousarray(resid, np.int32)
    masses = np.ascontiguousarray(masses, np.float64)
    out = np.empty(n_res, np.float64)
    lib.dn_residue_masses(len(resid), _ptr(resid, ctypes.c_int32),
                          _ptr(masses, ctypes.c_double), n_res,
                          _ptr(out, ctypes.c_double))
    return out
