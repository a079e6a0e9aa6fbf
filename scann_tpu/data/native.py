"""ctypes binding for the native (C++) dataset packer.

Builds ``native/packer.cc`` into a shared library on first use (g++ -O3) and
falls back to pure-numpy if no compiler is available. The packer fills the
padded bucket tensors from CSR ragged arrays — the host-side hot loop of
dataset preparation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "packer.cc")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def build_shared_library(src: str, lib_name: str, force: bool = False) -> Optional[str]:
    """Compile ``src`` (a C++ file under ``native/``) into
    ``native/build/<lib_name>`` with g++ -O3, caching by mtime. Returns the
    library path, or None when no compiler is available (callers fall back
    to their pure-Python paths)."""
    so_path = os.path.join(_BUILD_DIR, lib_name)
    if (not force and os.path.exists(so_path)
            and os.path.getmtime(so_path) >= os.path.getmtime(src)):
        return so_path
    os.makedirs(_BUILD_DIR, exist_ok=True)
    # compile to a temp name and os.replace into place: an interrupted or
    # concurrent build must never leave a truncated .so at the cached path
    # (the mtime check would then skip rebuilding it forever)
    tmp_path = os.path.join(_BUILD_DIR, f".{lib_name}.{os.getpid()}.so")
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
             "-o", tmp_path],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp_path, so_path)
        return so_path
    except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
        import warnings

        warnings.warn(f"native build of {os.path.basename(src)} failed ({e}); "
                      "using pure-Python fallback")
        return None
    finally:
        if os.path.exists(tmp_path):
            try:
                os.remove(tmp_path)
            except OSError:
                pass


def _build_library(force: bool = False) -> Optional[str]:
    return build_shared_library(_SRC, "libscannpacker.so", force=force)


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    so = _build_library()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError as e:
        # a corrupt cached library (e.g. left by an older non-atomic build)
        # must degrade, not crash: rebuild once, then fall back to numpy
        import warnings

        so = _build_library(force=True)
        try:
            lib = ctypes.CDLL(so) if so else None
        except OSError:
            lib = None
        if lib is None:
            warnings.warn(f"native packer unusable ({e}); "
                          "using numpy fallback")
            return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.pack_bucket.argtypes = [
        i32p, ctypes.c_int64,          # rows
        i64p, i64p,                    # atom/nbr offsets
        i32p, i32p, f32p, f32p,        # atomic, nbr_index, weight, dist
        ctypes.c_int64, ctypes.c_int64,  # M, N
        i32p, f32p, i32p, f32p, f32p, f32p,  # outputs
    ]
    lib.pack_bucket.restype = None
    lib.structure_sizes.argtypes = [i64p, ctypes.c_int64, i64p, i32p, i32p]
    lib.structure_sizes.restype = None
    _lib = lib
    return _lib


def pack_bucket_native(rows, atom_offsets, nbr_offsets, atomic, nbr_index,
                       nbr_weight, nbr_dist, M: int, N: int):
    """Fill padded arrays for the structures in ``rows``. Returns the dict of
    padded tensors (without feature expansion)."""
    S = len(rows)
    out_atomic = np.zeros((S, M), np.int32)
    out_atom_mask = np.zeros((S, M), np.float32)
    out_nbr_idx = np.zeros((S, M, N), np.int32)
    out_nbr_mask = np.zeros((S, M, N), np.float32)
    out_nbr_weight = np.zeros((S, M, N), np.float32)
    out_nbr_dist = np.zeros((S, M, N), np.float32)

    lib = get_lib()
    rows = np.ascontiguousarray(rows, np.int32)
    if lib is not None:
        lib.pack_bucket(rows, S, atom_offsets, nbr_offsets, atomic, nbr_index,
                        nbr_weight, nbr_dist, M, N,
                        out_atomic, out_atom_mask, out_nbr_idx, out_nbr_mask,
                        out_nbr_weight, out_nbr_dist)
    else:  # numpy fallback (same semantics, slower)
        for r, s in enumerate(rows):
            a0, a1 = atom_offsets[s], atom_offsets[s + 1]
            na = min(a1 - a0, M)  # clamp like the native path
            out_atomic[r, :na] = atomic[a0:a0 + na]
            out_atom_mask[r, :na] = 1.0
            for a in range(na):
                n0, n1 = nbr_offsets[a0 + a], nbr_offsets[a0 + a + 1]
                k = min(n1 - n0, N)
                out_nbr_idx[r, a, :k] = nbr_index[n0:n0 + k]
                out_nbr_mask[r, a, :k] = 1.0
                out_nbr_weight[r, a, :k] = nbr_weight[n0:n0 + k]
                out_nbr_dist[r, a, :k] = nbr_dist[n0:n0 + k]
    return {
        "atomic": out_atomic,
        "atom_mask": out_atom_mask[..., None],
        "neighbors": out_nbr_idx,
        "neighbor_mask": out_nbr_mask,
        "neighbor_weight": out_nbr_weight,
        "neighbor_distance": out_nbr_dist,
    }


def structure_sizes_native(atom_offsets, nbr_offsets):
    n_struct = len(atom_offsets) - 1
    n_atoms = np.zeros(n_struct, np.int32)
    max_nbrs = np.zeros(n_struct, np.int32)
    lib = get_lib()
    if lib is not None:
        lib.structure_sizes(atom_offsets, n_struct, nbr_offsets, n_atoms, max_nbrs)
    else:
        counts = np.diff(nbr_offsets)
        for s in range(n_struct):
            a0, a1 = atom_offsets[s], atom_offsets[s + 1]
            n_atoms[s] = a1 - a0
            max_nbrs[s] = counts[a0:a1].max(initial=0)
    return n_atoms, max_nbrs
