"""ctypes binding for the native (C++) per-atom Voronoi cell featurizer.

``native/voronoi_cell.cc`` constructs each home atom's Voronoi cell by
incremental half-space clipping (Voro++-style) instead of the global
scipy/Qhull tessellation — the same facets, solid angles and distances to
floating-point noise, at a fraction of the host cost (the featurizer is the
serving/preprocessing bottleneck; see DESIGN.md). Falls back to the scipy
path in ``data/voronoi.py`` when no compiler is available, when the cell
construction flags a geometric degeneracy, or when
``SCANN_TPU_NATIVE_VORONOI=0``.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

from scann_tpu.data.native import build_shared_library

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "voronoi_cell.cc")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    so = build_shared_library(_SRC, "libscannvoronoi.so")
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        so = build_shared_library(_SRC, "libscannvoronoi.so", force=True)
        try:
            lib = ctypes.CDLL(so) if so else None
        except OSError:
            lib = None
        if lib is None:
            return None
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.scann_voronoi_facets.argtypes = [
        f64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i32p, i64p, f64p, f64p,
    ]
    lib.scann_voronoi_facets.restype = ctypes.c_int
    _lib = lib
    return _lib


def voronoi_facets_native(
    points: np.ndarray, n_home: int, base_idx: np.ndarray
) -> Optional[List[List[Tuple[int, float, float]]]]:
    """Per-home-atom Voronoi facets ``(neighbor_base_index, solid_angle,
    distance)`` over the candidate cloud ``points`` (home atoms first) —
    the native equivalent of ``voronoi._voronoi_facets_scipy``. Returns
    None when the native library is unavailable or any atom's cell
    construction failed (caller falls back to scipy).
    """
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float64)
    P = len(pts)
    max_f = 64
    while True:
        counts = np.zeros(n_home, np.int32)
        nbr = np.zeros(n_home * max_f, np.int64)
        sa = np.zeros(n_home * max_f, np.float64)
        dist = np.zeros(n_home * max_f, np.float64)
        rc = lib.scann_voronoi_facets(pts, P, n_home, max_f, counts, nbr, sa, dist)
        if rc == 0:
            break
        max_f *= 4
        if max_f > 4096:  # pathological; let scipy try
            return None
    if (counts < 0).any():
        return None
    out: List[List[Tuple[int, float, float]]] = []
    for i in range(n_home):
        c = int(counts[i])
        o = i * max_f
        out.append([
            (int(base_idx[nbr[o + f]]), float(sa[o + f]), float(dist[o + f]))
            for f in range(c)
        ])
    return out
