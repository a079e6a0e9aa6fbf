"""Voronoi-tessellation neighbor featurization.

Re-implements the behavior of the reference featurizer
(``scann/utils/voronoi_neighbor.py``, which delegates to pymatgen's
``VoronoiNN(weight="solid_angle")``) without pymatgen:

- one scipy/Qhull Voronoi tessellation **per structure** over the home cell +
  enough periodic images to cover ``cutoff`` — instead of the reference's
  one tessellation per atom — an O(atoms) speedup of the offline step,
- facet solid angles at each home atom via the van Oosterom–Strackee formula
  over the (plane-ordered) ridge polygon,
- the same neighbor filters: ``solid_angle >= w_thresh`` AND
  ``solid_angle / max_solid_angle >= 0.2`` AND ``distance <= d_thresh``
  (reference ``voronoi_neighbor.py:48-50``),
- the same output record per neighbor:
  ``[species, base_index, solid_angle, solid_angle/max, distance]``
  (reference ``voronoi_neighbor.py:39-51``).

Molecules are boxed into a >=10 A periodic cell first (reference
``voronoi_neighbor.py:82-87``).
"""

from __future__ import annotations

import itertools
from typing import List

import numpy as np
from scipy.spatial import Voronoi
from scipy.spatial import QhullError

from scann_tpu.data.structure import Structure


def _cross3(a, b):
    """Component-wise cross product (np.cross's moveaxis machinery is ~5x
    slower on the small arrays this hot path uses)."""
    a0, a1, a2 = a[..., 0], a[..., 1], a[..., 2]
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    return np.stack([a1 * b2 - a2 * b1,
                     a2 * b0 - a0 * b2,
                     a0 * b1 - a1 * b0], axis=-1)


def _fan_solid_angle(v: np.ndarray) -> float:
    """Solid angle at the origin of the triangle fan (v[0], v[i], v[i+1])
    over an ordered polygon ``v`` [k, 3] (van Oosterom & Strackee 1983),
    all triangles evaluated in one vectorized pass — this is the serving
    hot loop (~100 ms/structure when done with per-triangle Python)."""
    r1 = v[0]
    r2 = v[1:-1]                                   # [t, 3]
    r3 = v[2:]                                     # [t, 3]
    n1 = np.sqrt(r1 @ r1)
    n2 = np.sqrt(np.einsum("ij,ij->i", r2, r2))
    n3 = np.sqrt(np.einsum("ij,ij->i", r3, r3))
    numer = np.abs(_cross3(r2, r3) @ r1)
    denom = (n1 * n2 * n3
             + (r2 @ r1) * n3
             + (r3 @ r1) * n2
             + np.einsum("ij,ij->i", r2, r3) * n1)
    return float(2.0 * np.sum(np.arctan2(numer, denom)))


def solid_angle(center: np.ndarray, polygon: np.ndarray) -> float:
    """Solid angle subtended at ``center`` by the planar polygon ``polygon``
    [k, 3]. Vertices may be in arbitrary order; they are sorted around the
    polygon plane first."""
    v = np.asarray(polygon, dtype=np.float64) - np.asarray(center, dtype=np.float64)
    if len(v) < 3:
        return 0.0
    centroid = v.mean(axis=0)
    rel = v - centroid
    # polygon-plane normal from the vertex scatter (largest cross product of
    # centroid-relative vertex pairs — robust to near-collinear pairs)
    normal = _cross3(rel[0], rel[1])
    for j in range(2, len(rel)):
        if normal @ normal > 1e-20:
            break
        normal = _cross3(rel[0], rel[j])
    nn = np.sqrt(normal @ normal)
    if nn < 1e-12:
        return 0.0  # degenerate (collinear) polygon
    normal = normal / nn
    # in-plane basis
    u = rel[0] - np.dot(rel[0], normal) * normal
    un = np.sqrt(u @ u)
    if un < 1e-12:
        return 0.0
    u /= un
    w = _cross3(normal, u)
    order = np.argsort(np.arctan2(rel @ w, rel @ u))
    return _fan_solid_angle(v[order])


def _image_ranges(lattice: np.ndarray, cutoff: float) -> List[int]:
    """Number of periodic image cells per axis so every point within
    ``cutoff`` of the home cell is included."""
    inv = np.linalg.inv(lattice)
    # distance between lattice planes along axis k = 1 / |row_k of inv|
    heights = 1.0 / np.linalg.norm(inv, axis=1)
    return [int(np.ceil(cutoff / h)) for h in heights]


def compute_voronoi_neighbors(
    struct: Structure,
    cutoff: float = 7.0,
    d_thresh: float = 4.0,
    w_thresh: float = 0.4,
    max_cutoff: float = 30.0,
) -> List[List[list]]:
    """Per-atom filtered Voronoi neighbor lists.

    Returns, for each atom, a list of
    ``[species, neighbor_base_index, solid_angle, solid_angle/max, distance]``
    — the exact record layout the reference emits
    (``voronoi_neighbor.py:39-51``), so downstream batching is interchangeable.
    """
    struct = struct.as_periodic()
    n_home = len(struct)
    lattice = struct.lattice
    home = struct.coords

    while True:
        try:
            raw = _voronoi_facets(home, lattice, n_home, cutoff)
            break
        except QhullError:
            cutoff += 5.0
            if cutoff > max_cutoff:
                raise RuntimeError(
                    "Voronoi tessellation failed up to max cutoff "
                    f"{max_cutoff} A"
                )

    out = []
    for i in range(n_home):
        facets = raw[i]
        if not facets:
            out.append([])
            continue
        max_w = max(f[1] for f in facets)
        kept = [
            [struct.species[f[0]], int(f[0]), float(f[1]), float(f[1] / max_w), float(f[2])]
            for f in facets
            if f[1] >= w_thresh and f[1] / max_w >= 0.2 and f[2] <= d_thresh
        ]
        out.append(kept)
    return out


def _voronoi_facets(home: np.ndarray, lattice: np.ndarray, n_home: int, cutoff: float):
    """All Voronoi facets of the home atoms.

    Returns per home atom a list of (neighbor_base_index, solid_angle,
    distance) over every facet of its Voronoi cell.
    """
    na, nb, nc = _image_ranges(lattice, cutoff)

    shifts = [
        np.array(s, dtype=np.float64)
        for s in itertools.product(range(-na, na + 1), range(-nb, nb + 1), range(-nc, nc + 1))
        if s != (0, 0, 0)
    ]

    points = [home]
    base_idx = [np.arange(n_home)]
    for s in shifts:
        points.append(home + s @ lattice)
        base_idx.append(np.arange(n_home))
    points = np.concatenate(points, axis=0)
    base_idx = np.concatenate(base_idx, axis=0)

    try:
        vor = Voronoi(points)
    except QhullError:
        vor = Voronoi(points, qhull_options="Qbb Qc Qz QJ")

    facets = [[] for _ in range(n_home)]
    for (p, q), vidx in zip(vor.ridge_points, vor.ridge_vertices):
        if p >= n_home and q >= n_home:
            continue
        if -1 in vidx or len(vidx) < 3:
            # unbounded ridge: can only happen if the image shell is too thin
            # for this pair; home-cell cells are closed by construction
            continue
        poly = vor.vertices[vidx]
        dist = float(np.linalg.norm(points[p] - points[q]))
        if p < n_home:
            sa = solid_angle(points[p], poly)
            if sa > 0:
                facets[p].append((int(base_idx[q]), sa, dist))
        if q < n_home:
            sa = solid_angle(points[q], poly)
            if sa > 0:
                facets[q].append((int(base_idx[p]), sa, dist))
    return facets
