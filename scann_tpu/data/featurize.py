"""Parallel offline featurization: structures -> Voronoi neighbor .npy.

Host-side counterpart of the reference ``parallel_compute_neighbor``
(``scann/utils/voronoi_neighbor.py:93-130``): fan the per-structure Voronoi
computation over a process pool and cache the ragged neighbor lists to an
``.npy`` object array keyed by the (d_t, w_t) cutoffs. Output format is
interchangeable with the reference's, so preexisting preprocessed datasets
load directly.
"""

from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor
from typing import List, Optional

import numpy as np

from scann_tpu.data.structure import Structure
from scann_tpu.data.voronoi import compute_voronoi_neighbors


def structure_from_record(rec: dict) -> Structure:
    """Build a Structure from a dataset record
    ({Atoms, Coords, [Lattice], [Cartesian]} — the on-disk schema the
    reference's builders emit, ``voronoi_neighbor.py:65-88``)."""
    species = list(rec["Atoms"])
    coords = np.asarray(rec["Coords"], dtype=np.float64)
    if "Lattice" in rec:
        lattice = np.asarray(rec["Lattice"], dtype=np.float64).reshape(3, 3)
        cartesian = rec.get("Cartesian", True)
        if cartesian:
            return Structure(species, coords, lattice)
        return Structure.from_frac(species, coords, lattice)
    return Structure(species, coords)


def featurize_record(rec: dict, d_t: float = 4.0, w_t: float = 0.4,
                     box: float = 10.0) -> List[List[list]]:
    struct = structure_from_record(rec).as_periodic(box)
    return compute_voronoi_neighbors(struct, cutoff=7.0, d_thresh=d_t, w_thresh=w_t)


def parallel_compute_neighbors(
    dataset_path: str,
    save_path: str,
    d_t: float = 4.0,
    w_t: float = 0.4,
    pool: int = 8,
    chunk: int = 64,
    log_every: int = 1000,
) -> None:
    """Compute neighbor lists for every structure in ``dataset_path``
    (energy .npy) and save them to ``save_path``."""
    dataset = np.load(dataset_path, allow_pickle=True)
    n = len(dataset)
    print(f"Voronoi featurization: {n} structures, {pool} processes "
          f"(d_t={d_t}, w_t={w_t}) -> {save_path}")

    results: List[Optional[list]] = [None] * n
    if pool <= 1:
        for i, rec in enumerate(dataset):
            results[i] = featurize_record(rec, d_t, w_t)
            if log_every and i % log_every == 0:
                print(f"  {i}/{n}")
    else:
        with ProcessPoolExecutor(pool) as ex:
            futures = {}
            for start in range(0, n, chunk):
                recs = list(dataset[start:start + chunk])
                futures[ex.submit(_featurize_chunk, recs, d_t, w_t)] = start
            done = 0
            for fut, start in futures.items():
                out = fut.result()
                results[start:start + len(out)] = out
                done += len(out)
                if log_every and done % log_every < chunk:
                    print(f"  {done}/{n}")

    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    np.save(save_path, as_object_array(results))
    print(f"saved {n} neighbor lists to {save_path}")


def as_object_array(items) -> np.ndarray:
    """A guaranteed 1-D object array. ``np.asarray(items, dtype=object)``
    collapses nested lists into an N-D array when every structure happens
    to have identical atom/neighbor counts (uniform MD frames), breaking
    the reference's 1-D-object-array on-disk schema."""
    arr = np.empty(len(items), dtype=object)
    for i, r in enumerate(items):
        arr[i] = r
    return arr


def _featurize_chunk(recs, d_t, w_t):
    return [featurize_record(r, d_t, w_t) for r in recs]


def neighbor_file_name(dataset: str, d_t: float, w_t: float) -> str:
    """Cache-file naming matching the reference
    (``preprocess_data.py:31-36``)."""
    return f"{dataset}_data_neighbor_dt{d_t}_wt{w_t}.npy"
