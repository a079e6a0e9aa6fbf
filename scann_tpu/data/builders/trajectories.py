"""MD-trajectory dataset builders: fullerene, Pt/graphene, SmFe12.

All three are zenodo zips of (multi-frame) xyz files whose comment lines
carry the targets (reference ``fullerene.py``, ``pt_graphene.py``,
``smfe.py``):

- fullerene: ``homo lumo total_energy`` on the comment line; ring/aromatic
  flags included (used for transfer from QM9),
- ptgp: ``total_energy Ref_energy`` (enables ``use_ref`` training),
- smfe: extended-xyz with ``Lattice="..."`` and the formation energy as the
  last quoted field.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import zipfile
from typing import Callable, List

import numpy as np

from scann_tpu.data.atomic_data import atomic_numbers
from scann_tpu.data.builders.bonds import ring_aromatic_flags
from scann_tpu.data.builders.common import download, save_dataset

FULLERENE_URL = "https://zenodo.org/record/8435481/files/fullerene.zip?download=1"
# NOTE: the reference's Pt/graphene builder downloads *fullerene.zip*
# (``/root/reference/scann/utils/dataset/pt_graphene.py:24`` — likely a bug,
# or zenodo 8435481 ships a combined archive). Neither can be verified in
# this environment (no egress), so the ptgp builder tries a FALLBACK CHAIN:
# the dataset-named ``pt_graphene.zip`` first, then the reference's
# ``fullerene.zip`` — so the first real egress run cannot 404 either way.
# Whichever downloads is then VALIDATED before being accepted as ptgp data
# (exactly-2-token comments per frame + Pt present in the archive); a
# fullerene-content archive raises loudly instead of fabricating targets.
PTGP_URLS = [
    "https://zenodo.org/record/8435481/files/pt_graphene.zip?download=1",
    FULLERENE_URL,
]
SMFE_URL = "https://zenodo.org/record/8435481/files/smfe12.zip?download=1"


def iter_xyz_frames(path: str):
    """Yield (comment, species, coords) for every frame in a multi-xyz file."""
    with open(path) as f:
        lines = f.readlines()
    i = 0
    while i < len(lines):
        if not lines[i].strip():
            i += 1
            continue
        n = int(lines[i].split()[0])
        comment = lines[i + 1].rstrip("\n")
        species, coords = [], []
        for ln in lines[i + 2 : i + 2 + n]:
            parts = ln.split()
            species.append(parts[0])
            coords.append([float(x) for x in parts[1:4]])
        yield comment, species, np.asarray(coords, dtype=np.float32)
        i += 2 + n


def _base_record(idx, species, coords, properties):
    return {
        "id": idx,
        "Properties": properties,
        "Atoms": list(species),
        "Atomic": [atomic_numbers[s] for s in species],
        "Coords": coords,
        "Cartesian": True,
    }


def fullerene_record(idx, comment, species, coords):
    vals = comment.split()
    rec = _base_record(idx, species, coords, {
        "homo": float(vals[0]), "lumo": float(vals[1]),
        "total_energy": float(vals[2]),
    })
    ring, aromatic = ring_aromatic_flags(species, coords)
    rec["Features"] = {"Ring": ring.tolist(), "Aromatic": aromatic.tolist()}
    return rec


def ptgp_record(idx, comment, species, coords):
    vals = comment.split()
    if len(vals) != 2:
        # A fullerene-format frame (3 tokens: homo lumo total_energy) must
        # NOT silently parse with the ptgp schema — a 2-token prefix read
        # would record homo as total_energy and lumo as Ref_energy,
        # fabricating wrong training targets. See PTGP_URLS: the fallback
        # chain can legitimately hand this parser a fullerene.zip.
        raise ValueError(
            f"ptgp frame {idx}: expected exactly 2 comment tokens "
            f"(total_energy Ref_energy), got {len(vals)}: {comment!r}. "
            "The downloaded archive does not contain Pt/graphene-format "
            "frames — refusing to fabricate mislabeled targets.")
    return _base_record(idx, species, coords, {
        "total_energy": float(vals[0]), "Ref_energy": float(vals[1]),
    })


def _validate_ptgp_records(records: List[dict]) -> None:
    """Archive-level sanity check for the ptgp fallback chain: a
    Pt/graphene trajectory must actually contain platinum somewhere."""
    PT = atomic_numbers["Pt"]
    if records and not any(PT in r["Atomic"] for r in records):
        raise RuntimeError(
            f"ptgp archive parsed {len(records)} frames but none contain "
            "Pt — the fallback archive is not the Pt/graphene dataset; "
            "refusing to save mislabeled records.")


def smfe_record(idx, comment, species, coords):
    parts = comment.split('"')
    lattice = np.array(parts[1].split(), np.float32).reshape(3, 3)
    rec = _base_record(idx, species, coords, {"e_f": float(parts[-2])})
    rec["Lattice"] = lattice
    del rec["Cartesian"]  # smfe records carry Lattice + cartesian coords
    return rec


def _download_first(urls: List[str], dest: str, what: str) -> str:
    """Try each URL in order, returning the first successful download.

    Exists for the ptgp pt_graphene.zip-vs-fullerene.zip naming divergence
    (see PTGP_URLS): a missing file on the record must fall through to the
    next candidate, not abort preprocessing."""
    errors = []
    for url in urls:
        try:
            return download(url, dest, what)
        except RuntimeError as e:
            errors.append(str(e))
    raise RuntimeError(
        f"all {len(urls)} candidate URLs for {what} failed:\n  "
        + "\n  ".join(errors))


def _process_zip(url, dataset: str, glob_pat: str,
                 make_record: Callable, save_path: str,
                 sort_by_size: bool = False,
                 validate_records: Callable = None):
    urls = [url] if isinstance(url, str) else list(url)
    tmpdir = tempfile.mkdtemp(dataset)
    try:
        zip_path = _download_first(urls, os.path.join(tmpdir, f"{dataset}.zip"),
                                   dataset)
        zipfile.ZipFile(zip_path).extractall(tmpdir)
        files = sorted(glob.glob(os.path.join(tmpdir, glob_pat)))
        print(f"  {len(files)} xyz files")
        records: List[dict] = []
        idx = 0
        for f in files:
            for comment, species, coords in iter_xyz_frames(f):
                records.append(make_record(idx, comment, species, coords))
                idx += 1
        if validate_records is not None:
            validate_records(records)
        return save_dataset(records, save_path, dataset, sort_by_size=sort_by_size)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def process_fullerene(save_path: str = ""):
    return _process_zip(FULLERENE_URL, "fullerene", "*/*.xyz",
                        fullerene_record, save_path)


def process_ptgp(save_path: str = ""):
    return _process_zip(PTGP_URLS, "ptgp", "*/*.xyz", ptgp_record, save_path,
                        validate_records=_validate_ptgp_records)


def process_smfe(save_path: str = ""):
    return _process_zip(SMFE_URL, "smfe", "*/*/*.xyz", smfe_record, save_path)
