"""Generate scann_tpu/data/assets/cgcnn_features.npz.

Extracts the 92-dim CGCNN one-hot atom descriptor table from the reference
data file (``/root/reference/scann/utils/dataset/atomic_data.py``) into a
binary asset. This is pure data (the public CGCNN ``atom_init.json`` table),
not code.
"""

import importlib.util
import os

import numpy as np

REF = "/root/reference/scann/utils/dataset/atomic_data.py"
OUT = os.path.join(os.path.dirname(__file__), "..", "scann_tpu", "data", "assets",
                   "cgcnn_features.npz")


def main():
    spec = importlib.util.spec_from_file_location("ref_atomic_data", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    feats = {str(k): np.asarray(v, dtype=np.float32) for k, v in mod.atomic_features.items()}
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **feats)
    print(f"wrote {len(feats)} entries to {OUT}")


if __name__ == "__main__":
    main()
