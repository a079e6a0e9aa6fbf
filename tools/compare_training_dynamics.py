"""Train the reference TF implementation and scann-tpu on identical data and
hyperparameters; compare convergence.

This validates the *silent* parts of the training recipe that golden forward
tests can't see: the l2(1e-4) kernel regularizers in the loss, Adam's
epsilon/decay, the RMSE objective, and the cosine schedule
(reference ``scann_model.py:199-214``).

Run (CPU, ~5 min):  python tools/compare_training_dynamics.py
"""

import json
import os
import sys
import types

os.environ["CUDA_VISIBLE_DEVICES"] = ""
os.environ["TF_USE_LEGACY_KERAS"] = "1"
os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# stub featurization-only deps of the reference package
for name in ["openbabel", "openbabel.pybel"]:
    sys.modules.setdefault(name, types.ModuleType(name))
sys.modules["openbabel"].pybel = sys.modules["openbabel.pybel"]
for name, attrs in [("pymatgen", {}), ("pymatgen.core", {"Molecule": object, "Structure": object}),
                    ("pymatgen.analysis", {}), ("pymatgen.analysis.local_env", {"VoronoiNN": object}),
                    ("ase", {}), ("ase.units", {u: 1.0 for u in ("Ang", "Bohr", "Debye", "Hartree", "eV")})]:
    mod = sys.modules.setdefault(name, types.ModuleType(name))
    for k, v in attrs.items():
        setattr(mod, k, v)
sys.modules["ase"].units = sys.modules["ase.units"]
sys.path.insert(0, "/root/reference")

import numpy as np


MODEL_CFG = dict(n_atoms=12, embedding_dim=16, n_attention=2, local_dim=32,
                 num_head=8, global_dim=32, dense_out=16, scale=0.5,
                 use_attn_norm=True, use_ga_norm=True, use_ring=False,
                 g_update=True, gaussian_d=4.0, feature="atomic",
                 use_drop=False)
LR, MIN_LR, EPOCHS, BATCH = 1e-3, 1e-4, 30, 32


def make_data(out_dir):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from scann_tpu.data.pipeline import load_dataset, pack_dataset, split_data
    from scann_tpu.data.synthetic import make_synthetic_dataset

    e, n = make_synthetic_dataset(out_dir, n_structures=256, min_atoms=5,
                                  max_atoms=12, seed=11)
    records, neighbors = load_dataset(e, n, target="homo")
    ys = np.array([r["target"] for r in records], np.float32)
    mean, std = float(ys.mean()), float(ys.std())
    for r in records:
        r["target"] = (r["target"] - mean) / std
    tr, va, _ = split_data(256, train_size=224, test_size=0, seed=0)
    buckets = pack_dataset(records, neighbors, g_update=True, max_buckets=1)
    return buckets, tr, va


def bucket_to_tf_batches(bucket, indices, batch):
    """Fixed batch order for both frameworks."""
    out = []
    idxs = np.asarray(sorted(indices.tolist()))
    pos = {int(o): k for k, o in enumerate(bucket.indices)}
    rows = np.array([pos[int(i)] for i in idxs])
    for s in range(0, len(rows) - batch + 1, batch):
        sel = rows[s:s + batch]
        inp = {k: v[sel] for k, v in bucket.inputs.items()}
        out.append((inp, bucket.targets[sel]))
    return out


def train_reference(batches, val_batches):
    import tensorflow as tf

    tf.keras.utils.set_random_seed(0)
    from scann.models.scann_model import create_model, root_mean_squared_error

    model = create_model({"model": MODEL_CFG, "hyper": {"target": "homo"}})
    steps = len(batches) * EPOCHS
    lr = tf.keras.optimizers.schedules.CosineDecay(LR, 0.5 * steps,
                                                   alpha=MIN_LR / LR)
    model.compile(loss=root_mean_squared_error,
                  optimizer=tf.keras.optimizers.legacy.Adam(lr, decay=1e-5),
                  metrics=["mae"])
    hist = {"loss": [], "val_mae": []}
    for ep in range(EPOCHS):
        losses = []
        for inp, y in batches:
            logs = model.train_on_batch(inp, y, return_dict=True)
            losses.append(logs["loss"])
        maes = []
        for inp, y in val_batches:
            pred = model.predict_on_batch(inp)
            maes.append(np.mean(np.abs(pred[:, 0] - y)))
        hist["loss"].append(float(np.mean(losses)))
        hist["val_mae"].append(float(np.mean(maes)))
    return hist


def train_ours(buckets, tr, va, workdir):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from scann_tpu.config import HyperConfig, ModelConfig, ScannConfig, TpuConfig
    from scann_tpu.data.pipeline import subset_buckets
    from scann_tpu.train import Trainer

    cfg = ScannConfig(
        model=ModelConfig(**{k: v for k, v in MODEL_CFG.items()
                             if k in ModelConfig.__dataclass_fields__}),
        hyper=HyperConfig(batch_size=BATCH, lr=LR, min_lr=MIN_LR, epochs=EPOCHS,
                          patience=1000, target="homo", save_path=workdir,
                          scheduler="cosine", seed=0),
        tpu=TpuConfig(use_pallas=False),
    )
    t = Trainer(cfg)
    hist = t.fit(subset_buckets(buckets, tr), subset_buckets(buckets, va),
                 epochs=EPOCHS, log_fn=lambda s: None)
    return hist


def main():
    import tempfile

    out_dir = tempfile.mkdtemp("dyncmp")
    buckets, tr, va = make_data(out_dir)
    bucket = buckets[0]
    tf_train = bucket_to_tf_batches(bucket, tr, BATCH)
    tf_val = bucket_to_tf_batches(bucket, va, BATCH)

    print("training scann-tpu (JAX)...")
    ours = train_ours(buckets, tr, va, os.path.join(out_dir, "jax_run"))
    print("training reference (TF)...")
    ref = train_reference(tf_train, tf_val)

    print("\nepoch |  ref loss |  jax loss |  ref val_mae |  jax val_mae")
    for e in range(0, EPOCHS, 5):
        print(f"{e:5d} | {ref['loss'][e]:9.4f} | {ours['loss'][e]:9.4f} | "
              f"{ref['val_mae'][e]:12.4f} | {ours['val_mae'][e]:12.4f}")
    e = EPOCHS - 1
    print(f"{e:5d} | {ref['loss'][e]:9.4f} | {ours['loss'][e]:9.4f} | "
          f"{ref['val_mae'][e]:12.4f} | {ours['val_mae'][e]:12.4f}")

    result = {"reference": ref, "scann_tpu": ours}
    path = os.path.join(os.path.dirname(__file__), "..",
                        "training_dynamics_comparison.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"\nwrote {path}")

    r_final, o_final = ref["val_mae"][-1], ours["val_mae"][-1]
    print(f"final val MAE: reference {r_final:.4f}, scann-tpu {o_final:.4f} "
          f"(ratio {o_final / r_final:.3f})")


if __name__ == "__main__":
    main()
