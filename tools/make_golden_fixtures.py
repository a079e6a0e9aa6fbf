"""Generate golden parity fixtures from the reference TF implementation.

Builds the reference Keras model (``/root/reference`` on sys.path, with
openbabel/pymatgen stubbed — they're only needed for featurization, which we
don't call), saves a full-model H5 checkpoint + random inputs + reference
outputs (prediction and GA scores) into ``tests/fixtures/``.

The committed artifacts are numeric fixtures (npz/h5), used by
``tests/test_golden.py`` to verify (a) the H5 -> pytree weight converter and
(b) bit-level forward parity of the JAX model against the reference graph.

Run: python tools/make_golden_fixtures.py
"""

import os
import sys
import types

os.environ["CUDA_VISIBLE_DEVICES"] = ""
os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"
# The reference targets Keras 2 (TF 2.10 era); the image ships Keras 3 whose
# functional API can't build the reference graph. tf_keras provides Keras 2.
os.environ["TF_USE_LEGACY_KERAS"] = "1"

# Stub the featurization-only deps so the reference package imports.
for name in ["openbabel", "openbabel.pybel"]:
    sys.modules.setdefault(name, types.ModuleType(name))
sys.modules["openbabel"].pybel = sys.modules["openbabel.pybel"]
pmt = types.ModuleType("pymatgen")
pmt_core = types.ModuleType("pymatgen.core")
pmt_core.Molecule = object
pmt_core.Structure = object
sys.modules.setdefault("pymatgen", pmt)
sys.modules.setdefault("pymatgen.core", pmt_core)
pmt_env = types.ModuleType("pymatgen.analysis.local_env")
pmt_env.VoronoiNN = object
pmt_analysis = types.ModuleType("pymatgen.analysis")
sys.modules.setdefault("pymatgen.analysis", pmt_analysis)
sys.modules.setdefault("pymatgen.analysis.local_env", pmt_env)
ase = types.ModuleType("ase")
ase_units = types.ModuleType("ase.units")
for unit in ("Ang", "Bohr", "Debye", "Hartree", "eV"):
    setattr(ase_units, unit, 1.0)
ase.units = ase_units
sys.modules.setdefault("ase", ase)
sys.modules.setdefault("ase.units", ase_units)

sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402
import tensorflow as tf  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def make_inputs(rng, B, M, N, use_ring=False, cgcnn=False, n_atoms=10):
    n_per = rng.integers(3, M + 1, size=B)
    atomic = np.zeros((B, M), np.int32)
    atom_mask = np.zeros((B, M, 1), np.float32)
    neighbors = np.zeros((B, M, N), np.int32)
    neighbor_mask = np.zeros((B, M, N), np.float32)
    weight = np.zeros((B, M, N), np.float32)
    dist = np.zeros((B, M, N), np.float32)
    for b in range(B):
        na = n_per[b]
        atomic[b, :na] = rng.integers(1, n_atoms, size=na)
        atom_mask[b, :na, 0] = 1.0
        for m in range(na):
            nn = rng.integers(1, min(N, na) + 1)
            neighbors[b, m, :nn] = rng.integers(0, na, size=nn)
            neighbor_mask[b, m, :nn] = 1.0
            weight[b, m, :nn] = rng.uniform(0.3, 3.0, size=nn)
            dist[b, m, :nn] = rng.uniform(0.8, 4.0, size=nn)
    inputs = dict(atomic=atomic, atom_mask=atom_mask, neighbors=neighbors,
                  neighbor_mask=neighbor_mask, neighbor_weight=weight,
                  neighbor_distance=dist)
    if use_ring:
        inputs["ring_aromatic"] = (
            rng.integers(0, 2, size=(B, M, 2)).astype(np.float32) * atom_mask
        )
    if cgcnn:
        feat = np.zeros((B, M, 92), np.float32)
        for b in range(B):
            for m in range(M):
                if atom_mask[b, m, 0]:
                    feat[b, m, rng.integers(0, 92, size=5)] = 1.0
        inputs["atomic"] = feat
    return inputs


CASES = {
    # SCANN+ (g_update) QM9-like — the flagship config
    "scann_plus": dict(
        model=dict(n_atoms=10, embedding_dim=16, n_attention=3, local_dim=32,
                   num_head=4, global_dim=32, dense_out=16, scale=0.5,
                   use_attn_norm=True, use_ga_norm=True, use_ring=False,
                   g_update=True, gaussian_d=4.0, feature="atomic",
                   use_drop=False),
        hyper=dict(target="homo"),
        B=4, M=12, N=6,
    ),
    # SCANN (no g_update, Voronoi-weight path), no GA norm
    "scann_base": dict(
        model=dict(n_atoms=10, embedding_dim=16, n_attention=2, local_dim=32,
                   num_head=4, global_dim=32, dense_out=16, scale=0.5,
                   use_attn_norm=True, use_ga_norm=False, use_ring=False,
                   g_update=False, gaussian_d=4.0, feature="atomic",
                   use_drop=False),
        hyper=dict(target="homo"),
        B=3, M=10, N=5,
    ),
    # ring features + mrelu head (e_b target)
    "scann_ring_eb": dict(
        model=dict(n_atoms=80, embedding_dim=16, n_attention=2, local_dim=32,
                   num_head=4, global_dim=32, dense_out=16, scale=0.5,
                   use_attn_norm=True, use_ga_norm=True, use_ring=True,
                   g_update=False, gaussian_d=4.0, feature="atomic",
                   use_drop=False),
        hyper=dict(target="e_b"),
        B=3, M=8, N=4,
    ),
    # cgcnn 92-dim features
    "scann_cgcnn": dict(
        model=dict(n_atoms=95, embedding_dim=16, n_attention=2, local_dim=32,
                   num_head=4, global_dim=32, dense_out=16, scale=0.5,
                   use_attn_norm=True, use_ga_norm=True, use_ring=False,
                   g_update=True, gaussian_d=6.0, feature="cgcnn",
                   use_drop=False),
        hyper=dict(target="e_form"),
        B=3, M=8, N=4,
    ),
    # QM9 SCANN+ full-size architecture (real config dims) for perf-parity;
    # trained weights (not random init) so the fixture exercises realistic
    # weight magnitudes / LayerNorm statistics
    "scann_plus_qm9full": dict(
        model=dict(n_atoms=10, embedding_dim=48, n_attention=7, local_dim=128,
                   num_head=8, global_dim=128, dense_out=128, scale=0.5,
                   use_attn_norm=True, use_ga_norm=True, use_ring=False,
                   g_update=True, gaussian_d=4.0, feature="atomic",
                   use_drop=False),
        hyper=dict(target="homo"),
        B=2, M=20, N=8, train_epochs=120,
    ),
    # MP2018 full-size architecture (reference configs/model_mp2018.yaml:
    # 9 layers, dim 128, gaussian_d 6.0), trained weights
    "scann_plus_mp2018full": dict(
        model=dict(n_atoms=95, embedding_dim=128, n_attention=9, local_dim=128,
                   num_head=8, global_dim=128, dense_out=128, scale=0.5,
                   use_attn_norm=True, use_ga_norm=True, use_ring=False,
                   g_update=True, gaussian_d=6.0, feature="atomic",
                   use_drop=False),
        hyper=dict(target="e_f"),
        B=2, M=24, N=10, train_epochs=80,
    ),
    # deepest published architecture (reference configs/model_ptgp.yaml:
    # 11 layers), trained weights
    "scann_plus_ptgp11": dict(
        model=dict(n_atoms=95, embedding_dim=128, n_attention=11, local_dim=128,
                   num_head=8, global_dim=128, dense_out=128, scale=0.5,
                   use_attn_norm=True, use_ga_norm=True, use_ring=False,
                   g_update=True, gaussian_d=4.0, feature="atomic",
                   use_drop=False),
        hyper=dict(target="total_energy"),
        B=2, M=16, N=8, train_epochs=60,
    ),
}


def main():
    tf.keras.utils.set_random_seed(0)
    from scann.models.scann_model import create_model

    os.makedirs(FIXDIR, exist_ok=True)
    rng = np.random.default_rng(7)

    for name, case in CASES.items():
        tf.keras.backend.clear_session()  # reset auto layer-name counters
        config = {"model": case["model"], "hyper": case["hyper"]}
        model = create_model(config)

        inputs = make_inputs(rng, case["B"], case["M"], case["N"],
                             use_ring=case["model"]["use_ring"],
                             cgcnn=case["model"]["feature"] == "cgcnn",
                             n_atoms=case["model"]["n_atoms"])

        # move weights away from random init: real checkpoints (the published
        # figshare H5s) carry trained magnitudes that random-weight fixtures
        # don't exercise
        if case.get("train_epochs"):
            y = rng.normal(size=(case["B"], 1)).astype(np.float32)
            model.compile(loss="mse",
                          optimizer=tf.keras.optimizers.Adam(1e-3))
            model.fit(inputs, y, epochs=case["train_epochs"],
                      batch_size=case["B"], verbose=0)

        pred = model.predict(inputs, verbose=0)
        ga_out = model.get_layer("global_attention").output[0]
        infer = tf.keras.Model(model.input, [model.output, ga_out])
        pred2, ga = infer.predict(inputs, verbose=0)
        assert np.allclose(pred, pred2)

        h5_path = os.path.join(FIXDIR, f"{name}.h5")
        try:
            model.save(h5_path)  # full-model H5, the published-checkpoint format
        except TypeError:
            # this tf_keras can't serialize the custom mrelu activation in
            # full-model format; fall back to a weights-only H5 (root-level
            # layer groups instead of a "model_weights" group)
            if os.path.exists(h5_path):
                os.remove(h5_path)
            h5_path = os.path.join(FIXDIR, f"{name}.weights.h5")
            model.save_weights(h5_path)

        np.savez_compressed(
            os.path.join(FIXDIR, f"{name}.npz"),
            prediction=pred, ga_score=ga,
            **{f"input_{k}": v for k, v in inputs.items()},
        )
        import json
        with open(os.path.join(FIXDIR, f"{name}.json"), "w") as f:
            json.dump(config, f, indent=1)
        print(f"{name}: pred {pred.ravel()[:4]} ga[0,:4] {ga[0, :4].ravel()}")


if __name__ == "__main__":
    main()
