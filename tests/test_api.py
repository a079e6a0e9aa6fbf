"""High-level API tests: lifecycle, pretrained loading, transfer, inference."""

import os

import numpy as np
import pytest
import yaml

from scann_tpu.api import Scann, prepare_input
from scann_tpu.config import HyperConfig, ModelConfig, ScannConfig
from scann_tpu.data.structure import Structure
from scann_tpu.data.synthetic import make_synthetic_dataset

pytestmark = pytest.mark.slow  # integration-scale: full train/eval cycles


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    out = tmp_path_factory.mktemp("api_synth")
    return make_synthetic_dataset(str(out), n_structures=48, min_atoms=4,
                                  max_atoms=10, seed=9)


def small_config(workdir, e, n, **model_kw):
    model_kw = {"n_atoms": 12, "embedding_dim": 8, "n_attention": 1,
                "local_dim": 16, "num_head": 2, "global_dim": 16,
                "dense_out": 8, "g_update": True, **model_kw}
    return ScannConfig(
        model=ModelConfig(**model_kw),
        hyper=HyperConfig(batch_size=16, lr=1e-3, min_lr=1e-4, epochs=2,
                          patience=10, target="homo", save_path=workdir,
                          data_energy_path=e, data_nei_path=n,
                          train_size=32, test_size=8),
    )


class TestScannLifecycle:
    def test_train_eval_predict(self, synth, tmp_path):
        e, n = synth
        scann = Scann(small_config(str(tmp_path / "run"), e, n))
        scann.prepare_dataset()
        scann.train(epochs=2)
        res = scann.evaluate()
        assert np.isfinite(res["test_mae"])
        # reloaded-from-dir inference gives identical predictions
        workdir = scann.trainer.workdir
        reloaded = Scann.load_model_infer(workdir)
        mol = Structure(["C", "O", "H"], [[0, 0, 0], [1.2, 0, 0], [-1.0, 0.4, 0]])
        v1, ga1 = scann.predict_structure(mol)
        v2, ga2 = reloaded.predict_structure(mol)
        assert v1 == pytest.approx(v2, rel=1e-5)
        np.testing.assert_allclose(ga1, ga2, rtol=1e-5)
        # config round-trip: standardization constants persisted
        saved = yaml.safe_load(open(os.path.join(workdir, "config.yaml")))
        assert saved["hyper"]["target_std"] != 1.0

    def test_transfer_from_h5_pretrained(self, synth, tmp_path):
        """Reference transfer flow: start from an H5 checkpoint, fine-tune
        (reference --pretrained, scann_model.py:71-77 / README 185-188)."""
        e, n = synth
        import json
        cfg_d = json.load(open("tests/fixtures/scann_plus.json"))
        cfg = ScannConfig.from_dict(cfg_d)
        cfg.hyper.batch_size = 8
        cfg.hyper.train_size, cfg.hyper.test_size = 32, 8
        cfg.hyper.save_path = str(tmp_path / "transfer")
        cfg.hyper.target = "homo"
        cfg.hyper.data_energy_path, cfg.hyper.data_nei_path = e, n
        cfg.model.n_atoms = 12

        scann = Scann(cfg, pretrained="tests/fixtures/scann_plus.h5")
        # embed_atom vocab differs (10 vs 12) -> loader keeps H5 shapes; model
        # must still run for atoms < 10... use the H5's own vocab instead
        scann2 = Scann(ScannConfig.from_dict(json.load(
            open("tests/fixtures/scann_plus.json"))),
            pretrained="tests/fixtures/scann_plus.h5")
        assert scann2.trainer.state is not None
        # params loaded, not random: kernel matches H5 content
        import h5py
        with h5py.File("tests/fixtures/scann_plus.h5") as f:
            ref = np.asarray(
                f["model_weights/after_Lc/after_Lc/kernel:0"])
        got = np.asarray(scann2.trainer.state.params["after_Lc"]["kernel"])
        np.testing.assert_array_equal(got, ref)

    def test_export_h5_round_trip(self, synth, tmp_path):
        """Scann.export_h5 writes a reference-layout H5 that a second Scann
        loads via the pretrained= path; predictions are identical — the
        train-here / hand-to-reference-tooling round trip."""
        e, n = synth
        cfg = small_config(str(tmp_path / "exp"), e, n)
        scann = Scann(cfg)
        scann.prepare_dataset()
        scann.train(epochs=1)
        h5_path = scann.export_h5(str(tmp_path / "exported.h5"))

        cfg2 = small_config(str(tmp_path / "exp2"), e, n)
        reloaded = Scann(cfg2, pretrained=h5_path)
        # carry the learned target scaler over (export_h5 stores weights
        # only, like the reference's model_weights groups)
        reloaded.config.hyper.target_mean = scann.config.hyper.target_mean
        reloaded.config.hyper.target_std = scann.config.hyper.target_std
        mol = Structure(["C", "O", "H"],
                        [[0, 0, 0], [1.2, 0, 0], [-1.0, 0.4, 0]])
        v1, ga1 = scann.predict_structure(mol)
        v2, ga2 = reloaded.predict_structure(mol)
        assert v1 == pytest.approx(v2, rel=1e-6)
        np.testing.assert_allclose(ga1, ga2, rtol=1e-6)

    def test_finetune_continues_from_pretrained(self, synth, tmp_path):
        e, n = synth
        import json
        cfg = ScannConfig.from_dict(json.load(open("tests/fixtures/scann_plus.json")))
        cfg.hyper.batch_size = 8
        cfg.hyper.train_size, cfg.hyper.test_size = 32, 8
        cfg.hyper.save_path = str(tmp_path / "ft")
        cfg.hyper.target = "homo"
        cfg.hyper.epochs = 2
        cfg.hyper.patience = 10
        cfg.hyper.data_energy_path, cfg.hyper.data_nei_path = e, n
        scann = Scann(cfg, pretrained="tests/fixtures/scann_plus.h5")
        scann.prepare_dataset()
        hist = scann.train(epochs=2)
        assert len(hist["loss"]) == 2
        assert np.isfinite(hist["loss"][-1])


class TestPrepareInput:
    def test_base_inputs_padded(self):
        mol = Structure(["O", "H", "H"], [[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])
        inp = prepare_input(mol)
        assert inp["atomic"].shape[1] % 8 == 0
        assert inp["neighbors"].shape[2] % 4 == 0
        assert inp["atom_mask"][0, :3, 0].sum() == 3

    def test_weight_channel_selection(self):
        mol = Structure(["O", "H", "H"], [[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])
        plus = prepare_input(mol, angle=True)    # raw solid angle (SCANN+)
        base = prepare_input(mol, angle=False)   # normalized (SCANN)
        nm = plus["neighbor_mask"] > 0
        assert plus["neighbor_weight"][nm].max() > 1.0
        assert base["neighbor_weight"][nm].max() <= 1.0 + 1e-6

    def test_ring_and_cgcnn(self):
        mol = Structure(["C", "C", "O", "H"], [[0, 0, 0], [1.4, 0, 0],
                                               [2.2, 1.0, 0], [-1.0, 0.5, 0]])
        inp = prepare_input(mol, use_ring=True, feature="cgcnn")
        assert inp["ring_aromatic"].shape[-1] == 2
        assert inp["atomic"].shape[-1] == 92
        # carbon feature row non-zero only on valid atoms
        assert np.abs(inp["atomic"][0, :4]).sum() > 0
        assert np.abs(inp["atomic"][0, 4:]).sum() == 0


class TestBatchedInference:
    def test_predict_structures_matches_single(self, synth, tmp_path):
        e, n = synth
        scann = Scann(small_config(str(tmp_path / "bi"), e, n))
        scann.prepare_dataset()
        scann.train(epochs=1)
        mols = [
            Structure(["O", "H", "H"], [[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]]),
            Structure(["C", "O"], [[0, 0, 0], [1.2, 0, 0]]),
            Structure(["N", "H", "H", "H"],
                      [[0, 0, 0], [1.0, 0, 0], [-0.3, 0.95, 0], [-0.3, -0.4, 0.85]]),
        ]
        batched = scann.predict_structures(mols)
        for mol, (v_b, ga_b) in zip(mols, batched):
            v_s, ga_s = scann.predict_structure(mol)
            assert v_b == pytest.approx(v_s, rel=1e-4)
            np.testing.assert_allclose(ga_b, ga_s, rtol=1e-4, atol=1e-6)

    def test_mixed_molecule_crystal_batch_default_canonical(self, synth,
                                                            tmp_path):
        """The round-4 canonical_frame=True serving default must be safe
        for MIXED batches: crystals pass through untouched (canonicalized()
        is the identity for periodic structures — their lattice IS the
        frame) while molecules get the principal-axes rotation."""
        e, n = synth
        scann = Scann(small_config(str(tmp_path / "mx"), e, n, n_atoms=20))
        scann.prepare_dataset()
        scann.train(epochs=1)
        mol = Structure(["O", "H", "H"],
                        [[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])
        # NaCl at 5.7 A: nearest neighbor 4.94 A > d_t=4.0, so EVERY Voronoi
        # neighbor is distance-filtered — also covers the zero-neighbor
        # degenerate input staying finite
        crystal = Structure(["Na", "Cl"], [[0, 0, 0], [2.85, 2.85, 2.85]],
                            lattice=np.eye(3) * 5.7)
        out = scann.predict_structures([mol, crystal, mol])
        assert all(np.isfinite(v) for v, _ in out)
        # crystal prediction identical to the explicit raw-frame path
        v_raw, ga_raw = scann.predict_structure(crystal,
                                                canonical_frame=False)
        assert out[1][0] == pytest.approx(v_raw, rel=1e-6)
        np.testing.assert_allclose(out[1][1], ga_raw, rtol=1e-6)
        # the two molecule copies agree with each other
        assert out[0][0] == pytest.approx(out[2][0], rel=1e-6)


def test_predict_data_after_split_prepare(synth, tmp_path):
    """predict_data() after a split prepare_dataset covers the full dataset
    (union of train/valid/test in original order) — regression: it used to
    crash with buckets=None (found by the full-lifecycle rehearsal)."""
    e, n = synth
    cfg = small_config(str(tmp_path / "pd"), e, n)
    s = Scann(cfg)
    s.prepare_dataset(split=True)
    s.trainer.init_state(s._example_inputs())
    preds = s.predict_data()
    assert preds.shape == (cfg.hyper.data_size,)
    assert np.all(np.isfinite(preds))


def test_canonical_frame_notice_once_on_molecules(caplog):
    """The one-time INFO log when canonical-frame serving engages on
    molecule inputs (ADVICE r4: the v0.4 default flip must be visible in
    operator logs, not silent). Periodic inputs never trigger it."""
    import logging

    from scann_tpu import api as api_mod
    from scann_tpu.api import _canonical_frame_notice

    crystal = Structure(["Fe"], [[0.0, 0.0, 0.0]],
                        lattice=np.eye(3) * 3.0)
    mol = Structure(["C", "O"], [[0, 0, 0], [1.13, 0, 0]])

    api_mod._CANONICAL_NOTICE_EMITTED[0] = False
    try:
        with caplog.at_level(logging.INFO, logger="scann_tpu.api"):
            _canonical_frame_notice([crystal])
            assert not caplog.records  # periodic-only: no notice
            _canonical_frame_notice([crystal, mol])
            assert len(caplog.records) == 1
            assert "canonical_frame" in caplog.records[0].message
            assert "CHANGELOG" in caplog.records[0].message
            _canonical_frame_notice([mol])  # one-time: no repeat
            assert len(caplog.records) == 1
    finally:
        api_mod._CANONICAL_NOTICE_EMITTED[0] = True  # leave quiet for others
