"""CLI integration tests (reference L6 surface) on synthetic data."""

import json
import os
import pickle

import numpy as np
import pytest
import yaml

from scann_tpu.cli.predict_files import main as predict_files_main
from scann_tpu.cli.predict_model import main as predict_model_main
from scann_tpu.cli.preprocess import main as preprocess_main
from scann_tpu.cli.train import main as train_main

pytestmark = pytest.mark.slow  # integration-scale: full train/eval cycles


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    cwd = os.getcwd()
    os.chdir(root)
    try:
        # small synthetic dataset through the preprocess CLI
        from scann_tpu.data import builders

        orig = builders.BUILDERS["synthetic"]
        builders.BUILDERS["synthetic"] = lambda save_path="": orig(
            save_path, n_structures=48)
        try:
            preprocess_main(["synthetic", "data", "--dt", "4.0", "--wt", "0.4",
                             "--p", "1"])
        finally:
            builders.BUILDERS["synthetic"] = orig

        config = {
            "model": {"n_atoms": 12, "embedding_dim": 8, "n_attention": 1,
                      "local_dim": 16, "num_head": 2, "global_dim": 16,
                      "dense_out": 8, "g_update": True, "gaussian_d": 4.0},
            "hyper": {"batch_size": 16, "train_size": 32, "test_size": 8,
                      "lr": 1e-3, "min_lr": 1e-4, "scheduler": "cosine",
                      "scaler": True, "epochs": 2, "patience": 10,
                      "data_energy_path": "data/synthetic/synthetic_data_energy.npy",
                      "data_nei_path": "data/synthetic/synthetic_data_neighbor_dt4.0_wt0.4.npy",
                      "save_path": "trained/model"},
        }
        with open("config.yaml", "w") as f:
            yaml.safe_dump(config, f)
        yield str(root)
    finally:
        os.chdir(cwd)


def test_preprocess_created_files(workdir):
    assert os.path.exists("data/synthetic/synthetic_data_energy.npy")
    assert os.path.exists("data/synthetic/synthetic_data_neighbor_dt4.0_wt0.4.npy")


def test_train_cli(workdir):
    train_main(["homo", "config.yaml", "--epochs", "2"])
    assert os.path.exists("trained/model_homo/report.txt")
    assert os.path.exists("trained/model_homo/config.yaml")
    assert os.path.exists("trained/model_homo/checkpoints/best")
    # re-serialized config carries learned standardization (reference
    # scann_model.py:113-116,223-230)
    saved = yaml.safe_load(open("trained/model_homo/config.yaml"))
    assert float(saved["hyper"]["target_std"]) != 1.0


def test_train_cli_structure_packing(workdir, capsys):
    train_main(["lumo", "config.yaml", "--epochs", "2", "--structure-packing"])
    out = capsys.readouterr().out
    assert "Packed train split:" in out  # the API actually packed the split
    assert os.path.exists("trained/model_lumo/report.txt")


def test_train_cli_eval_mode(workdir):
    # --mode eval on the trained run dir: evaluate without training
    train_main(["homo", "trained/model_homo/config.yaml", "--mode", "eval"])


def test_train_cli_profile(workdir):
    # --profile wraps training in jax.profiler and must leave a
    # TensorBoard-loadable xplane trace behind (SURVEY §5.1)
    import glob

    train_main(["homo", "config.yaml", "--epochs", "1", "--profile", "prof"])
    captured = glob.glob(
        os.path.join("prof", "plugins", "profile", "*", "*.xplane.pb"))
    assert captured and os.path.getsize(captured[0]) > 0


def test_predict_files_cli(workdir, tmp_path):
    # all reference load_file input formats: xyz, CIF, molfile
    # (general.py:178-203, VERDICT round-1 gap #3)
    xyz = tmp_path / "mol.xyz"
    xyz.write_text("3\nwater\nO 0 0 0\nH 0.96 0 0\nH -0.24 0.93 0\n")
    cif = tmp_path / "rocksalt.cif"
    cif.write_text(
        "data_x\n_cell_length_a 4.2\n_cell_length_b 4.2\n_cell_length_c 4.2\n"
        "_cell_angle_alpha 90\n_cell_angle_beta 90\n_cell_angle_gamma 90\n"
        "loop_\n _atom_site_type_symbol\n _atom_site_fract_x\n"
        " _atom_site_fract_y\n _atom_site_fract_z\n"
        " C 0.0 0.0 0.0\n O 0.5 0.5 0.5\n")
    mol = tmp_path / "water2.mol"
    mol.write_text("water\n  t\n\n  3  2  0  0  0  0  0  0  0  0999 V2000\n"
                   "    0.0000    0.0000    0.0000 O   0  0\n"
                   "    0.9600    0.0000    0.0000 H   0  0\n"
                   "   -0.2400    0.9300    0.0000 H   0  0\n"
                   "  1  2  1  0\n  1  3  1  0\nM  END\n")
    predict_files_main(["trained/model_homo", "preds",
                        str(xyz), str(cif), str(mol), "--mol"])
    out = "preds/mol_ga.xyz"
    assert os.path.exists(out)
    lines = open(out).read().splitlines()
    assert int(lines[0]) == 3
    assert len(lines[2].split()) == 5  # species, xyz, GA column
    results = json.load(open("preds/predictions.json"))
    assert "mol" in results and len(results["mol"]["ga_scores"]) == 3
    assert len(results["rocksalt"]["ga_scores"]) == 2
    assert len(results["water2"]["ga_scores"]) == 3


def test_predict_files_cli_same_basename_not_overwritten(workdir, tmp_path):
    """Two inputs named mol.xyz in different directories must both appear
    in the outputs instead of the second silently overwriting the first."""
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    (a / "mol.xyz").write_text(
        "3\nwater\nO 0 0 0\nH 0.96 0 0\nH -0.24 0.93 0\n")
    (b / "mol.xyz").write_text("2\nco\nC 0 0 0\nO 1.13 0 0\n")
    predict_files_main(["trained/model_homo", "preds_dup",
                        str(a / "mol.xyz"), str(b / "mol.xyz"), "--mol"])
    results = json.load(open("preds_dup/predictions.json"))
    assert len(results["mol"]["ga_scores"]) == 3
    assert len(results["mol_2"]["ga_scores"]) == 2
    assert os.path.exists("preds_dup/mol_ga.xyz")
    assert os.path.exists("preds_dup/mol_2_ga.xyz")


def test_export_cli(workdir, tmp_path):
    """scann-export writes a reference-layout H5 from a run directory that
    load_h5_params reads back identically."""
    from scann_tpu.cli.export import main as export_main
    from scann_tpu.compat import load_h5_params
    from scann_tpu.config import load_config

    if not os.path.exists("trained/model_homo"):  # standalone-run safety
        train_main(["homo", "config.yaml", "--epochs", "2"])
    out = str(tmp_path / "exported.h5")
    export_main(["trained/model_homo", out])
    cfg = load_config("trained/model_homo/config.yaml")
    params = load_h5_params(out, cfg.model)
    params = params.get("params", params)
    assert "after_Lc" in params and "global_attention" in params


def test_predict_model_cli(workdir):
    """Full-dataset inference pickles (reference predict_model.py:50-92)."""
    if not os.path.exists("trained/model_homo"):  # standalone-run safety
        train_main(["homo", "config.yaml", "--epochs", "2"])
    predict_model_main(["trained/model_homo", "--out", "full_preds"])
    with open("full_preds/energy_pre_homo.pickle", "rb") as f:
        data = pickle.load(f)
    assert data["prediction"].shape == (48,)
    with open("full_preds/ga_scores_homo.pickle", "rb") as f:
        gas = pickle.load(f)
    assert len(gas) == 48
    assert all(np.all(np.isfinite(g)) for g in gas)


def test_predict_model_cli_packed(workdir):
    """predict_model over a model trained WITH structure packing: the saved
    config carries tpu.structure_packing, so the full-dataset prepare packs
    and the CLI must handle 2-D [slots, SEG] targets/indices."""
    if not os.path.exists("trained/model_lumo"):  # standalone-run safety
        train_main(["lumo", "config.yaml", "--epochs", "2",
                    "--structure-packing"])
    predict_model_main(["trained/model_lumo", "--out", "full_preds_packed"])
    with open("full_preds_packed/energy_pre_lumo.pickle", "rb") as f:
        data = pickle.load(f)
    assert data["prediction"].shape == (48,)
    assert data["target"].shape == (48,)
    assert np.isfinite(data["prediction"]).all()
    with open("full_preds_packed/ga_scores_lumo.pickle", "rb") as f:
        gas = pickle.load(f)
    assert len(gas) == 48


def test_serve_cli_canonical_frame_flags():
    """scann-serve defaults canonical_frame ON (round-4 study) with
    --no-canonical-frame as the reference-bit-compatible escape hatch;
    --canonical-frame stays accepted for older deploy scripts."""
    import argparse

    from scann_tpu.cli import serve as serve_cli

    captured = {}

    class Stop(Exception):
        pass

    class FakeBP:
        @staticmethod
        def from_model_dir(*a, **kw):
            captured.update(kw)
            raise Stop

    import scann_tpu.serve as serve_mod
    orig = serve_mod.BatchedPredictor
    serve_mod.BatchedPredictor = FakeBP
    try:
        for argv, expect in [
            (["run_dir"], True),
            (["run_dir", "--canonical-frame"], True),
            (["run_dir", "--no-canonical-frame"], False),
        ]:
            captured.clear()
            try:
                serve_cli.main(argv)
            except Stop:
                pass
            assert captured["canonical_frame"] is expect, (argv, captured)
    finally:
        serve_mod.BatchedPredictor = orig
