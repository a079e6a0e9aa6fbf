"""The example scripts (reference notebooks C19) must stay runnable offline.

One tiny training run feeds all three: interpretability (per-structure GA
xyz), ga_analysis (dataset-level attention stats CSV), pretrained_h5
(published-checkpoint-style H5 inference).
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # trains a tiny model once

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

XYZ = "3\nwater\nO 0.0 0.0 0.0\nH 0.96 0.0 0.0\nH -0.24 0.93 0.0\n"


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    """A real trained run dir (config.yaml + checkpoints/best) on synthetic
    data, like examples/interpretability.py's --demo path but test-sized."""
    from scann_tpu.api import Scann
    from scann_tpu.config import HyperConfig, ModelConfig, ScannConfig
    from scann_tpu.data.synthetic import make_synthetic_dataset

    root = tmp_path_factory.mktemp("examples")
    e, n = make_synthetic_dataset(str(root / "data"), n_structures=48,
                                  min_atoms=4, max_atoms=12, seed=0)
    cfg = ScannConfig(
        model=ModelConfig(n_atoms=12, embedding_dim=8, n_attention=1,
                          local_dim=16, num_head=2, global_dim=16,
                          dense_out=8, g_update=True),
        hyper=HyperConfig(batch_size=16, lr=1e-3, min_lr=1e-4, epochs=2,
                          patience=10, target="homo", train_size=32,
                          test_size=8, data_energy_path=e, data_nei_path=n,
                          save_path=str(root / "model")),
    )
    scann = Scann(cfg)
    scann.prepare_dataset()
    scann.train()
    return scann.trainer.workdir, scann


def test_interpretability_example(run_dir, tmp_path):
    import interpretability

    workdir, _ = run_dir
    xyz = tmp_path / "water.xyz"
    xyz.write_text(XYZ)
    out = tmp_path / "ga_out"
    interpretability.main(["--model-dir", workdir, "--out", str(out),
                           str(xyz)])
    ga_xyz = out / "water_ga.xyz"
    assert ga_xyz.exists()
    lines = ga_xyz.read_text().strip().splitlines()
    assert lines[0].strip() == "3" and len(lines) == 5
    # 5th column = GA score, one per atom, sums to ~1 (softmax over atoms)
    scores = [float(l.split()[4]) for l in lines[2:]]
    assert abs(sum(scores) - 1.0) < 1e-3


def test_ga_analysis_example(run_dir, tmp_path):
    import ga_analysis

    workdir, _ = run_dir
    out = tmp_path / "ga.csv"
    ga_analysis.main([workdir, "--out", str(out)])
    rows = out.read_text().strip().splitlines()
    assert rows[0].startswith("structure,prediction,target,ga_ratio_")
    assert len(rows) == 1 + 48  # header + every structure in the dataset


def test_pretrained_h5_example(run_dir, tmp_path, capsys):
    import pretrained_h5

    from scann_tpu.compat import save_h5_weights

    workdir, scann = run_dir
    h5 = tmp_path / "weights.h5"
    save_h5_weights(scann.trainer.state.params, scann.config.model, str(h5))
    xyz = tmp_path / "water.xyz"
    xyz.write_text(XYZ)
    pretrained_h5.main([os.path.join(workdir, "config.yaml"), str(h5),
                        str(xyz)])
    got = capsys.readouterr().out
    assert "homo =" in got and "top GA:" in got
    val = float(got.split("homo =")[1].split()[0])
    assert np.isfinite(val)


def test_packed_training_example_run_once(tmp_path):
    """examples/packed_training.py run_once on a tiny packed config: the
    demo's measurement dict carries occupancy/throughput/predictions and
    the packed split really packs (occupancy above the bucketed ~0.7)."""
    import packed_training

    from scann_tpu.data.synthetic import make_synthetic_dataset

    e, n = make_synthetic_dataset(str(tmp_path / "data"), n_structures=48,
                                  min_atoms=4, max_atoms=16, seed=0)
    tiny = {"n_atoms": 16, "embedding_dim": 8, "n_attention": 1,
            "local_dim": 16, "num_head": 2, "global_dim": 16,
            "dense_out": 8, "g_update": True}
    res = packed_training.run_once(str(tmp_path / "run"), e, n, epochs=2,
                                   packing=True, model=tiny)
    assert res["occupancy"] > 0.85
    assert res["structs_per_sec"] > 0
    assert np.isfinite(res["val_mae"])
    assert res["preds"].shape == (48,)
