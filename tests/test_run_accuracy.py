"""tools/run_accuracy.py — the one-command accuracy-validation harness.

The real QM9/MP2018 downloads need egress (absent here), so these tests pin
(a) the skip-guard behavior on download failure and (b) the full
preprocess->train->evaluate->verdict chain on a synthetic dataset staged at
the expected artifact paths (the exact layout a real `process_qm9` run
leaves behind)."""

import json
import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import run_accuracy  # noqa: E402


def test_skip_guard_on_download_failure(tmp_path, capsys, monkeypatch):
    """No dataset + no egress -> exit 3 with a SKIPPED JSON line."""
    from scann_tpu.data import builders

    def fail(save_path):
        raise RuntimeError("download of QM9 failed (no egress)")

    monkeypatch.setitem(builders.BUILDERS, "qm9", fail)
    rc = run_accuracy.main(["qm9", "--data-root", str(tmp_path / "pd")])
    assert rc == 3
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "SKIPPED"
    assert "egress" in out["reason"]


@pytest.mark.slow
def test_full_chain_on_staged_dataset(tmp_path, capsys):
    """Stage a synthetic dataset at the qm9 artifact paths and run the whole
    train->evaluate->verdict chain (1 epoch, tiny splits). The verdict
    compares against the real published MAE, which a 1-epoch toy run will
    not meet — the exit code must reflect that honestly."""
    from scann_tpu.data.synthetic import make_synthetic_dataset

    root = tmp_path / "processed_data"
    make_synthetic_dataset(str(root / "qm9"), name="qm9", n_structures=160,
                           min_atoms=5, max_atoms=12, seed=3)
    rc = run_accuracy.main([
        "qm9", "--data-root", str(root),
        "--save-path", str(tmp_path / "run"),
        "--epochs", "1", "--train-size", "112", "--test-size", "24"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "OK"
    assert out["dataset"] == "qm9" and out["target"] == "homo"
    assert out["variant"] == "scann_plus"  # flagship config is g_update
    assert out["published_mae_scann_plus"] == 0.032
    assert isinstance(out["test_mae"], float)
    assert rc == (0 if out["meets_published"] else 1)
    # the run dir is reusable (config + checkpoints written)
    assert os.path.exists(os.path.join(out["run_dir"], "config.yaml"))
