"""Identical-weights TF-vs-JAX step parity (round-2 VERDICT #1).

Loads the reference TF/Keras implementation (from /root/reference, with
featurization-only deps stubbed), installs ONE set of initial parameters in
both frameworks through the repo's H5 converter, and asserts forward / loss /
gradient / multi-step-Adam parity. This pins the full training recipe — RMSE
+ l2(1e-4) penalties, Adam(eps=1e-7) with decay=1e-5 inverse-time lr
(reference scann_model.py:210-214) — to <= 1e-5, converting "same training
recipe" from a hypothesis into a test.
"""

import os
import sys

import pytest

pytestmark = pytest.mark.slow  # builds TF graphs, runs optimizer steps

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

# must precede the first tensorflow import anywhere in this process: the
# reference graph needs legacy (tf_keras) semantics, and oneDNN autotuning
# breaks 1e-5 determinism
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

tf = pytest.importorskip("tensorflow")


SMALL_CFG = dict(n_atoms=12, embedding_dim=8, n_attention=2, local_dim=16,
                 num_head=4, global_dim=16, dense_out=8, scale=0.5,
                 use_attn_norm=True, use_ga_norm=True, use_ring=False,
                 g_update=True, gaussian_d=4.0, feature="atomic",
                 use_drop=False)


def test_identical_weights_step_parity():
    from compare_step_parity import run_parity

    result = run_parity(model_cfg=SMALL_CFG, n_structures=64, k_steps=8,
                        atol=1e-5, verbose=False)
    # run_parity asserts internally; spot-check the headline numbers too
    assert result["forward_max_abs_diff"] <= 1e-5
    assert abs(result["loss_tf"] - result["loss_jax"]) <= 1e-5
    assert result["grad_worst_abs_diff"] <= 1e-4  # abs worst; rel is 1e-5
    assert result["step_loss_max_diff"] <= 5e-4


def test_scann_variant_step_parity():
    """The SCANN (non-g_update) geometry path gets the same guarantee."""
    from compare_step_parity import run_parity

    cfg = dict(SMALL_CFG, g_update=False)
    result = run_parity(model_cfg=cfg, n_structures=64, k_steps=4,
                        atol=1e-5, verbose=False)
    assert result["step_loss_max_diff"] <= 5e-4


def test_ring_variant_step_parity():
    """use_ring (the ptgp/fullerene workflow: extra_embed Dense(10) on
    [ring, aromatic] flags, reference scann_model.py:367-371) gets the same
    identical-weights forward/gradient/Adam-step guarantee."""
    from compare_step_parity import run_parity

    cfg = dict(SMALL_CFG, use_ring=True)
    result = run_parity(model_cfg=cfg, n_structures=64, k_steps=4,
                        atol=1e-5, verbose=False)
    assert result["step_loss_max_diff"] <= 5e-4


def test_cgcnn_variant_step_parity():
    """feature='cgcnn' (92-dim descriptor embedding via a Dense 'embed_atom',
    reference scann_model.py:363-365) gets the same guarantee."""
    from compare_step_parity import run_parity

    cfg = dict(SMALL_CFG, feature="cgcnn")
    result = run_parity(model_cfg=cfg, n_structures=64, k_steps=4,
                        atol=1e-5, verbose=False)
    assert result["step_loss_max_diff"] <= 5e-4
