"""On-hardware verification of the fused kernels' dropout semantics.

The CPU test suite runs the Pallas kernels under the TPU *interpreter*,
whose PRNG differs from real hardware; this script re-runs the
dropout-critical checks on an actual TPU:

  1. dropout is active (output differs from the deterministic forward),
  2. masks are batch-tiling invariant (BT=1 == BT=4, same seed) — the
     property that lets the forward and backward kernels tile independently,
  3. different seeds give different masks,
  4. backward gradients are tiling-invariant,
  5. the hand-written backward matches a central finite difference through
     the fused forward (same seed -> deterministic loss), which would catch
     any forward/backward mask replay mismatch.

Usage: python tools/tpu_checks.py   (needs a TPU backend)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def make_synthetic_batch(rng, B, M, N):
    n_atoms_per = rng.integers(3, M + 1, size=B)
    inputs = {
        "atomic": np.zeros((B, M), np.int32),
        "atom_mask": np.zeros((B, M, 1), np.float32),
        "neighbors": np.zeros((B, M, N), np.int32),
        "neighbor_mask": np.zeros((B, M, N), np.float32),
        "neighbor_weight": np.zeros((B, M, N), np.float32),
        "neighbor_distance": np.zeros((B, M, N), np.float32),
    }
    for b in range(B):
        na = n_atoms_per[b]
        inputs["atomic"][b, :na] = rng.integers(1, 10, size=na)
        inputs["atom_mask"][b, :na, 0] = 1.0
        for m in range(na):
            nn = rng.integers(1, min(N, na) + 1)
            inputs["neighbors"][b, m, :nn] = rng.integers(0, na, size=nn)
            inputs["neighbor_mask"][b, m, :nn] = 1.0
            inputs["neighbor_weight"][b, m, :nn] = rng.uniform(0.3, 3.0, size=nn)
            inputs["neighbor_distance"][b, m, :nn] = rng.uniform(0.8, 4.0, size=nn)
    return inputs


def fd_directional(loss_fn, params, grads, rng, eps=1e-2):
    """Central finite difference along one random unit direction vs the
    analytic directional derivative from ``grads``. Returns (fd, analytic).
    Callers wrap in jax.default_matmul_precision('highest')."""
    flat_p, tree = jax.tree_util.tree_flatten(params)
    dirs = [np.asarray(rng.normal(size=np.shape(x)), np.float32)
            for x in flat_p]
    gn = np.sqrt(sum(float(np.sum(dd * dd)) for dd in dirs))
    dirs = [dd / gn for dd in dirs]
    plus = jax.tree_util.tree_unflatten(
        tree, [x + eps * dd for x, dd in zip(flat_p, dirs)])
    minus = jax.tree_util.tree_unflatten(
        tree, [x - eps * dd for x, dd in zip(flat_p, dirs)])
    fd = (float(loss_fn(plus)) - float(loss_fn(minus))) / (2 * eps)
    an = float(sum(np.sum(np.asarray(gg) * dd)
                   for gg, dd in zip(jax.tree.leaves(grads), dirs)))
    return fd, an


def main():
    from scann_tpu.config import ModelConfig
    from scann_tpu.kernels.scann_backward import fused_scann_grad, scann_apply
    from scann_tpu.kernels.scann_forward import fused_scann_forward
    from scann_tpu.models import ScannModel

    assert jax.default_backend() != "cpu", "needs a real TPU backend"
    rng = np.random.default_rng(0)
    cfg = ModelConfig(n_atoms=10, embedding_dim=16, n_attention=2,
                      local_dim=32, num_head=4, global_dim=32, dense_out=16,
                      g_update=True, use_drop=True)
    inputs = make_synthetic_batch(rng, B=8, M=12, N=6)
    model = ScannModel(config=cfg)
    params = model.init(jax.random.PRNGKey(0), inputs, deterministic=True)
    ok = True

    det, _ = fused_scann_forward(params, inputs, cfg)
    p1, _ = fused_scann_forward(params, inputs, cfg, dropout_rate=0.1,
                                dropout_seed=123, batch_tile=1)
    p2, _ = fused_scann_forward(params, inputs, cfg, dropout_rate=0.1,
                                dropout_seed=123, batch_tile=4)
    p3, _ = fused_scann_forward(params, inputs, cfg, dropout_rate=0.1,
                                dropout_seed=777, batch_tile=4)
    d = lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
    checks = [
        ("dropout active", d(p1, det) > 1e-3),
        ("tiling invariant", d(p1, p2) < 1e-5),
        ("seed sensitive", d(p2, p3) > 1e-3),
    ]

    ct_p = np.ones((8, 1), np.float32)
    ct_g = np.zeros((8, 12, 1), np.float32)
    g1 = fused_scann_grad(params, inputs, cfg, ct_p, ct_g, dropout_rate=0.1,
                          dropout_seed=123, batch_tile=1)
    g2 = fused_scann_grad(params, inputs, cfg, ct_p, ct_g, dropout_rate=0.1,
                          dropout_seed=123, batch_tile=4)
    gerr = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
               for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)))
    checks.append(("grad tiling invariant", gerr < 1e-4))

    y = jnp.asarray(np.linspace(-1, 1, 8, dtype=np.float32))

    def loss(p):
        pred, ga = scann_apply(p, inputs, cfg, False, False, 0.1, 42)
        return (jnp.sqrt(jnp.mean((pred[:, 0] - y) ** 2))
                + 0.05 * jnp.sum(ga ** 2))

    with jax.default_matmul_precision("highest"):
        g = jax.grad(loss)(params)
        fd, an = fd_directional(loss, params, g, rng)
    checks.append(("fwd/bwd mask consistency (FD)",
                   abs(fd - an) / max(abs(fd), 1e-9) < 2e-2))

    # --- LOOP kernels (crystal path), use_drop: the attention masks are
    # replayed by per-(molecule, layer) PRNG reseeding, a mechanism the
    # interpreter cannot exercise faithfully (its PRNG is seed-insensitive);
    # verify on hardware that the standalone dropout forward and the
    # one-shot train kernel draw identical masks, and that seeds are live.
    from scann_tpu.kernels.scann_loop import (
        loop_scann_forward,
        loop_scann_train_grads,
    )

    pred_t, raw = loop_scann_train_grads(params, inputs, y, cfg,
                                         dropout_rate=0.1, dropout_seed=42)
    pred_f, _ = loop_scann_forward(params, inputs, cfg, dropout_rate=0.1,
                                   dropout_seed=42)
    pred_f2, _ = loop_scann_forward(params, inputs, cfg, dropout_rate=0.1,
                                    dropout_seed=7)
    checks.append(("loop fwd/train mask replay (same seed)",
                   d(pred_t, pred_f) < 1e-5))
    checks.append(("loop seed sensitive", d(pred_f, pred_f2) > 1e-3))
    checks.append(("loop grads finite",
                   all(bool(np.all(np.isfinite(np.asarray(leaf))))
                       for leaf in jax.tree.leaves(raw))))

    # direct mask probe: the per-(molecule, layer) reseed must key on the
    # layer (distinct masks per layer) and be deterministic on replay —
    # neither property is observable through the interpreter (its PRNG is a
    # stub), so this is the authoritative check of the replay mechanism
    from jax.experimental import pallas as pl
    from scann_tpu.kernels.scann_loop import _make_attn_mask

    def mask_probe(seed_ref, o0, o1, o0b):
        f = _make_attn_mask(seed_ref[0, 0], 8, 8, 8, 0.1)
        o0[...] = f(0)
        o1[...] = f(1)
        o0b[...] = f(0)   # reseed back to layer 0: must replay exactly

    m0, m1, m0b = pl.pallas_call(
        mask_probe,
        out_shape=[jax.ShapeDtypeStruct((8, 8, 8), jnp.float32)] * 3,
    )(jnp.full((1, 1), 42, jnp.int32))
    checks.append(("loop per-layer masks distinct", d(m0, m1) > 0))
    checks.append(("loop mask replay deterministic", d(m0, m0b) == 0.0))

    # loop-family finite difference (same seed -> deterministic loss):
    # catches any fwd/bwd mask divergence the replay scheme could hide
    from scann_tpu.kernels.scann_loop import loop_scann_apply

    def loop_loss(p):
        pred, ga = loop_scann_apply(p, inputs, cfg, False, False, 0.1, 42)
        return (jnp.sqrt(jnp.mean((pred[:, 0] - y) ** 2))
                + 0.05 * jnp.sum(ga ** 2))

    with jax.default_matmul_precision("highest"):
        g = jax.grad(loop_loss)(params)
        fd, an = fd_directional(loop_loss, params, g, rng)
    checks.append(("loop fwd/bwd mask consistency (FD)",
                   abs(fd - an) / max(abs(fd), 1e-9) < 2e-2))

    # --- STRUCTURE PACKING on hardware: the segmented readout (both kernel
    # families) must match the XLA packed path at f32 tolerance, and packed
    # use_drop training through the loop one-shot must satisfy a finite
    # difference with the replayed masks (seeded PRNG only exists here).
    from __graft_entry__ import _synthetic_packed_slots

    pk = _synthetic_packed_slots(n_structs=20, capacity=16, N=8,
                                 max_segments=4, seed=3,
                                 min_atoms=4, max_atoms=14)
    pinp = {k: jnp.asarray(v) for k, v in pk.inputs.items()}
    pparams = model.init(jax.random.PRNGKey(2), pinp, deterministic=True)
    ref = model.apply(pparams, pinp, deterministic=True)
    pf, pg = fused_scann_forward(pparams, pinp, cfg)
    checks.append(("packed fused forward == XLA",
                   d(pf, ref["property"]) < 5e-3
                   and d(pg, ref["ga_score"]) < 5e-3))
    lf, lg = loop_scann_forward(pparams, pinp, cfg)
    checks.append(("packed loop forward == XLA",
                   d(lf, ref["property"]) < 5e-3
                   and d(lg, ref["ga_score"]) < 5e-3))

    py = jnp.asarray(pk.targets)
    psm = jnp.asarray(pk.inputs["segment_mask"])
    pn = psm.sum()

    def packed_loss(p):
        pred, raw = loop_scann_train_grads(p, pinp, py, cfg,
                                           dropout_rate=0.1, dropout_seed=42)
        err = (pred - py) * psm
        return jnp.sqrt(jnp.sum(jnp.square(err)) / pn), raw

    with jax.default_matmul_precision("highest"):
        rmse0, raw = packed_loss(pparams["params"])
        gp = jax.tree.map(lambda r: r / (pn * rmse0), raw)
        fd, an = fd_directional(lambda p: packed_loss(p)[0],
                                pparams["params"], gp, rng)
    checks.append(("packed loop use_drop FD",
                   abs(fd - an) / max(abs(fd), 1e-9) < 2e-2))

    for name, passed in checks:
        print(f"{'PASS' if passed else 'FAIL'}  {name}")
        ok = ok and passed
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
