"""Measured on-device step breakdown for the fused training path.

Wall-clock half of the measured profiling story (SURVEY.md §5.1): time
each component of the QM9 (or MP2018) training step separately on the real
chip and report achieved TFLOP/s + MFU per component beside the analytic
FLOP model (``utils/flops.py``). The other half is
``tools/capture_trace.py`` — a real ``jax.profiler`` device trace of the
same step body (it hung over the axon tunnel rounds 2-3 but works as of
late round 3; its device-busy numbers cross-check these wall-clock ones).
Components:

- ``forward_eval``   — the fused forward kernel alone (eval path),
- ``train_kernel``   — the one-shot forward+RMSE-residual+backward kernel,
- ``full_step``      — train kernel + l2 grads + Adam, inside a lax.scan
                       (exactly the Trainer's whole-epoch step body),
- ``optimizer_glue`` — full_step minus train_kernel (how much the XLA tail
                       around the kernel costs; measured ~free at QM9 shape).

Usage: python tools/step_breakdown.py [qm9|mp2018]  ->  one JSON line.
Timings are best-of-5 with value-fetch syncs (the axon tunnel's
block_until_ready returns early; DESIGN.md "Benchmarking pitfalls").
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TFLOPS = 197.0  # v5e bf16 (the chip runs f32 matmuls single-pass bf16)


def _timeit(fn, *args, iters=20, reps=5):
    import jax

    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def build_case(case: str = "qm9"):
    """Construct the measured training-step pieces for one benchmark case.

    Returns a dict with the jitted callables (``fwd``, ``kern``, ``epoch``),
    their arguments (``params``/``state``/``inputs``/``y``), the shape tuple
    and the analytic per-step FLOP counts — shared by the wall-clock
    breakdown below and by ``tools/capture_trace.py`` (the on-device
    profiler), so both measure exactly the Trainer's step body.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship_config, _synthetic_inputs
    from scann_tpu.config import HyperConfig, ModelConfig, ScannConfig
    from scann_tpu.models import ScannModel
    from scann_tpu.models.scann import l2_penalty
    from scann_tpu.utils.flops import (
        forward_flops_per_structure,
        train_flops_per_structure,
    )

    if case == "qm9":
        cfg = _flagship_config(batch_size=128)
        B, M, N = 128, 32, 16
    else:  # mp2018 crystal shape (configs/model_mp2018.yaml)
        cfg = ScannConfig(
            model=ModelConfig(n_atoms=95, embedding_dim=48, n_attention=9,
                              local_dim=128, num_head=8, global_dim=128,
                              dense_out=128, g_update=True, use_ga_norm=True,
                              gaussian_d=6.0),
            hyper=HyperConfig(batch_size=64, lr=1e-4, min_lr=5e-5,
                              target="e_f"))
        B, M, N = 64, 96, 32
    cfm = cfg.model

    inputs = {k: jnp.asarray(v) for k, v in
              _synthetic_inputs(B=B, M=M, N=N, n_atoms=cfm.n_atoms,
                                seed=0).items()}
    y = jnp.asarray(np.random.default_rng(1).normal(size=B).astype(np.float32))
    params = ScannModel(config=cfm).init(
        jax.random.PRNGKey(0), inputs, deterministic=True)["params"]
    tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-7)

    fwd_f = forward_flops_per_structure(cfm, M, N) * B
    trn_f = train_flops_per_structure(cfm, M, N) * B

    if case == "qm9":
        from scann_tpu.kernels.scann_backward import fused_scann_train_grads
        from scann_tpu.kernels.scann_forward import fused_scann_forward

        fwd = jax.jit(lambda p, i: fused_scann_forward(p, i, cfm))
        kern = lambda p, i, t: fused_scann_train_grads(
            p, i, t, cfm, False, False, 0.1, jnp.int32(7))
    else:
        from scann_tpu.kernels.scann_loop import (
            loop_scann_forward,
            loop_scann_train_grads,
        )

        fwd = jax.jit(lambda p, i: loop_scann_forward(p, i, cfm))
        kern = lambda p, i, t: loop_scann_train_grads(
            p, i, t, cfm, False, False, 0.1, jnp.int32(7))
    kern_j = jax.jit(kern)

    def full_step(state, i, t):
        params, opt_state, step = state
        pred, raw = kern(params, i, t)
        rmse = jnp.sqrt(jnp.mean(jnp.square(pred[:, 0] - t)))
        scale = 1.0 / (t.shape[0] * rmse)
        l2g = jax.grad(lambda p: l2_penalty(p, 1e-4))(params)
        grads = jax.tree.map(lambda r, g2: r * scale + g2, raw, l2g)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(
            params, jax.tree.map(lambda u: -1e-4 * u, updates))
        return (params, opt_state, step + 1), rmse

    def epoch(state, i, t):
        return jax.lax.scan(lambda s, _: full_step(s, i, t), state,
                            jnp.arange(32))

    ep = jax.jit(epoch, donate_argnums=(0,))
    state = (params, tx.init(params), jnp.zeros((), jnp.int32))
    return {
        "case": case, "cfg": cfg, "B": B, "M": M, "N": N,
        "fwd": fwd, "kern": kern_j, "epoch": ep, "scan_steps": 32,
        "params": params, "state": state, "inputs": inputs, "y": y,
        "forward_flops_per_step": fwd_f, "train_flops_per_step": trn_f,
    }


def main(case: str = "qm9"):
    import jax

    c = build_case(case)
    B, M, N = c["B"], c["M"], c["N"]
    fwd, kern_j, ep = c["fwd"], c["kern"], c["epoch"]
    params, state, inputs, y = c["params"], c["state"], c["inputs"], c["y"]
    fwd_f, trn_f = c["forward_flops_per_step"], c["train_flops_per_step"]

    t_fwd = _timeit(fwd, {"params": params}, inputs)
    t_kern = _timeit(kern_j, params, inputs, y)
    state, rs = ep(state, inputs, y)  # compile + warm
    float(rs[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, rs = ep(state, inputs, y)
        float(rs[0])
        best = min(best, (time.perf_counter() - t0) / 32)
    t_step = best

    out = {
        "case": case, "B": B, "M": M, "N": N,
        "forward_eval_ms": round(t_fwd * 1e3, 3),
        "forward_tflops": round(fwd_f / t_fwd / 1e12, 2),
        "train_kernel_ms": round(t_kern * 1e3, 3),
        "train_kernel_tflops": round(trn_f / t_kern / 1e12, 2),
        "full_step_ms": round(t_step * 1e3, 3),
        "full_step_tflops": round(trn_f / t_step / 1e12, 2),
        "optimizer_glue_ms": round((t_step - t_kern) * 1e3, 3),
        "mfu_full_step": round(trn_f / t_step / 1e12 / PEAK_TFLOPS, 4),
        "structures_per_sec": round(B / t_step, 1),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "qm9")
