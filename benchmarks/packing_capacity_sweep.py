"""Slot-capacity sweep for packed QM9 training (round-4 VERDICT #4).

Round 4 measured capacity 40 at 99.6% occupancy but 7% SLOWER end-to-end
than capacity 32 (92.4%), and attributed it to (a) the one-hot gather
growing O(M^2 N) and (b) the keep-acts backward tile dropping 4 -> 2
(VMEM). This sweep separates those explanations and tests the two levers
that could flip the result:

- forced backward tile 3 at capacity 40 (the pick ladder only tried
  powers of two; bt=3 fits the keep-acts working set where bt=4 does not)
  via SCANN_TPU_FORCE_TILE_BWD,
- the bf16 keep-acts stash (SCANN_TPU_STASH_BF16=1, scann_backward.py):
  halves the stash VMEM so larger tiles fit at higher capacities; grads
  drift only within bf16 tolerance (tests/test_kernels.py).

One case per invocation (env knobs are baked into traced kernels and the
in-process tile cache — cross-case pollution would invalidate the A/B):

    python benchmarks/packing_capacity_sweep.py CASE
    CASE in: cap32  cap32_bf16  cap40  cap40_bt3  cap40_bf16  cap48_bf16

Appends one JSON line per case to benchmarks/packing_capacity_sweep.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = {
    #           capacity, bf16_stash, force_bwd_tile
    "cap32":      (32, False, None),
    "cap32_bf16": (32, True, None),
    "cap40":      (40, False, None),
    "cap40_bt3":  (40, False, 3),
    "cap40_bf16": (40, True, None),
    "cap48_bf16": (48, True, None),
    "cap40_bf16_bt3": (40, True, 3),
    "cap48_bt3":  (48, False, 3),
    # production resolution path (no force): the (4,3,2,1) ladder + probe
    # must land on bt=3 by itself at capacity 48
    "cap48":      (48, False, None),
}

N_STRUCTS = 24576


def main():
    case = sys.argv[1]
    capacity, bf16_stash, force_bt = CASES[case]
    if bf16_stash:
        os.environ["SCANN_TPU_STASH_BF16"] = "1"
    if force_bt:
        os.environ["SCANN_TPU_FORCE_TILE_BWD"] = str(force_bt)

    import jax

    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "")

    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config, _synthetic_packed_slots
    from scann_tpu.data.packing import packed_slot_batch
    from scann_tpu.kernels.scann_forward import resolve_tile
    from scann_tpu.train import Trainer
    from scann_tpu.train.schedules import make_cosine_lr

    pslots = _synthetic_packed_slots(n_structs=N_STRUCTS, capacity=capacity,
                                     N=16, max_segments=8, seed=0)
    slot_bs = packed_slot_batch(128, pslots.num_slots, pslots.num_structures)
    if force_bt:
        # the forced tile must divide the batch; keep ~the same effective
        # structures/step as the production rounding
        slot_bs = max(12, (slot_bs // 12) * 12)

    cfg = _flagship_config(batch_size=slot_bs)
    cfg.hyper.save_path = f"/tmp/scann_capsweep_{case}"
    cfg.hyper.scheduler = "cosine"

    trainer = Trainer(cfg)
    trainer._lr_fn = make_cosine_lr(cfg.hyper.lr, cfg.hyper.min_lr,
                                    pslots.num_slots // slot_bs, 100)
    trainer._make_steps()
    trainer.init_state({k: v[:1] for k, v in pslots.inputs.items()}, seed=0)
    (binputs, btargets), = trainer._put_buckets([pslots], "bench")

    bwd_tile = resolve_tile(cfg.model, slot_bs, capacity, 16, "bwd", 0.1)
    fwd_tile = resolve_tile(cfg.model, slot_bs, capacity, 16, "fwd", 0.1)

    rng = jax.random.PRNGKey(0)
    state = trainer.state
    t0 = time.perf_counter()
    state, m = trainer._train_epoch(state, binputs, btargets, rng,
                                    jnp.float32(0.0))
    loss0 = float(m["loss"])
    compile_s = time.perf_counter() - t0

    best = 0.0
    for e in range(3):
        t0 = time.perf_counter()
        state, m = trainer._train_epoch(state, binputs, btargets,
                                        jax.random.fold_in(rng, e),
                                        jnp.float32(0.0))
        float(m["loss"])
        best = max(best, pslots.num_structures / (time.perf_counter() - t0))

    out = {
        "case": case,
        "capacity": capacity,
        "bf16_stash": bf16_stash,
        "forced_bwd_tile": force_bt,
        "resolved_tiles": {"fwd": fwd_tile, "bwd": bwd_tile},
        "slots": pslots.num_slots,
        "structures": pslots.num_structures,
        "occupancy": round(pslots.occupancy, 4),
        "slot_batch": slot_bs,
        "structs_per_sec": round(best, 1),
        "slot_rate": round(best * pslots.num_slots / pslots.num_structures, 1),
        "first_epoch_loss": round(loss0, 5),
        "compile_plus_first_epoch_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "packing_capacity_sweep.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
