"""Training-loop tests: loss decreases, checkpoints round-trip, schedules."""

import math

import numpy as np
import pytest

from scann_tpu.config import HyperConfig, ModelConfig, ScannConfig, TpuConfig
from scann_tpu.data.pipeline import load_dataset, pack_dataset, split_data, subset_buckets
from scann_tpu.data.synthetic import make_synthetic_dataset
from scann_tpu.train import SGDRSchedule, Trainer, make_cosine_lr


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_train")
    e, n = make_synthetic_dataset(str(out), n_structures=160, min_atoms=4,
                                  max_atoms=10, seed=2)
    records, neighbors = load_dataset(e, n, target="homo")
    ys = np.array([r["target"] for r in records], np.float32)
    mean, std = ys.mean(), ys.std()
    for r in records:
        r["target"] = (r["target"] - mean) / std
    buckets = pack_dataset(records, neighbors, g_update=True, max_buckets=1)
    tr, va, te = split_data(160, train_size=128, test_size=16, seed=0)
    return (subset_buckets(buckets, tr), subset_buckets(buckets, va),
            subset_buckets(buckets, te), float(mean), float(std))


def tiny_config(workdir, **hyper_kw):
    return ScannConfig(
        model=ModelConfig(n_attention=2, local_dim=32, num_head=4, global_dim=32,
                          dense_out=16, embedding_dim=16, g_update=True,
                          n_atoms=12),
        hyper=HyperConfig(batch_size=16, lr=1e-3, min_lr=1e-4, epochs=30,
                          patience=50, save_path=workdir, target="homo",
                          **hyper_kw),
        tpu=TpuConfig(use_pallas=False),
    )


@pytest.mark.slow
class TestTrainer:
    def test_loss_decreases_and_eval(self, packed, tmp_path):
        train_b, val_b, test_b, mean, std = packed
        cfg = tiny_config(str(tmp_path / "run"))
        cfg.hyper.target_mean, cfg.hyper.target_std = mean, std
        cfg.hyper.batch_size = 32
        tr = Trainer(cfg)
        hist = tr.fit(train_b, val_b, epochs=60, log_fn=lambda s: None)
        assert hist["loss"][-1] < hist["loss"][0] * 0.5, hist["loss"]
        assert min(hist["val_mae"]) < hist["val_mae"][0]

        res = tr.evaluate(test_b)
        assert math.isfinite(res["test_mae"])
        assert res["test_r2"] > 0.5  # synthetic target is learnable
        # artifacts written like the reference
        import os
        assert os.path.exists(tr.workdir + "/report.txt")
        assert os.path.exists(tr.workdir + "/config.yaml")
        assert os.path.exists(tr.workdir + "/metrics.jsonl")
        # fit records the data's padded (M, N) bucket shapes into the saved
        # config — serving pre-compiles these rungs by default
        from scann_tpu.config import load_config
        saved = load_config(tr.workdir + "/config.yaml")
        want = sorted({(int(b.inputs["neighbors"].shape[1]),
                        int(b.inputs["neighbors"].shape[2]))
                       for b in list(train_b) + list(val_b)})
        assert [tuple(s) for s in saved.tpu.observed_buckets] == want

    def test_checkpoint_roundtrip(self, packed, tmp_path):
        train_b, val_b, _, _, _ = packed
        cfg = tiny_config(str(tmp_path / "ck"))
        tr = Trainer(cfg)
        tr.fit(train_b, val_b, epochs=2)
        import jax
        params_before = jax.tree.map(np.asarray, tr.state.params)
        tr.fit(train_b, val_b, epochs=2)  # moves params further
        tr.restore_checkpoint("best")
        # restored params differ from the moved ones but not structurally
        restored = jax.tree.map(np.asarray, tr.state.params)
        assert jax.tree_util.tree_structure(params_before) == \
            jax.tree_util.tree_structure(restored)

    def test_predict_order_and_ga(self, packed, tmp_path):
        train_b, val_b, test_b, mean, std = packed
        cfg = tiny_config(str(tmp_path / "pred"))
        cfg.hyper.target_mean, cfg.hyper.target_std = mean, std
        tr = Trainer(cfg)
        tr.fit(train_b, val_b, epochs=1)
        # predict directly on SUBSET buckets — original dataset indices are
        # sparse and > n; predict must remap them to compact output
        # positions (it used to scatter by raw index and crash)
        n = sum(b.num_structures for b in train_b)
        preds, gas = tr.predict(train_b, with_ga=True)
        assert preds.shape == (n,)
        assert len(gas) == n
        k0 = int(train_b[0].inputs["atom_mask"][0].sum())
        sorted_orig = np.sort(np.concatenate([b.indices for b in train_b]))
        pos0 = int(np.searchsorted(sorted_orig, train_b[0].indices[0]))
        assert gas[pos0].shape == (k0,)
        assert np.all(np.isfinite(preds))
        # one jit object per Trainer: a second call must reuse it
        assert tr._predict_fwd is not None
        fwd1 = tr._predict_fwd
        tr.predict(train_b)
        assert tr._predict_fwd is fwd1

    def test_second_fit_retraces_changed_schedule(self, packed, tmp_path):
        """fit() bakes the lr schedule into the traced epoch fn; a second
        fit with a different schedule signature (epochs here -> different
        cosine decay) must rebuild the traced functions, not silently train
        on the first fit's trajectory."""
        train_b, val_b, _, _, _ = packed
        cfg = tiny_config(str(tmp_path / "refit"))
        tr = Trainer(cfg)
        tr.fit(train_b, val_b, epochs=2)
        first = tr._train_epoch
        tr.fit(train_b, val_b, epochs=2)   # same signature: reuse
        assert tr._train_epoch is first
        tr.fit(train_b, val_b, epochs=6)   # different decay length: rebuild
        assert tr._train_epoch is not first

    def test_put_buckets_evicts_replaced_tag(self, packed, tmp_path):
        """Swapping datasets must evict the old tag entries (HBM) and the
        cache must pin bucket objects so a recycled id() can never serve a
        different dataset's device arrays."""
        train_b, val_b, _, _, _ = packed
        cfg = tiny_config(str(tmp_path / "putb"))
        tr = Trainer(cfg)
        tr._put_buckets(train_b, "train")
        keys1 = {k for k in tr._device_buckets if k[0] == "train"}
        assert keys1 and all(
            tr._device_buckets[k][0] is b
            for k, b in zip(sorted(keys1, key=lambda k: k[1]),
                            sorted(train_b, key=id)))
        tr._put_buckets(val_b, "train")  # same tag, new buckets
        keys2 = {k for k in tr._device_buckets if k[0] == "train"}
        assert keys1.isdisjoint(keys2)
        assert len(keys2) == len(val_b)


class TestSchedules:
    def test_cosine_endpoints_and_decay(self):
        lr_fn = make_cosine_lr(1e-3, 1e-4, steps_per_epoch=10, epochs=10,
                               adam_decay=0.0)
        assert float(lr_fn(0)) == pytest.approx(1e-3)
        # decay_steps = 50; at and past it, lr == min_lr
        assert float(lr_fn(50)) == pytest.approx(1e-4, rel=1e-5)
        assert float(lr_fn(100)) == pytest.approx(1e-4, rel=1e-5)
        # inverse-time Adam decay compounds
        lr_fn2 = make_cosine_lr(1e-3, 1e-4, 10, 10, adam_decay=1e-2)
        assert float(lr_fn2(100)) == pytest.approx(1e-4 / 2.0, rel=1e-5)

    def test_sgdr_trigger_and_restart(self):
        s = SGDRSchedule(lr_max=1e-3, lr_min=1e-5, t0=4, tmult=2,
                         trigger_val_mae=0.5)
        # untriggered: flat lr_max
        assert s.epoch_begin() == 1e-3
        s.epoch_end(1.0)
        assert s.epoch_begin() == 1e-3
        s.epoch_end(0.4)  # triggers
        lrs = [s.epoch_begin() for _ in range(8)]
        # cosine down within cycle
        assert lrs[0] > lrs[1] > lrs[2]
        # at tcur == ti the lr hits lr_min
        assert min(lrs) == pytest.approx(1e-5, rel=1e-6)
        # a restart happened (lr jumps back up)
        jumped = any(lrs[i + 1] > lrs[i] * 5 for i in range(len(lrs) - 1))
        assert jumped

    def test_sgdr_state_roundtrip_matches_uninterrupted(self):
        """state_dict/load_state_dict mid-run reproduces the exact LR
        trajectory, including the val-driven peak-compression events the
        old epoch_begin replay dropped."""
        vals = [1.0, 0.4, 0.35, 0.5, 0.3, 0.45, 0.28, 0.6, 0.27, 0.55,
                0.26, 0.5, 0.25]

        def run(schedule, vals):
            lrs = []
            for v in vals:
                lrs.append(schedule.epoch_begin())
                schedule.epoch_end(v)
            return lrs

        a = SGDRSchedule(lr_max=1e-3, lr_min=1e-5, t0=3, tmult=2,
                         trigger_val_mae=0.5)
        full = run(a, vals)

        b = SGDRSchedule(lr_max=1e-3, lr_min=1e-5, t0=3, tmult=2,
                         trigger_val_mae=0.5)
        run(b, vals[:6])
        snap = b.state_dict()
        c = SGDRSchedule(lr_max=1e-3, lr_min=1e-5, t0=3, tmult=2,
                         trigger_val_mae=0.5)
        c.load_state_dict(snap)
        resumed = run(c, vals[6:])
        assert resumed == pytest.approx(full[6:], rel=1e-12)


@pytest.mark.slow
class TestResume:
    def test_resume_continues_from_last(self, packed, tmp_path):
        train_b, val_b, _, _, _ = packed
        cfg = tiny_config(str(tmp_path / "resume"))
        tr = Trainer(cfg)
        h1 = tr.fit(train_b, val_b, epochs=3, log_fn=lambda s: None)
        step_after_3 = int(tr.state.step)

        # fresh trainer, same workdir: resume and run 2 more epochs
        tr2 = Trainer(cfg)
        msgs = []
        h2 = tr2.fit(train_b, val_b, epochs=5, log_fn=msgs.append,
                     resume=True)
        assert any("resumed from epoch 3" in m for m in msgs), msgs
        # only epochs 3..4 were run
        assert len(h2["loss"]) == 2
        assert int(tr2.state.step) > step_after_3

    def test_sgdr_resume_matches_uninterrupted(self, packed, tmp_path):
        """An SGDR run interrupted + resumed produces the SAME lr trajectory
        (and loss trajectory) as an uninterrupted run: the checkpoint carries
        the full schedule state, and per-epoch RNG depends only on the epoch
        index."""
        train_b, val_b, _, _, _ = packed

        cfg_a = tiny_config(str(tmp_path / "sgdr_full"), scheduler="sgdr")
        tr_a = Trainer(cfg_a)
        h_full = tr_a.fit(train_b, val_b, epochs=6, log_fn=lambda s: None)

        cfg_b = tiny_config(str(tmp_path / "sgdr_resumed"), scheduler="sgdr")
        tr_b = Trainer(cfg_b)
        tr_b.fit(train_b, val_b, epochs=3, log_fn=lambda s: None)
        tr_c = Trainer(cfg_b)
        h_res = tr_c.fit(train_b, val_b, epochs=6, log_fn=lambda s: None,
                         resume=True)

        assert h_res["lr"] == pytest.approx(h_full["lr"][3:], rel=1e-6)
        assert h_res["loss"] == pytest.approx(h_full["loss"][3:], rel=1e-4)

    def test_resume_without_checkpoint_starts_fresh(self, packed, tmp_path):
        train_b, val_b, _, _, _ = packed
        cfg = tiny_config(str(tmp_path / "fresh"))
        tr = Trainer(cfg)
        h = tr.fit(train_b, val_b, epochs=2, log_fn=lambda s: None, resume=True)
        assert len(h["loss"]) == 2


@pytest.mark.slow
def test_training_is_deterministic(packed, tmp_path):
    """Same seed -> bit-identical training trajectory (the reference needs
    TF_DETERMINISTIC_OPS env gymnastics for this, train.py:16-28; JAX gives
    it by construction)."""
    train_b, val_b, _, _, _ = packed
    hists = []
    for run in range(2):
        cfg = tiny_config(str(tmp_path / f"det{run}"))
        tr = Trainer(cfg)
        hists.append(tr.fit(train_b, val_b, epochs=3, log_fn=lambda s: None))
    np.testing.assert_array_equal(hists[0]["loss"], hists[1]["loss"])
    np.testing.assert_array_equal(hists[0]["val_mae"], hists[1]["val_mae"])


def test_state_signature_stable_across_epochs(packed, tmp_path):
    """The jit signature of the training state must not change after the
    first epoch: init_state commits EVERY leaf (incl. the Adam count and
    step scalars) to the replicated mesh sharding, so epoch 2 reuses the
    epoch-1 executable. Before this was pinned, the uncommitted scalars
    came back mesh-committed from epoch 1 and the whole-epoch executable
    silently recompiled (measured: a second 526 s Mosaic compile at the
    packed QM9 shape on TPU)."""
    import jax
    import jax.numpy as jnp

    train_b, _, _, _, _ = packed
    cfg = tiny_config(str(tmp_path))
    t = Trainer(cfg)
    t._lr_fn = make_cosine_lr(cfg.hyper.lr, cfg.hyper.min_lr, 8, 10)
    t._make_steps()
    t.init_state({k: v[:1] for k, v in train_b[0].inputs.items()}, seed=0)
    (bi, bt), = t._put_buckets([train_b[0]], "sig")

    def sig(state):
        return jax.tree.map(
            lambda x: (x.aval.str_short(), str(x.sharding), bool(x.committed)),
            state)

    s0_sig = sig(t.state)
    s1, _ = t._train_epoch(t.state, bi, bt, jax.random.PRNGKey(0),
                           jnp.float32(0.0))
    assert sig(s1) == s0_sig


def test_eval_buckets_ladder_pad_share_one_shape(tmp_path):
    """Eval-tagged device buckets wrap-pad their slot count to a quantized
    ladder so valid/test usually share ONE compiled eval shape; predictions
    stay correct because pad rows wrap from the start and callers trim at
    the original count."""
    from scann_tpu.data.pipeline import PackedBucket

    cfg = tiny_config(str(tmp_path))
    t = Trainer(cfg)

    def mk(S, seed):
        rng = np.random.default_rng(seed)
        inputs = {
            "atomic": rng.integers(1, 5, size=(S, 4)).astype(np.int32),
            "atom_mask": np.ones((S, 4, 1), np.float32),
            "neighbors": np.zeros((S, 4, 2), np.int32),
            "neighbor_mask": np.ones((S, 4, 2), np.float32),
            "neighbor_weight": np.ones((S, 4, 2), np.float32),
            "neighbor_distance": np.ones((S, 4, 2), np.float32),
        }
        y = rng.normal(size=S).astype(np.float32)
        return PackedBucket(inputs=inputs, targets=y, indices=np.arange(S))

    B = cfg.hyper.batch_size
    valid, test = mk(B * 5 + 3, 0), mk(B * 5 + 9, 1)  # different S, same rung
    (vi, vt), = t._put_buckets([valid], "valid", ladder_pad=True)
    (ti, tt), = t._put_buckets([test], "test", ladder_pad=True)
    # both land on the same ladder rung -> one compiled eval shape
    assert vt.shape == tt.shape
    assert vi["atomic"].shape == ti["atomic"].shape
    # pad rows wrap from the start: first S rows are the original ones
    np.testing.assert_array_equal(np.asarray(vt)[: len(valid.targets)],
                                  valid.targets)
    np.testing.assert_array_equal(
        np.asarray(vi["atomic"])[: len(valid.targets)],
        valid.inputs["atomic"])
    # wrap content: row S equals row 0
    np.testing.assert_array_equal(np.asarray(vt)[len(valid.targets)],
                                  valid.targets[0])
    # training buckets are NEVER padded
    (bi, bt), = t._put_buckets([valid], "train")
    assert bt.shape[0] == len(valid.targets)
