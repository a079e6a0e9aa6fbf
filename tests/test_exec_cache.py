"""Compiled-executable cache: cross-process serving warmup without
recompiles (scann_tpu/utils/exec_cache.py).

The cache serializes the compiled PjRt executable itself, so a fresh
serving process loads each ladder rung in ~ms instead of paying the
XLA/Pallas compile (~45 s/shape remote, 112-1192 s full warmup measured —
NEXT.md). JAX's own persistent compilation cache does not cover the
remote-TPU deployment (the remote Mosaic compile bypasses it), which is
why this exists. The reference has no serving layer at all
(scann_model.py stops at predict_data), so this subsystem is
TPU-deployment-specific.
"""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scann_tpu.utils.exec_cache import (
    ExecutableCache,
    batch_signature,
    env_fingerprint,
)


def _f(x, y):
    return jnp.tanh(x @ y) * 2.0


JIT_F = jax.jit(_f)
X = np.ones((16, 16), np.float32)


class TestExecutableCache:
    def test_compile_then_mem_hit(self, tmp_path):
        cache = ExecutableCache(str(tmp_path))
        fn = cache.get_or_compile("k", JIT_F, X, X)
        out = np.asarray(fn(X, X))
        np.testing.assert_allclose(out, np.asarray(JIT_F(X, X)), rtol=1e-6)
        assert cache.stats["compiles"] == 1
        fn2 = cache.get_or_compile("k", JIT_F, X, X)
        assert fn2 is fn and cache.stats["mem_hits"] == 1

    def test_fresh_instance_loads_from_disk(self, tmp_path):
        """A new cache object on the same dir (= a new process) must load
        the serialized executable instead of recompiling — unless this
        backend cannot serialize, in which case it recompiles cleanly."""
        a = ExecutableCache(str(tmp_path))
        ref = np.asarray(a.get_or_compile("k", JIT_F, X, X)(X, X))
        b = ExecutableCache(str(tmp_path))
        fn = b.get_or_compile("k", JIT_F, X, X)
        np.testing.assert_allclose(np.asarray(fn(X, X)), ref, rtol=1e-6)
        if a.stats["save_errors"] == 0:  # backend supports serialization
            assert b.stats["disk_hits"] == 1 and b.stats["compiles"] == 0
        else:
            assert b.stats["compiles"] == 1

    def test_corrupt_entry_falls_back_and_is_dropped(self, tmp_path):
        a = ExecutableCache(str(tmp_path))
        a.get_or_compile("k", JIT_F, X, X)
        files = [f for f in os.listdir(tmp_path) if f.endswith(".jexec")]
        if not files:  # backend can't serialize: nothing to corrupt
            pytest.skip("backend does not serialize executables")
        path = os.path.join(tmp_path, files[0])
        with open(path, "wb") as f:
            f.write(b"not a pickle")
        b = ExecutableCache(str(tmp_path))
        out = np.asarray(b.get_or_compile("k", JIT_F, X, X)(X, X))
        np.testing.assert_allclose(out, np.asarray(JIT_F(X, X)), rtol=1e-6)
        assert b.stats["load_errors"] == 1 and b.stats["compiles"] == 1
        # the recompile re-published a VALID entry over the corrupt one
        c = ExecutableCache(str(tmp_path))
        c.get_or_compile("k", JIT_F, X, X)
        assert c.stats["disk_hits"] == 1 and c.stats["compiles"] == 0

    def test_distinct_keys_distinct_entries(self, tmp_path):
        cache = ExecutableCache(str(tmp_path))
        cache.get_or_compile("k1", JIT_F, X, X)
        y = np.ones((8, 8), np.float32)
        cache.get_or_compile("k2", JIT_F, y, y)
        assert cache.stats["compiles"] == 2

    def test_env_fingerprint_covers_backend(self):
        fp = env_fingerprint()
        assert jax.__version__ in fp and jax.default_backend() in fp

    def test_batch_signature_is_shape_stable(self):
        b1 = {"a": np.zeros((2, 3)), "b": np.zeros((2,), np.int32)}
        b2 = {"b": np.zeros((2,), np.int32), "a": np.ones((2, 3))}
        assert batch_signature(b1) == batch_signature(b2)  # values ignored
        b3 = {"a": np.zeros((2, 4)), "b": np.zeros((2,), np.int32)}
        assert batch_signature(b1) != batch_signature(b3)

    def test_disk_loaded_entry_stays_guarded_until_validated(self, tmp_path):
        """A disk-loaded executable inserted into the in-memory map must
        keep reporting src="disk" (the guarded path) to later callers until
        its first call is confirmed good via mark_validated — a concurrent
        second thread must not get it as a trusted "mem" hit before any
        call has succeeded (ADVICE r4). Freshly compiled entries are
        trusted immediately."""
        a = ExecutableCache(str(tmp_path))
        _, src = a.get_or_compile_info("k", JIT_F, X, X)
        assert src == "compile"
        _, src = a.get_or_compile_info("k", JIT_F, X, X)
        assert src == "mem"  # fresh compiles are validated by construction
        if a.stats["save_errors"]:
            pytest.skip("backend does not serialize executables")
        b = ExecutableCache(str(tmp_path))
        fn, src = b.get_or_compile_info("k", JIT_F, X, X)
        assert src == "disk"
        # a second caller BEFORE validation: still the guarded path
        _, src2 = b.get_or_compile_info("k", JIT_F, X, X)
        assert src2 == "disk"
        np.testing.assert_allclose(np.asarray(fn(X, X)),
                                   np.asarray(JIT_F(X, X)), rtol=1e-6)
        b.mark_validated("k")
        _, src3 = b.get_or_compile_info("k", JIT_F, X, X)
        assert src3 == "mem"
        # invalidation demotes: a later re-load is guarded again
        b.invalidate("k")
        _, src4 = b.get_or_compile_info("k", JIT_F, X, X)
        assert src4 in ("disk", "compile")

    def test_stale_entry_for_changed_function_recompiles(self, tmp_path):
        """Same key, same arg shapes, but a DIFFERENT function than the one
        serialized: the loaded executable computes the old function — which
        is exactly why the Scann key includes the model config and the
        parameter tree. Here we pin the cache-layer contract: the loaded
        executable runs (aval check passes), so key discipline is what
        guarantees correctness."""
        a = ExecutableCache(str(tmp_path))
        a.get_or_compile("k", JIT_F, X, X)
        if a.stats["save_errors"]:
            pytest.skip("backend does not serialize executables")
        g = jax.jit(lambda x, y: x + y)
        b = ExecutableCache(str(tmp_path))
        fn = b.get_or_compile("k", g, X, X)
        assert b.stats["disk_hits"] == 1  # key collision -> old executable
        np.testing.assert_allclose(np.asarray(fn(X, X)),
                                   np.asarray(JIT_F(X, X)), rtol=1e-6)


@pytest.mark.slow  # full (tiny) training runs
class TestTrainerExecCache:
    """tpu.exec_cache_dir: train/eval executables persist across Trainer
    instances (= processes) with EXACTLY the training trajectory of the
    uncached path — the cache may only change compile time, never math."""

    @pytest.fixture(scope="class")
    def data(self, tmp_path_factory):
        from scann_tpu.data.pipeline import (
            load_dataset, pack_dataset, split_data, subset_buckets)
        from scann_tpu.data.synthetic import make_synthetic_dataset

        out = tmp_path_factory.mktemp("ec_train")
        e, n = make_synthetic_dataset(str(out), n_structures=96, min_atoms=4,
                                      max_atoms=10, seed=3)
        records, neighbors = load_dataset(e, n, target="homo")
        buckets = pack_dataset(records, neighbors, g_update=True,
                               max_buckets=1)
        tr, va, _ = split_data(96, train_size=64, test_size=16, seed=0)
        return subset_buckets(buckets, tr), subset_buckets(buckets, va)

    def _cfg(self, workdir, cache_dir=None):
        from scann_tpu.config import (
            HyperConfig, ModelConfig, ScannConfig, TpuConfig)

        return ScannConfig(
            model=ModelConfig(n_attention=2, local_dim=32, num_head=4,
                              global_dim=32, dense_out=16, embedding_dim=16,
                              g_update=True, n_atoms=12),
            hyper=HyperConfig(batch_size=16, lr=1e-3, min_lr=1e-4,
                              patience=50, save_path=workdir, target="homo"),
            tpu=TpuConfig(use_pallas=False, exec_cache_dir=cache_dir),
        )

    def test_cached_training_is_exact_and_reloads(self, data, tmp_path):
        from scann_tpu.train import Trainer

        train_b, val_b = data
        cache_dir = str(tmp_path / "cache")

        base = Trainer(self._cfg(str(tmp_path / "r0")))
        h0 = base.fit(train_b, val_b, epochs=3, log_fn=lambda s: None)

        cold = Trainer(self._cfg(str(tmp_path / "r1"), cache_dir))
        h1 = cold.fit(train_b, val_b, epochs=3, log_fn=lambda s: None)
        s1 = cold._exec_cache.stats
        assert s1["compiles"] >= 2  # train_epoch + eval_epoch

        warm = Trainer(self._cfg(str(tmp_path / "r2"), cache_dir))
        h2 = warm.fit(train_b, val_b, epochs=3, log_fn=lambda s: None)
        s2 = warm._exec_cache.stats
        if s1["save_errors"] == 0:
            assert s2["disk_hits"] >= 1
            if s2["invalidated"] == 0:  # reloads actually executed
                assert s2["compiles"] == 0

        # the trajectory is EXACTLY the uncached one, all three runs
        for k in ("loss", "mae", "val_mae"):
            np.testing.assert_array_equal(h0[k], h1[k], err_msg=k)
            np.testing.assert_array_equal(h0[k], h2[k], err_msg=k)

        # predict path reloads too, and matches
        p0 = base.predict(train_b[:1])[0]
        p2 = warm.predict(train_b[:1])[0]
        assert p0.shape == p2.shape and np.all(np.isfinite(p2))

    def test_schedule_change_rekeys_cache(self, data, tmp_path):
        """A different lr schedule must NOT reuse the old executable (the
        schedule constants are baked into the traced epoch fn)."""
        from scann_tpu.train import Trainer

        train_b, val_b = data
        cache_dir = str(tmp_path / "cache")
        a = Trainer(self._cfg(str(tmp_path / "a"), cache_dir))
        a.fit(train_b, val_b, epochs=2, log_fn=lambda s: None)
        cfg = self._cfg(str(tmp_path / "b"), cache_dir)
        cfg.hyper.lr = 5e-4  # different schedule -> different steps_key
        b = Trainer(cfg)
        hb = b.fit(train_b, val_b, epochs=2, log_fn=lambda s: None)
        assert b._exec_cache.stats["compiles"] >= 1  # not served stale
        assert np.all(np.isfinite(hb["loss"]))


@pytest.mark.slow  # spins up a real (tiny) model
class TestScannServingExecCache:
    @pytest.fixture(scope="class")
    def scann(self, tmp_path_factory):
        from scann_tpu.api import Scann
        from scann_tpu.config import (
            HyperConfig, ModelConfig, ScannConfig, TpuConfig)

        cfg = ScannConfig(
            model=ModelConfig(n_atoms=95, embedding_dim=16, n_attention=2,
                              local_dim=32, num_head=4, global_dim=32,
                              dense_out=16, g_update=True),
            hyper=HyperConfig(batch_size=4, target="homo",
                              save_path=str(tmp_path_factory.mktemp("ec"))),
            tpu=TpuConfig(use_pallas=False),
        )
        s = Scann(cfg)
        s.trainer.init_state(s._example_inputs())
        return s

    def test_serving_with_cache_matches_plain_and_reloads(self, scann,
                                                          tmp_path):
        from scann_tpu.data.structure import Structure

        water = Structure(["O", "H", "H"],
                          [[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])
        co = Structure(["C", "O"], [[0, 0, 0], [1.13, 0, 0]])

        plain = scann.predict_structures([water, co])

        cache_dir = scann.enable_exec_cache(str(tmp_path / "ec"))
        cached = scann.predict_structures([water, co])
        first = scann._exec_cache.stats
        assert first["compiles"] >= 1

        # fresh cache object on the same dir simulates a NEW serving
        # process: rungs come off disk (or recompile if the backend can't
        # serialize, or fall back to the jit path if this host can't
        # EXECUTE the reloaded AOT artifact — observed with XLA:CPU's
        # machine-feature skew), and predictions are identical in any case
        scann.enable_exec_cache(cache_dir)
        reloaded = scann.predict_structures([water, co])
        second = scann._exec_cache.stats
        if first["save_errors"] == 0:
            assert second["disk_hits"] >= 1
            if second["invalidated"] == 0:  # reload actually executed
                assert second["compiles"] == 0
        for (a, _), (b, _), (c, _) in zip(plain, cached, reloaded):
            np.testing.assert_allclose(a, b, rtol=1e-6)
            np.testing.assert_allclose(a, c, rtol=1e-6)
        for (_, ga), (_, gb), (_, gc) in zip(plain, cached, reloaded):
            np.testing.assert_allclose(ga, gb, rtol=1e-5, atol=1e-7)
            np.testing.assert_allclose(ga, gc, rtol=1e-5, atol=1e-7)

    def test_batched_predictor_wires_exec_cache(self, scann, tmp_path):
        """serve.BatchedPredictor(exec_cache=...) enables the cache BEFORE
        warmup, so the warmed rungs are what later processes load."""
        from scann_tpu.data.structure import Structure
        from scann_tpu.serve import BatchedPredictor

        co = Structure(["C", "O"], [[0, 0, 0], [1.13, 0, 0]])
        cache_dir = str(tmp_path / "pc")
        p = BatchedPredictor(scann, max_batch=8, window_ms=1.0,
                             warmup_shapes=[(8, 8)], exec_cache=cache_dir)
        try:
            assert scann._exec_cache is not None
            assert scann._exec_cache.cache_dir == cache_dir
            stats = scann._exec_cache.stats
            assert stats["compiles"] + stats["disk_hits"] >= 1  # warmup ran
            (v, ga), = p.predict([co])
            assert np.isfinite(v) and ga.shape == (2,)
        finally:
            p.close()
        # "auto" resolves to {model_dir}/exec_cache — the trainer workdir,
        # which is the actual run/model directory (ADVICE r3: the original
        # hyper.save_path may not exist on a serving host)
        p2 = BatchedPredictor(scann, max_batch=8, window_ms=1.0,
                              warmup_shapes=[], exec_cache="auto")
        try:
            assert scann._exec_cache.cache_dir == os.path.join(
                scann.trainer.workdir, "exec_cache")
        finally:
            p2.close()

    def test_uncreatable_cache_dir_disables_with_warning(self, scann,
                                                         tmp_path):
        """An uncreatable cache dir must warn and disable the cache, not
        crash server startup (ADVICE r3 medium #2)."""
        blocker = tmp_path / "blocker"
        blocker.write_text("")  # a FILE where a directory is needed
        with pytest.warns(UserWarning, match="exec cache disabled"):
            out = scann.enable_exec_cache(str(blocker / "sub"))
        assert out is None and scann._exec_cache is None
        from scann_tpu.data.structure import Structure

        co = Structure(["C", "O"], [[0, 0, 0], [1.13, 0, 0]])
        (v, ga), = scann.predict_structures([co])  # plain jit path works
        assert np.isfinite(v)

    def test_tpu_config_rekeys_serve_entries(self, scann):
        """Two deployments sharing a cache dir with different tpu configs
        (e.g. use_pallas) must NOT share executables: the serve key mixes
        repr(config.tpu) + mesh signature, mirroring Trainer._cache_wrap
        (ADVICE r3 medium #1). Run-specific fields (exec_cache_dir,
        observed_buckets) are normalized OUT so they don't re-key.

        The memo guard itself carries a cheap config fingerprint (ADVICE
        r4): in-place config mutations re-key WITHOUT any manual
        ``_serve_key_prefix = None`` reset by the caller."""
        params = scann.trainer.state.params
        tpu = scann.config.tpu
        orig = (tpu.use_pallas, tpu.exec_cache_dir, tpu.observed_buckets)
        try:
            k1 = scann._serve_cache_prefix(params)
            # memoized per (params, config-fingerprint): same object
            assert scann._serve_cache_prefix(params) is k1

            tpu.use_pallas = not tpu.use_pallas
            k2 = scann._serve_cache_prefix(params)
            assert k1 != k2

            tpu.use_pallas = orig[0]
            tpu.exec_cache_dir = "/somewhere/else"
            tpu.observed_buckets = [(8, 8)]
            k3 = scann._serve_cache_prefix(params)
            assert k1 == k3
        finally:
            (tpu.use_pallas, tpu.exec_cache_dir,
             tpu.observed_buckets) = orig
            scann._serve_key_prefix = None

    def test_stale_model_entry_degrades_to_jit(self, scann, tmp_path):
        """A cache entry whose key matches but whose executable was built
        for different avals (hand-planted) must not take serving down:
        _serve_call falls back to the plain jit path."""
        cache_dir = str(tmp_path / "stale")
        scann.enable_exec_cache(cache_dir)
        from scann_tpu.data.structure import Structure

        co = Structure(["C", "O"], [[0, 0, 0], [1.13, 0, 0]])
        good = scann.predict_structures([co])
        cache = scann._exec_cache
        # plant garbage under every key the next call will look up
        for f in os.listdir(cache_dir):
            with open(os.path.join(cache_dir, f), "wb") as fh:
                pickle.dump(("bogus", None, None), fh)
        scann.enable_exec_cache(cache_dir)  # fresh mem cache -> disk path
        again = scann.predict_structures([co])
        np.testing.assert_allclose(good[0][0], again[0][0], rtol=1e-6)
        assert scann._exec_cache.stats["load_errors"] >= 1
