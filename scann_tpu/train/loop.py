"""Training orchestration: jitted device-resident steps, eval, checkpoints.

TPU-native counterpart of the reference orchestrator
(``scann/models/scann_model.py:42-319``):

- same training recipe: RMSE loss + the Keras l2(1e-4) kernel penalties and
  Adam(epsilon=1e-7) with the ``decay=1e-5`` inverse-time lr factor
  (``scann_model.py:210-214``), cosine or SGDR schedule, early stopping on
  val MAE (patience 200), best-val checkpointing, test-set report,
- TPU-first execution: the packed dataset lives in HBM (replicated over the
  mesh); each step transfers only a [batch] int32 index vector, and the
  batch gather happens inside the jitted step. Batches are sharded over the
  ``data`` mesh axis; XLA inserts the gradient all-reduce over ICI.
- checkpoint/resume via orbax (the reference has no optimizer-state resume;
  we checkpoint the full train state).
- multi-process (multi-host) transparency: every device placement routes
  through ``parallel.put_replicated`` and exactly-once side effects
  (metrics/report/config/checkpoints) through ``parallel.is_primary`` —
  one process per host runs this SAME code on a pod, with per-host data
  loading and digest-checked replica consistency
  (``parallel/distributed.py``; trajectory-parity-tested on a 2-process
  CPU mesh in tests/test_distributed.py).
"""

from __future__ import annotations

import json
import math
import os
import time
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from scann_tpu.config import ScannConfig
from scann_tpu.data.pipeline import PackedBucket
from scann_tpu.models import ScannModel
from scann_tpu.models.scann import l2_penalty
from scann_tpu.parallel import (
    batch_sharding,
    fetch,
    is_multiprocess,
    is_primary,
    make_mesh,
    put_replicated,
    replicated_sharding,
)
from scann_tpu.train.schedules import SGDRSchedule, make_cosine_lr


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


# jitted model.init wrappers, keyed by the model's config-printing repr —
# equal-config Trainers share one compiled init executable (init_state).
# Bounded: a config sweep in one process would otherwise accumulate one
# compiled executable per distinct config forever.
_INIT_CACHE: Dict[str, Any] = {}
_INIT_CACHE_MAX = 16


def bucket_structure_indices(b) -> np.ndarray:
    """Per-structure original dataset indices of a (Packed)Bucket, in the
    bucket's row order — packed slots yield valid segments in
    (slot, segment) order. The single source of truth for the '2-D
    [slots, SEG] indices with -1 for empty segments' packed layout."""
    ix = np.asarray(b.indices)
    return ix[ix >= 0] if ix.ndim == 2 else ix[: b.num_structures]


def bucket_structure_targets(b) -> np.ndarray:
    """Per-structure targets aligned with ``bucket_structure_indices``."""
    y = np.asarray(b.targets)
    if y.ndim == 2:
        return y[np.asarray(b.indices) >= 0]
    return y[: b.num_structures]


def r2_score(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    ss_res = float(np.sum((y_true - y_pred) ** 2))
    ss_tot = float(np.sum((y_true - np.mean(y_true)) ** 2))
    return 1.0 - ss_res / (ss_tot + 1e-12)


class Trainer:
    def __init__(
        self,
        config: ScannConfig,
        model: Optional[ScannModel] = None,
        mesh=None,
        workdir: Optional[str] = None,
    ):
        self.config = config
        self.model = model or ScannModel(
            config=config.model, mrelu_head=(config.hyper.target == "e_b")
        )
        # On TPU, supported configs run the fused single-kernel forward for
        # eval/inference and the fused forward+backward pair for training;
        # everything else (CPU, unsupported configs, oversized buckets) uses
        # the XLA paths below.
        pallas_ok = (config.tpu.use_pallas
                     and jax.default_backend() == "tpu"
                     and not self.model.use_pallas)
        self.eval_model = (
            ScannModel(config=self.model.config,
                       mrelu_head=self.model.mrelu_head, use_pallas=True)
            if pallas_ok else self.model
        )
        from scann_tpu.kernels.scann_forward import supports_config

        self._use_fused_eval = pallas_ok and supports_config(config.model)
        self.mesh = mesh if mesh is not None else make_mesh(
            n_devices=(config.tpu.mesh_shape[0] if config.tpu.mesh_shape else None)
        )
        # Fused training: single-kernel forward + single-kernel backward
        # (1.7x over the XLA step); on multi-chip meshes the kernels run
        # per-shard under shard_map with the gradient psum over ICI.
        self._use_fused_train = self._use_fused_eval
        self._sharded_fused_train = None
        self._sharded_loop_apply = None
        self._sharded_loop_fwd = None
        self._sharded_loop_train = None
        if self._use_fused_train and len(self.mesh.devices.flat) > 1:
            from scann_tpu.kernels.scann_backward import make_sharded_scann_train
            from scann_tpu.kernels.scann_loop import (
                make_sharded_loop_apply,
                make_sharded_loop_forward,
                make_sharded_loop_train,
                supports_loop,
            )

            self._sharded_fused_train = make_sharded_scann_train(
                self.mesh, config.model, self.model.mrelu_head,
                dropout_rate=0.1)
            if supports_loop(config.model):
                self._sharded_loop_apply = make_sharded_loop_apply(
                    self.mesh, config.model, self.model.mrelu_head,
                    dropout_rate=0.1)
                self._sharded_loop_fwd = make_sharded_loop_forward(
                    self.mesh, config.model, self.model.mrelu_head)
                self._sharded_loop_train = make_sharded_loop_train(
                    self.mesh, config.model, self.model.mrelu_head,
                    dropout_rate=0.1)
        self.workdir = workdir or "{}_{}".format(config.hyper.save_path, config.hyper.target)
        # Keras Adam defaults: b1=0.9, b2=0.999, eps=1e-7 (scann_model.py:212);
        # lr is applied separately per step so SGDR can drive it from the host.
        self.tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-7)

        self._repl = replicated_sharding(self.mesh)
        self._bsh = batch_sharding(self.mesh)
        self._train_epoch = None
        self._eval_epoch = None
        self._steps_key = None  # schedule signature the epoch fns were traced with
        self._exec_cache = None  # lazy ExecutableCache (tpu.exec_cache_dir)
        self._predict_fwd = None  # cached jitted predict forward
        self._lr_fn = None  # set by fit(); read inside the jitted epoch fn
        self.state: Optional[TrainState] = None
        # device-bucket cache: key -> (bucket_ref, dev_inputs, dev_targets).
        # The bucket reference pins the object alive so its id() cannot be
        # recycled onto a different dataset's bucket; one entry per tag.
        self._device_buckets: Dict[Any, Tuple[Any, Any, Any]] = {}

    # --- state ---------------------------------------------------------------

    def init_state(self, example_inputs: Dict[str, np.ndarray], seed: int = 0) -> TrainState:
        # jit the init: eagerly it dispatches hundreds of tiny ops (seconds
        # of host latency on a 1-core CI host, worse over a tunneled TPU);
        # one small forward-only compile is strictly cheaper. The wrapper is
        # cached by the model's config-printing repr so equal-config
        # Trainers (and repeated init_state calls) share one executable.
        key = repr(self.model)
        init_fn = _INIT_CACHE.get(key)
        if init_fn is None:
            if len(_INIT_CACHE) >= _INIT_CACHE_MAX:
                _INIT_CACHE.pop(next(iter(_INIT_CACHE)))  # FIFO eviction
            model = self.model
            init_fn = _INIT_CACHE.setdefault(
                key, jax.jit(lambda rng, x: model.init(rng, x,
                                                       deterministic=True)))
        params = init_fn(jax.random.PRNGKey(seed), example_inputs)["params"]
        params = put_replicated(params, self._repl)
        opt_state = self.tx.init(params)
        # commit the WHOLE state to the replicated mesh sharding: an
        # uncommitted scalar (opt count / step) comes back mesh-committed
        # from the first jitted epoch, which changes the jit signature and
        # silently re-compiles the whole-epoch executable on epoch 2
        # (measured: a second 526 s Mosaic compile at the packed QM9 shape)
        self.state = put_replicated(
            TrainState(params=params, opt_state=opt_state,
                       step=jnp.zeros((), jnp.int32)), self._repl)
        return self.state

    def load_params(self, params: Any):
        """Install externally-loaded params (e.g. from the H5 converter)."""
        params = params.get("params", params)
        params = put_replicated(params, self._repl)
        opt_state = self.tx.init(params)
        self.state = put_replicated(
            TrainState(params=params, opt_state=opt_state,
                       step=jnp.zeros((), jnp.int32)), self._repl)
        return self.state

    def load_optimizer(self, count: int, mu: Any, nu: Any):
        """Install externally-loaded Adam state (reference H5 migration).

        ``mu``/``nu`` must mirror the params pytree (compat.load_h5_optimizer
        produces them); ``count`` becomes both the Adam bias-correction
        counter and the step counter that drives the reference's
        inverse-time lr decay — a run moved over mid-training continues on
        the same lr trajectory.
        """
        if self.state is None:
            raise RuntimeError("load params before the optimizer state "
                               "(Trainer.load_params / init_state)")
        base = self.tx.init(self.state.params)
        try:
            new_mu = jax.tree.map(lambda r, v: jnp.asarray(v, r.dtype),
                                  base.mu, mu)
            new_nu = jax.tree.map(lambda r, v: jnp.asarray(v, r.dtype),
                                  base.nu, nu)
        except ValueError as e:
            raise ValueError(
                f"optimizer slot pytree does not match the model params: {e}"
            ) from e
        opt_state = base._replace(count=jnp.asarray(count, base.count.dtype),
                                  mu=new_mu, nu=new_nu)
        # device_put the whole state: see init_state — uncommitted scalars
        # would re-compile the epoch executable on their second use
        self.state = put_replicated(
            TrainState(params=self.state.params, opt_state=opt_state,
                       step=jnp.asarray(count, jnp.int32)), self._repl)
        return self.state

    # --- jitted steps --------------------------------------------------------

    def _batch_fits_fused(self, batch, training: bool = False) -> bool:
        from scann_tpu.kernels.scann_forward import fits_vmem

        M = batch["atomic"].shape[1]
        N = batch["neighbors"].shape[2]
        return fits_vmem(self.config.model, M, N, training=training)

    def _batch_fits_loop(self, batch, training: bool = False) -> bool:
        """Crystal-scale buckets (too big for the unrolled kernels) that the
        fori_loop fused kernels cover. Multi-chip meshes run the shard_map
        wrappers (training AND eval, round-2 VERDICT #3b)."""
        from scann_tpu.kernels.scann_loop import fits_loop_vmem, supports_loop

        if not self._use_fused_eval:
            return False
        if len(self.mesh.devices.flat) > 1 and not (
                (training and self._sharded_loop_apply is not None)
                or (not training and self._sharded_loop_fwd is not None)):
            return False
        if not supports_loop(self.config.model):
            return False
        M = batch["atomic"].shape[1]
        N = batch["neighbors"].shape[2]
        return fits_loop_vmem(self.config.model, M, N, training=training)

    def _preresolve_tiles(self, buckets: List[PackedBucket], training: bool,
                          batch_size: Optional[int] = None):
        """Resolve (and device-validate) the fused kernels' batch tiles for
        every bucket shape BEFORE jit tracing: the resolver's compile probe
        must run eagerly, which is impossible once tracing has started."""
        if not self._use_fused_eval:
            return
        from scann_tpu.kernels.scann_forward import fits_vmem, resolve_tile

        B = batch_size or self.config.hyper.batch_size
        for b in buckets:
            M = b.inputs["atomic"].shape[1]
            N = b.inputs["neighbors"].shape[2]
            if fits_vmem(self.config.model, M, N, training=False):
                resolve_tile(self.config.model, B, M, N, "fwd",
                             0.1 if training else 0.0)
            if training and fits_vmem(self.config.model, M, N,
                                      training=True):
                resolve_tile(self.config.model, B, M, N, "bwd", 0.1)

    def forward_eval(self, params, batch):
        """Deterministic forward -> (property [B,1], ga_score [B,M,1]),
        through the fastest available path (whole-model fused kernel >
        per-layer kernels > XLA). Shape-dependent choices resolve statically
        per bucket at trace time."""
        if self._use_fused_eval and self._batch_fits_fused(batch):
            from scann_tpu.kernels.scann_forward import fused_scann_forward

            return fused_scann_forward(params, batch, self.config.model,
                                       mrelu_head=self.model.mrelu_head)
        if self._batch_fits_loop(batch):
            from scann_tpu.kernels.scann_loop import loop_scann_forward

            if self._sharded_loop_fwd is not None:
                return self._sharded_loop_fwd(params, batch)
            return loop_scann_forward(params, batch, self.config.model,
                                      mrelu_head=self.model.mrelu_head)
        out = self.eval_model.apply({"params": params}, batch, deterministic=True)
        return out["property"], out["ga_score"]

    def _make_steps(self, steps_key: Any = None):
        """(Re)trace the jitted epoch functions.

        ``steps_key`` is the schedule signature they are traced against —
        the epoch closure reads ``self._lr_fn`` and scheduler flags at
        TRACE time, so a later fit() with a different schedule must rebuild
        (a stale cached executable would silently train on the old
        learning-rate trajectory)."""
        model = self.model
        tx = self.tx
        l2 = self.config.hyper.l2_reg
        self._steps_key = steps_key

        # --- whole-epoch scan: ONE dispatch per (bucket, epoch) --------------
        # At reference batch sizes the per-step path is host-dispatch-bound
        # (the step takes ~0.3 ms on-chip but ~1.6 ms of dispatch latency);
        # scanning all steps of an epoch inside a single jit removes every
        # per-step host interaction, including batch-index generation: the
        # epoch permutation is computed on device from the epoch RNG key.
        # packed training batches SLOTS: fit() resolves a smaller slot batch
        # when tpu.pack_preserve_batch keeps ~batch_size structures per step
        B = getattr(self, "_slot_batch", None) or self.config.hyper.batch_size
        use_cosine = self.config.hyper.scheduler != "sgdr"
        adam_decay = self.config.hyper.adam_decay
        bsh = self._bsh

        # STRUCTURE PACKING (data/packing.py): slots carry several
        # structures; targets are [slots, SEG] with a segment_mask input,
        # and the per-batch RMSE/MAE normalize by the VALID segment count
        # (which varies per batch of slots) instead of the batch size.
        @partial(jax.jit, donate_argnums=(0,))
        def train_epoch(state: TrainState, binputs, btargets, epoch_rng, sgdr_lr):
            S = btargets.shape[0]
            n_batches = -(-S // B)  # static ceil
            perm_key, drop_key = jax.random.split(epoch_rng)
            perm = jax.random.permutation(perm_key, S)
            # wrap-around fill of the final partial batch (modular: correct
            # even when the bucket is smaller than the pad)
            idx_plan = perm[jnp.arange(n_batches * B) % S].reshape(n_batches, B)
            packed = "segment_mask" in binputs

            def body(state, inp):
                idx, k = inp
                idx = jax.lax.with_sharding_constraint(idx, bsh)
                if use_cosine:
                    lr = self._lr_fn(state.step)
                else:
                    lr = sgdr_lr / (1.0 + adam_decay * state.step.astype(jnp.float32))
                rng = jax.random.fold_in(drop_key, k)
                batch = jax.tree.map(lambda x: x[idx], binputs)
                y = btargets[idx]
                smask = batch["segment_mask"] if packed else None
                nvalid = smask.sum() if packed else jnp.float32(y.shape[0])

                def masked_stats(pred):
                    """(rmse, mae) over structures; packed = valid segments."""
                    err = (pred - y) * smask if packed else pred - y
                    rmse = jnp.sqrt(jnp.sum(jnp.square(err)) / nvalid)
                    mae = jnp.sum(jnp.abs(err)) / nvalid
                    return rmse, mae

                def loss_fn(params):
                    out = model.apply({"params": params}, batch,
                                      deterministic=False,
                                      rngs={"dropout": rng})
                    pred = out["property"] if packed else out["property"][:, 0]
                    rmse, mae = masked_stats(pred)
                    return rmse + l2_penalty(params, l2), mae

                # Fused regimes: ONE kernel per step — the bwd kernels
                # recompute the forward anyway, so they also emit pred and
                # form the RMSE residual in-kernel; here we apply the global
                # 1/(n*rmse) scale + the l2 term (measured +31% at the
                # MP2018 crystal shape over the fwd+bwd launch pair).
                use_fused_oneshot = (self._use_fused_train
                                     and self._batch_fits_fused(
                                         batch, training=True))
                use_loop_oneshot = (
                    self._use_fused_train
                    and not use_fused_oneshot
                    and self._batch_fits_loop(batch, training=True))
                if use_fused_oneshot or use_loop_oneshot:
                    seed = jax.random.randint(rng, (), 0,
                                              jnp.iinfo(jnp.int32).max,
                                              dtype=jnp.int32)
                    if use_fused_oneshot:
                        from scann_tpu.kernels.scann_backward import (
                            fused_scann_train_grads,
                        )

                        if self._sharded_fused_train is not None:
                            pred, raw = self._sharded_fused_train(
                                state.params, batch, y, seed)
                        else:
                            pred, raw = fused_scann_train_grads(
                                state.params, batch, y, self.config.model,
                                self.model.mrelu_head, False, 0.1, seed)
                    else:
                        from scann_tpu.kernels.scann_loop import (
                            loop_scann_train_grads,
                        )

                        if self._sharded_loop_train is not None:
                            pred, raw = self._sharded_loop_train(
                                state.params, batch, y, seed)
                        else:
                            pred, raw = loop_scann_train_grads(
                                state.params, batch, y, self.config.model,
                                self.model.mrelu_head, False, 0.1, seed)
                    pred = pred if packed else pred[:, 0]
                    rmse, mae = masked_stats(pred)
                    loss = rmse + l2_penalty(state.params, l2)
                    # packed: empty segments' residuals are already zeroed
                    # in-kernel, so raw is d 0.5*sum(masked err^2) exactly
                    scale = 1.0 / (nvalid * rmse)
                    l2g = jax.grad(lambda p: l2_penalty(p, l2))(state.params)
                    grads = jax.tree.map(lambda r, g2: r * scale + g2,
                                         raw, l2g)
                else:
                    (loss, mae), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(state.params)
                updates, opt_state = tx.update(grads, state.opt_state, state.params)
                updates = jax.tree.map(lambda u: -lr * u, updates)
                params = optax.apply_updates(state.params, updates)
                return (TrainState(params=params, opt_state=opt_state,
                                   step=state.step + 1),
                        (loss, mae))

            state, (losses, maes) = jax.lax.scan(
                body, state, (idx_plan, jnp.arange(n_batches)))
            return state, {"loss": jnp.mean(losses), "mae": jnp.mean(maes)}

        @jax.jit
        def eval_epoch(params, binputs, btargets):
            """Predictions for all structures (wrap-padded tail), in order.
            Packed slots: returns [rows, SEG] — one column per segment."""
            S = btargets.shape[0]
            n_batches = -(-S // B)
            idx = jnp.arange(n_batches * B) % S
            idx_plan = idx.reshape(n_batches, B)
            packed = "segment_mask" in binputs

            def body(_, idx):
                idx = jax.lax.with_sharding_constraint(idx, bsh)
                batch = jax.tree.map(lambda x: x[idx], binputs)
                pred, _ = self.forward_eval(params, batch)
                return None, (pred if packed else pred[:, 0])

            _, preds = jax.lax.scan(body, None, idx_plan)
            out = (preds.reshape(n_batches * B, -1) if packed
                   else preds.reshape(-1))
            if is_multiprocess():
                # every process fetches the full prediction vector on the
                # host (_evaluate_buckets): replicate the output so the
                # fetch is an addressable local read, not a cross-host one
                out = jax.lax.with_sharding_constraint(out, self._repl)
            return out

        self._train_epoch = self._cache_wrap("train_epoch", train_epoch)
        self._eval_epoch = self._cache_wrap("eval_epoch", eval_epoch)

    def _get_exec_cache(self):
        d = self.config.tpu.exec_cache_dir
        if not d:
            return None
        if self._exec_cache is None:
            from scann_tpu.utils.exec_cache import ExecutableCache

            self._exec_cache = ExecutableCache(os.path.expanduser(d))
        return self._exec_cache

    def _cache_wrap(self, name: str, jitfn, steps_sig: Optional[str] = None):
        """Route a jitted epoch function through the on-disk executable
        cache (``tpu.exec_cache_dir``), so re-runs of the same
        config/shapes skip the XLA/Pallas compile entirely — the crystal
        loop kernels compile for MINUTES (>10 under co-tenant load), and
        the remote Mosaic compile bypasses JAX's own persistent cache
        (verified round 3). No-op when the knob is unset.

        Correctness: the key is (fn name, full config repr, schedule
        signature, argument avals) + the cache's env fingerprint, which
        together pin everything the traced closure baked in. A
        DISK-loaded executable is validated once on zero-filled dummies
        BEFORE it sees real arguments — train_epoch donates the train
        state, so a broken reload (e.g. AOT artifact from a different
        host) must fail on dummies it is allowed to consume, never on
        the real state. Any cache-path failure falls back to the plain
        jit call and drops the entry."""
        cache = self._get_exec_cache()
        if cache is None:
            return jitfn
        import copy

        from scann_tpu.utils.exec_cache import args_signature, zeros_like_args

        # normalize RUN-specific fields out of the key so a re-run of the
        # same recipe in a different run dir shares executables; everything
        # that could plausibly reach the trace stays in (over-keying only
        # costs a compile; under-keying would serve a wrong executable)
        c = copy.deepcopy(self.config)
        c.hyper.save_path = c.hyper.data_energy_path = ""
        c.hyper.data_nei_path = c.hyper.pretrained = ""
        c.tpu.exec_cache_dir = None
        c.tpu.observed_buckets = None
        cfg_sig = repr(c)
        # schedule-independent fns (predict) pass steps_sig="-" so a new
        # lr schedule doesn't needlessly re-key their cached executables
        if steps_sig is None:
            steps_sig = repr(self._steps_key)
        mesh_sig = repr(None if self.mesh is None else
                        (self.mesh.shape, self.mesh.axis_names))
        validated = set()
        poisoned = set()  # keys whose cache path failed once this process

        def call(*args):
            key = "|".join([name, cfg_sig, steps_sig, mesh_sig,
                            args_signature(args)])
            if key in poisoned:
                # e.g. a host whose XLA:CPU AOT loader rejects its own
                # artifacts: don't re-pay load+validate+compile every epoch
                return jitfn(*args)
            fn = None
            try:
                got, src = cache.get_or_compile_info(key, jitfn, *args)
                if src == "disk" and key not in validated:
                    jax.block_until_ready(got(*zeros_like_args(args)))
                validated.add(key)
                fn = got
            except Exception:
                cache.invalidate(key)
                poisoned.add(key)
            if fn is None:
                return jitfn(*args)  # genuine errors surface as jit's would
            return fn(*args)

        return call

    # --- device-resident data ------------------------------------------------

    def _put_buckets(self, buckets: List[PackedBucket], tag: str,
                     ladder_pad: bool = False):
        """Push bucket arrays to device (replicated) once; cache by identity.

        The cached entry keeps a reference to the bucket: without it, a
        GC'd bucket's id() could be recycled by a NEW dataset's bucket and
        the cache would silently serve the old dataset's device arrays.
        Entries for a tag are evicted when that tag is re-put with
        different buckets, so swapping datasets frees the old HBM copies.

        ``ladder_pad`` wrap-pads the ROW count (slots) up to a quantized
        ladder before the device put. The jitted eval scan specializes on
        the bucket's total row count, so without it every split's first
        eval pays its own full compile (~200 s over the shared tunnel at
        flagship shapes); with it the valid and test splits usually land
        on the same rung and share ONE compiled shape. Row order is
        preserved (pad rows wrap from the start), so callers' ``[:S]``
        trims stay correct. Never used for training buckets — pad rows
        would be trained on.

        Multi-process: every process loaded its own identical copy of the
        bucket (per-host data loading); ``put_replicated(check=True)``
        assembles the global replicated arrays and digest-checks that the
        host copies actually agree before training on them."""
        live = {(tag, id(b)) for b in buckets}
        for key in [k for k in self._device_buckets
                    if k[0] == tag and k not in live]:
            del self._device_buckets[key]
        out = []
        for b in buckets:
            key = (tag, id(b))
            if key not in self._device_buckets:
                inputs, targets = b.inputs, b.targets
                if ladder_pad:
                    from scann_tpu.api import _ladder

                    S = len(targets)
                    L = _ladder(S, max(1, self.config.hyper.batch_size))
                    if L > S:
                        idx = np.arange(L) % S
                        inputs = {k: v[idx] for k, v in inputs.items()}
                        targets = targets[idx]
                self._device_buckets[key] = (
                    b,
                    put_replicated(inputs, self._repl, check=True,
                                   what=f"{tag} bucket inputs"),
                    put_replicated(targets, self._repl, check=True,
                                   what=f"{tag} bucket targets"),
                )
            out.append(self._device_buckets[key][1:])
        return out

    # --- training ------------------------------------------------------------

    @staticmethod
    def _retry_transient(fn, *args, attempts: int = 3, log_fn=print):
        """Run ``fn(*args)``, retrying on transient remote-compile failures.

        On shared TPU hosts the compile-helper subprocess occasionally gets
        OOM-killed by OTHER tenants' compiles (observed: 'remote_compile:
        HTTP 500 ... SIGKILL'); a retry recompiles — usually successfully —
        instead of killing a long training run. Non-compile errors and
        final failures propagate."""
        import time as _time

        for attempt in range(attempts):
            try:
                return fn(*args)
            except Exception as e:
                # Only the observed compile-helper kill signatures count as
                # transient; a bare XLA 'INTERNAL' error is a real failure
                # and must surface immediately (ADVICE r2).
                msg = str(e)
                transient = "remote_compile" in msg and (
                    "SIGKILL" in msg or "HTTP 500" in msg
                    or "Connection reset" in msg or "Socket closed" in msg)
                if not transient or attempt == attempts - 1:
                    raise
                log_fn(f"transient compile failure "
                       f"({str(e).splitlines()[0][:90]}); "
                       f"retrying in 20s ({attempt + 1}/{attempts - 1})")
                _time.sleep(20)

    def fit(
        self,
        train_buckets: List[PackedBucket],
        valid_buckets: List[PackedBucket],
        epochs: Optional[int] = None,
        log_fn=print,
        resume: bool = False,
    ) -> Dict[str, list]:
        """Train; ``resume=True`` continues from the 'last' checkpoint in the
        workdir (full train state incl. optimizer — the reference has no
        resume at all, SURVEY.md §5.4)."""
        hyper = self.config.hyper
        epochs = epochs or hyper.epochs

        # batches are over SLOTS (targets rows): for the default bucketed
        # pipeline that equals num_structures; for packed slots each row
        # carries several structures (data/packing.py). With
        # tpu.pack_preserve_batch the slot batch shrinks by the packing
        # factor so every optimizer step still sees ~hyper.batch_size
        # STRUCTURES — the reference recipe's effective batch.
        slot_bs = hyper.batch_size
        n_structs = sum(b.num_structures for b in train_buckets)
        n_slots = sum(b.targets.shape[0] for b in train_buckets)
        if (n_structs > n_slots
                and getattr(self.config.tpu, "pack_preserve_batch", True)):
            from scann_tpu.data.packing import packed_slot_batch

            slot_bs = packed_slot_batch(hyper.batch_size, n_slots, n_structs,
                                        len(self.mesh.devices.flat))
        self._slot_batch = slot_bs
        steps_per_epoch = sum(
            -(-b.targets.shape[0] // slot_bs) for b in train_buckets
        )
        sgdr = None
        if hyper.scheduler == "sgdr":
            sgdr = SGDRSchedule(lr_max=hyper.lr, lr_min=hyper.min_lr)
            self._lr_fn = None
        else:
            self._lr_fn = make_cosine_lr(hyper.lr, hyper.min_lr, steps_per_epoch,
                                         epochs, hyper.adam_decay)

        steps_key = (hyper.scheduler, hyper.lr, hyper.min_lr,
                     hyper.adam_decay, slot_bs, steps_per_epoch,
                     epochs)
        if self._train_epoch is None or self._steps_key != steps_key:
            self._make_steps(steps_key)
        if self.state is None:
            self.init_state(
                {k: v[:1] for k, v in train_buckets[0].inputs.items()}, hyper.seed
            )

        # device-validate fused batch tiles eagerly, before any jit tracing
        # (eval_epoch batches at the same slot batch as training)
        self._preresolve_tiles(train_buckets, training=True,
                               batch_size=slot_bs)
        self._preresolve_tiles(list(train_buckets) + list(valid_buckets),
                               training=False, batch_size=slot_bs)

        dev_train = self._put_buckets(train_buckets, "train")
        dev_valid = self._put_buckets(valid_buckets, "valid",
                                      ladder_pad=True)

        os.makedirs(self.workdir, exist_ok=True)
        # record the data's padded (M, N) bucket shapes: serving pre-compiles
        # these rungs by default (cli/serve.py), so a freshly trained model
        # comes up without first-request XLA compile stalls
        self.config.tpu.observed_buckets = [
            list(s) for s in sorted({
                (int(b.inputs["neighbors"].shape[1]),
                 int(b.inputs["neighbors"].shape[2]))
                for b in list(train_buckets) + list(valid_buckets)})]
        from scann_tpu.config import save_config
        if is_primary():  # exactly-once artifact on multi-process runs
            save_config(self.config, os.path.join(self.workdir, "config.yaml"))

        history = {"loss": [], "mae": [], "val_mae": [], "val_r2": [], "lr": [],
                   "epoch_time": []}
        best_val = math.inf
        best_epoch = -1
        start_epoch = 0
        patience = hyper.patience
        metrics_path = os.path.join(self.workdir, "metrics.jsonl")

        if resume:
            last = os.path.join(self.workdir, "checkpoints", "last")
            if os.path.exists(last):
                meta = self.restore_checkpoint("last")
                start_epoch = int(np.asarray(meta.get("epoch", -1))) + 1
                best_val = float(np.asarray(meta.get("best_val", math.inf)))
                best_epoch = int(np.asarray(meta.get("best_epoch", -1)))
                log_fn(f"resumed from epoch {start_epoch} "
                       f"(best val_mae {best_val:.5f})")
                if sgdr and start_epoch > 0:
                    if "sgdr_triggered" in meta:
                        # faithful resume: the checkpoint carries the full
                        # schedule state incl. the val-driven peak compression
                        sgdr.load_state_dict(
                            {k: np.asarray(v) for k, v in meta.items()
                             if k.startswith("sgdr_")})
                    else:
                        # legacy checkpoint without schedule state:
                        # fast-forward the warm-restart cycle (approximation)
                        sgdr.triggered = True
                        for _ in range(start_epoch):
                            sgdr.epoch_begin()

        # per-epoch RNG is derived from (seed, epoch, bucket) alone — never
        # from the split sequence — so a resumed run replays exactly the
        # batches/dropout an uninterrupted run would have used
        base_rng = jax.random.PRNGKey(hyper.seed)
        step = int(self.state.step)

        n_train = sum(b.num_structures for b in train_buckets)
        for epoch in range(start_epoch, epochs):
            t0 = time.perf_counter()
            epoch_lr = sgdr.epoch_begin() if sgdr else 0.0
            losses, maes = [], []
            for bi, (binputs, btargets) in enumerate(dev_train):
                sub = jax.random.fold_in(base_rng,
                                         epoch * len(dev_train) + bi)
                self.state, m = self._retry_transient(
                    self._train_epoch, self.state, binputs, btargets, sub,
                    jnp.asarray(epoch_lr, jnp.float32), log_fn=log_fn)
                losses.append(m["loss"])
                maes.append(m["mae"])
                step += -(-btargets.shape[0] // slot_bs)

            train_loss = float(np.mean([np.asarray(x) for x in losses]))
            train_mae = float(np.mean([np.asarray(x) for x in maes]))

            val_mae, val_r2, _, _ = self._evaluate_buckets(valid_buckets, dev_valid)
            dt = time.perf_counter() - t0
            lr_now = float(epoch_lr if sgdr else self._lr_fn(step))
            if sgdr:
                sgdr.epoch_end(val_mae)

            history["loss"].append(train_loss)
            history["mae"].append(train_mae)
            history["val_mae"].append(val_mae)
            history["val_r2"].append(val_r2)
            history["lr"].append(lr_now)
            history["epoch_time"].append(dt)

            rec = {"epoch": epoch, "loss": train_loss, "mae": train_mae,
                   "val_mae": val_mae, "val_r2": val_r2, "lr": lr_now,
                   "time_s": round(dt, 3),
                   "structures_per_sec": round(n_train / dt, 1)}
            if is_primary():
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
            log_fn(f"epoch {epoch}: loss {train_loss:.5f} mae {train_mae:.5f} "
                   f"val_mae {val_mae:.5f} val_r2 {val_r2:.4f} lr {lr_now:.2e} "
                   f"({rec['structures_per_sec']:.0f} structs/s)")

            if val_mae < best_val:
                best_val = val_mae
                best_epoch = epoch
                self.save_checkpoint("best")
            meta = {"epoch": epoch, "best_val": best_val,
                    "best_epoch": best_epoch}
            if sgdr:
                meta.update(sgdr.state_dict())  # faithful SGDR resume
            self.save_checkpoint("last", meta=meta)
            if epoch - best_epoch >= patience:
                log_fn(f"early stopping at epoch {epoch} "
                       f"(no val_mae improvement for {patience} epochs)")
                break

        self.history = history
        return history

    def _evaluate_buckets(self, buckets: List[PackedBucket], dev_buckets):
        preds, ys = [], []
        for b, (binputs, btargets) in zip(buckets, dev_buckets):
            p = np.asarray(self._retry_transient(
                self._eval_epoch, self.state.params, binputs, btargets))
            if "segment_mask" in b.inputs:
                # packed slots: keep only valid segments, per structure
                valid = np.asarray(b.indices) >= 0
                preds.append(p[: len(b.targets)][valid])
                ys.append(np.asarray(b.targets)[valid])
            else:
                preds.append(p[: b.num_structures])  # trim wrap-padded tail
                ys.append(b.targets)
        pred = np.concatenate(preds)
        y = np.concatenate(ys)
        mae = float(np.mean(np.abs(pred - y)))
        return mae, r2_score(y, pred), pred, y

    # --- evaluation / prediction --------------------------------------------

    def evaluate(self, test_buckets: List[PackedBucket], report: bool = True):
        """Test-set evaluation; writes report.txt + hist_data.json like the
        reference's ``evaluate`` (``scann_model.py:247-313``)."""
        if self._eval_epoch is None:
            self._make_steps()
        # the traced eval_epoch batches at the slot batch fit() resolved
        self._preresolve_tiles(test_buckets, training=False,
                               batch_size=getattr(self, "_slot_batch", None))
        dev = self._put_buckets(test_buckets, "test", ladder_pad=True)
        mae, r2, pred, y = self._evaluate_buckets(test_buckets, dev)
        std = self.config.hyper.target_std
        mean = self.config.hyper.target_mean
        result = {
            "test_mae": mae * std,
            "test_r2": r2,
            "target": self.config.hyper.target,
        }
        if report and is_primary():
            os.makedirs(self.workdir, exist_ok=True)
            with open(os.path.join(self.workdir, "report.txt"), "w") as f:
                if hasattr(self, "history"):
                    f.write("Training MAE: " + str(min(self.history["mae"]) * std) + "\n")
                    f.write("Val MAE: " + str(min(self.history["val_mae"]) * std) + "\n")
                f.write(f"Test MAE: {result['test_mae']}, Test R2: {result['test_r2']}")
            hist = {
                "y_predict": (pred * std + mean).tolist(),
                "y_true": (y * std + mean).tolist(),
                "history": getattr(self, "history", {}),
            }
            with open(os.path.join(self.workdir, "hist_data.json"), "w") as f:
                json.dump(hist, f)
        return result

    def predict(self, buckets: List[PackedBucket], batch_size: Optional[int] = None,
                with_ga: bool = False):
        """Predict (un-standardized) targets for packed structures, in the
        original dataset order; optionally also per-atom GA scores.

        Serving-path notes: the final partial batch of each bucket is padded
        up to ``batch_size`` (one compiled shape per bucket instead of two),
        and GA scores are gathered bucket-at-a-time with numpy split instead
        of a per-structure Python loop (this is the path ``predict_model``
        runs over 130k structures).

        Works for any subset of buckets: results come back in ascending
        order of the structures' ORIGINAL dataset indices (for the full
        dataset that is simply dataset order)."""
        bs = batch_size or self.config.hyper.batch_size
        self._preresolve_tiles(buckets, training=False, batch_size=bs)

        # ONE jit object per Trainer: a fresh jit per call would recompile
        # the forward for every bucket shape on every predict() invocation
        if self._predict_fwd is None:
            def fwd(params, batch):
                pred, ga = self.forward_eval(params, batch)
                return pred, ga[..., 0]  # pred [bs, 1] or [bs, SEG] (packed)

            self._predict_fwd = self._cache_wrap("predict_fwd", jax.jit(fwd),
                                                 steps_sig="-")
        fwd = self._predict_fwd

        bucket_indices = bucket_structure_indices

        # map original dataset indices -> compact output positions, so a
        # proper SUBSET of buckets (e.g. test_buckets) scatters correctly
        all_orig = np.concatenate([bucket_indices(b) for b in buckets])
        sorted_orig = np.sort(all_orig)
        if len(np.unique(sorted_orig)) != len(sorted_orig):
            raise ValueError("buckets contain duplicate structure indices")
        n_total = len(sorted_orig)
        preds = np.zeros(n_total, np.float32)
        gas: Dict[int, np.ndarray] = {}
        for b in buckets:
            packed = "segment_mask" in b.inputs
            S = len(b.targets) if packed else b.num_structures  # rows = slots
            bucket_preds = []
            bucket_gas = []
            for s0 in range(0, S, bs):
                end = min(s0 + bs, S)
                idx = np.arange(s0, s0 + bs) % S  # wrap-pad the tail batch
                batch = {k: v[idx] for k, v in b.inputs.items()}
                p, ga = fwd(self.state.params, batch)
                bucket_preds.append(np.asarray(p)[: end - s0])
                if with_ga:
                    bucket_gas.append(np.asarray(ga)[: end - s0])
            pos = np.searchsorted(sorted_orig, bucket_indices(b))
            p_all = np.concatenate(bucket_preds)          # [S, 1 or SEG]
            if packed:
                valid = np.asarray(b.indices) >= 0
                preds[pos] = p_all[valid]  # (slot, segment) order == pos order
            else:
                preds[pos] = p_all[:, 0]
            if with_ga:
                ga_all = np.concatenate(bucket_gas)               # [S, M]
                if packed:
                    # vectorized per-structure row extraction: member[j] is
                    # structure j's row mask within its slot (row-major order
                    # == its contiguous offset..offset+na rows)
                    onehot = b.inputs["segment_onehot"]
                    sl, sg = np.nonzero(valid)
                    member = onehot[sl, :, sg] > 0            # [n, M]
                    parts = np.split(ga_all[sl][member],
                                     np.cumsum(member.sum(1))[:-1])
                    for j, pj in enumerate(pos):
                        gas[int(pj)] = parts[j]
                else:
                    na = b.inputs["atom_mask"][:S, :, 0].sum(-1).astype(int)
                    for j, pj in enumerate(pos):
                        gas[int(pj)] = ga_all[j, : na[j]]  # view, no copy
        std, mean = self.config.hyper.target_std, self.config.hyper.target_mean
        preds = preds * std + mean
        if with_ga:
            return preds, [gas[i] for i in range(n_total)]
        return preds

    # --- checkpointing -------------------------------------------------------

    def save_checkpoint(self, name: str = "best", meta: Optional[dict] = None):
        import orbax.checkpoint as ocp

        payload = {"params": self.state.params,
                   "opt_state": self.state.opt_state,
                   "step": self.state.step}
        if is_multiprocess():
            # orbax's Checkpointer runs multi-host barriers whenever
            # jax.process_count() > 1, so EVERY process must call save()
            # (a primary-only call deadlocks on the barrier). The train
            # state is fully replicated -> materialize identical host-numpy
            # copies everywhere; orbax's primary-host logic writes once.
            payload = fetch(payload)
            if meta:
                payload["meta"] = {k: np.asarray(v) for k, v in meta.items()}
        elif meta:
            payload["meta"] = {k: jnp.asarray(v) for k, v in meta.items()}
        path = os.path.abspath(os.path.join(self.workdir, "checkpoints", name))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()

    def restore_checkpoint(self, name: str = "best") -> dict:
        """Restore train state; returns the checkpoint's meta dict (epoch,
        best_val, ... for 'last' checkpoints; empty otherwise)."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.workdir, "checkpoints", name))
        if self.state is None:
            raise RuntimeError("call init_state (or fit) before restore: the "
                               "checkpoint structure is taken from live state")
        ckptr = ocp.StandardCheckpointer()
        target = {"params": self.state.params, "opt_state": self.state.opt_state,
                  "step": self.state.step}
        zeros = jnp.zeros
        if is_multiprocess():
            # multi-host checkpoints are saved as host-numpy from every
            # process (save_checkpoint); restore symmetrically: every
            # process restores into a host-numpy target (all participate
            # in orbax's barriers), then re-replicates below. Requires the
            # workdir on a filesystem all hosts can read (DEPLOYMENT.md).
            target = fetch(target)
            zeros = np.zeros
        base_meta = {"epoch": zeros((), jnp.int32),
                     "best_val": zeros((), jnp.float32),
                     "best_epoch": zeros((), jnp.int32)}
        sgdr_meta = {f"sgdr_{f}": zeros((), jnp.float32)
                     for f in ("triggered", "lr", "lr_warmup_current",
                               "lr_warmup_next", "ti", "tcur", "best_val_mae")}
        restored = None
        # 'last' checkpoints carry a meta block (with SGDR schedule state on
        # sgdr runs); 'best' and legacy checkpoints may not — try richest first
        for meta_t in (dict(base_meta, **sgdr_meta), base_meta, None):
            try:
                restored = ckptr.restore(
                    path, target if meta_t is None else dict(target, meta=meta_t))
                break
            except Exception:
                continue
        if restored is None:
            restored = ckptr.restore(path, target)
        self.state = TrainState(
            params=put_replicated(restored["params"], self._repl),
            opt_state=put_replicated(restored["opt_state"], self._repl),
            step=put_replicated(restored["step"], self._repl))
        return restored.get("meta", {})


