"""Persistent compiled-executable cache for the serving forward.

Serving cold start is dominated by XLA/Pallas compiles: every ladder rung
the process serves pays ~45 s over the remote tunnel, and a full bucket
warmup was measured at 112-1192 s per process (NEXT.md) depending on other
tenants' load. JAX's persistent compilation cache
(``JAX_COMPILATION_CACHE_DIR``) does NOT cover this deployment: the remote
Mosaic compile bypasses it (verified round 3), so every fresh serving
process recompiles everything.

This module caches the COMPILED EXECUTABLE itself via
``jax.experimental.serialize_executable`` (pickled PjRt executable +
in/out pytree defs). A warmed serving process serializes each rung's
executable to ``{cache_dir}/{key}.jexec``; later processes
``deserialize_and_load`` in milliseconds-to-seconds instead of recompiling
for minutes. Correctness guards:

- the cache key mixes the caller's logical key (model-config/params/shape
  signature) with an environment fingerprint (jax version, backend,
  device kind, device count), so an executable is never loaded onto a
  different backend/topology than it was built for;
- ``get_or_compile`` falls back to a fresh ``jit.lower().compile()`` on
  ANY load failure (missing file, version skew, a backend that cannot
  deserialize) and then best-effort saves — the cache can only make
  things faster, never wrong or fatal;
- loaded executables are still exact-shape/dtype checked by JAX at call
  time (``Compiled`` validates avals), so a stale file for a changed
  model errors loudly rather than computing garbage — and that error is
  caught and turned into a recompile.

Backend support measured in this image: CPU round-trips cross-process
(tests/test_exec_cache.py); the axon remote-TPU plugin raises on
``serialize`` (recorded by ``stats["save_errors"]``), in which case
serving behaves exactly as before. On-host TPU runtimes with PjRt
executable serialization get the full win.

Reference context: the reference (TF/Keras, scann_model.py:165-177) has
no serving layer at all, so this subsystem has no reference counterpart;
it belongs to the TPU deployment story (docs/DEPLOYMENT.md).
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
import tempfile
import threading
from typing import Any, Callable, Dict, Optional

import jax

__all__ = ["ExecutableCache", "env_fingerprint"]


def env_fingerprint() -> str:
    """Identifies everything a serialized executable is specific to."""
    devs = jax.devices()
    return json.dumps({
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "device_kind": devs[0].device_kind,
        "n_devices": len(devs),
        # same device count under a different process layout compiles to a
        # different cross-host program — never swap those executables
        "n_processes": jax.process_count(),
    }, sort_keys=True)


def _placing_wrapper(compiled) -> Callable:
    """Place args per the executable's recorded input shardings before
    calling it.

    A freshly ``lower().compile()``-d executable accepts plain numpy args
    (jit's call path commits them), but a DESERIALIZED one executes
    directly and rejects args whose placement doesn't match its recorded
    shardings (observed on the 8-device CPU mesh: "Expected args ... to
    have 8 shards, got [1, 1]"). ``input_shardings`` mirrors the call's
    ``((args,), kwargs)`` pytree, so a leaf-wise ``device_put`` restores
    exactly the layout the executable was built for."""
    sh_flat = jax.tree_util.tree_leaves(compiled.input_shardings)

    def call(*args, **kwargs):
        flat, tree = jax.tree_util.tree_flatten((args, kwargs))
        placed = [jax.device_put(a, s) for a, s in zip(flat, sh_flat)]
        args2, kwargs2 = jax.tree_util.tree_unflatten(tree, placed)
        return compiled(*args2, **kwargs2)

    return call


class ExecutableCache:
    """Disk + in-memory cache of compiled JAX executables.

    ``get_or_compile(key, jitfn, *args)`` returns a callable with the same
    signature as ``jitfn`` for exactly the shapes/dtypes of ``*args``:

    1. in-memory hit: the executable this process already has;
    2. disk hit: ``deserialize_and_load`` of a previous process's compile;
    3. miss: ``jitfn.lower(*args).compile()``, then best-effort serialize
       to disk for the next process.

    Thread-safe; per-key locking so concurrent first callers of the same
    shape compile once (the same guarantee ``Scann._get_serve_fwd`` gives
    the plain jit path). ``stats`` counts hits/misses/load_errors/
    save_errors for observability and tests.
    """

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir
        # 0o700: entries are loaded with pickle, so any writer to this dir
        # gains code execution in every process that shares it (inherent to
        # jax serialize_executable). Restrict to the service user; the trust
        # boundary is documented in docs/DEPLOYMENT.md. mode= only applies
        # to dirs makedirs creates — a pre-existing dir keeps its perms.
        os.makedirs(cache_dir, mode=0o700, exist_ok=True)
        self._mem: Dict[str, Callable] = {}
        # keys whose executable has survived one successful call. Freshly
        # compiled entries are trusted by construction; DISK-loaded ones are
        # not until the caller reports a good call via mark_validated() —
        # see get_or_compile_info's src contract.
        self._validated: set = set()
        self._lock = threading.Lock()
        self._key_locks: Dict[str, threading.Lock] = {}
        self.stats = {"mem_hits": 0, "disk_hits": 0, "compiles": 0,
                      "load_errors": 0, "save_errors": 0, "invalidated": 0}

    def _path(self, key: str) -> str:
        h = hashlib.sha256(
            (key + "\x00" + env_fingerprint()).encode()).hexdigest()[:32]
        return os.path.join(self.cache_dir, f"{h}.jexec")

    def _key_lock(self, key: str) -> threading.Lock:
        with self._lock:
            return self._key_locks.setdefault(key, threading.Lock())

    def get_or_compile(self, key: str, jitfn, *args) -> Callable:
        return self.get_or_compile_info(key, jitfn, *args)[0]

    def get_or_compile_info(self, key: str, jitfn, *args):
        """Like ``get_or_compile`` but also returns where the executable
        came from: ``"mem"`` | ``"disk"`` | ``"compile"`` — callers that
        donate buffers use this to validate disk loads on dummy inputs
        before trusting them with real state.

        ``"mem"`` means *validated in this process*: freshly compiled, or a
        disk load whose first call the caller reported good via
        ``mark_validated``. A disk-loaded executable that has been inserted
        into the in-memory map but NOT yet validated is returned as
        ``"disk"`` again — so a concurrent second caller also takes the
        guarded path instead of trusting an entry whose first call hasn't
        succeeded yet (round-4 advisor finding)."""
        with self._key_lock(key):
            with self._lock:
                fn = self._mem.get(key)
                if fn is not None:
                    validated = key in self._validated
            if fn is not None:
                # stats follow the src contract: an unvalidated disk load
                # served from memory still IS the guarded disk path
                self.stats["mem_hits" if validated else "disk_hits"] += 1
                return fn, ("mem" if validated else "disk")
            src = "disk"
            fn = self._load(key)
            if fn is None:
                src = "compile"
                self.stats["compiles"] += 1
                fn = jitfn.lower(*args).compile()
                self._save(key, fn)
            with self._lock:
                self._mem[key] = fn
                if src == "compile":
                    self._validated.add(key)
            return fn, src

    def mark_validated(self, key: str) -> None:
        """Record that a disk-loaded executable's call succeeded, promoting
        it to the trusted (``"mem"``) state for later callers."""
        with self._lock:
            if key in self._mem:
                self._validated.add(key)

    def invalidate(self, key: str) -> None:
        """Drop a key from memory and disk — called when a loaded
        executable fails at call time (stale model, an AOT artifact this
        host cannot execute), so later calls recompile instead of
        re-failing."""
        with self._lock:
            self._mem.pop(key, None)
            self._validated.discard(key)
        self.stats["invalidated"] += 1
        try:
            os.remove(self._path(key))
        except OSError:
            pass

    def _load(self, key: str) -> Optional[Callable]:
        path = self._path(key)
        if not os.path.exists(path):
            return None
        try:
            from jax.experimental.serialize_executable import (
                deserialize_and_load)

            with open(path, "rb") as f:
                payload, in_tree, out_tree, dev_ids = pickle.load(f)
            # load onto exactly the devices the executable was built for:
            # the default (all local devices) mis-loads a single-device
            # executable as an N-way sharded one when more devices are
            # visible (observed on the 8-device CPU mesh)
            devices = None
            if dev_ids:
                by_id = {d.id: d for d in jax.devices()}
                devices = [by_id[i] for i in dev_ids]
            fn = deserialize_and_load(payload, in_tree, out_tree,
                                      execution_devices=devices)
            self.stats["disk_hits"] += 1
            return _placing_wrapper(fn)
        except Exception:
            # corrupt file / jax version skew / backend without executable
            # deserialization: recompile instead, and drop the bad entry so
            # the next process doesn't pay the failed-load attempt again
            self.stats["load_errors"] += 1
            try:
                os.remove(path)
            except OSError:
                pass
            return None

    def _save(self, key: str, compiled) -> None:
        try:
            from jax.experimental.serialize_executable import serialize

            payload, in_tree, out_tree = serialize(compiled)
            # the devices this executable actually spans (its input
            # shardings' device set) — needed at load time, see _load
            dev_ids = sorted({d.id for s in jax.tree_util.tree_leaves(
                compiled.input_shardings) for d in s.device_set}) or None
            # atomic publish: concurrent warming processes may race on the
            # same rung; a rename is atomic on POSIX so readers never see a
            # half-written pickle
            fd, tmp = tempfile.mkstemp(dir=self.cache_dir, suffix=".tmp")
            try:
                with os.fdopen(fd, "wb") as f:
                    pickle.dump((payload, in_tree, out_tree, dev_ids), f)
                os.replace(tmp, self._path(key))
            except BaseException:
                os.remove(tmp)
                raise
        except Exception:
            # backends without serialization support (e.g. the axon remote
            # plugin) land here: serving works exactly as without the cache
            self.stats["save_errors"] += 1


def batch_signature(batch: Dict[str, Any]) -> str:
    """Stable signature of a serving batch's shapes+dtypes (the part of
    the executable identity that varies per ladder rung)."""
    return json.dumps(
        {k: (tuple(v.shape), str(v.dtype)) for k, v in sorted(batch.items())},
        sort_keys=True)


def args_signature(args) -> str:
    """Stable signature of an arbitrary argument pytree: tree structure +
    per-leaf (shape, dtype) — the call-shape part of an executable's cache
    identity (e.g. the Trainer's (state, inputs, targets, rng, lr))."""
    leaves, tree = jax.tree_util.tree_flatten(args)
    sig = [(str(getattr(l, "shape", ())), str(getattr(l, "dtype", type(l))))
           for l in leaves]
    return json.dumps([str(tree), sig])


def zeros_like_args(args):
    """Dummy arguments with the same pytree/shapes/dtypes as ``args`` —
    used to validate a disk-loaded executable BEFORE it is trusted with
    (and donates) real state."""
    import numpy as np

    return jax.tree_util.tree_map(
        lambda a: (np.zeros(a.shape, a.dtype)
                   if hasattr(a, "shape") and hasattr(a, "dtype") else a),
        args)
