import os

# Tests run on a simulated 8-device CPU mesh (SURVEY.md §4): real TPU hardware
# is single-chip in CI, and CPU keeps the suite fast and deterministic.
os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may carry the tunneled TPU
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is compile-dominated on a
# 1-core host (parity tests each jit a distinct kernel), and the CPU cache
# works across processes (unlike the remote TPU Mosaic path, NEXT.md).
# Measured: test_packed_gradients_match_unpacked 28.6s cold -> 9.6s warm.
# Opt out with SCANN_TPU_TEST_JIT_CACHE=0; point elsewhere by exporting
# JAX_COMPILATION_CACHE_DIR.
if os.environ.get("SCANN_TPU_TEST_JIT_CACHE", "1") != "0":
    _cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "scann_tpu_pytest_xla"))
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# Eager flax apply/init/grad dispatches hundreds of tiny ops — seconds of
# host latency per call on the 1-core CI host. These helpers jit them, and
# cache the jitted wrapper by the model's (fully config-printing) repr so
# equal-config models ACROSS tests share one compiled executable.
_JIT_CACHE = {}


def jit_apply(model):
    """Cached jax.jit(model.apply) for plain positional apply calls."""
    key = ("apply", repr(model))
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(model.apply)
    return _JIT_CACHE[key]


def jit_init_vars(model, key, inputs):
    """model.init under a cached jit; returns the full variables dict."""
    import jax.numpy as jnp

    inputs = {k: jnp.asarray(v) for k, v in inputs.items()}
    ck = ("init", repr(model))
    if ck not in _JIT_CACHE:
        _JIT_CACHE[ck] = jax.jit(model.init)
    return _JIT_CACHE[ck](key, inputs)


def jit_init(model, key, inputs):
    """model.init under a cached jit; returns the params pytree."""
    return jit_init_vars(model, key, inputs)["params"]


def make_synthetic_batch(rng, B=4, M=12, N=6, use_ring=False, cgcnn=False, n_atoms=10, seed=None):
    """Random but valid model inputs: ragged atom/neighbor counts with masks."""
    if seed is not None:
        rng = np.random.default_rng(seed)
    n_atoms_per = rng.integers(3, M + 1, size=B)
    atomic = np.zeros((B, M), np.int32)
    atom_mask = np.zeros((B, M, 1), np.float32)
    neighbors = np.zeros((B, M, N), np.int32)
    neighbor_mask = np.zeros((B, M, N), np.float32)
    neighbor_weight = np.zeros((B, M, N), np.float32)
    neighbor_distance = np.zeros((B, M, N), np.float32)
    for b in range(B):
        na = n_atoms_per[b]
        atomic[b, :na] = rng.integers(1, n_atoms, size=na)
        atom_mask[b, :na, 0] = 1.0
        for m in range(na):
            nn = rng.integers(1, min(N, na) + 1)
            neighbors[b, m, :nn] = rng.integers(0, na, size=nn)
            neighbor_mask[b, m, :nn] = 1.0
            neighbor_weight[b, m, :nn] = rng.uniform(0.3, 3.0, size=nn)
            neighbor_distance[b, m, :nn] = rng.uniform(0.8, 4.0, size=nn)
    inputs = {
        "atomic": atomic,
        "atom_mask": atom_mask,
        "neighbors": neighbors,
        "neighbor_mask": neighbor_mask,
        "neighbor_weight": neighbor_weight,
        "neighbor_distance": neighbor_distance,
    }
    if use_ring:
        inputs["ring_aromatic"] = (
            rng.integers(0, 2, size=(B, M, 2)).astype(np.float32) * atom_mask
        )
    if cgcnn:
        feat = np.zeros((B, M, 92), np.float32)
        for b in range(B):
            for m in range(M):
                if atom_mask[b, m, 0] > 0:
                    feat[b, m, rng.integers(0, 92, size=5)] = 1.0
        inputs["atomic"] = feat
    return inputs
