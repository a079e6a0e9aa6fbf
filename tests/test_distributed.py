"""Multi-process (multi-host) data parallelism.

The one SURVEY.md surface with no reference counterpart at all
(§2.2/§7 step 5): a real pod runs one process per host. These tests run
the REAL Trainer through ``scann_tpu.parallel.distributed`` on a
2-process x 4-device CPU mesh (subprocesses, gloo collectives) and assert
the training trajectory matches the single-process 8-device run — the
same guarantee the single-host mesh tests give for 1 device vs 8.

The in-process tests below cover the pure-python pieces (env resolution,
digest checking, fetch contracts) without spawning subprocesses.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(specs, timeout=900):
    """Launch one subprocess per spec dict; wait; return parsed outputs."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the parent pytest process pinned JAX_PLATFORMS/XLA_FLAGS for ITS
    # backend; workers set their own
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = []
    for spec in specs:
        cmd = [sys.executable, WORKER]
        for k, v in spec.items():
            cmd += [f"--{k}", str(v)]
        procs.append((spec, subprocess.Popen(
            cmd, cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)))
    outs = []
    for spec, p in procs:
        try:
            stdout, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
            raise AssertionError(
                f"worker {spec} timed out; output:\n{stdout[-4000:]}")
        assert p.returncode == 0, (
            f"worker {spec} failed (rc={p.returncode}); "
            f"output:\n{stdout[-4000:]}")
        with open(spec["out"]) as f:
            outs.append(json.load(f))
    return outs


@pytest.mark.slow
def test_two_process_trajectory_matches_single_process(tmp_path):
    """2 processes x 4 CPU devices == 1 process x 8 CPU devices: identical
    global mesh, identical program, so the 2-epoch loss/mae/val_mae
    trajectory and final params must agree to float tolerance; primary-only
    artifacts (report.txt, checkpoints) appear exactly once."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    wd_multi = tmp_path / "multi"
    multi = _run_workers([
        {"process-id": i, "num-processes": 2, "coordinator": coord,
         "devices": 4, "workdir": str(wd_multi),
         "out": str(tmp_path / f"mp{i}.json")}
        for i in range(2)
    ])
    single = _run_workers([
        {"process-id": 0, "num-processes": 1, "devices": 8,
         "workdir": str(tmp_path / "single"),
         "out": str(tmp_path / "sp.json")}
    ])[0]

    for w in multi:
        assert w["process_count"] == 2
        assert w["n_global_devices"] == 8
    assert single["process_count"] == 1
    assert single["n_global_devices"] == 8

    # both multi-process workers computed identical (replicated) metrics
    np.testing.assert_allclose(multi[0]["loss"], multi[1]["loss"], rtol=0)
    np.testing.assert_allclose(multi[0]["val_mae"], multi[1]["val_mae"],
                               rtol=0)

    # ... and the trajectory equals the single-process 8-device run
    for key in ("loss", "mae", "val_mae"):
        np.testing.assert_allclose(multi[0][key], single[key], rtol=1e-5,
                                   err_msg=key)
    np.testing.assert_allclose(multi[0]["test_mae"], single["test_mae"],
                               rtol=1e-5)
    np.testing.assert_allclose(multi[0]["params_abs_sum"],
                               single["params_abs_sum"], rtol=1e-5)

    # exactly-once side effects: process 0 wrote them, process 1 did not
    # write its own copies anywhere else (shared workdir on one machine)
    prim = [w for w in multi if w["is_primary"]]
    assert len(prim) == 1 and prim[0]["process_id"] == 0
    assert all(w["report_exists"] and w["ckpt_exists"] for w in multi)


class TestDistributedHelpers:
    def test_initialize_noop_without_env(self, monkeypatch):
        from scann_tpu.parallel import distributed

        for var in ("SCANN_TPU_COORDINATOR", "SCANN_TPU_NUM_PROCESSES",
                    "SCANN_TPU_PROCESS_ID", "SCANN_TPU_DISTRIBUTED"):
            monkeypatch.delenv(var, raising=False)
        assert distributed.initialize() is False

    def test_initialize_idempotent_when_client_exists(self, monkeypatch):
        from jax._src import distributed as jdist

        from scann_tpu.parallel import distributed

        monkeypatch.setattr(jdist.global_state, "client", object(),
                            raising=False)
        # would raise if it tried to re-initialize against a fake client
        assert distributed.initialize() is True

    def test_single_process_helpers(self):
        from scann_tpu.parallel import (
            is_multiprocess,
            is_primary,
            process_count,
            process_index,
        )

        assert process_count() == 1 and process_index() == 0
        assert not is_multiprocess() and is_primary()

    def test_put_replicated_single_process_is_device_put(self):
        import jax

        from scann_tpu.parallel import make_mesh, put_replicated, replicated_sharding

        mesh = make_mesh(n_devices=8)
        tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
                "b": np.float32(3.0)}
        out = put_replicated(tree, replicated_sharding(mesh), check=True)
        assert out["a"].sharding.is_fully_replicated
        np.testing.assert_array_equal(np.asarray(out["a"]), tree["a"])
        assert isinstance(out["b"], jax.Array)

    def test_fetch_roundtrip(self):
        from scann_tpu.parallel import (
            fetch,
            make_mesh,
            put_replicated,
            replicated_sharding,
        )

        mesh = make_mesh(n_devices=8)
        tree = {"x": np.arange(4, dtype=np.float32)}
        host = fetch(put_replicated(tree, replicated_sharding(mesh)))
        np.testing.assert_array_equal(host["x"], tree["x"])

    def test_tree_digest_detects_divergence(self):
        from scann_tpu.parallel.distributed import _tree_digest

        a = {"x": np.arange(8, dtype=np.float32), "y": np.int32(2)}
        b = {"x": np.arange(8, dtype=np.float32), "y": np.int32(2)}
        assert _tree_digest(a) == _tree_digest(b)
        b["x"] = b["x"].copy()
        b["x"][3] += 1e-6  # tiny value change must re-digest
        assert _tree_digest(a) != _tree_digest(b)
        # dtype/shape changes too, even with equal bytes
        c = {"x": np.arange(8, dtype=np.float32).reshape(2, 4),
             "y": np.int32(2)}
        assert _tree_digest(a) != _tree_digest(c)

    def test_hierarchical_order_is_process_aware(self):
        from scann_tpu.parallel import hierarchical_order

        class D:
            def __init__(self, id, process_index, slice_index=None):
                self.id = id
                self.process_index = process_index
                if slice_index is not None:
                    self.slice_index = slice_index

        # interleaved process ownership comes back process-contiguous
        devs = [D(0, 0), D(1, 1), D(2, 0), D(3, 1)]
        out = hierarchical_order(devs)
        assert [d.id for d in out] == [0, 2, 1, 3]
        # slice-major still dominates process order
        devs = [D(0, 2, slice_index=1), D(1, 3, slice_index=1),
                D(2, 0, slice_index=0), D(3, 1, slice_index=0)]
        out = hierarchical_order(devs)
        assert [d.id for d in out] == [2, 3, 0, 1]
