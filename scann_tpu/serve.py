"""Production serving: request-coalescing batched inference over HTTP.

The reference has no serving story (inference = one-off CLI scripts,
``predict_files.py`` / ``predict_model.py``); this module completes the
deployment path for the TPU framework:

- ``BatchedPredictor`` — a thread-safe front end over a trained run dir.
  Concurrent callers enqueue structures; a single worker thread coalesces
  everything queued within a short window into one shape-grouped batch and
  runs it through ``Scann.predict_structures`` (fused forward, one kernel
  launch per padded shape group). This turns many small concurrent requests
  into large MXU-friendly batches — the right shape for TPU serving.
- ``PredictionServer`` — a stdlib ``ThreadingHTTPServer`` wrapper:

      POST /predict   {"structures": [{"species": [...], "coords": [[...]],
                                       "lattice": [[...]] | null}, ...]}
                      (species = element symbols or atomic numbers; invalid
                       structures — unknown elements, length mismatches,
                       non-finite values — are rejected with a 400)
                   or a raw (multi-)xyz body with Content-Type text/plain
      GET  /healthz   liveness + model metadata

  Response: {"predictions": [...], "ga_scores": [[...], ...],
             "target": "...", "batch_size": N}

CLI: ``python -m scann_tpu.cli.serve <model_dir> [--port 8421]``.
"""

from __future__ import annotations

import json
import queue
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Tuple

import numpy as np

from scann_tpu.data.structure import Structure


class Overloaded(RuntimeError):
    """The pending-request queue is full (HTTP 503 at the server layer)."""


@dataclass
class _Request:
    structs: List[Structure]
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[List[Tuple[float, np.ndarray]]] = None
    error: Optional[Exception] = None


class BatchedPredictor:
    """Coalesces concurrent prediction requests into device batches.

    ``max_batch`` bounds structures per device batch; ``window_ms`` is how
    long the worker waits to accumulate more requests after the first one
    arrives (latency/throughput knob; 0 = no coalescing delay).

    ``overlap`` (default True) pipelines the two serving stages: a
    featurizer thread prepares coalesced batch k+1 (host-side Voronoi —
    the dominant serving cost) while the device thread executes batch k,
    connected by a depth-1 double buffer. Under sustained concurrent load
    the steady-state rate becomes max-of-stages instead of sum-of-stages.
    """

    def __init__(self, scann, max_batch: int = 64, window_ms: float = 5.0,
                 max_pending: int = 256, featurize_pool: int = 0,
                 owns_scann: bool = False, canonical_frame: bool = True,
                 warmup_shapes: Optional[List[Tuple[int, int]]] = None,
                 exec_cache: Optional[str] = None,
                 overlap: bool = True):
        self.scann = scann
        self.max_batch = max_batch
        self.window_ms = window_ms
        # canonicalize molecular frames before featurizing, so clients get
        # the same prediction for the same molecule in any orientation
        # (Structure.canonicalized). Default ON since round 4: the study
        # (benchmarks/canonical_frame_study.json) measured exact rotation
        # invariance at no accuracy cost — slightly better, even for
        # models trained on as-is frames. Periodic structures unaffected.
        self.canonical_frame = canonical_frame
        # owns_scann: close() also releases the Scann handle's resources
        # (the persistent featurization pool's worker processes) — set by
        # from_model_dir, where the predictor created the handle; callers
        # passing their own Scann keep responsibility for scann.close()
        self.owns_scann = owns_scann
        # >1: featurize each coalesced batch across a persistent process
        # pool (host Voronoi dominates serving latency; the pool lives on
        # the Scann handle and amortizes its spawn cost over the stream)
        self.featurize_pool = featurize_pool
        # bounded queue = backpressure: when the device can't keep up,
        # callers get an immediate Overloaded instead of unbounded latency
        self._queue: "queue.Queue[_Request]" = queue.Queue(maxsize=max_pending)
        self._deferred: Optional[_Request] = None  # worker-thread only
        self._stop = threading.Event()
        # pre-compile the serving forward for the expected (M, N) rungs
        # BEFORE accepting requests, so first clients don't pay XLA compiles
        # (measured 14.9 s cold-start p95 on TPU, benchmarks/serve_latency.json)
        # (batch_size defaults inside warmup_serving to hyper.batch_size —
        # the SAME device batch size predict_structures chunks with).
        # warmup_shapes=None (the default) warms the (M, N) bucket shapes the
        # model was TRAINED on (Trainer.fit records them into the run
        # config), so a freshly loaded model serves its own data
        # distribution compile-free; pass [] to skip warmup entirely.
        # exec_cache: persist compiled serving executables on disk so the
        # warmup below loads rungs compiled by PREVIOUS processes in ~ms
        # instead of ~45 s each ("auto" = {model_dir}/exec_cache; see
        # Scann.enable_exec_cache). Enabled BEFORE warmup on purpose.
        if exec_cache is not None:
            scann.enable_exec_cache(
                None if exec_cache in ("", "auto") else exec_cache)
        if warmup_shapes is None:
            warmup_shapes = [tuple(s) for s in
                             (scann.config.tpu.observed_buckets or [])]
        self.warmed = (scann.warmup_serving(warmup_shapes)
                       if warmup_shapes else [])
        # overlap=True (default): a two-stage pipeline — a featurizer
        # thread prepares coalesced batch k+1 (host Voronoi, the dominant
        # serving cost) while the device thread executes batch k. The
        # depth-1 handoff queue is the double buffer; its backpressure
        # propagates to _drain when the device falls behind. overlap=False
        # restores the single-thread featurize-then-execute worker.
        self.overlap = overlap
        self._workers = []
        if overlap:
            self._feat_queue: "queue.Queue" = queue.Queue(maxsize=1)
            self._workers = [
                threading.Thread(target=self._run_featurizer, daemon=True),
                threading.Thread(target=self._run_device, daemon=True),
            ]
        else:
            self._workers = [threading.Thread(target=self._run, daemon=True)]
        for w in self._workers:
            w.start()

    @classmethod
    def from_model_dir(cls, model_dir: str, **kw) -> "BatchedPredictor":
        from scann_tpu.api import Scann

        return cls(Scann.load_model_infer(model_dir), owns_scann=True, **kw)

    # --- client side -----------------------------------------------------

    def predict(self, structs: List[Structure], timeout: float = 120.0):
        """Blocking: returns [(value, ga_scores)] for the given structures.

        Raises ``Overloaded`` immediately when the pending queue is full."""
        req = _Request(structs=structs)
        try:
            self._queue.put_nowait(req)
        except queue.Full:
            raise Overloaded(
                f"{self._queue.maxsize} requests already pending")
        if not req.event.wait(timeout):
            raise TimeoutError("prediction timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def close(self):
        self._stop.set()
        for w in self._workers:
            w.join(timeout=5)
        # fail fast anything still in flight: requests sitting in the
        # coalescing queue, and (overlap mode) a featurized batch parked in
        # the double buffer whose device pass never ran — otherwise their
        # clients block for the full predict() timeout
        stranded: List[_Request] = []
        if self.overlap:
            try:
                while True:
                    reqs, _, _ = self._feat_queue.get_nowait()
                    stranded.extend(reqs)
            except queue.Empty:
                pass
        try:
            while True:
                stranded.append(self._queue.get_nowait())
        except queue.Empty:
            pass
        for r in stranded:
            if not r.event.is_set():
                r.error = RuntimeError("predictor closed")
                r.event.set()
        if self.owns_scann:
            # release the persistent featurization pool on the Scann handle
            # — its spawned worker processes would outlive the predictor
            self.scann.close()

    # --- worker side -----------------------------------------------------

    def _drain(self) -> List[_Request]:
        """Block for one request, then coalesce the window's arrivals.

        ``max_batch`` is enforced: a request whose structures would overshoot
        the batch is deferred (put back) for the next cycle rather than
        appended. The coalescing window is skipped when the first request
        already fills the batch."""
        if self._deferred is not None:
            first, self._deferred = self._deferred, None
        else:
            try:
                first = self._queue.get(timeout=0.2)
            except queue.Empty:
                return []
        batch = [first]
        n = len(first.structs)
        if n >= self.max_batch:
            return batch
        deadline = threading.Event()
        deadline.wait(self.window_ms / 1000.0)
        while n < self.max_batch:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            if n + len(req.structs) > self.max_batch:
                self._deferred = req  # would overshoot: run it next cycle
                break
            batch.append(req)
            n += len(req.structs)
        return batch

    def _fallback_per_request(self, reqs):
        """One bad structure (e.g. a degenerate geometry failing Voronoi
        tessellation) must not fail every coalesced request: retry each
        request individually so only the offending one errors."""
        for r in reqs:
            try:
                r.result = self.scann.predict_structures(
                    r.structs, featurize_pool=self.featurize_pool,
                    canonical_frame=self.canonical_frame)
            except Exception as e:
                r.error = e
            r.event.set()

    def _distribute(self, reqs, results):
        pos = 0
        for r in reqs:
            r.result = results[pos:pos + len(r.structs)]
            pos += len(r.structs)
            r.event.set()

    def _run(self):
        while not self._stop.is_set():
            reqs = self._drain()
            if not reqs:
                continue
            structs = [s for r in reqs for s in r.structs]
            try:
                results = self.scann.predict_structures(
                    structs, featurize_pool=self.featurize_pool,
                    canonical_frame=self.canonical_frame)
            except Exception:
                self._fallback_per_request(reqs)
                continue
            self._distribute(reqs, results)

    # --- overlap pipeline --------------------------------------------------

    def _run_featurizer(self):
        """Stage 1: coalesce + host featurization, handed to the device
        thread through the depth-1 double buffer."""
        while not self._stop.is_set():
            reqs = self._drain()
            if not reqs:
                continue
            structs = [s for r in reqs for s in r.structs]
            try:
                structs, inputs = self.scann.featurize_structures(
                    structs, featurize_pool=self.featurize_pool,
                    canonical_frame=self.canonical_frame)
            except Exception:
                self._fallback_per_request(reqs)
                continue
            handed_off = False
            while not self._stop.is_set():
                try:
                    self._feat_queue.put((reqs, structs, inputs), timeout=0.2)
                    handed_off = True
                    break
                except queue.Full:
                    continue
            if not handed_off:
                # shutdown raced the hand-off: fail the batch's requests
                # rather than stranding them (close() drains the queues,
                # but a batch held HERE is in neither queue)
                for r in reqs:
                    r.error = RuntimeError("predictor closed")
                    r.event.set()

    def _run_device(self):
        """Stage 2: device execution of pre-featurized batches."""
        while not self._stop.is_set():
            try:
                reqs, structs, inputs = self._feat_queue.get(timeout=0.2)
            except queue.Empty:
                continue
            try:
                results = self.scann.predict_featurized(structs, inputs)
            except Exception:
                # per-request retry over the ALREADY-featurized inputs:
                # featurization succeeded (and is the dominant serving
                # cost) — only the device pass needs isolating
                pos = 0
                for r in reqs:
                    n = len(r.structs)
                    try:
                        r.result = self.scann.predict_featurized(
                            structs[pos:pos + n], inputs[pos:pos + n])
                    except Exception as e:
                        r.error = e
                    pos += n
                    r.event.set()
                continue
            self._distribute(reqs, results)


def _parse_structures(body: bytes, content_type: str) -> List[Structure]:
    if "json" in (content_type or ""):
        payload = json.loads(body)
        out = []
        for s in payload["structures"]:
            lattice = s.get("lattice")
            out.append(Structure(list(s["species"]),
                                 np.asarray(s["coords"], np.float64),
                                 None if lattice is None
                                 else np.asarray(lattice, np.float64)))
        return out
    # raw (multi-)xyz text
    lines = body.decode().splitlines()
    out, i = [], 0
    while i < len(lines):
        if not lines[i].strip():
            i += 1
            continue
        n = int(lines[i].split()[0])
        out.append(Structure.from_xyz_lines(lines[i:i + 2 + n]))
        i += 2 + n
    return out


class PredictionServer:
    """HTTP front end over a BatchedPredictor (stdlib only, no deps)."""

    def __init__(self, predictor: BatchedPredictor, host: str = "127.0.0.1",
                 port: int = 8421, max_body_bytes: int = 8 * 1024 * 1024):
        self.predictor = predictor
        self.max_body_bytes = max_body_bytes
        target = predictor.scann.config.hyper.target
        body_limit = max_body_bytes

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"status": "ok", "target": target})
                else:
                    self._send(404, {"error": "unknown path"})

            def do_POST(self_handler):
                if self_handler.path != "/predict":
                    self_handler._send(404, {"error": "unknown path"})
                    return
                # Parse errors — including a malformed/negative
                # Content-Length — are the CLIENT's fault (400); everything
                # after a successful parse is server-side: overload -> 503,
                # timeout -> 504, anything else -> 500.
                try:
                    n = int(self_handler.headers.get("Content-Length", 0))
                    if n < 0:
                        raise ValueError(f"negative Content-Length {n}")
                except ValueError as e:
                    self_handler._send(400, {"error": f"bad request: {e}"})
                    return
                if n > body_limit:
                    self_handler._send(413, {
                        "error": f"request body {n} bytes exceeds "
                                 f"limit {body_limit}"})
                    return
                try:
                    structs = _parse_structures(
                        self_handler.rfile.read(n),
                        self_handler.headers.get("Content-Type", ""))
                    if not structs:
                        raise ValueError("no structures in request body")
                except Exception as e:
                    self_handler._send(400, {"error": f"bad request: {e}"})
                    return
                try:
                    results = self.predictor.predict(structs)
                    self_handler._send(200, {
                        "predictions": [float(v) for v, _ in results],
                        "ga_scores": [g.tolist() for _, g in results],
                        "target": target,
                        "batch_size": len(structs),
                    })
                except Overloaded as e:
                    self_handler._send(503, {"error": str(e)})
                except TimeoutError as e:
                    self_handler._send(504, {"error": str(e)})
                except Exception as e:
                    self_handler._send(500, {"error": str(e)})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address

    def serve_forever(self):
        print(f"scann-tpu serving on http://{self.host}:{self.port} "
              f"(POST /predict, GET /healthz)")
        self._httpd.serve_forever()

    def shutdown(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        self.predictor.close()
