"""Batched-inference HTTP server CLI.

    python -m scann_tpu.cli.serve <model_dir> [--host 127.0.0.1]
        [--port 8421] [--max-batch 64] [--window-ms 5]

Serves a trained run dir (config.yaml + checkpoints/) over HTTP; see
``scann_tpu.serve`` for the request/response format.
"""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("model_dir", type=str,
                        help="training run dir (config.yaml + checkpoints/)")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8421)
    parser.add_argument("--max-batch", type=int, default=64)
    parser.add_argument("--window-ms", type=float, default=5.0)
    parser.add_argument("--featurize-pool", type=int, default=0,
                        help="featurize coalesced batches across N worker "
                             "processes (host Voronoi dominates serving "
                             "latency; use ~the host's core count)")
    parser.add_argument("--warmup", type=str, default="",
                        help="comma-separated MxN shapes to pre-compile "
                             "before accepting requests, e.g. '30x14,96x32' "
                             "(atoms x neighbors; quantized to the serving "
                             "shape ladder). Avoids first-request XLA "
                             "compile stalls (~45 s/shape on remote TPU). "
                             "Default: the (M, N) bucket shapes the model "
                             "was trained on (recorded in the run config)")
    parser.add_argument("--no-warmup", action="store_true",
                        help="skip startup pre-compilation entirely (first "
                             "request per shape rung pays the XLA compile)")
    parser.add_argument("--exec-cache", type=str, nargs="?", const="auto",
                        default=None, metavar="DIR",
                        help="persist compiled serving executables under DIR "
                             "(default: {model_dir}/exec_cache) so restarts "
                             "skip the per-shape XLA compile (~45 s/shape "
                             "remote, 112-1192 s full warmup measured). "
                             "Backends without executable serialization "
                             "fall back to plain compiles")
    parser.add_argument("--canonical-frame", action="store_true",
                        default=True,
                        help="rotate molecules into their principal-axes "
                             "frame before featurizing, so the same molecule "
                             "in any client orientation gets the same "
                             "prediction (the boxed-molecule featurization "
                             "is weakly frame-dependent otherwise). Default "
                             "ON (measured: exact rotation invariance at no "
                             "accuracy cost, benchmarks/"
                             "canonical_frame_study.json)")
    parser.add_argument("--no-canonical-frame", dest="canonical_frame",
                        action="store_false",
                        help="serve raw client frames (bit-compatible with "
                             "the reference's frame-dependent featurization)")
    args = parser.parse_args(argv)

    from scann_tpu.serve import BatchedPredictor, PredictionServer

    # None = auto (the trained model's recorded bucket shapes); [] = none
    warmup_shapes = [] if args.no_warmup else None
    if args.warmup:
        if args.no_warmup:
            parser.error("--warmup and --no-warmup are mutually exclusive")
        warmup_shapes = []
        try:
            for part in args.warmup.split(","):
                m, n = part.lower().split("x")
                warmup_shapes.append((int(m), int(n)))
        except ValueError:
            parser.error(f"--warmup must look like '30x14,96x32', "
                         f"got {args.warmup!r}")

    predictor = BatchedPredictor.from_model_dir(
        args.model_dir, max_batch=args.max_batch, window_ms=args.window_ms,
        featurize_pool=args.featurize_pool,
        canonical_frame=args.canonical_frame,
        warmup_shapes=warmup_shapes, exec_cache=args.exec_cache)
    if predictor.warmed:
        print(f"warmed serving shapes: {predictor.warmed}")
    server = PredictionServer(predictor, host=args.host, port=args.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
