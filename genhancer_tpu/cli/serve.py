"""Serving CLI: compiled stage-1 inference behind HTTP.

``genhancer-serve --config configs/test_OpenAICLIP_224_stage1.yaml \
    --load_dir out/ --load_step 1000 --port 8000 --buckets 1,4,8``

Startup compiles every (endpoint, bucket) program (20-120 s first time on
the axon stack), then serves with dynamic micro-batching; no request ever
waits on a compile.
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None):
    parser = argparse.ArgumentParser(description="genhancer inference server")
    parser.add_argument("--config", required=True,
                        help="stage-1 training YAML (model/tower/resolution)")
    parser.add_argument("--load_dir", default=None,
                        help="stage-1 checkpoint dir (checkpoint-dit-N.bin...)")
    parser.add_argument("--load_step", type=int, default=None)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--buckets", default="1,4,8",
                        help="comma-separated batch buckets to pre-compile")
    parser.add_argument("--num_steps", type=int, default=20,
                        help="Euler sampler steps (static per server)")
    parser.add_argument("--guidance", type=float, default=4.0)
    parser.add_argument("--max_wait_ms", type=float, default=5.0,
                        help="micro-batch collection window")
    parser.add_argument("--endpoints", default="reconstruct,embed",
                        help="which endpoints to warm up/serve")
    parser.add_argument("--quant", default="none", choices=("none", "int8"),
                        help="int8: statically quantize all serving params "
                             "(DiT+tower linears, VAE convs) — 2x MXU peak "
                             "on v5e, per-channel weight scales")
    parser.add_argument("--num_devices", type=int, default=1,
                        help=">1: multi-chip serving — batch shards over a "
                             "device-mesh data axis (buckets round up to "
                             "multiples of the data-axis size)")
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="shard the DiT over a model mesh axis with the "
                             "training TP placements (DiTs past one chip's "
                             "HBM / latency scaling)")
    parser.add_argument("--wire_dtype", default="uint8",
                        choices=("uint8", "float32"),
                        help="pixel dtype crossing host<->device: uint8 "
                             "(default) moves /255 + *255 inside the jit and "
                             "cuts transfer bytes 4x each way — the dominant "
                             "cost on a transfer-bound link; float32 keeps "
                             "bit-exact float [0,1] IO")
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    log = logging.getLogger("genhancer.serve")

    from ..serve.engine import InferenceEngine
    from ..serve.http import ServeApp

    buckets = [int(b) for b in args.buckets.split(",") if b]
    endpoints = [e.strip() for e in args.endpoints.split(",") if e.strip()]
    log.info("loading engine (config=%s load_dir=%s)", args.config,
             args.load_dir)
    engine = InferenceEngine.from_config(
        args.config, load_dir=args.load_dir, load_step=args.load_step,
        num_steps=args.num_steps, guidance=args.guidance, buckets=buckets,
        quant=args.quant, num_devices=args.num_devices,
        model_parallel=args.model_parallel, wire_dtype=args.wire_dtype)
    # engine.buckets, not the parsed flag: multi-chip serving rounds
    # buckets up to data-axis multiples
    log.info("warming up %s x buckets %s", endpoints, list(engine.buckets))
    engine.warmup(endpoints)

    # only the warmed endpoints are served — an un-warmed endpoint would
    # compile online inside its first request (http.ServeApp 404s the rest)
    app = ServeApp(engine, max_wait_ms=args.max_wait_ms, endpoints=endpoints)
    server = app.make_server(args.host, args.port)
    log.info("serving on %s:%d", *server.server_address[:2])
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        app.close()


def cli() -> None:
    main()


if __name__ == "__main__":
    cli()
