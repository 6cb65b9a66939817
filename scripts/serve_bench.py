#!/usr/bin/env python
"""Serving throughput/latency probe (full-size models, real TPU).

Measures the inference engine directly (no HTTP) at each compiled bucket —
reconstruction (num_steps DiT forwards + VAE decode in one program) and
tower embedding — then drives the micro-batcher at a given offered load to
show the batching win over sequential batch-1 serving.

Usage: python scripts/serve_bench.py [--img 224] [--steps 20] [--buckets 1,4,8]
"""

import argparse
import json
import threading
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--buckets", default="1,4,8")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--load_requests", type=int, default=32,
                    help="concurrent requests for the batched-serving probe")
    ap.add_argument("--quant", default="none", choices=("none", "int8"))
    ap.add_argument("--wire_dtype", default="uint8",
                    choices=("uint8", "float32"),
                    help="pixel dtype over host<->device (uint8 = the "
                         "serving default: 4x fewer transfer bytes each way)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from genhancer_tpu.models import dit as dit_m
    from genhancer_tpu.models import vae as vae_m
    from genhancer_tpu.models.towers import clip as clip_m
    from genhancer_tpu.serve.batcher import MicroBatcher
    from genhancer_tpu.serve.engine import InferenceEngine
    from genhancer_tpu.tasks import image as image_task

    buckets = [int(b) for b in args.buckets.split(",")]
    spec = image_task.TaskSpec(
        stage="stage1", tower_kind="clip", img_size=args.img,
        clip_image_size=224, dit_cfg=dit_m.DIT_CONFIGS["flux-dev"],
        vae_cfg=vae_m.VAE_CONFIGS["flux-dev"],
        tower_cfg=clip_m.CLIP_VARIANTS["clip-vit-large-patch14"],
        clip_dim=768, t5_dim=4096, compute_dtype=jnp.bfloat16)
    modules = image_task.init_modules(jax.random.key(0), spec)
    params = {"dit": modules["dit"], "vae": modules["vae"],
              "clip": modules["clip"]}
    engine = InferenceEngine(spec, params, num_steps=args.steps,
                             buckets=buckets, quant=args.quant,
                             wire_dtype=args.wire_dtype)

    rng = np.random.default_rng(0)
    out = {"img": args.img, "num_steps": args.steps, "quant": args.quant,
           "wire_dtype": args.wire_dtype, "buckets": {}}

    for b in buckets:
        # uint8-sourced pixels, like a decoded JPEG (both wires accept them)
        img = (rng.random((b, args.img, args.img, 3)) * 255).astype(np.uint8)
        engine.reconstruct(img, seed=0)           # compile
        t0 = time.perf_counter()
        for i in range(args.iters):
            engine.reconstruct(img, seed=i)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        engine.embed(img)
        t0 = time.perf_counter()
        for _ in range(args.iters * 4):
            engine.embed(img)
        ems = (time.perf_counter() - t0) / (args.iters * 4) * 1e3
        out["buckets"][b] = {
            "reconstruct_ms": round(ms, 1),
            "reconstruct_img_per_s": round(b / ms * 1e3, 2),
            "embed_ms": round(ems, 2),
            "embed_img_per_s": round(b / ems * 1e3, 1),
        }
        print(f"bucket {b}: recon {ms:.1f} ms ({b / ms * 1e3:.2f} img/s), "
              f"embed {ems:.2f} ms ({b / ems * 1e3:.1f} img/s)", flush=True)

    # offered-load probe: N concurrent requests through the micro-batcher
    mb = MicroBatcher(engine.reconstruct, max_batch=max(buckets),
                      max_wait_ms=10.0)
    imgs = [(rng.random((args.img, args.img, 3)) * 255).astype(np.uint8)
            for _ in range(args.load_requests)]
    t0 = time.perf_counter()
    futs = [mb.submit(x) for x in imgs]
    for f in futs:
        f.result(timeout=600)
    wall = time.perf_counter() - t0
    snap = mb.stats.snapshot()
    mb.close()
    seq_ms = out["buckets"][1]["reconstruct_ms"]
    out["offered_load"] = {
        "requests": args.load_requests,
        "wall_s": round(wall, 2),
        "req_per_s": round(args.load_requests / wall, 2),
        "speedup_vs_sequential_b1": round(
            (args.load_requests * seq_ms / 1e3) / wall, 2),
        "batch_histogram": snap["batch_histogram"],
        "latency_ms": snap["latency_ms"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
