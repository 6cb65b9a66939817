#!/usr/bin/env python
"""VAE-conv MXU reformulation probe (VERDICT r4 #7).

The int8 VAE encoder (quant cache build, inline stage-1 towers) runs at
~41% of v5e int8 peak through XLA's conv emitter.  The amortized-throughput
"floor" claimed in BASELINE.md rests on that emitter being the best
available — this probe tries to beat it by reformulating the 3x3 convs
onto the MXU as matmuls, at the exact shapes the f8 encoder runs
(flat FLOP profile: ~14.8 GF/img per conv at every level):

  xla_bf16    lax.conv_general_dilated NHWC bf16             (baseline)
  xla_int8    the shipped core.quant.conv2d_int8             (int8 anchor)
  shift9      9 shifted int8 matmuls [B*H*W, Cin] @ [Cin, Cout], int32
              accumulate (conv = sum over taps of a shifted 1x1)
  im2col      patches [B*H*W, 9*Cin] int8 @ [9*Cin, Cout] one matmul
              (XLA implicit-gemm made explicit; 9x activation traffic but
              a deep K=9*Cin contraction the MXU likes)

Each mode is checked for numerical agreement with xla_int8 (same int8
quantization -> results must match to accumulation order) before timing.
Per-shape table + a whole-encoder composite; TF/s uses the int8 conv's
analytic FLOPs.  Run solo on the TPU:

  python scripts/vae_conv_mxu_probe.py [--batch 8] [--iters 50]

Reference anchor: the frozen f8 encoder the reference runs in fp32 on GPU
(`Continuous/src/flux/modules/autoencoder.py`); our int8 path is the
TPU-side speedup whose ceiling is probed here.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, iters):
    """Sync via a host read of a scalar reduction, NOT block_until_ready:
    over the axon relay block_until_ready resolves on the handle, not the
    computation (see scripts/cache_build_probe.py)."""
    import jax
    import jax.numpy as jnp

    def sync(o):
        float(jnp.sum(o).astype(jnp.float32))

    sync(fn())
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--modes", default="xla_bf16,xla_int8,shift9,im2col")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from genhancer_tpu.core import quant

    # (H, Cin, Cout): one representative conv per encoder level at 224px,
    # plus conv_in's successor.  Every level is ~the same analytic FLOPs.
    SHAPES = [
        (224, 128, 128),   # level 0 resnet conv
        (112, 128, 256),   # level 1 entry
        (112, 256, 256),   # level 1 resnet conv
        (56, 256, 512),    # level 2 entry
        (56, 512, 512),    # level 2 resnet conv
        (28, 512, 512),    # level 3 / mid resnet conv
    ]
    B = args.batch
    rng = np.random.default_rng(0)
    modes = args.modes.split(",")

    def make_shift9(Cin, Cout):
        @jax.jit
        def f(xq, sx, wq, wscale):
            # wscale: [1,1,1,Cout] per-out-channel (quantize_weight axis=3)
            b, h, w, _ = xq.shape
            xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = jnp.zeros((b * h * w, Cout), jnp.int32)
            for ky in range(3):
                for kx in range(3):
                    tap = jax.lax.slice(
                        xp, (0, ky, kx, 0), (b, ky + h, kx + w, Cin))
                    acc = acc + jax.lax.dot_general(
                        tap.reshape(b * h * w, Cin), wq[ky, kx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * (sx * wscale.reshape(1, Cout))
            return y.reshape(b, h, w, Cout).astype(jnp.bfloat16)
        return f

    def make_im2col(Cin, Cout):
        @jax.jit
        def f(xq, sx, wq, wscale):
            b, h, w, _ = xq.shape
            xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = [jax.lax.slice(xp, (0, ky, kx, 0), (b, ky + h, kx + w, Cin))
                    for ky in range(3) for kx in range(3)]
            patches = jnp.concatenate(
                [c.reshape(b * h * w, Cin) for c in cols], axis=1)
            acc = jax.lax.dot_general(
                patches, wq.reshape(9 * Cin, Cout), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * (sx * wscale.reshape(1, Cout))
            return y.reshape(b, h, w, Cout).astype(jnp.bfloat16)
        return f

    results = {"batch": B, "shapes": []}
    for (H, Cin, Cout) in SHAPES:
        x = jnp.asarray(rng.normal(size=(B, H, H, Cin)).astype(np.float32),
                        jnp.bfloat16)
        wf = jnp.asarray(
            rng.normal(size=(3, 3, Cin, Cout)).astype(np.float32) * 0.05)
        wq, ws = quant.quantize_weight(wf, axis=3)   # [1,1,1,Cout] scales
        pq = {"weight_q": wq, "w_scale": ws}

        xq, sx = quant.quantize_activation_tensor(x)
        flops = 2 * B * H * H * 9 * Cin * Cout
        row = {"H": H, "Cin": Cin, "Cout": Cout,
               "gflops": round(flops / 1e9, 1), "ms": {}, "tfs": {}}

        fns = {}
        if "xla_bf16" in modes:
            conv_bf16 = jax.jit(lambda xx, ww: jax.lax.conv_general_dilated(
                xx, ww.astype(jnp.bfloat16), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16))
            fns["xla_bf16"] = lambda: conv_bf16(x, wf)
        if "xla_int8" in modes:
            conv_i8 = jax.jit(lambda node, xx: quant.conv2d_int8(node, xx))
            fns["xla_int8"] = lambda: conv_i8(pq, x)
        if "shift9" in modes:
            s9 = make_shift9(Cin, Cout)
            fns["shift9"] = lambda: s9(xq, sx, wq, ws)
        if "im2col" in modes:
            ic = make_im2col(Cin, Cout)
            fns["im2col"] = lambda: ic(xq, sx, wq, ws)

        # numerical cross-check int8 modes vs the shipped path
        ref = np.asarray(quant.conv2d_int8(pq, x), np.float32)
        for name in ("shift9", "im2col"):
            if name in fns:
                got = np.asarray(fns[name](), np.float32)
                err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
                assert err < 2e-2, (name, err)

        for name, fn in fns.items():
            ms = timeit(fn, args.iters)
            row["ms"][name] = round(ms, 3)
            row["tfs"][name] = round(flops / (ms * 1e-3) / 1e12, 1)
        results["shapes"].append(row)
        print(json.dumps(row), flush=True)

    # composite: encoder-weighted (per-level conv counts at 224px input)
    # L0: 4 convs @224/128/128; L1: 1@112 128->256 + 3@112 256; L2: 1@56
    # 256->512 + 3@56 512; L3+mid: 6@28 512/512 (4 level-3/mid res convs
    # pattern approximated; conv_in/out + 1x1s excluded, <3% of FLOPs)
    weights = {(224, 128, 128): 4, (112, 128, 256): 1, (112, 256, 256): 3,
               (56, 256, 512): 1, (56, 512, 512): 3, (28, 512, 512): 6}
    comp = {}
    for row in results["shapes"]:
        k = (row["H"], row["Cin"], row["Cout"])
        for m, ms in row["ms"].items():
            comp.setdefault(m, 0.0)
            comp[m] += weights[k] * ms
    results["encoder_weighted_ms"] = {m: round(v, 2) for m, v in comp.items()}
    print(json.dumps({"encoder_weighted_ms": results["encoder_weighted_ms"]},
                     indent=1))


if __name__ == "__main__":
    main()
