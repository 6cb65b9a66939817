#!/usr/bin/env python
"""Stage-2_all floor analysis (VERDICT r4 #6): where do the 259.5 ms go?

The bench stage2 block (B=16, 224px, latents cache, QLoRA int8 tower base,
int8_full cached-SwitchBack DiT, fused Pallas AdamW) reports MFU 0.406 vs
stage-1's 0.69.  This decomposes the step into separately-jitted pieces at
the EXACT bench shapes/dtypes and attributes time:

  full        the actual make_train_step (the anchor)
  grad_all    value_and_grad of the loss, no optimizer        -> opt cost
  grad_nolora grads wrt DiT+projectors only (LoRA held frozen
              -> XLA dead-code-eliminates the tower backward) -> tower bwd
  fwd_only    loss forward alone                              -> total bwd
  cond_fwd    tower conditioning forward alone                -> tower fwd
  dit_grad    DiT fwd+bwd with conditioning precomputed       -> DiT share

Per-component FLOPs (from bench.py's analytic counts) give each piece its
own MFU, so the table says which component is below ITS floor rather than
averaging everything into one number.  Run on the real TPU, one job at a
time:  python scripts/stage2_ablate.py [--batch 16] [--iters 30]

Workload parity anchor: train_SigLIP_stage2_all.py:134-174 (reference
stage-2 schedule).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, iters):
    """Sync via a host read of a scalar reduction, NOT block_until_ready:
    over the axon relay block_until_ready resolves on the handle, not the
    computation (see scripts/cache_build_probe.py)."""
    import jax
    import jax.numpy as jnp

    def sync(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        float(jnp.sum(leaf).astype(jnp.float32))

    sync(fn(*args))
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--quant", default="int8_full")
    args = ap.parse_args()

    import jax
    # persistent compilation cache (shared with bench.py / the test suite):
    # reruns of this probe skip the multi-minute autodiff compiles
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    import jax.numpy as jnp
    from genhancer_tpu.models import dit as dit_m, vae as vae_m
    from genhancer_tpu.models.towers import clip as clip_m
    from genhancer_tpu.tasks import image as image_task
    from genhancer_tpu.tasks.conditioning import image_conditioning
    from genhancer_tpu.train import optim
    from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS
    from genhancer_tpu.train.state import unflatten_params
    from bench import (dit_flops_per_image, clip_flops_per_image,
                       V5E_BF16_PEAK)

    q8 = args.quant != "none"
    dit_cfg = dit_m.DIT_CONFIGS["flux-dev"]
    vae_cfg = vae_m.VAE_CONFIGS["flux-dev"]
    tower_cfg = clip_m.CLIP_VARIANTS["clip-vit-large-patch14"]
    spec = image_task.TaskSpec(
        stage="stage2_all", tower_kind="clip", img_size=args.img,
        clip_image_size=224, dit_cfg=dit_cfg, vae_cfg=vae_cfg,
        tower_cfg=tower_cfg, clip_dim=768, t5_dim=4096, lora_dropout=0.1,
        compute_dtype=jnp.bfloat16, dit_param_dtype=jnp.bfloat16,
        vae_dtype=jnp.bfloat16,
        tower_quant="int8" if q8 else "none",
        dit_quant=args.quant if q8 else "none", dit_quant_cache=q8)
    optimizer = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)),
                                     fused="pallas" if q8 else False,
                                     emit_quant=q8)
    state = image_task.create_task_state(jax.random.key(0), spec, optimizer)
    # Free the Adam moments for the grad-only phase: they are dead weight
    # for value_and_grad but (unlike the donated full step) nothing here
    # reuses their buffers, and B=16 grad-without-donation + resident
    # moments OOMs 16 GB.  The full-step anchor (last) recreates the state.
    for leaf in jax.tree_util.tree_leaves(state.opt_state):
        if hasattr(leaf, "delete"):
            leaf.delete()
    state = state.replace(opt_state=None)

    rng = np.random.default_rng(0)
    h, w = spec.latent_hw
    zc = 2 * vae_cfg.z_channels
    batch = {
        "moments": jnp.asarray(
            rng.normal(size=(args.batch, h, w, zc)).astype(np.float32) * 0.3),
        "image": jnp.asarray(
            rng.random((args.batch, args.img, args.img, 3), dtype=np.float32)),
    }
    key = jax.random.key(7)

    res = {"batch": args.batch, "img": args.img, "quant": args.quant,
           "components_ms": {}}

    def rec(name, ms):
        res["components_ms"][name] = ms
        print(json.dumps({name: round(ms, 2)}), flush=True)

    # ---- grads without the optimizer ------------------------------------
    loss_fn = image_task.make_loss_fn(spec)

    def _gsum(g):
        # reduce grads to a scalar INSIDE the jit: returning the full grad
        # tree from 30 async-dispatched calls OOMs 16 GB on output buffers,
        # and an unused output would let XLA DCE the backward entirely.
        # Costs one read pass over the grad tree (~1 ms) — noted bias.
        return sum(jnp.sum(v.astype(jnp.float32)) for v in
                   jax.tree_util.tree_leaves(g))

    @jax.jit
    def grad_all(trainable, frozen, b, k, quant):
        l, g = jax.value_and_grad(loss_fn)(trainable, frozen, b, k, quant)
        return l, _gsum(g)

    rec("grad_all_no_opt", timeit(
        lambda b, k: grad_all(state.trainable, state.frozen, b, k,
                              state.quant), (batch, key), args.iters))

    # ---- grads with the tower LoRA held frozen ---------------------------
    # no parameter downstream of the tower interior needs a gradient, so XLA
    # DCEs the tower backward; diff vs grad_all = tower bwd cost
    lora = {p: v for p, v in state.trainable.items() if ".lora_" in p}
    rest = {p: v for p, v in state.trainable.items() if ".lora_" not in p}
    assert lora, "stage2_all must have LoRA paths"

    @jax.jit
    def grad_nolora(rest_, frozen, b, k, quant):
        def f(r):
            return loss_fn({**r, **lora}, frozen, b, k, quant)
        l, g = jax.value_and_grad(f)(rest_)
        return l, _gsum(g)

    rec("grad_dit_proj_only", timeit(
        lambda b, k: grad_nolora(rest, state.frozen, b, k, state.quant),
        (batch, key), args.iters))

    # ---- forward only -----------------------------------------------------
    @jax.jit
    def fwd_only(trainable, frozen, b, k, quant):
        return loss_fn(trainable, frozen, b, k, quant)

    rec("fwd_only", timeit(
        lambda b, k: fwd_only(state.trainable, state.frozen, b, k,
                              state.quant), (batch, key), args.iters))

    # ---- tower conditioning forward alone ---------------------------------
    params = unflatten_params({**state.frozen, **state.trainable})

    @jax.jit
    def cond_fwd(clip_params, px):
        c = image_conditioning("clip", clip_params, px, tower_cfg,
                               spec.latent_hw, compute_dtype=jnp.bfloat16)
        return c["txt"].sum()

    rec("tower_cond_fwd", timeit(
        lambda b, k: cond_fwd(params["clip"], b["image"]), (batch, key),
        args.iters))

    # ---- DiT fwd+bwd with fixed conditioning ------------------------------
    from genhancer_tpu.train import flow as flow_m
    from genhancer_tpu.core.nn import int8_training_ctx
    import contextlib
    cond = jax.jit(lambda cp, px: image_conditioning(
        "clip", cp, px, tower_cfg, spec.latent_hw,
        compute_dtype=jnp.bfloat16))(params["clip"], batch["image"])
    cond = jax.tree.map(jax.lax.stop_gradient, cond)
    seq = (h // 2) * (w // 2)
    x1 = jnp.asarray(rng.normal(size=(args.batch, seq, 64)), jnp.float32)
    dit_flat = {p: v for p, v in state.trainable.items()
                if p.startswith("dit.")}

    @jax.jit
    def dit_grad(dflat, b_unused, k, quant):
        def f(df):
            p = unflatten_params({**state.frozen, **rest, **lora, **df})
            t = flow_m.sample_timesteps(jax.random.fold_in(k, 1), args.batch)
            x0 = jax.random.normal(jax.random.fold_in(k, 2), x1.shape,
                                   jnp.float32)
            xt = flow_m.interpolate(x1, x0, t)
            ctx = (int8_training_ctx(full=args.quant == "int8_full",
                                     dw_int8=args.quant == "int8_dw")
                   if q8 else contextlib.nullcontext())
            from genhancer_tpu.train.state import merged_quant_flat
            pq = unflatten_params({**state.frozen, **rest, **lora, **df,
                                   **merged_quant_flat(quant)})
            with ctx:
                pred = dit_m.dit_forward(
                    pq["dit"], dit_cfg, img=xt.astype(jnp.bfloat16),
                    img_ids=cond["img_ids"], txt=cond["txt"],
                    txt_ids=cond["txt_ids"], timesteps=t,
                    y=cond["vec"],
                    guidance=jnp.full((args.batch,), 4.0, jnp.bfloat16))
            return flow_m.mse_loss(pred, flow_m.velocity_target(x1, x0))
        l, g = jax.value_and_grad(f)(dflat)
        return l, _gsum(g)

    rec("dit_fwdbwd", timeit(
        lambda b, k: dit_grad(dit_flat, b, k, state.quant), (batch, key),
        args.iters))

    # ---- full step (the bench anchor) — LAST: it donates the state --------
    # drop every grad-phase function/closure (jitted executables bake the
    # captured frozen/LoRA trees in as on-device constants) and recreate a
    # fresh optimizer-bearing state, so the step runs with bench-equivalent
    # residency.
    del state, params, dit_flat, lora, rest, cond, x1
    del grad_all, grad_nolora, fwd_only, cond_fwd, dit_grad
    jax.clear_caches()
    step = image_task.make_train_step(spec, optimizer)
    st = image_task.create_task_state(jax.random.key(0), spec, optimizer)
    for i in range(2):                                    # compile + warm
        st, m = step(st, batch, jax.random.fold_in(key, i))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(args.iters):
        st, m = step(st, batch, jax.random.fold_in(key, 100 + i))
    float(m["loss"])
    rec("full_step", (time.perf_counter() - t0) / args.iters * 1e3)

    # ---- attribution ------------------------------------------------------
    c = res["components_ms"]
    res["attribution_ms"] = {
        "optimizer_and_cache": round(c["full_step"] - c["grad_all_no_opt"], 2),
        "tower_bwd": round(c["grad_all_no_opt"] - c["grad_dit_proj_only"], 2),
        "tower_fwd": round(c["tower_cond_fwd"], 2),
        "dit_fwdbwd": round(c["dit_fwdbwd"], 2),
        "backward_total": round(c["grad_all_no_opt"] - c["fwd_only"], 2),
        "residual_vs_sum": round(
            c["full_step"] - (c["full_step"] - c["grad_all_no_opt"])
            - (c["grad_all_no_opt"] - c["grad_dit_proj_only"])
            - c["dit_fwdbwd"] - c["tower_cond_fwd"], 2),
    }

    # per-component MFU at the bench's analytic FLOP counts
    lp = (args.img // 14) ** 2
    clip_f = clip_flops_per_image(lp + 1, 1024, 4096, 24)
    dit_f = dit_flops_per_image(seq, lp, dit_cfg)
    B = args.batch
    res["mfu"] = {
        "tower_fwd": round(clip_f * B / (c["tower_cond_fwd"] * 1e-3)
                           / V5E_BF16_PEAK, 4),
        "tower_fwdbwd_effective": round(
            3 * clip_f * B / ((c["tower_cond_fwd"]
                               + c["grad_all_no_opt"]
                               - c["grad_dit_proj_only"]) * 1e-3)
            / V5E_BF16_PEAK, 4),
        "dit_fwdbwd": round(3 * dit_f * B / (c["dit_fwdbwd"] * 1e-3)
                            / V5E_BF16_PEAK, 4),
        "full_step": round((3 * dit_f + 3 * clip_f) * B
                           / (c["full_step"] * 1e-3) / V5E_BF16_PEAK, 4),
    }
    for k_, v in res["components_ms"].items():
        res["components_ms"][k_] = round(v, 2)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
