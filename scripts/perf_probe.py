#!/usr/bin/env python
"""On-chip step breakdown for the stage-1 image task (perf work, round 2).

Times each component of the hot loop separately (fresh jit per component) on
the real TPU: full step (fp32 vs bf16 VAE), VAE encode, tower conditioning,
DiT forward, DiT forward+backward, optimizer apply.  Also reports the bf16
latent drift vs fp32 on the same inputs.

Timing note: on the axon-relayed TPU, block_until_ready does not drain the
dispatch queue — every timed region ends with a scalar device_get (float()).
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters * 1000.0  # ms


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--optimizer", type=str, default="chained",
                    choices=["fused", "chained", "pallas"])
    ap.add_argument("--dit-quant", type=str, default="none",
                    choices=["none", "int8", "int8_full", "int8_dw"])
    ap.add_argument("--tower-quant", type=str, default="none",
                    choices=["none", "int8"],
                    help="int8 frozen tower base (stage-2 probes: QLoRA-style)")
    ap.add_argument("--vae-quant", type=str, default="none",
                    choices=["none", "int8"])
    ap.add_argument("--remat-policy", type=str, default=None,
                    choices=[None, "full", "save_attn", "dots"],
                    help="enable per-block remat with this policy (default "
                         "off at image scale)")
    ap.add_argument("--moment-bits", type=int, default=16, choices=[8, 16],
                    help="8: log-coded int8 Adam moments in the Pallas "
                         "optimizer (requires --optimizer pallas)")
    ap.add_argument("--quant-cache", type=str, default="auto",
                    choices=["auto", "off"],
                    help="off: in-forward W quantization (no optimizer-"
                         "maintained cache) — the round-2 behavior")
    args = ap.parse_args()

    from genhancer_tpu.models import dit as dit_m
    from genhancer_tpu.models import vae as vae_m
    from genhancer_tpu.models.towers import clip as clip_m
    from genhancer_tpu.tasks import image as image_task
    from genhancer_tpu.tasks.conditioning import (image_conditioning, normalize,
                                                  VAE_MEAN, VAE_STD)
    from genhancer_tpu.train import optim, flow
    from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS
    from genhancer_tpu.train.state import apply_gradients, unflatten_params

    dit_cfg = dit_m.DIT_CONFIGS["flux-dev"]
    vae_cfg = vae_m.VAE_CONFIGS["flux-dev"]
    tower_cfg = clip_m.CLIP_VARIANTS["clip-vit-large-patch14"]

    def make_spec(**kw):
        base = dict(stage="stage1", tower_kind="clip", img_size=args.img,
                    clip_image_size=224, dit_cfg=dit_cfg, vae_cfg=vae_cfg,
                    tower_cfg=tower_cfg, clip_dim=768, t5_dim=4096,
                    compute_dtype=jnp.bfloat16, dit_param_dtype=jnp.bfloat16)
        base.update(kw)
        return image_task.TaskSpec(**base)

    spec_f32 = make_spec(vae_dtype=jnp.float32)
    spec_bf16 = make_spec(vae_dtype=jnp.bfloat16)

    cfg = Config(dict(TRAIN_DEFAULTS))
    optimizer = optim.make_optimizer(
        cfg, fused={"fused": True, "chained": False, "pallas": "pallas"}[args.optimizer],
        emit_quant=(args.dit_quant in ("int8", "int8_dw", "int8_full")
                    and args.optimizer == "pallas"
                    and args.quant_cache != "off"),
        moment_bits=args.moment_bits)

    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(
        rng.random((args.batch, args.img, args.img, 3), dtype=np.float32))}
    key = jax.random.key(42)

    results = {"batch": args.batch, "img": args.img}
    only = [s for s in args.only.split(",") if s]

    def want(name):
        return not only or name in only

    # full task state only where needed (it is ~7 GB with optimizer moments;
    # holding it alongside standalone-component executables OOMs the chip)
    if any(want(n) for n in ("vae", "cond", "opt", "vae_q", "cond_q")):
        state = image_task.create_task_state(jax.random.key(0), spec_f32, optimizer)
        params = unflatten_params({**state.frozen, **state.trainable})

    # --- VAE encode fp32 vs bf16 + drift --------------------------------
    if want("vae"):
        vae_in = normalize(batch["image"], VAE_MEAN, VAE_STD).astype(jnp.float32)

        @functools.partial(jax.jit, static_argnums=(2,))
        def vae_fn(p, x, dtype):
            return vae_m.vae_encode(p, vae_cfg, x, jax.random.key(0), dtype=dtype)

        results["vae_f32_ms"] = timeit(vae_fn, params["vae"], vae_in, jnp.float32,
                                       iters=args.iters)
        results["vae_bf16_ms"] = timeit(vae_fn, params["vae"], vae_in, jnp.bfloat16,
                                        iters=args.iters)
        lat32 = vae_fn(params["vae"], vae_in, jnp.float32)
        lat16 = vae_fn(params["vae"], vae_in, jnp.bfloat16)
        diff = jnp.abs(lat32 - lat16)
        results["vae_drift_max"] = float(jnp.max(diff))
        results["vae_drift_mean"] = float(jnp.mean(diff))
        results["vae_lat_std"] = float(jnp.std(lat32))
        print("vae:", {k: v for k, v in results.items() if k.startswith("vae")},
              flush=True)

    # --- tower conditioning ----------------------------------------------
    if want("cond"):
        @jax.jit
        def cond_fn(cp, imgs):
            return image_conditioning("clip", cp, imgs, tower_cfg,
                                      spec_f32.latent_hw)["txt"]

        results["cond_ms"] = timeit(cond_fn, params["clip"], batch["image"],
                                    iters=args.iters)
        print("cond:", results["cond_ms"], flush=True)

    # --- int8 frozen paths (core.quant) -----------------------------------
    if want("vae_q"):
        from genhancer_tpu.core import quant
        vae_in = normalize(batch["image"], VAE_MEAN, VAE_STD).astype(jnp.float32)
        enc_q = quant.quantize_conv_tree(params["vae"]["encoder"])

        @jax.jit
        def vae_q_fn(enc, x):
            return vae_m.vae_encode({"encoder": enc}, vae_cfg, x,
                                    jax.random.key(0), dtype=jnp.bfloat16)

        @jax.jit
        def vae_ref_fn(enc, x):
            return vae_m.vae_encode({"encoder": enc}, vae_cfg, x,
                                    jax.random.key(0), dtype=jnp.bfloat16)

        results["vae_int8_ms"] = timeit(vae_q_fn, enc_q, vae_in, iters=args.iters)
        lat_q = vae_q_fn(enc_q, vae_in)
        lat_ref = vae_ref_fn(params["vae"]["encoder"], vae_in)
        diff = jnp.abs(lat_q - lat_ref)
        results["vae_int8_drift_max"] = float(jnp.max(diff))
        results["vae_int8_drift_mean"] = float(jnp.mean(diff))
        results["vae_int8_lat_std"] = float(jnp.std(lat_ref))
        print("vae_q:", {k: v for k, v in results.items() if "int8" in k},
              flush=True)

    if want("cond_q"):
        from genhancer_tpu.core import quant
        clip_q = dict(params["clip"], model=quant.quantize_linear_tree(
            params["clip"]["model"]))

        @jax.jit
        def cond_q_fn(cp, imgs):
            return image_conditioning("clip", cp, imgs, tower_cfg,
                                      spec_f32.latent_hw)["txt"]

        results["cond_int8_ms"] = timeit(cond_q_fn, clip_q, batch["image"],
                                         iters=args.iters)
        txt_q = cond_q_fn(clip_q, batch["image"])
        txt_ref = cond_q_fn(params["clip"], batch["image"])
        diff = jnp.abs(txt_q.astype(jnp.float32) - txt_ref.astype(jnp.float32))
        results["cond_int8_drift_mean"] = float(jnp.mean(diff))
        results["cond_int8_ref_std"] = float(jnp.std(
            txt_ref.astype(jnp.float32)))
        print("cond_q:", {k: v for k, v in results.items() if "cond_int8" in k},
              flush=True)

    if want("step_q"):
        spec_q = make_spec(vae_dtype=jnp.bfloat16, tower_quant="int8",
                           vae_quant="int8", dit_quant=args.dit_quant)
        step = image_task.make_train_step(spec_q, optimizer)
        st = image_task.create_task_state(jax.random.key(0), spec_q, optimizer)
        for i in range(2):
            st, m = step(st, batch, jax.random.fold_in(key, i))
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(args.iters):
            st, m = step(st, batch, jax.random.fold_in(key, 100 + i))
        float(m["loss"])
        results["step_int8_ms"] = (time.perf_counter() - t0) / args.iters * 1000.0
        results["step_int8_imgps"] = args.batch / results["step_int8_ms"] * 1000.0
        print("step_q:", results["step_int8_ms"], results["step_int8_imgps"],
              flush=True)

    # --- DiT forward / forward+backward ----------------------------------
    if want("dit"):
        from genhancer_tpu.core.nn import tree_cast
        dit_params = tree_cast(dit_m.init_dit(jax.random.key(0), dit_cfg),
                               jnp.bfloat16)
        h, w = spec_f32.latent_hw
        L = (h // 2) * (w // 2)
        xt = jnp.asarray(rng.standard_normal((args.batch, L, 64)), jnp.bfloat16)
        txt = jnp.asarray(rng.standard_normal((args.batch, 1, 4096)), jnp.bfloat16)
        vec = jnp.asarray(rng.standard_normal((args.batch, 768)), jnp.bfloat16)
        from genhancer_tpu.core.rope import spatial_ids
        img_ids = jnp.broadcast_to(spatial_ids(h // 2, w // 2, t=0.0)[None],
                                   (args.batch, L, 3))
        txt_ids = jnp.zeros((args.batch, 1, 3), jnp.float32)
        ts = jnp.full((args.batch,), 0.5, jnp.bfloat16)
        gd = jnp.full((args.batch,), 4.0, jnp.bfloat16)

        import contextlib
        from genhancer_tpu.core.nn import int8_training_ctx

        def ctx():
            return (int8_training_ctx(full=args.dit_quant == "int8_full")
                    if args.dit_quant != "none" else contextlib.nullcontext())

        @jax.jit
        def dit_fwd(dp):
            with ctx():
                return dit_m.dit_forward(dp, dit_cfg, img=xt, img_ids=img_ids,
                                         txt=txt, txt_ids=txt_ids, timesteps=ts,
                                         y=vec, guidance=gd)

        results["dit_fwd_ms"] = timeit(dit_fwd, dit_params, iters=args.iters)

        tgt = jnp.asarray(rng.standard_normal((args.batch, L, 64)), jnp.float32)

        @jax.jit
        def dit_fwdbwd(dp):
            def loss(dp_):
                with ctx():
                    pred = dit_m.dit_forward(dp_, dit_cfg, img=xt, img_ids=img_ids,
                                             txt=txt, txt_ids=txt_ids, timesteps=ts,
                                             y=vec, guidance=gd)
                return flow.mse_loss(pred, tgt)
            return jax.grad(loss)(dp)

        results["dit_fwdbwd_ms"] = timeit(dit_fwdbwd, dit_params, iters=args.iters)
        print("dit:", results["dit_fwd_ms"], results["dit_fwdbwd_ms"], flush=True)

    # --- optimizer apply ---------------------------------------------------
    if want("opt"):
        grads = jax.tree_util.tree_map(lambda x: jnp.ones_like(x), state.trainable)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def opt_fn(st, g):
            return apply_gradients(st, g, optimizer)

        st = state
        for _ in range(2):
            st = opt_fn(st, grads)
        _force(st.trainable)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st = opt_fn(st, grads)
        _force(st.trainable)
        results["opt_ms"] = (time.perf_counter() - t0) / args.iters * 1000.0
        state = st
        print("opt:", results["opt_ms"], flush=True)

    # --- full steps ---------------------------------------------------------
    if want("step_pre"):
        # precomputed-conditioning step (data.precompute): DiT + projectors +
        # optimizer only; batch holds VAE moments + tower class tokens
        spec_p = make_spec(dit_quant=args.dit_quant,
                           dit_quant_cache=(args.quant_cache != "off"
                                            and args.optimizer == "pallas"),
                           remat=args.remat_policy is not None,
                           remat_policy=args.remat_policy or "full")
        h, w = spec_p.latent_hw
        zc = 2 * spec_p.vae_cfg.z_channels
        pre_batch = {
            "moments": jnp.asarray(rng.normal(size=(args.batch, h, w, zc))
                                   .astype(np.float32) * 0.3),
            "cls": jnp.asarray(rng.normal(size=(args.batch, 768))
                               .astype(np.float32)),
        }
        step = image_task.make_train_step(spec_p, optimizer)
        st = image_task.create_task_state(jax.random.key(0), spec_p, optimizer)
        for i in range(2):
            st, m = step(st, pre_batch, jax.random.fold_in(key, i))
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(args.iters):
            st, m = step(st, pre_batch, jax.random.fold_in(key, 100 + i))
        float(m["loss"])
        results["step_pre_ms"] = (time.perf_counter() - t0) / args.iters * 1000.0
        results["step_pre_imgps"] = args.batch / results["step_pre_ms"] * 1000.0
        print("step_pre:", results["step_pre_ms"], results["step_pre_imgps"],
              flush=True)
        del step, st

    if any(want(n) for n in ("step_s2", "step_s2all",
                             "step_s2_pre", "step_s2all_pre")):
        # stage-2: tower inside autodiff with LoRA (reference schedule B=16,
        # train_SigLIP_stage2_all.py) — the stage whose hot loop is the
        # tower fwd+bwd, not the DiT.  *_pre variants feed the latent cache
        # (moments + crop pixels, data.precompute mode=latents): the frozen
        # VAE encode drops out of the step
        for name, stage in (("step_s2", "stage2_only"),
                            ("step_s2all", "stage2_all"),
                            ("step_s2_pre", "stage2_only"),
                            ("step_s2all_pre", "stage2_all")):
            if not want(name):
                continue
            if name.endswith("_pre"):
                h, w = make_spec(stage=stage).latent_hw
                zc = 2 * make_spec(stage=stage).vae_cfg.z_channels
                s2_batch = {
                    "image": batch["image"],
                    "moments": jnp.asarray(
                        rng.normal(size=(args.batch, h, w, zc))
                        .astype(np.float32) * 0.3)}
            else:
                s2_batch = batch
            # stage2_all: SwitchBack training quant on the DiT.  stage2_only:
            # the task statically quantizes the FROZEN DiT (int8 fwd + int8
            # dx, no dW) — "int8" is the only meaningful value there.
            spec_s2 = make_spec(stage=stage, vae_dtype=jnp.bfloat16,
                                vae_quant=args.vae_quant,
                                tower_quant=args.tower_quant,
                                lora_dropout=0.1,
                                dit_quant=(args.dit_quant
                                           if stage == "stage2_all"
                                           else ("int8" if args.dit_quant
                                                 != "none" else "none")),
                                # stage2_all trains the DiT, so the
                                # optimizer-fused int8 weight cache (the
                                # stage-1 2x enabler) applies there too
                                dit_quant_cache=(
                                    stage == "stage2_all"
                                    and args.optimizer == "pallas"
                                    and args.quant_cache != "off"
                                    and args.dit_quant in
                                    ("int8", "int8_dw", "int8_full")))
            step = image_task.make_train_step(spec_s2, optimizer)
            st = image_task.create_task_state(jax.random.key(0), spec_s2,
                                              optimizer)
            for i in range(2):
                st, m = step(st, s2_batch, jax.random.fold_in(key, i))
            float(m["loss"])
            t0 = time.perf_counter()
            for i in range(args.iters):
                st, m = step(st, s2_batch, jax.random.fold_in(key, 100 + i))
            float(m["loss"])
            results[f"{name}_ms"] = (time.perf_counter() - t0) / args.iters * 1000.0
            results[f"{name}_imgps"] = args.batch / results[f"{name}_ms"] * 1000.0
            print(name, results[f"{name}_ms"], results[f"{name}_imgps"],
                  flush=True)
            del step, st

    if want("cond_bwd"):
        # tower conditioning fwd+bwd through LoRA (the stage-2 hot component)
        spec_s2 = make_spec(stage="stage2_only")
        modules = image_task.init_modules(jax.random.key(0), spec_s2)

        @jax.jit
        def cond_bwd_fn(cp, imgs):
            def loss(cp_):
                c = image_conditioning("clip", cp_, imgs, tower_cfg,
                                       spec_s2.latent_hw,
                                       compute_dtype=jnp.bfloat16)
                return (jnp.sum(c["txt"].astype(jnp.float32) ** 2)
                        + jnp.sum(c["vec"].astype(jnp.float32) ** 2))
            return jax.grad(loss)(cp)

        results["cond_bwd_ms"] = timeit(cond_bwd_fn, modules["clip"],
                                        batch["image"], iters=args.iters)
        print("cond_bwd:", results["cond_bwd_ms"], flush=True)

    if want("step"):
        for name, spec in (("step_f32vae_ms", spec_f32), ("step_bf16vae_ms", spec_bf16)):
            step = image_task.make_train_step(spec, optimizer)
            # fresh state per spec: the step donates its input buffers
            st = image_task.create_task_state(jax.random.key(0), spec, optimizer)
            for i in range(2):
                st, m = step(st, batch, jax.random.fold_in(key, i))
            float(m["loss"])
            t0 = time.perf_counter()
            for i in range(args.iters):
                st, m = step(st, batch, jax.random.fold_in(key, 100 + i))
            float(m["loss"])
            results[name] = (time.perf_counter() - t0) / args.iters * 1000.0
            results[name.replace("_ms", "_imgps")] = args.batch / results[name] * 1000.0
            print(name, results[name], flush=True)
            del step, st

    print(json.dumps(results))


if __name__ == "__main__":
    main()
