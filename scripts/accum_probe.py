"""Attribute gradient-accumulation overhead on the precomputed stage-1 step.

accum-2 ideal = 2 x (accum-1 minus its once-per-step optimizer cost) + one
optimizer application.  Measured r4: accum1 193-205 ms, accum2 unrolled
410.8 ms -> ~45 ms unexplained.  Variants isolate the suspects:

  a1          accum-1 baseline (image_task.make_train_step on pre batch)
  a2          shipped unrolled accum-2 (make_accum_train_step)
  a2_nonorm   accum-2 without the optax.global_norm metric (a full extra
              2.6 GB grad-tree read if unfused)
  a2_barrier  accum-2 with lax.optimization_barrier serializing micro-1's
              grads before micro-2's forward (scheduler hint: keeps one
              micro-batch's residuals live at a time)

ONE TPU job at a time.  python scripts/accum_probe.py --variants a1,a2,...
"""
import argparse
import functools
import time

import numpy as np


def time_step(step, state, batch, iters=15, warmup=3):
    """step donates state -> rebind each call (bench._run_steps pattern).

    Sync via a host read of the loss, NOT block_until_ready: over the axon
    relay block_until_ready resolves on the handle, not the computation —
    it measured a 193 ms step as 6.7 ms."""
    import jax
    m = None
    for i in range(warmup):
        state, m = step(state, batch, jax.random.key(i))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.key(100 + i))
    float(m["loss"])
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--quant", type=str, default="int8_full")
    ap.add_argument("--variants", type=str,
                    default="a1,a2,a2_nonorm,a2_barrier")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from genhancer_tpu.models import dit as dit_m
    from genhancer_tpu.models import vae as vae_m
    from genhancer_tpu.models.towers import clip as clip_m
    from genhancer_tpu.tasks import image as image_task
    from genhancer_tpu.tasks.image import make_loss_fn
    from genhancer_tpu.train import optim
    from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS
    from genhancer_tpu.train.state import apply_gradients

    dit_cfg = dit_m.DIT_CONFIGS["flux-dev"]
    vae_cfg = vae_m.VAE_CONFIGS["flux-dev"]
    tower_cfg = clip_m.CLIP_VARIANTS["clip-vit-large-patch14"]
    q8 = args.quant in ("int8", "int8_dw", "int8_full")

    spec = image_task.TaskSpec(
        stage="stage1", tower_kind="clip", img_size=args.img,
        clip_image_size=224, dit_cfg=dit_cfg, vae_cfg=vae_cfg,
        tower_cfg=tower_cfg, clip_dim=768, t5_dim=4096,
        compute_dtype=jnp.bfloat16, dit_param_dtype=jnp.bfloat16,
        vae_dtype=jnp.bfloat16,
        tower_quant=("int8" if q8 else "none"),
        vae_quant=("int8" if q8 else "none"),
        dit_quant=args.quant if q8 else "none",
        dit_quant_cache=q8)

    cfg = Config(dict(TRAIN_DEFAULTS))
    optimizer = optim.make_optimizer(cfg, fused="pallas" if q8 else False,
                                     emit_quant=q8)
    loss_fn = make_loss_fn(spec)

    rng = np.random.default_rng(0)
    h, w = spec.latent_hw
    zc = 2 * vae_cfg.z_channels
    micro = {
        "moments": jnp.asarray(
            rng.normal(size=(args.batch, h, w, zc)).astype(np.float32) * 0.3),
        "cls": jnp.asarray(
            rng.normal(size=(args.batch, 768)).astype(np.float32)),
    }
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.stack([x, x]), micro)

    def micro_grads(state, m, k, inv):
        return jax.value_and_grad(
            lambda tp: loss_fn(tp, state.frozen, m, k,
                               state.quant) * inv)(state.trainable)

    def make_a2(norm=True, barrier=False):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, sb, key):
            keys = jax.random.split(key, 2)
            m0 = jax.tree_util.tree_map(lambda x: x[0], sb)
            m1 = jax.tree_util.tree_map(lambda x: x[1], sb)
            loss0, grads = micro_grads(state, m0, keys[0], 0.5)
            if barrier:
                grads, m1 = jax.lax.optimization_barrier((grads, m1))
            loss1, g1 = micro_grads(state, m1, keys[1], 0.5)
            grads = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(a.dtype), grads, g1)
            new_state = apply_gradients(state, grads, optimizer)
            m = {"loss": loss0 + loss1}
            if norm:
                m["grad_norm"] = optax.global_norm(grads)
            return new_state, m
        return step

    variants = args.variants.split(",")
    out = {}
    for v in variants:
        state = image_task.create_task_state(jax.random.key(0), spec,
                                             optimizer)
        if v == "a1":
            step = image_task.make_train_step(spec, optimizer)
            ms = time_step(step, state, micro, iters=args.iters)
        else:
            step = make_a2(norm=(v != "a2_nonorm"),
                           barrier=(v == "a2_barrier"))
            ms = time_step(step, state, stacked, iters=args.iters)
        n_img = args.batch * (1 if v == "a1" else 2)
        out[v] = ms
        print(f"{v:12s} {ms:8.2f} ms/step  {n_img / ms * 1000.0:7.2f} img/s",
              flush=True)
        del state, step

    if "a1" in out and "a2" in out:
        print(f"accum-2 overhead vs 2x accum-1: "
              f"{out['a2'] - 2 * out['a1']:+.2f} ms "
              f"(negative = optimizer amortization winning)")


if __name__ == "__main__":
    main()
