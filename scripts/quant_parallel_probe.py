"""Probe: the shipped fast stack (dit_quant int8_full + fused_optimizer
pallas + quant cache) under DP / TP / ZeRO-1 on the 8-device CPU mesh.

Questions (VERDICT r4 missing #1):
  A. DP8 loss parity vs single-device, cache stays == quantize_weight(W)
     and replicated over the data axis?
  B. TP2 x int8_full: does it run / match pure DP?
  C. ZeRO-1 (shard_over_data on moments) x pallas optimizer: numerics +
     do the moments STAY sharded after a step (or does the custom call
     force an all-gather and replicate them)?
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["GENHANCER_PALLAS_ATTN"] = "0"
os.environ["GENHANCER_PALLAS_INTERPRET"] = "1"

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from genhancer_tpu.models import dit as dit_m, vae as vae_m
from genhancer_tpu.models.towers import clip as clip_m
from genhancer_tpu.parallel import mesh as mesh_m
from genhancer_tpu.tasks import image as image_task
from genhancer_tpu.train import optim
from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS
from genhancer_tpu.core.quant import quantize_weight


def fast_spec(stage="stage1"):
    dit_cfg = dit_m.DiTConfig(in_channels=16, vec_in_dim=24,
                              context_in_dim=32, hidden_size=512,
                              num_heads=4, depth=1, depth_single_blocks=1,
                              axes_dim=(32, 48, 48))
    vae_cfg = vae_m.VAEConfig(resolution=32, ch=8, ch_mult=(1, 2),
                              z_channels=4)
    tower_cfg = clip_m.CLIPConfig(
        vision=clip_m.CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                                       num_layers=1, num_heads=2,
                                       image_size=28, patch_size=14),
        text=clip_m.CLIPTextConfig(hidden_size=32, intermediate_size=64,
                                   num_layers=1, num_heads=2, vocab_size=50,
                                   max_position_embeddings=8),
        projection_dim=24)
    return image_task.TaskSpec(
        stage=stage, tower_kind="clip", img_size=32, clip_image_size=28,
        dit_cfg=dit_cfg, vae_cfg=vae_cfg, tower_cfg=tower_cfg,
        clip_dim=24, t5_dim=32, lora_r=2, lora_targets=("q_proj", "v_proj"),
        compute_dtype=jnp.float32, dit_param_dtype=jnp.float32,
        tower_quant="int8", vae_quant="int8",
        dit_quant="int8_full", dit_quant_cache=True)


def make_opt():
    cfg = Config(dict(TRAIN_DEFAULTS))
    return optim.make_optimizer(cfg, fused="pallas", emit_quant=True)


def batch8():
    rng = np.random.default_rng(3)
    return {"image": jnp.asarray(rng.random((8, 32, 32, 3)), np.float32)}


def run(mesh=None, tp=1, zero1=False, steps=3):
    spec = fast_spec()
    opt = make_opt()
    state = image_task.create_task_state(jax.random.key(0), spec, opt)
    assert state.quant, "cache must be enabled"
    if mesh is not None:
        state = mesh_m.replicate(state, mesh)
        if tp > 1:
            from genhancer_tpu.parallel import tp as tp_m
            tp_m.validate_tp(spec.dit_cfg, tp)
            trainable, placements = tp_m.shard_dit_params(state.trainable, mesh)
            state = state.replace(
                trainable=trainable,
                opt_state=tp_m.shard_like_params(state.opt_state, placements, mesh))
        if zero1:
            state = state.replace(
                opt_state=mesh_m.shard_over_data(state.opt_state, mesh))
    step = image_task.make_train_step(spec, opt)
    batch = batch8()
    if mesh is not None:
        batch = mesh_m.shard_batch(batch, mesh)
    losses = []
    for i in range(steps):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    return losses, state


def cache_report(state, tag):
    ok = True
    for path, (wq, ws) in state.quant.items():
        wq_ref, ws_ref = quantize_weight(state.trainable[path], axis=0)
        if not np.array_equal(np.asarray(wq), np.asarray(wq_ref)):
            diff = int(np.sum(np.asarray(wq) != np.asarray(wq_ref)))
            print(f"  [{tag}] cache MISMATCH {path}: {diff}/{wq.size} int8 cells")
            ok = False
        sh = wq.sharding
        print(f"  [{tag}] {path}: wq sharding spec={getattr(sh, 'spec', sh)}")
    print(f"  [{tag}] cache consistent: {ok}")


def moment_shard_report(state, tag, n=8):
    sharded = replicated = 0
    for leaf in jax.tree_util.tree_leaves(state.opt_state):
        if getattr(leaf, "ndim", 0) >= 1 and leaf.shape and leaf.shape[0] % n == 0 and leaf.size > 1000:
            spec = getattr(leaf.sharding, "spec", None)
            if spec and spec[0] == mesh_m.DATA_AXIS:
                sharded += 1
            else:
                replicated += 1
    print(f"  [{tag}] large moment leaves: sharded={sharded} replicated={replicated}")


print("=== A. single device (no mesh) ===")
l_single, st_single = run(mesh=None)
print("  losses:", l_single)
cache_report(st_single, "single")

print("=== A. DP8 mesh ===")
mesh = mesh_m.make_mesh(8)
l_dp, st_dp = run(mesh=mesh)
print("  losses:", l_dp)
print("  max |dp - single| loss:", max(abs(a - b) for a, b in zip(l_dp, l_single)))
cache_report(st_dp, "dp8")

print("=== B. TP2 x int8_full ===")
mesh_tp = mesh_m.make_mesh(8, model_parallel=2)
try:
    l_tp, st_tp = run(mesh=mesh_tp, tp=2)
    print("  losses:", l_tp)
    print("  max |tp - single| loss:", max(abs(a - b) for a, b in zip(l_tp, l_single)))
    qkv = st_tp.trainable["dit.double_blocks.0.img.attn.qkv.weight"]
    print("  qkv sharding after steps:", qkv.sharding.spec)
    cache_report(st_tp, "tp2")
except Exception as e:
    print("  TP2 x int8_full FAILED:", type(e).__name__, str(e)[:500])

print("=== C. ZeRO-1 x pallas optimizer ===")
try:
    l_z, st_z = run(mesh=mesh, zero1=True)
    print("  losses:", l_z)
    print("  max |zero1 - single| loss:", max(abs(a - b) for a, b in zip(l_z, l_single)))
    moment_shard_report(st_z, "zero1")
except Exception as e:
    print("  ZeRO-1 x pallas FAILED:", type(e).__name__, str(e)[:500])
