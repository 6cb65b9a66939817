"""Video-mode tasks: middle-frame, next-frame, 2-frame, sliding-window.

One parameterized implementation covers the four reference trainer families
(SURVEY.md §2.4):

  * middle   — cond (start t=0, end t=2) -> target middle t=1
               (train_OpenAICLIP_video_stage1.py:373-438)
  * next     — cond (current t=0) -> target next t=1
               (train_OpenAICLIP_nextpredic_stage1.py)
  * next2    — cond (t=0, t=1) -> target t=2
               (train_OpenAICLIP_use2frames_nextpredic_stage1.py)
  * sliding  — cond (t=0,1,2) -> target t=3 over per-video windows
               (train_OpenAICLIP_sliding_windows_nextpredic_stage1.py:149-209)

Conditioning uses tower *patch tokens* through the VisualPromptAdapter with
spatio-temporal RoPE ids; ``y`` is the mean of the frames' projected class
tokens.  Sliding-window batches arrive pre-windowed from the host data layer
([B_windows, ...] + validity mask) so jit shapes stay static — the window
gather is cheap CPU indexing (replacing the reference's per-video Python loop
on device time).

Stage 2 adds tower LoRA (all-linear, r=16) with the tower forward inside the
autodiff graph (train_OpenAICLIP_video_stage2_all.py:207-218).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..models import dit as dit_m
from ..models import vae as vae_m
from ..models.towers import clip as clip_m
from ..models.towers import siglip as siglip_m
from ..models.towers import projectors as proj_m
from ..train import flow, lora as lora_m
from ..train.state import TrainState, create_state, unflatten_params, apply_gradients
from .conditioning import (normalize, tower_stats, tower_features,
                           video_conditioning, VAE_MEAN, VAE_STD)


VIDEO_MODES: Dict[str, Dict] = {
    "middle": {"n_cond": 2, "frame_times": (0.0, 2.0), "target_time": 1.0},
    "next": {"n_cond": 1, "frame_times": (0.0,), "target_time": 1.0},
    "next2": {"n_cond": 2, "frame_times": (0.0, 1.0), "target_time": 2.0},
    "sliding": {"n_cond": 3, "frame_times": (0.0, 1.0, 2.0), "target_time": 3.0},
}


@dataclass(frozen=True)
class VideoTaskSpec:
    mode: str                        # key into VIDEO_MODES
    stage: str                       # "stage1" | "stage2_all"
    tower_kind: str
    img_size: int
    clip_image_size: int
    dit_cfg: dit_m.DiTConfig
    vae_cfg: vae_m.VAEConfig
    tower_cfg: object
    clip_dim: int = 768
    t5_dim: int = 4096
    adapter_in_dim: int = 1024       # CLIP-L patch width
    scale_factor: float = 1.0
    guidance: float = 4.0
    lora_r: int = 16
    lora_alpha: float = 16.0
    lora_targets: object = "all-linear"
    lora_dropout: float = 0.0          # reference stage-2 configs: 0.1
    remat: bool = False
    remat_policy: str = "full"           # see image.TaskSpec.remat_policy
    tower_remat: bool = False            # see image.TaskSpec.tower_remat
    compute_dtype: object = jnp.bfloat16
    dit_param_dtype: object = jnp.bfloat16   # reference parity (bf16 DiT params)
    vae_dtype: object = jnp.float32          # fp32 = reference parity; bf16 = faster
    tower_quant: str = "none"                # int8 frozen tower (stage 1)
    vae_quant: str = "none"                  # int8 encoder convs
    vae_quant_min_ch: int = 256              # see image.TaskSpec.vae_quant_min_ch
    dit_quant: str = "none"                  # switchback int8 DiT training
    dit_quant_cache: bool = False            # optimizer-fused W quant cache
    sequence_parallel: int = 1               # ring attention (image.TaskSpec)
    pipeline_parallel: int = 1               # GPipe depth pipeline (parallel/pp.py)
    pipeline_microbatches: int = 0           # 0 = auto (= pipeline stages)
    fsdp: bool = False                       # ZeRO-3 params (image.TaskSpec)

    @property
    def n_cond(self) -> int:
        return VIDEO_MODES[self.mode]["n_cond"]

    @property
    def frame_times(self) -> Tuple[float, ...]:
        return VIDEO_MODES[self.mode]["frame_times"]

    @property
    def target_time(self) -> float:
        return VIDEO_MODES[self.mode]["target_time"]

    @property
    def latent_hw(self) -> Tuple[int, int]:
        f = 2 ** (len(self.vae_cfg.ch_mult) - 1)   # f8 for the FLUX VAE
        return (self.img_size // f, self.img_size // f)

    @property
    def patch_grid(self) -> int:
        # 24 for 336px CLIP-L/14 (hardcoded H_patch,W_patch=24 in the
        # reference, train_OpenAICLIP_video_stage1.py:403); general: size/14
        return self.clip_image_size // (
            self.tower_cfg.vision.patch_size if hasattr(self.tower_cfg, "vision") else 14)


def init_modules(key: jax.Array, spec: VideoTaskSpec,
                 tower_params=None, vae_params=None) -> Dict:
    ks = jax.random.split(key, 6)
    if tower_params is None:
        init_tower = (siglip_m.init_siglip if spec.tower_kind == "siglip"
                      else clip_m.init_clip)
        tower_params = init_tower(ks[0], spec.tower_cfg)
    if vae_params is None:
        vae_params = vae_m.init_vae(ks[1], spec.vae_cfg)
    from ..core.nn import tree_cast
    modules = {
        "dit": tree_cast(dit_m.init_dit(ks[2], spec.dit_cfg), spec.dit_param_dtype),
        "vae": vae_params,
        "clip": {
            "model": tower_params,
            # saved for checkpoint-layout parity though unused by the video
            # forward (the reference marks it trainable but it receives no
            # grads, train_OpenAICLIP_video_stage1.py:210-214)
            "project_clip": proj_m.init_projector(ks[3], spec.clip_dim, spec.clip_dim),
        },
        "visual_adapter": proj_m.init_visual_adapter(ks[4], spec.adapter_in_dim,
                                                     spec.t5_dim),
    }
    if spec.stage == "stage2_all":
        modules["clip"]["model"], _ = lora_m.inject(
            modules["clip"]["model"], jax.random.fold_in(key, 99),
            r=spec.lora_r, alpha=spec.lora_alpha, targets=spec.lora_targets)
    if spec.tower_quant == "int8":
        from ..core import quant
        if spec.stage == "stage2_all":
            # QLoRA-style: int8 factors alongside the KEPT bf16 base — the
            # base weight must survive for the LoRA merge + HF export
            modules["clip"]["model"] = quant.quantize_lora_base(
                modules["clip"]["model"])
        else:
            modules["clip"]["model"] = quant.quantize_linear_tree(
                modules["clip"]["model"])
    if spec.vae_quant == "int8":
        from ..core import quant
        modules["vae"] = dict(
            modules["vae"],
            encoder=quant.quantize_conv_tree(modules["vae"]["encoder"],
                                             min_channels=spec.vae_quant_min_ch))
    return modules


def trainable_predicate(spec: VideoTaskSpec, modules) -> Callable[[str], bool]:
    lora_paths = set()
    if spec.stage == "stage2_all":
        lora_paths = {"clip.model." + p
                      for p in lora_m.lora_trainable_paths(modules["clip"]["model"])}

    def pred(path: str) -> bool:
        if path.startswith("dit.") or path.startswith("visual_adapter."):
            return True
        return path in lora_paths

    return pred


def make_loss_fn(spec: VideoTaskSpec, mesh=None):
    from .image import (_anchor_ctx_factory, _dit_apply_factory,
                        _ring_ctx_factory)
    ring_ctx = _ring_ctx_factory(spec, mesh)
    anchor_ctx = _anchor_ctx_factory(spec, mesh)
    dit_apply = _dit_apply_factory(spec, mesh)

    def loss_fn(trainable, frozen, batch, key, quant=None):
        from ..train.state import merged_quant_flat
        params = unflatten_params({**frozen, **trainable,
                                   **merged_quant_flat(quant)})
        valid = batch.get("valid")    # [B] bool or None
        k_vae, k_t, k_noise, k_drop = jax.random.split(key, 4)

        if "moments" in batch:
            # precomputed conditioning (data.precompute): frozen VAE/tower
            # ran offline; posterior sampled fresh from cached moments.
            # Stage-1 only (the factory rejects stage-2, which trains the
            # tower and must see live features).
            z = vae_m.diagonal_gaussian(k_vae, batch["moments"].astype(jnp.float32))
            x1_lat = spec.vae_cfg.scale_factor * (z - spec.vae_cfg.shift_factor)
            x1 = dit_m.pack_latent(x1_lat).astype(jnp.float32)
            patches = batch["cond_patches"].astype(spec.compute_dtype)
            vecs = batch["cond_vecs"].astype(spec.compute_dtype)
            b, n_cond = patches.shape[0], patches.shape[1]
        else:
            cond = batch["cond"]          # [B, n_cond, H, W, 3] in [0, 1]
            target = batch["target"]      # [B, H, W, 3]
            b, n_cond = cond.shape[0], cond.shape[1]

            vae_in = normalize(target, VAE_MEAN, VAE_STD).astype(jnp.float32)
            x1_lat = vae_m.vae_encode(params["vae"], spec.vae_cfg, vae_in, k_vae,
                                      dtype=spec.vae_dtype)
            x1 = dit_m.pack_latent(x1_lat).astype(jnp.float32)

            # one batched tower pass over all conditioning frames
            mean, std = tower_stats(spec.tower_kind)
            px = normalize(cond.reshape((b * n_cond,) + cond.shape[2:]), mean, std)
            px = px.astype(spec.compute_dtype)
            tower_in = params["clip"]
            if spec.stage == "stage1":
                tower_in = jax.lax.stop_gradient(tower_in)  # torch.no_grad parity
            # LoRA dropout applies only to LoRA-wrapped linears (stage-2 tower)
            from ..core.nn import lora_dropout_ctx
            from ..models.towers.encoder import tower_remat_scope
            with lora_dropout_ctx(k_drop, spec.lora_dropout), \
                 tower_remat_scope(spec.tower_remat):
                vecs_flat, patches_flat = tower_features(spec.tower_kind, tower_in,
                                                         px, spec.tower_cfg)
            lp, dt = patches_flat.shape[1], patches_flat.shape[2]
            patches = patches_flat.reshape(b, n_cond, lp, dt)
            vecs = vecs_flat.reshape(b, n_cond, -1)

        dit_in = video_conditioning(
            params,
            [patches[:, i] for i in range(n_cond)],
            [vecs[:, i] for i in range(n_cond)],
            spec.latent_hw, spec.patch_grid, spec.target_time, spec.frame_times,
            compute_dtype=spec.compute_dtype)

        t = flow.sample_timesteps(k_t, b, spec.scale_factor)
        x0 = jax.random.normal(k_noise, x1.shape, jnp.float32)
        xt = flow.interpolate(x1, x0, t)
        guidance = jnp.full((b,), spec.guidance, spec.compute_dtype)

        import contextlib
        from ..core.nn import int8_training_ctx
        with (int8_training_ctx(full=spec.dit_quant == "int8_full",
                                dw_int8=spec.dit_quant == "int8_dw")
              if spec.dit_quant in ("int8", "int8_full", "int8_dw")
              else contextlib.nullcontext()), ring_ctx():
            pred = dit_apply(
                params["dit"], spec.dit_cfg,
                img=xt.astype(spec.compute_dtype), img_ids=dit_in["img_ids"],
                txt=dit_in["txt"].astype(spec.compute_dtype), txt_ids=dit_in["txt_ids"],
                timesteps=t.astype(spec.compute_dtype),
                y=dit_in["vec"], guidance=guidance, remat=spec.remat,
                remat_policy=spec.remat_policy)

        return flow.mse_loss(pred, flow.velocity_target(x1, x0), mask=valid)

    def loss_fn_scoped(*a, **kw):
        with anchor_ctx():
            return loss_fn(*a, **kw)

    return loss_fn_scoped


def make_train_step(spec: VideoTaskSpec, optimizer, mesh=None):
    loss_fn = make_loss_fn(spec, mesh)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, key):
        loss, grads = jax.value_and_grad(
            lambda tp: loss_fn(tp, state.frozen, batch, key,
                               state.quant))(state.trainable)
        new_state = apply_gradients(state, grads, optimizer)
        import optax
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return step


def create_task_state(key: jax.Array, spec: VideoTaskSpec, optimizer,
                      tower_params=None, vae_params=None) -> TrainState:
    modules = init_modules(key, spec, tower_params, vae_params)
    pred = trainable_predicate(spec, modules)
    state = create_state(modules, pred, optimizer)
    if spec.dit_quant_cache and spec.dit_quant in ("int8", "int8_dw", "int8_full"):
        from ..train.state import with_quant_cache
        state = with_quant_cache(state)
    return state
