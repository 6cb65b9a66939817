"""Image-mode tasks: stage-1 (projectors + DiT) and stage-2 (tower LoRA).

Reference trainers covered (SURVEY.md §2.4): train_{SigLIP,MetaCLIP}_stage1,
train_{SigLIP,MetaCLIP}_stage2_{only,all} — all share the flow-matching
skeleton (``train_SigLIP_stage1.py:234-275``); they differ only in tower
family, LoRA targets, and which modules train.  Here that matrix is one task
builder parameterized by ``TaskSpec``.

The whole step — VAE encode, tower forward, projectors, logit-normal t,
interpolation, DiT forward/backward, AdamW — is a single jit region; the
batch is sharded over the mesh's data axis and XLA inserts the gradient
all-reduce (replacing Accelerate/DDP/NCCL, SURVEY.md §5.8).
"""

from __future__ import annotations

import contextlib
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
from .conditioning import image_conditioning, normalize, VAE_MEAN, VAE_STD


@dataclass(frozen=True)
class TaskSpec:
    """Static description of one training task."""
    stage: str                       # "stage1" | "stage2_only" | "stage2_all"
    tower_kind: str                  # "clip" | "siglip"
    img_size: int                    # VAE input resolution
    clip_image_size: int
    dit_cfg: dit_m.DiTConfig
    vae_cfg: vae_m.VAEConfig
    tower_cfg: object                # CLIPConfig | SiglipConfig
    clip_dim: int = 768
    t5_dim: int = 4096
    scale_factor: float = 1.0
    guidance: float = 4.0
    lora_r: int = 16
    lora_alpha: float = 16.0
    lora_targets: object = "all-linear"
    lora_bias: str = "lora_only"
    lora_dropout: float = 0.0          # reference stage-2 configs: 0.1
    remat: bool = False
    # per-block jax.checkpoint policy when remat is on (models/dit.py
    # REMAT_POLICIES): "full" recomputes everything, "save_attn" stores each
    # block's attention output, "dots" saves all non-batch matmul outputs
    remat_policy: str = "full"
    # jax.checkpoint each TOWER encoder layer (stage-2 only: stage-1's
    # frozen tower saves nothing).  models/towers/encoder.tower_remat_scope;
    # auto-gated by the factory for multi-frame video stage-2 @336 where
    # tower-under-autodiff activations OOM one chip (train/plan.py term)
    tower_remat: bool = False
    compute_dtype: object = jnp.bfloat16
    # Reference stores DiT params in bf16 (train_SigLIP_stage1.py:132) and
    # runs AdamW directly on them; bf16 halves HBM for params+moments+grads.
    dit_param_dtype: object = jnp.bfloat16
    vae_dtype: object = jnp.float32   # fp32 = reference parity; bf16 = faster
    # int8 (core.quant) for the FROZEN compute: v5e runs int8 at 2x bf16.
    # tower_quant applies in stage 1 (frozen teacher) and as a QLoRA-style
    # frozen base in stage 2; vae_quant quantizes the encoder convs.
    tower_quant: str = "none"         # "none" | "int8"
    vae_quant: str = "none"           # "none" | "int8"
    # int8 only for convs at >= this many channels (core.quant.
    # INT8_CONV_MIN_CH rationale: below 256 ch the int8 conv emitter loses
    # to bf16 on v5e); tests lower it to engage int8 on debug models
    vae_quant_min_ch: int = 256
    # SwitchBack int8 training for the (trainable) DiT: int8 fwd + int8 dx,
    # bf16 dW (core.quant.switchback_linear, arXiv:2304.13013).  "int8_full"
    # additionally runs dW on the int8 MXU with per-channel scales via XLA
    # (experimental); "int8_dw" runs dW through the Pallas per-block-quant
    # kernel (core.pallas.int8_dw — fused quant, finer scales).
    dit_quant: str = "none"           # "none" | "int8" | "int8_full" | "int8_dw"
    # Optimizer-maintained int8 weight cache (core.quant.switchback_linear_
    # cached): only pays when the optimizer emits it fused (fused_optimizer:
    # pallas + emit_quant) — with the optax chain the XLA cache refresh is
    # separate full passes over W (measured +33 ms at ~1B params), so the
    # factory enables this only alongside the pallas optimizer.
    dit_quant_cache: bool = False
    # Ring-attention sequence parallelism (parallel/ring.py): >1 shards the
    # DiT's token axis over a ``seq`` mesh axis — attention runs as a
    # ppermute ring, per-token ops shard via GSPMD propagation.  Requires a
    # mesh built with make_mesh(sequence_parallel=N); indivisible joint
    # token counts are padded inside the ring (pad keys masked to -inf).
    sequence_parallel: int = 1
    # GPipe pipeline parallelism (parallel/pp.py): >1 shards the DiT's
    # DEPTH over a ``pipe`` mesh axis — each device runs depth/pp blocks,
    # microbatches flow stage-to-stage via ppermute.  Requires a mesh built
    # with make_mesh(pipeline_parallel=N); composes with data parallelism
    # (+ ZeRO-1) only.
    pipeline_parallel: int = 1
    pipeline_microbatches: int = 0   # 0 = auto (= pipeline_parallel stages)
    # FSDP/ZeRO-3 (parallel/fsdp.py): params sharded over the data axis.
    # The loss opens core.attention.batch_anchor_scope so attention operands
    # are pinned to the canonical activation layout — without it GSPMD can
    # propagate a weight's data-axis sharding through the head-split reshape
    # into a tiling the Pallas custom_partitioning cannot express.
    fsdp: bool = False

    @property
    def latent_hw(self) -> Tuple[int, int]:
        f = 2 ** (len(self.vae_cfg.ch_mult) - 1)   # f8 for the FLUX VAE
        return (self.img_size // f, self.img_size // f)

    @property
    def tower_hidden(self) -> int:
        return (self.tower_cfg.vision.hidden_size if self.tower_kind == "siglip"
                else self.tower_cfg.projection_dim)


def init_modules(key: jax.Array, spec: TaskSpec,
                 tower_params=None, vae_params=None) -> Dict:
    """Random-init (or adopt pretrained) module trees.

    Layout mirrors the reference SuperModel: ``clip = {model, project_clip,
    project_t5}`` (CLIP_bank.py), ``dit``, ``vae``.
    """
    ks = jax.random.split(key, 5)
    if tower_params is None:
        init_tower = (siglip_m.init_siglip if spec.tower_kind == "siglip"
                      else clip_m.init_clip)
        tower_params = init_tower(ks[0], spec.tower_cfg)
    if vae_params is None:
        vae_params = vae_m.init_vae(ks[1], spec.vae_cfg)
    d = spec.tower_hidden
    from ..core.nn import tree_cast
    modules = {
        "dit": tree_cast(dit_m.init_dit(ks[2], spec.dit_cfg), spec.dit_param_dtype),
        "vae": vae_params,
        "clip": {
            "model": tower_params,
            "project_clip": proj_m.init_projector(ks[3], d, spec.clip_dim),
            "project_t5": proj_m.init_projector(ks[4], d, spec.t5_dim),
        },
    }
    if spec.stage in ("stage2_only", "stage2_all"):
        modules["clip"]["model"], _ = lora_m.inject(
            modules["clip"]["model"], jax.random.fold_in(key, 99),
            r=spec.lora_r, alpha=spec.lora_alpha, targets=spec.lora_targets)
    if spec.tower_quant == "int8":
        from ..core import quant
        if spec.stage in ("stage2_only", "stage2_all"):
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
    if spec.stage == "stage2_only" and spec.dit_quant != "none":
        # the DiT is FROZEN in stage2_only — SwitchBack would compute a dW
        # that is immediately discarded; a static int8 base (int8 fwd +
        # int8 dx, no dW) is the right quantization.  The bf16 master is
        # kept so stage-1 checkpoint loads still land on .weight — the
        # trainer refreshes the factors after load
        # (quant.refresh_static_quant_flat).
        from ..core import quant
        modules["dit"] = quant.quantize_lora_base(modules["dit"])
    return modules


def trainable_predicate(spec: TaskSpec, modules) -> Callable[[str], bool]:
    """Which flat paths train — parity with the reference requires_grad setup:
    stage1: projectors + DiT (train_SigLIP_stage1.py:131,137-141);
    stage2_only: tower LoRA only; stage2_all: LoRA + DiT + projectors."""
    lora_paths = set()
    if spec.stage in ("stage2_only", "stage2_all"):
        lora_paths = {"clip.model." + p if not p.startswith("clip.model") else p
                      for p in lora_m.lora_trainable_paths(modules["clip"]["model"])}

    def pred(path: str) -> bool:
        if spec.stage == "stage1":
            return (path.startswith("dit.")
                    or ".project_clip." in path or ".project_t5." in path)
        if spec.stage == "stage2_only":
            return path in lora_paths
        if spec.stage == "stage2_all":
            return (path in lora_paths or path.startswith("dit.")
                    or ".project_clip." in path or ".project_t5." in path)
        raise ValueError(spec.stage)

    return pred


def make_loss_fn(spec: TaskSpec, mesh=None):
    ring_ctx = _ring_ctx_factory(spec, mesh)
    anchor_ctx = _anchor_ctx_factory(spec, mesh)
    dit_apply = _dit_apply_factory(spec, mesh)

    def loss_fn(trainable, frozen, batch, key, quant=None):
        from ..train.state import merged_quant_flat
        params = unflatten_params({**frozen, **trainable,
                                   **merged_quant_flat(quant)})
        k_vae, k_t, k_noise, k_drop = jax.random.split(key, 4)

        # The moments/cls batch keys gate the two frozen paths independently
        # (trace-time branches — data.precompute):
        #   {image}               inline: VAE + tower live
        #   {moments, cls}        stage-1 features cache: both skipped
        #   {moments, image}      latent cache: VAE skipped, tower live on
        #                         the cached crop (the only legal cache for
        #                         stage-2, which trains the tower)
        if "moments" in batch:
            # the frozen VAE encoder ran offline; sample the posterior fresh
            # from the cached moments (same key split -> same distribution)
            z = vae_m.diagonal_gaussian(k_vae, batch["moments"].astype(jnp.float32))
            x1_lat = spec.vae_cfg.scale_factor * (z - spec.vae_cfg.shift_factor)
            b = batch["moments"].shape[0]
        else:
            imgs = batch["image"]                   # [B, H, W, 3] in [0, 1]
            # frozen fp32 VAE encode (train_SigLIP_stage1.py:242-243)
            vae_in = normalize(imgs, VAE_MEAN, VAE_STD).astype(jnp.float32)
            x1_lat = vae_m.vae_encode(params["vae"], spec.vae_cfg, vae_in, k_vae,
                                      dtype=spec.vae_dtype)
            b = batch["image"].shape[0]
        x1 = dit_m.pack_latent(x1_lat).astype(jnp.float32)

        if "cls" in batch:
            from .conditioning import image_conditioning_from_cls
            cond = image_conditioning_from_cls(
                params["clip"], batch["cls"], spec.latent_hw,
                compute_dtype=spec.compute_dtype)
        else:
            # LoRA dropout (peft parity, train_SigLIP_stage2_all.py:134-143)
            # applies only to LoRA-wrapped linears, i.e. the stage-2 tower.
            from ..core.nn import lora_dropout_ctx
            from ..models.towers.encoder import tower_remat_scope
            with lora_dropout_ctx(k_drop, spec.lora_dropout), \
                 tower_remat_scope(spec.tower_remat):
                cond = image_conditioning(spec.tower_kind, params["clip"],
                                          batch["image"], spec.tower_cfg,
                                          spec.latent_hw,
                                          compute_dtype=spec.compute_dtype)
        t = flow.sample_timesteps(k_t, b, spec.scale_factor)
        x0 = jax.random.normal(k_noise, x1.shape, jnp.float32)
        xt = flow.interpolate(x1, x0, t)
        guidance = jnp.full((b,), spec.guidance, spec.compute_dtype)

        from ..core.nn import int8_training_ctx
        # stage2_only: the DiT is frozen and statically quantized at init
        # (init_modules) — the SwitchBack training ctx does not apply
        with (int8_training_ctx(full=spec.dit_quant == "int8_full",
                                dw_int8=spec.dit_quant == "int8_dw")
              if (spec.dit_quant in ("int8", "int8_full", "int8_dw")
                  and spec.stage != "stage2_only")
              else contextlib.nullcontext()), ring_ctx():
            pred = dit_apply(
                params["dit"], spec.dit_cfg,
                img=xt.astype(spec.compute_dtype), img_ids=cond["img_ids"],
                txt=cond["txt"].astype(spec.compute_dtype), txt_ids=cond["txt_ids"],
                timesteps=t.astype(spec.compute_dtype),
                y=cond["vec"].astype(spec.compute_dtype),
                guidance=guidance, remat=spec.remat,
                remat_policy=spec.remat_policy)

        # "valid" gates batch rows padded up to the device count (the trainer
        # pads instead of shrinking the mesh when bs % devices != 0)
        return flow.mse_loss(pred, flow.velocity_target(x1, x0),
                             mask=batch.get("valid"))

    def loss_fn_scoped(*a, **kw):
        with anchor_ctx():
            return loss_fn(*a, **kw)

    return loss_fn_scoped


def _ring_ctx_factory(spec, mesh):
    """Shared by image/video tasks: a () -> contextmanager opening the
    ring-attention scope when the spec asks for sequence parallelism."""
    if getattr(spec, "sequence_parallel", 1) <= 1:
        return contextlib.nullcontext
    if mesh is None:
        raise ValueError(
            f"sequence_parallel={spec.sequence_parallel} needs the mesh: "
            "pass mesh= to make_loss_fn/make_train_step (the trainer builds "
            "it with make_mesh(sequence_parallel=N))")
    from ..parallel import ring as ring_m
    from ..parallel.mesh import SEQ_AXIS
    if mesh.shape.get(SEQ_AXIS, 1) != spec.sequence_parallel:
        raise ValueError(
            f"mesh seq axis {mesh.shape.get(SEQ_AXIS, 1)} != "
            f"spec.sequence_parallel={spec.sequence_parallel}")
    return functools.partial(ring_m.ring_scope, mesh)


def _anchor_ctx_factory(spec, mesh):
    """Shared by image/video tasks: a () -> contextmanager pinning attention
    operands to the canonical activation layout under FSDP (see
    core.attention.batch_anchor_scope)."""
    if not getattr(spec, "fsdp", False):
        return contextlib.nullcontext
    if mesh is None:
        raise ValueError("fsdp: true needs the mesh: pass mesh= to "
                         "make_loss_fn/make_train_step")
    from ..core import attention as attn_m
    return functools.partial(attn_m.batch_anchor_scope, mesh)


def _dit_apply_factory(spec, mesh):
    """Shared by image/video tasks: the DiT forward callable — plain
    dit_forward, or the GPipe pipeline (parallel/pp.py) when the spec asks
    for pipeline parallelism."""
    pp = getattr(spec, "pipeline_parallel", 1)
    if pp <= 1:
        return dit_m.dit_forward
    if mesh is None:
        raise ValueError(
            f"pipeline_parallel={pp} needs the mesh: pass mesh= to "
            "make_loss_fn/make_train_step (the trainer builds it with "
            "make_mesh(pipeline_parallel=N))")
    from ..parallel import pp as pp_m
    from ..parallel.mesh import PIPE_AXIS
    if mesh.shape.get(PIPE_AXIS, 1) != pp:
        raise ValueError(
            f"mesh pipe axis {mesh.shape.get(PIPE_AXIS, 1)} != "
            f"spec.pipeline_parallel={pp}")
    if spec.dit_quant != "none":
        raise ValueError(
            "pipeline_parallel does not compose with dit_quant (the "
            "SwitchBack int8 paths — incl. the optimizer-emitted weight "
            "cache, which is keyed on the unstacked per-block layout — are "
            "not validated under the stage shard_map); set dit_quant: none")
    n_micro = getattr(spec, "pipeline_microbatches", 0) or pp
    return functools.partial(pp_m.pipeline_dit_forward, mesh=mesh,
                             n_micro=n_micro)


def make_train_step(spec: TaskSpec, optimizer, mesh=None):
    """jit-able (state, batch, key) -> (state, metrics)."""
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


def create_task_state(key: jax.Array, spec: TaskSpec, optimizer,
                      tower_params=None, vae_params=None) -> TrainState:
    modules = init_modules(key, spec, tower_params, vae_params)
    pred = trainable_predicate(spec, modules)
    state = create_state(modules, pred, optimizer)
    if spec.dit_quant_cache and spec.dit_quant in ("int8", "int8_dw", "int8_full"):
        # optimizer-maintained int8 weight cache: the forward loads the
        # quantized copy instead of re-quantizing W every step
        from ..train.state import with_quant_cache
        state = with_quant_cache(state)
    return state
