"""Task factory: config -> (spec, loader, step builder, checkpoint kind).

One config-driven dispatcher replaces the reference's 12 monolithic trainer
scripts (SURVEY.md §2.4).  The ``task`` key selects the family:

    image_stage1 / image_stage2_only / image_stage2_all
    video_middle_stage1 / video_middle_stage2_all
    video_next_stage1 / video_next_stage2_all
    video_next2_stage1 / video_next2_stage2_all
    video_sliding_stage1 / video_sliding_stage2_all

with ``tower: openai_clip|siglip|metaclip`` (+ ``clip_config.clip_type`` for
metaclip).  ``cli/train.py`` maps reference trainer-script names onto these
(see TRAINER_COMPAT).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import registry
from ..data import cc3m as cc3m_data
from ..data import video as video_data
from ..train import lora as lora_m
from . import image as image_task
from . import video as video_task


# reference trainer script name -> (task, tower)
TRAINER_COMPAT = {
    "train_SigLIP_stage1": ("image_stage1", "siglip"),
    "train_SigLIP_stage2_only": ("image_stage2_only", "siglip"),
    "train_SigLIP_stage2_all": ("image_stage2_all", "siglip"),
    "train_MetaCLIP_stage1": ("image_stage1", "metaclip"),
    "train_MetaCLIP_stage2_only": ("image_stage2_only", "metaclip"),
    "train_MetaCLIP_stage2_all": ("image_stage2_all", "metaclip"),
    "train_OpenAICLIP_video_stage1": ("video_middle_stage1", "openai_clip"),
    "train_OpenAICLIP_video_stage2_all": ("video_middle_stage2_all", "openai_clip"),
    "train_OpenAICLIP_nextpredic_stage1": ("video_next_stage1", "openai_clip"),
    "train_OpenAICLIP_nextpredic_stage2_all": ("video_next_stage2_all", "openai_clip"),
    "train_OpenAICLIP_use2frames_nextpredic_stage1": ("video_next2_stage1", "openai_clip"),
    "train_OpenAICLIP_use2frames_nextpredic_stage2_all": ("video_next2_stage2_all", "openai_clip"),
    "train_OpenAICLIP_sliding_windows_nextpredic_stage1": ("video_sliding_stage1", "openai_clip"),
    "train_OpenAICLIP_sliding_windows_nextpredic_stage2_all": ("video_sliding_stage2_all", "openai_clip"),
}

_VIDEO_MODE = {"video_middle": "middle", "video_next": "next",
               "video_next2": "next2", "video_sliding": "sliding"}
_LOADER_MODE = {"middle": "triplet", "next": "next", "next2": "next2",
                "sliding": "sliding"}


def _lora_kwargs(cfg, tower: str) -> dict:
    lc = cfg.get("lora_config", {}) or {}
    targets = ("all-linear" if tower in ("openai_clip", "metaclip")
               else lora_m.SIGLIP_TARGETS)
    return dict(lora_r=int(lc.get("r", 16)),
                lora_alpha=float(lc.get("lora_alpha", 16)),
                lora_targets=lc.get("target_modules", targets),
                lora_dropout=float(lc.get("lora_dropout", 0.0)))


def validate_parallelism(cfg, dit_cfg=None) -> None:
    """Config-time rejection of every documented-invalid parallelism
    composition (before any weights load or mesh builds).  The same rules
    are enforced where each mode is materialized — parallel/mesh.make_mesh
    (pp x tp, pp x sp), parallel/fsdp.validate_fsdp (fsdp x pp/sp/pallas-opt),
    parallel/pp.py (depth divisibility) — but those fire mid-build; this
    front door makes `genhancer-train`/`genhancer-plan` fail in milliseconds
    with the same message."""
    tp = int(cfg.get("model_parallel", 1) or 1)
    sp = int(cfg.get("sequence_parallel", 1) or 1)
    pp = int(cfg.get("pipeline_parallel", 1) or 1)
    fsdp = bool(cfg.get("fsdp", False))
    if pp > 1 and (tp > 1 or sp > 1):
        raise ValueError(
            "pipeline_parallel composes with data parallelism only "
            f"(got model_parallel={tp}, sequence_parallel={sp}): TP shards "
            "the weight dims the PP stage stacking slices, and SP's ring "
            "would nest a second shard_map inside the stage body "
            "(parallel/pp.py 'Composition')")
    if fsdp:
        if pp > 1:
            raise ValueError("fsdp does not compose with pipeline_parallel "
                             "(stage stacking owns the param placement)")
        if sp > 1:
            raise ValueError("fsdp does not compose with sequence_parallel "
                             "(the attention anchor does not cover the ring "
                             "path); use shard_optimizer_state with SP")
        if cfg.get("fused_optimizer") == "pallas":
            raise ValueError(
                "fsdp requires the default optax optimizer: the fused Pallas "
                "AdamW would force an all-gather of each sharded param at "
                "the update (no custom_partitioning on the kernel); drop "
                "fused_optimizer or fsdp")
    if pp > 1 and dit_cfg is not None and (
            dit_cfg.depth % pp or dit_cfg.depth_single_blocks % pp):
        raise ValueError(
            f"pipeline_parallel={pp} must divide both depth={dit_cfg.depth} "
            f"and depth_single_blocks={dit_cfg.depth_single_blocks}")


def _check_precomputed(cfg, task: str) -> None:
    dc = cfg.get("data_config", {}) or {}
    if (dc.get("precomputed") and dc.get("precomputed") != "latents"
            and not task.endswith("stage1")):
        # fail before building any model: stage-2 trains the tower (LoRA),
        # so conditioning FEATURES must be computed live.  The latent cache
        # (precomputed: "latents" — moments + crops, no tower features,
        # genhancer-precompute --mode latents) is legal in every stage: the
        # VAE is frozen everywhere and the tower trains on the cached crop.
        raise ValueError(
            "data_config.precomputed (features cache) is stage-1 only: "
            "stage-2 trains the tower (LoRA), so conditioning features must "
            "be computed live.  Use precomputed: 'latents' with a "
            "--mode latents cache to skip just the frozen VAE")


def build_spec(cfg, tower_cfg=None, vae_cfg=None):
    """(spec, tower_kind, ckpt_kind) — the config -> TaskSpec mapping WITHOUT
    loading weights or touching data directories.  ``genhancer-plan`` builds
    on this for shape-only memory/parallelism planning; ``build_task``
    composes it with weight loading and the data loader.

    ``tower_cfg``/``vae_cfg``: registry.load_tower may override the named
    variant's config with a local HF dir's config.json (and tests patch
    registry.build_vae to tiny configs) — build_task passes both in for
    exact parity; standalone callers get the named registry variants."""
    task: str = cfg["task"]
    tower: str = cfg.get("tower", "openai_clip")
    cc = cfg.get("clip_config", {}) or {}
    dc = cfg.get("data_config", {}) or {}
    img_size = int(dc.get("img_size", 224))
    clip_image_size = int(cc.get("clip_image_size", img_size))
    _check_precomputed(cfg, task)

    kind, reg_tower_cfg = registry.tower_family_and_config(
        tower, clip_image_size, cc.get("clip_type"))
    if tower_cfg is None:
        tower_cfg = reg_tower_cfg
    dit_cfg = registry.build_dit_config(cfg.get("model_name", "flux-dev"))
    validate_parallelism(cfg, dit_cfg)
    if vae_cfg is None:
        from ..models.vae import VAE_CONFIGS
        vae_cfg = VAE_CONFIGS[cfg.get("model_name", "flux-dev")]

    compute_dtype = (jnp.bfloat16 if cfg.get("mixed_precision", "bf16") == "bf16"
                     else jnp.float32)
    common = dict(tower_kind=kind, img_size=img_size,
                  clip_image_size=clip_image_size, dit_cfg=dit_cfg,
                  vae_cfg=vae_cfg, tower_cfg=tower_cfg,
                  clip_dim=int(cc.get("clip_dim", 768)),
                  t5_dim=int(cc.get("t5_dim", 4096)),
                  scale_factor=float(cfg.get("scale_factor", 1.0)),
                  guidance=float(cfg.get("guidance", 4.0)),
                  remat=bool(cfg.get("remat") or False),
                  remat_policy=cfg.get("remat_policy", "full"),
                  compute_dtype=compute_dtype,
                  dit_param_dtype=compute_dtype,
                  # Default bf16 for the frozen VAE encode (documented
                  # deviation: the reference runs it fp32,
                  # train_SigLIP_stage1.py:243).  Measured on v5e at 224px:
                  # latent drift max 0.024 / mean 0.002 against fp32 with
                  # latent std 0.445 (~0.5%), and the objective immediately
                  # noises the latent.  `vae_dtype: fp32` restores parity.
                  vae_dtype=(jnp.float32 if cfg.get("vae_dtype") == "fp32"
                             else jnp.bfloat16),
                  # stage-1: frozen int8 teacher (weight replaced).  stage-2:
                  # QLoRA-style — int8 compute factors alongside the KEPT
                  # bf16 base (quant.quantize_lora_base), so the LoRA merge +
                  # HF export still read the original weights; the export
                  # merges into the bf16 base (standard QLoRA semantics,
                  # base-quant error ~0.2% relative — documented there)
                  tower_quant=cfg.get("tower_quant", "none"),
                  vae_quant=cfg.get("vae_quant", "none"),
                  # int8 convs only at >=N channels (measured: below 256 the
                  # int8 conv emitter loses to bf16 — core.quant.INT8_CONV_MIN_CH)
                  vae_quant_min_ch=int(cfg.get("vae_quant_min_ch", 256)),
                  # SwitchBack int8 DiT training (core.quant): "int8" (bf16
                  # dW), "int8_dw" (Pallas per-block-quant dW), or
                  # "int8_full" (experimental XLA int8 dW)
                  dit_quant=cfg.get("dit_quant", "none"),
                  # int8 weight cache pays only when the pallas optimizer
                  # emits it fused (see TaskSpec.dit_quant_cache)
                  dit_quant_cache=cfg.get("fused_optimizer") == "pallas",
                  # ring-attention sequence parallelism (parallel/ring.py):
                  # the trainer builds the matching seq mesh axis
                  sequence_parallel=int(cfg.get("sequence_parallel", 1) or 1),
                  # GPipe pipeline parallelism (parallel/pp.py): the trainer
                  # builds the matching pipe mesh axis
                  pipeline_parallel=int(cfg.get("pipeline_parallel", 1) or 1),
                  pipeline_microbatches=int(cfg.get("pipeline_microbatches", 0) or 0),
                  # FSDP/ZeRO-3 (parallel/fsdp.py): the trainer shards the
                  # params; the task opens the attention activation anchor
                  fsdp=bool(cfg.get("fsdp", False)),
                  # jax.checkpoint each tower encoder layer (stage-2 only;
                  # auto-gated below for video stage-2 — see the remat gate)
                  tower_remat=bool(cfg.get("tower_remat") or False))

    if task.startswith("image_"):
        stage = task[len("image_"):]
        spec = image_task.TaskSpec(stage=stage, **common,
                                   **_lora_kwargs(cfg, tower))
        return spec, kind, "image"

    family, stage = task.rsplit("_stage", 1)
    mode = _VIDEO_MODE[family]
    adapter_in = (tower_cfg.vision.hidden_size if hasattr(tower_cfg, "vision")
                  else 1024)
    # Long-conditioning video modes (e.g. sliding-window @336px: 3*576 txt +
    # 441 img tokens) may need activation remat to fit HBM — auto-enable
    # unless the config sets remat explicitly.  The decision is on the
    # PER-DEVICE activation tokens (per-device batch x per-device seq), not
    # seq alone: the flash kernels keep attention memory O(L), so
    # small-batch long-seq configs fit without remat and run much faster
    # that way (measured on v5e: sliding @336 B=2, 4338 total tokens ->
    # no-remat 209 ms vs full-remat 255-272 ms, a 23% win; image stage-1
    # runs 6304 total tokens remat-free).  Threshold 8192 sits between the
    # measured-fit 6304 and the clearly-oversized middle-mode B=32 (50976).
    # Per-device accounting mirrors the trainer's mesh: train_batch_size is
    # PER-HOST (shard_batch assembles bs x process_count rows over the data
    # axis) and ring SP shards the sequence, so multi-chip DP/SP runs whose
    # per-device footprint fits keep the measured no-remat win.
    n_cond = video_task.VIDEO_MODES[mode]["n_cond"]
    patch = (tower_cfg.vision.patch_size if hasattr(tower_cfg, "vision") else 14)
    bs = int(cfg.get_path("data_config.train_batch_size",
                          cfg.get("train_batch_size", 8)))
    n_dev = int(cfg.get("num_devices") or len(jax.devices()))
    tp = int(cfg.get("model_parallel", 1) or 1)
    sp = int(cfg.get("sequence_parallel", 1) or 1)
    pp = int(cfg.get("pipeline_parallel", 1) or 1)
    n_data = max(1, n_dev // (tp * sp * pp))
    if cfg.get("remat") is None:
        seq = n_cond * (clip_image_size // patch) ** 2 + (img_size // 16) ** 2
        per_dev_tokens = (bs * jax.process_count() / n_data) * (seq / sp)
        # stage-2 differentiates THROUGH the tower: its per-layer residuals
        # (24 CLIP-L layers on n_cond x 577 tokens) roughly double the
        # per-token activation mass, so the no-remat budget halves.
        # Measured @336 middle stage2_all B=4 (6372 tokens): no-remat OOMs
        # in bf16 (15.99 G) AND int8 (17.9 G); remat fits at 430 ms.
        threshold = 8192 if stage == "1" else 4096
        if seq >= 1024 and per_dev_tokens > threshold:
            common = dict(common, remat=True)
    if cfg.get("tower_remat") is None and stage != "1":
        # tower-under-autodiff activations are NOT covered by the DiT remat
        # gate above: 24 CLIP-L layers each keep ~10 live [B*n_cond, 577, h]
        # tensors to the backward.  Measured @336 middle stage2_all on one
        # v5e: B=4 (4616 tower tokens) fits without this at 430 ms; B=8
        # (9232) OOMs in any dtype even with DiT remat on.  Threshold 6144
        # sits between the two; remat drops the live count to the layer
        # residual (train/plan.py tower term).
        vis_tok = (clip_image_size // patch) ** 2 + 1
        tower_tokens = (bs * jax.process_count() / n_data) * n_cond * vis_tok
        if tower_tokens > 6144:
            common = dict(common, tower_remat=True)
    spec = video_task.VideoTaskSpec(
        mode=mode, stage=f"stage{stage}", adapter_in_dim=adapter_in,
        **common, **_lora_kwargs(cfg, tower))
    return spec, kind, "video"


def build_task(cfg, key: Optional[jax.Array] = None):
    """Returns (spec, (tower_params, vae_params), loader, make_train_step,
    create_task_state, ckpt_kind) — build_spec plus weights and the data
    loader."""
    key = key if key is not None else jax.random.key(int(cfg.get("seed", 0)))
    task: str = cfg["task"]
    cc = cfg.get("clip_config", {}) or {}
    dc = cfg.get("data_config", {}) or {}
    img_size = int(dc.get("img_size", 224))
    clip_image_size = int(cc.get("clip_image_size", img_size))
    _check_precomputed(cfg, task)   # fail before building any model

    kind, tower_cfg = registry.tower_family_and_config(
        cfg.get("tower", "openai_clip"), clip_image_size, cc.get("clip_type"))
    vae_params, vae_cfg = registry.build_vae(cfg.get("model_name", "flux-dev"),
                                             cfg.get("ae_path"),
                                             jax.random.fold_in(key, 1))
    tower_params, tower_cfg = registry.load_tower(
        kind, tower_cfg, cc.get("model_dir"), jax.random.fold_in(key, 2))
    spec, kind, ckpt_kind = build_spec(cfg, tower_cfg=tower_cfg,
                                       vae_cfg=vae_cfg)

    data_kwargs = dict(dc)
    data_kwargs.pop("img_size", None)
    # per-host shard splitting (webdataset split_by_node equivalent, §5.8)
    data_kwargs.setdefault("node_index", jax.process_index())
    data_kwargs.setdefault("node_count", jax.process_count())

    if ckpt_kind == "image":
        loader = cc3m_data.loader(img_size=img_size, **data_kwargs)
        return (spec, (tower_params, vae_params), loader,
                image_task.make_train_step, image_task.create_task_state,
                "image")

    loader_kwargs = dict(data_kwargs)
    loader_kwargs.pop("return_mode", None)
    for k in ("window_cond", "window_stride", "max_windows_per_video"):
        if k in cfg:
            loader_kwargs[k] = cfg[k]
    if "max_frames_per_video" in dc and spec.mode != "sliding":
        loader_kwargs.pop("max_frames_per_video", None)
    loader = video_data.loader(mode=_LOADER_MODE[spec.mode],
                               img_size=img_size, **loader_kwargs)
    return (spec, (tower_params, vae_params), loader,
            video_task.make_train_step, video_task.create_task_state, "video")
