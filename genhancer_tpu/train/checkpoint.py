"""Checkpoint manager: reference-layout artifacts + robust resume.

Artifacts match the reference exactly (SURVEY.md §5.4):
  * stage-1: ``checkpoint-dit-{step}.bin``, ``checkpoint-project-clip-{step}.bin``,
    ``checkpoint-project-t5-{step}.bin`` (image) / ``checkpoint-visual-adapter-
    {step}.bin`` (video), ``optimizer-state-{step}.bin`` — torch state-dict
    ``.bin`` files loadable by ``torch.load`` with the reference key names
    (``train_SigLIP_stage1.py:284-300``, ``train_OpenAICLIP_video_stage1.py:501-514``);
  * stage-2: LoRA-merged HF model dirs (``clip-vit-large-patch14-336-{step}``
    etc.) with ``config.json`` + ``pytorch_model.bin``
    (``train_SigLIP_stage2_all.py:305-311``).

Resume fixes reference quirk Q2: step discovery uses a strict regex over
``checkpoint-dit-(\\d+).bin`` (the fragile ``int(path.split('-')[1])`` scan
crashed on the trainers' own artifacts), and optimizer state round-trips
losslessly (the reference called ``accelerator.load_state`` on dirs it never
wrote).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import List, Optional

import jax
import numpy as np

from ..weights import hf_convert
from ..weights.torch_io import (load_torch_state_dict, save_torch_state_dict)
from .state import TrainState, flatten_params, unflatten_params


_STEP_RE = re.compile(r"checkpoint-dit-(\d+)\.bin$")


def _module_subtree(state: TrainState, prefix: str):
    flat = {**state.frozen, **state.trainable}
    sub = {k[len(prefix) + 1:]: v for k, v in flat.items()
           if k.startswith(prefix + ".")}
    return unflatten_params(sub)


def save_stage1(state: TrainState, output_dir: str, step: int,
                kind: str = "image") -> List[str]:
    """Write the reference stage-1 component .bins.  kind: image|video."""
    os.makedirs(output_dir, exist_ok=True)
    written = []

    dit_sd = hf_convert.dit_to_torch(_module_subtree(state, "dit"))
    p = os.path.join(output_dir, f"checkpoint-dit-{step}.bin")
    save_torch_state_dict(dit_sd, p)
    written.append(p)

    pc = _module_subtree(state, "clip.project_clip")
    if pc:
        p = os.path.join(output_dir, f"checkpoint-project-clip-{step}.bin")
        save_torch_state_dict(hf_convert.module_to_torch(pc), p)
        written.append(p)

    if kind == "image":
        pt = _module_subtree(state, "clip.project_t5")
        if pt:
            p = os.path.join(output_dir, f"checkpoint-project-t5-{step}.bin")
            save_torch_state_dict(hf_convert.module_to_torch(pt), p)
            written.append(p)
    else:
        va = _module_subtree(state, "visual_adapter")
        if va:
            p = os.path.join(output_dir, f"checkpoint-visual-adapter-{step}.bin")
            save_torch_state_dict(hf_convert.module_to_torch(va), p)
            written.append(p)

    p = os.path.join(output_dir, f"optimizer-state-{step}.bin")
    save_optimizer_state(state, p)
    written.append(p)
    return written


def save_optimizer_state(state: TrainState, path: str) -> None:
    """Serialize opt_state leaves positionally (framework-internal format,
    stored as a torch .bin for tooling uniformity)."""
    leaves, _ = jax.tree_util.tree_flatten(state.opt_state)
    sd = {f"opt.{i}": np.asarray(l) for i, l in enumerate(leaves)}
    sd["step"] = np.asarray(state.step)
    save_torch_state_dict(sd, path)


def load_optimizer_state(state: TrainState, path: str) -> TrainState:
    sd = load_torch_state_dict(path)
    leaves, treedef = jax.tree_util.tree_flatten(state.opt_state)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        v = sd[f"opt.{i}"]
        if tuple(v.shape) != tuple(np.shape(leaf)):
            if v.size == np.size(leaf):   # 0-d <-> (1,) torch round-trip quirk
                v = v.reshape(np.shape(leaf))
            else:
                raise ValueError(
                    f"optimizer leaf {i} shape mismatch: {v.shape} vs {np.shape(leaf)}")
        new_leaves.append(jax.numpy.asarray(v, dtype=np.asarray(leaf).dtype))
    return TrainState(trainable=state.trainable, frozen=state.frozen,
                      opt_state=jax.tree_util.tree_unflatten(treedef, new_leaves),
                      step=jax.numpy.asarray(np.asarray(sd["step"]).reshape(()),
                                             dtype=jax.numpy.int32),
                      quant=state.quant)


def _load_module_into(state: TrainState, prefix: str, tree) -> TrainState:
    flat_new = {f"{prefix}.{k}": jax.numpy.asarray(v)
                for k, v in flatten_params(tree).items()}
    trainable = dict(state.trainable)
    frozen = dict(state.frozen)
    for k, v in flat_new.items():
        if k in trainable:
            trainable[k] = v.astype(trainable[k].dtype)
        elif k in frozen:
            frozen[k] = v.astype(frozen[k].dtype)
        # unknown keys ignored (tolerant loading, sliding-window variant :271-301)
    quant = state.quant
    if quant is not None:
        # refresh the derived int8 cache from the newly loaded masters
        from ..core.quant import quantize_cache
        quant = quantize_cache(trainable, tuple(quant))
    return TrainState(trainable=trainable, frozen=frozen,
                      opt_state=state.opt_state, step=state.step, quant=quant)


def load_stage1_components(state: TrainState, load_dir: str, load_step: int,
                           kind: str = "image") -> TrainState:
    """Load stage-1 .bins into a (stage-2) state — explicit load_dir/load_step
    semantics (train_SigLIP_stage2_all.py:146-156)."""
    dit_path = os.path.join(load_dir, f"checkpoint-dit-{load_step}.bin")
    if os.path.exists(dit_path):
        state = _load_module_into(
            state, "dit", hf_convert.dit_from_torch(load_torch_state_dict(dit_path),
                                                    as_jax=False))
    pc = os.path.join(load_dir, f"checkpoint-project-clip-{load_step}.bin")
    if os.path.exists(pc):
        state = _load_module_into(
            state, "clip.project_clip",
            hf_convert.module_from_torch(load_torch_state_dict(pc), as_jax=False))
    pt = os.path.join(load_dir, f"checkpoint-project-t5-{load_step}.bin")
    if os.path.exists(pt):
        state = _load_module_into(
            state, "clip.project_t5",
            hf_convert.module_from_torch(load_torch_state_dict(pt), as_jax=False))
    va = os.path.join(load_dir, f"checkpoint-visual-adapter-{load_step}.bin")
    if os.path.exists(va):
        state = _load_module_into(
            state, "visual_adapter",
            hf_convert.module_from_torch(load_torch_state_dict(va), as_jax=False))
    return state


def all_steps(output_dir: str) -> List[int]:
    if not os.path.isdir(output_dir):
        return []
    return sorted(int(m.group(1)) for name in os.listdir(output_dir)
                  if (m := _STEP_RE.match(name)))


def prune_checkpoints(output_dir: str, total_limit: int) -> List[int]:
    """Keep only the newest ``total_limit`` checkpoint steps
    (checkpoints_total_limit config knob); returns pruned steps."""
    steps = all_steps(output_dir)
    if total_limit <= 0 or len(steps) <= total_limit:
        return []
    doomed = steps[: len(steps) - total_limit]
    prefixes = ("checkpoint-dit-", "checkpoint-project-clip-",
                "checkpoint-project-t5-", "checkpoint-visual-adapter-",
                "optimizer-state-")
    for s in doomed:
        for p in prefixes:
            path = os.path.join(output_dir, f"{p}{s}.bin")
            if os.path.exists(path):
                os.remove(path)
    return doomed


def latest_step(output_dir: str) -> Optional[int]:
    """Robust latest-checkpoint discovery (fixes Q2)."""
    if not os.path.isdir(output_dir):
        return None
    steps = [int(m.group(1)) for name in os.listdir(output_dir)
             if (m := _STEP_RE.match(name))]
    return max(steps) if steps else None


def resume_latest(state: TrainState, output_dir: str, kind: str = "image"
                  ) -> TrainState:
    """resume_from_checkpoint: latest — loads components + optimizer state."""
    step = latest_step(output_dir)
    if step is None:
        return state
    state = load_stage1_components(state, output_dir, step, kind)
    opt_path = os.path.join(output_dir, f"optimizer-state-{step}.bin")
    if os.path.exists(opt_path):
        state = load_optimizer_state(state, opt_path)
    else:
        state = TrainState(trainable=state.trainable, frozen=state.frozen,
                           opt_state=state.opt_state,
                           step=jax.numpy.asarray(step, jax.numpy.int32),
                           quant=state.quant)
    return state


# ---------------------------------------------------------------------------
# stage-2 HF export
# ---------------------------------------------------------------------------

def export_hf_tower(state: TrainState, out_dir: str,
                    base_config: Optional[dict] = None,
                    base_model_dir: Optional[str] = None) -> str:
    """LoRA-merge the tower and write an HF model dir
    (merge_and_unload().save_pretrained equivalent, safe_serialization=False).

    config.json comes from ``base_model_dir`` (preferred: preserves every HF
    field) or ``base_config``.
    """
    from . import lora as lora_m
    tower = _module_subtree(state, "clip.model")
    merged = lora_m.merge(tower)
    os.makedirs(out_dir, exist_ok=True)
    sd = hf_convert.tower_to_torch(merged)
    save_torch_state_dict(sd, os.path.join(out_dir, "pytorch_model.bin"))
    if base_model_dir and os.path.exists(os.path.join(base_model_dir, "config.json")):
        shutil.copy(os.path.join(base_model_dir, "config.json"),
                    os.path.join(out_dir, "config.json"))
        pre = os.path.join(base_model_dir, "preprocessor_config.json")
        if os.path.exists(pre):
            shutil.copy(pre, os.path.join(out_dir, "preprocessor_config.json"))
    elif base_config is not None:
        with open(os.path.join(out_dir, "config.json"), "w") as f:
            json.dump(base_config, f, indent=2)
    return out_dir
