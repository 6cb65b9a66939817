"""Shape-only memory & parallelism planner (``genhancer-plan``).

Answers "will this config fit, and which knobs should I turn?" BEFORE
burning a pod-hour: the state tree is built with ``jax.eval_shape`` over
the real ``create_task_state`` (exact leaf shapes/dtypes, optimizer
moments included, no weights materialized, no data IO — factory.build_spec),
and per-chip residency is computed by applying the SAME placement rules
the trainer uses (parallel.tp.dit_param_spec, parallel.fsdp.fsdp_spec,
mesh.shard_over_data) to the shape tree.  Static residency is therefore
placement-exact; activation peak is a labeled heuristic (XLA's scheduler
owns the real number — the estimate is calibrated to measured v5e steps
and errs high).

The reference has no counterpart: its answer to "does it fit" was running
it (SURVEY.md §2.4 trainers OOM-tune batch sizes by hand).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..parallel import fsdp as fsdp_m
from ..parallel import tp as tp_m
from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
from ..tasks import factory, image as image_task, video as video_task
from . import optim
from .state import flatten_params

GiB = 1024.0 ** 3


def shape_state(cfg):
    """(spec, ckpt_kind, TrainState-of-ShapeDtypeStructs) — exact layout,
    zero FLOPs/bytes materialized."""
    spec, _, ckpt_kind = factory.build_spec(cfg)
    task = image_task if ckpt_kind == "image" else video_task
    optimizer = optim.make_optimizer(
        cfg, total_steps=int(cfg.get("max_train_steps") or 1000),
        emit_quant=(cfg.get("dit_quant", "none") != "none"
                    and cfg.get("fused_optimizer") == "pallas"))
    state = jax.eval_shape(
        lambda k: task.create_task_state(k, spec, optimizer),
        jax.random.key(0))
    return spec, ckpt_kind, state


def _leaf_bytes(leaf) -> int:
    return int(leaf.size) * jnp.dtype(leaf.dtype).itemsize


def _shard_factor(spec_tuple, dp: int, tp: int) -> int:
    f = 1
    for ax in spec_tuple:
        for a in (ax if isinstance(ax, tuple) else (ax,)):
            if a == DATA_AXIS:
                f *= dp
            elif a == MODEL_AXIS:
                f *= tp
    return f


def _params_bytes(flat: Dict, dp: int, tp: int, fsdp: bool,
                  fsdp_min: int) -> int:
    """Per-chip bytes of a flat param dict under the trainer's placements."""
    total = 0
    for path, leaf in flat.items():
        base = tp_m.dit_param_spec(path[len("dit."):], leaf) \
            if (tp > 1 and path.startswith("dit.")) else ()
        spec = tuple(base)
        if fsdp:
            spec = tuple(fsdp_m.fsdp_spec(leaf, dp, base=jax.sharding.PartitionSpec(*spec),
                                          min_size=fsdp_min))
        total += _leaf_bytes(leaf) // _shard_factor(spec, dp, tp)
    return total


def _moments_bytes(opt_state, dp: int, tp: int, fsdp: bool, fsdp_min: int,
                   zero1: bool) -> int:
    """Per-chip optimizer-state bytes: moment leaves shard like their param
    (TP / FSDP via shard_like_params) and additionally over the data axis
    under ZeRO-1 (mesh.shard_over_data's divisibility rule)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(opt_state):
        b = _leaf_bytes(leaf)
        # moments mirror a param leaf when shapes match a trainable leaf;
        # exact path matching is overkill here — apply the dominant rule:
        if fsdp:
            spec = tuple(fsdp_m.fsdp_spec(leaf, dp, min_size=fsdp_min))
            b //= _shard_factor(spec, dp, tp)
        elif zero1 and getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] % dp == 0:
            b //= dp
        total += b
    return total


def _activation_bytes(spec, cfg, dp: int, sp: int) -> Tuple[int, str]:
    """Coarse DiT activation-peak heuristic, labeled as such.

    Per-device tokens T = (global batch / dp) x (joint seq / sp).  Without
    remat each block keeps ~10 live intermediates of width hidden (qkv,
    attention out, two MLP tensors, norms/modulation, residuals) in
    compute_dtype; with remat only ~2 per block boundary survive to the
    backward.  Flash attention keeps the score matrix O(L) so it adds no
    L^2 term.  Calibrated against measured v5e fits (image stage-1 B=32
    @224 no-remat fits 16 GB; video middle B=8 @336 needs remat)."""
    bs = int(cfg.get_path("data_config.train_batch_size",
                          cfg.get("train_batch_size", 16)))
    bs *= jax.process_count()
    n_cond = getattr(spec, "n_cond", 1)
    patch = (spec.tower_cfg.vision.patch_size
             if hasattr(spec.tower_cfg, "vision") else 14)
    seq = (n_cond * (spec.clip_image_size // patch) ** 2
           + (spec.img_size // 16) ** 2)
    t_per_dev = (bs / dp) * (seq / sp)
    width = spec.dit_cfg.hidden_size
    blocks = spec.dit_cfg.depth + spec.dit_cfg.depth_single_blocks
    live = 2 if spec.remat else 10
    itemsize = jnp.dtype(spec.compute_dtype).itemsize
    est = int(t_per_dev * width * blocks * live * itemsize)
    note = (f"~{live} live tensors/block x {blocks} blocks x "
            f"{int(t_per_dev)} tokens/device x {width} wide "
            f"({'remat' if spec.remat else 'no remat'}; heuristic +/-2x)")
    # stage-2 differentiates THROUGH the tower (LoRA): its per-layer
    # residuals dominate for multi-frame video (B x n_cond x 577 tokens
    # through 24 CLIP-L layers) — stage-1's frozen tower keeps nothing
    # (no trainable grads flow through it).  ~10 width-units live per
    # layer (qkv 3 + attn 2 + 4x-wide MLP intermediate + norms).
    if spec.stage != "stage1" and hasattr(spec.tower_cfg, "vision"):
        v = spec.tower_cfg.vision
        t_live = 2 if getattr(spec, "tower_remat", False) else 10
        t_tok = (bs / dp) * n_cond * ((v.image_size // v.patch_size) ** 2 + 1)
        t_est = int(t_tok * v.hidden_size * v.num_layers * t_live * itemsize)
        est += t_est
        note += (f" + tower-under-autodiff ~{t_est / GiB:.2f} GiB "
                 f"({int(t_tok)} tok x {v.num_layers} layers x "
                 f"{v.hidden_size} wide"
                 f"{'; tower_remat' if t_live == 2 else ''})")
    return est, note


def plan(cfg, num_devices: Optional[int] = None,
         hbm_gb: float = 16.0) -> Dict:
    """Residency report + first-fitting knob recommendation.

    Returns a dict: {'configured': {...}, 'candidates': [...],
    'recommendation': str}.  Each entry carries per-chip GiB for params
    (trainable/frozen), optimizer state, grads, the activation estimate,
    and the total vs the HBM budget."""
    spec, ckpt_kind, state = shape_state(cfg)
    n = int(num_devices or cfg.get("num_devices") or len(jax.devices()))
    tp0 = int(cfg.get("model_parallel", 1) or 1)
    sp0 = int(cfg.get("sequence_parallel", 1) or 1)
    pp0 = int(cfg.get("pipeline_parallel", 1) or 1)
    fsdp_min = int(cfg.get("fsdp_min_size", fsdp_m.MIN_SHARD_SIZE))

    trainable = flatten_params(state.trainable)
    frozen = flatten_params(state.frozen)

    def entry(name: str, *, tp: int, fsdp: bool, zero1: bool,
              remat: Optional[bool] = None,
              tower_remat: Optional[bool] = None) -> Dict:
        dp = max(1, n // (tp * sp0 * pp0))
        import dataclasses
        repl = {k: v for k, v in
                dict(remat=remat, tower_remat=tower_remat).items()
                if v is not None}
        sp_eff = dataclasses.replace(spec, **repl) if repl else spec
        t_b = _params_bytes(trainable, dp, tp, fsdp, fsdp_min)
        f_b = _params_bytes(frozen, dp, tp, fsdp, fsdp_min)
        m_b = _moments_bytes(state.opt_state, dp, tp, fsdp, fsdp_min, zero1)
        g_b = t_b          # grads materialize with the (placed) trainable
        a_b, a_note = _activation_bytes(sp_eff, cfg, dp, sp0)
        total = t_b + f_b + m_b + g_b + a_b
        return {"name": name, "dp": dp, "tp": tp,
                "trainable_gib": t_b / GiB, "frozen_gib": f_b / GiB,
                "opt_state_gib": m_b / GiB, "grads_gib": g_b / GiB,
                "activations_gib_est": a_b / GiB, "activation_note": a_note,
                "total_gib": total / GiB, "fits": total / GiB <= hbm_gb,
                "knobs": {"model_parallel": tp, "fsdp": fsdp,
                          "shard_optimizer_state": zero1,
                          **({} if remat is None else {"remat": remat}),
                          **({} if tower_remat is None
                             else {"tower_remat": tower_remat})}}

    configured = entry("as configured", tp=tp0,
                       fsdp=bool(cfg.get("fsdp", False)),
                       zero1=bool(cfg.get("shard_optimizer_state", False)))

    # escalation ladder: cheapest-collective knob first (docs/SCALING.md)
    candidates: List[Dict] = [configured]
    if not configured["fits"]:
        # tower remat only exists where a tower sits under autodiff
        t_r = (True if (spec.stage != "stage1"
                        and hasattr(spec.tower_cfg, "vision")) else None)
        ladder = [("+ shard_optimizer_state (ZeRO-1)",
                   dict(tp=tp0, fsdp=False, zero1=True)),
                  ("+ remat", dict(tp=tp0, fsdp=False, zero1=True, remat=True))]
        if t_r:
            ladder.append(("+ remat + tower_remat",
                           dict(tp=tp0, fsdp=False, zero1=True, remat=True,
                                tower_remat=True)))
        t_tag = " + tower_remat" if t_r else ""
        # fsdp rungs only where fsdp is legal (factory.validate_parallelism:
        # no PP/SP/fused-Pallas-optimizer) — never recommend a combination
        # the trainer would reject at config time
        fsdp_ok = (sp0 == 1 and pp0 == 1
                   and cfg.get("fused_optimizer") != "pallas")
        if fsdp_ok:
            ladder += [(f"+ fsdp (ZeRO-3){t_tag}",
                        dict(tp=tp0, fsdp=True, zero1=True, tower_remat=t_r)),
                       (f"+ fsdp + remat{t_tag}",
                        dict(tp=tp0, fsdp=True, zero1=True, remat=True,
                             tower_remat=t_r))]
        for tp in (2, 4, 8):
            if fsdp_ok and tp > tp0 and n % (tp * sp0 * pp0) == 0:
                try:
                    tp_m.validate_tp(spec.dit_cfg, tp)
                except ValueError:
                    continue
                ladder.append((f"+ fsdp + remat{t_tag} + model_parallel {tp}",
                               dict(tp=tp, fsdp=True, zero1=True, remat=True,
                                    tower_remat=t_r)))
        for name, kw in ladder:
            e = entry(name, **kw)
            if abs(e["total_gib"] - candidates[-1]["total_gib"]) < 1e-9:
                continue   # knob is a no-op here (e.g. dp=1, already-remat)
            candidates.append(e)
            if e["fits"]:
                break

    fitting = [c for c in candidates if c["fits"]]
    rec = (fitting[0]["name"] if fitting else
           "nothing fits — raise num_devices, lower the batch, or shrink "
           "the model")
    return {"task": cfg["task"], "num_devices": n, "hbm_gb": hbm_gb,
            "ckpt_kind": ckpt_kind, "configured": configured,
            "candidates": candidates, "recommendation": rec}
