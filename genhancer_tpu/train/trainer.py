"""The training loop: config-driven, mesh-DP, observable, resumable.

Replaces the reference's 12 trainer-script main loops (SURVEY.md §2.4, §3.1)
with one engine:

  * single-jit step (optionally with gradient accumulation via lax.scan);
  * batch sharding over the data mesh axis + device prefetch thread;
  * step/data timers and TensorBoard scalars matching the reference names
    (``train_loss``, ``step_time``, ``data_load_time``,
    ``avg_windows_per_video``/``bs_eff`` in sliding mode — §5.1/§5.5);
  * watchdog warnings for slow data loading / steps
    (train_OpenAICLIP_video_stage1.py:311-315,470-476);
  * reference checkpoint cadence incl. stage-2 dense early saves
    ({50,100,200,300,500,1000,2000,3000}, train_SigLIP_stage2_all.py:305) and
    robust resume-from-latest;
  * stage-2 HF export of the LoRA-merged tower.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import mesh as mesh_m
from ..tasks import factory
from ..train import checkpoint as ckpt
from ..train.async_ckpt import AsyncCheckpointer
from ..train import optim
from ..train.step_utils import make_accum_train_step, stack_microbatches
from ..data.prefetch import DevicePrefetcher

log = logging.getLogger("genhancer_tpu.trainer")

STAGE2_EARLY_SAVES = {50, 100, 200, 300, 500, 1000, 2000, 3000}
DATA_LOAD_TIMEOUT = 60.0
STEP_TIMEOUT = 300.0


class SummaryWriterProxy:
    """Scalar tracker: tensorboardX or wandb (reference ``report_to`` options,
    train_SigLIP_stage1.py:49-50,189-190), or a no-op if unavailable/disabled.

    wandb runs in offline mode unless WANDB_MODE overrides it (training
    clusters are frequently egress-less); like the reference's
    ``is_wandb_available()`` gate, a missing wandb degrades to a warning."""

    def __init__(self, logdir: Optional[str], enabled: bool = True,
                 backend: str = "tensorboard", project: Optional[str] = None,
                 run_config: Optional[dict] = None):
        self.writer = None
        self.wandb = None
        if not (enabled and logdir):
            return
        if backend == "wandb":
            try:
                import wandb
                os.makedirs(logdir, exist_ok=True)
                wandb.init(project=project or "genhancer", dir=logdir,
                           config=run_config,
                           mode=os.environ.get("WANDB_MODE", "offline"))
                self.wandb = wandb
            except Exception as e:
                log.warning("wandb tracker unavailable: %s", e)
        elif backend == "tensorboard":
            try:
                from tensorboardX import SummaryWriter
                os.makedirs(logdir, exist_ok=True)
                self.writer = SummaryWriter(logdir)
            except Exception as e:  # pragma: no cover
                log.warning("tensorboard disabled: %s", e)

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)
        if self.wandb is not None:
            self.wandb.log({tag: value}, step=step)

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()
        if self.wandb is not None:
            self.wandb.finish()


def hf_export_name(cfg, step: int) -> str:
    """Stage-2 export dir name parity (siglip-so400m-patch14-{size}-{step},
    clip-vit-large-patch14[-336]-{step}, metaclip-{l14,h14}-fullcc2.5b-{step})."""
    tower = cfg.get("tower", "openai_clip")
    size = int(cfg.get_path("clip_config.clip_image_size", 224))
    if tower == "siglip":
        return f"siglip-so400m-patch14-{size}-{step}"
    if tower == "metaclip":
        t = cfg.get_path("clip_config.clip_type", "large")
        return f"metaclip-{'l14' if t == 'large' else 'h14'}-fullcc2.5b-{step}"
    return (f"clip-vit-large-patch14-{step}" if size == 224
            else f"clip-vit-large-patch14-336-{step}")


class Trainer:
    def __init__(self, cfg, profile: bool = False):
        self.cfg = cfg
        self.profile = profile
        # Reject invalid parallelism compositions BEFORE any jax use: backend
        # init (axon remote attach) can take a minute, and the same checks
        # inside make_mesh/validate_fsdp would fire only after weights load.
        from ..tasks.factory import validate_parallelism
        validate_parallelism(cfg)
        self.output_dir = cfg.get("output_dir", "output")
        os.makedirs(self.output_dir, exist_ok=True)
        mesh_m.maybe_initialize_distributed()
        # Persistent XLA compilation cache: restarts/resumes skip the slow
        # first-step compile (minutes for the big stage-2/video programs on
        # a remote-compile backend).  Off unless configured — the cache is
        # keyed on program+flags+compiler version, safe to share per model.
        cache_dir = cfg.get("compilation_cache_dir")
        if cache_dir:
            jax.config.update("jax_compilation_cache_dir", str(cache_dir))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            # jax initializes its cache object lazily ONCE; if some earlier
            # compile in this process already created it (another dir, or a
            # test harness), the config update alone is silently ignored —
            # drop the instance so the next compile re-opens it here.
            try:
                from jax.experimental.compilation_cache import (
                    compilation_cache as _cc)
                _cc.reset_cache()
            except Exception:  # cache not yet initialized / API moved
                pass
            log.info("persistent compilation cache at %s", cache_dir)
        n = int(cfg.get("num_devices") or len(jax.devices()))
        self.tp = int(cfg.get("model_parallel", 1) or 1)
        self.sp = int(cfg.get("sequence_parallel", 1) or 1)
        self.pp = int(cfg.get("pipeline_parallel", 1) or 1)
        self.mesh = mesh_m.make_mesh(n, model_parallel=self.tp,
                                     sequence_parallel=self.sp,
                                     pipeline_parallel=self.pp)
        bs = int(cfg.get_path("data_config.train_batch_size", 1))
        n_data = mesh_m.data_axis_size(self.mesh)
        if bs % n_data:
            log.warning("train_batch_size %d not divisible by the %d-way "
                        "data axis; padding batches to %d with a masked loss",
                        bs, n_data, bs + (-bs) % n_data)
        self.is_main = jax.process_index() == 0
        self.ckpt_writer = AsyncCheckpointer(
            enabled=bool(cfg.get("async_checkpointing", True)))

        (self.spec, (tower_params, vae_params), self.loader,
         make_step, create_state, self.ckpt_kind) = factory.build_task(cfg)

        self.accum = int(cfg.get("gradient_accumulation_steps", 1))
        max_steps = cfg.get("max_train_steps")
        if not max_steps:
            # reference epoch math: ceil(3e6 / batch) / accum per epoch
            # (train_SigLIP_stage1.py:158-161)
            per_epoch = optim.effective_steps_per_epoch(
                int(cfg.get_path("data_config.train_batch_size", 16)), self.accum)
            max_steps = int(int(cfg.get("num_train_epochs", 1)) * per_epoch)
        self.max_steps = int(max_steps)
        # pallas fused optimizer can emit the int8 SwitchBack weight cache
        # from inside the update kernel (core/pallas/adamw.py)
        emit_quant = (cfg.get("dit_quant", "none") in ("int8", "int8_dw", "int8_full")
                      and cfg.get("fused_optimizer") == "pallas")
        self.optimizer = optim.make_optimizer(cfg, total_steps=self.max_steps,
                                              emit_quant=emit_quant)

        key = jax.random.key(int(cfg.get("seed", 0)))
        self.state = create_state(key, self.spec, self.optimizer,
                                  tower_params=tower_params,
                                  vae_params=vae_params)

        # stage-2: load stage-1 components (load_dir/load_step)
        if cfg.get("load_dir") and cfg.get("load_step") is not None:
            self.state = ckpt.load_stage1_components(
                self.state, cfg["load_dir"], int(cfg["load_step"]), self.ckpt_kind)
            log.info("loaded stage-1 components from %s step %s",
                     cfg["load_dir"], cfg["load_step"])
            # static int8 factors (QLoRA tower / frozen stage2_only DiT) were
            # derived at init — re-derive from the just-loaded masters
            from ..core.quant import refresh_static_quant_flat
            self.state = self.state.replace(
                frozen=refresh_static_quant_flat(self.state.frozen))

        # ``checkpoint_backend``: "torch" (reference artifact layout, gathers
        # to process 0) | "orbax" (sharded save, every host writes its own
        # shards — train/orbax_ckpt.py)
        self.ckpt_backend = str(cfg.get("checkpoint_backend", "torch"))
        if (cfg.get("resume_from_checkpoint") == "latest"
                and self.ckpt_backend == "torch"):
            before = int(self.state.step)
            self.state = ckpt.resume_latest(self.state, self.output_dir, self.ckpt_kind)
            if int(self.state.step) != before:
                log.info("resumed from step %d", int(self.state.step))

        self.state = mesh_m.replicate(self.state, self.mesh)
        tp_placements = None
        if self.tp > 1:
            # Megatron-style DiT tensor parallelism as placements
            # (parallel.tp).  The DiT lives in ``trainable`` for stage-1 /
            # stage2_all but in ``frozen`` for stage2_only — shard BOTH so
            # the knob is never a silent no-op.
            from ..parallel import tp as tp_m
            tp_m.validate_tp(self.spec.dit_cfg, self.tp)
            trainable, tp_placements = tp_m.shard_dit_params(
                self.state.trainable, self.mesh)
            frozen, tp_frozen = tp_m.shard_dit_params(self.state.frozen,
                                                      self.mesh)
            tp_placements = {**tp_placements, **tp_frozen}
            self.state = self.state.replace(
                trainable=trainable, frozen=frozen,
                opt_state=tp_m.shard_like_params(self.state.opt_state,
                                                 tp_placements, self.mesh))
        if bool(cfg.get("fsdp", False)):
            # ZeRO-3/FSDP: every param leaf sharded over the data axis —
            # per-chip weight residency 1/dp; XLA inserts the per-use
            # all-gather and the grad reduce-scatter (parallel/fsdp.py)
            from ..parallel import fsdp as fsdp_m
            from ..parallel import tp as tp_m
            fsdp_m.validate_fsdp(cfg)
            min_size = int(cfg.get("fsdp_min_size", fsdp_m.MIN_SHARD_SIZE))
            trainable, placements = fsdp_m.shard_params_fsdp(
                self.state.trainable, self.mesh,
                tp_placements=tp_placements, min_size=min_size)
            frozen, _ = fsdp_m.shard_params_fsdp(
                self.state.frozen, self.mesh,
                tp_placements=tp_placements, min_size=min_size)
            self.state = self.state.replace(
                trainable=trainable, frozen=frozen,
                opt_state=tp_m.shard_like_params(self.state.opt_state,
                                                 placements, self.mesh))
        if bool(cfg.get("shard_optimizer_state", False)):
            # ZeRO-1: Adam moments sharded over the data axis (params/grads
            # stay replicated; XLA inserts the slice/all-gather pattern)
            self.state = self.state.replace(
                opt_state=mesh_m.shard_over_data(self.state.opt_state, self.mesh))

        # orbax backend resumes AFTER sharding: restore places each shard
        # directly onto the live state's sharding (no gather / re-shard)
        if (self.ckpt_backend == "orbax"
                and cfg.get("resume_from_checkpoint") == "latest"):
            from . import orbax_ckpt
            ls = orbax_ckpt.latest_step(self.output_dir)
            if ls is not None and ls > int(self.state.step):
                self.state = orbax_ckpt.restore_sharded(
                    self.state, self.output_dir, ls)
                log.info("resumed (orbax) from step %d", ls)

        from ..tasks.image import make_loss_fn as image_loss
        from ..tasks.video import make_loss_fn as video_loss
        loss_fn = (image_loss(self.spec, self.mesh) if self.ckpt_kind == "image"
                   else video_loss(self.spec, self.mesh))
        if self.accum > 1:
            acc_dt = cfg.get("grad_accum_dtype", "float32")
            self.step_fn = make_accum_train_step(
                loss_fn, self.optimizer, self.accum,
                accum_dtype=None if acc_dt == "param" else jnp.dtype(acc_dt))
        else:
            self.step_fn = make_step(self.spec, self.optimizer, mesh=self.mesh)

        self.log_interval = max(1, int(cfg.get("log_interval", 10)))
        report_to = cfg.get("report_to")
        self.writer = SummaryWriterProxy(
            os.path.join(self.output_dir, cfg.get("logging_dir", "logs")),
            enabled=self.is_main and report_to in ("tensorboard", "wandb"),
            backend=report_to or "tensorboard",
            project=cfg.get("tracker_project_name"),
            run_config={k: v for k, v in cfg.items()
                        if isinstance(v, (int, float, str, bool))})
        self.base_key = jax.random.key(int(cfg.get("seed", 0)) + 777)

    # -- input ------------------------------------------------------------

    def _array_batches(self):
        """Yield device-ready batches (array leaves only; accumulation
        stacking applied)."""
        array_keys = {"image", "cond", "target", "valid",
                      # precomputed-conditioning batches (data.precompute)
                      "moments", "cls", "cond_patches", "cond_vecs"}
        # each host pads its local rows to its local share of the data axis
        n_data = mesh_m.data_axis_size(self.mesh) // jax.process_count()

        def merge_extras(extras_list):
            """Average numeric extras across an accumulation group (keeping
            only the last microbatch's would skew bs_eff et al.)."""
            if len(extras_list) == 1:
                return extras_list[0]
            out = {}
            for k in extras_list[0]:
                vals = [e[k] for e in extras_list if k in e]
                try:
                    out[k] = float(np.mean([float(v) for v in vals]))
                except (TypeError, ValueError):
                    out[k] = vals[-1]
            return out

        def host_iter():
            pending, pending_extras = [], []
            for b in self.loader:
                arrays = {k: v for k, v in b.items()
                          if k in array_keys and isinstance(v, np.ndarray)}
                arrays = mesh_m.pad_batch_to_devices(arrays, n_data)
                extras = {k: v for k, v in b.items() if k not in arrays}
                if self.accum > 1:
                    pending.append(arrays)
                    pending_extras.append(extras)
                    if len(pending) == self.accum:
                        yield {**stack_microbatches(pending),
                               "__extras__": merge_extras(pending_extras)}
                        pending, pending_extras = [], []
                else:
                    yield {**arrays, "__extras__": extras}

        return DevicePrefetcher(host_iter(), mesh=self.mesh,
                                array_keys=array_keys, depth=2,
                                batch_axis=1 if self.accum > 1 else 0)

    # -- checkpointing -----------------------------------------------------

    def _should_checkpoint(self, step: int) -> bool:
        every = int(self.cfg.get("checkpointing_steps", 0) or 0)
        if every and step % every == 0:
            return True
        if self.spec.stage.startswith("stage2") and step in STAGE2_EARLY_SAVES:
            return True
        return False

    def _checkpoint(self, step: int) -> None:
        # the int8 weight cache is derived state (rebuilt from the masters on
        # resume) — never snapshot/fetch its ~1 byte/param to host
        state = self.state.replace(quant=None)
        if self.ckpt_backend == "orbax":
            # collective sharded save: every host writes its own shards, no
            # process-0 gather (train/orbax_ckpt.py).  Stage-2 parity
            # artifacts (HF export) still go through the torch writer below.
            from . import orbax_ckpt
            orbax_ckpt.save_sharded(state, self.output_dir, step)
            if self.is_main:
                limit = int(self.cfg.get("checkpoints_total_limit") or 0)
                if limit:
                    pruned = orbax_ckpt.prune(self.output_dir, limit)
                    if pruned:
                        log.info("pruned old orbax checkpoints: %s", pruned)
                log.info("saved orbax checkpoint at step %d", step)
            if not self.spec.stage.startswith("stage2"):
                return
            # fall through only for the small stage-2 HF export artifact

        if jax.process_count() > 1:
            # multi-host: gathering sharded leaves (ZeRO-1 moments, TP
            # params) is collective — ALL processes run it; only process 0
            # then pays the d2h fetch of the replicated rest and writes
            from .async_ckpt import gather_sharded
            state = gather_sharded(state)
        if not self.is_main:
            return
        torch_artifacts = self.ckpt_backend != "orbax"
        def write(state):
            if torch_artifacts:
                ckpt.save_stage1(state, self.output_dir, step, self.ckpt_kind)
            if self.spec.stage.startswith("stage2"):
                out = os.path.join(self.output_dir, hf_export_name(self.cfg, step))
                base_cfg = (self.spec.tower_cfg.to_hf()
                            if hasattr(self.spec.tower_cfg, "to_hf") else None)
                ckpt.export_hf_tower(state, out,
                                     base_config=base_cfg,
                                     base_model_dir=self.cfg.get_path("clip_config.model_dir"))
            if torch_artifacts:
                limit = int(self.cfg.get("checkpoints_total_limit") or 0)
                if limit:
                    pruned = ckpt.prune_checkpoints(self.output_dir, limit)
                    if pruned:
                        log.info("pruned old checkpoints: %s", pruned)
                log.info("saved checkpoint at step %d", step)

        self.ckpt_writer.save(state, write)

    # -- loop --------------------------------------------------------------

    def train(self) -> dict:
        step = int(self.state.step)
        last_data_t = time.time()
        metrics_out = {}
        trace_dir = os.path.join(self.output_dir, "profile") if self.profile else None
        batches = self._array_batches()

        # Preemption safety: TPU pods get SIGTERM ahead of reclaim.  The
        # handler only sets a flag; the loop breaks at a step boundary and
        # the end-of-loop collective checkpoint saves resumable state.
        # Multi-host, the break decision is SYNCHRONIZED (_preempt_stop):
        # the local flag alone must not gate the break — hosts observe the
        # signal at different loop positions, and one host entering the
        # collective checkpoint while another dispatches the next step
        # deadlocks the pod.  Handler restored on exit — the trainer may be
        # embedded (tests, notebooks).
        import signal
        self._preempted = False

        def _on_term(signum, frame):
            self._preempted = True
            log.warning("SIGTERM — will checkpoint at the next step boundary")

        try:
            prev_term = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:          # not the main thread: no handler, no harm
            prev_term = None

        try:
            metrics_out = self._train_loop(step, batches, trace_dir,
                                           last_data_t)
        finally:
            if prev_term is not None:
                signal.signal(signal.SIGTERM, prev_term)
        return metrics_out

    def _preempt_stop(self, step: int) -> bool:
        """Uniform preemption-stop decision for the step boundary ``step``.

        Single-process: the local SIGTERM flag.  Multi-host: process 0's
        flag, broadcast to every host at a fixed step cadence — the local
        flag must never gate the break, because hosts observe SIGTERM at
        different loop positions and a host that stops early enters the
        collective checkpoint gather while the others dispatch the next jit
        step: mismatched collectives, pod deadlock, and the "preemption-
        safe" checkpoint never completes.  Cadence = log_interval (the
        boundaries where the loop already blocks on the loss fetch), which
        bounds the reaction delay to log_interval steps — well inside the
        30 s+ SIGTERM grace window of TPU reclaims."""
        if jax.process_count() == 1:
            return self._preempted
        if step % self.log_interval:
            return False
        from jax.experimental import multihost_utils
        return bool(multihost_utils.broadcast_one_to_all(
            np.asarray(self._preempted, np.int32)))

    def _train_loop(self, step, batches, trace_dir, last_data_t) -> dict:
        metrics_out = {}
        for batch in batches:
            if step >= self.max_steps:
                break
            if self._preempt_stop(step):
                log.warning("preempted — stopping at step %d (checkpoint "
                            "follows; relaunch with "
                            "resume_from_checkpoint: latest)", step)
                break
            data_load_time = time.time() - last_data_t
            if data_load_time > DATA_LOAD_TIMEOUT:
                log.warning("data loading slow: %.1fs > %.0fs", data_load_time,
                            DATA_LOAD_TIMEOUT)
            extras = batch.pop("__extras__", {})

            if trace_dir and step == 2:
                jax.profiler.start_trace(trace_dir)

            t0 = time.time()
            key = jax.random.fold_in(self.base_key, step)
            sync = (step + 1) % self.log_interval == 0 or (step + 1) >= self.max_steps
            try:
                self.state, metrics = self.step_fn(self.state, batch, key)
                # Sync only at log intervals: fetching the loss every step
                # would drain the dispatch pipeline (costly over the remote
                # runtime); between syncs steps run back-to-back on device.
                loss = float(metrics["loss"]) if sync else None
            except RuntimeError as e:
                # error triage parity (train_OpenAICLIP_video_stage1.py:531-540):
                # communication/resource failures stop cleanly; logic errors raise
                msg = str(e)
                if any(s in msg for s in ("RESOURCE_EXHAUSTED", "DEADLINE",
                                          "UNAVAILABLE", "collective",
                                          "timeout")):
                    log.error("distributed/resource error at step %d — "
                              "stopping for relaunch+resume: %s", step, msg[:500])
                    break
                raise
            step_time = time.time() - t0
            if step_time > STEP_TIMEOUT:
                log.error("step timeout: %.1fs > %.0fs", step_time, STEP_TIMEOUT)

            if trace_dir and step == 4:
                jax.profiler.stop_trace()

            step += 1
            if loss is not None:
                metrics_out = {"loss": loss, "step": step,
                               "grad_norm": float(metrics["grad_norm"]),
                               "step_time": step_time,
                               "data_load_time": data_load_time}
                self.writer.scalar("train_loss", loss, step)
                self.writer.scalar("step_time", step_time, step)
                self.writer.scalar("data_load_time", data_load_time, step)
                for k in ("avg_windows_per_video", "bs_eff"):
                    if k in extras:
                        self.writer.scalar(k, float(extras[k]), step)
                log.info("step %d: loss=%.4f step_time=%.3fs data=%.3fs",
                         step, loss, step_time, data_load_time)
            else:
                metrics_out = {"step": step}

            if self._should_checkpoint(step):
                self._checkpoint(step)
                self._last_saved = step
            last_data_t = time.time()

        # ALL processes enter _checkpoint (its snapshot is collective for
        # sharded state; the write itself is gated on is_main inside)
        if step > 0 and getattr(self, "_last_saved", None) != step:
            self._checkpoint(step)
        self.ckpt_writer.close()  # drain async writes before returning
        self.writer.close()
        return metrics_out


def train_from_config(cfg, profile: bool = False) -> dict:
    return Trainer(cfg, profile=profile).train()
