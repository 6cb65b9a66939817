"""End-to-end trainer tests: CLI config -> train -> checkpoint -> resume.

The SURVEY.md §4 'train-and-resume' integration gate, on tiny synthetic
shards with tiny model configs (patched into the factory via monkeypatch).
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full e2e paths, minutes on 1 CPU core
import yaml

from genhancer_tpu.data import testing as fixtures
from genhancer_tpu.models import dit as dit_m
from genhancer_tpu.models import vae as vae_m
from genhancer_tpu.models.towers import clip as clip_m
from genhancer_tpu.train import checkpoint as ckpt
from genhancer_tpu.train.config import load_config
from genhancer_tpu.weights.torch_io import load_torch_state_dict


TINY_DIT = dit_m.DiTConfig(in_channels=16, vec_in_dim=24, context_in_dim=32,
                           hidden_size=64, num_heads=4, depth=1,
                           depth_single_blocks=1, axes_dim=(4, 6, 6))
TINY_VAE = vae_m.VAEConfig(resolution=32, ch=8, ch_mult=(1, 2), num_res_blocks=1,
                           z_channels=4)
TINY_TOWER = clip_m.CLIPConfig(
    vision=clip_m.CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                   num_layers=1, num_heads=2, image_size=32,
                                   patch_size=16),
    text=clip_m.CLIPTextConfig(hidden_size=16, intermediate_size=32,
                               num_layers=1, num_heads=2, vocab_size=50,
                               max_position_embeddings=8),
    projection_dim=24)


@pytest.fixture
def tiny_models(monkeypatch):
    """Patch the registry to tiny configs so the trainer runs on CPU fast."""
    from genhancer_tpu import registry
    import jax

    monkeypatch.setattr(registry, "build_dit_config", lambda name: TINY_DIT)
    monkeypatch.setattr(registry, "build_vae",
                        lambda name, ae_path=None, key=None:
                        (vae_m.init_vae((key if key is not None else jax.random.key(0)), TINY_VAE), TINY_VAE))
    monkeypatch.setattr(registry, "tower_family_and_config",
                        lambda tower, size, clip_type=None: ("clip", TINY_TOWER))
    monkeypatch.setattr(registry, "load_tower",
                        lambda kind, cfg, model_dir=None, key=None:
                        (clip_m.init_clip((key if key is not None else jax.random.key(0)), cfg), cfg))


def write_cfg(tmp_path, **overrides):
    cfg = {
        "task": "image_stage1", "tower": "openai_clip",
        "data_config": {"train_batch_size": 2, "num_workers": 1, "img_size": 32,
                        "img_dir": overrides.pop("img_dir"), "seed": 0},
        "clip_config": {"clip_image_size": 32, "clip_dim": 24, "t5_dim": 32},
        "output_dir": str(tmp_path / "out"),
        "max_train_steps": overrides.pop("max_train_steps", 3),
        "checkpointing_steps": overrides.pop("checkpointing_steps", 2),
        "learning_rate": 1e-3, "gradient_accumulation_steps":
            overrides.pop("gradient_accumulation_steps", 1),
        "mixed_precision": "no", "report_to": "none",
        "resume_from_checkpoint": overrides.pop("resume_from_checkpoint", None),
    }
    cfg.update(overrides)
    p = tmp_path / "cfg.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(p)


@pytest.fixture
def shards(tmp_path):
    return [fixtures.make_image_shard(str(tmp_path / f"s{i}.tar"), 8, 48, seed=i)
            for i in range(2)]


class TestE2E:
    def test_train_writes_reference_checkpoints(self, tmp_path, shards, tiny_models):
        from genhancer_tpu.cli.train import main
        cfgp = write_cfg(tmp_path, img_dir=shards)
        metrics = main(["--config", cfgp])
        assert metrics["step"] == 3
        out = str(tmp_path / "out")
        names = set(os.listdir(out))
        assert "checkpoint-dit-2.bin" in names
        assert "checkpoint-project-clip-2.bin" in names
        assert "checkpoint-project-t5-2.bin" in names
        assert "optimizer-state-2.bin" in names
        assert "checkpoint-dit-3.bin" in names  # final save
        # key naming parity
        sd = load_torch_state_dict(os.path.join(out, "checkpoint-dit-3.bin"))
        assert "double_blocks.0.img_attn.qkv.weight" in sd
        sd_pc = load_torch_state_dict(os.path.join(out, "checkpoint-project-clip-3.bin"))
        assert "0.weight" in sd_pc and "1.weight" in sd_pc and "3.weight" in sd_pc

    def test_resume_from_latest(self, tmp_path, shards, tiny_models):
        from genhancer_tpu.cli.train import main
        cfgp = write_cfg(tmp_path, img_dir=shards, max_train_steps=2,
                         checkpointing_steps=2)
        main(["--config", cfgp])
        # second run resumes at 2 and trains to 4
        cfgp2 = write_cfg(tmp_path, img_dir=shards, max_train_steps=4,
                          checkpointing_steps=10, resume_from_checkpoint="latest")
        metrics = main(["--config", cfgp2])
        assert metrics["step"] == 4

    def test_compilation_cache_populates(self, tmp_path, shards, tiny_models):
        """compilation_cache_dir: the persistent XLA cache fills on the first
        run (restart/resume then skips the slow first-step compile)."""
        import jax
        from genhancer_tpu.cli.train import main
        cache = tmp_path / "xla_cache"
        cfgp = write_cfg(tmp_path, img_dir=shards, max_train_steps=2,
                         checkpointing_steps=100,
                         compilation_cache_dir=str(cache))
        try:
            main(["--config", cfgp])
            assert cache.exists() and any(cache.iterdir()), list(cache.iterdir())
        finally:
            # don't leak the cache config into later tests in this process
            jax.config.update("jax_compilation_cache_dir", None)

    def test_grad_accumulation(self, tmp_path, shards, tiny_models):
        from genhancer_tpu.cli.train import main
        cfgp = write_cfg(tmp_path, img_dir=shards, max_train_steps=2,
                         gradient_accumulation_steps=2, checkpointing_steps=100)
        metrics = main(["--config", cfgp])
        assert metrics["step"] == 2
        assert np.isfinite(metrics["loss"])

    def test_grad_accum_param_dtype(self, tmp_path, shards, tiny_models):
        """grad_accum_dtype: param — the accumulator tracks each param's own
        dtype (torch-DDP-bf16 bucket semantics, half the accumulator HBM;
        step_utils numeric parity in test_step_utils.TestAccumDtype)."""
        from genhancer_tpu.cli.train import main
        cfgp = write_cfg(tmp_path, img_dir=shards, max_train_steps=2,
                         gradient_accumulation_steps=2, checkpointing_steps=100,
                         grad_accum_dtype="param")
        metrics = main(["--config", cfgp])
        assert metrics["step"] == 2
        assert np.isfinite(metrics["loss"])

    def test_stage2_exports_hf_dir(self, tmp_path, shards, tiny_models):
        from genhancer_tpu.cli.train import main
        cfgp = write_cfg(tmp_path, img_dir=shards, task="image_stage2_only",
                         max_train_steps=2, checkpointing_steps=2,
                         lora_config={"r": 2, "lora_alpha": 2,
                                      "lora_dropout": 0.0, "bias": "lora_only"})
        main(["--config", cfgp])
        out = str(tmp_path / "out")
        exports = [d for d in os.listdir(out) if d.startswith("clip-vit-large")]
        assert exports, os.listdir(out)
        sd = load_torch_state_dict(os.path.join(out, exports[0], "pytorch_model.bin"))
        assert "vision_model.embeddings.class_embedding" in sd
        assert not any("lora" in k for k in sd)
        # the reference eval consumes the dir via CLIPModel.from_pretrained
        # (evaluate_mmvp_OpenAICLIP_336.py:159-189) — prove the trainer-written
        # dir loads with stock transformers and runs
        import torch
        from transformers import CLIPModel
        loaded = CLIPModel.from_pretrained(os.path.join(out, exports[0])).eval()
        px = torch.zeros(1, 3, TINY_TOWER.vision.image_size, TINY_TOWER.vision.image_size)
        with torch.no_grad():
            logits = loaded(input_ids=torch.tensor([[5, 6, 2]]),
                            pixel_values=px).logits_per_text
        assert logits.shape == (1, 1) and torch.isfinite(logits).all()

    def test_sigterm_preemption_checkpoints_and_resumes(self, tmp_path, shards,
                                                        tiny_models):
        """Preemption safety: SIGTERM mid-run stops at the next step boundary,
        writes a resumable checkpoint, and a relaunch with
        resume_from_checkpoint: latest continues from it."""
        import logging
        import signal

        from genhancer_tpu.cli.train import main

        class FireOnFirstStep(logging.Handler):
            fired = False

            def emit(self, record):
                if (not self.fired and isinstance(record.msg, str)
                        and record.msg.startswith("step %d: loss")):
                    self.fired = True
                    # delivered to THIS (main) thread's handler immediately
                    signal.raise_signal(signal.SIGTERM)

        h = FireOnFirstStep()
        tlog = logging.getLogger("genhancer_tpu.trainer")
        prev_level = tlog.level
        tlog.addHandler(h)
        tlog.setLevel(logging.INFO)   # pytest leaves root at WARNING, which
        try:                          # would filter the step records out
            cfgp = write_cfg(tmp_path, img_dir=shards, max_train_steps=50,
                             checkpointing_steps=1000, log_interval=1)
            m = main(["--config", cfgp])
        finally:
            tlog.removeHandler(h)
            tlog.setLevel(prev_level)
        assert h.fired, "step log never reached the test handler"
        stopped = m["step"]
        assert 0 < stopped < 50, m          # preempted, not run to completion
        out = str(tmp_path / "out")
        assert f"checkpoint-dit-{stopped}.bin" in os.listdir(out)

        cfgp2 = write_cfg(tmp_path, img_dir=shards,
                          max_train_steps=stopped + 2,
                          checkpointing_steps=1000,
                          resume_from_checkpoint="latest")
        m2 = main(["--config", cfgp2])
        assert m2["step"] == stopped + 2

    def test_video_trainer_compat_name(self, tmp_path, tiny_models):
        from genhancer_tpu.cli.train import main
        vshards = [fixtures.make_video_shard(str(tmp_path / "v0.tar"), 3, 6, 48)]
        cfg = {
            "data_config": {"train_batch_size": 2, "num_workers": 1, "img_size": 32,
                            "video_dir": vshards, "seed": 0},
            "clip_config": {"clip_image_size": 32, "clip_dim": 24, "t5_dim": 32},
            "output_dir": str(tmp_path / "outv"), "max_train_steps": 2,
            "checkpointing_steps": 100, "learning_rate": 1e-3,
            "mixed_precision": "no", "report_to": "none",
        }
        p = tmp_path / "vcfg.yaml"
        with open(p, "w") as f:
            yaml.safe_dump(cfg, f)
        metrics = main(["--config", str(p), "--trainer",
                        "train_OpenAICLIP_video_stage1"])
        assert metrics["step"] == 2
        names = os.listdir(str(tmp_path / "outv"))
        assert any(n.startswith("checkpoint-visual-adapter-") for n in names)


class TestParallelKnobs:
    """model_parallel + shard_optimizer_state drive through the full trainer
    (build_task -> placements -> step -> checkpoint)."""

    def test_tp2_trains_and_checkpoints(self, tmp_path, shards, tiny_models):
        from genhancer_tpu.cli.train import main
        cfgp = write_cfg(tmp_path, img_dir=shards, max_train_steps=2,
                         checkpointing_steps=2, model_parallel=2)
        metrics = main(["--config", cfgp])
        assert metrics["step"] == 2
        assert np.isfinite(metrics["loss"])
        assert "checkpoint-dit-2.bin" in os.listdir(str(tmp_path / "out"))

    def test_zero1_trains_and_checkpoints(self, tmp_path, shards, tiny_models):
        from genhancer_tpu.cli.train import main
        cfgp = write_cfg(tmp_path, img_dir=shards, max_train_steps=2,
                         checkpointing_steps=2, shard_optimizer_state=True)
        metrics = main(["--config", cfgp])
        assert metrics["step"] == 2
        assert np.isfinite(metrics["loss"])
        assert "optimizer-state-2.bin" in os.listdir(str(tmp_path / "out"))

    def test_fsdp_trains_and_checkpoints(self, tmp_path, shards, tiny_models):
        # ZeRO-3: params sharded over the data axis (fsdp_min_size=0 so the
        # tiny test leaves actually shard); checkpoint gathers shards back
        # to the reference artifact layout
        from genhancer_tpu.cli.train import main
        cfgp = write_cfg(tmp_path, img_dir=shards, max_train_steps=2,
                         checkpointing_steps=2, fsdp=True, fsdp_min_size=0)
        metrics = main(["--config", cfgp])
        assert metrics["step"] == 2
        assert np.isfinite(metrics["loss"])
        assert "checkpoint-dit-2.bin" in os.listdir(str(tmp_path / "out"))
