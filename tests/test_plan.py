"""genhancer-plan: shape-only memory/parallelism planner (train/plan.py).

The static-residency accounting must be placement-exact (same rules as the
trainer: tp.dit_param_spec / fsdp.fsdp_spec / shard_over_data divisibility)
and the knob ladder must escalate until the budget fits."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS
from genhancer_tpu.train import plan as plan_m


def debug_cfg(**over):
    c = dict(TRAIN_DEFAULTS)
    c.update({
        "task": "image_stage1", "tower": "openai_clip",
        "model_name": "flux-debug",
        "data_config": {"train_batch_size": 4, "img_size": 224,
                        "img_dir": "/nonexistent-never-touched"},
        "clip_config": {"clip_image_size": 224, "clip_dim": 768,
                        "t5_dim": 4096},
        "max_train_steps": 10,
    })
    c.update(over)
    return Config(c)


class TestShapeState:
    def test_no_data_io_and_exact_counts(self, monkeypatch):
        # the img_dir does not exist: build_spec/shape_state must not touch it.
        # Tiny registry configs (the e2e tiny_models pattern): the
        # eval_shape-vs-real-init comparison is config-independent, and the
        # flux-debug real init cost ~57 s of single-CPU compile.
        from test_e2e_train import TINY_DIT, TINY_VAE, TINY_TOWER
        from genhancer_tpu import registry
        from genhancer_tpu.models.vae import VAE_CONFIGS
        monkeypatch.setattr(registry, "build_dit_config", lambda name: TINY_DIT)
        monkeypatch.setattr(registry, "tower_family_and_config",
                            lambda tower, size, clip_type=None:
                            ("clip", TINY_TOWER))
        monkeypatch.setitem(VAE_CONFIGS, "flux-debug", TINY_VAE)
        cfg = debug_cfg()
        cfg["clip_config"] = {"clip_image_size": 32, "clip_dim": 24,
                              "t5_dim": 32}
        cfg["data_config"] = dict(cfg["data_config"], img_size=32)
        spec, kind, state = plan_m.shape_state(cfg)
        assert kind == "image"
        # struct tree matches a real init leaf-for-leaf
        from genhancer_tpu.tasks import image as image_task
        from genhancer_tpu.train import optim
        optimizer = optim.make_optimizer(debug_cfg(), total_steps=10)
        real = image_task.create_task_state(jax.random.key(0), spec, optimizer)
        from genhancer_tpu.train.state import flatten_params
        got = flatten_params(state.trainable)
        want = flatten_params(real.trainable)
        assert got.keys() == want.keys()
        for k in want:
            assert got[k].shape == want[k].shape, k
            assert got[k].dtype == want[k].dtype, k

    def test_video_spec_builds(self):
        cfg = debug_cfg(task="video_middle_stage1")
        spec, kind, state = plan_m.shape_state(cfg)
        assert kind == "video"
        assert plan_m._leaf_bytes(
            jax.tree_util.tree_leaves(state.trainable)[0]) > 0


class TestAccounting:
    def test_fsdp_divides_params(self):
        flat = {"dit.w": jax.ShapeDtypeStruct((64, 32), jnp.float32),
                "dit.b": jax.ShapeDtypeStruct((7,), jnp.float32)}
        rep = plan_m._params_bytes(flat, dp=8, tp=1, fsdp=False, fsdp_min=0)
        shd = plan_m._params_bytes(flat, dp=8, tp=1, fsdp=True, fsdp_min=0)
        # w shards 8-way; b (7, indivisible) stays replicated
        assert rep == 64 * 32 * 4 + 7 * 4
        assert shd == 64 * 32 * 4 // 8 + 7 * 4

    def test_tp_divides_dit_qkv(self):
        flat = {"dit.double_blocks.0.img.attn.qkv.weight":
                jax.ShapeDtypeStruct((96, 32), jnp.float32)}
        rep = plan_m._params_bytes(flat, dp=4, tp=1, fsdp=False, fsdp_min=0)
        tp2 = plan_m._params_bytes(flat, dp=4, tp=2, fsdp=False, fsdp_min=0)
        assert tp2 == rep // 2
        # fsdp composes: second factor over the data axis
        both = plan_m._params_bytes(flat, dp=4, tp=2, fsdp=True, fsdp_min=0)
        assert both == rep // 8


class TestPlan:
    def test_fits_with_big_budget(self):
        report = plan_m.plan(debug_cfg(), num_devices=8, hbm_gb=512.0)
        assert report["configured"]["fits"]
        assert report["recommendation"] == "as configured"
        assert len(report["candidates"]) == 1

    def test_ladder_escalates_until_fit(self):
        # flux-debug state is tiny — pick a budget between the replicated
        # and the fully-sharded footprint so a ladder entry must fit
        base = plan_m.plan(debug_cfg(), num_devices=8, hbm_gb=512.0)
        total = base["configured"]["total_gib"]
        report = plan_m.plan(debug_cfg(fsdp_min_size=0), num_devices=8,
                             hbm_gb=total * 0.45)
        assert not report["configured"]["fits"]
        assert len(report["candidates"]) > 1
        assert (report["candidates"][-1]["fits"]
                or "nothing fits" in report["recommendation"])
        if report["candidates"][-1]["fits"]:
            assert report["recommendation"] == report["candidates"][-1]["name"]

    def test_tower_remat_shrinks_stage2_activations(self):
        import dataclasses
        cfg = debug_cfg(task="video_middle_stage2_all")
        spec, _, _ = plan_m.shape_state(cfg)
        a0, n0 = plan_m._activation_bytes(spec, cfg, dp=1, sp=1)
        a1, n1 = plan_m._activation_bytes(
            dataclasses.replace(spec, tower_remat=True), cfg, dp=1, sp=1)
        assert "tower-under-autodiff" in n0
        assert a1 < a0 and "tower_remat" in n1

    def test_stage2_ladder_offers_tower_remat(self):
        # an impossible budget exhausts the whole ladder: the stage-2 rung
        # list must include the tower_remat escalation (and stage-1 must not)
        cfg = debug_cfg(task="video_middle_stage2_all", fsdp_min_size=0)
        rep = plan_m.plan(cfg, num_devices=8, hbm_gb=1e-6)
        assert any("tower_remat" in c["name"] for c in rep["candidates"])
        cfg1 = debug_cfg(task="video_middle_stage1", fsdp_min_size=0)
        rep1 = plan_m.plan(cfg1, num_devices=8, hbm_gb=1e-6)
        assert not any("tower_remat" in c["name"] for c in rep1["candidates"])

    def test_cli_json(self, capsys):
        import json
        from genhancer_tpu.cli.plan import main
        import tempfile, yaml, os
        cfg = dict(debug_cfg())
        with tempfile.NamedTemporaryFile("w", suffix=".yaml",
                                         delete=False) as f:
            yaml.safe_dump(cfg, f)
            path = f.name
        try:
            main(["--config", path, "--num_devices", "4", "--json"])
            out = capsys.readouterr().out.strip().splitlines()[-1]
            rep = json.loads(out)
            assert rep["num_devices"] == 4 and rep["candidates"]
        finally:
            os.unlink(path)
