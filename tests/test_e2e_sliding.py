"""Sliding-window e2e through the CLI + remaining data/ckpt coverage."""
import os

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow  # full e2e paths, minutes on 1 CPU core
import yaml

from genhancer_tpu.data import testing as fixtures
from genhancer_tpu.data import wds
from genhancer_tpu.data.prefetch import DevicePrefetcher
from genhancer_tpu.parallel import mesh as mesh_m

from test_e2e_train import tiny_models  # noqa: F401 (fixture)


class TestSlidingE2E:
    def test_sliding_cli_run(self, tmp_path, tiny_models):  # noqa: F811
        from genhancer_tpu.cli.train import main
        shard = fixtures.make_video_shard(str(tmp_path / "v.tar"), 3, 6, 48)
        cfg = {
            "data_config": {"train_batch_size": 2, "num_workers": 1,
                            "img_size": 32, "video_dir": [shard], "seed": 0,
                            "return_mode": "full_frames",
                            "max_frames_per_video": 6},
            "clip_config": {"clip_image_size": 32, "clip_dim": 24, "t5_dim": 32},
            "window_cond": 3, "window_stride": 1, "max_windows_per_video": 2,
            "output_dir": str(tmp_path / "out"), "max_train_steps": 2,
            "checkpointing_steps": 100, "learning_rate": 1e-3,
            "mixed_precision": "no", "report_to": "none",
        }
        p = tmp_path / "cfg.yaml"
        with open(p, "w") as f:
            yaml.safe_dump(cfg, f)
        metrics = main(["--config", str(p), "--trainer",
                        "train_OpenAICLIP_sliding_windows_nextpredic_stage1"])
        assert metrics["step"] == 2
        assert np.isfinite(metrics["loss"])
        names = os.listdir(str(tmp_path / "out"))
        assert any(n.startswith("checkpoint-visual-adapter-") for n in names)


class TestSiglipExport:
    def test_export_writes_siglip_config(self, tmp_path):
        from genhancer_tpu.models.towers import siglip as jsiglip
        from genhancer_tpu.tasks import image as image_task
        from genhancer_tpu.train import checkpoint as C, optim
        from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS
        from genhancer_tpu.train.state import create_state
        from genhancer_tpu.weights.torch_io import load_hf_config
        from genhancer_tpu.models import dit as dit_m, vae as vae_m

        tower_cfg = jsiglip.SiglipConfig(
            vision=jsiglip.SiglipVisionConfig(hidden_size=16, intermediate_size=32,
                                              num_layers=1, num_heads=2,
                                              image_size=28, patch_size=14),
            text=jsiglip.SiglipTextConfig(hidden_size=16, intermediate_size=32,
                                          num_layers=1, num_heads=2, vocab_size=40,
                                          max_position_embeddings=8,
                                          projection_size=16))
        spec = image_task.TaskSpec(
            stage="stage2_only", tower_kind="siglip", img_size=32,
            clip_image_size=28,
            dit_cfg=dit_m.DiTConfig(in_channels=16, vec_in_dim=24,
                                    context_in_dim=32, hidden_size=64,
                                    num_heads=4, depth=1, depth_single_blocks=1,
                                    axes_dim=(4, 6, 6)),
            vae_cfg=vae_m.VAEConfig(resolution=32, ch=8, ch_mult=(1, 2),
                                    num_res_blocks=1, z_channels=4),
            tower_cfg=tower_cfg, clip_dim=24, t5_dim=32, lora_r=2,
            lora_targets=("q_proj",), compute_dtype=np.float32,
            dit_param_dtype=np.float32)
        modules = image_task.init_modules(jax.random.key(0), spec)
        optimizer = optim.make_optimizer(Config(dict(TRAIN_DEFAULTS)))
        st = create_state(modules, image_task.trainable_predicate(spec, modules),
                          optimizer)
        out = C.export_hf_tower(st, str(tmp_path / "exp"),
                                base_config=tower_cfg.to_hf())
        cfg = load_hf_config(out)
        assert cfg["model_type"] == "siglip"
        assert cfg["vision_config"]["hidden_size"] == 16


class TestShardWorkerSplit:
    def test_worker_split_partitions(self, tmp_path):
        shards = [fixtures.make_image_shard(str(tmp_path / f"s{i}.tar"), 2, 32,
                                            seed=i) for i in range(4)]
        streams = [wds.ShardStream(shards, worker_index=i, worker_count=2)
                   for i in range(2)]
        all_shards = sum((s.shards for s in streams), [])
        assert sorted(all_shards) == sorted(shards)
        assert not set(streams[0].shards) & set(streams[1].shards)


class TestPrefetchMesh:
    def test_sharded_prefetch(self, tmp_path):
        mesh = mesh_m.make_mesh(4)
        def gen():
            yield {"image": np.ones((8, 4, 4, 3), np.float32), "text": ["a"]}
        pf = DevicePrefetcher(gen(), mesh=mesh, array_keys={"image"})
        b = next(iter(pf))
        assert b["image"].sharding.num_devices == 4
        assert b["text"] == ["a"]
