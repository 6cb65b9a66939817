"""Factory auto-remat gate: the decision must be on the PER-DEVICE
activation footprint, not the global batch (code-review r3 finding: the
gate used train_batch_size alone, so multi-chip DP runs whose per-device
share fits remat-free — the measured 23% win — were force-rematted)."""
import jax
import pytest

from genhancer_tpu import registry
from genhancer_tpu.models import vae as vae_m
from genhancer_tpu.models.towers import clip as clip_m
from genhancer_tpu.tasks import factory
from genhancer_tpu.train.config import Config, TRAIN_DEFAULTS


IMG = 336  # (336 // 16)^2 = 441 latent-patch tokens; sliding n_cond=3
           # conditioning frames at patch 16 -> joint seq 3*441 + 441 = 1764


def tower_cfg_336():
    return clip_m.CLIPConfig(
        vision=clip_m.CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                                       num_layers=1, num_heads=2,
                                       image_size=IMG, patch_size=16),
        text=clip_m.CLIPTextConfig(hidden_size=32, intermediate_size=64,
                                   num_layers=1, num_heads=2, vocab_size=50,
                                   max_position_embeddings=8),
        projection_dim=24)


@pytest.fixture()
def patched(monkeypatch):
    from genhancer_tpu.models import dit as dit_m
    tiny_dit = dit_m.DiTConfig(in_channels=16, vec_in_dim=24,
                               context_in_dim=32, hidden_size=64, num_heads=4,
                               depth=1, depth_single_blocks=1,
                               axes_dim=(4, 6, 6))
    tiny_vae = vae_m.VAEConfig(resolution=IMG, ch=8, ch_mult=(1, 2),
                               num_res_blocks=1, z_channels=4)
    cfg = tower_cfg_336()
    monkeypatch.setattr(registry, "build_dit_config", lambda name: tiny_dit)
    monkeypatch.setattr(registry, "build_vae",
                        lambda name, ae_path=None, key=None:
                        (vae_m.init_vae(jax.random.key(0), tiny_vae), tiny_vae))
    monkeypatch.setattr(registry, "tower_family_and_config",
                        lambda tower, size, clip_type=None: ("clip", cfg))
    monkeypatch.setattr(registry, "load_tower",
                        lambda kind, c, model_dir=None, key=None:
                        (clip_m.init_clip(jax.random.key(0), c), c))
    monkeypatch.setattr(factory.video_data, "loader",
                        lambda *a, **kw: "loader-stub")


def _build(bs, task="video_sliding_stage2_all", **cfg_extra):
    cfg = Config(dict(TRAIN_DEFAULTS))
    cfg["task"] = task
    cfg["tower"] = "openai_clip"
    cfg["clip_config"] = Config({"clip_image_size": IMG})
    cfg["data_config"] = Config({"video_dir": "/nonexistent",
                                 "img_size": IMG,
                                 "train_batch_size": bs})
    for k, v in cfg_extra.items():
        cfg[k] = v
    spec, *_ = factory.build_task(cfg)
    return spec


class TestAutoRematGate:
    def test_oversized_single_device_remats(self, patched):
        # 8 x 1764 = 14112 per-device tokens > 8192 -> remat
        assert _build(8, num_devices=1).remat is True

    def test_multi_chip_dp_share_stays_remat_free(self, patched):
        # same global batch over 8 data-parallel devices: 1764 per-device
        # tokens fit -> the measured no-remat win must be kept
        assert _build(8, num_devices=8).remat is False

    def test_sequence_parallel_divides_footprint(self, patched):
        # dp1 x sp4 over 4 devices: 8 x 1764 / 4 = 3528 <= 4096 (the
        # stage-2 threshold) -> no remat
        assert _build(8, num_devices=4, sequence_parallel=4).remat is False

    def test_stage2_threshold_halves(self, patched):
        # stage-2 differentiates through the tower, so the no-remat budget
        # halves (measured: middle @336 B=4 = 6372 tokens OOMs no-remat in
        # bf16 AND int8).  4 x 1764 = 7056: stage-1 (<= 8192) stays
        # remat-free, stage-2 (> 4096) remats.
        assert _build(4, task="video_sliding_stage1",
                      num_devices=1).remat is False
        assert _build(4, task="video_sliding_stage2_all",
                      num_devices=1).remat is True

    def test_explicit_config_wins(self, patched):
        assert _build(8, num_devices=1, remat=False).remat is False


class TestTowerRematGate:
    # sliding n_cond=3, patch 16 @336 -> 442 vision tokens per frame;
    # tower tokens per device = bs * 3 * 442 / n_data vs threshold 6144

    def test_oversized_stage2_gets_tower_remat(self, patched):
        # 8 x 3 x 442 = 10608 > 6144
        assert _build(8, num_devices=1).tower_remat is True

    def test_small_batch_stays_off(self, patched):
        # 4 x 3 x 442 = 5304 <= 6144 (the measured B=4 @336 fit)
        assert _build(4, num_devices=1).tower_remat is False

    def test_dp_share_counts(self, patched):
        # same global batch over 8 data shards: 1326 tokens/device
        assert _build(8, num_devices=8).tower_remat is False

    def test_stage1_never(self, patched):
        # stage-1's frozen tower saves nothing — remat would be pure waste
        assert _build(8, task="video_sliding_stage1",
                      num_devices=1).tower_remat is False

    def test_explicit_config_wins(self, patched):
        assert _build(8, num_devices=1, tower_remat=False).tower_remat is False
        assert _build(1, num_devices=1, tower_remat=True).tower_remat is True
