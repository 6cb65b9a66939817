"""Sanity checks on bench.py's analytic FLOP model (keeps vs_baseline honest)."""
import pytest
import numpy as np

import bench
from genhancer_tpu.models import dit as dit_m
from genhancer_tpu.core.nn import param_count
import jax


class TestFlopModel:
    @pytest.mark.slow
    def test_dit_flops_consistent_with_param_count(self):
        """Matmul FLOPs per token should be ~2x matmul params (within 25%:
        the joint-attention quadratic term and stream asymmetry add slack)."""
        cfg = dit_m.DIT_CONFIGS["flux-dev"]
        seq_img, seq_txt = 196, 1
        f = bench.dit_flops_per_image(seq_img, seq_txt, cfg)
        params = param_count(dit_m.init_dit(jax.random.key(0), dit_m.DiTConfig(
            hidden_size=256, num_heads=8, axes_dim=(8, 12, 12))))
        # full-size param count (analytic, avoids 950M-param init):
        h, mh = cfg.hidden_size, cfg.mlp_hidden
        n_params = (cfg.depth * 2 * (3 * h * h + h * h + 2 * h * mh + 6 * h * h)
                    + cfg.depth_single_blocks * (h * (3 * h + mh) + (h + mh) * h + 3 * h * h)
                    + cfg.in_channels * h + cfg.context_in_dim * h)
        expect = 2 * n_params * (seq_img + seq_txt) * 0.8  # txt stream sees L=1
        assert f > 0.5 * expect
        assert f < 2 * 2 * n_params * (seq_img + seq_txt)

    def test_clip_flops_positive_and_scaled(self):
        a = bench.clip_flops_per_image(257, 1024, 4096, 24)
        b = bench.clip_flops_per_image(577, 1024, 4096, 24)
        assert b > 2 * a  # more tokens -> superlinear (attention quadratic)

    def test_vae_flops_scale_with_resolution(self):
        a = bench.vae_encoder_flops_per_image(224)
        b = bench.vae_encoder_flops_per_image(336)
        np.testing.assert_allclose(b / a, (336 / 224) ** 2, rtol=0.2)
