"""Pixel-exact eval-preprocessing parity against the real HF image
processors, plus full-size (24-layer CLIP-L) logits parity (VERDICT r1 #4).

The MMVP budget is 0.5% accuracy — ``eval/mmvp.py:preprocess_image``
reimplements CLIPImageProcessor / SiglipImageProcessor semantics and these
golden tests pin them to the originals at awkward (odd, non-square) input
sizes where resize rounding and crop offsets diverge first."""
import io
import os

import numpy as np
import pytest
from PIL import Image

from genhancer_tpu.eval import mmvp


def _save_img(tmp_path, w, h, seed=0):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    p = os.path.join(tmp_path, f"img_{w}x{h}_{seed}.png")  # lossless
    Image.fromarray(arr).save(p)
    return p


SIZES = [(257, 193), (224, 224), (193, 257), (640, 480), (225, 449), (64, 64)]


class TestCLIPProcessorParity:
    @pytest.mark.parametrize("wh", SIZES)
    @pytest.mark.parametrize("image_size", [224, 336])
    def test_pixel_exact(self, tmp_path, wh, image_size):
        from transformers import CLIPImageProcessor
        proc = CLIPImageProcessor(
            size={"shortest_edge": image_size},
            crop_size={"height": image_size, "width": image_size})
        path = _save_img(tmp_path, *wh)
        ref = proc(Image.open(path).convert("RGB"),
                   return_tensors="np")["pixel_values"][0]          # [3, S, S]
        got = mmvp.preprocess_image(path, "clip", image_size)       # [S, S, 3]
        np.testing.assert_allclose(got.transpose(2, 0, 1), ref,
                                   rtol=0, atol=1e-5)


class TestSiglipProcessorParity:
    @pytest.mark.parametrize("wh", SIZES)
    @pytest.mark.parametrize("image_size", [224, 384])
    def test_pixel_exact(self, tmp_path, wh, image_size):
        from transformers import SiglipImageProcessor
        proc = SiglipImageProcessor(
            size={"height": image_size, "width": image_size})
        path = _save_img(tmp_path, *wh)
        ref = proc(Image.open(path).convert("RGB"),
                   return_tensors="np")["pixel_values"][0]
        got = mmvp.preprocess_image(path, "siglip", image_size)
        np.testing.assert_allclose(got.transpose(2, 0, 1), ref,
                                   rtol=0, atol=1e-5)


@pytest.mark.slow
class TestFullSizeTowerParity:
    """Random-weights logits parity at the REAL CLIP-L/14 dimensions
    (24 layers, hidden 1024, 257 tokens) — tiny-config parity can hide
    depth-dependent drift; the 0.5% MMVP budget cannot."""

    def test_clip_l14_logits_match_hf(self):
        import torch
        from transformers import CLIPConfig, CLIPModel
        from genhancer_tpu.models.towers import clip as jclip
        from genhancer_tpu.weights import hf_convert
        import jax.numpy as jnp

        cfg = CLIPConfig(
            text_config=dict(hidden_size=768, intermediate_size=3072,
                             num_hidden_layers=12, num_attention_heads=12,
                             vocab_size=49408, max_position_embeddings=77,
                             eos_token_id=49407, hidden_act="quick_gelu"),
            vision_config=dict(hidden_size=1024, intermediate_size=4096,
                               num_hidden_layers=24, num_attention_heads=16,
                               image_size=224, patch_size=14,
                               hidden_act="quick_gelu"),
            projection_dim=768)
        torch.manual_seed(0)
        model = CLIPModel(cfg).eval()
        jcfg = jclip.CLIPConfig.from_hf(model.config.to_dict())
        params = hf_convert.tower_from_torch(
            {k: v.numpy() for k, v in model.state_dict().items()})

        rng = np.random.default_rng(0)
        px = rng.random((2, 224, 224, 3), np.float32) * 2 - 1
        ids = rng.integers(3, 49407, (2, 77))
        ids[:, -1] = 49407

        with torch.no_grad():
            ref = model(input_ids=torch.tensor(ids),
                        pixel_values=torch.tensor(
                            px.transpose(0, 3, 1, 2))).logits_per_text.numpy()
        got, _ = jclip.clip_logits(params, jnp.asarray(ids), jnp.asarray(px), jcfg)
        # fp32 through 24 layers: allow small accumulation differences only
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)
