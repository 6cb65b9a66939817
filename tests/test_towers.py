"""Numerical parity of JAX towers vs HF transformers (torch CPU).

Tiny random-config CLIPModel/SiglipModel instances are built with HF, their
state dicts converted, and activations compared.  This is the gate that
guarantees MMVP-VLM accuracy parity (BASELINE.md: within 0.5%) — if logits
match to ~1e-4 on random weights, they match on real weights.
"""
import numpy as np
import jax.numpy as jnp
import pytest
import torch

from genhancer_tpu.models.towers import clip as jclip
from genhancer_tpu.models.towers import siglip as jsiglip
from genhancer_tpu.weights import hf_convert, torch_io


def tiny_hf_clip():
    from transformers import CLIPConfig, CLIPModel
    cfg = CLIPConfig(
        text_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, vocab_size=99, max_position_embeddings=12,
                         eos_token_id=2, hidden_act="quick_gelu"),
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, image_size=28, patch_size=14,
                           hidden_act="quick_gelu"),
        projection_dim=16,
    )
    torch.manual_seed(0)
    model = CLIPModel(cfg).eval()
    return model, cfg


def tiny_hf_siglip():
    from transformers import SiglipConfig, SiglipModel
    cfg = SiglipConfig(
        text_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, vocab_size=99, max_position_embeddings=12,
                         hidden_act="gelu_pytorch_tanh"),
        vision_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                           num_attention_heads=4, image_size=28, patch_size=14,
                           hidden_act="gelu_pytorch_tanh"),
    )
    torch.manual_seed(0)
    model = SiglipModel(cfg).eval()
    return model, cfg


@pytest.fixture(scope="module")
def clip_pair():
    model, cfg = tiny_hf_clip()
    jcfg = jclip.CLIPConfig.from_hf(model.config.to_dict())
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = hf_convert.tower_from_torch(sd)
    return model, jcfg, params


@pytest.fixture(scope="module")
def siglip_pair():
    model, cfg = tiny_hf_siglip()
    jcfg = jsiglip.SiglipConfig.from_hf(model.config.to_dict())
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = hf_convert.tower_from_torch(sd)
    return model, jcfg, params


class TestCLIPParity:
    def test_vision_pooled_and_patches(self, clip_pair, rng):
        model, jcfg, params = clip_pair
        px = rng.standard_normal((2, 3, 28, 28), dtype=np.float32)
        with torch.no_grad():
            out = model.vision_model(torch.from_numpy(px), output_hidden_states=True)
        last_j, pooled_j = jclip.vision_forward(
            params["vision_model"], jnp.asarray(px.transpose(0, 2, 3, 1)), jcfg.vision)
        np.testing.assert_allclose(np.asarray(pooled_j), out.pooler_output.numpy(),
                                   rtol=1e-4, atol=1e-4)
        # video mode consumes last_hidden_state[:, 1:] (pre-post-LN)
        np.testing.assert_allclose(np.asarray(last_j), out.last_hidden_state.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_text_pooled(self, clip_pair, rng):
        model, jcfg, params = clip_pair
        ids = rng.integers(3, 99, (2, 12))
        ids[:, -1] = 2  # eos (legacy id 2 — argmax pooling path)
        ids_t = torch.from_numpy(ids)
        with torch.no_grad():
            out = model.text_model(ids_t)
        _, pooled_j = jclip.text_forward(params["text_model"], jnp.asarray(ids), jcfg.text)
        np.testing.assert_allclose(np.asarray(pooled_j), out.pooler_output.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_full_logits(self, clip_pair, rng):
        model, jcfg, params = clip_pair
        px = rng.standard_normal((2, 3, 28, 28), dtype=np.float32)
        ids = rng.integers(3, 99, (3, 12))
        ids[:, -1] = 2
        with torch.no_grad():
            out = model(input_ids=torch.from_numpy(ids), pixel_values=torch.from_numpy(px))
        lt_j, li_j = jclip.clip_logits(params, jnp.asarray(ids),
                                       jnp.asarray(px.transpose(0, 2, 3, 1)), jcfg)
        np.testing.assert_allclose(np.asarray(lt_j), out.logits_per_text.numpy(),
                                   rtol=1e-3, atol=1e-3)

    def test_export_roundtrip(self, clip_pair, rng):
        """params -> torch sd -> HF model -> same logits (stage-2 HF export path)."""
        model, jcfg, params = clip_pair
        sd = hf_convert.tower_to_torch(params)
        model2, _ = tiny_hf_clip()
        missing, unexpected = model2.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, strict=False)
        assert not unexpected
        assert not missing, f"export misses HF params: {missing}"
        px = rng.standard_normal((1, 3, 28, 28), dtype=np.float32)
        with torch.no_grad():
            a = model(pixel_values=torch.from_numpy(px),
                      input_ids=torch.tensor([[5, 6, 2]])).logits_per_text.numpy()
            b = model2(pixel_values=torch.from_numpy(px),
                       input_ids=torch.tensor([[5, 6, 2]])).logits_per_text.numpy()
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


class TestSigLIPParity:
    def test_vision_map_head(self, siglip_pair, rng):
        model, jcfg, params = siglip_pair
        px = rng.standard_normal((2, 3, 28, 28), dtype=np.float32)
        with torch.no_grad():
            out = model.vision_model(torch.from_numpy(px))
        last_j, pooled_j = jsiglip.vision_forward(
            params["vision_model"], jnp.asarray(px.transpose(0, 2, 3, 1)), jcfg.vision)
        np.testing.assert_allclose(np.asarray(last_j), out.last_hidden_state.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(pooled_j), out.pooler_output.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_text_and_logits(self, siglip_pair, rng):
        model, jcfg, params = siglip_pair
        px = rng.standard_normal((2, 3, 28, 28), dtype=np.float32)
        ids = rng.integers(3, 99, (2, 12))
        with torch.no_grad():
            out = model(input_ids=torch.from_numpy(ids), pixel_values=torch.from_numpy(px))
        lt_j, _ = jsiglip.siglip_logits(params, jnp.asarray(ids),
                                        jnp.asarray(px.transpose(0, 2, 3, 1)), jcfg)
        np.testing.assert_allclose(np.asarray(lt_j), out.logits_per_text.numpy(),
                                   rtol=1e-3, atol=1e-3)


class TestStateDictUtils:
    def test_flatten_unflatten_roundtrip(self):
        tree = {"a": {"b": [np.zeros(2), np.ones(3)]}, "c": np.full(1, 7.0)}
        sd = torch_io.flatten_pytree(tree)
        assert set(sd) == {"a.b.0", "a.b.1", "c"}
        back = torch_io.unflatten_state_dict(sd)
        assert isinstance(back["a"]["b"], list)
        np.testing.assert_array_equal(back["a"]["b"][1], np.ones(3))

    def test_torch_bin_roundtrip(self, tmp_path):
        sd = {"x.weight": np.arange(6, dtype=np.float32).reshape(2, 3)}
        p = str(tmp_path / "ckpt.bin")
        torch_io.save_torch_state_dict(sd, p)
        back = torch_io.load_torch_state_dict(p)
        np.testing.assert_array_equal(back["x.weight"], sd["x.weight"])

    def test_noncontiguous_digit_keys_stay_dict(self):
        sd = {"proj.0.weight": np.zeros(1), "proj.3.weight": np.ones(1)}
        tree = torch_io.unflatten_state_dict(sd)
        assert isinstance(tree["proj"], dict)
        assert set(tree["proj"]) == {"0", "3"}


class TestFromPretrainedExport:
    """Prove the stage-2 export at its actual consumption point: the reference
    eval loads exported dirs via ``CLIPModel.from_pretrained(dir)``
    (``evaluation/evaluate_mmvp_OpenAICLIP_336.py:159-189``).  A dir written by
    our exporter (synthesized config.json + torch-zip-pickle pytorch_model.bin)
    must load with stock ``transformers`` and produce logits matching the
    in-framework tower."""

    def _export_dir(self, tmp_path, params, hf_cfg_dict):
        import json, os
        out = str(tmp_path / "export")
        os.makedirs(out, exist_ok=True)
        sd = hf_convert.tower_to_torch(params)
        torch_io.save_torch_state_dict(sd, os.path.join(out, "pytorch_model.bin"))
        with open(os.path.join(out, "config.json"), "w") as f:
            json.dump(hf_cfg_dict, f)
        return out

    def test_clip_from_pretrained(self, clip_pair, rng, tmp_path):
        from transformers import CLIPModel
        model, jcfg, params = clip_pair
        out = self._export_dir(tmp_path, params, jcfg.to_hf())
        loaded = CLIPModel.from_pretrained(out).eval()
        px = rng.standard_normal((2, 3, 28, 28), dtype=np.float32)
        ids = np.array([[5, 6, 2], [7, 8, 2]])
        with torch.no_grad():
            lt_t = loaded(input_ids=torch.from_numpy(ids),
                          pixel_values=torch.from_numpy(px)).logits_per_text.numpy()
        lt_j, _ = jclip.clip_logits(params, jnp.asarray(ids),
                                    jnp.asarray(px.transpose(0, 2, 3, 1)), jcfg)
        np.testing.assert_allclose(np.asarray(lt_j), lt_t, rtol=1e-3, atol=1e-3)

    def test_siglip_from_pretrained(self, siglip_pair, rng, tmp_path):
        from transformers import SiglipModel
        model, jcfg, params = siglip_pair
        out = self._export_dir(tmp_path, params, jcfg.to_hf())
        loaded = SiglipModel.from_pretrained(out).eval()
        px = rng.standard_normal((2, 3, 28, 28), dtype=np.float32)
        ids = np.array([[5, 6, 1], [7, 8, 1]])
        with torch.no_grad():
            lt_t = loaded(input_ids=torch.from_numpy(ids),
                          pixel_values=torch.from_numpy(px)).logits_per_text.numpy()
        lt_j, _ = jsiglip.siglip_logits(params, jnp.asarray(ids),
                                        jnp.asarray(px.transpose(0, 2, 3, 1)), jcfg)
        np.testing.assert_allclose(np.asarray(lt_j), lt_t, rtol=1e-3, atol=1e-3)
