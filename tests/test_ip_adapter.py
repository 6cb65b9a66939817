"""IP-adapter conditioning + DiT-LoRA tests (generative-core API surface)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from genhancer_tpu.models import dit as D
from genhancer_tpu.models import ip_adapter as IP
from genhancer_tpu.train import lora

from test_dit import TINY, make_inputs


class TestIPAdapter:
    @pytest.mark.slow
    def test_zero_init_is_noop(self):
        params = D.init_dit(jax.random.key(0), TINY)
        ip_params = IP.init_ip_params(jax.random.key(1), TINY,
                                      context_dim=32, clip_embeddings_dim=24)
        inp = make_inputs(TINY)
        base = D.dit_forward(params, TINY, **inp)
        embeds = jnp.ones((2, 24))
        with_ip = D.dit_forward(params, TINY, **inp, image_proj=embeds,
                                ip_params=ip_params, ip_scale=1.0)
        np.testing.assert_allclose(np.asarray(base), np.asarray(with_ip),
                                   rtol=1e-6, atol=1e-6)

    def test_nonzero_kv_changes_output(self):
        params = D.init_dit(jax.random.key(0), TINY)
        ip_params = IP.init_ip_params(jax.random.key(1), TINY,
                                      context_dim=32, clip_embeddings_dim=24)
        # random (not constant) weights: IP tokens are LayerNormed, so a
        # constant matrix annihilates them (rows sum the zero-mean vector)
        for i, blk in enumerate(ip_params["ip_double"]):
            blk["v_proj"]["weight"] = 0.05 * jax.random.normal(
                jax.random.key(50 + i), blk["v_proj"]["weight"].shape)
        inp = make_inputs(TINY)
        base = D.dit_forward(params, TINY, **inp)
        with_ip = D.dit_forward(params, TINY, **inp,
                                image_proj=jnp.ones((2, 24)),
                                ip_params=ip_params, ip_scale=1.0)
        assert float(jnp.max(jnp.abs(base - with_ip))) > 1e-4

    def test_ip_scale_zero_disables(self):
        params = D.init_dit(jax.random.key(0), TINY)
        ip_params = IP.init_ip_params(jax.random.key(1), TINY,
                                      context_dim=32, clip_embeddings_dim=24)
        for blk in ip_params["ip_double"] + ip_params["ip_single"]:
            blk["v_proj"]["weight"] = jnp.ones_like(blk["v_proj"]["weight"]) * 0.1
            blk["k_proj"]["weight"] = jnp.ones_like(blk["k_proj"]["weight"]) * 0.1
        inp = make_inputs(TINY)
        base = D.dit_forward(params, TINY, **inp)
        off = D.dit_forward(params, TINY, **inp, image_proj=jnp.ones((2, 24)),
                            ip_params=ip_params, ip_scale=0.0)
        np.testing.assert_allclose(np.asarray(base), np.asarray(off),
                                   rtol=1e-6, atol=1e-6)

    def test_image_proj_model_shapes(self):
        p = IP.init_image_proj_model(jax.random.key(0), 24, 32, num_tokens=4)
        out = IP.image_proj_model(p, jnp.ones((3, 24)))
        assert out.shape == (3, 4, 32)

    def test_pretokenized_image_proj(self):
        """3-D image_proj bypasses the ImageProjModel."""
        params = D.init_dit(jax.random.key(0), TINY)
        ip_params = IP.init_ip_params(jax.random.key(1), TINY,
                                      context_dim=32, clip_embeddings_dim=24)
        inp = make_inputs(TINY)
        out = D.dit_forward(params, TINY, **inp,
                            image_proj=jnp.ones((2, 4, 32)),
                            ip_params=ip_params)
        assert out.shape == (2, 8, TINY.in_channels)


class TestDiTLoRA:
    @pytest.mark.slow
    def test_inject_on_dit_qkv(self):
        """The reference's LoraFluxAttnProcessor / DoubleStreamBlockLora-
        Processor equivalent: generic LoRA injection on DiT qkv/proj linears."""
        params = D.init_dit(jax.random.key(0), TINY)
        injected, wrapped = lora.inject(params, jax.random.key(1), r=2,
                                        targets=("qkv", "proj", "linear1", "linear2"))
        assert any("double_blocks" in p and p.endswith("qkv") for p in wrapped)
        assert any("single_blocks" in p and p.endswith("linear1") for p in wrapped)
        inp = make_inputs(TINY)
        base = D.dit_forward(params, TINY, **inp)
        out = D.dit_forward(injected, TINY, **inp)
        np.testing.assert_allclose(np.asarray(base), np.asarray(out),
                                   rtol=1e-6, atol=1e-6)  # B=0 -> identity
        merged = lora.merge(injected)
        out2 = D.dit_forward(merged, TINY, **inp)
        np.testing.assert_allclose(np.asarray(base), np.asarray(out2),
                                   rtol=1e-5, atol=1e-6)
