"""Checkpoint layout tests: DiT/VAE pytrees <-> reference torch key naming."""
import pytest
import numpy as np
import jax

from genhancer_tpu.models import dit as D
from genhancer_tpu.models import vae as V
from genhancer_tpu.weights import hf_convert


TINY_DIT = D.DiTConfig(in_channels=8, vec_in_dim=12, context_in_dim=16,
                       hidden_size=32, num_heads=4, depth=1, depth_single_blocks=1,
                       axes_dim=(2, 4, 2), guidance_embed=True)


class TestDiTKeys:
    @pytest.mark.slow
    def test_torch_keys_match_reference_naming(self):
        """Key names must match the reference Flux state_dict
        (src/flux/model.py:50-77, modules/layers.py) so
        checkpoint-dit-{step}.bin round-trips."""
        params = D.init_dit(jax.random.key(0), TINY_DIT)
        sd = hf_convert.dit_to_torch(params)
        expected_subset = {
            "img_in.weight", "img_in.bias",
            "time_in.in_layer.weight", "time_in.out_layer.bias",
            "vector_in.in_layer.weight", "guidance_in.out_layer.weight",
            "txt_in.weight",
            "double_blocks.0.img_mod.lin.weight",
            "double_blocks.0.img_attn.qkv.weight",
            "double_blocks.0.img_attn.qkv.bias",
            "double_blocks.0.img_attn.norm.query_norm.scale",
            "double_blocks.0.img_attn.norm.key_norm.scale",
            "double_blocks.0.img_attn.proj.weight",
            "double_blocks.0.img_mlp.0.weight",
            "double_blocks.0.img_mlp.2.bias",
            "double_blocks.0.txt_mod.lin.bias",
            "double_blocks.0.txt_attn.qkv.weight",
            "double_blocks.0.txt_mlp.0.bias",
            "single_blocks.0.linear1.weight",
            "single_blocks.0.linear2.bias",
            "single_blocks.0.norm.query_norm.scale",
            "single_blocks.0.modulation.lin.weight",
            "final_layer.linear.weight",
            "final_layer.adaLN_modulation.1.weight",
        }
        missing = expected_subset - set(sd)
        assert not missing, f"missing reference keys: {missing}"

    def test_roundtrip_preserves_values(self):
        params = D.init_dit(jax.random.key(1), TINY_DIT)
        sd = hf_convert.dit_to_torch(params)
        back = hf_convert.dit_from_torch(sd, as_jax=False)
        flat_a = hf_convert.flatten_pytree(params)
        flat_b = hf_convert.flatten_pytree(back)
        assert set(flat_a) == set(flat_b)
        for k in flat_a:
            np.testing.assert_array_equal(np.asarray(flat_a[k]), flat_b[k])

    @pytest.mark.slow
    def test_forward_after_roundtrip(self):
        import jax.numpy as jnp
        params = D.init_dit(jax.random.key(2), TINY_DIT)
        back = hf_convert.dit_from_torch(hf_convert.dit_to_torch(params))
        B, L = 1, 4
        inp = dict(img=jnp.ones((B, L, 8)), img_ids=jnp.zeros((B, L, 3)),
                   txt=jnp.ones((B, 2, 16)), txt_ids=jnp.zeros((B, 2, 3)),
                   timesteps=jnp.array([0.5]), y=jnp.ones((B, 12)),
                   guidance=jnp.array([4.0]))
        a = D.dit_forward(params, TINY_DIT, **inp)
        b = D.dit_forward(back, TINY_DIT, **inp)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestVAEKeys:
    def test_vae_torch_keys(self):
        cfg = V.VAEConfig(resolution=32, ch=8, ch_mult=(1, 2), num_res_blocks=1,
                          z_channels=4)
        params = V.init_vae(jax.random.key(0), cfg)
        sd = hf_convert.vae_to_torch(params)
        expected_subset = {
            "encoder.conv_in.weight",
            "encoder.down.0.block.0.norm1.weight",
            "encoder.down.0.block.0.conv1.weight",
            "encoder.down.0.downsample.conv.weight",
            "encoder.mid.block_1.conv1.weight",
            "encoder.mid.attn_1.q.weight",
            "encoder.mid.attn_1.proj_out.bias",
            "encoder.norm_out.weight", "encoder.conv_out.weight",
            "decoder.conv_in.weight",
            "decoder.up.1.upsample.conv.weight",
            "decoder.up.0.block.1.conv2.bias",
            "decoder.norm_out.bias", "decoder.conv_out.weight",
        }
        missing = expected_subset - set(sd)
        assert not missing, f"missing: {missing}"
        # conv weights must be OIHW in torch form
        assert sd["encoder.conv_in.weight"].shape == (8, 3, 3, 3)

    def test_vae_roundtrip_forward(self):
        import jax.numpy as jnp
        cfg = V.VAEConfig(resolution=32, ch=8, ch_mult=(1, 2), num_res_blocks=1,
                          z_channels=4)
        params = V.init_vae(jax.random.key(0), cfg)
        back = hf_convert.vae_from_torch(hf_convert.vae_to_torch(params))
        x = jnp.ones((1, 32, 32, 3)) * 0.1
        a = V.vae_encode(params, cfg, x, sample=False)
        b = V.vae_encode(back, cfg, x, sample=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
