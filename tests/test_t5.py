"""T5 encoder parity vs HF T5EncoderModel (random weights, tiny + v1.1
semantics): completes the text-conditioned `prepare` path (VERDICT r1 #10;
reference conditioner.py:6-43)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from genhancer_tpu.models.towers import t5 as jt5
from genhancer_tpu.weights import hf_convert


def tiny_hf_t5(gated=True):
    from transformers import T5Config, T5EncoderModel
    cfg = T5Config(
        d_model=32, d_kv=8, d_ff=64, num_layers=3, num_heads=4,
        vocab_size=120, relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        feed_forward_proj="gated-gelu" if gated else "relu",
        dense_act_fn="gelu_new" if gated else "relu",
        is_gated_act=gated, dropout_rate=0.0)
    torch.manual_seed(0)
    return T5EncoderModel(cfg).eval(), cfg


class TestT5Parity:
    @pytest.mark.parametrize("gated", [True, False])
    def test_last_hidden_state_matches_hf(self, gated):
        model, cfg = tiny_hf_t5(gated)
        jcfg = jt5.T5Config.from_hf(cfg.to_dict())
        assert jcfg.gated == gated
        params = hf_convert.module_from_torch(
            {k: v.numpy() for k, v in model.state_dict().items()})

        ids = np.random.default_rng(0).integers(0, 120, (2, 11))
        with torch.no_grad():
            ref = model(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
        got = jt5.encoder_forward(params, jnp.asarray(ids), jcfg)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)

    def test_attention_mask_matches_hf(self):
        model, cfg = tiny_hf_t5()
        jcfg = jt5.T5Config.from_hf(cfg.to_dict())
        params = hf_convert.module_from_torch(
            {k: v.numpy() for k, v in model.state_dict().items()})
        ids = np.random.default_rng(1).integers(0, 120, (2, 9))
        mask = np.ones((2, 9), np.int64)
        mask[0, 6:] = 0
        mask[1, 4:] = 0
        with torch.no_grad():
            ref = model(input_ids=torch.tensor(ids),
                        attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
        got = jt5.encoder_forward(params, jnp.asarray(ids), jcfg,
                                  attention_mask=jnp.asarray(mask))
        # only compare unmasked positions (HF zeroes nothing, but masked
        # positions attend identically since the mask only gates keys)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)

    def test_bucket_function_matches_hf(self):
        from transformers.models.t5.modeling_t5 import T5Attention
        rel = (torch.arange(7)[None, :] - torch.arange(7)[:, None])
        ref = T5Attention._relative_position_bucket(
            rel, bidirectional=True, num_buckets=8, max_distance=16).numpy()
        got = jt5.relative_position_buckets(7, 7, 8, 16)
        np.testing.assert_array_equal(got, ref)

    def test_load_t5_roundtrip(self, tmp_path):
        model, cfg = tiny_hf_t5()
        d = tmp_path / "t5"
        model.save_pretrained(d, safe_serialization=False)
        params, jcfg = jt5.load_t5(str(d))
        ids = np.random.default_rng(2).integers(0, 120, (1, 5))
        with torch.no_grad():
            ref = model(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
        got = jt5.encoder_forward(params, jnp.asarray(ids), jcfg)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)

    def test_prepare_with_t5_provider(self):
        """prepare() consumes a T5 sequence embedding end to end."""
        from genhancer_tpu.tasks.text_conditioning import prepare
        model, cfg = tiny_hf_t5()
        jcfg = jt5.T5Config.from_hf(cfg.to_dict())
        params = hf_convert.module_from_torch(
            {k: v.numpy() for k, v in model.state_dict().items()})
        ids = jnp.asarray(np.random.default_rng(3).integers(0, 120, (2, 6)))
        txt = jt5.encoder_forward(params, ids, jcfg)
        latent = jnp.zeros((2, 8, 8, 16))
        out = prepare(txt, jnp.zeros((2, 16)), latent)
        assert out["txt"].shape == (2, 6, 32)
        assert out["txt_ids"].shape == (2, 6, 3)
        assert out["img"].shape == (2, 16, 64)
