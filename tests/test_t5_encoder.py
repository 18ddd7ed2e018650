"""T5/UMT5 encoder parity vs transformers (torch CPU, random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from frameino_tpu.models import t5_encoder as M


def _port_weights(hf_model, cfg: M.T5EncoderConfig):
    """transformers T5/UMT5 encoder state_dict -> our param pytree."""
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    enc = "encoder."

    def lin(name):
        return {"kernel": sd[name + ".weight"].T}

    layers = []
    for i in range(cfg.num_layers):
        b = f"{enc}block.{i}.layer."
        p = {
            "attn": {
                "q": lin(b + "0.SelfAttention.q"),
                "k": lin(b + "0.SelfAttention.k"),
                "v": lin(b + "0.SelfAttention.v"),
                "o": lin(b + "0.SelfAttention.o"),
            },
            "attn_norm": {"weight": sd[b + "0.layer_norm.weight"]},
            "ffn_norm": {"weight": sd[b + "1.layer_norm.weight"]},
            "ffn": {
                "wi_1": lin(b + "1.DenseReluDense.wi_1"),
                "wo": lin(b + "1.DenseReluDense.wo"),
            },
        }
        p["ffn"]["wi_0"] = lin(b + "1.DenseReluDense.wi_0")
        rb = b + "0.SelfAttention.relative_attention_bias.weight"
        if rb in sd:
            p["rel_bias"] = sd[rb]
        layers.append(p)

    params = {
        "embed_tokens": sd["shared.weight"],
        "final_norm": {"weight": sd[enc + "final_layer_norm.weight"]},
    }
    if not cfg.per_layer_relative_bias:
        # classic T5: only block 0 holds the shared bias table
        params["rel_bias"] = layers[0].pop("rel_bias")
        for p in layers:
            p.pop("rel_bias", None)
    params["layers"] = jax.tree.map(lambda *x: jnp.stack(
        [jnp.asarray(v) for v in x]), *layers)
    return jax.tree.map(jnp.asarray, params)


@pytest.mark.parametrize("kind", ["t5", "umt5"])
def test_parity_vs_transformers(kind):
    if kind == "t5":
        from transformers import T5Config, T5EncoderModel
        hf_cfg = T5Config(
            vocab_size=64, d_model=16, d_kv=4, num_heads=2, d_ff=32,
            num_layers=2, num_decoder_layers=2, dropout_rate=0.0,
            feed_forward_proj="gated-gelu", is_encoder_decoder=False)
        hf = T5EncoderModel(hf_cfg).eval()
        cfg = M.tiny_config(per_layer_relative_bias=False)
    else:
        from transformers import UMT5Config, UMT5EncoderModel
        hf_cfg = UMT5Config(
            vocab_size=64, d_model=16, d_kv=4, num_heads=2, d_ff=32,
            num_layers=2, num_decoder_layers=2, dropout_rate=0.0,
            feed_forward_proj="gated-gelu", is_encoder_decoder=False)
        hf = UMT5EncoderModel(hf_cfg).eval()
        cfg = M.tiny_config(per_layer_relative_bias=True)

    params = _port_weights(hf, cfg)

    rs = np.random.RandomState(0)
    ids = rs.randint(0, 64, (2, 10)).astype(np.int64)
    mask = np.ones((2, 10), np.int64)
    mask[1, 7:] = 0

    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask)
                 ).last_hidden_state.numpy()

    got = M.t5_encode(cfg, params, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_encode_and_mask_zero_fills():
    cfg = M.tiny_config(per_layer_relative_bias=True)
    params = M.init_t5_encoder(jax.random.key(0), cfg)
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 64, (1, 6)))
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0]])
    out = M.encode_and_mask(cfg, params, ids, mask, max_sequence_length=12)
    assert out.shape == (1, 12, cfg.d_model)
    np.testing.assert_allclose(np.asarray(out[0, 3:]), 0.0)
    assert np.abs(np.asarray(out[0, :3])).sum() > 0


def test_bucket_function_vs_transformers():
    from transformers.models.t5.modeling_t5 import T5Attention
    rel = np.arange(-20, 21).reshape(1, -1) - np.zeros((1, 1), np.int64)
    got = M.relative_position_bucket(rel, 32, 128)
    ref = T5Attention._relative_position_bucket(
        torch.from_numpy(rel), bidirectional=True, num_buckets=32,
        max_distance=128).numpy()
    np.testing.assert_array_equal(got, ref)
