"""Weight-mapping tests: round trips and real transformers checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from frameino_tpu.core.tree import unmeta
from frameino_tpu.models import t5_encoder, wan_dit, wan_vae
from frameino_tpu.models import weights as W


class TestWanDiTRoundTrip:
    def test_roundtrip(self):
        cfg = wan_dit.tiny_config()
        params = wan_dit.init_wan_dit(jax.random.key(0), cfg)
        sd = W.wan_dit_to_state_dict(params, cfg)
        back = W.wan_dit_from_state_dict(sd, cfg)

        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = jax.tree_util.tree_leaves_with_path(back)
        assert len(flat_a) == len(flat_b)
        for (pa, a), (pb, b) in zip(flat_a, flat_b):
            assert pa == pb
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       err_msg=str(pa))

    def test_forward_identical_after_roundtrip(self):
        cfg = wan_dit.tiny_config()
        params = wan_dit.init_wan_dit(jax.random.key(0), cfg)
        back = W.wan_dit_from_state_dict(
            W.wan_dit_to_state_dict(params, cfg), cfg)
        x = jax.random.normal(jax.random.key(1), (1, cfg.in_channels, 4, 8, 8))
        t = jnp.array([500.0])
        text = jax.random.normal(jax.random.key(2), (1, 7, cfg.text_dim))
        a = wan_dit.wan_dit_forward(cfg, params, x, t, text, attn_impl="xla")
        b = wan_dit.wan_dit_forward(cfg, back, x, t, text, attn_impl="xla")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestT5FromTransformers:
    def test_umt5_load_matches_model(self):
        from transformers import UMT5Config, UMT5EncoderModel
        hf = UMT5EncoderModel(UMT5Config(
            vocab_size=64, d_model=16, d_kv=4, num_heads=2, d_ff=32,
            num_layers=2, num_decoder_layers=2, dropout_rate=0.0,
            feed_forward_proj="gated-gelu", is_encoder_decoder=False)).eval()
        cfg = t5_encoder.tiny_config(per_layer_relative_bias=True)
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        params = W.t5_from_state_dict(sd, cfg)

        ids = np.random.RandomState(0).randint(0, 64, (1, 9))
        with torch.no_grad():
            ref = hf(input_ids=torch.from_numpy(ids)).last_hidden_state
        got = t5_encoder.t5_encode(cfg, params, jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-4,
                                   rtol=2e-3)


def _vae_params_to_state_dict(params, cfg):
    """Inverse VAE mapping (test-side): my pytree -> diffusers names."""
    sd = {}

    def put_cconv(name, p):
        sd[f"{name}.weight"] = np.asarray(p["kernel"]).transpose(4, 3, 0, 1, 2)
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    def put_conv2d(name, p):
        sd[f"{name}.weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    def put_rms(name, p):
        sd[f"{name}.gamma"] = np.asarray(p["gamma"]).reshape(-1, 1, 1, 1)

    def put_res(name, p):
        put_rms(f"{name}.norm1", p["norm1"])
        put_cconv(f"{name}.conv1", p["conv1"])
        put_rms(f"{name}.norm2", p["norm2"])
        put_cconv(f"{name}.conv2", p["conv2"])
        if "conv_shortcut" in p:
            put_cconv(f"{name}.conv_shortcut", p["conv_shortcut"])

    def put_attn(name, p):
        sd[f"{name}.norm.gamma"] = np.asarray(p["norm"]["gamma"]).reshape(-1, 1, 1)
        sd[f"{name}.to_qkv.weight"] = np.asarray(
            p["to_qkv"]["kernel"]).T[:, :, None, None]
        sd[f"{name}.to_qkv.bias"] = np.asarray(p["to_qkv"]["bias"])
        sd[f"{name}.proj.weight"] = np.asarray(
            p["proj"]["kernel"]).T[:, :, None, None]
        sd[f"{name}.proj.bias"] = np.asarray(p["proj"]["bias"])

    def put_resample(name, p):
        put_conv2d(f"{name}.resample.1", p["conv"])
        if "time_conv" in p:
            put_cconv(f"{name}.time_conv", p["time_conv"])

    enc = params["encoder"]
    put_cconv("encoder.conv_in", enc["conv_in"])
    if cfg.is_residual:
        for i, blk in enumerate(enc["down_blocks"]):
            base = f"encoder.down_blocks.{i}"
            for j, r in enumerate(blk["resnets"]):
                put_res(f"{base}.resnets.{j}", r)
            if blk.get("downsampler") is not None:
                put_resample(f"{base}.downsampler", blk["downsampler"])
    else:
        for i, blk in enumerate(enc["down_blocks"]):
            kind = unmeta(blk["kind"])
            name = f"encoder.down_blocks.{i}"
            if kind == "res":
                put_res(name, blk)
            elif kind == "attn":
                put_attn(name, blk)
            else:
                put_resample(name, blk)
    put_res("encoder.mid_block.resnets.0", enc["mid"]["res1"])
    put_attn("encoder.mid_block.attentions.0", enc["mid"]["attn"])
    put_res("encoder.mid_block.resnets.1", enc["mid"]["res2"])
    put_rms("encoder.norm_out", enc["norm_out"])
    put_cconv("encoder.conv_out", enc["conv_out"])

    dec = params["decoder"]
    put_cconv("decoder.conv_in", dec["conv_in"])
    put_res("decoder.mid_block.resnets.0", dec["mid"]["res1"])
    put_attn("decoder.mid_block.attentions.0", dec["mid"]["attn"])
    put_res("decoder.mid_block.resnets.1", dec["mid"]["res2"])
    for i, blk in enumerate(dec["up_blocks"]):
        base = f"decoder.up_blocks.{i}"
        for j, r in enumerate(blk["resnets"]):
            put_res(f"{base}.resnets.{j}", r)
        if blk.get("upsampler") is not None:
            name = f"{base}.upsampler" if cfg.is_residual \
                else f"{base}.upsamplers.0"
            put_resample(name, blk["upsampler"])
    put_rms("decoder.norm_out", dec["norm_out"])
    put_cconv("decoder.conv_out", dec["conv_out"])
    put_cconv("quant_conv", params["quant_conv"])
    put_cconv("post_quant_conv", params["post_quant_conv"])
    return sd


class TestWanVAERoundTrip:
    def _roundtrip(self, cfg, key):
        params = wan_vae.init_wan_vae(key, cfg)
        sd = _vae_params_to_state_dict(params, cfg)
        back = W.wan_vae_from_state_dict(sd, cfg)
        video = jax.random.normal(jax.random.key(9),
                                  (1, cfg.in_channels
                                   if cfg.patch_size is None else 3,
                                   5, 16, 16))
        a = wan_vae.encode_moments(cfg, params, video)
        b = wan_vae.encode_moments(cfg, back, video)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        z = jax.random.normal(jax.random.key(10), a[:, :cfg.z_dim].shape)
        da = wan_vae.decode(cfg, params, z)
        db = wan_vae.decode(cfg, back, z)
        np.testing.assert_allclose(np.asarray(da), np.asarray(db), atol=1e-6)

    def test_21_style(self):
        cfg = wan_vae.WanVAEConfig(
            base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
            temperal_downsample=(True,), is_residual=False,
            scale_factor_temporal=2, scale_factor_spatial=2,
            latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4))
        self._roundtrip(cfg, jax.random.key(0))

    def test_22_style(self):
        cfg = wan_vae.WanVAEConfig(
            base_dim=8, decoder_base_dim=12, z_dim=4, dim_mult=(1, 2, 2),
            num_res_blocks=1, temperal_downsample=(True, True),
            is_residual=True, in_channels=12, out_channels=12, patch_size=2,
            latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4))
        self._roundtrip(cfg, jax.random.key(1))


class TestCogDiTRoundTrip:
    def test_roundtrip_forward_identical(self):
        from frameino_tpu.models import cogvideox_dit
        cfg = cogvideox_dit.tiny_config()
        params = cogvideox_dit.init_cogvideox_dit(jax.random.key(0), cfg)
        sd = W.cogvideox_dit_to_state_dict(params, cfg)
        back = W.cogvideox_dit_from_state_dict(sd, cfg)
        video = jax.random.normal(jax.random.key(1),
                                  (1, 3, cfg.in_channels, 8, 8))
        text = jax.random.normal(jax.random.key(2),
                                 (1, cfg.max_text_seq_length,
                                  cfg.text_embed_dim))
        rope = cogvideox_dit.cogvideox_rope(cfg, 3, 8, 8)
        a = cogvideox_dit.cogvideox_forward(cfg, params, video, text,
                                            jnp.array([500.0]),
                                            image_rotary_emb=rope,
                                            attn_impl="xla")
        b = cogvideox_dit.cogvideox_forward(cfg, back, video, text,
                                            jnp.array([500.0]),
                                            image_rotary_emb=rope,
                                            attn_impl="xla")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def _cog_vae_params_to_state_dict(params, cfg):
    """Inverse CogVideoX-VAE mapping (test-side)."""
    sd = {}

    def put_cconv(name, p):
        sd[f"{name}.conv.weight"] = np.asarray(p["kernel"]).transpose(
            4, 3, 0, 1, 2)
        sd[f"{name}.conv.bias"] = np.asarray(p["bias"])

    def put_gn(name, p):
        sd[f"{name}.weight"] = np.asarray(p["weight"])
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    def put_sn(name, p):
        put_gn(f"{name}.norm_layer", p["norm"])
        put_cconv(f"{name}.conv_y", p["conv_y"])
        put_cconv(f"{name}.conv_b", p["conv_b"])

    def put_res(name, p, spatial):
        put_cconv(f"{name}.conv1", p["conv1"])
        put_cconv(f"{name}.conv2", p["conv2"])
        if spatial:
            put_sn(f"{name}.norm1", p["norm1"])
            put_sn(f"{name}.norm2", p["norm2"])
        else:
            put_gn(f"{name}.norm1", p["norm1"])
            put_gn(f"{name}.norm2", p["norm2"])
        if "conv_shortcut" in p:
            put_cconv(f"{name}.conv_shortcut", p["conv_shortcut"])

    def put_conv2d(name, p):
        sd[f"{name}.weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    enc = params["encoder"]
    put_cconv("encoder.conv_in", enc["conv_in"])
    for i, blk in enumerate(enc["down_blocks"]):
        for j, r in enumerate(blk["resnets"]):
            put_res(f"encoder.down_blocks.{i}.resnets.{j}", r, False)
        if blk.get("downsampler") is not None:
            put_conv2d(f"encoder.down_blocks.{i}.downsamplers.0.conv",
                       blk["downsampler"])
    for j, r in enumerate(enc["mid"]["resnets"]):
        put_res(f"encoder.mid_block.resnets.{j}", r, False)
    put_gn("encoder.norm_out", enc["norm_out"])
    put_cconv("encoder.conv_out", enc["conv_out"])

    dec = params["decoder"]
    put_cconv("decoder.conv_in", dec["conv_in"])
    for j, r in enumerate(dec["mid"]["resnets"]):
        put_res(f"decoder.mid_block.resnets.{j}", r, True)
    for i, blk in enumerate(dec["up_blocks"]):
        for j, r in enumerate(blk["resnets"]):
            put_res(f"decoder.up_blocks.{i}.resnets.{j}", r, True)
        if blk.get("upsampler") is not None:
            put_conv2d(f"decoder.up_blocks.{i}.upsamplers.0.conv",
                       blk["upsampler"])
    put_sn("decoder.norm_out", dec["norm_out"])
    put_cconv("decoder.conv_out", dec["conv_out"])
    return sd


class TestCogVAERoundTrip:
    def test_roundtrip_encode_decode(self):
        from frameino_tpu.models import cogvideox_vae
        cfg = cogvideox_vae.tiny_vae_config()
        params = cogvideox_vae.init_cogvideox_vae(jax.random.key(0), cfg)
        sd = _cog_vae_params_to_state_dict(params, cfg)
        back = W.cogvideox_vae_from_state_dict(sd, cfg)
        video = jax.random.normal(jax.random.key(1), (1, 3, 9, 16, 16))
        a = cogvideox_vae.encode_moments(cfg, params, video)
        b = cogvideox_vae.encode_moments(cfg, back, video)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        z = jax.random.normal(jax.random.key(2),
                              (1, cfg.latent_channels, 3, 4, 4))
        da = cogvideox_vae.decode(cfg, params, z)
        db = cogvideox_vae.decode(cfg, back, z)
        np.testing.assert_allclose(np.asarray(da), np.asarray(db), atol=1e-6)


def test_exported_state_dicts_survive_safetensors(tmp_path):
    """safetensors.numpy writes raw buffers WITHOUT honoring strides —
    a transposed-view leaf silently serializes the untransposed data.
    Exports must be C-contiguous and round-trip bit-exactly through an
    actual .safetensors file (regression: r3 contiguity fix)."""
    import os

    from safetensors.numpy import save_file

    from frameino_tpu.models import cogvideox_dit, wan_dit

    for name, mod, to_sd, from_sd, init in (
            ("wan", wan_dit, W.wan_dit_to_state_dict,
             W.wan_dit_from_state_dict, wan_dit.init_wan_dit),
            ("cog", cogvideox_dit, W.cogvideox_dit_to_state_dict,
             W.cogvideox_dit_from_state_dict,
             cogvideox_dit.init_cogvideox_dit)):
        cfg = mod.tiny_config()
        params = init(jax.random.key(0), cfg)
        sd = {k: np.asarray(v, np.float32)
              for k, v in to_sd(params, cfg).items()}
        for k, v in sd.items():
            assert v.flags["C_CONTIGUOUS"], f"{name}:{k} not contiguous"
        d = tmp_path / name
        os.makedirs(d, exist_ok=True)
        save_file(sd, str(d / "model.safetensors"))
        back = from_sd(W.load_safetensors_dir(str(d)), cfg)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=0)
