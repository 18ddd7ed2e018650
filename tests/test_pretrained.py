"""from_pretrained: synthetic checkpoint dirs (config.json + safetensors).

VERDICT r1 item 4: one call loads a checkpoint directory -> (config,
params) with zero hand-supplied stats. The Wan2.2 VAE normalization
stats ship ONLY in the HF checkpoint config.json (reference
``architecture/autoencoder_kl_wan.py:977-1012`` has just the 2.1 stats
in-code), so the loader must read them — and must refuse placeholder
fallbacks.
"""

import json
import os

import jax
import numpy as np
import pytest
from safetensors.numpy import save_file

from frameino_tpu.models import pretrained as P
from frameino_tpu.models import wan_dit, wan_vae
from frameino_tpu.models import weights as W


def _write_ckpt(tmpdir, config, sd):
    os.makedirs(tmpdir, exist_ok=True)
    with open(os.path.join(tmpdir, "config.json"), "w") as f:
        json.dump(config, f)
    sd = {k: np.ascontiguousarray(np.asarray(v, np.float32))
          for k, v in sd.items()}
    save_file(sd, os.path.join(tmpdir, "model.safetensors"))


def test_wan_vae_from_pretrained(tmp_path):
    from tests.test_weights import _vae_params_to_state_dict
    mean = list(np.linspace(-1, 1, 4))
    std = list(np.linspace(0.5, 2.5, 4))
    cfg = wan_vae.WanVAEConfig(
        base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
        temperal_downsample=(True,), is_residual=False,
        scale_factor_temporal=2, scale_factor_spatial=2,
        latents_mean=tuple(mean), latents_std=tuple(std))
    params = wan_vae.init_wan_vae(jax.random.key(0), cfg)
    sd = _vae_params_to_state_dict(params, cfg)
    cj = {
        "_class_name": "AutoencoderKLWan",
        "base_dim": 8, "z_dim": 4, "dim_mult": [1, 2],
        "num_res_blocks": 1, "attn_scales": [],
        "temperal_downsample": [True], "is_residual": False,
        "scale_factor_temporal": 2, "scale_factor_spatial": 2,
        "latents_mean": mean, "latents_std": std,
    }
    d = str(tmp_path / "vae")
    _write_ckpt(d, cj, sd)

    got_cfg, got_params = P.from_pretrained(d)
    assert got_cfg == cfg          # incl. the normalization stats
    video = jax.random.normal(jax.random.key(1), (1, 3, 5, 16, 16))
    a = wan_vae.encode_moments(cfg, params, video)
    b = wan_vae.encode_moments(got_cfg, got_params, video)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_wan_vae_refuses_missing_stats(tmp_path):
    cj = {"_class_name": "AutoencoderKLWan", "base_dim": 8, "z_dim": 4}
    d = str(tmp_path / "vae_bad")
    os.makedirs(d)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cj, f)
    with pytest.raises(ValueError, match="latents_mean"):
        P.from_pretrained(d)


def test_wan_dit_from_pretrained(tmp_path):
    cfg = wan_dit.tiny_config()
    params = wan_dit.init_wan_dit(jax.random.key(0), cfg)
    sd = W.wan_dit_to_state_dict(params, cfg)
    cj = {
        "_class_name": "WanTransformer3DModel",
        "patch_size": [1, 2, 2], "num_attention_heads": 2,
        "attention_head_dim": 24, "in_channels": 8, "out_channels": 8,
        "text_dim": 16, "freq_dim": 32, "ffn_dim": 64, "num_layers": 2,
        "cross_attn_norm": True, "eps": 1e-6,
        "image_dim": None, "added_kv_proj_dim": None,
        "rope_max_seq_len": 1024,
    }
    d = str(tmp_path / "transformer")
    _write_ckpt(d, cj, sd)
    got_cfg, got_params = P.from_pretrained(d)
    assert got_cfg == cfg
    x = jax.random.normal(jax.random.key(2), (1, cfg.in_channels, 2, 4, 4))
    t = np.asarray([500.0], np.float32)
    text = jax.random.normal(jax.random.key(3), (1, 4, cfg.text_dim))
    a = wan_dit.wan_dit_forward(cfg, params, x, t, text)
    b = wan_dit.wan_dit_forward(got_cfg, got_params, x, t, text)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_cog_dit_from_pretrained(tmp_path):
    from frameino_tpu.models import cogvideox_dit
    cfg = cogvideox_dit.tiny_config(use_frame_in=True)
    params = cogvideox_dit.init_cogvideox_dit(jax.random.key(0), cfg)
    sd = W.cogvideox_dit_to_state_dict(params, cfg)
    cj = {
        "_class_name": "CogVideoXTransformer3DModel",
        "num_attention_heads": 2, "attention_head_dim": 16,
        "in_channels": 12, "out_channels": 4, "time_embed_dim": 16,
        "text_embed_dim": 16, "num_layers": 2, "sample_width": 8,
        "sample_height": 8, "sample_frames": 9, "max_text_seq_length": 8,
        "use_FrameIn": True,           # reference custom key spelling
    }
    d = str(tmp_path / "cog")
    _write_ckpt(d, cj, sd)
    got_cfg, _ = P.from_pretrained(d)
    assert got_cfg.use_frame_in is True
    assert got_cfg == cfg


def test_pipeline_dir(tmp_path):
    """Multi-submodel pipeline directory loads every model subdir."""
    from tests.test_weights import _vae_params_to_state_dict
    cfg = wan_vae.WanVAEConfig(
        base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
        temperal_downsample=(True,), is_residual=False,
        scale_factor_temporal=2, scale_factor_spatial=2,
        latents_mean=(0.0,) * 4, latents_std=(1.0,) * 4)
    params = wan_vae.init_wan_vae(jax.random.key(0), cfg)
    _write_ckpt(str(tmp_path / "vae"),
                {"_class_name": "AutoencoderKLWan", "base_dim": 8,
                 "z_dim": 4, "dim_mult": [1, 2], "num_res_blocks": 1,
                 "temperal_downsample": [True],
                 "scale_factor_temporal": 2, "scale_factor_spatial": 2,
                 "latents_mean": [0.0] * 4, "latents_std": [1.0] * 4},
                _vae_params_to_state_dict(params, cfg))
    # non-model dir is skipped
    os.makedirs(tmp_path / "scheduler")
    with open(tmp_path / "scheduler" / "config.json", "w") as f:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler"}, f)
    out = P.load_pipeline_dir(str(tmp_path))
    assert set(out) == {"vae"}
