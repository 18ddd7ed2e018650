"""CLIP vision tower parity vs transformers (torch CPU, random weights).

The Wan2.1 I2V pipeline feeds ``hidden_states[-2]`` of a CLIPVisionModel
into the DiT's image-KV branch (reference
``pipelines/pipeline_wan_i2v_motion.py:22,65-66``).
"""

import numpy as np
import pytest
import torch

from frameino_tpu.models import clip_vision as M


def _make_hf(act: str):
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModel
    hf_cfg = HFCfg(hidden_size=16, intermediate_size=32,
                   num_hidden_layers=3, num_attention_heads=2,
                   image_size=28, patch_size=14, hidden_act=act,
                   attention_dropout=0.0)
    torch.manual_seed(0)
    return CLIPVisionModel(hf_cfg).eval()


@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
def test_parity_vs_transformers(act):
    hf = _make_hf(act)
    cfg = M.tiny_config(num_hidden_layers=3, hidden_act=act)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = M.clip_vision_from_state_dict(sd, cfg)

    rng = np.random.default_rng(1)
    px = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)

    with torch.no_grad():
        hf_out = hf(pixel_values=torch.from_numpy(px),
                    output_hidden_states=True)
    ref_pen = hf_out.hidden_states[-2].numpy()
    ref_last = hf_out.last_hidden_state.numpy()

    pen = np.asarray(M.clip_vision_forward(cfg, params, px))
    np.testing.assert_allclose(pen, ref_pen, rtol=2e-5, atol=2e-5)

    last = M.clip_vision_forward(cfg, params, px, penultimate=False)
    np.testing.assert_allclose(np.asarray(last), ref_last,
                               rtol=2e-5, atol=2e-5)

    pooled = np.asarray(M.clip_pooled_output(cfg, params, last))
    np.testing.assert_allclose(pooled, hf_out.pooler_output.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_preprocess_shapes():
    img = (np.random.default_rng(0).random((100, 160, 3)) * 255
           ).astype(np.uint8)
    cfg = M.CLIP_VIT_H_14
    out = M.preprocess_image(img, cfg)
    assert out.shape == (1, 3, 224, 224)
    assert out.dtype == np.float32
    # normalization applied: values are roughly centered
    assert abs(float(out.mean())) < 3.0


def test_init_forward_shapes():
    import jax
    cfg = M.tiny_config()
    params = M.init_clip_vision(jax.random.key(0), cfg)
    px = np.zeros((1, 3, cfg.image_size, cfg.image_size), np.float32)
    out = M.clip_vision_forward(cfg, params, px)
    n_tokens = (cfg.image_size // cfg.patch_size) ** 2 + 1
    assert out.shape == (1, n_tokens, cfg.hidden_size)
