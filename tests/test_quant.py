"""int8 post-training quantization: accuracy of the quantized forward."""

import jax
import jax.numpy as jnp
import numpy as np

from frameino_tpu.models import wan_dit
from frameino_tpu.models.quant import quantize_dit_int8
from frameino_tpu.ops.linear import dense, dense_int8, init_dense


def test_dense_int8_matches_fp():
    p = init_dense(jax.random.key(0), 64, 32)
    from frameino_tpu.models.quant import _quantize_kernel
    q, s = _quantize_kernel(p["kernel"])
    pq = {"kernel_q": q, "scale": s, "bias": p["bias"]}
    x = jax.random.normal(jax.random.key(1), (8, 64), jnp.float32)
    ref = np.asarray(dense(x, p))
    got = np.asarray(dense_int8(x, pq))
    rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert rel < 0.02, rel


def test_quantized_wan_forward_close():
    cfg = wan_dit.tiny_config()
    params = wan_dit.init_wan_dit(jax.random.key(0), cfg)
    qparams = quantize_dit_int8(params)

    B, F, H, W = 1, 3, 4, 4
    x = jax.random.normal(jax.random.key(1), (B, cfg.in_channels, F, H, W))
    t = jnp.asarray([500.0])
    text = jax.random.normal(jax.random.key(2), (B, 4, cfg.text_dim))

    ref = np.asarray(wan_dit.wan_dit_forward(cfg, params, x, t, text))
    got = np.asarray(wan_dit.wan_dit_forward(cfg, qparams, x, t, text))
    rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert rel < 0.05, rel
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.995, corr


def test_quant_preserves_sensitive_params():
    cfg = wan_dit.tiny_config()
    params = wan_dit.init_wan_dit(jax.random.key(0), cfg)
    qparams = quantize_dit_int8(params)
    # patch embedding / proj_out / AdaLN tables stay full-precision
    assert "kernel" in qparams["patch_embedding"]
    assert "kernel" in qparams["proj_out"]
    assert "kernel_q" in qparams["blocks"]["ffn"]["fc1"]
    assert "kernel" not in qparams["blocks"]["ffn"]["fc1"]
    # stacked layer axis preserved on quantized kernels
    assert qparams["blocks"]["ffn"]["fc1"]["kernel_q"].shape[0] == cfg.num_layers
