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


def test_quantized_cog_forward_close():
    from frameino_tpu.models import cogvideox_dit
    cfg = cogvideox_dit.tiny_config()
    params = cogvideox_dit.init_cogvideox_dit(jax.random.key(0), cfg)
    qparams = quantize_dit_int8(params)
    B, F, H, W = 1, 3, 8, 8
    x = jax.random.normal(jax.random.key(1), (B, F, cfg.in_channels, H, W))
    text = jax.random.normal(jax.random.key(2), (B, 8, cfg.text_embed_dim))
    t = jnp.asarray([500.0])
    cos, sin = cogvideox_dit.cogvideox_rope(cfg, F, H, W)
    ref = np.asarray(cogvideox_dit.cogvideox_forward(
        cfg, params, x, text, t, image_rotary_emb=(cos, sin)))
    got = np.asarray(cogvideox_dit.cogvideox_forward(
        cfg, qparams, x, text, t, image_rotary_emb=(cos, sin)))
    rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert rel < 0.05, rel


def test_pipeline_quantize_option():
    """WanImageToVideoPipeline(quantize='int8') quantizes both experts'
    block matmuls at construction."""
    from frameino_tpu.models import wan_vae
    from frameino_tpu.pipelines.wan_i2v import (WanImageToVideoPipeline,
                                                WanPipelineConfig)
    cfg = wan_dit.tiny_config(in_channels=8, out_channels=4)
    vae_cfg = wan_vae.WanVAEConfig(
        base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
        temperal_downsample=(True,), is_residual=False,
        scale_factor_temporal=2, scale_factor_spatial=2,
        latents_mean=(0.0,) * 4, latents_std=(1.0,) * 4)
    dit_params = wan_dit.init_wan_dit(jax.random.key(0), cfg)
    vae_params = wan_vae.init_wan_vae(jax.random.key(1), vae_cfg)
    pipe = WanImageToVideoPipeline(cfg, dit_params, vae_cfg, vae_params,
                                   WanPipelineConfig(), quantize="int8")
    assert "kernel_q" in pipe.dit_params["blocks"]["ffn"]["fc1"]


def test_host_and_device_quantization_agree():
    """numpy (pre-upload) and jitted (device) paths produce identical
    int8 kernels and scales — loaders may quantize host-side before any
    upload (the CogVideoX-5B one-chip path)."""
    from frameino_tpu.models.quant import (_quantize_kernel_chunked,
                                           _quantize_kernel_host)
    w = np.asarray(jax.random.normal(jax.random.key(0), (3, 16, 8),
                                     jnp.float32))
    qh, sh = _quantize_kernel_host(w)
    qd, sd = jax.jit(_quantize_kernel_chunked)(jnp.asarray(w))
    np.testing.assert_array_equal(qh, np.asarray(qd))
    # scales agree to 1 ulp (XLA's f32 divide vs numpy's)
    np.testing.assert_allclose(sh, np.asarray(sd), rtol=1e-6)


def test_quantize_host_tree_stays_on_host():
    """A numpy param tree quantizes without any device placement."""
    cfg = wan_dit.tiny_config()
    params = jax.tree.map(np.asarray,
                          wan_dit.init_wan_dit(jax.random.key(0), cfg))
    q = quantize_dit_int8(params)
    leaves = jax.tree.leaves(q)
    assert all(isinstance(l, np.ndarray) for l in leaves)
    flat_paths = jax.tree_util.tree_flatten_with_path(q)[0]
    assert any("kernel_q" in "".join(str(k) for k in p)
               for p, _ in flat_paths)


def test_quantize_donate_invalidates_input():
    cfg = wan_dit.tiny_config()
    params = wan_dit.init_wan_dit(jax.random.key(0), cfg)
    ref = quantize_dit_int8(jax.tree.map(jnp.copy, params))
    got = quantize_dit_int8(params, donate=True)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_int8_step_hlo_audit():
    """Device-op audit: the compiled int8 forward runs EVERY quantized
    kernel as an s8 x s8 -> s32 matmul — one per stacked kernel_q leaf
    (the scanned block body appears once in the HLO) — and nothing else
    but allowed float matmuls. A silent XLA dequantize-and-float-dot
    rewrite would pass the numeric tests while forfeiting the 2x MXU
    rate; this pins the executable itself (core/hlo_audit)."""
    from frameino_tpu.core import hlo_audit
    from frameino_tpu.core.tree import flatten

    cfg = wan_dit.tiny_config()
    params = wan_dit.init_wan_dit(jax.random.key(0), cfg)
    qp = quantize_dit_int8(params)
    n_q = sum(1 for k in flatten(qp) if k.endswith(".kernel_q"))
    assert n_q == 10  # (to_q,to_k,to_v,to_out) x (attn1,attn2) + fc1,fc2

    B, F, H, W = 1, 3, 4, 4
    x = jax.random.normal(jax.random.key(1), (B, cfg.in_channels, F, H, W))
    t = jnp.asarray([500.0])
    text = jax.random.normal(jax.random.key(2), (B, 4, cfg.text_dim))
    f = jax.jit(lambda p, a, b, c: wan_dit.wan_dit_forward(cfg, p, a, b, c))
    hlo = f.lower(qp, x, t, text).compile().as_text()
    counts = hlo_audit.assert_int8_step(hlo, n_q)
    assert counts["s8xs8->s32"] == 10
    # bf16 path: same invariant holds when activations are bf16
    hlo_bf16 = f.lower(qp, x.astype(jnp.bfloat16), t,
                       text.astype(jnp.bfloat16)).compile().as_text()
    hlo_audit.assert_int8_step(hlo_bf16, n_q)


# ---------------------------------------------------------------------------
# VAE int8 (w8a8 conv serving path)
# ---------------------------------------------------------------------------

_VAE_TINY22 = None


def _vae_tiny22():
    global _VAE_TINY22
    if _VAE_TINY22 is None:
        from frameino_tpu.models import wan_vae
        cfg = wan_vae.WanVAEConfig(
            base_dim=8, decoder_base_dim=12, z_dim=4, dim_mult=(1, 2, 2),
            num_res_blocks=1, temperal_downsample=(True, True),
            is_residual=True, in_channels=12, out_channels=12,
            patch_size=2, latents_mean=tuple([0.0] * 4),
            latents_std=tuple([1.0] * 4))
        params = wan_vae.init_wan_vae(jax.random.key(1), cfg)
        _VAE_TINY22 = (cfg, params)
    return _VAE_TINY22


def test_quantized_vae_decode_close():
    from frameino_tpu.models import wan_vae
    from frameino_tpu.models.quant import quantize_wan_vae_int8
    cfg, params = _vae_tiny22()
    qp = quantize_wan_vae_int8(params)
    z = jax.random.normal(jax.random.key(2), (1, 4, 3, 4, 4))
    ref = np.asarray(wan_vae.decode(cfg, params, z))
    got = np.asarray(wan_vae.decode(cfg, qp, z))
    rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-8)
    assert rel < 0.06, rel
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.99, corr
    # encode path shares the dispatch
    v = jax.random.normal(jax.random.key(3), (1, 3, 9, 32, 32))
    refe = np.asarray(wan_vae.encode(cfg, params, v))
    gote = np.asarray(wan_vae.encode(cfg, qp, v))
    rele = np.abs(gote - refe).mean() / (np.abs(refe).mean() + 1e-8)
    assert rele < 0.03, rele


def test_quantized_vae_preserves_sensitive_convs():
    """conv_in / conv_out (pixel-facing) and the attention einsums stay
    full precision; resblock and resampler convs quantize."""
    from frameino_tpu.models.quant import quantize_wan_vae_int8
    _, params = _vae_tiny22()
    qp = quantize_wan_vae_int8(params)
    for tree in (qp["encoder"], qp["decoder"]):
        assert "kernel" in tree["conv_in"]
        assert "kernel" in tree["conv_out"]
        assert "kernel" in tree["mid"]["attn"]["to_qkv"]
        assert "kernel_q" in tree["mid"]["res1"]["conv1"]
        assert "scale" in tree["mid"]["res1"]["conv2"]
        assert "kernel" not in tree["mid"]["res1"]["conv1"]


def test_quantized_vae_streaming_matches_full_int8():
    """The streaming decoder's private conv wrapper dispatches the same
    int8 path as the full-sequence decode (wan_vae_streaming._cconv_fwd)."""
    from frameino_tpu.models import wan_vae
    from frameino_tpu.models import wan_vae_streaming as S
    from frameino_tpu.models.quant import quantize_wan_vae_int8
    cfg, params = _vae_tiny22()
    qp = quantize_wan_vae_int8(params)
    z = jax.random.normal(jax.random.key(4), (1, 4, 5, 2, 2))
    full = np.asarray(wan_vae.decode(cfg, qp, z))
    chunked = np.asarray(S.streaming_decode(cfg, qp, z,
                                            chunk_latent_frames=2))
    # per-chunk dynamic activation scales differ from the full-sequence
    # scale, so equality is to quantization tolerance, not float exact
    rel = np.abs(chunked - full).mean() / (np.abs(full).mean() + 1e-8)
    assert rel < 0.05, rel


def test_dynamic_quantize_rows_matches_xla_formula():
    """Pallas fused absmax+quantize (interpret mode) bit-matches the
    XLA formulation dense_int8 used before, incl. a row-tail block
    (n % blk != 0) and 3-D inputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from frameino_tpu.ops import dyn_quant

    for shape in [(13, 256), (2, 9, 384), (1, 1, 128)]:
        x = jax.random.normal(jax.random.key(0), shape, jnp.bfloat16) * 3.0
        xq, s = dyn_quant.dynamic_quantize_rows(x, interpret=True)
        xf = x.astype(jnp.float32)
        s_ref = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
        q_ref = jnp.round(xf / s_ref).astype(jnp.int8)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(s_ref))
        np.testing.assert_array_equal(np.asarray(xq), np.asarray(q_ref))
        assert xq.dtype == jnp.int8 and s.shape == shape[:-1] + (1,)


def test_dense_int8_pallas_path_matches_xla_path():
    """dense_int8 with the fused Pallas quantizer == the XLA quantize
    path (FORCE_INTERPRET exercises the kernel on CPU)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from frameino_tpu.models.quant import _quantize_kernel
    from frameino_tpu.ops import dyn_quant, linear

    k1, k2 = jax.random.split(jax.random.key(1))
    kernel = jax.random.normal(k1, (256, 128), jnp.float32)
    q, s = _quantize_kernel(kernel)
    pq = {"kernel_q": q, "scale": s, "bias": jnp.zeros((128,), jnp.float32)}
    x = jax.random.normal(k2, (3, 17, 256), jnp.bfloat16)
    ref = linear.dense_int8(x, pq)
    dyn_quant.FORCE_INTERPRET = True
    dyn_quant.ENABLED = True          # ships off (negative result)
    try:
        got = linear.dense_int8(x, pq)
    finally:
        dyn_quant.FORCE_INTERPRET = False
        dyn_quant.ENABLED = False
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
