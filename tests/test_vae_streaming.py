"""Streaming (temporally chunked, full-width) VAE == full-sequence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frameino_tpu.models import wan_vae
from frameino_tpu.models import wan_vae_streaming as S

pytestmark = pytest.mark.slow

CFG21 = wan_vae.WanVAEConfig(
    base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
    temperal_downsample=(True,), is_residual=False,
    scale_factor_temporal=2, scale_factor_spatial=2,
    latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4))
CFG22 = wan_vae.WanVAEConfig(
    base_dim=8, decoder_base_dim=12, z_dim=4, dim_mult=(1, 2, 2),
    num_res_blocks=1, temperal_downsample=(True, True), is_residual=True,
    in_channels=12, out_channels=12, patch_size=2,
    latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4))


@pytest.mark.parametrize("cfg,zshape", [
    (CFG21, (1, 4, 5, 4, 4)),
    (CFG22, (1, 4, 5, 2, 2)),
])
@pytest.mark.parametrize("chunk", [1, 2, 3])
def test_streaming_decode_matches_full(cfg, zshape, chunk):
    params = wan_vae.init_wan_vae(jax.random.key(0), cfg)
    z = jax.random.normal(jax.random.key(1), zshape)
    full = wan_vae.decode(cfg, params, z)
    stream = S.streaming_decode(cfg, params, z, chunk_latent_frames=chunk)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(full),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("cfg,cin", [(CFG21, 3), (CFG22, 3)])
@pytest.mark.parametrize("chunk", [4, 8])
def test_streaming_encode_matches_full(cfg, cin, chunk):
    params = wan_vae.init_wan_vae(jax.random.key(2), cfg)
    video = jax.random.normal(jax.random.key(3), (1, cin, 9, 16, 16))
    full = wan_vae.encode_moments(cfg, params, video)
    stream = S.streaming_encode_moments(cfg, params, video,
                                        chunk_pixel_frames=chunk)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(full),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("cfg,cin", [(CFG21, 3), (CFG22, 3)])
@pytest.mark.parametrize("chunk", [4, 8])
def test_inline_encode_matches_full(cfg, cin, chunk):
    """The TRACEABLE chunked encode (used inside the one-jit train step)
    equals the full-sequence encode, including under an outer jit."""
    params = wan_vae.init_wan_vae(jax.random.key(2), cfg)
    video = jax.random.normal(jax.random.key(3), (1, cin, 9, 16, 16))
    full = wan_vae.encode_moments(cfg, params, video)
    inline = jax.jit(
        lambda v: S.encode_moments_inline(cfg, params, v,
                                          chunk_pixel_frames=chunk))(video)
    np.testing.assert_allclose(np.asarray(inline), np.asarray(full),
                               atol=1e-4, rtol=1e-4)
