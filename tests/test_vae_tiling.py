"""VAE spatial tiling/slicing tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frameino_tpu.models import wan_vae
from frameino_tpu.models import wan_vae_tiling as T

pytestmark = pytest.mark.slow

CFG = wan_vae.WanVAEConfig(
    base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
    temperal_downsample=(True,), is_residual=False,
    scale_factor_temporal=2, scale_factor_spatial=2,
    latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4))


@pytest.fixture(scope="module")
def params():
    return wan_vae.init_wan_vae(jax.random.key(0), CFG)


def test_tiled_encode_shape_and_closeness(params):
    video = jnp.tanh(jax.random.normal(jax.random.key(1), (1, 3, 5, 32, 48)))
    full = wan_vae.encode_moments(CFG, params, video)
    tiled = T.tiled_encode(CFG, params, video, tile_min=16, tile_stride=12)
    assert tiled.shape == full.shape
    # interiors agree; seams are blended (close but not identical)
    diff = np.abs(np.asarray(tiled) - np.asarray(full))
    assert np.median(diff) < 0.3
    assert np.isfinite(np.asarray(tiled)).all()


def test_tiled_decode_shape(params):
    z = jax.random.normal(jax.random.key(2), (1, 4, 3, 16, 24))
    full = wan_vae.decode(CFG, params, z)
    tiled = T.tiled_decode(CFG, params, z, tile_min=16, tile_stride=12)
    assert tiled.shape == full.shape
    assert np.isfinite(np.asarray(tiled)).all()
    assert tiled.min() >= -1.0 and tiled.max() <= 1.0


def test_small_input_bypasses_tiling(params):
    video = jnp.tanh(jax.random.normal(jax.random.key(3), (1, 3, 5, 16, 16)))
    full = wan_vae.encode_moments(CFG, params, video)
    tiled = T.tiled_encode(CFG, params, video, tile_min=256)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full))


def test_sliced_batch(params):
    video = jnp.tanh(jax.random.normal(jax.random.key(4), (2, 3, 5, 16, 16)))
    a = T.sliced_encode(CFG, params, video)
    b = wan_vae.encode_moments(CFG, params, video)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_hybrid_decode_matches_tiled(params):
    """Streaming x tiled hybrid == plain tiled decode bit-for-bit: the
    in-tile temporal streaming is numerically exact (chunk-protocol
    equivalence), so only the spatial tiling seams differ from full."""
    z = jax.random.normal(jax.random.key(3), (1, 4, 5, 16, 24))
    tiled = T.tiled_decode(CFG, params, z, tile_min=16, tile_stride=12)
    hybrid = T.hybrid_decode(CFG, params, z, tile_min=16, tile_stride=12,
                             chunk_latent_frames=2)
    np.testing.assert_allclose(np.asarray(hybrid), np.asarray(tiled),
                               atol=1e-5)


def test_hybrid_encode_matches_tiled(params):
    video = jnp.tanh(jax.random.normal(jax.random.key(4),
                                       (1, 3, 5, 32, 48)))
    tiled = T.tiled_encode(CFG, params, video, tile_min=16, tile_stride=12)
    hybrid = T.hybrid_encode(CFG, params, video, tile_min=16,
                             tile_stride=12, chunk_pixel_frames=4)
    np.testing.assert_allclose(np.asarray(hybrid), np.asarray(tiled),
                               atol=1e-5)
