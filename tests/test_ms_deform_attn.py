"""MSDeformAttn: JAX op vs torch grid_sample reference vs C++ native."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from frameino_tpu.ops.ms_deform_attn import ms_deform_attn


def _torch_reference(value, shapes, locs, weights):
    """The pure-PyTorch fallback algorithm (grid_sample per level) the
    reference ships for CPU (ops/functions/ms_deform_attn_func.py role)."""
    B, S, H, D = value.shape
    Q, L, P = locs.shape[1], locs.shape[3], locs.shape[4]
    value_t = torch.from_numpy(value)
    splits = [h * w for h, w in shapes]
    value_list = value_t.split(splits, dim=1)
    out = torch.zeros(B, Q, H, D)
    for lvl, (Hl, Wl) in enumerate(shapes):
        v = value_list[lvl].reshape(B, Hl, Wl, H, D)
        v = v.permute(0, 3, 4, 1, 2).reshape(B * H, D, Hl, Wl)
        grid = torch.from_numpy(locs[:, :, :, lvl]) * 2 - 1   # [B,Q,H,P,2]
        grid = grid.permute(0, 2, 1, 3, 4).reshape(B * H, Q, P, 2)
        sampled = F.grid_sample(v, grid, mode="bilinear",
                                padding_mode="zeros", align_corners=False)
        sampled = sampled.reshape(B, H, D, Q, P)
        w = torch.from_numpy(weights[:, :, :, lvl])           # [B,Q,H,P]
        out += (sampled * w.permute(0, 2, 1, 3)[:, :, None]
                ).sum(-1).permute(0, 3, 1, 2)
    return out.reshape(B, Q, H * D).numpy()


@pytest.fixture(scope="module")
def inputs():
    rs = np.random.RandomState(0)
    B, H, D, Q, P = 2, 2, 8, 5, 3
    shapes = [(6, 8), (3, 4)]
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = rs.randn(B, S, H, D).astype(np.float32)
    locs = rs.rand(B, Q, H, L, P, 2).astype(np.float32)
    weights = rs.rand(B, Q, H, L, P).astype(np.float32)
    weights /= weights.sum(axis=(3, 4), keepdims=True)
    return value, shapes, locs, weights


def test_jax_matches_torch_grid_sample(inputs):
    value, shapes, locs, weights = inputs
    got = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(locs),
                         jnp.asarray(weights))
    ref = _torch_reference(value, shapes, locs, weights)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_native_matches_jax(inputs):
    from frameino_tpu.native import load_native, ms_deform_attn_native
    if load_native() is None:
        pytest.skip("native toolchain unavailable")
    value, shapes, locs, weights = inputs
    got = ms_deform_attn_native(value, shapes, locs, weights)
    ref = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(locs),
                         jnp.asarray(weights))
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-5)


def test_out_of_range_locations_zero(inputs):
    value, shapes, _, weights = inputs
    B, Q, H, L, P = weights.shape
    locs = np.full((B, Q, H, L, P, 2), 5.0, np.float32)   # far outside
    got = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(locs),
                         jnp.asarray(weights))
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-6)
