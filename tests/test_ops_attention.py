"""Attention op tests (CPU: Pallas kernels run in interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frameino_tpu.ops import attention as attn_ops


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


class TestXLAReference:
    def test_matches_naive(self):
        k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
        q = _rand(k1, (2, 3, 17, 8))
        k = _rand(k2, (2, 3, 29, 8))
        v = _rand(k3, (2, 3, 29, 8))
        out = attn_ops.attention_xla(q, k, v)
        scale = 8 ** -0.5
        logits = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
        probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
        ref = np.einsum("bhqk,bhkd->bhqd", probs, v)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_softmax_rows_sum(self):
        # identical keys -> output equals mean of values
        q = jnp.zeros((1, 1, 4, 16))
        k = jnp.zeros((1, 1, 9, 16))
        v = jnp.tile(jnp.arange(9.0)[None, None, :, None], (1, 1, 1, 16))
        out = attn_ops.attention_xla(q, k, v)
        np.testing.assert_allclose(out, np.full(out.shape, 4.0), atol=1e-5)


@pytest.mark.parametrize("sq,skv", [(256, 256), (300, 300), (256, 77),
                                    (1000, 513)])
def test_flash_inference_matches_xla(sq, skv):
    """Pallas fwd kernel (interpret on CPU) == XLA reference, incl. padding."""
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    q = _rand(k1, (1, 2, sq, 64))
    k = _rand(k2, (1, 2, skv, 64))
    v = _rand(k3, (1, 2, skv, 64))
    ref = attn_ops.attention_xla(q, k, v)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        out = attn_ops.flash_attention_inference(q, k, v,
                                                 block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_dispatch_cpu_uses_xla():
    k1 = jax.random.key(2)
    q = _rand(k1, (1, 1, 8, 8))
    out = attn_ops.attention(q, q, q)
    ref = attn_ops.attention_xla(q, q, q)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_sp_attention_matches_global():
    """All-gather-KV sequence parallelism over an sp=2 mesh equals the
    unsharded computation."""
    from frameino_tpu.core.meshes import MeshConfig, make_mesh
    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=1, sp=2))
    k1, k2, k3 = jax.random.split(jax.random.key(9), 3)
    q = _rand(k1, (4, 2, 64, 16))
    k = _rand(k2, (4, 2, 64, 16))
    v = _rand(k3, (4, 2, 64, 16))
    ref = attn_ops.attention_xla(q, k, v)
    with mesh:
        out = attn_ops.sp_attention(q, k, v, mesh, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_train_fwd_matches_xla_interpret():
    """The differentiable (bundled-kernel) path with tuned block sizes
    and segment-id padding matches the XLA reference (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu
    k1, k2, k3 = jax.random.split(jax.random.key(11), 3)
    q = _rand(k1, (1, 2, 100, 64))
    k = _rand(k2, (1, 2, 100, 64))
    v = _rand(k3, (1, 2, 100, 64))
    ref = attn_ops.attention_xla(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = attn_ops.flash_attention_train(q, k, v, block_multiple=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_ring_attention_matches_global():
    """KV rotation via ppermute + online LSE merge == global attention."""
    from frameino_tpu.core.meshes import MeshConfig, make_mesh
    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=2, sp=2),
                     devices=jax.devices()[:8])
    k1, k2, k3 = jax.random.split(jax.random.key(13), 3)
    q = _rand(k1, (2, 4, 64, 16))
    k = _rand(k2, (2, 4, 64, 16))
    v = _rand(k3, (2, 4, 64, 16))
    ref = attn_ops.attention_xla(q, k, v)
    with mesh:
        out = jax.jit(lambda q, k, v: attn_ops.ring_attention(
            q, k, v, mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ring_attention_grads_match():
    from frameino_tpu.core.meshes import MeshConfig, make_mesh
    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=1, sp=4),
                     devices=jax.devices()[:4])
    k1, k2, k3 = jax.random.split(jax.random.key(14), 3)
    q = _rand(k1, (1, 2, 32, 8))
    k = _rand(k2, (1, 2, 32, 8))
    v = _rand(k3, (1, 2, 32, 8))

    def loss_ref(qkv):
        return jnp.mean(jnp.square(attn_ops.attention_xla(*qkv)))

    def loss_ring(qkv):
        return jnp.mean(jnp.square(attn_ops.ring_attention(*qkv, mesh)))

    g_ref = jax.grad(loss_ref)((q, k, v))
    with mesh:
        g_ring = jax.jit(jax.grad(loss_ring))((q, k, v))
    for a, b in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("S", [256, 300])
def test_fused_qk_flash_matches_unfused(S):
    """Fused-producer kernel (in-kernel rms-norm + interleaved rope via
    lane pair-swap) == the unfused producer chain + plain flash kernel,
    including a non-block-multiple tail."""
    import jax
    import jax.numpy as jnp

    from frameino_tpu.ops import rope as rope_ops
    from frameino_tpu.ops.attention import fused_qk_flash_attention
    from frameino_tpu.ops.norms import rms_norm

    B, H, D = 2, 3, 32
    eps = 1e-6
    rs = np.random.RandomState(0)
    q_raw = jnp.asarray(rs.randn(B, S, H * D), jnp.bfloat16)
    k_raw = jnp.asarray(rs.randn(B, S, H * D), jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, H, S, D), jnp.bfloat16)
    w_q = jnp.asarray(1.0 + 0.1 * rs.randn(H * D), jnp.float32)
    w_k = jnp.asarray(1.0 + 0.1 * rs.randn(H * D), jnp.float32)
    ang = rs.randn(S, D // 2).astype(np.float32)
    cos, sin = jnp.cos(jnp.asarray(ang)), jnp.sin(jnp.asarray(ang))

    def split(x):
        return x.reshape(B, S, H, D).transpose(0, 2, 1, 3)

    qn = split(rms_norm(q_raw, w_q, eps=eps))
    kn = split(rms_norm(k_raw, w_k, eps=eps))
    qn = rope_ops.apply_rope_interleaved(qn, cos, sin)
    kn = rope_ops.apply_rope_interleaved(kn, cos, sin)
    from frameino_tpu.ops.attention import attention_xla
    ref = attention_xla(qn, kn, v)

    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = fused_qk_flash_attention(
            q_raw, k_raw, v, w_q, w_k, cos, sin, num_heads=H, eps=eps,
            block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_auto_block_divisor_policy():
    """Divisor blocks at the production padded lengths; safe fallbacks."""
    from frameino_tpu.ops.attention import _auto_block

    assert _auto_block(5632, 1024) == 1408      # 49f@480x832 (+ID) padded
    assert _auto_block(5632, 512) == 1408
    assert _auto_block(19456, 1024) == 1024     # flagship 704x1280x81f
    assert _auto_block(5120, 512) == 1024       # 49f@448x832: 1024 > 1280
    # no 128-multiple divisor in [512, 1408] -> fall back to default
    assert _auto_block(5120 + 128, 1024) == 1024
    # tiny test shapes: default capped at the sequence itself
    assert _auto_block(128, 512) == 128
    assert _auto_block(256, 1024) == 256
    # the VMEM bound: picked blocks never exceed 1408 (the (1408, 2816)
    # probability tile fails scoped-vmem allocation on v5e)
    for sp in (512, 1024, 2816, 5632, 11264, 19456, 19968):
        assert _auto_block(sp, 1024) <= 1408
        assert sp % _auto_block(sp, 1024) == 0 or _auto_block(sp, 1024) <= 1024


class TestStaticBoundSoftmax:
    """The static-bound kernel (r5: no running max / rescale — measured
    +16% D=64, +12% D=128 on v5e) must match the online-softmax kernel
    bit-for-bit up to fp32 reassociation, including padded tails and
    adversarial qk-norm gains, and must stay finite even when the
    Cauchy-Schwarz bound is pathologically loose."""

    def _attn_pair(self, S, D, seed=0, gain_spike=1.0):
        import jax
        import jax.numpy as jnp
        rs = np.random.RandomState(seed)
        B, H = 2, 3
        q = jnp.asarray(rs.randn(B, H, S, D), jnp.bfloat16)
        k = jnp.asarray(rs.randn(B, H, S, D), jnp.bfloat16)
        v = jnp.asarray(rs.randn(B, H, S, D), jnp.bfloat16)
        # spike one channel like an outlier qk-norm gain would
        q = q.at[..., 0].mul(gain_spike)
        k = k.at[..., 0].mul(gain_spike)
        return q, k, v

    @pytest.mark.parametrize("S,D", [(256, 32), (300, 64)])
    def test_static_matches_online(self, S, D):
        import jax.numpy as jnp

        from frameino_tpu.ops.attention import (_LOG2E, _flash_fwd,
                                                _flash_fwd_static,
                                                _rowmax_norm)
        q, k, v = self._attn_pair(S, D)
        scale = D ** -0.5
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            ref = _flash_fwd(q, k, v, scale=scale, block_q=128,
                             block_k=128, interpret=True)
            qs = q * jnp.bfloat16(scale * _LOG2E)
            B, H, _, _ = q.shape
            bound = (_rowmax_norm(qs.reshape(B * H, S, D))
                     * _rowmax_norm(k.reshape(B * H, S, D))).reshape(1)
            got = _flash_fwd_static(qs, k, v, bound, block_q=128,
                                    block_k=128, kv_len=S,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-2, rtol=2e-2)

    def test_loose_bound_stays_finite(self):
        """bound - row_max beyond the fp32 exp2 range: the -120 clamp
        must yield a finite (average-of-V) row, never 0/0 = NaN."""
        import jax.numpy as jnp

        from frameino_tpu.ops.attention import _flash_fwd_static
        q, k, v = self._attn_pair(256, 32)
        bound = jnp.asarray([1e6], jnp.float32)     # absurdly loose
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            out = _flash_fwd_static(q, k, v, bound, block_q=128,
                                    block_k=128, kv_len=256,
                                    interpret=True)
        assert np.isfinite(np.asarray(out, np.float32)).all()

    def test_fused_paths_static_vs_online(self):
        """Both fused producer paths (Wan RMS D=32-per-head and Cog LN)
        give the same output with static_softmax on and off."""
        import jax.numpy as jnp

        from frameino_tpu.ops.attention import (
            fused_ln_qk_flash_attention, fused_qk_flash_attention)
        B, H, D, S = 2, 3, 32, 300
        rs = np.random.RandomState(1)
        q_raw = jnp.asarray(rs.randn(B, S, H * D), jnp.bfloat16)
        k_raw = jnp.asarray(rs.randn(B, S, H * D), jnp.bfloat16)
        v = jnp.asarray(rs.randn(B, H, S, D), jnp.bfloat16)
        w = jnp.asarray(1.0 + 0.5 * rs.randn(H * D), jnp.float32)
        wh = jnp.asarray(1.0 + 0.5 * rs.randn(D), jnp.float32)
        bh = jnp.asarray(0.3 * rs.randn(D), jnp.float32)
        ang = rs.randn(S, D // 2).astype(np.float32)
        cos, sin = jnp.cos(jnp.asarray(ang)), jnp.sin(jnp.asarray(ang))
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            a = fused_qk_flash_attention(
                q_raw, k_raw, v, w, w, cos, sin, num_heads=H, eps=1e-6,
                block_q=128, block_k=128, interpret=True,
                static_softmax=True)
            b = fused_qk_flash_attention(
                q_raw, k_raw, v, w, w, cos, sin, num_heads=H, eps=1e-6,
                block_q=128, block_k=128, interpret=True,
                static_softmax=False)
            c = fused_ln_qk_flash_attention(
                q_raw, k_raw, v, wh, bh, wh, bh, cos, sin, num_heads=H,
                head_dim=D, eps=1e-6, block_q=128, block_k=128,
                interpret=True, static_softmax=True)
            d = fused_ln_qk_flash_attention(
                q_raw, k_raw, v, wh, bh, wh, bh, cos, sin, num_heads=H,
                head_dim=D, eps=1e-6, block_q=128, block_k=128,
                interpret=True, static_softmax=False)
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=2e-2, rtol=2e-2)
        np.testing.assert_allclose(np.asarray(c, np.float32),
                                   np.asarray(d, np.float32),
                                   atol=2e-2, rtol=2e-2)
