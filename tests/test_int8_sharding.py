"""int8 serving under multi-chip meshes.

DEPLOYMENT.md's recommended flagship serving layout is the certified
int8 path sharded over tp/sp — so the sharding rules must lay quantized
trees (``models/quant.py``: each hot ``kernel`` becomes ``kernel_q`` +
per-out-channel ``scale``) out exactly like their bf16 source:
``kernel_q`` inherits the kernel's spec, and ``scale`` follows the
kernel's out-dim axis so the dequant multiply in
``ops/linear.dense_int8`` needs no resharding. The sharded int8 forward
must match the single-device int8 forward (int32 partial sums psum
exactly; only the fp32 dequant epilogue can reorder).

Reference counterpart: none — the reference has no quantized inference
and no tensor parallelism (SURVEY §2.8); both are TPU headroom.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from frameino_tpu.core.meshes import MeshConfig, make_mesh
from frameino_tpu.core.tree import flatten
from frameino_tpu.models import wan_dit
from frameino_tpu.models.quant import quantize_dit_int8
from frameino_tpu.parallel.sharding import dit_param_specs, shard_pytree


def _tiny_setup():
    cfg = wan_dit.tiny_config(num_attention_heads=4, attention_head_dim=16,
                              num_layers=2)
    params = wan_dit.init_wan_dit(jax.random.key(0), cfg)
    B, F, H, W = 2, 4, 8, 8
    ks = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(ks[0], (B, cfg.in_channels, F, H, W))
    t = jnp.full((B,), 500.0)
    text = jax.random.normal(ks[2], (B, 8, cfg.text_dim))
    return cfg, params, (x, t, text)


def test_kernel_q_inherits_kernel_spec():
    cfg, params, _ = _tiny_setup()
    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2, sp=1),
                     devices=jax.devices()[:8])
    bf16_specs = flatten(dit_param_specs(params, mesh))
    q_specs = flatten(dit_param_specs(quantize_dit_int8(params), mesh))

    n_checked = 0
    for path, spec in q_specs.items():
        if path.endswith(".kernel_q"):
            src = path[: -len("_q")]
            assert src in bf16_specs, src
            assert spec == bf16_specs[src], (path, spec, bf16_specs[src])
            n_checked += 1
    assert n_checked >= 6 * cfg.num_layers // cfg.num_layers  # qkv,o,fc1,fc2


def test_scales_replicated_not_resharded():
    """Per-out-channel scales are tiny; they stay replicated so the
    dequant multiply never inserts reshard collectives (measured: a
    sharded scale layout adds all-to-alls to the denoise loop)."""
    cfg, params, _ = _tiny_setup()
    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2, sp=1),
                     devices=jax.devices()[:8])
    q_specs = flatten(dit_param_specs(quantize_dit_int8(params), mesh))
    for path in ("blocks.attn1.to_q.scale", "blocks.ffn.fc1.scale",
                 "blocks.attn1.to_out.scale", "blocks.ffn.fc2.scale"):
        assert q_specs[path] == P(), (path, q_specs[path])


def test_scales_pp_sliced_with_their_kernels():
    """Under pp>1 each pipeline stage holds its L/pp block slice — the
    stacked scales must slice on the layers axis exactly like kernel_q
    (parallel/pipeline.py consumes that layout)."""
    cfg, params, _ = _tiny_setup()
    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=2, sp=1, pp=2),
                     devices=jax.devices()[:8])
    q_specs = flatten(dit_param_specs(quantize_dit_int8(params), mesh))
    assert q_specs["blocks.ffn.fc1.scale"] == P("pp")
    assert q_specs["blocks.ffn.fc1.kernel_q"][0] == "pp"


def test_cogvideox_ff_kernels_get_tp():
    """CogVideoX names its FFN 'ff' (not 'ffn'); the rules must still
    produce the column/row-parallel tp layout for it."""
    from frameino_tpu.models import cogvideox_dit

    cfg = cogvideox_dit.tiny_config(num_attention_heads=4,
                                    max_text_seq_length=8)
    params = cogvideox_dit.init_cogvideox_dit(jax.random.key(0), cfg)
    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2, sp=1),
                     devices=jax.devices()[:8])
    specs = flatten(dit_param_specs(params, mesh))
    assert specs["blocks.ff.fc1.kernel"] == P(None, "fsdp", "tp")
    assert specs["blocks.ff.fc2.kernel"] == P(None, "tp", "fsdp")
    q_specs = flatten(dit_param_specs(quantize_dit_int8(params), mesh))
    assert q_specs["blocks.ff.fc1.kernel_q"] == P(None, "fsdp", "tp")
    assert q_specs["blocks.ff.fc1.scale"] == P()


def test_int8_sharded_forward_matches_single_device():
    """The quantized Wan forward under a dp/fsdp/tp/sp mesh equals the
    single-device quantized forward (the serving configuration
    DEPLOYMENT.md recommends for the flagship shape)."""
    cfg, params, args = _tiny_setup()
    qparams = quantize_dit_int8(params)
    ref = jax.jit(lambda p, *a: wan_dit.wan_dit_forward(cfg, p, *a))(
        qparams, *args)

    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=2, sp=2),
                     devices=jax.devices()[:8])
    with mesh:
        qs = shard_pytree(qparams, mesh)
        out = jax.jit(lambda p, *a: wan_dit.wan_dit_forward(
            cfg, p, *a, mesh=mesh))(qs, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_int8_sharded_cogvideox_forward_matches_single_device():
    from frameino_tpu.models import cogvideox_dit

    cfg = cogvideox_dit.tiny_config(num_attention_heads=4,
                                    max_text_seq_length=8)
    params = cogvideox_dit.init_cogvideox_dit(jax.random.key(0), cfg)
    qparams = quantize_dit_int8(params)
    B, F, H, W = 2, 3, 8, 8
    x = jax.random.normal(jax.random.key(1), (B, F, cfg.in_channels, H, W))
    text = jax.random.normal(jax.random.key(2), (B, 8, cfg.text_embed_dim))
    t = jnp.asarray([500.0, 300.0])
    cos, sin = cogvideox_dit.cogvideox_rope(cfg, F, H, W)
    ref = jax.jit(lambda p: cogvideox_dit.cogvideox_forward(
        cfg, p, x, text, t, image_rotary_emb=(cos, sin)))(qparams)

    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=2, sp=2),
                     devices=jax.devices()[:8])
    with mesh:
        qs = shard_pytree(qparams, mesh)
        out = jax.jit(lambda p: cogvideox_dit.cogvideox_forward(
            cfg, p, x, text, t, image_rotary_emb=(cos, sin),
            mesh=mesh))(qs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
