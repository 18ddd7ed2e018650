"""HLO collective audit (VERDICT r2 #6): lower the sharded train and
denoise steps on the 8-device CPU mesh and assert the collective
inventory — expected kinds present, no accidental per-layer unrolled
param gathers (scan-carried collectives are layer-count-invariant), no
single full-param-tree gather, sp attention produces exactly the
intended gathers/ppermutes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frameino_tpu.core.meshes import MeshConfig, make_mesh
from frameino_tpu.parallel.collective_audit import (audit_collectives,
                                                    format_table)

pytestmark = pytest.mark.slow


def _tiny_cfgs(num_layers=2):
    from frameino_tpu.models import wan_dit, wan_vae
    vae_cfg = wan_vae.WanVAEConfig(
        base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
        temperal_downsample=(True,), is_residual=False, patch_size=None,
        scale_factor_temporal=2, scale_factor_spatial=2,
        latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4))
    dit_cfg = wan_dit.WanDiTConfig(
        num_attention_heads=4, attention_head_dim=24, in_channels=8,
        out_channels=4, text_dim=32, freq_dim=32, ffn_dim=128,
        num_layers=num_layers)
    return dit_cfg, vae_cfg


def _compile_train_step(mcfg: MeshConfig, num_layers=2):
    from frameino_tpu.models import wan_dit, wan_vae
    from frameino_tpu.training import (OptimizerConfig, TrainerConfig,
                                       make_optimizer,
                                       make_sharded_train_state,
                                       make_train_step)
    dit_cfg, vae_cfg = _tiny_cfgs(num_layers)
    dit_params = wan_dit.init_wan_dit(jax.random.key(0), dit_cfg)
    vae_params = wan_vae.init_wan_vae(jax.random.key(1), vae_cfg)
    mesh = make_mesh(mcfg, devices=jax.devices()[:8])
    opt = make_optimizer(OptimizerConfig(lr_warmup_steps=1))
    tcfg = TrainerConfig(compute_dtype=jnp.float32, remat=True,
                         attn_impl="xla")
    B = max(2, mcfg.dp * mcfg.fsdp)
    ks = jax.random.split(jax.random.key(2), 5)
    batch = {
        "video_tensor": jax.random.normal(ks[0], (B, 5, 3, 16, 16)),
        "first_frame_tensor": jax.random.normal(ks[1], (B, 3, 16, 16)),
        "traj_tensor": jax.random.normal(ks[2], (B, 5, 3, 16, 16)),
        "ID_tensor": jax.random.normal(ks[3], (B, 1, 3, 16, 16)),
        "prompt_embeds": jax.random.normal(ks[4],
                                           (B, 8, dit_cfg.text_dim)),
    }
    with mesh:
        state = make_sharded_train_state(dit_params, opt, mesh)
        step = make_train_step(dit_cfg, vae_cfg, tcfg, opt, mesh=mesh,
                               dp_size=mcfg.dp)
        compiled = jax.jit(step, donate_argnums=0).lower(
            state, vae_params, batch, jax.random.key(3)).compile()
    param_bytes = sum(np.prod(x.shape) * x.dtype.itemsize
                      for x in jax.tree.leaves(dit_params))
    max_leaf_bytes = max(np.prod(x.shape) * x.dtype.itemsize
                        for x in jax.tree.leaves(dit_params))
    return compiled, param_bytes, max_leaf_bytes


def test_train_step_collectives_fsdp_tp():
    """dp2/fsdp2/tp2: fsdp param gathers + grad reductions present;
    no single gather moves the whole param tree; no all-to-all."""
    compiled, param_bytes, max_leaf = _compile_train_step(
        MeshConfig(dp=2, fsdp=2, tp=2, sp=1))
    inv = audit_collectives(compiled)
    print(format_table("train dp2/fsdp2/tp2", inv))
    assert "all-gather" in inv                   # ZeRO-3 param gathers
    reductions = (inv.get("all-reduce", {"count": 0})["count"]
                  + inv.get("reduce-scatter", {"count": 0})["count"])
    assert reductions >= 1                       # grad sync dp/fsdp/tp
    assert "all-to-all" not in inv
    # no accidental whole-tree gather: the largest single collective
    # must not exceed the largest (scan-stacked) parameter leaf
    assert inv["all-gather"]["max_single_bytes"] <= max_leaf * 1.01
    assert inv["all-gather"]["max_single_bytes"] < param_bytes


def test_scan_collectives_layer_count_invariant():
    """The block scan carries its collectives once in the HLO: doubling
    num_layers must NOT change the all-gather count (catches a scan
    unrolled into per-layer gathers)."""
    mcfg = MeshConfig(dp=2, fsdp=2, tp=2, sp=1)
    c2, _, _ = _compile_train_step(mcfg, num_layers=2)
    c4, _, _ = _compile_train_step(mcfg, num_layers=4)
    inv2 = audit_collectives(c2)
    inv4 = audit_collectives(c4)
    print(format_table("train 2-layer", inv2))
    print(format_table("train 4-layer", inv4))
    assert inv2["all-gather"]["count"] == inv4["all-gather"]["count"]


def _compile_denoise(mcfg: MeshConfig, sp_method: str):
    from frameino_tpu.models import wan_dit
    dit_cfg, _ = _tiny_cfgs()
    params = wan_dit.init_wan_dit(jax.random.key(0), dit_cfg)
    n = mcfg.size
    mesh = make_mesh(mcfg, devices=jax.devices()[:n])
    B, F, H, W = 1, 4, 8, 8
    x = jnp.zeros((B, dit_cfg.in_channels, F, H, W))
    t = jnp.full((B,), 500.0)
    text = jnp.zeros((B, 8, dit_cfg.text_dim))

    import frameino_tpu.ops.attention as A
    prev = A.DEFAULT_SP_METHOD
    A.DEFAULT_SP_METHOD = sp_method
    try:
        with mesh:
            fn = jax.jit(lambda p, x, t, c: wan_dit.wan_dit_forward(
                dit_cfg, p, x, t, c, attn_impl="xla", mesh=mesh))
            compiled = fn.lower(params, x, t, text).compile()
    finally:
        A.DEFAULT_SP_METHOD = prev
    return compiled


def test_sp_attention_collectives():
    """sp=4 denoise: all-gather-KV method produces gathers and ZERO
    ppermutes; ring method produces collective-permutes."""
    mcfg = MeshConfig(dp=1, fsdp=1, tp=1, sp=4)
    inv_ag = audit_collectives(_compile_denoise(mcfg, "allgather"))
    print(format_table("denoise sp4 allgather-KV", inv_ag))
    assert inv_ag.get("all-gather", {"count": 0})["count"] >= 1
    assert "collective-permute" not in inv_ag

    inv_ring = audit_collectives(_compile_denoise(mcfg, "ring"))
    print(format_table("denoise sp4 ring", inv_ring))
    assert inv_ring.get("collective-permute",
                        {"count": 0})["count"] >= 1


def test_pp_pipeline_collectives():
    """dp2/tp2/pp2 forward: the GPipe pipeline lowers to
    collective-permutes (per-tick activation hops, scan-carried) and
    must not gather any full stacked-block leaf back together — each
    stage keeps its L/pp slice resident."""
    from frameino_tpu.models import wan_dit
    dit_cfg, _ = _tiny_cfgs()
    params = wan_dit.init_wan_dit(jax.random.key(0), dit_cfg)
    mcfg = MeshConfig(dp=2, tp=2, pp=2)
    mesh = make_mesh(mcfg, devices=jax.devices()[:mcfg.size])
    B, F, H, W = 2, 4, 8, 8
    x = jnp.zeros((B, dit_cfg.in_channels, F, H, W))
    t = jnp.full((B,), 500.0)
    text = jnp.zeros((B, 8, dit_cfg.text_dim))
    with mesh:
        fn = jax.jit(lambda p, x, t, c: wan_dit.wan_dit_forward(
            dit_cfg, p, x, t, c, attn_impl="xla", mesh=mesh))
        compiled = fn.lower(params, x, t, text).compile()
    inv = audit_collectives(compiled)
    print(format_table("forward dp2/tp2/pp2", inv))
    assert inv.get("collective-permute", {"count": 0})["count"] >= 1
    stacked_bytes = max(
        np.prod(v.shape) * v.dtype.itemsize
        for v in jax.tree.leaves(params["blocks"]))
    ag = inv.get("all-gather")
    if ag is not None:
        assert ag["max_single_bytes"] < stacked_bytes, (
            "a full stacked-block leaf was gathered — pp stage slices "
            "must stay sharded")


def test_qwen_tp_collectives():
    """Megatron-style tp on the Qwen LLM must lower to exactly the
    row-parallel all-reduces (o_proj + down_proj per layer, plus the
    vocab-parallel embed gather / logit reduce) — and must NOT gather
    any column/row-split weight."""
    from jax.sharding import Mesh
    from frameino_tpu.models.qwen_vl import (mrope_tables,
                                             shard_qwen_params,
                                             text_forward,
                                             tiny_qwen_vl_config)
    from frameino_tpu.models.qwen_vl import qwen_vl_from_state_dict  # noqa: F401
    cfg = tiny_qwen_vl_config()
    t = cfg.text
    # build a random param tree with the real layout (no torch needed)
    import tests.test_qwen_vl  # noqa: F401  (documents provenance)
    rng = np.random.default_rng(0)

    def nrm(*s):
        return jnp.asarray(rng.standard_normal(s, dtype=np.float32)
                           * 0.05)

    layers = []
    for _ in range(t.num_layers):
        layers.append({
            "ln1": jnp.ones(t.hidden_size), "ln2": jnp.ones(t.hidden_size),
            "q_w": nrm(t.hidden_size, t.num_heads * t.head_dim),
            "q_b": nrm(t.num_heads * t.head_dim),
            "k_w": nrm(t.hidden_size, t.num_kv_heads * t.head_dim),
            "k_b": nrm(t.num_kv_heads * t.head_dim),
            "v_w": nrm(t.hidden_size, t.num_kv_heads * t.head_dim),
            "v_b": nrm(t.num_kv_heads * t.head_dim),
            "o_w": nrm(t.num_heads * t.head_dim, t.hidden_size),
            "mlp": {"gate_w": nrm(t.hidden_size, t.intermediate_size),
                    "up_w": nrm(t.hidden_size, t.intermediate_size),
                    "down_w": nrm(t.intermediate_size, t.hidden_size)}})
    params = {"visual": {}, "layers": layers,
              "embed_tokens": nrm(t.vocab_size, t.hidden_size),
              "norm_w": jnp.ones(t.hidden_size),
              "lm_head": nrm(t.hidden_size, t.vocab_size)}
    mesh = Mesh(np.array(jax.devices()[:2]), ("tp",))
    sharded = shard_qwen_params(params, mesh, cfg)
    S = 8
    pos = np.broadcast_to(np.arange(S), (3, S))
    cos, sin = mrope_tables(pos, t)

    def fwd(p, e):
        caches = [(jnp.zeros((1, t.num_kv_heads, S, t.head_dim)),
                   jnp.zeros((1, t.num_kv_heads, S, t.head_dim)))
                  for _ in range(t.num_layers)]
        mask = jnp.where(jnp.arange(S)[None, :]
                         <= jnp.arange(S)[:, None], 0.0, -1e30)
        logits, _ = text_forward(p, e, jnp.asarray(cos),
                                 jnp.asarray(sin), caches, 0, mask, t)
        return logits

    e = jnp.zeros((1, S, t.hidden_size))
    compiled = jax.jit(fwd).lower(sharded, e).compile()
    inv = audit_collectives(compiled)
    reduces = (inv.get("all-reduce", {"count": 0})["count"]
               + inv.get("reduce-scatter", {"count": 0})["count"])
    # >= 2 row-parallel reduces per layer; bounded (no per-weight
    # gather storm): a generous cap of 4/layer + 4 for embed/logits
    assert reduces >= 2 * t.num_layers, format_table("qwen_tp", inv)
    total = sum(v["count"] for v in inv.values())
    assert total <= 4 * t.num_layers + 6, format_table("qwen_tp", inv)
    # no full-weight all-gather of a column/row-split matmul operand:
    # the largest gathered tensor must stay far below the largest
    # weight (vocab x hidden)
    biggest_w = t.vocab_size * t.hidden_size * 4
    for kind, v in inv.items():
        if "gather" in kind:
            assert v["max_single_bytes"] < biggest_w / 2, (kind, v)


def test_single_device_has_no_collectives():
    """mesh 1x1x1x1: partitioning must insert nothing."""
    inv = audit_collectives(_compile_denoise(
        MeshConfig(dp=1, fsdp=1, tp=1, sp=1), "allgather"))
    print(format_table("denoise single-device", inv))
    assert not inv


def test_int8_denoise_collectives_fsdp_tp():
    """int8 serving sharded over fsdp2/tp2 (the DEPLOYMENT.md flagship
    layout): the quantized forward's collective inventory must look like
    the bf16 one — fsdp kernel gathers bounded by the largest stacked
    leaf (kernel_q bytes, int8), no all-to-all, and crucially no
    full-precision-sized gather (which would mean XLA dequantized a
    kernel BEFORE gathering, moving 4x the bytes over ICI)."""
    from frameino_tpu.models import wan_dit
    from frameino_tpu.models.quant import quantize_dit_int8
    from frameino_tpu.parallel.sharding import shard_pytree

    dit_cfg, _ = _tiny_cfgs()
    qparams = quantize_dit_int8(
        wan_dit.init_wan_dit(jax.random.key(0), dit_cfg))
    mcfg = MeshConfig(dp=1, fsdp=2, tp=2, sp=2)
    mesh = make_mesh(mcfg, devices=jax.devices()[:mcfg.size])
    B, F, H, W = 1, 4, 8, 8
    x = jnp.zeros((B, dit_cfg.in_channels, F, H, W))
    t = jnp.full((B,), 500.0)
    text = jnp.zeros((B, 8, dit_cfg.text_dim))
    with mesh:
        qs = shard_pytree(qparams, mesh)
        fn = jax.jit(lambda p, x, t, c: wan_dit.wan_dit_forward(
            dit_cfg, p, x, t, c, attn_impl="xla", mesh=mesh))
        compiled = fn.lower(qs, x, t, text).compile()
    inv = audit_collectives(compiled)
    print(format_table("int8 denoise fsdp2/tp2/sp2", inv))
    assert "all-to-all" not in inv
    max_leaf = max(np.prod(v.shape) * v.dtype.itemsize
                   for v in jax.tree.leaves(qparams))
    ag = inv.get("all-gather")
    if ag is not None:
        assert ag["max_single_bytes"] <= max_leaf * 1.01, (
            "a gather larger than any quantized leaf — likely a "
            "dequantize-then-gather rewrite")


class TestSpmdWarningGate:
    """VERDICT r3 weak #4: '[SPMD] Involuntary full rematerialization'
    must be a hard audit failure, not a log line nobody reads. The
    capture machinery snoops XLA's C++ stderr (raw fd 2) and the assert
    turns the warning into an AssertionError; dryrun_multichip wraps
    every leg in it (__graft_entry__._spmd_clean)."""

    def test_capture_reads_raw_fd2(self):
        import os

        from frameino_tpu.parallel import collective_audit as CA
        with CA.capture_spmd_warnings() as get:
            # C++ XLA logs bypass sys.stderr — write to the OS fd like
            # the partitioner does
            os.write(2, b"[SPMD] Involuntary full rematerialization X\n")
        assert "Involuntary full rematerialization" in get()

    def test_assert_fires_on_warning(self):
        from frameino_tpu.parallel import collective_audit as CA
        bad = ("W0819 spmd_partitioner.cc:652] [SPMD] Involuntary full "
               "rematerialization. The compiler cannot go from ...")
        with pytest.raises(AssertionError, match="rematerialization"):
            CA.assert_no_involuntary_remat(bad, name="leg")
        CA.assert_no_involuntary_remat("clean compile output", name="leg")

    def test_grad_constraint_keeps_cog_step_clean(self):
        """The regression this gate exists for: the Cog v-pred train
        step on a dp/fsdp/tp mesh emitted the remat warning on a [1, D]
        bias cotangent until the trainers pinned their gradients to the
        param specs (sharding.constrain_like_params)."""
        import numpy as np

        from frameino_tpu.core.meshes import MeshConfig, make_mesh
        from frameino_tpu.models import cogvideox_dit, cogvideox_vae
        from frameino_tpu.parallel import collective_audit as CA
        from frameino_tpu.parallel.sharding import shard_pytree
        from frameino_tpu.training import OptimizerConfig, make_optimizer
        from frameino_tpu.training.cog_trainer import (CogTrainerConfig,
                                                       make_cog_train_step)
        from frameino_tpu.training.trainer import init_train_state

        mesh = make_mesh(MeshConfig(dp=2, fsdp=2, tp=2, sp=1),
                         devices=jax.devices()[:8])
        cfg = cogvideox_dit.tiny_config(num_attention_heads=4,
                                        max_text_seq_length=8)
        vae_cfg = cogvideox_vae.tiny_vae_config()
        params = cogvideox_dit.init_cogvideox_dit(jax.random.key(4), cfg)
        vae_params = cogvideox_vae.init_cogvideox_vae(jax.random.key(5),
                                                      vae_cfg)
        B = 4
        ks = jax.random.split(jax.random.key(6), 5)
        batch = {
            "video_tensor": jax.random.normal(ks[0], (B, 9, 3, 16, 16)),
            "first_frame_tensor": jax.random.normal(ks[1], (B, 3, 16, 16)),
            "traj_tensor": jax.random.normal(ks[2], (B, 9, 3, 16, 16)),
            "ID_tensor": jax.random.normal(ks[3], (B, 1, 3, 16, 16)),
            "prompt_embeds": jax.random.normal(ks[4],
                                               (B, 8, cfg.text_embed_dim)),
        }
        tcfg = CogTrainerConfig(compute_dtype=jnp.float32, remat=True,
                                attn_impl="xla")
        opt = make_optimizer(OptimizerConfig(lr_warmup_steps=1))
        with CA.capture_spmd_warnings() as get:
            with mesh:
                state = init_train_state(shard_pytree(params, mesh), opt)
                step = make_cog_train_step(cfg, vae_cfg, tcfg, opt,
                                           mesh=mesh)
                state, metrics = step(state, vae_params, batch,
                                      jax.random.key(7))
                loss = float(metrics["loss"])
        assert np.isfinite(loss)
        CA.assert_no_involuntary_remat(get(), name="cog dp2/fsdp2/tp2")
