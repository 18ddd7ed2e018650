"""Worker process for tests/test_multihost.py — NOT a pytest module.

Runs one real multi-process training step: initializes jax.distributed
against the coordinator, builds the production mesh over the GLOBAL
device set, assembles its process-local batch shard into global arrays,
executes the sharded Wan train step, and prints the loss for the parent
to cross-check between processes.

Usage: python _multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from frameino_tpu.parallel import multihost  # noqa: E402  (pins platform)

multihost.initialize(f"127.0.0.1:{port}", nproc, pid, platform="cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from frameino_tpu.core.meshes import MeshConfig, make_mesh  # noqa: E402
from frameino_tpu.models import wan_dit, wan_vae  # noqa: E402
from frameino_tpu.training import (OptimizerConfig, TrainerConfig,  # noqa: E402
                                   make_optimizer, make_sharded_train_state,
                                   make_train_step)

assert jax.process_count() == nproc, jax.process_count()
n = jax.device_count()
local = jax.local_device_count()
print(f"proc {pid}: local={local} global={n}", flush=True)

# dp spans the processes (process-major device order); fsdp/tp intra-process
mcfg = MeshConfig(dp=nproc, fsdp=local // 2, tp=2, sp=1)
mesh = make_mesh(mcfg)

vae_cfg = wan_vae.WanVAEConfig(
    base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
    temperal_downsample=(True,), is_residual=False, patch_size=None,
    scale_factor_temporal=2, scale_factor_spatial=2,
    latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4))
dit_cfg = wan_dit.WanDiTConfig(
    num_attention_heads=4, attention_head_dim=24, in_channels=8,
    out_channels=4, text_dim=32, freq_dim=32, ffn_dim=128, num_layers=2)
tcfg = TrainerConfig(compute_dtype=jnp.float32, remat=True, attn_impl="xla")
opt = make_optimizer(OptimizerConfig(lr_warmup_steps=1))

# identical params everywhere (same seed — the pod-standard init
# contract); per-process DIFFERENT batch shard, globally deterministic
dit_params = wan_dit.init_wan_dit(jax.random.key(0), dit_cfg)
vae_params = wan_vae.init_wan_vae(jax.random.key(1), vae_cfg)

B_global = 2 * nproc
B_local = B_global // nproc
F_, H_, W_ = 5, 16, 16
rng = np.random.default_rng(1234)            # same stream on every proc
full = {
    "video_tensor": rng.normal(size=(B_global, F_, 3, H_, W_)),
    "first_frame_tensor": rng.normal(size=(B_global, 3, H_, W_)),
    "traj_tensor": rng.normal(size=(B_global, F_, 3, H_, W_)),
    "ID_tensor": rng.normal(size=(B_global, 1, 3, H_, W_)),
    "prompt_embeds": rng.normal(size=(B_global, 8, dit_cfg.text_dim)),
}
local_batch = {k: v[pid * B_local:(pid + 1) * B_local].astype(np.float32)
               for k, v in full.items()}

with mesh:
    batch = multihost.global_batch(mesh, local_batch, B_global)
    state = make_sharded_train_state(dit_params, opt, mesh)
    step = make_train_step(dit_cfg, vae_cfg, tcfg, opt, mesh=mesh,
                           dp_size=mcfg.dp)
    state, metrics = step(state, vae_params, batch, jax.random.key(3))
    state, metrics = step(state, vae_params, batch, jax.random.key(3))
    loss = float(metrics["loss"])
    multihost.assert_same_across_processes(mesh, loss)

assert np.isfinite(loss), loss
print(f"proc {pid}: MULTIHOST_LOSS={loss:.6f}", flush=True)

# ---------------------------------------------------------------------------
# pp-across-DCN leg: pp's stated purpose is multi-slice stage placement
# (parallel/pipeline.py) — stages map to PROCESSES (make_mesh places pp
# outermost; device order is process-major), so only the GPipe
# microbatch activations cross the inter-process link while fsdp/tp
# collectives stay intra-process.
mcfg_pp = MeshConfig(dp=1, fsdp=local // 2, tp=2, sp=1, pp=nproc)
mesh_pp = make_mesh(mcfg_pp)
stage_procs = {d.process_index for d in mesh_pp.devices[0, 0, 0, 0, :]}
assert len(stage_procs) == nproc, (
    "pp axis must span the processes (one stage per host)",
    mesh_pp.devices)

dit_params = wan_dit.init_wan_dit(jax.random.key(0), dit_cfg)
vae_params = wan_vae.init_wan_vae(jax.random.key(1), vae_cfg)
# dp=1 on this mesh: the batch axis is sharded only over the
# INTRA-process fsdp axis, so every process must supply the full batch
full_f32 = {k: v.astype(np.float32) for k, v in full.items()}
with mesh_pp:
    batch_pp = multihost.global_batch(mesh_pp, full_f32, B_global)
    state = make_sharded_train_state(dit_params, opt, mesh_pp)
    step = make_train_step(dit_cfg, vae_cfg, tcfg, opt, mesh=mesh_pp,
                           dp_size=1)
    state, metrics = step(state, vae_params, batch_pp, jax.random.key(3))
    loss_pp = float(metrics["loss"])
    multihost.assert_same_across_processes(mesh_pp, loss_pp)

assert np.isfinite(loss_pp), loss_pp
print(f"proc {pid}: MULTIHOST_PP_LOSS={loss_pp:.6f}", flush=True)
