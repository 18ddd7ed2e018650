#!/usr/bin/env python
"""Wan2.2 Stage-2 FrameINO TRAIN-step benchmark on the physical TPU chip.

VERDICT r3 missing #1: every prior bench artifact was serving-side; the
trainer (in-graph frozen-VAE encodes, remat over the scanned blocks,
AdamW + global-norm clip in one jit program) had only ever run on
virtual CPU meshes. This measures the exact ``make_train_step`` program
(frameino_tpu/training/trainer.py) at full 5B dims (3072 wide, 24x128
heads, ffn 14336) with a reduced layer count that fits a single 16 GB
v5e chip, then projects the per-block slope to the full 30 blocks.

Reference hot loop being reproduced: ``train_code/
train_wan_motion_FrameINO.py:1128-1253`` (4xA100 DDP per
``config/accelerate_config_4GPU.json``; grad checkpointing required even
at 80 GB per ``config/train_wan_motion_FrameINO.yaml:68``).

Layer-count scaling: step(L) = a + b*L is linear in L (one scanned
block body), so two measured counts give the slope b and the full-model
projection t30 = t(L0) + (30-L0)*b. The fixed cost ``a`` contains the
three in-graph VAE encodes + patch/unpatch + optimizer bookkeeping and
is measured, not assumed. Memory-wise one chip cannot hold 30 blocks of
fp32 master state (5B x 16 B/param = 80 GB -> exactly the v5e-8 fsdp
target in BASELINE.md); the projection is about TIME and MFU.

Usage:
  python scripts/bench_train.py                 # 480x832x49f, blocks 2,4
  python scripts/bench_train.py --flagship      # 704x1280x81f seq,
                                                #   precomputed latents
  python scripts/bench_train.py --state_dtype bf16 --blocks 2,6
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from frameino_tpu.core.flops import count_flops, device_peak_flops
from frameino_tpu.models import wan_dit, wan_vae
from frameino_tpu.training import (OptimizerConfig, TrainerConfig,
                                   init_train_state, make_optimizer,
                                   make_train_step)

# v5e peak: 197 TFLOP/s bf16 (394 TOP/s int8)
V5E_PEAK_BF16 = 197e12
FULL_LAYERS = 30


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--blocks", default="2,4",
                   help="comma list of layer counts to measure")
    p.add_argument("--state_dtype", default="fp32", choices=["fp32", "bf16"],
                   help="master param + Adam moment dtype (reference full "
                        "finetune = fp32 master weights under bf16 autocast)")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--frames", type=int, default=49)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=3, help="timed steps per L")
    p.add_argument("--no_vae", action="store_true",
                   help="precomputed latents (skip in-graph VAE encodes)")
    p.add_argument("--flagship", action="store_true",
                   help="reference train shape 704x1280x81f "
                        "(config/train_wan_motion_FrameINO.yaml:22-26); "
                        "implies --no_vae on one 16G chip")
    return p.parse_args()


def zeros_tree(shapes, dtype):
    return jax.tree.map(lambda s: jnp.zeros(s.shape, dtype), shapes)


def build_batch(args, vae_cfg, dit_cfg, key):
    B, F, H, W = args.batch, args.frames, args.height, args.width
    ks = jax.random.split(key, 6)
    if args.no_vae:
        f_lat = 1 + (F - 1) // vae_cfg.scale_factor_temporal
        h_lat = H // vae_cfg.scale_factor_spatial
        w_lat = W // vae_cfg.scale_factor_spatial
        z = vae_cfg.z_dim
        return {
            "video_latents": jax.random.normal(
                ks[0], (B, z, f_lat, h_lat, w_lat), jnp.bfloat16),
            "first_frame_latent": jax.random.normal(
                ks[1], (B, z, 1, h_lat, w_lat), jnp.bfloat16),
            "traj_latents": jax.random.normal(
                ks[2], (B, z, f_lat, h_lat, w_lat), jnp.bfloat16),
            "id_latents": jax.random.normal(
                ks[3], (B, z, 1, h_lat, w_lat), jnp.bfloat16),
            "prompt_embeds": jax.random.normal(
                ks[4], (B, 512, dit_cfg.text_dim), jnp.bfloat16),
        }
    return {
        "video_tensor": jax.random.normal(ks[0], (B, F, 3, H, W),
                                          jnp.bfloat16),
        "first_frame_tensor": jax.random.normal(ks[1], (B, 3, H, W),
                                                jnp.bfloat16),
        "traj_tensor": jax.random.normal(ks[2], (B, F, 3, H, W),
                                         jnp.bfloat16),
        "ID_tensor": jax.random.normal(ks[3], (B, 1, 3, H, W), jnp.bfloat16),
        "prompt_embeds": jax.random.normal(ks[4], (B, 512, dit_cfg.text_dim),
                                           jnp.bfloat16),
    }


def peak_hbm_gb():
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    return round(peak / 2**30, 2) if peak else None


def static_hbm_gb(compiled):
    """Compiler-estimated HBM footprint of the executable — the fallback
    for the tunneled platform where device memory_stats() is empty
    (TRAIN_BENCH_r04's silent null). arguments + outputs - aliased
    (donated buffers overlap) + temps."""
    try:
        m = compiled.memory_analysis()
        total = (m.argument_size_in_bytes + m.output_size_in_bytes
                 - m.alias_size_in_bytes + m.temp_size_in_bytes)
        return round(total / 2**30, 2)
    except Exception:
        return None


def struct_tree(shapes, dtype=None):
    return jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(
            s.shape, dtype if dtype is not None else s.dtype), shapes)


def analytic_flops(args, layers, dtype):
    """Executed (HFU numerator) and model (MFU numerator) FLOPs of the
    train step at the given layer count, by abstract tracing — correct
    under lax.scan, unlike XLA cost_analysis which counts the scanned
    block body once regardless of trip count (the r4 bug: L=2 and L=4
    programs 'differed' by 6.5 GFLOP where two blocks are ~1.5e13).

    model flops = the remat=False trace (fwd + 2x bwd, no recompute
    credit — the conventional MFU numerator); executed flops = the
    remat=True trace, whose jaxpr contains the recompute explicitly.
    No allocation happens (ShapeDtypeStruct args), so this runs at
    L=30 even though one chip cannot hold the 30-block fp32 state.
    """
    dit_cfg = dataclasses.replace(wan_dit.WAN22_TI2V_5B_MOTION,
                                  num_layers=layers)
    vae_cfg = wan_vae.WAN22_VAE_CONFIG
    opt = make_optimizer(OptimizerConfig())

    dit_struct = struct_tree(jax.eval_shape(
        lambda k: wan_dit.init_wan_dit(k, dit_cfg), jax.random.key(0)), dtype)
    state_struct = jax.eval_shape(lambda p: init_train_state(p, opt),
                                  dit_struct)
    vae_struct = None
    if not args.no_vae:
        vae_struct = struct_tree(jax.eval_shape(
            lambda k: wan_vae.init_wan_vae(k, vae_cfg), jax.random.key(1)),
            jnp.bfloat16)
    batch_struct = jax.eval_shape(
        lambda k: build_batch(args, vae_cfg, dit_cfg, k), jax.random.key(2))
    key_struct = jax.eval_shape(lambda: jax.random.key(3))

    out = {}
    for name, remat in (("executed", True), ("model", False)):
        # attn_impl="xla" for the COUNTING trace only: identical math to
        # the pallas kernel the timed step runs, but the QK^T/PV dots
        # are visible dot_generals instead of being buried inside a
        # pallas_call whose in-kernel kv loop the counter can't unroll
        step = make_train_step(
            dit_cfg, vae_cfg,
            TrainerConfig(remat=remat, attn_impl="xla"), opt)
        r = count_flops(step, state_struct, vae_struct, batch_struct,
                        key_struct)
        assert r.while_loops == 0, "unbounded loop on the train hot path"
        out[name] = r.flops
    return out


def measure(args, layers, dtype):
    dit_cfg = dataclasses.replace(wan_dit.WAN22_TI2V_5B_MOTION,
                                  num_layers=layers)
    vae_cfg = wan_vae.WAN22_VAE_CONFIG
    tcfg = TrainerConfig(remat=True)
    opt = make_optimizer(OptimizerConfig())

    dit_params = zeros_tree(jax.eval_shape(
        lambda k: wan_dit.init_wan_dit(k, dit_cfg), jax.random.key(0)), dtype)
    n_params = sum(x.size for x in jax.tree.leaves(dit_params))
    vae_params = None
    if not args.no_vae:
        vae_params = zeros_tree(jax.eval_shape(
            lambda k: wan_vae.init_wan_vae(k, vae_cfg), jax.random.key(1)),
            jnp.bfloat16)

    state = init_train_state(dit_params, opt)
    step = make_train_step(dit_cfg, vae_cfg, tcfg, opt)
    batch = build_batch(args, vae_cfg, dit_cfg, jax.random.key(2))
    key = jax.random.key(3)

    compiled = None
    try:
        compiled = step.lower(state, vae_params, batch, key).compile()
    except Exception:
        pass

    t0 = time.time()
    state, m = step(state, vae_params, batch, key)
    float(m["loss"])
    compile_s = time.time() - t0
    times = []
    for _ in range(args.steps):
        t0 = time.time()
        state, m = step(state, vae_params, batch, key)
        float(m["loss"])
        times.append(time.time() - t0)
    flops = analytic_flops(args, layers, dtype)
    return {
        "layers": layers,
        "step_s": min(times),
        "compile_s": round(compile_s, 1),
        "params_b": round(n_params / 1e9, 3),
        "executed_flops": flops["executed"],
        "model_flops": flops["model"],
        "peak_hbm_gb": peak_hbm_gb(),
        "static_hbm_gb": static_hbm_gb(compiled) if compiled else None,
    }


def main():
    args = parse_args()
    if args.flagship:
        args.height, args.width, args.frames = 704, 1280, 81
        args.no_vae = True
    dtype = jnp.float32 if args.state_dtype == "fp32" else jnp.bfloat16
    layer_counts = [int(x) for x in args.blocks.split(",")]

    results = [measure(args, L, dtype) for L in layer_counts]
    for r in results:
        print(f"# L={r['layers']}: {r['step_s']:.3f} s/step "
              f"(compile {r['compile_s']}s, {r['params_b']}B params, "
              f"peak HBM {r['peak_hbm_gb']} GB, "
              f"static HBM {r['static_hbm_gb']} GB, "
              f"model {r['model_flops'] / 1e12:.1f} TFLOP / "
              f"executed {r['executed_flops'] / 1e12:.1f} TFLOP)",
              file=sys.stderr)

    peak = device_peak_flops()
    out = {
        "metric": "wan22_stage2_train_step_sec_tpu"
                  + ("_flagship" if args.flagship else ""),
        "unit": (f"seconds/step (B={args.batch}, {args.frames}f@"
                 f"{args.height}x{args.width}, 5B dims, "
                 f"{'latents precomputed' if args.no_vae else 'in-graph VAE encodes'}, "
                 f"remat, AdamW {args.state_dtype} state)"),
        "flops_note": ("analytic jaxpr count (core/flops.py), scan bodies "
                       "x trip count; model=remat-free fwd+2bwd (MFU "
                       "numerator), executed=remat trace (HFU numerator); "
                       "XLA cost_analysis is NOT used — it counts scanned "
                       "bodies once (r4 bug)"),
        "device_peak_tflops": round(peak / 1e12, 1),
        "measured": results,
    }
    if len(results) >= 2:
        l0, l1 = results[0], results[-1]
        dL = l1["layers"] - l0["layers"]
        slope = (l1["step_s"] - l0["step_s"]) / dL
        t_full = l0["step_s"] + (FULL_LAYERS - l0["layers"]) * slope
        out["per_block_s"] = round(slope, 4)
        out["projected_30block_step_s"] = round(t_full, 3)
        out["value"] = round(t_full, 3)
        # analytic flops at the FULL layer count — traced directly at
        # L=30 (abstract, no allocation), not extrapolated
        f30 = analytic_flops(args, FULL_LAYERS, dtype)
        out["model_tflops_30block"] = round(f30["model"] / 1e12, 1)
        out["executed_tflops_30block"] = round(f30["executed"] / 1e12, 1)
        out["projected_mfu"] = round(f30["model"] / t_full / peak, 3)
        out["projected_hfu"] = round(f30["executed"] / t_full / peak, 3)
        # measured-L MFU/HFU too (no time projection involved)
        out["measured_mfu"] = round(
            l1["model_flops"] / l1["step_s"] / peak, 3)
        out["measured_hfu"] = round(
            l1["executed_flops"] / l1["step_s"] / peak, 3)
        # sanity: per-block flops from the L-delta must match the
        # L=30 total built from the same slope (linearity check)
        per_block_model = (l1["model_flops"] - l0["model_flops"]) / dL
        out["per_block_model_tflops"] = round(per_block_model / 1e12, 2)
    else:
        out["value"] = results[0]["step_s"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
