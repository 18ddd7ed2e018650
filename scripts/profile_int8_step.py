"""Device-op profile of the certified int8 denoise step (one v5e chip).

Captures a jax.profiler trace of the bench.py int8 step (49f@480x832
CFG pair, 4 denoise iterations per program) and prints the device-op
time breakdown — the int8 sibling of the r2 bf16 trace in ROADMAP.md.
Use it to verify the step stays anomaly-free (no unfused transposes /
stray fp32 conversions) after kernel or model changes.

Usage: python scripts/profile_int8_step.py [--bf16] [--trace_dir DIR]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_step(int8: bool):
    from frameino_tpu.models import wan_dit
    from frameino_tpu.schedulers.flow_match_euler import euler_step

    cfg = wan_dit.WAN22_TI2V_5B_MOTION
    shapes = jax.eval_shape(lambda k: wan_dit.init_wan_dit(k, cfg),
                            jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes)
    if int8:
        from frameino_tpu.models.quant import quantize_dit_int8
        params = quantize_dit_int8(params, donate=True)

    B, F, H, W = 1, 13, 30, 52
    N_ID, TEXT_LEN = 1, 512
    S_frame = (H // 2) * (W // 2)
    S_tokens = (F + N_ID) * S_frame
    z = cfg.out_channels
    id_lat = jnp.zeros((B, z, N_ID, H, W), jnp.float32)
    traj = jnp.zeros((B, z, F + N_ID, H, W), jnp.float32)
    text = jnp.zeros((2 * B, TEXT_LEN, cfg.text_dim), jnp.bfloat16)
    ts = jnp.full((2 * B,), 900.0, jnp.float32)
    mask = jnp.concatenate([jnp.zeros((2 * B, S_frame), jnp.float32),
                            jnp.ones((2 * B, S_tokens - S_frame),
                                     jnp.float32)], axis=1)
    latents = jnp.zeros((B, z, F, H, W), jnp.float32)

    @jax.jit
    def denoise_steps(params, latents):
        # hoisted text K/V, matching the serving pipeline and bench.py
        text_kv = wan_dit.precompute_text_kv(cfg, params, text)

        def body(lat, _):
            lat_in = jnp.concatenate([lat, id_lat], axis=2)
            lat_in = jnp.concatenate([lat_in, traj], axis=1)
            x = jnp.concatenate([lat_in, lat_in], axis=0).astype(jnp.bfloat16)
            pred = wan_dit.wan_dit_forward(cfg, params, x, ts, None,
                                           timestep_mask=mask,
                                           attn_impl="pallas",
                                           text_kv=text_kv)
            cond, uncond = jnp.split(pred, 2, axis=0)
            noise_pred = uncond + 5.0 * (cond - uncond)
            return euler_step(lat, noise_pred[:, :, :F], 0.9, 0.88), None

        lat, _ = jax.lax.scan(body, latents, None, length=4)
        return lat[0, 0, 0, 0, 0]

    return denoise_steps, params, latents


def parse_trace(trace_dir: str, top: int = 30):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace.json.gz found under", trace_dir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: pid whose process_name metadata mentions TPU/device
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "evice" in name:
                dev_pids.add(e["pid"])
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            # keep leaf op events only (XLA op names), skip step markers
            nm = e.get("name", "")
            if nm.startswith(("XLA Modules", "Steps", "XLA Ops")):
                continue
            by_name[nm] += e["dur"]
            total += e["dur"]
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])[:top]
    print(f"\ndevice-op breakdown ({total/1e3:.1f} ms total on device "
          f"tracks, top {top}):")
    for nm, dur in rows:
        print(f"  {dur/1e3:9.2f} ms  {100*dur/max(total,1e-9):5.1f}%  {nm[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--trace_dir", default="/tmp/int8_step_trace")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--parse_only", action="store_true")
    args = ap.parse_args()

    if args.parse_only:
        parse_trace(args.trace_dir, args.top)
        return

    step, params, latents = build_step(int8=not args.bf16)
    t0 = time.time()
    float(step(params, latents))          # compile + warm
    print(f"compile {time.time()-t0:.1f}s")
    t0 = time.time()
    float(step(params, latents))
    per = (time.time() - t0) / 4
    print(f"{per:.4f} s/step ({1/per:.3f} steps/s)")

    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir)
    float(step(params, latents))
    jax.profiler.stop_trace()
    parse_trace(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
