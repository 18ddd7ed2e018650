"""Device-op profile of the CogVideoX-5B FrameIn denoise step (one v5e).

VERDICT r3 weak #2: the Cog step sat ~25-30% under its analytic
roofline and no per-op trace existed. This captures a jax.profiler
trace of one CFG (batch-doubled) forward at the reference protocol
shape — 448x640x49f => latent 13x56x80 + 1 ID frame = 15,680 video
tokens + 226 text = 15,906 joint tokens
(test_code/run_cogvideox_FrameIn_mass_evaluation.py:46-51) — and
prints the device-op breakdown, reusing profile_int8_step's parser.

Usage: python scripts/profile_cog_step.py [--int8] [--shape 480x720]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from profile_int8_step import parse_trace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--shape", default="448x640",
                    help="pixel HxW (latent = /8, patch = /2)")
    ap.add_argument("--trace_dir", default="/tmp/cog_step_trace")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    from frameino_tpu.models import cogvideox_dit

    H, W = (int(v) for v in args.shape.split("x"))
    F_LAT, H_LAT, W_LAT = 13, H // 8, W // 8
    N_ID, TEXT_LEN, B = 1, 226, 2

    cfg = cogvideox_dit.COGVIDEOX_5B_I2V_FRAMEINO
    shapes = jax.eval_shape(
        lambda k: cogvideox_dit.init_cogvideox_dit(k, cfg),
        jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes)
    if args.int8:
        from frameino_tpu.models.quant import quantize_dit_int8
        params = quantize_dit_int8(params, donate=True)

    F = F_LAT + N_ID
    x = jnp.zeros((B, F, cfg.in_channels, H_LAT, W_LAT), jnp.bfloat16)
    text = jnp.zeros((B, TEXT_LEN, cfg.text_embed_dim), jnp.bfloat16)
    cos, sin = cogvideox_dit.cogvideox_rope(
        cfg, F_LAT, H_LAT, W_LAT, duplicate_first_frame_for_id=True)
    ts = jnp.full((B,), 500.0, jnp.float32)

    @jax.jit
    def denoise_steps(params, x):
        def body(carry, _):
            pred = cogvideox_dit.cogvideox_forward(
                cfg, params, carry, text, ts, image_rotary_emb=(cos, sin),
                attn_impl="pallas")
            nxt = carry - 0.1 * jnp.concatenate(
                [pred, pred, pred], axis=2)[:, :, :cfg.in_channels
                                            ].astype(carry.dtype)
            return nxt, None

        out, _ = jax.lax.scan(body, x, None, length=args.steps)
        return out[0, 0, 0, 0, 0]

    tokens = TEXT_LEN + F * (H_LAT // 2) * (W_LAT // 2)
    t0 = time.time()
    float(denoise_steps(params, x))
    print(f"compile {time.time()-t0:.1f}s ({tokens} joint tokens)")
    t0 = time.time()
    float(denoise_steps(params, x))
    per = (time.time() - t0) / args.steps
    print(f"{per:.4f} s/forward (CFG pair, {1/per:.3f} steps/s)")

    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir)
    float(denoise_steps(params, x))
    jax.profiler.stop_trace()
    parse_trace(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
