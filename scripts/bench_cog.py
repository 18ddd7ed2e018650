"""CogVideoX-5B FrameINO denoise-step benchmark on one TPU chip.

Counterpart of bench.py for the second model family: 42-layer dim-3072
joint [text; video] DiT at the paper eval shape (49f @ 480x720 ->
13 latent frames x 30x45 patches = 17,550 video tokens + 226 text
tokens, + 1,350 ID-frame tokens with use_FrameIn). CFG is batch-doubled
(one call on 2B) exactly like the reference pipeline
(pipeline_cogvideox_i2v_motion_FrameINO.py:856-896).

Usage: python scripts/bench_cog.py [--int8] [--batch1]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from frameino_tpu.models import cogvideox_dit

F_LAT, H_LAT, W_LAT = 13, 60, 90      # latent frames, latent h/w (480x720/8)
N_ID = 1
TEXT_LEN = 226
STEPS = 2
CALLS = 3


def main():
    int8 = "--int8" in sys.argv
    B = 1 if "--batch1" in sys.argv else 2    # 2 = CFG batch-doubled
    cfg = cogvideox_dit.COGVIDEOX_5B_I2V_FRAMEINO
    shapes = jax.eval_shape(
        lambda k: cogvideox_dit.init_cogvideox_dit(k, cfg),
        jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes)
    if int8:
        from frameino_tpu.models.quant import quantize_dit_int8
        # donate: the bf16 originals free as quantization runs
        params = quantize_dit_int8(params, donate=True)

    F = F_LAT + N_ID
    x = jnp.zeros((B, F, cfg.in_channels, H_LAT, W_LAT), jnp.bfloat16)
    text = jnp.zeros((B, TEXT_LEN, cfg.text_embed_dim), jnp.bfloat16)
    cos, sin = cogvideox_dit.cogvideox_rope(
        cfg, F_LAT, H_LAT, W_LAT, duplicate_first_frame_for_id=True)
    ts = jnp.full((B,), 500.0, jnp.float32)

    @jax.jit
    def denoise_steps(params, x, ts, text):
        def body(carry, _):
            pred = cogvideox_dit.cogvideox_forward(
                cfg, params, carry, text, ts, image_rotary_emb=(cos, sin),
                attn_impl="pallas")
            # v-pred step surrogate keeping the loop data-dependent
            nxt = carry - 0.1 * jnp.concatenate(
                [pred, pred, pred], axis=2)[:, :, :cfg.in_channels
                                            ].astype(carry.dtype)
            return nxt, None

        out, _ = jax.lax.scan(body, x, None, length=STEPS)
        return out[0, 0, 0, 0, 0]

    t0 = time.time()
    float(denoise_steps(params, x, ts, text))
    compile_s = time.time() - t0
    times = []
    for _ in range(CALLS):
        t0 = time.time()
        float(denoise_steps(params, x, ts, text))
        times.append(time.time() - t0)
    per_call = min(times) / STEPS
    # a "step" = one CFG pair; batch-doubled covers it in one forward
    per_step = per_call if B == 2 else per_call * 2
    tokens = TEXT_LEN + F * (H_LAT // 2) * (W_LAT // 2)
    print(json.dumps({
        "metric": "cogvideox_5b_frameino_denoise_steps_per_sec_per_chip"
                  + ("_int8" if int8 else ""),
        "value": round(1.0 / per_step, 4),
        "unit": f"steps/sec (CFG pair, 49f@480x720, {tokens} joint "
                f"tokens, batch {B})",
    }))
    print(f"# compile={compile_s:.1f}s per-forward={per_call:.3f}s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
