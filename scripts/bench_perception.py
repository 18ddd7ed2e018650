"""Benchmark the TPU-native perception stack at released-model scale.

Runs randomly-initialized full-size graphs (weights change the numbers
by nothing — these are shape benchmarks) on the default backend:

- SAM2.1-hiera-large image encoder @ 1024x1024 (the per-frame cost of
  VSeg-MAE video propagation) + one propagation step (memory attention
  over a full 7-slot bank + SAM heads + memory encoder),
- DINOv2 ViT-B/14 @ 224 (Relative-DINO embedder),
- Qwen2.5-VL vision tower at the judge's 360x420x2-frame grid.

Prints one line per model: compile time and steady-state latency.
Timing follows the repo convention: fetch a scalar to force execution
(block_until_ready does not synchronize on the tunneled TPU).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timeit(fn, *args, iters=3):
    t0 = time.time()
    out = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    compile_s = time.time() - t0
    times = []
    for _i in range(iters):
        t0 = time.time()
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        times.append(time.time() - t0)
    return compile_s, min(times)


def bench_sam2():
    from frameino_tpu.models.sam2 import SAM21_HIERA_LARGE, init_sam2
    from frameino_tpu.models.sam2_video import Sam2VideoPredictor
    cfg = SAM21_HIERA_LARGE
    params = init_sam2(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == jnp.float32 else x, params)
    pred = Sam2VideoPredictor(params, cfg)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3),
                    jnp.bfloat16)
    c, t = timeit(lambda x: pred._encode(params, x), img)
    print(f"sam2.1-hiera-L encoder 1024^2: compile {c:.1f}s, "
          f"{t * 1e3:.1f} ms/frame")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (3, 480, 640, 3)).astype(np.uint8)
    state = pred.init_state(frames)
    pred.add_new_points(state, 0, np.array([[320.0, 240.0]]),
                        np.array([1]))
    t0 = time.time()
    masks = dict(pred.propagate_in_video(state))
    prop_s = time.time() - t0
    assert len(masks) == 3
    t0 = time.time()
    state2 = pred.init_state(frames)
    pred.add_new_points(state2, 0, np.array([[320.0, 240.0]]),
                        np.array([1]))
    _ = dict(pred.propagate_in_video(state2))
    prop2 = time.time() - t0
    print(f"sam2.1 video propagate (3 frames incl. cond): "
          f"first {prop_s:.1f}s, cached {prop2:.2f}s "
          f"({prop2 / 3 * 1e3:.0f} ms/frame)")


def bench_dinov2():
    from frameino_tpu.models.dinov2 import (DINOV2_VITB14,
                                            dinov2_forward, init_dinov2,
                                            interpolate_pos_embed)
    cfg = DINOV2_VITB14
    params = init_dinov2(jax.random.key(0), cfg)
    pe = jnp.asarray(interpolate_pos_embed(
        np.asarray(params["pos_embed"]), (16, 16), cfg))
    fwd = jax.jit(lambda p, x: dinov2_forward(p, x, cfg, pos_embed=pe))
    x = jnp.zeros((8, 224, 224, 3), jnp.float32)
    c, t = timeit(fwd, params, x)
    print(f"dinov2-vitb14 224^2 batch 8: compile {c:.1f}s, "
          f"{t * 1e3:.1f} ms ({t / 8 * 1e3:.2f} ms/img)")


def bench_qwen_tower():
    from frameino_tpu.models.qwen_vl import (QWEN25_VL_32B,
                                             qwen_vl_from_state_dict,
                                             qwen_vision_forward,
                                             vision_layout)
    # random full-size vision tower built directly (no LLM needed)
    cfg = QWEN25_VL_32B.vision
    key = jax.random.key(0)

    def nrm(*shape):
        nonlocal key
        key, k = jax.random.split(key)
        return 0.02 * jax.random.normal(k, shape, jnp.bfloat16)

    blocks = []
    d, hd3 = cfg.hidden_size, cfg.hidden_size * 3
    for _ in range(cfg.depth):
        blocks.append({
            "n1w": jnp.ones(d, jnp.bfloat16),
            "n2w": jnp.ones(d, jnp.bfloat16),
            "attn": {"qkv_w": nrm(d, hd3), "qkv_b": nrm(hd3),
                     "proj_w": nrm(d, d), "proj_b": nrm(d)},
            "mlp": {"gate_w": nrm(d, cfg.intermediate_size),
                    "gate_b": nrm(cfg.intermediate_size),
                    "up_w": nrm(d, cfg.intermediate_size),
                    "up_b": nrm(cfg.intermediate_size),
                    "down_w": nrm(cfg.intermediate_size, d),
                    "down_b": nrm(d)}})
    mu = cfg.merge_unit
    params = {"visual": {
        "patch_w": nrm(3 * cfg.temporal_patch_size * cfg.patch_size ** 2,
                       d),
        "blocks": blocks,
        "merger_lnq_w": jnp.ones(d, jnp.bfloat16),
        "merger_w1": nrm(d * mu, d * mu), "merger_b1": nrm(d * mu),
        "merger_w2": nrm(d * mu, cfg.out_hidden_size),
        "merger_b2": nrm(cfg.out_hidden_size)}}
    # judge shape: 2 temporal groups of 360x420 -> 26x30 patches
    grid = (2, 26, 30)
    S = grid[0] * grid[1] * grid[2]
    layout = vision_layout(grid, cfg)
    pixels = jnp.zeros(
        (S, 3 * cfg.temporal_patch_size * cfg.patch_size ** 2),
        jnp.bfloat16)
    fwd = jax.jit(lambda p, x: qwen_vision_forward(p, x, layout, cfg))
    c, t = timeit(fwd, params, pixels)
    print(f"qwen2.5-vl vision tower {grid} ({S} patches): "
          f"compile {c:.1f}s, {t * 1e3:.1f} ms")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    bench_dinov2()
    bench_qwen_tower()
    bench_sam2()
