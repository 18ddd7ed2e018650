"""Benchmark the TPU-native perception stack at released-model scale.

Runs randomly-initialized full-size graphs (weights change the numbers
by nothing — these are shape benchmarks) on the default backend:

- SAM2.1-hiera-large image encoder @ 1024x1024 (the per-frame cost of
  VSeg-MAE video propagation) + one propagation step (memory attention
  over a full 7-slot bank + SAM heads + memory encoder),
- DINOv2 ViT-B/14 @ 224 (Relative-DINO embedder),
- Qwen2.5-VL vision tower at the judge's 360x420x2-frame grid,
- CoTracker3-offline, one 49-frame track call at the eval protocol
  shape (the INO_Traj metric runs this TWICE per instance,
  evaluate_INO_Traj.py:194-216),
- OneFormer Swin-L panoptic @ 480x832 via the preprocess step-4
  adapter (detectron2 shortest-edge-800 test policy).

Prints one human line per model on stderr and ONE JSON summary line on
stdout (PERCEPTION_r0N artifact). Timing follows the repo convention:
fetch a scalar to force execution (block_until_ready does not
synchronize on the tunneled TPU).

Usage: python scripts/bench_perception.py [--only dinov2,sam2,...]
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

RESULTS = {}


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
          f"{t * 1e3:.1f} ms/frame", file=sys.stderr)
    RESULTS["sam2_encoder_ms_per_frame"] = round(t * 1e3, 1)
    RESULTS["sam2_encoder_compile_s"] = round(c, 1)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (8, 480, 640, 3)).astype(np.uint8)
    state = pred.init_state(frames)
    pred.add_new_points(state, 0, np.array([[320.0, 240.0]]),
                        np.array([1]))
    t0 = time.time()
    masks = dict(pred.propagate_in_video(state))
    prop_s = time.time() - t0
    assert len(masks) == 8
    t0 = time.time()
    state2 = pred.init_state(frames)
    pred.add_new_points(state2, 0, np.array([[320.0, 240.0]]),
                        np.array([1]))
    _ = dict(pred.propagate_in_video(state2))
    prop2 = time.time() - t0
    print(f"sam2.1 video propagate (8 frames incl. cond): "
          f"first {prop_s:.1f}s, cached {prop2:.2f}s "
          f"({prop2 / 8 * 1e3:.0f} ms/frame)", file=sys.stderr)
    RESULTS["sam2_propagate_ms_per_frame"] = round(prop2 / 8 * 1e3, 1)
    RESULTS["sam2_propagate_first_s"] = round(prop_s, 1)


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
          f"{t * 1e3:.1f} ms ({t / 8 * 1e3:.2f} ms/img)", file=sys.stderr)
    RESULTS["dinov2_ms_per_img_b8"] = round(t / 8 * 1e3, 2)
    RESULTS["dinov2_compile_s"] = round(c, 1)
    # the Relative_DINO metric embeds one crop at a time (2x49+1 calls
    # per instance) — measure the batch-1 latency it actually pays
    x1 = jnp.zeros((1, 224, 224, 3), jnp.float32)
    c1, t1 = timeit(fwd, params, x1)
    print(f"dinov2-vitb14 224^2 batch 1: compile {c1:.1f}s, "
          f"{t1 * 1e3:.2f} ms/img", file=sys.stderr)
    RESULTS["dinov2_ms_per_img_b1"] = round(t1 * 1e3, 2)


def bench_qwen_tower():
    from frameino_tpu.models.qwen_vl import (QWEN25_VL_32B,
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
          f"compile {c:.1f}s, {t * 1e3:.1f} ms", file=sys.stderr)
    RESULTS["qwen_vision_tower_ms"] = round(t * 1e3, 1)
    RESULTS["qwen_vision_tower_compile_s"] = round(c, 1)


def bench_cotracker():
    """One 49-frame track call at the eval-protocol shape — the
    INO_Traj metric's unit of work (it runs this twice per instance:
    gen tracks + gt tracks). 8 query points (the fixture's count;
    cost is nearly flat in N until N ~ hundreds: the updateformer
    runs over N virtual tracks x 49 frames)."""
    from frameino_tpu.models.cotracker import (COTRACKER3_OFFLINE,
                                               init_cotracker,
                                               make_tracker_adapter)
    cfg = COTRACKER3_OFFLINE
    params = init_cotracker(jax.random.key(0), cfg)
    track = make_tracker_adapter(params, cfg)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (49, 448, 640, 3)).astype(np.uint8)
    queries = np.array([[100.0 + 30 * i, 120.0 + 10 * i]
                        for i in range(8)], np.float32)
    t0 = time.time()
    out = track(frames, queries)
    first = time.time() - t0
    assert out.shape == (49, 8, 2)
    times = []
    for _ in range(3):
        t0 = time.time()
        track(frames, queries)
        times.append(time.time() - t0)
    t = min(times)
    print(f"cotracker3-offline 49f@448x640 x8 queries: compile+first "
          f"{first:.1f}s, {t:.2f} s/track-call", file=sys.stderr)
    RESULTS["cotracker_49f_track_s"] = round(t, 2)
    RESULTS["cotracker_compile_s"] = round(first, 1)


def bench_oneformer():
    """Preprocess step-4 panoptic cost: OneFormer Swin-L through the
    pipeline adapter (shortest-edge-800 test policy), one 480x832
    frame (the curation clip resolution)."""
    from frameino_tpu.models.oneformer import init_oneformer
    from frameino_tpu.preprocess.panoptic_oneformer import \
        OneFormerSegmenter
    params = init_oneformer(jax.random.key(0))
    seg = OneFormerSegmenter(params)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (480, 832, 3)).astype(np.uint8)
    t0 = time.time()
    seg.panoptic(frame)
    first = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        seg.panoptic(frame)
        times.append(time.time() - t0)
    t = min(times)
    print(f"oneformer swin-L panoptic 480x832 (800-edge): compile+first "
          f"{first:.1f}s, {t * 1e3:.0f} ms/frame", file=sys.stderr)
    RESULTS["oneformer_ms_per_frame"] = round(t * 1e3, 0)
    RESULTS["oneformer_compile_s"] = round(first, 1)


BENCHES = {
    "dinov2": bench_dinov2,
    "qwen": bench_qwen_tower,
    "cotracker": bench_cotracker,
    "sam2": bench_sam2,
    "oneformer": bench_oneformer,
}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help=f"comma list from {sorted(BENCHES)}")
    args = ap.parse_args()
    names = args.only.split(",") if args.only else list(BENCHES)
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    for name in names:
        # one leg's failure (e.g. a tunnel drop during a long remote
        # compile — observed twice on the OneFormer Swin-L program)
        # must not discard every other leg's numbers: record the error
        # and keep going. Retry once — the tunnel recovers.
        for attempt in (1, 2):
            try:
                BENCHES[name]()
                RESULTS.pop(f"{name}_error", None)
                break
            except Exception as e:  # noqa: BLE001
                print(f"LEG FAILED ({name}, attempt {attempt}): "
                      f"{type(e).__name__}: {str(e)[:200]}",
                      file=sys.stderr)
                RESULTS[f"{name}_error"] = f"{type(e).__name__}: " \
                                           f"{str(e)[:120]}"
    print(json.dumps({
        "metric": "perception_stack_latencies_tpu",
        "unit": "per-model compile + steady latencies (released scale, "
                "random weights — shape benchmarks)",
        "backend": jax.default_backend(),
        "value": RESULTS,
    }))
