#!/usr/bin/env python
"""Serving entry: load checkpoints, start the HTTP API.

Usage:
    python scripts/serve.py --transformer <dir> --vae <dir> \
        [--text_encoder <dir>] [--quantize int8] [--port 8188] \
        [--family wan|cogvideox] [--smoke]

``--smoke`` serves tiny random-init models on CPU (integration tests /
API exploration without checkpoints).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--transformer", default=None)
    p.add_argument("--vae", default=None)
    p.add_argument("--family", choices=["wan", "cogvideox"], default="wan")
    p.add_argument("--text_encoder", default=None)
    p.add_argument("--quantize", choices=["int8"], default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8188)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--random_init", action="store_true",
                   help="serve FULL-SIZE random-init weights (no "
                        "checkpoint) — outputs are noise; for compile/"
                        "latency benchmarking of the real serving "
                        "surface only (scripts/bench_warm_start.py)")
    p.add_argument("--bucket_grid", type=int, default=64,
                   help="round request H/W up to this grid (multiple of "
                        "32) so requests land on precompiled shapes; 0 "
                        "disables bucketing (every new shape pays a "
                        "13-17 s XLA compile)")
    p.add_argument("--frame_grid", type=int, default=None,
                   help="optional frame-count lattice coarsening "
                        "(multiple of the VAE temporal ratio)")
    p.add_argument("--compilation_cache_dir", default="auto",
                   help="persistent XLA compilation cache dir; 'auto' = "
                        "~/.cache/frameino_tpu/xla_cache, 'off' disables")
    p.add_argument("--warmup", default=None,
                   help="comma-separated HxWxF[:steps] shapes to "
                        "precompile before binding the port, e.g. "
                        "'480x832x81,448x640x49:50'")
    p.add_argument("--warmup_only", action="store_true",
                   help="exit after --warmup instead of binding the "
                        "port, printing one 'WARMSTART_JSON: {...}' "
                        "line with per-shape first-request seconds "
                        "(scripts/bench_warm_start.py drives this "
                        "twice — cold process, then restarted warm "
                        "process — to prove the persistent cache)")
    return p.parse_args()


def build_pipeline(args):
    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    from frameino_tpu.models import pretrained

    if args.family == "wan":
        from frameino_tpu.models import wan_dit, wan_vae
        from frameino_tpu.pipelines.wan_i2v import (WanImageToVideoPipeline,
                                                    WanPipelineConfig)
        if args.smoke:
            vae_cfg = wan_vae.WanVAEConfig(
                base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                temperal_downsample=(True,), is_residual=False,
                scale_factor_temporal=2, scale_factor_spatial=2,
                latents_mean=(0.0,) * 4, latents_std=(1.0,) * 4)
            dit_cfg = wan_dit.tiny_config(in_channels=8, out_channels=4)
            key = jax.random.key(0)
            dit_params = wan_dit.init_wan_dit(key, dit_cfg)
            vae_params = wan_vae.init_wan_vae(jax.random.fold_in(key, 1),
                                              vae_cfg)
        elif args.random_init:
            print("WARNING: --random_init serves RANDOM weights — "
                  "outputs are noise (latency benchmarking only)")
            vae_cfg = wan_vae.WAN22_VAE_CONFIG
            dit_cfg = wan_dit.WAN22_TI2V_5B_MOTION
            key = jax.random.key(0)
            dit_params = jax.tree.map(
                lambda s: jax.numpy.zeros(s.shape, jax.numpy.bfloat16),
                jax.eval_shape(lambda k: wan_dit.init_wan_dit(k, dit_cfg),
                               key))
            vae_params = jax.tree.map(
                lambda s: jax.numpy.zeros(s.shape, jax.numpy.bfloat16),
                jax.eval_shape(
                    lambda k: wan_vae.init_wan_vae(k, vae_cfg), key))
        else:
            dit_cfg, dit_params = pretrained.from_pretrained(
                args.transformer)
            vae_cfg, vae_params = pretrained.from_pretrained(args.vae)
        return WanImageToVideoPipeline(
            dit_cfg, dit_params, vae_cfg, vae_params, WanPipelineConfig(),
            quantize=args.quantize)
    from frameino_tpu.models import cogvideox_dit, cogvideox_vae
    from frameino_tpu.pipelines.cogvideox_i2v import (
        CogPipelineConfig, CogVideoXImageToVideoPipeline)
    if args.smoke:
        vae_cfg = cogvideox_vae.tiny_vae_config()
        dit_cfg = cogvideox_dit.tiny_config()
        key = jax.random.key(0)
        dit_params = cogvideox_dit.init_cogvideox_dit(key, dit_cfg)
        vae_params = cogvideox_vae.init_cogvideox_vae(
            jax.random.fold_in(key, 1), vae_cfg)
    elif args.random_init:
        print("WARNING: --random_init serves RANDOM weights — outputs "
              "are noise (latency benchmarking only)")
        import jax.numpy as jnp
        vae_cfg = cogvideox_vae.COGVIDEOX_VAE_CONFIG
        dit_cfg = cogvideox_dit.COGVIDEOX_5B_I2V_FRAMEINO
        zeros = lambda tree: jax.tree.map(  # noqa: E731
            lambda s: jnp.zeros(s.shape, jnp.bfloat16), tree)
        dit_params = zeros(jax.eval_shape(
            lambda k: cogvideox_dit.init_cogvideox_dit(k, dit_cfg),
            jax.random.key(0)))
        vae_params = zeros(jax.eval_shape(
            lambda k: cogvideox_vae.init_cogvideox_vae(k, vae_cfg),
            jax.random.key(1)))
    else:
        dit_cfg, dit_params = pretrained.from_pretrained(args.transformer)
        vae_cfg, vae_params = pretrained.from_pretrained(args.vae)
    return CogVideoXImageToVideoPipeline(
        dit_cfg, dit_params, vae_cfg, vae_params, CogPipelineConfig(),
        quantize=args.quantize)


def warmup_shapes(server, shapes: str, default_steps: int):
    """Precompile the denoise/decode programs for each HxWxF[:steps]
    shape by pushing a synthetic request through handle_generate —
    exactly the request path, so the persistent cache captures every
    program a real request needs. Returns [(spec, steps, seconds)]."""
    import base64
    import io
    import time

    import numpy as np
    from PIL import Image

    # FrameINO motion checkpoints channel-concat trajectory latents
    # (wan: in=2z; wan2.1 FrameINO: in=3z+4; cog: in=3z) — real requests
    # carry trajectories, so the warmup must too or it compiles (and
    # crashes on) the wrong program.
    z = getattr(server.pipeline.vae_cfg, "z_dim",
                getattr(server.pipeline.vae_cfg, "latent_channels", 0))
    in_ch = server.pipeline.dit_cfg.in_channels
    is_cog = "Cog" in type(server.pipeline).__name__
    wants_traj = in_ch == 3 * z if is_cog \
        else in_ch in (2 * z, 3 * z + 4)

    timings = []
    for spec in shapes.split(","):
        spec = spec.strip()
        steps = default_steps
        if ":" in spec:
            spec, s = spec.split(":")
            steps = int(s)
        h, w, f = (int(v) for v in spec.split("x"))
        img = Image.fromarray(np.zeros((h, w, 3), np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        req = {"image_b64": base64.b64encode(buf.getvalue()).decode(),
               "height": h, "width": w, "num_frames": f,
               "num_inference_steps": steps,
               "prompt_embeds_b64": None}
        if wants_traj:
            req["trajectories"] = [[(w * 0.3, h * 0.3),
                                    (w * 0.7, h * 0.6)]]
        if server.text_encoder_fn is None:
            # no encoder configured: zero embeds at the pipeline's dim
            emb = np.zeros((8, server.pipeline.dit_cfg.text_dim
                            if hasattr(server.pipeline.dit_cfg, "text_dim")
                            else server.pipeline.dit_cfg.text_embed_dim),
                           np.float32)
            ebuf = io.BytesIO()
            np.save(ebuf, emb)
            req["prompt_embeds_b64"] = base64.b64encode(
                ebuf.getvalue()).decode()
        else:
            del req["prompt_embeds_b64"]
        t0 = time.time()
        server.handle_generate(req)
        dt = time.time() - t0
        print(f"warmup {h}x{w}x{f} steps={steps}: {dt:.1f}s")
        timings.append((f"{h}x{w}x{f}", steps, dt))
    return timings


def main():
    args = parse_args()
    if args.compilation_cache_dir != "off":
        from frameino_tpu.core import compilation_cache
        cache_dir = compilation_cache.enable(
            None if args.compilation_cache_dir == "auto"
            else args.compilation_cache_dir)
        print(f"persistent compilation cache: {cache_dir}")
    from frameino_tpu.app.server import PipelineServer
    pipe = build_pipeline(args)

    text_fn = None
    if args.text_encoder:
        import jax.numpy as jnp
        from transformers import AutoTokenizer

        from frameino_tpu.models import pretrained, t5_encoder
        tcfg, tparams = pretrained.from_pretrained(args.text_encoder)
        tokenizer = AutoTokenizer.from_pretrained(args.text_encoder)

        def text_fn(prompts, _max=512):
            tok = tokenizer(prompts, padding="max_length", max_length=_max,
                            truncation=True, return_tensors="np")
            return t5_encoder.encode_and_mask(
                tcfg, tparams, jnp.asarray(tok["input_ids"]),
                jnp.asarray(tok["attention_mask"]),
                max_sequence_length=_max)

    server = PipelineServer(pipe, text_encoder_fn=text_fn,
                            bucket_grid=args.bucket_grid,
                            frame_grid=args.frame_grid)
    if args.warmup:
        timings = warmup_shapes(server, args.warmup,
                                default_steps=server.default_steps)
        if args.warmup_only:
            import json
            print("WARMSTART_JSON: " + json.dumps(
                {"shapes": [{"shape": s, "steps": st,
                             "first_request_s": round(dt, 2)}
                            for s, st, dt in timings]}))
            return
    server.serve(args.host, args.port)


if __name__ == "__main__":
    main()
