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
    else:
        dit_cfg, dit_params = pretrained.from_pretrained(args.transformer)
        vae_cfg, vae_params = pretrained.from_pretrained(args.vae)
    return CogVideoXImageToVideoPipeline(
        dit_cfg, dit_params, vae_cfg, vae_params, CogPipelineConfig(),
        quantize=args.quantize)


def main():
    args = parse_args()
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

    server = PipelineServer(pipe, text_encoder_fn=text_fn)
    server.serve(args.host, args.port)


if __name__ == "__main__":
    main()
