#!/usr/bin/env python
"""Benchmark generation driver + metric evaluation.

Counterpart of ``test_code/run_cogvideox_Frame{In,Out}_mass_evaluation.py``
and ``evaluation/mass_evaluation.py``: iterate the gated evaluation
dataset deterministically (strict_validation_match), run the FrameINO
pipeline, dump the per-instance artifact directory the evaluators
consume, then score with the four metrics.

Usage:
    python scripts/run_frameino_mass_evaluation.py \
        --config_path configs/eval_frameino.yaml \
        --output_dir results/FrameIn --mode frame_in \
        [--family wan|cogvideox] [--smoke] [--evaluate-only]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--mode", choices=["frame_in", "frame_out"],
                   default="frame_in")
    p.add_argument("--family", choices=["wan", "cogvideox"], default="wan")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--evaluate-only", action="store_true")
    p.add_argument("--num_instances", type=int, default=None)
    p.add_argument("--backends", choices=["naive", "default", "jax-random"],
                   default="naive",
                   help="'jax-random' = released-SCALE JAX perception "
                        "graphs with RANDOM weights — wall-clock "
                        "benchmarking only, scores are meaningless "
                        "(loud warning printed)")
    p.add_argument("--cotracker_checkpoint", default=None,
                   help="released CoTracker3-offline weights; with "
                        "--backends default, runs the JAX tracker "
                        "(models/cotracker.py) instead of torch.hub")
    p.add_argument("--sam2_checkpoint", default=None,
                   help="released sam2.1_hiera_large.pt weights; with "
                        "--backends default, runs the JAX SAM2.1 video "
                        "predictor (models/sam2_video.py) instead of "
                        "the external sam2 package")
    p.add_argument("--dinov2_checkpoint", default=None,
                   help="released dinov2_vitb14 weights; with "
                        "--backends default, runs the JAX embedder "
                        "(models/dinov2.py) instead of torch.hub")
    p.add_argument("--qwen_checkpoint", default=None,
                   help="local Qwen2.5-VL checkpoint dir; with "
                        "--backends default, runs the JAX judge "
                        "(models/qwen_vl.py) instead of torch "
                        "transformers")
    p.add_argument("--schema", choices=["new", "old"], default="new",
                   help="CSV schema: 'old' = paper-v1.0 contract "
                        "(video_dataset_motion_FrameINO_old.py)")
    p.add_argument("--quantize", choices=["int8"], default=None,
                   help="int8 w8a8 serving config for the DiT (v5e 2x "
                        "MXU throughput; models/quant.py)")
    p.add_argument("--quantize_vae", action="store_true",
                   help="also quantize the Wan VAE's inner convs to "
                        "int8 w8a8 (~1.35x decoder conv rate; wan "
                        "family only)")
    return p.parse_args()


def build_pipeline(args, config):
    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    if args.family == "wan":
        from frameino_tpu.models import wan_dit, wan_vae
        from frameino_tpu.pipelines.wan_i2v import (WanImageToVideoPipeline,
                                                    WanPipelineConfig)
        if args.smoke:
            vae_cfg = wan_vae.WanVAEConfig(
                base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                temperal_downsample=(True,), is_residual=False,
                scale_factor_temporal=2, scale_factor_spatial=2,
                latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4))
            dit_cfg = wan_dit.tiny_config(in_channels=8, out_channels=4)
        else:
            vae_cfg = wan_vae.WAN22_VAE_CONFIG
            dit_cfg = wan_dit.WAN22_TI2V_5B_MOTION
        key = jax.random.key(0)
        if args.smoke:
            dit_params = wan_dit.init_wan_dit(key, dit_cfg)
            vae_params = wan_vae.init_wan_vae(jax.random.fold_in(key, 1),
                                              vae_cfg)
        else:
            # benchmarking without a checkpoint: zeros-bf16 via
            # eval_shape — init_wan_dit materializes 5B fp32 (20 GB)
            # and OOMs one chip; XLA timing only depends on
            # shape/dtype (same approach as bench.py / serve.py
            # --random_init)
            import jax.numpy as jnp
            dit_params = jax.tree.map(
                lambda s: jnp.zeros(s.shape, jnp.bfloat16),
                jax.eval_shape(lambda k: wan_dit.init_wan_dit(k, dit_cfg),
                               key))
            vae_params = jax.tree.map(
                lambda s: jnp.zeros(s.shape, jnp.bfloat16),
                jax.eval_shape(
                    lambda k: wan_vae.init_wan_vae(k, vae_cfg), key))
        tp = config.get("pretrained_transformer_path")
        if tp and os.path.exists(str(tp)):
            from frameino_tpu.models.weights import load_wan_dit_weights
            dit_params = load_wan_dit_weights(tp, dit_cfg)
        vp = config.get("pretrained_vae_path")
        if vp and os.path.exists(str(vp)):
            from frameino_tpu.models.weights import load_wan_vae_weights
            vae_params = load_wan_vae_weights(vp, vae_cfg)
        return WanImageToVideoPipeline(dit_cfg, dit_params, vae_cfg,
                                       vae_params,
                                       quantize=args.quantize,
                                       quantize_vae=args.quantize_vae), \
            dit_cfg
    else:
        if args.quantize_vae:
            raise SystemExit("--quantize_vae supports the wan family only")
        from frameino_tpu.models import cogvideox_dit, cogvideox_vae
        from frameino_tpu.pipelines.cogvideox_i2v import (
            CogPipelineConfig, CogVideoXImageToVideoPipeline)
        if args.smoke:
            vae_cfg = cogvideox_vae.tiny_vae_config()
            dit_cfg = cogvideox_dit.tiny_config()
        else:
            vae_cfg = cogvideox_vae.COGVIDEOX_VAE_CONFIG
            dit_cfg = cogvideox_dit.COGVIDEOX_5B_I2V_FRAMEINO
        import jax
        key = jax.random.key(0)
        if args.smoke:
            dit_params = cogvideox_dit.init_cogvideox_dit(key, dit_cfg)
            vae_params = cogvideox_vae.init_cogvideox_vae(
                jax.random.fold_in(key, 1), vae_cfg)
        else:
            import jax.numpy as jnp
            dit_params = jax.tree.map(
                lambda s: jnp.zeros(s.shape, jnp.bfloat16),
                jax.eval_shape(
                    lambda k: cogvideox_dit.init_cogvideox_dit(k, dit_cfg),
                    key))
            vae_params = jax.tree.map(
                lambda s: jnp.zeros(s.shape, jnp.bfloat16),
                jax.eval_shape(
                    lambda k: cogvideox_vae.init_cogvideox_vae(k, vae_cfg),
                    key))
        return CogVideoXImageToVideoPipeline(
            dit_cfg, dit_params, vae_cfg, vae_params,
            CogPipelineConfig(scheduler_type="dpm"),
            quantize=args.quantize), dit_cfg


def main():
    args = parse_args()
    from frameino_tpu.core.config import filter_kwargs, load_config
    from frameino_tpu.data import FrameINODataset, FrameINODatasetConfig
    from frameino_tpu.evaluation import (FRAME_IN_METRICS, FRAME_OUT_METRICS,
                                         mass_evaluation,
                                         write_instance_artifacts)
    config = load_config(args.config_path)
    is_frame_in = args.mode == "frame_in"

    if not args.evaluate_only:
        import jax
        import jax.numpy as jnp
        pipe, dit_cfg = build_pipeline(args, config)
        eval_defaults = dict(config)
        # deterministic evaluation wants every tracked point kept unless
        # the config explicitly thins them
        eval_defaults.setdefault("point_keep_ratio_regular", 1.0)
        eval_defaults.setdefault("point_keep_ratio_ID", 1.0)
        if args.schema == "old":
            from frameino_tpu.data import FrameINODatasetOld
            root = config["download_folder_path"]
            old_cfg = {
                "dataset_folder_path": os.path.join(
                    root, config["validation_video_relative_path"]),
                "ID_folder_path": os.path.join(
                    root, config["validation_ID_relative_path"]),
                "height": eval_defaults.get("target_height", 480),
                "width": eval_defaults.get("target_width", 720),
                "preset_decode_fps": eval_defaults.get(
                    "preset_decode_fps", 16),
                "train_frame_num": (eval_defaults.get(
                    "train_frame_num_range", [49, 49]))[0],
                "dot_radius": eval_defaults.get("dot_radius", 6),
                "point_keep_ratio_regular": eval_defaults[
                    "point_keep_ratio_regular"],
                "point_keep_ratio_ID": eval_defaults["point_keep_ratio_ID"],
            }
            dataset = FrameINODatasetOld(
                old_cfg,
                os.path.join(root, config["validation_csv_relative_path"]),
                FrameOut_only=not is_frame_in,
                one_point_one_obj=not is_frame_in,
                strict_validation_match=True, seed=0)
        else:
            ds_cfg = FrameINODatasetConfig(**filter_kwargs(
                FrameINODatasetConfig, eval_defaults))
            dataset = FrameINODataset(
                ds_cfg, config["download_folder_path"],
                config["validation_csv_relative_path"],
                config["validation_video_relative_path"],
                config["validation_ID_relative_path"],
                FrameOut_only=not is_frame_in,
                one_point_one_obj=not is_frame_in,
                strict_validation_match=True, seed=0)

        n = min(args.num_instances or len(dataset), len(dataset))
        steps = int(config.get("num_inference_steps", 50))
        import time as _time
        gen_times = []
        for idx in range(n):
            t_inst = _time.time()
            item = dataset[idx]
            F, _, H, W = item["video_tensor"].shape
            text_dim = getattr(dit_cfg, "text_dim",
                               getattr(dit_cfg, "text_embed_dim", None))
            text = jnp.zeros((1, int(config.get("max_text_seq_length", 512)),
                              text_dim))
            id_np = item.get("ID_tensor",
                             item.get("main_reference_tensor"))
            video = pipe(
                jnp.asarray(item["first_frame_tensor"])[None],
                prompt_embeds=text,
                traj_tensor=jnp.asarray(item["traj_tensor"]),
                id_tensor=jnp.asarray(id_np)[None, :, None],
                height=H, width=W, num_frames=F,
                num_inference_steps=steps,
                guidance_scale=float(config.get("guidance_scale", 5.0)),
                key=jax.random.key(idx), attn_impl="xla" if args.smoke
                else None,
                # full-sequence decode OOMs next to the resident 5B DiT
                # at eval resolutions on a 16G chip; the hybrid
                # (tiled x streaming) is the production decode
                decode_mode="full" if args.smoke else "hybrid",
                # bounded chunked denoise programs, like serve.py and
                # bench_e2e (exact: idempotent re-blend; also the r5
                # mass-eval generation leg OOMed 16 GB with the single
                # 50-step program this driver previously compiled)
                steps_per_program=None if args.smoke else 10)
            gen = ((np.asarray(video)[0].transpose(1, 2, 3, 0) + 1) / 2
                   * 255).clip(0, 255).astype(np.uint8)
            write_instance_artifacts(
                args.output_dir, idx, item["video_gt_np"][:gen.shape[0]],
                gen, item["processed_meta_data"], item["text_prompt"],
                main_reference=item.get("ID_np",
                                        item.get("main_reference_np")))
            gen_times.append(round(_time.time() - t_inst, 2))
            print(f"instance {idx} written ({gen.shape}) "
                  f"in {gen_times[-1]:.1f}s", flush=True)
        # first instance carries the XLA compiles; steady state is the
        # per-instance generation cost (bench_mass_eval.py parses this)
        import json as _json
        print("GENERATION_TIMES: " + _json.dumps(gen_times), flush=True)

    metrics = FRAME_IN_METRICS if is_frame_in else FRAME_OUT_METRICS
    if args.backends == "naive":
        from frameino_tpu.evaluation.perception import naive_backends
        backends = naive_backends()
    elif args.backends == "jax-random":
        from frameino_tpu.evaluation.perception import \
            random_init_jax_backends
        print("WARNING: --backends jax-random uses RANDOM weights; "
              "metric VALUES below are meaningless (timing only)")
        backends = random_init_jax_backends()
    else:
        from frameino_tpu.evaluation.perception import load_default_backends
        backends = load_default_backends(
            cotracker_checkpoint=args.cotracker_checkpoint,
            dinov2_checkpoint=args.dinov2_checkpoint,
            sam2_checkpoint=args.sam2_checkpoint,
            qwen_checkpoint=args.qwen_checkpoint)
    results = mass_evaluation(
        args.output_dir, metrics, backends,
        test_num_frames=49 if is_frame_in else 14,
        is_frame_in=is_frame_in,
        store_json_path=os.path.join(args.output_dir, "results.json"))
    print("results:", results)


if __name__ == "__main__":
    main()
