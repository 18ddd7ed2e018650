#!/usr/bin/env python
"""Train Wan2.2 FrameINO (Stage 2) — TPU-native trainer entry.

Counterpart of ``train_code/train_wan_motion_FrameINO.py``: config YAML,
dataset + mixed sampler, frozen VAE + UMT5 embeddings, pjit train step,
periodic in-training validation through the full pipeline, Orbax
checkpoints with resume-from-latest.

Usage:
    python scripts/train_wan_motion_frameino.py \
        --config_path configs/train_wan_motion_frameino.yaml [--smoke]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", required=True)
    p.add_argument("--smoke", action="store_true",
                   help="tiny-model CPU smoke run (CI / no-weights mode)")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--stage1", action="store_true",
                   help="motion-only recipe, no ID branch (counterpart of "
                        "train_code/train_wan_motion.py)")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of steps 2-4 here")
    return p.parse_args()


def main():
    args = parse_args()
    if args.smoke:
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
        jax.config.update("jax_platforms", "cpu")

    from frameino_tpu.core.checkpoint import (latest_checkpoint,
                                              restore_checkpoint,
                                              save_checkpoint)
    from frameino_tpu.core.config import load_config, filter_kwargs
    from frameino_tpu.core.meshes import MeshConfig, make_mesh
    from frameino_tpu.data import (FrameINODataset, FrameINODatasetConfig,
                                   MixedBatchSampler)
    from frameino_tpu.models import wan_dit, wan_vae
    from frameino_tpu.training import (OptimizerConfig, TrainerConfig,
                                       make_optimizer,
                                       make_sharded_train_state,
                                       make_train_step)
    from frameino_tpu.schedulers.flow_match_euler import FlowMatchEulerConfig

    config = load_config(args.config_path)

    # --- models --------------------------------------------------------
    if args.smoke:
        vae_cfg = wan_vae.WanVAEConfig(
            base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
            temperal_downsample=(True,), is_residual=False,
            scale_factor_temporal=2, scale_factor_spatial=2,
            latents_mean=tuple([0.0] * 4), latents_std=tuple([1.0] * 4))
        dit_cfg = wan_dit.tiny_config(in_channels=8, out_channels=4)
        compute_dtype = jnp.float32
    else:
        vae_cfg = wan_vae.WAN22_VAE_CONFIG
        dit_cfg = wan_dit.WAN22_TI2V_5B_MOTION
        compute_dtype = jnp.bfloat16

    sched_cfg = FlowMatchEulerConfig(**filter_kwargs(
        FlowMatchEulerConfig, config.get("noise_scheduler_kwargs", {})))
    opt_cfg = OptimizerConfig(
        learning_rate=float(config.get("learning_rate", 3e-5)),
        beta1=float(config.get("adam_beta1", 0.9)),
        beta2=float(config.get("adam_beta2", 0.999)),
        weight_decay=float(config.get("adam_weight_decay", 1e-4)),
        epsilon=float(config.get("adam_epsilon", 1e-10)),
        lr_scheduler=config.get("lr_scheduler", "constant_with_warmup"),
        lr_warmup_steps=int(config.get("lr_warmup_steps", 100)),
        max_train_steps=int(config.get("max_train_steps", 1000)))
    tcfg = TrainerConfig(scheduler=sched_cfg, optimizer=opt_cfg,
                         use_frame_in=not args.stage1,
                         compute_dtype=compute_dtype,
                         remat=bool(config.get("gradient_checkpointing",
                                               True)),
                         attn_impl="xla" if args.smoke else None)

    # --- params (pretrained load hooks; random init without weights) ---
    key = jax.random.key(int(config.get("seed") or 0))
    dit_params = wan_dit.init_wan_dit(key, dit_cfg)
    vae_params = wan_vae.init_wan_vae(jax.random.fold_in(key, 1), vae_cfg)
    pretrained = config.get("pretrained_transformer_path")
    if pretrained and os.path.exists(str(pretrained)):
        from frameino_tpu.models.weights import load_wan_dit_weights
        dit_params = load_wan_dit_weights(pretrained, dit_cfg)

    # --- mesh / state --------------------------------------------------
    n_dev = jax.device_count()
    if config.get("mesh") and int(__import__("numpy").prod(
            list(config["mesh"].values()))) == n_dev:
        mesh_cfg = MeshConfig(**{k: int(v) for k, v in
                                 config["mesh"].items()})
    elif n_dev % 4 == 0 and not args.smoke:
        mesh_cfg = MeshConfig(dp=2, fsdp=n_dev // 2, tp=1, sp=1)
    elif args.smoke and n_dev % 8 == 0:
        mesh_cfg = MeshConfig(dp=2, fsdp=2, tp=2, sp=1)
    else:
        mesh_cfg = MeshConfig(dp=n_dev, fsdp=1, tp=1, sp=1)
    mesh = make_mesh(mesh_cfg)
    opt = make_optimizer(opt_cfg)

    with mesh:
        state = make_sharded_train_state(dit_params, opt, mesh)
        step_fn = make_train_step(dit_cfg, vae_cfg, tcfg, opt, mesh=mesh,
                                  dp_size=mesh_cfg.dp)

        # --- resume ----------------------------------------------------
        output_dir = os.path.join(config.get("output_folder", "checkpoints"),
                                  config.get("experiment_name", "wan_fino"))
        start_meta = {}
        if config.get("resume_from_checkpoint") == "latest":
            latest = latest_checkpoint(output_dir)
            if latest:
                state, start_meta = restore_checkpoint(latest, state)
                print(f"resumed from {latest} at step {int(state.step)}")

        # --- data ------------------------------------------------------
        ds_cfg = FrameINODatasetConfig(**filter_kwargs(
            FrameINODatasetConfig, config))
        root = config["download_folder_path"]
        dataset = FrameINODataset(ds_cfg, root,
                                  config["train_csv_relative_path"],
                                  config["train_video_relative_path"],
                                  config["train_ID_relative_path"],
                                  seed=config.get("seed"))
        batch_size = int(config.get("train_batch_size", 1)) * mesh_cfg.dp
        sampler = MixedBatchSampler([len(dataset)], batch_size,
                                    seed=int(config.get("seed") or 0))
        if len(sampler) == 0:
            raise ValueError(
                f"dataset of {len(dataset)} samples yields no batches at "
                f"global batch size {batch_size} (dp={mesh_cfg.dp})")

        # text embeddings: a precomputed PromptEmbeddingCache (see
        # scripts/precompute_prompt_embeddings.py) when configured —
        # zero text-encoder cost per step, unlike the reference's
        # per-step UMT5 forward — else zeros (smoke runs)
        text_dim = dit_cfg.text_dim
        max_text = int(config.get("max_text_seq_length", 512))
        cache_dir = config.get("prompt_embeds_cache")
        if cache_dir and not os.path.isdir(str(cache_dir)):
            # a typo'd/unmounted cache path must not silently train with
            # all-zero text embeddings (ADVICE r2)
            raise FileNotFoundError(
                f"prompt_embeds_cache configured but not a directory: "
                f"{cache_dir!r}")
        if cache_dir:
            from frameino_tpu.data.prompt_cache import PromptEmbeddingCache
            _pcache = PromptEmbeddingCache(str(cache_dir), max_text,
                                           text_dim)
            _allow_misses = bool(config.get("prompt_cache_allow_misses",
                                            False))

            def embed_prompts(prompts):
                return jnp.asarray(
                    _pcache.batch(prompts, strict=not _allow_misses))
        else:
            def embed_prompts(prompts):
                return jnp.zeros((len(prompts), max_text, text_dim))

        max_steps = int(config.get("max_train_steps", 1000))
        ckpt_every = int(config.get("checkpointing_steps", 2000))
        val_every = int(config.get("validation_step", 0) or 0)
        first_iter_val = bool(config.get("first_iter_validation", False))
        log_every = 10
        rng_key = jax.random.fold_in(key, 2)

        val_dataset = None
        if val_every or first_iter_val:
            val_dataset = FrameINODataset(
                ds_cfg, root,
                config.get("validation_csv_relative_path",
                           config["train_csv_relative_path"]),
                config.get("validation_video_relative_path",
                           config["train_video_relative_path"]),
                config.get("validation_ID_relative_path",
                           config["train_ID_relative_path"]),
                strict_validation_match=True, seed=0)

        def run_validation(step_no):
            from frameino_tpu.pipelines.wan_i2v import (
                WanImageToVideoPipeline, WanPipelineConfig)
            from frameino_tpu.training.validation import log_validation
            pipe = WanImageToVideoPipeline(
                dit_cfg, state.params, vae_cfg, vae_params,
                WanPipelineConfig(scheduler=sched_cfg))
            out = log_validation(
                pipe, val_dataset, embed_prompts, step_no, output_dir,
                num_inference_steps=int(config.get("num_inference_steps",
                                                   38)),
                attn_impl="xla" if args.smoke else None)
            print(f"validation artifacts -> {out}")

        from frameino_tpu.core.metrics_logger import (MetricsLogger,
                                                       maybe_profile)
        mlog = MetricsLogger(output_dir, also_print=False)
        t0 = time.time()
        step_count = int(state.step)
        if first_iter_val and val_dataset is not None and step_count == 0:
            run_validation(0)
        from frameino_tpu.data.prefetch import BatchPrefetcher

        def make_batch(batch_idx):
            # runs on prefetch threads (ffmpeg/cv2/numpy release the GIL)
            items = [dataset[i] for i in batch_idx]
            import numpy as _np
            return {
                "video_tensor": _np.stack(
                    [i["video_tensor"] for i in items]),
                "first_frame_tensor": _np.stack(
                    [i["first_frame_tensor"] for i in items]),
                "traj_tensor": _np.stack(
                    [i["traj_tensor"] for i in items]),
                "ID_tensor": None if args.stage1 else _np.stack(
                    [i["ID_tensor"] for i in items])[:, None],
                "prompt_embeds": embed_prompts(
                    [i["text_prompt"] for i in items]),
            }

        num_workers = int(config.get("dataloader_num_workers", 2))
        from frameino_tpu.data.sampler import ResumableEpochIterator
        data_iter = ResumableEpochIterator(sampler, start_meta)
        while step_count < max_steps:
            for batch in BatchPrefetcher(make_batch,
                                         data_iter.epoch(step_count),
                                         num_workers=num_workers):
                with maybe_profile(args.profile_dir
                                   if step_count == 2 else None):
                    state, metrics = step_fn(state, vae_params, batch,
                                             rng_key)
                data_iter.advance()
                step_count = int(state.step)
                if step_count % log_every == 0 or args.smoke:
                    loss = float(metrics["loss"])
                    gn = float(metrics["grad_norm"])
                    mlog.log(step_count, {"loss": loss, "grad_norm": gn,
                                          "lr": opt_cfg.learning_rate})
                    print(f"step {step_count} loss {loss:.4f} "
                          f"grad_norm {gn:.3f} "
                          f"({time.time() - t0:.1f}s)")
                if val_every and step_count % val_every == 0 and \
                        val_dataset is not None:
                    run_validation(step_count)
                if step_count % ckpt_every == 0:
                    save_checkpoint(
                        output_dir, step_count, state,
                        metadata=data_iter.meta(),
                        total_limit=config.get("checkpoints_total_limit"))
                if step_count >= max_steps:
                    break
            else:
                data_iter.end_epoch()

        save_checkpoint(output_dir, step_count, state,
                        metadata={"final": True, **data_iter.meta()},
                        total_limit=config.get("checkpoints_total_limit"))
        mlog.close()
        print(f"done at step {step_count}")


if __name__ == "__main__":
    main()
