#!/usr/bin/env python
"""Train CogVideoX FrameINO (Stage 2) — TPU-native trainer entry.

Counterpart of ``train_code/train_cogvideox_motion_FrameINO.py``:
v-prediction recipe (augment-noise first-frame/ID encodes, DDIM noising,
SNR-weighted x0 loss), Orbax checkpoints with resume. ``--stage1``
drops the ID branch (motion-only recipe of
``train_code/train_cogvideox_motion.py``) and ``--surgery`` widens a
base-model patch embedding by the trajectory channels first.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", required=True)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--stage1", action="store_true",
                   help="motion-only recipe (no ID branch)")
    p.add_argument("--surgery", action="store_true",
                   help="widen base patch embedding by +16 traj channels")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of step 2 here")
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
    from frameino_tpu.core.config import filter_kwargs, load_config
    from frameino_tpu.data import (FrameINODataset, FrameINODatasetConfig,
                                   MixedBatchSampler)
    from frameino_tpu.models import cogvideox_dit, cogvideox_vae
    from frameino_tpu.training.cog_trainer import (CogTrainerConfig,
                                                   make_cog_train_step)
    from frameino_tpu.training.optim import OptimizerConfig, make_optimizer
    from frameino_tpu.training.surgery import cogvideox_stage1_surgery
    from frameino_tpu.training.trainer import init_train_state

    config = load_config(args.config_path)

    if args.smoke:
        vae_cfg = cogvideox_vae.tiny_vae_config()
        dit_cfg = cogvideox_dit.tiny_config()
        compute = jnp.float32
    else:
        vae_cfg = cogvideox_vae.COGVIDEOX_VAE_CONFIG
        dit_cfg = cogvideox_dit.COGVIDEOX_5B_I2V_FRAMEINO if not args.stage1 \
            else cogvideox_dit.COGVIDEOX_5B_I2V_MOTION
        compute = jnp.bfloat16

    tcfg = CogTrainerConfig(use_frame_in=not args.stage1,
                            compute_dtype=compute,
                            remat=bool(config.get("gradient_checkpointing",
                                                  True)),
                            attn_impl="xla" if args.smoke else None)
    opt_cfg = OptimizerConfig(
        learning_rate=float(config.get("learning_rate", 1e-5)),
        lr_warmup_steps=int(config.get("lr_warmup_steps", 100)),
        max_grad_norm=float(config.get("max_grad_norm", 1.0)))
    opt = make_optimizer(opt_cfg)

    key = jax.random.key(int(config.get("seed") or 0))
    dit_params = cogvideox_dit.init_cogvideox_dit(key, dit_cfg)
    vae_params = cogvideox_vae.init_cogvideox_vae(
        jax.random.fold_in(key, 1), vae_cfg)
    pretrained = config.get("pretrained_transformer_path")
    if pretrained and os.path.exists(str(pretrained)):
        from frameino_tpu.models.weights import load_cogvideox_dit_weights
        dit_params = load_cogvideox_dit_weights(pretrained, dit_cfg)
    if args.surgery:
        dit_params = cogvideox_stage1_surgery(
            dit_params, dit_cfg.in_channels - 16, dit_cfg.in_channels,
            dit_cfg.patch_size)

    state = init_train_state(dit_params, opt)
    step_fn = make_cog_train_step(dit_cfg, vae_cfg, tcfg, opt)

    output_dir = os.path.join(config.get("output_folder", "checkpoints"),
                              config.get("experiment_name", "cog_fino"))
    start_meta = {}
    if config.get("resume_from_checkpoint") == "latest":
        latest = latest_checkpoint(output_dir)
        if latest:
            state, start_meta = restore_checkpoint(latest, state)
            print(f"resumed from {latest} at step {int(state.step)}")

    ds_cfg = FrameINODatasetConfig(**filter_kwargs(
        FrameINODatasetConfig, config))
    dataset = FrameINODataset(ds_cfg, config["download_folder_path"],
                              config["train_csv_relative_path"],
                              config["train_video_relative_path"],
                              config["train_ID_relative_path"],
                              seed=config.get("seed"))
    batch_size = int(config.get("train_batch_size", 1))
    sampler = MixedBatchSampler([len(dataset)], batch_size,
                                seed=int(config.get("seed") or 0))
    if len(sampler) == 0:
        raise ValueError("dataset yields no batches at this batch size")

    max_text = int(config.get("max_text_seq_length", 226))
    cache_dir = config.get("prompt_embeds_cache")
    pcache = None
    if cache_dir and not os.path.isdir(str(cache_dir)):
        raise FileNotFoundError(
            f"prompt_embeds_cache configured but not a directory: "
            f"{cache_dir!r}")
    if cache_dir:
        from frameino_tpu.data.prompt_cache import PromptEmbeddingCache
        pcache = PromptEmbeddingCache(str(cache_dir), max_text,
                                      dit_cfg.text_embed_dim)
    _cache_strict = not bool(config.get("prompt_cache_allow_misses",
                                        False))
    max_steps = int(config.get("max_train_steps", 1000))
    ckpt_every = int(config.get("checkpointing_steps", 2000))
    from frameino_tpu.core.metrics_logger import MetricsLogger
    mlog = MetricsLogger(output_dir, also_print=False)
    t0 = time.time()
    step_count = int(state.step)
    from frameino_tpu.data.prefetch import BatchPrefetcher
    import numpy as _np

    def make_batch(batch_idx):
        items = [dataset[i] for i in batch_idx]
        return {
            "video_tensor": _np.stack([i["video_tensor"] for i in items]),
            "first_frame_tensor": _np.stack(
                [i["first_frame_tensor"] for i in items]),
            "traj_tensor": _np.stack([i["traj_tensor"] for i in items]),
            "ID_tensor": None if args.stage1 else _np.stack(
                [i["ID_tensor"] for i in items]),
            "prompt_embeds": pcache.batch(
                [i["text_prompt"] for i in items],
                strict=_cache_strict) if pcache is not None
            else _np.zeros((len(items), max_text, dit_cfg.text_embed_dim),
                           _np.float32),
        }

    num_workers = int(config.get("dataloader_num_workers", 2))
    from frameino_tpu.data.sampler import ResumableEpochIterator
    data_iter = ResumableEpochIterator(sampler, start_meta)
    while step_count < max_steps:
        for batch in BatchPrefetcher(make_batch,
                                     data_iter.epoch(step_count),
                                     num_workers=num_workers):
            from frameino_tpu.core.metrics_logger import maybe_profile
            with maybe_profile(args.profile_dir
                               if step_count == 2 else None):
                state, m = step_fn(state, vae_params, batch, key)
            data_iter.advance()
            step_count = int(state.step)
            if step_count % 10 == 0 or args.smoke:
                loss = float(m["loss"])
                mlog.log(step_count, {"loss": loss,
                                      "lr": opt_cfg.learning_rate})
                print(f"step {step_count} loss {loss:.4f} "
                      f"({time.time() - t0:.1f}s)")
            if step_count % ckpt_every == 0:
                save_checkpoint(output_dir, step_count, state,
                                metadata=data_iter.meta(),
                                total_limit=config.get(
                                    "checkpoints_total_limit"))
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
