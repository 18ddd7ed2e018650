"""Channel surgery: extend patch-embedding input channels with zeros.

Reference: Stage-1 finetuning replaces the pretrained patch embedding
with a zero-initialized wider one, copying the original weights into the
first input channels so added condition channels start as no-ops
(``train_code/train_wan_motion.py:723-746`` for Wan Conv3d,
``train_code/train_cogvideox_motion.py:641-654`` for CogVideoX Conv2d).

Our patch embeddings are dense matmuls over flattened patch vectors with
channel-major layout (C, pt, ph, pw) — extending channels means zero-
padding whole row-blocks of the kernel.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def expand_patch_embedding(patch_params, old_in_channels: int,
                           new_in_channels: int,
                           patch_size: Tuple[int, ...]):
    """Return new {kernel, bias} with extra input channels zero-initialized.

    kernel: [old_in * prod(patch), D] with (C, *patch) row layout.
    """
    import numpy as np
    kernel = patch_params["kernel"]
    per_ch = int(np.prod(patch_size))
    d = kernel.shape[1]
    k = kernel.reshape(old_in_channels, per_ch, d)
    pad = jnp.zeros((new_in_channels - old_in_channels, per_ch, d), k.dtype)
    new_kernel = jnp.concatenate([k, pad], axis=0).reshape(
        new_in_channels * per_ch, d)
    out = {"kernel": new_kernel}
    if "bias" in patch_params:
        out["bias"] = patch_params["bias"]
    return out


def wan_stage1_surgery(dit_params, old_in: int, new_in: int,
                       patch_size=(1, 2, 2)):
    """Widen the Wan DiT patch embedding (48 -> 96 for +traj latents)."""
    params = dict(dit_params)
    params["patch_embedding"] = expand_patch_embedding(
        dit_params["patch_embedding"], old_in, new_in, patch_size)
    return params


def cogvideox_stage1_surgery(dit_params, old_in: int, new_in: int,
                             patch_size: int = 2):
    """Widen the CogVideoX patch embedding (32 -> 48 for +traj latents)."""
    params = dict(dit_params)
    pe = dict(dit_params["patch_embed"])
    pe["proj"] = expand_patch_embedding(pe["proj"], old_in, new_in,
                                        (patch_size, patch_size))
    params["patch_embed"] = pe
    return params
