"""End-to-end curation chain: fixture video -> curated CSV -> train step.

VERDICT r1 item 7: one CLI runs preprocess steps 1-8 on a synthetic
video and emits a CSV that ``FrameINODataset`` loads into a training
step (reference chain ``preprocess/README.md:17-115``). The chain uses
the real classical models: histogram shot detection, LK+RANSAC camera
motion, connected-components panoptic, LK forward/backward-cycle point
tracking, region-box search + ID crops.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from frameino_tpu.data import write_video

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_fixture_video(path, F=60, H=64, W=96, seed=0):
    """Bright square moving over a static textured background."""
    rs = np.random.RandomState(seed)
    bg = rs.randint(10, 60, (H, W, 3)).astype(np.uint8)
    frames = []
    for t in range(F):
        f = bg.copy()
        x = 6 + int(0.8 * t)
        y = 8 + int(0.4 * t)
        f[y:y + 16, x:x + 16] = (220, 180, 60)
        frames.append(f)
    write_video(path, np.stack(frames), fps=12)


@pytest.fixture(scope="module")
def curated(tmp_path_factory):
    root = tmp_path_factory.mktemp("curation")
    raw = root / "raw"
    raw.mkdir()
    _make_fixture_video(str(raw / "clip0.mp4"))
    _make_fixture_video(str(raw / "clip1.mp4"), seed=1)
    out = root / "FrameINO_data"
    base = [sys.executable,
            os.path.join(REPO, "scripts", "run_preprocess_pipeline.py"),
            "--video_folder", str(raw), "--output_folder", str(out),
            "--min_frames", "30", "--min_size", "32", "--min_motion", "2.0",
            "--caption_backend", "template"]
    # without --allow_classical the driver must refuse to run the
    # classical fallbacks (forgotten-checkpoint loudness gate)
    r0 = subprocess.run(base, capture_output=True, text=True,
                        timeout=600, cwd=REPO)
    assert r0.returncode != 0
    assert "allow_classical" in (r0.stdout + r0.stderr)
    r = subprocess.run(base + ["--allow_classical"], capture_output=True,
                       text=True, timeout=600, cwd=REPO)
    assert r.returncode == 0, r.stdout + r.stderr[-2000:]
    return root, raw, out, r.stdout


def test_pipeline_emits_csv_and_ids(curated):
    root, raw, out, stdout = curated
    csv_path = out / "dataset_csv_files" / "curated.csv"
    assert csv_path.exists()
    assert "keep clip0.mp4" in stdout
    ids = list((out / "video_dataset" / "train_ID_FrameIn").iterdir())
    assert ids, "no ID reference crops written"
    # the backend manifest is loud: one line per learned step, WARNING
    # on classical fallbacks, and a machine-readable summary sidecar
    assert "backend panoptic=classical:motion-residual" in stdout
    assert "WARNING: classical fallback" in stdout
    import json as _json
    summary = _json.loads((out / "curated.summary.json").read_text())
    assert summary["backends"]["tracking"] == "classical:pyramidal-lk"
    assert summary["kept"] >= 1


def test_curated_csv_feeds_dataset_and_train_step(curated):
    root, raw, out, _ = curated
    import jax
    import jax.numpy as jnp
    from frameino_tpu.data import FrameINODataset, FrameINODatasetConfig
    from frameino_tpu.models import wan_dit, wan_vae
    from frameino_tpu.training import (OptimizerConfig, TrainerConfig,
                                       make_optimizer, make_train_step)
    from frameino_tpu.training.trainer import init_train_state

    cfg = FrameINODatasetConfig(
        target_height=32, target_width=64, sample_accelerate_factor=1,
        train_frame_num_range=(13, 13), min_train_frame_num=9,
        dot_radius=45, drop_FrameIn_prob=0.0,
        point_keep_ratio_regular=1.0, point_keep_ratio_ID=1.0)
    # video_relative_path points at the RAW folder (the curated CSV
    # references the original files)
    ds = FrameINODataset(cfg, str(root), "FrameINO_data/dataset_csv_files",
                         "raw",
                         "FrameINO_data/video_dataset/train_ID_FrameIn",
                         seed=0)
    assert len(ds) >= 1
    item = ds[0]
    assert item["video_tensor"].shape == (13, 3, 32, 64)
    assert item["traj_tensor"].shape[0] == 13
    assert np.abs(item["traj_tensor"]).max() > 0, "no trajectory drawn"

    vae_cfg = wan_vae.WanVAEConfig(
        base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
        temperal_downsample=(True,), is_residual=False,
        scale_factor_temporal=2, scale_factor_spatial=2,
        latents_mean=(0.0,) * 4, latents_std=(1.0,) * 4)
    dit_cfg = wan_dit.tiny_config(in_channels=8, out_channels=4)
    tcfg = TrainerConfig(compute_dtype=jnp.float32, remat=False,
                         attn_impl="xla")
    opt = make_optimizer(OptimizerConfig(lr_warmup_steps=1))
    state = init_train_state(
        wan_dit.init_wan_dit(jax.random.key(0), dit_cfg), opt)
    step = make_train_step(dit_cfg, vae_cfg, tcfg, opt)
    batch = {
        "video_tensor": jnp.asarray(item["video_tensor"])[None],
        "first_frame_tensor": jnp.asarray(item["first_frame_tensor"])[None],
        "traj_tensor": jnp.asarray(item["traj_tensor"])[None],
        "ID_tensor": jnp.asarray(item["ID_tensor"])[None, None],
        "prompt_embeds": jnp.zeros((1, 8, dit_cfg.text_dim)),
    }
    state, metrics = step(state, wan_vae.init_wan_vae(jax.random.key(1),
                                                      vae_cfg),
                          batch, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
