"""Every shipped training config runs its documented CLI in --smoke.

VERDICT r1 item 6: the full config surface of the reference
(``/root/reference/config/train_{wan,cogvideox}_motion[_FrameINO].yaml``)
must ship and actually drive its CLI. Each test merges the shipped YAML
with the synthetic-fixture dataset paths and tiny smoke shapes, then
runs the CLI end to end (train steps + checkpoint).
"""

import os
import subprocess
import sys

import pytest
import yaml

from tests.test_train_cli import smoke_env  # noqa: F401 (fixture)

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("train_wan_motion_frameino.yaml", "train_wan_motion_frameino.py", []),
    ("train_wan_motion.yaml", "train_wan_motion_frameino.py", ["--stage1"]),
    ("train_cogvideox_motion_frameino.yaml",
     "train_cogvideox_motion_frameino.py", []),
    ("train_cogvideox_motion.yaml", "train_cogvideox_motion_frameino.py",
     ["--stage1"]),
]


@pytest.mark.slow
@pytest.mark.parametrize("cfg_name,cli,extra", CONFIGS,
                         ids=[c[0] for c in CONFIGS])
def test_shipped_config_smoke(cfg_name, cli, extra, smoke_env, tmp_path):  # noqa: F811
    root, fixture_cfg_path = smoke_env
    with open(os.path.join(REPO, "configs", cfg_name)) as f:
        cfg = yaml.safe_load(f)
    with open(fixture_cfg_path) as f:
        fixture = yaml.safe_load(f)
    # shipped recipe + fixture dataset paths + smoke-size overrides
    cfg.update({k: fixture[k] for k in (
        "download_folder_path", "train_csv_relative_path",
        "train_video_relative_path", "train_ID_relative_path",
        "target_height", "target_width", "train_frame_num_range",
        "min_train_frame_num", "sample_accelerate_factor",
        "max_text_seq_length", "num_inference_steps")})
    cfg.update({
        "experiment_name": f"smoke_{cfg_name.removesuffix('.yaml')}",
        "max_train_steps": 1, "checkpointing_steps": 1,
        "gradient_checkpointing": False, "lr_warmup_steps": 1,
        "validation_step": 0, "first_iter_validation": False,
        "resume_from_checkpoint": False, "seed": 0,
        "output_folder": str(tmp_path / "ckpts"),
    })
    cfg.pop("mesh", None)      # smoke meshes are CLI-chosen
    cfg_path = tmp_path / cfg_name
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", cli),
         "--config_path", str(cfg_path), "--smoke", *extra],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "done at step 1" in r.stdout, r.stdout
    # machine-readable observability (VERDICT r1 item 8)
    mfile = (tmp_path / "ckpts" / cfg["experiment_name"] / "metrics.jsonl")
    assert mfile.exists()
    import json
    rows = [json.loads(l) for l in mfile.read_text().splitlines()]
    assert rows and "loss" in rows[-1] and "step" in rows[-1]


def test_eval_config_ships():
    """configs/eval_frameino.yaml exists and parses (the eval driver's
    documented invocation, scripts/run_frameino_mass_evaluation.py:12)."""
    with open(os.path.join(REPO, "configs", "eval_frameino.yaml")) as f:
        cfg = yaml.safe_load(f)
    assert cfg["num_inference_steps"] == 50
    assert "validation_csv_relative_path" in cfg
