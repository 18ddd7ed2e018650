#!/usr/bin/env python
"""int8 serving quality certification: bf16 vs int8 metric parity.

Runs ``scripts/run_frameino_mass_evaluation.py --smoke`` twice per model
family — identical seed/config, with and without ``--quantize int8`` —
over a synthetic fixture dataset with the offline (LK/naive) metric
backends, then gates the metric deltas under stated budgets and reports
the direct pixel PSNR between the two generated clips.

This is the quality gate behind the int8 serving headline
(``BENCH``/``DEPLOYMENT.md``): the 2x-MXU int8 path may only be quoted
as "matching" when this certification passes (VERDICT r2 weak #2).
Artifact contract per instance follows the reference
``test_code/run_cogvideox_FrameIn_mass_evaluation.py:33``.

Usage:
    python scripts/certify_int8.py --output_dir /tmp/int8_cert \
        [--families wan cogvideox] [--report INT8_PARITY.json]
"""

import argparse
import csv
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

# Metric budgets: |metric(int8) - metric(bf16)| must stay under these.
# Scales: TrajError is pixels at the 256x384 eval canvas; VSeg_MAE is
# mask-area percent; Relative_DINO is cosine-similarity space; VLM is a
# yes-rate in [0,1] and must not flip on the fixture.
BUDGETS = {
    "INO_TrajError": 2.0,
    "INO_VSeg_MAE": 5.0,
    "Relative_DINO": 0.05,
    "INO_VLM": 0.0,
}
MIN_PSNR_DB = 20.0       # direct bf16-vs-int8 generated-pixel agreement


def make_fixture(root: str):
    """Synthetic eval dataset (the tests' smoke_env contract): 2 CSV
    rows over a 64x48 clip + an ID crop."""
    from PIL import Image

    from frameino_tpu.data.video_io import write_video
    data = os.path.join(root, "data")
    for d in ("csvs", "videos", "ids"):
        os.makedirs(os.path.join(data, d), exist_ok=True)
    H, W, F = 48, 64, 30
    rs = np.random.RandomState(0)
    write_video(os.path.join(data, "videos", "v0.mp4"),
                rs.randint(0, 255, (F, H, W, 3)).astype(np.uint8), fps=12)
    Image.fromarray(rs.randint(0, 255, (20, 16, 3)).astype(
        np.uint8)).save(os.path.join(data, "ids", "obj0.png"))

    def track(x0, y0, dx):
        return [[[x0 + dx * t, y0 + 0.5 * t]] for t in range(F)]

    with open(os.path.join(data, "csvs", "d.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["video_path", "height", "width", "valid_duration",
                    "Panoptic_Segmentation", "Structured_Text_Prompt",
                    "Track_Traj", "Obj_Info", "ID_info"])
        for _ in range(2):
            w.writerow(["v0.mp4", H, W, json.dumps([0, F]),
                        json.dumps([[]]), json.dumps(["toy moves"]),
                        json.dumps([[track(2, 5, 1.0)]]),
                        json.dumps([[["person", 0]]]),
                        json.dumps([[[[[0, 0, 9, 9], "obj0.png", []],
                                      [[500, [5, 2], [62, 46]]]], ]])])
    import yaml
    cfg = {
        "download_folder_path": data,
        "validation_csv_relative_path": "csvs",
        "validation_video_relative_path": "videos",
        "validation_ID_relative_path": "ids",
        "target_height": 32, "target_width": 64,
        "train_frame_num_range": [13, 13], "min_train_frame_num": 9,
        "sample_accelerate_factor": 1,
        "dot_radius": 45, "num_inference_steps": 2,
        "max_text_seq_length": 8, "guidance_scale": 5.0,
        "seed": 0,
    }
    cfg_path = os.path.join(root, "eval.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg_path


def run_eval(cfg_path: str, out_dir: str, family: str, quantize: bool,
             timeout: int = 1800, quantize_vae: bool = False) -> dict:
    cmd = [sys.executable,
           os.path.join(REPO, "scripts", "run_frameino_mass_evaluation.py"),
           "--config_path", cfg_path, "--output_dir", out_dir,
           "--mode", "frame_in", "--family", family, "--smoke",
           "--num_instances", "1", "--backends", "naive"]
    if quantize:
        cmd += ["--quantize", "int8"]
    if quantize_vae:
        cmd += ["--quantize_vae"]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(cmd, capture_output=True, text=True,
                       timeout=timeout, env=env, cwd=REPO)
    if r.returncode != 0:
        raise RuntimeError(f"{family} quantize={quantize} failed:\n"
                           + r.stderr[-3000:])
    with open(os.path.join(out_dir, "results.json")) as f:
        return json.load(f)


def video_psnr(path_a: str, path_b: str) -> float:
    from frameino_tpu.data.video_io import decode_video
    a = decode_video(path_a).astype(np.float64)
    b = decode_video(path_b).astype(np.float64)
    n = min(len(a), len(b))
    mse = float(np.mean((a[:n] - b[:n]) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


def certify_family(cfg_path: str, out_root: str, family: str,
                   quantize_vae: bool = False) -> dict:
    bf16_dir = os.path.join(out_root, f"{family}_bf16")
    int8_dir = os.path.join(out_root, f"{family}_int8")
    bf16 = run_eval(cfg_path, bf16_dir, family, quantize=False)
    int8 = run_eval(cfg_path, int8_dir, family, quantize=True,
                    quantize_vae=quantize_vae and family == "wan")
    report = {"metrics": {}, "pass": True}
    for metric, budget in BUDGETS.items():
        if metric not in bf16:
            continue
        delta = abs(float(int8[metric]) - float(bf16[metric]))
        ok = delta <= budget
        report["metrics"][metric] = {
            "bf16": float(bf16[metric]), "int8": float(int8[metric]),
            "delta": delta, "budget": budget, "pass": ok}
        report["pass"] &= ok
    va = os.path.join(bf16_dir, "instance0", "generated.mp4")
    vb = os.path.join(int8_dir, "instance0", "generated.mp4")
    if os.path.exists(va) and os.path.exists(vb):
        psnr = video_psnr(va, vb)
        report["generated_psnr_db"] = psnr
        report["psnr_pass"] = psnr >= MIN_PSNR_DB
        report["pass"] &= report["psnr_pass"]
    return report


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", required=True)
    p.add_argument("--families", nargs="+",
                   default=["wan", "cogvideox"])
    p.add_argument("--report", default=None,
                   help="where to write the certification JSON "
                        "(default <output_dir>/INT8_PARITY.json)")
    p.add_argument("--quantize_vae", action="store_true",
                   help="certify the int8 side WITH the Wan VAE's "
                        "inner convs also quantized (w8a8 serving "
                        "decode; models/quant.quantize_wan_vae_int8)")
    args = p.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    cfg_path = make_fixture(args.output_dir)
    report = {}
    ok = True
    for family in args.families:
        report[family] = certify_family(cfg_path, args.output_dir, family,
                                        quantize_vae=args.quantize_vae)
        ok &= report[family]["pass"]
        print(f"{family}: {'PASS' if report[family]['pass'] else 'FAIL'} "
              f"{json.dumps(report[family]['metrics'])}")
    report["certified"] = ok
    out = args.report or os.path.join(args.output_dir, "INT8_PARITY.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"int8 certification {'PASSED' if ok else 'FAILED'} -> {out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
