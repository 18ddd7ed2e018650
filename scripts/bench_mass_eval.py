#!/usr/bin/env python
"""Mass-evaluation wall-clock ON the TPU over synthetic fixtures.

VERDICT r4 next #1: the reference pays hours of GPU per evaluation run
(/root/reference/evaluation/mass_evaluation.py:20-63 — CoTracker3,
SAM2.1, DINOv2 and a 32B VLM judge, re-loaded torch graphs, per
instance). This measures OUR cost end to end on one chip:

1. Build a synthetic fixture dataset at the published eval protocol
   shape (448x640, 49 frames, 50 denoise steps) — 2 instances: the
   first pays every XLA compile, the second is steady state.
2. GENERATION leg: `run_frameino_mass_evaluation.py --family wan
   --quantize int8 --quantize_vae` with full-size random weights on the
   TPU (XLA compiles by shape/dtype — random weights give exact
   production timing without a checkpoint; scores are not the point).
3. METRICS leg: the same driver `--evaluate-only --backends jax-random`
   — released-SCALE JAX CoTracker3/SAM2.1/DINOv2 graphs on the chip
   (the judge stays naive: 32B does not fit one chip; its tower is
   timed in bench_perception.py).

Emits ONE JSON line (MASS_EVAL_r0N artifact): per-instance generation
seconds (compile vs steady), per-metric evaluation seconds, and the
total seconds/instance the steady-state pipeline pays.

Usage: python scripts/bench_mass_eval.py [--out results_dir]
       [--steps 50] [--instances 2] [--height 448] [--width 640]
"""

import argparse
import csv
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def build_fixture(root: str, H: int, W: int, F: int, n: int):
    """Fixture dataset in the production CSV schema: one HxW video, an
    ID crop, n CSV rows with a moving one-object trajectory."""
    import cv2

    data = os.path.join(root, "data")
    for d in ("csvs", "videos", "ids"):
        os.makedirs(os.path.join(data, d), exist_ok=True)
    rs = np.random.RandomState(0)
    vw = cv2.VideoWriter(os.path.join(data, "videos", "v0.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 16, (W, H))
    # smooth moving blob, not iid noise — lets the VAE/codec behave
    # like real footage rather than worst-case entropy
    base = rs.randint(0, 255, (H, W, 3)).astype(np.uint8)
    base = cv2.GaussianBlur(base, (31, 31), 0)
    for t in range(F * 2):
        frame = np.roll(base, 3 * t, axis=1)
        cv2.circle(frame, (40 + 4 * t, H // 2), 30, (255, 64, 64), -1)
        vw.write(frame)
    vw.release()
    cv2.imwrite(os.path.join(data, "ids", "obj0.png"),
                rs.randint(0, 255, (64, 48, 3)).astype(np.uint8))

    def track(x0, y0, dx):
        return [[[x0 + dx * t, y0 + 0.3 * t]] for t in range(F * 2)]

    with open(os.path.join(data, "csvs", "d.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["video_path", "height", "width", "valid_duration",
                    "Panoptic_Segmentation", "Structured_Text_Prompt",
                    "Track_Traj", "Obj_Info", "ID_info"])
        for i in range(n):
            w.writerow(["v0.mp4", H, W, json.dumps([0, F * 2]),
                        json.dumps([[]]),
                        json.dumps(["a red ball rolls right"]),
                        json.dumps([[track(40.0 + i, H / 2, 4.0)]]),
                        json.dumps([[["ball", 0]]]),
                        json.dumps([[[[[0, 0, 47, 63], "obj0.png", []],
                                      [[F, [40, H // 2 - 30],
                                        [88, H // 2 + 30]]]], ]])])
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--instances", type=int, default=2)
    ap.add_argument("--height", type=int, default=448)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--skip_generation", action="store_true",
                    help="reuse --out artifacts; time only the metrics")
    ap.add_argument("--smoke", action="store_true",
                    help="CPU protocol check: tiny models, naive "
                         "metric backends, timings meaningless")
    args = ap.parse_args()

    out_dir = args.out or tempfile.mkdtemp(prefix="frameino_masseval_")
    root = tempfile.mkdtemp(prefix="frameino_masseval_fixture_")
    data = build_fixture(root, args.height, args.width, 49,
                         args.instances)

    import yaml
    cfg = {
        "download_folder_path": data,
        "validation_csv_relative_path": "csvs",
        "validation_video_relative_path": "videos",
        "validation_ID_relative_path": "ids",
        "target_height": args.height, "target_width": args.width,
        "sample_accelerate_factor": 1,
        "train_frame_num_range": [49, 49], "min_train_frame_num": 49,
        "dot_radius": 6, "drop_FrameIn_prob": 0.0,
        "faster_motion_prob": 0.0,
        "num_inference_steps": args.steps, "guidance_scale": 5.0,
        "max_text_seq_length": 512,
    }
    cfg_path = os.path.join(root, "eval.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    base = [sys.executable,
            os.path.join(REPO, "scripts", "run_frameino_mass_evaluation.py"),
            "--config_path", cfg_path, "--output_dir", out_dir,
            "--mode", "frame_in", "--family", "wan",
            "--num_instances", str(args.instances)]
    if args.smoke:
        base.append("--smoke")
    metric_backends = "naive" if args.smoke else "jax-random"

    gen_times = None
    gen_wall = None
    if not args.skip_generation:
        t0 = time.time()
        gen_cmd = base + ["--backends", "naive"] if args.smoke else \
            base + ["--quantize", "int8", "--quantize_vae",
                    "--backends", "naive"]
        r = subprocess.run(
            gen_cmd,
            cwd=REPO, capture_output=True, text=True, timeout=7200)
        gen_wall = time.time() - t0
        sys.stderr.write(r.stderr[-3000:] + "\n")
        for line in r.stdout.splitlines():
            sys.stderr.write(line + "\n")
            if line.startswith("GENERATION_TIMES: "):
                gen_times = json.loads(line[len("GENERATION_TIMES: "):])
        if r.returncode != 0 or gen_times is None:
            raise RuntimeError(f"generation leg failed rc={r.returncode}:\n"
                               f"{r.stdout[-2000:]}")

    t0 = time.time()
    r = subprocess.run(base + ["--evaluate-only", "--backends",
                               metric_backends],
                       cwd=REPO, capture_output=True, text=True,
                       timeout=7200)
    eval_wall = time.time() - t0
    sys.stderr.write(r.stderr[-3000:] + "\n" + r.stdout[-1500:] + "\n")
    if r.returncode != 0:
        raise RuntimeError(f"metrics leg failed rc={r.returncode}")
    results = json.load(open(os.path.join(out_dir, "results.json")))
    timings = results.get("_timings_s", {})
    n = results.get("_num_instances", args.instances)

    steady_gen = gen_times[-1] if gen_times and len(gen_times) > 1 \
        else (gen_times[0] if gen_times else None)
    metrics_per_inst = round(sum(timings.values()) / max(n, 1), 1)
    print(json.dumps({
        "metric": "mass_evaluation_wall_clock_tpu",
        "unit": "seconds (448x640x49f, 50-step int8 Wan gen + "
                "released-scale JAX perception metrics, one v5e chip)",
        "instances": n,
        "generation_s_per_instance": gen_times,
        "generation_steady_s": steady_gen,
        "generation_leg_wall_s": round(gen_wall, 1) if gen_wall else None,
        "metrics_timings_s": timings,
        "metrics_s_per_instance": metrics_per_inst,
        "metrics_leg_wall_s": round(eval_wall, 1),
        "steady_seconds_per_instance":
            round((steady_gen or 0) + metrics_per_inst, 1),
        "judge_backend": "naive (32B judge does not fit one chip; "
                         "tower timed in bench_perception.py)",
        "output_dir": out_dir,
    }))


if __name__ == "__main__":
    main()
