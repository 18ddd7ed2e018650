#!/usr/bin/env python
"""Prove the serving warm-start: cold vs warm first-request latency
across a REAL process restart, through the exact serving surface.

Protocol (VERDICT r4 next #2; the reference's interactivity bar is the
gradio app's per-request latency, /root/reference/app.py:322-333):

1. Create a FRESH persistent-compilation-cache dir (so "cold" is
   honest — nothing pre-populated).
2. COLD process: ``serve.py --random_init --warmup <shapes> \
   --warmup_only --compilation_cache_dir <fresh>`` — each warmup shape
   goes through PipelineServer.handle_generate (the real request
   path), paying the full XLA compile; per-shape first-request seconds
   are parsed from its WARMSTART_JSON line.
3. WARM process: the SAME command in a NEW os process. If the
   persistent cache works on this platform, every first request
   replays its executables from disk and costs ~run time only.

Weights are full-size random-init (--random_init): XLA compiles by
shape/dtype, so compile+run timing is identical to checkpointed
serving while needing no checkpoint in this environment.

Emits ONE JSON line (WARM_START_r0N artifact) with per-shape
cold/warm seconds and the cache-dir entry count/bytes.

Usage:
  python scripts/bench_warm_start.py                       # wan leg
  python scripts/bench_warm_start.py --family cogvideox \
      --shapes 448x640x49:2        # Cog protocol shape, incl. the
                                   # streaming-VAE first-chunk program
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(family: str, shapes: str, cache_dir: str, quantize=None):
    cmd = [sys.executable, os.path.join(REPO, "scripts", "serve.py"),
           "--family", family, "--random_init", "--warmup", shapes,
           "--warmup_only", "--compilation_cache_dir", cache_dir]
    if quantize:
        cmd += ["--quantize", quantize]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          cwd=REPO, timeout=7200)
    wall = time.time() - t0
    sys.stderr.write(proc.stderr[-4000:] + "\n")
    for line in proc.stdout.splitlines():
        sys.stderr.write(line + "\n")
        if line.startswith("WARMSTART_JSON: "):
            out = json.loads(line[len("WARMSTART_JSON: "):])
            out["process_wall_s"] = round(wall, 1)
            return out
    raise RuntimeError(
        f"serve.py produced no WARMSTART_JSON (rc={proc.returncode}):\n"
        f"{proc.stdout[-2000:]}")


def cache_stats(cache_dir: str):
    n, total = 0, 0
    for root, _dirs, files in os.walk(cache_dir):
        for f in files:
            n += 1
            total += os.path.getsize(os.path.join(root, f))
    return {"entries": n, "bytes": total}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["wan", "cogvideox"],
                    default="wan")
    # three resolutions OUTSIDE the documented warmup set
    # (480x832x81 / 448x640x49), on the 64-bucket grid, few steps:
    # compile cost is steps-independent (denoise is one scanned
    # program), so 4 steps measures the compile story without paying
    # 50 steps of run time per leg.
    ap.add_argument("--shapes",
                    default="384x704x33:4,448x576x49:4,512x896x33:4")
    ap.add_argument("--quantize", default=None, choices=["int8"])
    ap.add_argument("--cache_dir", default=None,
                    help="default: fresh temp dir (honest cold start)")
    args = ap.parse_args()

    cache_dir = args.cache_dir or tempfile.mkdtemp(
        prefix="frameino_warmstart_cache_")
    fresh = not os.listdir(cache_dir) if os.path.isdir(cache_dir) \
        else True

    sys.stderr.write(f"cache dir: {cache_dir} (fresh={fresh})\n"
                     f"=== COLD process ===\n")
    cold = run_leg(args.family, args.shapes, cache_dir, args.quantize)
    stats = cache_stats(cache_dir)
    sys.stderr.write(f"cache after cold: {stats}\n=== WARM process "
                     f"(restart, same cache) ===\n")
    warm = run_leg(args.family, args.shapes, cache_dir, args.quantize)

    rows = []
    for c, w in zip(cold["shapes"], warm["shapes"]):
        assert c["shape"] == w["shape"]
        rows.append({"shape": c["shape"], "steps": c["steps"],
                     "cold_first_request_s": c["first_request_s"],
                     "warm_first_request_s": w["first_request_s"],
                     "speedup": round(c["first_request_s"]
                                      / max(w["first_request_s"], 1e-9),
                                      1)})
    print(json.dumps({
        "metric": f"{args.family}_serving_warm_start",
        "unit": "first-request seconds per shape, cold vs restarted-"
                "warm process (random-init full-size weights, fresh "
                "persistent cache)",
        "cache_was_fresh": fresh,
        "quantize": args.quantize,
        "rows": rows,
        "cold_process_wall_s": cold["process_wall_s"],
        "warm_process_wall_s": warm["process_wall_s"],
        "cache": stats,
        "cache_dir": cache_dir,
    }))


if __name__ == "__main__":
    main()
