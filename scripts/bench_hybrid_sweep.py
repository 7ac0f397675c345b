#!/usr/bin/env python
"""Hybrid-encode frontier sweep (VERDICT r4 weak #1 / next #3).

The joint step has two measured endpoints — exact 8-corner hash encode
(419 ms full-SDXL, highest quality) and fully-stochastic one-corner
(111 ms, −0.2 dB after a warmup schedule) — and an implemented but
never-measured middle: the HYBRID encode
(``NeRFConfig.hash_stochastic_min_level``), exact on the coarse dense
levels (cache-cheap gathers) and one-corner on the fine hashed levels
that dominate gather/scatter cost.  This script measures the frontier:

  * speed leg: the full-SDXL joint train step
    (scripts/bench_joint_full_sdxl.py) at min_level ∈ {exact, 12, 8, 4,
    stochastic} — ms/step, rays/s;
  * quality leg: the synthetic-scene NeRF fit (scripts/fit_nerf.py,
    fixed steps) at the same points — converged PSNR.

Writes HYBRID_SWEEP.json at the repo root; bench.py folds it into the
round artifact as ``joint_hybrid_sweep`` and emits the recommended
operating point as ``joint_step_ms_hybrid``.

Each speed point is its own multi-minute XLA compile on the tunnel —
run out-of-band, like bench_batch_sweep.py.

Usage: python scripts/bench_hybrid_sweep.py [--levels 12,8,4]
       [--fit-steps 2000] [--skip-speed|--skip-quality]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.join(os.path.dirname(__file__), "..")


def run_speed(min_level, timeout):
    """One full-SDXL joint-step measurement.  min_level: None = exact,
    0 = fully stochastic, k = hybrid."""
    cmd = [sys.executable,
           os.path.join(ROOT, "scripts", "bench_joint_full_sdxl.py"),
           "--iters", "3"]
    if min_level is not None:
        cmd += ["--stochastic", "--stochastic-min-level", str(min_level)]
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"mode": _name(min_level), "error": f"timeout {timeout}s"}
    if proc.returncode != 0:
        return {"mode": _name(min_level), "error": f"rc={proc.returncode}",
                "stderr_tail": proc.stderr[-300:]}
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    return {"mode": _name(min_level),
            "joint_step_ms": out["joint_step_full_sdxl_ms"],
            "rays_per_sec": round(8192 / out["joint_step_full_sdxl_ms"] * 1e3,
                                  1),
            "compile_s": out.get("compile_s"),
            "wall_s": round(time.time() - t0, 0)}


def run_quality(min_level, steps, timeout):
    """One synthetic-scene fit (fixed steps) → mean PSNR."""
    cmd = [sys.executable, os.path.join(ROOT, "scripts", "fit_nerf.py"),
           "--steps", str(steps), "--out", f"/tmp/hybrid_fit_{min_level}",
           "--log-every", str(steps)]
    if min_level is not None:
        cmd += ["--stochastic", "--stochastic-min-level", str(min_level)]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"mode": _name(min_level), "error": f"timeout {timeout}s"}
    m = re.search(r"FINAL: mean PSNR over \d+ views = ([0-9.]+) dB",
                  proc.stdout)
    if proc.returncode != 0 or not m:
        return {"mode": _name(min_level), "error": f"rc={proc.returncode}",
                "stderr_tail": proc.stderr[-300:]}
    return {"mode": _name(min_level), "fit_psnr_db": float(m.group(1)),
            "fit_steps": steps}


def _name(min_level):
    if min_level is None:
        return "exact"
    if min_level == 0:
        return "stochastic"
    return f"hybrid_min_level_{min_level}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="12,8,4",
                    help="hybrid min_levels between the endpoints")
    ap.add_argument("--fit-steps", type=int, default=2000)
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument("--skip-speed", action="store_true")
    ap.add_argument("--skip-quality", action="store_true")
    ap.add_argument("--out", default=os.path.join(ROOT, "HYBRID_SWEEP.json"))
    args = ap.parse_args()

    points = [None] + [int(x) for x in args.levels.split(",") if x] + [0]
    # merge into any existing record: speed and quality legs run as
    # separate invocations (each is an hour-plus of TPU), and a later
    # pass must not erase the earlier one's rows
    rows = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            for r in json.load(f).get("rows", []):
                rows[r["mode"]] = r

    def flush():
        with open(args.out, "w") as f:
            json.dump({
                "workload_speed": "full-SDXL joint train step (8192 rays, "
                                  "budget 2^18, frozen bf16, donated)",
                "workload_quality": f"synthetic-scene fit_nerf.py "
                                    f"{args.fit_steps} steps",
                "rows": list(rows.values()),
            }, f, indent=1)

    for lv in points:
        name = _name(lv)
        rows.setdefault(name, {"mode": name})
        if not args.skip_quality:
            print(f"quality: {name}…", file=sys.stderr, flush=True)
            rows[name].update(run_quality(lv, args.fit_steps, args.timeout))
            flush()
        if not args.skip_speed:
            print(f"speed: {name}…", file=sys.stderr, flush=True)
            rows[name].update(run_speed(lv, args.timeout))
            flush()
        print(f"  -> {rows[name]}", file=sys.stderr, flush=True)
    print(json.dumps(list(rows.values())))


if __name__ == "__main__":
    main()
