#!/usr/bin/env python
"""Full-SDXL joint-step batch sweep (VERDICT r3 next #6): quantify the
"more views per device" MFU lever by running the REAL joint train step
(scripts/bench_joint_full_sdxl.py) at batch 1/2/4/8 and recording
ms/step, views/s, U-Net MFU floor, and the memory_analysis HBM numbers
per batch into BATCH_SWEEP.json at the repo root — bench.py folds that
file into the round artifact as ``joint_batch_sweep``.

Each batch size is its own multi-minute XLA compile on the tunnel, which
is why this runs out-of-band rather than inside the driver-budgeted
bench.py.  Reference contrast: training batch hardcoded 1
(/root/reference/train.py:159), inference batch 2 (:351).

Usage: python scripts/bench_batch_sweep.py [--batches 1,2,4,8]
       [--timeout 2400] [--out BATCH_SWEEP.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.join(os.path.dirname(__file__), "..")


def run_one(batch: int, remat: bool, timeout: int):
    cmd = [sys.executable,
           os.path.join(ROOT, "scripts", "bench_joint_full_sdxl.py"),
           "--batch", str(batch), "--iters", "3"]
    if remat:
        cmd.append("--remat")
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"batch": batch, "remat": remat,
                "error": f"timeout after {timeout}s"}
    if proc.returncode != 0:
        tail = proc.stderr[-400:]
        low = proc.stderr.lower()
        # TPU OOM text varies: "RESOURCE_EXHAUSTED … Ran out of memory in
        # memory space hbm", or just the buffer-assignment dump
        oom = ("resource_exhausted" in low or "out of memory" in low
               or "Allocation type: HLO temp" in proc.stderr)
        return {"batch": batch, "remat": remat,
                "error": "OOM" if oom else f"rc={proc.returncode}",
                "stderr_tail": tail}
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    out["wall_s"] = round(time.time() - t0, 0)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument("--out", default=os.path.join(ROOT, "BATCH_SWEEP.json"))
    args = ap.parse_args()

    # merge with any existing record (keyed by (batch, remat)): the 4/8
    # rows run as a separate invocation from the 1/2 rows and must not
    # erase them
    rows = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            rows = list(json.load(f).get("rows", []))
        for r in rows:
            # retired field: never populated on the axon backend (always
            # 0.0); superseded by (hbm_gb, hbm_measure) from
            # measured_hbm_gb (VERDICT r4 weak #2)
            r.pop("peak_hbm_gb", None)

    def upsert(row):
        key = (row.get("batch"), row.get("remat"))
        for i, r in enumerate(rows):
            if (r.get("batch"), r.get("remat")) == key:
                rows[i] = row
                return
        rows.append(row)

    for b in [int(x) for x in args.batches.split(",")]:
        # batch 1 fits without remat (measured r3); larger batches double+
        # the U-Net activation temps past 16 GB, so they run rematerialized.
        # Record the no-remat batch-2 attempt too: its failure mode is data.
        configs = [(False, True)] if b == 1 else (
            [(False, False), (True, True)] if b == 2 else [(True, True)])
        for remat, required in configs:
            print(f"sweep: batch={b} remat={remat}…", file=sys.stderr,
                  flush=True)
            row = run_one(b, remat, args.timeout)
            print(f"  -> {row}", file=sys.stderr, flush=True)
            upsert(row)
            with open(args.out, "w") as f:      # persist incrementally
                json.dump({"workload": "full-SDXL joint train step "
                                       "(512^2/64^2, fwd+bwd+AdamW, frozen "
                                       "bf16, donated)",
                           "rows": rows}, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
