#!/usr/bin/env python
"""Paired memory-bandwidth control for the scaling protocol (round 5).

The paired engine protocol (run_scaling_executors.py --pairs) shows the
LONE 8-core leg stable across pairs while the 4x8-core concurrent leg
degrades — the question is whether that tax is the engine's or the
box's. This control removes the engine entirely: the same paired,
order-alternating measurement over a pure numpy memcpy/reduce workload
(the memory-traffic shape of a shuffle-heavy build: stream a large
array, transform, reduce), 1 group of 8 pinned processes (lone) vs 4
groups of 8 on disjoint cores (concurrent). If this control reproduces
the engine's pair ratios, the residual is the box's memory subsystem /
host scheduling under 32-way sustained demand, not a plan defect.

Usage: python scripts/paired_bandwidth_control.py [--pairs 3]
Appends results to SCALING.json under "bandwidth_paired_control".
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import numpy as np, sys, time
# ~256 MB working set per process: far past LLC, like a shuffle spill
n = 32 * 1024 * 1024
a = np.arange(n, dtype=np.float64)
b = np.empty_like(a)
reps = int(sys.argv[1])
t0 = time.time()
acc = 0.0
for _ in range(reps):
    np.multiply(a, 1.0000001, out=b)   # stream read+write
    acc += float(b[::4096].sum())      # touch + reduce
print(time.time() - t0)
"""


def run_group(cpu_lo: int, cpu_hi: int, procs: int, reps: int) -> float:
    """Launch `procs` pinned python workers on [cpu_lo, cpu_hi]; return
    the max wall (group completes when its slowest member does)."""
    ps = [
        subprocess.Popen(
            ["taskset", "-c", f"{cpu_lo}-{cpu_hi}", sys.executable, "-c",
             WORKER, str(reps)],
            stdout=subprocess.PIPE, text=True,
        )
        for _ in range(procs)
    ]
    walls = []
    for p in ps:
        out, _ = p.communicate()
        assert p.returncode == 0
        walls.append(float(out.strip().splitlines()[-1]))
    return max(walls)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--reps", type=int, default=40)
    args = ap.parse_args()

    pairs = []
    for t in range(args.pairs):
        def lone():
            return run_group(0, 7, 8, args.reps)

        def concurrent():
            groups = []
            ps = []
            for g in range(4):
                ps.append(
                    subprocess.Popen(
                        [sys.executable, __file__, "--_group",
                         str(g * 8), str(g * 8 + 7), str(args.reps)],
                        stdout=subprocess.PIPE, text=True,
                    )
                )
            for p in ps:
                out, _ = p.communicate()
                assert p.returncode == 0
                groups.append(float(out.strip().splitlines()[-1]))
            return max(groups)

        if t % 2 == 0:
            lw, cw, order = lone(), concurrent(), "lone-first"
        else:
            cw = concurrent()
            lw = lone()
            order = "concurrent-first"
        pair = {
            "pair": t,
            "order": order,
            "lone_sec": round(lw, 2),
            "concurrent_sec": round(cw, 2),
            "eff": round(lw / cw, 4),
        }
        pairs.append(pair)
        print(json.dumps(pair), file=sys.stderr)

    med = statistics.median(p["eff"] for p in pairs)
    result = {
        "workload": "numpy 256MB/proc stream-multiply+reduce, 8 procs "
                    "lone vs 4x8 procs concurrent, paired order-"
                    "alternating (no Spark, no JVM, no disk)",
        "pairs": pairs,
        "eff_median": round(med, 4),
        "eff_spread": [
            min(p["eff"] for p in pairs), max(p["eff"] for p in pairs)
        ],
    }
    print(json.dumps(result, indent=2))
    path = os.path.join(REPO, "SCALING.json")
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
        data["bandwidth_paired_control"] = result
        with open(path, "w") as f:
            json.dump(data, f, indent=2)


if __name__ == "__main__":
    if len(sys.argv) >= 5 and sys.argv[1] == "--_group":
        lo, hi, reps = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
        print(run_group(lo, hi, 8, reps))
    else:
        main()
