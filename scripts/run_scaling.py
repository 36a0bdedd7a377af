#!/usr/bin/env python
"""Scaling-evidence driver (BASELINE.md protocol, north_rule criterion).

1. Zips the searchengine_spark package.
2. spark-submit --py-files the zip + scripts/scaling_job.py at
   local[N] and local[4N] (default N=8 -> 8 vs 32) on the same input.
3. Asserts the two runs' top-k sha256 are identical (rank-identity) and
   computes scaling_efficiency = throughput(4N) / (4 * throughput(N)).
4. Writes SCALING.json at the repo root.

Usage: python scripts/run_scaling.py [--n 8] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def zip_package(out: str) -> None:
    pkg = os.path.join(REPO, "searchengine_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith((".pyc",)) or "__pycache__" in root:
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, REPO))


def submit(cpus: int, zip_path: str, sf_dir: str, out: str) -> dict:
    cmd = [
        "spark-submit",
        "--master", f"local[{cpus}]",
        "--conf", f"spark.sql.shuffle.partitions={cpus}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=8g",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "scaling_job.py"),
        "--sf-dir", sf_dir,
        "--out", out,
        "--index-dir", f"/tmp/se_scaling_index_{cpus}",
    ]
    print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True, cwd=REPO)
    with open(out) as f:
        return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    zip_path = "/tmp/searchengine_spark.zip"
    zip_package(zip_path)

    lo = submit(args.n, zip_path, args.sf_dir, f"/tmp/scaling_{args.n}.json")
    hi = submit(args.n * 4, zip_path, args.sf_dir, f"/tmp/scaling_{args.n * 4}.json")

    rank_identical = lo["topk_sha256"] == hi["topk_sha256"]
    eff = hi["build_docs_per_sec"] / (4.0 * lo["build_docs_per_sec"])
    summary = {
        "sf_dir": args.sf_dir,
        "n_cpus": args.n,
        "hi_cpus": args.n * 4,
        "build_docs_per_sec_N": lo["build_docs_per_sec"],
        "build_docs_per_sec_4N": hi["build_docs_per_sec"],
        "scaling_efficiency_build": round(eff, 4),
        "query_p50_sec_N": lo["query_p50_sec"],
        "query_p50_sec_4N": hi["query_p50_sec"],
        "rank_identical": rank_identical,
        "topk_sha256": lo["topk_sha256"],
        "runs": {"N": lo, "4N": hi},
    }
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    if not rank_identical:
        sys.exit("FAIL: top-k outputs differ between parallelism levels")


if __name__ == "__main__":
    main()
