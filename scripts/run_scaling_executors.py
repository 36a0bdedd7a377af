#!/usr/bin/env python
"""Executor-sharded scaling protocol (VERDICT r3 "Next round" #5).

The north_rule's criterion is throughput scaling from N to 4N
EXECUTORS. The single-JVM protocol (run_scaling.py, SCALING.json history)
measures thread scaling inside one JVM and is capped by shared-JVM GC /
allocator contention that per-node-isolated executors do not share
(BASELINE.md; this box's pure-CPU ceiling is itself ~0.88). This script
models executors as what they are on a cluster — separate pinned JVMs:

  * the corpus is deterministically expanded and split into 4 equal
    shards (by replica id — content identical across protocol runs);
  * N-executor level: ONE spark-submit JVM pinned to N cores builds all
    4 shard indexes sequentially and answers the query set per shard;
  * 4N-executor level: FOUR concurrent spark-submit JVMs, each pinned
    to its own disjoint N cores, one shard each;
  * throughput = total docs / build wall (sum of in-job build times at
    the N level, max at the 4N level — JVM boot and warm-up excluded at
    both, as on a long-lived cluster);
  * rank identity: every shard's top-k rows are merged with one
    deterministic rule (score desc, shard asc, doc_id asc) and hashed —
    the N-level and 4N-level hashes must be byte-identical;
  * the pure-CPU multiprocessing ceiling control runs on the same
    pinned cores for the efficiency-vs-ceiling reading.

Index sharding is the standard distributed-search layout (one index
partition per executor group, scatter-gather at query time); the
all-shards-in-one-shuffle build path is separately evidenced by the
single-JVM protocol and by rank-identity of its outputs across core
counts.

Storage: shards, indexes, and spark.local.dir live under /dev/shm.
Measured on this sandbox's single virtio disk: ONE writer gets 119
MB/s but FOUR concurrent writers share 49 MB/s TOTAL — a 2.4x
aggregate collapse that throttles exactly the 4-executor level. Real
cluster nodes each have their own disks (aggregate bandwidth scales
with node count), so RAM-backed storage is the honest per-node-disk
analogue on one box; the box's memory bandwidth does scale (the
pure-CPU ceiling control reads ~1.0 at 8->32 procs).

Usage: python scripts/run_scaling_executors.py [--n 8] [--replicas 400]
Writes SCALING.json.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import statistics
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_SHARDS = 4


def zip_package(out: str) -> None:
    pkg = os.path.join(REPO, "searchengine_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith((".pyc",)) or "__pycache__" in root:
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, REPO))


def prepare_shards(sf_dir: str, replicas: int) -> list[str]:
    """Expand the corpus x replicas and split by replica id into
    N_SHARDS equal multi-file parquet shard dirs (deterministic)."""
    from pyspark.sql import SparkSession, functions as F

    dirs = [
        f"/dev/shm/se_scaling/shard{replicas}_{i}" for i in range(N_SHARDS)
    ]
    if all(os.path.exists(os.path.join(d, "_SUCCESS")) for d in dirs):
        return dirs
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, REPO)
    from searchengine_spark.sources.corpus import load_documents_as_corpus

    corpus = load_documents_as_corpus(spark, sf_dir)
    reps = spark.range(replicas).select(F.col("id").alias("_rep"))
    expanded = corpus.crossJoin(F.broadcast(reps)).select(
        "repo",
        F.concat(F.lit("r"), F.col("_rep").cast("string"), F.lit("/"), "path").alias("path"),
        "commit",
        "lang",
        "content",
        (F.col("_rep") % N_SHARDS).alias("_shard"),
    )
    for i, d in enumerate(dirs):
        (
            expanded.filter(F.col("_shard") == i)
            .drop("_shard")
            .repartition(16)
            .write.mode("overwrite")
            .parquet(d)
        )
    spark.stop()
    return dirs


def submit(cpu_lo: int, cpu_hi: int, cpus: int, zip_path: str,
           shard_dirs: list[str], out: str, tag: str) -> subprocess.Popen:
    cmd = [
        "taskset", "-c", f"{cpu_lo}-{cpu_hi}",
        "spark-submit",
        "--master", f"local[{cpus}]",
        "--conf", f"spark.sql.shuffle.partitions={cpus}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=16g",
        "--conf", "spark.driver.extraJavaOptions=-XX:+UseParallelGC",
        "--conf", f"spark.local.dir=/dev/shm/se_scaling/local_{tag}",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "scaling_exec_job.py"),
        "--shard-dirs", ",".join(shard_dirs),
        "--index-base", f"/dev/shm/se_scaling/idx_{tag}",
        "--cpus", str(cpus),
        "--out", out,
    ]
    print("+", " ".join(cmd), file=sys.stderr)
    return subprocess.Popen(
        cmd, cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
    )


def merged_hash(shard_reports: list[dict]) -> str:
    """Scatter-gather merge: per query, union all shards' top-k and keep
    the global top-10 by (score desc, shard asc, doc_id asc)."""
    queries = sorted(shard_reports[0]["results"].keys())
    digest = hashlib.sha256()
    for qid in queries:
        rows = []
        for rep in sorted(shard_reports, key=lambda r: r["shard"]):
            for doc_id, score in rep["results"][qid]:
                rows.append((-score, rep["shard"], doc_id))
        rows.sort()
        for neg_score, shard, doc_id in rows[:10]:
            digest.update(f"{qid}|{shard}|{doc_id}|{-neg_score}\n".encode())
    return digest.hexdigest()


def cpu_ceiling(cpu_lo: int, cpu_hi: int, procs: int) -> float:
    code = (
        "import multiprocessing as mp, time, hashlib, re, sys\n"
        "TEXT=('def foo(bar):\\n    return [x**2 for x in range(100)]\\n'*200)\n"
        "RX=re.compile(r'[a-z_]+')\n"
        "def one(_):\n"
        "    h=hashlib.sha256()\n"
        "    for _ in range(60): h.update(' '.join(RX.findall(TEXT)).encode())\n"
        "    return h.hexdigest()[:8]\n"
        "if __name__=='__main__':\n"
        "    n=int(sys.argv[1]); N=256\n"
        "    with mp.Pool(n) as p:\n"
        "        t0=time.time(); p.map(one, range(N), chunksize=max(1,N//(n*8)))\n"
        "        print(N/(time.time()-t0))\n"
    )
    with open("/tmp/_cpu_ceiling.py", "w") as f:
        f.write(code)
    out = subprocess.run(
        ["taskset", "-c", f"{cpu_lo}-{cpu_hi}", sys.executable,
         "/tmp/_cpu_ceiling.py", str(procs)],
        capture_output=True, text=True, check=True,
    )
    return float(out.stdout.strip().splitlines()[-1])


def run_paired(args) -> None:
    """PAIRED interleaved estimator (VERDICT r4 "Next round" #1).

    Peak-of-trials at each level samples DIFFERENT host-supply windows,
    so the ratio of two peaks is noise-dominated on this VM (observed
    same-command swings of 2x+ with guest steal%%=0). Instead, each pair
    measures BOTH levels back-to-back in the same window:

      * lone leg:       ONE JVM pinned to cores 0..n-1 builds shard 0
                        (N executors' throughput per executor);
      * concurrent leg: FOUR JVMs, one shard each, pinned to disjoint
                        n-core groups (4N executors).

    Work per executor is identical at both levels (weak scaling — how a
    cluster actually grows: 4x executors, 4x data), so
    tput_4N / (4 * tput_N) reduces to lone_wall / concurrent_wall.
    Per pair we record lone/conc_shard0 (same shard, same cores — pure
    interference) and lone/conc_max (level-completion semantics). Leg
    order alternates L,C / C,L across pairs to cancel linear drift, and
    an n-proc + 4n-proc pure-CPU ceiling control runs adjacent to every
    pair on the same pinned cores. The estimator is the MEDIAN of
    per-pair ratios; the spread is reported alongside.

    Rank identity: every concurrent leg's 4-shard merged top-k hash must
    be byte-identical across pairs, and the lone leg's shard-0 rows must
    equal the concurrent leg's shard-0 rows exactly, every pair.
    """
    n = args.n
    zip_path = "/tmp/searchengine_spark.zip"
    zip_package(zip_path)
    shard_dirs = prepare_shards(args.sf_dir, args.replicas)

    def safe_ceiling(lo, hi, procs):
        try:
            return cpu_ceiling(lo, hi, procs)
        except (subprocess.CalledProcessError, OSError, ValueError) as e:
            print(f"cpu_ceiling control failed ({e})", file=sys.stderr)
            return None

    def lone_leg(t: int) -> dict:
        out = f"/tmp/scaling_pair_lone_t{t}.json"
        p = submit(0, n - 1, n, zip_path, [shard_dirs[0]], out, "N")
        assert p.wait() == 0, "lone leg failed"
        with open(out) as f:
            return json.load(f)["shards"][0]

    def concurrent_leg(t: int) -> list[dict]:
        procs, outs = [], []
        for i, sd in enumerate(shard_dirs):
            out_i = f"/tmp/scaling_pair_conc_{i}_t{t}.json"
            outs.append(out_i)
            procs.append(
                submit(i * n, (i + 1) * n - 1, n, zip_path, [sd], out_i,
                       f"4N_{i}")
            )
        for p in procs:
            assert p.wait() == 0, "a concurrent-leg executor job failed"
        shards = []
        for out_i in outs:
            with open(out_i) as f:
                shards.extend(json.load(f)["shards"])
        return shards

    pairs = []
    merged_hashes = set()
    shard_docs = None
    for t in range(args.pairs):
        ceil_n = safe_ceiling(0, n - 1, n)
        ceil_4n = safe_ceiling(0, 4 * n - 1, 4 * n)
        if t % 2 == 0:
            lone = lone_leg(t)
            conc = concurrent_leg(t)
            order = "lone-first"
        else:
            conc = concurrent_leg(t)
            lone = lone_leg(t)
            order = "concurrent-first"
        shard_docs = lone["n_docs"]
        conc_by_name = {s["shard"]: s for s in conc}
        conc0 = conc_by_name[lone["shard"]]
        assert lone["results"] == conc0["results"], (
            f"pair {t}: lone shard-0 top-k != concurrent shard-0 top-k"
        )
        merged_hashes.add(merged_hash(conc))
        conc_max = max(s["build_sec"] for s in conc)
        pair = {
            "pair": t,
            "order": order,
            "lone_build_sec": lone["build_sec"],
            "concurrent_build_sec_shard0": conc0["build_sec"],
            "concurrent_build_sec_all": sorted(
                s["build_sec"] for s in conc
            ),
            "eff_shard0": round(lone["build_sec"] / conc0["build_sec"], 4),
            "eff_max": round(lone["build_sec"] / conc_max, 4),
            "cpu_ceiling_eff": (
                round(ceil_4n / (4.0 * ceil_n), 4)
                if ceil_n and ceil_4n else None
            ),
            "query_p50_sec_lone": lone["query_p50_sec"],
            "query_p50_sec_concurrent": round(statistics.median(
                [s["query_p50_sec"] for s in conc]), 4),
        }
        pairs.append(pair)
        print(json.dumps(pair), file=sys.stderr)

    effs0 = [p["eff_shard0"] for p in pairs]
    effsm = [p["eff_max"] for p in pairs]
    ceffs = [p["cpu_ceiling_eff"] for p in pairs if p["cpu_ceiling_eff"]]
    med0 = statistics.median(effs0)
    medm = statistics.median(effsm)
    med_lone = statistics.median(p["lone_build_sec"] for p in pairs)
    med_conc = statistics.median(
        max(p["concurrent_build_sec_all"]) for p in pairs
    )
    summary = {
        "protocol": "PAIRED interleaved executor-sharded: each pair runs "
                    "a lone pinned local[N] JVM (one shard) and four "
                    "concurrent pinned local[N] JVMs (one shard each) "
                    "back-to-back in the same host-supply window, leg "
                    "order alternating; estimator = median of per-pair "
                    "lone/concurrent wall ratios (weak scaling: work per "
                    "executor identical at both levels). JVM boot + "
                    "warm-up excluded at both levels.",
        "sf_dir": args.sf_dir,
        "replicas": args.replicas,
        "n_shards": N_SHARDS,
        "cores_per_executor": n,
        "pairs": len(pairs),
        "docs_per_shard": shard_docs,
        "scaling_efficiency_paired_median": round(medm, 4),
        "scaling_efficiency_paired_median_shard0": round(med0, 4),
        "scaling_efficiency_paired_spread_max": [
            min(effsm), max(effsm)
        ],
        "scaling_efficiency_paired_spread_shard0": [
            min(effs0), max(effs0)
        ],
        "cpu_ceiling_efficiency_median": (
            round(statistics.median(ceffs), 4) if ceffs else None
        ),
        "efficiency_vs_ceiling_median": (
            round(medm / statistics.median(ceffs), 4) if ceffs else None
        ),
        "build_docs_per_sec_N": round(shard_docs / med_lone, 2),
        "build_docs_per_sec_4N": round(4 * shard_docs / med_conc, 2),
        "rank_identical": len(merged_hashes) == 1,
        "topk_sha256": sorted(merged_hashes)[0],
        "per_pair": pairs,
    }
    out_path = os.path.join(REPO, "SCALING.json")
    if os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        summary["prior_protocols"] = {
            k: prior.get(k)
            for k in (
                "protocol", "scaling_efficiency_build",
                "build_docs_per_sec_N", "build_docs_per_sec_4N",
                "cpu_ceiling_efficiency", "rank_identical",
                "executor_protocol_history", "single_jvm_protocol_r3",
                "diagnostics",
            )
            if k in prior
        }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(
        {k: v for k, v in summary.items()
         if k not in ("per_pair", "prior_protocols")},
        indent=2,
    ))
    if len(merged_hashes) != 1:
        sys.exit("FAIL: merged top-k differs across pairs")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8,
                    help="cores per executor JVM")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=400)
    ap.add_argument("--trials", type=int, default=2,
                    help="(classic mode) runs per level; PEAK throughput"
                    " is the estimator — identical runs on this VM swing"
                    " 2x+ from host-level interference invisible to the"
                    " guest (steal%%=0 while it happens; see BASELINE.md)")
    ap.add_argument("--pairs", type=int, default=5,
                    help="paired mode: number of interleaved"
                    " lone/concurrent pairs (median of per-pair ratios)")
    ap.add_argument("--classic", action="store_true",
                    help="run the r4 peak-of-trials protocol instead of"
                    " the paired estimator")
    args = ap.parse_args()
    if not args.classic:
        run_paired(args)
        return
    n = args.n

    zip_path = "/tmp/searchengine_spark.zip"
    zip_package(zip_path)
    shard_dirs = prepare_shards(args.sf_dir, args.replicas)

    def safe_ceiling(lo, hi, procs):
        try:
            return cpu_ceiling(lo, hi, procs)
        except (subprocess.CalledProcessError, OSError, ValueError) as e:
            print(f"cpu_ceiling control failed ({e})", file=sys.stderr)
            return None

    # each ceiling control runs IMMEDIATELY BEFORE its engine level on
    # the same cores: host-level interference on this VM swings by >30%
    # across tens of minutes, so a ceiling measured at the end of the
    # protocol can describe a different box than the one the builds ran
    # on (observed: 1.05 vs 0.795 vs 0.63 across three protocol runs)
    ceil_lo = safe_ceiling(0, n - 1, n)

    # --- N-executor level: one JVM, all shards sequentially ---
    best_n = None
    for t in range(args.trials):
        out_n = f"/tmp/scaling_exec_N_t{t}.json"
        p = submit(0, n - 1, n, zip_path, shard_dirs, out_n, "N")
        rc = p.wait()
        assert rc == 0, "N-level job failed"
        with open(out_n) as f:
            rep = json.load(f)
        wall = sum(s["build_sec"] for s in rep["shards"])
        print(f"N trial {t}: {round(wall, 1)} s", file=sys.stderr)
        if best_n is None or wall < best_n[0]:
            best_n = (wall, rep)
    wall_n, rep_n = best_n
    total_docs = sum(s["n_docs"] for s in rep_n["shards"])
    tput_n = total_docs / wall_n

    ceil_hi = safe_ceiling(0, 4 * n - 1, 4 * n)

    # --- 4N-executor level: four concurrent JVMs, one shard each ---
    best_4n = None
    for t in range(args.trials):
        procs, outs = [], []
        for i, sd in enumerate(shard_dirs):
            out_i = f"/tmp/scaling_exec_4N_{i}_t{t}.json"
            outs.append(out_i)
            procs.append(
                submit(i * n, (i + 1) * n - 1, n, zip_path, [sd], out_i,
                       f"4N_{i}")
            )
        for p in procs:
            assert p.wait() == 0, "a 4N-level executor job failed"
        shards = []
        for out_i in outs:
            with open(out_i) as f:
                shards.extend(json.load(f)["shards"])
        wall = max(s["build_sec"] for s in shards)
        print(f"4N trial {t}: {round(wall, 1)} s", file=sys.stderr)
        if best_4n is None or wall < best_4n[0]:
            best_4n = (wall, shards)
    wall_4n, shards_4n = best_4n
    tput_4n = total_docs / wall_4n

    eff = tput_4n / (4.0 * tput_n)
    hash_n = merged_hash(rep_n["shards"])
    hash_4n = merged_hash(shards_4n)

    ceil_eff = (
        ceil_hi / (4.0 * ceil_lo) if ceil_lo and ceil_hi else None
    )

    summary = {
        "protocol": "executor-sharded: 1 pinned local[N] JVM building 4 "
                    "corpus shards sequentially (N executors' worth of "
                    "cores) vs 4 concurrent pinned local[N] JVMs, one "
                    "shard each (4N). JVM boot + warm-up excluded at "
                    "both levels; shards identical at both levels.",
        "sf_dir": args.sf_dir,
        "replicas": args.replicas,
        "n_shards": N_SHARDS,
        "cores_per_executor": n,
        "total_docs": total_docs,
        "build_docs_per_sec_N": round(tput_n, 2),
        "build_docs_per_sec_4N": round(tput_4n, 2),
        "scaling_efficiency_build": round(eff, 4),
        "cpu_ceiling_items_per_sec_N": round(ceil_lo, 1) if ceil_lo else None,
        "cpu_ceiling_items_per_sec_4N": round(ceil_hi, 1) if ceil_hi else None,
        "cpu_ceiling_efficiency": round(ceil_eff, 4) if ceil_eff else None,
        "efficiency_vs_ceiling": round(eff / ceil_eff, 4) if ceil_eff else None,
        "query_p50_sec_N": round(statistics.median(
            [s["query_p50_sec"] for s in rep_n["shards"]]), 4),
        "query_p50_sec_4N": round(statistics.median(
            [s["query_p50_sec"] for s in shards_4n]), 4),
        "rank_identical": hash_n == hash_4n,
        "topk_sha256": hash_n,
        "runs": {
            "N": rep_n["shards"],
            "4N": shards_4n,
        },
    }
    for lvl in ("N", "4N"):
        for s in summary["runs"][lvl]:
            s.pop("results", None)  # rows folded into the hash
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "runs"},
                     indent=2))
    if hash_n != hash_4n:
        sys.exit("FAIL: merged top-k differs between executor levels")


if __name__ == "__main__":
    main()
