"""Scaling-efficiency evidence: the same job at two parallelism levels.

The north rule requires >= 0.8 throughput scaling efficiency between cluster
sizes N and 4N executors; this sandbox has one machine, so (per the task
brief / BASELINE.md) the stand-in is local[8] vs local[32] over the SAME
input. Each run is a fresh subprocess (fresh JVM) so the two measurements
are independent.

Usage:  python BENCH/run_scaling.py [--sf-dir /root/testdata/sf0.1]
Writes: BENCH/scaling_results.json and updates the table in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_bench(sf_dir: str, cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"bench failed at cpus={cpus}: {out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--large", type=int, default=32)
    args = ap.parse_args()

    r_small = run_bench(args.sf_dir, args.small)
    r_large = run_bench(args.sf_dir, args.large)
    ratio = args.large / args.small

    def eff(key: str) -> float:
        t_s, t_l = r_small["queries"][key], r_large["queries"][key]
        return round((t_s / t_l) / ratio, 3)

    pipeline_eff = eff("pipeline_code_corpus")
    total_eff = round(
        (r_small["value"] / r_large["value"]) / ratio, 3
    )
    result = {
        "sf_dir": args.sf_dir,
        "parallelism": {"small": args.small, "large": args.large},
        "small": r_small,
        "large": r_large,
        "pipeline_throughput_small_files_per_sec": r_small["files_per_sec"],
        "pipeline_throughput_large_files_per_sec": r_large["files_per_sec"],
        "pipeline_scaling_efficiency": pipeline_eff,
        "headline_total_scaling_efficiency": total_eff,
    }
    out_path = REPO / "BENCH" / "scaling_results.json"
    out_path.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
