"""Scaling-efficiency evidence: the same pipeline job at multiple
parallelism levels (the sandbox stand-in for N vs 4N executor clusters —
task brief / BASELINE.md).

Primary N -> 4N pair: local[2] -> local[8]. BENCH/host_probe.py shows this
host's memory bandwidth saturates at ~8 concurrent streaming workers (32
advertised vCPUs, ~8 cores' worth of bandwidth), so 2 -> 8 is the regime
where parallel efficiency is attributable to the CODE rather than to the
host ceiling. local[8] -> local[32] is also run and reported with the probe
data as context.

Each level runs bench.py in a fresh subprocess (fresh JVM) over the SAME
input: a SPARK_GRAFT_BENCH_ROWS-row synthetic corpus (default 150k files,
compute-dominated) + the sf tables.

Usage:  python BENCH/run_scaling.py [--sf-dir /root/testdata/sf0.1]
Writes: BENCH/scaling_results.json; see BENCH/BASELINE.md for the narrative.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_bench(sf_dir: str, cpus: int, rows: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BENCH_ROWS"] = str(rows)
    env["SPARK_GRAFT_BENCH_ONLY"] = "pipeline"  # scaling metric = the pipeline
    env["SPARK_GRAFT_BENCH_LINE_SCALE"] = "3"   # longer files: more compute
    # per file at the SAME corpus pair structure (see corpus.line_scale)
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
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--levels", type=int, nargs="+", default=[2, 8, 32])
    ap.add_argument("--trials", type=int, default=2,
                    help="runs per level; the MIN wall is reported (host "
                         "noise is one-sided: contention only ever adds "
                         "time, so min estimates the intrinsic cost)")
    args = ap.parse_args()

    trials = {
        n: [run_bench(args.sf_dir, n, args.rows) for _ in range(args.trials)]
        for n in args.levels
    }
    runs = {
        n: min(ts, key=lambda r: r["queries"]["pipeline_code_corpus"])
        for n, ts in trials.items()
    }

    def eff(small: int, large: int, key: str = "pipeline_code_corpus"):
        t_s = runs[small]["queries"][key]
        t_l = runs[large]["queries"][key]
        return round((t_s / t_l) / (large / small), 3)

    pairs = [
        (args.levels[i], args.levels[j])
        for i in range(len(args.levels))
        for j in range(i + 1, len(args.levels))
    ]
    result = {
        "sf_dir": args.sf_dir,
        "corpus_rows": args.rows,
        "levels": {
            str(n): {
                "pipeline_sec": runs[n]["queries"]["pipeline_code_corpus"],
                "files_per_sec": runs[n]["files_per_sec"],
                "headline_total_sec": runs[n]["value"],
                "all_trials_sec": [
                    t["queries"]["pipeline_code_corpus"] for t in trials[n]
                ],
            }
            for n in args.levels
        },
        "pipeline_scaling_efficiency": {
            f"{a}->{b}": eff(a, b) for a, b in pairs
        },
        "primary_claim": {
            "pair": "local[2] -> local[8] (N vs 4N)",
            "efficiency": eff(2, 8) if 2 in runs and 8 in runs else None,
        },
        "raw": {str(n): runs[n] for n in args.levels},
    }
    out_path = REPO / "BENCH" / "scaling_results.json"
    out_path.write_text(json.dumps(result, indent=2))
    print(json.dumps({k: v for k, v in result.items() if k != "raw"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
