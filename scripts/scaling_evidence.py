"""Scaling-efficiency evidence for the north rule (BASELINE.json:14).

The rule requires throughput scaling efficiency >=0.8 going from N to 4N
executors. No real cluster exists in this sandbox, so (task brief) the
same job runs at two parallelism levels — local[8] and local[32] — in
SEPARATE JVMs on the same input, and efficiency is
(throughput_32 / throughput_8) / 4.

Writes BENCH/BASELINE.md with both throughputs + efficiency and prints a
JSON summary.

Usage: python scripts/scaling_evidence.py [--sf-dir DIR] [--repeats K]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_probe(cores: int, sf_dir: str) -> dict:
    # taskset pins the WHOLE process tree (JVM + every Python worker) to
    # exactly `cores` CPUs — without it, local[8]'s Python workers spill
    # onto the other 24 cores and the 8-core baseline is dishonestly
    # fast. This is the faithful two-cluster-size substitution.
    cmd = [sys.executable, os.path.join(REPO, "bench.py"),
           "--pipeline-only", "--cores", str(cores), "--sf-dir", sf_dir]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=2,
                    help="probes per level; best (max throughput) kept")
    args = ap.parse_args()

    results: dict[int, dict] = {}
    for cores in (8, 32):
        best = None
        for _ in range(args.repeats):
            r = run_probe(cores, args.sf_dir)
            tp = r["throughput"]["pages_featurized_per_sec"]
            if best is None or tp > best["throughput"]["pages_featurized_per_sec"]:
                best = r
        results[cores] = best
        print(f"local[{cores}]: "
              f"{best['throughput']['pages_featurized_per_sec']} pages/s "
              f"({best['throughput']['pages']} pages, "
              f"{best['queries']['pipeline_featurize_asof']}s)",
              file=sys.stderr)

    tp8 = results[8]["throughput"]["pages_featurized_per_sec"]
    tp32 = results[32]["throughput"]["pages_featurized_per_sec"]
    eff = (tp32 / tp8) / 4.0
    summary = {
        "sf_dir": args.sf_dir,
        "pages": results[32]["throughput"]["pages"],
        "throughput_local8_pages_per_sec": tp8,
        "throughput_local32_pages_per_sec": tp32,
        "speedup_8_to_32": round(tp32 / tp8, 3),
        "scaling_efficiency": round(eff, 3),
        "pass": eff >= 0.8,
    }

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(f"""# Scaling-efficiency evidence (north rule, N -> 4N)

Protocol (BASELINE.md "Bench protocol"): identical flagship job — a
parquet scan of the deterministic synthetic pages table
({summary['pages']} rows at `{args.sf_dir}` scale, materialized once,
untimed) -> frozen-extractor featurization (mapInPandas) -> as-of join
onto a same-cardinality probe grid + lag/lead + sessionize -> count —
run in SEPARATE JVMs at `local[8]` and `local[32]` on the same input
(warm-up run discarded, best of {args.repeats} kept). Each run is
`taskset`-pinned to exactly 8 / 32 CPUs so Python workers cannot spill
onto unclaimed cores — the faithful sandbox substitution for the two
cluster sizes per the task brief.

| parallelism | pages featurized/sec | wall (s) |
|---|---|---|
| local[8]  (N)  | {tp8} | {results[8]['queries']['pipeline_featurize_asof']} |
| local[32] (4N) | {tp32} | {results[32]['queries']['pipeline_featurize_asof']} |

- speedup 8 -> 32 cores: **{summary['speedup_8_to_32']}x** (ideal 4x)
- scaling efficiency = (tp32/tp8)/4 = **{summary['scaling_efficiency']}**
- acceptance (>=0.8): **{"PASS" if summary['pass'] else "FAIL"}**

Why it scales: the featurize stage is an Arrow-batched `mapInPandas`
over `3 x defaultParallelism` input partitions (never task-starved at
4N), the as-of merge-scan buckets on `hash(url)` with AQE skew
splitting, and shuffle partition count scales with parallelism
(`crawlfe/conf.py::engine_confs`). No driver-side loops or collects in
the hot path.

Reproduce: `python scripts/scaling_evidence.py --sf-dir {args.sf_dir}`
""")
    print(json.dumps(summary))
    return 0 if summary["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
