"""Supplementary N->4N scaling evidence on the SECOND spark-submit job
(jobs/corpus_clean.py) — the north rule's two-cluster-size criterion,
demonstrated on a different plan shape than the featurize headline:
tokenize-heavy narrow flags + one content-hash shuffle + observe-metrics
write, instead of mapInPandas featurize + as-of + windows.

Protocol identical to scripts/scaling_evidence.py: taskset pins the
whole process tree to exactly N cores, driver heap scales per-core
(2 g/core, as 4N executors bring 4x aggregate memory), busy-loop
hardware calibration at the same pinnings, best-of-K per level, every
run appended to BENCH/clean_runs.jsonl (full disclosure).

The fixture is the sf0.1 documents table replicated with doc_id offsets
(deterministic; materialized UNTIMED to /tmp before any probe).

Usage: python scripts/clean_scaling.py [--repeats 2] [--replicate 400]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_evidence import _ensure_zip, cpu_calibration  # noqa: E402

FIXTURE = "/tmp/crawlfe_clean_fixture"


def ensure_fixture(replicate: int) -> str:
    """Materialize the replicated documents table (untimed, 32 cores)."""
    out = os.path.join(FIXTURE, f"x{replicate}")
    marker = os.path.join(out, "documents.parquet", "_SUCCESS")
    if os.path.exists(marker):
        return out
    from pyspark.sql import functions as F

    from crawlfe.conf import get_spark

    spark = get_spark("clean-fixture")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n = base.count()
    reps = spark.range(replicate).withColumnRenamed("id", "rep")
    big = (
        base.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * n).alias("doc_id"),
            # perturb text per replica so exact-dedup stays non-trivial
            # but deterministic: append the replica id to ~1/16 of docs
            F.when(
                F.col("doc_id") % 16 == 0, F.concat(
                    F.col("text"), F.lit(" rep"), F.col("rep").cast("string")
                )
            ).otherwise(F.col("text")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    big.repartition(64).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    spark.stop()
    return out


def run_probe(cores: int, input_dir: str) -> dict:
    out_dir = f"/tmp/crawlfe_clean_probe_{cores}_{os.getpid()}"
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        "spark-submit", "--master", f"local[{cores}]",
        "--driver-memory", f"{2 * cores}g",
        "--py-files", _ensure_zip(),
        os.path.join(REPO, "jobs", "corpus_clean.py"),
        "--input", input_dir, "--output", out_dir,
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True, cwd=REPO
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    subprocess.run(["rm", "-rf", out_dir], check=False)
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--replicate", type=int, default=400)
    ap.add_argument("--cores-lo", type=int, default=2)
    ap.add_argument("--cores-hi", type=int, default=8)
    args = ap.parse_args()
    lo, hi = args.cores_lo, args.cores_hi
    assert hi == 4 * lo, "north rule compares N to 4N"

    input_dir = ensure_fixture(args.replicate)

    calib = {c: cpu_calibration(c) for c in (lo, hi)}
    hw_speedup = calib[hi] / calib[lo]
    print(
        f"hardware calibration: speedup {hw_speedup:.2f}x of ideal 4x",
        file=sys.stderr,
    )

    best: dict[int, dict] = {}
    for cores in (lo, hi):
        for _ in range(args.repeats):
            r = run_probe(cores, input_dir)
            if cores not in best or r["docs_per_sec"] > best[cores]["docs_per_sec"]:
                best[cores] = r
        print(
            f"local[{cores}]: {best[cores]['docs_per_sec']} docs/s "
            f"({best[cores]['funnel']['total']} docs, "
            f"{best[cores]['elapsed_sec']}s)",
            file=sys.stderr,
        )

    speedup = best[hi]["docs_per_sec"] / best[lo]["docs_per_sec"]
    summary = {
        "job": "corpus_clean",
        "docs": best[hi]["funnel"]["total"],
        "cores": [lo, hi],
        f"throughput_local{lo}_docs_per_sec": best[lo]["docs_per_sec"],
        f"throughput_local{hi}_docs_per_sec": best[hi]["docs_per_sec"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(speedup / 4.0, 3),
        "hardware_speedup": round(hw_speedup, 3),
        "hardware_normalized_efficiency": round(speedup / hw_speedup, 3),
        "calibration_sane": 3.6 <= hw_speedup <= 4.1,
        "pass": speedup / 4.0 >= 0.8,
        "ts": int(time.time()),
    }
    with open(os.path.join(REPO, "BENCH", "clean_runs.jsonl"), "a") as f:
        f.write(json.dumps(summary) + "\n")
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
