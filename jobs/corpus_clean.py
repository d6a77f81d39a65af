"""spark-submit entry: corpus-cleaning funnel -> cleaned corpus table.

Usage (sandbox):
    spark-submit --py-files crawlfe.zip jobs/corpus_clean.py \
        --input /root/testdata/sf0.1 --output /tmp/crawlfe_clean

Production shape: --input points at the Iceberg documents table. The
fat rows never shuffle (slim-dedup design, crawlfe/clean.py), and the
waterfall counts are collected with Spark's Observation API
(`df.observe`) attached BEFORE the keep filter — the metrics are
accumulated by the same job that writes the cleaned table, so the
report needs no separate count pass and is exactly consistent with
the data written (no TOCTOU). Prints one JSON summary line to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawlfe.clean import STAGES, flag_docs  # noqa: E402
from crawlfe.conf import engine_confs  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--input",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("crawlfe-corpus-clean").getOrCreate()
    for k, v in engine_confs(spark.sparkContext.defaultParallelism).items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static confs can't change post-start under spark-submit

    t0 = time.time()
    docs = spark.read.parquet(os.path.join(args.input, "documents.parquet"))
    obs = Observation("funnel")
    flagged = flag_docs(docs).observe(
        obs,
        F.count(F.lit(1)).alias("total"),
        *[
            F.sum(F.col(f"keep_{k}").cast("bigint")).alias(s)
            for s, k in zip(STAGES[1:], ["dedup", "len", "rep", "lang"])
        ],
        F.sum("n_emails").alias("emails_redacted"),
        F.sum("n_ips").alias("ips_redacted"),
    )

    cleaned_dir = os.path.join(args.output, "cleaned")
    (
        flagged.where("keep_lang")
        .select(
            "doc_id", "lang", "source", "n_tokens", "n_emails", "n_ips",
            F.col("clean_text").alias("text"),
        )
        .write.mode("overwrite")
        .parquet(cleaned_dir)
    )
    metrics = obs.get  # blocks until the write action completes

    funnel = {s: metrics[s] for s in STAGES}
    report = {
        "funnel": funnel,
        "emails_redacted": metrics["emails_redacted"],
        "ips_redacted": metrics["ips_redacted"],
        "n_cleaned": funnel[STAGES[-1]],
        "elapsed_sec": round(time.time() - t0, 2),
        "docs_per_sec": round(funnel["total"] / (time.time() - t0), 1),
    }
    with open(os.path.join(args.output, "funnel.json"), "w") as f:
        json.dump(report, f)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
