"""spark-submit entry: end-to-end training-data preparation.

Usage (sandbox):
    spark-submit --py-files crawlfe.zip jobs/train_prep.py \
        --input /root/testdata/sf0.1 --output /tmp/crawlfe_trainprep

Composes the engine's corpus operators into the job an LLM data team
actually runs, in one pass over the documents table:

  1. clean      — crawlfe.clean funnel (dedup -> length -> repetition
                  -> lang), fat rows never shuffle; waterfall counts
                  via `df.observe` on the SAME action that writes.
  2. split      — deterministic md5-bucket train/valid/test (~90/5/5),
                  reproducible across engines/runs/cluster sizes; a
                  narrow projection, no shuffle.
  3. pack       — GPT-style concat-and-chunk of the train fold into
                  fixed token budgets, windowed cumsum PER SOURCE
                  SHARD (parallel; no global serial window); emits the
                  (shard, seq) index with fill statistics.

Outputs under --output: cleaned_split/ (parquet, cleaned docs + split
column), packed_index/ (parquet, one row per training sequence), and
report.json. Prints ONE JSON line to stdout.

Production shape: --input points at the Iceberg documents table;
cleaned_split is partitioned by split so fold reads prune at the
directory level.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import Observation, SparkSession, Window
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
    ap.add_argument("--budget", type=int, default=4096,
                    help="tokens per packed training sequence")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("crawlfe-train-prep").getOrCreate()
    for k, v in engine_confs(spark.sparkContext.defaultParallelism).items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static confs can't change post-start under spark-submit

    t0 = time.time()
    docs = spark.read.parquet(os.path.join(args.input, "documents.parquet"))

    # 1. clean (funnel metrics ride the write action — no extra pass)
    obs = Observation("train_prep")
    flagged = flag_docs(docs).observe(
        obs,
        F.count(F.lit(1)).alias("total"),
        *[
            F.sum(F.col(f"keep_{k}").cast("bigint")).alias(s)
            for s, k in zip(STAGES[1:], ["dedup", "len", "rep", "lang"])
        ],
    )

    # 2. deterministic split (same md5-bucket recipe as `sample_split`)
    b = F.substring(
        F.md5(F.encode(F.col("doc_id").cast("string"), "utf-8")), 1, 2
    )
    split = (
        F.when(b <= "e5", "train").when(b <= "f2", "valid").otherwise("test")
    )
    cleaned = (
        flagged.where("keep_lang")
        .select(
            "doc_id", "lang", "source", "n_tokens",
            F.col("clean_text").alias("text"),
            split.alias("split"),
        )
    )

    out_docs = os.path.join(args.output, "cleaned_split")
    (
        cleaned.write.mode("overwrite")
        .partitionBy("split")  # fold reads prune at directory level
        .parquet(out_docs)
    )
    metrics = obs.get  # blocks until the write completes

    # 3. pack the train fold (reads ONLY the train partition — pruned
    # scan — and only the slim columns; text never loads again)
    train = (
        spark.read.parquet(out_docs)
        .where(F.col("split") == "train")
        .select("source", "doc_id", "n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        train.withColumn(
            "seq_id",
            F.floor(
                (F.sum("n_tokens").over(w) - F.col("n_tokens"))
                / args.budget
            ).cast("bigint"),
        )
        .groupBy("source", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
    )
    out_packed = os.path.join(args.output, "packed_index")
    packed.write.mode("overwrite").parquet(out_packed)

    # fold + fill statistics from the written outputs (one tiny agg each)
    split_sizes = {
        r["split"]: r["n"]
        for r in spark.read.parquet(out_docs)
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    fill = (
        spark.read.parquet(out_packed)
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("n_tokens").alias("train_tokens"),
            F.round(
                F.avg(F.least(F.col("n_tokens"), F.lit(args.budget)))
                / args.budget, 4,
            ).alias("mean_fill"),
        )
        .collect()[0]
    )

    funnel = {s: metrics[s] for s in STAGES}
    report = {
        "funnel": funnel,
        "splits": split_sizes,
        "budget": args.budget,
        "n_train_sequences": fill["n_seqs"],
        "train_tokens": fill["train_tokens"],
        "mean_fill": fill["mean_fill"],
        "elapsed_sec": round(time.time() - t0, 2),
        "docs_per_sec": round(funnel["total"] / (time.time() - t0), 1),
    }
    with open(os.path.join(args.output, "report.json"), "w") as f:
        json.dump(report, f)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
