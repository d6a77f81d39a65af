"""Spark featurize stage: pages -> features table (+ lineage columns).

The reference's batch extraction loop (ref: acoss/extractors.py::
batch_feature_extractor — a multiprocessing.Pool over per-file
compute_features calls writing one HDF5 per track [R]) becomes ONE
Arrow-vectorized mapInPandas over the pages scan: Spark's task
parallelism IS the pool, the features DataFrame IS the feature store
(SURVEY.md §2.A A1/A2/A11).

Design notes (scale):
  * mapInPandas (iterator form) so one Python worker streams every Arrow
    batch of its partition — per-batch numpy work, no per-row Python at
    the Spark row level (BASELINE.json:15).
  * Column pruning matters at 100 TB: the html binary is read ONLY here;
    every downstream stage selects feature columns, so Catalyst prunes
    the scan (verified via .explain ReadSchema in tests).
  * Lineage capture (BASELINE.json:6): each emitted row carries the
    physical partition id (TaskContext) and its row offset within that
    partition; crawlfe.pipeline aggregates these into per-partition
    lineage rows (n_rows, first/last offset, order-independent bit_xor
    feature hash) with a map-side-combinable groupBy — no second scan.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .extract import extract_text
from .textfeat import FEAT_VERSION, featurize_batch, sha256_hex

FEATURES_SCHEMA = (
    "url string, warc_ts timestamp_ntz, text string, text_sha256 string, "
    "feat array<double>, feat_version int, part_id int, row_offset long"
)

FEATURE_COLS = ["url", "warc_ts", "text_sha256", "feat", "feat_version"]


def _featurize_iter(
    batches: Iterator[pd.DataFrame], use_html: bool
) -> Iterator[pd.DataFrame]:
    ctx = TaskContext.get()
    part_id = ctx.partitionId() if ctx is not None else -1
    offset = 0
    for pdf in batches:
        if use_html:
            texts = [extract_text(h) for h in pdf["html"]]
        else:
            texts = [t if t is not None else "" for t in pdf["text"]]
        feats = featurize_batch(texts)
        n = len(pdf)
        out = pd.DataFrame(
            {
                "url": pdf["url"].to_numpy(),
                "warc_ts": pdf["warc_ts"].to_numpy(),
                "text": texts,
                "text_sha256": [sha256_hex(t) for t in texts],
                "feat": list(feats),
                "feat_version": FEAT_VERSION,
                "part_id": part_id,
                "row_offset": range(offset, offset + n),
            }
        )
        offset += n
        yield out


def featurize(
    pages: DataFrame, use_html: bool = True, include_text: bool = False
) -> DataFrame:
    """pages(url, warc_ts, html[, text]) -> features DataFrame.

    use_html=True runs the frozen extractor on the html bytes; False
    trusts an existing text column (e.g. re-featurizing the store).
    """
    cols = ["url", "warc_ts"] + (["html"] if use_html else ["text"])
    feats = pages.select(*cols).mapInPandas(
        lambda it: _featurize_iter(it, use_html), schema=FEATURES_SCHEMA
    )
    keep = FEATURE_COLS + ["part_id", "row_offset"]
    if include_text:
        keep = keep[:2] + ["text"] + keep[2:]
    return feats.select(*keep)


def lineage_rows(features: DataFrame, input_snapshot: str) -> DataFrame:
    """Per-partition lineage (BASELINE.json:6): one row per physical
    partition of the featurize stage — map-side combinable aggregate.

    ``feature_hash`` is an order-independent bit_xor of xxhash64 rows so
    the hash is reproducible under any scan order; ``committed_at`` is
    ``current_timestamp()`` and therefore NOT reproducible across
    retries of the same partition.  That is intentional — resume logic
    treats the manifest (crawlfe/io.py) as authoritative and never
    compares lineage tables byte-wise; diff on (partition_id,
    input_snapshot, offsets, n_rows, feature_hash) only."""
    return (
        features.groupBy("part_id")
        .agg(
            F.min("row_offset").alias("first_offset"),
            F.max("row_offset").alias("last_offset"),
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor(
                F.xxhash64("url", "warc_ts", "text_sha256")
            ).cast("string").alias("feature_hash"),
        )
        .withColumn("input_snapshot", F.lit(input_snapshot))
        .withColumn("committed_at", F.current_timestamp())
        .withColumnRenamed("part_id", "partition_id")
        .select(
            "partition_id", "input_snapshot", "first_offset", "last_offset",
            "n_rows", "feature_hash", "committed_at",
        )
    )
