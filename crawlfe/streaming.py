"""Event-time windowing + incremental (streaming) featurization.

The reference is batch-only (SURVEY.md §2.B "Streaming-only": absent in
reference); the engine's incremental story is the lineage/checkpoint
resume (crawlfe.pipeline). This module adds the Spark-native event-time
operators on top, usable identically in batch and Structured Streaming:

  * tumbling / sliding windows  — ``F.window(ts, size[, slide])``
  * session windows             — ``F.session_window(ts, gap)`` (the
    operator twin of the batch gap-cumsum sessionizer in
    crawlfe.windows; parity-tested against it)
  * watermarked streaming aggregation + exactly-once file sink —
    ``stream_featurize`` runs the SAME frozen featurizer over a file
    stream with checkpointing, the streaming twin of
    crawlfe.pipeline.commit_batch.

At 100 TB the batch/stream split is: backfill via pipeline.run_incremental
(snapshot-granular resume), tail via stream_featurize (micro-batch,
Spark checkpoint dir) — both write the same features schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame, ts: str, size: str, keys: list[str], value: str
) -> DataFrame:
    """Tumbling event-time window aggregate (batch or streaming)."""
    return (
        df.groupBy(F.window(ts, size).alias("win"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            *keys,
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    df: DataFrame, ts: str, size: str, slide: str, keys: list[str], value: str
) -> DataFrame:
    """Sliding event-time window aggregate; each row lands in
    size/slide overlapping windows."""
    return (
        df.groupBy(F.window(ts, size, slide).alias("win"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            *keys,
            "n",
            "sum_value",
        )
    )


def session_window_agg(
    df: DataFrame, ts: str, gap: str, keys: list[str]
) -> DataFrame:
    """Spark-native session windows (gap-close semantics: window end =
    last event + gap). Streaming-capable twin of crawlfe.windows
    sessionize/session_bounds."""
    return (
        df.groupBy(F.session_window(ts, gap).alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *keys,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n",
        )
    )


def stream_featurize(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str,
):
    """File-source Structured Streaming twin of pipeline.commit_batch:
    new parquet files under input_dir are featurized with the SAME
    frozen extractor and appended to output_dir exactly-once (Spark
    checkpoint + file-sink manifest own the resume story here).

    Returns the StreamingQuery (caller awaits/ stops it).
    """
    from .features import featurize

    pages = spark.readStream.schema(schema).parquet(input_dir)
    feats = featurize(pages, use_html=True)
    return (
        feats.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def watermarked_window_counts(
    stream_df: DataFrame, ts: str, delay: str, size: str, keys: list[str]
) -> DataFrame:
    """Watermarked tumbling aggregate for late-data streams: state for a
    window is dropped once the watermark (max event time - delay)
    passes its end."""
    # watermarks require TIMESTAMP (parquet µs loads as TIMESTAMP_NTZ
    # in Spark 4; session tz is pinned UTC so the cast is exact)
    wm = stream_df.withColumn(ts, F.col(ts).cast("timestamp"))
    return (
        wm.withWatermark(ts, delay)
        .groupBy(F.window(ts, size).alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), *keys, "n")
    )
