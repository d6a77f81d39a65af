"""End-to-end featurize job: the engine's spark-submit entry logic.

Mirrors the two reference entry points re-expressed on Spark
(SURVEY.md §3): the extract stage (ref: acoss/extractors.py::
batch_feature_extractor [R]) and the temporal comparison stage (ref:
acoss/coverid.py::benchmark -> CoverAlgorithm.all_pairwise [R], here the
as-of join + window features), with checkpoint/resume and per-partition
lineage (BASELINE.json:6).

Resume model: the input arrives as a sequence of input snapshots
(production: Iceberg snapshot ids of the pages table; locally: named
batches). For each snapshot not yet committed to the features table's
manifest log, the job featurizes and atomically commits data + lineage
together. A rerun after any crash processes exactly the uncommitted
snapshots — exactly-once at snapshot granularity, idempotent at
partition granularity (tests/test_resume.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .asof import asof_join
from .features import featurize, lineage_rows
from .io import IcebergLite
from .windows import sessionize, with_lag_lead


def commit_batch(
    spark: SparkSession,
    pages: DataFrame,
    features_table: IcebergLite,
    snapshot_id: str,
    crash_before_commit: bool = False,
) -> None:
    """Featurize one input snapshot and atomically commit data+lineage.

    Featurization runs ONCE (the staged parquet write); lineage is then
    aggregated from the staged files — a cheap column-pruned scan that
    never touches html — and committed in the same manifest.
    """
    feats = featurize(pages, use_html=True)
    stage_path = features_table.stage(feats)
    staged = spark.read.parquet(stage_path)
    lin_rows = [
        {k: (v.item() if hasattr(v, "item") else v) for k, v in r.items()}
        for r in lineage_rows(staged, snapshot_id)
        .drop("input_snapshot", "committed_at")
        .toPandas()
        .to_dict("records")
    ]
    if crash_before_commit:
        return
    features_table.commit(stage_path, snapshot_id, lineage_rows=lin_rows)


def run_incremental(
    spark: SparkSession,
    batches: list[tuple[str, DataFrame]],
    features_table: IcebergLite,
    crash_after: int | None = None,
) -> list[str]:
    """Resume-aware driver loop: skip committed snapshots, commit the rest."""
    committed = features_table.committed_snapshots()
    done: list[str] = []
    for snap_id, pages in batches:
        if snap_id in committed:
            continue
        crash = crash_after is not None and len(done) >= crash_after
        commit_batch(
            spark, pages, features_table, snap_id, crash_before_commit=crash
        )
        if crash:
            return done
        done.append(snap_id)
    return done


def feature_pipeline(
    features: DataFrame,
    probe_grid: DataFrame,
    session_gap_s: int = 86400,
    strategy: str = "merge_scan",
    salt_k: int = 1,
) -> DataFrame:
    """The flagship query (SURVEY.md §7 M1): windowed features + as-of
    join onto a probe grid -> asof_features (FIXTURES.md §A).

    One shuffle on url serves lag/lead + sessionize (same window
    partitioning); the as-of join buckets on hash(url).
    """
    enriched = sessionize(
        with_lag_lead(features, "url", "warc_ts"),
        "url", "warc_ts", session_gap_s,
    ).select(
        "url", "warc_ts", "text_sha256", "feat",
        "lag_gap_s", "lead_gap_s", "session_id",
    )
    joined = asof_join(
        probe_grid,
        enriched,
        key="url",
        ts_probe="join_ts",
        ts_build="warc_ts",
        build_cols=["text_sha256", "feat", "lag_gap_s", "lead_gap_s", "session_id"],
        strategy=strategy,
        salt_k=salt_k,
    )
    return joined.withColumn("matched", F.col("warc_ts").isNotNull())
