"""Structured Streaming coverage (SURVEY.md §7 M8 stretch): file-source
incremental featurization with checkpoint exactly-once, watermarked
windowed aggregation, and session_window parity with the batch
gap-cumsum sessionizer."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from crawlfe.features import featurize
from crawlfe.streaming import (
    session_window_agg,
    stream_featurize,
    watermarked_window_counts,
)
from crawlfe.synth import PAGES_SCHEMA, SynthConfig, synth_pages
from crawlfe.windows import session_bounds

CFG = SynthConfig(n_urls=60)


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "in": str(tmp_path / "in"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    yield d
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_stream_featurize_incremental_exactly_once(spark, dirs):
    p1 = synth_pages(spark, CFG, url_lo=0, url_hi=30, n_partitions=2)
    p2 = synth_pages(spark, CFG, url_lo=30, url_hi=60, n_partitions=2)

    p1.write.parquet(dirs["in"] + "/b1")
    q = stream_featurize(
        spark, dirs["in"] + "/*", dirs["out"], dirs["ckpt"], PAGES_SCHEMA
    )
    q.awaitTermination()
    n1 = spark.read.parquet(dirs["out"]).count()
    assert n1 == p1.count()

    # second batch arrives; restart picks up ONLY new files (checkpoint)
    p2.write.parquet(dirs["in"] + "/b2")
    q = stream_featurize(
        spark, dirs["in"] + "/*", dirs["out"], dirs["ckpt"], PAGES_SCHEMA
    )
    q.awaitTermination()
    got = spark.read.parquet(dirs["out"])
    assert got.count() == p1.count() + p2.count()
    # no duplicates: (url, warc_ts) unique
    assert got.select("url", "warc_ts").distinct().count() == got.count()

    # streamed features == batch features (same frozen extractor)
    batch = featurize(
        synth_pages(spark, CFG, url_lo=0, url_hi=60, n_partitions=2),
        use_html=True,
    )
    sp = got.select("url", "warc_ts", "text_sha256").toPandas()
    bp = batch.select("url", "warc_ts", "text_sha256").toPandas()
    key = ["url", "warc_ts"]
    sp = sp.sort_values(key, ignore_index=True)
    bp = bp.sort_values(key, ignore_index=True)
    assert (sp["text_sha256"] == bp["text_sha256"]).all()


def test_watermarked_window_counts_match_batch(spark, dirs, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.write.parquet(dirs["in"])
    stream = spark.readStream.schema(ev.schema).parquet(dirs["in"])
    agg = watermarked_window_counts(
        stream, "ts", "1 hour", "1 hour", ["event_type"]
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from wm_counts")
    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n")
    )
    # append-mode emits only watermark-closed windows; every emitted row
    # must match batch, and all but the tail windows must be emitted
    g = got.toPandas().sort_values(["win_start", "event_type"], ignore_index=True)
    w = want.toPandas().sort_values(["win_start", "event_type"], ignore_index=True)
    assert len(g) > 0
    merged = g.merge(w, on=["win_start", "event_type"], suffixes=("_s", "_b"))
    assert len(merged) == len(g)
    assert (merged["n_s"] == merged["n_b"]).all()
    tail = w["win_start"].max()
    missing = w.merge(
        g, on=["win_start", "event_type"], how="left", suffixes=("", "_s")
    )
    missing = missing[missing["n_s"].isna()]
    # only windows at/after the final watermark may be unemitted
    assert (missing["win_start"] >= tail - __import__("pandas").Timedelta("1 hour")).all()


def test_session_window_parity_with_batch_sessionizer(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "ts")
    native = session_window_agg(ev, "ts", "1800 seconds", ["user_id"])
    ours = session_bounds(ev, key="user_id", ts="ts", gap_seconds=1800)
    n = native.select(
        "user_id", "session_start", F.col("n").alias("n_events")
    ).toPandas().sort_values(["user_id", "session_start"], ignore_index=True)
    o = ours.select(
        "user_id",
        F.col("session_start"),
        F.col("n_snapshots").alias("n_events"),
    ).toPandas().sort_values(["user_id", "session_start"], ignore_index=True)
    assert len(n) == len(o)
    assert (n["user_id"] == o["user_id"]).all()
    assert (n["session_start"] == o["session_start"]).all()
    assert (n["n_events"] == o["n_events"]).all()


def test_stateful_sessionize_state_survives_microbatches(spark, tmp_path):
    """applyInPandasWithState sessionizer: the open session per key is
    carried in GroupState across micro-batches — a session whose events
    span two batches must come out as ONE session, and closed sessions
    must exactly match the batch sessionizer (minus each key's final
    still-open session)."""
    import pandas as pd

    from crawlfe.streaming import stateful_sessionize
    from crawlfe.windows import session_bounds

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    os.makedirs(in_dir)

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    mn = pd.Timedelta(minutes=1)

    def ev(u, minutes):
        return {"user_id": u, "ts": t0 + minutes * mn}

    # u1: session A (0,10), session B (120..) | u2: session spanning the
    # batch boundary (100, [batch2] 110), then a far closer | u3: one
    # long session entirely in batch1, closed in batch2
    batch1 = pd.DataFrame([
        ev(1, 0), ev(1, 10), ev(1, 120),
        ev(2, 100),
        ev(3, 0), ev(3, 5), ev(3, 20),
    ])
    batch2 = pd.DataFrame([
        ev(1, 2000),  # closes u1 session B
        ev(2, 110),   # continues u2's open session across the boundary
        ev(2, 2000),  # closes it
        ev(3, 2000),  # closes u3's only session
    ])

    schema = "user_id long, ts timestamp"

    def run_batch(pdf, name):
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            f"{in_dir}/{name}"
        )
        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(in_dir)
        q = (
            stateful_sessionize(stream, gap_seconds=1800)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch(batch1, "b1")
    run_batch(batch2, "b2")

    got = (
        spark.read.parquet(out_dir)
        .toPandas()
        .sort_values(["user_id", "session_start"], ignore_index=True)
    )

    # oracle: batch sessionizer over ALL events, drop each user's last
    # (still-open) session
    all_ev = spark.createDataFrame(pd.concat([batch1, batch2]))
    b = session_bounds(
        all_ev, key="user_id", ts="ts", gap_seconds=1800
    ).toPandas()
    b = b.sort_values(["user_id", "session_start"], ignore_index=True)
    # all-but-last session per user (b is sorted by session_start);
    # head(-1) avoids the deprecated grouping-column apply
    exp = b.groupby("user_id").head(-1).reset_index(drop=True)

    assert len(got) == len(exp), (got, exp)
    for col_g, col_e in [
        ("session_start", "session_start"),
        ("session_end", "session_end"),
        ("n_events", "n_snapshots"),
    ]:
        assert (
            got[col_g].to_numpy() == exp[col_e].to_numpy()
        ).all(), (col_g, got, exp)
    # the boundary-spanning u2 session came out as ONE session (100-110)
    u2 = got[got.user_id == 2]
    assert len(u2) == 1
    assert u2.iloc[0]["session_start"] == t0 + 100 * mn
    assert u2.iloc[0]["session_end"] == t0 + 110 * mn
    assert u2.iloc[0]["n_events"] == 2


def test_stateful_sessionize_late_batch_widen_not_regress(spark, tmp_path):
    """ADVICE r2 (medium): a LATE micro-batch (events at/earlier than
    the carried session's last event) must only WIDEN the carried
    bounds via min/max — the r2 kernel kept start=c_start even when an
    earlier event arrived and let last_us regress, so the eventually
    closed session came out with end < start."""
    import pandas as pd

    from crawlfe.streaming import stateful_sessionize

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    os.makedirs(in_dir)

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    mn = pd.Timedelta(minutes=1)

    def ev(u, minutes):
        return {"user_id": u, "ts": t0 + minutes * mn}

    schema = "user_id long, ts timestamp"

    def run_batch(rows, name):
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.parquet(
            f"{in_dir}/{name}"
        )
        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(in_dir)
        q = (
            stateful_sessionize(stream, gap_seconds=1800)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch([ev(5, 100), ev(5, 110)], "b1")  # open session [100,110]
    run_batch([ev(5, 90)], "b2")               # LATE: widens to [90,110]
    run_batch([ev(5, 5000)], "b3")             # closes it

    got = spark.read.parquet(out_dir).toPandas()
    got = got.sort_values("session_start", ignore_index=True)
    assert len(got) == 1
    row = got.iloc[0]
    assert row["session_start"] == t0 + 90 * mn
    assert row["session_end"] == t0 + 110 * mn
    assert row["n_events"] == 3
    assert row["session_end"] >= row["session_start"]


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Watermarked streaming dedup: a key replayed across micro-batches
    within the watermark window is emitted exactly once; batch-mode
    parity with plain dropDuplicates on the same input."""
    import pandas as pd

    from crawlfe.streaming import stream_dedup

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    os.makedirs(in_dir)

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    mn = pd.Timedelta(minutes=1)
    schema = "doc_key string, ts timestamp"

    def run_batch(rows, name):
        pdf = pd.DataFrame(rows, columns=["doc_key", "minutes"])
        pdf["ts"] = pdf.pop("minutes").map(lambda m: t0 + m * mn)
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            f"{in_dir}/{name}"
        )
        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(in_dir)
        q = (
            stream_dedup(stream, keys=["doc_key"], ts="ts", delay="1 hour")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch([("a", 0), ("b", 1), ("a", 2)], "b1")   # in-batch dup 'a'
    run_batch([("a", 5), ("c", 6)], "b2")             # cross-batch dup 'a'

    got = spark.read.parquet(out_dir).toPandas()
    assert sorted(got["doc_key"]) == ["a", "b", "c"]

    # batch-mode parity: same function on a static frame
    static = spark.createDataFrame(
        pd.DataFrame(
            {"doc_key": ["a", "b", "a", "c"],
             "ts": [t0, t0 + mn, t0 + 2 * mn, t0 + 3 * mn]}
        )
    )
    n = stream_dedup(static, keys=["doc_key"], ts="ts").count()
    assert n == 3


def test_stream_clean_parity_with_batch(spark, tmp_path, sf_dir):
    """stream_clean over a file-source stream (two micro-batch files,
    availableNow) must keep exactly the batch-cleaned content set:
    same surviving shas, one row per duplicate-content group, same
    redaction. The dup group's survivor identity may differ
    (first-arrival vs lowest-doc_id) — content equality is the
    contract."""
    from crawlfe.clean import stream_clean

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .withColumn(
            "ts",
            F.timestamp_micros(
                (F.lit(1_700_000_000_000_000) + F.col("doc_id") * 1_000_000)
            ),
        )
    )
    # plant a cross-batch duplicate: doc 0's text re-appears late
    dup = docs.where(F.col("doc_id") == 0).withColumn(
        "doc_id", F.lit(99_999)
    )
    in_dir, out_dir, ck = (
        str(tmp_path / d) for d in ("in", "out", "ck")
    )
    docs.where(F.col("doc_id") < 250).write.parquet(
        os.path.join(in_dir, "b0")
    )
    docs.where(F.col("doc_id") >= 250).unionByName(dup).write.parquet(
        os.path.join(in_dir, "b1")
    )

    schema = spark.read.parquet(os.path.join(in_dir, "b0")).schema
    stream = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(in_dir)
    q = (
        stream_clean(stream, ts="ts", delay="2 hours")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir).toPandas()
    want = stream_clean(docs.unionByName(dup), ts="ts").toPandas()
    # one survivor per content group, same content set, same redaction
    got_texts = sorted(got["text"])
    want_texts = sorted(want["text"])
    assert got_texts == want_texts
    assert len(got) == len(set(got_texts))
    # the planted duplicate survived exactly once
    dup_text = want[want["doc_id"].isin([0, 99_999])]
    assert len(got[got["text"].isin(dup_text["text"])]) <= len(dup_text)


def test_stream_interval_join_matches_batch(spark, dirs, sf_dir):
    """Stream-stream interval join (clicks x purchases within 1h per
    user, both sides watermarked) must emit exactly the rows the batch
    join produces — inner interval joins emit matches as they arrive,
    so unlike append-mode aggregation no tail rows are withheld."""
    from crawlfe.streaming import stream_interval_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), "event_id"
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cdir, pdir = dirs["in"] + "_c", dirs["in"] + "_p"
    # two files per side -> multiple micro-batches under maxFilesPerTrigger
    clicks.repartition(2).write.parquet(cdir)
    purch.repartition(2).write.parquet(pdir)
    sc = (
        spark.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(cdir)
    )
    sp = (
        spark.readStream.schema(purch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(pdir)
    )
    j = stream_interval_join(
        sc,
        sp.withColumnRenamed("p_user", "user_id"),
        key="user_id",
        ts_left="click_ts",
        ts_right="purchase_ts",
    )
    q = (
        j.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "select user_id, event_id, purchase_ts, purchase_value from ssj"
    ).toPandas()
    want = stream_interval_join(
        clicks,
        purch.withColumnRenamed("p_user", "user_id"),
        key="user_id",
        ts_left="click_ts",
        ts_right="purchase_ts",
    ).select("user_id", "event_id", "purchase_ts", "purchase_value").toPandas()
    assert len(want) > 0
    key = ["user_id", "event_id", "purchase_ts", "purchase_value"]
    g = got.sort_values(key, ignore_index=True)
    w = want.sort_values(key, ignore_index=True)
    assert len(g) == len(w), (len(g), len(w))
    assert g.equals(w)


def test_stream_enrich_broadcast_and_batch_parity(spark, dirs, sf_dir):
    """Stream-static enrichment: a rate-free file stream joined to a
    static dim emits exactly the batch join's rows, and the batch plan
    broadcasts the dim (the stream side must never shuffle)."""
    import pandas as pd

    from crawlfe.streaming import stream_enrich

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dim = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_type": ["view", "click", "purchase", "signup", "error"],
                "weight": [1.0, 2.0, 5.0, 3.0, 0.0],
            }
        )
    )
    # batch twin + plan shape
    batch = stream_enrich(ev, dim, "event_type")
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # streaming run over the same rows
    ev.write.parquet(dirs["in"] + "/b1")
    stream = spark.readStream.schema(ev.schema).parquet(dirs["in"] + "/*")
    q = (
        stream_enrich(stream, dim, "event_type")
        .writeStream.format("parquet")
        .option("path", dirs["out"])
        .option("checkpointLocation", dirs["ckpt"])
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(dirs["out"])
    assert got.count() == ev.count()
    b = batch.groupBy("event_type").agg(F.sum("weight").alias("s")).collect()
    s = got.groupBy("event_type").agg(F.sum("weight").alias("s")).collect()
    assert sorted(map(tuple, b)) == sorted(map(tuple, s))


def test_stream_upsert_sink_replay_is_idempotent(spark, dirs, sf_dir):
    """foreachBatch idempotent sink: batches commit under batch-<id>
    snapshots; replaying the SAME epoch (fresh checkpoint over the same
    input) must not duplicate rows — the sink's own commit log dedupes,
    which is the exactly-once story for non-transactional sinks."""
    from crawlfe.io import IcebergLite
    from crawlfe.streaming import stream_upsert_sink

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(500)
    ev.write.parquet(dirs["in"] + "/b1")
    stream = spark.readStream.schema(ev.schema).parquet(dirs["in"] + "/*")
    q = stream_upsert_sink(stream, dirs["out"], dirs["ckpt"])
    q.awaitTermination()
    tbl = IcebergLite(dirs["out"])
    n1 = tbl.read(spark).count()
    assert n1 == 500
    assert "batch-000000" in tbl.committed_snapshots()

    # simulate an epoch replay: wipe the CHECKPOINT (Spark forgets the
    # batch) but keep the sink table — the batchId-keyed commit log
    # must swallow the duplicate write
    shutil.rmtree(dirs["ckpt"], ignore_errors=True)
    stream = spark.readStream.schema(ev.schema).parquet(dirs["in"] + "/*")
    q = stream_upsert_sink(stream, dirs["out"], dirs["ckpt"] + "_replay")
    q.awaitTermination()
    assert IcebergLite(dirs["out"]).read(spark).count() == n1


def test_stream_interval_join_left_outer_matches_batch(spark, dirs, sf_dir):
    """Left-outer stream-stream interval join: clicks with NO purchase
    within the horizon must appear exactly once with null right
    columns once the watermark closes their window (availableNow
    drains the stream, so every window closes); matched clicks carry
    their purchases. The batch left join is the parity oracle."""
    from crawlfe.streaming import stream_interval_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), "event_id"
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cdir, pdir = dirs["in"] + "_lc", dirs["in"] + "_lp"
    clicks.repartition(2).write.parquet(cdir)
    purch.repartition(2).write.parquet(pdir)
    sc = (
        spark.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(cdir)
    )
    sp = (
        spark.readStream.schema(purch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(pdir)
    )
    j = stream_interval_join(
        sc,
        sp.withColumnRenamed("p_user", "user_id"),
        key="user_id",
        ts_left="click_ts",
        ts_right="purchase_ts",
        how="left_outer",
    )
    q = (
        j.writeStream.format("memory")
        .queryName("ssj_lo")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cols = "user_id, event_id, purchase_ts, purchase_value"
    got = spark.sql(f"select {cols} from ssj_lo").toPandas()
    want = (
        stream_interval_join(
            clicks,
            purch.withColumnRenamed("p_user", "user_id"),
            key="user_id",
            ts_left="click_ts",
            ts_right="purchase_ts",
            how="left_outer",
        )
        .select("user_id", "event_id", "purchase_ts", "purchase_value")
        .toPandas()
    )
    # both null patterns are non-vacuous
    assert want["purchase_ts"].isna().any()
    assert want["purchase_ts"].notna().any()
    # every emitted row matches the batch oracle exactly
    key = ["user_id", "event_id", "purchase_ts", "purchase_value"]
    g = got.sort_values(key, ignore_index=True, na_position="last")
    w = want.sort_values(key, ignore_index=True, na_position="last")
    merged = g.merge(w, on=key, how="left", indicator=True)
    assert (merged["_merge"] == "both").all()
    # append-mode may withhold ONLY null-side rows whose join-state
    # window the final watermark could not close: clicks within
    # (delay + horizon) of the stream's max event time
    missing = w.merge(g, on=key, how="left", indicator=True)
    missing = missing[missing["_merge"] == "left_only"]
    assert missing["purchase_ts"].isna().all()
    # principled bound: a null-side row may be withheld iff the
    # query's own FINAL watermark had not passed click_ts + horizon
    import pandas as pd

    wm = pd.Timestamp(q.lastProgress["eventTime"]["watermark"]).tz_localize(
        None
    )
    click_ts = {
        r["event_id"]: r["click_ts"]
        for r in clicks.collect()
    }
    horizon = pd.Timedelta(seconds=3600)
    for eid in missing["event_id"]:
        assert click_ts[eid] + horizon >= wm, (eid, click_ts[eid], wm)
    # matched rows are never withheld (inner results emit as they come)
    assert (
        g["purchase_ts"].notna().sum() == w["purchase_ts"].notna().sum()
    )


@pytest.mark.tws
def test_tws_running_profile_matches_batch_recompute(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 arbitrary-state API) running
    profile: ValueState survives micro-batches, each batch emits the
    UPDATED profile, and the final emission per key is bit-equal to a
    batch groupBy recompute over all events (fixed-point sums make the
    parity exact regardless of the batch split).

    Skipped in-sandbox: the TWS Python<->JVM state protocol imports
    google.protobuf in Spark's driver worker, and the container has no
    protobuf and no pip (same constraint class as Pillow / the Iceberg
    jar). The kernels are covered by the pure-function tests below; on
    a real cluster this test runs as-is."""
    pytest.importorskip("google.protobuf")
    import pandas as pd

    from crawlfe.streaming import tws_running_profile

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    os.makedirs(in_dir)

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    mn = pd.Timedelta(minutes=1)

    def ev(u, minutes, v):
        return {"user_id": u, "ts": t0 + minutes * mn, "value": v}

    batch1 = pd.DataFrame([
        ev(1, 0, 1.5), ev(1, 10, 2.25), ev(2, 5, -3.0001),
    ])
    batch2 = pd.DataFrame([
        ev(1, 20, 0.125),            # u1 accumulates across batches
        ev(3, 1, 7.77),              # u3 first appears in batch 2
    ])

    schema = "user_id long, ts timestamp, value double"

    def run_batch(pdf, name):
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            f"{in_dir}/{name}"
        )
        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(in_dir)
        q = (
            tws_running_profile(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch(batch1, "b1")
    run_batch(batch2, "b2")

    got = spark.read.parquet(out_dir).toPandas()
    # u1 emitted twice (both batches), u2 and u3 once each
    assert len(got) == 4
    final = (
        got.sort_values("n_events")
        .groupby("user_id", as_index=False)
        .last()
        .sort_values("user_id", ignore_index=True)
    )
    all_ev = pd.concat([batch1, batch2])
    g = all_ev.groupby("user_id")
    exp = pd.DataFrame(
        {
            "user_id": sorted(g.groups),
            "n_events": g.size().values,
            # same fixed-point rule as the operator
            "sum_value": [
                round(sum(round(v * 10000) for v in grp) / 10000.0, 10)
                for _, grp in g["value"]
            ],
            "max_value": g["value"].max().values,
        }
    )
    assert (final["user_id"].values == exp["user_id"].values).all()
    assert (final["n_events"].values == exp["n_events"].values).all()
    assert (final["sum_value"].values == exp["sum_value"].values).all()
    assert (final["max_value"].values == exp["max_value"].values).all()
    # u1's second emission shows state carried: 3 events, not 1
    u1 = got[got.user_id == 1].sort_values("n_events")
    assert list(u1["n_events"]) == [2, 3]
    # last_ts_us is the true max event time per key
    want_last = (
        all_ev.groupby("user_id")["ts"].max().astype("datetime64[us]")
    )
    got_last = pd.to_datetime(final.set_index("user_id")["last_ts_us"], unit="us")
    assert (got_last == want_last).all()


def test_profile_kernel_split_invariance_and_merge_laws():
    """The TWS profile kernels are exact under ANY micro-batch split:
    accumulate(all) == merge(accumulate(part1), accumulate(part2)) for
    every split point, and merge is commutative. This is the property
    that makes the streamed profile bit-equal to the batch recompute."""
    import numpy as np
    import pandas as pd

    from crawlfe.streaming import profile_accumulate, profile_merge

    rng_vals = [1.5, -3.00015, 0.12345, 7.0, 2.71828, -0.5, 1e6, 3.3]
    t0 = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "ts": [t0 + pd.Timedelta(minutes=i) for i in range(len(rng_vals))],
            "value": rng_vals,
        }
    )
    whole = profile_accumulate([pdf], "ts", "value")
    for cut in range(len(pdf) + 1):
        a = profile_accumulate([pdf.iloc[:cut]], "ts", "value")
        b = profile_accumulate([pdf.iloc[cut:]], "ts", "value")
        assert profile_merge(a, b) == whole
        assert profile_merge(b, a) == whole  # commutative
    # multi-frame batch == single-frame batch
    frames = [pdf.iloc[:3], pdf.iloc[3:5], pdf.iloc[5:]]
    assert profile_accumulate(frames, "ts", "value") == whole
    # fixed-point sum: one rounding per event, integer adds
    n, sum_fp, mx, last_us = whole
    assert n == len(rng_vals)
    assert sum_fp == sum(int(np.rint(v * 10000.0)) for v in rng_vals)
    assert mx == max(rng_vals)
    assert last_us == int(
        pdf["ts"].max().to_datetime64().astype("datetime64[us]").astype(np.int64)
    )


def test_profile_kernel_empty_batch():
    import pandas as pd

    from crawlfe.streaming import profile_accumulate

    empty = pd.DataFrame({"ts": pd.to_datetime([]), "value": []})
    n, sum_fp, mx, last_us = profile_accumulate([empty], "ts", "value")
    assert n == 0 and sum_fp == 0
