"""As-of join parity vs pd.merge_asof oracle (SURVEY.md §5.2.2) across
strategies and salting, plus edge cases (before-first probes, empty
build side, exact-timestamp matches)."""

import numpy as np
import pandas as pd
import pytest

from crawlfe.asof import asof_join
from crawlfe.features import featurize
from crawlfe.oracle import oracle_asof
from crawlfe.synth import SynthConfig, gen_pages_pdf, query_grid_pdf, synth_pages

CFG = SynthConfig(n_urls=120)


@pytest.fixture(scope="module")
def fixtures(spark):
    pdf = gen_pages_pdf(CFG, 0, CFG.n_urls)
    pages = synth_pages(spark, CFG)
    feats = featurize(pages, use_html=True).select(
        "url", "warc_ts", "text_sha256"
    )
    fp = feats.toPandas()
    grid_pdf = query_grid_pdf(CFG, pdf)
    grid = spark.createDataFrame(grid_pdf)
    want = oracle_asof(
        grid_pdf, fp, key="url", ts_probe="join_ts", ts_build="warc_ts",
        build_cols=["text_sha256"],
    ).sort_values(["url", "join_ts"], ignore_index=True)
    return grid, feats, grid_pdf, want


def _check(got_pdf, want):
    got = got_pdf.sort_values(["url", "join_ts"], ignore_index=True)
    assert len(got) == len(want)
    assert (got["url"] == want["url"]).all()
    assert (got["warc_ts"].isna() == want["warc_ts"].isna()).all()
    m = ~got["warc_ts"].isna()
    assert (
        got.loc[m, "warc_ts"].astype("datetime64[us]").to_numpy()
        == want.loc[m, "warc_ts"].to_numpy()
    ).all()
    assert (
        got.loc[m, "text_sha256"].to_numpy()
        == want.loc[m, "text_sha256"].to_numpy()
    ).all()


@pytest.mark.parametrize(
    "strategy,salt_k",
    [("merge_scan", 1), ("merge_scan", 4), ("union_window", 1),
     ("merge_scan_slim", 1), ("merge_scan_slim", 4), ("range_scan", 1)],
)
def test_asof_strategies_match_oracle(spark, fixtures, strategy, salt_k):
    grid, feats, _, want = fixtures
    j = asof_join(
        grid, feats, key="url", ts_probe="join_ts", ts_build="warc_ts",
        build_cols=["text_sha256"], strategy=strategy, salt_k=salt_k,
        num_buckets=32,
    )
    _check(j.toPandas(), want)


def test_before_first_probe_is_null(spark, fixtures):
    grid, feats, grid_pdf, want = fixtures
    # query_grid always includes a probe 1h before each url's first
    # snapshot -> those rows must be null-matched (no leakage backward)
    assert want["warc_ts"].isna().sum() >= CFG.n_urls


def test_empty_build_side(spark, fixtures):
    grid, feats, _, _ = fixtures
    empty = feats.where("1=0")
    j = asof_join(
        grid, empty, key="url", ts_probe="join_ts", ts_build="warc_ts",
        build_cols=["text_sha256"], num_buckets=8,
    ).toPandas()
    assert j["warc_ts"].isna().all()
    assert j["text_sha256"].isna().all()


def test_exact_match_inclusive(spark):
    """allow_exact_matches: probe at exactly a snapshot ts matches it."""
    probe = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u"],
                "join_ts": pd.Series(
                    [pd.Timestamp("2024-01-02")], dtype="datetime64[us]"
                ),
            }
        )
    )
    build = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u", "u"],
                "warc_ts": pd.Series(
                    [pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-02")],
                    dtype="datetime64[us]",
                ),
                "v": [1.0, 2.0],
            }
        )
    )
    for strategy in ("merge_scan", "union_window", "merge_scan_slim", "range_scan"):
        out = asof_join(
            probe, build, key="url", ts_probe="join_ts",
            ts_build="warc_ts", build_cols=["v"], strategy=strategy,
        ).toPandas()
        assert out["v"].iloc[0] == 2.0


def test_self_asof_shared_lineage(spark, sf_dir):
    """Regression: probe and build derived from the SAME relation must
    not lose build columns to cross-side attribute dedup (the Catalyst
    pruning hazard found via spark-submit in round 1)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    probe = ev.where("event_type='click'").select(
        "user_id", F.col("ts").alias("join_ts"), "event_id"
    )
    build = ev.where("event_type='purchase'").select(
        "user_id", "ts", F.col("value").alias("pv")
    )
    out = asof_join(
        probe, build, key="user_id", ts_probe="join_ts", ts_build="ts",
        build_cols=["pv"], num_buckets=16,
    ).select("user_id", "join_ts", "ts", "pv")
    got = out.toPandas().sort_values(
        ["user_id", "join_ts"], ignore_index=True
    )
    pp = probe.toPandas().rename(columns={"join_ts": "join_ts"})
    bp = build.toPandas()
    want = oracle_asof(
        pp, bp, key="user_id", ts_probe="join_ts", ts_build="ts",
        build_cols=["pv"],
    ).sort_values(["user_id", "join_ts"], ignore_index=True)
    assert (got["ts"].isna() == want["ts"].isna()).all()
    m = ~got["ts"].isna()
    assert np.array_equal(
        got.loc[m, "pv"].to_numpy(), want.loc[m, "pv"].to_numpy()
    )


def test_tolerance_rejected_by_non_implementing_strategies(spark):
    """range_scan does not implement tolerance; silently ignoring it
    returned out-of-window matches (ADVICE r1) — it must raise."""
    pages = synth_pages(spark, SynthConfig(n_urls=10))
    probe = pages.selectExpr("url", "warc_ts as join_ts")
    build = pages.selectExpr("url", "warc_ts", "lang as b_lang")
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(
            probe, build, key="url", ts_probe="join_ts",
            ts_build="warc_ts", build_cols=["b_lang"],
            strategy="range_scan", tolerance=pd.Timedelta(hours=1),
        )


def test_tolerance_parity_across_strategies(spark, fixtures):
    """merge_scan, merge_scan_slim and union_window must agree exactly
    under a tolerance window (union_window implements it as a JVM
    conditional projection over the carried match), and the window must
    actually null out stale matches."""
    grid, feats, _, _ = fixtures
    tol = pd.Timedelta(hours=6)
    outs = {}
    for strategy in ("merge_scan", "merge_scan_slim", "union_window"):
        outs[strategy] = (
            asof_join(
                grid, feats, key="url", ts_probe="join_ts",
                ts_build="warc_ts", build_cols=["text_sha256"],
                strategy=strategy, tolerance=tol,
            )
            .toPandas()
            .sort_values(["url", "join_ts"], ignore_index=True)
            [["url", "join_ts", "warc_ts", "text_sha256"]]
        )
    base = outs["merge_scan"]
    for strategy in ("merge_scan_slim", "union_window"):
        pd.testing.assert_frame_equal(base, outs[strategy], check_like=True)
    # the tolerance must bite: without it strictly more matches
    full = (
        asof_join(
            grid, feats, key="url", ts_probe="join_ts",
            ts_build="warc_ts", build_cols=["text_sha256"],
            strategy="merge_scan",
        ).where("warc_ts IS NOT NULL").count()
    )
    assert base["warc_ts"].notna().sum() < full


@pytest.mark.parametrize("strategy", ["merge_scan", "merge_scan_slim"])
def test_forward_direction_matches_oracle(spark, fixtures, strategy):
    """direction='forward' attaches the EARLIEST build row at-or-after
    each probe (the label-construction join); parity vs pd.merge_asof
    direction='forward', and every match must be >= the probe ts."""
    grid, feats, grid_pdf, _ = fixtures
    fp = feats.toPandas()
    want = oracle_asof(
        grid_pdf, fp, key="url", ts_probe="join_ts", ts_build="warc_ts",
        build_cols=["text_sha256"], direction="forward",
    ).sort_values(["url", "join_ts"], ignore_index=True)
    got = (
        asof_join(
            grid, feats, key="url", ts_probe="join_ts",
            ts_build="warc_ts", build_cols=["text_sha256"],
            strategy=strategy, num_buckets=32, direction="forward",
        )
        .toPandas()
    )
    _check(got, want)
    m = got["warc_ts"].notna()
    assert (
        got.loc[m, "warc_ts"].astype("datetime64[us]")
        >= got.loc[m, "join_ts"].astype("datetime64[us]")
    ).all()


def test_forward_rejected_by_window_strategies(spark):
    """union_window/range_scan are backward-only; forward must raise
    rather than silently compute the wrong direction."""
    pages = synth_pages(spark, SynthConfig(n_urls=10))
    probe = pages.selectExpr("url", "warc_ts as join_ts")
    build = pages.selectExpr("url", "warc_ts", "lang as b_lang")
    for strategy in ("union_window", "range_scan"):
        with pytest.raises(ValueError, match="direction"):
            asof_join(
                probe, build, key="url", ts_probe="join_ts",
                ts_build="warc_ts", build_cols=["b_lang"],
                strategy=strategy, direction="forward",
            )


@pytest.mark.parametrize("strategy", ["merge_scan", "merge_scan_slim"])
def test_nearest_direction_matches_oracle(spark, fixtures, strategy):
    """direction='nearest' attaches the build row minimizing
    |ts_build - ts_probe| (snapshot alignment across cadences);
    parity vs pd.merge_asof direction='nearest'."""
    grid, feats, grid_pdf, _ = fixtures
    fp = feats.toPandas()
    want = oracle_asof(
        grid_pdf, fp, key="url", ts_probe="join_ts", ts_build="warc_ts",
        build_cols=["text_sha256"], direction="nearest",
    ).sort_values(["url", "join_ts"], ignore_index=True)
    got = (
        asof_join(
            grid, feats, key="url", ts_probe="join_ts",
            ts_build="warc_ts", build_cols=["text_sha256"],
            strategy=strategy, num_buckets=32, direction="nearest",
        )
        .toPandas()
    )
    _check(got, want)


def test_nearest_tie_prefers_backward(spark):
    """An exactly equidistant pair must resolve to the EARLIER build
    row (pd.merge_asof nearest tie rule) — pinned so the DuckDB
    oracle's `ORDER BY abs_diff, ts` twin stays bit-faithful."""
    probe = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u"],
                "join_ts": pd.Series(
                    [pd.Timestamp("2024-01-02 12:00:00")],
                    dtype="datetime64[us]",
                ),
            }
        )
    )
    build = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u", "u"],
                "warc_ts": pd.Series(
                    [
                        pd.Timestamp("2024-01-02 11:00:00"),
                        pd.Timestamp("2024-01-02 13:00:00"),
                    ],
                    dtype="datetime64[us]",
                ),
                "tag": ["back", "fwd"],
            }
        )
    )
    got = asof_join(
        probe, build, key="url", ts_probe="join_ts", ts_build="warc_ts",
        build_cols=["tag"], strategy="merge_scan", num_buckets=4,
        direction="nearest",
    ).toPandas()
    assert list(got["tag"]) == ["back"]
